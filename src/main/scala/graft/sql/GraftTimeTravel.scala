package graft.sql

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.util.DateTimeUtils
import org.apache.spark.unsafe.types.UTF8String

/** Shared parsing for the `timestampAsOf` time-travel option.
  *
  * The option string must resolve in the SESSION timezone
  * (`spark.sql.session.timeZone`), exactly as a SQL
  * `TIMESTAMP AS OF '...'` literal does — `java.sql.Timestamp.valueOf`
  * would use the JVM-default zone, so the same option string could pin
  * a different version on a host whose JVM zone differs from the
  * session zone. Both the `format("graft")` path reads and the catalog
  * relation rule route through here so the two paths agree by
  * construction.
  */
object GraftTimeTravel {

  /** Parse `s` as a timestamp in the session timezone → epoch millis.
    * Accepts every literal shape Spark's own timestamp cast does
    * (date-only, space or 'T' separator, fractional seconds, explicit
    * zone offsets — an explicit offset in the string wins, as in SQL).
    */
  def parseMillis(spark: SparkSession, s: String, context: String): Long = {
    val zone = DateTimeUtils.getZoneId(spark.sessionState.conf.sessionLocalTimeZone)
    DateTimeUtils.stringToTimestamp(UTF8String.fromString(s), zone) match {
      case Some(micros) => DateTimeUtils.microsToMillis(micros)
      case None => throw new IllegalArgumentException(
        s"$context: timestampAsOf '$s' is not a valid timestamp literal " +
          "(expected e.g. '2024-03-01 00:00:00' — resolved in the session " +
          s"timezone ${spark.sessionState.conf.sessionLocalTimeZone})")
    }
  }
}
