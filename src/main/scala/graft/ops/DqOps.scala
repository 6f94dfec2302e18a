package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions.{sum, when}

/** Data-quality gate (reference:
  * `/root/reference/04_data_quality/04_data_quality_checks.py:17-34`):
  * each check is a "find bad rows" query; the gate counts them and raises
  * on > 0. Pure DataFrame ops — no framework.
  */
object DqOps {

  /** A named check. `badRows` is the general form (any query shape —
    * grouped uniqueness, joins). When the check is a ROW-LEVEL predicate,
    * also supply `rowPredicate` (same condition): [[run]] then fuses all
    * row-level checks over one table into ONE aggregate pass — at 100 TB
    * "N checks = N scans" is the difference between a DQ gate that costs
    * one table read and one that costs N. The two forms must agree;
    * keep them derived from one shared Column.
    */
  final case class DqCheck(name: String, badRows: DataFrame => DataFrame,
      rowPredicate: Option[Column] = None)

  final case class DqResult(name: String, badCount: Long) {
    def passed: Boolean = badCount == 0L
  }

  /** Run checks against `df`; returns per-check results in check order.
    * All checks carrying a `rowPredicate` are computed in a single
    * conditional-sum aggregate (one scan, map-side combinable); the
    * rest run their own query.
    */
  def run(df: DataFrame, checks: Seq[DqCheck]): Seq[DqResult] = {
    // names key the fused-aggregate columns and the result attribution —
    // a duplicate would silently report one check's count as another's
    require(checks.map(_.name).distinct.size == checks.size,
      s"duplicate check names: ${checks.map(_.name).mkString(", ")}")
    val rowChecks = checks.filter(_.rowPredicate.isDefined)
    val fused: Map[String, Long] =
      if (rowChecks.isEmpty) Map.empty
      else {
        val aggs = rowChecks.map(c =>
          sum(when(c.rowPredicate.get, 1L).otherwise(0L)).as(c.name))
        val row = df.agg(aggs.head, aggs.tail: _*).collect().head
        rowChecks.zipWithIndex.map { case (c, i) =>
          // sum over zero rows is NULL — an empty table has zero bad rows
          c.name -> (if (row.isNullAt(i)) 0L else row.getLong(i))
        }.toMap
      }
    checks.map(c => DqResult(c.name,
      fused.getOrElse(c.name, c.badRows(df).count())))
  }

  /** Run checks and throw IllegalStateException on failure — the
    * reference's raise-on-bad-rows gate semantics.
    */
  def enforce(df: DataFrame, checks: Seq[DqCheck]): Unit = {
    val failed = run(df, checks).filter(!_.passed)
    if (failed.nonEmpty) {
      val msg = failed.map(r => s"${r.name}: ${r.badCount} bad rows").mkString("; ")
      throw new IllegalStateException(s"DQ gate failed — $msg")
    }
  }
}
