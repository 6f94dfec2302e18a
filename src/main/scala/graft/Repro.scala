package graft

import scala.util.control.NonFatal

import org.apache.spark.sql.SparkSession

/** Execute named queries end-to-end and print full stack traces on
  * failure; with GRAFT_REPRO_OUT set, also dump results + a restricted
  * oracle_sql.json so check_oracle.py can gate just these queries.
  * Usage: runMain graft.Repro <sfDir> [name...]
  *
  * Honors SPARK_GRAFT_CPUS (default 8) so a parallelism-dependent
  * failure reproduces under the same config that surfaced it.
  */
object Repro {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: graft.Repro <sfDir> [queryName...]")
    val sfDir = args(0)
    val names = if (args.length > 1) args.drop(1).toSeq else SparkEntry.queries.keys.toSeq.sorted
    val unknown = names.filterNot(SparkEntry.queries.contains)
    require(unknown.isEmpty, s"unknown query name(s): ${unknown.mkString(", ")}")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config(graft.util.Tables.nanosAsLongKey, "true")
      // Explicit UTC so the NTZ->TIMESTAMP relabel in Tables.load stays
      // value-identical when launched outside sbt's forked JVM options.
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val out = sys.env.get("GRAFT_REPRO_OUT")
    names.foreach { n =>
      try {
        val df = SparkEntry.queries(n)(spark, sfDir)
        val c = out match {
          case Some(dir) =>
            df.coalesce(1).write.mode("overwrite").parquet(s"$dir/$n")
            spark.read.parquet(s"$dir/$n").count()
          case None =>
            // FULL materialization (toRdd, like Bench): a plain count()
            // would let Catalyst prune computed columns and print OK
            // for a query whose bug lives in a pruned projection
            df.queryExecution.toRdd.count()
        }
        println(s"[repro] $n OK rows=$c")
      } catch {
        // NonFatal only: an OOM must abort the run, not mark one query
        // failed and keep going in a corrupted JVM
        case NonFatal(e) =>
          println(s"[repro] $n FAILED: ${e.getClass.getName}: ${e.getMessage}")
          e.printStackTrace(System.out)
      }
      spark.catalog.clearCache()
    }
    // restricted oracle_sql.json so check_oracle.py can gate just these
    out.foreach { dir =>
      graft.util.OracleJson.writeOracleSql(s"$dir/oracle_sql.json",
        SparkEntry.oracleSql.filter(kv => names.contains(kv._1)))
    }
    spark.stop()
  }
}
