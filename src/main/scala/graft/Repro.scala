package graft

import org.apache.spark.sql.SparkSession

/** Temporary: execute named queries end-to-end and print full stack
  * traces on failure. Usage: runMain graft.Repro <sfDir> <name...>
  */
object Repro {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val names = if (args.length > 1) args.drop(1).toSeq else SparkEntry.queries.keys.toSeq.sorted
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config(graft.util.Tables.nanosAsLongKey, "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      try {
        val c = SparkEntry.queries(n)(spark, sfDir).count()
        println(s"[repro] $n OK rows=$c")
      } catch {
        case e: Throwable =>
          println(s"[repro] $n FAILED: ${e.getClass.getName}: ${e.getMessage}")
          e.printStackTrace(System.out)
      }
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
