package graft

import org.apache.spark.sql.SparkSession

/** Print the formatted physical plan of named queries (plan-shape
  * inspection: pushed filters, exchange reuse, codegen spans).
  * Usage: sbt "runMain graft.Explain <sfDir> <name> [name...]"
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val names = args.drop(1).toSeq
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config(graft.util.Tables.nanosAsLongKey, "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      println(s"===== $n =====")
      SparkEntry.queries(n)(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
