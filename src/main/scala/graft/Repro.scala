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
      // Explicit UTC so the NTZ->TIMESTAMP relabel in Tables.load stays
      // value-identical when launched outside sbt's forked JVM options.
      .config("spark.sql.session.timeZone", "UTC")
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
          case None => df.count()
        }
        println(s"[repro] $n OK rows=$c")
      } catch {
        case e: Throwable =>
          println(s"[repro] $n FAILED: ${e.getClass.getName}: ${e.getMessage}")
          e.printStackTrace(System.out)
      }
      spark.catalog.clearCache()
    }
    // restricted oracle_sql.json so check_oracle.py can gate just these
    out.foreach { dir =>
      def esc(s: String): String = "\"" + s.flatMap {
        case '"'  => "\\\""
        case '\\' => "\\\\"
        case '\n' => "\\n"
        case '\r' => "\\r"
        case '\t' => "\\t"
        case c if c < ' ' => f"\\u${c.toInt}%04x"
        case c => c.toString
      } + "\""
      val json = SparkEntry.oracleSql.filter(kv => names.contains(kv._1))
        .map { case (k, v) => s"${esc(k)}: ${esc(v)}" }.mkString("{", ",", "}")
      java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$dir/oracle_sql.json"), json)
    }
    spark.stop()
  }
}
