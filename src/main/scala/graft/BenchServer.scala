package graft

import scala.util.control.NonFatal

import org.apache.spark.sql.SparkSession

/** Child-side of `graft.Bench`'s paired A/B mode: a long-lived JVM
  * whose classpath leads with a PRIOR round's jar (so `graft.*`
  * resolves to the old tree) timing one query per `RUN` line on its
  * own SparkSession. The coordinator alternates old/new executions of
  * the same query back-to-back, so each pair shares one host-weather
  * window — the per-query ratio is then engine signal, not the ±2x
  * Firecracker steal every cross-run comparison on this box fights.
  *
  * Protocol (stdin → stdout; stderr carries Spark logs and is
  * discarded by the coordinator):
  *   READY                     emitted once the session is up
  *   QUERIES → Q n1,n2,...     the tree's query inventory
  *   WARM <dir> → T 0          warm every query at the smallest SF
  *   RUN <name> → T <sec>      one cache-cold timed execution (-1 = failed)
  *   EXIT                      stop the session and exit
  */
object BenchServer {
  def main(args: Array[String]): Unit = {
    require(args.length == 1, "usage: BenchServer <sfDir>")
    val sfDir = args(0)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config(graft.util.Tables.nanosAsLongKey, "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val out = new java.io.PrintWriter(
      new java.io.OutputStreamWriter(System.out,
        java.nio.charset.StandardCharsets.UTF_8), true)
    out.println("READY")
    scala.io.Source.stdin.getLines().foreach { line =>
      line.trim.split(" ", 2) match {
        case Array("QUERIES") =>
          out.println("Q " + SparkEntry.queries.keys.toSeq.sorted.mkString(","))
        case Array("WARM", dir) =>
          if (new java.io.File(dir).isDirectory)
            SparkEntry.queries.foreach { case (_, fn) =>
              try fn(spark, dir).queryExecution.toRdd.count(): Unit
              catch { case NonFatal(_) => }
            }
          spark.catalog.clearCache()
          out.println("T 0")
        case Array("RUN", name) =>
          spark.catalog.clearCache()
          val t0 = System.nanoTime()
          val sec =
            try {
              SparkEntry.queries(name)(spark, sfDir).queryExecution.toRdd.count()
              (System.nanoTime() - t0) / 1e9
            } catch { case NonFatal(e) =>
              System.err.println(s"[bench-server] $name failed: ${e.getMessage}")
              -1.0
            }
          out.println("T " + String.format(java.util.Locale.ROOT, "%.3f", sec))
        case Array("EXIT") =>
          spark.stop()
          sys.exit(0)
        case other =>
          System.err.println(s"[bench-server] unknown command: ${other.mkString(" ")}")
          out.println("T -1")
      }
    }
    spark.stop()
  }
}
