package graft

import org.apache.spark.sql.SparkSession

/** In-JVM profiling loop: run the named queries repeatedly against one
  * warmed session and print min/median seconds per query — the only
  * reliable timing signal on this host (wall-clock noise is ±2×; see
  * memory notes). Usage:
  *   sbt "runMain graft.Prof <sfDir> <reps> <name> [name...]"
  */
object Prof {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: graft.Prof <sfDir> <reps> [name...]")
    val sfDir = args(0)
    val reps = args(1).toInt
    require(reps >= 1, s"reps must be >= 1, got $reps")
    val names = args.drop(2).toSeq
    val unknown = names.filterNot(SparkEntry.queries.contains)
    require(unknown.isEmpty,
      s"unknown query name(s): ${unknown.mkString(", ")} — a silent filter " +
        "would print nothing and read as success")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config(graft.util.Tables.nanosAsLongKey, "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val qs = SparkEntry.queries.filter(q => names.isEmpty || names.contains(q._1))
    qs.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      // warmup: codegen + JIT
      fn(spark, sfDir).queryExecution.toRdd.count()
      val times = (1 to reps).map { _ =>
        // cache-cold like Bench: query bodies persist plan-keyed
        // intermediates, and a rep reading the warmup's cache times
        // warm storage instead of the engine — the exact lie this tool
        // exists to avoid
        spark.catalog.clearCache()
        val t0 = System.nanoTime()
        fn(spark, sfDir).queryExecution.toRdd.count()
        (System.nanoTime() - t0) / 1e9
      }.sorted
      // true median (Bench's definition), not the upper-middle sample
      val med =
        if (times.size % 2 == 1) times(times.size / 2)
        else (times(times.size / 2 - 1) + times(times.size / 2)) / 2.0
      println(f"PROF $name%-28s min=${times.head}%7.3f med=$med%7.3f max=${times.last}%7.3f")
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
