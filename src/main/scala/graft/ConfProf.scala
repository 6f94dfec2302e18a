package graft

import org.apache.spark.sql.SparkSession

/** Dev-only config experiment harness: build ONE session with extra
  * `k=v` conf pairs from GRAFT_CONF (comma-separated), then time the
  * named queries exactly like [[Prof]] (warm + min/med of reps,
  * cache-cleared between reps). Lets a config hypothesis be measured
  * against the same queries without touching the product session
  * builders. Usage:
  *   GRAFT_CONF="spark.sql.adaptive.coalescePartitions.parallelismFirst=false" \
  *     sbt "runMain graft.ConfProf <sfDir> <reps> <name> [name...]"
  */
object ConfProf {
  def main(args: Array[String]): Unit = {
    require(args.length >= 3, "usage: graft.ConfProf <sfDir> <reps> <name...>")
    val sfDir = args(0)
    val reps = args(1).toInt
    val names = args.drop(2).toSeq
    val unknown = names.filterNot(SparkEntry.queries.contains)
    require(unknown.isEmpty, s"unknown query name(s): ${unknown.mkString(", ")}")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val extras = sys.env.get("GRAFT_CONF").toSeq
      .flatMap(_.split(',')).map(_.trim).filter(_.nonEmpty)
      .map { kv =>
        val i = kv.indexOf('=')
        require(i > 0, s"GRAFT_CONF entry '$kv' must be k=v")
        kv.take(i) -> kv.drop(i + 1)
      }
    var b = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config(graft.util.Tables.nanosAsLongKey, "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.ui.enabled", "false")
    extras.foreach { case (k, v) => b = b.config(k, v) }
    val spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    extras.foreach { case (k, v) => println(s"CONF $k=$v") }
    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      fn(spark, "/root/testdata/sf0.001").queryExecution.toRdd.count()
      spark.catalog.clearCache()
      val times = (1 to reps).map { _ =>
        spark.catalog.clearCache()
        val t0 = System.nanoTime()
        fn(spark, sfDir).queryExecution.toRdd.count()
        (System.nanoTime() - t0) / 1e9
      }.sorted
      val med =
        if (times.size % 2 == 1) times(times.size / 2)
        else (times(times.size / 2 - 1) + times(times.size / 2)) / 2.0
      println(f"CPROF $name%-28s min=${times.head}%7.3f med=$med%7.3f max=${times.last}%7.3f")
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
