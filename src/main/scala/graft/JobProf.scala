package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

/** Dev-only job-level attribution for one query: run it once warmed,
  * then once instrumented, printing every Spark job's wall seconds,
  * description and callsite — the local stand-in for the Spark UI's
  * Jobs page (guide §7.1) on a host with the UI disabled. The gaps
  * between jobs (driver-side planning/commit work) matter as much as
  * the jobs themselves, so the report also prints inter-job gap time.
  * Usage: sbt "runMain graft.JobProf <sfDir> <name> [name...]"
  */
object JobProf {
  private final case class JobRec(id: Int, t0: Long, var t1: Long,
      desc: String, site: String)

  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: graft.JobProf <sfDir> <name> [name...]")
    val sfDir = args(0)
    val names = args.drop(1).toSeq
    val unknown = names.filterNot(SparkEntry.queries.contains)
    require(unknown.isEmpty, s"unknown query name(s): ${unknown.mkString(", ")}")
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
    names.foreach { name =>
      // warm: codegen + JIT, exactly like Bench
      SparkEntry.queries(name)(spark, "/root/testdata/sf0.001")
        .queryExecution.toRdd.count()
      spark.catalog.clearCache()
      val recs = new java.util.concurrent.ConcurrentHashMap[Int, JobRec]()
      val listener = new SparkListener {
        override def onJobStart(e: SparkListenerJobStart): Unit = {
          val d = Option(e.properties)
            .flatMap(p => Option(p.getProperty("spark.job.description")))
            .getOrElse("")
          val site = Option(e.properties)
            .flatMap(p => Option(p.getProperty("callSite.short")))
            .getOrElse("")
          recs.put(e.jobId, JobRec(e.jobId, System.nanoTime(), -1L, d, site))
          ()
        }
        override def onJobEnd(e: SparkListenerJobEnd): Unit = {
          Option(recs.get(e.jobId)).foreach(_.t1 = System.nanoTime())
        }
      }
      spark.sparkContext.addSparkListener(listener)
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, sfDir).queryExecution.toRdd.count()
      val wall = (System.nanoTime() - t0) / 1e9
      // let straggler listener events drain before reading
      Thread.sleep(300)
      spark.sparkContext.removeSparkListener(listener)
      import scala.jdk.CollectionConverters._
      val jobs = recs.values.asScala.toSeq.sortBy(_.t0)
      println(f"===== $name wall=$wall%.2fs jobs=${jobs.size} =====")
      var lastEnd = t0
      var gapSum = 0.0
      jobs.foreach { j =>
        val gap = math.max(0L, j.t0 - lastEnd) / 1e9
        gapSum += gap
        val dur = (if (j.t1 > 0) j.t1 - j.t0 else 0L) / 1e9
        if (j.t1 > 0) lastEnd = math.max(lastEnd, j.t1)
        val label = if (j.desc.nonEmpty) j.desc else j.site
        println(f"  job ${j.id}%4d  dur=$dur%7.3f  gap=$gap%7.3f  $label")
      }
      println(f"  TOTAL jobs=${jobs.map(j => (if (j.t1 > 0) j.t1 - j.t0 else 0L) / 1e9).sum}%.2f " +
        f"gaps=$gapSum%.2f wall=$wall%.2f")
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
