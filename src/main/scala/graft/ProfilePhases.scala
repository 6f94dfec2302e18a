package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

/** Dev harness: job-count + wall-per-phase breakdown of one lifecycle
  * query, to find whether its cost is data volume or commit machinery.
  * Usage: sbt "runMain graft.ProfilePhases <sfDir> <q42|q43|qd25|qs11>"
  */
object ProfilePhases {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val which = args(1)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config(graft.util.Tables.nanosAsLongKey, "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    @volatile var jobs = 0
    @volatile var jobMs = 0L
    val starts = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
    val bySite = new java.util.concurrent.ConcurrentHashMap[String, (Int, Long)]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        jobs += 1
        val site = js.stageInfos.lastOption.map(_.name.takeWhile(_ != '+').trim)
          .getOrElse("?")
        starts.put(js.jobId, (js.time, site))
      }
      override def onJobEnd(je: SparkListenerJobEnd): Unit = {
        val s = starts.remove(je.jobId)
        if (s != null) {
          val dur = je.time - s._1
          jobMs += dur
          bySite.merge(s._2, (1, dur),
            (a, b) => (a._1 + b._1, a._2 + b._2))
        }
      }
    })
    val name = SparkEntry.queries.keys.find(_.startsWith(which)).getOrElse(
      sys.error(s"no query named $which*"))
    // warm
    SparkEntry.queries(name)(spark, sfDir).queryExecution.toRdd.count()
    spark.catalog.clearCache()
    jobs = 0; jobMs = 0; bySite.clear()
    val t0 = System.nanoTime()
    SparkEntry.queries(name)(spark, sfDir).queryExecution.toRdd.count()
    val wall = (System.nanoTime() - t0) / 1e9
    println(f"PHASES $which%s wall=$wall%.2fs jobs=$jobs sumJobWall=${jobMs / 1e3}%.2fs")
    import scala.jdk.CollectionConverters._
    bySite.asScala.toSeq.sortBy(-_._2._2).foreach { case (site, (n, ms)) =>
      println(f"  SITE $site%-60s n=$n%3d sum=${ms / 1e3}%6.2fs")
    }
    spark.stop()
  }
}
