package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StringType

/** Dev harness: per-call-site job attribution of ONE incremental
  * medallion step against a pre-grown warehouse — where does the
  * step's wall go (discovery scans? commit machinery? gold refresh?)
  * once writes are known to be O(wave).
  * Usage: GRAFT_SOAK_BOOTSTRAP=20000000 GRAFT_SOAK_ROWS=1000000 \
  *   sbt "runMain graft.IncProf /tmp/incprof"
  */
object IncProf {
  def main(args: Array[String]): Unit = {
    val work = args(0)
    val rows = sys.env.getOrElse("GRAFT_SOAK_ROWS", "1000000").toLong
    val bootstrap = sys.env.getOrElse("GRAFT_SOAK_BOOTSTRAP", "20000000").toLong
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val starts = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
    val bySite = new java.util.concurrent.ConcurrentHashMap[String, (Int, Long)]()
    @volatile var record = false
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = if (record) {
        val site = js.stageInfos.lastOption.map(_.name.takeWhile(_ != '+').trim)
          .getOrElse("?")
        starts.put(js.jobId, (js.time, site))
      }
      override def onJobEnd(je: SparkListenerJobEnd): Unit = {
        val s = starts.remove(je.jobId)
        if (s != null)
          bySite.merge(s._2, (1, je.time - s._1),
            (a, b) => (a._1 + b._1, a._2 + b._2)): Unit
      }
    })

    val users = 200000L
    def raw(lo: Long, hi: Long): DataFrame =
      spark.range(lo, hi).select(
        col("id").as("event_id"),
        ((col("id") * 2654435761L) % users).as("user_id"),
        timestamp_seconds(lit(1704067200L) + col("id") / 10L).as("ts"),
        ((col("id") % 97L).cast("double") / 10.0).as("value"),
        (col("id") % 5000L).cast(StringType).as("product_id"),
        when(col("id") % 10L < 6L, "page_view")
          .when(col("id") % 10L < 8L, "add_to_cart")
          .when(col("id") % 10L < 9L, "purchase")
          .otherwise("signup").as("event_type"))

    val asOf = java.time.LocalDate.parse("2025-01-01")
    val loadTs = java.sql.Timestamp.valueOf("2025-01-01 00:00:00")
    System.setProperty("graft.inc.profile", "true")
    val inc = graft.ecom.IncrementalLakehouse(spark, s"$work/inc")

    // wave 1: bootstrap (untimed attribution), wave 2+3: the steady
    // state. Sessions waves carry NEW sessions only (IncSoak's shape —
    // the reference creates a session row once, at visit start).
    var lo = 0L
    var seen: Option[DataFrame] = None
    Seq(bootstrap, rows, rows).zipWithIndex.foreach { case (n, k) =>
      val w = raw(lo, lo + n).persist(); w.count()
      lo += n
      val b0 = graft.queries.Medallion.bronzeSources(w)
      val b = seen.fold(b0)(sc => b0.updated("sessions",
        b0("sessions").join(sc, Seq("session_id"), "left_anti")))
      if (k == 2) { record = true; bySite.clear() }
      val t0 = System.nanoTime()
      inc.step(b, k + 1L, asOf, loadTs)
      val s = (System.nanoTime() - t0) / 1e9
      println(f"[incprof] wave ${k + 1} rows=$n step=$s%.1fs")
      val newSeen = w.select(col("user_id").cast(StringType).as("session_id"))
        .distinct()
      seen = Some(seen.fold(newSeen)(old =>
        old.unionByName(newSeen).distinct().persist()))
      seen.foreach(_.count())
      w.unpersist(blocking = false)
    }
    record = false
    import scala.jdk.CollectionConverters._
    bySite.asScala.toSeq.sortBy(-_._2._2).take(40).foreach { case (site, (n, ms)) =>
      println(f"  SITE $site%-72s n=$n%3d sum=${ms / 1e3}%6.2fs")
    }
    spark.stop()
  }
}
