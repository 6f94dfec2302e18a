package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Manifest-tail health under CONTINUOUS maintenance: a live
  * [[graft.streaming.Sinks.mvMaintain]] stream rides a source that
  * takes ~10k tiny commits, and the soak measures what a month of
  * hourly triggers would do to the LOG itself — read-plan wall,
  * DESCRIBE HISTORY wall, live version count, log file count and bytes
  * — at fixed checkpoints, with periodic VACUUM bounding retention and
  * auto-compaction bounding the data file count. The claim under test:
  * checkpointed delta manifests keep every curve FLAT in commit count
  * (a read touches at most interval-1 predecessor manifests), and
  * vacuum holds the log's size constant, so a maintenance loop can run
  * indefinitely without the log becoming the bottleneck.
  *
  * Usage: GRAFT_SOAK_TRIGGERS=10000 sbt "runMain graft.ManifestTailSoak /tmp/mts"
  * Prints one JSON object; correctness backstop: the maintained view
  * must equal the full recompute at the end.
  */
object ManifestTailSoak {
  def main(args: Array[String]): Unit = {
    require(args.length == 1, "usage: graft.ManifestTailSoak <workDir>")
    val work = args(0)
    val iters = sys.env.getOrElse("GRAFT_SOAK_TRIGGERS", "10000").toInt
    val vacuumEvery = sys.env.getOrElse("GRAFT_SOAK_VACUUM_EVERY", "1000").toInt
    val measureEvery = sys.env.getOrElse("GRAFT_SOAK_MEASURE_EVERY", "500").toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.ecom.VersionedTable

    val src = VersionedTable(spark, s"$work/src")
    src.commitAppend(spark.range(0L, 1000L).select(
      (col("id") % 37L).as("grp"),
      (col("id") % 97L).cast("decimal(18,2)").as("amt")))
    src.setTableProperty(VersionedTable.CdcEnabledProp, "true")
    src.setTableProperty(VersionedTable.AutoCompactProp, "true")

    val view = VersionedTable(spark, s"$work/mv")
    val spec = graft.ops.MvSpec(src.tableDir, keys = Seq("grp"),
      countCol = "n", sums = Seq("total" -> "amt"),
      mins = Seq("lo" -> "amt"), maxes = Seq("hi" -> "amt"), netKeys = Nil)
    graft.ops.MvSpec.ensure(spark, view, spec, "soak.mv")

    // the REAL streaming maintainer, running concurrently with the
    // commit loop: each trigger fires one self-windowing refresh
    // (windows coalesce when the source outruns the stream — the hot
    // cadence a production maintainer actually sees)
    val triggers = new java.util.concurrent.atomic.AtomicLong
    val q = graft.streaming.Sinks.mvMaintain(spark, src, s"$work/_ckpt") {
      () => { triggers.incrementAndGet(); spec.refresh(spark, view): Unit }
    }

    def du(dir: String): (Long, Long) = {
      val root = java.nio.file.Paths.get(dir)
      if (!java.nio.file.Files.exists(root)) (0L, 0L)
      else {
        val s = java.nio.file.Files.walk(root)
        try {
          val files = s.filter(java.nio.file.Files.isRegularFile(_))
            .mapToLong(java.nio.file.Files.size(_)).toArray
          (files.length.toLong, files.sum)
        } finally s.close()
      }
    }
    val points = Seq.newBuilder[String]
    var i = 0
    while (i < iters) {
      i += 1
      src.commitAppend(spark.range(i * 100L, i * 100L + 100L, 1L, 1).select(
        (col("id") % 37L).as("grp"),
        (col("id") % 97L).cast("decimal(18,2)").as("amt")))
      if (i % vacuumEvery == 0) {
        // 60s grace, not the production default (days — the soak's whole
        // life fits inside it, so nothing would ever reclaim) and not 0
        // (a grace-0 vacuum deletes files out from under the CONCURRENT
        // maintainer's in-flight reads — the first soak attempt killed
        // the stream exactly that way, which is WHY the grace exists):
        // long enough to cover any in-flight trigger, short enough that
        // the run demonstrates disk reclamation end to end
        src.vacuum(keepVersions = 200, unreferencedGraceMs = 60000L)
        view.vacuum(keepVersions = 50, unreferencedGraceMs = 60000L)
        ()
      }
      if (i % measureEvery == 0) {
        val t0 = System.nanoTime()
        val rows = src.read().count()
        val readS = (System.nanoTime() - t0) / 1e9
        val t1 = System.nanoTime()
        val hist = src.history().length
        val histS = (System.nanoTime() - t1) / 1e9
        val (logFiles, logBytes) = du(s"$work/src/_graft_log")
        val (dataFiles, dataBytes) = du(s"$work/src/data")
        points += f"""{"commit":$i,"read_s":$readS%.2f,"rows":$rows,""" +
          f""""history_s":$histS%.2f,"live_versions":$hist,""" +
          s""""log_files":$logFiles,"log_mb":${logBytes / 1000000},""" +
          s""""data_files":$dataFiles,"data_mb":${dataBytes / 1000000},""" +
          s""""triggers_fired":${triggers.get()}}"""
        System.err.println(s"[mts] ${points.result().last}")
      }
    }
    q.processAllAvailable()
    q.stop()

    // correctness backstop: the continuously maintained view equals the
    // full recompute of the final source state
    val recompute = src.read().groupBy("grp")
      .agg(count(lit(1)).as("n"), sum("amt").as("total"),
        min("amt").as("lo"), max("amt").as("hi"))
      .collect().map(_.mkString("|")).toSet
    val maintained = view.read().select("grp", "n", "total", "lo", "hi")
      .collect().map(_.mkString("|")).toSet
    require(maintained == recompute,
      s"maintained view diverged from recompute after $iters commits")

    println(s"""{"soak":"manifest_tail","commits":$iters,""" +
      s""""triggers_fired":${triggers.get()},"vacuum_every":$vacuumEvery,""" +
      s""""view_equal":true,"points":${points.result().mkString("[", ",", "]")}}""")
    spark.stop()
  }
}
