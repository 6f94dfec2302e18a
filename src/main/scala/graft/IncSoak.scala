package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StringType

/** Scale soak for [[graft.ecom.IncrementalLakehouse]]: W waves of R
  * synthesized raw events step the incremental medallion while the
  * batch twin ([[graft.ecom.Lakehouse.runAll]]) recomputes from the
  * accumulated bronze — the measured claim is the shape of the two
  * curves, not a single ratio: a step WRITES O(wave) (insert-mostly
  * merges rewrite zero files; gold refreshes touch changed groups),
  * while the batch run re-aggregates and REWRITES the whole warehouse
  * every time. The step's table-read term (merge classification scans
  * over string-PK silvers, which stats/blooms cannot prune) is the
  * honest linear component and is reported, not hidden.
  *
  * Usage: GRAFT_SOAK_WAVES=5 GRAFT_SOAK_ROWS=2000000 \
  *   sbt "runMain graft.IncSoak /tmp/soakdir"
  * Prints one JSON object; correctness backstop: the final wave's
  * incremental product_metrics/customer_360 fingerprints must equal
  * the batch twin's.
  */
object IncSoak {
  def main(args: Array[String]): Unit = {
    require(args.length == 1, "usage: graft.IncSoak <workDir>")
    val work = args(0)
    val waves = sys.env.getOrElse("GRAFT_SOAK_WAVES", "5").toInt
    val rows = sys.env.getOrElse("GRAFT_SOAK_ROWS", "2000000").toLong
    // the incremental use case is SMALL waves against a BIG table —
    // wave 1 bootstraps `bootstrap` rows, later waves land `rows` each
    val bootstrap = sys.env.getOrElse("GRAFT_SOAK_BOOTSTRAP", rows.toString).toLong
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val users = 200000L
    def raw(lo: Long, hi: Long): DataFrame =
      spark.range(lo, hi).select(
        col("id").as("event_id"),
        ((col("id") * 2654435761L) % users).as("user_id"),
        timestamp_seconds(lit(1704067200L) + col("id") / 10L).as("ts"),
        ((col("id") % 97L).cast("double") / 10.0).as("value"),
        // NUMERIC strings: the adapter derives ratings/categories from
        // product_id % k, exactly as the testdata's ids allow
        (col("id") % 5000L).cast(StringType).as("product_id"),
        when(col("id") % 10L < 6L, "page_view")
          .when(col("id") % 10L < 8L, "add_to_cart")
          .when(col("id") % 10L < 9L, "purchase")
          .otherwise("signup").as("event_type"))

    val asOf = java.time.LocalDate.parse("2025-01-01")
    val loadTs = java.sql.Timestamp.valueOf("2025-01-01 00:00:00")
    // bytes on disk under a directory — the host-noise-free metric:
    // wall-clock on this host swings ±2x, but bytes WRITTEN per step
    // vs per batch run is the write-amplification argument that
    // actually decides the 100 TB cadence
    def du(dir: String): Long = {
      val root = java.nio.file.Paths.get(dir)
      if (!java.nio.file.Files.exists(root)) 0L
      else {
        val s = java.nio.file.Files.walk(root)
        try s.filter(java.nio.file.Files.isRegularFile(_))
          .mapToLong(java.nio.file.Files.size(_)).sum()
        finally s.close()
      }
    }
    val inc = graft.ecom.IncrementalLakehouse(spark, s"$work/inc")
    var seen: Option[DataFrame] = None
    val steps = (0 until waves).map { k =>
      // cumulative row count through `wave` (wave 1 = the bootstrap)
      def hiOf(wave: Int): Long =
        if (wave <= 0) 0L else bootstrap + (wave - 1).toLong * rows
      val w = raw(hiOf(k), hiOf(k + 1)).persist()
      w.count() // materialize outside the timed window
      val b0 = graft.queries.Medallion.bronzeSources(w)
      val b = seen.fold(b0)(sc => b0.updated("sessions",
        b0("sessions").join(sc, Seq("session_id"), "left_anti")))
      val duBefore = du(s"$work/inc")
      val t0 = System.nanoTime()
      inc.step(b, k + 1L, asOf, loadTs)
      val stepS = (System.nanoTime() - t0) / 1e9
      val stepBytes = du(s"$work/inc") - duBefore
      val newSeen = w.select(col("user_id").cast(StringType).as("session_id"))
        .distinct()
      seen = Some(seen.fold(newSeen)(old =>
        old.unionByName(newSeen).distinct().persist()))
      seen.foreach(_.count())
      w.unpersist(blocking = false)
      // batch twin on the ACCUMULATED bronze, first/last wave only (it
      // is the expensive side; the curve's two endpoints tell the story)
      val batchS =
        if (k == 0 || k == waves - 1) {
          val cum = raw(0L, hiOf(k + 1)).persist()
          cum.count()
          val t1 = System.nanoTime()
          graft.ecom.Lakehouse(spark, s"$work/batch$k")
            .runAll(graft.queries.Medallion.bronzeSources(cum), asOf,
              loadTs = loadTs, enforceDq = false)
          val s = (System.nanoTime() - t1) / 1e9
          cum.unpersist(blocking = false)
          Some((s, du(s"$work/batch$k")))
        } else None
      println(f"[incsoak] wave ${k + 1} rows=${hiOf(k + 1)} " +
        f"step=${stepS}%.1fs stepMB=${stepBytes / 1e6}%.0f " +
        f"batch=${batchS.fold("-")(t => f"${t._1}%.1fs/${t._2 / 1e6}%.0fMB")}")
      (k + 1, hiOf(k + 1), stepS, stepBytes, batchS)
    }

    // correctness backstop: incremental gold == batch gold fingerprints
    val incGold = inc.goldRelations(asOf, loadTs)
    val batch = graft.ecom.Lakehouse(spark, s"$work/batch${waves - 1}")
    def fp(df: DataFrame, money: String): (Long, java.math.BigDecimal) = {
      val r = df.agg(count(lit(1)), sum(col(money).cast("decimal(18,2)"))).head()
      (r.getLong(0), r.getDecimal(1))
    }
    val pmI = fp(incGold("product_metrics"), "total_revenue")
    val pmB = fp(batch.read("product_metrics"), "total_revenue")
    val c3I = fp(incGold("customer_360"), "customer_total_revenue")
    val c3B = fp(batch.read("customer_360"), "customer_total_revenue")
    require(pmI == pmB, s"product_metrics diverged: inc=$pmI batch=$pmB")
    require(c3I == c3B, s"customer_360 diverged: inc=$c3I batch=$c3B")

    val stepJson = steps.map { case (wv, n, s, sb, b) =>
      s"""{"wave":$wv,"cumulative_rows":$n,"step_s":${f"$s%.1f"},""" +
        s""""step_mb_written":${sb / 1000000}""" +
        b.fold("}") { case (x, xb) =>
          s""","batch_runall_s":${f"$x%.1f"},"batch_mb_written":${xb / 1000000}}"""
        }
    }.mkString("[", ",", "]")
    println(s"""{"soak":"incremental_lakehouse","rows_per_wave":$rows,""" +
      s""""waves":$waves,"gold_equal":true,"steps":$stepJson}""")
    spark.stop()
  }
}
