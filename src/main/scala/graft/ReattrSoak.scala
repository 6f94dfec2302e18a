package graft

import java.nio.file.Files

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

import graft.ecom.{Gold, GoldIvm, VersionedTable}

/** Scale soak for BOUNDED dimension-change repair
  * ([[graft.ecom.GoldIvm.reattributeCustomer360]]): a FIXED-size attrs
  * storm (2 000 sessions migrate to a different customer) against a
  * customer_360 rollup maintained over event silvers of growing size.
  *
  * Three numbers per decade:
  *  - `reattr_ms` — the real maintenance event, commits included:
  *    changeFeed window → retract/re-add delta → dirty-customer
  *    recompute → rollup merge. The claim: ~flat as the table grows
  *    (the storm is constant).
  *  - `naive_auth_ms` vs `bounded_auth_ms` — computation-only A/B of
  *    the dirty recompute the storm triggers. The naive shape (what
  *    r13 ran) joins the FULL rollup with the FULL dimension before
  *    the dirty-key filter can apply, because the customer key is
  *    CREATED by that join; the bounded shape (r14) derives the dirty
  *    customers' session set from the dimension's own stored key
  *    first, so both join sides restrict before joining.
  *  - `full_recompute_ms` — what the reference does instead on every
  *    run (`03_gold_aggregate.py:186-232`: re-join attrs, re-aggregate
  *    the world).
  *
  * Usage: sbt "runMain graft.ReattrSoak [out.json]"
  */
object ReattrSoak {

  private val Decades = Seq(10000000L, 100000000L, 300000000L)
  private val EventsPerSession = 20L
  private val StormSessions = 2000L

  def main(args: Array[String]): Unit = {
    val outPath = args.headOption.getOrElse("SOAK_r14_reattr.json")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def timed[T](f: => T): (Double, T) = {
      val t0 = System.nanoTime(); val r = f
      ((System.nanoTime() - t0) / 1e6, r)
    }

    // the level-2 prepare shape (GoldIvm.sessionToCustomer — the
    // reference's attrs join + start coalesce + duration filter +
    // UNKNOWN fallback), replicated for the computation-only A/B
    def prep(attrs: DataFrame)(l1: DataFrame): DataFrame = {
      val a = attrs.select(
        col("session_id"), col("customer_id").as("_attr_customer_id"),
        col("session_start_ts").as("_attr_start_ts"))
      val start = coalesce(col("session_start_ts_events"), col("_attr_start_ts"))
      l1.join(a, Seq("session_id"), "left")
        .withColumn("session_start_ts", start)
        .withColumn("session_duration_sec",
          col("session_end_ts").cast(LongType) - start.cast(LongType))
        .filter(col("session_duration_sec").isNotNull &&
          col("session_duration_sec") >= 0)
        .withColumn("customer_id",
          coalesce(col("_attr_customer_id"), lit("UNKNOWN")))
    }
    def authAgg(df: DataFrame): DataFrame =
      df.groupBy("customer_id")
        .agg(min("session_start_ts").as("first_ts"),
          max("session_end_ts").as("last_ts"))

    val rows = ArrayBuffer.empty[String]
    Decades.foreach { n =>
      val nSessions = n / EventsPerSession
      val dir = Files.createTempDirectory(s"graft-reattr-soak-$n").toString
      // q43-shaped events: contiguous sessions of 20 events, event time
      // increasing in id — a session's extremes are its first/last ids
      def eventsOf(ids: org.apache.spark.sql.Dataset[java.lang.Long]) = ids.selectExpr(
        "CAST(id AS STRING) AS event_id",
        s"CAST(CAST(id / $EventsPerSession AS BIGINT) AS STRING) AS session_id",
        "timestamp_seconds(1700000000 + id) AS event_ts",
        "CAST(timestamp_seconds(1700000000 + id) AS DATE) AS event_date",
        "CASE id % 5 WHEN 0 THEN 'purchase' WHEN 1 THEN 'add_to_cart' " +
          "ELSE 'page_view' END AS event_type",
        "CAST(id % 10000 AS DOUBLE) / 100.0 AS amount_usd")
      val events = VersionedTable(spark, s"$dir/events")
      events.commitOverwrite(eventsOf(spark.range(n)))
      events.setTableProperty(VersionedTable.CdcEnabledProp, "true")
      // the attrs DIMENSION as a versioned table (the storm needs its
      // change feed): even sessions attributed, odd fall to UNKNOWN
      val attrsVt = VersionedTable(spark, s"$dir/attrs")
      attrsVt.commitOverwrite(
        spark.range(nSessions).filter(col("id") % 2 === 0).selectExpr(
          "CAST(id AS STRING) AS session_id",
          "CONCAT('c', CAST(id % 500000 AS STRING)) AS customer_id",
          "timestamp_seconds(1699999999) AS session_start_ts",
          "'web' AS device", "'ads' AS source", "'US' AS country"))
      attrsVt.setTableProperty(VersionedTable.CdcEnabledProp, "true")

      val ivm = GoldIvm(spark, dir)
      val (bootMs, _) = timed {
        val (l1, l2) = ivm.refreshCustomer360(events, attrsVt.read())
        require(l1.isDefined && l2.isDefined, s"bootstrap must land at n=$n")
      }
      // pin the re-attribution cursor at the attrs version the
      // bootstrap consumed (IncrementalLakehouse.ensureReattrCursor)
      val app = "reattr-soak"
      val before = attrsVt.currentVersion().get
      // THE STORM: the first 2000 even sessions migrate to the next
      // customer — every one was already aggregated, most hold one of
      // their old customer's extremes, so the retract genuinely
      // triggers the dirty-group recompute (no netting, no defusal)
      attrsVt.update(
        col("session_id").cast(LongType) < StormSessions * 2,
        Map("customer_id" -> concat(lit("c"),
          ((col("session_id").cast(LongType) % 500000L + 1L) % 500000L)
            .cast("string"))))
      val head = attrsVt.currentVersion().get
      val touched = attrsVt.changeFeed(before + 1L, head)
        .select(col("session_id")).distinct().persist()
      def bounded(v: Long): DataFrame =
        attrsVt.readAt(v).join(broadcast(touched), Seq("session_id"), "left_semi")
      val (reattrMs, landed) = timed(
        ivm.reattributeCustomer360(touched, bounded(before), bounded(head),
          attrsVt.readAt(head), (app, head)))
      require(landed.isDefined, s"re-attribution must land at n=$n")
      touched.unpersist(blocking = false)

      // computation-only A/B of the dirty recompute lineage: dirty
      // customers = both sides of the storm's migration (bounded by the
      // storm, not the table)
      val dirty = attrsVt.changeFeed(before + 1L, head)
        .select(col("customer_id")).distinct().persist()
      dirty.count()
      val rollup = ivm.sessionRollupMv.read()
      val attrsFull = attrsVt.read()
      // min of 2: this host's wall noise (steal + GC weather) is the
      // same-order as the lineages themselves at the small decades
      def minOf2(f: => Unit): Double = Seq(timed(f)._1, timed(f)._1).min
      val naiveMs = minOf2(
        authAgg(prep(attrsFull)(rollup)
          .join(broadcast(dirty), Seq("customer_id"), "left_semi"))
          .queryExecution.toRdd.count(): Unit)
      val boundedMs = minOf2 {
        val attrsDirty = attrsFull.join(dirty, Seq("customer_id"), "left_semi")
        val sess = attrsDirty.select("session_id")
        authAgg(prep(attrsDirty)(
          rollup.join(sess, Seq("session_id"), "left_semi"))
          .join(broadcast(dirty), Seq("customer_id"), "left_semi"))
          .queryExecution.toRdd.count(): Unit
      }
      dirty.unpersist(blocking = false)

      // the reference's alternative: full recompute of the rollup
      val recomputed = Gold.sessionMetrics(events.read(), attrsVt.read())
        .groupBy("customer_id")
        .agg(count(lit(1)).as("n"),
          min("session_start_ts").as("first_ts"),
          max("session_end_ts").as("last_ts"))
      val recomputeGold = VersionedTable(spark, s"$dir/recompute_gold")
      val (recomputeMs, _) = timed(recomputeGold.commitOverwrite(recomputed))

      // correctness backstop: the maintained extremes equal the
      // recompute's, group for group (the dirty recompute's risk
      // surface); counts too
      val mv = ivm.customerRollupMv.read().select(
        col("customer_id"), col("total_sessions").cast(LongType).as("n"),
        col("first_active_ts").as("first_ts"),
        col("last_active_ts").as("last_ts"))
      val rc = recomputeGold.read()
      val bad = mv.join(rc, Seq("customer_id"), "full_outer")
        .filter(!(mv("n") <=> rc("n")) ||
          !(mv("first_ts") <=> rc("first_ts")) ||
          !(mv("last_ts") <=> rc("last_ts")))
        .count()
      require(bad == 0L,
        s"$bad customer groups diverge from the recompute at n=$n")
      val nCust = rc.count()

      println(f"SOAK n=$n%9d boot=${bootMs}%9.1fms reattr=${reattrMs}%8.1fms " +
        f"naive=${naiveMs}%8.1fms bounded=${boundedMs}%8.1fms " +
        f"recompute=${recomputeMs}%9.1fms")
      rows += f"""    {"source_rows": $n, "bootstrap_ms": $bootMs%.1f, "reattr_ms": $reattrMs%.1f, "naive_auth_ms": $naiveMs%.1f, "bounded_auth_ms": $boundedMs%.1f, "full_recompute_ms": $recomputeMs%.1f, "customers": $nCust}"""
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
    }

    val json = rows.mkString(
      "{\n  \"soak\": \"bounded dimension-change repair (customer_360)\"" +
        ",\n  \"storm_sessions\": " + StormSessions +
        ",\n  \"round\": 14" +
        ",\n  \"notes\": \"What the repair replaces is bootstrap_ms: through " +
        "r13 this wave shape REFUSED and forced rebootstrapGold() — a full " +
        "gold rebuild whose wall grows with the table — while reattr_ms " +
        "is the complete maintenance event (changeFeed window, " +
        "retract/re-add delta, dirty-customer recompute, rollup merge + " +
        "commits) and stays ~flat after the first decade: several times " +
        "cheaper at 300M and diverging (see steps). The production size " +
        "gate (graft.ivm.boundedAuthMinBytes) keeps sub-GiB rollups on " +
        "the full-join recompute shape, which is what the steps time; " +
        "the bounded shape is forced and equality-pinned by " +
        "IncrementalLakehouseSpec. naive_auth_ms vs bounded_auth_ms " +
        "isolates the r14 " +
        "recompute bounding (computation-only, min of 2): naive joins the " +
        "FULL rollup with the FULL dimension because the customer key is " +
        "created by that join; bounded derives the dirty customers' " +
        "session set from the dimension's stored key first, trading the " +
        "full 22M-row shuffle for one extra dimension scan + probe. On " +
        "one box shuffle is RAM-speed, so the local A/B is a wash (the " +
        "300M sample even favors naive under GC weather); what the " +
        "bounding removes is the CLUSTER cost — a full fact-x-dimension " +
        "network shuffle per dirty storm — and it is pinned correct by " +
        "IncrementalLakehouseSpec both for dirty customers and for the " +
        "UNKNOWN-dirty fallback. full_recompute_ms re-aggregates the " +
        "whole event silver (what the reference does every run) — cheaper " +
        "than reattr at these LOCAL sizes (commit machinery dominates a " +
        "2000-row repair), but it re-reads the O(table) event silver " +
        "where reattr reads only the rollup + dimension.\"" +
        ",\n  \"steps\": [\n", ",\n", "\n  ]\n}\n")
    java.nio.file.Files.write(java.nio.file.Paths.get(outPath),
      json.getBytes("UTF-8"))
    println(s"SOAK written to $outPath")
    spark.stop()
  }
}
