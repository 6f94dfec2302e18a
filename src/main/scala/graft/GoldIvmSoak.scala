package graft

import java.nio.file.Files

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.ecom.{Gold, GoldIvm, VersionedTable}

/** Scale soak for the REFERENCE-workload IVM ([[graft.ecom.GoldIvm]]):
  * the customer_360 two-level cascade (per-session rollup with min/max
  * → per-customer rollup off the rollup's feed) maintained over event
  * silvers of growing size, against the full recompute the reference
  * notebook performs every run (`03_gold_aggregate.py:163-232` —
  * Gold.sessionMetrics + the customer rollup).
  *
  * Each decade applies the SAME absolute storm (updates + deletes +
  * appends — deletes force the bounded dirty-group min/max recompute,
  * the expensive honest case) and times ONE incremental refresh vs the
  * full recompute. The claim: refresh wall stays flat while recompute
  * grows with the table — the crossover is what makes the versioned
  * format + CDF pay off on the reference's own gold models.
  *
  * Usage: sbt "runMain graft.GoldIvmSoak [out.json]"
  */
object GoldIvmSoak {

  private val Decades = Seq(10000000L, 100000000L, 300000000L)
  private val EventsPerSession = 20L
  private val ChangedRows = 2000L

  def main(args: Array[String]): Unit = {
    val outPath = args.headOption.getOrElse("SOAK_r13_gold_ivm.json")
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

    val rows = ArrayBuffer.empty[String]
    Decades.foreach { n =>
      val nSessions = n / EventsPerSession
      val dir = Files.createTempDirectory(s"graft-givm-soak-$n").toString
      // q43-shaped events: 2-dec money, 3 event types, CONTIGUOUS
      // sessions of 20 events (id/20) with event time increasing in id
      // — so a session's extreme events are its first/last ids
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
      // attrs over even sessions (odd fall back to UNKNOWN), ~2
      // sessions per customer
      val attrs = spark.range(nSessions).filter(col("id") % 2 === 0).selectExpr(
        "CAST(id AS STRING) AS session_id",
        "CONCAT('c', CAST(id % 500000 AS STRING)) AS customer_id",
        "timestamp_seconds(1699999999) AS session_start_ts",
        "'web' AS device", "'ads' AS source", "'US' AS country")
      attrs.persist().count()

      val ivm = GoldIvm(spark, dir)
      def refresh(): Unit = {
        val (l1, l2) = ivm.refreshCustomer360(events, attrs)
        require(l1.isDefined && l2.isDefined, s"refresh must land at n=$n")
      }
      val (bootMs, _) = timed(refresh())
      // the SAME absolute storm per decade: INTERIOR amount updates
      // (preimages sit strictly inside each session's time range — the
      // threat analysis merges them with no source scan), whole-session
      // deletes (count-to-zero — DELETE, no scan), late appends. The
      // adversarial delete-the-extreme case pays a key-filtered scan by
      // design; its correctness is spec-pinned (IncrementalAggMinMaxSpec).
      events.update(
        col("event_id").cast("long") < ChangedRows * 20 &&
          (col("event_id").cast("long") % EventsPerSession).between(5, 14),
        Map("amount_usd" -> (col("amount_usd") + 1.0)))
      events.delete(col("event_id").cast("long").between(n / 2, n / 2 + 999))
      events.commitAppend(eventsOf(spark.range(n, n + ChangedRows)))
      val (refreshMs, _) = timed(refresh())
      // what the refresh replaced: the notebook's full recompute of the
      // session metrics + customer rollup over the whole silver, landed
      // through the SAME versioned-commit sink the pipeline uses for
      // gold (q41's medallion path) — both sides pay identical storage
      // machinery, so the delta is scan+re-aggregate vs window+merge
      val recomputed = Gold.sessionMetrics(events.read(), attrs)
        .groupBy("customer_id")
        .agg(count(lit(1)).as("n"), sum("session_revenue").as("rev"),
          sum("has_purchased").as("orders"),
          min("session_start_ts").as("first_ts"),
          max("session_end_ts").as("last_ts"))
      val recomputeGold = VersionedTable(spark, s"$dir/recompute_gold")
      val (recomputeMs, _) = timed(recomputeGold.commitOverwrite(recomputed))
      val nCust = recomputeGold.read().count()
      val maintained = ivm.customerRollupMv.read().count()
      require(maintained == nCust,
        s"maintained customer groups $maintained != recompute $nCust at n=$n")
      println(f"SOAK n=$n%9d boot=${bootMs}%9.1fms refresh=${refreshMs}%9.1fms " +
        f"recompute=${recomputeMs}%9.1fms ratio=${recomputeMs / refreshMs}%6.2f")
      rows += f"""    {"source_rows": $n, "bootstrap_ms": $bootMs%.1f, "refresh_ms": $refreshMs%.1f, "full_recompute_ms": $recomputeMs%.1f, "customers": $nCust}"""
      attrs.unpersist()
      // reclaim the decade's data before the next (300M events + CoW
      // copies would otherwise stack up in /tmp)
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
    }

    val json = rows.mkString(
      "{\n  \"model\": \"customer_360 two-level cascade\"" +
        ",\n  \"changed_rows_per_decade\": " + ChangedRows +
        ",\n  \"steps\": [\n", ",\n", "\n  ]\n}\n")
    java.nio.file.Files.write(java.nio.file.Paths.get(outPath),
      json.getBytes("UTF-8"))
    println(s"SOAK written to $outPath")
    spark.stop()
  }
}
