package graft

import java.nio.file.Files

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col

import graft.ecom.VersionedTable

/** Change-data-feed scale soak: ramps one CDC-enabled table through
  * hundreds of DML versions and measures what bounds a WIDE feed window
  * at warehouse scale:
  *
  *  - the full-window read must stay O(1) parquet scans (ALL sidecars
  *    batch into one scan with a broadcast version stamp — the
  *    per-version alternative is an O(versions) union that breaks
  *    1000-version windows at plan time);
  *  - a NARROW trailing window (the CDC-stream shape: last few
  *    versions) must stay flat as history grows — reading v500..v510
  *    cannot cost more because 490 older versions exist;
  *  - feed row counts must track versions exactly (2 rows/update).
  *
  * Usage: sbt "runMain graft.CdfSoak [out.json]"
  */
object CdfSoak {

  private val RampSteps = Seq(20, 80, 320)
  private val TableRows = 8000L

  def main(args: Array[String]): Unit = {
    val outPath = args.headOption.getOrElse("SOAK_r12_cdf.json")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val dir = Files.createTempDirectory("graft-cdf-soak").toString
    val vt = VersionedTable(spark, dir)
    vt.commitOverwrite(spark.range(TableRows)
      .selectExpr("id", "id % 64 AS slot", "id * 3 AS amt"))
    vt.setTableProperty("graft.enableChangeDataFeed", "true")
    val firstDml = vt.currentVersion().get + 1

    def timed[T](f: => T): (Double, T) = {
      val t0 = System.nanoTime(); val r = f
      ((System.nanoTime() - t0) / 1e6, r)
    }
    def scansOf(df: org.apache.spark.sql.DataFrame): Int = {
      def all(p: org.apache.spark.sql.execution.SparkPlan)
          : Seq[org.apache.spark.sql.execution.SparkPlan] = p.flatMap {
        case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
          q +: all(q.plan)
        case n => Seq(n)
      }
      val top = df.queryExecution.executedPlan match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          a.executedPlan
        case p => p
      }
      all(top).count(_.isInstanceOf[
        org.apache.spark.sql.execution.FileSourceScanExec])
    }

    var dmlDone = 0
    val rows = ArrayBuffer.empty[String]
    val t0All = System.nanoTime()
    RampSteps.foreach { step =>
      while (dmlDone < step) {
        // each version updates one slot's rows: 2 feed rows per table row
        vt.update(col("slot") === (dmlDone % 64).toLong,
          Map("amt" -> (col("amt") + 1L))): Unit
        dmlDone += 1
        if (dmlDone % 40 == 0)
          println(s"SOAK dml $dmlDone/${RampSteps.last} " +
            f"(${(System.nanoTime() - t0All) / 1e9}%.0fs)")
      }
      val head = vt.currentVersion().get
      val perVersion = 2L * (TableRows / 64L) // pre+post images per update
      // full-window feed: every DML version since enablement, one scan
      val (fullMs, (fullRows, fullScans)) = (1 to 3).map(_ => timed {
        val f = vt.changeFeed(firstDml, head)
        val n = f.count()
        (n, scansOf(f))
      }).minBy(_._1)
      require(fullRows == dmlDone.toLong * perVersion,
        s"feed rows $fullRows != ${dmlDone.toLong * perVersion} at $dmlDone versions")
      require(fullScans <= 2,
        s"full-window feed used $fullScans scans at $dmlDone versions — " +
          "the sidecar batch scan regressed to per-version unions")
      // narrow trailing window (the CDC-stream shape): must stay flat
      val (narrowMs, narrowRows) = (1 to 3).map(_ => timed(
        vt.changeFeed(head - 9, head).count())).minBy(_._1)
      require(narrowRows == 10L * perVersion,
        s"narrow feed rows $narrowRows at $dmlDone versions")

      println(f"SOAK versions=$dmlDone%4d fullMs=$fullMs%8.1f " +
        f"(rows=$fullRows, scans=$fullScans) narrowMs=$narrowMs%8.1f")
      rows += f"""    {"dml_versions": $dmlDone, "feed_rows": $fullRows, "full_window_ms": $fullMs%.1f, "full_window_scans": $fullScans, "narrow10_ms": $narrowMs%.1f}"""
    }

    val json = rows.mkString(
      "{\n  \"table_rows\": " + TableRows +
        ",\n  \"rows_per_dml_version\": " + (2L * (TableRows / 64L)) +
        ",\n  \"steps\": [\n", ",\n", "\n  ]\n}\n")
    java.nio.file.Files.write(java.nio.file.Paths.get(outPath),
      json.getBytes("UTF-8"))
    println(s"SOAK written to $outPath")
    spark.stop()
  }
}
