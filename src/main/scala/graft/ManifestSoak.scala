package graft

import java.nio.file.Files

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.SparkSession

import graft.ecom.VersionedTable

/** 50k-file manifest-scale soak: the empirical check behind the
  * stats-sidecar architecture (VERDICT r11 item 1). Ramps one versioned
  * table to 51k data files across 25 commits, and at each decade
  * measures what actually bounds 100 TB planning:
  *
  *  - driver-held skipping metadata (manifest stats/bloom map entries)
  *    must stay at the DELTA TAIL size, not O(total files);
  *  - pruned SQL reads must plan through the DISTRIBUTED sidecar scan
  *    (`GraftFileIndex.lastPruneMode`) and keep pruning exactly;
  *  - post-GC heap and per-query wall time must stay flat-ish as the
  *    file count grows 12×.
  *
  * Usage: sbt "runMain graft.ManifestSoak [out.json]"
  * (SPARK_GRAFT_CPUS env knob; ~51k tiny files under java.io.tmpdir.)
  */
object ManifestSoak {

  private val FilesPerCommit = 2048
  private val RowsPerFile = 20
  private val RampSteps = Seq(2, 8, 25) // commits -> 4096 / 16384 / 51200 files

  def main(args: Array[String]): Unit = {
    val outPath = args.headOption.getOrElse("SOAK_r12_manifest.json")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // production-shaped: spill skipping metadata once the table passes
    // 1024 files (the default 4096 also works; this exercises more
    // delta-tail + sidecar-carry cycles in the same run)
    spark.conf.set("spark.graft.statsSidecarThreshold", "1024")

    val wh = Files.createTempDirectory("graft-manifest-soak").toString
    new java.io.File(s"$wh/db").mkdirs()
    spark.conf.set("spark.sql.catalog.gms", "graft.sql.GraftCatalog")
    spark.conf.set("spark.sql.catalog.gms.warehouse", wh)
    val vt = VersionedTable(spark, s"$wh/db/t",
      statsColumns = Seq("id"), bloomColumns = Seq("k"), bloomBits = 1 << 12)

    def heapMb(): Double = {
      System.gc(); System.gc()
      val rt = Runtime.getRuntime
      (rt.totalMemory() - rt.freeMemory()) / 1e6
    }

    var committed = 0
    val rows = ArrayBuffer.empty[String]
    val t0All = System.nanoTime()
    RampSteps.foreach { step =>
      while (committed < step) {
        val base = committed.toLong * FilesPerCommit * RowsPerFile
        val df = spark.range(base, base + FilesPerCommit.toLong * RowsPerFile,
            1L, FilesPerCommit)
          .selectExpr("id", "concat('k', id) AS k")
        if (committed == 0) vt.commitOverwrite(df) else vt.commitAppend(df)
        committed += 1
        if (committed % 5 == 0)
          println(s"SOAK committed $committed/${RampSteps.last} " +
            f"(${(System.nanoTime() - t0All) / 1e9}%.0fs)")
      }
      val meta = vt.snapshotMeta(vt.currentVersion().get)
      val nFiles = meta.files.size
      val driverEntries = meta.stats.size + meta.blooms.size
      val heap = heapMb()

      def timed[T](f: => T): (Double, T) = {
        val t0 = System.nanoTime(); val r = f
        ((System.nanoTime() - t0) / 1e6, r)
      }
      val total = nFiles.toLong * RowsPerFile
      // range-pruned read: 200 ids inside the LAST commit (planning is
      // a fresh index + distributed sidecar prune each statement)
      val lo = total - 500
      val (rangeMs, got) = (1 to 3).map(_ => timed(
        spark.sql(s"SELECT CAST(SUM(id) AS BIGINT) AS s FROM gms.db.t " +
            s"WHERE id BETWEEN $lo AND ${lo + 199}")
          .collect().head.getLong(0))).minBy(_._1)
      require(got == (lo to lo + 199).sum,
        s"range read wrong at $nFiles files: $got")
      val rangeMode = graft.sql.GraftFileIndex.lastPruneMode
      // bloom point read
      val probe = total - 7
      val (pointMs, hits) = (1 to 3).map(_ => timed(
        spark.sql(s"SELECT COUNT(*) AS c FROM gms.db.t WHERE k = 'k$probe'")
          .collect().head.getLong(0))).minBy(_._1)
      require(hits == 1L, s"point read wrong at $nFiles files: $hits")
      val pointMode = graft.sql.GraftFileIndex.lastPruneMode
      // full count (no pruning path; correctness of the whole ramp)
      val (countMs, n) = timed(spark.table("gms.db.t").count())
      require(n == total, s"count wrong at $nFiles files: $n vs $total")

      println(f"SOAK files=$nFiles%6d driverEntries=$driverEntries%6d " +
        f"heap=${heap}%7.1fMB range=${rangeMs}%7.1fms ($rangeMode) " +
        f"point=${pointMs}%7.1fms ($pointMode) count=${countMs}%7.1fms")
      rows += f"""    {"files": $nFiles, "driver_meta_entries": $driverEntries, "sidecar": ${meta.statsSidecar.isDefined}, "heap_mb": $heap%.1f, "range_query_ms": $rangeMs%.1f, "range_prune_mode": "$rangeMode", "point_query_ms": $pointMs%.1f, "point_prune_mode": "$pointMode", "full_count_ms": $countMs%.1f}"""
    }

    val json = rows.mkString(
      "{\n  \"files_per_commit\": " + FilesPerCommit +
        ",\n  \"rows_per_file\": " + RowsPerFile +
        ",\n  \"sidecar_threshold\": 1024,\n  \"steps\": [\n", ",\n", "\n  ]\n}\n")
    java.nio.file.Files.write(java.nio.file.Paths.get(outPath),
      json.getBytes("UTF-8"))
    println(s"SOAK written to $outPath")
    spark.stop()
  }
}
