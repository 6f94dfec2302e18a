package graft.ecom

import java.nio.charset.StandardCharsets
import java.util.UUID

import scala.collection.mutable.ArrayBuffer

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, Row, SaveMode, SparkSession}
import org.apache.spark.sql.functions.{col, input_file_name, max, min}
import org.apache.spark.sql.types.{ByteType, DataType, IntegerType, LongType, ShortType, StructType}

/** Minimal versioned parquet+manifest table format — the observable
  * Delta-Lake semantics the reference claims (`README.md:10` "ACID
  * transactions, schema enforcement"; every notebook writes
  * `format("delta")`, `01_bronze/01_bronze_ingest.py:34`) rebuilt on
  * plain parquet plus an atomically-committed manifest, because the
  * sandbox ships no Delta/Iceberg jars. Layout:
  *
  * {{{
  *   <tableDir>/_graft_log/v00000001.manifest   # one per committed version
  *   <tableDir>/data/c-<uuid>/...               # one immutable dir per commit
  * }}}
  *
  * A manifest is self-contained: header + schema JSON + the FULL list of
  * data files visible at that version (no log replay, no checkpoint
  * needed). The commit protocol gives the three Delta properties users
  * actually observe:
  *
  *  - '''Atomic overwrite/append''': data files land in a fresh
  *    `data/c-<uuid>/` dir that no manifest references, then the new
  *    manifest is published by a single atomic `rename` into the log. A
  *    crash (or rename refusal) anywhere before that rename leaves the
  *    previous version live and the half-written files invisible —
  *    pinned by VersionedTableSpec on a rename-refusing filesystem,
  *    extending CompactFaultSpec's harness.
  *  - '''Snapshot isolation''': readers resolve a manifest's explicit
  *    file list at plan time; commits never mutate or delete existing
  *    commit dirs (only [[vacuum]] does, explicitly), so a DataFrame
  *    pinned before a concurrent overwrite keeps reading its snapshot.
  *  - '''Time travel''': [[readAt]] replays any retained version
  *    byte-identically, because data files are immutable.
  *  - '''Data skipping''': with `statsColumns` set, each commit records
  *    per-file [min, max] for those (integral) columns in the manifest,
  *    and [[readRange]] prunes whole files whose range cannot match —
  *    Delta's file-statistics skipping on the manifest layer. Stats are
  *    advisory: a file without them is read conservatively, and the
  *    exact predicate is always applied on top.
  *
  * Concurrent writers use optimistic concurrency exactly like Delta's
  * log: both compute `next = current + 1`; the filesystem `rename`
  * refuses an existing destination, the loser re-reads the log and
  * retries at a higher version. At 100 TB the manifest is O(files) —
  * the same cost Delta pays in its JSON log — and data-file IO is all
  * bulk parquet; the log path touches only tiny manifest files.
  *
  * One sink style per table: the plain [[Lakehouse.write]] overwrite
  * deletes the whole table dir, log included — pick versioned OR plain
  * for a given table, not both.
  */
final case class VersionedTable(
    spark: SparkSession,
    tableDir: String,
    format: String = "parquet",
    partitionCol: Option[String] = None,
    statsColumns: Seq[String] = Nil) {

  private val logDir = s"$tableDir/_graft_log"
  private def fs: FileSystem =
    new Path(tableDir).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private val ManifestRe = "^v(\\d{8})\\.manifest$".r
  private def manifestPath(version: Long): Path =
    new Path(logDir, f"v$version%08d.manifest")

  /** All retained versions, ascending. */
  def versions(): Seq[Long] = {
    val dir = new Path(logDir)
    if (!fs.exists(dir)) Seq.empty
    else fs.listStatus(dir).toSeq.flatMap(st => st.getPath.getName match {
      case ManifestRe(n) => Some(n.toLong)
      case _ => None
    }).sorted
  }

  def currentVersion(): Option[Long] = versions().lastOption

  /** Commit `df` as a new version that REPLACES the table contents. */
  def commitOverwrite(df: DataFrame): Long = commit(df, replace = true, batch = None)

  /** Commit `df` as a new version that APPENDS to the current contents.
    * The new version's schema is `df`'s; older commits' files are read
    * back through it (missing columns null-filled, extra ones dropped).
    */
  def commitAppend(df: DataFrame): Long = commit(df, replace = false, batch = None)

  /** The streaming-sink commit: append `df` as the version for micro-
    * batch `batchId`, EXACTLY ONCE — if the current manifest already
    * records `batchId` (a foreachBatch replay after a crash between
    * commit and checkpoint advance), nothing is written and None
    * returns. foreachBatch replays only the LAST batch, so checking the
    * head manifest suffices; a crash mid-commit (files written, manifest
    * not renamed) leaves the batch unrecorded and the replay re-commits,
    * with the half-written files invisible until vacuum.
    */
  def commitAppendBatch(df: DataFrame, batchId: Long): Option[Long] =
    if (currentBatchId().contains(batchId)) None
    else Some(commit(df, replace = false, batch = Some(batchId)))

  /** The micro-batch id recorded by the newest version, if it was
    * committed through [[commitAppendBatch]].
    */
  def currentBatchId(): Option[Long] =
    currentVersion().flatMap(v => readManifest(v).batch)

  private def commit(df: DataFrame, replace: Boolean, batch: Option[Long]): Long = {
    fs.mkdirs(new Path(logDir))
    // 1. write the data files into a commit dir no manifest references —
    //    invisible to every reader until the manifest rename publishes it
    val commitRel = s"data/c-${UUID.randomUUID()}"
    val commitAbs = s"$tableDir/$commitRel"
    val w = df.write.format(format).mode(SaveMode.ErrorIfExists)
    partitionCol.fold(w)(w.partitionBy(_)).save(commitAbs)
    val newFiles = listDataFiles(commitAbs).map(f => s"$commitRel/$f")
    val newStats = collectFileStats(df, commitRel, commitAbs)
    // 2. CAS publish loop: losing a race surfaces as rename->false (the
    //    destination version already exists); re-read the log and retry
    //    one version higher. A rename refused for any OTHER reason also
    //    retries, then aborts with the previous version still live.
    var attempt = 0
    while (true) {
      val prev = currentVersion()
      val next = prev.getOrElse(0L) + 1
      val carriedM = if (replace) None else prev.map(readManifest)
      val carried = carriedM.fold(Seq.empty[String])(_.files)
      val carriedStats = carriedM.fold(Map.empty[String, Map[String, (Long, Long)]])(_.stats)
      val tmp = new Path(logDir, s".tmp-${UUID.randomUUID()}")
      writeManifest(tmp, df.schema.json, batch, carried ++ newFiles,
        carriedStats ++ newStats)
      if (fs.rename(tmp, manifestPath(next))) return next
      fs.delete(tmp, false)
      attempt += 1
      require(attempt < 20,
        s"could not publish version after $attempt attempts — " +
          s"previous snapshot ${prev.fold("(none)")(v => s"v$v")} is still live; " +
          s"uncommitted files left invisible at $commitRel (vacuum reclaims them)")
    }
    -1L // unreachable
  }

  /** Latest snapshot. The returned DataFrame is pinned to the version
    * current at call time: a subsequent commitOverwrite does not change
    * what it reads.
    */
  def read(): DataFrame = readAt(currentVersion().getOrElse(
    throw new IllegalArgumentException(s"$tableDir has no committed version")))

  /** Time-travel read: the table exactly as of `version`. Byte-identical
    * to what [[read]] returned then — data files are immutable and only
    * [[vacuum]] removes them.
    */
  def readAt(version: Long): DataFrame = {
    val m = readManifest(version)
    loadFiles(m.schema, m.files)
  }

  /** Data-skipping read: the rows of the current version with
    * `lo <= column <= hi`, touching ONLY the files whose committed
    * per-file [min, max] for `column` can overlap the range — Delta's
    * file-statistics pruning on the manifest layer. Files with no
    * recorded stats for `column` (all-null file, or committed before
    * the column joined [[statsColumns]]) are read conservatively; the
    * exact predicate is applied on top either way, so pruning can only
    * remove IO, never rows.
    */
  def readRange(column: String, lo: Long, hi: Long): DataFrame =
    readRangeAt(currentVersion().getOrElse(
      throw new IllegalArgumentException(s"$tableDir has no committed version")),
      column, lo, hi)

  def readRangeAt(version: Long, column: String, lo: Long, hi: Long): DataFrame = {
    val m = readManifest(version)
    val keep = m.files.filter { f =>
      m.stats.get(f).flatMap(_.get(column)) match {
        case Some((mn, mx)) => mx >= lo && mn <= hi
        case None => true
      }
    }
    loadFiles(m.schema, keep).filter(col(column) >= lo && col(column) <= hi)
  }

  private def loadFiles(schema: StructType, files: Seq[String]): DataFrame =
    if (files.isEmpty) {
      spark.createDataFrame(spark.sparkContext.emptyRDD[Row], schema)
    } else {
      // one read per commit dir: basePath recovers the partition column
      // from each dir's own layout, then unionByName aligns commits
      // whose schemas evolved additively
      val byCommit = files.groupBy(_.split('/').take(2).mkString("/")).toSeq.sortBy(_._1)
      val perCommit = byCommit.map { case (dir, fl) =>
        spark.read.format(format)
          .option("basePath", s"$tableDir/$dir")
          .load(fl.map(f => s"$tableDir/$f"): _*)
      }
      val unioned = perCommit.reduce(_.unionByName(_, allowMissingColumns = true))
      // the manifest schema governs column order and types (partition
      // values round-trip through dir names; the cast undoes partition
      // type inference for non-inferable originals like string dates)
      unioned.select(schema.map(f => col(f.name).cast(f.dataType).as(f.name)): _*)
    }

  /** Drop all but the newest `keepVersions` manifests and every commit
    * dir no retained manifest references. This — and only this — breaks
    * time travel (and any reader still pinned) beyond the horizon.
    * Manifests are deleted BEFORE data dirs so a crash mid-vacuum leaves
    * orphan data (harmless, re-vacuumable), never a manifest pointing at
    * missing files.
    */
  def vacuum(keepVersions: Int = 1): Unit = {
    require(keepVersions >= 1, s"keepVersions must be >= 1, got $keepVersions")
    val vs = versions()
    val dropped = vs.dropRight(keepVersions)
    val kept = vs.takeRight(keepVersions)
    val referenced: Set[String] =
      kept.flatMap(v => readManifest(v).files).map(_.split('/').take(2).mkString("/")).toSet
    dropped.foreach { v =>
      require(fs.delete(manifestPath(v), false), s"vacuum: could not delete manifest v$v")
    }
    val dataPath = new Path(s"$tableDir/data")
    if (fs.exists(dataPath)) fs.listStatus(dataPath).foreach { st =>
      val rel = s"data/${st.getPath.getName}"
      if (!referenced.contains(rel))
        require(fs.delete(st.getPath, true), s"vacuum: could not delete $rel")
    }
  }

  // ---- manifest + listing plumbing ------------------------------------

  /** Data files under `dir`, as paths relative to `dir`. Skips Spark's
    * `_SUCCESS` markers and hidden files.
    */
  private def listDataFiles(dir: String): Seq[String] = {
    val base = new Path(dir).toUri.getPath
    val buf = ArrayBuffer.empty[String]
    // manual listStatus recursion, NOT fs.listFiles: listFiles wraps each
    // entry in a LocatedFileStatus, which loads permissions eagerly and
    // (on RawLocalFileSystem under a custom scheme) dies in `new
    // File(uri)` — the same fs shape the fault-injection specs use
    def walk(p: Path): Unit = fs.listStatus(p).foreach { st =>
      val name = st.getPath.getName
      if (st.isDirectory) walk(st.getPath)
      else if (!name.startsWith("_") && !name.startsWith(".")) {
        val f = st.getPath.toUri.getPath
        require(f.startsWith(base + "/"), s"listed file $f escapes commit dir $base")
        buf += f.drop(base.length + 1)
      }
    }
    walk(new Path(dir))
    buf.toSeq.sorted
  }

  /** Per-file [min, max] of each stats column for the files just
    * written — the data-skipping metadata [[readRange]] prunes on. One
    * read-back scan of the NEW files only (Delta collects these inline
    * during the write; a post-scan of the committed batch is the
    * jar-free equivalent, and costs one pass over the batch, never the
    * table). Restricted to integral-typed columns: min/max serialize as
    * longs, exact in both the manifest text and the prune compare.
    * All-null files get no entry (conservatively read). Keyed by the
    * manifest-relative file path.
    */
  private def collectFileStats(df: DataFrame, commitRel: String,
      commitAbs: String): Map[String, Map[String, (Long, Long)]] = {
    if (statsColumns.isEmpty) Map.empty
    else {
      val integral: Set[Any] = Set(LongType, IntegerType, ShortType, ByteType)
      // partition columns are legal stats columns (basePath read restores
      // them), so validate against the read-back schema, not df's alone
      val back = spark.read.format(format).option("basePath", commitAbs).load(commitAbs)
      statsColumns.foreach { c =>
        val f = back.schema.fields.find(_.name == c).getOrElse(
          throw new IllegalArgumentException(s"stats column $c not in committed schema"))
        require(integral.contains(f.dataType),
          s"stats column $c is ${f.dataType.simpleString}; only integral types " +
            "serialize exactly in the manifest")
      }
      val aggs = statsColumns.flatMap(c => Seq(
        min(col(c).cast(LongType)).as(s"_mn_$c"), max(col(c).cast(LongType)).as(s"_mx_$c")))
      val base = new Path(commitAbs).toUri.getPath
      back.groupBy(input_file_name().as("_f"))
        .agg(aggs.head, aggs.tail: _*)
        .collect()
        .map { r =>
          val abs = new Path(new java.net.URI(r.getString(0))).toUri.getPath
          require(abs.startsWith(base + "/"), s"stats file $abs escapes commit dir")
          val rel = s"$commitRel/${abs.drop(base.length + 1)}"
          rel -> statsColumns.zipWithIndex.flatMap { case (c, i) =>
            if (r.isNullAt(1 + 2 * i)) None // all-null file: no prunable range
            else Some(c -> (r.getLong(1 + 2 * i), r.getLong(2 + 2 * i)))
          }.toMap
        }
        .filter(_._2.nonEmpty)
        .toMap
    }
  }

  private def writeManifest(at: Path, schemaJson: String, batch: Option[Long],
      files: Seq[String], stats: Map[String, Map[String, (Long, Long)]]): Unit = {
    val out = fs.create(at, true)
    try {
      val sb = new StringBuilder("graft-manifest-v1\n")
      sb.append("schema:").append(schemaJson).append('\n')
      batch.foreach(b => sb.append("batch:").append(b).append('\n'))
      files.foreach { f =>
        sb.append("file:").append(f).append('\n')
        // stats ride next to their file line: col \t min \t max \t path
        // (path LAST — it is the only field that could ever be exotic)
        stats.get(f).toSeq.flatMap(_.toSeq).sortBy(_._1).foreach { case (c, (mn, mx)) =>
          sb.append("stats:").append(c).append('\t').append(mn).append('\t')
            .append(mx).append('\t').append(f).append('\n')
        }
      }
      out.write(sb.toString.getBytes(StandardCharsets.UTF_8))
    } finally out.close()
  }

  /** A parsed manifest. Unknown line prefixes are ignored for forward
    * compatibility.
    */
  private case class Manifest(
      schema: StructType,
      batch: Option[Long],
      files: Seq[String],
      stats: Map[String, Map[String, (Long, Long)]])

  private def readManifest(version: Long): Manifest = {
    val p = manifestPath(version)
    require(fs.exists(p),
      s"version $version of $tableDir does not exist (never committed, or vacuumed)")
    val in = fs.open(p)
    val txt =
      try scala.io.Source.fromInputStream(in, "UTF-8").mkString
      finally in.close()
    val lines = txt.split('\n').toSeq
    require(lines.headOption.contains("graft-manifest-v1"),
      s"unrecognized manifest header in $p")
    val schema = DataType.fromJson(lines(1).stripPrefix("schema:")).asInstanceOf[StructType]
    val batch = lines.find(_.startsWith("batch:")).map(_.stripPrefix("batch:").toLong)
    val files = lines.filter(_.startsWith("file:")).map(_.stripPrefix("file:"))
    val stats = lines.filter(_.startsWith("stats:"))
      .map { l =>
        val parts = l.stripPrefix("stats:").split('\t')
        require(parts.length == 4, s"malformed stats line in $p: $l")
        (parts(3), parts(0), parts(1).toLong, parts(2).toLong)
      }
      .groupBy(_._1)
      .map { case (f, rows) => f -> rows.map(r => r._2 -> (r._3, r._4)).toMap }
    Manifest(schema, batch, files, stats)
  }
}
