package graft.ecom

import java.nio.charset.StandardCharsets
import java.util.UUID

import scala.collection.mutable.ArrayBuffer

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, Row, SaveMode, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.{DataType, StructType}

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
    partitionCol: Option[String] = None) {

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
    currentVersion().flatMap(v => readManifest(v)._2)

  private def commit(df: DataFrame, replace: Boolean, batch: Option[Long]): Long = {
    fs.mkdirs(new Path(logDir))
    // 1. write the data files into a commit dir no manifest references —
    //    invisible to every reader until the manifest rename publishes it
    val commitRel = s"data/c-${UUID.randomUUID()}"
    val commitAbs = s"$tableDir/$commitRel"
    val w = df.write.format(format).mode(SaveMode.ErrorIfExists)
    partitionCol.fold(w)(w.partitionBy(_)).save(commitAbs)
    val newFiles = listDataFiles(commitAbs).map(f => s"$commitRel/$f")
    // 2. CAS publish loop: losing a race surfaces as rename->false (the
    //    destination version already exists); re-read the log and retry
    //    one version higher. A rename refused for any OTHER reason also
    //    retries, then aborts with the previous version still live.
    var attempt = 0
    while (true) {
      val prev = currentVersion()
      val next = prev.getOrElse(0L) + 1
      val carried =
        if (replace) Seq.empty[String]
        else prev.map(v => readManifest(v)._3).getOrElse(Seq.empty)
      val tmp = new Path(logDir, s".tmp-${UUID.randomUUID()}")
      writeManifest(tmp, df.schema.json, batch, carried ++ newFiles)
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
    val (schema, _, files) = readManifest(version)
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
      kept.flatMap(v => readManifest(v)._3).map(_.split('/').take(2).mkString("/")).toSet
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

  private def writeManifest(at: Path, schemaJson: String, batch: Option[Long],
      files: Seq[String]): Unit = {
    val out = fs.create(at, true)
    try {
      val sb = new StringBuilder("graft-manifest-v1\n")
      sb.append("schema:").append(schemaJson).append('\n')
      batch.foreach(b => sb.append("batch:").append(b).append('\n'))
      files.foreach(f => sb.append("file:").append(f).append('\n'))
      out.write(sb.toString.getBytes(StandardCharsets.UTF_8))
    } finally out.close()
  }

  /** (schema, streaming batch id if any, file list). Unknown header
    * lines are ignored for forward compatibility.
    */
  private def readManifest(version: Long): (StructType, Option[Long], Seq[String]) = {
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
    (schema, batch, files)
  }
}
