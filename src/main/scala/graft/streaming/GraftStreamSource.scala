package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.streaming.{Offset => OffsetV1, Source}
import org.apache.spark.sql.execution.streaming.runtime.LongOffset
import org.apache.spark.sql.types.StructType

import graft.ecom.VersionedTable

/** Structured Streaming SOURCE over a versioned table's manifest log —
  * the Delta streaming-source shape (DeltaSource is also a V1 `Source`):
  * stream offsets ARE table versions, each micro-batch is
  * `readChangesBetween(lastVersion, newVersion)` (file-level changes
  * only — cost scales with the appended data, never the table), and the
  * engine's offset checkpoint plus the versioned sink's txn markers
  * give exactly-once end to end for a silver→gold hop that runs as a
  * stream:
  *
  * {{{
  * spark.readStream.format("graft").load(srcDir)
  *   .transform(Silver.eventsProjected)
  *   .writeStream.foreachBatch(EventStreams.versionedAppend(dst))...
  * }}}
  *
  * Contract mirrors [[graft.ecom.VersionedPipe]], with Delta's
  * `dataChange=false` refinement: DATA-PRESERVING versions in the
  * pending window (optimize/optimizeRange/optimizeZOrder, purgeDeletes)
  * are SKIPPED — the table can be compacted while streams read from it
  * — while a genuine rewriting op (delete/update/merge/restore that
  * drops files) throws rather than re-delivering rewritten survivors
  * as duplicate inserts ([[graft.ecom.VersionedTable.appendOnlyChanges]]).
  * The schema is frozen at stream start (Delta's rule); restart the
  * stream to pick up an additively evolved schema.
  */
final class GraftStreamSource(
    spark: SparkSession,
    vt: VersionedTable) extends Source {

  override val schema: StructType = {
    val v = vt.currentVersion().getOrElse(throw new IllegalArgumentException(
      s"${vt.tableDir} has no committed version — commit v1 before streaming from it"))
    vt.snapshotMeta(v).schema
  }

  private def ver(o: OffsetV1): Long = o.json.toLong

  override def getOffset: Option[OffsetV1] =
    vt.currentVersion().map(LongOffset.apply)

  override def getBatch(start: Option[OffsetV1], end: OffsetV1): DataFrame = {
    val from = start.map(ver).getOrElse(0L) // bootstrap: the full snapshot
    val to = ver(end)
    require(from <= to,
      s"checkpoint records v$from of ${vt.tableDir} but the table is at " +
        s"v$to — was the source reset or replaced? Restart the stream " +
        "from a fresh checkpoint (full re-read)")
    // per-version diff with data-preserving versions (optimize/purge —
    // Delta's dataChange=false) SKIPPED: the table can be compacted
    // mid-stream without a restart; genuine rewrites still refuse
    // inside appendOnlyChanges with the restart message
    org.apache.spark.sql.graft.shims.streamingDataFrame(
      spark, vt.appendOnlyChanges(from, to))
  }

  override def commit(end: OffsetV1): Unit = ()
  override def stop(): Unit = ()
  override def toString: String = s"GraftStreamSource[${vt.tableDir}]"
}

/** Structured Streaming over the ROW-LEVEL change data feed (Delta's
  * `readStream.option("readChangeFeed", "true")`): offsets are still
  * table versions, but each micro-batch is
  * `changeFeed(last + 1, new)` — inserts, deletes and update pre/post
  * images with their commit versions — so a downstream consumer can
  * MATERIALIZE the table's evolution (CDC replication, incremental
  * view maintenance), not just ingest appends. Unlike the append-only
  * source above, rewriting ops are the POINT: delete/update/merge
  * versions serve their write-time sidecars; a pre-enablement DML
  * version refuses through [[VersionedTable.changeFeed]]'s contract
  * (set `startingVersion` past the enabling commit).
  *
  * The feed schema is frozen at stream start (Delta's rule): batches
  * select exactly the frozen columns, so an additive evolution
  * mid-stream keeps flowing (new columns invisible until restart) and
  * a rename/drop refuses inside changeFeed rather than mislabeling.
  *
  * With `tracker` set (the user passed
  * `.option("schemaTrackingLocation", dir)` — Delta's shape), the
  * source instead RIDES ACROSS schema epochs with zero lost or
  * duplicated changes: the tracker records the committed position, the
  * frozen schema derives from the FIRST UNSERVED version (not the
  * head), [[getOffset]] clamps each reported offset to its epoch's end
  * so no planned window ever straddles a boundary, and at a boundary
  * the stream fails once with "restart with the SAME checkpoint" — the
  * restarted source re-freezes the next epoch's schema from the
  * tracked position and continues exactly where it stopped. (Without a
  * tracker this cannot work: a V1 source must present ONE schema per
  * run, and a fresh start has no way to know which epoch the engine's
  * private checkpoint is in.) Caveat, as Delta documents: the tracker
  * advances on source.commit, so a crash in the instant between the
  * engine's own commit-log write and the tracker write can leave the
  * tracker one batch behind; the next served or re-run batch heals it.
  */
final class GraftCdcStreamSource(
    spark: SparkSession,
    vt: VersionedTable,
    startingVersion: Long,
    tracker: Option[SchemaTracker] = None) extends Source {

  require(startingVersion >= 1,
    s"${vt.tableDir}: startingVersion must be >= 1, got $startingVersion")

  // the committed floor: versions <= floor are fully served. In-memory
  // it advances on every batch (so one run progresses epoch to epoch);
  // the tracker persists ONLY engine-confirmed positions (getBatch's
  // `from` is the engine's committed truth) so a restart can never
  // freeze a schema AHEAD of a window the engine will re-plan.
  private var floor: Long =
    math.max(startingVersion - 1L, tracker.flatMap(_.read()).getOrElse(0L))
  // what the tracker file itself holds — DISTINCT from the in-memory
  // floor, which advances eagerly at serve time: an engine-confirmed
  // position must persist even when the in-memory floor already passed it
  private var stored: Long = floor

  override val schema: StructType = {
    val head = vt.currentVersion().getOrElse(throw new IllegalArgumentException(
      s"${vt.tableDir} has no committed version — commit v1 before streaming from it"))
    // tracked mode freezes the schema of the first UNSERVED version's
    // epoch (what the next batch must present); untracked mode freezes
    // the head schema (the classic Delta rule)
    val at = if (tracker.isDefined) math.min(head, floor + 1L) else head
    StructType(vt.snapshotMeta(at).schema.fields ++ Seq(
      org.apache.spark.sql.types.StructField(
        VersionedTable.CdcTypeCol, org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField(
        VersionedTable.CdcVersionCol, org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField(
        VersionedTable.CdcTimestampCol, org.apache.spark.sql.types.TimestampType)))
  }

  private def ver(o: OffsetV1): Long = o.json.toLong

  private def advanceFloor(v: Long, persist: Boolean): Unit = {
    if (v > floor) floor = v
    if (persist && v > stored) {
      tracker.foreach(_.write(v))
      stored = v
    }
  }

  // below startingVersion there is nothing to serve yet — report no
  // offset rather than handing getBatch an inverted window. Tracked
  // mode additionally CLAMPS the offset to the current schema epoch's
  // last version, so the engine never plans a boundary-straddling
  // window and every pre-boundary change is served before the stop.
  override def getOffset: Option[OffsetV1] =
    vt.currentVersion().filter(_ >= startingVersion).map { head =>
      val clamped =
        if (tracker.isEmpty || floor >= head) head
        else vt.changeFeedSegments(floor + 1L, head).head._2
      LongOffset(clamped)
    }

  override def getBatch(start: Option[OffsetV1], end: OffsetV1): DataFrame = {
    val from = start.map(ver).getOrElse(startingVersion - 1L)
    val to = ver(end)
    require(from <= to,
      s"checkpoint records v$from of ${vt.tableDir} but the table is at " +
        s"v$to — was the source reset or replaced? Restart the stream " +
        "from a fresh checkpoint (full re-read)")
    // `from` is engine-confirmed committed truth — heal a tracker that
    // fell behind (crash between the engine's commit log and ours)
    advanceFloor(from, persist = true)
    val sameCheckpointRestart =
      "restart the stream with the SAME checkpoint to adopt the evolved " +
        "schema — schemaTrackingLocation has recorded the position, and " +
        "the restarted stream continues exactly where this one stopped"
    val batch =
      if (from == to)
        // an empty recovery batch (the engine re-plans the last window
        // after a restart with nothing new): changeFeed's own require
        // would reject the inverted (to+1, to] window — serve the empty
        // feed-schema frame it stands for
        spark.createDataFrame(spark.sparkContext.emptyRDD[
          org.apache.spark.sql.Row], schema)
      else {
        // a schema-evolution STOP, the way Delta stops a CDF stream: a
        // rename/drop/non-additive overwrite inside the pending window
        // cannot present through this stream's frozen schema — name
        // the exact restart point instead of failing inside changeFeed
        val segs = vt.changeFeedSegments(from + 1L, to)
        segs match {
          case Seq((a, b)) if a == from + 1L && b == to => ()
          case _ =>
            val resume = segs.collectFirst {
              case (x, _) if x > from + 1L => x
            }.getOrElse(to + 1L)
            throw new IllegalStateException(
              s"${vt.tableDir}: the column mapping/schema changed inside " +
                s"the pending window (v$from, v$to] — a change feed cannot " +
                "present both sides through one schema. " + (
                if (tracker.isDefined) sameCheckpointRestart
                else "Restart the stream " +
                  s"with a fresh checkpoint and .option(\"startingVersion\", " +
                  s"$resume) to continue past the boundary " +
                  s"(legal sub-windows: ${segs.mkString(", ")})"))
        }
        val feed = vt.changeFeed(from + 1L, to)
        val missing = schema.fieldNames.filterNot(feed.columns.contains)
        if (missing.nonEmpty) {
          // the boundary stop: the pending window's epoch differs from
          // this stream's frozen schema. Tracked mode: one stop/start on
          // the same checkpoint continues losslessly. Untracked: this is
          // the recovery shape (a restarted source froze the HEAD schema
          // over pre-rename windows) — name the restart point.
          val resume = vt.changeFeedSegments(math.max(from + 1L, 1L))
            .lastOption.map(_._1)
          throw new IllegalStateException(
            s"${vt.tableDir}: column(s) ${missing.mkString(", ")} of this " +
              "stream's schema do not exist in the pending window " +
              "(renamed/dropped past this stream's frozen schema) — " + (
              if (tracker.isDefined) sameCheckpointRestart
              else "restart the stream with a fresh checkpoint" +
                resume.fold("")(r => s" and .option(\"startingVersion\", $r)") +
                " to adopt the evolved schema"))
        }
        feed.select(schema.fieldNames.map(org.apache.spark.sql.functions.col)
          .toIndexedSeq: _*)
      }
    // the window was servable: advance the IN-MEMORY floor so this run's
    // next getOffset moves into the following epoch (V1's commit() call
    // timing is engine-internal — progress must not depend on it). NOT
    // persisted: if this batch fails downstream, a restart must re-plan
    // it, and a persisted `to` would freeze the wrong epoch over it.
    advanceFloor(to, persist = false)
    org.apache.spark.sql.graft.shims.streamingDataFrame(spark, batch)
  }

  override def commit(end: OffsetV1): Unit =
    advanceFloor(ver(end), persist = true)
  override def stop(): Unit = ()
  override def toString: String =
    s"GraftCdcStreamSource[${vt.tableDir}, starting=$startingVersion" +
      tracker.fold("")(t => s", tracking=${t.dir}") + "]"
}

/** The schema tracker behind `option("schemaTrackingLocation", dir)` —
  * one small file recording the last COMMITTED table version, written
  * through a temp-file rename so a torn write can never be read back.
  * It is keyed to (and must be private to) ONE stream, exactly like a
  * checkpoint directory — Delta's schemaTrackingLocation contract.
  */
final class SchemaTracker(spark: SparkSession, val dir: String) {
  private val path = new org.apache.hadoop.fs.Path(dir, "graft-schema-track")
  private def fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)

  def read(): Option[Long] =
    if (!fs.exists(path)) None
    else {
      val in = fs.open(path)
      try {
        val s = new String(
          org.apache.hadoop.io.IOUtils.readFullyToByteArray(in),
          java.nio.charset.StandardCharsets.UTF_8).trim
        if (s.isEmpty) None else Some(s.toLong)
      } finally in.close()
    }

  def write(v: Long): Unit = {
    val tmp = new org.apache.hadoop.fs.Path(dir,
      s".graft-schema-track.${java.util.UUID.randomUUID()}.tmp")
    val out = fs.create(tmp, true)
    try out.write(v.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
    // local/HDFS rename-over semantics differ; delete-then-rename is
    // fine here — a reader finding NO file falls back to the
    // startingVersion floor, and the engine's own checkpoint (getBatch's
    // `from`) re-heals the tracker on the next batch
    if (fs.exists(path)) fs.delete(path, false)
    if (!fs.rename(tmp, path))
      throw new IllegalStateException(s"could not publish schema tracker $path")
  }
}

object SchemaTracker {

  /** Construction-time realignment of a schema tracker with the
    * ENGINE's committed position, read from the stream's own
    * offset/commit logs (`metadataPath` is `<checkpoint>/sources/<i>`,
    * so the logs are two levels up). The tracker is written from
    * engine-confirmed positions during the run, but V1 `commit()`
    * timing is engine-internal: a clean stop (or a crash) right after
    * the engine's commit-log write can leave the tracker one batch
    * behind. When the lag does not change the frozen schema, the
    * tracker silently catches up; when it DOES (the committed batch
    * ended exactly at a schema boundary), the tracker is fixed and the
    * stream fails once asking for a same-checkpoint restart — Delta's
    * schemaTrackingLocation behavior — because analysis already froze
    * the stale epoch's schema for this run.
    */
  def realign(vt: graft.ecom.VersionedTable, trackDir: String,
      metadataPath: String, startingVersion: Long): Unit = {
    val committed = committedOffsetFromEngineLogs(vt.spark, metadataPath)
      .getOrElse(return) // no committed batch yet — nothing to realign
    val tracker = new SchemaTracker(vt.spark, trackDir)
    val tracked = math.max(tracker.read().getOrElse(0L), startingVersion - 1L)
    if (tracked >= committed) return
    val head = vt.currentVersion().getOrElse(return)
    def frozenAt(floor: Long): org.apache.spark.sql.types.StructType =
      vt.snapshotMeta(math.min(head, math.max(startingVersion, floor + 1L))).schema
    val sameSchema = frozenAt(tracked) == frozenAt(committed)
    tracker.write(committed)
    if (!sameSchema)
      throw new IllegalStateException(
        s"$trackDir: the schema tracker was behind the stream's checkpoint " +
          s"(committed table version $committed) across a schema boundary — " +
          "it has been realigned; restart the stream with the SAME " +
          "checkpoint to adopt the evolved schema")
  }

  /** The engine's committed offset for THIS source, from the
    * checkpoint's commit + offset logs (HDFSMetadataLog text format:
    * "v1", a metadata line, then one serialized offset per source).
    * None when unreadable or no batch has committed — callers fall
    * back to the tracker alone.
    */
  def committedOffsetFromEngineLogs(spark: SparkSession,
      metadataPath: String): Option[Long] = scala.util.Try {
    val srcPath = new org.apache.hadoop.fs.Path(metadataPath)
    val srcIndex = srcPath.getName.toInt
    val ckptRoot = srcPath.getParent.getParent
    val fs = ckptRoot.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val commits = new org.apache.hadoop.fs.Path(ckptRoot, "commits")
    if (!fs.exists(commits)) return None
    val lastCommitted = fs.listStatus(commits).map(_.getPath.getName)
      .flatMap(n => scala.util.Try(n.toLong).toOption)
    if (lastCommitted.isEmpty) return None
    val offsetsFile = new org.apache.hadoop.fs.Path(ckptRoot,
      s"offsets/${lastCommitted.max}")
    val in = fs.open(offsetsFile)
    val lines = try scala.io.Source.fromInputStream(in, "UTF-8")
      .getLines().toVector finally in.close()
    // line 0: "v1"; line 1: OffsetSeqMetadata json; line 2+i: source i
    val off = lines(2 + srcIndex).trim
    if (off == "-") None else Some(off.toLong)
  }.toOption.flatten
}
