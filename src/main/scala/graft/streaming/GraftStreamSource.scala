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
  */
final class GraftCdcStreamSource(
    spark: SparkSession,
    vt: VersionedTable,
    startingVersion: Long) extends Source {

  require(startingVersion >= 1,
    s"${vt.tableDir}: startingVersion must be >= 1, got $startingVersion")

  override val schema: StructType = {
    val v = vt.currentVersion().getOrElse(throw new IllegalArgumentException(
      s"${vt.tableDir} has no committed version — commit v1 before streaming from it"))
    StructType(vt.snapshotMeta(v).schema.fields ++ Seq(
      org.apache.spark.sql.types.StructField(
        VersionedTable.CdcTypeCol, org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField(
        VersionedTable.CdcVersionCol, org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField(
        VersionedTable.CdcTimestampCol, org.apache.spark.sql.types.TimestampType)))
  }

  private def ver(o: OffsetV1): Long = o.json.toLong

  // below startingVersion there is nothing to serve yet — report no
  // offset rather than handing getBatch an inverted window
  override def getOffset: Option[OffsetV1] =
    vt.currentVersion().filter(_ >= startingVersion).map(LongOffset.apply)

  override def getBatch(start: Option[OffsetV1], end: OffsetV1): DataFrame = {
    val from = start.map(ver).getOrElse(startingVersion - 1L)
    val to = ver(end)
    require(from <= to,
      s"checkpoint records v$from of ${vt.tableDir} but the table is at " +
        s"v$to — was the source reset or replaced? Restart the stream " +
        "from a fresh checkpoint (full re-read)")
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
                "present both sides through one schema. Restart the stream " +
                s"with a fresh checkpoint and .option(\"startingVersion\", " +
                s"$resume) to continue past the boundary " +
                s"(legal sub-windows: ${segs.mkString(", ")})")
        }
        val feed = vt.changeFeed(from + 1L, to)
        val missing = schema.fieldNames.filterNot(feed.columns.contains)
        if (missing.nonEmpty) {
          // the recovery shape: this (re)started source froze the HEAD
          // schema but the checkpoint still points at pre-rename
          // windows — name the first post-boundary version to restart at
          val resume = vt.changeFeedSegments(math.max(from + 1L, 1L))
            .lastOption.map(_._1)
          throw new IllegalStateException(
            s"${vt.tableDir}: column(s) ${missing.mkString(", ")} of this " +
              "stream's schema do not exist in the pending window " +
              "(renamed/dropped between the checkpoint and the head) — " +
              "restart the stream with a fresh checkpoint" +
              resume.fold("")(r => s" and .option(\"startingVersion\", $r)") +
              " to adopt the evolved schema")
        }
        feed.select(schema.fieldNames.map(org.apache.spark.sql.functions.col)
          .toIndexedSeq: _*)
      }
    org.apache.spark.sql.graft.shims.streamingDataFrame(spark, batch)
  }

  override def commit(end: OffsetV1): Unit = ()
  override def stop(): Unit = ()
  override def toString: String =
    s"GraftCdcStreamSource[${vt.tableDir}, starting=$startingVersion]"
}
