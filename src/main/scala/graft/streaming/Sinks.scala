package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Shared streaming sinks. */
object Sinks {

  /** Idempotent parquet landing for a stream: each micro-batch writes
    * under a leading `_batch_id=<id>` partition with dynamic partition
    * overwrite, so a REPLAYED trigger (foreachBatch is at-least-once)
    * rewrites exactly its own subtree instead of duplicating rows.
    * `partitionCols` nest under the batch id (e.g. event_date, source).
    * One definition for every incremental landing path
    * (EventStreams.writeBronzeIncremental, DocStreams.writeCurated) so
    * the replay contract cannot drift between them.
    *
    * Layout note: readers see `_batch_id` as a partition column; a
    * one-time migration into a fresh root is required to mix this
    * layout with a pre-existing flat-partitioned directory (partition
    * discovery rejects mixed depths).
    */
  def idempotentPartitioned(df: DataFrame, outDir: String, checkpointDir: String,
      partitionCols: Seq[String]): org.apache.spark.sql.streaming.StreamingQuery = {
    // the replay key is synthetic: a pre-existing _batch_id column (any
    // case — Spark resolves case-insensitively) would be silently
    // REPLACED and its values repurposed as the overwrite key
    require(!df.columns.exists(_.equalsIgnoreCase("_batch_id")),
      "input already has a '_batch_id' column (any case)")
    df.writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        batch
          .withColumn("_batch_id", lit(batchId))
          .write
          .mode("overwrite")
          .option("partitionOverwriteMode", "dynamic")
          .partitionBy("_batch_id" +: partitionCols: _*)
          .parquet(outDir)
      }
      .option("checkpointLocation", checkpointDir)
      .start()
  }

  /** Exactly-once landing into a [[graft.ecom.VersionedTable]]: each
    * micro-batch becomes ONE atomic table version via
    * `commitAppendBatch`, which records the batch id in the manifest
    * and makes a foreachBatch REPLAY (at-least-once delivery after a
    * crash between commit and checkpoint advance) a no-op instead of a
    * duplicate version. Compared to [[idempotentPartitioned]] this
    * buys concurrent-reader snapshot isolation and time travel for the
    * landed stream — batch readers pin a version while the stream
    * keeps committing; `readAt` replays any retained trigger's state.
    */
  def versionedAppend(df: DataFrame, table: graft.ecom.VersionedTable,
      checkpointDir: String,
      app: String = graft.ecom.VersionedTable.DefaultApp)
      : org.apache.spark.sql.streaming.StreamingQuery =
    df.writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        table.commitAppendBatch(batch, batchId, app): Unit
      }
      .option("checkpointLocation", checkpointDir)
      .start()

  /** Latest-wins reduction of one CDC micro-batch: keep, per non-null
    * key tuple, the row with the greatest `seqCol` (ties broken
    * arbitrarily — feed a total order: commit LSN, kafka offset, event
    * id). Null-keyed rows are EXEMPT from the reduction — a window
    * would pool all null keys into one group and silently keep one of
    * N, while merge semantics (and the sink below) insert each of them.
    */
  def latestWins(batch: DataFrame, keys: Seq[String], seqCol: Column): DataFrame = {
    val keyed = keys.map(k => col(k).isNotNull).reduce(_ && _)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(keys.map(col): _*).orderBy(seqCol.desc)
    val rn = graft.util.Names.fresh("_graft_rn", batch.columns.toSeq)
    batch.filter(keyed)
      .withColumn(rn, row_number().over(w)).filter(col(rn) === 1).drop(rn)
      .unionByName(batch.filter(!keyed))
  }

  /** Exactly-once streaming UPSERT into a [[graft.ecom.VersionedTable]]
    * (the CDC sink: foreachBatch MERGE, latest-wins): each micro-batch
    * reduces to one row per key ([[latestWins]]) and merges as ONE
    * atomic version via `commitMergeBatch`, whose per-app batch marker
    * makes a replayed trigger a no-op. Composed with the change-feed
    * source this closes the loop: stream table-to-table with
    * row-level updates, not just appends.
    */
  def versionedUpsert(df: DataFrame, table: graft.ecom.VersionedTable,
      keys: Seq[String], seqCol: Column, checkpointDir: String,
      app: String = graft.ecom.VersionedTable.DefaultApp)
      : org.apache.spark.sql.streaming.StreamingQuery =
    df.writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        table.commitMergeBatch(latestWins(batch, keys, seqCol), keys,
          batchId, app): Unit
      }
      .option("checkpointLocation", checkpointDir)
      .start()

  /** CONTINUOUS materialized-view maintenance — the streaming face of
    * [[graft.ops.IncrementalAgg]]/[[graft.ops.IncrementalMap]]: the
    * silver table's change-data-feed STREAM is the change SIGNAL, and
    * each micro-batch fires one `refresh` call. The refresh is
    * self-windowing — it reads the feed window (last-applied marker,
    * head] itself, exactly-once through the view's txn marker — so the
    * trigger carries no payload: a replayed trigger after a crash, a
    * trigger racing a manual/scheduled refresh, or a batch whose
    * window a faster trigger already applied all collapse to marker
    * no-ops (the batch frame passed to foreachBatch is deliberately
    * unused, so its rows are never even computed). The view stays a
    * versioned TABLE maintained in O(rows changed) per trigger — what
    * Spark's own streaming aggregation over a CDF would force into
    * complete-mode output, kept incremental instead.
    */
  def mvMaintain(spark: org.apache.spark.sql.SparkSession,
      silver: graft.ecom.VersionedTable, checkpointDir: String)
      (refresh: () => Unit)
      : org.apache.spark.sql.streaming.StreamingQuery =
    spark.readStream.format("graft")
      .option("readChangeFeed", "true")
      .load(silver.tableDir)
      .writeStream
      .foreachBatch { (_: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        refresh()
      }
      .option("checkpointLocation", checkpointDir)
      .start()

  /** [[mvMaintain]] for a DURABLE materialized view: the definition
    * (source binding included) comes from the spec the view's own table
    * properties carry ([[graft.ops.MvSpec]], written by `CALL
    * graft.system.create_mv`) — the streaming maintainer can no longer
    * drift from what the SQL surface created, because neither re-states
    * the algebra.
    */
  def mvMaintainStored(spark: org.apache.spark.sql.SparkSession,
      view: graft.ecom.VersionedTable, checkpointDir: String)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    val spec = graft.ops.MvSpec.load(view).getOrElse(
      throw new IllegalArgumentException(
        s"${view.tableDir} carries no stored materialized-view definition " +
          "— create it with CALL graft.system.create_mv (or MvSpec.store) " +
          "before attaching the streaming maintainer"))
    mvMaintain(spark, graft.ecom.VersionedTable(spark, spec.source),
      checkpointDir)(() => spec.refresh(spark, view): Unit)
  }
}
