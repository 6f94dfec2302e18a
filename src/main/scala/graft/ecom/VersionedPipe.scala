package graft.ecom

import org.apache.spark.sql.DataFrame

/** Exactly-once INCREMENTAL pipeline step between two versioned tables —
  * the scheduler-driven change-feed consumption pattern (Delta's
  * `Trigger.AvailableNow` streaming read, without a streaming runtime):
  * each invocation processes only the source versions committed since
  * the last successful step and lands the result as ONE atomic
  * destination version.
  *
  * There is no separate checkpoint store: the destination manifest's
  * batch-id field (the same field the streaming sink uses for
  * exactly-once, [[VersionedTable.commitAppendBatch]]) records the last
  * PROCESSED source version. The write and the progress marker are
  * therefore one atomic rename —
  *
  *  - crash before the commit: nothing landed, nothing recorded, the
  *    retry reprocesses the same window;
  *  - replayed step after a successful commit: the recorded batch id
  *    equals the window's end version, so the commit is a no-op —
  *    exactly-once end to end, with no two-phase anything.
  *
  * At 100 TB this is the difference between a silver refresh that reads
  * yesterday's appended partitions and one that rescans the table: cost
  * scales with the CHANGE volume, never the table.
  *
  * The source window must be append-only (`transform` sees inserted
  * rows once, so a rewriting op — delete/update/merge/optimize — in the
  * window would surface its rewritten survivors as duplicate inserts).
  * A non-append version in the window throws rather than corrupting the
  * destination; version 1 is exempt (the bootstrap commit of a table is
  * usually an overwrite, and the whole table IS the first change set).
  * `transform` must be stateless per-batch (map/filter/project —
  * anything where f(a ∪ b) = f(a) ∪ f(b)); aggregations belong in a
  * downstream full-refresh model or a streaming state store.
  */
object VersionedPipe {

  /** Process everything committed to `src` since the last step, through
    * `transform`, into one atomic append on `dst`. Returns the new
    * destination version, or None if `src` has nothing new (or a replay
    * already landed this window). Throws if the pending window contains
    * a rewriting operation (see class doc), or if `dst` records a
    * source version newer than `src` has (a vacuumed/reset source).
    */
  def step(src: VersionedTable, dst: VersionedTable,
      transform: DataFrame => DataFrame = identity): Option[Long] = {
    val from = dst.currentBatchId().getOrElse(0L)
    val to = src.currentVersion().getOrElse(0L)
    require(from <= to,
      s"destination has processed source v$from but source is at v$to — " +
        "was the source table reset or replaced?")
    if (to == from) return None
    val rewriting = src.history()
      .filter(v => v.version > math.max(from, 1L) && v.version <= to)
      .filterNot(_.op == "append")
    require(rewriting.isEmpty,
      s"source window (v$from, v$to] contains non-append operations " +
        s"${rewriting.map(v => s"v${v.version}:${v.op}").mkString(", ")} — " +
        "an incremental step would re-deliver their rewritten rows; " +
        "rebuild the destination from a full read instead")
    dst.commitAppendBatch(transform(src.readChangesBetween(from, to)), to)
  }
}
