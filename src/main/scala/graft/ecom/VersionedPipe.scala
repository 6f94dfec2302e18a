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
  * per-app transaction marker (namespace [[App]], the same mechanism
  * the streaming sink uses for exactly-once,
  * [[VersionedTable.commitAppendBatch]]) records the last PROCESSED
  * source version. The write and the progress marker are therefore one
  * atomic rename —
  *
  *  - crash before the commit: nothing landed, nothing recorded, the
  *    retry reprocesses the same window;
  *  - replayed step after a successful commit: the recorded marker
  *    equals the window's end version, so the commit is a no-op;
  *  - two CONCURRENT steps (overlapping scheduler fires): identical
  *    windows collapse idempotently at the publish CAS, and a stale
  *    window (the other runner advanced the marker further) raises
  *    `ConcurrentModificationException` instead of appending twice —
  *    exactly-once end to end, with no two-phase anything.
  *
  * The marker lives in its own app namespace, so a streaming sink (or
  * maintenance commits, which carry all markers) on the same
  * destination cannot clobber the pipe's replay detection.
  *
  * At 100 TB this is the difference between a silver refresh that reads
  * yesterday's appended partitions and one that rescans the table: cost
  * scales with the CHANGE volume, never the table — including the
  * safety check, which reads exactly two manifests per step
  * ([[VersionedTable.filesRemovedBetween]]), not the history.
  *
  * The source window must be append-only IN EFFECT: every file of the
  * window's start version must still be referenced at its end
  * (metadata-only ops and merge-on-read deletes pass — they re-deliver
  * nothing, though MoR deletions are naturally not retracted from the
  * destination; a rewriting delete/update/merge/optimize/restore in
  * the window throws rather than re-delivering rewritten survivors as
  * duplicate inserts). A bootstrap (nothing processed yet) reads the
  * full snapshot, which is correct regardless of the source's earlier
  * history. `transform` must be stateless per-batch (map/filter/
  * project — anything where f(a ∪ b) = f(a) ∪ f(b)); aggregations
  * belong in a downstream full-refresh model or a streaming state
  * store.
  */
object VersionedPipe {

  /** The pipe's transaction-marker namespace on the destination. */
  val App: String = "graft-pipe"

  /** Process everything committed to `src` since the last step, through
    * `transform`, into one atomic append on `dst`. Returns the new
    * destination version, or None if `src` has nothing new (or a replay
    * already landed this window). Throws if the pending window rewrites
    * or removes source files (see class doc), or if `dst` records a
    * source version newer than `src` has (a vacuumed/reset source).
    *
    * Legacy-marker migration: pipes built before the per-app namespaces
    * recorded their progress under the DEFAULT slot (legacy bare
    * `batch:<id>` manifest lines parse there). If the destination has a
    * default-slot marker but no '[[App]]' marker, a silent bootstrap
    * would re-append the ENTIRE source history as duplicates — so the
    * step REFUSES with a migration error unless `adoptLegacyMarker` is
    * set, in which case the default-slot value is taken as the last
    * processed source version and the step's own commit writes the
    * properly-namespaced marker (migration and progress land in one
    * atomic rename). NEVER set the flag for a destination whose
    * default-slot marker was written by a streaming SINK (not this
    * pipe): sink batch ids are unrelated to source versions, so
    * adopting one would silently skip an arbitrary source prefix. For
    * that case — a destination legitimately co-written by a DefaultApp
    * sink that this pipe has never stepped — pass `bootstrapFromZero`
    * instead: it ignores the default-slot marker and bootstraps the
    * pipe from the full current source snapshot (from = v0), which is
    * correct for a fresh pipe regardless of what else writes to `dst`.
    * The two flags are mutually exclusive.
    */
  def step(src: VersionedTable, dst: VersionedTable,
      transform: DataFrame => DataFrame = identity,
      adoptLegacyMarker: Boolean = false,
      bootstrapFromZero: Boolean = false): Option[Long] = {
    require(!(adoptLegacyMarker && bootstrapFromZero),
      "adoptLegacyMarker and bootstrapFromZero are mutually exclusive: " +
        "adopt when the default-slot marker IS this pipe's old progress; " +
        "bootstrap when it belongs to another writer (e.g. a streaming sink)")
    val from = dst.currentBatchId(App).orElse {
      if (bootstrapFromZero) None
      else dst.currentBatchId(VersionedTable.DefaultApp).map { legacy =>
        if (!adoptLegacyMarker)
          throw new IllegalStateException(
            s"destination has no '$App' progress marker but carries a " +
              s"default-slot marker ($legacy) — likely a pipe built before " +
              "per-app namespaces. Bootstrapping now would re-append the " +
              "entire source as duplicates. If the default marker was " +
              "written by this pipe, re-run with adoptLegacyMarker = true " +
              "to migrate it; if it belongs to another writer (e.g. a " +
              "streaming sink) and this pipe has genuinely never stepped, " +
              "re-run with bootstrapFromZero = true; otherwise rebuild " +
              "the destination.")
        legacy
      }
    }.getOrElse(0L)
    val to = src.currentVersion().getOrElse(0L)
    require(from <= to,
      s"destination has processed source v$from but source is at v$to — " +
        "was the source table reset or replaced?")
    if (to == from) return None
    val removed = src.filesRemovedBetween(from, to)
    require(removed.isEmpty,
      s"source window (v$from, v$to] rewrites or removes ${removed.size} " +
        s"file(s) (ops in window: ${windowOps(src, from, to)}) — an " +
        "incremental step would re-deliver their rewritten rows; " +
        "rebuild the destination from a full read instead")
    dst.commitAppendBatch(transform(src.readChangesBetween(from, to)), to, App)
  }

  /** Error-path diagnostics only: name the window's operations. */
  private def windowOps(src: VersionedTable, from: Long, to: Long): String =
    src.history().filter(v => v.version > from && v.version <= to)
      .map(v => s"v${v.version}:${v.op}").mkString(", ")
}
