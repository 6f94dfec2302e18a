package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions.{coalesce, col, lit, sum, when}

import graft.ecom.VersionedTable

/** Incremental view maintenance for grouped COUNT/SUM aggregates over a
  * change-data-feed-enabled versioned table — the 100 TB gold-refresh
  * pattern: a refresh costs O(rows changed since the last refresh),
  * never O(table). (The reference recomputes its gold tables from the
  * full silver scan each run, `03_gold/03_gold_aggregate.py` — correct
  * at notebook scale, quadratic-in-time at warehouse scale.)
  *
  * Scope is the classically IVM-maintainable algebra: per-group row
  * COUNT and SUMs (averages derive as sum/count at query time). MIN/MAX
  * are deliberately NOT offered — under deletes they are not
  * incrementally maintainable without per-group history, so offering
  * them here would be a silent full-recompute in disguise.
  *
  * Mechanics, all on existing primitives:
  *  - the delta of a feed window is one map-side aggregation: +1/+x for
  *    `insert`/`update_postimage` rows, −1/−x for `delete`/
  *    `update_preimage` rows, grouped by the aggregate keys — groups
  *    whose delta nets to zero drop out;
  *  - the delta MERGEs into the gold table via the clause matrix:
  *    a matched group whose count would hit zero DELETEs (groups vanish
  *    exactly when their last row does), otherwise counts/sums ADD;
  *    unmatched groups INSERT;
  *  - exactly-once via the gold table's txn marker (`ivm:<silver dir>`
  *    → last applied silver version): a replayed refresh is a no-op,
  *    a crashed one re-applies the same window idempotently, and two
  *    racing refreshes resolve through the merge's CAS conflict.
  *
  * SUM columns should be exact types (integral or DECIMAL): incremental
  * accumulation reorders float additions, so a DOUBLE measure would
  * drift from a single-pass recompute by float association. Nulls in
  * measures count as zero contribution (SQL SUM skips them; a group
  * whose every measure is null holds sum 0 here vs SQL's NULL — the one
  * documented deviation).
  */
object IncrementalAgg {

  /** The txn-marker namespace recording the last applied source version. */
  def appFor(silver: VersionedTable): String = s"ivm:${silver.tableDir}"

  /** Per-group (key → count/sum deltas) of a change frame: one
    * map-side-combined aggregation, zero-net groups dropped. `changes`
    * carries the source's columns plus `_change_type`.
    */
  def delta(changes: DataFrame, keys: Seq[String], countCol: String,
      sums: Map[String, Column]): DataFrame = {
    require(keys.nonEmpty, "incremental aggregate needs at least one key")
    require((keys ++ Seq(countCol) ++ sums.keys).distinct.size ==
      keys.size + 1 + sums.size,
      s"keys/$countCol/sum columns must not collide")
    val sgn = when(col(VersionedTable.CdcTypeCol)
      .isin("insert", "update_postimage"), 1L).otherwise(-1L)
    val aggs = sum(col("_graft_sgn")).as(countCol) +:
      sums.toSeq.sortBy(_._1).map { case (o, e) =>
        sum(e * col("_graft_sgn")).as(o)
      }
    val d = changes.withColumn("_graft_sgn", sgn)
      .groupBy(keys.map(col): _*)
      .agg(aggs.head, aggs.tail: _*)
    // a group whose count AND every sum net to zero is unchanged —
    // null sums (all-null measures) are zero contribution
    val nonZero = (col(countCol) =!= 0L) +:
      sums.keys.toSeq.map(o => coalesce(col(o), lit(0)) =!= 0)
    d.filter(nonZero.reduce(_ || _))
  }

  /** Apply every source version since the last refresh to `gold`.
    * Returns the gold version landed, or None when already current (a
    * replay, or no new source commits). The FIRST refresh bootstraps:
    * the full source snapshot reads as one all-inserts change frame and
    * lands with the marker, so subsequent refreshes are incremental —
    * after that, only the feed window [last+1, head] is ever read.
    */
  def refresh(gold: VersionedTable, silver: VersionedTable, keys: Seq[String],
      countCol: String, sums: Map[String, Column]): Option[Long] = {
    val app = appFor(silver)
    val head = silver.currentVersion().getOrElse(return None)
    val last = gold.currentBatchId(app)
    if (last.exists(_ >= head)) return None
    // a dst with versions but NO marker was not bootstrapped by this
    // maintenance loop — merging a bootstrap into foreign rows would
    // silently double counts; refuse instead
    require(last.isDefined || gold.currentVersion().isEmpty,
      s"${gold.tableDir} has committed versions but no '$app' marker — " +
        "refresh only maintains aggregates it bootstrapped; point it at " +
        "a fresh gold table")
    val changes = last match {
      case Some(v) => silver.changeFeed(v + 1L, head)
      case None => silver.readAt(head)
        .withColumn(VersionedTable.CdcTypeCol, lit("insert"))
    }
    val d = delta(changes, keys, countCol, sums)
    if (gold.currentVersion().isEmpty)
      // first-ever commit: the delta IS the table, marker attached
      gold.commitAppendBatch(d, head, app)
    else {
      import VersionedTable.{MergeDelete, MergeInsert, MergeUpdate, MergeWhen}
      val t = (c: String) => col("t").getField(c)
      val s = (c: String) => col("s").getField(c)
      def add(c: String): Column =
        coalesce(t(c), lit(0)) + coalesce(s(c), lit(0))
      val measureCols = countCol +: sums.keys.toSeq.sorted
      try Some(gold.mergeClauses(d, keys,
        matched = Seq(
          // the group's last row left: the group leaves gold with it
          MergeWhen(Some(t(countCol) + s(countCol) === 0L), MergeDelete),
          MergeWhen(None, MergeUpdate(
            measureCols.map(c => c -> add(c)).toMap))),
        notMatched = Seq(MergeWhen(None, MergeInsert(
          (keys.map(k => k -> s(k)) ++ measureCols.map(c => c -> s(c))).toMap))),
        txn = Some((app, head)))) catch {
        // a racing refresh applied this window first — already current
        case _: VersionedTable.ReplayLandedException => None
      }
    }
  }
}
