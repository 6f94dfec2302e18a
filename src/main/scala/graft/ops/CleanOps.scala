package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Cleaning / normalization operators (reference: silver-layer semantics,
  * `/root/reference/02_silver/02_silver_transform.py:41-69`).
  */
object CleanOps {

  /** ID normalization: canonicalizes IDs that CSV inference read as
    * floats — "1050.0" -> "1050". Non-numeric strings become NULL (and are
    * then dropped by not-null filters — reference semantics we preserve).
    * Reference: clean_id, `02_silver/02_silver_transform.py:41-42`.
    * try_cast because Spark 4 is ANSI by default and would throw on
    * non-numeric input, where the reference's PySpark cast yields NULL.
    * CONTRACT: the double round-trip is exact only up to 2^53 —
    * integer ids beyond that silently lose low bits (the reference's
    * float cast has the identical bound; deliberate parity).
    */
  def cleanId(c: Column): Column =
    c.try_cast("double").try_cast("long").cast("string")

  /** Dedup-keep-latest: keep exactly one row per key, the one ranked first
    * by `order` (callers pass e.g. `Seq(col("_ingest_ts").desc, tieBreak)`
    * — always include a unique tie-break column for determinism).
    * Reference: `02_silver/02_silver_transform.py:66-69` (the only window
    * function in the reference).
    *
    * Scale note: one hash-shuffle on the key; at 100 TB prefer running it
    * after a partition-pruning filter, and make sure the key isn't skewed
    * (AQE skew handling applies since this is a window over a shuffle).
    */
  def dedupLatest(df: DataFrame, keys: Seq[String], order: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(order: _*)
    // collision-proof scratch name: a user column named _rn must survive
    val rn = graft.util.Names.fresh("_rn", df.columns)
    df.withColumn(rn, row_number().over(w))
      .filter(col(rn) === 1)
      .drop(rn)
  }

  /** Not-null gate on primary-key columns (reference drops such rows). */
  def requireKeys(df: DataFrame, keys: Seq[String]): DataFrame =
    keys.foldLeft(df)((d, k) => d.filter(col(k).isNotNull))
}
