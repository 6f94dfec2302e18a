package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions.{coalesce, col, lit, shiftleft, shiftright}
import org.apache.spark.sql.graft.shims
import org.apache.spark.sql.types.DoubleType

import graft.functions.EquiDepthBin
import graft.util.Names

/** Multi-dimensional write clustering (Delta's `OPTIMIZE ZORDER BY`,
  * reference claim `README.md:10` "optimized layouts"): order rows by a
  * Morton (Z-order) interleave of equi-depth bin ranks so that files
  * have min/max locality in EVERY clustered column at once — a
  * single-column range sort gives perfect skipping on one dimension and
  * none on the others; Z-order gives ~n-th-root locality on each of n
  * dimensions, which at 100 TB is the difference between a two-column
  * point query pruning 99% of files and pruning 0%.
  *
  * Pipeline (all distributed, nothing driver-sized but the bin
  * boundaries):
  *
  *  1. ONE `approxQuantile` pass computes 2^bits−1 equi-depth boundaries
  *     per column (rank-based, so skewed columns still spread across
  *     bins — a min/max linear scale would collapse under skew);
  *  2. each row's per-column bin is `#boundaries <= value`, one native
  *     codegen'd binary search per row ([[graft.functions.EquiDepthBin]]
  *     — no UDF, no interpreted lambdas);
  *  3. bins interleave bit-by-bit into a Morton value (LSB of every
  *     column first, so high-order z bits are the high-order bin bits
  *     of ALL columns together);
  *  4. `repartitionByRange` + `sortWithinPartitions` on the z value
  *     range-partitions the data into `numFiles` z-contiguous files.
  *
  * Rows are only reordered — never changed or dropped. NULLs rank below
  * every boundary (bin 0) and cluster together at the low end. Combine
  * with [[graft.ecom.VersionedTable]] `statsColumns` on the same
  * columns: every commit then records per-file [min, max] tight enough
  * for `readRange`/`deleteRange` to prune on ANY clustered dimension.
  */
object ZOrder {

  /** `df`'s rows, Z-order-clustered on `cols` into `numFiles` range
    * partitions. `cols` must be castable to double for ranking (the
    * output columns themselves are untouched). `bits` bins per column
    * (default 256 bins = 8 bits; 4 columns × 8 bits = 32-bit z values).
    */
  def cluster(df: DataFrame, cols: Seq[String], numFiles: Int,
      bits: Int = 8, relativeError: Double = -1): DataFrame = {
    require(cols.nonEmpty, "ZOrder.cluster needs at least one column")
    require(numFiles >= 1, s"numFiles must be >= 1, got $numFiles")
    require(bits >= 1 && bits * cols.size <= 62,
      s"bits * columns must fit a long: $bits * ${cols.size}")
    cols.foreach(c => require(df.columns.contains(c), s"no such column: $c"))
    val zc = Names.fresh("_graft_z", df.columns)
    df.withColumn(zc, zvalue(df, cols, bits, relativeError))
      .repartitionByRange(numFiles, col(zc))
      .sortWithinPartitions(zc)
      .drop(zc)
  }

  /** The Morton interleave column for `df` over `cols` — exposed so
    * specs (and custom layouts) can inspect the ordering key directly.
    */
  def zvalue(df: DataFrame, cols: Seq[String], bits: Int = 8,
      relativeError: Double = -1): Column = {
    val nBins = 1 << bits
    // the quantile sketch must RESOLVE nBins distinct ranks: its error
    // bound is also its sample spacing, so eps >= 1/(2*nBins) would
    // collapse the 2^bits boundaries onto ~1/(2*eps) distinct values
    // (first implementation did exactly that with a flat 0.01: 255
    // requested boundaries came back as ~60 distinct, and the z space
    // silently lost two bits per column). Auto = a quarter bin of rank
    // error; sketch memory stays O(nBins * log N), driver-trivial.
    val eps = if (relativeError > 0) relativeError else 1.0 / (4.0 * nBins)
    // one distributed pass for every column's equi-depth boundaries
    // (approxQuantile ignores nulls; a constant column yields one
    // boundary and everything bins together, which is correct: a
    // constant dimension carries no skipping information)
    val probs = (1 until nBins).map(_.toDouble / nBins).toArray
    val casted = df.select(cols.map(c => col(c).cast(DoubleType).as(c)): _*)
    val bounds = casted.stat.approxQuantile(cols.toArray, probs, eps)
    val bins = cols.zip(bounds).map { case (c, bs) =>
      binOf(col(c), bs.distinct.sorted)
    }
    interleave(bins, cols.size, bits)
  }

  /** Equi-depth bin rank: how many boundaries the value is >= — the
    * native codegen'd binary search [[graft.functions.EquiDepthBin]].
    * (A higher-order `aggregate` fold over an array literal runs as
    * INTERPRETED Catalyst lambdas: 12 s per pass at sf0.1 for 2 × 255
    * boundaries, paid twice because repartitionByRange evaluates its
    * key for sampling and again for the shuffle.) NULL bins to 0.
    */
  private def binOf(c: Column, boundaries: Array[Double]): Column =
    coalesce(
      shims.column(EquiDepthBin(shims.expression(c.cast(DoubleType)), boundaries)),
      lit(0))

  /** Morton interleave: bit j of column i lands at z bit `j*n + i`, so
    * the top z bits are the top bin bits of all columns together.
    */
  private def interleave(bins: Seq[Column], n: Int, bits: Int): Column = {
    val longBins = bins.map(_.cast("long"))
    val terms = for {
      j <- 0 until bits
      (b, i) <- longBins.zipWithIndex
    } yield shiftleft(shiftright(b, j).bitwiseAND(lit(1L)), j * n + i)
    terms.reduce(_ + _)
  }
}
