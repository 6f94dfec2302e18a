package graft.util

import org.apache.spark.sql.{Column, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.{lit, udaf, xxhash64}

/** A classic bloom filter over Spark's `xxhash64`, double-hashed
  * (Kirsch–Mitzenmacher: position_i = h1 + i·h2 mod m), used by
  * [[graft.ecom.VersionedTable]] for per-file point-lookup skipping —
  * the high-cardinality complement to min/max stats (Delta/Iceberg's
  * bloom filter indexes): on a column whose values are spread across
  * every file, min/max can never prune, a per-file bloom usually can.
  *
  * The SCAN side computes the two 64-bit hashes with the codegen'd
  * `xxhash64` function (any atomic input type) and the aggregation is a
  * plain bitwise-OR-mergeable [[Aggregator]] — map-side combinable, one
  * pass over the committed batch. The PROBE side re-computes the same
  * two hashes for a literal and tests the stored bits on the driver
  * (pruning is a planning-time decision, like Delta reading its log).
  * Determinism: xxhash64 is a fixed published algorithm, so build and
  * probe agree across sessions; the probe literal must be cast to the
  * column's declared type first (xxhash64 of INT 5 and BIGINT 5
  * differ).
  */
object BloomSketch {

  /** The two hash columns for `c` that feed [[agg]] — the probe side
    * (VersionedTable.readPointAt) calls this same function on the cast
    * literal, so build and probe agree by construction.
    */
  def hashCols(c: Column): (Column, Column) = (xxhash64(c), xxhash64(lit(1), c))

  /** Bit position of probe `i` in an `nBits`-bit filter. Unsigned mod:
    * h1 + i·h2 wraps freely in 64 bits.
    */
  private def position(h1: Long, h2: Long, i: Int, nBits: Int): Int =
    java.lang.Long.remainderUnsigned(h1 + i.toLong * h2, nBits.toLong).toInt

  def add(bits: Array[Long], k: Int, h1: Long, h2: Long): Unit = {
    var i = 0
    while (i < k) {
      val p = position(h1, h2, i, bits.length * 64)
      bits(p >>> 6) |= (1L << (p & 63))
      i += 1
    }
  }

  def mightContain(bits: Array[Long], k: Int, h1: Long, h2: Long): Boolean = {
    var i = 0
    while (i < k) {
      val p = position(h1, h2, i, bits.length * 64)
      if ((bits(p >>> 6) & (1L << (p & 63))) == 0L) return false
      i += 1
    }
    true
  }

  def toBytes(bits: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(bits.length * 8)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bits.foreach(bb.putLong)
    bb.array()
  }

  def fromBytes(bytes: Array[Byte]): Array[Long] = {
    require(bytes.length % 8 == 0, s"bloom byte length ${bytes.length} not a multiple of 8")
    val bb = java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    Array.fill(bytes.length / 8)(bb.getLong)
  }

  /** Bitwise-OR-mergeable bloom build over (h1, h2) hash pairs. `nBits`
    * must be a multiple of 64.
    */
  final class Agg(nBits: Int, k: Int)
      extends Aggregator[(Long, Long), Array[Long], Array[Byte]] {
    require(nBits > 0 && nBits % 64 == 0, s"nBits must be a positive multiple of 64: $nBits")
    require(k >= 1, s"need at least one hash probe: $k")
    def zero: Array[Long] = new Array[Long](nBits / 64)
    def reduce(b: Array[Long], in: (Long, Long)): Array[Long] = {
      add(b, k, in._1, in._2); b
    }
    def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
      var i = 0
      while (i < a.length) { a(i) |= b(i); i += 1 }
      a
    }
    def finish(b: Array[Long]): Array[Byte] = toBytes(b)
    def bufferEncoder: org.apache.spark.sql.Encoder[Array[Long]] =
      ExpressionEncoder[Array[Long]]()
    def outputEncoder: org.apache.spark.sql.Encoder[Array[Byte]] = Encoders.BINARY
  }

  /** The bloom-build column for `c`: a binary [[toBytes]] image of the
    * filter over the group's values (nulls hash in harmlessly — an
    * equality probe never looks for null).
    */
  def agg(c: Column, nBits: Int, k: Int): Column = {
    val u = udaf(new Agg(nBits, k),
      Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong))
    val (h1, h2) = hashCols(c)
    u(h1, h2)
  }
}
