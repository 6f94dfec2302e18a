package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** Pins the native [[SimHash]] expression bit-exactly to the
  * higher-order-function fold it replaced (TextFns.simhashFold) —
  * random arrays, negatives, empties, nulls, null elements — and its
  * degenerate-input contract (NULL array/element -> 0L, the fold's
  * null-propagation semantics the DuckDB oracles were written against).
  */
class SimHashSpec extends SparkSuite {
  import spark.implicits._

  test("native simhash equals the fold on random arrays (negatives included)") {
    val rnd = new scala.util.Random(7)
    val rows = Seq.tabulate(300) { i =>
      val n = rnd.nextInt(12)
      (i.toLong, Seq.fill(n)(rnd.nextLong() % 1000000007L)) // mixed signs
    }
    val df = rows.toDF("id", "hs")
    val got = df.select(col("id"), TextFns.simhash(col("hs")).as("x"),
        TextFns.simhashFold(col("hs"), 62).as("y"))
      .collect()
    got.foreach(r => assert(r.getLong(1) == r.getLong(2),
      s"row ${r.getLong(0)}: native ${r.getLong(1)} != fold ${r.getLong(2)}"))
  }

  test("degenerate inputs: empty -> 0, null array -> 0, null element -> 0") {
    val df = Seq(
      (1L, Some(Seq(5L, 7L, 5L))),
      (2L, Some(Seq.empty[Long])),
      (3L, Option.empty[Seq[Long]])
    ).toDF("id", "hs")
    val out = df.select(col("id"), TextFns.simhash(col("hs")).as("x"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out(2L) == 0L && out(3L) == 0L)
    assert(out(1L) == TextFnsRef.bruteSimhash(Seq(5L, 7L, 5L)))
    // null ELEMENT poisons the whole hash to 0 (fold parity)
    val withNullElem = Seq((4L, Seq(Some(5L), None, Some(7L)))).toDF("id", "hs")
    assert(withNullElem.select(TextFns.simhash(col("hs"))).head.getLong(0) == 0L)
  }

  test("small hand case: strict majority per bit") {
    // hashes 0b01, 0b01, 0b10: bit0 majority (2 of 3), bit1 minority
    assert(Seq((1L, Seq(1L, 1L, 2L))).toDF("id", "hs")
      .select(TextFns.simhash(col("hs"))).head.getLong(0) == 1L)
    // tie is NOT a majority: 0b1, 0b0 -> bit0 vote = 0 -> unset
    assert(Seq((1L, Seq(1L, 0L))).toDF("id", "hs")
      .select(TextFns.simhash(col("hs"))).head.getLong(0) == 0L)
  }
}

/** Tiny reference implementation for the spec's spot check. */
private object TextFnsRef {
  def bruteSimhash(hs: Seq[Long], bits: Int = 62): Long = {
    var out = 0L
    (0 until bits).foreach { b =>
      val vote = hs.map(h => ((h >> b) % 2L) * 2L - 1L).sum
      if (vote > 0) out |= 1L << b
    }
    out
  }
}
