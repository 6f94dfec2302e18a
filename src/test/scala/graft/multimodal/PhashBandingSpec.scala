package graft.multimodal

import org.apache.spark.sql.functions._

import graft.SparkSuite
import graft.multimodal.MediaOps.MediaRow
import graft.queries.LlmMultimodal

/** Pins qm11's banding construction against brute force: 4×16-bit bands
  * with Hamming-≤2 ball probes must find EXACTLY the pairs a brute-force
  * all-pairs join finds at the τ=10 verify (pigeonhole: ≤10 flipped bits
  * over 4 bands leaves some band with ≤2 flips — recall 1.0, no
  * approximation at the contract radius).
  */
class PhashBandingSpec extends SparkSuite {
  import spark.implicits._

  test("banded near-dup pairs equal brute force at the tau=10 contract") {
    val rnd = new scala.util.Random(41)
    // 120 random ≥300-byte images (well past the 8×8 pooling minimum)…
    val base = (0 until 120).map { i =>
      MediaRow(i.toLong, "image", Array.fill(300 + rnd.nextInt(200))(rnd.nextInt(256).toByte))
    }
    // …plus 30 planted near-dups: a copy with 1-3 single-byte edits —
    // one pixel moves one gray cell slightly, so the hash moves a few
    // bits, landing the pair inside (or near) the verify radius
    val twins = (0 until 30).map { i =>
      val src = base(i).payload.clone()
      (0 to rnd.nextInt(3)).foreach(_ => src(rnd.nextInt(src.length)) = rnd.nextInt(256).toByte)
      MediaRow(1000L + i, "image", src)
    }
    val media = spark.createDataset(base ++ twins)
    val sig = MediaOps.decodePhashes(MediaOps.wrapAsBmp(media)).toDF()
      .select("media_id", "phash").cache()
    try {
      val banded = LlmMultimodal.phashNearDupPairs(sig)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
      val brute = sig.as("a").join(sig.as("b"), col("a.media_id") < col("b.media_id"))
        .select(col("a.media_id"), col("b.media_id"),
          bit_count(col("a.phash").bitwiseXOR(col("b.phash"))).as("h"))
        .filter(col("h") <= 10)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
      assert(banded == brute,
        s"banding must lose nothing at tau=10: banded ${banded.size} vs brute ${brute.size}")
      // the planted twins make the contract non-vacuous
      assert(brute.count { case (a, b, _) => b == a + 1000L } >= 20,
        s"expected most planted twins inside the radius, got ${brute.size} pairs")
    } finally sig.unpersist()
  }

  test("bmpPhash drops sub-8x8 grids and is stable under the BMP round-trip") {
    // 30 bytes -> 10 pixels -> 3x4 grid: no 8x8 structure, must drop
    val tiny = MediaRow(1L, "image", Array.fill(30)(7.toByte))
    assert(MediaOps.bmpPhash(1L, MediaOps.Bmp.build(tiny.payload)).isEmpty)
    // determinism: same payload -> same hash, twice
    val payload = Array.tabulate(400)(i => (i * 31 % 256).toByte)
    val h1 = MediaOps.bmpPhash(2L, MediaOps.Bmp.build(payload))
    val h2 = MediaOps.bmpPhash(2L, MediaOps.Bmp.build(payload.clone()))
    assert(h1.isDefined && h1 == h2)
    assert(h1.get.phash >= 0L, "63-bit hash: bit 63 always clear")
  }
}
