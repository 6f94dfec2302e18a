package graft.queries

import org.apache.spark.sql.DataFrame

import graft.SparkSuite

/** Pins qs06's two scale contracts on synthetic corpora that straddle
  * the plane-count breakpoints:
  *
  *  1. candidate volume per vector is governed by JoinTargetBucket, NOT
  *     corpus size — growing the corpus 4× past an np breakpoint must
  *     not grow per-vector candidates the way a fixed-plane LSH would
  *     (4×); that was round 6's scale defect.
  *  2. recall at the DESIGN similarity: a planted near-duplicate
  *     (cos ≈ 0.96) must surface in its twin's top-3 for ≥90% of
  *     planted pairs — the multi-table OR-construction is what holds
  *     this while buckets shrink.
  */
class KnnJoinScaleSpec extends SparkSuite {
  import spark.implicits._

  // deterministic gaussian-ish corpus (sum of 12 uniforms, fixed seed)
  private def corpus(n: Int, seed: Long): Seq[(Long, Array[Float])] = {
    val rnd = new scala.util.Random(seed)
    def gauss(): Float = ((0 until 12).map(_ => rnd.nextDouble()).sum - 6.0).toFloat
    (0 until n).map(i => (i.toLong, Array.fill(64)(gauss())))
  }

  private def df(rows: Seq[(Long, Array[Float])]): DataFrame =
    rows.toDF("vec_id", "embedding")

  test("candidate volume per vector survives a 4x corpus growth") {
    val small = corpus(2048, seed = 7)
    val big = corpus(8192, seed = 11)
    val npSmall = LlmSimilarity.joinPlanes(small.size) // 8 (2^8 * 8 = 2048)
    val npBig = LlmSimilarity.joinPlanes(big.size) // 10 (2^10 * 8 = 8192)
    assert(npSmall == 8 && npBig == 10, "corpora must straddle an np breakpoint")
    val avgSmall =
      LlmSimilarity.knnCandidates(df(small), npSmall).count().toDouble / small.size
    val avgBig =
      LlmSimilarity.knnCandidates(df(big), npBig).count().toDouble / big.size
    // fixed planes would make avgBig ~4x avgSmall; the scaled index must
    // hold it roughly flat (2x allows bucket-balance noise)
    assert(avgBig <= 2.0 * avgSmall,
      s"candidates/vector grew with the corpus: $avgSmall -> $avgBig")
    // and the absolute level is the designed one: L tables x (np+1)
    // probes x a bucket that averages <= 2*JoinTargetBucket
    val cap = LlmSimilarity.KnnTables * (npBig + 1) * 2.0 * LlmSimilarity.JoinTargetBucket
    assert(avgBig <= cap, s"candidates/vector $avgBig above design cap $cap")
  }

  test("planted near-duplicates are recalled at >=90% through an np breakpoint") {
    val rnd = new scala.util.Random(13)
    def gauss(): Double = (0 until 12).map(_ => rnd.nextDouble()).sum - 6.0
    val base = corpus(4000, seed = 17) // np=9: past a breakpoint
    // 200 twins: base + 0.3*noise -> cos ~ 0.96 against an 8-ish-norm base
    val twins = (0 until 200).map { i =>
      val b = base(i)._2
      (100000L + i, b.map(x => (x + 0.3 * gauss()).toFloat))
    }
    val out = LlmSimilarity.knnJoin(df(base ++ twins))
      .filter($"vec_id" >= 100000L)
      .select("vec_id", "neighbor_id")
      .collect()
      .groupBy(_.getLong(0))
      .view.mapValues(_.map(_.getLong(1)).toSet).toMap
    val recalled = (0 until 200).count { i =>
      out.getOrElse(100000L + i, Set.empty[Long]).contains(i.toLong)
    }
    assert(recalled >= 180, s"planted-pair recall ${recalled / 200.0} < 0.9")
  }
}
