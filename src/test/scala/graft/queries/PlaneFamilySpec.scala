package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** The LSH plane family's independence contract and the pack-shard
  * hash's overflow envelope — both found by review, both silent-failure
  * modes at exactly the corpus sizes the operators advertise.
  */
class PlaneFamilySpec extends SparkSuite {
  import spark.implicits._

  test("every (table, plane) hyperplane pattern is distinct across the whole grid") {
    // The pre-fix % 19 family had only 19 patterns TOTAL: tables were
    // correlated from np=6 and identical at np >= 19, so the multi-table
    // OR-construction added zero recall at large-corpus plane counts.
    // The odd-multiplier mix is a bijection on Z_2^32, so patterns can
    // only collide if (p, t) collide.
    val grid = for {
      t <- 0 until LlmSimilarity.KnnTables
      (plane, p) <- LlmSimilarity.tablePlanes(t, LlmSimilarity.KnnMaxPlanes).zipWithIndex
    } yield (t, p, plane.toSeq)
    val distinctPatterns = grid.map(_._3).distinct.size
    assert(distinctPatterns == grid.size,
      s"only $distinctPatterns distinct hyperplanes out of ${grid.size} — tables are correlated")
    // and the coefficients actually span a wide range (a degenerate
    // small-modulus family clusters in a handful of values)
    val coeffs = grid.flatMap(_._3).distinct
    assert(coeffs.size > 1000, s"coefficient diversity collapsed: ${coeffs.size} values")
  }

  test("pack shard hash: ids past the 64-bit product cliff still land in [0, shards)") {
    // doc_id * K overflows signed 64-bit from doc_id ~ 3.47e9 — the
    // pre-fix formula went negative in Spark (15 distinct 'shards') and
    // ERRORED in DuckDB. The mod-first form must agree engine-free.
    val ids = Seq(0L, 1L, 4000000000L, 3470000000L, Long.MaxValue / 2, 999999999999L)
    ids.foreach { id =>
      val s = LlmText.shardOfId(id)
      assert(s >= 0 && s < LlmText.PackShards, s"id $id -> shard $s")
    }
    // column and scalar definitions agree, including past the cliff
    val df = ids.toDF("doc_id").select(col("doc_id"),
      LlmText.shardCol(col("doc_id")).as("shard")).collect()
    df.foreach(r => assert(r.getLong(1) == LlmText.shardOfId(r.getLong(0)),
      s"column/scalar shard mismatch for id ${r.getLong(0)}"))
  }
}
