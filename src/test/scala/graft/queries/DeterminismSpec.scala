package graft.queries

import graft.SparkSuite

/** Partition-count invariance for the round-5/6 queries whose plans are
  * order-sensitive on paper — cumulative-sum windows (qt12), score-ranked
  * windows (qd12, qd15, qs06, q38), hash-membership aggregation (qd11),
  * cross-relation band joins (qd13), global first-occurrence minima
  * (qt14), a single global ntile sort (qt15), binned interval joins
  * (q36), and the star-rewrite clustering loop (qd14). Every query must produce IDENTICAL rows (including
  * emitted order) under different shuffle parallelism: at 100 TB the
  * partition count is whatever the cluster says it is, and a result that
  * depends on it is not a result. The driver's gate runs one parallelism
  * per round; this pins the invariance per-query where it could break.
  */
class DeterminismSpec extends SparkSuite {

  private val dir = "/root/testdata/sf0.001"
  private val names =
    Seq("qd11_contamination", "qd12_cluster_keep_best", "qd13_incremental_dedup",
      "qt11_pii_redaction", "qt12_token_budget_mix",
      // qs05's float-sums-are-exact-in-double argument, pinned empirically
      "qs05_embedding_centroid_stats",
      "q36_range_join", "q38_order_rank_windows", "qd14_dedup_clusters_star",
      "qd15_semantic_dedup", "qs06_knn_join", "qt14_segment_dedup",
      "qt15_quality_deciles", "qt16_bigram_lm_score", "qm06_frame_dedup",
      "q39_funnel_sequence",
      // round 8: salted two-stage sampling windows (qt24), the stratified
      // split audit (qt25), PQ shortlist windows + driver codebook (qs08),
      // banded-candidate distinct + double signature join (qd21)
      "qt24_priority_sample", "qt25_split_audit", "qs08_pq_ann_topk",
      "qd21_minhash_calibration", "qd22_cluster_quality")

  test("order-sensitive queries emit identical rows under 2-way and 13-way shuffle parallelism") {
    val key = "spark.sql.shuffle.partitions"
    val saved = spark.conf.get(key)
    def runAll(): Map[String, Seq[String]] = names.map { n =>
      spark.catalog.clearCache() // query bodies persist intermediates
      n -> graft.SparkEntry.queries(n)(spark, dir).collect().toSeq.map(_.toString)
    }.toMap
    try {
      spark.conf.set(key, "2")
      val at2 = runAll()
      spark.conf.set(key, "13")
      val at13 = runAll()
      names.foreach { n =>
        assert(at2(n) == at13(n), s"$n changed under different parallelism")
        assert(at2(n).nonEmpty, s"$n returned no rows at sf0.001")
      }
    } finally {
      spark.conf.set(key, saved)
      spark.catalog.clearCache()
    }
  }
}
