package graft.queries

import graft.SparkSuite
import graft.multimodal.MediaOps
import graft.util.Tables

/** Pins the cache lifecycle of the three query families that persist an
  * intermediate relation:
  *  - qd04/qd09's signature relation and qm05's feature relation follow
  *    the documented CALLER-OWNS-THE-CACHE contract — one `.unpersist()`
  *    by the caller must leave the shared cache manager empty;
  *  - qs03 builds and releases its own corpus cache internally, so a
  *    plain invocation must leave nothing behind.
  * Without these pins a library caller (anything that isn't Bench/Verify
  * with their between-query clearCache) accumulates executor storage on
  * every invocation.
  */
class CacheContractSpec extends SparkSuite {

  private val dir = "/root/testdata/sf0.001"

  test("lshSignatures: caller unpersist leaves the cache manager empty") {
    spark.catalog.clearCache()
    val sig = LlmDedup.lshSignatures(Tables.load(spark, dir, "documents"))
    val pairs = LlmDedup.lshVerifiedPairs(sig)
    assert(pairs.count() >= 0)
    assert(!spark.sharedState.cacheManager.isEmpty,
      "signature relation should be cached while in use")
    sig.unpersist(blocking = true)
    assert(spark.sharedState.cacheManager.isEmpty,
      "caller-owns-the-cache: one unpersist must release everything")
  }

  test("imageFeatures: caller unpersist leaves the cache manager empty") {
    spark.catalog.clearCache()
    val media = MediaOps.mediaFromDocuments(spark, Tables.load(spark, dir, "documents"))
    val feats = LlmMultimodal.imageFeatures(media)
    assert(LlmMultimodal.imageSimilarityTop(feats).count() >= 0)
    assert(!spark.sharedState.cacheManager.isEmpty,
      "feature relation should be cached while in use")
    feats.unpersist(blocking = true)
    assert(spark.sharedState.cacheManager.isEmpty,
      "caller-owns-the-cache: one unpersist must release everything")
  }

  test("qs03 releases its corpus cache before returning") {
    spark.catalog.clearCache()
    val result = LlmSimilarity.qs03.fn(spark, dir)
    assert(spark.sharedState.cacheManager.isEmpty,
      "the k-means corpus cache must be released once the eager passes finish")
    assert(result.count() > 0)
    assert(spark.sharedState.cacheManager.isEmpty,
      "acting on the returned frame must not re-cache anything")
  }
}
