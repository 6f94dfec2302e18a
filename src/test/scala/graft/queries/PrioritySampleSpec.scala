package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSuite

/** qt24's two-stage (salted-thin → global window) priority sample must
  * be EXACTLY the naive one-stage global-window result — the salting is
  * a skew shield, not an approximation — and τ (the (k+1)-th priority,
  * the DLT estimator's threshold) must survive the thinning.
  */
class PrioritySampleSpec extends SparkSuite {
  import spark.implicits._

  private val k = 3

  // skewed corpus: one hot source with 500 docs, two cold ones
  private def corpus = {
    val rows =
      (1L to 500L).map(i => ("crawl_hot", i, 10L + (i % 97))) ++
        (501L to 520L).map(i => ("wiki", i, 200L + i)) ++
        Seq(("books", 991L, 5L), ("books", 992L, 9000L))
    rows.toDF("source", "doc_id", "n_chars")
  }

  private def naive(k: Int) = {
    val u = (pmod(pmod(col("doc_id") * lit(48271L), lit(2147483647L)) * lit(48271L),
      lit(2147483647L)) + lit(1L))
      .cast(DoubleType) / lit(2147483648.0)
    val wg = Window.partitionBy(col("source"))
      .orderBy(col("priority").desc, col("doc_id"))
    val wsrc = Window.partitionBy(col("source"))
    corpus
      .select(col("source"), col("doc_id"), col("n_chars"),
        (col("n_chars").cast(DoubleType) / u).as("priority"))
      .withColumn("rn", row_number().over(wg))
      .withColumn("tau", max(when(col("rn") === k + 1, col("priority"))).over(wsrc))
      .filter(col("rn") <= k)
      .select(col("source"), col("rn").cast(LongType).as("rank"),
        col("doc_id"), col("n_chars"), col("priority"),
        greatest(col("n_chars").cast(DoubleType),
          coalesce(col("tau"), lit(0.0))).as("est_weight"))
  }

  test("two-stage sample equals the one-stage global window bit-for-bit") {
    val twoStage = LlmText.prioritySample(corpus, k).orderBy("source", "rank").collect()
    val oneStage = naive(k).orderBy("source", "rank").collect()
    assert(twoStage.toSeq === oneStage.toSeq)
  }

  test("every source yields at most k rows; a short source keeps all with est_weight = weight") {
    val out = LlmText.prioritySample(corpus, k)
    val counts = out.groupBy("source").count().as[(String, Long)].collect().toMap
    assert(counts.values.forall(_ <= k))
    // books has 2 < k+1 docs: no τ exists, so the estimator degrades to
    // the raw weight
    val books = out.filter(col("source") === "books")
      .select(col("n_chars").cast(DoubleType), col("est_weight"))
      .as[(Double, Double)].collect()
    assert(books.length === 2)
    books.foreach { case (w, est) => assert(est === w) }
  }

  test("stage-1 thinning bounds the hot source's rows entering the global window") {
    // replicate stage 1 standalone: each (source, salt) cell keeps <= k+1
    val u = (pmod(pmod(col("doc_id") * lit(48271L), lit(2147483647L)) * lit(48271L),
      lit(2147483647L)) + lit(1L))
      .cast(DoubleType) / lit(2147483648.0)
    val wLocal = Window.partitionBy(col("source"), col("_salt"))
      .orderBy(col("priority").desc, col("doc_id"))
    val thinned = corpus
      .select(col("source"), col("doc_id"), col("n_chars"),
        (col("n_chars").cast(DoubleType) / u).as("priority"))
      .withColumn("_salt", pmod(col("doc_id"), lit(16L)))
      .withColumn("_lrn", row_number().over(wLocal))
      .filter(col("_lrn") <= k + 1)
    val hot = thinned.filter(col("source") === "crawl_hot").count()
    assert(hot <= 16L * (k + 1), s"hot source leaked $hot rows past stage 1")
    assert(hot < 500L)
  }
}
