package graft.queries

import org.apache.spark.sql.catalyst.expressions.aggregate.CollectList
import org.apache.spark.sql.catalyst.plans.LeftSemi
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Join, RepartitionByExpression}

import graft.SparkSuite

/** Plants a corpus AT qd02's document-frequency cap and pins what the
  * cap is for: a shingle shared by maxDf docs must flow through (its
  * ~df²/2 pair fan-out spread across tasks by the repartition between
  * the explodes, not concentrated in one Generate), while a shingle
  * over the cap is dropped outright — the stop-shingle whose pairs
  * carry no signal and whose posting list would otherwise put an
  * unbounded row in a single aggregation task.
  */
class JaccardSkewSpec extends SparkSuite {
  import spark.implicits._

  private val Cap = 40

  // 40 docs sharing ONE hot 3-gram ("xxx yyy zzz") plus per-doc unique
  // tails (each doc: 3 shingles, 1 shared -> pairwise jaccard 0.2), and
  // one identical pair (jaccard 1.0) as a content control.
  private def corpus = {
    val hot = (0 until Cap).map(i => (i.toLong, s"xxx yyy zzz u$i v$i"))
    val twin = Seq((1000L, "p q r s"), (1001L, "p q r s"))
    (hot ++ twin).toDF("doc_id", "text")
  }

  test("a shingle at the df cap completes with bounded, spread fan-out") {
    val out = LlmDedup.jaccardPairs(corpus, maxDf = Cap)
    // C(40,2)=780 hot pairs + the twin pair, top-100 kept by the limit
    val rows = out.collect()
    assert(rows.length == 100)
    // the identical pair outranks every cap-shingle pair
    val top = rows.head
    assert(top.getLong(0) == 1000L && top.getLong(1) == 1001L)
    assert(top.getDouble(5) == 1.0)
    // every other surviving pair is a hot-shingle pair at jaccard 0.2
    assert(rows.tail.forall(_.getDouble(5) == 0.2))
    // the spread stage is IN the plan: the once-exploded postings are
    // hash-repartitioned by the left doc before the pair explode
    assert(out.queryExecution.optimizedPlan.collect {
      case r: RepartitionByExpression => r
    }.nonEmpty, "pair fan-out must be repartitioned between the explodes")
  }

  test("a shingle over the df cap is dropped outright") {
    // same corpus, cap lowered by one: the hot shingle (df=40) now
    // exceeds maxDf=39 and must contribute NOTHING; only the twin
    // pair (df=2 shingles) survives
    val rows = LlmDedup.jaccardPairs(corpus, maxDf = Cap - 1).collect()
    assert(rows.length == 1)
    assert(rows.head.getLong(0) == 1000L && rows.head.getLong(1) == 1001L)
  }

  test("a stop-shingle with df >> cap never reaches a posting-list buffer") {
    // 200 docs all sharing one hot 3-gram — df = 20× the cap of 10.
    // The result must be as if the stop-shingle didn't exist (only the
    // twin pair survives), AND the plan must prove the df filter runs
    // BEFORE any collect_list: the old single-pass shape built the full
    // 200-entry posting list in one aggregation buffer and discarded it
    // afterwards — at corpus scale that buffer is the OOM.
    val stop = (0 until 200).map(i => (i.toLong, s"xxx yyy zzz u$i v$i"))
    val twin = Seq((1000L, "p q r s"), (1001L, "p q r s"))
    val out = LlmDedup.jaccardPairs(
      spark.createDataFrame(stop ++ twin).toDF("doc_id", "text"), maxDf = 10)
    val rows = out.collect()
    assert(rows.length == 1)
    assert(rows.head.getLong(0) == 1000L && rows.head.getLong(1) == 1001L)
    // plan pin: every collect_list aggregate sits ABOVE a left-semi join
    // (the df gate) — no unbounded list is ever aggregated
    val collectAggs = out.queryExecution.optimizedPlan.collect {
      case a: Aggregate if a.aggregateExpressions.exists(_.exists {
        case _: CollectList => true
        case _              => false
      }) => a
    }
    assert(collectAggs.nonEmpty, "expected a posting-list aggregate in the plan")
    collectAggs.foreach { a =>
      assert(a.child.collectFirst {
        case j: Join if j.joinType == LeftSemi => j
      }.nonEmpty, "collect_list must aggregate only df-gated (semi-joined) entries")
    }
  }
}
