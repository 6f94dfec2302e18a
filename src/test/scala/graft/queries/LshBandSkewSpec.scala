package graft.queries

import graft.SparkSuite

/** Plants a VIRAL band key in the LSH band equi-joins (qd04's self-join
  * and qd13's incremental new-vs-index join) and pins that Spark's AQE
  * skew-join split handles it at runtime: a boilerplate shingle family
  * that lands thousands of documents in one (band, band_key) bucket
  * must not serialize the whole bucket into a single sort-merge task at
  * 100 TB — AQE rewrites the join to read the hot partition in slices
  * (`skew=true`), with results identical by construction. Thresholds
  * are shrunk so the ~MB hot bucket trips the same logic a multi-GB
  * bucket trips in production (same harness as SkewOpsSpec's AQE pin).
  */
class LshBandSkewSpec extends SparkSuite {
  import spark.implicits._

  // signature-relation rows shaped like LlmDedup.lshSignatures output:
  // (doc_id, sig: 16 minhash values, sh: shingle set). Band 0 (sig
  // positions 1-4) carries the SAME key for every doc — the viral
  // band — while bands 1-3 stay doc-unique (no accidental candidates).
  private def sigRow(id: Long, sh: Seq[String]): (Long, Seq[Long], Seq[String]) = {
    val tail = (0 until 12).map(j => id * 31L + j * 7L + 1000L)
    (id, Seq(9L, 9L, 9L, 9L) ++ tail, sh)
  }

  private def withSkewConf[A](body: => A): A = {
    val conf = spark.conf
    val keys = Seq(
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.coalescePartitions.enabled")
    val saved = keys.map(k => k -> conf.get(k))
    conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "1")
    conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "16KB")
    conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "16KB")
    conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    try body finally saved.foreach { case (k, v) => conf.set(k, v) }
  }

  private def finalPlan(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.executedPlan.toString
      case p => p.toString
    }

  test("qd13's incremental band join: AQE splits a viral band at runtime, rows exact") {
    // 4000 index docs + 50 batch docs ALL share band 0's key; exactly
    // one batch doc is a true duplicate (same shingle set as index doc
    // 7) — every other candidate fails the exact-Jaccard verify.
    val index = (0L until 4000L).map(i => sigRow(i, Seq(s"x$i", s"y$i", s"z$i")))
      .toDF("doc_id", "sig", "sh")
    val batch = ((10001L until 10050L).map(j => sigRow(j, Seq(s"nx$j", s"ny$j", s"nz$j"))) :+
      sigRow(10000L, Seq("x7", "y7", "z7")))
      .toDF("doc_id", "sig", "sh")
    withSkewConf {
      val out = LlmDedup.lshIncrementalPairs(index, batch)
      val rows = out.collect()
      assert(rows.map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq ==
        Seq((10000L, 7L, 1.0)), "exactly the planted duplicate survives the verify")
      val plan = finalPlan(out)
      assert(plan.contains("skew=true"),
        s"AQE did not split the viral band's partition:\n${plan.take(4000)}")
    }
  }

  test("qd04's band self-join: AQE splits the viral band; verify output exact") {
    // 1500 docs share band 0's key; one twin pair is a true duplicate
    val corpus = ((0L until 1500L).map(i => sigRow(i, Seq(s"x$i", s"y$i", s"z$i"))) ++
      Seq(sigRow(9000L, Seq("p", "q", "r")), sigRow(9001L, Seq("p", "q", "r"))))
      .toDF("doc_id", "sig", "sh")
    withSkewConf {
      val out = LlmDedup.lshVerifiedPairs(corpus)
      val rows = out.collect()
      assert(rows.map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq ==
        Seq((9000L, 9001L, 1.0)), "only the twin pair clears the verify")
      val plan = finalPlan(out)
      assert(plan.contains("skew=true"),
        s"AQE did not split the viral band's partition:\n${plan.take(4000)}")
    }
  }
}
