package graft

/** Physical-plan assertions over the real testdata (sf0.001): these pin
  * the *scale* properties the small-SF oracle can't see — filter
  * pushdown reaching the parquet scan, column pruning, dim-side
  * broadcasts, map-side partial aggregation, top-k as
  * TakeOrderedAndProject, and whole-stage codegen coverage. A plan
  * regression here (a filter that stops pushing, a broadcast that
  * becomes a sort-merge join) is exactly the kind of change that stays
  * invisible at 60k rows and falls over at 100 TB.
  */
class PlanSpec extends SparkSuite {

  private val sf = "/root/testdata/sf0.001"

  /** Final physical plan, unwrapped from the AQE node: the adaptive
    * wrapper is childless until executed (collectLeaves would return
    * the wrapper itself) and only the final plan shows codegen stages.
    */
  private def finalPlan(name: String): org.apache.spark.sql.execution.SparkPlan = {
    val df = SparkEntry.queries(name)(spark, sf)
    df.queryExecution.toRdd.count() // materialize so AQE finalizes
    df.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
  }

  private def planOf(name: String): String = finalPlan(name).toString

  /** Every node of the executed plan, descending into AQE query stages
    * (QueryStageExec is a childless wrapper — plain collect stops there).
    */
  private def allNodes(p: org.apache.spark.sql.execution.SparkPlan): Seq[org.apache.spark.sql.execution.SparkPlan] =
    p.flatMap {
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec => q +: allNodes(q.plan)
      case n => Seq(n)
    }

  /** Parquet scan of `table` as its (untruncated) metadata map plus the
    * read schema — simpleString elides long PushedFilters lists.
    */
  private def scanMeta(name: String, table: String): (Map[String, String], String) =
    allNodes(finalPlan(name))
      .collectFirst {
        case f: org.apache.spark.sql.execution.FileSourceScanExec
            if f.metadata.get("Location").exists(_.contains(table)) =>
          (f.metadata, f.schema.fieldNames.mkString(","))
      }
      .getOrElse(fail(s"no $table scan in $name"))

  test("q12: BETWEEN predicate pushes to the orders parquet scan; unused columns pruned") {
    val (meta, readCols) = scanMeta("q12_monthly_sales_1996", "orders.parquet")
    // both range bounds reach the reader (row-group skipping at scale)
    val pushed = meta("PushedFilters")
    assert(pushed.contains("GreaterThanOrEqual(o_orderdate") && pushed.contains("LessThanOrEqual(o_orderdate"),
      s"date range not pushed: $pushed")
    // projection needs 3 of the 9 orders columns; the rest must not be read
    assert(readCols.contains("o_custkey") && readCols.contains("o_totalprice"))
    assert(!readCols.contains("o_comment") && !readCols.contains("o_clerk"),
      s"columns not pruned: $readCols")
  }

  test("q02: dim join broadcasts and top-k plans as TakeOrderedAndProject") {
    val plan = planOf("q02_top_parts_by_revenue")
    assert(plan.contains("BroadcastHashJoin"), s"part dim not broadcast:\n$plan")
    assert(!plan.contains("SortMergeJoin"), s"unexpected shuffle join:\n$plan")
    // ORDER BY ... LIMIT never globally sorts: per-partition heap + merge
    assert(plan.contains("TakeOrderedAndProject"), s"top-k not TakeOrdered:\n$plan")
    // lineitem is the 100 TB side: only the 4 needed columns may be read
    val (_, liCols) = scanMeta("q02_top_parts_by_revenue", "lineitem.parquet")
    assert(!liCols.contains("l_comment") && !liCols.contains("l_shipdate"),
      s"lineitem columns not pruned: $liCols")
  }

  test("q01: aggregation splits into partial (map-side) and final hash aggregates") {
    val plan = planOf("q01_pricing_summary")
    // partial_* before the exchange means each partition pre-reduces to
    // one row per group — shuffle traffic is |groups|, not |rows|
    assert(plan.contains("partial_sum") || plan.contains("partial_count"),
      s"no map-side partial aggregation:\n$plan")
    assert("HashAggregate".r.findAllIn(plan).size >= 2, s"agg not two-phase:\n$plan")
  }

  test("q18: whole dim chain broadcasts; fact table never sort-merge joins") {
    val plan = planOf("q18_revenue_by_nation")
    assert(plan.contains("BroadcastHashJoin"), s"dim chain not broadcast:\n$plan")
    assert(!plan.contains("SortMergeJoin"),
      s"fact side shuffled into a merge join:\n$plan")
  }

  test("q05: window dedup costs exactly one shuffle of the events table") {
    val plan = planOf("q05_latest_event_per_user")
    val shuffles = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(shuffles == 1, s"expected 1 shuffle, found $shuffles:\n$plan")
  }

  test("hot paths run inside whole-stage codegen") {
    for (q <- Seq("q01_pricing_summary", "q02_top_parts_by_revenue", "qt04_fingerprint")) {
      val plan = planOf(q)
      // codegen'd operators print with a *(stageId) prefix
      assert(plan.contains("*("), s"$q has no codegen stage:\n$plan")
    }
  }

  test("qs05: centroid relation broadcasts back onto the corpus") {
    val plan = planOf("qs05_embedding_centroid_stats")
    // if the labels x 64-doubles centroid relation fell to a sort-merge
    // join the corpus would shuffle a second time for a dim-sized build
    assert(plan.contains("BroadcastHashJoin"),
      s"qs05 centroid join must broadcast, got:\n$plan")
  }

  test("no query plans a cartesian product / surprise nested-loop join") {
    // qs01/qm05/qs04 intentionally BroadcastNestedLoopJoin: a handful of
    // broadcast probe vectors against a linear corpus scan IS the
    // brute-force baseline (qs04's int8 pass has the same probe shape).
    // qt12's nested loop is a broadcast of ONE scalar row (the corpus
    // token total joined onto every doc) — the canonical scalar-subquery
    // shape, constant-size broadcast at any corpus size.
    // Everything else must join on keys — at 100 TB an accidental
    // cartesian (e.g. a join condition that stopped being an equi-join
    // after a refactor) is the difference between hours and never.
    // qt16 broadcasts its ONE-row vocab-size aggregate the same way;
    // qt18 broadcasts two one-row frames (the 9-boundary sketch row and
    // the conservation totals) — constant-size at any corpus scale
    // qt19 broadcasts its ONE-row corpus-statistics aggregate likewise;
    // qt21's zero-fill frame is #languages rows × a broadcast 10-row range;
    // qt22 crossJoins its ONE-row corpus-total aggregate the same way.
    // qs08's ADC pass broadcasts 8 probe LUT rows against the linear
    // scan of the byte-code corpus — qs04's int8 probe shape; qs09
    // embeds qs01's brute-force pipeline verbatim (it audits it).
    val allowNested =
      Set("qs01_cosine_topk", "qm05_image_similarity", "qs04_ann_quantized_topk",
        "qt12_token_budget_mix", "qt16_bigram_lm_score", "qt18_decile_sketch",
        "qt19_bm25_topk", "qt21_lang_quality_deciles", "qt22_domain_divergence",
        "qs08_pq_ann_topk", "qs09_ann_recall_audit")
    for (name <- SparkEntry.queries.keys.toSeq.sorted) {
      val plan = SparkEntry.queries(name)(spark, sf).queryExecution.executedPlan.toString
      assert(!plan.contains("CartesianProduct"), s"$name plans a cartesian:\n$plan")
      if (!allowNested(name))
        assert(!plan.contains("BroadcastNestedLoopJoin"),
          s"$name plans a nested-loop join:\n$plan")
    }
  }

  test("runtime bloom filter injects on the fact side of a selective shuffle join") {
    // The 100 TB knob the small-SF plans never show: when a selective dim
    // filter feeds a shuffle join, Spark can build a bloom filter from the
    // creation side and push it into the fact scan, skipping most shuffle
    // write volume. Thresholds here are shrunk exactly like production
    // would NOT need to (real fact scans pass the 10 GB gate on their
    // own); what's pinned is that OUR join shape — fact ⋈ filtered dim on
    // a key equality — satisfies InjectRuntimeFilter's structural
    // requirements, so the optimization is available at scale.
    val conf = spark.conf
    val keys = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.enabled",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
      "spark.sql.autoBroadcastJoinThreshold")
    val saved = keys.map(k => k -> conf.getOption(k))
    conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
    conf.set("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0")
    conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force a shuffle join
    try {
      val li = graft.util.Tables.load(spark, sf, "lineitem")
      val ord = graft.util.Tables.load(spark, sf, "orders")
        .filter(org.apache.spark.sql.functions.col("o_orderstatus") === "F")
      val j = li.join(ord,
        org.apache.spark.sql.functions.col("l_orderkey") ===
          org.apache.spark.sql.functions.col("o_orderkey"))
        .groupBy("o_orderstatus")
        .agg(org.apache.spark.sql.functions.sum("l_quantity"))
      val optimized = j.queryExecution.optimizedPlan.toString
      assert(optimized.contains("might_contain"),
        s"no bloom filter injected into the fact side:\n$optimized")
      // and the result is unaffected by the filter (it only prunes rows
      // the join would drop anyway)
      assert(j.collect().length == 1)
    } finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None)    => conf.unset(k)
    }
  }
}
