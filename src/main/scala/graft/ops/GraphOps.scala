package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Small-graph iterative operators over DataFrames (the Pregel pattern
  * with driver-coordinated rounds — no graph library needed).
  */
object GraphOps {

  /** Rebase a frame on its computed RDD (LogicalRDD leaf). Iterative
    * loops MUST route every round through this: one round references
    * its input several times (~3× for propagation, ~12× for the star
    * rewrites), so composing rounds directly grows the LOGICAL plan
    * exponentially — a driver OOM by round ~10 just rendering the plan.
    * After rebasing, plans stay round-sized and the RDD lineage
    * underneath grows only linearly (recompute of an evicted partition
    * cascades at most one extra round, because each round's predecessor
    * stays persisted until superseded).
    */
  private def truncate(df: DataFrame): DataFrame =
    df.sparkSession.createDataFrame(df.rdd, df.schema)

  /** Connected components of an undirected edge list: returns
    * (node, component) where component = the minimum node id reachable
    * from `node`. Nodes are whatever type the edge columns carry (must
    * be orderable; ids in practice).
    *
    * Min-label propagation: each round joins edges to current labels,
    * takes the per-node min over neighbors, and stops at fixpoint.
    * Rounds ~ component diameter. Scale: every round is an equi-join +
    * partial-min aggregate on the EDGE list — for sparse graphs (near-
    * dup pairs, entity links) that is tiny next to the corpus that
    * produced it. Superseded label frames are unpersisted each round;
    * the edge list and final labels stay cached for the caller's
    * downstream consumption.
    *
    * Throws if not converged within `maxRounds` — a silently truncated
    * propagation would split real components, which for dedup means
    * keeping duplicate "canonical" docs.
    */
  def connectedComponents(edgesIn: DataFrame, srcCol: String, dstCol: String,
      maxRounds: Int = 50): DataFrame = {
    val pairs = edgesIn.select(col(srcCol).as("a"), col(dstCol).as("b"))
    val edges = pairs
      .unionByName(pairs.select(col("b").as("a"), col("a").as("b")))
      .persist()
    var labels = edges.select(col("a").as("node"))
      .distinct()
      .withColumn("component", col("node"))
      .persist()
    // pending = a frame persisted this round but not yet owned by
    // `labels`: if the changed-count job throws after next.persist(),
    // the catch below must release it or it leaks in executor cache
    var pending: DataFrame = null
    try {
      var changed = 1L
      var rounds = 0
      while (changed > 0 && rounds < maxRounds) {
        val prop = edges.join(labels, edges("b") === labels("node"))
          .groupBy(col("a")).agg(min(col("component")).as("min_nbr"))
        val next = truncate(labels.join(prop, labels("node") === prop("a"), "left")
          .select(col("node"),
            least(col("component"), coalesce(col("min_nbr"), col("component"))).as("component")))
          .persist()
        pending = next
        changed = next.as("n")
          .join(labels.as("o"), col("n.node") === col("o.node"))
          .filter(col("n.component") =!= col("o.component"))
          .count() // materializes next's cache, so the old frame is droppable
        labels.unpersist(blocking = false)
        labels = next
        pending = null
        rounds += 1
      }
      require(changed == 0, s"label propagation did not converge in $rounds rounds")
      // The returned labels stay cached for the caller's downstream use.
      // NOTE: because each round is rebased on its computed RDD, the
      // returned plan is unique PER CALL — a second invocation on the
      // same input recomputes and caches its own entry (reuse the
      // returned frame instead; unpersist it when done).
      labels
    } catch {
      // non-convergence (or any mid-loop failure) must not strand the
      // last label frame in executor cache — the caller never sees it
      case t: Throwable =>
        if (pending ne null) pending.unpersist(blocking = false)
        labels.unpersist(blocking = false)
        throw t
    } finally {
      // on success the final round's count fully materialized labels'
      // cache, so the edge list is no longer needed for (re)computation
      // (an evicted labels partition would recompute from source, slower
      // but correct); on failure it must not leak either
      edges.unpersist(blocking = false)
    }
  }

  /** Connected components via alternating large-star / small-star edge
    * rewrites — same `(node, component-min)` contract as
    * [[connectedComponents]], different scaling envelope.
    *
    * Min-label propagation needs ~diameter rounds: fine for near-dup
    * clusters (diameter is single digits), fatal for chain-shaped
    * graphs (reply threads, citation chains, co-occurrence paths)
    * where diameter grows with n. The star rewrites (the
    * MapReduce-CC construction of Kiveris et al., SoCC'14 — public
    * algorithm) converge in O(log² n) rounds on ANY topology:
    *
    *  - large-star: every node points its LARGER neighbors at the
    *    minimum of its neighborhood (star centers pull edges downward);
    *  - small-star: every node repoints its smaller-or-equal neighbors,
    *    and itself, at that minimum.
    *
    * At fixpoint the edge set is a union of stars centered at the
    * component minima. Each half-round is a node-keyed min-aggregate
    * plus an equi-join back onto the edge list — NEVER a collect_list
    * of a neighborhood (a celebrity node's edges stay spread across
    * tasks) and never driver-side state beyond the loop counter, so a
    * 100 TB edge list shuffles but no single task holds a hot node's
    * full adjacency. Rounds are persisted and the predecessor released
    * once the successor is materialized; the returned labels are
    * cached (same contract as [[connectedComponents]]: per-call entry —
    * reuse the returned frame, unpersist when done).
    *
    * Throws if not converged within the round budget — truncation would
    * split components and keep duplicate "canonical" docs. The default
    * (`maxRounds ≤ 0`) SIZES THE BUDGET FROM THE GRAPH: chain graphs —
    * the worst case — converge at ~1.5·log₂(n) rounds empirically
    * (GraphOpsSpec's 200-node chain needs 12 ≈ 1.57·log₂ n), so the
    * auto budget is 2·log₂(n)+10: margin at every scale, where a flat
    * constant would under-budget a trillion-node chain (2·40+10 = 90
    * rounds there) and a loud require() would fire exactly at the scale
    * the operator targets. Pass an explicit positive `maxRounds` only
    * to pin tests or to cap cost on graphs known to be shallow.
    */
  def connectedComponentsStar(edgesIn: DataFrame, srcCol: String, dstCol: String,
      maxRounds: Int = 0): DataFrame = {
    val raw = edgesIn.select(col(srcCol).as("a"), col(dstCol).as("b"))
    // every node that appears at all gets a label, even if its only
    // edges are self-loops (which the rewrite drops as no-ops)
    val nodes = raw.select(col("a").as("node"))
      .unionByName(raw.select(col("b").as("node")))
      .distinct().persist()

    // canonical undirected form: a < b, distinct, no self-loops
    def canon(df: DataFrame): DataFrame = df
      .filter(col("x") =!= col("y"))
      .select(least(col("x"), col("y")).as("a"), greatest(col("x"), col("y")).as("b"))
      .distinct()

    // for (u,v) ∈ symmetric closure with v > u: emit (v, min(Γ(u) ∪ {u}))
    def largeStar(e: DataFrame): DataFrame = {
      val sym = e.unionByName(e.select(col("b").as("a"), col("a").as("b")))
      val m = sym.groupBy("a").agg(min(col("b")).as("mn"))
        .select(col("a"), least(col("a"), col("mn")).as("m"))
      canon(sym.filter(col("b") > col("a")).join(m, "a")
        .select(col("b").as("x"), col("m").as("y")))
    }

    // for each larger endpoint h: m = min of its smaller neighbors;
    // repoint those neighbors (and h itself) at m
    def smallStar(e: DataFrame): DataFrame = {
      val m = e.groupBy("b").agg(min(col("a")).as("m"))
      canon(
        e.join(m, Seq("b")).select(col("a").as("x"), col("m").as("y"))
          .unionByName(m.select(col("b").as("x"), col("m").as("y"))))
    }

    // exact set equality of two canonical (distinct) edge frames
    def unchanged(next: DataFrame, nextCnt: Long, prev: DataFrame, prevCnt: Long): Boolean =
      nextCnt == prevCnt && next.join(prev, Seq("a", "b"), "left_anti").isEmpty

    var cur = canon(raw.select(col("a").as("x"), col("b").as("y"))).persist()
    // half-round frames persisted but not yet owned by `cur`: released
    // in the finally block if a mid-round job throws (executor loss,
    // interrupt) — otherwise they would outlive the call in cache
    var lg: DataFrame = null
    var sm: DataFrame = null
    try {
      // auto budget from the node count (the set is already persisted —
      // one cheap count); 64-NLZ(n-1) == ceil(log2(n)) for n ≥ 2
      val budget =
        if (maxRounds > 0) maxRounds
        else {
          val n = math.max(2L, nodes.count())
          2 * (64 - java.lang.Long.numberOfLeadingZeros(n - 1)) + 10
        }
      var curCnt = cur.count()
      var converged = false
      var rounds = 0
      while (!converged && rounds < budget) {
        lg = truncate(largeStar(cur)).persist()
        val lgCnt = lg.count()
        val lgSame = unchanged(lg, lgCnt, cur, curCnt)
        cur.unpersist(blocking = false)
        sm = truncate(smallStar(lg)).persist()
        val smCnt = sm.count()
        // fixpoint ⟺ NEITHER half-round moved an edge (the composition
        // alone returning the same set does not certify a star set)
        converged = lgSame && unchanged(sm, smCnt, lg, lgCnt)
        lg.unpersist(blocking = false)
        lg = null
        cur = sm
        sm = null
        curCnt = smCnt
        rounds += 1
      }
      require(converged, s"star rewrites did not converge in $rounds rounds")
      // at the star fixpoint: a center's min neighbor is larger than
      // itself (least → itself); a satellite's only neighbor IS the
      // center. Singletons fall out of the left join as null → self.
      val sym = cur.unionByName(cur.select(col("b").as("a"), col("a").as("b")))
      val labels = nodes.join(sym, nodes("node") === sym("a"), "left")
        .groupBy("node").agg(min(col("b")).as("mn"))
        .select(col("node"), least(col("node"), coalesce(col("mn"), col("node"))).as("component"))
        .persist()
      try labels.count() // materialize so the round frames below are droppable
      catch { case t: Throwable =>
        // the caller never receives the handle — release it or it leaks
        labels.unpersist(blocking = false); throw t
      }
      labels
    } finally {
      // converged or thrown, the round frames and node set must not
      // outlive the call; the returned labels are cached independently
      if (lg ne null) lg.unpersist(blocking = false)
      if (sm ne null) sm.unpersist(blocking = false)
      cur.unpersist(blocking = false)
      nodes.unpersist(blocking = false)
    }
  }
}
