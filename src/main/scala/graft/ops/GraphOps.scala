package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Small-graph iterative operators over DataFrames (the Pregel pattern
  * with driver-coordinated rounds — no graph library needed).
  */
object GraphOps {

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
    try {
      var changed = 1L
      var rounds = 0
      while (changed > 0 && rounds < maxRounds) {
        val prop = edges.join(labels, edges("b") === labels("node"))
          .groupBy(col("a")).agg(min(col("component")).as("min_nbr"))
        val next = labels.join(prop, labels("node") === prop("a"), "left")
          .select(col("node"),
            least(col("component"), coalesce(col("min_nbr"), col("component"))).as("component"))
          .persist()
        changed = next.as("n")
          .join(labels.as("o"), col("n.node") === col("o.node"))
          .filter(col("n.component") =!= col("o.component"))
          .count() // materializes next's cache, so the old frame is droppable
        labels.unpersist(blocking = false)
        labels = next
        rounds += 1
      }
      require(changed == 0, s"label propagation did not converge in $rounds rounds")
      // The returned labels stay cached; CacheManager keys on the
      // logical plan, so repeated invocations on the same input share
      // one entry rather than accumulating.
      labels
    } catch {
      // non-convergence (or any mid-loop failure) must not strand the
      // last label frame in executor cache — the caller never sees it
      case t: Throwable =>
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
}
