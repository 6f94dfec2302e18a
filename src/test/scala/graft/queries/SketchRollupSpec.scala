package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** qd19's contract: cardinality rollups derived by MERGING per-cell HLL
  * sketches (never re-scanning the base relation) agree with exact
  * distinct counts, across overlapping cells and across merge orders.
  */
class SketchRollupSpec extends SparkSuite {
  import spark.implicits._

  test("planted overlaps: union-merge dedups across cells where adding counts cannot") {
    // c1 is shared across langs AND sources; c3 repeats within a cell.
    // Summing per-cell uniques gives 5 — the true corpus distinct is 3,
    // so any rollup that adds counts instead of merging sketches is
    // wrong by construction here.
    val f = Seq(
      ("s1", "en", "c1"), ("s1", "de", "c1"), ("s2", "en", "c1"),
      ("s1", "en", "c2"),
      ("s2", "de", "c3"), ("s2", "de", "c3"), ("s2", "de", "c3"))
      .toDF("source", "lang", "h")
    val rows = LlmDedup.sketchRollup(f).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getBoolean(4))).toMap
    assert(rows(("all", "all")) == ((7L, 3L, true)))
    assert(rows(("source", "s1")) == ((3L, 2L, true)))
    assert(rows(("source", "s2")) == ((4L, 2L, true)))
    assert(rows(("lang", "en")) == ((3L, 2L, true)))
    assert(rows(("lang", "de")) == ((4L, 2L, true)))
  }

  test("second-level merge estimates exactly what a direct corpus sketch estimates") {
    // HLL union is register-wise max: cells -> per-source -> total must
    // land the same registers as one sketch over the whole stream, so
    // the ESTIMATES are identical (not merely close) at any grouping.
    val f = spark.range(0, 20000).select(
      concat(lit("s"), (col("id") % 3).cast("string")).as("source"),
      concat(lit("l"), (col("id") % 5).cast("string")).as("lang"),
      md5((col("id") % 7000).cast("string")).as("h"))
    val direct = f
      .agg(hll_sketch_estimate(hll_sketch_agg(col("h"), lit(12))).as("est"))
      .head().getLong(0)
    val twoLevel = f.groupBy("source", "lang")
      .agg(hll_sketch_agg(col("h"), lit(12)).as("sk"))
      .groupBy("source").agg(hll_union_agg(col("sk")).as("sk"))
      .agg(hll_sketch_estimate(hll_union_agg(col("sk"))).as("est"))
      .head().getLong(0)
    assert(direct == twoLevel,
      s"merge order changed the estimate: direct=$direct twoLevel=$twoLevel")
  }

  test("qd19 on testdata: contract booleans hold and doc mass is conserved per dim") {
    val dir = "/root/testdata/sf0.001"
    val rows = LlmDedup.qd19.fn(spark, dir).collect()
    assert(rows.forall(_.getBoolean(4)), "every merged estimate within tolerance")
    val total = rows.collectFirst {
      case r if r.getString(0) == "all" => r.getLong(2)
    }.get
    for (dim <- Seq("source", "lang")) {
      val mass = rows.filter(_.getString(0) == dim).map(_.getLong(2)).sum
      assert(mass == total, s"dim=$dim n_docs mass $mass != corpus $total")
    }
  }
}
