package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSuite

class AggOpsSpec extends SparkSuite {
  import spark.implicits._

  test("safeDiv returns NULL on zero denominator, quotient otherwise") {
    val got = Seq((10.0, 4L), (10.0, 0L), (0.0, 5L))
      .toDF("n", "d")
      .select(AggOps.safeDiv(col("n"), col("d")).as("q"))
      .as[Option[Double]].collect().toSeq
    assert(got == Seq(Some(2.5), None, Some(0.0)))
  }

  test("cappedPct caps at 100 and is NULL on zero denominator") {
    // carts > views ("quick add" regression, reference README.md:50-55)
    val got = Seq((5.0, 4L), (1.0, 4L), (3.0, 0L))
      .toDF("n", "d")
      .select(AggOps.cappedPct(col("n"), col("d")).as("p"))
      .as[Option[Double]].collect().toSeq
    assert(got == Seq(Some(100.0), Some(25.0), None))
  }

  test("DqOps.run fuses row-predicate checks into one pass, same counts as the query form") {
    val df = Seq((1, -5.0), (2, 3.0), (2, 7.0), (3, -1.0)).toDF("id", "revenue")
    val negPred = col("revenue") < 0
    val mixed = Seq(
      DqOps.DqCheck("nonneg", d => d.filter(negPred), Some(negPred)),
      // grouped check: no predicate, keeps its own query
      DqOps.DqCheck("id_unique",
        d => d.groupBy("id").count().filter(col("count") > 1)),
      DqOps.DqCheck("ids_positive", d => d.filter(col("id") <= 0), Some(col("id") <= 0)))
    val got = DqOps.run(df, mixed).map(r => r.name -> r.badCount)
    // fused counts equal each check's own badRows query
    assert(got == mixed.map(c => c.name -> c.badRows(df).count()))
    assert(got == Seq("nonneg" -> 2L, "id_unique" -> 1L, "ids_positive" -> 0L))
    // empty input: sum-over-zero-rows is NULL, must read back as 0 bad
    val empty = df.filter(col("id") < 0)
    assert(DqOps.run(empty, mixed).forall(_.passed))
  }

  test("DqOps.enforce raises with failing check names") {
    val df = Seq((1, -5.0), (2, 3.0)).toDF("id", "revenue")
    val checks = Seq(
      DqOps.DqCheck("nonneg", d => d.filter(col("revenue") < 0)),
      DqOps.DqCheck("ids_positive", d => d.filter(col("id") <= 0)))
    val e = intercept[IllegalStateException](DqOps.enforce(df, checks))
    assert(e.getMessage.contains("nonneg"))
    assert(!e.getMessage.contains("ids_positive"))
    DqOps.enforce(df.filter(col("revenue") >= 0), checks) // passes
  }
}
