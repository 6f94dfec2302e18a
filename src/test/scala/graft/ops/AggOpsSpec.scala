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
