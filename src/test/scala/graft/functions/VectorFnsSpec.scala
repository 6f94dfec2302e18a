package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSuite
import graft.functions.VectorFns._

class VectorFnsSpec extends SparkSuite {
  import spark.implicits._

  test("cosine matches a hand computation") {
    val df = Seq((Seq(1.0f, 2.0f, 3.0f), Seq(4.0f, 5.0f, 6.0f))).toDF("a", "b")
    val got = df.select(cosine(col("a"), col("b")).as("c")).as[Double].head()
    val expect = 32.0 / (math.sqrt(14.0) * math.sqrt(77.0))
    assert(math.abs(got - expect) < 1e-12)
  }

  test("cosine of identical vectors is 1") {
    val df = Seq((Seq(0.5f, -0.25f, 2.0f), Seq(0.5f, -0.25f, 2.0f))).toDF("a", "b")
    val got = df.select(cosine(col("a"), col("b")).as("c")).as[Double].head()
    assert(math.abs(got - 1.0) < 1e-12)
  }

  test("dot propagates NULL elements like the composed zip_with/aggregate form") {
    val df = Seq(
      (Seq[java.lang.Float](1.0f, null, 3.0f), Seq[java.lang.Float](4.0f, 5.0f, 6.0f)),
      (Seq[java.lang.Float](1.0f, 2.0f), Seq[java.lang.Float](3.0f, 4.0f)))
      .toDF("a", "b")
    val native = df.select(dot(col("a"), col("b")).as("d"))
      .collect().map(r => Option(r.get(0))).toSeq
    // composed built-in form: NULL element -> NULL product -> NULL fold
    val composed = df.select(
      aggregate(zip_with(col("a"), col("b"),
        (x, y) => x.cast("double") * y.cast("double")),
        lit(0.0), (acc, v) => acc + v).as("d"))
      .collect().map(r => Option(r.get(0))).toSeq
    assert(native == composed)
    assert(native == Seq(None, Some(11.0)))
  }

  test("ldot matches a hand computation and the composed integer fold") {
    val df = Seq((Seq(3L, -2L, 7L), Seq(10L, 5L, 2L))).toDF("a", "b")
    val got = df.select(ldot(col("a"), col("b")).as("d")).as[Long].head()
    assert(got == 3L * 10 - 2L * 5 + 7L * 2)
    val composed = df.select(
      aggregate(zip_with(col("a"), col("b"), (x, y) => x * y),
        lit(0L), (acc, v) => acc + v).as("d")).as[Long].head()
    assert(got == composed)
  }

  test("ldot propagates NULL elements like the composed form") {
    val df = Seq(
      (Seq[java.lang.Long](1L, null, 3L), Seq[java.lang.Long](4L, 5L, 6L)),
      (Seq[java.lang.Long](2L, 3L), Seq[java.lang.Long](4L, 5L)))
      .toDF("a", "b")
    val native = df.select(ldot(col("a"), col("b")).as("d"))
      .collect().map(r => Option(r.get(0))).toSeq
    assert(native == Seq(None, Some(23L)))
  }

  test("lshBucket is deterministic and bounded by plane count") {
    val planes = hyperplanes(nPlanes = 6, dim = 4)
    val df = Seq(Seq(1.0f, -2.0f, 0.5f, 3.0f), Seq(-1.0f, 2.0f, -0.5f, -3.0f)).toDF("v")
    val got = df.select(lshBucket(col("v"), planes).as("b")).as[Long].collect().toSeq
    assert(got.forall(b => b >= 0 && b < 64))
    val again = df.select(lshBucket(col("v"), planes).as("b")).as[Long].collect().toSeq
    assert(got == again)
  }
}
