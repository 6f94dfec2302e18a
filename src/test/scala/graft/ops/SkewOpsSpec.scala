package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSuite

class SkewOpsSpec extends SparkSuite {
  import spark.implicits._

  test("saltedInnerJoin is row-for-row equivalent to a plain inner join") {
    // heavy-tailed: key 1 has 1000 rows, others 1 each
    val large = (Seq.fill(1000)(1) ++ (2 to 50)).map(k => (k, s"v$k")).toDF("k", "payload")
    val small = (1 to 40).map(k => (k, s"dim$k")).toDF("k", "attr")
    val plain = large.join(small, Seq("k"), "inner")
    val salted = SkewOps.saltedInnerJoin(large, small, Seq("k"), buckets = 8)
    assert(salted.count() == plain.count())
    assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty)
    // salt column must not leak
    assert(!salted.columns.contains("_salt"))
  }

  test("saltedInnerJoin does not clobber a user column named _salt") {
    val large = Seq((1, "keep-me"), (2, "other")).toDF("k", "_salt")
    val small = Seq((1, "x")).toDF("k", "w")
    val out = SkewOps.saltedInnerJoin(large, small, Seq("k"), buckets = 4).collect()
    assert(out.length == 1 && out.head.getAs[String]("_salt") == "keep-me")
  }

  test("buckets=1 degenerates to the plain join") {
    val large = Seq((1, "a"), (2, "b")).toDF("k", "v")
    val small = Seq((1, "x")).toDF("k", "w")
    val out = SkewOps.saltedInnerJoin(large, small, Seq("k"), buckets = 1).collect()
    assert(out.length == 1 && out.head.getAs[String]("w") == "x")
  }

  test("keyHistogram surfaces the hot keys in order") {
    val df = (Seq.fill(100)(7) ++ Seq.fill(10)(3) ++ Seq(1)).map(k => (k, "x")).toDF("k", "v")
    val hist = SkewOps.keyHistogram(df, Seq("k"), topN = 2).collect()
    assert(hist.map(r => (r.getAs[Int]("k"), r.getAs[Long]("n_rows"))).toSeq ==
      Seq((7, 100L), (3, 10L)))
  }
}
