package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSuite

class CleanOpsSpec extends SparkSuite {
  import spark.implicits._

  test("cleanId canonicalizes float-formatted ids and nulls non-numeric ones") {
    val got = Seq("1050.0", "1050", "7", "abc", null, "", "12.9", "-3.0")
      .toDF("id")
      .select(CleanOps.cleanId(col("id")).as("c"))
      .as[Option[String]]
      .collect()
      .toSeq
    // cast double->long truncates toward zero; non-numeric -> null
    assert(got == Seq(Some("1050"), Some("1050"), Some("7"), None, None, None, Some("12"), Some("-3")))
  }

  test("dedupLatest keeps exactly the latest row per key with deterministic tie-break") {
    val df = Seq(
      ("a", "2024-01-01 00:00:00", "v1"),
      ("a", "2024-01-02 00:00:00", "v2"), // latest for a
      ("b", "2024-01-01 00:00:00", "x1"),
      ("b", "2024-01-01 00:00:00", "x2")  // tie on ts -> highest value wins
    ).toDF("k", "ts", "v").withColumn("ts", to_timestamp(col("ts")))
    val got = CleanOps.dedupLatest(df, Seq("k"), Seq(col("ts").desc, col("v").desc))
      .select("k", "v").as[(String, String)].collect().toMap
    assert(got == Map("a" -> "v2", "b" -> "x2"))
  }

  test("dedupLatest is idempotent") {
    val df = Seq(("a", 2, "x"), ("a", 1, "y"), ("b", 5, "z"))
      .toDF("k", "o", "v")
    val once = CleanOps.dedupLatest(df, Seq("k"), Seq(col("o").desc, col("v")))
    val twice = CleanOps.dedupLatest(once, Seq("k"), Seq(col("o").desc, col("v")))
    assert(once.collect().toSet == twice.collect().toSet)
  }

  test("dedupLatest does not clobber a user column named _rn") {
    val df = Seq(("a", 2, "keep"), ("a", 1, "old")).toDF("k", "o", "_rn")
    val out = CleanOps.dedupLatest(df, Seq("k"), Seq(col("o").desc)).collect()
    assert(out.length == 1 && out.head.getAs[String]("_rn") == "keep")
  }

  test("requireKeys drops rows with any null key") {
    val df = Seq((Some("1"), Some("x")), (None, Some("y")), (Some("2"), None))
      .toDF("a", "b")
    assert(CleanOps.requireKeys(df, Seq("a", "b")).count() == 1)
  }
}
