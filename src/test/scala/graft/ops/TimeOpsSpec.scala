package graft.ops

import java.sql.Timestamp

import graft.SparkSuite

class TimeOpsSpec extends SparkSuite {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("asofJoin: backward match, exact-ts inclusion, no-match null, per-key isolation") {
    val left = Seq(
      (1L, "e1", ts("2024-01-01 10:00:00")),
      (1L, "e2", ts("2024-01-01 12:00:00")),
      (1L, "e3", ts("2024-01-01 09:00:00")), // before any right row -> null
      (2L, "e4", ts("2024-01-01 11:00:00"))  // key 2 has no right rows -> null
    ).toDF("k", "id", "t")
    val right = Seq(
      (1L, ts("2024-01-01 10:00:00"), 10.0), // exactly at e1 -> visible to e1
      (1L, ts("2024-01-01 11:30:00"), 20.0)
    ).toDF("k", "t", "v")
    val out = TimeOps.asofJoin(left, right, Seq("k"), "t", "t", Seq("v"))
      .select("id", "v").collect().map(r => r.getString(0) -> Option(r.get(1))).toMap
    assert(out("e1") == Some(10.0)) // >= semantics: equal ts matches
    assert(out("e2") == Some(20.0)) // latest at-or-before
    assert(out("e3") == None)
    assert(out("e4") == None)
  }

  test("asofJoin: the latest right ROW wins wholesale — a NULL in it is NOT backfilled") {
    val left = Seq((1L, "e1", ts("2024-01-01 12:00:00"))).toDF("k", "id", "t")
    val right = Seq(
      (1L, ts("2024-01-01 10:00:00"), Some(1.0), Some(1.0)),
      (1L, ts("2024-01-01 11:00:00"), Some(2.0), Option.empty[Double])
    ).toDF("k", "t", "a", "b")
    val out = TimeOps.asofJoin(left, right, Seq("k"), "t", "t", Seq("a", "b"))
      .select("a", "b").collect().head
    // per-column last(ignoreNulls) would produce (a=2, b=1) — a
    // composite of two right rows that never existed together
    assert(out.getDouble(0) == 2.0)
    assert(out.isNullAt(1), "the newest row's genuine NULL must surface")
  }

  test("asofJoin: NULL right timestamps never match (they are 'as of never')") {
    val left = Seq((1L, "e1", ts("2024-01-01 12:00:00"))).toDF("k", "id", "t")
    val right = Seq(
      (1L, Option.empty[Timestamp], 99.0),
      (1L, Some(ts("2024-01-01 13:00:00")), 5.0) // after the left row
    ).toDF("k", "t", "v")
    val out = TimeOps.asofJoin(left, right, Seq("k"), "t", "t", Seq("v"))
      .select("v").collect().head
    assert(out.isNullAt(0),
      "a NULL-ts right row must not sort first and attach to unmatched left rows")
  }

  test("asofJoin does not clobber user columns named _ts/_side") {
    val left = Seq((1L, "e1", "user-ts", 9, ts("2024-01-01 10:00:00")))
      .toDF("k", "id", "_ts", "_side", "t")
    val right = Seq((1L, ts("2024-01-01 09:00:00"), 1.5)).toDF("k", "t", "v")
    val out = TimeOps.asofJoin(left, right, Seq("k"), "t", "t", Seq("v"))
    val r = out.head()
    assert(r.getAs[String]("_ts") == "user-ts" && r.getAs[Int]("_side") == 9)
    assert(r.getAs[Double]("v") == 1.5)
    // a valueCol colliding with a left column is a contract violation
    val badLeft = left.withColumnRenamed("_ts", "v")
    intercept[IllegalArgumentException] {
      TimeOps.asofJoin(badLeft, right, Seq("k"), "t", "t", Seq("v"))
    }
  }

  test("asofJoin preserves left row count and extra left columns") {
    val left = Seq((1L, "a", 7, ts("2024-01-01 10:00:00"))).toDF("k", "id", "extra", "t")
    val right = Seq((1L, ts("2024-01-01 09:00:00"), 1.5)).toDF("k", "t", "v")
    val out = TimeOps.asofJoin(left, right, Seq("k"), "t", "t", Seq("v"))
    assert(out.count() == 1)
    val r = out.head()
    assert(r.getAs[Int]("extra") == 7 && r.getAs[Double]("v") == 1.5)
  }

  test("sessionize: gap > threshold starts a new session; keys isolated; exact-gap stays") {
    val rows = Seq(
      (1L, 1L, ts("2024-01-01 10:00:00")),
      (1L, 2L, ts("2024-01-01 10:30:00")), // gap == 1800s exactly -> same session
      (1L, 3L, ts("2024-01-01 11:00:01")), // 1801s -> new session
      (1L, 4L, ts("2024-01-01 11:10:00")),
      (2L, 5L, ts("2024-01-01 10:00:00"))) // other user: own numbering
      .toDF("user_id", "event_id", "t")
    val out = TimeOps.sessionize(rows, Seq("user_id"), "t", gapSec = 1800L,
        tieCols = Seq("event_id"))
      .collect().map(r => r.getAs[Long]("event_id") -> r.getAs[Long]("session_idx")).toMap
    assert(out == Map(1L -> 1L, 2L -> 1L, 3L -> 2L, 4L -> 2L, 5L -> 1L))
  }

  test("sessionize gap property holds on randomized inputs") {
    // deterministic pseudo-random corpus: within a session consecutive
    // gaps are <= threshold; across a session boundary the gap exceeds it
    val rnd = new scala.util.Random(7)
    val gapSec = 600L
    val rows = (1 to 400).map { i =>
      val user = rnd.nextInt(5).toLong
      val t = new Timestamp(1700000000000L + rnd.nextInt(200000) * 1000L)
      (user, i.toLong, t)
    }
    val out = TimeOps.sessionize(rows.toDF("user_id", "event_id", "t"),
        Seq("user_id"), "t", gapSec, tieCols = Seq("event_id"))
      .collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("session_idx"),
        r.getAs[Timestamp]("t").getTime / 1000, r.getAs[Long]("event_id")))
    assert(out.length == rows.length) // row-preserving
    out.groupBy(_._1).foreach { case (_, userRows) =>
      val ordered = userRows.sortBy(r => (r._3, r._4))
      ordered.sliding(2).foreach {
        case Array((_, s1, t1, _), (_, s2, t2, _)) =>
          if (s1 == s2) assert(t2 - t1 <= gapSec, "intra-session gap exceeded threshold")
          else { assert(s2 == s1 + 1, "session indices must be dense"); assert(t2 - t1 > gapSec) }
        case _ =>
      }
      assert(ordered.head._2 == 1L) // numbering starts at 1 per user
    }
  }

  test("sessionize rejects a clashing session column and bad gap") {
    val df = Seq((1L, ts("2024-01-01 10:00:00"), 9L)).toDF("k", "t", "session_idx")
    intercept[IllegalArgumentException] {
      TimeOps.sessionize(df, Seq("k"), "t", gapSec = 60L)
    }
    intercept[IllegalArgumentException] {
      TimeOps.sessionize(df.drop("session_idx"), Seq("k"), "t", gapSec = 0L)
    }
  }

  test("rangeJoin matches the naive cross+filter join on seeded random data, at every bin size") {
    val rnd = new scala.util.Random(7)
    val base = ts("2024-01-01 00:00:00").getTime
    val left = Seq.tabulate(120) { i =>
      (rnd.nextInt(4).toLong, i.toLong, new Timestamp(base + rnd.nextInt(36000) * 1000L))
    }.toDF("k", "lid", "t")
    val right = Seq.tabulate(40) { i =>
      val start = base + rnd.nextInt(36000) * 1000L
      (rnd.nextInt(4).toLong, i.toLong, new Timestamp(start),
        new Timestamp(start + rnd.nextInt(7200) * 1000L))
    }.toDF("k", "rid", "s", "e")
    val naive = left.join(right, Seq("k"))
      .filter($"t" >= $"s" && $"t" <= $"e")
      .select("k", "lid", "rid").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(naive.nonEmpty, "seed must produce matches or the test is vacuous")
    // bins smaller than, near, and larger than the max interval length
    for (bin <- Seq(60L, 3600L, 100000L)) {
      val got = TimeOps.rangeJoin(left, right, Seq("k"), "t", "s", "e", binSec = bin)
        .select("k", "lid", "rid").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(got == naive, s"binSec=$bin diverges from the naive range join")
    }
  }

  test("rangeJoin: inclusive bounds, empty/null intervals dropped, no duplicate pairs") {
    val left = Seq(
      (1L, 1L, ts("2024-01-01 10:00:00")), // == start
      (1L, 2L, ts("2024-01-01 11:00:00")), // == end
      (1L, 3L, ts("2024-01-01 11:00:01"))  // just past end
    ).toDF("k", "lid", "t")
    val right = Seq(
      (1L, 10L, ts("2024-01-01 10:00:00"), ts("2024-01-01 11:00:00")),
      (1L, 11L, ts("2024-01-01 12:00:00"), ts("2024-01-01 11:00:00")), // start > end
      (1L, 12L, null.asInstanceOf[Timestamp], ts("2024-01-01 11:00:00"))
    ).toDF("k", "rid", "s", "e")
    // bin far smaller than the interval: the pair could meet in many
    // bins if the plan were wrong — must still appear exactly once
    val rows = TimeOps.rangeJoin(left, right, Seq("k"), "t", "s", "e", binSec = 7L)
      .select("lid", "rid").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(rows.sorted == Seq(1L -> 10L, 2L -> 10L))
  }

  test("rangeJoin rejects non-key column collisions and bad bin") {
    val l = Seq((1L, 1L, ts("2024-01-01 10:00:00"))).toDF("k", "id", "t")
    val r = Seq((1L, 2L, ts("2024-01-01 09:00:00"), ts("2024-01-01 11:00:00")))
      .toDF("k", "id", "s", "e") // "id" collides
    intercept[IllegalArgumentException] {
      TimeOps.rangeJoin(l, r, Seq("k"), "t", "s", "e", binSec = 60L)
    }
    intercept[IllegalArgumentException] {
      TimeOps.rangeJoin(l, r.withColumnRenamed("id", "rid"), Seq("k"), "t", "s", "e", binSec = 0L)
    }
  }
}
