package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSuite
import graft.functions.TextFns._

class TextFnsSpec extends SparkSuite {
  import spark.implicits._

  test("polyHash matches a reference fold and is stable") {
    val got = Seq("ab").toDF("s")
      .select(polyHash(col("s"), 31L, ModBig).as("h")).as[Long].head()
    // ((0*31+97)%M)*31+98 = 97*31+98 = 3105
    assert(got == 3105L)
  }

  test("shingles builds word n-grams and guards short docs") {
    val df = Seq("a b c d", "a b").toDF("t")
    val got = df.select(shingles(col("t"), 3).as("s")).as[Seq[String]].collect().toSeq
    assert(got.head == Seq("a b c", "b c d"))
    assert(got(1) == Seq.empty) // fewer tokens than n -> empty, not sequence(1,-1)
  }

  test("simhash: near-identical docs collide in far more bits than unrelated docs") {
    def sim(s: String): Long =
      Seq(s).toDF("t")
        .select(simhash(transform(tokens(col("t")), g => hash62(g))).as("h"))
        .as[Long].head()
    def hamming(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)
    val base = "the quick brown fox jumps over the lazy dog again and again today"
    val near = base.replace("today", "tomorrow")
    val far = "completely unrelated words about spark catalyst optimizer plans"
    assert(hamming(sim(base), sim(near)) < hamming(sim(base), sim(far)))
    assert(sim(base) == sim(base)) // deterministic
  }

  test("minhash signature estimates Jaccard similarity directionally") {
    def sig(s: String): Seq[Long] =
      Seq(s).toDF("t")
        .select(minhashSig(transform(array_distinct(shingles(col("t"), 2)), g => hash31(g)), 32).as("m"))
        .as[Seq[Long]].head()
    def agree(a: Seq[Long], b: Seq[Long]): Int = a.zip(b).count { case (x, y) => x == y }
    val base = "one two three four five six seven eight nine ten eleven twelve"
    val near = "one two three four five six seven eight nine ten eleven thirteen"
    val far = "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu"
    assert(agree(sig(base), sig(near)) > agree(sig(base), sig(far)))
  }
}
