package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Text primitives for the LLM-data-pipeline operators (dedup, language
  * ID, quality scoring, fingerprinting). Everything is built from Spark's
  * codegen'd higher-order functions — no UDFs — so the hot path stays
  * inside whole-stage codegen and distributes trivially.
  *
  * All hashes are plain modular arithmetic (not murmur/xxhash) so a SQL
  * oracle (DuckDB) can reproduce them bit-for-bit; they are deterministic
  * and engine-agnostic, which is also what you want for a 100 TB dedup
  * run that must be resumable/verifiable across engines.
  */
object TextFns {

  /** 2^31-1, prime; keeps `acc * 37 + c` far from Long overflow. */
  val Mod31: Long = 2147483647L

  /** Large prime for shingle hashing / minhash arithmetic. */
  val ModBig: Long = 1000000007L

  /** Whitespace tokens of the lowercased text (testdata is single-spaced
    * ASCII; a production tokenizer would normalize whitespace first).
    */
  def tokens(c: Column): Column = split(lower(c), " ")

  /** Polynomial rolling hash over the characters of a string:
    * fold (acc * mult + ascii(char)) % mod. Matches DuckDB's
    * list_reduce over ascii(substr(...)) because f(0, c1) == c1.
    * Backed by the native codegen'd [[PolyHash]] expression — one JIT'd
    * loop per string, not per-character interpreted lambdas.
    */
  def polyHash(c: Column, mult: Long, mod: Long): Column =
    org.apache.spark.sql.graft.shims.column(
      PolyHash(org.apache.spark.sql.graft.shims.expression(c), mult, mod))

  /** Default 31-bit string hash used by minhash. */
  def hash31(c: Column): Column = polyHash(c, 31L, ModBig)

  /** ~62-bit hash: two independent 31-bit polynomial hashes combined as
    * h1 + h2 * 2^31 (SimHash / fingerprinting need >32 bits to keep
    * collision rates sane at 100 TB document counts).
    */
  def hash62(c: Column): Column =
    polyHash(c, 31L, Mod31) + polyHash(c, 37L, Mod31) * lit(2147483648L)

  /** Word n-gram shingles: ["a","b","c","d"] with n=3 ->
    * ["a b c","b c d"]. Empty array when the doc has fewer than n tokens.
    * Backed by the native codegen'd [[WordShingles]] expression (one
    * split per doc instead of one per lambda element_at).
    */
  def shingles(c: Column, n: Int): Column =
    org.apache.spark.sql.graft.shims.column(
      WordShingles(org.apache.spark.sql.graft.shims.expression(c), n))

  /** MinHash value for permutation `j` (a column) over an array of
    * shingle hashes: min over shingles of (h * a_j + b_j) % P with the
    * affine family a_j = 389(j+1)+1, b_j = 211(j+1)+7. h < 1e9 and
    * a_j < 1e4 keep the product far from Long overflow.
    */
  def minhashAt(shingleHashes: Column, j: Column): Column = {
    val a = lit(389L) * (j + lit(1)) + lit(1L)
    val b = lit(211L) * (j + lit(1)) + lit(7L)
    array_min(transform(shingleHashes, h => (h * a + b) % lit(ModBig)))
  }

  /** Full k-wide MinHash signature as an array column. */
  def minhashSig(shingleHashes: Column, k: Int): Column =
    transform(sequence(lit(0), lit(k - 1)), j => minhashAt(shingleHashes, j))

  /** SimHash over an array of ~62-bit token hashes: bit b of the result
    * is 1 iff the majority of token hashes have bit b set. Native
    * codegen'd expression ([[graft.functions.SimHash]]) — the unrolled
    * higher-order-function form it replaces ran as `bits` interpreted
    * ArrayAggregate walks per row; SimHashSpec pins bit-exact
    * equivalence to that fold, nulls and negatives included.
    */
  def simhash(tokenHashes: Column, bits: Int = 62): Column =
    org.apache.spark.sql.graft.shims.column(
      SimHash(org.apache.spark.sql.graft.shims.expression(tokenHashes), bits))

  /** The pre-native fold formulation of [[simhash]] — retained ONLY as
    * the equivalence reference for SimHashSpec (and as documentation of
    * the exact semantics the native expression must reproduce).
    */
  private[graft] def simhashFold(tokenHashes: Column, bits: Int): Column =
    (0 until bits).map { b =>
      val majority = aggregate(tokenHashes, lit(0L),
        (acc, h) => acc + (shiftright(h, b) % lit(2L)) * lit(2L) - lit(1L))
      when(majority > 0, lit(1L << b)).otherwise(lit(0L))
    }.reduce(_ + _)

  /** Count of tokens that appear in `vocab` (duplicates counted). */
  def vocabHits(toks: Column, vocab: Seq[String]): Column =
    size(filter(toks, t => t.isin(vocab: _*))).cast(LongType)

  /** Stopword set behind the quality score (a tiny English marker set;
    * a production filter swaps in a per-language list).
    */
  val stopQuality: Seq[String] = Seq("the", "a", "of", "and", "is", "to", "in")

  /** The weighted doc-quality score (type-token ratio + stopword ratio +
    * length ramp) shared by qt02/qt07, qd12's keep-best ranking, the
    * streaming curation gate (graft.streaming.DocStreams), and the SQL
    * surface (`graft_quality`). ONE definition at the Catalyst level
    * ([[CurationExprs.qualityScore]]) serves both surfaces.
    */
  def qualityScore(text: Column): Column =
    org.apache.spark.sql.graft.shims.column(
      CurationExprs.qualityScore(org.apache.spark.sql.graft.shims.expression(text)))

  /** PII patterns: character classes only ([.]/[+], no backslash
    * escapes) so the same literal parses identically in Java regex,
    * RE2 (DuckDB), and Scala string interpolation.
    */
  val EmailRe: String = CurationExprs.EmailRe
  val PhoneRe: String = CurationExprs.PhoneRe
  val IpRe: String = CurationExprs.IpRe

  /** Global redaction of every PII pattern in a text column — the
    * expression behind qt11, the streaming curation path, and the SQL
    * surface (`graft_redact_pii`). Pure per-row codegen'd work.
    */
  def redactPii(c: Column): Column =
    org.apache.spark.sql.graft.shims.column(
      CurationExprs.redactPii(org.apache.spark.sql.graft.shims.expression(c)))

  /** Normalized content hash — THE exact-dedup key, shared by qd01/qd07
    * stats, qt07's survival pass, the streaming dedup state
    * (graft.streaming.DocStreams.dedupNew), and the SQL surface
    * (`graft_content_hash`), so every dedup path agrees on what "the
    * same document" means.
    */
  def contentHash(c: Column): Column =
    org.apache.spark.sql.graft.shims.column(
      CurationExprs.contentHash(org.apache.spark.sql.graft.shims.expression(c)))
}
