package graft.queries

/** Shared DuckDB-SQL fragment builders for oracle queries. Each fragment
  * mirrors a Spark-side primitive evaluation-order-exactly so double
  * results hash-compare bit-identically (same left fold, same cast
  * points; see Q's scaladoc for the full parity rules).
  */
object DuckSql {

  /** Dot product of two list columns, elements cast to DOUBLE before the
    * multiply, left fold in index order — mirrors
    * [[graft.functions.FloatVecDot]] (init-less list_reduce == Spark's
    * 0.0-seeded loop because 0.0 + x == x for every finite x ≠ -0.0,
    * and a leading -0.0 product still folds to the same sums).
    */
  def dot(x: String, y: String): String =
    s"list_reduce(list_transform(range(1, len($x)+1), i -> $x[i]::DOUBLE * $y[i]::DOUBLE), (p,q) -> p+q)"

  /** Cosine similarity, same operand order as [[graft.functions.VectorFns.cosine]]. */
  def cosine(a: String, b: String): String =
    s"${dot(a, b)} / (sqrt(${dot(a, a)}) * sqrt(${dot(b, b)}))"

  /** Dot of a vector column against the deterministic hyperplane family
    * of [[graft.functions.VectorFns.hyperplanes]]: plane p, component d
    * = (((p*131 + d*37 + 11) % 19) - 9). `i` is DuckDB's 1-based index.
    */
  def planeDot(v: String, p: Int): String =
    s"list_reduce(list_transform(range(1, len($v)+1), " +
      s"i -> $v[i]::DOUBLE * CAST(((($p*131 + (i-1)*37 + 11) % 19) - 9) AS DOUBLE)), (p,q) -> p+q)"

  /** Sign-bit LSH bucket id under `nPlanes` deterministic hyperplanes —
    * mirrors [[graft.functions.VectorFns.lshBucket]].
    */
  def lshBucket(v: String, nPlanes: Int): String =
    (0 until nPlanes)
      .map(p => s"CASE WHEN ${planeDot(v, p)} > 0 THEN ${1L << p} ELSE 0 END")
      .mkString("(", " + ", ")")

  /** Unit-normalize a DOUBLE list — mirrors LlmSimilarity's driver-side
    * `unit` (same left-fold sum of squares, same sqrt, zero-norm
    * passthrough).
    */
  def unitVec(c: String): String = {
    val n = s"sqrt(list_reduce(list_transform($c, x -> x*x), (p,q) -> p+q))"
    s"CASE WHEN $n = 0 THEN $c ELSE list_transform($c, x -> x / $n) END"
  }
}
