package graft.ops

import org.apache.spark.sql.DataFrame

/** Data-quality gate (reference:
  * `/root/reference/04_data_quality/04_data_quality_checks.py:17-34`):
  * each check is a "find bad rows" query; the gate counts them and raises
  * on > 0. Pure DataFrame ops — no framework.
  */
object DqOps {

  final case class DqCheck(name: String, badRows: DataFrame => DataFrame)

  final case class DqResult(name: String, badCount: Long) {
    def passed: Boolean = badCount == 0L
  }

  /** Run checks against `df`; returns per-check results. */
  def run(df: DataFrame, checks: Seq[DqCheck]): Seq[DqResult] =
    checks.map(c => DqResult(c.name, c.badRows(df).count()))

  /** Run checks and throw IllegalStateException on the first failure —
    * the reference's raise-on-bad-rows gate semantics.
    */
  def enforce(df: DataFrame, checks: Seq[DqCheck]): Unit = {
    val failed = run(df, checks).filter(!_.passed)
    if (failed.nonEmpty) {
      val msg = failed.map(r => s"${r.name}: ${r.badCount} bad rows").mkString("; ")
      throw new IllegalStateException(s"DQ gate failed — $msg")
    }
  }
}
