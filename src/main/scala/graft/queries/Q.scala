package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One named engine query with (optionally) its DuckDB-oracle SQL twin.
  *
  * Contract (see /root/repo/SURVEY.md §5): the Spark result and the SQL
  * run on the same parquet tables must match on (column names, values).
  * Rules applied throughout this package:
  *  - alias every computed column identically in Spark and SQL;
  *  - total ORDER BY ending in a unique key (deterministic row order);
  *  - money aggregates via exact decimal sums cast back to double
  *    (graft.util.Exact) so doubles are bit-identical across engines;
  *  - DuckDB SUM(int) returns HUGEINT → always CAST(... AS BIGINT);
  *  - DuckDB decimal literals (100.0) contaminate bigint math with
  *    decimal types → CAST operands to DOUBLE explicitly in SQL.
  */
final case class Q(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    sql: Option[String])

object Q {
  def apply(name: String, sql: String)(fn: (SparkSession, String) => DataFrame): Q =
    Q(name, fn, Some(sql))

  /** Query with no SQL-expressible oracle (driver records rows-only check). */
  def noOracle(name: String)(fn: (SparkSession, String) => DataFrame): Q =
    Q(name, fn, None)
}
