package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries.{GoldIvmQueries, LlmDedup, LlmMultimodal, LlmSimilarity, LlmText, Medallion, Parity, Q, Versioned}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every implemented operator from SURVEY.md §2 (and the LLM-pipeline
  * extensions) is a named entry in `queries`; entries with a DuckDB-
  * expressible twin also appear in `oracleSql` for the hash-compare gate.
  */
object SparkEntry {

  private def suites: Seq[Q] = {
    val all = Parity.all ++ LlmDedup.all ++ LlmSimilarity.all ++ LlmText.all ++
      LlmMultimodal.all ++ Medallion.all ++ Versioned.all ++ GoldIvmQueries.all
    // toMap would silently DROP a name-colliding query from every gate
    // (bench, verify, oracle) while the round still reads green
    val dup = all.groupBy(_.name).filter(_._2.size > 1).keys
    require(dup.isEmpty, s"duplicate query name(s): ${dup.mkString(", ")}")
    all
  }

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Parity.q02.fn(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    suites.map(q => q.name -> q.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    suites.flatMap(q => q.sql.map(q.name -> _)).toMap
}
