package graft.sql

import java.nio.file.Files

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.SparkSuite
import graft.ecom.VersionedTable
import graft.ops.MvSpec

/** `CREATE MATERIALIZED VIEW ... AS SELECT` / `REFRESH MATERIALIZED
  * VIEW` — the SQL DDL face of durable maintained aggregates
  * ([[GraftSqlParser]]/[[MvDdl]]): the statement's algebra is extracted,
  * persisted in table properties (bit-identical to what `CALL
  * graft.system.create_mv` stores), and a bare REFRESH maintains from
  * the stored spec through DML storms. Non-maintainable SELECT shapes
  * refuse at CREATE time with the rewrite.
  */
class MvDdlSpec extends SparkSuite {
  import spark.implicits._

  private val warehouse: String = {
    val dir = Files.createTempDirectory("graft-mvddl-wh").toString
    spark.conf.set("spark.sql.catalog.gmv", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.gmv.warehouse", dir)
    new java.io.File(s"$dir/db").mkdirs()
    dir
  }

  private def freshSrc(name: String): VersionedTable = {
    val t = VersionedTable(spark, s"$warehouse/db/$name")
    t.commitAppend((1L to 40L).map(i => (i, i % 4, i * 10L))
      .toDF("id", "grp", "amt"))
    t.setTableProperty("graft.enableChangeDataFeed", "true")
    t
  }

  private def recompute(t: VersionedTable): Set[Row] =
    t.read().groupBy("grp")
      .agg(count(lit(1)).as("n"), sum("amt").as("total"),
        min("amt").as("lo"), max("amt").as("hi"))
      .collect().toSet

  test("CREATE ... AS SELECT stores the spec; bare REFRESH maintains through a storm") {
    val src = freshSrc("s1")
    spark.sql(
      """CREATE MATERIALIZED VIEW gmv.db.mv1 AS
        |SELECT grp, COUNT(*) AS n, SUM(amt) AS total,
        |  MIN(amt) AS lo, MAX(amt) AS hi
        |FROM gmv.db.s1 GROUP BY grp""".stripMargin)
    val view = VersionedTable(spark, s"$warehouse/db/mv1")
    // the stored spec is EXACTLY what the procedure form would store
    assert(MvSpec.load(view).get.props ==
      MvSpec.fromArgs(s"$warehouse/db/s1", "grp", "n",
        "total:amt", "lo:amt", "hi:amt", "").props)
    assert(view.read().select("grp", "n", "total", "lo", "hi")
      .collect().toSet == recompute(src))
    // storm, then a refresh statement that carries NO algebra
    src.delete(col("id") === 40L) // the grp-0 max
    src.update(col("grp") === 1, Map("amt" -> (col("amt") + 100L)))
    spark.sql(s"""MERGE INTO gmv.db.s1 t USING (
      |SELECT CAST(900 AS BIGINT) AS id, CAST(2 AS BIGINT) AS grp,
      |  CAST(5 AS BIGINT) AS amt) s
      |ON t.id = s.id WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    spark.sql("REFRESH MATERIALIZED VIEW gmv.db.mv1")
    assert(view.read().select("grp", "n", "total", "lo", "hi")
      .collect().toSet == recompute(src))
    // idempotent re-create (identical definition), IF NOT EXISTS no-op
    spark.sql(
      """CREATE MATERIALIZED VIEW gmv.db.mv1 AS
        |SELECT grp, COUNT(*) AS n, SUM(amt) AS total,
        |  MIN(amt) AS lo, MAX(amt) AS hi
        |FROM gmv.db.s1 GROUP BY grp""".stripMargin)
    spark.sql(
      """CREATE MATERIALIZED VIEW IF NOT EXISTS gmv.db.mv1 AS
        |SELECT grp, COUNT(*) AS n FROM gmv.db.s1 GROUP BY grp""".stripMargin)
    assert(view.read().select("grp", "n", "total", "lo", "hi")
      .collect().toSet == recompute(src))
  }

  test("a DIFFERENT definition refuses; REFRESH of a spec-less table refuses") {
    freshSrc("s2")
    spark.sql(
      """CREATE MATERIALIZED VIEW gmv.db.mv2 AS
        |SELECT grp, COUNT(*) AS n, SUM(amt) AS total
        |FROM gmv.db.s2 GROUP BY grp""".stripMargin)
    val e = intercept[Exception](spark.sql(
      """CREATE MATERIALIZED VIEW gmv.db.mv2 AS
        |SELECT grp, COUNT(*) AS n, SUM(amt + 1) AS total
        |FROM gmv.db.s2 GROUP BY grp""".stripMargin))
    assert(e.getMessage.contains("DIFFERENT materialized-view definition"))
    val plain = VersionedTable(spark, s"$warehouse/db/plain2")
    plain.commitAppend(Seq((1L, 2L)).toDF("a", "b"))
    val e2 = intercept[Exception](
      spark.sql("REFRESH MATERIALIZED VIEW gmv.db.plain2"))
    assert(e2.getMessage.contains("no stored materialized-view definition"))
  }

  test("non-maintainable SELECT shapes refuse at CREATE time with the rewrite") {
    freshSrc("s3")
    def refuses(sql: String, hint: String): Unit = {
      val e = intercept[Exception](spark.sql(sql))
      assert(e.getMessage.contains(hint), s"for: $sql\ngot: ${e.getMessage}")
    }
    refuses("""CREATE MATERIALIZED VIEW gmv.db.bad AS
      |SELECT grp, COUNT(*) AS n, AVG(amt) AS a
      |FROM gmv.db.s3 GROUP BY grp""".stripMargin, "avg(")
    refuses("""CREATE MATERIALIZED VIEW gmv.db.bad AS
      |SELECT grp, COUNT(DISTINCT amt) AS n
      |FROM gmv.db.s3 GROUP BY grp""".stripMargin, "DISTINCT")
    // the Filter sits UNDER the Aggregate, so WHERE refuses as a
    // non-plain FROM (same loud message, same rewrite)
    refuses("""CREATE MATERIALIZED VIEW gmv.db.bad AS
      |SELECT grp, COUNT(*) AS n, SUM(amt) AS total
      |FROM gmv.db.s3 WHERE amt > 0 GROUP BY grp""".stripMargin,
      "is Filter, not one plain source table")
    refuses("""CREATE MATERIALIZED VIEW gmv.db.bad AS
      |SELECT grp, COUNT(*) AS n, SUM(amt)
      |FROM gmv.db.s3 GROUP BY grp""".stripMargin, "aliased")
    refuses("""CREATE MATERIALIZED VIEW gmv.db.bad AS
      |SELECT a.grp, COUNT(*) AS n
      |FROM gmv.db.s3 a JOIN gmv.db.s3 b ON a.id = b.id
      |GROUP BY a.grp""".stripMargin, "one plain source table")
    refuses("""CREATE MATERIALIZED VIEW gmv.db.bad AS
      |SELECT grp, SUM(amt) AS total FROM gmv.db.s3 GROUP BY grp""".stripMargin,
      "COUNT(*)")
    // everything ordinary still parses through the delegate untouched
    assert(spark.sql("SELECT 1 AS one").head().getInt(0) == 1)
  }
}
