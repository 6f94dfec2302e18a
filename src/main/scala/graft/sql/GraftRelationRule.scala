package graft.sql

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.Alias
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation

/** Analyzer rule (injected by `GraftExtensions`) that converts a
  * `DataSourceV2Relation` over a [[GraftSqlTable]] into the library's
  * own V1 snapshot plan — Delta's DeltaAnalysis architecture: the DSv2
  * catalog resolves NAMES, the library's battle-tested relation does
  * the READING, and nothing is implemented twice.
  *
  * The replacement plan carries fresh attribute ids, so a Project
  * re-aliases its output onto the relation's original ids — every
  * operator above (and the analyzer's already-resolved references into
  * this relation) keeps resolving without a re-analysis pass.
  *
  * Time travel precedence: a SQL `VERSION AS OF` pins the version at
  * `loadTable` time; the `versionAsOf` / `timestampAsOf` READ OPTIONS
  * (`spark.read.option(...).table(...)`, the DataFrame entry) apply
  * here, and specifying both is refused rather than silently picking.
  */
case class GraftRelationRule(spark: SparkSession) extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = {
    // a relation that is the TARGET of a write or row-level command
    // (INSERT INTO / INSERT OVERWRITE / DELETE FROM / UPDATE / MERGE)
    // must stay a DSv2 relation — Spark's V1-fallback write path and
    // DataSourceV2Strategy's DeleteFromTable planning need the table
    // there; only READ occurrences convert. Identity set: the same
    // table read and written in one statement (INSERT INTO t SELECT
    // ... FROM t) converts the read side only.
    val writeTargets = java.util.Collections.newSetFromMap(
      new java.util.IdentityHashMap[LogicalPlan, java.lang.Boolean]())
    def markTarget(t: LogicalPlan): Unit = t.foreach {
      case r: DataSourceV2Relation => writeTargets.add(r)
      case _ => ()
    }
    plan.foreach {
      case c: org.apache.spark.sql.catalyst.plans.logical.V2WriteCommand =>
        markTarget(c.table)
      case d: org.apache.spark.sql.catalyst.plans.logical.DeleteFromTable =>
        markTarget(d.table)
      case u: org.apache.spark.sql.catalyst.plans.logical.UpdateTable =>
        markTarget(u.table)
      case m: org.apache.spark.sql.catalyst.plans.logical.MergeIntoTable =>
        markTarget(m.targetTable)
      // ALTER TABLE commands (incl. ADD/DROP CONSTRAINT) carry the
      // resolved table as a child; ResolveSessionCatalog pattern-matches
      // the DSv2 relation there — a converted V1 relation (with no
      // catalogTable) trips it. The library op validates existing rows
      // itself, so no read conversion is needed here either.
      case a: org.apache.spark.sql.catalyst.plans.logical.AlterTableCommand =>
        markTarget(a.table)
      case c: org.apache.spark.sql.catalyst.plans.logical.AddCheckConstraint =>
        markTarget(c.child)
      case _ => ()
    }
    plan.resolveOperatorsUp {
      case r: DataSourceV2Relation
          if r.table.isInstanceOf[GraftSqlTable] && !writeTargets.contains(r) =>
        val t = r.table.asInstanceOf[GraftSqlTable]
        // a readChangeFeed option can only be honored when the HANDLE was
        // built with the feed schema (the path entry, GraftDataSource).
        // On a catalog .table() read the handle was loaded name-only, its
        // output is the table schema, and silently serving table-schema
        // rows labeled as a feed (or feed rows missing _change_type)
        // would be worse than refusing with the working alternatives.
        if (t.cdfWindow.isEmpty &&
            Option(r.options.get("readChangeFeed")).exists(_.equalsIgnoreCase("true")))
          throw new IllegalArgumentException(
            s"${t.name()}: readChangeFeed is not available on catalog table " +
              "reads — use SELECT * FROM graft_table_changes('<cat.ns.t>', " +
              "start[, end]) or spark.read.format(\"graft\")" +
              ".option(\"readChangeFeed\", \"true\").load(path)")
        val optV = Option(r.options.get("versionAsOf")).map { s =>
          try s.toLong catch {
            case _: NumberFormatException => throw new IllegalArgumentException(
              s"${t.name()}: versionAsOf must be numeric, got '$s'")
          }
        }
        // a catalog-pinned version wins: Spark's own reader consumes
        // versionAsOf/timestampAsOf options natively (loadTable(ident,
        // version)) and STILL leaves them in the relation options, so
        // pinned+option is the normal single-spec case, not a conflict
        // (conflicting double-specs are refused upstream by Spark)
        lazy val optTs = Option(r.options.get("timestampAsOf"))
          .map(s => t.vt.versionAsOf(
            GraftTimeTravel.parseMillis(spark, s, t.name())))
        val converted = t.cdfWindow match {
          // a feed handle converts to the library's changeFeed plan —
          // the handle's schema is already the feed schema, so the
          // id-grafting Project below lines up column-for-column
          case Some((s, e)) => t.vt.changeFeed(s, e).queryExecution.analyzed
          case None =>
            val version = t.pinnedVersion.orElse(optV).orElse(optTs)
              .getOrElse(t.resolvedVersion)
            t.v1Plan(spark, version)
        }
        // graft the converted plan under the relation's original output
        // ids; name resolution is case-insensitive, like the analyzer's
        val res = spark.sessionState.conf.resolver
        Project(r.output.map { a =>
          val src = converted.output.find(o => res(o.name, a.name)).getOrElse(
            throw new IllegalStateException(
              s"${t.name()}: snapshot plan lost column ${a.name} " +
                s"(has ${converted.output.map(_.name).mkString(", ")})"))
          Alias(src, a.name)(exprId = a.exprId)
        }, converted)
    }
  }
}
