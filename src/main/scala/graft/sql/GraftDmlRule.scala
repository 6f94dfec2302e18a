package graft.sql

import org.apache.spark.sql.{Column, Row, SparkSession}
import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
import org.apache.spark.sql.catalyst.expressions.{And, Attribute, AttributeReference, EqualTo, Expression, SubqueryExpression}
import org.apache.spark.sql.catalyst.plans.logical.{Assignment, InsertAction, InsertStarAction, LogicalPlan, MergeIntoTable, UpdateAction, UpdateStarAction, UpdateTable}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation
import org.apache.spark.sql.functions.lit
import org.apache.spark.sql.graft.shims

import graft.ecom.VersionedTable

/** SQL `UPDATE` and `MERGE INTO` for catalog tables, completing the DML
  * surface (INSERT/CTAS/DELETE/TRUNCATE are elsewhere): the resolved
  * command converts to an eager command that runs the library's
  * copy-on-write [[VersionedTable.update]]/[[VersionedTable.merge]] —
  * one atomic version, untouched files carried forward, history intact.
  * The Delta architecture again: Spark resolves names and expressions,
  * the library owns the rewrite semantics, nothing is implemented twice.
  *
  * MERGE supports the canonical UPSERT shape the library defines —
  * `ON` a conjunction of same-name target/source key equalities,
  * `WHEN MATCHED THEN UPDATE SET *`, `WHEN NOT MATCHED THEN INSERT *`
  * (star-expanded or spelled out column-for-column) — and REFUSES
  * anything else with a message naming the library API, rather than
  * approximating richer clause semantics.
  */
case class GraftDmlRule(spark: SparkSession) extends Rule[LogicalPlan] {

  private def graftTarget(table: LogicalPlan): Option[GraftSqlTable] =
    table.collectFirst {
      case r: DataSourceV2Relation if r.table.isInstanceOf[GraftSqlTable] =>
        r.table.asInstanceOf[GraftSqlTable]
    }

  /** Re-express a resolved expression against the TABLE by name, so the
    * library can evaluate it on its own snapshot frame (the statement's
    * attribute ids belong to the statement's relation instance).
    */
  private def byName(e: Expression, what: String): Column = {
    require(e.deterministic, s"$what must be deterministic")
    require(e.find(_.isInstanceOf[SubqueryExpression]).isEmpty,
      s"$what must not contain a subquery")
    shims.column(e.transform {
      case a: AttributeReference => UnresolvedAttribute.quoted(a.name)
    })
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.resolveOperatorsUp {
    case u @ UpdateTable(table, assignments, condition)
        if u.resolved && graftTarget(table).isDefined =>
      val t = graftTarget(table).get
      val set = assignments.map {
        case Assignment(k: Attribute, v) => k.name -> byName(v, s"UPDATE SET ${k.name}")
        case Assignment(k, _) => throw new UnsupportedOperationException(
          s"UPDATE ${t.name()}: only plain column assignments are supported, got $k")
      }.toMap
      val cond = condition.map(byName(_, "UPDATE WHERE")).getOrElse(lit(true))
      GraftUpdateCommand(t, set, cond)

    case m @ MergeIntoTable(table, source, cond, matched, notMatched, bySource, _)
        if m.resolved && graftTarget(table).isDefined =>
      val t = graftTarget(table).get
      val targetOut = table.outputSet
      val sourceOut = source.outputSet
      def refuse(why: String): Nothing = throw new UnsupportedOperationException(
        s"MERGE INTO ${t.name()}: $why — this catalog supports the canonical " +
          "upsert (ON same-name key equalities, WHEN MATCHED THEN UPDATE SET *, " +
          "WHEN NOT MATCHED THEN INSERT *); richer clauses are the library API " +
          "(VersionedTable.update/delete/merge)")
      def keysOf(e: Expression): Seq[String] = e match {
        case And(l, r) => keysOf(l) ++ keysOf(r)
        case EqualTo(a: AttributeReference, b: AttributeReference)
            if a.name.equalsIgnoreCase(b.name) &&
              ((targetOut.contains(a) && sourceOut.contains(b)) ||
                (targetOut.contains(b) && sourceOut.contains(a))) => Seq(a.name)
        case other => refuse(s"unsupported ON clause ${other.sql}")
      }
      // a replace-whole-row assignment list: every target column set
      // from the same-named source column (what SET * / INSERT * expand to)
      def wholeRow(assigns: Seq[Assignment]): Boolean = {
        val pairs = assigns.map {
          case Assignment(k: Attribute, v: AttributeReference)
              if sourceOut.contains(v) => k.name.toLowerCase -> v.name.toLowerCase
          case _ => return false
        }
        pairs.forall { case (k, v) => k == v } &&
          pairs.map(_._1).toSet == t.schema().fieldNames.map(_.toLowerCase).toSet
      }
      matched match {
        case Seq(UpdateStarAction(None)) => ()
        case Seq(UpdateAction(None, assigns, _)) if wholeRow(assigns) => ()
        case other => refuse(s"unsupported WHEN MATCHED clause(s): $other")
      }
      notMatched match {
        case Seq(InsertStarAction(None)) => ()
        case Seq(InsertAction(None, assigns)) if wholeRow(assigns) => ()
        case other => refuse(s"unsupported WHEN NOT MATCHED clause(s): $other")
      }
      if (bySource.nonEmpty) refuse("WHEN NOT MATCHED BY SOURCE is unsupported")
      GraftMergeCommand(t, source, keysOf(cond).distinct)
  }
}

/** Eager `UPDATE` — runs the copy-on-write update at execution. */
case class GraftUpdateCommand(t: GraftSqlTable, set: Map[String, Column],
    cond: Column) extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    t.pinnedVersion.foreach(v => throw new IllegalArgumentException(
      s"cannot UPDATE ${t.name()} VERSION AS OF $v — time travel is read-only"))
    t.vt.update(cond, set)
    Seq.empty
  }
}

/** Eager canonical-upsert `MERGE INTO`. The source plan re-analyzes as
  * a standalone frame; column order/extra columns align by selecting
  * the table schema (merge itself enforces types and key uniqueness).
  */
case class GraftMergeCommand(t: GraftSqlTable, source: LogicalPlan,
    keys: Seq[String]) extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    t.pinnedVersion.foreach(v => throw new IllegalArgumentException(
      s"cannot MERGE INTO ${t.name()} VERSION AS OF $v — time travel is read-only"))
    val src = shims.dataFrame(spark, source)
      .select(t.schema().fieldNames.toIndexedSeq
        .map(n => org.apache.spark.sql.functions.col(n)): _*)
    t.vt.merge(src, keys)
    Seq.empty
  }
}
