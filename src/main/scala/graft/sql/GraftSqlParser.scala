package graft.sql

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.catalyst.{FunctionIdentifier, TableIdentifier}
import org.apache.spark.sql.catalyst.analysis.{UnresolvedAttribute, UnresolvedFunction, UnresolvedRelation, UnresolvedStar}
import org.apache.spark.sql.catalyst.expressions.{Alias, Expression, Literal}
import org.apache.spark.sql.catalyst.parser.ParserInterface
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LogicalPlan, SubqueryAlias}
import org.apache.spark.sql.connector.catalog.{CatalogNotFoundException, Identifier}
import org.apache.spark.sql.execution.command.LeafRunnableCommand

import graft.ecom.VersionedTable
import graft.ops.MvSpec

/** SQL DDL for DURABLE materialized views, the Databricks/Delta shape:
  *
  * {{{
  * CREATE MATERIALIZED VIEW cat.ns.mv AS
  *   SELECT k, COUNT(*) AS n, SUM(x) AS total, MIN(x) AS lo, MAX(x) AS hi
  *   FROM cat.ns.src GROUP BY k
  * REFRESH MATERIALIZED VIEW cat.ns.mv
  * }}}
  *
  * Spark's grammar has none of the graft statements (the two above,
  * `CREATE TABLE ... CLONE`, `OPTIMIZE`, `VACUUM`), so a
  * `ParserInterface` wrapper (injected via
  * `SparkSessionExtensions.injectParser` —
  * [[graft.functions.GraftExtensions]]) recognizes exactly these
  * prefixes and DELEGATES everything else untouched. The SELECT body is
  * parsed by the DELEGATE parser (full Spark expression syntax, no
  * private grammar) and must be the maintainable shape — one Aggregate
  * over one source table, grouping keys plus aliased
  * COUNT(*)/SUM/MIN/MAX entries; anything else refuses LOUDLY with the
  * rewrite ([[graft.ops.MvSpec]]'s contract: AVG → sum + count columns,
  * COUNT(DISTINCT) → a one-row-per-key level-1 view). The extracted
  * definition is persisted in the view's table properties by the same
  * atomic path as `CALL graft.system.create_mv`, and a bare
  * `REFRESH MATERIALIZED VIEW` maintains from the STORED spec — the
  * statement carries no algebra at all.
  */
class GraftSqlParser(delegate: ParserInterface) extends ParserInterface {
  override def parsePlan(sqlText: String): LogicalPlan =
    MvDdl.parse(sqlText, delegate).getOrElse(delegate.parsePlan(sqlText))
  // MUST delegate, not inherit the interface default: the default drops
  // the ParameterContext and `spark.sql(text, Map("p" -> v))` named
  // markers (`:p`) stop binding — the dashboard entry shape
  override def parsePlanWithParameters(sqlText: String,
      ctx: org.apache.spark.sql.catalyst.parser.ParameterContext): LogicalPlan =
    MvDdl.parse(sqlText, delegate)
      .getOrElse(delegate.parsePlanWithParameters(sqlText, ctx))
  override def parseQuery(sqlText: String): LogicalPlan = delegate.parseQuery(sqlText)
  override def parseExpression(sqlText: String): Expression =
    delegate.parseExpression(sqlText)
  override def parseTableIdentifier(sqlText: String): TableIdentifier =
    delegate.parseTableIdentifier(sqlText)
  override def parseFunctionIdentifier(sqlText: String): FunctionIdentifier =
    delegate.parseFunctionIdentifier(sqlText)
  override def parseMultipartIdentifier(sqlText: String): Seq[String] =
    delegate.parseMultipartIdentifier(sqlText)
  override def parseTableSchema(sqlText: String): org.apache.spark.sql.types.StructType =
    delegate.parseTableSchema(sqlText)
  override def parseDataType(sqlText: String): org.apache.spark.sql.types.DataType =
    delegate.parseDataType(sqlText)
  override def parseRoutineParam(sqlText: String): org.apache.spark.sql.types.StructType =
    delegate.parseRoutineParam(sqlText)
}

object MvDdl {
  // identifier: dotted parts, each plain or backquoted (no newline in a
  // backquoted part). The SELECT is everything after the AS keyword.
  private val CreateRe =
    """(?is)^\s*CREATE\s+MATERIALIZED\s+VIEW\s+(IF\s+NOT\s+EXISTS\s+)?((?:`[^`]+`|[\w$]+)(?:\.(?:`[^`]+`|[\w$]+))*)\s+AS\s+(.+?)\s*;?\s*$""".r
  private val RefreshRe =
    """(?is)^\s*REFRESH\s+MATERIALIZED\s+VIEW\s+((?:`[^`]+`|[\w$]+)(?:\.(?:`[^`]+`|[\w$]+))*)\s*;?\s*$""".r
  // CREATE TABLE t [SHALLOW] CLONE s [VERSION AS OF n] — Delta's clone
  // DDL. The mandatory CLONE keyword between two identifiers keeps
  // every regular CREATE TABLE (column list, AS SELECT, USING...) with
  // the delegate.
  private val CloneRe =
    ("""(?is)^\s*CREATE\s+TABLE\s+(IF\s+NOT\s+EXISTS\s+)?((?:`[^`]+`|[\w$]+)(?:\.(?:`[^`]+`|[\w$]+))*)\s+(?:SHALLOW\s+)?CLONE\s+""" +
      """((?:`[^`]+`|[\w$]+)(?:\.(?:`[^`]+`|[\w$]+))*)(?:\s+VERSION\s+AS\s+OF\s+(\d+))?\s*;?\s*$""").r

  // OPTIMIZE t [ZORDER BY (c1, c2)] and VACUUM t [RETAIN n HOURS] —
  // Delta's maintenance DDL. Neither word starts any Spark statement,
  // so the intercept cannot shadow delegate syntax.
  private val OptimizeRe =
    """(?is)^\s*OPTIMIZE\s+((?:`[^`]+`|[\w$]+)(?:\.(?:`[^`]+`|[\w$]+))*)(?:\s+ZORDER\s+BY\s*\(([^)]+)\))?\s*;?\s*$""".r
  private val VacuumRe =
    """(?is)^\s*VACUUM\s+((?:`[^`]+`|[\w$]+)(?:\.(?:`[^`]+`|[\w$]+))*)(?:\s+RETAIN\s+(\d+(?:\.\d+)?)\s+HOURS)?\s*;?\s*$""".r

  // CREATE [OR REPLACE] VIEW / DROP VIEW for GRAFT catalogs only —
  // Spark 4.1 ships no executable v2-view path (ViewCatalog exists but
  // neither CREATE VIEW planning nor read resolution consults it), so
  // these intercept EXACTLY when the identifier's head names a
  // registered GraftCatalog in the active session; every other view
  // statement (session-catalog views, TEMPORARY/GLOBAL TEMP views —
  // which never match, the keyword sits between CREATE and VIEW)
  // delegates untouched.
  private val CreateViewRe =
    """(?is)^\s*CREATE\s+(OR\s+REPLACE\s+)?VIEW\s+(IF\s+NOT\s+EXISTS\s+)?((?:`[^`]+`|[\w$]+)(?:\.(?:`[^`]+`|[\w$]+))*)\s+AS\s+(.+?)\s*;?\s*$""".r
  private val DropViewRe =
    """(?is)^\s*DROP\s+VIEW\s+(IF\s+EXISTS\s+)?((?:`[^`]+`|[\w$]+)(?:\.(?:`[^`]+`|[\w$]+))*)\s*;?\s*$""".r

  // DESCRIBE MATERIALIZED VIEW v — the per-view detail face of the
  // graft_materialized_views TVF: the stored definition plus freshness
  // cursors, one (property, value) row each. Spark's own DESCRIBE
  // grammar has no MATERIALIZED form, so the intercept shadows nothing.
  private val DescribeMvRe =
    """(?is)^\s*DESC(?:RIBE)?\s+MATERIALIZED\s+VIEW\s+((?:`[^`]+`|[\w$]+)(?:\.(?:`[^`]+`|[\w$]+))*)\s*;?\s*$""".r

  // SHOW MATERIALIZED VIEWS [IN cat[.ns]] — catalog-scoped listing with
  // staleness (the TVF takes a warehouse PATH; this takes names).
  // Spark's SHOW grammar has no MATERIALIZED form either.
  private val ShowMvRe =
    """(?is)^\s*SHOW\s+MATERIALIZED\s+VIEWS(?:\s+(?:IN|FROM)\s+((?:`[^`]+`|[\w$]+)(?:\.(?:`[^`]+`|[\w$]+))*))?\s*;?\s*$""".r

  /** Whether `parts` EXPLICITLY addresses a registered [[GraftCatalog]]
    * (head resolves to one). Parse-time gate for the view intercepts:
    * anything else — including unqualified names in a graft current
    * catalog, which Spark's own temp-view machinery must see first —
    * stays with the delegate.
    */
  private def headIsGraftCatalog(parts: Seq[String]): Boolean =
    parts.length >= 2 && scala.util.Try(
      org.apache.spark.sql.graft.shims.catalogPlugin(
        SparkSession.active, parts.head)).toOption
      .exists(_.isInstanceOf[GraftCatalog])

  /** The graft DDL statements, or None → the delegate owns the text. */
  def parse(sqlText: String, delegate: ParserInterface): Option[LogicalPlan] =
    sqlText match {
      case CreateRe(ifNotExists, name, select) =>
        Some(CreateMaterializedViewCommand(
          delegate.parseMultipartIdentifier(name),
          select, delegate.parsePlan(select), ifNotExists != null))
      case RefreshRe(name) =>
        Some(RefreshMaterializedViewCommand(
          delegate.parseMultipartIdentifier(name)))
      case CloneRe(ifNotExists, target, source, version) =>
        Some(CloneTableCommand(
          delegate.parseMultipartIdentifier(target),
          delegate.parseMultipartIdentifier(source),
          Option(version).map(_.toLong), ifNotExists != null))
      case OptimizeRe(name, zorder) =>
        Some(OptimizeTableCommand(
          delegate.parseMultipartIdentifier(name),
          Option(zorder).toSeq.flatMap(_.split(',').map(_.trim.stripPrefix("`")
            .stripSuffix("`")).filter(_.nonEmpty))))
      case VacuumRe(name, retain) =>
        Some(VacuumTableCommand(
          delegate.parseMultipartIdentifier(name),
          Option(retain).map(_.toDouble)))
      case CreateViewRe(orReplace, ifNotExists, name, select)
          if headIsGraftCatalog(delegate.parseMultipartIdentifier(name)) =>
        Some(CreateGraftViewCommand(
          delegate.parseMultipartIdentifier(name), select,
          orReplace != null, ifNotExists != null))
      case DropViewRe(ifExists, name)
          if headIsGraftCatalog(delegate.parseMultipartIdentifier(name)) =>
        Some(DropGraftViewCommand(
          delegate.parseMultipartIdentifier(name), ifExists != null))
      case DescribeMvRe(name) =>
        Some(DescribeMaterializedViewCommand(
          delegate.parseMultipartIdentifier(name)))
      case ShowMvRe(target) =>
        Some(ShowMaterializedViewsCommand(Option(target).toSeq
          .flatMap(delegate.parseMultipartIdentifier)))
      case _ => None
    }

  /** Resolve a DDL identifier to (graft catalog, in-catalog identifier):
    * a first part naming a registered catalog wins; otherwise the
    * session's CURRENT catalog (Spark's own resolution order). The
    * catalog must be a [[GraftCatalog]] — materialized views are
    * versioned tables whose metadata carries the definition.
    */
  def resolve(spark: SparkSession, parts: Seq[String]): (GraftCatalog, Identifier) = {
    require(parts.nonEmpty, "empty identifier")
    val (plugin, rest) =
      if (parts.length >= 2)
        try (org.apache.spark.sql.graft.shims.catalogPlugin(spark, parts.head),
          parts.tail)
        catch { case _: CatalogNotFoundException =>
          (org.apache.spark.sql.graft.shims.currentCatalog(spark), parts)
        }
      else (org.apache.spark.sql.graft.shims.currentCatalog(spark), parts)
    plugin match {
      case g: GraftCatalog => (g, Identifier.of(rest.init.toArray, rest.last))
      case other => throw new IllegalArgumentException(
        s"materialized views live in a graft catalog; '${other.name}' is " +
          s"${other.getClass.getName}. Register one with " +
          "spark.sql.catalog.<name>=graft.sql.GraftCatalog and qualify the " +
          "view (and its source) with it.")
    }
  }

  private def refuse(what: String): Nothing =
    throw new IllegalArgumentException(
      "CREATE MATERIALIZED VIEW takes the maintainable shape — " +
        "SELECT <keys and aliased row-local key expressions>, COUNT(*) " +
        "AS <n>, then aliased SUM/MIN/MAX entries over row-local " +
        "expressions, FROM <one source table> [LEFT JOIN <dimension " +
        "table> USING (<keys>)]... [WHERE <row-local filter>] GROUP BY " +
        s"<keys> — but $what. AVG is not self-maintainable: maintain the " +
        "sum and a non-null count as two columns and derive at query time; " +
        "COUNT(DISTINCT k) becomes a row count over a one-row-per-k view.")

  /** Extract the [[MvSpec]] algebra from the parsed (unresolved) SELECT.
    * Strict by design: the statement IS the stored contract every future
    * refresh maintains, so anything outside the maintainable algebra
    * refuses here, at CREATE time, with the rewrite.
    *
    * Accepted FROM shapes: one source table, optionally LEFT-JOINed
    * (USING only — the join key is one shared column set, which is what
    * makes the dimension's retract/re-add repair derivable) with plain
    * dimension tables, optionally filtered by a row-local WHERE. Every
    * column reference must be unqualified and resolve to exactly ONE of
    * the joined schemas — ambiguity refuses with the rename rewrite
    * rather than silently picking a side.
    */
  def specOf(spark: SparkSession, select: LogicalPlan): MvSpec = {
    import org.apache.spark.sql.catalyst.plans.logical.{Filter, Join}
    import org.apache.spark.sql.catalyst.plans.{Inner, LeftOuter, UsingJoin}
    val agg = select match {
      case a: Aggregate => a
      case other => refuse(
        s"the statement parsed to ${other.nodeName}, not a single " +
          "GROUP BY aggregate (no HAVING/ORDER/LIMIT/DISTINCT/subquery)")
    }
    // peel WHERE, then the left-deep USING-join spine, down to the fact
    val (whereSql, relTree) = agg.child match {
      case Filter(cond, child) =>
        (Some(cond.sql), child)
      case other => (None, other)
    }
    def relParts(p: LogicalPlan): Option[Seq[String]] = p match {
      case r: UnresolvedRelation => Some(r.multipartIdentifier)
      case SubqueryAlias(_, r: UnresolvedRelation) => Some(r.multipartIdentifier)
      case _ => None
    }
    // dimension joins, innermost-first after the loop
    var dimJoins = List.empty[(Seq[String], Seq[String])] // (table parts, using keys)
    var spine: LogicalPlan = relTree
    var guard = 0
    while (spine.isInstanceOf[Join]) {
      guard += 1
      require(guard <= 16, "CREATE MATERIALIZED VIEW: too many joins")
      val j = spine.asInstanceOf[Join]
      val dimParts = relParts(j.right).getOrElse(refuse(
        s"the JOIN right side is ${j.right.nodeName}, not one plain " +
          "dimension table"))
      j.joinType match {
        case UsingJoin(LeftOuter, usingCols) =>
          dimJoins = (dimParts, usingCols) :: dimJoins
        case UsingJoin(Inner, _) => refuse(
          "the JOIN is INNER — only LEFT JOIN ... USING (...) is " +
            "maintainable (the dimension repair rule retracts/re-adds " +
            "the left side's contributions); use LEFT JOIN, and filter " +
            "a dimension column IS NOT NULL in WHERE if you need " +
            "inner-join semantics")
        case _: UsingJoin => refuse(
          "the JOIN type is outside LEFT JOIN ... USING (...)")
        case _ => refuse(
          "the JOIN condition is an ON clause — dimension joins must be " +
            "USING (<shared key columns>) so the repair rule knows the " +
            "dimension's key")
      }
      spine = j.left
    }
    val srcParts = relParts(spine).getOrElse(refuse(
      s"the FROM clause is ${spine.nodeName}, not one plain source table"))
    val (srcCat, srcIdent) = resolve(spark, srcParts)
    if (!srcCat.tableExists(srcIdent))
      throw new org.apache.spark.sql.catalyst.analysis.NoSuchTableException(srcIdent)
    val factSchema = graft.ecom.VersionedTable(spark, srcCat.dirOf(srcIdent))
      .read().schema
    val dimTables = dimJoins.map { case (parts, usingCols) =>
      val (cat, ident) = resolve(spark, parts)
      if (!cat.tableExists(ident))
        throw new org.apache.spark.sql.catalyst.analysis.NoSuchTableException(ident)
      val dir = cat.dirOf(ident)
      val schema = graft.ecom.VersionedTable(spark, dir).read().schema
      usingCols.foreach { k =>
        require(schema.fieldNames.exists(_.equalsIgnoreCase(k)),
          s"USING column '$k' is not in dimension ${parts.mkString(".")}")
        require(factSchema.fieldNames.exists(_.equalsIgnoreCase(k)) ||
          dimJoins.takeWhile(_._1 != parts).exists(_._2.contains(k)),
          s"USING column '$k' is not in the source table")
      }
      (dir, usingCols, schema)
    }

    val keyNames = agg.groupingExpressions.map {
      case a: UnresolvedAttribute if a.nameParts.length == 1 => a.nameParts.head
      case other => refuse(
        s"GROUP BY entry '${other.sql}' is not a plain column name — " +
          "alias the expression in the SELECT list and GROUP BY the alias")
    }
    var countCol: Option[String] = None
    val sums = Seq.newBuilder[(String, String)]
    val mins = Seq.newBuilder[(String, String)]
    val maxes = Seq.newBuilder[(String, String)]
    val keyExprs = Seq.newBuilder[(String, String)]
    val avgs = Seq.newBuilder[(String, String)]
    def rowLocal(name: String, arg: Expression, what: String): (String, String) =
      // re-render through MvSpec's validator so a smuggled nested
      // aggregate gets the SAME loud refusal as the procedure form
      MvSpec.parsePairs(s"$name:${arg.sql}", what).head
    agg.aggregateExpressions.foreach {
      case a: UnresolvedAttribute if a.nameParts.length == 1 &&
          keyNames.contains(a.nameParts.head) => () // a grouping key
      case Alias(f: UnresolvedFunction, name) if f.nameParts.length == 1 &&
          !keyNames.contains(name) =>
        val fn = f.nameParts.head.toLowerCase
        if (f.isDistinct) refuse(
          s"'$name' uses $fn(DISTINCT ...) — a distinct aggregate is not " +
            "incrementally maintainable in one level; use a TWO-LEVEL MV " +
            "cascade: level 1 GROUPs BY the distinct column (its rows ARE " +
            "the distinct values), level 2 COUNT(*)s level 1's change feed " +
            "— the customer_360 shape")
        require(!name.toLowerCase.startsWith(graft.ops.MvSpec.HiddenPrefix),
          s"CREATE MATERIALIZED VIEW: output column '$name' uses the " +
            s"reserved prefix '${graft.ops.MvSpec.HiddenPrefix}'")
        (fn, f.arguments) match {
          case ("count", Seq(_: UnresolvedStar)) | ("count", Seq(Literal(_, _))) =>
            require(countCol.isEmpty,
              "CREATE MATERIALIZED VIEW: more than one COUNT(*) entry")
            countCol = Some(name)
          case ("count", Seq(arg)) =>
            // COUNT(expr) is mechanically a maintained SUM of the
            // row-local null indicator — stored directly under the
            // output name (no read-face derivation needed)
            val (_, e) = rowLocal(name, arg, "sums")
            sums += name -> s"CASE WHEN ($e) IS NOT NULL THEN 1 ELSE 0 END"
          case ("count", _) => refuse(
            s"'$name' is COUNT with ${f.arguments.length} arguments — " +
              "only COUNT(*) and COUNT(<expr>) are supported")
          case ("avg" | "mean", Seq(arg)) =>
            // AVG(x) decomposes into two maintained sums (SUM(x) and the
            // non-null count) under reserved hidden names; the read face
            // re-derives sum / NULLIF(count, 0) and hides the carriers —
            // exactly SQL's AVG (null iff no non-null value), maintained
            // incrementally
            val (_, e) = rowLocal(name, arg, "avgs")
            avgs += name -> e
            sums += graft.ops.MvSpec.hiddenSum(name) -> e
            sums += graft.ops.MvSpec.hiddenCnt(name) ->
              s"CASE WHEN ($e) IS NOT NULL THEN 1 ELSE 0 END"
          case ("sum", Seq(arg)) => sums += rowLocal(name, arg, "sums")
          case ("min", Seq(arg)) => mins += rowLocal(name, arg, "mins")
          case ("max", Seq(arg)) => maxes += rowLocal(name, arg, "maxes")
          case _ => refuse(s"'$name' is $fn(...), outside COUNT/SUM/AVG/MIN/MAX")
        }
      case Alias(e, name) if keyNames.contains(name) =>
        // a DERIVED grouping key: a row-local expression (the null-safe
        // coalesce over a dimension miss is the canonical use)
        keyExprs += rowLocal(name, e, "key_exprs")
      case a: UnresolvedAttribute => refuse(
        s"select entry '${a.sql}' is not a GROUP BY key")
      case other => refuse(
        s"select entry '${other.sql}' is not an aliased COUNT/SUM/MIN/MAX " +
          "or an aliased GROUP BY key expression")
    }

    // assign every referenced column to the fact or exactly one
    // dimension — unknown and ambiguous names refuse at CREATE
    val derived = keyExprs.result().map(_._1).toSet
    val usingKeys = dimTables.flatMap(_._2).toSet
    val referenced = collection.mutable.LinkedHashSet.empty[String]
    def collectRefs(e: Expression): Unit = e.foreach {
      case a: UnresolvedAttribute =>
        if (a.nameParts.length > 1) refuse(
          s"column reference '${a.sql}' is qualified — use unqualified " +
            "names (rename colliding columns instead)")
        referenced += a.nameParts.head
      case _ => ()
    }
    agg.aggregateExpressions.foreach(collectRefs)
    agg.groupingExpressions.foreach(collectRefs)
    whereSql.foreach(_ => agg.child match {
      case org.apache.spark.sql.catalyst.plans.logical.Filter(cond, _) =>
        collectRefs(cond)
      case _ => ()
    })
    val dimCols = collection.mutable.Map.empty[String, List[String]]
      .withDefaultValue(Nil)
    referenced.filterNot(derived).filterNot(usingKeys).foreach { n =>
      val inFact = factSchema.fieldNames.exists(_.equalsIgnoreCase(n))
      val owners = dimTables.filter(_._3.fieldNames.exists(_.equalsIgnoreCase(n)))
      (inFact, owners) match {
        case (true, Nil) => () // a plain fact column
        case (false, Seq((dir, _, _))) =>
          dimCols(dir) = n :: dimCols(dir)
        case (false, Nil) => refuse(
          s"column '$n' is in neither the source table nor any joined " +
            "dimension")
        case _ => refuse(
          s"column '$n' exists in more than one joined table — rename it " +
            "on one side so the reference is unambiguous")
      }
    }

    val dims = dimTables.map { case (dir, usingCols, _) =>
      graft.ops.MvDim(dir, usingCols, dimCols(dir).reverse)
    }
    MvSpec(srcCat.dirOf(srcIdent), keyNames,
      countCol.getOrElse(refuse("no COUNT(*) entry (the count column is " +
        "what lets group deaths DELETE)")),
      sums.result(), mins.result(), maxes.result(), netKeys = Nil,
      where = whereSql.map { w => MvSpec.validateRowLocal(w, "where"); w },
      dims = dims, keyExprs = keyExprs.result(), avgs = avgs.result())
  }
}

/** `CREATE MATERIALIZED VIEW [IF NOT EXISTS] v AS SELECT ...` — extract
  * the maintainable algebra, bootstrap, persist the spec (one atomic
  * metadata commit); identical-definition re-create is idempotent, a
  * DIFFERENT definition refuses (IF NOT EXISTS short-circuits instead).
  */
case class CreateMaterializedViewCommand(viewParts: Seq[String],
    selectText: String, select: LogicalPlan, ifNotExists: Boolean)
    extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    val (cat, ident) = MvDdl.resolve(spark, viewParts)
    val view = VersionedTable(spark, cat.dirOf(ident))
    if (ifNotExists && MvSpec.load(view).isDefined) return Seq.empty
    val spec = MvDdl.specOf(spark, select)
    MvSpec.ensure(spark, view, spec, viewParts.mkString("."))
    Seq.empty
  }
}

/** `CREATE TABLE t [SHALLOW] CLONE s [VERSION AS OF n]` — the DDL face
  * of [[graft.ecom.VersionedTable.cloneTo]] (same semantics as
  * `CALL graft.system.clone`): an INDEPENDENT snapshot clone with
  * create-table rules — existing target refuses (IF NOT EXISTS
  * short-circuits), the target namespace must already exist. SHALLOW
  * is accepted for Delta-syntax compatibility; the storage strategy
  * (hard link where supported, copy otherwise) is the engine's.
  */
case class CloneTableCommand(targetParts: Seq[String],
    sourceParts: Seq[String], version: Option[Long], ifNotExists: Boolean)
    extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    val (srcCat, srcIdent) = MvDdl.resolve(spark, sourceParts)
    if (!srcCat.tableExists(srcIdent))
      throw new org.apache.spark.sql.catalyst.analysis.NoSuchTableException(srcIdent)
    val (tgtCat, tgtIdent) = MvDdl.resolve(spark, targetParts)
    if (tgtCat.tableExists(tgtIdent)) {
      if (ifNotExists) return Seq.empty
      throw new org.apache.spark.sql.catalyst.analysis
        .TableAlreadyExistsException(tgtIdent)
    }
    if (!tgtCat.namespaceExists(tgtIdent.namespace))
      throw new org.apache.spark.sql.catalyst.analysis
        .NoSuchNamespaceException(tgtIdent.namespace)
    VersionedTable(spark, srcCat.dirOf(srcIdent))
      .cloneTo(tgtCat.dirOf(tgtIdent), version.getOrElse(-1L)): Unit
    Seq.empty
  }
}

/** `OPTIMIZE t [ZORDER BY (c1, ...)]` — Delta's maintenance DDL face
  * of [[graft.ecom.VersionedTable.optimize]]/`optimizeZOrder` (the
  * `CALL graft.system.optimize`/`zorder` procedures' twin): bin-pack
  * small files, or rewrite z-order-clustered on the given columns.
  * dataChange=false semantics — readers, streams and feed windows see
  * rowsPreserved versions.
  */
case class OptimizeTableCommand(tableParts: Seq[String],
    zorderCols: Seq[String]) extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    val (cat, ident) = MvDdl.resolve(spark, tableParts)
    if (!cat.tableExists(ident))
      throw new org.apache.spark.sql.catalyst.analysis.NoSuchTableException(ident)
    val vt = VersionedTable(spark, cat.dirOf(ident))
    if (zorderCols.isEmpty) vt.optimize(): Unit
    else vt.optimizeZOrder(zorderCols): Unit
    Seq.empty
  }
}

/** `VACUUM t [RETAIN n HOURS]` — Delta's retention DDL: drop versions
  * whose commit is older than the retention window (default 168 hours,
  * Delta's own default) and reclaim files no retained version
  * references.
  *
  * Safety (Delta's retentionDurationCheck, same default): a retention
  * under [[VacuumTableCommand.MinRetainHours]] REFUSES — a grace-0
  * vacuum reclaims a concurrent writer's not-yet-published commit dir
  * and files under in-flight readers (the exact hazard the repo's
  * manifest-tail soak documents). An operator who accepts that risk
  * disables the check explicitly with
  * `SET graft.vacuum.retentionCheck.enabled=false` (tests, single-
  * writer reclaim); with the check ON, the unreferenced-file grace is
  * additionally floored at the library default so the retention window
  * can never shrink the orphan grace below it.
  */
case class VacuumTableCommand(tableParts: Seq[String],
    retainHours: Option[Double]) extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    val (cat, ident) = MvDdl.resolve(spark, tableParts)
    if (!cat.tableExists(ident))
      throw new org.apache.spark.sql.catalyst.analysis.NoSuchTableException(ident)
    val hours = retainHours.getOrElse(VacuumTableCommand.MinRetainHours)
    val checkOn = spark.conf
      .getOption(VacuumTableCommand.RetentionCheckKey).forall(_.toBoolean)
    if (checkOn && hours < VacuumTableCommand.MinRetainHours)
      throw new IllegalArgumentException(
        s"VACUUM ${tableParts.mkString(".")} RETAIN $hours HOURS is under " +
          s"the ${VacuumTableCommand.MinRetainHours.toLong}-hour safety " +
          "minimum — a short window deletes files out from under in-flight " +
          "readers and concurrent writers' unpublished commits. If you " +
          "accept that risk, disable the check first with SET " +
          s"${VacuumTableCommand.RetentionCheckKey}=false")
    val ms = (hours * 3600 * 1000).toLong
    VersionedTable(spark, cat.dirOf(ident))
      .vacuumOlderThan(System.currentTimeMillis() - ms,
        unreferencedGraceMs =
          if (checkOn) math.max(ms, VersionedTable.DefaultVacuumGraceMs) else ms)
    Seq.empty
  }
}

object VacuumTableCommand {
  /** Delta's default retention window (168 h) doubles as the safety
    * minimum the retention check enforces.
    */
  val MinRetainHours: Double = 168.0
  /** Session config disabling the minimum-retention refusal (Delta's
    * `retentionDurationCheck.enabled` shape). Default: enabled.
    */
  val RetentionCheckKey: String = "graft.vacuum.retentionCheck.enabled"
}

/** `CREATE [OR REPLACE] VIEW cat.ns.v AS SELECT ...` against a graft
  * catalog: validate the SELECT NOW (parse + full analysis, resolving
  * tables, MVs and other views), refuse a transitive self-reference
  * (the analyzer's fixed point cannot terminate on a view cycle), and
  * persist the text atomically ([[GraftViews.store]]). Reads re-plan
  * the stored text per query ([[GraftViewRule]]) — the compose-at-read
  * layer the reference's product_metrics needs over its maintained
  * aggregates.
  */
case class CreateGraftViewCommand(viewParts: Seq[String], selectText: String,
    orReplace: Boolean, ifNotExists: Boolean) extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    val (cat, ident) = MvDdl.resolve(spark, viewParts)
    if (cat.tableExists(ident))
      throw new org.apache.spark.sql.catalyst.analysis
        .TableAlreadyExistsException(ident)
    if (!cat.namespaceExists(ident.namespace))
      throw new org.apache.spark.sql.catalyst.analysis
        .NoSuchNamespaceException(ident.namespace)
    val dir = cat.dirOf(ident)
    val exists = GraftViews.isViewDir(spark, dir)
    if (exists && ifNotExists) return Seq.empty
    if (exists && !orReplace)
      throw new IllegalArgumentException(
        s"view ${viewParts.mkString(".")} already exists — use CREATE OR " +
          "REPLACE VIEW to redefine it, or DROP VIEW first")
    require(!GraftViews.referencedViews(spark, selectText).contains(dir),
      s"view ${viewParts.mkString(".")}: the SELECT (transitively) " +
        "references the view itself — view definitions must be acyclic")
    // full analysis now: unknown tables/columns refuse at CREATE, with
    // the statement in hand, not at first read
    spark.sessionState.executePlan(
      spark.sessionState.sqlParser.parsePlan(selectText)).assertAnalyzed()
    GraftViews.store(spark, dir, selectText)
    Seq.empty
  }
}

/** `DROP VIEW [IF EXISTS] cat.ns.v` for graft-catalog views. */
case class DropGraftViewCommand(viewParts: Seq[String], ifExists: Boolean)
    extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    val (cat, ident) = MvDdl.resolve(spark, viewParts)
    // an existing TABLE (or materialized view) at the identifier is a
    // different object class: refuse loudly — IF EXISTS must not mask
    // "the object exists but is not a view" as a silent success, and a
    // bare DROP VIEW must not claim nothing is there
    if (cat.tableExists(ident))
      throw new IllegalArgumentException(
        s"${viewParts.mkString(".")} is a table (or materialized view), " +
          "not a view — use DROP TABLE")
    val dropped = GraftViews.drop(spark, cat.dirOf(ident))
    if (!dropped && !ifExists)
      throw new org.apache.spark.sql.catalyst.analysis.NoSuchTableException(ident)
    Seq.empty
  }
}

/** `DESCRIBE MATERIALIZED VIEW v` — the stored definition plus
  * freshness, one (property, value) row each: the declared algebra
  * exactly as persisted (source, keys, count column, measure entries,
  * WHERE, dimensions, derived keys, AVG read-face entries) and the
  * operational state the TVF lists (refresh cursor vs source head,
  * per-dimension cursors, the stale flag). Manifest/txn-marker reads
  * only — zero jobs.
  */
case class DescribeMaterializedViewCommand(viewParts: Seq[String])
    extends LeafRunnableCommand {
  import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference}
  import org.apache.spark.sql.types.StringType

  override val output: Seq[Attribute] = Seq(
    AttributeReference("property", StringType, nullable = false)(),
    AttributeReference("value", StringType, nullable = false)())

  override def run(spark: SparkSession): Seq[Row] = {
    val (cat, ident) = MvDdl.resolve(spark, viewParts)
    if (!cat.tableExists(ident))
      throw new org.apache.spark.sql.catalyst.analysis.NoSuchTableException(ident)
    val view = VersionedTable(spark, cat.dirOf(ident))
    val spec = MvSpec.load(view).getOrElse(throw new IllegalArgumentException(
      s"${viewParts.mkString(".")} carries no stored materialized-view " +
        "definition — it is a plain table (DESCRIBE TABLE) or a view " +
        "(its SELECT is in graft_views)"))
    val src = VersionedTable(spark, spec.source)
    val cursor = view.currentBatchId(graft.ops.IncrementalAgg.appFor(src))
    val head = src.currentVersion()
    val dimStates = spec.dims.map { d =>
      (d, view.currentBatchId(d.app),
        VersionedTable(spark, d.source).currentVersion())
    }
    val stale = head.exists(h => cursor.forall(_ < h)) ||
      dimStates.exists { case (_, cur, h) => h.exists(v => cur.forall(_ < v)) }
    def pairs(ps: Seq[(String, String)]): String =
      ps.map { case (n, e) => s"$n: $e" }.mkString("; ")
    def opt(o: Option[Long]): String = o.fold("-")(_.toString)
    Seq(
      Some("source" -> spec.source),
      Some("keys" -> spec.keys.mkString(", ")),
      Some("count_col" -> spec.countCol),
      Some("sums" -> pairs(spec.sums)).filter(_ => spec.sums.nonEmpty),
      Some("mins" -> pairs(spec.mins)).filter(_ => spec.mins.nonEmpty),
      Some("maxes" -> pairs(spec.maxes)).filter(_ => spec.maxes.nonEmpty),
      Some("avgs" -> pairs(spec.avgs)).filter(_ => spec.avgs.nonEmpty),
      spec.where.map("where" -> _),
      Some("key_exprs" -> pairs(spec.keyExprs)).filter(_ => spec.keyExprs.nonEmpty),
      Some("net_keys" -> spec.netKeys.mkString(", "))
        .filter(_ => spec.netKeys.nonEmpty),
      Some("refreshed_source_version" -> opt(cursor)),
      Some("source_head" -> opt(head)),
      Some("stale" -> stale.toString)
    ).flatten.map { case (k, v) => Row(k, v) } ++
      dimStates.map { case (d, cur, h) =>
        Row(s"dim:${d.source}",
          s"keys=${d.joinKeys.mkString(",")} cols=${d.cols.mkString(",")} " +
            s"cursor=${opt(cur)} head=${opt(h)}")
      }
  }
}

/** `SHOW MATERIALIZED VIEWS [IN cat[.ns]]` — every stored MV spec in
  * the scope (a whole graft catalog, one namespace, or the session's
  * current catalog when unqualified) with its freshness: refresh
  * cursor vs source head and the stale flag — the name-scoped twin of
  * the path-scoped `graft_materialized_views('<wh>')` TVF. Manifest
  * and txn-marker reads only.
  */
case class ShowMaterializedViewsCommand(scope: Seq[String])
    extends LeafRunnableCommand {
  import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference}
  import org.apache.spark.sql.types.{BooleanType, StringType}

  override val output: Seq[Attribute] = Seq(
    AttributeReference("namespace", StringType, nullable = false)(),
    AttributeReference("view", StringType, nullable = false)(),
    AttributeReference("source", StringType, nullable = false)(),
    AttributeReference("stale", BooleanType, nullable = false)())

  override def run(spark: SparkSession): Seq[Row] = {
    val (cat, nss) = scope match {
      case Nil =>
        org.apache.spark.sql.graft.shims.currentCatalog(spark) match {
          case g: GraftCatalog => (g, g.listNamespaces().toSeq)
          case other => throw new IllegalArgumentException(
            "SHOW MATERIALIZED VIEWS: the current catalog " +
              s"('${other.name}') is not a graft catalog — qualify the " +
              "scope (SHOW MATERIALIZED VIEWS IN <cat>[.<ns>])")
        }
      case head +: rest =>
        scala.util.Try(org.apache.spark.sql.graft.shims
            .catalogPlugin(spark, head)).toOption match {
          case Some(g: GraftCatalog) =>
            (g, if (rest.isEmpty) g.listNamespaces().toSeq
                else Seq(rest.toArray))
          case Some(other) => throw new IllegalArgumentException(
            s"SHOW MATERIALIZED VIEWS: '$head' is not a graft catalog " +
              s"(${other.getClass.getName})")
          case None =>
            org.apache.spark.sql.graft.shims.currentCatalog(spark) match {
              case g: GraftCatalog => (g, Seq(scope.toArray))
              case other => throw new IllegalArgumentException(
                s"SHOW MATERIALIZED VIEWS: '$head' names no catalog and " +
                  s"the current catalog ('${other.name}') is not a graft " +
                  "catalog")
            }
        }
    }
    (for {
      ns <- nss
      ident <- cat.listTables(ns)
      view = VersionedTable(spark, cat.dirOf(ident))
      spec <- scala.util.Try(MvSpec.load(view)).toOption.flatten
    } yield {
      val src = VersionedTable(spark, spec.source)
      val head = src.currentVersion()
      val cursor = view.currentBatchId(graft.ops.IncrementalAgg.appFor(src))
      val stale = head.exists(h => cursor.forall(_ < h)) ||
        spec.dims.exists { d =>
          val cur = view.currentBatchId(d.app)
          VersionedTable(spark, d.source).currentVersion()
            .exists(v => cur.forall(_ < v))
        }
      Row(ns.mkString("."), ident.name(), spec.source, stale)
    }).sortBy(r => (r.getString(0), r.getString(1)))
  }
}

/** `REFRESH MATERIALIZED VIEW v` — one incremental refresh from the
  * STORED definition; refuses if the table carries none (the statement
  * deliberately cannot re-state algebra — that drift vector is the one
  * durable specs exist to remove).
  */
case class RefreshMaterializedViewCommand(viewParts: Seq[String])
    extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    val (cat, ident) = MvDdl.resolve(spark, viewParts)
    if (!cat.tableExists(ident))
      throw new org.apache.spark.sql.catalyst.analysis.NoSuchTableException(ident)
    val view = VersionedTable(spark, cat.dirOf(ident))
    val spec = MvSpec.load(view).getOrElse(throw new IllegalArgumentException(
      s"${viewParts.mkString(".")} carries no stored materialized-view " +
        "definition — create it with CREATE MATERIALIZED VIEW ... AS " +
        "SELECT ... (or CALL graft.system.create_mv)"))
    spec.refresh(spark, view): Unit
    Seq.empty
  }
}
