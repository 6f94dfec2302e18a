package graft.sql

import java.util.{Map => JMap}

import scala.jdk.CollectionConverters._

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.{NoSuchNamespaceException, NoSuchTableException, TableAlreadyExistsException}
import org.apache.spark.sql.connector.catalog.{Identifier, NamespaceChange, ProcedureCatalog, SupportsNamespaces, Table, TableCatalog, TableChange}
import org.apache.spark.sql.connector.catalog.procedures.{BoundProcedure, ProcedureParameter, UnboundProcedure}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.Scan
import org.apache.spark.sql.types.{IntegerType, LongType, StringType, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.ecom.VersionedTable

/** A path-based [[TableCatalog]] over the versioned (ACID) table format
  * — the piece that makes every table the library writes addressable
  * from plain SQL by NAME, the way the reference's Databricks tables
  * are (`ecom_catalog.gold.*` in `analysis/dashboard_queries`,
  * `03_gold_aggregate.py:28-30`):
  *
  * {{{
  * spark.sql.catalog.graft           = graft.sql.GraftCatalog
  * spark.sql.catalog.graft.warehouse = /data/warehouse
  *
  * SELECT * FROM graft.gold.product_metrics
  * SELECT * FROM graft.gold.product_metrics VERSION AS OF 3
  * SELECT * FROM graft.gold.product_metrics TIMESTAMP AS OF '2024-03-01'
  * INSERT INTO graft.gold.product_metrics SELECT ...
  * CREATE TABLE graft.gold.t (id BIGINT, v STRING)
  * }}}
  *
  * Layout mirrors a Hive-style warehouse: namespace `gold` is directory
  * `warehouse/gold`, table `t` is `warehouse/gold/t` — any directory
  * carrying a `_graft_log` is a table, so tables written through the
  * library API (Lakehouse/VersionedTable) are visible with NO separate
  * registration step, and catalog-created tables are ordinary versioned
  * tables the library can open. The catalog holds no state of its own:
  * the manifest log IS the metadata (the path Delta takes), so a
  * 1000-executor cluster needs no metastore round-trips beyond the
  * manifest reads the format already does.
  */
class GraftCatalog extends TableCatalog with SupportsNamespaces
    with ProcedureCatalog {

  private var catalogName: String = _
  private var warehouse: String = _

  override def initialize(name: String, options: CaseInsensitiveStringMap): Unit = {
    catalogName = name
    warehouse = Option(options.get("warehouse")).getOrElse(
      throw new IllegalArgumentException(
        s"catalog $name requires spark.sql.catalog.$name.warehouse"))
  }

  override def name(): String = catalogName

  // advertises ALTER TABLE ADD/DROP CONSTRAINT routing (alterTable
  // receives TableChange.AddConstraint/DropConstraint; only CHECK lands)
  override def capabilities(): java.util.Set[
      org.apache.spark.sql.connector.catalog.TableCatalogCapability] =
    java.util.EnumSet.of(
      org.apache.spark.sql.connector.catalog.TableCatalogCapability
        .SUPPORT_TABLE_CONSTRAINT,
      org.apache.spark.sql.connector.catalog.TableCatalogCapability
        .SUPPORTS_CREATE_TABLE_WITH_GENERATED_COLUMNS)

  private def spark: SparkSession = SparkSession.active
  private def fs =
    new Path(warehouse).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def nsPath(namespace: Array[String]): Path =
    namespace.foldLeft(new Path(warehouse))((p, s) => new Path(p, s))
  private def tablePath(ident: Identifier): Path =
    new Path(nsPath(ident.namespace), ident.name)
  private def isTable(p: Path): Boolean =
    fs.exists(new Path(p, "_graft_log"))
  // a VIEW directory (GraftViews marker) is neither a table nor a
  // namespace — it must not surface in namespace listings
  private def isView(p: Path): Boolean =
    fs.exists(new Path(p, GraftViews.MarkerFile))

  private def open(ident: Identifier): VersionedTable =
    VersionedTable(spark, tablePath(ident).toString)

  /** Public path resolution for the MV DDL commands ([[MvDdl]]) — the
    * same warehouse layout every procedure resolves through.
    */
  def dirOf(ident: Identifier): String = tablePath(ident).toString
  private def qualified(ident: Identifier): String =
    (catalogName +: ident.namespace :+ ident.name).mkString(".")

  // ---- tables ---------------------------------------------------------

  override def listTables(namespace: Array[String]): Array[Identifier] = {
    // a TABLE dir is not a namespace — listing "inside" one is the
    // same error as a missing namespace, not an empty listing
    if (!namespaceExists(namespace)) throw new NoSuchNamespaceException(namespace)
    fs.listStatus(nsPath(namespace)).filter(_.isDirectory).map(_.getPath)
      .filter(isTable).map(d => Identifier.of(namespace, d.getName))
  }

  override def tableExists(ident: Identifier): Boolean = isTable(tablePath(ident))

  override def loadTable(ident: Identifier): Table = {
    if (!tableExists(ident)) throw new NoSuchTableException(ident)
    GraftSqlTable(qualified(ident), open(ident), pinnedVersion = None)
  }

  /** `VERSION AS OF n` — Spark routes the SQL clause here. */
  override def loadTable(ident: Identifier, version: String): Table = {
    if (!tableExists(ident)) throw new NoSuchTableException(ident)
    val v = try version.toLong catch {
      case _: NumberFormatException => throw new IllegalArgumentException(
        s"${qualified(ident)}: VERSION AS OF takes a numeric version, got '$version'")
    }
    val vt = open(ident)
    require(vt.versions().contains(v),
      s"version $v of ${qualified(ident)} does not exist (never committed, or vacuumed)")
    GraftSqlTable(qualified(ident), vt, pinnedVersion = Some(v))
  }

  /** `TIMESTAMP AS OF ts` — Spark hands micros since epoch. */
  override def loadTable(ident: Identifier, timestamp: Long): Table = {
    if (!tableExists(ident)) throw new NoSuchTableException(ident)
    val vt = open(ident)
    GraftSqlTable(qualified(ident), vt,
      pinnedVersion = Some(vt.versionAsOf(timestamp / 1000L)))
  }

  override def createTable(ident: Identifier, schema: StructType,
      partitions: Array[Transform], properties: JMap[String, String]): Table = {
    if (tableExists(ident)) throw new TableAlreadyExistsException(ident)
    if (partitions.nonEmpty) throw new UnsupportedOperationException(
      s"${qualified(ident)}: PARTITIONED BY is not supported through the SQL " +
        "catalog — write partitioned versioned tables with " +
        "graft.ecom.Lakehouse's partitioned sink")
    if (!fs.exists(nsPath(ident.namespace)))
      throw new NoSuchNamespaceException(ident.namespace)
    val vt = open(ident)
    // v1 is an empty commit carrying the schema — the same "schema
    // round-trips through an empty table" contract the library pins
    vt.commitOverwrite(spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema))
    // TBLPROPERTIES land as versioned metadata commits after the schema
    // commit; Spark's catalog-managed keys (provider/location/owner/...)
    // are not table properties and are filtered, not stored
    properties.asScala.toSeq.sortBy(_._1)
      .filterNot { case (k, _) =>
        GraftCatalog.ReservedProps(k) || k.startsWith("option.") }
      .foreach { case (k, v) => vt.setTableProperty(k, v) }
    GraftSqlTable(qualified(ident), vt, pinnedVersion = None)
  }

  /** `CREATE TABLE ... (x GENERATED ALWAYS AS (expr))` — the Column[]
    * entry (the StructType overload above cannot see generation
    * expressions). The table lands with the plain schema, then each
    * generation expression becomes the library's versioned
    * generated-column metadata op, so later writers get the same
    * populate-or-verify semantics qv09 pins. Identity columns and
    * DEFAULT values refuse rather than approximating.
    */
  override def createTable(ident: Identifier,
      columns: Array[org.apache.spark.sql.connector.catalog.Column],
      partitions: Array[Transform], properties: JMap[String, String]): Table = {
    columns.foreach { c =>
      if (c.identityColumnSpec() != null) throw new UnsupportedOperationException(
        s"${qualified(ident)}: IDENTITY columns are not supported — use a " +
          "generated column over a deterministic expression, or assign ids " +
          "in the writing pipeline")
      if (c.defaultValue() != null) throw new UnsupportedOperationException(
        s"${qualified(ident)}: column DEFAULT values are not supported")
    }
    val schema = StructType(columns.map(c =>
      org.apache.spark.sql.types.StructField(c.name(), c.dataType(), c.nullable())))
    val table = createTable(ident, schema, partitions, properties)
    val gens = columns.toSeq
      .filter(c => c.generationExpression() != null && c.generationExpression().nonEmpty)
    if (gens.isEmpty) table
    else {
      val vt = open(ident)
      gens.foreach(c => vt.addGeneratedColumn(c.name(), c.generationExpression()))
      loadTable(ident)
    }
  }

  /** Schema DDL routed to the library's column ops: ADD COLUMN is an
    * additive-evolution empty append (old rows null-fill, the schema
    * contract's normal path), RENAME/DROP COLUMN are the column-mapping
    * metadata-only commits (physical names never change, so no data
    * rewrites — Delta's column-mapping semantics). Anything else
    * refuses rather than approximating.
    */
  override def alterTable(ident: Identifier, changes: TableChange*): Table = {
    if (!tableExists(ident)) throw new NoSuchTableException(ident)
    val vt = open(ident)
    changes.foreach {
      case add: TableChange.AddColumn =>
        require(add.fieldNames.length == 1,
          s"${qualified(ident)}: nested ADD COLUMN is not supported")
        // refuse rather than approximate: an added column null-fills
        // existing rows, so NOT NULL cannot be honored; column order is
        // append-only under additive evolution, so FIRST/AFTER cannot be
        if (!add.isNullable)
          throw new UnsupportedOperationException(
            s"ALTER TABLE ${qualified(ident)}: ADD COLUMN " +
              s"${add.fieldNames()(0)} NOT NULL is not supported — existing " +
              "rows null-fill the new column; add it nullable, backfill, " +
              "then declare a CHECK constraint")
        if (add.position() != null)
          throw new UnsupportedOperationException(
            s"ALTER TABLE ${qualified(ident)}: ADD COLUMN with FIRST/AFTER " +
              "is not supported — additive evolution appends columns")
        val cur = vt.snapshotMeta(vt.currentVersion().getOrElse(
          throw new IllegalArgumentException(
            s"${qualified(ident)} has no committed version"))).schema
        val evolved = cur.add(add.fieldNames()(0), add.dataType, nullable = true)
        vt.commitAppend(spark.createDataFrame(
          spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], evolved))
      case ren: TableChange.RenameColumn =>
        require(ren.fieldNames.length == 1,
          s"${qualified(ident)}: nested RENAME COLUMN is not supported")
        vt.renameColumn(ren.fieldNames()(0), ren.newName())
      case del: TableChange.DeleteColumn =>
        require(del.fieldNames.length == 1,
          s"${qualified(ident)}: nested DROP COLUMN is not supported")
        vt.dropColumn(del.fieldNames()(0))
      // ALTER TABLE ... ADD CONSTRAINT <name> CHECK (<expr>) — routed to
      // the library's versioned constraint metadata op: existing rows
      // validate immediately, later writers enforce per commit (qv09's
      // machinery). Non-CHECK constraint classes (PK/FK/UNIQUE) refuse:
      // this engine will not record what it cannot enforce.
      case add: TableChange.AddConstraint =>
        add.constraint() match {
          case c: org.apache.spark.sql.connector.catalog.constraints.Check =>
            vt.addCheckConstraint(c.name(), c.predicateSql())
          case other => throw new UnsupportedOperationException(
            s"ALTER TABLE ${qualified(ident)}: only CHECK constraints are " +
              s"supported (got ${other.getClass.getSimpleName}) — PRIMARY " +
              "KEY/FOREIGN KEY/UNIQUE are not enforced by this engine and " +
              "are refused rather than recorded as unenforced metadata")
        }
      case drop: TableChange.DropConstraint =>
        try vt.dropCheckConstraint(drop.name())
        catch {
          case _: IllegalArgumentException if drop.ifExists() => ()
        }
      // ALTER TABLE ... SET/UNSET TBLPROPERTIES — versioned metadata
      // commits (the library validates known keys, e.g. the change-feed
      // toggle). The catalog-managed reserved keys are not properties.
      case set: TableChange.SetProperty =>
        if (GraftCatalog.ReservedProps(set.property()))
          throw new UnsupportedOperationException(
            s"ALTER TABLE ${qualified(ident)}: '${set.property()}' is " +
              "catalog-managed and cannot be set as a table property")
        vt.setTableProperty(set.property(), set.value())
      case rm: TableChange.RemoveProperty =>
        if (GraftCatalog.ReservedProps(rm.property()))
          throw new UnsupportedOperationException(
            s"ALTER TABLE ${qualified(ident)}: '${rm.property()}' is " +
              "catalog-managed and cannot be unset")
        vt.unsetTableProperty(rm.property())
      case other => throw new UnsupportedOperationException(
        s"ALTER TABLE ${qualified(ident)}: unsupported change $other — " +
          "supported: ADD COLUMN, RENAME COLUMN, DROP COLUMN, " +
          "ADD/DROP CONSTRAINT (CHECK), SET/UNSET TBLPROPERTIES")
    }
    loadTable(ident)
  }

  override def dropTable(ident: Identifier): Boolean = {
    val p = tablePath(ident)
    isTable(p) && fs.delete(p, true)
  }

  override def renameTable(from: Identifier, to: Identifier): Unit = {
    if (!tableExists(from)) throw new NoSuchTableException(from)
    if (tableExists(to)) throw new TableAlreadyExistsException(to)
    if (!fs.exists(nsPath(to.namespace)))
      throw new NoSuchNamespaceException(to.namespace)
    if (!fs.rename(tablePath(from), tablePath(to)))
      throw new IllegalStateException(
        s"could not rename ${qualified(from)} to ${qualified(to)}")
  }

  // ---- maintenance procedures (Iceberg's CALL shape) ------------------
  //   CALL graft.system.vacuum(table => 'ns.t', keep_versions => 3)
  //   CALL graft.system.optimize(table => 'ns.t')
  //   CALL graft.system.zorder(table => 'ns.t', columns => 'a,b')
  //   CALL graft.system.restore(table => 'ns.t', version => 4)
  // The SQL face of the table-maintenance surface: at 100 TB these run
  // from a scheduler exactly like Delta's OPTIMIZE/VACUUM SQL.

  /** One self-binding maintenance procedure (no overloads, so bind is
    * identity; `call` mutates and streams back no rows).
    */
  private final class Proc(pname: String, desc: String,
      params: Array[ProcedureParameter])(body: InternalRow => Unit)
      extends UnboundProcedure with BoundProcedure {
    override def name(): String = pname
    override def description(): String = desc
    override def bind(inputType: StructType): BoundProcedure = this
    override def parameters(): Array[ProcedureParameter] = params
    override def isDeterministic: Boolean = false
    override def call(input: InternalRow): java.util.Iterator[Scan] = {
      body(input)
      java.util.Collections.emptyIterator[Scan]()
    }
  }

  /** Parse a procedure's `ns.table` string argument with the SESSION
    * parser, not `split('.')`: backquoted parts containing dots survive,
    * and a single-part name refuses with a clear message instead of an
    * empty-namespace lookup's confusing NoSuchNamespaceException.
    */
  private def identArg(name: String, what: String): Identifier = {
    val parts = spark.sessionState.sqlParser.parseMultipartIdentifier(name)
    require(parts.length >= 2,
      s"$what '$name' must be namespace-qualified (ns.table) — it " +
        "resolves inside this catalog's warehouse")
    Identifier.of(parts.init.toArray, parts.last)
  }

  private def tableArg(input: InternalRow): VersionedTable = {
    val ident = identArg(input.getUTF8String(0).toString, "procedure table argument")
    if (!tableExists(ident)) throw new NoSuchTableException(ident)
    open(ident)
  }

  private def in(name: String, t: org.apache.spark.sql.types.DataType) =
    ProcedureParameter.in(name, t).build()
  private def inDefault(name: String, t: org.apache.spark.sql.types.DataType,
      default: String) =
    ProcedureParameter.in(name, t).defaultValue(default).build()

  override def listProcedures(namespace: Array[String]): Array[Identifier] =
    if (namespace.sameElements(Array("system")))
      Array("vacuum", "optimize", "optimize_range", "zorder", "restore",
        "clone", "create_mv", "refresh_mv", "create_ivf_index",
        "create_cluster_index")
        .map(Identifier.of(Array("system"), _))
    else Array.empty

  /** Resolve a `ns.t` argument to the table's directory path, the form
    * [[graft.ops.MvSpec]] stores (catalog-name-independent).
    */
  private def resolveDir(name: String): String = {
    val ident = identArg(name, "procedure table argument")
    if (!tableExists(ident)) throw new NoSuchTableException(ident)
    tablePath(ident).toString
  }

  override def loadProcedure(ident: Identifier): UnboundProcedure = {
    require(ident.namespace.sameElements(Array("system")),
      s"procedures live in the 'system' namespace, got ${ident.namespace.mkString(".")}")
    ident.name match {
      case "vacuum" => new Proc("vacuum",
        "drop all but the newest keep_versions versions + unreferenced files",
        Array(in("table", StringType), inDefault("keep_versions", IntegerType, "1")))(
        input => tableArg(input).vacuum(keepVersions = input.getInt(1)))
      case "optimize" => new Proc("optimize",
        "bin-pack small files into target-size files",
        Array(in("table", StringType)))(
        input => { tableArg(input).optimize(): Unit })
      case "optimize_range" => new Proc("optimize_range",
        "bin-pack small files whose stats intersect [lo, hi] on column " +
          "(OPTIMIZE ... WHERE — compact the hot region, cold files untouched)",
        Array(in("table", StringType), in("column", StringType),
          in("lo", LongType), in("hi", LongType)))(
        input => {
          tableArg(input).optimizeRange(input.getUTF8String(1).toString,
            input.getLong(2), input.getLong(3)): Unit
        })
      case "zorder" => new Proc("zorder",
        "rewrite the table z-order-clustered on the given comma-separated columns",
        Array(in("table", StringType), in("columns", StringType)))(
        input => {
          val cols = input.getUTF8String(1).toString.split(',').map(_.trim).toSeq
          tableArg(input).optimizeZOrder(cols): Unit
        })
      case "restore" => new Proc("restore",
        "make the head a zero-copy replay of the given version",
        Array(in("table", StringType), in("version", LongType)))(
        input => { tableArg(input).restore(input.getLong(1)): Unit })
      case "clone" => new Proc("clone",
        "clone a snapshot of table (default: the head; version >= 0 " +
          "pins one) as the INDEPENDENT new table `target` — data files " +
          "hard-link where the filesystem supports it; properties/" +
          "constraints/generated rules carry, txn markers do not",
        Array(in("table", StringType), in("target", StringType),
          inDefault("version", LongType, "-1")))(
        input => {
          val src = tableArg(input)
          val tIdent = identArg(input.getUTF8String(1).toString,
            "system.clone target")
          if (tableExists(tIdent))
            throw new TableAlreadyExistsException(tIdent)
          // the namespace must already exist (CREATE TABLE's rule);
          // the clone itself creates the table directory
          if (!namespaceExists(tIdent.namespace))
            throw new NoSuchNamespaceException(tIdent.namespace)
          src.cloneTo(tablePath(tIdent).toString, input.getLong(2)): Unit
        })
      case "create_mv" => new Proc("create_mv",
        "create a DURABLE materialized view: persist the maintainable " +
          "definition (source, keys, count_col, row-local sums/mins/maxes, " +
          "net_keys) in the view's table properties (one atomic metadata " +
          "commit) and run the bootstrap refresh. Idempotent for an " +
          "identical definition; a DIFFERENT definition for an existing " +
          "view refuses (drop the view first). After creation, " +
          "refresh_mv(view => ...) maintains it from the stored spec",
        Array(in("view", StringType), in("source", StringType),
          in("keys", StringType), in("count_col", StringType),
          inDefault("sums", StringType, "''"),
          inDefault("mins", StringType, "''"),
          inDefault("maxes", StringType, "''"),
          inDefault("net_keys", StringType, "''")))(
        input => {
          def str(i: Int): String =
            if (input.isNullAt(i)) "" else input.getUTF8String(i).toString
          val ident = identArg(str(0), "create_mv view")
          if (!fs.exists(nsPath(ident.namespace)))
            throw new NoSuchNamespaceException(ident.namespace)
          val spec = graft.ops.MvSpec.fromArgs(resolveDir(str(1)), str(2),
            str(3), str(4), str(5), str(6), str(7))
          graft.ops.MvSpec.ensure(spark, open(ident), spec, qualified(ident))
        })
      case "refresh_mv" => new Proc("refresh_mv",
        "incrementally refresh a materialized view from its STORED " +
          "definition (create_mv) — bootstraps on first call, then reads " +
          "only the change-feed window; exactly-once via the view's txn " +
          "marker. Passing the definition inline is allowed only for a " +
          "view with no stored spec (ad-hoc mode); if a stored spec " +
          "exists, an inline definition must MATCH it or the call refuses " +
          "(re-typed algebra per call is exactly the drift create_mv " +
          "exists to remove)",
        Array(in("view", StringType),
          inDefault("source", StringType, "''"),
          inDefault("keys", StringType, "''"),
          inDefault("count_col", StringType, "''"),
          inDefault("sums", StringType, "''"),
          inDefault("mins", StringType, "''"),
          inDefault("maxes", StringType, "''"),
          inDefault("net_keys", StringType, "''")))(
        input => {
          def str(i: Int): String =
            if (input.isNullAt(i)) "" else input.getUTF8String(i).toString
          val ident = identArg(str(0), "refresh_mv view")
          if (!tableExists(ident)) throw new NoSuchTableException(ident)
          val view = open(ident)
          val stored = graft.ops.MvSpec.load(view)
          val inline =
            if (str(1).isEmpty && str(2).isEmpty && str(3).isEmpty) None
            else Some(graft.ops.MvSpec.fromArgs(resolveDir(str(1)), str(2),
              str(3), str(4), str(5), str(6), str(7)))
          val spec = (stored, inline) match {
            case (Some(st), Some(in)) =>
              require(st.props == in.props,
                s"${qualified(ident)}: the inline definition DIFFERS from " +
                  "the view's stored spec — refresh_mv never applies a " +
                  "definition other than the one the view was created " +
                  "with. Call refresh_mv(view => ...) bare, or drop and " +
                  s"re-create the view.\n  stored:  ${st.props}" +
                  s"\n  offered: ${in.props}")
              st
            case (Some(st), None) => st
            case (None, Some(in)) => in // ad-hoc mode (no durable spec)
            case (None, None) => throw new IllegalArgumentException(
              s"${qualified(ident)} carries no stored materialized-view " +
                "definition — create it with CALL graft.system.create_mv(" +
                "view => ..., source => ..., keys => ..., count_col => " +
                "...), or pass the full definition inline for an ad-hoc " +
                "refresh")
          }
          spec.refresh(spark, view): Unit
        })
      case "create_ivf_index" => new Proc("create_ivf_index",
        "build the persisted IVF ANN index artifact — centroids parquet " +
          "plus cell-partitioned inverted lists — from the embeddings " +
          "corpus under corpus_dir (the qs10 build); probe it from pure " +
          "SQL with SELECT * FROM graft_ivf_topk('<artifact_dir>')",
        Array(in("corpus_dir", StringType), in("artifact_dir", StringType)))(
        input => graft.queries.LlmSimilarity.writeIvfIndex(spark,
          input.getUTF8String(0).toString, input.getUTF8String(1).toString))
      case "create_cluster_index" => new Proc("create_cluster_index",
        "run duplicate-cluster detection ONCE over the documents corpus " +
          "under corpus_dir and persist the (doc_id, cluster_id) labels " +
          "(the qd24 build); consume from pure SQL with SELECT * FROM " +
          "graft_cluster_index('<artifact_dir>')",
        Array(in("corpus_dir", StringType), in("artifact_dir", StringType)))(
        input => graft.queries.LlmDedup.writeClusterIndex(spark,
          input.getUTF8String(0).toString, input.getUTF8String(1).toString))
      case other => throw new IllegalArgumentException(
        s"unknown procedure $other — known: vacuum, optimize, " +
          "optimize_range, zorder, restore, refresh_mv, create_mv, " +
          "clone, create_ivf_index, create_cluster_index")
    }
  }

  // ---- namespaces -----------------------------------------------------

  override def listNamespaces(): Array[Array[String]] = {
    val root = new Path(warehouse)
    if (!fs.exists(root)) Array.empty
    else fs.listStatus(root).filter(_.isDirectory).map(_.getPath)
      .filterNot(isTable).filterNot(isView).map(d => Array(d.getName))
  }

  override def listNamespaces(namespace: Array[String]): Array[Array[String]] =
    if (namespace.isEmpty) listNamespaces()
    else {
      if (!namespaceExists(namespace)) throw new NoSuchNamespaceException(namespace)
      fs.listStatus(nsPath(namespace)).filter(_.isDirectory).map(_.getPath)
        .filterNot(isTable).filterNot(isView).map(d => namespace :+ d.getName)
    }

  override def namespaceExists(namespace: Array[String]): Boolean = {
    val p = nsPath(namespace)
    fs.exists(p) && !isTable(p) && !isView(p)
  }

  override def loadNamespaceMetadata(namespace: Array[String]): JMap[String, String] = {
    if (!namespaceExists(namespace)) throw new NoSuchNamespaceException(namespace)
    Map("location" -> nsPath(namespace).toString).asJava
  }

  override def createNamespace(namespace: Array[String],
      metadata: JMap[String, String]): Unit = {
    if (namespaceExists(namespace))
      throw new org.apache.spark.sql.catalyst.analysis.NamespaceAlreadyExistsException(namespace)
    fs.mkdirs(nsPath(namespace))
  }

  override def alterNamespace(namespace: Array[String],
      changes: NamespaceChange*): Unit =
    throw new UnsupportedOperationException("ALTER NAMESPACE is not supported")

  override def dropNamespace(namespace: Array[String], cascade: Boolean): Boolean = {
    if (!namespaceExists(namespace)) return false
    if (!cascade && fs.listStatus(nsPath(namespace)).nonEmpty)
      throw new IllegalStateException(
        s"namespace ${namespace.mkString(".")} is not empty (use CASCADE)")
    fs.delete(nsPath(namespace), true)
  }
}

object GraftCatalog {
  /** Catalog-managed keys Spark passes through `properties` maps that
    * are NOT user table properties: stored nowhere, refused on ALTER.
    */
  val ReservedProps: Set[String] = Set(
    TableCatalog.PROP_PROVIDER, TableCatalog.PROP_LOCATION,
    TableCatalog.PROP_OWNER, TableCatalog.PROP_EXTERNAL,
    TableCatalog.PROP_IS_MANAGED_LOCATION, TableCatalog.PROP_COMMENT)
}
