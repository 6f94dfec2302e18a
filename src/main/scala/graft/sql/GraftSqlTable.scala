package graft.sql

import java.util.{Set => JSet}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.connector.catalog.{SupportsDelete, SupportsRead, SupportsWrite, Table, TableCapability, TruncatableTable}
import org.apache.spark.sql.connector.read.ScanBuilder
import org.apache.spark.sql.connector.write.{LogicalWriteInfo, SupportsTruncate, V1Write, Write, WriteBuilder}
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.functions.{col, lit, not}
import org.apache.spark.sql.sources
import org.apache.spark.sql.sources.{Filter, InsertableRelation}
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.ecom.VersionedTable

/** A [[VersionedTable]] surfaced through the DataSource V2 catalog API
  * — the unit [[GraftCatalog]] hands to Spark's analyzer so plain SQL
  * (`SELECT ... FROM graft.gold.t`, `VERSION AS OF`, `INSERT INTO`)
  * addresses the ACID format by name.
  *
  * Read path: Delta's architecture, not a bespoke DSv2 reader —
  * [[GraftRelationRule]] (injected by `GraftExtensions`) replaces the
  * analyzer's `DataSourceV2Relation` over this table with the library's
  * own V1 relation ([[v1Plan]]), so every read feature the library
  * implements (deletion-vector anti-joins, column mapping, additive
  * schema evolution, stats/bloom file skipping via [[GraftFileIndex]])
  * is available from SQL with zero duplicated logic, and Catalyst's
  * parquet pushdown/pruning applies unchanged. `newScanBuilder` exists
  * only to declare BATCH_READ; if it is ever invoked the extensions are
  * not installed, and it says so.
  *
  * Write path: Spark's V1 write fallback (`V1_BATCH_WRITE`) routes
  * `INSERT INTO` / `INSERT OVERWRITE` / `df.writeTo(...).append()`
  * through [[VersionedTable.commitAppend]]/`commitOverwrite` — the same
  * CAS-published atomic commits, schema contract included, as the
  * library API. Time-travel-pinned tables refuse writes.
  */
final case class GraftSqlTable(
    qualifiedName: String,
    vt: VersionedTable,
    pinnedVersion: Option[Long],
    // a change-data-feed read window [start, end] (end < 0 = head):
    // the handle presents the FEED schema (table columns +
    // _change_type/_commit_version/_commit_timestamp) and
    // GraftRelationRule converts reads to VersionedTable.changeFeed;
    // writes through a feed handle refuse (a feed is a read surface)
    cdfWindow: Option[(Long, Long)] = None)
    extends Table with SupportsRead with SupportsWrite
    with SupportsDelete with TruncatableTable {

  /** The version a read of this handle resolves (head if not pinned). */
  def resolvedVersion: Long = pinnedVersion.getOrElse(
    vt.currentVersion().getOrElse(throw new IllegalArgumentException(
      s"$qualifiedName (${vt.tableDir}) has no committed version")))

  override def name(): String = qualifiedName

  // resolved once per handle: the analyzer calls schema() repeatedly,
  // and each snapshotMeta is a manifest read; a handle is short-lived
  // (one statement), so caching cannot serve a stale snapshot to a
  // later statement — each loadTable returns a fresh handle.
  // A never-committed table presents an EMPTY schema instead of
  // throwing: DataStreamWriter infers the schema of a sink DESTINATION
  // before falling back to the V1 sink (which will create the table on
  // first batch); reads still fail clearly at resolvedVersion.
  private lazy val resolvedSchema: StructType = cdfWindow match {
    case Some((_, end)) =>
      // the feed presents the END version's schema (changeFeed validates
      // the window's evolution is additive) plus the three change columns
      val endV =
        if (end >= 0) end
        else vt.currentVersion().getOrElse(throw new IllegalArgumentException(
          s"$qualifiedName (${vt.tableDir}) has no committed version"))
      StructType(vt.snapshotMeta(endV).schema.fields ++ Seq(
        org.apache.spark.sql.types.StructField(
          VersionedTable.CdcTypeCol, org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField(
          VersionedTable.CdcVersionCol, org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField(
          VersionedTable.CdcTimestampCol, org.apache.spark.sql.types.TimestampType)))
    case None =>
      pinnedVersion.orElse(vt.currentVersion()) match {
        case Some(v) =>
          val stored = vt.snapshotMeta(v).schema
          mvReadSpec.fold(stored) { spec =>
            // derive the projected schema (incl. the ratio's type) from
            // the same readFace expression the plan conversion applies —
            // an empty local frame, zero jobs
            spec.readFace(vt.spark.createDataFrame(
              java.util.Collections.emptyList[org.apache.spark.sql.Row](),
              stored)).schema
          }
        case None => StructType(Nil)
      }
  }

  /** The AVG read-face spec, when this table is a materialized view
    * whose definition decomposed AVG into hidden sum/count carriers:
    * plain reads present the RATIO and hide the carriers
    * ([[graft.ops.MvSpec.readFace]]). The change-feed handle is exempt
    * — a cascade consumes the STORED columns (sums re-aggregate;
    * ratios don't).
    */
  private lazy val mvReadSpec: Option[graft.ops.MvSpec] =
    if (cdfWindow.isDefined) None
    else graft.ops.MvSpec.load(vt).filter(_.avgs.nonEmpty)

  override def schema(): StructType = resolvedSchema

  override def capabilities(): JSet[TableCapability] =
    Set(TableCapability.BATCH_READ, TableCapability.V1_BATCH_WRITE,
      TableCapability.TRUNCATE).asJava

  // user TBLPROPERTIES first so the reserved keys below always win —
  // SHOW TBLPROPERTIES surfaces the versioned table's own metadata
  override def properties(): java.util.Map[String, String] =
    (vt.tableProperties() ++
      Map("location" -> vt.tableDir, "provider" -> "graft")).asJava

  /** Schema-only scan: SELECT paths never reach here (the relation
    * rule replaces them during analysis), but DELETE FROM planning
    * builds a scan it pattern-matches WITHOUT executing — so building
    * must succeed, and only an actual batch read (extensions missing)
    * raises the instructive error.
    */
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): org.apache.spark.sql.connector.read.Scan =
        new org.apache.spark.sql.connector.read.Scan {
          override def readSchema(): StructType = schema()
          override def description(): String = qualifiedName
          override def toBatch: org.apache.spark.sql.connector.read.Batch =
            throw new IllegalStateException(
              s"reading $qualifiedName requires graft's session extensions — " +
                "start the session with spark.sql.extensions=" +
                "graft.functions.GraftExtensions (GraftRelationRule converts " +
                "this table to its snapshot plan)")
        }
    }

  /** The snapshot's logical plan, V1-style. Plain snapshots get ONE
    * parquet relation over a [[GraftFileIndex]] (manifest stats/bloom
    * skipping fires on the query's own WHERE clause); snapshots with
    * DVs / column mapping / partition dirs reuse the composed
    * [[VersionedTable.readAt]] plan — correct for every feature, at the
    * cost of skipping.
    */
  def v1Plan(spark: SparkSession, version: Long): LogicalPlan = {
    val meta = vt.snapshotMeta(version)
    val raw =
      if (meta.plainScan) {
        val index = new GraftFileIndex(spark, vt, meta)
        LogicalRelation(
          HadoopFsRelation(index, partitionSchema = StructType(Nil),
            // asNullable: the vectorized reader refuses a REQUIRED column
            // missing from a file footer — additively-evolved old commits
            // lack the new columns by construction
            dataSchema = org.apache.spark.sql.graft.shims.asNullable(meta.schema),
            bucketSpec = None,
            fileFormat = new ParquetFileFormat, options = Map.empty)(spark))
      } else vt.readAt(version).queryExecution.analyzed
    // the MV AVG read face — a row-local Project on top of the scan:
    // column pruning and visible-column filters still push through it
    mvReadSpec.fold(raw)(spec =>
      spec.readFace(org.apache.spark.sql.graft.shims.dataFrame(spark, raw))
        .queryExecution.analyzed)
  }

  // ---- DELETE FROM / TRUNCATE TABLE -----------------------------------

  /** Translate a V1 data-source filter back to a Column for the
    * library's copy-on-write delete. None = shape we cannot express —
    * `canDeleteWhere` then refuses and Spark reports the unsupported
    * predicate instead of deleting the wrong rows.
    */
  private def toColumn(f: Filter): Option[Column] = f match {
    case sources.EqualTo(a, v) => Some(col(a) === lit(v))
    case sources.EqualNullSafe(a, v) => Some(col(a) <=> lit(v))
    case sources.GreaterThan(a, v) => Some(col(a) > lit(v))
    case sources.GreaterThanOrEqual(a, v) => Some(col(a) >= lit(v))
    case sources.LessThan(a, v) => Some(col(a) < lit(v))
    case sources.LessThanOrEqual(a, v) => Some(col(a) <= lit(v))
    case sources.In(a, vs) => Some(col(a).isin(vs.toIndexedSeq: _*))
    case sources.IsNull(a) => Some(col(a).isNull)
    case sources.IsNotNull(a) => Some(col(a).isNotNull)
    case sources.StringStartsWith(a, v) => Some(col(a).startsWith(v))
    case sources.StringEndsWith(a, v) => Some(col(a).endsWith(v))
    case sources.StringContains(a, v) => Some(col(a).contains(v))
    case sources.And(l, r) => for (lc <- toColumn(l); rc <- toColumn(r)) yield lc && rc
    case sources.Or(l, r) => for (lc <- toColumn(l); rc <- toColumn(r)) yield lc || rc
    case sources.Not(c) => toColumn(c).map(not)
    case _: sources.AlwaysTrue => Some(lit(true))
    case _: sources.AlwaysFalse => Some(lit(false))
    case _ => None
  }

  private def refuseTimeTravelWrite(op: String): Unit = {
    pinnedVersion.foreach(v => throw new IllegalArgumentException(
      s"cannot $op $qualifiedName VERSION AS OF $v — time travel is read-only"))
    cdfWindow.foreach(_ => throw new IllegalArgumentException(
      s"cannot $op $qualifiedName through a change-data-feed read handle — " +
        "the feed is a read surface; write through the table itself"))
  }

  override def canDeleteWhere(filters: Array[Filter]): Boolean =
    filters.forall(f => toColumn(f).isDefined)

  /** `DELETE FROM t WHERE ...` — the library's copy-on-write delete:
    * one atomic version, untouched files carried forward, history
    * intact (the pre-delete snapshot stays one VERSION AS OF away).
    */
  override def deleteWhere(filters: Array[Filter]): Unit = {
    refuseTimeTravelWrite("DELETE FROM")
    val pred = filters.foldLeft(lit(true))((acc, f) => acc && toColumn(f).getOrElse(
      throw new UnsupportedOperationException(
        s"DELETE FROM $qualifiedName: unsupported predicate $f")))
    vt.delete(pred): Unit
  }

  /** `TRUNCATE TABLE t` — an empty overwrite commit: schema survives,
    * history survives (truncation is as undoable as any other version).
    */
  override def truncateTable(): Boolean = {
    refuseTimeTravelWrite("TRUNCATE")
    val spark = vt.spark
    // the STORED schema, not the read face: truncating an AVG-bearing
    // materialized view must keep its hidden decomposition columns
    val stored = vt.currentVersion()
      .map(v => vt.snapshotMeta(v).schema).getOrElse(schema())
    vt.commitOverwrite(spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], stored))
    true
  }

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder = {
    refuseTimeTravelWrite("write to")
    new WriteBuilder with SupportsTruncate {
      private var overwrite = false
      override def truncate(): WriteBuilder = { overwrite = true; this }
      override def build(): Write = new V1Write {
        override def toInsertableRelation: InsertableRelation =
          new InsertableRelation {
            override def insert(data: DataFrame, ignored: Boolean): Unit =
              if (overwrite) vt.commitOverwrite(data) else vt.commitAppend(data)
          }
      }
    }
  }
}
