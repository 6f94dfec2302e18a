package graft.sql

import java.util.{Set => JSet}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.connector.catalog.{SupportsRead, SupportsWrite, Table, TableCapability}
import org.apache.spark.sql.connector.read.ScanBuilder
import org.apache.spark.sql.connector.write.{LogicalWriteInfo, SupportsTruncate, V1Write, Write, WriteBuilder}
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.sources.InsertableRelation
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
    pinnedVersion: Option[Long]) extends Table with SupportsRead with SupportsWrite {

  /** The version a read of this handle resolves (head if not pinned). */
  def resolvedVersion: Long = pinnedVersion.getOrElse(
    vt.currentVersion().getOrElse(throw new IllegalArgumentException(
      s"$qualifiedName (${vt.tableDir}) has no committed version")))

  override def name(): String = qualifiedName

  override def schema(): StructType = vt.snapshotMeta(resolvedVersion).schema

  override def capabilities(): JSet[TableCapability] =
    Set(TableCapability.BATCH_READ, TableCapability.V1_BATCH_WRITE,
      TableCapability.TRUNCATE).asJava

  override def properties(): java.util.Map[String, String] =
    Map("location" -> vt.tableDir, "provider" -> "graft").asJava

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    throw new IllegalStateException(
      s"reading $qualifiedName requires graft's session extensions — start the " +
        "session with spark.sql.extensions=graft.functions.GraftExtensions " +
        "(GraftRelationRule converts this table to its snapshot plan)")

  /** The snapshot's logical plan, V1-style. Plain snapshots get ONE
    * parquet relation over a [[GraftFileIndex]] (manifest stats/bloom
    * skipping fires on the query's own WHERE clause); snapshots with
    * DVs / column mapping / partition dirs reuse the composed
    * [[VersionedTable.readAt]] plan — correct for every feature, at the
    * cost of skipping.
    */
  def v1Plan(spark: SparkSession, version: Long): LogicalPlan = {
    val meta = vt.snapshotMeta(version)
    if (meta.plainScan) {
      val index = new GraftFileIndex(spark, vt, meta)
      LogicalRelation(
        HadoopFsRelation(index, partitionSchema = StructType(Nil),
          dataSchema = meta.schema, bucketSpec = None,
          fileFormat = new ParquetFileFormat, options = Map.empty)(spark))
    } else vt.readAt(version).queryExecution.analyzed
  }

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder = {
    pinnedVersion.foreach(v => throw new IllegalArgumentException(
      s"cannot write to $qualifiedName VERSION AS OF $v — time travel is read-only"))
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
