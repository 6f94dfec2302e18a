package graft.sql

import java.util.{Map => JMap}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.connector.catalog.{Table, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.ecom.VersionedTable

/** Path-based [[TableProvider]] for versioned tables — the
  * `spark.read.format("graft").load(dir)` entry (Delta's
  * `format("delta")` shape), registered under the short name `graft`
  * via DataSourceRegister. Supports the same time-travel read options
  * as the catalog ([[GraftRelationRule]] applies them):
  *
  * {{{
  * spark.read.format("graft").load("/data/t")                          // head
  * spark.read.format("graft").option("versionAsOf", 3).load("/data/t")
  * spark.read.format("graft").option("timestampAsOf", "2024-03-01 00:00:00").load("/data/t")
  * }}}
  */
class GraftDataSource extends TableProvider with DataSourceRegister {

  override def shortName(): String = "graft"

  // schema comes from the manifest, never from user metadata
  override def supportsExternalMetadata(): Boolean = false

  private def open(options: CaseInsensitiveStringMap): GraftSqlTable = {
    val path = Option(options.get("path")).getOrElse(
      throw new IllegalArgumentException(
        "format(\"graft\") requires a path: spark.read.format(\"graft\").load(dir)"))
    GraftSqlTable(path, VersionedTable(SparkSession.active, path),
      pinnedVersion = None)
  }

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    open(options).schema()

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: JMap[String, String]): Table =
    open(new CaseInsensitiveStringMap(properties))
}
