package graft.sql

import java.util.{Map => JMap}

import org.apache.spark.sql.{DataFrame, SparkSession, SQLContext}
import org.apache.spark.sql.connector.catalog.{Table, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.execution.streaming.{Sink, Source}
import org.apache.spark.sql.sources.{DataSourceRegister, StreamSinkProvider, StreamSourceProvider}
import org.apache.spark.sql.streaming.OutputMode
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
class GraftDataSource extends TableProvider with DataSourceRegister
    with StreamSourceProvider with StreamSinkProvider {

  override def shortName(): String = "graft"

  // schema comes from the manifest, never from user metadata
  override def supportsExternalMetadata(): Boolean = false

  private def open(options: CaseInsensitiveStringMap): GraftSqlTable = {
    val path = Option(options.get("path")).getOrElse(
      throw new IllegalArgumentException(
        "format(\"graft\") requires a path: spark.read.format(\"graft\").load(dir)"))
    val vt = VersionedTable(SparkSession.active, path)
    // pin the version HERE (not only in the relation rule) so the
    // table handle's schema is the requested snapshot's schema — an
    // additively evolved table read at an old version must present the
    // OLD column set, exactly as the catalog's loadTable overloads do.
    // Specifying both travel options is refused rather than silently
    // picking one (the same contract the catalog path gets from Spark).
    val optV = Option(options.get("versionAsOf"))
    val optTs = Option(options.get("timestampAsOf"))
    if (optV.isDefined && optTs.isDefined)
      throw new IllegalArgumentException(
        s"format(\"graft\").load($path): cannot specify both versionAsOf " +
          "and timestampAsOf — pick one")
    def numeric(name: String, s: String): Long =
      try s.toLong catch {
        case _: NumberFormatException => throw new IllegalArgumentException(
          s"$path: $name must be numeric, got '$s'")
      }
    // Delta's readChangeFeed read: option("readChangeFeed", "true") +
    // startingVersion [+ endingVersion] serves row-level changes
    // (VersionedTable.changeFeed) instead of a snapshot
    if (Option(options.get("readChangeFeed")).exists(_.equalsIgnoreCase("true"))) {
      require(optV.isEmpty && optTs.isEmpty,
        s"$path: readChangeFeed cannot combine with versionAsOf/timestampAsOf " +
          "— the feed window is [startingVersion, endingVersion]")
      Seq("startingTimestamp", "endingTimestamp").foreach(k =>
        if (options.get(k) != null) throw new UnsupportedOperationException(
          s"$path: $k is not supported — bound the change feed with " +
            "startingVersion/endingVersion (graft_history maps timestamps " +
            "to versions)"))
      // default = the whole history (v1 on) — also what DataStreamReader's
      // schema-inference pass hits before createSource applies its own
      val start = Option(options.get("startingVersion"))
        .map(numeric("startingVersion", _)).getOrElse(1L)
      val end = Option(options.get("endingVersion"))
        .map(numeric("endingVersion", _)).getOrElse(-1L)
      return GraftSqlTable(path, vt, pinnedVersion = None,
        cdfWindow = Some((start, end)))
    }
    val pinned = optV.map(numeric("versionAsOf", _)).orElse(optTs.map(s =>
      vt.versionAsOf(GraftTimeTravel.parseMillis(SparkSession.active, s, path))))
    GraftSqlTable(path, vt, pinnedVersion = pinned)
  }

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    open(options).schema()

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: JMap[String, String]): Table =
    open(new CaseInsensitiveStringMap(properties))

  // ---- streaming source: spark.readStream.format("graft").load(dir) ---

  private def streamVt(parameters: Map[String, String]): VersionedTable = {
    val path = parameters.getOrElse("path", throw new IllegalArgumentException(
      "readStream.format(\"graft\") requires a path"))
    VersionedTable(SparkSession.active, path)
  }

  // parameters arrive with caller casing; options are case-insensitive
  private def streamOpt(parameters: Map[String, String], k: String): Option[String] =
    parameters.get(k).orElse(
      parameters.collectFirst { case (p, v) if p.equalsIgnoreCase(k) => v })

  /** Append-only source by default; with `readChangeFeed=true`, the
    * row-level CDC source ([[graft.streaming.GraftCdcStreamSource]]) —
    * optional `startingVersion` (default 1 = the whole history) and
    * `schemaTrackingLocation` (a stream-private directory; Delta's
    * option) to ride across rename/drop schema epochs with one
    * same-checkpoint stop/start per boundary instead of a fresh-
    * checkpoint re-read.
    */
  private def buildSource(parameters: Map[String, String]): Source = {
    val vt = streamVt(parameters)
    if (streamOpt(parameters, "readChangeFeed").exists(_.equalsIgnoreCase("true"))) {
      val start = streamOpt(parameters, "startingVersion").map { s =>
        try s.toLong catch {
          case _: NumberFormatException => throw new IllegalArgumentException(
            s"${vt.tableDir}: startingVersion must be numeric, got '$s'")
        }
      }.getOrElse(1L)
      val tracker = streamOpt(parameters, "schemaTrackingLocation")
        .map(dir => new graft.streaming.SchemaTracker(vt.spark, dir))
      new graft.streaming.GraftCdcStreamSource(vt.spark, vt, start, tracker)
    } else {
      require(streamOpt(parameters, "schemaTrackingLocation").isEmpty,
        s"${vt.tableDir}: schemaTrackingLocation applies to the change-feed " +
          "source only (readChangeFeed=true)")
      new graft.streaming.GraftStreamSource(vt.spark, vt)
    }
  }

  override def sourceSchema(sqlContext: SQLContext, schema: Option[StructType],
      providerName: String, parameters: Map[String, String]): (String, StructType) = {
    require(schema.isEmpty,
      "the graft streaming source derives its schema from the table's " +
        "manifest — do not pass a user schema")
    (shortName(), buildSource(parameters).schema)
  }

  override def createSource(sqlContext: SQLContext, metadataPath: String,
      schema: Option[StructType], providerName: String,
      parameters: Map[String, String]): Source = {
    // schema-tracked CDC source: before freezing a schema, REALIGN the
    // tracker with the engine's own commit/offset logs (metadataPath is
    // <checkpoint>/sources/<i>, so the logs are two levels up). The
    // tracker normally matches — it is written from getBatch's engine-
    // confirmed `from` — but a crash in the instant between the engine's
    // commit-log write and the next trigger can leave it one batch
    // behind, which would freeze the OLD epoch's schema over a fully
    // committed boundary and idle the stream. Realignment is Delta's
    // schemaTrackingLocation behavior: fix the tracker, then fail once
    // asking for a (same-checkpoint) restart so analysis re-reads it.
    streamOpt(parameters, "schemaTrackingLocation").foreach { trackDir =>
      if (streamOpt(parameters, "readChangeFeed").exists(_.equalsIgnoreCase("true")))
        graft.streaming.SchemaTracker.realign(streamVt(parameters), trackDir,
          metadataPath,
          startingVersion = streamOpt(parameters, "startingVersion")
            .flatMap(s => scala.util.Try(s.toLong).toOption).getOrElse(1L))
    }
    buildSource(parameters)
  }

  // ---- streaming sink: .writeStream.format("graft").start(dir) --------
  // DeltaSink's V1 shape: each micro-batch is ONE atomic versioned
  // commit via commitAppendBatch, whose per-app batch marker makes a
  // foreachBatch-style replay (crash between commit and checkpoint
  // advance) a no-op — exactly-once without any user code. With the
  // source above, a table-to-table hop is pure readStream→writeStream.

  override def createSink(sqlContext: SQLContext,
      parameters: Map[String, String], partitionColumns: Seq[String],
      outputMode: OutputMode): Sink = {
    require(outputMode == OutputMode.Append(),
      s"the graft streaming sink is append-only (versioned commits); got $outputMode")
    require(partitionColumns.isEmpty,
      "partitionBy is not supported by the graft streaming sink — " +
        "write partitioned versioned tables with Lakehouse's partitioned sink")
    val vt = streamVt(parameters)
    // The replay marker must be namespaced PER QUERY (Delta's txn appId
    // discipline): two distinct streams writing the same table both
    // start at batchId 0, and a shared marker would classify the second
    // stream's batch 0 as a replay — silent data loss. The checkpoint
    // location is the query's stable identity across restarts (replays
    // only ever come from the same checkpoint), so it is the default
    // namespace; an explicit 'app' option overrides; a checkpoint-less
    // query has no cross-restart replay to dedup, so a sink-instance
    // UUID keeps it isolated from every other writer.
    def opt(k: String): Option[String] = parameters.get(k)
      .orElse(parameters.collectFirst { case (p, v) if p.equalsIgnoreCase(k) => v })
    val app = opt("app")
      .orElse(opt("checkpointLocation").map(cp => s"sink:$cp"))
      .getOrElse(s"sink:${java.util.UUID.randomUUID()}")
    new Sink {
      override def addBatch(batchId: Long, data: DataFrame): Unit = {
        // the incoming frame is streaming-internal (batch actions on it
        // re-plan and fail); re-tag its rows as a batch frame first
        val batch = org.apache.spark.sql.graft.shims.batchDataFrame(vt.spark, data)
        vt.commitAppendBatch(batch, batchId, app): Unit
      }
      override def toString: String = s"GraftSink[${vt.tableDir}, app=$app]"
    }
  }
}
