package graft.ecom

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Bronze layer: raw ingest with audit columns (reference:
  * `/root/reference/01_bronze/01_bronze_ingest.py`).
  *
  * Every Bronze row is stamped with `_ingest_ts` and `_source_file`
  * (`01_bronze_ingest.py:28-29`); these drive the Silver dedup ordering.
  * `ingestTs` is injectable so pipelines (and tests) are deterministic —
  * the reference's bare current_timestamp() is the non-deterministic
  * special case `stamp(df, file)`.
  */
object Bronze {

  /** Stamp audit columns onto a raw DataFrame. */
  def stamp(df: DataFrame, sourceFile: String): DataFrame =
    df.withColumn("_ingest_ts", current_timestamp())
      .withColumn("_source_file", lit(sourceFile))

  /** Deterministic variant: freeze the ingest timestamp. */
  def stampAt(df: DataFrame, sourceFile: String, ingestTs: java.sql.Timestamp): DataFrame =
    df.withColumn("_ingest_ts", lit(ingestTs))
      .withColumn("_source_file", lit(sourceFile))

  /** CSV ingest with the explicit schema for `table` (reference uses
    * header+inferSchema, `01_bronze_ingest.py:26`; explicit schemas are
    * deterministic — pass `inferSchema=true` to mirror the reference).
    */
  def readCsv(spark: SparkSession, table: String, path: String,
      inferSchema: Boolean = false): DataFrame = {
    val base = spark.read.option("header", "true")
    val reader =
      if (inferSchema) base.option("inferSchema", "true")
      else base.schema(Schemas.all(table))
    stamp(reader.csv(path), path)
  }

  /** The audit column carrying a malformed row's RAW line (Spark's
    * PERMISSIVE `columnNameOfCorruptRecord`), underscore-prefixed like
    * the other bronze audit columns.
    */
  val CorruptCol: String = "_corrupt_record"

  /** PERMISSIVE CSV ingest with corrupt-record CAPTURE — the behavior
    * the reference inherits from Databricks' CSV default, made explicit
    * so a dirty 100 TB ingest quarantines instead of nulling silently:
    * a line that cannot parse against `table`'s schema (wrong field
    * count, untypeable value) lands as an otherwise-null row whose
    * [[CorruptCol]] holds the raw text; clean rows carry NULL there.
    *
    * Landing the capture column IN bronze (rather than dropping bad
    * rows at read) is deliberate: bronze stays a lossless record of the
    * source, and the quarantine split ([[splitQuarantine]]) runs on the
    * MATERIALIZED bronze — Spark disallows filtering a not-yet-
    * materialized scan by only its corrupt column precisely because the
    * column exists only during parsing.
    */
  def readCsvQuarantine(spark: SparkSession, table: String, path: String): DataFrame = {
    val schema = Schemas.all(table).add(CorruptCol,
      org.apache.spark.sql.types.StringType)
    stamp(
      spark.read.option("header", "true")
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CorruptCol)
        .schema(schema)
        .csv(path),
      path)
  }

  /** Split a materialized quarantine-capturing bronze into
    * (clean rows without the capture column, quarantined raw rows) —
    * the badRecordsPath shape, driven from the landed table so nothing
    * is parsed twice and the split is consistent with what bronze
    * recorded.
    */
  def splitQuarantine(bronze: DataFrame): (DataFrame, DataFrame) = (
    bronze.filter(col(CorruptCol).isNull).drop(CorruptCol),
    bronze.filter(col(CorruptCol).isNotNull))
}
