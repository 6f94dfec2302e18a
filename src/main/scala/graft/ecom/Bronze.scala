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
}
