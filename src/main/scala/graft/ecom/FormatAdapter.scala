package graft.ecom

/** The storage-format seam of the medallion writer: everything
  * format-specific the [[Lakehouse]] sinks need — the DataSource short
  * name, the writer/reader options that format requires, and whether it
  * brings its OWN transaction log (in which case graft's
  * [[VersionedTable]] layer should NOT wrap it).
  *
  * The environment here ships no Delta/Iceberg jars (offline build), so
  * the columnar adapters (parquet, orc) are the tested bindings
  * (`FormatAdapterSpec` runs the io contract against both), and the
  * `delta` binding is DOCUMENTED but will only resolve once
  * `delta-spark` is on the classpath. Dropping it in is a config
  * change, no code change:
  *
  * {{{
  * // spark-submit --packages io.delta:delta-spark_2.13:<ver>
  * //   --conf spark.sql.extensions=io.delta.sql.DeltaSparkSessionExtension
  * //   --conf spark.sql.catalog.spark_catalog=
  * //          org.apache.spark.sql.delta.catalog.DeltaCatalog
  * Lakehouse(spark, dir, format = "delta")   // resolves DeltaAdapter
  * }}}
  *
  * With `delta` the format owns ACID/time travel, so use Spark's
  * native `versionAsOf`/`timestampAsOf` read options on the format
  * reader ([[FormatAdapter.ownsTransactions]] = true) instead of
  * [[Lakehouse.versioned]]; with the columnar formats, `versioned`
  * provides the log (graft's own manifest format).
  */
sealed trait FormatAdapter {
  /** DataSource short name, as passed to `read/write.format(...)`. */
  def name: String

  /** Options every OVERWRITE write needs under this format. Delta
    * refuses schema-changing overwrites without `overwriteSchema`
    * (graft SURVEY §1.4); the columnar formats replace the schema with
    * the directory contents and take no option.
    */
  def overwriteOptions: Map[String, String]

  /** Options the schema-merging read path needs (compact()'s
    * `mergeSchema` union read is a parquet/orc reader feature; Delta
    * resolves the schema from its log and ignores it).
    */
  def mergeReadOptions: Map[String, String]

  /** True when the format carries its own transaction log — writes are
    * already atomic+versioned, and wrapping [[VersionedTable]]'s
    * manifest log AROUND it would double-log. [[Lakehouse.versioned]]
    * refuses on such formats.
    */
  def ownsTransactions: Boolean
}

object FormatAdapter {

  case object Parquet extends FormatAdapter {
    val name = "parquet"
    val overwriteOptions: Map[String, String] = Map.empty
    val mergeReadOptions: Map[String, String] = Map("mergeSchema" -> "true")
    val ownsTransactions = false
  }

  case object Orc extends FormatAdapter {
    val name = "orc"
    val overwriteOptions: Map[String, String] = Map.empty
    val mergeReadOptions: Map[String, String] = Map("mergeSchema" -> "true")
    val ownsTransactions = false
  }

  /** The documented delta-spark binding (requires the jars; see the
    * trait doc). `overwriteSchema` makes schema-changing overwrites
    * legal, matching the columnar formats' replace semantics the
    * medallion writer assumes.
    */
  case object Delta extends FormatAdapter {
    val name = "delta"
    val overwriteOptions: Map[String, String] = Map("overwriteSchema" -> "true")
    val mergeReadOptions: Map[String, String] = Map.empty
    val ownsTransactions = true
  }

  /** An unrecognized format string passes through untouched with
    * columnar-style defaults — the caller owns its option contract.
    */
  final case class Generic(name: String) extends FormatAdapter {
    val overwriteOptions: Map[String, String] = Map.empty
    val mergeReadOptions: Map[String, String] = Map.empty
    val ownsTransactions = false
  }

  def forName(format: String): FormatAdapter = format.toLowerCase match {
    case "parquet" => Parquet
    case "orc" => Orc
    case "delta" => Delta
    case other => Generic(other)
  }
}
