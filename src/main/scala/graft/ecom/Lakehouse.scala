package graft.ecom

import java.time.LocalDate

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions.{col, lit}

/** Medallion orchestrator (reference: the four notebooks run in numeric
  * order, `README.md:26-33`). Bronze → Silver → Gold → DQ gate, with
  * date-partitioned parquet writes mirroring the reference's Delta
  * layout (`overwriteSchema` is Delta-only; parquet overwrite replaces
  * the schema anyway — SURVEY §1.4). The writer format is a knob
  * resolved through [[FormatAdapter]], which carries each format's
  * option contract — so dropping the delta-spark jars on the classpath
  * and passing format="delta" slots Delta in unchanged (see the
  * adapter's doc for the exact session config).
  *
  * Scale: partition columns match the reference (event/order/session
  * date) so every dashboard BETWEEN predicate partition-prunes; at
  * 100 TB that's the difference between scanning a day and a year.
  */
final case class Lakehouse(
    spark: SparkSession,
    warehouseDir: String,
    format: String = "parquet") {

  /** Per-format option contract (see [[FormatAdapter]]). */
  val adapter: FormatAdapter = FormatAdapter.forName(format)

  /** Partition column per table (reference: `02_silver_transform.py:104,
    * 137,174`; `03_gold_aggregate.py:110,155,211`).
    */
  private val partitioning: Map[String, String] = Map(
    "events_clean" -> "event_date",
    "orders_clean" -> "order_date",
    "order_items_clean" -> "order_date",
    "product_metrics" -> "event_date",
    "product_funnel" -> "event_date",
    "session_metrics" -> "session_date")

  def write(name: String, df: DataFrame): Unit = {
    // cluster partitioned writes by the partition column BEFORE writing:
    // without it every shuffle task writes a sliver into every date dir
    // (tasks × dates files — the small-files problem at birth, and the
    // reason compact() exists); clustered, each date lands in exactly
    // one task → one well-sized file per dir. This is the optimize-
    // on-write shape. Caveat: a single-date refresh collapses to one
    // task — for hot-partition incremental refreshes use
    // overwritePartitions, which keeps the input's parallelism.
    val out = partitioning.get(name) match {
      case Some(p) => df.repartition(col(p))
      case None => df
    }
    val w = out.write.format(format).mode(SaveMode.Overwrite)
      .options(adapter.overwriteOptions)
    partitioning.get(name).fold(w)(w.partitionBy(_)).save(s"$warehouseDir/$name")
  }

  def read(name: String): DataFrame = spark.read.format(format).load(s"$warehouseDir/$name")

  /** The table as a versioned parquet+manifest table (atomic commits,
    * snapshot isolation, time travel — see [[VersionedTable]]). Uses the
    * same per-table partition column as [[write]]. A table must pick ONE
    * sink style: [[write]]'s overwrite deletes the version log.
    */
  def versioned(name: String): VersionedTable = {
    require(!adapter.ownsTransactions,
      s"format '$format' carries its own transaction log — use the format's " +
        "native time travel (versionAsOf read options) instead of wrapping " +
        "graft's manifest log around it")
    VersionedTable(spark, s"$warehouseDir/$name", format, partitioning.get(name))
  }

  /** Bucketed sink: hash-clusters rows into `nBuckets` files per
    * partition on `bucketCols` and records the layout in the catalog
    * (bucketing metadata only lives there, so this goes through
    * `saveAsTable`; the files still land under `warehouseDir`).
    *
    * This is the co-location contract for repeated big-big joins: two
    * tables bucketed on the same keys with the same bucket count join
    * with ZERO exchanges — each task zips bucket i with bucket i. At
    * 100 TB, bucketing the fact tables on their join key once at write
    * time deletes the dominant shuffle from every downstream join and
    * aggregation on that key (`spark.sql.sources.bucketing.enabled` is
    * on by default; verified shuffle-free in LakehouseIoSpec).
    * `sortBy` additionally pre-sorts within buckets so single-file
    * buckets skip the merge-join sort.
    */
  def writeBucketed(name: String, df: DataFrame, bucketCols: Seq[String],
      nBuckets: Int): Unit = {
    require(bucketCols.nonEmpty, s"writeBucketed($name): bucketCols must be non-empty")
    df.write.format(format)
      .mode(SaveMode.Overwrite)
      .options(adapter.overwriteOptions)
      .bucketBy(nBuckets, bucketCols.head, bucketCols.tail: _*)
      .sortBy(bucketCols.head, bucketCols.tail: _*)
      .option("path", s"$warehouseDir/$name")
      .saveAsTable(tableName(name))
  }

  /** Read a bucketed table back (bucket metadata comes from the
    * catalog, so this must be a table lookup, not a path read).
    */
  def readTable(name: String): DataFrame = spark.table(tableName(name))

  /** Drop a bucketed table's catalog entry. */
  def dropTable(name: String): Unit =
    spark.sql(s"DROP TABLE IF EXISTS ${tableName(name)}")

  /** Catalog identifier scoped to this warehouse: the catalog is
    * session-global, so two Lakehouse instances with different
    * warehouseDirs must not collide on a bare table name.
    */
  private def tableName(name: String): String = {
    // sanitized full path + hash: distinct dirs collide only if BOTH
    // the sanitized forms and the 32-bit hashes coincide
    val dir = warehouseDir.replaceAll("[^A-Za-z0-9]", "_")
    s"graft_${dir}_${Integer.toHexString(warehouseDir.hashCode)}_$name"
  }

  /** Overwrite exactly the partitions present in `df`, leaving every
    * other partition untouched (dynamic partition overwrite). This is
    * the incremental-recompute primitive for the medallion pipeline:
    * recompute a gold model for the dates new silver data landed on and
    * refresh just those date directories — at 100 TB the daily refresh
    * touches a day, not a decade.
    */
  def overwritePartitions(name: String, df: DataFrame): Unit = {
    val partCol = partitioning.getOrElse(name,
      throw new IllegalArgumentException(s"$name has no partition column registered"))
    df.write.format(format)
      .mode(SaveMode.Overwrite)
      .options(adapter.overwriteOptions)
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy(partCol)
      .save(s"$warehouseDir/$name")
  }

  /** Compact a table to one file per partition directory. Incremental
    * sinks and per-batch upserts accumulate small files; scan cost at
    * scale is dominated by file count once files drop below row-group
    * size, so periodic compaction is part of the table's lifecycle.
    *
    * Crash-safe shape: the compacted copy is fully written to a sibling
    * temp directory FIRST (reading the live files — no read/overwrite
    * conflict, no table-sized snapshot pinned in executor storage), then
    * swapped in by renaming the live table ASIDE to a `.bak` dir and the
    * temp copy into place — so at every instant the full data exists at
    * either the live path or the backup path, and every fs call's
    * boolean result is require()d (HDFS-style filesystems report rename
    * failure by returning false, not throwing; an unchecked false here
    * would silently drop the table). A crash between the two renames
    * leaves the table at `.bak` for manual (or next-run) recovery rather
    * than deleted. `mergeSchema` on the read so additively-evolved
    * older partitions don't nondeterministically drop newer columns.
    * Not for catalog-backed bucketed tables (their bucket layout lives
    * in the catalog; rewriting files would corrupt it — use
    * writeBucketed to rewrite those). Don't run concurrently with a
    * writer.
    */
  def compact(name: String): Unit = {
    require(!spark.catalog.tableExists(tableName(name)),
      s"$name is a bucketed catalog table — rewrite it with writeBucketed, not compact")
    val target = s"$warehouseDir/$name"
    // a VERSIONED table must never go through this path: the plain
    // recursive read would bake every retained version (resurrections),
    // orphans, and DV sidecars into one frame, and the swap would
    // destroy the _graft_log — use VersionedTable.optimize instead
    val logP = new org.apache.hadoop.fs.Path(s"$target/_graft_log")
    require(!logP.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(logP),
      s"$name is a versioned table — compact it with VersionedTable.optimize, " +
        "never the path-level compactor (it would flatten the version history)")
    val tmp = s"$warehouseDir/.$name.compact.tmp"
    val current = spark.read.format(format)
      .options(adapter.mergeReadOptions).load(target)
    partitioning.get(name) match {
      case Some(partCol) =>
        // clustering by the partition column gives each task at most a
        // few dates and each date exactly one task -> one file per dir
        current.repartition(col(partCol))
          .write.format(format).mode(SaveMode.Overwrite).partitionBy(partCol).save(tmp)
      case None =>
        current.coalesce(1).write.format(format).mode(SaveMode.Overwrite).save(tmp)
    }
    val targetP = new org.apache.hadoop.fs.Path(target)
    val tmpP = new org.apache.hadoop.fs.Path(tmp)
    val bakP = new org.apache.hadoop.fs.Path(s"$warehouseDir/.$name.compact.bak")
    val fs = targetP.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(bakP))
      require(fs.delete(bakP, true), s"compact: could not clear stale backup $bakP")
    require(fs.rename(targetP, bakP),
      s"compact: could not move $target aside to $bakP — table left untouched")
    require(fs.rename(tmpP, targetP),
      s"compact: could not swap $tmp into $target — original preserved at $bakP")
    require(fs.delete(bakP, true) || !fs.exists(bakP),
      s"compact: swap succeeded but backup $bakP could not be removed")
  }

  /** Upsert (MERGE-by-key, latest-wins on `orderCol`) into a
    * date-partitioned table without a transactional format: the rewrite
    * scope is ONLY the partitions the update batch touches —
    *  1. collect the touched partition values (small: one per date),
    *  2. read just those partitions (partition-pruned scan),
    *  3. union + dedupLatest by key,
    *  4. write back with dynamic partition overwrite.
    * Untouched partitions are never read or rewritten, so cost scales
    * with the update batch, not the table — the same rewrite scope a
    * stats-pruned Delta MERGE achieves. Not atomic across partitions (a
    * transactional format adds that).
    *
    * Constraint: a key's partition value must be STABLE (the partition
    * column derives from an immutable attribute, e.g. event time). An
    * update that moves a key to a different partition would leave the
    * old row in the unread partition — matching a moved key requires a
    * full-table key scan (what Delta MERGE does absent stats pruning),
    * which defeats the partition-scoped cost model this method exists
    * to provide.
    */
  def upsert(name: String, updates: DataFrame, keys: Seq[String],
      orderCol: String, partitionChunk: Int = 1000): Unit = {
    require(partitionChunk > 0, s"partitionChunk must be positive, got $partitionChunk")
    val partCol = partitioning.getOrElse(name,
      throw new IllegalArgumentException(s"$name has no partition column registered"))
    // the touched-value collect is bounded by the update batch's distinct
    // partitions (one per date for the registered tables); the merge
    // below is additionally CHUNKED so a pathological batch touching
    // very many partitions never builds a single plan with a 100k-value
    // isin predicate (Catalyst cost blows up long before driver memory
    // does). Chunks are disjoint partition sets, so per-chunk merges
    // compose to exactly the one-shot merge.
    val touched = updates.select(partCol).distinct().collect().map(_.get(0))
    touched.grouped(partitionChunk).foreach { chunk =>
      // isin(null) is NULL, never true — without the explicit isNull arm
      // an update batch touching the null partition would exclude that
      // partition's existing rows from the merge while dynamic overwrite
      // still rewrites it, silently deleting them
      val nonNull = chunk.filter(_ != null)
      def touchedPred(c: org.apache.spark.sql.Column) = {
        val in = if (nonNull.nonEmpty) c.isin(nonNull.toSeq: _*) else lit(false)
        if (chunk.contains(null)) in || c.isNull else in
      }
      val existing = read(name).filter(touchedPred(col(partCol)))
      // updates win exact-orderCol ties over existing rows (deterministic
      // MERGE semantics, not partition-order luck)
      val srcCol = graft.util.Names.fresh("_is_update", existing.columns)
      val unioned = existing.withColumn(srcCol, lit(0))
        .unionByName(updates.filter(touchedPred(col(partCol)))
          .select(existing.columns.map(col): _*)
          .withColumn(srcCol, lit(1)))
      // NULL-keyed rows are exempt from the dedup: a null key matches
      // nothing (MERGE semantics — see VersionedTable.merge), but
      // Window.partitionBy groups all nulls into ONE group, so running
      // them through dedupLatest would silently keep one of N
      val nullKey = keys.map(col(_).isNull).reduce(_ || _)
      val merged = graft.ops.CleanOps.dedupLatest(
          unioned.filter(!nullKey),
          keys, Seq(col(orderCol).desc, col(srcCol).desc))
        .unionByName(unioned.filter(nullKey))
        .drop(srcCol)
      overwritePartitions(name, merged)
    }
  }

  /** Training-data shard export: write `df` as exactly `nShards` files,
    * each holding a deterministic pseudo-random slice of the rows — the
    * final sink of a curation pipeline, where downstream training
    * readers want (a) shards of near-equal size, (b) a GLOBAL shuffle
    * (documents from one source/domain spread across shards, never
    * clumped in input order), and (c) bit-identical output for the same
    * input and seed (resumable/verifiable at 100 TB).
    *
    * Plan: shard id = xxhash64(all columns, seed) mod nShards —
    * content-derived, so placement is independent of input partitioning
    * and parallelism (`repartition(n)` round-robins by partition and is
    * NOT stable across input layouts). One hash shuffle into `nShards`
    * write tasks, each emitting one file; rows within a shard are
    * additionally sorted by the hash, so the within-shard order is
    * content-deterministic too and consecutive training examples are
    * decorrelated. Balance follows from hash uniformity (~±3σ·√(n/N));
    * exact-equal sizing would need a global rank — a total sort the
    * uniform hash makes unnecessary.
    */
  def writeShards(name: String, df: DataFrame, nShards: Int, seed: Long): Unit = {
    require(nShards > 0, s"nShards must be positive, got $nShards")
    // case-insensitive, as Spark resolves names: a 'Shard' column would
    // pass a case-sensitive check and then be silently REPLACED by the
    // computed shard id
    require(!df.columns.exists(_.equalsIgnoreCase("shard")),
      "input already has a 'shard' column (any case)")
    // the contract hashes AND sorts by EVERY column, so every column
    // must be orderable/hashable — a MapType (unhashable by xxhash64,
    // unorderable in sortWithinPartitions) would otherwise surface as
    // an analysis error naming an internal expression; fail up front
    // naming the offending columns instead
    val unorderable = df.schema.fields.filterNot(f =>
      org.apache.spark.sql.catalyst.expressions.RowOrdering.isOrderable(f.dataType))
    require(unorderable.isEmpty,
      s"writeShards hashes and sorts by every column; unorderable column(s): " +
        unorderable.map(f => s"${f.name}: ${f.dataType.simpleString}").mkString(", ") +
        " — drop or serialize them (e.g. to_json) before sharding")
    import org.apache.spark.sql.functions.{pmod, xxhash64}
    val h = xxhash64(lit(seed) +: df.columns.map(col): _*)
    // shard=i/ directories via partitionBy: all rows of a shard share a
    // shard value, so they land in one task (repartition by shard) and
    // that task writes exactly one file into the shard's directory —
    // nShards dirs, one file each, regardless of hash collisions in
    // Spark's task assignment.
    // sort key = (shard, hash, full row): the row tuple breaks 64-bit
    // hash ties between DISTINCT rows — at >= 2^32 rows a birthday
    // collision is expected, and without the tiebreaker the collided
    // rows' relative order would follow arrival order, silently voiding
    // the bit-reproducibility contract exactly at production scale
    val order = Seq(col("shard"), h) ++ df.columns.map(col)
    df.withColumn("shard", pmod(h, lit(nShards.toLong)))
      .repartition(nShards, col("shard"))
      .sortWithinPartitions(order: _*)
      .write.format(format).mode(SaveMode.Overwrite)
      .partitionBy("shard")
      .save(s"$warehouseDir/$name")
  }

  /** Register tables for the SQL entry point (reference EP2: every DQ
    * check and %sql cell runs `spark.sql` against the catalog —
    * `04_data_quality_checks.py:24`, `01_bronze_ingest.py:42-49`).
    */
  def registerViews(tables: Map[String, DataFrame]): Unit =
    tables.foreach { case (name, df) => df.createOrReplaceTempView(name) }

  /** Full pipeline from bronze DataFrames; returns the gold map (also
    * persisted under `warehouseDir`). `enforceDq=false` skips the raise
    * so callers can inspect failed checks.
    */
  def runAll(bronze: Map[String, DataFrame], asOf: LocalDate,
      loadTs: java.sql.Timestamp = null, enforceDq: Boolean = true): Map[String, DataFrame] = {
    import scala.concurrent.{Await, ExecutionContext, Future}
    import scala.concurrent.duration.Duration
    val ts = Option(loadTs).getOrElse(java.sql.Timestamp.valueOf(asOf.atStartOfDay))
    val silver = Silver.transformAll(bronze)
    // the seven silver writes are independent table-sized jobs: run
    // them on a SMALL pool (guide §2.6 — overlap so one write's commit
    // latency backfills another's idle cores; capped at 3 because seven
    // table-sized writes racing the whole machine thrash each other,
    // the same rule the incremental bootstrap wave applies). Content
    // and layout per table are unchanged — only the false serialization
    // between tables is gone.
    val pool = java.util.concurrent.Executors.newFixedThreadPool(3)
    locally {
      implicit val ec: ExecutionContext = ExecutionContext.fromExecutorService(pool)
      try Await.result(
        Future.sequence(silver.toSeq.map { case (name, df) =>
          Future(write(name, df))
        }), Duration.Inf): Unit
      finally pool.shutdown()
    }
    val silverRead = silver.keys.map(n => n -> read(n)).toMap
    // STAGED gold writes, exactly as the reference notebook sequences
    // them (`03_gold_aggregate.py`): product_funnel derives FROM the
    // WRITTEN product_metrics table (`:122`), customer_360 FROM the
    // WRITTEN session_metrics table (`:229`) — each downstream model
    // reads its input back from disk rather than recomputing the plan.
    // The two FAMILIES are independent chains and overlap (§2.6); the
    // in-chain order (pm before funnel, sm before c360) stays.
    locally {
      implicit val ec: ExecutionContext = ExecutionContext.global
      val fProduct = Future {
        val pm = Gold.productMetrics(
          silverRead("events_clean"), silverRead("order_items_clean"),
          silverRead("products_clean"), silverRead("reviews_clean"))
        write("product_metrics", pm)
        write("product_funnel", Gold.productFunnel(read("product_metrics")))
      }
      val fSession = Future {
        val sm = Gold.sessionMetrics(
          silverRead("events_clean"), silverRead("sessions_clean"))
        write("session_metrics", sm)
        write("customer_360",
          Gold.customer360(silverRead("customers_clean"), read("session_metrics"), asOf, ts))
      }
      Await.result(Future.sequence(Seq(fProduct, fSession)), Duration.Inf): Unit
    }
    val goldRead = Seq("product_metrics", "product_funnel", "session_metrics", "customer_360")
      .map(n => n -> read(n)).toMap
    if (enforceDq) DqChecks.enforceAll(goldRead)
    goldRead
  }
}
