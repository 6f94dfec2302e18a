package graft.queries

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType, LongType}

import graft.ecom.VersionedTable
import graft.ops.ZOrder
import graft.util.Exact.dsum
import graft.util.Tables.load

/** The versioned table format (graft.ecom.VersionedTable — the
  * reference's Delta layer, `README.md:10`, `01_bronze_ingest.py:34`)
  * exercised END TO END inside the oracle gate: each query builds a
  * throwaway versioned table from testdata, drives the write surface
  * (z-ordered commits + stats skipping, copy-on-write MERGE,
  * append + incremental change reads, DELETE/UPDATE + time travel),
  * reads the result back and aggregates it — while the DuckDB twin
  * re-derives the same final state relationally from the raw tables.
  * A hash match therefore proves the FORMAT's semantics (what rows a
  * version contains), not just an aggregation.
  *
  * Writes are part of the timed work, as in q35: every bench rep pays
  * the full commit cost into a fresh temp dir.
  */
object Versioned {

  /** Z-ordered versioned commit + two stats-pruned range reads, one per
    * clustered dimension — the multi-dimensional data-skipping path
    * (ZOrderSpec pins the pruning itself; here the PRUNED READS face
    * the oracle, proving skipping never drops or duplicates rows).
    */
  val qv01 = Q(
    "qv01_zorder_skip",
    """WITH ok AS (
      |  SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
      |    CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price,
      |    CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS total_qty
      |  FROM lineitem WHERE l_orderkey BETWEEN 100 AND 500),
      |sk AS (
      |  SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
      |    CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price,
      |    CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS total_qty
      |  FROM lineitem WHERE l_suppkey BETWEEN 10 AND 50)
      |SELECT dim, n_rows, total_price, total_qty FROM (
      |  SELECT 'orderkey' AS dim, * FROM ok
      |  UNION ALL
      |  SELECT 'suppkey' AS dim, * FROM sk) u
      |ORDER BY dim""".stripMargin) { (s, dir) =>
    val vt = VersionedTable(s, Files.createTempDirectory("graft-qv01-").toString,
      statsColumns = Seq("l_orderkey", "l_suppkey"))
    vt.commitOverwrite(ZOrder.cluster(
      load(s, dir, "lineitem"), Seq("l_orderkey", "l_suppkey"), numFiles = 16))
    def agg(dim: String, df: org.apache.spark.sql.DataFrame) =
      df.agg(
          count(lit(1)).as("n_rows"),
          dsum(col("l_extendedprice")).as("total_price"),
          sum(col("l_quantity").cast(LongType)).as("total_qty"))
        .select(lit(dim).as("dim"), col("n_rows"), col("total_price"), col("total_qty"))
    agg("orderkey", vt.readRange("l_orderkey", 100L, 500L))
      .unionByName(agg("suppkey", vt.readRange("l_suppkey", 10L, 50L)))
      .orderBy("dim")
  }

  /** Copy-on-write MERGE: upsert a derived batch (price bump on even
    * order keys — updates where the key survives the base filter,
    * inserts where it does not) and aggregate the merged table. The
    * oracle replays MERGE as anti-join + union — the standard
    * relational definition — so a hash match pins matched-replace,
    * unmatched-insert, and untouched-row semantics all at once.
    */
  val qv02 = Q(
    "qv02_versioned_merge",
    """WITH base AS (
      |  SELECT o_orderkey, o_orderstatus,
      |    CAST(o_totalprice AS DOUBLE) AS price
      |  FROM orders WHERE o_orderkey % 4 <> 0),
      |src AS (
      |  SELECT o_orderkey, o_orderstatus,
      |    CAST(CAST(o_totalprice AS DECIMAL(18,2)) + CAST(10 AS DECIMAL(18,2)) AS DOUBLE) AS price
      |  FROM orders WHERE o_orderkey % 2 = 0),
      |merged AS (
      |  SELECT * FROM base WHERE o_orderkey NOT IN (SELECT o_orderkey FROM src)
      |  UNION ALL SELECT * FROM src)
      |SELECT o_orderstatus,
      |  CAST(COUNT(*) AS BIGINT) AS n_orders,
      |  CAST(SUM(CAST(price AS DECIMAL(18,2))) AS DOUBLE) AS total_price
      |FROM merged GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin) { (s, dir) =>
    val orders = load(s, dir, "orders")
    val vt = VersionedTable(s, Files.createTempDirectory("graft-qv02-").toString)
    vt.commitOverwrite(orders.filter(col("o_orderkey") % 4 =!= 0).select(
      col("o_orderkey"), col("o_orderstatus"),
      col("o_totalprice").cast(DoubleType).as("price")))
    vt.merge(
      orders.filter(col("o_orderkey") % 2 === 0).select(
        col("o_orderkey"), col("o_orderstatus"),
        (col("o_totalprice").cast(DecimalType(18, 2)) +
          lit(10).cast(DecimalType(18, 2))).cast(DoubleType).as("price")),
      keys = Seq("o_orderkey"))
    vt.read()
      .groupBy("o_orderstatus")
      .agg(count(lit(1)).as("n_orders"), dsum(col("price")).as("total_price"))
      .orderBy("o_orderstatus")
  }

  /** Append + incremental change read: commit a base slice of events,
    * append the rest, then aggregate ONLY `readChangesSince(v1)` — the
    * change-feed path a 100 TB downstream job uses to process each
    * batch once. The oracle computes the appended slice directly.
    */
  val qv03 = Q(
    "qv03_append_changes",
    """SELECT event_type,
      |  CAST(COUNT(*) AS BIGINT) AS n_events,
      |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
      |FROM events WHERE event_id % 10 >= 7
      |GROUP BY event_type ORDER BY event_type""".stripMargin) { (s, dir) =>
    val events = load(s, dir, "events")
      .select(col("event_id"), col("event_type"), col("value"))
    val vt = VersionedTable(s, Files.createTempDirectory("graft-qv03-").toString)
    vt.commitOverwrite(events.filter(col("event_id") % 10 < 7))
    vt.commitAppend(events.filter(col("event_id") % 10 >= 7))
    vt.readChangesSince(1L)
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_events"), dsum(col("value")).as("total_value"))
      .orderBy("event_type")
  }

  /** Copy-on-write DELETE + UPDATE + byte-identical time travel, all
    * under one hash: the current version must equal the oracle's
    * filtered/updated derivation AND version 1 must still equal the
    * raw table after both rewrites.
    */
  val qv04 = Q(
    "qv04_delete_update_timetravel",
    """WITH cur AS (
      |  SELECT p_partkey,
      |    CASE WHEN p_partkey % 7 = 0
      |      THEN CAST(CAST(p_retailprice AS DECIMAL(18,2)) + CAST(5 AS DECIMAL(18,2)) AS DOUBLE)
      |      ELSE CAST(p_retailprice AS DOUBLE) END AS price
      |  FROM part WHERE NOT (p_size >= 40))
      |SELECT rel, n_parts, total_price FROM (
      |  SELECT 'current' AS rel, CAST(COUNT(*) AS BIGINT) AS n_parts,
      |    CAST(SUM(CAST(price AS DECIMAL(18,2))) AS DOUBLE) AS total_price
      |  FROM cur
      |  UNION ALL
      |  SELECT 'v1', CAST(COUNT(*) AS BIGINT),
      |    CAST(SUM(CAST(p_retailprice AS DECIMAL(18,2))) AS DOUBLE)
      |  FROM part) u
      |ORDER BY rel""".stripMargin) { (s, dir) =>
    val vt = VersionedTable(s, Files.createTempDirectory("graft-qv04-").toString,
      statsColumns = Seq("p_size"))
    vt.commitOverwrite(load(s, dir, "part").select(
      col("p_partkey"), col("p_size"),
      col("p_retailprice").cast(DoubleType).as("price")))
    // stats-pruned copy-on-write delete, then a row-level update
    vt.deleteRange("p_size", 40L, Long.MaxValue)
    vt.update(col("p_partkey") % 7 === 0, Map("price" ->
      (col("price").cast(DecimalType(18, 2)) + lit(5).cast(DecimalType(18, 2)))
        .cast(DoubleType)))
    def agg(rel: String, df: org.apache.spark.sql.DataFrame, price: String) =
      df.agg(count(lit(1)).as("n_parts"), dsum(col(price)).as("total_price"))
        .select(lit(rel).as("rel"), col("n_parts"), col("total_price"))
    agg("current", vt.read(), "price")
      .unionByName(agg("v1", vt.readAt(1L), "price"))
      .orderBy("rel")
  }

  /** The exactly-once incremental pipeline (VersionedPipe): source
    * bootstrap + append consumed in TWO delta steps (with a replayed
    * step in between that must commit nothing), a per-batch filter
    * transform, destination read back and aggregated. The oracle
    * derives the same destination relationally — a hash match pins
    * that every source row flowed exactly once through the change-feed
    * path, bootstrap and delta alike.
    */
  val qv05 = Q(
    "qv05_incremental_pipe",
    """SELECT event_type,
      |  CAST(COUNT(*) AS BIGINT) AS n_events,
      |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
      |FROM events WHERE event_type <> 'click'
      |GROUP BY event_type ORDER BY event_type""".stripMargin) { (s, dir) =>
    import graft.ecom.VersionedPipe
    val events = load(s, dir, "events")
      .select(col("event_id"), col("event_type"), col("value"))
    val base = Files.createTempDirectory("graft-qv05-").toString
    val src = VersionedTable(s, s"$base/src")
    val dst = VersionedTable(s, s"$base/dst")
    val keep = (df: org.apache.spark.sql.DataFrame) =>
      df.filter(col("event_type") =!= "click")
    src.commitOverwrite(events.filter(col("event_id") % 10 < 7))
    VersionedPipe.step(src, dst, keep)      // bootstrap: whole v1
    VersionedPipe.step(src, dst, keep)      // replay: must be a no-op
    src.commitAppend(events.filter(col("event_id") % 10 >= 7))
    VersionedPipe.step(src, dst, keep)      // delta: only the appended files
    dst.read()
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_events"), dsum(col("value")).as("total_value"))
      .orderBy("event_type")
  }

  /** The small-files lifecycle end to end: sliver appends (the
    * streaming-sink shape) → OPTIMIZE bin-packing → vacuum of the
    * superseded versions — and the surviving single snapshot must
    * still hash-match a straight relational read of the source. Pins
    * that compaction + retention never lose or duplicate a row; the
    * file-count mechanics are spec-pinned in VersionedCowSpec.
    */
  val qv06 = Q(
    "qv06_optimize_lifecycle",
    """SELECT event_type,
      |  CAST(COUNT(*) AS BIGINT) AS n_events,
      |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
      |FROM events
      |GROUP BY event_type ORDER BY event_type""".stripMargin) { (s, dir) =>
    val events = load(s, dir, "events")
      .select(col("event_id"), col("event_type"), col("value"))
    val vt = VersionedTable(s, Files.createTempDirectory("graft-qv06-").toString)
    (0 until 3).foreach(r =>
      vt.commitAppend(events.filter(col("event_id") % 3 === r).repartition(8)))
    vt.optimize()
    vt.vacuum(keepVersions = 1)
    vt.read()
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_events"), dsum(col("value")).as("total_value"))
      .orderBy("event_type")
  }

  /** Merge-on-read deletion vectors end to end: a sidecar-only delete
    * (no file rewritten), an append that must stay subject to it, a
    * second stacked DV delete over the combined state, then REORG
    * APPLY (PURGE) folding both back into the files — and time travel
    * to the sidecar version AFTER the purge. The oracle replays the
    * history as plain filter algebra, so a hash match pins that the
    * positional anti-join hides exactly the deleted rows at every
    * version, appends are untouched by older positions, and the purge
    * is data-identical.
    */
  val qv07 = Q(
    "qv07_deletion_vectors",
    """WITH a AS (
      |  SELECT o_orderkey, o_orderstatus,
      |    CAST(o_totalprice AS DOUBLE) AS price
      |  FROM orders WHERE o_orderkey % 3 <> 0),
      |b AS (
      |  SELECT o_orderkey, o_orderstatus,
      |    CAST(o_totalprice AS DOUBLE) AS price
      |  FROM orders WHERE o_orderkey % 3 = 0),
      |v2 AS (SELECT * FROM a WHERE NOT (o_orderkey % 5 = 0)),
      |cur AS (
      |  SELECT * FROM (SELECT * FROM v2 UNION ALL SELECT * FROM b) u
      |  WHERE NOT (o_orderstatus = 'F' AND o_orderkey % 7 = 0))
      |SELECT rel, o_orderstatus, n_orders, total_price FROM (
      |  SELECT 'current' AS rel, o_orderstatus,
      |    CAST(COUNT(*) AS BIGINT) AS n_orders,
      |    CAST(SUM(CAST(price AS DECIMAL(18,2))) AS DOUBLE) AS total_price
      |  FROM cur GROUP BY o_orderstatus
      |  UNION ALL
      |  SELECT 'v2', o_orderstatus, CAST(COUNT(*) AS BIGINT),
      |    CAST(SUM(CAST(price AS DECIMAL(18,2))) AS DOUBLE)
      |  FROM v2 GROUP BY o_orderstatus) u
      |ORDER BY rel, o_orderstatus""".stripMargin) { (s, dir) =>
    val orders = load(s, dir, "orders").select(
      col("o_orderkey"), col("o_orderstatus"),
      col("o_totalprice").cast(DoubleType).as("price"))
    val vt = VersionedTable(s, Files.createTempDirectory("graft-qv07-").toString)
    vt.commitOverwrite(orders.filter(col("o_orderkey") % 3 =!= 0))           // v1
    vt.deleteMoR(col("o_orderkey") % 5 === 0)                                // v2
    vt.commitAppend(orders.filter(col("o_orderkey") % 3 === 0))              // v3
    vt.deleteMoR(col("o_orderstatus") === "F" && col("o_orderkey") % 7 === 0) // v4
    vt.purgeDeletes()                                                        // v5
    def agg(rel: String, df: org.apache.spark.sql.DataFrame) =
      df.groupBy("o_orderstatus")
        .agg(count(lit(1)).as("n_orders"), dsum(col("price")).as("total_price"))
        .select(lit(rel).as("rel"), col("o_orderstatus"),
          col("n_orders"), col("total_price"))
    agg("current", vt.read())
      .unionByName(agg("v2", vt.readAt(2L)))
      .orderBy("rel", "o_orderstatus")
  }

  /** Bloom-filter point-lookup skipping end to end: documents committed
    * UNCLUSTERED (round-robin over 16 files, so every file's [min, max]
    * covers the whole id domain and range stats can never prune) with a
    * per-file bloom on doc_id; three point lookups plus one guaranteed
    * miss read back through [[VersionedTable.readPoint]]. The oracle is
    * the plain relational lookup — a hash match pins that bloom pruning
    * loses no rows and the miss probe invents none. The pruning
    * mechanics themselves (files actually skipped) are spec-pinned in
    * VersionedBloomSpec.
    */
  val qv08 = Q(
    "qv08_bloom_point_lookup",
    """SELECT doc_id, lang, source, n_chars
      |FROM documents WHERE doc_id IN (7, 123, 404, 999999)
      |ORDER BY doc_id""".stripMargin) { (s, dir) =>
    val docs = load(s, dir, "documents")
      .select(col("doc_id"), col("lang"), col("source"), col("n_chars"))
    val vt = VersionedTable(s, Files.createTempDirectory("graft-qv08-").toString,
      bloomColumns = Seq("doc_id"))
    vt.commitOverwrite(docs.repartition(16))
    Seq(7L, 123L, 404L, 999999L)
      .map(id => vt.readPoint("doc_id", id))
      .reduce(_.unionByName(_))
      .orderBy("doc_id")
  }

  /** The metadata features end to end: a generated column declared
    * over the base slice (verified), an append OMITTING it (the engine
    * computes it at write time), a metadata-only column rename and a
    * metadata-only drop — then the final read aggregates through the
    * renamed logical names. The oracle re-derives everything
    * relationally, so a hash match pins that write-time generation
    * produces exactly the declared expression and that the
    * rename/drop mapping layer loses nothing. Abort semantics
    * (violating batches, blocked renames) are spec-pinned in
    * VersionedGencolSpec/VersionedColmapSpec.
    */
  val qv09 = Q(
    "qv09_metadata_features",
    """SELECT l_returnflag AS flag,
      |  CAST(COUNT(*) AS BIGINT) AS n_rows,
      |  CAST(SUM(CAST(CAST(l_extendedprice AS DOUBLE) * CAST(l_quantity AS BIGINT)
      |    AS DECIMAL(18,2))) AS DOUBLE) AS total_gross,
      |  CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS total_qty
      |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin) { (s, dir) =>
    val li = load(s, dir, "lineitem").select(
      col("l_orderkey"),
      col("l_quantity").cast(LongType).as("l_quantity"),
      col("l_extendedprice").cast(DoubleType).as("l_extendedprice"),
      col("l_returnflag"), col("l_linestatus"))
    val withGross = li.withColumn("gross",
      col("l_extendedprice") * col("l_quantity"))
    val vt = VersionedTable(s, Files.createTempDirectory("graft-qv09-").toString)
    vt.commitOverwrite(withGross.filter(col("l_orderkey") % 2 === 1))       // v1
    vt.addGeneratedColumn("gross", "l_extendedprice * l_quantity")         // v2
    vt.commitAppend(li.filter(col("l_orderkey") % 2 === 0))                // v3: computed
    vt.renameColumn("l_returnflag", "flag")                                // v4
    vt.dropColumn("l_linestatus")                                          // v5
    vt.read()
      .groupBy("flag")
      .agg(count(lit(1)).as("n_rows"), dsum(col("gross")).as("total_gross"),
        sum(col("l_quantity")).as("total_qty"))
      .orderBy("flag")
  }

  // catalog instances are cached per session WITH their warehouse, so
  // each invocation (verify run, bench rep) registers a fresh name
  private val q10Counter = new java.util.concurrent.atomic.AtomicInteger()

  /** The SQL face of the format (graft.sql.GraftCatalog — the
    * reference's `ecom_catalog.gold.*` addressing on Databricks,
    * `03_gold_aggregate.py:28-30`): a versioned table is built with the
    * library API, then read back PURELY via SQL against the registered
    * catalog — current snapshot by name, a stats-skipping WHERE, and
    * `VERSION AS OF 1` time travel — with zero Graft API in the query.
    * The DuckDB twin re-derives each snapshot relationally from the raw
    * table, so a hash match proves name resolution, the relation rule's
    * plan conversion, manifest file skipping, and SQL time travel all
    * return exactly the rows the format committed.
    */
  val qv10 = Q(
    "qv10_sql_catalog_time_travel",
    """WITH agg AS (
      |  SELECT 'head' AS snap,
      |    CAST(COUNT(*) AS BIGINT) AS n_rows,
      |    CAST(SUM(o_custkey) AS BIGINT) AS sum_cust,
      |    CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
      |  FROM orders
      |  UNION ALL
      |  SELECT 'rng',
      |    CAST(COUNT(*) AS BIGINT),
      |    CAST(SUM(o_custkey) AS BIGINT),
      |    CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
      |  FROM orders WHERE o_orderkey BETWEEN 1000 AND 5000
      |  UNION ALL
      |  SELECT 'v1',
      |    CAST(COUNT(*) AS BIGINT),
      |    CAST(SUM(o_custkey) AS BIGINT),
      |    CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
      |  FROM orders WHERE o_orderkey % 2 = 0)
      |SELECT snap, n_rows, sum_cust, total_price FROM agg
      |ORDER BY snap""".stripMargin) { (s, dir) =>
    val wh = Files.createTempDirectory("graft-qv10-").toString
    new java.io.File(s"$wh/db").mkdirs()
    val cat = s"g10c${q10Counter.incrementAndGet()}"
    s.conf.set(s"spark.sql.catalog.$cat", "graft.sql.GraftCatalog")
    s.conf.set(s"spark.sql.catalog.$cat.warehouse", wh)
    val orders = load(s, dir, "orders")
    val vt = VersionedTable(s, s"$wh/db/orders_v",
      statsColumns = Seq("o_orderkey"))
    // v1 = even order keys; v2 appends the odd ones (head = everything)
    vt.commitOverwrite(orders.filter(col("o_orderkey") % 2 === 0).repartition(4))
    vt.commitAppend(orders.filter(col("o_orderkey") % 2 === 1).repartition(4))
    s.sql(
      s"""SELECT snap, n_rows, sum_cust, total_price FROM (
         |  SELECT 'head' AS snap,
         |    CAST(COUNT(*) AS BIGINT) AS n_rows,
         |    CAST(SUM(o_custkey) AS BIGINT) AS sum_cust,
         |    CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
         |  FROM $cat.db.orders_v
         |  UNION ALL
         |  SELECT 'rng',
         |    CAST(COUNT(*) AS BIGINT),
         |    CAST(SUM(o_custkey) AS BIGINT),
         |    CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
         |  FROM $cat.db.orders_v WHERE o_orderkey BETWEEN 1000 AND 5000
         |  UNION ALL
         |  SELECT 'v1',
         |    CAST(COUNT(*) AS BIGINT),
         |    CAST(SUM(o_custkey) AS BIGINT),
         |    CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
         |  FROM $cat.db.orders_v VERSION AS OF 1)
         |ORDER BY snap""".stripMargin)
  }

  /** The COMPLETE SQL DML lifecycle inside the oracle gate — CTAS,
    * DELETE, UPDATE, canonical MERGE, INSERT, then a pure-SQL read of
    * the head AND the pre-DML snapshot (`VERSION AS OF`). Every
    * mutation is a plain SQL statement against the registered catalog
    * (zero Graft API between CREATE and the final SELECT), and the
    * DuckDB twin replays the five mutations relationally — a hash match
    * pins the row-level semantics of the whole SQL write surface, not
    * just each operator in isolation.
    */
  val qv11 = Q(
    "qv11_sql_dml_lifecycle",
    """WITH base AS (
      |  SELECT o_orderkey, o_custkey, o_totalprice
      |  FROM orders WHERE o_orderkey <= 2000),
      |after_delete AS (
      |  SELECT * FROM base WHERE o_orderkey NOT BETWEEN 500 AND 900),
      |after_update AS (
      |  SELECT o_orderkey, o_custkey,
      |    CASE WHEN o_custkey <= 50 THEN o_totalprice * 2
      |         ELSE o_totalprice END AS o_totalprice
      |  FROM after_delete),
      |merge_src AS (
      |  SELECT o_orderkey, o_custkey, o_totalprice + 1 AS o_totalprice
      |  FROM base WHERE o_orderkey <= 300
      |  UNION ALL
      |  SELECT o_orderkey + 1000000, o_custkey, o_totalprice
      |  FROM base WHERE o_orderkey BETWEEN 100 AND 200),
      |after_merge AS (
      |  SELECT u.* FROM after_update u
      |  WHERE NOT EXISTS (SELECT 1 FROM merge_src s WHERE s.o_orderkey = u.o_orderkey)
      |  UNION ALL SELECT * FROM merge_src),
      |after_insert AS (
      |  SELECT * FROM after_merge
      |  UNION ALL
      |  SELECT o_orderkey + 2000000, o_custkey, o_totalprice
      |  FROM base WHERE o_orderkey BETWEEN 10 AND 50),
      |agg AS (
      |  SELECT 'head' AS snap, CAST(COUNT(*) AS BIGINT) AS n_rows,
      |    CAST(SUM(o_custkey) AS BIGINT) AS sum_cust,
      |    CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
      |  FROM after_insert
      |  UNION ALL
      |  SELECT 'pre_dml', CAST(COUNT(*) AS BIGINT),
      |    CAST(SUM(o_custkey) AS BIGINT),
      |    CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
      |  FROM base)
      |SELECT snap, n_rows, sum_cust, total_price FROM agg
      |ORDER BY snap""".stripMargin) { (s, dir) =>
    val wh = Files.createTempDirectory("graft-qv11-").toString
    new java.io.File(s"$wh/db").mkdirs()
    val cat = s"g11c${q10Counter.incrementAndGet()}"
    s.conf.set(s"spark.sql.catalog.$cat", "graft.sql.GraftCatalog")
    s.conf.set(s"spark.sql.catalog.$cat.warehouse", wh)
    // register the raw table once; every mutation below is plain SQL
    load(s, dir, "orders").createOrReplaceTempView(s"qv11_orders_$cat")
    val src = s"qv11_orders_$cat"
    s.sql(s"""CREATE TABLE $cat.db.o AS
             |SELECT o_orderkey, o_custkey, o_totalprice
             |FROM $src WHERE o_orderkey <= 2000""".stripMargin) // v1 empty + v2 rows
    s.sql(s"DELETE FROM $cat.db.o WHERE o_orderkey BETWEEN 500 AND 900")
    s.sql(s"UPDATE $cat.db.o SET o_totalprice = o_totalprice * 2 WHERE o_custkey <= 50")
    s.sql(s"""MERGE INTO $cat.db.o t
             |USING (
             |  SELECT o_orderkey, o_custkey, o_totalprice + 1 AS o_totalprice
             |  FROM $src WHERE o_orderkey <= 300
             |  UNION ALL
             |  SELECT o_orderkey + 1000000, o_custkey, o_totalprice
             |  FROM $src WHERE o_orderkey BETWEEN 100 AND 200) s
             |ON t.o_orderkey = s.o_orderkey
             |WHEN MATCHED THEN UPDATE SET *
             |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    s.sql(s"""INSERT INTO $cat.db.o
             |SELECT o_orderkey + 2000000, o_custkey, o_totalprice
             |FROM $src WHERE o_orderkey BETWEEN 10 AND 50""".stripMargin)
    s.sql(
      s"""SELECT snap, n_rows, sum_cust, total_price FROM (
         |  SELECT 'head' AS snap, CAST(COUNT(*) AS BIGINT) AS n_rows,
         |    CAST(SUM(o_custkey) AS BIGINT) AS sum_cust,
         |    CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
         |  FROM $cat.db.o
         |  UNION ALL
         |  SELECT 'pre_dml', CAST(COUNT(*) AS BIGINT),
         |    CAST(SUM(o_custkey) AS BIGINT),
         |    CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
         |  FROM $cat.db.o VERSION AS OF 2)
         |ORDER BY snap""".stripMargin)
  }

  /** The FULL SQL `MERGE INTO` clause matrix inside the oracle gate:
    * conditional WHEN MATCHED DELETE + UPDATE with expressions over
    * both rows, a conditional explicit-column INSERT, then a second
    * merge exercising WHEN NOT MATCHED BY SOURCE delete/update — all
    * as plain SQL against the registered catalog, with the DuckDB twin
    * replaying both merges relationally (left joins + anti-joins). A
    * hash match pins first-clause-wins ordering, per-clause conditions,
    * and the not-by-source pass in one shot.
    */
  val qv12 = Q(
    "qv12_sql_merge_matrix",
    """WITH base AS (
      |  SELECT o_orderkey, o_custkey, o_totalprice
      |  FROM orders WHERE o_orderkey <= 2000),
      |src1 AS (
      |  SELECT o_orderkey, o_custkey, o_totalprice + 5 AS o_totalprice
      |  FROM orders WHERE o_orderkey BETWEEN 1500 AND 2500),
      |m1 AS (
      |  SELECT t.o_orderkey, t.o_custkey,
      |    CASE WHEN s.o_orderkey IS NOT NULL AND t.o_custkey % 7 <> 0
      |              AND s.o_custkey % 3 = 0
      |         THEN s.o_totalprice + 10 ELSE t.o_totalprice END AS o_totalprice
      |  FROM base t LEFT JOIN src1 s ON t.o_orderkey = s.o_orderkey
      |  WHERE NOT (s.o_orderkey IS NOT NULL AND t.o_custkey % 7 = 0)),
      |i1 AS (
      |  SELECT s.o_orderkey, s.o_custkey, s.o_totalprice
      |  FROM src1 s LEFT JOIN base t ON t.o_orderkey = s.o_orderkey
      |  WHERE t.o_orderkey IS NULL AND s.o_custkey % 2 = 0),
      |after1 AS (SELECT * FROM m1 UNION ALL SELECT * FROM i1),
      |after2 AS (
      |  SELECT o_orderkey,
      |    CASE WHEN o_orderkey <= 1000 THEN o_custkey + 1000000
      |         ELSE o_custkey END AS o_custkey,
      |    CASE WHEN o_orderkey <= 1000 THEN o_totalprice
      |         ELSE CAST(0 AS DOUBLE) END AS o_totalprice
      |  FROM after1 WHERE o_orderkey <= 2200),
      |agg AS (
      |  SELECT 'head' AS snap, CAST(COUNT(*) AS BIGINT) AS n_rows,
      |    CAST(SUM(o_custkey) AS BIGINT) AS sum_cust,
      |    CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
      |  FROM after2
      |  UNION ALL
      |  SELECT 'mid', CAST(COUNT(*) AS BIGINT),
      |    CAST(SUM(o_custkey) AS BIGINT),
      |    CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
      |  FROM after1
      |  UNION ALL
      |  SELECT 'pre', CAST(COUNT(*) AS BIGINT),
      |    CAST(SUM(o_custkey) AS BIGINT),
      |    CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
      |  FROM base)
      |SELECT snap, n_rows, sum_cust, total_price FROM agg
      |ORDER BY snap""".stripMargin) { (s, dir) =>
    val wh = Files.createTempDirectory("graft-qv12-").toString
    new java.io.File(s"$wh/db").mkdirs()
    val cat = s"g12c${q10Counter.incrementAndGet()}"
    s.conf.set(s"spark.sql.catalog.$cat", "graft.sql.GraftCatalog")
    s.conf.set(s"spark.sql.catalog.$cat.warehouse", wh)
    load(s, dir, "orders").createOrReplaceTempView(s"qv12_orders_$cat")
    val src = s"qv12_orders_$cat"
    s.sql(s"""CREATE TABLE $cat.db.t AS
             |SELECT o_orderkey, o_custkey, o_totalprice
             |FROM $src WHERE o_orderkey <= 2000""".stripMargin) // v1 empty + v2 rows
    // merge 1: conditional DELETE beats conditional UPDATE (clause
    // order), survivors may insert under their own condition
    s.sql(s"""MERGE INTO $cat.db.t t
             |USING (
             |  SELECT o_orderkey, o_custkey, o_totalprice + 5 AS o_totalprice
             |  FROM $src WHERE o_orderkey BETWEEN 1500 AND 2500) s
             |ON t.o_orderkey = s.o_orderkey
             |WHEN MATCHED AND t.o_custkey % 7 = 0 THEN DELETE
             |WHEN MATCHED AND s.o_custkey % 3 = 0
             |  THEN UPDATE SET o_totalprice = s.o_totalprice + 10
             |WHEN NOT MATCHED AND s.o_custkey % 2 = 0
             |  THEN INSERT (o_orderkey, o_custkey, o_totalprice)
             |       VALUES (s.o_orderkey, s.o_custkey, s.o_totalprice)""".stripMargin)
    // merge 2: NOT MATCHED BY SOURCE delete/update matrix
    s.sql(s"""MERGE INTO $cat.db.t t
             |USING (SELECT o_orderkey FROM $src WHERE o_orderkey <= 1000) s
             |ON t.o_orderkey = s.o_orderkey
             |WHEN MATCHED THEN UPDATE SET o_custkey = t.o_custkey + 1000000
             |WHEN NOT MATCHED BY SOURCE AND t.o_orderkey > 2200 THEN DELETE
             |WHEN NOT MATCHED BY SOURCE
             |  THEN UPDATE SET o_totalprice = CAST(0 AS DOUBLE)""".stripMargin)
    s.sql(
      s"""SELECT snap, n_rows, sum_cust, total_price FROM (
         |  SELECT 'head' AS snap, CAST(COUNT(*) AS BIGINT) AS n_rows,
         |    CAST(SUM(o_custkey) AS BIGINT) AS sum_cust,
         |    CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
         |  FROM $cat.db.t
         |  UNION ALL
         |  SELECT 'mid', CAST(COUNT(*) AS BIGINT),
         |    CAST(SUM(o_custkey) AS BIGINT),
         |    CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
         |  FROM $cat.db.t VERSION AS OF 3
         |  UNION ALL
         |  SELECT 'pre', CAST(COUNT(*) AS BIGINT),
         |    CAST(SUM(o_custkey) AS BIGINT),
         |    CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
         |  FROM $cat.db.t VERSION AS OF 2)
         |ORDER BY snap""".stripMargin)
  }

  /** Batch replay of the STREAMING CDC upsert sink (qd23's discipline
    * for [[graft.streaming.Sinks.versionedUpsert]]): the events table
    * splits into three ordered event_id waves, each reduced latest-wins
    * and merged exactly-once via `commitMergeBatch` — including a
    * DELIBERATE replay of wave 1, which must be a marker-detected no-op
    * (its result is inside the hash: a double-applied wave would merge
    * stale rows back over wave 2/3 updates). Because waves are ordered
    * by event_id, the final table state is each user's globally-latest
    * event — which is exactly what the DuckDB twin computes with one
    * window, pinning the whole sink semantics row-for-row.
    */
  val qv13 = Q(
    "qv13_stream_upsert_replay",
    """WITH cdc AS (
      |  SELECT event_id, user_id, event_type, CAST(value AS DOUBLE) AS value
      |  FROM events WHERE user_id IS NOT NULL),
      |ranked AS (
      |  SELECT user_id, event_id, event_type, value,
      |    ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY event_id DESC) AS rn
      |  FROM cdc)
      |SELECT user_id, event_id AS last_event_id, event_type AS last_type,
      |  value AS last_value
      |FROM ranked WHERE rn = 1 ORDER BY user_id""".stripMargin) { (s, dir) =>
    val cdc = load(s, dir, "events")
      .filter(col("user_id").isNotNull)
      .select(col("event_id"), col("user_id"), col("event_type"),
        col("value").cast(DoubleType).as("value"))
    // three ordered waves by event_id range (one bounded scalar agg)
    val maxId = cdc.agg(max(col("event_id"))).head().getLong(0)
    val (t1, t2) = (maxId / 3, 2 * maxId / 3)
    val waves = Seq(
      cdc.filter(col("event_id") <= t1),
      cdc.filter(col("event_id") > t1 && col("event_id") <= t2),
      cdc.filter(col("event_id") > t2))
    val vt = VersionedTable(s,
      Files.createTempDirectory("graft-qv13-").toString)
    waves.zipWithIndex.foreach { case (w, i) =>
      val landed = vt.commitMergeBatch(
        graft.streaming.Sinks.latestWins(w, Seq("user_id"), col("event_id")),
        Seq("user_id"), batchId = i.toLong)
      require(landed.isDefined, s"wave $i must land")
    }
    // the crash-replay: wave 1 again under its original batch id
    require(vt.commitMergeBatch(
      graft.streaming.Sinks.latestWins(waves(1), Seq("user_id"), col("event_id")),
      Seq("user_id"), batchId = 1L).isEmpty,
      "a replayed wave must be a txn-marker no-op")
    vt.read()
      .select(col("user_id"), col("event_id").as("last_event_id"),
        col("event_type").as("last_type"), col("value").as("last_value"))
      .orderBy("user_id")
  }

  /** The row-level CHANGE DATA FEED inside the oracle gate: a table
    * created with `TBLPROPERTIES('graft.enableChangeDataFeed'='true')`
    * takes a scripted INSERT → DELETE → UPDATE → MERGE lifecycle (all
    * plain SQL), then `graft_table_changes` reads every change row —
    * insert / delete / update_preimage / update_postimage, stamped with
    * its commit version — and aggregates per (type, version). The DuckDB
    * twin re-derives each version's change set relationally, so a hash
    * match pins the FEED's row-level contents (which rows changed, how,
    * and when), not just the table's end state (qv11 already pins that).
    */
  val qv14 = Q(
    "qv14_change_data_feed",
    """WITH base AS (
      |  SELECT o_orderkey, o_custkey, o_totalprice
      |  FROM orders WHERE o_orderkey <= 2000),
      |after_delete AS (
      |  SELECT * FROM base WHERE o_orderkey NOT BETWEEN 500 AND 900),
      |after_update AS (
      |  SELECT o_orderkey, o_custkey,
      |    CASE WHEN o_custkey <= 50 THEN o_totalprice * 2
      |         ELSE o_totalprice END AS o_totalprice
      |  FROM after_delete),
      |merge_src AS (
      |  SELECT o_orderkey, o_custkey, o_totalprice + 1 AS o_totalprice
      |  FROM base WHERE o_orderkey <= 300
      |  UNION ALL
      |  SELECT o_orderkey + 1000000, o_custkey, o_totalprice
      |  FROM base WHERE o_orderkey BETWEEN 100 AND 200),
      |changes AS (
      |  SELECT 'insert' AS change_type, 3 AS commit_version, * FROM base
      |  UNION ALL
      |  SELECT 'delete', 4, * FROM base WHERE o_orderkey BETWEEN 500 AND 900
      |  UNION ALL
      |  SELECT 'update_preimage', 5, * FROM after_delete WHERE o_custkey <= 50
      |  UNION ALL
      |  SELECT 'update_postimage', 5, o_orderkey, o_custkey, o_totalprice * 2
      |  FROM after_delete WHERE o_custkey <= 50
      |  UNION ALL
      |  SELECT 'update_preimage', 6, u.* FROM after_update u
      |  WHERE EXISTS (SELECT 1 FROM merge_src s WHERE s.o_orderkey = u.o_orderkey)
      |  UNION ALL
      |  SELECT 'update_postimage', 6, s.* FROM merge_src s
      |  WHERE EXISTS (SELECT 1 FROM after_update u WHERE u.o_orderkey = s.o_orderkey)
      |  UNION ALL
      |  SELECT 'insert', 6, s.* FROM merge_src s
      |  WHERE NOT EXISTS (SELECT 1 FROM after_update u WHERE u.o_orderkey = s.o_orderkey))
      |SELECT change_type, CAST(commit_version AS BIGINT) AS commit_version,
      |  CAST(COUNT(*) AS BIGINT) AS n_rows,
      |  CAST(SUM(o_custkey) AS BIGINT) AS sum_cust,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
      |FROM changes GROUP BY change_type, commit_version
      |ORDER BY commit_version, change_type""".stripMargin) { (s, dir) =>
    val wh = Files.createTempDirectory("graft-qv14-").toString
    new java.io.File(s"$wh/db").mkdirs()
    val cat = s"g14c${q10Counter.incrementAndGet()}"
    s.conf.set(s"spark.sql.catalog.$cat", "graft.sql.GraftCatalog")
    s.conf.set(s"spark.sql.catalog.$cat.warehouse", wh)
    load(s, dir, "orders").createOrReplaceTempView(s"qv14_orders_$cat")
    val src = s"qv14_orders_$cat"
    // CTAS with the CDC property: v1 empty schema + v2 setProperty + v3
    // rows — the property lands BEFORE any data, so the whole history
    // feeds. The version numbering is part of the pinned contract below.
    s.sql(s"""CREATE TABLE $cat.db.c
             |TBLPROPERTIES ('graft.enableChangeDataFeed' = 'true') AS
             |SELECT o_orderkey, o_custkey, o_totalprice
             |FROM $src WHERE o_orderkey <= 2000""".stripMargin)
    s.sql(s"DELETE FROM $cat.db.c WHERE o_orderkey BETWEEN 500 AND 900")
    s.sql(s"UPDATE $cat.db.c SET o_totalprice = o_totalprice * 2 WHERE o_custkey <= 50")
    s.sql(s"""MERGE INTO $cat.db.c t
             |USING (
             |  SELECT o_orderkey, o_custkey, o_totalprice + 1 AS o_totalprice
             |  FROM $src WHERE o_orderkey <= 300
             |  UNION ALL
             |  SELECT o_orderkey + 1000000, o_custkey, o_totalprice
             |  FROM $src WHERE o_orderkey BETWEEN 100 AND 200) s
             |ON t.o_orderkey = s.o_orderkey
             |WHEN MATCHED THEN UPDATE SET *
             |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    require(VersionedTable(s, s"$wh/db/c").currentVersion().contains(6L),
      "qv14's scripted lifecycle must land versions 1..6 — the feed " +
        "window below and the oracle's version literals depend on it")
    s.sql(
      s"""SELECT _change_type AS change_type, _commit_version AS commit_version,
         |  CAST(COUNT(*) AS BIGINT) AS n_rows,
         |  CAST(SUM(o_custkey) AS BIGINT) AS sum_cust,
         |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
         |FROM graft_table_changes('$cat.db.c', 3)
         |GROUP BY change_type, commit_version
         |ORDER BY commit_version, change_type""".stripMargin)
  }

  /** Incremental view maintenance over the change data feed
    * ([[graft.ops.IncrementalAgg]]): gold = COUNT/SUM per group over a
    * CDC-enabled silver, bootstrapped once, then maintained through a
    * delete + update + merge storm by ONE incremental refresh that
    * reads only the feed window. The DuckDB twin computes the aggregate
    * over the relationally-replayed FINAL silver state — a hash match
    * proves the incrementally-maintained gold equals the full
    * recompute, row for row (including groups whose counts moved and
    * sums accumulated in DECIMAL — exact, order-independent).
    */
  val qv15 = Q(
    "qv15_incremental_agg",
    """WITH base AS (
      |  SELECT o_orderkey, o_custkey % 100 AS grp,
      |    CAST(o_totalprice AS DECIMAL(18,2)) AS price
      |  FROM orders WHERE o_orderkey <= 4000),
      |after_delete AS (
      |  SELECT * FROM base WHERE o_orderkey % 7 <> 0),
      |after_update AS (
      |  SELECT o_orderkey, grp,
      |    CASE WHEN grp < 10 THEN CAST(price + 5 AS DECIMAL(18,2))
      |         ELSE price END AS price
      |  FROM after_delete),
      |merge_src AS (
      |  SELECT o_orderkey, grp, CAST(price + 1 AS DECIMAL(18,2)) AS price
      |  FROM base WHERE o_orderkey <= 200
      |  UNION ALL
      |  SELECT o_orderkey + 500000, grp, price
      |  FROM base WHERE o_orderkey BETWEEN 300 AND 500),
      |final AS (
      |  SELECT u.* FROM after_update u
      |  WHERE NOT EXISTS (SELECT 1 FROM merge_src s WHERE s.o_orderkey = u.o_orderkey)
      |  UNION ALL SELECT * FROM merge_src)
      |SELECT grp, CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(price) AS DOUBLE) AS total
      |FROM final GROUP BY grp ORDER BY grp""".stripMargin) { (s, dir) =>
    val tmp = Files.createTempDirectory("graft-qv15-").toString
    val silver = VersionedTable(s, s"$tmp/silver")
    val gold = VersionedTable(s, s"$tmp/gold")
    val base = load(s, dir, "orders").filter(col("o_orderkey") <= 4000)
      .select(col("o_orderkey"), (col("o_custkey") % 100).as("grp"),
        col("o_totalprice").cast(DecimalType(18, 2)).as("price"))
    silver.commitAppend(base)                                        // v1
    silver.setTableProperty("graft.enableChangeDataFeed", "true")    // v2
    def refresh(): Unit = require(graft.ops.IncrementalAgg.refresh(
      gold, silver, Seq("grp"), "n", Map("total" -> col("price"))).isDefined,
      "qv15 refresh must land")
    refresh() // bootstrap: full snapshot, marker at v2
    silver.delete(col("o_orderkey") % 7 === 0)                       // v3
    silver.update(col("grp") < 10, Map("price" -> (col("price") + 5))) // v4
    silver.merge(                                                    // v5
      base.filter(col("o_orderkey") <= 200)
        .select(col("o_orderkey"), col("grp"),
          (col("price") + 1).cast(DecimalType(18, 2)).as("price"))
        .unionByName(base.filter(col("o_orderkey").between(300, 500))
          .select((col("o_orderkey") + 500000).as("o_orderkey"),
            col("grp"), col("price"))),
      Seq("o_orderkey"))
    refresh() // ONE incremental pass over the [v3, v5] feed window
    gold.read()
      .select(col("grp"), col("n"), col("total").cast(DoubleType).as("total"))
      .orderBy("grp")
  }

  /** The DURABLE materialized-view lifecycle, entirely through SQL —
    * qv15's maintained aggregate re-run as a catalog object: `CREATE
    * MATERIALIZED VIEW ... AS SELECT` (the [[graft.sql.GraftSqlParser]]
    * DDL; `CALL graft.system.create_mv` is the procedure twin) extracts
    * the maintainable algebra from the statement, persists it in the
    * view's table properties, and bootstraps; the DML storm lands as
    * plain SQL DELETE/UPDATE/MERGE against the registered catalog; then
    * a bare `REFRESH MATERIALIZED VIEW` maintains from the STORED spec
    * — no algebra re-stated anywhere after creation (the drift vector
    * the loud-refusal parser existed to catch). MIN/MAX are part of the
    * stored spec, so the storm also exercises the bounded dirty-group
    * recompute through the durable path. The DuckDB twin replays the
    * storm relationally and aggregates the final state.
    */
  val qv16 = Q(
    "qv16_mv_durable",
    """WITH base AS (
      |  SELECT o_orderkey, o_custkey % 100 AS grp,
      |    CAST(o_totalprice AS DECIMAL(18,2)) AS price
      |  FROM orders WHERE o_orderkey <= 4000),
      |after_delete AS (
      |  SELECT * FROM base WHERE o_orderkey NOT BETWEEN 500 AND 900),
      |after_update AS (
      |  SELECT o_orderkey, grp,
      |    CASE WHEN grp < 10 THEN CAST(price + 5 AS DECIMAL(18,2))
      |         ELSE price END AS price
      |  FROM after_delete),
      |merge_src AS (
      |  SELECT o_orderkey, grp, CAST(price + 1 AS DECIMAL(18,2)) AS price
      |  FROM base WHERE o_orderkey <= 200
      |  UNION ALL
      |  SELECT o_orderkey + 500000, grp, price
      |  FROM base WHERE o_orderkey BETWEEN 300 AND 500),
      |final AS (
      |  SELECT u.* FROM after_update u
      |  WHERE NOT EXISTS (SELECT 1 FROM merge_src s WHERE s.o_orderkey = u.o_orderkey)
      |  UNION ALL SELECT * FROM merge_src)
      |SELECT grp, CAST(COUNT(*) AS BIGINT) AS n,
      |  CAST(SUM(price) AS DOUBLE) AS total,
      |  CAST(MIN(price) AS DOUBLE) AS lo,
      |  CAST(MAX(price) AS DOUBLE) AS hi
      |FROM final GROUP BY grp ORDER BY grp""".stripMargin) { (s, dir) =>
    val wh = Files.createTempDirectory("graft-qv16-").toString
    new java.io.File(s"$wh/db").mkdirs()
    val cat = s"g16c${q10Counter.incrementAndGet()}"
    s.conf.set(s"spark.sql.catalog.$cat", "graft.sql.GraftCatalog")
    s.conf.set(s"spark.sql.catalog.$cat.warehouse", wh)
    val src = VersionedTable(s, s"$wh/db/src")
    src.commitAppend(load(s, dir, "orders").filter(col("o_orderkey") <= 4000)
      .select(col("o_orderkey"), (col("o_custkey") % 100).as("grp"),
        col("o_totalprice").cast(DecimalType(18, 2)).as("price")))    // v1
    src.setTableProperty("graft.enableChangeDataFeed", "true")        // v2
    s.sql(
      s"""CREATE MATERIALIZED VIEW $cat.db.mv AS
         |SELECT grp, COUNT(*) AS n, SUM(price) AS total,
         |  MIN(price) AS lo, MAX(price) AS hi
         |FROM $cat.db.src GROUP BY grp""".stripMargin).collect()
    // the storm: plain SQL DML against the catalog (no Graft API)
    s.sql(s"DELETE FROM $cat.db.src WHERE o_orderkey BETWEEN 500 AND 900").collect()
    s.sql(s"UPDATE $cat.db.src SET price = price + 5 WHERE grp < 10").collect()
    s.sql(
      s"""MERGE INTO $cat.db.src t USING (
         |  SELECT o_orderkey, grp, CAST(price + 1 AS DECIMAL(18,2)) AS price
         |  FROM $cat.db.src VERSION AS OF 1 WHERE o_orderkey <= 200
         |  UNION ALL
         |  SELECT o_orderkey + 500000, grp, price
         |  FROM $cat.db.src VERSION AS OF 1 WHERE o_orderkey BETWEEN 300 AND 500
         |) s ON t.o_orderkey = s.o_orderkey
         |WHEN MATCHED THEN UPDATE SET *
         |WHEN NOT MATCHED THEN INSERT *""".stripMargin).collect()
    // bare refresh: the stored definition is the only algebra in play
    s.sql(s"REFRESH MATERIALIZED VIEW $cat.db.mv").collect()
    s.sql(
      s"""SELECT grp, n, CAST(total AS DOUBLE) AS total,
         |  CAST(lo AS DOUBLE) AS lo, CAST(hi AS DOUBLE) AS hi
         |FROM $cat.db.mv ORDER BY grp""".stripMargin)
  }

  /** CLONE isolation: snapshot-clone a versioned table, then mutate the
    * SOURCE past the clone point (delete + append) and VACUUM its
    * history away — the clone must still aggregate exactly the pinned
    * snapshot (hard-linked storage is immune to the source's vacuum,
    * the sharp edge Delta documents for path-referencing shallow
    * clones). The oracle aggregates the pre-mutation subset directly:
    * any leakage from the source's later life — or a byte lost to its
    * vacuum — breaks the hash.
    */
  val qv17 = Q(
    "qv17_clone_isolation",
    """SELECT o_orderstatus, CAST(COUNT(*) AS BIGINT) AS n_orders,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
      |FROM orders WHERE o_orderkey % 3 = 0
      |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin) { (s, dir) =>
    val orders = load(s, dir, "orders")
    val src = VersionedTable(s, Files.createTempDirectory("graft-qv17s-").toString)
    src.commitOverwrite(orders.filter(col("o_orderkey") % 3 === 0).select(
      col("o_orderkey"), col("o_orderstatus"),
      col("o_totalprice").cast(DoubleType).as("price")))
    val clone = src.cloneTo(Files.createTempDirectory("graft-qv17c-").toString)
    // the source moves on and erases the cloned snapshot from its log
    src.delete(col("o_orderkey") % 2 === 0)
    src.commitAppend(orders.filter(col("o_orderkey") % 3 =!= 0)
      .limit(100).select(
        col("o_orderkey"), col("o_orderstatus"),
        col("o_totalprice").cast(DoubleType).as("price")))
    src.vacuum(keepVersions = 1)
    clone.read()
      .groupBy("o_orderstatus")
      .agg(count(lit(1)).as("n_orders"), dsum(col("price")).as("total_price"))
      .orderBy("o_orderstatus")
  }

  /** JOIN-SHAPED durable materialized view, entirely through SQL — the
    * r15 DDL surface: `CREATE MATERIALIZED VIEW ... AS SELECT <derived
    * null-safe key>, COUNT/SUM/MIN/MAX FROM fact LEFT JOIN dim USING
    * (pk) WHERE <row-local filter> GROUP BY <key>` (the reference's own
    * gold-model shape, `03_gold_aggregate.py:78-110`). The storm hits
    * BOTH sides: fact DML (delete, two WHERE-boundary-crossing updates)
    * and a DIMENSION storm (a group-migrating update, a dim-row death
    * dropping its facts to UNKNOWN, a late-arriving dim row lifting its
    * facts out of UNKNOWN) — then ONE bare `REFRESH MATERIALIZED VIEW`
    * repairs the dimension by the generic retract/re-add rule and
    * applies the fact feed window, cursors pinned atomically. The
    * DuckDB twin replays both storms relationally and aggregates the
    * final join.
    */
  val qv18 = Q(
    "qv18_mv_join_shaped",
    """WITH fact0 AS (
      |  SELECT o_orderkey AS okey, o_orderkey % 40 AS pk,
      |    o_orderkey % 20 AS qty, CAST(o_totalprice AS DECIMAL(18,2)) AS price
      |  FROM orders WHERE o_orderkey <= 4000),
      |fact1 AS (SELECT * FROM fact0 WHERE okey NOT BETWEEN 700 AND 1200),
      |fact2 AS (SELECT okey, pk,
      |  CASE WHEN qty = 3 THEN 0 WHEN qty = 1 THEN 9 ELSE qty END AS qty, price
      |  FROM fact1),
      |dim0 AS (SELECT c_custkey AS pk, c_mktsegment AS brand
      |  FROM customer WHERE c_custkey <= 30),
      |dim1 AS (SELECT pk, CASE WHEN pk < 10 THEN 'MIGRATED' ELSE brand END AS brand
      |  FROM dim0 WHERE pk NOT BETWEEN 12 AND 18),
      |dim2 AS (SELECT * FROM dim1 UNION ALL
      |  SELECT pk, 'LATE' AS brand FROM (VALUES (31),(32),(33),(34),(35)) v(pk))
      |SELECT coalesce(brand, 'UNKNOWN') AS brand_key,
      |  CAST(COUNT(*) AS BIGINT) AS n,
      |  CAST(SUM(price) AS DOUBLE) AS total,
      |  CAST(MIN(price) AS DOUBLE) AS lo,
      |  CAST(MAX(price) AS DOUBLE) AS hi
      |FROM fact2 LEFT JOIN dim2 USING (pk)
      |WHERE qty > 2
      |GROUP BY brand_key ORDER BY brand_key""".stripMargin) { (s, dir) =>
    val wh = Files.createTempDirectory("graft-qv18-").toString
    new java.io.File(s"$wh/db").mkdirs()
    val cat = s"g18c${q10Counter.incrementAndGet()}"
    s.conf.set(s"spark.sql.catalog.$cat", "graft.sql.GraftCatalog")
    s.conf.set(s"spark.sql.catalog.$cat.warehouse", wh)
    val fact = VersionedTable(s, s"$wh/db/fact")
    fact.commitAppend(load(s, dir, "orders").filter(col("o_orderkey") <= 4000)
      .select(col("o_orderkey").as("okey"),
        (col("o_orderkey") % 40).as("pk"),
        (col("o_orderkey") % 20).as("qty"),
        col("o_totalprice").cast(DecimalType(18, 2)).as("price")))
    fact.setTableProperty("graft.enableChangeDataFeed", "true")
    val dimT = VersionedTable(s, s"$wh/db/dim")
    dimT.commitAppend(load(s, dir, "customer").filter(col("c_custkey") <= 30)
      .select(col("c_custkey").as("pk"), col("c_mktsegment").as("brand")))
    dimT.setTableProperty("graft.enableChangeDataFeed", "true")
    s.sql(
      s"""CREATE MATERIALIZED VIEW $cat.db.mv AS
         |SELECT coalesce(brand, 'UNKNOWN') AS brand_key,
         |  COUNT(*) AS n, SUM(price) AS total,
         |  MIN(price) AS lo, MAX(price) AS hi
         |FROM $cat.db.fact LEFT JOIN $cat.db.dim USING (pk)
         |WHERE qty > 2
         |GROUP BY brand_key""".stripMargin).collect()
    // fact storm: plain SQL DML (two updates cross the WHERE boundary)
    s.sql(s"DELETE FROM $cat.db.fact WHERE okey BETWEEN 700 AND 1200").collect()
    s.sql(s"UPDATE $cat.db.fact SET qty = 0 WHERE qty = 3").collect()
    s.sql(s"UPDATE $cat.db.fact SET qty = 9 WHERE qty = 1").collect()
    // dimension storm: migration, death, late arrival
    s.sql(s"UPDATE $cat.db.dim SET brand = 'MIGRATED' WHERE pk < 10").collect()
    s.sql(s"DELETE FROM $cat.db.dim WHERE pk BETWEEN 12 AND 18").collect()
    s.sql(
      s"""MERGE INTO $cat.db.dim t USING (
         |  SELECT CAST(pk AS BIGINT) AS pk, 'LATE' AS brand
         |  FROM VALUES (31),(32),(33),(34),(35) AS v(pk)
         |) s ON t.pk = s.pk WHEN NOT MATCHED THEN INSERT *""".stripMargin)
      .collect()
    // ONE bare refresh: dimension repair, then the fact feed window
    s.sql(s"REFRESH MATERIALIZED VIEW $cat.db.mv").collect()
    s.sql(
      s"""SELECT brand_key, n, CAST(total AS DOUBLE) AS total,
         |  CAST(lo AS DOUBLE) AS lo, CAST(hi AS DOUBLE) AS hi
         |FROM $cat.db.mv ORDER BY brand_key""".stripMargin)
  }

  /** MV-OVER-MV, entirely through SQL — the r16 cascade surface: level 1
    * is a maintained aggregate over the fact table, level 2 is a
    * maintained aggregate over LEVEL 1 (grouping by a derived key), the
    * reference's customer_360 shape (`03_gold_aggregate.py:226-272` — an
    * aggregate consuming another aggregate's change feed). The storm
    * hits the BASE only (delete retiring per-group extremes, an update
    * storm, inserts creating new level-1 groups); then ONE bare
    * `REFRESH MATERIALIZED VIEW` of LEVEL 2 repairs the whole cascade —
    * level 1 from the fact feed window, level 2 from level 1's own
    * change feed, extremes re-derived by the bounded dirty-group
    * recompute at both levels. The DuckDB twin replays the storm
    * relationally and recomputes the two-level rollup.
    */
  val qv19 = Q(
    "qv19_mv_cascade",
    """WITH fact0 AS (
      |  SELECT o_orderkey AS okey, o_orderkey % 500 AS skey,
      |    o_orderkey % 20 AS qty, CAST(o_totalprice AS DECIMAL(18,2)) AS price
      |  FROM orders WHERE o_orderkey <= 6000),
      |fact1 AS (SELECT * FROM fact0 WHERE okey NOT BETWEEN 1000 AND 1500),
      |fact2 AS (SELECT okey, skey, qty,
      |  CASE WHEN qty = 5 THEN CAST(price + 1000 AS DECIMAL(18,2))
      |       ELSE price END AS price
      |  FROM fact1),
      |l1 AS (SELECT skey, CAST(COUNT(*) AS BIGINT) AS n_rows,
      |    SUM(price) AS rev, MAX(qty) AS max_qty
      |  FROM fact2 GROUP BY skey),
      |l2 AS (SELECT skey % 10 AS bucket, CAST(COUNT(*) AS BIGINT) AS n_groups,
      |    CAST(SUM(rev) AS DOUBLE) AS total_rev,
      |    CAST(MIN(n_rows) AS BIGINT) AS min_rows,
      |    CAST(MAX(max_qty) AS BIGINT) AS max_q
      |  FROM l1 GROUP BY bucket)
      |SELECT bucket, n_groups, total_rev, min_rows, max_q
      |FROM l2 ORDER BY bucket""".stripMargin) { (s, dir) =>
    val wh = Files.createTempDirectory("graft-qv19-").toString
    new java.io.File(s"$wh/db").mkdirs()
    val cat = s"g19c${q10Counter.incrementAndGet()}"
    s.conf.set(s"spark.sql.catalog.$cat", "graft.sql.GraftCatalog")
    s.conf.set(s"spark.sql.catalog.$cat.warehouse", wh)
    val fact = VersionedTable(s, s"$wh/db/fact")
    fact.commitAppend(load(s, dir, "orders").filter(col("o_orderkey") <= 6000)
      .select(col("o_orderkey").as("okey"),
        (col("o_orderkey") % 500).as("skey"),
        (col("o_orderkey") % 20).as("qty"),
        col("o_totalprice").cast(DecimalType(18, 2)).as("price")))
    fact.setTableProperty("graft.enableChangeDataFeed", "true")
    s.sql(
      s"""CREATE MATERIALIZED VIEW $cat.db.l1 AS
         |SELECT skey, COUNT(*) AS n_rows, SUM(price) AS rev,
         |  MAX(qty) AS max_qty
         |FROM $cat.db.fact GROUP BY skey""".stripMargin).collect()
    s.sql(
      s"""CREATE MATERIALIZED VIEW $cat.db.l2 AS
         |SELECT skey % 10 AS bucket, COUNT(*) AS n_groups,
         |  SUM(rev) AS total_rev, MIN(n_rows) AS min_rows,
         |  MAX(max_qty) AS max_q
         |FROM $cat.db.l1 GROUP BY bucket""".stripMargin).collect()
    // base storm: plain SQL DML against the FACT only
    s.sql(s"DELETE FROM $cat.db.fact WHERE okey BETWEEN 1000 AND 1500").collect()
    s.sql(s"UPDATE $cat.db.fact SET price = CAST(price + 1000 AS DECIMAL(18,2)) " +
      "WHERE qty = 5").collect()
    // ONE bare refresh of the TOP view repairs the whole cascade
    s.sql(s"REFRESH MATERIALIZED VIEW $cat.db.l2").collect()
    s.sql(
      s"""SELECT bucket, n_groups, CAST(total_rev AS DOUBLE) AS total_rev,
         |  CAST(min_rows AS BIGINT) AS min_rows,
         |  CAST(max_q AS BIGINT) AS max_q
         |FROM $cat.db.l2 ORDER BY bucket""".stripMargin)
  }

  /** The reference's product_metrics COMPOSE, fully declarative — two
    * maintained aggregates over two independent facts plus a durable
    * `CREATE VIEW` that full-outer-joins them, zero-fills, and LEFT-joins
    * the dimension (`03_gold/03_gold_aggregate.py:78-108`'s exact
    * shape: event metrics ⟗ order metrics ⟕ dims). The view re-plans at
    * read, so after a storm on BOTH facts + two bare REFRESHes it is
    * exactly as fresh as the aggregates under it — the r16 answer to
    * "the MV DDL can't declare product_metrics": two MVs + one view,
    * zero Scala. The DuckDB twin replays the storms and computes the
    * same compose relationally.
    */
  val qv20 = Q(
    "qv20_view_compose_mvs",
    """WITH fa0 AS (
      |  SELECT o_orderkey AS okey, o_orderkey % 120 AS pk
      |  FROM orders WHERE o_orderkey <= 5000),
      |fa AS (SELECT * FROM fa0 WHERE okey NOT BETWEEN 2000 AND 2400),
      |fb0 AS (
      |  SELECT o_orderkey AS okey, o_orderkey % 90 AS pk,
      |    CAST(o_totalprice AS DECIMAL(18,2)) AS price,
      |    o_orderkey % 7 AS units
      |  FROM orders WHERE o_orderkey <= 3000),
      |fb AS (SELECT okey, pk,
      |    CASE WHEN units = 2 THEN CAST(price * 2 AS DECIMAL(18,2))
      |         ELSE price END AS price, units
      |  FROM fb0),
      |dim AS (SELECT c_custkey AS pk, c_mktsegment AS brand
      |  FROM customer WHERE c_custkey <= 80),
      |ma AS (SELECT pk, CAST(COUNT(*) AS BIGINT) AS n_a,
      |    CAST(SUM(CASE WHEN okey % 3 = 0 THEN 1 ELSE 0 END) AS BIGINT)
      |      AS view_count
      |  FROM fa GROUP BY pk),
      |mb AS (SELECT pk, CAST(COUNT(*) AS BIGINT) AS n_b,
      |    SUM(price) AS revenue, CAST(SUM(units) AS BIGINT) AS units
      |  FROM fb GROUP BY pk)
      |SELECT pk, coalesce(brand, 'UNKNOWN') AS brand,
      |  CAST(coalesce(n_a, 0) AS BIGINT) AS n_events,
      |  CAST(coalesce(view_count, 0) AS BIGINT) AS view_count,
      |  CAST(coalesce(n_b, 0) AS BIGINT) AS n_orders,
      |  CAST(coalesce(revenue, 0) AS DOUBLE) AS revenue,
      |  CAST(coalesce(units, 0) AS BIGINT) AS units
      |FROM ma FULL OUTER JOIN mb USING (pk) LEFT JOIN dim USING (pk)
      |ORDER BY pk""".stripMargin) { (s, dir) =>
    val wh = Files.createTempDirectory("graft-qv20-").toString
    new java.io.File(s"$wh/db").mkdirs()
    val cat = s"g20c${q10Counter.incrementAndGet()}"
    s.conf.set(s"spark.sql.catalog.$cat", "graft.sql.GraftCatalog")
    s.conf.set(s"spark.sql.catalog.$cat.warehouse", wh)
    val orders = load(s, dir, "orders")
    val fa = VersionedTable(s, s"$wh/db/fa")
    fa.commitAppend(orders.filter(col("o_orderkey") <= 5000)
      .select(col("o_orderkey").as("okey"), (col("o_orderkey") % 120).as("pk")))
    fa.setTableProperty("graft.enableChangeDataFeed", "true")
    val fb = VersionedTable(s, s"$wh/db/fb")
    fb.commitAppend(orders.filter(col("o_orderkey") <= 3000)
      .select(col("o_orderkey").as("okey"), (col("o_orderkey") % 90).as("pk"),
        col("o_totalprice").cast(DecimalType(18, 2)).as("price"),
        (col("o_orderkey") % 7).as("units")))
    fb.setTableProperty("graft.enableChangeDataFeed", "true")
    val dim = VersionedTable(s, s"$wh/db/dim")
    dim.commitAppend(load(s, dir, "customer").filter(col("c_custkey") <= 80)
      .select(col("c_custkey").as("pk"), col("c_mktsegment").as("brand")))
    s.sql(
      s"""CREATE MATERIALIZED VIEW $cat.db.ma AS
         |SELECT pk, COUNT(*) AS n_a,
         |  SUM(CASE WHEN okey % 3 = 0 THEN 1 ELSE 0 END) AS view_count
         |FROM $cat.db.fa GROUP BY pk""".stripMargin).collect()
    s.sql(
      s"""CREATE MATERIALIZED VIEW $cat.db.mb AS
         |SELECT pk, COUNT(*) AS n_b, SUM(price) AS revenue,
         |  SUM(units) AS units
         |FROM $cat.db.fb GROUP BY pk""".stripMargin).collect()
    // the durable compose view — the reference's product_metrics select
    s.sql(
      s"""CREATE VIEW $cat.db.pm AS
         |SELECT pk, coalesce(brand, 'UNKNOWN') AS brand,
         |  CAST(coalesce(n_a, 0) AS BIGINT) AS n_events,
         |  CAST(coalesce(view_count, 0) AS BIGINT) AS view_count,
         |  CAST(coalesce(n_b, 0) AS BIGINT) AS n_orders,
         |  CAST(coalesce(revenue, 0) AS DOUBLE) AS revenue,
         |  CAST(coalesce(units, 0) AS BIGINT) AS units
         |FROM $cat.db.ma FULL OUTER JOIN $cat.db.mb USING (pk)
         |LEFT JOIN $cat.db.dim USING (pk)""".stripMargin).collect()
    // storms on BOTH facts, then two bare refreshes
    s.sql(s"DELETE FROM $cat.db.fa WHERE okey BETWEEN 2000 AND 2400").collect()
    s.sql(s"UPDATE $cat.db.fb SET price = CAST(price * 2 AS DECIMAL(18,2)) " +
      "WHERE units = 2").collect()
    s.sql(s"REFRESH MATERIALIZED VIEW $cat.db.ma").collect()
    s.sql(s"REFRESH MATERIALIZED VIEW $cat.db.mb").collect()
    s.sql(s"SELECT * FROM $cat.db.pm ORDER BY pk")
  }

  /** AVG / COUNT(expr) in MV DDL (r17) — the reference's review_metrics
    * is `avg(rating)` + a conditional count (`03_gold/03_gold_aggregate
    * .py:70-75`); r16 refused both with a manual-decomposition hint.
    * Now the parser decomposes mechanically: AVG(x) → two maintained
    * sums (SUM(x) + non-null count) under reserved hidden names with
    * the catalog READ face deriving sum/NULLIF(count,0) and hiding the
    * carriers; COUNT(expr) → SUM(CASE WHEN expr IS NOT NULL...). The
    * storm exercises the null edges that make AVG non-trivial: deletes
    * retract, an UPDATE flips values to NULL (avg must drop them), and
    * one group goes all-NULL (avg = NULL, not 0/0). DuckDB recomputes
    * the final state relationally.
    */
  val qv21 = Q(
    "qv21_mv_avg_rewrite",
    """WITH f0 AS (
      |  SELECT o_orderkey AS okey, o_orderkey % 100 AS pk,
      |    CASE WHEN o_orderkey % 7 = 0 THEN NULL
      |         ELSE o_orderkey % 5 + 1 END AS rating,
      |    CASE WHEN o_orderkey % 3 = 0 THEN 'y' ELSE NULL END AS vr,
      |    o_orderkey % 9 AS units
      |  FROM orders WHERE o_orderkey <= 6000),
      |f1 AS (SELECT * FROM f0 WHERE okey NOT BETWEEN 1200 AND 1700),
      |f AS (SELECT okey, pk,
      |    CASE WHEN units = 4 THEN NULL
      |         WHEN units = 2 THEN 5 ELSE rating END AS rating, vr, units
      |  FROM f1)
      |SELECT pk, CAST(COUNT(*) AS BIGINT) AS n_reviews,
      |  CAST(AVG(rating) AS DOUBLE) AS avg_rating,
      |  CAST(COUNT(vr) AS BIGINT) AS n_verified,
      |  CAST(SUM(units) AS BIGINT) AS total_units
      |FROM f GROUP BY pk ORDER BY pk""".stripMargin) { (s, dir) =>
    val wh = Files.createTempDirectory("graft-qv21-").toString
    new java.io.File(s"$wh/db").mkdirs()
    val cat = s"g21c${q10Counter.incrementAndGet()}"
    s.conf.set(s"spark.sql.catalog.$cat", "graft.sql.GraftCatalog")
    s.conf.set(s"spark.sql.catalog.$cat.warehouse", wh)
    val fact = VersionedTable(s, s"$wh/db/fact")
    fact.commitAppend(load(s, dir, "orders").filter(col("o_orderkey") <= 6000)
      .select(col("o_orderkey").as("okey"),
        (col("o_orderkey") % 100).as("pk"),
        when(col("o_orderkey") % 7 === 0, lit(null))
          .otherwise(col("o_orderkey") % 5 + 1).as("rating"),
        when(col("o_orderkey") % 3 === 0, lit("y")).as("vr"),
        (col("o_orderkey") % 9).as("units")))
    fact.setTableProperty("graft.enableChangeDataFeed", "true")
    s.sql(
      s"""CREATE MATERIALIZED VIEW $cat.db.rm AS
         |SELECT pk, COUNT(*) AS n_reviews, AVG(rating) AS avg_rating,
         |  COUNT(vr) AS n_verified, SUM(units) AS total_units
         |FROM $cat.db.fact GROUP BY pk""".stripMargin).collect()
    // the storm: retract a range, flip one stratum's ratings to NULL,
    // pin another stratum to 5
    s.sql(s"DELETE FROM $cat.db.fact WHERE okey BETWEEN 1200 AND 1700").collect()
    s.sql(s"UPDATE $cat.db.fact SET rating = NULL WHERE units = 4").collect()
    s.sql(s"UPDATE $cat.db.fact SET rating = 5 WHERE units = 2").collect()
    s.sql(s"REFRESH MATERIALIZED VIEW $cat.db.rm").collect()
    // the read face hides the decomposition carriers
    val visible = s.table(s"$cat.db.rm").columns
    require(!visible.exists(_.startsWith("__mv_")),
      s"hidden decomposition columns leaked into the read face: " +
        visible.mkString(", "))
    require(visible.contains("avg_rating"),
      s"avg_rating missing from the read face: ${visible.mkString(", ")}")
    s.sql(
      s"""SELECT pk, CAST(n_reviews AS BIGINT) AS n_reviews,
         |  CAST(avg_rating AS DOUBLE) AS avg_rating,
         |  CAST(n_verified AS BIGINT) AS n_verified,
         |  CAST(total_units AS BIGINT) AS total_units
         |FROM $cat.db.rm ORDER BY pk""".stripMargin)
  }

  /** MV observability (r17): `graft_materialized_views('<wh>')` — one
    * row per stored MV spec with refresh-cursor vs source-head
    * staleness, all from manifests/txn markers (zero jobs). The query
    * walks a two-level cascade through a storm and observes the lag at
    * three points: after the fact storm (level 1 stale by exactly the
    * two DML commits, level 2 fresh — ITS source hasn't moved), after
    * refreshing ONLY level 1 (level 1 fresh, level 2 now stale by the
    * one merge commit the refresh landed), and after the bare top-level
    * refresh (everything fresh). Version arithmetic is deterministic,
    * so the DuckDB twin is the literal expected table.
    */
  val qv22 = Q(
    "qv22_mv_staleness",
    """SELECT * FROM (VALUES
      |  ('p1_storm', 'ml1', CAST(2 AS BIGINT), true),
      |  ('p1_storm', 'ml2', CAST(0 AS BIGINT), false),
      |  ('p2_l1_refreshed', 'ml1', CAST(0 AS BIGINT), false),
      |  ('p2_l1_refreshed', 'ml2', CAST(1 AS BIGINT), true),
      |  ('p3_top_refreshed', 'ml1', CAST(0 AS BIGINT), false),
      |  ('p3_top_refreshed', 'ml2', CAST(0 AS BIGINT), false)
      |) t(phase, view, lag, stale)
      |ORDER BY phase, view""".stripMargin) { (s, dir) =>
    val wh = Files.createTempDirectory("graft-qv22-").toString
    new java.io.File(s"$wh/db").mkdirs()
    val cat = s"g22c${q10Counter.incrementAndGet()}"
    s.conf.set(s"spark.sql.catalog.$cat", "graft.sql.GraftCatalog")
    s.conf.set(s"spark.sql.catalog.$cat.warehouse", wh)
    val fact = VersionedTable(s, s"$wh/db/mfact")
    fact.commitAppend(load(s, dir, "orders").filter(col("o_orderkey") <= 4000)
      .select(col("o_orderkey").as("okey"),
        (col("o_orderkey") % 200).as("skey"),
        (col("o_orderkey") % 11).as("qty")))
    fact.setTableProperty("graft.enableChangeDataFeed", "true")
    s.sql(
      s"""CREATE MATERIALIZED VIEW $cat.db.ml1 AS
         |SELECT skey, COUNT(*) AS n_rows, SUM(qty) AS total_qty
         |FROM $cat.db.mfact GROUP BY skey""".stripMargin).collect()
    s.sql(
      s"""CREATE MATERIALIZED VIEW $cat.db.ml2 AS
         |SELECT skey % 10 AS bucket, COUNT(*) AS n_groups,
         |  SUM(total_qty) AS bucket_qty
         |FROM $cat.db.ml1 GROUP BY bucket""".stripMargin).collect()
    def observe(phase: String) = s.sql(
      s"""SELECT '$phase' AS phase, view,
         |  CAST(source_head - coalesce(refreshed_source_version, 0) AS BIGINT)
         |    AS lag, stale
         |FROM graft_materialized_views('$wh')""".stripMargin)
    // the storm: two DML commits on the fact only
    s.sql(s"DELETE FROM $cat.db.mfact WHERE okey BETWEEN 500 AND 900").collect()
    s.sql(s"UPDATE $cat.db.mfact SET qty = qty + 1 WHERE qty = 3").collect()
    val p1 = observe("p1_storm")
    s.sql(s"REFRESH MATERIALIZED VIEW $cat.db.ml1").collect()
    val p2 = observe("p2_l1_refreshed")
    s.sql(s"REFRESH MATERIALIZED VIEW $cat.db.ml2").collect()
    val p3 = observe("p3_top_refreshed")
    p1.unionAll(p2).unionAll(p3)
      .select(col("phase"), col("view"), col("lag"), col("stale"))
      .orderBy("phase", "view")
  }

  /** The SHOW / DESCRIBE MATERIALIZED VIEW statements inside the oracle
    * gate (r17 — the TVF face is qv22): two MVs over one fact, a storm,
    * one refresh — SHOW's (view, stale) rows and DESCRIBE's
    * deterministic property rows (keys, count column, cursor, head,
    * stale) are pinned against a literal table. Version arithmetic:
    * fact append=v1, CDF property=v2 (both MVs bootstrap with cursor 2),
    * the storm's one DML=v3; refreshing sm1 moves ITS cursor to 3, sm2
    * stays at 2 and reads stale.
    */
  val qv23 = Q(
    "qv23_mv_show_describe",
    """SELECT * FROM (VALUES
      |  ('describe:sm2:count_col', 'n2'),
      |  ('describe:sm2:keys', 'pk'),
      |  ('describe:sm2:refreshed_source_version', '2'),
      |  ('describe:sm2:source_head', '3'),
      |  ('describe:sm2:stale', 'true'),
      |  ('show:sm1', 'false'),
      |  ('show:sm2', 'true')
      |) t(k, v)
      |ORDER BY k""".stripMargin) { (s, dir) =>
    val wh = Files.createTempDirectory("graft-qv23-").toString
    new java.io.File(s"$wh/db").mkdirs()
    val cat = s"g23c${q10Counter.incrementAndGet()}"
    s.conf.set(s"spark.sql.catalog.$cat", "graft.sql.GraftCatalog")
    s.conf.set(s"spark.sql.catalog.$cat.warehouse", wh)
    val fact = VersionedTable(s, s"$wh/db/sfact")
    fact.commitAppend(load(s, dir, "orders").filter(col("o_orderkey") <= 3000)
      .select(col("o_orderkey").as("okey"),
        (col("o_orderkey") % 60).as("pk"),
        (col("o_orderkey") % 13).as("qty")))
    fact.setTableProperty("graft.enableChangeDataFeed", "true")
    s.sql(s"CREATE MATERIALIZED VIEW $cat.db.sm1 AS " +
      s"SELECT pk, COUNT(*) AS n1, SUM(qty) AS t1 FROM $cat.db.sfact " +
      "GROUP BY pk").collect()
    s.sql(s"CREATE MATERIALIZED VIEW $cat.db.sm2 AS " +
      s"SELECT pk, COUNT(*) AS n2, MAX(qty) AS m2 FROM $cat.db.sfact " +
      "GROUP BY pk").collect()
    s.sql(s"DELETE FROM $cat.db.sfact WHERE okey BETWEEN 100 AND 400").collect()
    s.sql(s"REFRESH MATERIALIZED VIEW $cat.db.sm1").collect()
    val shown = s.sql(s"SHOW MATERIALIZED VIEWS IN $cat.db")
      .select(concat(lit("show:"), col("view")).as("k"),
        col("stale").cast("string").as("v"))
    val described = s.sql(s"DESCRIBE MATERIALIZED VIEW $cat.db.sm2")
      .filter(col("property").isin(
        "keys", "count_col", "refreshed_source_version", "source_head",
        "stale"))
      .select(concat(lit("describe:sm2:"), col("property")).as("k"),
        col("value").as("v"))
    shown.unionAll(described).orderBy("k")
  }

  val all: Seq[Q] =
    Seq(qv01, qv02, qv03, qv04, qv05, qv06, qv07, qv08, qv09, qv10, qv11, qv12,
      qv13, qv14, qv15, qv16, qv17, qv18, qv19, qv20, qv21, qv22, qv23)
}
