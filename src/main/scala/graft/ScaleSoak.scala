package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** 10× scale soak: synthesize an sf1 dataset from sf0.1 (ten key-shifted
  * copies per table), run the heavy query families at BOTH scales, and
  * emit per-query scaling factors — the empirical check behind every
  * "scales linearly by design" claim in SURVEY/VERDICT. Anything
  * super-linear here needs a named cause or a fix.
  *
  * Synthesis preserves each copy's internal structure and DECORRELATES
  * copies from each other, so workload density per row stays constant
  * (the property a real 10× corpus has):
  *  - fact/dim keys shift by copy × stride, so referential integrity
  *    holds and entity cardinalities grow 10× (users, orders, docs);
  *  - document text gets a per-copy token suffix — shingle/MinHash
  *    near-dup families repeat PER COPY but share nothing across
  *    copies (un-suffixed copies would make every doc a 10-way exact
  *    dup and quadratically explode pair queries by construction);
  *  - embeddings cyclically rotate by the copy index — an orthogonal
  *    permutation, so within-copy geometry (and every distance
  *    distribution) is exactly preserved while cross-copy cosines
  *    decorrelate.
  *
  * Usage: sbt "runMain graft.ScaleSoak /root/testdata/sf0.1 SOAK.json"
  * (SPARK_GRAFT_CPUS and GRAFT_SOAK_DIR env knobs; synthesis is skipped
  * if the target dir carries a _SOAK_READY marker.)
  */
object ScaleSoak {

  private val Copies = 10

  val DefaultQueries: Seq[String] = Seq(
    "q35_medallion_e2e", "q41_medallion_versioned",
    "qd02_jaccard_pairs", "qd04_minhash_lsh_pairs", "qd13_incremental_dedup",
    "qs06_knn_join", "qt20_sequence_packing",
    "qv01_zorder_skip", "qv07_deletion_vectors")

  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: graft.ScaleSoak <sf0.1-dir> <out.json> [query...]")
    val src = args(0)
    val outPath = args(1)
    val names = if (args.length > 2) args.drop(2).toSeq else DefaultQueries
    val unknown = names.filterNot(SparkEntry.queries.contains)
    require(unknown.isEmpty, s"unknown query name(s): ${unknown.mkString(", ")}")

    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config(graft.util.Tables.nanosAsLongKey, "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val sf1 = sys.env.getOrElse("GRAFT_SOAK_DIR", "/tmp/graft_sf1")
    synthesize(spark, src, sf1)

    def time(name: String, dir: String): (Double, Long) = {
      spark.catalog.clearCache()
      val t0 = System.nanoTime()
      val n = SparkEntry.queries(name)(spark, dir).queryExecution.toRdd.count()
      ((System.nanoTime() - t0) / 1e9, n)
    }

    val results = names.map { name =>
      // one warmup (codegen+JIT) at the small scale, then min-of-2 at
      // each scale — the Prof discipline against host noise
      time(name, src)
      val small = (1 to 2).map(_ => time(name, src)).minBy(_._1)
      val big = (1 to 2).map(_ => time(name, sf1)).minBy(_._1)
      val factor = big._1 / small._1
      println(f"SOAK $name%-28s sf0.1=${small._1}%7.2fs sf1=${big._1}%7.2fs " +
        f"factor=$factor%5.2f rows ${small._2}%d -> ${big._2}%d")
      (name, small, big, factor)
    }

    val json = results.map { case (n, s, b, f) =>
      f"""    "$n": {"sf01_sec": ${s._1}%.3f, "sf1_sec": ${b._1}%.3f, "factor": $f%.3f, "sf01_rows": ${s._2}, "sf1_rows": ${b._2}}"""
    }.mkString("{\n  \"copies\": " + Copies + ",\n  \"queries\": {\n", ",\n", "\n  }\n}\n")
    java.nio.file.Files.write(java.nio.file.Paths.get(outPath),
      json.getBytes("UTF-8"))
    println(s"SOAK written to $outPath")
    spark.stop()
  }

  /** Build the 10× dataset (idempotent via marker file). */
  def synthesize(spark: SparkSession, src: String, dst: String): Unit = {
    val marker = java.nio.file.Paths.get(dst, "_SOAK_READY")
    if (java.nio.file.Files.exists(marker)) return
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(dst))

    // raw reads on purpose: synthesis is a byte-level passthrough of
    // every column it does not shift (Tables.load's normalizations
    // belong to QUERY time, at both scales equally)
    def raw(t: String): DataFrame = spark.read.parquet(s"$src/$t.parquet")
    def stride(df: DataFrame, key: String): Long =
      df.agg(max(col(key))).head().getLong(0) + 1L

    def copies(df: DataFrame)(shift: (DataFrame, Int) => DataFrame): DataFrame =
      (0 until Copies).map(c => shift(df, c)).reduce(_.unionByName(_))

    def write(t: String, df: DataFrame): Unit = {
      df.write.mode("overwrite").parquet(s"$dst/$t.parquet")
      println(s"SOAK synthesized $t")
    }

    // dims stay as-is (region/nation are fixed geography)
    Seq("region", "nation").foreach(t => write(t, raw(t)))

    val cust = raw("customer"); val cStride = stride(cust, "c_custkey")
    write("customer", copies(cust)((d, c) =>
      d.withColumn("c_custkey", col("c_custkey") + lit(c * cStride))))

    val supp = raw("supplier"); val sStride = stride(supp, "s_suppkey")
    write("supplier", copies(supp)((d, c) =>
      d.withColumn("s_suppkey", col("s_suppkey") + lit(c * sStride))))

    val part = raw("part"); val pStride = stride(part, "p_partkey")
    write("part", copies(part)((d, c) =>
      d.withColumn("p_partkey", col("p_partkey") + lit(c * pStride))))

    val ord = raw("orders"); val oStride = stride(ord, "o_orderkey")
    write("orders", copies(ord)((d, c) =>
      d.withColumn("o_orderkey", col("o_orderkey") + lit(c * oStride))
        .withColumn("o_custkey", col("o_custkey") + lit(c * cStride))))

    val li = raw("lineitem")
    write("lineitem", copies(li)((d, c) =>
      d.withColumn("l_orderkey", col("l_orderkey") + lit(c * oStride))
        .withColumn("l_partkey", col("l_partkey") + lit(c * pStride))
        .withColumn("l_suppkey", col("l_suppkey") + lit(c * sStride))))

    val ev = raw("events")
    val eStride = stride(ev, "event_id"); val uStride = stride(ev, "user_id")
    write("events", copies(ev)((d, c) =>
      d.withColumn("event_id", col("event_id") + lit(c * eStride))
        .withColumn("user_id", col("user_id") + lit(c * uStride))))

    val docs = raw("documents"); val dStride = stride(docs, "doc_id")
    write("documents", copies(docs)((d, c) => {
      val shifted = d.withColumn("doc_id", col("doc_id") + lit(c * dStride))
      if (c == 0) shifted
      else shifted
        .withColumn("text", regexp_replace(col("text"), "(\\S+)", "$1_c" + c))
        .withColumn("n_chars", length(col("text")).cast("long"))
    }))

    val emb = raw("embeddings"); val vStride = stride(emb, "vec_id")
    write("embeddings", copies(emb)((d, c) => {
      val shifted = d.withColumn("vec_id", col("vec_id") + lit(c * vStride))
      if (c == 0) shifted
      else shifted.withColumn("embedding",
        concat(slice(col("embedding"), c + 1, 100000),
          slice(col("embedding"), 1, c)))
    }))

    java.nio.file.Files.write(marker, Array.emptyByteArray)
  }
}
