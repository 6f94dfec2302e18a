package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types._

import graft.functions.TextFns

/** Structured Streaming twin of the batch document-curation operators
  * (quality gate → exact dedup → PII scrub): the shape a production
  * pipeline uses to curate a CRAWL as it lands, instead of re-running
  * batch curation over the accumulated corpus. Like EventStreams, every
  * transform is a pure `DataFrame => DataFrame` that runs identically on
  * `spark.readStream` input and a batch frame — one definition, two
  * execution modes — and the per-row work (quality score, content hash,
  * redaction) is exactly the batch expressions (TextFns.qualityScore /
  * redactPii), so batch and stream cannot disagree on semantics.
  *
  * Scale notes per transform below; the headline: the only STATE this
  * pipeline keeps is the distinct-content-hash set in [[dedupNew]],
  * which is the deliverable of a dedup pass (production backs it with
  * the RocksDB state store, or replaces global-history dedup with the
  * batch incremental join — graft.queries.LlmDedup.lshIncrementalPairs
  * — against signatures landed as a table).
  */
object DocStreams {

  /** Streaming schema of the documents source (matches
    * /root/testdata documents.parquet).
    */
  val docSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType), StructField("text", StringType),
    StructField("lang", StringType), StructField("source", StringType),
    StructField("n_chars", LongType)))

  /** Open an unbounded read of a documents directory: files appearing in
    * `dir` are ingested incrementally (the crawl-drop pattern).
    */
  def readDocs(spark: SparkSession, dir: String): DataFrame =
    spark.readStream.schema(docSchema).parquet(dir)

  /** Quality gate: keep docs scoring at or above `minScore` under the
    * shared weighted heuristic. Stateless — pure per-row filter, no
    * shuffle, whole-stage codegen in both modes.
    */
  def qualityFilter(docs: DataFrame, minScore: Double = 0.3): DataFrame =
    docs.filter(TextFns.qualityScore(col("text")) >= minScore)

  /** Exact content dedup across the whole stream history: first
    * occurrence of each normalized text wins, every later copy — same
    * micro-batch or months later — is dropped. State is one entry per
    * DISTINCT content hash, which grows with unique corpus size by
    * definition of the operator (there is no watermark that can bound
    * it without re-admitting old duplicates); the state key is the
    * 16-byte binary digest of the SHARED batch content hash
    * (TextFns.contentHash — md5 of normalized text, unhexed so the
    * state row holds 16 bytes instead of the 32-char hex string), not
    * the document.
    */
  def dedupNew(docs: DataFrame): DataFrame = {
    val hashed = docs.withColumn("_content_hash", unhex(TextFns.contentHash(col("text"))))
    // NULL text hashes to NULL, and dropDuplicates groups NULL keys as
    // equal — distinct no-content docs would collapse to one survivor.
    // They have no content to be duplicates OF, so they bypass the state.
    hashed.filter(col("_content_hash").isNotNull).dropDuplicates("_content_hash")
      .unionByName(hashed.filter(col("_content_hash").isNull))
      .drop("_content_hash")
  }

  /** Horizon-bounded exact dedup for EVER-RUNNING crawls: like
    * [[dedupNew]], first occurrence of each normalized content wins and
    * later copies are dropped — but only while the copy lands within
    * `horizon` of the original's event time. State is then EVICTED by
    * the watermark (one hash entry lives `horizon`, not forever), so an
    * unbounded crawl runs with bounded state; the documented trade is
    * that a duplicate arriving after its original's horizon is
    * RE-ADMITTED. Use this when the stream has no end; use [[dedupNew]]
    * for finite backfills where exact history-wide dedup is the point
    * (its state is the deliverable there), or the batch incremental
    * join (LlmDedup.lshIncrementalPairs) when a persisted index exists.
    *
    * `tsCol` must be a TimestampType event-time column (the crawl's
    * fetch/ingest instant). Same content key as [[dedupNew]] — the
    * 16-byte unhexed md5 of normalized text — so the two variants agree
    * on what "duplicate" means.
    */
  def dedupNewWithinHorizon(docs: DataFrame, tsCol: String, horizon: String): DataFrame = {
    val hashed = docs.withColumn("_content_hash", unhex(TextFns.contentHash(col("text"))))
      .withWatermark(tsCol, horizon)
    // same NULL-content passthrough as dedupNew
    hashed.filter(col("_content_hash").isNotNull)
      .dropDuplicatesWithinWatermark("_content_hash")
      .unionByName(hashed.filter(col("_content_hash").isNull))
      .drop("_content_hash")
  }

  /** PII scrub: replace every email/phone/IPv4 match in the text with
    * its redaction token (qt11's expression). Stateless map.
    */
  def scrub(docs: DataFrame): DataFrame =
    docs.withColumn("text", TextFns.redactPii(col("text")))

  /** The composed curation pipeline: quality gate → history-wide exact
    * dedup → PII scrub, mirroring the batch qt07 composition. Order
    * matters twice: the gate runs FIRST so junk never consumes dedup
    * state (at crawl scale most of the stream is junk, and dedup state
    * is the one unbounded thing here); scrub runs LAST so both verdicts
    * are computed on the ORIGINAL text — two docs that differ only
    * inside their PII stay distinct documents rather than collapsing
    * onto one post-redaction hash.
    */
  def curate(docs: DataFrame, minScore: Double = 0.3): DataFrame =
    scrub(dedupNew(qualityFilter(docs, minScore)))

  /** Per-row MinHash signature + shingle set for a STREAMING frame.
    * The batch relation (LlmDedup.lshSignatures) builds signatures in
    * one grouped pass; a streaming aggregate would demand watermarked
    * state, so the stream computes the identical signature per row with
    * array HOFs over the same shingle/hash family — bit-identical
    * values, no state. Docs with fewer than 3 tokens have no shingles
    * (nothing to match) and are dropped, mirroring the batch relation.
    */
  def rowSignatures(docs: DataFrame): DataFrame =
    docs
      .withColumn("sh", array_distinct(TextFns.shingles(col("text"), 3)))
      .filter(size(col("sh")) > 0)
      .withColumn("sig",
        TextFns.minhashSig(transform(col("sh"), g => TextFns.hash31(g)), 16))

  /** Streaming near-dup gate against a STATIC signature index: for each
    * arriving doc, emit (doc_id, dup_of, jaccard) for every index doc it
    * near-duplicates — the crawl-time shape of qd13's batch incremental
    * join, sharing its banding (LlmDedup.lshBanded) and verify
    * (LlmDedup.jaccard ≥ the shared threshold) definitions, so stream
    * and batch cannot disagree on what "near-duplicate" means.
    *
    * Plan: band keys explode statelessly on both sides; candidates come
    * from a stream-STATIC equi-join on (band, band_key) — no watermark,
    * no stream-stream state, and the index side shuffles once per
    * micro-batch plan (production snapshots it broadcast-side or
    * bucket-partitioned). The stream row carries its shingle set through
    * the banding (`carry`), so verification is a stateless per-row
    * Jaccard. A pair matching in SEVERAL bands must still emit once:
    * instead of a streaming `dropDuplicates` — whose per-pair state
    * store grows monotonically for the lifetime of the crawl — both
    * sides carry their full band-key arrays and a pair emits only from
    * its SMALLEST matching band (no earlier band agrees). That predicate
    * is per-row, so the whole gate runs with ZERO streaming state.
    */
  def nearDupAgainstIndex(docs: DataFrame, indexSig: DataFrame): DataFrame = {
    import graft.queries.LlmDedup
    // the band-key ARRAY is already carried for the smallest-band
    // filter, so the (band, band_key) pairs come from posexploding it —
    // identical geometry to LlmDedup.lshBanded (same shared definition
    // builds the array), without computing every key a second time on
    // this per-micro-batch hot path
    val stream = LlmDedup.lshBandKeyArray(rowSignatures(docs), "bkeys")
      .select(col("doc_id"), col("sh"), col("bkeys"),
        posexplode(col("bkeys")).as(Seq("band", "band_key")))
    val index = LlmDedup.lshBandKeyArray(indexSig, "ibkeys")
      .select(col("doc_id").as("dup_of"), col("sh").as("_ish"), col("ibkeys"),
        posexplode(col("ibkeys")).as(Seq("band", "band_key")))
    stream.join(index, Seq("band", "band_key"))
      // smallest-matching-band filter: no band before this one matched
      .filter(size(filter(slice(col("bkeys"), lit(1), col("band").cast("int")),
        (k, i) => k === element_at(col("ibkeys"), i + 1))) === 0)
      .select(col("doc_id"), col("dup_of"),
        LlmDedup.jaccard(col("sh"), col("_ish")).as("jaccard"))
      .filter(col("jaccard") >= LlmDedup.VerifyJaccard)
  }

  /** A document's placement in the packed training-window layout (the
    * streaming twin of graft.queries.LlmText.packSequences — same
    * columns, same semantics).
    */
  final case class Placement(
      doc_id: Long, shard: Long, n_tokens: Long,
      seq_id: Long, seq_offset: Long, spans_boundary: Boolean)

  /** Internal row shape feeding the packer (public: the generated
    * encoder projection can't touch a private class).
    */
  final case class PackIn(doc_id: Long, shard: Long, n_tokens: Long)

  /** Streaming sequence packing: place each arriving doc into the
    * fixed-size training-window layout AS THE CRAWL LANDS, instead of
    * re-packing the accumulated corpus per batch. The per-shard state is
    * ONE long — the shard's next free token offset — maintained by
    * flatMapGroupsWithState keyed on the same multiplicative doc_id hash
    * as the batch packer: constant-size state per shard, shards
    * partition the cluster, placement arithmetic identical to batch
    * (seq_id/seq_offset/spans_boundary from the running cumsum).
    *
    * Determinism contract: batch packs in doc_id order within a shard;
    * a stream packs in ARRIVAL order (offsets must be append-only — an
    * already-placed window can never be reopened). Within one
    * micro-batch the group iterator carries no order guarantee, so the
    * batch's rows are sorted by doc_id before folding — a stream fed in
    * doc_id order (the landing pattern: files are drops of an ordered
    * crawl) therefore reproduces the batch layout EXACTLY, which
    * DocStreamsSpec pins across multi-batch replays.
    */
  def packStream(docs: DataFrame): Dataset[Placement] = {
    import docs.sparkSession.implicits._
    docs
      // a NULL doc_id cannot be placed (it is the shard and sort key);
      // NULL text packs as zero tokens — without the guards a single
      // malformed doc would kill the stream at the non-nullable encoder
      .filter(col("doc_id").isNotNull)
      .select(col("doc_id"),
        // THE batch shard hash — one definition (LlmText.shardCol), so
        // stream and batch layouts cannot drift
        graft.queries.LlmText.shardCol(col("doc_id")).as("shard"),
        coalesce(size(TextFns.tokens(col("text"))).cast(LongType), lit(0L))
          .as("n_tokens"))
      .as[PackIn]
      .groupByKey(_.shard)
      .flatMapGroupsWithState[Long, Placement](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (shard: Long, batch: Iterator[PackIn], state: GroupState[Long]) =>
          var start = state.getOption.getOrElse(0L)
          val placed = batch.toSeq.sortBy(_.doc_id).map { d =>
            val (seqId, off, spans) = graft.queries.LlmText.placementOf(start, d.n_tokens)
            start += d.n_tokens
            Placement(d.doc_id, shard, d.n_tokens, seqId, off, spans)
          }
          state.update(start)
          placed.iterator
      }
  }

  /** One monitor row per source per trigger: docs seen so far and the
    * running distinct-content ESTIMATE from the sketch state.
    */
  final case class SourceCardinality(source: String, n_docs: Long, distinct_est: Long)

  /** Streaming per-source distinct-content monitor with BOUNDED state:
    * the streaming twin of the batch sketch rollup (LlmDedup.qd19). The
    * exact-dedup state in [[dedupNew]] grows with unique corpus size by
    * definition — correct when the OUTPUT is the deduped stream, but a
    * monitor that only needs "how many distinct contents has this
    * source landed" shouldn't pay unbounded state for it. Here the
    * per-source state is ONE DataSketches HLL sketch (the same family
    * `hll_sketch_agg` uses batch-side, same lgK), serialized to a
    * ~kB-bounded byte array: update with each arriving content hash,
    * emit the running estimate per trigger. HLL registers are
    * max-merged, so arrival order and trigger boundaries cannot change
    * the final state — DocStreamsSpec pins the streamed estimate EQUAL
    * to the batch `hll_sketch_agg` estimate over the same rows, and
    * pins the state bound (serialized size is capped by the register
    * array, not the stream length).
    *
    * Scale: state per source is O(2^lgK) bytes regardless of corpus
    * size; sources partition the cluster. Run with OutputMode.Update
    * (one refreshed row per source per trigger).
    */
  def distinctMonitor(docs: DataFrame, lgK: Int = 12): Dataset[SourceCardinality] = {
    import docs.sparkSession.implicits._
    import org.apache.datasketches.hll.HllSketch
    docs
      .select(col("source"), TextFns.contentHash(col("text")).as("h"))
      .as[(String, String)]
      .groupByKey(_._1)
      .mapGroupsWithState[(Array[Byte], Long), SourceCardinality](
        GroupStateTimeout.NoTimeout()) {
        (source: String, rows: Iterator[(String, String)],
         state: GroupState[(Array[Byte], Long)]) =>
          val (bytes, nPrev) = state.getOption.getOrElse((Array.empty[Byte], 0L))
          val sk = if (bytes.isEmpty) new HllSketch(lgK) else HllSketch.heapify(bytes)
          var n = nPrev
          rows.foreach { case (_, h) => sk.update(h); n += 1 }
          state.update((sk.toUpdatableByteArray, n))
          SourceCardinality(source, n, Math.round(sk.getEstimate))
      }
  }

  /** Land curated docs as source-partitioned parquet via the shared
    * idempotent foreachBatch sink (same replay contract as
    * EventStreams.writeBronzeIncremental: overwrite by `_batch_id`, so
    * a replayed trigger rewrites its own partition instead of
    * duplicating it).
    */
  def writeCurated(docs: DataFrame, outDir: String,
      checkpointDir: String): org.apache.spark.sql.streaming.StreamingQuery =
    Sinks.idempotentPartitioned(docs, outDir, checkpointDir, Seq("source"))
}
