package graft.sql

import org.apache.hadoop.fs.{FileStatus, Path}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.execution.datasources.{FileIndex, PartitionDirectory}
import org.apache.spark.sql.types.StructType

import graft.ecom.VersionedTable
import graft.util.BloomSketch

/** A [[FileIndex]] over one pinned versioned-table snapshot, with
  * manifest-level data skipping: `listFiles` prunes the snapshot's file
  * list by the query's data filters against the per-file [min, max]
  * stats and bloom filters the commit recorded — the same planner hook
  * Delta's TahoeFileIndex uses, so `WHERE` clauses in plain SQL trigger
  * file skipping with no Graft-specific API in the query.
  *
  * Skipping only ever REMOVES IO, never rows: a file with no recorded
  * stats/bloom for a column is conservatively kept, unsupported
  * predicate shapes keep everything, and Spark re-applies the exact
  * predicate on the scanned rows regardless ([[StatsPrune]]).
  *
  * At 100 TB, planning cost is bounded two ways:
  *
  *  - '''Zero filesystem stats''': FileStatuses come from the
  *    manifest's recorded (length, mtime) — Delta's AddFile shape — so
  *    planning issues no per-file namenode/object-store round trips.
  *    Only files from pre-size manifests fall back to a listing,
  *    batched per directory.
  *  - '''Distributed stats pruning''': a large snapshot's per-file
  *    stats/blooms live in a parquet sidecar
  *    ([[VersionedTable.SnapshotMeta.statsSidecar]]), and `listFiles`
  *    evaluates the compiled checks over it as a SPARK JOB — the driver
  *    holds file names, never the per-file metadata (bloom bits are the
  *    heavy part). Only the delta tail since the last checkpoint prunes
  *    driver-side from the in-memory maps.
  */
final class GraftFileIndex(
    spark: SparkSession,
    vt: VersionedTable,
    meta: VersionedTable.SnapshotMeta) extends FileIndex {

  private val root = new Path(vt.tableDir)
  private val fs =
    root.getFileSystem(spark.sparkContext.hadoopConfiguration)
  private val blockSize: Long = fs.getDefaultBlockSize(root)

  // (rel, length, mtime) — manifest-recorded; legacy pre-size files
  // resolve with ONE listStatus per parent dir, not one RPC per file
  private val sized: Seq[(String, Long, Long)] = {
    val missing = meta.files.filterNot(meta.sizes.contains)
    val listed: Map[String, (Long, Long)] =
      if (missing.isEmpty) Map.empty
      else missing.groupBy(f => f.take(f.lastIndexOf('/')))
        .iterator.flatMap { case (dir, inDir) =>
          val names = inDir.map(f => f.drop(f.lastIndexOf('/') + 1)).toSet
          fs.listStatus(new Path(s"${vt.tableDir}/$dir")).toSeq
            .filter(st => names(st.getPath.getName))
            .map(st => s"$dir/${st.getPath.getName}" ->
              (st.getLen, st.getModificationTime))
        }.toMap
    meta.files.map { f =>
      val (len, mt) = meta.sizes.getOrElse(f, listed.getOrElse(f,
        throw new IllegalStateException(
          s"data file $f of ${vt.tableDir} is missing from both the " +
            "manifest sizes and the directory listing")))
      (f, len, mt)
    }
  }

  private def status(t: (String, Long, Long)): FileStatus =
    new FileStatus(t._2, false, 1, blockSize, t._3,
      new Path(s"${vt.tableDir}/${t._1}"))

  override def rootPaths: Seq[Path] = Seq(root)
  override def partitionSchema: StructType = StructType(Nil)
  // qualified URI strings, exactly as the generic listing path reports
  // them (`file:///...` — empty authority spelled out), so the two read
  // paths expose interchangeable inputFiles
  override def inputFiles: Array[String] =
    sized.map { t =>
      val u = fs.makeQualified(new Path(s"${vt.tableDir}/${t._1}")).toUri
      new java.net.URI(u.getScheme,
        Option(u.getAuthority).getOrElse(""), u.getPath, null, null).toString
    }.toArray
  override def refresh(): Unit = ()
  override def sizeInBytes: Long = sized.map(_._2).sum

  override def listFiles(partitionFilters: Seq[Expression],
      dataFilters: Seq[Expression]): Seq[PartitionDirectory] = {
    val checks = StatsPrune.compile(dataFilters, bloomProbes(dataFilters))
    val keep: Seq[(String, Long, Long)] =
      if (checks.isEmpty) { GraftFileIndex.lastPruneMode = "none"; sized }
      else meta.statsSidecar match {
        case None =>
          GraftFileIndex.lastPruneMode = "driver"
          sized.filter(t => StatsPrune.eval(checks, statsOf(t._1), bloomOf(t._1)))
        case Some(sidecar) =>
          GraftFileIndex.lastPruneMode = "sidecar-distributed"
          // delta tail (metadata in the manifest maps) prunes on the
          // driver; the covered bulk prunes as a distributed scan of
          // the sidecar. Collecting the PRUNED names (with the live-set
          // restriction pushed into executors) keeps the driver at
          // O(file names) — it never sees stats or bloom bits.
          val (mem, ref) = sized.partition(t =>
            meta.stats.contains(t._1) || meta.blooms.contains(t._1))
          val memKeep =
            mem.filter(t => StatsPrune.eval(checks, statsOf(t._1), bloomOf(t._1)))
          val refKeep = if (ref.isEmpty) ref else {
            val liveB = spark.sparkContext.broadcast(ref.map(_._1).toSet)
            val prunedOut = spark.read
              .schema(VersionedTable.sidecarSchema).parquet(sidecar)
              .as(VersionedTable.sidecarEncoder)
              .filter(r => liveB.value.contains(r.file) &&
                !StatsPrune.evalRow(checks, r))
              .map(_.file)(org.apache.spark.sql.Encoders.STRING)
              .collect().toSet
            ref.filterNot(t => prunedOut(t._1))
          }
          memKeep ++ refKeep
      }
    Seq(PartitionDirectory(InternalRow.empty, keep.map(status).toArray))
  }

  private def statsOf(rel: String)(column: String): Option[(Long, Long)] =
    meta.stats.get(rel).flatMap(byName(_, column))

  private def bloomOf(rel: String)(column: String): Option[(Int, Array[Long])] =
    meta.blooms.get(rel).flatMap(byName(_, column))

  // Spark resolves column names case-insensitively; manifest lookups must too
  private def byName[T](m: Map[String, T], column: String): Option[T] =
    m.get(column).orElse(m.collectFirst {
      case (k, t) if k.equalsIgnoreCase(column) => t
    })

  /** Pre-compute the xxhash64 pair for every equality literal that
    * could meet a bloom — one driver-local 1-row job per query, through
    * the same codepath the commit hashed the data with
    * ([[BloomSketch.hashCols]]), so build and probe agree by
    * construction (the [[VersionedTable.readPoint]] discipline). With a
    * sidecar the driver cannot see which columns carry blooms, so every
    * equality literal is hashed — the job is one local row either way.
    */
  private def bloomProbes(
      dataFilters: Seq[Expression]): Map[(String, Any), (Long, Long)] = {
    val bloomed: Set[String] =
      meta.blooms.valuesIterator.flatMap(_.keysIterator).map(_.toLowerCase).toSet
    val wanted = StatsPrune.eqLiterals(dataFilters)
      .filter { case (c, _, _) =>
        meta.statsSidecar.isDefined || bloomed(c.toLowerCase) }
    if (wanted.isEmpty) Map.empty
    else {
      // ONE 1-row local job hashes every probe literal at once
      val cols = wanted.zipWithIndex.flatMap { case ((_, _, l), i) =>
        val (h1, h2) =
          BloomSketch.hashCols(org.apache.spark.sql.graft.shims.column(l))
        Seq(h1.as(s"h1_$i"), h2.as(s"h2_$i"))
      }
      val row = spark.range(1).select(cols: _*).head()
      wanted.zipWithIndex.map { case ((c, v, _), i) =>
        (c, v) -> (row.getLong(2 * i), row.getLong(2 * i + 1))
      }.toMap
    }
  }
}

object GraftFileIndex {
  /** Which prune path the most recent `listFiles` took — "none",
    * "driver", or "sidecar-distributed". Diagnostic only; specs pin
    * that large snapshots plan through the distributed path.
    */
  @volatile var lastPruneMode: String = "none"
}
