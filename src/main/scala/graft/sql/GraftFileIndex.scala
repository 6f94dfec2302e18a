package graft.sql

import org.apache.hadoop.fs.{FileStatus, Path}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{And, Attribute, EqualTo, Expression, GreaterThan, GreaterThanOrEqual, In, InSet, LessThan, LessThanOrEqual, Literal}
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
  * predicate on the scanned rows regardless.
  *
  * At 100 TB: the file list is O(files) driver-side metadata — the cost
  * Delta pays in its log replay — while every pruned file is a parquet
  * scan task that never launches. FileStatuses are resolved once at
  * construction (the snapshot is immutable), so repeated queries replan
  * without re-stat'ing.
  */
final class GraftFileIndex(
    spark: SparkSession,
    vt: VersionedTable,
    meta: VersionedTable.SnapshotMeta) extends FileIndex {

  private val root = new Path(vt.tableDir)
  private val fs =
    root.getFileSystem(spark.sparkContext.hadoopConfiguration)
  // rel-path → status, resolved once (immutable snapshot)
  private val statuses: Seq[(String, FileStatus)] =
    meta.files.map(rel => rel -> fs.getFileStatus(new Path(s"${vt.tableDir}/$rel")))

  override def rootPaths: Seq[Path] = Seq(root)
  override def partitionSchema: StructType = StructType(Nil)
  override def inputFiles: Array[String] =
    statuses.map(_._2.getPath.toString).toArray
  override def refresh(): Unit = ()
  override def sizeInBytes: Long = statuses.map(_._2.getLen).sum

  override def listFiles(partitionFilters: Seq[Expression],
      dataFilters: Seq[Expression]): Seq[PartitionDirectory] = {
    val probes = bloomProbes(dataFilters)
    val keep = statuses.collect {
      case (rel, st) if dataFilters.forall(f => mightMatch(rel, f, probes)) => st
    }
    Seq(PartitionDirectory(InternalRow.empty, keep.toArray))
  }

  /** Can `rel` contain a row matching `f`? Conservative: only the
    * comparison shapes the manifest can refute prune anything.
    */
  private def mightMatch(rel: String, f: Expression,
      probes: Map[(String, Any), (Long, Long)]): Boolean = f match {
    case And(l, r) => mightMatch(rel, l, probes) && mightMatch(rel, r, probes)
    case EqualTo(a: Attribute, Literal(v, _)) => keepEq(rel, a.name, v, probes)
    case EqualTo(Literal(v, _), a: Attribute) => keepEq(rel, a.name, v, probes)
    case GreaterThan(a: Attribute, Literal(v, _)) => range(rel, a.name, v)(_._2 > _)
    case GreaterThan(Literal(v, _), a: Attribute) => range(rel, a.name, v)(_._1 < _)
    case GreaterThanOrEqual(a: Attribute, Literal(v, _)) => range(rel, a.name, v)(_._2 >= _)
    case GreaterThanOrEqual(Literal(v, _), a: Attribute) => range(rel, a.name, v)(_._1 <= _)
    case LessThan(a: Attribute, Literal(v, _)) => range(rel, a.name, v)(_._1 < _)
    case LessThan(Literal(v, _), a: Attribute) => range(rel, a.name, v)(_._2 > _)
    case LessThanOrEqual(a: Attribute, Literal(v, _)) => range(rel, a.name, v)(_._1 <= _)
    case LessThanOrEqual(Literal(v, _), a: Attribute) => range(rel, a.name, v)(_._2 >= _)
    case In(a: Attribute, vs) if vs.forall(_.isInstanceOf[Literal]) =>
      vs.exists { case Literal(v, _) => keepEq(rel, a.name, v, probes) }
    case InSet(a: Attribute, vs) => vs.exists(v => keepEq(rel, a.name, v, probes))
    case _ => true
  }

  private def keepEq(rel: String, column: String, v: Any,
      probes: Map[(String, Any), (Long, Long)]): Boolean = {
    if (v == null) return true // x = NULL never matches; let Spark emit empty
    val bloomKeep = meta.blooms.get(rel).flatMap(byName(_, column)) match {
      case Some((k, bits)) => probes.get((column, v)) match {
        case Some((h1, h2)) => BloomSketch.mightContain(bits, k, h1, h2)
        case None => true
      }
      case None => true
    }
    bloomKeep && range(rel, column, v)((mm, x) => mm._1 <= x && x <= mm._2)
  }

  /** Min/max refutation for integral-typed literals; anything else is
    * conservatively kept (the manifest stores Long stats only).
    */
  private def range(rel: String, column: String, v: Any)(
      keep: ((Long, Long), Long) => Boolean): Boolean =
    asLong(v) match {
      case Some(x) => meta.stats.get(rel).flatMap(byName(_, column)) match {
        case Some(mm) => keep(mm, x)
        case None => true
      }
      case None => true
    }

  private def asLong(v: Any): Option[Long] = v match {
    case x: Long => Some(x)
    case x: Int => Some(x.toLong)
    case x: Short => Some(x.toLong)
    case x: Byte => Some(x.toLong)
    case _ => None
  }

  // Spark resolves column names case-insensitively; manifest lookups must too
  private def byName[T](m: Map[String, T], column: String): Option[T] =
    m.get(column).orElse(m.collectFirst {
      case (k, t) if k.equalsIgnoreCase(column) => t
    })

  /** Pre-compute the xxhash64 pair for every equality literal that has
    * a bloom on ANY file — one driver-local 1-row job per distinct
    * (column, literal), through the same codepath the commit hashed the
    * data with ([[BloomSketch.hashCols]]), so build and probe agree by
    * construction (the [[VersionedTable.readPoint]] discipline).
    */
  private def bloomProbes(
      dataFilters: Seq[Expression]): Map[(String, Any), (Long, Long)] = {
    def eqs(f: Expression): Seq[(String, Any, Expression)] = f match {
      case And(l, r) => eqs(l) ++ eqs(r)
      case EqualTo(a: Attribute, l @ Literal(v, _)) => Seq((a.name, v, l))
      case EqualTo(l @ Literal(v, _), a: Attribute) => Seq((a.name, v, l))
      case In(a: Attribute, vs) if vs.forall(_.isInstanceOf[Literal]) =>
        vs.map { case l @ Literal(v, _) => (a.name, v, l) }
      case _ => Seq.empty
    }
    val bloomed: Set[String] =
      meta.blooms.valuesIterator.flatMap(_.keysIterator).map(_.toLowerCase).toSet
    val wanted = dataFilters.flatMap(eqs)
      .filter { case (c, v, _) => v != null && bloomed(c.toLowerCase) }
      .distinctBy { case (c, v, _) => (c, v) }
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
