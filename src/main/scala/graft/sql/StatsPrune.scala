package graft.sql

import org.apache.spark.sql.catalyst.expressions.{And, Attribute, EqualTo, Expression, GreaterThan, GreaterThanOrEqual, In, InSet, LessThan, LessThanOrEqual, Literal}

import graft.ecom.VersionedTable.SidecarRow
import graft.util.BloomSketch

/** File-skipping predicate evaluation, split into a driver-side COMPILE
  * (Catalyst `Expression` → a small serializable check list) and a
  * location-agnostic EVAL (check list × one file's [min,max]/bloom
  * metadata → "might this file contain a matching row?").
  *
  * The split is what lets a LARGE table's pruning run as a distributed
  * scan of its parquet stats sidecar: Catalyst expressions stay on the
  * driver; executors evaluate the same checks against sidecar rows
  * ([[GraftFileIndex]]). Semantics are strictly conservative — a check
  * can only REFUTE a file on metadata the commit recorded; missing
  * stats, non-integral literals, and unsupported shapes keep the file,
  * and Spark re-applies the exact predicate on scanned rows regardless.
  */
object StatsPrune {

  /** One conjunct a file must survive. `column` matches
    * case-insensitively, like Spark's resolver.
    */
  sealed trait Check extends Serializable

  /** Keep iff recorded max satisfies `max > x` (strict) / `max >= x`. */
  final case class NeedMax(column: String, x: Long, strict: Boolean) extends Check
  /** Keep iff recorded min satisfies `min < x` (strict) / `min <= x`. */
  final case class NeedMin(column: String, x: Long, strict: Boolean) extends Check
  /** Equality probe: range containment (when the literal is integral)
    * AND bloom membership (when a probe hash pair was computed).
    */
  final case class Point(column: String, range: Option[Long],
      probe: Option[(Long, Long)]) extends Check
  /** IN-list: keep iff ANY alternative might match. */
  final case class AnyOf(alts: Seq[Point]) extends Check

  /** Compile data filters to checks. `probes` maps (column, literal
    * value) → the xxhash64 pair the commit's bloom build used.
    */
  def compile(dataFilters: Seq[Expression],
      probes: Map[(String, Any), (Long, Long)]): Seq[Check] = {
    def point(c: String, v: Any): Point =
      Point(c, asLong(v), if (v == null) None else probes.get((c, v)))
    def walk(f: Expression): Seq[Check] = f match {
      case And(l, r) => walk(l) ++ walk(r)
      // x = NULL is never true; the conservative compile keeps the file
      // (Spark's exact predicate then emits zero rows from it)
      case EqualTo(a: Attribute, Literal(v, _)) if v != null => Seq(point(a.name, v))
      case EqualTo(Literal(v, _), a: Attribute) if v != null => Seq(point(a.name, v))
      case GreaterThan(a: Attribute, Literal(v, _)) =>
        asLong(v).map(NeedMax(a.name, _, strict = true)).toSeq
      case GreaterThan(Literal(v, _), a: Attribute) =>
        asLong(v).map(NeedMin(a.name, _, strict = true)).toSeq
      case GreaterThanOrEqual(a: Attribute, Literal(v, _)) =>
        asLong(v).map(NeedMax(a.name, _, strict = false)).toSeq
      case GreaterThanOrEqual(Literal(v, _), a: Attribute) =>
        asLong(v).map(NeedMin(a.name, _, strict = false)).toSeq
      case LessThan(a: Attribute, Literal(v, _)) =>
        asLong(v).map(NeedMin(a.name, _, strict = true)).toSeq
      case LessThan(Literal(v, _), a: Attribute) =>
        asLong(v).map(NeedMax(a.name, _, strict = true)).toSeq
      case LessThanOrEqual(a: Attribute, Literal(v, _)) =>
        asLong(v).map(NeedMin(a.name, _, strict = false)).toSeq
      case LessThanOrEqual(Literal(v, _), a: Attribute) =>
        asLong(v).map(NeedMax(a.name, _, strict = false)).toSeq
      case In(a: Attribute, vs) if vs.forall(_.isInstanceOf[Literal]) =>
        Seq(AnyOf(vs.map { case Literal(v, _) => point(a.name, v) }))
      case InSet(a: Attribute, vs) =>
        Seq(AnyOf(vs.toSeq.map(v => point(a.name, v))))
      case _ => Seq.empty
    }
    dataFilters.flatMap(walk)
  }

  /** The (column, literal) pairs whose bloom probe hashes `compile`
    * would consume — the driver hashes exactly these once per query.
    */
  def eqLiterals(dataFilters: Seq[Expression]): Seq[(String, Any, Expression)] = {
    def eqs(f: Expression): Seq[(String, Any, Expression)] = f match {
      case And(l, r) => eqs(l) ++ eqs(r)
      case EqualTo(a: Attribute, l @ Literal(v, _)) => Seq((a.name, v, l))
      case EqualTo(l @ Literal(v, _), a: Attribute) => Seq((a.name, v, l))
      case In(a: Attribute, vs) if vs.forall(_.isInstanceOf[Literal]) =>
        vs.map { case l @ Literal(v, _) => (a.name, v, l) }
      case _ => Seq.empty
    }
    dataFilters.flatMap(eqs).filter(_._2 != null)
      .distinctBy { case (c, v, _) => (c, v) }
  }

  /** Might a file with the given recorded metadata contain a matching
    * row? `statsOf`/`bloomOf` look up one column's metadata (None =
    * none recorded = conservatively keep).
    */
  def eval(checks: Seq[Check],
      statsOf: String => Option[(Long, Long)],
      bloomOf: String => Option[(Int, Array[Long])]): Boolean = {
    def one(c: Check): Boolean = c match {
      case NeedMax(col, x, strict) =>
        statsOf(col).forall { case (_, mx) => if (strict) mx > x else mx >= x }
      case NeedMin(col, x, strict) =>
        statsOf(col).forall { case (mn, _) => if (strict) mn < x else mn <= x }
      case Point(col, range, probe) =>
        probe.forall { case (h1, h2) =>
          bloomOf(col).forall { case (k, bits) =>
            BloomSketch.mightContain(bits, k, h1, h2) }
        } && range.forall(x =>
          statsOf(col).forall { case (mn, mx) => mn <= x && x <= mx })
      case AnyOf(alts) => alts.isEmpty || alts.exists(one)
    }
    checks.forall(one)
  }

  /** [[eval]] against one parquet sidecar row — the executor-side form.
    * Bloom bits decode lazily, only when a Point check probes that
    * column.
    */
  def evalRow(checks: Seq[Check], row: SidecarRow): Boolean = {
    def statsOf(c: String): Option[(Long, Long)] =
      row.stats.collectFirst { case s if s.col.equalsIgnoreCase(c) => (s.mn, s.mx) }
    def bloomOf(c: String): Option[(Int, Array[Long])] =
      row.blooms.collectFirst { case b if b.col.equalsIgnoreCase(c) =>
        (b.k, BloomSketch.fromBytes(b.bits)) }
    eval(checks, statsOf, bloomOf)
  }

  private def asLong(v: Any): Option[Long] = v match {
    case x: Long => Some(x)
    case x: Int => Some(x.toLong)
    case x: Short => Some(x.toLong)
    case x: Byte => Some(x.toLong)
    case _ => None
  }
}
