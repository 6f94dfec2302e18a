package graft.ops

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions.expr

import graft.ecom.VersionedTable

/** A maintained aggregate's DEFINITION as durable table metadata — the
  * `CREATE MATERIALIZED VIEW` object model. The spec (source table
  * path, grouping keys, count column, row-local sum/min/max
  * expressions, netting keys) is stored in the VIEW table's properties
  * in ONE atomic metadata commit at creation, and every later refresh
  * reads the STORED spec instead of trusting the caller to re-state the
  * algebra — re-typed measure expressions per call were the drift
  * vector the parse-time refusals existed to catch; storing the spec
  * removes the vector. (Delta/Databricks materialized views persist
  * their definition the same way: the view is a table whose metadata
  * carries the query.)
  *
  * The maintainable algebra is [[IncrementalAgg]]'s: per-group
  * COUNT/SUM/MIN/MAX over row-local SQL expressions of the source's
  * columns, maintained from the source's change data feed in O(rows
  * changed). Expressions are validated at parse time — an aggregate
  * smuggled into an entry (avg, a nested sum, percentile...) refuses
  * loudly with the standard rewrite instead of silently mis-summing.
  *
  * The source is stored by PATH (its table directory), not by catalog
  * name: the binding survives catalog renames and works identically
  * from the SQL procedures, the Scala API, and the streaming
  * maintainer ([[graft.streaming.Sinks.mvMaintainStored]]).
  */
final case class MvSpec(source: String, keys: Seq[String], countCol: String,
    sums: Seq[(String, String)], mins: Seq[(String, String)],
    maxes: Seq[(String, String)], netKeys: Seq[String]) {

  require(source.nonEmpty, "materialized-view spec needs a source table path")
  require(keys.nonEmpty, "materialized-view spec needs at least one key")
  require(countCol.nonEmpty, "materialized-view spec needs a count column")

  private def cols(ps: Seq[(String, String)]): Map[String, Column] =
    ps.map { case (n, e) => n -> expr(e) }.toMap

  /** One incremental refresh of `view` from the stored definition —
    * bootstraps on first call, then reads only the feed window
    * (exactly-once via the view's txn marker, as [[IncrementalAgg]]).
    */
  def refresh(spark: SparkSession, view: VersionedTable): Option[Long] =
    IncrementalAgg.refresh(view, VersionedTable(spark, source), keys,
      countCol, cols(sums), cols(mins), cols(maxes), netKeys = netKeys)

  /** The spec as table properties (normalized: lists joined, pair lists
    * re-rendered sorted by output column — two specs that mean the same
    * thing serialize identically, so drift checks are string compares).
    */
  def props: Map[String, String] = Map(
    MvSpec.SourceProp -> source,
    MvSpec.KeysProp -> keys.mkString(","),
    MvSpec.CountColProp -> countCol,
    MvSpec.SumsProp -> MvSpec.renderPairs(sums),
    MvSpec.MinsProp -> MvSpec.renderPairs(mins),
    MvSpec.MaxesProp -> MvSpec.renderPairs(maxes),
    MvSpec.NetKeysProp -> netKeys.mkString(","))
}

object MvSpec {
  val SourceProp: String = "graft.mv.source"
  val KeysProp: String = "graft.mv.keys"
  val CountColProp: String = "graft.mv.count_col"
  val SumsProp: String = "graft.mv.sums"
  val MinsProp: String = "graft.mv.mins"
  val MaxesProp: String = "graft.mv.maxes"
  val NetKeysProp: String = "graft.mv.net_keys"

  // aggregates (and aggregate-ish collectors) that cannot appear inside
  // a ROW-LOCAL entry: the view itself applies the per-group algebra
  private val Banned =
    ("(?i)\\b(avg|mean|sum|stddev|stddev_samp|stddev_pop|variance|var_samp|" +
      "median|percentile|approx_percentile|count|min|max|first|last|" +
      "collect_list|collect_set|array_agg|string_agg|listagg)\\s*\\(").r

  /** Parse a `name:sqlExpr;name:sqlExpr` list, refusing non-maintainable
    * aggregate shapes LOUDLY with the standard rewrite.
    */
  def parsePairs(spec: String, what: String): Seq[(String, String)] =
    spec.split(';').map(_.trim).filter(_.nonEmpty).toSeq.map { p =>
      val i = p.indexOf(':')
      require(i > 0,
        s"materialized-view $what entry '$p' must be " +
          "'<output_col>:<sql expr over source columns>'")
      val (n, e) = (p.take(i).trim, p.drop(i + 1).trim)
      Banned.findFirstIn(e).foreach { hit =>
        throw new IllegalArgumentException(
          s"materialized-view $what expression '$e' contains the aggregate " +
            s"'$hit' — entries are ROW-LOCAL expressions; the view itself " +
            "applies the per-group COUNT/SUM/MIN/MAX (write 'rev:x', not " +
            "'rev:sum(x)'). AVG is not self-maintainable: maintain the sum " +
            "and a non-null count as two columns and derive sum/count at " +
            "query time; MIN/MAX go in the mins/maxes parameters (bounded " +
            "dirty-group recompute), not in a sum.")
      }
      n -> e
    }

  def parseList(s: String): Seq[String] =
    s.split(',').map(_.trim).filter(_.nonEmpty).toSeq

  private[ops] def renderPairs(ps: Seq[(String, String)]): String =
    ps.sortBy(_._1).map { case (n, e) => s"$n:$e" }.mkString(";")

  /** Build a spec from the procedure-argument shapes (validating). */
  def fromArgs(source: String, keys: String, countCol: String, sums: String,
      mins: String, maxes: String, netKeys: String): MvSpec =
    MvSpec(source, parseList(keys), countCol.trim,
      parsePairs(sums, "sums"), parsePairs(mins, "mins"),
      parsePairs(maxes, "maxes"), parseList(netKeys))

  /** Persist the spec on the view — ONE metadata commit (atomic: a
    * stored spec is never readable half-written); idempotent when
    * already stored.
    */
  def store(view: VersionedTable, spec: MvSpec): Long =
    view.setTableProperties(spec.props)

  /** The whole CREATE path, shared by `CALL graft.system.create_mv` and
    * the `CREATE MATERIALIZED VIEW` DDL: an identical stored definition
    * is idempotent, a DIFFERENT one refuses (the stored spec is the
    * contract every past refresh maintained); refresh FIRST (it creates
    * the table on bootstrap and refuses foreign unmarked rows), then
    * persist the spec — a crash between the two re-heals on the re-run's
    * idempotent store.
    */
  def ensure(spark: SparkSession, view: VersionedTable, spec: MvSpec,
      viewName: String): Unit = {
    load(view).foreach { stored =>
      require(stored.props == spec.props,
        s"$viewName already carries a DIFFERENT materialized-view " +
          "definition — a view is never silently redefined (the stored " +
          "spec is the contract every past refresh maintained). Drop the " +
          "view and re-create it to change the definition." +
          s"\n  stored:  ${stored.props}\n  offered: ${spec.props}")
    }
    spec.refresh(spark, view)
    store(view, spec): Unit
  }

  /** The stored spec, if this table is a materialized view. A PARTIAL
    * spec (some keys present, the required ones missing) is corruption
    * and refuses rather than guessing — with atomic storage it can only
    * mean hand-edited properties.
    */
  def load(view: VersionedTable): Option[MvSpec] = {
    val p = view.tableProperties()
    val any = Seq(SourceProp, KeysProp, CountColProp, SumsProp, MinsProp,
      MaxesProp, NetKeysProp).exists(p.contains)
    if (!any) return None
    def req(k: String): String = p.getOrElse(k,
      throw new IllegalStateException(
        s"${view.tableDir}: materialized-view spec is incomplete — '$k' " +
          "is missing while other graft.mv.* properties are present; " +
          "re-create the view (create_mv) to restore a full definition"))
    Some(MvSpec(req(SourceProp), parseList(req(KeysProp)), req(CountColProp),
      parsePairs(p.getOrElse(SumsProp, ""), "sums"),
      parsePairs(p.getOrElse(MinsProp, ""), "mins"),
      parsePairs(p.getOrElse(MaxesProp, ""), "maxes"),
      parseList(p.getOrElse(NetKeysProp, ""))))
  }
}
