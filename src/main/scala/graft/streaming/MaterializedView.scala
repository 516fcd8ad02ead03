package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.expr

import graft.table.IncrementalTable

/** SQL-ownable materialized views over the IVM machinery (VERDICT r11
  * #3): `CALL graft.system.create_view(view, source, group_keys,
  * aggs, …)` registers an [[AggregateStream]]-maintained view as a
  * normal catalog table, and `CALL graft.system.refresh(view)` drains
  * pending upstream commits into it — a SQL user owns an incrementally
  * maintained aggregate end to end without touching the library.
  *
  * The view's DEFINITION rides the view table's own meta channel
  * (`mv/…` keys, committed atomically like every other channel and
  * folded through checkpoints), so refresh needs no external registry:
  * any coordinator that can open the table can maintain it. The
  * maintenance itself is exactly [[AggregateStream]] — O(delta) merges
  * per refresh, retraction or key-scoped recompute on rewrites (X48),
  * exactly-once via the stream's per-appId batch fencing — so a
  * refresh after a compaction or a partition rewrite converges without
  * recomputing the table.
  *
  * Aggregate spec grammar (`aggs`): semicolon-separated
  * `kind:name[:expr]` where `name` is the view column and `expr` is
  * any SQL expression over the source row (required for all kinds but
  * count). Kinds:
  *  - `count` — row count (retractable);
  *  - `sum` / `min` / `max` — plain mergeable monoids; exact carriers
  *    (longs, decimals, strings, dates) merge deterministically,
  *    double sums carry the usual fp-association caveat (cast to
  *    DECIMAL in the expr for bit-stable results);
  *  - `avg[@scale]` — the DERIVED monoid: the view column is a
  *    `struct(n, s)` state with an exact decimal sum at `scale`
  *    (default 4); read the value in SQL as
  *    `CAST(col.s AS DOUBLE) / col.n` (null-guard on n = 0), i.e.
  *    [[IncAgg.avgValue]];
  *  - `hll` — approximate COUNT DISTINCT as a maintained datasketches
  *    HLL binary (X18 sketch views through the SQL door); read with
  *    `hll_sketch_estimate(col)`;
  *  - `topk[@maxItems]` — approximate frequent items (default 1024
  *    tracked); read with `approx_top_k_estimate(col, k)`. */
object MaterializedView {
  private[graft] val SourceKey = "mv/source"
  private[graft] val KeysKey = "mv/group_keys"
  private[graft] val AggsKey = "mv/aggs"
  private[graft] val WhereKey = "mv/where"
  private[graft] val PartKey = "mv/partition_by"
  private[graft] val LeftKey = "mv/left"
  private[graft] val RightKey = "mv/right"
  private[graft] val JoinTypeKey = "mv/join_type"
  private[graft] val WhereLeftKey = "mv/left_where"
  private[graft] val WhereRightKey = "mv/right_where"

  /** Register `view` as a maintained aggregate over the table at
    * `sourcePath`. Pure metadata — one meta commit on the view table;
    * the first [[refresh]] materializes it. */
  def create(view: IncrementalTable, sourcePath: String,
      groupKeys: Seq[String], aggSpec: String, where: String = "",
      partitionBy: Seq[String] = Nil): Unit = {
    require(groupKeys.nonEmpty, "create_view needs group_keys")
    require(view.latestMeta(SourceKey).isEmpty &&
        view.latestMeta(LeftKey).isEmpty,
      s"${view.root} is already a materialized view — drop it first")
    require(partitionBy.forall(groupKeys.contains),
      "partition_by must be a subset of group_keys")
    val aggs = parseAggs(aggSpec) // validate the grammar up front
    require(aggs.nonEmpty, "create_view needs at least one aggregate")
    view.commitMeta(Map(
      SourceKey -> sourcePath,
      KeysKey -> groupKeys.mkString(","),
      AggsKey -> aggSpec,
      WhereKey -> where,
      PartKey -> partitionBy.mkString(",")))
  }

  /** Drain every pending upstream commit into the view; returns how
    * many were applied. Idempotent and restart-safe: the source cursor
    * rides the view's meta channel, the merge fencing rides the
    * stream's appId. */
  def refresh(spark: SparkSession, view: IncrementalTable): Int = {
    view.latestMeta(LeftKey).foreach(l => return refreshJoin(spark, view, l))
    val src = view.latestMeta(SourceKey).getOrElse(throw new IllegalArgumentException(
      s"${view.root} is not a materialized view (no ${SourceKey} or " +
        s"${LeftKey} registered — CALL graft.system.create_view / " +
        "create_join_view first)"))
    val keys = split(view.latestMeta(KeysKey).getOrElse(""))
    val aggs = parseAggs(view.latestMeta(AggsKey).getOrElse(""))
    val where = view.latestMeta(WhereKey).getOrElse("")
    val parts = split(view.latestMeta(PartKey).getOrElse(""))
    val stream = new AggregateStream(
      up = IncrementalTable(spark, src),
      down = view,
      groupKeys = keys,
      aggs = aggs,
      prepare = df => if (where.isEmpty) df else df.filter(expr(where)),
      partitionBy = parts,
      name = "mv",
      replayScope = if (parts.nonEmpty) parts else Seq("year", "month", "day"))
    stream.drain()
  }

  /** Register `view` as an incrementally maintained JOIN of the tables
    * at `leftPath` and `rightPath` (X31/JoinStream through the SQL
    * door): delta-join algebra with per-side cursors, every pair enters
    * exactly once; left_outer / full_outer retract their placeholders
    * atomically. Same meta-channel registry as [[create]] — [[refresh]]
    * dispatches on which definition keys are present. */
  def createJoin(view: IncrementalTable, leftPath: String,
      rightPath: String, joinKeys: Seq[String], joinType: String = "inner",
      leftWhere: String = "", rightWhere: String = "",
      partitionBy: Seq[String] = Nil): Unit = {
    require(joinKeys.nonEmpty, "create_join_view needs join_keys")
    require(Set("inner", "left_outer", "full_outer")(joinType),
      s"unsupported join_type '$joinType' (inner | left_outer | full_outer)")
    require(view.latestMeta(SourceKey).isEmpty &&
        view.latestMeta(LeftKey).isEmpty,
      s"${view.root} is already a materialized view — drop it first")
    view.commitMeta(Map(
      LeftKey -> leftPath,
      RightKey -> rightPath,
      KeysKey -> joinKeys.mkString(","),
      JoinTypeKey -> joinType,
      WhereLeftKey -> leftWhere,
      WhereRightKey -> rightWhere,
      PartKey -> partitionBy.mkString(",")))
  }

  private def refreshJoin(spark: SparkSession, view: IncrementalTable,
      left: String): Int = {
    val right = view.latestMeta(RightKey).getOrElse(throw new IllegalStateException(
      s"${view.root}: join view lacks ${RightKey}"))
    val keys = split(view.latestMeta(KeysKey).getOrElse(""))
    val jt = view.latestMeta(JoinTypeKey).getOrElse("inner")
    val lw = view.latestMeta(WhereLeftKey).getOrElse("")
    val rw = view.latestMeta(WhereRightKey).getOrElse("")
    val parts = split(view.latestMeta(PartKey).getOrElse(""))
    def prep(w: String): org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame =
      df => if (w.isEmpty) df else df.filter(expr(w))
    new JoinStream(
      upLeft = IncrementalTable(spark, left),
      upRight = IncrementalTable(spark, right),
      down = view,
      joinKeys = keys,
      prepareLeft = prep(lw),
      prepareRight = prep(rw),
      partitionBy = parts,
      name = "mv",
      joinType = jt).drain()
  }

  private def split(s: String): Seq[String] =
    s.split(",").map(_.trim).filter(_.nonEmpty).toIndexedSeq

  /** `kind:name[:expr]` list → [[IncAgg]]s. The expr is everything
    * after the second colon, so CASTs and nested calls parse intact. */
  private[graft] def parseAggs(spec: String): Seq[IncAgg] =
    // ';'-separated so exprs may contain commas (coalesce, nested calls)
    spec.split(";").map(_.trim).filter(_.nonEmpty).toIndexedSeq.map { a =>
      val parts = a.split(":", 3).toIndexedSeq
      require(parts.length >= 2, s"agg '$a' is not kind:name[:expr]")
      val (kind, name) = (parts(0).trim.toLowerCase, parts(1).trim)
      require(name.nonEmpty, s"agg '$a' has an empty view-column name")
      def exprOf: org.apache.spark.sql.Column = {
        require(parts.length == 3 && parts(2).trim.nonEmpty,
          s"agg '$a' needs an expression (kind:name:expr)")
        expr(parts(2).trim)
      }
      // `kind@arg` carries the one numeric dial some kinds take
      val (base, arg) = kind.split("@", 2) match {
        case Array(k, v) => (k, Some(v.toInt))
        case _ => (kind, None)
      }
      base match {
        case "count" => IncAgg.countAll(name)
        case "sum" => IncAgg.sumOf(exprOf, name)
        case "min" => IncAgg.minOf(exprOf, name)
        case "max" => IncAgg.maxOf(exprOf, name)
        case "avg" => IncAgg.avgOf(exprOf, name, scale = arg.getOrElse(4))
        case "hll" => IncAgg.approxDistinct(exprOf, name)
        case "topk" =>
          IncAgg.approxTopK(exprOf, name, maxItemsTracked = arg.getOrElse(1024))
        case other => throw new IllegalArgumentException(
          s"unknown aggregate kind '$other' in '$a' — supported: " +
            "count, sum, min, max, avg[@scale], hll, topk[@maxItems]")
      }
    }
}
