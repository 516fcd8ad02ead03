package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeMap}
import org.apache.spark.sql.catalyst.plans.logical.{ColumnStat, Histogram, HistogramBin, Join, LogicalPlan, Statistics, UnaryNode}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy}
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation

/** Column-NDV statistics bridge for CBO (X88, VERDICT r8 #8).
  *
  * The gap (probed, extending X85's honesty note): `injectPreCBORule`
  * fires BEFORE "Early Filter and Projection Push-Down", and
  * CostBasedJoinReorder fires AFTER it — by reorder time every graft
  * relation is a `DataSourceV2ScanRelation` over a `V1ScanWrapper`,
  * which implements only `Scan` and hides the graft scan's
  * `SupportsReportStatistics`. So the statistics must be pinned onto
  * the plan while the raw relations are still visible.
  *
  * The bridge, on public extension points only: [[GraftCboStatsRule]]
  * (preCBO) wraps each graft relation of an NDV-opted table in a
  * [[GraftStatsNode]] whose overridden `stats` carries the log-derived
  * catalyst Statistics (exact rowCount + bytes + the X88 HLL
  * distinctCounts keyed to the relation's own attribute ids);
  * estimation visitors propagate those through Filter/Project/Join
  * nodes, so join reorder sees real per-key cardinalities.
  * [[GraftStatsStrategy]] plans the node by planning its child.
  *
  * The trade, stated plainly: the wrapper node sits between the
  * relation and any Project/Filter chain, so `ScanOperation` no longer
  * matches through it and the wrapped scan loses filter/column
  * pushdown for THAT query. The rule therefore arms only when the
  * session opted into cost-based reorder (`spark.sql.cbo.enabled` +
  * `joinReorder.enabled`) AND the plan has at least two joins — the
  * regime where join ORDER dominates scan width — and only for tables
  * that opted into `graft.ndvColumns`. Everything else is untouched. */
final case class GraftStatsNode(child: LogicalPlan,
    statsOverride: Statistics) extends UnaryNode {
  override def output: Seq[Attribute] = child.output
  override def stats: Statistics = statsOverride
  override def maxRows: Option[Long] = child.maxRows
  override protected def withNewChildInternal(newChild: LogicalPlan): GraftStatsNode =
    copy(child = newChild)
}

final case class GraftCboStatsRule(spark: SparkSession)
    extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!conf.cboEnabled || !conf.joinReorderEnabled) return plan
    if (plan.collect { case j: Join => j }.size < 2) return plan
    plan.transformUp {
      case rel: DataSourceV2Relation =>
        rel.table match {
          case gt: graft.sources.GraftTable =>
            graftStats(gt, rel.output) match {
              case Some(st) => GraftStatsNode(rel, st)
              case None => rel
            }
          case _ => rel
        }
    }
  }

  private def graftStats(gt: graft.sources.GraftTable,
      output: Seq[Attribute]): Option[Statistics] = {
    val ndv = gt.table.columnNdv(gt.asOf)
    if (ndv.isEmpty) return None
    val rows = gt.table.liveRowCount(gt.asOf)
    if (rows.isEmpty) return None
    // ANALYZE-committed equi-height histograms (X93): skew-aware
    // selectivities — FilterEstimation estimates an equality on a
    // Zipfian key from the bins' per-value mass instead of the
    // uniform rows/ndv guess
    val hists = gt.table.columnHistograms(gt.asOf)
    val attrStats = AttributeMap(output.flatMap(a =>
      ndv.get(a.name).map { n =>
        // [min,max] ride along from the metadata MIN/MAX fold (X71)
        // when sound — FilterEstimation turns range predicates into
        // real selectivities; values rendered in the attribute's own
        // integral type (the estimator casts by dataType)
        val mm = gt.table.liveMinMax(a.name, gt.asOf)
        def typed(v: Long): Option[Any] = a.dataType match {
          case org.apache.spark.sql.types.LongType => Some(v)
          case org.apache.spark.sql.types.IntegerType => Some(v.toInt)
          case org.apache.spark.sql.types.ShortType => Some(v.toShort)
          case org.apache.spark.sql.types.ByteType => Some(v.toByte)
          case _ => None
        }
        a -> ColumnStat(
          distinctCount = Some(BigInt(n)),
          min = mm.flatMap(_._1).flatMap(typed),
          max = mm.flatMap(_._2).flatMap(typed),
          histogram = hists.get(a.name).map { case (h, bins) =>
            Histogram(h, bins.map(b => HistogramBin(b._1, b._2, b._3)).toArray)
          })
      }))
    if (attrStats.isEmpty) return None
    Some(Statistics(
      sizeInBytes = BigInt(gt.table.liveBytes(gt.asOf)).max(1),
      rowCount = Some(BigInt(rows.get)),
      attributeStats = attrStats))
  }
}

final class GraftStatsStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case GraftStatsNode(child, _) => planLater(child) :: Nil
    case _ => Nil
  }
}
