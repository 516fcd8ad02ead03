package graft.sources

import org.apache.spark.sql.{Column, Row, SparkSession}
import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
import org.apache.spark.sql.catalyst.expressions.{AttributeReference, EqualTo, Expression}
import org.apache.spark.sql.catalyst.plans.logical.{Assignment, InsertAction, LogicalPlan, MergeIntoTable, UpdateAction, UpdateTable}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.graftshim.DmlShim
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation

import graft.table.IncrementalTable

/** SQL `UPDATE` and `MERGE INTO` for catalog-resolved graft tables —
  * the row-level DML verbs DSv2 has no V1-fallback bridge for
  * (X19/X11's library `update`/`merge`, lifted to SQL). Injected as a
  * post-hoc resolution rule ([[graft.GraftExtensions]]): once the
  * analyzer has resolved the statement over a
  * [[DataSourceV2Relation]] wrapping a [[GraftTable]], the plan is
  * swapped for an eager command that routes into the library's
  * skipping-pruned copy-on-write paths — the same pattern Spark's
  * production lakehouse formats use for these verbs.
  *
  * Resolved expressions are re-anchored by NAME before reuse
  * ([[GraftDml.unbind]]): the plan's `AttributeReference`s carry
  * expr-ids bound to the statement's relation instance, while the
  * command re-reads the table through the library, so name-based
  * resolution is the only stable contract.
  *
  * MERGE supports the canonical upsert the table format defines
  * (X11): `ON` a conjunction of same-name target=source equalities,
  * `WHEN MATCHED THEN UPDATE SET *`, `WHEN NOT MATCHED THEN INSERT *`
  * (as written or as the analyzer's expanded same-name assignments) —
  * anything else fails loudly rather than approximating different
  * semantics. UPDATE supports arbitrary translatable SET expressions
  * and predicates (they run inside the rewrite scan, so any Catalyst
  * expression works). */
final class GraftDmlRule(spark: SparkSession) extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = plan match {
    case u @ UpdateTable(GraftDml.Rel(r), assignments, cond) if u.resolved =>
      // subqueries reference OTHER plans' attributes — name-based
      // re-anchoring would silently re-resolve them against the target
      // table; refuse rather than mis-update
      (cond.toSeq ++ assignments.map(_.value)).foreach { e =>
        require(!e.exists(_.isInstanceOf[org.apache.spark.sql.catalyst.expressions.SubqueryExpression]),
          "graft UPDATE does not support subqueries in SET or WHERE")
      }
      GraftUpdateCommand(r.table.asInstanceOf[GraftTable].table,
        assignments.map(a => GraftDml.assignName(a) -> GraftDml.unbind(a.value)),
        cond.map(GraftDml.unbind))

    case m @ MergeIntoTable(GraftDml.Rel(r), source, mergeCond,
        matched, notMatched, notMatchedBySource, withSchemaEvolution)
        if m.resolved =>
      val keys = GraftDml.mergeKeys(mergeCond, r, source)
      val canonical = GraftDml.isCanonicalUpsert(matched, notMatched,
        notMatchedBySource)
      if (canonical)
        // fast path: the table format's native upsert (anti-join +
        // union, no per-column CASE chains). WITH SCHEMA EVOLUTION:
        // the analyzer expands the stars over EXISTING target columns
        // only — the engine adds the source-only columns itself
        // (merge(evolveSchema): one commit, kept rows null-fill,
        // untouched files read them as null).
        GraftMergeCommand(r.table.asInstanceOf[GraftTable].table, source, keys,
          evolveSchema = withSchemaEvolution)
      else {
        // Conditional-clause MERGE WITH SCHEMA EVOLUTION (X74) needs no
        // handling here: the analyzer's public evolution hook
        // (ResolveMergeIntoSchemaEvolution, armed by GraftTable's
        // AUTOMATIC_SCHEMA_EVOLUTION capability) already widened the
        // table through alterTable and re-resolved the clauses against
        // the new schema — by this point every assigned column is
        // committed, and the widened column reads as null for
        // pre-existing rows exactly like any add-column evolution.
        // (The library one-commit twin is mergeInto's `evolve`.)
        val (mc, nc, sc) = GraftDml.whenClauses(source, matched, notMatched,
          notMatchedBySource)
        GraftMergeClausesCommand(r.table.asInstanceOf[GraftTable].table,
          source, keys, mc, nc, sc)
      }

    case other => other
  }
}

private[sources] object GraftDml {

  /** A (possibly aliased) DSv2 relation over a graft table. */
  object Rel {
    def unapply(p: LogicalPlan): Option[DataSourceV2Relation] = p match {
      case r: DataSourceV2Relation if r.table.isInstanceOf[GraftTable] => Some(r)
      case org.apache.spark.sql.catalyst.plans.logical.SubqueryAlias(_, child) =>
        unapply(child)
      case _ => None
    }
  }

  /** Re-anchor a resolved expression by NAME so it can resolve against
    * the library's fresh read of the same table/source — the one-sided
    * special case of [[unbindMerge]] (no source attributes to stage). */
  def unbind(e: Expression): Column =
    unbindMerge(e, org.apache.spark.sql.catalyst.expressions.AttributeSet.empty)

  def assignName(a: Assignment): String = a.key match {
    case ar: AttributeReference => ar.name
    case other => throw new UnsupportedOperationException(
      s"graft UPDATE sets top-level columns only (got $other)")
  }

  /** The ON clause must be a conjunction of same-name target=source
    * column equalities — those names are the merge keys. */
  def mergeKeys(cond: Expression, target: DataSourceV2Relation,
      source: LogicalPlan): Seq[String] = {
    val targetIds = target.outputSet
    val sourceIds = source.outputSet
    def keysOf(e: Expression): Seq[String] = e match {
      case org.apache.spark.sql.catalyst.expressions.And(l, r) =>
        keysOf(l) ++ keysOf(r)
      case EqualTo(a: AttributeReference, b: AttributeReference)
          if a.name == b.name &&
            ((targetIds.contains(a) && sourceIds.contains(b)) ||
              (targetIds.contains(b) && sourceIds.contains(a))) =>
        Seq(a.name)
      case other => throw new UnsupportedOperationException(
        "graft MERGE ON must be a conjunction of same-name " +
          s"target=source column equalities (got $other)")
    }
    keysOf(cond).distinct
  }

  /** WHEN MATCHED THEN UPDATE SET * / WHEN NOT MATCHED THEN INSERT *
    * (unconditional, full-row, same-name) — the table format's native
    * merge contract (X11), kept as the fast path. The analyzer expands
    * the stars to same-name assignments; verify that is what they are. */
  def isCanonicalUpsert(matched: Seq[org.apache.spark.sql.catalyst.plans.logical.MergeAction],
      notMatched: Seq[org.apache.spark.sql.catalyst.plans.logical.MergeAction],
      notMatchedBySource: Seq[org.apache.spark.sql.catalyst.plans.logical.MergeAction]): Boolean = {
    def sameName(as: Seq[Assignment]): Boolean = as.forall { a =>
      (a.key, a.value) match {
        case (k: AttributeReference, v: AttributeReference) => k.name == v.name
        case _ => false
      }
    }
    (matched, notMatched, notMatchedBySource) match {
      case (Seq(UpdateAction(None, ua, _)), Seq(InsertAction(None, ia)), Seq()) =>
        sameName(ua) && sameName(ia)
      case _ => false
    }
  }

  /** Translate resolved MERGE actions to [[IncrementalTable.WhenClause]]s.
    * Conditions and values re-anchor by name ([[unbindMerge]]): source-
    * side attributes onto the staged `_graft_s_<name>` columns, target-
    * side onto plain names — the convention [[IncrementalTable.mergeInto]]
    * resolves. Genuinely untranslatable shapes (subqueries, nested-field
    * assignments) still fail loudly. */
  def whenClauses(source: LogicalPlan,
      matched: Seq[org.apache.spark.sql.catalyst.plans.logical.MergeAction],
      notMatched: Seq[org.apache.spark.sql.catalyst.plans.logical.MergeAction],
      notMatchedBySource: Seq[org.apache.spark.sql.catalyst.plans.logical.MergeAction])
      : (Seq[IncrementalTable.WhenClause], Seq[IncrementalTable.WhenClause],
        Seq[IncrementalTable.WhenClause]) = {
    import org.apache.spark.sql.catalyst.plans.logical.{DeleteAction, MergeAction}
    val sourceIds = source.outputSet
    def noSubquery(e: Expression): Unit =
      require(!e.exists(_.isInstanceOf[org.apache.spark.sql.catalyst.expressions.SubqueryExpression]),
        "graft MERGE does not support subqueries in clause conditions or values")
    def ub(e: Expression): Column = { noSubquery(e); unbindMerge(e, sourceIds) }
    def setOf(as: Seq[Assignment]): Seq[(String, Column)] =
      as.map(a => assignName(a) -> ub(a.value))
    def clause(a: MergeAction): IncrementalTable.WhenClause = a match {
      case UpdateAction(cond, as, _) =>
        IncrementalTable.WhenClause(cond.map(ub), Some(setOf(as)))
      case DeleteAction(cond) =>
        IncrementalTable.WhenClause(cond.map(ub), None)
      case InsertAction(cond, as) =>
        IncrementalTable.WhenClause(cond.map(ub), Some(setOf(as)))
      case other => throw new UnsupportedOperationException(
        s"graft MERGE cannot translate clause $other")
    }
    (matched.map(clause), notMatched.map(clause), notMatchedBySource.map(clause))
  }

  /** Name re-anchoring with merge's two-sided naming: attributes bound
    * to the SOURCE plan re-anchor as `_graft_s_<name>` (the staged
    * rendering mergeInto joins under), everything else by plain name.
    * `With` common-expression wrappers (the analyzer's BETWEEN/dedup
    * rewrite) are inlined first — their tree transforms recompute
    * `dataType` on children, which an [[UnresolvedAttribute]] cannot
    * answer, and the re-analysis over the new frame re-deduplicates
    * anyway. */
  def unbindMerge(e: Expression,
      sourceIds: org.apache.spark.sql.catalyst.expressions.AttributeSet): Column = {
    val inlined = e.transformUp {
      case w: org.apache.spark.sql.catalyst.expressions.With =>
        val defs = w.defs.map(d => d.id -> d.child).toMap
        w.child.transformUp {
          case r: org.apache.spark.sql.catalyst.expressions.CommonExpressionRef =>
            defs.getOrElse(r.id, throw new IllegalStateException(
              s"dangling common-expression ref $r"))
        }
    }
    DmlShim.column(inlined.transform {
      case a: AttributeReference if sourceIds.contains(a) =>
        UnresolvedAttribute.quoted(IncrementalTable.mergeSourcePrefix + a.name)
      case a: AttributeReference => UnresolvedAttribute.quoted(a.name)
    })
  }
}

/** `UPDATE graft.ns.t SET … WHERE …` → [[IncrementalTable.update]]
  * (skipping-pruned copy-on-write rewrite, X19), or — when the table
  * opts in with `graft.deletionVectors=true` (the Delta
  * `enableDeletionVectors` analog) — [[IncrementalTable
  * .updateVectorized]] (X82): matched rows shadowed by a sidecar and
  * re-appended in one commit, no file rewritten. */
final case class GraftUpdateCommand(table: IncrementalTable,
    set: Seq[(String, Column)], cond: Option[Column])
    extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    val pred = cond.getOrElse(org.apache.spark.sql.functions.lit(true))
    if (GraftCatalog.deletionVectorsEnabled(table))
      table.updateVectorized(pred, set.toMap,
        statsColumns = GraftCatalog.statsColumnsOf(table))
    else
      table.update(pred, set.toMap,
        statsColumns = GraftCatalog.statsColumnsOf(table))
    Seq.empty
  }
}

/** `MERGE INTO graft.ns.t USING src ON … upsert` →
  * [[IncrementalTable.merge]] (key-matched files rewritten, the rest
  * untouched, one atomic commit, X11). */
final case class GraftMergeCommand(table: IncrementalTable,
    source: LogicalPlan, keys: Seq[String], evolveSchema: Boolean = false)
    extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    val src = DmlShim.ofRows(spark, source)
    table.merge(src, keys,
      statsColumns = GraftCatalog.statsColumnsOf(table),
      evolveSchema = evolveSchema)
    Seq.empty
  }
}

/** General `MERGE INTO` (conditional clauses, DELETE, NOT MATCHED BY
  * SOURCE) → [[IncrementalTable.mergeInto]] — one atomic copy-on-write
  * commit over the touched-file union. */
final case class GraftMergeClausesCommand(table: IncrementalTable,
    source: LogicalPlan, keys: Seq[String],
    matched: Seq[IncrementalTable.WhenClause],
    notMatched: Seq[IncrementalTable.WhenClause],
    notMatchedBySource: Seq[IncrementalTable.WhenClause])
    extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    table.mergeInto(DmlShim.ofRows(spark, source), keys, matched, notMatched,
      notMatchedBySource, statsColumns = GraftCatalog.statsColumnsOf(table))
    Seq.empty
  }
}
