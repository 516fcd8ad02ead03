package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components by min-label propagation — the step that turns
  * near-dup PAIRS (q22/q23/q24's output) into dedup CLUSTERS with a
  * canonical representative (the component's minimum id), which is the
  * actual keep/drop decision a corpus pipeline needs: transitive
  * near-dups (A~B, B~C) must collapse into ONE cluster even when A and
  * C never pair directly.
  *
  * Each round every node takes the min label among itself and its
  * neighbors — a join + groupBy-min, fully distributed, converging in
  * O(graph diameter) rounds. Dedup graphs are short chains and stars
  * (diameter a handful), so the loop is a few cheap rounds; for
  * high-diameter graphs at extreme scale the same loop accepts the
  * large-star/small-star contraction (Kiveris et al.) as a drop-in —
  * the per-round primitive is identical. Per-round `localCheckpoint`
  * truncates the iterative lineage so the plan doesn't grow with
  * rounds (the classic iterative-DataFrame trap). */
object ConnectedComponents {

  /** Label every node of the undirected edge list with its component's
    * min node id. Returns (id, component). Nodes appear iff they occur
    * in an edge; isolated nodes are the caller's to union in. */
  def run(edges: DataFrame, aCol: String, bCol: String,
      maxIter: Int = 25): DataFrame = {
    // materialize the symmetrized edge list ONCE: every round joins
    // against it (plus the convergence check), and `edges` may carry an
    // arbitrarily expensive upstream pipeline (q68's is the whole
    // near-dup candidate+verify cascade) that must not replay per round
    val sym = edges.select(col(aCol).as("src"), col(bCol).as("dst"))
      .unionByName(edges.select(col(bCol).as("src"), col(aCol).as("dst")))
      .distinct()
      .localCheckpoint(true)
    var labels = sym.select(col("src").as("id")).distinct()
      .withColumn("component", col("id"))
      .localCheckpoint(true)
    var converged = false
    var i = 0
    while (!converged && i < maxIter) {
      val viaNeighbors = sym
        .join(labels.select(col("id").as("dst"), col("component").as("ncomp")), "dst")
        .groupBy(col("src").as("id")).agg(min("ncomp").as("ncomp"))
      // carry OLD and NEW labels through one checkpointed frame: the
      // convergence test is then a filter over already-materialized
      // rows instead of a from-scratch next⋈labels shuffle join —
      // one shuffle job per round, not two (round-14 profiling: the
      // check job cost as much as the propagation it was checking)
      val step = labels.join(viaNeighbors, Seq("id"), "left")
        .select(col("id"), col("component").as("prev"),
          least(col("component"), coalesce(col("ncomp"), col("component")))
            .as("component"))
        .localCheckpoint(true)
      converged = step.filter(col("component") =!= col("prev")).isEmpty
      labels = step.select(col("id"), col("component"))
      i += 1
    }
    require(converged, s"connected components did not converge in $maxIter rounds")
    labels
  }

  /** Large-star/small-star alternation (Kiveris et al., "Connected
    * Components in MapReduce and Beyond") — the high-diameter drop-in
    * [[run]]'s scaladoc promises: label propagation needs O(diameter)
    * rounds (a 10k-link chain = 10k rounds), star contraction converges
    * in O(log n) because every round REWIRES edges toward component
    * minima instead of just flooding labels one hop:
    *
    *  - large-star: every node's strictly-larger neighbors re-attach to
    *    its local minimum m = min(Γ(u) ∪ {u});
    *  - small-star: with edges oriented big→small, each node and its
    *    smaller neighbors re-attach to m.
    *
    * Both are one groupBy-min + one join over the edge set; the edge
    * set provably never grows (each input edge maps to one output
    * edge). Fixpoint = the graph is a union of stars centered at
    * component minima, read off as the labels. Same output contract as
    * [[run]]: (id, component-min), nodes appear iff they occur in an
    * edge — property-pinned equal to [[run]] on arbitrary graphs. */
  def runStar(edges: DataFrame, aCol: String, bCol: String,
      maxIter: Int = 30): DataFrame = {
    // self-loops are kept here (matching run()): a node whose only edge
    // is (x,x) must still be labeled, and `nodes` is read off init. The
    // star rounds shed the loop edges themselves (src =!= dst guards on
    // every emission), costing at most one extra fixpoint round.
    val init = edges.select(col(aCol).as("src"), col(bCol).as("dst"))
      .unionByName(edges.select(col(bCol).as("src"), col(aCol).as("dst")))
      .distinct()
      .localCheckpoint(true)
    val nodes = init.select(col("src").as("id")).distinct().localCheckpoint(true)

    // canonical undirected form (lo, hi) for the fixpoint test
    def canon(e: DataFrame): DataFrame =
      e.select(least(col("src"), col("dst")).as("lo"),
        greatest(col("src"), col("dst")).as("hi")).distinct()

    var e = init // symmetric both-directions invariant between rounds
    var converged = false
    var i = 0
    while (!converged && i < maxIter) {
      // ---- large-star: (v, m(u)) for v ∈ Γ(u), v > u ----
      val mLarge = e.groupBy("src")
        .agg(least(min(col("dst")), first(col("src"))).as("m"))
      val ls = e.join(mLarge, "src")
        .filter(col("dst") > col("src"))
        .select(col("dst").as("src"), col("m").as("dst"))
        .filter(col("src") =!= col("dst"))
      val afterLarge = ls.unionByName(ls.select(col("dst").as("src"), col("src").as("dst")))
        .distinct()
        .localCheckpoint(true)

      // ---- small-star: orient big→small, re-attach u and its smaller
      // neighbors to m = min(Γo(u) ∪ {u}) ----
      val o = canon(afterLarge) // (lo, hi): hi is the "u" side
        .select(col("hi").as("u"), col("lo").as("v"))
      val mSmall = o.groupBy("u").agg(min(col("v")).as("m"))
      val ss = o.join(mSmall, "u")
        .select(col("v").as("src"), col("m").as("dst"))
        .unionByName(mSmall.select(col("u").as("src"), col("m").as("dst")))
        .filter(col("src") =!= col("dst"))
      val next = ss.unionByName(ss.select(col("dst").as("src"), col("src").as("dst")))
        .distinct()
        .localCheckpoint(true)

      val (cn, co) = (canon(next), canon(e))
      converged = cn.exceptAll(co).unionByName(co.exceptAll(cn)).isEmpty
      e = next
      i += 1
    }
    require(converged, s"star contraction did not converge in $maxIter rounds")
    // fixpoint edges form stars (v, root): read labels; roots label themselves
    val parents = canon(e).select(col("hi").as("id"), col("lo").as("component"))
    nodes.join(parents, Seq("id"), "left")
      .select(col("id"), coalesce(col("component"), col("id")).as("component"))
  }
}
