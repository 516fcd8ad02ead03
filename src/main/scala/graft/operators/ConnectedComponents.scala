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
      val next = labels.join(viaNeighbors, Seq("id"), "left")
        .select(col("id"),
          least(col("component"), coalesce(col("ncomp"), col("component")))
            .as("component"))
        .localCheckpoint(true)
      converged = next.as("n")
        .join(labels.as("o"), "id")
        .filter(col("n.component") =!= col("o.component"))
        .isEmpty
      labels = next
      i += 1
    }
    require(converged, s"connected components did not converge in $maxIter rounds")
    labels
  }
}
