package graft.similarity

import graft.{QueriesSimilarity, SparkSpec, Tables}
import graft.functions.Vectors
import org.apache.spark.sql.functions._

/** Pins for q82_semdedup (rows-only at the driver gate — the learned
  * k-means blocking is approximate by design).
  *
  * Two regimes:
  *  - intended regime (near-identical dups, τ→1): recall 1.0, pinned on
  *    a constructed corpus of jittered copies;
  *  - adversarial regime (this synthetic corpus: every planted pair
  *    sits AT the τ=0.42 boundary, ~64° apart — the blocking
  *    resolution itself): measured recall pinned as a floor, precision
  *    still exact, candidate volume ~1/32 of all-pairs.
  */
class SemDedupSpec extends SparkSpec {
  private val tau = 0.42

  private def truthDropped(dir: String): Set[Long] = {
    val e = Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("embedding"),
        sqrt(Vectors.dotNative(col("embedding"), col("embedding"))).as("nrm"))
    val a = e.select(col("vec_id").as("a_id"), col("embedding").as("ea"), col("nrm").as("na"))
    val b = e.select(col("vec_id").as("b_id"), col("embedding").as("eb"), col("nrm").as("nb"))
    a.crossJoin(b).filter(col("a_id") < col("b_id"))
      .filter(Vectors.dotNative(col("ea"), col("eb")) / (col("na") * col("nb")) >= tau)
      .select(col("b_id")).collect().map(_.getLong(0)).toSet
  }

  test("intended regime: near-identical dups caught at recall >= 0.99") {
    // corpus ∪ jittered copies (id+10000): w_i = v_i + 0.05·v_{i+1 mod d}
    // → cos(v,w) ≈ 0.998 ≫ τ, and w lands in v's cell — except when v
    // sits almost equidistant between two centroids, where even a tiny
    // jitter flips the assignment (measured: 2/500 here). That boundary
    // leak is inherent to single-assignment blocking; the floor pins it
    // at ≤1%.
    val e = Tables.embeddings(spark, "/root/testdata/sf0.001")
      .select(col("vec_id"), col("embedding"))
    val jit = e.select((col("vec_id") + 10000).as("vec_id"),
      zip_with(col("embedding"),
        concat(slice(col("embedding"), 2, 63), slice(col("embedding"), 1, 1)),
        (v, nxt) => v + lit(0.05f) * nxt).as("embedding"))
    val corpus = e.unionByName(jit)
    val dropped = QueriesSimilarity.semDedup(corpus, cacheKey = None, tau = tau)
      .select("dropped_id").collect().map(_.getLong(0)).toSet
    val jitIds = e.select("vec_id").collect().map(_.getLong(0) + 10000).toSet
    val recall = jitIds.intersect(dropped).size.toDouble / jitIds.size
    info(s"jittered-dup recall = $recall (${(jitIds -- dropped).size} boundary misses)")
    assert(recall >= 0.99,
      s"missed ${(jitIds -- dropped).size} of ${jitIds.size} jittered dups")
  }

  test("adversarial regime: exact precision, pinned recall floor, at ~1/32 volume") {
    for ((dir, floor) <- Seq("/root/testdata/sf0.001" -> 0.2,
                             "/root/testdata/sf0.01" -> 0.2)) {
      val truth = truthDropped(dir)
      val got = QueriesSimilarity.queries("q82_semdedup")(spark, dir)
        .select("dropped_id").collect().map(_.getLong(0)).toSet
      assert(truth.nonEmpty)
      // precision exact by construction: every flagged pair passed the
      // cosine verify inside a shared cell
      assert(got.subsetOf(truth))
      val recall = got.size.toDouble / truth.size
      info(s"$dir: truth=${truth.size} flagged=${got.size} recall=$recall")
      assert(recall >= floor, s"recall $recall at $dir")
    }
  }

  test("cell blocking bounds candidate volume well under all-pairs") {
    val dir = "/root/testdata/sf0.01"
    val e = Tables.embeddings(spark, dir)
    val cents = Vectors.ivfCodebook(e.select(col("vec_id"), col("embedding")),
      cacheKey = Some(s"$dir/embeddings"))
    val sizes = e.withColumn("cell",
        element_at(Vectors.nearestCentroids(col("embedding"), cents, 1), 1))
      .groupBy("cell").count().collect().map(_.getLong(1))
    val n = sizes.sum
    val candPairs = sizes.map(c => c * (c - 1) / 2).sum.toDouble
    val allPairs = n * (n - 1) / 2.0
    info(s"candidate volume = ${candPairs / allPairs} of all-pairs")
    assert(candPairs <= 0.2 * allPairs)
  }

  test("replay-identical: two runs produce the same drop set") {
    val dir = "/root/testdata/sf0.001"
    def run() = QueriesSimilarity.queries("q82_semdedup")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(run() == run())
  }
}
