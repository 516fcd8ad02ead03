package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Vector similarity primitives over `array<float>` embedding columns.
  *
  * Cosine is computed in DOUBLE with a deterministic left-to-right fold
  * (`functions.aggregate` over `zip_with`), so results are reproducible
  * across partitionings — float accumulation order never varies. The
  * DuckDB oracle accumulates in float32; the two agree to ~3e-8, far
  * inside the corpus's smallest rank-boundary gap (1.9e-5), so top-k
  * *membership and order* match exactly even though raw scores are not
  * emitted.
  */
object Vectors {

  /** Dot product in double precision, element order preserved.
    * Interpreted (higher-order functions skip codegen) — prefer
    * [[dotNative]] when the session registers [[graft.GraftExtensions]];
    * both produce bit-identical doubles. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  /** Codegen'd dot product via the `vec_dot` native expression
    * ([[graft.functions.VectorDot]]); requires
    * `spark.sql.extensions=graft.GraftExtensions`. */
  def dotNative(a: Column, b: Column): Column =
    call_function("vec_dot", a, b)

  /** Squared L2 norm in double precision. */
  def norm2(a: Column): Column =
    aggregate(a, lit(0.0), (acc, v) => acc + v.cast("double") * v.cast("double"))

  /** Cosine similarity of two embedding columns. */
  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (sqrt(norm2(a)) * sqrt(norm2(b)))

  /** Codegen'd cosine (same math/order as [[cosine]], bit-identical). */
  def cosineNative(a: Column, b: Column): Column =
    dotNative(a, b) / (sqrt(dotNative(a, a)) * sqrt(dotNative(b, b)))

  /** Random-hyperplane (sign) LSH bucket id: bit i is the sign of the
    * projection onto plane i. `planes` must be generated deterministically
    * (seeded) so bucketing is reproducible across runs and engines. */
  def signLshBucket(v: Column, planes: Seq[Seq[Double]]): Column =
    planes.zipWithIndex.map { case (p, i) =>
      when(dot(v, typedLit(p)) > 0, 1 << i).otherwise(0)
    }.reduce(_ + _)

  /** Deterministic pseudo-random unit-free hyperplanes (fixed seed). */
  def hyperplanes(nPlanes: Int, dim: Int, seed: Long = 42L): Seq[Seq[Double]] = {
    val rnd = new scala.util.Random(seed)
    Seq.fill(nPlanes)(Seq.fill(dim)(rnd.nextGaussian()))
  }

  /** `nTables` independent sign-LSH tables drawn from ONE seeded stream
    * (table l = planes `[l*nPlanes, (l+1)*nPlanes)`). Independent tables
    * decorrelate misses: a true neighbor split from its query by one
    * table's planes usually collides in another, which is what lifts
    * recall on corpora whose neighbors sit far (~65°) from their query
    * — extra probing within ONE table saturates long before that. */
  def lshTables(nTables: Int, nPlanes: Int, dim: Int,
      seed: Long = 42L): Seq[Seq[Seq[Double]]] = {
    val rnd = new scala.util.Random(seed)
    Seq.fill(nTables)(Seq.fill(nPlanes)(Seq.fill(dim)(rnd.nextGaussian())))
  }

  /** Codegen'd projection of one vector onto a BANK of constant
    * vectors (LSH plane banks, IVF codebooks): one `vec_mat_dot` call,
    * one nested loop, one float32 2-D literal. N separate `vec_dot`
    * calls inline N literals + N loop bodies — at 32 planes that blew
    * past Janino's method limit and dropped the whole stage to
    * interpreted eval (~200µs/row); this stays inside WholeStageCodegen
    * at any bank size. Sign flips vs the double path are confined to
    * |projection| ≲ 1e-5 — derive buckets and margins from the SAME
    * projection column on both sides of a join and bucketing stays
    * consistent. */
  def matDotNative(v: Column, bank: Seq[Seq[Double]]): Column =
    call_function("vec_mat_dot", v, typedLit(bank.map(_.map(_.toFloat))))

  /** Sign-LSH bucket ids for the tables of a concatenated plane bank,
    * as ONE native expression (`vec_lsh_buckets`): bucket l bit i =
    * sign of projection `l*nPlanes + i`. Composing this from
    * [[matDotNative]] + per-bit `element_at` signs measured ~1000×
    * slower inside the fused whole-stage Generate (see
    * [[VectorLshBuckets]]); the single expression keeps the corpus
    * scan at the fast Scan→Project→Generate shape. */
  def lshBucketsNative(v: Column, bank: Seq[Seq[Double]], nPlanes: Int): Column =
    call_function("vec_lsh_buckets", v,
      typedLit(bank.map(_.map(_.toFloat))), lit(nPlanes))

  /** Query-directed multi-probe patterns (Lv et al., VLDB'07 shape):
    * the `nProbes` flip-sets over MARGIN-RANK positions (0 = the plane
    * with the smallest |projection| for that query), enumerated
    * best-first by pseudo-cost Σ(rank+1) with at most `maxFlips` flips.
    * Rank positions make the pattern list a compile-time constant shared
    * by every query row — per-row adaptivity comes only from each row's
    * own margin argsort, so probing stays inside codegen (no per-row
    * probe planning). At equal probe count this beats the fixed
    * Hamming-ball: low-margin planes are exactly the likely flips. */
  def rankPatterns(nPlanes: Int, nProbes: Int, maxFlips: Int): Seq[Seq[Int]] = {
    import scala.math.Ordering.Implicits._
    // min-heap on (cost, chosen ranks asc-lex, next) — deterministic
    val pq = scala.collection.mutable.PriorityQueue.empty[(Int, Vector[Int], Int)](
      Ordering[(Int, Vector[Int], Int)].reverse)
    val out = scala.collection.mutable.ArrayBuffer.empty[Seq[Int]]
    pq.enqueue((0, Vector.empty, 0))
    while (pq.nonEmpty && out.size < nProbes) {
      val (cost, chosen, next) = pq.dequeue()
      out += chosen
      if (chosen.size < maxFlips)
        for (j <- next until nPlanes)
          pq.enqueue((cost + j + 1, chosen :+ j, j + 1))
    }
    out.toSeq
  }

  /** IVF coarse quantizer: per-row array of the `nprobe` centroid ids
    * nearest by cosine, best first (deterministic index tie-break).
    *
    * `centroids` is the broadcast-side coarse codebook — tiny by
    * construction (C × dim doubles), collected once on the driver and
    * shipped as literals, so assignment is a narrow map over the corpus:
    * no shuffle, full codegen, scales linearly in rows. Centroids are
    * pre-normalized here so per-row cosine argmax reduces to dot. */
  /** `native = true` (default) scores cells with the codegen'd
    * `vec_dot` over float32 centroid literals — a C×dim tight loop per
    * row inside WholeStageCodegen, the path corpus-scale assignment
    * must take (the interpreted HOF fold made 32-cell assignment the
    * cost center of q36). float32 centroids shift cell boundaries by
    * <1e-7 relative — deterministic, recall-neutral (AnnSpec floor
    * re-verified). `native = false` keeps double precision for
    * codebook training, where the input is an array<double> column. */
  def nearestCentroids(v: Column, centroids: Seq[Seq[Double]], nprobe: Int,
      native: Boolean = true): Column = {
    val unit = centroids.map { c =>
      val n = math.sqrt(c.map(x => x * x).sum)
      c.map(_ / n)
    }
    val scored = array(unit.zipWithIndex.map { case (c, i) =>
      val s = if (native) dotNative(v, typedLit(c.map(_.toFloat)))
        else dot(v, typedLit(c))
      struct(s.as("s"), lit(i).as("cid"))
    }: _*)
    transform(slice(reverse(array_sort(scored)), 1, nprobe), _.getField("cid"))
  }

  /** Train an IVF coarse codebook: stride-sampled seeds refined by
    * `iters` rounds of spherical k-means (assign by cosine, new
    * centroid = normalized mean of its members' unit vectors, empty
    * cells keep their previous centroid). Returns `cells` centroids as
    * driver-side vectors for [[nearestCentroids]] literals.
    *
    * Scale design: training runs on a DETERMINISTIC bounded sample
    * (first `maxTrain` by `vec_id` — standard IVF practice: the
    * codebook needs a representative sample, not the corpus), so each
    * Lloyd round is one bounded aggregation regardless of corpus size;
    * only the final cell ASSIGNMENT ever touches all rows, as a narrow
    * broadcast map. Per-dimension means accumulate in DECIMAL, so the
    * centroids are bit-stable under any partitioning or row order —
    * double summation would make bucket boundaries (and thus ANN
    * output) run-dependent at the last bit. */
  // Codebook memo: an IVF index is BUILT ONCE and probed by many
  // queries — per-query retraining would bill every search for the
  // build (5 bounded jobs). The codebook is a pure deterministic
  // function of (corpus, cells, iters, maxTrain), so callers that pass
  // a stable `cacheKey` (e.g. the corpus path) amortize it exactly the
  // way a persisted index would; tests that rebuild intentionally pass
  // None.
  private val codebookMemo =
    new java.util.concurrent.ConcurrentHashMap[(String, Int, Int, Int), Seq[Seq[Double]]]()

  def ivfCodebook(e: org.apache.spark.sql.DataFrame, cells: Int = 32,
      iters: Int = 3, maxTrain: Int = 4096,
      cacheKey: Option[String] = None): Seq[Seq[Double]] = {
    cacheKey match {
      case Some(k) => codebookMemo.computeIfAbsent((k, cells, iters, maxTrain),
        _ => trainCodebook(e, cells, iters, maxTrain))
      case None => trainCodebook(e, cells, iters, maxTrain)
    }
  }

  private def trainCodebook(e: org.apache.spark.sql.DataFrame, cells: Int,
      iters: Int, maxTrain: Int): Seq[Seq[Double]] = {
    val s = e.sparkSession
    import s.implicits._
    val n = e.count()
    val stride = math.max(1L, n / cells)
    val seeds = e.filter(pmod(col("vec_id"), lit(stride)) === 0)
      .orderBy(col("vec_id")).limit(cells)
      .select(col("embedding")).as[Array[Float]].collect()
      .map(_.map(_.toDouble).toSeq).toSeq
    var cents = seeds.map { c =>
      val nrm = math.sqrt(c.map(x => x * x).sum)
      c.map(_ / nrm)
    }
    if (iters > 0) {
      val unit = e.orderBy(col("vec_id")).limit(maxTrain)
        .select(transform(col("embedding"),
          x => x.cast("double") / sqrt(dot(col("embedding"), col("embedding")))).as("u"))
        .cache()
      try {
        for (_ <- 0 until iters) {
          val assigned = unit.withColumn("cell",
            element_at(nearestCentroids($"u", cents, 1, native = false), 1))
          val sums = assigned.select($"cell", posexplode($"u"))
            .groupBy($"cell", $"pos")
            .agg(sum($"col".cast("decimal(28,14)")).as("s"), count(lit(1)).as("cnt"))
            .select($"cell", $"pos", $"s".cast("double").as("s"), $"cnt")
            .as[(Int, Int, Double, Long)].collect()
          val byCell = sums.groupBy(_._1)
          cents = cents.zipWithIndex.map { case (old, ci) =>
            byCell.get(ci) match {
              case None => old // empty cell keeps its centroid
              case Some(rows) =>
                val mean = rows.sortBy(_._2).map(r => r._3 / r._4)
                val nrm = math.sqrt(mean.map(x => x * x).sum)
                mean.map(_ / nrm).toSeq
            }
          }
        }
      } finally { unit.unpersist(); () }
    }
    cents
  }

  /** One scored candidate row for top-k aggregation. */
  case class Scored(qid: Long, nid: Long, sim: Double)

  /** Bounded top-k typed Aggregator: the buffer holds at most k
    * `(sim, nid)` entries ordered best-first (sim desc, nid asc as the
    * deterministic tie-break).
    *
    * This is the 1000-executor-safe top-k shape: partial aggregation
    * runs map-side per partition, so the shuffle carries only
    * `#partitions × k` rows per query key instead of the full corpus —
    * unlike `Window.partitionBy(qid)`, which funnels every scored row
    * through #queries reducers. */
  class TopK(k: Int) extends Aggregator[Scored, Seq[(Double, Long)], Seq[(Double, Long)]] {
    // (sim desc, nid asc): e ranks strictly before x
    private def before(e: (Double, Long), x: (Double, Long)): Boolean =
      e._1 > x._1 || (e._1 == x._1 && e._2 < x._2)
    // The buffer invariant: always ordered best-first, size <= k. Most
    // rows fail the `last` check and return the buffer untouched — O(1)
    // on the hot path, O(k) insertion otherwise; never a per-row sort.
    // Buffers dedup by nid: multi-table LSH candidates (q27) legitimately
    // present the same (query, neighbor) pair once per colliding table,
    // with bit-identical scores (the score is a pure function of the two
    // vectors) — keeping the first occurrence is exact, and saves the
    // shuffle a per-query `distinct` pre-pass would cost.
    def zero: Seq[(Double, Long)] = Nil
    def reduce(b: Seq[(Double, Long)], a: Scored): Seq[(Double, Long)] = {
      val e = (a.sim, a.nid)
      if (b.size >= k && !before(e, b.last)) b
      else if (b.exists(_._2 == a.nid)) b
      else {
        val i = b.indexWhere(x => before(e, x))
        val out = if (i < 0) b :+ e
        else { val (pre, post) = b.splitAt(i); (pre :+ e) ++ post }
        if (out.size > k) out.take(k) else out
      }
    }
    // linear merge of two ordered buffers, skipping already-taken nids
    def merge(x: Seq[(Double, Long)], y: Seq[(Double, Long)]): Seq[(Double, Long)] = {
      val out = scala.collection.mutable.ArrayBuffer.empty[(Double, Long)]
      var (i, j) = (0, 0)
      while (out.size < k && (i < x.size || j < y.size)) {
        val e = if (j >= y.size || (i < x.size && !before(y(j), x(i)))) {
          val v = x(i); i += 1; v
        } else { val v = y(j); j += 1; v }
        if (!out.exists(_._2 == e._2)) out += e
      }
      out.toSeq
    }
    def finish(r: Seq[(Double, Long)]): Seq[(Double, Long)] = r
    def bufferEncoder: Encoder[Seq[(Double, Long)]] = ExpressionEncoder()
    def outputEncoder: Encoder[Seq[(Double, Long)]] = ExpressionEncoder()
  }
}
