package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.Vectors
import graft.functions.Vectors.Scored

/** Similarity search over `embeddings` (`vec_id`, `embedding:
  * array<float>[64]`, `label`):
  *
  *  - q25: embedding-cosine near-dup pairs, blocked by the coarse
  *    `label` column (IVF-style bucketing: pairs are only scored within
  *    a block, never across the full cross product);
  *  - q26: brute-force cosine top-k via the bounded [[Vectors.TopK]]
  *    typed Aggregator (map-side partial top-k, shuffle carries only
  *    partitions×k rows);
  *  - q27: multi-table sign-LSH ANN variant of q26 (4 tables × 8
  *    planes, query-directed rank-pattern probing, recall@5 0.92 at
  *    ~0.47× brute-force volume) — approximate by design (the corpus
  *    is near-uniform random, so no ANN structure reaches recall 1),
  *    hence no SQL oracle: the driver records a rows-only check and
  *    `AnnSpec` pins its deterministic output;
  *  - q36: IVF ANN variant — 32-cell coarse codebook (stride seeds +
  *    3 spherical k-means rounds on a bounded sample, driver-collected,
  *    broadcast as literals), data vectors live in their nearest cell,
  *    queries probe their 10 nearest cells (recall@5 0.86 at ~0.31×
  *    brute-force volume). Same approximate-by-design caveat as q27.
  *
  * Raw cosine scores are intentionally not emitted: Spark folds in
  * double, DuckDB's `list_cosine_similarity` in float32 (~3e-8 apart),
  * and the corpus's smallest membership margins (7.6e-3 at the 0.42
  * threshold, 1.9e-5 at the rank-5/6 boundary) make *membership and
  * rank* engine-stable while raw floats are not.
  */
object QueriesSimilarity {

  private val NearDupTau = 0.42
  private val K = 5

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- near-dup pairs within label blocks ---------------------------
    "q25_embed_neardup" -> ((s, dir) => {
      import s.implicits._
      // norms are hoisted to a per-VECTOR projection before the pair
      // join (computing cosine whole per pair triples the interpreted
      // higher-order-function work: 2 of its 3 array folds depend on
      // one side only)
      val e = Tables.embeddingsWide(s, dir)
        .select($"label", $"vec_id", $"embedding",
          sqrt(Vectors.dotNative($"embedding", $"embedding")).as("nrm"))
      val a = e.select($"label", $"vec_id".as("a_id"), $"embedding".as("ea"), $"nrm".as("na"))
      val b = e.select($"label", $"vec_id".as("b_id"), $"embedding".as("eb"), $"nrm".as("nb"))
      a.join(b, Seq("label")).filter($"a_id" < $"b_id")
        .filter(Vectors.dotNative($"ea", $"eb") / ($"na" * $"nb") >= NearDupTau)
        .select($"a_id", $"b_id", $"label")
        .orderBy($"a_id", $"b_id")
    }),

    // ---- brute-force cosine top-k (typed TopK Aggregator) -------------
    "q26_cosine_topk" -> ((s, dir) => {
      import s.implicits._
      val e = Tables.embeddingsWide(s, dir)
      val q = e.filter($"vec_id" < 10)
        .select($"vec_id".as("qid"), $"embedding".as("qe"))
      topkTail(s, e.crossJoin(broadcast(q)))
    }),

    // ---- ANN: multi-table sign-LSH, query-directed probing ------------
    // L=4 independent 8-plane tables, each query probing its T=37
    // most-likely buckets per table (flip-sets over margin-rank
    // positions, best-first — Vectors.rankPatterns). On this
    // near-uniform corpus a true top-5 neighbor sits ~65° off its
    // query (per-plane flip p≈0.36), where single-table Hamming-ball
    // probing saturates: radius-2 on 6 planes measured recall@5 0.48.
    // Independent tables decorrelate the misses and rank-directed
    // probes spend the budget on the likely flips: measured recall@5
    // 0.92 (sf0.01) / 0.84 (sf0.1) at ~0.47× brute-force candidate
    // volume (AnnSpec pins both).
    //
    // Scale shape: corpus side is one codegen'd narrow scan (L×n dots
    // per row → L bucket ids, no shuffle); the posexplode is a 4×
    // fan-out INTO a broadcast-hash probe join, so the corpus is
    // never shuffled; duplicate candidates across tables are absorbed
    // by the nid-dedup TopK aggregator rather than a distinct
    // (which would cost a corpus-sized shuffle pre-rerank).
    "q27_cosine_topk_ann" -> ((s, dir) => {
      import s.implicits._
      val nTables = 4; val nPlanes = 8; val nProbes = 37
      val tables = Vectors.lshTables(nTables, nPlanes, dim = 64)
      val e = lshIndex(Tables.embeddingsWide(s, dir), tables, nPlanes)
      val corpus = e.select($"vec_id", $"embedding", posexplode($"buckets"))
        .withColumnRenamed("pos", "tbl").withColumnRenamed("col", "bucket")
      val patterns = Vectors.rankPatterns(nPlanes, nProbes, maxFlips = 4)
      val q = lshProbes(e.filter($"vec_id" < 10), tables, nPlanes, patterns)
      val scored = corpus.join(broadcast(q), Seq("tbl", "bucket"))
      topkTail(s, scored)
    }),

    // ---- ANN: IVF coarse quantizer + exact rerank within cells -------
    // Codebook: 32 stride-sampled seeds refined by 3 spherical k-means
    // rounds over a bounded deterministic train sample
    // (Vectors.ivfCodebook), still C×dim doubles — broadcastable at any
    // corpus size. nprobe=10 of 32 cells: measured recall@5 = 0.86
    // (sf0.01) / 0.82 (sf0.1) at ~0.31× the brute-force candidate
    // volume (pinned by AnnSpec). The old 8-cell/nprobe-3 unrefined
    // codebook sat at 0.64 recall for ~0.38× volume — refinement plus
    // finer cells buys +0.2 recall AND less work per query.
    "q36_cosine_topk_ivf" -> ((s, dir) => {
      import s.implicits._
      val e = Tables.embeddingsWide(s, dir)
      // cacheKey = corpus fingerprint: the codebook is built once per
      // corpus (an IVF index build) and reused by every probe, like a
      // persisted index — not retrained per query. corpusKey folds the
      // backing file's (mtime, size) in so in-place regeneration of the
      // testdata is a cache miss, never a stale codebook.
      val cents = Vectors.ivfCodebook(e.select($"vec_id", $"embedding"),
        cacheKey = Some(corpusKey(dir)))
      val assigned = e.withColumn("cell",
        element_at(Vectors.nearestCentroids($"embedding", cents, 1), 1))
      val q = assigned.filter($"vec_id" < 10)
        .select($"vec_id".as("qid"), $"embedding".as("qe"),
          explode(Vectors.nearestCentroids($"embedding", cents, 10)).as("cell"))
      val scored = assigned.join(q, Seq("cell"))
      topkTail(s, scored)
    }),

    // ---- SemDeDup: semantic dedup blocked by the k-means codebook ----
    // (Abbas et al. 2023 shape.) Where q25 blocks near-dup pairs by a
    // GIVEN coarse label, SemDeDup LEARNS the blocking: vectors are
    // assigned to their nearest IVF codebook cell and near-dup pairs
    // (cosine ≥ τ) are scored within cells only; each dup pair drops
    // its higher id, keeping the min-id representative (the
    // ConnectedComponents canonical-representative rule — deterministic,
    // unlike distance-to-centroid which ties on symmetric pairs).
    //
    // Scale: assignment is a narrow codegen'd map (centroids ride as
    // literals); the pair join shuffles on cell, so candidate volume is
    // Σ_c (n_c choose 2) ≪ n²/2 — SemDedupSpec measures the blocking
    // factor AND recall vs the all-pairs ground truth. Approximate by
    // design (pairs split across cells are unseen), so rows-only at the
    // gate; the codebook is deterministic (stride seeds + decimal-exact
    // means), making the output replay-identical.
    "q82_semdedup" -> ((s, dir) =>
      semDedup(Tables.embeddingsWide(s, dir),
        cacheKey = Some(corpusKey(dir)), tau = NearDupTau)),

    // ---- k-means (Lloyd) as a first-class clustering operator --------
    // Where q36/q82 use a codebook trained on a bounded SAMPLE, this is
    // the full-corpus distributed k-means a curation pipeline runs to
    // build that codebook at scale: k=8, stride-sampled seeds, two
    // exact Lloyd update rounds, final assignment emitted per vector.
    //
    // Scale shape per round: assignment is a narrow broadcast map
    // (centroids ride as k×dim literals — no join, no shuffle); the
    // update is one posexplode → (cluster, dim) hash aggregation —
    // dim×k groups, map-side combined, collected to the driver at
    // k×dim doubles regardless of corpus size. Iterations are lazily
    // chained plans (the PageRank pattern) with only the tiny centroid
    // collect materializing each round.
    //
    // Determinism: centroid means are rounded to 6 decimals (the
    // ivfCodebook decimal-exact-means contract — fp sum order vanishes
    // below the grid), so both engines assign against bit-identical
    // centroid literals; argmin margins are O(1) while cross-engine
    // dist fp noise is ~1e-13, and ties break (d2, cid). The oracle
    // unrolls the same two rounds as CTE stages.
    "q85_kmeans" -> ((s, dir) => {
      import s.implicits._
      val e = Tables.embeddings(s, dir).select($"vec_id", $"embedding")
      val k = 8
      val stride = e.count() / k
      require(stride > 0, s"k-means needs at least $k vectors")
      val seeds = e.filter($"vec_id" % stride === 0 && $"vec_id" < k * stride)
        .orderBy($"vec_id").collect()
        .map(r => (r.getLong(0) / stride,
          r.getSeq[Float](1).map(_.toDouble).toSeq)).toSeq
      def assign(cents: Seq[(Long, Seq[Double])]): DataFrame = {
        // d2 ordering via -2·v·c + |c|² (|v|² is cid-invariant)
        val scored = array(cents.map { case (cid, c) =>
          val c2 = c.map(x => x * x).sum
          struct((Vectors.dot($"embedding", typedLit(c)) * -2 + c2).as("d2p"),
            lit(cid).as("cid"))
        }: _*)
        e.withColumn("cluster",
          element_at(array_sort(scored), 1).getField("cid"))
      }
      def means(a: DataFrame): Seq[(Long, Seq[Double])] =
        a.select($"cluster", posexplode($"embedding"))
          .groupBy($"cluster", $"pos")
          .agg(round(avg($"col"), 6).as("m"))
          .groupBy($"cluster")
          .agg(array_sort(collect_list(struct($"pos", $"m"))).as("ms"))
          .collect().map { r =>
            (r.getLong(0), r.getSeq[org.apache.spark.sql.Row](1).map(_.getDouble(1)).toSeq)
          }.sortBy(_._1).toSeq
      val c1 = means(assign(seeds))
      val c2 = means(assign(c1))
      assign(c2).select($"vec_id", $"cluster").orderBy($"vec_id")
    }),

    // ---- int8 embedding quantization --------------------------------
    // Per-vector symmetric scalar quantization — the standard memory/
    // bandwidth dial for vector search at scale: scale = max|x|/127,
    // q_i = round(x_i/scale), so a float32 corpus shrinks 4× and the
    // int8 dot (scale_a·scale_b·Σ qa_i·qb_i ≈ ⟨a,b⟩) runs on quarter
    // the bytes. Everything here is engine-exact by construction:
    // max|x| is order-independent, x/scale + 0.5 → floor is the same
    // IEEE-double computation in Spark and DuckDB, and the emitted
    // stats (Σq, Σq², int8 dot against vec 0) are integer sums —
    // no fp aggregation order to diverge. One narrow scan, all
    // higher-order codegen'd expressions, no shuffle (the query
    // vector rides a 1-row broadcast).
    "q95_int8_quant" -> ((s, dir) => {
      import s.implicits._
      def maxAbs(c: Column): Column = aggregate(c, lit(0.0d),
        (acc, x) => greatest(acc, abs(x.cast("double"))))
      val base = Tables.embeddingsWide(s, dir)
        .withColumn("maxabs", maxAbs($"embedding"))
        .withColumn("scale",
          when($"maxabs" === 0.0d, lit(1.0d)).otherwise($"maxabs" / 127.0d))
        .withColumn("q", transform($"embedding",
          x => floor(x.cast("double") / $"scale" + lit(0.5d))))
      val query = base.filter($"vec_id" === 0L).select($"q".as("qq"))
      base.crossJoin(broadcast(query))
        .select($"vec_id", $"label",
          aggregate($"q", lit(0L), (a, x) => a + x).as("q_sum"),
          aggregate($"q", lit(0L), (a, x) => a + x * x).as("q_norm"),
          aggregate(zip_with($"q", $"qq", (a, b) => a * b), lit(0L),
            (a, x) => a + x).as("q_dot"))
        .orderBy($"vec_id")
    }),

    // ---- ANN: product quantization + ADC + exact re-rank -------------
    // (Jégou et al., the IVF-PQ memory dial.) Vectors are normalized
    // (on the unit sphere L2 ordering IS cosine ordering), split into
    // M=8 subspaces of 8 dims, each coded against its own 32-centroid
    // codebook: 64 float32 (256 B) become 8 five-bit codes (5 B) — the
    // ~50× compression that fits a 100 TB embedding corpus in cluster
    // RAM. Query scoring is ADC: per query one 8×32 lookup table of
    // partial squared distances (a tiny broadcast), the corpus scanned
    // as CODES ONLY — approx distance = 8 table lookups summed (no
    // float vector is touched until re-rank). The top-C=100 candidates
    // per query (bounded TopK aggregator — the shuffle carries 10×C
    // rows) are exactly re-ranked by true cosine: PQ sets recall,
    // re-rank makes precision of the final ordering exact. Measured
    // recall@5: 0.94 at sf0.01 (C/n = 0.2), 0.80 at sf0.1 (C/n = 0.05
    // — the ratio shrank 4×, recall held). Codebooks are deterministic
    // (stride seeds + two decimal-exact-means refinement rounds) and
    // partial distances sum in sorted subspace order, so the output is
    // replay-identical. Approximate by design (rows-only at the gate);
    // PqAnnSpec pins recall/volume floors.
    "q97_pq_ann" -> ((s, dir) =>
      pqAnn(s, Tables.embeddingsWide(s, dir), cacheKey = Some(corpusKey(dir)))),

    // ---- persisted, incrementally-maintained PQ index (X91) -----------
    // Where q97 derives codebook + codes IN the query plan, this is the
    // 100 TB shape: the embedding corpus lands in a graft table over two
    // commits, a PqIndexStream materializes the PQ codes as a SECOND
    // graft table maintained from the upstream commit log (codebook
    // train-once, committed to the index's meta channel; each drain
    // encodes only new commits' files), and the query is served FROM the
    // index — ADC over the stored codes + exact re-rank, no training and
    // no corpus-wide encode in the plan. Deterministic encode makes the
    // served result bit-identical to q97's recompute on the same corpus;
    // PqIndexSpec pins that equality plus incremental maintenance and
    // crash-replay no-ops. Approximate by design (rows-only gate), same
    // recall floors as q97.
    "q147_pq_index_ann" -> ((s, dir) => {
      import s.implicits._
      val tmp = graft.QueryTmp.dir("graft_q147_")
      val up = graft.table.IncrementalTable(s, s"$tmp/emb/v1")
      val down = graft.table.IncrementalTable(s, s"$tmp/pqidx/v1")
      val e = Tables.embeddings(s, dir).select($"vec_id", $"embedding")
      up.append(e.filter($"vec_id" % 2 === 0), partitionBy = Nil)
      up.append(e.filter($"vec_id" % 2 === 1), partitionBy = Nil)
      val idx = new graft.streaming.PqIndexStream(s, up, down)
      idx.drain()
      idx.query(up.read().filter($"vec_id" < 10)
        .select($"vec_id", $"embedding"))
    }),
  )

  /** Memo key that names the CORPUS, not the path: the driver has
    * rewritten testdata in place between rounds (ADVICE r5 #1), and a
    * bare-path key would then serve codebooks trained on the old bytes
    * for the JVM's lifetime. Folding the backing file's (mtime, size)
    * into the key makes regeneration a cache miss. */
  private def corpusKey(dir: String): String = {
    val f = new java.io.File(s"$dir/embeddings.parquet")
    s"$dir@${f.lastModified}:${f.length}"
  }

  // PQ codebook memo — same contract as Vectors.ivfCodebook: the
  // sub-codebooks are a pure deterministic function of (corpus, M,
  // Ksub), built ONCE per index and probed by every query; a stable
  // cacheKey amortizes the two refinement rounds exactly as a
  // persisted index would (M×Ksub×subDim doubles — trivially
  // driver-resident and broadcastable at any corpus size). Tests that
  // rebuild intentionally pass None. The key must CHANGE when the
  // corpus does (it names the corpus, not the path's current bytes):
  // a long-lived JVM whose data is rewritten in place must key by
  // corpus version, or pass None — same caveat as ivfCodebook.
  private val pqMemo = new java.util.concurrent.ConcurrentHashMap[
    (String, Int, Int), Seq[(Int, Int, Seq[Double])]]()

  // ---- PQ core, shared by the in-plan q97 and the PERSISTED index ----
  // (streaming.PqIndexStream). All four stages are deterministic, so
  // "maintained index" and "recompute" are bit-identical on the same
  // corpus — PqIndexSpec pins that equality.
  private[graft] val PqM = 8
  private[graft] val PqKsub = 32
  private val PqSubDim = 8
  private val PqRerankC = 100

  /** Unit-normalized per-subspace pieces: (vec_id, sub, subvec). Pure
    * per-row — the shape both training and encoding consume. */
  private[graft] def pqPieces(s: SparkSession, raw: DataFrame): DataFrame = {
    import s.implicits._
    val e = raw.select($"vec_id",
      transform($"embedding", x => x.cast("double") /
        sqrt(Vectors.dotNative($"embedding", $"embedding"))).as("ne"))
    e.select($"vec_id",
        explode(array((0 until PqM).map(lit): _*)).as("sub"), $"ne")
      .withColumn("subvec", slice($"ne", $"sub" * PqSubDim + 1, lit(PqSubDim)))
      .select($"vec_id", $"sub", $"subvec")
  }

  private def pqAssign(s: SparkSession, pieces: DataFrame,
      cents: DataFrame): DataFrame = {
    import s.implicits._
    pieces.join(broadcast(cents), Seq("sub"))
      .withColumn("d2", aggregate(
        zip_with($"subvec", $"cvec", (a, b) => (a - b) * (a - b)),
        lit(0.0d), (acc, x) => acc + x))
      .groupBy($"vec_id", $"sub")
      .agg(min(struct($"d2", $"cid")).getField("cid").as("cid"))
  }

  /** Codebook build = INDEX BUILD: one bounded count + stride seeds,
    * then two refinement rounds with 6-decimal-rounded means (the
    * ivfCodebook replay-identity contract); centroids are
    * M×Ksub×subDim doubles — broadcastable at any corpus size. */
  private[graft] def pqTrain(s: SparkSession,
      raw: DataFrame): Seq[(Int, Int, Seq[Double])] = {
    import s.implicits._
    // pieces feeds FIVE downstream subtrees (seed join + 2×(assign +
    // re-join) across the refinement rounds); unpersisted, each one
    // re-read the corpus and re-ran normalize + 8-way explode —
    // measured as the dominant leg of the q147 index build (guide §5:
    // persist exactly when a frame is reused and recompute is the
    // expensive side). Values are unchanged — persist is a plan
    // boundary, not a semantic one; freed before return.
    val pieces = pqPieces(s, raw).persist()
    try {
      val n = raw.count()
      val stride = math.max(1L, n / PqKsub)
      val seedMap = (0 until PqKsub).map(i => (i * stride, i)).toDF("vec_id", "cid")
      val cents0 = pieces.join(broadcast(seedMap), "vec_id")
        .select($"sub", $"cid", $"subvec".as("cvec"))
      def refine(cents: DataFrame): DataFrame =
        pqAssign(s, pieces, cents).join(pieces, Seq("vec_id", "sub"))
          .select($"sub", $"cid", posexplode($"subvec"))
          .groupBy($"sub", $"cid", $"pos").agg(round(avg($"col"), 6).as("m"))
          .groupBy($"sub", $"cid")
          .agg(array_sort(collect_list(struct($"pos", $"m"))).as("ms"))
          .select($"sub", $"cid", transform($"ms", p => p.getField("m")).as("cvec"))
      refine(refine(cents0))
        .select($"sub", $"cid", $"cvec")
        .as[(Int, Int, Seq[Double])].collect().toSeq
    } finally { pieces.unpersist(); () }
  }

  /** Encode vectors against a FIXED codebook → (vec_id, sub, cid).
    * Pure per-row, so incremental batches encode independently — the
    * index-maintenance transform. */
  private[graft] def pqCodes(s: SparkSession, raw: DataFrame,
      centRows: Seq[(Int, Int, Seq[Double])]): DataFrame = {
    import s.implicits._
    pqAssign(s, pqPieces(s, raw), centRows.toDF("sub", "cid", "cvec"))
  }

  /** ADC + exact re-rank over PRE-COMPUTED codes — the query-time path
    * of the persisted index: no training and no corpus-wide encode in
    * this plan; the corpus is touched as codes until the bounded
    * re-rank reads the C=100 candidate float vectors. */
  private[graft] def pqQueryCodes(s: SparkSession, queries: DataFrame,
      corpus: DataFrame, codes: DataFrame,
      centRows: Seq[(Int, Int, Seq[Double])]): DataFrame = {
    import s.implicits._
    val cents1 = centRows.toDF("sub", "cid", "cvec")
    // ADC lookup tables: per (query, sub, cid) partial squared distance
    val dtab = pqPieces(s, queries).join(broadcast(cents1), Seq("sub"))
      .withColumn("pd", aggregate(
        zip_with($"subvec", $"cvec", (a, b) => (a - b) * (a - b)),
        lit(0.0d), (acc, x) => acc + x))
      .select($"vec_id".as("qid"), $"sub", $"cid", $"pd")

    // approx distance = 8 lookups summed in sorted subspace order
    // (deterministic fp order -> replay-identical candidates)
    val approx = codes.join(broadcast(dtab), Seq("sub", "cid"))
      .groupBy($"qid", $"vec_id")
      .agg(aggregate(
        array_sort(collect_list(struct($"sub", $"pd"))),
        lit(0.0d), (acc, x) => acc + x.getField("pd")).as("ad"))
      .filter($"qid" =!= $"vec_id")

    val scored = approx.select($"qid", $"vec_id".as("nid"), (-$"ad").as("sim"))
      .as[Scored]
    val topc = new Vectors.TopK(PqRerankC).toColumn
    val cands = scored.groupByKey(_.qid).agg(topc.name("top"))
      .flatMap { case (qid, tops) => tops.map { case (_, nid) => (qid, nid) } }
      .toDF("qid", "vec_id")
    val qe = queries.select($"vec_id".as("qid"), $"embedding".as("qe"))
    topkTail(s, cands
      .join(corpus.select($"vec_id", $"embedding"), "vec_id")
      .join(broadcast(qe), "qid"))
  }

  private[graft] def pqAnn(s: SparkSession, raw: DataFrame,
      cacheKey: Option[String] = None): DataFrame = {
    import s.implicits._
    val centRows = cacheKey match {
      case Some(k) =>
        pqMemo.computeIfAbsent((k, PqM, PqKsub), _ => pqTrain(s, raw))
      case None => pqTrain(s, raw)
    }
    val codes = pqCodes(s, raw, centRows) // the stored index: (vec_id, sub, cid)
    pqQueryCodes(s, raw.filter($"vec_id" < 10), raw, codes, centRows)
  }

  /** SemDeDup core: assign every vector to its nearest codebook cell,
    * score pairs within cells, drop the higher id of each dup pair.
    * Returns (dropped_id, kept_id, cell) sorted. Recall depends on the
    * dup geometry: ≈1 when dups are near-identical (the intended
    * τ→1 regime — jittered copies land in their original's cell except
    * at cell boundaries; SemDedupSpec pins recall ≥0.99, measured 0.996,
    * on a constructed dup corpus), and
    * degrades as pairs approach the blocking resolution (this synthetic
    * corpus's planted pairs sit AT the τ=0.42 boundary, ~64° apart —
    * the adversarial case, measured and pinned as a floor). Precision
    * is exact in every regime: flagged pairs passed the cosine verify. */
  private[graft] def semDedup(e: DataFrame, cacheKey: Option[String],
      tau: Double): DataFrame = {
    import e.sparkSession.implicits._
    val cents = Vectors.ivfCodebook(e.select($"vec_id", $"embedding"),
      cacheKey = cacheKey)
    val assigned = e.select($"vec_id", $"embedding",
        sqrt(Vectors.dotNative($"embedding", $"embedding")).as("nrm"))
      .withColumn("cell",
        element_at(Vectors.nearestCentroids($"embedding", cents, 1), 1))
    val a = assigned.select($"cell", $"vec_id".as("a_id"),
      $"embedding".as("ea"), $"nrm".as("na"))
    val b = assigned.select($"cell", $"vec_id".as("b_id"),
      $"embedding".as("eb"), $"nrm".as("nb"))
    a.join(b, Seq("cell")).filter($"a_id" < $"b_id")
      .filter(Vectors.dotNative($"ea", $"eb") / ($"na" * $"nb") >= tau)
      .groupBy($"b_id".as("dropped_id"))
      .agg(min($"a_id").as("kept_id"), min($"cell").cast("long").as("cell"))
      .orderBy($"dropped_id")
  }

  /** Corpus-side LSH index column: per-table bucket ids from ONE
    * native `vec_lsh_buckets` pass over the concatenated plane bank.
    * The history here is a perf graveyard the q27 Scaladoc summarizes:
    * 32 separate `vec_dot` calls blew the stage past Janino's method
    * limit (interpreted fallback, ~200µs/row); `vec_mat_dot` + 32
    * `element_at` sign terms composed into a fused Generate stage
    * whose GENERATED code ran ~1000× slower than interpreted eval.
    * One expression computing the bucket array directly keeps the
    * scan at Scan→Project(1 expr)→Generate — measured fast, and the
    * plan stays that shape at any table count. */
  private[graft] def lshIndex(df: DataFrame,
      tables: Seq[Seq[Seq[Double]]], nPlanes: Int): DataFrame = {
    val s = df.sparkSession
    import s.implicits._
    df.withColumn("buckets",
      Vectors.lshBucketsNative($"embedding", tables.flatten, nPlanes))
  }

  /** Query-side probe set for multi-table sign-LSH: each query row
    * fans out to (tbl, bucket) probe rows — its own bucket per table
    * XOR each rank-pattern mask over that table's margin argsort.
    * Margins come from the SAME `_proj` column the buckets derive
    * from (no second projection pass).
    *
    * The probe set is DATA-driven, not expression-driven: the rank
    * patterns ship as an array-of-arrays LITERAL that the row explodes
    * over, and the mask folds with higher-order functions. The first
    * cut built 148 struct expressions (one per table×pattern) into a
    * single Generate — the generated method blew Janino's 64KB limit,
    * every job re-attempted the ~10 s compile, failed, and ran
    * interpreted. As data, the probe count never changes the plan
    * size; the HOF fold is interpreted but touches only query rows.
    *
    * `q` must carry `vec_id`, `embedding`, and `buckets` (see
    * [[lshIndex]]); the margin projections are recomputed here — query
    * rows are few, and the corpus scan stays projection-free. */
  private[graft] def lshProbes(q: DataFrame, tables: Seq[Seq[Seq[Double]]],
      nPlanes: Int, patterns: Seq[Seq[Int]]): DataFrame = {
    val s = q.sparkSession
    import s.implicits._
    val nTables = tables.size
    val patLit = typedLit(patterns.map(_.map(_ + 1))) // 1-based rank positions
    // per-table margin argsort: array<array<int>>, rank r -> plane idx
    val sidx = transform(sequence(lit(0), lit(nTables - 1)), l =>
      transform(
        array_sort(transform(sequence(lit(0), lit(nPlanes - 1)), i =>
          struct(abs(element_at($"_proj", l * lit(nPlanes) + i + 1)).as("m"),
            i.as("i")))),
        x => x.getField("i")))
    q.withColumn("_proj", Vectors.matDotNative($"embedding", tables.flatten))
      .withColumn("_sidx", sidx)
      .select($"vec_id".as("qid"), $"embedding".as("qe"), $"buckets", $"_sidx",
        explode(sequence(lit(0), lit(nTables - 1))).as("tbl"))
      .select($"qid", $"qe", $"tbl", $"buckets", $"_sidx",
        explode(patLit).as("pat"))
      .select($"qid", $"qe", $"tbl",
        element_at($"buckets", $"tbl" + 1).bitwiseXOR(
          aggregate($"pat", lit(0), (acc, j) => acc.bitwiseOR(
            call_function("shiftleft", lit(1),
              element_at(element_at($"_sidx", $"tbl" + 1), j)))))
          .as("bucket"))
  }

  /** Shared ANN tail: score candidate (query, neighbor) rows with the
    * codegen'd cosine, then bounded map-side top-k per query. */
  private def topkTail(s: SparkSession, cands: DataFrame): DataFrame = {
    import s.implicits._
    val scored = cands
      .filter($"vec_id" =!= $"qid")
      .select($"qid", $"vec_id".as("nid"),
        Vectors.cosineNative($"qe", $"embedding").as("sim"))
      .as[Scored]
    val top = new Vectors.TopK(K).toColumn
    scored.groupByKey(_.qid).agg(top.name("top"))
      .flatMap { case (qid, tops) =>
        tops.zipWithIndex.map { case ((_, nid), i) => (qid, (i + 1).toLong, nid) }
      }
      .toDF("q_id", "rnk", "n_id")
      .orderBy($"q_id", $"rnk")
  }

  /** q85 oracle stages: assignment = argmin over the same
    * -2·v·c + |c|² ordering the Spark side uses (|v|² is cid-invariant),
    * tie (d2, cid); update = 6-decimal-rounded per-dimension means. */
  private def kmAssignSql(cTbl: String): String =
    s"""SELECT vec_id, cid AS cluster FROM (
       |  SELECT e.vec_id, $cTbl.cid, row_number() OVER (PARTITION BY e.vec_id
       |    ORDER BY list_sum(list_transform(range(1, 65),
       |        i -> e.v[i] * $cTbl.c[i])) * -2
       |      + list_sum(list_transform($cTbl.c, x -> x * x)),
       |      $cTbl.cid) AS rn
       |  FROM e, $cTbl) WHERE rn = 1""".stripMargin
  private def kmMeansSql(aTbl: String): String =
    s"""SELECT cluster AS cid, list(m ORDER BY i) AS c FROM (
       |  SELECT a.cluster, t.i, round(AVG(e.v[t.i]), 6) AS m
       |  FROM $aTbl a JOIN e USING (vec_id), range(1, 65) AS t(i)
       |  GROUP BY a.cluster, t.i) GROUP BY cluster""".stripMargin

  def oracleSql: Map[String, String] = Map(
    "q85_kmeans" ->
      s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
         |           FROM embeddings),
         |p AS (SELECT COUNT(*) // 8 AS stride FROM e),
         |c0 AS (SELECT CAST(vec_id // stride AS BIGINT) AS cid, v AS c
         |       FROM e, p WHERE vec_id % stride = 0 AND vec_id < 8 * stride),
         |a1 AS (${kmAssignSql("c0")}),
         |c1 AS (${kmMeansSql("a1")}),
         |a2 AS (${kmAssignSql("c1")}),
         |c2 AS (${kmMeansSql("a2")}),
         |a3 AS (${kmAssignSql("c2")})
         |SELECT vec_id, cluster FROM a3 ORDER BY vec_id""".stripMargin,
    "q25_embed_neardup" ->
      s"""SELECT a.vec_id AS a_id, b.vec_id AS b_id, a.label
         |FROM embeddings a JOIN embeddings b
         |  ON a.label = b.label AND a.vec_id < b.vec_id
         |WHERE list_cosine_similarity(a.embedding, b.embedding) >= $NearDupTau
         |ORDER BY a_id, b_id""".stripMargin,
    "q26_cosine_topk" ->
      s"""WITH q AS (
         |  SELECT vec_id AS q_id, embedding AS qe FROM embeddings WHERE vec_id < 10),
         |s AS (
         |  SELECT q_id, e.vec_id AS n_id,
         |    list_cosine_similarity(qe, e.embedding) AS sim
         |  FROM q, embeddings e WHERE e.vec_id <> q_id),
         |r AS (
         |  SELECT q_id, n_id,
         |    CAST(row_number() OVER (PARTITION BY q_id ORDER BY sim DESC, n_id) AS BIGINT) AS rnk
         |  FROM s)
         |SELECT q_id, rnk, n_id FROM r WHERE rnk <= $K ORDER BY q_id, rnk""".stripMargin,
    "q95_int8_quant" ->
      """WITH b AS (
        |  SELECT vec_id, label,
        |    list_max(list_transform(embedding,
        |      x -> abs(CAST(x AS DOUBLE)))) AS maxabs,
        |    embedding
        |  FROM embeddings),
        |qv AS (
        |  SELECT vec_id, label,
        |    list_transform(embedding, x -> CAST(floor(
        |      CAST(x AS DOUBLE) /
        |        (CASE WHEN maxabs = 0 THEN 1.0 ELSE maxabs / 127.0 END)
        |      + 0.5) AS BIGINT)) AS q
        |  FROM b),
        |qq AS (SELECT q AS qref FROM qv WHERE vec_id = 0)
        |SELECT vec_id, label,
        |  CAST(list_sum(q) AS BIGINT) AS q_sum,
        |  CAST(list_sum(list_transform(q, x -> x * x)) AS BIGINT) AS q_norm,
        |  CAST(list_dot_product(
        |    CAST(q AS DOUBLE[]), CAST(qref AS DOUBLE[])) AS BIGINT) AS q_dot
        |FROM qv, qq
        |ORDER BY vec_id""".stripMargin,
  )
}
