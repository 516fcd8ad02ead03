package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Near-duplicate detection over document collections, built shuffle-first
  * for the 100 TB case: every method generates candidate pairs through a
  * key-partitioned join (inverted index, MinHash band buckets, or SimHash
  * chunk buckets) and then verifies candidates with exact set arithmetic.
  * Nothing here ever materializes the all-pairs cross product.
  *
  * Output contract shared by all pair producers: `(a_id, b_id, jaccard)`
  * with `a_id < b_id` and `jaccard` the exact word-shingle Jaccard — so
  * the approximate methods (MinHash, SimHash) are verified against the
  * same engine-neutral measure the DuckDB oracle computes. The
  * probabilistic stage only affects *recall* of candidate generation;
  * precision is exact by construction.
  *
  * Scale notes:
  *  - the inverted-index join keys on the shingle string; shingle
  *    document-frequency is the skew axis (a stop-shingle appearing in
  *    k docs contributes k² candidate rows). At 100 TB add a df-cap
  *    (drop shingles with df > threshold from candidate generation) —
  *    kept OFF here because the exact oracle needs full recall and the
  *    test corpus's max df is 25;
  *  - MinHash banding is the textbook scale path: cost is O(docs ×
  *    bands) rows through one shuffle, buckets are tiny, and the band
  *    count tunes the J-threshold S-curve (b=16, r=4 ⇒ miss prob at
  *    J=0.9 is (1-0.9⁴)¹⁶ ≈ 4e-8);
  *  - SimHash chunking gives a *deterministic* recall floor via
  *    pigeonhole: with 8 chunks of 8 bits, any pair within Hamming
  *    distance 7 shares at least one full chunk.
  */
object Dedup {

  /** Exact duplicate groups: hash-partitioned groupBy on the content
    * fingerprint; keep-first = min(id). One shuffle, no skew beyond true
    * duplicate group sizes. */
  def exactGroups(docs: DataFrame, id: Column, text: Column): DataFrame =
    docs.groupBy(TextOps.fingerprint(text).as("fp"))
      .agg(min(id).as("keep_id"), count(lit(1)).as("n_copies"))

  /** `(did, sh)` exploded distinct doc→shingle edges — the inverted
    * index in relational form. */
  private def edges(docs: DataFrame, id: Column, shingles: Column): DataFrame =
    docs.select(id.as("did"), explode(shingles).as("sh"))

  /** Exact n-gram-Jaccard near-dup pairs via inverted-index candidate
    * join: pairs sharing >= 1 shingle get their intersection size from a
    * (shingle)-keyed self-join + count, so only co-occurring pairs are
    * ever materialized. A pair with J >= tau > 0 shares a shingle by
    * definition, so recall is exact.
    *
    * `dfCap` is the skew kill-switch for the 100 TB case: a shingle
    * appearing in k documents contributes k² candidate rows, so one
    * stop-shingle (df in the millions) can dominate the whole join.
    * With a cap set, shingles above it are excluded from CANDIDATE
    * GENERATION only, and the surviving pairs are scored through the
    * exact array-intersection verify path — reported Jaccard values
    * stay exact, and the per-key join fan-out is hard-bounded at cap².
    * The trade is recall: a pair whose shared shingles are ALL high-df
    * is missed. On real corpora near-dup pairs share discriminative
    * (low-df) shingles, so output is typically unchanged — which
    * DedupSpec pins on this corpus. Off by default because the exact
    * oracle demands unconditional recall. */
  def ngramJaccardPairs(docs: DataFrame, id: Column, text: Column,
                        n: Int, tau: Double, dfCap: Option[Long] = None): DataFrame = {
    val e = edges(docs, id, TextOps.wordShingles(text, n))
    dfCap match {
      case None =>
        // one-pass: the co-occurrence join IS the intersection count
        val sizes = e.groupBy(col("did")).agg(count(lit(1)).as("nsh"))
        val inter = e.as("x").join(e.as("y"), col("x.sh") === col("y.sh") &&
            col("x.did") < col("y.did"))
          .groupBy(col("x.did").as("a_id"), col("y.did").as("b_id"))
          .agg(count(lit(1)).as("li"))
        withJaccard(inter, sizes).filter(col("jaccard") >= tau)
          .select(col("a_id"), col("b_id"), col("jaccard"))
      case Some(cap) =>
        val rare = e.groupBy(col("sh")).agg(count(lit(1)).as("df"))
          .filter(col("df") <= cap).select(col("sh"))
        val cand = e.join(rare, "sh")
        val pairs = cand.as("x").join(cand.as("y"), col("x.sh") === col("y.sh") &&
            col("x.did") < col("y.did"))
          .select(col("x.did").as("a_id"), col("y.did").as("b_id"))
          .distinct()
        verify(pairs, docs, id, text, n, tau)
    }
  }

  /** jaccard = |A∩B| / (|A| + |B| - |A∩B|) from a pair frame carrying
    * `li` (intersection size). Exact long arithmetic + one IEEE division
    * — bit-identical to the DuckDB oracle. */
  private def withJaccard(pairs: DataFrame, sizes: DataFrame): DataFrame =
    pairs
      .join(sizes.withColumnRenamed("did", "a_id").withColumnRenamed("nsh", "na"), "a_id")
      .join(sizes.withColumnRenamed("did", "b_id").withColumnRenamed("nsh", "nb"), "b_id")
      .withColumn("jaccard",
        col("li").cast("double") / (col("na") + col("nb") - col("li")).cast("double"))

  /** Exact-verify candidate `(a_id, b_id)` pairs against the true
    * shingle Jaccard. Candidates are few (near-dups + band collisions),
    * so the array join is cheap at any scale. */
  private def verify(cands: DataFrame, docs: DataFrame, id: Column,
                     text: Column, n: Int, tau: Double): DataFrame = {
    // semi-join FIRST, shingle second: candidates are few by
    // construction, docs is the corpus — without the prune each `sets`
    // leg re-tokenized and re-shingled EVERY document just to have the
    // candidate join drop almost all of them (the join filters rows,
    // not the projection work below it). At 100 TB this is the
    // difference between shingling the corpus twice more and shingling
    // only the colliding pairs. The candidate frame feeds TWO consumers
    // now (the id prune and the final join), so it is materialized once
    // — candidate generation is the expensive self-join leg and must
    // not replay per consumer.
    val pinned = cands.localCheckpoint(true)
    val candIds = pinned.select(col("a_id").as("__cid"))
      .unionByName(pinned.select(col("b_id").as("__cid"))).distinct()
    val sets = docs.select(id.as("did"), text.as("__txt"))
      .join(candIds.withColumnRenamed("__cid", "did"), Seq("did"), "left_semi")
      .select(col("did"), TextOps.wordShingles(col("__txt"), n).as("shs"))
    pinned
      .join(sets.select(col("did").as("a_id"), col("shs").as("sa")), "a_id")
      .join(sets.select(col("did").as("b_id"), col("shs").as("sb")), "b_id")
      .withColumn("li", size(array_intersect(col("sa"), col("sb"))).cast("long"))
      .withColumn("jaccard",
        col("li").cast("double")
          / (size(col("sa")) + size(col("sb")) - col("li")).cast("double"))
      .filter(col("jaccard") >= tau)
      .select(col("a_id"), col("b_id"), col("jaccard"))
  }

  /** Banded LSH keys per doc: `(did, band, bkey)` — the 64-perm
    * minhash signature sliced into `perms/r` md5 band keys. Pure
    * per-doc, so incremental batches band independently: this is the
    * INDEX UNIT the streaming near-dup dedup persists (X95).
    *
    * Wide one-pass signature in ONE native aggregate (long[64] buffer,
    * map-side partial merge) — NO perms× row explosion (the naive
    * explode shuffles |edges|×perms rows; 96M at sf0.1), and no 64
    * separate min() buffer columns (past 50 slots HashAggregate drops
    * its fast hash map). Permutation hashes are the 2-universal
    * h1 + i*h2 family (Broder), so each edge row pays TWO shingle
    * hashes + 64 adds instead of 64 seeded xxhash64 passes. */
  def minhashBands(docs: DataFrame, id: Column, text: Column,
      n: Int, perms: Int = 64, r: Int = 4): DataFrame = {
    require(perms == 64, s"minhash_agg is fixed at 64 permutations, got $perms")
    val e = edges(docs, id, TextOps.wordShingles(text, n))
    val sig = e.groupBy(col("did")).agg(
      call_function("minhash_agg", xxhash64(col("sh")),
        xxhash64(col("sh"), lit(0x9E3779B97F4A7C15L))).as("sig"))
    // one row per (doc, band); band key = md5 of its r signature slots
    val bandCol = array((0 until perms / r).map { b =>
      struct(lit(b).as("band"),
        md5(concat_ws(",", (b * r until (b + 1) * r).map(i =>
            element_at(col("sig"), i + 1)): _*)
          .cast("binary")).as("bkey"))
    }: _*)
    sig.select(col("did"), explode(bandCol).as("bk"))
      .select(col("did"), col("bk.band").as("band"), col("bk.bkey").as("bkey"))
  }

  /** MinHash+LSH near-dup pairs: `perms` seeded hash permutations
    * (xxhash64 salted by permutation index), banded into `perms/r`
    * buckets of `r` rows each; docs colliding on a full band become
    * candidates, then exact-verified at `tau`. */
  def minhashLshPairs(docs: DataFrame, id: Column, text: Column,
                      n: Int, tau: Double, perms: Int = 64, r: Int = 4): DataFrame = {
    val bands = minhashBands(docs, id, text, n, perms, r)
    val cands = bands.as("x").join(bands.as("y"),
        col("x.band") === col("y.band") && col("x.bkey") === col("y.bkey") &&
          col("x.did") < col("y.did"))
      .select(col("x.did").as("a_id"), col("y.did").as("b_id"))
      .distinct()
    verify(cands, docs, id, text, n, tau)
  }

  /** 64-bit SimHash per doc: bit j of the sketch is the sign of the sum
    * of ±1 votes from each distinct feature's xxhash64 bit j. Returns
    * (did, simhash).
    *
    * `features` must be the DISCRIMINATIVE unit — word shingles here.
    * Token-level simhash is useless on shared-vocabulary corpora: every
    * doc contains mostly the same tokens, so sketches nearly collide
    * (measured on this corpus: median token-simhash Hamming between
    * RANDOM pairs was 14, putting 56% of all pairs inside the radius-15
    * filter and making candidate verification quadratic). With shingle
    * features the same measurement gives true pairs <= 11 and random
    * pairs >= 16 — full separation.
    *
    * Computed as 64 wide conditional-sum aggregates in ONE pass over the
    * (doc, feature) rows — map-side partial aggregation, no 64× bit-row
    * explosion (the naive explode made this the slowest operator in the
    * suite: 19M shuffled rows and two extra aggregations at sf0.1). */
  def simhash(docs: DataFrame, id: Column, features: Column): DataFrame = {
    val toks = docs.select(id.as("did"), explode(features).as("tok"))
      .withColumn("h", xxhash64(col("tok")))
    // One native TypedImperativeAggregate (long[64] buffer, branch-free
    // update loop, map-side partial merge) instead of 64 declarative
    // sum(when...) columns: past 50 buffer slots HashAggregate drops
    // its vectorized fast map, and each row paid 64 separate expression
    // trees. Measured at sf0.1: q24 4.24->3.49 s, q47 5.34->4.50 s
    // (whole query incl. shingling+join; the agg stage shrank more).
    toks.groupBy(col("did"))
      .agg(call_function("simhash_agg", col("h")).as("simhash"))
  }

  /** Near-equal bit-slice layout of a `bits`-wide sketch: `(offset,
    * width)` per chunk, the first `bits % nChunks` chunks one bit
    * wider. Shared by the 64- and 128-bit pair generators and their
    * cost-measurement specs. */
  private[graft] def chunkLayout(bits: Int, nChunks: Int): Seq[(Int, Int)] = {
    val base = bits / nChunks
    val widths = Seq.tabulate(nChunks)(i => if (i < bits % nChunks) base + 1 else base)
    widths.scanLeft(0)(_ + _).zip(widths)
  }

  /** SimHash near-dup pairs: bucket the 64-bit sketch into `nChunks`
    * near-equal bit slices (pigeonhole: Hamming <= nChunks-1 ⇒ >= 1
    * shared chunk, so recall is deterministic up to that radius), filter
    * candidates by true Hamming distance, then exact-verify at `tau` for
    * an engine-neutral output.
    *
    * `nChunks` is the recall/cost dial: fewer, wider chunks mean finer
    * buckets (fewer chance collisions ⇒ fewer candidate pairs) but a
    * smaller guaranteed radius. The default 14 (radius 13) carries a
    * >= 2-bit margin over this corpus's measured true-pair maximum
    * (Hamming 11 at sf0.1, 10 at sf0.01); the earlier 16×4-bit layout
    * (radius 15) generated ~1.6× the candidates for radius the data
    * never used. At 100 TB widen the sketch instead —
    * [[simhash128Pairs]] is that dial implemented — or re-measure the
    * margin; the verify stage keeps precision exact regardless. */
  def simhashPairs(docs: DataFrame, id: Column, text: Column,
                   n: Int, tau: Double, nChunks: Int = 14): DataFrame = {
    val maxHamming = nChunks - 1
    val layout = chunkLayout(64, nChunks)
    val sh = simhash(docs, id, TextOps.wordShingles(text, n))
    // the (c, v) self-join's INPUT is sketch-sized (8 B/doc) but its
    // OUTPUT is the candidate stream — AQE coalesces the exchange by
    // input bytes and collapsed the whole bucket-join + Hamming +
    // verify cascade to ONE task (measured: the two dominant q24/q47
    // stages ran single-threaded on 32 cores). An explicit keyed
    // repartition at the session's parallelism pins the exchange;
    // (c, v) is the join key, so no extra shuffle is introduced.
    val par = docs.sparkSession.sparkContext.defaultParallelism
    val chunks = sh.select(col("did"), col("simhash"),
        explode(array(layout.zipWithIndex.map { case ((off, w), c) =>
          val mask = (1L << w) - 1
          struct(lit(c).as("c"), expr(s"(simhash >> $off) & $mask").as("v"))
        }: _*)).as("ch"))
      .select(col("did"), col("simhash"), col("ch.c").as("c"), col("ch.v").as("v"))
      .repartition(par, col("c"), col("v"))
    // Hamming filter runs INSIDE the join output, before the dedup
    // shuffle: chunk buckets collide freely (the price of the radius
    // guarantee), so the candidate stream is the big intermediate — only
    // survivors reach distinct().
    val cands = chunks.as("x").join(chunks.as("y"),
        col("x.c") === col("y.c") && col("x.v") === col("y.v") &&
          col("x.did") < col("y.did"))
      .filter(bit_count(expr("x.simhash ^ y.simhash")) <= maxHamming)
      .select(col("x.did").as("a_id"), col("y.did").as("b_id"))
      .distinct()
    verify(cands, docs, id, text, n, tau)
  }

  /** 128-bit SimHash as two 64-bit words, still ONE aggregation pass
    * (128 wide conditional sums; the second word's feature hash is
    * salted). Returns (did, sh0, sh1). */
  def simhash128(docs: DataFrame, id: Column, features: Column): DataFrame = {
    val toks = docs.select(id.as("did"), explode(features).as("tok"))
      .withColumn("h0", xxhash64(col("tok")))
      .withColumn("h1", xxhash64(col("tok"), lit(0x9E3779B97F4A7C15L)))
    // two native simhash_agg calls (one per word) — see [[simhash]]
    toks.groupBy(col("did")).agg(
      call_function("simhash_agg", col("h0")).as("sh0"),
      call_function("simhash_agg", col("h1")).as("sh1"))
  }

  /** The documented 100 TB dial of [[simhashPairs]], implemented: a
    * 128-bit sketch with `nChunks` slices split evenly across the two
    * words. At fixed corpus size, doubling sketch width grows per-chunk
    * bit width (~64/14≈4.6 → ~128/24≈5.3 bits ⇒ more bucket values ⇒
    * fewer chance collisions per chunk) while true-pair Hamming scales
    * linearly with width — so the radius margin and the candidate
    * volume BOTH improve as the corpus grows; locally the two layouts
    * cost about the same (Simhash128Spec measures it). Pigeonhole
    * guarantee: combined Hamming <= nChunks-1 ⇒ >= 1 shared chunk. */
  def simhash128Pairs(docs: DataFrame, id: Column, text: Column,
                      n: Int, tau: Double, nChunks: Int = 24): DataFrame = {
    require(nChunks % 2 == 0, "chunks split evenly across the two sketch words")
    val maxHamming = nChunks - 1
    val perWord = chunkLayout(64, nChunks / 2)
    val sh = simhash128(docs, id, TextOps.wordShingles(text, n))
    val chunkCols = for {
      (wordCol, wi) <- Seq("sh0", "sh1").zipWithIndex
      ((off, w), ci) <- perWord.zipWithIndex
    } yield {
      val mask = (1L << w) - 1
      struct(lit(wi * perWord.size + ci).as("c"),
        expr(s"($wordCol >> $off) & $mask").as("v"))
    }
    // pin the bucket-join exchange at session parallelism — same
    // input-small/output-explosive AQE coalescing trap as
    // [[simhashPairs]] (see the comment there)
    val par = docs.sparkSession.sparkContext.defaultParallelism
    val chunks = sh.select(col("did"), col("sh0"), col("sh1"),
        explode(array(chunkCols: _*)).as("ch"))
      .select(col("did"), col("sh0"), col("sh1"),
        col("ch.c").as("c"), col("ch.v").as("v"))
      .repartition(par, col("c"), col("v"))
    val cands = chunks.as("x").join(chunks.as("y"),
        col("x.c") === col("y.c") && col("x.v") === col("y.v") &&
          col("x.did") < col("y.did"))
      .filter((bit_count(expr("x.sh0 ^ y.sh0"))
        + bit_count(expr("x.sh1 ^ y.sh1"))) <= maxHamming)
      .select(col("x.did").as("a_id"), col("y.did").as("b_id"))
      .distinct()
    verify(cands, docs, id, text, n, tau)
  }

  /** Duplicate text spans: substring-level exact dedup. Doc-level dedup
    * misses boilerplate repeated INSIDE otherwise-distinct documents
    * (headers, license blocks, templated intros) — the cross-document
    * substring duplication problem in web-scale corpora. Token-granular
    * variant: every k-token sliding span is a group key; a span held by
    * >= minDocs distinct docs is a duplicate span. Returns
    * `(span, n_docs, n_occ)` — n_occ counts every occurrence, so
    * within-doc repeats are visible too.
    *
    * Scale: all built-in codegen'd functions (transform/sequence/
    * slice), one shuffle on the span key. `hashKey = true` is the
    * 100 TB dial: group on xxhash64(span) — an 8-byte shuffle key
    * instead of the span text — and carry one representative span
    * (`min`) per group; counts are exact up to 64-bit hash collisions
    * (~n²/2⁶⁵: negligible at any shard size, and a collision only
    * merges two spans' counts, never loses a duplicate). Per-key skew
    * is bounded either way — a span occurs at most (doc_len - k + 1)
    * times per doc. */
  def duplicateSpans(docs: DataFrame, id: Column, text: Column,
                     k: Int, minDocs: Int = 2,
                     hashKey: Boolean = false): DataFrame = {
    val toks = docs.select(id.as("did"), TextOps.tokens(text).as("t"))
    val spans = toks.filter(size(col("t")) >= k).select(col("did"),
      explode(expr(
        s"transform(sequence(1, size(t) - ${k - 1}), " +
          s"i -> concat_ws(' ', slice(t, i, $k)))")).as("span"))
    val grouped =
      if (hashKey)
        spans.groupBy(xxhash64(col("span")).as("h"))
          .agg(min(col("span")).as("span"),
            countDistinct(col("did")).as("n_docs"),
            count(lit(1)).as("n_occ"))
          .drop("h")
      else
        spans.groupBy(col("span"))
          .agg(countDistinct(col("did")).as("n_docs"),
            count(lit(1)).as("n_occ"))
    grouped.filter(col("n_docs") >= minDocs)
      .select(col("span"), col("n_docs"), col("n_occ"))
  }
}
