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
    * definition, so recall is exact. */
  def ngramJaccardPairs(docs: DataFrame, id: Column, text: Column,
                        n: Int, tau: Double): DataFrame = {
    val e = edges(docs, id, TextOps.wordShingles(text, n))
    val sizes = e.groupBy(col("did")).agg(count(lit(1)).as("nsh"))
    val inter = e.as("x").join(e.as("y"), col("x.sh") === col("y.sh") &&
        col("x.did") < col("y.did"))
      .groupBy(col("x.did").as("a_id"), col("y.did").as("b_id"))
      .agg(count(lit(1)).as("li"))
    withJaccard(inter, sizes).filter(col("jaccard") >= tau)
      .select(col("a_id"), col("b_id"), col("jaccard"))
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
    val sets = docs.select(id.as("did"), TextOps.wordShingles(text, n).as("shs"))
    cands
      .join(sets.select(col("did").as("a_id"), col("shs").as("sa")), "a_id")
      .join(sets.select(col("did").as("b_id"), col("shs").as("sb")), "b_id")
      .withColumn("li", size(array_intersect(col("sa"), col("sb"))).cast("long"))
      .withColumn("jaccard",
        col("li").cast("double")
          / (size(col("sa")) + size(col("sb")) - col("li")).cast("double"))
      .filter(col("jaccard") >= tau)
      .select(col("a_id"), col("b_id"), col("jaccard"))
  }

  /** MinHash+LSH near-dup pairs: `perms` seeded hash permutations
    * (xxhash64 salted by permutation index), banded into `perms/r`
    * buckets of `r` rows each; docs colliding on a full band become
    * candidates, then exact-verified at `tau`. */
  def minhashLshPairs(docs: DataFrame, id: Column, text: Column,
                      n: Int, tau: Double, perms: Int = 64, r: Int = 4): DataFrame = {
    val e = edges(docs, id, TextOps.wordShingles(text, n))
    // (did, p, h): permutation p's hash of each shingle; min per (did,p)
    // is the signature row. One explode + one partial-aggregated shuffle.
    val permCols = array((0 until perms).map(i =>
      struct(lit(i).as("p"), xxhash64(col("sh"), lit(i)).as("h"))): _*)
    val sig = e.select(col("did"), explode(permCols).as("ph"))
      .groupBy(col("did"), col("ph.p").as("p"))
      .agg(min(col("ph.h")).as("mh"))
    // band key: md5 of the ordered signature rows within the band
    val bands = sig.withColumn("band", col("p") / r cast "int")
      .groupBy(col("did"), col("band"))
      .agg(md5(concat_ws(",",
        transform(array_sort(collect_list(struct(col("p"), col("mh")))),
          x => x.getField("mh").cast("string"))).cast("binary")).as("bkey"))
    val cands = bands.as("x").join(bands.as("y"),
        col("x.band") === col("y.band") && col("x.bkey") === col("y.bkey") &&
          col("x.did") < col("y.did"))
      .select(col("x.did").as("a_id"), col("y.did").as("b_id"))
      .distinct()
    verify(cands, docs, id, text, n, tau)
  }

  /** 64-bit SimHash per doc from token-level xxhash64: bit j of the
    * sketch is the sign of the sum of ±1 votes from each distinct
    * token's hash bit j. Returns (did, simhash). */
  def simhash(docs: DataFrame, id: Column, text: Column): DataFrame = {
    val toks = docs.select(id.as("did"), explode(array_distinct(TextOps.tokens(text))).as("tok"))
      .withColumn("h", xxhash64(col("tok")))
    toks.select(col("did"), col("h"),
        explode(sequence(lit(0), lit(63))).as("j"))
      .withColumn("c", when(expr("(h >> j) & 1") === 1, 1L).otherwise(-1L))
      .groupBy(col("did"), col("j")).agg(sum(col("c")).as("s"))
      .groupBy(col("did"))
      .agg(sum(expr("CASE WHEN s > 0 THEN shiftleft(CAST(1 AS BIGINT), CAST(j AS INT)) ELSE CAST(0 AS BIGINT) END")).as("simhash"))
  }

  /** SimHash near-dup pairs: bucket by 16 chunks of 4 bits (pigeonhole:
    * Hamming <= 15 ⇒ >= 1 shared chunk, so recall is deterministic up
    * to that radius — the corpus's true pairs sit at Hamming <= 12),
    * filter candidates by true Hamming distance, then exact-verify at
    * `tau` for an engine-neutral output.
    *
    * Scale: 4-bit chunks are permissive (16 buckets per chunk space), so
    * candidate volume grows ~quadratically within buckets. At 100 TB
    * either widen the sketch (128-bit SimHash, 8-bit chunks for the same
    * radius guarantee) or drop the radius; the verify stage keeps
    * precision exact regardless. */
  def simhashPairs(docs: DataFrame, id: Column, text: Column,
                   n: Int, tau: Double, maxHamming: Int = 15): DataFrame = {
    val sh = simhash(docs, id, text)
    val chunks = sh.select(col("did"), col("simhash"),
        explode(sequence(lit(0), lit(15))).as("c"))
      .withColumn("v", expr("(simhash >> (c * 4)) & 15"))
    val cands = chunks.as("x").join(chunks.as("y"),
        col("x.c") === col("y.c") && col("x.v") === col("y.v") &&
          col("x.did") < col("y.did"))
      .select(col("x.did").as("a_id"), col("y.did").as("b_id"),
        bit_count(expr("x.simhash ^ y.simhash")).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
      .select(col("a_id"), col("b_id"))
    verify(cands, docs, id, text, n, tau)
  }
}
