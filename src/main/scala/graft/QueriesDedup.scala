package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.{Dedup, TextOps}

/** Deduplication operators for training-data pipelines over `documents`:
  * exact (hash groupBy), exact n-gram Jaccard (inverted-index join),
  * MinHash+LSH (banded buckets), SimHash (chunk buckets). See
  * [[graft.functions.Dedup]] for the shuffle-first scale design.
  *
  * q22/q23/q24 share one output contract — near-dup pairs `(a_id, b_id,
  * jaccard)` at word-3-gram Jaccard >= 0.5 — and therefore one DuckDB
  * oracle (all-pairs exact Jaccard; fine at sf0.01). The corpus plants
  * 25 near-dup pairs at J >= 0.9 with the next pair below J = 0.03, so
  * the probabilistic candidate stages (MinHash bands, SimHash chunks)
  * have astronomically-safe recall margins, and the exact verify stage
  * makes precision exact.
  */
object QueriesDedup {

  private val N = 3      // word-shingle width
  private val Tau = 0.5  // near-dup Jaccard threshold

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- winnowing fingerprints (Schleimer et al. 2003, the MOSS
    // algorithm): per doc, the min k-gram hash of every w-window is
    // selected — a ~2/(w+1)-density fingerprint set with a GUARANTEE
    // MinHash/SimHash lack: any shared run of >= w+k-1 tokens shares a
    // fingerprint (the window over the run picks the same min on both
    // sides). Pairs = docs sharing >= 3 fingerprints, via a df-capped
    // inverted-index self-join. Hashes are md5 hex; the min is
    // lexicographic over ASCII hex, which Spark's array_min and
    // DuckDB's list_min order identically — hash-exact oracle. Scale
    // shape: one token pass per doc, fingerprints explode at ~2/(w+1)
    // of the gram count, ubiquitous fingerprints (boilerplate) are
    // df-capped before the self-join — never all-pairs, skew bounded
    // by the cap.
    "q151_winnow_fingerprint" -> ((s, dir) => {
      import s.implicits._
      val withH = Tables.documentsWide(s, dir)
        .filter(size(TextOps.tokens($"text")) >= N)
        .select($"doc_id",
          // materialized ATTRIBUTE before the window transform: a
          // captured computed expression would re-evaluate the whole
          // gram-hash array per window element (the q22 lesson)
          transform(TextOps.wordNgrams($"text", N),
            g => md5(g.cast("binary"))).as("h"))
      val fps = withH.select($"doc_id", explode(array_distinct(
          transform(sequence(lit(1), greatest(size($"h") - 3, lit(1))),
            i => array_min(slice($"h", i, lit(4)))))).as("f"))
      val rare = fps.groupBy($"f")
        .agg(count(lit(1)).as("d")).filter($"d" <= 50).select($"f")
      val xs = fps.join(rare, "f")
      xs.select($"f", $"doc_id".as("doc_a"))
        .join(xs.select($"f", $"doc_id".as("doc_b")), Seq("f"))
        .filter($"doc_a" < $"doc_b")
        .groupBy($"doc_a", $"doc_b")
        .agg(count(lit(1)).as("n_shared"))
        .filter($"n_shared" >= 3)
        .orderBy($"doc_a", $"doc_b")
    }),

    // ---- exact dedup: content-hash groups, keep-first ------------------
    "q21_dedup_exact" -> ((s, dir) => {
      import s.implicits._
      Dedup.exactGroups(Tables.documents(s, dir), $"doc_id", $"text")
        .orderBy($"fp")
    }),

    // ---- SUB-DOCUMENT exact dedup (C4/CCNet paragraph-dedup shape) ----
    // Corpus-wide dedup at SEGMENT granularity: split each doc into
    // fixed 10-token windows, keep each distinct segment only at its
    // FIRST corpus occurrence (min (doc_id, seg_idx)), and reassemble
    // the cleaned document — boilerplate that q21's whole-doc hash
    // can never catch (two distinct docs sharing a navigation header
    // each keep their unique text, the shared header survives once).
    //
    // Scale shape: the first-occurrence rule is a MAP-SIDE-COMBINABLE
    // min aggregation on the segment fingerprint (never a window over
    // the fp partition — a boilerplate segment with 10^8 instances
    // would funnel one reducer; min() partials absorb the skew), and
    // the keep decision is an equi-join back on (fp, packed position).
    // Two shuffles on natural keys (fp, then doc_id), both combined
    // map-side; the explode is bounded by corpus token count.
    "q163_segment_dedup" -> ((s, dir) => {
      import s.implicits._
      val segLen = 10
      val segs = Tables.documentsWide(s, dir)
        .select($"doc_id", TextOps.tokens($"text").as("w"))
        .filter(size($"w") > 0)
        .select($"doc_id",
          posexplode(transform(
            sequence(lit(0), floor((size($"w") - 1) / segLen).cast("int")),
            i => array_join(slice($"w", i * segLen + 1, lit(segLen)), " "))))
        .select($"doc_id", $"pos".cast("long").as("seg_idx"),
          $"col".as("seg"))
        .withColumn("fp", md5($"seg".cast("binary")))
        // packed position: one long keeps min() a primitive agg. The
        // pack is only injective while seg_idx < 100000 (true of this
        // corpus — docs are ~100 tokens — but not of text in general),
        // so GUARD it: a violating row fails the query loudly instead
        // of silently electing the wrong first occurrence (VERDICT r11)
        .withColumn("packed",
          // doc_id's UPPER bound too: doc_id*100000 must not overflow
          // Long, or the pack silently wraps and elects a wrong first
          // occurrence (ADVICE r12) — 92233720368547 = Long.MaxValue/100000
          when($"seg_idx" < 100000L && $"doc_id" >= 0L &&
              $"doc_id" <= 92233720368547L,
            $"doc_id" * 100000L + $"seg_idx")
            .otherwise(raise_error(concat(
              lit("segment_dedup: packed-position overflow (doc_id="),
              $"doc_id", lit(", seg_idx="), $"seg_idx", lit(")")))))
      val firsts = segs.groupBy($"fp")
        .agg(min($"packed").as("keep_packed"),
          count(lit(1)).as("n_copies"))
      segs.join(firsts, Seq("fp"))
        .groupBy($"doc_id")
        .agg(count(lit(1)).as("n_segs"),
          sum(when($"packed" === $"keep_packed", 1L).otherwise(0L))
            .as("n_kept"),
          // kept segments reassemble IN ORDER: sort by seg_idx via the
          // struct sort, then join — deterministic in both engines
          array_join(transform(array_sort(collect_list(
              when($"packed" === $"keep_packed",
                struct($"seg_idx", $"seg")))),
            p => p.getField("seg")), " ").as("clean_text"))
        .withColumn("kept_ratio",
          $"n_kept".cast("double") / $"n_segs".cast("double"))
        .orderBy($"doc_id")
    }),

    // ---- exact near-dup: inverted-index candidates + exact Jaccard ----
    "q22_dedup_ngram_jaccard" -> ((s, dir) => {
      import s.implicits._
      Dedup.ngramJaccardPairs(Tables.documentsWide(s, dir), $"doc_id", $"text", N, Tau)
        .orderBy($"a_id", $"b_id")
    }),

    // ---- MinHash+LSH near-dup: banded signature buckets + verify ------
    "q23_dedup_minhash_lsh" -> ((s, dir) => {
      import s.implicits._
      Dedup.minhashLshPairs(Tables.documentsWide(s, dir), $"doc_id", $"text", N, Tau)
        .orderBy($"a_id", $"b_id")
    }),

    // ---- SimHash near-dup: 14-chunk buckets + Hamming + verify --------
    "q24_dedup_simhash" -> ((s, dir) => {
      import s.implicits._
      Dedup.simhashPairs(Tables.documentsWide(s, dir), $"doc_id", $"text", N, Tau)
        .orderBy($"a_id", $"b_id")
    }),

    // ---- 128-bit SimHash: the wide-sketch scale dial, same oracle -----
    "q47_dedup_simhash128" -> ((s, dir) => {
      import s.implicits._
      Dedup.simhash128Pairs(Tables.documentsWide(s, dir), $"doc_id", $"text", N, Tau)
        .orderBy($"a_id", $"b_id")
    }),

    // ---- dedup clusters: connected components over near-dup pairs ----
    // Pairs alone aren't a dedup decision — transitive near-dups
    // (A~B~C with no direct A~C pair) must collapse into one cluster
    // with one canonical representative. Min-label propagation over
    // the exact q22 pair graph; the oracle computes the same
    // components via recursive transitive closure.
    "q68_dedup_components" -> ((s, dir) => {
      import s.implicits._
      val pairs = Dedup.ngramJaccardPairs(
        Tables.documentsWide(s, dir), $"doc_id", $"text", N, Tau)
      graft.operators.ConnectedComponents.run(pairs, "a_id", "b_id")
        .select($"id".as("doc_id"), $"component")
        .orderBy($"doc_id")
    }),

    // ---- streaming NEAR-dup dedup with a persisted LSH index (X95) ----
    // The near-dup twin of q90: documents arrive in two commits; a
    // MinHashDedupStream maintains (a) the deduped corpus and (b) a
    // banded-signature INDEX table from the commit log. Each batch
    // probes the index on (band, bkey) for candidates against the KEPT
    // corpus (never re-banded, never all-pairs), exact-verifies at
    // Jaccard >= tau, and collapses its own near-dup clusters to their
    // min-id representative (connected components). The oracle replays
    // the same two-phase arrival relationally: per-batch transitive
    // closure over the exact q22 pair graph + cross-batch drops against
    // the first batch's keepers — hash-exact because the 16x4 banding's
    // measured recall on this corpus is 1.0 (the q23 contract).
    "q148_minhash_dedup_stream" -> ((s, dir) => {
      import s.implicits._
      val tmp = graft.QueryTmp.dir("graft_q148_")
      val up = graft.table.IncrementalTable(s, s"$tmp/docs/v1")
      val down = graft.table.IncrementalTable(s, s"$tmp/kept/v1")
      val idx = graft.table.IncrementalTable(s, s"$tmp/bands/v1")
      val docs = Tables.documents(s, dir).select($"doc_id", $"text", $"source")
      up.append(docs.filter($"doc_id" % 2 === 0), partitionBy = Nil)
      up.append(docs.filter($"doc_id" % 2 === 1), partitionBy = Nil)
      val st = new graft.streaming.MinHashDedupStream(up, down, idx,
        n = N, tau = Tau)
      st.drain()
      down.read().select($"doc_id", $"source").orderBy($"doc_id")
    }),

    // ---- Hamming-1 fuzzy pairs via deletion-neighborhood blocking ----
    // The scalable plan for edit-distance-1 matching on fixed-length
    // keys (IDs, codes, fixed-format names): each string explodes to L
    // (position, delete-one) variants; a pair at Hamming distance
    // exactly 1 meets on precisely the variant of its differing
    // position — an EQUI-join, no dedup pass, no all-pairs product
    // (candidate volume L*n vs n^2/2; the oracle IS the quadratic
    // levenshtein join — the semantics, not the plan). The position
    // rides in the join key: a bare deleted string would collide
    // across positions and admit Hamming-2 pairs ("ab"/"ba" both
    // delete to "b"). Keys capped so the oracle's quadratic side
    // stays bounded at any SF.
    "q67_fuzzy_pairs" -> ((s, dir) => {
      import s.implicits._
      val L = 18 // fixed "Customer#%09d" width; length-checked in the oracle
      val base = Tables.customer(s, dir)
        .filter($"c_custkey" < 5000)
        .select($"c_custkey".cast("long").as("key"), $"c_name".as("name"))
      val variants = base.select($"key", $"name",
        explode(array((0 until L).map(i =>
          struct(lit(i).as("p"),
            concat(substring($"name", 1, i),
              substring($"name", i + 2, L - i - 1)).as("s"))): _*)).as("v"))
      variants.as("a").join(variants.as("b"),
          $"a.v" === $"b.v" && $"a.key" < $"b.key")
        .select($"a.key".as("key_a"), $"b.key".as("key_b"),
          $"a.name".as("name_a"), $"b.name".as("name_b"))
        .orderBy($"key_a", $"key_b")
    }),

    // ---- duplicate text spans: substring-level exact dedup -------------
    // [[Dedup.duplicateSpans]] (K=8 tokens) over documents: top spans
    // reported, count-ranked with a total-order tiebreak (span is the
    // group key, hence unique) so LIMIT is engine-stable.
    "q108_duplicate_spans" -> ((s, dir) => {
      import s.implicits._
      Dedup.duplicateSpans(Tables.documentsWide(s, dir), $"doc_id", $"text",
          k = 8, minDocs = 2)
        .orderBy($"n_docs".desc, $"n_occ".desc, $"span")
        .limit(100)
    }),
  )

  /** All-pairs exact word-3-gram Jaccard at tau — the engine-neutral
    * ground truth all three near-dup methods must reproduce. */
  private val pairsSql =
    s"""WITH w AS (
       |  SELECT doc_id, list_filter(string_split(text, ' '), t -> t != '') AS w
       |  FROM documents),
       |d AS (
       |  SELECT doc_id, list_distinct(list_transform(range(1, len(w) - 1),
       |    i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS sh
       |  FROM w),
       |p AS (
       |  SELECT a.doc_id AS a_id, b.doc_id AS b_id,
       |    CAST(len(list_intersect(a.sh, b.sh)) AS BIGINT) AS li,
       |    CAST(len(a.sh) AS BIGINT) AS na, CAST(len(b.sh) AS BIGINT) AS nb
       |  FROM d a JOIN d b ON a.doc_id < b.doc_id)
       |SELECT a_id, b_id, CAST(li AS DOUBLE) / (na + nb - li) AS jaccard
       |FROM p WHERE CAST(li AS DOUBLE) / (na + nb - li) >= $Tau
       |ORDER BY a_id, b_id""".stripMargin

  private val oracleSqlFuzzy: String =
    """WITH b AS (
      |  SELECT c_custkey AS key, c_name AS name FROM customer
      |  WHERE c_custkey < 5000)
      |SELECT a.key AS key_a, c.key AS key_b,
      |  a.name AS name_a, c.name AS name_b
      |FROM b a JOIN b c ON a.key < c.key
      |  AND length(a.name) = length(c.name)
      |  AND levenshtein(a.name, c.name) = 1
      |ORDER BY key_a, key_b""".stripMargin

  private val componentsSql =
    s"""WITH RECURSIVE w AS (
       |  SELECT doc_id, list_filter(string_split(text, ' '), t -> t != '') AS w
       |  FROM documents),
       |d AS (
       |  SELECT doc_id, list_distinct(list_transform(range(1, len(w) - 1),
       |    i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS sh
       |  FROM w),
       |p AS (
       |  SELECT a.doc_id AS a_id, b.doc_id AS b_id,
       |    CAST(len(list_intersect(a.sh, b.sh)) AS BIGINT) AS li,
       |    CAST(len(a.sh) AS BIGINT) AS na, CAST(len(b.sh) AS BIGINT) AS nb
       |  FROM d a JOIN d b ON a.doc_id < b.doc_id),
       |pairs AS (
       |  SELECT a_id, b_id FROM p
       |  WHERE CAST(li AS DOUBLE) / (na + nb - li) >= $Tau),
       |nodes AS (
       |  SELECT a_id AS id FROM pairs UNION SELECT b_id FROM pairs),
       |edges AS (
       |  SELECT a_id AS s, b_id AS d FROM pairs
       |  UNION ALL SELECT b_id, a_id FROM pairs),
       |reach(id, r) AS (
       |  SELECT id, id FROM nodes
       |  UNION
       |  SELECT reach.id, edges.d FROM reach JOIN edges ON reach.r = edges.s)
       |SELECT id AS doc_id, MIN(r) AS component
       |FROM reach GROUP BY id ORDER BY doc_id""".stripMargin

  /** q148: the two-phase near-dup arrival replayed relationally —
    * batch 1 (even ids) collapses its components to min-id reps;
    * batch 2 (odd ids) first drops docs pairing with a batch-1
    * KEEPER, then collapses its own remaining components. */
  private val neardupStreamSql =
    s"""WITH RECURSIVE w AS (
       |  SELECT doc_id, list_filter(string_split(text, ' '), t -> t != '') AS w
       |  FROM documents),
       |d AS (
       |  SELECT doc_id, list_distinct(list_transform(range(1, len(w) - 1),
       |    i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS sh
       |  FROM w),
       |p AS (
       |  SELECT a.doc_id AS a_id, b.doc_id AS b_id,
       |    CAST(len(list_intersect(a.sh, b.sh)) AS BIGINT) AS li,
       |    CAST(len(a.sh) AS BIGINT) AS na, CAST(len(b.sh) AS BIGINT) AS nb
       |  FROM d a JOIN d b ON a.doc_id < b.doc_id),
       |pairs AS (
       |  SELECT a_id, b_id FROM p
       |  WHERE CAST(li AS DOUBLE) / (na + nb - li) >= $Tau),
       |e1 AS (
       |  SELECT a_id AS s, b_id AS d FROM pairs
       |  WHERE a_id % 2 = 0 AND b_id % 2 = 0
       |  UNION ALL SELECT b_id, a_id FROM pairs
       |  WHERE a_id % 2 = 0 AND b_id % 2 = 0),
       |reach1(id, r) AS (
       |  SELECT s, s FROM e1
       |  UNION
       |  SELECT reach1.id, e1.d FROM reach1 JOIN e1 ON reach1.r = e1.s),
       |comp1 AS (SELECT id, MIN(r) AS c FROM reach1 GROUP BY id),
       |kept1 AS (
       |  SELECT doc_id FROM documents LEFT JOIN comp1 ON doc_id = comp1.id
       |  WHERE doc_id % 2 = 0 AND (comp1.id IS NULL OR comp1.c = doc_id)),
       |drop2 AS (
       |  SELECT b_id AS doc_id FROM pairs
       |    JOIN kept1 ON pairs.a_id = kept1.doc_id WHERE b_id % 2 = 1
       |  UNION
       |  SELECT a_id FROM pairs
       |    JOIN kept1 ON pairs.b_id = kept1.doc_id WHERE a_id % 2 = 1),
       |s2 AS (
       |  SELECT doc_id FROM documents WHERE doc_id % 2 = 1
       |    AND doc_id NOT IN (SELECT doc_id FROM drop2)),
       |e2 AS (
       |  SELECT a_id AS s, b_id AS d FROM pairs
       |  WHERE a_id IN (SELECT doc_id FROM s2) AND b_id IN (SELECT doc_id FROM s2)
       |  UNION ALL SELECT b_id, a_id FROM pairs
       |  WHERE a_id IN (SELECT doc_id FROM s2) AND b_id IN (SELECT doc_id FROM s2)),
       |reach2(id, r) AS (
       |  SELECT s, s FROM e2
       |  UNION
       |  SELECT reach2.id, e2.d FROM reach2 JOIN e2 ON reach2.r = e2.s),
       |comp2 AS (SELECT id, MIN(r) AS c FROM reach2 GROUP BY id),
       |kept2 AS (
       |  SELECT s2.doc_id FROM s2 LEFT JOIN comp2 ON s2.doc_id = comp2.id
       |  WHERE comp2.id IS NULL OR comp2.c = s2.doc_id)
       |SELECT doc_id, source FROM documents
       |WHERE doc_id IN (SELECT doc_id FROM kept1)
       |   OR doc_id IN (SELECT doc_id FROM kept2)
       |ORDER BY doc_id""".stripMargin

  def oracleSql: Map[String, String] = Map(
    "q151_winnow_fingerprint" ->
      """WITH docs AS (
        |  SELECT doc_id, list_filter(string_split(text, ' '), t -> t != '') AS w
        |  FROM documents),
        |grams AS (
        |  SELECT doc_id, list_transform(range(1, len(w) - 1),
        |    i -> md5(w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS h
        |  FROM docs WHERE len(w) >= 3),
        |fps AS (
        |  SELECT doc_id, unnest(list_distinct(
        |    list_transform(range(1, greatest(len(h) - 2, 2)),
        |      i -> list_min(h[i:i+3])))) AS f
        |  FROM grams),
        |rare AS (SELECT f FROM fps GROUP BY f HAVING COUNT(*) <= 50),
        |xs AS (SELECT fps.* FROM fps JOIN rare USING (f))
        |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
        |  CAST(COUNT(*) AS BIGINT) AS n_shared
        |FROM xs a JOIN xs b ON a.f = b.f AND a.doc_id < b.doc_id
        |GROUP BY 1, 2 HAVING COUNT(*) >= 3
        |ORDER BY doc_a, doc_b""".stripMargin,
    "q148_minhash_dedup_stream" -> neardupStreamSql,
    "q68_dedup_components" -> componentsSql,
    "q67_fuzzy_pairs" -> oracleSqlFuzzy,
    "q21_dedup_exact" ->
      """SELECT md5(text) AS fp, MIN(doc_id) AS keep_id, COUNT(*) AS n_copies
        |FROM documents GROUP BY md5(text) ORDER BY fp""".stripMargin,
    "q163_segment_dedup" ->
      """WITH t AS (
        |  SELECT doc_id, list_filter(string_split(text,' '), x -> x <> '') AS w
        |  FROM documents),
        |s AS (
        |  SELECT doc_id, i AS seg_idx,
        |    array_to_string(w[(i*10+1):(i*10+10)], ' ') AS seg
        |  FROM t, LATERAL unnest(
        |    range(0, CAST(floor((len(w)-1)/10) AS BIGINT) + 1)) AS r(i)
        |  WHERE len(w) > 0),
        |f AS (SELECT doc_id, seg_idx, seg, md5(seg) AS fp,
        |        doc_id*100000 + seg_idx AS packed FROM s),
        |firsts AS (SELECT fp, MIN(packed) AS keep_packed FROM f GROUP BY fp)
        |SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_segs,
        |  CAST(SUM(CASE WHEN packed = keep_packed THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_kept,
        |  coalesce(array_to_string(list_transform(list_sort(
        |    list({'seg_idx': seg_idx, 'seg': seg})
        |      FILTER (WHERE packed = keep_packed)),
        |    p -> p.seg), ' '), '') AS clean_text,
        |  CAST(SUM(CASE WHEN packed = keep_packed THEN 1 ELSE 0 END)
        |    AS DOUBLE) / COUNT(*) AS kept_ratio
        |FROM f JOIN firsts USING (fp)
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "q22_dedup_ngram_jaccard" -> pairsSql,
    "q23_dedup_minhash_lsh" -> pairsSql,
    "q24_dedup_simhash" -> pairsSql,
    "q47_dedup_simhash128" -> pairsSql,
    "q108_duplicate_spans" ->
      """WITH toks AS (
        |  SELECT doc_id,
        |    list_filter(string_split(text, ' '), t -> t <> '') AS t
        |  FROM documents),
        |spans AS (
        |  SELECT doc_id, array_to_string(t[i:i+7], ' ') AS span
        |  FROM (SELECT * FROM toks WHERE len(t) >= 8) tk,
        |    UNNEST(generate_series(1, len(t) - 7)) AS u(i))
        |SELECT span, COUNT(DISTINCT doc_id) AS n_docs, COUNT(*) AS n_occ
        |FROM spans GROUP BY span
        |HAVING COUNT(DISTINCT doc_id) >= 2
        |ORDER BY n_docs DESC, n_occ DESC, span
        |LIMIT 100""".stripMargin,
  )
}
