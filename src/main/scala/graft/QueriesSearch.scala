package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.functions.TextOps

/** Corpus search / statistical-LM operators for training-data pipelines:
  * TF-IDF term weighting, BM25 relevance scoring, unigram language-model
  * quality filtering, and eval-set decontamination.
  *
  * Scale shapes (the 100 TB contracts):
  *  - TF-IDF / unigram-LM both reduce to `explode → two hash aggregations
  *    → join on term` — the per-term side is bounded by vocabulary size
  *    (≪ corpus size), so the final join broadcasts the term statistics;
  *    no all-pairs, no driver loop. The corpus-constant scalars (N docs,
  *    total tokens) ride a one-row broadcast cross join, not a driver
  *    `.count()`.
  *  - BM25 keeps only postings of the QUERY terms — the filter lands
  *    before the aggregation shuffle, so cost is O(matching postings),
  *    not O(corpus).
  *  - Decontamination joins train shingles against the DISTINCT shingle
  *    set of the eval benchmark — eval sets are tiny by construction, so
  *    the build side broadcasts at any corpus scale and flagging is one
  *    map-side semi-join pass over the train corpus.
  *
  * Determinism contract with the DuckDB oracle (see QueriesText): ranks
  * order by exact-integer keys only (tf desc, df asc, term) — never by a
  * floating product, which could tie-flip across engines; `ln`-bearing
  * doubles are rounded (libm vs DuckDB may differ in the last ulp);
  * ratios of exact ints are emitted unrounded (single IEEE division).
  */
object QueriesSearch {

  /** BM25 free parameters (Robertson-Walker defaults). */
  private val K1 = 1.2
  private val B  = 0.75
  /** Query terms: one rare ("dup", idf-dominant), two common. */
  private val QueryTerms = Seq("dup", "query", "the")

  /** Distinct word 5-gram shingles per doc (contamination unit). */
  private val ShingleN = 5
  /** Eval-benchmark membership: deterministic slice of the corpus. */
  private def isEval(c: org.apache.spark.sql.Column) = c % 50 === 0

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- TF-IDF: top-3 weighted terms per document --------------------
    // explode → (doc,term) tf agg → term df agg → broadcast-join term
    // stats back → per-doc top-3 by (tf desc, df asc, term). Window
    // partitions by doc_id: at 100 TB that's the full-parallel axis.
    "q70_tfidf" -> ((s, dir) => {
      import s.implicits._
      val docs = Tables.documentsWide(s, dir)
      val tf = docs
        .select($"doc_id", explode(TextOps.tokens($"text")).as("term"))
        .groupBy($"doc_id", $"term").agg(count(lit(1)).as("tf"))
      val df = tf.groupBy($"term").agg(count(lit(1)).as("df"))
      val n = docs.agg(count(lit(1)).as("n_docs"))
      val w = Window.partitionBy($"doc_id")
        .orderBy($"tf".desc, $"df".asc, $"term".asc)
      tf.join(broadcast(df), "term")
        .crossJoin(broadcast(n))
        .withColumn("rank", row_number().over(w))
        .filter($"rank" <= 3)
        .select($"doc_id", $"rank".cast("long").as("rank"), $"term", $"tf",
          $"df", round($"tf" * log($"n_docs".cast("double") / $"df"), 6)
            .as("tfidf"))
        .orderBy($"doc_id", $"rank")
    }),

    // ---- BM25 relevance scoring over a fixed term query ---------------
    // Postings are filtered to the query terms BEFORE the (doc,term)
    // aggregation, so the shuffle carries only matching postings. Doc
    // length and the corpus avgdl join back by doc_id / one-row
    // broadcast. Score sums ≤|query| doubles → rounded.
    "q71_bm25" -> ((s, dir) => {
      import s.implicits._
      val docs = Tables.documentsWide(s, dir)
      val lens = docs.select($"doc_id",
        size(TextOps.tokens($"text")).cast("long").as("dl"))
      val stats = lens.agg(count(lit(1)).as("n_docs"),
        (sum($"dl") / count(lit(1))).as("avgdl"))
      val tf = docs
        .select($"doc_id", explode(TextOps.tokens($"text")).as("term"))
        .filter($"term".isin(QueryTerms: _*))
        .groupBy($"doc_id", $"term").agg(count(lit(1)).as("tf"))
      val df = tf.groupBy($"term").agg(count(lit(1)).as("df"))
      val idf = log(lit(1.0) +
        ($"n_docs" - $"df" + lit(0.5)) / ($"df" + lit(0.5)))
      val tfNorm = ($"tf" * lit(K1 + 1.0)) /
        ($"tf" + lit(K1) * (lit(1.0 - B) + lit(B) * $"dl" / $"avgdl"))
      tf.join(broadcast(df), "term")
        .join(lens, "doc_id")
        .crossJoin(broadcast(stats))
        .withColumn("contrib", idf * tfNorm)
        .groupBy($"doc_id")
        .agg(count(lit(1)).as("n_terms_hit"),
          sum($"tf").as("n_matches"),
          round(sum($"contrib"), 6).as("bm25"))
        .orderBy($"doc_id")
    }),

    // ---- unigram-LM quality score (KenLM-style filter, order 1) -------
    // Corpus unigram counts (vocabulary-bounded → broadcast) joined to
    // per-doc term counts; per-doc mean token log-prob and a
    // scale-invariant rare-token fraction (count·100 < total tokens —
    // integer compare, no threshold retune as the corpus grows).
    "q72_unigram_lm" -> ((s, dir) => {
      import s.implicits._
      val terms = Tables.documentsWide(s, dir)
        .select($"doc_id", explode(TextOps.tokens($"text")).as("term"))
      val tf = terms.groupBy($"doc_id", $"term").agg(count(lit(1)).as("tf"))
      val corpus = terms.groupBy($"term").agg(count(lit(1)).as("cnt"))
      val total = corpus.agg(sum($"cnt").as("t_tokens"))
      tf.join(broadcast(corpus), "term")
        .crossJoin(broadcast(total))
        .groupBy($"doc_id")
        .agg(sum($"tf").as("n_tokens"),
          (sum(when($"cnt" * 100 < $"t_tokens", $"tf").otherwise(0L))
            / sum($"tf")).as("rare_frac"),
          round(sum($"tf" * log($"cnt")) / sum($"tf")
            - log(max($"t_tokens")), 4).as("avg_logprob"))
        .orderBy($"doc_id")
    }),

    // ---- eval-set decontamination (benchmark overlap removal) ---------
    // Train docs sharing ≥2 distinct word 5-grams with any eval doc are
    // flagged for removal. The eval shingle set is DISTINCT and tiny
    // (benchmarks are small) → explicit broadcast; flagging is then a
    // map-side join over train shingles — single pass, no shuffle of the
    // train corpus. ≥2 filters out single-shingle random collisions
    // (31-word vocab ⇒ 5-gram space ≈ 2.9e7 ≫ corpus shingles).
    "q73_decontaminate" -> ((s, dir) => {
      import s.implicits._
      val sh = Tables.documentsWide(s, dir)
        .select($"doc_id",
          explode(TextOps.wordShingles($"text", ShingleN)).as("g"))
      val evalSh = sh.filter(isEval($"doc_id")).select($"g").distinct()
      sh.filter(!isEval($"doc_id"))
        .join(broadcast(evalSh), "g")
        .groupBy($"doc_id")
        .agg(count(lit(1)).as("n_shared"))
        .filter($"n_shared" >= 2)
        .orderBy($"doc_id")
    }),

    // ---- CCNet perplexity-stratified corpus selection (round 10) -------
    // The CCNet pipeline's head/middle/tail split: score every doc with
    // the corpus unigram LM (q72's machinery), rank PER LANGUAGE, and
    // keep the most-fluent two thirds — the standard pretraining
    // selection stage between language-ID and dedup. Ranking key is the
    // ROUNDED score (1e-4, the q72-proven cross-engine agreement band)
    // with a doc_id tie-break, so bucket boundaries can never tie-flip
    // between Spark and the oracle on last-ulp libm differences.
    // Scale: the LM join broadcasts vocabulary-bounded term stats; the
    // per-language window shards by lang (CCNet's own parallelism axis);
    // at extreme per-language volumes the same split runs on broadcast
    // approx-percentile thresholds instead of a full rank — the window
    // form is the exact one the oracle can replay.
    "q154_ccnet_select" -> ((s, dir) => {
      import s.implicits._
      val terms = Tables.documentsWide(s, dir)
        .select($"doc_id", $"lang", explode(TextOps.tokens($"text")).as("term"))
      val tf = terms.groupBy($"doc_id", $"lang", $"term")
        .agg(count(lit(1)).as("tf"))
      val corpus = terms.groupBy($"term").agg(count(lit(1)).as("cnt"))
      val total = corpus.agg(sum($"cnt").as("t_tokens"))
      val scored = tf.join(broadcast(corpus), "term")
        .crossJoin(broadcast(total))
        .groupBy($"doc_id", $"lang")
        .agg(round(sum($"tf" * log($"cnt")) / sum($"tf")
          - log(max($"t_tokens")), 4).as("lm_score"))
      val w = Window.partitionBy($"lang")
        .orderBy($"lm_score".desc, $"doc_id")
      val n = Window.partitionBy($"lang")
      scored.withColumn("r", row_number().over(w))
        .withColumn("n", count(lit(1)).over(n))
        .withColumn("bucket", when($"r" * 3 <= $"n", "head")
          .when($"r" * 3 <= $"n" * 2, "middle").otherwise("tail"))
        .filter($"bucket" =!= "tail")
        .select($"doc_id", $"lang", $"lm_score", $"bucket")
        .orderBy($"doc_id")
    }),
  )

  private val toksSql = "list_filter(string_split(text, ' '), t -> t != '')"
  private val qTermsSql = QueryTerms.map(t => s"'$t'").mkString(", ")

  def oracleSql: Map[String, String] = Map(
    "q70_tfidf" ->
      s"""WITH terms AS (
         |  SELECT doc_id, unnest($toksSql) AS term FROM documents),
         |tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM terms GROUP BY 1, 2),
         |df AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY 1),
         |n AS (SELECT COUNT(*) AS n_docs FROM documents),
         |ranked AS (
         |  SELECT tf.doc_id, tf.term, tf.tf, df.df, n.n_docs,
         |    row_number() OVER (PARTITION BY tf.doc_id
         |      ORDER BY tf.tf DESC, df.df ASC, tf.term ASC) AS rank
         |  FROM tf JOIN df USING (term) CROSS JOIN n)
         |SELECT doc_id, CAST(rank AS BIGINT) AS rank, term, tf, df,
         |  round(tf * ln(CAST(n_docs AS DOUBLE) / df), 6) AS tfidf
         |FROM ranked WHERE rank <= 3 ORDER BY doc_id, rank""".stripMargin,
    "q71_bm25" ->
      s"""WITH lens AS (
         |  SELECT doc_id, CAST(len($toksSql) AS BIGINT) AS dl FROM documents),
         |stats AS (SELECT COUNT(*) AS n_docs,
         |    CAST(SUM(dl) AS DOUBLE) / COUNT(*) AS avgdl FROM lens),
         |terms AS (SELECT doc_id, unnest($toksSql) AS term FROM documents),
         |tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM terms
         |       WHERE term IN ($qTermsSql) GROUP BY 1, 2),
         |df AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY 1)
         |SELECT tf.doc_id, COUNT(*) AS n_terms_hit,
         |  CAST(SUM(tf.tf) AS BIGINT) AS n_matches,
         |  round(SUM(
         |    ln(1.0 + (stats.n_docs - df.df + 0.5) / (df.df + 0.5)) *
         |    (tf.tf * ${K1 + 1.0}) /
         |    (tf.tf + $K1 * ((1.0 - $B) + $B * lens.dl / stats.avgdl))
         |  ), 6) AS bm25
         |FROM tf JOIN df USING (term) JOIN lens USING (doc_id)
         |CROSS JOIN stats
         |GROUP BY tf.doc_id ORDER BY tf.doc_id""".stripMargin,
    "q72_unigram_lm" ->
      s"""WITH terms AS (
         |  SELECT doc_id, unnest($toksSql) AS term FROM documents),
         |tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM terms GROUP BY 1, 2),
         |corpus AS (SELECT term, COUNT(*) AS cnt FROM terms GROUP BY 1),
         |total AS (SELECT SUM(cnt) AS t_tokens FROM corpus)
         |SELECT tf.doc_id, CAST(SUM(tf.tf) AS BIGINT) AS n_tokens,
         |  CAST(SUM(CASE WHEN corpus.cnt * 100 < total.t_tokens
         |    THEN tf.tf ELSE 0 END) AS DOUBLE) / SUM(tf.tf) AS rare_frac,
         |  round(SUM(tf.tf * ln(corpus.cnt)) / SUM(tf.tf)
         |    - ln(MAX(total.t_tokens)), 4) AS avg_logprob
         |FROM tf JOIN corpus USING (term) CROSS JOIN total
         |GROUP BY tf.doc_id ORDER BY tf.doc_id""".stripMargin,
    "q73_decontaminate" ->
      s"""WITH toks AS (
         |  SELECT doc_id, $toksSql AS w FROM documents),
         |sh AS (
         |  SELECT doc_id, unnest(list_distinct(list_transform(
         |    range(1, len(w) - ${ShingleN - 2}),
         |    i -> ${(0 until ShingleN).map(k => s"w[i+$k]").mkString(" || ' ' || ")}))) AS g
         |  FROM toks),
         |ev AS (SELECT DISTINCT g FROM sh WHERE doc_id % 50 = 0),
         |tr AS (SELECT * FROM sh WHERE doc_id % 50 != 0)
         |SELECT tr.doc_id, COUNT(*) AS n_shared
         |FROM tr JOIN ev USING (g)
         |GROUP BY tr.doc_id HAVING COUNT(*) >= 2
         |ORDER BY tr.doc_id""".stripMargin,
    "q154_ccnet_select" ->
      s"""WITH terms AS (
         |  SELECT doc_id, lang, unnest($toksSql) AS term FROM documents),
         |tf AS (SELECT doc_id, lang, term, COUNT(*) AS tf
         |  FROM terms GROUP BY 1, 2, 3),
         |corpus AS (SELECT term, COUNT(*) AS cnt FROM terms GROUP BY 1),
         |total AS (SELECT SUM(cnt) AS t_tokens FROM corpus),
         |scored AS (
         |  SELECT tf.doc_id, tf.lang,
         |    round(SUM(tf.tf * ln(corpus.cnt)) / SUM(tf.tf)
         |      - ln(MAX(total.t_tokens)), 4) AS lm_score
         |  FROM tf JOIN corpus USING (term) CROSS JOIN total
         |  GROUP BY 1, 2),
         |ranked AS (
         |  SELECT doc_id, lang, lm_score,
         |    row_number() OVER (PARTITION BY lang
         |      ORDER BY lm_score DESC, doc_id) AS r,
         |    COUNT(*) OVER (PARTITION BY lang) AS n
         |  FROM scored)
         |SELECT doc_id, lang, lm_score,
         |  CASE WHEN r * 3 <= n THEN 'head' ELSE 'middle' END AS bucket
         |FROM ranked WHERE r * 3 <= n * 2
         |ORDER BY doc_id""".stripMargin,
  )
}
