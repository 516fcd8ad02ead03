package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.functions.TextOps

/** Corpus-preparation operators for training-data pipelines — the steps
  * between "raw documents" and "training shards" that a 100 TB run
  * needs beyond dedup/quality (SURVEY.md §2b K/E rows):
  *
  *  - q40 deterministic stratified sampling: keep a document iff the md5
  *    of a salted key falls under a per-stratum threshold. No RNG state,
  *    no coordination — any worker, any partitioning, any engine decides
  *    membership identically (the property `df.sample` does NOT have),
  *    and re-runs/backfills pick the exact same subset. Thresholds are
  *    hex-prefix compares (first byte of md5 ~ U[0,256)): 'en' keeps
  *    26/256 ≈ 10%, others 77/256 ≈ 30%.
  *  - q41 token-budget sharding: contiguous ~1000-token shards per
  *    language stratum via a windowed running sum. Sharding is
  *    *contiguous by construction* (docs stay in doc_id order), so the
  *    window partitions by the stratum — the scale dial is the stratum
  *    key: at 100 TB partition by (lang, day) or hash-bucket so no
  *    single stratum funnels through one reducer; round-robin hashing
  *    would parallelize fully but loses contiguity.
  *  - q42 cleaning + truncation: drop short tokens, cap at 50 tokens —
  *    a narrow per-row projection (single scan stage, full codegen).
  *  - q43 sliding-window chunking: 32-token chunks at stride 24 (8-token
  *    overlap) — the RAG/pretraining chunker. One explode per chunk, no
  *    shuffle except the presentation sort; output rows ≈ n_tokens/24.
  *
  * All four are DuckDB-oracle-checked (md5 and token math are
  * engine-neutral; see QueriesText's determinism contract).
  */
object QueriesCorpus {

  private val SampleSalt = "graft-sample-42:"

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- deterministic stratified sampling ----------------------------
    "q40_sample_stratified" -> ((s, dir) => {
      import s.implicits._
      val h = md5(concat(lit(SampleSalt), $"doc_id".cast("string")).cast("binary"))
      val thr = when($"lang" === "en", lit("1a")).otherwise(lit("4d"))
      Tables.documents(s, dir)
        .withColumn("h", h)
        .filter(substring($"h", 1, 2) < thr)
        .select($"doc_id", $"lang", $"n_chars", $"h".as("sample_key"))
        .orderBy($"doc_id")
    }),

    // ---- token-budget sharding (contiguous, per-stratum) --------------
    // Budgets in TRUE BPE tokens (graft.functions.Bpe over the committed
    // merges fixture), not whitespace/pre-tokenizer pieces — piece
    // counts drift 10-30%+ from what the trainer actually consumes, so
    // shard boundaries cut at the wrong documents. Same plan shape: the
    // encode is a per-row projection; the only shuffle stays the
    // per-stratum running-sum window.
    "q41_token_shards" -> ((s, dir) => {
      import s.implicits._
      val w = Window.partitionBy($"lang").orderBy($"doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.documents(s, dir)
        .select($"doc_id", $"lang",
          size(graft.functions.Bpe.tokensNative($"text")).cast("long")
            .as("n_tokens"))
        .withColumn("cum", sum($"n_tokens").over(w))
        .withColumn("shard", floor(($"cum" - $"n_tokens") / 1000.0).cast("long"))
        .groupBy($"lang", $"shard")
        .agg(count(lit(1)).as("n_docs"), sum($"n_tokens").as("shard_tokens"),
          min($"doc_id").as("first_doc"), max($"doc_id").as("last_doc"))
        .orderBy($"lang", $"shard")
    }),

    // ---- cleaning + truncation ----------------------------------------
    "q42_clean_truncate" -> ((s, dir) => {
      import s.implicits._
      val toks = TextOps.tokens($"text")
      val kept = filter(toks, t => length(t) > 2)
      Tables.documents(s, dir)
        .select($"doc_id",
          size(toks).cast("long").as("n_tokens"),
          size(kept).cast("long").as("n_kept"),
          array_join(slice(kept, 1, 50), " ").as("clean_text"),
          least(size(kept), lit(50)).cast("long").as("n_out"))
        .orderBy($"doc_id")
    }),

    // ---- sliding-window token chunking --------------------------------
    "q43_token_chunks" -> ((s, dir) => {
      import s.implicits._
      val chunkLen = 32
      val stride = 24
      Tables.documents(s, dir)
        .select($"doc_id", TextOps.tokens($"text").as("w"))
        .filter(size($"w") > 0)
        .withColumn("n_tokens", size($"w").cast("long"))
        .select($"doc_id", $"n_tokens",
          posexplode(transform(
            sequence(lit(0), size($"w") - 1, lit(stride)),
            st => array_join(slice($"w", st + 1, lit(chunkLen)), " "))))
        .select($"doc_id",
          $"pos".cast("long").as("chunk_idx"),
          $"col".as("chunk_text"),
          least(lit(chunkLen.toLong),
            $"n_tokens" - lit(stride.toLong) * $"pos").as("n_chunk_tokens"))
        .orderBy($"doc_id", $"chunk_idx")
    }),

    // ---- sequence packing (training-example assembly) -----------------
    // The step after chunking/sharding that decides which docs SHARE a
    // training example: per-shard sequential greedy packing into
    // 256-token sequences (operators/SeqPack.scala) — order-preserving,
    // deterministic under any partitioning, docs never split, oversize
    // docs get a sequence of their own. One shuffle on the shard key +
    // a partition-local pass. The oracle replays the same greedy
    // recurrence as a DuckDB recursive CTE, so a packing that drops a
    // doc, splits one, or breaks sequences at the wrong boundary
    // hash-fails.
    "q120_seq_pack" -> ((s, dir) => {
      import s.implicits._
      val docs = Tables.documents(s, dir)
        .select($"doc_id", size(TextOps.tokens($"text")).cast("long").as("n_tokens"))
      graft.operators.SeqPack.pack(docs,
          shard = $"doc_id" % 8, order = $"doc_id", tok = $"n_tokens",
          capacity = 256L)
        .select($"doc_id", ($"doc_id" % 8).as("shard"), $"n_tokens", $"seq_no")
        .orderBy($"doc_id")
    }),

    // ---- weighted corpus mixing ---------------------------------------
    // The training-mixture knob: sources are grouped into quality buckets
    // and sampled at per-bucket rates (curated 100%, balanced ~50%, web
    // ~12.5%) with the same salted-md5 membership as q40 — so the mixed
    // corpus is reproducible across runs, engines, and partitionings,
    // and re-weighting = changing thresholds, not reshuffling data.
    "q46_corpus_mix" -> ((s, dir) => {
      import s.implicits._
      val srcNum = regexp_extract($"source", "([0-9]+)", 1).cast("int")
      val bucket = when(srcNum < 5, "curated")
        .when(srcNum < 10, "balanced").otherwise("web")
      val thr = when(srcNum < 5, lit("zz")) // keep-all: above every hex pair
        .when(srcNum < 10, lit("80")).otherwise(lit("20"))
      val h = md5(concat(lit(MixSalt), $"doc_id".cast("string")).cast("binary"))
      Tables.documents(s, dir)
        .withColumn("bucket", bucket)
        .filter(substring(h, 1, 2) < thr)
        .groupBy($"bucket", $"source")
        .agg(count(lit(1)).as("n_docs"), sum($"n_chars").as("n_chars_kept"))
        .orderBy($"bucket", $"source")
    }),

    // ---- fixed-SIZE deterministic stratified sample -------------------
    // q40 fixes the RATE; this fixes the COUNT: exactly k docs per
    // stratum, chosen as the k smallest salted-md5 hashes — a
    // deterministic reservoir (same members under any partitioning or
    // re-run; growing the corpus only ever swaps members whose hash
    // beats an incumbent). The eval-subset builder. Plan: one shuffle
    // by stratum + WindowGroupLimit (per-partition top-k pre-filter
    // before the exchange — Spark's rank-pushdown keeps the shuffle
    // O(strata·k), not O(corpus); at extreme corpus:k ratios add a
    // q40-style rate pre-filter at ~2k/n to bound the scan output).
    "q81_sample_fixed_k" -> ((s, dir) => {
      import s.implicits._
      val k = 20
      val h = md5(concat(lit(SampleSalt), $"doc_id".cast("string")).cast("binary"))
      val w = Window.partitionBy($"lang").orderBy($"h", $"doc_id")
      Tables.documents(s, dir)
        .withColumn("h", h)
        .withColumn("rank", row_number().over(w))
        .filter($"rank" <= k)
        .select($"lang", $"rank".cast("long").as("rank"), $"doc_id",
          $"h".as("sample_key"))
        .orderBy($"lang", $"rank")
    }),

    // ---- DSIR importance resampling (X90) ------------------------------
    // Data Selection via Importance Resampling (Xie et al. 2023), the
    // hashed-n-gram form used for LLM pretraining corpora: score each
    // RAW document by how target-like its n-gram distribution is —
    // Σ log(p_target(b)/p_raw(b)) over the doc's hashed n-gram buckets,
    // under add-one smoothing. Buckets are the first 2 hex chars of
    // md5(gram) (256 buckets — the engine-neutral feature hash the
    // sampling family already rides); the target corpus here is the
    // 'en' slice. Scale shape: one n-gram explode feeding two 256-group
    // map-side-combined aggregations, the 256-row log-ratio table
    // BROADCAST back, and one doc-keyed aggregation — no shuffle ever
    // carries the corpus's n-grams to a non-combinable key. Per-doc
    // score = mean bucket log-ratio, rounded (the q72 cross-engine
    // log contract).
    "q146_dsir_resample" -> ((s, dir) => {
      import s.implicits._
      val grams = Tables.documents(s, dir)
        .select($"doc_id", $"lang",
          explode(TextOps.wordNgrams($"text", 2)).as("g"))
        .withColumn("b", substring(md5($"g".cast("binary")), 1, 2))
      val raw = grams.groupBy($"b").agg(count(lit(1)).as("rcnt"))
      val tgt = grams.filter($"lang" === "en")
        .groupBy($"b").agg(count(lit(1)).as("tcnt"))
      val tots = raw.agg(sum($"rcnt").as("rtot"))
        .crossJoin(tgt.agg(sum($"tcnt").as("ttot")))
      val lam = raw.join(tgt, Seq("b"), "left")
        .crossJoin(broadcast(tots))
        .select($"b",
          (log((coalesce($"tcnt", lit(0L)) + 1).cast("double") /
              ($"ttot" + 256).cast("double")) -
            log(($"rcnt" + 1).cast("double") /
              ($"rtot" + 256).cast("double"))).as("lam"))
      grams.join(broadcast(lam), "b")
        .groupBy($"doc_id")
        .agg(count(lit(1)).as("n_grams"),
          // + 0.0 normalizes IEEE signed zero: Spark's round() (BigDecimal)
          // yields +0.0 where DuckDB's ROUND keeps -0.0; -0.0 + 0.0 = +0.0
          // on both engines, so the bit-level hash gate agrees.
          (round(sum($"lam") / count(lit(1)), 4) + lit(0.0)).as("dsir_score"))
        .orderBy($"doc_id")
    }),
  )

  private val MixSalt = "graft-mix-7:"
  private val toksSql = "list_filter(string_split(text, ' '), t -> t != '')"

  def oracleSql: Map[String, String] = Map(
    // the same smoothed log-ratio replayed relationally; docs with no
    // 2-gram (single-token texts) drop from both sides identically
    "q146_dsir_resample" ->
      s"""WITH docs AS (
         |  SELECT doc_id, lang, $toksSql AS toks FROM documents),
         |grams AS (
         |  SELECT doc_id, lang, substr(md5(toks[i] || ' ' || toks[i+1]), 1, 2) AS b
         |  FROM docs, unnest(range(1, len(toks))) AS t(i)),
         |raw AS (SELECT b, COUNT(*) AS rcnt FROM grams GROUP BY 1),
         |tgt AS (SELECT b, COUNT(*) AS tcnt FROM grams WHERE lang = 'en' GROUP BY 1),
         |tots AS (SELECT (SELECT SUM(rcnt) FROM raw) AS rtot,
         |                (SELECT SUM(tcnt) FROM tgt) AS ttot),
         |lam AS (
         |  SELECT raw.b,
         |    ln((COALESCE(tcnt, 0) + 1) / (ttot + 256.0)) -
         |    ln((rcnt + 1) / (rtot + 256.0)) AS lam
         |  FROM raw LEFT JOIN tgt ON raw.b = tgt.b CROSS JOIN tots)
         |SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_grams,
         |  ROUND(SUM(lam) / COUNT(*), 4) + 0.0 AS dsir_score
         |FROM grams JOIN lam ON grams.b = lam.b
         |GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    // the same greedy packing recurrence, replayed sequentially per
    // shard as a linear recursive CTE (depth = max docs per shard)
    "q120_seq_pack" ->
      s"""WITH RECURSIVE d AS (
         |  SELECT doc_id, doc_id % 8 AS shard,
         |    CAST(len($toksSql) AS BIGINT) AS n_tokens,
         |    row_number() OVER (PARTITION BY doc_id % 8 ORDER BY doc_id)
         |      AS rn
         |  FROM documents),
         |p AS (
         |  SELECT shard, rn, doc_id, n_tokens, n_tokens AS fill,
         |    CAST(0 AS BIGINT) AS seq_no
         |  FROM d WHERE rn = 1
         |  UNION ALL
         |  SELECT d.shard, d.rn, d.doc_id, d.n_tokens,
         |    CASE WHEN p.fill + d.n_tokens > 256 THEN d.n_tokens
         |         ELSE p.fill + d.n_tokens END,
         |    CASE WHEN p.fill + d.n_tokens > 256 THEN p.seq_no + 1
         |         ELSE p.seq_no END
         |  FROM d JOIN p ON d.shard = p.shard AND d.rn = p.rn + 1)
         |SELECT doc_id, shard, n_tokens, seq_no FROM p
         |ORDER BY doc_id""".stripMargin,
    "q81_sample_fixed_k" ->
      s"""WITH h AS (
         |  SELECT lang, doc_id,
         |    md5('$SampleSalt' || CAST(doc_id AS VARCHAR)) AS h
         |  FROM documents),
         |r AS (
         |  SELECT lang, doc_id, h,
         |    row_number() OVER (PARTITION BY lang ORDER BY h, doc_id) AS rank
         |  FROM h)
         |SELECT lang, CAST(rank AS BIGINT) AS rank, doc_id, h AS sample_key
         |FROM r WHERE rank <= 20 ORDER BY lang, rank""".stripMargin,
    "q40_sample_stratified" ->
      s"""SELECT doc_id, lang, n_chars, h AS sample_key FROM (
         |  SELECT doc_id, lang, n_chars,
         |    md5('$SampleSalt' || CAST(doc_id AS VARCHAR)) AS h
         |  FROM documents)
         |WHERE substr(h,1,2) < (CASE WHEN lang='en' THEN '1a' ELSE '4d' END)
         |ORDER BY doc_id""".stripMargin,
    "q41_token_shards" ->
      s"""WITH t AS (
         |  SELECT doc_id, lang,
         |    len(${graft.functions.Bpe.duckTokens("text")}) AS n_tokens
         |  FROM documents),
         |c AS (
         |  SELECT doc_id, lang, n_tokens,
         |    SUM(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
         |  FROM t)
         |SELECT lang, CAST(floor((cum - n_tokens) / 1000.0) AS BIGINT) AS shard,
         |  COUNT(*) AS n_docs, CAST(SUM(n_tokens) AS BIGINT) AS shard_tokens,
         |  MIN(doc_id) AS first_doc, MAX(doc_id) AS last_doc
         |FROM c GROUP BY 1,2 ORDER BY lang, shard""".stripMargin,
    "q42_clean_truncate" ->
      s"""WITH t AS (
         |  SELECT doc_id, $toksSql AS w,
         |    list_filter(string_split(text,' '), t -> length(t) > 2) AS kept
         |  FROM documents)
         |SELECT doc_id, len(w) AS n_tokens, len(kept) AS n_kept,
         |  array_to_string(kept[1:50], ' ') AS clean_text,
         |  least(len(kept), 50) AS n_out
         |FROM t ORDER BY doc_id""".stripMargin,
    "q43_token_chunks" ->
      s"""WITH t AS (
         |  SELECT doc_id, $toksSql AS w FROM documents)
         |SELECT doc_id, CAST(st // 24 AS BIGINT) AS chunk_idx,
         |  array_to_string(w[st+1 : st+32], ' ') AS chunk_text,
         |  least(32, len(w) - st) AS n_chunk_tokens
         |FROM t, UNNEST(generate_series(0, len(w)-1, 24)) AS u(st)
         |WHERE len(w) > 0
         |ORDER BY doc_id, chunk_idx""".stripMargin,
    "q46_corpus_mix" ->
      s"""WITH t AS (
         |  SELECT doc_id, source, n_chars,
         |    CAST(regexp_extract(source, '([0-9]+)', 1) AS INT) AS sn,
         |    md5('$MixSalt' || CAST(doc_id AS VARCHAR)) AS h
         |  FROM documents),
         |b AS (
         |  SELECT *,
         |    CASE WHEN sn < 5 THEN 'curated'
         |         WHEN sn < 10 THEN 'balanced' ELSE 'web' END AS bucket,
         |    CASE WHEN sn < 5 THEN 'zz'
         |         WHEN sn < 10 THEN '80' ELSE '20' END AS thr
         |  FROM t)
         |SELECT bucket, source, COUNT(*) AS n_docs,
         |  CAST(SUM(n_chars) AS BIGINT) AS n_chars_kept
         |FROM b WHERE substr(h,1,2) < thr
         |GROUP BY 1,2 ORDER BY bucket, source""".stripMargin,
  )
}
