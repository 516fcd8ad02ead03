package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.{Dedup, TextOps, Vectors}

/** End-to-end corpus curation: the composite a real training-data
  * pipeline runs — near-dup removal (keep the lowest doc_id of each
  * near-dup pair) followed by a quality gate, reported per language
  * (q35); and a cross-modal selection joining text-side quality signals
  * with embedding-side relevance (q37). Exercises operator COMPOSITION:
  * the dedup pair producer, the text quality metrics, anti-join
  * semantics, and vector scoring all feed one result.
  *
  * Scale shape: pair generation is the banded/inverted-index path (never
  * all-pairs), the drop-set join strategy is left to AQE (broadcast
  * when small, shuffle when not), and the stats are one hash
  * aggregation. q37's rank
  * window partitions by `label` (bounded groups), and raw cosine floats
  * are never emitted — rank membership/order is engine-stable (min
  * corpus gap 1.7e-4 vs ~3e-8 float-vs-double accumulation noise).
  */
object QueriesCuration {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- write-audit-publish ingest (X98) -----------------------------
    // The staged-ingest contract a production corpus needs: a risky
    // crawl batch stages INVISIBLY (`stageAppend` — real files, no
    // visible commit), the audit runs against the would-be table
    // (`readWap`), the raw batch is rejected (`abortWap`), a
    // quality-gated restage publishes in ONE O(metadata) commit
    // (`publishWap`). Three legs pin the lifecycle relationally:
    // `before` proves staging is invisible (pre-publish snapshot = base
    // only), `audit` proves readWap sees the staged rows (per-lang
    // reject counts computed FROM the audit frame), `after` is the
    // published state. Scale shape: publish moves no data; the audit
    // legs are per-lang aggregates (bounded rows); nothing corpus-sized
    // touches the driver except the bounded audit-leg rows.
    "q150_wap_publish" -> ((s, dir) => {
      import s.implicits._
      val tmp = graft.QueryTmp.dir("graft_q150_")
      val t = graft.table.IncrementalTable(s, s"$tmp/corpus/v1")
      val docs = Tables.documents(s, dir)
        .select($"doc_id", $"lang", $"source", $"n_chars")
      t.append(docs.filter($"doc_id" % 3 =!= 0), partitionBy = Nil)
      t.stageAppend(docs.filter($"doc_id" % 3 === 0), "crawl-raw")
      def legOf(df: DataFrame, leg: String) = df.groupBy($"lang")
        .agg(count(lit(1)).as("n_docs"), sum($"n_chars").as("n_chars"))
        .select(lit(leg).as("leg"), $"lang", $"n_docs", $"n_chars")
      // staging is invisible: the pre-publish snapshot is base only
      // (read() pins its live-file list eagerly, so the leg stays
      // `before` even when evaluated after the publish below)
      val before = legOf(t.read(), "before")
      // the audit reads the WOULD-BE table; its rows are materialized
      // NOW (bounded: one row per language) because the abort below
      // deletes the staged files this frame reads
      val auditRows = legOf(
        t.readWap("crawl-raw")
          .filter($"doc_id" % 3 === 0 && !$"n_chars".between(80, 2000)),
        "audit").collect().toSeq
      val audit = s.createDataFrame(
        s.sparkContext.parallelize(auditRows, 1), before.schema)
      t.abortWap("crawl-raw")
      t.stageAppend(
        docs.filter($"doc_id" % 3 === 0 && $"n_chars".between(80, 2000)),
        "crawl-clean")
      t.publishWap("crawl-clean")
      val after = legOf(t.read(), "after")
      after.unionByName(audit).unionByName(before)
        .orderBy($"leg", $"lang")
    }),

    // ---- multi-table atomic publish (X107) ---------------------------
    // The reference's derived-DAG shape (processed + backwards landing
    // together, ingest_example/__init__.py:7-15) under ONE publish
    // decision: epoch 2 stages on BOTH tables (invisible), a single
    // MultiPublish intent + per-child O(metadata) publish makes it
    // visible everywhere at once, crash-recovery re-drives half-done
    // publishes (MultiPublishSpec kills the process between children).
    // Legs pin the lifecycle relationally: `before` proves both
    // stagings invisible, `after` proves the joint state; n_rev_ok
    // (content fingerprint round-trip through the reversed twin) proves
    // actual rows flowed, not just counts. Scale shape: publish moves
    // no data; legs are per-lang aggregates over a doc_id equi-join AQE
    // plans itself.
    "q162_multi_publish" -> ((s, dir) => {
      import s.implicits._
      val tmp = graft.QueryTmp.dir("graft_q162_")
      val proc = graft.table.IncrementalTable(s, s"$tmp/pipe/processed")
      val back = graft.table.IncrementalTable(s, s"$tmp/pipe/backwards")
      val docs = Tables.documents(s, dir).select($"doc_id", $"lang", $"text")
      val procDf = docs.select($"doc_id", $"lang",
        length($"text").cast("long").as("n_chars"),
        md5($"text".cast("binary")).as("fp"))
      val backDf = docs.select($"doc_id", reverse($"text").as("rtext"))
      proc.append(procDf.filter($"doc_id" % 2 === 0), Nil)
      back.append(backDf.filter($"doc_id" % 2 === 0), Nil)
      proc.stageAppend(procDf.filter($"doc_id" % 2 =!= 0), "epoch2")
      back.stageAppend(backDf.filter($"doc_id" % 2 =!= 0), "epoch2")
      def legOf(leg: String) = proc.read()
        .join(back.read(), Seq("doc_id"))
        .groupBy($"lang")
        .agg(count(lit(1)).as("n_docs"), sum($"n_chars").as("n_chars"),
          sum(when(md5(reverse($"rtext").cast("binary")) === $"fp", 1L)
            .otherwise(0L)).as("n_rev_ok"))
        .select(lit(leg).as("leg"), $"lang", $"n_docs", $"n_chars", $"n_rev_ok")
      // pre-publish joint view — both stagings invisible (file lists
      // pin eagerly, so the leg survives the publish below)
      val before = legOf("before")
      val mp = new graft.table.MultiPublish(s, s"$tmp/pipe/_publish")
      mp.publish("epoch2", Seq(proc, back))
      val after = legOf("after")
      after.unionByName(before).orderBy($"leg", $"lang")
    }),

    // ---- branch lifecycle (X102, the Iceberg branch-ref analog) ------
    // A corpus re-curation developed on a BRANCH while main serves
    // readers: fork, land an append AND a partition-scoped re-curation
    // of lang=de on the fork (the replace resolves against the
    // branch's OWN live set — it must subtract the branch's earlier de
    // adds too), then fast-forward main to the branch head in ONE
    // O(metadata) commit. Three legs pin the lifecycle relationally:
    // `before` proves branch writes are invisible to main, `branch` is
    // the fork head, `after` proves fast-forward reproduced it exactly
    // on main. Scale shape: the publish moves no data; legs are
    // per-lang aggregates (bounded rows).
    "q155_branch_lifecycle" -> ((s, dir) => {
      import s.implicits._
      val tmp = graft.QueryTmp.dir("graft_q155_")
      val t = graft.table.IncrementalTable(s, s"$tmp/corpus/main")
      val docs = Tables.documents(s, dir)
        .select($"doc_id", $"lang", $"n_chars")
      t.append(docs.filter($"doc_id" % 4 =!= 0), partitionBy = Seq("lang"))
      t.createBranch("recurate")
      t.appendBranch(docs.filter($"doc_id" % 4 === 0), "recurate",
        partitionBy = Seq("lang"))
      t.replaceWhereBranch(
        docs.filter($"lang" === "de" && $"n_chars".between(100, 400)),
        "recurate", Seq("lang"), Map.empty, Map("lang" -> "de"))
      def legOf(df: DataFrame, leg: String) = df.groupBy($"lang")
        .agg(count(lit(1)).as("n_docs"), sum($"n_chars").as("n_chars"))
        .select(lit(leg).as("leg"), $"lang", $"n_docs", $"n_chars")
      // main is blind to the chain (read() pins its live list eagerly,
      // so the leg stays `before` even when evaluated after the ff)
      val before = legOf(t.read(), "before")
      // the fork head — file list pinned now; ff below only ADOPTS
      // these files (never deletes), so the frame stays valid
      val branchLeg = legOf(t.readBranch("recurate"), "branch")
      t.fastForward("recurate")
      val after = legOf(t.read(), "after")
      after.unionByName(branchLeg).unionByName(before)
        .orderBy($"leg", $"lang")
    }),

    // ---- model-based quality classifier (fastText-filter analog) -----
    // The standard pretraining curation stage DSIR/CCNet bracket: train
    // a tiny logistic-regression quality model ON the corpus (weak
    // supervision: "en, mid-length" as the positive class) and score
    // every document. Training is FULL-BATCH gradient descent, 3 fixed
    // iterations — each ONE map-side-combined aggregation over the
    // corpus with the current weights BROADCAST as literals (at 100 TB:
    // 3 scans, no shuffle wider than 4 partial sums, no driver data).
    // Gradient sums go through DECIMAL (the exactSum rule): fp addition
    // is order-sensitive and Spark's partial aggregation order is not
    // deterministic — decimal sums are exact and engine-agnostic, so
    // the trained weights match DuckDB's sequential replay bit-for-bit
    // and the scores hash-compare. The sigmoid's exp differs by at most
    // an ulp across engines; the 1e-4 score rounding absorbs it.
    "q158_quality_classifier" -> ((s, dir) => {
      import s.implicits._
      import org.apache.spark.sql.types.DecimalType
      val toks = TextOps.tokens($"text")
      val nTok = size(toks)
      val feats = Tables.documents(s, dir).select(
        $"doc_id",
        (least($"n_chars", lit(600L)).cast("double") / 600.0).as("x1"),
        (least(nTok, lit(120)).cast("double") / 120.0).as("x2"),
        when(nTok > 0, TextOps.tokensIn(toks, TextOps.stopwords)
          .cast("double") / nTok).otherwise(0.0).as("x3"),
        ($"lang" === "en" && $"n_chars".between(120, 450))
          .cast("double").as("y"))
      val n = feats.count().toDouble
      var w = Array(0.0, 0.0, 0.0, 0.0)
      def z = lit(w(0)) + lit(w(1)) * $"x1" + lit(w(2)) * $"x2" +
        lit(w(3)) * $"x3"
      (1 to 3).foreach { _ =>
        val err = lit(1.0) / (lit(1.0) + exp(-z)) - $"y"
        val g = feats.agg(
          sum(err.cast(DecimalType(28, 14))).as("g0"),
          sum((err * $"x1").cast(DecimalType(28, 14))).as("g1"),
          sum((err * $"x2").cast(DecimalType(28, 14))).as("g2"),
          sum((err * $"x3").cast(DecimalType(28, 14))).as("g3")).head
        w = w.indices.map(j =>
          w(j) - 4.0 * g.getDecimal(j).doubleValue() / n).toArray
      }
      feats.select($"doc_id",
        round(lit(1.0) / (lit(1.0) + exp(-z)), 4).as("quality"),
        $"y".cast("long").as("label"))
        .orderBy($"doc_id")
    }),

    // ---- per-domain cap (C4/RefinedWeb-style source balancing) -------
    // At most K docs per source, best-first: a handful of crawl domains
    // otherwise dominate a pretraining mix. "Best" = longest text
    // (ties by doc_id — deterministic on both engines); one window per
    // source group, the standard rank-and-filter plan. Scale shape:
    // shuffle keyed on source with map-side projection to (source,
    // length, id) — never the text bytes; a skewed mega-domain is
    // bounded by the per-partition TopK the rank filter plans to.
    "q149_domain_cap" -> ((s, dir) => {
      import s.implicits._
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy($"source")
        .orderBy(length($"text").desc, $"doc_id")
      Tables.documents(s, dir)
        .withColumn("cap_rank", row_number().over(w).cast("long"))
        .filter($"cap_rank" <= 10)
        .select($"doc_id", $"source", $"cap_rank")
        .orderBy($"doc_id")
    }),

    "q35_curation" -> ((s, dir) => {
      import s.implicits._
      val docs = Tables.documentsWide(s, dir)
      // b-side of every near-dup pair drops; pair clusters in this corpus
      // are cliques, so min-id survivors are exactly the non-b docs.
      // No broadcast hint: the drop-set size is data-dependent (a
      // high-dup corpus makes it huge), so the strategy is left to
      // AQE, which broadcasts it whenever it is actually small.
      val dropDup = Dedup.ngramJaccardPairs(docs, $"doc_id", $"text", 3, 0.5)
        .select($"b_id".as("doc_id")).distinct()
      val toks = TextOps.tokens($"text")
      val nTok = size(toks).cast("long")
      val scored = docs
        .withColumn("n_tokens", nTok)
        .withColumn("stop_ratio", TextOps.tokensIn(toks, TextOps.stopwords) / nTok)
        .withColumn("len_ok", length($"text").between(100, 450))
      val kept = scored
        .join(dropDup, Seq("doc_id"), "left_anti")
        .filter($"len_ok" && $"stop_ratio" >= 0.05)
      kept.groupBy($"lang")
        .agg(
          count(lit(1)).as("n_docs"),
          sum($"n_tokens").as("n_tokens"),
          min($"doc_id").as("first_doc"))
        .orderBy($"lang")
    }),

    // ---- cross-modal relevance selection ------------------------------
    // For each embedding label, the 3 quality-gated documents most
    // similar to a reference vector: text table supplies the gate
    // (n_chars), embeddings the relevance, joined 1:1 on doc_id=vec_id.
    "q37_crossmodal_rank" -> ((s, dir) => {
      import s.implicits._
      val e = Tables.embeddingsWide(s, dir)
      val d = Tables.documentsWide(s, dir)
      // reference vector: one row collected driver-side (any scale)
      val ref = e.filter($"vec_id" === 0).select($"embedding")
        .as[Array[Float]].head().toSeq
      val w = Window.partitionBy($"label").orderBy($"sim".desc, $"vec_id")
      e.filter($"vec_id" =!= 0)
        .join(d.filter($"n_chars" >= 100), $"doc_id" === $"vec_id")
        .select($"label".cast("long").as("label"), $"vec_id", $"lang", $"n_chars",
          Vectors.cosineNative($"embedding", typedLit(ref)).as("sim"))
        .withColumn("rnk", row_number().over(w).cast("long"))
        .filter($"rnk" <= 3)
        .select($"label", $"rnk", $"vec_id".as("doc_id"), $"lang", $"n_chars")
        .orderBy($"label", $"rnk")
    }),
  )

  def oracleSql: Map[String, String] = Map(
    "q150_wap_publish" ->
      """WITH base AS (
        |  SELECT * FROM documents WHERE doc_id % 3 <> 0),
        |raw AS (
        |  SELECT * FROM documents WHERE doc_id % 3 = 0),
        |bad AS (
        |  SELECT * FROM raw WHERE n_chars NOT BETWEEN 80 AND 2000),
        |clean AS (
        |  SELECT * FROM raw WHERE n_chars BETWEEN 80 AND 2000)
        |SELECT leg, lang, n_docs, n_chars FROM (
        |  SELECT 'after' AS leg, lang, COUNT(*) AS n_docs,
        |    CAST(SUM(n_chars) AS BIGINT) AS n_chars
        |  FROM (SELECT * FROM base UNION ALL SELECT * FROM clean)
        |  GROUP BY lang
        |  UNION ALL
        |  SELECT 'audit' AS leg, lang, COUNT(*) AS n_docs,
        |    CAST(SUM(n_chars) AS BIGINT) AS n_chars
        |  FROM bad GROUP BY lang
        |  UNION ALL
        |  SELECT 'before' AS leg, lang, COUNT(*) AS n_docs,
        |    CAST(SUM(n_chars) AS BIGINT) AS n_chars
        |  FROM base GROUP BY lang)
        |ORDER BY leg, lang""".stripMargin,

    "q162_multi_publish" ->
      """WITH p AS (
        |  SELECT doc_id, lang, length(text) AS n_chars FROM documents)
        |SELECT leg, lang, n_docs, n_chars, n_rev_ok FROM (
        |  SELECT 'after' AS leg, lang, COUNT(*) AS n_docs,
        |    CAST(SUM(n_chars) AS BIGINT) AS n_chars,
        |    COUNT(*) AS n_rev_ok
        |  FROM p GROUP BY lang
        |  UNION ALL
        |  SELECT 'before' AS leg, lang, COUNT(*) AS n_docs,
        |    CAST(SUM(n_chars) AS BIGINT) AS n_chars,
        |    COUNT(*) AS n_rev_ok
        |  FROM p WHERE doc_id % 2 = 0 GROUP BY lang)
        |ORDER BY leg, lang""".stripMargin,

    // the training loop replayed relationally: one CTE per gradient
    // aggregation + weight update, decimal-exact sums, same sigmoid
    "q158_quality_classifier" ->
      """WITH f AS (
        |  SELECT doc_id,
        |    least(n_chars, 600) / 600.0 AS x1,
        |    least(len(toks), 120) / 120.0 AS x2,
        |    CASE WHEN len(toks) > 0 THEN
        |      CAST(len(list_filter(toks, t -> list_contains(
        |        ['the','a','of','and','to','in','is','it'], t))) AS DOUBLE)
        |        / len(toks)
        |      ELSE 0.0 END AS x3,
        |    CASE WHEN lang = 'en' AND n_chars BETWEEN 120 AND 450
        |      THEN 1.0 ELSE 0.0 END AS y
        |  FROM (SELECT doc_id, lang, n_chars,
        |          list_filter(string_split(text, ' '), t -> t != '') AS toks
        |        FROM documents)),
        |c AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM f),
        |g1 AS (SELECT
        |    CAST(SUM(CAST(1.0/(1.0+exp(0.0)) - y AS DECIMAL(28,14))) AS DOUBLE) AS g0,
        |    CAST(SUM(CAST((1.0/(1.0+exp(0.0)) - y) * x1 AS DECIMAL(28,14))) AS DOUBLE) AS g1,
        |    CAST(SUM(CAST((1.0/(1.0+exp(0.0)) - y) * x2 AS DECIMAL(28,14))) AS DOUBLE) AS g2,
        |    CAST(SUM(CAST((1.0/(1.0+exp(0.0)) - y) * x3 AS DECIMAL(28,14))) AS DOUBLE) AS g3
        |  FROM f),
        |w1 AS (SELECT 0.0 - 4.0*g0/n AS b, 0.0 - 4.0*g1/n AS wa,
        |              0.0 - 4.0*g2/n AS wb, 0.0 - 4.0*g3/n AS wc
        |       FROM g1, c),
        |g2 AS (SELECT
        |    CAST(SUM(CAST(1.0/(1.0+exp(-(b + wa*x1 + wb*x2 + wc*x3))) - y AS DECIMAL(28,14))) AS DOUBLE) AS g0,
        |    CAST(SUM(CAST((1.0/(1.0+exp(-(b + wa*x1 + wb*x2 + wc*x3))) - y) * x1 AS DECIMAL(28,14))) AS DOUBLE) AS g1,
        |    CAST(SUM(CAST((1.0/(1.0+exp(-(b + wa*x1 + wb*x2 + wc*x3))) - y) * x2 AS DECIMAL(28,14))) AS DOUBLE) AS g2,
        |    CAST(SUM(CAST((1.0/(1.0+exp(-(b + wa*x1 + wb*x2 + wc*x3))) - y) * x3 AS DECIMAL(28,14))) AS DOUBLE) AS g3
        |  FROM f, w1),
        |w2 AS (SELECT b - 4.0*g0/n AS b, wa - 4.0*g1/n AS wa,
        |              wb - 4.0*g2/n AS wb, wc - 4.0*g3/n AS wc
        |       FROM g2, w1, c),
        |g3 AS (SELECT
        |    CAST(SUM(CAST(1.0/(1.0+exp(-(b + wa*x1 + wb*x2 + wc*x3))) - y AS DECIMAL(28,14))) AS DOUBLE) AS g0,
        |    CAST(SUM(CAST((1.0/(1.0+exp(-(b + wa*x1 + wb*x2 + wc*x3))) - y) * x1 AS DECIMAL(28,14))) AS DOUBLE) AS g1,
        |    CAST(SUM(CAST((1.0/(1.0+exp(-(b + wa*x1 + wb*x2 + wc*x3))) - y) * x2 AS DECIMAL(28,14))) AS DOUBLE) AS g2,
        |    CAST(SUM(CAST((1.0/(1.0+exp(-(b + wa*x1 + wb*x2 + wc*x3))) - y) * x3 AS DECIMAL(28,14))) AS DOUBLE) AS g3
        |  FROM f, w2),
        |w3 AS (SELECT b - 4.0*g0/n AS b, wa - 4.0*g1/n AS wa,
        |              wb - 4.0*g2/n AS wb, wc - 4.0*g3/n AS wc
        |       FROM g3, w2, c)
        |SELECT doc_id,
        |  ROUND(1.0/(1.0+exp(-(b + wa*x1 + wb*x2 + wc*x3))), 4) AS quality,
        |  CAST(y AS BIGINT) AS label
        |FROM f, w3 ORDER BY doc_id""".stripMargin,

    "q155_branch_lifecycle" ->
      """WITH base AS (
        |  SELECT * FROM documents WHERE doc_id % 4 <> 0),
        |forked AS (
        |  SELECT * FROM documents),
        |de_clean AS (
        |  SELECT * FROM documents
        |  WHERE lang = 'de' AND n_chars BETWEEN 100 AND 400),
        |head AS (
        |  SELECT * FROM forked WHERE lang <> 'de'
        |  UNION ALL SELECT * FROM de_clean)
        |SELECT leg, lang, n_docs, n_chars FROM (
        |  SELECT 'after' AS leg, lang, COUNT(*) AS n_docs,
        |    CAST(SUM(n_chars) AS BIGINT) AS n_chars
        |  FROM head GROUP BY lang
        |  UNION ALL
        |  SELECT 'branch' AS leg, lang, COUNT(*) AS n_docs,
        |    CAST(SUM(n_chars) AS BIGINT) AS n_chars
        |  FROM head GROUP BY lang
        |  UNION ALL
        |  SELECT 'before' AS leg, lang, COUNT(*) AS n_docs,
        |    CAST(SUM(n_chars) AS BIGINT) AS n_chars
        |  FROM base GROUP BY lang)
        |ORDER BY leg, lang""".stripMargin,

    "q149_domain_cap" ->
      """SELECT doc_id, source, cap_rank FROM (
        |  SELECT doc_id, source,
        |    CAST(row_number() OVER (PARTITION BY source
        |      ORDER BY length(text) DESC, doc_id) AS BIGINT) AS cap_rank
        |  FROM documents)
        |WHERE cap_rank <= 10 ORDER BY doc_id""".stripMargin,
    "q35_curation" ->
      """WITH w AS (
        |  SELECT doc_id, lang, text,
        |    list_filter(string_split(text, ' '), t -> t != '') AS w
        |  FROM documents),
        |d AS (
        |  SELECT doc_id, lang,
        |    CAST(len(w) AS BIGINT) AS n_tokens,
        |    CAST(len(list_filter(w, t -> list_contains(
        |      ['the','a','of','and','to','in','is','it'], t))) AS DOUBLE)
        |      / len(w) AS stop_ratio,
        |    length(text) BETWEEN 100 AND 450 AS len_ok,
        |    list_distinct(list_transform(range(1, len(w) - 1),
        |      i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS sh
        |  FROM w),
        |pairs AS (
        |  SELECT b.doc_id AS drop_id
        |  FROM d a JOIN d b ON a.doc_id < b.doc_id
        |  WHERE CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
        |        / (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))) >= 0.5),
        |kept AS (
        |  SELECT * FROM d
        |  WHERE doc_id NOT IN (SELECT drop_id FROM pairs)
        |    AND len_ok AND stop_ratio >= 0.05)
        |SELECT lang, COUNT(*) AS n_docs, CAST(SUM(n_tokens) AS BIGINT) AS n_tokens,
        |  MIN(doc_id) AS first_doc
        |FROM kept GROUP BY lang ORDER BY lang""".stripMargin,
    "q37_crossmodal_rank" ->
      """WITH ref AS (
        |  SELECT embedding AS re FROM embeddings WHERE vec_id = 0),
        |s AS (
        |  SELECT CAST(e.label AS BIGINT) AS label, e.vec_id, d.lang, d.n_chars,
        |    list_cosine_similarity(e.embedding, (SELECT re FROM ref)) AS sim
        |  FROM embeddings e JOIN documents d ON d.doc_id = e.vec_id
        |  WHERE e.vec_id <> 0 AND d.n_chars >= 100),
        |r AS (
        |  SELECT label, vec_id, lang, n_chars,
        |    CAST(row_number() OVER (PARTITION BY label ORDER BY sim DESC, vec_id) AS BIGINT) AS rnk
        |  FROM s)
        |SELECT label, rnk, vec_id AS doc_id, lang, n_chars
        |FROM r WHERE rnk <= 3 ORDER BY label, rnk""".stripMargin,
  )
}
