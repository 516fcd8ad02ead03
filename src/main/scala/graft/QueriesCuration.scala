package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.{Dedup, TextOps}

/** End-to-end corpus curation: the composite a real training-data
  * pipeline runs — near-dup removal (keep the lowest doc_id of each
  * near-dup pair) followed by a quality gate, reported per language.
  * Exercises operator COMPOSITION: the dedup pair producer, the text
  * quality metrics, and anti-join semantics all feed one result.
  *
  * Scale shape: pair generation is the banded/inverted-index path (never
  * all-pairs), the drop-set is tiny (near-dups), the anti-join
  * broadcasts it, and the stats are one hash aggregation.
  */
object QueriesCuration {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q35_curation" -> ((s, dir) => {
      import s.implicits._
      val docs = Tables.documents(s, dir)
      // b-side of every near-dup pair drops; pair clusters in this corpus
      // are cliques, so min-id survivors are exactly the non-b docs
      val dropDup = Dedup.ngramJaccardPairs(docs, $"doc_id", $"text", 3, 0.5)
        .select($"b_id".as("doc_id")).distinct()
      val toks = TextOps.tokens($"text")
      val nTok = size(toks).cast("long")
      val scored = docs
        .withColumn("n_tokens", nTok)
        .withColumn("stop_ratio", TextOps.tokensIn(toks, TextOps.stopwords) / nTok)
        .withColumn("len_ok", length($"text").between(100, 450))
      val kept = scored
        .join(broadcast(dropDup), Seq("doc_id"), "left_anti")
        .filter($"len_ok" && $"stop_ratio" >= 0.05)
      kept.groupBy($"lang")
        .agg(
          count(lit(1)).as("n_docs"),
          sum($"n_tokens").as("n_tokens"),
          min($"doc_id").as("first_doc"))
        .orderBy($"lang")
    }),
  )

  def oracleSql: Map[String, String] = Map(
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
  )
}
