package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Deduplication operators (exact, MinHash+LSH, SimHash, n-gram Jaccard,
  * embedding near-dup) over `documents`/`embeddings`. */
object QueriesDedup {
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map()
  def oracleSql: Map[String, String] = Map()
}
