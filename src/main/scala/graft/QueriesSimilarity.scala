package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Similarity search over the `embeddings` table: brute-force cosine
  * top-k baseline + LSH/IVF-bucketed scale path. */
object QueriesSimilarity {
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map()
  def oracleSql: Map[String, String] = Map()
}
