package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Text-analysis operators for training-data pipelines (language ID,
  * quality scoring, token counting, fingerprinting) over `documents`. */
object QueriesText {
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map()
  def oracleSql: Map[String, String] = Map()
}
