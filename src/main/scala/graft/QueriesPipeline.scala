package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** SQL-expressible analogues of the reference's pipeline operators
  * (SURVEY.md §2 S1-W8) exercised over the driver's synthetic tables.
  * The full ingest pipeline itself (file sensor, watermark, commit log)
  * lives in graft.ingest/graft.table and is covered by ScalaTest. */
object QueriesPipeline {
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map()
  def oracleSql: Map[String, String] = Map()
}
