package org.apache.spark.sql.graftshim

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.classic

/** Rebind a V1 streaming `Sink.addBatch` micro-batch frame as a plain
  * batch DataFrame. The frame handed to a V1 sink wraps the running
  * `IncrementalExecution`, so any NEW analysis over it (`data.rdd`,
  * `data.write`) fails the batch-query check ("queries with streaming
  * sources must be executed with writeStream.start()"); the supported
  * technique — the one the Spark source's own V1 sinks use — is to pull
  * the physical rows through the batch's OWN QueryExecution and rewrap
  * them. Lives under `org.apache.spark.sql` because
  * `internalCreateDataFrame` is `private[sql]` (the visibility every V1
  * lakehouse sink plugs into). */
object StreamingBatchShim {
  def rebatch(data: DataFrame): DataFrame = {
    val ds = data.asInstanceOf[classic.Dataset[Row]]
    val spark = ds.sparkSession
    // copy(): the scan reuses row buffers; detached copies are required
    // before handing the RDD to a new plan
    val rdd = ds.queryExecution.toRdd.map(_.copy())
    spark.internalCreateDataFrame(rdd, ds.schema, isStreaming = false)
  }

  /** The inverse direction, for a V1 `Source.getBatch`: the engine
    * asserts the returned frame's plan is STREAMING-flagged (it splices
    * it into the incremental plan), so a batch-computed delta must be
    * rewrapped — the same `internalCreateDataFrame(_, _, isStreaming =
    * true)` every V1 source (MemoryStream included) uses. */
  def asStreamingBatch(data: DataFrame): DataFrame = {
    val ds = data.asInstanceOf[classic.Dataset[Row]]
    val spark = ds.sparkSession
    val rdd = ds.queryExecution.toRdd.map(_.copy())
    spark.internalCreateDataFrame(rdd, ds.schema, isStreaming = true)
  }
}

/** `private[sql]` bridges for [[graft.sources.GraftDmlRule]]: wrap a
  * catalyst Expression as a public Column, and materialize a resolved
  * LogicalPlan as a DataFrame — the two conversions the SQL DML
  * commands need and Spark 4 keeps `private[sql]`
  * (`classic.ExpressionUtils.column` / `classic.Dataset.ofRows`). */
object DmlShim {
  def column(e: org.apache.spark.sql.catalyst.expressions.Expression): org.apache.spark.sql.Column =
    classic.ExpressionUtils.column(e)

  def ofRows(spark: org.apache.spark.sql.SparkSession,
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
}
