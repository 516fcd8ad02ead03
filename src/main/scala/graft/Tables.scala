package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Parquet table loader for the driver's synthetic star schema
  * (`/root/testdata/sf*`; see TESTDATA.md). One parquet file per table.
  *
  * Filters/projections applied on the returned DataFrame push down to the
  * parquet scan (Catalyst `PushedFilters`/`ReadSchema`), so callers should
  * select/filter as early as possible and let the optimizer prune.
  */
object Tables {
  def apply(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def lineitem(spark: SparkSession, dir: String): DataFrame   = apply(spark, dir, "lineitem")
  def orders(spark: SparkSession, dir: String): DataFrame     = apply(spark, dir, "orders")
  def customer(spark: SparkSession, dir: String): DataFrame   = apply(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame   = apply(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame       = apply(spark, dir, "part")
  def nation(spark: SparkSession, dir: String): DataFrame     = apply(spark, dir, "nation")
  def region(spark: SparkSession, dir: String): DataFrame     = apply(spark, dir, "region")
  /** `events.ts` is parquet TIMESTAMP(NANOS), which Spark 4 refuses to
    * read as a timestamp. Read nanos as long (legacy conf) and convert to
    * a microsecond timestamp — lossy below 1µs, irrelevant for bucketing.
    * The conf is restored right after the (eager) schema resolution, so
    * concurrent readers of other nanos tables are unaffected (ADVICE r1
    * #4: no permanent session-conf mutations inside readers); the plan
    * captures the setting at analysis time — verified safe to restore
    * before actions run. */
  def events(spark: SparkSession, dir: String): DataFrame = {
    val key = "spark.sql.legacy.parquet.nanosAsLong"
    val old = try spark.conf.get(key) catch { case _: Throwable => "false" }
    spark.conf.set(key, "true")
    val df =
      try apply(spark, dir, "events")
      finally spark.conf.set(key, old)
    df.withColumn("ts", org.apache.spark.sql.functions.timestamp_micros(
      org.apache.spark.sql.functions.expr("ts div 1000")))
  }
  def documents(spark: SparkSession, dir: String): DataFrame  = apply(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "embeddings")
}
