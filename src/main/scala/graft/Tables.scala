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

  /** Below this, a table is broadcast-lookup-sized and fan-out would
    * only add a pointless exchange in front of trivial scans. */
  private val FanOutFloorBytes = 256L << 10

  /** Scale-adaptive input fan-out for COMPUTE-ONLY consumers (guide
    * §2.5 — "input skew: one huge unsplittable file … repartition
    * immediately after the read"). These tables are ONE parquet file
    * each, i.e. one row group below ~1 GB: the scan is a single task
    * no matter the split config, and whole-stage codegen fuses all
    * downstream per-row compute (tokenize/shingle/explode/hash) into
    * that stage — measured: q22's shingle self-join ran as ONE task on
    * 32 cores. Repartition to the session's parallelism exactly when
    * the file cannot naturally feed it; at real scale
    * (bytes >= cores × maxPartitionBytes) this is a no-op, so no
    * shuffle is ever added to a large scan. Filters/pruning push
    * through Repartition, so PushedFilters/ReadSchema are unchanged.
    *
    * Deliberately NOT applied by [[apply]]: a frame that flows into an
    * IncrementalTable append inherits the fan-out as 32 staged files
    * PER COMMIT, and the whole maintenance chain (footer harvest,
    * promote renames, readCommit scans, copy-on-write probes) pays
    * per-file costs — a global fan-out measured +1–5 s on every
    * commit-class bench row. `wide` is therefore an explicit opt-in at
    * the call sites whose frames are only ever scanned. */
  private def fanOut(spark: SparkSession, bytes: Long, df: DataFrame): DataFrame = {
    val cores = spark.sparkContext.defaultParallelism
    val maxSplit = spark.sessionState.conf.filesMaxPartitionBytes
    if (bytes >= FanOutFloorBytes && bytes < cores.toLong * maxSplit)
      df.repartition(cores)
    else df
  }

  /** Total bytes of a table path — a single file by the driver's
    * layout, but a part-file directory (e.g. in specs) sums. */
  private def tableBytes(path: String): Long = {
    val f = new java.io.File(path)
    if (f.isDirectory)
      Option(f.listFiles()).getOrElse(Array.empty)
        .filter(_.getName.endsWith(".parquet")).map(_.length).sum
    else f.length
  }

  def wide(spark: SparkSession, dir: String, name: String): DataFrame =
    fanOut(spark, tableBytes(s"$dir/$name.parquet"),
      apply(spark, dir, name))

  def documentsWide(spark: SparkSession, dir: String): DataFrame =
    wide(spark, dir, "documents")
  def embeddingsWide(spark: SparkSession, dir: String): DataFrame =
    wide(spark, dir, "embeddings")
  def lineitemWide(spark: SparkSession, dir: String): DataFrame =
    wide(spark, dir, "lineitem")
  /** [[events]] (footer-adaptive ts) with the compute-only fan-out. */
  def eventsWide(spark: SparkSession, dir: String): DataFrame =
    fanOut(spark, tableBytes(s"$dir/events.parquet"), events(spark, dir))

  def lineitem(spark: SparkSession, dir: String): DataFrame   = apply(spark, dir, "lineitem")
  def orders(spark: SparkSession, dir: String): DataFrame     = apply(spark, dir, "orders")
  def customer(spark: SparkSession, dir: String): DataFrame   = apply(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame   = apply(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame       = apply(spark, dir, "part")
  def nation(spark: SparkSession, dir: String): DataFrame     = apply(spark, dir, "nation")
  def region(spark: SparkSession, dir: String): DataFrame     = apply(spark, dir, "region")
  /** `events.ts` has changed parquet rendering across driver testdata
    * generations — TIMESTAMP(NANOS) originally, TIMESTAMP(MICROS,
    * isAdjustedToUTC=false) now — so the reader adapts to whatever the
    * footer says instead of assuming one:
    *
    *  - NANOS: Spark 4 refuses to read it as a timestamp; read nanos as
    *    long (legacy conf) and convert — lossy below 1µs, irrelevant for
    *    bucketing. The conf set/resolve/restore is serialized under a
    *    process-wide lock: a bare set/restore raced under parallel test
    *    suites (reader B resolving after reader A's restore saw a
    *    timestamp and failed `ts div 1000` analysis), and schema
    *    resolution is only a footer read, so the lock costs nothing.
    *  - MICROS with isAdjustedToUTC=false arrives as TIMESTAMP_NTZ; the
    *    driver writes UTC wall-clock, and every harness (Verify, Bench,
    *    SparkSpec) pins the session to UTC, so the NTZ→LTZ cast
    *    preserves the instant. The cast matters because downstream
    *    consumers (epoch casts, streaming watermarks, window()) want a
    *    real TIMESTAMP.
    *  - plain TIMESTAMP passes through untouched. */
  private val nanosLock = new Object

  def events(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
    import org.apache.spark.sql.types.{LongType, TimestampNTZType}
    val key = "spark.sql.legacy.parquet.nanosAsLong"
    val df = nanosLock.synchronized {
      val old = try spark.conf.get(key) catch { case _: Throwable => "false" }
      spark.conf.set(key, "true")
      try apply(spark, dir, "events") // eager schema resolution under the lock
      finally spark.conf.set(key, old)
    }
    df.schema("ts").dataType match {
      case LongType => // nanos read as long under the legacy conf
        df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType => // micros NTZ: UTC wall-clock by contract
        df.withColumn("ts", col("ts").cast("timestamp"))
      case _ => df
    }
  }
  def documents(spark: SparkSession, dir: String): DataFrame  = apply(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "embeddings")
}
