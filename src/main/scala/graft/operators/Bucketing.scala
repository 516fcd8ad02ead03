package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

/** Bucketed-table layout for shuffle-free big-big joins.
  *
  * Spark elides the sort-merge join's exchanges when the two scans
  * already report compatible hash distribution — which bucketed tables
  * with equal bucket counts provide. The per-bucket SortExec remains
  * (since SPARK-24528 the scan no longer advertises bucket-file order
  * without a legacy flag), but over `sortBy`-written buckets it is a
  * single no-movement pass over already-sorted runs; the shuffle of
  * ~all bytes is the term that matters at scale, and it is gone.
  * `repartition(buckets, key)` uses the same Murmur3-pmod routing as
  * the bucket-id assignment, so each write task holds exactly one
  * bucket's rows → one file per bucket (keeps scan parallelism aligned
  * with buckets and file-level min/max skipping tight).
  *
  * This is the layout HALF of the co-located-join story; the join itself
  * is ordinary `Dataset.join` — Catalyst sees the layout via the catalog
  * and drops the exchanges (asserted by BucketedJoinSpec). At cluster
  * scale the one-time bucketed write amortizes across every downstream
  * join/aggregation keyed on the bucket column, the way a partitioned
  * fact table amortizes scans — the 100 TB recurring-join answer when
  * broadcast is impossible and AQE would otherwise shuffle ~all bytes
  * every run.
  *
  * The reference has no multi-table joins at all (its DAG is linear, see
  * SURVEY.md §2 "absent categories"); this operator exists for engine
  * completeness at scale.
  */
object Bucketing {

  // previous generation's (table, dir) — dropped at the next call so
  // repeated invocations (bench warmup + iterations, test reruns) hold
  // at most one spare generation in the catalog and on disk instead of
  // accumulating one per call
  private val lastGen =
    new java.util.concurrent.atomic.AtomicReference[Seq[(String, String)]](Nil)

  /** Write both sides bucketed+sorted on their join keys into a fresh
    * temp warehouse path and return the catalog-backed frames. Table
    * names are suffixed by a per-call nonce: repeated invocations never
    * collide in the session catalog, and each call retires the previous
    * call's tables + data. */
  def bucketedPair(spark: SparkSession,
      a: (DataFrame, String), b: (DataFrame, String),
      buckets: Int): (DataFrame, DataFrame) = {
    val base = java.nio.file.Files.createTempDirectory("graft_bucketed_").toString
    val nonce = base.replaceAll(".*_", "")
    val gen = Seq((s"b_a_$nonce", s"$base/a"), (s"b_b_$nonce", s"$base/b"))
    lastGen.getAndSet(gen).foreach { case (tbl, dir) =>
      spark.sql(s"DROP TABLE IF EXISTS $tbl")
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
    }
    (writeBucketed(spark, a._1, a._2, gen(0)._1, gen(0)._2, buckets),
      writeBucketed(spark, b._1, b._2, gen(1)._1, gen(1)._2, buckets))
  }

  private def writeBucketed(spark: SparkSession, df: DataFrame, key: String,
      table: String, path: String, buckets: Int): DataFrame = {
    df.repartition(buckets, col(key))
      .write.bucketBy(buckets, key).sortBy(key)
      .option("path", path).mode("overwrite").saveAsTable(table)
    spark.table(table)
  }
}
