package graft

/** The scale-adaptive input fan-out (guide §2.5): a single-file table
  * below cores×maxPartitionBytes repartitions to session parallelism
  * (one small file is one row group — one scan task otherwise), a
  * sub-floor lookup table does not, and values are untouched. */
class TablesFanOutSpec extends SparkSpec {

  test("small single-file table fans out to session parallelism; tiny lookup does not") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val dir = tmpDir("fanout_spec_")
    // one comfortably-over-the-floor single parquet file (~1 MB raw)
    spark.range(40000)
      .select($"id", concat(lit("x" * 200), $"id").as("pad"))
      .coalesce(1).write.parquet(s"$dir/fat.parquet")
    val fat = Tables.wide(spark, dir, "fat")
    assert(fat.rdd.getNumPartitions == spark.sparkContext.defaultParallelism)
    // values identical to a raw read — fan-out is a plan boundary only
    val raw = spark.read.parquet(s"$dir/fat.parquet")
    assert(fat.orderBy("id").collect().toSeq ==
      raw.orderBy("id").collect().toSeq)
    // the PLAIN reader never fans out (frames that flow into appends
    // must not inherit a 32-file staging layout)
    assert(Tables.apply(spark, dir, "fat").queryExecution.executedPlan
      .toString.linesIterator.count(_.contains("Exchange")) == 0)
    // a lookup-sized table gains no exchange even through wide()
    assert(Tables.wide(spark, "/root/testdata/sf0.001", "nation")
      .queryExecution.executedPlan.toString
      .linesIterator.count(_.contains("Exchange")) == 0)
  }
}
