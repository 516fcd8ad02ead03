package graft.sources

import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike

import graft.SparkSpec

/** Storage-partitioned joins (X96): under Spark's v2 bucketing, scans
  * of identity-partitioned graft tables report KeyGroupedPartitioning
  * with one task group per partition dir — a join of two tables
  * co-partitioned on the join key plans with NO shuffle on either
  * side. Results pinned identical to the shuffled plan. */
class SpjSpec extends SparkSpec {
  import spark.implicits._

  private lazy val cat: String = {
    val wh = tmpDir("spj_wh")
    spark.conf.set("spark.sql.catalog.spj", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.spj.warehouse", wh)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS spj.lake")
    "spj"
  }

  private def collectShuffles(plan: SparkPlan): Seq[SparkPlan] = {
    def unwrap(p: SparkPlan): Seq[SparkPlan] = p match {
      case a: AdaptiveSparkPlanExec => unwrap(a.executedPlan)
      case q: QueryStageExec => unwrap(q.plan)
      case other => other +: other.children.flatMap(unwrap)
    }
    unwrap(plan).filter(_.isInstanceOf[ShuffleExchangeLike])
  }

  test("co-partitioned graft tables join with zero shuffles under v2 bucketing") {
    spark.sql(s"CREATE TABLE $cat.lake.fa (k BIGINT, v BIGINT, p BIGINT) " +
      "PARTITIONED BY (p)")
    spark.sql(s"CREATE TABLE $cat.lake.fb (k BIGINT, w BIGINT, p BIGINT) " +
      "PARTITIONED BY (p)")
    spark.sql(s"INSERT INTO $cat.lake.fa " +
      "SELECT id, id * 2, CAST(id % 4 AS BIGINT) FROM range(400)")
    spark.sql(s"INSERT INTO $cat.lake.fb " +
      "SELECT id, id * 3, CAST(id % 4 AS BIGINT) FROM range(400)")
    val q = s"SELECT /*+ MERGE(a) */ a.p, count(*) AS n, sum(a.v + b.w) AS s " +
      s"FROM $cat.lake.fa a JOIN $cat.lake.fb b ON a.p = b.p AND a.k = b.k " +
      "GROUP BY a.p"
    // control: without the opt-in, the join shuffles both sides
    val base = spark.sql(q)
    val baseRows = base.as[(Long, Long, Long)].collect().toSet
    base.collect() // finalize AQE
    assert(collectShuffles(base.queryExecution.executedPlan).nonEmpty)

    spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
    // join keys (p, k) are a SUPERSET of the partition keys (p): same-p
    // rows are co-located, so clustering by p satisfies the join — but
    // Spark's co-partition check demands exact key coverage unless told
    // otherwise (the standard SPJ setup, same as Iceberg's docs)
    spark.conf.set("spark.sql.requireAllClusterKeysForCoPartition", "false")
    try {
      val spj = spark.sql(q)
      val rows = spj.as[(Long, Long, Long)].collect().toSet
      assert(rows == baseRows, "SPJ changed the answer")
      spj.collect()
      val shuffles = collectShuffles(spj.queryExecution.executedPlan)
      assert(shuffles.isEmpty,
        s"expected a shuffle-free storage-partitioned join, found:\n" +
          shuffles.mkString("\n") + "\n" +
          spj.queryExecution.executedPlan.toString)
    } finally {
      spark.conf.unset("spark.sql.sources.v2.bucketing.enabled")
      spark.conf.unset("spark.sql.requireAllClusterKeysForCoPartition")
    }
  }

  test("co-BUCKETED tables (hidden bucket transform) join with zero shuffles") {
    // the canonical 100 TB shape: both sides bucket(8, k) — the scan
    // reports the bucket transform, resolved through the catalog's
    // FunctionCatalog (graft.bucket == the write-path murmur3 router)
    spark.sql(s"CREATE TABLE $cat.lake.ba (k BIGINT, v BIGINT) " +
      "PARTITIONED BY (bucket(8, k))")
    spark.sql(s"CREATE TABLE $cat.lake.bb (k BIGINT, w BIGINT) " +
      "PARTITIONED BY (bucket(8, k))")
    spark.sql(s"INSERT INTO $cat.lake.ba SELECT id, id * 2 FROM range(400)")
    spark.sql(s"INSERT INTO $cat.lake.bb SELECT id, id * 3 FROM range(400)")
    val q = s"SELECT /*+ MERGE(a) */ count(*) AS n, sum(a.v + b.w) AS s " +
      s"FROM $cat.lake.ba a JOIN $cat.lake.bb b ON a.k = b.k"
    val base = spark.sql(q)
    val expect = base.as[(Long, Long)].head()
    base.collect()
    assert(collectShuffles(base.queryExecution.executedPlan).nonEmpty)
    spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
    try {
      val spj = spark.sql(q)
      assert(spj.as[(Long, Long)].head() == expect, "bucket SPJ changed the answer")
      spj.collect()
      val shuffles = collectShuffles(spj.queryExecution.executedPlan)
        .filterNot(_.toString.contains("SinglePartition")) // the 1-row final agg funnel
      assert(shuffles.isEmpty,
        s"expected a shuffle-free bucketed join, found:\n" +
          shuffles.mkString("\n") + "\n" +
          spj.queryExecution.executedPlan.toString)
    } finally spark.conf.unset("spark.sql.sources.v2.bucketing.enabled")
  }

  test("graft.bucket catalog function is bit-equal to the write-path router") {
    import org.apache.spark.sql.catalyst.InternalRow
    import org.apache.spark.sql.types.{IntegerType, LongType, StructType}
    val f = GraftBucketFunction.bind(
      new StructType().add("n", IntegerType).add("c", LongType))
      .asInstanceOf[org.apache.spark.sql.connector.catalog.functions.ScalarFunction[Integer]]
    val router = graft.table.PartitionTransform.Bucket(8, "k", LongType)
    (-50L to 500L).foreach { v =>
      assert(f.produceResult(InternalRow(8, v)).toString == router.eval(v),
        s"divergence at $v")
    }
    assert(f.produceResult(InternalRow(8, null)) == null)
  }

  test("SPJ disarms safely off the supported surface (transforms, strings, no opt-in)") {
    spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
    try {
      // hidden-partitioned table: falls back to the unkeyed plan, reads exact
      spark.sql(s"CREATE TABLE $cat.lake.ht (k BIGINT, ts TIMESTAMP) " +
        "PARTITIONED BY (days(ts))")
      spark.sql(s"INSERT INTO $cat.lake.ht VALUES " +
        "(1, TIMESTAMP '2024-03-25 08:00:00'), " +
        "(2, TIMESTAMP '2024-03-26 09:00:00')")
      assert(spark.sql(s"SELECT k FROM $cat.lake.ht ORDER BY k")
        .as[Long].collect().toSeq == Seq(1L, 2L))
      // string-partitioned: same fallback, exact
      spark.sql(s"CREATE TABLE $cat.lake.st (k BIGINT, seg STRING) " +
        "PARTITIONED BY (seg)")
      spark.sql(s"INSERT INTO $cat.lake.st VALUES (1, 'a b'), (2, 'c=d')")
      assert(spark.sql(s"SELECT k, seg FROM $cat.lake.st ORDER BY k")
        .as[(Long, String)].collect().toSeq ==
        Seq((1L, "a b"), (2L, "c=d")))
    } finally spark.conf.unset("spark.sql.sources.v2.bucketing.enabled")
  }
}
