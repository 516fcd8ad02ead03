package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions.{col, sum}

/** Sequence packing invariants (X57): capacity respected except for
  * single oversize docs, order-driven sequence monotonicity, shard
  * independence, determinism under input partitioning. */
class SeqPackSpec extends SparkSpec {
  import spark.implicits._

  private def toyDf(parts: Int) =
    Seq.tabulate(200)(i => (i.toLong, (i * 37 % 90 + 10).toLong))
      .toDF("id", "tok").repartition(parts)

  test("no packed sequence exceeds capacity unless it is one oversize doc") {
    val out = SeqPack.pack(toyDf(7), col("id") % 4, col("id"), col("tok"), 100L)
    val bad = out.groupBy((col("id") % 4).as("shard"), col("seq_no"))
      .agg(sum("tok").as("t"), org.apache.spark.sql.functions.count("*").as("n"))
      .filter(col("t") > 100 && col("n") > 1)
    assert(bad.count() == 0)
  }

  test("oversize doc occupies its own sequence; packing never drops or splits") {
    val df = Seq((0L, 50L), (1L, 40L), (2L, 300L), (3L, 10L), (4L, 95L))
      .toDF("id", "tok")
    val out = SeqPack.pack(df, org.apache.spark.sql.functions.lit(0), col("id"),
        col("tok"), 100L)
      .select($"id", $"seq_no").as[(Long, Long)].collect().toMap
    // 50+40=90 fits seq 0; 300 overflows -> seq 1 alone; 10 overflows
    // (fill 300) -> seq 2; 95 overflows (fill 10+95=105) -> seq 3
    assert(out == Map(0L -> 0L, 1L -> 0L, 2L -> 1L, 3L -> 2L, 4L -> 3L))
  }

  test("deterministic under any input partitioning") {
    def run(parts: Int) = SeqPack.pack(toyDf(parts), col("id") % 4, col("id"),
        col("tok"), 100L)
      .select($"id", $"seq_no").as[(Long, Long)].collect().toMap
    assert(run(1) == run(13))
  }

  test("reserved staging/output column names in the input are refused loudly (ADVICE r6)") {
    val df = Seq((0L, 50L)).toDF("id", "tok")
    Seq("_sp_shard", "_sp_ord", "_sp_tok", "seq_no").foreach { bad =>
      val e = intercept[IllegalArgumentException](
        SeqPack.pack(df.withColumn(bad, col("id")), col("id") % 4, col("id"),
          col("tok"), 100L))
      assert(e.getMessage.contains(bad))
    }
  }

  test("seq_no is monotone in the pack order within each shard") {
    val out = SeqPack.pack(toyDf(5), col("id") % 4, col("id"), col("tok"), 100L)
      .select(($"id" % 4).as("shard"), $"id", $"seq_no")
      .as[(Long, Long, Long)].collect().groupBy(_._1)
    out.values.foreach { rows =>
      val sorted = rows.sortBy(_._2).map(_._3)
      assert(sorted.zip(sorted.drop(1)).forall { case (a, b) => b == a || b == a + 1 })
      assert(sorted.head == 0L)
    }
  }
}
