package graft.table

import org.apache.spark.sql.functions.col

import graft.SparkSpec

/** Float/double columns in the data-skipping index (X75): exact footer
  * [min,max] widened to double, with NaN handled by OMISSION —
  * parquet-mr drops double stats entirely when any NaN was written
  * (probed in-round: hasNonNullValue=false), so a NaN-bearing file has
  * no entry and is always kept. Spark orders NaN ABOVE every value, so
  * that omission is exactly what soundness requires. */
class DoubleSkippingSpec extends SparkSpec {
  import spark.implicits._

  test("clustered double column prunes files; results stay exact") {
    val t = IncrementalTable(spark, tmpDir("dskip") + "/t1")
    Seq((1.0, 100.0), (101.0, 200.0), (201.0, 300.0)).foreach { case (lo, hi) =>
      t.append(spark.range(lo.toLong, hi.toLong + 1).toDF("k")
        .select(col("k").cast("double").as("d"), col("k"))
        .repartition(1), Nil, statsColumns = Seq("d"))
    }
    assert(t.liveFiles().size == 3)
    // range predicate inside one file's span
    assert(t.liveFilesWhere($"d" >= 210.5 && $"d" < 250.0).size == 1)
    assert(t.readWhere($"d" >= 210.5 && $"d" < 250.0).count() == 39)
    // strict upper bound at a file boundary: d < 101.0 excludes file 2
    assert(t.liveFilesWhere($"d" < 101.0).size == 1)
    // inclusive at the boundary keeps both
    assert(t.liveFilesWhere($"d" <= 101.0).size == 2)
    // equality
    assert(t.liveFilesWhere($"d" === 150.0).size == 1)
    assert(t.readWhere($"d" === 150.0).count() == 1)
  }

  test("float columns prune through the analyzer's float->double cast") {
    val t = IncrementalTable(spark, tmpDir("dskip") + "/t2")
    Seq(0L -> 100L, 100L -> 200L).foreach { case (lo, hi) =>
      t.append(spark.range(lo, hi).toDF("k")
        .select(col("k").cast("float").as("f")).repartition(1),
        Nil, statsColumns = Seq("f"))
    }
    assert(t.liveFilesWhere($"f" >= 150.0).size == 1)
    assert(t.readWhere($"f" >= 150.0).count() == 50)
  }

  test("NaN rows keep their file unpruned (NaN orders above everything)") {
    val t = IncrementalTable(spark, tmpDir("dskip") + "/t3")
    // file A: small values PLUS a NaN row — parquet omits its stats
    t.append((Seq(1.0, 2.0, Double.NaN)).toDF("d").repartition(1),
      Nil, statsColumns = Seq("d"))
    // file B: plain [100, 200]
    t.append(Seq(100.0, 200.0).toDF("d").repartition(1),
      Nil, statsColumns = Seq("d"))
    // d > 1000: NaN > 1000 is TRUE in Spark — file A must survive the
    // prune and deliver its NaN row; file B prunes
    val out = t.readWhere($"d" > 1000.0)
    assert(out.count() == 1)
    assert(out.as[Double].head().isNaN)
    assert(t.liveFilesWhere($"d" > 1000.0).size == 1)
    // an all-NaN file likewise stays
    t.append(Seq(Double.NaN).toDF("d").repartition(1),
      Nil, statsColumns = Seq("d"))
    assert(t.readWhere($"d" > 1000.0).count() == 2)
  }

  test("NaN literals and cross-domain bounds extract nothing") {
    val t = IncrementalTable(spark, tmpDir("dskip") + "/t4")
    t.append(Seq((1.0, 5L)).toDF("d", "k").repartition(1), Nil,
      statsColumns = Seq("d", "k"))
    t.append(Seq((100.0, 500L)).toDF("d", "k").repartition(1), Nil,
      statsColumns = Seq("d", "k"))
    // = NaN must not prune on the [1,100] bounds (no file matches, but
    // the PRUNE itself must not fire — both files open)
    assert(t.liveFilesWhere($"d" === Double.NaN).size == 2)
    // a long column compared to a fractional literal goes through a
    // lossy cast — never extracted, both files kept
    assert(t.liveFilesWhere($"k" >= 1.5).size == 2)
    assert(t.readWhere($"k" >= 1.5).count() == 2)
  }

  test("metadata MIN/MAX declines on double entries; IS NULL index still works") {
    val t = IncrementalTable(spark, tmpDir("dskip") + "/t5")
    t.append(Seq(Some(1.5), None, Some(3.5)).toDF("d").repartition(1),
      Nil, statsColumns = Seq("d"))
    assert(t.liveMinMax("d").isEmpty) // double bounds are not Long answers
    assert(t.liveFilesWhere($"d".isNull).size == 1)
    t.append(Seq(Some(9.0)).toDF("d").repartition(1), Nil,
      statsColumns = Seq("d"))
    // second file has zero nulls: IS NULL prunes it
    assert(t.liveFilesWhere($"d".isNull).size == 1)
  }

  test("double bounds survive the columnar checkpoint fold") {
    val t = new IncrementalTable(spark, tmpDir("dskip") + "/t6",
      checkpointEvery = 2, parquetThreshold = 0)
    t.append(Seq(1.0, 2.0).toDF("d").repartition(1), Nil, statsColumns = Seq("d"))
    t.append(Seq(100.0, 200.0).toDF("d").repartition(1), Nil, statsColumns = Seq("d"))
    t.append(Seq(1000.0).toDF("d").repartition(1), Nil, statsColumns = Seq("d"))
    t.append(Seq(2000.0).toDF("d").repartition(1), Nil, statsColumns = Seq("d"))
    // v2 and v4 are checkpoints; pruning now runs as a Spark job over
    // the checkpoint rows — double bounds must have folded through
    assert(t.commits().head.action == "checkpoint")
    assert(t.liveFilesWhere($"d" >= 150.0 && $"d" <= 1500.0).size == 2)
    assert(t.readWhere($"d" >= 150.0 && $"d" <= 1500.0)
      .as[Double].collect().sorted.toSeq == Seq(200.0, 1000.0))
  }
}
