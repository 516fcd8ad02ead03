package graft.table

import org.apache.spark.sql.functions.{col, lit, struct}
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

import graft.SparkSpec

/** In-struct ADD COLUMN (X73): the X3 add-column contract one nesting
  * level down — a metadata commit, old files null-fill the new leaf,
  * prune conservatism holds for it, and genuine type changes stay
  * rejected. */
class StructEvolutionSpec extends SparkSpec {
  import spark.implicits._

  test("nested add: old files read the new leaf as null, new files carry it") {
    val t = IncrementalTable(spark, tmpDir("sev") + "/t1")
    t.append(spark.range(1, 4).toDF("id")
      .withColumn("hdr", struct(lit("ok").as("status"), (col("id") * 2).as("n"))),
      Nil)
    val before = t.liveFiles().toSet
    t.alter(nestedAdditions = Seq(
      Seq("hdr") -> StructField("prio", StringType)))
    assert(t.liveFiles().toSet == before) // metadata-only
    assert(t.schemaAt().get("hdr").dataType.asInstanceOf[StructType]
      .fieldNames.toSeq == Seq("status", "n", "prio"))
    t.append(spark.range(10, 12).toDF("id")
      .withColumn("hdr", struct(lit("ok").as("status"), (col("id") * 2).as("n"),
        lit("HIGH").as("prio"))), Nil)
    val rows = t.read()
      .select($"id", $"hdr.prio".as("p")).collect()
      .map(r => r.getLong(0) -> Option(r.getString(1))).toMap
    assert(rows == Map(1L -> None, 2L -> None, 3L -> None,
      10L -> Some("HIGH"), 11L -> Some("HIGH")))
    // time travel to the pre-alter snapshot keeps the narrow struct
    assert(t.readAt(0).select($"hdr.*").columns.toSeq == Seq("status", "n"))
  }

  test("prune conservatism: a predicate on the new leaf never prunes old files") {
    val t = IncrementalTable(spark, tmpDir("sev") + "/t2")
    t.append(spark.range(1, 4).toDF("id")
      .withColumn("hdr", struct((col("id") * 100).as("seq"))).repartition(1),
      Nil, statsColumns = Seq("hdr.seq"))
    t.alter(nestedAdditions = Seq(Seq("hdr") -> StructField("extra", LongType)))
    t.append(spark.range(10, 13).toDF("id")
      .withColumn("hdr", struct((col("id") * 100).as("seq"),
        (col("id") * 7).as("extra"))).repartition(1),
      Nil, statsColumns = Seq("hdr.seq", "hdr.extra"))
    // old files have NO index entry for hdr.extra — a bound on it must
    // keep them (their rows all have extra IS NULL, which never matches
    // a value bound, so exactness is what proves conservatism composes)
    assert(t.liveFilesWhere($"hdr.extra" >= 70L).size == 2)
    assert(t.readWhere($"hdr.extra" >= 77L).select($"id").as[Long]
      .collect().sorted.toSeq == Seq(11L, 12L))
    // and IS NULL on the new leaf finds exactly the old generation
    assert(t.readWhere($"hdr.extra".isNull).select($"id").as[Long]
      .collect().sorted.toSeq == Seq(1L, 2L, 3L))
  }

  test("rejections stay narrow: non-structs, duplicate leaves, missing parents") {
    val t = IncrementalTable(spark, tmpDir("sev") + "/t3")
    t.append(spark.range(1, 3).toDF("id")
      .withColumn("hdr", struct(lit(1L).as("a")))
      .withColumn("tags", org.apache.spark.sql.functions.array(lit("x"))), Nil)
    intercept[IllegalArgumentException] {
      t.alter(nestedAdditions = Seq(Seq("id") -> StructField("x", LongType)))
    }
    intercept[IllegalArgumentException] {
      t.alter(nestedAdditions = Seq(Seq("tags") -> StructField("x", LongType)))
    }
    intercept[IllegalArgumentException] {
      t.alter(nestedAdditions = Seq(Seq("hdr") -> StructField("a", LongType)))
    }
    intercept[IllegalArgumentException] {
      t.alter(nestedAdditions = Seq(Seq("nope") -> StructField("x", LongType)))
    }
    // a write with the OLD struct shape after evolution fails loudly
    t.alter(nestedAdditions = Seq(Seq("hdr") -> StructField("b", LongType)))
    val e = intercept[IllegalArgumentException] {
      t.append(spark.range(5, 6).toDF("id")
        .withColumn("hdr", struct(lit(9L).as("a")))
        .withColumn("tags", org.apache.spark.sql.functions.array(lit("y"))), Nil)
    }
    assert(e.getMessage.contains("add-column only"), e.getMessage)
  }

  test("doubly nested add works (struct inside struct)") {
    val t = IncrementalTable(spark, tmpDir("sev") + "/t4")
    t.append(spark.range(1, 3).toDF("id")
      .withColumn("a", struct(struct(lit(1L).as("x")).as("b"))), Nil)
    t.alter(nestedAdditions = Seq(Seq("a", "b") -> StructField("y", LongType)))
    t.append(spark.range(10, 12).toDF("id")
      .withColumn("a", struct(struct(lit(1L).as("x"), lit(5L).as("y")).as("b"))),
      Nil)
    val out = t.read().select($"id", $"a.b.y").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) -1L else r.getLong(1))).toMap
    assert(out == Map(1L -> -1L, 2L -> -1L, 10L -> 5L, 11L -> 5L))
  }
}
