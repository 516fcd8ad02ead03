package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.table.IncrementalTable

/** Deletion vectors are non-append history changes: every stream
  * consumer must see an upstream dv commit as pending work and
  * converge its downstream view to the dv-applied upstream state
  * (via its rebuild path — deltas can't patch a changed history). */
class DvPropagationSpec extends SparkSpec {
  import spark.implicits._

  test("DerivedStream re-derives after an upstream vectorized delete") {
    val dir = tmpDir("dvprop")
    val up = IncrementalTable(spark, dir + "/up/v1")
    val down = IncrementalTable(spark, dir + "/down/v1")
    val s = new DerivedStream(up, down, Nil,
      df => df.withColumn("n2", col("n") * 2), name = "d")
    up.append(Seq((1L, 10L), (2L, 20L), (3L, 30L)).toDF("id", "n"), Nil)
    s.drain()
    assert(down.read().count() == 3)

    up.deleteVectorized($"id" === 2L) // no file rewritten upstream
    assert(s.drain() == 1) // the dv commit IS pending work
    assert(down.read().select($"id", $"n2").as[(Long, Long)].collect().toSet ==
      Set(1L -> 20L, 3L -> 60L))
  }

  test("DedupStream re-picks a representative its dv delete removed") {
    val dir = tmpDir("dvprop")
    val up = IncrementalTable(spark, dir + "/docs/v1")
    val down = IncrementalTable(spark, dir + "/deduped/v1")
    val s = new DedupStream(up, down,
      df => df.withColumn("fp", md5(col("text").cast("binary"))),
      keyCol = "id", name = "docs")
    up.append(Seq((1L, "same"), (2L, "same"), (3L, "other")).toDF("id", "text"), Nil)
    s.drain()
    assert(down.read().select("id").as[Long].collect().toSet == Set(1L, 3L))

    up.deleteVectorized($"id" === 1L) // the committed representative dies
    assert(s.drain() == 1)
    assert(down.read().select("id").as[Long].collect().toSet == Set(2L, 3L))
  }

  test("JoinStream rebuilds the view after a dv delete on either side") {
    val dir = tmpDir("dvprop")
    val l = IncrementalTable(spark, dir + "/l/v1")
    val r = IncrementalTable(spark, dir + "/r/v1")
    val d = IncrementalTable(spark, dir + "/d/v1")
    val s = new JoinStream(l, r, d, Seq("k"), name = "j")
    l.append(Seq((1L, 1L), (2L, 2L)).toDF("lid", "k"), Nil)
    r.append(Seq((10L, 1L), (20L, 2L)).toDF("rid", "k"), Nil)
    s.drain()
    assert(d.read().count() == 2)

    r.deleteVectorized($"rid" === 10L)
    assert(s.drain() == 1)
    assert(d.read().select($"lid", $"k", $"rid").as[(Long, Long, Long)]
      .collect().toSet == Set((2L, 2L, 20L)))
    // incremental consumption resumes after the rebuild
    l.append(Seq((3L, 2L)).toDF("lid", "k"), Nil)
    assert(s.drain() == 1)
    assert(d.read().count() == 2)
  }
}
