package graft.streaming

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Properties, Test}

import graft.SparkSpec
import graft.table.IncrementalTable

/** Property: under ANY interleaving of appends and row-level deletes,
  * the maintained view equals the batch recompute of the remaining
  * upstream after every drain — for the pure-retraction aggregate set
  * (count/avg: dv commits subtract from state) and for the mixed set
  * (min present: dv commits downgrade to key-scoped recompute). The
  * randomized sibling of AggregateStreamSpec's scripted dv tests. */
object AggregateStreamProps extends Properties("AggregateStream") {

  // Table-op cases are expensive (~10 commits each); keep the default
  // count CI-sized, raise via GRAFT_MODEL_TESTS for offline stress.
  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(
      sys.env.get("GRAFT_MODEL_TESTS").map(_.toInt).getOrElse(4)).withWorkers(1)

  private lazy val spark = {
    val s = graft.SparkSpec.spark
    s.sparkContext.setLogLevel("WARN")
    s
  }

  private sealed trait Op
  private case class Append(rows: List[(String, String, Long)]) extends Op
  private case class DeleteByV(mod: Long) extends Op // drop rows with v % mod == 0
  private case class DeleteByK(k: String) extends Op // drop a whole key

  private val rowGen: Gen[(String, String, Long)] = for {
    d <- Gen.oneOf("d1", "d2")
    k <- Gen.oneOf("a", "b", "c")
    v <- Gen.choose(0L, 40L)
  } yield (d, k, v)

  private val opGen: Gen[Op] = Gen.frequency(
    3 -> Gen.nonEmptyListOf(rowGen).map(rs => Append(rs.take(6))),
    1 -> Gen.oneOf(2L, 3L, 5L).map(DeleteByV),
    1 -> Gen.oneOf("a", "b", "c").map(DeleteByK))

  private def run(ops: List[Op], withMinMax: Boolean): Boolean = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("aggprops").toString
    val up = IncrementalTable(spark, s"$dir/up/v1")
    val down = IncrementalTable(spark, s"$dir/view/v1")
    val aggs =
      if (withMinMax)
        Seq(IncAgg.countAll("n"), IncAgg.avgOf(col("v"), "avg_st"),
          IncAgg.minOf(col("v"), "min_v"))
      else
        Seq(IncAgg.countAll("n"), IncAgg.avgOf(col("v"), "avg_st"))
    val s = new AggregateStream(up, down, Seq("day", "k"), aggs,
      partitionBy = Seq("day"), name = "ev", replayScope = Seq("day"))

    // first op must create the upstream before a delete can run
    val normalized = ops.dropWhile(!_.isInstanceOf[Append])
    normalized.forall { op =>
      op match {
        case Append(rs) =>
          up.append(rs.toDF("day", "k", "v"), Seq("day"))
        case DeleteByV(m) if up.exists =>
          up.deleteVectorized(col("v") % m === 0)
        case DeleteByK(k) if up.exists =>
          up.deleteVectorized(col("k") === k)
        case _ => ()
      }
      s.drain()
      val want = up.read().groupBy($"day", $"k")
        .agg(count(lit(1)).as("n"),
          avg($"v").as("avg_v"),
          min($"v").as("min_v"))
        .as[(String, String, Long, Double, Long)].collect().toSet
      val gotBase = down.read().select($"day", $"k", $"n",
        IncAgg.avgValue($"avg_st").as("avg_v"),
        (if (withMinMax) $"min_v" else lit(0L)).as("min_v"))
      val got = gotBase
        .as[(String, String, Long, Double, Long)].collect().toSet
      val wantAdj =
        if (withMinMax) want
        else want.map { case (d, k, n, a, _) => (d, k, n, a, 0L) }
      val gotAdj =
        if (withMinMax) got
        else got.map { case (d, k, n, a, _) => (d, k, n, a, 0L) }
      gotAdj == wantAdj && got.size == down.read().count()
    }
  }

  property("view == batch recompute under any append/delete interleaving (retraction aggs)") =
    org.scalacheck.Prop.forAll(Gen.listOfN(5, opGen)) { ops => run(ops, withMinMax = false) }

  property("view == batch recompute under any append/delete interleaving (min forces key-scoped recompute)") =
    org.scalacheck.Prop.forAll(Gen.listOfN(5, opGen)) { ops => run(ops, withMinMax = true) }
}
