package graft.streaming

import java.nio.file.Files

import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll

import graft.SparkSpec
import graft.table.IncrementalTable

/** Property: for ANY interleaving of left/right arrival batches (with
  * heavy key collisions, so most drains both match and miss), draining
  * [[JoinStream]] step-by-step converges to exactly the full join of
  * everything that arrived — inner mode to the inner join, left-outer
  * mode to the left outer join with a correct matched flag (every
  * retraction fired, none over-fired).
  *
  * Spark jobs per case are expensive; the case count is capped — the
  * value is the random interleavings, not volume (PipelineProps
  * contract). */
object JoinStreamProps extends Properties("joinstream") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(4).withWorkers(1)

  private lazy val spark = SparkSpec.spark

  // a script of arrival events over a tiny key space (1..4): each event
  // appends a batch to one side; a drain runs after every event
  private case class Ev(left: Boolean, rows: List[(Long, Long)]) // (rowId, key)

  private val scripts: Gen[List[Ev]] = for {
    n <- Gen.choose(1, 5)
    evs <- Gen.listOfN(n, for {
      left <- Gen.oneOf(true, false)
      k <- Gen.choose(1, 3)
      keys <- Gen.listOfN(k, Gen.choose(1L, 4L))
    } yield Ev(left, keys.zipWithIndex.map { case (key, i) => (i.toLong, key) }))
  } yield evs.zipWithIndex.map { case (e, i) =>
    // globally unique row ids per side, deterministic
    e.copy(rows = e.rows.map { case (rid, key) => (i * 10L + rid, key) })
  }

  private def run(script: List[Ev], mode: String): Boolean = {
    val outer = mode == "left_outer"
    val full = mode == "full_outer"
    val rout = mode == "right_outer"
    val s = spark
    import s.implicits._
    val dir = Files.createTempDirectory("joinprops").toString
    val l = IncrementalTable(spark, dir + "/l/v1")
    val r = IncrementalTable(spark, dir + "/r/v1")
    val d = IncrementalTable(spark, dir + "/d/v1")
    val stream =
      if (rout) JoinStream.rightOuter(l, r, d, Seq("k"), name = "p")
      else new JoinStream(l, r, d, Seq("k"), name = "p", joinType = mode)
    script.foreach { ev =>
      val df =
        if (ev.left) ev.rows.toDF("lid", "k").select($"lid", $"k")
        else ev.rows.toDF("rid", "k").select($"rid", $"k")
      if (ev.left) l.append(df, Nil) else r.append(df, Nil)
      stream.drain()
    }
    stream.drain() // converged: an extra drain applies nothing

    val lefts = script.filter(_.left).flatMap(_.rows).toSet
    val rights = script.filterNot(_.left).flatMap(_.rows).toSet
    if (rout) {
      // the factory swaps the physical sides, so the view buffers until
      // the LEFT table (whose schema null-extension needs) has data
      if (!l.exists)
        return !d.exists || d.read().columns.isEmpty || d.read().count() == 0
      val want: Set[(Option[Long], Long, Long, Boolean)] = rights.flatMap {
        case (rid, k) =>
          val ms = lefts.filter(_._2 == k)
          if (ms.isEmpty) Set((Option.empty[Long], k, rid, false))
          else ms.map(m => (Option(m._1), k, rid, true))
      }
      val got =
        if (d.exists && d.read().columns.nonEmpty)
          d.read().select($"lid", $"k", $"rid", $"matched")
            .as[(Option[Long], Long, Long, Boolean)].collect().toSet
        else Set.empty[(Option[Long], Long, Long, Boolean)]
      return got == want
    }
    if (!outer && !full) {
      val want: Set[(Long, Long, Long)] = for {
        (lid, k) <- lefts; (rid, k2) <- rights if k == k2
      } yield (lid, k, rid)
      val got =
        if (d.exists && d.read().columns.nonEmpty)
          d.read().select($"lid", $"k", $"rid").as[(Long, Long, Long)]
            .collect().toSet
        else Set.empty[(Long, Long, Long)]
      got == want
    } else if (!r.exists || (full && !l.exists)) {
      // documented contract: modes needing the other side's schema
      // buffer rows upstream until that table exists
      !d.exists || d.read().columns.isEmpty || d.read().count() == 0
    } else if (outer) {
      val want: Set[(Long, Long, Option[Long], Boolean)] = lefts.flatMap {
        case (lid, k) =>
          val ms = rights.filter(_._2 == k)
          if (ms.isEmpty) Set((lid, k, Option.empty[Long], false))
          else ms.map(m => (lid, k, Option(m._1), true))
      }
      val got =
        if (d.exists && d.read().columns.nonEmpty)
          d.read().select($"lid", $"k", $"rid", $"matched")
            .as[(Long, Long, Option[Long], Boolean)].collect().toSet
        else Set.empty[(Long, Long, Option[Long], Boolean)]
      got == want
    } else {
      val matchedL: Set[(Option[Long], Long, Option[Long], String)] =
        lefts.flatMap { case (lid, k) =>
          val ms = rights.filter(_._2 == k)
          if (ms.isEmpty) Set((Option(lid), k, Option.empty[Long], "left"))
          else ms.map(m => (Option(lid), k, Option(m._1), "both"))
        }
      val rOnly: Set[(Option[Long], Long, Option[Long], String)] =
        rights.filter { case (_, k) => !lefts.exists(_._2 == k) }
          .map { case (rid, k) => (Option.empty[Long], k, Option(rid), "right") }
      val want = matchedL ++ rOnly
      val got =
        if (d.exists && d.read().columns.nonEmpty)
          d.read().select($"lid", $"k", $"rid", $"side")
            .as[(Option[Long], Long, Option[Long], String)].collect().toSet
        else Set.empty[(Option[Long], Long, Option[Long], String)]
      got == want
    }
  }

  property("inner: any interleaving converges to the full inner join") =
    forAll(scripts)(run(_, "inner"))

  property("left_outer: any interleaving converges to the outer join with exact retraction") =
    forAll(scripts)(run(_, "left_outer"))

  property("full_outer: any interleaving converges to the full outer join, both retractions exact") =
    forAll(scripts)(run(_, "full_outer"))

  property("right_outer (factory swap): any interleaving converges to the right outer join") =
    forAll(scripts)(run(_, "right_outer"))
}
