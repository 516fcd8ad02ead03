package graft.table

import java.nio.file.Files

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.{col, lit}
import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll

import graft.SparkSpec
import graft.table.IncrementalTable.{WhenClause, mergeSourceCol}

/** Model-based property for the general MERGE engine
  * ([[IncrementalTable.mergeInto]]): random targets, random sources
  * (duplicate keys included whenever no matched clause consumes them),
  * and random ordered clause sets — conditional UPDATE/DELETE,
  * conditioned INSERT, NOT MATCHED BY SOURCE — must track a
  * plain-Scala model applying SQL MERGE semantics (original-state
  * evaluation, first-true-wins, per-source-row inserts) exactly, in at
  * most ONE commit. This is where clause-interaction bugs live (the
  * scripted q125 pins one composition; this pins the algebra) — the
  * review-found NMBS fan-out bug is exactly the class this suite
  * catches. Spark jobs per case are expensive; case count is capped
  * (PipelineProps contract). */
object MergeIntoProps extends Properties("mergeinto") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(
      sys.env.get("GRAFT_MODEL_TESTS").map(_.toInt).getOrElse(6)).withWorkers(1)

  private lazy val spark = SparkSpec.spark

  // condition pool: (Column over mergeInto's joined frame, Scala twin
  // over (targetV, sourceV)); matched conds may see both sides, NMBS
  // conds the target only, insert conds the source only
  private type CondSpec = (Option[Column], (Long, Long) => Boolean)
  private val matchedConds: Vector[CondSpec] = Vector(
    (None, (_, _) => true),
    (Some(col("v") % 2 === 0), (t, _) => t % 2 == 0),
    (Some(mergeSourceCol("v") > col("v")), (t, s) => s > t),
    (Some(mergeSourceCol("v") % 3 === 0), (_, s) => s % 3 == 0))
  private val nmbsConds: Vector[CondSpec] = Vector(
    (None, (_, _) => true),
    (Some(col("v") % 2 === 1), (t, _) => t % 2 == 1),
    (Some(col("k") < 40L), (_, _) => false)) // k-cond: evaluated separately
  private val insConds: Vector[CondSpec] = Vector(
    (None, (_, _) => true),
    (Some(mergeSourceCol("v") % 2 === 0), (_, s) => s % 2 == 0))

  // matched actions: update expressions with Scala twins, or delete
  private type SetSpec = (Option[Seq[(String, Column)]], (Long, Long) => Long)
  private val matchedSets: Vector[SetSpec] = Vector(
    (Some(Seq("v" -> (col("v") + mergeSourceCol("v")))), (t, s) => t + s),
    (Some(Seq("v" -> mergeSourceCol("v"))), (_, s) => s),
    (None, (_, _) => 0L)) // DELETE
  private val nmbsSets: Vector[SetSpec] = Vector(
    (Some(Seq("v" -> lit(-1L))), (_, _) => -1L),
    (None, (_, _) => 0L)) // DELETE

  private case class Scenario(
      target: List[(Long, Long)], source: List[(Long, Long)],
      matched: List[(Int, Int)], // (cond idx, set idx)
      nmbs: List[(Int, Int)], ins: List[Int])

  private val scenarios: Gen[Scenario] = for {
    nT <- Gen.choose(5, 20)
    target <- Gen.listOfN(nT, for {
      k <- Gen.choose(0L, 30L); v <- Gen.choose(0L, 50L)
    } yield (k, v)).map(_.distinctBy(_._1))
    nS <- Gen.choose(0, 12)
    source <- Gen.listOfN(nS, for {
      k <- Gen.choose(0L, 40L); v <- Gen.choose(0L, 50L)
    } yield (k, v))
    matched <- Gen.listOf(for {
      c <- Gen.choose(0, matchedConds.size - 1)
      s <- Gen.choose(0, matchedSets.size - 1)
    } yield (c, s)).map(_.take(2))
    nmbs <- Gen.listOf(for {
      c <- Gen.choose(0, nmbsConds.size - 1)
      s <- Gen.choose(0, nmbsSets.size - 1)
    } yield (c, s)).map(_.take(2))
    ins <- Gen.listOf(Gen.choose(0, insConds.size - 1)).map(_.take(1))
    if matched.nonEmpty || nmbs.nonEmpty || ins.nonEmpty
  } yield Scenario(target,
    // duplicate source keys are only legal without matched clauses
    if (matched.nonEmpty) source.distinctBy(_._1) else source,
    matched, nmbs, ins)

  private def nmbsCondEval(idx: Int, k: Long, v: Long): Boolean =
    if (idx == 2) k < 40L else nmbsConds(idx)._2(v, 0L)

  /** The SQL MERGE semantics in plain Scala, against the ORIGINAL
    * target state. Returns the expected multiset of (k, v). */
  private def model(sc: Scenario): Seq[(Long, Long)] = {
    val srcByKey = sc.source.groupBy(_._1)
    val fromTarget = sc.target.flatMap { case (k, v) =>
      srcByKey.get(k) match {
        case Some(srows) if sc.matched.nonEmpty =>
          val s = srows.head._2 // unique by construction
          sc.matched.find { case (c, _) => matchedConds(c)._2(v, s) } match {
            case Some((_, set)) => matchedSets(set) match {
              case (Some(_), f) => Seq(k -> f(v, s)) // UPDATE
              case (None, _) => Nil // DELETE
            }
            case None => Seq(k -> v) // matched, no clause fires
          }
        case Some(_) => Seq(k -> v) // matched, no matched clauses
        case None =>
          sc.nmbs.find { case (c, _) => nmbsCondEval(c, k, v) } match {
            case Some((_, set)) => nmbsSets(set) match {
              case (Some(_), f) => Seq(k -> f(v, 0L))
              case (None, _) => Nil
            }
            case None => Seq(k -> v)
          }
      }
    }
    val targetKeys = sc.target.map(_._1).toSet
    val inserted = sc.source.flatMap { case (k, sv) =>
      if (targetKeys.contains(k)) Nil
      else sc.ins.find(c => insConds(c)._2(0L, sv)) match {
        case Some(_) => Seq(k -> sv) // the single insert clause: v := s.v
        case None => Nil
      }
    }
    fromTarget ++ inserted
  }

  property("random clause sets track the SQL-semantics model in ≤1 commit") =
    forAll(scenarios) { sc =>
      import spark.implicits._
      val dir = Files.createTempDirectory("graft_mergeprops_").toString
      val t = IncrementalTable(spark, s"$dir/t")
      t.append(sc.target.toDF("k", "v").repartition(2), Nil,
        statsColumns = Seq("k"))
      val v0 = t.latestVersion
      val matched = sc.matched.map { case (c, s) =>
        WhenClause(matchedConds(c)._1, matchedSets(s)._1) }
      val nmbs = sc.nmbs.map { case (c, s) =>
        WhenClause(nmbsConds(c)._1, nmbsSets(s)._1) }
      val ins = sc.ins.map(c =>
        WhenClause(insConds(c)._1,
          Some(Seq("k" -> mergeSourceCol("k"), "v" -> mergeSourceCol("v")))))
      t.mergeInto(sc.source.toDF("k", "v"), Seq("k"), matched, ins, nmbs)
      val got = t.read().as[(Long, Long)].collect().toSeq.sorted
      val want = model(sc).sorted
      val oneCommit = t.latestVersion <= v0 + 1
      if (got != want || !oneCommit)
        println(s"MERGEPROPS FAIL\n sc=$sc\n got=$got\n want=$want" +
          s"\n commits=${t.latestVersion - v0}")
      got == want && oneCommit
    }
}
