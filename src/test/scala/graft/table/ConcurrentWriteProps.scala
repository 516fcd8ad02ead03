package graft.table

import java.nio.file.Files
import java.util.concurrent.CountDownLatch

import org.apache.spark.sql.functions.col
import org.scalacheck.{Gen, Prop, Properties, Test}
import org.scalacheck.Prop.{forAll, propBoolean}

import graft.SparkSpec

/** True MULTI-THREADED optimistic-concurrency stress (VERDICT r4 #6).
  * [[TableModelProps]] pins the sequential mutation algebra under random
  * interleavings; this pins the CONCURRENT-writer contract on one root
  * (the `readme.md:13` "explore concurrency bugs" charter beyond what a
  * sequential model can catch):
  *
  *  - each thread gets its OWN handle — the Delta convention: a writer's
  *    snapshot is private, and the per-root lock serializes only log
  *    publication, never staging, so the stale-snapshot window between
  *    removal-set computation and publish is genuinely exercised;
  *  - the published log is LINEARIZABLE: plain delta versions are
  *    exactly 0..latest with no gaps or duplicates, and they biject onto
  *    the union of all threads' reported successful commits — a
  *    conflicted loser's files never enter the log, a winner's exactly
  *    once;
  *  - the final table equals the fold of the reported ops in
  *    published-version order — a lost update, duplicate partition
  *    content from a double-replace, or a resurrected dv-delete each
  *    break the equality;
  *  - `readAt` of mid-race versions at/after the horizon equals the
  *    fold prefix (time travel stays exact through auto-checkpoints that
  *    landed DURING the race);
  *  - with cdcRetention, a full-history `changes(0)` net fold equals
  *    the final state even across those mid-race checkpoints;
  *  - `vacuum()` afterwards reclaims losers' orphans without touching
  *    the live set.
  */
object ConcurrentWriteProps extends Properties("occstress") {

  // Spark jobs per case are expensive and each case runs THREADS × ops
  // of them; CI stays small, GRAFT_OCC_TESTS raises it for offline runs
  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(
      sys.env.get("GRAFT_OCC_TESTS").map(_.toInt).getOrElse(3)).withWorkers(1)

  private lazy val spark = SparkSpec.spark

  private sealed trait Op
  private case class Append(part: Int, k: Int) extends Op
  private case class Replace(part: Int, k: Int) extends Op
  private case class DvDel(nth: Int) extends Op // nth of this thread's own ids

  private val threadScript: Gen[List[Op]] = for {
    n <- Gen.choose(3, 5)
    ops <- Gen.listOfN(n, Gen.frequency(
      3 -> (for { p <- Gen.choose(0, 2); k <- Gen.choose(1, 3) } yield Append(p, k)),
      2 -> (for { p <- Gen.choose(0, 2); k <- Gen.choose(1, 2) } yield Replace(p, k)),
      2 -> Gen.choose(0, 9).map(DvDel(_))))
  } yield ops

  // three racing writers: enough for three-way version races while the
  // partition space (3) stays small enough that replaces collide often
  private val scripts: Gen[List[List[Op]]] = Gen.listOfN(3, threadScript)

  /** A thread's record of one PUBLISHED commit — the fold key material.
    * Conflicted ops record nothing: the contract is precisely that the
    * log carries no trace of them. */
  private sealed trait Done { def version: Long }
  private case class DidWrite(version: Long, action: String, part: Int,
      rows: Seq[(Long, Int, Long)]) extends Done
  private case class DidDv(version: Long, id: Long) extends Done

  private val seedRows = Vector((-1L, 0, 0L), (-2L, 1, 0L), (-3L, 2, 0L))

  private def run(scripts: List[List[Op]], columnar: Boolean,
      fragmented: Boolean = false): Prop = {
    val s = spark
    import s.implicits._
    val root = Files.createTempDirectory("occstress").toString + "/t/v1"
    def handle() =
      if (fragmented) new IncrementalTable(spark, root, checkpointEvery = 6,
        parquetThreshold = 0, cdcRetention = 1000, manifestTargetRows = 2)
      else if (columnar) new IncrementalTable(spark, root, checkpointEvery = 6,
        parquetThreshold = 0, cdcRetention = 1000)
      else new IncrementalTable(spark, root, checkpointEvery = 6,
        cdcRetention = 1000)

    // settle schema + layout at v0 so the race is over a real table
    handle().append(seedRows.toDF("id", "part", "v"), Seq("part"))

    val results = new Array[Vector[Done]](scripts.size)
    val errors = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val start = new CountDownLatch(1)
    val threads = scripts.zipWithIndex.map { case (script, ti) =>
      new Thread(() => {
        try {
          val t = handle()
          var done = Vector.empty[Done]
          var mine = Vector.empty[Long]
          var seq = 0L
          start.await()
          script.foreach {
            case Append(p, k) =>
              val rows = (0 until k).map { i =>
                (ti * 1000000L + seq + i, p, seq + i)
              }
              seq += k
              // appends commute — they must NEVER lose, only retry
              t.append(rows.toDF("id", "part", "v"), Seq("part")).foreach { c =>
                done :+= DidWrite(c.version, "append", p, rows)
                mine ++= rows.map(_._1)
              }
            case Replace(p, k) =>
              val rows = (0 until k).map { i =>
                (ti * 1000000L + 500000L + seq + i, p, seq + i)
              }
              seq += k
              try t.replaceWhere(rows.toDF("id", "part", "v"), Seq("part"),
                Map.empty, Map("part" -> p.toString)).foreach { c =>
                  done :+= DidWrite(c.version, "replace", p, rows)
                  mine ++= rows.map(_._1)
                }
              catch { case _: ConcurrentWriteException => () }
            case DvDel(nth) => if (mine.nonEmpty) {
              val id = mine(nth % mine.size)
              try t.deleteVectorized(col("id") === id).foreach { c =>
                done :+= DidDv(c.version, id)
              }
              catch { case _: ConcurrentWriteException => () }
            }
          }
          results(ti) = done
        } catch { case e: Throwable => errors.add(e); results(ti) = Vector.empty }
      }, s"occ-writer-$ti")
    }
    threads.foreach(_.start()); start.countDown()
    threads.foreach(_.join(300000))
    if (!errors.isEmpty) throw errors.peek()

    val all = results.toVector.flatten.sortBy(_.version)

    // ---- linearizable log: contiguous versions, bijective with the
    // threads' reported successes (seed owns v0)
    val versions = new java.io.File(root, "_graft_log").listFiles()
      .map(_.getName)
      .filter(n => n.endsWith(".json") && !n.contains("checkpoint"))
      .map(_.takeWhile(_.isDigit).toLong).sorted.toSeq
    val contiguousOk = versions == (0L to versions.max)
    val claimedOk = (0L +: all.map(_.version)).sorted == versions

    // ---- the fold of reported ops in published order IS the table
    def fold(upTo: Long): Vector[(Long, Int, Long)] =
      all.filter(_.version <= upTo).foldLeft(seedRows) { (st, d) => d match {
        case DidWrite(_, "append", _, rows) => st ++ rows
        case DidWrite(_, _, p, rows) => st.filterNot(_._2 == p) ++ rows
        case DidDv(_, id) => st.filterNot(_._1 == id)
      }}
    val t = handle()
    def rowsOf(df: org.apache.spark.sql.DataFrame) =
      df.select($"id", $"part", $"v").as[(Long, Int, Long)].collect().toSeq.sorted
    val state = fold(Long.MaxValue)
    val finalOk = rowsOf(t.read()) == state.sorted

    // ---- time travel through mid-race auto-checkpoints
    val horizon = t.commits().headOption
      .filter(_.action == "checkpoint").map(_.version).getOrElse(0L)
    val travelOk = all.map(_.version).filter(_ >= horizon).take(2)
      .forall(v => rowsOf(t.readAt(v)) == fold(v).sorted)

    // ---- full-history CDC across the horizon (cdcRetention path):
    // the net fold of a concurrent history equals the final state
    val counts = scala.collection.mutable.Map.empty[(Long, Long), Int]
    t.changes(0).select($"id", $"v", $"_change_type")
      .as[(Long, Long, String)].collect().foreach { case (id, v, ct) =>
        counts((id, v)) = counts.getOrElse((id, v), 0) + (if (ct == "insert") 1 else -1)
      }
    val cdcOk = counts.filter(_._2 != 0).keySet ==
      state.map(r => (r._1, r._3)).toSet

    // ---- losers left only orphans: vacuum reclaims, live set intact
    t.vacuum()
    val vacuumOk = rowsOf(t.read()) == state.sorted

    (contiguousOk :| s"contiguous log: $versions") &&
      (claimedOk :| s"claimed==published: claimed=${(0L +: all.map(_.version)).sorted} log=$versions") &&
      (finalOk :| s"final state fold: table=${rowsOf(t.read())} fold=${state.sorted}") &&
      (travelOk :| "time travel mid-race") &&
      (cdcOk :| {
        val expect = state.map(r => (r._1, r._3)).toSet
        val nonzero = counts.filter(_._2 != 0)
        val log = t.commits().map(c => s"v${c.version}:${c.action}" +
          s"(add=${c.add.size},rm=${c.remove.size},dv=${c.dv.map{case(f,g)=>f.takeRight(20)+":"+g.size}.mkString("|")})").mkString(" ")
        val ops = all.map {
          case DidWrite(v, a, p, rows) => s"v$v:$a(p$p,ids=${rows.map(_._1).mkString(",")})"
          case DidDv(v, id) => s"v$v:dv(id=$id)"
        }.mkString(" ")
        s"cdc net fold: extra=${nonzero.keySet -- expect} missing=${expect -- nonzero.keySet} " +
          s"netcounts=${nonzero.toSeq.sortBy(_._1).mkString(",")} ops=[$ops] log=[$log]"
      }) &&
      (vacuumOk :| "vacuum preserves live set")
  }

  property("racing writers: linearizable log, fold-exact table, losers invisible") =
    forAll(scripts)(run(_, columnar = false))

  property("columnar checkpoints hold the same contract mid-race") =
    forAll(scripts)(run(_, columnar = true))

  property("manifest-fragmented checkpoints (X108) hold the contract mid-race") =
    forAll(scripts)(run(_, columnar = true, fragmented = true))
}
