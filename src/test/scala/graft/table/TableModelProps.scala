package graft.table

import java.nio.file.Files

import org.apache.spark.sql.functions.col
import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll

import graft.SparkSpec

/** Model-based property: a RANDOM interleaving of every mutation the
  * commit log supports — append, copy-on-write delete, DELETION-VECTOR
  * delete, update, compact, RESTORE to a random earlier version,
  * vacuum — must track a plain-Scala multiset model exactly:
  *
  *  - after every op, `read()` equals the model's current state;
  *  - at the end, `readAt` of two random recorded versions equals the
  *    model's remembered state at those versions (time travel composes
  *    with every mutation, including dv and restore);
  *  - the CDC net fold of `changes(0)` (inserts minus deletes per row)
  *    equals the final state (rewrites cancel, dv commits emit exact
  *    deltas, restores emit exact deltas).
  *
  * This is where cross-feature interaction bugs live (a restore of a
  * dv state across a compaction, an update rewriting a dv'd file...);
  * the scripted specs pin each feature alone, this pins their algebra.
  * Spark jobs per case are expensive; case count is capped — the value
  * is the random interleavings, not volume (PipelineProps contract). */
object TableModelProps extends Properties("tablemodel") {

  // GRAFT_MODEL_TESTS raises the case count for offline stress runs;
  // CI stays at 4 (Spark jobs per case are expensive)
  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(
      sys.env.get("GRAFT_MODEL_TESTS").map(_.toInt).getOrElse(4)).withWorkers(1)

  private lazy val spark = SparkSpec.spark

  private sealed trait Op
  private case class Append(rows: List[(Long, Long)]) extends Op
  private case class DeleteCow(m: Int, r: Int) extends Op
  private case class DeleteDv(m: Int, r: Int) extends Op
  private case class Update(m: Int, r: Int) extends Op
  private case class Merge(rows: List[(Long, Long)]) extends Op // upsert by id
  private case class DelIns(m: Int, r: Int, rows: List[(Long, Long)]) extends Op
  private case object Compact extends Op
  private case object DvMerge extends Op // sidecar compaction: logical no-op
  private case class Restore(pick: Int) extends Op // index into history
  private case object Vacuum extends Op

  private val ops: Gen[List[Op]] = for {
    n <- Gen.choose(3, 7)
    // fresh-id appends interleaved with mutations; id space kept tiny
    // via small moduli so predicates regularly hit and miss
    list <- Gen.listOfN(n, Gen.frequency(
      4 -> (for {
        k <- Gen.choose(1, 4)
        base <- Gen.choose(0, 1000)
      } yield Append((0 until k).map(i => (base * 10L + i, base + i.toLong)).toList)),
      2 -> (for { m <- Gen.choose(2, 4); r <- Gen.choose(0, 3) } yield DeleteCow(m, r % m)),
      2 -> (for { m <- Gen.choose(2, 4); r <- Gen.choose(0, 3) } yield DeleteDv(m, r % m)),
      1 -> (for { m <- Gen.choose(2, 4); r <- Gen.choose(0, 3) } yield Update(m, r % m)),
      1 -> (for {
        k <- Gen.choose(1, 3)
        base <- Gen.choose(0, 40) // low id space: upserts often MATCH
      } yield Merge((0 until k).map(i => (base + i.toLong, 9000L + base + i)).toList)),
      1 -> (for {
        m <- Gen.choose(2, 4); r <- Gen.choose(0, 3)
        base <- Gen.choose(0, 1000)
      } yield DelIns(m, r % m, List((base * 10L + 7, base + 7L)))),
      1 -> Gen.const(Compact),
      1 -> Gen.const(DvMerge),
      1 -> Gen.choose(0, 100).map(Restore(_)),
      1 -> Gen.const(Vacuum)))
  } yield Append(List((1L, 1L), (2L, 2L), (3L, 3L))) :: list

  private def run(script: List[Op], columnar: Boolean = false,
      fragmented: Boolean = false): Boolean = {
    val s = spark
    import s.implicits._
    val dir = Files.createTempDirectory("tablemodel").toString
    // columnar mode forces the parquet-checkpoint metadata path with an
    // aggressive cadence, so every random script crosses compaction
    // boundaries on the 100×-scale representation
    val t =
      if (fragmented)
        // X108 stress: 2-row manifests force EVERY checkpoint through
        // the dirty/reuse split, prefix pruning, and fragmentation
        // folding — the manifest algebra under random interleavings
        new IncrementalTable(spark, dir + "/t/v1",
          checkpointEvery = 2, parquetThreshold = 0, manifestTargetRows = 2)
      else if (columnar) new IncrementalTable(spark, dir + "/t/v1",
        checkpointEvery = 2, parquetThreshold = 0)
      else IncrementalTable(spark, dir + "/t/v1")

    var state = Vector.empty[(Long, Long)] // multiset of (id, v)
    var history = Vector.empty[(Long, Vector[(Long, Long)])] // (version, state)
    def snap(): Unit = {
      val v = t.latestVersion
      if (history.isEmpty || history.last._1 != v) history :+= (v -> state)
    }

    def current(): Seq[(Long, Long)] =
      if (!t.exists || t.read().columns.isEmpty) Seq.empty
      else t.read().select($"id", $"v").as[(Long, Long)].collect().toSeq

    val okEveryStep = script.forall { op =>
      op match {
        case Append(rows) =>
          t.append(rows.toDF("id", "v"), Nil)
          state = state ++ rows
          snap()
        case DeleteCow(m, r) =>
          // guarded like DeleteDv: shrinking can drop the leading Append
          if (t.exists) {
            t.delete($"id" % m === r)
            state = state.filterNot { case (id, _) => id % m == r }
            snap()
          }
        case DeleteDv(m, r) =>
          if (t.exists) {
            t.deleteVectorized($"id" % m === r)
            state = state.filterNot { case (id, _) => id % m == r }
            snap()
          }
        case Update(m, r) =>
          if (t.exists) {
            t.update($"id" % m === r, Map("v" -> (col("v") + 100L)))
            state = state.map { case (id, v) =>
              if (id % m == r) (id, v + 100L) else (id, v)
            }
            snap()
          }
        case Merge(rows) =>
          if (t.exists) {
            // model multiset semantics: ALL rows with a matched id are
            // replaced by the single source row; unmatched ids insert.
            // Sources with duplicate ids are rejected by merge, so the
            // generator emits distinct ids per batch.
            t.merge(rows.toDF("id", "v"), Seq("id"))
            val byId = rows.toMap
            state = state.filterNot { case (id, _) => byId.contains(id) } ++ rows
            snap()
          }
        case DelIns(m, r, rows) =>
          if (t.exists) {
            // atomic delete-and-insert: rows whose id matches BOTH the
            // key set and id%m==r are removed; inserts always land
            val keys = state.map(_._1).distinct.filter(_ % m == r)
            t.deleteInsert(keys.toDF("id"), Seq("id"),
              col("id") % m === r, rows.toDF("id", "v"))
            state = state.filterNot { case (id, _) => id % m == r && keys.contains(id) } ++ rows
            snap()
          }
        case Compact =>
          if (t.exists) { t.compact(); snap() }
        case DvMerge =>
          // sidecar maintenance: merges dv generations, state unchanged
          if (t.exists) { t.compactDeletionVectors(); snap() }
        case Restore(pick) =>
          // versions behind the head checkpoint are compacted away and
          // restore correctly refuses them — pick a reachable one
          val reachable = history.filter(h =>
            t.commits().headOption.forall(_.version <= h._1))
          if (reachable.nonEmpty) {
            val (ver, st) = reachable(pick % reachable.size)
            t.restore(ver)
            state = st
            snap()
          }
        case Vacuum =>
          if (t.exists) t.vacuum()
      }
      current().sorted == state.sorted.toSeq
    }

    // a fully-shrunk script may never create the table; the end-state
    // checks need at least one commit to fold from
    if (!t.exists) return okEveryStep

    // versions before the head checkpoint are compacted away (readAt
    // and changes both refuse them) — the checks run from the horizon
    val horizon = t.commits().headOption
      .filter(_.action == "checkpoint").map(_.version)

    // time travel back to two recorded reachable versions
    val travelOk = history.filter(h => horizon.forall(h._1 >= _)).take(2)
      .forall { case (ver, st) =>
        t.readAt(ver).select($"id", $"v").as[(Long, Long)]
          .collect().toSeq.sorted == st.sorted.toSeq
      }

    // CDC net fold equals the final state (multiset difference). With a
    // head checkpoint, fold changes SINCE the horizon onto the model's
    // remembered state AT the horizon — same algebra, movable origin.
    def netFold(from: Long, seed: Seq[(Long, Long)]): Boolean = {
      val counts = scala.collection.mutable.Map.empty[(Long, Long), Int]
      seed.foreach(row => counts(row) = counts.getOrElse(row, 0) + 1)
      t.changes(from).select($"id", $"v", $"_change_type")
        .as[(Long, Long, String)].collect().foreach { case (id, v, ct) =>
          counts((id, v)) = counts.getOrElse((id, v), 0) + (if (ct == "insert") 1 else -1)
        }
      val folded = counts.toSeq.flatMap { case (row, n) => Seq.fill(n)(row) }
      folded.sorted == state.sorted.toSeq
    }
    val feedOk = horizon match {
      case None => netFold(0, Nil)
      case Some(h) => history.find(_._1 == h) match {
        case Some((_, st)) => netFold(h + 1, st)
        // horizon version not snapshotted by an op boundary (an
        // intra-op commit): nothing sound to seed from — skip the
        // feed check for this rare script, the step checks still ran
        case None => true
      }
    }

    okEveryStep && travelOk && feedOk
  }

  property("random mutation interleavings track the model; time travel and CDC stay exact") =
    forAll(ops)(run(_))

  property("columnar (parquet) checkpoints preserve the same algebra") =
    forAll(ops)(run(_, columnar = true))

  property("manifest-fragmented checkpoints (X108) preserve the same algebra") =
    forAll(ops)(run(_, fragmented = true))
}
