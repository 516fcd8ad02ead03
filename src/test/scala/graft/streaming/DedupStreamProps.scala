package graft.streaming

import java.nio.file.Files

import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll

import graft.SparkSpec
import graft.table.IncrementalTable

/** Property: for ANY split of a random corpus into arrival batches
  * (with frequent fingerprint collisions within and across batches),
  * draining [[DedupStream]] batch-by-batch equals the plain-Scala
  * arrival-order dedup fold — and a second drain changes nothing.
  *
  * Spark jobs per case are expensive; the case count is capped — the
  * value is the random batch interleavings, not volume (PipelineProps
  * contract). */
object DedupStreamProps extends Properties("dedupstream") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(5).withWorkers(1)

  private lazy val spark = SparkSpec.spark

  // up to 12 docs over a 4-word text space (heavy collisions), split
  // into 1..3 arrival batches, some possibly empty
  private val corpora: Gen[List[List[(Long, String)]]] = for {
    n <- Gen.choose(1, 12)
    texts <- Gen.listOfN(n, Gen.oneOf("aa", "bb", "cc", "dd"))
    cuts <- Gen.choose(1, 3)
    sizes <- splitInto(n, cuts)
  } yield {
    val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
    var rest = docs
    sizes.map { k => val (h, t) = rest.splitAt(k); rest = t; h }
  }

  private def splitInto(n: Int, parts: Int): Gen[List[Int]] =
    if (parts == 1) Gen.const(List(n))
    else for {
      head <- Gen.choose(0, n)
      rest <- splitInto(n - head, parts - 1)
    } yield head :: rest

  /** Reference semantics: fold batches in arrival order; within a
    * batch min id per text wins; texts seen in earlier batches drop. */
  private def referenceFold(batches: List[List[(Long, String)]]): Set[(Long, String)] = {
    var seen = Set.empty[String]
    var out = Set.empty[(Long, String)]
    batches.foreach { b =>
      val reps = b.groupBy(_._2).map { case (_, rows) => rows.minBy(_._1) }
      val survivors = reps.filterNot(r => seen.contains(r._2))
      out ++= survivors
      seen ++= survivors.map(_._2)
    }
    out
  }

  property("drain-per-batch equals arrival-order dedup; re-drain is a no-op") =
    forAll(corpora) { batches =>
      val s = spark
      import s.implicits._
      val dir = Files.createTempDirectory("dedupprops").toString
      val up = IncrementalTable(spark, dir + "/up/v1")
      val down = IncrementalTable(spark, dir + "/down/v1")
      val stream = new DedupStream(up, down,
        df => df.withColumn("fp",
          org.apache.spark.sql.functions.md5(
            org.apache.spark.sql.functions.col("text").cast("binary"))),
        keyCol = "id", name = "p")
      batches.foreach { b =>
        if (b.nonEmpty) {
          up.append(b.toDF("id", "text"), Nil)
          stream.drain()
        }
      }
      val got =
        if (down.exists)
          down.read().select($"id", $"text").as[(Long, String)].collect().toSet
        else Set.empty[(Long, String)]
      val want = referenceFold(batches)
      val redrain = stream.drain()
      got == want && redrain == 0
    }
}
