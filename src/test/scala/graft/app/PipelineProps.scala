package graft.app

import java.nio.file.Files

import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll

import graft.SparkSpec
import graft.ingest.Generator

/** SURVEY.md §5.3 property tests (reference readme.md:13 "explore
  * concurrency bugs"): for ANY interleaving of file arrivals into tick
  * batches, the pipeline lands every file exactly once, watermarks only
  * ever advance, and refresh is idempotent.
  *
  * Spark jobs per case are expensive; the case count is capped — the
  * value is the random *interleavings*, not volume. */
object PipelineProps extends Properties("pipeline") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(6).withWorkers(1)

  private lazy val spark = SparkSpec.spark
  private val day = "2024-03-26"
  private val dayDate = java.time.LocalDate.parse(day)

  // up to 10 files split into 1..4 arrival batches (some possibly empty)
  private val interleavings: Gen[List[Int]] = for {
    n <- Gen.choose(1, 10)
    cuts <- Gen.choose(1, 4)
    sizes <- splitInto(n, cuts)
  } yield sizes

  private def splitInto(n: Int, parts: Int): Gen[List[Int]] =
    if (parts == 1) Gen.const(List(n))
    else for {
      head <- Gen.choose(0, n)
      rest <- splitInto(n - head, parts - 1)
    } yield head :: rest

  property("any arrival interleaving lands every file exactly once") =
    forAll(interleavings) { batches =>
      val root = Files.createTempDirectory("prop").toString
      val gen = new Generator(s"$root/ingest", seed = batches.hashCode(),
        baseIntervalMillis = 0)
      val pipe = new Pipeline(spark, s"$root/ingest", s"$root/tables")

      var expected = Set.empty[String]
      var wmHistory = List.empty[Long]
      batches.foreach { k =>
        expected ++= gen.drop(k, dayDate).map(_.getFileName.toString)
        pipe.tickAndIngest(now = dayDate)
        pipe.runAll(day)
        wmHistory ::= pipe.processed.latestMeta(s"watermark/$day")
          .map(_.toLong).getOrElse(0L)
      }

      val got = pipe.processed.read().select("filename")
        .collect().map(_.getString(0)).toSeq
      val exactlyOnce = got.sorted == expected.toSeq.sorted
      val monotone = wmHistory.reverse.sliding(2).forall {
        case Seq(a, b) => a <= b
        case _ => true
      }
      val wmFinal = wmHistory.headOption.contains(expected.size.toLong)

      // refresh twice: contents unchanged (idempotent partition replace)
      pipe.runAll(day, refresh = true)
      pipe.runAll(day, refresh = true)
      val afterRefresh = pipe.processed.read().select("filename")
        .collect().map(_.getString(0)).toSeq
      val refreshIdempotent = afterRefresh.sorted == expected.toSeq.sorted

      exactlyOnce && monotone && wmFinal && refreshIdempotent
    }
}
