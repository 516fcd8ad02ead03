package graft.table

import java.nio.file.Files

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.{array_contains, col, exists, lit, map_contains_key, map_keys, map_values}
import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll

import graft.SparkSpec

/** SOUNDNESS property for container-leaf data skipping (X65/X69):
  * for random tables carrying arrays (null arrays and null ELEMENTS
  * included) and maps, split across random multi-file layouts with
  * element/key/value paths indexed, every predicate in the supported
  * extraction surface must satisfy
  * `readWhere(p) == read().filter(p)` as a multiset — i.e. the prune
  * may open fewer files but must NEVER drop a matching row. This is
  * the invariant the whole index stands on: the scripted specs pin
  * prune COUNTS on clustered fixtures; this pins that no random
  * layout/predicate combination prunes a file it needed (the
  * null-element / coincidental-count hazards the repetition-level
  * suppression exists for). Case count capped (Spark jobs per case —
  * PipelineProps contract). */
object ContainerSkippingProps extends Properties("containerskip") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(
      sys.env.get("GRAFT_MODEL_TESTS").map(_.toInt).getOrElse(5)).withWorkers(1)

  private lazy val spark = SparkSpec.spark

  private type R = (Long, Option[Seq[Option[Long]]], Map[String, Long],
    Option[Double])

  private val rows: Gen[List[R]] = for {
    n <- Gen.choose(8, 30)
    rs <- Gen.listOfN(n, for {
      k <- Gen.choose(0L, 60L)
      hasArr <- Gen.frequency(5 -> true, 1 -> false)
      xs <- Gen.listOfN(3, Gen.frequency(
        6 -> Gen.choose(0L, 100L).map(Option(_)),
        1 -> Gen.const(Option.empty[Long])))
      nArr <- Gen.choose(0, 3)
      nM <- Gen.choose(0, 2)
      keys <- Gen.listOfN(nM, Gen.oneOf("ka", "kb", "kc", "kd"))
      vals <- Gen.listOfN(nM, Gen.choose(0L, 100L))
      // double leaf (X75): nulls AND NaN rows in the mix — NaN orders
      // above every value in Spark, so a file holding one must survive
      // any upper-bounded prune (parquet omits its stats entirely)
      d <- Gen.frequency(
        6 -> Gen.choose(0.0, 100.0).map(Option(_)),
        1 -> Gen.const(Option(Double.NaN)),
        1 -> Gen.const(Option.empty[Double]))
    } yield (k, if (hasArr) Some(xs.take(nArr)) else None,
      keys.zip(vals).toMap, d))
  } yield rs

  private val preds: Gen[Column] = {
    val leaf: Gen[Column] = Gen.oneOf(
      Gen.choose(0L, 110L).map(v => array_contains(col("xs"), v)),
      for { a <- Gen.choose(0L, 90L); w <- Gen.choose(0L, 30L) } yield
        exists(col("xs"), x => x >= a && x <= a + w),
      Gen.const(exists(col("xs"), x => x.isNull)),
      Gen.oneOf("ka", "kb", "kc", "kd", "zz").map(k =>
        map_contains_key(col("m"), k)),
      Gen.choose(0L, 110L).map(v => array_contains(map_values(col("m")), v)),
      Gen.oneOf("ka", "kd").map(k => exists(map_keys(col("m")), _ === k)),
      for { a <- Gen.choose(0L, 90L); w <- Gen.choose(0L, 30L) } yield
        exists(map_values(col("m")), v => v >= a && v <= a + w),
      Gen.choose(0L, 60L).map(v => col("k") >= v),
      for { a <- Gen.choose(0.0, 90.0); w <- Gen.choose(0.0, 30.0) } yield
        col("d") >= a && col("d") <= a + w,
      Gen.choose(0.0, 110.0).map(v => col("d") > v),
      Gen.choose(0.0, 110.0).map(v => col("d") < v),
      Gen.const(col("d").isNull),
      Gen.const(col("d").isNotNull))
    Gen.frequency(2 -> leaf, 1 -> (for { a <- leaf; b <- leaf } yield a && b))
  }

  private val cases: Gen[(List[R], Int, List[Column])] = for {
    rs <- rows
    nFiles <- Gen.choose(1, 3)
    ps <- Gen.listOfN(4, preds)
  } yield (rs, nFiles, ps)

  property("readWhere == full-scan filter for every supported predicate shape") =
    forAll(cases) { case (rs, nFiles, ps) =>
      import spark.implicits._
      val dir = Files.createTempDirectory("graft_skipprops_").toString
      val t = IncrementalTable(spark, s"$dir/t")
      val slices = rs.grouped(math.max(1, rs.size / nFiles)).toSeq
      slices.foreach { slice =>
        t.append(slice.toDF("k", "xs", "m", "d").repartition(1), Nil,
          statsColumns = Seq("k", "xs.element", "m.key", "m.value", "d"))
      }
      ps.forall { p =>
        val pruned = t.readWhere(p).select($"k").as[Long].collect().sorted.toSeq
        val full = t.read().filter(p).select($"k").as[Long].collect().sorted.toSeq
        val ok = pruned == full
        if (!ok) println(s"SKIPPROPS FAIL pred=$p\n pruned=$pruned\n full=$full" +
          s"\n rows=$rs")
        ok
      }
    }
}
