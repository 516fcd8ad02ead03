package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The native vec_dot expression must be bit-identical to the
  * higher-order-function composition it replaces (same float→double
  * element math, same accumulation order) and must run inside
  * whole-stage codegen. */
class VectorDotSpec extends SparkSpec {
  import spark.implicits._

  private def randomVecs(n: Int, dim: Int) = {
    val rnd = new scala.util.Random(11)
    (0 until n).map(i => (i.toLong, Array.fill(dim)(rnd.nextFloat() * 2 - 1)))
      .toDF("id", "v")
  }

  test("vec_dot is bit-identical to the interpreted HOF dot") {
    val df = randomVecs(200, 64)
    val both = df.select(
      Vectors.dot($"v", $"v").as("hof"),
      Vectors.dotNative($"v", $"v").as("native"))
    assert(both.filter($"hof" =!= $"native").count() == 0)
    // and cross-pair (uneven arguments)
    val a = randomVecs(50, 64).select($"id".as("ia"), $"v".as("va"))
    val b = randomVecs(50, 64).select($"id".as("ib"), $"v".as("vb"))
    val pairs = a.crossJoin(b).select(
      Vectors.dot($"va", $"vb").as("hof"),
      Vectors.dotNative($"va", $"vb").as("native"),
      Vectors.cosine($"va", $"vb").as("chof"),
      Vectors.cosineNative($"va", $"vb").as("cnative"))
    assert(pairs.filter($"hof" =!= $"native" || $"chof" =!= $"cnative").count() == 0)
  }

  test("vec_dot participates in whole-stage codegen") {
    // repartition defeats ConvertToLocalRelation so the projection
    // actually executes (and codegens) on executors
    val df = randomVecs(10, 8).repartition(2)
      .select(Vectors.dotNative($"v", $"v").as("d"))
      .filter($"d" > 0)
    df.collect() // finalize the adaptive plan
    val plan = df.queryExecution.executedPlan.toString
    // the `*(n)` prefix marks a WholeStageCodegen stage; the vec_dot
    // projection must carry it (a codegen-incapable expression would
    // print an unstarred Project)
    assert(plan.linesIterator.exists(l => l.contains("vec_dot") && l.contains("*(")), plan)
    // null safety: null input -> null output, not a crash
    val withNull = spark.sql("SELECT vec_dot(CAST(NULL AS ARRAY<FLOAT>), array(CAST(1.0 AS FLOAT)))")
    assert(withNull.collect()(0).isNullAt(0))
  }

  test("vec_dot is callable from SQL via the session extension") {
    randomVecs(3, 4).createOrReplaceTempView("vecs")
    val r = spark.sql("SELECT id, vec_dot(v, v) AS n2 FROM vecs ORDER BY id")
      .as[(Long, Double)].collect()
    assert(r.length == 3 && r.forall(_._2 > 0))
    // type checking rejects non-float arrays
    intercept[Exception] {
      spark.sql("SELECT vec_dot(array(1.0D), array(1.0D))").collect()
    }
  }
}
