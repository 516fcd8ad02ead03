package graft.table

import org.apache.spark.sql.functions.{col, struct}

import graft.SparkSpec

/** VERDICT r9 #5: pin MAIN-PATH codegen cleanliness. The test suite
  * logs ~34 "Expr codegen error … falling back to interpreter mode"
  * warnings, clustered in property suites whose locally-defined case
  * classes hit the known Janino private-member limitation — a TEST
  * artifact, not an engine path. The one main-path candidate was
  * X86's nullability-relaxed positional struct CAST on the
  * nested-mapping read/write boundary. This spec runs exactly that
  * boundary under `spark.sql.codegen.factoryMode=CODEGEN_ONLY` +
  * `spark.sql.codegen.fallback=false`, which turn ANY interpreter
  * fallback (expression-level or whole-stage) into a hard error —
  * stronger than a log grep, and immune to logging configuration. */
class CodegenCleanSpec extends SparkSpec {
  import spark.implicits._

  test("nested-mapping read/write boundary survives CODEGEN_ONLY (no interpreter fallback)") {
    val prevMode = spark.conf.getOption("spark.sql.codegen.factoryMode")
    val prevFall = spark.conf.getOption("spark.sql.codegen.fallback")
    spark.conf.set("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try {
      val t = IncrementalTable(spark, tmpDir("cgclean") + "/t")
      t.append(spark.range(1, 4).toDF("id")
        .withColumn("hdr", struct((col("id") * 10).as("cust"),
          (col("id") * 100).cast("int").as("qty"))).repartition(1), Nil,
        statsColumns = Seq("id", "hdr.cust"))
      t.renameColumn("hdr.cust", "customer")
      // new-name write: the write-side positional CAST to physical names
      t.append(spark.range(4, 6).toDF("id")
        .withColumn("hdr", struct((col("id") * 10).as("customer"),
          (col("id") * 100).cast("int").as("qty"))).repartition(1), Nil,
        statsColumns = Seq("id", "hdr.customer"))
      // mixed-generation read: the read-side relabel CAST over old+new
      // files — the X86 positional struct CAST under CODEGEN_ONLY
      assert(t.read().select($"id", $"hdr.customer").as[(Long, Long)]
        .collect().toSet ==
        Set((1L, 10L), (2L, 20L), (3L, 30L), (4L, 40L), (5L, 50L)))
      // skipping-pruned read through the same boundary
      assert(t.readWhere($"hdr.customer" >= 40L).select($"id").as[Long]
        .collect().toSeq.sorted == Seq(4L, 5L))
      // in-struct type widening (the other relabel-cast shape)
      t.alter(widen = Map("hdr.qty" ->
        org.apache.spark.sql.types.LongType))
      assert(t.read().select($"hdr.qty").as[Long].collect().toSet ==
        Set(100L, 200L, 300L, 400L, 500L))
    } finally {
      prevMode.fold(spark.conf.unset("spark.sql.codegen.factoryMode"))(
        spark.conf.set("spark.sql.codegen.factoryMode", _))
      prevFall.fold(spark.conf.unset("spark.sql.codegen.fallback"))(
        spark.conf.set("spark.sql.codegen.fallback", _))
    }
  }
}
