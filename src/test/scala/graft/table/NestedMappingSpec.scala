package graft.table

import org.apache.spark.sql.functions.{col, lit, struct}
import org.apache.spark.sql.types.{LongType, StructField, StructType}

import graft.SparkSpec

/** Nested column mapping (X86, VERDICT r8 #2): in-struct DROP, RENAME,
  * and type WIDENING as metadata-only commits — the X72 `colmap/`
  * indirection extended to struct members via X54's dot-paths, with
  * the read/write boundaries relabelling through positional struct
  * casts and the X68 lossless-widening rules applying one level down. */
class NestedMappingSpec extends SparkSpec {
  import spark.implicits._

  private def seed(root: String): IncrementalTable = {
    val t = IncrementalTable(spark, root)
    t.append(spark.range(1, 4).toDF("id")
      .withColumn("hdr", struct((col("id") * 10).as("cust"),
        (col("id") * 100).cast("int").as("qty"))).repartition(1), Nil,
      statsColumns = Seq("id", "hdr.cust"))
    t
  }

  test("in-struct rename is metadata-only: both generations serve the new name") {
    val t = seed(tmpDir("nmap") + "/t1")
    val filesBefore = t.liveFiles().toSet
    val preRename = t.latestVersion
    t.renameColumn("hdr.cust", "customer")
    assert(t.liveFiles().toSet == filesBefore) // zero data rewritten
    assert(t.schemaAt().get("hdr").dataType.asInstanceOf[StructType]
      .fieldNames.toSeq == Seq("customer", "qty"))
    // new-name writes land in the SAME physical member
    t.append(spark.range(4, 5).toDF("id")
      .withColumn("hdr", struct((col("id") * 10).as("customer"),
        (col("id") * 100).cast("int").as("qty"))).repartition(1), Nil,
      statsColumns = Seq("id", "hdr.customer"))
    assert(t.read().select($"id", $"hdr.customer").as[(Long, Long)]
      .collect().toSet == Set((1L, 10L), (2L, 20L), (3L, 30L), (4L, 40L)))
    // time travel shows the OLD member name with the old values
    val old = t.readAt(preRename)
    assert(old.schema("hdr").dataType.asInstanceOf[StructType]
      .fieldNames.toSeq == Seq("cust", "qty"))
    assert(old.select($"hdr.cust").as[Long].collect().toSet == Set(10L, 20L, 30L))
    // the PHYSICAL-keyed skipping index follows across both generations
    val pruned = t.liveFilesWhere($"hdr.customer" >= 40L)
    assert(pruned.size == 1, s"expected 1 surviving file, got $pruned")
    assert(t.readWhere($"hdr.customer" >= 40L).select($"id").as[Long]
      .collect().toSeq == Seq(4L))
  }

  test("in-struct rename tombstones the old path and chains") {
    val t = seed(tmpDir("nmap") + "/t2")
    t.renameColumn("hdr.cust", "customer")
    // re-adding the old member name refuses (old files carry its bytes)
    val e = intercept[IllegalArgumentException](t.alter(
      nestedAdditions = Seq(Seq("hdr") -> StructField("cust", LongType))))
    assert(e.getMessage.contains("previously dropped"), e.getMessage)
    // rename back refuses for the same reason
    val e2 = intercept[IllegalArgumentException](
      t.renameColumn("hdr.customer", "cust"))
    assert(e2.getMessage.contains("previously dropped"), e2.getMessage)
    // chains replay: customer -> client, then reads and writes hold
    t.renameColumn("hdr.customer", "client")
    t.append(spark.range(4, 5).toDF("id")
      .withColumn("hdr", struct((col("id") * 10).as("client"),
        (col("id") * 100).cast("int").as("qty"))), Nil)
    assert(t.read().select($"hdr.client").as[Long].collect().toSet ==
      Set(10L, 20L, 30L, 40L))
  }

  test("top-level parent rename migrates nested mapping and tombstones") {
    val t = seed(tmpDir("nmap") + "/t3")
    t.renameColumn("hdr.cust", "customer")
    t.renameColumn("hdr", "header")
    // the nested mapping followed the parent: both generations serve
    assert(t.read().select($"header.customer").as[Long].collect().toSet ==
      Set(10L, 20L, 30L))
    t.append(spark.range(4, 5).toDF("id")
      .withColumn("header", struct((col("id") * 10).as("customer"),
        (col("id") * 100).cast("int").as("qty"))), Nil)
    assert(t.read().select($"header.customer").as[Long].collect().toSet ==
      Set(10L, 20L, 30L, 40L))
    // the old nested path's tombstone followed: header.cust stays dead
    val e = intercept[IllegalArgumentException](t.alter(
      nestedAdditions = Seq(Seq("header") -> StructField("cust", LongType))))
    assert(e.getMessage.contains("previously dropped"), e.getMessage)
  }

  test("in-struct drop is a metadata projection; time travel keeps both generations") {
    val t = seed(tmpDir("nmap") + "/t4")
    val filesBefore = t.liveFiles().toSet
    val preDrop = t.latestVersion
    t.alter(drops = Seq("hdr.qty"))
    assert(t.liveFiles().toSet == filesBefore)
    assert(t.schemaAt().get("hdr").dataType.asInstanceOf[StructType]
      .fieldNames.toSeq == Seq("cust"))
    // reads stop seeing the member; time travel still shows it
    assert(t.read().select($"hdr.cust").as[Long].collect().toSet ==
      Set(10L, 20L, 30L))
    assert(t.readAt(preDrop).select($"hdr.qty").as[Int].collect().toSet ==
      Set(100, 200, 300))
    // writes must carry the narrower shape now; the wide shape refuses
    val e = intercept[IllegalArgumentException](t.append(
      spark.range(4, 5).toDF("id").withColumn("hdr",
        struct((col("id") * 10).as("cust"),
          (col("id") * 100).cast("int").as("qty"))), Nil))
    assert(e.getMessage.contains("add-column only"), e.getMessage)
    t.append(spark.range(4, 5).toDF("id")
      .withColumn("hdr", struct((col("id") * 10).as("cust"))), Nil)
    assert(t.read().count() == 4)
    // the dropped path is tombstoned against re-add
    val e2 = intercept[IllegalArgumentException](t.alter(
      nestedAdditions = Seq(Seq("hdr") -> StructField("qty",
        org.apache.spark.sql.types.IntegerType))))
    assert(e2.getMessage.contains("previously dropped"), e2.getMessage)
  }

  test("in-struct widen: mixed generations read exact, lossy refuses") {
    val t = IncrementalTable(spark, tmpDir("nmap") + "/t5")
    t.append(spark.range(1, 4).toDF("id")
      .withColumn("hdr", struct((col("id") * 10).cast("int").as("qty"))), Nil)
    t.alter(widen = Map("hdr.qty" -> LongType))
    assert(t.schemaAt().get("hdr").dataType.asInstanceOf[StructType]("qty")
      .dataType == LongType)
    // old int32 files up-convert; new writes land int64
    t.append(spark.range(4, 5).toDF("id")
      .withColumn("hdr", struct((col("id") * 10).as("qty"))), Nil)
    assert(t.read().select($"hdr.qty").as[Long].collect().toSet ==
      Set(10L, 20L, 30L, 40L))
    // lossy nested changes still refuse
    val e = intercept[IllegalArgumentException](
      t.alter(widen = Map("hdr.qty" ->
        org.apache.spark.sql.types.IntegerType)))
    assert(e.getMessage.contains("lossless"), e.getMessage)
  }

  test("DML and merge-on-read keep working across an in-struct rename") {
    val t = seed(tmpDir("nmap") + "/t6")
    t.renameColumn("hdr.cust", "customer")
    // copy-on-write DELETE keyed on the renamed member
    t.delete($"hdr.customer" === 20L)
    assert(t.read().select($"hdr.customer").as[Long].collect().toSet ==
      Set(10L, 30L))
    // MOR update touching the struct (rewrite the whole struct value)
    t.updateVectorized($"hdr.customer" === 30L,
      Map("hdr" -> struct(lit(35L).as("customer"),
        lit(350).cast("int").as("qty"))))
    assert(t.read().select($"hdr.customer").as[Long].collect().toSet ==
      Set(10L, 35L))
    // CDC renders the chain losslessly under the current schema
    val ch = t.changes(0)
    assert(ch.columns.contains("_change_type"))
    assert(ch.count() > 0)
  }

  test("guards: expression references and container members refuse") {
    val t = seed(tmpDir("nmap") + "/t7")
    t.addConstraint("c1", "hdr.cust > 0")
    val e = intercept[IllegalArgumentException](
      t.renameColumn("hdr.cust", "customer"))
    assert(e.getMessage.contains("CHECK constraint"), e.getMessage)
    val e2 = intercept[IllegalArgumentException](t.alter(drops = Seq("hdr.cust")))
    assert(e2.getMessage.contains("CHECK constraint"), e2.getMessage)
    t.dropConstraint("c1")
    // members of structs inside arrays stay refused
    val ta = IncrementalTable(spark, tmpDir("nmap") + "/t7a")
    ta.append(spark.range(1, 3).toDF("id")
      .withColumn("xs", org.apache.spark.sql.functions.array(
        struct(lit(1L).as("a")))), Nil)
    intercept[IllegalArgumentException](ta.renameColumn("xs.a", "b"))
    intercept[IllegalArgumentException](ta.alter(drops = Seq("xs.a")))
    // dropping the LAST member of a struct refuses
    val tb = IncrementalTable(spark, tmpDir("nmap") + "/t7b")
    tb.append(spark.range(1, 3).toDF("id")
      .withColumn("s", struct(lit(1L).as("only"))), Nil)
    val e3 = intercept[IllegalArgumentException](tb.alter(drops = Seq("s.only")))
    assert(e3.getMessage.contains("last field"), e3.getMessage)
  }

  test("SQL verbs: RENAME COLUMN s.f, ALTER COLUMN s.f TYPE, DROP COLUMN s.f") {
    val wh = tmpDir("nmap_wh")
    spark.conf.set("spark.sql.catalog.nmap",
      classOf[graft.sources.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.nmap.warehouse", wh)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS nmap.lake")
    spark.sql("CREATE TABLE nmap.lake.n (id BIGINT, " +
      "hdr STRUCT<cust: BIGINT, qty: INT, note: STRING>)")
    spark.sql("INSERT INTO nmap.lake.n VALUES " +
      "(1, named_struct('cust', 10L, 'qty', 100, 'note', 'a')), " +
      "(2, named_struct('cust', 20L, 'qty', 200, 'note', 'b'))")
    spark.sql("ALTER TABLE nmap.lake.n RENAME COLUMN hdr.cust TO customer")
    spark.sql("ALTER TABLE nmap.lake.n ALTER COLUMN hdr.qty TYPE BIGINT")
    spark.sql("ALTER TABLE nmap.lake.n DROP COLUMN hdr.note")
    spark.sql("INSERT INTO nmap.lake.n VALUES " +
      "(3, named_struct('customer', 30L, 'qty', 300L))")
    val out = spark.sql(
      "SELECT id, hdr.customer, hdr.qty FROM nmap.lake.n ORDER BY id")
      .as[(Long, Long, Long)].collect().toSeq
    assert(out == Seq((1L, 10L, 100L), (2L, 20L, 200L), (3L, 30L, 300L)))
  }
}
