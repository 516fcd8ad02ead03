package graft.sources

import org.apache.spark.sql.connector.catalog.SupportsRowLevelOperations
import org.apache.spark.sql.connector.write.RowLevelOperation

import graft.SparkSpec
import graft.table.IncrementalTable

/** VERDICT r8 #4 adjudication: can Spark 4.1's public
  * `SupportsRowLevelOperations` API carry DELETE/UPDATE/MERGE for
  * graft tables, retiring the 29-line `DmlShim`?
  *
  * FINDING — the API exists and its group-based (copy-on-write)
  * contract fits the engine's file-granular CoW in principle, but the
  * migration is NOT the smaller risk, and the shim stays. The
  * concrete gaps, each verified against the 4.1.2 bytecode:
  *
  *  1. WRITE PLUMBING. `ReplaceData` (the group-based rewrite plan)
  *     executes through a V2 `BatchWrite` only — the V1 write
  *     fallback (`V1Write`) covers Append/Overwrite, not row-level
  *     ops. Migrating means a second, executor-side parquet write
  *     path for batch DML alongside the V1 bridge that serves
  *     everything else today.
  *  2. TOUCHED-FILE ECONOMICS. Spark's `RewriteMergeIntoTable`
  *     narrows the rewritten group set only through
  *     `SupportsRuntimeV2Filtering` (the `_file` runtime-IN filter
  *     Iceberg ships); without it a MERGE rewrites every candidate
  *     group. The library's key-semi-join probe (X11) finds exactly
  *     the files holding matched keys — replicating that economics
  *     needs the runtime-filtering surface plus a file-identity
  *     metadata column.
  *  3. CHOKE-POINT GUARANTEES. Row-id carry (X87), identity minting
  *     refusal semantics (X83), generated-column verification (X84),
  *     and the MOR routing property (`graft.deletionVectors` →
  *     sidecar UPDATE, X82 — which on this API is the SEPARATE
  *     delta-based `SupportsDelta` contract, a second operation
  *     implementation) all live at the library's single write choke
  *     point. Spark's rewrite plans assemble replacement rows
  *     upstream of it; preserving the guarantees means threading
  *     each one through `requiredMetadataAttributes` and custom
  *     write-side handling.
  *
  * Against that, `DmlShim` is 29 lines wrapping two conversions
  * (`ExpressionUtils.column`, `Dataset.ofRows`) that have been
  * signature-stable across 3.x→4.x and fail at COMPILE time if they
  * break. The adjudication: keep the shim; re-open if the wrapper
  * gaps close upstream (this spec pins the load-bearing facts and
  * breaks loudly if the landscape shifts). */
class RowLevelOpsProbeSpec extends SparkSpec {
  import spark.implicits._

  test("the public row-level-op API exists with the three commands (re-adjudicate if this grows)") {
    // compile-time: the interfaces resolve on this Spark version
    assert(classOf[SupportsRowLevelOperations].isInterface)
    assert(classOf[RowLevelOperation].isInterface)
    val cmds = classOf[RowLevelOperation.Command].getEnumConstants
      .map(_.toString).toSet
    assert(cmds == Set("DELETE", "UPDATE", "MERGE"), cmds.toString)
    // the group-based rewrite rules this migration would ride exist
    Seq("org.apache.spark.sql.catalyst.analysis.RewriteDeleteFromTable",
      "org.apache.spark.sql.catalyst.analysis.RewriteUpdateTable",
      "org.apache.spark.sql.catalyst.analysis.RewriteMergeIntoTable")
      .foreach(n => assert(
        Class.forName(n + "$", false, getClass.getClassLoader) != null, n))
  }

  test("graft tables do not implement the interface: SQL DML rides GraftDmlRule") {
    val wh = tmpDir("rlop_wh")
    spark.conf.set("spark.sql.catalog.rlop", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.rlop.warehouse", wh)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS rlop.lake")
    spark.sql("CREATE TABLE rlop.lake.t (k BIGINT, v STRING)")
    spark.sql("INSERT INTO rlop.lake.t VALUES (1, 'a'), (2, 'b')")
    val t = IncrementalTable(spark, s"$wh/lake/t")
    // the capability pin: UPDATE/MERGE would hit Spark's rewrite
    // rules ONLY if this held — it doesn't, so the post-hoc rule is
    // the (intentional) path; if a migration ever lands, this assert
    // flips and the probe forces the doc above to be rewritten
    val loaded = spark.sessionState.catalogManager
      .catalog("rlop").asInstanceOf[GraftCatalog]
      .loadTable(org.apache.spark.sql.connector.catalog.Identifier.of(
        Array("lake"), "t"))
    assert(!loaded.isInstanceOf[SupportsRowLevelOperations])
    // ...and the verbs stay exact through the rule
    spark.sql("UPDATE rlop.lake.t SET v = 'A' WHERE k = 1")
    spark.sql("MERGE INTO rlop.lake.t t USING (SELECT 3L AS k, 'c' AS v) s " +
      "ON t.k = s.k WHEN MATCHED THEN UPDATE SET * " +
      "WHEN NOT MATCHED THEN INSERT *")
    assert(spark.sql("SELECT k, v FROM rlop.lake.t ORDER BY k")
      .as[(Long, String)].collect().toSeq ==
      Seq((1L, "A"), (2L, "b"), (3L, "c")))
  }

  test("the shim's two conversions hold their contracts") {
    import org.apache.spark.sql.graftshim.DmlShim
    // Expression -> Column: a resolved-literal expression round-trips
    val c = DmlShim.column(
      org.apache.spark.sql.catalyst.expressions.Literal(42))
    assert(Seq(1).toDF("x").select(c.as("y")).as[Int].head == 42)
    // LogicalPlan -> DataFrame: an analyzed plan materializes
    val plan = Seq((1, "a")).toDF("k", "v").queryExecution.analyzed
    assert(DmlShim.ofRows(spark, plan).count() == 1)
  }
}
