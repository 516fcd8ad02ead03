package graft.table

import org.apache.spark.sql.functions.{col, expr, lit}
import org.apache.spark.sql.types.StructType

import graft.SparkSpec

/** Pins the round-7 ADVICE fixes: null-keyed merge sources are legal,
  * a same-ALTER add-constraint-on-dropped-column is rejected, the
  * exists-lambda marker collision bails out of extraction, and
  * normalized-leaf-path collisions drop the index entry instead of
  * merging two physical leaves. */
class AdviceR7Spec extends SparkSpec {
  import spark.implicits._

  test("merge: two null-keyed source rows are legal NOT MATCHED inserts, not duplicates") {
    val t = IncrementalTable(spark, tmpDir("advr7") + "/t1")
    t.append(Seq((1L, "a")).toDF("id", "v"), Nil)
    // both rows have NULL keys: per SQL MERGE they match nothing and
    // insert; the duplicate-key guard must not reject them
    val src = Seq((Option.empty[Long], "x"), (Option.empty[Long], "y"))
      .toDF("id", "v")
    t.merge(src, keys = Seq("id"))
    assert(t.read().count() == 3)
    assert(t.read().filter($"id".isNull).count() == 2)
    // genuine duplicates on a NON-null key still fail
    intercept[IllegalArgumentException] {
      t.merge(Seq((5L, "x"), (5L, "y")).toDF("id", "v"), keys = Seq("id"))
    }
  }

  test("mergeInto: null-keyed source rows fire NOT MATCHED, dup guard ignores them") {
    val t = IncrementalTable(spark, tmpDir("advr7") + "/t2")
    t.append(Seq((1L, 10L)).toDF("id", "n"), Nil)
    val src = Seq((Option.empty[Long], 97L), (Option.empty[Long], 98L),
      (Some(1L), 99L)).toDF("id", "n")
    t.mergeInto(src, keys = Seq("id"),
      matched = Seq(IncrementalTable.WhenClause(None,
        Some(Seq("n" -> IncrementalTable.mergeSourceCol("n"))))),
      notMatched = Seq(IncrementalTable.WhenClause(None,
        Some(Seq("id" -> IncrementalTable.mergeSourceCol("id"),
          "n" -> IncrementalTable.mergeSourceCol("n"))))),
      notMatchedBySource = Nil)
    val rows = t.read().collect()
      .map(r => (if (r.isNullAt(0)) -1L else r.getLong(0)) -> r.getLong(1))
    assert(rows.toSet == Set(1L -> 99L, -1L -> 97L, -1L -> 98L))
  }

  test("alter: adding a CHECK referencing a column dropped in the same commit is rejected") {
    val t = IncrementalTable(spark, tmpDir("advr7") + "/t3")
    t.append(Seq((1L, 2L)).toDF("a", "b"), Nil)
    val e = intercept[IllegalArgumentException] {
      t.alter(drops = Seq("b"), addConstraints = Map("c1" -> "b > 0"))
    }
    assert(e.getMessage.contains("dropped in the same ALTER"), e.getMessage)
    // nothing half-applied: b is still there, no constraint recorded
    assert(t.schemaAt().get.fieldNames.contains("b"))
    assert(t.constraints.isEmpty)
    // the legal order still works: drop the column, constrain the other
    t.alter(drops = Seq("b"), addConstraints = Map("c2" -> "a > 0"))
    assert(t.constraints.keySet == Set("c2"))
  }

  test("data skipping: exists lambda over a real column named __graft_elem__ extracts nothing unsound") {
    val t = IncrementalTable(spark, tmpDir("advr7") + "/t4")
    // a table whose OUTER column is literally named __graft_elem__ and
    // an array column with tight element bounds
    val df = Seq((5L, Seq(100L)), (500L, Seq(1L)))
      .toDF("__graft_elem__", "arr").repartition(2, $"__graft_elem__")
    t.append(df, Nil, statsColumns = Seq("__graft_elem__", "arr.element"))
    // pre-fix: the outer column's `= 5` conjunct inside the lambda got
    // re-keyed onto arr.element after the marker substitution, merging
    // with `x >= 100` into an impossible [100,5] element range that
    // pruned the MATCHING file; post-fix extraction bails out entirely
    val out = t.readWhere(
      expr("exists(arr, x -> x >= 100 and __graft_elem__ = 5)"))
    assert(out.select($"__graft_elem__").as[Long].collect().toSeq == Seq(5L))
  }

  test("partition evolution is pinned: a data write with a different layout refuses") {
    val t = IncrementalTable(spark, tmpDir("advr7") + "/t6")
    t.append(Seq((1L, "a", "d1")).toDF("id", "v", "day"), Seq("day"))
    // different layout, reordered layout, and dropped layout all refuse
    Seq(Seq("v"), Seq("day", "v"), Nil).foreach { layout =>
      val e = intercept[IllegalArgumentException] {
        t.append(Seq((2L, "b", "d2")).toDF("id", "v", "day"), layout)
      }
      assert(e.getMessage.contains("partition layout is immutable"), e.getMessage)
    }
    // same layout still appends; meta-only commits stay exempt
    t.append(Seq((2L, "b", "d2")).toDF("id", "v", "day"), Seq("day"))
    t.commitMeta(Map("cursor/x" -> "1"))
    assert(t.read().count() == 2)
    // a full replace must keep the layout too
    val e2 = intercept[IllegalArgumentException] {
      t.replaceWhere(Seq((9L, "z", "d9")).toDF("id", "v", "day"), Nil,
        Map.empty, Map.empty)
    }
    assert(e2.getMessage.contains("partition layout is immutable"), e2.getMessage)
  }

  test("footer harvest: colliding normalized leaf paths drop the entry instead of merging") {
    val t = IncrementalTable(spark, tmpDir("advr7") + "/t5")
    // struct s { list: struct { element }, element }: the chain
    // s.list.element NORMALIZES onto the sibling's key s.element.
    // Pre-fix their ColStats merged and the null tallies ADDED —
    // s.list.element all-null (2 nulls) + s.element non-null (0) gave
    // nulls == rows, fabricating allNull and unsoundly pruning
    // `s.element IS NOT NULL` (ADVICE r7). Post-fix the colliding key
    // is dropped whole and the read stays exact.
    import org.apache.spark.sql.functions.struct
    val df = spark.range(1, 3).toDF("id")
      .withColumn("s", struct(
        struct(lit(null).cast("long").as("element")).as("list"),
        (col("id") * 10).as("element")))
      .repartition(1)
    t.append(df, Nil, statsColumns = Seq("s.element"))
    assert(t.readWhere(col("s.element").isNotNull).count() == 2)
    assert(t.readWhere(col("s.element") >= 10).count() == 2)
  }
}
