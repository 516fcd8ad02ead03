package graft.table

import graft.SparkSpec
import org.apache.spark.sql.functions.col

/** RESTORE (rollback-as-commit) and CHECK constraints. */
class RestoreConstraintSpec extends SparkSpec {
  import spark.implicits._

  private def ids(t: IncrementalTable): Set[Long] =
    t.read().select("id").as[Long].collect().toSet

  test("restore rolls the live set back as one forward commit") {
    val t = IncrementalTable(spark, tmpDir("restore") + "/t1")
    t.append((1L to 10L).map(i => (i, s"n_$i")).toDF("id", "name"), Nil) // v0
    t.append((11L to 20L).map(i => (i, s"n_$i")).toDF("id", "name"), Nil) // v1
    t.delete($"id" <= 5) // v2: copy-on-write rewrite
    assert(ids(t) == (6L to 20L).toSet)

    val r = t.restore(0).get
    assert(r.action == "replace")
    assert(ids(t) == (1L to 10L).toSet)
    // the undone versions stay reachable — history moved forward
    assert(t.readAt(2).select("id").as[Long].collect().toSet == (6L to 20L).toSet)
    assert(t.latestMeta("restored_from").contains("0"))
    // already at v0's state: no-op
    assert(t.restore(0).isEmpty)
    // normal writes continue after a restore
    t.append(Seq((100L, "x")).toDF("id", "name"), Nil)
    assert(ids(t) == ((1L to 10L) ++ Seq(100L)).toSet)
  }

  test("restore reinstates deletion-vector state in both directions") {
    val t = IncrementalTable(spark, tmpDir("restore") + "/t2")
    t.append((1L to 100L).map(i => (i, s"n_$i")).toDF("id", "name"), Nil) // v0
    val dv = t.deleteVectorized($"id" > 50).get // v1
    t.compact() // v2: materializes, drops the vectors
    assert(t.liveDv().isEmpty)

    // back to the dv version: same files as v0 PLUS the vector in force
    t.restore(dv.version)
    assert(ids(t) == (1L to 50L).toSet)
    assert(t.liveDv().nonEmpty)

    // back to v0: vector cleared, all rows visible again
    t.restore(0)
    assert(ids(t) == (1L to 100L).toSet)
    assert(t.liveDv().isEmpty)
  }

  test("CHECK constraints: writes enforce per row inside the write scan") {
    val t = IncrementalTable(spark, tmpDir("constraint") + "/t3")
    t.append(Seq((1L, 10L), (2L, 20L)).toDF("id", "amount"), Nil)
    t.addConstraint("positive_amount", "amount > 0")
    assert(t.constraints == Map("positive_amount" -> "amount > 0"))

    // violating write fails BEFORE any commit publishes
    val before = t.latestVersion
    val e = intercept[Exception] {
      t.append(Seq((3L, -5L)).toDF("id", "amount"), Nil)
    }
    val chain = Iterator.iterate[Throwable](e)(_.getCause)
      .takeWhile(_ != null).map(x => Option(x.getMessage).getOrElse(""))
      .mkString(" | ")
    assert(chain.contains("positive_amount"))
    t.refresh()
    assert(t.latestVersion == before) // nothing committed
    assert(t.read().count() == 2)

    // passing write commits; SQL semantics: NULL check results pass
    t.append(Seq((4L, 40L)).toDF("id", "amount"), Nil)
    t.append(Seq((5L, Option.empty[Long])).toDF("id", "amount"), Nil)
    assert(t.read().count() == 4)

    // adding a constraint existing rows violate is rejected
    intercept[IllegalArgumentException] {
      t.addConstraint("small_id", "id < 3")
    }

    // dropped constraints stop enforcing
    t.dropConstraint("positive_amount")
    t.append(Seq((6L, -1L)).toDF("id", "amount"), Nil)
    assert(t.read().count() == 5)
  }

  test("NOT NULL as a CHECK constraint, surviving checkpoint compaction") {
    val t = new IncrementalTable(spark, tmpDir("constraint") + "/t4",
      checkpointEvery = 2)
    t.append(Seq((1L, "a")).toDF("id", "name"), Nil) // v0
    t.addConstraint("name_not_null", "name IS NOT NULL") // v1
    t.append(Seq((2L, "b")).toDF("id", "name"), Nil) // v2 -> checkpoint
    t.append(Seq((3L, "c")).toDF("id", "name"), Nil) // v3
    val t2 = IncrementalTable(spark, t.root)
    assert(t2.commits().head.action == "checkpoint")
    assert(t2.constraints == Map("name_not_null" -> "name IS NOT NULL"))
    intercept[Exception] {
      t2.append(Seq((4L, Option.empty[String])).toDF("id", "name"), Nil)
    }
    t2.refresh()
    assert(t2.read().count() == 3)
  }
}
