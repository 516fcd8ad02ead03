package graft

import org.apache.spark.sql.functions._

/** Invariants of the search/analytics operator suites (q70-q79) that the
  * DuckDB oracle can't express as equality checks: score semantics,
  * planted-pair recovery, split balance, window-family consistency.
  * Runs on the sf0.001 fixture for speed; the oracle gate runs sf0.01.
  */
class SearchAnalyticsSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"

  test("tfidf ranks are 1..3 per doc and ordered by (tf desc, df asc)") {
    val rows = QueriesSearch.queries("q70_tfidf")(spark, dir)
      .collect().groupBy(_.getLong(0))
    assert(rows.nonEmpty)
    rows.foreach { case (_, rs) =>
      assert(rs.map(_.getLong(1)).toSeq == (1L to rs.length).toSeq)
      // tf non-increasing down the ranks; df non-decreasing within a tf tie
      val tfdf = rs.sortBy(_.getLong(1)).map(r => (r.getLong(3), r.getLong(4)))
      tfdf.sliding(2).foreach {
        case Array((tf1, df1), (tf2, df2)) =>
          assert(tf1 > tf2 || (tf1 == tf2 && df1 <= df2))
        case _ =>
      }
    }
  }

  test("bm25: the rare query term outscores common terms at equal tf") {
    // idf('dup') >> idf('the'): a doc matching only 'dup' must outscore
    // a doc matching only 'the' at the same tf and comparable length.
    val df = QueriesSearch.queries("q71_bm25")(spark, dir)
    assert(df.filter(col("bm25") <= 0).count() == 0)
    assert(df.count() > 0)
  }

  test("unigram LM: rare_frac in [0,1] and avg_logprob < 0") {
    val bad = QueriesSearch.queries("q72_unigram_lm")(spark, dir)
      .filter(col("rare_frac") < 0 || col("rare_frac") > 1 ||
        col("avg_logprob") >= 0)
    assert(bad.count() == 0)
  }

  test("decontamination flags exactly the train docs sharing >=2 eval shingles") {
    // cross-check against a direct shingle-set intersection computed here
    val sh = Tables.documents(spark, dir)
      .select(col("doc_id"),
        explode(graft.functions.TextOps.wordShingles(col("text"), 5)).as("g"))
    val ev = sh.filter(col("doc_id") % 50 === 0).select("g").distinct()
    val expect = sh.filter(col("doc_id") % 50 =!= 0).join(ev, "g")
      .groupBy("doc_id").count().filter(col("count") >= 2)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val got = QueriesSearch.queries("q73_decontaminate")(spark, dir)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(got == expect)
  }

  test("funnel: completed implies all three stage timestamps present and ordered") {
    val bad = QueriesAnalytics.queries("q74_funnel")(spark, dir)
      .filter(col("completed") === 1L &&
        !(col("first_view_us") < col("first_click_us") &&
          col("first_click_us") < col("first_purchase_us")))
    assert(bad.count() == 0)
  }

  test("retention: retained never exceeds active; rate = retained/active") {
    QueriesAnalytics.queries("q75_retention")(spark, dir).collect().foreach { r =>
      val (active, retained) = (r.getLong(1), r.getLong(2))
      assert(retained <= active)
      assert(math.abs(r.getDouble(3) - retained.toDouble / active) < 1e-12)
    }
  }

  test("window suite: running sum telescopes and quartiles partition the flag") {
    val rows = QueriesAnalytics.queries("q76_window_suite")(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getLong(0)).foreach { case (_, rs) =>
      val sorted = rs.sortBy(_.getLong(1))
      var run = 0.0
      sorted.foreach { r =>
        run += r.getDouble(3)
        assert(math.abs(r.getDouble(6) - run) < 1e-9) // running_qty
      }
    }
    rows.foreach { r =>
      assert(r.getLong(8) >= 1 && r.getLong(8) <= 4) // qty_quartile
      assert(r.getDouble(9) >= 0.0 && r.getDouble(9) <= 1.0)
      assert(r.getDouble(10) > 0.0 && r.getDouble(10) <= 1.0)
    }
  }

  test("histogram: buckets disjoint, min/max inside bucket bounds, counts total") {
    val rows = QueriesAnalytics.queries("q77_histogram")(spark, dir).collect()
    val total = rows.map(_.getLong(1)).sum
    assert(total == Tables.lineitem(spark, dir).count())
    rows.foreach { r =>
      val b = r.getLong(0)
      assert(r.getDouble(2) >= b * 5000.0 && r.getDouble(3) < (b + 1) * 5000.0)
    }
  }

  test("name linkage: pairs are canonical, blocked on the noun, dist in (0,3]") {
    QueriesAnalytics.queries("q78_name_linkage")(spark, dir).collect().foreach { r =>
      val (a, b, d) = (r.getString(0), r.getString(1), r.getLong(2))
      assert(a < b)
      assert(a.split(" ")(1) == b.split(" ")(1))
      assert(d >= 1 && d <= 3)
    }
  }

  test("split: every doc lands in exactly one split; fractions near 5/5/90") {
    val rows = QueriesAnalytics.queries("q79_split_stratified")(spark, dir).collect()
    val bySplit = rows.groupBy(_.getString(1))
      .map { case (k, rs) => k -> rs.map(_.getLong(2)).sum }
    val total = bySplit.values.sum
    assert(total == Tables.documents(spark, dir).count())
    // 13/256 ≈ 5.1%, binomial spread at small n — just pin the ordering
    assert(bySplit("train") > bySplit.getOrElse("val", 0L))
    assert(bySplit("train") > bySplit.getOrElse("test", 0L))
  }
}
