package graft

/** Pins the sketch twins of the exact aggregates (the 100 TB scale
  * paths) within tolerance of their oracle-green exact counterparts:
  *
  *  - q38 approx_percentile vs q34 exact percentile: Greenwald-Khanna at
  *    accuracy=10000 guarantees rank error <= n/(2*10000); on sf0.01
  *    orders (~15k rows over 5 groups) that is a sub-row rank bound, so
  *    the 0.5% value tolerance has wide margin while still catching a
  *    wrong-percentile or wrong-accuracy regression.
  *  - q44 approx_count_distinct vs exact COUNT(DISTINCT): HLL++ default
  *    rsd is 5%.
  */
class QuantilesSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.01"

  test("approx quantile twin stays within 0.5% of exact interpolated quantiles") {
    def byGroup(q: String): Map[String, (Double, Double)] =
      SparkEntry.queries(q)(spark, sf)
        .select($"o_orderpriority", $"median_price", $"p90_price")
        .as[(String, Double, Double)].collect()
        .map { case (g, m, p) => g -> (m, p) }.toMap

    val exact = byGroup("q34_quantiles")
    val approx = byGroup("q38_quantiles_approx")
    assert(exact.keySet == approx.keySet && exact.nonEmpty)
    exact.foreach { case (g, (em, ep)) =>
      val (am, ap) = approx(g)
      assert(math.abs(am - em) / em < 0.005, s"$g median: approx $am vs exact $em")
      assert(math.abs(ap - ep) / ep < 0.005, s"$g p90: approx $ap vs exact $ep")
    }
  }

  test("approx distinct count stays within 5% of exact per group") {
    import org.apache.spark.sql.functions._
    val approx = SparkEntry.queries("q44_cardinality_approx")(spark, sf)
      .select($"event_type", $"approx_users")
      .as[(String, Long)].collect().toMap
    val exact = Tables.events(spark, sf)
      .groupBy($"event_type")
      .agg(countDistinct($"user_id").as("users"))
      .as[(String, Long)].collect().toMap
    assert(approx.keySet == exact.keySet && approx.nonEmpty)
    exact.foreach { case (g, e) =>
      val a = approx(g)
      assert(math.abs(a - e).toDouble / e < 0.05, s"$g: approx $a vs exact $e")
    }
  }
}
