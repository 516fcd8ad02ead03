package graft

/** Pins q38 (approx_percentile sketch — the 100 TB quantile path) within
  * tolerance of q34 (exact interpolated percentile, DuckDB-oracle-green).
  * Greenwald-Khanna at accuracy=10000 guarantees rank error
  * <= n/(2*10000); on sf0.01 orders (~15k rows over 5 groups) that is a
  * sub-row rank bound, so the 0.5% value tolerance has wide margin while
  * still catching a wrong-percentile or wrong-accuracy regression.
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
}
