package graft

import org.apache.spark.sql.SparkSession

import graft.table.IncrementalTable

/** Commit-latency audit main (VERDICT r12 #3 — the data-plane twin of
  * the r12 metadata-scale audit): measure ONE append commit's phase
  * breakdown at the bench SF, for the commit-protocol-dominated bench
  * rows (q164/q103/q138 run 4-8 commits each). Phases come from the
  * write choke point's own marks ([[IncrementalTable.lastWriteTiming]]):
  * stage (the Spark parquet job, input compute included), harvest
  * (footer stats pass), promote (renames), publish (OCC
  * read-check-publish + meta fold). A metadata-only `commitMeta` loop
  * is measured alongside as the pure OCC/fsync floor — the latency a
  * zero-row commit cannot go below on this filesystem. Prints one
  * summary line per phase (median over the appends). */
object CommitLatency {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse(
      sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import org.apache.spark.sql.functions._
    import spark.implicits._

    val tmp = QueryTmp.dir("graft_commitlat_")
    val t = IncrementalTable(spark, s"$tmp/t/v1")
    // the q164/q103 commit shape: a per-chunk slice of events with the
    // usual derived columns, statsColumns exercising the harvest
    val src = Tables.events(spark, sfDir).select(
      date_format($"ts", "yyyy-MM-dd").as("day"), $"event_type",
      get_json_object($"props", "$.k").cast("long").as("k"),
      $"value", $"event_id").cache()
    src.count() // materialize once — appends then measure commit cost,
                // not repeated json parsing of the source
    val chunks = 8
    val timings = (0 until chunks).flatMap { i =>
      t.append(src.filter($"event_id" % chunks === i).drop("event_id"),
        Nil, statsColumns = Seq("k", "day"))
      t.lastWriteTiming
    }
    def medianL(xs: Seq[Long]): Long = {
      val s = xs.sorted; s(s.size / 2)
    }
    println(f"[commitlat] appends=${timings.size} files/commit=${
      medianL(timings.map(_.files.toLong))}")
    println(f"[commitlat] stage_ms=${medianL(timings.map(_.stageMs))} " +
      f"harvest_ms=${medianL(timings.map(_.harvestMs))} " +
      f"promote_ms=${medianL(timings.map(_.promoteMs))} " +
      f"publish_ms=${medianL(timings.map(_.publishMs))} " +
      f"total_ms=${medianL(timings.map(_.totalMs))}")
    // the pure OCC floor: metadata-only commits (no stage, no files)
    val metaMs = (0 until 9).map { i =>
      val t0 = System.nanoTime()
      t.commitMeta(Map(s"probe/run" -> i.toString))
      (System.nanoTime() - t0) / 1000000
    }
    println(s"[commitlat] meta_commit_ms=${medianL(metaMs)} " +
      s"(pure OCC read-check-publish floor, ${metaMs.size} samples)")
    spark.stop()
  }
}
