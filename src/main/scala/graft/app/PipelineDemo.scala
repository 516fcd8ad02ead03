package graft.app

import java.nio.file.{Files, Paths, StandardCopyOption}
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.SparkSession

/** Runnable end-to-end demo of the incremental pipeline: copies the
  * reference fixture corpus into a scratch dir, runs sensor ticks and
  * materializations, prints the resulting tables. Usage:
  *   sbt 'runMain graft.app.PipelineDemo [workDir]'
  */
object PipelineDemo {
  def main(args: Array[String]): Unit = {
    val work = Paths.get(args.headOption.getOrElse(
      Files.createTempDirectory("graft-demo").toString))
    val spark = SparkSession.builder()
      .master("local[4]")
      .appName("graft-pipeline-demo")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val ingest = work.resolve("files_to_ingest")
    val src = Paths.get("/root/reference/files_to_ingest")
    Files.walk(src).iterator().asScala.filter(_.toString.endsWith(".txt")).foreach { p =>
      val rel = src.relativize(p)
      val dst = ingest.resolve(rel)
      Files.createDirectories(dst.getParent)
      Files.copy(p, dst, StandardCopyOption.REPLACE_EXISTING)
    }

    val pipe = new Pipeline(spark, ingest.toString, work.resolve("tables").toString)
    val days = pipe.tickAndIngest(scanAllDays = true)
    println(s"[demo] sensor dispatched days: ${days.mkString(", ")}")
    days.foreach(pipe.runAll(_))

    println("[demo] processed:")
    pipe.processed.read().orderBy("day", "filename").show(5, truncate = false)
    println(s"[demo] processed rows: ${pipe.processed.read().count()}")
    println("[demo] backwards:")
    pipe.backwards.read().orderBy("day", "filename").show(5, truncate = false)
    days.foreach { d =>
      println(s"[demo] watermark $d: ${pipe.processed.latestMeta(s"watermark/$d")}")
    }

    // an idle tick dispatches nothing
    val idle = pipe.tickAndIngest(scanAllDays = true)
    println(s"[demo] idle tick dispatched: ${idle.size} days")

    // live arrivals: the G1 generator drops files (rate limit off for the
    // demo); the next tick picks up exactly those
    val gen = new graft.ingest.Generator(ingest.toString, baseIntervalMillis = 0)
    val day = java.time.LocalDate.parse("2024-03-30")
    gen.drop(3, day)
    val live = pipe.tickAndIngest(now = day, scanAllDays = true)
    println(s"[demo] generator tick dispatched days: ${live.mkString(", ")}")
    live.foreach(pipe.runAll(_))
    println(s"[demo] processed rows now: ${pipe.processed.read().count()}")
    spark.stop()
  }
}
