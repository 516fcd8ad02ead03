package graft

import scala.collection.mutable

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Per-JOB profile of one query (guide §1): multi-commit pipeline
  * queries spend their time across MANY Spark jobs (stage writes,
  * footer harvests, maintenance merges) that a single final-plan
  * explain never shows. This main runs one query end-to-end (after an
  * untimed warmup run) and prints every job's wall time, task count
  * and call site, so the expensive LEG of a pipeline is attributable.
  *
  * Usage: runMain graft.QueryProfile <q1,q2,...> [sfDir]
  * Env: SPARK_GRAFT_CPUS (default 32).
  */
object QueryProfile {
  def main(args: Array[String]): Unit = {
    val qnames = args.headOption.getOrElse(
      sys.error("usage: QueryProfile <q1,q2,...> [sfDir]"))
      .split(",").map(_.trim).filter(_.nonEmpty).toSeq
    val sfDir = args.lift(1).getOrElse(
      sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // fork-free local-fs chmod (see graft.fs.NioLocalFileSystem)
      .config("spark.hadoop.fs.file.impl", "graft.fs.NioLocalFileSystem")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    case class Job(id: Int, start: Long, var end: Long = 0L,
      var site: String = "", var tasks: Int = 0, var stages: Int = 0)
    val jobs = mutable.LinkedHashMap[Int, Job]()
    val lock = new Object
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = lock.synchronized {
        val job = Job(j.jobId, j.time)
        job.site = Option(j.properties)
          .flatMap(p => Option(p.getProperty("callSite.short"))).getOrElse("?")
        jobs(j.jobId) = job
      }
      override def onJobEnd(j: SparkListenerJobEnd): Unit = lock.synchronized {
        jobs.get(j.jobId).foreach(_.end = j.time)
      }
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit =
        lock.synchronized {
          // attribute to the job holding this stage (jobs are sequential
          // here, so latest open job is the owner)
          jobs.values.lastOption.foreach { job =>
            job.stages += 1
            job.tasks += s.stageInfo.numTasks
          }
        }
    })

    qnames.foreach { qname =>
      val fn = SparkEntry.queries.getOrElse(qname,
        sys.error(s"unknown query $qname"))
      // warmup (untimed): JIT, codegen cache, parquet footer cache
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      lock.synchronized(jobs.clear())

      val t0 = System.nanoTime()
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      val wall = (System.nanoTime() - t0) / 1e9
      Thread.sleep(300) // listener bus drain
      lock.synchronized {
        val rows = jobs.values.toSeq
        val jsum = rows.map(j => (j.end - j.start).max(0L)).sum / 1e3
        println(f"[profile] $qname wall=$wall%.3f s, jobs=${rows.size}, job-sum=$jsum%.3f s (gap=driver/protocol time)")
        rows.foreach { j =>
          val ms = (j.end - j.start).max(0L)
          println(f"[profile]   job=${j.id}%3d ${ms}%6d ms stages=${j.stages}%2d tasks=${j.tasks}%4d  ${j.site}")
        }
      }
    }
    spark.stop()
  }
}
