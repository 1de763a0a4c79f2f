package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerJobEnd, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Dev-only job/stage profiler: runs one registered query twice (warm)
  * and prints every Spark job of the SECOND run with its wall time and
  * stage/task counts — for attributing a query's constant overhead to
  * eager bounds jobs vs the main action. Not part of any gate. */
object Prof {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config(graft.Tables.nanosConf, "true")
      .config("spark.ui.enabled", "false")
      // deterministic codegen-cache keys across AQE stage-number jitter
      // (see Bench.scala) — cuts warm-run Janino recompile storms
      .config("spark.sql.codegen.useIdInClassName", "false")
      .config("spark.sql.codegen.cache.maxEntries", "2000")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val fn = graft.SparkEntry.queries(name)
    fn(spark, dir).write.format("noop").mode("overwrite").save() // warm
    spark.catalog.clearCache()
    val jobs = new java.util.concurrent.ConcurrentHashMap[Int, (String, Long)]()
    val jobEnd = new java.util.concurrent.ConcurrentHashMap[Int, Long]()
    val stages = new java.util.concurrent.atomic.AtomicInteger(0)
    val tasks = new java.util.concurrent.atomic.AtomicInteger(0)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit =
        jobs.put(j.jobId, (Option(j.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description")))
          .getOrElse("?").take(90), j.time))
      override def onJobEnd(j: SparkListenerJobEnd): Unit =
        jobEnd.put(j.jobId, j.time)
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        stages.incrementAndGet()
        tasks.addAndGet(s.stageInfo.numTasks)
      }
    })
    val t0 = System.nanoTime()
    fn(spark, dir).write.format("noop").mode("overwrite").save()
    val wall = (System.nanoTime() - t0) / 1e9
    Thread.sleep(500)
    println(f"TOTAL $name%s wall=$wall%.3f s, jobs=${jobs.size}%d, stages=${stages.get}%d, tasks=${tasks.get}%d")
    import scala.jdk.CollectionConverters._
    jobs.asScala.toSeq.sortBy(_._1).foreach { case (id, (desc, st)) =>
      val en = jobEnd.getOrDefault(id, st)
      println(f"  job $id%3d ${(en - st) / 1e3}%7.3f s  $desc%s")
    }
    spark.stop()
  }
}
