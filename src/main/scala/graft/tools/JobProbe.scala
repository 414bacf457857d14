package graft.tools

import java.util.concurrent.atomic.{AtomicInteger, AtomicLong}

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

/** Per-entry job/stage/task profile — the measurement VERDICT r17 item 3
  * asks for: the sf1 scale path speeds up only 1.38× from 4× cores, and
  * the hypothesis is serial stage count / per-entry fixed overheads, not
  * data work. For each named entry this prints
  *
  *   jobs, stages, tasks, sum-of-task-time, wall, par = taskTime/(wall·N)
  *
  * `par` ≈ 1 means the cores were busy the whole wall (data-bound);
  * `par` ≪ 1 means the entry is mostly scheduling/planning/driver gaps —
  * the serialization the round is hunting. Same-JVM, warmed session,
  * min-of-1 (the profile shape, not the seconds, is the signal).
  *
  * Usage: runMain graft.tools.JobProbe <dataDir> <name>[,name...]
  */
object JobProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val names = args(1).split(",").toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val jobs = new AtomicInteger
    val stages = new AtomicInteger
    val tasks = new AtomicInteger
    val taskNanos = new AtomicLong
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = { jobs.incrementAndGet(); () }
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit =
        { stages.incrementAndGet(); () }
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        tasks.incrementAndGet()
        if (t.taskMetrics != null) { taskNanos.addAndGet(t.taskMetrics.executorRunTime * 1000000L); () }
      }
    })
    // warm
    spark.range(1000000).selectExpr("sum(id)").collect()
    val catalogue = graft.SparkEntry.queries ++ graft.SparkEntry.benchOnly
    names.foreach { name =>
      spark.catalog.clearCache()
      Thread.sleep(200) // let listener drain the warm/prior events
      jobs.set(0); stages.set(0); tasks.set(0); taskNanos.set(0)
      val t0 = System.nanoTime()
      catalogue(name)(spark, dir).queryExecution.toRdd.count()
      val wall = (System.nanoTime() - t0) / 1e9
      Thread.sleep(300) // listener bus is async; let counters settle
      val tt = taskNanos.get / 1e9
      val par = tt / (wall * cpus.toDouble)
      println(f"[jobprobe] $name%-28s jobs=${jobs.get}%4d stages=${stages.get}%4d " +
        f"tasks=${tasks.get}%6d taskTime=$tt%8.2fs wall=$wall%7.2fs par=$par%5.2f")
    }
    spark.stop()
  }
}
