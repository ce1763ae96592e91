package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted}
import scala.util.control.NonFatal

/** Dev profiling tool (not part of the driver contract): splits each
  * catalog query's wall time into driver-side construction (the
  * `fn(spark, sfDir)` call — any driver-coordinated loops, counts,
  * collects run here), Catalyst phases (analysis/optimization/physical
  * planning of the FINAL frame, from QueryExecution's tracker) and
  * execution, and counts jobs/stages/tasks. At bench scale (sf0.1,
  * ~15 MB) per-query time is dominated by these fixed costs, not data —
  * this probe says which one to attack per query. Usage:
  *   sbt "runMain graft.PhaseProbe /root/testdata/sf0.1 [query...]"
  */
object PhaseProbe {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: PhaseProbe <sfDir> [queryName...]")
    val sfDir = args(0)
    val names = if (args.length > 1) args.drop(1).toSeq
      else SparkEntry.queries.keys.toSeq.sorted
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.builder(s"local[$cpus]", cpus).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val jobs = new java.util.concurrent.atomic.AtomicLong
    val stages = new java.util.concurrent.atomic.AtomicLong
    val tasks = new java.util.concurrent.atomic.AtomicLong
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = jobs.incrementAndGet()
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        stages.incrementAndGet(); tasks.addAndGet(s.stageInfo.numTasks.toLong)
      }
    })
    def drain(): Unit =
      try org.apache.spark.graftaccess.SparkAccess.drainListenerBus(spark.sparkContext)
      catch { case NonFatal(_) => () }

    // one untimed warmup pass (JIT/codegen), mirroring Bench
    names.foreach { n =>
      try SparkEntry.queries(n)(spark, sfDir).write.format("noop").mode("overwrite").save()
      catch { case NonFatal(_) => () }
    }
    println(f"${"query"}%-28s ${"total"}%7s ${"build"}%7s ${"plan"}%7s ${"exec"}%7s ${"jobs"}%5s ${"stg"}%5s ${"tasks"}%6s")
    names.foreach { n =>
      spark.catalog.clearCache()
      System.gc()
      drain(); jobs.set(0); stages.set(0); tasks.set(0)
      val t0 = System.nanoTime()
      try {
        val df = SparkEntry.queries(n)(spark, sfDir)
        val t1 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        val t2 = System.nanoTime()
        drain()
        val ph = df.queryExecution.tracker.phases
        val planNs = ph.values.map(p => p.endTimeMs - p.startTimeMs).sum * 1000000L
        println(f"$n%-28s ${(t2 - t0) / 1e9}%7.3f ${(t1 - t0) / 1e9}%7.3f ${planNs / 1e9}%7.3f ${(t2 - t1) / 1e9}%7.3f ${jobs.get}%5d ${stages.get}%5d ${tasks.get}%6d")
      } catch {
        case NonFatal(e) => println(f"$n%-28s FAILED ${e.getClass.getSimpleName}")
      }
    }
    spark.stop()
  }
}
