package graft

import java.util.concurrent.atomic.LongAdder

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

/** Shuffle-volume receipts: total shuffle bytes/records WRITTEN by every
  * task while a block of work runs. Wall time cannot see a plan
  * regression that GC or host noise hides — the r13 q96 40× row fan-out
  * cost only ~7 s of wall at sf0.1 but wrote 40× the shuffle rows; a
  * byte receipt catches the next one as a diff in BENCH_DETAIL, not a
  * wall-clock surprise at 100×. Write-side metrics are the right signal:
  * each Exchange writes exactly once (reads can repeat under reuse), so
  * the total is the volume the plan actually shuffles.
  *
  * Accumulation is a [[ShuffleTally]] SparkListener over task-end
  * metrics; the listener bus is asynchronous, so both the reset and the
  * read sit behind a bus drain (SparkAccess.drainListenerBus) — without
  * the barrier the tally races event delivery and undercounts.
  */
final class ShuffleTally extends SparkListener {
  private val bytes = new LongAdder
  private val records = new LongAdder

  override def onTaskEnd(e: SparkListenerTaskEnd): Unit = {
    val m = e.taskMetrics
    if (m != null) {
      bytes.add(m.shuffleWriteMetrics.bytesWritten)
      records.add(m.shuffleWriteMetrics.recordsWritten)
    }
  }

  def reset(): Unit = { bytes.reset(); records.reset() }
  def shuffleBytes: Long = bytes.sum()
  def shuffleRecords: Long = records.sum()
}

object ShuffleReceipt {

  /** Run `body` and return (shuffleBytesWritten, shuffleRecordsWritten)
    * across every job it triggered. Registers a fresh tally, drains the
    * bus before resetting (stale events from earlier work must not leak
    * in) and after the body (late events must not leak out).
    */
  def measure(spark: SparkSession)(body: => Unit): (Long, Long) = {
    val sc = spark.sparkContext
    val tally = new ShuffleTally
    sc.addSparkListener(tally)
    try {
      org.apache.spark.graftaccess.SparkAccess.drainListenerBus(sc)
      tally.reset()
      body
      org.apache.spark.graftaccess.SparkAccess.drainListenerBus(sc)
      (tally.shuffleBytes, tally.shuffleRecords)
    } finally sc.removeSparkListener(tally)
  }
}
