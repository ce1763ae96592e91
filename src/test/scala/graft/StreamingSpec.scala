package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.streaming.Stream

/** H2/H4/H5 — the Structured Streaming driver: a file-source micro-batch
  * through the full NEF pipeline into a collected Kafka-shaped batch, with
  * a checkpoint directory; and the streaming dropDuplicates form of the
  * discovered-fields accumulation.
  */
class StreamingSpec extends SparkSpec {

  private val FixedNow = 1700000000L

  private def tempDir(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  test("file source → foreachBatch pipeline → one Kafka array per notifId, checkpointed") {
    val srcDir = tempDir("graft-stream-src")
    val ckptDir = tempDir("graft-stream-ckpt")
    Files.write(java.nio.file.Paths.get(srcDir, "batch0.jsonl"),
      (Seq(Fixtures.perfDataPayload, Fixtures.ueCommPayload,
        Fixtures.unknownNotifPayload).mkString("\n") + "\n").getBytes("UTF-8"))

    val collected = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    val q = Stream.runIngest(
      raw = Stream.fileSource(spark, srcDir),
      subscriptions = Fixtures.subscriptions(spark),
      checkpointDir = ckptDir,
      sendBatch = (batch: DataFrame, _: Long) => {
        collected ++= batch.collect().map(r =>
          (r.getAs[String]("key"), r.getAs[String]("value")))
      },
      now = Some(lit(FixedNow)))
    q.awaitTermination(60000)

    assert(collected.size === 1, s"expected ONE Kafka message, got $collected")
    val (key, value) = collected.head
    assert(key === Fixtures.NotifId)
    assert(value.contains("\"thrputUl_mbps\":11.74"))
    assert(value.contains("\"event\":\"UE_COMM\""))
    assert(!value.contains("unknown")) // 403 path contributes nothing
    // checkpoint exists and records the committed batch (H5 at-least-once)
    assert(new java.io.File(ckptDir, "commits").list().nonEmpty)
  }

  test("streaming discovered-fields: dropDuplicates state across micro-batches (H4)") {
    val srcDir = tempDir("graft-fields-src")
    val ckptDir = tempDir("graft-fields-ckpt")
    Files.write(java.nio.file.Paths.get(srcDir, "b0.jsonl"),
      (Fixtures.perfDataPayload + "\n").getBytes("UTF-8"))

    // foreachBatch sink: supports checkpoint recovery (the memory sink does
    // not), so the second run resumes the SAME dedup state.
    val collected = scala.collection.mutable.ArrayBuffer.empty[String]
    def run(): Unit = {
      val q = Stream.discoveredFieldsStream(
        Stream.envelopeStream(Stream.fileSource(spark, srcDir), Fixtures.subscriptions(spark)))
        .writeStream
        .option("checkpointLocation", ckptDir)
        .outputMode("append")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .foreachBatch { (batch: DataFrame, _: Long) =>
          collected ++= batch.collect().map(_.getAs[String]("field"))
          ()
        }
        .start()
      q.awaitTermination(60000)
    }

    run()
    assert(collected.sorted.toSeq ===
      Seq("pdb_ms", "plr_per_thousand", "thrputDl_mbps", "thrputUl_mbps"))

    // second micro-batch: a UE_COMM notification discovers only "comms";
    // previously-seen fields are suppressed by the checkpointed state (H4)
    collected.clear()
    Files.write(java.nio.file.Paths.get(srcDir, "b1.jsonl"),
      (Fixtures.ueCommPayload + "\n").getBytes("UTF-8"))
    run()
    assert(collected.toSeq === Seq("comms"))
  }
}
