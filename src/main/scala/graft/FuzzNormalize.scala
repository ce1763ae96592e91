package graft

import org.apache.spark.sql.functions._

/** Engine side of the differential fuzz gate (tools/fuzz_normalizers.py):
  * read the seeded NEF payload corpus (one JSON document per line, gzip ok),
  * run the FULL ingest data plane — parse → broadcast enrich → fused
  * normalize → tag filter (reference receiver.py:354–458) — with a fixed
  * now-fallback clock, and dump one JSON envelope per record for the
  * harness's canonical compare against the reference's own Python
  * normalizers.
  */
object FuzzNormalize {
  def main(args: Array[String]): Unit = {
    require(args.length == 4,
      "usage: FuzzNormalize <payloadsJsonl[.gz]> <subsJsonl> <outDir> <fixedNowEpoch>")
    val Array(payloadsPath, subsPath, outDir, nowStr) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = GraftSession.builder(s"local[$cpus]", cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val raw = spark.read.text(payloadsPath).toDF("value")
    val subs = spark.read.schema(schemas.NefSchemas.subscription).json(subsPath)
    val env = Ingest.envelopes(Ingest.parseNotifications(raw), subs,
      now = lit(nowStr.toLong))
    // to_json drops null fields (C8 absent-vs-null); the harness
    // canonicalizer folds trajectory/comms back into `metrics` and
    // re-nulls absent entry keys before comparing
    env.select(to_json(struct(col("notifId"), col("timestamp"), col("event"),
        col("tags"), col("metrics"), col("trajectory"), col("comms"))).as("value"))
      .coalesce(1).write.mode("overwrite").text(outDir)
    spark.stop()
  }
}
