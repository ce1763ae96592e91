package graft

import org.apache.spark.sql.functions._

/** Synthetic sf1-equivalent scale smoke for the heavy dedup/curation path.
  *
  * The driver's testdata tops out at sf0.1 (5k documents), an order of
  * magnitude below where the heavy operators' scale behavior becomes
  * visible. This main replicates sf0.1 `SPARK_GRAFT_SCALE_FACTOR`×
  * (default 10 → 50k docs, "sf1-equivalent") into a temp parquet corpus,
  * then times the heaviest catalog queries against it:
  *
  *  - replica 0 keeps the original text (the survivor the dedup queries
  *    should elect);
  *  - odd replicas are byte-identical copies — exact-dedup pressure:
  *    every fingerprint group grows to ~factor/2 members;
  *  - even replicas append a replica-tag token — near-dup pressure: the
  *    shingle/minhash path sees factor/2-sized near-dup families, so
  *    cluster resolution (d07/d12) runs on a corpus that is ~90%
  *    duplicates, the shape of a real crawl snapshot.
  *
  * PERF EVIDENCE ONLY — results are not correctness-gated (the DuckDB
  * oracles run on driver-provided testdata); the correctness claim for
  * these operators is their green sf0.01 gate rows. Output: one markdown
  * table row per query (seconds, output rows) for README §scale.
  */
object ScaleSmoke {
  private val HeavyQueries = Seq(
    "d03_ngram_jaccard", "d04_minhash_lsh", "d07_dedup_clusters",
    "d12_dedup_clusters_approx", "q38_curation_pipeline")

  def main(args: Array[String]): Unit = {
    val factor = sys.env.getOrElse("SPARK_GRAFT_SCALE_FACTOR", "10").toInt
    require(factor >= 1, s"SPARK_GRAFT_SCALE_FACTOR must be >= 1, got $factor")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val base = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val scaleDir = s"/tmp/graft_scale_x$factor"
    val spark = GraftSession.builder(s"local[$cpus]", cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val docs = spark.read.parquet(s"$base/documents.parquet")
    val nBase = docs.count()
    val scaledText = when(col("repl") % 2 === 0, col("text"))
      .otherwise(concat(col("text"), lit(" rep"), col("repl")))
    docs
      .withColumn("repl", explode(sequence(lit(0), lit(factor - 1))))
      .select(
        (col("doc_id") * factor + col("repl")).as("doc_id"),
        scaledText.as("text"),
        col("lang"), col("source"),
        length(scaledText).cast("long").as("n_chars"))
      // spread the replicated corpus across real partitions so the scan
      // parallelism matches what a factor×-larger input would provide
      .repartition(spark.sparkContext.defaultParallelism)
      .write.mode("overwrite").parquet(s"$scaleDir/documents.parquet")

    println(s"## ScaleSmoke: sf0.1 × $factor = ${nBase * factor} docs ($scaleDir)")
    println(s"| query | seconds | note |")
    println(s"|---|---|---|")
    HeavyQueries.foreach { name =>
      val fn = SparkEntry.queries(name)
      spark.catalog.clearCache()
      System.gc()
      val t0 = System.nanoTime()
      fn(spark, scaleDir).write.format("noop").mode("overwrite").save()
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"| $name | $sec%.1f | ${nBase * factor} docs, ~90%% duplicates |")
    }
    spark.stop()
  }
}
