package graft

import org.apache.spark.sql.functions._

/** Throwaway profiling harness (not part of the library surface). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.builder("local[32]", "32").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.1"
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[scratch] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    import analytics.{Dedup, TextAnalysis}
    val probe = time("probe")(analytics.Par.spreadForCpu(docs)
      .select(explode(array_distinct(TextAnalysis.tokens(col("text")))).as("tok"))
      .distinct().limit(65).collect().map(_.getString(0)))
    println("[scratch] vocab=" + probe.length)
    val pairs = Dedup.bitsetJaccardPairs(docs)
    time("pairs noop 1")(pairs.write.format("noop").mode("overwrite").save())
    time("pairs noop 2")(pairs.write.format("noop").mode("overwrite").save())
    // receipt alone
    val tokset = analytics.Par.spreadForCpu(docs)
      .select(col("doc_id"), TextAnalysis.tokens(col("text")).as("ws"))
      .select(col("doc_id"), explode(array_distinct(col("ws"))).as("tok"))
    val rec = tokset.groupBy(col("tok")).agg(count(lit(1)).as("df"))
      .agg(expr("sum(df * (df - 1)) DIV 2").as("cand_full"))
      .crossJoin(analytics.Par.spreadForCpu(docs)
        .select(array_join(array_sort(array_distinct(
          TextAnalysis.tokens(col("text")))), " ").as("key"))
        .where(col("key") =!= "").distinct()
        .agg(count(lit(1)).as("m"))
        .select(expr("m * (m - 1) DIV 2").as("cand_eval")))
    time("receipt collect")(rec.collect())
    time("pairs+receipt noop")(pairs.crossJoin(broadcast(rec)).write.format("noop").mode("overwrite").save())
    time("pairs persist orderBy")({
      val p = pairs.persist()
      p.orderBy(col("doc_a"), col("doc_b")).write.format("noop").mode("overwrite").save()
      p.unpersist()
    })
    spark.stop()
  }
}
