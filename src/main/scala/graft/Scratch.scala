package graft

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Throwaway measurement harness for the optimization round. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.builder(s"local[$cpus]", cpus).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time(tag: String)(f: => Unit): Unit = {
      spark.catalog.clearCache(); System.gc()
      val t0 = System.nanoTime(); f
      println(f"$tag: ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val n = docs.count()
    def edges = docs.select(col("doc_id").as("src"),
        pmod(col("doc_id") * 7 + 13, lit(n)).as("dst"))
      .unionByName(docs.select(col("doc_id").as("src"),
        pmod(col("doc_id") * 31 + 7, lit(n)).as("dst")))

    for (i <- 1 to 3) time(s"g01_current.$i") {
      analytics.Graph.pageRank(edges, docs, iters = 10, idCol = "doc_id")
        .select(col("id").as("doc_id"), col("pr")).orderBy(col("doc_id"))
        .write.format("noop").mode("overwrite").save()
    }

    // variant: pre-partitioned persisted edge list + verts, partial-agg sums
    def prVariant(edges0: DataFrame, vertices: DataFrame, iters: Int): DataFrame = {
      val damping = 0.85
      val nv = vertices.count()
      val init: Column = round(lit(1.0) / lit(nv), 12)
      val base: Column = lit(1.0 - damping) / lit(nv)
      val shufP = spark.conf.get("spark.sql.shuffle.partitions").toInt
      val e = edges0.select(col("src"), col("dst"))
        .repartition(shufP, col("src"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val outDeg = e.groupBy(col("src")).agg(count(lit(1)).as("deg"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val verts = vertices.select(col("doc_id").as("id"))
        .repartition(shufP, col("id"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      var pr = verts.select(col("id"), init.as("pr"))
        .localCheckpoint(eager = false)
      for (_ <- 1 to iters) {
        val contrib = e
          .join(pr.withColumnRenamed("id", "src"), Seq("src"))
          .join(outDeg, Seq("src"))
          .select(col("dst").as("id"), col("src"),
            round(col("pr") / col("deg"), 15).as("c"))
        val sums = contrib
          .groupBy(col("id"))
          .agg(collect_list(struct(col("src"), col("c"))).as("cs"))
          .select(col("id"),
            aggregate(transform(array_sort(col("cs")), x => x.getField("c")),
              lit(0.0), (a, b) => a + b).as("s"))
        pr = verts
          .join(sums, Seq("id"), "left")
          .select(col("id"),
            round(base + lit(damping) * coalesce(col("s"), lit(0.0)), 12).as("pr"))
          .localCheckpoint(eager = false)
      }
      pr.count()
      e.unpersist(blocking = false); outDeg.unpersist(blocking = false)
      verts.unpersist(blocking = false)
      pr
    }
    for (i <- 1 to 3) time(s"g01_partitioned.$i") {
      prVariant(edges, docs, 10)
        .select(col("id").as("doc_id"), col("pr")).orderBy(col("doc_id"))
        .write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}
