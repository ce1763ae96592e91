package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

/** A7 — file-format scans beyond parquet: CSV, JSON-lines, and ORC
  * round-trips of a testdata sample through `spark.read`/`write`, proving
  * schema fidelity and pushdown-capable scans for each format.
  */
class FormatsSpec extends SparkSpec {

  private lazy val sample = spark.read
    .parquet("/root/testdata/sf0.001/lineitem.parquet")
    .select("l_orderkey", "l_linenumber", "l_quantity", "l_shipdate", "l_returnflag")
    .orderBy("l_orderkey", "l_linenumber")
    .limit(1000)

  private def roundTrip(format: String, extraRead: Map[String, String] = Map.empty): Unit = {
    val dir = Files.createTempDirectory(s"graft-$format").toString + "/data"
    sample.write.format(format).option("header", "true").save(dir)
    val back = spark.read.format(format)
      .options(extraRead)
      .schema(sample.schema) // declared schema — no sampling-inference drift
      .load(dir)
    assert(back.count() === sample.count(), s"$format row count")
    val a = sample.orderBy("l_orderkey", "l_linenumber").collect()
    val b = back.orderBy("l_orderkey", "l_linenumber").collect()
    a.zip(b).foreach { case (x, y) => assert(x === y, s"$format row mismatch") }
    // predicate + projection survive the format scan
    val filtered = back.where(col("l_quantity") < 10).select("l_orderkey", "l_quantity")
    val expected = sample.where(col("l_quantity") < 10).count()
    assert(filtered.count() === expected, s"$format filtered count")
  }

  test("CSV round-trip with declared schema") { roundTrip("csv", Map("header" -> "true")) }
  test("JSON-lines round-trip with declared schema") { roundTrip("json") }
  test("ORC round-trip with declared schema") { roundTrip("orc") }

  test("schema evolution: mergeSchema unions columns across parquet generations") {
    // generation 1 without, generation 2 with a new column — the exact
    // shape a long-lived ingest directory takes when the envelope grows a
    // field (the reference's dynamically-discovered metrics, D3)
    val dir = Files.createTempDirectory("graft-evolve").toString + "/data"
    sample.select("l_orderkey", "l_linenumber", "l_quantity")
      .write.parquet(s"$dir/gen=1")
    sample.select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
        col("l_returnflag").as("new_flag"))
      .write.parquet(s"$dir/gen=2")
    val merged = spark.read.option("mergeSchema", "true").parquet(dir)
    assert(merged.columns.toSet === Set(
      "l_orderkey", "l_linenumber", "l_quantity", "new_flag", "gen"))
    // old-generation rows surface the new column as null, not an error
    val gen1 = merged.where(col("gen") === 1)
    assert(gen1.count() === sample.count())
    assert(gen1.where(col("new_flag").isNull).count() === sample.count(),
      "pre-evolution rows must read the new column as null")
    assert(merged.where(col("gen") === 2 && col("new_flag").isNotNull).count()
      === sample.count())
  }

  test("hive-partitioned parquet: partition pruning reaches the scan (no full read)") {
    // THE 100 TB layout: facts partitioned by a low-cardinality key; a
    // filter on that key must become a PartitionFilter (directories never
    // listed), not a post-scan filter over all bytes
    val dir = Files.createTempDirectory("graft-part").toString + "/events"
    val events = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    events.write.partitionBy("event_type").parquet(dir)
    val part = spark.read.parquet(dir).where(col("event_type") === "purchase")
    val p = part.queryExecution
      .explainString(org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    // the filter must be INSIDE the PartitionFilters bracket — the header
    // prints even when empty, and isnotnull also appears in post-scan
    // Filter nodes, so two independent contains() would pass without pruning
    assert("""PartitionFilters: \[[^\]]*event_type""".r.findFirstIn(p).nonEmpty,
      s"expected partition pruning, plan:\n$p")
    // values survive the partition column round-trip
    assert(part.count() ===
      events.where(col("event_type") === "purchase").count())
  }

  test("binaryFile source: raw multimodal payloads ingest and decode from disk") {
    // the multimodal ingestion path a real corpus arrives through: opaque
    // files on disk → binaryFile scan (path, length, content) → the same
    // container-header decode the m-queries run on synthesized payloads.
    // Writes three PNG payloads via the engine's own header builder, reads
    // them back as files, and recovers width/height from the BYTES alone.
    import graft.analytics.Multimodal
    val dir = Files.createTempDirectory("graft-bin").toString
    val payloads = spark.range(3).select(
      col("id"),
      Multimodal.pngHeader(lit(16) + col("id").cast("int"),
        lit(32) + col("id").cast("int")).as("payload"))
      .collect().map(r => (r.getLong(0), r.getAs[Array[Byte]]("payload")))
    payloads.foreach { case (id, bytes) =>
      Files.write(java.nio.file.Paths.get(s"$dir/img_$id.png"), bytes)
    }
    val decoded = spark.read.format("binaryFile").load(dir)
      .select(col("path"), Multimodal.decodeImage(col("content")).as("m"))
      .select(col("path"), col("m.width").as("w"), col("m.height").as("h"))
      .collect().map(r => (r.getString(0).split("img_")(1).stripSuffix(".png").toLong,
        r.getInt(1), r.getInt(2))).toSet
    assert(decoded === Set((0L, 16, 32), (1L, 17, 33), (2L, 18, 34)),
      s"binaryFile decode mismatch: $decoded")
  }

  test("stats manifest: a range predicate reads a strict FILE subset " +
      "(executed input_file_name receipt), zero row loss; empty range reads nothing") {
    import graft.sources.StatsManifest
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-statsmanifest").toString + "/data"
    // range layout gives files DISJOINT id intervals — what makes the
    // manifest subset strict rather than merely correct
    val data = spark.range(0, 10000)
      .select(col("id"), (col("id") % 97).as("v"))
      .repartitionByRange(8, col("id"))
    val written = StatsManifest.write(data, dir, "id")
    assert(written.size >= 4, s"fixture needs several files, got ${written.size}")
    assert(written.map(_.rows).sum === 10000L)

    val (pruned, keep, total) = StatsManifest.readRange(spark, dir, 2500L, 2600L)
    assert(keep.nonEmpty && keep.size < total,
      s"manifest must prune to a STRICT subset: ${keep.size} of $total")
    // executed receipt: the files the pruned frame actually READS are
    // exactly the manifest's survivors, not a re-listing of the directory
    val readFiles = pruned.select(input_file_name()).distinct()
      .as[String].collect().toSet
    assert(readFiles.subsetOf(keep.toSet),
      s"scan escaped the manifest subset: ${readFiles.diff(keep.toSet)}")
    // zero row loss: the predicate over the pruned read equals the full scan
    val got = pruned.where(col("id").between(2500, 2600))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val full = spark.read.parquet(dir).where(col("id").between(2500, 2600))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === full && got.size === 101)
    // a range beyond every file's interval reads NO files and no rows
    val (none, keep0, _) = StatsManifest.readRange(spark, dir, 1000000L, 2000000L)
    assert(keep0.isEmpty && none.count() === 0L)
  }

  test("stats manifest × z-order: a 2-D box prunes FILES on conjunctive " +
      "per-column stats (executed receipt), zero row loss") {
    import graft.sources.StatsManifest
    import graft.functions.ZOrder
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-zmanifest").toString + "/data"
    val li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
      .select(col("l_orderkey"), col("l_linenumber"),
        col("l_quantity").cast("long").as("x"),
        floor(col("l_extendedprice") / 1000).cast("long").as("y"))
    // OPTIMIZE-ZORDER layout without hive partitioning: range-partition
    // on the interleave so every FILE owns a 2-D-local z-range and its
    // per-column min/max intervals become tight in BOTH dimensions
    val laid = li
      .withColumn("zv", ZOrder.zInterleave(col("x"), col("y"), bits = 8))
      .repartitionByRange(16, col("zv")).drop("zv")
    val written = StatsManifest.write(laid, dir, "x", "y")
    assert(written.map(_.col).toSet === Set("x", "y"))
    val box = Map("x" -> (10L, 20L), "y" -> (20L, 40L))
    val (pruned, keep, total) = StatsManifest.readBox(spark, dir, box)
    assert(keep.nonEmpty && keep.size < total,
      s"the box must prune to a STRICT file subset: ${keep.size} of $total")
    // conjunction semantics: the box subset never exceeds either
    // single-range subset, and each dimension prunes on its own
    val (_, keepX, _) = StatsManifest.readBox(spark, dir, Map("x" -> box("x")))
    val (_, keepY, _) = StatsManifest.readBox(spark, dir, Map("y" -> box("y")))
    assert(keep.size <= math.min(keepX.size, keepY.size))
    // executed receipt: the files actually read are the manifest survivors
    val readFiles = pruned.select(input_file_name()).distinct()
      .as[String].collect().toSet
    assert(readFiles.subsetOf(keep.toSet),
      s"scan escaped the manifest subset: ${readFiles.diff(keep.toSet)}")
    // zero row loss vs the full scan under the same predicate
    def boxRows(df: org.apache.spark.sql.DataFrame) =
      df.where(col("x").between(10, 20) && col("y").between(20, 40))
        .select("l_orderkey", "l_linenumber")
        .collect().map(r => (r.getLong(0), r.getInt(1))).toSet
    val got = boxRows(pruned)
    assert(got === boxRows(spark.read.parquet(dir)) && got.nonEmpty)
    // a queried column with no stats fails loudly, never a silent full read
    val err = intercept[IllegalArgumentException] {
      StatsManifest.readBox(spark, dir, Map("l_orderkey" -> (0L, 1L)))
    }
    assert(err.getMessage.contains("no stats"))
  }

  test("z-order layout: a 2-D box prunes partitions (executed plan), results exact") {
    import graft.functions.ZOrder
    val dir = Files.createTempDirectory("graft-zorder").toString
    val li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
      .select(col("l_orderkey"), col("l_linenumber"),
        col("l_quantity").cast("long").as("x"),
        floor(col("l_extendedprice") / 1000).cast("long").as("y"))
    // zbucket = high bits of the 8-bit interleave → 2-D-local directories
    val bucketed = li.withColumn("zbucket",
      shiftrightunsigned(ZOrder.zInterleave(col("x"), col("y"), bits = 8), 8))
    bucketed.write.partitionBy("zbucket").mode("overwrite").parquet(dir)
    val nParts = bucketed.select("zbucket").distinct().count()
    // 2-D box; candidate buckets enumerated exactly (small box — the
    // litmax/bigmin stand-in), giving the scan a partition-column predicate
    val (x0, x1, y0, y1) = (10L, 20L, 20L, 40L)
    val buckets = (for (x <- x0 to x1; y <- y0 to y1)
      yield ZOrder.zOf(x, y, bits = 8) >>> 8).distinct.sorted
    assert(buckets.size < nParts,
      s"the box must map to a strict partition subset (${buckets.size} of $nParts)")
    val pruned = spark.read.parquet(dir)
      .where(col("zbucket").isin(buckets: _*) &&
        col("x").between(x0, x1) && col("y").between(y0, y1))
      .select("l_orderkey", "l_linenumber")
    val planStr = pruned.queryExecution.executedPlan.toString
    assert(planStr.contains("PartitionFilters") && planStr.contains("zbucket"),
      s"expected partition pruning on zbucket, plan:\n$planStr")
    // correctness: identical to the plain box filter on the raw table
    val expected = li.where(col("x").between(x0, x1) && col("y").between(y0, y1))
      .select("l_orderkey", "l_linenumber")
      .collect().map(r => (r.getLong(0), r.getInt(1))).toSet
    val got = pruned.collect().map(r => (r.getLong(0), r.getInt(1))).toSet
    assert(got === expected, "pruned read must lose no rows")
    assert(got.nonEmpty)
  }
}
