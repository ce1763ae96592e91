package graft

import org.apache.spark.sql.functions._

import graft.analytics.Sketches.MisraGries

/** Misra-Gries invariants the q47 oracle can't exercise directly: the
  * heavy-hitter containment guarantee must hold under ANY partitioning
  * (merge tree), the summary must never exceed k counters, and a
  * vocabulary that fits in k must survive exactly.
  */
class SketchesSpec extends SparkSpec {
  import spark.implicits._

  /** Zipf-ish synthetic stream: item `i` appears ~N/(i+1) times — a few
    * genuine heavy hitters over a long tail.
    */
  private def stream(n: Int): Seq[String] =
    (0 until n).map(j => s"item${java.lang.Long.numberOfTrailingZeros(j + 1)}")

  test("guarantee: every true heavy hitter survives any partitioning") {
    val items = stream(20000)
    val n = items.size.toLong
    val k = 8
    val exact = items.groupBy(identity).map { case (t, xs) => t -> xs.size.toLong }
    val heavy = exact.collect { case (t, c) if c * (k + 1) > n => t }.toSet
    assert(heavy.nonEmpty && heavy.size < k,
      s"test stream must have 1..k-1 heavy hitters, got ${heavy.size}")
    for (parts <- Seq(1, 7, 32)) {
      val cand = items.toDF("term").repartition(parts).as[String]
        .select(new MisraGries(k).toColumn.name("cand"))
        .collect().head.toSet
      assert(cand.size <= k, s"summary exceeded k at $parts partitions")
      assert(heavy.subsetOf(cand),
        s"lost heavy hitters ${heavy.diff(cand)} at $parts partitions")
    }
  }

  test("exact when the vocabulary fits in k counters") {
    val items = Seq.tabulate(1000)(i => s"v${i % 5}")
    val cand = items.toDF("term").repartition(13).as[String]
      .select(new MisraGries(16).toColumn.name("cand"))
      .collect().head
    assert(cand.sorted === Seq("v0", "v1", "v2", "v3", "v4"))
  }

  test("guarantee property: 200 random streams × random merge trees (no Spark)") {
    // exercises reduce/merge directly — random item skew, random k,
    // random partition split, random left/right merge fold — the
    // combinations a single cluster run never covers
    val rnd = new scala.util.Random(20260814L)
    for (trial <- 1 to 200) {
      val k = 4 + rnd.nextInt(29)
      val nHot = 1 + rnd.nextInt(3)
      val hot = (0 until nHot).flatMap(h =>
        Seq.fill(2000 + rnd.nextInt(2000))(s"hot$h"))
      val tail = Seq.fill(3000 + rnd.nextInt(3000))(s"t${rnd.nextInt(500)}")
      val items = rnd.shuffle(hot ++ tail)
      val n = items.size.toLong
      val exact = items.groupBy(identity).map { case (t, xs) => t -> xs.size.toLong }
      val heavy = exact.collect { case (t, c) if c * (k + 1) > n => t }.toSet
      val mg = new MisraGries(k)
      // random split into 1..8 partitions, each reduced, then merged in
      // a random fold order
      val nParts = 1 + rnd.nextInt(8)
      val parts = items.grouped(math.max(1, items.size / nParts)).toSeq
        .map(_.foldLeft(mg.zero)(mg.reduce))
      val summary = rnd.shuffle(parts).reduce(mg.merge)
      assert(summary.size <= k, s"trial $trial: size ${summary.size} > k=$k")
      assert(heavy.subsetOf(summary.keySet),
        s"trial $trial (k=$k, n=$n): lost ${heavy.diff(summary.keySet)}")
    }
  }

  test("empty input yields an empty summary") {
    val cand = Seq.empty[String].toDF("term").as[String]
      .select(new MisraGries(4).toColumn.name("cand"))
      .collect().head
    assert(cand.isEmpty)
  }

  test("q74 CMS: estimates dominate true counts on real data") {
    val out = SparkEntry.queries("q74_count_min")(spark, "/root/testdata/sf0.001")
      .collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r.getBoolean(3) && r.getLong(2) >= r.getLong(1),
        s"CMS must NEVER undercount (one-sided error): $r")
      assert(r.getLong(4) === r.getLong(2) - r.getLong(1))
    }
  }

  test("CMS degenerate width: a 1-column sketch estimates every key at the stream total") {
    // with w=1 every key lands in the same cell per row, so min-over-rows
    // = total row count — the collision-mass semantics in its pure form,
    // computed through the SAME bucket/counter/min chain as q74
    val (d, w) = (4, 1)
    val li = Seq("a", "a", "a", "b", "c").toDF("k")
    def bucket(r: org.apache.spark.sql.Column, k: org.apache.spark.sql.Column) =
      pmod(conv(substring(md5(concat(r.cast("string"), lit(":"), k)), 1, 8),
        16, 10).cast("long"), lit(w.toLong))
    val cms = li.select(col("k"), explode(sequence(lit(0), lit(d - 1))).as("r"))
      .groupBy(col("r"), bucket(col("r"), col("k")).as("b"))
      .agg(count(lit(1)).as("c"))
    val est = li.distinct()
      .select(col("k"), explode(sequence(lit(0), lit(d - 1))).as("r"))
      .select(col("k"), col("r"), bucket(col("r"), col("k")).as("b"))
      .join(cms, Seq("r", "b"))
      .groupBy(col("k")).agg(min(col("c")).as("est"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(est === Map("a" -> 5L, "b" -> 5L, "c" -> 5L))
  }

  test("CMS merge: cell-wise sum of shard sketches equals the whole-stream sketch") {
    // the mergeability claim in its executable form: build the counter
    // matrix per shard, SUM cells, compare with the single-pass matrix —
    // partial aggregation IS the sketch merge
    val (d, w) = (4, 16)
    val all = (1 to 200).map(i => s"k${i % 13}").toDF("k")
    def matrixOf(df: org.apache.spark.sql.DataFrame) = df
      .select(col("k"), explode(sequence(lit(0), lit(d - 1))).as("r"))
      .groupBy(col("r"),
        pmod(conv(substring(md5(concat(col("r").cast("string"), lit(":"), col("k"))),
          1, 8), 16, 10).cast("long"), lit(w.toLong)).as("b"))
      .agg(count(lit(1)).as("c"))
    val whole = matrixOf(all).collect()
      .map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    val s1 = matrixOf(all.where(length(col("k")) === 2)).collect()
      .map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    val s2 = matrixOf(all.where(length(col("k")) =!= 2)).collect()
      .map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    val merged = (s1.keySet ++ s2.keySet)
      .map(c => c -> (s1.getOrElse(c, 0L) + s2.getOrElse(c, 0L))).toMap
    assert(merged === whole, "cell-wise shard sum must equal the one-pass sketch")
  }

  test("HLL: q79's 3% bound holds at 200k cardinality under any partitioning") {
    // the q79 contract: a unioned sketch answers with the COMPOSITE
    // estimator (merging kills HIP), and hll_sketch_agg's partial
    // aggregation already merges across partitions — so the estimate
    // is partition-dependent and only the BOUND is assertable
    val n = 200000L
    for (parts <- Seq(2, 31)) {
      val ids = spark.range(n).toDF("id").repartition(parts)
      val direct = ids.agg(
        hll_sketch_estimate(hll_sketch_agg(col("id"), lit(14))).as("est"))
        .collect().head.getLong(0)
      assert(math.abs(direct - n).toDouble / n <= 0.03,
        s"direct estimate $direct off by >3% of $n at $parts partitions")
      // union-of-10-shards path (the rollup shape): same bound
      val merged = ids.withColumn("shard", pmod(col("id"), lit(10)))
        .groupBy(col("shard")).agg(hll_sketch_agg(col("id"), lit(14)).as("sk"))
        .agg(hll_sketch_estimate(
          hll_union_agg(col("sk"), allowDifferentLgConfigK = false)).as("est"))
        .collect().head.getLong(0)
      assert(math.abs(merged - n).toDouble / n <= 0.03,
        s"merged estimate $merged off by >3% of $n at $parts partitions")
    }
  }

  test("KMV overlap: identical sets estimate as identical; accuracy within " +
      "4·RSE on the corpus pair; the union sketch built from sketches " +
      "equals the sketch of the raw union (mergeability)") {
    import spark.implicits._
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    def elems(m: Long) = docs
      .where(pmod(col("doc_id"), lit(m)) =!= 0)
      .select(md5(col("text")).as("h"))
    // identical inputs: A∩B = A = B, matches = k, est_inter = est_union = est_a
    val same = graft.analytics.Sketches
      .kmvOverlap(elems(3), elems(3), "h", k = 64).collect().head
    assert(same.getAs[Long]("matches") === 64L)
    assert(same.getAs[Double]("est_inter") === same.getAs[Double]("est_union"))
    assert(same.getAs[Double]("est_a") === same.getAs[Double]("est_union"))
    // the real pair: every estimate within 4·RSE = 4/√(k−2) ≈ 51%
    val r = graft.analytics.Sketches
      .kmvOverlap(elems(3), elems(2), "h", k = 64).collect().head
    val bound = 4.0 / math.sqrt(62.0)
    for ((est, ex) <- Seq(
        (r.getAs[Double]("est_a"), r.getAs[Long]("n_a")),
        (r.getAs[Double]("est_b"), r.getAs[Long]("n_b")),
        (r.getAs[Double]("est_inter"), r.getAs[Long]("n_inter"))))
      assert(math.abs(est - ex) / ex <= bound, s"$est vs $ex exceeds 4·RSE")
    // mergeability: k smallest of (skA ∪ skB) == k smallest of (A ∪ B)
    def minK(df: org.apache.spark.sql.DataFrame) =
      df.distinct().orderBy(col("h")).limit(64).collect()
        .map(_.getString(0)).toSeq
    val skA = minK(elems(3)); val skB = minK(elems(2))
    val fromSketches = (skA ++ skB).distinct.sorted.take(64)
    val fromRaw = minK(elems(3).unionByName(elems(2)))
    assert(fromSketches === fromRaw,
      "the union sketch must be computable from the two sketches alone")
  }

  test("KMV overlap: a sketch that holds its whole set estimates EXACTLY — " +
      "small sets are not biased low, containment reads as full overlap") {
    import spark.implicits._
    // |A| = 10 < k = 64, B ⊂ A with 6 elements: every sketch is the set
    // itself, so estimates must be exact counts and est_inter must read
    // the containment as exactly |B| (the r13 advice: the (n−1)/u_k form
    // and the matches/k scaling both bias fully-held sets low)
    val a = (0 until 10).map(i => s"elem_$i").toDF("x")
      .select(md5(col("x")).as("h"))
    val b = (0 until 6).map(i => s"elem_$i").toDF("x")
      .select(md5(col("x")).as("h"))
    val r = graft.analytics.Sketches.kmvOverlap(a, b, "h", k = 64)
      .collect().head
    assert(r.getAs[Long]("n_a") === 10L && r.getAs[Long]("n_b") === 6L)
    assert(r.getAs[Double]("est_a") === 10.0, "whole-set sketch is exact")
    assert(r.getAs[Double]("est_b") === 6.0)
    assert(r.getAs[Double]("est_union") === 10.0)
    assert(r.getAs[Long]("matches") === 6L)
    assert(r.getAs[Double]("est_inter") === 6.0,
      "matches scale by the union sketch's actual size, not the constant k")
  }
}
