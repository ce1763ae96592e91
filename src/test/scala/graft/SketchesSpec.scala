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
}
