package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.analytics.{Drift, Prefix}

/** q60's KS drift and the bucketed prefix-sum primitive under it. */
class DriftSpec extends SparkSpec {
  import spark.implicits._

  test("bucketedPrefixSums ≡ the single-window running sum") {
    val df = (0 until 500).map { i =>
      (s"g${i % 3}", ((i * 37) % 211).toDouble + (i % 3), (i % 7).toLong)
    }.toDF("g", "v", "c")
      .groupBy("g", "v").agg(sum("c").as("c")) // unique (g, v) keys
    val got = Prefix.bucketedPrefixSums(df, Seq("g"), "v", Seq("c"), nBuckets = 8)
      .select("g", "v", "c_cum").orderBy("g", "v").collect().toSeq
    val w = Window.partitionBy("g").orderBy("v")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val expected = df.select(col("g"), col("v"), sum("c").over(w).as("c_cum"))
      .orderBy("g", "v").collect().toSeq
    assert(got == expected)
  }

  test("KS: hand-computed D on disjoint two-point samples") {
    // side1 = {1,2}, side2 = {3,4}: ECDFs separate fully at v=2 → D=1
    val df = Seq(("g", 1.0, 1), ("g", 2.0, 1), ("g", 3.0, 2), ("g", 4.0, 2))
      .toDF("g", "v", "s")
    val r = Drift.ksDrift(df, "g", "v", "s").collect().head
    assert(r.getLong(1) == 2L && r.getLong(2) == 2L)
    assert(r.getDouble(3) == 1.0 && r.getDouble(4) == 2.0)
    // n too small for the asymptotic threshold (1.358·√1 > 1): no drift call
    assert(!r.getBoolean(5))
  }

  test("KS: identical samples show zero drift; a shifted sample trips the gate") {
    val same = (0 until 200).flatMap(i =>
      Seq(("g", (i % 100).toDouble, 1), ("g", (i % 100).toDouble, 2)))
      .toDF("g", "v", "s")
    val r0 = Drift.ksDrift(same, "g", "v", "s").collect().head
    assert(r0.getDouble(3) == 0.0 && !r0.getBoolean(5))
    val shifted = ((0 until 100).map(i => ("g", i.toDouble, 1)) ++
      (0 until 100).map(i => ("g", (i + 50).toDouble, 2))).toDF("g", "v", "s")
    val r1 = Drift.ksDrift(shifted, "g", "v", "s").collect().head
    assert(r1.getDouble(3) == 0.5, s"expected D=0.5, got ${r1.getDouble(3)}")
    assert(r1.getBoolean(5), "a half-range shift must trip the drift gate")
  }

  test("KS: a group missing one side is dropped, others unaffected") {
    val df = Seq(("only1", 1.0, 1), ("both", 1.0, 1), ("both", 2.0, 2))
      .toDF("g", "v", "s")
    val got = Drift.ksDrift(df, "g", "v", "s").collect()
    assert(got.map(_.getString(0)).toSeq == Seq("both"))
  }

  test("CUSUM: prefix identity equals the direct recurrence; shift trips the alarm") {
    // stable series around 100 then a sustained shift to 160
    val vals = Seq.fill(20)(100.0) ++ Seq.fill(20)(160.0)
    val df = vals.zipWithIndex.map { case (v, i) => ("u", i.toLong, v) }
      .toDF("k", "ord", "v")
    val got = graft.analytics.Drift.cusum(df, "k", "v", Seq("ord"),
      target = new java.math.BigDecimal("105"),
      h = new java.math.BigDecimal("500")).collect().head
    // direct recurrence replay on the driver
    var s = BigDecimal(0); var mx = BigDecimal(0)
    vals.foreach { v => s = (s + (BigDecimal(v) - 105)).max(0); mx = mx.max(s) }
    assert(got.getLong(1) == 40L)
    assert(BigDecimal(got.getDouble(3)) == mx, s"max: ${got.getDouble(3)} vs $mx")
    assert(BigDecimal(got.getDouble(4)) == s)
    assert(got.getBoolean(2), "a sustained +55 shift over 20 points must alarm")
    // the stable prefix alone must NOT alarm (max drift bounded by noise)
    val quiet = Seq.fill(40)(100.0).zipWithIndex
      .map { case (v, i) => ("u", i.toLong, v) }.toDF("k", "ord", "v")
    val q = graft.analytics.Drift.cusum(quiet, "k", "v", Seq("ord"),
      new java.math.BigDecimal("105"), new java.math.BigDecimal("500"))
      .collect().head
    assert(!q.getBoolean(2) && q.getDouble(3) == 0.0,
      "below-target values clamp at zero")
  }

  test("chi-square: hand-computed 2x2 statistic; identical mixes score zero") {
    // 2×2: side1 = (a:30, b:10), side2 = (a:10, b:30) → X² = 20·80·80·...
    // classic formula: N(ad−bc)²/((a+b)(c+d)(a+c)(b+d)) = 80·(900−100)²·…
    val rows = Seq.fill(30)(("a", 1)) ++ Seq.fill(10)(("b", 1)) ++
      Seq.fill(10)(("a", 2)) ++ Seq.fill(30)(("b", 2))
    val r = graft.analytics.Drift.chiSquareDrift(
      rows.toDF("cat", "side"), "cat", "side", critical = 3.841).collect().head
    // N(ad−bc)²/((a+b)(c+d)(a+c)(b+d)) = 80·(30·30 − 10·10)²/(40·40·40·40)
    val expected = 80.0 * math.pow(30.0 * 30 - 10.0 * 10, 2) / (40.0 * 40 * 40 * 40)
    assert(math.abs(r.getDouble(1) - expected) < 1e-6,
      s"${r.getDouble(1)} vs $expected")
    assert(r.getBoolean(2), "a reversed mix at n=80 must trip the 2x2 gate")
    // identical mixes: every observed equals expected → exactly 0
    val same = Seq.fill(20)(("a", 1)) ++ Seq.fill(20)(("a", 2)) ++
      Seq.fill(10)(("b", 1)) ++ Seq.fill(10)(("b", 2))
    val r0 = graft.analytics.Drift.chiSquareDrift(
      same.toDF("cat", "side"), "cat", "side", critical = 3.841).collect().head
    assert(r0.getDouble(1) == 0.0 && !r0.getBoolean(2))
  }

  test("chi-square: a category vanishing from one side contributes its full expected term") {
    // 'b' exists only on side 1 — the observed=0 cell (b, 2) must appear
    // with term = expected. side1 = (a:10, b:10), side2 = (a:20):
    // margins ct_a=30 ct_b=10 st_1=20 st_2=20 N=40 →
    // cells: (a,1): e=15, (10-15)²/15; (a,2): e=15, (20-15)²/15;
    //        (b,1): e=5,  (10-5)²/5;   (b,2): o=0, e=5, term=5
    val rows = Seq.fill(10)(("a", 1)) ++ Seq.fill(10)(("b", 1)) ++
      Seq.fill(20)(("a", 2))
    val r = graft.analytics.Drift.chiSquareDrift(
      rows.toDF("cat", "side"), "cat", "side", critical = 3.841).collect().head
    assert(r.getLong(0) == 4L, "densified table must have 2 cats × 2 sides cells")
    val expected = 25.0 / 15 + 25.0 / 15 + 25.0 / 5 + 5.0
    assert(math.abs(r.getDouble(1) - expected) < 1e-6,
      s"${r.getDouble(1)} vs $expected — the zero cell's term is the full expected count")
    assert(r.getBoolean(2), "a vanished category IS the strongest drift signal")
  }

  test("PSI: identical mixes score exactly zero; a full shift trips 0.2 hard") {
    val same = (0 until 200).flatMap(i =>
      Seq(((i % 10) * 10.0 + 5.0, 1), ((i % 10) * 10.0 + 5.0, 2)))
      .toDF("v", "s")
    val r0 = Drift.psi(same, "v", "s", binWidth = 10.0, nBins = 10,
      threshold = 0.2).collect()
    assert(r0.length == 10, "the literal spine must emit every bin")
    assert(r0.forall(_.getDouble(3) == 0.0) && r0.forall(_.getDouble(4) == 0.0))
    assert(r0.forall(!_.getBoolean(5)))
    // all of side 1 in bin 0, all of side 2 in bin 9
    val shifted = ((0 until 100).map(_ => (5.0, 1)) ++
      (0 until 100).map(_ => (95.0, 2))).toDF("v", "s")
    val r1 = Drift.psi(shifted, "v", "s", 10.0, 10, 0.2).collect()
    // driver replay with the same smoothing and rounding
    def term(o1: Long, o2: Long): Double = {
      val p1 = (o1 + 0.5) / 105.0; val p2 = (o2 + 0.5) / 105.0
      BigDecimal((p1 - p2) * math.log(p1 / p2))
        .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    val expected = BigDecimal(term(100, 0) + term(0, 100) + 8 * term(0, 0))
      .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(r1.head.getDouble(4) == expected,
      s"psi ${r1.head.getDouble(4)} vs replay $expected")
    assert(r1.head.getBoolean(5), "a disjoint-bin shift must trip the gate")
  }

  test("PSI: non-negative and side-swap-invariant on generated samples") {
    // every term (p1-p2)·ln(p1/p2) has matching signs → psi ≥ 0; the
    // |…|-free form is still symmetric under side exchange
    for (seed <- Seq(7, 23, 91)) {
      val rows = (0 until 300).map { i =>
        val v = ((i * seed) % 97).toDouble + (if (i % 3 == 0) 40.0 else 0.0)
        (v, (i * 31 + seed) % 2 + 1)
      }
      val df = rows.toDF("v", "s")
      val swapped = rows.map { case (v, s) => (v, 3 - s) }.toDF("v", "s")
      val p = Drift.psi(df, "v", "s", 10.0, 10, 0.2).collect().head.getDouble(4)
      val q = Drift.psi(swapped, "v", "s", 10.0, 10, 0.2).collect().head.getDouble(4)
      assert(p >= 0.0, s"psi must be non-negative, got $p at seed $seed")
      assert(p == q, s"psi must be side-symmetric: $p vs $q at seed $seed")
    }
  }

  test("PSI: values past the last edge clamp into the overflow bin") {
    val df = Seq((490.0, 1), (490.0, 2), (5.0, 1), (5.0, 2)).toDF("v", "s")
    val r = Drift.psi(df, "v", "s", 10.0, 10, 0.2).collect()
    val byBin = r.map(x => x.getLong(0) -> (x.getLong(1), x.getLong(2))).toMap
    assert(byBin(9L) == ((1L, 1L)), "490 must land in bin 9, not bin 49")
    assert(byBin(0L) == ((1L, 1L)))
  }

  test("q70 Benford: TPC-H prices fail the gate; true Benford data passes") {
    val out = SparkEntry.queries("q70_benford")(spark, "/root/testdata/sf0.001")
      .collect().head
    assert(!out.getBoolean(2),
      s"uniform-ish prices must NOT look Benford (chi2 ${out.getDouble(1)})")
    assert(out.getDouble(1) > 15.507)
    // synthesized Benford sample: counts proportional to log10(1+1/d)
    val n = 10000
    val counts = (1 to 9).map(d => d -> math.round(n * math.log10(1.0 + 1.0 / d)).toInt)
    val vals = counts.flatMap { case (d, c) => Seq.fill(c)(d * 100.0 + 23.0) }
    val dir = java.nio.file.Files.createTempDirectory("graft-benford").toString
    vals.zipWithIndex.map { case (v, i) => (i.toLong, v) }
      .toDF("l_orderkey", "l_extendedprice")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val b = SparkEntry.queries("q70_benford")(spark, dir).collect().head
    assert(b.getBoolean(2), s"Benford-proportioned data must pass: chi2 ${b.getDouble(1)}")
  }

  test("t24 entropy: uniform unigram distribution scores exactly ln(V); TTR exact") {
    val dir = java.nio.file.Files.createTempDirectory("graft-entropy").toString
    // one lang, 4 distinct tokens × 5 occurrences each → H = ln 4
    Seq((1L, "aa bb cc dd " * 5, "xx"))
      .toDF("doc_id", "text", "lang")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val r = SparkEntry.queries("t24_entropy")(spark, dir).collect().head
    assert(r.getLong(1) == 20L && r.getLong(2) == 4L)
    assert(r.getDouble(3) == 0.2)
    val expected = BigDecimal(math.log(4.0))
      .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(math.abs(r.getDouble(4) - expected) < 1e-9,
      s"${r.getDouble(4)} vs $expected")
  }

  test("PSI: negative values fold into the underflow bin instead of vanishing") {
    // round-12 defect: bin = least(floor(v/w), B−1) could go negative and
    // the spine's left join silently dropped those rows from the cells AND
    // the n1/n2 totals — PSI over a truncated population with no warning.
    // Identical mixes that include negatives must still (a) count every
    // row and (b) score exactly zero.
    val rows = (0 until 50).flatMap(_ => Seq((-25.0, 1), (5.0, 1), (-25.0, 2), (5.0, 2)))
    val r = Drift.psi(rows.toDF("v", "s"), "v", "s",
      binWidth = 10.0, nBins = 10, threshold = 0.2).collect()
    val bin0 = r.find(_.getLong(0) == 0L).get
    assert(bin0.getLong(1) == 100L && bin0.getLong(2) == 100L,
      s"underflow rows must land in bin 0: ${bin0.getLong(1)}/${bin0.getLong(2)}")
    assert(r.map(_.getLong(1)).sum == 100L && r.map(_.getLong(2)).sum == 100L,
      "totals must cover the full population including negatives")
    assert(r.forall(_.getDouble(4) == 0.0), "identical mixes must score 0")
  }

  test("plan: ECDF windows are (group, bucket)-partitioned, never type-wide") {
    val p = SparkEntry.queries("q60_ks_drift")(spark, "/root/testdata/sf0.001")
      .queryExecution.executedPlan.toString
    assert(p.contains("windowspecdefinition(event_type"), s"plan:\n$p")
    assert(p.contains("__bk"), s"expected bucketed window partitions, plan:\n$p")
  }
}
