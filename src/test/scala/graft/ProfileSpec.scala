package graft

import org.apache.spark.sql.functions._

import graft.analytics.Profile

/** Profiling + expectations invariants that the oracle's clean lineitem
  * can't exercise: null accounting, the null-predicate-is-violation rule,
  * and the approx-distinct scale path.
  */
class ProfileSpec extends SparkSpec {
  import spark.implicits._

  test("numericProfile: nulls counted, distinct exact, mean over non-null only") {
    val df = Seq[(java.lang.Long, java.lang.Double)](
      (1L, 2.0), (2L, 2.0), (3L, 4.0), (4L, null), (5L, null))
      .toDF("id", "v")
    val p = Profile.numericProfile(df, Seq("v")).collect().head
    assert(p.getAs[Long]("n_rows") === 5)
    assert(p.getAs[Long]("n_nulls") === 2)
    assert(p.getAs[Long]("n_distinct") === 2) // nulls not a distinct value
    assert(p.getAs[Double]("min_v") === 2.0 && p.getAs[Double]("max_v") === 4.0)
    assert(p.getAs[Double]("mean_v") === 2.666667) // (2+2+4)/3 rounded 6dp
    // all-null column: mean is null, min/max null, zero distincts
    val q = Profile.numericProfile(
      df.withColumn("w", lit(null).cast("double")), Seq("w")).collect().head
    assert(q.getAs[Long]("n_nulls") === 5 && q.getAs[Long]("n_distinct") === 0)
    assert(q.isNullAt(q.fieldIndex("mean_v")))
  }

  test("histogram: max lands in the last bin; constant column degenerates to bin 0") {
    val df = spark.range(101).select(col("id").cast("double").as("v"))
    val h = Profile.histogram(df, "v", nBins = 4).collect()
      .map(r => r.getAs[Long]("bin") -> r.getAs[Long]("n")).toMap
    // [0,100] in 4 bins of width 25: 0-24, 25-49, 50-74, 75-100 (max clamped)
    assert(h === Map(0L -> 25L, 1L -> 25L, 2L -> 25L, 3L -> 26L))
    val const = Profile.histogram(
      df.select(lit(7.0).as("v")), "v", nBins = 4).collect()
    assert(const.length === 1 &&
      const.head.getAs[Long]("bin") === 0L && const.head.getAs[Long]("n") === 101L)
  }

  test("numericProfile approxDistinct: no Expand in the plan, estimate within rsd") {
    val df = spark.range(20000).select(col("id").cast("double").as("v"),
      (col("id") % 97).cast("double").as("w"))
    val exact = Profile.numericProfile(df, Seq("v", "w"))
    val approx = Profile.numericProfile(df, Seq("v", "w"), approxDistinct = true)
    assert(exact.queryExecution.executedPlan.toString.contains("Expand"),
      "exact multi-distinct is expected to plan through Expand")
    assert(!approx.queryExecution.executedPlan.toString.contains("Expand"),
      "approx path must not fan rows out through Expand")
    val est = approx.collect()
      .map(r => r.getAs[String]("column") -> r.getAs[Long]("n_distinct")).toMap
    assert(math.abs(est("v") - 20000.0) / 20000.0 < 0.1)
    assert(math.abs(est("w") - 97.0) / 97.0 < 0.1)
  }

  test("numericProfile: decimal-overflow values yield NULL mean, not a silently " +
      "skewed one; empty input yields 0-counts") {
    // 1e30 overflows DECIMAL(28,10) → non-ANSI cast nulls it out of the
    // sum while remaining a counted non-null value: mean must refuse
    val big = Seq((1L, 1.0e30), (2L, 2.0)).toDF("id", "v")
    val p = Profile.numericProfile(big, Seq("v")).collect().head
    assert(p.getAs[Long]("n_nulls") === 0)
    assert(p.isNullAt(p.fieldIndex("mean_v")),
      "overflowed sum must surface as NULL mean, not a wrong number")
    // empty input: all counts 0, no NULL longs
    val e = Profile.numericProfile(
      spark.range(0).select(col("id").cast("double").as("v")), Seq("v")).collect().head
    assert(e.getAs[Long]("n_rows") === 0 && e.getAs[Long]("n_nulls") === 0)
    assert(e.isNullAt(e.fieldIndex("mean_v")))
  }

  test("expectations: empty input passes vacuously with 0 violations, not NULLs") {
    val out = Profile.expectations(
        spark.range(0).select(col("id")), Seq("id_pos" -> (col("id") > 0)))
      .collect().head
    assert(out.getAs[Long]("n_rows") === 0)
    assert(out.getAs[Long]("n_violations") === 0)
    assert(out.getAs[Boolean]("passed"))
  }

  test("expectations: NULL predicate counts as violation; pass flags exact") {
    val df = Seq[(Long, java.lang.Double)]((1L, 5.0), (2L, 50.0), (3L, null))
      .toDF("id", "v")
    val out = Profile.expectations(df, Seq(
        "v_small" -> (col("v") < 10), // 50.0 violates; NULL row violates
        "id_pos" -> (col("id") > 0))) // holds on every row
      .collect().map(r => r.getAs[String]("check_name") ->
        ((r.getAs[Long]("n_violations"), r.getAs[Boolean]("passed")))).toMap
    assert(out("v_small") === ((2L, false)))
    assert(out("id_pos") === ((0L, true)))
  }

  test("q87 Spearman: tie-averaged ranks match a full driver replay (sf0.001)") {
    // independent mechanism: collect the column triple, compute classic
    // tie-averaged ranks by sorting driver-side, and replay the rho
    // formula over exact integer 2×rank sums (the engine's uRank emits
    // 2×avgRank, and Pearson on ranks is scale-invariant, so the factor
    // of 2 cancels — replaying WITH the factor keeps every sum integral)
    val rows = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
      .select(col("l_quantity").cast("double"), col("l_discount").cast("double"),
        col("l_tax").cast("double"))
      .collect().map(r => (r.getDouble(0), r.getDouble(1), r.getDouble(2)))
    def ranks2(vs: Array[Double]): Array[Long] = {
      // 2×(average rank): R_smaller·2 + m + 1 per value group
      val counts = vs.groupBy(identity).view.mapValues(_.length.toLong).toMap
      val sortedVals = counts.keys.toArray.sorted
      val smaller = sortedVals.scanLeft(0L)((acc, v) => acc + counts(v))
      val r2 = sortedVals.zipWithIndex.map { case (v, i) =>
        v -> (2L * smaller(i) + counts(v) + 1L) }.toMap
      vs.map(r2)
    }
    def rho(xs: Array[Long], ys: Array[Long]): Double = {
      val n = xs.length.toLong
      var sx = 0L; var sy = 0L
      var sxy = BigInt(0); var sx2 = BigInt(0); var sy2 = BigInt(0)
      xs.indices.foreach { i =>
        sx += xs(i); sy += ys(i)
        sxy += BigInt(xs(i)) * ys(i); sx2 += BigInt(xs(i)) * xs(i)
        sy2 += BigInt(ys(i)) * ys(i)
      }
      val nd = n.toDouble
      val v = (nd * sxy.toDouble - sx.toDouble * sy.toDouble) /
        math.sqrt((nd * sx2.toDouble - sx.toDouble * sx.toDouble) *
          (nd * sy2.toDouble - sy.toDouble * sy.toDouble))
      BigDecimal(v).setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    val rq = ranks2(rows.map(_._1)); val rd = ranks2(rows.map(_._2))
    val rt = ranks2(rows.map(_._3))
    val want = Map(
      "discount_tax" -> rho(rd, rt),
      "quantity_discount" -> rho(rq, rd),
      "quantity_tax" -> rho(rq, rt))
    val got = SparkEntry.queries("q87_spearman")(spark, "/root/testdata/sf0.001")
      .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    want.foreach { case (pair, w) =>
      assert(math.abs(got(pair) - w) <= 1e-9, s"$pair: engine ${got(pair)} vs replay $w")
    }
  }

  test("q89 mutual information: MI = 0 exactly on independent columns; " +
      "bounds hold on real data") {
    // perfectly proportional joint counts → every cell's log argument is 1
    val indep = (Seq.fill(10)(("a", "c")) ++ Seq.fill(20)(("a", "d")) ++
      Seq.fill(20)(("b", "c")) ++ Seq.fill(40)(("b", "d"))).toDF("x", "y")
    val r0 = Profile.mutualInfo(indep, "x", "y").collect().head
    assert(r0.getLong(0) == 4L)
    assert(r0.getDouble(1) == 0.0, s"independent columns must give MI 0, got ${r0.getDouble(1)}")
    assert(r0.getDouble(4) == 0.0, "NMI must be 0 when MI is 0")
    // bounds on a real dependence: 0 ≤ MI ≤ min(H) and 0 ≤ NMI ≤ 1
    // (up to the 9-dp per-term rounding)
    val r1 = Profile.mutualInfo(
      spark.read.parquet("/root/testdata/sf0.001/orders.parquet"),
      "o_orderstatus", "o_orderpriority").collect().head
    val (mi, hx, hy, nmi) = (r1.getDouble(1), r1.getDouble(2), r1.getDouble(3), r1.getDouble(4))
    assert(mi >= -1e-8 && mi <= math.min(hx, hy) + 1e-8, s"MI $mi outside [0, min($hx,$hy)]")
    assert(nmi >= -1e-8 && nmi <= 1.0 + 1e-8, s"NMI $nmi outside [0,1]")
  }

  test("q90 max concurrency: an interval ending exactly when another starts " +
      "is NOT concurrent with it (half-open ends-first tie)") {
    // [0,10) then [10,20): netting +1−1 = 0 at t=10 → peak 1, attained at 0
    val backToBack = Seq(("g", 0L, 10L), ("g", 10L, 20L)).toDF("grp", "st", "en")
    val r0 = Profile.maxConcurrency(backToBack, "grp", "st", "en").collect().head
    assert(r0.getLong(1) == 2L && r0.getLong(2) == 1L && r0.getLong(3) == 0L,
      s"back-to-back intervals must peak at 1 attained at 0: $r0")
    // genuine triple overlap at t=9 — and the boundary pair [0,10)/[10,20)
    // in the same group must still not inflate the peak
    val mixed = Seq(("h", 0L, 10L), ("h", 5L, 15L), ("h", 9L, 11L), ("h", 10L, 20L))
      .toDF("grp", "st", "en")
    val r1 = Profile.maxConcurrency(mixed, "grp", "st", "en").collect().head
    assert(r1.getLong(1) == 4L && r1.getLong(2) == 3L && r1.getLong(3) == 9L,
      s"expected peak 3 attained at 9: $r1")
  }

  test("q71 decile bins: equi-depth within interpolation ties, ranges ordered") {
    import org.apache.spark.sql.functions.col
    val out = SparkEntry.queries("q71_decile_bins")(spark, "/root/testdata/sf0.001")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    assert(out.map(_._1).toSeq == (0L to 9L), "all ten bins must be populated")
    val total = out.map(_._2).sum
    // equi-depth: every bin within ±1.5% of total/10 (boundary ties and
    // interpolation make exact tenths impossible on discrete data)
    out.foreach { case (b, n, _, _) =>
      assert(math.abs(n - total / 10.0) <= total * 0.015,
        s"bin $b holds $n of $total — not equi-depth") }
    // ranges are disjoint and ordered
    out.sliding(2).foreach { case Array((_, _, _, hiA), (_, _, loB, _)) =>
      assert(hiA <= loB, s"bin ranges must be ordered: $hiA vs $loB")
    }
  }
}
