package graft.analytics

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** Dataset profiling and data-quality expectations — the ANALYZE /
  * Deequ-shaped utility surface of the engine: before a 100 TB corpus is
  * trusted, something has to report its shape, and a pipeline gate has
  * to count constraint violations instead of exploding on the first one.
  *
  * Both operators are ONE full scan each, every statistic a partial
  * aggregate folded in the same pass (the multi-distinct profile plans
  * through Spark's Expand — one shuffle total); the long-form output is
  * a pure projection over the single 1-row aggregate, so cost is the
  * scan, never the statistic count.
  */
object Profile {

  /** Register count for a target relative standard deviation:
    * rse(HLL) ≈ 1.04/√m ⇒ lgK = ⌈log₂((1.04/rsd)²)⌉, floored at the
    * DataSketches default of 12 and CLAMPED to the library's lgK
    * ceiling of 21 (an rsd below ~0.0007 would otherwise throw a
    * runtime SketchesArgumentException mid-query — a tighter request
    * degrades to the best the sketch offers instead).
    */
  private def rsdToLgK(rsd: Double): Int =
    math.min(21,
      math.max(12, math.ceil(2.0 * math.log(1.04 / rsd) / math.log(2.0)).toInt))

  /** Numeric column profile in LONG form: one row per column with total
    * rows, null/distinct counts, min/max, and the mean. The mean is the
    * EXACT decimal sum (order-free — float summation order would differ
    * run to run and engine to engine) cast to double, divided by the
    * non-null count, rounded to 6 dp: bit-identical cross-engine.
    *
    * Overflow honesty: values beyond DECIMAL(28,10) (≥ 1e18 — e.g. an
    * epoch-nanos column) null out under the engine's non-ANSI cast, which
    * would silently skew the sum while the denominator still counts the
    * row. The profile detects the disagreement (decimal-castable count ≠
    * non-null count) and reports mean_v as NULL for that column instead
    * of a wrong number. Empty inputs report 0 counts, not NULLs.
    *
    * `approxDistinct`: the exact multi-column distinct plans through
    * Spark's Expand — each input row fans out (n_cols + 1)× before the
    * hash aggregate, the dominant cost of this operator (measured ~4 s
    * of q44's bench time at sf0.1). At 100 TB swap in the DataSketches
    * HLL estimate over a 64-bit xxhash prehash (lgK from `rsd` via
    * rse ≈ 1.04/√m): partial-aggregable sketch per column, NO Expand,
    * one ordinary scan — every other statistic is unchanged and still
    * exact. Chosen over `approx_count_distinct` on measurement: Spark's
    * HLL++ buffers ran ~5× slower for the same 4-column pass (r14).
    * The oracle-gated catalog entry keeps the exact default.
    */
  def numericProfile(df: DataFrame, cols: Seq[String],
      approxDistinct: Boolean = false, rsd: Double = 0.05): DataFrame = {
    require(cols.nonEmpty, "profile needs at least one column")
    // the exact path's Expand fans every row (n_cols+1)× BEFORE the
    // partial aggregate — CPU-bound per-row work that must not run on a
    // byte-small single-split scan (r14: one 10.8 MB file arrived as ONE
    // task and serialized the whole profile)
    val src = Par.spreadForCpu(df)
    val aggs = cols.flatMap { c =>
      Seq(
        coalesce(sum(when(col(c).isNull, 1L).otherwise(0L)), lit(0L))
          .as(s"${c}__nulls"),
        (if (approxDistinct)
          // DataSketches HLL over a 64-bit prehash: measured ~5× faster
          // than approx_count_distinct's HLL++ buffers at 4 columns
          // (r14 receipt: 5.9 s vs 1.2 s for the 4-sketch pass at
          // sf0.1). The null guard matters — xxhash64(NULL) is the seed,
          // not NULL, and distinct counts must ignore nulls.
          hll_sketch_estimate(hll_sketch_agg(
            when(col(c).isNotNull, xxhash64(col(c))), lit(rsdToLgK(rsd))))
         else count_distinct(col(c))).as(s"${c}__distinct"),
        min(col(c)).cast(DoubleType).as(s"${c}__min"),
        max(col(c)).cast(DoubleType).as(s"${c}__max"),
        sum(col(c).cast("decimal(28,10)")).as(s"${c}__sum"),
        count(col(c).cast("decimal(28,10)")).as(s"${c}__ndec"),
        count(col(c)).as(s"${c}__nn"))
    }
    val a = src.agg(count(lit(1)).as("__n"), aggs: _*)
    val rows = cols.map { c =>
      struct(
        lit(c).as("column"),
        col("__n").as("n_rows"),
        col(s"${c}__nulls").as("n_nulls"),
        col(s"${c}__distinct").as("n_distinct"),
        col(s"${c}__min").as("min_v"),
        col(s"${c}__max").as("max_v"),
        when(col(s"${c}__nn") === 0 || col(s"${c}__ndec") =!= col(s"${c}__nn"),
          lit(null).cast(DoubleType))
          .otherwise(round(col(s"${c}__sum").cast(DoubleType) / col(s"${c}__nn"), 6))
          .as("mean_v"))
    }
    a.select(explode(array(rows: _*)).as("p")).select(col("p.*"))
  }

  /** Data-quality expectations: per named predicate, the violation count
    * and a pass flag over one scan. A NULL predicate result counts as a
    * VIOLATION — an expectation must hold definitively, and null-eating
    * comparisons are precisely how bad rows hide from row-wise gates.
    * Empty inputs pass vacuously with 0 violations (n_rows = 0 is
    * visible on every row for a gate that wants to refuse empty data).
    */
  def expectations(df: DataFrame, checks: Seq[(String, Column)]): DataFrame = {
    require(checks.nonEmpty, "need at least one expectation")
    val aggs = checks.map { case (n, p) =>
      coalesce(sum(when(coalesce(p, lit(false)), 0L).otherwise(1L)), lit(0L))
        .as(s"${n}__v")
    }
    val a = df.agg(count(lit(1)).as("__n"), aggs: _*)
    val rows = checks.map { case (n, _) =>
      struct(
        lit(n).as("check_name"),
        col("__n").as("n_rows"),
        col(s"${n}__v").as("n_violations"),
        (col(s"${n}__v") === 0L).as("passed"))
    }
    a.select(explode(array(rows: _*)).as("e")).select(col("e.*"))
  }

  /** Equi-width histogram of a numeric column — the ANALYZE statistics
    * companion to [[numericProfile]] (optimizers and skew diagnostics
    * want the distribution's SHAPE, not just its extremes). Bounds come
    * from the data (one 1-row aggregate, broadcast); each non-null value
    * maps to `least(floor((v-lo)/w), nBins-1)` so the max lands in the
    * last bin. Empty bins are absent from the output (their count is 0).
    *
    * Cross-engine determinism needs NO rounding here: lo/hi/w and the
    * bin index are the same IEEE ops on the same doubles in both engines,
    * and floor has no half-boundary. A constant column (hi == lo)
    * degenerates to one bin 0 holding everything.
    *
    * Scale: two scans (bounds, then binning — at 100 TB fuse the first
    * into existing profile stats), one shuffle on the nBins-sized key.
    */
  def histogram(df: DataFrame, c: String, nBins: Int): DataFrame = {
    require(nBins >= 1, s"need at least one bin, got $nBins")
    val bounds = df.agg(min(col(c)).cast(DoubleType).as("lo"),
      max(col(c)).cast(DoubleType).as("hi"))
    val w = (col("hi") - col("lo")) / nBins
    df.select(col(c).cast(DoubleType).as("v")).where(col("v").isNotNull)
      .crossJoin(broadcast(bounds))
      .select(when(col("hi") === col("lo"), lit(0L))
        .otherwise(least(floor((col("v") - col("lo")) / w),
          lit(nBins - 1L))).cast("long").as("bin"))
      .groupBy(col("bin")).agg(count(lit(1)).as("n"))
  }

  /** Mutual information and normalized MI (NMI = MI/√(H(x)·H(y)))
    * between two categorical columns — the dependence profiler q89
    * ships. One joint-count aggregation; the marginals re-aggregate the
    * CELL table (|x|·|y| rows, never the input) and broadcast back; MI
    * and both entropies fold per-cell terms in sorted order with the
    * q69 rounding convention, so the doubles are order-free
    * cross-engine. Properties a spec can hold: MI ≥ 0, 0 ≤ NMI ≤ 1
    * (up to the 9-dp rounding), and MI = 0 exactly when the columns
    * are independent (every cell term's log argument is 1).
    * Output: (n_cells, mi, h_x, h_y, nmi).
    */
  def mutualInfo(df: DataFrame, xCol: String, yCol: String): DataFrame = {
    val joint = df.groupBy(col(xCol).as("x"), col(yCol).as("y"))
      .agg(count(lit(1)).as("nxy"))
    val mx = joint.groupBy(col("x")).agg(sum(col("nxy")).as("nx"))
    val my = joint.groupBy(col("y")).agg(sum(col("nxy")).as("ny"))
    val nn = joint.agg(sum(col("nxy")).as("n"))
    def fold(c: Column): Column =
      round(aggregate(transform(array_sort(c), e => e.getField("term")),
        lit(0.0), (a, x) => a + x), 9)
    val mi = joint.join(broadcast(mx), Seq("x")).join(broadcast(my), Seq("y"))
      .crossJoin(broadcast(nn))
      .select(col("x"), col("y"),
        round(col("nxy").cast(DoubleType) / col("n").cast(DoubleType) *
          log(col("nxy").cast(DoubleType) * col("n").cast(DoubleType) /
            (col("nx").cast(DoubleType) * col("ny").cast(DoubleType))), 9)
          .as("term"))
      .agg(collect_list(struct(col("x"), col("y"), col("term"))).as("ts"),
        count(lit(1)).as("n_cells"))
      .select(col("n_cells"), fold(col("ts")).as("mi"))
    val hx = mx.crossJoin(broadcast(nn))
      .select(struct(col("x"),
        round(-(col("nx").cast(DoubleType) / col("n").cast(DoubleType)) *
          log(col("nx").cast(DoubleType) / col("n").cast(DoubleType)), 9)
          .as("term")).as("e"))
      .agg(collect_list(col("e")).as("ts"))
      .select(fold(col("ts")).as("h_x"))
    val hy = my.crossJoin(broadcast(nn))
      .select(struct(col("y"),
        round(-(col("ny").cast(DoubleType) / col("n").cast(DoubleType)) *
          log(col("ny").cast(DoubleType) / col("n").cast(DoubleType)), 9)
          .as("term")).as("e"))
      .agg(collect_list(col("e")).as("ts"))
      .select(fold(col("ts")).as("h_y"))
    mi.crossJoin(hx).crossJoin(hy)
      .select(col("n_cells"), col("mi"), col("h_x"), col("h_y"),
        round(col("mi") / sqrt(col("h_x") * col("h_y")), 9).as("nmi"))
  }

  /** Sweep-line maximum concurrency over half-open intervals
    * [stCol, enCol) per group — q90's machinery: ±1 deltas keyed on the
    * boundary timestamp, netted per (group, ts) BEFORE the prefix sum,
    * so an interval ending exactly where another starts contributes
    * +1−1 = 0 at that instant and the two are never counted as
    * concurrent (the half-open "ends-first" tie rule — a spec holds it
    * at the boundary). Running concurrency via
    * [[Prefix.bucketedPrefixSums]] — never a group-wide ordered window.
    * Output: (groupCol, n_intervals, max_concurrent, attained_at) with
    * attained_at the smallest timestamp reaching the peak.
    */
  def maxConcurrency(iv: DataFrame, groupCol: String,
      stCol: String, enCol: String): DataFrame = {
    val deltas = iv.select(col(groupCol), col(stCol).as("tsu"), lit(1L).as("d"))
      .unionByName(iv.select(col(groupCol), col(enCol).as("tsu"), lit(-1L).as("d")))
    val net = deltas.groupBy(col(groupCol), col("tsu"))
      .agg(sum(col("d")).as("net"))
    val cum = Prefix.bucketedPrefixSums(net, Seq(groupCol), "tsu", Seq("net"))
    val peak = cum.groupBy(col(groupCol))
      .agg(max(col("net_cum")).as("max_concurrent"))
    cum.join(broadcast(peak), Seq(groupCol))
      .where(col("net_cum") === col("max_concurrent"))
      .groupBy(col(groupCol), col("max_concurrent"))
      .agg(min(col("tsu")).as("attained_at"))
      .join(iv.groupBy(col(groupCol)).agg(count(lit(1)).as("n_intervals")),
        Seq(groupCol))
      .select(col(groupCol), col("n_intervals"), col("max_concurrent"),
        col("attained_at"))
  }
}
