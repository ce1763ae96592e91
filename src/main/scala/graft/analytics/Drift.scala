package graft.analytics

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** Distribution-drift detection between two dataset snapshots — the
  * monitoring gate a continuously-ingesting training pipeline runs per
  * feature (did this week's crawl shift against last week's?).
  *
  * Two-sample Kolmogorov–Smirnov per group: D = max over observed values
  * of |ECDF₁ − ECDF₂|, with the asymptotic α=0.05 rejection threshold
  * `1.358·√((n₁+n₂)/(n₁·n₂))` surfaced as a boolean. Everything is exact
  * integer counts and single double divisions of them — no rounding
  * needed anywhere, both engines compute bit-identical doubles.
  *
  * Scale: one shuffle to per-(group, value) counts (this also makes the
  * ECDF's order key unique — [[Prefix]]'s precondition), bucketed prefix
  * sums (NO group-wide-order window), one broadcastable per-group total,
  * and two small argmax shuffles. No pair term, no global sort.
  */
object Drift {

  /** One-sided CUSUM changepoint statistic per entity — the sequential
    * mean-shift monitor next to [[ksDrift]]'s two-snapshot test:
    * S_t = max(0, S_{t−1} + (x_t − target)), alarm when max_t S_t
    * exceeds `h`; `target` absorbs the CUSUM slack k (μ₀ + k).
    *
    * The recurrence is eliminated via the EXACT prefix identity
    * `S_t = P_t − min(0, min_{j≤t} P_j)` (P = running sum of the
    * deviations): two (ts, id)-ordered windows PARTITIONED by the
    * entity key — no per-key fold, no single-task scan, and no
    * accumulator at all (which also sidesteps DuckDB's list_reduce
    * evaluating struct-accumulator fields sequentially — measured: the
    * second field saw the first field's UPDATED value). Every operation
    * is exact scale-9 decimal (sums, min, max — no division, nothing
    * to round), so the cross-engine compare needs no float discipline;
    * the alarm compares ON the decimal before the output double cast.
    *
    * Final state falls out aggregate-only: S_n = ΣD − min(0, min_t P_t)
    * — both terms order-free over the windowed column.
    */
  def cusum(df: DataFrame, keyCol: String, valueCol: String,
      orderCols: Seq[String], target: java.math.BigDecimal,
      h: java.math.BigDecimal): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val zero = lit(java.math.BigDecimal.ZERO).cast("decimal(28,9)")
    val base = df.select(col(keyCol).as("k") +: orderCols.map(col) :+
      (col(valueCol).cast("decimal(18,6)").cast("decimal(28,9)") -
        lit(target).cast("decimal(28,9)")).as("d"): _*)
    val w = Window.partitionBy(col("k"))
      .orderBy(orderCols.map(col): _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // p and its running min re-tighten to (28,9): a 38-precision minus
    // needs 39, which DuckDB resolves by a silent DOUBLE fallback
    // (measured: low-bit drift) and Spark by precision loss — keeping
    // every operand at 28 keeps both engines in exact decimal
    val s = base
      .withColumn("p", sum(col("d")).over(w).cast("decimal(28,9)"))
      .withColumn("s", col("p") -
        least(zero, min(col("p")).over(w).cast("decimal(28,9)")))
    s.groupBy(col("k"))
      .agg(count(lit(1)).as("n"), max(col("s")).as("mx"),
        (sum(col("d")).cast("decimal(28,9)") -
          least(zero, min(col("p")).cast("decimal(28,9)"))).as("fin"))
      .select(col("k").as(keyCol), col("n"),
        (col("mx") > lit(h)).as("alarm"),
        col("mx").cast("double").as("cusum_max"),
        col("fin").cast("double").as("cusum_final"))
  }

  /** Chi-square homogeneity test between two snapshots of a CATEGORICAL
    * column — the discrete complement of [[ksDrift]] (KS needs an
    * ordering; event types, languages, shards don't have one):
    * X² = Σ over (category, side) of (observed − expected)²/expected
    * with expected = rowTotal·colTotal/N. Counts are exact integers;
    * each cell's term is one double chain rounded at 9 dp, and the sum
    * folds in category order over one collected array (category
    * cardinality is small by definition — that's why chi-square applies
    * at all). The caller supplies the critical value for its df/α
    * (3×2 table at α=0.05 → 5.991 etc.); the flag compares on the
    * rounded statistic.
    */
  def chiSquareDrift(df: DataFrame, catCol: String, sideCol: String,
      critical: Double): DataFrame = {
    val observed = df.groupBy(col(catCol).as("cat"), col(sideCol).as("side"))
      .agg(count(lit(1)).as("o"))
    // Densify: a category entirely absent from one side must contribute
    // an observed=0 cell — its term is then the full expected count,
    // exactly the strongest-drift case (a category vanishing between
    // snapshots) that a sparse observed-only table silently omits. The
    // cross join is categories × sides — chi-square only applies to
    // small-cardinality categoricals, so both factors are tiny.
    val cells = observed.select(col("cat")).distinct()
      .crossJoin(observed.select(col("side")).distinct())
      .join(observed, Seq("cat", "side"), "left")
      .select(col("cat"), col("side"), coalesce(col("o"), lit(0L)).as("o"))
    val catTot = cells.groupBy(col("cat")).agg(sum(col("o")).as("ct"))
    val sideTot = cells.groupBy(col("side")).agg(sum(col("o")).as("st"))
    val n = cells.agg(sum(col("o")).as("n"))
    val terms = cells.join(catTot, Seq("cat")).join(sideTot, Seq("side"))
      .crossJoin(broadcast(n))
      .select(col("cat"), col("side"),
        round(
          (col("o").cast(DoubleType) -
            col("ct").cast(DoubleType) * col("st").cast(DoubleType) / col("n").cast(DoubleType)) *
          (col("o").cast(DoubleType) -
            col("ct").cast(DoubleType) * col("st").cast(DoubleType) / col("n").cast(DoubleType)) /
          (col("ct").cast(DoubleType) * col("st").cast(DoubleType) / col("n").cast(DoubleType)),
          9).as("term"))
    terms
      .agg(collect_list(struct(col("cat"), col("side"), col("term"))).as("ts"),
        count(lit(1)).as("n_cells"))
      .select(col("n_cells"),
        round(aggregate(transform(array_sort(col("ts")), x => x.getField("term")),
          lit(0.0), (a, x) => a + x), 9).as("chi2"))
      .withColumn("is_drift", col("chi2") > lit(critical))
  }

  /** Population Stability Index between two snapshots of a numeric
    * column — the industry-standard feature-drift score next to
    * [[ksDrift]] (KS answers "did the distribution shift at all?"; PSI
    * grades HOW MUCH, with conventional action thresholds 0.1/0.2):
    * PSI = Σ over bins of (p₁ − p₂)·ln(p₁/p₂). Bins are fixed-width
    * with an overflow bin at nBins−1 AND an underflow bin at 0
    * (`greatest(least(floor(v/w), nBins−1), 0)` — negative values fold
    * into bin 0 instead of silently vanishing from both the cells and
    * the n₁/n₂ totals, the round-12 defect), and
    * shares are Laplace-smoothed ((o + ½)/(n + ½·B)) so an empty bin
    * contributes a finite term instead of ±∞ — the smoothing is part
    * of the declared semantics, shared by the oracle twin.
    *
    * Numeric portability: counts are exact integers; each bin's term
    * is one double chain with the ln product rounded at 9 dp, and the
    * total folds in bin order over the rounded terms (the q69
    * convention that makes double addition order-free across engines).
    *
    * Scale: ONE shuffle to per-bin side counts; the bin spine is a
    * `nBins`-row literal range, the totals a 1-row broadcast — nothing
    * else moves. The per-bin rows ARE the output (the drill-down a
    * monitoring dashboard shows), with the folded total and the flag
    * broadcast back onto them.
    */
  def psi(df: DataFrame, valueCol: String, sideCol: String,
      binWidth: Double, nBins: Int, threshold: Double): DataFrame = {
    val halfB = 0.5 * nBins
    val bin = greatest(
      least(floor(col(valueCol) / lit(binWidth)), lit((nBins - 1).toDouble)),
      lit(0.0)).cast("long")
    val obs = df.select(bin.as("bin"), col(sideCol).as("side"))
      .groupBy(col("bin"))
      .agg(sum(when(col("side") === 1, 1L).otherwise(0L)).as("o1"),
        sum(when(col("side") === 2, 1L).otherwise(0L)).as("o2"))
    val spine = df.sparkSession.range(0, nBins).select(col("id").as("bin"))
    val cells = spine.join(obs, Seq("bin"), "left")
      .select(col("bin"), coalesce(col("o1"), lit(0L)).as("o1"),
        coalesce(col("o2"), lit(0L)).as("o2"))
    val tot = cells.agg(sum(col("o1")).as("n1"), sum(col("o2")).as("n2"))
    val p1 = (col("o1").cast(DoubleType) + 0.5) / (col("n1").cast(DoubleType) + halfB)
    val p2 = (col("o2").cast(DoubleType) + 0.5) / (col("n2").cast(DoubleType) + halfB)
    val terms = cells.crossJoin(broadcast(tot))
      .select(col("bin"), col("o1"), col("o2"),
        round((p1 - p2) * log(p1 / p2), 9).as("term"))
    val total = terms
      .agg(collect_list(struct(col("bin"), col("term"))).as("ts"))
      .select(round(aggregate(transform(array_sort(col("ts")),
        x => x.getField("term")), lit(0.0), (a, x) => a + x), 9).as("psi"))
    terms.crossJoin(broadcast(total))
      .select(col("bin"), col("o1").as("o_base"), col("o2").as("o_cand"),
        col("term"), col("psi"), (col("psi") > lit(threshold)).as("is_shift"))
      .orderBy(col("bin"))
  }

  /** `sideCol` must be 1 (baseline) or 2 (candidate); groups missing a
    * side entirely are dropped (no ECDF to compare). `d_at` is the
    * smallest value attaining D — deterministic under ties.
    */
  def ksDrift(df: DataFrame, groupCol: String, valueCol: String,
      sideCol: String, nBuckets: Int = 32): DataFrame = {
    val counts = df.groupBy(col(groupCol), col(valueCol).as("v"))
      .agg(sum(when(col(sideCol) === 1, 1L).otherwise(0L)).as("c1"),
        sum(when(col(sideCol) === 2, 1L).otherwise(0L)).as("c2"))
    val cums = Prefix.bucketedPrefixSums(counts, Seq(groupCol), "v",
      Seq("c1", "c2"), nBuckets)
    val totals = counts.groupBy(col(groupCol))
      .agg(sum(col("c1")).as("n1"), sum(col("c2")).as("n2"))
    val diffs = cums.join(totals, Seq(groupCol))
      .where(col("n1") > 0 && col("n2") > 0)
      .withColumn("diff",
        abs(col("c1_cum").cast(DoubleType) / col("n1") -
          col("c2_cum").cast(DoubleType) / col("n2")))
    val mx = diffs.groupBy(col(groupCol), col("n1"), col("n2"))
      .agg(max(col("diff")).as("ks_d"))
    diffs.select(col(groupCol), col("v"), col("diff"))
      .join(mx, Seq(groupCol))
      .where(col("diff") === col("ks_d"))
      .groupBy(col(groupCol), col("n1"), col("n2"), col("ks_d"))
      .agg(min(col("v")).as("d_at"))
      .withColumn("is_drift", col("ks_d") > lit(1.358) *
        sqrt((col("n1").cast(DoubleType) + col("n2").cast(DoubleType)) /
          (col("n1").cast(DoubleType) * col("n2").cast(DoubleType))))
      .select(col(groupCol), col("n1"), col("n2"), col("ks_d"),
        col("d_at"), col("is_drift"))
  }
}
