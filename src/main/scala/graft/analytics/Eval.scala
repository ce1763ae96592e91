package graft.analytics

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Model-evaluation metrics over scored datasets — the measurement side
  * of the curation pipeline (a quality score is only worth its gate if
  * its ranking power is measured, not assumed).
  */
object Eval {

  /** Exact tie-aware ROC AUC via the Mann–Whitney U identity:
    * AUC = [Σ over distinct scores s of pos(s)·(negBelow(s) + neg(s)/2)]
    *         / (nPos·nNeg),
    * computed as INTEGERS by doubling — u2 = Σ pos(s)·(2·negBelow(s) +
    * neg(s)) — so ties contribute exact midranks and the only float op
    * is the final single division (cross-engine bit-identical). Returns
    * one row: (n_pos, n_neg, u2, auc).
    *
    * Scale: one shuffle to per-score (pos, neg) counts, then
    * [[Prefix.bucketedPrefixSums]] over the score order (bucketed — no
    * global-order window), one 1-row aggregation. The per-score count
    * table is cardinality-of-score sized, not row sized.
    */
  /** Per-class classification report over (label, prediction) pairs:
    * confusion-derived exact counts (n_label, n_pred, tp) plus
    * precision/recall/F1 as double divisions of those counts — F1 is
    * computed FROM the emitted precision/recall columns, so the float
    * chain is replayable verbatim by the SQL twin. The class universe is
    * the UNION of distinct labels and distinct predictions (full outer
    * join of the two margins), so a class that is predicted but never
    * labeled still gets its precision row (n_label=0, recall NULL) —
    * standard reports cover label∪prediction, and hiding such a class
    * hides exactly its false positives. Classes never predicted get
    * precision NULL (0/0 is undefined, not 0); F1 is NULL when either
    * input is NULL or precision+recall has nothing to harmonic-mean over.
    *
    * Scale: two aggregations (confusion counts, then class totals) and
    * two broadcastable class-cardinality joins.
    */
  def classificationReport(df: DataFrame, labelCol: String,
      predCol: String): DataFrame = {
    val conf = df.groupBy(col(labelCol).as("label"), col(predCol).as("pred"))
      .agg(count(lit(1)).as("n"))
      // persisted (class-cardinality² rows): three consumers below —
      // without the cut the caller's scoring scan (langid, quality
      // classifier) re-executes per branch (session-owned cache,
      // dropped by clearCache())
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val labelTot = conf.groupBy(col("label")).agg(sum(col("n")).as("n_label"))
    val predTot = conf.groupBy(col("pred").as("label"))
      .agg(sum(col("n")).as("n_pred"))
    val tp = conf.where(col("label") === col("pred"))
      .select(col("label"), col("n").as("tp"))
    // no broadcast hint on the full outer: Spark can't build a
    // broadcast side for it (class cardinality is tiny either way)
    val base = labelTot
      .join(predTot, Seq("label"), "full_outer")
      .join(broadcast(tp), Seq("label"), "left")
      .select(col("label"),
        coalesce(col("n_label"), lit(0L)).as("n_label"),
        coalesce(col("n_pred"), lit(0L)).as("n_pred"),
        coalesce(col("tp"), lit(0L)).as("tp"))
    base
      .withColumn("precision",
        when(col("n_pred") > 0,
          col("tp").cast("double") / col("n_pred").cast("double")))
      .withColumn("recall",
        when(col("n_label") > 0,
          col("tp").cast("double") / col("n_label").cast("double")))
      .withColumn("f1",
        when(coalesce(col("precision"), lit(0.0)) +
            coalesce(col("recall"), lit(0.0)) > 0.0,
          lit(2.0) * col("precision") * col("recall") /
            (col("precision") + col("recall"))))
  }

  def aucROC(df: DataFrame, scoreCol: String, labelCol: String): DataFrame = {
    val counts = df
      .groupBy(col(scoreCol).as("s"))
      .agg(sum(when(col(labelCol), 1L).otherwise(0L)).as("pos"),
        sum(when(col(labelCol), 0L).otherwise(1L)).as("neg"))
      .withColumn("g", lit(0)) // single logical group for the prefix pass
    val cums = Prefix.bucketedPrefixSums(counts, Seq("g"), "s", Seq("neg"))
    cums
      .select(col("pos"), col("neg"),
        (col("neg_cum") - col("neg")).as("neg_below"))
      .agg(sum(col("pos")).as("n_pos"), sum(col("neg")).as("n_neg"),
        sum(col("pos") * (lit(2L) * col("neg_below") + col("neg"))).as("u2"))
      .select(col("n_pos"), col("n_neg"), col("u2"),
        (col("u2").cast("double") /
          (lit(2L) * col("n_pos") * col("n_neg")).cast("double")).as("auc"))
  }

  /** CUPED variance-reduced experiment readout (Deng, Xu, Kohavi &
    * Walker 2013, "Improving the sensitivity of online controlled
    * experiments by utilizing pre-experiment data"): given one row per
    * experimental unit with a pre-period covariate `x` and an outcome
    * `y`, adjust Y' = Y − θ·(X − mean(X)) with θ = cov(X,Y)/var(X)
    * pooled across ALL units, and report per-variant adjusted means.
    * Because Y' is AFFINE in X, every output is computable from exact
    * moment sums: mean(Y'|g) = mean(Y|g) − θ·(mean(X|g) − mean(X)),
    * and the variance reduction 1 − var(Y')/var(Y) = ρ²(X,Y) — no
    * per-unit float adjustment is ever materialized.
    *
    * Determinism: `x`/`y` must arrive DECIMAL-typed (the q01 exact-sum
    * discipline) so the six moment sums (n, ΣX, ΣY, ΣXY, ΣX², ΣY²) are
    * order-free integers-in-disguise; θ and everything downstream is
    * SCALAR double arithmetic on those sums in a fixed expression shape
    * the SQL twin replays term for term. var(X)=0 → θ NULL (no
    * covariate signal), adjusted mean NULL.
    *
    * Scale shape: one partial+final aggregate for the global moments
    * (6 numbers), one per-variant aggregate, one broadcast cross-join —
    * linear scans, constant state, no shuffle wider than the variant
    * cardinality.
    */
  /** Poisson bootstrap confidence interval (Chamandy et al. 2012,
    * "Estimating uncertainty for massive data streams" — Google's
    * distributed bootstrap): classical resampling draws n rows WITH
    * replacement per replicate, which cannot be done in one pass over a
    * distributed table; the Poisson trick gives every row an
    * independent Poisson(1) multiplicity per replicate instead, so ALL
    * `reps` replicates materialize in a single scan — as 2·reps fixed
    * aggregate slots per row, never a row fan-out — and the replicate
    * means' spread estimates the sampling distribution of the mean.
    *
    * Determinism: the multiplicity is the Poisson(1) inverse CDF of a
    * 32-bit hash of (id, replicate) — fixed literal thresholds, no RNG
    * state. The digest is BATCHED: one md5 yields 128 bits = FOUR u32
    * lanes, so replicate r reads lane r%4 of md5(id ":" r/4) — 4× fewer
    * digests on the hot path (measured 11 s → the md5 was the whole
    * cost of the 40× fan-out at sf0.1); per-replicate sums are EXACT
    * decimals (weight ×
    * DECIMAL(18,2) value — the q01/q93 discipline), each replicate mean
    * is one double division, and the CI is an ORDER STATISTIC of the
    * replicate means (exact rank ⌈α·reps⌉ / ⌈(1−α)·reps⌉ on the sorted
    * list, folded in replicate order for the stderr) — no float
    * quantile interpolation anywhere.
    *
    * Scale shape: ONE grouping-free aggregate over one scan — per-task
    * state is 2·reps+2 sums, the exchange carries one partial row per
    * partition, and the order-statistic/stderr algebra runs on the
    * single result row. Output one row:
    * (n_rows, reps, mean_full, ci_lo, ci_hi, se_boot).
    */
  def poissonBootstrap(df: DataFrame, idCol: String, valueCol: String,
      reps: Int, alphaNum: Int = 25, alphaDenom: Int = 1000): DataFrame = {
    require(reps >= 4 && reps % 4 == 0, s"reps=$reps must be a multiple of 4")
    // Poisson(1) CDF thresholds: P(X <= k) for k = 0..6; u >= cum(6) is
    // w = 7 (probability 8e-8 — bounded, documented)
    val cum = Seq(0.3678794412, 0.7357588823, 0.9196986029,
      0.9810118431, 0.9963401532, 0.9994058152, 0.9999167589)
    val x = col(valueCol).cast("decimal(18,2)")
    // all `reps` replicates as FIXED AGGREGATE SLOTS on the single scan —
    // no row fan-out at all (the r13 finding: the reps× explode was the
    // whole cost at 8.9 s — n×reps rows each paying the aggregation hash
    // path). Per row: reps/4 digests projected once, reps weight columns
    // read their u32 lane, and ONE grouping-free partial aggregate folds
    // 2·reps exact-decimal sums plus the full-mean moments — partition
    // state is constant, the exchange carries 32 partial rows.
    def wOf(h: Column, lane: Int): Column = {
      val u = conv(substring(h, 1 + lane * 8, 8), 16, 10)
        .cast("double") / lit(4294967296.0)
      // FLAT comparison sum, not a nested when-chain (r17 optimization
      // round): w = first k with u < cum(k) = 7 − #{k : u < cum(k)}
      // (identical on every input incl. the NULL-u → 7 edge, since a
      // NULL comparison falls to the otherwise-0 on every term). The
      // nested 8-deep when-chains × 40 replicates blew the generated
      // processNext past the JVM's 64 KB method limit — codegen FAILED
      // ("Code grows beyond 64 KB") and the whole projection+aggregate
      // stage ran INTERPRETED, 2.5-3× the compiled time at sf0.1 (and
      // recompiled-and-failed on every run). The flat form compiles.
      cum.map(c => when(u < c, 1).otherwise(0)).reduce(_ + _) * -1 + lit(7)
    }
    // the digest pipeline is CPU-bound at ~reps/4 md5 + reps conv per
    // row — spread a byte-small single-split scan across cores first
    val withDigests = Par.spreadForCpu(df)
      .select(Seq(x.as("x")) ++ (0 until reps / 4).map(g =>
        md5(concat(col(idCol).cast("string"), lit(":"),
          lit(g).cast("string"))).as(s"h$g")): _*)
    val withWeights = withDigests.select(Seq(col("x")) ++ (0 until reps).map(r =>
      wOf(col(s"h${r / 4}"), r % 4).as(s"w$r")): _*)
    val aggCols =
      count(lit(1)).as("n_rows") +:
        (sum(col("x")).cast("double") / count(lit(1))).as("mean_full") +:
        (0 until reps).flatMap(r => Seq(
          sum(col(s"w$r") * col("x")).cast("decimal(28,2)").as(s"sx$r"),
          sum(col(s"w$r")).as(s"sw$r")))
    val sums = withWeights.agg(aggCols.head, aggCols.tail: _*)
    val loRank = math.max(1, math.ceil(alphaNum.toDouble * reps / alphaDenom).toInt)
    val hiRank = math.min(reps,
      math.ceil((alphaDenom - alphaNum).toDouble * reps / alphaDenom).toInt)
    // replicate means in replicate order (the stderr fold's pinned
    // order), CI as exact order statistics of the sorted copy
    sums
      .withColumn("ms", array((0 until reps).map(r =>
        col(s"sx$r").cast("double") / col(s"sw$r").cast("double")): _*))
      .select(col("n_rows"), lit(reps).as("reps"),
        round(col("mean_full"), 6).as("mean_full"),
        round(sort_array(col("ms"))(loRank - 1), 6).as("ci_lo"),
        round(sort_array(col("ms"))(hiRank - 1), 6).as("ci_hi"),
        // empty-input guard (EmptyGate): the zero-seeded folds make 0/0
        // arithmetic (NaN) out of an empty sample's undefined replicate
        // means — the stderr of nothing is NULL, as the oracle's
        // NULL-chain already says
        when(col("n_rows") > 0,
          round(sqrt((aggregate(col("ms"), lit(0.0), (a, v) => a + v * v) -
            aggregate(col("ms"), lit(0.0), (a, v) => a + v) *
              aggregate(col("ms"), lit(0.0), (a, v) => a + v) / reps) /
            (reps - 1)), 6)).as("se_boot"))
  }

  /** Covariate balance check via standardized mean differences (the
    * A/B-test health gate run BEFORE trusting any adjusted readout —
    * Austin 2009's |SMD| ≤ 0.1 convention): per covariate,
    * SMD = (mean_A − mean_B) / √((var_A + var_B)/2). A randomization
    * bug (biased bucketing hash, mid-experiment assignment change)
    * shows up here as imbalance on PRE-period covariates, where no
    * treatment effect can explain it; q93's CUPED trusts exactly these
    * covariates, so this is its precondition.
    *
    * Determinism: the q93 discipline — per-(covariate, variant) moment
    * sums are EXACT decimals accumulated in ONE conditional aggregate
    * (no pivot, no second scan), and every output is scalar double
    * algebra in a fixed expression shape (population variance
    * (n·Σx² − (Σx)²)/n²). Output one row per covariate:
    * (covariate, n_a, n_b, mean_a, mean_b, smd, balanced = |SMD| ≤ 0.1;
    * smd NULL when both variances are 0 — a constant covariate has no
    * scale to standardize by). The variant coding is an explicit
    * two-value contract (`variantA`/`variantB`, default 0/1): any row
    * carrying anything else — a third arm, a string coding, a NULL —
    * raises at execution instead of silently zeroing a side.
    *
    * Scale shape: the melt is a map-side |covariates|× fan-out
    * (q86's shape); one partial+final aggregate keyed by covariate —
    * state is 6 numbers per covariate, no shuffle wider than that.
    */
  def covariateBalance(units: DataFrame, variantCol: String,
      covariates: Seq[String],
      variantA: Int = 0, variantB: Int = 1): DataFrame = {
    require(covariates.nonEmpty, "need at least one covariate")
    require(variantA != variantB, "the two variant codes must differ")
    // fail FAST on any other coding (strings cast to null, 1/2, a third
    // arm, NULLs): the r13 advice — a silently-empty side used to yield
    // n=0 rows and NULL SMDs with no signal to the caller. The guard is
    // a per-row raise_error branch inside the same scan, not a second
    // validation pass.
    // equality is tested on the ORIGINAL column (numeric promotion, so
    // DOUBLE 0.9 or LONG 2^32 can never truncate onto a declared code —
    // the int-cast-first version silently misclassified them into arm A)
    val raw = col(variantCol)
    val guarded = when(raw === variantA, lit(variantA))
      .when(raw === variantB, lit(variantB))
      .otherwise(raise_error(concat(
        lit(s"covariateBalance: '$variantCol' must be $variantA or $variantB, got "),
        coalesce(raw.cast("string"), lit("NULL")))))
    val melted = units.select(guarded.as("variant"),
      explode(array(covariates.map(c =>
        struct(lit(c).as("covariate"),
          col(c).cast("decimal(18,2)").as("x"))): _*)).as("e"))
      .select(col("variant"), col("e.covariate").as("covariate"),
        col("e.x").as("x"))
    def side(v0: Int, agg: Column): Column =
      sum(when(col("variant") === v0, agg).otherwise(lit(null)))
    val g = melted.groupBy(col("covariate"))
      .agg(
        sum(when(col("variant") === variantA, 1L).otherwise(0L)).as("n_a"),
        sum(when(col("variant") === variantB, 1L).otherwise(0L)).as("n_b"),
        side(variantA, col("x")).cast("double").as("sa"),
        side(variantB, col("x")).cast("double").as("sb"),
        side(variantA, col("x") * col("x")).cast("double").as("sa2"),
        side(variantB, col("x") * col("x")).cast("double").as("sb2"))
    val va = (col("n_a") * col("sa2") - col("sa") * col("sa")) /
      (col("n_a") * col("n_a"))
    val vb = (col("n_b") * col("sb2") - col("sb") * col("sb")) /
      (col("n_b") * col("n_b"))
    val smd = when(va + vb > 0,
      (col("sa") / col("n_a") - col("sb") / col("n_b")) /
        sqrt((va + vb) / 2))
    g.select(col("covariate"), col("n_a"), col("n_b"),
      round(col("sa") / col("n_a"), 6).as("mean_a"),
      round(col("sb") / col("n_b"), 6).as("mean_b"),
      round(smd, 6).as("smd"),
      (abs(smd) <= 0.1).as("balanced"))
  }

  def cuped(units: DataFrame, variantCol: String,
      xCol: String, yCol: String): DataFrame = {
    val x = col(xCol)
    val y = col(yCol)
    val g = units.agg(
      count(lit(1)).cast("double").as("n"),
      sum(x).cast("double").as("sx"),
      sum(y).cast("double").as("sy"),
      sum(x * y).cast("double").as("sxy"),
      sum(x * x).cast("double").as("sx2"),
      sum(y * y).cast("double").as("sy2"))
    val th = g.select(col("n"), col("sx"), col("sy"),
        (col("n") * col("sxy") - col("sx") * col("sy")).as("covn"),
        (col("n") * col("sx2") - col("sx") * col("sx")).as("varxn"),
        (col("n") * col("sy2") - col("sy") * col("sy")).as("varyn"))
      .withColumn("theta",
        when(col("varxn") > 0, col("covn") / col("varxn")))
    val v = units.groupBy(col(variantCol).as("variant"))
      .agg(count(lit(1)).as("n_units"),
        sum(x).cast("double").as("sxg"),
        sum(y).cast("double").as("syg"))
    v.crossJoin(broadcast(th))
      .select(col("variant"), col("n_units"),
        round(col("syg") / col("n_units"), 6).as("mean_y"),
        round(col("syg") / col("n_units") -
          col("theta") * (col("sxg") / col("n_units") - col("sx") / col("n")), 6)
          .as("mean_y_cuped"),
        round(col("theta"), 6).as("theta"),
        round(when(col("varyn") > 0 && col("varxn") > 0,
          (col("covn") * col("covn")) / (col("varxn") * col("varyn"))), 6)
          .as("var_reduction"))
  }
}
