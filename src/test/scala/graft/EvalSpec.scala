package graft

import graft.analytics.Eval

/** q62's Mann–Whitney AUC: analytic goldens including tie midranks. */
class EvalSpec extends SparkSpec {
  import spark.implicits._

  private def auc(rows: (Double, Boolean)*): (Long, Long, Long, Double) = {
    val r = Eval.aucROC(rows.toDF("score", "label"), "score", "label")
      .collect().head
    (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))
  }

  test("perfect separation scores 1.0; inverted separation 0.0") {
    assert(auc((0.9, true), (0.8, true), (0.2, false), (0.1, false))._4 == 1.0)
    assert(auc((0.9, false), (0.8, false), (0.2, true), (0.1, true))._4 == 0.0)
  }

  test("a constant score is pure ties: AUC exactly 0.5") {
    val (np, nn, u2, a) = auc((0.5, true), (0.5, true), (0.5, false))
    assert((np, nn) == (2L, 1L))
    assert(u2 == 2L && a == 0.5, "all-tie midranks must land exactly on 0.5")
  }

  test("hand-computed midrank case") {
    // pos scores {0.8, 0.5}, neg {0.5, 0.2}: pairs — (0.8 vs 0.5)=1,
    // (0.8 vs 0.2)=1, (0.5 vs 0.5)=0.5, (0.5 vs 0.2)=1 → U=3.5, AUC=3.5/4
    val (_, _, u2, a) = auc((0.8, true), (0.5, true), (0.5, false), (0.2, false))
    assert(u2 == 7L && a == 0.875)
  }

  test("AUC is invariant under any strictly monotone score transform") {
    val base = Seq((0.9, true), (0.7, false), (0.7, true), (0.3, false), (0.1, false))
    val mapped = base.map { case (s, l) => (math.exp(3 * s), l) }
    assert(auc(base: _*)._4 == auc(mapped: _*)._4)
  }

  test("classification report: hand-computed confusion, never-predicted class") {
    // labels: a×3, b×2, c×1; predictions: a→a,a,b  b→b,a  c→b
    val df = Seq(("a", "a"), ("a", "a"), ("a", "b"), ("b", "b"), ("b", "a"),
      ("c", "b")).toDF("label", "pred")
    val got = Eval.classificationReport(df, "label", "pred")
      .collect().map(r => r.getString(0) -> r).toMap
    val a = got("a") // tp=2, n_label=3, n_pred=3
    assert(a.getLong(1) == 3L && a.getLong(2) == 3L && a.getLong(3) == 2L)
    assert(a.getDouble(4) == 2.0 / 3.0 && a.getDouble(5) == 2.0 / 3.0)
    assert(a.getDouble(6) == 2.0 / 3.0, "P==R ⇒ F1 equals both")
    val b = got("b") // tp=1, n_label=2, n_pred=3
    assert(b.getDouble(4) == 1.0 / 3.0 && b.getDouble(5) == 0.5)
    val c = got("c") // never predicted: precision NULL, recall 0, f1 NULL
    assert(c.getLong(2) == 0L && c.isNullAt(4) && c.getDouble(5) == 0.0 &&
      c.isNullAt(6))
  }

  test("classification report: predicted-but-never-labeled class gets its FP row") {
    // 'x' is predicted twice but never appears as a label — standard
    // reports cover label∪prediction; hiding 'x' hides its false
    // positives (precision 0 here, since tp is necessarily 0).
    val df = Seq(("a", "a"), ("a", "x"), ("b", "x"), ("b", "b"))
      .toDF("label", "pred")
    val got = Eval.classificationReport(df, "label", "pred")
      .collect().map(r => r.getString(0) -> r).toMap
    assert(got.keySet == Set("a", "b", "x"))
    val x = got("x")
    assert(x.getLong(1) == 0L && x.getLong(2) == 2L && x.getLong(3) == 0L)
    assert(x.getDouble(4) == 0.0, "precision of a never-labeled class is 0/n_pred = 0")
    assert(x.isNullAt(5), "recall is NULL (0/0) for a class with no labeled rows")
    assert(x.isNullAt(6))
  }

  test("q63: per-source transition probabilities are a proper distribution") {
    val out = SparkEntry.queries("q63_transitions")(spark, "/root/testdata/sf0.001")
      .collect()
    assert(out.nonEmpty)
    out.groupBy(_.getString(0)).foreach { case (_, rows) =>
      assert(math.abs(rows.map(_.getDouble(4)).sum - 1.0) < 1e-9,
        "row-conditional probabilities must sum to 1 per from_type")
      assert(rows.map(_.getLong(2)).sum == rows.head.getLong(3))
    }
  }

  test("covariateBalance: hand-computed SMD; mirrored distributions are " +
      "balanced at 0; a constant covariate yields NULL, not 0/0") {
    import org.apache.spark.sql.functions.col
    // shifted: A={1,3}, B={2,4} → means 2/3, both vars 1 → SMD = −1
    // mirrored: both variants {1,3} → SMD = 0 (balanced)
    // constant: all 5s → no scale to standardize by → NULL
    val units = Seq(
      (0L, "1.00", "1.00", "5.00"), (0L, "3.00", "3.00", "5.00"),
      (1L, "2.00", "1.00", "5.00"), (1L, "4.00", "3.00", "5.00"))
      .toDF("variant", "shifted", "mirrored", "constant")
    val got = graft.analytics.Eval
      .covariateBalance(units, "variant", Seq("shifted", "mirrored", "constant"))
      .orderBy(col("covariate")).collect()
      .map(r => r.getAs[String]("covariate") ->
        (Option(r.get(r.fieldIndex("smd"))).map(_.asInstanceOf[Double]),
          Option(r.get(r.fieldIndex("balanced"))).map(_.asInstanceOf[Boolean])))
      .toMap
    assert(got("shifted") === ((Some(-1.0), Some(false))),
      s"(2−3)/√((1+1)/2) = −1, |−1| > 0.1: $got")
    assert(got("mirrored") === ((Some(0.0), Some(true))))
    assert(got("constant") === ((None, None)),
      "zero variance on both sides → NULL verdict, not a fake pass")
  }

  test("covariateBalance: any variant outside the declared two-code " +
      "contract fails FAST instead of silently zeroing a side") {
    import org.apache.spark.sql.functions.col
    def run(df: org.apache.spark.sql.DataFrame) = graft.analytics.Eval
      .covariateBalance(df, "variant", Seq("x")).collect()
    // a third arm raises (r13 advice: it used to blend out of the counts)
    val third = Seq((0L, "1.00"), (1L, "2.00"), (2L, "3.00"))
      .toDF("variant", "x")
    val e1 = intercept[Exception](run(third))
    assert(e1.getMessage.contains("covariateBalance") ||
      Option(e1.getCause).exists(_.getMessage.contains("covariateBalance")),
      s"error must name the operator and the bad code: $e1")
    // a string coding (casts to NULL int) raises too — it used to yield
    // n_a = n_b = 0 with NULL SMDs and a NULL `balanced` verdict
    val strings = Seq(("a", "1.00"), ("b", "2.00")).toDF("variant", "x")
    intercept[Exception](run(strings))
    // a DOUBLE whose int TRUNCATION collides with a declared code must
    // raise, not silently join arm A (equality tests the original value)
    val truncating = Seq((0.0, "1.00"), (0.9, "2.00"), (1.0, "3.00"))
      .toDF("variant", "x")
    intercept[Exception](run(truncating))
    // a custom coding is accepted when declared explicitly
    val coded = Seq((1L, "1.00"), (1L, "3.00"), (2L, "2.00"), (2L, "4.00"))
      .toDF("variant", "x")
    val ok = graft.analytics.Eval
      .covariateBalance(coded, "variant", Seq("x"), variantA = 1, variantB = 2)
      .collect().head
    assert(ok.getAs[Long]("n_a") === 2L && ok.getAs[Long]("n_b") === 2L)
    assert(ok.getAs[Double]("smd") === -1.0)
  }

  test("poissonBootstrap: full driver replay — hash→Poisson weights→exact " +
      "decimal replicate means→order-stat CI; deterministic across runs") {
    import org.apache.spark.sql.functions.col
    val df = spark.range(1, 51).toDF("id")
      .select(col("id"), (col("id") * 2).cast("double").as("value"))
    def run() = graft.analytics.Eval
      .poissonBootstrap(df, "id", "value", reps = 4).collect().head
    val got = run()
    val cum = Seq(0.3678794412, 0.7357588823, 0.9196986029, 0.9810118431,
      0.9963401532, 0.9994058152, 0.9999167589)
    def w(id: Long, r: Int): Int = {
      // lane-batched digest: replicate r reads u32 lane r%4 of
      // md5(id ":" r/4) — the operator's 4×-fewer-digests layout
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(s"$id:${r / 4}".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      val u = java.lang.Long.parseLong(
        hex.slice((r % 4) * 8, (r % 4) * 8 + 8), 16).toDouble / 4294967296.0
      cum.indexWhere(u < _) match { case -1 => 7; case k => k }
    }
    val means = (0 until 4).map { r =>
      val ws = (1L to 50L).map(id => id -> w(id, r))
      val sx = ws.map { case (id, k) => BigDecimal(id * 2).setScale(2) * k }.sum
      sx.toDouble / ws.map(_._2).sum
    }
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val sorted = means.sorted
    assert(got.getAs[Long]("n_rows") === 50L)
    assert(got.getAs[Double]("mean_full") === r6((2.0 + 100.0) / 2))
    assert(got.getAs[Double]("ci_lo") === r6(sorted.head),
      s"rank-1 order stat of $sorted")
    assert(got.getAs[Double]("ci_hi") === r6(sorted.last),
      "rank-4 order stat at reps=4, α=2.5%")
    val sm = means.sum; val sm2 = means.map(m => m * m).sum
    assert(got.getAs[Double]("se_boot") === r6(math.sqrt((sm2 - sm * sm / 4) / 3)))
    assert(got.toSeq === run().toSeq, "bit-deterministic")
  }

  test("cuped: y = 2x + 3 exactly → θ = 2, ρ² = 1, and the covariate " +
      "imbalance between variants is removed completely (hand-computed)") {
    import org.apache.spark.sql.functions.col
    // variant 0 drew low-x units, variant 1 high-x: naive means differ by
    // 4 purely through the covariate; CUPED must equalize them at the
    // global mean y = 8 (θ = covn/varxn = 40/20 = 2; ρ² = 1600/1600 = 1)
    val units = Seq((0L, "1.00", "5.00"), (0L, "2.00", "7.00"),
      (1L, "3.00", "9.00"), (1L, "4.00", "11.00"))
      .toDF("variant", "xs", "ys")
      .select(col("variant"), col("xs").cast("decimal(18,2)").as("x"),
        col("ys").cast("decimal(18,2)").as("y"))
    val got = graft.analytics.Eval.cuped(units, "variant", "x", "y")
      .orderBy(col("variant")).collect()
    assert(got.map(_.getAs[Double]("theta")).toSeq === Seq(2.0, 2.0))
    assert(got.map(_.getAs[Double]("var_reduction")).toSeq === Seq(1.0, 1.0))
    assert(got.map(_.getAs[Double]("mean_y")).toSeq === Seq(6.0, 10.0),
      "naive means carry the covariate imbalance")
    assert(got.map(_.getAs[Double]("mean_y_cuped")).toSeq === Seq(8.0, 8.0),
      "adjusted means must coincide when y is affine in x")
  }

  test("cuped: zero covariate variance → θ and adjusted mean NULL, naive " +
      "mean and counts still emitted") {
    import org.apache.spark.sql.functions.col
    val units = Seq((0L, "5.00", "1.00"), (0L, "5.00", "3.00"),
      (1L, "5.00", "2.00"))
      .toDF("variant", "xs", "ys")
      .select(col("variant"), col("xs").cast("decimal(18,2)").as("x"),
        col("ys").cast("decimal(18,2)").as("y"))
    val got = graft.analytics.Eval.cuped(units, "variant", "x", "y")
      .orderBy(col("variant")).collect()
    assert(got.forall(r => r.isNullAt(r.fieldIndex("theta")) &&
      r.isNullAt(r.fieldIndex("mean_y_cuped"))), "no signal → NULL, not 0/0")
    assert(got.map(_.getAs[Double]("mean_y")).toSeq === Seq(2.0, 2.0))
    assert(got.map(_.getAs[Long]("n_units")).toSeq === Seq(2L, 1L))
  }
}
