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
}
