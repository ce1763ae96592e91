package graft

import graft.analytics.Itemsets

/** q61's a-priori pair mining: hand-computed supports/lift, the prune
  * guarantee, and duplicate-observation collapse.
  */
class ItemsetsSpec extends SparkSpec {
  import spark.implicits._

  // 4 baskets: {A,B,C}, {A,B}, {A,C}, {D} — plus a duplicate (1,A) row
  private val tx = Seq(
    (1L, "A"), (1L, "A"), (1L, "B"), (1L, "C"),
    (2L, "A"), (2L, "B"),
    (3L, "A"), (3L, "C"),
    (4L, "D")).toDF("o", "p")

  test("pair supports and lift are exact; p1 < p2 canonical") {
    val got = Itemsets.frequentPairs(tx, "o", "p",
        minItemSupport = 2, minPairSupport = 2)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getDouble(5))).toSet
    // A:3 B:2 C:2, D:1 pruned; pairs: AB=2, AC=2, BC=1 (below gate)
    assert(got == Set(
      ("A", "B", 2L, 3L, 2L, 2L * 4L / (3.0 * 2.0)),
      ("A", "C", 2L, 3L, 2L, 2L * 4L / (3.0 * 2.0))))
  }

  test("a-priori prune: an item below support never reaches the pair join") {
    // with minItemSupport = 4 only A survives — no pairs at all
    assert(Itemsets.frequentPairs(tx, "o", "p", 4, 1).count() == 0L)
    // and a frequent pair containing a pruned item is impossible by the
    // a-priori property itself: pair support ≤ min(item supports)
    val all = Itemsets.frequentPairs(tx, "o", "p", 1, 1)
      .collect().map(r => (r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(all.forall { case (n, s1, s2) => n <= s1 && n <= s2 })
  }

  test("q61 on testdata: gates hold and lift is the exact count ratio") {
    val out = SparkEntry.queries("q61_copurchase")(spark, "/root/testdata/sf0.001")
      .collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r.getLong(2) >= 2L && r.getLong(3) >= 8L && r.getLong(4) >= 8L)
      assert(r.getLong(0) < r.getLong(1), "canonical pair order")
    }
  }

  test("associationRules: confidence is directional where lift is not") {
    // A in baskets {1,2,3,4}, B in {1,2} → conf(A→B)=0.5, conf(B→A)=1.0,
    // lift = 2·4/(4·2) = 1.0 BOTH ways; a 0.6 gate keeps only B→A
    val tx = Seq((1L, "A"), (2L, "A"), (3L, "A"), (4L, "A"),
      (1L, "B"), (2L, "B")).toDF("o", "p")
    val got = graft.analytics.Itemsets.associationRules(
        tx, "o", "p", minItemSupport = 2, minPairSupport = 2,
        minConfidence = 0.6)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getDouble(5), r.getDouble(6)))
    assert(got.toSeq == Seq(("B", "A", 2L, 2L, 4L, 1.0, 1.0)),
      s"only the certain direction survives the gate: ${got.toSeq}")
    // ungated: both directions present with the same lift
    val all = graft.analytics.Itemsets.associationRules(
        tx, "o", "p", 2, 2, minConfidence = 0.0)
      .collect().map(r => (r.getString(0), r.getDouble(6))).toMap
    assert(all == Map("A" -> 0.5, "B" -> 1.0))
  }
}
