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

  // ── seqPatterns: GSP up to length 3 ──

  private def seqFixture = {
    // 3 users; Δ will be 10 time units.
    //  u1: a@0  b@5  c@8          — a>b, b>c, a>b>c all within gap
    //  u2: a@0  b@5  c@100        — c too late: a>b only
    //  u3: a@0  b@5  c@8          — like u1
    // so sup(a>b)=3, sup(b>c)=2, sup(a>b>c)=2; c alone sup=3
    Seq((1L, "a", 0L), (1L, "b", 5L), (1L, "c", 8L),
      (2L, "a", 0L), (2L, "b", 5L), (2L, "c", 100L),
      (3L, "a", 0L), (3L, "b", 5L), (3L, "c", 8L))
      .toDF("user_id", "etype", "us")
  }

  test("seqPatterns: max-gap excludes the late occurrence; L3 grows only through frequent flanks") {
    val got = graft.analytics.Itemsets
      .seqPatterns(seqFixture, maxGapUs = 10L, minSupPct = 60)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2))).toSet
    // 60% of 3 users = 1.8 → support ≥ 2 (integer compare: s*100 >= 3*60)
    assert(got === Set(
      (1, "a", 3L), (1, "b", 3L), (1, "c", 3L),
      (2, "a>b", 3L), (2, "a>c", 2L), (2, "b>c", 2L),
      (3, "a>b>c", 2L)))
  }

  test("seqPatterns: a-priori — an infrequent flank kills the length-3 pattern") {
    // same data at 70% (needs support ≥ 3): every ITEM stays frequent,
    // but the (b,c) and (a,c) flanks drop to 2/3 — so a>b>c, which
    // OCCURS twice, is never even generated as a candidate (the
    // both-flank GSP gate), and the only length-2 survivor is a>b
    val got = graft.analytics.Itemsets
      .seqPatterns(seqFixture, maxGapUs = 10L, minSupPct = 70)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2))).toSet
    assert(got === Set(
      (1, "a", 3L), (1, "b", 3L), (1, "c", 3L),
      (2, "a>b", 3L)))
  }

  test("seqPatterns: repeated types form patterns (a>a) and same-timestamp events never order") {
    val occ = Seq((1L, "a", 0L), (1L, "a", 5L),
      (2L, "a", 0L), (2L, "a", 0L)) // u2: equal ts — unordered, no pair
      .toDF("user_id", "etype", "us")
    val got = graft.analytics.Itemsets
      .seqPatterns(occ, maxGapUs = 10L, minSupPct = 50)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2))).toSet
    assert(got === Set((1, "a", 2L), (2, "a>a", 1L)))
  }
}
