package graft

import org.apache.spark.sql.functions._

/** Shuffle-byte receipts (graft.ShuffleReceipt): the tally measures real
  * exchange volume, and the top-3 flagship queries hold their byte
  * budgets. Wall time cannot see a plan regression GC noise hides — the
  * r13 q96 fan-out wrote 40× the shuffle rows long before it cost 40×
  * the wall — so the budgets here are the tripwire: measured sf0.001
  * volumes (d32 1.8 MB / 96.7k rows, s05 1.3 MB / 6.9k rows, s08 1.0 MB
  * / 3.8k rows) with ~4× headroom for AQE/stats drift. An accidental
  * all-pairs or per-round re-shuffle blows them by orders of magnitude.
  */
class ShuffleReceiptSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"

  private def receipt(name: String): (Long, Long) =
    ShuffleReceipt.measure(spark) {
      SparkEntry.queries(name)(spark, dir)
        .write.format("noop").mode("overwrite").save()
    }

  test("the tally measures a known shuffle and resets between uses") {
    import spark.implicits._
    val df = (1 to 10000).map(i => (i % 7, i.toLong)).toDF("k", "v")
    val (b1, r1) = ShuffleReceipt.measure(spark) {
      df.groupBy(col("k")).agg(sum(col("v"))).write.format("noop").mode("overwrite").save()
    }
    assert(b1 > 0L, "a groupBy over a fresh local relation must shuffle")
    assert(r1 > 0L && r1 <= 7L * 32L,
      s"partial aggregation bounds shuffled rows at groups×partitions, got $r1")
    // a shuffle-free scan measures ZERO — the tally must not leak the
    // previous measurement in
    val (b2, _) = ShuffleReceipt.measure(spark) {
      df.select(col("v") * 2).write.format("noop").mode("overwrite").save()
    }
    assert(b2 === 0L, s"a pure projection shuffles nothing, got $b2 bytes")
  }

  test("flagship byte budgets hold: d32 / s05 / s08 at sf0.001") {
    val (d32b, d32r) = receipt("d32_prefix_filter_join")
    assert(d32b > 0L && d32b < (8L << 20),
      s"d32 wrote $d32b shuffle bytes (budget 8 MB) — a fan-out regression?")
    assert(d32r < 400000L, s"d32 shuffled $d32r rows (budget 400k)")
    val (s05b, _) = receipt("s05_kmeans")
    assert(s05b > 0L && s05b < (6L << 20),
      s"s05 wrote $s05b shuffle bytes (budget 6 MB) — per-round argmax " +
        "must stay a partial+final max_by, never a window shuffle")
    val (s08b, _) = receipt("s08_pq_trained")
    assert(s08b > 0L && s08b < (4L << 20),
      s"s08 wrote $s08b shuffle bytes (budget 4 MB)")
  }

  test("round-15 new-op byte budgets hold: g09 / s25 / t33 at sf0.001") {
    // g09's whole point is the plain-integer-SUM reduce: its exchanges
    // carry (id, long) rows, never g01's fold structs — a budget blowout
    // means the partial aggregation stopped combining map-side
    val (g09b, g09r) = receipt("g09_ppr")
    info(s"g09 receipt: $g09b bytes / $g09r rows")
    assert(g09b > 0L && g09b < (2L << 20),
      s"g09 wrote $g09b shuffle bytes (budget 2 MB)")
    // s25's candidate volume is corpus × maxProbe / nCells with 10
    // probes — bounded by design; an accidental per-level re-shuffle of
    // the scored table would multiply it by the level count
    val (s25b, _) = receipt("s25_ivf_sweep")
    info(s"s25 receipt: $s25b bytes")
    assert(s25b > 0L && s25b < (2L << 20),
      s"s25 wrote $s25b shuffle bytes (budget 2 MB)")
    // t33 collapses the gram table BEFORE any join: its exchanges are
    // the two gram-keyed aggregates plus a doc-sized join — a gram-keyed
    // JOIN regression (the pair-space shape) blows this by the corpus
    // duplication factor
    val (t33b, _) = receipt("t33_novelty")
    info(s"t33 receipt: $t33b bytes")
    assert(t33b > 0L && t33b < (2L << 20),
      s"t33 wrote $t33b shuffle bytes (budget 2 MB)")
  }
}
