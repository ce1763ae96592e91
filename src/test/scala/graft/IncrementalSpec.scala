package graft

import org.apache.spark.sql.functions._

import graft.analytics.Incremental

/** Incremental-state invariants beyond q48's oracle (which only sees a
  * 2-way split where every key is on both sides): keys present in a
  * single state pass through the merge, and the merge is associative
  * across any number of batches.
  */
class IncrementalSpec extends SparkSpec {
  import spark.implicits._

  private val rows = Seq(
    ("a", 1.0), ("a", 2.5), ("b", -3.0), ("b", 7.0), ("c", 0.25),
    ("a", 4.0), ("c", -1.5), ("d", 9.0))

  test("merge of any split equals the single-pass state") {
    val df = rows.toDF("k", "v")
    val full = Incremental.finish(Incremental.state(df, "k", "v"), "k")
      .orderBy("k").collect().toSeq
    for (m <- Seq(2, 3, 5)) {
      val parts = (0 until m).map(i =>
        Incremental.state(df.where(pmod(hash(col("v")), lit(m)) === i), "k", "v"))
      val merged = parts.reduce(Incremental.merge(_, _, "k"))
      val got = Incremental.finish(merged, "k").orderBy("k").collect().toSeq
      assert(got === full, s"merge of $m-way split diverged")
    }
  }

  test("a key present in only one batch passes through unchanged") {
    val a = Incremental.state(Seq(("x", 2.0), ("x", 4.0)).toDF("k", "v"), "k", "v")
    val b = Incremental.state(Seq(("y", 10.0)).toDF("k", "v"), "k", "v")
    val out = Incremental.finish(Incremental.merge(a, b, "k"), "k")
      .orderBy("k").collect()
    assert(out.map(_.getAs[String]("k")).toSeq === Seq("x", "y"))
    assert(out(0).getAs[Double]("avg_v") === 3.0)
    assert(out(1).getAs[Long]("n") === 1L && out(1).getAs[Double]("total") === 10.0)
  }

  test("incrementalJoin: delta rule equals the full re-join for any split") {
    val r = Seq((1L, "r1"), (2L, "r2"), (3L, "r3"), (4L, "r4")).toDF("k", "ra")
    val s = Seq((1L, "s1"), (1L, "s1b"), (2L, "s2"), (3L, "s3"), (5L, "s5"))
      .toDF("k", "sa")
    val full = r.join(s, Seq("k")).orderBy("k", "ra", "sa").collect().toSeq
    for (m <- Seq(2, 3)) {
      val (rOld, rNew) = (r.where(pmod(col("k"), lit(m)) =!= 0),
        r.where(pmod(col("k"), lit(m)) === 0))
      val (sOld, sNew) = (s.where(pmod(length(col("sa")), lit(m)) =!= 0),
        s.where(pmod(length(col("sa")), lit(m)) === 0))
      val vOld = rOld.join(sOld, Seq("k"))
      val got = Incremental.incrementalJoin(vOld, rOld, rNew, sOld, sNew, Seq("k"))
        .orderBy("k", "ra", "sa").collect().toSeq
      assert(got === full, s"delta rule diverged at split $m")
    }
    // empty deltas: the view refreshes to itself
    val vAll = r.join(s, Seq("k"))
    assert(Incremental.incrementalJoin(vAll, r, r.limit(0), s, s.limit(0), Seq("k"))
      .orderBy("k", "ra", "sa").collect().toSeq === full)
  }

  test("q68 diff classes partition both snapshots and detect every mutation") {
    val out = SparkEntry.queries("q68_table_diff")(spark, "/root/testdata/sf0.001")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val o = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    val keys = o.select(col("o_orderkey")).collect().map(_.getLong(0))
    assert(out("removed") == keys.count(_ % 13 == 0))
    assert(out("added") == keys.count(_ % 11 == 0))
    assert(out("changed") == keys.count(k => k % 13 != 0 && k % 7 == 0))
    assert(out.values.sum == keys.length + keys.count(_ % 11 == 0),
      "classes must partition the union of both snapshots")
  }
  test("q92 changelog apply: tombstone-last drops the key; sequence breaks " +
      "timestamp ties; delete-then-upsert revives") {
    val cl = Seq(
      // key 1: upsert then tombstone → DROPPED (not emitted as null)
      (1L, 1L, 1L, "U", 10.0), (1L, 2L, 1L, "D", 0.0),
      // key 2: tombstone then upsert → revived with the upsert's value
      (2L, 1L, 1L, "D", 0.0), (2L, 2L, 1L, "U", 20.0),
      // key 3: SAME timestamp, higher sequence is the tombstone → dropped
      (3L, 5L, 1L, "U", 1.0), (3L, 5L, 2L, "D", 0.0),
      // key 4: same timestamp, higher sequence is the upsert → kept
      (4L, 5L, 1L, "D", 0.0), (4L, 5L, 2L, "U", 7.0),
      // key 5: lone upsert
      (5L, 9L, 1L, "U", 3.0)
    ).toDF("k", "ts", "seq", "op", "v")
    val out = Incremental.applyChangelog(cl, "k", "ts", "seq", "op", "v")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    assert(!out.contains(1L), "tombstone-last key must be dropped")
    assert(!out.contains(3L), "timestamp-tie tombstone (higher seq) must drop the key")
    assert(out(2L) === ((2L, 1L, 2L, 20.0)), "revived key keeps the last upsert")
    assert(out(4L) === ((2L, 1L, 5L, 7.0)), "timestamp-tie upsert (higher seq) survives")
    assert(out(5L) === ((1L, 0L, 9L, 3.0)))
  }
}
