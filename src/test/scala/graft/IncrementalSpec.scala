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
}
