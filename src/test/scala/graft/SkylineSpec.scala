package graft

import org.apache.spark.sql.functions._

import graft.analytics.Skyline

/** q59's bucketed skyline: brute-force dominance agreement, boundary
  * strictness, degenerate inputs, and the no-global-window plan shape.
  */
class SkylineSpec extends SparkSpec {
  import spark.implicits._

  private def brute(pts: Seq[(Double, Double)]): Set[(Double, Double)] = {
    val d = pts.distinct
    d.filter { case (x, y) => !d.exists { case (x2, y2) =>
      (x2 < x && y2 >= y) || (x2 <= x && y2 > y) } }.toSet
  }

  test("skyline matches the brute-force dominance test on an irregular point set") {
    // deterministic pseudo-random points with duplicates, x-ties and y-ties
    val pts = (0 until 400).map { i =>
      (((i * 37) % 83).toDouble, ((i * 59) % 71).toDouble)
    }
    val got = Skyline.skyline2D(pts.toDF("x", "y"), "x", "y")
      .collect().map(r => (r.getDouble(0), r.getDouble(1))).toSet
    assert(got == brute(pts))
  }

  test("strictness: equal-x keeps only the max y; equal-y keeps only the min x") {
    val pts = Seq((1.0, 5.0), (1.0, 7.0), (3.0, 7.0), (2.0, 9.0))
    val got = Skyline.skyline2D(pts.toDF("x", "y"), "x", "y")
      .collect().map(r => (r.getDouble(0), r.getDouble(1))).toSet
    // (1,5) dominated by (1,7); (3,7) dominated by (1,7); frontier is the rest
    assert(got == Set((1.0, 7.0), (2.0, 9.0)))
  }

  test("degenerate inputs: constant x collapses to one bucket; single point survives") {
    val const = Seq((5.0, 1.0), (5.0, 2.0), (5.0, 3.0)).toDF("x", "y")
    assert(Skyline.skyline2D(const, "x", "y")
      .collect().map(r => (r.getDouble(0), r.getDouble(1))).toSet == Set((5.0, 3.0)))
    assert(Skyline.skyline2D(Seq((1.0, 1.0)).toDF("x", "y"), "x", "y")
      .count() == 1L)
  }

  test("plan: the prefix-max window is bucket-partitioned, never global") {
    val p = SparkEntry.queries("q59_skyline")(spark, "/root/testdata/sf0.001")
      .queryExecution.executedPlan.toString
    assert(p.contains("windowspecdefinition(bk"),
      s"window must partition by bucket, plan:\n$p")
  }
}
