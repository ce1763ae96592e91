package graft

import org.apache.spark.sql.catalyst.expressions.Literal

/** The native expressions must PARTICIPATE in Catalyst optimization, not
  * just execute: literal inputs constant-fold at plan time (free via the
  * Unary/Binary base classes' child-derived `foldable`).
  */
class FoldSpec extends SparkSpec {
  test("native expressions constant-fold under literal inputs") {
    for ((sql, name) <- Seq(
        ("SELECT parse_bitrate_mbps('5 Mbps') AS v", "parse_bitrate_mbps"),
        ("SELECT simhash64(array('a','b')) AS v", "simhash64"),
        ("SELECT rolling_hash64(array('a','b')) AS v", "rolling_hash64"),
        ("SELECT vec_dot(array(CAST(1.0 AS DOUBLE),CAST(2.0 AS DOUBLE)), array(CAST(3.0 AS DOUBLE),CAST(4.0 AS DOUBLE))) AS v", "vec_dot"))) {
      val plan = spark.sql(sql).queryExecution.optimizedPlan
      val exprs = plan.expressions.flatMap(_.collect { case l: Literal => l })
      assert(exprs.nonEmpty && !plan.toString.contains(name),
        s"$name(literals) must fold to a Literal at plan time, got:\n$plan")
    }
  }
}
