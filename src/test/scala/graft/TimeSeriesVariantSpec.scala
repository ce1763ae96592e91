package graft

import org.apache.spark.sql.functions._

/** Semantics of the round-13 additions: q57's gap-fill (dense per-entity
  * hour grid + forward fill) and q58's VARIANT ingestion (typed path
  * extraction feeding relational aggregation).
  */
class TimeSeriesVariantSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("q57: grid is dense per user, fill carries the last observed value, no leading gaps") {
    val out = SparkEntry.queries("q57_gapfill")(spark, dir).collect().toSeq
    assert(out.nonEmpty)
    // dense hour grid per user; forward fill replays as a per-user scan
    out.groupBy(_.getLong(0)).foreach { case (_, rs) =>
      val hs = rs.map(_.getLong(1))
      assert(hs == (hs.head to hs.last by 3600L), "grid must be dense")
      // the first row of every user is an observation by construction
      assert(!rs.head.getBoolean(3), "grid starts at the first observed hour")
      var lastObserved = Double.NaN
      rs.foreach { r =>
        if (!r.getBoolean(3)) lastObserved = r.getDouble(2)
        assert(!r.isNullAt(2), "v_filled must never be null")
        assert(r.getDouble(2) == lastObserved,
          "a gap row must carry the previous observation bit-exactly")
      }
    }
    // and gaps actually exist at this SF — otherwise the fill is untested
    assert(out.exists(_.getBoolean(3)), "expected at least one gap hour")
  }

  test("q57: the fill window is partitioned by user (no global-sort window)") {
    val p = SparkEntry.queries("q57_gapfill")(spark, dir)
      .queryExecution.executedPlan.toString
    assert(p.contains("Window"), s"expected a window operator, plan:\n$p")
    // a Window with an empty partition spec renders as windowspecdefinition(
    // <orderCols>...) with no partition columns before the order spec; the
    // partitioned form carries user_id ahead of h
    assert(p.contains("windowspecdefinition(user_id"),
      s"fill window must partition by user_id, plan:\n$p")
  }

  test("q58: variant_get extracts typed values; missing paths are NULL, not errors") {
    val df = Seq(
      (1L, """{"k": 87, "tags": ["a","b"], "meta": {"d": 2.5}}"""),
      (2L, """{"k": 0}"""),
      (3L, """{"other": true}""")).toDF("id", "js")
      .select(col("id"), parse_json(col("js")).as("v"))
    val got = df.select(col("id"),
        variant_get(col("v"), "$.k", "bigint").as("k"),
        variant_get(col("v"), "$.meta.d", "double").as("d"),
        try_variant_get(col("v"), "$.nope", "bigint").as("absent"),
        variant_get(col("v"), "$.tags[1]", "string").as("tag1"))
      .orderBy("id").collect()
    assert(got(0).getLong(1) == 87L && got(0).getDouble(2) == 2.5 &&
      got(0).getString(4) == "b")
    assert(got(1).getLong(1) == 0L && got(1).isNullAt(2))
    assert(got(2).isNullAt(1), "a missing path extracts as NULL")
    assert(got.forall(_.isNullAt(3)))
    // schema inspection over the variant — the schema-on-read receipt
    val sch = df.select(schema_of_variant(col("v")).as("s"))
      .orderBy(col("s")).collect().map(_.getString(0))
    assert(sch.exists(_.contains("k: BIGINT")), sch.mkString("; "))
  }

  test("q58: the catalog aggregation matches a JSON-path recompute") {
    val ev = spark.read.parquet(s"$dir/events.parquet")
    val viaJson = ev
      .select(get_json_object(col("props"), "$.k").cast("bigint").as("k"))
      .groupBy(pmod(col("k"), lit(8)).as("k_bucket"))
      .agg(count(lit(1)).as("n"), sum(col("k")).as("sum_k"))
      .orderBy("k_bucket").collect().toSeq
    val viaVariant = SparkEntry.queries("q58_variant")(spark, dir)
      .select("k_bucket", "n", "sum_k").collect().toSeq
    assert(viaVariant == viaJson)
  }
}
