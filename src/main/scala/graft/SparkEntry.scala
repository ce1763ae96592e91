package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.analytics.{Dedup, Multimodal, Similarity, TextAnalysis}
import graft.functions.NetFunctions

/** Driver contract — see /root/repo/SURVEY.md §7 + BASELINE.md.
  *
  * Numeric-portability conventions (so Spark results hash-match the DuckDB
  * oracle exactly):
  *  - money/quantity sums go through DECIMAL casts pre-aggregation (exact,
  *    order-independent) — but the OUTPUT type is DOUBLE via a final cast
  *    on both sides. Decimal/hugeint outputs hash-mismatch in the driver
  *    gate (round 1: q01/q03/q04/q08/q09/q19/t03 were value-identical but
  *    dtype-mismatched — Spark parquet decimal/int64 vs DuckDB
  *    DECIMAL/HUGEINT result columns). At sf0.01 every such sum is exactly
  *    representable in a double (< 2^53 when scaled), so the cast of the
  *    identical exact decimal is bit-identical in both engines.
  *  - DuckDB integer sums are wrapped in CAST(… AS BIGINT) — sum(BIGINT)
  *    is HUGEINT there, which pandas-converts to object/float.
  *  - sums that overflow 2^53 when scaled (q19's micro-Mbps) leave as exact
  *    BIGINT in the natural smaller unit instead (bps).
  *  - averages/ratios are a single double division of exact operands
  *    (IEEE-identical in both engines);
  *  - doubles in output are either row passthroughs or round()ed, and any
  *    threshold on a rounded double is applied to the ROUNDED value on both
  *    sides;
  *  - every query has a total ORDER BY; timestamps leave as epoch BIGINT.
  */
object SparkEntry {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")

  private def dec(c: Column, p: Int, sc: Int): Column = c.cast(s"decimal($p,$sc)")

  /** Fixed clock for the NEF fixture query (determinism). */
  private val FixedNow = 1700000000L

  /** d19's public-suffix rule list — a PSL slice with single- and
    * multi-label rules so longest-match is exercised (github.io beats io,
    * co.uk beats uk, example.com beats com); the SQL twin carries the
    * identical literal list.
    */
  private[graft] val d19Psl: Seq[String] =
    Seq("com", "net", "org", "io", "uk", "co.uk", "ac.uk",
      "github.io", "example.com")

  /** Flagship: the full NEF data plane (parse → broadcast-enrich →
    * explode×2/normalize → tag-filter → policy) over the reference's own
    * test payloads, plus a scan of the driver's sf0.001 lineitem to prove
    * the parquet path. Driver smoke-checks rows > 0.
    */
  def entry(spark: SparkSession): DataFrame = {
    val notifs = Fixtures.notifications(spark, Seq(
      Fixtures.perfDataPayload, Fixtures.ueMobilityPayload,
      Fixtures.ueCommPayload, Fixtures.multiEventPayload,
      Fixtures.emptyTrajsPayload, Fixtures.unsupportedEventPayload,
      Fixtures.unknownNotifPayload))
    Ingest.envelopes(notifs, Fixtures.subscriptions(spark), now = lit(FixedNow))
  }

  // ── the operator catalog ──

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // E3/G2 — TPC-H-Q1-shaped hash aggregation with partial+final agg.
    "q01_pricing_summary" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .where(col("l_shipdate") <= to_timestamp(lit("1998-09-01")))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          sum(dec(col("l_quantity"), 18, 2)).cast("double").as("sum_qty"),
          sum(dec(col("l_extendedprice"), 18, 2)).cast("double").as("sum_base_price"),
          sum(dec(col("l_extendedprice"), 18, 2) * dec(lit(1) - col("l_discount"), 3, 2)).cast("double").as("sum_disc_price"),
          sum(dec(col("l_extendedprice"), 18, 2) * dec(lit(1) - col("l_discount"), 3, 2) * dec(lit(1) + col("l_tax"), 3, 2)).cast("double").as("sum_charge"),
          count(lit(1)).as("count_order"))
        .withColumn("avg_qty", col("sum_qty") / col("count_order"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    }),

    // A7/C — scan with predicate pushdown + column pruning; raw row passthrough.
    "q02_filter_pushdown" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .where(col("l_shipdate") >= to_timestamp(lit("1996-01-01")) &&
          col("l_shipdate") < to_timestamp(lit("1997-01-01")) &&
          col("l_quantity") < 3)
        .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"), col("l_extendedprice"))
        .orderBy(col("l_orderkey"), col("l_linenumber"))
    }),

    // B2 — three-way join (customer ⋈ orders ⋈ lineitem) + agg + top-k.
    "q03_top_customers" -> ((s, dir) => {
      val c = t(s, dir, "customer").select(col("c_custkey"), col("c_name"))
      val o = t(s, dir, "orders").select(col("o_orderkey"), col("o_custkey"))
      val l = t(s, dir, "lineitem").select(col("l_orderkey"), col("l_extendedprice"), col("l_discount"))
      c.join(o, col("c_custkey") === col("o_custkey"))
        .join(l, col("o_orderkey") === col("l_orderkey"))
        .groupBy(col("c_custkey"), col("c_name"))
        .agg(
          sum(dec(col("l_extendedprice"), 18, 2) * dec(lit(1) - col("l_discount"), 3, 2)).cast("double").as("revenue"),
          count(lit(1)).as("n_items"))
        .orderBy(col("revenue").desc, col("c_custkey"))
        .limit(10)
    }),

    // B1-analog — broadcast hash joins against tiny dims (region, nation).
    "q04_broadcast_dims" -> ((s, dir) => {
      t(s, dir, "customer")
        .join(broadcast(t(s, dir, "nation")), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(t(s, dir, "region")), col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("r_name"), col("n_name"))
        .agg(count(lit(1)).as("n_customers"),
          sum(dec(col("c_acctbal"), 18, 2)).cast("double").as("total_acctbal"))
        .orderBy(col("r_name"), col("n_name"))
    }),

    // B1 semi — EXISTS as left_semi join.
    "q05_semi_join" -> ((s, dir) => {
      t(s, dir, "customer")
        .where(col("c_mktsegment") === "BUILDING")
        .join(t(s, dir, "orders").select(col("o_custkey")),
          col("c_custkey") === col("o_custkey"), "left_semi")
        .select(col("c_custkey"))
        .orderBy(col("c_custkey"))
    }),

    // B1 anti — NOT EXISTS as left_anti join (the reference's 403 path shape).
    "q06_anti_join" -> ((s, dir) => {
      t(s, dir, "customer")
        .join(t(s, dir, "orders").select(col("o_custkey")),
          col("c_custkey") === col("o_custkey"), "left_anti")
        .select(col("c_custkey"), col("c_name"))
        .orderBy(col("c_custkey"))
    }),

    // G1 — ranking window, deterministic tie-break.
    "q07_window_rank" -> ((s, dir) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      t(s, dir, "orders")
        .withColumn("rn", row_number().over(w))
        .where(col("rn") === 1)
        .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"))
        .orderBy(col("o_custkey"))
    }),

    // G1 — running aggregate + lag over event-time order.
    "q08_window_running" -> ((s, dir) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate"), col("o_orderkey"))
      t(s, dir, "orders")
        .withColumn("running_spend",
          sum(dec(col("o_totalprice"), 18, 2))
            .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)).cast("double"))
        .withColumn("prev_price", lag(col("o_totalprice"), 1).over(w))
        .select(col("o_custkey"), col("o_orderkey"), col("running_spend"), col("prev_price"))
        .orderBy(col("o_custkey"), col("o_orderkey"))
    }),

    // E5 — rollup grouping sets.
    "q09_rollup" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("n"),
          sum(dec(col("l_quantity"), 18, 2)).cast("double").as("sum_qty"))
        .orderBy(col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first)
    }),

    // E4 — exact distinct counts (partial aggregation under the hood).
    "q10_count_distinct" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(countDistinct(col("l_partkey")).as("n_parts"),
          countDistinct(col("l_suppkey")).as("n_supps"),
          count(lit(1)).as("n"))
        .orderBy(col("l_returnflag"))
    }),

    // G5 — intersect.
    "q11_intersect" -> ((s, dir) => {
      val rich = t(s, dir, "customer").where(col("c_acctbal") > 5000).select(col("c_custkey"))
      val big = t(s, dir, "orders").where(col("o_totalprice") > 100000)
        .select(col("o_custkey").as("c_custkey"))
      rich.intersect(big).orderBy(col("c_custkey"))
    }),

    // G5 — except (distinct set difference).
    "q12_except" -> ((s, dir) => {
      t(s, dir, "customer").select(col("c_custkey"))
        .except(t(s, dir, "orders").select(col("o_custkey").as("c_custkey")))
        .orderBy(col("c_custkey"))
    }),

    // G3 — global top-k (TakeOrderedAndProject, no full sort at scale).
    "q13_topk" -> ((s, dir) => {
      t(s, dir, "orders")
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(20)
    }),

    // G4 — union of heterogeneous branches (the three-normalizer shape).
    "q14_union" -> ((s, dir) => {
      val o = t(s, dir, "orders")
      val hi = o.where(col("o_totalprice") > 400000)
        .select(lit("high").as("bucket"), col("o_orderkey"), col("o_totalprice"))
      val lo = o.where(col("o_totalprice") < 5000)
        .select(lit("low").as("bucket"), col("o_orderkey"), col("o_totalprice"))
      hi.unionByName(lo).orderBy(col("bucket"), col("o_orderkey"))
    }),

    // E5 — cube.
    "q15_cube" -> ((s, dir) => {
      t(s, dir, "orders")
        .cube(col("o_orderstatus"), col("o_orderpriority"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("o_orderstatus").asc_nulls_first, col("o_orderpriority").asc_nulls_first)
    }),

    // B3 — equi + range join (ship within 30 days of order date).
    "q16_range_join" -> ((s, dir) => {
      val o = t(s, dir, "orders").select(col("o_orderkey"), col("o_orderdate"), col("o_orderstatus"))
      val l = t(s, dir, "lineitem").select(col("l_orderkey"), col("l_shipdate"))
      o.join(l, col("l_orderkey") === col("o_orderkey") &&
          col("l_shipdate") >= col("o_orderdate") &&
          col("l_shipdate") < col("o_orderdate") + expr("INTERVAL 30 DAYS"))
        .groupBy(col("o_orderstatus"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("o_orderstatus"))
    }),

    // F6 — JSON extraction from events.props (the reference's schema-on-read).
    "q17_events_json" -> ((s, dir) => {
      val k = regexp_extract(col("props"), "\"k\":\\s*(\\d+)", 1)
      t(s, dir, "events")
        .select(col("event_type"), when(k === "", lit(null)).otherwise(k).cast("bigint").as("k"))
        .groupBy(col("event_type"))
        .agg(sum(col("k")).as("sum_k"), count(lit(1)).as("n"))
        .orderBy(col("event_type"))
    }),

    // F2/H3-analog — event-time to unix seconds + tumbling 1h buckets.
    // `ts` has carried two dtypes across testdata generations (LongType
    // nanos, now TIMESTAMP_NTZ micros) — EventTime.hourEpoch dispatches on
    // the schema so this query survives either.
    "q18_events_hourly" -> ((s, dir) => {
      val ev = t(s, dir, "events")
      ev
        .groupBy(col("event_type"),
          EventTime.hourEpoch(ev).as("hour_epoch"))
        .agg(count(lit(1)).as("n"),
          sum(dec(col("value"), 18, 2)).cast("double").as("total_value"))
        .orderBy(col("event_type"), col("hour_epoch"))
    }),

    // F1 — the signature 3GPP BitRate parser over synthesized strings
    // (unit picked by l_linenumber, incl. a no-unit null branch).
    "q19_bitrate_parse" -> ((s, dir) => {
      val unit = element_at(
        array(lit(" bps"), lit(" Kbps"), lit(" Mbps"), lit(" Gbps"), lit(" Tbps"), lit("")),
        (pmod(col("l_linenumber"), lit(6)) + 1).cast("int"))
      val br = concat(col("l_quantity").cast("string"), unit)
      val total = sum(dec(col("mbps"), 28, 6))
      // native fused parser when registered (one compiled-regex pass/row vs
      // two regexp_extract passes; value-identical — NetFunctionsSpec),
      // declarative fallback otherwise
      val parse: Column => Column =
        if (s.catalog.functionExists("parse_bitrate_mbps"))
          c => call_function("parse_bitrate_mbps", c.cast("string"))
        else NetFunctions.parseBitrateMbps
      t(s, dir, "lineitem")
        .select(parse(br).as("mbps"))
        // The exact 6-dp Mbps total exceeds 2^53 as bps (×1e6) even at
        // sf0.01 (double inexact), and the single-BIGINT bps total would
        // overflow 2^63 near sf1 — so emit the exact decimal sum as TWO
        // BIGINTs: the floored Mbps part (overflows only past sf~3e5) and
        // the sub-Mbps remainder in micro-Mbps. Both engines compute the
        // split on the identical exact decimal.
        .agg(
          floor(total).cast("bigint").as("total_mbps_int"),
          ((total - floor(total)) * lit(1000000)).cast("bigint").as("micro_rem"),
          count(col("mbps")).as("n_parsed"),
          count(lit(1)).as("n"))
    }),

    // The flagship NEF pipeline on the reference's own fixtures, flattened —
    // oracle is a literal VALUES golden (reference tests/test_receiver.py).
    "q20_nef_envelope" -> ((s, _) => {
      entry(s).select(
        col("event"),
        col("timestamp"),
        col("tags.snssai_sst").as("sst"),
        col("tags.snssai_sd").as("sd"),
        col("tags.dnn").as("dnn"),
        col("tags.ueIpv4Addr").as("ipv4"),
        col("tags.appId").as("app_id"),
        col("tags.supi").as("supi"),
        element_at(col("metrics"), "thrputUl_mbps").as("thrput_ul"),
        element_at(col("metrics"), "thrputDl_mbps").as("thrput_dl"),
        element_at(col("metrics"), "pdb_ms").cast("bigint").as("pdb_ms"),
        element_at(col("metrics"), "plr_per_thousand").cast("bigint").as("plr"),
        // guarded: with legacy sizeOfNull, size(NULL) is -1 — the oracle
        // (and the reference, which has no trajectory key at all here)
        // expects NULL for non-mobility rows.
        when(col("trajectory").isNotNull, size(col("trajectory"))).as("n_traj"),
        element_at(col("trajectory"), 1).getField("ts").as("traj0_ts"),
        element_at(col("trajectory"), 1).getField("tac").as("traj0_tac"),
        element_at(col("comms"), 1).getField("endTime").as("comm0_end"),
        element_at(col("comms"), 1).getField("ulVol").as("comm0_ul"),
        element_at(col("comms"), 1).getField("dlVol").as("comm0_dl"))
        .orderBy(col("event"), col("timestamp"), coalesce(col("thrput_dl"), lit(-1.0)))
    }),

    // E1 — discovered metric fields over the fixture envelopes.
    // discoveredFields consumes the envelope frame in THREE union branches;
    // localCheckpoint cuts the lineage so the (large) NEF parse expression
    // is planned and codegen'd once, not three times — the recompute showed
    // up as multi-second planning variance on a 6-row query.
    "q21_discovered_fields" -> ((s, _) => {
      sinks.Sinks.discoveredFields(entry(s).localCheckpoint()).orderBy(col("field"))
    }),

    // H3 — session windows (30-minute gap) over event time, truncated to
    // seconds (the nanos remainder is below the gap resolution). A session
    // spans events whose gaps are <= 30 min (touching intervals merge);
    // window end = last event + gap (Spark merges on overlap-or-touch — the DuckDB twin reproduces it
    // with a gaps-and-islands cumulative sum).
    "q24_session_windows" -> ((s, dir) => {
      val ev = t(s, dir, "events")
      ev
        // floor-to-second, dtype-dispatched (EventTime)
        .withColumn("et", EventTime.secondsFloor(ev))
        .groupBy(col("event_type"), session_window(col("et"), "30 minutes"))
        .agg(count(lit(1)).as("n_events"),
          sum(dec(col("value"), 18, 2)).cast("double").as("total_value"))
        .select(col("event_type"),
          unix_timestamp(col("session_window.start")).as("session_start"),
          unix_timestamp(col("session_window.end")).as("session_end"),
          col("n_events"), col("total_value"))
        .orderBy(col("event_type"), col("session_start"))
    }),

    // H3 — SLIDING windows (2h window, 1h slide) over event time: each
    // event lands in exactly windowDur/slide = 2 windows. The DuckDB twin
    // unnests the two aligned window starts per event.
    "q25_sliding_windows" -> ((s, dir) => {
      val ev = t(s, dir, "events")
      ev
        .withColumn("et", EventTime.secondsFloor(ev))
        .groupBy(col("event_type"), window(col("et"), "2 hours", "1 hour"))
        .agg(count(lit(1)).as("n"))
        .select(col("event_type"),
          unix_timestamp(col("window.start")).as("window_start"), col("n"))
        .orderBy(col("event_type"), col("window_start"))
    }),

    // E3/F8 — exact linear-interpolated percentiles (both engines use the
    // p·(n−1) type-7 convention, so the doubles are bit-comparable).
    "q27_percentiles" -> ((s, dir) => {
      t(s, dir, "orders")
        .groupBy(col("o_orderstatus"))
        .agg(
          expr("percentile(o_totalprice, 0.5)").as("p50"),
          expr("percentile(o_totalprice, 0.95)").as("p95"),
          count(lit(1)).as("n"))
        .orderBy(col("o_orderstatus"))
    }),

    // IQR outlier gate (Tukey fences): per event_type, exact interpolated
    // quartiles (q27's machinery) → [q1 − 1.5·IQR, q3 + 1.5·IQR] bounds →
    // out-of-fence row counts. The numeric-column cleaning rule next to
    // q45's declared expectations — the bounds come from the DATA. No
    // rounding on the gate: both engines derive bit-identical quartiles
    // (q27-proven), 1.5 is exact, and the fence comparison reuses those
    // exact doubles. Dim-sized stats broadcast back onto the fact scan.
    "q53_iqr_outliers" -> ((s, dir) => {
      val ev = t(s, dir, "events")
      val stats = ev.groupBy(col("event_type")).agg(
          expr("percentile(value, 0.25)").as("q1"),
          expr("percentile(value, 0.75)").as("q3"))
        .select(col("event_type"),
          (col("q1") - (col("q3") - col("q1")) * 1.5).as("lo"),
          (col("q3") + (col("q3") - col("q1")) * 1.5).as("hi"))
      ev.join(broadcast(stats), Seq("event_type"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"),
          sum(when(col("value") < col("lo") || col("value") > col("hi"), 1L)
            .otherwise(0L)).as("n_outliers"),
          min(col("lo")).as("lo"), min(col("hi")).as("hi"))
        .orderBy(col("event_type"))
    }),

    // F8/E5 — pivot (wide conditional aggregation): order counts by
    // priority × status. Explicit pivot values keep the plan static (no
    // driver-side distinct-values job — at 100 TB the value scan is a full
    // pass, so production pivots should always declare their columns).
    "q28_pivot" -> ((s, dir) => {
      t(s, dir, "orders")
        .groupBy(col("o_orderpriority"))
        .pivot("o_orderstatus", Seq("F", "O", "P"))
        .agg(count(lit(1)))
        .select(col("o_orderpriority"),
          coalesce(col("F"), lit(0L)).as("n_f"),
          coalesce(col("O"), lit(0L)).as("n_o"),
          coalesce(col("P"), lit(0L)).as("n_p"))
        .orderBy(col("o_orderpriority"))
    }),

    // C1/F8 — standalone positional explode (LATERAL with ordinality): the
    // first 5 tokens of each document with their positions. One generate
    // per row, no join.
    "q29_posexplode" -> ((s, dir) => {
      analytics.Par.spreadForCpu(t(s, dir, "documents"))
        .where(col("doc_id") < 20)
        .select(col("doc_id"), TextAnalysis.tokens(col("text")).as("ws"))
        .select(col("doc_id"), posexplode(slice(col("ws"), 1, 5)))
        .withColumnRenamed("col", "token")
        .orderBy(col("doc_id"), col("pos"))
    }),

    // E4 at scale — HLL approximate distinct: one pass, fixed-size partial
    // state merged across partitions (vs countDistinct's shuffle of every
    // distinct value — THE count-distinct shape for 100 TB). Both the
    // HyperLogLog++ estimator and a mergeable Apache DataSketches HLL
    // sketch. The exact count (here only to exhibit the error) runs as a
    // SEPARATE aggregation joined on the 3-row result: mixing it into one
    // agg triggers the distinct-rewrite, whose first phase groups by
    // (flag, partkey) — and every one of those ~200k groups would carry
    // the 16 KB rsd=0.01 HLL++ partial buffer (measured: 27 s vs 2 s at
    // sf0.1). Estimator internals are engine-specific, so the raw
    // estimates cannot hash-match a DuckDB twin; instead the OUTPUT is the
    // oracle-checkable part of the contract: the exact distinct count
    // (hash-matched cross-engine) plus per-estimator ≤2%-relative-error
    // flags, which the twin asserts as literal TRUE — the gate now checks
    // the error contract on real data, not just in OperatorsSpec. Both
    // estimators are order-insensitive (HLL register merge is a max), so
    // the flags are deterministic under task reordering.
    "q30_approx_distinct" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
      val approx = li.groupBy(col("l_returnflag"))
        .agg(
          approx_count_distinct(col("l_partkey"), rsd = 0.01).as("approx_parts"),
          hll_sketch_estimate(hll_sketch_agg(col("l_partkey"))).as("sketch_parts"))
      val exact = li.groupBy(col("l_returnflag"))
        .agg(countDistinct(col("l_partkey")).as("exact_parts"))
      approx.join(exact, Seq("l_returnflag"))
        .select(col("l_returnflag"), col("exact_parts"),
          (abs(col("approx_parts") - col("exact_parts")) <=
            col("exact_parts") * 0.02).as("approx_err_ok"),
          (abs(col("sketch_parts") - col("exact_parts")) <=
            col("exact_parts") * 0.02).as("sketch_err_ok"))
        .orderBy(col("l_returnflag"))
    }),

    // E5 — arbitrary GROUPING SETS (beyond q09 rollup / q15 cube) with
    // grouping_id disambiguating which set produced each row.
    "q31_grouping_sets" -> ((s, dir) => {
      t(s, dir, "orders")
        .groupingSets(
          Seq(Seq(col("o_orderstatus")), Seq(col("o_orderpriority")), Seq()),
          col("o_orderstatus"), col("o_orderpriority"))
        .agg(count(lit(1)).as("n"),
          grouping_id(col("o_orderstatus"), col("o_orderpriority")).as("gid"))
        .orderBy(col("gid"), col("o_orderstatus").asc_nulls_first,
          col("o_orderpriority").asc_nulls_first)
    }),

    // G1/F8 — VALUE-range window frame (vs q08's ROWS frame): per-customer
    // rolling 30-day spend. The frame bound is on the ORDER-BY VALUE
    // (epoch seconds), so ties and gaps behave identically cross-engine;
    // decimal-exact sum keeps the double bit-comparable.
    "q33_range_frame" -> ((s, dir) => {
      // NTZ → TIMESTAMP → epoch long (exact under the UTC session TZ)
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate").cast("timestamp").cast("long"))
        .rangeBetween(-30L * 86400L, 0L)
      t(s, dir, "orders")
        .select(col("o_custkey"), col("o_orderkey"),
          sum(dec(col("o_totalprice"), 18, 2)).over(w).cast("double").as("spend_30d"))
        .orderBy(col("o_custkey"), col("o_orderkey"))
    }),

    // G1 — distribution analytics: quartile bucketing + exact rank ratios
    // (total tiebreak order makes every value deterministic cross-engine).
    "q34_distribution_windows" -> ((s, dir) => {
      val w = Window.partitionBy(col("o_orderstatus"))
        .orderBy(col("o_totalprice"), col("o_orderkey"))
      t(s, dir, "orders")
        .select(col("o_orderstatus"), col("o_orderkey"),
          ntile(4).over(w).cast("bigint").as("quartile"),
          percent_rank().over(w).as("pr"),
          cume_dist().over(w).as("cd"))
        .orderBy(col("o_orderstatus"), col("o_orderkey"))
    }),

    // B3 — as-of join: for each error event, the user's most recent
    // purchase at or before it (union+window shape, no range-join blowup);
    // DuckDB twin uses its native ASOF JOIN. Testdata has no (user_id, ts)
    // purchase duplicates, so the "single most recent" row is well-defined.
    "q26_asof_join" -> ((s, dir) => {
      val e = t(s, dir, "events")
        .select(col("user_id"), col("ts"), col("event_type"),
          col("event_id"), col("value"))
      val errors = e.where(col("event_type") === "error")
        .select(col("user_id"), col("ts"), col("event_id"))
      val purchases = e.where(col("event_type") === "purchase")
        .select(col("user_id"), col("ts"), col("value"))
      operators.AsOfJoin.leftAsOf(errors, purchases, Seq("user_id"), "ts", "purch_")
        .select(col("user_id"), col("event_id"),
          round(col("purch_value"), 6).as("purch_value"))
        .orderBy(col("user_id"), col("event_id"))
    }),

    // D1/D2/F9 — the compiled policy gate with a non-trivial rule set:
    // deny UE_COMM rows, sha2-hash supi, redact dnn, drop the pdb_ms metric
    // (reference receiver.py:412–433; README.md:10 "field filtering,
    // hashing, redaction").
    "q22_policy_gate" -> ((s, _) => {
      val notifs = Fixtures.notifications(s, Seq(
        Fixtures.perfDataPayload, Fixtures.ueMobilityPayload,
        Fixtures.ueCommPayload, Fixtures.multiEventPayload))
      val rules = policy.Policy.Rules(
        deny = col("event") === "UE_COMM",
        hashTags = Set("supi"),
        redactTags = Set("dnn"),
        dropMetrics = Set("pdb_ms"))
      Ingest.envelopes(notifs, Fixtures.subscriptions(s), rules, now = lit(FixedNow))
        .select(
          col("event"),
          col("timestamp"),
          col("tags.supi").as("supi_h"),
          col("tags.dnn").as("dnn"),
          col("tags.ueIpv4Addr").as("ipv4"),
          element_at(col("metrics"), "pdb_ms").cast("bigint").as("pdb_ms"),
          element_at(col("metrics"), "plr_per_thousand").cast("bigint").as("plr"),
          element_at(col("metrics"), "thrputDl_mbps").as("thrput_dl"))
        .orderBy(col("event"), col("timestamp"), coalesce(col("thrput_dl"), lit(-1.0)))
    }),

    // E2/A3/F6-serialize/H6 — the Kafka batch-collect contract: ALL
    // surviving records of a subscription leave as ONE JSON-array message
    // keyed by notifId (reference receiver.py:442–445; golden from
    // tests/test_receiver.py:226–237). The unknown-notifId payload proves
    // the 403 path contributes nothing.
    "q23_kafka_batches" -> ((s, _) => {
      val notifs = Fixtures.notifications(s, Seq(
        Fixtures.perfDataPayload, Fixtures.ueCommPayload,
        Fixtures.unknownNotifPayload))
      val env = Ingest.envelopes(notifs, Fixtures.subscriptions(s), now = lit(FixedNow))
      sinks.Sinks.kafkaBatches(env, deterministicOrder = true)
        .orderBy(col("key"))
    }),

    // Dedup: exact (hash groupBy on full text).
    "d01_dedup_exact" -> ((s, dir) => {
      Dedup.exact(t(s, dir, "documents"))
        .select(col("keep_id"), col("n_copies"))
        .orderBy(col("keep_id"))
    }),

    // Dedup: md5 content fingerprint (constant-width shuffle keys at scale).
    "d02_dedup_fingerprint" -> ((s, dir) => {
      analytics.Par.spreadForCpu(t(s, dir, "documents"))
        .select(col("doc_id"), TextAnalysis.contentFingerprint(col("text")).as("fp"))
        .orderBy(col("doc_id"))
    }),

    // Dedup: exact word-3-gram Jaccard via inverted shingle index.
    "d03_ngram_jaccard" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      Dedup.ngramJaccardPairs(docs.where(col("doc_id") < 50), docs, n = 3, threshold = 0.2,
        maxDf = 1000L) // finite cap = skew guard; exact here (corpus max DF 25 << 1000)
        .orderBy(col("a_id"), col("b_id"))
    }),

    // Dedup: ASYMMETRIC containment |A∩B|/|A| — sub-document duplication
    // (a doc contained in a larger one scores ~1.0 while its symmetric
    // Jaccard can be near 0). Same inverted-index candidate generation.
    "d09_containment" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      Dedup.containmentPairs(docs.where(col("doc_id") < 50), docs, n = 3, threshold = 0.4)
        .orderBy(col("a_id"), col("b_id"))
    }),

    // Dedup: the MinHash CORE, oracle-checked — signatures over the
    // PORTABLE md5-low64 shingle hash, one row per (doc, position). With
    // d08 this proves both sketch families' machinery (universal-hash
    // running minimum here; vote/fold there) bit-exact cross-engine; the
    // production operators (d04/d05) swap in xxhash64 for speed.
    "d10_minhash_portable" -> ((s, dir) => {
      val tok = analytics.Par.spreadForCpu(t(s, dir, "documents"))
        .select(col("doc_id"), TextAnalysis.tokens(col("text")).as("ws"))
        .where(size(col("ws")) >= 3)
      tok.select(col("doc_id"), Dedup.shinglesFromTokens(col("ws"), 3).as("sh"))
        .select(col("doc_id"), transform(col("sh"), sh => Dedup.md5Low64(sh)).as("hs"))
        .select(col("doc_id"), Dedup.minhashFromHashes(col("hs"), 16).as("sig"))
        .select(col("doc_id"), posexplode(col("sig")))
        .toDF("doc_id", "pos", "min_hash")
        .orderBy(col("doc_id"), col("pos"))
    }),

    // Dedup: MinHash + banded LSH candidates. BOTH families run — the
    // xxhash64 production variant exercises the fast path every round —
    // but the VALUE-compared rows are the PORTABLE (md5-low64) pair set,
    // scoped like d11's: banded-MinHash membership near the 0.4
    // est_jaccard threshold is hash-family-dependent (the same
    // non-invariance d05 documents for fingerprint cardinality), so
    // hash-matching the xx rows against an md5 oracle would let a benign
    // data refresh flip a boundary pair and redden the gate with no real
    // regression. The xx family rides as the MONITORED `portable_agree`
    // statistic instead: symmetric difference vs the portable set ≤ 2
    // pairs. est_jaccard stays family-internal; d11 below carries the
    // hash-matched estimates.
    "d04_minhash_lsh" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val xx = Dedup.minhashCandidates(docs, n = 3, k = 64, bands = 16, threshold = 0.4)
        .select(col("a_id"), col("b_id"))
      val md5 = Dedup.minhashCandidates(docs, n = 3, k = 64, bands = 16, threshold = 0.4,
          portableHash = true)
        .select(col("a_id"), col("b_id"))
      val agree = xx.union(md5).groupBy(col("a_id"), col("b_id")).count()
        .where(col("count") === 1) // pairs found by exactly one family
        .agg((count(lit(1)) <= 2).as("portable_agree"))
      md5.crossJoin(agree) // 1-row scalar broadcast
        .orderBy(col("a_id"), col("b_id"))
    }),

    // Dedup: the FULL LSH pair pipeline, oracle-checked end-to-end —
    // signatures over the portable md5-low64 shingle hash (as d10), then
    // the SAME banding / bucket self-join / signature-agreement estimate
    // code path as d04 (Dedup.minhashCandidates, portableHash=true). The
    // DuckDB twin rebuilds signatures from the shared constant generator
    // and expresses each band as slice equality, so candidate generation
    // AND est_jaccard are hash-matched cross-engine.
    "d11_minhash_lsh_portable" -> ((s, dir) => {
      Dedup.minhashCandidates(t(s, dir, "documents"), n = 3, k = 64, bands = 16,
          threshold = 0.4, portableHash = true)
        .orderBy(col("a_id"), col("b_id"))
    }),

    // Dedup: the 100 TB cluster path DECLARED — LSH candidate pairs
    // (portable twin of d04's generation) → connected components → the
    // same (cluster_id, cluster_size, is_survivor) resolution as d07.
    // Oracle = d11's pair chain feeding d07's recursive-CTE closure.
    "d12_dedup_clusters_approx" -> ((s, dir) => {
      Dedup.dedupClustersApprox(t(s, dir, "documents"), n = 3, k = 64, bands = 16,
          threshold = 0.4, portableHash = true)
        .orderBy(col("doc_id"))
    }),

    // Content-defined chunking + chunk dedup (Rabin/FastCDC family on
    // token streams): content-keyed cut points survive insertions that
    // shift every fixed block; shared chunk fingerprints localize WHICH
    // PARTS of near-dup documents coincide. Pure integer/md5 gate.
    "d23_cdc_chunks" -> ((s, dir) =>
      Dedup.cdcChunkDedup(t(s, dir, "documents"), w = 4, divisor = 16)
        .orderBy(col("doc_id"), col("chunk_idx"))),

    // Graph centrality, two-sided: deterministic fixed-iteration HITS
    // over g01's synthesized link graph — authority (what good hubs point
    // at) and hub (link-directory value) scores, L1-normalized per
    // half-step. Same pinning discipline as g01; the twin replays all 5
    // iterations (10 half-steps) as a CTE chain.
    "g02_hits" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val n = docs.count()
      val edges = docs.select(col("doc_id").as("src"),
          pmod(col("doc_id") * 7 + 13, lit(n)).as("dst"))
        .unionByName(docs.select(col("doc_id").as("src"),
          pmod(col("doc_id") * 31 + 7, lit(n)).as("dst")))
      analytics.Graph.hits(edges, docs, iters = 5, idCol = "doc_id")
        .select(col("id").as("doc_id"), col("auth"), col("hub"))
        .orderBy(col("doc_id"))
    }),

    // Soft dedup: reweight near-duplicate clusters instead of dropping
    // them — each doc in a cluster of size s gets weight 1/s (9 dp), so
    // every cluster contributes one document's worth of training mass.
    // Same d12 cluster chain; the weight is a pure projection on top.
    "d22_soft_dedup" -> ((s, dir) =>
      Dedup.softDedupWeights(
          Dedup.dedupClustersApprox(t(s, dir, "documents"), n = 3, k = 64,
            bands = 16, threshold = 0.4, portableHash = true))
        .orderBy(col("doc_id"))),

    // Graph centrality: deterministic fixed-iteration PageRank over a
    // synthesized 2-out-link graph (dst = (7·id+13) mod n and
    // (31·id+7) mod n — derived from the corpus size, so it scales with
    // the table). Every float pinned: src-ordered contribution folds,
    // round-15 contributions, round-12 ranks. The twin replays all 10
    // iterations as a CTE chain.
    "g01_pagerank" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val n = docs.count()
      val edges = docs.select(col("doc_id").as("src"),
          pmod(col("doc_id") * 7 + 13, lit(n)).as("dst"))
        .unionByName(docs.select(col("doc_id").as("src"),
          pmod(col("doc_id") * 31 + 7, lit(n)).as("dst")))
      analytics.Graph.pageRank(edges, docs, iters = 10, idCol = "doc_id")
        .select(col("id").as("doc_id"), col("pr"))
        .orderBy(col("doc_id"))
    }),

    // Dataset profiling (ANALYZE-shaped): one-scan numeric column profile
    // of lineitem — nulls, distincts, min/max, exact-decimal mean — in
    // long form. The twin recomputes each column's row from the same
    // exact-sum formula.
    "q44_profile" -> ((s, dir) =>
      analytics.Profile.numericProfile(t(s, dir, "lineitem"),
          Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax"))
        .orderBy(col("column"))),

    // ANALYZE-style distribution shape: 8-bin equi-width histogram of
    // l_extendedprice, bounds from the data. No rounding anywhere — the
    // bin index is floor of identical IEEE ops, boundary-free.
    "q52_histogram" -> ((s, dir) =>
      analytics.Profile.histogram(t(s, dir, "lineitem"), "l_extendedprice", nBins = 8)
        .orderBy(col("bin"))),

    // Data-quality expectations (Deequ-shaped): named constraint checks
    // over lineitem in one scan — violation counts + pass flags, nulls
    // count as violations. tax_under_5pct intentionally FAILS (TPC-H tax
    // ranges to 0.08) so real counting, not just all-green flags, is on
    // the gate.
    "q45_expectations" -> ((s, dir) =>
      analytics.Profile.expectations(t(s, dir, "lineitem"), Seq(
          "quantity_range" -> col("l_quantity").between(1, 50),
          "price_positive" -> (col("l_extendedprice") > 0),
          "discount_bounds" -> col("l_discount").between(0.00, 0.10),
          "shipdate_range" -> col("l_shipdate").between(
            lit("1995-01-01").cast("timestamp"), lit("2001-12-31").cast("timestamp")),
          "returnflag_domain" -> col("l_returnflag").isin("A", "N", "R"),
          "tax_under_5pct" -> (col("l_tax") <= 0.05)))
        .orderBy(col("check_name"))),

    // Incremental aggregate maintenance: per-event-type stats refreshed
    // by merging the stored state of the "old" 80% with the state of a
    // new 20% batch (disjoint event_id split) — algebraic partials
    // (count / exact decimal sum / min / max), avg derived at finish.
    // The oracle is the SINGLE-PASS recompute over all events: the merge
    // must be bit-identical to never having split at all.
    "q48_incr_agg" -> ((s, dir) => {
      val ev = t(s, dir, "events")
      val oldState = analytics.Incremental.state(
        ev.where(pmod(col("event_id"), lit(10)) < 8), "event_type", "value")
      val batchState = analytics.Incremental.state(
        ev.where(pmod(col("event_id"), lit(10)) >= 8), "event_type", "value")
      analytics.Incremental.finish(
          analytics.Incremental.merge(oldState, batchState, "event_type"),
          "event_type")
        .orderBy(col("event_type"))
    }),

    // EWMA feature per user (α=0.25): the classic online smoothing a
    // feature store computes per entity — the recurrence is replayed by
    // folding the (ts, event_id)-ordered value list, seeded with the
    // first value on both engines. The recurrence runs in EXACT DECIMAL
    // (values at (18,6), state at (28,9), round-9 each step): a
    // round-the-double variant measured a cross-engine flip at ~50
    // magnitude (ulp 7e-15 vs the 1e-9 half boundary → ~7e-6 boundary
    // probability per step × 10^4 steps at sf0.01 — Spark rounds the
    // shortest decimal repr, DuckDB the exact binary value, the s09
    // lesson at scale-magnitude doubles); decimal arithmetic has no
    // boundary at all. The (18,6)→(28,9) double cast is deliberate:
    // double→decimal conversion itself is engine-divergent at fine
    // scales (same shortest-repr-vs-binary split), so the input coarsens
    // at 6 dp (boundary odds 7e-9/value) and then WIDENS exactly to the
    // fold scale — which must be the LIST ELEMENT type, because DuckDB's
    // list_reduce unifies each lambda result back to the element type
    // (measured: (18,6) elements silently truncated the fold to 6 dp).
    // One shuffle on user_id; per-user state is the
    // event list (bounded by per-entity history, the d15 trade).
    "q50_ewma" -> ((s, dir) => {
      val evRaw = t(s, dir, "events")
      val quarter = lit(new java.math.BigDecimal("0.25"))
      val threeQ = lit(new java.math.BigDecimal("0.75"))
      evRaw
        .select(col("user_id"),
          struct(EventTime.epochMicros(evRaw).as("o1"), col("event_id").as("o2"),
            col("value").cast("decimal(18,6)").cast("decimal(28,9)").as("v")).as("r"))
        .groupBy(col("user_id")).agg(collect_list(col("r")).as("rs"))
        .select(col("user_id"),
          size(col("rs")).cast("bigint").as("n"),
          aggregate(transform(array_sort(col("rs")), x => x.getField("v")),
            lit(null).cast("decimal(28,9)"),
            (acc, x) => when(acc.isNull, x)
              .otherwise(round(quarter * x + threeQ * acc, 9)
                .cast("decimal(28,9)")))
            .cast("double").as("ewma"))
        .orderBy(col("user_id"))
    }),

    // Cohort retention over the event stream: users grouped by first-
    // activity day, distinct-user counts per (cohort, day offset) plus
    // the retention ratio — the engagement matrix behind every "day-N
    // retention" metric. Day buckets are exact integer division of epoch
    // micros; two shuffles (per-user min, then the cohort-cell distinct).
    "q51_retention" -> ((s, dir) => {
      val evRaw = t(s, dir, "events")
      val us = EventTime.epochMicros(evRaw)
      // subtract the remainder first so the division is of an exact
      // multiple — the quotient is then an exactly-representable integer
      val e = evRaw.select(col("user_id"),
        ((us - pmod(us, lit(86400000000L))) / lit(86400000000L)).cast("long").as("day"))
      val first = e.groupBy(col("user_id")).agg(min(col("day")).as("cohort_day"))
      val sizes = first.groupBy(col("cohort_day")).agg(count(lit(1)).as("cohort_size"))
      e.join(first, Seq("user_id"))
        .groupBy(col("cohort_day"), (col("day") - col("cohort_day")).as("day_offset"))
        .agg(countDistinct(col("user_id")).as("n_users"))
        .join(sizes, Seq("cohort_day"))
        .select(col("cohort_day"), col("day_offset"), col("n_users"), col("cohort_size"),
          round(col("n_users").cast("double") / col("cohort_size"), 6).as("retention"))
        .orderBy(col("cohort_day"), col("day_offset"))
    }),

    // Dead-letter routing: the ingest-hardening idiom the reference's
    // bare `request.json()` lacks — parse with an explicit corrupt-record
    // column (PERMISSIVE + columnNameOfCorruptRecord, the Spark-native
    // DLQ), so malformed payloads route to quarantine WITH their raw
    // bytes instead of poisoning the batch or vanishing. Corruption
    // synthesized deterministically (every 7th event loses its closing
    // brace); both engines agree '{"k": 6' is invalid JSON.
    "q55_dlq" -> ((s, dir) => {
      val ev = t(s, dir, "events")
      val payload = when(pmod(col("event_id"), lit(7)) === 0,
          expr("substring(props, 1, length(props) - 1)"))
        .otherwise(col("props"))
      val schema = org.apache.spark.sql.types.StructType.fromDDL(
        "k INT, _corrupt STRING")
      ev.select(col("event_id"), payload.as("payload"))
        .withColumn("parsed", from_json(col("payload"), schema,
          Map("columnNameOfCorruptRecord" -> "_corrupt")))
        .select(col("event_id"),
          when(col("parsed._corrupt").isNotNull, lit("dlq"))
            .otherwise(lit("ok")).as("route"),
          when(col("parsed._corrupt").isNull, col("parsed.k")).as("k"),
          col("parsed._corrupt").as("quarantined"))
        .orderBy(col("event_id"))
    }),

    // Latest-snapshot compaction — the READ side of q46's SCD2 build (and
    // the batch form of the streaming KeyedUpsertStore): collapse the
    // change-log to one current row per user, latest (ts, event_id) wins.
    // One shuffle on the key; at 100 TB this is the periodic compaction
    // job that keeps CDC tables queryable without replaying history.
    "q54_compact" -> ((s, dir) => {
      val evRaw = t(s, dir, "events")
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts_us").desc, col("event_id").desc)
      evRaw.select(col("user_id"), col("event_id"), col("event_type"),
          col("value"), EventTime.epochMicros(evRaw).as("ts_us"))
        .withColumn("rn", row_number().over(w))
        .where(col("rn") === 1).drop("rn")
        .orderBy(col("user_id"))
    }),

    // Funnel analysis over the event stream: per user, the first 'view',
    // the first 'click' STRICTLY after it, the first 'purchase' strictly
    // after that — stage reached + time-to-convert. The ordered-sequence
    // sibling of q24's sessionization: three per-user min-aggregations,
    // each stage's candidate set gated by the previous stage's timestamp.
    // Scale: three shuffles on the same user key (a single-shuffle
    // alternative folds the per-user ts-sorted event list through the
    // stage machine — the d15 bounded-per-row-state trade; the 3-agg
    // form stays fully codegen'd and lets AQE size each stage's shuffle).
    "q49_funnel" -> ((s, dir) => {
      val evRaw = t(s, dir, "events")
      val ev = evRaw.select(col("user_id"), col("event_type"),
        EventTime.epochMicros(evRaw).as("ts_us"))
      val users = ev.select(col("user_id")).distinct()
      val v = ev.where(col("event_type") === "view")
        .groupBy(col("user_id")).agg(min(col("ts_us")).as("t_view"))
      val c = ev.where(col("event_type") === "click")
        .join(v, Seq("user_id")).where(col("ts_us") > col("t_view"))
        .groupBy(col("user_id")).agg(min(col("ts_us")).as("t_click"))
      val p = ev.where(col("event_type") === "purchase")
        .join(c, Seq("user_id")).where(col("ts_us") > col("t_click"))
        .groupBy(col("user_id")).agg(min(col("ts_us")).as("t_purchase"))
      users.join(v, Seq("user_id"), "left")
        .join(c, Seq("user_id"), "left")
        .join(p, Seq("user_id"), "left")
        .select(col("user_id"), col("t_view"), col("t_click"), col("t_purchase"),
          when(col("t_purchase").isNotNull, 3)
            .when(col("t_click").isNotNull, 2)
            .when(col("t_view").isNotNull, 1)
            .otherwise(0).cast("int").as("stage"),
          (col("t_purchase") - col("t_view")).as("convert_us"))
        .orderBy(col("user_id"))
    }),

    // Weighted sampling without replacement (Efraimidis–Spirakis on the
    // portable md5 uniform): quality-biased but diversity-preserving —
    // the middle ground between q37's hard top-k and q36's uniform draw.
    "q56_weighted_sample" -> ((s, dir) =>
      analytics.Sampling.weightedSample(
          qualityScored(t(s, dir, "documents")),
          stratumCol = "lang", weightCol = "quality", k = 15, idCol = "doc_id")
        .select(col("lang"), col("sample_rank").as("rnk"), col("doc_id"),
          col("quality"), col("es_key"))
        .orderBy(col("lang"), col("rnk"))),

    // Heavy hitters by Misra-Gries sketch (k=16 counters): the bounded-
    // memory top-terms path for open vocabularies a groupBy can't hold.
    // Item stream = document tokens with three synthesized hot items
    // (position-derived, ~14% each — the q19 synthesized-input idiom;
    // the 31-token tail sits below threshold and forces real decrements,
    // k=16 < 31). Output = the EXACT heavy hitters (c·(k+1) > n, an
    // integer predicate, hash-matched) with the q30/q35 sketch contract:
    // in_sketch is TRUE by the MG guarantee (undercount ≤ n/(k+1)),
    // cand_within_k is TRUE structurally. Sketch pass + exact pass —
    // the two-pass shape a 100 TB deployment uses (the exact pass then
    // only aggregates the ≤k candidate keys).
    "q47_heavy_hitters" -> ((s, dir) => {
      import s.implicits._
      val k = 16
      val items = analytics.Par.spreadForCpu(t(s, dir, "documents"))
        .select(posexplode(TextAnalysis.tokens(col("text"))).as(Seq("pos", "tok")))
        .select(when(pmod(col("pos"), lit(7)) < 3,
            concat(lit("hot"), pmod(col("pos"), lit(3)).cast("string")))
          .otherwise(col("tok")).as("term"))
      val sketch = items.as[String]
        .select(new analytics.Sketches.MisraGries(k).toColumn.name("cand"))
      val exact = items.groupBy(col("term")).agg(count(lit(1)).as("c"))
      val n = exact.agg(sum(col("c")).as("n"))
      exact.crossJoin(broadcast(n))
        .where(col("c") * (k + 1) > col("n"))
        .crossJoin(broadcast(sketch))
        .select(col("term"), col("c"),
          array_contains(col("cand"), col("term")).as("in_sketch"),
          (size(col("cand")) <= k).as("cand_within_k"))
        .orderBy(col("term"))
    }),

    // SCD2 history build: the events change-log folded into a slowly-
    // changing-dimension type-2 table — per user, each event opens a
    // validity interval [valid_from, valid_to) closed by the NEXT event
    // (lead over the (ts, event_id)-ordered per-user sequence; the last
    // interval stays open, is_current). The warehouse step that turns an
    // append-only log into an as-of-queryable dimension (q26's as-of join
    // is the read side of this build). One shuffle on user_id; per-user
    // window state only — no global sort.
    "q46_scd2" -> ((s, dir) => {
      val ev = t(s, dir, "events")
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts_us"), col("event_id"))
      ev.select(col("user_id"), col("event_id"), col("event_type"), col("value"),
          EventTime.epochMicros(ev).as("ts_us"))
        .select(col("user_id"), col("event_id"), col("event_type"), col("value"),
          row_number().over(w).cast("long").as("version"),
          col("ts_us").as("valid_from_us"),
          lead(col("ts_us"), 1).over(w).as("valid_to_us"))
        .withColumn("is_current", col("valid_to_us").isNull)
        .orderBy(col("user_id"), col("version"))
    }),

    // Leakage-free train/val split: d12's near-dup clusters assigned to a
    // split AS A UNIT (group-aware md5-u32 threshold on the cluster id,
    // 80/20) — near-duplicates can never straddle train and validation.
    // The twin replays the d12 chain and the same integer threshold.
    "q43_split" -> ((s, dir) => {
      analytics.Sampling.groupAwareSplit(
          Dedup.dedupClustersApprox(t(s, dir, "documents"), n = 3, k = 64,
            bands = 16, threshold = 0.4, portableHash = true),
          groupCol = "cluster_id", trainFrac = 0.8)
        .select(col("doc_id"), col("cluster_id"), col("cluster_size"),
          col("is_survivor"), col("split"))
        .orderBy(col("doc_id"))
    }),

    // Decontamination: flag corpus documents sharing ANY 3-gram shingle
    // with a contamination set (stand-in: doc_id < 20 as the "benchmark"
    // docs). Broadcast contamination shingle universe, one corpus scan —
    // the eval-overlap hygiene step of a training-data build.
    "d13_decontaminate" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      Dedup.contaminationFlags(docs, docs.where(col("doc_id") < 20), n = 3)
        .select(col("id").as("doc_id"), col("contaminated"))
        .orderBy(col("doc_id"))
    }),

    // Semantic dedup clusters: the embedding-space sibling of d12 — sign-
    // LSH buckets generate candidates over the FULL corpus, exact cosine
    // (rounded, d06 boundary convention) filters them, and d07's CC/
    // survivor machinery resolves clusters. The oracle chains the s02-
    // style plane/bucket twin into the d07 recursive-CTE closure, so the
    // whole semantic path is hash-matched end-to-end like the lexical one.
    // LSH config is the CLUSTER trade, not s02's top-k trade: 8 tables ×
    // 8 planes collides ~0.4% of orthogonal pairs per table (~3% OR-ed)
    // while keeping ~93% recall at cos 0.9 — s02's 16×4 recall-first
    // config collides ~63% of ALL pairs, degenerating candidate gen to
    // near-all-pairs (measured 71 s vs ~2 s at sf0.1).
    "d14_dedup_clusters_semantic" -> ((s, dir) => {
      Similarity.semanticClusters(t(s, dir, "embeddings"), threshold = 0.5,
          nTables = 8, planesPerTable = 8, dim = 64)
        .orderBy(col("vec_id"))
    }),

    // Dedup: duplicate n-gram SPAN coverage (exact-substring dedup family,
    // Lee et al. 2022) — positions covered by a word 8-gram shared with
    // another document; the keep/trim signal for span-level dedup.
    "d15_spans" -> ((s, dir) => {
      Dedup.duplicateSpanCoverage(t(s, dir, "documents"), n = 8)
        .orderBy(col("doc_id"))
    }),

    // Dedup: duplicate-span TRIM — d15's output side (Lee et al. REMOVE
    // the spans): merged dup islands per doc, kept-position complement,
    // reconstructed clean text. n_toks − n_kept ≡ d15's dup_tokens
    // (spec-asserted), so coverage and trim cannot drift.
    "d18_trim" -> ((s, dir) => {
      Dedup.duplicateSpanTrim(t(s, dir, "documents"), n = 8)
        .orderBy(col("doc_id"))
    }),

    // Dedup: incremental — classify a new batch against the existing
    // corpus (the rolling-build step). The batch re-submits docs 390–399
    // (id-shifted → dup_corpus) and double-submits 495–499 (→ the copy is
    // dup_batch, the original keeps 'new').
    "d17_incr" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val batch = docs.where(col("doc_id") >= 400)
        .unionByName(docs.where(col("doc_id").between(390, 399))
          .withColumn("doc_id", col("doc_id") + 10000))
        .unionByName(docs.where(col("doc_id").between(495, 499))
          .withColumn("doc_id", col("doc_id") + 20000))
      Dedup.incrementalDedup(docs.where(col("doc_id") < 400), batch)
        .orderBy(col("doc_id"))
    }),

    // Dedup: cross-snapshot incremental SPAN coverage — d15 composed with
    // d17's rolling-build shape: the new batch's grams probe the corpus
    // gram index (plus the within-batch ≥2-distinct-docs rule); corpus
    // rows are never re-scored. Same batch construction as d17: shifted
    // copies of 390–399 are fully corpus-covered, double-submitted
    // 495–499 duplicate within the batch.
    "d20_span_incr" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val batch = docs.where(col("doc_id") >= 400)
        .unionByName(docs.where(col("doc_id").between(390, 399))
          .withColumn("doc_id", col("doc_id") + 10000))
        .unionByName(docs.where(col("doc_id").between(495, 499))
          .withColumn("doc_id", col("doc_id") + 20000))
      Dedup.incrementalSpanCoverage(docs.where(col("doc_id") < 400), batch, n = 8)
        .orderBy(col("doc_id"))
    }),

    // Dedup: incremental NEAR-dup gate — d17's rolling-build shape lifted
    // to MinHash/LSH (portable md5 family so the twin replays the
    // signatures bit-exactly): each batch doc classifies dup_corpus /
    // dup_batch / new against the corpus band index + lower-id batch
    // peers; corpus-corpus pairs never form. Same batch construction as
    // d17/d20: shifted copies of 390–399 are exact corpus dups (est 1.0),
    // double-submitted 495–499 duplicate within the batch.
    "d21_incr_neardup" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val batch = docs.where(col("doc_id") >= 400)
        .unionByName(docs.where(col("doc_id").between(390, 399))
          .withColumn("doc_id", col("doc_id") + 10000))
        .unionByName(docs.where(col("doc_id").between(495, 499))
          .withColumn("doc_id", col("doc_id") + 20000))
      Dedup.incrementalNearDup(docs.where(col("doc_id") < 400), batch,
          n = 3, k = 64, bands = 16, threshold = 0.4, portableHash = true)
        .orderBy(col("doc_id"))
    }),

    // Crawl hygiene: URL → registered-domain extraction + per-domain doc
    // quota. URLs are synthesized deterministically from driver data (the
    // t05 PII-injection precedent) with rotating www/cdn/bare subdomains
    // AND rotating public suffixes — single-label (net), multi-label
    // (co.uk, github.io), and a listed private domain (example.com) — so
    // the PSL longest-match rule has real work to do; the cap is the q36
    // deterministic-permutation quota on the domain key — one shuffle,
    // per-domain window, reproducible under any partitioning.
    "d19_domain" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
        .withColumn("url", concat(lit("https://"),
          when(pmod(col("doc_id"), lit(3)) === 0, lit("www."))
            .when(pmod(col("doc_id"), lit(3)) === 1, lit(""))
            .otherwise(lit("cdn.")),
          col("source"), lit("."),
          element_at(array(lit("example.com"), lit("co.uk"),
            lit("github.io"), lit("net")),
            (pmod(col("doc_id"), lit(4)) + 1).cast("int")),
          lit("/"), col("lang"), lit("/"), col("doc_id").cast("string")))
      analytics.Domains.domainQuota(docs, urlCol = "url",
          psl = SparkEntry.d19Psl, k = 15)
        .select(col("domain"), col("sample_rank"), col("doc_id"), col("host"))
        .orderBy(col("domain"), col("sample_rank"))
    }),

    // Dedup: bloom-filter decontamination — d13's 100 TB scale path (the
    // contamination shingles fold into Spark's runtime-filter bloom sketch
    // instead of a broadcast array). Contract twin: `contaminated` is the
    // EXACT d13 flag (hash-matched by the oracle); `bloom_ok` asserts the
    // bloom's one-sided-error contract — every exactly-contaminated doc is
    // bloom-flagged (no false negatives) — and must be TRUE on every row.
    "d16_bloom" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val contam = docs.where(col("doc_id") < 20)
      val exact = Dedup.contaminationFlags(docs, contam, n = 3)
      val bloom = Dedup.contaminationFlagsBloom(s, docs, contam, n = 3,
        estItems = 1L << 14, numBits = 1L << 18)
      exact.join(bloom, Seq("id"))
        .select(col("id").as("doc_id"), col("contaminated"),
          (col("bloom_hit") || !col("contaminated")).as("bloom_ok"))
        .orderBy(col("doc_id"))
    }),

    // Dedup: 64-bit SimHash, xxhash64 family (the native-expression
    // production path). Contract twin: the fingerprints themselves are
    // family-internal — d08 carries the hash-matched md5 values, and
    // distinct-fingerprint CARDINALITY is NOT a sound cross-family
    // invariant (near-dup collapse is what simhash is for, and whether
    // two near-dups collide depends on the token-hash bits: measured 496
    // xx vs 498 md5 distinct at sf0.001). What IS checkable end-to-end:
    // the native codegen'd `simhash64` expression and the declarative
    // vote/fold produce bit-identical fingerprints over the whole corpus
    // (the q30-style flag recipe), anchored per row by oracle-checked
    // n_tokens.
    "d05_simhash" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val nat = Dedup.simhashed(docs).withColumnRenamed("simhash", "fp_n")
      val dec = Dedup.simhashedDeclarativeXx(docs).withColumnRenamed("simhash", "fp_d")
      val flag = nat.join(dec, Seq("doc_id"))
        .agg(count(when(col("fp_n") =!= col("fp_d"), 1)).as("n_diff"))
        .select((col("n_diff") === 0).as("native_eq_declarative"))
      analytics.Par.spreadForCpu(docs)
        .select(col("doc_id"),
          TextAnalysis.tokenCountFromTokens(TextAnalysis.tokens(col("text"))).as("n_tokens"))
        .crossJoin(flag) // 1-row scalar broadcast
        .orderBy(col("doc_id"))
    }),

    // Dedup: embedding-cosine near-dup pairs (probe block vs corpus);
    // sim is rounded to 6 dp inside the operator BEFORE thresholding,
    // matching the oracle's round-then-filter order.
    "d06_embedding_neardup" -> ((s, dir) => {
      val e = t(s, dir, "embeddings")
      Similarity.cosineNearDupPairs(e, e.where(col("vec_id") < 100), threshold = 0.35)
        .select(col("a_id"), col("b_id"), col("sim"))
        .orderBy(col("a_id"), col("b_id"))
    }),

    // Dedup: cluster resolution — exact Jaccard pairs → connected
    // components (iterative min-label propagation) → per-doc cluster id,
    // size, and min-id survivor flag. The step between near-dup PAIRS and
    // an actual keep/drop decision.
    "d07_dedup_clusters" -> ((s, dir) => {
      Dedup.dedupClusters(t(s, dir, "documents"), n = 3, threshold = 0.2,
        maxDf = 1000L) // finite skew cap, exact here (corpus max DF 25 << 1000 — see d03)
        .orderBy(col("doc_id"))
    }),

    // Dedup: 64-bit SimHash with the PORTABLE md5-low64 token hash — the
    // oracle-checked representative of the simhash family (d05 is the fast
    // xxhash64 one; same vote/fold construction, hash-for-hash comparable
    // with DuckDB's md5).
    "d08_simhash_portable" -> ((s, dir) => {
      Dedup.simhashedPortable(t(s, dir, "documents"))
        .orderBy(col("doc_id"))
    }),

    // Similarity: brute-force cosine top-k (exact baseline).
    "s01_cosine_topk" -> ((s, dir) => {
      val e = t(s, dir, "embeddings")
      Similarity.bruteForceTopK(e, e.where(col("vec_id") < 10), k = 5)
        .select(col("probe_id"), col("rank").as("rnk"), col("neighbor_id"),
          round(col("sim"), 6).as("sim"))
        .orderBy(col("probe_id"), col("rnk"))
    }),

    // Similarity: multi-table LSH random-hyperplane top-k (the scale path;
    // recall vs s01 floor-asserted in SimilaritySpec). The hyperplanes are
    // seeded literals from Similarity.hyperplanes — the oracle embeds the
    // SAME doubles as a VALUES CTE (lshPlanesValues), so bucketing,
    // candidate generation, and the exact re-ranking are all hash-matched
    // cross-engine.
    "s02_lsh_topk" -> ((s, dir) => {
      val e = t(s, dir, "embeddings")
      Similarity.lshTopK(e, e.where(col("vec_id") < 10), k = 5,
          nTables = 16, planesPerTable = 4, dim = 64)
        .select(col("probe_id"), col("rank").as("rnk"), col("neighbor_id"),
          round(col("sim"), 6).as("sim"))
        .orderBy(col("probe_id"), col("rnk"))
    }),

    // Similarity: IVF coarse-quantizer top-k (the bucketed ANN alternative
    // to s02; recall floor-asserted in SimilaritySpec). Cell assignment
    // ranks on round(cosine, 6) with cent_id tie-break — deterministic
    // across engines — so the DuckDB twin reproduces assignment, candidate
    // generation, and the exact re-ranking end-to-end.
    "s03_ivf_topk" -> ((s, dir) => {
      val e = t(s, dir, "embeddings")
      Similarity.ivfTopK(e, e.where(col("vec_id") < 10), k = 5, nCells = 16, nProbe = 8)
        .select(col("probe_id"), col("rank").as("rnk"), col("neighbor_id"),
          round(col("sim"), 6).as("sim"))
        .orderBy(col("probe_id"), col("rnk"))
    }),

    // Diversified retrieval: MMR greedy top-3 over the 10 nearest
    // candidates (λ=0.7) — near-duplicate neighbors can't crowd a result
    // set (diverse few-shot selection / dedup'd RAG contexts). Round-6
    // relevance and pair sims, identical score chain, id tie-breaks; the
    // twin unrolls all greedy rounds.
    "s09_mmr" -> ((s, dir) => {
      val e = t(s, dir, "embeddings")
      Similarity.mmrTopK(e, e.where(col("vec_id") < 5),
          kCand = 10, kSelect = 3, lambda = 0.7)
        .orderBy(col("probe_id"), col("mmr_rank"))
    }),

    // ANN quality measurement: recall@5 of the IVF scale path (s03's
    // config) against exact brute force (s01) — "measure, don't guess"
    // applied to the engine's own approximate operator. Per-probe hit
    // counts, so a recall regression localizes to the probe that lost
    // its neighbor.
    "s04_recall" -> ((s, dir) => {
      val e = t(s, dir, "embeddings")
      val probes = e.where(col("vec_id") < 10)
      val exact = Similarity.bruteForceTopK(e, probes, k = 5)
        .select(col("probe_id"), col("neighbor_id"))
      val ivf = Similarity.ivfTopK(e, probes, k = 5, nCells = 16, nProbe = 8)
        .select(col("probe_id"), col("neighbor_id"))
      val hits = exact.join(ivf, Seq("probe_id", "neighbor_id"), "left_semi")
        .groupBy(col("probe_id")).agg(count(lit(1)).as("n_hit"))
      exact.groupBy(col("probe_id")).agg(count(lit(1)).as("n_exact"))
        .join(hits, Seq("probe_id"), "left")
        .select(col("probe_id"), col("n_exact"),
          coalesce(col("n_hit"), lit(0L)).as("n_hit"))
        .withColumn("recall",
          round(col("n_hit").cast("double") / col("n_exact"), 6))
        .orderBy(col("probe_id"))
    }),

    // Trained-quantizer IVF: deterministic fixed-iteration spherical
    // k-means (init = s03's lowest-id quantizer, so iteration 0 is the
    // baseline) feeding the same IVF search; recall@5 of BOTH quantizers
    // against exact brute force, per probe. km_ge_base compares total hit
    // COUNTS (integer, order-free) — the trained quantizer must not lose
    // to the stand-in it replaces. The oracle replays training exactly:
    // round-6 assignment ties, vec-id-ordered mean folds, 9-dp centroid
    // rounding.
    "s05_kmeans" -> ((s, dir) => {
      val e = t(s, dir, "embeddings")
      val probes = e.where(col("vec_id") < 10)
      val exact = Similarity.bruteForceTopK(e, probes, k = 5)
        .select(col("probe_id"), col("neighbor_id"))
      val base = Similarity.ivfTopK(e, probes, k = 5, nCells = 16, nProbe = 8)
        .select(col("probe_id"), col("neighbor_id"))
      // replayableMeans: the SQL twin replays the mean fold in vec-id
      // order bit-exactly; the production default is plain partial avg
      val cents = Similarity.kmeansCentroids(e, nCells = 16, iters = 3,
        replayableMeans = true)
      val km = Similarity.ivfTopKWithCentroids(e, probes, k = 5, cents, nProbe = 8)
        .select(col("probe_id"), col("neighbor_id"))
      def hits(app: org.apache.spark.sql.DataFrame, name: String) =
        exact.join(app, Seq("probe_id", "neighbor_id"), "left_semi")
          .groupBy(col("probe_id")).agg(count(lit(1)).as(name))
      val out = exact.groupBy(col("probe_id")).agg(count(lit(1)).as("n_exact"))
        .join(hits(base, "hb"), Seq("probe_id"), "left")
        .join(hits(km, "hk"), Seq("probe_id"), "left")
        .select(col("probe_id"), col("n_exact"),
          coalesce(col("hb"), lit(0L)).as("n_hit_base"),
          coalesce(col("hk"), lit(0L)).as("n_hit_km"))
        .withColumn("recall_base",
          round(col("n_hit_base").cast("double") / col("n_exact"), 6))
        .withColumn("recall_km",
          round(col("n_hit_km").cast("double") / col("n_exact"), 6))
      val flag = out.agg((sum(col("n_hit_km")) >= sum(col("n_hit_base"))).as("km_ge_base"))
      out.crossJoin(flag) // 1-row scalar broadcast
        .orderBy(col("probe_id"))
    }),

    // Similarity: TRAINED PQ codebooks — per-subspace L2 Lloyd (iteration
    // 0 = s07's stand-in), recall@5 of both codebooks against exact
    // squared-L2 brute force, per probe. The oracle replays training
    // round by round (vec-id-ordered mean folds, round-9) plus both
    // encode/ADC chains and the exact reference.
    "s08_pq_trained" -> ((s, dir) => {
      val e = t(s, dir, "embeddings")
      val probes = e.where(col("vec_id") < 10)
      val exact = Similarity.bruteForceL2TopK(e, probes, k = 5)
        .select(col("probe_id"), col("neighbor_id"))
      val base = Similarity.pqTopK(e, probes, k = 5, m = 8, ks = 16, dim = 64)
        .select(col("probe_id"), col("neighbor_id"))
      val cb = Similarity.pqTrainCodebooks(e, m = 8, ks = 16, iters = 2,
        dim = 64, replayableMeans = true)
      val tr = Similarity.pqTopKWithCodebooks(e, probes, k = 5, cb,
          m = 8, ks = 16, dim = 64)
        .select(col("probe_id"), col("neighbor_id"))
      def hits(app: org.apache.spark.sql.DataFrame, name: String) =
        exact.join(app, Seq("probe_id", "neighbor_id"), "left_semi")
          .groupBy(col("probe_id")).agg(count(lit(1)).as(name))
      exact.groupBy(col("probe_id")).agg(count(lit(1)).as("n_exact"))
        .join(hits(base, "hb"), Seq("probe_id"), "left")
        .join(hits(tr, "ht"), Seq("probe_id"), "left")
        .select(col("probe_id"), col("n_exact"),
          coalesce(col("hb"), lit(0L)).as("n_hit_base"),
          coalesce(col("ht"), lit(0L)).as("n_hit_tr"))
        .withColumn("recall_base",
          round(col("n_hit_base").cast("double") / col("n_exact"), 6))
        .withColumn("recall_tr",
          round(col("n_hit_tr").cast("double") / col("n_exact"), 6))
        .orderBy(col("probe_id"))
    }),

    // Similarity: cluster-balanced sampling — the q36 quota with the
    // stratum lifted to embedding space (SemDeDup-style cluster
    // balancing): s03's deterministic cell assignment (round-6 cosine,
    // cent_id tie-break, lowest-id quantizer) + per-cell md5-permutation
    // cap. Corpus is one broadcast-NLJ pass; quota is one shuffle on the
    // cell id.
    "s06_cluster_sample" -> ((s, dir) => {
      val e = t(s, dir, "embeddings")
      val cents = e.orderBy(col("vec_id")).limit(16)
        .select(col("vec_id").as("cent_id"), col("embedding").as("cent_vec"))
      Similarity.clusterBalancedSample(e, cents, k = 8)
        .select(col("cent_id"), col("sample_rank"), col("vec_id"))
        .orderBy(col("cent_id"), col("sample_rank"))
    }),

    // Similarity: product-quantization ADC top-k — the memory-compression
    // ANN path (codes are m small ints vs dim floats): literal codebook
    // (ks lowest-id subvectors), per-row encode + probe tables as pure
    // projections, scoring by m table lookups. The twin re-derives the
    // codebook, encoding, tables, and the j-ordered ADC fold.
    "s07_pq_topk" -> ((s, dir) => {
      val e = t(s, dir, "embeddings")
      Similarity.pqTopK(e, e.where(col("vec_id") < 10), k = 5,
          m = 8, ks = 16, dim = 64)
        .orderBy(col("probe_id"), col("rank"))
    }),

    // Multimodal: resize planning for image payloads — width/height PARSED
    // from the synthesized PNG IHDR bytes, then the aspect-preserving
    // integer resize arithmetic (the scheduling logic a decoder follows).
    "m02_multimodal_resize" -> ((s, dir) => {
      val withBin = Multimodal.withPayload(t(s, dir, "documents"))
        .where(col("modality") === "image")
      val meta = Multimodal.decodeImage(col("payload"))
      withBin
        .select(col("doc_id"), meta.as("meta"))
        .select(col("doc_id"),
          col("meta.width").as("w"), col("meta.height").as("h"),
          Multimodal.resizePlan(col("meta"), 64).getField("width").as("rw"),
          Multimodal.resizePlan(col("meta"), 64).getField("height").as("rh"))
        .orderBy(col("doc_id"))
    }),

    // Text: language-ID heuristic (stopword-marker voting). Tokenization is
    // materialized once per row on its own projection (the voting reads the
    // token array ~12×), input spread to one task per core.
    "t01_langid" -> ((s, dir) => {
      analytics.Par.spreadForCpu(t(s, dir, "documents"))
        .select(col("doc_id"), TextAnalysis.tokens(col("text")).as("ws"))
        .select(col("doc_id"), TextAnalysis.langIdFromTokens(col("ws")).as("lang_pred"))
        .orderBy(col("doc_id"))
    }),

    // Text: quality features + composite score (pure per-row arithmetic).
    "t02_quality" -> ((s, dir) => {
      analytics.Par.spreadForCpu(t(s, dir, "documents"))
        .select(col("doc_id"), col("text"), TextAnalysis.tokens(col("text")).as("ws"))
        .select(
          col("doc_id"),
          TextAnalysis.tokenCountFromTokens(col("ws")).as("n_tokens"),
          TextAnalysis.avgWordLenFromTokens(col("ws")).as("avg_word_len"),
          TextAnalysis.punctRatio(col("text")).as("punct_ratio"),
          TextAnalysis.stopwordRatioFromTokens(col("ws")).as("stopword_ratio"),
          TextAnalysis.qualityScoreFromTokens(col("text"), col("ws")).as("quality"))
        .orderBy(col("doc_id"))
    }),

    // Text: token counting (whitespace + BPE-ish estimate) per language.
    "t03_token_count" -> ((s, dir) => {
      analytics.Par.spreadForCpu(t(s, dir, "documents"))
        .select(col("lang"), TextAnalysis.tokens(col("text")).as("ws"))
        .select(col("lang"), TextAnalysis.tokenCountFromTokens(col("ws")).as("n_tok"),
          TextAnalysis.bpeTokenEstimateFromTokens(col("ws")).as("bpe"))
        .groupBy(col("lang"))
        .agg(sum(col("n_tok")).as("total_tokens"),
          sum(col("bpe")).as("total_bpe_est"),
          count(lit(1)).as("n_docs"))
        .orderBy(col("lang"))
    }),

    // Text: order-sensitive rolling-hash fingerprint, xxhash64 family (the
    // fused native-expression production path; t07 below carries the
    // hash-matched md5 fold values). Contract twin: distinct-fingerprint
    // cardinality — the count of distinct token SEQUENCES, identical
    // across base-hash families absent differential collisions — is
    // value-compared against DuckDB's count over the md5 fold, and
    // card_agree is Spark's own xx-vs-md5 equality check.
    "t04_rolling_fingerprint" -> ((s, dir) => {
      // ONE scan + ONE tokenize pass feeds BOTH family folds as sibling
      // projections of the same row, and ONE aggregate carries both
      // countDistincts — the round-9 shape (two separate aggregates
      // crossJoined) re-scanned and re-tokenized the corpus per family,
      // doubling the dominant cost (regex tokenization) to carry the
      // cross-family card_agree contract
      val toks = analytics.Par.spreadForCpu(t(s, dir, "documents"))
        .select(col("doc_id"), TextAnalysis.tokens(col("text")).as("ws"))
      val cards = toks
        .select(TextAnalysis.rollingHashFromTokens(s, col("ws")).as("fp_xx"),
          TextAnalysis.rollingHashPortableFromTokens(col("ws")).as("fp_md5"))
        .agg(countDistinct(col("fp_xx")).as("fp_card"),
          countDistinct(col("fp_md5")).as("md5_card"))
        .select(col("fp_card"), (col("fp_card") === col("md5_card")).as("card_agree"))
      toks.select(col("doc_id")).crossJoin(cards) // 1-row scalar broadcast
        .orderBy(col("doc_id"))
    }),

    // Text: the rolling fingerprint with the PORTABLE md5-low64 token hash —
    // the oracle-checked representative of the fingerprint family (the
    // DuckDB twin folds the same base-1000003 multiply-add with HUGEINT
    // wraparound; cf. d08/d10 for simhash/minhash).
    "t07_rolling_fingerprint_portable" -> ((s, dir) => {
      analytics.Par.spreadForCpu(t(s, dir, "documents"))
        .select(col("doc_id"), TextAnalysis.tokens(col("text")).as("ws"))
        .select(col("doc_id"), TextAnalysis.rollingHashPortableFromTokens(col("ws")).as("fp64"))
        .orderBy(col("doc_id"))
    }),

    // Quality: within-document repetition (the Gopher-style duplicate
    // n-gram rule) — RAW 3-gram multiplicity per row, no shuffle; the
    // keep flag compares the 6-dp-ROUNDED fraction so the keep/drop
    // boundary is bit-identical cross-engine. BOTH the token array and
    // the gram array cross projection boundaries as attributes — the
    // expression-shape rule: the ngram lambda reads `ws` per element, so
    // an inlined tokens(text) subtree would re-tokenize O(tokens) times
    // per row (first cut of this query: 58 s at sf0.1 vs 0.7 s fixed).
    "t08_repetition" -> ((s, dir) => {
      analytics.Par.spreadForCpu(t(s, dir, "documents"))
        .select(col("doc_id"), TextAnalysis.tokens(col("text")).as("ws"))
        .select(col("doc_id"), TextAnalysis.ngramsFromTokens(col("ws"), 3).as("g"))
        .select(col("doc_id"),
          size(col("g")).cast("long").as("n_grams"),
          size(array_distinct(col("g"))).cast("long").as("n_distinct"))
        .select(col("doc_id"), col("n_grams"), col("n_distinct"),
          TextAnalysis.repetitionFraction(col("n_grams"), col("n_distinct")).as("dup_frac"))
        .withColumn("keep", col("dup_frac") <= 0.2)
        .orderBy(col("doc_id"))
    }),

    // Text: top-5 terms per language — corpus term-frequency statistics
    // (explode → two-level agg → per-group top-k window).
    "t06_top_terms" -> ((s, dir) => {
      val tok = analytics.Par.spreadForCpu(t(s, dir, "documents"))
        .select(col("lang"), explode(TextAnalysis.tokens(col("text"))).as("token"))
      val counts = tok.groupBy(col("lang"), col("token")).agg(count(lit(1)).as("n"))
      val w = Window.partitionBy(col("lang")).orderBy(col("n").desc, col("token"))
      counts.withColumn("rnk", row_number().over(w).cast("bigint"))
        .where(col("rnk") <= 5)
        .select(col("lang"), col("rnk"), col("token"), col("n"))
        .orderBy(col("lang"), col("rnk"))
    }),

    // E3 at scale — sketch percentiles (GK/QuantileSummaries: fixed-size
    // mergeable state, the 100 TB shape) side by side with the exact
    // sort-based percentile (q27's operator). GK internals are
    // engine-specific, so like q30 the output is the oracle-checkable
    // contract: exact percentiles (hash-matched vs quantile_cont, the
    // q27 recipe) plus ≤1%-relative-error flags for the sketch values,
    // asserted TRUE by the twin. accuracy=10000 bounds rank error at
    // n/10000 ≈ 2 rows per group at sf0.01, so the 1% value flag holds
    // with wide margin regardless of partial-merge order.
    "q35_approx_percentiles" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(
          percentile_approx(col("l_extendedprice"), lit(0.5), lit(10000)).as("p50_approx"),
          percentile_approx(col("l_extendedprice"), lit(0.95), lit(10000)).as("p95_approx"),
          expr("percentile(l_extendedprice, 0.5)").as("p50_exact"),
          expr("percentile(l_extendedprice, 0.95)").as("p95_exact"))
        .select(col("l_returnflag"), col("p50_exact"), col("p95_exact"),
          (abs(col("p50_approx") - col("p50_exact")) <=
            abs(col("p50_exact")) * 0.01).as("p50_err_ok"),
          (abs(col("p95_approx") - col("p95_exact")) <=
            abs(col("p95_exact")) * 0.01).as("p95_err_ok"))
        .orderBy(col("l_returnflag"))
    }),

    // Sampling: reproducible stratified subset — exactly 50 docs per
    // language, ordered by the portable md5 permutation of the id (NOT
    // partition-seeded Bernoulli, which changes under repartitioning).
    // The reproducibility contract a training-data pipeline needs.
    "q36_stratified_sample" -> ((s, dir) => {
      analytics.Sampling.deterministicStratified(
          t(s, dir, "documents").select(col("doc_id"), col("lang")),
          stratumCol = "lang", k = 50, idCol = "doc_id")
        .select(col("lang"), col("sample_rank"), col("doc_id"))
        .orderBy(col("lang"), col("sample_rank"))
    }),

    // Unigram LM quality score: corpus-self-trained token frequencies →
    // per-doc mean log-probability (the CCNet/Gopher perplexity-proxy
    // filter). Cross-engine float determinism is engineered: 9-dp-rounded
    // per-token log-probs, position-ordered left-fold summation, 6-dp
    // display rounding (see TextAnalysis.unigramLogProbScores).
    "t09_ppl" -> ((s, dir) =>
      TextAnalysis.unigramLogProbScores(t(s, dir, "documents"))
        .orderBy(col("doc_id"))),

    // Model-based quality, one order deeper: corpus-self-trained bigram
    // LM with add-half smoothing (t09's determinism recipe on the float
    // path; word-order-sensitive where the unigram is not).
    "t10_lm2" -> ((s, dir) =>
      TextAnalysis.bigramLogProbScores(t(s, dir, "documents"))
        .orderBy(col("doc_id"))),

    // BPE tokenizer, trained AND applied — real subword token ids, not
    // t03's ~4-chars/token estimate. 12 deterministic top-pair-merge
    // rounds over the word-frequency vocab (count desc, lexicographic
    // tie-break), then encode via the trained-vocab broadcast join; the
    // DuckDB twin REPLAYS the same 12 merges in SQL (materialized CTE
    // chain + the same greedy string fold), so merge selection, final
    // segmentations, id assignment, and every per-doc id sequence are
    // hash-matched end-to-end. est_ratio cross-checks t03's estimator
    // against the real token count (corpus estimate ÷ real, 3 dp).
    "t11_bpe" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val (_, vocab) = analytics.Bpe.train(docs, nMerges = 12)
      // training-corpus encode: every word in vocab, so n_unk is
      // vacuously 0 — dropped here (t13 is the OOV query)
      val enc = analytics.Bpe.encode(docs, vocab)
        .select(col("doc_id"), col("n_bpe"), col("ids_str"))
      val est = analytics.Par.spreadForCpu(docs)
        .select(TextAnalysis.bpeTokenEstimate(col("text")).as("est"))
        .agg(sum(col("est")).as("est_total"))
      val ratio = enc.agg(sum(col("n_bpe")).as("bpe_total"))
        .crossJoin(est) // 1-row scalar broadcast
        .select(round(col("est_total").cast("double") / col("bpe_total"), 3)
          .as("est_ratio"))
      enc.crossJoin(ratio) // 1-row scalar broadcast
        .orderBy(col("doc_id"))
    }),

    // HTML boilerplate removal (C4/RefinedWeb-style): deterministic HTML
    // synthesized around each document's text (title head, link-dense nav
    // and footer, an inline content link every 5th doc), then the
    // segment-split + link-density strip. Nav/footer must drop, content —
    // including its inline link's anchor text — must survive.
    "t14_boilerplate" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
        .withColumn("html", concat(
          lit("<html><head><title>"), col("source"), lit("</title></head><body>"),
          lit("<nav><a href=\"/\">Home</a> <a href=\"/a\">About</a> " +
            "<a href=\"/c\">Contact</a></nav>"),
          lit("<p>"), col("text"),
          when(pmod(col("doc_id"), lit(5)) === 0,
            lit(" <a href=\"/x\">click here</a>")).otherwise(lit("")),
          lit("</p>"),
          lit("<div class=\"footer\"><a href=\"/t\">Terms</a> " +
            "<a href=\"/p\">Privacy</a></div></body></html>")))
      TextAnalysis.boilerplateStrip(docs, "html")
        .orderBy(col("doc_id"))
    }),

    // Within-document repeated-line removal (CCNet-style paragraph
    // dedup): multi-line text synthesized deterministically from token
    // slices with a repeated "template header" paragraph and an injected
    // blank line; the repeats must drop (keep-first), the blank must not
    // bridge or count.
    "t15_line_dedup" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
        .withColumn("ws", TextAnalysis.tokens(col("text")))
      val p1 = array_join(slice(col("ws"), 1, 6), " ")
      val p2 = array_join(slice(col("ws"), 7, 6), " ")
      val multi = concat_ws("\n", p1, lit("  "), p2, p1, p2)
      TextAnalysis.dedupLines(docs.withColumn("mtext", multi), "mtext")
        .orderBy(col("doc_id"))
    }),

    // Canonical text normalization (C4-style): case-folding, punctuation
    // strip, whitespace collapse — exercised against synthesized dirty
    // text (uppercase echo, punctuation, a parenthesized tail) since the
    // corpus text is already clean. RE2-safe classes, replayed verbatim.
    "t17_normalize" -> ((s, dir) => {
      val dirty = t(s, dir, "documents")
        .withColumn("dirty", concat(col("text"), lit(" -- END!! "),
          upper(substring(col("text"), 1, 12)), lit(" (c) 2026, v1.0?")))
      dirty.select(col("doc_id"),
          length(col("dirty")).cast("bigint").as("n_chars_in"),
          TextAnalysis.normalizeText(col("dirty")).as("clean_text"))
        .withColumn("n_chars_out", length(col("clean_text")).cast("bigint"))
        .withColumn("n_tokens",
          TextAnalysis.tokenCount(col("clean_text")))
        .orderBy(col("doc_id"))
    }),

    // Per-doc top-3 keywords by tf-idf (smooth-idf): the document-level
    // topic signal next to t06's language-level frequency top-k. One
    // float chain, 9-dp rounded pre-ranking, term tie-break — the twin
    // replays scoring and ranking exactly.
    "t16_tfidf" -> ((s, dir) =>
      TextAnalysis.tfidfTopTerms(t(s, dir, "documents"), k = 3)
        .orderBy(col("doc_id"), col("rnk"))),

    // BPE on HELD-OUT data — the production encode path: train on the
    // even-doc_id half, encode the odd half, whose words were never seen
    // in training. OOV words segment by replaying the learned merge list
    // (segmentWords — identical to how they'd have segmented in-corpus);
    // subword strings training never produced map to UNK id -1, counted
    // per doc as n_unk. The DuckDB twin replays training AND the OOV
    // fold round by round.
    "t13_bpe_oov" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val (merges, vocab) =
        analytics.Bpe.train(docs.where(pmod(col("doc_id"), lit(2)) === 0), nMerges = 12)
      analytics.Bpe.encode(docs.where(pmod(col("doc_id"), lit(2)) === 1),
          vocab, merges = merges)
        .orderBy(col("doc_id"))
    }),

    // Model-based quality classifier (fasttext-style): hashed
    // unigram+bigram features → fixed literal weight vector → sigmoid
    // keep-probability. Pure per-row projection (no shuffle/join/UDF);
    // weights embedded in both engines like s02's hyperplanes, sum folded
    // strictly left-to-right, sigmoid on the 9-dp-rounded mean, keep
    // compared on the 6-dp-rounded score.
    "t12_clf" -> ((s, dir) =>
      analytics.QualityClassifier.score(t(s, dir, "documents"))
        .orderBy(col("doc_id"))),

    // Sequence packing: curated docs → fixed 512-token training sequences,
    // per-language windows (no global sort), each doc assigned to the
    // sequence containing its start offset. The step between curation and
    // a training run.
    "q39_pack" -> ((s, dir) =>
      analytics.Packing.packSequences(
          analytics.Par.spreadForCpu(t(s, dir, "documents")), budget = 512)
        .orderBy(col("lang"), col("doc_id"))),

    // Temperature mixture sampling (α = 0.5): per-language quota
    // ceil(sqrt(count)) over the portable md5 permutation — the
    // language-rebalance step of a training-mix builder; the quota
    // boundary rides an integer predicate so no float pow is on the gate.
    "q40_mix" -> ((s, dir) =>
      analytics.Sampling.sqrtMixture(
          t(s, dir, "documents").select(col("doc_id"), col("lang")),
          stratumCol = "lang", idCol = "doc_id")
        .select(col("lang"), col("sample_rank"), col("doc_id"), col("stratum_n"))
        .orderBy(col("lang"), col("sample_rank"))),

    // Deterministic corpus shuffle into training shards: md5-permutation
    // bucket + within-shard order — the reproducible "shuffle and shard"
    // step every epoch reader depends on; one shard shuffle, per-shard
    // window sort, NO global sort.
    "q41_shard" -> ((s, dir) =>
      analytics.Sampling.shardAssignment(
          t(s, dir, "documents").select(col("doc_id")), nShards = 8,
          idCol = "doc_id")
        .select(col("shard"), col("pos"), col("doc_id"))
        .orderBy(col("shard"), col("pos"))),

    // Curation composition: quality score (t02's operator) → per-language
    // rank → keep the best 10 docs per language. The standard
    // quality-quota selection step of a training-data pipeline.
    "q37_quality_topk" -> ((s, dir) =>
      qualityQuota(analytics.Par.spreadForCpu(t(s, dir, "documents")), k = 10)),

    // Token-BUDGET selection: keep the best documents per language until a
    // fixed token budget fills — the "take the best N tokens" curation
    // rule (quality-ordered running token sum, inclusive-prefix cutoff).
    // Same scale shape as q37/q39/q40/q41: one stratum shuffle, per-
    // stratum window, no global sort.
    "q42_budget" -> ((s, dir) =>
      tokenBudgetSelect(analytics.Par.spreadForCpu(t(s, dir, "documents")),
        budgetPerLang = 2000L)),

    // Flagship curation composition: exact-dedup survivor election
    // (Dedup.byFingerprint — md5 fingerprint, min-id canonical) → quality
    // scoring → per-language quota — the full "dedupe, score, select"
    // chain a training-data build runs, as ONE declarative plan (dedup agg
    // + survivor semi-join + per-row scoring + quota window).
    "q38_curation_pipeline" -> ((s, dir) => {
      val docs = analytics.Par.spreadForCpu(t(s, dir, "documents"))
      val survivors = Dedup.byFingerprint(docs).select(col("keep_id").as("doc_id"))
      qualityQuota(docs.join(survivors, Seq("doc_id"), "left_semi"), k = 20)
    }),

    // Text: PII scrub over documents with synthesized PII (emails/IPs/SSNs
    // derived from doc_id so the operator provably fires); outputs the
    // scrubbed text plus per-class redaction counts. Patterns are shared
    // Java-regex/RE2 constructs — the DuckDB twin applies the identical
    // regexes.
    "t05_pii_scrub" -> ((s, dir) => {
      val withPii = analytics.Par.spreadForCpu(t(s, dir, "documents"))
        .select(col("doc_id"), concat(
          col("text"),
          lit(" contact user"), col("doc_id"), lit("@example.com"),
          lit(" from 10.0.0."), pmod(col("doc_id"), lit(256)),
          lit(" ssn 123-45-"), lpad(pmod(col("doc_id"), lit(10000)).cast("string"), 4, "0")
        ).as("text"))
      val counts = TextAnalysis.piiCounts(col("scrubbed")).map { case (n, c) =>
        c.cast("bigint").as(s"n_$n")
      }
      withPii
        .select(col("doc_id"), TextAnalysis.scrubPii(col("text")).as("scrubbed"))
        .select(Seq(col("doc_id"), col("scrubbed")) ++ counts: _*)
        .orderBy(col("doc_id"))
    }),

    // Multimodal: audio chunk planning — sample count PARSED from the
    // synthesized WAV RIFF header (little-endian dataSize / blockAlign),
    // then the fixed-window segmentation arithmetic (ceil-div chunks, the
    // last one carrying the remainder).
    "m03_audio_chunks" -> ((s, dir) => {
      val audio = Multimodal.withPayload(t(s, dir, "documents"))
        .where(col("modality") === "audio")
      val meta = Multimodal.decodeAudio(col("payload"))
      audio.select(col("doc_id"), meta.as("m"))
        .select(col("doc_id"),
          col("m").getField("n_samples").as("n_samples"),
          Multimodal.audioChunkPlan(col("m")).getField("n_chunks").as("n_chunks"),
          Multimodal.audioChunkPlan(col("m")).getField("last_chunk_samples").as("last_chunk"))
        .orderBy(col("doc_id"))
    }),

    // Multimodal: the full video frame-sampling plan — 4 evenly spaced
    // byte offsets per payload (m01 surfaces only one), the scheduling
    // arithmetic a distributed frame decoder fans out over.
    "m04_frames" -> ((s, dir) => {
      Multimodal.withPayload(t(s, dir, "documents"))
        .where(col("modality") === "video")
        .select(col("doc_id"), length(col("payload")).cast("bigint").as("n_bytes"),
          posexplode(Multimodal.frameSampleOffsets(col("payload"), 4)))
        .toDF("doc_id", "n_bytes", "frame_idx", "byte_off")
        .orderBy(col("doc_id"), col("frame_idx"))
    }),

    // ViT patch tiling plan: decoded PNG dims → 16×16 grid fan-out with
    // edge clipping (m04's frame-offset schedule, two dimensions up) —
    // the per-tile unit a distributed patch embedder consumes. Header
    // arithmetic only; tile pixel decode is the documented stub.
    "m05_patch_grid" -> ((s, dir) => {
      val withBin = Multimodal.withPayload(t(s, dir, "documents"))
        .where(col("modality") === "image")
      withBin
        .select(col("doc_id"), Multimodal.decodeImage(col("payload")).as("meta"))
        .select(col("doc_id"), col("meta.width").as("w"), col("meta.height").as("h"),
          explode(Multimodal.patchGridPlan(col("meta"), 16)).as("pt"))
        .select(col("doc_id"), col("w"), col("h"),
          col("pt.py"), col("pt.px"), col("pt.x0"), col("pt.y0"),
          col("pt.pw"), col("pt.ph"))
        .orderBy(col("doc_id"), col("py"), col("px"))
    }),

    // B1/E3 — correlated scalar subquery, decorrelated the way Catalyst
    // itself does it: orders at >2× their customer's average order value.
    // The average goes through the exact-decimal-sum → one-double-division
    // convention so the comparison is bit-identical cross-engine.
    "q32_scalar_subquery" -> ((s, dir) => {
      val o = t(s, dir, "orders")
      val avgs = o.groupBy(col("o_custkey"))
        .agg((sum(dec(col("o_totalprice"), 18, 2)).cast("double") / count(lit(1)))
          .as("avg_price"))
      o.join(avgs, Seq("o_custkey"))
        .where(col("o_totalprice") > lit(2) * col("avg_price"))
        .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
          col("avg_price"))
        .orderBy(col("o_custkey"), col("o_orderkey"))
    }),

    // Multimodal: binary payloads with REAL container headers (PNG
    // signature+IHDR, WAV RIFF), metadata parsed back from the bytes.
    "m01_multimodal_meta" -> ((s, dir) => {
      Multimodal.extractFeatures(t(s, dir, "documents")).select(
        col("doc_id"), col("modality"), col("n_bytes"),
        col("image_meta").getField("width").as("img_w"),
        col("image_meta").getField("height").as("img_h"),
        col("image_meta").getField("channels").as("img_c"),
        col("audio_meta").getField("n_samples").as("audio_samples"),
        element_at(col("frame_offsets"), 3).as("frame2_off"))
        .orderBy(col("doc_id"))
    }),

    // Time-series gap-fill + forward fill (the feature-store resample next
    // to q50's EWMA): per-user hourly sums, a dense hour grid from each
    // user's own min..max hour (sequence/explode — generate_series in the
    // twin), missing hours carry the last observed value forward
    // (`last(ignoreNulls)` over an unbounded-preceding frame ≡ DuckDB's
    // `last_value(v IGNORE NULLS)`). The hourly sum is the usual exact
    // decimal → one double cast, so the filled value is the SAME double
    // both engines forward-copy — no arithmetic happens after the fill.
    // Scale: one shuffle on user_id for the agg; the grid explode is
    // bounded by span-hours per user and stays partitioned by user_id, so
    // the window never sees a global sort. Leading gaps (before a user's
    // first observation) cannot exist — the grid starts AT the first
    // observed hour, so v_filled is never null.
    "q57_gapfill" -> ((s, dir) => {
      val ev = t(s, dir, "events")
      val obs = ev.where(col("user_id") < 6)
        .groupBy(col("user_id"), EventTime.hourEpoch(ev).as("h"))
        .agg(sum(dec(col("value"), 18, 2)).cast("double").as("v"))
      val grid = obs.groupBy(col("user_id"))
        .agg(min(col("h")).as("lo"), max(col("h")).as("hi"))
        .select(col("user_id"),
          explode(sequence(col("lo"), col("hi"), lit(3600L))).as("h"))
      val w = Window.partitionBy(col("user_id")).orderBy(col("h"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      grid.join(obs, Seq("user_id", "h"), "left")
        .select(col("user_id"), col("h"),
          last(col("v"), ignoreNulls = true).over(w).as("v_filled"),
          col("v").isNull.as("is_gap"))
        .orderBy(col("user_id"), col("h"))
    }),

    // Quantile discretizer (the ML feature-binning staple, q52's
    // equi-width histogram's equi-DEPTH sibling): 9 exact interpolated
    // decile boundaries from one 1-row aggregate (the q27/q53-proven
    // cross-engine percentile), bin = count of boundaries ≤ v via a
    // 9-element fold — boundary ties land deterministically in the
    // upper bin on both engines. Output: per-bin count + actual range.
    "q71_decile_bins" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
      val bounds = li.agg(expr(
        "percentile(l_extendedprice, array(0.1,0.2,0.3,0.4,0.5,0.6,0.7,0.8,0.9))")
        .as("bs"))
      li.crossJoin(broadcast(bounds))
        .select(size(filter(col("bs"), b => col("l_extendedprice") >= b))
            .cast("bigint").as("bin"),
          col("l_extendedprice").as("v"))
        .groupBy(col("bin"))
        .agg(count(lit(1)).as("n"), min(col("v")).as("min_v"),
          max(col("v")).as("max_v"))
        .orderBy(col("bin"))
    }),

    // Sparse TF-IDF cosine near-dup — the weighted-lexical similarity
    // BETWEEN d03's unweighted set Jaccard and d06's dense-embedding
    // cosine: w(t,d) = tf · smooth-idf (the t16 formula, 9-dp), doc
    // norms and per-pair dot products folded in TERM order (buffers
    // bounded by doc vocabulary / shared-term count), candidate pairs
    // ONLY from the inverted term index (probes doc_id < 30; never
    // all-pairs), cosine rounded at 6 dp before the 0.5 gate.
    "d27_tfidf_cosine" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val tf = docs
        .select(col("doc_id"), explode(TextAnalysis.tokens(col("text"))).as("term"))
        .groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))
      // DECLARED stop-listing: terms in > 40% of documents leave the
      // vector space entirely (their idf is the floor anyway, and
      // token-level postings for ubiquitous terms are what turns the
      // inverted index into all-pairs — measured 9.5 s → ~1 s at sf0.1).
      // Both engines share the cap, so the operator stays exact for the
      // similarity it DECLARES (cosine over the df-capped space).
      val dfAll = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
      val nDocs = docs.agg(count(lit(1)).as("n_docs"))
      val df = dfAll.crossJoin(broadcast(nDocs))
        .where(col("df") * 5 <= col("n_docs") * 2)
        .select(col("term"), col("df"))
      val w = tf.join(df, Seq("term")).crossJoin(broadcast(nDocs))
        .select(col("doc_id"), col("term"),
          round(col("tf").cast("double") *
            (log((lit(1.0) + col("n_docs").cast("double")) /
              (lit(1.0) + col("df").cast("double"))) + 1.0), 9).as("w"))
      val norms = w.groupBy(col("doc_id"))
        .agg(collect_list(struct(col("term"), col("w"))).as("tw"))
        .select(col("doc_id"),
          sqrt(aggregate(transform(array_sort(col("tw")), x =>
            x.getField("w") * x.getField("w")), lit(0.0), (a, x) => a + x))
            .as("norm"))
      val dots = w.where(col("doc_id") < 30)
        .select(col("doc_id").as("a_id"), col("term"), col("w").as("wa"))
        .join(w.select(col("doc_id").as("b_id"), col("term"), col("w").as("wb")),
          Seq("term"))
        .where(col("a_id") < col("b_id"))
        .groupBy(col("a_id"), col("b_id"))
        .agg(collect_list(struct(col("term"), (col("wa") * col("wb")).as("p"))).as("ps"))
        .select(col("a_id"), col("b_id"),
          aggregate(transform(array_sort(col("ps")), x => x.getField("p")),
            lit(0.0), (a, x) => a + x).as("dot"))
      dots
        .join(norms.select(col("doc_id").as("a_id"), col("norm").as("na")), Seq("a_id"))
        .join(norms.select(col("doc_id").as("b_id"), col("norm").as("nb")), Seq("b_id"))
        .select(col("a_id"), col("b_id"),
          round(col("dot") / (col("na") * col("nb")), 6).as("cosine"))
        .where(col("cosine") >= 0.5)
        .orderBy(col("a_id"), col("b_id"))
    }),

    // Benford first-digit audit (the classic books-cooking / synthetic-
    // data tell): observed first-digit counts of l_extendedprice vs the
    // Benford expectation p(d) = log10(1 + 1/d), goodness-of-fit X²
    // with each term rounded at 9 dp and folded in digit order. TPC-H
    // prices are uniform-ish, NOT Benford — the honest expected verdict
    // is a loud deviation (is_benford false), which is exactly what the
    // audit exists to raise.
    "q70_benford" -> ((s, dir) => {
      val digits = t(s, dir, "lineitem")
        .select(substring(floor(col("l_extendedprice")).cast("bigint").cast("string"), 1, 1)
          .cast("int").as("d"))
        .where(col("d").between(1, 9))
        .groupBy(col("d")).agg(count(lit(1)).as("o"))
      val n = digits.agg(sum(col("o")).as("n"))
      val terms = digits.crossJoin(broadcast(n))
        .select(col("d"), col("o"),
          round({
            val e = col("n").cast("double") * log10(lit(1.0) + lit(1.0) / col("d").cast("double"))
            (col("o").cast("double") - e) * (col("o").cast("double") - e) / e
          }, 9).as("term"))
      terms
        .agg(collect_list(struct(col("d"), col("term"))).as("ts"),
          sum(col("o")).as("n_values"))
        .select(col("n_values"),
          round(aggregate(transform(array_sort(col("ts")), x => x.getField("term")),
            lit(0.0), (a, x) => a + x), 9).as("chi2"))
        // df 8, α=0.05 → 15.507
        .withColumn("is_benford", col("chi2") <= 15.507)
    }),

    // Per-language corpus statistics: exact type/token counts, type-
    // token ratio, and unigram Shannon entropy — the float sum collapses
    // to the FREQUENCY-VALUE level (terms with equal frequency
    // contribute identically — the g04 trick), so determinism needs one
    // small frequency-ordered fold per language, never a vocab-sized
    // ordered sum.
    "t24_entropy" -> ((s, dir) => {
      val tf = t(s, dir, "documents")
        .select(col("lang"), explode(TextAnalysis.tokens(col("text"))).as("term"))
        .groupBy(col("lang"), col("term")).agg(count(lit(1)).as("f"))
      val byFreq = tf.groupBy(col("lang"), col("f"))
        .agg(count(lit(1)).as("n_terms"))
      val totals = tf.groupBy(col("lang"))
        .agg(sum(col("f")).as("n_tokens"), count(lit(1)).as("n_types"))
      byFreq.join(totals, Seq("lang"))
        .select(col("lang"), col("n_tokens"), col("n_types"), col("f"),
          col("n_terms"))
        .groupBy(col("lang"), col("n_tokens"), col("n_types"))
        .agg(collect_list(struct(col("f"), col("n_terms"))).as("fs"))
        .select(col("lang"), col("n_tokens"), col("n_types"),
          round(col("n_types").cast("double") / col("n_tokens").cast("double"), 9)
            .as("ttr"),
          round(aggregate(array_sort(col("fs")), lit(0.0), (a, e) => {
            val p = e.getField("f").cast("double") / col("n_tokens").cast("double")
            a - e.getField("n_terms").cast("double") * p * log(p)
          }), 9).as("entropy"))
        .orderBy(col("lang"))
    }),

    // Chi-square categorical drift: event-TYPE mix of the first vs
    // second half-month (the discrete complement of q60's numeric KS —
    // types have no ordering for an ECDF). 5 types × 2 sides at α=0.05
    // → df 4, critical 9.488; same generator both halves, so the honest
    // expected verdict is no drift with the statistic doing real work.
    "q69_chi2_drift" -> ((s, dir) => {
      val ev = t(s, dir, "events")
      analytics.Drift.chiSquareDrift(
        ev.select(col("event_type"),
          when(EventTime.epochMicros(ev) < 1705363200000000L, lit(1))
            .otherwise(lit(2)).as("side")),
        "event_type", "side", critical = 9.488)
    }),

    // Stemming + conflation statistics: the weak (Porter-step-1-family)
    // stemmer applied per token, then per-stem families — token mass,
    // distinct raw variants, the alphabetically-first variant as the
    // display form. The vocabulary-compression receipt an index builds
    // on; top 30 families by mass, total-ordered.
    "t23_stemming" -> ((s, dir) =>
      t(s, dir, "documents")
        .select(explode(TextAnalysis.tokens(col("text"))).as("raw"))
        .select(col("raw"), TextAnalysis.stem(col("raw")).as("stem"))
        .groupBy(col("stem"))
        .agg(count(lit(1)).as("n_tokens"),
          countDistinct(col("raw")).as("n_variants"),
          min(col("raw")).as("first_variant"))
        .orderBy(col("n_tokens").desc, col("stem"))
        .limit(30)),

    // LSH dedup quality (the s04-style recall receipt for the DEDUP
    // family): d11's banded-MinHash pair set measured against the exact
    // n-gram-Jaccard ≥ 0.4 ground truth — tp/fp/fn as exact set counts,
    // precision/recall as single divisions. The number a pipeline tunes
    // (bands, k) against instead of trusting the S-curve on faith.
    "d26_lsh_eval" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val truth = Dedup.ngramJaccardPairs(docs, docs, n = 3, threshold = 0.4,
          maxDf = 1000L)
        .where(col("a_id") < col("b_id"))
        .select(col("a_id"), col("b_id"), lit(1L).as("t"))
      val est = Dedup.minhashCandidates(docs, n = 3, k = 64, bands = 16,
          threshold = 0.4, portableHash = true)
        .select(col("a_id"), col("b_id"), lit(1L).as("e"))
      est.join(truth, Seq("a_id", "b_id"), "full_outer")
        .select(coalesce(col("e"), lit(0L)).as("e"),
          coalesce(col("t"), lit(0L)).as("t"))
        .agg(sum(col("t")).as("n_true"), sum(col("e")).as("n_est"),
          sum(col("e") * col("t")).as("tp"))
        .select(col("n_true"), col("n_est"), col("tp"),
          (col("tp").cast("double") / col("n_est").cast("double")).as("precision"),
          (col("tp").cast("double") / col("n_true").cast("double")).as("recall"))
    }),

    // Multi-probe LSH (Lv et al. 2007): a QUARTER of s02's tables (4 vs
    // 16), recall recovered by probing each bucket's Hamming-1
    // neighbors — probe-side-only expansion, equi-join preserved, the
    // index cost of 4 tables with the reach of many. Same exact-cosine
    // re-rank; SimilaritySpec measures the recall recovery against
    // single-probe at equal table count.
    "s11_multiprobe_lsh" -> ((s, dir) => {
      val e = t(s, dir, "embeddings")
      Similarity.lshTopK(e, e.where(col("vec_id") < 10), k = 5,
          nTables = 4, planesPerTable = 4, dim = 64, multiProbe = true)
        .select(col("probe_id"), col("rank").as("rnk"), col("neighbor_id"),
          round(col("sim"), 6).as("sim"))
        .orderBy(col("probe_id"), col("rnk"))
    }),

    // Snapshot reconciliation (table diff): snapshot B is derived from A
    // by deterministic deletions (k % 13 = 0), modifications (k % 7 = 0,
    // value + 1.23 — an exact double add, no rounding boundary), and
    // insertions (shifted keys). One full outer join on the key
    // classifies every row added/removed/changed/unchanged; per-class
    // counts + exact-decimal value sums are the audit the ingest loop
    // alerts on. No modification-detection hashing needed at this width;
    // at 100 TB compare row hashes instead of columns (same join shape).
    "q68_table_diff" -> ((s, dir) => {
      val a = t(s, dir, "orders")
        .select(col("o_orderkey").as("k"), col("o_totalprice").as("v"))
      // inserted keys live in the NEGATIVE key space — disjoint from any
      // real o_orderkey at any scale factor (a fixed positive offset
      // collides once max(o_orderkey) reaches it, fanning out the join)
      val b = a.where(pmod(col("k"), lit(13)) =!= 0)
        .select(col("k"),
          when(pmod(col("k"), lit(7)) === 0, col("v") + 1.23).otherwise(col("v")).as("v"))
        .unionByName(a.where(pmod(col("k"), lit(11)) === 0)
          .select((-col("k")).as("k"), (col("v") + 0.5).as("v")))
      val diff = a.select(col("k"), col("v").as("va"))
        .join(b.select(col("k"), col("v").as("vb")), Seq("k"), "full_outer")
        .select(col("k"),
          when(col("vb").isNull, lit("removed"))
            .when(col("va").isNull, lit("added"))
            .when(col("va") =!= col("vb"), lit("changed"))
            .otherwise(lit("unchanged")).as("class"),
          coalesce(col("vb"), col("va")).as("v"))
      diff.groupBy(col("class"))
        .agg(count(lit(1)).as("n"),
          sum(dec(col("v"), 18, 2)).cast("double").as("total_v"))
        .orderBy(col("class"))
    }),

    // Incremental JOIN maintenance (Blakeley delta rule): both orders
    // and lineitem split 80/20 by key hash; the refreshed view is
    // V_old ∪ ΔR⋈S_old ∪ R_old⋈ΔS ∪ ΔR⋈ΔS — the old⋈old term never
    // re-runs. The oracle is the SINGLE-PASS full join aggregated the
    // same way: the delta union must be row-identical, so the exact-
    // decimal revenue sums match bit-for-bit.
    "q67_incr_join" -> ((s, dir) => {
      val o = t(s, dir, "orders").select(col("o_orderkey"), col("o_orderstatus"))
      val l = t(s, dir, "lineitem").select(col("l_orderkey").as("o_orderkey"),
        col("l_extendedprice"))
      val (oOld, oNew) = (o.where(pmod(col("o_orderkey"), lit(5)) < 4),
        o.where(pmod(col("o_orderkey"), lit(5)) === 4))
      val (lOld, lNew) = (l.where(pmod(col("l_extendedprice").cast("bigint"), lit(5)) < 4),
        l.where(pmod(col("l_extendedprice").cast("bigint"), lit(5)) === 4))
      val vOld = oOld.join(lOld, Seq("o_orderkey"))
      analytics.Incremental.incrementalJoin(vOld, oOld, oNew, lOld, lNew,
          Seq("o_orderkey"))
        .groupBy(col("o_orderstatus"))
        .agg(count(lit(1)).as("n"),
          sum(dec(col("l_extendedprice"), 18, 2)).cast("double").as("revenue"))
        .orderBy(col("o_orderstatus"))
    }),

    // BM25 retrieval + reciprocal-rank-fusion reranking: three queries
    // derived from the corpus itself (first-4-token slices of docs
    // 0/7/14), Lucene-form BM25 over the inverted index (only docs
    // sharing a query term score), top-10 per query, then RRF-fused
    // with the t02 quality prior ranked WITHIN each candidate pool —
    // the lexical-relevance × quality reranking a curation pipeline
    // mines hard negatives with. All windows query-partitioned.
    "t22_bm25_rrf" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val queries = docs.where(col("doc_id").isin(0L, 7L, 14L))
        .select(col("doc_id").as("query_id"),
          array_join(slice(TextAnalysis.tokens(col("text")), 1, 4), " ").as("qtext"))
      val bm25 = TextAnalysis.bm25Scores(docs, queries)
      val wQ = Window.partitionBy(col("query_id"))
      val top = bm25
        .withColumn("r_bm25",
          row_number().over(wQ.orderBy(col("bm25").desc, col("doc_id"))).cast("bigint"))
        .where(col("r_bm25") <= 10)
      val withQuality = top.join(
        qualityScored(docs).select(col("doc_id"), col("quality")), Seq("doc_id"))
        .withColumn("r_q",
          row_number().over(wQ.orderBy(col("quality").desc, col("doc_id"))).cast("bigint"))
        .withColumn("rrf",
          round(lit(1.0) / (lit(60.0) + col("r_bm25")) +
            lit(1.0) / (lit(60.0) + col("r_q")), 9))
      withQuality
        .withColumn("fused_rank",
          row_number().over(wQ.orderBy(col("rrf").desc, col("doc_id"))).cast("bigint"))
        .select(col("query_id"), col("fused_rank"), col("doc_id"),
          col("bm25"), col("r_bm25"), col("r_q"), col("rrf"))
        .orderBy(col("query_id"), col("fused_rank"))
    }),

    // Degree distribution + power-law exponent (g01's graph): undirected
    // degree histogram and the Clauset–Shalizi–Newman MLE
    // α = 1 + N/Σ ln(d/dmin). The float sum collapses to the DEGREE-
    // VALUE level first (counts are exact integers; distinct degrees are
    // few), then folds in degree order over one small collected array —
    // deterministic without any blocked-fold machinery.
    "g04_degree_dist" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val n = docs.count()
      val de = docs.select(col("doc_id").as("src"),
          pmod(col("doc_id") * 7 + 13, lit(n)).as("dst"))
        .unionByName(docs.select(col("doc_id").as("src"),
          pmod(col("doc_id") * 31 + 7, lit(n)).as("dst")))
      val ue = de.select(least(col("src"), col("dst")).as("a"),
          greatest(col("src"), col("dst")).as("b"))
        .where(col("a") =!= col("b")).distinct()
      val deg = ue.select(col("a").as("v")).unionAll(ue.select(col("b").as("v")))
        .groupBy(col("v")).agg(count(lit(1)).as("d"))
      val hist = deg.groupBy(col("d")).agg(count(lit(1)).as("n_vertices"))
      val summary = hist
        .agg(collect_list(struct(col("d"), col("n_vertices"))).as("h"),
          min(col("d")).as("dmin"), sum(col("n_vertices")).as("nv"))
        .select(col("nv"), col("dmin"),
          aggregate(array_sort(col("h")), lit(0.0), (acc, e) =>
            acc + e.getField("n_vertices").cast("double") *
              log(e.getField("d").cast("double") / col("dmin").cast("double")))
            .as("slnd"))
        .select(col("nv"),
          when(col("slnd") > 0.0,
            round(lit(1.0) + col("nv").cast("double") / col("slnd"), 9))
            .as("alpha"))
      hist.crossJoin(broadcast(summary))
        .select(col("d").as("degree"), col("n_vertices"), col("nv"), col("alpha"))
        .orderBy(col("degree"))
    }),

    // CUSUM changepoint monitor per user: S_t = max(0, S_{t−1} + v − 105)
    // folded in exact decimal over the event-time-ordered values, alarm
    // at max S > 500 (compared on the decimal). The sequential mean-
    // shift detector next to q60's two-snapshot KS.
    "q66_cusum" -> ((s, dir) => {
      val ev = t(s, dir, "events")
      analytics.Drift.cusum(
          ev.select(col("user_id"), col("value"),
            EventTime.epochMicros(ev).as("us"), col("event_id")),
          "user_id", "value", Seq("us", "event_id"),
          target = new java.math.BigDecimal("105"),
          h = new java.math.BigDecimal("500"))
        .orderBy(col("user_id"))
    }),

    // Corpus rank–frequency diagnostics (Zipf): top-100 terms by
    // frequency (freq desc, term tie-break), closed-form OLS of
    // ln(freq) on ln(rank) — all four sums folded in rank order over
    // one collected 100-element array (no global window, no regression
    // library), slope/intercept from the same folded doubles.
    "t21_zipf" -> ((s, dir) => {
      val top = t(s, dir, "documents")
        .select(explode(TextAnalysis.tokens(col("text"))).as("term"))
        .groupBy(col("term")).agg(count(lit(1)).as("freq"))
        .orderBy(col("freq").desc, col("term")).limit(100)
      val arr = array_sort(collect_list(struct((-col("freq")).as("nf"),
        col("term"), col("freq"))))
      top.agg(arr.as("__arr"))
        .select(transform(col("__arr"), (e, i) =>
            struct(log((i + 1).cast("double")).as("x"),
              log(e.getField("freq").cast("double")).as("y"))).as("ps"),
          size(col("__arr")).cast("bigint").as("n_terms"))
        .select(col("n_terms"),
          aggregate(col("ps"), lit(0.0), (a, p) => a + p.getField("x")).as("sx"),
          aggregate(col("ps"), lit(0.0), (a, p) => a + p.getField("y")).as("sy"),
          aggregate(col("ps"), lit(0.0), (a, p) => a + p.getField("x") * p.getField("y")).as("sxy"),
          aggregate(col("ps"), lit(0.0), (a, p) => a + p.getField("x") * p.getField("x")).as("sxx"))
        .select(col("n_terms"),
          round((col("n_terms") * col("sxy") - col("sx") * col("sy")) /
            (col("n_terms") * col("sxx") - col("sx") * col("sx")), 9).as("slope"))
    }),

    // Complex-event pattern (CEP): view → purchase within 1h with NO
    // error strictly between — the negation q49's funnel cannot express.
    // Per-user following-frame windows give each view its next purchase
    // and next error timestamps in one pass (no self-join); the match
    // predicate is pure integer-µs arithmetic. User-partitioned windows,
    // one shuffle.
    "q65_cep_pattern" -> ((s, dir) => {
      val ev = t(s, dir, "events")
      val base = ev.select(col("user_id"), col("event_type"),
        EventTime.epochMicros(ev).as("us"), col("event_id"))
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("us"), col("event_id"))
        .rowsBetween(1, Window.unboundedFollowing)
      val flagged = base
        .withColumn("next_purchase",
          min(when(col("event_type") === "purchase", col("us"))).over(w))
        .withColumn("next_error",
          min(when(col("event_type") === "error", col("us"))).over(w))
        .where(col("event_type") === "view")
        .withColumn("matched",
          col("next_purchase").isNotNull &&
            col("next_purchase") - col("us") <= 3600000000L &&
            (col("next_error").isNull || col("next_error") > col("next_purchase")))
      flagged.groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_views"),
          sum(when(col("matched"), 1L).otherwise(0L)).as("n_matched"))
        .orderBy(col("user_id"))
    }),

    // Interpolated Kneser–Ney bigram LM scoring — the production
    // smoothing next to t10's add-k baseline; corpus-self-trained,
    // continuation-unigram backoff, t09/t10 float discipline.
    "t20_kneser_ney" -> ((s, dir) =>
      TextAnalysis.kneserNeyBigramScores(t(s, dir, "documents"))
        .orderBy(col("doc_id"))),

    // Cross-document boilerplate-line removal (the corpus-level CCNet
    // pass, distinct from t15's within-document one): lines repeating in
    // ≥ 3 documents drop everywhere. Lines synthesized as in t15 (token
    // slices + a shared "cookie banner" so a guaranteed cross-doc hit
    // exists); near-dup corpus texts make ORGANIC hits too.
    "d25_cross_doc_lines" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
        .withColumn("ws", TextAnalysis.tokens(col("text")))
      val p1 = array_join(slice(col("ws"), 1, 6), " ")
      val p2 = array_join(slice(col("ws"), 7, 6), " ")
      val multi = concat_ws("\n", lit("accept all cookies to continue"),
        p1, p2, lit("(c) example corp all rights reserved"))
      TextAnalysis.stripCrossDocLines(
          docs.withColumn("mtext", multi), "mtext", minDf = 3)
        .orderBy(col("doc_id"))
    }),

    // Exact 7-day sliding distinct users (DAU/WAU): each (user, day)
    // observation fans out to the 7 window-ending days it supports (the
    // standard exact shape — a bounded 7× explode, NOT a range self-
    // join), then one count_distinct per window day; daily actives join
    // back for the DAU column. Integer day buckets, no rounding.
    "q64_sliding_distinct" -> ((s, dir) => {
      val ev = t(s, dir, "events")
      val us = EventTime.epochMicros(ev)
      // exact-multiple division (the q51 idiom) → integer day bucket
      val day = ((us - pmod(us, lit(86400000000L))) / lit(86400000000L)).cast("long")
      val obs = ev.select(col("user_id"), day.as("day")).distinct()
      val wau = obs
        .select(col("user_id"), explode(sequence(col("day"), col("day") + 6)).as("wday"))
        .groupBy(col("wday")).agg(countDistinct(col("user_id")).as("wau"))
      val dau = obs.groupBy(col("day")).agg(countDistinct(col("user_id")).as("dau"))
      // clamp to the observed day range: windows ENDING past the last
      // observed day would be phantom trailing rows (dau 0, wau decaying)
      // that a real DAU/WAU report doesn't include
      val mx = obs.agg(max(col("day")).as("max_day"))
      wau.join(dau, col("wday") === col("day"), "left")
        .crossJoin(broadcast(mx))
        .where(col("wday") <= col("max_day"))
        .select(col("wday").as("day"), coalesce(col("dau"), lit(0L)).as("dau"),
          col("wau"))
        .orderBy(col("day"))
    }),

    // Language-ID evaluation: t01's stopword-voting classifier measured
    // against the labeled lang — per-class exact confusion counts +
    // precision/recall/F1 (F1 computed FROM the emitted P/R columns so
    // the float chain replays verbatim). 'zh' has no marker list and is
    // never predicted: precision NULL, recall 0 — the honest row.
    "t19_langid_eval" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
        .select(col("doc_id"), col("lang"),
          TextAnalysis.tokens(col("text")).as("ws"))
      analytics.Eval.classificationReport(
          docs.select(col("lang").as("label"),
            TextAnalysis.langIdFromTokens(col("ws")).as("pred")),
          "label", "pred")
        .orderBy(col("label"))
    }),

    // Markov transition matrix over per-user event sequences: lead() on
    // the (ts, event_id)-ordered user timeline (user-partitioned window),
    // exact pair counts, row-conditional probability as one division.
    // The session-behavior model a funnel (q49) summarizes one path of.
    "q63_transitions" -> ((s, dir) => {
      val ev = t(s, dir, "events")
      val w = Window.partitionBy(col("user_id"))
        .orderBy(EventTime.epochMicros(ev), col("event_id"))
      val pairs = ev
        .select(col("event_type").as("from_type"),
          lead(col("event_type"), 1).over(w).as("to_type"))
        .where(col("to_type").isNotNull)
        .groupBy(col("from_type"), col("to_type"))
        .agg(count(lit(1)).as("n"))
      val tot = pairs.groupBy(col("from_type")).agg(sum(col("n")).as("n_from"))
      pairs.join(broadcast(tot), Seq("from_type"))
        .select(col("from_type"), col("to_type"), col("n"), col("n_from"),
          (col("n").cast("double") / col("n_from").cast("double")).as("p"))
        .orderBy(col("from_type"), col("to_type"))
    }),

    // Exact tie-aware ROC AUC (Mann–Whitney): the ranking power of the
    // t02/q37 quality score against the lang=='en' label. The measured
    // answer at sf0.01 is ≈0.495 — the composite quality score is NOT a
    // language classifier despite its English stopword feature (length
    // and punctuation dominate) — exactly the kind of assumption this
    // metric exists to test. Midrank ties via the doubled-U integer
    // identity; the only float op is the final division; ECDF counts
    // ride the q60 bucketed-prefix primitive.
    "q62_auc" -> ((s, dir) =>
      analytics.Eval.aucROC(
        qualityScored(t(s, dir, "documents"))
          .select(col("quality").as("score"), (col("lang") === "en").as("label")),
        "score", "label")),

    // Perceptual image near-dup (aHash): 64 body bytes → above-mean bits
    // (strict integer form, no division) → four 16-bit bands serving as
    // both fingerprint and Hamming-LSH keys; candidates from the banded
    // equi-joins only, Hamming via bit_count(xor). The byte-level image
    // dedup next to d06's embedding-cosine one.
    "m06_ahash_neardup" -> ((s, dir) =>
      Multimodal.aHashNearDups(t(s, dir, "documents"), maxHamming = 6)
        .orderBy(col("id_a"), col("id_b"))),

    // Frequent co-purchase pairs (a-priori pruned): items below support 8
    // never reach the per-order self-join, pairs gate at support 2, lift
    // is one double division of exact counts. The market-basket operator
    // whose scale knob is the item-support prune.
    "q61_copurchase" -> ((s, dir) =>
      analytics.Itemsets.frequentPairs(t(s, dir, "lineitem"),
          "l_orderkey", "l_partkey", minItemSupport = 8, minPairSupport = 2)
        .orderBy(col("n_pairs").desc, col("p1"), col("p2"))),

    // Scalar-quantization (int8) ADC top-k: per-dimension corpus bounds
    // as the model artifact, 0..255 codes as the stored representation,
    // bin-center dequantized squared-L2 scoring — the s01 broadcast-NLJ
    // shape with a 4× smaller corpus payload. The twin re-derives the
    // bounds, codes, and the j-ordered fold.
    "s10_sq_topk" -> ((s, dir) => {
      val e = t(s, dir, "embeddings")
      Similarity.sqTopK(e, e.where(col("vec_id") < 10), k = 5, dim = 64)
        .orderBy(col("probe_id"), col("rank"))
    }),

    // KS drift gate: per-event-type two-sample Kolmogorov–Smirnov between
    // the first and second half of the month (epoch-µs cut at 2024-01-16
    // UTC, dtype-robust via EventTime). Same generator both halves, so
    // the expected verdict is NO drift — the interesting output is the
    // exact D, where it's attained, and the threshold flag doing real
    // arithmetic. ECDFs via bucketed prefix sums, never a type-wide
    // ordered window.
    "q60_ks_drift" -> ((s, dir) => {
      val ev = t(s, dir, "events")
      analytics.Drift.ksDrift(
          ev.select(col("event_type"), col("value"),
            when(EventTime.epochMicros(ev) < 1705363200000000L, lit(1))
              .otherwise(lit(2)).as("side")),
          "event_type", "value", "side")
        .orderBy(col("event_type"))
    }),

    // Pareto skyline over lineitem's (price, quantity) trade-off —
    // minimize price, maximize quantity. Engine: bucketed prefix-max
    // (distinct + equi-width x-buckets + per-bucket window + carried
    // bucket maxima, no global-order window); twin: the same prefix-max
    // identity as ONE window (fine at oracle scale, and its agreement
    // with the bucketed plan is itself part of what's being checked).
    "q59_skyline" -> ((s, dir) =>
      analytics.Skyline.skyline2D(t(s, dir, "lineitem"),
          "l_extendedprice", "l_quantity")
        .orderBy(col("l_extendedprice"), col("l_quantity"))),

    // Readability scoring (Flesch Reading Ease): sentence runs, vowel-
    // group syllables floored at 1, two exact-integer ratios, one 6-dp
    // round — a pure per-row projection over the materialized token
    // array (the t01–t04 attribute discipline). The counts travel WITH
    // the score so the formula is auditable row by row.
    "t18_readability" -> ((s, dir) => {
      val toked = t(s, dir, "documents")
        .select(col("doc_id"), col("text"),
          TextAnalysis.tokens(col("text")).as("ws"))
      toked
        .select(col("doc_id"),
          size(col("ws")).cast("bigint").as("n_words"),
          TextAnalysis.sentenceCount(col("text")).as("n_sentences"),
          aggregate(col("ws"), lit(0L),
            (acc, w) => acc + TextAnalysis.syllables(w)).as("n_syllables"))
        .where(col("n_words") > 0)
        .withColumn("flesch", TextAnalysis.fleschFromCounts(
          col("n_words"), col("n_sentences"), col("n_syllables")))
        .orderBy(col("doc_id"))
    }),

    // Per-vertex triangle counts over a synthesized link graph with real
    // closures (ring chords i→i+1, i→i+2 guarantee triangles; the 7i+13
    // family adds irregular degree) — degree-ordered wedge enumeration,
    // each triangle counted once, attributed to all three corners. Pure
    // integer arithmetic; the twin replays the same orientation and
    // closure joins.
    "g03_triangles" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val n = docs.count()
      val edges = docs.select(col("doc_id").as("src"),
          pmod(col("doc_id") + 1, lit(n)).as("dst"))
        .unionByName(docs.select(col("doc_id").as("src"),
          pmod(col("doc_id") + 2, lit(n)).as("dst")))
        .unionByName(docs.select(col("doc_id").as("src"),
          pmod(col("doc_id") * 7 + 13, lit(n)).as("dst")))
      analytics.Graph.triangleCounts(edges)
        .select(col("id").as("doc_id"), col("n_triangles"))
        .orderBy(col("doc_id"))
    }),

    // Blocked fuzzy entity resolution: a deterministically corrupted copy
    // of the customer master (one digit of the 9-digit name suffix
    // replaced with 'X', position drawn from the portable md5-u32) is
    // linked back by multi-pass blocking — two disjoint interleaved-digit
    // keys, so a 1-char corruption leaves at least one key intact
    // (guaranteed recall at edit distance 1, NO all-pairs scan) — then a
    // levenshtein ≤ 1 gate and a (dist, c_id)-minimal winner per record.
    // Ambiguity is real here (custkeys differing in one digit collide at
    // the corrupted position) and surfaces as n_cands > 1 + is_source
    // false on the unlucky ties — exactly what an ER pipeline reports.
    "d24_entity_resolution" -> ((s, dir) => {
      val cust = t(s, dir, "customer").select(col("c_custkey"), col("c_name"))
      // corrupted digit position: 10 + (md5-u32(custkey) mod 9), 1-indexed
      val p = conv(substring(md5(col("c_custkey").cast("string")), 1, 8), 16, 10)
        .cast("long") % 9
      val dirty = cust.select(col("c_custkey").as("d_id"),
        concat(col("c_name").substr(lit(1), lit(9L) + p), lit("X"),
          col("c_name").substr(lit(11L) + p, lit(8L) - p)).as("d_name"))
      val clean = cust.select(col("c_custkey").as("c_id"), col("c_name"))
      // INTERLEAVED digit positions, not contiguous halves: zero-padded
      // ids put all their entropy in the low digits, and a contiguous
      // high-digit key degenerates to one giant block (measured 13×
      // superlinear at ScaleSmoke 20×). Odd/even picks stay disjoint
      // (the recall guarantee) while both keys carry the low digits.
      def pick(ps: Seq[Int]): Column => Column =
        nm => concat(ps.map(p => nm.substr(lit(p), lit(1))): _*)
      val keys: Seq[Column => Column] =
        Seq(pick(Seq(10, 12, 14, 16, 18)), pick(Seq(11, 13, 15, 17)))
      analytics.EntityResolution.blockedFuzzyMatch(dirty, clean, keys, maxDist = 1)
        .withColumn("is_source", col("matched_id") === col("d_id"))
        .orderBy(col("d_id"))
    }),

    // Semi-structured ingestion via Spark 4 VARIANT (the open-format
    // answer to schema-on-read JSON): `parse_json` once into a variant,
    // typed path extraction with `variant_get`, missing paths surfacing
    // as NULL (`try_variant_get`) — then the extracted value flows into a
    // plain relational aggregate, proving variant columns compose with
    // the rest of the engine. The twin reads the same JSON with DuckDB's
    // json_extract. Scale: variant parse is a per-row projection (no
    // shuffle); the single-shuffle group-by is on an 8-value key.
    "q58_variant" -> ((s, dir) => {
      t(s, dir, "events")
        .select(col("event_id"), parse_json(col("props")).as("var"))
        .select(col("event_id"),
          variant_get(col("var"), "$.k", "bigint").as("k"),
          try_variant_get(col("var"), "$.missing", "bigint").as("absent"))
        .groupBy(pmod(col("k"), lit(8)).as("k_bucket"))
        .agg(count(lit(1)).as("n"),
          sum(col("k")).as("sum_k"),
          min(col("k")).as("min_k"),
          max(col("k")).as("max_k"),
          count(col("absent")).as("n_absent"))
        .orderBy(col("k_bucket"))
    })
  )

  /** Shared q37/q38 tail: quality score → per-language rank → top-k quota
    * (ONE definition so the two curation queries and their oracles cannot
    * drift from each other). Package-private: ScaleSmoke times the same
    * chain at blown-up corpus sizes.
    */
  /** The ONE quality-scoring projection behind q37/q38/q42 (the Spark twin
    * of [[qualityScoreCtes]]): (doc_id, lang, quality, n_tokens), with the
    * tokenizer materialized on its own projection boundary per the HOF
    * rule. Any scoring change propagates to all three queries — exactly
    * the no-drift contract their oracles share.
    */
  private def qualityScored(docs: DataFrame): DataFrame =
    docs
      .select(col("doc_id"), col("lang"), col("text"),
        TextAnalysis.tokens(col("text")).as("ws"))
      .select(col("doc_id"), col("lang"),
        TextAnalysis.qualityScoreFromTokens(col("text"), col("ws")).as("quality"),
        size(col("ws")).cast("bigint").as("n_tokens"))

  private[graft] def qualityQuota(docs: DataFrame, k: Int): DataFrame = {
    val w = Window.partitionBy(col("lang"))
      .orderBy(col("quality").desc, col("doc_id"))
    qualityScored(docs).withColumn("rnk", row_number().over(w).cast("bigint"))
      .where(col("rnk") <= k)
      .select(col("lang"), col("rnk"), col("doc_id"), col("quality"))
      .orderBy(col("lang"), col("rnk"))
  }

  /** q42: per-language token-budget selection — quality-ordered running
    * token sum (rows-unbounded-preceding window), keep while the INCLUSIVE
    * cumulative count stays within the budget. The running sum is integer
    * arithmetic, so the cross-engine cutoff is exact; the quality ORDER
    * inside the window reuses the double formula q37's oracle already
    * hash-matches.
    */
  private[graft] def tokenBudgetSelect(docs: DataFrame, budgetPerLang: Long): DataFrame = {
    val w = Window.partitionBy(col("lang"))
      .orderBy(col("quality").desc, col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    qualityScored(docs).withColumn("cum_tokens", sum(col("n_tokens")).over(w))
      .where(col("cum_tokens") <= budgetPerLang)
      .select(col("lang"), col("doc_id"), col("n_tokens"), col("cum_tokens"), col("quality"))
      .orderBy(col("lang"), col("cum_tokens"), col("doc_id"))
  }

  // ── DuckDB oracle twins (ANSI SQL on the same parquet tables) ──

  private val bitrateSqlExpr =
    """round(CAST(NULLIF(regexp_extract(trim(br), '^(\d+\.?\d*)\s*(bps|Kbps|Mbps|Gbps|Tbps)$', 1), '') AS DOUBLE)
      | * CASE regexp_extract(trim(br), '^(\d+\.?\d*)\s*(bps|Kbps|Mbps|Gbps|Tbps)$', 2)
      |     WHEN 'bps' THEN 1e-6 WHEN 'Kbps' THEN 1e-3 WHEN 'Mbps' THEN 1.0
      |     WHEN 'Gbps' THEN 1e3 WHEN 'Tbps' THEN 1e6 END, 6)""".stripMargin

  private val tokensSqlExpr =
    """list_filter(string_split(regexp_replace(trim(lower(text)), '\s+', ' ', 'g'), ' '), x -> length(x) > 0)"""

  // ── shared CTE builders of the portable-MinHash twins (d10/d11/d12) ──

  /** Spark's wrapping 64-bit h·a+b reproduced in HUGEINT, re-centered to
    * signed 64-bit (expects columns `h`, `a`, `b` in scope). */
  private val minhashSwExpr =
    "(((h * a + b) % 18446744073709551616 + 18446744073709551616 + " +
      "9223372036854775808) % 18446744073709551616) - 9223372036854775808"

  /** md5-low64 of `s` as a signed BIGINT-range HUGEINT — the portable
    * base hash ([[Dedup.md5Low64]]'s twin). */
  private val md5Low64SqlExpr =
    "CASE WHEN CAST(('0x' || substr(md5(s), 17, 16)) AS UBIGINT) >= 9223372036854775808" +
      " THEN CAST(('0x' || substr(md5(s), 17, 16)) AS UBIGINT)::HUGEINT - 18446744073709551616" +
      " ELSE CAST(('0x' || substr(md5(s), 17, 16)) AS UBIGINT)::HUGEINT END"

  /** Opening CTEs of every portable-MinHash oracle: the k (a,b) constants
    * from the ONE shared generator ([[Dedup.minhashConstants]] — also
    * behind `minhashFromHashes` and the native expression, so operator and
    * oracle cannot drift), then tokenize → 3-gram shingle → md5-low64 base
    * hash. Emits `consts(pos, a, b)`, `tok`, `g`, `hs`; callers append
    * consumers of `hs CROSS JOIN consts`.
    */
  private def portableMinhashCtes(k: Int, src: String = "documents"): String = {
    val consts = Dedup.minhashConstants(k).zipWithIndex.map { case ((a, b), p) =>
      s"($p, CAST($a AS HUGEINT), CAST($b AS HUGEINT))"
    }.mkString(", ")
    s"""consts(pos, a, b) AS (VALUES $consts),
       |tok AS (SELECT doc_id, $tokensSqlExpr AS ws FROM $src),
       |g AS (SELECT doc_id, list_distinct(list_transform(range(len(ws) - 2),
       |  i -> ws[i+1] || ' ' || ws[i+2] || ' ' || ws[i+3])) AS sh
       |  FROM tok WHERE len(ws) >= 3),
       |hs AS (SELECT doc_id, list_transform(sh, s -> $md5Low64SqlExpr) AS hl FROM g)""".stripMargin
  }

  /** Band→bucket-join→estimate tail of the LSH twins (d11/d12), mirroring
    * [[Dedup.minhashCandidates]]: per-doc ordered signature lists, `bands`
    * bands of k/bands as list slices, candidate pairs on ANY equal band
    * slice (a_id < b_id, distinct), est_jaccard = agreeing-position
    * fraction over the full k, thresholded. Emits `sig`, `bnd`, `cand`,
    * `pairs(a_id, b_id, est_jaccard)` on top of [[portableMinhashCtes]].
    */
  private def portableLshPairCtes(k: Int, bands: Int, threshold: Double): String = {
    require(k % bands == 0, s"signature length $k must divide into $bands bands")
    val rpb = k / bands
    s"""sig AS (SELECT doc_id,
       |  list(CAST(list_min(list_transform(hl, h -> $minhashSwExpr)) AS BIGINT) ORDER BY pos) AS sg
       |  FROM hs CROSS JOIN consts GROUP BY doc_id),
       |bnd AS (SELECT doc_id, b, list_slice(sg, b*$rpb + 1, b*$rpb + $rpb) AS slc
       |  FROM sig CROSS JOIN range($bands) r(b)),
       |cand AS (SELECT DISTINCT x.doc_id AS a_id, y.doc_id AS b_id
       |  FROM bnd x JOIN bnd y ON x.b = y.b AND x.slc = y.slc AND x.doc_id < y.doc_id),
       |pairs AS (SELECT a_id, b_id, est_jaccard FROM (
       |  SELECT a_id, b_id,
       |    CAST(len(list_filter(range(1, ${k + 1}), i -> sa.sg[i] = sb.sg[i])) AS DOUBLE) / $k AS est_jaccard
       |  FROM cand JOIN sig sa ON sa.doc_id = cand.a_id JOIN sig sb ON sb.doc_id = cand.b_id)
       |  WHERE est_jaccard >= $threshold)""".stripMargin
  }

  /** SimHash fold CTEs over the portable md5-low64 token hash, mirroring
    * [[Dedup.simhashedPortable]]'s vote/fold construction: tokenize →
    * per-token signed-64 hash → 64 per-bit votes → fold to one BIGINT
    * (bit i set iff vote_i > 0; token-less docs LEFT-JOIN to all-zero
    * votes = fingerprint 0, matching Spark's declarative fold). Emits
    * `fps(doc_id, simhash)`; shared by the d08 value twin and the d05
    * cardinality contract so the construction cannot drift.
    */
  private def portableSimhashCtes: String = {
    val votes = (0 until 64).map(i =>
      s"sum(CASE WHEN (h >> $i) & 1 = 1 THEN 1 ELSE -1 END) AS v$i").mkString(",\n ")
    val fold = (0 until 64).map { i =>
      val bit = if (i == 63) "(-9223372036854775807 - 1)" else (1L << i).toString
      s"(CASE WHEN v$i > 0 THEN CAST($bit AS BIGINT) ELSE CAST(0 AS BIGINT) END)"
    }.mkString(" | ")
    s"""tok AS (SELECT doc_id, $tokensSqlExpr AS ws FROM documents),
       |tu AS (SELECT doc_id, unnest(ws) AS t FROM tok),
       |th AS (SELECT doc_id,
       |  CAST(CASE WHEN u >= 9223372036854775808 THEN u - 18446744073709551616 ELSE u END AS BIGINT) AS h
       |  FROM (SELECT doc_id, CAST(('0x' || substr(md5(t), 17, 16)) AS UBIGINT)::HUGEINT AS u FROM tu)),
       |votes AS (SELECT doc_id, $votes FROM th GROUP BY doc_id),
       |fps AS (SELECT d.doc_id, $fold AS simhash
       |  FROM documents d LEFT JOIN votes USING (doc_id))""".stripMargin
  }

  /** Rolling-fingerprint fold CTEs over the portable md5-low64 token hash,
    * mirroring [[graft.analytics.TextAnalysis.rollingHashPortableFromTokens]]:
    * ordered token hashes folded with acc*1000003 + h under signed-64
    * wraparound (HUGEINT modular arithmetic), empty docs = 0. Emits
    * `fps(doc_id, fp64)`; shared by the t07 value twin and the t04
    * cardinality contract.
    */
  private def portableRollingFpCtes: String =
    s"""tok AS (SELECT doc_id, $tokensSqlExpr AS ws FROM documents),
       |hl AS (SELECT doc_id, list_transform(ws, s -> $md5Low64SqlExpr) AS hl FROM tok),
       |fps AS (SELECT doc_id, CAST(CASE WHEN len(hl) = 0 THEN 0
       |  ELSE list_reduce(hl, (acc, h) -> (((acc * 1000003 + h) % 18446744073709551616
       |    + 18446744073709551616 + 9223372036854775808) % 18446744073709551616)
       |    - 9223372036854775808) END AS BIGINT) AS fp64 FROM hl)""".stripMargin

  /** VALUES rows `(tbl, pl, w)` of the seeded random-hyperplane tables used
    * by s02 — generated from the SAME [[Similarity.hyperplanes]] calls as
    * the operator (one table per seed offset), so operator and oracle share
    * every plane coefficient bit-for-bit. `Double.toString` round-trips
    * exactly and DuckDB parses both plain and E-notation literals as
    * DOUBLE, so no precision is lost crossing engines.
    */
  private def lshPlanesValues(nTables: Int, planesPerTable: Int, dim: Int, seed: Long): String =
    (0 until nTables).flatMap { t =>
      Similarity.hyperplanes(planesPerTable, dim, seed + t).zipWithIndex.map { case (w, i) =>
        s"($t, $i, [${w.mkString(", ")}]::DOUBLE[])"
      }
    }.mkString(",\n")

  /** Shared scoring tail of the ANN twins (s02/s03): exact cosine over the
    * candidate pairs, per-probe rank (sim desc, neighbor asc — s01's
    * contract), top `k`, display-rounded to 6 dp. Expects CTEs
    * `v(vec_id, ev)` and `cand(probe_id, neighbor_id)` in scope.
    */
  private def annRankSql(k: Int): String =
    s"""s AS (SELECT probe_id, neighbor_id, list_cosine_similarity(pv.ev, cv.ev) AS sim
       |  FROM cand JOIN v pv ON pv.vec_id = cand.probe_id JOIN v cv ON cv.vec_id = cand.neighbor_id),
       |r AS (SELECT probe_id, neighbor_id, sim,
       |  row_number() OVER (PARTITION BY probe_id ORDER BY sim DESC, neighbor_id) AS rnk FROM s)
       |SELECT probe_id, rnk, neighbor_id, round(sim, 6) AS sim FROM r
       |WHERE rnk <= $k ORDER BY probe_id, rnk""".stripMargin

  /** SQL twin of [[qualityQuota]]: `sourceCtes` must open the WITH list and
    * define a CTE `d(doc_id, lang, text)`; the shared tail scores and
    * quota-selects exactly like the Spark helper.
    */
  /** Shared scoring CTEs of the quality-driven curation twins (q37/q38/
    * q42): `sourceCtes` must open the WITH list and define
    * `d(doc_id, lang, text)`; emits `tok`, `f`, and `q(doc_id, lang,
    * n_tokens, quality)` — the same formula as
    * [[TextAnalysis.qualityScoreFromTokens]].
    */
  private def qualityScoreCtes(sourceCtes: String): String =
    s"""$sourceCtes,
       |tok AS (SELECT doc_id, lang, text, $tokensSqlExpr AS ws FROM d),
       |f AS (SELECT doc_id, lang, text, CAST(len(ws) AS BIGINT) AS n_tokens,
       | CASE WHEN length(text) = 0 THEN 0.0 ELSE CAST(length(text) - length(regexp_replace(text, '[!-/:-@\\[-`{-~]', '', 'g')) AS DOUBLE) / length(text) END AS punct_ratio,
       | CASE WHEN len(ws) = 0 THEN 0.0 ELSE CAST(len(list_filter(ws, x -> list_contains(['the','a','of','and','to','in','is'], x))) AS DOUBLE) / len(ws) END AS stopword_ratio
       |FROM tok),
       |q AS (SELECT doc_id, lang, n_tokens,
       | 0.4 * least(CAST(length(text) AS DOUBLE) / 500.0, 1.0) + 0.4 * stopword_ratio + 0.2 * (1.0 - punct_ratio) AS quality
       |FROM f)""".stripMargin

  private def qualityQuotaSql(sourceCtes: String, k: Int): String =
    s"""${qualityScoreCtes(sourceCtes)},
       |r AS (SELECT lang, doc_id, quality,
       | row_number() OVER (PARTITION BY lang ORDER BY quality DESC, doc_id) AS rnk FROM q)
       |SELECT lang, CAST(rnk AS BIGINT) AS rnk, doc_id, quality
       |FROM r WHERE rnk <= $k ORDER BY lang, rnk""".stripMargin

  /** Full SQL twin of s05: k-means training replayed iteration by
    * iteration (assignment → per-(cell,dim) id-ordered mean fold →
    * centroid update with empty-cell carry-over), then the s04 recall
    * machinery over BOTH quantizers. All chain CTEs MATERIALIZED — each
    * state feeds multiple consumers and inlining would blow up the
    * iteration chain.
    */
  private def kmeansOracleSql(nCells: Int, nProbe: Int, iters: Int,
      dim: Int, k: Int): String = {
    val iterCtes = (1 to iters).map { i =>
      s"""a$i AS MATERIALIZED (SELECT vec_id, cent_id FROM (
         |    SELECT v.vec_id, c.cent_id,
         |      row_number() OVER (PARTITION BY v.vec_id
         |        ORDER BY round(list_cosine_similarity(v.ev, c.cv), 6) DESC NULLS LAST, c.cent_id) AS r
         |    FROM v CROSS JOIN c${i - 1} c) WHERE r = 1),
         |m$i AS MATERIALIZED (SELECT cent_id, d,
         |    round(list_reduce(list(x ORDER BY vec_id), (p, q) -> p + q) / count(*), 9) AS mv
         |  FROM (SELECT a.cent_id, a.vec_id, t.d, v.ev[t.d + 1] AS x
         |        FROM a$i a JOIN v USING (vec_id), UNNEST(range($dim)) AS t(d))
         |  GROUP BY cent_id, d),
         |c$i AS MATERIALIZED (SELECT c.cent_id, COALESCE(n.cv, c.cv) AS cv
         |  FROM c${i - 1} c LEFT JOIN
         |    (SELECT cent_id, list(mv ORDER BY d) AS cv FROM m$i GROUP BY cent_id) n
         |  USING (cent_id))""".stripMargin
    }.mkString(",\n")
    def ivfChain(cents: String, p: String) =
      s"""${p}ca AS (SELECT vec_id AS neighbor_id, cent_id FROM (
         |    SELECT v.vec_id, c.cent_id,
         |      row_number() OVER (PARTITION BY v.vec_id
         |        ORDER BY round(list_cosine_similarity(v.ev, c.cv), 6) DESC NULLS LAST, c.cent_id) AS r
         |    FROM v CROSS JOIN $cents c) WHERE r <= 1),
         |${p}pa AS (SELECT vec_id AS probe_id, cent_id FROM (
         |    SELECT v.vec_id, c.cent_id,
         |      row_number() OVER (PARTITION BY v.vec_id
         |        ORDER BY round(list_cosine_similarity(v.ev, c.cv), 6) DESC NULLS LAST, c.cent_id) AS r
         |    FROM v CROSS JOIN $cents c WHERE v.vec_id < 10) WHERE r <= $nProbe),
         |${p}cand AS (SELECT DISTINCT probe_id, neighbor_id
         |  FROM ${p}pa JOIN ${p}ca USING (cent_id) WHERE probe_id <> neighbor_id),
         |${p}tk AS (SELECT probe_id, neighbor_id FROM (
         |   SELECT c.probe_id, c.neighbor_id,
         |     row_number() OVER (PARTITION BY c.probe_id
         |       ORDER BY list_cosine_similarity(pv.ev, nv.ev) DESC, c.neighbor_id) AS rnk
         |   FROM ${p}cand c JOIN v pv ON pv.vec_id = c.probe_id
         |     JOIN v nv ON nv.vec_id = c.neighbor_id)
         | WHERE rnk <= $k)""".stripMargin
    s"""WITH v AS MATERIALIZED (SELECT vec_id, embedding::DOUBLE[] AS ev FROM embeddings),
       |c0 AS MATERIALIZED (SELECT vec_id AS cent_id, ev AS cv FROM v ORDER BY vec_id LIMIT $nCells),
       |$iterCtes,
       |ex AS (SELECT probe_id, neighbor_id FROM (
       |   SELECT p.vec_id AS probe_id, c.vec_id AS neighbor_id,
       |     row_number() OVER (PARTITION BY p.vec_id
       |       ORDER BY list_cosine_similarity(p.ev, c.ev) DESC, c.vec_id) AS rnk
       |   FROM v p JOIN v c ON p.vec_id <> c.vec_id WHERE p.vec_id < 10)
       | WHERE rnk <= $k),
       |${ivfChain("c0", "b")},
       |${ivfChain(s"c$iters", "t")},
       |hb AS (SELECT probe_id, count(*) AS hb FROM ex JOIN btk USING (probe_id, neighbor_id) GROUP BY probe_id),
       |ht AS (SELECT probe_id, count(*) AS ht FROM ex JOIN ttk USING (probe_id, neighbor_id) GROUP BY probe_id),
       |bs AS (SELECT probe_id, count(*) AS n_exact FROM ex GROUP BY probe_id),
       |o AS (SELECT b.probe_id, CAST(b.n_exact AS BIGINT) AS n_exact,
       |   CAST(COALESCE(hb.hb, 0) AS BIGINT) AS n_hit_base,
       |   CAST(COALESCE(ht.ht, 0) AS BIGINT) AS n_hit_km
       |  FROM bs b LEFT JOIN hb USING (probe_id) LEFT JOIN ht USING (probe_id))
       |SELECT probe_id, n_exact, n_hit_base, n_hit_km,
       | round(CAST(n_hit_base AS DOUBLE) / n_exact, 6) AS recall_base,
       | round(CAST(n_hit_km AS DOUBLE) / n_exact, 6) AS recall_km,
       | (SELECT sum(n_hit_km) FROM o) >= (SELECT sum(n_hit_base) FROM o) AS km_ge_base
       |FROM o ORDER BY probe_id""".stripMargin
  }

  /** Full SQL twin of t11: BPE training replayed round by round (see the
    * oracleSql entry's comment for the correspondence argument), then the
    * id assignment, per-doc encoding, and t03-estimator cross-check.
    */
  private def bpeOracleSql(nMerges: Int): String = {
    val rounds = (1 to nMerges).map { i =>
      s"""p$i AS MATERIALIZED (SELECT a, b, sum(freq) AS c FROM (
         |  SELECT freq, syms[j] AS a, syms[j+1] AS b
         |  FROM (SELECT freq, string_split(symstr, ' ') AS syms FROM v${i - 1}),
         |    UNNEST(range(1, len(syms))) AS t(j))
         |  GROUP BY a, b),
         |m$i AS MATERIALIZED (SELECT a, b FROM p$i ORDER BY c DESC, a, b LIMIT 1),
         |v$i AS MATERIALIZED (SELECT word, freq,
         |  CASE WHEN len(syms) <= 1 THEN symstr
         |    ELSE list_reduce(syms, (acc, x) ->
         |      CASE WHEN x = m.b AND (acc = m.a OR ends_with(acc, ' ' || m.a))
         |        THEN acc || x ELSE acc || ' ' || x END)
         |  END AS symstr
         |  FROM (SELECT word, freq, symstr, string_split(symstr, ' ') AS syms FROM v${i - 1})
         |  LEFT JOIN m$i m ON TRUE)""".stripMargin
    }.mkString(",\n")
    s"""WITH tok AS MATERIALIZED (SELECT doc_id, $tokensSqlExpr AS ws FROM documents),
       |wf AS (SELECT word, CAST(count(*) AS BIGINT) AS freq
       |  FROM (SELECT unnest(ws) AS word FROM tok) GROUP BY word),
       |v0 AS MATERIALIZED (SELECT word, freq,
       |  array_to_string(list_transform(range(1, length(word) + 1), i -> word[i]), ' ')
       |    || ' </w>' AS symstr FROM wf),
       |$rounds,
       |ids AS MATERIALIZED (SELECT tokstr,
       |  CAST(row_number() OVER (ORDER BY tokstr) - 1 AS BIGINT) AS tok_id
       |  FROM (SELECT DISTINCT unnest(string_split(symstr, ' ')) AS tokstr FROM v$nMerges)),
       |dw AS (SELECT doc_id, j - 1 AS pos, ws[j] AS word
       |  FROM tok, UNNEST(range(1, len(ws) + 1)) AS t(j)),
       |sub AS (SELECT doc_id, pos, k - 1 AS spos, syms[k] AS tokstr
       |  FROM (SELECT doc_id, pos, string_split(v.symstr, ' ') AS syms
       |        FROM dw JOIN v$nMerges v USING (word)),
       |    UNNEST(range(1, len(syms) + 1)) AS u(k)),
       |enc AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bpe,
       |  string_agg(CAST(tok_id AS VARCHAR), ',' ORDER BY pos, spos) AS ids_str
       |  FROM sub JOIN ids USING (tokstr) GROUP BY doc_id),
       |tot AS (SELECT round(CAST(
       |    (SELECT sum(list_sum(list_transform(ws, x -> CAST(ceil(length(x) / 4.0) AS BIGINT)))) FROM tok)
       |    AS DOUBLE) / (SELECT sum(n_bpe) FROM enc), 3) AS est_ratio)
       |SELECT d.doc_id, COALESCE(e.n_bpe, 0) AS n_bpe, COALESCE(e.ids_str, '') AS ids_str,
       |  tot.est_ratio
       |FROM documents d LEFT JOIN enc e USING (doc_id) CROSS JOIN tot
       |ORDER BY d.doc_id""".stripMargin
  }

  /** Full SQL twin of t13: BPE training replayed on the even-doc half
    * (the bpeOracleSql rounds, plus a parallel o$i chain applying each
    * round's merge to the held-out OOV words — the same greedy fold, so
    * an unseen word segments exactly as the engine's segmentWords
    * replay), then the odd half encoded against v$n ∪ o$n with unknown
    * subwords mapped to -1 and counted.
    */
  private def bpeOovOracleSql(nMerges: Int): String = {
    val rounds = (1 to nMerges).map { i =>
      s"""p$i AS MATERIALIZED (SELECT a, b, sum(freq) AS c FROM (
         |  SELECT freq, syms[j] AS a, syms[j+1] AS b
         |  FROM (SELECT freq, string_split(symstr, ' ') AS syms FROM v${i - 1}),
         |    UNNEST(range(1, len(syms))) AS t(j))
         |  GROUP BY a, b),
         |m$i AS MATERIALIZED (SELECT a, b FROM p$i ORDER BY c DESC, a, b LIMIT 1),
         |v$i AS MATERIALIZED (SELECT word, freq,
         |  CASE WHEN len(syms) <= 1 THEN symstr
         |    ELSE list_reduce(syms, (acc, x) ->
         |      CASE WHEN x = m.b AND (acc = m.a OR ends_with(acc, ' ' || m.a))
         |        THEN acc || x ELSE acc || ' ' || x END)
         |  END AS symstr
         |  FROM (SELECT word, freq, symstr, string_split(symstr, ' ') AS syms FROM v${i - 1})
         |  LEFT JOIN m$i m ON TRUE),
         |o$i AS MATERIALIZED (SELECT word,
         |  CASE WHEN len(syms) <= 1 THEN symstr
         |    ELSE list_reduce(syms, (acc, x) ->
         |      CASE WHEN x = m.b AND (acc = m.a OR ends_with(acc, ' ' || m.a))
         |        THEN acc || x ELSE acc || ' ' || x END)
         |  END AS symstr
         |  FROM (SELECT word, symstr, string_split(symstr, ' ') AS syms FROM o${i - 1})
         |  LEFT JOIN m$i m ON TRUE)""".stripMargin
    }.mkString(",\n")
    s"""WITH tok AS MATERIALIZED (SELECT doc_id, $tokensSqlExpr AS ws FROM documents),
       |wf AS (SELECT word, CAST(count(*) AS BIGINT) AS freq
       |  FROM (SELECT unnest(ws) AS word FROM tok WHERE doc_id % 2 = 0) GROUP BY word),
       |v0 AS MATERIALIZED (SELECT word, freq,
       |  array_to_string(list_transform(range(1, length(word) + 1), i -> word[i]), ' ')
       |    || ' </w>' AS symstr FROM wf),
       |o0 AS MATERIALIZED (SELECT word,
       |  array_to_string(list_transform(range(1, length(word) + 1), i -> word[i]), ' ')
       |    || ' </w>' AS symstr
       |  FROM (SELECT DISTINCT unnest(ws) AS word FROM tok WHERE doc_id % 2 = 1)
       |  WHERE word NOT IN (SELECT word FROM v0)),
       |$rounds,
       |ids AS MATERIALIZED (SELECT tokstr,
       |  CAST(row_number() OVER (ORDER BY tokstr) - 1 AS BIGINT) AS tok_id
       |  FROM (SELECT DISTINCT unnest(string_split(symstr, ' ')) AS tokstr FROM v$nMerges)),
       |segs AS (SELECT word, symstr FROM v$nMerges
       |  UNION ALL SELECT word, symstr FROM o$nMerges),
       |dw AS (SELECT doc_id, j - 1 AS pos, ws[j] AS word
       |  FROM tok, UNNEST(range(1, len(ws) + 1)) AS t(j) WHERE doc_id % 2 = 1),
       |sub AS (SELECT doc_id, pos, k - 1 AS spos, syms[k] AS tokstr
       |  FROM (SELECT doc_id, pos, string_split(v.symstr, ' ') AS syms
       |        FROM dw JOIN segs v USING (word)),
       |    UNNEST(range(1, len(syms) + 1)) AS u(k)),
       |enc AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bpe,
       |  string_agg(CAST(COALESCE(i.tok_id, -1) AS VARCHAR), ',' ORDER BY pos, spos) AS ids_str,
       |  CAST(sum(CASE WHEN i.tok_id IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_unk
       |  FROM sub LEFT JOIN ids i USING (tokstr) GROUP BY doc_id)
       |SELECT d.doc_id, COALESCE(e.n_bpe, 0) AS n_bpe, COALESCE(e.ids_str, '') AS ids_str,
       |  COALESCE(e.n_unk, 0) AS n_unk
       |FROM (SELECT doc_id FROM documents WHERE doc_id % 2 = 1) d
       |LEFT JOIN enc e USING (doc_id)
       |ORDER BY d.doc_id""".stripMargin
  }

  /** Full SQL twin of s08: per-subspace L2 Lloyd PQ training replayed
    * round by round (assignment = first minimum of the round-6 squared
    * L2, ≡ order by (d2, code); means = vec-id-ordered fold / count,
    * round 9; empty codes keep the previous codeword), then both
    * codebooks' encode → ADC → top-k chains and the exact squared-L2
    * reference, reduced to per-probe hit counts and recalls.
    */
  private def pqTrainedOracleSql(m: Int, ks: Int, sub: Int, iters: Int,
      k: Int, nProbes: Int): String = {
    val dim = m * sub
    def d2sql(a: String, b: String): String =
      s"round(list_reduce(list_transform(range(1, ${sub + 1}), " +
        s"i -> ($a[i] - $b[i]) * ($a[i] - $b[i])), (x, y) -> x + y), 6)"
    val rounds = (1 to iters).map { r =>
      s"""a$r AS (SELECT vec_id, j, code FROM (
         |    SELECT sv.vec_id, sv.j, c.code,
         |      row_number() OVER (PARTITION BY sv.vec_id, sv.j
         |        ORDER BY ${d2sql("s", "cw")}, c.code) AS rr
         |    FROM sv JOIN cb${r - 1} c ON sv.j = c.j) WHERE rr = 1),
         |m$r AS (SELECT j, code, i,
         |    round(list_reduce(list(s[i] ORDER BY vec_id), (x, y) -> x + y)
         |      / count(*), 9) AS mv
         |  FROM a$r JOIN sv USING (vec_id, j) CROSS JOIN range(1, ${sub + 1}) t(i)
         |  GROUP BY j, code, i),
         |n$r AS (SELECT j, code, list(mv ORDER BY i) AS cw FROM m$r GROUP BY j, code),
         |cb$r AS (SELECT c.j, c.code, COALESCE(n.cw, c.cw) AS cw
         |  FROM cb${r - 1} c LEFT JOIN n$r n ON c.j = n.j AND c.code = n.code)""".stripMargin
    }.mkString(",\n")
    def encChain(tag: String, cbName: String): String =
      s"""enc$tag AS (SELECT vec_id AS neighbor_id, j, code FROM (
         |    SELECT sv.vec_id, sv.j, c.code,
         |      row_number() OVER (PARTITION BY sv.vec_id, sv.j
         |        ORDER BY ${d2sql("s", "cw")}, c.code) AS rr
         |    FROM sv JOIN $cbName c ON sv.j = c.j) WHERE rr = 1),
         |pt$tag AS (SELECT sv.vec_id AS probe_id, sv.j, c.code,
         |    ${d2sql("s", "cw")} AS pd
         |  FROM sv JOIN $cbName c ON sv.j = c.j WHERE sv.vec_id < $nProbes),
         |top$tag AS (SELECT probe_id, neighbor_id FROM (
         |    SELECT probe_id, neighbor_id,
         |      row_number() OVER (PARTITION BY probe_id ORDER BY adc, neighbor_id) AS rk
         |    FROM (SELECT probe_id, neighbor_id,
         |        list_reduce(list(pd ORDER BY j), (x, y) -> x + y) AS adc
         |      FROM enc$tag JOIN pt$tag USING (j, code)
         |      WHERE probe_id <> neighbor_id
         |      GROUP BY probe_id, neighbor_id)) WHERE rk <= $k)""".stripMargin
    s"""WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS ev FROM embeddings),
       |sv AS (SELECT vec_id, j, ev[j*$sub+1:j*$sub+$sub] AS s
       |  FROM v CROSS JOIN range($m) r(j)),
       |cb0 AS (SELECT j, code, s AS cw FROM (
       |    SELECT vec_id, j, s,
       |      row_number() OVER (PARTITION BY j ORDER BY vec_id) - 1 AS code
       |    FROM sv WHERE vec_id IN (SELECT vec_id FROM v ORDER BY vec_id LIMIT $ks))),
       |$rounds,
       |${encChain("B", "cb0")},
       |${encChain("T", s"cb$iters")},
       |ex AS (SELECT probe_id, neighbor_id FROM (
       |    SELECT p.vec_id AS probe_id, c.vec_id AS neighbor_id,
       |      row_number() OVER (PARTITION BY p.vec_id ORDER BY
       |        round(list_reduce(list_transform(range(1, ${dim + 1}),
       |          i -> (p.ev[i] - c.ev[i]) * (p.ev[i] - c.ev[i])), (x, y) -> x + y), 6),
       |        c.vec_id) AS rnk
       |    FROM v p JOIN v c ON p.vec_id <> c.vec_id WHERE p.vec_id < $nProbes)
       |  WHERE rnk <= $k),
       |ne AS (SELECT probe_id, CAST(count(*) AS BIGINT) AS n_exact FROM ex GROUP BY probe_id),
       |hb AS (SELECT ex.probe_id, count(*) AS n
       |  FROM ex JOIN topB USING (probe_id, neighbor_id) GROUP BY ex.probe_id),
       |ht AS (SELECT ex.probe_id, count(*) AS n
       |  FROM ex JOIN topT USING (probe_id, neighbor_id) GROUP BY ex.probe_id)
       |SELECT ne.probe_id, ne.n_exact,
       |  CAST(COALESCE(hb.n, 0) AS BIGINT) AS n_hit_base,
       |  CAST(COALESCE(ht.n, 0) AS BIGINT) AS n_hit_tr,
       |  round(CAST(COALESCE(hb.n, 0) AS DOUBLE) / ne.n_exact, 6) AS recall_base,
       |  round(CAST(COALESCE(ht.n, 0) AS DOUBLE) / ne.n_exact, 6) AS recall_tr
       |FROM ne LEFT JOIN hb USING (probe_id) LEFT JOIN ht USING (probe_id)
       |ORDER BY ne.probe_id""".stripMargin
  }

  /** Full SQL twin of g01: the 10 PageRank iterations as a CTE chain —
    * same synthesized edges, same src-ordered contribution folds. The
    * teleport base is interpolated from the SAME Scala double
    * (`1.0 - damping` is 0.15000000000000002, not 0.15 — writing the
    * rounder literal would make the engines round different doubles).
    */
  private def pageRankOracleSql(iters: Int, damping: Double): String = {
    val rounds = (1 to iters).map { i =>
      s"""pr$i AS (SELECT v.id,
         |  round(${1.0 - damping}/(SELECT n FROM nn) + $damping * COALESCE(s.s, 0.0), 12) AS pr
         |  FROM verts v LEFT JOIN (
         |    SELECT dst AS id, list_reduce(list(c ORDER BY src), (a, b) -> a + b) AS s
         |    FROM (SELECT e.dst, e.src, round(p.pr / d.deg, 15) AS c
         |          FROM e JOIN pr${i - 1} p ON e.src = p.id JOIN deg d ON e.src = d.src)
         |    GROUP BY dst) s ON v.id = s.id)""".stripMargin
    }.mkString(",\n")
    s"""WITH nn AS (SELECT count(*) AS n FROM documents),
       |verts AS (SELECT doc_id AS id FROM documents),
       |e AS (SELECT doc_id AS src, (doc_id*7+13) % (SELECT n FROM nn) AS dst FROM documents
       |      UNION ALL SELECT doc_id, (doc_id*31+7) % (SELECT n FROM nn) FROM documents),
       |deg AS (SELECT src, count(*) AS deg FROM e GROUP BY src),
       |pr0 AS (SELECT id, round(1.0/(SELECT n FROM nn), 12) AS pr FROM verts),
       |$rounds
       |SELECT id AS doc_id, pr FROM pr$iters ORDER BY doc_id""".stripMargin
  }

  /** HITS twin (g02): replays every half-step — src-ordered in-edge folds
    * for authority, dst-ordered out-edge folds for hub, the two-level
    * BLOCKED L1 totals (id-ordered folds per id//4096 block, then a
    * block-ordered fold of the block sums — Graph.hits' exact tree),
    * round-12 normalized scores. Score CTEs are MATERIALIZED (each feeds
    * the next half-step AND the final join).
    */
  private def hitsOracleSql(iters: Int): String = {
    val rounds = (1 to iters).map { i =>
      s"""ar$i AS MATERIALIZED (SELECT e.dst AS id,
         |  list_reduce(list(h.v ORDER BY e.src), (x, y) -> x + y) AS raw
         |  FROM e JOIN h${i - 1} h ON e.src = h.id GROUP BY e.dst),
         |abs$i AS (SELECT id // 4096 AS blk,
         |  list_reduce(list(raw ORDER BY id), (x, y) -> x + y) AS s
         |  FROM ar$i GROUP BY blk),
         |at$i AS (SELECT list_reduce(list(s ORDER BY blk), (x, y) -> x + y) AS tot FROM abs$i),
         |a$i AS MATERIALIZED (SELECT v.id, round(COALESCE(ar.raw, 0.0) / t.tot, 12) AS v
         |  FROM verts v LEFT JOIN ar$i ar ON v.id = ar.id CROSS JOIN at$i t),
         |hr$i AS MATERIALIZED (SELECT e.src AS id,
         |  list_reduce(list(a.v ORDER BY e.dst), (x, y) -> x + y) AS raw
         |  FROM e JOIN a$i a ON e.dst = a.id GROUP BY e.src),
         |hbs$i AS (SELECT id // 4096 AS blk,
         |  list_reduce(list(raw ORDER BY id), (x, y) -> x + y) AS s
         |  FROM hr$i GROUP BY blk),
         |ht$i AS (SELECT list_reduce(list(s ORDER BY blk), (x, y) -> x + y) AS tot FROM hbs$i),
         |h$i AS MATERIALIZED (SELECT v.id, round(COALESCE(hr.raw, 0.0) / t.tot, 12) AS v
         |  FROM verts v LEFT JOIN hr$i hr ON v.id = hr.id CROSS JOIN ht$i t)""".stripMargin
    }.mkString(",\n")
    s"""WITH nn AS (SELECT count(*) AS n FROM documents),
       |verts AS (SELECT doc_id AS id FROM documents),
       |e AS MATERIALIZED (SELECT doc_id AS src, (doc_id*7+13) % (SELECT n FROM nn) AS dst FROM documents
       |      UNION ALL SELECT doc_id, (doc_id*31+7) % (SELECT n FROM nn) FROM documents),
       |h0 AS (SELECT id, round(1.0/(SELECT n FROM nn), 12) AS v FROM verts),
       |$rounds
       |SELECT v.id AS doc_id, a$iters.v AS auth, h$iters.v AS hub
       |FROM verts v JOIN a$iters ON v.id = a$iters.id JOIN h$iters ON v.id = h$iters.id
       |ORDER BY doc_id""".stripMargin
  }

  /** MMR twin (s09): candidate pool + candidate-pair sims as round-6
    * cosines, then every greedy round unrolled — per round, the max-sim
    * penalty against the selected-so-far union, the interpolated
    * `rel·λ − pen·(1−λ)` chain (λ and 1−λ printed from the SAME Scala
    * doubles the operator multiplies by), round-6 score, id tie-break.
    */
  private def mmrOracleSql(kCand: Int, kSelect: Int, lambda: Double): String = {
    val mu = 1.0 - lambda
    def selUnion(r: Int) =
      (1 to r).map(i => s"SELECT probe_id, neighbor_id FROM sel$i").mkString(" UNION ALL ")
    val rounds = (2 to kSelect).map { r =>
      s"""selu${r - 1} AS (${selUnion(r - 1)}),
         |pen$r AS (SELECT cc.probe_id, cc.a_id AS neighbor_id, max(cc.cc) AS pen
         |  FROM cc JOIN selu${r - 1} s ON cc.probe_id = s.probe_id AND cc.b_id = s.neighbor_id
         |  GROUP BY cc.probe_id, cc.a_id),
         |sc$r AS (SELECT c.probe_id, c.neighbor_id, c.rel,
         |    round(c.rel * $lambda - COALESCE(p.pen, 0.0) * $mu, 7) AS mmr_score
         |  FROM cand c LEFT JOIN pen$r p USING (probe_id, neighbor_id)
         |  WHERE NOT EXISTS (SELECT 1 FROM selu${r - 1} s
         |    WHERE s.probe_id = c.probe_id AND s.neighbor_id = c.neighbor_id)),
         |sel$r AS MATERIALIZED (SELECT probe_id, CAST($r AS BIGINT) AS mmr_rank,
         |    neighbor_id, rel, mmr_score
         |  FROM (SELECT *, row_number() OVER (PARTITION BY probe_id
         |     ORDER BY mmr_score DESC, neighbor_id) AS rn FROM sc$r) WHERE rn = 1)""".stripMargin
    }.mkString(",\n")
    val finalUnion = (1 to kSelect).map(i => s"SELECT * FROM sel$i").mkString(" UNION ALL ")
    s"""WITH p AS (SELECT vec_id AS probe_id, embedding::DOUBLE[] AS pv FROM embeddings WHERE vec_id < 5),
       |c AS (SELECT vec_id AS neighbor_id, embedding::DOUBLE[] AS cv FROM embeddings),
       |s AS (SELECT probe_id, neighbor_id, list_cosine_similarity(pv, cv) AS sim
       |      FROM p JOIN c ON probe_id <> neighbor_id),
       |cand AS MATERIALIZED (SELECT probe_id, neighbor_id, round(sim, 6) AS rel FROM (
       |  SELECT probe_id, neighbor_id, sim, row_number() OVER (PARTITION BY probe_id
       |    ORDER BY sim DESC, neighbor_id) AS rnk FROM s) WHERE rnk <= $kCand),
       |cc AS MATERIALIZED (SELECT a.probe_id, a.neighbor_id AS a_id, b.neighbor_id AS b_id,
       |    round(list_cosine_similarity(ca.cv, cb.cv), 6) AS cc
       |  FROM cand a JOIN cand b ON a.probe_id = b.probe_id AND a.neighbor_id <> b.neighbor_id
       |  JOIN c ca ON ca.neighbor_id = a.neighbor_id
       |  JOIN c cb ON cb.neighbor_id = b.neighbor_id),
       |sel1 AS MATERIALIZED (SELECT probe_id, CAST(1 AS BIGINT) AS mmr_rank, neighbor_id, rel,
       |    round(rel * $lambda - 0.0 * $mu, 7) AS mmr_score
       |  FROM (SELECT *, row_number() OVER (PARTITION BY probe_id
       |    ORDER BY round(rel * $lambda - 0.0 * $mu, 7) DESC, neighbor_id) AS rn FROM cand)
       |  WHERE rn = 1),
       |$rounds
       |SELECT * FROM ($finalUnion) ORDER BY probe_id, mmr_rank""".stripMargin
  }

  def oracleSql: Map[String, String] = Map(
    "g01_pagerank" -> pageRankOracleSql(iters = 10, damping = 0.85),
    "g02_hits" -> hitsOracleSql(iters = 5),
    "s09_mmr" -> mmrOracleSql(kCand = 10, kSelect = 3, lambda = 0.7),

    "q01_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        | CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        | CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
        | CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1 - l_discount AS DECIMAL(3,2))) AS DOUBLE) AS sum_disc_price,
        | CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1 - l_discount AS DECIMAL(3,2)) * CAST(1 + l_tax AS DECIMAL(3,2))) AS DOUBLE) AS sum_charge,
        | count(*) AS count_order,
        | CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_qty
        |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-01'
        |GROUP BY l_returnflag, l_linestatus ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "q02_filter_pushdown" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01' AND l_quantity < 3
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,

    "q03_top_customers" ->
      """SELECT c_custkey, c_name,
        | CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1 - l_discount AS DECIMAL(3,2))) AS DOUBLE) AS revenue,
        | count(*) AS n_items
        |FROM customer JOIN orders ON c_custkey = o_custkey JOIN lineitem ON o_orderkey = l_orderkey
        |GROUP BY c_custkey, c_name ORDER BY revenue DESC, c_custkey LIMIT 10""".stripMargin,

    "q04_broadcast_dims" ->
      """SELECT r_name, n_name, count(*) AS n_customers,
        | CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_acctbal
        |FROM customer JOIN nation ON c_nationkey = n_nationkey JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name, n_name ORDER BY r_name, n_name""".stripMargin,

    "q05_semi_join" ->
      """SELECT c_custkey FROM customer
        |WHERE c_mktsegment = 'BUILDING' AND EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |ORDER BY c_custkey""".stripMargin,

    "q06_anti_join" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |ORDER BY c_custkey""".stripMargin,

    "q07_window_rank" ->
      """SELECT o_custkey, o_orderkey, o_totalprice FROM (
        | SELECT o_custkey, o_orderkey, o_totalprice,
        |  row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rn
        | FROM orders) WHERE rn = 1 ORDER BY o_custkey""".stripMargin,

    "q08_window_running" ->
      """SELECT o_custkey, o_orderkey,
        | CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_spend,
        | lag(o_totalprice, 1) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS prev_price
        |FROM orders ORDER BY o_custkey, o_orderkey""".stripMargin,

    "q09_rollup" ->
      """SELECT l_returnflag, l_linestatus, count(*) AS n,
        | CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
        |FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
        |ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""".stripMargin,

    "q10_count_distinct" ->
      """SELECT l_returnflag, count(DISTINCT l_partkey) AS n_parts,
        | count(DISTINCT l_suppkey) AS n_supps, count(*) AS n
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "q11_intersect" ->
      """SELECT * FROM (
        | SELECT c_custkey FROM customer WHERE c_acctbal > 5000
        | INTERSECT
        | SELECT o_custkey AS c_custkey FROM orders WHERE o_totalprice > 100000
        |) ORDER BY c_custkey""".stripMargin,

    "q12_except" ->
      """SELECT * FROM (
        | SELECT c_custkey FROM customer EXCEPT SELECT o_custkey AS c_custkey FROM orders
        |) ORDER BY c_custkey""".stripMargin,

    "q13_topk" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 20""".stripMargin,

    "q14_union" ->
      """SELECT * FROM (
        | SELECT 'high' AS bucket, o_orderkey, o_totalprice FROM orders WHERE o_totalprice > 400000
        | UNION ALL
        | SELECT 'low' AS bucket, o_orderkey, o_totalprice FROM orders WHERE o_totalprice < 5000
        |) ORDER BY bucket, o_orderkey""".stripMargin,

    "q15_cube" ->
      """SELECT o_orderstatus, o_orderpriority, count(*) AS n FROM orders
        |GROUP BY CUBE(o_orderstatus, o_orderpriority)
        |ORDER BY o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST""".stripMargin,

    "q16_range_join" ->
      """SELECT o_orderstatus, count(*) AS n
        |FROM orders JOIN lineitem ON l_orderkey = o_orderkey
        | AND l_shipdate >= o_orderdate AND l_shipdate < o_orderdate + INTERVAL 30 DAY
        |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,

    "q17_events_json" ->
      """SELECT event_type,
        | CAST(sum(CAST(NULLIF(regexp_extract(props, '"k":\s*(\d+)', 1), '') AS BIGINT)) AS BIGINT) AS sum_k,
        | count(*) AS n
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

    "q18_events_hourly" ->
      """SELECT event_type, CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS hour_epoch,
        | count(*) AS n, CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
        |FROM events GROUP BY event_type, hour_epoch ORDER BY event_type, hour_epoch""".stripMargin,

    "q19_bitrate_parse" -> (
      s"""SELECT CAST(floor(sum(CAST(mbps AS DECIMAL(28,6)))) AS BIGINT) AS total_mbps_int,
         | CAST((sum(CAST(mbps AS DECIMAL(28,6))) - floor(sum(CAST(mbps AS DECIMAL(28,6))))) * 1000000 AS BIGINT) AS micro_rem,
         | count(mbps) AS n_parsed, count(*) AS n
         |FROM (SELECT $bitrateSqlExpr AS mbps FROM (
         | SELECT CAST(l_quantity AS VARCHAR) ||
         |  CASE l_linenumber % 6 WHEN 0 THEN ' bps' WHEN 1 THEN ' Kbps' WHEN 2 THEN ' Mbps'
         |   WHEN 3 THEN ' Gbps' WHEN 4 THEN ' Tbps' ELSE '' END AS br
         | FROM lineitem))""".stripMargin),

    // Golden VALUES twin of the NEF fixture pipeline (expected values from
    // reference tests/test_receiver.py:204–471; 1776680100 = 2026-04-20T10:15:00Z,
    // 1776680090 = 10:14:50Z, 1700000000 = injected fixed "now").
    "q20_nef_envelope" ->
      """SELECT * FROM (VALUES
        | ('PERF_DATA', CAST(1776680100 AS BIGINT), 1, '000001', 'internet', '10.0.1.10', NULL, NULL,
        |  CAST(NULL AS DOUBLE), CAST(50.0 AS DOUBLE), CAST(NULL AS BIGINT), CAST(NULL AS BIGINT),
        |  CAST(NULL AS INTEGER), CAST(NULL AS BIGINT), NULL, CAST(NULL AS BIGINT), CAST(NULL AS BIGINT), CAST(NULL AS BIGINT)),
        | ('PERF_DATA', CAST(1776680100 AS BIGINT), 1, '000001', 'internet', '10.0.1.10', 'app-test', NULL,
        |  CAST(11.74 AS DOUBLE), CAST(87.57 AS DOUBLE), CAST(18 AS BIGINT), CAST(17 AS BIGINT),
        |  CAST(NULL AS INTEGER), CAST(NULL AS BIGINT), NULL, CAST(NULL AS BIGINT), CAST(NULL AS BIGINT), CAST(NULL AS BIGINT)),
        | ('UE_COMM', CAST(1776680100 AS BIGINT), 1, '000001', 'internet', NULL, NULL, 'imsi-001011234567890',
        |  CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE), CAST(NULL AS BIGINT), CAST(NULL AS BIGINT),
        |  CAST(NULL AS INTEGER), CAST(NULL AS BIGINT), NULL, CAST(1776680100 AS BIGINT), CAST(1048576 AS BIGINT), CAST(52428800 AS BIGINT)),
        | ('UE_MOBILITY', CAST(1700000000 AS BIGINT), 1, '000001', 'internet', NULL, NULL, 'imsi-001011234567890',
        |  CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE), CAST(NULL AS BIGINT), CAST(NULL AS BIGINT),
        |  CAST(0 AS INTEGER), CAST(NULL AS BIGINT), NULL, CAST(NULL AS BIGINT), CAST(NULL AS BIGINT), CAST(NULL AS BIGINT)),
        | ('UE_MOBILITY', CAST(1776680090 AS BIGINT), 1, '000001', 'internet', NULL, NULL, 'imsi-001011234567890',
        |  CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE), CAST(NULL AS BIGINT), CAST(NULL AS BIGINT),
        |  CAST(2 AS INTEGER), CAST(1776680090 AS BIGINT), '000001', CAST(NULL AS BIGINT), CAST(NULL AS BIGINT), CAST(NULL AS BIGINT)),
        | ('UE_MOBILITY', CAST(1776680100 AS BIGINT), 1, '000001', 'internet', NULL, NULL, 'imsi-001011234567890',
        |  CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE), CAST(NULL AS BIGINT), CAST(NULL AS BIGINT),
        |  CAST(1 AS INTEGER), CAST(1776680100 AS BIGINT), NULL, CAST(NULL AS BIGINT), CAST(NULL AS BIGINT), CAST(NULL AS BIGINT))
        |) AS t(event, "timestamp", sst, sd, dnn, ipv4, app_id, supi, thrput_ul, thrput_dl, pdb_ms, plr,
        |       n_traj, traj0_ts, traj0_tac, comm0_end, comm0_ul, comm0_dl)
        |ORDER BY event, "timestamp", coalesce(thrput_dl, -1.0)""".stripMargin,

    "q21_discovered_fields" ->
      """SELECT * FROM (VALUES ('comms'), ('pdb_ms'), ('plr_per_thousand'), ('thrputDl_mbps'),
        | ('thrputUl_mbps'), ('trajectory')) AS t(field) ORDER BY field""".stripMargin,

    // DuckDB // and % truncate toward zero; the ((x % d) + d) % d form is
    // the pmod that makes the division a FLOOR, matching the Spark side
    // for pre-1970 timestamps.
    "q24_session_windows" ->
      """WITH e AS (SELECT event_type,
        |  CAST((epoch_ns(ts) - ((epoch_ns(ts) % 1000000000 + 1000000000) % 1000000000)) // 1000000000 AS BIGINT) AS sec,
        |  value FROM events),
        |o AS (SELECT event_type, sec, value,
        |  CASE WHEN lag(sec) OVER w IS NULL OR sec - lag(sec) OVER w > 1800 THEN 1 ELSE 0 END AS new_s
        |  FROM e WINDOW w AS (PARTITION BY event_type ORDER BY sec)),
        |s AS (SELECT event_type, sec, value,
        |  sum(new_s) OVER (PARTITION BY event_type ORDER BY sec ROWS UNBOUNDED PRECEDING) AS sid FROM o)
        |SELECT event_type, min(sec) AS session_start, max(sec) + 1800 AS session_end,
        | count(*) AS n_events, CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
        |FROM s GROUP BY event_type, sid ORDER BY event_type, session_start""".stripMargin,

    "q25_sliding_windows" ->
      """WITH e AS (SELECT event_type,
        |  CAST((epoch_ns(ts) - ((epoch_ns(ts) % 1000000000 + 1000000000) % 1000000000)) // 1000000000 AS BIGINT) AS sec
        |FROM events),
        |w AS (SELECT event_type,
        |  unnest([sec - ((sec % 3600 + 3600) % 3600), sec - ((sec % 3600 + 3600) % 3600) - 3600]) AS window_start
        |FROM e)
        |SELECT event_type, window_start, count(*) AS n
        |FROM w GROUP BY event_type, window_start
        |ORDER BY event_type, window_start""".stripMargin,

    "q27_percentiles" ->
      """SELECT o_orderstatus, quantile_cont(o_totalprice, 0.5) AS p50,
        | quantile_cont(o_totalprice, 0.95) AS p95, count(*) AS n
        |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,

    // IQR twin (q53): quantile_cont quartiles, the same fence arithmetic.
    "q53_iqr_outliers" ->
      """WITH s AS (SELECT event_type, quantile_cont(value, 0.25) AS q1,
        |  quantile_cont(value, 0.75) AS q3 FROM events GROUP BY event_type),
        |b AS (SELECT event_type, q1 - (q3 - q1) * 1.5 AS lo,
        |  q3 + (q3 - q1) * 1.5 AS hi FROM s)
        |SELECT e.event_type, count(*) AS n,
        | CAST(sum(CASE WHEN value < lo OR value > hi THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers,
        | min(lo) AS lo, min(hi) AS hi
        |FROM events e JOIN b USING (event_type)
        |GROUP BY e.event_type ORDER BY e.event_type""".stripMargin,

    // Sketch twins (q30/q35): the estimator internals are engine-specific,
    // so the twin checks the two halves of the contract separately — the
    // exact aggregate hash-matches cross-engine, and the sketch's
    // documented error bound is a deterministic boolean the Spark side
    // computes and the twin asserts as literal TRUE. A sketch regression
    // beyond its bound now fails the gate, not just the unit test.
    "q30_approx_distinct" ->
      """SELECT l_returnflag, count(DISTINCT l_partkey) AS exact_parts,
        | TRUE AS approx_err_ok, TRUE AS sketch_err_ok
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "q35_approx_percentiles" ->
      """SELECT l_returnflag, quantile_cont(l_extendedprice, 0.5) AS p50_exact,
        | quantile_cont(l_extendedprice, 0.95) AS p95_exact,
        | TRUE AS p50_err_ok, TRUE AS p95_err_ok
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "q26_asof_join" ->
      """WITH l AS (SELECT user_id, ts, event_id FROM events WHERE event_type = 'error'),
        |r AS (SELECT user_id, ts, value FROM events WHERE event_type = 'purchase')
        |SELECT l.user_id, l.event_id, round(r.value, 6) AS purch_value
        |FROM l ASOF LEFT JOIN r ON l.user_id = r.user_id AND l.ts >= r.ts
        |ORDER BY l.user_id, l.event_id""".stripMargin,

    "q28_pivot" ->
      """SELECT o_orderpriority,
        | count(CASE WHEN o_orderstatus = 'F' THEN 1 END) AS n_f,
        | count(CASE WHEN o_orderstatus = 'O' THEN 1 END) AS n_o,
        | count(CASE WHEN o_orderstatus = 'P' THEN 1 END) AS n_p
        |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,

    "q33_range_frame" ->
      """SELECT o_custkey, o_orderkey,
        | CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
        |   PARTITION BY o_custkey ORDER BY o_orderdate
        |   RANGE BETWEEN INTERVAL 30 DAY PRECEDING AND CURRENT ROW) AS DOUBLE) AS spend_30d
        |FROM orders ORDER BY o_custkey, o_orderkey""".stripMargin,

    "q34_distribution_windows" ->
      """SELECT o_orderstatus, o_orderkey,
        | ntile(4) OVER w AS quartile,
        | percent_rank() OVER w AS pr,
        | cume_dist() OVER w AS cd
        |FROM orders WINDOW w AS (PARTITION BY o_orderstatus ORDER BY o_totalprice, o_orderkey)
        |ORDER BY o_orderstatus, o_orderkey""".stripMargin,

    "q31_grouping_sets" ->
      """SELECT o_orderstatus, o_orderpriority, count(*) AS n,
        | CAST(GROUPING(o_orderstatus, o_orderpriority) AS BIGINT) AS gid
        |FROM orders GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        |ORDER BY gid, o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""".stripMargin,

    "q29_posexplode" -> (
      s"""WITH tok AS (SELECT doc_id, $tokensSqlExpr AS ws FROM documents WHERE doc_id < 20),
         |ex AS (SELECT doc_id, unnest(list_transform(range(least(len(ws), 5)),
         |  i -> {'pos': i, 'token': ws[CAST(i + 1 AS INT)]})) AS u FROM tok)
         |SELECT doc_id, CAST(u.pos AS INT) AS pos, u.token AS token FROM ex
         |ORDER BY doc_id, pos""".stripMargin),

    // Golden VALUES twin of the policy gate: UE_COMM rows denied, supi
    // sha256-hashed (DuckDB sha256 = Spark sha2(…,256)), dnn redacted,
    // pdb_ms metric dropped. Expected rows derived from the q20 goldens.
    "q22_policy_gate" ->
      """SELECT * FROM (VALUES
        | ('PERF_DATA', CAST(1776680100 AS BIGINT), CAST(NULL AS VARCHAR), '***', '10.0.1.10',
        |  CAST(NULL AS BIGINT), CAST(NULL AS BIGINT), CAST(50.0 AS DOUBLE)),
        | ('PERF_DATA', CAST(1776680100 AS BIGINT), CAST(NULL AS VARCHAR), '***', '10.0.1.10',
        |  CAST(NULL AS BIGINT), CAST(17 AS BIGINT), CAST(87.57 AS DOUBLE)),
        | ('UE_MOBILITY', CAST(1776680090 AS BIGINT), sha256('imsi-001011234567890'), '***', CAST(NULL AS VARCHAR),
        |  CAST(NULL AS BIGINT), CAST(NULL AS BIGINT), CAST(NULL AS DOUBLE)),
        | ('UE_MOBILITY', CAST(1776680100 AS BIGINT), sha256('imsi-001011234567890'), '***', CAST(NULL AS VARCHAR),
        |  CAST(NULL AS BIGINT), CAST(NULL AS BIGINT), CAST(NULL AS DOUBLE))
        |) AS t(event, "timestamp", supi_h, dnn, ipv4, pdb_ms, plr, thrput_dl)
        |ORDER BY event, "timestamp", coalesce(thrput_dl, -1.0)""".stripMargin,

    // Golden twin of the Kafka batch-collect contract: ONE JSON-array
    // message for the known subscription (reference receiver.py:442–445,
    // asserted in tests/test_receiver.py:226–237); the unknown-notifId
    // payload contributes nothing (403 anti-join path).
    "q23_kafka_batches" ->
      """SELECT * FROM (VALUES ('test-notif-001',
        | '[{"timestamp":1776680100,"tags":{"snssai_sst":1,"snssai_sd":"000001","dnn":"internet","ueIpv4Addr":"10.0.1.10","appId":"app-test"},"event":"PERF_DATA","metrics":{"thrputUl_mbps":11.74,"thrputDl_mbps":87.57,"pdb_ms":18.0,"plr_per_thousand":17.0}},{"timestamp":1776680100,"tags":{"snssai_sst":1,"snssai_sd":"000001","dnn":"internet","supi":"imsi-001011234567890"},"event":"UE_COMM","metrics":{},"comms":[{"startTime":1776679200,"endTime":1776680100,"ulVol":1048576,"dlVol":52428800}]}]'
        |)) AS t(key, "value") ORDER BY key""".stripMargin,

    "d01_dedup_exact" ->
      """SELECT min(doc_id) AS keep_id, count(*) AS n_copies FROM documents
        |GROUP BY text ORDER BY keep_id""".stripMargin,

    "d02_dedup_fingerprint" ->
      """SELECT doc_id, md5(regexp_replace(trim(lower(text)), '\s+', ' ', 'g')) AS fp
        |FROM documents ORDER BY doc_id""".stripMargin,

    "d03_ngram_jaccard" -> (
      s"""WITH tok AS (SELECT doc_id, $tokensSqlExpr AS ws FROM documents),
         |g AS (SELECT doc_id, CASE WHEN len(ws) >= 3
         |  THEN list_distinct(list_transform(range(len(ws) - 2), i -> ws[i+1] || ' ' || ws[i+2] || ' ' || ws[i+3]))
         |  ELSE [] END AS sh FROM tok),
         |e AS (SELECT doc_id, len(sh) AS sz, unnest(sh) AS shingle FROM g),
         |inter AS (
         | SELECT a.doc_id AS a_id, b.doc_id AS b_id, a.sz AS a_size, b.sz AS b_size, count(*) AS n_inter
         | FROM e a JOIN e b USING (shingle)
         | WHERE a.doc_id < 50 AND a.doc_id <> b.doc_id
         | GROUP BY 1, 2, 3, 4)
         |SELECT a_id, b_id, jaccard FROM (
         | SELECT a_id, b_id, CAST(n_inter AS DOUBLE) / (a_size + b_size - n_inter) AS jaccard FROM inter)
         |WHERE jaccard >= 0.2 ORDER BY a_id, b_id""".stripMargin),

    "d09_containment" -> (
      s"""WITH tok AS (SELECT doc_id, $tokensSqlExpr AS ws FROM documents),
         |g AS (SELECT doc_id, CASE WHEN len(ws) >= 3
         |  THEN list_distinct(list_transform(range(len(ws) - 2), i -> ws[i+1] || ' ' || ws[i+2] || ' ' || ws[i+3]))
         |  ELSE [] END AS sh FROM tok),
         |e AS (SELECT doc_id, len(sh) AS sz, unnest(sh) AS shingle FROM g),
         |inter AS (
         | SELECT a.doc_id AS a_id, b.doc_id AS b_id, a.sz AS a_size, count(*) AS n_inter
         | FROM e a JOIN e b USING (shingle)
         | WHERE a.doc_id < 50 AND a.doc_id <> b.doc_id
         | GROUP BY 1, 2, 3)
         |SELECT a_id, b_id, containment FROM (
         | SELECT a_id, b_id, CAST(n_inter AS DOUBLE) / a_size AS containment FROM inter)
         |WHERE containment >= 0.4 ORDER BY a_id, b_id""".stripMargin),

    // Transitive closure via recursive CTE: the UNION (distinct) bounds the
    // state space, and a label only propagates to strictly larger ids —
    // every path out of a component's min vertex visits only larger ids, so
    // the min label reaches every member. The `ef` index side mirrors the
    // operator's maxDf=1000 hot-shingle cap (index rows whose shingle DF
    // exceeds the cap are dropped; set sizes stay UNcapped) so operator and
    // oracle express the same algorithm on any corpus — at this one the cap
    // is inert (max DF 25).
    "d07_dedup_clusters" -> (
      s"""WITH RECURSIVE tok AS (SELECT doc_id, $tokensSqlExpr AS ws FROM documents),
         |g AS (SELECT doc_id, CASE WHEN len(ws) >= 3
         |  THEN list_distinct(list_transform(range(len(ws) - 2), i -> ws[i+1] || ' ' || ws[i+2] || ' ' || ws[i+3]))
         |  ELSE [] END AS sh FROM tok),
         |e AS (SELECT doc_id, len(sh) AS sz, unnest(sh) AS shingle FROM g),
         |df AS (SELECT shingle, count(*) AS dfreq FROM e GROUP BY shingle),
         |ef AS (SELECT e.doc_id, e.sz, e.shingle FROM e JOIN df USING (shingle) WHERE dfreq <= 1000),
         |inter AS (
         | SELECT a.doc_id AS a_id, b.doc_id AS b_id, a.sz AS a_size, b.sz AS b_size, count(*) AS n_inter
         | FROM e a JOIN ef b USING (shingle)
         | WHERE a.doc_id < b.doc_id
         | GROUP BY 1, 2, 3, 4),
         |edges AS (
         | SELECT a_id, b_id FROM inter
         | WHERE CAST(n_inter AS DOUBLE) / (a_size + b_size - n_inter) >= 0.2),
         |bidir AS (SELECT a_id AS src, b_id AS dst FROM edges
         |          UNION ALL SELECT b_id AS src, a_id AS dst FROM edges),
         |reach(id, label) AS (
         | SELECT doc_id, doc_id FROM documents
         | UNION
         | SELECT b.dst, r.label FROM reach r JOIN bidir b ON r.id = b.src WHERE r.label < b.dst),
         |cc AS (SELECT id AS doc_id, min(label) AS cluster_id FROM reach GROUP BY id)
         |SELECT doc_id, cluster_id,
         | count(*) OVER (PARTITION BY cluster_id) AS cluster_size,
         | doc_id = cluster_id AS is_survivor
         |FROM cc ORDER BY doc_id""".stripMargin),

    // MinHash core twin: signature values per (doc, position) from the
    // shared CTE builder (constants, base hash, and wrapping arithmetic
    // documented at portableMinhashCtes).
    "d10_minhash_portable" ->
      s"""WITH ${portableMinhashCtes(16)}
         |SELECT doc_id, pos, CAST(list_min(list_transform(hl, h -> $minhashSwExpr)) AS BIGINT) AS min_hash
         |FROM hs CROSS JOIN consts
         |ORDER BY doc_id, pos""".stripMargin,

    // Full LSH pair twin of d11: the same signature chain at k=64, then
    // banding expressed as band-slice equality. Spark's internal
    // xxhash64(band, slice) bucket key is a pure partitioning key: slice
    // equality implies bucket equality, and the converse holds modulo
    // 64-bit hash collisions between distinct (band, slice) pairs — a
    // collision could admit a Spark-only candidate pair this twin lacks
    // (visible only if its est_jaccard also clears the threshold);
    // negligible at 2^-64 but worth considering if this oracle mismatches.
    "d11_minhash_lsh_portable" ->
      s"""WITH ${portableMinhashCtes(64)},
         |${portableLshPairCtes(64, 16, 0.4)}
         |SELECT a_id, b_id, est_jaccard FROM pairs ORDER BY a_id, b_id""".stripMargin,

    // LSH pair-set contract (d04): the oracle rebuilds the PORTABLE pair
    // set; value-compare then asserts the xx-family pair set (Spark's
    // output rows) is identical, and the TRUE flag is asserted against
    // Spark's own symmetric-difference check between the two families.
    "d04_minhash_lsh" ->
      s"""WITH ${portableMinhashCtes(64)},
         |${portableLshPairCtes(64, 16, 0.4)}
         |SELECT a_id, b_id, TRUE AS portable_agree FROM pairs
         |ORDER BY a_id, b_id""".stripMargin,

    // Approx-cluster twin of d12: d11's pair chain as the edge set feeding
    // the SAME recursive-CTE transitive closure as d07 (min-label
    // reachability, see the d07 comment), then the identical
    // (cluster_id, cluster_size, is_survivor) resolution.
    "d12_dedup_clusters_approx" ->
      s"""WITH RECURSIVE ${portableMinhashCtes(64)},
         |${portableLshPairCtes(64, 16, 0.4)},
         |bidir AS (SELECT a_id AS src, b_id AS dst FROM pairs
         |          UNION ALL SELECT b_id AS src, a_id AS dst FROM pairs),
         |reach(id, label) AS (
         | SELECT doc_id, doc_id FROM documents
         | UNION
         | SELECT b.dst, r.label FROM reach r JOIN bidir b ON r.id = b.src WHERE r.label < b.dst),
         |cc AS (SELECT id AS doc_id, min(label) AS cluster_id FROM reach GROUP BY id)
         |SELECT doc_id, cluster_id,
         | count(*) OVER (PARTITION BY cluster_id) AS cluster_size,
         | doc_id = cluster_id AS is_survivor
         |FROM cc ORDER BY doc_id""".stripMargin,

    // CDC-chunking twin (d23): same w-gram cut predicate (md5-low64
    // HUGEINT ≡ 0 mod 16 — sign-irrelevant for the zero test), same
    // span assembly, same chunk md5 fingerprints and corpus-wide counts.
    "d23_cdc_chunks" ->
      s"""WITH tok AS (SELECT doc_id, ws FROM (
         |  SELECT doc_id, $tokensSqlExpr AS ws FROM documents) WHERE len(ws) >= 1),
         |g AS (SELECT doc_id, ws, CAST(len(ws) AS BIGINT) AS n_tokens,
         |  list_transform(range(4, len(ws) + 1), p ->
         |    array_to_string(ws[p-3:p], ' ')) AS grams FROM tok),
         |h AS (SELECT doc_id, ws, n_tokens,
         |  list_transform(grams, s -> $md5Low64SqlExpr) AS hs FROM g),
         |cu AS (SELECT doc_id, ws, n_tokens,
         |  list_filter(range(4, len(ws) + 1), (p, i) -> hs[i] % 16 = 0) AS cuts FROM h),
         |sp0 AS (SELECT doc_id, ws, n_tokens,
         |  list_concat([CAST(1 AS BIGINT)], list_transform(cuts, c -> c + 1)) AS starts,
         |  list_concat(cuts, [n_tokens]) AS ends FROM cu),
         |sp AS (SELECT doc_id, ws, n_tokens,
         |  list_filter(list_transform(range(1, len(starts) + 1),
         |    i -> {'st': starts[i], 'en': ends[i]}), x -> x.st <= x.en) AS spans FROM sp0),
         |e AS (SELECT doc_id, ws, unnest(spans) AS c,
         |  generate_subscripts(spans, 1) - 1 AS chunk_idx FROM sp),
         |f AS (SELECT doc_id, CAST(chunk_idx AS BIGINT) AS chunk_idx,
         |  c.st AS start_pos, c.en - c.st + 1 AS chunk_len,
         |  md5(array_to_string(ws[c.st:c.en], ' ')) AS chunk_fp FROM e),
         |n AS (SELECT chunk_fp, count(*) AS fp_n FROM f GROUP BY chunk_fp)
         |SELECT doc_id, chunk_idx, start_pos, chunk_len, chunk_fp, fp_n > 1 AS is_dup
         |FROM f JOIN n USING (chunk_fp)
         |ORDER BY doc_id, chunk_idx""".stripMargin,

    // Soft-dedup twin (d22): d12's cluster chain + the same 1/size
    // division of exact operands, rounded to 9 dp.
    "d22_soft_dedup" ->
      s"""WITH RECURSIVE ${portableMinhashCtes(64)},
         |${portableLshPairCtes(64, 16, 0.4)},
         |bidir AS (SELECT a_id AS src, b_id AS dst FROM pairs
         |          UNION ALL SELECT b_id AS src, a_id AS dst FROM pairs),
         |reach(id, label) AS (
         | SELECT doc_id, doc_id FROM documents
         | UNION
         | SELECT b.dst, r.label FROM reach r JOIN bidir b ON r.id = b.src WHERE r.label < b.dst),
         |cc AS (SELECT id AS doc_id, min(label) AS cluster_id FROM reach GROUP BY id),
         |sz AS (SELECT doc_id, cluster_id,
         | count(*) OVER (PARTITION BY cluster_id) AS cluster_size FROM cc)
         |SELECT doc_id, cluster_id, cluster_size,
         | round(CAST(1.0 AS DOUBLE) / CAST(cluster_size AS DOUBLE), 9) AS weight
         |FROM sz ORDER BY doc_id""".stripMargin,

    // Profile twin (q44): per-column row from the identical exact-sum
    // mean formula (decimal sum → double → /n → round 6).
    "q44_profile" -> {
      val cols = Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")
      cols.map { c =>
        s"""SELECT '$c' AS "column", count(*) AS n_rows,
           | CAST(sum(CASE WHEN $c IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls,
           | count(DISTINCT $c) AS n_distinct,
           | CAST(min($c) AS DOUBLE) AS min_v, CAST(max($c) AS DOUBLE) AS max_v,
           | CASE WHEN count($c) = 0 THEN NULL
           |   ELSE round(CAST(sum(CAST($c AS DECIMAL(28,10))) AS DOUBLE) / count($c), 6)
           | END AS mean_v
           |FROM lineitem""".stripMargin
      }.mkString("", "\nUNION ALL\n", "\nORDER BY \"column\"")
    },

    // Histogram twin (q52): same data-derived bounds, same floor/least
    // bin map.
    "q52_histogram" ->
      """WITH b AS (SELECT CAST(min(l_extendedprice) AS DOUBLE) AS lo,
        |  CAST(max(l_extendedprice) AS DOUBLE) AS hi FROM lineitem),
        |v AS (SELECT CAST(l_extendedprice AS DOUBLE) AS v FROM lineitem
        |  WHERE l_extendedprice IS NOT NULL)
        |SELECT CAST(CASE WHEN hi = lo THEN 0
        |  ELSE least(floor((v - lo) / ((hi - lo) / 8)), 7) END AS BIGINT) AS bin,
        | count(*) AS n
        |FROM v CROSS JOIN b GROUP BY bin ORDER BY bin""".stripMargin,

    // Expectations twin (q45): same predicates, same null-is-violation
    // coalesce, same pass flags.
    "q45_expectations" -> {
      val checks = Seq(
        "quantity_range" -> "l_quantity BETWEEN 1 AND 50",
        "price_positive" -> "l_extendedprice > 0",
        "discount_bounds" -> "l_discount BETWEEN 0.00 AND 0.10",
        "shipdate_range" -> "l_shipdate BETWEEN TIMESTAMP '1995-01-01' AND TIMESTAMP '2001-12-31'",
        "returnflag_domain" -> "l_returnflag IN ('A', 'N', 'R')",
        "tax_under_5pct" -> "l_tax <= 0.05")
      checks.map { case (n, p) =>
        s"""SELECT '$n' AS check_name, count(*) AS n_rows,
           | CAST(sum(CASE WHEN coalesce($p, FALSE) THEN 0 ELSE 1 END) AS BIGINT) AS n_violations,
           | sum(CASE WHEN coalesce($p, FALSE) THEN 0 ELSE 1 END) = 0 AS passed
           |FROM lineitem""".stripMargin
      }.mkString("", "\nUNION ALL\n", "\nORDER BY check_name")
    },

    // EWMA twin (q50): list_reduce over the same (ts, event_id)-ordered
    // DECIMAL(18,6) values — DuckDB seeds the fold with the first
    // element, Spark's null-seeded when-branch does the same; every
    // subsequent step is the identical exact-decimal round-9 recurrence.
    "q50_ewma" ->
      """WITH e AS (SELECT user_id, epoch_us(ts) AS ts_us, event_id,
        |      CAST(CAST(value AS DECIMAL(18,6)) AS DECIMAL(28,9)) AS v FROM events),
        |g AS (SELECT user_id, list(v ORDER BY ts_us, event_id) AS vs
        |      FROM e GROUP BY user_id)
        |SELECT user_id, CAST(len(vs) AS BIGINT) AS n,
        | CAST(list_reduce(vs, (acc, x) ->
        |   CAST(round(0.25 * x + 0.75 * acc, 9) AS DECIMAL(28,9))) AS DOUBLE) AS ewma
        |FROM g ORDER BY user_id""".stripMargin,

    // Retention twin (q51): same exact-integer day buckets and the same
    // one-double-division ratio.
    "q51_retention" ->
      """WITH e AS (SELECT user_id, epoch_us(ts) // 86400000000 AS day FROM events),
        |f AS (SELECT user_id, min(day) AS cohort_day FROM e GROUP BY user_id),
        |sz AS (SELECT cohort_day, count(*) AS cohort_size FROM f GROUP BY cohort_day),
        |r AS (SELECT cohort_day, day - cohort_day AS day_offset,
        |      count(DISTINCT e.user_id) AS n_users
        |      FROM e JOIN f USING (user_id) GROUP BY cohort_day, day_offset)
        |SELECT cohort_day, day_offset, n_users, cohort_size,
        | round(CAST(n_users AS DOUBLE) / cohort_size, 6) AS retention
        |FROM r JOIN sz USING (cohort_day)
        |ORDER BY cohort_day, day_offset""".stripMargin,

    // DLQ twin (q55): validity via json_valid, the same synthesized
    // corruption, raw payload quarantined on the dlq route.
    "q55_dlq" ->
      """WITH p AS (SELECT event_id,
        |  CASE WHEN event_id % 7 = 0 THEN substring(props, 1, length(props) - 1)
        |       ELSE props END AS payload FROM events)
        |SELECT event_id,
        | CASE WHEN json_valid(payload) THEN 'ok' ELSE 'dlq' END AS route,
        | CASE WHEN json_valid(payload)
        |   THEN CAST(json_extract_string(payload, '$.k') AS INTEGER) END AS k,
        | CASE WHEN NOT json_valid(payload) THEN payload END AS quarantined
        |FROM p ORDER BY event_id""".stripMargin,

    // Decile twin (q71): quantile_cont list boundaries, same fold.
    "q71_decile_bins" ->
      """WITH bs AS (SELECT quantile_cont(l_extendedprice,
        |    [0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9]) AS bs FROM lineitem),
        |a AS (SELECT CAST(len(list_filter(bs, b -> l_extendedprice >= b)) AS BIGINT) AS bin,
        |    l_extendedprice AS v
        |  FROM lineitem CROSS JOIN bs)
        |SELECT bin, count(*) AS n, min(v) AS min_v, max(v) AS max_v
        |FROM a GROUP BY bin ORDER BY bin""".stripMargin,

    // TF-IDF-cosine twin (d27): same weights, same term-ordered folds,
    // same gate.
    "d27_tfidf_cosine" -> (
      s"""WITH tok AS (SELECT doc_id, $tokensSqlExpr AS ws FROM documents),
         |tf AS (SELECT doc_id, t AS term, CAST(count(*) AS BIGINT) AS tf FROM
         |  (SELECT doc_id, unnest(ws) AS t FROM tok) GROUP BY doc_id, t),
         |dfa AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY term),
         |nn AS (SELECT CAST(count(*) AS BIGINT) AS n_docs FROM documents),
         |dfr AS (SELECT term, df FROM dfa CROSS JOIN nn WHERE df * 5 <= n_docs * 2),
         |w AS (SELECT doc_id, term,
         |    round(CAST(tf AS DOUBLE) * (ln((1.0 + CAST(n_docs AS DOUBLE))
         |      / (1.0 + CAST(df AS DOUBLE))) + 1.0), 9) AS w
         |  FROM tf JOIN dfr USING (term) CROSS JOIN nn),
         |norms AS (SELECT doc_id,
         |    sqrt(list_reduce(list_prepend(0.0, list_transform(
         |      list(struct_pack(term := term, w := w) ORDER BY term, w),
         |      x -> x.w * x.w)), (a, b) -> a + b)) AS norm
         |  FROM w GROUP BY doc_id),
         |dots AS (SELECT a.doc_id AS a_id, b.doc_id AS b_id,
         |    list_reduce(list_prepend(0.0, list_transform(
         |      list(struct_pack(term := a.term, p := a.w * b.w) ORDER BY a.term, a.w * b.w),
         |      x -> x.p)), (x, y) -> x + y) AS dot
         |  FROM w a JOIN w b ON a.term = b.term AND a.doc_id < b.doc_id
         |  WHERE a.doc_id < 30 GROUP BY a.doc_id, b.doc_id)
         |SELECT a_id, b_id, cosine FROM (
         |  SELECT a_id, b_id,
         |    round(dot / (na.norm * nb.norm), 6) AS cosine
         |  FROM dots JOIN norms na ON na.doc_id = a_id
         |  JOIN norms nb ON nb.doc_id = b_id)
         |WHERE cosine >= 0.5 ORDER BY a_id, b_id""".stripMargin),

    // Benford twin (q70): same digit extraction, same expectation chain,
    // same digit-ordered fold.
    "q70_benford" ->
      """WITH d AS (SELECT CAST(substring(CAST(CAST(floor(l_extendedprice) AS BIGINT) AS VARCHAR), 1, 1) AS INTEGER) AS d
        |  FROM lineitem),
        |o AS (SELECT d, CAST(count(*) AS BIGINT) AS o FROM d
        |  WHERE d BETWEEN 1 AND 9 GROUP BY d),
        |nn AS (SELECT CAST(sum(o) AS BIGINT) AS n FROM o),
        |terms AS (SELECT d, o,
        |    round((CAST(o AS DOUBLE) - CAST(n AS DOUBLE) * log10(1.0 + 1.0 / CAST(d AS DOUBLE)))
        |      * (CAST(o AS DOUBLE) - CAST(n AS DOUBLE) * log10(1.0 + 1.0 / CAST(d AS DOUBLE)))
        |      / (CAST(n AS DOUBLE) * log10(1.0 + 1.0 / CAST(d AS DOUBLE))), 9) AS term
        |  FROM o CROSS JOIN nn),
        |f AS (SELECT CAST(sum(o) AS BIGINT) AS n_values,
        |    round(list_reduce(list_prepend(0.0, list_transform(
        |      list(struct_pack(d := d, term := term) ORDER BY d), x -> x.term)),
        |      (a, b) -> a + b), 9) AS chi2
        |  FROM terms)
        |SELECT n_values, chi2, chi2 <= 15.507 AS is_benford FROM f""".stripMargin,

    // Entropy twin (t24): same frequency-level collapse, same ordered
    // fold, same single divisions.
    "t24_entropy" -> (
      s"""WITH tok AS (SELECT lang, $tokensSqlExpr AS ws FROM documents),
         |tf AS (SELECT lang, t AS term, CAST(count(*) AS BIGINT) AS f FROM
         |  (SELECT lang, unnest(ws) AS t FROM tok) GROUP BY lang, t),
         |bf AS (SELECT lang, f, CAST(count(*) AS BIGINT) AS n_terms
         |  FROM tf GROUP BY lang, f),
         |tot AS (SELECT lang, CAST(sum(f) AS BIGINT) AS n_tokens,
         |  CAST(count(*) AS BIGINT) AS n_types FROM tf GROUP BY lang)
         |SELECT lang, n_tokens, n_types,
         |  round(CAST(n_types AS DOUBLE) / CAST(n_tokens AS DOUBLE), 9) AS ttr,
         |  round(list_reduce(list_prepend(0.0, list_transform(
         |    list(struct_pack(f := f, n_terms := n_terms) ORDER BY f, n_terms),
         |    e -> -(CAST(e.n_terms AS DOUBLE)
         |      * (CAST(e.f AS DOUBLE) / CAST(n_tokens AS DOUBLE))
         |      * ln(CAST(e.f AS DOUBLE) / CAST(n_tokens AS DOUBLE))))),
         |    (a, b) -> a + b), 9) AS entropy
         |FROM bf JOIN tot USING (lang)
         |GROUP BY lang, n_tokens, n_types ORDER BY lang""".stripMargin),

    // Chi-square twin (q69): the same margins, the same per-cell chain
    // in the same op order, the same (cat, side)-ordered fold — and the
    // same DENSIFIED table (observed=0 cells contribute their expected
    // count, so a category vanishing from one side registers).
    "q69_chi2_drift" ->
      """WITH e AS (SELECT event_type AS cat,
        |    CASE WHEN epoch_us(ts) < 1705363200000000 THEN 1 ELSE 2 END AS side
        |  FROM events),
        |obs AS (SELECT cat, side, CAST(count(*) AS BIGINT) AS o
        |  FROM e GROUP BY cat, side),
        |cells AS (SELECT g.cat, g.side, coalesce(o, 0) AS o
        |  FROM ((SELECT DISTINCT cat FROM obs) CROSS JOIN
        |        (SELECT DISTINCT side FROM obs)) g
        |  LEFT JOIN obs ON g.cat = obs.cat AND g.side = obs.side),
        |ct AS (SELECT cat, CAST(sum(o) AS BIGINT) AS ct FROM cells GROUP BY cat),
        |st AS (SELECT side, CAST(sum(o) AS BIGINT) AS st FROM cells GROUP BY side),
        |nn AS (SELECT CAST(sum(o) AS BIGINT) AS n FROM cells),
        |terms AS (SELECT cat, side,
        |    round((CAST(o AS DOUBLE) - CAST(ct AS DOUBLE) * CAST(st AS DOUBLE) / CAST(n AS DOUBLE))
        |      * (CAST(o AS DOUBLE) - CAST(ct AS DOUBLE) * CAST(st AS DOUBLE) / CAST(n AS DOUBLE))
        |      / (CAST(ct AS DOUBLE) * CAST(st AS DOUBLE) / CAST(n AS DOUBLE)), 9) AS term
        |  FROM cells JOIN ct USING (cat) JOIN st USING (side) CROSS JOIN nn),
        |f AS (SELECT CAST(count(*) AS BIGINT) AS n_cells,
        |    round(list_reduce(list_prepend(0.0, list_transform(
        |      list(struct_pack(cat := cat, side := side, term := term) ORDER BY cat, side),
        |      x -> x.term)), (a, b) -> a + b), 9) AS chi2
        |  FROM terms)
        |SELECT n_cells, chi2, chi2 > 9.488 AS is_drift FROM f""".stripMargin,

    // Stemming twin (t23): the same rule chain in the same order.
    "t23_stemming" -> (
      s"""WITH tok AS (SELECT $tokensSqlExpr AS ws FROM documents),
         |raw AS (SELECT unnest(ws) AS raw FROM tok),
         |st AS (SELECT raw,
         |  regexp_replace(regexp_replace(regexp_replace(regexp_replace(regexp_replace(
         |    raw, 'sses$$', 'ss'), 'ies$$', 'i'), '([^s])s$$', '\\1'),
         |    '^(.{3,})ing$$', '\\1'), '^(.{3,})ed$$', '\\1') AS stem
         |  FROM raw)
         |SELECT stem, count(*) AS n_tokens,
         |  CAST(count(DISTINCT raw) AS BIGINT) AS n_variants,
         |  min(raw) AS first_variant
         |FROM st GROUP BY stem
         |ORDER BY n_tokens DESC, stem LIMIT 30""".stripMargin),

    // LSH-eval twin (d26): the d11 pair chain and the exact-Jaccard
    // chain REUSE the same shingle CTE `g`, then the set compare.
    "d26_lsh_eval" -> (
      s"""WITH ${portableMinhashCtes(64)},
         |${portableLshPairCtes(64, 16, 0.4)},
         |ex AS (SELECT doc_id, len(sh) AS sz, unnest(sh) AS shingle FROM g),
         |inter AS (SELECT a.doc_id AS a_id, b.doc_id AS b_id,
         |    a.sz AS a_size, b.sz AS b_size, count(*) AS n_inter
         |  FROM ex a JOIN ex b USING (shingle)
         |  WHERE a.doc_id < b.doc_id GROUP BY 1, 2, 3, 4),
         |truth AS (SELECT a_id, b_id FROM (
         |    SELECT a_id, b_id,
         |      CAST(n_inter AS DOUBLE) / (a_size + b_size - n_inter) AS j
         |    FROM inter) WHERE j >= 0.4),
         |u AS (SELECT
         |    CASE WHEN p.a_id IS NOT NULL THEN 1 ELSE 0 END AS e,
         |    CASE WHEN t.a_id IS NOT NULL THEN 1 ELSE 0 END AS t
         |  FROM (SELECT a_id, b_id FROM pairs) p
         |  FULL OUTER JOIN truth t ON p.a_id = t.a_id AND p.b_id = t.b_id),
         |agg AS (SELECT CAST(sum(t) AS BIGINT) AS n_true,
         |    CAST(sum(e) AS BIGINT) AS n_est,
         |    CAST(sum(e * t) AS BIGINT) AS tp FROM u)
         |SELECT n_true, n_est, tp,
         |  CAST(tp AS DOUBLE) / CAST(n_est AS DOUBLE) AS precision,
         |  CAST(tp AS DOUBLE) / CAST(n_true AS DOUBLE) AS recall
         |FROM agg""".stripMargin),

    // Multi-probe twin (s11): same 4-table planes, candidates = exact
    // bucket hit OR Hamming-1 (xor a power of two), same re-rank.
    "s11_multiprobe_lsh" ->
      s"""WITH planes(tbl, pl, w) AS (VALUES ${lshPlanesValues(4, 4, 64, 42L)}),
         |v AS (SELECT vec_id, embedding::DOUBLE[] AS ev FROM embeddings),
         |bk AS (SELECT vec_id, tbl,
         |  SUM(CASE WHEN list_dot_product(ev, w) >= 0 THEN 1::BIGINT << pl ELSE 0 END)::BIGINT AS bucket
         |  FROM v CROSS JOIN planes GROUP BY vec_id, tbl),
         |cand AS (SELECT DISTINCT p.vec_id AS probe_id, c.vec_id AS neighbor_id
         |  FROM bk p JOIN bk c ON p.tbl = c.tbl AND p.vec_id <> c.vec_id
         |    AND (p.bucket = c.bucket OR xor(p.bucket, c.bucket) IN (1, 2, 4, 8))
         |  WHERE p.vec_id < 10),
         |${annRankSql(5)}""".stripMargin,

    // Diff twin (q68): the same derived snapshot and classification.
    "q68_table_diff" ->
      """WITH a AS (SELECT o_orderkey AS k, o_totalprice AS v FROM orders),
        |b AS (
        |  SELECT k, CASE WHEN k % 7 = 0 THEN v + 1.23 ELSE v END AS v
        |  FROM a WHERE k % 13 <> 0
        |  UNION ALL
        |  SELECT -k, v + 0.5 FROM a WHERE k % 11 = 0),
        |d AS (SELECT coalesce(a.k, b.k) AS k,
        |    CASE WHEN b.k IS NULL THEN 'removed'
        |         WHEN a.k IS NULL THEN 'added'
        |         WHEN a.v <> b.v THEN 'changed'
        |         ELSE 'unchanged' END AS class,
        |    coalesce(b.v, a.v) AS v
        |  FROM a FULL OUTER JOIN b ON a.k = b.k)
        |SELECT class, count(*) AS n,
        |  CAST(sum(CAST(v AS DECIMAL(18,2))) AS DOUBLE) AS total_v
        |FROM d GROUP BY class ORDER BY class""".stripMargin,

    // Incr-join twin (q67): the single-pass full join — the delta
    // union's exactness IS what's being checked.
    "q67_incr_join" ->
      """SELECT o_orderstatus, count(*) AS n,
        | CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
        |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,

    // BM25+RRF twin (t22): same inverted-index scoring, same term-
    // ordered fold, same pool-ranked fusion.
    "t22_bm25_rrf" -> (
      s"""WITH tok AS (SELECT doc_id, text, $tokensSqlExpr AS ws FROM documents),
         |lens AS (SELECT doc_id, CAST(len(ws) AS BIGINT) AS len FROM tok),
         |tf AS (SELECT doc_id, t AS term, CAST(count(*) AS BIGINT) AS tf FROM
         |  (SELECT doc_id, unnest(ws) AS t FROM tok) GROUP BY doc_id, t),
         |dfr AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY term),
         |st AS (SELECT CAST(count(*) AS BIGINT) AS n_docs,
         |    CAST(sum(len) AS DOUBLE) / count(*) AS avgdl FROM lens),
         |qt AS (SELECT doc_id AS query_id, unnest(list_distinct(ws[1:4])) AS term
         |  FROM tok WHERE doc_id IN (0, 7, 14)),
         |contrib AS (SELECT query_id, tf.doc_id, qt.term,
         |    round(ln(1.0 + (CAST(n_docs AS DOUBLE) - CAST(df AS DOUBLE) + 0.5)
         |        / (CAST(df AS DOUBLE) + 0.5)) *
         |      (CAST(tf AS DOUBLE) * (1.2 + 1.0)) /
         |      (CAST(tf AS DOUBLE) + 1.2 * ((1.0 - 0.75)
         |        + 0.75 * CAST(len AS DOUBLE) / avgdl)),
         |      9) AS c
         |  FROM qt JOIN tf USING (term) JOIN dfr USING (term)
         |  JOIN lens ON lens.doc_id = tf.doc_id CROSS JOIN st),
         |bm AS (SELECT query_id, doc_id,
         |    round(list_reduce(list_prepend(0.0,
         |      list_transform(list(struct_pack(term := term, c := c) ORDER BY term, c),
         |        e -> e.c)), (a, x) -> a + x), 6) AS bm25
         |  FROM contrib GROUP BY query_id, doc_id),
         |top AS (SELECT query_id, doc_id, bm25,
         |    CAST(row_number() OVER (PARTITION BY query_id
         |      ORDER BY bm25 DESC, doc_id) AS BIGINT) AS r_bm25
         |  FROM bm QUALIFY r_bm25 <= 10),
         |fq AS (SELECT t2.doc_id,
         |    0.4 * least(CAST(length(text) AS DOUBLE) / 500.0, 1.0)
         |    + 0.4 * (CASE WHEN len(ws) = 0 THEN 0.0
         |        ELSE CAST(len(list_filter(ws, x -> list_contains(
         |          ['the','a','of','and','to','in','is'], x))) AS DOUBLE) / len(ws) END)
         |    + 0.2 * (1.0 - (CASE WHEN length(text) = 0 THEN 0.0
         |        ELSE CAST(length(text) - length(regexp_replace(text,
         |          '[!-/:-@\\[-`{-~]', '', 'g')) AS DOUBLE) / length(text) END)) AS quality
         |  FROM tok t2),
         |pool AS (SELECT top.query_id, top.doc_id, top.bm25, top.r_bm25,
         |    CAST(row_number() OVER (PARTITION BY top.query_id
         |      ORDER BY fq.quality DESC, top.doc_id) AS BIGINT) AS r_q
         |  FROM top JOIN fq ON fq.doc_id = top.doc_id)
         |SELECT query_id, fused_rank, doc_id, bm25, r_bm25, r_q, rrf FROM (
         |  SELECT query_id, doc_id, bm25, r_bm25, r_q,
         |    round(1.0 / (60.0 + r_bm25) + 1.0 / (60.0 + r_q), 9) AS rrf,
         |    CAST(row_number() OVER (PARTITION BY query_id
         |      ORDER BY round(1.0 / (60.0 + r_bm25) + 1.0 / (60.0 + r_q), 9) DESC,
         |        doc_id) AS BIGINT) AS fused_rank
         |  FROM pool)
         |ORDER BY query_id, fused_rank""".stripMargin),

    // Degree-dist twin (g04): same canonical degrees, same degree-level
    // ln fold in degree order.
    "g04_degree_dist" ->
      """WITH docs AS (SELECT doc_id FROM documents),
        |nn AS (SELECT count(*) AS n FROM docs),
        |de AS (
        |  SELECT doc_id AS src, (doc_id * 7 + 13) % (SELECT n FROM nn) AS dst FROM docs
        |  UNION ALL
        |  SELECT doc_id, (doc_id * 31 + 7) % (SELECT n FROM nn) FROM docs),
        |ue AS (SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
        |  FROM de WHERE src <> dst),
        |deg AS (SELECT v, count(*) AS d FROM
        |  (SELECT a AS v FROM ue UNION ALL SELECT b FROM ue) GROUP BY v),
        |hist AS (SELECT d, CAST(count(*) AS BIGINT) AS n_vertices FROM deg GROUP BY d),
        |s AS (SELECT CAST(sum(n_vertices) AS BIGINT) AS nv, min(d) AS dmin,
        |    list(struct_pack(d := d, n_vertices := n_vertices) ORDER BY d) AS h
        |  FROM hist),
        |m AS (SELECT nv,
        |    list_reduce(list_prepend(0.0, list_transform(h, e ->
        |      CAST(e.n_vertices AS DOUBLE) * ln(CAST(e.d AS DOUBLE) / CAST(dmin AS DOUBLE)))),
        |      (acc, x) -> acc + x) AS slnd
        |  FROM s)
        |SELECT d AS degree, n_vertices, nv,
        |  CASE WHEN slnd > 0.0 THEN round(1.0 + CAST(nv AS DOUBLE) / slnd, 9) END AS alpha
        |FROM hist CROSS JOIN m ORDER BY degree""".stripMargin,

    // CUSUM twin (q66): the same prefix identity — running sum +
    // running min windows, exact decimal throughout. least() is OFF
    // LIMITS on decimals here: DuckDB's least(DECIMAL, DECIMAL) returns
    // DOUBLE (measured) — the clamp is a CASE instead.
    "q66_cusum" ->
      """WITH e AS (SELECT user_id, epoch_us(ts) AS us, event_id,
        |    CAST(CAST(value AS DECIMAL(18,6)) AS DECIMAL(28,9)) - 105 AS d FROM events),
        |w AS (SELECT user_id, us, event_id, d,
        |    CAST(sum(d) OVER (PARTITION BY user_id ORDER BY us, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DECIMAL(28,9)) AS p FROM e),
        |w2 AS (SELECT user_id, d, p,
        |    p - (CASE WHEN mp < 0 THEN mp ELSE CAST(0 AS DECIMAL(28,9)) END) AS s
        |  FROM (SELECT user_id, d, p,
        |    CAST(min(p) OVER (PARTITION BY user_id ORDER BY us, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DECIMAL(28,9)) AS mp
        |    FROM w))
        |SELECT user_id, count(*) AS n, max(s) > 500 AS alarm,
        |  CAST(max(s) AS DOUBLE) AS cusum_max,
        |  CAST(CAST(sum(d) AS DECIMAL(28,9)) - (CASE WHEN min(p) < 0
        |    THEN CAST(min(p) AS DECIMAL(28,9)) ELSE CAST(0 AS DECIMAL(28,9)) END)
        |    AS DOUBLE) AS cusum_final
        |FROM w2 GROUP BY user_id ORDER BY user_id""".stripMargin,

    // Zipf twin (t21): same top-100, same rank-ordered folds, same
    // closed-form slope from the same folded doubles.
    "t21_zipf" -> (
      s"""WITH tok AS (SELECT $tokensSqlExpr AS ws FROM documents),
         |tf AS (SELECT t AS term, count(*) AS freq FROM
         |  (SELECT unnest(ws) AS t FROM tok) GROUP BY t),
         |top AS (SELECT term, freq FROM tf ORDER BY freq DESC, term LIMIT 100),
         |a AS (SELECT list(struct_pack(nf := -freq, term := term, freq := freq)
         |    ORDER BY -freq, term) AS arr FROM top),
         |ps AS (SELECT len(arr) AS n_terms,
         |    list_transform(arr, e -> ln(CAST(e.freq AS DOUBLE))) AS ys,
         |    list_transform(range(1, len(arr) + 1), i -> ln(CAST(i AS DOUBLE))) AS xs
         |  FROM a),
         |s AS (SELECT CAST(n_terms AS BIGINT) AS n_terms,
         |    list_reduce(list_prepend(0.0, xs), (acc, x) -> acc + x) AS sx,
         |    list_reduce(list_prepend(0.0, ys), (acc, y) -> acc + y) AS sy,
         |    list_reduce(list_prepend(0.0,
         |      list_transform(range(1, CAST(n_terms AS INTEGER) + 1),
         |        i -> xs[i] * ys[i])), (acc, p) -> acc + p) AS sxy,
         |    list_reduce(list_prepend(0.0, list_transform(xs, x -> x * x)),
         |      (acc, p) -> acc + p) AS sxx
         |  FROM ps)
         |SELECT n_terms, round((n_terms * sxy - sx * sy)
         |  / (n_terms * sxx - sx * sx), 9) AS slope FROM s""".stripMargin),

    // CEP twin (q65): the same following-frame windows and predicate.
    "q65_cep_pattern" ->
      """WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS us, event_id
        |  FROM events),
        |f AS (SELECT user_id, event_type, us,
        |    min(CASE WHEN event_type = 'purchase' THEN us END) OVER
        |      (PARTITION BY user_id ORDER BY us, event_id
        |       ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS next_purchase,
        |    min(CASE WHEN event_type = 'error' THEN us END) OVER
        |      (PARTITION BY user_id ORDER BY us, event_id
        |       ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS next_error
        |  FROM e),
        |v AS (SELECT user_id,
        |    next_purchase IS NOT NULL AND next_purchase - us <= 3600000000
        |      AND (next_error IS NULL OR next_error > next_purchase) AS matched
        |  FROM f WHERE event_type = 'view')
        |SELECT user_id, count(*) AS n_views,
        |  CAST(sum(CASE WHEN matched THEN 1 ELSE 0 END) AS BIGINT) AS n_matched
        |FROM v GROUP BY user_id ORDER BY user_id""".stripMargin,

    // Kneser–Ney twin (t20): same counts, same probability chain in the
    // same op order, same position-ordered fold.
    "t20_kneser_ney" -> (
      s"""WITH tok AS (SELECT doc_id, $tokensSqlExpr AS ws FROM documents),
         |bg AS (SELECT doc_id, i AS pos, ws[i+1] AS prev, ws[i+2] AS cur
         |  FROM tok, UNNEST(range(len(ws) - 1)) AS u(i) WHERE len(ws) >= 2),
         |c2 AS (SELECT prev, cur, CAST(count(*) AS BIGINT) AS c2 FROM bg GROUP BY prev, cur),
         |c1 AS (SELECT prev, CAST(count(*) AS BIGINT) AS c1 FROM bg GROUP BY prev),
         |nf AS (SELECT prev, CAST(count(*) AS BIGINT) AS nf FROM c2 GROUP BY prev),
         |np AS (SELECT cur, CAST(count(*) AS BIGINT) AS np FROM c2 GROUP BY cur),
         |tt AS (SELECT CAST(count(*) AS DOUBLE) AS tt FROM c2),
         |lp AS (SELECT doc_id, pos,
         |  round(ln(
         |    greatest(CAST(c2 AS DOUBLE) - 0.75, 0.0) / CAST(c1 AS DOUBLE) +
         |    0.75 * CAST(nf AS DOUBLE) / CAST(c1 AS DOUBLE) *
         |      (CAST(np AS DOUBLE) / tt)), 9) AS lp
         |  FROM bg JOIN c2 USING (prev, cur) JOIN c1 USING (prev)
         |  JOIN nf USING (prev) JOIN np USING (cur) CROSS JOIN tt),
         |agg AS (SELECT doc_id, list_reduce(list(lp ORDER BY pos), (a, b) -> a + b) AS s,
         |  count(*) AS n FROM lp GROUP BY doc_id)
         |SELECT d.doc_id, CAST(coalesce(agg.n, 0) AS BIGINT) AS n_bigrams,
         | round(agg.s / agg.n, 6) AS kn_avg
         |FROM documents d LEFT JOIN agg USING (doc_id) ORDER BY doc_id""".stripMargin),

    // Cross-doc-lines twin (d25): same synthesized lines, same
    // fingerprint DF gate, same positional reassembly.
    "d25_cross_doc_lines" -> (
      s"""WITH tok AS (SELECT doc_id, $tokensSqlExpr AS ws FROM documents),
         |m AS (SELECT doc_id, 'accept all cookies to continue' || chr(10) ||
         |  array_to_string(ws[1:6], ' ') || chr(10) ||
         |  array_to_string(ws[7:12], ' ') || chr(10) ||
         |  '(c) example corp all rights reserved' AS mtext FROM tok),
         |ls AS (SELECT doc_id, string_split(mtext, chr(10)) AS lines FROM m),
         |ex AS (SELECT doc_id, unnest(lines) AS line,
         |    unnest(range(1, len(lines) + 1)) AS pos FROM ls),
         |nb AS (SELECT doc_id, pos, line,
         |    md5(regexp_replace(trim(lower(line)), '\\s+', ' ', 'g')) AS fp
         |  FROM ex WHERE trim(line) <> ''),
         |boiler AS (SELECT fp FROM nb GROUP BY fp
         |  HAVING count(DISTINCT doc_id) >= 3),
         |kept AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_kept,
         |    array_to_string(list(line ORDER BY pos), chr(10)) AS clean_text
         |  FROM nb ANTI JOIN boiler USING (fp) GROUP BY doc_id),
         |tot AS (SELECT doc_id,
         |    CAST(len(list_filter(string_split(mtext, chr(10)),
         |      l -> trim(l) <> '')) AS BIGINT) AS n_lines FROM m)
         |SELECT doc_id, n_lines, coalesce(n_kept, 0) AS n_kept,
         |  coalesce(clean_text, '') AS clean_text
         |FROM tot LEFT JOIN kept USING (doc_id) ORDER BY doc_id""".stripMargin),

    // Sliding-distinct twin (q64): the same bounded 7-day fan-out and
    // exact distinct counts, clamped to the observed day range (no
    // phantom windows ending past the last observed day).
    "q64_sliding_distinct" ->
      """WITH obs AS (SELECT DISTINCT user_id,
        |    epoch_us(ts) // 86400000000 AS day FROM events),
        |wau AS (SELECT wday, CAST(count(DISTINCT user_id) AS BIGINT) AS wau
        |  FROM (SELECT user_id, unnest(generate_series(day, day + 6)) AS wday
        |        FROM obs)
        |  GROUP BY wday),
        |dau AS (SELECT day, CAST(count(DISTINCT user_id) AS BIGINT) AS dau
        |  FROM obs GROUP BY day)
        |SELECT wday AS day, coalesce(dau, 0) AS dau, wau
        |FROM wau LEFT JOIN dau ON wday = dau.day
        |WHERE wday <= (SELECT max(day) FROM obs)
        |ORDER BY wau.wday""".stripMargin,

    // LangID-eval twin (t19): t01's langid CTE, the same confusion
    // counts and the same P/R→F1 float chain.
    "t19_langid_eval" -> (
      s"""WITH tok AS (SELECT doc_id, lang, $tokensSqlExpr AS ws FROM documents),
         |sc AS (SELECT doc_id, lang,
         | len(list_filter(ws, x -> list_contains(['the','a','of','and','to','in','is'], x))) AS s_en,
         | len(list_filter(ws, x -> list_contains(['el','la','de','y','que','en','un'], x))) AS s_es,
         | len(list_filter(ws, x -> list_contains(['der','die','das','und','zu','ein','ist'], x))) AS s_de,
         | len(list_filter(ws, x -> list_contains(['le','la','de','et','que','un','est'], x))) AS s_fr
         |FROM tok),
         |pr AS (SELECT lang AS label, CASE WHEN greatest(s_en, s_es, s_de, s_fr) = 0 THEN 'und'
         | WHEN s_en = greatest(s_en, s_es, s_de, s_fr) THEN 'en'
         | WHEN s_es = greatest(s_en, s_es, s_de, s_fr) THEN 'es'
         | WHEN s_de = greatest(s_en, s_es, s_de, s_fr) THEN 'de'
         | ELSE 'fr' END AS pred FROM sc),
         |conf AS (SELECT label, pred, count(*) AS n FROM pr GROUP BY label, pred),
         |lt AS (SELECT label, CAST(sum(n) AS BIGINT) AS n_label FROM conf GROUP BY label),
         |pt AS (SELECT pred AS label, CAST(sum(n) AS BIGINT) AS n_pred FROM conf GROUP BY pred),
         |tp AS (SELECT label, CAST(n AS BIGINT) AS tp FROM conf WHERE label = pred),
         |u AS (SELECT coalesce(lt.label, pt.label) AS label,
         |    coalesce(n_label, 0) AS n_label, coalesce(n_pred, 0) AS n_pred
         |  FROM lt FULL OUTER JOIN pt ON lt.label = pt.label),
         |b AS (SELECT u.label, n_label, n_pred, coalesce(tp, 0) AS tp
         |  FROM u LEFT JOIN tp USING (label)),
         |m AS (SELECT label, n_label, n_pred, tp,
         |    CASE WHEN n_pred > 0 THEN CAST(tp AS DOUBLE) / CAST(n_pred AS DOUBLE) END AS precision,
         |    CASE WHEN n_label > 0 THEN CAST(tp AS DOUBLE) / CAST(n_label AS DOUBLE) END AS recall
         |  FROM b)
         |SELECT label, n_label, n_pred, tp, precision, recall,
         |  CASE WHEN coalesce(precision, 0.0) + coalesce(recall, 0.0) > 0.0
         |    THEN 2.0 * precision * recall / (precision + recall) END AS f1
         |FROM m ORDER BY label""".stripMargin),

    // Transition twin (q63): the same user-partitioned lead() and the
    // same one-division conditional probability.
    "q63_transitions" ->
      """WITH e AS (SELECT user_id, event_id, event_type, epoch_us(ts) AS ts_us FROM events),
        |nx AS (SELECT event_type AS from_type,
        |    lead(event_type) OVER (PARTITION BY user_id
        |      ORDER BY ts_us, event_id) AS to_type FROM e),
        |pairs AS (SELECT from_type, to_type, count(*) AS n FROM nx
        |  WHERE to_type IS NOT NULL GROUP BY from_type, to_type),
        |tot AS (SELECT from_type, CAST(sum(n) AS BIGINT) AS n_from
        |  FROM pairs GROUP BY from_type)
        |SELECT from_type, to_type, CAST(n AS BIGINT) AS n, n_from,
        |  CAST(n AS DOUBLE) / CAST(n_from AS DOUBLE) AS p
        |FROM pairs JOIN tot USING (from_type)
        |ORDER BY from_type, to_type""".stripMargin,

    // AUC twin (q62): the same per-score counts and doubled-U fold over
    // the shared quality CTEs.
    "q62_auc" -> (
      s"""${qualityScoreCtes("WITH d AS (SELECT doc_id, lang, text FROM documents)")},
         |c AS (SELECT quality AS s,
         |    CAST(sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT) AS pos,
         |    CAST(sum(CASE WHEN lang = 'en' THEN 0 ELSE 1 END) AS BIGINT) AS neg
         |  FROM q GROUP BY quality),
         |cum AS (SELECT s, pos, neg,
         |    sum(neg) OVER (ORDER BY s ROWS BETWEEN UNBOUNDED PRECEDING
         |      AND CURRENT ROW) - neg AS neg_below FROM c),
         |agg AS (SELECT CAST(sum(pos) AS BIGINT) AS n_pos,
         |    CAST(sum(neg) AS BIGINT) AS n_neg,
         |    CAST(sum(pos * (2 * neg_below + neg)) AS BIGINT) AS u2 FROM cum)
         |SELECT n_pos, n_neg, u2,
         |  CAST(u2 AS DOUBLE) / CAST(2 * n_pos * n_neg AS DOUBLE) AS auc
         |FROM agg""".stripMargin),

    // aHash twin (m06): body bytes via one hex pass (DuckDB lacks blob
    // substring — same bytes, the Spark side reads them from the payload
    // at the body offset), identical integer folds; the OR-join is the
    // same candidate set as the banded union at oracle scale.
    "m06_ahash_neardup" ->
      """WITH img AS (SELECT doc_id, hex(encode(text)) AS h
        |  FROM documents WHERE doc_id % 3 = 0),
        |bytes AS (SELECT doc_id, list_transform(range(1, 65),
        |    i -> CASE WHEN length(h) >= i * 2
        |      THEN CAST(('0x' || substring(h, CAST(i * 2 - 1 AS INTEGER), 2)) AS BIGINT)
        |      ELSE 0 END) AS bs
        |  FROM img),
        |sums AS (SELECT doc_id, bs, list_reduce(bs, (a, b) -> a + b) AS s FROM bytes),
        |bits AS (SELECT doc_id, list_transform(bs,
        |    b -> CASE WHEN b * 64 > s THEN 1 ELSE 0 END) AS bits FROM sums),
        |bands AS (SELECT doc_id,
        |    CAST(list_reduce(bits[1:16], (a, b) -> a * 2 + b) AS BIGINT) AS b0,
        |    CAST(list_reduce(bits[17:32], (a, b) -> a * 2 + b) AS BIGINT) AS b1,
        |    CAST(list_reduce(bits[33:48], (a, b) -> a * 2 + b) AS BIGINT) AS b2,
        |    CAST(list_reduce(bits[49:64], (a, b) -> a * 2 + b) AS BIGINT) AS b3
        |  FROM bits),
        |cands AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |    a.b0 AS a0, a.b1 AS a1, a.b2 AS a2, a.b3 AS a3,
        |    b.b0 AS c0, b.b1 AS c1, b.b2 AS c2, b.b3 AS c3
        |  FROM bands a JOIN bands b ON a.doc_id < b.doc_id AND
        |    (a.b0 = b.b0 OR a.b1 = b.b1 OR a.b2 = b.b2 OR a.b3 = b.b3))
        |SELECT id_a, id_b,
        |  CAST(bit_count(xor(a0, c0)) + bit_count(xor(a1, c1)) +
        |       bit_count(xor(a2, c2)) + bit_count(xor(a3, c3)) AS BIGINT) AS hamming
        |FROM cands
        |WHERE bit_count(xor(a0, c0)) + bit_count(xor(a1, c1)) +
        |      bit_count(xor(a2, c2)) + bit_count(xor(a3, c3)) <= 6
        |ORDER BY id_a, id_b""".stripMargin,

    // Co-purchase twin (q61): the same prune → self-join → gate chain.
    "q61_copurchase" ->
      """WITH items AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
        |ntx AS (SELECT count(DISTINCT o) AS n_tx FROM items),
        |sup AS (SELECT p, count(*) AS s FROM items GROUP BY p),
        |pruned AS (SELECT o, items.p, s FROM items JOIN sup USING (p) WHERE s >= 8),
        |pairs AS (SELECT a.p AS p1, b.p AS p2, a.s AS s1, b.s AS s2,
        |    count(*) AS n_pairs
        |  FROM pruned a JOIN pruned b ON a.o = b.o AND a.p < b.p
        |  GROUP BY p1, p2, s1, s2 HAVING count(*) >= 2)
        |SELECT p1, p2, CAST(n_pairs AS BIGINT) AS n_pairs,
        |  CAST(s1 AS BIGINT) AS s1, CAST(s2 AS BIGINT) AS s2,
        |  CAST(n_pairs * n_tx AS DOUBLE) / CAST(s1 * s2 AS DOUBLE) AS lift
        |FROM pairs CROSS JOIN ntx
        |ORDER BY n_pairs DESC, p1, p2""".stripMargin,

    // SQ twin (s10): per-dim min/width lists, the same floor-encode /
    // bin-center-dequantize, the same left fold (0+e1 exact, the s07
    // precedent).
    "s10_sq_topk" ->
      """WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS ev FROM embeddings),
        |mm AS (SELECT j, min(ev[j]) AS lo, max(ev[j]) - min(ev[j]) AS w
        |  FROM v CROSS JOIN range(1, 65) r(j) GROUP BY j),
        |mml AS (SELECT list(lo ORDER BY j) AS los, list(w ORDER BY j) AS ws FROM mm),
        |codes AS (SELECT vec_id AS neighbor_id,
        |    list_transform(range(1, 65), j -> CASE WHEN ws[j] = 0 THEN 0.0
        |      ELSE least(floor((ev[j] - los[j]) / ws[j] * 256), 255.0) END) AS cq
        |  FROM v CROSS JOIN mml),
        |p AS (SELECT vec_id AS probe_id, ev AS pev FROM v WHERE vec_id < 10),
        |scored AS (SELECT probe_id, neighbor_id,
        |    round(list_reduce(list_transform(range(1, 65),
        |      j -> (pev[j] - (los[j] + (cq[j] + 0.5) * ws[j] / 256.0))
        |         * (pev[j] - (los[j] + (cq[j] + 0.5) * ws[j] / 256.0))),
        |      (a, b) -> a + b), 6) AS adc_d2
        |  FROM codes CROSS JOIN p CROSS JOIN mml WHERE probe_id <> neighbor_id),
        |r AS (SELECT probe_id, neighbor_id, adc_d2,
        |    CAST(row_number() OVER (PARTITION BY probe_id
        |      ORDER BY adc_d2 ASC, neighbor_id ASC) AS BIGINT) AS rank
        |  FROM scored)
        |SELECT probe_id, rank, neighbor_id, adc_d2 FROM r WHERE rank <= 5
        |ORDER BY probe_id, rank""".stripMargin,

    // KS twin (q60): the ECDF as one per-type window (types are small in
    // the oracle), identical integer counts and double divisions.
    "q60_ks_drift" ->
      """WITH e AS (SELECT event_type, value AS v,
        |    CASE WHEN epoch_us(ts) < 1705363200000000 THEN 1 ELSE 2 END AS s
        |  FROM events),
        |c AS (SELECT event_type, v,
        |    CAST(sum(CASE WHEN s = 1 THEN 1 ELSE 0 END) AS BIGINT) AS c1,
        |    CAST(sum(CASE WHEN s = 2 THEN 1 ELSE 0 END) AS BIGINT) AS c2
        |  FROM e GROUP BY event_type, v),
        |cum AS (SELECT event_type, v,
        |    sum(c1) OVER (PARTITION BY event_type ORDER BY v
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS c1c,
        |    sum(c2) OVER (PARTITION BY event_type ORDER BY v
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS c2c
        |  FROM c),
        |tot AS (SELECT event_type, CAST(sum(c1) AS BIGINT) AS n1,
        |    CAST(sum(c2) AS BIGINT) AS n2 FROM c GROUP BY event_type),
        |d AS (SELECT event_type, v,
        |    abs(CAST(c1c AS DOUBLE) / n1 - CAST(c2c AS DOUBLE) / n2) AS diff
        |  FROM cum JOIN tot USING (event_type) WHERE n1 > 0 AND n2 > 0),
        |mx AS (SELECT event_type, max(diff) AS ks_d FROM d GROUP BY event_type)
        |SELECT event_type, n1, n2, ks_d, min(v) AS d_at,
        |  ks_d > 1.358 * sqrt((CAST(n1 AS DOUBLE) + CAST(n2 AS DOUBLE))
        |    / (CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE))) AS is_drift
        |FROM d JOIN mx USING (event_type) JOIN tot USING (event_type)
        |WHERE diff = ks_d GROUP BY event_type, n1, n2, ks_d
        |ORDER BY event_type""".stripMargin,

    // Skyline twin (q59): the O(n log n) prefix-max identity as a single
    // window — dominance = predecessor (x asc, y desc) with y ≥ current.
    "q59_skyline" ->
      """WITH pts AS (SELECT DISTINCT l_extendedprice AS x, l_quantity AS y
        |  FROM lineitem WHERE l_extendedprice IS NOT NULL AND l_quantity IS NOT NULL),
        |w AS (SELECT x, y, max(y) OVER (ORDER BY x ASC, y DESC
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pm FROM pts)
        |SELECT x AS l_extendedprice, y AS l_quantity FROM w
        |WHERE pm IS NULL OR y > pm
        |ORDER BY l_extendedprice, l_quantity""".stripMargin,

    // Readability twin (t18): same tokenizer CTE, same vowel-group
    // syllable floor, same one-round formula.
    "t18_readability" -> (
      s"""WITH tok AS (SELECT doc_id, text, $tokensSqlExpr AS ws FROM documents),
         |c AS (SELECT doc_id, CAST(len(ws) AS BIGINT) AS n_words,
         |  greatest(CAST(1 AS BIGINT),
         |    CAST(len(regexp_extract_all(text, '[.!?]+')) AS BIGINT)) AS n_sentences,
         |  CAST(list_sum(list_transform(ws, w -> greatest(CAST(1 AS BIGINT),
         |    CAST(len(regexp_extract_all(w, '[aeiouy]+')) AS BIGINT)))) AS BIGINT) AS n_syllables
         |  FROM tok)
         |SELECT doc_id, n_words, n_sentences, n_syllables,
         | round(206.835 - 1.015 * (CAST(n_words AS DOUBLE) / n_sentences)
         |   - 84.6 * (CAST(n_syllables AS DOUBLE) / n_words), 6) AS flesch
         |FROM c WHERE n_words > 0 ORDER BY doc_id""".stripMargin),

    // Triangle twin (g03): same canonical undirected edges, same
    // (degree, id) orientation, same wedge + closure joins.
    "g03_triangles" ->
      """WITH docs AS (SELECT doc_id FROM documents),
        |nn AS (SELECT count(*) AS n FROM docs),
        |de AS (
        |  SELECT doc_id AS src, (doc_id + 1) % (SELECT n FROM nn) AS dst FROM docs
        |  UNION ALL
        |  SELECT doc_id, (doc_id + 2) % (SELECT n FROM nn) FROM docs
        |  UNION ALL
        |  SELECT doc_id, (doc_id * 7 + 13) % (SELECT n FROM nn) FROM docs),
        |ue AS (SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
        |  FROM de WHERE src <> dst),
        |deg AS (SELECT v, count(*) AS d FROM
        |  (SELECT a AS v FROM ue UNION ALL SELECT b FROM ue) GROUP BY v),
        |oe AS (
        |  SELECT CASE WHEN (da.d, ue.a) < (db.d, ue.b) THEN ue.a ELSE ue.b END AS u,
        |         CASE WHEN (da.d, ue.a) < (db.d, ue.b) THEN ue.b ELSE ue.a END AS w
        |  FROM ue JOIN deg da ON da.v = ue.a JOIN deg db ON db.v = ue.b),
        |tri AS (
        |  SELECT e1.u AS x, e1.w AS y, e2.w AS z
        |  FROM oe e1 JOIN oe e2 ON e1.u = e2.u AND e1.w < e2.w
        |  JOIN ue e3 ON e3.a = least(e1.w, e2.w) AND e3.b = greatest(e1.w, e2.w))
        |SELECT v AS doc_id, count(*) AS n_triangles FROM
        |  (SELECT x AS v FROM tri UNION ALL SELECT y FROM tri UNION ALL SELECT z FROM tri)
        |GROUP BY v ORDER BY doc_id""".stripMargin,

    // Entity-resolution twin (d24): the same corruption, the same two
    // blocking passes (UNION dedups the pair), the same levenshtein gate
    // and (dist, c_id)-minimal winner.
    "d24_entity_resolution" ->
      """WITH cust AS (SELECT c_custkey, c_name FROM customer),
        |dirty AS (SELECT c_custkey AS d_id,
        |  substring(c_name, 1, CAST(9 + pp AS INTEGER)) || 'X' ||
        |  substring(c_name, CAST(11 + pp AS INTEGER), CAST(8 - pp AS INTEGER)) AS d_name
        |  FROM (SELECT c_custkey, c_name,
        |    CAST(('0x' || substr(md5(CAST(c_custkey AS VARCHAR)), 1, 8)) AS UBIGINT) % 9 AS pp
        |    FROM cust)),
        |clean AS (SELECT c_custkey AS c_id, c_name FROM cust),
        |cands AS (
        |  SELECT d_id, d_name, c_id, c_name FROM dirty JOIN clean
        |    ON substring(d_name, 10, 1) || substring(d_name, 12, 1) ||
        |       substring(d_name, 14, 1) || substring(d_name, 16, 1) ||
        |       substring(d_name, 18, 1)
        |     = substring(c_name, 10, 1) || substring(c_name, 12, 1) ||
        |       substring(c_name, 14, 1) || substring(c_name, 16, 1) ||
        |       substring(c_name, 18, 1)
        |  UNION
        |  SELECT d_id, d_name, c_id, c_name FROM dirty JOIN clean
        |    ON substring(d_name, 11, 1) || substring(d_name, 13, 1) ||
        |       substring(d_name, 15, 1) || substring(d_name, 17, 1)
        |     = substring(c_name, 11, 1) || substring(c_name, 13, 1) ||
        |       substring(c_name, 15, 1) || substring(c_name, 17, 1)),
        |scored AS (SELECT d_id, c_id,
        |    CAST(levenshtein(d_name, c_name) AS BIGINT) AS dist
        |  FROM cands WHERE levenshtein(d_name, c_name) <= 1),
        |ranked AS (SELECT d_id, c_id, dist,
        |    row_number() OVER (PARTITION BY d_id ORDER BY dist, c_id) AS rn,
        |    count(*) OVER (PARTITION BY d_id) AS n_cands
        |  FROM scored)
        |SELECT d_id, c_id AS matched_id, dist, n_cands, c_id = d_id AS is_source
        |FROM ranked WHERE rn = 1 ORDER BY d_id""".stripMargin,

    // Gap-fill twin (q57): generate_series grid + IGNORE NULLS carry-
    // forward of the identical exact-decimal→double hourly sum.
    "q57_gapfill" ->
      """WITH obs AS (
        |  SELECT user_id, CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS h,
        |    CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS v
        |  FROM events WHERE user_id < 6 GROUP BY user_id, h),
        |span AS (SELECT user_id, min(h) AS lo, max(h) AS hi FROM obs GROUP BY user_id),
        |grid AS (SELECT user_id, unnest(generate_series(lo, hi, 3600)) AS h FROM span)
        |SELECT g.user_id, g.h,
        | last_value(o.v IGNORE NULLS) OVER (PARTITION BY g.user_id ORDER BY g.h
        |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS v_filled,
        | o.v IS NULL AS is_gap
        |FROM grid g LEFT JOIN obs o ON g.user_id = o.user_id AND g.h = o.h
        |ORDER BY g.user_id, g.h""".stripMargin,

    // Variant twin (q58): the same typed path extraction via JSON
    // operators; a missing path is NULL in both engines.
    "q58_variant" ->
      """WITH p AS (SELECT event_id,
        |  CAST(json_extract_string(props, '$.k') AS BIGINT) AS k,
        |  CAST(json_extract_string(props, '$.missing') AS BIGINT) AS absent
        |  FROM events)
        |SELECT k % 8 AS k_bucket, count(*) AS n,
        | CAST(sum(k) AS BIGINT) AS sum_k, min(k) AS min_k, max(k) AS max_k,
        | count(absent) AS n_absent
        |FROM p GROUP BY k_bucket ORDER BY k_bucket""".stripMargin,

    // Compaction twin (q54): same latest-wins window.
    "q54_compact" ->
      """WITH e AS (SELECT user_id, event_id, event_type, value,
        |  epoch_us(ts) AS ts_us FROM events),
        |r AS (SELECT *, row_number() OVER (PARTITION BY user_id
        |  ORDER BY ts_us DESC, event_id DESC) AS rn FROM e)
        |SELECT user_id, event_id, event_type, value, ts_us
        |FROM r WHERE rn = 1 ORDER BY user_id""".stripMargin,

    // Funnel twin (q49): the same stage-gated min chain.
    "q49_funnel" ->
      """WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS ts_us FROM events),
        |u AS (SELECT DISTINCT user_id FROM e),
        |v AS (SELECT user_id, min(ts_us) AS t_view FROM e
        |      WHERE event_type = 'view' GROUP BY user_id),
        |c AS (SELECT e.user_id, min(ts_us) AS t_click FROM e JOIN v USING (user_id)
        |      WHERE event_type = 'click' AND ts_us > t_view GROUP BY e.user_id),
        |p AS (SELECT e.user_id, min(ts_us) AS t_purchase FROM e JOIN c USING (user_id)
        |      WHERE event_type = 'purchase' AND ts_us > t_click GROUP BY e.user_id)
        |SELECT u.user_id, t_view, t_click, t_purchase,
        | CAST(CASE WHEN t_purchase IS NOT NULL THEN 3
        |           WHEN t_click IS NOT NULL THEN 2
        |           WHEN t_view IS NOT NULL THEN 1 ELSE 0 END AS INTEGER) AS stage,
        | t_purchase - t_view AS convert_us
        |FROM u LEFT JOIN v USING (user_id) LEFT JOIN c USING (user_id)
        | LEFT JOIN p USING (user_id)
        |ORDER BY user_id""".stripMargin,

    // Incremental-agg twin (q48): the single-pass recompute — the merged
    // split state must match it bit-for-bit (exact decimal partials).
    "q48_incr_agg" ->
      """SELECT event_type, count(value) AS n,
        | CAST(sum(CAST(value AS DECIMAL(28,10))) AS DOUBLE) AS total,
        | min(value) AS mn, max(value) AS mx,
        | round(CAST(sum(CAST(value AS DECIMAL(28,10))) AS DOUBLE) / count(value), 6) AS avg_v
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

    // Weighted-sample twin (q56): the shared scoring CTEs + the same
    // exact-u → ln → ÷quality → round-9 key and (key DESC, doc_id) rank.
    "q56_weighted_sample" -> (
      s"""${qualityScoreCtes("WITH d AS (SELECT doc_id, lang, text FROM documents)")},
         |u AS (SELECT lang, doc_id, quality,
         |  round(ln(CAST(CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS UBIGINT)
         |    + 1 AS DOUBLE) / 4294967296.0) / quality, 9) AS es_key FROM q),
         |r AS (SELECT lang, doc_id, quality, es_key,
         |  row_number() OVER (PARTITION BY lang ORDER BY es_key DESC, doc_id) AS rnk FROM u)
         |SELECT lang, CAST(rnk AS BIGINT) AS rnk, doc_id, quality, es_key
         |FROM r WHERE rnk <= 15 ORDER BY lang, rnk""".stripMargin),

    // Heavy-hitters twin (q47): same synthesized item stream, exact
    // counts + the integer threshold; the sketch flags are asserted TRUE
    // (the MG guarantee + the structural k bound — the q30/q35 pattern).
    "q47_heavy_hitters" -> (
      s"""WITH tok AS (SELECT doc_id, $tokensSqlExpr AS ws FROM documents),
         |tu AS (SELECT unnest(ws) AS tok, generate_subscripts(ws, 1) - 1 AS pos FROM tok),
         |it AS (SELECT CASE WHEN pos % 7 < 3 THEN 'hot' || CAST(pos % 3 AS VARCHAR)
         |  ELSE tok END AS term FROM tu),
         |c AS (SELECT term, count(*) AS c FROM it GROUP BY term),
         |n AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM c)
         |SELECT term, c, TRUE AS in_sketch, TRUE AS cand_within_k
         |FROM c CROSS JOIN n WHERE c * 17 > n ORDER BY term""".stripMargin),

    // SCD2 twin (q46): same per-user (ts, event_id) ordering, same lead
    // interval close, epoch_us for the exact microsecond bounds.
    "q46_scd2" ->
      """WITH e AS (SELECT user_id, event_id, event_type, value,
        |  epoch_us(ts) AS ts_us FROM events),
        |v AS (SELECT user_id, event_id, event_type, value,
        |  CAST(row_number() OVER w AS BIGINT) AS version,
        |  ts_us AS valid_from_us, lead(ts_us) OVER w AS valid_to_us
        |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id))
        |SELECT user_id, event_id, event_type, value, version,
        |  valid_from_us, valid_to_us, valid_to_us IS NULL AS is_current
        |FROM v ORDER BY user_id, version""".stripMargin,

    // Leakage-free split twin (q43): d12's recursive-CTE cluster chain +
    // the q41 hex-u32 idiom against round(0.8·2^32) = 3435973837.
    "q43_split" -> (
      s"""WITH RECURSIVE ${portableMinhashCtes(64)},
         |${portableLshPairCtes(64, 16, 0.4)},
         |bidir AS (SELECT a_id AS src, b_id AS dst FROM pairs
         |          UNION ALL SELECT b_id AS src, a_id AS dst FROM pairs),
         |reach(id, label) AS (
         | SELECT doc_id, doc_id FROM documents
         | UNION
         | SELECT b.dst, r.label FROM reach r JOIN bidir b ON r.id = b.src WHERE r.label < b.dst),
         |cc AS (SELECT id AS doc_id, min(label) AS cluster_id FROM reach GROUP BY id)
         |SELECT doc_id, cluster_id,
         | count(*) OVER (PARTITION BY cluster_id) AS cluster_size,
         | doc_id = cluster_id AS is_survivor,
         | CASE WHEN CAST(('0x' || substr(md5(CAST(cluster_id AS VARCHAR)), 1, 8)) AS UBIGINT)
         |        < 3435973837 THEN 'train' ELSE 'val' END AS split
         |FROM cc ORDER BY doc_id""".stripMargin),

    // Decontamination twin (d13): the d10 shingle CTE on both sides —
    // contamination shingle universe from doc_id < 20, hit = any shared
    // shingle, LEFT JOIN back to the full corpus for the total decision.
    // Sub-n-token documents have no shingles and stay false on both
    // engines.
    "d13_decontaminate" -> (
      s"""WITH tok AS (SELECT doc_id, $tokensSqlExpr AS ws FROM documents),
         |g AS (SELECT doc_id, list_distinct(list_transform(range(len(ws) - 2),
         |  i -> ws[i+1] || ' ' || ws[i+2] || ' ' || ws[i+3])) AS sh
         |  FROM tok WHERE len(ws) >= 3),
         |cs AS (SELECT DISTINCT unnest(sh) AS sh FROM g WHERE doc_id < 20),
         |hit AS (SELECT DISTINCT doc_id FROM
         |  (SELECT doc_id, unnest(sh) AS sh FROM g) ds JOIN cs USING (sh))
         |SELECT d.doc_id, (h.doc_id IS NOT NULL) AS contaminated
         |FROM documents d LEFT JOIN hit h ON d.doc_id = h.doc_id
         |ORDER BY d.doc_id""".stripMargin),

    // Semantic-cluster twin (d14): the s02-style plane/bucket CTEs at the
    // operator's own cluster config (8 tables × 8 planes) generate the
    // same candidate pairs, exact cosine at round-6dp filters them (the
    // d06 boundary convention), and d07's recursive-CTE closure resolves
    // the clusters over the embeddings id universe.
    "d14_dedup_clusters_semantic" -> (
      s"""WITH RECURSIVE planes(tbl, pl, w) AS (VALUES ${lshPlanesValues(8, 8, 64, 42L)}),
         |v AS (SELECT vec_id, embedding::DOUBLE[] AS ev FROM embeddings),
         |bk AS (SELECT vec_id, tbl,
         |  SUM(CASE WHEN list_dot_product(ev, w) >= 0 THEN 1::BIGINT << pl ELSE 0 END)::BIGINT AS bucket
         |  FROM v CROSS JOIN planes GROUP BY vec_id, tbl),
         |cand AS (SELECT DISTINCT a.vec_id AS a_id, b.vec_id AS b_id
         |  FROM bk a JOIN bk b ON a.tbl = b.tbl AND a.bucket = b.bucket AND a.vec_id < b.vec_id),
         |pairs AS (SELECT a_id, b_id FROM (
         |  SELECT a_id, b_id, round(list_cosine_similarity(av.ev, bv.ev), 6) AS sim
         |  FROM cand JOIN v av ON av.vec_id = a_id JOIN v bv ON bv.vec_id = b_id)
         |  WHERE sim >= 0.5),
         |bidir AS (SELECT a_id AS src, b_id AS dst FROM pairs
         |          UNION ALL SELECT b_id AS src, a_id AS dst FROM pairs),
         |reach(id, label) AS (
         | SELECT vec_id, vec_id FROM embeddings
         | UNION
         | SELECT b.dst, r.label FROM reach r JOIN bidir b ON r.id = b.src WHERE r.label < b.dst),
         |cc AS (SELECT id AS vec_id, min(label) AS cluster_id FROM reach GROUP BY id)
         |SELECT vec_id, cluster_id,
         | count(*) OVER (PARTITION BY cluster_id) AS cluster_size,
         | vec_id = cluster_id AS is_survivor
         |FROM cc ORDER BY vec_id""".stripMargin),

    // Incremental-dedup twin (d17): same fingerprint, same id-shifted
    // batch construction, same corpus-membership + within-batch-min rules.
    "d17_incr" ->
      """WITH batch AS (
        |  SELECT doc_id, text FROM documents WHERE doc_id >= 400
        |  UNION ALL SELECT doc_id + 10000, text FROM documents WHERE doc_id BETWEEN 390 AND 399
        |  UNION ALL SELECT doc_id + 20000, text FROM documents WHERE doc_id BETWEEN 495 AND 499),
        |cf AS (SELECT DISTINCT md5(regexp_replace(trim(lower(text)), '\s+', ' ', 'g')) AS fp
        |  FROM documents WHERE doc_id < 400),
        |bf AS (SELECT doc_id, md5(regexp_replace(trim(lower(text)), '\s+', ' ', 'g')) AS fp FROM batch),
        |j AS (SELECT doc_id, fp IN (SELECT fp FROM cf) AS in_corpus,
        |  min(doc_id) OVER (PARTITION BY fp) AS first_id FROM bf)
        |SELECT doc_id, CASE WHEN in_corpus THEN 'dup_corpus'
        |  WHEN doc_id <> first_id THEN 'dup_batch' ELSE 'new' END AS status
        |FROM j ORDER BY doc_id""".stripMargin,

    // Bloom decontamination twin (d16): the exact column IS d13's oracle;
    // the bloom column is checked through its one-sided-error contract
    // (exact ⊆ bloom ⇒ bloom_ok TRUE everywhere), the q30/q35 recipe.
    "d16_bloom" ->
      s"""WITH tok AS (SELECT doc_id, $tokensSqlExpr AS ws FROM documents),
         |g AS (SELECT doc_id, list_distinct(list_transform(range(len(ws) - 2),
         |  i -> ws[i+1] || ' ' || ws[i+2] || ' ' || ws[i+3])) AS sh
         |  FROM tok WHERE len(ws) >= 3),
         |cs AS (SELECT DISTINCT unnest(sh) AS sh FROM g WHERE doc_id < 20),
         |hit AS (SELECT DISTINCT doc_id FROM
         |  (SELECT doc_id, unnest(sh) AS sh FROM g) ds JOIN cs USING (sh))
         |SELECT d.doc_id, (h.doc_id IS NOT NULL) AS contaminated,
         | TRUE AS bloom_ok
         |FROM documents d LEFT JOIN hit h ON d.doc_id = h.doc_id
         |ORDER BY d.doc_id""".stripMargin,

    // Duplicate-span twin (d15): same md5 gram keys, same ≥2-distinct-docs
    // rule, and the same lag-window union of overlapping spans (first
    // start contributes 8, each later one min(8, pos−prev)).
    "d15_spans" ->
      s"""WITH tok AS (SELECT doc_id, $tokensSqlExpr AS ws FROM documents),
         |gr AS (SELECT doc_id, i AS pos, md5(array_to_string(ws[i+1:i+8], ' ')) AS g
         |  FROM tok, UNNEST(range(len(ws) - 7)) AS u(i) WHERE len(ws) >= 8),
         |dup AS (SELECT g FROM gr GROUP BY g HAVING count(DISTINCT doc_id) >= 2),
         |ds AS (SELECT doc_id, pos,
         |    lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) AS prev
         |  FROM gr WHERE g IN (SELECT g FROM dup)),
         |cov AS (SELECT doc_id,
         |    CAST(SUM(CASE WHEN prev IS NULL THEN 8 ELSE LEAST(8, pos - prev) END) AS BIGINT) AS dup_tokens
         |  FROM ds GROUP BY doc_id)
         |SELECT t.doc_id, CAST(len(ws) AS BIGINT) AS n_toks,
         | COALESCE(c.dup_tokens, 0) AS dup_tokens,
         | round(CAST(COALESCE(c.dup_tokens, 0) AS DOUBLE) / greatest(len(ws), 1), 6) AS dup_ratio
         |FROM tok t LEFT JOIN cov c USING (doc_id) ORDER BY t.doc_id""".stripMargin,

    // Incremental-span twin (d20): corpus gram index as a DISTINCT CTE,
    // batch rebuilt with the d17 unions, dup = corpus membership OR the
    // within-batch min≠max window, then d15's lag-window span union.
    // Incremental near-dup twin (d21): corpus (<400) and the d17-shaped
    // batch unify into one id-disjoint table, the d11 portable
    // signature/band/pair chain runs over it, and the classification
    // reads the generic pair set by id range (corpus ids < 400 ≤ batch
    // ids, so corpus-batch pairs are exactly (a<400, b≥400) and
    // batch-peer pairs (a≥400, b≥400) with a the lower peer).
    "d21_incr_neardup" -> (
      s"""WITH alldocs AS (
         |  SELECT doc_id, text FROM documents WHERE doc_id < 400
         |  UNION ALL SELECT doc_id, text FROM documents WHERE doc_id >= 400
         |  UNION ALL SELECT doc_id + 10000, text FROM documents WHERE doc_id BETWEEN 390 AND 399
         |  UNION ALL SELECT doc_id + 20000, text FROM documents WHERE doc_id BETWEEN 495 AND 499),
         |${portableMinhashCtes(64, "alldocs")},
         |${portableLshPairCtes(64, 16, 0.4)},
         |bm AS (SELECT doc_id FROM alldocs WHERE doc_id >= 400),
         |cbest AS (SELECT b_id AS id, a_id AS match_id, est_jaccard,
         |    row_number() OVER (PARTITION BY b_id ORDER BY est_jaccard DESC, a_id) AS r
         |  FROM pairs WHERE a_id < 400 AND b_id >= 400),
         |pbest AS (SELECT b_id AS id, a_id AS match_id, est_jaccard,
         |    row_number() OVER (PARTITION BY b_id ORDER BY est_jaccard DESC, a_id) AS r
         |  FROM pairs WHERE a_id >= 400 AND b_id >= 400)
         |SELECT bm.doc_id,
         |  CASE WHEN c.id IS NOT NULL THEN 'dup_corpus'
         |       WHEN p.id IS NOT NULL THEN 'dup_batch' ELSE 'new' END AS status,
         |  CASE WHEN c.id IS NOT NULL THEN c.match_id ELSE p.match_id END AS match_id,
         |  CASE WHEN c.id IS NOT NULL THEN c.est_jaccard ELSE p.est_jaccard END AS est_jaccard
         |FROM bm
         |LEFT JOIN (SELECT * FROM cbest WHERE r = 1) c ON bm.doc_id = c.id
         |LEFT JOIN (SELECT * FROM pbest WHERE r = 1) p ON bm.doc_id = p.id
         |ORDER BY bm.doc_id""".stripMargin),

    "d20_span_incr" ->
      s"""WITH b AS (SELECT doc_id, text FROM documents WHERE doc_id >= 400
         |  UNION ALL SELECT doc_id + 10000, text FROM documents WHERE doc_id BETWEEN 390 AND 399
         |  UNION ALL SELECT doc_id + 20000, text FROM documents WHERE doc_id BETWEEN 495 AND 499),
         |tok_c AS (SELECT doc_id, $tokensSqlExpr AS ws FROM documents WHERE doc_id < 400),
         |ci AS (SELECT DISTINCT md5(array_to_string(ws[i+1:i+8], ' ')) AS g
         |  FROM tok_c, UNNEST(range(len(ws) - 7)) AS u(i) WHERE len(ws) >= 8),
         |tok_b AS (SELECT doc_id, $tokensSqlExpr AS ws FROM b),
         |gr AS (SELECT doc_id, i AS pos, md5(array_to_string(ws[i+1:i+8], ' ')) AS g
         |  FROM tok_b, UNNEST(range(len(ws) - 7)) AS u(i) WHERE len(ws) >= 8),
         |d AS (SELECT doc_id, pos,
         |    (min(doc_id) OVER (PARTITION BY g) <> max(doc_id) OVER (PARTITION BY g))
         |      OR g IN (SELECT g FROM ci) AS dup
         |  FROM gr),
         |ds AS (SELECT doc_id, pos,
         |    lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) AS prev
         |  FROM d WHERE dup),
         |cov AS (SELECT doc_id,
         |    CAST(SUM(CASE WHEN prev IS NULL THEN 8 ELSE LEAST(8, pos - prev) END) AS BIGINT) AS dup_tokens
         |  FROM ds GROUP BY doc_id)
         |SELECT t.doc_id, CAST(len(ws) AS BIGINT) AS n_toks,
         | COALESCE(c.dup_tokens, 0) AS dup_tokens,
         | round(CAST(COALESCE(c.dup_tokens, 0) AS DOUBLE) / greatest(len(ws), 1), 6) AS dup_ratio
         |FROM tok_b t LEFT JOIN cov c USING (doc_id) ORDER BY t.doc_id""".stripMargin,

    // Domain-quota twin (d19): same deterministic URL synthesis, the same
    // host regex (no lookaround — RE2-safe), the same PSL literal with
    // longest-proper-suffix matching (suffixes generated longest-first,
    // first list member present in the PSL wins, registered domain =
    // suffix + one label, two-label fallback for unlisted TLDs), and
    // q36's md5-permutation quota on the domain key.
    "d19_domain" -> (
      s"""WITH u AS (SELECT doc_id,
        |  'https://' || CASE WHEN doc_id % 3 = 0 THEN 'www.'
        |                     WHEN doc_id % 3 = 1 THEN '' ELSE 'cdn.' END
        |   || source || '.' ||
        |   CASE doc_id % 4 WHEN 0 THEN 'example.com' WHEN 1 THEN 'co.uk'
        |     WHEN 2 THEN 'github.io' ELSE 'net' END
        |   || '/' || lang || '/' || CAST(doc_id AS VARCHAR) AS url
        |  FROM documents),
        |h AS (SELECT doc_id, regexp_extract(url, '^[a-z][a-z0-9+.-]*://([^/:?#]+)', 1) AS host FROM u),
        |m AS (SELECT doc_id, host, labels,
        |  list_filter(list_transform(range(1, len(labels)),
        |      k -> array_to_string(labels[k+1:], '.')),
        |    s -> list_contains([${d19Psl.map("'" + _ + "'").mkString(",")}], s)) AS matched
        |  FROM (SELECT doc_id, host, string_split(host, '.') AS labels FROM h)),
        |d AS (SELECT doc_id, host,
        |  CASE WHEN len(labels) < 2 THEN host
        |       WHEN len(matched) >= 1 THEN
        |         array_to_string(labels[len(labels) - len(string_split(matched[1], '.')):], '.')
        |       ELSE array_to_string(labels[len(labels)-1:], '.') END AS domain
        |  FROM m),
        |r AS (SELECT domain, doc_id, host,
        |  CAST(row_number() OVER (PARTITION BY domain
        |    ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS BIGINT) AS sample_rank
        |  FROM d)
        |SELECT domain, sample_rank, doc_id, host FROM r
        |WHERE sample_rank <= 15 ORDER BY domain, sample_rank""".stripMargin),

    // Span-trim twin (d18): d15's gram/dup CTEs, then the same
    // gaps-and-islands merge (new island when pos−prev > 8, running-sum
    // island id), interval complement via nested list_filter, and the
    // same kept-token reconstruction.
    "d18_trim" ->
      s"""WITH tok AS (SELECT doc_id, $tokensSqlExpr AS ws FROM documents),
         |gr AS (SELECT doc_id, i AS pos, md5(array_to_string(ws[i+1:i+8], ' ')) AS g
         |  FROM tok, UNNEST(range(len(ws) - 7)) AS u(i) WHERE len(ws) >= 8),
         |dup AS (SELECT g FROM gr GROUP BY g HAVING count(DISTINCT doc_id) >= 2),
         |ds AS (SELECT doc_id, pos,
         |    lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) AS prev
         |  FROM gr WHERE g IN (SELECT g FROM dup)),
         |si AS (SELECT doc_id, pos,
         |    sum(CASE WHEN prev IS NULL OR pos - prev > 8 THEN 1 ELSE 0 END)
         |      OVER (PARTITION BY doc_id ORDER BY pos) AS isl
         |  FROM ds),
         |iv AS (SELECT doc_id, isl, min(pos) AS lo, max(pos) + 7 AS hi
         |  FROM si GROUP BY doc_id, isl),
         |ivs AS (SELECT doc_id, list(struct_pack(lo := lo, hi := hi) ORDER BY lo) AS ivs
         |  FROM iv GROUP BY doc_id),
         |k AS (SELECT t.doc_id, ws,
         |    list_filter(range(len(ws)), p -> i.ivs IS NULL OR
         |      len(list_filter(i.ivs, v -> p >= v.lo AND p <= v.hi)) = 0) AS kept
         |  FROM tok t LEFT JOIN ivs i USING (doc_id))
         |SELECT doc_id, CAST(len(ws) AS BIGINT) AS n_toks,
         | CAST(len(kept) AS BIGINT) AS n_kept,
         | COALESCE(array_to_string(list_transform(kept, p -> ws[p+1]), ' '), '') AS trimmed_text
         |FROM k ORDER BY doc_id""".stripMargin,

    // Portable simhash: DuckDB reproduces the md5-low64 token hash exactly
    // (hex→UBIGINT, re-centered to signed 64-bit), then the identical
    // per-bit vote + fold. The 64 vote/fold terms are generated.
    "d08_simhash_portable" ->
      s"""WITH $portableSimhashCtes
         |SELECT doc_id, simhash FROM fps ORDER BY doc_id""".stripMargin,

    // SimHash contract twin (d05): the fingerprint values are xx-family-
    // internal (see the query comment — cardinality across families is
    // NOT invariant), so the twin anchors each row by token count and
    // asserts Spark's own native≡declarative equality flag TRUE.
    "d05_simhash" ->
      s"""WITH tok AS (SELECT doc_id, $tokensSqlExpr AS ws FROM documents)
         |SELECT doc_id, CAST(len(ws) AS BIGINT) AS n_tokens,
         | TRUE AS native_eq_declarative
         |FROM tok ORDER BY doc_id""".stripMargin,

    "d06_embedding_neardup" ->
      """WITH p AS (SELECT vec_id AS a_id, embedding::DOUBLE[] AS av FROM embeddings WHERE vec_id < 100),
        |c AS (SELECT vec_id AS b_id, embedding::DOUBLE[] AS bv FROM embeddings)
        |SELECT a_id, b_id, sim FROM (
        | SELECT a_id, b_id, round(list_cosine_similarity(av, bv), 6) AS sim
        | FROM p JOIN c ON a_id < b_id)
        |WHERE sim >= 0.35 ORDER BY a_id, b_id""".stripMargin,

    "s01_cosine_topk" ->
      """WITH p AS (SELECT vec_id AS probe_id, embedding::DOUBLE[] AS pv FROM embeddings WHERE vec_id < 10),
        |c AS (SELECT vec_id AS neighbor_id, embedding::DOUBLE[] AS cv FROM embeddings),
        |s AS (SELECT probe_id, neighbor_id, list_cosine_similarity(pv, cv) AS sim
        |      FROM p JOIN c ON probe_id <> neighbor_id),
        |r AS (SELECT probe_id, neighbor_id, sim,
        |      row_number() OVER (PARTITION BY probe_id ORDER BY sim DESC, neighbor_id) AS rnk FROM s)
        |SELECT probe_id, rnk, neighbor_id, round(sim, 6) AS sim FROM r
        |WHERE rnk <= 5 ORDER BY probe_id, rnk""".stripMargin,

    // ANN twin of s02: the operator's seeded hyperplanes embedded as
    // literal VALUES (lshPlanesValues — same Similarity.hyperplanes
    // doubles), sign-pattern bucket per (vector, table) as a bit-summed
    // aggregate, candidates = bucket hits in ANY table, then s01's exact
    // cosine re-rank. Sign decisions ride IEEE-double dots; both engines
    // see identical plane/vector doubles, so a flip would need a dot
    // within one accumulation-reorder ulp of 0 — vanishingly rare for
    // Gaussian planes, and caught by this oracle if it ever happens.
    "s02_lsh_topk" ->
      s"""WITH planes(tbl, pl, w) AS (VALUES ${lshPlanesValues(16, 4, 64, 42L)}),
         |v AS (SELECT vec_id, embedding::DOUBLE[] AS ev FROM embeddings),
         |bk AS (SELECT vec_id, tbl,
         |  SUM(CASE WHEN list_dot_product(ev, w) >= 0 THEN 1::BIGINT << pl ELSE 0 END)::BIGINT AS bucket
         |  FROM v CROSS JOIN planes GROUP BY vec_id, tbl),
         |cand AS (SELECT DISTINCT p.vec_id AS probe_id, c.vec_id AS neighbor_id
         |  FROM bk p JOIN bk c ON p.tbl = c.tbl AND p.bucket = c.bucket AND p.vec_id <> c.vec_id
         |  WHERE p.vec_id < 10),
         |${annRankSql(5)}""".stripMargin,

    // ANN twin of s03: centroids = 16 lowest-id vectors, assignment ranks
    // round(cosine, 6) with cent_id tie-break (the operator's documented
    // deterministic contract), corpus to its 1 nearest cell, probes to 8,
    // candidates per shared cell, then s01's exact cosine re-rank.
    "s03_ivf_topk" ->
      s"""WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS ev FROM embeddings),
         |cents AS (SELECT vec_id AS cent_id, ev AS cv FROM v ORDER BY vec_id LIMIT 16),
         |asgn AS (SELECT vec_id, cent_id,
         |    round(list_cosine_similarity(ev, cv), 6) AS csim
         |  FROM v CROSS JOIN cents),
         |ca AS (SELECT vec_id AS neighbor_id, cent_id FROM (
         |    SELECT vec_id, cent_id,
         |      row_number() OVER (PARTITION BY vec_id ORDER BY csim DESC NULLS LAST, cent_id) AS r
         |    FROM asgn) WHERE r <= 1),
         |pa AS (SELECT vec_id AS probe_id, cent_id FROM (
         |    SELECT vec_id, cent_id,
         |      row_number() OVER (PARTITION BY vec_id ORDER BY csim DESC NULLS LAST, cent_id) AS r
         |    FROM asgn WHERE vec_id < 10) WHERE r <= 8),
         |cand AS (SELECT DISTINCT probe_id, neighbor_id
         |  FROM pa JOIN ca USING (cent_id) WHERE probe_id <> neighbor_id),
         |${annRankSql(5)}""".stripMargin,

    // ANN recall twin (s04): s01's exact-topk chain and s03's IVF chain
    // composed in one WITH list (CTEs renamed apart), then per-probe
    // overlap — the oracle re-derives BOTH sides, so a drift in either
    // operator breaks the recall row for the probe it touched.
    "s04_recall" ->
      """WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS ev FROM embeddings),
        |ex AS (SELECT probe_id, neighbor_id FROM (
        |   SELECT p.vec_id AS probe_id, c.vec_id AS neighbor_id,
        |     row_number() OVER (PARTITION BY p.vec_id
        |       ORDER BY list_cosine_similarity(p.ev, c.ev) DESC, c.vec_id) AS rnk
        |   FROM v p JOIN v c ON p.vec_id <> c.vec_id WHERE p.vec_id < 10)
        | WHERE rnk <= 5),
        |cents AS (SELECT vec_id AS cent_id, ev AS cv FROM v ORDER BY vec_id LIMIT 16),
        |asgn AS (SELECT vec_id, cent_id,
        |    round(list_cosine_similarity(ev, cv), 6) AS csim
        |  FROM v CROSS JOIN cents),
        |ca AS (SELECT vec_id AS neighbor_id, cent_id FROM (
        |    SELECT vec_id, cent_id,
        |      row_number() OVER (PARTITION BY vec_id ORDER BY csim DESC NULLS LAST, cent_id) AS r
        |    FROM asgn) WHERE r <= 1),
        |pa AS (SELECT vec_id AS probe_id, cent_id FROM (
        |    SELECT vec_id, cent_id,
        |      row_number() OVER (PARTITION BY vec_id ORDER BY csim DESC NULLS LAST, cent_id) AS r
        |    FROM asgn WHERE vec_id < 10) WHERE r <= 8),
        |cand AS (SELECT DISTINCT probe_id, neighbor_id
        |  FROM pa JOIN ca USING (cent_id) WHERE probe_id <> neighbor_id),
        |iv AS (SELECT probe_id, neighbor_id FROM (
        |   SELECT cand.probe_id, cand.neighbor_id,
        |     row_number() OVER (PARTITION BY cand.probe_id
        |       ORDER BY list_cosine_similarity(pv.ev, nv.ev) DESC, cand.neighbor_id) AS rnk
        |   FROM cand JOIN v pv ON pv.vec_id = cand.probe_id
        |     JOIN v nv ON nv.vec_id = cand.neighbor_id)
        | WHERE rnk <= 5),
        |hit AS (SELECT probe_id, count(*) AS n_hit FROM ex JOIN iv USING (probe_id, neighbor_id) GROUP BY probe_id),
        |base AS (SELECT probe_id, count(*) AS n_exact FROM ex GROUP BY probe_id)
        |SELECT b.probe_id, CAST(b.n_exact AS BIGINT) AS n_exact,
        | CAST(COALESCE(h.n_hit, 0) AS BIGINT) AS n_hit,
        | round(CAST(COALESCE(h.n_hit, 0) AS DOUBLE) / b.n_exact, 6) AS recall
        |FROM base b LEFT JOIN hit h USING (probe_id) ORDER BY b.probe_id""".stripMargin,

    // Cluster-balanced sampling twin (s06): s03's assignment CTEs + the
    // q36 md5-permutation quota on the cell id.
    "s06_cluster_sample" ->
      """WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS ev FROM embeddings),
        |cents AS (SELECT vec_id AS cent_id, ev AS cv FROM v ORDER BY vec_id LIMIT 16),
        |asgn AS (SELECT vec_id, cent_id,
        |    round(list_cosine_similarity(ev, cv), 6) AS csim
        |  FROM v CROSS JOIN cents),
        |ca AS (SELECT vec_id, cent_id FROM (
        |    SELECT vec_id, cent_id,
        |      row_number() OVER (PARTITION BY vec_id ORDER BY csim DESC NULLS LAST, cent_id) AS r
        |    FROM asgn) WHERE r = 1),
        |rk AS (SELECT cent_id, vec_id,
        |  CAST(row_number() OVER (PARTITION BY cent_id
        |    ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) AS BIGINT) AS sample_rank
        |  FROM ca)
        |SELECT cent_id, sample_rank, vec_id FROM rk WHERE sample_rank <= 8
        |ORDER BY cent_id, sample_rank""".stripMargin,

    // PQ twin (s07): codebook = the 16 lowest-id vectors' 8-dim
    // subvectors; sub-distance = round-6 squared L2 via an ordered
    // fold (list_reduce left fold ≡ Spark's 0.0-seeded fold — 0+e1 is
    // exact); encode = first strict minimum per (vec, subspace); ADC =
    // the 8 rounded table entries added in subspace order.
    "s07_pq_topk" ->
      """WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS ev FROM embeddings),
        |cbv AS (SELECT row_number() OVER (ORDER BY vec_id) - 1 AS code, ev
        |  FROM (SELECT vec_id, ev FROM v ORDER BY vec_id LIMIT 16)),
        |cbe AS (SELECT j, code, ev[j*8+1:j*8+8] AS cw
        |  FROM cbv CROSS JOIN range(8) r(j)),
        |dist AS (SELECT v.vec_id, c.j, c.code,
        |    round(list_reduce(list_transform(range(1, 9),
        |      i -> (ev[c.j*8+i] - cw[i]) * (ev[c.j*8+i] - cw[i])),
        |      (a, b) -> a + b), 6) AS d2
        |  FROM v CROSS JOIN cbe c),
        |enc AS (SELECT vec_id AS neighbor_id, j, code FROM (
        |    SELECT vec_id, j, code,
        |      row_number() OVER (PARTITION BY vec_id, j ORDER BY d2, code) AS r
        |    FROM dist) WHERE r = 1),
        |pt AS (SELECT vec_id AS probe_id, j, code, d2 AS pd
        |  FROM dist WHERE vec_id < 10),
        |adc AS (SELECT probe_id, neighbor_id,
        |    list_reduce(list(pd ORDER BY j), (a, b) -> a + b) AS adc
        |  FROM enc JOIN pt USING (j, code) WHERE probe_id <> neighbor_id
        |  GROUP BY probe_id, neighbor_id)
        |SELECT probe_id, rank, neighbor_id, round(adc, 6) AS adc_dist FROM (
        |  SELECT probe_id, neighbor_id, adc,
        |    CAST(row_number() OVER (PARTITION BY probe_id
        |      ORDER BY adc, neighbor_id) AS BIGINT) AS rank
        |  FROM adc) WHERE rank <= 5
        |ORDER BY probe_id, rank""".stripMargin,

    // Trained-PQ recall twin (s08): see pqTrainedOracleSql.
    "s08_pq_trained" -> pqTrainedOracleSql(m = 8, ks = 16, sub = 8,
      iters = 2, k = 5, nProbes = 10),

    // Trained-quantizer recall twin (s05): see kmeansOracleSql.
    "s05_kmeans" -> kmeansOracleSql(nCells = 16, nProbe = 8, iters = 3,
      dim = 64, k = 5),

    // Portable rolling-fingerprint twin (t07): md5-low64 per token (d10's
    // base-hash expression), then the base-1000003 multiply-add fold with
    // Java-long wraparound in HUGEINT; empty token lists fold to 0 like
    // Spark's aggregate over an empty array.
    "t07_rolling_fingerprint_portable" -> (
      s"""WITH $portableRollingFpCtes
         |SELECT doc_id, fp64 FROM fps ORDER BY doc_id""".stripMargin),

    // Rolling-fingerprint cardinality contract (t04): DuckDB counts
    // distinct md5-fold fingerprints (= distinct token sequences absent
    // collisions); Spark's fp_card is the xx-family count.
    "t04_rolling_fingerprint" -> (
      s"""WITH $portableRollingFpCtes
         |SELECT d.doc_id, (SELECT count(DISTINCT fp64) FROM fps) AS fp_card,
         | TRUE AS card_agree
         |FROM documents d ORDER BY doc_id""".stripMargin),

    // Repetition twin (t08): raw (non-distinct) 3-grams rebuilt with the
    // same range/concat construction as the d10 shingle CTE minus the
    // list_distinct, counts materialized once, the shared 1−distinct/total
    // formula rounded to 6 dp, and the keep flag compared on the ROUNDED
    // value — so the keep/drop boundary cannot drift between engines.
    "t08_repetition" -> (
      s"""WITH tok AS (SELECT doc_id, $tokensSqlExpr AS ws FROM documents),
         |g AS (SELECT doc_id, CASE WHEN len(ws) >= 3
         |  THEN list_transform(range(len(ws) - 2), i -> ws[i+1] || ' ' || ws[i+2] || ' ' || ws[i+3])
         |  ELSE []::VARCHAR[] END AS g FROM tok),
         |c AS (SELECT doc_id, CAST(len(g) AS BIGINT) AS n_grams,
         |  CAST(len(list_distinct(g)) AS BIGINT) AS n_distinct FROM g),
         |f AS (SELECT doc_id, n_grams, n_distinct,
         |  CASE WHEN n_grams = 0 THEN 0.0
         |    ELSE round(1.0::DOUBLE - n_distinct::DOUBLE / n_grams::DOUBLE, 6)
         |  END AS dup_frac FROM c)
         |SELECT doc_id, n_grams, n_distinct, dup_frac, dup_frac <= 0.2 AS keep
         |FROM f ORDER BY doc_id""".stripMargin),

    "q36_stratified_sample" ->
      """SELECT lang, sample_rank, doc_id FROM (
        | SELECT lang, doc_id,
        |  CAST(row_number() OVER (PARTITION BY lang
        |    ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS BIGINT) AS sample_rank
        | FROM documents)
        |WHERE sample_rank <= 50 ORDER BY lang, sample_rank""".stripMargin,

    // Packing twin (q39): the same per-language running token count
    // (ROWS frame — explicit, so both engines use identical frames) and
    // the same start-offset bin arithmetic. DuckDB's sum(BIGINT) widens
    // to HUGEINT, hence the explicit casts back.
    "q39_pack" -> (
      s"""WITH tok AS (SELECT lang, doc_id,
         | CAST(len($tokensSqlExpr) AS BIGINT) AS n_tokens FROM documents),
         |c AS (SELECT lang, doc_id, n_tokens,
         | sum(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id
         |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_tokens AS start
         |FROM tok)
         |SELECT lang, doc_id, n_tokens,
         | CAST(start // 512 AS BIGINT) AS seq_id,
         | CAST(start % 512 AS BIGINT) AS off
         |FROM c ORDER BY lang, doc_id""".stripMargin),

    // Unigram-LM twin (t09): the same frequency table, the same
    // 9-dp-rounded ln(c/total) per token, the same position-ordered left
    // fold (list_reduce over list(lp ORDER BY pos) ≡ Spark's aggregate
    // over the pos-sorted array: 0.0 + x == x exactly in IEEE, so the
    // missing explicit init changes nothing), the same 6-dp display round.
    "t09_ppl" -> (
      s"""WITH tok AS (SELECT doc_id, $tokensSqlExpr AS ws FROM documents),
         |tu AS (SELECT doc_id, unnest(ws) AS token, generate_subscripts(ws, 1) AS pos FROM tok),
         |f AS (SELECT token, count(*) AS c FROM tu GROUP BY token),
         |tot AS (SELECT CAST(sum(c) AS DOUBLE) AS total FROM f),
         |lp AS (SELECT doc_id, pos, round(ln(CAST(c AS DOUBLE) / total), 9) AS lp
         |  FROM tu JOIN f USING (token) CROSS JOIN tot),
         |agg AS (SELECT doc_id, list_reduce(list(lp ORDER BY pos), (a, b) -> a + b) AS s,
         |  count(*) AS n FROM lp GROUP BY doc_id)
         |SELECT d.doc_id, CAST(coalesce(agg.n, 0) AS BIGINT) AS n_tokens,
         | round(agg.s / agg.n, 6) AS lp_avg
         |FROM documents d LEFT JOIN agg USING (doc_id) ORDER BY doc_id""".stripMargin),

    // Bigram-LM twin (t10): same counts, same add-half smoothing (0.5 and
    // the integer counts are exact in both engines), t09's rounded-log +
    // position-sorted-fold determinism recipe.
    // BPE twin (t11): REPLAYS the 12 training rounds in SQL — per round, a
    // vocabulary pair-count CTE, a 1-row argmax CTE (count DESC, pair
    // lexicographic — the operator's exact ranking), and a merge
    // application via the SAME greedy left-to-right string fold
    // (list_reduce seeds the accumulator with the first symbol, so "the
    // accumulator's last symbol is exactly `a`" is `acc = a OR
    // ends_with(acc, ' '||a)`; a fused symbol a||b never re-matches). All
    // chain CTEs are MATERIALIZED — each round's state feeds two
    // consumers, and CTE inlining would expand the 12-round chain
    // exponentially. LEFT JOIN ON TRUE (not CROSS JOIN) keeps a
    // fully-merged vocabulary from vanishing: an empty argmax row makes
    // the fold's CASE test NULL = never-true, i.e. the identity merge —
    // matching the operator's early-stop. Ids, encoding, and est_ratio
    // then mirror Bpe.tokenIds/encode and the t03 estimator.
    "t11_bpe" -> bpeOracleSql(12),

    // Held-out BPE twin (t13): training replayed on the even half, the
    // OOV merge fold replayed on the held-out word set, unknowns → -1.
    "t13_bpe_oov" -> bpeOovOracleSql(12),

    // Normalization twin (t17): identical dirty-text synthesis and the
    // identical RE2 class chain.
    "t17_normalize" ->
      """WITH d AS (SELECT doc_id,
        |  text || ' -- END!! ' || upper(substring(text, 1, 12)) || ' (c) 2026, v1.0?' AS dirty
        |  FROM documents)
        |SELECT doc_id, CAST(length(dirty) AS BIGINT) AS n_chars_in,
        | trim(regexp_replace(regexp_replace(lower(dirty), '[^a-z0-9\s]', ' ', 'g'),
        |   '\s+', ' ', 'g')) AS clean_text,
        | CAST(length(trim(regexp_replace(regexp_replace(lower(dirty), '[^a-z0-9\s]', ' ', 'g'),
        |   '\s+', ' ', 'g'))) AS BIGINT) AS n_chars_out,
        | CAST(len(list_filter(string_split(trim(regexp_replace(regexp_replace(lower(dirty),
        |   '[^a-z0-9\s]', ' ', 'g'), '\s+', ' ', 'g')), ' '), x -> length(x) > 0)) AS BIGINT) AS n_tokens
        |FROM d ORDER BY doc_id""".stripMargin,

    // tf-idf twin (t16): df derived from the tf CTE, N as a 1-row scalar,
    // the identical divide→ln→+1→×tf chain rounded to 9 dp before
    // ranking, row_number with the same (score DESC, term ASC) order.
    "t16_tfidf" -> (
      s"""WITH tok AS (SELECT doc_id, $tokensSqlExpr AS ws FROM documents),
         |tu AS (SELECT doc_id, unnest(ws) AS term FROM tok),
         |tf AS (SELECT doc_id, term, count(*) AS tf FROM tu GROUP BY doc_id, term),
         |df AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
         |n AS (SELECT CAST(count(*) AS DOUBLE) AS n_docs FROM documents),
         |sc AS (SELECT doc_id, term,
         |  round(CAST(tf AS DOUBLE) *
         |    (ln((1.0 + n_docs) / (1.0 + CAST(df AS DOUBLE))) + 1.0), 9) AS tfidf
         |  FROM tf JOIN df USING (term) CROSS JOIN n),
         |r AS (SELECT doc_id, term, tfidf,
         |  row_number() OVER (PARTITION BY doc_id ORDER BY tfidf DESC, term) AS rnk
         |  FROM sc)
         |SELECT doc_id, rnk, term, tfidf FROM r WHERE rnk <= 3
         |ORDER BY doc_id, rnk""".stripMargin),

    // Line-dedup twin (t15): same token-slice synthesis, same
    // trim-filter, and the same keep-first rule via the 1-based
    // index-lambda strict-prefix membership test.
    "t15_line_dedup" -> (
      s"""WITH tok AS (SELECT doc_id, $tokensSqlExpr AS ws FROM documents),
         |m AS (SELECT doc_id,
         |  array_to_string(ws[1:6], ' ') || chr(10) || '  ' || chr(10) ||
         |  array_to_string(ws[7:12], ' ') || chr(10) ||
         |  array_to_string(ws[1:6], ' ') || chr(10) ||
         |  array_to_string(ws[7:12], ' ') AS mtext FROM tok),
         |l0 AS (SELECT doc_id,
         |  list_filter(list_transform(string_split(mtext, chr(10)), x -> trim(x)),
         |    x -> x <> '') AS lines FROM m),
         |k AS (SELECT doc_id, CAST(len(lines) AS BIGINT) AS n_lines,
         |  list_filter(lines, (x, i) ->
         |    coalesce(list_position(lines[1:i-1], x), 0) = 0) AS kept FROM l0)
         |SELECT doc_id, n_lines, CAST(len(kept) AS BIGINT) AS n_kept,
         |  array_to_string(kept, chr(10)) AS clean_text
         |FROM k ORDER BY doc_id""".stripMargin),

    // Boilerplate twin (t14): same synthesized HTML, same head-strip +
    // chr(1)-sentinel segment split (RE2 has no lookahead — the split
    // point is materialized on both engines), same length-difference
    // anchor count and integer link-density gate.
    "t14_boilerplate" ->
      """WITH h AS (SELECT doc_id,
        |  '<html><head><title>' || source || '</title></head><body>' ||
        |  '<nav><a href="/">Home</a> <a href="/a">About</a> <a href="/c">Contact</a></nav>' ||
        |  '<p>' || text ||
        |  CASE WHEN doc_id % 5 = 0 THEN ' <a href="/x">click here</a>' ELSE '' END ||
        |  '</p>' ||
        |  '<div class="footer"><a href="/t">Terms</a> <a href="/p">Privacy</a></div></body></html>'
        |  AS html FROM documents),
        |pre AS (SELECT doc_id, regexp_replace(html, '(?s)<head\b[^>]*>.*?</head>', '') AS ph FROM h),
        |seg AS (SELECT doc_id,
        |  string_split(regexp_replace(ph, '<(p|nav|div|h1|footer)\b', chr(1) || '<\1', 'g'),
        |    chr(1)) AS segs FROM pre),
        |st AS (SELECT doc_id, list_transform(segs, s -> struct_pack(
        |    txt := trim(regexp_replace(regexp_replace(s, '<[^>]*>', ' ', 'g'), '\s+', ' ', 'g')),
        |    links := CAST((length(s) - length(regexp_replace(s, '<a ', '', 'g'))) / 3 AS BIGINT)))
        |  AS ss FROM seg),
        |res AS (SELECT doc_id,
        |  CAST(len(ss) AS BIGINT) AS n_segments,
        |  list_filter(ss, x -> x.txt <> '' AND
        |    x.links * 3 <= len(string_split(x.txt, ' '))) AS kept
        |  FROM st)
        |SELECT doc_id, n_segments,
        |  CAST(len(kept) AS BIGINT) AS n_kept,
        |  array_to_string(list_transform(kept, x -> x.txt), ' ') AS clean_text,
        |  CAST(CASE WHEN array_to_string(list_transform(kept, x -> x.txt), ' ') = '' THEN 0
        |    ELSE len(string_split(array_to_string(list_transform(kept, x -> x.txt), ' '), ' '))
        |  END AS BIGINT) AS clean_tokens
        |FROM res ORDER BY doc_id""".stripMargin,

    // Classifier twin (t12): the operator's weight vector embedded as a
    // DOUBLE[] literal (Double.toString round-trips exactly), the same
    // md5-low64 → pmod(64) feature hash, and the same strict
    // left-to-right folds (list_reduce seeds with the first element —
    // adding to an exact 0.0 seed or starting from w1 is bit-identical).
    // exp sits on the 9-dp-rounded mean; keep compares the 6-dp score.
    "t12_clf" -> (
      s"""WITH w(wv) AS (SELECT [${analytics.QualityClassifier.weights.mkString(", ")}]::DOUBLE[]),
         |tok AS (SELECT doc_id, $tokensSqlExpr AS ws FROM documents),
         |g AS (SELECT doc_id, ws, CASE WHEN len(ws) >= 2
         |  THEN list_transform(range(len(ws) - 1), i -> ws[i+1] || ' ' || ws[i+2])
         |  ELSE []::VARCHAR[] END AS bg FROM tok),
         |f AS (SELECT doc_id, CAST(len(ws) + len(bg) AS BIGINT) AS n_feats,
         |  (CASE WHEN len(ws) = 0 THEN 0.0 ELSE list_reduce(
         |     list_transform(ws, s -> wv[CAST((($md5Low64SqlExpr) % 64 + 64) % 64 AS INT) + 1]),
         |     (a, b) -> a + b) END)
         |  + (CASE WHEN len(bg) = 0 THEN 0.0 ELSE list_reduce(
         |     list_transform(bg, s -> wv[CAST((($md5Low64SqlExpr) % 64 + 64) % 64 AS INT) + 1]),
         |     (a, b) -> a + b) END) AS s
         |  FROM g CROSS JOIN w),
         |z AS (SELECT doc_id, n_feats,
         |  CASE WHEN n_feats = 0 THEN NULL
         |       ELSE round(${analytics.QualityClassifier.Bias} + s / n_feats, 9) END AS z FROM f),
         |sc AS (SELECT doc_id, n_feats, round(1.0 / (1.0 + exp(-z)), 6) AS score FROM z)
         |SELECT doc_id, n_feats, score, COALESCE(score >= 0.5, FALSE) AS keep
         |FROM sc ORDER BY doc_id""".stripMargin),

    "t10_lm2" -> (
      s"""WITH tok AS (SELECT doc_id, $tokensSqlExpr AS ws FROM documents),
         |v AS (SELECT CAST(count(DISTINCT t) AS DOUBLE) AS vsz FROM
         |  (SELECT unnest(ws) AS t FROM tok)),
         |bg AS (SELECT doc_id, i AS pos, ws[i+1] AS prev, ws[i+2] AS cur
         |  FROM tok, UNNEST(range(len(ws) - 1)) AS u(i) WHERE len(ws) >= 2),
         |c2 AS (SELECT prev, cur, count(*) AS c2 FROM bg GROUP BY prev, cur),
         |c1 AS (SELECT prev, count(*) AS c1 FROM bg GROUP BY prev),
         |lp AS (SELECT doc_id, pos,
         |  round(ln((CAST(c2 AS DOUBLE) + 0.5) / (CAST(c1 AS DOUBLE) + 0.5 * vsz)), 9) AS lp
         |  FROM bg JOIN c2 USING (prev, cur) JOIN c1 USING (prev) CROSS JOIN v),
         |agg AS (SELECT doc_id, list_reduce(list(lp ORDER BY pos), (a, b) -> a + b) AS s,
         |  count(*) AS n FROM lp GROUP BY doc_id)
         |SELECT d.doc_id, CAST(coalesce(agg.n, 0) AS BIGINT) AS n_bigrams,
         | round(agg.s / agg.n, 6) AS lp2_avg
         |FROM documents d LEFT JOIN agg USING (doc_id) ORDER BY doc_id""".stripMargin),

    // Mixture twin (q40): identical md5 permutation to q36's twin, the
    // quota as the same integer predicate (rank−1)² < count.
    "q40_mix" ->
      """SELECT lang, sample_rank, doc_id, stratum_n FROM (
        | SELECT lang, doc_id,
        |  CAST(row_number() OVER (PARTITION BY lang
        |    ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS BIGINT) AS sample_rank,
        |  count(*) OVER (PARTITION BY lang) AS stratum_n
        | FROM documents)
        |WHERE (sample_rank - 1) * (sample_rank - 1) < stratum_n
        |ORDER BY lang, sample_rank""".stripMargin,

    // Shard twin (q41): same md5 permutation; shard = first 32 hash bits
    // mod 8 (exact integer arithmetic both engines), pos = rank along the
    // same permutation within the shard.
    "q41_shard" ->
      """WITH h AS (SELECT doc_id, md5(CAST(doc_id AS VARCHAR)) AS perm FROM documents),
        |s AS (SELECT doc_id, perm,
        |  CAST(CAST(('0x' || substr(perm, 1, 8)) AS UBIGINT) % 8 AS BIGINT) AS shard FROM h)
        |SELECT shard,
        | CAST(row_number() OVER (PARTITION BY shard ORDER BY perm, doc_id) AS BIGINT) AS pos,
        | doc_id
        |FROM s ORDER BY shard, pos""".stripMargin,

    "t06_top_terms" -> (
      s"""WITH tok AS (SELECT lang, unnest($tokensSqlExpr) AS token FROM documents),
         |c AS (SELECT lang, token, count(*) AS n FROM tok GROUP BY lang, token),
         |r AS (SELECT lang, token, n,
         |  row_number() OVER (PARTITION BY lang ORDER BY n DESC, token) AS rnk FROM c)
         |SELECT lang, CAST(rnk AS BIGINT) AS rnk, token, CAST(n AS BIGINT) AS n
         |FROM r WHERE rnk <= 5 ORDER BY lang, rnk""".stripMargin),

    "q38_curation_pipeline" -> qualityQuotaSql(
      """WITH fp AS (SELECT min(doc_id) AS doc_id
        |  FROM documents GROUP BY md5(regexp_replace(trim(lower(text)), '\s+', ' ', 'g'))),
        |d AS (SELECT doc_id, lang, text FROM documents
        |  WHERE doc_id IN (SELECT doc_id FROM fp))""".stripMargin, 20),

    "q37_quality_topk" -> qualityQuotaSql(
      "WITH d AS (SELECT doc_id, lang, text FROM documents)", 10),

    // Budget twin (q42): same scoring CTEs as q37, running token sum over
    // the same (quality DESC, doc_id) window order, inclusive cutoff.
    "q42_budget" -> (
      s"""${qualityScoreCtes("WITH d AS (SELECT doc_id, lang, text FROM documents)")},
         |c AS (SELECT lang, doc_id, n_tokens, quality,
         |  sum(n_tokens) OVER (PARTITION BY lang ORDER BY quality DESC, doc_id
         |    ROWS UNBOUNDED PRECEDING) AS cum_tokens FROM q)
         |SELECT lang, doc_id, n_tokens, CAST(cum_tokens AS BIGINT) AS cum_tokens, quality
         |FROM c WHERE cum_tokens <= 2000 ORDER BY lang, cum_tokens, doc_id""".stripMargin),

    "t01_langid" -> (
      s"""WITH tok AS (SELECT doc_id, $tokensSqlExpr AS ws FROM documents),
         |sc AS (SELECT doc_id,
         | len(list_filter(ws, x -> list_contains(['the','a','of','and','to','in','is'], x))) AS s_en,
         | len(list_filter(ws, x -> list_contains(['el','la','de','y','que','en','un'], x))) AS s_es,
         | len(list_filter(ws, x -> list_contains(['der','die','das','und','zu','ein','ist'], x))) AS s_de,
         | len(list_filter(ws, x -> list_contains(['le','la','de','et','que','un','est'], x))) AS s_fr
         |FROM tok)
         |SELECT doc_id, CASE WHEN greatest(s_en, s_es, s_de, s_fr) = 0 THEN 'und'
         | WHEN s_en = greatest(s_en, s_es, s_de, s_fr) THEN 'en'
         | WHEN s_es = greatest(s_en, s_es, s_de, s_fr) THEN 'es'
         | WHEN s_de = greatest(s_en, s_es, s_de, s_fr) THEN 'de'
         | ELSE 'fr' END AS lang_pred
         |FROM sc ORDER BY doc_id""".stripMargin),

    "t02_quality" -> (
      s"""WITH tok AS (SELECT doc_id, text, $tokensSqlExpr AS ws FROM documents),
         |f AS (SELECT doc_id, text, len(ws) AS n_tokens,
         | CASE WHEN len(ws) = 0 THEN 0.0 ELSE CAST(list_sum(list_transform(ws, x -> length(x))) AS DOUBLE) / len(ws) END AS avg_word_len,
         | CASE WHEN length(text) = 0 THEN 0.0 ELSE CAST(length(text) - length(regexp_replace(text, '[!-/:-@\\[-`{-~]', '', 'g')) AS DOUBLE) / length(text) END AS punct_ratio,
         | CASE WHEN len(ws) = 0 THEN 0.0 ELSE CAST(len(list_filter(ws, x -> list_contains(['the','a','of','and','to','in','is'], x))) AS DOUBLE) / len(ws) END AS stopword_ratio
         |FROM tok)
         |SELECT doc_id, n_tokens, avg_word_len, punct_ratio, stopword_ratio,
         | 0.4 * least(CAST(length(text) AS DOUBLE) / 500.0, 1.0) + 0.4 * stopword_ratio + 0.2 * (1.0 - punct_ratio) AS quality
         |FROM f ORDER BY doc_id""".stripMargin),

    "t03_token_count" -> (
      s"""WITH tok AS (SELECT lang, $tokensSqlExpr AS ws FROM documents)
         |SELECT lang, CAST(sum(CAST(len(ws) AS BIGINT)) AS BIGINT) AS total_tokens,
         | CAST(sum(list_sum(list_transform(ws, x -> CAST(ceil(length(x) / 4.0) AS BIGINT)))) AS BIGINT) AS total_bpe_est,
         | count(*) AS n_docs
         |FROM tok GROUP BY lang ORDER BY lang""".stripMargin),

    "t05_pii_scrub" ->
      """WITH p AS (SELECT doc_id,
        | text || ' contact user' || doc_id || '@example.com'
        |      || ' from 10.0.0.' || (doc_id % 256)
        |      || ' ssn 123-45-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') AS text
        |FROM documents)
        |SELECT doc_id, scrubbed,
        | CAST(len(string_split(scrubbed, '<EMAIL>')) - 1 AS BIGINT) AS n_email,
        | CAST(len(string_split(scrubbed, '<IP>')) - 1 AS BIGINT) AS n_ipv4,
        | CAST(len(string_split(scrubbed, '<SSN>')) - 1 AS BIGINT) AS n_ssn
        |FROM (SELECT doc_id,
        | regexp_replace(regexp_replace(regexp_replace(text,
        |   '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
        |   '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '<IP>', 'g'),
        |   '\b\d{3}-\d{2}-\d{4}\b', '<SSN>', 'g') AS scrubbed
        |FROM p) ORDER BY doc_id""".stripMargin,

    // Synthesizes the same PNG signature+IHDR bytes Spark builds, then
    // PARSES width/height back out of the blob (hex-string offsets: DuckDB
    // 1.0 has no blob substring) — cross-engine proof the byte layout and
    // the parse both agree with the spec.
    "m02_multimodal_resize" ->
      """WITH b AS (SELECT doc_id, encode(text) AS body, octet_length(encode(text)) AS n
        | FROM documents WHERE doc_id % 3 = 0),
        |p AS (SELECT doc_id, unhex('89504E470D0A1A0A0000000D49484452'
        |  || lpad(hex(16 + n % 64), 8, '0') || lpad(hex(16 + (n * 7) % 64), 8, '0')
        |  || '080200000000000000') || body AS payload FROM b),
        |hx AS (SELECT doc_id, hex(payload) AS h FROM p),
        |m AS (SELECT doc_id,
        |  CAST(('0x' || substring(h, 33, 8)) AS INTEGER) AS w,
        |  CAST(('0x' || substring(h, 41, 8)) AS INTEGER) AS h2
        | FROM hx WHERE substring(h, 1, 16) = '89504E470D0A1A0A')
        |SELECT doc_id, w, h2 AS h,
        | CAST((CAST(w AS BIGINT) * 64) // greatest(w, h2) AS INTEGER) AS rw,
        | CAST((CAST(h2 AS BIGINT) * 64) // greatest(w, h2) AS INTEGER) AS rh
        |FROM m ORDER BY doc_id""".stripMargin,

    // Synthesizes the same 44-byte WAV RIFF header Spark builds (computed
    // little-endian chunkSize/dataSize), then PARSES sample_rate, channels,
    // bits and dataSize back out of the blob and recovers n_samples =
    // dataSize*8/(channels*bits) — the chunk plan runs on PARSED values.
    "m03_audio_chunks" ->
      """WITH b AS (SELECT doc_id, encode(text) AS body, octet_length(encode(text)) AS n
        | FROM documents WHERE doc_id % 3 = 1),
        |b2 AS (SELECT doc_id, body,
        |  lpad(hex(n * 200), 8, '0') AS dz, lpad(hex(n * 200 + 36), 8, '0') AS cz FROM b),
        |p AS (SELECT doc_id, unhex('52494646'
        |  || substring(cz,7,2) || substring(cz,5,2) || substring(cz,3,2) || substring(cz,1,2)
        |  || '57415645666D742010000000' || '0100' || '0100'
        |  || '803E0000' || '007D0000' || '0200' || '1000' || '64617461'
        |  || substring(dz,7,2) || substring(dz,5,2) || substring(dz,3,2) || substring(dz,1,2))
        |  || body AS payload FROM b2),
        |hx AS (SELECT doc_id, hex(payload) AS h FROM p),
        |m AS (SELECT doc_id,
        |  CAST(('0x' || substring(h,55,2) || substring(h,53,2) || substring(h,51,2) || substring(h,49,2)) AS BIGINT) AS sample_rate,
        |  CAST(('0x' || substring(h,47,2) || substring(h,45,2)) AS BIGINT) AS channels,
        |  CAST(('0x' || substring(h,71,2) || substring(h,69,2)) AS BIGINT) AS bits,
        |  CAST(('0x' || substring(h,87,2) || substring(h,85,2) || substring(h,83,2) || substring(h,81,2)) AS BIGINT) AS data_size
        | FROM hx WHERE substring(h,1,8) = '52494646' AND substring(h,17,16) = '57415645666D7420'),
        |s AS (SELECT doc_id, sample_rate, data_size * 8 // (channels * bits) AS n_samples FROM m)
        |SELECT doc_id, CAST(n_samples AS BIGINT) AS n_samples,
        | CAST((n_samples + sample_rate - 1) // sample_rate AS BIGINT) AS n_chunks,
        | CAST(CASE WHEN n_samples = 0 THEN 0
        |  ELSE n_samples - ((n_samples + sample_rate - 1) // sample_rate - 1) * sample_rate END AS BIGINT) AS last_chunk
        |FROM s ORDER BY doc_id""".stripMargin,

    // Frame-plan twin (m04): video payloads are header-less UTF-8 bodies,
    // so n_bytes = octet_length; offsets are the same integer division
    // i·n/4 (DuckDB // = Spark long division for non-negative operands).
    "m04_frames" ->
      """WITH v AS (SELECT doc_id, CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes
        | FROM documents WHERE doc_id % 3 = 2)
        |SELECT doc_id, n_bytes, CAST(i AS INTEGER) AS frame_idx,
        | CAST(i * n_bytes // 4 AS BIGINT) AS byte_off
        |FROM v, UNNEST(range(4)) AS u(i) ORDER BY doc_id, frame_idx""".stripMargin,

    // Patch-grid twin (m05): the same header-derived dims and the same
    // ceil-division grid, two lateral range unnests for the fan-out.
    "m05_patch_grid" ->
      """WITH b AS (SELECT doc_id, octet_length(encode(text)) AS n
        | FROM documents WHERE doc_id % 3 = 0),
        |d AS (SELECT doc_id, CAST(16 + n % 64 AS INTEGER) AS w,
        | CAST(16 + (n * 7) % 64 AS INTEGER) AS h FROM b)
        |SELECT doc_id, w, h, CAST(py AS BIGINT) AS py, CAST(px AS BIGINT) AS px,
        | CAST(px * 16 AS BIGINT) AS x0, CAST(py * 16 AS BIGINT) AS y0,
        | CAST(least(16, w - px * 16) AS BIGINT) AS pw,
        | CAST(least(16, h - py * 16) AS BIGINT) AS ph
        |FROM d,
        | UNNEST(range((CAST(h AS BIGINT) + 15) // 16)) AS uy(py),
        | UNNEST(range((CAST(w AS BIGINT) + 15) // 16)) AS ux(px)
        |ORDER BY doc_id, py, px""".stripMargin,

    "q32_scalar_subquery" ->
      """WITH a AS (SELECT o_custkey,
        | CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_price
        |FROM orders GROUP BY o_custkey)
        |SELECT o_custkey, o_orderkey, o_totalprice, avg_price
        |FROM orders JOIN a USING (o_custkey)
        |WHERE o_totalprice > 2 * avg_price
        |ORDER BY o_custkey, o_orderkey""".stripMargin,

    // Full multimodal twin: per-modality payload synthesis (PNG header for
    // images, WAV header for audio, raw bytes for video), then every
    // metadata column is PARSED back from the payload bytes — img_w/img_h
    // big-endian from IHDR, channels via the PNG colorType mapping,
    // audio_samples from the little-endian RIFF dataSize/blockAlign.
    "m01_multimodal_meta" ->
      """WITH b AS (SELECT doc_id, encode(text) AS body, octet_length(encode(text)) AS n,
        | CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS modality
        |FROM documents),
        |p AS (SELECT doc_id, modality, CASE modality
        | WHEN 'image' THEN unhex('89504E470D0A1A0A0000000D49484452'
        |   || lpad(hex(16 + n % 64), 8, '0') || lpad(hex(16 + (n * 7) % 64), 8, '0')
        |   || '080200000000000000') || body
        | WHEN 'audio' THEN unhex('52494646'
        |   || substring(lpad(hex(n*200+36),8,'0'),7,2) || substring(lpad(hex(n*200+36),8,'0'),5,2)
        |   || substring(lpad(hex(n*200+36),8,'0'),3,2) || substring(lpad(hex(n*200+36),8,'0'),1,2)
        |   || '57415645666D742010000000' || '0100' || '0100'
        |   || '803E0000' || '007D0000' || '0200' || '1000' || '64617461'
        |   || substring(lpad(hex(n*200),8,'0'),7,2) || substring(lpad(hex(n*200),8,'0'),5,2)
        |   || substring(lpad(hex(n*200),8,'0'),3,2) || substring(lpad(hex(n*200),8,'0'),1,2))
        |   || body
        | ELSE body END AS payload FROM b),
        |hx AS (SELECT doc_id, modality, octet_length(payload) AS n_bytes, hex(payload) AS h FROM p)
        |SELECT doc_id, modality, CAST(n_bytes AS BIGINT) AS n_bytes,
        | CASE WHEN modality = 'image' AND substring(h,1,16) = '89504E470D0A1A0A'
        |  THEN CAST(('0x' || substring(h,33,8)) AS INTEGER) END AS img_w,
        | CASE WHEN modality = 'image' AND substring(h,1,16) = '89504E470D0A1A0A'
        |  THEN CAST(('0x' || substring(h,41,8)) AS INTEGER) END AS img_h,
        | CASE WHEN modality = 'image' AND substring(h,1,16) = '89504E470D0A1A0A'
        |  THEN CAST(CASE substring(h,51,2) WHEN '00' THEN 1 WHEN '02' THEN 3
        |            WHEN '04' THEN 2 WHEN '06' THEN 4 END AS INTEGER) END AS img_c,
        | CASE WHEN modality = 'audio' AND substring(h,1,8) = '52494646' AND substring(h,17,16) = '57415645666D7420'
        |  THEN CAST(('0x' || substring(h,87,2) || substring(h,85,2) || substring(h,83,2) || substring(h,81,2)) AS BIGINT) * 8
        |   // (CAST(('0x' || substring(h,47,2) || substring(h,45,2)) AS BIGINT)
        |      * CAST(('0x' || substring(h,71,2) || substring(h,69,2)) AS BIGINT)) END AS audio_samples,
        | CASE WHEN modality = 'video' THEN CAST((2 * n_bytes) // 4 AS BIGINT) END AS frame2_off
        |FROM hx ORDER BY doc_id""".stripMargin
  )
}
