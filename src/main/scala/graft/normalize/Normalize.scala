package graft.normalize

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, DoubleType, IntegerType, LongType, MapType, StringType}

import graft.functions.NetFunctions._
import graft.schemas.NefSchemas

/** The reference's data plane re-expressed as ONE declarative Spark pass.
  *
  * Reference shape (receiver.py:376–389): for each `eventNotifs[]` element,
  * dispatch on `event`, iterate the matching `*Infos[]` array, normalize each
  * info into the envelope, drop records with no UE identifier. That is a
  * hand-fused explode×2 → project → filter.
  *
  * Spark-first design: instead of three filter+explode branches unioned back
  * together (which would scan the source three times), each eventNotif is
  * mapped — via the higher-order `transform` — to an array of envelope
  * structs chosen by a `CASE` on the event type, and exploded ONCE. The
  * whole pipeline stays inside a single whole-stage-codegen span with no
  * shuffle and no repeated scan; unsupported event types (C2) fall out for
  * free because their CASE branch is null and `explode` drops null arrays.
  *
  * Inputs are *enriched* notifications: columns `notifId, eventNotifs` plus
  * the subscription context tags `snssai_sst, snssai_sd, dnn` (see
  * [[graft.enrich.Enrich]]). `now` is the processing-time fallback clock —
  * injectable so tests and declared queries stay deterministic.
  */
object Normalize {

  val SupportedEvents: Seq[String] = Seq("PERF_DATA", "UE_MOBILITY", "UE_COMM")

  private val nullTrajectory = lit(null).cast(ArrayType(NefSchemas.trajectoryPoint))
  private val nullComms = lit(null).cast(ArrayType(NefSchemas.commWindow))
  private val emptyMetrics = typedLit(Map.empty[String, Double])

  /** Context-tag column trio carried alongside each notification. */
  case class Ctx(sst: Column, sd: Column, dnn: Column)

  private def tagsStruct(
      ctx: Ctx,
      ueIpv4Addr: Column = lit(null).cast(StringType),
      ueIpv6Addr: Column = lit(null).cast(StringType),
      appId: Column = lit(null).cast(StringType),
      supi: Column = lit(null).cast(StringType),
      gpsi: Column = lit(null).cast(StringType),
      interGroupId: Column = lit(null).cast(StringType)): Column =
    struct(
      ctx.sst.cast(IntegerType).as("snssai_sst"),
      ctx.sd.cast(StringType).as("snssai_sd"),
      ctx.dnn.cast(StringType).as("dnn"),
      ueIpv4Addr.as("ueIpv4Addr"), ueIpv6Addr.as("ueIpv6Addr"),
      appId.as("appId"), supi.as("supi"), gpsi.as("gpsi"),
      interGroupId.as("interGroupId"))

  private def envelope(notifId: Column, timestamp: Column, event: String,
      tags: Column, metrics: Column, trajectory: Column, comms: Column): Column =
    struct(
      notifId.as("notifId"),
      timestamp.cast(LongType).as("timestamp"),
      lit(event).as("event"),
      tags.as("tags"),
      metrics.cast(MapType(StringType, DoubleType)).as("metrics"),
      trajectory.as("trajectory"),
      comms.as("comms"))

  /** `timeStamp`-string handling shared by all branches: parse only when the
    * string is truthy (reference: `parse(ts) if ts else now`), then apply the
    * `timestamp or now` double-fallback (reference receiver.py:128–131).
    */
  private def parsedTsOrNow(tsStr: Column, now: Column): Column =
    tsOrNow(parseDatetimeToUnix(truthyStr(tsStr)), now)

  // ── PERF_DATA (reference receiver.py:89–135, C3) ──

  /** The 6 bitrate-string metrics and 8 integer delay/loss metrics with their
    * output names (reference receiver.py:106–125).
    */
  val BitrateMetrics: Seq[(String, String)] = Seq(
    "thrputUl" -> "thrputUl_mbps", "thrputDl" -> "thrputDl_mbps",
    "maxThrputUl" -> "maxThrputUl_mbps", "minThrputUl" -> "minThrputUl_mbps",
    "maxThrputDl" -> "maxThrputDl_mbps", "minThrputDl" -> "minThrputDl_mbps")

  val IntMetrics: Seq[(String, String)] = Seq(
    "pdb" -> "pdb_ms", "pdbDl" -> "pdbDl_ms",
    "maxPdbUl" -> "maxPdbUl_ms", "maxPdbDl" -> "maxPdbDl_ms",
    "plr" -> "plr_per_thousand", "plrDl" -> "plrDl_per_thousand",
    "maxPlrUl" -> "maxPlrUl_per_thousand", "maxPlrDl" -> "maxPlrDl_per_thousand")

  def perfEnvelope(notifId: Column, info: Column, ctx: Ctx, now: Column,
      parseBitrate: Column => Column = parseBitrateMbps): Column = {
    val ueIp = info.getField("ueIpAddr")
    val ipv4 = truthyStr(ueIp.getField("ipv4Addr"))
    // elif: ipv6 only when ipv4 is NOT truthy (receiver.py:92–95)
    val ipv6 = when(ipv4.isNull, truthyStr(ueIp.getField("ipv6Addr")))
    val perf = info.getField("perfData")
    // A metric key exists only when the source field was present AND parsed
    // (C8 absent-vs-null): build the full map, then drop null values.
    val entries: Seq[Column] =
      BitrateMetrics.flatMap { case (src, dst) =>
        Seq(lit(dst), parseBitrate(perf.getField(src)))
      } ++ IntMetrics.flatMap { case (src, dst) =>
        // int(val) semantics (receiver.py:125) — documented deviations: the
        // reference's int() RAISES (HTTP 500) on any non-integer STRING,
        // including decimal ("17.8") and scientific ("1e3") literals; this
        // double-cast accepts all numeric strings (truncating toward zero:
        // "17.8" → 17, "1e3" → 1000) and turns unparseable garbage into an
        // absent key instead of a request failure. JSON *numbers* behave
        // identically in both (17.8 → 17).
        Seq(lit(dst), perf.getField(src).cast(DoubleType).cast(LongType).cast(DoubleType))
      }
    val metrics = map_filter(map(entries: _*), (_, v) => v.isNotNull)
    envelope(
      notifId,
      parsedTsOrNow(info.getField("timeStamp"), now),
      "PERF_DATA",
      tagsStruct(ctx, ueIpv4Addr = ipv4, ueIpv6Addr = ipv6,
        appId = truthyStr(info.getField("appId"))),
      metrics, nullTrajectory, nullComms)
  }

  // ── UE_MOBILITY (reference receiver.py:138–165, C4) ──

  def mobilityEnvelope(notifId: Column, info: Column, ctx: Ctx, now: Column): Column = {
    val trajectory = transform(coalesce(info.getField("ueTrajs"),
        array().cast(ArrayType(NefSchemas.ueTraj))), { t =>
      val nr = t.getField("location").getField("nrLocation")
      struct(
        parseDatetimeToUnix(truthyStr(t.getField("ts"))).as("ts"),
        nr.getField("tai").getField("tac").as("tac"),
        nr.getField("ncgi").getField("nrCellId").as("nrCellId"))
    })
    // record ts := trajectory[0].ts when trajectory nonempty and ts truthy
    // (0 is falsy too — receiver.py:158), else now
    val first = element_at(trajectory, 1).getField("ts")
    envelope(
      notifId,
      tsOrNow(when(size(trajectory) > 0, first), now),
      "UE_MOBILITY",
      tagsStruct(ctx,
        supi = truthyStr(info.getField("supi")),
        gpsi = truthyStr(info.getField("gpsi"))),
      emptyMetrics, trajectory, nullComms)
  }

  // ── UE_COMM (reference receiver.py:168–196, C5) ──

  def commEnvelope(notifId: Column, info: Column, ctx: Ctx, now: Column): Column = {
    val comms = transform(coalesce(info.getField("comms"),
        array().cast(ArrayType(NefSchemas.comm))), { c =>
      struct(
        parseDatetimeToUnix(truthyStr(c.getField("startTime"))).as("startTime"),
        parseDatetimeToUnix(truthyStr(c.getField("endTime"))).as("endTime"),
        c.getField("ulVol").cast(LongType).as("ulVol"),
        c.getField("dlVol").cast(LongType).as("dlVol"))
    })
    val firstEnd = element_at(comms, 1).getField("endTime")
    envelope(
      notifId,
      tsOrNow(when(size(comms) > 0, firstEnd), now),
      "UE_COMM",
      tagsStruct(ctx,
        supi = truthyStr(info.getField("supi")),
        interGroupId = truthyStr(info.getField("interGroupId")),
        gpsi = truthyStr(info.getField("gpsi"))),
      emptyMetrics, nullTrajectory, comms)
  }

  /** C6: the reference drops a record whose tags dict ended up empty
    * (receiver.py:100–101, 146–147, 177–178). All tag fields were built with
    * truthiness applied, so "empty dict" ⇔ all nine struct fields null.
    */
  def hasAnyTag(tags: Column): Column =
    coalesce(
      tags.getField("snssai_sst").cast(StringType),
      tags.getField("snssai_sd"), tags.getField("dnn"),
      tags.getField("ueIpv4Addr"), tags.getField("ueIpv6Addr"),
      tags.getField("appId"), tags.getField("supi"),
      tags.getField("gpsi"), tags.getField("interGroupId")).isNotNull

  /** explode(eventNotifs) → CASE-dispatched per-info envelope transform →
    * explode — unsupported events (C2) fall out because their CASE branch is
    * null and `explode` drops null/empty arrays.
    */
  private def explodedEnvelopes(enriched: DataFrame, now: Column): DataFrame = {
    val ctx = Ctx(col("snssai_sst"), col("snssai_sd"), col("dnn"))
    val en = col("en")
    // the fused native bitrate parser (one compiled-regex pass per metric
    // field, value-identical — NetFunctionsSpec) when registered; this is
    // the hottest per-row expression of the ingest path
    val parseBitrate: Column => Column =
      if (enriched.sparkSession.catalog.functionExists("parse_bitrate_mbps"))
        c => call_function("parse_bitrate_mbps", c.cast(StringType))
      else parseBitrateMbps
    // null ELEMENTS inside an infos array drop before the envelope build:
    // a null info would otherwise fabricate a context-tags-only record
    // (the subscription ctx alone passes hasAnyTag). The reference 500s
    // the whole request on a null info (`None.get` AttributeError,
    // receiver.py:384–385); the engine's documented per-record resilience
    // keeps the SIBLING records and drops only the null element — same
    // deviation class as the malformed-line DLQ split. Null elements in
    // eventNotifs itself already fall out (null `en` → null CASE → null
    // array → explode drops). PipelineSpec pins all three shapes.
    def infos(field: String): Column =
      filter(en.getField(field), i => i.isNotNull)
    val recArray =
      when(en.getField("event") === "PERF_DATA",
        transform(infos("perfDataInfos"),
          i => perfEnvelope(col("notifId"), i, ctx, now, parseBitrate)))
      .when(en.getField("event") === "UE_MOBILITY",
        transform(infos("ueMobilityInfos"),
          i => mobilityEnvelope(col("notifId"), i, ctx, now)))
      .when(en.getField("event") === "UE_COMM",
        transform(infos("ueCommInfos"),
          i => commEnvelope(col("notifId"), i, ctx, now)))
    enriched
      .select(col("notifId"), col("snssai_sst"), col("snssai_sd"), col("dnn"),
        explode(col("eventNotifs")).as("en"))
      .select(explode(recArray).as("rec"))
      .select(col("rec.*"))
  }

  /** The fused single-pass data plane: enriched notifications in, flat
    * normalized envelope out. One scan, zero shuffles, one codegen span.
    */
  def envelopes(enriched: DataFrame, now: Column): DataFrame =
    explodedEnvelopes(enriched, now).where(hasAnyTag(col("tags")))

  /** The complement of C6 — records the reference would log as
    * "Dropped ...: no UE identifier". Exposed for observability parity.
    */
  def droppedNoUeId(enriched: DataFrame, now: Column): DataFrame =
    explodedEnvelopes(enriched, now).where(!hasAnyTag(col("tags")))
}
