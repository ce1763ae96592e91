package graft.schemas

import org.apache.spark.sql.types._

/** Declared StructTypes for the three NEF event-exposure payload shapes and
  * the normalized output envelope.
  *
  * The reference is schema-on-read (python dicts, defensive `.get()`s —
  * reference receiver.py:89–196); the engine declares the closed shapes the
  * reference actually reads so Catalyst can prune nested fields at the scan.
  * Field inventory: reference receiver.py:39–43 (tags), 92–125 (PERF_DATA),
  * 138–165 (UE_MOBILITY), 168–196 (UE_COMM), 199–203 (dispatch table).
  */
object NefSchemas {

  // ── Input payload shapes (TS 29.591 NefEventExposureNotif subset) ──

  private val plmnId = StructType(Seq(
    StructField("mcc", StringType),
    StructField("mnc", StringType)))

  val tai: StructType = StructType(Seq(
    StructField("plmnId", plmnId),
    StructField("tac", StringType)))

  val ncgi: StructType = StructType(Seq(
    StructField("plmnId", plmnId),
    StructField("nrCellId", StringType)))

  val nrLocation: StructType = StructType(Seq(
    StructField("tai", tai),
    StructField("ncgi", ncgi)))

  val location: StructType = StructType(Seq(
    StructField("nrLocation", nrLocation)))

  /** perfData block — 6 bitrate strings + 8 integer delay/loss fields
    * (reference receiver.py:106–125). Bitrates arrive as 3GPP BitRate
    * strings ("48.57 Mbps") or bare numbers (str()-coerced, receiver.py:113)
    * so the declared type is String.
    *
    * The pdb/plr fields are Strings too, NOT Longs: the reference applies
    * bare `int(val)` (receiver.py:125), which accepts JSON strings ("18")
    * and truncates floats (17.8 → 17). Declaring LongType would silently
    * null those via from_json coercion; reading the raw token text and
    * casting with truncation downstream (Normalize.perfEnvelope) keeps
    * parity. Documented deviation: garbage input raises in the reference
    * (HTTP 500 — the whole request dies) but yields an absent metric key
    * here.
    */
  val perfData: StructType = StructType(Seq(
    StructField("thrputUl", StringType), StructField("thrputDl", StringType),
    StructField("maxThrputUl", StringType), StructField("minThrputUl", StringType),
    StructField("maxThrputDl", StringType), StructField("minThrputDl", StringType),
    StructField("pdb", StringType), StructField("pdbDl", StringType),
    StructField("maxPdbUl", StringType), StructField("maxPdbDl", StringType),
    StructField("plr", StringType), StructField("plrDl", StringType),
    StructField("maxPlrUl", StringType), StructField("maxPlrDl", StringType)))

  val perfDataInfo: StructType = StructType(Seq(
    StructField("ueIpAddr", StructType(Seq(
      StructField("ipv4Addr", StringType),
      StructField("ipv6Addr", StringType)))),
    StructField("appId", StringType),
    StructField("timeStamp", StringType),
    StructField("perfData", perfData)))

  val ueTraj: StructType = StructType(Seq(
    StructField("ts", StringType),
    StructField("location", location)))

  val ueMobilityInfo: StructType = StructType(Seq(
    StructField("supi", StringType),
    StructField("gpsi", StringType),
    StructField("ueTrajs", ArrayType(ueTraj))))

  val comm: StructType = StructType(Seq(
    StructField("startTime", StringType),
    StructField("endTime", StringType),
    StructField("ulVol", LongType),
    StructField("dlVol", LongType)))

  val ueCommInfo: StructType = StructType(Seq(
    StructField("supi", StringType),
    StructField("interGroupId", StringType),
    StructField("gpsi", StringType),
    StructField("comms", ArrayType(comm))))

  val eventNotif: StructType = StructType(Seq(
    StructField("event", StringType),
    StructField("perfDataInfos", ArrayType(perfDataInfo)),
    StructField("ueMobilityInfos", ArrayType(ueMobilityInfo)),
    StructField("ueCommInfos", ArrayType(ueCommInfo))))

  /** Top-level `POST /nef/notify` body (reference receiver.py:354–389). */
  val notification: StructType = StructType(Seq(
    StructField("notifId", StringType),
    StructField("eventNotifs", ArrayType(eventNotif))))

  // ── Subscription dimension (reference registry.py:9–19) ──

  val snssai: StructType = StructType(Seq(
    StructField("sst", IntegerType),
    StructField("sd", StringType)))

  val subscription: StructType = StructType(Seq(
    StructField("notif_id", StringType),
    StructField("snssai", snssai),
    StructField("dnn", StringType),
    StructField("events", ArrayType(StringType)),
    StructField("nef_sub_id", StringType),
    StructField("nef_url", StringType),
    StructField("created_at", LongType)))

  // ── Normalized output envelope (reference receiver.py:130–135 et al.) ──

  /** Closed tag universe (reference receiver.py:39–43). Heterogeneous value
    * types (sst is int, rest str) → flat nullable struct, not a map.
    * A key "absent" in the reference's dict ⇔ the field is null here; the
    * JSON sink drops nulls (`to_json` ignoreNullFields) restoring parity.
    */
  val tags: StructType = StructType(Seq(
    StructField("snssai_sst", IntegerType),
    StructField("snssai_sd", StringType),
    StructField("dnn", StringType),
    StructField("ueIpv4Addr", StringType),
    StructField("ueIpv6Addr", StringType),
    StructField("appId", StringType),
    StructField("supi", StringType),
    StructField("gpsi", StringType),
    StructField("interGroupId", StringType)))

  val trajectoryPoint: StructType = StructType(Seq(
    StructField("ts", LongType),
    StructField("tac", StringType),
    StructField("nrCellId", StringType)))

  val commWindow: StructType = StructType(Seq(
    StructField("startTime", LongType),
    StructField("endTime", LongType),
    StructField("ulVol", LongType),
    StructField("dlVol", LongType)))

  /** The engine's central record type. Scalar metrics ride in a
    * MapType (keys present only when parsed — C8 absent-vs-null semantics);
    * the two nested-array payloads get their own typed columns.
    */
  val envelope: StructType = StructType(Seq(
    StructField("notifId", StringType),
    StructField("timestamp", LongType),
    StructField("event", StringType),
    StructField("tags", tags),
    StructField("metrics", MapType(StringType, DoubleType)),
    StructField("trajectory", ArrayType(trajectoryPoint)),
    StructField("comms", ArrayType(commWindow))))
}
