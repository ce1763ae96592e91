package graft.schemas

/** Typed view of the normalized envelope (SURVEY §1.2) — the one closed
  * shape in the engine, so it gets a case-class `Encoder` for type-safe
  * `Dataset[Envelope]` consumers (the schema-flexible NEF payload side
  * stays `DataFrame`). Field names/types mirror
  * [[graft.normalize.Normalize]]'s envelope struct exactly.
  */
case class EnvelopeTags(
    snssai_sst: Option[Int],
    snssai_sd: Option[String],
    dnn: Option[String],
    ueIpv4Addr: Option[String],
    ueIpv6Addr: Option[String],
    appId: Option[String],
    supi: Option[String],
    gpsi: Option[String],
    interGroupId: Option[String])

case class EnvelopeTrajectoryPoint(
    ts: Option[Long], tac: Option[String], nrCellId: Option[String])

case class EnvelopeCommWindow(
    startTime: Option[Long], endTime: Option[Long],
    ulVol: Option[Long], dlVol: Option[Long])

case class Envelope(
    notifId: String,
    timestamp: Long,
    event: String,
    tags: EnvelopeTags,
    metrics: Map[String, Double],
    trajectory: Option[Seq[EnvelopeTrajectoryPoint]],
    comms: Option[Seq[EnvelopeCommWindow]])
