package graft

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._

import graft.enrich.Enrich
import graft.normalize.Normalize
import graft.policy.Policy
import graft.schemas.NefSchemas

/** The end-to-end data plane (reference `POST /nef/notify`,
  * receiver.py:354–458), composed from the per-stage modules:
  *
  * raw JSON → from_json(declared schema) → broadcast-join enrich (B1) →
  * fused explode×2/normalize/tag-filter (C1–C8) → compiled policy gate
  * (D1/D2) → batch-collect JSON sink (E2/A3).
  *
  * Every stage is a `DataFrame => DataFrame`; the same composition runs in
  * batch and inside a Structured Streaming `foreachBatch`.
  */
object Ingest {

  /** Parse raw notification JSON (one document per row) into the declared
    * notification schema. Unparseable rows yield null structs and fall out
    * at the join (the reference would 400/500 them).
    */
  def parseNotifications(raw: DataFrame, jsonCol: String = "value"): DataFrame =
    raw.select(from_json(col(jsonCol).cast("string"), NefSchemas.notification).as("n"))
      .select(col("n.*"))

  /** Full pipeline to normalized envelopes. `now` is the processing-time
    * fallback clock (injectable for determinism).
    */
  def envelopes(
      notifications: DataFrame,
      subscriptions: DataFrame,
      rules: Policy.Rules = Policy.Rules.allowAll,
      now: Column = unix_timestamp(current_timestamp())): DataFrame =
    Policy(Normalize.envelopes(Enrich.enrich(notifications, subscriptions), now), rules)

  /** Pipeline to the Kafka-message shape: one JSON array per notifId. */
  def kafkaMessages(
      notifications: DataFrame,
      subscriptions: DataFrame,
      rules: Policy.Rules = Policy.Rules.allowAll,
      now: Column = unix_timestamp(current_timestamp())): DataFrame =
    sinks.Sinks.kafkaBatches(envelopes(notifications, subscriptions, rules, now))

  /** Typed view of the envelope stream — the closed output shape gets a
    * case-class Encoder (SURVEY §1.4: `Dataset[T]` where the shape is
    * closed, `DataFrame` where it is schema-flexible).
    */
  def envelopeDataset(
      notifications: DataFrame,
      subscriptions: DataFrame,
      rules: Policy.Rules = Policy.Rules.allowAll,
      now: Column = unix_timestamp(current_timestamp())): Dataset[schemas.Envelope] = {
    val df = envelopes(notifications, subscriptions, rules, now)
    import df.sparkSession.implicits._
    df.as[schemas.Envelope]
  }
}
