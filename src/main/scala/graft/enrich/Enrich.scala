package graft.enrich

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.NetFunctions.truthyStr

/** B1 — the stream↔dimension lookup join.
  *
  * The reference resolves each notification against an in-memory cache of the
  * SQLite subscription table (`nf_registry.get(notif_id)`, reference
  * receiver.py:363–365, registry.py:92–95); a miss is an HTTP 403. The
  * dimension is tiny (one row per active subscription), so the Spark-native
  * shape is a broadcast hash join: no shuffle of the fact stream, and the
  * reject path is the same join with `left_anti`.
  */
object Enrich {

  /** Project the subscription dimension to the context-tag trio the data
    * plane attaches to every record (reference receiver.py:367–374):
    * `snssai_sst` kept when `is not None` (0 allowed), `snssai_sd` / `dnn`
    * only when truthy (null and "" both count as missing).
    */
  def contextTags(subscriptions: DataFrame): DataFrame =
    subscriptions.select(
      col("notif_id").as("notifId"),
      col("snssai").getField("sst").as("snssai_sst"),
      truthyStr(col("snssai").getField("sd")).as("snssai_sd"),
      truthyStr(col("dnn")).as("dnn"))

  /** Notifications with a known subscription, enriched with context tags.
    * Notifications with a null/missing notifId are rejected too (the 400
    * path, receiver.py:360–361) — an inner join on a null key matches
    * nothing, which is exactly that semantics.
    */
  def enrich(notifications: DataFrame, subscriptions: DataFrame): DataFrame =
    notifications.join(broadcast(contextTags(subscriptions)), Seq("notifId"), "inner")

  /** The 403 reject stream: notifications whose notifId is unknown
    * (anti-join path of B1).
    */
  def rejected(notifications: DataFrame, subscriptions: DataFrame): DataFrame =
    notifications.join(broadcast(contextTags(subscriptions).select("notifId")),
      Seq("notifId"), "left_anti")

  /** Validation-only variant (semi-join): the notifications that would be
    * accepted, without widening the row.
    */
  def accepted(notifications: DataFrame, subscriptions: DataFrame): DataFrame =
    notifications.join(broadcast(contextTags(subscriptions).select("notifId")),
      Seq("notifId"), "left_semi")
}
