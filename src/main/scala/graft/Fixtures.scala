package graft

import org.apache.spark.sql.{DataFrame, Row, SparkSession}

import graft.schemas.NefSchemas

/** The reference's own test payloads (reference tests/test_receiver.py:
  * 204–471) embedded as engine fixtures — the golden inputs for the NEF
  * pipeline. See FIXTURES.md §A.
  */
object Fixtures {

  val NotifId = "test-notif-001"

  /** tests/test_receiver.py:204–221 */
  val perfDataPayload: String =
    s"""{"notifId":"$NotifId","eventNotifs":[{"event":"PERF_DATA","timeStamp":"2026-04-20T10:15:00Z",
       |"perfDataInfos":[{"ueIpAddr":{"ipv4Addr":"10.0.1.10"},"appId":"app-test",
       |"timeStamp":"2026-04-20T10:15:00Z",
       |"perfData":{"thrputUl":"11.74 Mbps","thrputDl":"87.57 Mbps","pdb":18,"plr":17}}]}]}""".stripMargin.replace("\n", "")

  /** tests/test_receiver.py:239–265 (two trajectory points) */
  val ueMobilityPayload: String =
    s"""{"notifId":"$NotifId","eventNotifs":[{"event":"UE_MOBILITY","timeStamp":"2026-04-20T10:15:00Z",
       |"ueMobilityInfos":[{"supi":"imsi-001011234567890","ueTrajs":[
       |{"ts":"2026-04-20T10:14:50Z","location":{"nrLocation":{"tai":{"plmnId":{"mcc":"001","mnc":"01"},"tac":"000001"},"ncgi":{"plmnId":{"mcc":"001","mnc":"01"},"nrCellId":"000000001"}}}},
       |{"ts":"2026-04-20T10:15:00Z","location":{"nrLocation":{"tai":{"plmnId":{"mcc":"001","mnc":"01"},"tac":"000002"},"ncgi":{"plmnId":{"mcc":"001","mnc":"01"},"nrCellId":"000000002"}}}}]}]}]}""".stripMargin.replace("\n", "")

  /** tests/test_receiver.py:278–293 */
  val ueCommPayload: String =
    s"""{"notifId":"$NotifId","eventNotifs":[{"event":"UE_COMM","timeStamp":"2026-04-20T10:15:00Z",
       |"ueCommInfos":[{"supi":"imsi-001011234567890","comms":[
       |{"startTime":"2026-04-20T10:00:00Z","endTime":"2026-04-20T10:15:00Z","ulVol":1048576,"dlVol":52428800}]}]}]}""".stripMargin.replace("\n", "")

  /** tests/test_receiver.py:306–318 — no UE id; paired with a no-context sub
    * the record must be dropped.
    */
  val noUeIdPayload: String =
    s"""{"notifId":"$NotifId","eventNotifs":[{"event":"PERF_DATA","timeStamp":"2026-04-20T10:15:00Z",
       |"perfDataInfos":[{"timeStamp":"2026-04-20T10:15:00Z","perfData":{"pdb":10}}]}]}""".stripMargin.replace("\n", "")

  /** tests/test_receiver.py:334–341 — unsupported event type is skipped. */
  val unsupportedEventPayload: String =
    s"""{"notifId":"$NotifId","eventNotifs":[{"event":"DISPERSION","timeStamp":"2026-04-20T10:15:00Z","dispersionInfos":[]}]}""".stripMargin

  /** tests/test_receiver.py:365–391 — two events in one notification. */
  val multiEventPayload: String =
    s"""{"notifId":"$NotifId","eventNotifs":[
       |{"event":"PERF_DATA","timeStamp":"2026-04-20T10:15:00Z","perfDataInfos":[{"ueIpAddr":{"ipv4Addr":"10.0.1.10"},"timeStamp":"2026-04-20T10:15:00Z","perfData":{"thrputDl":"50 Mbps"}}]},
       |{"event":"UE_MOBILITY","timeStamp":"2026-04-20T10:15:00Z","ueMobilityInfos":[{"supi":"imsi-001011234567890","ueTrajs":[{"ts":"2026-04-20T10:15:00Z","location":{}}]}]}]}""".stripMargin.replace("\n", "")

  /** tests/test_receiver.py:434–445 — empty ueTrajs still emits a record. */
  val emptyTrajsPayload: String =
    s"""{"notifId":"$NotifId","eventNotifs":[{"event":"UE_MOBILITY","timeStamp":"2026-04-20T10:15:00Z",
       |"ueMobilityInfos":[{"supi":"imsi-001011234567890","ueTrajs":[]}]}]}""".stripMargin.replace("\n", "")

  /** tests/test_receiver.py:453–460 — no UE id but context tags suffice. */
  val contextOnlyPayload: String = noUeIdPayload

  /** Notification for an unknown subscription (403 / anti-join path). */
  val unknownNotifPayload: String =
    """{"notifId":"unknown","eventNotifs":[]}"""

  def notifications(spark: SparkSession, payloads: Seq[String]): DataFrame = {
    import spark.implicits._
    Ingest.parseNotifications(payloads.toDF("value"))
  }

  /** The registered subscription context (tests/test_receiver.py:43–51). */
  def subscriptions(spark: SparkSession): DataFrame =
    spark.createDataFrame(
      java.util.Arrays.asList(
        Row(NotifId, Row(1, "000001"), "internet",
          Seq("PERF_DATA", "UE_MOBILITY"), "nef-sub-abc",
          "http://nef:8090/nnef-event-exposure/v1/subscriptions", 1000000L)),
      NefSchemas.subscription)

  /** Subscription with no snssai/dnn (tests/test_receiver.py:319–327). */
  def subscriptionsNoContext(spark: SparkSession): DataFrame =
    spark.createDataFrame(
      java.util.Arrays.asList(
        Row(NotifId, null, null, Seq("PERF_DATA"), null, null, 1000000L)),
      NefSchemas.subscription)
}
