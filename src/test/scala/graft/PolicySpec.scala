package graft

import org.apache.spark.sql.functions._

import graft.policy.Policy

/** D1/D2/F9 — the compiled policy gate (reference receiver.py:412–433;
  * README.md:10 "field filtering, hashing, redaction").
  */
class PolicySpec extends SparkSpec {

  private val FixedNow = 1700000000L

  private def envelopes(payloads: String*)(rules: Policy.Rules) = {
    val notifs = Fixtures.notifications(spark, payloads)
    Ingest.envelopes(notifs, Fixtures.subscriptions(spark), rules, now = lit(FixedNow))
  }

  private def sha256Hex(s: String): String =
    java.security.MessageDigest.getInstance("SHA-256")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  test("allowAll leaves records untouched") {
    val base = envelopes(Fixtures.perfDataPayload)(Policy.Rules.allowAll)
    assert(base.count() === 1)
    val tags = rows(base).head.getAs[org.apache.spark.sql.Row]("tags")
    assert(tags.getAs[String]("ueIpv4Addr") === "10.0.1.10")
  }

  test("deny predicate drops matching rows (D1)") {
    val rules = Policy.Rules(deny = col("event") === "UE_COMM")
    val env = envelopes(Fixtures.perfDataPayload, Fixtures.ueCommPayload)(rules)
    assert(column[String](env.select("event")) === Seq("PERF_DATA"))
  }

  test("hashTags rewrites supi to its sha2-256 hex (D2/F9)") {
    val rules = Policy.Rules(hashTags = Set("supi"))
    val env = envelopes(Fixtures.ueCommPayload)(rules)
    val tags = rows(env).head.getAs[org.apache.spark.sql.Row]("tags")
    assert(tags.getAs[String]("supi") === sha256Hex("imsi-001011234567890"))
    assert(tags.getAs[String]("dnn") === "internet") // untouched fields survive
  }

  test("redactTags masks values, null stays null") {
    val rules = Policy.Rules(redactTags = Set("dnn", "appId"))
    val env = envelopes(Fixtures.ueCommPayload)(rules)
    val tags = rows(env).head.getAs[org.apache.spark.sql.Row]("tags")
    assert(tags.getAs[String]("dnn") === "***")
    assert(tags.getAs[String]("appId") === null) // absent value NOT redacted into existence
  }

  test("dropTags nulls the field out (key-drop)") {
    val rules = Policy.Rules(dropTags = Set("ueIpv4Addr"))
    val env = envelopes(Fixtures.perfDataPayload)(rules)
    val tags = rows(env).head.getAs[org.apache.spark.sql.Row]("tags")
    assert(tags.getAs[String]("ueIpv4Addr") === null)
    assert(tags.getAs[String]("appId") === "app-test")
  }

  test("dropMetrics removes keys from the metrics map") {
    val rules = Policy.Rules(dropMetrics = Set("pdb_ms", "thrputUl_mbps"))
    val env = envelopes(Fixtures.perfDataPayload)(rules)
    val metrics = rows(env).head.getAs[Map[String, Double]]("metrics")
    assert(metrics === Map("thrputDl_mbps" -> 87.57, "plr_per_thousand" -> 17.0))
  }

  test("combined rule set (the q22 configuration)") {
    val rules = Policy.Rules(
      deny = col("event") === "UE_COMM",
      hashTags = Set("supi"),
      redactTags = Set("dnn"),
      dropMetrics = Set("pdb_ms"))
    val env = envelopes(
      Fixtures.perfDataPayload, Fixtures.ueCommPayload, Fixtures.ueMobilityPayload)(rules)
    val byEvent = rows(env).map(r => r.getAs[String]("event") -> r).toMap
    assert(byEvent.keySet === Set("PERF_DATA", "UE_MOBILITY"))
    val mob = byEvent("UE_MOBILITY").getAs[org.apache.spark.sql.Row]("tags")
    assert(mob.getAs[String]("supi") === sha256Hex("imsi-001011234567890"))
    assert(mob.getAs[String]("dnn") === "***")
    val perf = byEvent("PERF_DATA").getAs[Map[String, Double]]("metrics")
    assert(!perf.contains("pdb_ms") && perf.contains("thrputDl_mbps"))
  }

  test("q75 DP release: noise is nonzero, Laplace-bounded, and deterministic") {
    val run1 = SparkEntry.queries("q75_dp_release")(spark, "/root/testdata/sf0.001")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    assert(run1.nonEmpty)
    run1.foreach { case (g, exact, noisy) =>
      val noise = noisy - exact
      assert(noise != 0.0, s"$g: a DP release must actually perturb")
      // |Laplace(b=1)| from a 32-bit uniform is bounded by ln(2^33) ≈ 22.9
      assert(math.abs(noise) < 23.0, s"$g: noise $noise outside the Laplace bound")
    }
    val run2 = SparkEntry.queries("q75_dp_release")(spark, "/root/testdata/sf0.001")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    assert(run1.toSeq === run2.toSeq, "seeded noise must replay bit-identically")
  }

  test("q76 k-anonymity: every released group has >= k members; mass is conserved") {
    val out = SparkEntry.queries("q76_k_anon")(spark, "/root/testdata/sf0.001")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
    val (sup, rel) = out.partition(_._4)
    assert(rel.forall(_._3 >= 15L), s"released group under k: ${rel.filter(_._3 < 15L).toSeq}")
    assert(sup.length <= 1, "at most one suppressed bucket")
    sup.foreach { case (seg, nat, _, _) =>
      assert(seg == "<suppressed>" && nat == -1L, "bucket must carry no identity") }
    val total = spark.read.parquet("/root/testdata/sf0.001/customer.parquet").count()
    assert(out.map(_._3).sum === total,
      "released + suppressed mass must equal the customer count")
  }
}
