package graft

import org.apache.spark.sql.functions._

import graft.functions.NetFunctions

/** F1/F2 parser goldens, ported exactly from the reference's pure-function
  * unit tests (reference tests/test_receiver.py:61–102): every bitrate unit
  * bps→Tbps, invalid and missing-unit inputs, and the UTC-Z /
  * explicit-offset / non-UTC / invalid datetime cases including the
  * 1776680100 golden. Plus seeded generative round-trips (plain ScalaCheck-
  * style generation without the scalatest bridge, which is not on the
  * offline classpath).
  */
class NetFunctionsSpec extends SparkSpec {
  import spark.implicits._

  /** Vectorized evaluation: one job for a whole case table. */
  private def parseBitrateAll(inputs: Seq[String]): Seq[Option[Double]] =
    inputs.toDF("v").repartition(1)
      .select(NetFunctions.parseBitrateMbps(col("v")).as("r"))
      .collect().map(r => if (r.isNullAt(0)) None else Some(r.getDouble(0))).toSeq

  private def parseDtAll(inputs: Seq[String]): Seq[Option[Long]] =
    inputs.toDF("v").repartition(1)
      .select(NetFunctions.parseDatetimeToUnix(col("v")).as("r"))
      .collect().map(r => if (r.isNullAt(0)) None else Some(r.getLong(0))).toSeq

  // ── reference tests/test_receiver.py:61–81 (bitrate) ──

  test("bitrate goldens: every unit, whitespace, rejects") {
    val cases: Seq[(String, Option[Double])] = Seq(
      "48.57 Mbps" -> Some(48.57),
      "500 bps" -> Some(0.0005),
      "1000 Kbps" -> Some(1.0),
      "1.5 Gbps" -> Some(1500.0),
      "0.5 Tbps" -> Some(500000.0),
      "100 Mbps" -> Some(100.0),
      "48.57Mbps" -> Some(48.57), //   \s* between number and unit
      "  48.57 Mbps  " -> Some(48.57), // .strip() tolerance
      "123 bps" -> Some(0.000123), // 6-dp rounding
      "100" -> None, // bare number — reference rejects (receiver.py:70)
      "100 Pbps" -> None,
      "fast" -> None,
      "" -> None,
      "Mbps" -> None,
      "-5 Mbps" -> None) // regex anchors on digits
    val got = parseBitrateAll(cases.map(_._1))
    cases.zip(got).foreach { case ((in, expected), actual) =>
      assert(actual === expected, s"input '$in'")
    }
  }

  // ── reference tests/test_receiver.py:84–102 (datetime) ──

  test("datetime goldens: Z, offsets, invalids") {
    val cases: Seq[(String, Option[Long])] = Seq(
      "2026-04-20T10:15:00Z" -> Some(1776680100L), // the reference's exact golden
      "2026-04-20T10:15:00+00:00" -> Some(1776680100L),
      "2026-04-20T12:15:00+02:00" -> Some(1776680100L), // non-UTC offset converts
      "2026-04-20T10:14:50Z" -> Some(1776680090L), // trajectory golden
      "1970-01-01T00:00:00Z" -> Some(0L),
      "not-a-date" -> None,
      "" -> None)
    val got = parseDtAll(cases.map(_._1))
    cases.zip(got).foreach { case ((in, expected), actual) =>
      assert(actual === expected, s"input '$in'")
    }
  }

  // ── generative round-trips (seeded, deterministic) ──

  private val unitFactors = Map(
    "bps" -> 1e-6, "Kbps" -> 1e-3, "Mbps" -> 1.0, "Gbps" -> 1e3, "Tbps" -> 1e6)

  test("bitrate property: 200 random value×unit combos round(v·f, 6)") {
    val rnd = new scala.util.Random(20260812L)
    val units = unitFactors.keys.toIndexedSeq
    val cases = Seq.fill(200) {
      val num = s"${rnd.nextInt(100000)}.${rnd.nextInt(100)}"
      val unit = units(rnd.nextInt(units.size))
      (s"$num $unit", num, unit)
    }
    val got = parseBitrateAll(cases.map(_._1))
    cases.zip(got).foreach { case ((in, num, unit), actual) =>
      // Spark's Round(double) is BigDecimal.valueOf(d).setScale(6, HALF_UP)
      val expected = BigDecimal(num.toDouble * unitFactors(unit))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(actual === Some(expected), s"input '$in'")
    }
  }

  test("datetime property: 200 random epochs round-trip through ISO") {
    val rnd = new scala.util.Random(42L)
    val epochs = Seq.fill(200)(math.abs(rnd.nextLong()) % 4102444800L)
    val isos = epochs.map(e => java.time.Instant.ofEpochSecond(e).toString)
    val got = parseDtAll(isos)
    epochs.zip(got).zip(isos).foreach { case ((e, actual), iso) =>
      assert(actual === Some(e), s"input '$iso'")
    }
  }

  test("native parse_bitrate_mbps ≡ declarative parser (goldens + 500 generative + trim edge)") {
    assert(spark.catalog.functionExists("parse_bitrate_mbps"))
    val rnd = new scala.util.Random(7L)
    val units = unitFactors.keys.toIndexedSeq
    val inputs = Seq(
      "48.57 Mbps", "500 bps", "1000 Kbps", "1.5 Gbps", "0.5 Tbps", "48.57Mbps",
      "  48.57 Mbps  ", "100", "100 Pbps", "fast", "", "Mbps", "-5 Mbps",
      "\t48 Mbps", // tab prefix: Spark trim keeps it → unparseable on BOTH paths
      "48 Mbps\n") ++
      Seq.fill(500)(s"${rnd.nextInt(100000)}.${rnd.nextInt(100)} ${units(rnd.nextInt(units.size))}")
    // carry the input through the row so a failure names the RIGHT case
    // (collect order after repartition is not guaranteed to match the Seq)
    val both = inputs.toDF("v").repartition(1).select(
      col("v"),
      call_function("parse_bitrate_mbps", col("v")).as("native"),
      NetFunctions.parseBitrateMbps(col("v")).as("declarative")).collect()
    assert(both.length === inputs.length)
    both.foreach { r =>
      val n = if (r.isNullAt(1)) None else Some(r.getDouble(1))
      val d = if (r.isNullAt(2)) None else Some(r.getDouble(2))
      assert(n === d, s"input '${r.getString(0)}'")
    }
  }

  test("truthyStr: null and empty are missing, content passes") {
    val df = Seq(Some("x"), Some(""), None).toDF("v")
      .select(NetFunctions.truthyStr(col("v")).as("r"))
    assert(df.collect().map(r => Option(r.getString(0))).toSeq ===
      Seq(Some("x"), None, None))
  }

  test("tsOrNow: null and zero fall back, values pass") {
    val df = Seq[(java.lang.Long, Long)]((5L, 99L), (0L, 99L), (null, 99L)).toDF("ts", "now")
      .select(NetFunctions.tsOrNow(col("ts"), col("now")).as("r"))
    assert(df.collect().map(_.getLong(0)).toSeq === Seq(5L, 99L, 99L))
  }
}
