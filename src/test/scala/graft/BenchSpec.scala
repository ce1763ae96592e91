package graft

import org.scalatest.funsuite.AnyFunSuite
import com.fasterxml.jackson.databind.ObjectMapper

/** Pins the bench report format — specifically the r16 contention columns
  * (per-query min/spread/retries in BENCH_DETAIL.json, run-level
  * `mintotal` in both the stdout line and the sidecar) the r15 verdict
  * asked for, so the headline number stays contention-resistant BY
  * CONSTRUCTION and round-over-round comparisons never again depend on
  * prose exculpation. Pure-function tests: no SparkSession needed.
  */
class BenchSpec extends AnyFunSuite {
  private val om = new ObjectMapper()

  private def res(name: String, iters: Seq[Double], retries: Int = 0,
      err: Option[String] = None, shufBytes: Long = 1000L): Bench.QRes = {
    val sorted = iters.sorted
    val med = if (sorted.isEmpty) -1.0 else sorted(sorted.size / 2)
    Bench.QRes(name, if (err.isDefined) -1.0 else med, err, iters,
      shufBytes, shufBytes / 10, retries)
  }

  test("QRes derives min and spread from all iterations (retries included)") {
    val r = res("q01_agg", Seq(2.0, 6.0, 2.2, 2.1), retries = 1)
    assert(r.min === 2.0)
    assert(r.spread === 3.0)
    // failed-before-first-iteration record: sentinels, not exceptions
    val f = res("q02_x", Seq.empty, err = Some("AnalysisException"))
    assert(f.min === -1.0 && f.spread === -1.0)
  }

  test("reportLine carries mintotal at fixed ms precision on every " +
      "precision rung, next to calib") {
    // 400 synthetic queries force the terminal (no-queries) rung — even
    // there, mintotal must survive at ms precision (it is the number the
    // round-over-round comparison reads)
    val many = (1 to 400).map(i => f"z$i%03d_q" -> 10.0)
    val line = Bench.reportLine(many, Seq.empty, (0.4, 0.41), (0.2, 0.21),
      "/root/testdata/sf0.1", minTotal = 3999.999)
    assert(line.contains("\"mintotal\":3999.999"), line)
    val parsed = om.readTree(line)
    assert(parsed.get("mintotal").asDouble() === 3999.999)
    // and a small catalog keeps it too (ms rung)
    val small = Bench.reportLine(Seq("q01_a" -> 1.5), Seq.empty, (0.4, 0.4),
      (0.2, 0.2), "sf", minTotal = 1.234)
    assert(om.readTree(small).get("mintotal").asDouble() === 1.234)
    // pre-r16 default (no minTotal) omits the field — callers that never
    // measured mins don't emit a lying 0
    val legacy = Bench.reportLine(Seq("q01_a" -> 1.5), Seq.empty, (0.4, 0.4),
      (0.2, 0.2), "sf")
    assert(!legacy.contains("mintotal"))
  }

  test("shouldRetry: fires only on clean-but-spready timings, within both " +
      "budgets, while the host is currently quiet") {
    def go(timings: Seq[Double] = Seq(1.0, 3.5, 1.1), retries: Int = 0,
        used: Int = 0, calibNow: Double = 0.40, quiet: Double = 0.40) =
      Bench.shouldRetry(timings, spreadMax = 3.0, retries = retries,
        maxRetries = 2, retriesUsed = used, globalCap = 40,
        calibNow = calibNow, quietCalib = quiet, quietFactor = 1.5)
    assert(go()) // spread 3.5 > 3, budgets open, host quiet
    assert(!go(timings = Seq(1.0, 2.9, 1.1))) // spread under threshold
    assert(!go(retries = 2))                  // per-query budget spent
    assert(!go(used = 40))                    // global budget spent
    assert(!go(calibNow = 0.61))              // host busy: 0.61 > 1.5*0.40
    // a calibNow QUIETER than the recorded quiet floor lowers the floor
    // and passes trivially — the main loop's min-update semantics
    assert(go(calibNow = 0.20, quiet = 0.40))
    // degenerate timings never retry
    assert(!go(timings = Seq.empty) && !go(timings = Seq(0.0, 1.0)))
  }

  test("detailLine: valid JSON with per-query min/spread/retries, " +
      "run-level mintotal = sum of per-query mins, err queries flagged") {
    val rs = Seq(
      res("q01_agg", Seq(2.0, 6.0, 2.2, 2.1), retries = 1),
      res("q02_join", Seq(1.0, 1.1, 1.05)),
      res("q03_bad", Seq(0.5), err = Some("SparkException")))
    val line = Bench.detailLine(rs, iters = 3, cpus = "32",
      calib = (0.35, 0.36), calibMt = (0.2, 0.2), sfDir = "/root/testdata/sf0.1")
    val p = om.readTree(line)
    val q1 = p.get("queries").get("q01_agg")
    assert(q1.get("median").asDouble() === 2.2) // upper-median of 4
    assert(q1.get("min").asDouble() === 2.0)
    assert(q1.get("spread").asDouble() === 3.0)
    assert(q1.get("retries").asInt() === 1)
    assert(q1.get("iters").size() === 4)
    assert(q1.get("shufBytes").asLong() === 1000L)
    val q3 = p.get("queries").get("q03_bad")
    assert(q3.get("err").asText() === "SparkException")
    // mintotal/total cover only non-err queries: 2.0 + 1.0 / 2.2 + 1.05
    assert(p.get("mintotal").asDouble() === 3.0)
    assert(p.get("value").asDouble() === 3.25)
    assert(p.get("iters").asInt() === 3 && p.get("cpus").asText() === "32")
  }
}
