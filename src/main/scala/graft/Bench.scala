package graft
import org.apache.spark.sql.SparkSession
import scala.util.control.NonFatal
/** Benchmark main: runs the SparkEntry catalog on SPARK_GRAFT_SF_DIR and
  * prints one JSON line. Session semantics come from [[GraftSession]].
  * Methodology (round-2/3 postmortems):
  *  - queries run in sorted-name order so round-over-round timings are
  *    attributable (Map iteration order made warmup land on random queries);
  *  - results are materialized through the `noop` datasource, which consumes
  *    every row of the final plan — `count()` let Catalyst drop top-level
  *    sorts and prune projections, under-measuring result production;
  *  - one UNTIMED warmup pass runs first (JMH-style): single-JVM timings
  *    otherwise charge whole-stage-codegen compilation and C2 JIT of the
  *    vectorized scan/agg paths to whichever query runs first (round-3: q01
  *    cold 9.3 s vs 1.8 s steady-state). Operator-internal persists from the
  *    warmup are dropped (`clearCache`) so timed runs are JIT-warm but
  *    cache-cold;
  *  - each query is timed over THREE iterations (cache-cold each, see
  *    below) and the MEDIAN is reported (round-5/6 postmortems: single
  *    iterations produced 2× phantom deltas on unchanged code — one GC
  *    pause or JIT recompilation landing on a random query per run is the
  *    dominant term at this timescale; the median of 3 rejects a single
  *    outlier iteration). Per-iteration seconds go to stderr for manual
  *    spread inspection;
  *  - failures are reported structurally in a "failed" object (and the query
  *    is excluded from "queries"/total) instead of a -1 timing.
  * Optional args = query-name filter (local iteration; driver passes none).
  */
object Bench {
  /** Fixed single-threaded CPU workload, timed. Run before and after the
    * query loop; the pair is emitted as `"calib":[pre,post]` in the JSON
    * line. Purpose: the round-8 artifact read 1.87× of round 7 purely from
    * sandbox host contention during the driver's run — with no fixed-work
    * reference in the artifact, load inflation is indistinguishable from a
    * code regression. The workload (32 passes of a byte-mixing scan over a
    * fixed 8 MiB buffer, ~0.2-0.5 s idle) does constant work regardless of
    * the engine, so `calib` scales only with host contention: normalize a
    * round's total by `mean(calib_rN)/mean(calib_baseline)` before comparing
    * against the 2× gate (documented in README).
    */
  private def calibrate(): Double = {
    val buf = new Array[Byte](8 << 20)
    var i = 0
    while (i < buf.length) { buf(i) = (i * 31 + (i >> 11)).toByte; i += 1 }
    var h = 1125899906842597L
    def pass(): Unit = {
      var j = 0
      while (j < buf.length) { h = h * 6364136223846793005L + buf(j); j += 1 }
    }
    pass() // untimed JIT warm pass so the first timed calib isn't C2-cold
    val t0 = System.nanoTime()
    var p = 0
    while (p < 32) { pass(); p += 1 }
    val sec = (System.nanoTime() - t0) / 1e9
    if (h == 42L) System.err.println("calib sink") // keep the loop live
    sec
  }

  /** All-cores companion to [[calibrate]], emitted as `"calibmt":[pre,post]`.
    * The single-thread calib has a measured blind spot: this sandbox shows
    * windows where one busy thread runs at full speed while a 32-thread
    * Spark stage's task threads report up to 60× the executor-CPU of an
    * idle-window run of the SAME jar on the SAME data (round-9 probes:
    * 159 → 9725 cpu-s for one fixed pipeline, calib flat at ~0.3 s, guest
    * steal 0%) — i.e. the host throttles multi-core occupancy specifically.
    * This workload is the same byte-mix pass run on every core at once
    * (8 passes per thread, own buffer, latch-aligned start; idle ≈ 0.1 s
    * wall), so its inflation tracks exactly the contention mode that
    * distorts query timings and the single-thread calib cannot see.
    */
  private def calibrateMt(): Double = {
    val n = Runtime.getRuntime.availableProcessors()
    val ready = new java.util.concurrent.CountDownLatch(n)
    val start = new java.util.concurrent.CountDownLatch(1)
    val done = new java.util.concurrent.CountDownLatch(n)
    val sink = new java.util.concurrent.atomic.AtomicLong
    val ts = (0 until n).map { _ =>
      val t = new Thread(() => {
        val buf = new Array[Byte](8 << 20)
        var i = 0
        while (i < buf.length) { buf(i) = (i * 31 + (i >> 11)).toByte; i += 1 }
        var h = 1125899906842597L
        def pass(): Unit = {
          var j = 0
          while (j < buf.length) { h = h * 6364136223846793005L + buf(j); j += 1 }
        }
        pass()
        ready.countDown(); start.await()
        var p = 0
        while (p < 8) { pass(); p += 1 }
        sink.addAndGet(h)
        done.countDown()
      })
      t.setDaemon(true); t.start(); t
    }
    ready.await()
    val t0 = System.nanoTime()
    start.countDown()
    done.await()
    val sec = (System.nanoTime() - t0) / 1e9
    ts.foreach(_.join())
    if (sink.get == 42L) System.err.println("calibmt sink") // keep loops live
    sec
  }

  /** Full JSON string escape (backslash, quote, control chars) — sfDir is
    * environment-provided and must not be able to corrupt the one-line
    * contract the driver parses.
    */
  private def j(s: String): String = "\"" + s.flatMap {
    case '"'  => "\\\""
    case '\\' => "\\\\"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  } + "\""

  /** The one-line report, built pure so its byte budget is testable. The
    * driver keeps only the LAST 2000 bytes of output and parses the JSON
    * line out of that window (sharing it with sbt's ~75-byte epilogue) —
    * ms precision normally, falling back to 10 ms precision if the line
    * would crowd the window (e.g. many queries all above 10 s): a
    * slightly coarser timing beats an unparseable report (rounds 1-8).
    * Locale.ROOT throughout: the default locale could emit comma
    * decimals, which is invalid JSON.
    */
  /** Report key for a catalog query: the `q01`/`d15`/`t09`-style prefix
    * before the first underscore — unique across the catalog (asserted in
    * OperatorsSpec), and ~15 bytes shorter per query than the full name,
    * which is what keeps 70+ queries at full ms precision inside the
    * driver's tail window. Falls back to the full name if a prefix ever
    * collides (two colliding keys would otherwise silently merge in the
    * report map).
    */
  private[graft] def reportKeys(names: Seq[String]): Map[String, String] = {
    // leading zeros in the numeric suffix carry no information and cost
    // one byte per entry across half the catalog (q01→q1 is unambiguous:
    // the numeric VALUE is injective, so q1/q10 never collide) — at 179
    // queries those ~50 bytes are the difference between fitting the
    // driver's tail window and not
    val zeroless = "^([a-z]+)0+([1-9].*)$".r
    val short = names.map { n =>
      n -> (n.takeWhile(_ != '_') match {
        case zeroless(alpha, num) => alpha + num
        case s => s
      })
    }.toMap
    val counts = short.values.groupBy(identity).view.mapValues(_.size).toMap
    short.map { case (full, s) => full -> (if (counts(s) == 1) s else full) }
  }

  private[graft] def reportLine(ok: Seq[(String, Double)],
      failed: Seq[(String, String)], calib: (Double, Double),
      calibMt: (Double, Double), sfDir: String,
      minTotal: Double = -1.0): String = {
    val keys = reportKeys(ok.map(_._1) ++ failed.map(_._1))
    def ms(v: Double): String = "%.3f".formatLocal(java.util.Locale.ROOT, v)
    def build(fmt: String, withQueries: Boolean): String = {
      def d(v: Double): String = fmt.formatLocal(java.util.Locale.ROOT, v)
      val qs =
        if (withQueries) ok.map { case (k, v) => s"${j(keys(k))}:${d(v)}" }.mkString("{", ",", "}")
        else "{}"
      // `failed` is omitted when empty — 12 bytes the common all-green
      // case should not spend; calib/calibmt are ALWAYS ms precision
      // regardless of the per-query rung (they are ~0.4 s by design, so
      // any coarser rung rounds them to 0 and the machine-state
      // normalizer README documents becomes unreadable — the r12 bug)
      val fl = if (failed.isEmpty) ""
        else failed.map { case (k, e) => s"${j(keys(k))}:${j(e)}" }
          .mkString(""","failed":{""", ",", "}")
      val total = ok.map(_._2).sum
      // mintotal = sum of per-query MIN iterations: the contention-
      // resistant headline (a noisy-neighbor burst inflates medians but
      // rarely all iterations of a query; r15 postmortem — shared-catalog
      // medians read 1.15× while min-of-iters read 1.02×). Always ms
      // precision, same rationale as calib; per-query mins live in
      // BENCH_DETAIL.json where the byte budget does not apply.
      val mt = if (minTotal >= 0) s""","mintotal":${ms(minTotal)}""" else ""
      s"""{"metric":"total","value":${ms(total)},"unit":"sec"$mt,"queries":$qs$fl,"calib":[${ms(calib._1)},${ms(calib._2)}],"calibmt":[${ms(calibMt._1)},${ms(calibMt._2)}],"sf":${j(sfDir)}}"""
    }
    // precision ladder: ms → 10 ms → 100 ms → 1 s → no per-query map.
    // Each step trades per-query precision for staying inside the
    // driver's 2000-byte tail window — a slightly coarser timing beats
    // an unparseable report, and the last rung guarantees a parseable
    // line at ANY catalog size (full ms-precision per-query timings are
    // persisted to BENCH_DETAIL.json by main regardless of the rung, so
    // nothing is lost to the ladder).
    Seq("%.3f", "%.2f", "%.1f", "%.0f").map(build(_, withQueries = true))
      .find(_.length <= 1890)
      .getOrElse(build("%.0f", withQueries = false))
  }

  /** One query's measured record — the unit BENCH_DETAIL.json serializes
    * (kept as a case class so [[detailLine]] is pure and BenchSpec can pin
    * the sidecar format without running Spark). `iters` holds EVERY
    * successful timed iteration including contention retries; `median`
    * and min are derived over all of them.
    */
  private[graft] final case class QRes(name: String, median: Double,
      err: Option[String], iters: Seq[Double], shufBytes: Long,
      shufRecords: Long, retries: Int) {
    def min: Double = if (iters.isEmpty) -1.0 else iters.min
    // max/min iteration ratio: >~3 flags a contention-struck query (the
    // r15 noisy-neighbor signature: one iteration 3-10x its siblings with
    // identical shuffle bytes)
    def spread: Double = if (iters.isEmpty || iters.min <= 0) -1.0
      else iters.max / iters.min
  }

  /** The BENCH_DETAIL.json sidecar, built pure. Adds the r16 contention
    * columns: per-query `min`, `spread` (max/min over iterations) and
    * `retries` (extra calib-gated iterations taken), plus the run-level
    * `mintotal` — so round-over-round comparisons can read the
    * contention-resistant number directly instead of recomputing it from
    * raw iterations (the r15 exculpation lived in prose).
    */
  private[graft] def detailLine(results: Seq[QRes], iters: Int, cpus: String,
      calib: (Double, Double), calibMt: (Double, Double),
      sfDir: String): String = {
    def ms(v: Double): String = "%.3f".formatLocal(java.util.Locale.ROOT, v)
    def arr(ts: Seq[Double]) = ts.map(ms).mkString("[", ",", "]")
    val qs = results.sortBy(_.name).map { r =>
      // -1 shuffle = no successful iteration measured a receipt; omitted
      val shuf = if (r.shufBytes >= 0L)
        s""","shufBytes":${r.shufBytes},"shufRecords":${r.shufRecords}""" else ""
      val contention = if (r.iters.isEmpty) ""
        else s""","min":${ms(r.min)},"spread":${"%.2f".formatLocal(java.util.Locale.ROOT, r.spread)},"retries":${r.retries}"""
      s"""${j(r.name)}:{"median":${ms(r.median)},"iters":${arr(r.iters)}$contention$shuf${r.err.map(e => s""","err":${j(e)}""").getOrElse("")}}"""
    }.mkString("{", ",", "}")
    val okRes = results.filter(_.err.isEmpty)
    val total = ms(okRes.map(_.median).sum)
    val minTotal = ms(okRes.map(_.min).sum)
    s"""{"metric":"total","value":$total,"unit":"sec","mintotal":$minTotal,"iters":$iters,"cpus":${j(cpus)},"queries":$qs,"calib":[${ms(calib._1)},${ms(calib._2)}],"calibmt":[${ms(calibMt._1)},${ms(calibMt._2)}],"sf":${j(sfDir)}}"""
  }

  /** The retry decision alone, pure (BenchSpec pins it): retry iff the
    * query is clean-but-spready, budgets remain, AND the host is
    * currently quiet (calibNow within quietFactor of the quietest calib
    * seen) — retrying under active contention just adds another noisy
    * sample and burns the bounded budget.
    */
  private[graft] def shouldRetry(timings: Seq[Double], spreadMax: Double,
      retries: Int, maxRetries: Int, retriesUsed: Int, globalCap: Int,
      calibNow: Double, quietCalib: Double, quietFactor: Double): Boolean = {
    val spread = if (timings.isEmpty || timings.min <= 0) -1.0
      else timings.max / timings.min
    spread > spreadMax && retries < maxRetries && retriesUsed < globalCap &&
      calibNow <= quietFactor * math.min(quietCalib, calibNow)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = GraftSession.builder(s"local[$cpus]", cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val selected = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => args.isEmpty || args.contains(name) }
    selected.foreach { case (_, fn) =>
      try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      catch { case NonFatal(_) => () } // warmup failures re-surface in the timed pass
    }
    val iters = sys.env.getOrElse("SPARK_GRAFT_BENCH_ITERS", "3").toInt
    require(iters >= 1, s"SPARK_GRAFT_BENCH_ITERS must be >= 1, got $iters")
    val calibPre = calibrate()
    val calibMtPre = calibrateMt()
    // one shuffle tally for the whole run: reset + read per timed
    // iteration, both behind a bus drain (OUTSIDE the timed section —
    // the drain waits on listener delivery, not query work). The
    // receipt is the LAST iteration's bytes: shuffle volume is a plan
    // property, identical across cache-cold iterations, so one value
    // per query suffices and round-over-round diffs of BENCH_DETAIL
    // catch a d32-style fan-out even when wall time hides it.
    val tally = new ShuffleTally
    spark.sparkContext.addSparkListener(tally)
    def drain(): Unit =
      try org.apache.spark.graftaccess.SparkAccess.drainListenerBus(spark.sparkContext)
      catch { case NonFatal(_) => () } // a drain timeout must not fail the bench
    // contention-retry policy (r15 verdict task 1): a query whose
    // iteration spread (max/min) exceeds spreadMax took a noisy-neighbor
    // hit on >=1 iteration; give it up to maxRetries EXTRA iterations so
    // the median is computed over enough quiet samples to reject the
    // noisy ones. Retries are CALIB-GATED: each one first re-runs the
    // fixed single-thread workload, and only proceeds if the host is
    // currently within calibQuietFactor of the quietest calib seen this
    // run — retrying while the neighbor is still busy would just add
    // another noisy sample and burn the bounded budget. A global cap
    // bounds total added wall time even if every query is struck.
    val spreadMax = sys.env.getOrElse("SPARK_GRAFT_BENCH_SPREAD", "3.0").toDouble
    val maxRetries = sys.env.getOrElse("SPARK_GRAFT_BENCH_RETRIES", "2").toInt
    val globalRetryCap = sys.env.getOrElse("SPARK_GRAFT_BENCH_RETRY_CAP", "40").toInt
    val calibQuietFactor = 1.5
    var quietCalib = calibPre
    var retriesUsed = 0
    val results = selected.map { case (name, fn) =>
      // every timed iteration starts cache-cold and memory-neutral: drop
      // operator-internal persists (d03 shingle sets, d04 signatures) and
      // eager localCheckpoint blocks left by the PREVIOUS run, then take
      // the GC pause OUTSIDE the timed section — with a 32 GiB heap a
      // stop-the-world collection otherwise lands on one random query per
      // run (round-3 observations: 2 s queries spiking to 17-28 s)
      // (System.gc() also lets ContextCleaner reap unreferenced
      // localCheckpoint RDD blocks, which clearCache does not cover)
      var firstErr: Option[String] = None
      var shufBytes = -1L
      var shufRecords = -1L
      def runOnce(): Option[Double] = {
        spark.catalog.clearCache()
        System.gc()
        drain(); tally.reset()
        val t0 = System.nanoTime()
        try {
          fn(spark, sfDir).write.format("noop").mode("overwrite").save()
          val dt = (System.nanoTime() - t0) / 1e9
          drain()
          shufBytes = tally.shuffleBytes
          shufRecords = tally.shuffleRecords
          Some(dt)
        } catch {
          case NonFatal(e) =>
            System.err.println(s"[bench] $name FAILED: ${e.getClass.getName}: ${e.getMessage}")
            if (firstErr.isEmpty) firstErr = Some(e.getClass.getSimpleName)
            None
        }
      }
      var timings = (1 to iters).flatMap(_ => runOnce())
      val cleanRun = timings.size == iters
      var retries = 0
      def spreadOf(ts: Seq[Double]): Double =
        if (ts.isEmpty || ts.min <= 0) -1.0 else ts.max / ts.min
      var gateOpen = true
      while (cleanRun && gateOpen && spreadOf(timings) > spreadMax &&
          retries < maxRetries && retriesUsed < globalRetryCap) {
        val c = calibrate()
        val go = shouldRetry(timings, spreadMax, retries, maxRetries,
          retriesUsed, globalRetryCap, c, quietCalib, calibQuietFactor)
        if (c < quietCalib) quietCalib = c
        if (go) {
          runOnce() match {
            case Some(dt) => timings :+= dt; retries += 1; retriesUsed += 1
            case None => gateOpen = false // retry failure: keep the clean median, stop
          }
        } else {
          System.err.println(f"[bench] $name spread=${spreadOf(timings)}%.2f " +
            f"but host busy (calib $c%.3f vs quiet $quietCalib%.3f) — not retrying")
          gateOpen = false
        }
      }
      // any failed ORIGINAL iteration fails the query — a partially-
      // failing query must not report a healthy-looking median; the
      // failure class goes into the driver-visible report, not stderr only
      if (!cleanRun)
        QRes(name, -1.0, Some(firstErr.getOrElse("failed")), timings,
          shufBytes, shufRecords, retries)
      else {
        val sorted = timings.sorted
        System.err.println(f"[bench] $name iters=${sorted.map(t => f"$t%.3f").mkString(",")} " +
          f"shuffle=${shufBytes / 1e6}%.1fMB/${shufRecords} rows" +
          (if (retries > 0) s" retries=$retries" else ""))
        QRes(name, sorted(sorted.size / 2), None, timings,
          shufBytes, shufRecords, retries)
      }
    }
    val calibPost = calibrate()
    val calibMtPost = calibrateMt()
    // the line must reach stdout UNPREFIXED to parse: the r8 report read
    // "parsed": null with the line fully inside the tail window because
    // sbt's LoggedOutput prepended "[info] " — build.sbt sets
    // outputStrategy := StdoutOutput (byte budget handled in reportLine)
    val okRes = results.filter(_.err.isEmpty)
    val line = reportLine(
      okRes.map(r => (r.name, r.median)),
      results.collect { case r if r.err.isDefined => (r.name, r.err.get) },
      (calibPre, calibPost), (calibMtPre, calibMtPost), sfDir,
      minTotal = okRes.map(_.min).sum)
    // full-precision sidecar: the stdout line lives inside the driver's
    // 2000-byte tail window and degrades per-query precision to fit (at
    // 179 queries the realistic rung is integer seconds) — so every run
    // also persists the complete ms-precision record (median + min +
    // spread + retries + all raw iterations per query, full names, calib)
    // where the byte budget does not apply. Round-over-round per-query
    // comparisons read this.
    try {
      val detail = detailLine(results, iters, cpus,
        (calibPre, calibPost), (calibMtPre, calibMtPost), sfDir)
      val out = sys.env.getOrElse("SPARK_GRAFT_DETAIL", "BENCH_DETAIL.json")
      java.nio.file.Files.write(java.nio.file.Paths.get(out),
        (detail + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    } catch { case NonFatal(e) => System.err.println(s"[bench] detail sidecar write failed: $e") }
    spark.stop()
    // last line of program output: nothing (not even Spark shutdown chatter,
    // which is why stop() runs first) may land between it and process exit
    println(line)
  }
}
