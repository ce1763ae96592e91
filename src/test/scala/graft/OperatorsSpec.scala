package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.operators.SkewJoin

/** Scale-technique operators: salted skew joins (result-equivalence vs the
  * plain join) and bucketed co-located joins (shuffle-free plan proof) —
  * plus the approx_count_distinct (HLL) error-bound invariant.
  */
class OperatorsSpec extends SparkSpec {
  import spark.implicits._

  test("salted inner join ≡ plain inner join on skewed data") {
    // heavy-tailed: key 0 carries half the fact rows
    val fact = (0 until 20000).map(i => (if (i % 2 == 0) 0L else (i % 100).toLong, i.toLong))
      .toDF("k", "v")
    val dim = (0L until 100L).map(k => (k, s"dim-$k")).toDF("k", "name")
    val plain = fact.join(dim, Seq("k"), "inner")
      .select("k", "v", "name").orderBy("k", "v").collect()
    val salted = SkewJoin.saltedInnerJoin(fact, dim, Seq("k"), factor = 8)
      .select("k", "v", "name").orderBy("k", "v").collect()
    assert(salted.length === plain.length)
    assert(salted.toSeq === plain.toSeq)
  }

  test("bucketed tables co-locate: the bucket join plans without a shuffle") {
    val wh = Files.createTempDirectory("graft-warehouse").toString
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    // the sf0.001 tables are broadcast-sized; force the sort-merge path that
    // bucketing is designed to make shuffle-free
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.sql(s"CREATE DATABASE IF NOT EXISTS graft_bucket_test LOCATION '$wh'")
    try {
      val orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
      val lineitem = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
      orders.write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
        .option("path", s"$wh/orders_b").saveAsTable("graft_bucket_test.orders_b")
      lineitem.write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
        .option("path", s"$wh/lineitem_b").saveAsTable("graft_bucket_test.lineitem_b")
      val joined = spark.table("graft_bucket_test.orders_b")
        .join(spark.table("graft_bucket_test.lineitem_b"),
          col("o_orderkey") === col("l_orderkey"))
        .groupBy(col("o_orderstatus")).agg(count(lit(1)).as("n"))
      // correctness vs the unbucketed join
      val expected = orders.join(lineitem, col("o_orderkey") === col("l_orderkey"))
        .groupBy(col("o_orderstatus")).agg(count(lit(1)).as("n"))
        .orderBy("o_orderstatus").collect().toSeq
      assert(joined.orderBy("o_orderstatus").collect().toSeq === expected)
      // plan proof: no shuffle below the join (bucketing co-locates both
      // sides; the only exchange allowed is the post-join aggregation's).
      // String-level check — AdaptiveSparkPlanExec hides its inner plan
      // from collect().
      val planStr = joined.queryExecution.executedPlan.toString
      assert(planStr.contains("SortMergeJoin"), s"expected SMJ, plan:\n$planStr")
      assert(planStr.contains("Bucketed: true"), s"expected bucketed scans, plan:\n$planStr")
      assert(!planStr.contains("Exchange hashpartitioning(o_orderkey") &&
        !planStr.contains("Exchange hashpartitioning(l_orderkey"),
        s"bucketed join must not shuffle its inputs, plan:\n$planStr")
    } finally {
      spark.sql("DROP DATABASE IF EXISTS graft_bucket_test CASCADE")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
    }
  }

  test("as-of join: latest at-or-before match per key, null when none") {
    import graft.operators.AsOfJoin
    val quotes = Seq( // (key, ts, price)
      ("A", 10L, 1.0), ("A", 20L, 2.0), ("A", 30L, 3.0),
      ("B", 15L, 9.0)
    ).toDF("sym", "ts", "price")
    val trades = Seq( // (key, ts, qty)
      ("A", 5L, 100L), // before any quote → null
      ("A", 20L, 200L), // exact-ts match → 2.0 (at-or-before includes equal)
      ("A", 25L, 300L), // between quotes → 2.0
      ("A", 99L, 400L), // after all → 3.0
      ("B", 14L, 500L), // before B's only quote → null
      ("C", 50L, 600L) // key with no quotes at all → null
    ).toDF("sym", "ts", "qty")
    val got = AsOfJoin.leftAsOf(trades, quotes, Seq("sym"), "ts", "q_")
      .orderBy("sym", "ts")
      .collect()
      .map(r => (r.getAs[String]("sym"), r.getAs[Long]("ts"),
        Option(r.getAs[java.lang.Double]("q_price")).map(_.toDouble)))
    assert(got.toSeq === Seq(
      ("A", 5L, None), ("A", 20L, Some(2.0)), ("A", 25L, Some(2.0)),
      ("A", 99L, Some(3.0)), ("B", 14L, None), ("C", 50L, None)))
  }

  test("as-of join (q91 shape): same-instant dimension versions pre-aggregate " +
      "to the highest version, and a probe AT a version's ts sees that version") {
    import graft.operators.AsOfJoin
    // AsOfJoin's documented tie contract: multiple right rows at the same
    // (key, ts) are frame-order nondeterministic — the CALLER must
    // pre-aggregate. q91 does max(struct(version, value)): highest
    // version wins the instant. Replay that composition on a hand case.
    val dimRaw = Seq( // (user, ts, version, value)
      (1L, 10L, 1L, "v1"), (1L, 10L, 2L, "v2"), // same-instant correction
      (1L, 30L, 3L, "v3")
    ).toDF("u", "ts", "version", "dv")
    val dim = dimRaw.groupBy(col("u"), col("ts"))
      .agg(max(struct(col("version"), col("dv"))).as("m"))
      .select(col("u"), col("ts"), col("m.version").as("version"),
        col("m.dv").as("dv"))
    val probe = Seq((1L, 10L, 100L), (1L, 29L, 200L), (1L, 30L, 300L))
      .toDF("u", "ts", "pid")
    val got = AsOfJoin.leftAsOf(probe, dim, Seq("u"), "ts", "d_")
      .orderBy(col("pid"))
      .collect().map(r => (r.getAs[Long]("pid"), r.getAs[Long]("d_version"),
        r.getAs[String]("d_dv")))
    assert(got.toSeq === Seq(
      (100L, 2L, "v2"), // probe AT the corrected instant: version 2, never 1
      (200L, 2L, "v2"), // between versions: still the instant's winner
      (300L, 3L, "v3"))) // exact ts of version 3 includes it (at-or-before)
  }

  test("approx_count_distinct (HLL) lands within its declared error bound") {
    val li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    val r = li.agg(
      countDistinct(col("l_partkey")).as("exact"),
      approx_count_distinct(col("l_partkey"), 0.02).as("approx")).collect().head
    val exact = r.getLong(0).toDouble
    val approx = r.getLong(1).toDouble
    assert(math.abs(approx - exact) / exact <= 0.06,
      s"HLL estimate $approx too far from exact $exact") // 3× rsd safety margin
  }

  // q30/q35 now emit the error invariant AS their output (boolean flags
  // the DuckDB twin asserts TRUE), so the shape tests assert the flags —
  // the same ≤2% / ≤1% bounds, now also enforced by the correctness gate.
  test("q30 shape: HLL++ and DataSketches error flags hold per group") {
    val rows = SparkEntry.queries("q30_approx_distinct")(spark, "/root/testdata/sf0.001").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("exact_parts") > 0)
      assert(r.getAs[Boolean]("approx_err_ok"), s"HLL++ out of bound: $r")
      assert(r.getAs[Boolean]("sketch_err_ok"), s"sketch out of bound: $r")
    }
  }

  test("q35 shape: sketch-percentile error flags hold per group") {
    val rows = SparkEntry.queries("q35_approx_percentiles")(spark, "/root/testdata/sf0.001").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Double]("p50_exact") <= r.getAs[Double]("p95_exact"))
      assert(r.getAs[Boolean]("p50_err_ok"), s"p50 sketch out of bound: $r")
      assert(r.getAs[Boolean]("p95_err_ok"), s"p95 sketch out of bound: $r")
    }
  }

  test("token-budget selection (q42): exact inclusive prefix of the quality ordering") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), col("lang"), col("text"))
    def rows(budget: Long) = SparkEntry.tokenBudgetSelect(docs, budget).collect()
      .map(r => (r.getAs[String]("lang"), r.getAs[Long]("doc_id"),
        r.getAs[Long]("cum_tokens"))).toSet
    // an effectively-unbounded budget yields the full ordering with its
    // running sums; any finite budget must be exactly its cum ≤ B subset
    // (the inclusive-prefix rule — no best-fit skipping)
    val all = rows(Long.MaxValue / 2)
    val sel = rows(2000L)
    assert(sel === all.filter(_._3 <= 2000L))
    assert(sel.nonEmpty && sel.size < all.size,
      s"budget must bind: ${sel.size} of ${all.size}")
    assert(sel.forall(_._3 <= 2000L))
  }

  test("shard assignment (q41): total, repartition-stable, and every shard non-empty") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"))
    def rows(df: org.apache.spark.sql.DataFrame) =
      graft.analytics.Sampling.shardAssignment(df, nShards = 8, idCol = "doc_id")
        .select("doc_id", "shard", "pos").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val a = rows(docs)
    // the assignment must survive a physical re-layout bit-for-bit —
    // that is the whole point of hashing instead of zipWithIndex
    val b = rows(docs.repartition(13, col("doc_id")))
    assert(a === b, "shard assignment must not depend on partitioning")
    assert(a.map(_._1).size === docs.count(), "every doc exactly once")
    val byShard = a.groupBy(_._2)
    assert(byShard.keySet === (0L until 8L).toSet, "all 8 shards populated")
    // positions within each shard are 1..|shard| with no gaps
    byShard.foreach { case (s, rs) =>
      assert(rs.map(_._3) === (1L to rs.size.toLong).toSet, s"gapped pos in shard $s")
    }
  }

  test("group-aware split (q43): group members never straddle splits, fraction " +
      "in tolerance, repartition-stable, frac 0/1 degenerate") {
    import graft.analytics.Sampling
    val rows = spark.range(3000).select(col("id").as("doc_id"),
      (col("id") % 500).as("grp")) // 500 groups × 6 members
    def split(df: org.apache.spark.sql.DataFrame) =
      Sampling.groupAwareSplit(df, "grp", trainFrac = 0.8)
        .select("doc_id", "grp", "split").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    val a = split(rows)
    // every member of a group carries the group's split — zero straddle
    a.groupBy(_._2).foreach { case (g, ms) =>
      assert(ms.map(_._3).distinct.length === 1, s"group $g straddles splits")
    }
    // group-level fraction near 0.8 (binomial over 500 groups: ±5σ ≈ ±0.09)
    val trainGroups = a.groupBy(_._2).count(_._2.head._3 == "train")
    assert(math.abs(trainGroups / 500.0 - 0.8) < 0.09,
      s"train fraction ${trainGroups / 500.0} far from 0.8")
    assert(a.toSet === split(rows.repartition(7)).toSet)
    // degenerate fractions: everything on one side
    assert(Sampling.groupAwareSplit(rows, "grp", 1.0)
      .where(col("split") =!= "train").count() === 0)
    assert(Sampling.groupAwareSplit(rows, "grp", 0.0)
      .where(col("split") =!= "val").count() === 0)
  }

  test("deterministic stratified sample is stable under repartitioning; bernoulli is in-tolerance") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), col("lang"))
    def ids(df: org.apache.spark.sql.DataFrame) =
      graft.analytics.Sampling.deterministicStratified(df, "lang", 10, "doc_id")
        .select("doc_id").collect().map(_.getLong(0)).toSet
    val a = ids(docs)
    val b = ids(docs.repartition(17, col("doc_id"))) // different physical layout
    assert(a === b, "deterministic sample must not depend on partitioning")
    assert(a.nonEmpty)
    // per-stratum quota respected
    val perLang = graft.analytics.Sampling.deterministicStratified(docs, "lang", 10, "doc_id")
      .groupBy("lang").count().collect().map(_.getLong(1))
    assert(perLang.forall(_ <= 10))
    // bernoulli: wide fixed band, NOT a tight sigma bound — the per-row RNG
    // stream is partition-seeded, so the exact draw varies with the
    // machine's split count (the non-reproducibility Sampling.scala
    // documents); the band only asserts the fraction is honored at all
    val n = docs.count().toDouble
    val got = graft.analytics.Sampling.bernoulli(docs, 0.3, seed = 7L).count().toDouble
    assert(got >= 0.15 * n && got <= 0.45 * n, s"sampled $got of $n at fraction 0.3")
  }

  test("audio chunk plan: exact-multiple, remainder, and zero-length cases") {
    import spark.implicits._
    val metas = Seq((0L, 32000L), (1L, 16001L), (2L, 0L))
      .toDF("id", "n")
      .select(col("id"), struct(lit(16000).as("sample_rate"), col("n").as("n_samples")).as("m"))
    val out = metas.select(col("id"),
        graft.analytics.Multimodal.audioChunkPlan(col("m")).as("p"))
      .select(col("id"), col("p.n_chunks"), col("p.last_chunk_samples"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(out(0L) === ((2L, 16000L))) // exact multiple: full last chunk
    assert(out(1L) === ((2L, 1L)))     // remainder carries into last chunk
    assert(out(2L) === ((0L, 0L)))     // zero-length: no phantom chunk
  }

  test("bench JSON line worst case fits the driver's 2000-byte tail window") {
    // the driver parses the report out of the LAST 2000 bytes of output;
    // the line must fit there TOGETHER with sbt's ~75-byte [success]
    // epilogue. Rounds 1-8 were machine-blind to the bench number partly
    // because of this — keep the budget enforced, not remembered (Bench
    // degrades per-query precision to 10 ms if ms precision would crowd
    // the window). Bound defended: EVERY query in two-digit seconds —
    // 6.8× the slowest query ever recorded (14.7 s, host-inflated); past
    // that the 2× perf gate has failed long before the byte budget.
    val worstCase = SparkEntry.queries.keys.toSeq.sorted.map(_ -> 99.99)
    val line = Bench.reportLine(worstCase, Seq.empty, (99.99, 99.99),
      (99.99, 99.99), "/root/testdata/sf0.1",
      minTotal = worstCase.size * 99.99)
    assert(line.length + 100 < 2000,
      s"worst-case bench line is ${line.length} bytes for ${worstCase.size} " +
        "queries — over the tail-window budget with the sbt epilogue; " +
        "shorten query names")
    // and the line must actually be JSON a line-parser accepts
    assert(line.startsWith("{") && line.endsWith("}") && !line.contains("\n"))
    // calib must survive EVERY precision rung at ms precision — the r12
    // regression zeroed it on the integer rung (calib:[0,0]) and the
    // machine-state normalizer was unreadable for the whole round
    assert(line.contains("\"calib\":[99.990,99.990]"),
      s"calib must be fixed ms precision on every rung: $line")
    // empty failed map is omitted (bytes the all-green case keeps)
    assert(!line.contains("\"failed\""))
    // the ladder's terminal rung must stay parseable at ANY catalog size:
    // 400 synthetic queries cannot fit per-query values in the window, so
    // the line degrades to an empty queries map (detail lives in
    // BENCH_DETAIL.json), never to an unparseable line
    val huge = (1 to 400).map(i => f"z$i%03d_synthetic" -> 99.99)
    val hugeLine = Bench.reportLine(huge, Seq.empty, (99.99, 99.99),
      (99.99, 99.99), "/root/testdata/sf0.1", minTotal = 400 * 99.99)
    assert(hugeLine.length + 100 < 2000 && hugeLine.startsWith("{") &&
      hugeLine.endsWith("}") && hugeLine.contains("\"queries\":{}"))
    // report keys are the q01/d15-style prefixes (leading zeros in the
    // numeric suffix stripped: q01→q1) — they must stay unique across
    // the catalog or the report silently falls back to long names
    // (burning the byte budget the short keys exist to protect)
    val keys = Bench.reportKeys(SparkEntry.queries.keys.toSeq)
    assert(keys.values.toSeq.distinct.size === keys.size)
    assert(keys.values.forall(!_.contains('_')),
      s"catalog prefix collision forced long report keys: " +
        keys.collect { case (full, k) if k.contains('_') => full }.mkString(", "))
    // zero-stripping is injective and does what it says
    assert(Bench.reportKeys(Seq("q01_x", "q10_y", "q1_z")) ===
      Map("q01_x" -> "q01_x", "q10_y" -> "q10", "q1_z" -> "q1_z"))
  }

  test("sequence packing: start-offset bins, boundary spans, empty docs, per-stratum isolation") {
    import spark.implicits._
    // budget 5; en stream: 3,4,0,6 tokens → starts 0,3,7,7
    //   doc0 seq0 off0; doc1 starts at 3 (spans into seq1 — splitter's
    //   concern); doc2 is EMPTY, lands where the stream stands (seq1 off2);
    //   doc3 same start (seq1 off2), spans into seq2. de restarts at 0.
    val docs = Seq(
      (0L, "en", "a b c"), (1L, "en", "d e f g"), (2L, "en", ""),
      (3L, "en", "h i j k l m"), (4L, "de", "x y")
    ).toDF("doc_id", "lang", "text")
    val out = graft.analytics.Packing.packSequences(docs, budget = 5)
      .orderBy("lang", "doc_id").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(out.toSeq === Seq(
      ("de", 4L, 2L, 0L, 0L),
      ("en", 0L, 3L, 0L, 0L), ("en", 1L, 4L, 0L, 3L),
      ("en", 2L, 0L, 1L, 2L), ("en", 3L, 6L, 1L, 2L)))
  }

  test("sqrt mixture: integer quota boundary is exact on perfect squares") {
    import spark.implicits._
    // stratum a: 9 docs → quota ceil(√9)=3 — a float-pow boundary case;
    // stratum b: 10 docs → quota ceil(√10)=4; stratum c: 1 doc → 1
    val docs = ((0 until 9).map(i => (i.toLong, "a")) ++
      (100 until 110).map(i => (i.toLong, "b")) ++ Seq((200L, "c")))
      .toDF("doc_id", "lang")
    val got = graft.analytics.Sampling.sqrtMixture(docs, "lang", "doc_id")
      .groupBy("lang").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got === Map("a" -> 3L, "b" -> 4L, "c" -> 1L))
  }

  test("multimodal header codecs: synthesize → parse round-trips; bad magic → null") {
    import spark.implicits._
    val M = graft.analytics.Multimodal
    // PNG: width/height ride big-endian in IHDR; colorType 2 → 3 channels
    val png = Seq((640, 480), (1, 1), (65535, 2)).toDF("w", "h")
      .select(col("w"), col("h"),
        M.decodeImage(M.pngHeader(col("w"), col("h"))).as("m"))
      .select(col("w"), col("h"), col("m.width"), col("m.height"), col("m.channels"))
      .collect()
    png.foreach { r =>
      assert(r.getInt(2) === r.getInt(0) && r.getInt(3) === r.getInt(1))
      assert(r.getInt(4) === 3)
    }
    // a real PNG file prefix (zero CRC aside) must start with the 8-byte
    // signature — byte-compare against the spec constant
    val sigBytes = Seq(1).toDF("x")
      .select(hex(substring(M.pngHeader(lit(10), lit(20)), 1, 8)).as("sig"))
      .head().getString(0)
    assert(sigBytes === "89504E470D0A1A0A")
    // WAV: sample_rate/channels/dataSize ride little-endian; n_samples
    // recovers from dataSize / blockAlign
    val wav = Seq((16000, 1, 16, 48000L), (44100, 2, 16, 12345L)).toDF("sr", "ch", "bits", "ns")
      .select(col("sr"), col("ch"), col("ns"),
        M.decodeAudio(M.wavHeader(col("sr"), col("ch"), col("bits"), col("ns"))).as("m"))
      .select(col("sr"), col("ch"), col("ns"), col("m.sample_rate"), col("m.n_samples"), col("m.channels"))
      .collect()
    wav.foreach { r =>
      assert(r.getInt(3) === r.getInt(0))
      assert(r.getLong(4) === r.getLong(2))
      assert(r.getInt(5) === r.getInt(1))
    }
    // not-a-container payloads parse to null, never crash (real-parser
    // behavior for a corrupt or mislabeled file)
    val junk = Seq("plain text", "").toDF("t")
      .select(M.decodeImage(col("t").cast("binary")).as("i"),
        M.decodeAudio(col("t").cast("binary")).as("a"))
      .collect()
    junk.foreach { r => assert(r.isNullAt(0) && r.isNullAt(1)) }
  }

  test("URL canonicalization (d30): scheme case, http vs https defaults, " +
      "anchored utm strip, authority-anchored port collapse") {
    import spark.implicits._
    import graft.analytics.Domains
    val cases = Seq(
      // mixed-case scheme + default https port + trailing slash; path case preserved
      (1L, "HTTPS://Host.Example.COM:443/Path/", "https://host.example.com/Path"),
      // http strips ITS default port…
      (2L, "http://Host:80/p", "http://host/p"),
      // …but keeps a non-default one (443 is not http's default)
      (3L, "http://host:443/p", "http://host:443/p"),
      // leading utm param promotes the real follower
      (4L, "https://host/p?utm_source=a&x=1", "https://host/p?x=1"),
      // xutm_… is a REAL param: the strip is separator-anchored
      (5L, "https://host/p?x=1&xutm_source=9", "https://host/p?x=1&xutm_source=9"),
      // consecutive utm params all die, dangling ? dies with them
      (6L, "https://host/p?utm_a=1&utm_b=2", "https://host/p"),
      // ':443' inside a PATH segment is untouched (authority-anchored collapse)
      (7L, "https://host/c:443/x", "https://host/c:443/x"),
      // non-http(s) scheme: lowercased scheme, body passes through
      (8L, "FTP://Host/P/", "ftp://Host/P"),
      (9L, "https://host/p#frag", "https://host/p"),
      (10L, "https://HOST/p?utm_only=1", "https://host/p"))
    val got = cases.map(c => (c._1, c._2)).toDF("id", "url")
      .select(col("id"), Domains.canonicalizeUrl(col("url")).as("c"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    cases.foreach { case (id, in, want) =>
      assert(got(id) === want, s"case $id: $in → ${got(id)}, want $want")
    }
  }

  test("domain extraction (d19): PSL longest-match, deep subdomains collapse, " +
      "unlisted TLDs fall back to two labels, quota is repartition-stable") {
    import graft.analytics.Domains
    val psl = Seq("com", "uk", "co.uk", "io", "github.io", "example.com")
    val urls = Seq(
      (1L, "https://www.src0.example.com/en/1"),
      (2L, "http://deep.cdn.src1.example.com:8080/x?q=1"),
      (3L, "https://src2.example.com/fr/3"),
      (4L, "https://evil.example.zz/en/4"), // unlisted TLD → implicit-* fallback
      (5L, "ftp://src0.example.com/raw"),
      (6L, "https://a.b.site6.co.uk/x"),    // co.uk must beat uk
      (7L, "https://user7.github.io/repo"), // github.io must beat io
      (8L, "https://plain.io/x"),           // single-label rule
      (9L, "https://localhost/x")           // one label → pass-through
    ).toDF("doc_id", "url")
    val d = urls
      .withColumn("host", Domains.host(col("url")))
      .withColumn("domain", Domains.registeredDomain(col("host"), psl))
      .collect().map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[String]("host"), r.getAs[String]("domain")))).toMap
    assert(d(1L) === (("www.src0.example.com", "src0.example.com")))
    assert(d(2L) === (("deep.cdn.src1.example.com", "src1.example.com"))) // port stripped
    assert(d(3L) === (("src2.example.com", "src2.example.com")))
    assert(d(4L) === (("evil.example.zz", "example.zz")))
    assert(d(5L) === (("src0.example.com", "src0.example.com")))
    assert(d(6L) === (("a.b.site6.co.uk", "site6.co.uk")))
    assert(d(7L) === (("user7.github.io", "user7.github.io")))
    assert(d(8L) === (("plain.io", "plain.io")))
    assert(d(9L) === (("localhost", "localhost")))
    // quota determinism under repartitioning (the Sampling contract)
    val many = spark.range(200).select(col("id").as("doc_id"),
      concat(lit("https://src"), pmod(col("id"), lit(4)).cast("string"),
        lit(".example.com/p/"), col("id").cast("string")).as("url"))
    def kept(df: org.apache.spark.sql.DataFrame) =
      Domains.domainQuota(df, "url", psl, k = 10)
        .select(col("domain"), col("sample_rank"), col("doc_id"))
        .collect().map(_.toSeq).toSet
    val a = kept(many)
    assert(a.size === 40) // 4 domains × 10
    assert(a === kept(many.repartition(13)))
  }

  test("as-of join preconditions fail fast with clear messages") {
    import spark.implicits._
    val l = Seq((1L, 10L, "x")).toDF("k", "ts", "payload")
    val r = Seq((1L, 5L, 1.0)).toDF("k", "ts", "v")
    val e1 = intercept[IllegalArgumentException] {
      graft.operators.AsOfJoin.leftAsOf(l, r.withColumnRenamed("ts", "t"), Seq("k"), "ts")
    }
    assert(e1.getMessage.contains("missing column"))
    val e2 = intercept[IllegalArgumentException] {
      graft.operators.AsOfJoin.leftAsOf(l.withColumn("_asof_side", lit(1)), r, Seq("k"), "ts")
    }
    assert(e2.getMessage.contains("reserved"))
  }

  test("CBO: ANALYZE statistics surface in the plan; broadcast needs no hint") {
    val tbl = "graft_cbo_dim"
    spark.sql(s"DROP TABLE IF EXISTS $tbl")
    spark.read.parquet("/root/testdata/sf0.001/nation.parquet")
      .write.mode("overwrite").saveAsTable(tbl)
    val prior = spark.conf.getOption("spark.sql.cbo.enabled")
    try {
      spark.sql(s"ANALYZE TABLE $tbl COMPUTE STATISTICS")
      spark.conf.set("spark.sql.cbo.enabled", "true")
      // catalog row-count statistics reach the optimized plan
      val stats = spark.table(tbl).queryExecution.optimizedPlan.stats
      assert(stats.rowCount.exists(_.toLong === 25L),
        s"ANALYZE rowCount must surface under CBO, got $stats")
      // a stats-tiny dimension broadcasts with NO broadcast() hint — the
      // optimizer's own size estimate makes the call
      val fact = spark.read.parquet("/root/testdata/sf0.001/customer.parquet")
      val plan = fact.join(spark.table(tbl),
          fact("c_nationkey") === org.apache.spark.sql.functions.col("n_nationkey"))
        .queryExecution.executedPlan.toString
      assert(plan.contains("BroadcastHashJoin"),
        s"expected a stats-driven broadcast join, plan:\n$plan")
    } finally {
      prior match {
        case Some(v) => spark.conf.set("spark.sql.cbo.enabled", v)
        case None => spark.conf.unset("spark.sql.cbo.enabled")
      }
      spark.sql(s"DROP TABLE IF EXISTS $tbl")
    }
  }

  test("q65: CEP pattern semantics — within-window, negation, and ordering edges") {
    // craft a micro-corpus through the same catalog query via a temp dir
    import org.apache.spark.sql.functions.{col, lit}
    val dir = Files.createTempDirectory("graft-cep").toString
    val T = 1700000000000000L // µs
    val rows = Seq(
      // u1: view → purchase in 10 min, clean: MATCH
      (1L, T, 1L, "view"), (2L, T + 600000000L, 1L, "purchase"),
      // u2: view → error → purchase (error between): NO match
      (3L, T, 2L, "view"), (4L, T + 60000000L, 2L, "error"),
      (5L, T + 600000000L, 2L, "purchase"),
      // u3: purchase 2h after view: outside the window, NO match
      (6L, T, 3L, "view"), (7L, T + 7200000000L, 3L, "purchase"),
      // u4: error AFTER the purchase: still a MATCH
      (8L, T, 4L, "view"), (9L, T + 600000000L, 4L, "purchase"),
      (10L, T + 900000000L, 4L, "error"),
      // u5: view with no purchase at all: NO match
      (11L, T, 5L, "view"))
      .toDF("event_id", "usv", "user_id", "event_type")
      .select(col("event_id"), (col("usv") / lit(1000000L)).cast("timestamp").as("ts"),
        col("user_id"), col("event_type"), lit(1.0).as("value"), lit("{}").as("props"))
    rows.write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = SparkEntry.queries("q65_cep_pattern")(spark, dir)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got == Map(1L -> (1L, 1L), 2L -> (1L, 0L), 3L -> (1L, 0L),
      4L -> (1L, 1L), 5L -> (1L, 0L)), s"got $got")
  }

  test("q64: sliding 7-day distinct equals the brute-force window; WAU ≥ DAU") {
    val out = SparkEntry.queries("q64_sliding_distinct")(spark, "/root/testdata/sf0.001")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.nonEmpty)
    assert(out.forall { case (_, dau, wau) => wau >= dau })
    // driver brute force over the raw (user, day) observations
    val ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    val us = graft.EventTime.epochMicros(ev)
    val obs = ev.select(col("user_id"),
        ((us - pmod(us, lit(86400000000L))) / lit(86400000000L)).cast("long").as("day"))
      .distinct().collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    out.foreach { case (d, dau, wau) =>
      val expWau = obs.filter { case (_, od) => od >= d - 6 && od <= d }.map(_._1).size
      val expDau = obs.filter(_._2 == d).map(_._1).size
      assert(wau == expWau && dau == expDau, s"day $d: got ($dau,$wau), expected ($expDau,$expWau)")
    }
  }

  // ── GroupedTopK: the bounded-state grouped top-k aggregate ──

  /** Deterministic skewed fixture: 4 keys, engineered score ties (score
    * = i % 97 so the k-boundary has collisions the id must break), one
    * key with a single row (n < k path). */
  private def topkFixture(n: Int) = {
    val rows = (0 until n).map { i =>
      (s"k${i % 4}", (i % 97).toDouble, i.toLong)
    } :+ (("lonely", 5.0, (n + 1).toLong))
    rows.toDF("key", "score", "id")
  }

  private def windowTopK(df: org.apache.spark.sql.DataFrame, k: Int) = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("key")).orderBy(col("score").desc, col("id"))
    df.withColumn("rnk", row_number().over(w).cast("bigint"))
      .where(col("rnk") <= k)
      .select(col("key"), col("rnk"), col("id"), col("score"))
  }

  test("grouped top-k aggregate ≡ window row_number, ties broken by id") {
    val df = topkFixture(20000)
    val expected = windowTopK(df, 7).orderBy("key", "rnk").collect().toSeq
    val got = graft.operators.GroupedTopK.topKPerKey(df, Seq("key"), "score", "id", k = 7)
      .orderBy("key", "rnk").collect().toSeq
    assert(got === expected)
    // the n < k group emits exactly its n rows
    assert(got.count(_.getString(0) == "lonely") === 1)
  }

  test("grouped top-k is partitioning-invariant (1 vs 16 partitions)") {
    val df = topkFixture(5000)
    def run(p: Int) = graft.operators.GroupedTopK
      .topKPerKey(df.repartition(p), Seq("key"), "score", "id", k = 5)
      .orderBy("key", "rnk").collect().toSeq
    assert(run(1) === run(16))
  }

  test("grouped top-k drops null/NaN scores; window twin agrees on the filtered input") {
    val df = topkFixture(500)
      .unionByName(Seq(("k0", Double.NaN, 90001L)).toDF("key", "score", "id"))
      .unionByName(Seq(("k1", null.asInstanceOf[java.lang.Double], 90002L))
        .toDF("key", "score", "id").select(col("key"), col("score").cast("double"), col("id")))
    val expected = windowTopK(df.where(col("score").isNotNull && !isnan(col("score"))), 3)
      .orderBy("key", "rnk").collect().toSeq
    val got = graft.operators.GroupedTopK.topKPerKey(df, Seq("key"), "score", "id", k = 3)
      .orderBy("key", "rnk").collect().toSeq
    assert(got === expected)
    assert(!got.exists(r => r.getLong(2) >= 90001L))
  }

  test("grouped top-k: no input sort, one buffer per (partition,key) on the wire") {
    val n = 50000
    // materialize the partitioned input once so the measured bodies see
    // ONLY their own exchanges (the repartition shuffle lands in the cache
    // build, not in either receipt)
    val df = topkFixture(n).repartition(8).cache()
    df.count()
    try {
      val aggQ = graft.operators.GroupedTopK.topKPerKey(df, Seq("key"), "score", "id", k = 5)
      val winQ = windowTopK(df, 5)
      val (_, aggRecords) = ShuffleReceipt.measure(spark) { aggQ.collect() }
      val (_, windowRecords) = ShuffleReceipt.measure(spark) { winQ.collect() }
      // agg path: ONE ≤k-pair buffer per (map partition, key) = ≤ 8·5
      // records (4 keys + lonely)
      assert(aggRecords <= 8L * 5,
        s"agg shuffle wrote $aggRecords records, expected ≤ partitions·keys buffers")
      // window path: Spark's InferWindowGroupLimit bounds it too (k ROWS
      // per partition·key, not n) — pin that the optimization fired and
      // that it still writes k× the agg's record count
      assert(windowRecords < n && windowRecords > aggRecords,
        s"window wrote $windowRecords records (agg $aggRecords, n $n)")
      val winPlan = winQ.queryExecution.executedPlan.toString
      val aggPlan = aggQ.queryExecution.executedPlan.toString
      assert(winPlan.contains("WindowGroupLimit") && winPlan.contains("Sort ["),
        s"window plan lost its group-limit/sort shape:\n$winPlan")
      // the aggregate's 100 TB edge: NO sort of the input anywhere —
      // O(n log k) heap maintenance instead of O(n log n) sort+spill
      assert(!aggPlan.contains("Sort ["),
        s"agg plan should not sort the input:\n$aggPlan")
      assert(aggPlan.contains("partial_topkagg"),
        s"agg plan lost the partial/final split:\n$aggPlan")
    } finally df.unpersist()
  }
}
