package graft

import org.apache.spark.sql.functions._

import graft.analytics.{Dedup, TextAnalysis}

/** Invariant tests for the xxhash64-family dedup operators that have no
  * DuckDB twin (d04 minhash LSH, d05 simhash, t04 rolling hash), plus
  * goldens for the shingle machinery.
  */
class DedupSpec extends SparkSpec {
  import spark.implicits._

  private val A = "the quick brown fox jumps over the lazy dog"
  private val B = A // exact duplicate
  private val C = A + " tonight" // near duplicate: J = 7/8 on 3-gram shingles
  private val D = "completely different text about spark engines and cluster scheduling today"

  private def docs = Seq(
    (0L, A), (1L, B), (2L, C), (3L, D)
  ).toDF("doc_id", "text")

  test("shingle golden: 3-grams of a 4-word text") {
    val sets = Dedup.shingleSets(Seq((0L, "the quick brown fox")).toDF("doc_id", "text"), 3)
    val sh = sets.collect().head
    assert(sh.getSeq[String](sh.fieldIndex("sh")) ===
      Seq("the quick brown", "quick brown fox"))
  }

  test("shingle golden: sub-n-word text yields empty set") {
    val sets = Dedup.shingleSets(Seq((0L, "two words")).toDF("doc_id", "text"), 3)
    val sh = sets.collect().head
    assert(sh.getSeq[String](sh.fieldIndex("sh")).isEmpty)
  }

  test("exact dedup collapses identical texts") {
    val out = Dedup.exact(docs).orderBy("keep_id").collect()
    assert(out.map(r => (r.getAs[Long]("keep_id"), r.getAs[Long]("n_copies"))).toSeq ===
      Seq((0L, 2L), (2L, 1L), (3L, 1L)))
  }

  test("fingerprint dedup: identical fp iff identical normalized text") {
    val fps = Dedup.byFingerprint(docs).orderBy("keep_id").collect()
    assert(fps.length === 3) // A==B collapse
    // and the fingerprint is whitespace/case-normalized:
    val fp2 = Dedup.byFingerprint(
      Seq((0L, "The  Quick brown fox"), (1L, "the quick BROWN fox")).toDF("doc_id", "text"))
    assert(fp2.count() === 1)
  }

  test("minhash signatures: identical docs get identical k-long signatures") {
    val sigs = Dedup.minhashSignatures(docs, n = 3, k = 64)
      .orderBy("id").collect()
      .map(r => r.getAs[Long]("id") -> r.getSeq[Long](r.fieldIndex("sig"))).toMap
    assert(sigs(0L) === sigs(1L))
    assert(sigs(0L).size === 64)
    assert(sigs(0L) !== sigs(3L))
  }

  test("minhash LSH: exact duplicates are candidates with est_jaccard 1.0; " +
    "disjoint docs are not") {
    val cands = Dedup.minhashCandidates(docs, n = 3, k = 64, bands = 16, threshold = 0.2)
      .collect().map(r => (r.getAs[Long]("a_id"), r.getAs[Long]("b_id")) ->
        r.getAs[Double]("est_jaccard")).toMap
    assert(cands((0L, 1L)) === 1.0)
    assert(!cands.contains((0L, 3L)) && !cands.contains((1L, 3L)) && !cands.contains((2L, 3L)))
    // the near-dup pair (J = 7/8 per band row) must collide in ≥1 of 16 bands
    assert(cands.contains((0L, 2L)))
    assert(cands((0L, 2L)) >= 0.2)
  }

  test("minhash LSH ⊇ exact-Jaccard pairs at high threshold (sf0.001 corpus + planted dupes)") {
    val real = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), col("text"))
    // plant guaranteed near-dups so the containment check is non-vacuous
    val planted = real.where(col("doc_id") < 5)
      .select(col("doc_id") + 100000L as "doc_id", col("text"))
    val corpus = real.unionByName(planted)
    val exactPairs = Dedup.ngramJaccardPairs(corpus, corpus, n = 3, threshold = 0.9)
      .where(col("a_id") < col("b_id"))
      .collect().map(r => (r.getAs[Long]("a_id"), r.getAs[Long]("b_id"))).toSet
    assert(exactPairs.size >= 5, "planted duplicates must surface as exact pairs")
    val lshPairs = Dedup.minhashCandidates(corpus, n = 3, k = 64, bands = 16, threshold = 0.5)
      .collect().map(r => (r.getAs[Long]("a_id"), r.getAs[Long]("b_id"))).toSet
    val missed = exactPairs -- lshPairs
    assert(missed.isEmpty, s"LSH missed high-Jaccard pairs: $missed")
  }

  test("portable-hash LSH parity: md5-low64 and xxhash64 variants emit the " +
    "same candidate ID-pair set (sf0.001 corpus + planted dupes)") {
    // portableHash swaps ONLY the per-shingle base hash; both variants are
    // deterministic, and at this corpus the surviving (est_jaccard >= 0.5)
    // pair set must agree — the contract that lets the d11 oracle on the
    // portable variant stand in for the production chain.
    val real = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), col("text"))
    val planted = real.where(col("doc_id") < 5)
      .select(col("doc_id") + 100000L as "doc_id", col("text"))
    val corpus = real.unionByName(planted)
    def pairSet(portable: Boolean) =
      Dedup.minhashCandidates(corpus, n = 3, k = 64, bands = 16, threshold = 0.5,
          portableHash = portable)
        .collect().map(r => (r.getAs[Long]("a_id"), r.getAs[Long]("b_id"))).toSet
    val prod = pairSet(portable = false)
    val port = pairSet(portable = true)
    assert(prod.nonEmpty, "planted duplicates must surface as LSH pairs")
    assert(prod === port,
      s"prod-only=${prod -- port} portable-only=${port -- prod}")
  }

  test("containment (d09): sub-document scores ~1.0 where symmetric Jaccard is low") {
    // doc 10 = a 6-word fragment, doc 11 = a 40-word doc CONTAINING it
    val frag = "alpha beta gamma delta epsilon zeta"
    val host = ("lorem ipsum dolor sit amet " * 7).trim + " " + frag
    val corpus = Seq((10L, frag), (11L, host)).toDF("doc_id", "text")
    val cont = Dedup.containmentPairs(corpus, corpus, n = 3, threshold = 0.9)
      .collect().map(r => (r.getAs[Long]("a_id"), r.getAs[Long]("b_id")) ->
        r.getAs[Double]("containment")).toMap
    assert(cont((10L, 11L)) === 1.0) // every fragment shingle is in the host
    assert(!cont.contains((11L, 10L))) // host is NOT contained in the fragment
    val jac = Dedup.ngramJaccardPairs(corpus, corpus, n = 3, threshold = 0.9)
      .collect()
    assert(jac.isEmpty, "symmetric Jaccard must miss the sub-document pair")
  }

  test("approx (LSH) dedup clusters ≡ exact clusters at high threshold (planted dupes)") {
    val real = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), col("text"))
    val planted = real.where(col("doc_id") < 5)
      .select(col("doc_id") + 100000L as "doc_id", col("text"))
    val corpus = real.unionByName(planted)
    def asMap(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("cluster_id"), r.getAs[Long]("cluster_size"), r.getAs[Boolean]("is_survivor")))
      .toMap
    val exact = asMap(Dedup.dedupClusters(corpus, n = 3, threshold = 0.9))
    // LSH candidate threshold below the exact one: bucket recall is what's
    // under test, the est-Jaccard filter must not be the reason a pair is kept
    val approx = asMap(Dedup.dedupClustersApprox(corpus, n = 3, k = 64, bands = 16, threshold = 0.5))
    assert(exact.count { case (_, (_, sz, _)) => sz > 1 } >= 10, "planted dupes must cluster")
    // exact copies must land identically in both (LSH may add extra merges
    // at its lower threshold, so compare the planted block only)
    (0L until 5L).foreach { id =>
      assert(approx(id + 100000L)._1 === approx(id)._1, s"planted copy of $id not co-clustered")
      assert(exact(id + 100000L)._1 === exact(id)._1)
    }
  }

  test("hot-shingle cap only prunes ultra-common shingles (output stable below cap)") {
    val uncapped = Dedup.ngramJaccardPairs(docs, docs, n = 3, threshold = 0.2, maxDf = 1000L)
      .collect().map(_.toSeq).toSet
    val capped = Dedup.ngramJaccardPairs(docs, docs, n = 3, threshold = 0.2, maxDf = 3L)
      .collect().map(_.toSeq).toSet
    assert(uncapped === capped) // max DF here is 3 ("the quick brown" et al. ×3 docs)
  }

  test("simhash: identical docs equal; near-dups within small hamming distance; " +
    "disjoint docs far") {
    val sh = Dedup.simhashed(docs).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("simhash")).toMap
    def hamming(x: Long, y: Long): Int = java.lang.Long.bitCount(x ^ y)
    assert(sh(0L) === sh(1L))
    assert(hamming(sh(0L), sh(2L)) <= 16, "one-word change must stay close")
    assert(hamming(sh(0L), sh(3L)) > 16, "unrelated text must be far")
    // and the hammingDistance column function agrees with the JVM computation
    val viaCol = Seq((sh(0L), sh(2L))).toDF("a", "b")
      .select(Dedup.hammingDistance(col("a"), col("b")).cast("int").as("h"))
      .collect().head.getInt(0)
    assert(viaCol === hamming(sh(0L), sh(2L)))
  }

  test("native simhash64 expression ≡ declarative HOF construction (codegen showcase)") {
    // the session registers graft.plans.GraftExtensions, so simhashed()
    // takes the native-expression path; recompute the declarative form
    // inline and require bit-identical hashes on real data
    assert(spark.catalog.functionExists("simhash64"), "extensions must be registered")
    val real = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    def bitVotes(h: org.apache.spark.sql.Column) = array(
      (0 until 64).map(i =>
        when(shiftright(h, i).bitwiseAND(lit(1L)) =!= 0, lit(1L)).otherwise(lit(-1L))): _*)
    val folded = (0 until 64).map(i =>
      when(element_at(col("votes"), i + 1) > 0, lit(1L << i)).otherwise(lit(0L)))
      .reduce((a, b) => a.bitwiseOR(b))
    val declarative = real
      .select(col("doc_id"), TextAnalysis.tokens(col("text")).as("ws"))
      .select(col("doc_id"), transform(col("ws"), t => xxhash64(t)).as("hs"))
      .select(col("doc_id"), aggregate(col("hs"), array_repeat(lit(0L), 64),
        (acc, h) => zip_with(acc, bitVotes(h), _ + _)).as("votes"))
      .select(col("doc_id"), folded.as("simhash"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val native = Dedup.simhashed(real).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(native.size === declarative.size)
    assert(native === declarative)
  }

  test("connected components (d07): chain, triangle, and singletons resolve to min-id clusters") {
    // 0-1-2 is a chain (transitivity must glue 0 and 2 without a direct
    // edge), 5-6-7 a triangle, 3 and 9 singletons, edge 8-4 reversed
    // (src > dst) to prove orientation doesn't matter.
    val edges = Seq((0L, 1L), (1L, 2L), (5L, 6L), (6L, 7L), (5L, 7L), (8L, 4L))
      .toDF("src", "dst")
    val vertices = (0L to 9L).toDF("id")
    val cc = Dedup.connectedComponents(edges, vertices).collect()
      .map(r => r.getAs[Long]("id") -> r.getAs[Long]("cluster_id")).toMap
    assert(cc === Map(0L -> 0L, 1L -> 0L, 2L -> 0L, 3L -> 3L, 4L -> 4L,
      5L -> 5L, 6L -> 5L, 7L -> 5L, 8L -> 4L, 9L -> 9L))
  }

  test("connected components: long chain converges (diameter > 1 iteration)") {
    val n = 12L
    val edges = (0L until n - 1).map(i => (i, i + 1)).toDF("src", "dst")
    val cc = Dedup.connectedComponents(edges, (0L until n).toDF("id")).collect()
    assert(cc.forall(_.getAs[Long]("cluster_id") == 0L))
  }

  test("connected components: refuses to return partially-propagated labels at maxIter") {
    val edges = (0L until 11L).map(i => (i, i + 1)).toDF("src", "dst")
    val e = intercept[IllegalStateException] {
      Dedup.connectedComponents(edges, (0L until 12L).toDF("id"), maxIter = 2).collect()
    }
    assert(e.getMessage.contains("did not converge"))
  }

  test("contracted CC (large-star/small-star): agrees with propagation CC on mixed topology") {
    val edges = Seq((0L, 1L), (1L, 2L), (5L, 6L), (6L, 7L), (5L, 7L), (8L, 4L))
      .toDF("src", "dst")
    val vertices = (0L to 9L).toDF("id")
    val a = Dedup.connectedComponents(edges, vertices).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val b = Dedup.connectedComponentsContracted(edges, vertices).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(a === b)
  }

  test("contracted CC: diameter-63 chain resolves in O(log n) rounds (propagation would need 63)") {
    // the adversarial case the contraction exists for: maxIter = 12 is far
    // below the 63 propagation rounds the diameter demands but comfortably
    // above log2(64) — convergence here proves the edge-set restructuring
    // is doing the O(log n) work, not hop-by-hop label flow
    val n = 64L
    val edges = (0L until n - 1).map(i => (i, i + 1)).toDF("src", "dst")
    val cc = Dedup.connectedComponentsContracted(edges, (0L until n).toDF("id"),
      maxIter = 12).collect()
    assert(cc.forall(_.getAs[Long]("cluster_id") == 0L))
    assert(cc.length === n)
  }

  test("connected components: adversarial diameter-13 chain trips maxIter=10 and names the escape hatch") {
    // min-label propagation advances one hop per round, so a component
    // whose diameter exceeds maxIter CANNOT have converged — returning its
    // labels would silently split one true cluster into several, each
    // electing its own "survivor". The throw must fire, and the message
    // must point at the documented O(log n) escape hatch for adversarial
    // graphs (large-star/small-star contraction).
    val edges = (0L until 13L).map(i => (i, i + 1)).toDF("src", "dst")
    val e = intercept[IllegalStateException] {
      Dedup.connectedComponents(edges, (0L until 14L).toDF("id"), maxIter = 10).collect()
    }
    assert(e.getMessage.contains("did not converge"))
    assert(e.getMessage.contains("large-star/small-star"),
      s"message must name the contraction escape hatch, got: ${e.getMessage}")
  }

  test("dedup clusters (d07 shape): exact + near duplicates cluster, survivor is min id") {
    val out = Dedup.dedupClusters(docs, n = 3, threshold = 0.2).orderBy("doc_id").collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("cluster_id"),
        r.getAs[Long]("cluster_size"), r.getAs[Boolean]("is_survivor")))
    // A/B exact dups and C a near-dup of A → one cluster {0,1,2}; D alone.
    assert(out.toSeq === Seq((0L, 0L, 3L, true), (1L, 0L, 3L, false),
      (2L, 0L, 3L, false), (3L, 3L, 1L, true)))
  }

  test("native minhash_sig expression ≡ declarative shingle→hash→min chain") {
    val real = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), col("text"))
    assert(spark.catalog.functionExists("minhash_sig"))
    def sigMap(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => r.getAs[Long]("id") -> r.getSeq[Long](r.fieldIndex("sig"))).toMap
    val native = sigMap(Dedup.minhashSignatures(real, n = 3, k = 64))
    // declarative chain, built directly so the functionExists branch can't hide it
    val tok = real.select(col("doc_id").as("id"), TextAnalysis.tokens(col("text")).as("ws"))
      .where(size(col("ws")) >= 3)
    val declarative = sigMap(tok
      .select(col("id"), Dedup.shinglesFromTokens(col("ws"), 3).as("sh"))
      .select(col("id"), transform(col("sh"), s => xxhash64(s)).as("hs"))
      .select(col("id"), Dedup.minhashFromHashes(col("hs"), 64).as("sig")))
    assert(native.size === declarative.size)
    assert(native === declarative)
    // null tokens inside a window follow concat_ws null-skip; sub-n arrays
    // give the all-MaxValue signature
    import spark.implicits._
    val edge = Seq((0L, Seq[String]("a", null, "c", "d")), (1L, Seq[String]("x", "y")))
      .toDF("id", "ws")
    val nat = sigMap(edge.select(col("id"),
      call_function("minhash_sig", col("ws"), lit(3), lit(8), lit(42L)).as("sig")))
    val dec = sigMap(edge
      .select(col("id"), Dedup.shinglesFromTokens(col("ws"), 3).as("sh"))
      .select(col("id"), transform(col("sh"), s => xxhash64(s)).as("hs"))
      .select(col("id"), Dedup.minhashFromHashes(col("hs"), 8).as("sig")))
    assert(nat === dec)
    assert(nat(1L) === Seq.fill(8)(Long.MaxValue))
  }

  test("md5Low64 golden: signed low 8 bytes of md5 (cross-engine portable)") {
    // md5('abc') = 900150983cd24fb0 d6963f7d28e17f72; low 16 hex chars as
    // unsigned = 15462616177412505458, re-centered signed = value below
    // (independently computed in DuckDB — the d08 oracle's hash)
    val v = Seq("abc").toDF("t").select(Dedup.md5Low64(col("t"))).collect().head.getLong(0)
    assert(v === -2984127896297046158L)
  }

  test("portable simhash (d08): identical docs equal, near-dups close, disjoint far") {
    val sh = Dedup.simhashedPortable(docs).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("simhash")).toMap
    assert(sh(0L) === sh(1L))
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(ham(sh(0L), sh(2L)) <= 16)
    assert(ham(sh(0L), sh(3L)) > 16)
    // empty-token doc folds to 0 (matches the oracle's LEFT JOIN null votes)
    val empty = Dedup.simhashedPortable(Seq((9L, "")).toDF("doc_id", "text")).collect().head
    assert(empty.getAs[Long]("simhash") === 0L)
  }

  test("decontamination (d13): any shared shingle flags; short and disjoint docs stay clean") {
    val docs = Seq(
      (0L, "the quick brown fox jumps"),   // contamination doc
      (1L, "a quick brown fox runs home"), // shares "quick brown fox" → flagged
      (2L, "completely different words entirely"), // disjoint → clean
      (3L, "too short")                    // < 3 tokens, no shingles → clean
    ).toDF("doc_id", "text")
    val flags = Dedup.contaminationFlags(docs, docs.where(col("doc_id") === 0L), n = 3)
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[Boolean]("contaminated")).toMap
    assert(flags === Map(0L -> true, 1L -> true, 2L -> false, 3L -> false))
  }

  test("incremental dedup (d17): corpus dup beats batch-first; min-id keeps within batch") {
    val corpus = Seq((0L, "alpha beta"), (1L, "gamma delta")).toDF("doc_id", "text")
    val batch = Seq(
      (10L, "alpha  BETA "),   // normalizes to a corpus fp → dup_corpus
      (11L, "epsilon zeta"),   // novel, first → new
      (12L, "epsilon zeta"),   // same fp, larger id → dup_batch
      (13L, "eta theta")       // novel singleton → new
    ).toDF("doc_id", "text")
    val out = Dedup.incrementalDedup(corpus, batch)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("status")).toMap
    assert(out === Map(10L -> "dup_corpus", 11L -> "new",
      12L -> "dup_batch", 13L -> "new"))
  }

  test("incremental near-dup (d21): corpus match beats batch peer; short docs are new; " +
      "exact copies estimate 1.0; families agree") {
    // 24-token docs: one changed token kills 3 of 22 shingles (true
    // J = 19/25 = 0.76) — high enough that band collision and the 0.4
    // estimate threshold are both safe margins, while disjoint text
    // shares nothing
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu " +
      "nu xi omicron pi rho sigma tau upsilon phi chi psi omega"
    val corpus = Seq((0L, base), (1L, "one two three four five six seven eight nine ten eleven twelve"))
      .toDF("doc_id", "text")
    val batch = Seq(
      (10L, base),                              // exact corpus copy → dup_corpus @ 1.0
      (11L, base.replace("delta", "zulu")),     // near corpus copy → dup_corpus < 1.0
      (12L, "red orange yellow green blue indigo violet black white brown pink grey"),
      (13L, "red orange yellow green blue indigo violet black white brown pink grey"),
      (14L, "too short")                        // < n tokens → no signature → new
    ).toDF("doc_id", "text")
    def run(portable: Boolean) = Dedup.incrementalNearDup(corpus, batch,
        n = 3, k = 64, bands = 16, threshold = 0.4, portableHash = portable)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[String]("status"), Option(r.getAs[java.lang.Long]("match_id")).map(Long.unbox),
          Option(r.getAs[java.lang.Double]("est_jaccard")).map(Double.unbox)))).toMap
    val out = run(portable = true)
    assert(out(10L) === (("dup_corpus", Some(0L), Some(1.0))))
    assert(out(11L)._1 === "dup_corpus" && out(11L)._2 === Some(0L))
    assert(out(11L)._3.get < 1.0 && out(11L)._3.get >= 0.4)
    assert(out(12L) === (("new", None, None)))
    assert(out(13L) === (("dup_batch", Some(12L), Some(1.0))))
    assert(out(14L) === (("new", None, None)))
    // statuses agree across hash families (estimates are family-internal)
    assert(run(portable = false).view.mapValues(_._1).toMap ===
      out.view.mapValues(_._1).toMap)
  }

  test("bloom decontamination (d16): superset of exact flags; tiny filter forces " +
      "false positives but never false negatives") {
    val docs = Seq(
      (0L, "the quick brown fox jumps"),
      (1L, "a quick brown fox runs home"),
      (2L, "completely different words entirely"),
      (3L, "too short"),
      (4L, "spark engines cluster scheduling today now"),
      (5L, "another unrelated stretch of plain words here")
    ).toDF("doc_id", "text")
    val contam = docs.where(col("doc_id") === 0L)
    val exact = Dedup.contaminationFlags(docs, contam, n = 3)
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[Boolean]("contaminated")).toMap
    // generous filter: bloom ≡ exact at this scale (fpp ~0)
    val wide = Dedup.contaminationFlagsBloom(spark, docs, contam, n = 3,
        estItems = 1L << 14, numBits = 1L << 18)
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[Boolean]("bloom_hit")).toMap
    assert(wide === exact)
    // pathological filter: 64 bits (the sketch's bitset floor) at
    // estItems=1 gives ~44 hash functions, so a dozen inserted shingles
    // saturate every bit — false positives everywhere EXCEPT no-shingle
    // docs (nothing to probe), and still no false negatives (the
    // one-sided contract d16's bloom_ok flag asserts)
    val tiny = Dedup.contaminationFlagsBloom(spark, docs, contam, n = 3,
        estItems = 1L, numBits = 64L)
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[Boolean]("bloom_hit")).toMap
    exact.foreach { case (id, e) => if (e) assert(tiny(id), s"false negative on $id") }
    assert(tiny.count { case (id, b) => b && !exact(id) } > 0,
      "8-bit filter produced no false positives — probe path is not a bloom")
    assert(!tiny(3L), "no-shingle doc cannot be flagged")
  }

  test("duplicate spans (d15): overlapping spans union, same-doc repeats don't count, " +
      "short/empty docs zero") {
    val docs = Seq(
      (0L, "a b c d e f"),            // dup 3-gram starts 0,1 → union 4 tokens
      (1L, "x a b c d y"),            // dup starts 1,2 → union 4
      (2L, "p q r"),                  // no shared gram → 0
      (3L, "a b"),                    // < n tokens → no grams → 0
      (4L, ""),                       // empty → n_toks 0, ratio 0 (guarded division)
      (5L, "a b c z z z z b c d"),    // dup starts 0,7 — DISJOINT spans → 3+3=6
      (6L, "m n o m n o m n o")       // gram repeats only WITHIN this doc → not dup
    ).toDF("doc_id", "text")
    val out = Dedup.duplicateSpanCoverage(docs, n = 3).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_toks"), r.getAs[Long]("dup_tokens"), r.getAs[Double]("dup_ratio"))))
      .toMap
    assert(out(0L) === ((6L, 4L, 0.666667)))
    assert(out(1L) === ((6L, 4L, 0.666667)))
    assert(out(2L) === ((3L, 0L, 0.0)))
    assert(out(3L) === ((2L, 0L, 0.0)))
    assert(out(4L) === ((0L, 0L, 0.0)))
    assert(out(5L) === ((10L, 6L, 0.6)))
    assert(out(6L) === ((9L, 0L, 0.0)))
    // the xxhash64 production family (8-byte shuffle keys) must yield the
    // identical coverage — the result is hash-family-invariant absent a
    // 64-bit collision
    val xx = Dedup.duplicateSpanCoverage(docs, n = 3, portableHash = false)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_toks"), r.getAs[Long]("dup_tokens"), r.getAs[Double]("dup_ratio"))))
      .toMap
    assert(xx === out)
  }

  test("span trim (d18): removes merged dup islands; complement count ≡ d15 coverage") {
    val docs = Seq(
      (0L, "a b c d e f"),            // dup starts 0,1 → island [0,3] → keep "e f"
      (1L, "x a b c d y"),            // dup starts 1,2 → island [1,4] → keep "x y"
      (2L, "p q r"),                  // untouched
      (3L, "a b"),                    // < n → untouched
      (4L, ""),                       // empty stays empty
      (5L, "a b c z z z z b c d"),    // disjoint islands [0,2] and [7,9] → keep 3..6
      (6L, "m n o m n o m n o")       // within-doc repeats only → untouched
    ).toDF("doc_id", "text")
    val trim = Dedup.duplicateSpanTrim(docs, n = 3).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_toks"), r.getAs[Long]("n_kept"),
          r.getAs[String]("trimmed_text")))).toMap
    assert(trim(0L) === ((6L, 2L, "e f")))
    assert(trim(1L) === ((6L, 2L, "x y")))
    assert(trim(2L) === ((3L, 3L, "p q r")))
    assert(trim(3L) === ((2L, 2L, "a b")))
    assert(trim(4L) === ((0L, 0L, "")))
    assert(trim(5L) === ((10L, 4L, "z z z z")))
    assert(trim(6L) === ((9L, 9L, "m n o m n o m n o")))
    // the two span operators count the SAME positions: removed ≡ covered
    val cov = Dedup.duplicateSpanCoverage(docs, n = 3).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("dup_tokens")).toMap
    trim.foreach { case (id, (nToks, nKept, _)) =>
      assert(nToks - nKept === cov(id), s"doc $id trim/coverage drift")
    }
  }

  test("incremental spans (d20): corpus-covered, within-batch-dup, and novel spans") {
    val corpus = Seq(
      (0L, "a b c d e f g h i j")   // corpus grams: starts 0,1,2 (n=8)
    ).toDF("doc_id", "text")
    val batch = Seq(
      (10L, "a b c d e f g h i j"), // identical to corpus doc → full coverage
      (11L, "p q r s t u v w x y"), // novel, submitted once → 0
      (12L, "m n o p q r s t u v"), // shares batch grams with 13 → within-batch dup
      (13L, "m n o p q r s t u v"),
      (14L, "a b")                  // < n tokens → no grams → 0
    ).toDF("doc_id", "text")
    val out = Dedup.incrementalSpanCoverage(corpus, batch, n = 8).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_toks"), r.getAs[Long]("dup_tokens")))).toMap
    assert(out(10L) === ((10L, 10L))) // corpus membership → every position covered
    assert(out(11L) === ((10L, 0L)))  // novel batch doc untouched
    assert(out(12L) === ((10L, 10L))) // within-batch duplication still counts
    assert(out(13L) === ((10L, 10L)))
    assert(out(14L) === ((2L, 0L)))
    // corpus docs are NOT scored — output is batch-only
    assert(!out.contains(0L))
    // the xx production family yields identical coverage
    val xx = Dedup.incrementalSpanCoverage(corpus, batch, n = 8, portableHash = false)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_toks"), r.getAs[Long]("dup_tokens")))).toMap
    assert(xx === out)
  }

  test("rolling hash (t04): order-sensitive, deterministic, content-sensitive") {
    val h = Seq((0L, "alpha beta gamma"), (1L, "gamma beta alpha"),
        (2L, "alpha beta gamma"), (3L, "alpha beta gamma delta"))
      .toDF("doc_id", "text")
      .select(col("doc_id"), TextAnalysis.rollingHash(col("text")).as("fp"))
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("fp")).toMap
    assert(h(0L) === h(2L)) // deterministic
    assert(h(0L) !== h(1L)) // order-sensitive (the point vs. a set hash)
    assert(h(0L) !== h(3L)) // content-sensitive
  }

  test("persisted band index: bucketBy(bucket) probe join shuffles ONLY the batch side") {
    // the claim every LSH operator's scale note makes — "at 100 TB the
    // band index is the persisted artifact, bucketed by bucket, so
    // incremental batches probe without reshuffling the corpus" — held
    // up as an actual plan, not a comment
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val tbl = "graft_band_idx"
    spark.sql(s"DROP TABLE IF EXISTS $tbl")
    Dedup.bandBuckets(Dedup.minhashSignatures(docs, n = 3, k = 64), 16, 4)
      .withColumnRenamed("id", "corpus_id")
      .write.bucketBy(8, "bucket").sortBy("bucket").saveAsTable(tbl)
    val prior = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
    try {
      val batch = Dedup.bandBuckets(
          Dedup.minhashSignatures(docs.where(col("doc_id") < 20), n = 3, k = 64), 16, 4)
        .withColumnRenamed("id", "batch_id")
      val joined = spark.table(tbl).join(batch, Seq("bucket"))
        .where(col("corpus_id") =!= col("batch_id"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), s"expected SMJ, plan:\n$plan")
      assert(plan.contains("Bucketed: true"),
        s"the index scan must be bucketed, plan:\n$plan")
      val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
      assert(exchanges === 1,
        s"only the BATCH side may shuffle, got $exchanges exchanges, plan:\n$plan")
      assert(joined.count() > 0, "probe must actually find candidates")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prior)
      spark.sql(s"DROP TABLE IF EXISTS $tbl")
    }
  }

  test("cdc chunks (d23): a front insertion preserves every later chunk fingerprint") {
    // THE content-defined property: fixed-size blocks all shift after an
    // insertion; CDC boundaries are content-keyed, so only chunks up to
    // the first cut can change
    val rnd = new scala.util.Random(20260814L)
    val words = Seq.tabulate(200)(_ => s"w${rnd.nextInt(30)}")
    val base = words.mkString(" ")
    val shifted = "inserted " + base
    val out = Dedup.cdcChunkDedup(
        Seq((0L, base), (1L, shifted)).toDF("doc_id", "text"),
        w = 4, divisor = 16)
      .collect()
    val fps = out.groupBy(_.getAs[Long]("doc_id"))
      .map { case (id, rows) =>
        id -> rows.sortBy(_.getAs[Long]("chunk_idx")).map(_.getAs[String]("chunk_fp")).toSeq
      }
    val a = fps(0L)
    val b = fps(1L)
    assert(a.size >= 3, s"need several chunks for the property to bite, got ${a.size}")
    // all of a's chunks except (at most) the first survive verbatim in b
    assert(a.drop(1).forall(b.contains),
      s"post-insertion chunks must be unchanged: ${a.drop(1).diff(b)}")
    // and those shared chunks are flagged as corpus-level duplicates
    val dupFps = out.filter(_.getAs[Boolean]("is_dup"))
      .map(_.getAs[String]("chunk_fp")).toSet
    assert(a.drop(1).forall(dupFps.contains), "shared chunks must flag is_dup")
  }

  test("d27: tf-idf cosine — identical docs score 1, weighting beats raw overlap") {
    val dir = java.nio.file.Files.createTempDirectory("graft-d27").toString
    // docs 5/6 identical (the cosine-1 anchor); doc 1 shares ONE rare
    // term with 11 and ONE ubiquitous term with 10 (symmetric shapes, so
    // norms compare) — idf weighting must rank the rare-term pair higher
    Seq(
      (1L, "zebra the"),
      (11L, "zebra mmm nnn"),
      (10L, "the ppp qqq"),
      (5L, "copy copy text"),
      (6L, "copy copy text"),
      (12L, "the uu1 uu2"),
      (13L, "the vv1 vv2"),
      (14L, "the ww1 ww2"))
      .map { case (id, t) => (id, t, "en") }.toDF("doc_id", "text", "lang")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = SparkEntry.queries("d27_tfidf_cosine")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(got((5L, 6L)) == 1.0, s"identical docs must score exactly 1: $got")
    // the all-cosines (unthresholded) comparison: recompute driver-side
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .collect().map(r => r.getLong(0) -> r.getString(1).split(" ").toSeq).toMap
    val n = docs.size
    val dfm = docs.values.flatMap(_.distinct).groupBy(identity).view.mapValues(_.size).toMap
    def wv(id: Long) = docs(id).groupBy(identity).map { case (t, os) =>
      t -> BigDecimal(os.size * (math.log((1.0 + n) / (1.0 + dfm(t))) + 1.0))
        .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble }
    def cos(a: Long, b: Long): Double = {
      val (va, vb) = (wv(a), wv(b))
      val shared = va.keySet intersect vb.keySet
      val dot = shared.toSeq.sorted.map(t => va(t) * vb(t)).sum
      dot / (math.sqrt(va.values.map(x => x * x).sum) *
        math.sqrt(vb.values.map(x => x * x).sum))
    }
    assert(cos(1L, 11L) > cos(1L, 10L),
      "a shared rare term must outweigh shared stopwords")
  }

  test("d26: LSH-vs-exact metrics are consistent and match an independent set recompute") {
    val r = SparkEntry.queries("d26_lsh_eval")(spark, "/root/testdata/sf0.001")
      .collect().head
    val (nT, nE, tp) = (r.getLong(0), r.getLong(1), r.getLong(2))
    assert(tp <= math.min(nT, nE))
    assert(nT > 0, "the dup corpus must contain true pairs at the 0.4 gate")
    assert(r.getDouble(3) == tp.toDouble / nE && r.getDouble(4) == tp.toDouble / nT)
    // the compare itself does real work: recompute both pair sets and
    // check the intersection count independently
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val truth = graft.analytics.Dedup
      .ngramJaccardPairs(docs, docs, n = 3, threshold = 0.4, maxDf = 1000L)
      .where(col("a_id") < col("b_id"))
      .select("a_id", "b_id").collect().map(x => (x.getLong(0), x.getLong(1))).toSet
    val est = graft.analytics.Dedup
      .minhashCandidates(docs, n = 3, k = 64, bands = 16, threshold = 0.4,
        portableHash = true)
      .select("a_id", "b_id").collect().map(x => (x.getLong(0), x.getLong(1))).toSet
    assert((nT, nE, tp) ==
      (truth.size.toLong, est.size.toLong, (truth intersect est).size.toLong))
  }

  test("d29: quality survivor is a cluster member, unanimous per cluster, and diverges from min-id") {
    val out = SparkEntry.queries("d29_quality_survivors")(spark, "/root/testdata/sf0.001")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
    val members = out.groupBy(_._2)
    members.foreach { case (cid, rows) =>
      val survs = rows.map(_._3).distinct
      assert(survs.length == 1, s"cluster $cid must agree on one survivor: $survs")
      assert(rows.exists(_._1 == survs.head), s"survivor of $cid must be a member")
      assert(rows.count(_._4) == 1, s"exactly one keep=true in cluster $cid")
    }
    assert(out.exists(r => r._3 != r._2),
      "quality choice must genuinely diverge from the min-id convention somewhere")
  }

  test("exact Jaccard self-join (d32): BOTH regimes equal the all-pairs ground " +
    "truth — recall AND precision 1.0 (sf0.001 corpus)") {
    // brute-force ground truth: every pair, exact intersection, the same
    // integer gate 3·∩ ≥ |A|+|B| ⟺ J ≥ ½ — computed with array_intersect,
    // a third independent mechanism (neither bitmasks nor a token join)
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), col("text"))
    val ts = docs.select(col("doc_id"),
        array_distinct(TextAnalysis.tokens(col("text"))).as("ts"))
      .where(size(col("ts")) > 0)
    val truth = ts.as("a").crossJoin(ts.as("b"))
      .where(col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        size(array_intersect(col("a.ts"), col("b.ts"))).cast("long").as("inter"),
        size(col("a.ts")).cast("long").as("sza"), size(col("b.ts")).cast("long").as("szb"))
      .where(lit(3L) * col("inter") >= col("sza") + col("szb"))
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    assert(truth.size > 100, s"ground truth suspiciously small: ${truth.size}")
    def got(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => ((r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b")), r.getAs[Long]("inter"))).toMap
    // dense regime (this corpus: 31-token vocabulary)
    assert(got(Dedup.bitsetJaccardPairs(docs)) === truth)
    // dense regime, large-corpus expansion FORCED (smallCorpusMax = 0):
    // the chunked shuffle path must produce the identical answer the
    // broadcast path does — the regime switch may never change results
    assert(got(Dedup.bitsetJaccardPairs(docs, smallCorpusMax = 0L)) === truth)
    // sparse regime forced onto the SAME dense corpus: the length and
    // positional filters must be exactness-preserving even where they
    // barely prune — the round-12 candidate-explosion regression would
    // fail the RUNTIME here, this asserts it can never fail the ANSWER
    assert(got(Dedup.ppjoinPairs(docs)) === truth)
    // adaptive entry point picks a regime without changing the answer
    assert(got(Dedup.jaccardSelfJoin(docs)) === truth)
  }

  test("jaccardSelfJoin routes a rich MASK space to PPJoin (denseMaskMax " +
    "gate) and stays exact") {
    // the r14 finding: a ≤64-token vocabulary does NOT bound the distinct
    // mask count M, and the dense candidate stage is M×M. A forced tiny
    // denseMaskMax must route this dense-vocabulary corpus (well under 64
    // tokens, but >4 distinct masks) to the sparse regime with the answer
    // unchanged — the regime switch may never change results.
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), col("text"))
    val dense = Dedup.jaccardSelfJoin(docs).collect()
      .map(r => ((r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b")), r.getAs[Long]("inter"))).toMap
    val routed = Dedup.jaccardSelfJoin(docs, denseMaskMax = 4L).collect()
      .map(r => ((r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b")), r.getAs[Long]("inter"))).toMap
    assert(dense.size > 100, s"fixture suspiciously small: ${dense.size}")
    assert(routed === dense)
  }

  test("jaccardSelfJoin routes a >64-token vocabulary to PPJoin and stays exact") {
    import spark.implicits._
    // sliding 10-token windows over a 79-token vocabulary: doc i pairs
    // with i±1..3 (J = 9/11, 8/12, 7/13 ≥ ½) and NOT i±4 (6/14 < ½)
    val docs = (0 until 70)
      .map(i => (i.toLong, (i until i + 10).map(j => s"w$j").mkString(" ")))
      .toDF("doc_id", "text")
    val got = Dedup.jaccardSelfJoin(docs).collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))).toSet
    val want = (for {
      i <- 0 until 70; d <- 1 to 3; if i + d < 70
    } yield (i.toLong, (i + d).toLong)).toSet
    assert(got === want)
  }

  test("exact repeats (d34): planted ground truth — maximal runs recovered " +
    "with exact offsets/lengths, sub-threshold runs absent, within-doc " +
    "repeats found, every occurrence of a 3-way repeat covered") {
    import spark.implicits._
    // all non-planted tokens are globally unique, so the ONLY repeats are
    // the planted ones and extension can never leak past a run boundary
    def toks(p: String, r: Range) = r.map(i => s"$p$i")
    val run20 = toks("r", 1 to 20) // the 20-token planted run
    val run7 = toks("s", 1 to 7)   // 7 < minLen=8 → must NOT be reported
    val run10 = toks("t", 1 to 10) // within-doc repeat
    val docs = Seq(
      (1L, (toks("a", 1 to 10) ++ run20 ++ toks("a", 11 to 20)).mkString(" ")),
      (2L, (toks("b", 1 to 10) ++ run20 ++ toks("b", 11 to 20)).mkString(" ")),
      (3L, (toks("c", 1 to 8) ++ run7 ++ toks("c", 9 to 16)).mkString(" ")),
      (4L, (toks("d", 1 to 5) ++ run10 ++ toks("d", 6 to 9) ++ run10).mkString(" ")),
      (5L, (toks("e", 1 to 5) ++ run20 ++ toks("e", 6 to 10)).mkString(" ")))
      .toDF("doc_id", "text")
    val got = Dedup.maximalExactRepeats(docs, k = 5, w = 4, minLen = 8)
      .collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("a_start"),
        r.getAs[Long]("doc_b"), r.getAs[Long]("b_start"),
        r.getAs[Long]("rep_len"))).toSet
    // adjacent-occurrence pairing on the (id, pos)-sorted list: the
    // 3-way run pairs 1–2 and 2–5 (not 1–5) — every occurrence covered
    val want = Set(
      (1L, 10L, 2L, 10L, 20L),
      (2L, 10L, 5L, 5L, 20L),
      (4L, 5L, 4L, 19L, 10L))
    assert(got === want, s"got $got")
  }

  test("exact repeats (d34): a bare-k-gram interleaver cannot mask a " +
    "qualifying repeat — context-ordered adjacency sorts it away") {
    import spark.implicits._
    // docs 6 and 8 share run8 = u1..u8 (exactly w+k-1 = the guarantee
    // threshold) surrounded by unique tokens; they share EXACTLY ONE
    // winnowed fingerprint (the u1..u5 gram — asserted as a fixture
    // precondition). Doc 7 is that bare 5-token gram and nothing else:
    // under (id, pos)-ordered adjacency it interleaved the occurrence
    // list — pairs (6,7) and (7,8) both extend to rep_len 5 < 8 and the
    // real (6,8) repeat was silently LOST (the r14 review finding).
    // Context ordering sorts doc 7's short context first, keeping 6 and
    // 8 adjacent.
    def toks(p: String, r: Range) = r.map(i => s"$p$i")
    val run8 = toks("u", 1 to 8)
    val a = (toks("x1", 1 to 6) ++ run8 ++ toks("x1", 7 to 12)).mkString(" ")
    val b = (toks("y1", 1 to 6) ++ run8 ++ toks("y1", 7 to 12)).mkString(" ")
    val pair = Seq((6L, a), (8L, b)).toDF("doc_id", "text")
    val fps = Dedup.winnowedFingerprints(pair, k = 5, w = 4)
      .select(col("doc_id"), col("h")).collect()
      .groupBy(_.getLong(0)).map { case (d, rs) => d -> rs.map(_.getLong(1)).toSet }
    assert(fps(6L).intersect(fps(8L)).size === 1,
      "fixture precondition: exactly one shared fingerprint between 6 and 8")
    val docs = pair.unionByName(
      Seq((7L, run8.take(5).mkString(" "))).toDF("doc_id", "text"))
    val got = Dedup.maximalExactRepeats(docs, k = 5, w = 4, minLen = 8)
      .collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("a_start"),
        r.getAs[Long]("doc_b"), r.getAs[Long]("b_start"),
        r.getAs[Long]("rep_len"))).toSet
    assert(got === Set((6L, 6L, 8L, 6L, 8L)),
      s"the 8-token repeat must survive the interleaver: $got")
  }

  test("winnowing (d31): Schleimer guarantee — any shared run of ≥ w+k−1 " +
    "tokens yields ≥ 1 shared fingerprint (30 planted pairs)") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    val k = 5; val w = 4
    // each pair: two docs of independent noise with the SAME planted run
    // of exactly w+k−1 = 8 tokens at different offsets — the minimum
    // length the guarantee covers, so it is tested at its boundary
    val rows = (0 until 30).flatMap { p =>
      val run = (0 until (k + w - 1)).map(i => s"r${p}x$i")
      def noise(n: Int) = (0 until n).map(_ => s"n${rnd.nextInt(100000)}")
      Seq((p * 2L, (noise(rnd.nextInt(20) + k) ++ run ++ noise(rnd.nextInt(20) + k)).mkString(" ")),
        (p * 2 + 1L, (noise(rnd.nextInt(20) + k) ++ run ++ noise(rnd.nextInt(20) + k)).mkString(" ")))
    }
    val fps = Dedup.winnowedFingerprints(rows.toDF("doc_id", "text"), k = k, w = w)
      .select(col("doc_id"), col("h")).collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
    (0 until 30).foreach { p =>
      assert((fps(p * 2L) intersect fps(p * 2 + 1L)).nonEmpty,
        s"pair $p shares an 8-token run but no fingerprint — guarantee violated")
    }
  }

  test("winnowing (d31): rightmost-min tie rule (MOSS) on an all-equal-hash doc") {
    import spark.implicits._
    // 12 copies of one token: all 8 gram hashes are EQUAL, so every
    // window of w=4 grams is a pure tie — the MOSS rule selects the
    // RIGHTMOST minimum, i.e. window j selects position j+3: {3..7}.
    // A leftmost-tie implementation would emit {0..4} and fail.
    val one = Seq((0L, Seq.fill(12)("x").mkString(" "))).toDF("doc_id", "text")
    val pos = Dedup.winnowedFingerprints(one, k = 5, w = 4)
      .select(col("pos")).collect().map(_.getLong(0)).toSet
    assert(pos === Set(3L, 4L, 5L, 6L, 7L))
  }

  test("winnowing (d31): fingerprint density lands near the 2/(w+1) theory value") {
    // Schleimer et al. §5: expected density of winnowing with window w on
    // random hashes is 2/(w+1) — 0.4 at w=4. Short docs inflate it
    // (boundary windows), so assert a generous band, not the asymptote.
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), col("text"))
    val fps = Dedup.winnowedFingerprints(docs, k = 5, w = 4)
    val r = fps.groupBy(col("doc_id"))
      .agg(first(col("n_grams")).as("g"), count(lit(1)).as("f"))
      .agg(sum(col("f")).cast("double").as("f"), sum(col("g")).cast("double").as("g"))
      .collect().head
    val frac = r.getDouble(0) / r.getDouble(1)
    assert(frac > 0.25 && frac < 0.7, s"fp density $frac out of band around 2/(w+1)=0.4")
  }

  test("d35 dedup sweep: both measures monotone non-increasing in the " +
      "threshold; the lowest level ties back to the raw pair table") {
    val dir = "/root/testdata/sf0.001"
    val got = SparkEntry.queries("d35_dedup_sweep")(spark, dir)
      .orderBy("threshold").collect()
      .map(r => (r.getDouble(0), r.getLong(1), r.getLong(2)))
    assert(got.map(_._1).toSeq === Seq(0.05, 0.5, 0.9))
    // raising the threshold can only drop pairs, and dropping pairs can
    // only shrink the affected-doc set
    assert(got.map(_._2).sliding(2).forall(w => w(0) >= w(1)), s"${got.toSeq}")
    assert(got.map(_._3).sliding(2).forall(w => w(0) >= w(1)), s"${got.toSeq}")
    // level 0.05 IS the unfiltered pair table
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val raw = graft.analytics.Dedup.ngramJaccardPairs(
      docs.where(col("doc_id") < 50), docs, n = 3, threshold = 0.05,
      maxDf = 1000L).count()
    assert(got.head._2 === raw, s"base level ${got.head._2} != raw pairs $raw")
  }

  test("d36 LSH band sweep: on the power-of-two grid candidate sets nest, " +
      "so recall and n_est are non-decreasing in bands; n_true is the " +
      "shared ground truth at every level") {
    val dir = "/root/testdata/sf0.001"
    val got = SparkEntry.queries("d36_lsh_sweep")(spark, dir)
      .orderBy("bands").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(6)))
    assert(got.map(_._1).toSeq === Seq(4L, 8L, 16L, 32L))
    assert(got.map(t => t._1 * t._2).forall(_ === 64L), "grid must tile k")
    // one shared truth: every level compares against the same pair set
    assert(got.map(_._3).distinct.length === 1, s"${got.toSeq}")
    // a width-2r band match implies both width-r halves match, so each
    // finer level's candidate set CONTAINS the coarser one's — after the
    // common est filter, n_est and tp (hence recall) cannot decrease
    assert(got.map(_._4).sliding(2).forall(w => w(0) <= w(1)), s"${got.toSeq}")
    assert(got.map(_._5).sliding(2).forall(w => w(0) <= w(1)), s"${got.toSeq}")
    assert(got.map(_._6).sliding(2).forall(w => w(0) <= w(1)), s"${got.toSeq}")
  }

  test("d37 simhash radius sweep: radii nest so n_est/tp/recall are " +
      "non-decreasing; every level's pairs sit inside the block-collision " +
      "candidate volume; radius 0 equals exact fingerprint collisions") {
    val dir = "/root/testdata/sf0.001"
    val got = SparkEntry.queries("d37_simhash_sweep")(spark, dir)
      .orderBy("radius").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(got.map(_._1).toSeq === Seq(0L, 1L, 2L, 3L))
    // one shared truth and one shared candidate volume across levels
    assert(got.map(_._3).distinct.length === 1, s"${got.toSeq}")
    assert(got.map(_._2).distinct.length === 1, s"${got.toSeq}")
    // hd <= r is monotone in r; the pigeonhole candidate set bounds all
    assert(got.map(_._4).sliding(2).forall(w => w(0) <= w(1)), s"${got.toSeq}")
    assert(got.map(_._5).sliding(2).forall(w => w(0) <= w(1)), s"${got.toSeq}")
    assert(got.forall(t => t._4 <= t._2), s"${got.toSeq}")
    // radius 0 = pairs sharing the EXACT fingerprint — independently
    // recomputed from the portable simhash table
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val exact0 = graft.analytics.Dedup.simhashedPortable(docs)
      .groupBy(col("simhash")).agg(count(lit(1)).as("n"))
      .where(col("n") >= 2)
      .select(sum(col("n") * (col("n") - 1) / 2).cast("long")).collect()(0).getLong(0)
    assert(got.head._4 === exact0,
      s"radius-0 pairs ${got.head._4} != fingerprint collision pairs $exact0")
  }
}
