package graft

import org.apache.spark.sql.functions._

import graft.analytics.Similarity

/** B4 — similarity search: cosine goldens, brute-force exactness on a
  * constructed corpus, and the LSH recall floor vs the exact baseline that
  * SURVEY §2-B4 promises (s02 has no SQL twin — seeded hyperplanes).
  */
class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  test("cosine goldens: parallel=1, orthogonal=0, zero-norm=null") {
    val df = Seq(
      (Array(1f, 0f), Array(1f, 0f)),
      (Array(1f, 0f), Array(0f, 1f)),
      (Array(1f, 0f), Array(-1f, 0f)),
      (Array(0f, 0f), Array(1f, 0f))
    ).toDF("a", "b").select(Similarity.cosine(col("a"), col("b")).as("sim"))
    val got = df.collect().map(r => if (r.isNullAt(0)) None else Some(r.getDouble(0))).toSeq
    assert(got === Seq(Some(1.0), Some(0.0), Some(-1.0), None))
  }

  test("brute-force top-k is exact on a constructed corpus") {
    // probe 0 = e1; corpus along known angles — exact ranking is analytic
    val corpus = Seq(
      (0L, Array(1f, 0f)), // the probe itself (excluded)
      (1L, Array(0.9f, 0.1f)),
      (2L, Array(0.5f, 0.5f)),
      (3L, Array(0f, 1f)),
      (4L, Array(-1f, 0f))
    ).toDF("vec_id", "embedding")
    val top = Similarity.bruteForceTopK(corpus, corpus.where(col("vec_id") === 0), k = 3)
      .orderBy("rank").collect()
    assert(top.map(_.getAs[Long]("neighbor_id")).toSeq === Seq(1L, 2L, 3L))
    assert(top.map(_.getAs[Long]("rank")).toSeq === Seq(1L, 2L, 3L))
  }

  test("LSH top-k recall ≥ 0.6 vs brute force on sf0.001 embeddings (seeded planes)") {
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val probes = e.where(col("vec_id") < 10)
    def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.collect().map(r => (r.getAs[Long]("probe_id"), r.getAs[Long]("neighbor_id"))).toSet
    val exact = pairs(Similarity.bruteForceTopK(e, probes, k = 5))
    val approx = pairs(Similarity.lshTopK(e, probes, k = 5,
      nTables = 16, planesPerTable = 4, dim = 64))
    assert(exact.size === 50)
    val recall = (exact intersect approx).size.toDouble / exact.size
    assert(recall >= 0.6, s"recall $recall below floor; |approx|=${approx.size}")
  }

  test("s21 beam search: recall ≥ 0.6 vs brute force on sf0.001; more rounds " +
      "never lose scored ground, and all output ranks on (sim desc, id)") {
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val probes = e.where(col("vec_id") < 10)
    def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.collect().map(r => (r.getAs[Long]("probe_id"), r.getAs[Long]("neighbor_id"))).toSet
    val exact = pairs(Similarity.bruteForceTopK(e, probes, k = 5))
    val beam = Similarity.beamSearchTopK(e, probes, k = 5,
      beamWidth = 16, rounds = 3, nTables = 8, planesPerTable = 8, dim = 64,
      graphK = 8)
    val got = pairs(beam)
    assert(exact.size === 50)
    val recall = (exact intersect got).size.toDouble / exact.size
    assert(recall >= 0.6, s"recall $recall below floor; |got|=${got.size}")
    // every probe fills k (graph + entries always reachable)
    val counts = beam.groupBy("probe_id").count().collect().map(_.getLong(1))
    assert(counts.forall(_ === 5L))
    // monotonicity: an extra expansion round can only grow the scored
    // set, so round-5 top-5 similarity sums dominate round-4's per probe
    val beam4 = Similarity.beamSearchTopK(e, probes, k = 5,
      beamWidth = 16, rounds = 5, nTables = 8, planesPerTable = 8, dim = 64,
      graphK = 8)
    def simSum(df: org.apache.spark.sql.DataFrame): Map[Long, Double] =
      df.groupBy("probe_id").agg(sum("sim").as("s")).collect()
        .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val s3 = simSum(beam)
    simSum(beam4).foreach { case (p, s4) =>
      assert(s4 >= s3(p) - 1e-9, s"probe $p lost scored ground: $s4 < ${s3(p)}")
    }
  }

  test("s27 PQ m-sweep: grid tiles dim, one shared exact baseline, " +
      "recall in bounds, and the m=8 level equals s07's standalone top-k") {
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val probes = e.where(col("vec_id") < 10)
    val got = Similarity.pqMSweep(e, probes, k = 5, mGrid = Seq(4, 8, 16),
        ks = 16, dim = 64)
      .orderBy("m").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5)))
    assert(got.map(_._1).toSeq === Seq(4L, 8L, 16L))
    assert(got.forall(t => t._1 * t._2 === 64L), "grid must tile dim")
    assert(got.forall(t => t._1 === t._3), "one code byte per subspace")
    assert(got.map(_._4).distinct.toSeq === Seq(50L), "shared exact baseline")
    assert(got.forall(t => t._5 >= 0 && t._5 <= t._4 &&
      t._6 >= 0.0 && t._6 <= 1.0))
    // the m=8 level's hits are exactly what s07's standalone operator
    // would score (same codebook recipe, same ADC) — cross-checked
    val s07 = Similarity.pqTopK(e, probes, k = 5, m = 8, ks = 16, dim = 64)
      .select(col("probe_id"), col("neighbor_id"))
    val exact = Similarity.bruteForceTopK(e, probes, k = 5, round6 = true)
      .select(col("probe_id"), col("neighbor_id"))
    val hits8 = exact.join(s07, Seq("probe_id", "neighbor_id"), "left_semi").count()
    assert(got.find(_._1 == 8L).get._5 === hits8)
  }

  test("s26 hierarchical beam: recall >= s21's flat walk at equal beam/" +
      "rounds/graph, every probe fills k, output ranked on (sim desc, id)") {
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val probes = e.where(col("vec_id") < 10)
    def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.collect().map(r => (r.getAs[Long]("probe_id"), r.getAs[Long]("neighbor_id"))).toSet
    val exact = pairs(Similarity.bruteForceTopK(e, probes, k = 5))
    val flat = pairs(Similarity.beamSearchTopK(e, probes, k = 5,
      beamWidth = 16, rounds = 3, nTables = 8, planesPerTable = 8, dim = 64,
      graphK = 8))
    val hier = Similarity.hierarchicalBeamTopK(e, probes, k = 5,
      beamWidth = 16, rounds = 3, descentRounds = 4, coarseGraphK = 4,
      nTables = 8, planesPerTable = 8, dim = 64, graphK = 8)
    val got = pairs(hier)
    val rFlat = (exact intersect flat).size.toDouble / exact.size
    val rHier = (exact intersect got).size.toDouble / exact.size
    // the r15-verdict acceptance bar: a probe-local descended entry set
    // must not walk worse than beamWidth arbitrary lowest-id entries
    assert(rHier >= rFlat, s"hier recall $rHier < flat recall $rFlat")
    val counts = hier.groupBy("probe_id").count().collect().map(_.getLong(1))
    assert(counts.forall(_ === 5L))
    // ranks are (sim desc, id asc) within each probe
    hier.collect().groupBy(_.getAs[Long]("probe_id")).foreach { case (_, rs) =>
      val byRank = rs.sortBy(_.getAs[Long]("rank"))
        .map(r => (r.getAs[Double]("sim"), r.getAs[Long]("neighbor_id")))
      assert(byRank.zip(byRank.tail).forall { case ((s1, i1), (s2, i2)) =>
        s1 > s2 || (s1 == s2 && i1 < i2)
      })
    }
  }

  test("s22 MaxSim: driver replay on sf0.001 is bit-exact; self-doc excluded; " +
      "every probe fills k") {
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val got = Similarity.maxSimTopK(e, probeDocs = Seq(0L, 1L), k = 5,
      tokensPerDoc = 8).orderBy("probe_doc", "rank").collect()
      .map(r => (r.getAs[Long]("probe_doc"), r.getAs[Long]("rank"),
        r.getAs[Long]("neighbor_doc"), r.getAs[Double]("score")))
    // driver replay: same bagging, round-6 cosine before the max, exact
    // decimal fold for the sum — independent arithmetic path, same answer
    val vecs = e.orderBy("vec_id").collect()
      .map(r => (r.getAs[Long]("vec_id"),
        r.getAs[scala.collection.Seq[Float]]("embedding").map(_.toDouble).toArray))
    val byDoc = vecs.groupBy(_._1 / 8).view.mapValues(_.map(_._2)).toMap
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0
      for (i <- a.indices) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i) }
      d / (math.sqrt(na) * math.sqrt(nb))
    }
    val want = Seq(0L, 1L).flatMap { qd =>
      val scoresFor = byDoc.keys.filter(_ != qd).map { cd =>
        val s = byDoc(qd).map { qt =>
          byDoc(cd).map(ct =>
            BigDecimal(cos(qt, ct)).setScale(6, BigDecimal.RoundingMode.HALF_UP)
          ).max
        }.sum
        (cd, s.toDouble)
      }.toSeq
      scoresFor.sortBy { case (cd, s) => (-s, cd) }.take(5).zipWithIndex
        .map { case ((cd, s), i) => (qd, (i + 1).toLong, cd, s) }
    }
    assert(got.length === 10 && got.toSeq === want)
    // the self-document never appears as its own neighbor
    assert(got.forall { case (qd, _, nd, _) => qd != nd })
  }

  test("s23 k-center greedy: driver replay on sf0.001 matches move for move; " +
      "selection radius is monotone; ids distinct") {
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val got = Similarity.kCenterGreedy(e, k = 6).orderBy("sel_order").collect()
      .map(r => (r.getAs[Long]("sel_order"), r.getAs[Long]("vec_id"),
        Option(r.getAs[Any]("max_sim_prev")).map(_.asInstanceOf[Double])))
    // independent arithmetic replay: same seed (min id), same per-round
    // argmin of HALF_UP-round-6 max-cosine with id tie-break
    val vecs = e.orderBy("vec_id").collect()
      .map(r => (r.getAs[Long]("vec_id"),
        r.getAs[scala.collection.Seq[Float]]("embedding").map(_.toDouble).toArray))
    def cos6(a: Array[Double], b: Array[Double]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0
      for (i <- a.indices) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i) }
      BigDecimal(d / (math.sqrt(na) * math.sqrt(nb)))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    var sel = Vector((vecs.minBy(_._1)._1, Option.empty[Double]))
    def vecAt(id: Long): Array[Double] = vecs.find(_._1 == id).get._2
    for (_ <- 2 to 6) {
      val scored = vecs.map { case (id, v) =>
        (id, sel.map { case (sid, _) => cos6(v, vecAt(sid)) }.max)
      }
      val (nid, ms) = scored.minBy { case (id, ms) => (ms, id) }
      sel :+= ((nid, Some(ms)))
    }
    val want = sel.zipWithIndex.map { case ((id, ms), i) => ((i + 1).toLong, id, ms) }
    assert(got.toSeq === want)
    // farthest-point invariants: the chosen point's similarity to the
    // selected set can only rise as the set grows, and picks never repeat
    val radii = got.flatMap(_._3)
    assert(radii.zip(radii.tail).forall { case (a, b) => a <= b })
    assert(got.map(_._2).distinct.length === got.length)
  }

  test("s23 k-center greedy guards (r15 ADVICE): distinct ids even on an " +
      "all-duplicate corpus; empty corpus and k > corpus size fail loudly") {
    // every vector identical → every round's max-cosine rounds to 1.0;
    // the selected-id anti-filter (not fixture luck) must keep picks
    // distinct
    val dup = Seq.tabulate(4)(i => (i.toLong, Array(1.0f, 2.0f, 3.0f)))
      .toDF("vec_id", "embedding")
    val ids = Similarity.kCenterGreedy(dup, k = 4).orderBy("sel_order")
      .collect().map(_.getAs[Long]("vec_id"))
    assert(ids.toSeq === Seq(0L, 1L, 2L, 3L))
    val empty = dup.where(col("vec_id") < 0)
    val e1 = intercept[IllegalArgumentException] {
      Similarity.kCenterGreedy(empty, k = 2)
    }
    assert(e1.getMessage.contains("empty"))
    val e2 = intercept[IllegalArgumentException] {
      Similarity.kCenterGreedy(dup, k = 5)
    }
    assert(e2.getMessage.contains("exceeds corpus row count"))
  }

  test("s25 ivfRecallSweep: recall is monotone in nProbe, and probing all " +
      "cells degenerates to exact brute force (recall exactly 1.0)") {
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val got = graft.analytics.Similarity
      .ivfRecallSweep(e, e.where(col("vec_id") < 10), k = 5, nCells = 16,
        probeCounts = Seq(1, 2, 4, 8, 16))
      .orderBy("n_probe").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(got.length === 5 && got.forall(_._2 === 50L),
      s"10 probes × k=5 exact baselines: ${got.toSeq}")
    // a larger probe count only ADDS candidates, and any candidate able
    // to displace a true top-k member is itself a true top-k member —
    // hits are monotone non-decreasing
    val hits = got.map(_._3)
    assert(hits.zip(hits.tail).forall { case (a, b) => a <= b },
      s"recall must be monotone in nProbe: ${got.toSeq}")
    // nProbe = nCells reaches every vector's home cell: exact recall
    assert(got.last._4 === 1.0,
      s"probing all cells must BE brute force: ${got.toSeq}")
    assert(got.head._4 < 1.0,
      s"one cell must lose neighbors on this corpus: ${got.toSeq}")
  }

  test("s24 semanticChunks: hand-computed breaks — drift opens a chunk, " +
      "coherence doesn't, zero-norm reads null and never breaks") {
    import spark.implicits._
    // doc 0 (ids 0-2): steady, steady, REVERSED → break at pos 2
    // doc 1 (ids 3-5): all aligned → one chunk
    // doc 2 (ids 6-8): zero vector in the middle → null cosines, no break
    val vecs = Seq(
      (0L, Array(1f, 0f)), (1L, Array(0.9f, 0.1f)), (2L, Array(-1f, 0f)),
      (3L, Array(0f, 1f)), (4L, Array(0f, 2f)), (5L, Array(0f, 0.5f)),
      (6L, Array(1f, 1f)), (7L, Array(0f, 0f)), (8L, Array(1f, 1f))
    ).toDF("vec_id", "embedding")
    val got = graft.analytics.Similarity
      .semanticChunks(vecs, tokensPerDoc = 3, minCos = -0.1)
      .orderBy("doc", "pos").collect()
      .map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getDouble(2)),
        if (r.isNullAt(3)) None else Some(r.getBoolean(3)),
        r.getLong(4)))
    assert(got.length === 9)
    // doc 0: pos 0 headless; pos 1 coherent (cos ≈ .993); pos 2 reversed
    assert(got(0) == ((0L, 0L, None, None, 0L)))
    assert(got(1)._4 == Some(false) && got(1)._5 === 0L)
    // cos((0.9,0.1), (-1,0)) = -0.9/√0.82 → round-6 −0.993884
    assert(got(2)._3 == Some(-0.993884) && got(2)._4 == Some(true) && got(2)._5 === 1L,
      s"a reversed vector must open a chunk: ${got(2)}")
    // doc 1: scaling never breaks (cosine is scale-invariant)
    assert(got.slice(3, 6).forall(_._5 === 0L), s"aligned doc split: ${got.toSeq}")
    // doc 2: zero-norm neighbor → null cosine on BOTH sides of it, no break
    assert(got(7)._3 === None && got(8)._3 === None)
    assert(got.slice(6, 9).forall(_._5 === 0L),
      s"null cosines must never open chunks: ${got.toSeq}")
  }

  test("native vec_dot ≡ declarative zip_with/aggregate dot (incl. null semantics)") {
    assert(spark.catalog.functionExists("vec_dot"))
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val both = e.select(
      call_function("vec_dot", col("embedding"), col("embedding")).as("native"),
      Similarity.dot(col("embedding"), col("embedding")).as("declarative"))
      .collect()
    both.foreach(r => assert(
      java.lang.Double.doubleToLongBits(r.getDouble(0)) ===
        java.lang.Double.doubleToLongBits(r.getDouble(1))))
    // mismatched lengths and null elements → null, like zip_with+aggregate
    val edge = Seq(
      (Array(1f, 2f), Array(1f, 2f, 3f)),
      (Array(1f, 2f), Array(3f, 4f))
    ).toDF("a", "b").select(call_function("vec_dot", col("a"), col("b")).as("d")).collect()
    assert(edge(0).isNullAt(0))
    assert(edge(1).getDouble(0) === 11.0)
  }

  test("native lsh_sign_buckets ≡ declarative signBits construction") {
    assert(spark.catalog.functionExists("lsh_sign_buckets"))
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val seed = 42L; val nTables = 16; val b = 4; val dim = 64
    val native = e.select(col("vec_id"),
      call_function("lsh_sign_buckets", col("embedding"),
        lit(seed), lit(nTables), lit(b), lit(dim)).as("buckets"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    // declarative form, mirroring Similarity's private signBits
    val tables = (0 until nTables).map(t => Similarity.hyperplanes(b, dim, seed + t))
    def signBits(planes: Seq[Array[Double]]): org.apache.spark.sql.Column =
      planes.zipWithIndex.map { case (p, i) =>
        val dot = aggregate(
          zip_with(col("embedding"), typedLit(p.toSeq), (x, w) => x.cast("double") * w),
          lit(0.0), (acc, v) => acc + v)
        when(dot >= 0, lit(1L << i)).otherwise(lit(0L))
      }.reduce((a, c) => a.bitwiseOR(c))
    val declarative = e.select(col("vec_id"),
      array(tables.map(signBits): _*).as("buckets"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(native.size === declarative.size)
    assert(native === declarative)
  }

  test("IVF top-k recall ≥ 0.5 vs brute force on sf0.001 embeddings (deterministic quantizer)") {
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val probes = e.where(col("vec_id") < 10)
    def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.collect().map(r => (r.getAs[Long]("probe_id"), r.getAs[Long]("neighbor_id"))).toSet
    val exact = pairs(Similarity.bruteForceTopK(e, probes, k = 5))
    val approx = pairs(Similarity.ivfTopK(e, probes, k = 5, nCells = 16, nProbe = 8))
    val recall = (exact intersect approx).size.toDouble / exact.size
    assert(recall >= 0.5, s"IVF recall $recall below floor; |approx|=${approx.size}")
  }

  test("IVF recall (s04 invariant): probing ALL cells degenerates to brute force — recall exactly 1.0") {
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val probes = e.where(col("vec_id") < 10)
    def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.collect().map(r => (r.getAs[Long]("probe_id"), r.getAs[Long]("neighbor_id"))).toSet
    val exact = pairs(Similarity.bruteForceTopK(e, probes, k = 5))
    val all = pairs(Similarity.ivfTopK(e, probes, k = 5, nCells = 16, nProbe = 16))
    assert(all === exact,
      s"nProbe=nCells must recover the exact top-k; missing=${(exact diff all).size}")
  }

  test("PQ ADC top-k (s07): deterministic across runs, and ADC ranking recalls " +
      "the exact-L2 top-k") {
    import org.apache.spark.sql.functions._
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val probes = e.where(col("vec_id") < 5)
    def run() = Similarity.pqTopK(e, probes, k = 3, m = 8, ks = 16, dim = 64)
    val a = run().collect().map(_.toSeq).toSeq
    assert(a === run().collect().map(_.toSeq).toSeq) // bit-deterministic
    assert(a.length === 5 * 3)
    // exact squared-L2 top-3 (ADC approximates L2, so that is the right
    // reference — bruteForceTopK is the cosine family)
    val dv = (c: org.apache.spark.sql.Column) => transform(c, x => x.cast("double"))
    val exact = e.select(col("vec_id").as("neighbor_id"), dv(col("embedding")).as("cv"))
      .crossJoin(probes.select(col("vec_id").as("probe_id"), dv(col("embedding")).as("pv")))
      .where(col("probe_id") =!= col("neighbor_id"))
      .select(col("probe_id"), col("neighbor_id"),
        aggregate(zip_with(col("pv"), col("cv"), (x, y) => (x - y) * (x - y)),
          lit(0.0), (s, x) => s + x).as("d2"))
      .withColumn("r", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("probe_id"))
          .orderBy(col("d2").asc, col("neighbor_id").asc)))
      .where(col("r") <= 3)
      .select(col("probe_id"), col("neighbor_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val approx = a.map(r => (r(0).asInstanceOf[Long], r(2).asInstanceOf[Long])).toSet
    val recall = (exact intersect approx).size.toDouble / exact.size
    // the lowest-id stand-in codebook is deliberately coarse (16 codewords
    // per subspace, untrained) — measured 0.2 here vs ~0.03 for random
    // guessing at this corpus size; production trains per-subspace
    // codebooks (kmeansCentroids on sliced dims) and the gate (s07 oracle)
    // pins exactness of the machinery, not codebook quality
    val nCorpus = e.count().toDouble
    val randomRecall = 3.0 / (nCorpus - 1)
    assert(recall >= 0.15, s"PQ recall@3 too low: $recall")
    assert(recall > 3 * randomRecall,
      s"PQ recall $recall not above 3x random baseline $randomRecall")
  }

  test("PQ trained codebooks (s08): deterministic, iteration-0 ≡ stand-in, " +
      "trained recall ≥ stand-in, production mean tracks replayable fold") {
    import org.apache.spark.sql.functions._
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val standIn = Similarity.pqStandInCodebooks(e, m = 8, ks = 16, dim = 64)
    assert(Similarity.pqTrainCodebooks(e, m = 8, ks = 16, iters = 0, dim = 64)
      === standIn) // iteration 0 IS the stand-in
    val trained = Similarity.pqTrainCodebooks(e, m = 8, ks = 16, iters = 2,
      dim = 64, replayableMeans = true)
    assert(trained === Similarity.pqTrainCodebooks(e, m = 8, ks = 16, iters = 2,
      dim = 64, replayableMeans = true)) // deterministic
    // Lloyd's actual guarantee is monotone non-increasing total
    // quantization distortion — NOT top-k recall (which the s08 oracle
    // pins as measured VALUES at sf0.01, where training wins 14/50 vs
    // 8/50; at this 100-vector scale recall can tie or dip)
    val vecs = e.select(col("embedding")).collect()
      .map(_.getSeq[Float](0).map(_.toDouble).toArray)
    def distortion(cb: Seq[Seq[Seq[Double]]]): Double =
      vecs.map { v =>
        (0 until 8).map { j =>
          val sv = v.slice(j * 8, j * 8 + 8)
          (0 until 16).map(c =>
            sv.zip(cb(j)(c)).map { case (x, y) => (x - y) * (x - y) }.sum).min
        }.sum
      }.sum
    assert(distortion(trained) <= distortion(standIn) + 1e-6,
      "training must not increase quantization distortion")
    // the production mean (partial avg) tracks the replayable fold far
    // below the round-6 assignment grain
    val prod = Similarity.pqTrainCodebooks(e, m = 8, ks = 16, iters = 2, dim = 64)
    for (j <- 0 until 8; c <- 0 until 16; d <- 0 until 8)
      assert(math.abs(prod(j)(c)(d) - trained(j)(c)(d)) < 1e-7,
        s"prod-vs-replayable drift at ($j,$c,$d)")
  }

  test("k-means quantizer (s05): deterministic across runs, iteration-0 ≡ lowest-id, " +
      "trained recall ≥ 0.5 on sf0.001") {
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val probes = e.where(col("vec_id") < 5)
    // determinism: two independent trainings produce identical centroids
    def centMap(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => r.getAs[Long]("cent_id") -> r.getSeq[Double](r.fieldIndex("cent_vec")))
      .toMap
    val c1 = centMap(Similarity.kmeansCentroids(e, nCells = 8, iters = 2,
      replayableMeans = true))
    val c2 = centMap(Similarity.kmeansCentroids(e, nCells = 8, iters = 2,
      replayableMeans = true))
    assert(c1 === c2)
    assert(c1.size === 8 && c1.values.forall(_.length === 64))
    // the production mean (partial avg, the 100 TB shape) agrees with the
    // replayable fold to well under the 1e-6 assignment-rounding grain —
    // same members, same mean, different (but mathematically equal modulo
    // float association) addition order
    val cProd = centMap(Similarity.kmeansCentroids(e, nCells = 8, iters = 2))
    assert(cProd.keySet === c1.keySet)
    for ((k, v) <- cProd; (a, b) <- v.zip(c1(k)))
      assert(math.abs(a - b) < 1e-7, s"cell $k prod-vs-replayable mean drift")
    // zero iterations = the lowest-id quantizer: search results must match
    // ivfTopK exactly (float→double cast is value-preserving)
    val zeroIter = Similarity.ivfTopKWithCentroids(e, probes, k = 3,
      Similarity.kmeansCentroids(e, nCells = 8, iters = 0), nProbe = 4)
    val standIn = Similarity.ivfTopK(e, probes, k = 3, nCells = 8, nProbe = 4)
    assert(zeroIter.collect().map(_.toSeq).toSet === standIn.collect().map(_.toSeq).toSet)
    // trained quantizer still recalls against brute force
    val exact = Similarity.bruteForceTopK(e, probes, k = 3)
      .select(col("probe_id"), col("neighbor_id"))
    val trained = Similarity.ivfTopKWithCentroids(e, probes, k = 3,
      Similarity.kmeansCentroids(e, nCells = 8, iters = 2), nProbe = 4)
      .select(col("probe_id"), col("neighbor_id"))
    val hit = exact.join(trained, Seq("probe_id", "neighbor_id"), "left_semi").count()
    assert(hit.toDouble / exact.count() >= 0.5)
  }

  test("near-dup pairs: threshold applied to the ROUNDED similarity") {
    val corpus = Seq(
      (0L, Array(1f, 0f)),
      (1L, Array(1f, 0.0001f)), // sim rounds to 1.0
      (2L, Array(0f, 1f))
    ).toDF("vec_id", "embedding")
    val out = Similarity.cosineNearDupPairs(corpus, corpus, threshold = 0.5)
      .collect().map(r => (r.getAs[Long]("a_id"), r.getAs[Long]("b_id"), r.getAs[Double]("sim")))
    assert(out.toSeq === Seq((0L, 1L, 1.0)))
  }

  test("semantic clusters (d14): near-identical vectors collapse, min-id survives, others stay singletons") {
    val corpus = Seq(
      (0L, Array(1f, 0f)),
      (1L, Array(0.999f, 0.01f)), // cos ≈ 1 with 0 → same cluster
      (2L, Array(0f, 1f)),        // orthogonal → singleton
      (3L, Array(-1f, 0f))        // opposite → singleton
    ).toDF("vec_id", "embedding")
    val rows = Similarity.semanticClusters(corpus, threshold = 0.9,
        nTables = 8, planesPerTable = 2, dim = 2)
      .collect().map(r => r.getAs[Long]("vec_id") ->
        ((r.getAs[Long]("cluster_id"), r.getAs[Long]("cluster_size"),
          r.getAs[Boolean]("is_survivor")))).toMap
    assert(rows(0L) === ((0L, 2L, true)))
    assert(rows(1L) === ((0L, 2L, false))) // collapsed into 0's cluster
    assert(rows(2L) === ((2L, 1L, true)))
    assert(rows(3L) === ((3L, 1L, true)))
  }

  test("mmrTopK: diverse neighbor displaces an exact duplicate; λ=1 is plain relevance") {
    // probe [1,0,0]; ids 1 and 2 are exact duplicates at cos 0.9; id 3 is
    // diverse (cos 0.8 to probe, cos 0.5 to id 1)
    val corpus = Seq(
      (0L, Array(1f, 0f, 0f)),
      (1L, Array(0.9f, 0.43589f, 0f)),
      (2L, Array(0.9f, 0.43589f, 0f)),
      (3L, Array(0.8f, -0.50472f, 0.32479f))
    ).toDF("vec_id", "embedding")
    val probes = corpus.where(col("vec_id") === 0)
    // λ=0.5: round 2 scores — dup: 0.45 − 0.5·1.0 = −0.05; diverse:
    // 0.40 − 0.5·0.5 = 0.15 → the duplicate is displaced
    val mmr = Similarity.mmrTopK(corpus, probes, kCand = 3, kSelect = 2, lambda = 0.5)
      .orderBy("mmr_rank").collect()
    assert(mmr.map(_.getAs[Long]("neighbor_id")).toSeq === Seq(1L, 3L))
    // λ=1: pure relevance — the duplicate ties at 0.9 and wins on id
    val rel = Similarity.mmrTopK(corpus, probes, kCand = 3, kSelect = 2, lambda = 1.0)
      .orderBy("mmr_rank").collect()
    assert(rel.map(_.getAs[Long]("neighbor_id")).toSeq === Seq(1L, 2L))
  }

  test("s11 multi-probe: strictly more candidates, recall ≥ single-probe at equal tables") {
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val probes = e.where(col("vec_id") < 10)
    def pairs(multiProbe: Boolean) =
      Similarity.lshTopK(e, probes, k = 5, nTables = 4, planesPerTable = 4,
          dim = 64, multiProbe = multiProbe)
        .select("probe_id", "neighbor_id")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val single = pairs(multiProbe = false)
    val multi = pairs(multiProbe = true)
    // recall vs the exact top-5
    val exact = Similarity.bruteForceTopK(e, probes, k = 5)
      .select("probe_id", "neighbor_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val rs = (single intersect exact).size.toDouble / exact.size
    val rm = (multi intersect exact).size.toDouble / exact.size
    assert(rm >= rs, s"multi-probe recall $rm must not trail single-probe $rs")
    assert(rm > rs, s"at 4 tables the Hamming-1 probes must add recall ($rs -> $rm)")
    assert(multi == pairs(multiProbe = true), "deterministic across runs")
  }

  test("s10 SQ: bin-center dequantization error is bounded by w/512 per dimension") {
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val mm = Similarity.sqMinMax(e, dim = 64)
    // replay encode+dequantize on the driver for a handful of vectors
    val rows = e.where(col("vec_id") < 20)
      .select(col("vec_id"), col("embedding")).collect()
    rows.foreach { r =>
      val v = r.getSeq[Float](1).map(_.toDouble)
      v.indices.foreach { j =>
        val (lo, w) = mm(j)
        val q = if (w == 0.0) 0L
          else math.min(math.floor((v(j) - lo) / w * 256), 255.0).toLong
        val xhat = lo + (q + 0.5) * w / 256.0
        assert(math.abs(v(j) - xhat) <= w / 512.0 + 1e-12,
          s"dim $j: |${v(j)} - $xhat| exceeds ${w / 512.0}")
      }
    }
  }

  test("s10 SQ: ADC ranking substantially recalls the exact-L2 top-k; deterministic") {
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val probes = e.where(col("vec_id") < 10)
    def run() = Similarity.sqTopK(e, probes, k = 5, dim = 64)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val sq = run()
    assert(sq == run(), "bit-deterministic across runs")
    // exact squared-L2 top-5 per probe (driver brute force on 150 vectors)
    val all = e.select(col("vec_id"), col("embedding")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray).toMap
    val exact = (0L until 10L).flatMap { p =>
      all.keys.filter(_ != p).toSeq
        .map(n => (n, all(p).zip(all(n)).map { case (a, b) => (a - b) * (a - b) }.sum))
        .sortBy { case (n, d) => (d, n) }.take(5)
        .zipWithIndex.map { case ((n, _), i) => (p, i.toLong + 1, n) }
    }.toSet
    val recall = sq.map(t => (t._1, t._3))
      .intersect(exact.map(t => (t._1, t._3))).size.toDouble / exact.size
    assert(recall >= 0.8, s"int8 SQ at 64 dims should recall most of exact top-5: $recall")
  }

  test("s12: pre-filtered ANN fills k eligible results; post-filtering under-returns") {
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val probes = e.where(col("vec_id") < 10)
    val labels = e.select(col("vec_id").as("neighbor_id"), col("label"))
    val pre = Similarity.ivfTopK(e.where(col("label") === 3), probes,
      k = 5, nCells = 16, nProbe = 8)
    val preCounts = pre.groupBy(col("probe_id")).count().collect()
    assert(preCounts.length == 10 && preCounts.forall(_.getLong(1) == 5L),
      "pre-filtering must fill k for every probe (eligible pool >= k)")
    assert(pre.join(labels, Seq("neighbor_id")).where(col("label") =!= 3).isEmpty,
      "every returned neighbor must satisfy the predicate")
    // the classic bug: filter AFTER an unfiltered top-k — with ~1/10
    // eligible, most of each probe's 5 exact neighbors are filtered away
    val post = Similarity.bruteForceTopK(e, probes, k = 5)
      .join(labels, Seq("neighbor_id")).where(col("label") === 3)
    assert(post.count() < 25,
      s"post-filtering must under-return (got ${post.count()} of 50 slots) — " +
        "the exhibit for why the predicate belongs inside the index")
  }

  test("s14 RP: recall ≥ 0.6 vs brute force on sf0.001; nCand = corpus degenerates to exact") {
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val probes = e.where(col("vec_id") < 10)
    def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.collect().map(r => (r.getAs[Long]("probe_id"), r.getAs[Long]("neighbor_id"))).toSet
    val exact = pairs(Similarity.bruteForceTopK(e, probes, k = 5))
    // the catalog config: rDim=32, nCand=100 (20% of this 500-vector
    // corpus). The testdata embeddings are near-isotropic (mean pairwise
    // cosine ≈ 0, max ≈ 0.48), the HARDEST regime for any projection —
    // true-neighbor gaps are ~0.1, within JL distortion at small rDim.
    // Measured ≈ 0.78 here; 0.6 is the floor with generator margin. On
    // clustered real embeddings the same config recalls far higher.
    val rp = pairs(Similarity.rpTopK(e, probes, k = 5, rDim = 32, nCand = 100, dim = 64))
    val recall = (exact intersect rp).size.toDouble / exact.size
    assert(recall >= 0.6, s"JL recall $recall below floor; |rp|=${rp.size}")
    // candidate set = whole corpus ⇒ the projection can't drop anything:
    // the re-rank IS brute force (the s04-style degenerate-config invariant)
    val n = e.count().toInt
    val full = pairs(Similarity.rpTopK(e, probes, k = 5, rDim = 16, nCand = n, dim = 64))
    assert(full === exact, "nCand=|corpus| must equal the exact top-k")
  }

  test("s15 hard negatives: labels always differ, and each probe's list is the " +
      "true top-k of the label complement") {
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val probes = e.where(col("vec_id") < 10)
    val got = Similarity.hardNegatives(e, probes, k = 5).collect()
    assert(got.length === 50, "every probe must fill k (complement is large)")
    val probeLabels = probes.select(col("vec_id"), col("label")).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    got.foreach { r =>
      assert(r.getAs[Int]("neg_label") !== probeLabels(r.getAs[Long]("probe_id")),
        s"probe ${r.getAs[Long]("probe_id")} returned a same-label neighbor")
    }
    // second mechanism: brute-force top-k over the label-filtered corpus,
    // probe by probe — must agree exactly (same ranking contract)
    val expect = probeLabels.toSeq.flatMap { case (pid, lbl) =>
      Similarity.bruteForceTopK(e.where(col("label") =!= lbl),
          probes.where(col("vec_id") === pid), k = 5)
        .collect().map(r => (pid, r.getAs[Long]("rank"), r.getAs[Long]("neighbor_id")))
    }.toSet
    val gotSet = got.map(r => (r.getAs[Long]("probe_id"), r.getAs[Long]("rank"),
      r.getAs[Long]("neighbor_id"))).toSet
    assert(gotSet === expect)
  }

  test("s16 SemDeDup: clique keeps exactly its least-prototypical member; " +
      "cross-cell near-dupes BOTH survive (the cell-blindness trade)") {
    // two well-separated cells: centroid 0 ~ e1, centroid 1 ~ e2.
    // ids 10,11,12: a mutual-duplicate clique in cell 0 (pairwise sim ≈ 1,
    // distinct centroid sims); id 13 in cell 0 far from the clique;
    // ids 20,21: near-identical but one leans to each cell.
    val rows = Seq(
      (0L, Array(1f, 0f, 0f)), (1L, Array(0f, 1f, 0f)), // centroids
      (10L, Array(0.99f, 0.0100f, 0f)),
      (11L, Array(0.99f, 0.0101f, 0f)),
      (12L, Array(0.99f, 0.0102f, 0f)),
      (13L, Array(0.80f, 0.20f, 0f)),
      (20L, Array(0.7072f, 0.7070f, 0f)),
      (21L, Array(0.7070f, 0.7072f, 0f))
    ).toDF("vec_id", "embedding")
    val cents = rows.where(col("vec_id") < 2)
      .select(col("vec_id").as("cent_id"), col("embedding").as("cent_vec"))
    val got = Similarity.semDeDup(rows, cents, tau = 0.99)
      .collect().map(r => r.getAs[Long]("vec_id") ->
        (r.getAs[Long]("cent_id"), r.getAs[Boolean]("kept"))).toMap
    // clique: 12 has the LARGEST y tilt → lowest centroid cosine → the
    // LEAST prototypical member → keeps; 10, 11 have 12 earlier in
    // priority with sim ≥ τ → dropped
    assert(got(12L) === ((0L, true)), s"clique minimum must survive: $got")
    assert(!got(10L)._2 && !got(11L)._2, s"clique non-minima must drop: $got")
    // vector 0 IS the cell-0 axis (csim = 1.0 → priority LAST) and sits
    // inside the clique's τ-ball → absorbed by it. The paper's rule,
    // exhibited: the most prototypical member of a duplicate ball dies.
    assert(!got(0L)._2, s"prototypical ball member must drop: $got")
    // 13 shares cell 0 but sim(13, clique) < τ → kept
    assert(got(13L)._2, s"non-duplicate cell-mate must survive: $got")
    // 20/21: sim(20,21) ≈ 1 ≥ τ, but they land in DIFFERENT cells →
    // both survive. This is SemDeDup's documented recall trade.
    assert(got(20L)._1 === 0L && got(21L)._1 === 1L, s"split pair cells: $got")
    assert(got(20L)._2 && got(21L)._2, s"cross-cell pair must both survive: $got")
    // centroid row 1's only cell-mate (21) is far below τ → kept
    assert(got(1L)._2)
  }

  test("s16 SemDeDup: τ beyond +1 keeps everything; τ = -1 keeps exactly " +
      "one per cell (the priority minimum)") {
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val cents = e.orderBy(col("vec_id")).limit(16)
      .select(col("vec_id").as("cent_id"), col("embedding").as("cent_vec"))
    val all = Similarity.semDeDup(e, cents, tau = 1.01)
    assert(all.where(!col("kept")).isEmpty, "τ>1: nothing can match, all kept")
    val one = Similarity.semDeDup(e, cents, tau = -1.0)
    val perCell = one.where(col("kept")).groupBy(col("cent_id")).count().collect()
    assert(perCell.forall(_.getLong(1) == 1L),
      "τ=-1: every pair 'matches', so only each cell's priority minimum survives")
    assert(perCell.length == one.select(col("cent_id")).distinct().count().toInt)
  }

  test("s17 prototype pruning: per-cell kept = floor(3n/5), and the kept set " +
      "is exactly the hardest (csim, id)-prefix — driver replay on sf0.001") {
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val cents = e.orderBy(col("vec_id")).limit(16)
      .select(col("vec_id").as("cent_id"), col("embedding").as("cent_vec"))
    val got = Similarity.prototypePrune(e, cents, keepNum = 3, keepDenom = 5)
      .collect()
    val byCell = got.groupBy(_.getAs[Long]("cent_id"))
    byCell.foreach { case (cell, rows) =>
      val n = rows.length
      val kept = rows.filter(_.getAs[Boolean]("kept"))
      assert(kept.length === n * 3 / 5, s"cell $cell: ${kept.length} of $n kept")
      // replay: hardest-first = ascending (csim, id); the kept set must be
      // exactly the first floor(3n/5) of that order
      val order = rows.sortBy(r => (r.getAs[Double]("csim"), r.getAs[Long]("vec_id")))
      val expectIds = order.take(n * 3 / 5).map(_.getAs[Long]("vec_id")).toSet
      assert(kept.map(_.getAs[Long]("vec_id")).toSet === expectIds, s"cell $cell")
    }
    // degenerate gates: keep-all and keep-none
    assert(Similarity.prototypePrune(e, cents, 1, 1).where(!col("kept")).isEmpty)
    assert(Similarity.prototypePrune(e, cents, 0, 1).where(col("kept")).isEmpty)
  }

  test("s20 binary ANN: recall ≥ 0.6 vs brute force on sf0.001; " +
      "nCand = corpus degenerates to exact; deterministic") {
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val probes = e.where(col("vec_id") < 10)
    def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.collect().map(r => (r.getAs[Long]("probe_id"),
        r.getAs[Long]("neighbor_id"))).toSet
    val exact = pairs(Similarity.bruteForceTopK(e, probes, k = 5))
    // measured 0.72 here with a 100-candidate pool from 63 Hamming bits
    // — on par with s14's 32-dim real-valued projection at 1/16 the
    // memory (8-byte mask vs 32 doubles); 0.6 floor with margin
    val bin = pairs(Similarity.binaryTopK(e, probes, k = 5, nCand = 100, dim = 64))
    val recall = (exact intersect bin).size.toDouble / exact.size
    assert(recall >= 0.6, s"binary recall $recall below floor")
    val n = e.count().toInt
    assert(pairs(Similarity.binaryTopK(e, probes, k = 5, nCand = n, dim = 64))
      === exact, "nCand=|corpus| must equal the exact top-k")
    assert(bin === pairs(Similarity.binaryTopK(e, probes, k = 5,
      nCand = 100, dim = 64)), "integer candidate stage: bit-deterministic")
  }

  test("s19 IVF-PQ: every returned neighbor lives in a cell the probe " +
      "visited; codebook rows self-encode; k fills; deterministic") {
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val probes = e.where(col("vec_id") < 10)
    def run() = Similarity.ivfPqTopK(e, probes, k = 5,
      nCells = 16, nProbe = 4, m = 8, ks = 16, dim = 64).collect()
    val got = run()
    assert(got.length === 50, "every probe fills k")
    assert(got.map(r => (r.getAs[Long]("probe_id"), r.getAs[Long]("rank"),
        r.getAs[Long]("neighbor_id"), r.getAs[Double]("adc_dist"))).toSeq ===
      run().map(r => (r.getAs[Long]("probe_id"), r.getAs[Long]("rank"),
        r.getAs[Long]("neighbor_id"), r.getAs[Double]("adc_dist"))).toSeq,
      "bit-deterministic across runs")
    // structural invariant: a neighbor can only be scored through its own
    // cell, so its 1-NN cell must be among the probe's 4 visited cells —
    // recompute both assignments independently with the house contract
    val cents = e.orderBy(col("vec_id")).limit(16).collect()
      .map(r => r.getAs[Long]("vec_id") ->
        r.getSeq[Float](r.fieldIndex("embedding")).map(_.toDouble).toArray).toSeq
    val vecs = e.collect().map(r => r.getAs[Long]("vec_id") ->
      r.getSeq[Float](r.fieldIndex("embedding")).map(_.toDouble).toArray).toMap
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0
      for (i <- a.indices) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i) }
      BigDecimal(d / (math.sqrt(na) * math.sqrt(nb)))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    def cellsOf(v: Array[Double], n: Int): Seq[Long] =
      cents.map { case (cid, cv) => (cos(v, cv), cid) }
        .sortBy { case (s, cid) => (-s, cid) }.take(n).map(_._2)
    got.foreach { r =>
      val pCells = cellsOf(vecs(r.getAs[Long]("probe_id")), 4).toSet
      val nCell = cellsOf(vecs(r.getAs[Long]("neighbor_id")), 1).head
      assert(pCells.contains(nCell),
        s"neighbor ${r.getAs[Long]("neighbor_id")} reached outside its cell")
    }
  }

  test("s18 matryoshka: full-width row is the identity (recall 1.0); every " +
      "dim fills all slots; hit counts match a driver set-intersection replay") {
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val probes = e.where(col("vec_id") < 10)
    val got = Similarity.matryoshkaRecall(e, probes, k = 5, dims = Seq(8, 64))
      .collect().map(r => r.getAs[Int]("dim") ->
        (r.getAs[Long]("n_slots"), r.getAs[Long]("n_hits"),
          r.getAs[Double]("recall"))).toMap
    assert(got(64) === ((50L, 50L, 1.0)), "truncation at full width is exact")
    assert(got(8)._1 === 50L, "every probe fills k at every dim")
    // replay dim-8 hits as an explicit set intersection
    def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.collect().map(r => (r.getAs[Long]("probe_id"),
        r.getAs[Long]("neighbor_id"))).toSet
    val full = pairs(Similarity.bruteForceTopK(e, probes, k = 5))
    val t8 = pairs(Similarity.bruteForceTopK(
      e.select(col("vec_id"), slice(col("embedding"), 1, 8).as("embedding")),
      probes.select(col("vec_id"), slice(col("embedding"), 1, 8).as("embedding")),
      k = 5))
    assert(got(8)._2 === (full intersect t8).size.toLong)
    assert(got(8)._3 === BigDecimal((full intersect t8).size / 50.0)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
  }

  test("s28: persisted LSH index answers equal inline lshTopK; the scan is " +
      "bucket-PRUNED and the raw corpus is never read") {
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    // probes LOCALIZED (collected → createDataFrame) so the index path's
    // plan contains NO embeddings.parquet scan at all — the corpus-free
    // claim is then assertable verbatim (the probe batch is caller data;
    // in production it arrives from anywhere)
    val probes = spark.createDataFrame(
      java.util.Arrays.asList(e.where(col("vec_id") < 2).collect(): _*),
      e.schema)
    // 8 planes → 256 bucket values over 32 physical buckets; 2 probes ×
    // 8 tables touch ≤ 16 values, so pruning MUST select a strict subset
    val tbl = "graft_s28_spec_idx"
    Similarity.writeLshIndex(e, tbl, nTables = 8, planesPerTable = 8,
      dim = 64, nBuckets = 32)
    try {
      val fromIdx = Similarity.lshTopKFromIndex(probes, tbl, k = 5,
        nTables = 8, planesPerTable = 8, dim = 64)
      val inline = Similarity.lshTopK(e, probes, k = 5,
        nTables = 8, planesPerTable = 8, dim = 64)
      def canon(df: org.apache.spark.sql.DataFrame) =
        df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          BigDecimal(r.getDouble(3)).setScale(9,
            BigDecimal.RoundingMode.HALF_UP))).sortBy(t => (t._1, t._2))
      assert(canon(fromIdx) === canon(inline),
        "index path must answer exactly what the inline probe answers")
      val plan = fromIdx.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      val sel = "SelectedBucketsCount: (\\d+) out of (\\d+)".r
        .findFirstMatchIn(plan)
        .getOrElse(fail(s"scan must be bucket-pruned, plan:\n$plan"))
      assert(sel.group(1).toInt < sel.group(2).toInt,
        s"pruning must select a strict bucket subset, plan:\n$plan")
      assert(!plan.contains("embeddings.parquet"),
        s"the raw corpus must never be scanned on the query path, plan:\n$plan")
    } finally spark.sql(s"DROP TABLE IF EXISTS $tbl")
  }

  test("s29: persisted IVF cell index answers equal inline ivfTopK; probe " +
      "reads only its nProbe cells (bucket-pruned) and never the raw corpus") {
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val probes = spark.createDataFrame(
      java.util.Arrays.asList(e.where(col("vec_id") < 2).collect(): _*),
      e.schema)
    // 2 probes × nProbe 4 of 16 cells → ≤ 8 cells: strict bucket subset
    val tbl = "graft_s29_spec_idx"
    Similarity.writeIvfIndex(e, tbl, nCells = 16)
    try {
      val fromIdx = Similarity.ivfTopKFromIndex(probes, tbl, k = 5, nProbe = 4)
      val inline = Similarity.ivfTopK(e, probes, k = 5, nCells = 16, nProbe = 4)
      def canon(df: org.apache.spark.sql.DataFrame) =
        df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          BigDecimal(r.getDouble(3)).setScale(9,
            BigDecimal.RoundingMode.HALF_UP))).sortBy(t => (t._1, t._2))
      assert(canon(fromIdx) === canon(inline),
        "index path must answer exactly what inline ivfTopK answers")
      val plan = fromIdx.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      val sel = "SelectedBucketsCount: (\\d+) out of (\\d+)".r
        .findFirstMatchIn(plan)
        .getOrElse(fail(s"cell scan must be bucket-pruned, plan:\n$plan"))
      assert(sel.group(1).toInt < sel.group(2).toInt,
        s"pruning must select a strict cell subset, plan:\n$plan")
      assert(!plan.contains("embeddings.parquet"),
        s"the raw corpus must never be scanned on the query path, plan:\n$plan")
    } finally {
      spark.sql(s"DROP TABLE IF EXISTS $tbl")
      spark.sql(s"DROP TABLE IF EXISTS ${tbl}_quantizer")
    }
  }

  test("s30: delta append ≡ union corpus under the ORIGINAL quantizer; " +
      "quantizer survives the append; cell buckets still prune") {
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val base = e.where(col("vec_id") % 2 === 0)
    val delta = e.where(col("vec_id") % 2 === 1)
    val probes = spark.createDataFrame(
      java.util.Arrays.asList(e.where(col("vec_id") < 2).collect(): _*),
      e.schema)
    val tbl = "graft_s30_spec_idx"
    Similarity.writeIvfIndex(base, tbl, nCells = 16)
    try {
      val qBefore = spark.table(s"${tbl}_quantizer").orderBy("cent_id")
        .collect().map(_.toString).toSeq
      Similarity.appendToIvfIndex(delta, tbl)
      // quantizer untouched by the append (re-clustering would move
      // every existing cell boundary)
      assert(spark.table(s"${tbl}_quantizer").orderBy("cent_id")
        .collect().map(_.toString).toSeq === qBefore)
      // merged index rows = base + delta, every row cell-assigned
      assert(spark.table(tbl).count() === e.count())
      val fromIdx = Similarity.ivfTopKFromIndex(probes, tbl, k = 5, nProbe = 4)
      // the contract: exactly the union corpus cut by the original
      // (even-half) quantizer
      val cents = base.orderBy(col("vec_id")).limit(16)
        .select(col("vec_id").as("cent_id"), col("embedding").as("cent_vec"))
      val inline = Similarity.ivfTopKWithCentroids(e, probes, k = 5,
        centroids = cents, nProbe = 4)
      def canon(df: org.apache.spark.sql.DataFrame) =
        df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          BigDecimal(r.getDouble(3)).setScale(9,
            BigDecimal.RoundingMode.HALF_UP))).sortBy(t => (t._1, t._2))
      assert(canon(fromIdx) === canon(inline),
        "appended index must answer as the union corpus under the build quantizer")
      // bucket pruning survives the append (same bucket spec on the new files)
      val plan = fromIdx.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      val sel = "SelectedBucketsCount: (\\d+) out of (\\d+)".r
        .findFirstMatchIn(plan)
        .getOrElse(fail(s"cell scan must stay bucket-pruned, plan:\n$plan"))
      assert(sel.group(1).toInt < sel.group(2).toInt,
        s"pruning must select a strict cell subset, plan:\n$plan")
    } finally {
      spark.sql(s"DROP TABLE IF EXISTS $tbl")
      spark.sql(s"DROP TABLE IF EXISTS ${tbl}_quantizer")
    }
  }

  test("s31: tombstone delete ≡ compacted delete ≡ survivors under the " +
      "ORIGINAL quantizer; compaction rewrites ONLY touched lists " +
      "(untouched files byte-identical); an emptied list is dropped") {
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val probes = spark.createDataFrame(
      java.util.Arrays.asList(e.where(col("vec_id") < 2).collect(): _*),
      e.schema)
    val tbl = "graft_s31_spec_lists"
    Similarity.writeIvfLists(e, tbl, nCells = 16)
    try {
      val qBefore = spark.table(s"${tbl}_quantizer").orderBy("cent_id")
        .collect().map(_.toString).toSeq
      // the smallest list gets fully deleted — the dynamic-overwrite
      // pitfall case (no survivor rows ⇒ stale files unless dropped)
      val cellPop = spark.table(tbl).groupBy("cent_id").count()
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val emptiedCell = cellPop.minBy { case (id, n) => (n, id) }._1
      val emptiedIds = spark.table(tbl)
        .where(col("cent_id") === emptiedCell)
        .select("neighbor_id").collect().map(_.getLong(0)).toSet
      val deleted = e.where(col("vec_id") % 5 === 2 ||
        col("vec_id").isin(emptiedIds.toSeq: _*))
      val deletedIds = deleted.select("vec_id").collect().map(_.getLong(0)).toSet
      assert(deletedIds.nonEmpty && deletedIds.size < e.count())

      def partFiles(cell: Long): Seq[(String, Long, Long)] = {
        val wh = spark.conf.get("spark.sql.warehouse.dir")
        val whPath = if (wh.contains(":")) new java.net.URI(wh).getPath else wh
        val dir = new java.io.File(new java.io.File(whPath, tbl), s"cent_id=$cell")
        Option(dir.listFiles()).map(_.toSeq).getOrElse(Seq.empty)
          .filter(_.isFile)
          .map(f => (f.getName, f.length(), f.lastModified()))
          .sortBy(_._1)
      }

      Similarity.deleteFromIvfLists(deleted, tbl)
      val touchedCells = spark.table(s"${tbl}_tombstones")
        .select("cent_id").distinct().collect().map(_.getLong(0)).toSet
      assert(touchedCells.contains(emptiedCell))
      val untouchedCells = cellPop.keySet.diff(touchedCells)
      assert(untouchedCells.nonEmpty,
        "fixture must leave some lists untouched or the receipt is vacuous")
      val untouchedBefore = untouchedCells.toSeq.sorted.map(c => c -> partFiles(c))

      def canon(df: org.apache.spark.sql.DataFrame) =
        df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          BigDecimal(r.getDouble(3)).setScale(9,
            BigDecimal.RoundingMode.HALF_UP))).sortBy(t => (t._1, t._2))
      // contract: survivors cut by the FULL corpus's quantizer (delete
      // never retrains — cell boundaries hold even though deleted ids
      // include centroid sources)
      val cents = e.orderBy(col("vec_id")).limit(16)
        .select(col("vec_id").as("cent_id"), col("embedding").as("cent_vec"))
      val inline = canon(Similarity.ivfTopKWithCentroids(
        e.where(!col("vec_id").isin(deletedIds.toSeq: _*)), probes, k = 5,
        centroids = cents, nProbe = 4))
      val tombstoned = Similarity.ivfListsTopK(probes, tbl, k = 5, nProbe = 4)
      assert(canon(tombstoned) === inline,
        "tombstoned query must answer as survivors under the build quantizer")
      // partition pruning + corpus-free query path
      val plan = tombstoned.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      assert("PartitionFilters: \\[[^\\]]*cent_id".r.findFirstIn(plan).isDefined,
        s"probed cells must land in PartitionFilters, plan:\n$plan")
      assert(!plan.contains("embeddings.parquet"),
        s"the raw corpus must never be scanned on the query path, plan:\n$plan")

      Similarity.compactIvfLists(tbl, spark)
      // quantizer untouched; tombstones folded in and reset
      assert(spark.table(s"${tbl}_quantizer").orderBy("cent_id")
        .collect().map(_.toString).toSeq === qBefore)
      assert(spark.table(s"${tbl}_tombstones").count() === 0L)
      assert(spark.table(tbl).count() === e.count() - deletedIds.size)
      assert(spark.table(tbl).where(col("cent_id") === emptiedCell).count() === 0L,
        "a fully-deleted list must not resurface stale rows (the dynamic-overwrite pitfall)")
      assert(partFiles(emptiedCell).isEmpty,
        "the emptied list's partition directory must be dropped, not left stale")
      // untouched lists: files byte-identical through compaction
      val untouchedAfter = untouchedCells.toSeq.sorted.map(c => c -> partFiles(c))
      assert(untouchedAfter === untouchedBefore,
        "compaction must rewrite ONLY touched lists")
      // post-compaction answers are the tombstoned answers, now with a
      // zero-row subtraction
      val compacted = Similarity.ivfListsTopK(probes, tbl, k = 5, nProbe = 4)
      assert(canon(compacted) === inline,
        "compacted query must answer exactly as the tombstoned query")
    } finally {
      spark.sql(s"DROP TABLE IF EXISTS $tbl")
      spark.sql(s"DROP TABLE IF EXISTS ${tbl}_quantizer")
      spark.sql(s"DROP TABLE IF EXISTS ${tbl}_tombstones")
    }
  }
}
