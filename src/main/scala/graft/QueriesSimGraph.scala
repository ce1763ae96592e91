package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.analytics.{Dedup, Multimodal, Similarity, Tar, TextAnalysis, Warc}
import graft.functions.NetFunctions
import graft.QueryHelpers._

/** Similarity search (s01-s13), graph signals (g01-g06) and
  * multimodal-column operators (m01-m08).
  *
  * Extracted from the original single-file SparkEntry catalog; the
  * driver contract is unchanged — [[SparkEntry.queries]] and
  * [[SparkEntry.oracleSql]] concatenate the family maps. Shared
  * helpers (including the numeric-portability conventions documented
  * on [[SparkEntry]]) live in [[QueryHelpers]].
  */
private[graft] object QueriesSimGraph {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(


    // Graph centrality, two-sided: deterministic fixed-iteration HITS
    // over g01's synthesized link graph — authority (what good hubs point
    // at) and hub (link-directory value) scores, L1-normalized per
    // half-step. Same pinning discipline as g01; the twin replays all 5
    // iterations (10 half-steps) as a CTE chain.
    "g02_hits" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val n = docs.count()
      val edges = docs.select(col("doc_id").as("src"),
          pmod(col("doc_id") * 7 + 13, lit(n)).as("dst"))
        .unionByName(docs.select(col("doc_id").as("src"),
          pmod(col("doc_id") * 31 + 7, lit(n)).as("dst")))
      analytics.Graph.hits(edges, docs, iters = 5, idCol = "doc_id")
        .select(col("id").as("doc_id"), col("auth"), col("hub"))
        .orderBy(col("doc_id"))
    }),


    // Graph centrality: deterministic fixed-iteration PageRank over a
    // synthesized 2-out-link graph (dst = (7·id+13) mod n and
    // (31·id+7) mod n — derived from the corpus size, so it scales with
    // the table). Every float pinned: src-ordered contribution folds,
    // round-15 contributions, round-12 ranks. The twin replays all 10
    // iterations as a CTE chain.
    "g01_pagerank" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val n = docs.count()
      val edges = docs.select(col("doc_id").as("src"),
          pmod(col("doc_id") * 7 + 13, lit(n)).as("dst"))
        .unionByName(docs.select(col("doc_id").as("src"),
          pmod(col("doc_id") * 31 + 7, lit(n)).as("dst")))
      analytics.Graph.pageRank(edges, docs, iters = 10, idCol = "doc_id")
        .select(col("id").as("doc_id"), col("pr"))
        .orderBy(col("doc_id"))
    }),

    // Weakly-connected components as a FIRST-CLASS graph operator (the
    // machinery d07/d12/d14 use internally, surfaced on its own graph):
    // a deterministic sparse graph with many components (one out-edge
    // per vertex, confined to its 16-id block), resolved by min-label
    // propagation AND independently by the large-star/small-star
    // contraction — `contracted_agrees` (TRUE-asserted) is the
    // algorithm-equivalence receipt: the O(diameter) and the O(log n)
    // path must produce identical labelings. Output = per-component
    // (min-id label, size).
    "g11_wcc" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val n = docs.count()
      val edges = docs.select(col("doc_id").as("src"),
          ((col("doc_id") - pmod(col("doc_id"), lit(16L))) +
            pmod(col("doc_id") * 7 + 3, lit(16L))).as("dst"))
        .where(col("dst") < n)
      val verts = docs.select(col("doc_id").as("id"))
      val cc = analytics.Dedup.connectedComponents(edges, verts)
      val cc2 = analytics.Dedup.connectedComponentsContracted(edges, verts)
        .withColumnRenamed("cluster_id", "c2")
      val agree = cc.join(cc2, Seq("id"))
        .agg((sum(when(col("cluster_id") =!= col("c2"), 1L).otherwise(0L)) === 0)
          .as("contracted_agrees"))
      cc.groupBy(col("cluster_id")).agg(count(lit(1)).as("size"))
        .crossJoin(broadcast(agree)) // 1-row scalar
        .orderBy(col("cluster_id"))
    }),

    // Personalized PageRank (random walk with restart) over g01's exact
    // graph, teleport concentrated on seeds {0,1,2,3}: mass measures
    // graph proximity to the seeds — the trusted-set expansion signal
    // (g06's seed BFS gives hop distance; PPR weights ALL paths). The
    // walk is scaled-integer fixed point (rank·10¹², damping 85/100,
    // plain integer sums) — exact under any execution order, so the twin
    // replays all 10 rounds with zero float anywhere in the chain.
    "g09_ppr" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val n = docs.count()
      val edges = docs.select(col("doc_id").as("src"),
          pmod(col("doc_id") * 7 + 13, lit(n)).as("dst"))
        .unionByName(docs.select(col("doc_id").as("src"),
          pmod(col("doc_id") * 31 + 7, lit(n)).as("dst")))
      analytics.Graph.personalizedPageRank(edges, docs,
          seeds = Seq(0L, 1L, 2L, 3L), iters = 10, idCol = "doc_id")
        .select(col("id").as("doc_id"), col("ppr_e12"), col("ppr"))
        .orderBy(col("doc_id"))
    }),


    // k-core membership over a ring+chord graph with a dense hub mesh
    // (doc_id < n/10 forms a 6-regular sub-ring): raw degree alone
    // cannot tell hubs from leaves here — every vertex has 4–6 edges —
    // but peeling at k=5 cascades the leaf tier away and keeps exactly
    // the mesh, the spoof-resistance argument in the Scaladoc as data.
    // Converges in 2 effective peels at every sf (bound 8 is slack);
    // the twin unrolls the same 8 layers, identity past the fixed point.
    "g05_kcore" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val n = docs.count()
      val m = n / 10
      val ring = docs.select(col("doc_id").as("src"),
        pmod(col("doc_id") + 1, lit(n)).as("dst"))
      val chord = docs.select(col("doc_id").as("src"),
        pmod(col("doc_id") * 7 + 13, lit(n)).as("dst"))
      val mesh = (1 to 3).map(j => docs.where(col("doc_id") < m)
        .select(col("doc_id").as("src"), pmod(col("doc_id") + j, lit(m)).as("dst")))
      val edges = (Seq(ring, chord) ++ mesh).reduce(_.unionByName(_))
      analytics.Graph.kCore(edges, k = 5, maxRounds = 8)
        .select(col("v").as("doc_id"), col("core_deg"), col("rounds"),
          col("converged"))
        .orderBy(col("doc_id"))
    }),

    // Seed-distance gate: BFS hops from the 5 lowest-id docs over g01's
    // link graph — the crawl-depth prior ("within d hops of trusted
    // seeds" as an inclusion gate). Max distance 12 at sf0.1, cap 16;
    // unreached docs surface as null (none here — the graph is fully
    // reachable, and max_dist rides along as the proof). The twin
    // enumerates ≤cap-length paths in one recursive CTE and mins.
    "g06_seed_distance" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val n = docs.count()
      val edges = docs.select(col("doc_id").as("src"),
          pmod(col("doc_id") * 7 + 13, lit(n)).as("dst"))
        .unionByName(docs.select(col("doc_id").as("src"),
          pmod(col("doc_id") * 31 + 7, lit(n)).as("dst")))
      val dist = analytics.Graph.seedDistances(edges,
        docs.where(col("doc_id") < 5), maxRounds = 16, idCol = "doc_id")
      val mx = dist.agg(max(col("dist")).as("max_dist"))
      docs.select(col("doc_id"))
        .join(dist.withColumnRenamed("v", "doc_id"), Seq("doc_id"), "left")
        .crossJoin(broadcast(mx))
        .select(col("doc_id"), col("dist"), col("max_dist"))
        .orderBy(col("doc_id"))
    }),

    // Harmonic centrality from g06's seed sample over g01's graph —
    // Boldi & Vigna 2014's closeness variant (Σ 1/d, unreachable = 0:
    // no disconnected-graph pathology), the third centrality next to
    // degree (g04) and PageRank (g01). The g09 integer discipline:
    // each term is the exact half-up 10⁹/d, the sum plain BIGINT —
    // zero float in the chain, the twin replays per-seed BFS exactly.
    "g10_harmonic" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val n = docs.count()
      val edges = docs.select(col("doc_id").as("src"),
          pmod(col("doc_id") * 7 + 13, lit(n)).as("dst"))
        .unionByName(docs.select(col("doc_id").as("src"),
          pmod(col("doc_id") * 31 + 7, lit(n)).as("dst")))
      val h = analytics.Graph.harmonicCentrality(edges,
        docs.where(col("doc_id") < 5), maxRounds = 16, idCol = "doc_id")
      docs.select(col("doc_id"))
        .join(h.withColumnRenamed("v", "doc_id"), Seq("doc_id"), "left")
        .select(col("doc_id"),
          coalesce(col("n_reached"), lit(0L)).as("n_reached"),
          coalesce(col("harmonic_e9"), lit(0L)).as("harmonic_e9"),
          coalesce(col("harmonic"), lit(0.0)).as("harmonic"))
        .orderBy(col("doc_id"))
    }),

    // Community detection: 4 synchronous label-propagation rounds over a
    // block-community graph (8-id blocks wired as a ring (+1) plus a +2
    // chord — odd AND even hop lengths, so the block graph is
    // NON-bipartite; a ±1/±3 wiring is bipartite on Z8 and synchronous
    // LPA oscillates on it forever, measured as 125 fragments before
    // this chord was fixed — plus one bridge edge every 32 ids). Blocks
    // converge to one label each by round 3 while the sparse bridges
    // can't flip a mode majority; integer-only, every round unrolled in
    // the twin. The community signal a curation pipeline uses to group
    // near-identical site sections / link farms.
    "g07_label_prop" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val n = docs.count()
      val base = col("doc_id") - pmod(col("doc_id"), lit(8L))
      val edges = docs.select(col("doc_id").as("src"),
          (base + pmod(col("doc_id") + 1, lit(8L))).as("dst"))
        .unionByName(docs.select(col("doc_id").as("src"),
          (base + pmod(col("doc_id") + 2, lit(8L))).as("dst")))
        .unionByName(docs.where(pmod(col("doc_id"), lit(32L)) === 0)
          .select(col("doc_id").as("src"),
            pmod(col("doc_id") + 8, lit(n)).as("dst")))
      analytics.Graph.labelPropagation(edges, docs, rounds = 4, idCol = "doc_id")
        .select(col("doc_id"), col("community"))
        .orderBy(col("doc_id"))
    }),

    // Neighborhood quality smoothing (GraphSAGE mean aggregator over
    // g01's link graph, symmetrized): h1/h2 = the 1-hop / 2-hop mean of
    // the t02 quality signal — the "is this page surrounded by junk"
    // feature a link-farm classifier trains on; a good-looking page
    // inside a bad neighborhood surfaces here, not in t02.
    "g08_feature_prop" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val n = docs.count()
      val edges = docs.select(col("doc_id").as("src"),
          pmod(col("doc_id") * 7 + 13, lit(n)).as("dst"))
        .unionByName(docs.select(col("doc_id").as("src"),
          pmod(col("doc_id") * 31 + 7, lit(n)).as("dst")))
      val q = qualityScored(docs).select(col("doc_id"), col("quality"))
      // raw doubles end-to-end: the fold order pins every bit, and any
      // round() would reintroduce the decimal-half-boundary divergence
      // (see featurePropagation's doc)
      analytics.Graph.featurePropagation(edges, q, hops = 2,
          idCol = "doc_id", featCol = "quality")
        .select(col("doc_id"), col("quality"), col("h1"), col("h2"))
        .orderBy(col("doc_id"))
    }),

    // Similarity: brute-force cosine top-k (exact baseline).
    "s01_cosine_topk" -> ((s, dir) => {
      val e = t(s, dir, "embeddings")
      Similarity.bruteForceTopK(e, e.where(col("vec_id") < 10), k = 5)
        .select(col("probe_id"), col("rank").as("rnk"), col("neighbor_id"),
          round(col("sim"), 6).as("sim"))
        .orderBy(col("probe_id"), col("rnk"))
    }),


    // Similarity: multi-table LSH random-hyperplane top-k (the scale path;
    // recall vs s01 floor-asserted in SimilaritySpec). The hyperplanes are
    // seeded literals from Similarity.hyperplanes — the oracle embeds the
    // SAME doubles as a VALUES CTE (lshPlanesValues), so bucketing,
    // candidate generation, and the exact re-ranking are all hash-matched
    // cross-engine.
    "s02_lsh_topk" -> ((s, dir) => {
      val e = t(s, dir, "embeddings")
      Similarity.lshTopK(e, e.where(col("vec_id") < 10), k = 5,
          nTables = 16, planesPerTable = 4, dim = 64)
        .select(col("probe_id"), col("rank").as("rnk"), col("neighbor_id"),
          round(col("sim"), 6).as("sim"))
        .orderBy(col("probe_id"), col("rnk"))
    }),


    // s02 through the PERSISTED index artifact (s28): write-once
    // bucketBy(bucket) LSH index with denormalized vec/norm, probe via a
    // collected control-sized bucket-key filter (Spark bucket pruning —
    // SelectedBucketsCount plan-audited in SimilaritySpec), score from
    // the index's own columns, never touching the raw corpus. Same
    // config as s02 ⇒ same result ⇒ the SAME DuckDB oracle — the
    // strongest equivalence statement the gate can make about an index
    // path: identical answers from a structurally different plan.
    "s28_lsh_index_topk" -> ((s, dir) => {
      val e = t(s, dir, "embeddings")
      val tbl = "graft_s28_lsh_idx"
      Similarity.writeLshIndex(e, tbl, nTables = 16, planesPerTable = 4,
        dim = 64)
      Similarity.lshTopKFromIndex(e.where(col("vec_id") < 10), tbl, k = 5,
          nTables = 16, planesPerTable = 4, dim = 64)
        .select(col("probe_id"), col("rank").as("rnk"), col("neighbor_id"),
          round(col("sim"), 6).as("sim"))
        .orderBy(col("probe_id"), col("rnk"))
    }),


    // Similarity: IVF coarse-quantizer top-k (the bucketed ANN alternative
    // to s02; recall floor-asserted in SimilaritySpec). Cell assignment
    // ranks on round(cosine, 6) with cent_id tie-break — deterministic
    // across engines — so the DuckDB twin reproduces assignment, candidate
    // generation, and the exact re-ranking end-to-end.
    "s03_ivf_topk" -> ((s, dir) => {
      val e = t(s, dir, "embeddings")
      Similarity.ivfTopK(e, e.where(col("vec_id") < 10), k = 5, nCells = 16, nProbe = 8)
        .select(col("probe_id"), col("rank").as("rnk"), col("neighbor_id"),
          round(col("sim"), 6).as("sim"))
        .orderBy(col("probe_id"), col("rnk"))
    }),


    // s03 through the PERSISTED cell index (s29) — the s28 pattern on
    // the IVF family: cell-assigned corpus bucketed by cent_id with the
    // quantizer saved alongside; probes assign against the persisted
    // quantizer and read only their nProbe cells (bucket pruning,
    // SimilaritySpec-audited). Same config as s03 ⇒ same answer ⇒ s03's
    // oracle verbatim.
    "s29_ivf_index_topk" -> ((s, dir) => {
      val e = t(s, dir, "embeddings")
      val tbl = "graft_s29_ivf_idx"
      Similarity.writeIvfIndex(e, tbl, nCells = 16)
      Similarity.ivfTopKFromIndex(e.where(col("vec_id") < 10), tbl, k = 5,
          nProbe = 8)
        .select(col("probe_id"), col("rank").as("rnk"), col("neighbor_id"),
          round(col("sim"), 6).as("sim"))
        .orderBy(col("probe_id"), col("rnk"))
    }),


    // Incremental index maintenance (s30) — FAISS's `add` on a trained
    // index: build the cell index on the EVEN half, append the ODD half
    // against the PERSISTED quantizer (assignment rules shared with the
    // build by construction — Similarity.cellAssigned), query the merged
    // artifact. The answer is exactly "the union corpus cut by the
    // original quantizer", so the oracle is s03's chain with centroids
    // drawn from the even half only; SimilaritySpec additionally asserts
    // row equality with ivfTopKWithCentroids on the union and that the
    // quantizer survives the append byte-identical.
    "s30_ivf_index_delta" -> ((s, dir) => {
      val e = t(s, dir, "embeddings")
      val tbl = "graft_s30_ivf_idx"
      Similarity.writeIvfIndex(e.where(col("vec_id") % 2 === 0), tbl, nCells = 16)
      Similarity.appendToIvfIndex(e.where(col("vec_id") % 2 === 1), tbl)
      Similarity.ivfTopKFromIndex(e.where(col("vec_id") < 10), tbl, k = 5,
          nProbe = 8)
        .select(col("probe_id"), col("rank").as("rnk"), col("neighbor_id"),
          round(col("sim"), 6).as("sim"))
        .orderBy(col("probe_id"), col("rnk"))
    }),


    // Deletion + compaction on the cell index (s31) — FAISS `remove_ids`
    // closing the s29/s30 index-maintenance lifecycle (build, add,
    // remove). The inverted-LISTS layout (one cent_id partition per
    // cell) is what makes the delete maintainable: tombstones capture
    // each deleted id's cell, compaction rewrites ONLY touched lists
    // via dynamic partition overwrite (untouched lists' files
    // byte-identical — SimilaritySpec), and the quantizer never moves
    // even though deleted ids 2/7/12 are centroid SOURCES. The verified
    // path runs the full lifecycle: build → tombstone delete → compact →
    // query; the oracle is s03's chain with corpus assignment filtered
    // to survivors (assignment is per-vector, so filter-after-assign ≡
    // assign-the-filtered under the SAME full-corpus centroids).
    "s31_ivf_index_delete" -> ((s, dir) => {
      val e = t(s, dir, "embeddings")
      val tbl = "graft_s31_ivf_lists"
      Similarity.writeIvfLists(e, tbl, nCells = 16)
      Similarity.deleteFromIvfLists(e.where(col("vec_id") % 5 === 2), tbl)
      Similarity.compactIvfLists(tbl, s)
      Similarity.ivfListsTopK(e.where(col("vec_id") < 10), tbl, k = 5,
          nProbe = 8)
        .select(col("probe_id"), col("rank").as("rnk"), col("neighbor_id"),
          round(col("sim"), 6).as("sim"))
        .orderBy(col("probe_id"), col("rnk"))
    }),


    // Filtered (hybrid) ANN: top-k restricted to vectors passing a
    // metadata predicate (label = 3) — the filtered-vector-search
    // shape every retrieval stack needs. The predicate is pushed INTO
    // the index: the IVF cells quantize ONLY eligible vectors, so each
    // probe's k results are all eligible and never under-filled —
    // POST-filtering an unfiltered top-k under-returns (SimilaritySpec
    // proves most probes lose results that way; with ~1/10 eligible a
    // post-filter needs ~10k candidates to fill k). At 100 TB the
    // filtered index is a partition-pruned slice of a label-bucketed
    // index artifact — the predicate never touches ineligible vectors.
    "s12_filtered_ann" -> ((s, dir) => {
      val e = t(s, dir, "embeddings")
      Similarity.ivfTopK(e.where(col("label") === 3),
          e.where(col("vec_id") < 10), k = 5, nCells = 16, nProbe = 8)
        .select(col("probe_id"), col("rank").as("rnk"), col("neighbor_id"),
          round(col("sim"), 6).as("sim"))
        .orderBy(col("probe_id"), col("rnk"))
    }),

    // kNN-graph construction: every vector's top-3 neighbors via LSH
    // buckets — the all-corpus sibling of s02's probe search and the
    // input artifact of SemDeDup-style semantic clustering. Config is
    // d14's CLUSTER trade (8 tables × 8 planes, ~0.4% per-table
    // orthogonal-pair collision), NOT s02's 16×4 recall-first config —
    // that one collides ~63% of ALL pairs and would degenerate the
    // all-corpus candidate join to near-all-pairs (the d14 lesson,
    // measured there at 71 s vs ~2 s). Vectors whose buckets yield
    // < 3 candidates emit fewer rows — honest sparsity, not padding.
    "s13_knn_graph" -> ((s, dir) => {
      val e = t(s, dir, "embeddings")
      Similarity.lshTopK(e, e, k = 3, nTables = 8, planesPerTable = 8, dim = 64)
        .select(col("probe_id"), col("rank").as("rnk"), col("neighbor_id"),
          round(col("sim"), 6).as("sim"))
        .orderBy(col("probe_id"), col("rnk"))
    }),

    // Graph-traversal ANN (the HNSW-family shape, one layer): beam search
    // over the symmetrized kNN graph s13's machinery builds (k=8 edges —
    // measured: the k=3 graph walks at recall 0.24, k=8 at 0.72; sparse
    // graphs on random high-dim data aren't navigable), fixed entry
    // points (16 lowest ids), 4 expansion rounds, beam 16, every ranking
    // on (round-6 cosine desc, id asc) so the twin replays the walk move
    // for move. The query-time member of the family whose INDEX s13
    // builds: candidates are graph-local (frontier-bound per round),
    // never bucket-global. Recall vs brute force is floor-asserted in
    // SimilaritySpec.
    "s21_beam_search" -> ((s, dir) => {
      val e = t(s, dir, "embeddings")
      Similarity.beamSearchTopK(e, e.where(col("vec_id") < 10), k = 5,
          beamWidth = 16, rounds = 3, nTables = 8, planesPerTable = 8,
          dim = 64, graphK = 8)
        .select(col("probe_id"), col("rank").as("rnk"), col("neighbor_id"),
          col("sim"))
        .orderBy(col("probe_id"), col("rnk"))
    }),

    // Late-interaction (ColBERT MaxSim) retrieval: 8 consecutive vectors
    // form one document's token bag; score(q, d) sums each query token's
    // best cosine inside d. Probe token set (2 docs × 8 tokens) is
    // broadcast; the corpus streams once into two partial+final
    // aggregates — round-6 per-pair cosine before the max and an exact
    // DECIMAL(18,6) fold for the sum make the score addition-order-free,
    // so the twin hash-matches bit-for-bit.
    "s22_maxsim" -> ((s, dir) => {
      val e = t(s, dir, "embeddings")
      Similarity.maxSimTopK(e, probeDocs = Seq(0L, 1L), k = 5,
          tokensPerDoc = 8)
        .select(col("probe_doc"), col("rank").as("rnk"),
          col("neighbor_doc"), col("score"))
        .orderBy(col("probe_doc"), col("rnk"))
    }),

    // Random-projection (JL) ANN: candidates by 32-dim PROJECTED cosine
    // (one seeded-Gaussian linear map per vector, computed once), exact
    // 64-dim re-rank of the top-100 — the dimensionality-reduction ANN
    // family next to s02's hashing one (signs-only buckets lose
    // resolution near plane boundaries; real-valued projections keep a
    // ranking). Candidate selection ranks round(projected cosine, 6)
    // with id tie-break — the s03 determinism contract — so the twin
    // replays projection, candidate choice, and re-rank end-to-end from
    // the same plane doubles. Recall vs exact is floor-asserted in
    // SimilaritySpec.
    "s14_rp_topk" -> ((s, dir) => {
      val e = t(s, dir, "embeddings")
      Similarity.rpTopK(e, e.where(col("vec_id") < 10), k = 5,
          rDim = 32, nCand = 100, dim = 64)
        .select(col("probe_id"), col("rank").as("rnk"), col("neighbor_id"),
          round(col("sim"), 6).as("sim"))
        .orderBy(col("probe_id"), col("rnk"))
    }),

    // Hard-negative mining for contrastive training: each probe's top-5
    // most-similar DIFFERENT-label vectors — the near-miss examples an
    // embedding model learns from (random negatives are mostly too
    // easy). The label-inequality predicate is pushed INTO the scoring
    // join (s12's lesson: post-filtering a label-blind top-k
    // under-returns); exact brute force over the complement, (sim desc,
    // id) ranked.
    "s15_hard_negatives" -> ((s, dir) => {
      val e = t(s, dir, "embeddings")
      Similarity.hardNegatives(e, e.where(col("vec_id") < 10), k = 5)
        .select(col("probe_id"), col("rank").as("rnk"), col("neighbor_id"),
          col("neg_label"), round(col("sim"), 6).as("sim"))
        .orderBy(col("probe_id"), col("rnk"))
    }),

    // SemDeDup semantic near-dup removal: vectors compared ONLY inside
    // their s03-assigned cell (Σ|cell|² pair term, never n²); within a
    // cell a vector is dropped when a keep-priority-earlier cell-mate
    // (centroid-cosine asc, id asc — the paper keeps the LEAST
    // prototypical member of each duplicate ball) has round-6 cosine
    // ≥ 0.3. τ=0.3 sits above this corpus' p99 pairwise cosine, so the
    // verdict column is non-trivially mixed. Quantizer = 16 lowest-id
    // vectors (the s03/s06 stand-in; production feeds kmeansCentroids).
    "s16_semdedup" -> ((s, dir) => {
      val e = t(s, dir, "embeddings")
      val cents = e.orderBy(col("vec_id")).limit(16)
        .select(col("vec_id").as("cent_id"), col("embedding").as("cent_vec"))
      Similarity.semDeDup(e, cents, tau = 0.3)
        .select(col("vec_id"), col("cent_id"), col("csim"), col("kept"))
        .orderBy(col("vec_id"))
    }),

    // Prototype pruning: keep each cell's hardest 3/5 by centroid
    // cosine (asc = least prototypical first), exact integer keep gate
    // rank·5 ≤ n_cell·3 — the data-pruning rule of Sorscher et al.;
    // per-cell ranking so tight clusters aren't emptied by a global
    // threshold. One assignment pass + one cent_id shuffle, no pairs.
    "s17_prototype_prune" -> ((s, dir) => {
      val e = t(s, dir, "embeddings")
      val cents = e.orderBy(col("vec_id")).limit(16)
        .select(col("vec_id").as("cent_id"), col("embedding").as("cent_vec"))
      Similarity.prototypePrune(e, cents, keepNum = 3, keepDenom = 5)
        .select(col("vec_id"), col("cent_id"), col("csim"),
          col("cell_n"), col("cell_rank"), col("kept"))
        .orderBy(col("vec_id"))
    }),

    // Binary sign-embedding ANN: 63 packed sign bits per vector (an
    // 8-byte mask replacing 256 bytes of floats — the deepest
    // compression point of the family), Hamming-distance candidates
    // (one xor+popcount per pair, PURE INTEGER — the only ANN candidate
    // stage in the catalog with no float discipline at all), exact
    // top-100 re-rank. Charikar 2002: Hamming/63 estimates angle/π.
    "s20_binary_topk" -> ((s, dir) => {
      val e = t(s, dir, "embeddings")
      Similarity.binaryTopK(e, e.where(col("vec_id") < 10), k = 5,
          nCand = 100, dim = 64)
        .select(col("probe_id"), col("rank").as("rnk"), col("neighbor_id"),
          round(col("sim"), 6).as("sim"))
        .orderBy(col("probe_id"), col("rnk"))
    }),

    // IVF-PQ with residual encoding — FAISS's IVFPQ, the
    // billion-vector production index: coarse cell routing (s03's
    // assignment), PQ over RESIDUALS vector−centroid (they concentrate
    // near 0, so the codebook budget goes much further than on raw
    // vectors), per-visited-cell ADC tables from the probe's residual
    // in THAT cell's frame. 8 bytes of codes replace 256 bytes of
    // floats per corpus vector; raw vectors are touched only at build.
    "s19_ivfpq_topk" -> ((s, dir) => {
      val e = t(s, dir, "embeddings")
      Similarity.ivfPqTopK(e, e.where(col("vec_id") < 10), k = 5,
          nCells = 16, nProbe = 4, m = 8, ks = 16, dim = 64)
        .orderBy(col("probe_id"), col("rank"))
    }),

    // Matryoshka truncation-recall eval: exact top-5 at prefix dims
    // 8/16/32/64 vs the full-64 top-5 — the measurement deciding whether
    // a short-prefix scan + full-width re-rank (8× less IO at 64→8) is
    // affordable for this embedding. dim=64 is the identity self-check
    // (recall 1.0 by construction). Integer hit counts, one division.
    "s18_matryoshka" -> ((s, dir) => {
      val e = t(s, dir, "embeddings")
      Similarity.matryoshkaRecall(e, e.where(col("vec_id") < 10), k = 5,
          dims = Seq(8, 16, 32, 64))
        .orderBy(col("dim"))
    }),

    // Diversified retrieval: MMR greedy top-3 over the 10 nearest
    // candidates (λ=0.7) — near-duplicate neighbors can't crowd a result
    // set (diverse few-shot selection / dedup'd RAG contexts). Round-6
    // relevance and pair sims, identical score chain, id tie-breaks; the
    // twin unrolls all greedy rounds.
    "s09_mmr" -> ((s, dir) => {
      val e = t(s, dir, "embeddings")
      Similarity.mmrTopK(e, e.where(col("vec_id") < 5),
          kCand = 10, kSelect = 3, lambda = 0.7)
        .orderBy(col("probe_id"), col("mmr_rank"))
    }),


    // ANN quality measurement: recall@5 of the IVF scale path (s03's
    // config) against exact brute force (s01) — "measure, don't guess"
    // applied to the engine's own approximate operator. Per-probe hit
    // counts, so a recall regression localizes to the probe that lost
    // its neighbor.
    "s04_recall" -> ((s, dir) => {
      val e = t(s, dir, "embeddings")
      val probes = e.where(col("vec_id") < 10)
      // persisted: read by the hit semi-join AND the per-probe denominator
      // — without the cut the full brute-force corpus scan runs twice
      // (k·|probes| rows; the d04 cache convention, dropped by clearCache)
      val exact = Similarity.bruteForceTopK(e, probes, k = 5)
        .select(col("probe_id"), col("neighbor_id"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val ivf = Similarity.ivfTopK(e, probes, k = 5, nCells = 16, nProbe = 8)
        .select(col("probe_id"), col("neighbor_id"))
      val hits = exact.join(ivf, Seq("probe_id", "neighbor_id"), "left_semi")
        .groupBy(col("probe_id")).agg(count(lit(1)).as("n_hit"))
      exact.groupBy(col("probe_id")).agg(count(lit(1)).as("n_exact"))
        .join(hits, Seq("probe_id"), "left")
        .select(col("probe_id"), col("n_exact"),
          coalesce(col("n_hit"), lit(0L)).as("n_hit"))
        .withColumn("recall",
          round(col("n_hit").cast("double") / col("n_exact"), 6))
        .orderBy(col("probe_id"))
    }),


    // Trained-quantizer IVF: deterministic fixed-iteration spherical
    // k-means (init = s03's lowest-id quantizer, so iteration 0 is the
    // baseline) feeding the same IVF search; recall@5 of BOTH quantizers
    // against exact brute force, per probe. km_ge_base compares total hit
    // COUNTS (integer, order-free) — the trained quantizer must not lose
    // to the stand-in it replaces. The oracle replays training exactly:
    // round-6 assignment ties, vec-id-ordered mean folds, 9-dp centroid
    // rounding.
    "s05_kmeans" -> ((s, dir) => {
      val e = t(s, dir, "embeddings")
      val probes = e.where(col("vec_id") < 10)
      // persisted: three consumers (two hit semi-joins + the denominator)
      // — without the cut the brute-force scan runs three times, and the
      // km_ge_base flag's re-execution of `out` doubles everything again
      // (k·|probes| rows; session-owned, dropped by clearCache)
      val exact = Similarity.bruteForceTopK(e, probes, k = 5)
        .select(col("probe_id"), col("neighbor_id"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val base = Similarity.ivfTopK(e, probes, k = 5, nCells = 16, nProbe = 8)
        .select(col("probe_id"), col("neighbor_id"))
      // replayableMeans: the SQL twin replays the mean fold in vec-id
      // order bit-exactly; the production default is plain partial avg
      val cents = Similarity.kmeansCentroids(e, nCells = 16, iters = 3,
        replayableMeans = true)
      val km = Similarity.ivfTopKWithCentroids(e, probes, k = 5, cents, nProbe = 8)
        .select(col("probe_id"), col("neighbor_id"))
      def hits(app: org.apache.spark.sql.DataFrame, name: String) =
        exact.join(app, Seq("probe_id", "neighbor_id"), "left_semi")
          .groupBy(col("probe_id")).agg(count(lit(1)).as(name))
      val out = exact.groupBy(col("probe_id")).agg(count(lit(1)).as("n_exact"))
        .join(hits(base, "hb"), Seq("probe_id"), "left")
        .join(hits(km, "hk"), Seq("probe_id"), "left")
        .select(col("probe_id"), col("n_exact"),
          coalesce(col("hb"), lit(0L)).as("n_hit_base"),
          coalesce(col("hk"), lit(0L)).as("n_hit_km"))
        .withColumn("recall_base",
          round(col("n_hit_base").cast("double") / col("n_exact"), 6))
        .withColumn("recall_km",
          round(col("n_hit_km").cast("double") / col("n_exact"), 6))
        // persisted: the flag aggregate below re-reads the whole frame —
        // without the cut all three search pipelines execute twice
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val flag = out.agg((sum(col("n_hit_km")) >= sum(col("n_hit_base"))).as("km_ge_base"))
      out.crossJoin(flag) // 1-row scalar broadcast
        .orderBy(col("probe_id"))
    }),


    // Similarity: TRAINED PQ codebooks — per-subspace L2 Lloyd (iteration
    // 0 = s07's stand-in), recall@5 of both codebooks against exact
    // squared-L2 brute force, per probe. The oracle replays training
    // round by round (vec-id-ordered mean folds, round-9) plus both
    // encode/ADC chains and the exact reference.
    "s08_pq_trained" -> ((s, dir) => {
      val e = t(s, dir, "embeddings")
      val probes = e.where(col("vec_id") < 10)
      // persisted: three consumers (two hit semi-joins + the denominator)
      // — the s05 note
      val exact = Similarity.bruteForceL2TopK(e, probes, k = 5)
        .select(col("probe_id"), col("neighbor_id"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val base = Similarity.pqTopK(e, probes, k = 5, m = 8, ks = 16, dim = 64)
        .select(col("probe_id"), col("neighbor_id"))
      val cb = Similarity.pqTrainCodebooks(e, m = 8, ks = 16, iters = 2,
        dim = 64, replayableMeans = true)
      val tr = Similarity.pqTopKWithCodebooks(e, probes, k = 5, cb,
          m = 8, ks = 16, dim = 64)
        .select(col("probe_id"), col("neighbor_id"))
      def hits(app: org.apache.spark.sql.DataFrame, name: String) =
        exact.join(app, Seq("probe_id", "neighbor_id"), "left_semi")
          .groupBy(col("probe_id")).agg(count(lit(1)).as(name))
      exact.groupBy(col("probe_id")).agg(count(lit(1)).as("n_exact"))
        .join(hits(base, "hb"), Seq("probe_id"), "left")
        .join(hits(tr, "ht"), Seq("probe_id"), "left")
        .select(col("probe_id"), col("n_exact"),
          coalesce(col("hb"), lit(0L)).as("n_hit_base"),
          coalesce(col("ht"), lit(0L)).as("n_hit_tr"))
        .withColumn("recall_base",
          round(col("n_hit_base").cast("double") / col("n_exact"), 6))
        .withColumn("recall_tr",
          round(col("n_hit_tr").cast("double") / col("n_exact"), 6))
        .orderBy(col("probe_id"))
    }),


    // Similarity: cluster-balanced sampling — the q36 quota with the
    // stratum lifted to embedding space (SemDeDup-style cluster
    // balancing): s03's deterministic cell assignment (round-6 cosine,
    // cent_id tie-break, lowest-id quantizer) + per-cell md5-permutation
    // cap. Corpus is one broadcast-NLJ pass; quota is one shuffle on the
    // cell id.
    "s06_cluster_sample" -> ((s, dir) => {
      val e = t(s, dir, "embeddings")
      val cents = e.orderBy(col("vec_id")).limit(16)
        .select(col("vec_id").as("cent_id"), col("embedding").as("cent_vec"))
      Similarity.clusterBalancedSample(e, cents, k = 8)
        .select(col("cent_id"), col("sample_rank"), col("vec_id"))
        .orderBy(col("cent_id"), col("sample_rank"))
    }),


    // Similarity: product-quantization ADC top-k — the memory-compression
    // ANN path (codes are m small ints vs dim floats): literal codebook
    // (ks lowest-id subvectors), per-row encode + probe tables as pure
    // projections, scoring by m table lookups. The twin re-derives the
    // codebook, encoding, tables, and the j-ordered ADC fold.
    "s07_pq_topk" -> ((s, dir) => {
      val e = t(s, dir, "embeddings")
      Similarity.pqTopK(e, e.where(col("vec_id") < 10), k = 5,
          m = 8, ks = 16, dim = 64)
        .orderBy(col("probe_id"), col("rank"))
    }),


    // Multimodal: resize planning for image payloads — width/height PARSED
    // from the synthesized PNG IHDR bytes, then the aspect-preserving
    // integer resize arithmetic (the scheduling logic a decoder follows).
    "m02_multimodal_resize" -> ((s, dir) => {
      val withBin = Multimodal.withPayload(t(s, dir, "documents"))
        .where(col("modality") === "image")
      val meta = Multimodal.decodeImage(col("payload"))
      withBin
        .select(col("doc_id"), meta.as("meta"))
        .select(col("doc_id"),
          col("meta.width").as("w"), col("meta.height").as("h"),
          Multimodal.resizePlan(col("meta"), 64).getField("width").as("rw"),
          Multimodal.resizePlan(col("meta"), 64).getField("height").as("rh"))
        .orderBy(col("doc_id"))
    }),


    // Multimodal: audio chunk planning — sample count PARSED from the
    // synthesized WAV RIFF header (little-endian dataSize / blockAlign),
    // then the fixed-window segmentation arithmetic (ceil-div chunks, the
    // last one carrying the remainder).
    "m03_audio_chunks" -> ((s, dir) => {
      val audio = Multimodal.withPayload(t(s, dir, "documents"))
        .where(col("modality") === "audio")
      val meta = Multimodal.decodeAudio(col("payload"))
      audio.select(col("doc_id"), meta.as("m"))
        .select(col("doc_id"),
          col("m").getField("n_samples").as("n_samples"),
          Multimodal.audioChunkPlan(col("m")).getField("n_chunks").as("n_chunks"),
          Multimodal.audioChunkPlan(col("m")).getField("last_chunk_samples").as("last_chunk"))
        .orderBy(col("doc_id"))
    }),


    // Multimodal: the full video frame-sampling plan — 4 evenly spaced
    // byte offsets per payload (m01 surfaces only one), the scheduling
    // arithmetic a distributed frame decoder fans out over.
    "m04_frames" -> ((s, dir) => {
      Multimodal.withPayload(t(s, dir, "documents"))
        .where(col("modality") === "video")
        .select(col("doc_id"), length(col("payload")).cast("bigint").as("n_bytes"),
          posexplode(Multimodal.frameSampleOffsets(col("payload"), 4)))
        .toDF("doc_id", "n_bytes", "frame_idx", "byte_off")
        .orderBy(col("doc_id"), col("frame_idx"))
    }),


    // ViT patch tiling plan: decoded PNG dims → 16×16 grid fan-out with
    // edge clipping (m04's frame-offset schedule, two dimensions up) —
    // the per-tile unit a distributed patch embedder consumes. Header
    // arithmetic only; tile pixel decode is the documented stub.
    "m05_patch_grid" -> ((s, dir) => {
      val withBin = Multimodal.withPayload(t(s, dir, "documents"))
        .where(col("modality") === "image")
      withBin
        .select(col("doc_id"), Multimodal.decodeImage(col("payload")).as("meta"))
        .select(col("doc_id"), col("meta.width").as("w"), col("meta.height").as("h"),
          explode(Multimodal.patchGridPlan(col("meta"), 16)).as("pt"))
        .select(col("doc_id"), col("w"), col("h"),
          col("pt.py"), col("pt.px"), col("pt.x0"), col("pt.y0"),
          col("pt.pw"), col("pt.ph"))
        .orderBy(col("doc_id"), col("py"), col("px"))
    }),


    // Multimodal: binary payloads with REAL container headers (PNG
    // signature+IHDR, WAV RIFF), metadata parsed back from the bytes.
    "m01_multimodal_meta" -> ((s, dir) => {
      Multimodal.extractFeatures(t(s, dir, "documents")).select(
        col("doc_id"), col("modality"), col("n_bytes"),
        col("image_meta").getField("width").as("img_w"),
        col("image_meta").getField("height").as("img_h"),
        col("image_meta").getField("channels").as("img_c"),
        col("audio_meta").getField("n_samples").as("audio_samples"),
        element_at(col("frame_offsets"), 3).as("frame2_off"))
        .orderBy(col("doc_id"))
    }),


    // Binary DLQ (q55's dead-letter split for multimodal payloads):
    // triage every payload from its BYTES — magic sniff, header-fit
    // length checks — under a deterministic corruption fixture
    // (doc_id%7 mid-header truncation, doc_id%11 first-byte bit-rot).
    // Containerless bodies (the video fixture) can't be magic-triaged
    // and pass to the codec probe instead of quarantining. Pure per-row
    // projection; the twin computes every verdict arithmetically from
    // (modality, corruption class, length), so a parser off-by-one on
    // the Spark side breaks the hash.
    "m08_payload_triage" -> ((s, dir) =>
      Multimodal.payloadTriage(t(s, dir, "documents"))
        .orderBy(col("doc_id"))),

    // Mixed-container sniff + decode (JPEG/MP3 alongside PNG/WAV): every
    // other image is JPEG (SOI → APP0-hop → SOF0 segment WALK for dims),
    // every other audio payload an MPEG-1 Layer III frame header (sync +
    // bitrate/sample-rate index tables + the ISO frame-length formula),
    // through m08's corruption fixture. The twin computes every decoded
    // field arithmetically from the fixture, so an off-by-one in any of
    // the four parsers breaks the hash.
    "m09_container_meta" -> ((s, dir) =>
      Multimodal.containerMeta(t(s, dir, "documents"))
        .orderBy(col("doc_id"))),

    // GIF logical-screen-descriptor parse — the family's first
    // LITTLE-ENDIAN dimension container (PNG/JPEG are BE): synthesized
    // GIF87a/89a bytes with LE u16 width/height sized to exercise both
    // bytes, packed-byte GCT flag/size bits, the 3*2^(s+1)-byte table,
    // and the 0x3B trailer; every field parsed back from the BYTES while
    // the twin computes it arithmetically from doc_id — an endianness
    // slip anywhere breaks the hash.
    "m13_gif_meta" -> ((s, dir) => {
      val g = Multimodal.withGif(t(s, dir, "documents"))
      val m = Multimodal.decodeGif(col("payload"))
      g.select(col("doc_id"), m.as("m"),
          length(col("payload")).cast("long").as("n_bytes"),
          (hex(substring(col("payload"), -1, 1)) === "3B").as("trailer_ok"))
        .select(col("doc_id"), col("m.version").as("version"),
          col("m.width").as("width"), col("m.height").as("height"),
          col("m.has_gct").as("has_gct"),
          col("m.gct_size_bits").as("gct_size_bits"),
          col("m.gct_bytes").as("gct_bytes"),
          col("n_bytes"), col("trailer_ok"))
        .orderBy(col("doc_id"))
    }),

    // TIFF header + first-IFD parse — the byte-order-MARKER container:
    // endianness is declared in-band ("II"/"MM"), so ONE parser
    // dispatches per row (half the corpus is LE, half BE). LONG dims
    // sized past u16 exercise all four value bytes; SHORT values sit
    // left-justified in the 4-byte field (the read a naive u32 gets
    // wrong in exactly one byte order); the IFD is reached through the
    // PARSED u32 offset and tags are searched under the PARSED entry
    // count. The twin computes every field arithmetically from doc_id —
    // an endianness slip in either direction breaks the hash.
    "m14_tiff_meta" -> ((s, dir) => {
      val g = Multimodal.withTiff(t(s, dir, "documents"))
      val m = Multimodal.decodeTiff(col("payload"))
      g.select(col("doc_id"), m.as("m"),
          length(col("payload")).cast("long").as("n_bytes"))
        .select(col("doc_id"), col("m.byte_order").as("byte_order"),
          col("m.magic_ok").as("magic_ok"), col("m.ifd_off").as("ifd_off"),
          col("m.n_entries").as("n_entries"), col("m.width").as("width"),
          col("m.height").as("height"),
          col("m.bits_per_sample").as("bits_per_sample"),
          col("m.compression").as("compression"),
          col("m.next_ifd").as("next_ifd"), col("n_bytes"))
        .orderBy(col("doc_id"))
    }),

    // ustar (tar) archive walk — the family's first MULTI-ENTRY
    // container with data-dependent offsets: entry 1's header position
    // must be computed from entry 0's PARSED size (512-byte blocks), the
    // numeric fields are octal ASCII (a third numeric encoding after
    // BE/LE binary), and each header carries its own integrity receipt —
    // the parser recomputes the checksum from the BYTES while the twin
    // derives it ARITHMETICALLY from the known fields (ord-folds over
    // the name and octal strings), meeting only if every field landed
    // byte-exact. The synthesized archives are real: GNU tar lists them
    // (AHashSpec external receipt).
    "m15_tar_walk" -> ((s, dir) =>
      Tar.parseTar(Tar.withTar(t(s, dir, "documents")))
        .orderBy(col("doc_id"), col("entry_idx"))),

    // WARC ingest (ISO 28500 — the Common Crawl record format): the
    // generator wraps each document as a WARC/1.0 response record (WARC
    // headers + HTTP response + HTML), the parser recovers every field
    // from the record TEXT alone — header/payload split, Content-Length
    // validation (doc_id%11==5 declares 7 bytes long), HTTP status
    // (doc_id%7==3 is a 404), tag-stripped extraction. The twin computes
    // all expectations arithmetically from the fixture, so any parser
    // off-by-one (boundary, regex, length) breaks the hash. Pure per-row
    // projection — a map-only pass that rides the scan at any scale.
    "m10_warc_extract" -> ((s, dir) =>
      Warc.parseWarc(Warc.withWarc(t(s, dir, "documents")))
        .orderBy(col("doc_id"))),

    // Metadata scrub (the EXIF-strip privacy op): PNG payloads carry an
    // ancillary tEXt("Author\0...") chunk between IHDR and IDAT; the
    // strip WALKS the chunk length fields, removes it byte-exactly, and
    // re-parses the stripped stream (first chunk must be the critical
    // IDAT). The twin computes every field arithmetically from the
    // fixture — lengths, the null-split key, the varying value length —
    // so a walk off-by-one anywhere breaks the hash.
    "m12_meta_strip" -> ((s, dir) =>
      Multimodal.withPayloadTagged(t(s, dir, "documents"))
        .where(col("modality") === "image")
        .select(col("doc_id"), Multimodal.stripAncillaryMeta(col("payload")).as("m"))
        .select(col("doc_id"), col("m.orig_len"), col("m.stripped_len"),
          col("m.meta_key"), col("m.meta_vlen"), col("m.first_chunk_after"),
          col("m.clean"))
        .orderBy(col("doc_id"))),

    // Shot-boundary detection (hard-cut detector) over the video payloads:
    // 8 evenly spaced frame samples per stream, 4-class character
    // histogram per frame (the luminance-histogram stand-in), boundary
    // where consecutive frames' L1 histogram delta ≥ 14 (picked from the
    // measured delta distribution: median 8, p90 18 — a real boundary
    // mix, not all-true/all-false). The m04 frame schedule with actual
    // per-frame CONTENT work; per-doc lag window, no global sort.
    "m11_shot_boundaries" -> ((s, dir) =>
      Multimodal.shotBoundaries(t(s, dir, "documents"), frames = 8,
          window = 64, threshold = 14)
        .orderBy(col("doc_id"), col("frame_idx"))),

    // k-center greedy coreset selection (Gonzalez 1985 farthest-point;
    // Sener & Savarese 2018's data-selection use): 8 maximally-spread
    // representatives of the embedding corpus, each round's pick the
    // argmin of 6-dp max-cosine-to-selected with id tie-break. Driver-
    // coordinated (selected set = control data): one partial+final
    // min_by aggregate per round over the persisted (id, vec, norm)
    // projection — the corpus never shuffles. The oracle replays all 8
    // rounds move for move (unrolled MATERIALIZED CTEs).
    "s23_kcenter" -> ((s, dir) =>
      Similarity.kCenterGreedy(t(s, dir, "embeddings"), k = 8)
        .orderBy(col("sel_order"))),

    // IVF recall OPERATING CURVE: recall@5 at nProbe ∈ {1,2,4,8,16} from
    // ONE shared assignment + scoring pass (candidates tagged by probe-
    // side cell rank; level p = the rank-≤p slice re-ranked) — THE
    // artifact an ANN deployment picks its nProbe from. Probing all 16
    // cells covers every corpus vector's home cell, so the top row is
    // exactly brute force: recall 1.0 by construction (s04's invariant).
    "s25_ivf_sweep" -> ((s, dir) => {
      val e = t(s, dir, "embeddings")
      Similarity.ivfRecallSweep(e, e.where(col("vec_id") < 10), k = 5,
          nCells = 16, probeCounts = Seq(1, 2, 4, 8, 16))
        .orderBy(col("n_probe"))
    }),

    // PQ subspace-count operating curve: recall@5 at m in {4, 8, 16}
    // (sub_dim 16/8/4, code 4/8/16 bytes) — the recall-per-code-byte
    // trade a 100 TB PQ index picks its m from, against ONE shared
    // round-6 exact baseline. Each level re-encodes by necessity
    // (different slicing re-buckets every subvector) — the honest
    // tuning cost. SimilaritySpec pins the shared baseline and bounds.
    "s27_pq_sweep" -> ((s, dir) => {
      val e = t(s, dir, "embeddings")
      Similarity.pqMSweep(e, e.where(col("vec_id") < 10), k = 5,
          mGrid = Seq(4, 8, 16), ks = 16, dim = 64)
        .orderBy(col("m"))
    }),

    // Hierarchical-entry beam search (the HNSW upper level s21 lacks):
    // a ~√n coarse sample with its own brute-force kNN graph, 4-start
    // greedy per-probe descent (strict round-6 improvement,
    // deterministic), the top-beamWidth of the descent's visited pool as
    // the probe-LOCAL entry set, then s21's exact base-layer walk (same
    // graph, same beam, same rounds). The twin replays both levels move
    // for move; recall >= s21 at equal beam is asserted in
    // SimilaritySpec (measured 0.72/0.72, 0.62/0.56, 0.40/0.40 at
    // sf0.001/0.01/0.1 — single-start measured BELOW flat, 0.64, which
    // is why the descent is multi-chain).
    "s26_hier_beam" -> ((s, dir) => {
      val e = t(s, dir, "embeddings")
      Similarity.hierarchicalBeamTopK(e, e.where(col("vec_id") < 10), k = 5,
          beamWidth = 16, rounds = 3, descentRounds = 4, coarseGraphK = 4,
          nTables = 8, planesPerTable = 8, dim = 64, graphK = 8)
        .select(col("probe_id"), col("rank").as("rnk"), col("neighbor_id"),
          col("sim"))
        .orderBy(col("probe_id"), col("rnk"))
    }),

    // Semantic chunking over token-embedding streams (docs = bags of 8
    // consecutive vectors, s22's convention): a chunk boundary opens
    // where the adjacent-token cosine (round 6) drops below -0.1 (picked
    // from the measured distribution: median ~0.01, p25 -0.08 — a real
    // boundary mix), each position carrying its running chunk index —
    // the RAG segmentation complement to t28's fixed windows and d23's
    // CDC cuts. One map-only pass + per-doc lag/cumsum windows sharing
    // one bounded partitioning.
    "s24_semantic_chunks" -> ((s, dir) =>
      Similarity.semanticChunks(t(s, dir, "embeddings"),
          tokensPerDoc = 8, minCos = -0.1)
        .orderBy(col("doc"), col("pos"))),

    // Multi-probe LSH (Lv et al. 2007): a QUARTER of s02's tables (4 vs
    // 16), recall recovered by probing each bucket's Hamming-1
    // neighbors — probe-side-only expansion, equi-join preserved, the
    // index cost of 4 tables with the reach of many. Same exact-cosine
    // re-rank; SimilaritySpec measures the recall recovery against
    // single-probe at equal table count.
    "s11_multiprobe_lsh" -> ((s, dir) => {
      val e = t(s, dir, "embeddings")
      Similarity.lshTopK(e, e.where(col("vec_id") < 10), k = 5,
          nTables = 4, planesPerTable = 4, dim = 64, multiProbe = true)
        .select(col("probe_id"), col("rank").as("rnk"), col("neighbor_id"),
          round(col("sim"), 6).as("sim"))
        .orderBy(col("probe_id"), col("rnk"))
    }),


    // Degree distribution + power-law exponent (g01's graph): undirected
    // degree histogram and the Clauset–Shalizi–Newman MLE
    // α = 1 + N/Σ ln(d/dmin). The float sum collapses to the DEGREE-
    // VALUE level first (counts are exact integers; distinct degrees are
    // few), then folds in degree order over one small collected array —
    // deterministic without any blocked-fold machinery.
    "g04_degree_dist" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val n = docs.count()
      val de = docs.select(col("doc_id").as("src"),
          pmod(col("doc_id") * 7 + 13, lit(n)).as("dst"))
        .unionByName(docs.select(col("doc_id").as("src"),
          pmod(col("doc_id") * 31 + 7, lit(n)).as("dst")))
      val ue = de.select(least(col("src"), col("dst")).as("a"),
          greatest(col("src"), col("dst")).as("b"))
        .where(col("a") =!= col("b")).distinct()
      val deg = ue.select(col("a").as("v")).unionAll(ue.select(col("b").as("v")))
        .groupBy(col("v")).agg(count(lit(1)).as("d"))
      val hist = deg.groupBy(col("d")).agg(count(lit(1)).as("n_vertices"))
      val summary = hist
        .agg(collect_list(struct(col("d"), col("n_vertices"))).as("h"),
          min(col("d")).as("dmin"), sum(col("n_vertices")).as("nv"))
        .select(col("nv"), col("dmin"),
          aggregate(array_sort(col("h")), lit(0.0), (acc, e) =>
            acc + e.getField("n_vertices").cast("double") *
              log(e.getField("d").cast("double") / col("dmin").cast("double")))
            .as("slnd"))
        .select(col("nv"),
          when(col("slnd") > 0.0,
            round(lit(1.0) + col("nv").cast("double") / col("slnd"), 9))
            .as("alpha"))
      hist.crossJoin(broadcast(summary))
        .select(col("d").as("degree"), col("n_vertices"), col("nv"), col("alpha"))
        .orderBy(col("degree"))
    }),


    // Perceptual image near-dup (aHash): 64 body bytes → above-mean bits
    // (strict integer form, no division) → four 16-bit bands serving as
    // both fingerprint and Hamming-LSH keys; candidates from the banded
    // equi-joins only, Hamming via bit_count(xor). The byte-level image
    // dedup next to d06's embedding-cosine one.
    "m06_ahash_neardup" -> ((s, dir) =>
      Multimodal.aHashNearDups(t(s, dir, "documents"), maxHamming = 6)
        .orderBy(col("id_a"), col("id_b"))),

    // Cross-modal retrieval (the CLIP-style image↔caption pair-mining
    // plumbing): captions (first-8-token alt-text) retrieve their image
    // by cosine top-1 in ONE shared embedding space. Encoders are
    // deterministic md5 token-hash integer projections (STUBS — no
    // vision model in this container), but the image side derives its
    // tokens FROM THE PAYLOAD BYTES (PNG header stripped, body UTF-8
    // decoded: the vision-encoder seam a real model replaces), and the
    // retrieval join/top-1 machinery is the real s01 shape. is_match
    // records whether the true pair won — the mined-pair quality signal.
    "m07_crossmodal" -> ((s, dir) =>
      Multimodal.crossModalTop1(t(s, dir, "documents"), dim = 32,
        captionTokens = 16, maxProbeId = 30L)),


    // Scalar-quantization (int8) ADC top-k: per-dimension corpus bounds
    // as the model artifact, 0..255 codes as the stored representation,
    // bin-center dequantized squared-L2 scoring — the s01 broadcast-NLJ
    // shape with a 4× smaller corpus payload. The twin re-derives the
    // bounds, codes, and the j-ordered fold.
    "s10_sq_topk" -> ((s, dir) => {
      val e = t(s, dir, "embeddings")
      Similarity.sqTopK(e, e.where(col("vec_id") < 10), k = 5, dim = 64)
        .orderBy(col("probe_id"), col("rank"))
    }),


    // Per-vertex triangle counts over a synthesized link graph with real
    // closures (ring chords i→i+1, i→i+2 guarantee triangles; the 7i+13
    // family adds irregular degree) — degree-ordered wedge enumeration,
    // each triangle counted once, attributed to all three corners. Pure
    // integer arithmetic; the twin replays the same orientation and
    // closure joins.
    "g03_triangles" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val n = docs.count()
      val edges = docs.select(col("doc_id").as("src"),
          pmod(col("doc_id") + 1, lit(n)).as("dst"))
        .unionByName(docs.select(col("doc_id").as("src"),
          pmod(col("doc_id") + 2, lit(n)).as("dst")))
        .unionByName(docs.select(col("doc_id").as("src"),
          pmod(col("doc_id") * 7 + 13, lit(n)).as("dst")))
      analytics.Graph.triangleCounts(edges)
        .select(col("id").as("doc_id"), col("n_triangles"))
        .orderBy(col("doc_id"))
    }),
  )

  // ── DuckDB oracle twins ──

  val oracle: Map[String, String] = Map(

    "g01_pagerank" -> pageRankOracleSql(iters = 10, damping = 0.85),

    // Personalized-PageRank twin (g09): the scaled-integer replay with a
    // seed-conditional teleport vector.
    "g09_ppr" -> pprOracleSql(iters = 10, seeds = Seq(0L, 1L, 2L, 3L)),

    "g02_hits" -> hitsOracleSql(iters = 5),

    "g05_kcore" -> kCoreOracleSql(k = 5, maxRounds = 8),

    "g07_label_prop" -> lpaOracleSql(rounds = 4),

    // Feature-propagation twin (g08): the t02 quality CTEs, the g01
    // graph symmetrized, and each hop's neighbor-id-ordered fold / deg
    // with round-9 — the operator's exact discipline.
    "g08_feature_prop" ->
      s"""${qualityScoreCtes("WITH d AS (SELECT doc_id, lang, text FROM documents)")},
         |nn AS (SELECT count(*) AS n FROM documents),
         |e0 AS (SELECT doc_id AS src, (doc_id*7+13) % (SELECT n FROM nn) AS dst FROM documents
         |  UNION ALL SELECT doc_id, (doc_id*31+7) % (SELECT n FROM nn) FROM documents),
         |e AS MATERIALIZED (SELECT DISTINCT src, dst FROM (
         |    SELECT src, dst FROM e0 UNION ALL SELECT dst, src FROM e0) WHERE src <> dst),
         |h1 AS MATERIALIZED (SELECT e.src AS v,
         |    list_reduce(list_prepend(0.0, list(q.quality ORDER BY e.dst)),
         |      (a, b) -> a + b) / count(*) AS h1
         |  FROM e JOIN q ON q.doc_id = e.dst GROUP BY e.src),
         |h2 AS (SELECT e.src AS v,
         |    list_reduce(list_prepend(0.0, list(h1.h1 ORDER BY e.dst)),
         |      (a, b) -> a + b) / count(*) AS h2
         |  FROM e JOIN h1 ON h1.v = e.dst GROUP BY e.src)
         |SELECT d2.doc_id, q.quality, h1.h1, h2.h2
         |FROM documents d2 JOIN q ON q.doc_id = d2.doc_id
         |LEFT JOIN h1 ON h1.v = d2.doc_id
         |LEFT JOIN h2 ON h2.v = d2.doc_id
         |ORDER BY d2.doc_id""".stripMargin,

    // Seed-distance twin (g06): path enumeration capped at the same
    // round bound, min per vertex.
    "g06_seed_distance" ->
      """WITH RECURSIVE nn AS (SELECT count(*) AS n FROM documents),
        |e AS (SELECT doc_id AS src, (doc_id * 7 + 13) % (SELECT n FROM nn) AS dst FROM documents
        |  UNION ALL SELECT doc_id, (doc_id * 31 + 7) % (SELECT n FROM nn) FROM documents),
        |reach(id, dist) AS (
        |  SELECT doc_id, CAST(0 AS BIGINT) FROM documents WHERE doc_id < 5
        |  UNION
        |  SELECT e.dst, r.dist + 1 FROM reach r JOIN e ON r.id = e.src
        |  WHERE r.dist < 16),
        |md AS (SELECT id, min(dist) AS dist FROM reach GROUP BY id),
        |mx AS (SELECT max(dist) AS max_dist FROM md)
        |SELECT d.doc_id, md.dist, mx.max_dist
        |FROM documents d LEFT JOIN md ON d.doc_id = md.id CROSS JOIN mx
        |ORDER BY d.doc_id""".stripMargin,

    // WCC twin (g11): the dedup-family recursive min-label closure on
    // the block-confined synthetic graph; the contraction-agreement flag
    // is TRUE-asserted (the two Spark algorithms must agree with each
    // other AND with this closure).
    "g11_wcc" ->
      """WITH RECURSIVE nn AS (SELECT count(*) AS n FROM documents),
        |e0 AS (SELECT doc_id AS src,
        |    (doc_id - doc_id % 16) + ((doc_id * 7 + 3) % 16) AS dst
        |  FROM documents),
        |e AS (SELECT src, dst FROM e0 CROSS JOIN nn
        |  WHERE dst < n AND src <> dst),
        |bidir AS (SELECT src, dst FROM e
        |  UNION ALL SELECT dst AS src, src AS dst FROM e),
        |reach(id, label) AS (
        |  SELECT doc_id, doc_id FROM documents
        |  UNION
        |  SELECT b.dst, r.label FROM reach r JOIN bidir b ON r.id = b.src
        |  WHERE r.label < b.dst),
        |cc AS (SELECT id, min(label) AS cluster_id FROM reach GROUP BY id)
        |SELECT cluster_id, CAST(count(*) AS BIGINT) AS size,
        |  TRUE AS contracted_agrees
        |FROM cc GROUP BY cluster_id ORDER BY cluster_id""".stripMargin,

    // Harmonic-centrality twin (g10): g06's recursive reach carried per
    // (id, seed), then the exact half-up 10⁹/d integer terms summed as
    // BIGINT — zero float until the final single division.
    "g10_harmonic" ->
      """WITH RECURSIVE nn AS (SELECT count(*) AS n FROM documents),
        |e AS (SELECT doc_id AS src, (doc_id * 7 + 13) % (SELECT n FROM nn) AS dst FROM documents
        |  UNION ALL SELECT doc_id, (doc_id * 31 + 7) % (SELECT n FROM nn) FROM documents),
        |reach(id, seed, dist) AS (
        |  SELECT doc_id, doc_id, CAST(0 AS BIGINT) FROM documents WHERE doc_id < 5
        |  UNION
        |  SELECT e.dst, r.seed, r.dist + 1 FROM reach r JOIN e ON r.id = e.src
        |  WHERE r.dist < 16),
        |md AS (SELECT id, seed, min(dist) AS dist FROM reach GROUP BY id, seed),
        |h AS (SELECT id, CAST(count(*) AS BIGINT) AS n_reached,
        |  CAST(sum((2000000000 + dist) // (dist * 2)) AS BIGINT) AS harmonic_e9
        |  FROM md WHERE dist >= 1 GROUP BY id)
        |SELECT d.doc_id, CAST(COALESCE(h.n_reached, 0) AS BIGINT) AS n_reached,
        |  CAST(COALESCE(h.harmonic_e9, 0) AS BIGINT) AS harmonic_e9,
        |  COALESCE(CAST(h.harmonic_e9 AS DOUBLE) / 1e9, 0.0) AS harmonic
        |FROM documents d LEFT JOIN h ON d.doc_id = h.id
        |ORDER BY d.doc_id""".stripMargin,

    // Triage twin (m08): every verdict derived arithmetically from the
    // modality, corruption class, and synthesized length — the Spark
    // side must PARSE its way to the same answers.
    "m08_payload_triage" ->
      """WITH b AS (SELECT doc_id, octet_length(encode(text)) AS n,
        |  CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS modality
        |  FROM documents),
        |c AS (SELECT doc_id, modality,
        |  CASE modality WHEN 'image' THEN 33 + n WHEN 'audio' THEN 44 + n ELSE n END AS full_len
        |  FROM b),
        |v AS (SELECT doc_id, modality,
        |  CASE WHEN doc_id % 7 = 0 THEN least(full_len, 10) ELSE full_len END AS n_bytes,
        |  CASE
        |    WHEN modality = 'video' THEN 'no_container'
        |    WHEN doc_id % 7 = 0 THEN 'truncated'
        |    WHEN doc_id % 11 = 0 THEN 'no_container'
        |    WHEN modality = 'image' THEN 'ok_image'
        |    ELSE 'ok_audio' END AS verdict
        |  FROM c)
        |SELECT doc_id, modality, CAST(n_bytes AS BIGINT) AS n_bytes, verdict,
        |  verdict IN ('truncated', 'bad_magic', 'no_container') AND modality <> 'video' AS quarantine
        |FROM v ORDER BY doc_id""".stripMargin,

    // Mixed-container twin (m09): every decoded field computed
    // GIF twin (m13): every field computed arithmetically from doc_id —
    // the parser must LE-byte-walk its way to these exact values.
    "m13_gif_meta" ->
      """SELECT doc_id,
        |  CASE WHEN doc_id % 2 = 0 THEN '89a' ELSE '87a' END AS version,
        |  CAST(200 + (doc_id * 13) % 60000 AS BIGINT) AS width,
        |  CAST(200 + (doc_id * 7) % 60000 AS BIGINT) AS height,
        |  doc_id % 3 <> 0 AS has_gct,
        |  CAST(CASE WHEN doc_id % 3 <> 0 THEN doc_id % 8 ELSE 0 END AS BIGINT) AS gct_size_bits,
        |  CAST(CASE WHEN doc_id % 3 <> 0
        |    THEN 3 * (1 << CAST(doc_id % 8 + 1 AS INTEGER)) ELSE 0 END AS BIGINT) AS gct_bytes,
        |  CAST(14 + CASE WHEN doc_id % 3 <> 0
        |    THEN 3 * (1 << CAST(doc_id % 8 + 1 AS INTEGER)) ELSE 0 END AS BIGINT) AS n_bytes,
        |  TRUE AS trailer_ok
        |FROM documents ORDER BY doc_id""".stripMargin,

    // tar twin (m15): both entries' fields computed arithmetically from
    // (doc_id, octet_length(text)) — entry 1's header offset replays the
    // block walk, and the stored checksum is INDEPENDENTLY derived as
    // ord-folds over the known header strings (name + octal fields +
    // constant mode/uid/gid/magic + 8 spaces + typeflag), so the Spark
    // parser's bytes-side recomputation and this fields-side derivation
    // must meet exactly.
    "m15_tar_walk" -> {
      def ordSum(e: String) =
        s"list_reduce(list_prepend(0, list_transform(range(1, len($e) + 1), i -> ord($e[i]))), (a, b) -> a + b)"
      val constSum = s"${ordSum("'0000644'")} + 2 * ${ordSum("'0000000'")} + " +
        s"8 * 32 + ord('0') + ${ordSum("'ustar'")} + ${ordSum("'00'")}"
      def chk(nameExpr: String, sizeExpr: String) =
        s"CAST(${ordSum(nameExpr)} + ${ordSum(s"lpad(to_base($sizeExpr, 8), 11, '0')")} + " +
          s"${ordSum("lpad(to_base(1700000000 + doc_id, 8), 11, '0')")} + $constSum AS BIGINT)"
      s"""WITH b AS (SELECT doc_id, octet_length(encode(text)) AS n,
         |    'd' || doc_id || '.txt' AS nm0, 'm' || doc_id AS nm1 FROM documents),
         |e AS (
         |  SELECT doc_id, CAST(0 AS BIGINT) AS entry_idx, CAST(0 AS BIGINT) AS hdr_off,
         |    nm0 AS name, CAST(n AS BIGINT) AS size, ${chk("nm0", "n")} AS stored_chk
         |  FROM b
         |  UNION ALL
         |  SELECT doc_id, 1, CAST(512 + 512 * ((n + 511) // 512) AS BIGINT),
         |    nm1, 10, ${chk("nm1", "10")}
         |  FROM b)
         |SELECT doc_id, entry_idx, hdr_off, name, size,
         |  CAST(1700000000 + doc_id AS BIGINT) AS mtime, '0' AS typeflag,
         |  TRUE AS magic_ok, stored_chk, TRUE AS chksum_ok
         |FROM e ORDER BY doc_id, entry_idx""".stripMargin
    },

    // TIFF twin (m14): every field computed arithmetically from doc_id —
    // the parser must dispatch on the per-row byte-order marker and walk
    // the declared-order IFD to these exact values. 62 bytes = 8 header
    // + 2 count + 4×12 entries + 4 next-IFD pointer.
    "m14_tiff_meta" ->
      """SELECT doc_id,
        |  CASE WHEN doc_id % 2 = 0 THEN 'II' ELSE 'MM' END AS byte_order,
        |  TRUE AS magic_ok,
        |  CAST(8 AS BIGINT) AS ifd_off,
        |  CAST(4 AS BIGINT) AS n_entries,
        |  CAST(100 + (doc_id * 19) % 70000 AS BIGINT) AS width,
        |  CAST(100 + (doc_id * 23) % 70000 AS BIGINT) AS height,
        |  CAST([8,16,32][CAST(doc_id % 3 + 1 AS INT)] AS BIGINT) AS bits_per_sample,
        |  CAST(CASE WHEN doc_id % 4 = 0 THEN 5 ELSE 1 END AS BIGINT) AS compression,
        |  CAST(0 AS BIGINT) AS next_ifd,
        |  CAST(62 AS BIGINT) AS n_bytes
        |FROM documents ORDER BY doc_id""".stripMargin,

    // arithmetically from the fixture — container/length algebra, the
    // PNG/JPEG dimension formulas, WAV sample geometry, the MP3
    // bitrate/sample-rate tables and ISO frame-length formula — so all
    // four Spark parsers must byte-walk their way to these exact values.
    "m09_container_meta" ->
      """WITH b AS (SELECT doc_id, octet_length(encode(text)) AS n,
        |  CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS modality
        |  FROM documents),
        |c AS (SELECT doc_id, n, modality,
        |  CASE WHEN modality = 'image' AND doc_id % 6 = 0 THEN 'jpeg'
        |       WHEN modality = 'image' THEN 'png'
        |       WHEN modality = 'audio' AND doc_id % 6 = 1 THEN 'mp3'
        |       WHEN modality = 'audio' THEN 'wav'
        |       ELSE 'raw' END AS fmt,
        |  CASE WHEN modality = 'image' AND doc_id % 6 = 0 THEN 39 + n
        |       WHEN modality = 'image' THEN 33 + n
        |       WHEN modality = 'audio' AND doc_id % 6 = 1 THEN 4 + n
        |       WHEN modality = 'audio' THEN 44 + n
        |       ELSE n END AS full_len
        |  FROM b),
        |k AS (SELECT doc_id, n, modality, fmt, full_len,
        |  CASE WHEN doc_id % 7 = 0 THEN least(full_len, 10) ELSE full_len END AS n_bytes,
        |  CASE WHEN doc_id % 7 = 0 THEN 'trunc' WHEN doc_id % 11 = 0 THEN 'flip' ELSE 'ok' END AS corr
        |  FROM c),
        |m AS (SELECT *,
        |  CASE WHEN fmt = 'mp3' AND corr <> 'flip'
        |    THEN [32,40,48,56,64,80,96,112,128,160,192,224,256,320][CAST(1 + doc_id % 14 AS INT)] END AS br,
        |  CASE WHEN fmt = 'mp3' AND corr <> 'flip'
        |    THEN [44100,48000,32000][CAST((doc_id // 3) % 3 + 1 AS INT)] END AS sr,
        |  CASE WHEN fmt = 'mp3' AND corr <> 'flip' THEN doc_id % 2 END AS pad
        |  FROM k),
        |f AS (SELECT *, CASE WHEN br IS NOT NULL THEN (144000 * br) // sr + pad END AS fb FROM m),
        |v AS (SELECT *,
        |  CASE
        |    WHEN corr = 'flip' THEN 'no_container'
        |    WHEN fmt = 'raw' THEN 'no_container'
        |    WHEN fmt = 'mp3' THEN 'ok_audio'
        |    WHEN corr = 'trunc' THEN 'truncated'
        |    WHEN fmt IN ('png', 'jpeg') THEN 'ok_image'
        |    ELSE 'ok_audio' END AS verdict
        |  FROM f)
        |SELECT doc_id, modality,
        |  CASE WHEN corr = 'flip' THEN 'raw' ELSE fmt END AS container,
        |  CAST(n_bytes AS BIGINT) AS n_bytes,
        |  CAST(CASE WHEN fmt IN ('png', 'jpeg') AND corr = 'ok' THEN 16 + n % 64 END AS INT) AS width,
        |  CAST(CASE WHEN fmt IN ('png', 'jpeg') AND corr = 'ok' THEN 16 + (n * 7) % 64 END AS INT) AS height,
        |  CAST(CASE WHEN fmt IN ('png', 'jpeg') AND corr = 'ok' THEN 3 END AS INT) AS channels,
        |  CAST(CASE WHEN fmt = 'wav' AND corr = 'ok' THEN 16000
        |            WHEN fmt = 'mp3' AND corr <> 'flip' THEN sr END AS INT) AS sample_rate,
        |  CAST(CASE WHEN fmt = 'wav' AND corr = 'ok' THEN n * 100 END AS BIGINT) AS n_samples,
        |  CAST(CASE WHEN fmt = 'mp3' AND corr <> 'flip' THEN br END AS INT) AS bitrate_kbps,
        |  CAST(CASE WHEN fmt = 'mp3' AND corr <> 'flip' THEN n_bytes // fb END AS BIGINT) AS n_frames,
        |  verdict,
        |  verdict IN ('truncated', 'bad_magic', 'no_container') AND modality <> 'video' AS quarantine
        |FROM v ORDER BY doc_id""".stripMargin,

    // WARC twin (m10): every parsed field computed arithmetically from
    // the fixture — the HTTP block and extraction are RECONSTRUCTED (the
    // record is a deterministic string), never parsed, so Spark's header
    // walk is checked against an independent derivation.
    "m10_warc_extract" ->
      """WITH b AS (SELECT doc_id, text, lang, source,
        |    CASE WHEN doc_id % 7 = 3 THEN 404 ELSE 200 END AS st,
        |    'doc ' || doc_id || ' [' || lang || ']' AS title
        |  FROM documents),
        |h AS (SELECT *,
        |    '<html><head><title>' || title || '</title></head><body><p>' ||
        |      text || '</p></body></html>' AS html,
        |    title || ' ' || text AS extracted
        |  FROM b),
        |p AS (SELECT *,
        |    'HTTP/1.1 ' || (CASE WHEN st = 404 THEN '404 Not Found' ELSE '200 OK' END)
        |      || chr(13) || chr(10) || 'Content-Type: text/html; charset=utf-8'
        |      || chr(13) || chr(10) || chr(13) || chr(10) || html AS http
        |  FROM h)
        |SELECT doc_id,
        |  TRUE AS version_ok,
        |  'response' AS warc_type,
        |  lpad(lower(hex(doc_id)), 12, '0') AS record_id,
        |  source || '.example.com' AS host,
        |  lang AS lang_path,
        |  CAST(st AS INT) AS http_status,
        |  CAST(length(http) + CASE WHEN doc_id % 11 = 5 THEN 7 ELSE 0 END AS BIGINT) AS declared_len,
        |  CAST(length(http) AS BIGINT) AS actual_len,
        |  doc_id % 11 <> 5 AS length_ok,
        |  title,
        |  CAST(length(extracted) AS BIGINT) AS n_extract_chars,
        |  CAST(len(str_split(extracted, ' ')) AS BIGINT) AS n_extract_words,
        |  substring(sha256(extracted), 1, 16) AS extract_sha,
        |  st = 200 AND doc_id % 11 <> 5 AS keep
        |FROM p ORDER BY doc_id""".stripMargin,

    // Metadata-scrub twin (m12): every field arithmetic from the fixture
    // — chunk-layout lengths (33 sig+IHDR, 12/chunk overhead, 7 =
    // "Author\0"), the doc-derived value length 5 + (doc_id div 3 mod 3).
    "m12_meta_strip" ->
      """WITH b AS (SELECT doc_id, octet_length(encode(text)) AS n
        |  FROM documents WHERE doc_id % 3 = 0),
        |m AS (SELECT doc_id, n,
        |  CAST(5 + ((doc_id // 3) % 3) AS BIGINT) AS vlen FROM b)
        |SELECT doc_id,
        |  CAST(33 + 12 + 7 + vlen + 12 + n + 12 AS BIGINT) AS orig_len,
        |  CAST(33 + 12 + n + 12 AS BIGINT) AS stripped_len,
        |  'Author' AS meta_key,
        |  vlen AS meta_vlen,
        |  'IDAT' AS first_chunk_after,
        |  TRUE AS clean
        |FROM m ORDER BY doc_id""".stripMargin,

    // Shot-boundary twin (m11): the video payload body IS the text
    // bytes, so the twin replays the frame schedule, histogram classes,
    // and L1-delta cut test character for character on the text column —
    // any off-by-one in the Spark side's offset arithmetic, window
    // clipping, class regexes, or lag framing breaks the hash.
    "m11_shot_boundaries" ->
      """WITH v AS (SELECT doc_id, s, length(s) AS len FROM (
        |    SELECT doc_id, lower(text) AS s FROM documents WHERE doc_id % 3 = 2)),
        |fr AS (SELECT doc_id, CAST(i AS BIGINT) AS frame_idx,
        |    substr(s, CAST((i * len) // 8 + 1 AS BIGINT), 64) AS w
        |  FROM v CROSS JOIN range(8) r(i)),
        |h AS (SELECT doc_id, frame_idx,
        |  CAST(length(w) - length(regexp_replace(w, '[a-m]', '', 'g')) AS BIGINT) AS c_am,
        |  CAST(length(w) - length(regexp_replace(w, '[n-z]', '', 'g')) AS BIGINT) AS c_nz,
        |  CAST(length(w) - length(regexp_replace(w, '[0-9]', '', 'g')) AS BIGINT) AS c_dg,
        |  CAST(length(w) AS BIGINT) AS wl FROM fr),
        |h2 AS (SELECT doc_id, frame_idx, c_am, c_nz, c_dg,
        |  wl - c_am - c_nz - c_dg AS c_ot FROM h),
        |d AS (SELECT doc_id, frame_idx, c_am, c_nz, c_dg, c_ot,
        |  abs(c_am - lag(c_am) OVER fw) + abs(c_nz - lag(c_nz) OVER fw) +
        |  abs(c_dg - lag(c_dg) OVER fw) + abs(c_ot - lag(c_ot) OVER fw) AS delta
        |  FROM h2 WINDOW fw AS (PARTITION BY doc_id ORDER BY frame_idx))
        |SELECT doc_id, frame_idx, c_am, c_nz, c_dg, c_ot, delta,
        |  CASE WHEN delta IS NOT NULL THEN delta >= 14 END AS is_boundary
        |FROM d ORDER BY doc_id, frame_idx""".stripMargin,

    // kNN-graph twin (s13): s02's bucket chain at the 8×8 cluster
    // config, probes unrestricted, k=3.
    "s13_knn_graph" ->
      s"""WITH planes(tbl, pl, w) AS (VALUES ${lshPlanesValues(8, 8, 64, 42L)}),
         |v AS (SELECT vec_id, embedding::DOUBLE[] AS ev FROM embeddings),
         |bk AS (SELECT vec_id, tbl,
         |  SUM(CASE WHEN list_dot_product(ev, w) >= 0 THEN 1::BIGINT << pl ELSE 0 END)::BIGINT AS bucket
         |  FROM v CROSS JOIN planes GROUP BY vec_id, tbl),
         |cand AS (SELECT DISTINCT p.vec_id AS probe_id, c.vec_id AS neighbor_id
         |  FROM bk p JOIN bk c ON p.tbl = c.tbl AND p.bucket = c.bucket AND p.vec_id <> c.vec_id),
         |${annRankSql(3)}""".stripMargin,

    // Filtered-ANN twin (s12): s03's IVF chain with the corpus side
    // (and hence centroids, cells, candidates) pre-filtered to the
    // eligible label; probes stay unfiltered.
    "s12_filtered_ann" ->
      s"""WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS ev FROM embeddings),
         |vc AS (SELECT vec_id, embedding::DOUBLE[] AS ev FROM embeddings WHERE label = 3),
         |cents AS (SELECT vec_id AS cent_id, ev AS cv FROM vc ORDER BY vec_id LIMIT 16),
         |asgnc AS (SELECT vec_id, cent_id,
         |    round(list_cosine_similarity(ev, cv), 6) AS csim
         |  FROM vc CROSS JOIN cents),
         |ca AS (SELECT vec_id AS neighbor_id, cent_id FROM (
         |    SELECT vec_id, cent_id,
         |      row_number() OVER (PARTITION BY vec_id ORDER BY csim DESC NULLS LAST, cent_id) AS r
         |    FROM asgnc) WHERE r <= 1),
         |asgnp AS (SELECT vec_id, cent_id,
         |    round(list_cosine_similarity(ev, cv), 6) AS csim
         |  FROM v CROSS JOIN cents WHERE vec_id < 10),
         |pa AS (SELECT vec_id AS probe_id, cent_id FROM (
         |    SELECT vec_id, cent_id,
         |      row_number() OVER (PARTITION BY vec_id ORDER BY csim DESC NULLS LAST, cent_id) AS r
         |    FROM asgnp) WHERE r <= 8),
         |cand AS (SELECT DISTINCT probe_id, neighbor_id
         |  FROM pa JOIN ca USING (cent_id) WHERE probe_id <> neighbor_id),
         |${annRankSql(5)}""".stripMargin,

    "s09_mmr" -> mmrOracleSql(kCand = 10, kSelect = 3, lambda = 0.7),

    // k-center greedy twin (s23): the full 8-round farthest-point replay.
    "s23_kcenter" -> kCenterOracleSql(8),

    // IVF-sweep twin (s25): one shared scored table, per-level re-ranks.
    "s25_ivf_sweep" -> ivfSweepOracleSql(k = 5, nCells = 16,
      probes = Seq(1, 2, 4, 8, 16)),

    // Semantic-chunking twin (s24): same bagging, adjacent lag, round-6
    // cosine, threshold on the ROUNDED value, running break count.
    "s24_semantic_chunks" ->
      """WITH v AS (SELECT vec_id // 8 AS doc, vec_id % 8 AS pos,
        |    embedding::DOUBLE[] AS ev FROM embeddings),
        |a AS (SELECT doc, pos, ev, lag(ev) OVER pw AS pv FROM v
        |  WINDOW pw AS (PARTITION BY doc ORDER BY pos)),
        |c AS (SELECT doc, pos,
        |  CASE WHEN pv IS NOT NULL
        |    AND list_dot_product(pv, pv) > 0 AND list_dot_product(ev, ev) > 0
        |    THEN round(list_cosine_similarity(pv, ev), 6) END AS adj_cos
        |  FROM a),
        |b AS (SELECT doc, pos, adj_cos,
        |  CASE WHEN adj_cos IS NOT NULL THEN adj_cos < -0.1 END AS is_break FROM c)
        |SELECT doc, pos, adj_cos, is_break,
        |  CAST(sum(CASE WHEN is_break THEN 1 ELSE 0 END)
        |    OVER (PARTITION BY doc ORDER BY pos ROWS UNBOUNDED PRECEDING) AS BIGINT) AS chunk_idx
        |FROM b ORDER BY doc, pos""".stripMargin,

    // Beam-search twin (s21): s13's graph chain symmetrized (at k=8),
    // the walk unrolled round by round on round-6 ranks.
    "s21_beam_search" -> beamSearchOracleSql(k = 5, beamWidth = 16,
      rounds = 3, graphK = 8, nProbes = 10),

    // PQ m-sweep twin (s27): shared codebook vectors + shared round-6
    // exact baseline, the s07 chain per m level.
    "s27_pq_sweep" -> pqSweepOracleSql(mGrid = Seq(4, 8, 16), ks = 16,
      dim = 64, k = 5, nProbes = 10),

    // Hierarchical-beam twin (s26): the coarse stride sample, descent
    // rounds, entry set, then the SHARED s21 walk CTEs.
    "s26_hier_beam" -> hierarchicalBeamOracleSql(k = 5, beamWidth = 16,
      rounds = 3, graphK = 8, nProbes = 10, descentRounds = 4,
      coarseGraphK = 4, nStarts = 4),

    // MaxSim twin (s22): same doc bagging (vec_id // 8), round-6 cosine
    // before the max, DECIMAL(18,6) sum — the addition-order-free score
    // replays exactly.
    "s22_maxsim" ->
      """WITH toks AS (SELECT vec_id // 8 AS doc, vec_id AS tok,
        |    embedding::DOUBLE[] AS v FROM embeddings),
        |q AS (SELECT doc AS probe_doc, tok AS qtok, v AS qv
        |      FROM toks WHERE doc IN (0, 1)),
        |mx AS (SELECT probe_doc, qtok, c.doc AS cdoc,
        |    max(round(list_cosine_similarity(qv, c.v), 6)) AS m
        |  FROM q JOIN toks c ON probe_doc <> c.doc GROUP BY 1, 2, 3),
        |sc AS (SELECT probe_doc, cdoc,
        |    (sum(m::DECIMAL(18,6)))::DOUBLE AS score FROM mx GROUP BY 1, 2),
        |r AS (SELECT probe_doc, cdoc, score, row_number() OVER
        |    (PARTITION BY probe_doc ORDER BY score DESC, cdoc) AS rnk FROM sc)
        |SELECT probe_doc, rnk, cdoc AS neighbor_doc, score FROM r
        |WHERE rnk <= 5 ORDER BY probe_doc, rnk""".stripMargin,


    // Multi-probe twin (s11): same 4-table planes, candidates = exact
    // bucket hit OR Hamming-1 (xor a power of two), same re-rank.
    "s11_multiprobe_lsh" ->
      s"""WITH planes(tbl, pl, w) AS (VALUES ${lshPlanesValues(4, 4, 64, 42L)}),
         |v AS (SELECT vec_id, embedding::DOUBLE[] AS ev FROM embeddings),
         |bk AS (SELECT vec_id, tbl,
         |  SUM(CASE WHEN list_dot_product(ev, w) >= 0 THEN 1::BIGINT << pl ELSE 0 END)::BIGINT AS bucket
         |  FROM v CROSS JOIN planes GROUP BY vec_id, tbl),
         |cand AS (SELECT DISTINCT p.vec_id AS probe_id, c.vec_id AS neighbor_id
         |  FROM bk p JOIN bk c ON p.tbl = c.tbl AND p.vec_id <> c.vec_id
         |    AND (p.bucket = c.bucket OR xor(p.bucket, c.bucket) IN (1, 2, 4, 8))
         |  WHERE p.vec_id < 10),
         |${annRankSql(5)}""".stripMargin,


    // Degree-dist twin (g04): same canonical degrees, same degree-level
    // ln fold in degree order.
    "g04_degree_dist" ->
      """WITH docs AS (SELECT doc_id FROM documents),
        |nn AS (SELECT count(*) AS n FROM docs),
        |de AS (
        |  SELECT doc_id AS src, (doc_id * 7 + 13) % (SELECT n FROM nn) AS dst FROM docs
        |  UNION ALL
        |  SELECT doc_id, (doc_id * 31 + 7) % (SELECT n FROM nn) FROM docs),
        |ue AS (SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
        |  FROM de WHERE src <> dst),
        |deg AS (SELECT v, count(*) AS d FROM
        |  (SELECT a AS v FROM ue UNION ALL SELECT b FROM ue) GROUP BY v),
        |hist AS (SELECT d, CAST(count(*) AS BIGINT) AS n_vertices FROM deg GROUP BY d),
        |s AS (SELECT CAST(sum(n_vertices) AS BIGINT) AS nv, min(d) AS dmin,
        |    list(struct_pack(d := d, n_vertices := n_vertices) ORDER BY d) AS h
        |  FROM hist),
        |m AS (SELECT nv,
        |    list_reduce(list_prepend(0.0, list_transform(h, e ->
        |      CAST(e.n_vertices AS DOUBLE) * ln(CAST(e.d AS DOUBLE) / CAST(dmin AS DOUBLE)))),
        |      (acc, x) -> acc + x) AS slnd
        |  FROM s)
        |SELECT d AS degree, n_vertices, nv,
        |  CASE WHEN slnd > 0.0 THEN round(1.0 + CAST(nv AS DOUBLE) / slnd, 9) END AS alpha
        |FROM hist CROSS JOIN m ORDER BY degree""".stripMargin,


    // aHash twin (m06): body bytes via one hex pass (DuckDB lacks blob
    // substring — same bytes, the Spark side reads them from the payload
    // at the body offset), identical integer folds; the OR-join is the
    // same candidate set as the banded union at oracle scale.
    // Cross-modal twin (m07): the image body bytes ARE the text bytes,
    // so the twin embeds tokens(text) for images (what the operator's
    // byte-decode seam must reproduce — the hash-match IS the proof the
    // payload round-trip is lossless) and ws[1:16] for captions; same
    // md5 projection, integer folds, and (cos desc, id) top-1.
    "m07_crossmodal" -> (
      s"""WITH tok AS (SELECT doc_id, $tokensSqlExpr AS ws FROM documents
         |  WHERE doc_id % 3 = 0),
         |iv AS (SELECT doc_id AS image_id, list_transform(generate_series(0, 31),
         |    j -> list_reduce(list_prepend(CAST(0 AS BIGINT), list_transform(ws,
         |      t -> CAST(CAST(('0x' || substring(md5(CAST(j AS VARCHAR) || ':' || t), 1, 8)) AS UBIGINT) % 2001 AS BIGINT) - 1000)),
         |      (a, b) -> a + b)) AS iv
         |  FROM tok),
         |cv AS (SELECT doc_id AS caption_id, list_transform(generate_series(0, 31),
         |    j -> list_reduce(list_prepend(CAST(0 AS BIGINT), list_transform(ws[1:16],
         |      t -> CAST(CAST(('0x' || substring(md5(CAST(j AS VARCHAR) || ':' || t), 1, 8)) AS UBIGINT) % 2001 AS BIGINT) - 1000)),
         |      (a, b) -> a + b)) AS cv
         |  FROM tok WHERE doc_id < 30),
         |sc AS (SELECT caption_id, image_id,
         |    round(CAST(list_reduce(list_prepend(CAST(0 AS BIGINT),
         |        list_transform(generate_series(1, 32), i -> cv[i] * iv[i])),
         |        (a, b) -> a + b) AS DOUBLE)
         |      / sqrt(CAST(list_reduce(list_prepend(CAST(0 AS BIGINT),
         |          list_transform(generate_series(1, 32), i -> cv[i] * cv[i])),
         |          (a, b) -> a + b) AS DOUBLE)
         |        * CAST(list_reduce(list_prepend(CAST(0 AS BIGINT),
         |          list_transform(generate_series(1, 32), i -> iv[i] * iv[i])),
         |          (a, b) -> a + b) AS DOUBLE)), 6) AS cosine
         |  FROM cv CROSS JOIN iv),
         |rk AS (SELECT caption_id, image_id, cosine,
         |    row_number() OVER (PARTITION BY caption_id
         |      ORDER BY cosine DESC, image_id) AS rnk FROM sc)
         |SELECT caption_id, image_id, cosine,
         |  caption_id = image_id AS is_match
         |FROM rk WHERE rnk = 1 ORDER BY caption_id""".stripMargin),

    "m06_ahash_neardup" ->
      """WITH img AS (SELECT doc_id, hex(encode(text)) AS h
        |  FROM documents WHERE doc_id % 3 = 0),
        |bytes AS (SELECT doc_id, list_transform(range(1, 65),
        |    i -> CASE WHEN length(h) >= i * 2
        |      THEN CAST(('0x' || substring(h, CAST(i * 2 - 1 AS INTEGER), 2)) AS BIGINT)
        |      ELSE 0 END) AS bs
        |  FROM img),
        |sums AS (SELECT doc_id, bs, list_reduce(bs, (a, b) -> a + b) AS s FROM bytes),
        |bits AS (SELECT doc_id, list_transform(bs,
        |    b -> CASE WHEN b * 64 > s THEN 1 ELSE 0 END) AS bits FROM sums),
        |bands AS (SELECT doc_id,
        |    CAST(list_reduce(bits[1:16], (a, b) -> a * 2 + b) AS BIGINT) AS b0,
        |    CAST(list_reduce(bits[17:32], (a, b) -> a * 2 + b) AS BIGINT) AS b1,
        |    CAST(list_reduce(bits[33:48], (a, b) -> a * 2 + b) AS BIGINT) AS b2,
        |    CAST(list_reduce(bits[49:64], (a, b) -> a * 2 + b) AS BIGINT) AS b3
        |  FROM bits),
        |cands AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |    a.b0 AS a0, a.b1 AS a1, a.b2 AS a2, a.b3 AS a3,
        |    b.b0 AS c0, b.b1 AS c1, b.b2 AS c2, b.b3 AS c3
        |  FROM bands a JOIN bands b ON a.doc_id < b.doc_id AND
        |    (a.b0 = b.b0 OR a.b1 = b.b1 OR a.b2 = b.b2 OR a.b3 = b.b3))
        |SELECT id_a, id_b,
        |  CAST(bit_count(xor(a0, c0)) + bit_count(xor(a1, c1)) +
        |       bit_count(xor(a2, c2)) + bit_count(xor(a3, c3)) AS BIGINT) AS hamming
        |FROM cands
        |WHERE bit_count(xor(a0, c0)) + bit_count(xor(a1, c1)) +
        |      bit_count(xor(a2, c2)) + bit_count(xor(a3, c3)) <= 6
        |ORDER BY id_a, id_b""".stripMargin,


    // SQ twin (s10): per-dim min/width lists, the same floor-encode /
    // bin-center-dequantize, the same left fold (0+e1 exact, the s07
    // precedent).
    "s10_sq_topk" ->
      """WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS ev FROM embeddings),
        |mm AS (SELECT j, min(ev[j]) AS lo, max(ev[j]) - min(ev[j]) AS w
        |  FROM v CROSS JOIN range(1, 65) r(j) GROUP BY j),
        |mml AS (SELECT list(lo ORDER BY j) AS los, list(w ORDER BY j) AS ws FROM mm),
        |codes AS (SELECT vec_id AS neighbor_id,
        |    list_transform(range(1, 65), j -> CASE WHEN ws[j] = 0 THEN 0.0
        |      ELSE least(floor((ev[j] - los[j]) / ws[j] * 256), 255.0) END) AS cq
        |  FROM v CROSS JOIN mml),
        |p AS (SELECT vec_id AS probe_id, ev AS pev FROM v WHERE vec_id < 10),
        |scored AS (SELECT probe_id, neighbor_id,
        |    round(list_reduce(list_transform(range(1, 65),
        |      j -> (pev[j] - (los[j] + (cq[j] + 0.5) * ws[j] / 256.0))
        |         * (pev[j] - (los[j] + (cq[j] + 0.5) * ws[j] / 256.0))),
        |      (a, b) -> a + b), 6) AS adc_d2
        |  FROM codes CROSS JOIN p CROSS JOIN mml WHERE probe_id <> neighbor_id),
        |r AS (SELECT probe_id, neighbor_id, adc_d2,
        |    CAST(row_number() OVER (PARTITION BY probe_id
        |      ORDER BY adc_d2 ASC, neighbor_id ASC) AS BIGINT) AS rank
        |  FROM scored)
        |SELECT probe_id, rank, neighbor_id, adc_d2 FROM r WHERE rank <= 5
        |ORDER BY probe_id, rank""".stripMargin,


    // Triangle twin (g03): same canonical undirected edges, same
    // (degree, id) orientation, same wedge + closure joins.
    "g03_triangles" ->
      """WITH docs AS (SELECT doc_id FROM documents),
        |nn AS (SELECT count(*) AS n FROM docs),
        |de AS (
        |  SELECT doc_id AS src, (doc_id + 1) % (SELECT n FROM nn) AS dst FROM docs
        |  UNION ALL
        |  SELECT doc_id, (doc_id + 2) % (SELECT n FROM nn) FROM docs
        |  UNION ALL
        |  SELECT doc_id, (doc_id * 7 + 13) % (SELECT n FROM nn) FROM docs),
        |ue AS (SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
        |  FROM de WHERE src <> dst),
        |deg AS (SELECT v, count(*) AS d FROM
        |  (SELECT a AS v FROM ue UNION ALL SELECT b FROM ue) GROUP BY v),
        |oe AS (
        |  SELECT CASE WHEN (da.d, ue.a) < (db.d, ue.b) THEN ue.a ELSE ue.b END AS u,
        |         CASE WHEN (da.d, ue.a) < (db.d, ue.b) THEN ue.b ELSE ue.a END AS w
        |  FROM ue JOIN deg da ON da.v = ue.a JOIN deg db ON db.v = ue.b),
        |tri AS (
        |  SELECT e1.u AS x, e1.w AS y, e2.w AS z
        |  FROM oe e1 JOIN oe e2 ON e1.u = e2.u AND e1.w < e2.w
        |  JOIN ue e3 ON e3.a = least(e1.w, e2.w) AND e3.b = greatest(e1.w, e2.w))
        |SELECT v AS doc_id, count(*) AS n_triangles FROM
        |  (SELECT x AS v FROM tri UNION ALL SELECT y FROM tri UNION ALL SELECT z FROM tri)
        |GROUP BY v ORDER BY doc_id""".stripMargin,


    "s01_cosine_topk" ->
      """WITH p AS (SELECT vec_id AS probe_id, embedding::DOUBLE[] AS pv FROM embeddings WHERE vec_id < 10),
        |c AS (SELECT vec_id AS neighbor_id, embedding::DOUBLE[] AS cv FROM embeddings),
        |s AS (SELECT probe_id, neighbor_id, list_cosine_similarity(pv, cv) AS sim
        |      FROM p JOIN c ON probe_id <> neighbor_id),
        |r AS (SELECT probe_id, neighbor_id, sim,
        |      row_number() OVER (PARTITION BY probe_id ORDER BY sim DESC, neighbor_id) AS rnk FROM s)
        |SELECT probe_id, rnk, neighbor_id, round(sim, 6) AS sim FROM r
        |WHERE rnk <= 5 ORDER BY probe_id, rnk""".stripMargin,


    // ANN twin of s02: the operator's seeded hyperplanes embedded as
    // literal VALUES (lshPlanesValues — same Similarity.hyperplanes
    // doubles), sign-pattern bucket per (vector, table) as a bit-summed
    // aggregate, candidates = bucket hits in ANY table, then s01's exact
    // cosine re-rank. Sign decisions ride IEEE-double dots; both engines
    // see identical plane/vector doubles, so a flip would need a dot
    // within one accumulation-reorder ulp of 0 — vanishingly rare for
    // Gaussian planes, and caught by this oracle if it ever happens.
    "s02_lsh_topk" ->
      s"""WITH planes(tbl, pl, w) AS (VALUES ${lshPlanesValues(16, 4, 64, 42L)}),
         |v AS (SELECT vec_id, embedding::DOUBLE[] AS ev FROM embeddings),
         |bk AS (SELECT vec_id, tbl,
         |  SUM(CASE WHEN list_dot_product(ev, w) >= 0 THEN 1::BIGINT << pl ELSE 0 END)::BIGINT AS bucket
         |  FROM v CROSS JOIN planes GROUP BY vec_id, tbl),
         |cand AS (SELECT DISTINCT p.vec_id AS probe_id, c.vec_id AS neighbor_id
         |  FROM bk p JOIN bk c ON p.tbl = c.tbl AND p.bucket = c.bucket AND p.vec_id <> c.vec_id
         |  WHERE p.vec_id < 10),
         |${annRankSql(5)}""".stripMargin,


    // s28 is s02 through the persisted bucketBy index — same config,
    // same answer BY CONSTRUCTION, so the oracle is s02's verbatim: the
    // gate asserting two structurally different plans (inline probe vs
    // pruned index lookup) hash-match the same DuckDB replay.
    "s28_lsh_index_topk" ->
      s"""WITH planes(tbl, pl, w) AS (VALUES ${lshPlanesValues(16, 4, 64, 42L)}),
         |v AS (SELECT vec_id, embedding::DOUBLE[] AS ev FROM embeddings),
         |bk AS (SELECT vec_id, tbl,
         |  SUM(CASE WHEN list_dot_product(ev, w) >= 0 THEN 1::BIGINT << pl ELSE 0 END)::BIGINT AS bucket
         |  FROM v CROSS JOIN planes GROUP BY vec_id, tbl),
         |cand AS (SELECT DISTINCT p.vec_id AS probe_id, c.vec_id AS neighbor_id
         |  FROM bk p JOIN bk c ON p.tbl = c.tbl AND p.bucket = c.bucket AND p.vec_id <> c.vec_id
         |  WHERE p.vec_id < 10),
         |${annRankSql(5)}""".stripMargin,


    // Random-projection twin (s14): the operator's 32 seeded Gaussian
    // directions as literal VALUES (one lshPlanesValues "table"),
    // projected vector = list of plane dots in plane order, candidate
    // top-100 per probe by round(projected cosine, 6) with id tie-break
    // (the operator's declared contract), then s01's exact re-rank.
    "s14_rp_topk" ->
      s"""WITH planes(tbl, pl, w) AS (VALUES ${lshPlanesValues(1, 32, 64, 42L)}),
         |v AS (SELECT vec_id, embedding::DOUBLE[] AS ev FROM embeddings),
         |proj AS (SELECT vec_id, list(list_dot_product(ev, w) ORDER BY pl) AS pv
         |  FROM v CROSS JOIN planes GROUP BY vec_id),
         |ps AS (SELECT p.vec_id AS probe_id, c.vec_id AS neighbor_id,
         |    round(list_cosine_similarity(p.pv, c.pv), 6) AS psim
         |  FROM proj p JOIN proj c ON p.vec_id <> c.vec_id WHERE p.vec_id < 10),
         |cand AS (SELECT probe_id, neighbor_id FROM (
         |    SELECT probe_id, neighbor_id,
         |      row_number() OVER (PARTITION BY probe_id ORDER BY psim DESC NULLS LAST, neighbor_id) AS cr
         |    FROM ps) WHERE cr <= 100),
         |${annRankSql(5)}""".stripMargin,

    // Hard-negative twin (s15): s01's exact chain with the label
    // complement in the join predicate — the oracle never sees
    // same-label pairs either, so an under-filled probe would mismatch.
    "s15_hard_negatives" ->
      """WITH p AS (SELECT vec_id AS probe_id, label AS probe_label,
        |    embedding::DOUBLE[] AS pv FROM embeddings WHERE vec_id < 10),
        |c AS (SELECT vec_id AS neighbor_id, label AS neg_label,
        |    embedding::DOUBLE[] AS cv FROM embeddings),
        |s AS (SELECT probe_id, neighbor_id, neg_label,
        |    list_cosine_similarity(pv, cv) AS sim
        |  FROM p JOIN c ON probe_label <> neg_label),
        |r AS (SELECT probe_id, neighbor_id, neg_label, sim,
        |    row_number() OVER (PARTITION BY probe_id ORDER BY sim DESC, neighbor_id) AS rnk FROM s)
        |SELECT probe_id, rnk, neighbor_id, neg_label, round(sim, 6) AS sim
        |FROM r WHERE rnk <= 5 ORDER BY probe_id, rnk""".stripMargin,

    // SemDeDup twin (s16): s06's assignment CTEs (csim carried), the
    // keep-priority pair join ((csim, id) lexicographic on round-6
    // values), round-6 pairwise cosine against τ, NOT-EXISTS keep — the
    // drop rule replayed relation-for-relation.
    "s16_semdedup" ->
      """WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS ev FROM embeddings),
        |cents AS (SELECT vec_id AS cent_id, ev AS cv FROM v ORDER BY vec_id LIMIT 16),
        |asgn AS (SELECT vec_id, cent_id,
        |    round(list_cosine_similarity(ev, cv), 6) AS csim
        |  FROM v CROSS JOIN cents),
        |ca AS (SELECT vec_id, cent_id, csim FROM (
        |    SELECT vec_id, cent_id, csim,
        |      row_number() OVER (PARTITION BY vec_id ORDER BY csim DESC NULLS LAST, cent_id) AS r
        |    FROM asgn) WHERE r = 1),
        |drp AS (SELECT DISTINCT a.vec_id FROM ca a
        |  JOIN ca b ON a.cent_id = b.cent_id
        |    AND (b.csim < a.csim OR (b.csim = a.csim AND b.vec_id < a.vec_id))
        |  JOIN v av ON av.vec_id = a.vec_id
        |  JOIN v bv ON bv.vec_id = b.vec_id
        |  WHERE round(list_cosine_similarity(av.ev, bv.ev), 6) >= 0.3)
        |SELECT ca.vec_id, ca.cent_id, ca.csim,
        |  (drp.vec_id IS NULL) AS kept
        |FROM ca LEFT JOIN drp ON ca.vec_id = drp.vec_id
        |ORDER BY ca.vec_id""".stripMargin,

    // Prototype-pruning twin (s17): same assignment, per-cell hardness
    // rank (csim ASC NULLS LAST, id), count(*) cell size, the exact
    // integer keep gate rank·5 ≤ n·3.
    "s17_prototype_prune" ->
      """WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS ev FROM embeddings),
        |cents AS (SELECT vec_id AS cent_id, ev AS cv FROM v ORDER BY vec_id LIMIT 16),
        |asgn AS (SELECT vec_id, cent_id,
        |    round(list_cosine_similarity(ev, cv), 6) AS csim
        |  FROM v CROSS JOIN cents),
        |ca AS (SELECT vec_id, cent_id, csim FROM (
        |    SELECT vec_id, cent_id, csim,
        |      row_number() OVER (PARTITION BY vec_id ORDER BY csim DESC NULLS LAST, cent_id) AS r
        |    FROM asgn) WHERE r = 1),
        |rk AS (SELECT vec_id, cent_id, csim,
        |    count(*) OVER (PARTITION BY cent_id) AS cell_n,
        |    row_number() OVER (PARTITION BY cent_id ORDER BY csim ASC NULLS LAST, vec_id) AS cell_rank
        |  FROM ca)
        |SELECT vec_id, cent_id, csim, cell_n, cell_rank,
        |  (cell_rank * 5 <= cell_n * 3) AS kept
        |FROM rk ORDER BY vec_id""".stripMargin,

    // Binary-ANN twin (s20): the s02 sign-bit sum over ONE 63-plane
    // table (63 so `1 << pl` never touches the sign bit), xor +
    // bit_count Hamming, integer (hd, id) candidate rank, s01's exact
    // re-rank tail.
    "s20_binary_topk" ->
      s"""WITH planes(tbl, pl, w) AS (VALUES ${lshPlanesValues(1, 63, 64, 42L)}),
         |v AS (SELECT vec_id, embedding::DOUBLE[] AS ev FROM embeddings),
         |bits AS (SELECT vec_id,
         |    SUM(CASE WHEN list_dot_product(ev, w) >= 0
         |      THEN 1::BIGINT << pl ELSE 0::BIGINT END)::BIGINT AS b
         |  FROM v CROSS JOIN planes GROUP BY vec_id),
         |hd AS (SELECT p.vec_id AS probe_id, c.vec_id AS neighbor_id,
         |    bit_count(xor(p.b, c.b)) AS hd
         |  FROM bits p JOIN bits c ON p.vec_id <> c.vec_id
         |  WHERE p.vec_id < 10),
         |cand AS (SELECT probe_id, neighbor_id FROM (
         |    SELECT probe_id, neighbor_id,
         |      row_number() OVER (PARTITION BY probe_id ORDER BY hd, neighbor_id) AS cr
         |    FROM hd) WHERE cr <= 100),
         |${annRankSql(5)}""".stripMargin,

    // IVF-PQ twin (s19): s03's assignment CTEs (rank carried so rr=1 is
    // the corpus cell and rr≤4 the probe's visited cells), residuals as
    // per-element list subtraction, s07's codebook/encode/ADC machinery
    // run on residuals, the probe table keyed by (cent_id, j, code) so a
    // code only meets tables from its own cell's frame.
    "s19_ivfpq_topk" ->
      """WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS ev FROM embeddings),
        |cents AS (SELECT vec_id AS cent_id, ev AS cv FROM v ORDER BY vec_id LIMIT 16),
        |asgn AS (SELECT vec_id, cent_id,
        |    round(list_cosine_similarity(ev, cv), 6) AS csim
        |  FROM v CROSS JOIN cents),
        |car AS (SELECT vec_id, cent_id, row_number() OVER (PARTITION BY vec_id
        |    ORDER BY csim DESC NULLS LAST, cent_id) AS rr FROM asgn),
        |res AS (SELECT a.vec_id, a.cent_id,
        |    list_transform(range(1, 65), i -> vv.ev[i] - c.cv[i]) AS rv
        |  FROM car a JOIN v vv ON vv.vec_id = a.vec_id
        |  JOIN cents c ON c.cent_id = a.cent_id WHERE a.rr = 1),
        |cbv AS (SELECT row_number() OVER (ORDER BY vec_id) - 1 AS code, rv
        |  FROM (SELECT vec_id, rv FROM res ORDER BY vec_id LIMIT 16)),
        |cbe AS (SELECT j, code, rv[j*8+1:j*8+8] AS cw FROM cbv CROSS JOIN range(8) r(j)),
        |dist AS (SELECT res.vec_id, res.cent_id, c.j, c.code,
        |    round(list_reduce(list_transform(range(1, 9),
        |      i -> (rv[c.j*8+i] - cw[i]) * (rv[c.j*8+i] - cw[i])),
        |      (a, b) -> a + b), 6) AS d2
        |  FROM res CROSS JOIN cbe c),
        |enc AS (SELECT vec_id AS neighbor_id, cent_id, j, code FROM (
        |    SELECT vec_id, cent_id, j, code,
        |      row_number() OVER (PARTITION BY vec_id, j ORDER BY d2, code) AS r
        |    FROM dist) WHERE r = 1),
        |pres AS (SELECT a.vec_id AS probe_id, a.cent_id,
        |    list_transform(range(1, 65), i -> vv.ev[i] - c.cv[i]) AS prv
        |  FROM car a JOIN v vv ON vv.vec_id = a.vec_id
        |  JOIN cents c ON c.cent_id = a.cent_id
        |  WHERE a.rr <= 4 AND a.vec_id < 10),
        |pt AS (SELECT probe_id, cent_id, c.j, c.code,
        |    round(list_reduce(list_transform(range(1, 9),
        |      i -> (prv[c.j*8+i] - cw[i]) * (prv[c.j*8+i] - cw[i])),
        |      (a, b) -> a + b), 6) AS pd
        |  FROM pres CROSS JOIN cbe c),
        |adc AS (SELECT probe_id, neighbor_id,
        |    list_reduce(list(pd ORDER BY j), (a, b) -> a + b) AS adc
        |  FROM enc JOIN pt USING (cent_id, j, code)
        |  WHERE probe_id <> neighbor_id
        |  GROUP BY probe_id, neighbor_id)
        |SELECT probe_id, rank, neighbor_id, round(adc, 6) AS adc_dist FROM (
        |  SELECT probe_id, neighbor_id, adc,
        |    CAST(row_number() OVER (PARTITION BY probe_id
        |      ORDER BY adc, neighbor_id) AS BIGINT) AS rank
        |  FROM adc) WHERE rank <= 5
        |ORDER BY probe_id, rank""".stripMargin,

    // Matryoshka twin (s18): per-dim exact top-5 on ev[1:d] prefix
    // slices (s01's ranking contract at each dim), marker-joined to the
    // full-width top-5, integer hit counts, one rounded division.
    "s18_matryoshka" -> {
      val dims = Seq(8, 16, 32, 64)
      val perDim = dims.map { d =>
        s"""t$d AS (SELECT $d AS dim, probe_id, neighbor_id FROM (
           |    SELECT p.vec_id AS probe_id, c.vec_id AS neighbor_id,
           |      row_number() OVER (PARTITION BY p.vec_id
           |        ORDER BY list_cosine_similarity(p.ev[1:$d], c.ev[1:$d]) DESC, c.vec_id) AS rnk
           |    FROM p JOIN v c ON p.vec_id <> c.vec_id) WHERE rnk <= 5)""".stripMargin
      }.mkString(",\n")
      val unioned = dims.map(d => s"SELECT * FROM t$d").mkString(" UNION ALL ")
      s"""WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS ev FROM embeddings),
         |p AS (SELECT vec_id, ev FROM v WHERE vec_id < 10),
         |full5 AS (SELECT probe_id, neighbor_id, 1 AS infull FROM (
         |    SELECT p.vec_id AS probe_id, c.vec_id AS neighbor_id,
         |      row_number() OVER (PARTITION BY p.vec_id
         |        ORDER BY list_cosine_similarity(p.ev, c.ev) DESC, c.vec_id) AS rnk
         |    FROM p JOIN v c ON p.vec_id <> c.vec_id) WHERE rnk <= 5),
         |$perDim,
         |u AS ($unioned)
         |SELECT dim, CAST(count(*) AS BIGINT) AS n_slots,
         |  CAST(sum(COALESCE(infull, 0)) AS BIGINT) AS n_hits,
         |  round(CAST(sum(COALESCE(infull, 0)) AS DOUBLE) / count(*), 6) AS recall
         |FROM u LEFT JOIN full5 USING (probe_id, neighbor_id)
         |GROUP BY dim ORDER BY dim""".stripMargin
    },

    // ANN twin of s03: centroids = 16 lowest-id vectors, assignment ranks
    // round(cosine, 6) with cent_id tie-break (the operator's documented
    // deterministic contract), corpus to its 1 nearest cell, probes to 8,
    // candidates per shared cell, then s01's exact cosine re-rank.
    "s03_ivf_topk" ->
      s"""WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS ev FROM embeddings),
         |cents AS (SELECT vec_id AS cent_id, ev AS cv FROM v ORDER BY vec_id LIMIT 16),
         |asgn AS (SELECT vec_id, cent_id,
         |    round(list_cosine_similarity(ev, cv), 6) AS csim
         |  FROM v CROSS JOIN cents),
         |ca AS (SELECT vec_id AS neighbor_id, cent_id FROM (
         |    SELECT vec_id, cent_id,
         |      row_number() OVER (PARTITION BY vec_id ORDER BY csim DESC NULLS LAST, cent_id) AS r
         |    FROM asgn) WHERE r <= 1),
         |pa AS (SELECT vec_id AS probe_id, cent_id FROM (
         |    SELECT vec_id, cent_id,
         |      row_number() OVER (PARTITION BY vec_id ORDER BY csim DESC NULLS LAST, cent_id) AS r
         |    FROM asgn WHERE vec_id < 10) WHERE r <= 8),
         |cand AS (SELECT DISTINCT probe_id, neighbor_id
         |  FROM pa JOIN ca USING (cent_id) WHERE probe_id <> neighbor_id),
         |${annRankSql(5)}""".stripMargin,


    // s30 is the union corpus cut by the EVEN half's quantizer — s03's
    // chain with the centroid CTE restricted to even vec_ids; everything
    // downstream (assignment, probe cells, candidates, ranking) is the
    // s03/s29 recipe verbatim.
    "s30_ivf_index_delta" ->
      s"""WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS ev FROM embeddings),
         |cents AS (SELECT vec_id AS cent_id, ev AS cv FROM v
         |  WHERE vec_id % 2 = 0 ORDER BY vec_id LIMIT 16),
         |asgn AS (SELECT vec_id, cent_id,
         |    round(list_cosine_similarity(ev, cv), 6) AS csim
         |  FROM v CROSS JOIN cents),
         |ca AS (SELECT vec_id AS neighbor_id, cent_id FROM (
         |    SELECT vec_id, cent_id,
         |      row_number() OVER (PARTITION BY vec_id ORDER BY csim DESC NULLS LAST, cent_id) AS r
         |    FROM asgn) WHERE r <= 1),
         |pa AS (SELECT vec_id AS probe_id, cent_id FROM (
         |    SELECT vec_id, cent_id,
         |      row_number() OVER (PARTITION BY vec_id ORDER BY csim DESC NULLS LAST, cent_id) AS r
         |    FROM asgn WHERE vec_id < 10) WHERE r <= 8),
         |cand AS (SELECT DISTINCT probe_id, neighbor_id
         |  FROM pa JOIN ca USING (cent_id) WHERE probe_id <> neighbor_id),
         |${annRankSql(5)}""".stripMargin,


    // s31 is the full corpus minus the deleted ids, cut by the FULL
    // corpus's quantizer (delete never retrains): s03's chain with the
    // corpus-assignment CTE filtered to survivors. Probes keep querying
    // even when deleted (FAISS allows any query vector); deleted ids
    // just never appear as neighbors.
    "s31_ivf_index_delete" ->
      s"""WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS ev FROM embeddings),
         |cents AS (SELECT vec_id AS cent_id, ev AS cv FROM v ORDER BY vec_id LIMIT 16),
         |asgn AS (SELECT vec_id, cent_id,
         |    round(list_cosine_similarity(ev, cv), 6) AS csim
         |  FROM v CROSS JOIN cents),
         |ca AS (SELECT vec_id AS neighbor_id, cent_id FROM (
         |    SELECT vec_id, cent_id,
         |      row_number() OVER (PARTITION BY vec_id ORDER BY csim DESC NULLS LAST, cent_id) AS r
         |    FROM asgn WHERE vec_id % 5 <> 2) WHERE r <= 1),
         |pa AS (SELECT vec_id AS probe_id, cent_id FROM (
         |    SELECT vec_id, cent_id,
         |      row_number() OVER (PARTITION BY vec_id ORDER BY csim DESC NULLS LAST, cent_id) AS r
         |    FROM asgn WHERE vec_id < 10) WHERE r <= 8),
         |cand AS (SELECT DISTINCT probe_id, neighbor_id
         |  FROM pa JOIN ca USING (cent_id) WHERE probe_id <> neighbor_id),
         |${annRankSql(5)}""".stripMargin,


    // s29 is s03 through the persisted cell index — same config, same
    // answer by construction, so s03's oracle verbatim (the s28
    // discipline on the IVF family).
    "s29_ivf_index_topk" ->
      s"""WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS ev FROM embeddings),
         |cents AS (SELECT vec_id AS cent_id, ev AS cv FROM v ORDER BY vec_id LIMIT 16),
         |asgn AS (SELECT vec_id, cent_id,
         |    round(list_cosine_similarity(ev, cv), 6) AS csim
         |  FROM v CROSS JOIN cents),
         |ca AS (SELECT vec_id AS neighbor_id, cent_id FROM (
         |    SELECT vec_id, cent_id,
         |      row_number() OVER (PARTITION BY vec_id ORDER BY csim DESC NULLS LAST, cent_id) AS r
         |    FROM asgn) WHERE r <= 1),
         |pa AS (SELECT vec_id AS probe_id, cent_id FROM (
         |    SELECT vec_id, cent_id,
         |      row_number() OVER (PARTITION BY vec_id ORDER BY csim DESC NULLS LAST, cent_id) AS r
         |    FROM asgn WHERE vec_id < 10) WHERE r <= 8),
         |cand AS (SELECT DISTINCT probe_id, neighbor_id
         |  FROM pa JOIN ca USING (cent_id) WHERE probe_id <> neighbor_id),
         |${annRankSql(5)}""".stripMargin,


    // ANN recall twin (s04): s01's exact-topk chain and s03's IVF chain
    // composed in one WITH list (CTEs renamed apart), then per-probe
    // overlap — the oracle re-derives BOTH sides, so a drift in either
    // operator breaks the recall row for the probe it touched.
    "s04_recall" ->
      """WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS ev FROM embeddings),
        |ex AS (SELECT probe_id, neighbor_id FROM (
        |   SELECT p.vec_id AS probe_id, c.vec_id AS neighbor_id,
        |     row_number() OVER (PARTITION BY p.vec_id
        |       ORDER BY list_cosine_similarity(p.ev, c.ev) DESC, c.vec_id) AS rnk
        |   FROM v p JOIN v c ON p.vec_id <> c.vec_id WHERE p.vec_id < 10)
        | WHERE rnk <= 5),
        |cents AS (SELECT vec_id AS cent_id, ev AS cv FROM v ORDER BY vec_id LIMIT 16),
        |asgn AS (SELECT vec_id, cent_id,
        |    round(list_cosine_similarity(ev, cv), 6) AS csim
        |  FROM v CROSS JOIN cents),
        |ca AS (SELECT vec_id AS neighbor_id, cent_id FROM (
        |    SELECT vec_id, cent_id,
        |      row_number() OVER (PARTITION BY vec_id ORDER BY csim DESC NULLS LAST, cent_id) AS r
        |    FROM asgn) WHERE r <= 1),
        |pa AS (SELECT vec_id AS probe_id, cent_id FROM (
        |    SELECT vec_id, cent_id,
        |      row_number() OVER (PARTITION BY vec_id ORDER BY csim DESC NULLS LAST, cent_id) AS r
        |    FROM asgn WHERE vec_id < 10) WHERE r <= 8),
        |cand AS (SELECT DISTINCT probe_id, neighbor_id
        |  FROM pa JOIN ca USING (cent_id) WHERE probe_id <> neighbor_id),
        |iv AS (SELECT probe_id, neighbor_id FROM (
        |   SELECT cand.probe_id, cand.neighbor_id,
        |     row_number() OVER (PARTITION BY cand.probe_id
        |       ORDER BY list_cosine_similarity(pv.ev, nv.ev) DESC, cand.neighbor_id) AS rnk
        |   FROM cand JOIN v pv ON pv.vec_id = cand.probe_id
        |     JOIN v nv ON nv.vec_id = cand.neighbor_id)
        | WHERE rnk <= 5),
        |hit AS (SELECT probe_id, count(*) AS n_hit FROM ex JOIN iv USING (probe_id, neighbor_id) GROUP BY probe_id),
        |base AS (SELECT probe_id, count(*) AS n_exact FROM ex GROUP BY probe_id)
        |SELECT b.probe_id, CAST(b.n_exact AS BIGINT) AS n_exact,
        | CAST(COALESCE(h.n_hit, 0) AS BIGINT) AS n_hit,
        | round(CAST(COALESCE(h.n_hit, 0) AS DOUBLE) / b.n_exact, 6) AS recall
        |FROM base b LEFT JOIN hit h USING (probe_id) ORDER BY b.probe_id""".stripMargin,


    // Cluster-balanced sampling twin (s06): s03's assignment CTEs + the
    // q36 md5-permutation quota on the cell id.
    "s06_cluster_sample" ->
      """WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS ev FROM embeddings),
        |cents AS (SELECT vec_id AS cent_id, ev AS cv FROM v ORDER BY vec_id LIMIT 16),
        |asgn AS (SELECT vec_id, cent_id,
        |    round(list_cosine_similarity(ev, cv), 6) AS csim
        |  FROM v CROSS JOIN cents),
        |ca AS (SELECT vec_id, cent_id FROM (
        |    SELECT vec_id, cent_id,
        |      row_number() OVER (PARTITION BY vec_id ORDER BY csim DESC NULLS LAST, cent_id) AS r
        |    FROM asgn) WHERE r = 1),
        |rk AS (SELECT cent_id, vec_id,
        |  CAST(row_number() OVER (PARTITION BY cent_id
        |    ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) AS BIGINT) AS sample_rank
        |  FROM ca)
        |SELECT cent_id, sample_rank, vec_id FROM rk WHERE sample_rank <= 8
        |ORDER BY cent_id, sample_rank""".stripMargin,


    // PQ twin (s07): codebook = the 16 lowest-id vectors' 8-dim
    // subvectors; sub-distance = round-6 squared L2 via an ordered
    // fold (list_reduce left fold ≡ Spark's 0.0-seeded fold — 0+e1 is
    // exact); encode = first strict minimum per (vec, subspace); ADC =
    // the 8 rounded table entries added in subspace order.
    "s07_pq_topk" ->
      """WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS ev FROM embeddings),
        |cbv AS (SELECT row_number() OVER (ORDER BY vec_id) - 1 AS code, ev
        |  FROM (SELECT vec_id, ev FROM v ORDER BY vec_id LIMIT 16)),
        |cbe AS (SELECT j, code, ev[j*8+1:j*8+8] AS cw
        |  FROM cbv CROSS JOIN range(8) r(j)),
        |dist AS (SELECT v.vec_id, c.j, c.code,
        |    round(list_reduce(list_transform(range(1, 9),
        |      i -> (ev[c.j*8+i] - cw[i]) * (ev[c.j*8+i] - cw[i])),
        |      (a, b) -> a + b), 6) AS d2
        |  FROM v CROSS JOIN cbe c),
        |enc AS (SELECT vec_id AS neighbor_id, j, code FROM (
        |    SELECT vec_id, j, code,
        |      row_number() OVER (PARTITION BY vec_id, j ORDER BY d2, code) AS r
        |    FROM dist) WHERE r = 1),
        |pt AS (SELECT vec_id AS probe_id, j, code, d2 AS pd
        |  FROM dist WHERE vec_id < 10),
        |adc AS (SELECT probe_id, neighbor_id,
        |    list_reduce(list(pd ORDER BY j), (a, b) -> a + b) AS adc
        |  FROM enc JOIN pt USING (j, code) WHERE probe_id <> neighbor_id
        |  GROUP BY probe_id, neighbor_id)
        |SELECT probe_id, rank, neighbor_id, round(adc, 6) AS adc_dist FROM (
        |  SELECT probe_id, neighbor_id, adc,
        |    CAST(row_number() OVER (PARTITION BY probe_id
        |      ORDER BY adc, neighbor_id) AS BIGINT) AS rank
        |  FROM adc) WHERE rank <= 5
        |ORDER BY probe_id, rank""".stripMargin,


    // Trained-PQ recall twin (s08): see pqTrainedOracleSql.
    "s08_pq_trained" -> pqTrainedOracleSql(m = 8, ks = 16, sub = 8,
      iters = 2, k = 5, nProbes = 10),


    // Trained-quantizer recall twin (s05): see kmeansOracleSql.
    "s05_kmeans" -> kmeansOracleSql(nCells = 16, nProbe = 8, iters = 3,
      dim = 64, k = 5),


    // Synthesizes the same PNG signature+IHDR bytes Spark builds, then
    // PARSES width/height back out of the blob (hex-string offsets: DuckDB
    // 1.0 has no blob substring) — cross-engine proof the byte layout and
    // the parse both agree with the spec.
    "m02_multimodal_resize" ->
      """WITH b AS (SELECT doc_id, encode(text) AS body, octet_length(encode(text)) AS n
        | FROM documents WHERE doc_id % 3 = 0),
        |p AS (SELECT doc_id, unhex('89504E470D0A1A0A0000000D49484452'
        |  || lpad(hex(16 + n % 64), 8, '0') || lpad(hex(16 + (n * 7) % 64), 8, '0')
        |  || '080200000000000000') || body AS payload FROM b),
        |hx AS (SELECT doc_id, hex(payload) AS h FROM p),
        |m AS (SELECT doc_id,
        |  CAST(('0x' || substring(h, 33, 8)) AS INTEGER) AS w,
        |  CAST(('0x' || substring(h, 41, 8)) AS INTEGER) AS h2
        | FROM hx WHERE substring(h, 1, 16) = '89504E470D0A1A0A')
        |SELECT doc_id, w, h2 AS h,
        | CAST((CAST(w AS BIGINT) * 64) // greatest(w, h2) AS INTEGER) AS rw,
        | CAST((CAST(h2 AS BIGINT) * 64) // greatest(w, h2) AS INTEGER) AS rh
        |FROM m ORDER BY doc_id""".stripMargin,


    // Synthesizes the same 44-byte WAV RIFF header Spark builds (computed
    // little-endian chunkSize/dataSize), then PARSES sample_rate, channels,
    // bits and dataSize back out of the blob and recovers n_samples =
    // dataSize*8/(channels*bits) — the chunk plan runs on PARSED values.
    "m03_audio_chunks" ->
      """WITH b AS (SELECT doc_id, encode(text) AS body, octet_length(encode(text)) AS n
        | FROM documents WHERE doc_id % 3 = 1),
        |b2 AS (SELECT doc_id, body,
        |  lpad(hex(n * 200), 8, '0') AS dz, lpad(hex(n * 200 + 36), 8, '0') AS cz FROM b),
        |p AS (SELECT doc_id, unhex('52494646'
        |  || substring(cz,7,2) || substring(cz,5,2) || substring(cz,3,2) || substring(cz,1,2)
        |  || '57415645666D742010000000' || '0100' || '0100'
        |  || '803E0000' || '007D0000' || '0200' || '1000' || '64617461'
        |  || substring(dz,7,2) || substring(dz,5,2) || substring(dz,3,2) || substring(dz,1,2))
        |  || body AS payload FROM b2),
        |hx AS (SELECT doc_id, hex(payload) AS h FROM p),
        |m AS (SELECT doc_id,
        |  CAST(('0x' || substring(h,55,2) || substring(h,53,2) || substring(h,51,2) || substring(h,49,2)) AS BIGINT) AS sample_rate,
        |  CAST(('0x' || substring(h,47,2) || substring(h,45,2)) AS BIGINT) AS channels,
        |  CAST(('0x' || substring(h,71,2) || substring(h,69,2)) AS BIGINT) AS bits,
        |  CAST(('0x' || substring(h,87,2) || substring(h,85,2) || substring(h,83,2) || substring(h,81,2)) AS BIGINT) AS data_size
        | FROM hx WHERE substring(h,1,8) = '52494646' AND substring(h,17,16) = '57415645666D7420'),
        |s AS (SELECT doc_id, sample_rate, data_size * 8 // (channels * bits) AS n_samples FROM m)
        |SELECT doc_id, CAST(n_samples AS BIGINT) AS n_samples,
        | CAST((n_samples + sample_rate - 1) // sample_rate AS BIGINT) AS n_chunks,
        | CAST(CASE WHEN n_samples = 0 THEN 0
        |  ELSE n_samples - ((n_samples + sample_rate - 1) // sample_rate - 1) * sample_rate END AS BIGINT) AS last_chunk
        |FROM s ORDER BY doc_id""".stripMargin,


    // Frame-plan twin (m04): video payloads are header-less UTF-8 bodies,
    // so n_bytes = octet_length; offsets are the same integer division
    // i·n/4 (DuckDB // = Spark long division for non-negative operands).
    "m04_frames" ->
      """WITH v AS (SELECT doc_id, CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes
        | FROM documents WHERE doc_id % 3 = 2)
        |SELECT doc_id, n_bytes, CAST(i AS INTEGER) AS frame_idx,
        | CAST(i * n_bytes // 4 AS BIGINT) AS byte_off
        |FROM v, UNNEST(range(4)) AS u(i) ORDER BY doc_id, frame_idx""".stripMargin,


    // Patch-grid twin (m05): the same header-derived dims and the same
    // ceil-division grid, two lateral range unnests for the fan-out.
    "m05_patch_grid" ->
      """WITH b AS (SELECT doc_id, octet_length(encode(text)) AS n
        | FROM documents WHERE doc_id % 3 = 0),
        |d AS (SELECT doc_id, CAST(16 + n % 64 AS INTEGER) AS w,
        | CAST(16 + (n * 7) % 64 AS INTEGER) AS h FROM b)
        |SELECT doc_id, w, h, CAST(py AS BIGINT) AS py, CAST(px AS BIGINT) AS px,
        | CAST(px * 16 AS BIGINT) AS x0, CAST(py * 16 AS BIGINT) AS y0,
        | CAST(least(16, w - px * 16) AS BIGINT) AS pw,
        | CAST(least(16, h - py * 16) AS BIGINT) AS ph
        |FROM d,
        | UNNEST(range((CAST(h AS BIGINT) + 15) // 16)) AS uy(py),
        | UNNEST(range((CAST(w AS BIGINT) + 15) // 16)) AS ux(px)
        |ORDER BY doc_id, py, px""".stripMargin,


    // Full multimodal twin: per-modality payload synthesis (PNG header for
    // images, WAV header for audio, raw bytes for video), then every
    // metadata column is PARSED back from the payload bytes — img_w/img_h
    // big-endian from IHDR, channels via the PNG colorType mapping,
    // audio_samples from the little-endian RIFF dataSize/blockAlign.
    "m01_multimodal_meta" ->
      """WITH b AS (SELECT doc_id, encode(text) AS body, octet_length(encode(text)) AS n,
        | CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS modality
        |FROM documents),
        |p AS (SELECT doc_id, modality, CASE modality
        | WHEN 'image' THEN unhex('89504E470D0A1A0A0000000D49484452'
        |   || lpad(hex(16 + n % 64), 8, '0') || lpad(hex(16 + (n * 7) % 64), 8, '0')
        |   || '080200000000000000') || body
        | WHEN 'audio' THEN unhex('52494646'
        |   || substring(lpad(hex(n*200+36),8,'0'),7,2) || substring(lpad(hex(n*200+36),8,'0'),5,2)
        |   || substring(lpad(hex(n*200+36),8,'0'),3,2) || substring(lpad(hex(n*200+36),8,'0'),1,2)
        |   || '57415645666D742010000000' || '0100' || '0100'
        |   || '803E0000' || '007D0000' || '0200' || '1000' || '64617461'
        |   || substring(lpad(hex(n*200),8,'0'),7,2) || substring(lpad(hex(n*200),8,'0'),5,2)
        |   || substring(lpad(hex(n*200),8,'0'),3,2) || substring(lpad(hex(n*200),8,'0'),1,2))
        |   || body
        | ELSE body END AS payload FROM b),
        |hx AS (SELECT doc_id, modality, octet_length(payload) AS n_bytes, hex(payload) AS h FROM p)
        |SELECT doc_id, modality, CAST(n_bytes AS BIGINT) AS n_bytes,
        | CASE WHEN modality = 'image' AND substring(h,1,16) = '89504E470D0A1A0A'
        |  THEN CAST(('0x' || substring(h,33,8)) AS INTEGER) END AS img_w,
        | CASE WHEN modality = 'image' AND substring(h,1,16) = '89504E470D0A1A0A'
        |  THEN CAST(('0x' || substring(h,41,8)) AS INTEGER) END AS img_h,
        | CASE WHEN modality = 'image' AND substring(h,1,16) = '89504E470D0A1A0A'
        |  THEN CAST(CASE substring(h,51,2) WHEN '00' THEN 1 WHEN '02' THEN 3
        |            WHEN '04' THEN 2 WHEN '06' THEN 4 END AS INTEGER) END AS img_c,
        | CASE WHEN modality = 'audio' AND substring(h,1,8) = '52494646' AND substring(h,17,16) = '57415645666D7420'
        |  THEN CAST(('0x' || substring(h,87,2) || substring(h,85,2) || substring(h,83,2) || substring(h,81,2)) AS BIGINT) * 8
        |   // (CAST(('0x' || substring(h,47,2) || substring(h,45,2)) AS BIGINT)
        |      * CAST(('0x' || substring(h,71,2) || substring(h,69,2)) AS BIGINT)) END AS audio_samples,
        | CASE WHEN modality = 'video' THEN CAST((2 * n_bytes) // 4 AS BIGINT) END AS frame2_off
        |FROM hx ORDER BY doc_id""".stripMargin,
  )
}
