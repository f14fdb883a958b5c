package graft.queries

import org.apache.spark.sql.functions._
import graft.io.Tables
import graft.operators.Similarity
import graft.functions.SqlSurface
import graft.queries.Qutil.dround

/** Similarity search over the `embeddings` table (64-dim float vectors).
  * Brute-force cosine top-k is the oracle-checked baseline; hyperplane-LSH
  * is the scale path — ALSO oracle-checked, because the md5-derived planes
  * make bucketing deterministic and therefore replayable in SQL (q26, q105).
  */
object SimilarityQueries {

  private val Dims = 64
  private val TopK = 5
  private val NQueries = 8 // query set = vec_id < 8
  /** q231's committed tuning report (sf0.1 run, round 13): recall@TopK of
    * the q229 two-stage retrieval per coarse over-fetch depth. The
    * REPORT chooses q229's depth (Similarity.chooseRerankDepth) — the
    * tuning run is the control loop's measurement phase, its output the
    * persisted config artifact; re-run q231 and refresh this table to
    * re-tune. At the 0.45 recall target only depth 20 qualifies, so the
    * chosen depth equals the previous hand-typed constant and q229's
    * oracle hashes are unchanged. */
  private val TunedDepthReport = Seq(5 -> 0.25, 10 -> 0.30, 20 -> 0.475)
  private val RerankDepth = // q229 coarse over-fetch per query
    Similarity.chooseRerankDepth(TunedDepthReport, targetRecall = 0.45)
  private val NearDupTau = 0.35 // synthetic embeddings are near-orthogonal;
                                // 0.35 yields a few hundred pairs at sf0.01
  private val PcaIters = 4      // q182 power-iteration rounds (CTE-replayed)

  /** q221/q222 base/append split: the first 80% of ids are "yesterday's
    * index", the rest the appended shard. */
  private val AppendBaseWhere = "vec_id % 10 < 8"

  /** MEASURED contract bounds for the PlanSpec cartesian-gate allowlist:
    * each allowlisted ANN/eval query's unreduced join side is the bounded
    * QUERY SET, and that claim used to be prose a plan walk cannot check —
    * a fixture edit could silently unbound it. Each site now tags the
    * query-set frame with a `queryBound:<name>` row-count observation
    * ([[observedQueries]]) and the gate test RUNS the query and asserts
    * the observed count stays within this declared bound. q37 is absent
    * deliberately: its justification is "declared exact-quadratic oracle
    * baseline", not a bounded side. */
  private[graft] val queryBounds: Map[String, Long] = Map(
    "q25_ann_cosine" -> NQueries.toLong,
    "q62_quantized_topk" -> NQueries.toLong,
    "q70_hard_pairs" -> NQueries.toLong,
    "q119_ann_pq" -> NQueries.toLong,
    // leave-one-out eval: the whole (eval-set-sized) table is the query
    // batch; the contract bound is the broadcast-batch ceiling
    "q176_knn_accuracy" -> Similarity.maxQueryBatch.toLong,
    "q199_quantization_recall" -> NQueries.toLong,
    "q231_rerank_depth_recall" -> NQueries.toLong)

  private def observedQueries(df: org.apache.spark.sql.DataFrame,
                              qname: String): org.apache.spark.sql.DataFrame =
    df.observe(s"queryBound:$qname", count(lit(1)).as("n"))

  /** q41/q234 shared oracle: the full IVF search replay (Lloyd training,
    * probe argmax, exact cosine, top-k) — the Column path and the
    * `graft_ann_search()` TVF are held hash-for-hash to this one text
    * (the q221/q223 twin discipline). */
  private lazy val ivfSearchOracle: String = ivfSearchOracleExcluding(Nil)

  /** The q41 IVF-search oracle with an optional deleted-id exclusion —
    * training and assignment replay over the FULL corpus (the index was
    * built before the delete; dropping a row changes no other row's cell),
    * only the candidate set loses the deleted ids (q237). */
  private def ivfSearchOracleExcluding(exclude: Seq[Long]): String = {
    val nLists = 16; val iters = 3; val nProbe = 4; val q = 6
    val excl =
      if (exclude.isEmpty) ""
      else s"\n   AND a.vec_id NOT IN (${exclude.mkString(", ")})"
    s"""WITH ${lloydPrelude(nLists, iters, q)},
       |probes AS (
       |  SELECT vec_id AS qid, cell FROM (
       |    SELECT s.vec_id, c.cell,
       |           row_number() OVER (PARTITION BY s.vec_id
       |             ORDER BY ${foldDot("s.u", "c.cv")} DESC, c.cell ASC) AS rn
       |    FROM u s CROSS JOIN centlist$iters c
       |    WHERE s.vec_id < $NQueries)
       |  WHERE rn <= $nProbe),
       |cand AS (
       |  SELECT p.qid, a.vec_id AS nid FROM probes p
       |  JOIN asgf a ON a.cell = p.cell
       |  WHERE a.vec_id != p.qid$excl),
       |sc AS (
       |  SELECT cand.qid, cand.nid,
       |         ${foldDot("qe.v", "ne.v")} / (${normSql("qe.v")} * ${normSql("ne.v")}) AS cos
       |  FROM cand
       |  JOIN e qe ON qe.vec_id = cand.qid
       |  JOIN e ne ON ne.vec_id = cand.nid),
       |r AS (SELECT qid, nid, cos,
       |             row_number() OVER (PARTITION BY qid ORDER BY cos DESC, nid) AS rn
       |      FROM sc)
       |SELECT qid, nid, floor(cos * 1000000 + 0.5) / 1000000 AS cos
       |FROM r WHERE rn <= $TopK ORDER BY qid, nid""".stripMargin
  }

  // --- shared oracle SQL fragments (q41 IVF + q60 SemDeDup) ---
  // sequential ascending fold; DuckDB's seedless list_reduce starts at
  // the first element, which equals Scala's fold from 0.0 (0.0+x = x)
  private def foldDot(a: String, b: String): String =
    s"list_reduce(list_transform(generate_series(1, $Dims), i -> $a[i] * $b[i]), (x, y) -> x + y)"
  private def normSql(vec: String): String =
    s"sqrt(list_reduce(list_transform($vec, x -> x * x), (x, y) -> x + y))"
  private def assignCte(name: String, centlist: String, filter: String): String =
    s"""$name AS (
       |  SELECT vec_id, u, cell FROM (
       |    SELECT s.vec_id, s.u, c.cell,
       |           row_number() OVER (PARTITION BY s.vec_id
       |             ORDER BY ${foldDot("s.u", "c.cv")} DESC, c.cell ASC) AS rn
       |    FROM u s CROSS JOIN $centlist c$filter)
       |  WHERE rn = 1)""".stripMargin

  /** WITH-body prelude replaying `Similarity.trainCentroids` +
    * `nearestCentroid` bit-identically: embeddings → unit vectors → the
    * full deterministic Lloyd loop (`iters` rounds of argmax assignment,
    * exact decimal cell sums, sequential-fold normalization) → the final
    * per-vector cell assignment in `asgf` (and centroids in
    * `centlist<iters>`). Callers append their own CTEs after it. */
  private def lloydPrelude(nLists: Int, iters: Int, q: Int,
                           trainWhere: String = ""): String = {
    // trainWhere restricts TRAINING (init pick + the per-iteration
    // assignment/sums) to a subset — the q221/q222 incremental-maintenance
    // replay, where centroids are trained on the base corpus only. The
    // final `asgf` assignment always covers every vector.
    val trainW = if (trainWhere.isEmpty) "" else s" WHERE s.$trainWhere"
    val initW = if (trainWhere.isEmpty) "" else s"WHERE $trainWhere "
    val iterCtes = (1 to iters).map { k =>
      s"""centlist${k - 1} AS (
         |  SELECT cell, list(val ORDER BY pos) AS cv FROM cents${k - 1} GROUP BY cell),
         |${assignCte(s"asg$k", s"centlist${k - 1}", trainW)},
         |sums$k AS (
         |  SELECT cell, pos,
         |         CAST(sum(CAST(floor(x * 1000000 + 0.5) / 1000000 AS DECIMAL(38, ${q + 2}))) AS DOUBLE) AS sx
         |  FROM (SELECT cell, pos, u[pos] AS x
         |        FROM (SELECT cell, u, unnest(generate_series(1, $Dims)) AS pos FROM asg$k))
         |  GROUP BY cell, pos),
         |nrm$k AS (
         |  SELECT cell, sqrt(list_reduce(list_transform(list(sx ORDER BY pos), x -> x * x), (x, y) -> x + y)) AS nrm
         |  FROM sums$k GROUP BY cell),
         |cents$k AS (
         |  SELECT p.cell, p.pos,
         |         CASE WHEN s.sx IS NOT NULL AND n.nrm > 0 THEN s.sx / n.nrm
         |              ELSE p.val END AS val
         |  FROM cents${k - 1} p
         |  LEFT JOIN sums$k s ON s.cell = p.cell AND s.pos = p.pos
         |  LEFT JOIN nrm$k n ON n.cell = p.cell)""".stripMargin
    }.mkString(",\n")
    s"""e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
       |u AS (
       |  SELECT vec_id,
       |         CASE WHEN ${normSql("v")} > 0
       |              THEN list_transform(v, x -> x / ${normSql("v")})
       |              ELSE v END AS u
       |  FROM e),
       |init AS (
       |  SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cell, u
       |  FROM (SELECT vec_id, u FROM u ${initW}ORDER BY vec_id LIMIT $nLists)),
       |cents0 AS (
       |  SELECT cell, pos, u[pos] AS val
       |  FROM (SELECT cell, u, unnest(generate_series(1, $Dims)) AS pos FROM init)),
       |$iterCtes,
       |centlist$iters AS (
       |  SELECT cell, list(val ORDER BY pos) AS cv FROM cents$iters GROUP BY cell),
       |${assignCte("asgf", s"centlist$iters", "")}""".stripMargin
  }

  /** WITH-body prelude replaying `Similarity.trainPqCodebooks` + the final
    * per-(vector, subspace) code assignment in `pasgf` (codebooks in
    * `cbl<iters>`): unit vectors → per-subspace subranges → `iters` rounds
    * of fused-L2 argmin assignment (ties to the lowest code) and
    * decimal-exact 6dp-quantized MEAN updates — trainCentroids' determinism
    * rules minus the spherical normalization, which PQ does not use. */
  private def pqPrelude(nSub: Int, nCodes: Int, iters: Int, q: Int,
                        includeBase: Boolean = true): String = {
    val subDim = Dims / nSub
    def l2sq(x: String, c: String): String =
      s"list_reduce(list_transform(generate_series(1, $subDim), i -> ($x[i] - $c[i]) * ($x[i] - $c[i])), (a, b) -> a + b)"
    val iterCtes = (1 to iters).map { k =>
      s"""cbl${k - 1} AS (
         |  SELECT s, code, list(val ORDER BY pos) AS cv FROM cb${k - 1} GROUP BY s, code),
         |pasg$k AS (
         |  SELECT vec_id, s, x, code FROM (
         |    SELECT v.vec_id, v.s, v.x, c.code,
         |           row_number() OVER (PARTITION BY v.vec_id, v.s
         |             ORDER BY ${l2sq("v.x", "c.cv")} ASC, c.code ASC) AS rn
         |    FROM svo v JOIN cbl${k - 1} c ON c.s = v.s)
         |  WHERE rn = 1),
         |psums$k AS (
         |  SELECT s, code, pos,
         |         CAST(sum(CAST(floor(x[pos] * 1000000 + 0.5) / 1000000 AS DECIMAL(38, ${q + 2}))) AS DOUBLE) AS sx,
         |         count(*) AS n
         |  FROM (SELECT s, code, x, unnest(generate_series(1, $subDim)) AS pos FROM pasg$k)
         |  GROUP BY s, code, pos),
         |cb$k AS (
         |  SELECT p.s, p.code, p.pos,
         |         CASE WHEN t.sx IS NOT NULL AND t.n > 0 THEN t.sx / t.n ELSE p.val END AS val
         |  FROM cb${k - 1} p
         |  LEFT JOIN psums$k t ON t.s = p.s AND t.code = p.code AND t.pos = p.pos)""".stripMargin
    }.mkString(",\n")
    val base = if (includeBase)
      s"""e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
         |u AS (
         |  SELECT vec_id,
         |         CASE WHEN ${normSql("v")} > 0
         |              THEN list_transform(v, x -> x / ${normSql("v")})
         |              ELSE v END AS u
         |  FROM e),
         |""".stripMargin
    else "" // composition with lloydPrelude: e/u already defined, identically
    s"""${base}svo AS (
       |  SELECT vec_id, s, u[(s * $subDim + 1):(s * $subDim + $subDim)] AS x
       |  FROM (SELECT vec_id, u, unnest(generate_series(0, ${nSub - 1})) AS s FROM u)),
       |pinit AS (
       |  SELECT row_number() OVER (ORDER BY vec_id) - 1 AS code, u
       |  FROM (SELECT vec_id, u FROM u ORDER BY vec_id LIMIT $nCodes)),
       |cb0 AS (
       |  SELECT ss.s, pinit.code, pp.pos, u[ss.s * $subDim + pp.pos] AS val
       |  FROM pinit
       |  CROSS JOIN (SELECT unnest(generate_series(0, ${nSub - 1})) AS s) ss
       |  CROSS JOIN (SELECT unnest(generate_series(1, $subDim)) AS pos) pp),
       |$iterCtes,
       |cbl$iters AS (
       |  SELECT s, code, list(val ORDER BY pos) AS cv FROM cb$iters GROUP BY s, code),
       |pasgf AS (
       |  SELECT vec_id, s, code FROM (
       |    SELECT v.vec_id, v.s, c.code,
       |           row_number() OVER (PARTITION BY v.vec_id, v.s
       |             ORDER BY ${l2sq("v.x", "c.cv")} ASC, c.code ASC) AS rn
       |    FROM svo v JOIN cbl$iters c ON c.s = v.s)
       |  WHERE rn = 1)""".stripMargin
  }

  val all: Seq[Q] = Seq(

    // Brute-force exact cosine top-5 for 8 query vectors. The fold order of
    // the dot product matches DuckDB's list_reduce left fold, so cos values
    // are bit-identical and the top-k sets cannot diverge.
    Q.sql("q25_ann_cosine",
      s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
         |q AS (SELECT vec_id AS qid, v AS qv FROM e WHERE vec_id < $NQueries),
         |s AS (
         |  SELECT qid, e.vec_id AS nid,
         |         list_reduce(list_transform(generate_series(1, $Dims), i -> qv[i] * v[i]), (a, b) -> a + b)
         |         / (sqrt(list_reduce(list_transform(qv, x -> x * x), (a, b) -> a + b))
         |            * sqrt(list_reduce(list_transform(v, x -> x * x), (a, b) -> a + b))) AS cos
         |  FROM e, q WHERE e.vec_id != qid),
         |r AS (SELECT qid, nid, cos,
         |             row_number() OVER (PARTITION BY qid ORDER BY cos DESC, nid) AS rn
         |      FROM s)
         |SELECT qid, nid, floor(cos * 1000000 + 0.5) / 1000000 AS cos
         |FROM r WHERE rn <= $TopK ORDER BY qid, nid""".stripMargin) { (s, d) =>
      val emb = Tables.embeddings(s, d)
      val queries = observedQueries(emb.where(col("vec_id") < NQueries),
        "q25_ann_cosine")
      Similarity.bruteForceTopK(emb, queries, "vec_id", "embedding", TopK)
        .select(col("qid"), col("nid"), dround(col("cos"), 6).as("cos"))
        .orderBy("qid", "nid")
    },

    // Scale-path ANN: multi-table hyperplane LSH — equi-join on
    // (table, bucket) instead of a cross product. Fully oracle-checked:
    // the ±1 planes are deterministic md5-derived constants inlined into
    // the SQL from the same generator (Similarity.planeVec), dot products
    // replay as the identical left fold (the q25 construction), and the
    // sign tests compare identical doubles — so bucket assignments, the
    // candidate set, and the final top-k agree bit-for-bit. Recall
    // properties are additionally pinned in SimilaritySpec.
    Q.sql("q26_ann_lsh", {
      val nPlanes = 6; val nTables = 8
      def dotSql(vec: String, plane: Array[Double]): String = {
        val lits = plane.map(x => if (x > 0) "1.0" else "-1.0")
          .mkString("[", ",", "]")
        s"list_reduce(list_transform(generate_series(1, $Dims), i -> $vec[i] * ($lits)[i]), (a, b) -> a + b)"
      }
      val bandSelects = (0 until nTables).map { t =>
        val bucket = (0 until nPlanes).map { p =>
          val d = dotSql("v", Similarity.planeVec(t, p, Dims))
          s"(CASE WHEN $d > 0 THEN ${1L << p} ELSE 0 END)"
        }.mkString(" + ")
        s"SELECT vec_id, $t AS t, CAST($bucket AS BIGINT) AS bucket FROM e"
      }.mkString("\n  UNION ALL ")
      s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
         |b AS (
         |  $bandSelects),
         |cand AS (
         |  SELECT DISTINCT q.vec_id AS qid, c.vec_id AS nid
         |  FROM b c JOIN b q ON c.t = q.t AND c.bucket = q.bucket
         |  WHERE q.vec_id < $NQueries AND c.vec_id != q.vec_id),
         |s AS (
         |  SELECT cand.qid, cand.nid,
         |         list_reduce(list_transform(generate_series(1, $Dims), i -> qe.v[i] * ne.v[i]), (a, b) -> a + b)
         |         / (sqrt(list_reduce(list_transform(qe.v, x -> x * x), (a, b) -> a + b))
         |            * sqrt(list_reduce(list_transform(ne.v, x -> x * x), (a, b) -> a + b))) AS cos
         |  FROM cand
         |  JOIN e qe ON qe.vec_id = cand.qid
         |  JOIN e ne ON ne.vec_id = cand.nid),
         |r AS (SELECT qid, nid, cos,
         |             row_number() OVER (PARTITION BY qid ORDER BY cos DESC, nid) AS rn
         |      FROM s)
         |SELECT qid, nid, floor(cos * 1000000 + 0.5) / 1000000 AS cos
         |FROM r WHERE rn <= $TopK ORDER BY qid, nid""".stripMargin
    }) { (s, d) =>
      val emb = Tables.embeddings(s, d)
      val queries = emb.where(col("vec_id") < NQueries)
      Similarity.lshTopK(emb, queries, "vec_id", "embedding", Dims,
          nPlanes = 6, k = TopK, nTables = 8)
        .select(col("qid"), col("nid"), dround(col("cos"), 6).as("cos"))
        .orderBy("qid", "nid")
    },

    // IVF ANN: spherical-k-means coarse quantizer (deterministic init, no
    // RNG), corpus in Voronoi cells, queries probe nProbe nearest cells.
    // Fully oracle-checked: training is bit-reproducible (quantize+decimal
    // cell sums, sequential-fold norms), so the SQL replays the ENTIRE
    // Lloyd loop — init from the nLists lowest-id unit vectors, argmax
    // assignment with the same tie-break, exact decimal cell sums,
    // normalization — then the probe/candidate/score pipeline, all
    // bit-identically. Exact-within-probed-cells and planted-dup recall
    // are additionally pinned in SimilaritySpec.
    Q.sql("q41_ann_ivf", ivfSearchOracle) { (s, d) =>
      val emb = Tables.embeddings(s, d)
      val queries = emb.where(col("vec_id") < NQueries)
      val cents = Similarity.trainCentroids(emb, "vec_id", "embedding",
        nLists = 16, iters = 3)
      Similarity.ivfTopK(emb, queries, "vec_id", "embedding", cents,
          nProbe = 4, k = TopK)
        .select(col("qid"), col("nid"), dround(col("cos"), 6).as("cos"))
        .orderBy("qid", "nid")
    },

    // SemDeDup-style semantic dedup: deterministic k-means cells bound the
    // O(n²) pair space; within-cell cosine ≥ τ against a lower id drops
    // the doc. Oracle replays the whole pipeline — Lloyd loop (shared
    // prelude with q41), final assignment, within-cell pairs, greedy drop.
    Q.sql("q60_semantic_dedup", {
      val nLists = 16; val iters = 3; val q = 6; val tau = 0.30
      s"""WITH ${lloydPrelude(nLists, iters, q)},
         |pr AS (
         |  SELECT x.vec_id AS id_a, y.vec_id AS id_b,
         |         ${foldDot("xe.v", "ye.v")} / (${normSql("xe.v")} * ${normSql("ye.v")}) AS cos
         |  FROM asgf x
         |  JOIN asgf y ON x.cell = y.cell AND x.vec_id < y.vec_id
         |  JOIN e xe ON xe.vec_id = x.vec_id
         |  JOIN e ye ON ye.vec_id = y.vec_id),
         |dr AS (SELECT DISTINCT id_b FROM pr WHERE cos >= $tau)
         |SELECT a.vec_id, CAST(a.cell AS INT) AS cell
         |FROM asgf a
         |WHERE NOT EXISTS (SELECT 1 FROM dr d WHERE d.id_b = a.vec_id)
         |ORDER BY vec_id""".stripMargin
    }) { (s, d) =>
      val emb = Tables.embeddings(s, d)
      val cents = Similarity.trainCentroids(emb, "vec_id", "embedding",
        nLists = 16, iters = 3)
      graft.operators.Dedup.semanticDedup(emb, "vec_id", "embedding", cents, 0.30)
        .orderBy("vec_id")
    },

    // int8-quantized brute-force top-k: per-vector symmetric quantization
    // (scale = max|x|/127, round-half-up, clamp) then cosine over the
    // integer-valued vectors. Quantized dots/norms are exact integer sums
    // (≪ 2^53), so the oracle needs no decimal scaffolding — only the
    // final cosine ratio is rounded.
    Q.sql("q62_quantized_topk",
      s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
         |sc AS (SELECT vec_id, list_max(list_transform(v, x -> abs(x))) / 127.0 AS s FROM e),
         |qv AS (
         |  SELECT e.vec_id,
         |         CASE WHEN sc.s > 0
         |              THEN list_transform(e.v, x -> greatest(-127.0, least(127.0, floor(x / sc.s + 0.5))))
         |              ELSE list_transform(e.v, x -> 0.0) END AS q
         |  FROM e JOIN sc USING (vec_id)),
         |nz AS (SELECT vec_id, q FROM qv
         |       WHERE list_max(list_transform(q, x -> abs(x))) > 0),
         |s AS (
         |  SELECT a.vec_id AS qid, b.vec_id AS nid,
         |         ${foldDot("a.q", "b.q")}
         |         / (${normSql("a.q")} * ${normSql("b.q")}) AS qcos
         |  FROM nz a JOIN nz b ON b.vec_id != a.vec_id
         |  WHERE a.vec_id < $NQueries),
         |r AS (SELECT qid, nid, qcos,
         |             row_number() OVER (PARTITION BY qid ORDER BY qcos DESC, nid) AS rn
         |      FROM s)
         |SELECT qid, nid, floor(qcos * 1000000 + 0.5) / 1000000 AS qcos
         |FROM r WHERE rn <= $TopK ORDER BY qid, nid""".stripMargin) { (s, d) =>
      val emb = Tables.embeddings(s, d)
      val queries = observedQueries(emb.where(col("vec_id") < NQueries),
        "q62_quantized_topk")
      Similarity.quantizedTopK(emb, queries, "vec_id", "embedding", TopK)
        .select(col("qid"), col("nid"), dround(col("qcos"), 6).as("qcos"))
        .orderBy("qid", "nid")
    },

    // Embedding-cosine near-dup pairs (exact mode — the oracle baseline;
    // the LSH candidate mode of the same operator is pinned in DedupSpec
    // with planted duplicates, like q26's recall check).
    Q.sql("q37_embedding_neardup",
      s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
         |s AS (
         |  SELECT a.vec_id AS id_a, b.vec_id AS id_b,
         |         list_reduce(list_transform(generate_series(1, $Dims), i -> a.v[i] * b.v[i]), (x, y) -> x + y)
         |         / (sqrt(list_reduce(list_transform(a.v, x -> x * x), (x, y) -> x + y))
         |            * sqrt(list_reduce(list_transform(b.v, x -> x * x), (x, y) -> x + y))) AS cos
         |  FROM e a JOIN e b ON a.vec_id < b.vec_id)
         |SELECT id_a, id_b, floor(cos * 1000000 + 0.5) / 1000000 AS cos
         |FROM s WHERE cos >= $NearDupTau ORDER BY id_a, id_b""".stripMargin) { (s, d) =>
      graft.operators.Dedup.embeddingNearDups(
          Tables.embeddings(s, d), "vec_id", "embedding", NearDupTau)
        .select(col("id_a"), col("id_b"), dround(col("cos"), 6).as("cos"))
        .orderBy("id_a", "id_b")
    },

    // The SCALE PATH of the same operator: LSH candidate mode —
    // multi-table random-hyperplane bucketing, scoring only within-bucket
    // pairs. Fully oracle-checked the q26 way, even though RECALL is
    // probabilistic: the hash functions themselves are deterministic
    // (±1 planes are md5-derived literals from Similarity.planeVec, sign
    // tests compare identical left-fold doubles) and the hot-bucket cap
    // is a plain HAVING-count rule, so the oracle replays planes →
    // buckets → cap → candidate pairs → cosine filter bit-for-bit.
    // DedupSpec additionally pins LSH ⊆ exact with identical scores, and
    // q37 pins the exact baseline. Benched beside q37 it MEASURES the
    // two-tier contract: exact mode grows quadratically (67.9× at 10×
    // data, see SCALE.md), the bucketed mode is the one you run
    // corpus-wide.
    Q.sql("q105_embedding_neardup_lsh", {
      val nPlanes = 12; val nTables = 6; val cap = 256
      def dotSql(vec: String, plane: Array[Double]): String = {
        val lits = plane.map(x => if (x > 0) "1.0" else "-1.0")
          .mkString("[", ",", "]")
        s"list_reduce(list_transform(generate_series(1, $Dims), i -> $vec[i] * ($lits)[i]), (a, b) -> a + b)"
      }
      val bandSelects = (0 until nTables).map { t =>
        val bucket = (0 until nPlanes).map { p =>
          val d = dotSql("v", Similarity.planeVec(t, p, Dims))
          s"(CASE WHEN $d > 0 THEN ${1L << p} ELSE 0 END)"
        }.mkString(" + ")
        s"SELECT vec_id, $t AS t, CAST($bucket AS BIGINT) AS bucket FROM e"
      }.mkString("\n  UNION ALL ")
      s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
         |b AS (
         |  $bandSelects),
         |ok AS (
         |  SELECT t, bucket FROM b GROUP BY t, bucket HAVING count(*) <= $cap),
         |c AS (
         |  SELECT b.vec_id, b.t, b.bucket FROM b
         |  JOIN ok ON ok.t = b.t AND ok.bucket = b.bucket),
         |cand AS (
         |  SELECT DISTINCT x.vec_id AS id_a, y.vec_id AS id_b
         |  FROM c x JOIN c y ON x.t = y.t AND x.bucket = y.bucket
         |                   AND x.vec_id < y.vec_id),
         |s AS (
         |  SELECT cand.id_a, cand.id_b,
         |         list_reduce(list_transform(generate_series(1, $Dims), i -> ae.v[i] * be.v[i]), (a, b) -> a + b)
         |         / (sqrt(list_reduce(list_transform(ae.v, x -> x * x), (a, b) -> a + b))
         |            * sqrt(list_reduce(list_transform(be.v, x -> x * x), (a, b) -> a + b))) AS cos
         |  FROM cand
         |  JOIN e ae ON ae.vec_id = cand.id_a
         |  JOIN e be ON be.vec_id = cand.id_b)
         |SELECT id_a, id_b, floor(cos * 1000000 + 0.5) / 1000000 AS cos
         |FROM s WHERE cos >= $NearDupTau ORDER BY id_a, id_b""".stripMargin
    }) { (s, d) =>
      graft.operators.Dedup.embeddingNearDups(
          Tables.embeddings(s, d), "vec_id", "embedding", NearDupTau,
          lsh = Some((Dims, 12, 6)), maxBucketSize = Some(256))
        .select(col("id_a"), col("id_b"), dround(col("cos"), 6).as("cos"))
        .orderBy("id_a", "id_b")
    },

    // The COMPRESSED-STORAGE tier: product-quantization ANN with ADC
    // scoring (Similarity.pqTopK). Corpus vectors are stored as 8 code
    // ids (8 bytes vs 256/512 for the floats); each query precomputes a
    // (subspace × code) table of 6dp-rounded partial dots and scoring is
    // 8 lookups + a fixed-order fold. Training (decimal-exact means,
    // lowest-id init), assignment (fused-L2 argmin, code-id ties), and
    // the s-ascending ADC fold are all bit-deterministic, so the oracle
    // replays codebooks → codes → tables → top-k exactly. SimilaritySpec
    // pins recall against the q25 exact baseline on planted duplicates.
    Q.sql("q119_ann_pq", {
      val nSub = 8; val nCodes = 16; val iters = 2; val subDim = Dims / nSub
      def foldDotSub(a: String, b: String): String =
        s"list_reduce(list_transform(generate_series(1, $subDim), i -> $a[i] * $b[i]), (a, b) -> a + b)"
      s"""WITH ${pqPrelude(nSub, nCodes, iters, 6)},
         |qs AS (
         |  SELECT vec_id AS qid, s,
         |         u[(s * $subDim + 1):(s * $subDim + $subDim)] AS qx
         |  FROM (SELECT vec_id, u, unnest(generate_series(0, ${nSub - 1})) AS s
         |        FROM u WHERE vec_id < $NQueries)),
         |dt AS (
         |  SELECT qid, qs.s, c.code,
         |         floor(${foldDotSub("qx", "c.cv")} * 1000000 + 0.5) / 1000000 AS contrib
         |  FROM qs JOIN cbl$iters c ON c.s = qs.s),
         |contribs AS (
         |  SELECT d.qid, a.vec_id AS nid, d.s, d.contrib
         |  FROM pasgf a JOIN dt d ON d.s = a.s AND d.code = a.code
         |  WHERE a.vec_id != d.qid),
         |sc AS (
         |  SELECT qid, nid,
         |         list_reduce(list(contrib ORDER BY s), (a, b) -> a + b) AS adc
         |  FROM contribs GROUP BY qid, nid),
         |r AS (SELECT qid, nid, adc,
         |             row_number() OVER (PARTITION BY qid ORDER BY adc DESC, nid) AS rn
         |      FROM sc)
         |SELECT qid, nid, adc FROM r WHERE rn <= $TopK ORDER BY qid, nid""".stripMargin
    }) { (s, d) =>
      val emb = Tables.embeddings(s, d)
      val queries = observedQueries(emb.where(col("vec_id") < NQueries),
        "q119_ann_pq")
      Similarity.pqTopK(emb, queries, "vec_id", "embedding", Dims,
          nSub = 8, nCodes = 16, iters = 2, k = TopK)
        .orderBy("qid", "nid")
    },

    // IVF + PQ composed (Similarity.ivfPqTopK — FAISS IVFPQ's shape):
    // the coarse quantizer routes search to nProbe cells AND the stored
    // representation is nSub code bytes, so search touches ~nProbe/nLists
    // of the corpus and reads only codes. The oracle chains BOTH training
    // replays (q41's Lloyd prelude + q119's PQ prelude, shared unit-vector
    // base) and the composed probe→ADC search — the two recall dials
    // verified independently and together, hash-exact.
    Q.sql("q140_ann_ivfpq", {
      val nLists = 16; val ivfIters = 3; val nProbe = 4
      val nSub = 8; val nCodes = 16; val pqIters = 2; val subDim = Dims / nSub
      def foldDotSub(a: String, b: String): String =
        s"list_reduce(list_transform(generate_series(1, $subDim), i -> $a[i] * $b[i]), (a, b) -> a + b)"
      s"""WITH ${lloydPrelude(nLists, ivfIters, 6)},
         |${pqPrelude(nSub, nCodes, pqIters, 6, includeBase = false)},
         |probes AS (
         |  SELECT vec_id AS qid, cell FROM (
         |    SELECT s.vec_id, c.cell,
         |           row_number() OVER (PARTITION BY s.vec_id
         |             ORDER BY ${foldDot("s.u", "c.cv")} DESC, c.cell ASC) AS rn
         |    FROM u s CROSS JOIN centlist$ivfIters c
         |    WHERE s.vec_id < $NQueries)
         |  WHERE rn <= $nProbe),
         |qs AS (
         |  SELECT vec_id AS qid, s,
         |         u[(s * $subDim + 1):(s * $subDim + $subDim)] AS qx
         |  FROM (SELECT vec_id, u, unnest(generate_series(0, ${nSub - 1})) AS s
         |        FROM u WHERE vec_id < $NQueries)),
         |dt AS (
         |  SELECT qid, qs.s, c.code,
         |         floor(${foldDotSub("qx", "c.cv")} * 1000000 + 0.5) / 1000000 AS contrib
         |  FROM qs JOIN cbl$pqIters c ON c.s = qs.s),
         |contribs AS (
         |  SELECT d.qid, pa.vec_id AS nid, d.s, d.contrib
         |  FROM pasgf pa
         |  JOIN dt d ON d.s = pa.s AND d.code = pa.code
         |  JOIN asgf a ON a.vec_id = pa.vec_id
         |  JOIN probes p ON p.qid = d.qid AND p.cell = a.cell
         |  WHERE pa.vec_id != d.qid),
         |sc AS (
         |  SELECT qid, nid,
         |         list_reduce(list(contrib ORDER BY s), (a, b) -> a + b) AS adc
         |  FROM contribs GROUP BY qid, nid),
         |r AS (SELECT qid, nid, adc,
         |             row_number() OVER (PARTITION BY qid ORDER BY adc DESC, nid) AS rn
         |      FROM sc)
         |SELECT qid, nid, adc FROM r WHERE rn <= $TopK ORDER BY qid, nid""".stripMargin
    }) { (s, d) =>
      val emb = Tables.embeddings(s, d)
      val queries = emb.where(col("vec_id") < NQueries)
      val cents = Similarity.trainCentroids(emb, "vec_id", "embedding",
        nLists = 16, iters = 3)
      Similarity.ivfPqTopK(emb, queries, "vec_id", "embedding", cents,
          nProbe = 4, dims = Dims, nSub = 8, nCodes = 16, iters = 2, k = TopK)
        .orderBy("qid", "nid")
    },

    // TWO-STAGE retrieval (Similarity.ivfPqTopK → Similarity.rerankExact):
    // the production shape — the compressed IVF+PQ index over-fetches
    // RerankDepth candidates per query (cheap ADC scoring over code
    // bytes), then ONLY those candidates are re-scored with the exact
    // cosine over the full float vectors and the true top-k kept. The
    // rerank repairs quantization-induced rank inversions without
    // touching the rest of the corpus: candidates travel id-only, the
    // corpus vectors arrive by one equi-join, the query vectors by
    // broadcast. The oracle chains q140's full double-training replay
    // with the rerank's exact-cosine window — both stages hash-exact.
    Q.sql("q229_ivfpq_rerank", {
      val nLists = 16; val ivfIters = 3; val nProbe = 4
      val nSub = 8; val nCodes = 16; val pqIters = 2; val subDim = Dims / nSub
      def foldDotSub(a: String, b: String): String =
        s"list_reduce(list_transform(generate_series(1, $subDim), i -> $a[i] * $b[i]), (a, b) -> a + b)"
      s"""WITH ${lloydPrelude(nLists, ivfIters, 6)},
         |${pqPrelude(nSub, nCodes, pqIters, 6, includeBase = false)},
         |probes AS (
         |  SELECT vec_id AS qid, cell FROM (
         |    SELECT s.vec_id, c.cell,
         |           row_number() OVER (PARTITION BY s.vec_id
         |             ORDER BY ${foldDot("s.u", "c.cv")} DESC, c.cell ASC) AS rn
         |    FROM u s CROSS JOIN centlist$ivfIters c
         |    WHERE s.vec_id < $NQueries)
         |  WHERE rn <= $nProbe),
         |qs AS (
         |  SELECT vec_id AS qid, s,
         |         u[(s * $subDim + 1):(s * $subDim + $subDim)] AS qx
         |  FROM (SELECT vec_id, u, unnest(generate_series(0, ${nSub - 1})) AS s
         |        FROM u WHERE vec_id < $NQueries)),
         |dt AS (
         |  SELECT qid, qs.s, c.code,
         |         floor(${foldDotSub("qx", "c.cv")} * 1000000 + 0.5) / 1000000 AS contrib
         |  FROM qs JOIN cbl$pqIters c ON c.s = qs.s),
         |contribs AS (
         |  SELECT d.qid, pa.vec_id AS nid, d.s, d.contrib
         |  FROM pasgf pa
         |  JOIN dt d ON d.s = pa.s AND d.code = pa.code
         |  JOIN asgf a ON a.vec_id = pa.vec_id
         |  JOIN probes p ON p.qid = d.qid AND p.cell = a.cell
         |  WHERE pa.vec_id != d.qid),
         |sc AS (
         |  SELECT qid, nid,
         |         list_reduce(list(contrib ORDER BY s), (a, b) -> a + b) AS adc
         |  FROM contribs GROUP BY qid, nid),
         |r AS (SELECT qid, nid, adc,
         |             row_number() OVER (PARTITION BY qid ORDER BY adc DESC, nid) AS rn
         |      FROM sc),
         |cand AS (SELECT qid, nid FROM r WHERE rn <= $RerankDepth),
         |ex AS (
         |  SELECT cd.qid, cd.nid,
         |         ${foldDot("qe.v", "ne.v")}
         |         / (${normSql("qe.v")} * ${normSql("ne.v")}) AS cos
         |  FROM cand cd
         |  JOIN e qe ON qe.vec_id = cd.qid
         |  JOIN e ne ON ne.vec_id = cd.nid),
         |rr AS (SELECT qid, nid, cos,
         |              row_number() OVER (PARTITION BY qid
         |                                 ORDER BY cos DESC, nid) AS rn
         |       FROM ex)
         |SELECT qid, nid, floor(cos * 1000000 + 0.5) / 1000000 AS cos
         |FROM rr WHERE rn <= $TopK ORDER BY qid, nid""".stripMargin
    }) { (s, d) =>
      val emb = Tables.embeddings(s, d)
      val queries = emb.where(col("vec_id") < NQueries)
      val cents = Similarity.trainCentroids(emb, "vec_id", "embedding",
        nLists = 16, iters = 3)
      val coarse = Similarity.ivfPqTopK(emb, queries, "vec_id", "embedding",
        cents, nProbe = 4, dims = Dims, nSub = 8, nCodes = 16, iters = 2,
        k = RerankDepth)
      Similarity.rerankExact(coarse, emb, queries, "vec_id", "embedding",
          TopK)
        .select(col("qid"), col("nid"), dround(col("cos"), 6).as("cos"))
        .orderBy("qid", "nid")
    },

    // Rerank-depth TUNING report: recall@TopK of the q229 two-stage
    // retrieval as a function of the coarse over-fetch depth — the
    // production dial ("how many ADC candidates must the compressed
    // index surface before exact rerank recovers the true top-k?").
    // Because the rerank is exact, two-stage recall at depth d equals
    // the fraction of brute-force truth pairs whose ADC rank is ≤ d, so
    // one ranked coarse run + one truth join answers every depth at once
    // (map-only depth explode — no inequality join). The oracle replays
    // the q140 training/ADC chain, the q25-form exact truth, and the
    // depth histogram. Brute truth is the declared query-bounded
    // baseline (queryBounds + the PlanSpec allowlist, like q199).
    Q.sql("q231_rerank_depth_recall", {
      val nLists = 16; val ivfIters = 3; val nProbe = 4
      val nSub = 8; val nCodes = 16; val pqIters = 2; val subDim = Dims / nSub
      val maxDepth = 20
      def foldDotSub(a: String, b: String): String =
        s"list_reduce(list_transform(generate_series(1, $subDim), i -> $a[i] * $b[i]), (a, b) -> a + b)"
      s"""WITH ${lloydPrelude(nLists, ivfIters, 6)},
         |${pqPrelude(nSub, nCodes, pqIters, 6, includeBase = false)},
         |probes AS (
         |  SELECT vec_id AS qid, cell FROM (
         |    SELECT s.vec_id, c.cell,
         |           row_number() OVER (PARTITION BY s.vec_id
         |             ORDER BY ${foldDot("s.u", "c.cv")} DESC, c.cell ASC) AS rn
         |    FROM u s CROSS JOIN centlist$ivfIters c
         |    WHERE s.vec_id < $NQueries)
         |  WHERE rn <= $nProbe),
         |qs AS (
         |  SELECT vec_id AS qid, s,
         |         u[(s * $subDim + 1):(s * $subDim + $subDim)] AS qx
         |  FROM (SELECT vec_id, u, unnest(generate_series(0, ${nSub - 1})) AS s
         |        FROM u WHERE vec_id < $NQueries)),
         |dt AS (
         |  SELECT qid, qs.s, c.code,
         |         floor(${foldDotSub("qx", "c.cv")} * 1000000 + 0.5) / 1000000 AS contrib
         |  FROM qs JOIN cbl$pqIters c ON c.s = qs.s),
         |contribs AS (
         |  SELECT d.qid, pa.vec_id AS nid, d.s, d.contrib
         |  FROM pasgf pa
         |  JOIN dt d ON d.s = pa.s AND d.code = pa.code
         |  JOIN asgf a ON a.vec_id = pa.vec_id
         |  JOIN probes p ON p.qid = d.qid AND p.cell = a.cell
         |  WHERE pa.vec_id != d.qid),
         |sc AS (
         |  SELECT qid, nid,
         |         list_reduce(list(contrib ORDER BY s), (a, b) -> a + b) AS adc
         |  FROM contribs GROUP BY qid, nid),
         |r AS (SELECT qid, nid,
         |             row_number() OVER (PARTITION BY qid ORDER BY adc DESC, nid) AS rn
         |      FROM sc),
         |truth AS (
         |  SELECT qid, nid FROM (
         |    SELECT q.vec_id AS qid, n.vec_id AS nid,
         |           row_number() OVER (PARTITION BY q.vec_id
         |             ORDER BY ${foldDot("q.v", "n.v")}
         |                      / (${normSql("q.v")} * ${normSql("n.v")}) DESC,
         |                      n.vec_id) AS rn
         |    FROM e q JOIN e n ON n.vec_id != q.vec_id
         |    WHERE q.vec_id < $NQueries)
         |  WHERE rn <= $TopK),
         |d AS (SELECT unnest([5, 10, $maxDepth]) AS depth),
         |hits AS (
         |  SELECT d.depth, count(*) AS n
         |  FROM truth t
         |  JOIN r ON r.qid = t.qid AND r.nid = t.nid
         |  JOIN d ON r.rn <= d.depth
         |  GROUP BY 1)
         |SELECT d.depth, CAST(coalesce(h.n, 0) AS BIGINT) AS n_hits,
         |       floor(CAST(coalesce(h.n, 0) AS DOUBLE)
         |             / ${NQueries * TopK} * 1000000 + 0.5) / 1000000 AS recall
         |FROM d LEFT JOIN hits h ON h.depth = d.depth
         |ORDER BY d.depth""".stripMargin
    }) { (s, d) =>
      val maxDepth = 20
      val emb = Tables.embeddings(s, d)
      val queries = emb.where(col("vec_id") < NQueries)
      val cents = Similarity.trainCentroids(emb, "vec_id", "embedding",
        nLists = 16, iters = 3)
      val coarse = Similarity.ivfPqTopK(emb, queries, "vec_id", "embedding",
        cents, nProbe = 4, dims = Dims, nSub = 8, nCodes = 16, iters = 2,
        k = maxDepth)
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("qid").orderBy(col("adc").desc, col("nid").asc)
      val ranked = coarse.withColumn("rn", row_number().over(w))
      val truth = Similarity.bruteForceTopK(emb,
          observedQueries(queries, "q231_rerank_depth_recall"),
          "vec_id", "embedding", TopK)
        .select("qid", "nid")
      import s.implicits._
      val depths = Seq(5, 10, maxDepth).toDF("depth")
      val hits = truth.join(ranked, Seq("qid", "nid"))
        .withColumn("depth",
          explode(array(lit(5), lit(10), lit(maxDepth))))
        .where(col("rn") <= col("depth"))
        .groupBy("depth").agg(count(lit(1)).as("n"))
      depths.join(hits, Seq("depth"), "left")
        .select(col("depth"),
          coalesce(col("n"), lit(0L)).as("n_hits"),
          dround(coalesce(col("n"), lit(0L)).cast("double") /
            (NQueries * TopK), 6).as("recall"))
        .orderBy("depth")
    },

    // The ONE-CALL SQL surface for IVF ANN search — the family's
    // most-used operation (SqlSurface.createAnnSearchFunction):
    // registration bakes the TRAINED centroids as one matrix literal
    // plus (nProbe, k, query predicate); `SELECT * FROM
    // graft_ann_search()` then runs normalize → nearest_cell assignment
    // → nearest_cells probes → cosine_sim scoring → top-k. Every
    // function in the body is the registered twin of the Column
    // expression (identical fold order and tie-breaks), so this query is
    // held hash-for-hash to q41's oracle (SurfaceEquivalenceSpec pins
    // q234 ≙ q41 in CI via tvfTwins).
    Q.sql("q234_sql_ann_one_call", ivfSearchOracle) { (s, d) =>
      val emb = Tables.embeddings(s, d)
      emb.createOrReplaceTempView("embeddings")
      val cents = Similarity.trainCentroids(emb, "vec_id", "embedding",
        nLists = 16, iters = 3)
      SqlSurface.createAnnSearchFunction(s, cents, nProbe = 4, k = TopK,
        queryPred = s"vec_id < $NQueries")
      s.sql(
        """SELECT qid, nid, floor(cos * 1000000 + 0.5) / 1000000 AS cos
          |FROM graft_ann_search() ORDER BY qid, nid""".stripMargin)
    },

    // RIGHT-TO-BE-FORGOTTEN on the ANN index (Similarity.deleteFromIvfIndex
    // = io.Deletes on the cell= layout): three vector ids are deleted from
    // a WRITTEN index by rewriting only the files of the cells that hold
    // them (require-pinned strict file subset), then the search runs over
    // the post-delete index. The oracle replays the full q41 pipeline with
    // only the candidate set excluding the deleted ids — a hash match
    // proves the targeted rewrite removed exactly those vectors and
    // nothing else (deleted ids overlap the q41 result set, so the delete
    // demonstrably changes answers).
    // VERSIONED right-to-be-forgotten with an AUDIT TRAIL (q237 × q235 —
    // Similarity.writeIvfIndexVersioned / deleteFromIvfIndexVersioned):
    // the IVF index is a manifest-versioned table whose file entries carry
    // the cell value; the compliance delete lands as a COMMIT that
    // rewrites only the affected cells' files (require-pinned strict
    // subset, metadata preserved so probe pruning survives). The search
    // then runs at BOTH versions — the pinned pre-delete version still
    // returns the deleted ids (the audit window a review replays; vacuum
    // is where they physically leave disk), the post-delete version
    // equals a fresh index without them. The oracle replays the full q41
    // pipeline twice, with and without the excluded ids.
    Q.sql("q244_versioned_ann_forget", {
      val del = Seq(73L, 334L, 386L)
      s"""SELECT * FROM (
         |  SELECT 1 AS version, * FROM (${ivfSearchOracleExcluding(Nil)})
         |  UNION ALL
         |  SELECT 2 AS version, * FROM (${ivfSearchOracleExcluding(del)})
         |) ORDER BY version, qid, nid""".stripMargin
    }) { (s, d) =>
      val del = Seq(73L, 334L, 386L)
      val emb = Tables.embeddings(s, d)
      val cents = Similarity.trainCentroids(emb, "vec_id", "embedding",
        nLists = 16, iters = 3)
      val tbl = java.nio.file.Files
        .createTempDirectory("q244ivfv").toString + "/ivf_v"
      val v1 = Similarity.writeIvfIndexVersioned(emb, "vec_id", "embedding",
        cents, tbl)
      val v2 = Similarity.deleteFromIvfIndexVersioned(s, tbl, del)
      require(v2 == v1 + 1, s"delete must land one commit ($v1 -> $v2)")
      def files(v: Int) = graft.io.Versioned.snapshot(s, tbl, v)
        .select(input_file_name()).distinct()
        .collect().map(_.getString(0)).toSet
      val (f1, f2) = (files(v1), files(v2))
      val shared = f1 intersect f2
      require(shared.nonEmpty && shared.size < f1.size,
        s"versioned index delete must rewrite a strict file subset " +
          s"(${shared.size}/${f1.size})")
      def searchAt(v: Int) = Similarity.ivfTopKFromIndexVersioned(s, tbl,
        emb.where(col("vec_id") < NQueries), "vec_id", "embedding",
        cents, nProbe = 4, k = TopK, version = v)
      // the audit property, pinned scale-independently on the SNAPSHOTS
      // (whether the ids also surface in a top-k is corpus-size-dependent
      // — at sf0.01 they do, and the oracle hash proves it): the pinned
      // pre-delete version still HOLDS the forgotten vectors, the
      // post-delete version does not, and no search at v2 can return them
      require(graft.io.Versioned.snapshot(s, tbl, v1)
        .where(col("nid").isin(del: _*)).count() == del.size,
        "pinned pre-delete version lost the audit trail")
      require(graft.io.Versioned.snapshot(s, tbl, v2)
        .where(col("nid").isin(del: _*)).count() == 0,
        "post-delete version still holds forgotten ids")
      def report(v: Int, ver: Int) = searchAt(v)
        .select(lit(ver).as("version"), col("qid"), col("nid"),
          dround(col("cos"), 6).as("cos"))
      report(v1, 1).unionByName(report(v2, 2))
        .orderBy("version", "qid", "nid")
    },

    Q.sql("q237_ivf_index_delete",
      ivfSearchOracleExcluding(Seq(73L, 334L, 386L))) { (s, d) =>
      val emb = Tables.embeddings(s, d)
      val cents = Similarity.trainCentroids(emb, "vec_id", "embedding",
        nLists = 16, iters = 3)
      val idx = java.nio.file.Files
        .createTempDirectory("q237ivfdel").toString + "/ivf_idx"
      Similarity.writeIvfIndex(emb, "vec_id", "embedding", cents, idx)
      val r = Similarity.deleteFromIvfIndex(s, idx, Seq(73L, 334L, 386L))
      require(r.rowsDeleted == 3 && r.filesTouched < r.filesTotal,
        s"index delete must rewrite a strict file subset ($r)")
      Similarity.ivfTopKFromIndex(s, idx,
          emb.where(col("vec_id") < NQueries),
          "vec_id", "embedding", cents, nProbe = 4, k = TopK)
        .select(col("qid"), col("nid"), dround(col("cos"), 6).as("cos"))
        .orderBy("qid", "nid")
    },

    // Contrastive-pair mining (Similarity.hardPairs): per query, the
    // nearest same-label vector (positive) and nearest other-label vector
    // (hard negative) — the triplet-mining primitive for embedding
    // fine-tunes. Same scoring kernel and tie-break as q25, plus the label
    // partition, so the oracle replays it with one extra CASE.
    Q.sql("q70_hard_pairs",
      s"""WITH e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
         |q AS (SELECT vec_id AS qid, label AS qlabel, v AS qv FROM e
         |      WHERE vec_id < $NQueries),
         |s AS (
         |  SELECT qid, e.vec_id AS nid, e.label AS label,
         |         CASE WHEN e.label = qlabel THEN 'pos' ELSE 'neg' END AS kind,
         |         list_reduce(list_transform(generate_series(1, $Dims), i -> qv[i] * v[i]), (x, y) -> x + y)
         |         / (sqrt(list_reduce(list_transform(qv, x -> x * x), (x, y) -> x + y))
         |            * sqrt(list_reduce(list_transform(v, x -> x * x), (x, y) -> x + y))) AS cos
         |  FROM e, q WHERE e.vec_id != qid),
         |r AS (SELECT qid, kind, nid, label, cos,
         |             row_number() OVER (PARTITION BY qid, kind
         |                                ORDER BY cos DESC, nid) AS rn
         |      FROM s)
         |SELECT qid, kind, nid, label, floor(cos * 1000000 + 0.5) / 1000000 AS cos
         |FROM r WHERE rn = 1 ORDER BY qid, kind""".stripMargin) { (s, d) =>
      val emb = Tables.embeddings(s, d)
      Similarity.hardPairs(emb,
          observedQueries(emb.where(col("vec_id") < NQueries), "q70_hard_pairs"),
          "vec_id", "embedding", "label")
        .select(col("qid"), col("kind"), col("nid"), col("label"),
          dround(col("cos"), 6).as("cos"))
        .orderBy("qid", "kind")
    },

    // Embedding-space QA (Similarity.classSeparationReport): per-label
    // cohesion (mean member→centroid L2) and separation (min centroid→
    // other-centroid L2). Every cross-dimension sum is a decimal sum of
    // grid-quantized terms (the trainCentroids discipline), so the oracle
    // replays centroids, member distances, and the pair matrix exactly.
    Q.sql("q155_class_separation",
      """WITH e AS (
        |  SELECT label, vec_id AS id, u.i AS pos,
        |         floor(CAST(u.x AS DOUBLE) * 1000000 + 0.5) / 1000000 AS xq
        |  FROM embeddings,
        |       LATERAL (SELECT unnest(embedding) AS x,
        |                       generate_subscripts(embedding, 1) AS i) u),
        |cent AS (
        |  SELECT label, pos,
        |         CAST(SUM(CAST(xq AS DECIMAL(38,8))) AS DOUBLE) / count(*) AS c
        |  FROM e GROUP BY 1, 2),
        |member AS (
        |  SELECT e.label, e.id,
        |         sqrt(CAST(SUM(CAST(
        |           floor((e.xq - c.c) * (e.xq - c.c) * 1e12 + 0.5) / 1e12
        |           AS DECIMAL(38,14))) AS DOUBLE)) AS dist
        |  FROM e JOIN cent c ON c.label = e.label AND c.pos = e.pos
        |  GROUP BY 1, 2),
        |coh AS (
        |  SELECT label, count(*) AS n,
        |         floor(CAST(SUM(CAST(floor(dist * 1000000 + 0.5) / 1000000
        |                             AS DECIMAL(38,8))) AS DOUBLE)
        |               / count(*) * 1000000 + 0.5) / 1000000 AS cohesion
        |  FROM member GROUP BY 1),
        |pd AS (
        |  SELECT a.label AS label, b.label AS lb,
        |         sqrt(CAST(SUM(CAST(
        |           floor((a.c - b.c) * (a.c - b.c) * 1e12 + 0.5) / 1e12
        |           AS DECIMAL(38,14))) AS DOUBLE)) AS d
        |  FROM cent a JOIN cent b ON a.pos = b.pos AND a.label <> b.label
        |  GROUP BY 1, 2),
        |sep AS (
        |  SELECT label, floor(MIN(d) * 1000000 + 0.5) / 1000000 AS separation
        |  FROM pd GROUP BY 1)
        |SELECT c.label, c.n, c.cohesion, s.separation
        |FROM coh c JOIN sep s USING (label) ORDER BY 1""".stripMargin) { (s, d) =>
      Similarity.classSeparationReport(Tables.embeddings(s, d),
          "vec_id", "embedding", "label")
        .orderBy("label")
    },

    // Leave-one-out 1-NN classification accuracy per label — the
    // embedding-quality EVALUATION row (is the space actually separable?),
    // complementing q155's geometry report. Exact cosine 1-NN is the
    // declared quadratic baseline (the q37→q105 two-tier rule: the scale
    // path swaps in the IVF probe); the oracle replays the fold-order-
    // compatible cosine and the (cos DESC, nid) argmax.
    Q.sql("q176_knn_accuracy", {
      val dims = 64
      def norm(e: String) =
        s"sqrt(list_reduce(list_transform($e, x -> x * x), (x, y) -> x + y))"
      s"""WITH e AS (
         |  SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v
         |  FROM embeddings),
         |s AS (
         |  SELECT q.vec_id AS qid, q.label AS qlabel,
         |         n.vec_id AS nid, n.label AS nlabel,
         |         list_reduce(list_transform(generate_series(1, $dims),
         |                                    i -> q.v[i] * n.v[i]),
         |                     (x, y) -> x + y)
         |         / (${norm("q.v")} * ${norm("n.v")}) AS cos
         |  FROM e q JOIN e n ON n.vec_id != q.vec_id),
         |r AS (
         |  SELECT qid, qlabel, nlabel,
         |         row_number() OVER (PARTITION BY qid
         |                            ORDER BY cos DESC, nid) AS rn
         |  FROM s)
         |SELECT qlabel AS label, count(*) AS n,
         |       CAST(SUM(CASE WHEN nlabel = qlabel THEN 1 ELSE 0 END)
         |            AS BIGINT) AS n_correct,
         |       floor(CAST(SUM(CASE WHEN nlabel = qlabel THEN 1 ELSE 0 END)
         |                  AS DOUBLE) / count(*) * 1000000 + 0.5) / 1000000
         |         AS accuracy
         |FROM r WHERE rn = 1 GROUP BY 1 ORDER BY 1""".stripMargin
    }) { (s, d) =>
      val emb = Tables.embeddings(s, d)
      val labels = emb.select(col("vec_id"), col("label"))
      Similarity.bruteForceTopK(emb,
          observedQueries(emb, "q176_knn_accuracy"), "vec_id", "embedding",
          k = 1)
        .join(labels.select(col("vec_id").as("qid"), col("label").as("qlabel")), "qid")
        .join(labels.select(col("vec_id").as("nid"), col("label").as("nlabel")), "nid")
        .groupBy(col("qlabel").as("label"))
        .agg(count(lit(1)).as("n"),
          sum(when(col("nlabel") === col("qlabel"), 1L).otherwise(0L))
            .as("n_correct"))
        .withColumn("accuracy",
          dround(col("n_correct").cast("double") / col("n"), 6))
        .orderBy("label")
    },

    // PC1 decomposition report (operators.Decomposition.pc1Report): top
    // principal direction of the embedding corpus via a ONE-PASS
    // partial-combined gram matrix (the corpus never shuffles; only
    // #partitions·d² accumulator rows do) + a grid-deterministic driver
    // power iteration (PcaIters rounds) + a broadcast-v map-only
    // projection. Per-label projection stats + explained-variance share.
    // The oracle replays EVERY stage — means, centered gram, each
    // matrix-vector round with its renormalization, and the projections —
    // as scaled-long sums, so partition order can never shift a bit.
    Q.sql("q182_pca_pc1", {
      val iterCtes = (1 to PcaIters).map { k =>
        s""",
           |w$k AS (
           |  SELECT c.i,
           |         CAST(SUM(CAST(floor(c.v * v.v * 1e9 + 0.5) AS BIGINT))
           |              AS BIGINT) / 1e9 AS w
           |  FROM covf c JOIN v${k - 1} v ON v.i = c.j GROUP BY 1),
           |n$k AS (
           |  SELECT sqrt(CAST(SUM(CAST(floor(w * w * 1e9 + 0.5) AS BIGINT))
           |                   AS BIGINT) / 1e9) AS nrm FROM w$k),
           |v$k AS (
           |  SELECT i, floor(w / (SELECT nrm FROM n$k) * 1e9 + 0.5) / 1e9 AS v
           |  FROM w$k)"""
      }.mkString
      s"""WITH x AS (
         |  SELECT vec_id, CAST(label AS BIGINT) AS label, i - 1 AS i,
         |         CAST(xe AS DOUBLE) AS x
         |  FROM (SELECT vec_id, label, unnest(embedding) AS xe,
         |               generate_subscripts(embedding, 1) AS i
         |        FROM embeddings)),
         |nn AS (SELECT count(*) AS n FROM embeddings),
         |m AS (
         |  SELECT i,
         |         floor(CAST(SUM(CAST(floor(x * 1e9 + 0.5) AS BIGINT))
         |                    AS BIGINT) / 1e9 / (SELECT n FROM nn)
         |               * 1e9 + 0.5) / 1e9 AS m
         |  FROM x GROUP BY 1),
         |c AS (SELECT x.vec_id, x.label, x.i, x.x - m.m AS c
         |      FROM x JOIN m USING (i)),
         |g AS (
         |  SELECT a.i AS i, b.i AS j,
         |         CAST(SUM(CAST(floor(a.c * b.c * 1e9 + 0.5) AS BIGINT))
         |              AS BIGINT) AS s
         |  FROM c a JOIN c b ON a.vec_id = b.vec_id AND a.i <= b.i
         |  GROUP BY 1, 2),
         |cov AS (
         |  SELECT i, j,
         |         floor(s / 1e9 / ((SELECT n FROM nn) - 1) * 1e9 + 0.5) / 1e9
         |           AS v
         |  FROM g),
         |covf AS (SELECT i, j, v FROM cov
         |         UNION ALL SELECT j, i, v FROM cov WHERE i < j),
         |v0 AS (SELECT i, CAST(1 AS DOUBLE) AS v FROM m)$iterCtes,
         |tr AS (SELECT CAST(SUM(CAST(floor(v * 1e9 + 0.5) AS BIGINT))
         |                   AS BIGINT) AS t
         |       FROM cov WHERE i = j),
         |er AS (SELECT floor((SELECT nrm FROM n$PcaIters) / (t / 1e9)
         |                    * 1e6 + 0.5) / 1e6 AS er FROM tr),
         |psp AS (
         |  SELECT c.vec_id, c.label,
         |         CAST(SUM(CAST(floor(c.c * v.v * 1e9 + 0.5) AS BIGINT))
         |              AS BIGINT) AS sp
         |  FROM c JOIN v$PcaIters v USING (i) GROUP BY 1, 2)
         |SELECT label, count(*) AS n,
         |       floor(CAST(SUM(sp) AS BIGINT) / 1e9 / count(*)
         |             * 1e6 + 0.5) / 1e6 AS mean_proj,
         |       min(sp) / 1e9 AS min_proj,
         |       max(sp) / 1e9 AS max_proj,
         |       (SELECT er FROM er) AS ev_ratio
         |FROM psp GROUP BY 1 ORDER BY 1""".stripMargin
    }) { (s, d) =>
      graft.operators.Decomposition.pc1Report(Tables.embeddings(s, d),
          "embedding", "label", iters = PcaIters, scale = 9)
        .orderBy("label")
    },

    // Quantization recall eval: does int8 symmetric quantization (q62's
    // pipeline) return the same neighbors as exact fp cosine (q25's)?
    // recall@k per query — the accuracy/compression trade every
    // vector-index deployment must measure before shipping the 4×-smaller
    // index (q176's eval discipline applied to the index, not the
    // embeddings). Both pipelines are the verified operators; the eval
    // is one (qid, nid) equi-join + a query-grain aggregate. The oracle
    // replays both rankings and intersects.
    Q.sql("q199_quantization_recall",
      s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
         |q AS (SELECT vec_id AS qid, v AS qv FROM e WHERE vec_id < $NQueries),
         |xs AS (
         |  SELECT qid, e.vec_id AS nid,
         |         ${foldDot("qv", "v")}
         |         / (${normSql("qv")} * ${normSql("v")}) AS cos
         |  FROM e, q WHERE e.vec_id != qid),
         |xr AS (SELECT qid, nid,
         |              row_number() OVER (PARTITION BY qid
         |                                 ORDER BY cos DESC, nid) AS rn
         |       FROM xs),
         |ex AS (SELECT qid, nid FROM xr WHERE rn <= $TopK),
         |sc AS (SELECT vec_id, list_max(list_transform(v, x -> abs(x))) / 127.0 AS s FROM e),
         |qv2 AS (
         |  SELECT e.vec_id,
         |         CASE WHEN sc.s > 0
         |              THEN list_transform(e.v, x -> greatest(-127.0, least(127.0, floor(x / sc.s + 0.5))))
         |              ELSE list_transform(e.v, x -> 0.0) END AS q
         |  FROM e JOIN sc USING (vec_id)),
         |nz AS (SELECT vec_id, q FROM qv2
         |       WHERE list_max(list_transform(q, x -> abs(x))) > 0),
         |qs AS (
         |  SELECT a.vec_id AS qid, b.vec_id AS nid,
         |         ${foldDot("a.q", "b.q")}
         |         / (${normSql("a.q")} * ${normSql("b.q")}) AS qcos
         |  FROM nz a JOIN nz b ON b.vec_id != a.vec_id
         |  WHERE a.vec_id < $NQueries),
         |qr AS (SELECT qid, nid,
         |              row_number() OVER (PARTITION BY qid
         |                                 ORDER BY qcos DESC, nid) AS rn
         |       FROM qs),
         |qt AS (SELECT qid, nid FROM qr WHERE rn <= $TopK),
         |ov AS (SELECT ex.qid, count(*) AS n_overlap
         |       FROM ex JOIN qt ON qt.qid = ex.qid AND qt.nid = ex.nid
         |       GROUP BY 1)
         |SELECT s.qid, coalesce(ov.n_overlap, 0) AS n_overlap,
         |       floor(CAST(coalesce(ov.n_overlap, 0) AS DOUBLE) / $TopK
         |             * 1e6 + 0.5) / 1e6 AS recall
         |FROM (SELECT DISTINCT qid FROM ex) s
         |LEFT JOIN ov ON ov.qid = s.qid
         |ORDER BY s.qid""".stripMargin) { (s, d) =>
      val emb = Tables.embeddings(s, d)
      val queries = observedQueries(emb.where(col("vec_id") < NQueries),
        "q199_quantization_recall")
      val exact = Similarity.bruteForceTopK(emb, queries, "vec_id",
          "embedding", TopK).select(col("qid"), col("nid"))
      val quant = Similarity.quantizedTopK(emb, queries, "vec_id",
          "embedding", TopK).select(col("qid"), col("nid"))
      val ov = exact.join(quant, Seq("qid", "nid"))
        .groupBy("qid").agg(count(lit(1)).as("n_overlap"))
      exact.select("qid").distinct()
        .join(ov, Seq("qid"), "left")
        .select(col("qid"),
          coalesce(col("n_overlap"), lit(0L)).as("n_overlap"),
          dround(coalesce(col("n_overlap"), lit(0L)).cast("double") / TopK, 6)
            .as("recall"))
        .orderBy("qid")
    },

    // Margin-based parallel-pair mining (Similarity.marginMine — the
    // Artetxe & Schwenk bitext criterion): align the even-id half of the
    // embeddings with the odd-id half via cos normalized by both sides'
    // retrieved-k-NN average, mutual-best matches only. Candidates come
    // from the q105 hyperplane buckets (never all pairs); the margin
    // denominator is a DECIMAL sum of 6dp-quantized cosines / count, so
    // the oracle replays planes → buckets → cap → candidates → cosines →
    // k-NN averages → margins → mutual argmax bit-for-bit.
    Q.sql("q217_margin_mining", marginOracleSql) { (s, d) =>
      val emb = Tables.embeddings(s, d)
      Similarity.marginMine(
          emb.where(col("vec_id") % 2 === 0),
          emb.where(col("vec_id") % 2 === 1),
          "vec_id", "embedding", k = 4, minMargin = 1.0,
          lsh = Some((Dims, 12, 6)), maxBucketSize = Some(256))
        .orderBy("src_id", "tgt_id")
    },

    // The margin miner behind the one-call SQL surface (the q215 pattern
    // applied beyond dedup): `SELECT * FROM graft_margin_pairs()` runs the
    // whole plane→bucket→cap→cosine→k-NN-average→mutual-argmax pipeline.
    // Held to the SAME DuckDB oracle text as q217 — the TVF body must
    // reproduce the Column-API results hash-for-hash, exactly as q215 is
    // held to q212's family.
    Q.sql("q218_sql_margin_one_call", marginOracleSql) { (s, d) =>
      Tables.embeddings(s, d).createOrReplaceTempView("embeddings")
      // pre-materialized band view (the registrar's bandTable option —
      // the q219 shingleTable pattern): a SQL function body has no
      // persist point, so the default body re-derives the band table for
      // EACH of its consumers (the cap aggregate + both sides of the
      // candidate self-join). The session admin materializes the
      // registrar's own derivation text (marginBandViewSql — zero drift
      // possible), persists it, and every consumer becomes a cache read.
      // Pinned (caller-released) like every operator-internal persist —
      // the same band-table persist the Column twin q217 does.
      val bands = graft.PinnedFrames.pin(
        s.sql(SqlSurface.marginBandViewSql(s, table = "embeddings",
          idCol = "vec_id", vecCol = "embedding",
          srcPred = "vec_id % 2 = 0", tgtPred = "vec_id % 2 = 1",
          dims = Dims, nPlanes = 12, nTables = 6)).persist())
      bands.createOrReplaceTempView("margin_bands")
      // …and the sides view (the registrar's sidesTable option): the
      // SCORE stage's two vector fetches re-derived es/et per consumer —
      // the measured ~1 s residual after the band view landed
      // (ProbeMargin breakdown in SCALE.md). Same persist the Column
      // twin's cached frames amount to.
      val sides = graft.PinnedFrames.pin(
        s.sql(SqlSurface.marginSidesViewSql(table = "embeddings",
          idCol = "vec_id", vecCol = "embedding",
          srcPred = "vec_id % 2 = 0", tgtPred = "vec_id % 2 = 1"))
          .persist())
      sides.createOrReplaceTempView("margin_sides")
      SqlSurface.createMarginMiningFunction(s, table = "embeddings",
        idCol = "vec_id", vecCol = "embedding",
        srcPred = "vec_id % 2 = 0", tgtPred = "vec_id % 2 = 1",
        dims = Dims, nPlanes = 12, nTables = 6, cap = 256, k = 4,
        minMargin = 1.0, bandTable = Some("margin_bands"),
        sidesTable = Some("margin_sides"))
      s.sql("SELECT src_id, tgt_id, cos, margin FROM graft_margin_pairs() " +
        "ORDER BY src_id, tgt_id")
    },

    // INCREMENTAL index maintenance, search half: centroids are trained on
    // the BASE corpus only (vec_id % 10 < 8 — the "yesterday's index"
    // model), the appended shard (% 10 >= 8) is assigned to those EXISTING
    // centroids in the same map-only pass as the base, and the search runs
    // over the combined index — no Lloyd scan over the full corpus, which
    // is the whole point: append cost is assignment, not retraining. The
    // oracle replays the base-only training (lloydPrelude's trainWhere),
    // the full-corpus assignment, and the probed search bit-for-bit.
    Q.sql("q222_ann_ivf_append", {
      val nLists = 16; val iters = 3; val nProbe = 4
      s"""WITH ${lloydPrelude(nLists, iters, 6, trainWhere = AppendBaseWhere)},
         |probes AS (
         |  SELECT vec_id AS qid, cell FROM (
         |    SELECT s.vec_id, c.cell,
         |           row_number() OVER (PARTITION BY s.vec_id
         |             ORDER BY ${foldDot("s.u", "c.cv")} DESC, c.cell ASC) AS rn
         |    FROM u s CROSS JOIN centlist$iters c
         |    WHERE s.vec_id < $NQueries)
         |  WHERE rn <= $nProbe),
         |cand AS (
         |  SELECT p.qid, a.vec_id AS nid FROM probes p
         |  JOIN asgf a ON a.cell = p.cell
         |  WHERE a.vec_id != p.qid),
         |sc AS (
         |  SELECT cand.qid, cand.nid,
         |         ${foldDot("qe.v", "ne.v")} / (${normSql("qe.v")} * ${normSql("ne.v")}) AS cos
         |  FROM cand
         |  JOIN e qe ON qe.vec_id = cand.qid
         |  JOIN e ne ON ne.vec_id = cand.nid),
         |r AS (SELECT qid, nid, cos,
         |             row_number() OVER (PARTITION BY qid ORDER BY cos DESC, nid) AS rn
         |      FROM sc)
         |SELECT qid, nid, floor(cos * 1000000 + 0.5) / 1000000 AS cos
         |FROM r WHERE rn <= $TopK ORDER BY qid, nid""".stripMargin
    }) { (s, d) =>
      val emb = Tables.embeddings(s, d)
      val base = emb.where(expr(AppendBaseWhere))
      val queries = emb.where(col("vec_id") < NQueries)
      val cents = Similarity.trainCentroids(base, "vec_id", "embedding",
        nLists = 16, iters = 3)
      Similarity.ivfTopK(emb, queries, "vec_id", "embedding", cents,
          nProbe = 4, k = TopK)
        .select(col("qid"), col("nid"), dround(col("cos"), 6).as("cos"))
        .orderBy("qid", "nid")
    },

    // INCREMENTAL index maintenance, gate half: the centroid-drift report
    // (Similarity.centroidDriftReport) over the same base/append split —
    // per occupied cell, base/appended member counts and the L2 distance
    // between the cell's current member mean and the base-trained
    // centroid. The rebuild decision reads this report instead of
    // re-running Lloyd to find out whether it needed to. Oracle replays
    // training, full assignment, quantized decimal means, and the rounded
    // distance arithmetic.
    // The drift gate behind the one-call SQL surface: registration trains
    // on the base and bakes the centroids as literals (a drift gate is
    // always evaluated against a specific trained model), then the SQL
    // user types `SELECT * FROM graft_centroid_drift()`. Held to q221's
    // oracle verbatim — assignment argmax, quantized decimal means, and
    // the shift arithmetic replay hash-for-hash (the q215/q218/q219
    // discipline; SurfaceEquivalenceSpec pins q223 ≙ q221 in CI).
    Q.sql("q223_sql_drift_one_call", driftOracleSql) { (s, d) =>
      val emb = Tables.embeddings(s, d)
      val base = emb.where(expr(AppendBaseWhere))
      val cents = Similarity.trainCentroids(base, "vec_id", "embedding",
        nLists = 16, iters = 3)
      emb.createOrReplaceTempView("embeddings")
      SqlSurface.createCentroidDriftFunction(s, cents,
        table = "embeddings", idCol = "vec_id", vecCol = "embedding",
        basePred = AppendBaseWhere)
      s.sql("SELECT cell, n_base, n_new, shift FROM graft_centroid_drift() " +
        "ORDER BY cell")
    },

    Q.sql("q221_ann_centroid_drift", driftOracleSql) { (s, d) =>
      val emb = Tables.embeddings(s, d)
      val base = emb.where(expr(AppendBaseWhere))
      val appended = emb.where(!expr(AppendBaseWhere))
      val cents = Similarity.trainCentroids(base, "vec_id", "embedding",
        nLists = 16, iters = 3)
      Similarity.centroidDriftReport(base, appended, "vec_id", "embedding",
          cents)
        .orderBy("cell")
    })

  // --- q221/q223 shared oracle: the centroid-drift report replayed in
  // DuckDB (base-only Lloyd training via lloydPrelude's trainWhere, full
  // assignment, quantized decimal means, rounded shift arithmetic). One
  // text, two surfaces — the TVF must reproduce the Column API's report
  // hash-for-hash. ---
  private lazy val driftOracleSql: String = {
    val nLists = 16; val iters = 3
    s"""WITH ${lloydPrelude(nLists, iters, 6, trainWhere = AppendBaseWhere)},
       |mq AS (
       |  SELECT cell, pos, floor(u[pos] * 1000000 + 0.5) / 1000000 AS xq,
       |         CASE WHEN ${AppendBaseWhere.replace("vec_id", "a.vec_id")}
       |              THEN 0 ELSE 1 END AS nw
       |  FROM (SELECT a.vec_id, a.cell, a.u,
       |               unnest(generate_series(1, $Dims)) AS pos
       |        FROM asgf a) a),
       |ms AS (
       |  SELECT cell, pos,
       |         CAST(sum(CAST(xq AS DECIMAL(38, 8))) AS DOUBLE) / count(*) AS m
       |  FROM mq GROUP BY cell, pos),
       |cnt AS (
       |  SELECT a.cell,
       |         sum(CASE WHEN ${AppendBaseWhere.replace("vec_id", "a.vec_id")}
       |                  THEN 1 ELSE 0 END) AS n_base,
       |         sum(CASE WHEN ${AppendBaseWhere.replace("vec_id", "a.vec_id")}
       |                  THEN 0 ELSE 1 END) AS n_new
       |  FROM asgf a GROUP BY a.cell),
       |sq AS (
       |  SELECT ms.cell,
       |         floor((ms.m - c.val) * (ms.m - c.val) * 1e12 + 0.5) / 1e12 AS sq
       |  FROM ms JOIN cents$iters c ON c.cell = ms.cell AND c.pos = ms.pos),
       |sh AS (
       |  SELECT cell,
       |         sqrt(CAST(sum(CAST(sq AS DECIMAL(38, 14))) AS DOUBLE)) AS shift
       |  FROM sq GROUP BY cell)
       |SELECT CAST(cnt.cell AS INT) AS cell,
       |       CAST(n_base AS BIGINT) AS n_base,
       |       CAST(n_new AS BIGINT) AS n_new,
       |       floor(shift * 1000000 + 0.5) / 1000000 AS shift
       |FROM cnt JOIN sh ON sh.cell = cnt.cell
       |ORDER BY cell""".stripMargin
  }

  // --- q217/q218 shared oracle: margin mining replayed in DuckDB ---
  private lazy val marginOracleSql: String = {
      val nPlanes = 12; val nTables = 6; val cap = 256; val k = 4
      def dotSql(vec: String, plane: Array[Double]): String = {
        val lits = plane.map(x => if (x > 0) "1.0" else "-1.0")
          .mkString("[", ",", "]")
        s"list_reduce(list_transform(generate_series(1, $Dims), i -> $vec[i] * ($lits)[i]), (a, b) -> a + b)"
      }
      val bandSelects = (0 until nTables).map { t =>
        val bucket = (0 until nPlanes).map { p =>
          val d = dotSql("v", Similarity.planeVec(t, p, Dims))
          s"(CASE WHEN $d > 0 THEN ${1L << p} ELSE 0 END)"
        }.mkString(" + ")
        s"SELECT vec_id, $t AS t, CAST($bucket AS BIGINT) AS bucket FROM e"
      }.mkString("\n  UNION ALL ")
      s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
         |b AS (
         |  $bandSelects),
         |ok AS (
         |  SELECT t, bucket FROM b GROUP BY t, bucket HAVING count(*) <= $cap),
         |c AS (
         |  SELECT b.vec_id, b.t, b.bucket FROM b
         |  JOIN ok ON ok.t = b.t AND ok.bucket = b.bucket),
         |cand AS (
         |  SELECT DISTINCT x.vec_id AS src_id, y.vec_id AS tgt_id
         |  FROM c x JOIN c y ON x.t = y.t AND x.bucket = y.bucket
         |  WHERE x.vec_id % 2 = 0 AND y.vec_id % 2 = 1),
         |s0 AS (
         |  SELECT cand.src_id, cand.tgt_id,
         |         floor((${foldDot("ae.v", "be.v")}
         |                / (${normSql("ae.v")} * ${normSql("be.v")}))
         |               * 1000000 + 0.5) / 1000000 AS cos
         |  FROM cand
         |  JOIN e ae ON ae.vec_id = cand.src_id
         |  JOIN e be ON be.vec_id = cand.tgt_id),
         |s AS (SELECT * FROM s0 WHERE cos > 0),
         |rs AS (SELECT src_id, cos,
         |              row_number() OVER (PARTITION BY src_id
         |                                 ORDER BY cos DESC, tgt_id) AS rn
         |       FROM s),
         |avs AS (SELECT src_id,
         |               CAST(sum(CAST(cos AS DECIMAL(18,6))) AS DOUBLE)
         |               / CAST(count(*) AS DOUBLE) AS av_s
         |        FROM rs WHERE rn <= $k GROUP BY src_id),
         |rt AS (SELECT tgt_id, cos,
         |              row_number() OVER (PARTITION BY tgt_id
         |                                 ORDER BY cos DESC, src_id) AS rn
         |       FROM s),
         |avt AS (SELECT tgt_id,
         |               CAST(sum(CAST(cos AS DECIMAL(18,6))) AS DOUBLE)
         |               / CAST(count(*) AS DOUBLE) AS av_t
         |        FROM rt WHERE rn <= $k GROUP BY tgt_id),
         |m AS (SELECT s.src_id, s.tgt_id, s.cos,
         |             s.cos / (0.5 * (av_s + av_t)) AS margin
         |      FROM s JOIN avs USING (src_id) JOIN avt USING (tgt_id)),
         |r AS (SELECT src_id, tgt_id, cos, margin,
         |             row_number() OVER (PARTITION BY src_id
         |                                ORDER BY margin DESC, tgt_id) AS r_s,
         |             row_number() OVER (PARTITION BY tgt_id
         |                                ORDER BY margin DESC, src_id) AS r_t
         |      FROM m)
         |SELECT src_id, tgt_id, cos,
         |       floor(margin * 1000000 + 0.5) / 1000000 AS margin
         |FROM r WHERE r_s = 1 AND r_t = 1 AND margin >= 1.0
         |ORDER BY src_id, tgt_id""".stripMargin
  }
}
