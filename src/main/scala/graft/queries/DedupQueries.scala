package graft.queries

import org.apache.spark.sql.functions._
import graft.io.Tables
import graft.operators.Dedup
import graft.queries.Qutil.dround

/** Near-duplicate detection: MinHash+LSH, n-gram Jaccard, SimHash — each
  * verifiable in DuckDB because signatures derive from the shared md5-prefix
  * hash (TextFunctions.md5Int). The oracle SQL is generated from the same
  * (k, bands, n) constants as the Spark operators.
  */
object DedupQueries {

  private val ShingleN = 3
  private val K = 16       // minhash functions
  private val Bands = 4    // LSH bands (rows per band = K / Bands)
  private val SimBits = 32
  private val SimBands = 2   // 16-bit blocks: selective buckets (word-soup
                             // docs cluster; 8-bit blocks → ~10M candidates)
  private val MaxHamming = 2
  private val SubstrK = 8  // min duplicated-run length, in tokens (q90)
  private val BoilerDf = 3 // q109: spans in ≥ this many docs are boilerplate
  private[queries] val SimTNum = 1  // q98 similarity-join threshold t = 1/2
  private[queries] val SimTDen = 2
  private[queries] val EvalSampleMod = 4 // q216/q219: keep 1-in-4 pairs (deterministic)

  private def md5IntSql(e: String): String =
    s"('0x' || substr(md5($e), 1, 8))::BIGINT"

  /** q216's DuckDB oracle — shared verbatim with q219 (the one-call TVF
    * surface for the sampled eval), exactly as q21's oracle is shared with
    * q212/q215 and the margin oracle with q217/q218: the TVF body must
    * reproduce the Column API's report hash-for-hash. Truth here comes from
    * the UNFILTERED all-co-shingled-pairs join with the same sample
    * predicate applied, so the Spark sides' prefix filter is hash-verified
    * lossless in-sample on both surfaces. */
  private[queries] lazy val lshEvalSampledOracle: String = {
    val tau = "0.5"
    val pred = (a: String, b: String) =>
      s"${md5IntSql(s"'pairsample:' || CAST($a AS VARCHAR) || ':' || CAST($b AS VARCHAR)")} % $EvalSampleMod = 0"
    s"""$shingleCte,
       |$minhashCtes,
       |cand_s AS (SELECT id_a, id_b FROM pairs WHERE ${pred("id_a", "id_b")}),
       |sz AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY 1),
       |inter AS (
       |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS inter
       |  FROM sh a JOIN sh b ON b.sh = a.sh AND a.doc_id < b.doc_id
       |  GROUP BY 1, 2),
       |truth_s AS (
       |  SELECT i.id_a, i.id_b FROM inter i
       |  JOIN sz sa ON sa.doc_id = i.id_a
       |  JOIN sz sb ON sb.doc_id = i.id_b
       |  WHERE CAST(i.inter AS DOUBLE) * 1.0
       |        / (sa.sz + sb.sz - i.inter) >= $tau
       |    AND ${pred("i.id_a", "i.id_b")}),
       |hits AS (SELECT p.id_a FROM cand_s p
       |         JOIN truth_s t ON t.id_a = p.id_a AND t.id_b = p.id_b),
       |m AS (SELECT (SELECT count(*) FROM cand_s) AS n_cand,
       |             (SELECT count(*) FROM truth_s) AS n_true,
       |             (SELECT count(*) FROM hits) AS n_hit),
       |e AS (SELECT n_cand, n_true, n_hit,
       |             CAST(n_hit AS DOUBLE) / n_cand AS p_est,
       |             CAST(n_hit AS DOUBLE) / n_true AS r_est,
       |             1.96 * sqrt((CAST(n_hit AS DOUBLE) / n_true)
       |                         * (1.0 - CAST(n_hit AS DOUBLE) / n_true)
       |                         / n_true) AS half
       |      FROM m)
       |SELECT CAST(n_cand AS BIGINT) AS n_cand,
       |       CAST(n_true AS BIGINT) AS n_true,
       |       CAST(n_hit AS BIGINT) AS n_hit,
       |       floor(p_est * 1e6 + 0.5) / 1e6 AS precision,
       |       floor(r_est * 1e6 + 0.5) / 1e6 AS recall,
       |       floor(greatest(0.0, r_est - half) * 1e6 + 0.5) / 1e6
       |         AS recall_lo,
       |       floor(least(1.0, r_est + half) * 1e6 + 0.5) / 1e6
       |         AS recall_hi
       |FROM e""".stripMargin
  }

  /** Shared shingle CTE (word 3-grams, distinct per doc). */
  private[queries] val shingleCte: String =
    s"""WITH w AS (
       |  SELECT doc_id,
       |         CASE WHEN length(trim(text)) = 0 THEN CAST([] AS VARCHAR[])
       |              ELSE string_split_regex(trim(text), '\\s+') END AS ws
       |  FROM documents),
       |sh AS (
       |  SELECT DISTINCT doc_id, array_to_string(ws[i:i+${ShingleN - 1}], ' ') AS sh
       |  FROM (SELECT doc_id, ws, unnest(generate_series(1, len(ws) - ${ShingleN - 1})) AS i
       |        FROM w))""".stripMargin

  private[queries] val minhashCtes: String = {
    val mins = graft.operators.Dedup.hashParams(K).zipWithIndex
      .map { case ((a, b), i) =>
        s"min((h * $a + $b) % ${graft.operators.Dedup.HashM}) AS mh_$i" }
      .mkString(",\n         ")
    val bandSelects = (0 until Bands).map { b =>
      val cols = (b * (K / Bands) until (b + 1) * (K / Bands)).map(i => s"mh_$i")
      s"SELECT doc_id, $b AS band, md5(concat_ws(',', ${cols.mkString(", ")})) AS bsig FROM mh"
    }.mkString("\n  UNION ALL ")
    s"""mh AS (
       |  SELECT doc_id,
       |         $mins
       |  FROM (SELECT doc_id, ${md5IntSql("sh")} AS h FROM sh) GROUP BY doc_id),
       |bands AS (
       |  $bandSelects),
       |pairs AS (
       |  SELECT DISTINCT x.doc_id AS id_a, y.doc_id AS id_b
       |  FROM bands x JOIN bands y
       |    ON x.band = y.band AND x.bsig = y.bsig AND x.doc_id < y.doc_id)""".stripMargin
  }

  val all: Seq[Q] = Seq(

    // MinHash + LSH candidate pairs: shingle → 16 seeded min-hashes →
    // 4 bands → equi-join on band signature. The scalable core of fuzzy
    // dedup: no cross product anywhere.
    Q.sql("q21_minhash_lsh_pairs",
      s"""$shingleCte,
         |$minhashCtes
         |SELECT id_a, id_b FROM pairs ORDER BY id_a, id_b""".stripMargin) { (s, d) =>
      val sh = Dedup.shingleTable(Tables.documents(s, d), "doc_id", "text", ShingleN)
      // sketch-aggregate variant (TypedImperativeAggregate) — the DuckDB
      // oracle replays the identical signature values
      val sig = Dedup.minhashSignaturesSketch(sh, "doc_id", K)
      Dedup.lshCandidatePairs(sig, "doc_id", K, Bands)
        .orderBy("id_a", "id_b")
    },

    // Exact n-gram Jaccard over the LSH candidates (verification stage of
    // the dedup pipeline) — candidates only, never all pairs.
    Q.sql("q22_ngram_jaccard",
      s"""$shingleCte,
         |$minhashCtes,
         |sz AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY 1),
         |inter AS (
         |  SELECT p.id_a, p.id_b, count(*) AS inter
         |  FROM pairs p
         |  JOIN sh a ON a.doc_id = p.id_a
         |  JOIN sh b ON b.doc_id = p.id_b AND b.sh = a.sh
         |  GROUP BY 1, 2)
         |SELECT i.id_a, i.id_b,
         |       floor((CAST(i.inter AS DOUBLE) * 1.0 / (sa.sz + sb.sz - i.inter)) * 10000 + 0.5) / 10000 AS jaccard
         |FROM inter i
         |JOIN sz sa ON sa.doc_id = i.id_a
         |JOIN sz sb ON sb.doc_id = i.id_b
         |WHERE CAST(i.inter AS DOUBLE) * 1.0 / (sa.sz + sb.sz - i.inter) >= 0.2
         |ORDER BY id_a, id_b""".stripMargin) { (s, d) =>
      // sh fans out to the signature aggregation and both jaccard join
      // sides — persist so the scan+explode runs once.
      val sh = Dedup.shingleTable(Tables.documents(s, d), "doc_id", "text", ShingleN)
        .persist()
      val sig = Dedup.minhashSignatures(sh, "doc_id", K)
      val pairs = Dedup.lshCandidatePairs(sig, "doc_id", K, Bands)
      Dedup.jaccardForPairs(pairs, sh, "doc_id")
        .where(col("jaccard") >= 0.2)
        .select(col("id_a"), col("id_b"), dround(col("jaccard"), 4).as("jaccard"))
        .orderBy("id_a", "id_b")
    },

    // SimHash signatures: 32-bit bitwise-majority over token hashes.
    Q.sql("q23_simhash", {
      val sums = (0 until SimBits)
        .map(j => s"sum(CASE WHEN ((h >> $j) & 1) = 1 THEN 1 ELSE -1 END) AS b_$j")
        .mkString(",\n         ")
      val sig = (0 until SimBits)
        .map(j => s"(CASE WHEN b_$j > 0 THEN ${1L << j} ELSE 0 END)")
        .mkString(" + ")
      s"""WITH w AS (
         |  SELECT doc_id,
         |         CASE WHEN length(trim(text)) = 0 THEN CAST([] AS VARCHAR[])
         |              ELSE string_split_regex(trim(text), '\\s+') END AS ws
         |  FROM documents),
         |tok AS (SELECT DISTINCT doc_id, unnest(ws) AS tok FROM w),
         |h AS (SELECT doc_id, ${md5IntSql("tok")} AS h FROM tok),
         |b AS (
         |  SELECT doc_id,
         |         $sums
         |  FROM h GROUP BY doc_id)
         |SELECT doc_id, $sig AS simhash FROM b ORDER BY doc_id""".stripMargin
    }) { (s, d) =>
      Dedup.simhashSignatures(Tables.documents(s, d), "doc_id", "text", SimBits)
        .orderBy("doc_id")
    },

    // SimHash near-dup pairs via byte-block banding + hamming filter.
    Q.sql("q24_simhash_pairs", {
      val sums = (0 until SimBits)
        .map(j => s"sum(CASE WHEN ((h >> $j) & 1) = 1 THEN 1 ELSE -1 END) AS b_$j")
        .mkString(",\n         ")
      val sigExpr = (0 until SimBits)
        .map(j => s"(CASE WHEN b_$j > 0 THEN ${1L << j} ELSE 0 END)")
        .mkString(" + ")
      val r = SimBits / SimBands
      val mask = (1L << r) - 1
      val bandSelects = (0 until SimBands)
        .map(b => s"SELECT doc_id, $b AS band, (simhash >> ${b * r}) & $mask AS bsig FROM sig")
        .mkString("\n  UNION ALL ")
      s"""WITH w AS (
         |  SELECT doc_id,
         |         CASE WHEN length(trim(text)) = 0 THEN CAST([] AS VARCHAR[])
         |              ELSE string_split_regex(trim(text), '\\s+') END AS ws
         |  FROM documents),
         |tok AS (SELECT DISTINCT doc_id, unnest(ws) AS tok FROM w),
         |h AS (SELECT doc_id, ${md5IntSql("tok")} AS h FROM tok),
         |b AS (SELECT doc_id, $sums FROM h GROUP BY doc_id),
         |sig AS (SELECT doc_id, $sigExpr AS simhash FROM b),
         |bands AS (
         |  $bandSelects),
         |cand AS (
         |  SELECT DISTINCT x.doc_id AS id_a, y.doc_id AS id_b
         |  FROM bands x JOIN bands y
         |    ON x.band = y.band AND x.bsig = y.bsig AND x.doc_id < y.doc_id)
         |SELECT c.id_a, c.id_b,
         |       CAST(bit_count(xor(sa.simhash, sb.simhash)) AS INTEGER) AS hamming
         |FROM cand c
         |JOIN sig sa ON sa.doc_id = c.id_a
         |JOIN sig sb ON sb.doc_id = c.id_b
         |WHERE bit_count(xor(sa.simhash, sb.simhash)) <= $MaxHamming
         |ORDER BY id_a, id_b""".stripMargin
    }) { (s, d) =>
      val sig = Dedup.simhashSignatures(Tables.documents(s, d), "doc_id", "text", SimBits)
      Dedup.simhashPairs(sig, "doc_id", SimBits, SimBands, MaxHamming)
        .select(col("id_a"), col("id_b"), col("hamming").cast("int").as("hamming"))
        .orderBy("id_a", "id_b")
    },

    // Duplicate-cluster resolution: connected components over the
    // jaccard-verified pair set (near-duplication is transitive in practice;
    // pair output is not). The oracle replays the full pipeline and closes
    // the pairs transitively with a recursive CTE; min reachable id is the
    // same cluster label Spark's min-label propagation converges to.
    Q.sql("q40_dup_clusters",
      s"""WITH RECURSIVE ${shingleCte.stripPrefix("WITH ")},
         |$minhashCtes,
         |sz AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY 1),
         |inter AS (
         |  SELECT p.id_a, p.id_b, count(*) AS inter
         |  FROM pairs p
         |  JOIN sh a ON a.doc_id = p.id_a
         |  JOIN sh b ON b.doc_id = p.id_b AND b.sh = a.sh
         |  GROUP BY 1, 2),
         |dup AS (
         |  SELECT i.id_a, i.id_b FROM inter i
         |  JOIN sz sa ON sa.doc_id = i.id_a
         |  JOIN sz sb ON sb.doc_id = i.id_b
         |  WHERE CAST(i.inter AS DOUBLE) * 1.0 / (sa.sz + sb.sz - i.inter) >= 0.2),
         |edges AS (SELECT id_a AS src, id_b AS dst FROM dup
         |          UNION SELECT id_b, id_a FROM dup),
         |reach AS (
         |  SELECT src AS id, src AS r FROM edges
         |  UNION
         |  SELECT e.src, t.r FROM edges e JOIN reach t ON t.id = e.dst)
         |SELECT id AS doc_id, min(r) AS cluster_id
         |FROM reach GROUP BY id ORDER BY doc_id""".stripMargin) { (s, d) =>
      val sh = Dedup.shingleTable(Tables.documents(s, d), "doc_id", "text", ShingleN)
        .persist()
      val sig = Dedup.minhashSignatures(sh, "doc_id", K)
      val cand = Dedup.lshCandidatePairs(sig, "doc_id", K, Bands)
      val dup = Dedup.jaccardForPairs(cand, sh, "doc_id")
        .where(col("jaccard") >= 0.2).select("id_a", "id_b")
      Dedup.duplicateClusters(dup)
        .select(col("id").as("doc_id"), col("cluster_id"))
        .orderBy("doc_id")
    },

    // Substring-level exact dedup (Lee et al. repeated-sequence removal):
    // duplicated ≥8-token runs keep their corpus-wide first occurrence and
    // are removed everywhere else. The oracle replays the span selection
    // (row_number over (doc,pos) per span hash = the min-struct first
    // occurrence), coverage explosion, and token-level reconstruction.
    Q.sql("q90_substring_dedup", {
      val K = SubstrK
      s"""WITH w AS (
         |  SELECT doc_id,
         |         CASE WHEN length(trim(text)) = 0 THEN CAST([] AS VARCHAR[])
         |              ELSE string_split_regex(trim(text), '\\s+') END AS ws
         |  FROM documents),
         |sp AS (
         |  SELECT doc_id, i AS pos, md5(array_to_string(ws[i:i+${K - 1}], ' ')) AS h
         |  FROM (SELECT doc_id, ws, unnest(generate_series(1, len(ws) - ${K - 1})) AS i FROM w)),
         |dup AS (
         |  SELECT doc_id, pos
         |  FROM (SELECT doc_id, pos,
         |               row_number() OVER (PARTITION BY h ORDER BY doc_id, pos) AS rn
         |        FROM sp)
         |  WHERE rn > 1),
         |cov AS (
         |  SELECT DISTINCT doc_id, unnest(generate_series(pos, pos + ${K - 1})) AS cp FROM dup),
         |covagg AS (SELECT doc_id, count(*) AS n_dropped FROM cov GROUP BY doc_id),
         |tok AS (SELECT doc_id, i AS pos, ws[i] AS tok
         |        FROM (SELECT doc_id, ws, unnest(generate_series(1, len(ws))) AS i FROM w)),
         |kept AS (
         |  SELECT t.doc_id, t.pos, t.tok
         |  FROM tok t LEFT JOIN cov c ON c.doc_id = t.doc_id AND c.cp = t.pos
         |  WHERE c.doc_id IS NULL),
         |rec AS (SELECT doc_id, string_agg(tok, ' ' ORDER BY pos) AS clean_text
         |        FROM kept GROUP BY doc_id)
         |SELECT w.doc_id AS doc_id,
         |       coalesce(r.clean_text, '') AS clean_text,
         |       CAST(coalesce(ca.n_dropped, 0) AS BIGINT) AS n_dropped
         |FROM w LEFT JOIN rec r ON r.doc_id = w.doc_id
         |LEFT JOIN covagg ca ON ca.doc_id = w.doc_id
         |ORDER BY w.doc_id""".stripMargin
    }) { (s, d) =>
      Dedup.dedupSubstrings(Tables.documents(s, d), "doc_id", "text", SubstrK)
        .orderBy("doc_id")
    },

    // Incremental substring dedup: the daily-ingest form of q90 — batch
    // docs (doc_id % 3 = 0) trimmed against the historical span index
    // (hash membership = covered; index-novel spans keep their batch-first
    // occurrence). History never rescans; the oracle replays both rules.
    Q.sql("q101_substring_dedup_incremental", {
      val K = SubstrK
      s"""WITH w AS (
         |  SELECT doc_id,
         |         CASE WHEN length(trim(text)) = 0 THEN CAST([] AS VARCHAR[])
         |              ELSE string_split_regex(trim(text), '\\s+') END AS ws
         |  FROM documents),
         |sp AS (
         |  SELECT doc_id, i AS pos, md5(array_to_string(ws[i:i+${K - 1}], ' ')) AS h
         |  FROM (SELECT doc_id, ws, unnest(generate_series(1, len(ws) - ${K - 1})) AS i FROM w)),
         |hist AS (SELECT DISTINCT h FROM sp WHERE doc_id % 3 <> 0),
         |bsp AS (SELECT doc_id, pos, h FROM sp WHERE doc_id % 3 = 0),
         |covidx AS (SELECT doc_id, pos FROM bsp WHERE h IN (SELECT h FROM hist)),
         |novel AS (SELECT doc_id, pos, h FROM bsp WHERE h NOT IN (SELECT h FROM hist)),
         |noveldup AS (
         |  SELECT doc_id, pos FROM (
         |    SELECT doc_id, pos,
         |           row_number() OVER (PARTITION BY h ORDER BY doc_id, pos) AS rn
         |    FROM novel) WHERE rn > 1),
         |dup AS (SELECT * FROM covidx UNION ALL SELECT * FROM noveldup),
         |cov AS (
         |  SELECT DISTINCT doc_id, unnest(generate_series(pos, pos + ${K - 1})) AS cp FROM dup),
         |covagg AS (SELECT doc_id, count(*) AS n_dropped FROM cov GROUP BY doc_id),
         |tok AS (SELECT doc_id, i AS pos, ws[i] AS tok
         |        FROM (SELECT doc_id, ws, unnest(generate_series(1, len(ws))) AS i
         |              FROM w WHERE doc_id % 3 = 0)),
         |kept AS (
         |  SELECT t.doc_id, t.pos, t.tok
         |  FROM tok t LEFT JOIN cov c ON c.doc_id = t.doc_id AND c.cp = t.pos
         |  WHERE c.doc_id IS NULL),
         |rec AS (SELECT doc_id, string_agg(tok, ' ' ORDER BY pos) AS clean_text
         |        FROM kept GROUP BY doc_id)
         |SELECT b.doc_id AS doc_id,
         |       coalesce(r.clean_text, '') AS clean_text,
         |       CAST(coalesce(ca.n_dropped, 0) AS BIGINT) AS n_dropped
         |FROM (SELECT doc_id FROM w WHERE doc_id % 3 = 0) b
         |LEFT JOIN rec r ON r.doc_id = b.doc_id
         |LEFT JOIN covagg ca ON ca.doc_id = b.doc_id
         |ORDER BY b.doc_id""".stripMargin
    }) { (s, d) =>
      val docs = Tables.documents(s, d)
      val hist = docs.where(pmod(col("doc_id"), lit(3)) =!= 0)
      val batch = docs.where(pmod(col("doc_id"), lit(3)) === 0)
      val index = Dedup.substringSpanIndex(hist, "doc_id", "text", SubstrK)
      Dedup.dedupSubstringsIncremental(batch, "doc_id", "text", SubstrK, index)
        .orderBy("doc_id")
    },

    // EXACT set-similarity self-join via prefix filtering (AllPairs/PPJoin):
    // guaranteed-complete candidates (vs LSH's probabilistic recall), then
    // the shared exact-Jaccard verify. Prefix arithmetic is integer-exact
    // (t = 1/2 as a rational); the rarity-first global order makes prefix
    // tokens the low-df ones, so the candidate equi-join stays selective.
    Q.sql("q98_similarity_join",
      s"""$shingleCte,
         |dfq AS (SELECT sh, count(*) AS df FROM sh GROUP BY 1),
         |szq AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY 1),
         |rk AS (
         |  SELECT s.doc_id, s.sh, z.sz,
         |         row_number() OVER (PARTITION BY s.doc_id ORDER BY d.df, s.sh) AS rn
         |  FROM sh s JOIN dfq d ON d.sh = s.sh JOIN szq z ON z.doc_id = s.doc_id),
         |pf AS (SELECT doc_id, sh FROM rk
         |       WHERE rn <= sz - ((sz * $SimTNum + ${SimTDen - 1}) // $SimTDen) + 1),
         |cand AS (SELECT DISTINCT x.doc_id AS id_a, y.doc_id AS id_b
         |         FROM pf x JOIN pf y ON x.sh = y.sh AND x.doc_id < y.doc_id),
         |inter AS (
         |  SELECT c.id_a, c.id_b, count(*) AS inter
         |  FROM cand c
         |  JOIN sh a ON a.doc_id = c.id_a
         |  JOIN sh b ON b.doc_id = c.id_b AND b.sh = a.sh
         |  GROUP BY 1, 2)
         |SELECT i.id_a, i.id_b,
         |       floor((CAST(i.inter AS DOUBLE) * 1.0 / (sa.sz + sb.sz - i.inter)) * 10000 + 0.5) / 10000 AS jaccard
         |FROM inter i
         |JOIN szq sa ON sa.doc_id = i.id_a
         |JOIN szq sb ON sb.doc_id = i.id_b
         |WHERE CAST(i.inter AS DOUBLE) * 1.0 / (sa.sz + sb.sz - i.inter) >= 0.5
         |ORDER BY id_a, id_b""".stripMargin) { (s, d) =>
      val sh = Dedup.shingleTable(Tables.documents(s, d), "doc_id", "text", ShingleN)
        .persist()
      val cand = Dedup.prefixFilterPairs(sh, "doc_id", SimTNum, SimTDen)
      Dedup.jaccardForPairs(cand, sh, "doc_id")
        .where(col("jaccard") >= 0.5)
        .select(col("id_a"), col("id_b"), dround(col("jaccard"), 4).as("jaccard"))
        .orderBy("id_a", "id_b")
    },

    // Blocked fuzzy matching (ops.Fuzzy): edit-distance pairs within a
    // brand block — record linkage as an equi-join plus a length-band
    // prune, never a corpus cross product. Levenshtein is the classic
    // dynamic-programming distance in both engines.
    Q.sql("q65_fuzzy_pairs",
      """SELECT a.p_brand AS block, a.p_partkey AS id_a, b.p_partkey AS id_b,
        |       a.p_name AS str_a, b.p_name AS str_b,
        |       CAST(levenshtein(a.p_name, b.p_name) AS INTEGER) AS dist
        |FROM part a JOIN part b
        |  ON a.p_brand = b.p_brand AND a.p_partkey < b.p_partkey
        |WHERE levenshtein(a.p_name, b.p_name) <= 2
        |ORDER BY id_a, id_b""".stripMargin) { (s, d) =>
      graft.ops.Fuzzy.blockedSelfJoin(Tables.part(s, d), "p_partkey",
          "p_name", "p_brand", maxDist = 2)
        .select(col("block"), col("id_a"), col("id_b"),
          col("str_a"), col("str_b"), col("dist"))
        .orderBy("id_a", "id_b")
    },

    // End-to-end entity resolution: q65's blocked fuzzy pairs become edges,
    // connected components resolve transitive matches (q40's operator), and
    // every part maps to a canonical entity (its cluster's min id;
    // singletons are their own entity). The oracle recurses over the same
    // levenshtein pair set — transitive closure, min reachable id.
    Q.sql("q85_entity_resolution",
      """WITH RECURSIVE dup AS (
        |  SELECT a.p_partkey AS id_a, b.p_partkey AS id_b
        |  FROM part a JOIN part b
        |    ON a.p_brand = b.p_brand AND a.p_partkey < b.p_partkey
        |  WHERE levenshtein(a.p_name, b.p_name) <= 2),
        |edges AS (SELECT id_a AS src, id_b AS dst FROM dup
        |          UNION SELECT id_b, id_a FROM dup),
        |reach AS (
        |  SELECT src AS id, src AS r FROM edges
        |  UNION
        |  SELECT e.src, t.r FROM edges e JOIN reach t ON t.id = e.dst),
        |cl AS (SELECT id, min(r) AS cluster_id FROM reach GROUP BY id)
        |SELECT p.p_partkey AS id,
        |       coalesce(cl.cluster_id, p.p_partkey) AS entity_id,
        |       CAST(CASE WHEN coalesce(cl.cluster_id, p.p_partkey) = p.p_partkey
        |            THEN 1 ELSE 0 END AS INTEGER) AS is_canonical
        |FROM part p LEFT JOIN cl ON cl.id = p.p_partkey
        |ORDER BY id""".stripMargin) { (s, d) =>
      val parts = Tables.part(s, d)
      val pairs = graft.ops.Fuzzy.blockedSelfJoin(parts, "p_partkey",
        "p_name", "p_brand", maxDist = 2)
      val clusters = Dedup.duplicateClusters(pairs.select("id_a", "id_b"))
      parts.select(col("p_partkey").as("id"))
        .join(clusters, Seq("id"), "left")
        .select(col("id"),
          coalesce(col("cluster_id"), col("id")).as("entity_id"))
        .withColumn("is_canonical",
          (col("entity_id") === col("id")).cast("int"))
        .orderBy("id")
    },

    // q51's incremental ingest dedup, with the historical fingerprint index
    // read from a BUCKETED-on-fp managed table instead of an in-flight
    // frame — the daily-driver storage composition (Dedup.writeIndexBucketed
    // scaladoc): the index side of the anti-join carries no Exchange, only
    // the batch shuffles. Identical semantics ⇒ identical oracle to q51;
    // the hash-exact match IS the proof bucketed storage changes cost only.
    Q.sql("q102_bucketed_index_dedup",
      """WITH fp AS (
        |  SELECT doc_id,
        |         md5(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'), '\s+', ' ', 'g'))) AS fp
        |  FROM documents),
        |idx AS (SELECT DISTINCT fp FROM fp WHERE doc_id % 5 = 0),
        |batch AS (SELECT doc_id, fp FROM fp WHERE doc_id % 5 <> 0),
        |novel AS (
        |  SELECT b.doc_id, b.fp FROM batch b
        |  WHERE NOT EXISTS (SELECT 1 FROM idx i WHERE i.fp = b.fp)),
        |best AS (
        |  SELECT doc_id, fp,
        |         row_number() OVER (PARTITION BY fp ORDER BY doc_id) AS rn
        |  FROM novel)
        |SELECT doc_id, fp FROM best WHERE rn = 1 ORDER BY doc_id""".stripMargin) { (s, d) =>
      val docs = Tables.documents(s, d)
      val index = docs.where(pmod(col("doc_id"), lit(5)) === 0)
        .select(graft.functions.TextFunctions.fingerprint(col("text")).as("fp"))
        .distinct()
      Dedup.writeIndexBucketed(index, "graft_fp_index", "fp", numBuckets = 8)
      Dedup.dedupeAgainstIndex(
          docs.where(pmod(col("doc_id"), lit(5)) =!= 0)
            .select("doc_id", "text"),
          "doc_id", "text", s.table("graft_fp_index"))
        .select("doc_id", "fp")
        .orderBy("doc_id")
    },

    // q101's incremental substring dedup with the span index read from a
    // BUCKETED-on-h managed table (same composition as q102): both the
    // covered-span semi-join and the novelty anti-join consume the 100 TB
    // history side with no Exchange. Same oracle as q101.
    Q.sql("q103_bucketed_span_dedup", {
      val K = SubstrK
      s"""WITH w AS (
         |  SELECT doc_id,
         |         CASE WHEN length(trim(text)) = 0 THEN CAST([] AS VARCHAR[])
         |              ELSE string_split_regex(trim(text), '\\s+') END AS ws
         |  FROM documents),
         |sp AS (
         |  SELECT doc_id, i AS pos, md5(array_to_string(ws[i:i+${K - 1}], ' ')) AS h
         |  FROM (SELECT doc_id, ws, unnest(generate_series(1, len(ws) - ${K - 1})) AS i FROM w)),
         |hist AS (SELECT DISTINCT h FROM sp WHERE doc_id % 3 <> 0),
         |bsp AS (SELECT doc_id, pos, h FROM sp WHERE doc_id % 3 = 0),
         |covidx AS (SELECT doc_id, pos FROM bsp WHERE h IN (SELECT h FROM hist)),
         |novel AS (SELECT doc_id, pos, h FROM bsp WHERE h NOT IN (SELECT h FROM hist)),
         |noveldup AS (
         |  SELECT doc_id, pos FROM (
         |    SELECT doc_id, pos,
         |           row_number() OVER (PARTITION BY h ORDER BY doc_id, pos) AS rn
         |    FROM novel) WHERE rn > 1),
         |dup AS (SELECT * FROM covidx UNION ALL SELECT * FROM noveldup),
         |cov AS (
         |  SELECT DISTINCT doc_id, unnest(generate_series(pos, pos + ${K - 1})) AS cp FROM dup),
         |covagg AS (SELECT doc_id, count(*) AS n_dropped FROM cov GROUP BY doc_id),
         |tok AS (SELECT doc_id, i AS pos, ws[i] AS tok
         |        FROM (SELECT doc_id, ws, unnest(generate_series(1, len(ws))) AS i
         |              FROM w WHERE doc_id % 3 = 0)),
         |kept AS (
         |  SELECT t.doc_id, t.pos, t.tok
         |  FROM tok t LEFT JOIN cov c ON c.doc_id = t.doc_id AND c.cp = t.pos
         |  WHERE c.doc_id IS NULL),
         |rec AS (SELECT doc_id, string_agg(tok, ' ' ORDER BY pos) AS clean_text
         |        FROM kept GROUP BY doc_id)
         |SELECT b.doc_id AS doc_id,
         |       coalesce(r.clean_text, '') AS clean_text,
         |       CAST(coalesce(ca.n_dropped, 0) AS BIGINT) AS n_dropped
         |FROM (SELECT doc_id FROM w WHERE doc_id % 3 = 0) b
         |LEFT JOIN rec r ON r.doc_id = b.doc_id
         |LEFT JOIN covagg ca ON ca.doc_id = b.doc_id
         |ORDER BY b.doc_id""".stripMargin
    }) { (s, d) =>
      val docs = Tables.documents(s, d)
      val hist = docs.where(pmod(col("doc_id"), lit(3)) =!= 0)
      val batch = docs.where(pmod(col("doc_id"), lit(3)) === 0)
      Dedup.writeIndexBucketed(
        Dedup.substringSpanIndex(hist, "doc_id", "text", SubstrK),
        "graft_span_index", "h", numBuckets = 8)
      Dedup.dedupSubstringsIncremental(batch, "doc_id", "text", SubstrK,
          s.table("graft_span_index"))
        .orderBy("doc_id")
    },

    // Boilerplate span removal: k-token spans present in ≥ BoilerDf DISTINCT
    // docs are dropped from EVERY doc (no first-occurrence survivor) — the
    // crawl-cleaning common-sequence rule, complementing q90's keep-first
    // semantics. The oracle replays the df threshold and coverage trim.
    Q.sql("q109_boilerplate_removal", {
      val K = SubstrK
      s"""WITH w AS (
         |  SELECT doc_id,
         |         CASE WHEN length(trim(text)) = 0 THEN CAST([] AS VARCHAR[])
         |              ELSE string_split_regex(trim(text), '\\s+') END AS ws
         |  FROM documents),
         |sp AS (
         |  SELECT doc_id, i AS pos, md5(array_to_string(ws[i:i+${K - 1}], ' ')) AS h
         |  FROM (SELECT doc_id, ws, unnest(generate_series(1, len(ws) - ${K - 1})) AS i FROM w)),
         |hot AS (
         |  SELECT h FROM (SELECT h, count(DISTINCT doc_id) AS df FROM sp GROUP BY h)
         |  WHERE df >= $BoilerDf),
         |dup AS (SELECT doc_id, pos FROM sp WHERE h IN (SELECT h FROM hot)),
         |cov AS (
         |  SELECT DISTINCT doc_id, unnest(generate_series(pos, pos + ${K - 1})) AS cp FROM dup),
         |covagg AS (SELECT doc_id, count(*) AS n_dropped FROM cov GROUP BY doc_id),
         |tok AS (SELECT doc_id, i AS pos, ws[i] AS tok
         |        FROM (SELECT doc_id, ws, unnest(generate_series(1, len(ws))) AS i FROM w)),
         |kept AS (
         |  SELECT t.doc_id, t.pos, t.tok
         |  FROM tok t LEFT JOIN cov c ON c.doc_id = t.doc_id AND c.cp = t.pos
         |  WHERE c.doc_id IS NULL),
         |rec AS (SELECT doc_id, string_agg(tok, ' ' ORDER BY pos) AS clean_text
         |        FROM kept GROUP BY doc_id)
         |SELECT w.doc_id AS doc_id,
         |       coalesce(r.clean_text, '') AS clean_text,
         |       CAST(coalesce(ca.n_dropped, 0) AS BIGINT) AS n_dropped
         |FROM w LEFT JOIN rec r ON r.doc_id = w.doc_id
         |LEFT JOIN covagg ca ON ca.doc_id = w.doc_id
         |ORDER BY w.doc_id""".stripMargin
    }) { (s, d) =>
      Dedup.removeBoilerplate(Tables.documents(s, d), "doc_id", "text",
          SubstrK, BoilerDf)
        .orderBy("doc_id")
    },

    // Cluster-representative dedup: q40's near-dup clusters, but each
    // cluster keeps its BEST member by quality (n_chars desc, doc_id asc
    // tie-break) instead of the min id — the production keep-the-cleanest-
    // copy rule. The oracle closes the same pair set transitively, labels
    // singletons with their own id, and replays the argmax window.
    Q.sql("q110_dedup_keep_best_quality",
      s"""WITH RECURSIVE ${shingleCte.stripPrefix("WITH ")},
         |$minhashCtes,
         |sz AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY 1),
         |inter AS (
         |  SELECT p.id_a, p.id_b, count(*) AS inter
         |  FROM pairs p
         |  JOIN sh a ON a.doc_id = p.id_a
         |  JOIN sh b ON b.doc_id = p.id_b AND b.sh = a.sh
         |  GROUP BY 1, 2),
         |dup AS (
         |  SELECT i.id_a, i.id_b FROM inter i
         |  JOIN sz sa ON sa.doc_id = i.id_a
         |  JOIN sz sb ON sb.doc_id = i.id_b
         |  WHERE CAST(i.inter AS DOUBLE) * 1.0 / (sa.sz + sb.sz - i.inter) >= 0.2),
         |edges AS (SELECT id_a AS src, id_b AS dst FROM dup
         |          UNION SELECT id_b, id_a FROM dup),
         |reach AS (
         |  SELECT src AS id, src AS r FROM edges
         |  UNION
         |  SELECT e.src, t.r FROM edges e JOIN reach t ON t.id = e.dst),
         |cl AS (SELECT id, min(r) AS cluster_id FROM reach GROUP BY id),
         |lab AS (
         |  SELECT d.doc_id, coalesce(cl.cluster_id, d.doc_id) AS c, d.n_chars
         |  FROM documents d LEFT JOIN cl ON cl.id = d.doc_id),
         |keep AS (
         |  SELECT doc_id, n_chars,
         |         row_number() OVER (PARTITION BY c ORDER BY n_chars DESC, doc_id) AS rn
         |  FROM lab)
         |SELECT doc_id, CAST(n_chars AS BIGINT) AS n_chars
         |FROM keep WHERE rn = 1 ORDER BY doc_id""".stripMargin) { (s, d) =>
      val docs = Tables.documents(s, d)
      val sh = Dedup.shingleTable(docs, "doc_id", "text", ShingleN).persist()
      val sig = Dedup.minhashSignatures(sh, "doc_id", K)
      val cand = Dedup.lshCandidatePairs(sig, "doc_id", K, Bands)
      val pairs = Dedup.jaccardForPairs(cand, sh, "doc_id")
        .where(col("jaccard") >= 0.2).select("id_a", "id_b")
      Dedup.dedupCorpusKeepBest(docs, "doc_id", pairs, col("n_chars"))
        .select("doc_id", "n_chars")
        .orderBy("doc_id")
    },

    // Train/eval split-leakage audit: a hash-based 90/10 split (q43's
    // deterministic membership) is crossed with the MinHash-LSH near-dup
    // pairs (q21's candidates) — any pair straddling the split is
    // train→eval leakage that a row-level splitter cannot see. The report
    // pins the pair count, the leaky subset, and the exact set of
    // contaminated eval docs (id_sum). Scale: the pair table is the
    // banded LSH join (never all-pairs); the split column is a map-side
    // pure function of doc_id.
    Q.sql("q154_split_leakage",
      s"""$shingleCte,
         |$minhashCtes,
         |sp AS (
         |  SELECT doc_id,
         |         CASE WHEN ${md5IntSql("'split:' || CAST(doc_id AS VARCHAR)")} % 100 < 90
         |              THEN 'train' ELSE 'eval' END AS split
         |  FROM documents),
         |j AS (
         |  SELECT p.id_a, p.id_b, sa.split AS split_a, sb.split AS split_b
         |  FROM pairs p
         |  JOIN sp sa ON sa.doc_id = p.id_a
         |  JOIN sp sb ON sb.doc_id = p.id_b),
         |leaky_eval AS (
         |  SELECT DISTINCT CASE WHEN split_a = 'eval' THEN id_a ELSE id_b END AS eid
         |  FROM j WHERE split_a <> split_b)
         |SELECT (SELECT count(*) FROM j) AS n_pairs,
         |       (SELECT count(*) FROM j WHERE split_a <> split_b) AS n_leaky_pairs,
         |       (SELECT count(*) FROM leaky_eval) AS n_eval_contaminated,
         |       (SELECT COALESCE(CAST(SUM(eid) AS BIGINT), 0) FROM leaky_eval)
         |         AS eval_id_sum""".stripMargin) { (s, d) =>
      val docs = Tables.documents(s, d)
      val sh = Dedup.shingleTable(docs, "doc_id", "text", ShingleN)
      val sig = Dedup.minhashSignaturesSketch(sh, "doc_id", K)
      val pairs = Dedup.lshCandidatePairs(sig, "doc_id", K, Bands)
      val split = when(
        pmod(graft.functions.TextFunctions.md5Int(
          concat(lit("split:"), col("doc_id").cast("string"))), lit(100L)) < 90,
        "train").otherwise("eval")
      val sp = docs.select(col("doc_id"), split.as("split"))
      val j = pairs
        .join(sp.select(col("doc_id").as("id_a"), col("split").as("split_a")), "id_a")
        .join(sp.select(col("doc_id").as("id_b"), col("split").as("split_b")), "id_b")
      val leaky = j.where(col("split_a") =!= col("split_b"))
        .select(when(col("split_a") === "eval", col("id_a"))
          .otherwise(col("id_b")).as("eid"))
        .distinct()
      val base = j.agg(
        count(lit(1)).as("n_pairs"),
        sum(when(col("split_a") =!= col("split_b"), 1L).otherwise(0L))
          .as("n_leaky_pairs"))
      val evalSide = leaky.agg(
        count(lit(1)).as("n_eval_contaminated"),
        coalesce(sum(col("eid")), lit(0L)).as("eval_id_sum"))
      base.crossJoin(evalSide)
    },

    // MinHash-LSH candidate-quality eval (the q199 eval discipline
    // applied to dedup): precision/recall of the q21 banded candidates
    // against the EXACT jaccard-≥0.5 pair set — the dedup-decision
    // threshold (q98's): the recall that matters is "no missed
    // near-dup at the threshold we delete at". (Evaluating at 0.2
    // measured 10 s at sf0.1: a 1/5 threshold makes AllPairs prefixes
    // cover ~80% of every document — the documented prefix-length/
    // threshold trade, and exactly why the engine dedups at 0.5.)
    // The Spark truth side runs the prefix-filtered exact join; the
    // ORACLE computes truth from the unfiltered all-co-shingled-pairs
    // join — so a prefix filter that dropped a true pair would hash-fail,
    // verifying the filter's losslessness along the way. Single report
    // row: candidate volume, truth volume, hits, precision, recall.
    Q.sql("q202_lsh_dedup_eval", {
      val tau = "0.5"
      s"""$shingleCte,
         |$minhashCtes,
         |sz AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY 1),
         |inter AS (
         |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS inter
         |  FROM sh a JOIN sh b ON b.sh = a.sh AND a.doc_id < b.doc_id
         |  GROUP BY 1, 2),
         |truth AS (
         |  SELECT i.id_a, i.id_b FROM inter i
         |  JOIN sz sa ON sa.doc_id = i.id_a
         |  JOIN sz sb ON sb.doc_id = i.id_b
         |  WHERE CAST(i.inter AS DOUBLE) * 1.0
         |        / (sa.sz + sb.sz - i.inter) >= $tau),
         |hits AS (SELECT p.id_a FROM pairs p
         |         JOIN truth t ON t.id_a = p.id_a AND t.id_b = p.id_b),
         |m AS (SELECT (SELECT count(*) FROM pairs) AS n_cand,
         |             (SELECT count(*) FROM truth) AS n_true,
         |             (SELECT count(*) FROM hits) AS n_hit)
         |SELECT CAST(n_cand AS BIGINT) AS n_cand,
         |       CAST(n_true AS BIGINT) AS n_true,
         |       CAST(n_hit AS BIGINT) AS n_hit,
         |       floor(CAST(n_hit AS DOUBLE) / n_cand * 1e6 + 0.5) / 1e6
         |         AS precision,
         |       floor(CAST(n_hit AS DOUBLE) / n_true * 1e6 + 0.5) / 1e6
         |         AS recall
         |FROM m""".stripMargin
    }) { (s, d) =>
      val sh = Dedup.shingleTable(Tables.documents(s, d), "doc_id", "text",
        ShingleN).persist()
      val sig = Dedup.minhashSignaturesSketch(sh, "doc_id", K)
      val cand = Dedup.lshCandidatePairs(sig, "doc_id", K, Bands)
      val truth = Dedup.jaccardForPairs(
          Dedup.prefixFilterPairs(sh, "doc_id", SimTNum, SimTDen), sh,
          "doc_id")
        .where(col("jaccard") >= 0.5)
        .select("id_a", "id_b")
      // ONE evaluation of each side (guide §2.4 — remove duplicated
      // subtrees): the counts and the hit count come from a single
      // full-outer join of the two DISTINCT pair sets + one aggregate.
      // The previous shape (hits join + separate count() per side)
      // evaluated the whole candidate pipeline and the whole exact-truth
      // verify pipeline TWICE each — 170 Exchanges in the plan, measured
      // 5.77 s; this form has each pipeline once (~half the Exchanges).
      cand.withColumn("__c", lit(1))
        .join(truth.withColumn("__t", lit(1)),
          Seq("id_a", "id_b"), "full_outer")
        .agg(count(col("__c")).as("n_cand"),
          count(col("__t")).as("n_true"),
          count(when(col("__c").isNotNull && col("__t").isNotNull, 1))
            .as("n_hit"))
        .select(col("n_cand"), col("n_true"), col("n_hit"),
          dround(col("n_hit").cast("double") / col("n_cand"), 6)
            .as("precision"),
          dround(col("n_hit").cast("double") / col("n_true"), 6)
            .as("recall"))
    },

    // Bounded-memory variant of the q202 eval (VERDICT r8 item 2): both the
    // LSH candidate set and the exact-truth pipeline are filtered by the
    // SAME deterministic pair-hash predicate (Dedup.pairSample — in-sample
    // on both sides or neither, so sampled precision/recall estimate the
    // full-set ratios without bias), and the estimate ships with its 95%
    // binomial CI. The point is WHERE the predicate sits: before the verify
    // join, so the pair-grain working set (shingle-array rows, agg state)
    // is 1/mod of the full eval's at any scale — the full q202 at sf10 ran
    // hot against the single-JVM heap; this form is the fixed-memory eval
    // you run at 100 TB. The oracle computes truth from the UNFILTERED
    // all-co-shingled-pairs join and applies the identical predicate, so
    // the prefix filter's losslessness is still hash-verified in-sample.
    Q.sql("q216_lsh_dedup_eval_sampled", lshEvalSampledOracle) { (s, d) =>
      val sh = Dedup.shingleTable(Tables.documents(s, d), "doc_id", "text",
        ShingleN).persist()
      val sig = Dedup.minhashSignaturesSketch(sh, "doc_id", K)
      val cand = Dedup.lshCandidatePairs(sig, "doc_id", K, Bands)
        .where(Dedup.pairSample(EvalSampleMod))
      val truth = Dedup.jaccardForPairs(
          Dedup.prefixFilterPairs(sh, "doc_id", SimTNum, SimTDen)
            .where(Dedup.pairSample(EvalSampleMod)), sh, "doc_id")
        .where(col("jaccard") >= 0.5)
        .select("id_a", "id_b")
      val rEst = col("n_hit").cast("double") / col("n_true")
      val half = lit(1.96) * sqrt(rEst * (lit(1.0) - rEst) / col("n_true"))
      // same single-pass counts as q202 (guide §2.4): full-outer join of
      // the two distinct pair sets + one aggregate, so the sampled
      // candidate and truth pipelines are each evaluated ONCE
      cand.withColumn("__c", lit(1))
        .join(truth.withColumn("__t", lit(1)),
          Seq("id_a", "id_b"), "full_outer")
        .agg(count(col("__c")).as("n_cand"),
          count(col("__t")).as("n_true"),
          count(when(col("__c").isNotNull && col("__t").isNotNull, 1))
            .as("n_hit"))
        .select(col("n_cand"), col("n_true"), col("n_hit"),
          dround(col("n_hit").cast("double") / col("n_cand"), 6)
            .as("precision"),
          dround(rEst, 6).as("recall"),
          dround(greatest(lit(0.0), rEst - half), 6).as("recall_lo"),
          dround(least(lit(1.0), rEst + half), 6).as("recall_hi"))
    },

    // Shingle-CONTAINMENT pairs: |A∩B| / |A| ≥ 0.8 with |A| ≤ |B| — the
    // asymmetric overlap Jaccard structurally misses: a short doc quoted
    // wholesale inside a long one has tiny Jaccard (union is the long
    // doc) but containment ≈ 1, and it is exactly the quote-inclusion /
    // subset-duplicate case curation must catch (the pairwise sibling of
    // q90's substring spans). Same co-shingled equi-join shape as q22 —
    // candidates only through a shared shingle, never all pairs.
    Q.sql("q209_containment_pairs",
      s"""$shingleCte,
         |sz AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY 1),
         |inter AS (
         |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS inter
         |  FROM sh a JOIN sh b ON b.sh = a.sh AND a.doc_id <> b.doc_id
         |  GROUP BY 1, 2),
         |c AS (
         |  SELECT i.id_a AS contained, i.id_b AS container, i.inter,
         |         sa.sz AS sz_a,
         |         floor(CAST(i.inter AS DOUBLE) / sa.sz * 1e4 + 0.5) / 1e4
         |           AS containment
         |  FROM inter i
         |  JOIN sz sa ON sa.doc_id = i.id_a
         |  JOIN sz sb ON sb.doc_id = i.id_b
         |  WHERE sa.sz <= sb.sz
         |    AND CAST(i.inter AS DOUBLE) / sa.sz >= 0.8)
         |SELECT contained, container, CAST(inter AS BIGINT) AS n_shared,
         |       containment
         |FROM c ORDER BY 1, 2""".stripMargin) { (s, d) =>
      val sh = Dedup.shingleTable(Tables.documents(s, d), "doc_id", "text",
        ShingleN).persist()
      val sz = sh.groupBy("doc_id").agg(count(lit(1)).as("sz"))
      val inter = sh.as("a").join(sh.as("b"),
          col("a.sh") === col("b.sh") && col("a.doc_id") =!= col("b.doc_id"))
        .groupBy(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))
        .agg(count(lit(1)).as("inter"))
      inter
        .join(sz.select(col("doc_id").as("id_a"), col("sz").as("sz_a")), "id_a")
        .join(sz.select(col("doc_id").as("id_b"), col("sz").as("sz_b")), "id_b")
        .where(col("sz_a") <= col("sz_b") &&
          col("inter").cast("double") / col("sz_a") >= 0.8)
        .select(col("id_a").as("contained"), col("id_b").as("container"),
          col("inter").as("n_shared"),
          dround(col("inter").cast("double") / col("sz_a"), 4)
            .as("containment"))
        .orderBy("contained", "container")
    })
}
