package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.GraftColumnBridge.{column => toCol, expressionEager => toExpr}
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal}
import org.apache.spark.sql.types.{IntegerType, LongType}
import graft.functions.catalyst._

/** The SQL front door for the operator library: every text/vector/sketch
  * primitive as a session-registered SQL function, so a pure-SQL user (a
  * `spark.sql` notebook, a Thrift-server client) can run the dedup /
  * curation pipelines without touching the Scala API.
  *
  * Two activation paths, same builders:
  *  - session build time: `graft.GraftExtensions` (spark.sql.extensions)
  *    injects them alongside the planner strategy and optimizer rule;
  *  - live session: `SqlSurface.register(spark)` writes the identical
  *    builders into the running session's function registry.
  *
  * All scalar functions expand to the SAME Catalyst trees as the Column
  * API (graft.functions.TextFunctions / VectorExpressions) — built-in
  * function compositions and native codegen expressions, so SQL users get
  * whole-stage codegen, not a UDF detour. Aggregates resolve to the
  * TypedImperativeAggregate sketches; the analyzer wraps the returned
  * AggregateFunction exactly as it does for built-ins.
  */
object SqlSurface {

  /** English stopword set used by the default quality score — the same
    * list the curation queries pass explicitly. */
  val EnStopwords: Seq[String] = TextFunctions.langStopwords.head._2

  private def intArg(es: Seq[Expression], i: Int, fn: String): Int =
    es(i) match {
      case Literal(v: Int, IntegerType) => v
      case Literal(v: Long, LongType) => v.toInt
      case other => throw new IllegalArgumentException(
        s"$fn: argument ${i + 1} must be an integer literal, got $other")
    }

  /** (name, builder) for every scalar function. Arity errors surface at
    * analysis with the function name (Seq.apply throws on short args). */
  val scalarBuilders: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "graft_words" ->
      ((es: Seq[Expression]) => toExpr(TextFunctions.words(toCol(es.head)))),
    "graft_token_count" ->
      ((es: Seq[Expression]) => toExpr(TextFunctions.tokenCount(toCol(es.head)))),
    "graft_bpe_token_count" ->
      ((es: Seq[Expression]) => toExpr(TextFunctions.bpeTokenCount(toCol(es.head)))),
    "graft_md5int" ->
      ((es: Seq[Expression]) => toExpr(TextFunctions.md5Int(toCol(es.head)))),
    "graft_shingles" ->
      ((es: Seq[Expression]) => toExpr(
        TextFunctions.shingles(toCol(es.head), intArg(es, 1, "graft_shingles")))),
    "graft_fingerprint" ->
      ((es: Seq[Expression]) => toExpr(TextFunctions.fingerprint(toCol(es.head)))),
    "graft_rolling_fingerprint" ->
      ((es: Seq[Expression]) => toExpr(TextFunctions.rollingFingerprint(toCol(es.head)))),
    "graft_redact_pii" ->
      ((es: Seq[Expression]) => toExpr(TextFunctions.redactPii(toCol(es.head)))),
    "graft_lang_id" ->
      ((es: Seq[Expression]) => toExpr(TextFunctions.langId(toCol(es.head)))),
    "graft_quality_score" ->
      ((es: Seq[Expression]) => toExpr(
        TextFunctions.qualityScore(toCol(es.head), EnStopwords))),
    "dot_product" ->
      ((es: Seq[Expression]) => DotProduct(es.head, es(1))),
    "cosine_sim" ->
      ((es: Seq[Expression]) => CosineSimilarity(es.head, es(1))),
    "l2_sq" ->
      ((es: Seq[Expression]) => L2Squared(es.head, es(1))))

  /** Sketch aggregates. Builders return the AggregateFunction; the
    * analyzer wraps it in an AggregateExpression (same as built-in sum). */
  val aggregateBuilders: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "minhash_sketch" ->
      ((es: Seq[Expression]) => {
        val k = intArg(es, 1, "minhash_sketch")
        MinHashAgg(es.head, k, graft.operators.Dedup.hashParams(k),
          graft.operators.Dedup.HashM)
      }),
    "hll_sketch" ->
      ((es: Seq[Expression]) => HllSketchAgg(es.head)),
    "kmv_sketch" ->
      ((es: Seq[Expression]) => KmvSketchAgg(es.head)),
    "cms_sketch" ->
      ((es: Seq[Expression]) => CountMinAgg(es.head)))

  val all: Seq[(String, Seq[Expression] => Expression)] =
    scalarBuilders ++ aggregateBuilders

  /** Register every function into a LIVE session — the same registry
    * injectFunction writes into at build time. Idempotent (replace). */
  def register(spark: SparkSession): Unit =
    all.foreach { case (name, builder) =>
      spark.sessionState.functionRegistry
        .createOrReplaceTempFunction(name, builder, "scala_udf")
    }

  /** One-call SQL surface for the MinHash+LSH candidate pipeline: registers
    * a zero-arg SQL TABLE function `graft_lsh_candidates()` so a SQL user
    * runs the whole shingle → sketch → band → self-join pipeline as
    *
    *   SELECT id_a, id_b FROM graft_lsh_candidates()
    *
    * instead of hand-typing the 40-line CTE chain (the q212 surface).
    *
    * Parameters are REGISTRAR arguments, not SQL call arguments, by
    * necessity: Spark analyzes a SQL function body at CREATE time with
    * parameters bound as outer references, and the shingle width / sketch
    * size must be static — `graft_shingles`' width shapes the expression
    * tree and `minhash_sketch`'s k fixes the driver-side hash-parameter
    * table. So the session admin bakes (table, n, k, bands) once, exactly
    * like `register` bakes the stopword list, and every SQL caller gets
    * the one-call form. The body text is the same SQL as q212, so the plan
    * (one hash-aggregate over shingles, band equi-join, exchange reuse on
    * the SMJ path) is identical.
    *
    * Indexing several tables in one session: pass a distinct `funcName`
    * per registration — e.g. `graft_lsh_candidates_docs` over `documents`
    * and `graft_lsh_candidates_events` over an events text view. Each
    * CREATE OR REPLACE is independent temp-function state, so
    * re-registering the same name simply rebinds it (the
    * re-register-per-table pattern also works if one name is enough).
    *
    * Identifiers (funcName, table, idCol, textCol) are validated and
    * backtick-quoted into the function body — a reserved word or an
    * exotic-but-legal column name ("order", "doc id") resolves correctly
    * instead of dying as an opaque parse error at registration; embedded
    * backticks are rejected (this is an identifier surface, not an
    * injection surface).
    */
  def createLshCandidatesFunction(spark: SparkSession,
      table: String = "documents", idCol: String = "doc_id",
      textCol: String = "text", n: Int = 3, k: Int = 16,
      bands: Int = 4, funcName: String = "graft_lsh_candidates"): Unit = {
    require(k % bands == 0, s"k=$k must be divisible by bands=$bands")
    val qTable = table.split('.').map(quotePart).mkString(".")
    val qId = quotePart(idCol)
    val qText = quotePart(textCol)
    val qFunc = quotePart(funcName)
    register(spark) // the body resolves graft_* at every call-site inline
    val r = k / bands
    val bandCols = (1 to r).map(i => s"element_at(sig, band * $r + $i)")
      .mkString(", ")
    spark.sql(
      s"""CREATE OR REPLACE TEMPORARY FUNCTION $qFunc()
         |RETURNS TABLE (id_a BIGINT, id_b BIGINT)
         |RETURN
         |WITH sh AS (
         |  SELECT $qId, explode(graft_shingles($qText, $n)) AS sh
         |  FROM $qTable),
         |mh AS (
         |  SELECT $qId, minhash_sketch(graft_md5int(sh), $k) AS sig
         |  FROM sh GROUP BY $qId),
         |bands AS (
         |  SELECT $qId, band,
         |         md5(CAST(concat_ws(',', $bandCols) AS BINARY)) AS bsig
         |  FROM mh LATERAL VIEW explode(sequence(0, ${bands - 1})) AS band)
         |SELECT DISTINCT x.$qId AS id_a, y.$qId AS id_b
         |FROM bands x JOIN bands y
         |  ON x.band = y.band AND x.bsig = y.bsig AND x.$qId < y.$qId
         |""".stripMargin)
  }

  // backtick-quote one identifier PART; multi-part table names ("db.t")
  // quote each part so the qualifier still resolves
  private def quotePart(s: String): String = {
    require(s.nonEmpty && !s.contains("`"),
      s"illegal identifier part: '$s' (empty or contains a backtick)")
    "`" + s + "`"
  }

  /** One-call SQL surface for margin-based parallel-pair mining (the
    * [[createLshCandidatesFunction]] pattern applied to
    * `Similarity.marginMine`): registers `graft_margin_pairs()` so a SQL
    * user runs the whole hyperplane-bucket → cap → cosine → k-NN-average
    * → mutual-argmax pipeline as `SELECT * FROM graft_margin_pairs()`.
    *
    * `srcPred`/`tgtPred` are registrar-supplied SQL predicates over the
    * base table's columns that split it into the two sides to align
    * (e.g. `"lang = 'en'"` / `"lang = 'de'"`). Like the function body
    * itself they are trusted registration-time SQL from the session
    * admin — identifiers are quoted, predicates are not quotable.
    *
    * The hyperplane literals are the same deterministic ±1 planes as the
    * Column API (`Similarity.planeVec` — one source of constants), the
    * cosine is the registered `cosine_sim` (identical fused fold), and
    * the k-NN averages run as DECIMAL sums of 6dp-quantized cosines — so
    * the TVF's results hash-match the Column API's (q218 ≙ q217). */
  def createMarginMiningFunction(spark: SparkSession,
      table: String = "embeddings", idCol: String = "vec_id",
      vecCol: String = "embedding",
      srcPred: String = "vec_id % 2 = 0",
      tgtPred: String = "vec_id % 2 = 1",
      dims: Int = 64, nPlanes: Int = 12, nTables: Int = 6, cap: Int = 256,
      k: Int = 4, minMargin: Double = 1.0,
      funcName: String = "graft_margin_pairs"): Unit = {
    require(nPlanes <= 62, s"nPlanes=$nPlanes must fit a long bucket id")
    val qTable = table.split('.').map(quotePart).mkString(".")
    val qId = quotePart(idCol)
    val qVec = quotePart(vecCol)
    val qFunc = quotePart(funcName)
    register(spark)
    def planeLit(t: Int, p: Int): String =
      graft.operators.Similarity.planeVec(t, p, dims)
        .map(x => if (x > 0) "1.0D" else "-1.0D")
        .mkString("array(", ",", ")")
    val bandSelects = (0 until nTables).map { t =>
      val bucket = (0 until nPlanes).map { p =>
        s"(CASE WHEN dot_product(v, ${planeLit(t, p)}) > 0 THEN ${1L << p}L ELSE 0L END)"
      }.mkString(" + ")
      s"SELECT vid, side, $t AS t, CAST($bucket AS BIGINT) AS bucket FROM e"
    }.mkString("\n  UNION ALL ")
    spark.sql(
      s"""CREATE OR REPLACE TEMPORARY FUNCTION $qFunc()
         |RETURNS TABLE (src_id BIGINT, tgt_id BIGINT, cos DOUBLE, margin DOUBLE)
         |RETURN
         |WITH es AS (SELECT $qId AS vid, CAST($qVec AS ARRAY<DOUBLE>) AS v
         |            FROM $qTable WHERE $srcPred),
         |et AS (SELECT $qId AS vid, CAST($qVec AS ARRAY<DOUBLE>) AS v
         |       FROM $qTable WHERE $tgtPred),
         |e AS (SELECT vid, v, 0 AS side FROM es
         |      UNION ALL SELECT vid, v, 1 AS side FROM et),
         |b AS (
         |  $bandSelects),
         |ok AS (SELECT t, bucket FROM b GROUP BY t, bucket
         |       HAVING count(*) <= $cap),
         |c AS (SELECT b.vid, b.side, b.t, b.bucket FROM b
         |      JOIN ok ON ok.t = b.t AND ok.bucket = b.bucket),
         |cand AS (
         |  SELECT DISTINCT x.vid AS src_id, y.vid AS tgt_id
         |  FROM c x JOIN c y ON x.t = y.t AND x.bucket = y.bucket
         |  WHERE x.side = 0 AND y.side = 1),
         |s0 AS (
         |  SELECT cand.src_id, cand.tgt_id,
         |         floor(cosine_sim(ae.v, be.v) * 1000000 + 0.5) / 1000000 AS cos
         |  FROM cand
         |  JOIN es ae ON ae.vid = cand.src_id
         |  JOIN et be ON be.vid = cand.tgt_id),
         |s AS (SELECT * FROM s0 WHERE cos > 0),
         |w AS (
         |  -- one pass over the pair frame: a SQL body has no persist
         |  -- point, so the aggregate-join formulation would recompute
         |  -- the whole candidate pipeline per reference (measured 2x);
         |  -- window aggregates keep it a single scan + per-side sorts
         |  SELECT src_id, tgt_id, cos,
         |         row_number() OVER (PARTITION BY src_id
         |                            ORDER BY cos DESC, tgt_id) AS rn_s,
         |         row_number() OVER (PARTITION BY tgt_id
         |                            ORDER BY cos DESC, src_id) AS rn_t
         |  FROM s),
         |m AS (
         |  SELECT src_id, tgt_id, cos,
         |         cos / (0.5D * (
         |           CAST(sum(CASE WHEN rn_s <= $k
         |                         THEN CAST(cos AS DECIMAL(18,6)) END)
         |                OVER (PARTITION BY src_id) AS DOUBLE)
         |           / CAST(sum(CASE WHEN rn_s <= $k THEN 1 ELSE 0 END)
         |                  OVER (PARTITION BY src_id) AS DOUBLE)
         |           +
         |           CAST(sum(CASE WHEN rn_t <= $k
         |                         THEN CAST(cos AS DECIMAL(18,6)) END)
         |                OVER (PARTITION BY tgt_id) AS DOUBLE)
         |           / CAST(sum(CASE WHEN rn_t <= $k THEN 1 ELSE 0 END)
         |                  OVER (PARTITION BY tgt_id) AS DOUBLE))) AS margin
         |  FROM w),
         |r AS (SELECT src_id, tgt_id, cos, margin,
         |             row_number() OVER (PARTITION BY src_id
         |                                ORDER BY margin DESC, tgt_id) AS r_s,
         |             row_number() OVER (PARTITION BY tgt_id
         |                                ORDER BY margin DESC, src_id) AS r_t
         |      FROM m)
         |SELECT src_id, tgt_id, cos,
         |       floor(margin * 1000000 + 0.5) / 1000000 AS margin
         |FROM r WHERE r_s = 1 AND r_t = 1 AND margin >= ${minMargin}D
         |""".stripMargin)
  }
}
