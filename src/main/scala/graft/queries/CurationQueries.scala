package graft.queries

import org.apache.spark.sql.functions._
import graft.functions.TextFunctions
import graft.functions.TextFunctions._
import graft.io.Tables
import graft.operators.Curation
import graft.queries.Qutil.dround

/** Corpus-curation operators over the `documents` table: benchmark
  * decontamination, deterministic stratified sampling, chunking, sequence
  * packing, PII redaction, quality filtering. Oracle SQL is generated from
  * the same constants (rates, budgets, regexes, rule thresholds) as the
  * Spark columns, so the two sides cannot drift.
  */
object CurationQueries {

  private val ContamN = 5          // decontamination n-gram order
  private val EvalMod = 37L        // doc_id % EvalMod == 0 → "benchmark" doc
  private val SampleRates = Seq("en" -> 0.5, "de" -> 1.0) // stratified rates
  private val DefaultRate = 0.25
  private val ChunkWindow = 40
  private val ChunkStride = 30
  private val PackBudget = 512L
  private val PackBuckets = 8
  private val CdcM = 16            // q95 CDC boundary modulus (≈ chunk len)
  private val WsK = 100            // q99 weighted-sample size
  // q100 pipeline model/config (the q94 classifier values + 50% sample)
  private val PipeW = (1.5, 2.0, -3.0, 1.0)
  private val PipeBias = -1.2
  private val PipeThr = 0.5
  private val PipeRate = 0.5
  private val MinTokens = 5L
  private val MaxPunct = 0.3
  private val BudgetPerSource = 700L   // q106 per-source token budget
  private val NShards = 8              // q107 training shard count
  // q108 epoch schedule: src0 up-sampled 2.5 epochs (floor 2 + hash-gated
  // fractional copy), src1 dropped (0 epochs), everything else 1 epoch
  private val EpochMap = Seq("src0" -> 2.5, "src1" -> 0.0)
  private val DefaultEpochs = 1.0
  private val PplxBuckets = 3      // q114 CCNet head/middle/tail
  private val PplxRefMod = 5L      // q114 reference corpus = doc_id % 5 == 0 (q61's)
  private val DsirB = 512          // q115 hashed-feature buckets
  private val DsirK = 100          // q115 selection size
  private val DsirTarget = "src0"  // q115 target domain
  private val DsirSalt = "dsir"
  private val ReportN = 2          // q116 matrix n-gram order (dense on synthetic text)
  private val ReportThr = 0.05     // q116 containment gate
  private val ReportBenches = 3    // q116 synthetic benchmark count

  private def md5IntSql(e: String): String =
    s"('0x' || substr(md5($e), 1, 8))::BIGINT"

  /** Tokenized-documents CTE shared by the word-grain oracles. */
  private val wsCte =
    """w AS (
      |  SELECT doc_id, lang, text,
      |         CASE WHEN length(trim(text)) = 0 THEN CAST([] AS VARCHAR[])
      |              ELSE string_split_regex(trim(text), '\s+') END AS ws
      |  FROM documents)""".stripMargin

  val all: Seq[Q] = Seq(

    // Benchmark decontamination: training docs sharing word 5-grams with the
    // held-out slice (doc_id % 37 = 0 standing in for an eval set), with
    // containment = shared / eval's distinct n-grams. Overlap is counted at
    // the shared md5-prefix hash grain on BOTH sides, so the integer
    // arithmetic replays exactly.
    Q.sql("q42_decontamination",
      s"""WITH $wsCte,
         |sh AS (
         |  SELECT DISTINCT doc_id, array_to_string(ws[i:i+${ContamN - 1}], ' ') AS sh
         |  FROM (SELECT doc_id, ws, unnest(generate_series(1, len(ws) - ${ContamN - 1})) AS i
         |        FROM w)),
         |h AS (SELECT doc_id, ${md5IntSql("sh")} AS h FROM sh),
         |tr AS (SELECT doc_id AS train_id, h FROM h WHERE doc_id % $EvalMod <> 0),
         |ev AS (SELECT doc_id AS eval_id, h FROM h WHERE doc_id % $EvalMod = 0),
         |evsz AS (SELECT eval_id, count(*) AS eval_ngrams FROM ev GROUP BY 1),
         |ov AS (
         |  SELECT train_id, eval_id, count(*) AS n_overlap
         |  FROM tr JOIN ev USING (h) GROUP BY 1, 2)
         |SELECT o.train_id, o.eval_id, o.n_overlap, s.eval_ngrams,
         |       floor((CAST(o.n_overlap AS DOUBLE) / s.eval_ngrams) * 10000 + 0.5) / 10000 AS containment
         |FROM ov o JOIN evsz s USING (eval_id)
         |ORDER BY train_id, eval_id""".stripMargin) { (s, d) =>
      val docs = Tables.documents(s, d)
      Curation.ngramContamination(
          docs.where(pmod(col("doc_id"), lit(EvalMod)) =!= 0),
          docs.where(pmod(col("doc_id"), lit(EvalMod)) === 0),
          "doc_id", "text", ContamN)
        .select(col("train_id"), col("eval_id"), col("n_overlap"),
          col("eval_ngrams"), dround(col("containment"), 4).as("containment"))
        .orderBy("train_id", "eval_id")
    },

    // Deterministic stratified sampling: language-keyed rates (en 50%,
    // de 100%, others 25%), membership a pure function of (salt, doc_id) —
    // the oracle replays the md5 threshold test row by row.
    Q.sql("q43_stratified_sample", {
      val thresholds = SampleRates.foldLeft(
        s"${(DefaultRate * Curation.RateScale).toLong}") {
        case (els, (stratum, r)) =>
          s"CASE WHEN lang = '$stratum' THEN ${(r * Curation.RateScale).toLong} ELSE $els END"
      }
      s"""SELECT doc_id, lang
         |FROM documents
         |WHERE ${md5IntSql(s"'sample:' || CAST(doc_id AS VARCHAR)")} % ${Curation.RateScale}
         |      < ($thresholds)
         |ORDER BY doc_id""".stripMargin
    }) { (s, d) =>
      Curation.stratifiedSample(Tables.documents(s, d), "doc_id", "lang",
          SampleRates.toMap, DefaultRate)
        .select("doc_id", "lang")
        .orderBy("doc_id")
    },

    // Temperature-based source mixing (τ=0.5, token budget 10k): rates are
    // DERIVED from per-source token counts — sqrt weights, ordered
    // cumulative denominator, left-to-right rate chain, 1e-6 threshold
    // quantization — so the oracle recomputes the whole mixture design and
    // the sampled membership bit-identically.
    Q.sql("q64_temperature_mix", {
      val budget = 10000L
      s"""WITH $wsCte,
         |t AS (SELECT w.doc_id, d.source, len(w.ws) AS tok
         |      FROM w JOIN documents d USING (doc_id)),
         |s AS (SELECT source, CAST(sum(tok) AS BIGINT) AS n_tok FROM t GROUP BY 1),
         |c AS (SELECT source, n_tok, sqrt(CAST(n_tok AS DOUBLE)) AS wgt,
         |             sum(sqrt(CAST(n_tok AS DOUBLE))) OVER (
         |               ORDER BY source ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
         |      FROM s),
         |tt AS (SELECT max(cum) AS tot FROM c),
         |r AS (SELECT c.source,
         |             CAST(floor(least(1.0, c.wgt / tt.tot * $budget / c.n_tok) * ${Curation.RateScale}) AS BIGINT) AS thr
         |      FROM c CROSS JOIN tt)
         |SELECT t.doc_id, t.source, CAST(t.tok AS BIGINT) AS tok
         |FROM t JOIN r USING (source)
         |WHERE ${md5IntSql(s"'mix:' || CAST(t.doc_id AS VARCHAR)")} % ${Curation.RateScale} < r.thr
         |ORDER BY doc_id""".stripMargin
    }) { (s, d) =>
      Curation.temperatureMix(Tables.documents(s, d), "doc_id", "source",
          "text", tokenBudget = 10000L)
        .select(col("doc_id"), col("source"), col("__tok").as("tok"))
        .orderBy("doc_id")
    },

    // Overlapping word-window chunking (window 40, stride 30): map-only
    // fan-out of each doc into tokenizer-ready chunks.
    Q.sql("q44_chunk_docs",
      s"""WITH $wsCte,
         |c AS (
         |  SELECT doc_id, ws, len(ws) AS n,
         |         CASE WHEN len(ws) <= $ChunkWindow THEN 1
         |              ELSE CAST(ceil((len(ws) - $ChunkWindow) / CAST($ChunkStride AS DOUBLE)) AS BIGINT) + 1
         |         END AS n_chunks
         |  FROM w WHERE len(ws) > 0)
         |SELECT doc_id, i AS chunk_idx,
         |       array_to_string(ws[CAST(i * $ChunkStride + 1 AS BIGINT) : CAST(i * $ChunkStride + $ChunkWindow AS BIGINT)], ' ') AS chunk_text,
         |       least($ChunkWindow, n - i * $ChunkStride) AS chunk_tokens
         |FROM (SELECT doc_id, ws, n, unnest(generate_series(0, n_chunks - 1)) AS i FROM c)
         |ORDER BY doc_id, chunk_idx""".stripMargin) { (s, d) =>
      Curation.chunkDocuments(Tables.documents(s, d), "doc_id", "text",
          ChunkWindow, ChunkStride)
        .orderBy("doc_id", "chunk_idx")
    },

    // Sequence packing into 512-token budgets over 8 hash buckets:
    // contiguous-fill prefix-sum form, window arithmetic identical in SQL.
    Q.sql("q45_pack_sequences",
      s"""WITH t AS (
         |  SELECT doc_id,
         |         CAST(CASE WHEN length(trim(text)) = 0 THEN 0
         |              ELSE len(string_split_regex(trim(text), '\\s+')) END AS BIGINT) AS tokens,
         |         ${md5IntSql(s"'pack:' || CAST(doc_id AS VARCHAR)")} % $PackBuckets AS bucket
         |  FROM documents),
         |c AS (
         |  SELECT doc_id, tokens, bucket,
         |         sum(tokens) OVER (PARTITION BY bucket ORDER BY doc_id
         |                           ROWS UNBOUNDED PRECEDING) AS cum
         |  FROM t)
         |SELECT doc_id, tokens, bucket,
         |       CAST(bucket AS VARCHAR) || '_' ||
         |         CAST(CAST(floor((cum - tokens) / CAST($PackBudget AS DOUBLE)) AS BIGINT) AS VARCHAR) AS pack_id,
         |       CAST((cum - tokens) % $PackBudget AS BIGINT) AS pack_offset
         |FROM c ORDER BY doc_id""".stripMargin) { (s, d) =>
      val docs = Tables.documents(s, d)
        .select(col("doc_id"), tokenCount(col("text")).cast("long").as("tokens"))
      Curation.packSequences(docs, "doc_id", "tokens", PackBudget, PackBuckets)
        .select("doc_id", "tokens", "bucket", "pack_id", "pack_offset")
        .orderBy("doc_id")
    },

    // PII redaction: URL → email → phone regexp_replace chain with
    // per-stage match counts; patterns shared with the oracle verbatim
    // (lookaround-free, so Java regex and RE2 agree).
    Q.sql("q46_pii_redact", {
      val (u, e, p) = (TextFunctions.UrlRe, TextFunctions.EmailRe,
        TextFunctions.PhoneRe)
      s"""SELECT doc_id,
         |  regexp_replace(regexp_replace(regexp_replace(text,
         |    '$u', '<URL>', 'g'), '$e', '<EMAIL>', 'g'), '$p', '<PHONE>', 'g') AS clean_text,
         |  CAST(len(regexp_extract_all(text, '$u')) AS BIGINT) AS n_urls,
         |  CAST(len(regexp_extract_all(regexp_replace(text, '$u', '<URL>', 'g'), '$e')) AS BIGINT) AS n_emails,
         |  CAST(len(regexp_extract_all(regexp_replace(regexp_replace(text, '$u', '<URL>', 'g'), '$e', '<EMAIL>', 'g'), '$p')) AS BIGINT) AS n_phones
         |FROM documents ORDER BY doc_id""".stripMargin
    }) { (s, d) =>
      val step1 = regexp_replace(col("text"), UrlRe, "<URL>")
      val step2 = regexp_replace(step1, EmailRe, "<EMAIL>")
      Tables.documents(s, d).select(
          col("doc_id"),
          redactPii(col("text")).as("clean_text"),
          regexp_count(col("text"), lit(UrlRe)).cast("long").as("n_urls"),
          regexp_count(step1, lit(EmailRe)).cast("long").as("n_emails"),
          regexp_count(step2, lit(PhoneRe)).cast("long").as("n_phones"))
        .orderBy("doc_id")
    },

    // Rule-based quality filter with an audit trail: per-doc failed-rule
    // list (declaration order) + keep flag. Ratio thresholds compare
    // identical IEEE divisions on both sides, so the rule outcomes agree
    // bit-for-bit.
    Q.sql("q47_quality_filter", {
      val punct = """CASE WHEN length(text) = 0 THEN 0.0
                    |            ELSE CAST(length(text) - length(regexp_replace(text, '[\.,;:!\?''"()\[\]{}-]', '', 'g')) AS DOUBLE) / length(text) END""".stripMargin
      // coalesce: DuckDB's array_to_string is string_agg under the hood, so
      // an empty (all-rules-pass) list gives NULL where Spark's array_join
      // gives '' — normalize to ''.
      s"""WITH $wsCte
         |SELECT doc_id,
         |  coalesce(array_to_string(list_filter([
         |    CASE WHEN NOT (len(ws) >= $MinTokens) THEN 'min_tokens' END,
         |    CASE WHEN NOT (($punct) <= $MaxPunct) THEN 'max_punct' END,
         |    CASE WHEN NOT (lang <> 'unknown') THEN 'known_lang' END
         |  ], x -> x IS NOT NULL), ','), '') AS failed_rules,
         |  CAST(coalesce(array_to_string(list_filter([
         |    CASE WHEN NOT (len(ws) >= $MinTokens) THEN 'min_tokens' END,
         |    CASE WHEN NOT (($punct) <= $MaxPunct) THEN 'max_punct' END,
         |    CASE WHEN NOT (lang <> 'unknown') THEN 'known_lang' END
         |  ], x -> x IS NOT NULL), ','), '') = '' AS INTEGER) AS keep
         |FROM w ORDER BY doc_id""".stripMargin
    }) { (s, d) =>
      Curation.qualityFilterReport(Tables.documents(s, d), Seq(
          "min_tokens" -> (tokenCount(col("text")) >= MinTokens),
          "max_punct" -> (punctRatio(col("text")) <= MaxPunct),
          "known_lang" -> (col("lang") =!= "unknown")))
        .select(col("doc_id"), col("failed_rules"), col("keep").cast("int").as("keep"))
        .orderBy("doc_id")
    },

    // Deterministic train/val/test split (Curation.assignSplit): hash-band
    // assignment summarized per (source, split). Disjoint + exhaustive by
    // construction; the oracle replays the same md5 bands.
    Q.sql("q79_split_summary",
      s"""WITH h AS (
         |  SELECT source, n_chars,
         |         ${md5IntSql("'split:' || CAST(doc_id AS VARCHAR)")}
         |           % ${Curation.RateScale} AS b
         |  FROM documents),
         |s AS (
         |  SELECT source, n_chars,
         |         CASE WHEN b < ${(0.8 * Curation.RateScale).toLong} THEN 'train'
         |              WHEN b < ${(0.9 * Curation.RateScale).toLong} THEN 'val'
         |              ELSE 'test' END AS split
         |  FROM h)
         |SELECT source, split, count(*) AS n,
         |       CAST(sum(n_chars) AS BIGINT) AS sum_chars
         |FROM s GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin) { (s, d) =>
      Curation.assignSplit(Tables.documents(s, d), "doc_id",
          Seq(("train", 0.8), ("val", 0.1), ("test", 0.1)))
        .groupBy("source", "split")
        .agg(count(lit(1)).as("n"), sum("n_chars").as("sum_chars"))
        .orderBy("source", "split")
    },

    // Deterministic corpus shuffle for training order: every doc gets a
    // reproducible position under an md5-keyed total order, computed with
    // Windows.globalIndex (range partition + offset sum — NO
    // single-partition window). The oracle is the naive global row_number,
    // which the distributed formulation must equal exactly.
    Q.sql("q83_corpus_shuffle",
      s"""SELECT doc_id, pos FROM (
         |  SELECT doc_id,
         |         row_number() OVER (ORDER BY h, doc_id) AS pos
         |  FROM (SELECT doc_id,
         |               ${md5IntSql("'shuffle:' || CAST(doc_id AS VARCHAR)")} AS h
         |        FROM documents))
         |ORDER BY doc_id""".stripMargin) { (s, d) =>
      import graft.functions.TextFunctions.md5Int
      graft.ops.Windows.globalIndex(
          Tables.documents(s, d).withColumn("h",
            md5Int(concat(lit("shuffle:"), col("doc_id").cast("string")))),
          sortCols = Seq("h", "doc_id"))
        .select("doc_id", "pos")
        .orderBy("doc_id")
    },

    // Content-defined chunking: boundaries after tokens with hash ≡ 0
    // (mod 16) — edit-resilient chunks (the CDC complement to q44's
    // fixed windows). Window sum is BIGINT-cast in the oracle (the
    // HUGEINT rule) and the per-token hash is the shared md5 prefix.
    Q.sql("q95_cdc_chunks",
      s"""WITH $wsCte,
         |tok AS (SELECT doc_id, i AS pos, ws[i] AS tok
         |        FROM (SELECT doc_id, ws, unnest(generate_series(1, len(ws))) AS i FROM w)),
         |mk AS (SELECT doc_id, pos, tok,
         |              CASE WHEN ${md5IntSql("tok")} % $CdcM = 0 THEN 1 ELSE 0 END AS b
         |       FROM tok),
         |c AS (SELECT doc_id, pos, tok,
         |             CAST(coalesce(sum(b) OVER (PARTITION BY doc_id ORDER BY pos
         |                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS chunk_id
         |      FROM mk)
         |SELECT doc_id, chunk_id,
         |       string_agg(tok, ' ' ORDER BY pos) AS chunk_text,
         |       count(*) AS n_tokens
         |FROM c GROUP BY 1, 2 ORDER BY doc_id, chunk_id""".stripMargin) { (s, d) =>
      Curation.contentDefinedChunks(Tables.documents(s, d), "doc_id", "text", CdcM)
        .orderBy("doc_id", "chunk_id")
    },

    // Weighted sampling without replacement (Efraimidis–Spirakis keys from
    // deterministic uniforms): the data-mixing primitive. The oracle
    // replays the key formula and the (key, id) top-k boundary exactly.
    Q.sql("q99_weighted_sample",
      s"""WITH k AS (
         |  SELECT doc_id, n_chars,
         |         floor(((- ln(CAST(${md5IntSql("'wsample:' || CAST(doc_id AS VARCHAR)")} + 1 AS DOUBLE) / 4294967296e0))
         |                / CAST(n_chars AS DOUBLE)) * 1e6 + 0.5) / 1e6 AS key
         |  FROM documents WHERE n_chars > 0),
         |r AS (SELECT doc_id, n_chars, key,
         |             row_number() OVER (ORDER BY key, doc_id) AS rn FROM k)
         |SELECT doc_id, n_chars, key FROM r WHERE rn <= $WsK
         |ORDER BY doc_id""".stripMargin) { (s, d) =>
      Curation.weightedSample(Tables.documents(s, d), "doc_id", "n_chars", WsK)
        .select(col("doc_id"), col("n_chars"),
          col(Curation.SampleKeyCol).as("key"))
        .orderBy("doc_id")
    },

    // q100 — the END-TO-END curation pipeline, four stages composed in one
    // query: logistic quality classifier → exact fingerprint dedup (keep
    // min id) → benchmark decontamination (drop any survivor sharing a
    // 5-gram with an eval doc) → deterministic 50% sample. Every stage is
    // an operator already oracle-checked in isolation (q94/q20/q42/q43);
    // this query proves they COMPOSE — the oracle chains the four
    // formulas and the final survivor set must hash-match end to end.
    Q.sql("q100_curation_pipeline", {
      val (w1, w2, w3, w4) = PipeW
      val f1 = "least(CAST(len(ws) AS DOUBLE) / 100, 1e0)"
      val f2 = s"(CASE WHEN len(ws) = 0 THEN 0e0 ELSE CAST(len(list_filter(ws, x -> list_contains(${TextQueries.enSwList}, x))) AS DOUBLE) / len(ws) END)"
      val f3 = """(CASE WHEN length(text) = 0 THEN 0e0 ELSE CAST(length(text) - length(regexp_replace(text, '[\\.,;:!\\?''"()\\[\\]{}-]', '', 'g')) AS DOUBLE) / length(text) END)"""
      val f4 = "least((CASE WHEN len(ws) = 0 THEN 0e0 ELSE CAST(list_reduce(list_transform(ws, x -> length(x)), (a, b) -> a + b) AS DOUBLE) / len(ws) END) / 10, 1e0)"
      s"""WITH $wsCte,
         |p AS (
         |  SELECT doc_id, text, ws,
         |         floor((1e0 / (1e0 + exp(-($f1 * ${w1}e0 + $f2 * ${w2}e0 + $f3 * ${w3}e0 + $f4 * ${w4}e0 + ${PipeBias}e0)))) * 1e6 + 5e-1) / 1e6 AS p_quality
         |  FROM w),
         |kept AS (SELECT * FROM p WHERE p_quality >= ${PipeThr}e0),
         |dd AS (
         |  SELECT doc_id, ws, p_quality,
         |         row_number() OVER (
         |           PARTITION BY md5(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'), '\\s+', ' ', 'g')))
         |           ORDER BY doc_id) AS rn
         |  FROM kept),
         |tr AS (SELECT doc_id, ws, p_quality FROM dd
         |       WHERE rn = 1 AND doc_id % $EvalMod <> 0),
         |evsh AS (
         |  SELECT DISTINCT ${md5IntSql(s"array_to_string(ws[i:i+${ContamN - 1}], ' ')")} AS h
         |  FROM (SELECT ws, unnest(generate_series(1, len(ws) - ${ContamN - 1})) AS i
         |        FROM w WHERE doc_id % $EvalMod = 0)),
         |trsh AS (
         |  SELECT DISTINCT doc_id, ${md5IntSql(s"array_to_string(ws[i:i+${ContamN - 1}], ' ')")} AS h
         |  FROM (SELECT doc_id, ws, unnest(generate_series(1, len(ws) - ${ContamN - 1})) AS i
         |        FROM tr)),
         |bad AS (SELECT DISTINCT t.doc_id FROM trsh t JOIN evsh e USING (h)),
         |clean AS (SELECT * FROM tr WHERE doc_id NOT IN (SELECT doc_id FROM bad)),
         |samp AS (SELECT * FROM clean
         |         WHERE ${md5IntSql("'pipeline:' || CAST(doc_id AS VARCHAR)")} % 1000000 < ${(PipeRate * 1e6).toLong})
         |SELECT doc_id, p_quality, CAST(len(ws) AS BIGINT) AS n_tokens
         |FROM samp ORDER BY doc_id""".stripMargin
    }) { (s, d) =>
      val docs = Tables.documents(s, d)
      val scored = Curation.classifierQuality(docs, "doc_id", "text",
        PipeW, PipeBias, TextFunctions.langStopwords.head._2, PipeThr)
      val kept = scored.where(col("keep") === 1)
      val deduped = graft.ops.Windows.keepBest(
        kept.withColumn("__fp", fingerprint(col("text"))),
        Seq("__fp"), Seq(col("doc_id").asc)).drop("__fp")
      val train = deduped.where(pmod(col("doc_id"), lit(EvalMod)) =!= 0)
      val evalDocs = docs.where(pmod(col("doc_id"), lit(EvalMod)) === 0)
      val bad = Curation.ngramContamination(train, evalDocs, "doc_id", "text", ContamN)
        .select(col("train_id").as("doc_id")).distinct()
      val clean = train.join(bad, Seq("doc_id"), "left_anti")
      Curation.deterministicSample(clean, "doc_id", PipeRate, "pipeline")
        .select(col("doc_id"), col("p_quality"),
          tokenCount(col("text")).cast("long").as("n_tokens"))
        .orderBy("doc_id")
    },

    // Token-budget selection: each source contributes its best docs (by
    // type-token-ratio quality, 6dp-quantized, doc_id tiebreak) until the
    // running token total crosses the per-source budget. The oracle replays
    // the same window cumsum; BIGINT sums throughout (the HUGEINT trap).
    Q.sql("q106_token_budget_select",
      s"""WITH $wsCte,
         |m AS (
         |  SELECT w.doc_id, d.source,
         |         CASE WHEN len(ws) = 0 THEN 0e0
         |              ELSE floor(CAST(len(list_distinct(ws)) AS DOUBLE) / len(ws) * 1e6 + 5e-1) / 1e6 END AS q_ttr,
         |         CAST(len(ws) AS BIGINT) AS n_tokens
         |  FROM w JOIN documents d USING (doc_id)),
         |c AS (
         |  SELECT doc_id, source, q_ttr, n_tokens,
         |         CAST(sum(n_tokens) OVER (
         |           PARTITION BY source ORDER BY q_ttr DESC, doc_id
         |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_tokens
         |  FROM m)
         |SELECT doc_id, source, q_ttr, n_tokens, cum_tokens
         |FROM c WHERE cum_tokens <= $BudgetPerSource
         |ORDER BY doc_id""".stripMargin) { (s, d) =>
      val ws = col("__ws")
      val meta = Tables.documents(s, d)
        .withColumn("__ws", TextFunctions.words(col("text")))
        .select(col("doc_id"), col("source"),
          when(size(ws) === 0, lit(0d))
            .otherwise(dround(
              size(array_distinct(ws)).cast("double") / size(ws), 6))
            .as("q_ttr"),
          size(ws).cast("long").as("n_tokens"))
      Curation.tokenBudgetSelect(meta, "doc_id", "source", "q_ttr",
          "n_tokens", BudgetPerSource)
        .select("doc_id", "source", "q_ttr", "n_tokens", "cum_tokens")
        .orderBy("doc_id")
    },

    // Balanced training shards: sorted round-robin over tokens-desc global
    // rank (computed from a band histogram, never a single-partition sort —
    // see Curation.rankedShards) next to plain hash sharding, reported as
    // per-shard doc/token totals. The rr rows demonstrate the balance
    // property the operator exists for: max-min spread ≤ one document.
    Q.sql("q107_shard_pack",
      s"""WITH $wsCte,
         |t AS (SELECT doc_id, CAST(len(ws) AS BIGINT) AS n_tokens FROM w),
         |rr AS (
         |  SELECT n_tokens,
         |         CAST((row_number() OVER (ORDER BY n_tokens DESC, doc_id) - 1) % $NShards AS INTEGER) AS shard
         |  FROM t),
         |hh AS (
         |  SELECT n_tokens,
         |         CAST(${md5IntSql(s"'shard:' || CAST(doc_id AS VARCHAR)")} % $NShards AS INTEGER) AS shard
         |  FROM t)
         |SELECT method, shard, n_docs, tot_tokens FROM (
         |  SELECT 'rr' AS method, shard, count(*) AS n_docs,
         |         CAST(sum(n_tokens) AS BIGINT) AS tot_tokens
         |  FROM rr GROUP BY 2
         |  UNION ALL
         |  SELECT 'hash' AS method, shard, count(*) AS n_docs,
         |         CAST(sum(n_tokens) AS BIGINT) AS tot_tokens
         |  FROM hh GROUP BY 2)
         |ORDER BY method, shard""".stripMargin) { (s, d) =>
      val toks = Tables.documents(s, d)
        .select(col("doc_id"), tokenCount(col("text")).cast("long").as("n_tokens"))
      val rr = Curation.rankedShards(toks, "doc_id", "n_tokens", NShards)
        .groupBy("shard").agg(count(lit(1)).as("n_docs"),
          sum("n_tokens").as("tot_tokens"))
        .withColumn("method", lit("rr"))
      val hash = toks
        .withColumn("shard",
          pmod(TextFunctions.md5Int(
            concat(lit("shard:"), col("doc_id").cast("string"))),
            lit(NShards.toLong)).cast("int"))
        .groupBy("shard").agg(count(lit(1)).as("n_docs"),
          sum("n_tokens").as("tot_tokens"))
        .withColumn("method", lit("hash"))
      rr.unionByName(hash)
        .select("method", "shard", "n_docs", "tot_tokens")
        .orderBy("method", "shard")
    },

    // Epoch up-sampling: the per-source repetition schedule (src0 2.5
    // epochs, src1 dropped, default 1). Copy counts and the fractional-copy
    // hash gate are generated from the SAME Scala constants on both sides,
    // so the schedule cannot drift between engines.
    Q.sql("q108_epoch_upsample", {
      def whole(e: Double) = math.floor(e).toLong
      def fracThr(e: Double) = ((e - math.floor(e)) * Curation.RateScale).toLong
      val baseCase = EpochMap.foldLeft(s"${whole(DefaultEpochs)}") {
        case (els, (src, e)) =>
          s"CASE WHEN source = '$src' THEN ${whole(e)} ELSE $els END"
      }
      val thrCase = EpochMap.foldLeft(s"${fracThr(DefaultEpochs)}") {
        case (els, (src, e)) =>
          s"CASE WHEN source = '$src' THEN ${fracThr(e)} ELSE $els END"
      }
      s"""WITH n AS (
         |  SELECT doc_id, source,
         |         ($baseCase)
         |         + (CASE WHEN ${md5IntSql("'epoch:' || CAST(doc_id AS VARCHAR)")} % ${Curation.RateScale} < ($thrCase)
         |                 THEN 1 ELSE 0 END) AS n_copies
         |  FROM documents)
         |SELECT doc_id, source, CAST(unnest(generate_series(1, n_copies)) AS INTEGER) AS copy
         |FROM n WHERE n_copies >= 1
         |ORDER BY doc_id, copy""".stripMargin
    }) { (s, d) =>
      Curation.epochUpsample(Tables.documents(s, d), "doc_id", "source",
          EpochMap.toMap, DefaultEpochs)
        .select("doc_id", "source", "copy")
        .orderBy("doc_id", "copy")
    },

    // End-to-end training-shard WRITE (io.Writers.writeTrainingShards):
    // rankedShards assignment → payload join on id → repartition(shard) →
    // dynamic-overwrite partitioned parquet — then the OUTPUT FILES are
    // read back and reduced to per-shard doc/weight totals. The oracle
    // recomputes those totals from the documents table alone (the band-
    // histogram global rank ≡ row_number over (weight DESC, id)), so a
    // write that dropped, duplicated, or mis-assigned any row
    // hash-mismatches. The one registry query whose Spark side round-trips
    // through real output files (the q104 landing-zone discipline, for the
    // training-shard sink).
    Q.sql("q111_training_shard_write",
      s"""WITH r AS (
         |  SELECT doc_id, n_chars,
         |         row_number() OVER (ORDER BY n_chars DESC, doc_id) AS rk
         |  FROM documents),
         |s AS (SELECT n_chars, CAST((rk - 1) % $NShards AS INTEGER) AS shard FROM r)
         |SELECT shard, count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS tot_weight
         |FROM s GROUP BY shard ORDER BY shard""".stripMargin) { (s, d) =>
      val docs = Tables.documents(s, d).select("doc_id", "text", "n_chars")
      val out = new java.io.File(
        sys.props("java.io.tmpdir"), "graft_q111_shards").getPath
      graft.io.Writers.writeTrainingShards(docs, out, "doc_id", "n_chars", NShards)
      s.read.parquet(out)
        .groupBy("shard")
        .agg(count(lit(1)).as("n_docs"),
          sum("n_chars").cast("long").as("tot_weight"))
        .orderBy("shard")
    },

    // CCNet-style perplexity bucketing (Wenzek et al.): q61's unigram-LM
    // cross-entropy, then each language split into equal-frequency
    // head/middle/tail buckets. The Spark side computes the EXACT ntile
    // rank from a band histogram (Curation.ntileByBands — no per-language
    // corpus sort); the oracle uses the built-in ntile under the identical
    // (xent, doc_id) total order, so the sort-free rank construction is
    // itself what's being verified.
    Q.sql("q114_perplexity_buckets",
      s"""WITH w AS (
         |  SELECT doc_id,
         |         CASE WHEN length(trim(text)) = 0 THEN CAST([] AS VARCHAR[])
         |              ELSE string_split_regex(trim(text), '\\s+') END AS ws
         |  FROM documents),
         |tok AS (SELECT doc_id, unnest(ws) AS term FROM w),
         |ref AS (
         |  SELECT term, count(*) AS cnt FROM tok
         |  WHERE doc_id % $PplxRefMod = 0 GROUP BY 1),
         |st AS (SELECT CAST(sum(cnt) AS BIGINT) AS n, count(*) AS v FROM ref),
         |lp AS (
         |  SELECT t.doc_id,
         |         floor(ln((coalesce(r.cnt, 0) + 1.0) / (st.n + st.v)) * 1000000 + 0.5) / 1000000 AS lp
         |  FROM tok t LEFT JOIN ref r USING (term) CROSS JOIN st),
         |agg AS (
         |  SELECT doc_id, count(*) AS n_tokens,
         |         CAST(sum(CAST(lp AS DECIMAL(38,8))) AS DOUBLE) AS slp
         |  FROM lp GROUP BY 1),
         |x AS (
         |  SELECT d.doc_id, d.lang,
         |         CASE WHEN a.n_tokens IS NULL OR a.n_tokens = 0 THEN 0.0
         |              ELSE floor(-a.slp / a.n_tokens * 1000000 + 0.5) / 1000000
         |         END AS xent
         |  FROM documents d LEFT JOIN agg a USING (doc_id))
         |SELECT doc_id, lang, xent,
         |       CAST(ntile($PplxBuckets) OVER
         |              (PARTITION BY lang ORDER BY xent ASC, doc_id ASC) AS INTEGER)
         |         AS bucket
         |FROM x ORDER BY doc_id""".stripMargin) { (s, d) =>
      val docs = Tables.documents(s, d)
      Curation.perplexityBuckets(docs, "doc_id", "text", "lang",
          docs.where(pmod(col("doc_id"), lit(PplxRefMod)) === 0), "text",
          PplxBuckets)
        .orderBy("doc_id")
    },

    // DSIR-style importance resampling (Xie et al., NeurIPS'23): hashed
    // unigram+bigram bag-of-features models on a target domain vs the raw
    // corpus; per-doc importance logw = Σ (ln p_target − ln p_raw) over
    // feature occurrences; Gumbel-top-k selection (≡ sampling without
    // replacement ∝ e^logw) with the deterministic md5 uniforms. Models
    // are $DsirB-bounded, so nothing here scales with vocabulary.
    Q.sql("q115_dsir_select", {
      val u = s"(${md5IntSql(s"'$DsirSalt:' || CAST(doc_id AS VARCHAR)")} + 1) / 4294967296.0"
      s"""WITH w AS (
         |  SELECT doc_id, source,
         |         CASE WHEN length(trim(text)) = 0 THEN CAST([] AS VARCHAR[])
         |              ELSE string_split_regex(trim(text), '\\s+') END AS ws
         |  FROM documents),
         |uni AS (SELECT doc_id, source, unnest(ws) AS t FROM w),
         |bi AS (
         |  SELECT doc_id, source, ws[i] || ' ' || ws[i+1] AS t
         |  FROM (SELECT doc_id, source, ws,
         |               unnest(generate_series(1, len(ws) - 1)) AS i
         |        FROM w WHERE len(ws) >= 2)),
         |ft AS (
         |  SELECT doc_id, source, ${md5IntSql("t")} % $DsirB AS f
         |  FROM (SELECT * FROM uni UNION ALL SELECT * FROM bi)),
         |tc AS (SELECT f, count(*) AS ct FROM ft WHERE source = '$DsirTarget' GROUP BY 1),
         |qc AS (SELECT f, count(*) AS cq FROM ft GROUP BY 1),
         |tn AS (SELECT CAST(sum(ct) AS BIGINT) AS nt FROM tc),
         |qn AS (SELECT CAST(sum(cq) AS BIGINT) AS nq FROM qc),
         |lr AS (
         |  SELECT q.f,
         |         floor(ln((coalesce(t.ct, 0) + 1.0) / (tn.nt + $DsirB)) * 1e6 + 0.5) / 1e6
         |       - floor(ln((q.cq + 1.0) / (qn.nq + $DsirB)) * 1e6 + 0.5) / 1e6 AS lr
         |  FROM qc q LEFT JOIN tc t USING (f) CROSS JOIN tn CROSS JOIN qn),
         |sc AS (
         |  SELECT ft.doc_id, count(*) AS n_feats,
         |         CAST(sum(CAST(lr.lr AS DECIMAL(38,8))) AS DOUBLE) AS slw
         |  FROM ft JOIN lr USING (f) GROUP BY 1),
         |lw AS (
         |  SELECT d.doc_id,
         |         floor(coalesce(sc.slw, 0.0) * 1e6 + 0.5) / 1e6 AS logw,
         |         CAST(coalesce(sc.n_feats, 0) AS BIGINT) AS n_feats
         |  FROM documents d LEFT JOIN sc USING (doc_id)),
         |k AS (
         |  SELECT doc_id, logw, n_feats,
         |         floor((logw - ln(-ln($u))) * 1e6 + 0.5) / 1e6 AS key
         |  FROM lw)
         |SELECT doc_id, logw, n_feats, key
         |FROM k ORDER BY key DESC, doc_id LIMIT $DsirK""".stripMargin
    }) { (s, d) =>
      val docs = Tables.documents(s, d)
      Curation.dsirSelect(docs, "doc_id", "text",
          docs.where(col("source") === DsirTarget), "text", DsirB, DsirK,
          DsirSalt)
        .orderBy(col("key").desc, col("doc_id"))
    },

    // Multi-benchmark contamination MATRIX (the q42 mechanism rolled up to
    // a release-gate report): per (corpus source × benchmark), contaminated
    // train-doc count, eval docs hit, and worst containment. Eval docs are
    // the q42 slice split into synthetic benchmarks; n = 2 keeps the
    // matrix dense on random synthetic text.
    Q.sql("q116_contamination_matrix",
      s"""WITH $wsCte,
         |sh AS (
         |  SELECT DISTINCT doc_id, array_to_string(ws[i:i+${ReportN - 1}], ' ') AS sh
         |  FROM (SELECT doc_id, ws, unnest(generate_series(1, len(ws) - ${ReportN - 1})) AS i
         |        FROM w)),
         |h AS (SELECT doc_id, ${md5IntSql("sh")} AS h FROM sh),
         |tr AS (SELECT doc_id AS train_id, h FROM h WHERE doc_id % $EvalMod <> 0),
         |ev AS (SELECT doc_id AS eval_id, h FROM h WHERE doc_id % $EvalMod = 0),
         |evsz AS (SELECT eval_id, count(*) AS eval_ngrams FROM ev GROUP BY 1),
         |ov AS (
         |  SELECT train_id, eval_id, count(*) AS n_overlap
         |  FROM tr JOIN ev USING (h) GROUP BY 1, 2),
         |pairs AS (
         |  SELECT o.train_id, o.eval_id,
         |         CAST(o.n_overlap AS DOUBLE) / s.eval_ngrams AS c
         |  FROM ov o JOIN evsz s USING (eval_id)
         |  WHERE CAST(o.n_overlap AS DOUBLE) / s.eval_ngrams >= $ReportThr),
         |src AS (SELECT doc_id AS train_id, source FROM documents),
         |bn AS (SELECT doc_id AS eval_id,
         |              'bench_' || CAST((doc_id // $EvalMod) % $ReportBenches AS VARCHAR) AS bench
         |       FROM documents WHERE doc_id % $EvalMod = 0)
         |SELECT s.source, b.bench,
         |       count(DISTINCT p.train_id) AS n_train_docs,
         |       count(DISTINCT p.eval_id) AS n_eval_docs,
         |       floor(max(p.c) * 10000 + 0.5) / 10000 AS max_containment
         |FROM pairs p JOIN src s USING (train_id) JOIN bn b USING (eval_id)
         |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin) { (s, d) =>
      val docs = Tables.documents(s, d)
      val train = docs.where(pmod(col("doc_id"), lit(EvalMod)) =!= 0)
      val evals = docs.where(pmod(col("doc_id"), lit(EvalMod)) === 0)
        .withColumn("bench", concat(lit("bench_"),
          (expr(s"doc_id div $EvalMod") % ReportBenches).cast("string")))
      Curation.contaminationReport(train, "doc_id", "text", "source",
          evals, "bench", ReportN, ReportThr)
        .orderBy("source", "bench")
    },

    // Training-mixture composition report: docs and tokens per
    // (source × language × q114 quality bucket) — the planning view a
    // mixture schedule (q108's epochs, q64's temperatures) is written
    // against. Rollup over the q114 assignment; token counts are the
    // whitespace grain both engines share.
    Q.sql("q117_mixture_report",
      s"""WITH w AS (
         |  SELECT doc_id,
         |         CASE WHEN length(trim(text)) = 0 THEN CAST([] AS VARCHAR[])
         |              ELSE string_split_regex(trim(text), '\\s+') END AS ws
         |  FROM documents),
         |tok AS (SELECT doc_id, unnest(ws) AS term FROM w),
         |ref AS (
         |  SELECT term, count(*) AS cnt FROM tok
         |  WHERE doc_id % $PplxRefMod = 0 GROUP BY 1),
         |st AS (SELECT CAST(sum(cnt) AS BIGINT) AS n, count(*) AS v FROM ref),
         |lp AS (
         |  SELECT t.doc_id,
         |         floor(ln((coalesce(r.cnt, 0) + 1.0) / (st.n + st.v)) * 1000000 + 0.5) / 1000000 AS lp
         |  FROM tok t LEFT JOIN ref r USING (term) CROSS JOIN st),
         |agg AS (
         |  SELECT doc_id, count(*) AS n_tokens,
         |         CAST(sum(CAST(lp AS DECIMAL(38,8))) AS DOUBLE) AS slp
         |  FROM lp GROUP BY 1),
         |x AS (
         |  SELECT d.doc_id, d.lang,
         |         CASE WHEN a.n_tokens IS NULL OR a.n_tokens = 0 THEN 0.0
         |              ELSE floor(-a.slp / a.n_tokens * 1000000 + 0.5) / 1000000
         |         END AS xent
         |  FROM documents d LEFT JOIN agg a USING (doc_id)),
         |b AS (
         |  SELECT doc_id, lang,
         |         CAST(ntile($PplxBuckets) OVER
         |                (PARTITION BY lang ORDER BY xent ASC, doc_id ASC) AS INTEGER)
         |           AS bucket
         |  FROM x)
         |SELECT d.source, b.lang, b.bucket,
         |       count(*) AS n_docs,
         |       CAST(sum(len(w.ws)) AS BIGINT) AS n_tokens
         |FROM b JOIN documents d USING (doc_id) JOIN w USING (doc_id)
         |GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin) { (s, d) =>
      val docs = Tables.documents(s, d)
      val buckets = Curation.perplexityBuckets(docs, "doc_id", "text", "lang",
        docs.where(pmod(col("doc_id"), lit(PplxRefMod)) === 0), "text",
        PplxBuckets)
      buckets.select("doc_id", "lang", "bucket")
        .join(docs.select(col("doc_id"), col("source"),
          TextFunctions.tokenCount(col("text")).cast("long").as("__toks")), "doc_id")
        .groupBy("source", "lang", "bucket")
        .agg(count(lit(1)).as("n_docs"), sum("__toks").as("n_tokens"))
        .orderBy("source", "lang", "bucket")
    },

    // Fixed-QUOTA stratified sample: exactly k docs per source (all, when a
    // stratum is smaller), selected by deterministic hash order — the
    // per-stratum twin of q43's rate sampling, for val/test sets that need
    // exact per-stratum sizes. Runs on the bounded-heap TopKPerGroup exec
    // (one exchange on the stratum, NO per-stratum sort — the window
    // formulation sorts every stratum fully); selection is a pure function
    // of (doc_id, salt), so re-runs, retries, and any engine reproduce the
    // same sample — which is literally what the oracle proves.
    Q.sql("q136_quota_sample",
      """WITH h AS (
        |  SELECT source, doc_id, n_chars,
        |         ('0x' || substr(md5(doc_id::VARCHAR || ':q136'), 1, 15))::BIGINT AS h
        |  FROM documents),
        |r AS (SELECT *, row_number() OVER (PARTITION BY source
        |                                   ORDER BY h, doc_id) AS rn FROM h)
        |SELECT source, count(*) AS n_docs,
        |       CAST(SUM(doc_id) AS BIGINT) AS id_sum,
        |       CAST(SUM(n_chars) AS BIGINT) AS chars_sum
        |FROM r WHERE rn <= 10 GROUP BY 1 ORDER BY 1""".stripMargin) { (s, d) =>
      val hashed = Tables.documents(s, d)
        .select(col("source"), col("doc_id"), col("n_chars"))
        .withColumn("h", expr(
          "CAST(conv(substr(md5(concat(CAST(doc_id AS STRING), ':q136')), 1, 15), 16, 10) AS BIGINT)"))
      graft.plans.TopK.topKPerGroup(hashed, Seq("source"),
          Seq("h" -> false, "doc_id" -> false), 10)
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"),
          sum("doc_id").as("id_sum"),
          sum("n_chars").as("chars_sum"))
        .orderBy("source")
    },

    // Stratified k-fold CV assignment (Curation.cvFolds): rows ranked by
    // the deterministic md5 order within each lang and dealt round-robin —
    // per-stratum fold sizes exactly balanced (±1), not just in
    // expectation. The oracle replays the rank-and-deal; the id_sum column
    // pins the exact MEMBERSHIP of every fold, not just its size.
    Q.sql("q153_cv_folds",
      s"""WITH f AS (
         |  SELECT lang, n_chars, doc_id,
         |         (row_number() OVER (
         |            PARTITION BY lang
         |            ORDER BY ${md5IntSql("'cv:' || CAST(doc_id AS VARCHAR)")},
         |                     doc_id) - 1) % 5 AS fold
         |  FROM documents)
         |SELECT fold, lang, count(*) AS n_docs,
         |       CAST(SUM(doc_id) AS BIGINT) AS id_sum,
         |       CAST(SUM(n_chars) AS BIGINT) AS chars_sum
         |FROM f GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin) { (s, d) =>
      Curation.cvFolds(Tables.documents(s, d), "doc_id", "lang", k = 5)
        .groupBy("fold", "lang")
        .agg(count(lit(1)).as("n_docs"),
          sum("doc_id").as("id_sum"),
          sum("n_chars").as("chars_sum"))
        .orderBy("fold", "lang")
    },

    // Feature hashing (the hashing trick): categorical tokens map to a
    // fixed 16-bucket vector via md5 bucket + md5 sign — dimensionality is
    // a CONSTANT independent of vocabulary, the property that makes the
    // trick scale-free (no vocabulary table to build, broadcast, or grow).
    // Map-only token explode + one (user, bucket) aggregate; the oracle
    // replays bucket and sign hashes exactly.
    Q.sql("q167_feature_hashing", {
      def tok(e: String) = s"'fh:' || $e"
      def sg(e: String) = s"'sg:' || $e"
      s"""WITH t AS (
         |  SELECT user_id, tok FROM (
         |    SELECT user_id,
         |           unnest(['type=' || event_type,
         |                   'bucket=' || CAST(least(CAST(floor(value / 50) AS BIGINT), 9)
         |                                     AS VARCHAR)]) AS tok
         |    FROM events)),
         |h AS (
         |  SELECT user_id,
         |         ${md5IntSql(tok("tok"))} % 16 AS bucket,
         |         CASE WHEN ${md5IntSql(sg("tok"))} % 2 = 0 THEN 1 ELSE -1 END AS sgn
         |  FROM t)
         |SELECT user_id, bucket, CAST(SUM(sgn) AS BIGINT) AS val
         |FROM h GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin
    }) { (s, d) =>
      val toks = Tables.events(s, d).select(
        col("user_id"),
        explode(array(
          concat(lit("type="), col("event_type")),
          concat(lit("bucket="),
            least(floor(col("value") / 50).cast("long"), lit(9L)).cast("string"))
        )).as("tok"))
      toks.select(col("user_id"),
          pmod(md5Int(concat(lit("fh:"), col("tok"))), lit(16L)).as("bucket"),
          when(pmod(md5Int(concat(lit("sg:"), col("tok"))), lit(2L)) === 0, 1L)
            .otherwise(-1L).as("sgn"))
        .groupBy("user_id", "bucket")
        .agg(sum("sgn").as("val"))
        .orderBy("user_id", "bucket")
    },

    // Out-of-fold mean target encoding (Curation.targetEncodeOof): each
    // (segment, fold) cell's encoding uses only the OTHER folds' order
    // totals, smoothed toward the fold's out-of-fold global mean
    // (m = 20) — the leakage-free mean-encoding recipe, q153's consumer.
    // ONE fact-table aggregate to the (segment, fold) grain; totals are
    // aggregates OF that tiny grain. The oracle replays folds, decimal
    // sums, and the smoothing formula.
    Q.sql("q183_target_encoding", {
      val fold =
        s"${md5IntSql("'te:' || CAST(o_orderkey AS VARCHAR)")} % 5"
      s"""WITH o AS (
         |  SELECT c_mktsegment AS seg, o_totalprice AS t, $fold AS fold
         |  FROM orders JOIN customer ON o_custkey = c_custkey),
         |cf AS (
         |  SELECT seg, fold, count(*) AS n,
         |         SUM(CAST(t AS DECIMAL(18,4))) AS s
         |  FROM o GROUP BY 1, 2),
         |pc AS (SELECT seg, CAST(SUM(n) AS BIGINT) AS cat_n,
         |              SUM(s) AS cat_s FROM cf GROUP BY 1),
         |pf AS (SELECT fold, CAST(SUM(n) AS BIGINT) AS fold_n,
         |              SUM(s) AS fold_s FROM cf GROUP BY 1),
         |tt AS (SELECT CAST(SUM(n) AS BIGINT) AS tot_n,
         |              SUM(s) AS tot_s FROM cf)
         |SELECT cf.seg AS segment, cf.fold,
         |       CAST(cat_n - n AS BIGINT) AS n_oof,
         |       floor(((CAST(cat_s - s AS DOUBLE)
         |               + 20.0 * (CAST(tot_s - fold_s AS DOUBLE)
         |                         / (tot_n - fold_n)))
         |              / ((cat_n - n) + 20.0)) * 1e6 + 0.5) / 1e6
         |         AS encoding
         |FROM cf JOIN pc USING (seg) JOIN pf USING (fold) CROSS JOIN tt
         |ORDER BY 1, 2""".stripMargin
    }) { (s, d) =>
      val o = Tables.orders(s, d)
        .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
        .select(col("c_mktsegment").as("seg"), col("o_totalprice"),
          pmod(md5Int(concat(lit("te:"), col("o_orderkey").cast("string"))),
            lit(5L)).as("fold"))
      Curation.targetEncodeOof(o, "seg", "o_totalprice", "fold",
          smoothing = 20.0)
        .select(col("cat").as("segment"), col("fold"), col("n_oof"),
          col("encoding"))
        .orderBy("segment", "fold")
    })
}
