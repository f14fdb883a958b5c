package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions._

/** Corpus-curation operators for training-data pipelines: deterministic
  * sampling, document chunking, sequence packing, benchmark decontamination,
  * and rule-based quality filtering.
  *
  * Scale design: every operator here is either map-only (sampling, chunking,
  * filtering, redaction — they ride along with the scan and stay inside
  * whole-stage codegen) or keyed on a bounded-cardinality hash key
  * (packing windows per bucket, contamination equi-join on shingle hash).
  * Nothing is driver-side, nothing is O(corpus²).
  */
object Curation {

  /** Scale used to turn a sampling rate into an integer hash threshold —
    * rates are effectively quantized to 1e-6 resolution. */
  val RateScale: Long = 1000000L

  private def hashBucket(id: Column, salt: String): Column =
    pmod(md5Int(concat(lit(salt), lit(":"), id.cast("string"))), lit(RateScale))

  /** Deterministic Bernoulli sample: keep a row iff
    * md5(salt:id) mod 1e6 < rate·1e6. Unlike `df.sample()`, membership is a
    * pure function of (id, salt) — re-runs, retries, and different
    * partitionings of a 100 TB input all select the SAME rows, and the
    * sample is reproducible in any engine with md5 (the oracle replays it).
    * Changing the salt draws an independent sample. Map-only: no shuffle,
    * the predicate pushes into the scan's filter stage. */
  def deterministicSample(df: DataFrame, idCol: String, rate: Double,
                          salt: String = "sample"): DataFrame = {
    require(rate >= 0 && rate <= 1, "rate must be in [0,1]")
    df.where(hashBucket(col(idCol), salt) < (rate * RateScale).toLong)
  }

  /** Per-stratum deterministic sampling — e.g. downsample web text to 10%
    * while keeping 100% of books/code, the standard data-mixture move.
    * `rates` maps stratum value → rate; unlisted strata use `defaultRate`.
    * Same hash membership as `deterministicSample`, so a doc kept at rate r
    * stays kept at any rate ≥ r (nested samples, useful for ablations). */
  def stratifiedSample(df: DataFrame, idCol: String, stratumCol: String,
                       rates: Map[String, Double], defaultRate: Double,
                       salt: String = "sample"): DataFrame = {
    require((defaultRate +: rates.values.toSeq).forall(r => r >= 0 && r <= 1),
      "rates must be in [0,1]")
    val threshold = rates.foldLeft(lit((defaultRate * RateScale).toLong)) {
      case (els, (stratum, r)) =>
        when(col(stratumCol) === stratum, lit((r * RateScale).toLong)).otherwise(els)
    }
    df.where(hashBucket(col(idCol), salt) < threshold)
  }

  /** Temperature-based multi-source mixture sampling — the Llama/T5-style
    * data-mixing stage: per-source sampling rates are DERIVED FROM THE
    * DATA so that expected sampled tokens track
    * share_s ∝ (tokens_s)^temperature within a total `tokenBudget`.
    * temperature < 1 flattens the mixture (up-weights small sources —
    * books/code vs web); 1.0 is proportional. Only τ ∈ {0.5, 1.0} is
    * accepted: sqrt and identity are the IEEE-exact weighting functions,
    * so rates (and therefore membership) replay bit-identically in the
    * oracle — an arbitrary pow(x, τ) would not.
    *
    * Determinism discipline: the share denominator is an ORDERED
    * cumulative window sum over sources (both engines fold left in source
    * order — a plain sum() would re-associate); the rate chain
    * w/Σw·budget/n is left-to-right; thresholds quantize to 1e-6 like all
    * sampling here. Membership reuses the salted hash, so the mix nests
    * with `deterministicSample` draws of a different salt.
    *
    * Scale: one token-grain aggregate to source grain (config-sized —
    * sources are a curated enum at any corpus size), a single-partition
    * window over that tiny frame (fine: config-sized by construction),
    * then a broadcast of the per-source thresholds back onto the scan —
    * the corpus itself is never shuffled; the keep predicate is map-only. */
  def temperatureMix(df: DataFrame, idCol: String, sourceCol: String,
                     textCol: String, tokenBudget: Long,
                     temperature: Double = 0.5,
                     salt: String = "mix"): DataFrame = {
    require(temperature == 0.5 || temperature == 1.0,
      "temperature must be 0.5 (sqrt) or 1.0 (proportional) for cross-engine exactness")
    val withTok = df.withColumn("__tok", tokenCount(col(textCol)).cast("long"))
    val bySrc = withTok.groupBy(col(sourceCol))
      .agg(sum("__tok").as("__n_tok"))
    def weight(c: Column): Column =
      if (temperature == 0.5) sqrt(c.cast("double")) else c.cast("double")
    val w = Window.orderBy(sourceCol)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = bySrc.withColumn("__w", weight(col("__n_tok")))
      .withColumn("__cum", sum("__w").over(w))
    val tot = cum.agg(max("__cum").as("__tot"))
    val rates = cum.crossJoin(broadcast(tot))
      .withColumn("__rate",
        least(lit(1.0),
          col("__w") / col("__tot") * lit(tokenBudget.toDouble) / col("__n_tok")))
      .withColumn("__thr",
        floor(col("__rate") * lit(RateScale.toDouble)).cast("long"))
      .select(col(sourceCol), col("__thr"))
    withTok.join(broadcast(rates), Seq(sourceCol))
      .where(hashBucket(col(idCol), salt) < col("__thr"))
      .drop("__thr")
  }

  /** Deterministic train/validation/test assignment: the id's hash bucket
    * falls into cumulative fraction bands, so the split is a pure function
    * of (id, salt) — map-only, reproducible across engines and re-runs, and
    * disjoint/exhaustive by construction. Membership never depends on
    * partitioning or row order, which is what makes a 100 TB split safe to
    * recompute lazily instead of materializing an assignment table.
    * `fractions` are (label, fraction) in band order; they must sum to 1. */
  def assignSplit(df: DataFrame, idCol: String,
                  fractions: Seq[(String, Double)],
                  salt: String = "split"): DataFrame = {
    require(fractions.nonEmpty && math.abs(fractions.map(_._2).sum - 1.0) < 1e-9,
      "fractions must sum to 1")
    val cum = fractions.scanLeft(0.0)(_ + _._2).tail
    val thresholds = fractions.map(_._1).zip(
      cum.map(c => math.min((c * RateScale).toLong, RateScale)))
    val bucket = hashBucket(col(idCol), salt)
    val expr0 = thresholds.init.foldRight(
      lit(thresholds.last._1): Column) { case ((label, thr), els) =>
      when(bucket < thr, lit(label)).otherwise(els)
    }
    df.withColumn("split", expr0)
  }

  /** Split documents into overlapping word-window chunks: chunk i covers
    * words [i·stride, i·stride + window). Empty docs yield no chunks; a doc
    * of n ≤ window words yields exactly one. Map-only explode — each input
    * row fans out to its own chunks with no shuffle, so this pipelines with
    * the scan at any scale. Output: (id, chunk_idx, chunk_text,
    * chunk_tokens), keyed for a downstream tokenizer/pack stage. */
  def chunkDocuments(df: DataFrame, idCol: String, textCol: String,
                     window: Int, stride: Int): DataFrame = {
    require(window > 0 && stride > 0 && stride <= window,
      "need 0 < stride <= window")
    val n = size(col("__ws"))
    val nChunks = when(n <= window, lit(1L))
      .otherwise(ceil((n - window).cast("double") / stride).cast("long") + 1L)
    df.select(col(idCol), words(col(textCol)).as("__ws"))
      .where(n > 0)
      .withColumn("chunk_idx", explode(sequence(lit(0L), nChunks - 1L)))
      .select(
        col(idCol),
        col("chunk_idx"),
        concat_ws(" ", slice(col("__ws"),
          (col("chunk_idx") * stride + 1L).cast("int"), lit(window))).as("chunk_text"),
        least(lit(window.toLong), n.cast("long") - col("chunk_idx") * stride)
          .as("chunk_tokens"))
  }

  /** Pack variable-length documents into fixed token budgets — the stage
    * that turns a filtered corpus into near-constant-cost training
    * sequences. Contiguous-fill packing: docs are hash-assigned to
    * `nBuckets` independent buckets, ordered deterministically within each,
    * and doc d joins pack floor(prefixSum(tokens before d) / budget).
    *
    * True greedy bin-packing (reset the accumulator when a doc would
    * overflow) is inherently sequential per bucket; this prefix-sum form is
    * one window per bucket (embarrassingly parallel across buckets — size
    * nBuckets to the cluster), wastes at most one straddling doc per pack
    * boundary, and is replayable as SQL window arithmetic. Each pack's
    * token total is ≈budget: a pack's docs are exactly those whose
    * exclusive prefix sum lands in [k·budget, (k+1)·budget).
    *
    * Output: (id, tokens, bucket, pack_id, pack_offset) where pack_offset
    * is the doc's token offset within its pack. */
  def packSequences(df: DataFrame, idCol: String, tokensCol: String,
                    budget: Long, nBuckets: Int,
                    salt: String = "pack"): DataFrame = {
    require(budget > 0 && nBuckets > 0, "need positive budget and buckets")
    val bucket = pmod(
      md5Int(concat(lit(salt), lit(":"), col(idCol).cast("string"))),
      lit(nBuckets.toLong))
    val w = Window.partitionBy("bucket").orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val withBucket = df
      .select(col(idCol), col(tokensCol).cast("long").as("tokens"))
      .withColumn("bucket", bucket)
    withBucket
      .withColumn("__cum", sum(col("tokens")).over(w))
      .withColumn("pack_id",
        concat_ws("_", col("bucket"),
          floor((col("__cum") - col("tokens")) / budget)))
      .withColumn("pack_offset", (col("__cum") - col("tokens")) % budget)
      .drop("__cum")
  }

  /** Benchmark decontamination: which training docs share word n-grams with
    * an eval/benchmark doc, and how much of the eval doc they cover.
    * The production guard against test-set leakage into pre-training data.
    *
    * Shape: distinct (id, shingle-hash) tables on both sides (map-only
    * explode), equi-join on the hash, aggregate per (train, eval) pair.
    * The eval side is a benchmark — thousands of docs against a 100 TB
    * corpus — so its hash table broadcasts and the corpus shingle table is
    * NEVER shuffled: contamination runs as a map-side join over the scan.
    * Output: (train_id, eval_id, n_overlap, eval_ngrams, containment)
    * where containment = |overlap| / |eval doc's distinct n-grams|. */
  def ngramContamination(train: DataFrame, eval: DataFrame, idCol: String,
                         textCol: String, n: Int): DataFrame = {
    def hashed(df: DataFrame, as: String) =
      Dedup.shingleTable(df, idCol, textCol, n)
        .select(col(idCol).as(as), md5Int(col("sh")).as("h"))
    val trainSh = hashed(train, "train_id")
    val evalSh = hashed(eval, "eval_id")
    val evalSizes = evalSh.groupBy("eval_id")
      .agg(count(lit(1)).as("eval_ngrams"))
    trainSh
      .join(broadcast(evalSh), Seq("h"))
      .groupBy("train_id", "eval_id")
      .agg(count(lit(1)).as("n_overlap"))
      .join(broadcast(evalSizes), Seq("eval_id"))
      .select(col("train_id"), col("eval_id"), col("n_overlap"),
        col("eval_ngrams"),
        (col("n_overlap").cast("double") / col("eval_ngrams")).as("containment"))
  }

  /** Multi-benchmark contamination MATRIX — the release-gate report over
    * [[ngramContamination]]: for every (corpus source × benchmark), how
    * many training docs are contaminated (containment ≥ `threshold`
    * against at least one eval doc of that benchmark), how many eval docs
    * are hit, and the worst containment. Pre-training runs decontaminate
    * against MANY suites at once; the per-source breakdown is what tells
    * you which ingest feed is leaking.
    *
    * Scale shape: one pair table per the q42 argument (eval side
    * broadcast, corpus shingles never shuffled — benchmarks are small by
    * definition); the pair table is overlap-bounded, so the source
    * attach join and the (source, bench) rollup shuffle only contaminated
    * rows. Returns (sourceCol, benchCol, n_train_docs, n_eval_docs,
    * max_containment). */
  def contaminationReport(train: DataFrame, idCol: String, textCol: String,
                          sourceCol: String, evals: DataFrame,
                          benchCol: String, n: Int,
                          threshold: Double): DataFrame = {
    import graft.queries.Qutil
    val pairs = ngramContamination(
      train.select(col(idCol), col(textCol)),
      evals.select(col(idCol), col(textCol)), idCol, textCol, n)
      .where(col("containment") >= threshold)
    pairs
      .join(train.select(col(idCol).as("train_id"), col(sourceCol)), "train_id")
      .join(evals.select(col(idCol).as("eval_id"), col(benchCol)), "eval_id")
      .groupBy(col(sourceCol), col(benchCol))
      .agg(countDistinct(col("train_id")).as("n_train_docs"),
        countDistinct(col("eval_id")).as("n_eval_docs"),
        Qutil.dround(max(col("containment")), 4).as("max_containment"))
  }

  /** Weighted sampling WITHOUT replacement (Efraimidis–Spirakis, IPL'06):
    * each row draws key = −ln(u)/w from its deterministic uniform
    * u = (md5(salt:id)+1)/2³² and the k SMALLEST keys win — one pass, no
    * sequential state, exactly k rows, inclusion probability increasing
    * in weight. The deterministic-u trick makes the sample a pure
    * function of (id, salt) like [[deterministicSample]]: re-runs,
    * retries and any partitioning draw the SAME sample, and the oracle
    * replays it. Keys are 6dp-rounded with an id tie-break so the
    * selection boundary is engine-exact (the q48 ln discipline: a last-
    * ulp libm divergence cannot cross a 1e-6 grid step). Top-k is
    * TakeOrdered — per-partition heads + a k-row driver merge, never a
    * global sort. Rows with non-positive weight are excluded.
    *
    * Returns the sampled rows plus a documented `sample_key` column (the
    * rounded E–S key) — callers that want the bare rows drop it; callers
    * auditing the selection boundary (q99's oracle replays it) read it
    * by name instead of reaching into a private alias. */
  val SampleKeyCol = "sample_key"
  def weightedSample(df: DataFrame, idCol: String, weightCol: String, k: Int,
                     salt: String = "wsample"): DataFrame = {
    import graft.queries.Qutil
    val u = (md5Int(concat(lit(salt), lit(":"), col(idCol).cast("string"))) + 1)
      .cast("double") / lit(4294967296.0)
    val key = Qutil.dround(-log(u) / col(weightCol).cast("double"), 6)
    df.where(col(weightCol) > 0)
      .withColumn(SampleKeyCol, key)
      .orderBy(col(SampleKeyCol).asc, col(idCol).asc)
      .limit(k)
  }

  /** Content-defined chunking (CDC): a chunk boundary falls AFTER every
    * token whose hash ≡ 0 (mod m) — a pure function of content, so
    * boundaries downstream of an edit survive insertions/deletions,
    * unlike fixed windows whose chunks all shift (CurationSpec pins
    * this: prepend a token and every chunk after the first stays
    * bit-identical). The rsync/FastCDC idea at token granularity;
    * expected chunk length is m tokens. One doc-keyed window (per-doc
    * sequential, docs independent — the scalable direction) and one
    * (doc, chunk) aggregate; boundary decisions are per-token hashes, so
    * identical chunks come out of any partitioning and any engine.
    * Returns (idCol, chunk_id, chunk_text, n_tokens). */
  def contentDefinedChunks(df: DataFrame, idCol: String, textCol: String,
                           m: Int = 16): DataFrame = {
    val tok = df.select(col(idCol), posexplode(words(col(textCol))))
      .withColumnRenamed("col", "tok")
    val b = when(pmod(md5Int(col("tok")), lit(m)) === 0, 1L).otherwise(0L)
    val w = Window.partitionBy(col(idCol)).orderBy(col("pos"))
      .rowsBetween(Window.unboundedPreceding, -1)
    tok.withColumn("chunk_id", coalesce(sum(b).over(w), lit(0L)))
      .groupBy(col(idCol), col("chunk_id"))
      .agg(
        concat_ws(" ", transform(
          array_sort(collect_list(struct(col("pos"), col("tok")))),
          s => s.getField("tok"))).as("chunk_text"),
        count(lit(1)).as("n_tokens"))
  }

  /** Model-based quality scoring — the classifier-filter stage of an LLM
    * data pipeline (the GPT-3/LLaMA-style "quality classifier" pass): a
    * logistic model over cheap deterministic text features. INFERENCE
    * only — the weights are config (a model trained offline); at 100 TB
    * scoring is one codegen'd map pass riding the scan, no shuffle, and
    * the keep-predicate pushes down like any filter.
    *
    * Features (each in [0,1], shared with the q18 stats oracle so the
    * formulas cannot drift): saturating token count (len/100 capped),
    * stopword ratio, punctuation ratio, saturating mean word length
    * (mwl/10 capped). p = σ(w·x + bias) rounded to the 6dp grid, so the
    * threshold comparison is engine-exact. Returns the input plus
    * (p_quality, keep). */
  def classifierQuality(docs: DataFrame, idCol: String, textCol: String,
                        w: (Double, Double, Double, Double), bias: Double,
                        stopwords: Seq[String], threshold: Double): DataFrame = {
    import graft.queries.Qutil
    val c = col(textCol)
    val z = least(tokenCount(c).cast("double") / 100d, lit(1d)) * w._1 +
      stopwordRatio(c, stopwords) * w._2 +
      punctRatio(c) * w._3 +
      least(meanWordLen(c) / 10d, lit(1d)) * w._4 +
      bias
    val p = Qutil.dround(lit(1d) / (lit(1d) + exp(-z)), 6)
    docs.withColumn("p_quality", p)
      .withColumn("keep", (col("p_quality") >= threshold).cast("int"))
  }

  /** Rule-based quality filtering with per-doc diagnostics: `rules` are
    * (name, passes) predicates; output carries `keep` (all rules pass) and
    * `failed_rules` (comma-joined names of failed ones, declaration order) —
    * the audit trail a curation run needs to explain its drop rate.
    * Map-only; the common `df.where(keep)` downstream pushes into the scan. */
  def qualityFilterReport(df: DataFrame, rules: Seq[(String, Column)]): DataFrame = {
    require(rules.nonEmpty, "need at least one rule")
    val failed = array_join(
      filter(array(rules.map { case (name, pass) =>
        when(!pass, lit(name))
      }: _*), _.isNotNull), ",")
    df.withColumn("failed_rules", failed)
      .withColumn("keep", col("failed_rules") === "")
  }

  /** Token-budget corpus selection — the data-mixing move where each source
    * contributes its BEST documents up to a fixed token budget (rather than
    * a sampling rate): rank docs within a source by (quality desc, id asc)
    * and keep while the running token total stays ≤ `budgetPerSource`.
    * A doc that would cross the budget is dropped (and so is everything
    * ranked after it, since the running sum only grows).
    *
    * Scale: the window shuffles ONLY the metadata projection
    * (id, source, quality, tokens) — the caller's text/payload columns are
    * dropped before the exchange and re-attached by the caller via semi-join
    * if needed. One hash exchange on source; the per-source window is the
    * per-partition sort Spark gives window frames anyway. Skew = the doc
    * count of one source; for a pathological mega-source the budget cut
    * itself bounds useful work, and the cumsum is a single sequential pass
    * per group. Quality must be a deterministic (cross-engine bit-identical)
    * column for the selection to replay in the oracle. */
  def tokenBudgetSelect(df: DataFrame, idCol: String, sourceCol: String,
                        qualityCol: String, tokensCol: String,
                        budgetPerSource: Long): DataFrame = {
    require(budgetPerSource > 0, "budget must be positive")
    val meta = df.select(col(idCol), col(sourceCol),
      col(qualityCol), col(tokensCol).cast("long").as(tokensCol))
    val w = Window.partitionBy(sourceCol)
      .orderBy(col(qualityCol).desc, col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    meta.withColumn("cum_tokens", sum(tokensCol).over(w))
      .where(col("cum_tokens") <= budgetPerSource)
  }

  /** Globally-ranked shard assignment with NO global sort: training-output
    * writers want N shards balanced by token count, and sorted round-robin
    * (shard = (global_rank - 1) mod N over tokens-desc order) keeps every
    * shard within one max-document of the mean. The classic
    * implementation — row_number() over a global ORDER BY — plans as a
    * single-partition window: one task sorts the corpus. This one computes
    * the exact same rank from a band histogram instead:
    *
    *   rank(doc) = Σ count(bands ranked before doc's band)   (broadcast)
    *             + row_number within its band                (window)
    *
    * where a band is one distinct weight value. The band histogram is a
    * weight-grain aggregate (a histogram: bounded like the value domain,
    * not the corpus), its cumulative offsets are a single-partition window
    * over THAT tiny frame only, and the within-band row_number partitions
    * by weight — corpus-sized work stays fully parallel. Deterministic and
    * recompute-safe (no sampling, no partition-id capture — unlike
    * repartitionByRange+spark_partition_id ranking, a cache eviction cannot
    * skew offsets). Skew bound: one band = docs sharing a weight value —
    * fine for integer token counts; a constant-weight corpus degrades to
    * the single-sort it replaces.
    *
    * Returns (id, weight, global_rank, shard). */
  def rankedShards(df: DataFrame, idCol: String, weightCol: String,
                   nShards: Int): DataFrame = {
    require(nShards > 0, "nShards must be positive")
    val meta = df.select(col(idCol), col(weightCol).cast("long").as(weightCol))
    val bands = meta.groupBy(weightCol).agg(count(lit(1)).as("__n"))
    val wOff = Window.orderBy(col(weightCol).desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = bands
      .withColumn("__off", coalesce(sum("__n").over(wOff), lit(0L)))
      .select(col(weightCol), col("__off"))
    val wIn = Window.partitionBy(weightCol).orderBy(idCol)
    meta.join(broadcast(offsets), Seq(weightCol))
      .withColumn("global_rank", row_number().over(wIn).cast("long") + col("__off"))
      .withColumn("shard", ((col("global_rank") - 1) % nShards).cast("int"))
      .select(col(idCol), col(weightCol), col("global_rank"), col("shard"))
  }

  /** Per-source epoch up-sampling — the mixture schedule stated in epochs
    * ("books 2.5 epochs, web 1.0"): each doc is replicated floor(e) times,
    * plus one more iff its salted hash falls under frac(e) — so EXPECTED
    * copies are exactly e per doc, membership of the fractional copy is a
    * pure function of (id, salt) (reproducible across re-runs/engines, the
    * [[deterministicSample]] discipline), and a fixed fraction of docs gets
    * the extra epoch rather than a random-per-run subset. Output repeats
    * the row with copy = 1..n; e = 0 drops the source.
    *
    * Map-only: the copy count is a codegen'd expression and the fan-out is
    * an explode riding the scan — no shuffle at any corpus size. Epoch
    * fractions quantize to the 1e-6 hash grid like all sampling here. */
  def epochUpsample(df: DataFrame, idCol: String, sourceCol: String,
                    epochs: Map[String, Double], defaultEpochs: Double,
                    salt: String = "epoch"): DataFrame = {
    require((defaultEpochs +: epochs.values.toSeq).forall(e => e >= 0 && e <= 100),
      "epochs must be in [0,100]")
    def whole(e: Double): Long = math.floor(e).toLong
    def fracThr(e: Double): Long = ((e - math.floor(e)) * RateScale).toLong
    val base = epochs.foldLeft(lit(whole(defaultEpochs))) {
      case (els, (src, e)) =>
        when(col(sourceCol) === src, lit(whole(e))).otherwise(els)
    }
    val thr = epochs.foldLeft(lit(fracThr(defaultEpochs))) {
      case (els, (src, e)) =>
        when(col(sourceCol) === src, lit(fracThr(e))).otherwise(els)
    }
    val n = (base + when(hashBucket(col(idCol), salt) < thr, 1L).otherwise(0L))
      .cast("int")
    // sequence(1, 0) counts DOWN ([1,0]), it is not empty — guard n = 0
    // explicitly so zero-epoch sources drop instead of double
    df.withColumn("copy",
      explode(when(n >= 1, sequence(lit(1), n))
        .otherwise(array().cast("array<int>"))))
  }

  /** Exact ntile(n) within each partition WITHOUT a per-partition global
    * sort — the scale-safe form of quantile bucketing. The classic
    * `ntile(n) over (partition by p order by v)` plans one task per
    * partition value that sorts everything in it; with ~10 languages over
    * a 100 TB corpus that is 10 corpus-sized sorts. Here the exact rank
    * comes from a band histogram (the rankedShards construction, two-level
    * because `v` is quasi-continuous): band = v floored to `bandDp`
    * decimals — monotone in v, so band order extends the (v, id) total
    * order; per-(part, band) counts make a bounded histogram whose
    * cumulative offsets are a window over the HISTOGRAM only; within-band
    * row_number partitions by (part, band) and stays fully parallel.
    * Bucket assignment then replays SQL ntile's size rule exactly: with
    * N rows and n buckets, the first N mod n buckets carry ⌈N/n⌉ rows —
    * so output is bit-identical to the built-in ntile under the same
    * order. Returns the input plus (global `rankCol` within its part,
    * `bucketCol` in 1..n). */
  def ntileByBands(df: DataFrame, idCol: String, valueCol: String,
                   partCol: String, nBuckets: Int, bandDp: Int = 2,
                   rankCol: String = "rank",
                   bucketCol: String = "bucket"): DataFrame = {
    require(nBuckets >= 1, "nBuckets must be >= 1")
    val band = floor(col(valueCol) * lit(math.pow(10, bandDp)))
    val banded = df.withColumn("__band", band)
    val hist = banded.groupBy(col(partCol), col("__band"))
      .agg(count(lit(1)).as("__bn"))
    val wOff = Window.partitionBy(partCol).orderBy(col("__band").asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = hist
      .withColumn("__off", coalesce(sum("__bn").over(wOff), lit(0L)))
      .select(col(partCol), col("__band"), col("__off"))
    val totals = hist.groupBy(partCol).agg(sum("__bn").as("__N"))
    val wIn = Window.partitionBy(col(partCol), col("__band"))
      .orderBy(col(valueCol).asc, col(idCol).asc)
    val ranked = banded
      .join(broadcast(offsets), Seq(partCol, "__band"))
      .join(broadcast(totals), Seq(partCol))
      .withColumn(rankCol, row_number().over(wIn).cast("long") + col("__off"))
    // SQL ntile size rule: q = N div n, rem = N mod n; buckets 1..rem get
    // q+1 rows. All-integer arithmetic (`div`, never Column./ which is
    // double division), so cross-engine exact.
    ranked
      .withColumn("__q", expr(s"__N div $nBuckets"))
      .withColumn("__rem", col("__N") % nBuckets)
      .withColumn("__cut", (col("__q") + 1) * col("__rem"))
      .withColumn(bucketCol, expr(
        s"""CASE WHEN $rankCol <= __cut THEN ($rankCol - 1) div (__q + 1) + 1
           |     ELSE __rem + ($rankCol - __cut - 1) div __q + 1 END""".stripMargin)
        .cast("int"))
      .drop("__band", "__off", "__N", "__q", "__rem", "__cut")
  }

  /** CCNet-style perplexity bucketing (Wenzek et al., LREC'20): score every
    * document by unigram-LM cross-entropy against a reference corpus
    * ([[CorpusStats.unigramLogLoss]]), then split each language into
    * `nBuckets` equal-frequency buckets (head = 1 is the most
    * reference-like). The classic curation dial: keep head+middle, drop
    * tail, or mix buckets with different weights.
    *
    * Scale shape: the LM scoring is q61's (map-only explode, vocabulary-
    * bounded model join, one doc-grain aggregate); bucketing is
    * [[ntileByBands]] — no per-language corpus sort. Returns
    * (idCol, langCol, xent, bucket). */
  def perplexityBuckets(docs: DataFrame, idCol: String, textCol: String,
                        langCol: String, ref: DataFrame, refTextCol: String,
                        nBuckets: Int): DataFrame = {
    val scored = CorpusStats.unigramLogLoss(docs, idCol, textCol, ref, refTextCol)
      .select(col(idCol), col("xent"))
      .join(docs.select(col(idCol), col(langCol)), Seq(idCol))
    ntileByBands(scored, idCol, "xent", langCol, nBuckets)
      .select(col(idCol), col(langCol), col("xent"), col("bucket"))
  }

  /** DSIR-style importance scores (Xie et al., NeurIPS'23 "Data Selection
    * for Language Models via Importance Resampling"): represent each doc as
    * a bag of hashed n-gram features (unigrams + bigrams hashed into
    * `buckets` buckets), fit add-one-smoothed bag-of-features models on a
    * TARGET corpus (the domain you want more of) and on the raw corpus
    * itself, and score log w(x) = Σ_features [ln p_target(f) − ln p_raw(f)]
    * over the doc's feature occurrences. High logw ⇒ target-like.
    *
    * Both models are `buckets`-bounded (the whole point of feature
    * hashing): the model join broadcasts, feature extraction is a map-only
    * explode, and the score is one doc-grain aggregate — nothing scales
    * with vocabulary. Each per-feature ln is 6dp-rounded before the
    * decimal sum (Qutil), so scores replay exactly in the SQL oracle; the
    * hash is the md5-derived integer family every sketch here uses.
    * Returns (idCol, logw, n_feats). */
  def dsirScores(docs: DataFrame, idCol: String, textCol: String,
                 target: DataFrame, targetTextCol: String,
                 buckets: Int): DataFrame = {
    import graft.queries.Qutil
    import org.apache.spark.sql.types.DecimalType
    require(buckets >= 2, "buckets must be >= 2")
    def feats(df: DataFrame, id: Column, text: Column): DataFrame = {
      val ws = df.select(id.as("__id"), words(text).as("__ws"))
      val uni = ws.select(col("__id"), explode(col("__ws")).as("__t"))
        .select(col("__id"), pmod(md5Int(col("__t")), lit(buckets)).as("f"))
      val bi = ws
        .where(size(col("__ws")) >= 2)
        .select(col("__id"), explode(
          transform(sequence(lit(2), size(col("__ws"))), i =>
            concat(element_at(col("__ws"), i - 1), lit(" "),
              element_at(col("__ws"), i)))).as("__t"))
        .select(col("__id"), pmod(md5Int(col("__t")), lit(buckets)).as("f"))
      uni.unionByName(bi)
    }
    def model(f: DataFrame): DataFrame =
      f.groupBy("f").agg(count(lit(1)).as("cnt"))
    val tgt = model(feats(target, col(idCol), col(targetTextCol)))
      .select(col("f"), col("cnt").as("__ct"))
    val raw = model(feats(docs, col(idCol), col(textCol)))
      .select(col("f"), col("cnt").as("__cq"))
    val tN = tgt.agg(sum("__ct").as("__Nt"))
    val qN = raw.agg(sum("__cq").as("__Nq"))
    val lr = tgt.join(raw, Seq("f"), "full_outer")
      .crossJoin(broadcast(tN)).crossJoin(broadcast(qN))
      .select(col("f"),
        (Qutil.dround(log((coalesce(col("__ct"), lit(0L)) + lit(1.0)) /
            (col("__Nt") + lit(buckets))), 6) -
          Qutil.dround(log((coalesce(col("__cq"), lit(0L)) + lit(1.0)) /
            (col("__Nq") + lit(buckets))), 6)).as("__lr"))
    val scored = feats(docs, col(idCol), col(textCol))
      .join(broadcast(lr), Seq("f"))
      .groupBy(col("__id"))
      .agg(sum(col("__lr").cast(DecimalType(38, 8))).cast("double").as("logw"),
        count(lit(1)).as("n_feats"))
    docs.select(col(idCol)).join(
        scored.select(col("__id").as(idCol), col("logw"), col("n_feats")),
        Seq(idCol), "left")
      .select(col(idCol),
        Qutil.dround(coalesce(col("logw"), lit(0.0)), 6).as("logw"),
        coalesce(col("n_feats"), lit(0L)).as("n_feats"))
  }

  /** DSIR selection: Gumbel-top-k resampling under the importance weights —
    * key = logw + Gumbel(0,1) with the Gumbel noise −ln(−ln(u)) built from
    * the deterministic uniform u = (md5(salt:id)+1)/2³², the
    * [[weightedSample]] discipline (Gumbel-top-k IS sampling without
    * replacement ∝ e^logw, the paper's resampling step — and it never
    * needs the weights exponentiated, so large |logw| can't overflow).
    * One map pass + TakeOrdered; re-runs, retries, and repartitionings
    * select the same docs. Returns the k selected (idCol, logw, key). */
  def dsirSelect(docs: DataFrame, idCol: String, textCol: String,
                 target: DataFrame, targetTextCol: String,
                 buckets: Int, k: Int, salt: String = "dsir"): DataFrame = {
    import graft.queries.Qutil
    val u = (md5Int(concat(lit(salt), lit(":"), col(idCol).cast("string"))) + 1)
      .cast("double") / lit(4294967296.0)
    dsirScores(docs, idCol, textCol, target, targetTextCol, buckets)
      .withColumn("key", Qutil.dround(col("logw") - log(-log(u)), 6))
      .orderBy(col("key").desc, col(idCol).asc)
      .limit(k)
  }

  /** Stratified k-fold cross-validation assignment: within each stratum,
    * rows are ranked by the deterministic md5 order (the shuffle) and dealt
    * round-robin into folds — per-stratum fold sizes are exactly balanced
    * (±1), unlike Bernoulli `fold = hash % k`, whose per-stratum counts
    * are only balanced in expectation.
    *
    * Membership is a pure function of (id, salt, the stratum's id set):
    * re-runs and retries agree; adding documents only reshuffles within
    * the stratum (the unavoidable cost of exact balance — fully stable
    * assignment under growth is what plain hash % k gives up balance for,
    * and both variants live here: use [[deterministicSample]]'s bucket for
    * that trade). One window per stratum partition — the q136 quota-sample
    * cost shape. */
  def cvFolds(df: DataFrame, idCol: String, stratumCol: String, k: Int,
              salt: String = "cv"): DataFrame = {
    require(k > 1, "need at least 2 folds")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(stratumCol))
      .orderBy(md5Int(concat(lit(salt), lit(":"), col(idCol).cast("string"))),
        col(idCol))
    df.withColumn("fold", ((row_number().over(w) - 1) % k).cast("long"))
  }

  /** Out-of-fold mean target encoding — the leakage-free way to turn a
    * high-cardinality categorical into a numeric feature: the encoding a
    * fold's rows receive is computed from the OTHER folds only, so a
    * row's own target never leaks into its feature ([[cvFolds]]' sibling:
    * folds partition the leakage, this consumes the partition).
    * Smoothing shrinks thin categories toward the fold's global prior:
    * enc = (oof_sum + m·prior) / (oof_n + m), prior = fold's
    * out-of-fold global mean — the standard mean-encoding regularizer.
    *
    * Scale shape: ONE aggregate to the (category, fold) grain — decimal
    * target sums, so partition order never shifts a bit — and everything
    * after operates on that tiny grain: per-category totals and per-fold
    * global totals are aggregates OF the grain frame, broadcast-joined
    * back. The fact table is scanned once; no window over row-grain data.
    *
    * Returns (cat, fold, n_oof, encoding) — encoding on a 6dp grid. */
  def targetEncodeOof(df: DataFrame, catCol: String, targetCol: String,
                      foldCol: String, smoothing: Double): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    import graft.queries.Qutil
    val cf = df.groupBy(col(catCol).as("cat"), col(foldCol).as("fold"))
      .agg(count(lit(1)).as("n"),
        sum(col(targetCol).cast(DecimalType(18, 4))).as("s"))
    val perCat = cf.groupBy("cat")
      .agg(sum("n").as("cat_n"), sum("s").as("cat_s"))
    val perFold = cf.groupBy("fold")
      .agg(sum("n").as("fold_n"), sum("s").as("fold_s"))
    val tot = cf.agg(sum("n").as("tot_n"), sum("s").as("tot_s"))
    cf.join(perCat, "cat").join(perFold, "fold").crossJoin(tot)
      .select(col("cat"), col("fold"),
        (col("cat_n") - col("n")).as("n_oof"),
        Qutil.dround(
          ((col("cat_s") - col("s")).cast("double") +
            lit(smoothing) *
              ((col("tot_s") - col("fold_s")).cast("double") /
                (col("tot_n") - col("fold_n")))) /
            ((col("cat_n") - col("n")) + lit(smoothing)), 6)
          .as("encoding"))
  }
}
