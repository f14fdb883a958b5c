package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.functions.TextFunctions._

/** Corpus-level statistics for training-data pipelines: vocabulary with
  * document frequencies, TF-IDF term salience, and per-label embedding
  * centroids.
  *
  * Scale design: token explosion is map-only; every aggregate is a
  * hash-partitioned groupBy with map-side combine (term and (doc, term)
  * grains); the corpus row count joins in as a broadcast single-row frame,
  * never a driver action; centroid math reaches the driver nowhere.
  */
object CorpusStats {

  /** One BPE training step: corpus-wide counts of adjacent character pairs
    * within words — the argmax pair is the merge a byte-pair-encoding
    * tokenizer would learn next (Sennrich et al., ACL'16). Two map-only
    * explodes (words, then in-word offsets) feeding one pair-grain hash
    * aggregate with map-side combine; the global top-k is
    * TakeOrderedAndProject, so a 100 TB corpus never sorts its full pair
    * table. Returns the k most frequent pairs with a dense 1-based rank
    * under the (count desc, pair asc) total order. */
  def bpePairCounts(docs: DataFrame, idCol: String, textCol: String,
                    k: Int): DataFrame = {
    val pairs = docs
      .select(explode(words(col(textCol))).as("w"))
      .where(length(col("w")) >= 2)
      .select(explode(sequence(lit(1), length(col("w")) - 1)).as("i"),
        col("w"))
      .select(expr("substring(w, i, 2)").as("pair"))
      .groupBy("pair").agg(count(lit(1)).as("cnt"))
    val top = pairs.orderBy(col("cnt").desc, col("pair").asc).limit(k)
    top.withColumn("rank", row_number().over(
        Window.orderBy(col("cnt").desc, col("pair").asc)))
      .select(col("pair"), col("cnt"), col("rank"))
  }

  /** Greedy left-to-right merge of ONE learned BPE pair (a, b) inside a
    * symbol array — an aggregate() fold, row-local, no explode. The fold
    * IS the greedy non-overlapping semantics: after a merge the trailing
    * symbol becomes a+b, which can never equal a (b is non-empty), so a
    * consumed occurrence can't chain into the next — "a a a a" merging
    * (a,a) yields (aa, aa), exactly Sennrich's reference behavior. */
  def bpeMergePair(syms: Column, a: String, b: String): Column =
    aggregate(syms, array().cast("array<string>"),
      // try_element_at: ANSI-safe probe of the (possibly empty) accumulator
      (acc, x) => when(try_element_at(acc, lit(-1)) === lit(a) && x === lit(b),
          concat(slice(acc, lit(1), size(acc) - 1),
            array(concat(element_at(acc, -1), x))))
        .otherwise(concat(acc, array(x))))

  /** Train `steps` BPE merges (Sennrich et al., ACL'16) and return the
    * merge list ((step, a, b, pairCount)) in learned order.
    *
    * Scale shape: training runs on the WORD-FREQUENCY table, not the
    * corpus — the one corpus-grain job is the initial word count; every
    * round after that explodes adjacent pairs of the vocab-grain symbol
    * table (freq-weighted) into one pair-grain hash aggregate, and the
    * only driver traffic per round is the single argmax row
    * (TakeOrdered, (count desc, a, b) total order — deterministic), the
    * same config-sized-model contract as k-means centroids. Exactly ONE
    * action runs per round — the argmax both learns the pair and
    * materializes the current vocab's cache, so the PREVIOUS generation
    * (no longer anyone's lineage parent) is released at the top of the
    * next round instead of paying a dedicated count() materialization
    * pass; plan growth is one row-local fold per round (linear, not
    * multiplicative — no lineage rebase needed at tokenizer-scale R). */
  def bpeTrain(docs: DataFrame, idCol: String, textCol: String,
               steps: Int): Seq[(Int, String, String, Long)] = {
    var vocab = docs.select(explode(words(col(textCol))).as("word"))
      .groupBy("word").agg(count(lit(1)).as("freq"))
      .withColumn("syms",
        transform(sequence(lit(1), length(col("word"))),
          i => col("word").substr(i, lit(1))))
      .persist()
    var prev: Option[DataFrame] = None
    val merges = Seq.newBuilder[(Int, String, String, Long)]
    var r = 1
    var done = false
    while (r <= steps && !done) {
      val top = vocab
        .where(size(col("syms")) >= 2)
        .select(col("freq"),
          explode(transform(sequence(lit(1), size(col("syms")) - 1),
            i => struct(element_at(col("syms"), i).as("a"),
              element_at(col("syms"), i + 1).as("b")))).as("p"))
        .groupBy(col("p.a").as("a"), col("p.b").as("b"))
        .agg(sum("freq").as("cnt"))
        .orderBy(col("cnt").desc, col("a"), col("b"))
        .limit(1).collect()
      // the collect materialized `vocab`; its parent is now lineage-dead
      prev.foreach(_.unpersist())
      if (top.isEmpty) done = true
      else {
        val (a, b, cnt) = (top(0).getString(0), top(0).getString(1), top(0).getLong(2))
        merges += ((r, a, b, cnt))
        val next = vocab.withColumn("syms", bpeMergePair(col("syms"), a, b)).persist()
        prev = Some(vocab)
        vocab = next
        r += 1
      }
    }
    vocab.unpersist()
    prev.foreach(_.unpersist())
    merges.result()
  }

  /** Apply a learned merge list to arbitrary text: chars → merges in
    * learned order, each a greedy row-local fold. One ordered pass per
    * merge is EXACT (not an approximation): merge r's pair references
    * only symbols buildable from merges < r, so applying later merges can
    * never create a new match for an earlier one — in particular,
    * encode(training corpus) reproduces the training-end symbol state.
    * Row-parallel and map-only: no shuffle, no window, no explode —
    * BpeSpec asserts the encode plan is Exchange-free. Returns
    * (idCol, tokens array<string>, n_tokens). */
  def bpeEncode(docs: DataFrame, idCol: String, textCol: String,
                merges: Seq[(String, String)]): DataFrame = {
    val ws = docs.select(col(idCol), words(col(textCol)).as("__ws"))
    val enc0: Column = transform(col("__ws"),
      w => transform(sequence(lit(1), length(w)), i => w.substr(i, lit(1))))
    val enc = merges.foldLeft(enc0) { case (arr, (a, b)) =>
      transform(arr, syms => bpeMergePair(syms, a, b))
    }
    ws.select(col(idCol), flatten(enc).as("tokens"))
      .withColumn("n_tokens", size(col("tokens")).cast("long"))
  }

  /** BM25 document relevance (Robertson; Lucene's idf form
    * ln(1 + (N − df + ½)/(df + ½))) for a bag of query terms — the
    * retrieval primitive of corpus curation: "find training docs about
    * X", retrieval-based decontamination triage, targeted sampling.
    *
    * Scale shape: the (doc, term) aggregate filters to the query terms
    * BEFORE grouping, so the corpus-wide token explode never shuffles
    * rows for non-query terms (matched-docs-sized, not corpus-sized);
    * doc lengths come from a semi-joined scan of only the matched docs;
    * the one full-corpus pass is the (N, Σdl) single-row aggregate,
    * broadcast; df is ≤ |terms| rows and broadcasts. Per-(doc,term)
    * scores are 6dp-rounded then decimal-summed per doc, so the total is
    * partition-order-independent and engine-exact (Qutil rules).
    * Returns (idCol, score, n_terms). */
  def bm25(docs: DataFrame, idCol: String, textCol: String, terms: Seq[String],
           k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val tf = docs.select(col(idCol), explode(words(col(textCol))).as("term"))
      .where(col("term").isInCollection(terms))
      .groupBy(col(idCol), col("term")).agg(count(lit(1)).as("tf"))
    val dl = docs.join(tf.select(col(idCol)).distinct(), Seq(idCol), "left_semi")
      .select(col(idCol), tokenCount(col(textCol)).cast("double").as("dl"))
    val stats = docs.agg(count(lit(1)).cast("double").as("__n"),
      sum(tokenCount(col(textCol))).cast("double").as("__sumdl"))
    bm25Score(tf, dl, stats, idCol, k1, b)
  }

  /** The BM25 arithmetic shared by the one-shot path ([[bm25]]) and the
    * index-at-rest path ([[bm25FromIndex]]): inputs are the (id, term, tf)
    * grain, matched-doc lengths, and the single-row corpus stats —
    * identical values through identical expressions, so the two paths are
    * bit-for-bit interchangeable (q128 hash-matches q93's oracle). */
  private def bm25Score(tf: DataFrame, dl: DataFrame, stats: DataFrame,
                        idCol: String, k1: Double, b: Double): DataFrame = {
    import graft.queries.Qutil
    val dfT = tf.groupBy("term").agg(count(lit(1)).cast("double").as("df"))
    val s = tf.join(dfT, "term").join(dl, Seq(idCol))
      .crossJoin(broadcast(stats))
      .select(col(idCol), Qutil.dround(
        log((col("__n") - col("df") + 0.5) / (col("df") + 0.5) + 1.0) *
          (col("tf") * (k1 + 1)) /
          (col("tf") + (lit(1d - b) + lit(b) * col("dl") / (col("__sumdl") / col("__n"))) * k1),
        6).as("s"))
    s.groupBy(col(idCol))
      .agg(sum(col("s").cast(DecimalType(18, 8))).cast("double").as("score"),
        count(lit(1)).as("n_terms"))
  }

  /** Inverted index AT REST: postings (id, term, tf) in a managed table
    * BUCKETED BY TERM, plus doc-length and single-row corpus-stats side
    * tables. The one-time build cost is [[docTermCounts]]' aggregate; the
    * payoff is at query time ([[bm25FromIndex]]). */
  def writeInvertedIndex(docs: DataFrame, idCol: String, textCol: String,
                         prefix: String, nBuckets: Int = 8): Unit = {
    graft.io.Writers.replaceBucketedTable(
      docTermCounts(docs, idCol, textCol), s"${prefix}_postings", "term", nBuckets)
    graft.io.Writers.replaceManagedTable(
      docs.select(col(idCol), tokenCount(col(textCol)).cast("double").as("dl")),
      s"${prefix}_doclen")
    graft.io.Writers.replaceManagedTable(
      docs.agg(count(lit(1)).cast("double").as("__n"),
        sum(tokenCount(col(textCol))).cast("double").as("__sumdl")),
      s"${prefix}_stats")
  }

  /** BM25 over the at-rest inverted index — the repeated-queries shape for
    * 100 TB retrieval: the corpus text is NEVER rescanned. The query-term
    * `isin` filter on the bucket column prunes the postings scan to the
    * terms' buckets (`SelectedBucketsCount` in the plan, spec-asserted),
    * so per-query cost is posting-list-sized: O(df(terms)) rows read, one
    * vocabulary-bounded df aggregate, one matched-doc semi-join against
    * the length table, stats as a broadcast single row. Scores are
    * bit-identical to [[bm25]] (shared [[bm25Score]]); rebuilding the
    * index after ingest is q102's incremental-index story, not a scoring
    * concern. */
  def bm25FromIndex(spark: org.apache.spark.sql.SparkSession, prefix: String,
                    idCol: String, terms: Seq[String],
                    k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val tf = spark.table(s"${prefix}_postings")
      .where(col("term").isInCollection(terms))
    val dl = spark.table(s"${prefix}_doclen")
      .join(tf.select(col(idCol)).distinct(), Seq(idCol), "left_semi")
    val stats = spark.table(s"${prefix}_stats")
    bm25Score(tf, dl, stats, idCol, k1, b)
  }

  /** Corpus vocabulary: one row per distinct token with total occurrences
    * (tf) and document frequency (df). Two aggregates, both map-side
    * combining: (doc, term) counts, then term-grain rollup. */
  def vocabulary(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docTermCounts(docs, idCol, textCol)
      .groupBy("term")
      .agg(sum("tf").as("tf"), count(lit(1)).as("df"))

  /** (doc, term) occurrence counts — the shared TF grain. */
  def docTermCounts(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol), explode(words(col(textCol))).as("term"))
      .groupBy(col(idCol), col("term"))
      .agg(count(lit(1)).as("tf"))

  /** Top-k TF-IDF terms per document — the classic "what is this document
    * about" salience measure, smooth-idf form:
    * score = tf · (ln((N+1)/(df+1)) + 1).
    *
    * N rides along as a broadcast single-row frame (no driver action).
    * The dominant exchange is the tf⋈df join keyed on term; df is
    * vocabulary-sized, so AQE broadcasts it when it fits and falls back to
    * the keyed shuffle when a 100 TB vocabulary doesn't. Ties break on the
    * term string, so output is total-order deterministic. */
  def tfidfTopTerms(docs: DataFrame, idCol: String, textCol: String,
                    k: Int): DataFrame = {
    val tf = docTermCounts(docs, idCol, textCol)
    val df = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val n = docs.agg(count(lit(1)).as("__n"))
    val scored = tf.join(df, "term")
      .crossJoin(broadcast(n))
      .withColumn("score",
        col("tf") * (log((col("__n") + 1.0) / (col("df") + 1.0)) + 1.0))
    val w = Window.partitionBy(idCol).orderBy(col("score").desc, col("term").asc)
    scored.withColumn("rn", row_number().over(w)).where(col("rn") <= k)
      .select(col(idCol), col("term"), col("tf"), col("df"), col("score"))
  }

  /** Collocation mining: top-k term PAIRS by pointwise mutual information
    * over document co-occurrence — PMI(a,b) = ln(n_ab·N / (n_a·n_b)) on
    * doc-level incidence. The pair space is bounded BEFORE the self-join:
    * only the `topTerms` highest-df terms (TakeOrdered — k rows to the
    * driver, deterministic (df desc, term) order) enter, so candidate
    * pairs are ≤ topTerms² regardless of corpus size and the join is
    * doc-keyed equi over a filtered incidence ≤ topTerms rows per doc.
    * The unfiltered alternative explodes quadratically in per-doc
    * vocabulary — the classic collocation-job OOM. N rides as a broadcast
    * single row; ln rounds to the 6dp grid (the q61 libm rule). */
  def pmiPairs(docs: DataFrame, idCol: String, textCol: String,
               topTerms: Int, k: Int): DataFrame = {
    import graft.queries.Qutil
    val inc = docs.select(col(idCol), explode(words(col(textCol))).as("term"))
      .distinct()
    val dfT = inc.groupBy("term").agg(count(lit(1)).as("df"))
      .orderBy(col("df").desc, col("term")).limit(topTerms)
    val filtered = inc.join(broadcast(dfT), "term")
    val pairs = filtered.as("a").join(filtered.as("b"),
        col(s"a.$idCol") === col(s"b.$idCol") && col("a.term") < col("b.term"))
      .groupBy(col("a.term").as("term_a"), col("b.term").as("term_b"),
        col("a.df").as("df_a"), col("b.df").as("df_b"))
      .agg(count(lit(1)).as("n_ab"))
    val n = docs.agg(count(lit(1)).as("__n"))
    pairs.crossJoin(broadcast(n))
      .withColumn("pmi", Qutil.dround(
        log(col("n_ab").cast("double") * col("__n").cast("double") /
          (col("df_a").cast("double") * col("df_b").cast("double"))), 6))
      .orderBy(col("pmi").desc, col("term_a"), col("term_b")).limit(k)
      .select("term_a", "term_b", "n_ab", "df_a", "df_b", "pmi")
  }

  /** Unigram language-model quality scoring (the CCNet/KenLM-style filter
    * stage, reduced to order 1 so it stays SQL-replayable): train unigram
    * counts on a REFERENCE corpus, score every document by its per-token
    * cross-entropy under the add-one-smoothed model,
    * xent = −Σ ln((cnt(t)+1)/(N+V)) / n_tokens. Low xent ⇒ reference-like
    * text; high xent ⇒ rare/garbled tokens — the standard keep/drop dial.
    * Also emits n_tokens and the out-of-vocabulary count.
    *
    * Determinism: each per-token ln runs on an identical integer-derived
    * double in any engine and is rounded to 6dp BEFORE the per-doc sum,
    * which then accumulates as DECIMAL — order-independent and
    * cross-engine exact (the trainCentroids quantize-then-decimal rule,
    * because a plain double Σln over thousands of tokens re-orders under
    * partitioning and drifts in the last ulps).
    *
    * Scale: token explode is map-only; the model join keys on term with a
    * vocabulary-sized right side (AQE broadcasts it when it fits — q48's
    * inventory row); N/V ride as a broadcast single-row frame; one
    * doc-grain aggregate. Nothing driver-side. */
  def unigramLogLoss(docs: DataFrame, idCol: String, textCol: String,
                     ref: DataFrame, refTextCol: String): DataFrame = {
    val tok = docs.select(col(idCol), explode(words(col(textCol))).as("term"))
    val model = ref.select(explode(words(col(refTextCol))).as("term"))
      .groupBy("term").agg(count(lit(1)).as("cnt"))
    val stats = model.agg(sum("cnt").as("__N"), count(lit(1)).as("__V"))
    val lp = tok.join(model, Seq("term"), "left")
      .crossJoin(broadcast(stats))
      .select(col(idCol),
        graft.queries.Qutil.dround(
          log((coalesce(col("cnt"), lit(0L)) + lit(1.0)) /
            (col("__N") + col("__V"))), 6).as("lp"),
        when(col("cnt").isNull, 1L).otherwise(0L).as("oov"))
    val agg = lp.groupBy(col(idCol)).agg(
      count(lit(1)).as("n_tokens"),
      sum("oov").as("n_oov"),
      sum(col("lp").cast(DecimalType(38, 8))).cast("double").as("__slp"))
    docs.select(col(idCol)).join(agg, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
        coalesce(col("n_oov"), lit(0L)).as("n_oov"),
        when(col("n_tokens").isNull || col("n_tokens") === 0, lit(0.0))
          .otherwise(graft.queries.Qutil.dround(
            -col("__slp") / col("n_tokens"), 6)).as("xent"))
  }

  /** Adjacent word pairs of a word-array column as struct(prev, cur) —
    * empty for 0/1-word docs (guarded: Spark's `sequence(2, 1)` would
    * DESCEND, not return empty). */
  private def wordPairs(ws: Column): Column =
    when(size(ws) >= 2,
      transform(sequence(lit(2), size(ws)), i =>
        struct(element_at(ws, i - 1).as("prev"), element_at(ws, i).as("cur"))))
      .otherwise(array().cast("array<struct<prev:string,cur:string>>"))

  /** Order-2 refinement of `unigramLogLoss`: interpolated add-one bigram
    * cross-entropy, p(w|prev) = λ·(c₂(prev,w)+1)/(c(prev)+V)
    * + (1−λ)·(c(w)+1)/(N+V); the first token scores under the unigram
    * term alone. Catches fluent-vocabulary-but-scrambled-order text that
    * per-token unigram scoring cannot (same bag of words ⇒ same q61
    * score). λ defaults to 0.5 — a dyadic double, so λ and 1−λ are exact
    * and the oracle's literals reproduce them bit-for-bit.
    *
    * Same determinism discipline as q61 (6dp-round each ln, decimal-sum);
    * same scale shape plus one extra model join keyed on (prev, cur) —
    * the bigram model is reference-corpus-bounded, so AQE broadcasts it
    * alongside the unigram vocabulary. */
  def bigramLogLoss(docs: DataFrame, idCol: String, textCol: String,
                    ref: DataFrame, refTextCol: String,
                    lambda: Double = 0.5): DataFrame = {
    require(lambda == 0.5 || lambda == 0.25 || lambda == 0.75,
      "lambda must be dyadic so 1-lambda is exact cross-engine")
    val dw = docs.select(col(idCol), words(col(textCol)).as("__ws"))
    val uni = ref.select(explode(words(col(refTextCol))).as("term"))
      .groupBy("term").agg(count(lit(1)).as("cnt"))
    val stats = uni.agg(sum("cnt").as("__N"), count(lit(1)).as("__V"))
    val bi = ref.select(explode(wordPairs(words(col(refTextCol)))).as("p"))
      .groupBy(col("p.prev").as("prev"), col("p.cur").as("cur"))
      .agg(count(lit(1)).as("cnt2"))
    val firstLp = dw.where(size(col("__ws")) >= 1)
      .select(col(idCol), element_at(col("__ws"), 1).as("term"))
      .join(uni, Seq("term"), "left")
      .crossJoin(broadcast(stats))
      .select(col(idCol), graft.queries.Qutil.dround(
        log((coalesce(col("cnt"), lit(0L)) + lit(1.0)) /
          (col("__N") + col("__V"))), 6).as("lp"))
    val pairLp = dw.select(col(idCol), explode(wordPairs(col("__ws"))).as("p"))
      .select(col(idCol), col("p.prev").as("prev"), col("p.cur").as("cur"))
      .join(bi, Seq("prev", "cur"), "left")
      .join(uni.select(col("term").as("prev"), col("cnt").as("__cp")), Seq("prev"), "left")
      .join(uni.select(col("term").as("cur"), col("cnt").as("__cc")), Seq("cur"), "left")
      .crossJoin(broadcast(stats))
      .select(col(idCol), graft.queries.Qutil.dround(
        log(lit(lambda) * (coalesce(col("cnt2"), lit(0L)) + lit(1.0)) /
              (coalesce(col("__cp"), lit(0L)) + col("__V")) +
            lit(1.0 - lambda) * (coalesce(col("__cc"), lit(0L)) + lit(1.0)) /
              (col("__N") + col("__V"))), 6).as("lp"))
    val agg = firstLp.unionByName(pairLp).groupBy(col(idCol)).agg(
      count(lit(1)).as("n_tokens"),
      sum(col("lp").cast(DecimalType(38, 8))).cast("double").as("__slp"))
    docs.select(col(idCol)).join(agg, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
        when(col("n_tokens").isNull || col("n_tokens") === 0, lit(0.0))
          .otherwise(graft.queries.Qutil.dround(
            -col("__slp") / col("n_tokens"), 6)).as("xent"))
  }

  /** Per-document repetition statistics — the Gopher/MassiveText-style
    * quality signals that catch degenerate generated/boilerplate text:
    *  - dup_word_ratio: 1 − distinct words / total words
    *  - top_bigram_ratio: occurrences of the most frequent word bigram /
    *    total bigrams (0 for docs with < 2 words)
    * One map-only explode to the (doc, bigram) grain plus two map-side
    * combining aggregates; nothing is corpus-global, so this rides the
    * scan like the other quality filters. */
  def repetitionStats(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val base = docs.select(col(idCol), words(col(textCol)).as("__ws"))
    val wordStats = base.select(col(idCol),
      size(col("__ws")).cast("long").as("n_words"),
      size(array_distinct(col("__ws"))).cast("long").as("n_distinct_words"))
    val bigrams = base
      .select(col(idCol), explode(when(size(col("__ws")) < 2,
          array().cast("array<string>"))
        .otherwise(transform(sequence(lit(0), size(col("__ws")) - 2),
          i => concat_ws(" ", slice(col("__ws"), i + 1, lit(2)))))).as("bg"))
    val bigramStats = bigrams
      .groupBy(col(idCol), col("bg")).agg(count(lit(1)).as("n"))
      .groupBy(col(idCol))
      .agg(sum("n").as("n_bigrams"), max("n").as("top_bigram_n"))
    wordStats.join(bigramStats, Seq(idCol), "left")
      .select(col(idCol),
        col("n_words"),
        when(col("n_words") === 0, lit(0d))
          .otherwise(lit(1d) - col("n_distinct_words").cast("double") / col("n_words"))
          .as("dup_word_ratio"),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        when(coalesce(col("n_bigrams"), lit(0L)) === 0, lit(0d))
          .otherwise(col("top_bigram_n").cast("double") / col("n_bigrams"))
          .as("top_bigram_ratio"))
  }

  /** Corpus composition report: per (source, lang) doc counts, token
    * totals, and mean quality — the mixture table a data-curation run
    * publishes before sampling rates are chosen (the q43 stratified-sample
    * input). Quality means go through quantize+decimal sums (msum rule) so
    * the report is bit-reproducible. One aggregate, map-side combining. */
  def compositionReport(docs: DataFrame, sourceCol: String, langCol: String,
                        textCol: String, stopwords: Seq[String]): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val quality = graft.queries.Qutil.dround(qualityScore(col(textCol), stopwords), 4)
    docs
      .select(col(sourceCol), col(langCol),
        tokenCount(col(textCol)).cast("long").as("__tok"),
        quality.cast(DecimalType(38, 6)).as("__q"))
      .groupBy(col(sourceCol), col(langCol))
      .agg(
        count(lit(1)).as("n_docs"),
        sum("__tok").as("n_tokens"),
        (sum("__q").cast("double") / count(lit(1))).as("mean_quality"))
  }

  /** Per-label embedding centroids in long form: (label, pos, c, n) where
    * c is the mean of component `pos` (1-based) over the label's vectors.
    * The corpus-analysis primitive behind cluster quality checks, per-class
    * mean vectors, and drift monitoring.
    *
    * Determinism contract: float sums are order-dependent in the last ulps,
    * and aggregation order is nondeterministic in any parallel engine — so
    * each component is first quantized to `quantize` decimal places and
    * summed as DECIMAL (exact, associative, order-independent; the Qutil
    * msum rule). The mean is therefore bit-identical across engines and
    * re-runs; the quantization (default 1e-6 on unit-scale embeddings) is
    * far below any embedding's meaningful resolution. One map-only
    * posexplode + one hash aggregate; shuffle carries (label, pos) cells. */
  def labelCentroids(df: DataFrame, labelCol: String, vecCol: String,
                     quantize: Int = 6): DataFrame = {
    val q = graft.queries.Qutil.dround(col("x"), quantize)
    df.select(col(labelCol), posexplode(col(vecCol).cast("array<double>"))
        .as(Seq("pos", "x")))
      .withColumn("pos", (col("pos") + 1).cast("long"))
      .withColumn("xq", q.cast(DecimalType(38, quantize + 2)))
      .groupBy(col(labelCol), col("pos"))
      .agg((sum("xq").cast("double") / count(lit(1))).as("c"),
        count(lit(1)).as("n"))
  }

  /** TF-IDF query-likelihood score for a bag of query terms — the lexical
    * twin of [[bm25]] under the smooth-idf form tfidfTopTerms uses:
    * score(d) = Σ_{t∈terms} tf_{d,t} · (ln((N+1)/(df_t+1)) + 1). Same
    * scale shape as bm25: term filter BEFORE the (doc, term) aggregate so
    * shuffles are matched-docs-sized; df and N broadcast; per-term scores
    * 6dp-rounded then decimal-summed (Qutil). Returns (idCol, score,
    * n_terms). */
  def tfidfQueryScore(docs: DataFrame, idCol: String, textCol: String,
                      terms: Seq[String]): DataFrame = {
    import graft.queries.Qutil
    val tf = docs.select(col(idCol), explode(words(col(textCol))).as("term"))
      .where(col("term").isInCollection(terms))
      .groupBy(col(idCol), col("term")).agg(count(lit(1)).as("tf"))
    val dfT = tf.groupBy("term").agg(count(lit(1)).cast("double").as("df"))
    val n = docs.agg(count(lit(1)).cast("double").as("__n"))
    tf.join(broadcast(dfT), "term").crossJoin(broadcast(n))
      .select(col(idCol), Qutil.dround(
        col("tf") * (log((col("__n") + 1.0) / (col("df") + 1.0)) + 1.0),
        6).as("s"))
      .groupBy(col(idCol))
      .agg(sum(col("s").cast(DecimalType(18, 8))).cast("double").as("score"),
        count(lit(1)).as("n_terms"))
  }

  /** Reciprocal-rank fusion (Cormack et al., SIGIR'09) of several scored
    * retrieval lists into one ranking:
    * fused(d) = Σ_lists 1/(rrfK + rank_list(d)), summed over the lists that
    * retrieved d. The standard way to combine retrieval signals with
    * incomparable score scales (BM25 vs TF-IDF vs embedding cosine) without
    * calibration — only ranks cross the boundary.
    *
    * Each input is (idCol, scoreCol); its rank is row_number under the
    * (score desc, id asc) total order, so fusion is deterministic given
    * deterministic scores (callers 6dp-round upstream, the Qutil rule).
    * Each reciprocal is 6dp-rounded then decimal-summed — order-independent
    * and engine-exact. Top-k lands via TakeOrdered, never a global sort.
    *
    * Scale shape: each ranking is matched-docs-sized (retrieval output,
    * not corpus), its rank window partitions nothing — but a single-
    * partition window over a RETRIEVED LIST is list-sized, the same
    * contract as every top-k retrieval stage; the union + id-grain
    * aggregate shuffles list-sized rows only. */
  def rrfFuse(rankings: Seq[DataFrame], idCol: String, scoreCol: String,
              k: Int, rrfK: Int = 60): DataFrame = {
    require(rankings.nonEmpty, "need at least one ranking")
    require(rrfK >= 1, "rrfK must be >= 1")
    import graft.queries.Qutil
    val contribs = rankings.map { r =>
      val w = Window.orderBy(col(scoreCol).desc, col(idCol).asc)
      r.select(col(idCol), col(scoreCol))
        .withColumn("__rank", row_number().over(w))
        .select(col(idCol),
          Qutil.dround(lit(1.0) / (lit(rrfK) + col("__rank")), 6).as("__c"))
    }
    contribs.reduce(_ unionByName _)
      .groupBy(col(idCol))
      .agg(sum(col("__c").cast(DecimalType(18, 8))).cast("double").as("rrf"),
        count(lit(1)).as("n_lists"))
      .orderBy(col("rrf").desc, col(idCol).asc)
      .limit(k)
  }

  /** Positional inverted index: (token, doc_id, pos) with 0-based word
    * positions — the structure phrase and proximity queries need beyond
    * q128's frequency-only postings. Map-only explode; at rest it would
    * bucket by token exactly as the BM25 index does. */
  def positionalIndex(docs: DataFrame, idCol: String,
                      textCol: String): DataFrame =
    docs.select(col(idCol).as("doc_id"),
        posexplode(words(col(textCol))).as(Seq("pos", "token")))
      .select(col("token"), col("doc_id"), col("pos"))

  /** Exact phrase search over a positional index: occurrences of the
    * n-term phrase are positions where every slot k's posting list
    * contains (doc, start + k) — the classic positional-intersection
    * query, n−1 equi-joins on (doc_id, normalized start), never a scan
    * of the documents themselves.
    *
    * Join order is RARE-TERM-FIRST: posting lists are intersected in
    * ascending document-frequency order, so the running intermediate is
    * bounded by the rarest term's postings from the first join on — the
    * standard IR trick that makes "the <rare-word> the" cheap even when
    * "the" has a trillion postings (a left-to-right chain would carry
    * the most frequent slot's list through the whole pipeline).
    * Left-semi joins keep occurrence starts only, so nothing widens.
    * The df probe is one aggregate over the phrase terms' postings
    * (n rows to the driver — config-sized).
    *
    * Returns (doc_id, start) — one row per occurrence; overlapping
    * occurrences each count. */
  def phraseSearch(index: DataFrame, phrase: Seq[String]): DataFrame = {
    require(phrase.nonEmpty, "empty phrase")
    val dfs = index.where(col("token").isin(phrase.distinct: _*))
      .groupBy("token").agg(count(lit(1)).as("df"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // a term absent from the corpus ⇒ no occurrences; keep the plan shape
    // (the first where() below yields the empty frame naturally)
    val slots = phrase.zipWithIndex
      .sortBy { case (t, k) => (dfs.getOrElse(t, 0L), k) }
    def postings(t: String, k: Int): DataFrame =
      index.where(col("token") === t)
        .select(col("doc_id"), (col("pos") - k).as("start"))
    val (t0, k0) = slots.head
    slots.tail.foldLeft(postings(t0, k0)) { case (cur, (t, k)) =>
      cur.join(postings(t, k), Seq("doc_id", "start"), "left_semi")
    }
  }
}
