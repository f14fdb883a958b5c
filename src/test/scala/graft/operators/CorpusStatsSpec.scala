package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

class CorpusStatsSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "spark spark shuffle"),
    (2L, "spark partitions"),
    (3L, "quantum entanglement")).toDF("doc_id", "text")

  test("vocabulary counts tf and df at the right grains") {
    val v = CorpusStats.vocabulary(docs, "doc_id", "text")
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(v("spark") == ((3L, 2L)))       // 3 occurrences across 2 docs
    assert(v("shuffle") == ((1L, 1L)))
    assert(v("quantum") == ((1L, 1L)))
  }

  test("tfidfTopTerms ranks distinctive terms above common ones") {
    val top = CorpusStats.tfidfTopTerms(docs, "doc_id", "text", 1)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    // doc 1: tf(spark)=2 beats shuffle despite spark's higher df
    assert(top(1L) == "spark")
    // doc 2: both tf=1 → the rarer term (partitions, df=1) wins on idf
    assert(top(2L) == "partitions")
  }

  test("tfidf score formula matches the smooth-idf definition") {
    val row = CorpusStats.tfidfTopTerms(docs, "doc_id", "text", 5)
      .where($"doc_id" === 1L && $"term" === "spark").head()
    val expected = 2.0 * (math.log(4.0 / 3.0) + 1.0) // tf=2, N=3, df=2
    assert(math.abs(row.getAs[Double]("score") - expected) < 1e-12)
  }

  test("unigramLogLoss: OOV-heavy docs score worse; empty doc scores 0") {
    val corpus = Seq(
      (1L, "spark shuffle spark shuffle"),   // reference-like
      (2L, "spark shuffle partitions"),      // reference
      (3L, "zq xv qqq zzz"),                 // all OOV vs reference
      (4L, "")).toDF("doc_id", "text")
    val ref = corpus.where($"doc_id" === 2L)
    val out = CorpusStats.unigramLogLoss(corpus, "doc_id", "text", ref, "text")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(out(4L) == ((0L, 0L, 0.0)))              // empty → zero row
    assert(out(2L)._2 == 0L)                        // reference: no OOV
    assert(out(3L)._2 == 4L)                        // every token OOV
    assert(out(3L)._3 > out(1L)._3)                 // garbage > fluent
    assert(out(1L)._3 > 0.0)
    // deterministic under re-run (decimal-summed rounded logs)
    val again = CorpusStats.unigramLogLoss(corpus, "doc_id", "text", ref, "text")
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(out.view.mapValues(_._3).toMap == again)
  }

  test("bigramLogLoss: scrambled word order scores worse; unigram is blind to it") {
    val ref = Seq((100L, "the spark shuffle moves the data the spark shuffle moves the data"))
      .toDF("doc_id", "text")
    val corpus = Seq(
      (1L, "the spark shuffle moves the data"),  // reference word order
      (2L, "data the moves shuffle spark the"),  // same bag, scrambled
      (3L, "")).toDF("doc_id", "text")
    val uni = CorpusStats.unigramLogLoss(corpus, "doc_id", "text", ref, "text")
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    val bi = CorpusStats.bigramLogLoss(corpus, "doc_id", "text", ref, "text")
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(uni(1L) == uni(2L))    // unigram: identical bags, identical score
    assert(bi(2L) > bi(1L))       // bigram: scrambled order costs entropy
    assert(bi(3L) == 0.0)
    assert(bi(1L) < uni(1L) + 3)  // sane magnitude, not runaway
  }

  test("repetitionStats flags degenerate repetition, not normal prose") {
    val d = Seq(
      (1L, "buy now buy now buy now buy now"),      // heavy repetition
      (2L, "a perfectly ordinary sentence with distinct words"),
      (3L, "")).toDF("doc_id", "text")
    val r = CorpusStats.repetitionStats(d, "doc_id", "text")
      .collect().map(x => x.getLong(0) ->
        (x.getAs[Long]("n_words"), x.getAs[Double]("dup_word_ratio"),
         x.getAs[Long]("n_bigrams"), x.getAs[Double]("top_bigram_ratio"))).toMap
    assert(r(1L)._1 == 8L && r(1L)._2 == 0.75)      // 2 distinct / 8 words
    assert(r(1L)._4 == 4.0 / 7.0)                   // "buy now" 4 of 7 bigrams
    assert(r(2L)._2 == 0.0 && r(2L)._4 < 0.2)
    assert(r(3L) == ((0L, 0.0, 0L, 0.0)))           // empty doc → zeros
  }

  test("dedupeAgainstIndex drops known fingerprints and intra-batch dups") {
    val index = Seq("already ingested doc").toDF("text")
      .select(graft.functions.TextFunctions.fingerprint($"text").as("fp"))
    val batch = Seq(
      (10L, "Already ingested DOC!"),   // fp matches index → dropped
      (11L, "fresh content one"),
      (12L, "Fresh   content ONE"),     // intra-batch dup of 11 → dropped
      (13L, "fresh content two")).toDF("doc_id", "text")
    val out = Dedup.dedupeAgainstIndex(batch, "doc_id", "text", index)
      .select("doc_id").as[Long].collect().toSet
    assert(out == Set(11L, 13L))
  }

  test("labelCentroids: exact mean per component, deterministic under re-run") {
    val emb = Seq(
      (0, Array(1.0f, 0.0f)),
      (0, Array(0.0f, 1.0f)),
      (1, Array(0.5f, 0.5f))).toDF("label", "embedding")
    val c = CorpusStats.labelCentroids(emb, "label", "embedding")
      .collect().map(r => (r.getInt(0), r.getLong(1)) ->
        (r.getAs[Double]("c"), r.getAs[Long]("n"))).toMap
    assert(c((0, 1L)) == ((0.5, 2L)) && c((0, 2L)) == ((0.5, 2L)))
    assert(c((1, 1L)) == ((0.5, 1L)) && c((1, 2L)) == ((0.5, 1L)))
    // repartitioned input (different aggregation order) → identical doubles,
    // the decimal-sum determinism contract
    val c2 = CorpusStats.labelCentroids(emb.repartition(7), "label", "embedding")
      .collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getAs[Double]("c")).toMap
    assert(c.forall { case (k, (v, _)) => c2(k) == v })
  }

  test("phraseSearch: adjacency only, overlaps count, repeated terms, absent term") {
    val docs = Seq(
      (1L, "a b c a b"),      // "a b" at 0 and 3; "b c" at 1
      (2L, "a x b"),          // non-adjacent a..b — no match
      (3L, "a a a"),          // overlapping "a a" at 0 and 1
      (4L, "")
    ).toDF("doc_id", "text")
    val idx = CorpusStats.positionalIndex(docs, "doc_id", "text")
    def occ(p: String*) =
      CorpusStats.phraseSearch(idx, p).as[(Long, Long)].collect().toSet
    assert(occ("a", "b") == Set((1L, 0L), (1L, 3L)))
    assert(occ("a", "b", "c") == Set((1L, 0L)))
    assert(occ("a", "a") == Set((3L, 0L), (3L, 1L))) // overlapping hits
    assert(occ("a", "zzz").isEmpty)                  // absent term
    assert(occ("b") == Set((1L, 1L), (1L, 4L), (2L, 2L))) // single-term
  }
}
