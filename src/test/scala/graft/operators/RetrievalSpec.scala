package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

class RetrievalSpec extends SparkSpec {
  import spark.implicits._

  test("bm25 matches a hand computation and scores only matched docs") {
    val docs = Seq(
      (1L, "spark spark query engine"),   // spark×2, query×1, dl=4
      (2L, "stream processing engine"),   // no query terms... wait: stream
      (3L, "plain text nothing here"))    // no query terms
      .toDF("doc_id", "text")
    val out = CorpusStats.bm25(docs, "doc_id", "text",
        Seq("spark", "query"), k1 = 1.2, b = 0.75)
      .collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getLong(2))).toMap
    assert(out.keySet == Set(1L)) // docs 2,3 contain no query term
    // hand: N=3, avgdl=(4+3+4)/3; term spark: df=1, tf=2; term query: df=1, tf=1
    val n = 3.0; val avgdl = 11.0 / 3.0
    val idf = math.log((n - 1 + 0.5) / (1 + 0.5) + 1.0)
    def round6(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6
    def s(tf: Double) = // (1.2 + 1), not 2.2 — the operator's exact double
      round6(idf * (tf * (1.2 + 1)) / (tf + (0.25 + 0.75 * 4.0 / avgdl) * 1.2))
    assert(out(1L)._2 == 2L)
    assert(math.abs(out(1L)._1 - (s(2) + s(1))) < 1e-9)
  }

  test("classifierQuality: monotone in stopword signal, threshold is exact on the 6dp grid") {
    val sw = graft.functions.TextFunctions.langStopwords.head._2
    val docs = Seq(
      (1L, "the a of and to in is the a of"),  // all stopwords
      (2L, "zz qq ww ee rr tt yy uu ii oo"))   // none
      .toDF("doc_id", "text")
    val out = Curation.classifierQuality(docs, "doc_id", "text",
        (1.5, 2.0, -3.0, 1.0), -1.2, sw, threshold = 0.5)
      .select("doc_id", "p_quality", "keep")
      .collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getInt(2))).toMap
    assert(out(1L)._1 > out(2L)._1) // stopword-rich text scores higher
    // p is on the 6dp grid, so the keep flag is a pure function of it
    out.values.foreach { case (p, keep) =>
      assert(p == math.floor(p * 1e6 + 0.5) / 1e6)
      assert(keep == (if (p >= 0.5) 1 else 0))
    }
  }

  test("classifierQuality is map-only: no Exchange in the plan") {
    val sw = Seq("the")
    val docs = Seq((1L, "the end")).toDF("doc_id", "text")
    val plan = Curation.classifierQuality(docs, "doc_id", "text",
        (1.0, 1.0, 1.0, 1.0), 0.0, sw, 0.5)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
  }

  test("rrfFuse: hand-computed fusion, single-list docs, top-k boundary") {
    // list 1 ranks: a=1, b=2, c=3 ; list 2 ranks: b=1, a=2 (no c)
    val l1 = Seq(("a", 9.0), ("b", 5.0), ("c", 1.0)).toDF("id", "score")
    val l2 = Seq(("b", 7.0), ("a", 3.0)).toDF("id", "score")
    val out = CorpusStats.rrfFuse(Seq(l1, l2), "id", "score", 10, rrfK = 60)
      .select("id", "rrf", "n_lists").as[(String, Double, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    def r(k: Int) = math.floor(1.0 / (60 + k) * 1e6 + 0.5) / 1e6
    assert(out("a") == ((r(1) + r(2), 2L)))
    assert(out("b") == ((r(2) + r(1), 2L)))
    assert(out("c") == ((r(3), 1L)))
    // a and b tie exactly (same reciprocal pair) — id breaks the tie;
    // k=2 keeps the tied pair and drops the single-list doc
    val top2 = CorpusStats.rrfFuse(Seq(l1, l2), "id", "score", 2)
      .select("id").as[String].collect().toSeq
    assert(top2 == Seq("a", "b"))
  }

  test("tfidfQueryScore: hand computation; only matched docs; term filter pushes down") {
    val docs = Seq(
      (1L, "spark spark query"), (2L, "spark other words"), (3L, "nothing here"))
      .toDF("doc_id", "text")
    val out = CorpusStats.tfidfQueryScore(docs, "doc_id", "text", Seq("spark", "query"))
      .select("doc_id", "score").as[(Long, Double)].collect().toMap
    assert(out.keySet == Set(1L, 2L))
    def idf(df: Long) = math.log(4.0 / (df + 1.0)) + 1.0
    def rd(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6
    assert(math.abs(out(1L) - (rd(2 * idf(2)) + rd(1 * idf(1)))) < 1e-9)
    assert(math.abs(out(2L) - rd(1 * idf(2))) < 1e-9)
  }
}
