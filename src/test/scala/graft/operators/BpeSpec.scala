package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

class BpeSpec extends SparkSpec {
  import spark.implicits._

  test("bpeTrain learns hand-verifiable merges in (count desc, pair) order") {
    // "low" ×3, "lower" ×2, "newest" ×1
    val docs = Seq((1L, "low low lower"), (2L, "low lower newest"))
      .toDF("doc_id", "text")
    val merges = CorpusStats.bpeTrain(docs, "doc_id", "text", steps = 3)
    // pair counts round 1: (l,o)=5, (o,w)=5, (w,e)=3, ... → tie on count
    // breaks lexicographically: (l,o) first
    assert(merges(0) == ((1, "l", "o", 5L)))
    // round 2: ("lo","w") now counts 5 — the merged symbol feeds the next
    // round; everything else is ≤ 3
    assert(merges(1) == ((2, "lo", "w", 5L)))
    // round 3: ("low" as prefix of lower) (low,e)=2+? vs (e,r)=2, (w,e)... :
    // remaining pairs: lower→(low,e),(e,r); newest→(n,e),(e,w),(w,e),(e,s),(s,t)
    // max count 2: (e,r) from lower×2 and (low,e) from lower×2 → lex: "e" < "low"
    assert(merges(2) == ((3, "e", "r", 2L)))
  }

  test("bpeMergePair is greedy left-to-right: 'a a a a' merging (a,a) → (aa, aa)") {
    val df = Seq(Tuple1(Seq("a", "a", "a", "a", "b", "a", "a"))).toDF("syms")
    val out = df.select(CorpusStats.bpeMergePair(col("syms"), "a", "a").as("m"))
      .as[Seq[String]].head()
    assert(out == Seq("aa", "aa", "b", "aa"))
  }

  test("encode reproduces the training-end symbol state on the training corpus") {
    val docs = Seq((1L, "low low lower"), (2L, "low lower newest lows"))
      .toDF("doc_id", "text")
    val merges = CorpusStats.bpeTrain(docs, "doc_id", "text", steps = 4)
    val enc = CorpusStats.bpeEncode(docs, "doc_id", "text",
      merges.map { case (_, a, b, _) => (a, b) })
    // independent check: re-derive the per-word final symbols by folding
    // the merge list over chars driver-side and compare token streams
    def fold(word: String): Seq[String] =
      merges.foldLeft(word.map(_.toString): Seq[String]) { case (syms, (_, a, b, _)) =>
        syms.foldLeft(Vector.empty[String]) { (acc, x) =>
          if (acc.nonEmpty && acc.last == a && x == b)
            acc.init :+ (acc.last + x)
          else acc :+ x
        }
      }
    val want = Map(
      1L -> Seq("low", "low", "lower").flatMap(fold),
      2L -> Seq("low", "lower", "newest", "lows").flatMap(fold))
    val got = enc.select("doc_id", "tokens").as[(Long, Seq[String])]
      .collect().toMap
    assert(got == want)
    assert(enc.where(col("n_tokens") =!= size(col("tokens"))).count() == 0)
  }

  test("bpeMergePair ≡ reference greedy fold on 200 seeded random symbol arrays") {
    val rnd = new scala.util.Random(42)
    // alphabet includes the merged symbol "ab" itself — the adversarial
    // cases where a fold could wrongly re-merge or miss a boundary
    val alphabet = Vector("a", "b", "ab", "c")
    val cases = (0 until 200).map { i =>
      i -> Seq.fill(rnd.nextInt(12))(alphabet(rnd.nextInt(4)))
    }
    def ref(syms: Seq[String]): Seq[String] =
      syms.foldLeft(Vector.empty[String]) { (acc, x) =>
        if (acc.nonEmpty && acc.last == "a" && x == "b") acc.init :+ (acc.last + x)
        else acc :+ x
      }
    val got = cases.toDF("i", "syms")
      .select(col("i"), CorpusStats.bpeMergePair(col("syms"), "a", "b").as("m"))
      .as[(Int, Seq[String])].collect().toMap
    cases.foreach { case (i, s) =>
      assert(got(i) == ref(s), s"case $i: input $s")
    }
  }

  test("encode is row-parallel and map-only: no Exchange in the plan") {
    val docs = Seq((1L, "low lower"), (2L, "newest low")).toDF("doc_id", "text")
    val enc = CorpusStats.bpeEncode(docs, "doc_id", "text",
      Seq(("l", "o"), ("lo", "w")))
    val plan = enc.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
    // partitioning-invariant results (row-local by construction)
    val one = CorpusStats.bpeEncode(docs.repartition(1), "doc_id", "text",
      Seq(("l", "o"), ("lo", "w"))).select("doc_id", "tokens")
      .as[(Long, Seq[String])].collect().toSet
    assert(enc.select("doc_id", "tokens").as[(Long, Seq[String])]
      .collect().toSet == one)
  }
}
