package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.functions.TextFunctions._

class TextFunctionsSpec extends SparkSpec {
  import spark.implicits._

  private def one(colExpr: org.apache.spark.sql.Column, text: String): Any =
    Seq(text).toDF("t").select(colExpr.as("v")).head().get(0)

  test("tokenCount: empty and whitespace-only docs give 0") {
    assert(one(tokenCount(col("t")), "") == 0)
    assert(one(tokenCount(col("t")), "   ") == 0)
    assert(one(tokenCount(col("t")), " a  b\tc ") == 3)
  }

  test("md5Int matches the DuckDB hex-prefix construction") {
    // ('0x' || substr(md5('abc'),1,8))::BIGINT == 2416005272 (checked in DuckDB)
    assert(one(md5Int(col("t")), "abc") == 2416005272L)
  }

  test("shingles: word n-grams, distinct, short docs give none") {
    assert(one(shingles(col("t"), 3), "a b").asInstanceOf[scala.collection.Seq[String]].isEmpty)
    val sh = one(shingles(col("t"), 2), "x y x y").asInstanceOf[scala.collection.Seq[String]]
    assert(sh.toSet == Set("x y", "y x"))
  }

  test("langId picks the dominant stopword language; unknown when none") {
    assert(one(langId(col("t")), "the cat and the dog walked to the park") == "en")
    assert(one(langId(col("t")), "der hund und die katze ist ein tier") == "de")
    assert(one(langId(col("t")), "xyzzy qwerty asdf") == "unknown")
  }

  test("fingerprint is invariant to case, punctuation and spacing") {
    val a = one(fingerprint(col("t")), "Hello,  World!")
    val b = one(fingerprint(col("t")), "hello world")
    val c = one(fingerprint(col("t")), "hello there")
    assert(a == b && a != c)
  }

  test("bpeTokenCount: contractions, digit runs and punct runs split out") {
    assert(one(bpeTokenCount(col("t")), "") == 0)
    // "don" + "'t" + " stop" = 3; digits split from letters
    assert(one(bpeTokenCount(col("t")), "don't stop") == 3)
    assert(one(bpeTokenCount(col("t")), "abc123 ok!!") == 4) // abc|123| ok|!!
    assert(one(tokenCount(col("t")), "don't stop") == 2)     // ws baseline differs
  }

  test("rollingFingerprint is order-sensitive; fingerprint is not") {
    val r1 = one(rollingFingerprint(col("t")), "alpha beta gamma")
    val r2 = one(rollingFingerprint(col("t")), "gamma beta alpha")
    assert(r1 != r2)
    assert(one(rollingFingerprint(col("t")), "") == 0L)
    assert(one(fingerprint(col("t")), "alpha beta gamma") ==
      one(fingerprint(col("t")), "alpha  beta gamma"))
  }

  test("punctRatio and quality bounds") {
    assert(one(punctRatio(col("t")), "no punct here") == 0.0)
    val q = one(qualityScore(col("t"), Seq("the", "a")), "the quick brown fox and a dog")
      .asInstanceOf[Double]
    assert(q >= 0.0 && q <= 1.0)
  }
}
