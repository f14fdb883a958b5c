package graft.functions

import org.apache.spark.sql.{Row, SparkSession}
import graft.SparkSpec
import graft.operators.Dedup

/** The SQL front door's two activation paths: build-time injection
  * (GraftExtensions) and live-session registration (SqlSurface.register) —
  * both must expose the identical functions, and the functions must agree
  * with the Column API they expand from. */
class SqlSurfaceSpec extends SparkSpec {

  private def expectedMinhash(token: String, k: Int): Seq[Long] = {
    // replay md5Int + the universal family in plain Scala
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest(token.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val h = java.lang.Long.parseLong(hex.substring(0, 8), 16)
    Dedup.hashParams(k).map { case (a, b) => (a * h + b) % Dedup.HashM }
  }

  test("live registration: scalar + aggregate functions resolve and match the Column API") {
    SqlSurface.register(spark)
    val row = spark.sql(
      """SELECT graft_token_count('one two  three') AS n,
        |       graft_fingerprint('Hello, World!') AS fp,
        |       graft_lang_id('the cat sat on the mat') AS lang,
        |       graft_redact_pii('mail me at a@b.com now') AS red,
        |       size(graft_shingles('a b c d', 3)) AS nsh
        |""".stripMargin).head()
    assert(row.getAs[Int]("n") === 3)
    assert(row.getAs[String]("lang") === "en")
    assert(row.getAs[String]("red") === "mail me at <EMAIL> now")
    assert(row.getAs[Int]("nsh") === 2)
    // fingerprint equals the Column-API formulation on the same input
    import org.apache.spark.sql.functions._
    val viaCols = spark.range(1)
      .select(TextFunctions.fingerprint(lit("Hello, World!")).as("fp"))
      .head().getAs[String]("fp")
    assert(row.getAs[String]("fp") === viaCols)
  }

  test("minhash_sketch SQL aggregate replays the universal hash family exactly") {
    SqlSurface.register(spark)
    val sig = spark.sql(
      "SELECT minhash_sketch(graft_md5int(x), 8) AS sig FROM VALUES ('abc') AS t(x)")
      .head().getSeq[Long](0)
    assert(sig === expectedMinhash("abc", 8))
    // two tokens: elementwise min of the two singleton signatures
    val sig2 = spark.sql(
      "SELECT minhash_sketch(graft_md5int(x), 8) AS sig FROM VALUES ('abc'), ('xyz') AS t(x)")
      .head().getSeq[Long](0)
    val exp2 = expectedMinhash("abc", 8).zip(expectedMinhash("xyz", 8))
      .map { case (a, b) => math.min(a, b) }
    assert(sig2 === exp2)
  }

  test("minhash_sketch rejects a non-literal k with the function name in the error") {
    SqlSurface.register(spark)
    val e = intercept[Exception] {
      spark.sql("SELECT minhash_sketch(graft_md5int(x), CAST(rand()*4 AS INT)) FROM VALUES ('a') AS t(x)")
        .collect()
    }
    assert(e.getMessage.contains("minhash_sketch"))
  }

  test("build-time injection: a withExtensions session exposes the same surface") {
    val prevActive = SparkSession.getActiveSession
    val prevDefault = SparkSession.getDefaultSession
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      // reuses the JVM's SparkContext; extensions apply because no
      // active/default session short-circuits getOrCreate
      val s2 = SparkSession.builder()
        .withExtensions(new graft.GraftExtensions)
        .getOrCreate()
      assert(s2 ne spark)
      val Row(n: Int, sig: scala.collection.Seq[_]) = s2.sql(
        """SELECT graft_token_count('a b') AS n,
          |       (SELECT minhash_sketch(graft_md5int(x), 4)
          |        FROM VALUES ('abc') AS t(x)) AS sig""".stripMargin).head()
      assert(n === 2)
      assert(sig.toSeq === expectedMinhash("abc", 4))
    } finally {
      prevActive.foreach(SparkSession.setActiveSession)
      prevDefault.foreach(SparkSession.setDefaultSession)
    }
  }
}
