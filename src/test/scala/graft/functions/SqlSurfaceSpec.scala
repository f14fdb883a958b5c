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

  test("named TVF multi-registration: two tables indexed side by side, quoted identifiers resolve") {
    import spark.implicits._
    // two near-dup corpora under different temp views; the second one uses
    // a reserved word as the id column and a spaced column name for the
    // text — the registrar must backtick-quote them into the body
    // exact duplicates: identical sketches collide in every band, so the
    // expected candidate set is deterministic (this test pins identifier
    // quoting + multi-registration, not banding recall)
    Seq((1L, "a b c d e"), (2L, "a b c d e"), (3L, "zz yy xx ww vv"))
      .toDF("doc_id", "text").createOrReplaceTempView("tvf_docs")
    Seq((10L, "p q r s t"), (11L, "p q r s t"), (12L, "mm nn oo pp qq"))
      .toDF("order", "doc text").createOrReplaceTempView("tvf_events")
    SqlSurface.createLshCandidatesFunction(spark, table = "tvf_docs",
      idCol = "doc_id", textCol = "text", n = 3, k = 16, bands = 4,
      funcName = "graft_lsh_candidates_docs")
    SqlSurface.createLshCandidatesFunction(spark, table = "tvf_events",
      idCol = "order", textCol = "doc text", n = 3, k = 16, bands = 4,
      funcName = "graft_lsh_candidates_events")
    // both registrations live simultaneously; each sees only its table
    val d = spark.sql(
      "SELECT id_a, id_b FROM graft_lsh_candidates_docs() ORDER BY 1, 2")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val e = spark.sql(
      "SELECT id_a, id_b FROM graft_lsh_candidates_events() ORDER BY 1, 2")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(d.toSeq === Seq((1L, 2L)))
    assert(e.toSeq === Seq((10L, 11L)))
    // identifier surface, not injection surface: embedded backticks refuse
    val ex = intercept[IllegalArgumentException] {
      SqlSurface.createLshCandidatesFunction(spark, table = "tvf`x")
    }
    assert(ex.getMessage.contains("backtick"))
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
