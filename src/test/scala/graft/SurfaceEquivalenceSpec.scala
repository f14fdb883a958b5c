package graft

/** Twin-surface equality pins: several registry queries deliberately expose
  * the SAME computation through two fronts — the Column API and a SQL text
  * (or a registered TVF whose body is a second copy of that text). The
  * DuckDB oracle holds each front to the same hash at verify time; this
  * spec pins the equality IN CI, so a drift between the two copies (the
  * q215-vs-q212 concern from the r9 verdict, equally applicable to the
  * margin TVF) fails the build rather than the next verify run.
  */
class SurfaceEquivalenceSpec extends SparkSpec {

  private lazy val sf = "/root/testdata/sf0.001"

  private def rows(name: String): Seq[String] =
    SparkEntry.queries(name)(spark, sf).collect().map(_.toString).toSeq

  test("q215 one-call dedup TVF ≙ q212 hand-typed SQL ≙ q21 Column API") {
    val sql = rows("q212_sql_minhash_pairs")
    assert(sql.nonEmpty)
    assert(rows("q215_sql_lsh_one_call") == sql)
    assert(rows("q21_minhash_lsh_pairs") == sql)
  }

  test("q218 one-call margin TVF ≙ q217 Column API") {
    val col = rows("q217_margin_mining")
    assert(col.nonEmpty)
    assert(rows("q218_sql_margin_one_call") == col)
  }

  test("q213 SQL sessionization ≙ q53 Column API") {
    val col = rows("q53_sessionization")
    assert(col.nonEmpty)
    assert(rows("q213_sql_sessionize") == col)
  }
}
