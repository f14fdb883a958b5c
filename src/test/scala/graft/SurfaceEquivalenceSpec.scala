package graft

import graft.functions.SqlSurface

/** Twin-surface equality pins: several registry queries deliberately expose
  * the SAME computation through two fronts — the Column API and a SQL text
  * (or a registered TVF whose body is a second copy of that text). The
  * DuckDB oracle holds each front to the same hash at verify time; this
  * spec pins the equality IN CI, so a drift between the two copies (the
  * q215-vs-q212 concern from the r9 verdict, equally applicable to every
  * TVF) fails the build rather than the next verify run.
  *
  * The twin list is DATA, declared next to the TVF registrations
  * ([[SqlSurface.tvfTwins]] / [[SqlSurface.sqlTwins]]): the tests iterate
  * it, and a reflection check asserts every `create*Function` registrar in
  * SqlSurface has an entry — a new TVF without a twin pin fails the build
  * instead of landing unpinned.
  */
class SurfaceEquivalenceSpec extends SparkSpec {

  private lazy val sf = "/root/testdata/sf0.001"

  private def rows(name: String): Seq[String] =
    SparkEntry.queries(name)(spark, sf).collect().map(_.toString).toSeq

  test("every create*Function registrar has a tvfTwins entry") {
    val registrars = SqlSurface.getClass.getMethods.map(_.getName)
      .filter(n => n.startsWith("create") && n.endsWith("Function"))
      .toSet
    assert(registrars == SqlSurface.tvfTwins.map(_._1).toSet,
      s"registrars $registrars vs twin entries " +
        s"${SqlSurface.tvfTwins.map(_._1).toSet} — add the missing TVF to " +
        "SqlSurface.tvfTwins (with its one-call query) or remove the stale entry")
  }

  test("every twin entry's queries exist in the registry") {
    val known = SparkEntry.queries.keySet
    val referenced =
      (SqlSurface.tvfTwins.flatMap(_._2) ++ SqlSurface.sqlTwins.flatten).toSet
    val missing = referenced -- known
    assert(missing.isEmpty, s"twin queries not in the registry: $missing")
  }

  for ((registrar, names) <- SqlSurface.tvfTwins)
    test(s"$registrar: ${names.mkString(" ≙ ")}") {
      val first = rows(names.head)
      assert(first.nonEmpty, s"${names.head} returned no rows")
      for (other <- names.tail)
        assert(rows(other) == first, s"${names.head} != $other")
    }

  for (names <- SqlSurface.sqlTwins)
    test(s"SQL twin: ${names.mkString(" ≙ ")}") {
      val first = rows(names.head)
      assert(first.nonEmpty, s"${names.head} returned no rows")
      for (other <- names.tail)
        assert(rows(other) == first, s"${names.head} != $other")
    }

  test("createAnnSearchFunction unitTable body ≡ default body (the " +
    "pre-materialized unit view changes the plan, never the rows)") {
    import org.apache.spark.sql.functions._
    val emb = graft.io.Tables.embeddings(spark, sf)
    emb.createOrReplaceTempView("embeddings")
    val cents = graft.operators.Similarity.trainCentroids(
      emb, "vec_id", "embedding", nLists = 8, iters = 2)
    SqlSurface.register(spark)
    SqlSurface.createAnnSearchFunction(spark, cents, nProbe = 2, k = 5,
      queryPred = "vec_id < 6", funcName = "ann_default")
    val unit = PinnedFrames.pin(
      spark.sql(SqlSurface.annUnitViewSql(queryPred = "vec_id < 6"))
        .persist())
    unit.createOrReplaceTempView("emb_unit_eq")
    SqlSurface.createAnnSearchFunction(spark, cents, nProbe = 2, k = 5,
      queryPred = "vec_id < 6", funcName = "ann_mat",
      unitTable = Some("emb_unit_eq"))
    def res(f: String) = spark.sql(
      s"SELECT qid, nid, floor(cos * 1000000 + 0.5) / 1000000 AS c " +
        s"FROM $f() ORDER BY qid, nid").collect().map(_.toString).toSeq
    val d = res("ann_default")
    assert(d.nonEmpty && d == res("ann_mat"))
    PinnedFrames.release()
  }

  test("createMarginMiningFunction sidesTable+bandTable body ≡ default " +
    "body (the pre-materialized views change the plan, never the rows)") {
    graft.io.Tables.embeddings(spark, sf)
      .createOrReplaceTempView("embeddings")
    SqlSurface.register(spark)
    SqlSurface.createMarginMiningFunction(spark, funcName = "margin_default")
    val bands = PinnedFrames.pin(
      spark.sql(SqlSurface.marginBandViewSql(spark,
        funcName = "margin_mat")).persist())
    bands.createOrReplaceTempView("margin_bands_eq")
    val sides = PinnedFrames.pin(
      spark.sql(SqlSurface.marginSidesViewSql()).persist())
    sides.createOrReplaceTempView("margin_sides_eq")
    SqlSurface.createMarginMiningFunction(spark, funcName = "margin_mat",
      bandTable = Some("margin_bands_eq"),
      sidesTable = Some("margin_sides_eq"))
    def res(f: String) = spark.sql(
      s"SELECT src_id, tgt_id, cos, margin FROM $f() " +
        "ORDER BY src_id, tgt_id").collect().map(_.toString).toSeq
    val d = res("margin_default")
    assert(d.nonEmpty && d == res("margin_mat"))
    PinnedFrames.release()
  }
}
