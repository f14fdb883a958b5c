package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev probe: decompose the q218 margin-TVF's cost against its Column
  * twin q217 (SCALE.md's measured-breakdown evidence). Pieces timed
  * separately, same JVM, caches cleared between sides:
  *   register      — CREATE FUNCTION (body analysis happens per SELECT,
  *                   registration is parse-only)
  *   band view     — materializing marginBandViewSql (the shared persist
  *                   BOTH sides make: q217 persists the same band table
  *                   internally)
  *   select 1 / 2  — the TVF call itself (re-analysis + the residual
  *                   candidate/score re-derivations a SQL body cannot
  *                   persist)
  *   column 1 / 2  — Similarity.marginMine end-to-end
  */
object ProbeMargin {
  def main(args: Array[String]): Unit = {
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .config("spark.sql.warehouse.dir", graft.Runners.tempWarehouse())
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import org.apache.spark.sql.functions.col
    val dims = 64
    def t[A](label: String)(body: => A): A = {
      val t0 = System.nanoTime()
      val r = body
      println(f"[probe-margin] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    def clear(): Unit = {
      graft.PinnedFrames.release(); spark.catalog.clearCache()
    }
    for (round <- 1 to 2) {
      println(s"[probe-margin] === round $round ===")
      clear()
      // --- Column twin (q217) ---
      val emb = graft.io.Tables.embeddings(spark, sf)
      t("column marginMine (cold)") {
        graft.operators.Similarity.marginMine(
          emb.where(col("vec_id") % 2 === 0),
          emb.where(col("vec_id") % 2 === 1),
          "vec_id", "embedding", k = 4, minMargin = 1.0,
          lsh = Some((dims, 12, 6)), maxBucketSize = Some(256))
          .write.format("noop").mode("overwrite").save()
      }
      t("column marginMine (steady)") {
        graft.operators.Similarity.marginMine(
          emb.where(col("vec_id") % 2 === 0),
          emb.where(col("vec_id") % 2 === 1),
          "vec_id", "embedding", k = 4, minMargin = 1.0,
          lsh = Some((dims, 12, 6)), maxBucketSize = Some(256))
          .write.format("noop").mode("overwrite").save()
      }
      clear()
      // --- TVF (q218) ---
      graft.io.Tables.embeddings(spark, sf)
        .createOrReplaceTempView("embeddings")
      val bands = t("band view materialize + persist") {
        val b = graft.PinnedFrames.pin(spark.sql(
          graft.functions.SqlSurface.marginBandViewSql(spark,
            table = "embeddings", idCol = "vec_id", vecCol = "embedding",
            srcPred = "vec_id % 2 = 0", tgtPred = "vec_id % 2 = 1",
            dims = dims, nPlanes = 12, nTables = 6)).persist())
        b.count() // materialize eagerly so the persist cost is ITS line
        b
      }
      bands.createOrReplaceTempView("margin_bands")
      val sides = t("sides view materialize + persist") {
        val sv = graft.PinnedFrames.pin(spark.sql(
          graft.functions.SqlSurface.marginSidesViewSql(
            table = "embeddings", idCol = "vec_id", vecCol = "embedding",
            srcPred = "vec_id % 2 = 0", tgtPred = "vec_id % 2 = 1"))
          .persist())
        sv.count()
        sv
      }
      sides.createOrReplaceTempView("margin_sides")
      t("register TVF") {
        graft.functions.SqlSurface.createMarginMiningFunction(spark,
          table = "embeddings", idCol = "vec_id", vecCol = "embedding",
          srcPred = "vec_id % 2 = 0", tgtPred = "vec_id % 2 = 1",
          dims = dims, nPlanes = 12, nTables = 6, cap = 256, k = 4,
          minMargin = 1.0, bandTable = Some("margin_bands"),
          sidesTable = Some("margin_sides"))
      }
      t("TVF select 1") {
        spark.sql("SELECT src_id, tgt_id, cos, margin FROM " +
          "graft_margin_pairs() ORDER BY src_id, tgt_id")
          .write.format("noop").mode("overwrite").save()
      }
      t("TVF select 2") {
        spark.sql("SELECT src_id, tgt_id, cos, margin FROM " +
          "graft_margin_pairs() ORDER BY src_id, tgt_id")
          .write.format("noop").mode("overwrite").save()
      }
      t("TVF analyze only (no execution)") {
        spark.sql("SELECT src_id, tgt_id, cos, margin FROM " +
          "graft_margin_pairs() ORDER BY src_id, tgt_id")
          .queryExecution.executedPlan: Unit
      }
    }
    spark.stop()
  }
}
