package graft.tools
import org.apache.spark.sql.SparkSession

/** Dev probe: where does the ANN-search TVF (q234) spend its time vs the
  * Column twin q41? Times each piece separately — centroid training,
  * TVF registration (parse/analyze of the baked matrix literal), the
  * TVF SELECT, and the Column-API search — and dumps the TVF plan. */
object ProbeAnn {
  def main(args: Array[String]): Unit = {
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .config("spark.sql.warehouse.dir", graft.Runners.tempWarehouse())
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import org.apache.spark.sql.functions._
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[probeann] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    for (round <- 1 to 3) {
      println(s"[probeann] === round $round ===")
      spark.catalog.clearCache()
      val emb = graft.io.Tables.embeddings(spark, sf)
      emb.createOrReplaceTempView("embeddings")
      val cents = t("trainCentroids")(
        graft.operators.Similarity.trainCentroids(emb, "vec_id",
          "embedding", nLists = 16, iters = 3))
      t("registerTvf")(
        graft.functions.SqlSurface.createAnnSearchFunction(spark, cents,
          nProbe = 4, k = 10, queryPred = "vec_id < 8"))
      t("tvfSelect")(
        spark.sql("SELECT qid, nid, floor(cos * 1000000 + 0.5) / 1000000 AS cos " +
          "FROM graft_ann_search() ORDER BY qid, nid")
          .write.format("noop").mode("overwrite").save())
      t("columnSearch")({
        val queries = emb.where(col("vec_id") < 8)
        graft.operators.Similarity.ivfTopK(emb, queries, "vec_id",
          "embedding", cents, nProbe = 4, k = 10)
          .orderBy("qid", "nid")
          .write.format("noop").mode("overwrite").save()
      })
      if (round == 3)
        spark.sql("SELECT * FROM graft_ann_search()").explain("formatted")
    }
    spark.stop()
  }
}
