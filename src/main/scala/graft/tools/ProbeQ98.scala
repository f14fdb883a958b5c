package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe for q98's scaling shape (SCALE.md's sf1/sf2 rows): counts the
  * prefix-filter candidate pairs and the verified-pair output at a given sf
  * dir, alongside shingle/doc volumes — the numbers that decide whether a
  * super-linear wall ratio is candidate growth (a plan problem) or host
  * noise (a measurement problem).
  *
  * Usage: runMain graft.tools.ProbeQ98 <sfDir>
  */
object ProbeQ98 {
  def main(args: Array[String]): Unit = {
    val sf = args(0)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val sh = graft.operators.Dedup
      .shingleTable(graft.io.Tables.documents(spark, sf), "doc_id", "text", 3)
      .persist()
    val nSh = sh.count()
    val nDocs = sh.select("doc_id").distinct().count()
    val cand = graft.operators.Dedup.prefixFilterPairs(sh, "doc_id", 1, 2)
    val t0 = System.nanoTime()
    val nCand = cand.count()
    val tCand = (System.nanoTime() - t0) / 1e9
    val t1 = System.nanoTime()
    val nPairs = graft.operators.Dedup.jaccardForPairs(cand, sh, "doc_id")
      .where(col("jaccard") >= 0.5).count()
    val tVerify = (System.nanoTime() - t1) / 1e9
    println(f"[probe-q98] sf=$sf docs=$nDocs shingles=$nSh candidates=$nCand " +
      f"(gen ${tCand}%.1f s) verified=$nPairs (verify ${tVerify}%.1f s)")
    spark.stop()
  }
}
