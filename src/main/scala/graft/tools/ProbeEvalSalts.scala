package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Dedup

/** Dev probe: the q216 sampled LSH eval re-run under several SALTS at the
  * given SF — the in-situ companion to PairSampleSpec's fixture test. If
  * one salt's CI misses the full recall while others scatter around it,
  * that's the expected ~5% draw noise; if ALL salts land on the same side,
  * the predicate is correlated with the banding hash (the failure mode the
  * r9 verdict flagged). Prints one line per (salt, mod): n_true, n_hit,
  * recall and the shipped-CI bounds, using the exact q216 construction
  * (sample BEFORE the verify join on both sides). */
object ProbeEvalSalts {
  def main(args: Array[String]): Unit = {
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val salts = if (args.nonEmpty) args.toSeq else Seq("pairsample", "salt-b", "salt-c")
    val mod = sys.env.getOrElse("SPARK_GRAFT_EVAL_MOD", "4").toInt
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    for (salt <- salts) {
      spark.catalog.clearCache()
      val t0 = System.nanoTime()
      // identical constants to DedupQueries' q216: n=3, k=16, bands=4, tau=0.5
      val sh = Dedup.shingleTable(
        graft.io.Tables.documents(spark, sf), "doc_id", "text", 3).persist()
      val sig = Dedup.minhashSignaturesSketch(sh, "doc_id", 16)
      val cand = Dedup.lshCandidatePairs(sig, "doc_id", 16, 4)
        .where(Dedup.pairSample(mod, salt))
      val truth = Dedup.jaccardForPairs(
          Dedup.prefixFilterPairs(sh, "doc_id", 1, 2)
            .where(Dedup.pairSample(mod, salt)), sh, "doc_id")
        .where(col("jaccard") >= 0.5).select("id_a", "id_b")
      val hits = cand.join(truth, Seq("id_a", "id_b"))
      val r = cand.agg(count(lit(1)).as("n_cand"))
        .crossJoin(truth.agg(count(lit(1)).as("n_true")))
        .crossJoin(hits.agg(count(lit(1)).as("n_hit"))).head()
      val (nc, nt, nh) = (r.getLong(0), r.getLong(1), r.getLong(2))
      val rec = nh.toDouble / nt
      val half = 1.96 * math.sqrt(rec * (1 - rec) / nt)
      println(f"[evalsalts] salt=$salt mod=$mod n_cand=$nc n_true=$nt n_hit=$nh " +
        f"recall=$rec%.6f ci=[${math.max(0, rec - half)}%.6f, ${math.min(1, rec + half)}%.6f] " +
        f"t=${(System.nanoTime() - t0) / 1e9}%.1f s")
      sh.unpersist()
    }
    spark.stop()
  }
}
