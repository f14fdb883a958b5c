package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Statistical sanity for the bounded-memory eval's sampling predicate
  * (Dedup.pairSample, the q216 path). The oracle pins the ARITHMETIC of one
  * sampled run; this spec pins the ESTIMATOR: on a fixture with known
  * duplicates, the full-eval recall must lie inside the sampled run's CI
  * across several salts and moduli. A biased predicate — e.g. a salt
  * accidentally correlated with the LSH banding hash (both are md5 today)
  * — would push the sampled recall systematically off the full recall and
  * fail several of the six draws at once.
  */
class PairSampleSpec extends SparkSpec {
  import spark.implicits._

  // 300 docs = 150 disjoint near-dup pairs. Tokens are namespaced per pair
  // (no cross-pair shingle sharing), so truth/candidates only ever form
  // within a pair. The kept-prefix length varies 13..17 of 20 tokens, so
  // pair Jaccard (3-gram shingles) spans ~0.45..0.75 — some pairs fall
  // below the 0.5 truth threshold and, crucially, banding recall on the
  // in-truth pairs is strictly BETWEEN 0 and 1 (the regime where a biased
  // sample could hide).
  private lazy val docs: DataFrame = {
    val rows = (0 until 150).flatMap { p =>
      val base = (0 until 20).map(t => s"p${p}_t$t")
      val keep = 13 + (p % 5)
      val partner = base.take(keep) ++ (0 until (20 - keep)).map(t => s"p${p}_x$t")
      Seq((2L * p, base.mkString(" ")), (2L * p + 1, partner.mkString(" ")))
    }
    rows.toDF("doc_id", "text")
  }

  private case class Eval(nTrue: Long, nHit: Long) {
    def recall: Double = nHit.toDouble / nTrue
  }

  private def eval(sample: Option[org.apache.spark.sql.Column]): Eval = {
    val sh = Dedup.shingleTable(docs, "doc_id", "text", 3)
    val sig = Dedup.minhashSignaturesSketch(sh, "doc_id", 16)
    val candAll = Dedup.lshCandidatePairs(sig, "doc_id", 16, 4)
    val truthAll = Dedup.jaccardForPairs(
        Dedup.prefixFilterPairs(sh, "doc_id", 1, 2), sh, "doc_id")
      .where(col("jaccard") >= 0.5).select("id_a", "id_b")
    val cand = sample.fold(candAll)(candAll.where(_))
    val truth = sample.fold(truthAll)(truthAll.where(_))
    val hit = cand.join(truth, Seq("id_a", "id_b"))
    Eval(truth.count(), hit.count())
  }

  test("full recall lies inside the sampled CI across 3 salts x 2 moduli") {
    val full = eval(None)
    assert(full.nTrue >= 100, s"fixture too small: nTrue=${full.nTrue}")
    assert(full.nHit > 0 && full.nHit < full.nTrue,
      s"fixture recall must be strictly interior: $full")
    for (salt <- Seq("pairsample", "salt-b", "salt-c"); mod <- Seq(2, 4)) {
      val s = eval(Some(Dedup.pairSample(mod, salt)))
      assert(s.nTrue > 10, s"salt=$salt mod=$mod: sampled truth too small ($s)")
      // 99% binomial CI on the sampled recall (wider than the 95% the
      // query ships, deliberately: this is a property bound on SIX
      // deterministic draws, not a per-run confidence statement)
      val half = 2.576 * math.sqrt(s.recall * (1 - s.recall) / s.nTrue)
      assert(math.abs(s.recall - full.recall) <= half,
        f"salt=$salt mod=$mod: sampled recall ${s.recall}%.4f " +
          f"(n=${s.nTrue}) vs full ${full.recall}%.4f exceeds 99%% CI ±$half%.4f")
    }
  }

  test("sampled truth mass tracks 1/modulus (the predicate is not correlated with truth membership)") {
    val full = eval(None)
    for (mod <- Seq(2, 4)) {
      val s = eval(Some(Dedup.pairSample(mod)))
      val expected = full.nTrue.toDouble / mod
      // 4-sigma binomial band around n_true/mod
      val sd = math.sqrt(full.nTrue * (1.0 / mod) * (1 - 1.0 / mod))
      assert(math.abs(s.nTrue - expected) <= 4 * sd,
        s"mod=$mod: sampled nTrue=${s.nTrue}, expected ~$expected (sd=$sd)")
    }
  }

  test("a NULL id NULL-propagates and drops the pair in any engine (|| semantics, not concat_ws)") {
    val pairs = Seq((Some(1L), Some(2L)), (None, Some(3L)), (Some(4L), None))
      .toDF("id_a", "id_b")
    // modulus 1: the predicate keeps EVERY fully-keyed pair; a NULL key
    // must still drop its row (md5(NULL) -> NULL -> filter false), exactly
    // as the DuckDB oracle's '||' concatenation behaves
    val kept = pairs.where(Dedup.pairSample(1)).collect()
    assert(kept.length == 1 && kept.head.getLong(0) == 1L)
  }
}
