package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Similarity.marginMine — margin-criterion parallel-pair mining.
  * The oracle (q217) pins engine-exactness at corpus grain; this spec pins
  * the SEMANTICS on hand-computed fixtures: the margin arithmetic replayed
  * by hand, the mutual-best 1:1 property, the cos>0 guard, and planted-
  * pair recovery through the LSH candidate path. */
class MarginMineSpec extends SparkSpec {
  import spark.implicits._

  test("exact mode replays the hand-computed margins, mutual-best only") {
    // dims 4, unit norms chosen so every cosine is a clean double:
    //   s0=(1,0,0,0)  s2=(0,1,0,0)  s4=(.6,.8,0,0)
    //   t1=(.8,0,.6,0) t3=(0,1,0,0) t5=(-1,0,0,0)
    // positive-cos candidates: s0:{t1=.8}, s2:{t3=1}, s4:{t3=.8, t1=.48}
    // k-NN avgs (k=2): s0=.8 s2=1 s4=.64 | t1=.64 t3=.9
    // margins: (s0,t1)=.8/.72  (s2,t3)=1/.95  (s4,t3)=.8/.77  (s4,t1)=.75
    // mutual-best: (s0,t1) and (s2,t3); s4's best t3 belongs to s2.
    val src = Seq((0L, Seq(1.0, 0.0, 0.0, 0.0)),
      (2L, Seq(0.0, 1.0, 0.0, 0.0)), (4L, Seq(0.6, 0.8, 0.0, 0.0)))
      .toDF("vec_id", "embedding")
    val tgt = Seq((1L, Seq(0.8, 0.0, 0.6, 0.0)),
      (3L, Seq(0.0, 1.0, 0.0, 0.0)), (5L, Seq(-1.0, 0.0, 0.0, 0.0)))
      .toDF("vec_id", "embedding")
    val out = Similarity.marginMine(src, tgt, "vec_id", "embedding",
        k = 2, minMargin = 0.0)
      .orderBy("src_id")
      .collect().map(r => (r.getLong(0), r.getLong(1),
        r.getDouble(2), r.getDouble(3)))
    assert(out.toSeq == Seq(
      (0L, 1L, 0.8, 1.111111),   // 0.8 / (0.5*(0.8+0.64))
      (2L, 3L, 1.0, 1.052632)))  // 1.0 / (0.5*(1.0+0.9))
  }

  test("output is 1:1 — no src or tgt appears in two mutual pairs") {
    // 20 planted pairs with cross-talk: partner cosine dominates but every
    // source also sees its neighbours' targets
    val vecs = (0 until 20).map { i =>
      val v = Array.fill(8)(0.1)
      v(i % 8) = 1.0; v
    }
    val src = vecs.zipWithIndex.map { case (v, i) => (2L * i, v.toSeq) }
      .toDF("vec_id", "embedding")
    val tgt = vecs.zipWithIndex.map { case (v, i) => (2L * i + 1, v.toSeq) }
      .toDF("vec_id", "embedding")
    val out = Similarity.marginMine(src, tgt, "vec_id", "embedding",
      k = 4, minMargin = 0.0).collect()
    assert(out.nonEmpty)
    assert(out.map(_.getLong(0)).distinct.length == out.length, "src reused")
    assert(out.map(_.getLong(1)).distinct.length == out.length, "tgt reused")
  }

  test("anti-aligned vectors never pair (cos>0 guard keeps margins well-defined)") {
    val src = Seq((0L, Seq(1.0, 0.0))).toDF("vec_id", "embedding")
    val tgt = Seq((1L, Seq(-1.0, 0.0)), (3L, Seq(0.0, -1.0)))
      .toDF("vec_id", "embedding")
    assert(Similarity.marginMine(src, tgt, "vec_id", "embedding",
      k = 2, minMargin = 0.0).isEmpty)
  }

  test("LSH mode recovers planted identical pairs through the bucket join") {
    // identical vectors share every hyperplane bucket, so the planted pair
    // survives any banding; all 12 directions DISTINCT (duplicated
    // directions would tie in the margin ranking and mutual-best would
    // correctly drop the losers — a fixture artifact, not a recall miss)
    val base = (0 until 12).map { i =>
      Array.tabulate(16)(j => if (j == i) 1.0 else if (j == (i + 5) % 16) 0.5 else 0.0)
    }
    val src = base.zipWithIndex.map { case (v, i) => (2L * i, v.toSeq) }
      .toDF("vec_id", "embedding")
    val tgt = base.zipWithIndex.map { case (v, i) => (2L * i + 1, v.toSeq) }
      .toDF("vec_id", "embedding")
    val out = Similarity.marginMine(src, tgt, "vec_id", "embedding",
        k = 3, minMargin = 1.0, lsh = Some((16, 6, 4)),
        maxBucketSize = Some(64))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    // every planted twin (2i, 2i+1) has cos 1.0 and margin >= 1 by
    // construction (its own cos tops both sides' k-NN averages)
    for (i <- 0 until 12)
      assert(out.contains((2L * i, 2L * i + 1, 1.0)), s"pair $i missing: $out")
  }
}
