package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

class DedupSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog again and again today"),
    (2L, "the quick brown fox jumps over the lazy dog again and again today"), // exact dup of 1
    (3L, "the quick brown fox jumps over the lazy dog again and again tonight"), // near dup
    (4L, "completely different words about spark partitions and shuffles here"),
    (5L, "")).toDF("doc_id", "text")

  test("exactGroups clusters identical normalized text (fingerprint)") {
    val g = Dedup.exactGroups(docs, "doc_id", "text")
    val dup = g.where($"n_docs" > 1).head()
    assert(dup.getAs[Long]("canonical_id") == 1L && dup.getAs[Long]("n_docs") == 2L)
  }

  test("fingerprint ignores case / punctuation / whitespace noise") {
    val noisy = Seq((1L, "Hello,  World!"), (2L, "hello world")).toDF("doc_id", "text")
    val g = Dedup.exactGroups(noisy, "doc_id", "text")
    assert(g.count() == 1 && g.head().getAs[Long]("n_docs") == 2L)
  }

  test("minhash LSH finds exact and near dups, not unrelated docs") {
    val sh = Dedup.shingleTable(docs, "doc_id", "text", 3)
    val sig = Dedup.minhashSignatures(sh, "doc_id", 16)
    val pairs = Dedup.lshCandidatePairs(sig, "doc_id", 16, 4)
      .as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L)))       // identical → all bands match
    assert(!pairs.exists(p => p._1 == 4L || p._2 == 4L)) // unrelated
  }

  test("minhash sketch aggregate ≡ declarative k-min formulation") {
    val sh = Dedup.shingleTable(docs, "doc_id", "text", 3)
    val a = Dedup.minhashSignatures(sh, "doc_id", 16).orderBy("doc_id").collect()
    val b = Dedup.minhashSignaturesSketch(sh, "doc_id", 16).orderBy("doc_id").collect()
    assert(a.map(_.toSeq).toSeq == b.map(_.toSeq).toSeq)
  }

  test("bandedRows ≡ aggregate minhash banding, hash for hash (streaming-safe row form)") {
    val k = 16; val bands = 4; val r = k / bands
    val rowWise = Dedup.bandedRows(docs, "doc_id", "text", 3, k, bands)
      .as[(Long, Int, String)].collect().toSet
    // replay the aggregate path's band table (lshCandidatePairs' banding)
    val sig = Dedup.minhashSignatures(
      Dedup.shingleTable(docs, "doc_id", "text", 3), "doc_id", k)
    val bandStructs = (0 until bands).map { b =>
      val cols = (b * r until (b + 1) * r).map(i => col(s"mh_$i"))
      struct(lit(b).as("band"),
        md5(concat_ws(",", cols: _*).cast("binary")).as("bsig"))
    }
    val agg = sig.select($"doc_id", explode(array(bandStructs: _*)).as("bs"))
      .select($"doc_id", $"bs.band", $"bs.bsig")
      .as[(Long, Int, String)].collect().toSet
    assert(rowWise == agg)
    // doc 5 (empty text) emits no bands on either path
    assert(rowWise.map(_._1) == Set(1L, 2L, 3L, 4L))
  }

  test("jaccard: identical docs 1.0, near dups in (0,1)") {
    val sh = Dedup.shingleTable(docs, "doc_id", "text", 3)
    val pairs = Seq((1L, 2L), (1L, 3L)).toDF("id_a", "id_b")
    val j = Dedup.jaccardForPairs(pairs, sh, "doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(j((1L, 2L)) == 1.0)
    assert(j((1L, 3L)) > 0.5 && j((1L, 3L)) < 1.0)
  }

  test("simhash: identical docs share signatures; near dups are close") {
    val sig = Dedup.simhashSignatures(docs.where($"doc_id" =!= 5L), "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sig(1L) == sig(2L))
    val hamming13 = java.lang.Long.bitCount(sig(1L) ^ sig(3L))
    val hamming14 = java.lang.Long.bitCount(sig(1L) ^ sig(4L))
    assert(hamming13 < hamming14)
  }

  test("simhashPairs surfaces the planted near-dup pair") {
    val sig = Dedup.simhashSignatures(docs.where($"doc_id" =!= 5L), "doc_id", "text")
    val pairs = Dedup.simhashPairs(sig, "doc_id", 32, 2, 8)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L)))
  }

  test("hot-band cap drops boilerplate buckets but keeps ordinary near-dup pairs") {
    // 20 copies of one boilerplate text: every band bucket they form has
    // size 20. Two near-dup docs form buckets of ≤2. With cap=10, no pair
    // among the boilerplate clones survives; the near-dup pair does.
    val boiler = (100L until 120L)
      .map(i => (i, "standard licence header text repeated verbatim in every file of this corpus"))
    val near = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again today"),
      (2L, "the quick brown fox jumps over the lazy dog again and again today"))
    val corpus = (boiler ++ near).toDF("doc_id", "text")
    val sh = Dedup.shingleTable(corpus, "doc_id", "text", 3)
    val sig = Dedup.minhashSignatures(sh, "doc_id", 16)
    val uncapped = Dedup.lshCandidatePairs(sig, "doc_id", 16, 4)
      .as[(Long, Long)].collect().toSet
    assert(uncapped.contains((1L, 2L)))
    assert(uncapped.count(p => p._1 >= 100L && p._2 >= 100L) == 20 * 19 / 2)
    val capped = Dedup.lshCandidatePairs(sig, "doc_id", 16, 4, maxBucketSize = Some(10))
      .as[(Long, Long)].collect().toSet
    assert(capped.contains((1L, 2L)))
    assert(!capped.exists(p => p._1 >= 100L && p._2 >= 100L))
    // same guard on the simhash path
    val ssig = Dedup.simhashSignatures(corpus, "doc_id", "text")
    val scapped = Dedup.simhashPairs(ssig, "doc_id", 32, 2, 8, maxBucketSize = Some(10))
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(scapped.contains((1L, 2L)))
    assert(!scapped.exists(p => p._1 >= 100L && p._2 >= 100L))
  }

  test("hot-band cap schedules NO Spark job at plan-construction time") {
    // the round-5 gate ran two eager driver actions per capped dedup call;
    // the observe()-based gate must build the whole capped plan without
    // scheduling anything (broadcast decision deferred to AQE at runtime)
    val corpus = (0L until 30L)
      .map(i => (i, "standard licence header text repeated verbatim in every file"))
      .toDF("doc_id", "text")
    val sh = Dedup.shingleTable(corpus, "doc_id", "text", 3)
    val sig = Dedup.minhashSignatures(sh, "doc_id", 16).persist()
    sig.count() // materialize inputs first so only the cap path is measured
    val jobs = new java.util.concurrent.atomic.AtomicInteger()
    val l = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          s: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobs.incrementAndGet(): Unit
    }
    spark.sparkContext.addSparkListener(l)
    try {
      val capped = Dedup.lshCandidatePairs(sig, "doc_id", 16, 4,
        maxBucketSize = Some(10))
      capped.queryExecution.executedPlan // force full planning too
      org.apache.spark.GraftTestBridge.waitUntilListenerBusEmpty(spark.sparkContext)
      assert(jobs.get() == 0, s"cap gate scheduled ${jobs.get()} jobs at plan time")
      // and the capped query still evaluates (drop semantics pinned above)
      assert(capped.count() == 0) // every bucket is over the cap here
    } finally {
      spark.sparkContext.removeSparkListener(l)
      sig.unpersist(): Unit
    }
  }

  test("duplicateClusters closes chains transitively; components independent") {
    // chain 10-20, 20-30 (never directly paired) + disjoint pair 40-50
    val pairs = Seq((10L, 20L), (20L, 30L), (40L, 50L)).toDF("id_a", "id_b")
    val c = Dedup.duplicateClusters(pairs)
      .as[(Long, Long)].collect().toMap
    assert(c == Map(10L -> 10L, 20L -> 10L, 30L -> 10L, 40L -> 40L, 50L -> 40L))
  }

  test("entity resolution: transitive fuzzy matches share one canonical id") {
    // "red widget" ~ "red widgit" ~ "red widgits" chains; singleton apart
    val parts = Seq(
      (1L, "red widget", "B1"), (2L, "red widgit", "B1"),
      (3L, "red widgits", "B1"), (4L, "blue bolt", "B1"))
      .toDF("id", "name", "brand")
    val pairs = graft.ops.Fuzzy.blockedSelfJoin(parts, "id", "name", "brand", 2)
    val entities = parts.select($"id")
      .join(Dedup.duplicateClusters(pairs.select("id_a", "id_b")), Seq("id"), "left")
      .select($"id", coalesce($"cluster_id", $"id").as("entity_id"))
      .as[(Long, Long)].collect().toMap
    // 1-2 dist 1, 2-3 dist 1, 1-3 dist 2 → one entity; 4 is its own
    assert(entities == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 4L))
  }

  test("dedupCorpus keeps one representative per cluster plus singletons") {
    val corpus = Seq(10L, 20L, 30L, 40L, 50L, 99L).toDF("doc_id")
    val pairs = Seq((10L, 20L), (20L, 30L), (40L, 50L)).toDF("id_a", "id_b")
    val kept = Dedup.dedupCorpus(corpus, "doc_id", pairs)
      .as[Long].collect().toSet
    assert(kept == Set(10L, 40L, 99L))
  }

  test("dedupCorpusKeepBest keeps the highest-quality member, min id on ties") {
    val corpus = Seq(
      (10L, 5L), (20L, 9L), (30L, 9L),  // cluster {10,20,30}: 20/30 tie on
                                        // quality 9 → 20 wins (min id)
      (40L, 1L), (50L, 7L),             // cluster {40,50}: 50 wins outright
      (99L, 0L))                        // singleton always survives
      .toDF("doc_id", "quality")
    val pairs = Seq((10L, 20L), (20L, 30L), (40L, 50L)).toDF("id_a", "id_b")
    val kept = Dedup.dedupCorpusKeepBest(corpus, "doc_id", pairs, $"quality")
    assert(kept.columns.toSeq == Seq("doc_id", "quality")) // internals dropped
    assert(kept.select("doc_id").as[Long].collect().toSet == Set(20L, 50L, 99L))
  }

  test("removeBoilerplate: df counts DISTINCT docs; hot spans drop everywhere") {
    // "b1..b6" sits in 3 distinct docs → boilerplate at minDf=3, removed
    // from ALL of them (no first-occurrence survivor). Doc 4 repeats
    // "r1..r6" three times WITHIN itself — df is 1, so it stays.
    val boiler = "b1 b2 b3 b4 b5 b6"
    val docs = Seq(
      (1L, s"$boiler one"),
      (2L, s"two $boiler"),
      (3L, s"$boiler"),
      (4L, "r1 r2 r3 r4 r5 r6 r1 r2 r3 r4 r5 r6 r1 r2 r3 r4 r5 r6"))
      .toDF("doc_id", "text")
    val out = Dedup.removeBoilerplate(docs, "doc_id", "text", k = 6, minDf = 3)
      .as[(Long, String, Long)].collect().sortBy(_._1).toSeq
    assert(out == Seq(
      (1L, "one", 6L), (2L, "two", 6L), (3L, "", 6L),
      (4L, "r1 r2 r3 r4 r5 r6 r1 r2 r3 r4 r5 r6 r1 r2 r3 r4 r5 r6", 0L)))
  }

  test("dedup finishing path has no broadcast hint: large drop sets stay shuffled") {
    // At 100 TB the pair-derived drop/candidate id sets are billions of
    // rows (20-50% web dup rate) — an unconditional broadcast() hint is a
    // driver OOM. With the auto-broadcast threshold off (simulating "too
    // big to broadcast"), the plans must fall back to shuffled joins; a
    // hint would force BroadcastHashJoin regardless of the threshold.
    val threshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val corpus = Seq(10L, 20L, 30L, 40L, 50L, 99L).toDF("doc_id")
      val pairs = Seq((10L, 20L), (20L, 30L), (40L, 50L)).toDF("id_a", "id_b")
      val kept = Dedup.dedupCorpus(corpus, "doc_id", pairs)
      assert(kept.as[Long].collect().toSet == Set(10L, 40L, 99L))
      val keptPlan = kept.queryExecution.executedPlan.toString
      assert(keptPlan.contains("LeftAnti") && !keptPlan.contains("BroadcastHashJoin"))
      val sh = Dedup.shingleTable(docs, "doc_id", "text", 3)
      val j = Dedup.jaccardForPairs(Seq((1L, 2L)).toDF("id_a", "id_b"), sh, "doc_id")
      assert(j.count() == 1)
      val jPlan = j.queryExecution.executedPlan.toString
      assert(jPlan.contains("LeftSemi") && !jPlan.contains("BroadcastHashJoin"))
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", threshold)
  }

  test("semanticDedup drops the planted within-cell near-dup, keeps the lowest id") {
    val dims = 16
    val base = Array.tabulate(dims)(i => math.sin(i * 1.7) + 1.5)
    val nearDup = base.map(_ * 1.001) // same direction → cos ≈ 1, same cell
    val nearDup2 = base.map(_ * 0.97)
    val others = (10L until 30L).map { s =>
      (s, Array.tabulate(dims)(i => math.sin(s * 31 + i * 7.3) * 2))
    }
    val emb = ((0L, base) +: (1L, nearDup) +: (2L, nearDup2) +: others)
      .toDF("vec_id", "embedding")
    val cents = Similarity.trainCentroids(emb, "vec_id", "embedding",
      nLists = 4, iters = 2)
    val kept = Dedup.semanticDedup(emb, "vec_id", "embedding", cents, 0.99)
      .select("vec_id").as[Long].collect().toSet
    assert(kept.contains(0L))            // lowest id of the dup group survives
    assert(!kept.contains(1L) && !kept.contains(2L)) // colinear dups dropped
    assert((10L until 30L).count(kept.contains) >= 15) // scattered vecs mostly kept
  }

  test("bloom incremental dedup ≡ exact incremental dedup (no false negatives)") {
    // 60 docs: ids ≡0 (mod 3) form the historical index; the batch holds
    // exact dups of indexed docs, intra-batch dups (t≡2 mod 3 pairs land
    // entirely in the batch), and unique novel docs (ids ≥ 40).
    val corpus = (0L until 60L)
      .map(i => (i, if (i < 40) s"dup text ${i % 20} body" else s"unique text $i body"))
      .toDF("doc_id", "text")
    val index = corpus.where($"doc_id" % 3 === 0)
      .select(graft.functions.TextFunctions.fingerprint($"text").as("fp"))
    val batch = corpus.where($"doc_id" % 3 =!= 0).select("doc_id", "text")
    val exact = Dedup.dedupeAgainstIndex(batch, "doc_id", "text", index)
      .select("doc_id", "fp").collect().map(_.toSeq).toSet
    // tiny filter (high fpp) to force false positives through the exact
    // verify stage — output must STILL match, that's the whole contract
    val bloom = Dedup.dedupeAgainstIndexBloom(batch, "doc_id", "text", index,
      expectedItems = 10L, fpp = 0.5)
      .select("doc_id", "fp").collect().map(_.toSeq).toSet
    assert(bloom == exact)
    assert(bloom.nonEmpty)
  }

  test("BloomMightContain: codegen'd predicate, zero false negatives") {
    import graft.functions.catalyst.BloomExpressions
    val keys = (0 until 1000).map(i => s"key_$i")
    val df = keys.toDF("k")
    val bf = df.stat.bloomFilter("k", 1000, 0.01)
    val hits = df.where(BloomExpressions.mightContain($"k", bf)).count()
    assert(hits == 1000L) // every inserted key must test positive
    val misses = (5000 until 6000).map(i => s"key_$i").toDF("k")
      .where(BloomExpressions.mightContain($"k", bf)).count()
    assert(misses < 100L) // ~1% fpp, generous margin
  }

  test("embeddingNearDups: LSH mode ⊆ exact mode, planted dup always recalled") {
    val dims = 16
    val base = Array.tabulate(dims)(i => math.sin(i * 1.7) + 1.5)
    val nearDup = base.clone(); nearDup(0) += 0.01
    val rnd = (2L until 40L).map { s =>
      (s, Array.tabulate(dims)(i => math.sin(s * 31 + i * 7.3) * 2))
    }
    val emb = ((0L, base) +: (1L, nearDup) +: rnd).toDF("vec_id", "embedding")
    val exact = Dedup.embeddingNearDups(emb, "vec_id", "embedding", 0.95)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(exact.contains((0L, 1L)))
    val lsh = Dedup.embeddingNearDups(emb, "vec_id", "embedding", 0.95,
      lsh = Some((dims, 6, 8)))
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    // cos≈1 ⇒ same bucket in every table ⇒ always a candidate
    assert(lsh.contains((0L, 1L)))
    assert(lsh.subsetOf(exact))
    // hot-bucket cap: output stays a subset of exact; a cap of 1 drops
    // every bucket (docs only pair within buckets of ≥ 2), so the planted
    // pair degrades away rather than erroring — graceful recall loss
    val capped = Dedup.embeddingNearDups(emb, "vec_id", "embedding", 0.95,
      lsh = Some((dims, 6, 8)), maxBucketSize = Some(1))
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(capped.isEmpty)
    val cappedWide = Dedup.embeddingNearDups(emb, "vec_id", "embedding", 0.95,
      lsh = Some((dims, 6, 8)), maxBucketSize = Some(1000))
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(cappedWide == lsh) // cap above every bucket size is a no-op
  }

  test("query-scoped caches release cleanly (persist lifecycle)") {
    // Mirrors Verify/Bench hygiene: a dedup query persists its band table;
    // after the consuming action + clearCache no cached RDDs may linger.
    val sh = Dedup.shingleTable(docs, "doc_id", "text", 3)
    val sig = Dedup.minhashSignatures(sh, "doc_id", 16)
    Dedup.lshCandidatePairs(sig, "doc_id", 16, 4).write
      .format("noop").mode("overwrite").save()
    assert(spark.sparkContext.getPersistentRDDs.nonEmpty)
    spark.catalog.clearCache()
    assert(spark.sparkContext.getPersistentRDDs.isEmpty)
  }
}

class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  private def vec(xs: Double*): Array[Double] = xs.toArray

  private val emb = Seq(
    (0L, vec(1, 0, 0, 0)),
    (1L, vec(1, 0.01, 0, 0)),   // nearly parallel to 0
    (2L, vec(0, 1, 0, 0)),      // orthogonal
    (3L, vec(-1, 0, 0, 0)),     // opposite
    (4L, vec(0.9, 0.1, 0, 0))).toDF("vec_id", "embedding")

  test("quantizeInt8: bounded values, round-trip error ≤ scale/2, zero-safe") {
    val vs = Seq((0L, vec(0.5, -1.0, 0.25, 0.125)), (1L, vec(0, 0, 0, 0)))
      .toDF("vec_id", "embedding")
    val q = Similarity.quantizeInt8(vs, "vec_id", "embedding")
      .collect().map(r => r.getLong(0) ->
        (r.getSeq[Double](1).toArray, r.getDouble(2))).toMap
    val (q0, s0) = q(0L)
    assert(s0 == 1.0 / 127.0)
    assert(q0.forall(x => x >= -127 && x <= 127 && x == math.rint(x)))
    val orig = Array(0.5, -1.0, 0.25, 0.125)
    orig.zip(q0).foreach { case (x, qi) =>
      assert(math.abs(x - qi * s0) <= s0 / 2 + 1e-12)
    }
    val (q1, s1) = q(1L)
    assert(s1 == 0.0 && q1.forall(_ == 0.0)) // zero vector stays zero
  }

  test("quantizedTopK recalls the planted near-parallel neighbour first") {
    val top = Similarity.quantizedTopK(emb, emb.where($"vec_id" === 0L),
      "vec_id", "embedding", 2)
      .orderBy(desc("qcos")).as[(Long, Long, Double)].collect()
    assert(top.map(_._2).toSeq == Seq(1L, 4L)) // same order as float cosine
    assert(top.head._3 > 0.999)
  }

  test("bruteForceTopK ranks by cosine and excludes self") {
    val q = emb.where($"vec_id" === 0L)
    val top = Similarity.bruteForceTopK(emb, q, "vec_id", "embedding", 2)
      .orderBy(desc("cos")).as[(Long, Long, Double)].collect()
    assert(top.map(_._2).toSeq == Seq(1L, 4L))
    assert(top.head._3 > 0.999)
    assert(!top.map(_._2).contains(0L))
  }

  test("hardPairs mines the nearest same-label and nearest other-label vector") {
    val labeled = Seq(
      (0L, vec(1, 0, 0, 0), 1),
      (1L, vec(1, 0.01, 0, 0), 1),   // nearest same-label to 0
      (2L, vec(0.9, 0.1, 0, 0), 2),  // nearest other-label to 0
      (3L, vec(0, 1, 0, 0), 1),
      (4L, vec(-1, 0, 0, 0), 2)).toDF("vec_id", "embedding", "label")
    val out = Similarity.hardPairs(labeled,
        labeled.where($"vec_id" === 0L), "vec_id", "embedding", "label")
      .select("kind", "nid", "label").as[(String, Long, Int)].collect()
      .map(t => t._1 -> ((t._2, t._3))).toMap
    assert(out("pos") == ((1L, 1)))
    assert(out("neg") == ((2L, 2)))
  }

  test("lshTopK returns a subset of candidates with exact cos scores") {
    val q = emb.where($"vec_id" === 0L)
    val brute = Similarity.bruteForceTopK(emb, q, "vec_id", "embedding", 4)
      .as[(Long, Long, Double)].collect().map(r => (r._2, r._3)).toMap
    val lsh = Similarity.lshTopK(emb, q, "vec_id", "embedding", 4, 4, 4, nTables = 4)
      .as[(Long, Long, Double)].collect()
    assert(lsh.nonEmpty)
    lsh.foreach { case (_, nid, cos) =>
      assert(math.abs(brute(nid) - cos) < 1e-12) // same scoring, fewer candidates
    }
  }

  test("lshTopK always recalls planted near-duplicates (cos≈1 ⇒ same bucket in every table)") {
    val base = Array.tabulate(16)(i => math.sin(i * 1.7) * 3)
    val nearDup = base.clone(); nearDup(0) += 1e-9
    val corpus = ((0L, base) +: (1L, nearDup) +:
      (2L until 60L).map(i => (i, Array.tabulate(16)(j => math.cos(i * 16 + j) * 3))))
      .toDF("vec_id", "embedding")
    val q = corpus.where($"vec_id" === 0L)
    val lsh = Similarity.lshTopK(corpus, q, "vec_id", "embedding", 16, 6, 1, nTables = 8)
      .as[(Long, Long, Double)].collect()
    assert(lsh.head._2 == 1L && lsh.head._3 > 0.999999)
  }

  test("ivfTopK: exact scores, subset of brute force, planted dup recalled (nProbe=1)") {
    val base = Array.tabulate(16)(i => math.sin(i * 1.7) * 3)
    val nearDup = base.clone(); nearDup(0) += 1e-9
    val corpus = ((0L, base) +: (1L, nearDup) +:
      (2L until 60L).map(i => (i, Array.tabulate(16)(j => math.cos(i * 16 + j) * 3))))
      .toDF("vec_id", "embedding")
    val q = corpus.where($"vec_id" === 0L)
    val cents = Similarity.trainCentroids(corpus, "vec_id", "embedding", nLists = 4, iters = 2)
    assert(cents.length == 4 && cents.forall(c =>
      math.abs(c.map(x => x * x).sum - 1.0) < 1e-9)) // unit-norm centroids
    val brute = Similarity.bruteForceTopK(corpus, q, "vec_id", "embedding", 59)
      .as[(Long, Long, Double)].collect().map(r => (r._2, r._3)).toMap
    val ivf = Similarity.ivfTopK(corpus, q, "vec_id", "embedding", cents,
      nProbe = 1, k = 10).as[(Long, Long, Double)].collect()
    assert(ivf.nonEmpty)
    // cos≈1 ⇒ same nearest centroid ⇒ the planted dup is in the probed cell
    assert(ivf.map(_._2).contains(1L))
    ivf.foreach { case (_, nid, cos) =>
      assert(math.abs(brute(nid) - cos) < 1e-12) // exact within probed cells
    }
  }

  test("ivfTopK with nProbe = nLists is exhaustive (equals brute force)") {
    val corpus = (0L until 30L)
      .map(i => (i, Array.tabulate(8)(j => math.sin(i * 8 + j) * 2)))
      .toDF("vec_id", "embedding")
    val q = corpus.where($"vec_id" < 2L)
    val cents = Similarity.trainCentroids(corpus, "vec_id", "embedding", nLists = 3, iters = 2)
    val brute = Similarity.bruteForceTopK(corpus, q, "vec_id", "embedding", 5)
      .as[(Long, Long, Double)].collect().toSet
    val ivf = Similarity.ivfTopK(corpus, q, "vec_id", "embedding", cents,
      nProbe = 3, k = 5).as[(Long, Long, Double)].collect().toSet
    assert(ivf == brute)
  }

  test("rerankExact over the full corpus as candidates ≡ bruteForceTopK") {
    val corpus = (0L until 40L)
      .map(i => (i, Array.tabulate(8)(j => math.sin(i * 8 + j) * 2)))
      .toDF("vec_id", "embedding")
    val q = corpus.where($"vec_id" < 3L)
    val all = corpus.select($"vec_id".as("nid"))
      .crossJoin(q.select($"vec_id".as("qid")))
      .where($"qid" =!= $"nid")
    val rr = Similarity.rerankExact(all, corpus, q, "vec_id", "embedding", 4)
      .as[(Long, Long, Double)].collect().toSet
    val brute = Similarity.bruteForceTopK(corpus, q, "vec_id", "embedding", 4)
      .as[(Long, Long, Double)].collect().toSet
    assert(rr == brute)
  }

  test("two-stage ivfPq→rerank: subset of coarse candidates, exact cosines, " +
    "planted dup reranked to the top") {
    val base = Array.tabulate(16)(i => math.sin(i * 1.7) * 3)
    val nearDup = base.clone(); nearDup(0) += 1e-9
    val corpus = ((0L, base) +: (1L, nearDup) +:
      (2L until 60L).map(i => (i, Array.tabulate(16)(j => math.cos(i * 16 + j) * 3))))
      .toDF("vec_id", "embedding")
    val q = corpus.where($"vec_id" === 0L)
    val cents = Similarity.trainCentroids(corpus, "vec_id", "embedding",
      nLists = 4, iters = 2)
    val coarse = Similarity.ivfPqTopK(corpus, q, "vec_id", "embedding", cents,
      nProbe = 4, dims = 16, nSub = 4, nCodes = 4, iters = 2, k = 12)
    val candSet = coarse.select("qid", "nid").as[(Long, Long)].collect().toSet
    val rr = Similarity.rerankExact(coarse, corpus, q, "vec_id", "embedding", 5)
      .as[(Long, Long, Double)].collect()
    assert(rr.nonEmpty && rr.forall(r => candSet.contains((r._1, r._2))))
    // exact cosines: every reranked score matches brute force bit-for-bit
    val brute = Similarity.bruteForceTopK(corpus, q, "vec_id", "embedding", 59)
      .as[(Long, Long, Double)].collect().map(r => (r._2, r._3)).toMap
    rr.foreach { case (_, nid, cos) => assert(brute(nid) == cos) }
    // the planted near-dup wins the reranked list regardless of ADC rank
    val top = rr.minBy(r => (-r._3, r._2))
    assert(top._2 == 1L && top._3 > 1.0 - 1e-9)
  }

  test("pqTopK: ADC scores equal a driver-side PQ reference bit-for-bit, " +
    "planted dup recalled first") {
    val dims = 16; val nSub = 4; val nCodes = 4; val iters = 2; val subDim = 4
    val base = Array.tabulate(dims)(i => math.sin(i * 1.7) * 3)
    val nearDup = base.clone(); nearDup(0) += 1e-9
    val corpus = ((0L, base) +: (1L, nearDup) +:
      (2L until 60L).map(i => (i, Array.tabulate(dims)(j => math.cos(i * dims + j) * 3))))
      .toDF("vec_id", "embedding")
    val rows = corpus.as[(Long, Array[Double])].collect().sortBy(_._1)
    val books = Similarity.trainPqCodebooks(corpus, "vec_id", "embedding",
      dims, nSub, nCodes, iters)
    assert(books.length == nSub && books.forall(_.length == nCodes) &&
      books.forall(_.forall(_.length == subDim)))

    // driver-side reference, replicating every fold order and rounding
    def unit(v: Array[Double]): Array[Double] = {
      var acc = 0.0; v.foreach(x => acc += x * x)
      val n = math.sqrt(acc); if (n > 0) v.map(_ / n) else v
    }
    def dround6(x: Double): Double = math.floor(x * 1e6 + 0.5) / 1e6
    def l2sq(a: Array[Double], off: Int, c: Array[Double]): Double = {
      var acc = 0.0; var i = 0
      while (i < c.length) { val d = a(off + i) - c(i); acc += d * d; i += 1 }
      acc
    }
    def dotSub(a: Array[Double], off: Int, c: Array[Double]): Double = {
      var acc = 0.0; var i = 0
      while (i < c.length) { acc += a(off + i) * c(i); i += 1 }
      acc
    }
    def codesOf(u: Array[Double]): Seq[Int] = (0 until nSub).map { s =>
      var best = 0; var bestD = l2sq(u, s * subDim, books(s)(0))
      for (c <- 1 until nCodes) {
        val d = l2sq(u, s * subDim, books(s)(c))
        if (d < bestD) { best = c; bestD = d }
      }
      best
    }
    val qu = unit(base)
    val refTop = rows.filter(_._1 != 0L).map { case (nid, v) =>
      val cs = codesOf(unit(v))
      var adc = 0.0
      for (s <- 0 until nSub) adc += dround6(dotSub(qu, s * subDim, books(s)(cs(s))))
      (nid, adc)
    }.sortBy { case (nid, adc) => (-adc, nid) }.take(5).toSeq

    val top = Similarity.pqTopK(corpus, corpus.where($"vec_id" === 0L),
      "vec_id", "embedding", dims, nSub, nCodes, iters, k = 5)
      .as[(Long, Long, Double)].collect()
      .sortBy { case (_, nid, adc) => (-adc, nid) }
      .map { case (_, nid, adc) => (nid, adc) }.toSeq
    assert(top == refTop) // ids AND double bits
    assert(top.head._1 == 1L) // identical codes as the query ⇒ top rank
  }

  test("chooseRerankDepth: minimal depth meeting the target, deepest as " +
    "ceiling fallback, order-insensitive, frame overload matches") {
    val report = Seq(20 -> 0.475, 5 -> 0.25, 10 -> 0.30) // unsorted on purpose
    assert(Similarity.chooseRerankDepth(report, 0.25) == 5)
    assert(Similarity.chooseRerankDepth(report, 0.26) == 10)
    assert(Similarity.chooseRerankDepth(report, 0.45) == 20)
    // nothing meets the target → the report's ceiling (deepest measured)
    assert(Similarity.chooseRerankDepth(report, 0.99) == 20)
    intercept[IllegalArgumentException] {
      Similarity.chooseRerankDepth(Seq.empty[(Int, Double)], 0.5)
    }
    // the DataFrame overload reads q231's report schema
    val frame = report.map { case (d, r) => (d, 0L, r) }
      .toDF("depth", "n_hits", "recall")
    assert(Similarity.chooseRerankDepth(frame, 0.26) == 10)
    assert(Similarity.chooseRerankDepth(frame, 0.99) == 20)
  }
}
