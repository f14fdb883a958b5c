package graft.operators

import graft.SparkSpec

class DedupSubstringsSpec extends SparkSpec {
  import spark.implicits._

  test("cross-doc duplicated run: first occurrence kept, later one removed") {
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta unique one"),
      (2L, "prefix alpha beta gamma delta epsilon zeta suffix"))
      .toDF("doc_id", "text")
    val out = Dedup.dedupSubstrings(docs, "doc_id", "text", k = 6)
      .as[(Long, String, Long)].collect().sortBy(_._1).toSeq
    assert(out == Seq(
      (1L, "alpha beta gamma delta epsilon zeta unique one", 0L), // first
      (2L, "prefix suffix", 6L)))                    // run excised, rest kept
  }

  test("within-doc repetition keeps only the first run") {
    val docs = Seq((1L, "a b c d a b c d tail")).toDF("doc_id", "text")
    val out = Dedup.dedupSubstrings(docs, "doc_id", "text", k = 4).head()
    assert(out.getString(1) == "a b c d tail" && out.getLong(2) == 4L)
  }

  test("overlapping duplicated spans: covered positions union, no double count") {
    // "m1..m5" repeats in doc 2 shifted by one — spans at pos 2 and pos 3
    // both duplicate doc 1 content and overlap; union coverage = 2..7
    val docs = Seq(
      (1L, "m1 m2 m3 m4 m5 x y m2 m3 m4 m5 m6"),
      (2L, "lead m1 m2 m3 m4 m5 m6 trail"))
      .toDF("doc_id", "text")
    val out = Dedup.dedupSubstrings(docs, "doc_id", "text", k = 5)
      .as[(Long, String, Long)].collect().sortBy(_._1).toSeq
    assert(out(1) == ((2L, "lead trail", 6L)))
  }

  test("prefixFilterPairs: complete vs all-pairs Jaccard, yet prunes candidates") {
    import org.apache.spark.sql.functions._
    // 30 docs over a 40-token vocab: doc i shares a sliding window with
    // its neighbours → controlled mix of high/low-overlap pairs
    val docs = (0 until 30).map { i =>
      (i.toLong, (0 until 12).map(j => s"w${(i * 3 + j) % 40}").mkString(" "))
    }.toDF("doc_id", "text")
    val sh = Dedup.shingleTable(docs, "doc_id", "text", 1).persist()
    // ground truth: jaccard >= 1/2 over ALL pairs
    val all = sh.as("a").join(sh.as("b"), col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b")).distinct()
    val want = Dedup.jaccardForPairs(all, sh, "doc_id")
      .where(col("jaccard") >= 0.5)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(want.nonEmpty) // the corpus actually has qualifying pairs
    val cand = Dedup.prefixFilterPairs(sh, "doc_id", 1, 2).persist()
    val got = Dedup.jaccardForPairs(cand, sh, "doc_id")
      .where(col("jaccard") >= 0.5)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(got == want)                       // zero false negatives
    assert(cand.count() < all.count())        // and the prefix really prunes
  }

  test("prefixFilterPairs: seeded random corpora × thresholds — zero false negatives") {
    import org.apache.spark.sql.functions._
    // Adversarial shapes the structured corpus above can't produce: skewed
    // doc sizes (1..18 tokens), exact duplicates (J = 1), near-disjoint
    // docs, and the t = 1 boundary where every prefix is a single token.
    // Completeness must hold for EVERY threshold — the prefix length,
    // size filter and positional bound all move with t.
    for (seed <- Seq(11, 23); (tn, td) <- Seq((1, 2), (2, 3), (4, 5), (1, 1))) {
      val rnd = new scala.util.Random(seed)
      val base = (0L until 36L).map { i =>
        i -> (0 until 1 + rnd.nextInt(18)).map(_ => s"v${rnd.nextInt(30)}")
          .distinct.mkString(" ")
      }
      // clone a few docs verbatim so J = 1 pairs exist at every threshold
      val docs = (base ++ Seq(100L -> base(3)._2, 101L -> base(7)._2))
        .toDF("doc_id", "text")
      val sh = Dedup.shingleTable(docs, "doc_id", "text", 1).persist()
      val all = sh.select("doc_id").distinct().as("a")
        .join(sh.select("doc_id").distinct().as("b"),
          col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))
      val t = tn.toDouble / td
      val want = Dedup.jaccardForPairs(all, sh, "doc_id")
        .where(col("jaccard") >= t)
        .select("id_a", "id_b").as[(Long, Long)].collect().toSet
      assert(want.nonEmpty, s"seed=$seed t=$tn/$td produced no qualifying pairs")
      val got = Dedup.jaccardForPairs(
          Dedup.prefixFilterPairs(sh, "doc_id", tn, td), sh, "doc_id")
        .where(col("jaccard") >= t)
        .select("id_a", "id_b").as[(Long, Long)].collect().toSet
      assert(got == want, s"false negatives at seed=$seed t=$tn/$td: ${want -- got}")
      sh.unpersist()
    }
  }

  test("incremental ≡ full-corpus pass on the batch slice (history ids precede)") {
    import org.apache.spark.sql.functions._
    val hist = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta"),
      (2L, "one two three four five six seven eight nine"))
      .toDF("doc_id", "text")
    val batch = Seq(
      (10L, "pre alpha beta gamma delta epsilon zeta post"), // repeats history
      (11L, "fresh content aa bb cc dd ee ff gg hh"),        // novel
      (12L, "fresh content aa bb cc dd ee ff gg hh tail"))   // repeats 11 (in-batch)
      .toDF("doc_id", "text")
    val k = 6
    val full = Dedup.dedupSubstrings(hist.union(batch), "doc_id", "text", k)
      .where(col("doc_id") >= 10L)
      .as[(Long, String, Long)].collect().toSet
    val inc = Dedup.dedupSubstringsIncremental(batch, "doc_id", "text", k,
        Dedup.substringSpanIndex(hist, "doc_id", "text", k))
      .as[(Long, String, Long)].collect().toSet
    assert(inc == full)                       // bit-identical on the batch
    assert(inc.exists { case (id, _, n) => id == 10L && n > 0 }) // history hit
    assert(inc.exists { case (id, _, n) => id == 12L && n > 0 }) // in-batch dup
    assert(inc.exists { case (id, _, n) => id == 11L && n == 0 }) // first wins
  }

  test("dedupSubstrings ≡ driver-side reference on a seeded random corpus") {
    val rnd = new scala.util.Random(7)
    val k = 4
    // tiny vocab forces plenty of genuine duplicated k-runs
    val docs = (0L until 60L).map { i =>
      i -> Seq.fill(3 + rnd.nextInt(20))(s"t${rnd.nextInt(6)}").mkString(" ")
    }
    // reference: global first occurrence per span under (doc, pos), then
    // covered-position union, then token filter — independent recompute
    val toks = docs.map { case (id, t) => id -> t.split("\\s+").toSeq }.toMap
    val firstOcc = scala.collection.mutable.Map.empty[Seq[String], (Long, Int)]
    for ((id, ws) <- toks.toSeq.sortBy(_._1); p <- 0 to ws.length - k)
      firstOcc.getOrElseUpdate(ws.slice(p, p + k), (id, p))
    val want = toks.map { case (id, ws) =>
      val covered = (for {
        p <- 0 to ws.length - k
        if firstOcc(ws.slice(p, p + k)) != ((id, p))
        c <- p until p + k
      } yield c).toSet
      val keptToks = ws.zipWithIndex.collect { case (w, i) if !covered(i) => w }
      (id, keptToks.mkString(" "), covered.size.toLong)
    }.toSet
    val got = Dedup.dedupSubstrings(docs.toDF("doc_id", "text"),
        "doc_id", "text", k)
      .as[(Long, String, Long)].collect().toSet
    assert(got == want)
    assert(want.exists(_._3 > 0)) // the corpus really exercises removal
  }

  test("mega-doc explode path ≡ covered-set path; degenerate full duplicate completes") {
    // equivalence: force EVERY covered doc through the explode + anti-join
    // reconstruction and require bit-identical output to the default path
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta unique one"),
      (2L, "prefix alpha beta gamma delta epsilon zeta suffix"),
      (3L, "m1 m2 m3 m4 m5 x y m2 m3 m4 m5 m6"),
      (4L, ""), (5L, "short doc")).toDF("doc_id", "text")
    def run() = Dedup.dedupSubstrings(docs, "doc_id", "text", k = 6)
      .as[(Long, String, Long)].collect().sortBy(_._1).toSeq
    val default = run()
    spark.conf.set("spark.graft.trimCovered.explodeThreshold", "1")
    val exploded = try run()
    finally spark.conf.unset("spark.graft.trimCovered.explodeThreshold")
    assert(exploded == default)

    // degenerate mega-doc at the REAL threshold: a 20k-token doc that is a
    // full copy of another exceeds the 16384 guard, takes the explode path,
    // and trims to nothing — the covered-set buffer never materializes
    val n = 20000
    val body = (1 to n).map(i => s"t$i").mkString(" ")
    val mega = Seq((1L, body), (2L, body), (3L, s"t5 t6 alone")).toDF("doc_id", "text")
    val out = Dedup.dedupSubstrings(mega, "doc_id", "text", k = 6)
      .as[(Long, String, Long)].collect().sortBy(_._1).toSeq
    Dedup.releaseSpanCaches()
    assert(out == Seq(
      (1L, body, 0L),              // first occurrence kept whole
      (2L, "", n.toLong),          // fully covered, reassembles to empty
      (3L, "t5 t6 alone", 0L)))    // tiny doc untouched on the small path
  }

  test("docs shorter than k, empty docs, and unique docs pass through") {
    val docs = Seq((1L, "one two three"), (2L, "   "), (3L, "x y"))
      .toDF("doc_id", "text")
    val out = Dedup.dedupSubstrings(docs, "doc_id", "text", k = 4)
      .as[(Long, String, Long)].collect().sortBy(_._1).toSeq
    assert(out == Seq((1L, "one two three", 0L), (2L, "", 0L), (3L, "x y", 0L)))
  }
}
