package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

class CurationSpec extends SparkSpec {
  import spark.implicits._

  test("deterministicSample is reproducible, nested, and rate-accurate") {
    val df = (1L to 4000L).toDF("id")
    val s20 = Curation.deterministicSample(df, "id", 0.2).as[Long].collect().toSet
    val s20again = Curation.deterministicSample(df, "id", 0.2).as[Long].collect().toSet
    val s50 = Curation.deterministicSample(df, "id", 0.5).as[Long].collect().toSet
    assert(s20 == s20again)                      // pure function of (id, salt)
    assert(s20.subsetOf(s50))                    // nested: rate ↑ only adds rows
    assert(math.abs(s20.size / 4000.0 - 0.2) < 0.03)
    val salted = Curation.deterministicSample(df, "id", 0.2, "other")
      .as[Long].collect().toSet
    assert(salted != s20)                        // new salt → independent draw
  }

  test("stratifiedSample applies per-stratum rates") {
    val df = (1L to 3000L).map(i => (i, if (i % 3 == 0) "en" else "de"))
      .toDF("id", "lang")
    val out = Curation.stratifiedSample(df, "id", "lang",
      Map("en" -> 0.0, "de" -> 1.0), defaultRate = 0.5)
    val langs = out.groupBy("lang").count().as[(String, Long)].collect().toMap
    assert(!langs.contains("en"))                // rate 0 drops the stratum
    assert(langs("de") == 2000L)                 // rate 1 keeps everything
  }

  test("temperatureMix: τ=0.5 flattens toward small sources; τ=1 is proportional") {
    // big source: 900 docs × 10 tokens; small: 100 docs × 10 tokens
    val text = "a b c d e f g h i j"
    val docs = ((1L to 900L).map(i => (i, "web", text)) ++
      (1001L to 1100L).map(i => (i, "books", text)))
      .toDF("doc_id", "source", "text")
    val budget = 5000L
    def keptBySource(t: Double) =
      Curation.temperatureMix(docs, "doc_id", "source", "text", budget, t)
        .groupBy("source").count()
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val flat = keptBySource(0.5)
    // τ=0.5: shares √9000:√1000 = 3:1 → books rate caps at 1.0 (kept whole),
    // web downsampled to ~0.417
    assert(flat("books") == 100L)
    assert(flat("web") < 500L && flat("web") > 300L)
    val prop = keptBySource(1.0)
    // τ=1: rate = budget/total tokens = 0.5 for every source
    assert(math.abs(prop("web") - 450L) < 60L)
    assert(math.abs(prop("books") - 50L) < 25L)
    // reproducible
    assert(keptBySource(0.5) == flat)
  }

  test("chunkDocuments covers every word with stride overlap; empty docs vanish") {
    val docs = Seq(
      (1L, (1 to 95).map(i => s"w$i").mkString(" ")), // 95 words → 3 chunks
      (2L, "short doc"),                              // ≤ window → 1 chunk
      (3L, "")).toDF("doc_id", "text")
    val out = Curation.chunkDocuments(docs, "doc_id", "text", window = 40, stride = 30)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
    val d1 = out.filter(_._1 == 1L).sortBy(_._2)
    assert(d1.length == 3)
    assert(d1(0)._3.startsWith("w1 ") && d1(1)._3.startsWith("w31 ")
      && d1(2)._3.startsWith("w61 "))
    assert(d1.map(_._4).toSeq == Seq(40L, 40L, 35L)) // last chunk is the tail
    assert(d1(2)._3.endsWith("w95"))                 // full coverage
    assert(out.count(_._1 == 2L) == 1 && out.filter(_._1 == 2L).head._4 == 2L)
    assert(!out.exists(_._1 == 3L))                  // empty doc → no chunks
  }

  test("packSequences fills each pack to ~budget with one straddler at most") {
    val docs = (1L to 200L).map(i => (i, 10L + i % 7)).toDF("id", "tokens")
    val out = Curation.packSequences(docs, "id", "tokens", budget = 100L, nBuckets = 4)
      .collect().map(r => (r.getAs[Long]("id"), r.getAs[Long]("tokens"),
        r.getAs[Long]("bucket"), r.getAs[String]("pack_id"), r.getAs[Long]("pack_offset")))
    assert(out.length == 200)                        // partition, never drop
    // pack_offset is the exclusive prefix sum mod budget: within a pack,
    // offsets must be strictly increasing in id order
    out.groupBy(_._4).foreach { case (_, members) =>
      val sorted = members.sortBy(_._1)
      assert(sorted.map(_._5).toSeq == sorted.map(_._5).sorted.toSeq)
      // a pack's token span stays within budget + one straddling doc
      assert(members.map(_._2).sum <= 100L + members.map(_._2).max)
    }
    // deterministic: same input → same packing
    val again = Curation.packSequences(docs, "id", "tokens", 100L, 4)
      .collect().map(r => (r.getAs[Long]("id"), r.getAs[String]("pack_id"))).toMap
    assert(out.forall(r => again(r._1) == r._4))
  }

  test("ngramContamination finds planted eval overlap, never unrelated docs") {
    val shared = "alpha beta gamma delta epsilon zeta eta theta"
    val train = Seq(
      (1L, s"intro words then $shared and trailing content here"),
      (2L, "totally unrelated training document with its own words")).toDF("doc_id", "text")
    val eval = Seq((100L, shared)).toDF("doc_id", "text")
    val out = Curation.ngramContamination(train, eval, "doc_id", "text", 5)
      .collect().map(r => (r.getAs[Long]("train_id"), r.getAs[Long]("eval_id"),
        r.getAs[Long]("n_overlap"), r.getAs[Long]("eval_ngrams"),
        r.getAs[Double]("containment")))
    assert(out.length == 1)
    val (tid, eid, overlap, total, cont) = out.head
    assert(tid == 1L && eid == 100L)
    assert(overlap == 4L && total == 4L && cont == 1.0) // all 4 eval 5-grams hit
  }

  test("qualityFilterReport labels failures in declaration order") {
    val docs = Seq(
      (1L, "a good long document with enough words to pass the rules", "en"),
      (2L, "short", "en"),                      // fails min_tokens
      (3L, "!!! ??? ,,, :::", "de"),            // fails min_tokens + max_punct
      (4L, "plenty of words here but the language was never identified at all", "unknown"))
      .toDF("doc_id", "text", "lang")
    val out = Curation.qualityFilterReport(docs, Seq(
        "min_tokens" -> (graft.functions.TextFunctions.tokenCount(col("text")) >= 5L),
        "max_punct" -> (graft.functions.TextFunctions.punctRatio(col("text")) <= 0.3),
        "known_lang" -> (col("lang") =!= "unknown")))
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[String]("failed_rules"), r.getAs[Boolean]("keep"))).toMap
    assert(out(1L) == (("", true)))
    assert(out(2L) == (("min_tokens", false)))
    assert(out(3L) == (("min_tokens,max_punct", false)))
    assert(out(4L) == (("known_lang", false)))
  }

  test("redactPii scrubs urls, emails, phones in that order") {
    import graft.functions.TextFunctions
    val df = Seq(
      "visit https://example.com/a?mail=x@y.com then mail bob@corp.io or call +1 (555) 123-4567 now")
      .toDF("text")
      .select(TextFunctions.redactPii(col("text")).as("clean"))
    val clean = df.as[String].head()
    assert(clean == "visit <URL> then mail <EMAIL> or call <PHONE> now")
  }

  test("assignSplit: disjoint, exhaustive, reproducible, roughly proportional") {
    val docs = (0L until 2000L).toDF("id")
    val fracs = Seq(("train", 0.8), ("val", 0.1), ("test", 0.1))
    val a = Curation.assignSplit(docs, "id", fracs)
      .groupBy("split").count().as[(String, Long)].collect().toMap
    assert(a.values.sum == 2000L)             // exhaustive, one split per row
    assert(a.keySet == Set("train", "val", "test"))
    assert(a("train") > 1500 && a("val") > 120 && a("test") > 120)
    // pure function of (id, salt): identical on re-run and re-partition
    val b = Curation.assignSplit(docs.repartition(7), "id", fracs)
      .groupBy("split").count().as[(String, Long)].collect().toMap
    assert(a == b)
    // a different salt draws a different (but still exhaustive) assignment
    val c = Curation.assignSplit(docs, "id", fracs, salt = "other")
      .groupBy("split").count().as[(String, Long)].collect().toMap
    assert(c.values.sum == 2000L && c != a)
  }

  test("weightedSample: deterministic, exactly k, biased toward heavy rows") {
    val df = (1L to 1000L).map(i => (i, if (i <= 100) 100.0 else 1.0))
      .toDF("id", "w")
    val s1 = Curation.weightedSample(df, "id", "w", 50)
      .select("id").as[Long].collect().toSet
    val s2 = Curation.weightedSample(df.repartition(7), "id", "w", 50)
      .select("id").as[Long].collect().toSet
    assert(s1 == s2 && s1.size == 50) // pure function of (id, salt), exactly k
    // 10% of rows carry 100× weight — they should dominate the sample
    assert(s1.count(_ <= 100) > 25)
    val s3 = Curation.weightedSample(df, "id", "w", 50, salt = "other")
      .select("id").as[Long].collect().toSet
    assert(s3 != s1) // an independent draw
  }

  test("contentDefinedChunks: boundaries survive a prepended edit; fixed windows shift") {
    // 120 distinct tokens, m=4 → ~30 boundaries
    val base = (1 to 120).map(i => s"tk$i").mkString(" ")
    val docs = Seq((1L, base), (2L, "inserted " + base)).toDF("doc_id", "text")
    def chunks(id: Long) = Curation
      .contentDefinedChunks(docs, "doc_id", "text", m = 4)
      .where(col("doc_id") === id).orderBy("chunk_id")
      .select("chunk_text").as[String].collect().toSeq
    val (a, b) = (chunks(1L), chunks(2L))
    // CDC: only the chunk containing the edit differs — every later chunk
    // is bit-identical because boundaries are content-addressed. (If the
    // inserted token is itself a boundary, it forms its own chunk.)
    if (b.head == "inserted") assert(b.tail == a)
    else { assert(b.head == "inserted " + a.head); assert(b.tail == a.tail) }
    // the fixed-window formulation shifts EVERY chunk by construction
    val fa = Curation.chunkDocuments(docs, "doc_id", "text", 10, 10)
      .where(col("doc_id") === 1L).select("chunk_text").as[String].collect().toSet
    val fb = Curation.chunkDocuments(docs, "doc_id", "text", 10, 10)
      .where(col("doc_id") === 2L).select("chunk_text").as[String].collect().toSet
    assert((fa intersect fb).size <= 1)
  }

  test("tokenBudgetSelect keeps best-first until the budget, per source") {
    val docs = Seq(
      // (id, source, quality, tokens) — src a: budget 100 admits q=.9 (60)
      // and q=.8 (30) = 90; q=.7 (30) would cross 100 and is dropped
      (1L, "a", 0.7, 30L), (2L, "a", 0.9, 60L), (3L, "a", 0.8, 30L),
      // src b: a single over-budget doc yields an empty source
      (4L, "b", 0.99, 200L),
      // tie on quality breaks by id: 5 then 6, budget cuts after 5
      (5L, "c", 0.5, 80L), (6L, "c", 0.5, 40L)
    ).toDF("doc_id", "source", "q", "tok")
    val out = Curation.tokenBudgetSelect(docs, "doc_id", "source", "q", "tok", 100L)
      .select("doc_id", "cum_tokens").as[(Long, Long)].collect().toMap
    assert(out == Map(2L -> 60L, 3L -> 90L, 5L -> 80L))
    // metadata contract: payload columns never enter the window shuffle
    val wide = docs.withColumn("text", lit("x" * 10))
    val cols = Curation.tokenBudgetSelect(wide, "doc_id", "source", "q", "tok", 100L)
      .columns.toSet
    assert(!cols.contains("text"))
  }

  test("rankedShards: band-histogram rank == global-window rank, shards balanced") {
    val n = 512 // divisible by nShards so counts split exactly
    // many ties (tok in 0..19) to exercise within-band ordering
    val docs = (1L to n).map(i => (i, (i * 7) % 20)).toDF("doc_id", "tok")
    val got = Curation.rankedShards(docs, "doc_id", "tok", 8)
      .select("doc_id", "global_rank", "shard")
      .as[(Long, Long, Int)].collect().sortBy(_._1)
    import org.apache.spark.sql.expressions.Window
    val ref = docs.withColumn("r",
        row_number().over(Window.orderBy(col("tok").desc, col("doc_id"))))
      .select("doc_id", "r").as[(Long, Int)].collect().toMap
    got.foreach { case (id, rank, shard) =>
      assert(rank == ref(id).toLong, s"doc $id")
      assert(shard == ((rank - 1) % 8).toInt)
    }
    // sorted round-robin balance: every shard gets n/8 docs and token
    // totals spread by at most one max-document
    val byShard = Curation.rankedShards(docs, "doc_id", "tok", 8)
      .groupBy("shard").agg(count(lit(1)).as("n"), sum("tok").as("t"))
      .select("n", "t").as[(Long, Long)].collect()
    assert(byShard.forall(_._1 == n / 8))
    val ts = byShard.map(_._2)
    assert(ts.max - ts.min <= 19L)
  }

  test("epochUpsample: floor+fractional copies, zero-epoch drop, determinism") {
    val docs = (1L to 3000L).map(i =>
      (i, if (i % 3 == 0) "books" else if (i % 3 == 1) "junk" else "web"))
      .toDF("doc_id", "source")
    val out = Curation.epochUpsample(docs, "doc_id", "source",
      Map("books" -> 2.5, "junk" -> 0.0), 1.0)
    val bySrc = out.groupBy("source", "doc_id").count()
      .groupBy("source").agg(avg("count").as("m"), max("count").as("mx"),
        min("count").as("mn"))
      .as[(String, Double, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4)).toMap
    assert(!bySrc.contains("junk"))              // 0 epochs → dropped
    assert(bySrc("web") == ((1.0, 1L, 1L)))      // default: exactly 1 copy
    val (mBooks, mxB, mnB) = bySrc("books")      // 2.5: copies ∈ {2,3}, E≈2.5
    assert(mnB == 2L && mxB == 3L && math.abs(mBooks - 2.5) < 0.05)
    // copy index is dense 1..n per doc
    val copies = out.where(col("source") === "books" && col("doc_id") === 3L)
      .select("copy").as[Int].collect().sorted
    assert(copies.head == 1 && copies.toSeq == (1 to copies.length))
    // pure function of (id, salt): re-run is identical
    val again = Curation.epochUpsample(docs, "doc_id", "source",
      Map("books" -> 2.5, "junk" -> 0.0), 1.0)
      .select("doc_id", "copy").as[(Long, Int)].collect().toSet
    assert(again == out.select("doc_id", "copy").as[(Long, Int)].collect().toSet)
  }

  test("ntileByBands == built-in ntile, including ties, small parts, N<n") {
    import org.apache.spark.sql.expressions.Window
    // ties (several rows share a value), a partition smaller than the
    // bucket count, and values straddling band boundaries (x.005 vs x.004)
    val rows = Seq(
      ("en", 1L, 0.123456), ("en", 2L, 0.123456), ("en", 3L, 0.125),
      ("en", 4L, 3.0), ("en", 5L, 3.0), ("en", 6L, 3.0), ("en", 7L, 0.0),
      ("de", 10L, 1.5), ("de", 11L, 1.4999),
      ("zh", 20L, 9.9)).toDF("lang", "id", "x")
    for (n <- Seq(1, 2, 3, 4)) {
      val want = rows.withColumn("bucket",
          ntile(n).over(Window.partitionBy("lang").orderBy(col("x").asc, col("id").asc)))
        .select("id", "bucket").as[(Long, Int)].collect().toSet
      val got = Curation.ntileByBands(rows, "id", "x", "lang", n)
        .select("id", "bucket").as[(Long, Int)].collect().toSet
      assert(got == want, s"n=$n")
    }
  }

  test("ntileByBands: corpus-sized work never single-partitions") {
    // the only unpartitioned window must run over the band HISTOGRAM, not
    // the input: assert the input-grain window is partitioned
    val rows = (1L to 100L).map(i => ("en", i, (i % 7) / 10.0)).toDF("lang", "id", "x")
    val plan = Curation.ntileByBands(rows, "id", "x", "lang", 3)
      .queryExecution.optimizedPlan.toString
    // row_number windows: one per grain; the input-grain one carries the
    // (part, band) partition spec
    assert(plan.contains("windowspecdefinition(lang"), plan)
  }

  test("perplexityBuckets: reference-like docs land in head, garbage in tail") {
    val refText = "the quick brown fox jumps over the lazy dog again and again"
    val docs = (
      (1L to 20L).map(i => (i, "en", refText)) ++                  // reference-like
      (21L to 30L).map(i => (i, "en", s"zzz$i qqq$i xxw$i vvv$i")) // OOV garbage
    ).toDF("doc_id", "lang", "text")
    val out = Curation.perplexityBuckets(docs, "doc_id", "text", "lang",
        docs.where($"doc_id" <= 20), "text", 3)
      .select("doc_id", "bucket").as[(Long, Int)].collect().toMap
    assert((1L to 20L).forall(out(_) <= 2))       // ref-like: head/middle
    assert((21L to 30L).forall(out(_) == 3))      // garbage: tail
  }

  test("dsirScores: target-like docs score higher; empty doc scores 0; repartition-invariant") {
    val target = (1L to 30L).map(i => (i + 1000L, "alpha beta gamma delta"))
      .toDF("doc_id", "text")
    val docs = Seq(
      (1L, "alpha beta gamma delta"),      // exactly target-like
      (2L, "omega psi chi phi"),           // not target-like
      (3L, "")).toDF("doc_id", "text")
    val s = Curation.dsirScores(docs, "doc_id", "text", target, "text", 256)
    val m = s.select("doc_id", "logw").as[(Long, Double)].collect().toMap
    assert(m(1L) > m(2L))
    assert(m(3L) == 0.0)
    val again = Curation.dsirScores(docs.repartition(7), "doc_id", "text",
      target, "text", 256).select("doc_id", "logw").as[(Long, Double)].collect().toMap
    assert(again == m)
  }

  test("contaminationReport: planted leak rolls up to its source and benchmark only") {
    val train = Seq(
      (1L, "webA", "the quick brown fox jumps over the lazy dog"), // = eval 100
      (2L, "webA", "totally unrelated content words appear here"),
      (3L, "webB", "another clean document sharing nothing at all"))
      .toDF("doc_id", "source", "text")
    val evals = Seq(
      (100L, "mmlu", "the quick brown fox jumps over the lazy dog"),
      (200L, "gsm", "completely different evaluation problem text"))
      .toDF("doc_id", "bench", "text")
    val out = Curation.contaminationReport(train, "doc_id", "text", "source",
        evals, "bench", 3, 0.5)
      .select("source", "bench", "n_train_docs", "n_eval_docs", "max_containment")
      .as[(String, String, Long, Long, Double)].collect().toSeq
    assert(out == Seq(("webA", "mmlu", 1L, 1L, 1.0)))
  }

  test("dsirSelect: exactly k, deterministic, biased toward target-like docs") {
    val target = (1L to 50L).map(i => (i + 5000L, "alpha beta gamma delta epsilon"))
      .toDF("doc_id", "text")
    val docs = ((1L to 50L).map(i => (i, "alpha beta gamma delta epsilon")) ++
      (51L to 100L).map(i => (i, s"junk$i noise$i blob$i crud$i"))).toDF("doc_id", "text")
    val sel = Curation.dsirSelect(docs, "doc_id", "text", target, "text", 256, 40)
      .select("doc_id").as[Long].collect().toSet
    assert(sel.size == 40)
    // Gumbel noise is O(1); the logw gap between target-like and junk is
    // large, so the target-like half dominates the selection
    assert(sel.count(_ <= 50L) >= 35)
    val again = Curation.dsirSelect(docs, "doc_id", "text", target, "text", 256, 40)
      .select("doc_id").as[Long].collect().toSet
    assert(again == sel)
  }

  test("targetEncodeOof: own fold's targets never leak into its encoding") {
    // cat X: fold 0 rows have target 100, fold 1 rows have target 0 —
    // with smoothing 0, fold 0's encoding must be the OTHER fold's mean
    val df = Seq(
      ("X", 100.0, 0L), ("X", 100.0, 0L), ("X", 0.0, 1L), ("X", 0.0, 1L),
      ("Y", 50.0, 0L), ("Y", 70.0, 1L))
      .toDF("cat", "t", "fold")
    val got = Curation.targetEncodeOof(df, "cat", "t", "fold", smoothing = 0.0)
      .as[(String, Long, Long, Double)].collect()
      .map(r => ((r._1, r._2), (r._3, r._4))).toMap
    assert(got(("X", 0L)) == ((2L, 0.0)))    // sees only fold 1's zeros
    assert(got(("X", 1L)) == ((2L, 100.0)))  // sees only fold 0's hundreds
    assert(got(("Y", 0L)) == ((1L, 70.0)))
    assert(got(("Y", 1L)) == ((1L, 50.0)))
  }

  test("targetEncodeOof: smoothing shrinks thin categories to the OOF prior") {
    // cat Z has a single fold-1 row; its fold-0... (no fold-0 rows for Z).
    // For cat W fold 0 (one OOF row, t=10) with m=1 and fold-0 OOF prior:
    // prior_0 = mean of all fold-1 targets = (10 + 90) / 2 = 50
    // enc(W,0) = (10 + 1*50) / (1 + 1) = 30
    val df = Seq(
      ("W", 20.0, 0L), ("W", 10.0, 1L), ("Z", 90.0, 1L))
      .toDF("cat", "t", "fold")
    val got = Curation.targetEncodeOof(df, "cat", "t", "fold", smoothing = 1.0)
      .as[(String, Long, Long, Double)].collect()
      .map(r => ((r._1, r._2), r._4)).toMap
    assert(got(("W", 0L)) == 30.0)
  }
}
