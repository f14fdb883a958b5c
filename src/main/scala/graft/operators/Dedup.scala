package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions._
import graft.ops.Windows

/** Deduplication operators for training-data pipelines: exact, MinHash+LSH,
  * SimHash, n-gram Jaccard.
  *
  * Scale design (the point — these run over ~100 TB of documents):
  *  - every stage is a hash-partitioned groupBy/join on doc or shingle keys,
  *    no driver-side state, no cross product: LSH banding turns the O(n²)
  *    pair space into equi-joins on (band, signature);
  *  - signatures use the md5-prefix hash (TextFunctions.md5Int), so the
  *    whole pipeline is replayable in any engine for verification;
  *  - shingle explosion is the dominant cost; `shingleTable` keeps only
  *    (id, shingle) distinct pairs and everything downstream aggregates it.
  */
object Dedup {

  /** Exact dedup groups by normalized-text fingerprint: canonical id = min
    * id per group, plus group size. One shuffle on the fingerprint. */
  def exactGroups(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol), fingerprint(col(textCol)).as("fp"))
      .groupBy("fp")
      .agg(min(col(idCol)).as("canonical_id"), count(lit(1)).as("n_docs"))

  /** Distinct (id, shingle) pairs — word n-grams. Two projections: the
    * regex split materializes once per row, then the shingle transform
    * slices the bound array (see TextFunctions.shinglesFromWords — an
    * inline split would re-run per shingle, ~50× the per-doc cost). */
  def shingleTable(df: DataFrame, idCol: String, textCol: String, n: Int): DataFrame =
    // spread: the regex split + ~50× shingle explode + downstream md5 all
    // run in this frame's scan stage — an under-split (single-file) corpus
    // serializes the whole pipeline (guide §2.5; measured q212-class
    // consumers 3.8 → 0.9 s at sf0.1 once the stage stopped being 1 task)
    graft.io.Tables.spreadDf(df.select(col(idCol), col(textCol)))
      .select(col(idCol), words(col(textCol)).as("__ws"))
      .select(col(idCol), explode(shinglesFromWords(col("__ws"), n)).as("sh"))

  /** Mersenne-prime modulus and the deterministic universal-hash family
    * h_i(x) = (a_i·x + b_i) mod M used for MinHash. One md5 per shingle
    * mixed through k cheap multiply-adds — not k md5 evaluations — and the
    * same integer arithmetic replays exactly in the SQL oracle. */
  val HashM: Long = 2147483647L
  def hashParams(k: Int): Seq[(Long, Long)] =
    (0 until k).map { i =>
      val a = (1103515245L * (i + 1) + 12345L) % HashM
      val b = (1103515245L * (i + 101) + 54321L) % HashM
      (if (a == 0) 1L else a, b)
    }

  /** k MinHash values per document: mh_i = min over shingles of
    * (a_i·md5Int(shingle) + b_i) mod M. Single hash-aggregate over the
    * shingle table — partial (map-side) min per seed, so the shuffle
    * carries k longs per doc. */
  def minhashSignatures(sh: DataFrame, idCol: String, k: Int): DataFrame = {
    val hashed = sh.withColumn("h", md5Int(col("sh")))
    val aggs = hashParams(k).zipWithIndex.map { case ((a, b), i) =>
      min((col("h") * a + b) % HashM).as(s"mh_$i")
    }
    hashed.groupBy(col(idCol)).agg(aggs.head, aggs.tail: _*)
  }

  /** Sketch-aggregate variant of minhashSignatures: identical output, one
    * TypedImperativeAggregate buffer per group instead of k min() aggregates
    * (graft.functions.catalyst.MinHashAgg). Same column layout so the two
    * are drop-in interchangeable. */
  def minhashSignaturesSketch(sh: DataFrame, idCol: String, k: Int): DataFrame = {
    import graft.functions.catalyst.MinHashAgg
    val hashed = sh.withColumn("h", md5Int(col("sh")))
    val sketch = hashed.groupBy(col(idCol))
      .agg(MinHashAgg.minhashSketch(col("h"), k, hashParams(k), HashM).as("mh"))
    sketch.select(
      col(idCol) +: (0 until k).map(i => element_at(col("mh"), i + 1).as(s"mh_$i")): _*)
  }

  /** Row-wise MinHash + banding — the STREAMING-SAFE form of
    * [[minhashSignatures]] + [[lshCandidatePairs]]'s band table: identical
    * hash-family arithmetic and band signature (md5 over the comma-joined
    * minhash slice), but computed per ROW over the in-row shingle array
    * instead of per GROUP over the exploded shingle table, so it is a
    * stateless map usable under a streaming plan (no blind aggregate).
    * Batch and stream therefore share one definition of "same bucket":
    * StreamingSpec pins the streamed candidate pairs set-equal to
    * [[lshCandidatePairs]] on the same corpus.
    *
    * Intermediate arrays are bound as real columns before any lambda
    * consumes them (the shinglesFromWords lesson — a higher-order
    * function's lambda body re-evaluates inline subtrees per element).
    * Docs with zero shingles emit no rows, matching the aggregate path
    * (no shingle rows → no signature group). Output: (idCol, band, bsig),
    * `bands` rows per surviving doc. */
  def bandedRows(df: DataFrame, idCol: String, textCol: String, n: Int,
                 k: Int, bands: Int): DataFrame = {
    val hashed = df
      .withColumn("__ws", words(col(textCol)))
      .withColumn("__sh", shinglesFromWords(col("__ws"), n))
      .where(size(col("__sh")) > 0)
      .withColumn("__hs", transform(col("__sh"), s => md5Int(s)))
    val mh = hashParams(k).zipWithIndex.map { case ((a, b), i) =>
      array_min(transform(col("__hs"), h => (h * a + b) % HashM)).as(s"mh_$i")
    }
    explodeBands(hashed.select(col(idCol) +: mh: _*), idCol, k, bands)
  }

  /** THE band-table definition — the one place "same bucket" is defined:
    * band b's signature is md5 over the comma-joined minhash slice
    * [b·r, (b+1)·r). One pass over the signature table: explode the band
    * structs instead of unioning `bands` selects — the upstream signature
    * subplan stays single, so Spark reuses its shuffle across both join
    * sides (ReuseExchange). Shared by [[lshCandidatePairs]] (batch) and
    * [[bandedRows]] (the streaming-safe row form), which is what makes
    * the batch≡stream bucket-semantics pin structural rather than two
    * coincidentally-equal copies. */
  private def explodeBands(sig: DataFrame, idCol: String, k: Int,
                           bands: Int): DataFrame = {
    require(k % bands == 0, "k must be divisible by bands")
    val r = k / bands
    val bandStructs = (0 until bands).map { b =>
      val cols = (b * r until (b + 1) * r).map(i => col(s"mh_$i"))
      struct(lit(b).as("band"),
        md5(concat_ws(",", cols: _*).cast("binary")).as("bsig"))
    }
    sig.select(col(idCol), explode(array(bandStructs: _*)).as("bs"))
      .select(col(idCol), col("bs.band").as("band"), col("bs.bsig").as("bsig"))
  }

  private lazy val log = org.slf4j.LoggerFactory.getLogger(getClass)

  /** Skew guard for banded pair joins: a band signature shared by b docs
    * emits b² candidate pairs, so one boilerplate-heavy bucket (empty docs,
    * shared licence headers) can dominate the whole join. Buckets larger
    * than `cap` are dropped before the self-join, with the drop logged.
    * Recall degrades gracefully: docs in a dropped bucket can still pair
    * through their other bands, and a bucket of thousands of docs is
    * boilerplate by construction, not near-duplication worth reporting.
    *
    * ZERO-JOB gate: building this plan runs no Spark job (the round-5
    * count-gate cost two synchronous driver actions per dedup call —
    * round-trips that serialize on a shared 100-node cluster's driver).
    * The broadcast decision the count made at plan time is instead left to
    * AQE at runtime, from measured sizes: the anti-join's hot side is
    * un-hinted, AQE converts it to broadcast whenever it measures small
    * (the skew tail's normal case), and an adversarial bucket-count blowup
    * degrades to a shuffled key join instead of an OOM'd broadcast — the
    * same discipline as jaccardForPairs / dedupCorpus. The drop stays
    * observable without an action: `observe()` metrics ride the hot frame
    * and a QueryExecutionListener logs dropped-bucket stats when the
    * consuming query completes (OperatorsSpec asserts plan construction
    * schedules no job and the cap semantics are unchanged). */
  private val capObsId = new java.util.concurrent.atomic.AtomicLong()
  private[graft] def capHotBuckets(all: DataFrame, keys: Seq[String], cap: Int,
                            what: String): DataFrame = {
    val hot = all.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("__n")).where(col("__n") > cap)
    // unique per call: two capped joins in one query tree must not collide
    val obsName = s"capHotBuckets:$what:cap=$cap:${capObsId.incrementAndGet()}"
    val observed = hot.observe(obsName, count(lit(1)).as("b"), sum("__n").as("rows"))
    registerCapObservationLogger(all.sparkSession)
    all.join(observed.select(keys.map(col): _*), keys, "left_anti")
  }

  /** Logs capHotBuckets drop stats from observed metrics, once per session. */
  private val capLoggerSessions = java.util.Collections.synchronizedMap(
    new java.util.WeakHashMap[org.apache.spark.sql.SparkSession, java.lang.Boolean]())
  private def registerCapObservationLogger(
      spark: org.apache.spark.sql.SparkSession): Unit =
    capLoggerSessions.synchronized {
      if (!capLoggerSessions.containsKey(spark)) {
        capLoggerSessions.put(spark, java.lang.Boolean.TRUE)
        spark.listenerManager.register(new org.apache.spark.sql.util.QueryExecutionListener {
          override def onSuccess(funcName: String,
                                 qe: org.apache.spark.sql.execution.QueryExecution,
                                 durationNs: Long): Unit =
            qe.observedMetrics.foreach { case (name, row) =>
              if (name.startsWith("capHotBuckets:") && !row.isNullAt(0) &&
                  row.getLong(0) > 0)
                log.warn(s"${name.split(':')(1)}: dropped ${row.getLong(0)} " +
                  s"hot buckets covering ${row.getLong(1)} band rows " +
                  s"(${name.split(':')(2)})")
            }
          override def onFailure(funcName: String,
                                 qe: org.apache.spark.sql.execution.QueryExecution,
                                 exception: Exception): Unit = ()
        })
      }
    }

  /** LSH banding: k minhashes split into `bands` bands of k/bands rows; a
    * candidate pair is any two docs sharing one full band signature.
    * Equi-join on (band, signature) — the scalable core of near-dedup.
    * `maxBucketSize` enables the hot-band skew cap (see capHotBuckets). */
  def lshCandidatePairs(sig: DataFrame, idCol: String, k: Int, bands: Int,
                        maxBucketSize: Option[Int] = None): DataFrame = {
    // Persisted: the band table is tiny (#docs × bands rows of (id, int,
    // hash)) but its lineage is the whole shingle+signature pipeline, which
    // would otherwise run once per join side (the broadcast side defeats
    // ReuseExchange).
    val banded = graft.PinnedFrames.pin(
      explodeBands(sig, idCol, k, bands).persist())
    val all = maxBucketSize.fold(banded)(
      capHotBuckets(banded, Seq("band", "bsig"), _, "lshCandidatePairs"))
    val x = all.as("x"); val y = all.as("y")
    x.join(y,
        col(s"x.band") === col(s"y.band") && col(s"x.bsig") === col(s"y.bsig") &&
          col(s"x.$idCol") < col(s"y.$idCol"))
      .select(col(s"x.$idCol").as("id_a"), col(s"y.$idCol").as("id_b"))
      .distinct()
  }

  /** Exact n-gram Jaccard for a set of candidate pairs: |A∩B| / |A∪B| on
    * per-doc shingle-set arrays joined onto the pair table — computed only
    * for candidates, never all pairs.
    *
    * The shingle table is first semi-joined down to docs that appear in a
    * candidate pair: without this, the array-building aggregate shuffles
    * the ENTIRE corpus shingle table even when candidates are a handful of
    * docs. Candidates ≪ corpus is the invariant that makes candidate
    * generation worth it, so the verify stage's cost should scale with
    * candidates too. The semi-join is NOT broadcast-hinted: web-scale
    * corpora measure 20-50% duplication, so at 100 TB the candidate id set
    * is billions of rows — an unconditional broadcast is a driver/executor
    * OOM. The ids are key-sized (one column), so the shuffled left-semi is
    * cheap, and AQE still converts to broadcast at runtime when the set is
    * actually small. */
  def jaccardForPairs(pairs: DataFrame, sh: DataFrame, idCol: String): DataFrame = {
    // The pair set feeds both the candidate-id semi-join and both sides of
    // the verify join; persist it (tiny — it IS the candidate list) or its
    // whole upstream candidate pipeline re-runs once per reference
    // (measured 24 s → 1.6 s at sf0.1).
    val p = pairs.persist()
    val ids = p.select(col("id_a").as(idCol))
      .union(p.select(col("id_b").as(idCol))).distinct()
    // Intersections are counted ROW-LOCALLY on per-doc shingle-set arrays,
    // not by exploding each pair into its shared-shingle rows: the explode
    // form shuffles Σ|doc| rows PER CANDIDATE on a composite key (measured
    // 6.5 M rows for 125 k candidates at sf0.1 — the whole verify cost),
    // where this form shuffles the candidate-doc shingles once into
    // doc-grain arrays and then only candidate-sized rows. The arrays are
    // doc-length-bounded (LLM-scale docs are chunk-bounded — the
    // trimCovered argument), so a verify row is KB-sized, never corpus-
    // sized; array_intersect probes a per-row hash set, O(|A|+|B|).
    // CPU-DENSE, BYTE-LIGHT stages must pin their own parallelism (guide
    // §2.2): AQE coalesces shuffle reads by BYTES, and both the array
    // aggregate and the verify map carry tiny rows with heavy per-row
    // work — measured at sf0.1, AQE squeezed each to 3 tasks (~5 s of
    // run time serialized 3-wide on a 32-core session: half of q98's
    // wall). Explicit numPartitions repartitions are exempt from AQE
    // coalescing; the count is the session's cores, never a constant.
    val target = sh.sparkSession.sparkContext.defaultParallelism
    val arrs = sh.join(ids, Seq(idCol), "left_semi")
      .repartition(target, col(idCol))
      .groupBy(col(idCol))
      .agg(collect_list(col("sh")).as("__arr"), count(lit(1)).as("sz"))
    val verified = p.repartition(target, col("id_a"))
      .join(arrs.select(col(idCol).as("id_a"), col("__arr").as("__aa"),
        col("sz").as("sz_a")), "id_a")
      .join(arrs.select(col(idCol).as("id_b"), col("__arr").as("__ab"),
        col("sz").as("sz_b")), "id_b")
      .withColumn("inter", size(array_intersect(col("__aa"), col("__ab"))).cast("long"))
      // zero-overlap candidates disappear, as with the old inner join on
      // shared shingles (LSH band-mates need not share any shingle)
      .where(col("inter") > 0)
    verified
      .withColumn("jaccard",
        col("inter").cast("double") * lit(1.0) /
          (col("sz_a") + col("sz_b") - col("inter")))
      .select("id_a", "id_b", "jaccard")
  }

  /** Deterministic pair-level sample predicate over (id_a, id_b) frames:
    * keeps a pair iff md5("salt:id_a:id_b") ≡ 0 (mod modulus) — a 1/modulus
    * Bernoulli sample that is a pure FUNCTION of the pair, so candidate and
    * truth sides of an eval can be sampled consistently (a pair is in-sample
    * on both sides or neither → sampled precision/recall are unbiased
    * estimators of the full-set ratios), and any engine computing the same
    * md5 selects the identical subset (the DuckDB oracles apply this exact
    * predicate). This is the bounded-memory eval path: applied BEFORE the
    * verify join, it divides the pair-grain state (shingle-array rows, agg
    * hash maps) by `modulus` at any scale — the full-truth q202 eval at
    * sf10 ran hot against a single-JVM heap; the sampled variant holds the
    * verify stage's working set at 1/modulus of that, forever.
    *
    * NULL semantics: `concat` (not concat_ws) so a NULL id NULL-propagates
    * through the predicate and the pair is dropped — identical to the
    * SQL-standard `||` the DuckDB oracle uses; concat_ws would silently
    * skip the NULL and the two engines would sample different subsets. */
  def pairSample(modulus: Int, salt: String = "pairsample"): Column =
    pmod(graft.functions.TextFunctions.md5Int(
        concat(lit(salt), lit(":"), col("id_a").cast("string"),
          lit(":"), col("id_b").cast("string"))),
      lit(modulus.toLong)) === 0L

  /** EXACT set-similarity candidate pairs via prefix filtering (AllPairs /
    * PPJoin, Bayardo et al. WWW'07) — the zero-recall-loss complement to
    * LSH banding: every pair with Jaccard ≥ tNum/tDen is guaranteed to be
    * a candidate (no false negatives; the verify stage then drops false
    * positives), where LSH trades recall for candidate count.
    *
    * Under one global token order (rarity-first: ascending document
    * frequency, token text as tie-break), a doc of size s keeps only its
    * first s − ⌈t·s⌉ + 1 tokens (its "prefix"); two docs with J ≥ t must
    * share a token in BOTH prefixes — if their first common token in the
    * global order sat past A's prefix, the whole intersection would fit
    * in A's suffix of size ⌈t·s⌉ − 1 < t·s ≤ |A∩B|, a contradiction. The
    * threshold is a rational (tNum/tDen) so prefix lengths are
    * integer-exact in any engine. Candidate generation is an equi-join on
    * prefix tokens — rarity-first ordering puts the LOWEST-df tokens in
    * prefixes, which is both the selectivity trick (prefix tokens have
    * small df, so the join fans out little) and the natural skew guard;
    * the df and size aggregates are one shuffle each on token/doc keys.
    * The join also carries two inline candidate prunes, both
    * integer-exact and provably free of false negatives (q98's oracle
    * generates candidates WITHOUT them and still hash-matches):
    *  - SIZE filter: J ≥ t forces t·|A| ≤ |B| (the intersection fits in
    *    B yet must be ≥ t·|A|);
    *  - POSITIONAL filter (PPJoin): for the pair's FIRST common token in
    *    the global order, overlap ≤ 1 + min(|A|−pos_A, |B|−pos_B), which
    *    must reach the J ≥ t minimum α = ⌈t(|A|+|B|)/(1+t)⌉. Applied to
    *    every matched occurrence with any-pass semantics — the first
    *    common occurrence is always among the matches (the prefix
    *    theorem), its bound is valid, and later occurrences can only ADD
    *    candidates, never drop a qualifying pair.
    * Measured together at sf0.1: 3.3× fewer candidates (409k → 125k)
    * before the distinct, roughly halving the verify stage. */
  def prefixFilterPairs(sh: DataFrame, idCol: String,
                        tNum: Int, tDen: Int): DataFrame = {
    require(tNum > 0 && tDen > 0 && tNum <= tDen, "threshold must be in (0, 1]")
    val dfT = sh.groupBy("sh").agg(count(lit(1)).as("__df"))
    val sz = sh.groupBy(idCol).agg(count(lit(1)).as("__sz"))
    val ranked = sh.join(dfT, "sh").join(sz, idCol)
      .withColumn("__rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(col(idCol))
          .orderBy(col("__df").asc, col("sh").asc)))
      // prefix length = sz − ⌈t·sz⌉ + 1, all-integer arithmetic
      .withColumn("__plen",
        col("__sz") - expr(s"(__sz * $tNum + ${tDen - 1}) div $tDen") + 1)
    val prefix = ranked.where(col("__rn") <= col("__plen"))
      .select(col(idCol), col("sh"), col("__sz"), col("__rn"))
    // positional bound vs α = ⌈tNum·(a+b) / (tNum+tDen)⌉, all integers
    prefix.as("x").join(prefix.as("y"),
        col("x.sh") === col("y.sh") && col(s"x.$idCol") < col(s"y.$idCol") &&
          col("y.__sz") * tDen >= col("x.__sz") * tNum &&
          col("x.__sz") * tDen >= col("y.__sz") * tNum &&
          lit(1) + least(col("x.__sz") - col("x.__rn"), col("y.__sz") - col("y.__rn")) >=
            expr(s"((x.__sz + y.__sz) * $tNum + ${tNum + tDen - 1}) div ${tNum + tDen}"))
      .select(col(s"x.$idCol").as("id_a"), col(s"y.$idCol").as("id_b"))
      .distinct()
  }

  /** Embedding-cosine near-duplicate pairs: (id_a < id_b, cos ≥ threshold).
    *
    * Exact mode (`lsh = None`) scores every pair — O(n²), the correctness
    * baseline, right for reranking or small partitions. LSH mode
    * (`lsh = Some((dims, nPlanes, nTables))`) generates candidates by
    * multi-table random-hyperplane bucketing (equi-join on (table, bucket),
    * same construction as Similarity.lshTopK) and scores only candidates —
    * approximate recall 1-(1-p^nPlanes)^nTables for per-plane collision
    * probability p = 1-θ/π, the 100 TB path. `maxBucketSize` applies the
    * same hot-bucket cap as the token-LSH join (within-bucket pairs are
    * b²: clustered or boilerplate embeddings concentrate in few buckets —
    * measured at sf1, the 10-cluster synthetic geometry put whole clusters
    * in shared buckets and the uncapped candidate count approached
    * exact mode's). Scoring uses the fused codegen'd CosineSimilarity in
    * both modes, so LSH output is always a subset of exact output with
    * identical scores — capping only shrinks the candidate side. */
  def embeddingNearDups(df: DataFrame, idCol: String, vecCol: String,
                        threshold: Double,
                        lsh: Option[(Int, Int, Int)] = None,
                        maxBucketSize: Option[Int] = None): DataFrame = {
    val base = df.select(col(idCol), col(vecCol).cast("array<double>").as("__v"))
    val a = base.select(col(idCol).as("id_a"), col("__v").as("__va"))
    val b = base.select(col(idCol).as("id_b"), col("__v").as("__vb"))
    val cand = lsh match {
      case None =>
        // exact mode only: the O(n²) scoring loop runs in this join's
        // stream-side stage — spread an under-split corpus (guide §2.5).
        // The LSH mode is deliberately NOT spread: its banding pass is
        // row-linear and the extra exchange measurably cost more than it
        // saved (q105 0.58 → 1.44 s with a spread input).
        graft.io.Tables.spreadDf(a).join(b, col("id_a") < col("id_b"))
      case Some((dims, nPlanes, nTables)) =>
        // Band ONCE and self-join (the lshCandidatePairs shape): banding
        // per join side would compute nTables hyperplane signatures over
        // the corpus twice. The banded table is persisted for the two
        // consumptions (cap grouping + both join sides). The vector
        // payload is DROPPED after the bucket computation (the marginMine
        // id-only shape, adopted from its sf10 measurement: carrying
        // 0.5 KB embeddings through the bucket join + pair-distinct cost
        // 1.8× at 100× data vs shuffling 24-byte id rows and re-attaching
        // vectors with two joins against the side tables).
        val tb = (0 until nTables).map { t =>
          struct(lit(t).as("table"),
            graft.operators.Similarity
              .hyperplaneSig(col("__v"), dims, nPlanes, t).as("bucket"))
        }
        val banded = graft.PinnedFrames.pin(
          base.withColumn("tb", explode(array(tb: _*)))
            .select(col(idCol), col("tb.table").as("table"),
              col("tb.bucket").as("bucket"))
            .persist())
        // Same skew guard as the token-LSH pair join: one hot bucket (a
        // boilerplate embedding, a zero vector, a dense cluster) emits b²
        // candidates. Capped docs can still pair through their other
        // tables; output stays a subset of exact mode either way.
        val all = maxBucketSize.fold(banded)(
          capHotBuckets(banded, Seq("table", "bucket"), _, "embeddingNearDups"))
        all.as("x").join(all.as("y"),
            col("x.table") === col("y.table") &&
              col("x.bucket") === col("y.bucket") &&
              col(s"x.$idCol") < col(s"y.$idCol"))
          .select(col(s"x.$idCol").as("id_a"), col(s"y.$idCol").as("id_b"))
          .distinct()
          .join(a, "id_a").join(b, "id_b")
    }
    cand
      .withColumn("cos", graft.functions.catalyst.VectorExpressions
        .cosineSim(col("__va"), col("__vb")))
      .where(col("cos") >= threshold)
      .select("id_a", "id_b", "cos")
  }

  /** Connected components over a near-duplicate pair table (`id_a`,`id_b`):
    * the stage every dedup pipeline needs after pair generation, because
    * near-duplication is transitive in practice (A≈B, B≈C ⇒ keep one of
    * {A,B,C}) while pair output is not. Returns (id, cluster_id) for every
    * id appearing in a pair; cluster_id = min id of the component.
    *
    * Min-label propagation with pointer jumping: labels seed as
    * min(own id, neighbour ids) — the identity-label first round reduces
    * to a plain neighbour-min over raw edges, so it folds into
    * initialization as one groupBy and saves a full join+jump round; each
    * iteration (a) takes the per-node min over neighbours' labels
    * (one join + one aggregate), then (b) follows its own label's label
    * (path halving: one self-join) — a label is always a node id, so the
    * jump is well-defined. Neighbour-min alone needs O(component diameter)
    * rounds, and near-dup corpora DO produce long chains (doc i ≈ doc i+1
    * under incremental edits — measured 50+ rounds ≈ 2 min at sf0.1); the
    * jump step doubles label reach per round, so convergence is
    * O(log diameter) (2 rounds, ~10 s on the same corpus). Each round
    * persists through the CacheManager (NOT localCheckpoint: checkpoint
    * blocks are invisible to `spark.catalog.clearCache`, so they would
    * leak past query-scoped cache hygiene — and with persist the lineage
    * stays intact, so an evicted block recomputes instead of failing).
    *
    * Nothing is unpersisted inside the loop — deliberately. Spark's
    * non-cascading unpersist "re-caches" dependent entries by DISCARDING
    * their materialized blocks (keeping only the recompiled plan), so an
    * eager release of round k's labels silently unmaterializes round k+1
    * and every later action recomputes the full upstream pipeline
    * (measured: 2-4 s rounds become 50-220 s).
    *
    * Every round REBASES its result onto the materialized RDD
    * (`createDataFrame(df.rdd, schema)`): each round references the
    * previous labels three times (direct, neighbour messages, jump
    * parents), so carrying the logical plan forward multiplies the tree
    * ×3 per round — measured 83k-leaf plans whose CATALYST COMPILATION,
    * not execution, took 70+ s per action at sf0.1. The rebased frame is
    * a constant-size LogicalRDD leaf, so plan compilation is O(1) per
    * round, and because it has no Catalyst dependency on its ancestors,
    * the eager unpersist of the previous round is safe again (the cache
    * discipline: exactly `edges` + the current labels stay cached, both
    * pair-bounded). A pathological case is bounded by `maxIter`.
    * Convergence test: labels only ever decrease, so an unchanged Σlabels
    * (exact, decimal) ⟺ fixpoint — one cheap aggregate per round instead
    * of a changed-rows self-join. All state lives in DataFrames — nothing
    * driver-side scales with the data. */
  /** One label-propagation round — neighbour-min then pointer jump — as a
    * single declarative plan over the cached `edges` and `labels` tables.
    * Factored out so graft.Explain can dump the exact per-round physical
    * plan the q40 loop executes (both inputs are InMemoryTableScan leaves,
    * so the dumped plan IS the per-round work, nothing more). */
  def propagationRound(edges: DataFrame, labels: DataFrame): DataFrame = {
    val nbrMin = edges.join(labels, col("src") === col("id"))
      .groupBy(col("dst")).agg(min("cluster_id").as("nbr_min"))
    val prop = labels.join(nbrMin, col("id") === col("dst"), "left")
      .select(col("id"), least(col("cluster_id"),
        coalesce(col("nbr_min"), col("cluster_id"))).as("cluster_id"))
    // pointer jump (path halving): adopt own candidate label's label from
    // the PREVIOUS round's cached table — joining prop against itself
    // would re-evaluate the uncached prop subtree once per clone (the
    // self-join clone defeats cache-plan matching), compounding per round
    val parents = labels
      .select(col("id").as("__pid"), col("cluster_id").as("__pc"))
    prop.join(parents, col("cluster_id") === col("__pid"), "left")
      .select(col("id"), least(col("cluster_id"),
        coalesce(col("__pc"), col("cluster_id"))).as("cluster_id"))
  }

  /** Lineage rebase: constant-size logical plan per round (see
    * duplicateClusters scaladoc). */
  def rebased(df: DataFrame): DataFrame =
    df.sparkSession.createDataFrame(df.rdd, df.schema)

  def duplicateClusters(pairs: DataFrame, maxIter: Int = 50): DataFrame = {
    def rebase(df: DataFrame): DataFrame = rebased(df)
    val p = pairs.select(col("id_a"), col("id_b"))
    val edges = rebase(p.union(p.select(col("id_b"), col("id_a")))
      .toDF("src", "dst").distinct()).persist()
    // materializes the persist as a side effect — one action per round
    def labelSum(l: DataFrame): java.math.BigDecimal =
      l.agg(sum(col("cluster_id").cast("decimal(38,0)"))).head().getDecimal(0)
    // Large-star seed: round 1 with identity labels is just a neighbour
    // min over raw edges, so fold it into initialization — one groupBy on
    // the symmetric edge table instead of a full join+agg+jump round.
    var labels = rebase(edges.groupBy(col("src"))
      .agg(least(col("src"), min(col("dst"))).as("cluster_id"))
      .select(col("src").as("id"), col("cluster_id"))).persist()
    var prevSum = labelSum(labels)
    var iter = 0
    var converged = false
    while (!converged && iter < maxIter) {
      val next = rebase(propagationRound(edges, labels)).persist()
      val s = labelSum(next)
      converged = s == prevSum
      prevSum = s
      labels.unpersist()
      labels = next
      iter += 1
    }
    if (!converged)
      log.warn(s"duplicateClusters: stopped at maxIter=$maxIter before convergence")
    edges.unpersist()
    labels
  }

  /** Corpus-level dedup: drop every non-canonical member of a duplicate
    * cluster, keep cluster representatives (min id) and all singletons.
    * The anti-join is NOT broadcast-hinted: the drop set is pair-derived,
    * and at web scale 20-50% of a corpus is duplicated, so "pair-bounded"
    * is billions of ids at 100 TB — an unconditional broadcast OOMs the
    * driver. The drop side is a single key column, so the shuffled
    * left-anti is a fingerprint-sized exchange on that side, and AQE
    * downgrades to broadcast at runtime whenever the drop set measures
    * small. */
  def dedupCorpus(docs: DataFrame, idCol: String, pairs: DataFrame): DataFrame = {
    val drop = duplicateClusters(pairs)
      .where(col("id") =!= col("cluster_id"))
      .select(col("id").as(idCol))
    docs.join(drop, Seq(idCol), "left_anti")
  }

  /** Corpus-level dedup keeping the BEST member of each duplicate cluster
    * by an explicit quality ordering (desc, id asc tie-break) — the
    * production form of [[dedupCorpus]]: pipelines that carry a quality
    * score keep the cleanest copy of a near-dup cluster, not the one with
    * the smallest id (a crawl's first-seen copy is often the worst one).
    * Docs outside every cluster are singletons and always survive.
    *
    * Scale shape: clusters come from the pair table ([[duplicateClusters]]
    * — pair-bounded, ≪ corpus), the cluster attach is a key-only left
    * join (cluster side pair-bounded, un-hinted for the dedupCorpus
    * 20-50%-duplication reason), and the representative pick is one
    * row_number window partitioned by cluster label — only CLUSTERED rows
    * have a shared label; singletons keep their own id as label, so the
    * window's per-key state is cluster-sized. Returns the surviving rows
    * of `docs` unchanged (internal columns dropped). */
  def dedupCorpusKeepBest(docs: DataFrame, idCol: String,
                          pairs: DataFrame, quality: Column): DataFrame = {
    val clusters = duplicateClusters(pairs)
      .select(col("id").as(idCol), col("cluster_id"))
    val labeled = docs.join(clusters, Seq(idCol), "left")
      .withColumn("__c", coalesce(col("cluster_id"), col(idCol)))
    graft.ops.Windows
      .keepBest(labeled, Seq("__c"), Seq(quality.desc, col(idCol).asc))
      .drop("__c", "cluster_id")
  }

  /** Incremental ingest dedup: drop new docs whose normalized-text
    * fingerprint already exists in the historical index, then exact-dedup
    * within the batch (keep min id per fingerprint). The daily-ingest
    * complement to `dedupCorpus`: the index side is (fp) only — at 100 TB
    * of history that is one compact column, and the anti-join shuffles
    * fingerprints, never documents; the batch side is a day's ingest.
    * Returns the surviving rows of `newDocs` plus their `fp`, ready to be
    * appended to the index. */
  def dedupeAgainstIndex(newDocs: DataFrame, idCol: String, textCol: String,
                         index: DataFrame): DataFrame = {
    val withFp = newDocs.withColumn("fp", fingerprint(col(textCol)))
    val novel = withFp.join(index.select(col("fp")).distinct(), Seq("fp"), "left_anti")
    Windows.keepBest(novel, Seq("fp"), Seq(col(idCol).asc))
  }

  /** Storage half of the incremental-dedup contract: persist an index
    * (fingerprints `fp`, span hashes `h`) as a managed table BUCKETED on
    * its key column. Every daily `dedupeAgainstIndex` /
    * `dedupSubstringsIncremental` anti/semi-join — and the `distinct()`
    * inside them — then reads the index already hash-clustered on the key,
    * so the history side of the join runs with NO Exchange and NO re-sort
    * of history per ingest: only the day's batch shuffles (into the
    * bucket count's partitioning). At 100 TB of history this is the
    * difference between re-shuffling the whole index every day and
    * shuffling only the ingest; BucketedIndexSpec pins the no-Exchange
    * plan, q102/q103 run the green end-to-end path. Bucket count is the
    * deployment's lever: size it so one bucket ≈ one scan-efficient file
    * (history-cardinality × key-width / 128 MB), not the test-scale 8.
    * Replace (not append) semantics — the daily refresh writes
    * index ∪ batch-novel keys back (see `replaceBucketedTable`). */
  def writeIndexBucketed(index: DataFrame, table: String, keyCol: String,
                         numBuckets: Int): Unit =
    graft.io.Writers.replaceBucketedTable(index, table, keyCol, numBuckets)

  /** Substring-level exact dedup — repeated-sequence removal (Lee et al.
    * 2022, "Deduplicating Training Data Makes Language Models Better"):
    * every duplicated run of ≥ k consecutive tokens keeps its corpus-wide
    * FIRST occurrence (lexicographic (doc, position)) and is removed from
    * every other position, within and across documents. The granularity
    * is the whitespace token and the output text is whitespace-normalized
    * — the token stream is the unit LLM-corpus dedup operates on. The
    * reference has no such pass (LLM-pipeline extension; the single-node
    * literature tool is a suffix array — this is the shuffle-native
    * equivalent).
    *
    * Scale shape: (1) the span table carries (id, pos, md5-of-window) —
    * hash-sized rows, never window text; (2) ONE corpus-grain hash
    * aggregate picks each span-hash's first occurrence (min struct —
    * partial aggregation applies); (3) only NON-first occurrences explode
    * into covered positions (≤ k · duplicated-spans rows — duplication-
    * rate-sized), collected to one small set per affected doc; (4)
    * reconstruction filters each doc's bound token array by covered index
    * with a codegen'd higher-order function — the corpus token stream is
    * never exploded or shuffled, and untouched docs skip the filter
    * entirely. Returns (idCol, clean_text, n_dropped).
    *
    * Reconstruction cost bound: the per-token membership probe is a
    * linear scan of the doc's covered-position array, so a single doc
    * that is ~fully duplicated costs O(len²) with a tiny constant —
    * bounded in practice by document length, not corpus size (docs at
    * LLM scale are chunk-bounded). Docs whose covered-position count
    * crosses `spark.graft.trimCovered.explodeThreshold` automatically
    * switch to the explode + anti-join reconstruction — same semantics,
    * O(len log len), one extra shuffle of only the affected docs (see
    * trimCovered).
    */
  private def wsTable(docs: DataFrame, idCol: String, textCol: String) =
    docs.select(col(idCol), words(col(textCol)).as("__ws"))

  /** (id, pos, h): every k-token window's 1-based start and md5 — the
    * shared grain of the substring-dedup family. Hash-sized rows. */
  private def spanTable(ws: DataFrame, idCol: String, k: Int): DataFrame =
    ws.select(col(idCol), col("__ws"),
        explode(when(size(col("__ws")) >= k,
            sequence(lit(1), size(col("__ws")) - (k - 1)))
          .otherwise(array().cast("array<int>"))).as("pos"))
      .select(col(idCol), col("pos"),
        md5(concat_ws(" ", slice(col("__ws"), col("pos"), lit(k)))
          .cast("binary")).as("h"))

  /** Trim docs by removing their covered positions. Two regimes, split by
    * per-doc covered-position count against
    * `spark.graft.trimCovered.explodeThreshold` (default 16384):
    *
    *  - UNDER the guard (the normal case — covered positions are
    *    duplication-rate-sized): per-doc covered SET + codegen'd index
    *    filter over the bound token array. Memory per doc is O(|cov|) ints
    *    — never more than the doc's own token count, i.e. the same order
    *    as the output row itself, which any row-based engine must hold
    *    anyway; the aggregate degrades hash→sort under pressure, so many
    *    medium docs spill rather than OOM. CPU is the linear membership
    *    probe: O(tokens · |cov|).
    *  - OVER the guard (a pathological mega-doc that is largely
    *    duplicated): the quadratic probe would dominate (16k² ≈ 2.7e8
    *    comparisons per doc and climbing), so those docs take the
    *    explode + anti-join form instead — tokens posexploded, covered
    *    positions anti-joined away, survivors reassembled with one
    *    array_sort(collect_list) — O(tokens log tokens) CPU, one extra
    *    shuffle of ONLY the affected docs' tokens. Identical semantics
    *    (DedupSubstringsSpec pins tiny-threshold ≡ default output).
    *
    * The covered-position frame feeds three consumers (the count gate and
    * both paths) — persisted in `spanCaches` (caller-owned release). */
  private def trimCovered(ws: DataFrame, dup: DataFrame, idCol: String,
                          k: Int): DataFrame = {
    val threshold = ws.sparkSession.conf
      .getOption("spark.graft.trimCovered.explodeThreshold")
      .map(_.toInt).getOrElse(1 << 14)
    val cps = dup
      .select(col(idCol), explode(sequence(col("pos"), col("pos") + (k - 1))).as("cp"))
      .distinct()
      .persist()
    spanCaches.add(cps)
    val covN = cps.groupBy(idCol).agg(count(lit(1)).as("__ncov"))
    val bigIds = covN.where(col("__ncov") > threshold).select(idCol)
    val covSmall = cps.join(bigIds, Seq(idCol), "left_anti")
      .groupBy(idCol).agg(collect_set(col("cp")).as("__cov"))
    val small = ws.join(bigIds, Seq(idCol), "left_anti")
      .join(covSmall, Seq(idCol), "left")
      .select(col(idCol),
        when(col("__cov").isNull, concat_ws(" ", col("__ws")))
          .otherwise(concat_ws(" ",
            filter(col("__ws"), (_, i) => !array_contains(col("__cov"), i + 1))))
          .as("clean_text"),
        coalesce(size(col("__cov")), lit(0)).cast("long").as("n_dropped"))
    val survivors = ws.join(bigIds, Seq(idCol), "left_semi")
      .select(col(idCol), posexplode(col("__ws")).as(Seq("__i", "__tok")))
      .join(cps.select(col(idCol).as("__cid"), col("cp")),
        col(idCol) === col("__cid") && (col("__i") + 1) === col("cp"),
        "left_anti")
      .groupBy(idCol)
      .agg(array_sort(collect_list(struct(col("__i"), col("__tok")))).as("__kept"))
    val big = ws.join(bigIds, Seq(idCol), "left_semi")
      .join(survivors, Seq(idCol), "left") // fully-covered docs keep no tokens
      .join(covN, Seq(idCol))
      .select(col(idCol),
        when(col("__kept").isNull, lit(""))
          .otherwise(concat_ws(" ",
            transform(col("__kept"), s => s.getField("__tok"))))
          .as("clean_text"),
        col("__ncov").cast("long").as("n_dropped"))
    small.unionByName(big)
  }

  def dedupSubstrings(docs: DataFrame, idCol: String, textCol: String,
                      k: Int): DataFrame = {
    require(k >= 2, "k must be ≥ 2")
    val ws = wsTable(docs, idCol, textCol)
    val spans = spanTable(ws, idCol, k)
    val first = spans.groupBy("h")
      .agg(min(struct(col(idCol), col("pos"))).as("f"))
    val dup = spans.join(first, "h")
      .where(col(s"f.$idCol") =!= col(idCol) || col("f.pos") =!= col("pos"))
    trimCovered(ws, dup, idCol, k)
  }

  /** Boilerplate span removal — the common-sequence rule of crawl-cleaning
    * pipelines (CCNet's frequent-paragraph drop, RefinedWeb line-dedup,
    * here at the k-token-span grain the corpus' whitespace tokens give):
    * every k-token span occurring in ≥ `minDf` DISTINCT documents is
    * removed from EVERY document — no first-occurrence survivor. The
    * complement of [[dedupSubstrings]] (Lee et al. keep-first): a licence
    * header or navigation footer stamped across half a crawl is noise in
    * its first copy too.
    *
    * Scale shape — shares the substring-dedup span grain: (1) the span
    * table is (id, pos, md5) hash-sized rows; (2) ONE hash-grain
    * document-frequency aggregate (two-level: distinct (h, id) partials
    * then count — partial aggregation applies at both levels); (3) the
    * hot-span set is boilerplate-sized (≪ span table — df ≥ minDf spans
    * are by definition few distinct HASHES however many occurrences they
    * have), so the semi-join back onto spans is a small build side AQE
    * broadcasts, un-hinted by the dedupCorpus discipline; (4) occurrences
    * of hot spans — duplication-rate-sized — explode into covered
    * positions and docs trim in place ([[trimCovered]]'s bound).
    * Returns (idCol, clean_text, n_dropped). */
  def removeBoilerplate(docs: DataFrame, idCol: String, textCol: String,
                        k: Int, minDf: Int): DataFrame = {
    require(k >= 2, "k must be ≥ 2")
    require(minDf >= 2, "minDf must be ≥ 2 (minDf 1 erases the corpus)")
    val ws = wsTable(docs, idCol, textCol)
    val spans = spanTable(ws, idCol, k)
    val hot = spans.select(col("h"), col(idCol)).distinct()
      .groupBy("h").agg(count(lit(1)).as("__df"))
      .where(col("__df") >= minDf).select("h")
    val dup = spans.join(hot, Seq("h"), "left_semi")
      .select(col(idCol), col("pos"))
    trimCovered(ws, dup, idCol, k)
  }

  /** Span index for INCREMENTAL substring dedup: every span hash of the
    * corpus so far. One hash-grain aggregate; at 100 TB of history this
    * is the same compact-index contract as `dedupeAgainstIndex` — hashes
    * only, never text. */
  def substringSpanIndex(docs: DataFrame, idCol: String, textCol: String,
                         k: Int): DataFrame =
    spanTable(wsTable(docs, idCol, textCol), idCol, k).select("h").distinct()

  /** Incremental substring dedup — the daily-ingest form of
    * [[dedupSubstrings]]: trim a NEW batch against the historical span
    * index plus itself. A batch span whose hash exists in the index is
    * covered outright (the historical occurrence precedes the batch by
    * construction); within the index-novel remainder the batch's own
    * lexicographic-first occurrence survives, exactly q90's rule. When
    * history ids precede batch ids, the trimmed batch is BIT-IDENTICAL
    * to running the full-corpus pass and keeping the batch slice
    * (DedupSubstringsSpec pins the equivalence); the batch's novel
    * hashes are the index delta to append. Shuffles: one anti/semi pair
    * on span hashes (batch-sized) + q90's aggregates over the batch
    * only — history never rescans.
    *
    * Cache ownership (the QuarantinedRead.release convention): the batch
    * span table is persisted so the semi/anti pair and the first-occurrence
    * aggregate share one computation. The cache is CALLER-owned — a
    * daily-ingest loop must call [[releaseSpanCaches]] after materializing
    * each batch's result, or repeated calls pin executor memory for the
    * session lifetime. Releasing before the result's first action is safe
    * (the spans recompute, once per consumer). */
  def dedupSubstringsIncremental(newDocs: DataFrame, idCol: String,
                                 textCol: String, k: Int,
                                 index: DataFrame): DataFrame = {
    require(k >= 2, "k must be ≥ 2")
    val ws = wsTable(newDocs, idCol, textCol)
    val spans = spanTable(ws, idCol, k).persist()
    spanCaches.add(spans)
    val idx = index.select("h")
    val inIndex = spans.join(idx, Seq("h"), "left_semi")
    val novel = spans.join(idx, Seq("h"), "left_anti")
    val firstNovel = novel.groupBy("h")
      .agg(min(struct(col(idCol), col("pos"))).as("f"))
    val novelDup = novel.join(firstNovel, "h")
      .where(col(s"f.$idCol") =!= col(idCol) || col("f.pos") =!= col("pos"))
    val dup = inIndex.select(col(idCol), col("pos"))
      .union(novelDup.select(col(idCol), col("pos")))
    trimCovered(ws, dup, idCol, k)
  }

  /** Span tables persisted by [[dedupSubstringsIncremental]] since the last
    * release — see its scaladoc for the ownership contract. */
  private val spanCaches =
    java.util.Collections.synchronizedList(new java.util.ArrayList[DataFrame]())

  /** Unpersist every span table cached by [[dedupSubstringsIncremental]]
    * so far (caller-owned cache, like QuarantinedRead.release). Call after
    * each ingest batch's result is materialized. */
  def releaseSpanCaches(): Unit = {
    val it = spanCaches.iterator()
    while (it.hasNext) { it.next().unpersist(); it.remove() }
  }

  /** SemDeDup-style semantic dedup (Abbas et al. 2023): cluster the
    * embedding space with the deterministic k-means quantizer, then drop
    * every document whose embedding is ≥ `tau` cosine-similar to a
    * LOWER-id document in the SAME cell (greedy keep-lowest-id, the
    * paper's keep-one-representative rule made deterministic). Returns
    * the surviving (id, cell) rows.
    *
    * Why cells are the point: all-pairs cosine is O(n²) over the corpus —
    * dead at 100 TB. Clustering bounds the quadratic term to within-cell
    * pairs (n²/nLists expected per cell), the exact trade SemDeDup makes:
    * cross-cell near-dups (rare by construction — they quantized apart)
    * are the sacrificed recall. Shuffle inventory: one exchange of
    * (id, vector) on cell for the self-join, one id-keyed shuffled
    * anti-join for the drop set (un-hinted — same 20-50% dup-rate
    * argument as `dedupCorpus`). Assignment itself is map-only.
    * Training is bit-reproducible (q41), so the q60 oracle replays
    * cluster → pairs → drop end to end in SQL. */
  def semanticDedup(df: DataFrame, idCol: String, vecCol: String,
                    cents: Seq[Array[Double]], tau: Double): DataFrame = {
    val assigned = Similarity.assignCells(df, idCol, vecCol, cents)
    val a = assigned.select(col("cell"), col(idCol).as("id_a"), col("__v").as("__va"))
    val b = assigned.select(col("cell"), col(idCol).as("id_b"), col("__v").as("__vb"))
    val drop = a.join(b, Seq("cell"))
      .where(col("id_a") < col("id_b"))
      .where(graft.functions.catalyst.VectorExpressions
        .cosineSim(col("__va"), col("__vb")) >= tau)
      .select(col("id_b").as(idCol)).distinct()
    assigned.join(drop, Seq(idCol), "left_anti").select(col(idCol), col("cell"))
  }

  /** Bloom-accelerated variant of `dedupeAgainstIndex` — IDENTICAL output,
    * different 100 TB cost profile. The fingerprint index is folded once
    * into a Bloom filter (distributed tree-aggregate; only the filter bits
    * reach the driver), which then rides to executors as a codegen'd
    * predicate (BloomMightContain). Because Bloom filters have no false
    * negatives, batch rows testing negative are PROVABLY novel and skip
    * the anti-join entirely; only the `fpp` false-positive sliver plus the
    * true duplicates (typically ≪ batch) continue to exact verification.
    * At 100 TB of history the anti-join's probe side shrinks from the full
    * day's ingest to that sliver — the index-side key shuffle is amortized
    * by bucketing the index on fp at write time (Writers).
    *
    * Sizing: filter bits ≈ -n·ln(fpp)/ln²2 ≈ 1.2 GB for n=10⁹ at 1%,
    * which is executor-broadcast scale, not collect scale; `expectedItems`
    * is the caller's declared index cardinality and over-declaring only
    * wastes bits, while under-declaring inflates fpp (never correctness —
    * exact verification catches every false positive). */
  def dedupeAgainstIndexBloom(newDocs: DataFrame, idCol: String, textCol: String,
                              index: DataFrame, expectedItems: Long = 1000000L,
                              fpp: Double = 0.01): DataFrame = {
    import graft.functions.catalyst.BloomExpressions
    val bf = index.select(col("fp")).stat.bloomFilter("fp", expectedItems, fpp)
    val withFp = newDocs.withColumn("fp", fingerprint(col(textCol)))
    val maybeDup = BloomExpressions.mightContain(col("fp"), bf)
    val provablyNovel = withFp.where(!maybeDup)
    val confirmedNovel = withFp.where(maybeDup)
      .join(index.select(col("fp")).distinct(), Seq("fp"), "left_anti")
    Windows.keepBest(provablyNovel.unionByName(confirmedNovel),
      Seq("fp"), Seq(col(idCol).asc))
  }

  /** SimHash signature over distinct tokens: bit j of the signature is the
    * sign of Σ_tokens (2·bit_j(hash(token)) − 1). One explode + one
    * aggregate; `bits` ≤ 32 with the 32-bit md5Int hash. */
  def simhashSignatures(df: DataFrame, idCol: String, textCol: String,
                        bits: Int = 32): DataFrame = {
    require(bits <= 32, "md5Int supplies 32 bits")
    val tok = df.select(col(idCol),
      explode(array_distinct(words(col(textCol)))).as("tok"))
      .withColumn("h", md5Int(col("tok")))
    val sums = (0 until bits).map { j =>
      sum(when(shiftright(col("h"), j).bitwiseAND(lit(1L)) === 1L, 1)
        .otherwise(-1)).as(s"b_$j")
    }
    val agged = tok.groupBy(col(idCol)).agg(sums.head, sums.tail: _*)
    val sig = (0 until bits).map { j =>
      when(col(s"b_$j") > 0, lit(1L << j)).otherwise(lit(0L))
    }.reduce(_ + _)
    agged.select(col(idCol), sig.as("simhash"))
  }

  /** SimHash near-dup pairs: band the signature into byte blocks (pigeonhole:
    * hamming ≤ bands-1 guarantees one equal block), equi-join per block,
    * then filter by exact hamming distance. */
  def simhashPairs(sig: DataFrame, idCol: String, bits: Int, bands: Int,
                   maxHamming: Int, maxBucketSize: Option[Int] = None): DataFrame = {
    val r = bits / bands
    val mask = (1L << r) - 1
    // Single-pass banding (explode, not union — see lshCandidatePairs) and
    // the signature carried through the band rows, so the hamming filter
    // runs inline on the join output with no re-join against `sig`.
    val bandStructs = (0 until bands).map { b =>
      struct(lit(b).as("band"),
        shiftright(col("simhash"), b * r).bitwiseAND(lit(mask)).as("bsig"))
    }
    val banded = graft.PinnedFrames.pin(
      sig.select(col(idCol), col("simhash"),
          explode(array(bandStructs: _*)).as("bs"))
        .select(col(idCol), col("simhash"),
          col("bs.band").as("band"), col("bs.bsig").as("bsig"))
        .persist()) // see lshCandidatePairs — avoids a per-join-side recompute
    val all = maxBucketSize.fold(banded)(
      capHotBuckets(banded, Seq("band", "bsig"), _, "simhashPairs"))
    val x = all.as("x"); val y = all.as("y")
    x.join(y,
        col("x.band") === col("y.band") && col("x.bsig") === col("y.bsig") &&
          col(s"x.$idCol") < col(s"y.$idCol"))
      .select(col(s"x.$idCol").as("id_a"), col(s"y.$idCol").as("id_b"),
        bit_count(col("x.simhash").bitwiseXOR(col("y.simhash"))).as("hamming"))
      .where(col("hamming") <= maxHamming)
      .distinct()
  }
}
