package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an embedding column.
  *
  * Two paths:
  *  - `bruteForceTopK`: exact cosine top-k of a (small, broadcastable) query
  *    set against the corpus — the correctness baseline. The corpus side
  *    streams; per-row work is a codegen'd higher-order-function fold, no
  *    UDF, no collect.
  *  - `lshTopK`: the scale path — random-hyperplane LSH buckets (deterministic
  *    hash-derived planes), so candidate generation is an equi-join on bucket
  *    signature instead of a full cross product. Probing multiple tables
  *    trades recall for cost.
  */
object Similarity {

  /** Sequential-fold dot product over two double arrays — bit-identical to
    * DuckDB's list_reduce((a,b)->a+b) left fold, which the oracle uses. */
  def dot(a: Column, b: Column): Column =
    graft.functions.catalyst.VectorExpressions.dotProduct(a, b)

  def l2norm(a: Column): Column = sqrt(dot(a, a))

  /** Fused single-pass native expression (see VectorExpressions scaladoc);
    * same summation order as the HOF/DuckDB formulations. */
  def cosine(a: Column, b: Column): Column =
    graft.functions.catalyst.VectorExpressions.cosineSim(a, b)

  /** Cosine with PRE-COMPUTED squared norms (optimization guide §1.2 "per-
    * task work"): in an n×m scoring join the fused [[cosine]] re-derives
    * ‖x‖² and ‖y‖² inside every pair's loop — 3 multiply-adds per element
    * where only x·y varies per pair. Computing each row's ‖v‖² ONCE before
    * the join cuts the pair loop to the dot product alone (~3× less FMA on
    * the quadratic stage). Bit-identical to [[cosine]] for equal-length
    * vectors: the self-dot accumulates xi·xi in the same sequential fold
    * order as CosineSimilarity's xx accumulator, and the final
    * xy / (√xx · √yy) is the same expression tree — the caller must pass
    * `sq(x)` / `sq(y)` built by [[normSq]] on the SAME vectors. NULL
    * semantics match: zero-norm sides yield NULL, not NaN. */
  def normSq(v: Column): Column =
    graft.functions.catalyst.VectorExpressions.dotProduct(v, v)

  def cosinePreNorm(a: Column, b: Column, aa: Column, bb: Column): Column =
    // the equal-length precondition is ENFORCED, not just documented
    // (ADVICE r15): a ragged pair would silently score against full-vector
    // norms where the fused [[cosine]] truncates to min(|a|,|b|) — NULL is
    // the defined contract for a malformed pair, same as a zero norm. The
    // size probe is O(1) per pair next to the O(d) dot product.
    when(size(a) =!= size(b) || aa === 0.0 || bb === 0.0,
        lit(null).cast("double"))
      .otherwise(graft.functions.catalyst.VectorExpressions.dotProduct(a, b) /
        (sqrt(aa) * sqrt(bb)))

  /** Exact top-k cosine neighbors for each row of `queries` (small — it gets
    * broadcast) against `corpus`. Self-matches on equal ids are excluded.
    * Output: (qid, nid, cos). The per-query top-k runs on the custom
    * bounded-heap operator (`plans.TopKPerGroup`) rather than a window —
    * the scored stream is corpus-sized per query, and the heap exec keeps
    * k rows per query with no per-group sort (results identical to the
    * row_number formulation; q25's oracle still states the window form). */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
                     vecCol: String, k: Int): DataFrame = {
    // squared norms once per ROW, not once per PAIR (see [[cosinePreNorm]]);
    // corpus side spread: the n×m scoring loop runs in the corpus scan's
    // stage, and an under-split (single-file) scan serializes it
    val c = graft.io.Tables.spreadDf(
      corpus.select(col(idCol).as("nid"),
        col(vecCol).cast("array<double>").as("nvec")))
      .withColumn("__nn", normSq(col("nvec")))
    val q = queries.select(col(idCol).as("qid"),
      col(vecCol).cast("array<double>").as("qvec"))
      .withColumn("__qq", normSq(col("qvec")))
    val scored = c.join(broadcast(q), col("qid") =!= col("nid"))
      .withColumn("cos", cosinePreNorm(col("qvec"), col("nvec"),
        col("__qq"), col("__nn")))
      .select("qid", "nid", "cos")
    graft.plans.TopK.topKPerGroup(scored, Seq("qid"),
      Seq("cos" -> true, "nid" -> false), k)
  }

  /** Contrastive-pair mining for metric-learning data prep: for each query
    * row, the single nearest neighbor sharing its label (the positive) and
    * the single nearest with a different label (the hard negative) — the
    * in-batch "hardest" pairs a triplet/InfoNCE fine-tune wants. Output is
    * long-form: one (qid, kind ∈ {pos, neg}, nid, label, cos) row per side,
    * deterministic under (cos desc, nid) tie-break.
    *
    * Scale shape: identical to [[bruteForceTopK]] — query batches are
    * broadcast-sized by contract, the corpus is never shuffled, and the
    * per-(qid, kind) top-1 is a window over the scored join. For corpus-×-
    * corpus mining, swap the scoring join for [[ivfTopK]] cells or LSH
    * buckets exactly as the ANN path does; the window stage is unchanged. */
  def hardPairs(corpus: DataFrame, queries: DataFrame, idCol: String,
                vecCol: String, labelCol: String): DataFrame = {
    // same per-row norm precompute + corpus spread as [[bruteForceTopK]]
    val c = graft.io.Tables.spreadDf(
      corpus.select(col(idCol).as("nid"),
        col(vecCol).cast("array<double>").as("nvec"),
        col(labelCol).as("nlabel")))
      .withColumn("__nn", normSq(col("nvec")))
    val q = queries.select(col(idCol).as("qid"),
      col(vecCol).cast("array<double>").as("qvec"),
      col(labelCol).as("qlabel"))
      .withColumn("__qq", normSq(col("qvec")))
    val scored = c.join(broadcast(q), col("qid") =!= col("nid"))
      .withColumn("cos", cosinePreNorm(col("qvec"), col("nvec"),
        col("__qq"), col("__nn")))
      .withColumn("kind",
        when(col("nlabel") === col("qlabel"), lit("pos")).otherwise(lit("neg")))
    val w = Window.partitionBy("qid", "kind")
      .orderBy(col("cos").desc, col("nid").asc)
    scored.withColumn("rn", row_number().over(w)).where(col("rn") === 1)
      .select(col("qid"), col("kind"), col("nid"), col("nlabel").as("label"),
        col("cos"))
  }

  /** Deterministic random-hyperplane signature for one hash table: plane
    * p is a ±1 literal vector derived from md5("t:p:i"); the signature bit
    * is the sign of v·plane, computed with the native DotProduct expression
    * against the literal array — one compact codegen loop per plane rather
    * than dims×planes expanded terms (which explodes Janino compile time). */
  def hyperplaneSig(vec: Column, dims: Int, nPlanes: Int, table: Int): Column = {
    val bits = (0 until nPlanes).map { p =>
      val plane = typedlit(planeVec(table, p, dims))
      val s = graft.functions.catalyst.VectorExpressions.dotProduct(vec, plane)
      when(s > 0, lit(1L << p)).otherwise(lit(0L))
    }
    bits.reduce(_ + _)
  }

  /** Precomputed deterministic ±1 plane (md5 of "t:p:i" per component).
    * Exposed within graft so the q26 oracle generator can inline the same
    * literals into its SQL (the no-drift rule: one source of constants). */
  private[graft] def planeVec(t: Int, p: Int, dims: Int): Array[Double] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    Array.tabulate(dims) { i =>
      md.reset()
      val h = md.digest(s"$t:$p:$i".getBytes("UTF-8"))
      if ((h(0) & 1) == 1) 1d else -1d
    }
  }

  /** Scale-path ANN: multi-table hyperplane LSH. Each side gets one bucket
    * per hash table; a candidate is any (query, corpus) pair sharing a
    * bucket in ANY table — recall 1-(1-p^nPlanes)^nTables for collision
    * probability p = 1 - θ/π, tuned by (nPlanes, nTables). The candidate
    * generation is an equi-join on (table, bucket); candidates dedupe
    * before scoring so each pair is scored once. */
  def lshTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
              vecCol: String, dims: Int, nPlanes: Int, k: Int,
              nTables: Int = 8): DataFrame = {
    // id-only band rows (the marginMine shape, from its sf10 measurement):
    // the bucket join and the pair-distinct shuffle 24-byte id rows, never
    // the embeddings — vectors re-attach onto the (much smaller)
    // deduplicated candidate frame afterwards
    def bucketed(df: DataFrame, id: String, vec: String): DataFrame = {
      val buckets = (0 until nTables).map { t =>
        struct(lit(t).as("table"),
          hyperplaneSig(col(vec), dims, nPlanes, t).as("bucket"))
      }
      df.select(col(idCol).as(id), col(vecCol).cast("array<double>").as(vec))
        .withColumn("tb", explode(array(buckets: _*)))
        .select(col(id), col("tb.table").as("table"),
          col("tb.bucket").as("bucket"))
    }
    val cBase = corpus.select(col(idCol).as("nid"),
      col(vecCol).cast("array<double>").as("nvec"))
    val qBase = queries.select(col(idCol).as("qid"),
      col(vecCol).cast("array<double>").as("qvec"))
    val cand = bucketed(corpus, "nid", "nvec")
      .join(broadcast(bucketed(queries, "qid", "qvec")), Seq("table", "bucket"))
      .where(col("qid") =!= col("nid"))
      .select("qid", "nid")
      .distinct()
      .join(broadcast(qBase), "qid")
      .join(cBase, "nid")
    val scored = cand.withColumn("cos", cosine(col("qvec"), col("nvec")))
    val w = Window.partitionBy("qid").orderBy(col("cos").desc, col("nid").asc)
    scored.withColumn("rn", row_number().over(w)).where(col("rn") <= k)
      .select("qid", "nid", "cos")
  }

  /** Index of the centroid with the highest dot product against `vec`.
    * For unit vectors max-dot = nearest centroid in angular distance.
    * Ties take the lowest index deterministically.
    *
    * SIZE-INDEPENDENT: the centroids travel as ONE array-of-arrays
    * literal and the argmax is a single generated loop
    * ([[graft.functions.catalyst.NearestCell]]), so plan size and Janino
    * compile time are flat in nLists. The previous struct-argmax cascade
    * unrolled one dot-product expression per centroid — linear plan
    * growth, with a measured ~2-minute cold compile at just 16 cells on
    * the SQL-TVF twin (SCALE.md); production IVF wants nLists in the
    * thousands. Scoring order, fold order, and tie-breaks are identical,
    * so every oracle replay (q41/q140/q221–q223) hashes unchanged. */
  def nearestCentroid(vec: Column, cents: Seq[Array[Double]]): Column =
    graft.functions.catalyst.CentroidExpressions.nearestCell(vec, cents)

  /** The `nProbe` centroid indices nearest to `vec`, best first — same
    * single-literal loop shape as [[nearestCentroid]] (bounded nProbe-slot
    * insertion instead of sorting all cells). */
  def nearestCentroids(vec: Column, cents: Seq[Array[Double]], nProbe: Int): Column =
    graft.functions.catalyst.CentroidExpressions.nearestCells(vec, cents, nProbe)

  /** L2-normalized copy of an array column. The norm binds to a column
    * BEFORE the per-element divide — an inline norm inside the `transform`
    * lambda would re-run the whole fold once per element (the shingles
    * lesson, ×dims here). */
  private def withUnitVec(df: DataFrame, vec: String, out: String): DataFrame =
    df.withColumn("__n", l2norm(col(vec)))
      .withColumn(out,
        when(col("__n") > 0, transform(col(vec), x => x / col("__n")))
          .otherwise(col(vec)))
      .drop("__n")

  /** Deterministic spherical k-means for the IVF coarse quantizer.
    *
    * Init: the `nLists` lowest-id vectors (deterministic, no RNG — this
    * module bans nondeterminism so oracles and re-runs replay). Each Lloyd
    * iteration is fully distributed: one map pass assigns every vector to
    * its nearest centroid (argmax cascade), one aggregation computes
    * element-wise cell sums via posexplode, and only the nLists×dims
    * centroid model ever reaches the driver (config-sized — the same
    * collect class as broadcast weights). Empty cells keep their previous
    * centroid. Returns unit-norm centroids.
    *
    * Cell sums are quantized to `quantize` decimal places and summed as
    * DECIMAL (the Qutil msum rule): double sums are order-dependent in the
    * last ulps and aggregation order is nondeterministic, so without this
    * the trained model — and therefore cell assignments near Voronoi
    * boundaries — would differ between re-runs of the SAME data. With it,
    * training is bit-reproducible and the q41 oracle replays the whole
    * Lloyd loop in SQL. The driver-side normalization is a sequential
    * ascending fold, mirrored by the oracle's ordered list_reduce. */
  def trainCentroids(corpus: DataFrame, idCol: String, vecCol: String,
                     nLists: Int, iters: Int = 3,
                     quantize: Int = 6): Seq[Array[Double]] = {
    import org.apache.spark.sql.types.DecimalType
    // persist once across the loop: every Lloyd iteration (plus the init
    // collect) otherwise re-runs the scan + normalization subtree — at toy
    // scale that is iters× redundant job setup, at 100 TB iters× redundant
    // I/O (the q73 pinned-edge-table rule applied to training)
    val vecs = withUnitVec(
      corpus.select(col(idCol).as("id"),
        col(vecCol).cast("array<double>").as("v")), "v", "u")
      .select(col("id"), col("u"))
      .persist()
    var cents: Seq[Array[Double]] =
      vecs.orderBy("id").limit(nLists).select("u").collect()
        .map(_.getSeq[Double](0).toArray).toSeq
    for (_ <- 0 until iters) {
      val sums = vecs
        .withColumn("cell", nearestCentroid(col("u"), cents))
        .select(col("cell"), posexplode(col("u")).as(Seq("pos", "x")))
        .groupBy("cell", "pos")
        .agg(sum(graft.queries.Qutil.dround(col("x"), quantize)
          .cast(DecimalType(38, quantize + 2))).cast("double").as("sx"))
        .collect()
      val byCell = sums.groupBy(_.getAs[Int]("cell"))
      cents = cents.zipWithIndex.map { case (old, i) =>
        byCell.get(i).fold(old) { rows =>
          val c = new Array[Double](old.length)
          rows.foreach(r => c(r.getAs[Int]("pos")) = r.getAs[Double]("sx"))
          val n = math.sqrt(c.map(x => x * x).sum)
          if (n > 0) c.map(_ / n) else old
        }
      }
    }
    vecs.unpersist(blocking = false)
    cents
  }

  /** Symmetric int8 scalar quantization of an embedding column:
    * scale = max|x|/127 per vector, q_i = round-half-up(x_i/scale) clamped
    * to ±127 — 4× smaller than float32 on disk/in shuffle, the standard
    * storage tier for billion-vector ANN. Quantized values are emitted as
    * integer-VALUED doubles so the fused cosine expression consumes them
    * directly; `scale` rides along for dequantization. Zero vectors
    * quantize to zeros with scale 0.
    *
    * Determinism bonus over float cosine: int·int products and their sums
    * are EXACT in double (≤ 127²·dims ≪ 2⁵³), so quantized dot products
    * are order-independent without any rounding discipline — the q62
    * oracle replays them with no decimal scaffolding. */
  def quantizeInt8(df: DataFrame, idCol: String, vecCol: String): DataFrame =
    df.select(col(idCol), col(vecCol).cast("array<double>").as("__v"))
      // bind the scale to a column first: inline it and the array_max fold
      // re-runs once per element inside the transform (the norm lesson)
      .withColumn("scale", array_max(transform(col("__v"), x => abs(x))) / lit(127.0))
      .withColumn("qvec",
        when(col("scale") > 0,
          transform(col("__v"), x =>
            greatest(lit(-127.0), least(lit(127.0),
              floor(x / col("scale") + lit(0.5))))))
          .otherwise(transform(col("__v"), _ => lit(0.0))))
      .select(col(idCol), col("qvec"), col("scale"))

  /** Brute-force top-k over int8-quantized vectors: same plan shape as
    * `bruteForceTopK` (corpus scan × broadcast queries, fused cosine,
    * per-query window) but the scanned payload is quarter-width. Scales
    * cancel in cosine, so no dequantization happens in the hot loop.
    * Zero-norm vectors are filtered (cosine undefined). */
  def quantizedTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
                    vecCol: String, k: Int): DataFrame = {
    def q(df: DataFrame, id: String, out: String) =
      quantizeInt8(df, idCol, vecCol)
        .where(array_max(transform(col("qvec"), x => abs(x))) > 0)
        .select(col(idCol).as(id), col("qvec").as(out))
    val c = q(corpus, "nid", "nv")
    val qs = q(queries, "qid", "qv")
    val scored = c.crossJoin(broadcast(qs))
      .where(col("qid") =!= col("nid"))
      .withColumn("qcos", cosine(col("qv"), col("nv")))
    val w = Window.partitionBy("qid").orderBy(col("qcos").desc, col("nid").asc)
    scored.withColumn("rn", row_number().over(w)).where(col("rn") <= k)
      .select("qid", "nid", "qcos")
  }

  /** Assign every vector to its quantizer cell: (id, raw double vector as
    * `__v`, `cell`). One map pass (unit-normalize + argmax cascade), no
    * shuffle — the shared front half of IVF search, index materialization,
    * and semantic dedup. */
  def assignCells(df: DataFrame, idCol: String, vecCol: String,
                  cents: Seq[Array[Double]]): DataFrame =
    withUnitVec(
      df.select(col(idCol), col(vecCol).cast("array<double>").as("__v")),
      "__v", "__u")
      .withColumn("cell", nearestCentroid(col("__u"), cents))
      .select(col(idCol), col("__v"), col("cell"))

  /** Materialize the corpus as an IVF index: parquet partitioned by cell
    * id, original vectors carried for exact rescoring. Repeated searches
    * against the index read ONLY the probed cells — partition pruning at
    * scan time, the SCALE.md claim this method exists to make real
    * (IvfIndexSpec asserts `PartitionFilters` on the probed read). */
  def writeIvfIndex(corpus: DataFrame, idCol: String, vecCol: String,
                    cents: Seq[Array[Double]], path: String): Unit =
    ivfAssignFrame(corpus, idCol, vecCol, cents)
      .write.partitionBy("cell").mode("overwrite").parquet(path)

  /** Append a shard to a WRITTEN IVF index without touching resident data
    * or retraining: assign the appended vectors to the EXISTING centroids
    * (one map pass — no training scan, the whole point of incremental
    * maintenance) and write them into their cell partitions with dynamic
    * append. Searches keep scan-time partition pruning over the grown
    * index; [[centroidDriftReport]] decides when the appends have moved
    * the distribution enough to earn a full [[writeIvfIndex]] rebuild. */
  def appendToIvfIndex(appended: DataFrame, idCol: String, vecCol: String,
                       cents: Seq[Array[Double]], path: String): Unit =
    ivfAssignFrame(appended, idCol, vecCol, cents)
      .write.partitionBy("cell").mode("append").parquet(path)

  /** The (nid, nvec, cell) assignment frame [[writeIvfIndex]] /
    * [[appendToIvfIndex]] write — fixed-centroid nearest assignment,
    * one map pass. */
  private def ivfAssignFrame(df: DataFrame, idCol: String, vecCol: String,
                             cents: Seq[Array[Double]]): DataFrame =
    withUnitVec(
      df.select(col(idCol).as("nid"),
        col(vecCol).cast("array<double>").as("nvec")), "nvec", "nu")
      .withColumn("cell", nearestCentroid(col("nu"), cents))
      .select("nid", "nvec", "cell")
      // hash-distribute by cell before the partitionBy write (guide §6):
      // assignment stays parallel across the input's partitions, then each
      // cell's rows converge on one task → one file per cell per write,
      // instead of (input tasks × cells) small files
      .repartition(col("cell"))

  /** [[appendToIvfIndex]] with the [[graft.io.EpochLedger]] EXACTLY-ONCE
    * contract — the streaming sink's append: a crash-replayed epoch is
    * either SKIPPED (already landed) or self-healed (its `e<E>-`-prefixed
    * partial leftovers purged, the batch re-staged and re-promoted), so
    * a restart never duplicates vectors in the index. Returns false when
    * the epoch was already landed. */
  def appendToIvfIndexExactlyOnce(appended: DataFrame, idCol: String,
      vecCol: String, cents: Seq[Array[Double]], path: String,
      epoch: Long): Boolean = {
    if (epoch <= graft.io.EpochLedger.lastEpoch(path)) return false
    graft.io.EpochLedger.purge(path, epoch)
    ivfAssignFrame(appended, idCol, vecCol, cents)
      .write.partitionBy("cell").mode("overwrite")
      .parquet(graft.io.EpochLedger.stagingPath(path, epoch))
    graft.io.EpochLedger.promote(path, epoch)
    graft.io.EpochLedger.record(path, epoch)
    true
  }

  /** Compact the small files [[appendToIvfIndex]] accumulates: every
    * dynamic append writes ≥1 new parquet file per touched cell, so daily
    * appends at 100 TB leave thousands of files per cell — scan cost
    * (open/footer per file) grows with APPEND COUNT instead of data size.
    * Cells whose file count exceeds `maxFilesPerCell` are rewritten to one
    * file each: read ONLY the hot cells (partition pruning — cold cells
    * are never touched), repartition by cell so each cell's rows land in
    * one task, write to a sibling temp dir, then swap each compacted cell
    * directory atomically via FS rename. Row content is untouched, so
    * searches return identical results pre/post (IvfAppendSpec pins it)
    * and the probed scan keeps its `PartitionFilters`. Returns the
    * compacted cell ids. */
  def compactIvfIndex(spark: org.apache.spark.sql.SparkSession, path: String,
                      maxFilesPerCell: Int): Seq[Int] =
    graft.io.Compaction.compactPartitionedDirs(spark, path, "cell",
      maxFilesPerCell).map(_.toInt).sorted

  /** RIGHT-TO-BE-FORGOTTEN on the WRITTEN ANN index — at 100 TB a
    * compliance batch includes embeddings, not just documents: targeted
    * delete of vector ids from the cell=-partitioned index via
    * [[graft.io.Deletes]] on the index layout. Only the files of cells
    * holding a deleted vector are rewritten (delete cost scales with
    * affected files, not index size — the cell clustering that makes
    * probes cheap makes deletes cheap too); every other cell file stays
    * byte-identical, so partition pruning and resident search behavior
    * are untouched. Searches afterwards equal a fresh index built
    * without the deleted ids: assignment is per-vector (dropping rows
    * changes no other row's cell or vector) and scoring is exact within
    * probed cells (IvfIndexSpec pins the equivalence). */
  def deleteFromIvfIndex(spark: org.apache.spark.sql.SparkSession,
                         indexPath: String,
                         ids: Seq[Any]): graft.io.Deletes.DeleteReport =
    graft.io.Deletes.deleteKeys(spark, indexPath, "nid", ids)

  // --- VERSIONED IVF index: the table-format composition ---
  //
  // [[writeIvfIndex]]'s cell= layout swaps directories for maintenance;
  // the versioned form commits the same (nid, nvec, cell) assignment as a
  // [[graft.io.Versioned]] manifest whose file-grain entries carry the
  // cell value, so probes prune FILES from a PINNED manifest (no
  // directory listing), appends/compactions/deletes are snapshot-isolated
  // commits, and a compliance delete becomes an AUDITABLE version: a
  // review can re-run the pre-delete search at its pinned version and see
  // exactly what was returned before the ids were forgotten, while every
  // post-delete search resolves the new manifest (q244 pins both against
  // the oracle). `vacuum` is the point where the forgotten vectors
  // physically leave disk — retention policy decides how long the audit
  // window stays open.

  /** Commit the corpus as a versioned IVF index (assignment identical to
    * [[writeIvfIndex]]). Later calls append — the incremental-maintenance
    * contract of [[appendToIvfIndex]], as commits. Returns the version. */
  def writeIvfIndexVersioned(corpus: DataFrame, idCol: String,
                             vecCol: String, cents: Seq[Array[Double]],
                             table: String,
                             tag: Option[String] = None): Int =
    graft.io.Versioned.commitPartitioned(
      withUnitVec(
        corpus.select(col(idCol).as("nid"),
          col(vecCol).cast("array<double>").as("nvec")), "nvec", "nu")
        .withColumn("cell", nearestCentroid(col("nu"), cents))
        .select("nid", "nvec", "cell")
        // one task per cell before the partitioned commit — see
        // ivfAssignFrame (guide §6 hash distribution)
        .repartition(col("cell")),
      table, "cell", tag = tag)

  /** RIGHT-TO-BE-FORGOTTEN as a COMMIT: only the files of cells holding a
    * deleted id are rewritten (file-targeted, metadata preserved so probe
    * pruning survives), the manifest swaps them atomically, and the
    * pre-delete version stays readable until [[graft.io.Versioned.vacuum]]
    * — the audit-trail shape compliance reviews ask for. Returns the new
    * version. */
  def deleteFromIvfIndexVersioned(spark: org.apache.spark.sql.SparkSession,
                                  table: String, ids: Seq[Any]): Int =
    graft.io.Versioned.deleteWhere(spark, table, col("nid").isin(ids: _*),
      sortCols = Seq("nid"))

  /** [[ivfTopKFromIndex]] over the versioned index as of `version`
    * (latest by default): the probed cell set prunes the pinned
    * manifest's FILES, scoring is the identical exact-cosine top-k. */
  def ivfTopKFromIndexVersioned(spark: org.apache.spark.sql.SparkSession,
                                table: String, queries: DataFrame,
                                idCol: String, vecCol: String,
                                cents: Seq[Array[Double]], nProbe: Int,
                                k: Int,
                                version: Int = Int.MaxValue): DataFrame = {
    val nq = queries.count()
    require(nq <= maxQueryBatch,
      s"ivfTopKFromIndexVersioned is for query BATCHES (≤ $maxQueryBatch " +
        s"rows, got $nq); use ivfTopK for corpus-scale query sides")
    val q = withUnitVec(
      queries.select(col(idCol).as("qid"),
        col(vecCol).cast("array<double>").as("qvec")), "qvec", "qu")
      .withColumn("cell",
        explode(nearestCentroids(col("qu"), cents, nProbe)))
      .select("qid", "qvec", "cell")
      .persist()
    val cells = q.select("cell").distinct().collect().map(_.getInt(0)).toSeq
    val c = graft.io.Versioned.snapshotWhere(spark, table, "cell",
        cells.map(_.toString).toSet, version)
      .where(col("cell").isin(cells: _*))
    val scored = c.join(broadcast(q), Seq("cell"))
      .where(col("qid") =!= col("nid"))
      .withColumn("cos", cosine(col("qvec"), col("nvec")))
    val w = Window.partitionBy("qid").orderBy(col("cos").desc, col("nid").asc)
    scored.withColumn("rn", row_number().over(w)).where(col("rn") <= k)
      .select("qid", "nid", "cos")
  }

  /** Search a written IVF index for one QUERY BATCH: the probed cell set
    * (≤ nQueries × nProbe ids, deduplicated — config-sized for a batch)
    * becomes a static partition filter, so the scan never lists or reads
    * unprobed cells. Scoring is identical to `ivfTopK`, which IvfIndexSpec
    * pins.
    *
    * Contract: `queries` is a batch (up to ~10⁵ rows), NOT the corpus —
    * the probed cell set and the broadcast query frame are driver/executor
    * resident. `maxQueryBatch` enforces this so a corpus-as-queries call
    * fails fast instead of OOMing; for corpus×corpus workloads use
    * `ivfTopK` (cell equi-join, nothing collected) or
    * `Dedup.embeddingNearDups`. */
  val maxQueryBatch = 100000
  def ivfTopKFromIndex(spark: org.apache.spark.sql.SparkSession, indexPath: String,
                       queries: DataFrame, idCol: String, vecCol: String,
                       cents: Seq[Array[Double]], nProbe: Int, k: Int): DataFrame = {
    val nq = queries.count()
    require(nq <= maxQueryBatch,
      s"ivfTopKFromIndex is for query BATCHES (≤ $maxQueryBatch rows, got $nq); " +
        "use ivfTopK for corpus-scale query sides")
    val q = withUnitVec(
      queries.select(col(idCol).as("qid"),
        col(vecCol).cast("array<double>").as("qvec")), "qvec", "qu")
      .withColumn("cell",
        explode(nearestCentroids(col("qu"), cents, nProbe)))
      .select("qid", "qvec", "cell")
      .persist()
    // config-sized: nQueries × nProbe cell ids
    val cells = q.select("cell").distinct().collect().map(_.getInt(0)).toSeq
    val c = spark.read.parquet(indexPath)
      .where(col("cell").isin(cells: _*))
    val scored = c.join(broadcast(q), Seq("cell"))
      .where(col("qid") =!= col("nid"))
      .withColumn("cos", cosine(col("qvec"), col("nvec")))
    val w = Window.partitionBy("qid").orderBy(col("cos").desc, col("nid").asc)
    scored.withColumn("rn", row_number().over(w)).where(col("rn") <= k)
      .select("qid", "nid", "cos")
    // q stays cached until the session's query-scoped clearCache — an
    // eager unpersist here would force the probe subtree to recompute
    // inside the search job (the round-2 unpersist lesson)
  }

  /** IVF ANN: corpus vectors live in Voronoi cells of the trained coarse
    * quantizer (one cell each, assigned in a single map pass); each query
    * probes its `nProbe` nearest cells, so scoring touches ~nProbe/nLists
    * of the corpus instead of all of it. Candidate generation is an
    * equi-join on the cell id against the broadcast exploded query probes.
    * Exact within probed cells: recall loss comes only from a true
    * neighbour living in an unprobed cell — the (nLists, nProbe) dial.
    * At 100 TB: assignment is map-only (no shuffle of the corpus), the
    * candidate join keys on cell, and writing the corpus partitioned by
    * cell makes repeated searches prune to probed cells at scan time. */
  def ivfTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
              vecCol: String, cents: Seq[Array[Double]], nProbe: Int,
              k: Int): DataFrame = {
    val c = withUnitVec(
      corpus.select(col(idCol).as("nid"),
        col(vecCol).cast("array<double>").as("nvec")), "nvec", "nu")
      .withColumn("cell", nearestCentroid(col("nu"), cents))
      .select("nid", "nvec", "cell")
    val q = withUnitVec(
      queries.select(col(idCol).as("qid"),
        col(vecCol).cast("array<double>").as("qvec")), "qvec", "qu")
      .withColumn("cell",
        explode(nearestCentroids(col("qu"), cents, nProbe)))
      .select("qid", "qvec", "cell")
    val scored = c.join(broadcast(q), Seq("cell"))
      .where(col("qid") =!= col("nid"))
      .withColumn("cos", cosine(col("qvec"), col("nvec")))
    val w = Window.partitionBy("qid").orderBy(col("cos").desc, col("nid").asc)
    scored.withColumn("rn", row_number().over(w)).where(col("rn") <= k)
      .select("qid", "nid", "cos")
  }

  // --- Product quantization (Jégou, Douze, Schmid: "Product Quantization
  // for Nearest Neighbor Search", TPAMI 2011) ---

  /** Per-subspace argmin code under squared-L2, ties to the lowest code
    * id — the size-independent loop ([[graft.functions.catalyst.NearestCodeL2]]),
    * replacing the per-code `array_min(struct(l2_sq, code))` cascade that
    * unrolled nSub × nCodes expressions (the same compile ceiling the
    * centroid cascade had — production PQ wants nCodes = 256). Distance
    * fold order and tie-breaks are identical, so q119/q140 oracle hashes
    * are unchanged. */
  private def pqNearestCode(x: Column, codes: Seq[Array[Double]]): Column =
    graft.functions.catalyst.CentroidExpressions.nearestCodeL2(x, codes)

  /** Deterministic PQ codebook training: split each UNIT vector into
    * `nSub` contiguous `dims/nSub`-dim subvectors and run plain-L2 Lloyd
    * independently per subspace (init = the `nCodes` lowest-id vectors'
    * subranges; update = decimal-exact mean of 6dp-quantized coordinates;
    * empty cells keep their centroid — the [[trainCentroids]] determinism
    * rules, minus the spherical normalization, which PQ does not use).
    * All subspaces train in the SAME distributed pass per iteration: one
    * map-side assignment, one (s, code, pos)-grain aggregate, and only the
    * nSub×nCodes×subDim model (config-sized) reaches the driver.
    * Returns books(s)(code) = centroid. */
  def trainPqCodebooks(corpus: DataFrame, idCol: String, vecCol: String,
                       dims: Int, nSub: Int, nCodes: Int, iters: Int = 2,
                       quantize: Int = 6): Seq[Seq[Array[Double]]] = {
    import org.apache.spark.sql.types.DecimalType
    require(dims % nSub == 0, s"dims $dims not divisible by nSub $nSub")
    val subDim = dims / nSub
    val vecs = withUnitVec(
      corpus.select(col(idCol).as("id"),
        col(vecCol).cast("array<double>").as("v")), "v", "u")
      .select(col("id"), col("u"))
    // persisted across the loop for the same reason as trainCentroids:
    // each iteration otherwise re-runs scan + normalize + subvector split
    val sv = vecs
      .select(col("id"), explode(sequence(lit(0), lit(nSub - 1))).as("s"), col("u"))
      .withColumn("x", expr(s"slice(u, s * $subDim + 1, $subDim)"))
      .select("id", "s", "x")
      .persist()
    var books: Seq[Seq[Array[Double]]] = {
      val firsts = vecs.orderBy("id").limit(nCodes).select("u").collect()
        .map(_.getSeq[Double](0).toArray)
      (0 until nSub).map(s =>
        firsts.toSeq.map(_.slice(s * subDim, s * subDim + subDim)))
    }
    for (_ <- 0 until iters) {
      val assign = books.zipWithIndex.foldRight(lit(-1): Column) {
        case ((codes, si), acc) =>
          when(col("s") === si, pqNearestCode(col("x"), codes)).otherwise(acc)
      }
      val sums = sv.withColumn("code", assign)
        .select(col("s"), col("code"), posexplode(col("x")).as(Seq("pos", "xi")))
        .groupBy("s", "code", "pos")
        .agg(sum(graft.queries.Qutil.dround(col("xi"), quantize)
          .cast(DecimalType(38, quantize + 2))).cast("double").as("sx"),
          count(lit(1)).as("n"))
        .collect()
      val byKey = sums.groupBy(r => (r.getAs[Int]("s"), r.getAs[Int]("code")))
      books = books.zipWithIndex.map { case (codes, s) =>
        codes.zipWithIndex.map { case (old, code) =>
          byKey.get((s, code)).fold(old) { rows =>
            val c = old.clone()
            rows.foreach { r =>
              c(r.getAs[Int]("pos")) = r.getAs[Double]("sx") / r.getAs[Long]("n")
            }
            c
          }
        }
      }
    }
    sv.unpersist(blocking = false)
    books
  }

  /** PQ-compressed ANN with asymmetric distance computation (ADC): the
    * corpus is stored as `nSub` small code ids per vector (the compressed
    * tier — nSub bytes instead of dims×4/8), queries stay full-precision,
    * and each query precomputes a (subspace × code) table of 6dp-rounded
    * partial dot products ONCE; scoring a corpus row is then `nSub` array
    * lookups + a fixed-order fold — no per-pair vector math at all.
    *
    * Scale shape: encoding is map-only against broadcast codebook
    * literals; the scored cross join streams the CODES table (the point:
    * at 100 TB the float vectors never leave the encode pass, repeated
    * searches read only codes), query tables are config-sized
    * (nQueries × nSub × nCodes doubles) and ride the broadcast; top-k is
    * the bounded-heap [[graft.plans.TopK.topKPerGroup]]. Every step —
    * training, assignment (fused-L2 argmin, code-id ties), table rounding,
    * s-ascending ADC fold — is bit-deterministic, so the q119 oracle
    * replays the whole pipeline in SQL. */
  def pqTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
             vecCol: String, dims: Int, nSub: Int, nCodes: Int,
             iters: Int, k: Int): DataFrame = {
    val books = trainPqCodebooks(corpus, idCol, vecCol, dims, nSub, nCodes, iters)
    val subDim = dims / nSub
    val c = withUnitVec(
      corpus.select(col(idCol).as("nid"),
        col(vecCol).cast("array<double>").as("nvec")), "nvec", "nu")
      .withColumn("codes", array((0 until nSub).map { s =>
        pqNearestCode(expr(s"slice(nu, ${s * subDim + 1}, $subDim)"), books(s))
      }: _*))
      .select("nid", "codes")
    val q = withUnitVec(
      queries.select(col(idCol).as("qid"),
        col(vecCol).cast("array<double>").as("qvec")), "qvec", "qu")
      .withColumn("dt", array((0 until nSub).map { s =>
        val qsub = expr(s"slice(qu, ${s * subDim + 1}, $subDim)")
        array(books(s).map(cb =>
          graft.queries.Qutil.dround(dot(qsub, typedlit(cb.toSeq)), 6)): _*)
      }: _*))
      .select("qid", "dt")
    val scored = c.crossJoin(broadcast(q))
      .where(col("qid") =!= col("nid"))
      .withColumn("adc", expr(
        s"""aggregate(sequence(0, ${nSub - 1}), CAST(0 AS DOUBLE),
           |(acc, s) -> acc + element_at(element_at(dt, s + 1),
           |                             element_at(codes, s + 1) + 1))""".stripMargin))
      .select("qid", "nid", "adc")
    graft.plans.TopK.topKPerGroup(scored, Seq("qid"),
      Seq("adc" -> true, "nid" -> false), k)
  }

  /** IVF + PQ composed — the realistic billion-vector index (FAISS
    * IVFPQ's shape): a coarse quantizer routes each vector to a cell
    * ([[ivfTopK]]'s recall dial) and the stored representation inside
    * every cell is nSub code bytes ([[pqTopK]]'s storage tier), so search
    * touches ~nProbe/nLists of the corpus AND reads only codes — at
    * 100 TB the float vectors exist solely in the (map-only) encode pass,
    * and a cell-partitioned codes table turns probing into scan-time
    * partition pruning exactly as in [[writeIvfIndex]]. Scoring is the
    * ADC fold against broadcast per-query tables; candidates come from
    * the cell equi-join, each (query, neighbour) pair at most once (a
    * corpus row lives in ONE cell). Recall dials: (nLists, nProbe) for
    * routing loss, (nSub, nCodes) for quantization loss — independent,
    * which is the point of the composition. Every step inherits the
    * bit-determinism of its parts, so the q140 oracle replays BOTH
    * training loops and the composed search in SQL. */
  def ivfPqTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
                vecCol: String, cents: Seq[Array[Double]], nProbe: Int,
                dims: Int, nSub: Int, nCodes: Int, iters: Int,
                k: Int): DataFrame = {
    val books = trainPqCodebooks(corpus, idCol, vecCol, dims, nSub, nCodes, iters)
    val subDim = dims / nSub
    val c = withUnitVec(
      corpus.select(col(idCol).as("nid"),
        col(vecCol).cast("array<double>").as("nvec")), "nvec", "nu")
      .withColumn("cell", nearestCentroid(col("nu"), cents))
      .withColumn("codes", array((0 until nSub).map { s =>
        pqNearestCode(expr(s"slice(nu, ${s * subDim + 1}, $subDim)"), books(s))
      }: _*))
      .select("nid", "cell", "codes")
    val q = withUnitVec(
      queries.select(col(idCol).as("qid"),
        col(vecCol).cast("array<double>").as("qvec")), "qvec", "qu")
      .withColumn("dt", array((0 until nSub).map { s =>
        val qsub = expr(s"slice(qu, ${s * subDim + 1}, $subDim)")
        array(books(s).map(cb =>
          graft.queries.Qutil.dround(dot(qsub, typedlit(cb.toSeq)), 6)): _*)
      }: _*))
      .withColumn("cell", explode(nearestCentroids(col("qu"), cents, nProbe)))
      .select("qid", "cell", "dt")
    val scored = c.join(broadcast(q), Seq("cell"))
      .where(col("qid") =!= col("nid"))
      .withColumn("adc", expr(
        s"""aggregate(sequence(0, ${nSub - 1}), CAST(0 AS DOUBLE),
           |(acc, s) -> acc + element_at(element_at(dt, s + 1),
           |                             element_at(codes, s + 1) + 1))""".stripMargin))
      .select("qid", "nid", "adc")
    graft.plans.TopK.topKPerGroup(scored, Seq("qid"),
      Seq("adc" -> true, "nid" -> false), k)
  }

  /** Exact-cosine RERANK of coarse ANN candidates — the second stage of
    * the production two-stage retrieval shape (coarse quantized recall →
    * exact precision; FAISS's `IndexRefineFlat` role). The coarse stage
    * (IVF/PQ/LSH) over-fetches `rerankDepth` candidates per query from
    * compressed storage; this stage re-scores ONLY those candidates with
    * the exact cosine over the full float vectors and keeps the true
    * top-k, repairing quantization-induced rank inversions without ever
    * touching the rest of the corpus.
    *
    * Scale shape: `candidates` is id-only and query-batch-bounded
    * (nQueries × rerankDepth — config-sized, broadcast), so the full
    * vectors are fetched by ONE equi-join against the corpus (the corpus
    * never reshuffles and only candidate rows' vectors travel — the
    * engine-wide id-only candidate rule) and the query vectors arrive by
    * broadcast. At 100 TB the corpus side is a pruned point-lookup scan;
    * nothing quadratic, nothing collected. Scoring is the same fused
    * [[cosine]] expression as [[bruteForceTopK]] with the same
    * (cos desc, nid) tie-break, so a rerank over the FULL corpus as its
    * candidate set degenerates to exactly `bruteForceTopK`.
    *
    * Contract (the [[maxQueryBatch]] discipline): `queries` is a BATCH
    * and `candidates` its id-only over-fetch — both are broadcast, so a
    * corpus-scale frame on either input would OOM executors instead of
    * failing with a contract error. The query side is counted directly
    * (a cheap input scan); the candidate side is pinned-persisted FIRST
    * and counted from the cache, so the fail-fast never recomputes the
    * caller's coarse stage and the scoring join reuses the same cached
    * id pairs. */
  val maxRerankCandidates = 10000000 // ≈160 MB of id pairs broadcast
  def rerankExact(candidates: DataFrame, corpus: DataFrame,
                  queries: DataFrame, idCol: String, vecCol: String,
                  k: Int): DataFrame = {
    val nq = queries.count()
    require(nq <= maxQueryBatch,
      s"rerankExact is for query BATCHES (≤ $maxQueryBatch rows, got $nq); " +
        "for corpus-scale query sides use ivfTopK/bruteForceTopK")
    val cand = graft.PinnedFrames.pin(
      candidates.select("qid", "nid").persist())
    val nc = cand.count()
    require(nc <= maxRerankCandidates,
      s"rerankExact candidates must be a query-batch over-fetch " +
        s"(≤ $maxRerankCandidates id pairs, got $nc) — a corpus-scale " +
        "candidate set belongs in ivfTopK's cell join, not a broadcast")
    val c = corpus.select(col(idCol).as("nid"),
      col(vecCol).cast("array<double>").as("nvec"))
    val q = queries.select(col(idCol).as("qid"),
      col(vecCol).cast("array<double>").as("qvec"))
    val scored = c
      .join(broadcast(cand), Seq("nid"))
      .join(broadcast(q), Seq("qid"))
      .withColumn("cos", cosine(col("qvec"), col("nvec")))
      .select("qid", "nid", "cos")
    graft.plans.TopK.topKPerGroup(scored, Seq("qid"),
      Seq("cos" -> true, "nid" -> false), k)
  }

  /** Turn the rerank-depth TUNING report (q231's (depth, recall) rows —
    * recall@k of two-stage retrieval as a function of the coarse
    * over-fetch depth) into the production dial it measures: the MINIMAL
    * depth whose measured recall meets `targetRecall`. Depths are
    * scanned ascending; when no measured depth meets the target the
    * deepest one is returned (the report's ceiling — the caller decides
    * whether to re-run the report deeper or accept the best available).
    * Driver-side over a config-sized report: the report is the control
    * input to the retrieval pipeline, not a dashboard. */
  def chooseRerankDepth(report: Seq[(Int, Double)],
                        targetRecall: Double): Int = {
    require(report.nonEmpty, "empty tuning report")
    val sorted = report.sortBy(_._1)
    sorted.find(_._2 >= targetRecall).map(_._1).getOrElse(sorted.last._1)
  }

  /** Overload over the report FRAME (q231's output schema:
    * depth, n_hits, recall). Config-sized collect — one row per
    * measured depth. */
  def chooseRerankDepth(report: DataFrame, targetRecall: Double): Int =
    chooseRerankDepth(
      report.select(col("depth").cast("int"), col("recall").cast("double"))
        .collect().map(r => (r.getInt(0), r.getDouble(1))).toSeq,
      targetRecall)

  /** Centroid-drift report — the rebuild gate for APPEND-ONLY IVF index
    * maintenance. A 100 TB corpus takes daily appends, and re-running
    * Lloyd over the full corpus per append is the real-world cost cliff;
    * the cheap alternative is assigning appended vectors to the EXISTING
    * centroids ([[assignCells]] — map-only, argmax against broadcast
    * literals, no training scan) and REBUILDING only when the data has
    * actually moved. This report is the "has it moved" measurement: per
    * occupied cell, the base/appended member counts and the L2 distance
    * between the cell's CURRENT member mean (unit vectors, base+appended)
    * and the trained centroid. Fresh training leaves shift ≈ the Lloyd
    * convergence residual; an appended distribution the quantizer has
    * never seen inflates its nearest cell's count and drags that cell's
    * mean away from the centroid — the caller gates rebuild on
    * max(shift) or on per-cell (n_new, shift) policy.
    *
    * Determinism (the classSeparationReport discipline): unit coordinates
    * are 6dp-quantized before the DECIMAL mean; squared component
    * deltas are 12dp-rounded before the DECIMAL sum — order-independent,
    * so the q221 oracle replays training + assignment + the report
    * bit-for-bit. Scale shape: one map pass to assign (no shuffle of the
    * corpus), one (cell, pos) aggregate (nLists×dims grain — config-
    * sized), one cell-grain aggregate; the centroid lookup is a literal
    * array. Returns (cell, n_base, n_new, shift). */
  def centroidDriftReport(base: DataFrame, appended: DataFrame,
                          idCol: String, vecCol: String,
                          cents: Seq[Array[Double]]): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    import graft.queries.Qutil.dround
    val tagged = base.select(col(idCol),
        col(vecCol).cast("array<double>").as("__v"), lit(0).as("__new"))
      .unionByName(appended.select(col(idCol),
        col(vecCol).cast("array<double>").as("__v"), lit(1).as("__new")))
    // persisted: the assigned frame feeds the counts aggregate AND the
    // means/shift aggregate — uncached, the unit-normalize + argmax
    // assignment pipeline runs once per consumer (measured 15.4 s → 6.7 s
    // at sf10). Caller-released (PinnedFrames).
    val assigned = graft.PinnedFrames.pin(withUnitVec(tagged, "__v", "__u")
      .withColumn("cell", nearestCentroid(col("__u"), cents))
      .persist())
    val counts = assigned.groupBy("cell").agg(
      sum(when(col("__new") === 0, 1L).otherwise(0L)).as("n_base"),
      sum(when(col("__new") === 1, 1L).otherwise(0L)).as("n_new"))
    val means = assigned
      .select(col("cell"), posexplode(col("__u")).as(Seq("pos", "x")))
      .groupBy("cell", "pos")
      .agg((sum(dround(col("x"), 6).cast(DecimalType(38, 8))).cast("double") /
        count(lit(1))).as("m"))
    val centArr = graft.functions.catalyst.CentroidExpressions.matrixLit(cents)
    val shift = means
      .withColumn("c", element_at(element_at(centArr, col("cell") + 1),
        col("pos") + 1))
      .withColumn("sq", dround((col("m") - col("c")) * (col("m") - col("c")), 12))
      .groupBy("cell")
      .agg(sqrt(sum(col("sq").cast(DecimalType(38, 14))).cast("double"))
        .as("__sh"))
    counts.join(shift, Seq("cell"))
      .select(col("cell"), col("n_base"), col("n_new"),
        dround(col("__sh"), 6).as("shift"))
  }

  /** Embedding-space QA report: per label, member count, COHESION (mean L2
    * distance of members to their label centroid) and SEPARATION (min L2
    * distance from this centroid to any other label's centroid). The
    * embedding-quality dashboard row: collapsing cohesion or shrinking
    * separation flags drifted encoders or mislabeled slices before any
    * model consumes the vectors.
    *
    * Scale + determinism shape: one posexplode pass to the (label, pos)
    * grain; centroids are a labels×dims config-sized frame (broadcast into
    * the member-distance join — the corpus-sized side never reshuffles);
    * the centroid-pair space is labels² — driver-free but trivially
    * small. All cross-dimension sums follow the trainCentroids discipline
    * (quantize to a decimal grid, decimal-sum — order-independent, so
    * DuckDB replays them bit-for-bit). */
  def classSeparationReport(df: DataFrame, idCol: String, vecCol: String,
                            labelCol: String): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    import graft.queries.Qutil.dround
    val e = df.select(col(labelCol).as("label"), col(idCol).as("id"),
        posexplode(col(vecCol).cast("array<double>")).as(Seq("pos", "x")))
      .withColumn("xq", dround(col("x"), 6))
    val cent = e.groupBy("label", "pos")
      .agg((sum(col("xq").cast(DecimalType(38, 8))).cast("double") /
        count(lit(1))).as("c"))
    val member = e
      .join(broadcast(cent), Seq("label", "pos"))
      .withColumn("sq",
        dround((col("xq") - col("c")) * (col("xq") - col("c")), 12))
      .groupBy("label", "id")
      .agg(sqrt(sum(col("sq").cast(DecimalType(38, 14))).cast("double"))
        .as("dist"))
    val coh = member.groupBy("label")
      .agg(count(lit(1)).as("n"),
        dround(sum(dround(col("dist"), 6).cast(DecimalType(38, 8)))
          .cast("double") / count(lit(1)), 6).as("cohesion"))
    val pd = cent.as("a")
      .join(cent.as("b"),
        col("a.pos") === col("b.pos") && col("a.label") =!= col("b.label"))
      .withColumn("sq",
        dround((col("a.c") - col("b.c")) * (col("a.c") - col("b.c")), 12))
      .groupBy(col("a.label").as("label"), col("b.label").as("lb"))
      .agg(sqrt(sum(col("sq").cast(DecimalType(38, 14))).cast("double"))
        .as("d"))
    val sep = pd.groupBy("label").agg(dround(min(col("d")), 6).as("separation"))
    coh.join(sep, Seq("label"))
  }

  /** Margin-based parallel-pair mining (Artetxe & Schwenk, "Margin-based
    * Parallel Corpus Mining in Low-Resource Conditions" / LASER bitext
    * mining, ACL'19): align two embedding collections (source/target
    * language sentences, caption/image embeddings, question/answer pools)
    * by scoring each cross-side candidate (x, y) with
    *
    *   margin(x, y) = cos(x, y) / (0.5 · (avgᵏ(x) + avgᵏ(y)))
    *
    * where avgᵏ(s) is the mean cosine of s's k best RETRIEVED neighbours
    * on the other side, and keeping MUTUAL best matches above `minMargin`.
    * The normalization kills hubness — a vector close to everything has a
    * large denominator, so only pairs close FOR EACH OTHER survive; raw
    * cosine thresholds mine hubs, margins mine translations.
    *
    * Candidates: exact mode (`lsh = None`) scores the full src×tgt cross
    * product — the oracle/rerank baseline, deliberately quadratic. LSH
    * mode (`lsh = Some((dims, nPlanes, nTables))`) bands BOTH sides with
    * the shared deterministic hyperplanes (one banding pass over the
    * union, `maxBucketSize` hot-bucket cap, same construction as
    * embeddingNearDups) and scores only co-bucketed cross-side pairs —
    * the 100 TB path, where the margin denominator is the k-NN average
    * over the retrieved candidate set (the standard practice: mining
    * normalizes over what retrieval returned).
    *
    * Determinism discipline: cosines are the fused fold (bit-equal to the
    * oracle's list_reduce), quantized to the 6dp grid BEFORE the k-NN
    * averaging, whose sum runs in DECIMAL (order-independent) and divides
    * as double — so margins are identical doubles in any engine and the
    * mutual-best row_numbers (ties broken by id) replay exactly.
    *
    * Returns (src_id, tgt_id, cos, margin), margin 6dp, one row per
    * mutual-best pair with margin ≥ minMargin. */
  def marginMine(src: DataFrame, tgt: DataFrame, idCol: String,
                 vecCol: String, k: Int, minMargin: Double,
                 lsh: Option[(Int, Int, Int)] = None,
                 maxBucketSize: Option[Int] = None): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val dround = graft.queries.Qutil.dround _
    val s = src.select(col(idCol).as("src_id"),
      col(vecCol).cast("array<double>").as("__vs"))
    val t = tgt.select(col(idCol).as("tgt_id"),
      col(vecCol).cast("array<double>").as("__vt"))
    val cand = lsh match {
      case None => s.crossJoin(t)
      case Some((dims, nPlanes, nTables)) =>
        // band the UNION once (one hyperplane pass, one cap), split sides
        // at the join — the embeddingNearDups shape with a side tag. The
        // vector payload is DROPPED after the bucket computation: the
        // bucket join and the dedup-distinct then shuffle 24-byte id rows
        // instead of 0.5 KB embeddings, and the pair frame re-attaches
        // vectors with two joins against the (much smaller) side tables —
        // measured 1.8× at 100× data vs carrying payloads through the
        // distinct (83 s → 47 s on the SQL twin, which always had this
        // shape)
        val tagged = s.select(col("src_id").as("__id"), col("__vs").as("__v"),
            lit(0).as("__side"))
          .unionByName(t.select(col("tgt_id").as("__id"),
            col("__vt").as("__v"), lit(1).as("__side")))
        val tb = (0 until nTables).map { tt =>
          struct(lit(tt).as("table"),
            hyperplaneSig(col("__v"), dims, nPlanes, tt).as("bucket"))
        }
        val banded = graft.PinnedFrames.pin(
          tagged.withColumn("tb", explode(array(tb: _*)))
            .select(col("__id"), col("__side"),
              col("tb.table").as("table"), col("tb.bucket").as("bucket"))
            .persist())
        val capped = maxBucketSize.fold(banded)(
          Dedup.capHotBuckets(banded, Seq("table", "bucket"), _, "marginMine"))
        val pairIds = capped.where(col("__side") === 0).as("x")
          .join(capped.where(col("__side") === 1).as("y"),
            col("x.table") === col("y.table") &&
              col("x.bucket") === col("y.bucket"))
          .select(col("x.__id").as("src_id"), col("y.__id").as("tgt_id"))
          .distinct()
        pairIds.join(s, "src_id").join(t, "tgt_id")
    }
    val dec = DecimalType(18, 6)
    // cos > 0 keeps the margin well-defined: a NEGATIVE k-NN average flips
    // the ratio's sign and promotes dissimilar pairs (margins only rank
    // meaningfully over positive similarities — anti-aligned vectors are
    // not candidate translations in the first place)
    val scored = cand
      .withColumn("cos", dround(graft.functions.catalyst.VectorExpressions
        .cosineSim(col("__vs"), col("__vt")), 6))
      .where(col("cos") > 0)
      .select("src_id", "tgt_id", "cos")
    // k-NN averages per side as WINDOW aggregates over one pass of the
    // pair frame — decimal sums of the 6dp-quantized cosines / count,
    // order-independent and engine-exact. The aggregate-join formulation
    // (groupBy per side + join back) consumed the frame three times and
    // measured 2× slower at 100× data; windows re-sort the same stream
    // per side instead (same rewrite as the SQL TVF body — the two
    // surfaces stay algorithm-identical, SurfaceEquivalenceSpec pins the
    // results equal)
    import org.apache.spark.sql.expressions.Window
    val rns = row_number().over(Window.partitionBy("src_id")
      .orderBy(col("cos").desc, col("tgt_id").asc))
    val rnt = row_number().over(Window.partitionBy("tgt_id")
      .orderBy(col("cos").desc, col("src_id").asc))
    val ranked = scored.withColumn("__rns", rns).withColumn("__rnt", rnt)
    val wsA = Window.partitionBy("src_id")
    val wtA = Window.partitionBy("tgt_id")
    def avgTopK(rn: Column, w: org.apache.spark.sql.expressions.WindowSpec) =
      sum(when(rn <= k, col("cos").cast(dec))).over(w).cast("double") /
        sum(when(rn <= k, 1L).otherwise(0L)).over(w).cast("double")
    val withAvgs = ranked
      .withColumn("__av_s", avgTopK(col("__rns"), wsA))
      .withColumn("__av_t", avgTopK(col("__rnt"), wtA))
      .withColumn("margin",
        col("cos") / (lit(0.5) * (col("__av_s") + col("__av_t"))))
    val ws = org.apache.spark.sql.expressions.Window
      .partitionBy("src_id").orderBy(col("margin").desc, col("tgt_id").asc)
    val wt = org.apache.spark.sql.expressions.Window
      .partitionBy("tgt_id").orderBy(col("margin").desc, col("src_id").asc)
    withAvgs
      .withColumn("__rs", row_number().over(ws))
      .withColumn("__rt", row_number().over(wt))
      .where(col("__rs") === 1 && col("__rt") === 1 &&
        col("margin") >= minMargin)
      .select(col("src_id"), col("tgt_id"), col("cos"),
        dround(col("margin"), 6).as("margin"))
  }
}
