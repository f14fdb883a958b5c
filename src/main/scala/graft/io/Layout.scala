package graft.io

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multi-dimensional data layout: Morton (Z-order) clustering for
  * scan-time pruning of MULTI-column range predicates — the lake-layout
  * counterpart of the single-column partition pruning Tables/Writers
  * already exercise. A table range-partitioned on one key prunes on that
  * key only; interleaving the bits of m keys into one z-value and
  * laying files out by z-ranges makes a box predicate on ANY subset of
  * the keys touch only the z-buckets whose dyadic rectangle intersects
  * the box. At 100 TB this is the difference between "scan everything
  * unless you filtered on the partition column" and "every multi-key
  * slice dashboards ask for prunes to a few percent of files" — the
  * same idea Delta/Iceberg OPTIMIZE ZORDER ships, expressed here with
  * plain parquet + directory partitioning so partition pruning (visible
  * as PartitionFilters in the plan) does the skipping.
  *
  * Everything is deterministic integer bit arithmetic (no sampling, no
  * RNG), so the z-value column replays bit-for-bit in the DuckDB oracle
  * (q230) and the bucket math is unit-checked exhaustively (LayoutSpec).
  */
object Layout {

  /** Morton z-value over `cols` (non-negative integral columns, each
    * using its low `bits` bits): bit j of the result is bit (j div m) of
    * dimension (j mod m), built as an UNROLLED bitwise-OR of shift/mask
    * terms — `Writers.zOrderValue` generalized to m dimensions. Unrolling
    * is the right call here, unlike the centroid cascade the
    * CentroidExpressions loop replaced: the term count is bits×m, which
    * the long-width contract caps at 62 FOREVER (there is no scale knob
    * that grows it), and plain shift/mask arithmetic stays inside
    * whole-stage codegen, whereas a higher-order `aggregate` loop is
    * CodegenFallback — interpreted per row on the table-rewrite hot path.
    * Caller contract: every value fits in `bits` bits;
    * [[writeZClustered]] verifies that before writing, because a value
    * with dropped high bits would land in the wrong bucket and break
    * pruning soundness silently. */
  def withZValue(df: DataFrame, cols: Seq[String], bits: Int,
                 out: String = "zv"): DataFrame = {
    val m = cols.size
    require(m >= 2, "z-ordering needs at least 2 dimensions")
    require(bits >= 1 && bits * m <= 62, s"bits=$bits × $m dims must fit a long")
    val longs = cols.map(c => col(c).cast("long"))
    val z = (0 until bits * m).map { j =>
      shiftleft(shiftright(longs(j % m), j / m).bitwiseAND(1L), j)
    }.reduce(_.bitwiseOR(_))
    df.withColumn(out, z)
  }

  /** Driver-side Scala reference of the same interleave (config-sized
    * inputs only — bucket math and tests). */
  def zValueOf(coords: Seq[Long], bits: Int): Long = {
    val m = coords.size
    var z = 0L
    var j = 0
    while (j < bits * m) {
      z |= ((coords(j % m) >> (j / m)) & 1L) << j
      j += 1
    }
    z
  }

  /** Write `df` clustered by the z-value of `cols`, partitioned into
    * 2^bucketBits z-bucket directories (`zb` = the z-value's top
    * `bucketBits` bits). Range-repartitioning on zv before the
    * partitioned write keeps each output task on a contiguous z-range,
    * so a task writes into one (or few) bucket directories and file
    * counts stay O(numFiles + buckets), not their product. The written
    * table carries both `zv` and the original columns; `zb` becomes the
    * partition directory. Fails if any dimension value is NULL or needs
    * more than `bits` bits — a per-row guard fused into the write's own
    * scan (soundness of every later pruned read depends on it). */
  def writeZClustered(df: DataFrame, cols: Seq[String], bits: Int,
                      bucketBits: Int, numFiles: Int, path: String): Unit =
    zClusteredWrite(df, cols, bits, bucketBits, numFiles, path, "overwrite")

  /** The clustered FRAME both write paths share: zv + zb as DATA columns,
    * range-repartitioned on zv and sorted within tasks, with the per-row
    * bit-budget/NULL guard fused into zb's own expression so it rides the
    * SAME scan as the write (a separate validation aggregate doubled the
    * upstream pipeline cost — once per micro-batch on the streaming
    * ingest path). A null key would land in the
    * __HIVE_DEFAULT_PARTITION__ dir and silently vanish from every box
    * read; CASE WHEN + raise_error is the form the optimizer keeps. */
  private def zClusteredFrame(df: DataFrame, cols: Seq[String], bits: Int,
                              bucketBits: Int, numFiles: Int): DataFrame = {
    val m = cols.size
    require(bucketBits >= m && bucketBits % m == 0 && bucketBits <= bits * m,
      s"bucketBits=$bucketBits must be a positive multiple of $m dims, ≤ ${bits * m}")
    val lim = 1L << bits
    val viol = cols.map { c =>
      col(c).isNull || col(c).cast("long") < 0 || col(c).cast("long") >= lim
    }.reduce(_ || _)
    withZValue(df, cols, bits)
      .withColumn("zb",
        when(viol, raise_error(lit(
          s"a dimension of (${cols.mkString(", ")}) is NULL or outside " +
            s"[0, 2^$bits) — z-bucket pruning would be unsound")))
          .otherwise(shiftright(col("zv"), bits * m - bucketBits)))
      .repartitionByRange(numFiles, col("zv"))
      .sortWithinPartitions("zv")
  }

  private def zClusteredWrite(df: DataFrame, cols: Seq[String], bits: Int,
                              bucketBits: Int, numFiles: Int, path: String,
                              mode: String): Unit =
    zClusteredFrame(df, cols, bits, bucketBits, numFiles)
      .write.mode(mode).partitionBy("zb").parquet(path)

  /** Append a new batch into an existing z-clustered layout without
    * touching resident files: same interleave, same bucket split, dynamic
    * append into the bucket directories (the [[graft.operators.Similarity]]
    * `appendToIvfIndex` shape applied to layout — daily ingest never
    * rewrites the table). Box reads prune identically over the grown
    * table; the small files appends accumulate are the standing
    * compaction job's problem ([[compactZBuckets]]), not the reader's.
    * The same bit-budget guard applies —
    * an out-of-range appended value would land in the wrong bucket and
    * silently break pruning soundness. */
  def appendZClustered(df: DataFrame, cols: Seq[String], bits: Int,
                       bucketBits: Int, numFiles: Int, path: String): Unit =
    zClusteredWrite(df, cols, bits, bucketBits, numFiles, path, "append")

  /** [[appendZClustered]] with the [[EpochLedger]] EXACTLY-ONCE
    * contract — the streaming sink's append: a crash-replayed epoch is
    * either SKIPPED (it landed) or self-healed (partial leftovers purged
    * by their `e<E>-` prefix, the batch re-staged and re-promoted), so a
    * restart never duplicates rows where the plain dynamic append would.
    * Returns false when the epoch was already landed (nothing written).
    * Single-writer per layout, the same discipline the sinks already
    * serialize via foreachBatch. */
  def appendZClusteredExactlyOnce(df: DataFrame, cols: Seq[String],
      bits: Int, bucketBits: Int, numFiles: Int, path: String,
      epoch: Long): Boolean = {
    if (epoch <= EpochLedger.lastEpoch(path)) return false
    EpochLedger.purge(path, epoch)
    zClusteredWrite(df, cols, bits, bucketBits, numFiles,
      EpochLedger.stagingPath(path, epoch), "overwrite")
    EpochLedger.promote(path, epoch)
    EpochLedger.record(path, epoch)
    true
  }

  /** Compact the small files [[appendZClustered]] accumulates in the
    * z-bucket directories — [[Compaction.compactPartitionedDirs]] on the
    * `zb` layout (the same engine `Similarity.compactIvfIndex` runs on
    * `cell=` dirs). Returns the compacted bucket ids. */
  def compactZBuckets(spark: SparkSession, path: String,
                      maxFilesPerBucket: Int): Seq[Long] =
    Compaction.compactPartitionedDirs(spark, path, "zb", maxFilesPerBucket,
        sortCols = Seq("zv"))
      .map(_.toLong).sorted

  // --- VERSIONED z-layout: the table-format composition ---
  //
  // The Hive-dir layout above swaps directories for maintenance, with the
  // documented non-isolated windows (single-writer discipline;
  // [[Compaction]]'s crash protocol). The versioned form instead commits
  // every append and compaction as a [[Versioned]] MANIFEST whose
  // file-grain entries carry the zb partition value, so:
  //  - box reads resolve a PINNED manifest and prune FILES by bucket from
  //    metadata alone (no directory listing — the Delta/Iceberg model);
  //  - appends/OPTIMIZE are snapshot-isolated: a reader holding version N
  //    sees identical rows before/during/after any maintenance commit;
  //  - time travel works per bucket (`readZBoxVersioned(version = N)`).
  // zb stays a DATA column here (the manifest, not the path, is the
  // index), so the residual `zb IN buckets` filter is an ordinary pushed
  // predicate over the already-pruned file set.

  /** Commit `df` z-clustered into the versioned table (first commit
    * creates it; later calls append). `tag` lands in the manifest header
    * (the streaming sink's exactly-once epoch id). Returns the new
    * version. */
  def writeZClusteredVersioned(df: DataFrame, cols: Seq[String], bits: Int,
                               bucketBits: Int, numFiles: Int,
                               table: String,
                               tag: Option[String] = None): Int =
    Versioned.commitPartitioned(
      zClusteredFrame(df, cols, bits, bucketBits, numFiles), table, "zb",
      tag = tag)

  /** Snapshot-isolated OPTIMIZE of the versioned z-layout: small files
    * coalesce per bucket (zv order restored within files), the manifest
    * swaps them atomically, pinned readers keep their version. */
  def compactZBucketsVersioned(spark: SparkSession, table: String,
                               smallBytes: Long): Int =
    Versioned.compactSmallFiles(spark, table, smallBytes,
      sortCols = Seq("zv"))

  /** FULL Z-ORDER OPTIMIZE of the versioned z-layout — Delta's
    * `OPTIMIZE ZORDER BY` as one snapshot-isolated maintenance commit:
    * the whole table re-interleaves and re-splits into `numFiles`
    * zv-contiguous files ([[Versioned.rewriteAll]]), collapsing the
    * per-epoch file fragmentation a long append/merge history leaves
    * behind where [[compactZBucketsVersioned]] only coalesces the small
    * tail. Pinned readers keep their version; racing commits abort the
    * rewrite with a conflict (retry), never a lost update. Run rarely —
    * this is the table-sized re-clustering pass. */
  def reclusterZVersioned(spark: SparkSession, table: String,
      cols: Seq[String], bits: Int, bucketBits: Int,
      numFiles: Int): Int =
    Versioned.rewriteAll(spark, table,
      df => zClusteredFrame(df.drop("zv", "zb"), cols, bits, bucketBits,
        numFiles),
      partCol = Some("zb"))

  /** Box read over the versioned z-layout as of `version` (latest by
    * default): bucket set from the same exact dyadic math, file set from
    * the pinned manifest's zb metadata, exact predicates on top. */
  def readZBoxVersioned(spark: SparkSession, table: String,
                        dims: Seq[(String, Long, Long)], bits: Int,
                        bucketBits: Int,
                        version: Int = Int.MaxValue): DataFrame = {
    val buckets = zBoxBuckets(dims.map(d => (d._2, d._3)), bits, bucketBits)
    val exact: Column = dims.map { case (c, lo, hi) =>
      col(c) >= lo && col(c) <= hi
    }.reduce(_ && _)
    Versioned.snapshotWhere(spark, table, "zb",
        buckets.map(_.toString).toSet, version)
      .where(col("zb").isin(buckets: _*) && exact)
  }

  // --- Dimension encoding: z-order over ARBITRARY ordered columns ---
  //
  // withZValue/writeZClustered require non-negative integrals fitting
  // `bits` bits; strings, timestamps, and skewed ids don't. The encoder
  // owns that mapping: each dimension gets a PERSISTED, deterministic,
  // ORDER-PRESERVING value→code table, so range predicates on the
  // original column map to range predicates on the code and the dyadic
  // box pruning applies unchanged. Two kinds, chosen by cardinality:
  //
  //  - `dict` (#distinct ≤ 2^bits): the exact dictionary, rank = code.
  //    The persisted table is ≤ 2^bits rows — the config-declared
  //    dictionary budget — and encoding is a broadcast equi-join.
  //  - `bounds` (#distinct > 2^bits — the skewed-id / high-cardinality
  //    class): ONLY the 2^bits equal-frequency BOUNDARY values are
  //    persisted (the first distinct value of each code class), so the
  //    encoder is provably ≤ 2^bits rows no matter the dimension's
  //    cardinality — a 10⁹-distinct id dim yields the same config-sized
  //    table as a date dim. Encoding is a codegen'd binary-search range
  //    lookup ([[graft.functions.catalyst.BoundaryCode]]): no join, no
  //    broadcast, nothing corpus-sized on the driver. A hot key inflates
  //    one code's ROW count but never its code range, so pruning
  //    soundness is untouched; box reads map value ranges to code ranges
  //    conservatively (greatest boundary ≤ bound) and the exact original-
  //    column predicates re-apply on top, so results are exact either way.
  //
  // The rank itself is computed with the range-partition + offsets
  // global-index recipe (ops.Windows.globalIndex) — NOT an unpartitioned
  // row_number window — so the build path has no single-partition sort at
  // ANY cardinality (LayoutSpec gates the plan).

  // sibling of the table dir (the _compact_tmp convention): the layout's
  // own overwrite-mode write truncates the table path, and the encoders
  // must survive it — they are built BEFORE the clustered write reads
  // them
  private def encoderPath(path: String, c: String) =
    s"${path.stripSuffix("/")}_encoders/$c"

  private def encCol(c: String) = s"__zenc_$c"

  val DictKind = "dict"
  val BoundsKind = "bounds"

  /** IN-QUERY cache of COLLECTED encoder tables, keyed by encoder path.
    * An encoder is ≤ 2^bits rows BY CONSTRUCTION (the config-declared
    * budget), yet every encode/box-read was re-reading it through its own
    * Spark actions — a parquet scan for the frame, a head() for the kind,
    * an aggregate per range probe, a collect per bounds encode. On the
    * versioned-family queries that stacked up to ~90 driver actions per
    * query at ~50-80 ms fixed local latency each (measured: q248 = 92
    * jobs, 6.1 s wall vs 12.3 s task-time at local[32]) — guide §2.4/§5
    * driver-bound work. One collect per (encoder, query) serves every
    * later probe from driver memory; encode joins build a LocalRelation
    * from the cached rows (no re-scan), and range probes aggregate over
    * that LocalRelation with the SAME expressions as before (SQL
    * comparison semantics preserved exactly — nothing is re-implemented
    * in Scala).
    *
    * Lifetime: invalidated on every encoder WRITE ([[buildEncoder]] /
    * [[extendEncoders]]), cleared between queries via
    * [[releaseEncoderCache]] (wired into the runners' release hooks next
    * to PinnedFrames). In-query reuse only — every bench/oracle run still
    * computes the encoders from the parquet inputs it just wrote. */
  private val encoderCache =
    new java.util.concurrent.ConcurrentHashMap[String,
      (String, org.apache.spark.sql.types.StructType, Array[org.apache.spark.sql.Row])]()

  /** Drop every cached encoder (query runners call this between queries,
    * the PinnedFrames discipline — wired into PinnedFrames.release so
    * every existing runner release site covers it). */
  def releaseEncoderCache(): Unit = encoderCache.clear()
  graft.PinnedFrames.onRelease(() => releaseEncoderCache())

  private def collectedEncoder(spark: SparkSession, path: String, c: String)
      : (String, org.apache.spark.sql.types.StructType, Array[org.apache.spark.sql.Row]) =
    encoderCache.computeIfAbsent(encoderPath(path, c), _ => {
      val df = readEncoder(spark, path, c).orderBy("code")
      (df.select("kind").head().getString(0), df.schema, df.collect())
    })

  /** The encoder as a LocalRelation over the cached rows — same schema,
    * same rows, no parquet scan behind later probes. */
  private def localEncoder(spark: SparkSession, path: String,
                           c: String): DataFrame = {
    val (_, schema, rows) = collectedEncoder(spark, path, c)
    spark.createDataFrame(java.util.Arrays.asList(rows: _*), schema)
  }

  /** The coded encoder FRAME for one dimension (value, code, kind) —
    * package-private so LayoutSpec can gate the PLAN: the value-carrying
    * frame never passes through a single-partition window. Determinism:
    * distinct values sorted ascending, exact global ranks — bit-identical
    * on rebuild, replayable in an external oracle. NULLs are excluded
    * here and rejected at write time by the z-layout's own NULL guard. */
  private[io] def buildEncoderFrame(df: DataFrame, c: String,
                                    bits: Int): DataFrame = {
    val lim = 1L << bits
    val distinctVals = df.select(col(c).as("value"))
      .where(col("value").isNotNull).distinct()
    // exact global rank at #distinct grain via range partitioning +
    // broadcast partition offsets — scale-safe where a global row_number
    // window would funnel every distinct value through one task.
    // Cardinality comes from the RANKED frame (max 1-based rank) instead
    // of a separate distinct().count(): globalIndex pins its range-
    // partitioned input, so this evaluates the scan+distinct pipeline
    // ONCE per build where the previous shape ran it twice (guide §2.4),
    // with no additional persisted copy.
    val ranked1 = graft.ops.Windows.globalIndex(distinctVals, Seq("value"),
      "rank")
    val maxRank = ranked1.agg(max(col("rank"))).head()
    val n = if (maxRank.isNullAt(0)) 0L else maxRank.getLong(0)
    if (n < 1) {
      // error path: globalIndex pinned its range-partitioned frame above;
      // release it before aborting so the failed build leaks nothing
      // (ADVICE r15) — the query is over either way
      graft.PinnedFrames.release()
      throw new IllegalArgumentException(
        s"requirement failed: dimension $c has no non-null values")
    }
    val ranked = ranked1.withColumn("rank", col("rank") - 1L)
    if (n <= lim)
      ranked.select(col("value"), col("rank").as("code"),
        lit(DictKind).as("kind"))
    else {
      // equal-frequency code classes over the distinct ranks (same
      // monotone map as the dictionary form: code = rank·2^bits / n);
      // persist ONLY each class's first value — the boundary
      val codeOf = (r: Column) => (r * lim / n).cast("long")
      ranked
        .where(col("rank") === 0L ||
          codeOf(col("rank")) =!= codeOf(col("rank") - 1L))
        .select(col("value"), codeOf(col("rank")).as("code"),
          lit(BoundsKind).as("kind"))
    }
  }

  private def buildEncoder(df: DataFrame, c: String, bits: Int,
                           path: String): Unit = {
    // ≤ 2^bits rows by construction for BOTH kinds — the coalesce(1) and
    // the downstream broadcast are config-bounded, never corpus-bounded
    buildEncoderFrame(df, c, bits).coalesce(1)
      .write.mode("overwrite").parquet(path)
    encoderCache.remove(path): Unit // rebuilt encoder: drop the stale copy
  }

  /** Encoder table for dimension `c` of an encoded z-layout at `path`:
    * (value, code, kind) rows, ascending in value and code; `kind` is
    * [[DictKind]] (exact dictionary) or [[BoundsKind]] (equal-frequency
    * boundaries). ≤ 2^bits rows either way. */
  def readEncoder(spark: SparkSession, path: String, c: String): DataFrame =
    spark.read.parquet(encoderPath(path, c))

  private[io] def encodeDims(df: DataFrame, spark: SparkSession, path: String,
                             cols: Seq[String]): DataFrame =
    cols.foldLeft(df) { (acc, c) =>
      val (kind, schema, rows) = collectedEncoder(spark, path, c)
      if (kind == DictKind) {
        // broadcast of the cached LocalRelation: dict encoders are
        // ≤ 2^bits rows by construction; an unseen value joins to a NULL
        // code and the z-layout's NULL guard aborts the write — the
        // dictionary is static until explicitly rebuilt or
        // order-preservingly EXTENDED ([[extendEncoders]]); interior
        // insertions are never accepted (codes are order-dependent; one
        // would scramble resident buckets)
        val e = localEncoder(spark, path, c)
          .select(col("value").as(s"${encCol(c)}_v"),
            col("code").as(encCol(c)))
        acc.join(broadcast(e), acc(c) === col(s"${encCol(c)}_v"), "left")
          .drop(s"${encCol(c)}_v")
      } else {
        // bounds encoder: ≤ 2^bits (boundary, code) rows — config-sized
        // driver math baked into a codegen'd binary search; no join, no
        // broadcast. A value BELOW the first boundary codes NULL (the
        // NULL guard aborts the write — it would need an interior code);
        // a value ABOVE the last boundary takes the last code, which is
        // order-preserving, so appends of later periods need no rebuild.
        // Rows come from the cache, sorted by code — no per-encode collect.
        val vi = schema.fieldIndex("value"); val ci = schema.fieldIndex("code")
        acc.withColumn(encCol(c),
          graft.functions.catalyst.LayoutExpressions.boundaryCode(
            acc(c), df.schema(c).dataType,
            rows.map(_.get(vi)).toSeq, rows.map(_.getLong(ci)).toSeq))
      }
    }

  /** Order-preserving EXTENSION of the persisted dictionaries for
    * append-time new values — the recovery path short of a full rebuild
    * + re-cluster when an append carries values the build never saw:
    *
    *  - `dict` dims: new values sorting STRICTLY ABOVE the current
    *    dictionary maximum (the time-dimension common case: a new month
    *    arrives) get the next codes above the current max — resident
    *    buckets are untouched by construction (no existing code moves).
    *    Unseen values INTERIOR to the dictionary range abort loudly (an
    *    interior code would re-order the mapping and scramble resident
    *    buckets), as does overflowing the 2^bits code budget.
    *  - `bounds` dims need no extension (later values take the last
    *    boundary's code natively) — reported as 0.
    *
    * Returns per-dimension counts of newly added dictionary entries.
    * Call before [[appendZClusteredEncoded]] when the batch may carry
    * later periods. */
  def extendEncoders(df: DataFrame, cols: Seq[String], bits: Int,
                     path: String): Map[String, Long] = {
    val spark = df.sparkSession
    val lim = 1L << bits
    cols.map { c =>
      val enc = localEncoder(spark, path, c)
      if (collectedEncoder(spark, path, c)._1 == BoundsKind) c -> 0L
      else {
        val m = enc.agg(max("value"), max("code")).head()
        val maxV = m.get(0); val maxCode = m.getLong(1)
        // ONE distinct pass over the batch per dimension, pinned — the
        // interior check, the new-value count and the ranking all read it
        // (the previous shape re-scanned the batch for each; guide §2.4).
        // Dict dims are ≤ 2^bits distinct by contract, so the pin is
        // config-sized; released by the runners like every operator pin.
        val distinctVals = graft.PinnedFrames.pin(
          df.select(col(c).as("value")).where(col("value").isNotNull)
            .distinct().persist())
        val interior = distinctVals.where(col("value") <= lit(maxV))
          .join(enc.select("value"), Seq("value"), "left_anti")
          .limit(1).collect()
        require(interior.isEmpty,
          s"dimension $c has an unseen value INTERIOR to the built " +
            s"dictionary (${interior.headOption.map(_.get(0))}): an " +
            "interior code would scramble resident buckets — rebuild the " +
            "layout instead")
        val newVals = distinctVals.where(col("value") > lit(maxV))
        val nNew = newVals.count()
        if (nNew == 0L) c -> 0L
        else {
          require(maxCode + nNew < lim,
            s"extending $c by $nNew values would overflow the 2^$bits " +
              "code budget — rebuild with more bits or a bounds encoder")
          // ranks are 1-based → codes maxCode+1 .. maxCode+nNew
          graft.ops.Windows.globalIndex(newVals, Seq("value"), "rank")
            .select(col("value"), (col("rank") + maxCode).as("code"),
              lit(DictKind).as("kind"))
            .coalesce(1).write.mode("append")
            .parquet(encoderPath(path, c))
          encoderCache.remove(encoderPath(path, c)): Unit // grew: re-collect
          c -> nNew
        }
      }
    }.toMap
  }

  /** Write `df` z-clustered by ENCODED dimensions `cols` — arbitrary
    * orderable types (strings, timestamps, skewed ids). Builds and
    * persists one encoder per dimension in the SIBLING directory
    * `<path>_encoders/<col>` (outside the table dir — the layout's own
    * overwrite-mode write truncates `<path>`, and relocating or removing
    * the table must move/remove the encoders WITH it), then writes the
    * [[writeZClustered]] layout over the code columns. The written table
    * keeps the original columns (the read path's exact predicates) plus
    * the code columns and zv/zb. */
  def writeZClusteredEncoded(df: DataFrame, cols: Seq[String], bits: Int,
                             bucketBits: Int, numFiles: Int,
                             path: String): Unit = {
    val spark = df.sparkSession
    cols.foreach(c => buildEncoder(df, c, bits, encoderPath(path, c)))
    zClusteredWrite(encodeDims(df, spark, path, cols), cols.map(encCol),
      bits, bucketBits, numFiles, path, "overwrite")
  }

  /** Append a batch into an encoded z-layout using the PERSISTED
    * encoders — the [[appendZClustered]] contract. Unseen values: a
    * `dict` dimension fails the write (NULL-code guard) unless the
    * dictionary was first extended via [[extendEncoders]]; a `bounds`
    * dimension accepts values ABOVE its last boundary natively (last
    * code — order-preserving) and fails only below its first boundary.
    * Either failure is loud, never a silently wrong bucket. */
  def appendZClusteredEncoded(df: DataFrame, cols: Seq[String], bits: Int,
                              bucketBits: Int, numFiles: Int,
                              path: String): Unit =
    zClusteredWrite(encodeDims(df, df.sparkSession, path, cols),
      cols.map(encCol), bits, bucketBits, numFiles, path, "append")

  /** Read an encoded z-clustered table restricted to an inclusive box on
    * the ORIGINAL column values: each dimension's value range maps to a
    * code range via its encoder, the dyadic bucket math prunes
    * directories, and the exact per-column predicates on the original
    * values apply on top. Code-range mapping per encoder kind:
    *
    *  - `dict`: min/max code over the dictionary values inside the range
    *    — exact for pruning, and a range containing NO dictionary value
    *    proves zero matching rows (the scan is skipped outright).
    *  - `bounds`: each bound maps to the greatest boundary ≤ it (lo with
    *    no boundary below falls to the first code) — conservative but
    *    sound: every value in the box codes inside [loCode, hiCode]
    *    because the boundary map is monotone. A hi below the FIRST
    *    boundary still proves emptiness (the first boundary is the
    *    dimension's build-time minimum and below-minimum appends are
    *    rejected by the encode NULL guard). */
  def readZBoxEncoded(spark: SparkSession, path: String,
                      dims: Seq[(String, Any, Any)], bits: Int,
                      bucketBits: Int): DataFrame = {
    val ranges = encodedRanges(spark, path, dims)
    val exact: Column = dims.map { case (c, lo, hi) =>
      col(c) >= lit(lo) && col(c) <= lit(hi)
    }.reduce(_ && _)
    if (ranges.exists(_.isEmpty))
      spark.read.parquet(path).where(lit(false))
    else {
      val buckets = zBoxBuckets(ranges.map(_.get), bits, bucketBits)
      spark.read.parquet(path)
        .where(col("zb").isin(buckets: _*) && exact)
    }
  }

  /** Per-dimension CODE range an inclusive value box maps to through the
    * persisted encoders (the [[readZBoxEncoded]] math, shared with the
    * versioned read): None = provably empty (see readZBoxEncoded's
    * per-kind contract). */
  private def encodedRanges(spark: SparkSession, path: String,
      dims: Seq[(String, Any, Any)]): Seq[Option[(Long, Long)]] =
    dims.map { case (c, lo, hi) =>
      // probes run over the cached LocalRelation with the SAME expressions
      // as the original parquet-backed aggregates — one tiny local job per
      // dimension instead of a scan + kind head() + aggregate each
      val enc = localEncoder(spark, path, c)
      if (collectedEncoder(spark, path, c)._1 == DictKind) {
        val r = enc
          .where(col("value") >= lit(lo) && col("value") <= lit(hi))
          .agg(min("code"), max("code")).head()
        if (r.isNullAt(0)) None else Some((r.getLong(0), r.getLong(1)))
      } else {
        val r = enc.agg(
          max(when(col("value") <= lit(lo), col("code"))),
          max(when(col("value") <= lit(hi), col("code")))).head()
        if (r.isNullAt(1)) None
        else Some(((if (r.isNullAt(0)) 0L else r.getLong(0)), r.getLong(1)))
      }
    }

  // --- VERSIONED × ENCODED: stats skipping on the code columns ---
  //
  // The versioned z-layout (above) prunes FILES by zb bucket from the
  // manifest; the encoders (above) map arbitrary ordered dims to codes.
  // Their composition adds the third pruning axis: each commit records
  // per-file min/max of every dimension's CODE column in the manifest
  // (parquet-footer stats — no extra scan), and a box read maps value
  // ranges → code ranges through the encoders, then prunes files by
  // BOTH the bucket set and each code range in one manifest pass
  // ([[Versioned.snapshotWhereRanges]]). Within a kept bucket, the
  // zv-range file split makes per-file code ranges narrow, so a
  // string-dimension range predicate skips files bucket pruning alone
  // cannot — before any data file opens.

  /** Commit `df` z-clustered on ENCODED dims into the versioned table
    * with per-file code-column stats in the manifest. The FIRST commit
    * builds and persists the encoders (sibling `<table>_encoders/`);
    * later calls append THROUGH them — the [[appendZClusteredEncoded]]
    * unseen-value contract applies (`dict` dims need [[extendEncoders]]
    * for later values; `bounds` dims accept above-max natively). Returns
    * the new version. */
  def writeZClusteredEncodedVersioned(df: DataFrame, cols: Seq[String],
      bits: Int, bucketBits: Int, numFiles: Int, table: String,
      tag: Option[String] = None): Int = {
    val spark = df.sparkSession
    if (Versioned.latestVersion(table) < 1)
      cols.foreach(c => buildEncoder(df, c, bits, encoderPath(table, c)))
    Versioned.commitPartitioned(
      zClusteredFrame(encodeDims(df, spark, table, cols), cols.map(encCol),
        bits, bucketBits, numFiles),
      table, "zb", tag = tag, statsCols = cols.map(encCol))
  }

  /** Box read over the versioned ENCODED z-layout as of `version`: value
    * ranges map to code ranges through the encoders, the pinned manifest
    * prunes files by bucket AND by per-file code-range stats in one
    * metadata pass, and the exact original-value predicates apply on
    * top. A provably empty code range (see [[readZBoxEncoded]]) skips
    * the scan outright. */
  def readZBoxEncodedVersioned(spark: SparkSession, table: String,
      dims: Seq[(String, Any, Any)], bits: Int, bucketBits: Int,
      version: Int = Int.MaxValue): DataFrame = {
    val ranges = encodedRanges(spark, table, dims)
    val exact: Column = dims.map { case (c, lo, hi) =>
      col(c) >= lit(lo) && col(c) <= lit(hi)
    }.reduce(_ && _)
    if (ranges.exists(_.isEmpty))
      Versioned.snapshot(spark, table, version).where(lit(false))
    else {
      val rs = ranges.map(_.get)
      val buckets = zBoxBuckets(rs, bits, bucketBits)
      // ranges computed ONCE and passed down — the previous shape
      // re-derived them inside prunedZBoxEncodedVersioned (guide §2.4)
      prunedZBoxEncodedRanges(spark, table, dims.map(_._1), rs, bits,
        bucketBits, version)
        .where(col("zb").isin(buckets: _*) && exact)
    }
  }

  /** The manifest-pruned frame a [[readZBoxEncodedVersioned]] box read
    * scans, BEFORE any predicate — exactly the file set left after the
    * bucket-set AND per-file code-range pruning. This is the pinning
    * surface: queries/specs assert this set is strictly smaller than
    * bucket pruning alone (predicates on the full read would conflate
    * row filtering with file skipping). Requires a non-empty code range
    * on every dimension (the full read handles the provably-empty case). */
  def prunedZBoxEncodedVersioned(spark: SparkSession, table: String,
      dims: Seq[(String, Any, Any)], bits: Int, bucketBits: Int,
      version: Int = Int.MaxValue): DataFrame = {
    val rs = encodedRanges(spark, table, dims).map(_.getOrElse(
      throw new IllegalArgumentException(
        "provably empty code range — use readZBoxEncodedVersioned")))
    prunedZBoxEncodedRanges(spark, table, dims.map(_._1), rs, bits,
      bucketBits, version)
  }

  /** [[prunedZBoxEncodedVersioned]] with the code ranges already mapped —
    * the shared tail, so [[readZBoxEncodedVersioned]] maps each box
    * through the encoders exactly once. */
  private def prunedZBoxEncodedRanges(spark: SparkSession, table: String,
      cols: Seq[String], rs: Seq[(Long, Long)], bits: Int, bucketBits: Int,
      version: Int): DataFrame = {
    val buckets = zBoxBuckets(rs, bits, bucketBits)
    Versioned.snapshotWhereRanges(spark, table, "zb",
      buckets.map(_.toString).toSet,
      cols.zip(rs).map { case (c, (lo, hi)) => (encCol(c), lo, hi) },
      version)
  }

  /** The z-buckets whose dyadic rectangle intersects the box — driver-side
    * config-sized math (2^bucketBits iterations; a bucket id fixes the top
    * bucketBits/m bits of EVERY dimension because bucketBits is a multiple
    * of m, so each bucket is an exact axis-aligned rectangle and the
    * per-dimension interval-overlap test is exact: no missed bucket, no
    * bucket that couldn't hold a box point). `box` is inclusive
    * (lo, hi) per dimension, in the same column order given to
    * [[writeZClustered]]. */
  def zBoxBuckets(box: Seq[(Long, Long)], bits: Int,
                  bucketBits: Int): Seq[Long] = {
    val m = box.size
    require(bucketBits % m == 0 && bucketBits <= bits * m)
    val perDim = bucketBits / m
    val low = bits - perDim
    (0L until (1L << bucketBits)).filter { b =>
      val prefixes = Array.fill(m)(0L)
      var t = 0
      while (t < bucketBits) {
        val j = bits * m - bucketBits + t
        if (((b >> t) & 1L) == 1L) prefixes(j % m) |= 1L << (j / m - low)
        t += 1
      }
      (0 until m).forall { i =>
        val lo = prefixes(i) << low
        val hi = lo + (1L << low) - 1
        hi >= box(i)._1 && lo <= box(i)._2
      }
    }
  }

  /** Read a z-clustered table restricted to an inclusive box:
    * `dims` = (column, lo, hi) in the write-time column order. The
    * bucket set reaches the scan as an `IN` partition filter (directory
    * pruning — PartitionFilters in the plan, asserted by LayoutSpec) and
    * the exact per-column predicates apply on top, so results equal a
    * full-scan filter while touching only intersecting buckets. */
  def readZBox(spark: SparkSession, path: String,
               dims: Seq[(String, Long, Long)], bits: Int,
               bucketBits: Int): DataFrame = {
    val buckets = zBoxBuckets(dims.map(d => (d._2, d._3)), bits, bucketBits)
    val exact: Column = dims.map { case (c, lo, hi) =>
      col(c) >= lo && col(c) <= hi
    }.reduce(_ && _)
    spark.read.parquet(path)
      .where(col("zb").isin(buckets: _*) && exact)
  }
}
