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

  private def zClusteredWrite(df: DataFrame, cols: Seq[String], bits: Int,
                              bucketBits: Int, numFiles: Int, path: String,
                              mode: String): Unit = {
    val m = cols.size
    require(bucketBits >= m && bucketBits % m == 0 && bucketBits <= bits * m,
      s"bucketBits=$bucketBits must be a positive multiple of $m dims, ≤ ${bits * m}")
    val lim = 1L << bits
    // per-row bit-budget guard, fused into zb so it rides the SAME scan
    // as the write (a separate validation aggregate doubled the upstream
    // pipeline cost — once per micro-batch on the streaming ingest path)
    // and catches NULL dimensions too (a null key would land in the
    // __HIVE_DEFAULT_PARTITION__ dir and silently vanish from every box
    // read). CASE WHEN + raise_error, the form the optimizer keeps.
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
      .write.mode(mode).partitionBy("zb").parquet(path)
  }

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

  /** Compact the small files [[appendZClustered]] accumulates in the
    * z-bucket directories — [[Compaction.compactPartitionedDirs]] on the
    * `zb` layout (the same engine `Similarity.compactIvfIndex` runs on
    * `cell=` dirs). Returns the compacted bucket ids. */
  def compactZBuckets(spark: SparkSession, path: String,
                      maxFilesPerBucket: Int): Seq[Long] =
    Compaction.compactPartitionedDirs(spark, path, "zb", maxFilesPerBucket,
        sortCols = Seq("zv"))
      .map(_.toLong).sorted

  // --- Dimension encoding: z-order over ARBITRARY ordered columns ---
  //
  // withZValue/writeZClustered require non-negative integrals fitting
  // `bits` bits; strings, timestamps, and skewed ids don't. The encoder
  // owns that mapping: each dimension gets a PERSISTED, deterministic,
  // ORDER-PRESERVING value→code table (codes dense in [0, 2^bits)), so
  // range predicates on the original column map to range predicates on
  // the code and the dyadic box pruning applies unchanged. Cardinality ≤
  // 2^bits gets the exact dictionary (rank = code); above that, ranks
  // are bucketed equal-frequency over the DISTINCT values
  // (code = rank·2^bits / n — the skewed-id case: a hot key inflates one
  // code's ROW count but never its code range, so pruning soundness is
  // untouched). Both are one distinct-aggregate to build (shuffle at
  // #distinct grain, not row grain) and the encoder table itself is
  // ≤ #distinct rows of metadata.

  // sibling of the table dir (the _compact_tmp convention): the layout's
  // own overwrite-mode write truncates the table path, and the encoders
  // must survive it — they are built BEFORE the clustered write reads
  // them
  private def encoderPath(path: String, c: String) =
    s"${path.stripSuffix("/")}_encoders/$c"

  private def encCol(c: String) = s"__zenc_$c"

  /** Build + persist the encoder for one dimension column. Determinism:
    * distinct values sorted ascending, dense ranks — bit-identical on
    * rebuild, replayable in an external oracle. NULLs are excluded here
    * and rejected at write time by the z-layout's own NULL guard. */
  private def buildEncoder(df: DataFrame, c: String, bits: Int,
                           path: String): Unit = {
    val w = org.apache.spark.sql.expressions.Window.orderBy(col("value"))
    val enc = df.select(col(c).as("value")).where(col("value").isNotNull)
      .distinct()
      // global-order window: runs AFTER the distinct aggregate, on
      // #distinct rows — the encoder-sized frame, not the table
      .withColumn("rank", row_number().over(w).cast("long") - 1L)
    val n = enc.count()
    require(n >= 1, s"dimension $c has no non-null values")
    val lim = 1L << bits
    val coded =
      if (n <= lim) enc.withColumn("code", col("rank"))
      else enc.withColumn("code", (col("rank") * lim / n).cast("long"))
    coded.select("value", "code").coalesce(1)
      .write.mode("overwrite").parquet(path)
  }

  /** Encoder table for dimension `c` of an encoded z-layout at `path`:
    * (value, code) rows, ascending in both. */
  def readEncoder(spark: SparkSession, path: String, c: String): DataFrame =
    spark.read.parquet(encoderPath(path, c))

  private def encodeDims(df: DataFrame, spark: SparkSession, path: String,
                         cols: Seq[String]): DataFrame =
    cols.foldLeft(df) { (acc, c) =>
      val enc = readEncoder(spark, path, c)
        .select(col("value").as(s"${encCol(c)}_v"),
          col("code").as(encCol(c)))
      // broadcast: the encoder is metadata-sized by construction; an
      // unseen value (appends after the dictionary was built) joins to a
      // NULL code and the z-layout's NULL guard aborts the write — the
      // dictionary is static until explicitly rebuilt, never silently
      // extended (codes are order-dependent; an in-place extension would
      // scramble resident buckets)
      acc.join(broadcast(enc), acc(c) === col(s"${encCol(c)}_v"), "left")
        .drop(s"${encCol(c)}_v")
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
    * encoders — the [[appendZClustered]] contract; a value outside the
    * built dictionary fails the write (NULL-code guard) instead of
    * landing in a wrong bucket. */
  def appendZClusteredEncoded(df: DataFrame, cols: Seq[String], bits: Int,
                              bucketBits: Int, numFiles: Int,
                              path: String): Unit =
    zClusteredWrite(encodeDims(df, df.sparkSession, path, cols),
      cols.map(encCol), bits, bucketBits, numFiles, path, "append")

  /** Read an encoded z-clustered table restricted to an inclusive box on
    * the ORIGINAL column values: each dimension's value range maps to a
    * code range via its encoder (min/max code over the dictionary values
    * inside the range — exact for pruning: every row whose value lies in
    * the box has its code in that range), the dyadic bucket math prunes
    * directories, and the exact per-column predicates on the original
    * values apply on top. A dimension range containing NO dictionary
    * value proves zero matching rows — the scan is skipped outright. */
  def readZBoxEncoded(spark: SparkSession, path: String,
                      dims: Seq[(String, Any, Any)], bits: Int,
                      bucketBits: Int): DataFrame = {
    val ranges = dims.map { case (c, lo, hi) =>
      val r = readEncoder(spark, path, c)
        .where(col("value") >= lit(lo) && col("value") <= lit(hi))
        .agg(min("code"), max("code")).head()
      if (r.isNullAt(0)) None else Some((r.getLong(0), r.getLong(1)))
    }
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
