package graft.io

import org.apache.spark.sql.DataFrame

/** Sinks (SURVEY.md §2.2). */
object Writers {

  /** K1 — partitioned parquet with dynamic partition overwrite: re-running a
    * subset of seasons replaces only the touched partitions
    * (ADAPTERS/SILVER-adapter-wyscout.py:495-503). */
  def writePartitioned(df: DataFrame, path: String, partitionCol: String): Unit = {
    df.sparkSession.conf
      .set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    // REBALANCE-distribute by the partition column before the partitioned
    // write (guide §6 — Iceberg's write.distribution-mode=hash WITH the
    // AQE rebalancing that backs it): a plain repartition(col) maps every
    // partition VALUE to exactly one task, which fixes the tasks × values
    // small-files blowup but funnels a HOT value (one month, one shard)
    // through one straggler task writing one arbitrarily large file at
    // scale (VERDICT r15). The rebalance hint keeps the hash distribution
    // — cold values still land as one task → one file — while AQE splits
    // any value over the advisory partition size into several size-capped
    // tasks/files and coalesces tiny neighbors. Under an AQE-off session
    // it degrades to the previous plain hash distribution.
    df.hint("rebalance", org.apache.spark.sql.functions.col(partitionCol))
      .write.mode("overwrite")
      .partitionBy(partitionCol)
      .option("compression", "snappy")
      .parquet(path)
  }

  /** Bucketed managed table: co-locates both sides of a recurring
    * fact-fact join (e.g. lineitem⋈orders on orderkey) so the join runs
    * without any Exchange — the 100 TB answer to the plan's dominant
    * shuffle (see SCALE.md). Requires saveAsTable (bucket metadata lives in
    * the catalog). */
  def writeBucketed(df: DataFrame, table: String, bucketCol: String,
                    numBuckets: Int): Unit =
    // NOTE (r15 optimization round, tried and reverted): repartitioning to
    // exactly numBuckets before the write gives one file per bucket
    // (Spark's bucket id and HashPartitioning share the Murmur3 pmod),
    // but collapsing the write stage to numBuckets tasks serialized the
    // heavy span-index pipeline above it — q103 measured +1 s at sf0.1
    // for a file-count win its reads never noticed. File-per-(task,
    // bucket) stays the documented behavior; compaction owns file counts.
    df.write.mode("overwrite")
      .bucketBy(numBuckets, bucketCol)
      .sortBy(bucketCol)
      .option("compression", "snappy")
      .format("parquet")
      .saveAsTable(table)

  /** Drop-and-replace a bucketed managed table. `writeBucketed` alone is
    * not re-runnable across JVMs: the in-memory catalog forgets tables at
    * session end but their warehouse directories persist, and a CREATE
    * over a stale non-empty location fails. This cleans both (catalog
    * entry + warehouse dir) before writing — the idempotent form every
    * recurring index-refresh job needs. */
  def replaceBucketedTable(df: DataFrame, table: String, bucketCol: String,
                           numBuckets: Int): Unit = {
    val spark = df.sparkSession
    spark.sql(s"DROP TABLE IF EXISTS `$table`")
    val wh = new java.net.URI(spark.conf.get("spark.sql.warehouse.dir"))
    val whDir = if (wh.getScheme == "file") new java.io.File(wh).getPath
                else wh.getPath match { case null => wh.toString; case p => p }
    val loc = new java.io.File(whDir, table)
    def rmRec(f: java.io.File): Unit = {
      Option(f.listFiles()).getOrElse(Array.empty).foreach(rmRec)
      f.delete(): Unit
    }
    rmRec(loc)
    writeBucketed(df, table, bucketCol, numBuckets)
  }

  /** Drop-and-replace a managed parquet table (optionally partitioned) —
    * the non-bucketed sibling of [[replaceBucketedTable]], and the ONLY
    * safe way to refresh a recurring managed sketch/side table:
    * `saveAsTable(Overwrite)` from a fresh JVM over a previous JVM's
    * surviving warehouse directory throws LOCATION_ALREADY_EXISTS (the
    * in-memory catalog forgot the table; its directory persisted), which
    * is exactly the re-run shape of every scheduled job. Cleans catalog
    * entry + location first; the write itself is plain parquet. */
  def replaceManagedTable(df: DataFrame, table: String,
                          partitionCol: Option[String] = None): Unit = {
    val spark = df.sparkSession
    spark.sql(s"DROP TABLE IF EXISTS `$table`")
    val wh = new java.net.URI(spark.conf.get("spark.sql.warehouse.dir"))
    val whDir = if (wh.getScheme == "file") new java.io.File(wh).getPath
                else wh.getPath match { case null => wh.toString; case p => p }
    val loc = new java.io.File(whDir, table)
    def rmRec(f: java.io.File): Unit = {
      Option(f.listFiles()).getOrElse(Array.empty).foreach(rmRec)
      f.delete(): Unit
    }
    rmRec(loc)
    val w = df.write.mode("overwrite")
      .option("compression", "snappy").format("parquet")
    partitionCol.fold(w)(c => w.partitionBy(c)).saveAsTable(table)
  }

  /** Training-shard output: the corpus written as `shard=K/` parquet
    * partitions whose token totals are balanced by sorted round-robin
    * ([[graft.operators.Curation.rankedShards]] — exact global rank from a
    * band histogram, no single-partition sort). `repartition(shard)` before
    * the partitioned write keeps it one file set per shard directory
    * instead of one-file-per-input-task-per-shard (the small-files
    * explosion a 100 TB write cannot afford); the write itself is K1's
    * dynamic-overwrite form, so re-sharding replaces shards atomically
    * per-partition. Cost model: the rank computation shuffles only the
    * (id, weight) metadata projection; the payload then moves twice —
    * once joining its shard assignment back on id, once repartitioning to
    * the shard layout. Two payload exchanges is the floor for EXACT
    * balanced sharding with a clean file layout; callers that can accept
    * statistical balance should hash-shard instead (zero extra payload
    * shuffles — see q107's hash branch). */
  def writeTrainingShards(df: DataFrame, path: String, idCol: String,
                          weightCol: String, nShards: Int): Unit = {
    import org.apache.spark.sql.functions.col
    val assign = graft.operators.Curation
      .rankedShards(df, idCol, weightCol, nShards)
      .select(col(idCol), col("shard"))
    val sharded = df.join(assign, Seq(idCol))
      .repartition(nShards, col("shard"))
    writePartitioned(sharded, path, "shard")
  }

  /** K2 — single-file debug CSV (ADAPTERS/SILVER-adapter-wyscout.py:505-511).
    * coalesce(1) is for debug output only — never on the main path. */
  def debugCsv(df: DataFrame, path: String): Unit =
    df.coalesce(1).write.mode("overwrite").option("header", "true").csv(path)

  /** K9 — duplicates report: every row whose key combination occurs more
    * than once, written as a debug CSV before the dedup resolves them
    * (DEPRECATED/statsbomb-silver.py:209-217, `keep=False` semantics: ALL
    * members of each duplicate group are reported, not just the losers).
    * Returns the duplicate-row count; nothing is written when it is zero.
    * Diagnostic sink: the single count() action and coalesce(1) are the
    * debug-path trade-off, never on the main path. */
  def duplicatesReport(df: DataFrame, keys: Seq[String], path: String): Long = {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions.{col, count, lit}
    val w = Window.partitionBy(keys.map(col): _*)
    val dups = df.withColumn("__n", count(lit(1)).over(w))
      .where(col("__n") > 1).drop("__n")
      .persist()
    val n = dups.count()
    if (n > 0) debugCsv(dups, path)
    dups.unpersist()
    n
  }

  /** Delta-style MERGE INTO for a partitioned parquet table at rest,
    * rewriting ONLY the partitions the batch touches. Contract: `keyCols`
    * identify a row, `partitionCol` is immutable per key (a fact's
    * day/month never moves), and `versionCol` is a total order per key
    * across table ∪ batch (ties would make keep-latest nondeterministic,
    * so give re-deliveries a higher version). Upserts and brand-new keys
    * both work; rows absent from the batch survive untouched.
    *
    * Scale shape — the whole point of the operator: the touched-partition
    * list is read from the BATCH (distinct partition values — calendar-
    * scale, config-sized driver traffic), the existing side is read with a
    * partition-pruned `isin` scan (PartitionFilters, never a full-table
    * scan), keep-latest is one key-grain window over touched data only,
    * and the dynamic-overwrite write replaces only touched directories —
    * so merge cost scales with the batch's data locality, not with table
    * size. Untouched partition files are not rewritten (MergeSpec asserts
    * byte-identical files), which also preserves their page/footer stats
    * and any z-order layout. This is the MERGE half of the lakehouse
    * pattern whose SCD2 half is `ops.Scd.scd2Merge`. */
  def mergeIntoPartitioned(table: String, batch: DataFrame, keyCols: Seq[String],
                           versionCol: String, partitionCol: String): Unit = {
    import org.apache.spark.sql.functions.col
    val spark = batch.sparkSession
    val touched = batch.select(partitionCol).distinct()
      .collect().map(_.get(0)) // calendar-scale by contract
    val existing = spark.read.parquet(table)
      .where(col(partitionCol).isin(touched: _*))
      .select(batch.columns.map(col): _*) // align column order for union
    val merged = graft.ops.Windows.keepBest(
      existing.unionByName(batch), keyCols, Seq(col(versionCol).desc))
    // Read-modify-write against the SAME path: Spark statically rejects
    // overwriting a source path, and committing mid-read would be unsafe
    // anyway. localCheckpoint materializes the merged result (bounded by
    // the TOUCHED partitions' data, not the table) and cuts the file-scan
    // lineage, so the overwrite sees a plan with no self-reference — the
    // poor-engine's transaction the lakehouse formats solve with a log.
    val staged = merged.localCheckpoint()
    try writePartitioned(staged, table, partitionCol)
    finally staged.unpersist()
  }

  /** Partition-pruned DELETE from a partitioned parquet table at rest —
    * targeted erasure (GDPR/right-to-be-forgotten, bad-batch retraction)
    * with the same cost contract as [[mergeIntoPartitioned]]: `deletes`
    * carries (key, partition) rows, ONLY the partitions named in the
    * batch are read (pruned `isin` scan) and rewritten (dynamic
    * overwrite); everything else stays byte-identical at rest. The delete
    * itself is one left-anti join on the key columns within touched
    * partitions. Keys absent from the table are a no-op. Same
    * localCheckpoint staging as the merge (self-path overwrite). */
  def deleteFromPartitioned(table: String, deletes: DataFrame,
                            keyCols: Seq[String], partitionCol: String): Unit = {
    import org.apache.spark.sql.functions.col
    val spark = deletes.sparkSession
    val touched = deletes.select(partitionCol).distinct()
      .collect().map(_.get(0)) // calendar-scale by contract
    val existing = spark.read.parquet(table)
      .where(col(partitionCol).isin(touched: _*))
    val kept = existing.join(
      deletes.select(keyCols.map(col): _*).distinct(),
      keyCols, "left_anti")
    val staged = kept.localCheckpoint()
    try {
      // dynamic overwrite only replaces partitions PRESENT in the output —
      // a partition whose every row was deleted writes nothing and its old
      // files would silently survive; drop those directories explicitly
      val keptParts = staged.select(partitionCol).distinct()
        .collect().map(_.get(0)).toSet
      writePartitioned(staged, table, partitionCol)
      touched.filterNot(keptParts).foreach { v =>
        val dir = new java.io.File(
          new java.net.URI(table).getScheme match {
            case null => table
            case "file" => new java.net.URI(table).getPath
            case _ => table
          }, s"$partitionCol=$v")
        def rmRec(f: java.io.File): Unit = {
          Option(f.listFiles()).getOrElse(Array.empty).foreach(rmRec)
          f.delete(): Unit
        }
        rmRec(dir)
      }
    } finally staged.unpersist()
  }

  /** K8 — per-aggregation-period fan-out: one filtered write per period
    * table (STAGING/GOLD-data-loader-experiment-form.py:552-576). */
  def writePerPeriod(df: DataFrame, pathFor: String => String,
                     periods: Seq[String], partitionCol: String): Unit = {
    import org.apache.spark.sql.functions.col
    periods.foreach { p =>
      writePartitioned(df.where(col("aggregationPeriod") === p), pathFor(p), partitionCol)
    }
  }

  /** Z-order (Morton) value of two bucketized non-negative int columns:
    * bit i of `a` lands at position 2i, bit i of `b` at 2i+1 — points
    * close in BOTH dimensions get close z-values, so range-partitioning
    * and sorting by z clusters files in both columns at once. That is the
    * multi-column data-skipping layout (Delta/Iceberg OPTIMIZE ZORDER)
    * expressed engine-side: after a z-ordered write, per-file min/max
    * spans are narrow in a AND b, so predicates on either column prune
    * files — a single-column sort clusters only itself (WritersSpec
    * measures both layouts via [[scanManifest]]). Pure shift/mask column
    * arithmetic — codegen'd, no UDF. */
  def zOrderValue(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column,
                  bits: Int = 16): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions._
    require(bits > 0 && bits <= 31, "bits must be in [1, 31]")
    (0 until bits).map { i =>
      val abit = shiftleft(shiftright(a.cast("long"), i).bitwiseAND(1L), 2 * i)
      val bbit = shiftleft(shiftright(b.cast("long"), i).bitwiseAND(1L), 2 * i + 1)
      abit.bitwiseOR(bbit)
    }.reduce(_.bitwiseOR(_))
  }

  /** Write `df` z-ordered on two bucketized columns: range-partition by
    * the interleaved z-value, sort within partitions, write parquet. */
  def writeZOrdered(df: DataFrame, path: String, colA: String, colB: String,
                    numFiles: Int, bits: Int = 16): Unit = {
    import org.apache.spark.sql.functions.col
    df.withColumn("__z", zOrderValue(col(colA), col(colB), bits))
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode("overwrite").parquet(path)
  }

  /** Per-file scan manifest: row count and min/max per audited column for
    * every file of a parquet table — the data-skipping audit ("are my
    * files actually clustered on the pruning column, or does every file
    * span the whole range?"). One scan, one hash aggregate keyed on
    * `input_file_name()`. At 100 TB prefer reading parquet footer
    * statistics (metadata-only) where the deployment allows; this
    * scan-based form is format-agnostic ground truth and doubles as a
    * stats-correctness check on writers. */
  def scanManifest(spark: org.apache.spark.sql.SparkSession, path: String,
                   auditCols: Seq[String]): DataFrame = {
    import org.apache.spark.sql.functions._
    val aggs = count(lit(1)).as("rows") +: auditCols.flatMap { c =>
      Seq(min(col(c)).as(s"min_$c"), max(col(c)).as(s"max_$c"))
    }
    spark.read.parquet(path)
      .groupBy(input_file_name().as("file"))
      .agg(aggs.head, aggs.tail: _*)
  }

  /** Small-file compaction — the standing maintenance job every
    * incrementally-written lake table needs: frequent small appends (K1
    * dynamic overwrites, streaming microbatches) accumulate files far below
    * the scan-efficient size, and at 100 TB the resulting task-per-tiny-file
    * scheduling + open() overhead dominates reads. Rewrites the table into
    * ⌈bytes / targetFileBytes⌉ files via a round-robin repartition (no
    * key skew — file sizes come out uniform), then swaps the directory in
    * via two renames. Returns (filesBefore, filesAfter). Data is
    * byte-identical by construction (same rows, recoded parquet).
    *
    * FLAT LAYOUTS ONLY: a Hive-partitioned table (season=.../ subdirs)
    * must be compacted per leaf partition — passing one here fails fast
    * rather than silently duplicating the partitioned data.
    *
    * Swap semantics (not fully atomic — plain directories can't be): the
    * old directory is renamed aside, the staging directory renamed in,
    * then the old one deleted. A crash at any point loses NOTHING (the
    * table survives under `path` or `path.compact.old`), and a concurrent
    * reader in the two-rename window fails loudly on a missing directory
    * instead of silently reading a half-deleted or doubled table. On a
    * real lake this is table-format work (OPTIMIZE) with snapshot
    * isolation; expressed here engine-side the same way the reference's
    * K1 overwrite is. */
  def compactFiles(spark: org.apache.spark.sql.SparkSession, path: String,
                   targetFileBytes: Long = 128L * 1024 * 1024): (Int, Int) = {
    val dir = new java.io.File(path)
    def listIn(d: java.io.File) = Option(d.listFiles()).getOrElse(Array.empty)
    val subdirs = listIn(dir).filter(f =>
      f.isDirectory && !f.getName.startsWith(".") && !f.getName.startsWith("_"))
    require(subdirs.isEmpty,
      s"compactFiles handles flat layouts only; $path has subdirectories " +
        s"(${subdirs.take(3).map(_.getName).mkString(", ")}…) — " +
        "compact each leaf partition directory instead")
    def parquetFiles = listIn(dir)
      .filter(f => f.isFile && f.getName.endsWith(".parquet"))
    val before = parquetFiles
    val totalBytes = before.map(_.length()).sum
    val nOut = math.max(1, math.ceil(totalBytes.toDouble / targetFileBytes).toInt)
    val tmp = path.stripSuffix("/") + ".compact.tmp"
    spark.read.parquet(path).repartition(nOut)
      .write.mode("overwrite").parquet(tmp)
    // swap: old dir aside, staging in, then drop the old copy
    val old = new java.io.File(path.stripSuffix("/") + ".compact.old")
    def rmRec(f: java.io.File): Unit = {
      Option(f.listFiles()).getOrElse(Array.empty).foreach(rmRec)
      f.delete(): Unit
    }
    rmRec(old) // clear any debris from a previous crashed swap
    java.nio.file.Files.move(dir.toPath, old.toPath)
    java.nio.file.Files.move(new java.io.File(tmp).toPath, dir.toPath)
    rmRec(old)
    (before.length, parquetFiles.length)
  }

  /** General-column front door to the z-ordered write: [[writeZOrdered]]
    * needs its two columns already bucketized to small non-negative ints;
    * this variant takes ANY ≥2 numeric columns, quantizes each to `bits`
    * levels engine-side, and z-orders on the interleaved levels.
    *
    * Construction (all engine-side, one pass + the write):
    *  1. per-column min/max from ONE aggregate (a config-sized row,
    *     broadcast — nothing corpus-sized reaches the driver);
    *  2. each column linearly quantized to `bits` (default 8) levels via
    *     `width_bucket` — min/max scaling is the classic cheap variant;
    *     heavily-skewed columns get fewer effective levels (the documented
    *     trade; quantile boundaries would cost a percentile pass);
    *  3. bit-interleave the quantized levels into one long z-value
    *     (codegen'd shift/or expression, no UDF — the n-ary form of
    *     [[zOrderValue]]);
    *  4. `repartitionByRange(targetFiles, z)` + in-partition sort on z,
    *     so file boundaries cut the curve into contiguous segments.
    * Nulls sort first (bucket 0). At 100 TB the range partitioner samples
    * z-values instead of sorting globally — the same one-shuffle cost as
    * any clustered write. */
  def writeZOrderedQuantized(df: DataFrame, path: String, zCols: Seq[String],
                             targetFiles: Int, bits: Int = 8): Unit = {
    import org.apache.spark.sql.functions._
    require(zCols.size >= 2, "z-ordering needs >= 2 columns (else just sort)")
    require(zCols.size * bits <= 62, "z-value must fit a long")
    val levels = 1 << bits
    val mmCols = zCols.flatMap(c => Seq(
      min(col(c)).cast("double").as(s"__mn_$c"),
      max(col(c)).cast("double").as(s"__mx_$c")))
    val mm = df.agg(mmCols.head, mmCols.tail: _*)
    val withStats = df.crossJoin(broadcast(mm))
    val buckets = zCols.map { c =>
      // width_bucket(v, mn, mx, n) ∈ [1, n+1]; clamp to [0, levels-1].
      // Degenerate mn == mx (constant column) → bucket 0 everywhere.
      val b = when(col(c).isNull || col(s"__mn_$c") === col(s"__mx_$c"), lit(0L))
        .otherwise(least(
          expr(s"width_bucket(CAST(`$c` AS DOUBLE), `__mn_$c`, `__mx_$c`, ${levels})") - 1L,
          lit(levels - 1L)))
      b.cast("long")
    }
    val n = zCols.size
    val z = (0 until bits).flatMap { b =>
      buckets.zipWithIndex.map { case (bk, i) =>
        shiftleft(shiftright(bk, b).bitwiseAND(lit(1L)), b * n + i)
      }
    }.reduce(_ bitwiseOR _)
    withStats.withColumn("__z", z)
      .repartitionByRange(targetFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop(("__z" +: zCols.flatMap(c => Seq(s"__mn_$c", s"__mx_$c"))): _*)
      .write.mode("overwrite").option("compression", "snappy").parquet(path)
  }
}
