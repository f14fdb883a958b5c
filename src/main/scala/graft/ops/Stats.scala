package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distribution fitting and standardisation (SURVEY.md §2.6 A4/A5, §2.8 C11).
  *
  * The reference computes group mean/std in pandas (sample std, ddof=1,
  * LOADERS/GOLD-data-loader.py:446-448) on one path and scipy zscore
  * (population, ddof=0, DEPRECATED/statsbomb-gold-temp-v2.py:141-143) on
  * another; the engine parameterises ddof and defaults to the live (sample)
  * path (SURVEY.md §7.4 item 1).
  */
object Stats {

  sealed trait Ddof
  case object Sample extends Ddof      // pandas default, ddof=1 — live gold path
  case object Population extends Ddof  // scipy zscore, ddof=0 — deprecated path

  private def stdFn(ddof: Ddof): Column => Column = ddof match {
    case Sample     => stddev_samp
    case Population => stddev_pop
  }

  /** A4 — per-group mean and std for a set of stat columns; one hash
    * aggregate, map-side partials, no window. Output columns are
    * `<stat>_mean` / `<stat>_std`. */
  def groupStats(df: DataFrame, keys: Seq[String], stats: Seq[String],
                 ddof: Ddof = Sample): DataFrame = {
    val aggs = stats.flatMap { s =>
      Seq(avg(col(s)).as(s + "_mean"), stdFn(ddof)(col(s)).as(s + "_std"))
    }
    df.groupBy(keys.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }

  /** C11 — z-score transform with the reference's exact null semantics
    * (LOADERS/GOLD-data-loader.py:219-234,465-469):
    * null stat → 0 (mean-impute in z-space), zero-variance group → 0.
    * Adds `zs_<stat>` per input stat; computed with window aggregates so the
    * stat columns shuffle once on the group keys.
    */
  def zscore(df: DataFrame, keys: Seq[String], stats: Seq[String],
             ddof: Ddof = Sample, prefix: String = "zs_"): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*)
    val zcols = stats.map { s =>
      val mean = avg(col(s)).over(w)
      val sd = stdFn(ddof)(col(s)).over(w)
      val z = when(sd.isNull || sd === 0d, lit(0d))
        .otherwise((col(s) - mean) / sd)
      coalesce(z, lit(0d)).as(prefix + s)
    }
    df.select((df.columns.map(col).toIndexedSeq ++ zcols): _*)
  }

  /** Quantile discretization (feature binning), fit→transform style: fit
    * per-key boundary quantiles (exact `percentile`, 6dp-rounded onto the
    * cross-engine grid), join the key-grain boundary table back onto the
    * stream, and assign bin = #boundaries strictly below the value. One
    * aggregate + one join (same shape as zscore's fit+apply). The join is
    * deliberately un-hinted: boundary tables are usually tiny and AQE
    * broadcasts them, but a 100 TB input with a high-cardinality key can
    * make the fit table data-sized — an unconditional broadcast hint here
    * is the dedupCorpus-class OOM the round-2 review flagged. Appends a
    * `bin` column in [0, probs.size]. */
  def quantileBins(df: DataFrame, keys: Seq[String], valueCol: String,
                   probs: Seq[Double]): DataFrame = {
    require(probs.nonEmpty && probs == probs.sorted, "probs must be ascending")
    val bCols = probs.indices.map(i => s"__b$i")
    val aggs = probs.zip(bCols).map { case (p, b) =>
      graft.queries.Qutil.dround(expr(s"percentile($valueCol, $p)"), 6).as(b)
    }
    val fit = df.groupBy(keys.map(col): _*).agg(aggs.head, aggs.tail: _*)
    val bin = bCols.map(b => when(col(valueCol) > col(b), 1L).otherwise(0L))
      .reduce(_ + _)
    df.join(fit, keys)
      .withColumn("bin", bin)
      .drop(bCols: _*)
  }

  /** Robust per-group outlier profile: median, MAD (median absolute
    * deviation), and the count of rows with |x − median| > k·MAD — the
    * data-cleaning screen that, unlike the z-score (A5/C11), is not itself
    * dragged by the outliers it hunts (mean and std both move with a heavy
    * tail; the median/MAD pair has a 50% breakdown point — Hampel's
    * identifier). Two fit aggregates (median, then MAD over the deviation
    * join) + one counting pass, all on the zscore/quantileBins fit+apply
    * shape with group-cardinality-sized un-hinted fit tables.
    *
    * Exact `percentile` sorts each group — contractual here so the DuckDB
    * oracle (quantile_cont) reproduces it bit-for-bit; the 100 TB dial is
    * the same as q55's: swap in approx_percentile (or the fixed-grid
    * histogram quantile, q56) when the screen doesn't need to be exact.
    * No consistency constant (1.4826) is applied — k is in MAD units. */
  def robustOutliers(df: DataFrame, keys: Seq[String], valueCol: String,
                     k: Double): DataFrame = {
    val med = df.groupBy(keys.map(col): _*)
      .agg(expr(s"percentile($valueCol, 0.5)").as("med"))
    val dev = df.join(med, keys)
      .withColumn("__ad", abs(col(valueCol) - col("med")))
    val mad = dev.groupBy(keys.map(col): _*)
      .agg(expr("percentile(__ad, 0.5)").as("mad"))
    dev.join(mad, keys)
      .groupBy(keys.map(col): _*)
      .agg(max(col("med")).as("med"), max(col("mad")).as("mad"),
        sum(when(col("__ad") > lit(k) * col("mad"), 1L).otherwise(0L))
          .as("n_outliers"))
  }

  /** Per-group winsorization: clip `valueCol` to its group's [pLo, pHi]
    * exact percentiles — the tail-taming cleaner that KEEPS rows
    * ([[robustOutliers]] flags them, quantileBins ranks them). Same
    * fit+apply shape: one exact-percentile fit aggregate, an un-hinted
    * group-key join, then a map-only clip. Boundaries round to the 6dp
    * grid BEFORE comparing, so clip decisions are engine-exact (the
    * quantileBins discipline). Appends `clipped` plus `clip_lo`/`clip_hi`
    * flags. */
  def winsorize(df: DataFrame, keys: Seq[String], valueCol: String,
                pLo: Double, pHi: Double): DataFrame = {
    require(pLo < pHi, "pLo must be < pHi")
    val fit = df.groupBy(keys.map(col): _*).agg(
      graft.queries.Qutil.dround(expr(s"percentile($valueCol, $pLo)"), 6).as("__lo"),
      graft.queries.Qutil.dround(expr(s"percentile($valueCol, $pHi)"), 6).as("__hi"))
    df.join(fit, keys)
      .withColumn("clip_lo", col(valueCol) < col("__lo"))
      .withColumn("clip_hi", col(valueCol) > col("__hi"))
      .withColumn("clipped",
        when(col("clip_lo"), col("__lo"))
          .when(col("clip_hi"), col("__hi"))
          .otherwise(col(valueCol)))
      .drop("__lo", "__hi")
  }

  /** Pairwise Pearson correlations over `cols` in ONE scan: every moment
    * (Σx, Σx², Σxy, n) is a term in a single shared aggregate — the
    * textbook single-pass formulation
    *   corr = (n·Σxy − Σx·Σy) / (√(n·Σx² − (Σx)²) · √(n·Σy² − (Σy)²))
    * — versus Spark's `corr()` which covers one pair per call and would
    * re-scan a 100 TB table per pair. NULL convention: pairwise-complete —
    * every pair's moments (INCLUDING its n) are conditioned on BOTH
    * columns being non-null, so a NULL in column c drops the row from
    * c's pairs only. Conditioning n the same way as the sums is what
    * keeps the moments mutually consistent; a global count(*) n with
    * null-skipping sums is wrong under every convention the moment any
    * input is NULL (StatsSpec pins a NULL-bearing case against a hand
    * computation). Terms are cast to exact DECIMAL before summing (the
    * Qutil msum rule: money-grade inputs have bounded decimal places, so
    * the sums are order-independent and engine-exact); the final
    * arithmetic runs on identical doubles in any engine. Output: one row
    * per unordered pair (var_a < var_b): (var_a, var_b, n, corr).
    *
    * Width bound (round-5 advisory): the shared aggregate emits
    * 6·C(p,2) expressions — O(p²) in column count — and somewhere past
    * ~1500 expressions codegen splits degrade and eventually fall back to
    * interpreted mode. Past [[MaxPairsPerAgg]] pairs (p ≈ 23) the
    * computation therefore CHUNKS: the input is persisted once, each
    * ≤MaxPairsPerAgg block of pairs aggregates over the cached scan, and
    * the per-block single-row results assemble into a local frame (a
    * correlation matrix is p²-sized — driver-sized by definition, so the
    * eager per-block actions are the honest cost, not a scaling hazard).
    * The p ≤ 23 path — every current caller — is byte-identical to the
    * single-Aggregate plan (StatsCorrSpec pins wide ≡ narrow results).
    */
  val MaxPairsPerAgg = 256
  def corrMatrix(df0: DataFrame, cols: Seq[String],
                 scale: Int = 6): DataFrame = {
    require(cols.size >= 2, "need at least two columns")
    // k(k+1)/2·6 decimal accumulators per input row is heavy per-row CPU
    // fused into the scan stage — an under-split scan serializes the whole
    // partial-aggregate pass (guide §2.5; measured 4.05 → 0.99 s at sf0.1
    // once the single-file lineitem scan stopped running as one task)
    val df = graft.io.Tables.spreadDf(df0)
    import org.apache.spark.sql.types.DecimalType
    val dec = DecimalType(38, scale)
    val pairs = for {
      i <- cols.indices; j <- (i + 1) until cols.size
    } yield (cols(i), cols(j))
    // 6 terms per pair instead of 2 per column + 1 per pair — the price of
    // pairwise-complete correctness; one Aggregate per ≤MaxPairsPerAgg block
    def aggsFor(ps: Seq[(String, String)]) = ps.flatMap { case (a, b) =>
      val m = col(a).isNotNull && col(b).isNotNull
      def s(c: Column) = sum(when(m, c).cast(dec)).cast("double")
      Seq(sum(when(m, 1L)).as(s"__n_${a}_$b"),
        s(col(a)).as(s"__sa_${a}_$b"), s(col(b)).as(s"__sb_${a}_$b"),
        s(col(a) * col(a)).as(s"__qa_${a}_$b"),
        s(col(b) * col(b)).as(s"__qb_${a}_$b"),
        s(col(a) * col(b)).as(s"__p_${a}_$b"))
    }
    // long form via explode over the ONE moments row — a union of
    // per-pair selects would re-execute the aggregate (re-scan) per pair
    def structsFor(ps: Seq[(String, String)]) = ps.map { case (a, b) =>
      val n = coalesce(col(s"__n_${a}_$b"), lit(0L)).cast("double")
      val (sa, sb) = (col(s"__sa_${a}_$b"), col(s"__sb_${a}_$b"))
      val (qa, qb) = (col(s"__qa_${a}_$b"), col(s"__qb_${a}_$b"))
      val corr = (n * col(s"__p_${a}_$b") - sa * sb) /
        (sqrt(n * qa - sa * sa) * sqrt(n * qb - sb * sb))
      struct(lit(a).as("var_a"), lit(b).as("var_b"),
        coalesce(col(s"__n_${a}_$b"), lit(0L)).as("n"),
        graft.queries.Qutil.dround(corr, 6).as("corr"))
    }
    def block(src: DataFrame, ps: Seq[(String, String)]): DataFrame =
      src.agg(aggsFor(ps).head, aggsFor(ps).tail: _*)
        .select(explode(array(structsFor(ps): _*)).as("r")).select("r.*")
    if (pairs.size <= MaxPairsPerAgg) block(df, pairs)
    else {
      val cached = df.persist()
      try {
        val blocks = pairs.grouped(MaxPairsPerAgg).toSeq
        val schema = block(cached, blocks.head).schema
        val rows = blocks.flatMap(ps => block(cached, ps).collect())
        import scala.jdk.CollectionConverters._
        df.sparkSession.createDataFrame(rows.asJava, schema)
      } finally cached.unpersist(): Unit
    }
  }

  /** C10 — flip the sign of configured inverse stats (turnovers, fouls…)
    * after z-scoring (LOADERS/GOLD-data-loader.py:325-326,470-471). */
  def invertStats(df: DataFrame, inverse: Seq[String]): DataFrame = {
    val inv = inverse.toSet
    df.select(df.columns.map { c =>
      if (inv(c)) (col(c) * -1d).as(c) else col(c)
    }: _*)
  }

  /** Largest-remainder (Hamilton) apportionment: split an integer
    * `budget` across keys proportionally to `weightCol`, exactly —
    * allocations are integers that SUM TO THE BUDGET, the property
    * naive per-key rounding loses (budget shares, sampling quotas,
    * shard capacities all need it). Each key gets ⌊budget·w/total⌋;
    * the unassigned remainder units (< #keys of them) go to the largest
    * fractional remainders, ties broken by the key's sort order.
    *
    * Operates on the KEY grain — callers aggregate the fact table
    * first, so the windows here sort a group-cardinality frame, not
    * rows. Weights must be exact (decimal-summed) for cross-engine
    * determinism; quota arithmetic is fixed-shape IEEE.
    * Returns (key, weight, alloc). */
  def largestRemainder(grain: DataFrame, keyCol: String, weightCol: String,
                       budget: Long): DataFrame = {
    val w = Window.orderBy(
      (col("__q") - floor(col("__q"))).desc, col(keyCol).asc)
    // decimal total: the weights are grain-level exact values (≤6dp);
    // a double sum would drift by partition order across engines
    val tot = grain.agg(
      sum(col(weightCol).cast(org.apache.spark.sql.types.DecimalType(38, 6)))
        .cast("double").as("__tot"))
    grain.crossJoin(broadcast(tot))
      .withColumn("__q",
        lit(budget.toDouble) * col(weightCol).cast("double") / col("__tot"))
      .withColumn("__base", floor(col("__q")).cast("long"))
      .withColumn("__rank", row_number().over(w).cast("long"))
      .withColumn("__left",
        lit(budget) - sum(col("__base")).over(
          Window.rowsBetween(Window.unboundedPreceding,
            Window.unboundedFollowing)))
      .select(col(keyCol), col(weightCol),
        (col("__base") +
          when(col("__rank") <= col("__left"), 1L).otherwise(0L))
          .as("alloc"))
  }
}
