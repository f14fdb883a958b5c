package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Principal-component decomposition of an embedding column — the
  * spectral member of the embedding-analytics family (q155 class
  * separation, q176 1-NN eval, q177 drift): "what single direction
  * explains most of the corpus variance", used for whitening checks,
  * anisotropy diagnostics (contextual embeddings collapse toward a
  * dominant direction), and cheap 1-D visualization/bucketing.
  *
  * Scale shape — the part that matters at 100 TB: the covariance (gram)
  * matrix of a d-dim embedding column is a d²-sized SUMMARY computed in
  * ONE pass with per-partition combine: each partition folds its rows
  * into a local upper-triangle accumulator (d(d+1)/2 longs), emits it
  * once, and a (i,j)-grain aggregate of #partitions · d² tiny rows
  * finishes the job — the corpus itself never shuffles (the
  * RowMatrix-gramian shape, built here on mapPartitions + one
  * cell-grain aggregate). Everything downstream (power iteration on the
  * d×d matrix) is config-sized driver math — the corrMatrix/centroid
  * precedent: state that reaches the driver is O(d²), never O(n).
  * Projections are a broadcast-v map-only pass.
  *
  * Determinism (the oracle replays every stage): all floating sums are
  * SCALED-LONG sums — each term is floor(x·10^s + 0.5) as a long, and
  * longs add exactly in any order, so partition layout can never shift a
  * bit. The power iteration renormalizes through the same grid
  * (floor-scale per matrix-vector term, long sums, IEEE sqrt/divide —
  * identical in DuckDB), so a chained-CTE oracle steps it bitwise. */
object Decomposition {

  /** Fixed-point grid helpers — must mirror the SQL
    * `floor(x * 10^s + 0.5)` exactly. */
  private def gridL(x: Double, p: Double): Long =
    math.floor(x * p + 0.5).toLong

  /** Per-dimension means of `vecCol` (array<float/double>) on the
    * 10^-scale grid: m_i = dround(Σ floor(x·p+.5) / p / n, scale).
    * Returns (means, n). Driver state: d doubles. */
  def dimMeans(vecs: DataFrame, vecCol: String, scale: Int)
  : (Array[Double], Long) = {
    val p = math.pow(10, scale)
    val rows = vecs
      .select(posexplode(col(vecCol).cast("array<double>")).as(Seq("i", "x")))
      .select(col("i"),
        floor(col("x") * p + 0.5).cast("long").as("sx"))
      .groupBy("i")
      .agg(sum("sx").as("s"), count(lit(1)).as("cnt"))
      .collect()
    val d = rows.length
    val n = rows.head.getLong(2)
    val m = new Array[Double](d)
    rows.foreach { r =>
      val mean = r.getLong(1) / p / n
      m(r.getInt(0)) = gridL(mean, p) / p
    }
    (m, n)
  }

  /** One-pass upper-triangle gram of the CENTERED vectors: per partition
    * a d(d+1)/2 long accumulator of floor(c_i·c_j·p + .5) terms, then a
    * cell-grain aggregate. Returns (i, j, s) with i ≤ j and s the exact
    * scaled-long sum. The corpus never shuffles — only
    * #partitions · d²/2 accumulator rows do. */
  def gramUpper(vecs: DataFrame, vecCol: String, means: Array[Double],
                scale: Int): DataFrame = {
    val spark = vecs.sparkSession
    import spark.implicits._
    val d = means.length
    val p = math.pow(10, scale)
    val bm = spark.sparkContext.broadcast(means)
    vecs.select(col(vecCol).cast("array<double>").as("v")).as[Seq[Double]]
      .mapPartitions { it =>
        val m = bm.value
        val acc = new Array[Long](d * (d + 1) / 2)
        val c = new Array[Double](d)
        var any = false
        it.foreach { v =>
          any = true
          var i = 0
          while (i < d) { c(i) = v(i) - m(i); i += 1 }
          var k = 0
          i = 0
          while (i < d) {
            var j = i
            while (j < d) {
              acc(k) += gridL(c(i) * c(j), p)
              k += 1; j += 1
            }
            i += 1
          }
        }
        if (!any) Iterator.empty
        else {
          var k = -1
          for { i <- (0 until d).iterator; j <- (i until d).iterator }
            yield { k += 1; (i, j, acc(k)) }
        }
      }
      .toDF("i", "j", "partial")
      .groupBy("i", "j").agg(sum("partial").as("s"))
  }

  /** Grid-deterministic power iteration on the dense symmetric `cov`
    * (driver-side, d×d config-sized). Each round: w = C·v with per-term
    * grid rounding and exact long sums; norm = sqrt(Σ floor(w²·p+.5)/p);
    * v = floor(w/norm·p+.5)/p. Returns (v, λ) where λ is the last norm
    * (the Rayleigh-quotient estimate of the top eigenvalue). */
  def powerIteration(cov: Array[Array[Double]], iters: Int, scale: Int)
  : (Array[Double], Double) = {
    val d = cov.length
    val p = math.pow(10, scale)
    var v = Array.fill(d)(1.0)
    var lambda = 0.0
    var it = 0
    while (it < iters) {
      val w = new Array[Double](d)
      var i = 0
      while (i < d) {
        var s = 0L
        var j = 0
        while (j < d) { s += gridL(cov(i)(j) * v(j), p); j += 1 }
        w(i) = s / p
        i += 1
      }
      var sq = 0L
      i = 0
      while (i < d) { sq += gridL(w(i) * w(i), p); i += 1 }
      val norm = math.sqrt(sq / p)
      lambda = norm
      val nv = new Array[Double](d)
      i = 0
      while (i < d) { nv(i) = gridL(w(i) / norm, p) / p; i += 1 }
      v = nv
      it += 1
    }
    (v, lambda)
  }

  /** End-to-end PC1 report: per-label projection statistics onto the top
    * principal direction plus the global explained-variance share.
    * Output: (label, n, mean_proj, min_proj, max_proj, ev_ratio),
    * `scale`-grid means at 6dp for the report columns.
    *
    * Stages: means (one aggregate) → gram (one-pass partial combine) →
    * driver power iteration (`iters` rounds) → broadcast-v map-only
    * projection + label-grain aggregate. */
  def pc1Report(vecs: DataFrame, vecCol: String, labelCol: String,
                iters: Int, scale: Int): DataFrame = {
    val spark = vecs.sparkSession
    import spark.implicits._
    val p = math.pow(10, scale)
    val (means, n) = dimMeans(vecs, vecCol, scale)
    val d = means.length
    val gram = gramUpper(vecs, vecCol, means, scale).collect()
    val cov = Array.ofDim[Double](d, d)
    gram.foreach { r =>
      val (i, j, s) = (r.getInt(0), r.getInt(1), r.getLong(2))
      val c = gridL(s / p / (n - 1), p) / p
      cov(i)(j) = c
      cov(j)(i) = c
    }
    val (v, lambda) = powerIteration(cov, iters, scale)
    var tr = 0L
    var i = 0
    while (i < d) { tr += gridL(cov(i)(i), p); i += 1 }
    val evRatio = gridL(lambda / (tr / p), 1e6) / 1e6
    val bm = spark.sparkContext.broadcast(means)
    val bv = spark.sparkContext.broadcast(v)
    val projected = vecs
      .select(col(labelCol).cast("long").as("label"),
        col(vecCol).cast("array<double>").as("v"))
      .as[(Long, Seq[Double])]
      .mapPartitions { rows =>
        val m = bm.value
        val vv = bv.value
        rows.map { case (lab, x) =>
          var s = 0L
          var k = 0
          while (k < d) { s += gridL((x(k) - m(k)) * vv(k), p); k += 1 }
          (lab, s)
        }
      }
      .toDF("label", "sp")
    projected.groupBy("label")
      .agg(count(lit(1)).as("n"), sum("sp").as("ssp"),
        min("sp").as("minsp"), max("sp").as("maxsp"))
      .select(col("label"), col("n"),
        graft.queries.Qutil.dround(col("ssp") / p / col("n"), 6)
          .as("mean_proj"),
        (col("minsp") / p).as("min_proj"),
        (col("maxsp") / p).as("max_proj"),
        lit(evRatio).as("ev_ratio"))
  }
}
