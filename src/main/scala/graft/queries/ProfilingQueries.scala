package graft.queries

import org.apache.spark.sql.functions._
import graft.io.Tables
import graft.ops.Profiling

/** Data-quality profiling (A9/A10) and string-cleanup scalar surface
  * (C2/C3/C4) as oracle-checked queries.
  */
object ProfilingQueries {

  private val profCols = Seq("l_discount", "l_tax", "l_quantity")

  /** 0..9 bucket spine for grid joins (q177). */
  private def spark_buckets(s: org.apache.spark.sql.SparkSession) = {
    import s.implicits._
    (0L to 9L).toDF("bucket")
  }

  val all: Seq[Q] = Seq(

    // A10 — per-column null/zero percentages in one pass.
    Q.sql("q31_null_zero_profile",
      profCols.sorted.map { c =>
        s"""SELECT '$c' AS col_name,
           |       avg(CASE WHEN $c IS NULL THEN 1.0 ELSE 0.0 END) AS null_pct,
           |       avg(CASE WHEN $c = 0 THEN 1.0 ELSE 0.0 END) AS zero_pct
           |FROM lineitem""".stripMargin
      }.mkString("", "\nUNION ALL\n", "\nORDER BY col_name")) { (s, d) =>
      Profiling.nullZeroProfile(Tables.lineitem(s, d), profCols)
        .select(col("column").as("col_name"), col("null_pct"), col("zero_pct"))
        .orderBy("col_name")
    },

    // C2/C3/C4 — split/translate/regexp string cleanup on dimension strings.
    Q.sql("q32_string_clean",
      """SELECT p_partkey,
        |       split_part(p_name, ' ', 2) AS noun,
        |       upper(p_type) AS type_uc,
        |       translate(p_brand, '#', '-') AS brand_norm,
        |       CAST(regexp_extract(p_brand, 'Brand#(\d+)', 1) AS INTEGER) AS brand_num
        |FROM part ORDER BY p_partkey""".stripMargin) { (s, d) =>
      Tables.part(s, d).select(
          col("p_partkey"),
          element_at(split(col("p_name"), " "), 2).as("noun"),
          upper(col("p_type")).as("type_uc"),
          translate(col("p_brand"), "#", "-").as("brand_norm"),
          regexp_extract(col("p_brand"), "Brand#(\\d+)", 1).cast("int").as("brand_num"))
        .orderBy("p_partkey")
    },

    // Declarative data-quality expectations (ops.Expectations): all
    // row-local checks share ONE aggregate pass; uniqueness runs as its own
    // two-level distinct (A6 Expand-avoidance). The range check is tuned to
    // fail (uniform totalprice ⇒ ~60% in-band < 0.9 threshold) so the
    // passed flag is exercised both ways.
    Q.sql("q78_dq_report",
      """WITH m AS (
        |  SELECT count(*) AS n,
        |         sum(CASE WHEN o_custkey IS NOT NULL THEN 1 ELSE 0 END) AS c0,
        |         sum(CASE WHEN o_totalprice >= 1000 AND o_totalprice <= 300000
        |                  THEN 1 ELSE 0 END) AS c1,
        |         sum(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH','3-MEDIUM',
        |                                           '4-NOT SPECIFIED','5-LOW')
        |                  THEN 1 ELSE 0 END) AS c2
        |  FROM orders),
        |u AS (SELECT count(DISTINCT o_orderkey) AS d0 FROM orders)
        |SELECT expectation, value, threshold, passed, n FROM (
        |  SELECT 'completeness(o_custkey)' AS expectation,
        |         floor(CAST(c0 AS DOUBLE) / n * 1000000 + 0.5) / 1000000 AS value,
        |         CAST(1.0 AS DOUBLE) AS threshold,
        |         floor(CAST(c0 AS DOUBLE) / n * 1000000 + 0.5) / 1000000 >= 1.0 AS passed,
        |         n FROM m
        |  UNION ALL
        |  SELECT 'in_range(o_totalprice)',
        |         floor(CAST(c1 AS DOUBLE) / n * 1000000 + 0.5) / 1000000,
        |         CAST(0.9 AS DOUBLE),
        |         floor(CAST(c1 AS DOUBLE) / n * 1000000 + 0.5) / 1000000 >= 0.9,
        |         n FROM m
        |  UNION ALL
        |  SELECT 'in_set(o_orderpriority)',
        |         floor(CAST(c2 AS DOUBLE) / n * 1000000 + 0.5) / 1000000,
        |         CAST(1.0 AS DOUBLE),
        |         floor(CAST(c2 AS DOUBLE) / n * 1000000 + 0.5) / 1000000 >= 1.0,
        |         n FROM m
        |  UNION ALL
        |  SELECT 'uniqueness(o_orderkey)',
        |         floor(CAST(d0 AS DOUBLE) / n * 1000000 + 0.5) / 1000000,
        |         CAST(1.0 AS DOUBLE),
        |         floor(CAST(d0 AS DOUBLE) / n * 1000000 + 0.5) / 1000000 >= 1.0,
        |         n FROM m CROSS JOIN u)
        |ORDER BY expectation""".stripMargin) { (s, d) =>
      import graft.ops.Expectations._
      report(Tables.orders(s, d), Seq(
          Completeness("o_custkey"),
          InRange("o_totalprice", 1000, 300000, threshold = 0.9),
          InSet("o_orderpriority", Seq("1-URGENT", "2-HIGH", "3-MEDIUM",
            "4-NOT SPECIFIED", "5-LOW")),
          Uniqueness(Seq("o_orderkey"))))
        .orderBy("expectation")
    },

    // Robust per-group outlier screen (Stats.robustOutliers): median + MAD
    // + Hampel count at k = 3 MAD units — the data-cleaning complement to
    // the z-score (q05), immune to the heavy tail it hunts (50% breakdown
    // point vs the mean/std's 0%). Exact interpolating percentile on both
    // engines (Spark `percentile` ≡ DuckDB `quantile_cont`), so the oracle
    // replays medians, deviations, and the strict-> threshold bit-for-bit.
    Q.sql("q124_robust_outliers",
      """WITH med AS (
        |  SELECT event_type, median(value) AS med FROM events GROUP BY 1),
        |dev AS (
        |  SELECT e.event_type, e.value, m.med, abs(e.value - m.med) AS ad
        |  FROM events e JOIN med m ON m.event_type = e.event_type),
        |mad AS (SELECT event_type, median(ad) AS mad FROM dev GROUP BY 1)
        |SELECT d.event_type,
        |       floor(min(d.med) * 1000000 + 0.5) / 1000000 AS med,
        |       floor(min(a.mad) * 1000000 + 0.5) / 1000000 AS mad,
        |       CAST(SUM(CASE WHEN d.ad > CAST(3 AS DOUBLE) * a.mad
        |                     THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
        |FROM dev d JOIN mad a ON a.event_type = d.event_type
        |GROUP BY 1 ORDER BY 1""".stripMargin) { (s, d) =>
      graft.ops.Stats.robustOutliers(
          Tables.events(s, d).select("event_type", "value"),
          Seq("event_type"), "value", k = 3.0)
        .select(col("event_type"),
          Qutil.dround(col("med"), 6).as("med"),
          Qutil.dround(col("mad"), 6).as("mad"),
          col("n_outliers"))
        .orderBy("event_type")
    },

    // Per-group winsorization (Stats.winsorize): values clip to their
    // group's 6dp-rounded [p05, p95]; the report pins counts on both
    // tails and the decimal sum of the clipped column — so a hash match
    // proves fit boundaries, clip decisions, and replacement values. The
    // tail-taming cleaner that KEEPS rows where q124 flags them.
    Q.sql("q131_winsorize",
      """WITH fit AS (
        |  SELECT event_type,
        |         floor(quantile_cont(value, 0.05) * 1000000 + 0.5) / 1000000 AS lo,
        |         floor(quantile_cont(value, 0.95) * 1000000 + 0.5) / 1000000 AS hi
        |  FROM events GROUP BY 1),
        |c AS (
        |  SELECT e.event_type, e.value < f.lo AS clip_lo,
        |         e.value > f.hi AS clip_hi,
        |         CASE WHEN e.value < f.lo THEN f.lo
        |              WHEN e.value > f.hi THEN f.hi
        |              ELSE e.value END AS clipped
        |  FROM events e JOIN fit f ON f.event_type = e.event_type)
        |SELECT event_type, count(*) AS n,
        |       CAST(SUM(CASE WHEN clip_lo THEN 1 ELSE 0 END) AS BIGINT) AS n_clip_lo,
        |       CAST(SUM(CASE WHEN clip_hi THEN 1 ELSE 0 END) AS BIGINT) AS n_clip_hi,
        |       CAST(SUM(CAST(clipped AS DECIMAL(18,6))) AS DOUBLE) AS clipped_sum
        |FROM c GROUP BY 1 ORDER BY 1""".stripMargin) { (s, d) =>
      graft.ops.Stats.winsorize(
          Tables.events(s, d).select("event_type", "value"),
          Seq("event_type"), "value", pLo = 0.05, pHi = 0.95)
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"),
          sum(when(col("clip_lo"), 1L).otherwise(0L)).as("n_clip_lo"),
          sum(when(col("clip_hi"), 1L).otherwise(0L)).as("n_clip_hi"),
          Qutil.msum(col("clipped"), 6).as("clipped_sum"))
        .orderBy("event_type")
    },

    // Referential-integrity audit (ops.Referential) — the cross-table half
    // of data quality: five FK constraints over the star schema, one
    // report row each with orphan key/row counts. The events.user_id →
    // customer constraint is genuinely violated in the synthetic data, so
    // the failing branch is exercised, not just compiled. Child sides are
    // compacted to their key grain before the anti-join probe.
    Q.sql("q151_referential_audit", {
      def one(name: String, child: String, ck: String,
              parent: String, pk: String): String =
        s"""SELECT '$name' AS fk,
           |       count(*) AS n_rows,
           |       count(DISTINCT c.k) AS n_keys,
           |       CAST(SUM(CASE WHEN p.pk IS NULL THEN 1 ELSE 0 END) AS BIGINT)
           |         AS n_orphan_rows,
           |       count(DISTINCT CASE WHEN p.pk IS NULL THEN c.k END)
           |         AS n_orphan_keys,
           |       CASE WHEN count(DISTINCT CASE WHEN p.pk IS NULL THEN c.k END) = 0
           |            THEN 1 ELSE 0 END AS ok
           |FROM (SELECT $ck AS k FROM $child WHERE $ck IS NOT NULL) c
           |LEFT JOIN (SELECT DISTINCT $pk AS pk FROM $parent) p ON c.k = p.pk""".stripMargin
      Seq(
        one("events.user_id->customer", "events", "user_id", "customer", "c_custkey"),
        one("lineitem.l_orderkey->orders", "lineitem", "l_orderkey", "orders", "o_orderkey"),
        one("lineitem.l_partkey->part", "lineitem", "l_partkey", "part", "p_partkey"),
        one("lineitem.l_suppkey->supplier", "lineitem", "l_suppkey", "supplier", "s_suppkey"),
        one("orders.o_custkey->customer", "orders", "o_custkey", "customer", "c_custkey"))
        .mkString("SELECT * FROM (\n", "\nUNION ALL\n", "\n) ORDER BY fk")
    }) { (s, d) =>
      import graft.ops.Referential._
      audit(Seq(
          Fk("events.user_id->customer", Tables.events(s, d), "user_id",
            Tables.customer(s, d), "c_custkey"),
          Fk("lineitem.l_orderkey->orders", Tables.lineitem(s, d), "l_orderkey",
            Tables.orders(s, d), "o_orderkey"),
          Fk("lineitem.l_partkey->part", Tables.lineitem(s, d), "l_partkey",
            Tables.part(s, d), "p_partkey"),
          Fk("lineitem.l_suppkey->supplier", Tables.lineitem(s, d), "l_suppkey",
            Tables.supplier(s, d), "s_suppkey"),
          Fk("orders.o_custkey->customer", Tables.orders(s, d), "o_custkey",
            Tables.customer(s, d), "c_custkey")))
        .orderBy("fk")
    },

    // Mutual information between event_type and the value decile — the
    // feature-dependency screen (does this categorical predict that
    // numeric?). One contingency aggregate; marginals re-aggregate off it;
    // each p·ln term is 9dp-grid-quantized before the decimal sum (the
    // q134 ln discipline), so MI is engine-exact at 6dp.
    Q.sql("q163_mi_screen",
      """WITH cells AS (
        |  SELECT event_type AS a,
        |         least(CAST(floor(value / 50) AS BIGINT), 9) AS b,
        |         count(*) AS nij
        |  FROM events GROUP BY 1, 2),
        |ma AS (SELECT a, CAST(SUM(nij) AS BIGINT) AS ni FROM cells GROUP BY 1),
        |mb AS (SELECT b, CAST(SUM(nij) AS BIGINT) AS nj FROM cells GROUP BY 1),
        |n AS (SELECT CAST(SUM(nij) AS BIGINT) AS n FROM cells),
        |terms AS (
        |  SELECT floor(CAST(c.nij AS DOUBLE) / n.n
        |               * ln(CAST(c.nij AS DOUBLE) * n.n / (ma.ni * mb.nj))
        |               * 1e9 + 0.5) / 1e9 AS t
        |  FROM cells c CROSS JOIN n
        |  JOIN ma ON ma.a = c.a JOIN mb ON mb.b = c.b)
        |SELECT (SELECT count(*) FROM cells) AS n_cells,
        |       (SELECT n FROM n) AS n,
        |       (SELECT floor(CAST(SUM(CAST(t AS DECIMAL(38,11))) AS DOUBLE)
        |                     * 1000000 + 0.5) / 1000000 FROM terms) AS mi""".stripMargin) { (s, d) =>
      val cells = Tables.events(s, d)
        .groupBy(col("event_type").as("a"),
          least(floor(col("value") / 50).cast("long"), lit(9L)).as("b"))
        .agg(count(lit(1)).as("nij"))
      val ma = cells.groupBy("a").agg(sum("nij").as("ni"))
      val mb = cells.groupBy("b").agg(sum("nij").as("nj"))
      val n = cells.agg(sum("nij").as("n"))
      val terms = cells.crossJoin(broadcast(n))
        .join(broadcast(ma), "a").join(broadcast(mb), "b")
        .select(Qutil.dround(
          col("nij").cast("double") / col("n") *
            log(col("nij").cast("double") * col("n") / (col("ni") * col("nj"))),
          9).as("t"))
      val nCells = cells.agg(count(lit(1)).as("n_cells"))
      val mi = terms.agg(Qutil.dround(
        sum(col("t").cast(org.apache.spark.sql.types.DecimalType(38, 11)))
          .cast("double"), 6).as("mi"))
      nCells.crossJoin(n).crossJoin(mi)
        .select(col("n_cells"), col("n"), col("mi"))
    },

    // Benford first-digit screen on order totals (the fraud/data-entry
    // anomaly staple): the leading digit of the cents integer equals the
    // leading digit of the price (×100 shifts the decimal point), so digit
    // extraction is exact string math — no log10 on data. Expected
    // frequencies are shared 12dp literals; chi² terms round at 6dp.
    Q.sql("q164_benford_screen", {
      val probs = (1 to 9).map(dg =>
        s"WHEN '$dg' THEN ${f"${math.log10(1 + 1.0 / dg)}%.12f"}")
        .mkString(" ")
      s"""WITH d AS (
         |  SELECT substr(CAST(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)
         |                     AS VARCHAR), 1, 1) AS digit
         |  FROM orders),
         |c AS (SELECT digit, count(*) AS n_obs FROM d GROUP BY 1),
         |n AS (SELECT CAST(SUM(n_obs) AS BIGINT) AS n FROM c)
         |SELECT digit, n_obs,
         |       floor((CASE digit $probs END) * n.n * 1000000 + 0.5) / 1000000
         |         AS expected_n,
         |       floor((n_obs - (CASE digit $probs END) * n.n)
         |             * (n_obs - (CASE digit $probs END) * n.n)
         |             / ((CASE digit $probs END) * n.n) * 1000000 + 0.5)
         |         / 1000000 AS chi2_term
         |FROM c CROSS JOIN n ORDER BY digit""".stripMargin
    }) { (s, d) =>
      val digit = substring(
        floor(col("o_totalprice") * 100 + 0.5).cast("long").cast("string"), 1, 1)
      val c = Tables.orders(s, d)
        .groupBy(digit.as("digit")).agg(count(lit(1)).as("n_obs"))
      val n = c.agg(sum("n_obs").cast("long").as("n"))
      val p = (1 to 9).foldLeft(lit(0.0)) { (els, dg) =>
        when(col("digit") === dg.toString,
          lit(f"${math.log10(1 + 1.0 / dg)}%.12f".toDouble)).otherwise(els)
      }
      val dev = col("n_obs") - p * col("n")
      c.crossJoin(broadcast(n))
        .select(col("digit"), col("n_obs"),
          Qutil.dround(p * col("n"), 6).as("expected_n"),
          Qutil.dround(dev * dev / (p * col("n")), 6).as("chi2_term"))
        .orderBy("digit")
    },

    // Theil–Sen robust trend on the daily-revenue series: the median of
    // all pairwise slopes (breakdown point 29% vs OLS's 0). The series is
    // COMPACTED to the day grain first, so the O(days²) pair space is
    // calendar-sized — config-sized frames end to end, which is also why
    // the global (unpartitioned) median windows here are fine: they sort
    // ~days² rows, not data. Exact median (avg of the middle one/two 9dp
    // slopes, deterministic ties) replays in DuckDB.
    Q.sql("q169_theil_sen",
      """WITH daily AS (
        |  SELECT CAST(ts AS DATE) - DATE '1970-01-01' AS day,
        |         CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS y
        |  FROM events GROUP BY 1),
        |p AS (
        |  SELECT a.day AS di, b.day AS dj,
        |         floor((b.y - a.y) / (b.day - a.day) * 1e9 + 0.5) / 1e9
        |           AS slope
        |  FROM daily a JOIN daily b ON a.day < b.day),
        |pr AS (SELECT slope,
        |              row_number() OVER (ORDER BY slope, di, dj) AS rn
        |       FROM p),
        |m AS (SELECT count(*) AS m FROM p),
        |med AS (SELECT avg(slope) AS s FROM pr CROSS JOIN m
        |        WHERE rn IN ((m + 1) // 2, (m + 2) // 2)),
        |r AS (SELECT day,
        |             floor((y - med.s * day) * 1e9 + 0.5) / 1e9 AS resid
        |      FROM daily CROSS JOIN med),
        |rr AS (SELECT resid,
        |              row_number() OVER (ORDER BY resid, day) AS rn
        |       FROM r),
        |k AS (SELECT count(*) AS k FROM r),
        |imed AS (SELECT avg(resid) AS i FROM rr CROSS JOIN k
        |         WHERE rn IN ((k + 1) // 2, (k + 2) // 2))
        |SELECT (SELECT count(*) FROM daily) AS n_days,
        |       (SELECT m FROM m) AS n_pairs,
        |       (SELECT floor(s * 1e9 + 0.5) / 1e9 FROM med) AS ts_slope,
        |       (SELECT floor(i * 1e9 + 0.5) / 1e9 FROM imed) AS ts_intercept""".stripMargin) { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val daily = Tables.events(s, d)
        .groupBy(datediff(to_date(col("ts")), lit("1970-01-01").cast("date"))
          .as("day"))
        .agg(Qutil.msum(col("value"), 4).as("y"))
      val p = daily.as("a").join(daily.as("b"), col("a.day") < col("b.day"))
        .select(col("a.day").as("di"), col("b.day").as("dj"),
          Qutil.dround((col("b.y") - col("a.y")) /
            (col("b.day") - col("a.day")), 9).as("slope"))
      val m = p.agg(count(lit(1)).as("m"))
      val pr = p.withColumn("rn",
        row_number().over(Window.orderBy(col("slope"), col("di"), col("dj"))))
      val med = pr.crossJoin(broadcast(m))
        .where(col("rn") === expr("(m + 1) div 2") ||
          col("rn") === expr("(m + 2) div 2"))
        .agg(avg(col("slope")).as("s"))
      val r = daily.crossJoin(broadcast(med))
        .select(col("day"),
          Qutil.dround(col("y") - col("s") * col("day"), 9).as("resid"))
      val k = r.agg(count(lit(1)).as("k"))
      val rr = r.withColumn("rn",
        row_number().over(Window.orderBy(col("resid"), col("day"))))
      val imed = rr.crossJoin(broadcast(k))
        .where(col("rn") === expr("(k + 1) div 2") ||
          col("rn") === expr("(k + 2) div 2"))
        .agg(avg(col("resid")).as("i"))
      val nDays = daily.agg(count(lit(1)).as("n_days"))
      nDays.crossJoin(m).crossJoin(med).crossJoin(imed)
        .select(col("n_days"), col("m").as("n_pairs"),
          Qutil.dround(col("s"), 9).as("ts_slope"),
          Qutil.dround(col("i"), 9).as("ts_intercept"))
    },

    // Per-group OLS (closed form from exact moments): value-vs-day trend
    // per event_type — slope, intercept, r². ONE aggregate computes the
    // five moment sums as decimals of 6dp-grid terms (order-independent,
    // so DuckDB replays them exactly); the closed form is then identical
    // double arithmetic on identical inputs. The grouped complement of
    // q169's global robust fit.
    Q.sql("q172_grouped_ols",
      """WITH e AS (
        |  SELECT event_type,
        |         CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS DOUBLE) AS x,
        |         floor(value * 1000000 + 0.5) / 1000000 AS y
        |  FROM events),
        |mo AS (
        |  SELECT event_type, count(*) AS n,
        |         CAST(SUM(CAST(x AS DECIMAL(38,8))) AS DOUBLE) AS sx,
        |         CAST(SUM(CAST(y AS DECIMAL(38,8))) AS DOUBLE) AS sy,
        |         CAST(SUM(CAST(x * y AS DECIMAL(38,8))) AS DOUBLE) AS sxy,
        |         CAST(SUM(CAST(x * x AS DECIMAL(38,8))) AS DOUBLE) AS sxx,
        |         CAST(SUM(CAST(floor(y * y * 1000000 + 0.5) / 1000000
        |                       AS DECIMAL(38,8))) AS DOUBLE) AS syy
        |  FROM e GROUP BY 1),
        |f AS (
        |  SELECT event_type, n,
        |         (n * sxy - sx * sy) / (n * sxx - sx * sx) AS slope,
        |         sx, sy, sxy, sxx, syy
        |  FROM mo)
        |SELECT event_type, n,
        |       floor(slope * 1000000 + 0.5) / 1000000 AS slope,
        |       floor((sy - slope * sx) / n * 1000000 + 0.5) / 1000000
        |         AS intercept,
        |       floor((n * sxy - sx * sy) * (n * sxy - sx * sy)
        |             / ((n * sxx - sx * sx) * (n * syy - sy * sy))
        |             * 1000000 + 0.5) / 1000000 AS r2
        |FROM f ORDER BY 1""".stripMargin) { (s, d) =>
      import org.apache.spark.sql.types.DecimalType
      val x = datediff(to_date(col("ts")), lit("1970-01-01").cast("date"))
        .cast("double")
      val y = Qutil.dround(col("value"), 6)
      def dsum(c: org.apache.spark.sql.Column) =
        sum(c.cast(DecimalType(38, 8))).cast("double")
      val mo = Tables.events(s, d)
        .select(col("event_type"), x.as("x"), y.as("y"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"), dsum(col("x")).as("sx"),
          dsum(col("y")).as("sy"), dsum(col("x") * col("y")).as("sxy"),
          dsum(col("x") * col("x")).as("sxx"),
          dsum(Qutil.dround(col("y") * col("y"), 6)).as("syy"))
      val slope = (col("n") * col("sxy") - col("sx") * col("sy")) /
        (col("n") * col("sxx") - col("sx") * col("sx"))
      val num = col("n") * col("sxy") - col("sx") * col("sy")
      mo.withColumn("slope0", slope)
        .select(col("event_type"), col("n"),
          Qutil.dround(col("slope0"), 6).as("slope"),
          Qutil.dround((col("sy") - col("slope0") * col("sx")) / col("n"), 6)
            .as("intercept"),
          Qutil.dround(num * num /
            ((col("n") * col("sxx") - col("sx") * col("sx")) *
              (col("n") * col("syy") - col("sy") * col("sy"))), 6).as("r2"))
        .orderBy("event_type")
    },

    // Population stability index (PSI) per event_type between the first
    // 15 days and the rest — the ML-ops drift monitor (PSI > 0.2 ⇒
    // investigate). Fixed-width buckets (q163's grid), Laplace smoothing
    // so empty buckets stay finite and deterministic, 6dp-grid ln terms
    // decimal-summed. One contingency aggregate; everything after is
    // buckets-sized.
    Q.sql("q177_psi_drift",
      """WITH e AS (
        |  SELECT event_type,
        |         CASE WHEN CAST(ts AS DATE) - DATE '2024-01-01' < 15
        |              THEN 'a' ELSE 'b' END AS half,
        |         least(CAST(floor(value / 50) AS BIGINT), 9) AS bucket
        |  FROM events),
        |c AS (SELECT event_type, half, bucket, count(*) AS n
        |      FROM e GROUP BY 1, 2, 3),
        |grid AS (
        |  SELECT DISTINCT e1.event_type, b.bucket
        |  FROM (SELECT DISTINCT event_type FROM c) e1
        |  CROSS JOIN (SELECT unnest(generate_series(0, 9)) AS bucket) b),
        |tot AS (SELECT event_type, half, CAST(SUM(n) AS BIGINT) AS tn
        |        FROM c GROUP BY 1, 2),
        |p AS (
        |  SELECT g.event_type, g.bucket,
        |         (COALESCE(ca.n, 0) + 1.0)
        |           / (ta.tn + 10.0) AS pa,
        |         (COALESCE(cb.n, 0) + 1.0)
        |           / (tb.tn + 10.0) AS pb
        |  FROM grid g
        |  LEFT JOIN c ca ON ca.event_type = g.event_type
        |    AND ca.bucket = g.bucket AND ca.half = 'a'
        |  LEFT JOIN c cb ON cb.event_type = g.event_type
        |    AND cb.bucket = g.bucket AND cb.half = 'b'
        |  JOIN tot ta ON ta.event_type = g.event_type AND ta.half = 'a'
        |  JOIN tot tb ON tb.event_type = g.event_type AND tb.half = 'b'),
        |terms AS (
        |  SELECT event_type,
        |         floor((pa - pb) * ln(pa / pb) * 1000000 + 0.5) / 1000000
        |           AS t
        |  FROM p)
        |SELECT event_type,
        |       floor(CAST(SUM(CAST(t AS DECIMAL(38,8))) AS DOUBLE)
        |             * 1000000 + 0.5) / 1000000 AS psi
        |FROM terms GROUP BY 1 ORDER BY 1""".stripMargin) { (s, d) =>
      val e = Tables.events(s, d).select(col("event_type"),
        when(datediff(to_date(col("ts")), lit("2024-01-01").cast("date")) < 15,
          "a").otherwise("b").as("half"),
        least(floor(col("value") / 50).cast("long"), lit(9L)).as("bucket"))
      val c = e.groupBy("event_type", "half", "bucket")
        .agg(count(lit(1)).as("n"))
      val grid = c.select("event_type").distinct()
        .crossJoin(spark_buckets(s))
      val tot = c.groupBy("event_type", "half").agg(sum("n").as("tn"))
      def side(h: String, out: String) = c.where(col("half") === h)
        .select(col("event_type"), col("bucket"), col("n").as(out))
      def totSide(h: String, out: String) = tot.where(col("half") === h)
        .select(col("event_type"), col("tn").as(out))
      val p = grid
        .join(side("a", "na"), Seq("event_type", "bucket"), "left")
        .join(side("b", "nb"), Seq("event_type", "bucket"), "left")
        .join(totSide("a", "ta"), "event_type")
        .join(totSide("b", "tb"), "event_type")
        .select(col("event_type"),
          ((coalesce(col("na"), lit(0L)) + 1.0) / (col("ta") + 10.0)).as("pa"),
          ((coalesce(col("nb"), lit(0L)) + 1.0) / (col("tb") + 10.0)).as("pb"))
      p.select(col("event_type"),
          Qutil.dround((col("pa") - col("pb")) * log(col("pa") / col("pb")), 6)
            .as("t"))
        .groupBy("event_type")
        .agg(Qutil.dround(
          sum(col("t").cast(org.apache.spark.sql.types.DecimalType(38, 8)))
            .cast("double"), 6).as("psi"))
        .orderBy("event_type")
    },

    // Gini concentration of revenue across customers (the inequality
    // audit: "do 20% of customers carry 80% of revenue?"). Exact form
    // needs the global rank by revenue — fine at customer-dimension
    // cardinality (the window sorts customers, not orders); a 10⁹-key
    // variant would bucket by revenue quantile first (q127's table) and
    // compute the Lorenz sum per bucket. All sums decimal-exact; G =
    // 2·Σ(i·yᵢ)/(n·Σy) − (n+1)/n on identical doubles.
    Q.sql("q178_revenue_gini",
      """WITH r AS (
        |  SELECT o_custkey,
        |         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
        |           AS rev
        |  FROM orders GROUP BY 1),
        |rk AS (SELECT rev,
        |              row_number() OVER (ORDER BY rev, o_custkey) AS i
        |       FROM r),
        |agg AS (
        |  SELECT count(*) AS n,
        |         CAST(SUM(CAST(rev AS DECIMAL(38,4))) AS DOUBLE) AS sy,
        |         CAST(SUM(CAST(i * rev AS DECIMAL(38,4))) AS DOUBLE) AS siy
        |  FROM rk)
        |SELECT n,
        |       floor(sy * 100 + 0.5) / 100 AS total_rev,
        |       floor((2 * siy / (n * sy) - (n + 1.0) / n) * 1000000 + 0.5)
        |         / 1000000 AS gini
        |FROM agg""".stripMargin) { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      import org.apache.spark.sql.types.DecimalType
      val r = Tables.orders(s, d).groupBy("o_custkey")
        .agg(Qutil.msum(col("o_totalprice"), 2).as("rev"))
      val rk = r.withColumn("i",
        row_number().over(Window.orderBy(col("rev"), col("o_custkey"))))
      rk.agg(count(lit(1)).as("n"),
          sum(col("rev").cast(DecimalType(38, 4))).cast("double").as("sy"),
          sum((col("i") * col("rev")).cast(DecimalType(38, 4))).cast("double")
            .as("siy"))
        .select(col("n"),
          Qutil.dround(col("sy"), 2).as("total_rev"),
          Qutil.dround(lit(2) * col("siy") / (col("n") * col("sy")) -
            (col("n") + 1.0) / col("n"), 6).as("gini"))
    },

    // Chi-squared test of independence between market segment and order
    // priority — q163's MI screen is the information-theoretic sibling;
    // chi² is the classical test with a known null distribution. ONE
    // contingency aggregate; expected counts from the marginals of that
    // tiny grain; per-cell terms on a 6dp grid, decimal-summed. The
    // oracle replays marginals, expectations, and every term.
    Q.sql("q191_chi2_independence",
      """WITH cells AS (
        |  SELECT c_mktsegment AS seg, o_orderpriority AS pri,
        |         count(*) AS o
        |  FROM orders JOIN customer ON o_custkey = c_custkey
        |  GROUP BY 1, 2),
        |r AS (SELECT seg, CAST(SUM(o) AS BIGINT) AS rt FROM cells GROUP BY 1),
        |c AS (SELECT pri, CAST(SUM(o) AS BIGINT) AS ct FROM cells GROUP BY 1),
        |nt AS (SELECT CAST(SUM(o) AS BIGINT) AS n FROM cells),
        |terms AS (
        |  SELECT cells.o,
        |         floor((cells.o - e) * (cells.o - e) / e * 1e6 + 0.5) / 1e6
        |           AS term
        |  FROM (SELECT cells.*,
        |               CAST(rt * ct AS DOUBLE) / (SELECT n FROM nt) AS e
        |        FROM cells JOIN r USING (seg) JOIN c USING (pri)) cells),
        |dims AS (SELECT count(DISTINCT seg) AS nr, count(DISTINCT pri) AS nc
        |         FROM cells)
        |SELECT CAST((SELECT n FROM nt) AS BIGINT) AS n,
        |       CAST((nr - 1) * (nc - 1) AS BIGINT) AS dof,
        |       (SELECT CAST(SUM(CAST(term AS DECIMAL(38,9))) AS DOUBLE)
        |        FROM terms) AS chi2
        |FROM dims""".stripMargin) { (s, d) =>
      import org.apache.spark.sql.types.DecimalType
      val cells = Tables.orders(s, d)
        .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_mktsegment").as("seg"),
          col("o_orderpriority").as("pri"))
        .agg(count(lit(1)).as("o"))
      val r = cells.groupBy("seg").agg(sum("o").as("rt"))
      val c = cells.groupBy("pri").agg(sum("o").as("ct"))
      val nt = cells.agg(sum("o").as("n"))
      val terms = cells.join(r, "seg").join(c, "pri")
        .crossJoin(broadcast(nt))
        .withColumn("e", (col("rt") * col("ct")).cast("double") / col("n"))
        .withColumn("term",
          Qutil.dround((col("o") - col("e")) * (col("o") - col("e")) /
            col("e"), 6))
      val dims = cells.agg(countDistinct("seg").as("nr"),
        countDistinct("pri").as("nc"))
      terms.agg(sum("o").as("n"),
          sum(col("term").cast(DecimalType(38, 9))).cast("double").as("chi2"))
        .crossJoin(broadcast(dims))
        .select(col("n"), ((col("nr") - 1) * (col("nc") - 1)).as("dof"),
          col("chi2"))
    },

    // Bucket-granular integrity diff (ops.Expectations.integrityDiff):
    // compare a table against a tampered copy (every 997th key's price
    // bumped a cent, every 1999th row deleted) by per-bucket checksums —
    // each side reduces to 256 (count, additive-hash) rows, and only
    // disagreeing buckets would get the row-level q130 diff. Additive
    // long sums are order/partition-free, so copy layout never
    // false-positives. Hash inputs are long/string-normalized (cents,
    // epoch micros) — never engine-formatted doubles or timestamps.
    Q.sql("q198_integrity_diff", {
      def h(e: String) = s"('0x' || substr(md5($e), 1, 8))::BIGINT"
      val rowCat = "concat_ws(chr(1), CAST(k AS VARCHAR), CAST(ck AS VARCHAR), " +
        "st, CAST(cents AS VARCHAR), CAST(us AS VARCHAR), pri)"
      def side(src: String, pfx: String) =
        s"""SELECT ${h("CAST(k AS VARCHAR)")} % 256 AS bucket,
           |       count(*) AS n_$pfx,
           |       CAST(SUM(${h(rowCat)}) AS BIGINT) AS sum_$pfx
           |FROM $src GROUP BY 1""".stripMargin
      s"""WITH prep AS (
         |  SELECT o_orderkey k, o_custkey ck, o_orderstatus st,
         |         CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) cents,
         |         epoch_us(o_orderdate) us, o_orderpriority pri
         |  FROM orders),
         |tam AS (
         |  SELECT k, ck, st,
         |         CASE WHEN k % 997 = 0 THEN cents + 1 ELSE cents END
         |           AS cents,
         |         us, pri
         |  FROM prep WHERE k % 1999 <> 0),
         |sa AS (${side("prep", "a")}),
         |sb AS (${side("tam", "b")})
         |SELECT bucket, n_a, n_b, sum_a, sum_b
         |FROM sa FULL OUTER JOIN sb USING (bucket)
         |WHERE NOT (n_a IS NOT DISTINCT FROM n_b)
         |   OR NOT (sum_a IS NOT DISTINCT FROM sum_b)
         |ORDER BY bucket""".stripMargin
    }) { (s, d) =>
      val prep = Tables.orders(s, d).select(
        col("o_orderkey").as("k"), col("o_custkey").as("ck"),
        col("o_orderstatus").as("st"),
        floor(col("o_totalprice") * 100 + 0.5).cast("long").as("cents"),
        unix_micros(col("o_orderdate").cast("timestamp")).as("us"),
        col("o_orderpriority").as("pri"))
      val tampered = prep.where(pmod(col("k"), lit(1999L)) =!= 0)
        .withColumn("cents",
          when(pmod(col("k"), lit(997L)) === 0, col("cents") + 1)
            .otherwise(col("cents")))
      graft.ops.Expectations.integrityDiff(prep, tampered, "k",
          Seq("k", "ck", "st", "cents", "us", "pri"), buckets = 256)
        .orderBy("bucket")
    })
}
