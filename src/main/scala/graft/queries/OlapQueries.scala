package graft.queries

import org.apache.spark.sql.functions._
import graft.io.Tables
import graft.queries.Qutil.msum

/** OLAP surface beyond the reference (SURVEY §2.6 note: grouping sets /
  * rollup / HLL come free from Spark — exposed and verified here).
  */
object OlapQueries {

  val rollupSql: String =
    """SELECT r_name, n_name,
      |       cast(sum(cast(o_totalprice as decimal(18,4))) as double) AS total,
      |       count(*) AS n
      |FROM orders
      |JOIN customer ON o_custkey = c_custkey
      |JOIN nation ON c_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |GROUP BY ROLLUP (r_name, n_name)
      |ORDER BY r_name NULLS FIRST, n_name NULLS FIRST""".stripMargin

  val cubeSql: String =
    """SELECT coalesce(o_orderpriority, 'ALL') AS priority,
      |       coalesce(l_returnflag, 'ALL') AS returnflag,
      |       CAST(GROUPING(o_orderpriority) AS INTEGER) AS g_priority,
      |       CAST(GROUPING(l_returnflag) AS INTEGER) AS g_flag,
      |       cast(sum(cast(l_extendedprice * (1 - l_discount) as decimal(18,6))) as double) AS revenue,
      |       count(*) AS n
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |GROUP BY CUBE (o_orderpriority, l_returnflag)
      |ORDER BY g_priority, g_flag, priority, returnflag""".stripMargin

  val all: Seq[Q] = Seq(

    // ROLLUP: region → nation → grand-total hierarchy in one pass
    // (partial aggregation handles all grouping sets in a single shuffle).
    // Runs through spark.sql over temp views — the reference's own
    // execution mechanism (createOrReplaceTempView + spark.sql,
    // ADAPTERS/SILVER-adapter-wyscout.py:430-431); the SQL text is
    // dialect-shared with the DuckDB oracle. (The Dataset rollup(String*)
    // API trips Spark 4.1's ambiguous-self-join detector on joined inputs.)
    Q.sql("q33_rollup_revenue", OlapQueries.rollupSql) { (s, d) =>
      Tables.createViews(s, d)
      s.sql(OlapQueries.rollupSql)
    },

    // HLL sketch distinct (approx_count_distinct): engines' sketches differ,
    // so the oracle checks the EXACT distinct while the approximate value is
    // bounded in OlapSpec — rows-only here would hide the exact column.
    Q.sql("q34_distinct_counts",
      """SELECT l_returnflag,
        |       count(distinct l_partkey) AS exact_parts,
        |       count(distinct l_suppkey) AS exact_supps
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin) { (s, d) =>
      Tables.lineitem(s, d)
        .groupBy("l_returnflag")
        .agg(countDistinct(col("l_partkey")).as("exact_parts"),
             countDistinct(col("l_suppkey")).as("exact_supps"))
        .orderBy("l_returnflag")
    },

    // Exact linear-interpolated percentiles per group. Spark's percentile
    // and DuckDB's quantile_cont share the definition; the interpolation
    // arithmetic can differ in arrangement, so outputs round at 6dp.
    // (percentile_approx/approx_percentile stays spec-land like the HLL
    // sketch — sketches aren't cross-engine comparable.)
    Q.sql("q55_value_quantiles",
      """SELECT event_type,
        |       count(*) AS n,
        |       floor(quantile_cont(value, 0.5) * 1000000 + 0.5) / 1000000 AS p50,
        |       floor(quantile_cont(value, 0.95) * 1000000 + 0.5) / 1000000 AS p95,
        |       floor(quantile_cont(value, 0.99) * 1000000 + 0.5) / 1000000 AS p99
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin) { (s, d) =>
      Tables.events(s, d)
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"),
          Qutil.dround(expr("percentile(value, 0.5)"), 6).as("p50"),
          Qutil.dround(expr("percentile(value, 0.95)"), 6).as("p95"),
          Qutil.dround(expr("percentile(value, 0.99)"), 6).as("p99"))
        .orderBy("event_type")
    },

    // Fixed-width value histogram: exact integer bucketing, the profiling
    // companion to the quantiles.
    Q.sql("q56_value_histogram",
      """SELECT event_type,
        |       least(CAST(floor(value / 10) AS BIGINT), 9) AS bucket,
        |       count(*) AS n
        |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin) { (s, d) =>
      Tables.events(s, d)
        .groupBy(col("event_type"),
          least(floor(col("value") / 10).cast("long"), lit(9L)).as("bucket"))
        .agg(count(lit(1)).as("n"))
        .orderBy("event_type", "bucket")
    },

    // CUBE: all four grouping sets of (priority, returnflag) in one pass —
    // like q33's ROLLUP, Expand + a single hash shuffle handles every set at
    // once. GROUPING() flags disambiguate "the ALL row" from a hypothetical
    // literal 'ALL' value. Dialect-shared SQL text (same mechanism/rationale
    // as q33).
    Q.sql("q68_cube_revenue", OlapQueries.cubeSql) { (s, d) =>
      Tables.createViews(s, d)
      s.sql(OlapQueries.cubeSql)
    },

    // Skew-salted enrichment join (ops.Skew): the big side (events) takes a
    // deterministic row-content salt, the dim side replicates saltFactor
    // times, so one hot user key spreads over saltFactor tasks. Result is
    // provably identical to the unsalted join — which is exactly what the
    // oracle states in plain SQL.
    Q.sql("q72_salted_segment_revenue",
      """SELECT c_mktsegment AS segment,
        |       count(*) AS n_events,
        |       cast(sum(cast(value as decimal(18,4))) as double) AS total_value,
        |       count(DISTINCT user_id) AS n_users
        |FROM events JOIN customer ON user_id = c_custkey
        |GROUP BY 1 ORDER BY 1""".stripMargin) { (s, d) =>
      val dim = Tables.customer(s, d)
        .select(col("c_custkey").as("user_id"), col("c_mktsegment"))
      graft.ops.Skew.saltedJoin(Tables.events(s, d), dim, Seq("user_id"), 8)
        .groupBy(col("c_mktsegment").as("segment"))
        .agg(count(lit(1)).as("n_events"),
          msum(col("value")).as("total_value"),
          count_distinct(col("user_id")).as("n_users"))
        .orderBy("segment")
    },

    // Analytic rank family: ntile deciles, percent_rank, cume_dist over a
    // total order (acctbal, custkey — unique, so no tie ambiguity). All
    // three are integer-derived in both engines; the doubles divide
    // identical integers, rounded 6dp for belt and braces.
    Q.sql("q74_analytic_ranks",
      """SELECT c_custkey, c_mktsegment,
        |       CAST(ntile(10) OVER w AS INTEGER) AS decile,
        |       floor(percent_rank() OVER w * 1000000 + 0.5) / 1000000 AS pr,
        |       floor(cume_dist() OVER w * 1000000 + 0.5) / 1000000 AS cd
        |FROM customer
        |WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey)
        |ORDER BY c_custkey""".stripMargin) { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("c_mktsegment")
        .orderBy(col("c_acctbal").asc, col("c_custkey").asc)
      Tables.customer(s, d)
        .select(col("c_custkey"), col("c_mktsegment"),
          ntile(10).over(w).as("decile"),
          Qutil.dround(percent_rank().over(w), 6).as("pr"),
          Qutil.dround(cume_dist().over(w), 6).as("cd"))
        .orderBy("c_custkey")
    },

    // Set operations: INTERSECT / EXCEPT with distinct semantics — which
    // customers placed orders at both urgency extremes, and which only at
    // the urgent end. Spark plans both as aggregated joins (left-semi /
    // left-anti over distinct keys), one shuffle each.
    Q.sql("q75_set_ops",
      """WITH urgent AS (
        |  SELECT DISTINCT o_custkey AS custkey FROM orders
        |  WHERE o_orderpriority = '1-URGENT'),
        |low AS (
        |  SELECT DISTINCT o_custkey AS custkey FROM orders
        |  WHERE o_orderpriority = '5-LOW')
        |SELECT 'both' AS tag, custkey FROM (
        |  SELECT custkey FROM urgent INTERSECT SELECT custkey FROM low)
        |UNION ALL
        |SELECT 'urgent_only', custkey FROM (
        |  SELECT custkey FROM urgent EXCEPT SELECT custkey FROM low)
        |ORDER BY tag, custkey""".stripMargin) { (s, d) =>
      val orders = Tables.orders(s, d)
      def keys(p: String) = orders.where(col("o_orderpriority") === p)
        .select(col("o_custkey").as("custkey")).distinct()
      val urgent = keys("1-URGENT"); val lowp = keys("5-LOW")
      urgent.intersect(lowp).select(lit("both").as("tag"), col("custkey"))
        .unionAll(urgent.except(lowp)
          .select(lit("urgent_only").as("tag"), col("custkey")))
        .orderBy("tag", "custkey")
    },

    // Grouped ordered-array aggregation: top-3 customers per segment as an
    // ordered list. collect_list is unordered by contract, so the engine
    // collects (rank, key) structs and array_sorts before projecting —
    // the deterministic replacement for pandas' implicit row order. The
    // list serializes to CSV on both sides (engine-portable hashing).
    Q.sql("q86_grouped_arrays",
      """WITH r AS (
        |  SELECT c_mktsegment, c_custkey,
        |         row_number() OVER (PARTITION BY c_mktsegment
        |                            ORDER BY c_acctbal DESC, c_custkey) AS rn
        |  FROM customer)
        |SELECT c_mktsegment AS segment,
        |       array_to_string(list(c_custkey ORDER BY rn), ',') AS top_customers,
        |       count(*) AS n
        |FROM r WHERE rn <= 3 GROUP BY 1 ORDER BY 1""".stripMargin) { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("c_mktsegment")
        .orderBy(col("c_acctbal").desc, col("c_custkey").asc)
      Tables.customer(s, d)
        .withColumn("rn", row_number().over(w))
        .where(col("rn") <= 3)
        .groupBy(col("c_mktsegment").as("segment"))
        .agg(
          concat_ws(",", expr(
            "transform(array_sort(collect_list(struct(rn, c_custkey))), s -> s.c_custkey)"))
            .as("top_customers"),
          count(lit(1)).as("n"))
        .orderBy("segment")
    },

    // Custom whole-operator plan (plans.TopKPerGroup): top-3 orders per
    // customer via the bounded-heap exec — a custom LogicalPlan + Strategy
    // + SparkPlan registered through the session, replacing the window
    // formulation's full per-group sort (the oracle IS that window
    // formulation, so the exec must reproduce it exactly).
    Q.sql("q89_topk_custom",
      """WITH r AS (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |         row_number() OVER (PARTITION BY o_custkey
        |                            ORDER BY o_totalprice DESC, o_orderkey) AS rn
        |  FROM orders)
        |SELECT o_custkey, o_orderkey, o_totalprice
        |FROM r WHERE rn <= 3
        |ORDER BY o_custkey, o_orderkey""".stripMargin) { (s, d) =>
      graft.plans.TopK.topKPerGroup(
          Tables.orders(s, d).select("o_custkey", "o_orderkey", "o_totalprice"),
          groupCols = Seq("o_custkey"),
          orderKeys = Seq("o_totalprice" -> true, "o_orderkey" -> false),
          k = 3)
        .orderBy("o_custkey", "o_orderkey")
    },

    // Single-pass correlation matrix (Stats.corrMatrix): every pairwise
    // moment is a term in ONE shared aggregate — one table scan for all
    // pairs, decimal-exact sums, identical final double arithmetic in both
    // engines.
    Q.sql("q80_corr_matrix", {
      val cols = Seq("l_quantity", "l_extendedprice", "l_discount")
      def s(e: String) = s"CAST(sum(CAST($e AS DECIMAL(38,6))) AS DOUBLE)"
      val pairs = for {
        i <- cols.indices; j <- (i + 1) until cols.size
      } yield (cols(i), cols(j))
      val moments =
        (Seq("count(*) AS n") ++
          cols.map(c => s"${s(c)} AS s_$c") ++
          cols.map(c => s"${s(s"$c * $c")} AS q_$c") ++
          pairs.map { case (a, b) => s"${s(s"$a * $b")} AS p_${a}_$b" })
          .mkString(",\n         ")
      val rows = pairs.map { case (a, b) =>
        val corr = s"(CAST(n AS DOUBLE) * p_${a}_$b - s_$a * s_$b) / " +
          s"(sqrt(CAST(n AS DOUBLE) * q_$a - s_$a * s_$a) * " +
          s"sqrt(CAST(n AS DOUBLE) * q_$b - s_$b * s_$b))"
        s"""SELECT '$a' AS var_a, '$b' AS var_b, n,
           |       floor(($corr) * 1000000 + 0.5) / 1000000 AS corr FROM m""".stripMargin
      }.mkString("\nUNION ALL\n")
      s"""WITH m AS (
         |  SELECT $moments
         |  FROM lineitem)
         |$rows
         |ORDER BY var_a, var_b""".stripMargin
    }) { (s, d) =>
      graft.ops.Stats.corrMatrix(Tables.lineitem(s, d),
          Seq("l_quantity", "l_extendedprice", "l_discount"))
        .orderBy("var_a", "var_b")
    },

    // TPC-H Q5-shaped local-supplier volume: the 6-table snowflake with a
    // region filter on BOTH customer and supplier sides (c_nationkey =
    // s_nationkey is the "local" constraint) and a one-year date window.
    // The join-order stress test of the suite: orders prunes on the date
    // BEFORE joining lineitem (PushedFilters), nation/region broadcast,
    // and the only data-sized exchanges are the two fact joins. Revenue is
    // the decimal-summed l_extendedprice·(1−l_discount).
    Q.sql("q135_local_supplier_volume",
      """SELECT n_name,
        |       cast(sum(cast(l_extendedprice * (1 - l_discount) as decimal(18,6))) as double) AS revenue,
        |       count(*) AS n_lines
        |FROM customer
        |JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON l_orderkey = o_orderkey
        |JOIN supplier ON l_suppkey = s_suppkey AND s_nationkey = c_nationkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA'
        |  AND o_orderdate >= TIMESTAMP '1996-01-01'
        |  AND o_orderdate < TIMESTAMP '1997-01-01'
        |GROUP BY 1 ORDER BY revenue DESC, n_name""".stripMargin) { (s, d) =>
      Tables.customer(s, d)
        .join(Tables.orders(s, d), col("c_custkey") === col("o_custkey"))
        .where(col("o_orderdate") >= lit("1996-01-01").cast("timestamp_ntz") &&
          col("o_orderdate") < lit("1997-01-01").cast("timestamp_ntz"))
        .join(Tables.lineitem(s, d), col("l_orderkey") === col("o_orderkey"))
        .join(Tables.supplier(s, d), col("l_suppkey") === col("s_suppkey") &&
          col("s_nationkey") === col("c_nationkey"))
        .join(broadcast(Tables.nation(s, d)),
          col("s_nationkey") === col("n_nationkey"))
        .join(broadcast(Tables.region(s, d)),
          col("n_regionkey") === col("r_regionkey"))
        .where(col("r_name") === "ASIA")
        .groupBy("n_name")
        .agg(msum(col("l_extendedprice") * (lit(1) - col("l_discount")), 6)
          .as("revenue"),
          count(lit(1)).as("n_lines"))
        .orderBy(col("revenue").desc, col("n_name"))
    },

    // TPC-H Q21-shaped "waiting supplier": suppliers who shipped late in
    // multi-supplier orders where NO other supplier was late — the
    // double-correlated EXISTS / NOT EXISTS pattern, expressed Spark-first
    // as explicit semi + anti joins on the (order, supplier) grain.
    // Exercises exactly the planner shapes correlated subqueries decorrelate
    // into; all grains are distinct-compacted before joining.
    Q.sql("q142_waiting_supplier",
      """WITH l AS (SELECT l_orderkey AS ok, l_suppkey AS sk, l_shipdate AS sd
        |           FROM lineitem),
        |o AS (SELECT o_orderkey AS ok, o_orderdate AS od FROM orders),
        |late AS (SELECT DISTINCT l.ok, l.sk FROM l JOIN o ON o.ok = l.ok
        |         WHERE l.sd > o.od + INTERVAL 100 DAY),
        |multi AS (SELECT DISTINCT a.ok, a.sk FROM l a
        |          WHERE EXISTS (SELECT 1 FROM l b
        |                        WHERE b.ok = a.ok AND b.sk <> a.sk)),
        |cand AS (SELECT late.ok, late.sk FROM late
        |         JOIN multi ON multi.ok = late.ok AND multi.sk = late.sk),
        |solo AS (SELECT c.ok, c.sk FROM cand c
        |         WHERE NOT EXISTS (SELECT 1 FROM late x
        |                           WHERE x.ok = c.ok AND x.sk <> c.sk))
        |SELECT s_name, count(*) AS numwait
        |FROM solo JOIN supplier ON s_suppkey = sk
        |GROUP BY 1 ORDER BY numwait DESC, s_name LIMIT 20""".stripMargin) { (s, d) =>
      val l = Tables.lineitem(s, d).select(col("l_orderkey").as("ok"),
        col("l_suppkey").as("sk"), col("l_shipdate").as("sd"))
      val o = Tables.orders(s, d).select(col("o_orderkey").as("ok"),
        col("o_orderdate").as("od"))
      val late = l.join(o, "ok")
        .where(col("sd") > col("od") + expr("INTERVAL 100 DAYS"))
        .select("ok", "sk").distinct()
      val pairs = l.select("ok", "sk").distinct()
      // EXISTS another supplier in the same order → self semi-join
      val multi = pairs.as("a").join(pairs.as("b"),
          col("a.ok") === col("b.ok") && col("a.sk") =!= col("b.sk"),
          "left_semi")
        .select(col("a.ok").as("ok"), col("a.sk").as("sk"))
      val cand = late.join(multi, Seq("ok", "sk"), "left_semi")
      // NOT EXISTS another LATE supplier in the same order → anti join
      val only = cand.as("c").join(late.as("x"),
          col("c.ok") === col("x.ok") && col("c.sk") =!= col("x.sk"),
          "left_anti")
      only.join(Tables.supplier(s, d), col("sk") === col("s_suppkey"))
        .groupBy("s_name").agg(count(lit(1)).as("numwait"))
        .orderBy(col("numwait").desc, col("s_name")).limit(20)
    },

    // Wide pivot report (`DataFrame.pivot` with an EXPLICIT value list —
    // the reference stack's pandas pivot_table): region × order-year
    // revenue matrix. The explicit values matter at scale: without them
    // Spark runs a driver-side distinct pass over the pivot column before
    // planning; with them the pivot compiles to one conditional aggregate
    // — a single partial→final exchange, exactly the shape the oracle
    // writes out by hand. Dims broadcast; decimal sums keep every cell
    // engine-exact.
    Q.sql("q126_pivot_revenue", {
      val years = (1995 to 2001).map(_.toString)
      val cells = years.map { y =>
        s"""CAST(SUM(CASE WHEN yr = '$y' THEN p END) AS DOUBLE) AS "$y""""
      }.mkString(",\n       ")
      s"""SELECT r_name,
         |       $cells
         |FROM (
         |  SELECT r_name, strftime(o_orderdate, '%Y') AS yr,
         |         CAST(o_totalprice AS DECIMAL(18,2)) AS p
         |  FROM orders
         |  JOIN customer ON o_custkey = c_custkey
         |  JOIN nation ON c_nationkey = n_nationkey
         |  JOIN region ON n_regionkey = r_regionkey)
         |GROUP BY 1 ORDER BY 1""".stripMargin
    }) { (s, d) =>
      Tables.orders(s, d)
        .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
        .join(broadcast(Tables.nation(s, d)),
          col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(Tables.region(s, d)),
          col("n_regionkey") === col("r_regionkey"))
        .select(col("r_name"),
          date_format(col("o_orderdate"), "yyyy").as("yr"),
          col("o_totalprice"))
        .groupBy("r_name")
        .pivot("yr", (1995 to 2001).map(_.toString))
        .agg(Qutil.msum(col("o_totalprice"), 2))
        .orderBy("r_name")
    },

    // Bloom semi-join reduction (ops.JoinReduce): a selective dim filter
    // (one brand ≈ 5% of parts) is turned into a map-side Bloom predicate
    // on the fact scan BEFORE the join shuffle — the explicit form of
    // Spark's runtime bloom filter, deterministic instead of heuristic.
    // Correctness never depends on the filter (no false negatives; false
    // positives die in the exact join), so the oracle is the plain join.
    // At 100 TB: the fact shuffle carries ~5% of lineitem instead of all
    // of it; the filter itself is a fixed-size bit array built by a
    // distributed tree-aggregate over dim keys.
    Q.sql("q146_bloom_join_reduction",
      """SELECT p_type, count(*) AS n_items,
        |       CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
        |                     AS DECIMAL(18,4))) AS DOUBLE) AS revenue
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE (p_brand = 'Brand#4' OR p_brand LIKE 'Brand#4#s%')
        |GROUP BY 1 ORDER BY 1""".stripMargin) { (s, d) =>
      val dim = Tables.part(s, d).where(col("p_brand") === "Brand#4" ||
        col("p_brand").startsWith("Brand#4#s"))
      graft.ops.JoinReduce.reducedJoin(
          Tables.lineitem(s, d).select("l_partkey", "l_extendedprice", "l_discount"),
          "l_partkey", dim.select("p_partkey", "p_type"), "p_partkey",
          expectedKeys = 1 << 16)
        .groupBy("p_type")
        .agg(count(lit(1)).as("n_items"),
          Qutil.msum(col("l_extendedprice") * (lit(1) - col("l_discount")), 4)
            .as("revenue"))
        .orderBy("p_type")
    },

    // Materialized-view routing (aggregate navigator): a day-grain summary
    // table at rest answers the month-grain query WITHOUT touching the
    // fact table at query time — the warehouse summary-table pattern.
    // Decimal partial sums re-aggregate exactly (decimal addition is
    // associative), which is precisely why the rollup stores DECIMAL and
    // not DOUBLE: double partials would re-sum in a different order than
    // the direct aggregation and drift in the last ulp. The oracle IS the
    // direct fact-table aggregation — a hash match proves rollup-path ≡
    // fact-path bit-for-bit. At 100 TB the summary is day×status-sized
    // (~10k rows/decade), maintained incrementally by day partition, and
    // query cost becomes summary-sized, not fact-sized.
    Q.sql("q150_rollup_routing",
      """SELECT strftime(o_orderdate, '%Y-%m') AS mon, o_orderstatus AS status,
        |       count(*) AS n_orders,
        |       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
        |         AS revenue
        |FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1997-01-01'
        |  AND o_orderdate < TIMESTAMP '1999-01-01'
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin) { (s, d) =>
      val mv = java.nio.file.Files.createTempDirectory("q150mv").toString + "/orders_daily"
      Tables.orders(s, d)
        .groupBy(to_date(col("o_orderdate")).as("day"),
          col("o_orderstatus").as("status"))
        .agg(count(lit(1)).as("n"),
          sum(col("o_totalprice")
            .cast(org.apache.spark.sql.types.DecimalType(18, 2))).as("rev"))
        .write.mode("overwrite").parquet(mv)
      s.read.parquet(mv)
        .where(col("day") >= lit("1997-01-01").cast("date") &&
          col("day") < lit("1999-01-01").cast("date"))
        .groupBy(date_format(col("day"), "yyyy-MM").as("mon"), col("status"))
        .agg(sum(col("n")).as("n_orders"),
          sum(col("rev")).cast("double").as("revenue"))
        .orderBy("mon", "status")
    },

    // TPC-H Q18 shape (large-volume orders): IN over a grouped-HAVING
    // subquery. Decorrelated Spark form: aggregate lineitem to the order
    // grain FIRST (map-side-combinable sum), filter the threshold, then
    // join the order/customer dims onto the small survivor set — the
    // fact table is touched once, at its natural grain.
    Q.sql("q157_large_orders",
      """SELECT c_name, o_orderkey,
        |       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
        |         AS total_qty
        |FROM lineitem
        |JOIN orders ON o_orderkey = l_orderkey
        |JOIN customer ON c_custkey = o_custkey
        |WHERE o_orderkey IN (
        |  SELECT l_orderkey FROM lineitem
        |  GROUP BY 1 HAVING SUM(l_quantity) > 250)
        |GROUP BY 1, 2 ORDER BY 2""".stripMargin) { (s, d) =>
      val perOrder = Tables.lineitem(s, d)
        .groupBy(col("l_orderkey"))
        .agg(Qutil.msum(col("l_quantity"), 2).as("total_qty"))
        .where(col("total_qty") > 250)
      perOrder
        .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
        .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
        .select(col("c_name"), col("o_orderkey"), col("total_qty"))
        .orderBy("o_orderkey")
    },

    // TPC-H Q22 shape (idle high-balance customers): scalar-subquery
    // threshold + NOT EXISTS. Decorrelated: the global positive-balance
    // mean is a one-row broadcast; the "no recent orders" predicate is a
    // left anti join against the distinct recent-buyer keys.
    Q.sql("q158_idle_customers",
      """WITH thr AS (SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2)))
        |                         AS DOUBLE) / count(*) AS t
        |             FROM customer WHERE c_acctbal > 0),
        |recent AS (SELECT DISTINCT o_custkey FROM orders
        |           WHERE o_orderdate >= TIMESTAMP '2001-01-01')
        |SELECT c_mktsegment, count(*) AS n_custs,
        |       CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
        |         AS total_bal
        |FROM customer c CROSS JOIN thr
        |WHERE c.c_acctbal > thr.t
        |  AND NOT EXISTS (SELECT 1 FROM recent r
        |                  WHERE r.o_custkey = c.c_custkey)
        |GROUP BY 1 ORDER BY 1""".stripMargin) { (s, d) =>
      val cust = Tables.customer(s, d)
      // decimal-exact mean: double avg would be partial-order-dependent
      val thr = cust.where(col("c_acctbal") > 0)
        .agg(Qutil.mavg(col("c_acctbal"), 2).as("t"))
      val recent = Tables.orders(s, d)
        .where(col("o_orderdate") >= lit("2001-01-01").cast("timestamp"))
        .select(col("o_custkey")).distinct()
      cust.crossJoin(broadcast(thr))
        .where(col("c_acctbal") > col("t"))
        .join(recent, col("c_custkey") === col("o_custkey"), "left_anti")
        .groupBy("c_mktsegment")
        .agg(count(lit(1)).as("n_custs"),
          Qutil.msum(col("c_acctbal"), 2).as("total_bal"))
        .orderBy("c_mktsegment")
    },

    // TPC-H Q11 shape (important-supplier share): HAVING against a scalar
    // fraction of the GLOBAL total. Both totals come off ONE aggregation
    // pass each (per-supplier, then re-aggregated global — decimal, so
    // the re-sum is exact); the global scalar broadcasts into the filter.
    Q.sql("q159_supplier_share",
      """WITH per_s AS (
        |  SELECT l_suppkey,
        |         SUM(CAST(l_extendedprice * (1 - l_discount)
        |                  AS DECIMAL(18,4))) AS rev
        |  FROM lineitem GROUP BY 1),
        |tot AS (SELECT SUM(rev) AS t FROM per_s)
        |SELECT s_name, CAST(p.rev AS DOUBLE) AS revenue,
        |       floor(CAST(p.rev AS DOUBLE) / CAST(t.t AS DOUBLE)
        |             * 1000000 + 0.5) / 1000000 AS share
        |FROM per_s p CROSS JOIN tot t
        |JOIN supplier ON s_suppkey = l_suppkey
        |WHERE CAST(p.rev AS DOUBLE) > CAST(t.t AS DOUBLE) * 0.0105
        |ORDER BY 1""".stripMargin) { (s, d) =>
      val perS = Tables.lineitem(s, d)
        .groupBy(col("l_suppkey"))
        .agg(sum((col("l_extendedprice") * (lit(1) - col("l_discount")))
          .cast(org.apache.spark.sql.types.DecimalType(18, 4))).as("rev"))
      val tot = perS.agg(sum(col("rev")).as("t"))
      perS.crossJoin(broadcast(tot))
        .where(col("rev").cast("double") > col("t").cast("double") * 0.0105)
        .join(broadcast(Tables.supplier(s, d)),
          col("l_suppkey") === col("s_suppkey"))
        .select(col("s_name"), col("rev").cast("double").as("revenue"),
          Qutil.dround(col("rev").cast("double") / col("t").cast("double"), 6)
            .as("share"))
        .orderBy("s_name")
    },

    // Market-basket lift (q134's PMI shape on transactions): pair space
    // bounded to the top-200 parts by basket support BEFORE the within-order
    // self-join — the unbounded version is quadratic in basket width. Lift
    // = sup(ab)·N / (sup(a)·sup(b)); all counts exact integers, the ratio
    // rounds at 6dp. Output is every qualifying pair ordered by key (no
    // rank-by-float ambiguity).
    Q.sql("q161_basket_lift",
      """WITH items AS (
        |  SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
        |n AS (SELECT count(DISTINCT o) AS n_baskets FROM items),
        |sup AS (SELECT p, count(*) AS s FROM items GROUP BY 1),
        |topm AS (SELECT p, s FROM sup ORDER BY s DESC, p LIMIT 200),
        |ti AS (SELECT i.o, i.p FROM items i JOIN topm t ON t.p = i.p),
        |pairs AS (
        |  SELECT a.p AS pa, b.p AS pb, count(*) AS sab
        |  FROM ti a JOIN ti b ON a.o = b.o AND a.p < b.p
        |  GROUP BY 1, 2 HAVING count(*) >= 2)
        |SELECT pa, pb, sab,
        |       floor(CAST(sab AS DOUBLE) * n.n_baskets
        |             / (sa.s * sb.s) * 1000000 + 0.5) / 1000000 AS lift
        |FROM pairs CROSS JOIN n
        |JOIN topm sa ON sa.p = pa
        |JOIN topm sb ON sb.p = pb
        |ORDER BY pa, pb""".stripMargin) { (s, d) =>
      val items = Tables.lineitem(s, d)
        .select(col("l_orderkey").as("o"), col("l_partkey").as("p"))
        .distinct()
      val nB = items.agg(count_distinct(col("o")).as("n_baskets"))
      val sup = items.groupBy("p").agg(count(lit(1)).as("s"))
      val topm = sup.orderBy(col("s").desc, col("p").asc).limit(200)
      val ti = items.join(broadcast(topm.select("p")), Seq("p"))
      val pairs = ti.as("a")
        .join(ti.as("b"),
          col("a.o") === col("b.o") && col("a.p") < col("b.p"))
        .groupBy(col("a.p").as("pa"), col("b.p").as("pb"))
        .agg(count(lit(1)).as("sab"))
        .where(col("sab") >= 2)
      pairs
        .join(broadcast(topm.select(col("p").as("pa"), col("s").as("sa_s"))), "pa")
        .join(broadcast(topm.select(col("p").as("pb"), col("s").as("sb_s"))), "pb")
        .crossJoin(broadcast(nB))
        .select(col("pa"), col("pb"), col("sab"),
          Qutil.dround(col("sab").cast("double") * col("n_baskets") /
            (col("sa_s") * col("sb_s")), 6).as("lift"))
        .orderBy("pa", "pb")
    },

    // SQL front door (TPC-H Q3 shape — shipping priority): the SAME ANSI
    // text runs through spark.sql over registered temp views and through
    // DuckDB — exercising the query surface users actually type, not the
    // DataFrame DSL the rest of the registry verifies. Catalyst parses,
    // optimizes and broadcast-plans it exactly like the q08 DSL twin;
    // decimal revenue sums keep the hash engine-exact.
    Q.sql("q208_sql_frontdoor",
      """SELECT l_orderkey,
        |       CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
        |                     AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
        |       CAST(epoch(o_orderdate) AS BIGINT) AS orderdate_epoch,
        |       o_orderpriority
        |FROM customer
        |JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON l_orderkey = o_orderkey
        |WHERE c_mktsegment = 'BUILDING'
        |  AND o_orderdate < TIMESTAMP '1995-03-15'
        |  AND l_shipdate > TIMESTAMP '1995-03-15'
        |GROUP BY 1, 3, 4
        |ORDER BY revenue DESC, l_orderkey
        |LIMIT 20""".stripMargin) { (s, d) =>
      Tables.customer(s, d).createOrReplaceTempView("customer")
      Tables.orders(s, d).createOrReplaceTempView("orders")
      Tables.lineitem(s, d).createOrReplaceTempView("lineitem")
      s.sql(
        """SELECT l_orderkey,
          |       CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
          |                     AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
          |       CAST(unix_seconds(CAST(o_orderdate AS TIMESTAMP)) AS BIGINT)
          |         AS orderdate_epoch,
          |       o_orderpriority
          |FROM customer
          |JOIN orders ON c_custkey = o_custkey
          |JOIN lineitem ON l_orderkey = o_orderkey
          |WHERE c_mktsegment = 'BUILDING'
          |  AND o_orderdate < TIMESTAMP '1995-03-15'
          |  AND l_shipdate > TIMESTAMP '1995-03-15'
          |GROUP BY 1, 3, 4
          |ORDER BY revenue DESC, l_orderkey
          |LIMIT 20""".stripMargin)
    },

    // 2-D skyline / Pareto frontier (ops.Windows.skyline2D): per brand,
    // the parts where no brand-mate is both cheaper-or-equal and
    // bigger-or-equal with one strict — "cheapest AND biggest" shortlist.
    // The implementation is the value-grain window reduction (one
    // aggregate + one window over the (brand, price) grain, row table
    // scanned once); the oracle is the INDEPENDENT O(n²) NOT-EXISTS
    // dominance definition, so the window rewrite itself is what's
    // being verified.
    Q.sql("q184_skyline",
      """SELECT p_brand, p_partkey, p_retailprice, p_size
        |FROM part p
        |WHERE NOT EXISTS (
        |  SELECT 1 FROM part q
        |  WHERE q.p_brand = p.p_brand
        |    AND q.p_retailprice <= p.p_retailprice
        |    AND q.p_size >= p.p_size
        |    AND (q.p_retailprice < p.p_retailprice OR q.p_size > p.p_size))
        |ORDER BY p_brand, p_partkey""".stripMargin) { (s, d) =>
      graft.ops.Windows.skyline2D(
          Tables.part(s, d)
            .select(col("p_brand"), col("p_partkey"),
              col("p_retailprice"), col("p_size")),
          "p_brand", "p_retailprice", "p_size")
        .select(col("p_brand"), col("p_partkey"),
          col("p_retailprice"), col("p_size"))
        .orderBy("p_brand", "p_partkey")
    },

    // TPC-H Q17 shape (small-quantity revenue): a correlated scalar AVG
    // subquery ("below 20% of this part's average quantity"),
    // decorrelated the Spark way: the per-part average is its own
    // aggregate at the part grain (decimal sum / count — exact), joined
    // back to the fact rows — the fact table is scanned twice but never
    // per-row re-aggregated, and the brand filter prunes the probe side
    // before the join.
    Q.sql("q192_small_qty_revenue",
      """WITH avgq AS (
        |  SELECT l_partkey,
        |         CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
        |           / count(*) AS aq
        |  FROM lineitem GROUP BY 1)
        |SELECT count(*) AS n_li,
        |       floor(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)))
        |                  AS DOUBLE) / 7.0 * 100 + 0.5) / 100 AS avg_yearly
        |FROM lineitem
        |JOIN avgq USING (l_partkey)
        |JOIN part ON p_partkey = l_partkey
        |WHERE p_brand IN ('Brand#23', 'Brand#31')
        |  AND l_quantity < 0.2 * aq""".stripMargin) { (s, d) =>
      val avgq = Tables.lineitem(s, d)
        .groupBy(col("l_partkey"))
        .agg((Qutil.msum(col("l_quantity"), 2) / count(lit(1))).as("aq"))
      Tables.lineitem(s, d)
        .join(avgq, "l_partkey")
        .join(Tables.part(s, d).where(
            col("p_brand").isin("Brand#23", "Brand#31")),
          col("p_partkey") === col("l_partkey"))
        .where(col("l_quantity") < lit(0.2) * col("aq"))
        .agg(count(lit(1)).as("n_li"),
          Qutil.dround(Qutil.msum(col("l_extendedprice"), 2) / 7.0, 2)
            .as("avg_yearly"))
    },

    // TPC-H Q2 shape (min-cost supplier per part): the correlated MIN
    // subquery, decorrelated to a sort-free struct-min argmax at the
    // part grain (the q152/q186 rule — a window row_number would sort
    // the whole offer table). Offers are synthesized from lineitem
    // (per-(part, supplier) best unit price); eligibility: EUROPE
    // suppliers, parts in the 10–15 size band. The oracle is the
    // independent row_number formulation.
    Q.sql("q193_min_cost_supplier",
      """WITH offers AS (
        |  SELECT l_partkey AS p, l_suppkey AS sk,
        |         min(l_extendedprice / l_quantity) AS cost
        |  FROM lineitem GROUP BY 1, 2),
        |eur AS (
        |  SELECT s_suppkey, s_name FROM supplier
        |  JOIN nation ON n_nationkey = s_nationkey
        |  JOIN region ON r_regionkey = n_regionkey
        |  WHERE r_name = 'EUROPE'),
        |r AS (
        |  SELECT o.p, o.sk, o.cost, e.s_name,
        |         row_number() OVER (PARTITION BY o.p
        |                            ORDER BY o.cost, o.sk) AS rn
        |  FROM offers o
        |  JOIN eur e ON e.s_suppkey = o.sk
        |  JOIN part ON p_partkey = o.p AND p_size BETWEEN 10 AND 15)
        |SELECT p AS p_partkey, sk AS s_suppkey, s_name,
        |       floor(cost * 10000 + 0.5) / 10000 AS cost
        |FROM r WHERE rn = 1 ORDER BY p""".stripMargin) { (s, d) =>
      val offers = Tables.lineitem(s, d)
        .groupBy(col("l_partkey").as("p"), col("l_suppkey").as("sk"))
        .agg(min(col("l_extendedprice") / col("l_quantity")).as("cost"))
      val eur = Tables.supplier(s, d)
        .join(Tables.nation(s, d), col("n_nationkey") === col("s_nationkey"))
        .join(Tables.region(s, d), col("r_regionkey") === col("n_regionkey"))
        .where(col("r_name") === "EUROPE")
        .select(col("s_suppkey"), col("s_name"))
      offers
        .join(broadcast(eur), col("s_suppkey") === col("sk"))
        .join(broadcast(Tables.part(s, d)
            .where(col("p_size").between(10, 15)).select(col("p_partkey"))),
          col("p_partkey") === col("p"))
        .groupBy(col("p"))
        .agg(min(struct(col("cost"), col("sk"), col("s_name"))).as("w"))
        .select(col("p").as("p_partkey"), col("w.sk").as("s_suppkey"),
          col("w.s_name").as("s_name"),
          Qutil.dround(col("w.cost"), 4).as("cost"))
        .orderBy("p_partkey")
    },

    // FIFO cost-of-goods allocation (ops.Intervals.fifoMatch): per part,
    // 'F'-status lineitems are inbound lots and 'O'-status ones are
    // sales; FIFO consumption is the interval intersection of the two
    // cumulative-unit axes — two windows + one near-diagonal per-key
    // join, NO sequential queue fold (the declarative unrolling of what
    // looks like a Recurrence-tier operator). Integer units throughout;
    // per-match cost on a 4dp grid, decimal-summed. The oracle replays
    // both prefix axes and the overlap arithmetic.
    Q.sql("q194_fifo_cogs",
      """WITH li AS (
        |  SELECT l_partkey p, l_orderkey o, l_linenumber ln, l_linestatus st,
        |         CAST(l_quantity AS BIGINT) q,
        |         l_extendedprice / l_quantity AS uc,
        |         epoch_us(l_shipdate) us
        |  FROM lineitem),
        |lots AS (
        |  SELECT p, q, uc,
        |         SUM(q) OVER (PARTITION BY p ORDER BY us, o, ln
        |                      ROWS UNBOUNDED PRECEDING) AS hi
        |  FROM li WHERE st = 'F'),
        |sales AS (
        |  SELECT p, q,
        |         SUM(q) OVER (PARTITION BY p ORDER BY us, o, ln
        |                      ROWS UNBOUNDED PRECEDING) AS hi
        |  FROM li WHERE st = 'O'),
        |m AS (
        |  SELECT l.p,
        |         LEAST(l.hi, s.hi) - GREATEST(l.hi - l.q, s.hi - s.q)
        |           AS units,
        |         l.uc
        |  FROM lots l JOIN sales s
        |    ON s.p = l.p AND l.hi - l.q < s.hi AND s.hi - s.q < l.hi),
        |agg AS (
        |  SELECT p, count(*) AS n_matches,
        |         CAST(SUM(units) AS BIGINT) AS units_matched,
        |         CAST(SUM(CAST(floor(units * uc * 1e4 + 0.5) / 1e4
        |                       AS DECIMAL(38,6))) AS DOUBLE) AS cogs
        |  FROM m GROUP BY 1),
        |sold AS (SELECT p, CAST(SUM(q) AS BIGINT) AS units_sold
        |         FROM li WHERE st = 'O' GROUP BY 1)
        |SELECT s.p AS part, s.units_sold,
        |       coalesce(a.n_matches, 0) AS n_matches,
        |       coalesce(a.units_matched, 0) AS units_matched,
        |       coalesce(a.cogs, CAST(0 AS DOUBLE)) AS cogs
        |FROM sold s LEFT JOIN agg a ON a.p = s.p
        |ORDER BY 1""".stripMargin) { (s, d) =>
      import org.apache.spark.sql.types.DecimalType
      val li = Tables.lineitem(s, d).select(
        col("l_partkey").as("p"), col("l_orderkey"), col("l_linenumber"),
        col("l_linestatus").as("st"),
        col("l_quantity").cast("long").as("q"),
        (col("l_extendedprice") / col("l_quantity")).as("uc"),
        unix_micros(col("l_shipdate").cast("timestamp")).as("us"))
      val lots = li.where(col("st") === "F")
      val sales = li.where(col("st") === "O")
      val matched = graft.ops.Intervals.fifoMatch(lots, sales, "p", "q",
          "uc", Seq("us", "l_orderkey", "l_linenumber"))
        .groupBy(col("key").as("p"))
        .agg(count(lit(1)).as("n_matches"),
          sum(col("units")).as("units_matched"),
          sum(Qutil.dround(col("alloc_cost"), 4).cast(DecimalType(38, 6)))
            .cast("double").as("cogs"))
      sales.groupBy(col("p"))
        .agg(sum(col("q")).as("units_sold"))
        .join(matched, Seq("p"), "left")
        .select(col("p").as("part"), col("units_sold"),
          coalesce(col("n_matches"), lit(0L)).as("n_matches"),
          coalesce(col("units_matched"), lit(0L)).as("units_matched"),
          coalesce(col("cogs"), lit(0.0)).as("cogs"))
        .orderBy("part")
    },

    // Largest-remainder (Hamilton) apportionment (ops.Stats.
    // largestRemainder): a 10,000-unit budget split across nations
    // proportional to order revenue, allocations integer AND summing
    // exactly to the budget — what naive per-key rounding loses. The
    // fact table aggregates to the nation grain first; the apportionment
    // windows sort 25 rows. The oracle replays quotas, floors, remainder
    // ranks, and the top-up.
    Q.sql("q190_largest_remainder",
      """WITH rev AS (
        |  SELECT n_name,
        |         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
        |           AS revenue
        |  FROM orders
        |  JOIN customer ON o_custkey = c_custkey
        |  JOIN nation ON c_nationkey = n_nationkey
        |  GROUP BY 1),
        |t AS (SELECT CAST(SUM(CAST(revenue AS DECIMAL(38,6))) AS DOUBLE)
        |             AS tot FROM rev),
        |q AS (SELECT n_name, revenue,
        |             10000.0 * revenue / (SELECT tot FROM t) AS quota
        |      FROM rev),
        |b AS (SELECT n_name, revenue, quota,
        |             CAST(floor(quota) AS BIGINT) AS base,
        |             row_number() OVER (ORDER BY quota - floor(quota) DESC,
        |                                n_name ASC) AS rnk
        |      FROM q),
        |l AS (SELECT 10000 - CAST(SUM(base) AS BIGINT) AS leftover FROM b)
        |SELECT n_name, revenue,
        |       base + CASE WHEN rnk <= (SELECT leftover FROM l)
        |                   THEN 1 ELSE 0 END AS alloc
        |FROM b ORDER BY n_name""".stripMargin) { (s, d) =>
      val rev = Tables.orders(s, d)
        .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
        .join(Tables.nation(s, d), col("c_nationkey") === col("n_nationkey"))
        .groupBy("n_name")
        .agg(Qutil.msum(col("o_totalprice"), 2).as("revenue"))
      graft.ops.Stats.largestRemainder(rev, "n_name", "revenue", 10000L)
        .orderBy("n_name")
    })
}
