package graft.queries

import org.apache.spark.sql.functions._
import graft.expr.{FeatureSpec, FeatureStore}
import graft.io.Tables
import graft.ops.{Groups, Windows}
import graft.queries.Qutil.{dround, msum}

/** SURVEY.md §2 relational operator inventory, exercised one operator class
  * per query on the driver's synthetic tables (TESTDATA.md). Reference
  * citations on each query; Spark-first implementations via graft.ops.
  *
  * Float outputs follow Qutil's cross-engine determinism rules: exact
  * decimal-term sums for money columns, floor-based rounding for derived
  * reals, identical ORDER BY both sides.
  */
object CoreQueries {

  /** A1 — compiled profile aggregation (ADAPTERS/SILVER-adapter-wyscout.py:
    * 410-431): the aggregate list is data (FeatureSpec), not code. These
    * snippets are dialect-shared: Spark SQL and DuckDB parse them
    * identically, so the oracle reuses the exact text. */
  private val profileSpecs = Seq(
    FeatureSpec("sampleSize", "count(*)"),
    FeatureSpec("totalQty", "sum(l_quantity)"),
    FeatureSpec("revenue",
      "cast(sum(cast(l_extendedprice * (1 - l_discount) as decimal(18,6))) as double)"),
    FeatureSpec("avgDiscount",
      "cast(sum(cast(l_discount as decimal(18,4))) as double) / count(*)"),
    FeatureSpec("nOrders", "count(distinct l_orderkey)"))

  val all: Seq[Q] = Seq(

    // A1/A4-style wide aggregation (pricing summary, TPC-H Q1 shape).
    Q.sql("q01_pricing_summary",
      """SELECT l_returnflag, l_linestatus,
        |       sum(l_quantity) AS sum_qty,
        |       cast(sum(cast(l_extendedprice as decimal(18,4))) as double) AS sum_base_price,
        |       cast(sum(cast(l_extendedprice * (1 - l_discount) as decimal(18,6))) as double) AS sum_disc_price,
        |       avg(l_quantity) AS avg_qty,
        |       count(*) AS count_order
        |FROM lineitem GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin) { (s, d) =>
      Tables.lineitem(s, d)
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          sum("l_quantity").as("sum_qty"),
          msum(col("l_extendedprice")).as("sum_base_price"),
          msum(col("l_extendedprice") * (lit(1) - col("l_discount")), 6).as("sum_disc_price"),
          avg("l_quantity").as("avg_qty"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus")
    },

    // A1 — FeatureStore-compiled per-supplier profile aggregation.
    Q.sql("q02_profile_agg",
      s"""SELECT l_suppkey,
         |       ${profileSpecs.map(f => f.sql + " AS " + f.name).mkString(",\n       ")}
         |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin) { (s, d) =>
      FeatureStore.aggregate(Tables.lineitem(s, d), Seq("l_suppkey"), profileSpecs)
        .orderBy("l_suppkey")
    },

    // A2 — compiled event aggregation: SUM(CASE WHEN …) conditional stats
    // (STAGING/SILVER-adapter-statsbomb-notebook.ipynb:171 pattern).
    Q.sql("q03_event_agg",
      """SELECT user_id,
        |       cast(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) as bigint) AS clicks,
        |       cast(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) as bigint) AS purchases,
        |       cast(sum(cast(CASE WHEN event_type = 'purchase' THEN value ELSE 0 END as decimal(18,4))) as double) AS spend,
        |       cast(sum(cast(value as decimal(18,4))) as double) / count(*) AS avg_value
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin) { (s, d) =>
      FeatureStore.aggregate(Tables.events(s, d), Seq("user_id"), Seq(
        // cast(… as bigint): no-op in Spark (sum(int) is already BIGINT) but
        // pins DuckDB, whose sum over INTEGER returns HUGEINT — the driver's
        // typed hasher treats BIGINT vs HUGEINT as a mismatch (round-1 red row).
        FeatureSpec("clicks", "cast(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) as bigint)"),
        FeatureSpec("purchases", "cast(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) as bigint)"),
        FeatureSpec("spend",
          "cast(sum(cast(CASE WHEN event_type = 'purchase' THEN value ELSE 0 END as decimal(18,4))) as double)"),
        FeatureSpec("avg_value",
          "cast(sum(cast(value as decimal(18,4))) as double) / count(*)")))
        .orderBy("user_id")
    },

    // A4 — distribution fit: group mean/std, sample ddof like the live gold
    // path (LOADERS/GOLD-data-loader.py:446-448).
    Q.sql("q04_group_stats",
      """SELECT o_orderstatus, o_orderpriority,
        |       cast(sum(cast(o_totalprice as decimal(18,4))) as double) / count(*) AS mean_totalprice,
        |       floor(stddev_samp(o_totalprice) * 100 + 0.5) / 100 AS std_totalprice
        |FROM orders GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin) { (s, d) =>
      Tables.orders(s, d)
        .groupBy("o_orderstatus", "o_orderpriority")
        .agg(Qutil.mavg(col("o_totalprice")).as("mean_totalprice"),
             dround(stddev_samp(col("o_totalprice")), 2).as("std_totalprice"))
        .orderBy("o_orderstatus", "o_orderpriority")
    },

    // A5/C11 — per-group z-score with the reference's null/zero-variance→0
    // semantics (LOADERS/GOLD-data-loader.py:219-234,465-469).
    Q.sql("q05_zscore",
      """SELECT o_orderkey,
        |       floor((CASE WHEN coalesce(stddev_samp(o_totalprice) OVER w, 0) = 0 THEN 0
        |                   ELSE (o_totalprice - avg(o_totalprice) OVER w)
        |                        / stddev_samp(o_totalprice) OVER w END) * 10000 + 0.5) / 10000 AS zs_totalprice
        |FROM orders WINDOW w AS (PARTITION BY o_orderstatus) ORDER BY o_orderkey""".stripMargin) { (s, d) =>
      graft.ops.Stats.zscore(Tables.orders(s, d), Seq("o_orderstatus"), Seq("o_totalprice"))
        .select(col("o_orderkey"),
          dround(col("zs_o_totalprice"), 4).as("zs_totalprice"))
        .orderBy("o_orderkey")
    },

    // W1/F3 — last-N ranking with rank() tie semantics
    // (ADAPTERS/SILVER-adapter-wyscout.py:436-451).
    Q.sql("q06_last4",
      """SELECT o_custkey, o_orderkey FROM (
        |  SELECT o_custkey, o_orderkey,
        |         rank() OVER (PARTITION BY o_custkey ORDER BY o_orderdate DESC) AS r
        |  FROM orders) WHERE r <= 4 ORDER BY o_custkey, o_orderkey""".stripMargin) { (s, d) =>
      Windows.lastN(Tables.orders(s, d), Seq("o_custkey"), col("o_orderdate").desc, 4)
        .select("o_custkey", "o_orderkey")
        .orderBy("o_custkey", "o_orderkey")
    },

    // A7/W5 — deterministic argmax-per-group dedup
    // (DEPRECATED/statsbomb-silver.py:221-224).
    Q.sql("q07_dedup_keepbest",
      """SELECT o_custkey, o_orderkey, o_totalprice FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |         row_number() OVER (PARTITION BY o_custkey
        |                            ORDER BY o_totalprice DESC, o_orderkey) AS rn
        |  FROM orders) WHERE rn = 1 ORDER BY o_custkey""".stripMargin) { (s, d) =>
      Windows.keepBest(Tables.orders(s, d), Seq("o_custkey"),
          Seq(col("o_totalprice").desc, col("o_orderkey").asc))
        .select("o_custkey", "o_orderkey", "o_totalprice")
        .orderBy("o_custkey")
    },

    // J1–J3 — star join with broadcast dims (ADAPTERS/SILVER-adapter-wyscout
    // .py:364-373); revenue per region/nation (TPC-H Q5 shape).
    Q.sql("q08_regional_revenue",
      """SELECT r_name, n_name,
        |       cast(sum(cast(l_extendedprice * (1 - l_discount) as decimal(18,6))) as double) AS revenue,
        |       count(*) AS n_lines
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin) { (s, d) =>
      Tables.lineitem(s, d)
        .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
        .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
        .join(broadcast(Tables.nation(s, d)), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(Tables.region(s, d)), col("n_regionkey") === col("r_regionkey"))
        .groupBy("r_name", "n_name")
        .agg(
          msum(col("l_extendedprice") * (lit(1) - col("l_discount")), 6).as("revenue"),
          count(lit(1)).as("n_lines"))
        .orderBy("r_name", "n_name")
    },

    // J12 — anti-join (incremental-fetch shape,
    // UPDATERS/wyscout-bronze-batch.py:223-226).
    Q.sql("q09_anti_join",
      """SELECT c_custkey, c_name FROM customer c
        |WHERE NOT EXISTS (SELECT 1 FROM orders o
        |                  WHERE o.o_custkey = c.c_custkey
        |                    AND o.o_orderpriority = '1-URGENT')
        |ORDER BY c_custkey""".stripMargin) { (s, d) =>
      val urgent = Tables.orders(s, d).where(col("o_orderpriority") === "1-URGENT")
      Tables.customer(s, d)
        .join(urgent, col("c_custkey") === col("o_custkey"), "left_anti")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    },

    // J7 — full-outer join + fill(0) (card counts,
    // STAGING/SILVER-adapter-statsbomb-notebook.ipynb:187).
    Q.sql("q10_outer_fill",
      """SELECT coalesce(c.user_id, p.user_id) AS user_id,
        |       coalesce(clicks, 0) AS clicks,
        |       coalesce(purchases, 0) AS purchases
        |FROM (SELECT user_id, count(*) AS clicks FROM events
        |      WHERE event_type = 'click' GROUP BY 1) c
        |FULL OUTER JOIN (SELECT user_id, count(*) AS purchases FROM events
        |                 WHERE event_type = 'purchase' GROUP BY 1) p
        |ON c.user_id = p.user_id ORDER BY user_id""".stripMargin) { (s, d) =>
      val ev = Tables.events(s, d)
      val clicks = ev.where(col("event_type") === "click")
        .groupBy("user_id").agg(count(lit(1)).as("clicks"))
      val purchases = ev.where(col("event_type") === "purchase")
        .groupBy("user_id").agg(count(lit(1)).as("purchases"))
      clicks.join(purchases, Seq("user_id"), "outer")
        .na.fill(0, Seq("clicks", "purchases"))
        .orderBy("user_id")
    },

    // W2a/F2 — ANY-group union then aggregate
    // (ADAPTERS/SILVER-adapter-wyscout.py:292-303).
    Q.sql("q11_any_union",
      """WITH u AS (SELECT event_type, value FROM events
        |           UNION ALL SELECT 'ANY' AS event_type, value FROM events)
        |SELECT event_type, count(*) AS n,
        |       cast(sum(cast(value as decimal(18,4))) as double) AS total_value
        |FROM u GROUP BY 1 ORDER BY 1""".stripMargin) { (s, d) =>
      Groups.withAnyGroup(Tables.events(s, d).select("event_type", "value"), "event_type")
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"), msum(col("value")).as("total_value"))
        .orderBy("event_type")
    },

    // K6/W5 — SELECT DISTINCT dimension build (LOADERS/GOLD-rds-updater.py:81-114).
    Q.sql("q12_dims_distinct",
      """SELECT DISTINCT n_name, r_name FROM customer
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |ORDER BY n_name, r_name""".stripMargin) { (s, d) =>
      Tables.customer(s, d)
        .join(broadcast(Tables.nation(s, d)), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(Tables.region(s, d)), col("n_regionkey") === col("r_regionkey"))
        .select("n_name", "r_name").distinct()
        .orderBy("n_name", "r_name")
    },

    // C1/C7 — composite-key concat + conditional bucketing
    // (profileId build, ADAPTERS/SILVER-adapter-wyscout.py:392-400).
    Q.sql("q13_composite_keys",
      """SELECT c_custkey,
        |       concat_ws('-', c_custkey, c_mktsegment) AS profileId,
        |       CASE WHEN c_acctbal < 0 THEN 'neg'
        |            WHEN c_acctbal < 5000 THEN 'mid'
        |            ELSE 'high' END AS tier
        |FROM customer ORDER BY c_custkey""".stripMargin) { (s, d) =>
      Tables.customer(s, d).select(
          col("c_custkey"),
          concat_ws("-", col("c_custkey"), col("c_mktsegment")).as("profileId"),
          when(col("c_acctbal") < 0, "neg")
            .when(col("c_acctbal") < 5000, "mid")
            .otherwise("high").as("tier"))
        .orderBy("c_custkey")
    },

    // C2/P7 — regexp_extract lineage/field extraction
    // (STAGING/SILVER-adapter-statsbomb-notebook.ipynb:171).
    Q.sql("q14_regex_extract",
      """SELECT event_id,
        |       CAST(regexp_extract(props, '"k": (\d+)', 1) AS INTEGER) AS k
        |FROM events ORDER BY event_id""".stripMargin) { (s, d) =>
      Tables.events(s, d).select(
          col("event_id"),
          regexp_extract(col("props"), "\"k\": (\\d+)", 1).cast("int").as("k"))
        .orderBy("event_id")
    },

    // C5 — date-part derivation (ADAPTERS/SILVER-adapter-wyscout.py:388-390).
    Q.sql("q15_date_parts",
      """SELECT CAST(year(o_orderdate) AS INTEGER) AS o_year,
        |       CAST(month(o_orderdate) AS INTEGER) AS o_month,
        |       count(*) AS n_orders,
        |       cast(sum(cast(o_totalprice as decimal(18,4))) as double) AS total
        |FROM orders GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin) { (s, d) =>
      Tables.orders(s, d)
        .groupBy(year(col("o_orderdate")).as("o_year"),
                 month(col("o_orderdate")).as("o_month"))
        .agg(count(lit(1)).as("n_orders"), msum(col("o_totalprice")).as("total"))
        .orderBy("o_year", "o_month")
    },

    // A8 — cumcount (DEPRECATED/statsbomb-gold-temp-v2.py:296-300).
    Q.sql("q16_cumcount",
      """SELECT o_orderkey,
        |       CAST(row_number() OVER (PARTITION BY o_custkey
        |                               ORDER BY o_orderdate, o_orderkey) - 1 AS INTEGER) AS cumcount
        |FROM orders ORDER BY o_orderkey""".stripMargin) { (s, d) =>
      Windows.cumcount(Tables.orders(s, d), Seq("o_custkey"),
          Seq(col("o_orderdate").asc, col("o_orderkey").asc))
        .select("o_orderkey", "cumcount")
        .orderBy("o_orderkey")
    })
}
