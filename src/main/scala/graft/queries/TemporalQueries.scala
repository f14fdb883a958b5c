package graft.queries

import org.apache.spark.sql.functions._
import graft.io.Tables
import graft.ops.AsOf

/** Temporal operators Spark lacks as built-ins, composed declaratively
  * (ops.AsOf) and verified against DuckDB's native ASOF / inequality joins.
  */
object TemporalQueries {

  val all: Seq[Q] = Seq(

    // As-of join: each event attached to the user's latest order at or
    // before the event time. DuckDB runs its native ASOF JOIN; the engine
    // runs the union+window composition — results must agree exactly.
    Q.sql("q35_asof_join",
      """SELECT e.event_id,
        |       CAST(epoch(o.o_orderdate) AS BIGINT) AS asof_epoch
        |FROM events e
        |ASOF LEFT JOIN orders o
        |  ON e.user_id = o.o_custkey AND e.ts >= o.o_orderdate
        |ORDER BY e.event_id""".stripMargin) { (s, d) =>
      val events = Tables.events(s, d)
      val orders = Tables.orders(s, d)
        .withColumnRenamed("o_custkey", "user_id")
        .select("user_id", "o_orderdate")
      AsOf.joinAsOf(events, orders, "user_id", "ts", "o_orderdate",
          payloadCols = Seq("o_orderdate"))
        .select(col("event_id"),
          col("asof_o_orderdate").cast("timestamp").cast("long").as("asof_epoch"))
        .orderBy("event_id")
    },

    // Range (band) join: orders bucketed into price bands via the
    // banded equi-join (no broadcast-nested-loop), oracled by a plain
    // inequality join.
    Q.sql("q36_range_join",
      """SELECT band_name, count(*) AS n,
        |       cast(sum(cast(o_totalprice as decimal(18,4))) as double) AS total
        |FROM orders
        |JOIN (VALUES ('low', 0.0, 150000.0),
        |             ('mid', 150000.0, 300000.0),
        |             ('high', 300000.0, 100000000.0)) b(band_name, lo, hi)
        |  ON o_totalprice >= lo AND o_totalprice < hi
        |GROUP BY 1 ORDER BY 1""".stripMargin) { (s, d) =>
      import s.implicits._
      val bands = Seq(("low", 0.0, 150000.0), ("mid", 150000.0, 300000.0),
        ("high", 300000.0, 100000000.0)).toDF("band_name", "lo", "hi")
      AsOf.rangeJoin(Tables.orders(s, d), "o_totalprice", bands, "lo", "hi",
          bandWidth = 150000.0)
        .groupBy("band_name")
        .agg(count(lit(1)).as("n"), Qutil.msum(col("o_totalprice")).as("total"))
        .orderBy("band_name")
    })
}
