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
    })
}
