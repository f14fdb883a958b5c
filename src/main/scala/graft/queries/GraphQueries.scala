package graft.queries

import org.apache.spark.sql.functions._
import graft.io.Tables
import graft.operators.Graph

/** Graph analytics over the order graph: customers and suppliers are
  * nodes, distinct (customer, supplier) trade relationships are edges
  * (both directions, so the graph is symmetric and nobody dangles by
  * construction). The oracle replays every PageRank iteration as a
  * chained CTE — the same full-loop-replay technique as q41's k-means.
  */
object GraphQueries {

  private val Iters = 3
  private val Damping = 0.85
  private val Scale = 9

  /** floor-scale rounding at Scale decimals — Qutil.dround in SQL. */
  private def rnd(e: String): String =
    s"floor(($e) * 1e$Scale + 0.5) / 1e$Scale"

  private val pageRankSql: String = {
    val iterCtes = (1 to Iters).map { i =>
      val prev = if (i == 1) "r0" else s"r${i - 1}"
      s"""c$i AS (
         |  SELECT e.dst AS node, ${rnd(s"r.rank / d.outdeg")} AS c
         |  FROM e JOIN $prev r ON r.node = e.src
         |         JOIN deg d ON d.src = e.src),
         |s$i AS (
         |  SELECT node, CAST(sum(CAST(c AS DECIMAL(38, ${Scale + 3}))) AS DOUBLE) AS s
         |  FROM c$i GROUP BY 1),
         |r$i AS (
         |  SELECT n.node, ${rnd(s"CAST(${1.0 - Damping} AS DOUBLE) + CAST($Damping AS DOUBLE) * coalesce(s.s, CAST(0 AS DOUBLE))")} AS rank
         |  FROM n LEFT JOIN s$i s USING (node))""".stripMargin
    }.mkString(",\n")
    s"""WITH pairs AS (
       |  SELECT DISTINCT o_custkey AS c, l_suppkey AS s
       |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
       |e AS (
       |  SELECT 'c' || CAST(c AS VARCHAR) AS src, 's' || CAST(s AS VARCHAR) AS dst FROM pairs
       |  UNION ALL
       |  SELECT 's' || CAST(s AS VARCHAR), 'c' || CAST(c AS VARCHAR) FROM pairs),
       |deg AS (SELECT src, count(*) AS outdeg FROM e GROUP BY 1),
       |n AS (SELECT src AS node FROM e UNION SELECT dst FROM e),
       |r0 AS (SELECT node, CAST(1 AS DOUBLE) AS rank FROM n),
       |$iterCtes
       |SELECT node, rank FROM r$Iters ORDER BY node""".stripMargin
  }

  val all: Seq[Q] = Seq(

    // Damped PageRank over the symmetric customer–supplier trade graph,
    // Iters rounds, contributions decimal-summed on a 9dp grid (see
    // operators.Graph scaladoc for the determinism discipline).
    Q.sql("q73_pagerank", pageRankSql) { (s, d) =>
      val pairs = Tables.lineitem(s, d)
        .join(Tables.orders(s, d),
          col("l_orderkey") === col("o_orderkey"))
        .select(col("o_custkey").as("c"), col("l_suppkey").as("s"))
        .distinct()
      val edges = pairs.select(
          concat(lit("c"), col("c").cast("string")).as("src"),
          concat(lit("s"), col("s").cast("string")).as("dst"))
        .unionAll(pairs.select(
          concat(lit("s"), col("s").cast("string")).as("src"),
          concat(lit("c"), col("c").cast("string")).as("dst")))
      Graph.pageRank(edges, Iters, Damping, Scale)
        .orderBy("node")
    })
}
