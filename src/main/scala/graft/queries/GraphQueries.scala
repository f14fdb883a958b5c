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
  private val TriMaxSize = 15 // q97 co-purchase graph: parts with p_size ≤ 15
  private val KCoreK = 3      // q137 peel threshold
  private val KCoreRounds = 4 // q137 synchronous peel rounds (CTE-replayed)
  private val LpaRounds = 3   // q152 label-propagation rounds (CTE-replayed)
  private val AaDegCap = 50   // q180 basket-size band upper bound
  private val BfsRounds = 3   // q181 frontier rounds (CTE-replayed)

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
      val pairs = Tables.spreadDf(Tables.lineitem(s, d))
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
    },

    // Exact per-part triangle counts over the co-purchase graph (parts of
    // size ≤ 15 appearing in the same order), via degree-ordered edge
    // orientation — each wedge enumerated once at its lowest-degree
    // corner, O(m^1.5) total regardless of hub skew. Pure integer
    // counting; the oracle runs the identical oriented joins.
    Q.sql("q97_triangle_counts",
      s"""WITH e0 AS (
         |  SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
         |  FROM lineitem a
         |  JOIN lineitem b ON a.l_orderkey = b.l_orderkey
         |                 AND a.l_partkey < b.l_partkey
         |  JOIN part pa ON pa.p_partkey = a.l_partkey AND pa.p_size <= $TriMaxSize
         |  JOIN part pb ON pb.p_partkey = b.l_partkey AND pb.p_size <= $TriMaxSize),
         |sym AS (SELECT src, dst FROM e0 UNION ALL SELECT dst, src FROM e0),
         |deg AS (SELECT src AS node, count(*) AS deg FROM sym GROUP BY 1),
         |o AS (
         |  SELECT s.src, s.dst, dd.deg AS ddst FROM sym s
         |  JOIN deg ds ON ds.node = s.src
         |  JOIN deg dd ON dd.node = s.dst
         |  WHERE ds.deg < dd.deg OR (ds.deg = dd.deg AND s.src < s.dst)),
         |wed AS (
         |  SELECT o1.src AS u, o1.dst AS b, o2.dst AS c
         |  FROM o o1 JOIN o o2 ON o1.src = o2.src
         |  WHERE o1.ddst < o2.ddst OR (o1.ddst = o2.ddst AND o1.dst < o2.dst)),
         |tri AS (SELECT u, b, c FROM wed JOIN o ON o.src = wed.b AND o.dst = wed.c),
         |nn AS (SELECT u AS node FROM tri
         |       UNION ALL SELECT b FROM tri
         |       UNION ALL SELECT c FROM tri)
         |SELECT node AS part_id, count(*) AS triangles
         |FROM nn GROUP BY 1 ORDER BY 1""".stripMargin) { (s, d) =>
      val ok = Tables.part(s, d).where(col("p_size") <= TriMaxSize)
        .select(col("p_partkey"))
      val li = Tables.spreadDf(Tables.lineitem(s, d))
        .join(ok, col("l_partkey") === col("p_partkey"))
        .select(col("l_orderkey"), col("l_partkey"))
      val e0 = li.as("a").join(li.as("b"),
          col("a.l_orderkey") === col("b.l_orderkey") &&
            col("a.l_partkey") < col("b.l_partkey"))
        .select(col("a.l_partkey").as("src"), col("b.l_partkey").as("dst"))
        .distinct()
      Graph.triangleCounts(e0)
        .select(col("node").as("part_id"), col("triangles"))
        .orderBy("part_id")
    },

    // k-core peeling over the q97 co-purchase graph: KCoreRounds
    // synchronous rounds of "drop nodes with degree < k" (Graph.
    // kCorePeel), verified by replaying EVERY round as a chained CTE —
    // the q91 BPE-rounds technique applied to graph peeling. Surviving
    // (node, degree) after the final round; peeling is monotone, so this
    // IS the k-core whenever the peel converges within the round budget.
    Q.sql("q137_kcore", {
      val base =
        s"""WITH e0 AS (
           |  SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
           |  FROM lineitem a
           |  JOIN lineitem b ON a.l_orderkey = b.l_orderkey
           |                 AND a.l_partkey < b.l_partkey
           |  JOIN part pa ON pa.p_partkey = a.l_partkey AND pa.p_size <= $TriMaxSize
           |  JOIN part pb ON pb.p_partkey = b.l_partkey AND pb.p_size <= $TriMaxSize),
           |sym0 AS (SELECT src, dst FROM e0 UNION ALL SELECT dst, src FROM e0)"""
      val rounds = (1 to KCoreRounds).map { r =>
        s""",
           |k$r AS (SELECT src AS node FROM sym${r - 1}
           |        GROUP BY 1 HAVING count(*) >= $KCoreK),
           |sym$r AS (SELECT s.src, s.dst FROM sym${r - 1} s
           |          JOIN k$r a ON a.node = s.src
           |          JOIN k$r b ON b.node = s.dst)"""
      }.mkString
      val fin =
        s"""
           |SELECT src AS part_id, count(*) AS degree FROM sym$KCoreRounds
           |GROUP BY 1 ORDER BY 1"""
      (base + rounds + fin).stripMargin
    }) { (s, d) =>
      val ok = Tables.part(s, d).where(col("p_size") <= TriMaxSize)
        .select(col("p_partkey"))
      val li = Tables.spreadDf(Tables.lineitem(s, d))
        .join(ok, col("l_partkey") === col("p_partkey"))
        .select(col("l_orderkey"), col("l_partkey"))
      val e0 = li.as("a").join(li.as("b"),
          col("a.l_orderkey") === col("b.l_orderkey") &&
            col("a.l_partkey") < col("b.l_partkey"))
        .select(col("a.l_partkey").as("src"), col("b.l_partkey").as("dst"))
        .distinct()
      Graph.kCorePeel(e0, KCoreK, KCoreRounds)
        .select(col("node").as("part_id"), col("degree"))
        .orderBy("part_id")
    },

    // Deterministic synchronous label propagation (LpaRounds rounds) over
    // the customer–supplier trade graph: most-frequent neighbor label,
    // ties → MAX label (so the per-round argmax is a sort-free
    // max-over-structs aggregate — see Graph.labelPropagation). Every
    // round is replayed as a chained CTE (the q73/q137 technique); output
    // is the community-size histogram.
    Q.sql("q152_label_propagation", {
      val roundCtes = (1 to LpaRounds).map { r =>
        s""",
           |c$r AS (SELECT e.dst AS node, l.lab, count(*) AS cnt
           |        FROM e JOIN l${r - 1} l ON l.node = e.src GROUP BY 1, 2),
           |l$r AS (SELECT node, lab FROM (
           |          SELECT node, lab, row_number() OVER (
           |            PARTITION BY node ORDER BY cnt DESC, lab DESC) AS rn
           |          FROM c$r) WHERE rn = 1)"""
      }.mkString
      s"""WITH pairs AS (
         |  SELECT DISTINCT o_custkey AS c, l_suppkey AS s
         |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
         |e AS (
         |  SELECT 'c' || CAST(c AS VARCHAR) AS src,
         |         's' || CAST(s AS VARCHAR) AS dst FROM pairs
         |  UNION ALL
         |  SELECT 's' || CAST(s AS VARCHAR), 'c' || CAST(c AS VARCHAR) FROM pairs),
         |n AS (SELECT DISTINCT src AS node FROM e),
         |l0 AS (SELECT node, node AS lab FROM n)$roundCtes
         |SELECT lab AS community, count(*) AS size
         |FROM l$LpaRounds GROUP BY 1 ORDER BY 1""".stripMargin
    }) { (s, d) =>
      val pairs = Tables.spreadDf(Tables.lineitem(s, d))
        .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
        .select(col("o_custkey").as("c"), col("l_suppkey").as("s"))
        .distinct()
      val e0 = pairs.select(
        concat(lit("c"), col("c").cast("string")).as("src"),
        concat(lit("s"), col("s").cast("string")).as("dst"))
      val edges = e0.union(e0.select(col("dst").as("src"), col("src").as("dst")))
      Graph.labelPropagation(edges, LpaRounds)
        .groupBy(col("lab").as("community"))
        .agg(count(lit(1)).as("size"))
        .orderBy("community")
    },

    // Adamic-Adar co-purchase affinity (Graph.adamicAdar): part pairs
    // scored by their shared orders, each order weighted 1/ln(basket
    // size) so RARE co-occurrence dominates — the link-prediction /
    // recommender prior. Candidates come only through a shared order
    // (one equi-join, never all-pairs); the [2, degCap] basket band is
    // semantic and replayed by the oracle. Weights on a 6dp ln grid
    // (q177 discipline), decimal-summed; top-100 by (score, a, b).
    Q.sql("q180_adamic_adar",
      s"""WITH e AS (
         |  SELECT DISTINCT l_partkey AS src, l_orderkey AS dst
         |  FROM lineitem),
         |deg AS (SELECT dst, count(*) AS deg FROM e
         |        GROUP BY 1 HAVING count(*) BETWEEN 2 AND $AaDegCap),
         |ew AS (
         |  SELECT e.dst, e.src,
         |         floor(1.0 / ln(CAST(deg AS DOUBLE)) * 1e6 + 0.5) / 1e6 AS w
         |  FROM e JOIN deg USING (dst)),
         |p AS (
         |  SELECT a.src AS a, b.src AS b, a.w
         |  FROM ew a JOIN ew b ON a.dst = b.dst AND a.src < b.src)
         |SELECT a, b, count(*) AS n_common,
         |       CAST(SUM(CAST(w AS DECIMAL(38,9))) AS DOUBLE) AS aa_score
         |FROM p GROUP BY 1, 2
         |ORDER BY aa_score DESC, a, b LIMIT 100""".stripMargin) { (s, d) =>
      val e = Tables.spreadDf(Tables.lineitem(s, d))
        .select(col("l_partkey").as("src"), col("l_orderkey").as("dst"))
        .distinct()
      Graph.adamicAdar(e, AaDegCap, scale = 6)
        .orderBy(col("aa_score").desc, col("a"), col("b"))
        .limit(100)
    },

    // Multi-source BFS hop labels (Graph.bfsHops): minimum hop distance
    // from the AUTOMOBILE-segment customers over the symmetric trade
    // graph, BfsRounds frontier-only rounds — reachability / blast-radius
    // analysis, the distance member of the graph family. Pure integer
    // hops; the oracle replays every frontier (expand → dedup → anti-join
    // the label set) as a chained CTE.
    Q.sql("q181_bfs_reachability", {
      val roundCtes = (1 to BfsRounds).map { r =>
        s""",
           |f$r AS (
           |  SELECT DISTINCT e.dst AS node
           |  FROM e JOIN f${r - 1} f ON f.node = e.src
           |  WHERE e.dst NOT IN (SELECT node FROM l${r - 1})),
           |l$r AS (SELECT node, hop FROM l${r - 1}
           |        UNION ALL SELECT node, $r FROM f$r)"""
      }.mkString
      s"""WITH pairs AS (
         |  SELECT DISTINCT o_custkey AS c, l_suppkey AS s
         |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
         |e AS (
         |  SELECT 'c' || CAST(c AS VARCHAR) AS src,
         |         's' || CAST(s AS VARCHAR) AS dst FROM pairs
         |  UNION ALL
         |  SELECT 's' || CAST(s AS VARCHAR), 'c' || CAST(c AS VARCHAR) FROM pairs),
         |f0 AS (
         |  SELECT DISTINCT 'c' || CAST(c_custkey AS VARCHAR) AS node
         |  FROM customer WHERE c_mktsegment = 'AUTOMOBILE'),
         |l0 AS (SELECT node, 0 AS hop FROM f0)$roundCtes
         |SELECT node, CAST(hop AS BIGINT) AS hop
         |FROM l$BfsRounds ORDER BY node""".stripMargin
    }) { (s, d) =>
      val pairs = Tables.spreadDf(Tables.lineitem(s, d))
        .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
        .select(col("o_custkey").as("c"), col("l_suppkey").as("s"))
        .distinct()
      val e0 = pairs.select(
        concat(lit("c"), col("c").cast("string")).as("src"),
        concat(lit("s"), col("s").cast("string")).as("dst"))
      val edges = e0.union(e0.select(col("dst").as("src"), col("src").as("dst")))
      val seeds = Tables.customer(s, d)
        .where(col("c_mktsegment") === "AUTOMOBILE")
        .select(concat(lit("c"), col("c_custkey").cast("string")).as("node"))
      Graph.bfsHops(edges, seeds, BfsRounds)
        .select(col("node"), col("hop"))
        .orderBy("node")
    })
}
