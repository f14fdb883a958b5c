package graft.operators

import graft.SparkSpec

class GraphSpec extends SparkSpec {
  import spark.implicits._

  test("pageRank: more in-links ⇒ more rank; dangling nodes keep the floor") {
    // star into b: a→b, c→b, b→a — b collects from two sources, a from
    // one, c from nobody (c only emits) → rank(b) > rank(a) > rank(c)
    val edges = Seq(("a", "b"), ("c", "b"), ("b", "a")).toDF("src", "dst")
    val r = Graph.pageRank(edges, iters = 5, damping = 0.85)
      .as[(String, Double)].collect().toMap
    assert(r("b") > r("a") && r("a") > r("c"))
    // c never receives: exactly the (1 − d) floor after round 1
    assert(math.abs(r("c") - 0.15) < 1e-9)
  }

  test("pageRank in-loop lineage rebase: value-invisible, constant-size plan at 31 iters") {
    val pairs = (0L until 40L).map(i => (s"n${i % 9}", s"n${(i * 3 + 1) % 9}"))
    val edges = pairs.toDF("src", "dst").distinct()
    val norebase = Graph.pageRank(edges, 6, 0.85, rebaseEvery = 100)
      .as[(String, Double)].collect().toMap
    val rebased = Graph.pageRank(edges, 6, 0.85, rebaseEvery = 2)
      .as[(String, Double)].collect().toMap
    assert(norebase == rebased) // bit-identical: rebase changes no value
    // Both plans end ≤ rebaseEvery un-rebased rounds above a leaf, so the
    // 31-iteration plan is the SAME size as the 11-iteration one — without
    // the in-loop rebase, plan size grows ~×3 per round (q40 measurement)
    // and 31 rounds would be astronomically larger, not within 2×.
    val p11 = Graph.pageRank(edges, 11, 0.85).queryExecution.logical.toString.length
    val p31 = Graph.pageRank(edges, 31, 0.85).queryExecution.logical.toString.length
    assert(p31 <= p11 * 2, s"plan grew with iterations: 11-iter=$p11 chars, 31-iter=$p31")
  }

  test("triangleCounts: K4, square+diagonal, and triangle-free graphs") {
    // K4: every node is in C(3,2)=3 triangles
    val k4 = (for { a <- 1L to 4L; b <- (a + 1) to 4L } yield (a, b))
      .toDF("src", "dst")
    val t1 = Graph.triangleCounts(k4).as[(Long, Long)].collect().toMap
    assert(t1 == Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L))
    // square with one diagonal: two triangles sharing edge (1,3)
    val sq = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L), (1L, 3L))
      .toDF("src", "dst")
    val t2 = Graph.triangleCounts(sq).as[(Long, Long)].collect().toMap
    assert(t2 == Map(1L -> 2L, 2L -> 1L, 3L -> 2L, 4L -> 1L))
    // plain square: no triangles → empty result
    val sq0 = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L)).toDF("src", "dst")
    assert(Graph.triangleCounts(sq0).count() == 0)
  }

  test("pageRank is partition-count invariant (decimal-grid determinism)") {
    val pairs = (0L until 60L).map(i => (s"c${i % 12}", s"s${i % 7}"))
    val edges = (pairs ++ pairs.map(p => (p._2, p._1)))
      .toDF("src", "dst").distinct()
    val r1 = Graph.pageRank(edges.repartition(1), 3, 0.85)
      .as[(String, Double)].collect().toMap
    val r32 = Graph.pageRank(edges.repartition(32), 3, 0.85)
      .as[(String, Double)].collect().toMap
    assert(r1 == r32) // bit-identical, not approximately equal
  }

  test("adamicAdar: hand-checked scores, degree band, a<b canonical form") {
    // containers: order 10 = {1,2} (deg 2), order 20 = {1,2,3} (deg 3),
    // order 30 = {4} (deg 1 — excluded), order 40 = {1,2,...,6} capped out
    val e = (Seq((1L, 10L), (2L, 10L), (1L, 20L), (2L, 20L), (3L, 20L),
      (4L, 30L)) ++ (1L to 6L).map(p => (p, 40L)))
      .toDF("src", "dst")
    val got = Graph.adamicAdar(e, degCap = 5, scale = 6)
      .as[(Long, Long, Long, Double)].collect()
      .map(r => ((r._1, r._2), (r._3, r._4))).toMap
    def w(deg: Int): Double =
      math.floor(1.0 / math.log(deg.toDouble) * 1e6 + 0.5) / 1e6
    // decimal sum of grid weights, as the operator computes (exact — NOT
    // the double addition w(2)+w(3), which carries a ulp of error)
    def dsum(ws: Double*): Double =
      ws.map(x => BigDecimal(x).setScale(9)).sum.toDouble
    // pair (1,2): shares order 10 (w(2)) and order 20 (w(3)); the deg-6
    // order 40 is over the cap and the singleton order 30 is below it
    assert(got((1L, 2L)) == ((2L, dsum(w(2), w(3)))))
    assert(got((1L, 3L)) == ((1L, w(3))))
    assert(got((2L, 3L)) == ((1L, w(3))))
    assert(!got.keySet.exists { case (a, b) => a >= b })
    assert(!got.contains((4L, 4L)) && got.size == 3)
  }

  test("bfsHops: min-hop wins, frontier stops at round budget, seeds at 0") {
    // path 1-2-3-4-5 plus shortcut 1-4: node 4 is hop 1 via the shortcut
    val und = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (1L, 4L))
      .toDF("src", "dst")
    val edges = und.union(und.select($"dst".as("src"), $"src".as("dst")))
    val seeds = Seq(1L).toDF("node")
    val got = Graph.bfsHops(edges, seeds, rounds = 2)
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 0L, 2L -> 1L, 4L -> 1L, 3L -> 2L, 5L -> 2L))
    // round budget 1: node 3 and 5 not yet reached
    val g1 = Graph.bfsHops(edges, seeds, rounds = 1)
      .as[(Long, Long)].collect().toMap
    assert(g1 == Map(1L -> 0L, 2L -> 1L, 4L -> 1L))
    // multi-source: nearest seed wins
    val g2 = Graph.bfsHops(edges, Seq(1L, 5L).toDF("node"), rounds = 1)
      .as[(Long, Long)].collect().toMap
    assert(g2 == Map(1L -> 0L, 5L -> 0L, 2L -> 1L, 4L -> 1L))
  }
}
