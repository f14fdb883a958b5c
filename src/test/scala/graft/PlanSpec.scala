package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, Union}
import graft.ops.{Flatten, Groups, Profiling}

/** Plan-shape assertions (SURVEY.md §4): the manual physical optimizations
  * the reference relies on must actually appear in Catalyst's plans —
  * broadcast of small dims, filter/projection pushdown through Union,
  * parquet column pruning and predicate pushdown.
  */
class PlanSpec extends SparkSpec {
  import spark.implicits._

  private lazy val sf = "/root/testdata/sf0.001"

  test("q08 star join broadcasts the dimension tables") {
    val plan = SparkEntry.queries("q08_regional_revenue")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"))
  }

  test("q96: the window row_number idiom plans onto the heap exec via the rewrite") {
    val plan = SparkEntry.queries("q96_top_terms_per_source")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TopKPerGroup ["), plan)   // rewrite fired
    assert(!plan.contains("WindowGroupLimit"), plan) // native limiter subsumed
  }

  test("parquet scan prunes columns and pushes predicates") {
    val df = graft.io.Tables.lineitem(spark, sf)
      .where($"l_quantity" > 30).select("l_orderkey", "l_quantity")
    val scan = df.queryExecution.executedPlan.toString
    assert(scan.contains("PushedFilters: [IsNotNull(l_quantity), GreaterThan(l_quantity,30.0)]"))
    assert(scan.contains("ReadSchema: struct<l_orderkey:bigint,l_quantity:double>"))
  }

  test("filters push through the ANY-union (W2a relies on Catalyst pushdown)") {
    val base = graft.io.Tables.lineitem(spark, sf)
    val unioned = Groups.withAnyGroup(base, "l_returnflag").where($"l_quantity" > 30)
    val optimized = unioned.queryExecution.optimizedPlan
    val union = optimized.collectFirst { case u: Union => u }
    assert(union.isDefined, "expected a Union in the optimized plan")
    // the filter must sit below the union (in each branch), not above it
    val filtersBelow = union.get.children.flatMap(_.collect { case f: Filter => f })
    assert(filtersBelow.size == 2)
    assert(optimized.collect { case f: Filter => f }.size == filtersBelow.size)
  }

  test("profiling runs as a single aggregation pass, not per-column jobs") {
    val df = graft.io.Tables.lineitem(spark, sf)
    val plan = Profiling.nullZeroProfile(df, Seq("l_discount", "l_tax"))
      .queryExecution.executedPlan.toString
    // exactly one scan of the input
    assert("Scan parquet".r.findAllIn(plan).size == 1)
  }

  test("rankedShards never plans a corpus-sized single-partition window") {
    import org.apache.spark.sql.execution.window.WindowExec
    val docs = (1L to 200L).map(i => (i, (i * 3) % 11)).toDF("doc_id", "tok")
    // sparkPlan, not executedPlan: AQE wraps the latter in an
    // AdaptiveSparkPlanExec leaf that collect() cannot descend into
    val plan = graft.operators.Curation.rankedShards(docs, "doc_id", "tok", 4)
      .queryExecution.sparkPlan
    val windows = plan.collect { case w: WindowExec => w }
    assert(windows.size == 2, plan.toString)
    // corpus-side row_number is partitioned (by the weight band)...
    val (global, partitioned) = windows.partition(_.partitionSpec.isEmpty)
    assert(partitioned.size == 1, plan.toString)
    // ...and the only global window sits above the band-histogram
    // aggregate, never the raw corpus
    assert(global.size == 1, plan.toString)
    val aggBelow = global.head.collectFirst {
      case a: org.apache.spark.sql.execution.aggregate.BaseAggregateExec => a
    }
    assert(aggBelow.isDefined, s"global window not over the histogram:\n$plan")
  }

  test("reconcileSchema drops/null-fills/reorders to the target (K7)") {
    val target = Seq((1, "x", 2.0)).toDF("a", "b", "c").schema
    val df = Seq((5.0, 9)).toDF("c", "extra")
    val out = Flatten.reconcileSchema(df, target)
    assert(out.columns.toSeq == Seq("a", "b", "c"))
    val r = out.head()
    assert(r.isNullAt(0) && r.isNullAt(1) && r.getDouble(2) == 5.0)
  }

  test("q146: the bloom probe is a native predicate in the fact scan stage") {
    val plan = SparkEntry.queries("q146_bloom_join_reduction")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("bloom_might_contain_long"), plan)
  }

  test("q150: the MV-routed query plan reads the rollup, never the fact table") {
    val df = SparkEntry.queries("q150_rollup_routing")(spark, sf)
    val scans = df.queryExecution.executedPlan.collectLeaves().map(_.toString)
    assert(scans.exists(_.contains("orders_daily")),
      s"expected the MV scan:\n${scans.mkString("\n")}")
    assert(!scans.exists(_.contains("orders.parquet")),
      s"fact table scanned at query time:\n${scans.mkString("\n")}")
  }

  test("q166: the period-end argmax plans one window, no self-join") {
    val plan = SparkEntry.queries("q166_period_end_balance")(spark, sf)
      .queryExecution.executedPlan
    val joins = plan.collect {
      case j: org.apache.spark.sql.execution.joins.BaseJoinExec => j
    }
    assert(joins.isEmpty, s"argmax should not join:\n$plan")
  }

  test("q186: CDC apply is one sort-free aggregate — no window sort, no join") {
    val plan = SparkEntry.queries("q186_cdc_apply")(spark, sf)
      .queryExecution.executedPlan
    val joins = plan.collect {
      case j: org.apache.spark.sql.execution.joins.BaseJoinExec => j
    }
    assert(joins.isEmpty, s"struct-max argmax should not join:\n$plan")
    assert(!plan.toString.contains("WindowExec"),
      s"struct-max argmax should not sort a window:\n$plan")
  }

  test("q187: phrase search plans the intersections as left-semi joins") {
    val plan = SparkEntry.queries("q187_phrase_search")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("LeftSemi"), plan)
  }

  test("q182: the gram pass has no corpus-wide Exchange before the partials") {
    // the only exchanges allowed are over the tiny (i, j|partition) cell
    // frames — assert none of them carries the embedding column itself
    val plan = SparkEntry.queries("q182_pca_pc1")(spark, sf)
      .queryExecution.executedPlan
    val shuffledEmbedding = plan.collect {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
        if e.child.output.exists(_.name == "embedding") => e
    }
    assert(shuffledEmbedding.isEmpty,
      s"embedding column must never shuffle:\n$plan")
  }

  test("q194: FIFO matching joins on the key, never a cartesian/broadcast NL") {
    val plan = SparkEntry.queries("q194_fifo_cogs")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan)
  }

  test("registry-wide gate: every unpartitioned window sits over a grain-reduced frame") {
    // The bounded-frame discipline for global windows (band histograms,
    // source enums, partition counts, retrieved lists) lives in scaladoc;
    // this gate automates it so one new corpus-grain Window.orderBy cannot
    // sail through review. For EVERY registry query: collect WindowExec
    // nodes with an empty partitionSpec from the pre-AQE physical plan and
    // require each one's child subtree to contain an aggregate, a limit, or
    // a top-k operator — i.e. the frame entering the single-partition sort
    // was already reduced off the corpus grain. Sites that reduce grain in
    // a way the plan can't show locally go on the explicit allowlist below.
    import org.apache.spark.sql.execution.window.{WindowExec, WindowGroupLimitExec}
    import org.apache.spark.sql.execution.{GlobalLimitExec, LocalLimitExec, CollectLimitExec, TakeOrderedAndProjectExec, SparkPlan}
    import org.apache.spark.sql.execution.aggregate.BaseAggregateExec
    // query name -> why its global window is bounded without a local
    // aggregate/limit in the subtree (each verified by hand; a NEW query
    // landing here must justify itself the same way)
    val allowlist: Map[String, String] = Map.empty
    def grainReduced(p: SparkPlan): Boolean = p.collectFirst {
      case a: BaseAggregateExec => a
      case l: GlobalLimitExec => l
      case l: LocalLimitExec => l
      case l: CollectLimitExec => l
      case l: TakeOrderedAndProjectExec => l
      case t: graft.plans.TopKPerGroupExec => t
      case w: WindowGroupLimitExec => w
    }.isDefined
    val violations = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        val plan = fn(spark, sf).queryExecution.sparkPlan
        val globals = plan.collect {
          case w: WindowExec if w.partitionSpec.isEmpty => w
        }
        val unreduced = globals.collect {
          case w if !grainReduced(w.child) && !allowlist.contains(name) =>
            s"$name: global window over an unreduced frame:\n${w.treeString}"
        }
        // round-13 finding #2 tightened: the aggregate benefit-of-the-
        // doubt above does NOT extend to DISTINCT-shaped aggregates —
        // a distinct over an id-like column is not grain-reduced
        // (#distinct ≈ #rows), which is exactly how the old encoder
        // build's single-task sort slipped through this gate. Bounded
        // columns a distinct MAY feed a global window from: the
        // partition-id frames of the global-index/offsets recipe.
        val distinctFed =
          if (allowlist.contains(name)) Nil
          else PlanGates.distinctFedGlobalWindows(plan, Set("__pid"))
            .map(v => s"$name: $v")
        unreduced ++ distinctFed
    }
    assert(violations.isEmpty, violations.mkString("\n\n"))
  }

  test("registry-wide gate: every cartesian/nested-loop join has at least one grain-reduced side") {
    // The window gate's sibling for the other classic 100 TB deadstop: a
    // CartesianProduct (or a BroadcastNestedLoopJoin, its broadcastable
    // little sibling) whose BOTH sides are corpus-grain is O(n*m) work no
    // cluster survives. Legitimate uses in this engine are tiny-frame
    // compositions — crossJoin of three 1-row aggregates (the eval
    // reports), a threshold constant joined under every row — and in all
    // of them at least one side (in practice both) is already an
    // aggregate/limit. Unlike broadcast-vs-shuffle choices, a cartesian
    // does not disappear when statistics grow, so this is a semantic gate
    // the planner cannot save us from.
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.joins.{CartesianProductExec, BroadcastNestedLoopJoinExec}
    import org.apache.spark.sql.execution.aggregate.BaseAggregateExec
    import org.apache.spark.sql.execution.{GlobalLimitExec, LocalLimitExec, CollectLimitExec, TakeOrderedAndProjectExec}
    // Audited sites. The ANN brute/eval family's unreduced side is the
    // QUERY set (`vec_id < NQueries` — bounded by the search contract:
    // cost is #queries × corpus, LINEAR in corpus data), which a plan
    // walk cannot see through a Filter. Their corpus-wide scale paths
    // are the bucketed/celled variants (q26/q41/q105/q140), measured at
    // sf10 in SCALE.md.
    val queryBounded = "unreduced side is the bounded query set " +
      "(vec_id < NQueries); per-query×corpus is linear in data — and the " +
      "bound is MEASURED, not prose: see the queryBound observation test " +
      "above (SimilarityQueries.queryBounds)"
    val allowlist: Map[String, String] = Map(
      "q25_ann_cosine" -> queryBounded,
      "q62_quantized_topk" -> queryBounded,
      "q70_hard_pairs" -> queryBounded,
      "q119_ann_pq" -> queryBounded,
      "q176_knn_accuracy" -> queryBounded,
      "q199_quantization_recall" -> queryBounded,
      "q231_rerank_depth_recall" -> queryBounded,
      "q37_embedding_neardup" -> ("declared exact-quadratic ORACLE " +
        "baseline of embeddingNearDups; q105 is the production LSH path " +
        "(two-tier contract measured in SCALE.md: exact 67.9x at 10x, " +
        "bucketed 33x at 100x)"))
    def grainReduced(p: SparkPlan): Boolean = p.collectFirst {
      case a: BaseAggregateExec => a
      case l: GlobalLimitExec => l
      case l: LocalLimitExec => l
      case l: CollectLimitExec => l
      case l: TakeOrderedAndProjectExec => l
      case r if r.nodeName == "LocalTableScan" || r.nodeName == "RDDScanExec" => r
    }.isDefined
    val violations = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        val plan = fn(spark, sf).queryExecution.sparkPlan
        val loops = plan.collect {
          case j: CartesianProductExec => (j: SparkPlan, j.left, j.right)
          case j: BroadcastNestedLoopJoinExec => (j: SparkPlan, j.left, j.right)
        }
        loops.collect {
          case (j, l, r) if !grainReduced(l) && !grainReduced(r) &&
              !allowlist.contains(name) =>
            s"$name: cartesian/NL join with two unreduced sides:\n${j.treeString}"
        }
    }
    assert(violations.isEmpty, violations.mkString("\n\n"))
  }

  test("cartesian allowlist: every query-bounded side is MEASURED within its contract bound") {
    // The cartesian-gate allowlist below justifies the ANN family with
    // "the unreduced side is the bounded query set" — a prose claim the
    // plan walk cannot check, and a fixture edit could silently unbound
    // it. Each allowlisted site tags its query-set frame with a
    // queryBound:<name> observation (SimilarityQueries.observedQueries);
    // this test RUNS each query and asserts the observed row count stays
    // within the declared contract bound, so an unbounded edit fails CI
    // with a number, not a review miss.
    val bounds = graft.queries.SimilarityQueries.queryBounds
    assert(bounds.nonEmpty)
    val failures = bounds.toSeq.sortBy(_._1).flatMap { case (name, bound) =>
      val df = SparkEntry.queries(name)(spark, sf)
      df.collect()
      val metrics = df.queryExecution.observedMetrics
      metrics.get(s"queryBound:$name") match {
        case None =>
          Some(s"$name: no queryBound observation in the executed plan " +
            s"(observed: ${metrics.keys.mkString(", ")})")
        case Some(row) if row.getLong(0) > bound =>
          Some(s"$name: query side measured ${row.getLong(0)} rows, " +
            s"contract bound $bound")
        case _ => None
      }
    }
    assert(failures.isEmpty, failures.mkString("\n"))
  }

  test("q215: the one-call TVF path reuses the signature exchange like q212") {
    // The TVF body (SqlSurface.createLshCandidatesFunction) is a SECOND
    // copy of the banded-join SQL — the q212 assert below does not cover
    // it, and a drift there (e.g. the bsig band expression) would silently
    // double the signature computation on the one-call path every SQL user
    // actually takes. Same regime: broadcast off + AQE off so the planner
    // picks the SMJ whose shuffle exchanges are reuse candidates.
    val conf = spark.conf
    val prevAqe = conf.get("spark.sql.adaptive.enabled")
    val prevBc = conf.get("spark.sql.autoBroadcastJoinThreshold")
    conf.set("spark.sql.adaptive.enabled", "false")
    conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val plan = SparkEntry.queries("q215_sql_lsh_one_call")(spark, sf)
        .queryExecution.executedPlan
      val reused = plan.collect {
        case r: org.apache.spark.sql.execution.exchange.ReusedExchangeExec => r
      }
      assert(reused.nonEmpty,
        s"TVF banded self-join did not reuse the signature exchange:\n$plan")
    } finally {
      conf.set("spark.sql.adaptive.enabled", prevAqe)
      conf.set("spark.sql.autoBroadcastJoinThreshold", prevBc)
    }
  }

  test("q212: the banded self-join reuses the signature exchange (MinHashAgg canonicalization)") {
    // The at-scale (SMJ) plan for the SQL MinHash pipeline must compute the
    // shingle→sketch→band subtree ONCE and feed both join sides from the
    // same exchange. That only happens if MinHashAgg's canonicalized form
    // is stable across the two aliased scans — a regression there silently
    // doubles the signature computation on every banded self-join. Pin it
    // in the broadcast-off, AQE-off regime where Catalyst plans the SMJ
    // (at sf0.001 defaults the planner picks broadcast, whose
    // BroadcastExchange children are not reuse candidates).
    val conf = spark.conf
    val prevAqe = conf.get("spark.sql.adaptive.enabled")
    val prevBc = conf.get("spark.sql.autoBroadcastJoinThreshold")
    conf.set("spark.sql.adaptive.enabled", "false")
    conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val plan = SparkEntry.queries("q212_sql_minhash_pairs")(spark, sf)
        .queryExecution.executedPlan
      val reused = plan.collect {
        case r: org.apache.spark.sql.execution.exchange.ReusedExchangeExec => r
      }
      assert(reused.nonEmpty,
        s"banded self-join did not reuse the signature exchange:\n$plan")
    } finally {
      conf.set("spark.sql.adaptive.enabled", prevAqe)
      conf.set("spark.sql.autoBroadcastJoinThreshold", prevBc)
    }
  }
}
