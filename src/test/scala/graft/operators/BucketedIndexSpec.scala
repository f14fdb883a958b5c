package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.SparkSpec

/** The written-index composition (Dedup.writeIndexBucketed): the history
  * side of every incremental-dedup join must come off disk already
  * hash-clustered on the join key — no Exchange, no re-sort of 100 TB of
  * history per daily ingest. These specs pin (a) the plan shape with the
  * index read from a bucketed managed table and (b) bit-identical results
  * vs the in-flight index frames (q102/q103 run the same composition
  * against the DuckDB oracle).
  */
class BucketedIndexSpec extends SparkSpec {
  import spark.implicits._

  private def cleanTable(t: String): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS `$t`")
    val loc = new java.io.File(s"spark-warehouse/$t")
    if (loc.exists()) {
      import scala.reflect.io.Directory
      new Directory(loc).deleteRecursively(): Unit
    }
  }

  private val docs: DataFrame = Seq(
    (1L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
    (2L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"), // dup of 1
    (3L, "one two three four five six seven eight nine ten"),
    (4L, "one two three four five six seven eight nine ten eleven"),
    (5L, "totally novel words appear here and nowhere else at all"),
    (6L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"), // dup of 1
    (7L, "another batch document with its own fully unique content"),
    (8L, "one two three four five six seven eight nine ten")          // dup of 3
  ).toDF("doc_id", "text")

  private def exchanges(df: DataFrame): Int =
    "Exchange hashpartitioning".r
      .findAllIn(df.queryExecution.executedPlan.toString).length

  private def withConf(key: String, value: String)(body: => Unit): Unit = {
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, value)
    try body
    finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  test("dedupeAgainstIndex over a bucketed fp index: no Exchange on the index side") {
    cleanTable("bix_fp")
    val hist = docs.where($"doc_id" % 2 === 0)
    val batch = docs.where($"doc_id" % 2 =!= 0).select("doc_id", "text")
    val index = hist.select(
      graft.functions.TextFunctions.fingerprint($"text").as("fp")).distinct()
    Dedup.writeIndexBucketed(index, "bix_fp", "fp", numBuckets = 4)

    withConf("spark.sql.autoBroadcastJoinThreshold", "-1")(
        withConf("spark.sql.adaptive.enabled", "false") {
      val bucketed =
        Dedup.dedupeAgainstIndex(batch, "doc_id", "text", spark.table("bix_fp"))
      val plan = bucketed.queryExecution.executedPlan.toString
      // the index scan reads bucket metadata…
      assert(plan.contains("SelectedBucketsCount"), plan)
      // …and the ONLY shuffle in the whole query is the batch side moving
      // into the index's bucket partitioning (anti-join + the keepBest
      // window both reuse it); the index's distinct() aggregates in place.
      assert(exchanges(bucketed) == 1, plan)

      val plain = Dedup.dedupeAgainstIndex(batch, "doc_id", "text", index)
      assert(exchanges(plain) >= 2, "in-flight index should shuffle its side")
      assert(bucketed.select("doc_id", "fp").collect().toSet ==
        plain.select("doc_id", "fp").collect().toSet)
    })
  }

  test("dedupSubstringsIncremental over a bucketed span index: index side exchange-free") {
    cleanTable("bix_span")
    val k = 3
    val hist = docs.where($"doc_id" % 2 === 0)
    val batch = docs.where($"doc_id" % 2 =!= 0)
    val index = Dedup.substringSpanIndex(hist, "doc_id", "text", k)
    Dedup.writeIndexBucketed(index, "bix_span", "h", numBuckets = 4)

    withConf("spark.sql.autoBroadcastJoinThreshold", "-1")(
        withConf("spark.sql.adaptive.enabled", "false") {
      val bucketed = Dedup.dedupSubstringsIncremental(
        batch, "doc_id", "text", k, spark.table("bix_span"))
      val plain = Dedup.dedupSubstringsIncremental(
        batch, "doc_id", "text", k, index)
      val bPlan = bucketed.queryExecution.executedPlan.toString
      assert(bPlan.contains("SelectedBucketsCount"), bPlan)
      // structural form of "no Exchange on the index side": both index
      // consumers (the covered-span semi-join and the novelty anti-join)
      // read the bucketed scan with no shuffle anywhere in between
      import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
      import org.apache.spark.sql.execution.columnar.InMemoryTableScanExec
      import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
      import org.apache.spark.sql.execution.joins.{BaseJoinExec, SortMergeJoinExec}
      // The covered-position frame is persisted (trimCovered's three
      // consumers), which puts the h-grain index joins inside an
      // InMemoryRelation — collect must follow cached plans to see them.
      def deepNodes(p: SparkPlan): Seq[SparkPlan] =
        p.collect { case n => n }.flatMap {
          case s: InMemoryTableScanExec => s +: deepNodes(s.relation.cachedPlan)
          case n => Seq(n)
        }
      def hasIndexScan(p: SparkPlan): Boolean =
        deepNodes(p).exists {
          case f: FileSourceScanExec => f.tableIdentifier.exists(_.table == "bix_span")
          case _ => false
        }
      // immediate consumers only: the join whose right side holds the scan
      // with no further join in between (downstream joins see the scan in
      // their lineage too, legitimately below later batch-side exchanges)
      val indexSides = deepNodes(bucketed.queryExecution.executedPlan).collect {
        case j: SortMergeJoinExec if hasIndexScan(j.right) &&
            deepNodes(j.right).collect { case b: BaseJoinExec => b }.isEmpty => j.right
      }
      // ≥ 2: semi + anti; the anti subtree may be planned twice (novel is
      // consumed both by the first-occurrence aggregate and its re-join)
      assert(indexSides.size >= 2, s"expected semi+anti index consumers:\n$bPlan")
      indexSides.foreach { sub =>
        assert(deepNodes(sub).collect { case e: ShuffleExchangeExec => e }.isEmpty,
          s"index side shuffled:\n$sub")
      }
      // and the bucketed layout strictly reduces total shuffles
      assert(exchanges(plain) > exchanges(bucketed), s"plain=$plain bucketed=$bPlan")
      assert(bucketed.collect().toSet == plain.collect().toSet)
      Dedup.releaseSpanCaches() // caller-owned span caches (see scaladoc)
    })
  }

  test("bm25FromIndex: the query-term filter prunes postings buckets and " +
    "scores equal the one-shot bm25 bit-for-bit") {
    Seq("inv_t_postings", "inv_t_doclen", "inv_t_stats").foreach(cleanTable)
    val terms = Seq("alpha", "one")
    CorpusStats.writeInvertedIndex(docs, "doc_id", "text", "inv_t", nBuckets = 4)
    val fromIndex =
      CorpusStats.bm25FromIndex(spark, "inv_t", "doc_id", terms)
    val plan = fromIndex.queryExecution.executedPlan.toString
    // the isin on the bucket column reaches the postings scan as bucket
    // pruning: strictly fewer than all 4 buckets are read
    val sel = "SelectedBucketsCount: (\\d+) out of (\\d+)".r
      .findFirstMatchIn(plan)
    assert(sel.isDefined, plan)
    assert(sel.get.group(1).toInt < sel.get.group(2).toInt, plan)
    val oneShot = CorpusStats.bm25(docs, "doc_id", "text", terms)
    assert(fromIndex.collect().toSet == oneShot.collect().toSet)
  }
}
