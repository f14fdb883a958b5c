package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Incremental IVF maintenance: appended vectors are ASSIGNED to existing
  * centroids (no Lloyd scan over the full corpus) and the drift report
  * gates rebuild. Pins, on a planted fixture:
  *  - append → assign → search equals a full rebuild's top-k when the
  *    appended shard follows the trained distribution;
  *  - the drift report's counts are exact and its shift stays at the
  *    convergence-residual level for in-distribution appends;
  *  - an out-of-distribution append (a NEW cluster the quantizer never
  *    saw) inflates its landing cell's n_new and shift — the rebuild
  *    signal the report exists to raise.
  */
class IvfAppendSpec extends SparkSpec {
  import spark.implicits._

  private def unit(xs: Double*): Array[Double] = {
    val n = math.sqrt(xs.map(x => x * x).sum)
    xs.map(_ / n).toArray
  }

  // two well-separated clusters; ids 0-5 are the base, 6-9 the append
  private val base = Seq(
    (0L, unit(1, 0, 0, 0)), (1L, unit(0, 1, 0, 0)), // init picks: one per cluster
    (2L, unit(0.9, 0.1, 0, 0)), (3L, unit(0.1, 0.9, 0, 0)),
    (4L, unit(0.95, 0, 0.05, 0)), (5L, unit(0, 0.95, 0.05, 0)))
    .toDF("vec_id", "embedding")
  private val appendIn = Seq( // follows the trained distribution
    (6L, unit(0.92, 0.05, 0, 0)), (7L, unit(0.05, 0.92, 0, 0)),
    (8L, unit(0.97, 0, 0, 0.03)), (9L, unit(0, 0.97, 0, 0.03)))
    .toDF("vec_id", "embedding")
  private val appendOut = Seq( // a cluster the quantizer never saw
    (6L, unit(0, 0, 1, 0)), (7L, unit(0, 0.05, 0.95, 0)),
    (8L, unit(0.05, 0, 0.95, 0)), (9L, unit(0, 0, 0.9, 0.1)))
    .toDF("vec_id", "embedding")

  test("in-distribution append: assign-to-existing search == full-rebuild search") {
    val full = base.unionByName(appendIn)
    val centsBase = Similarity.trainCentroids(base, "vec_id", "embedding",
      nLists = 2, iters = 2)
    val centsFull = Similarity.trainCentroids(full, "vec_id", "embedding",
      nLists = 2, iters = 2)
    val queries = full.where($"vec_id" isin (0L, 1L, 6L, 7L))
    def topk(cents: Seq[Array[Double]]) =
      Similarity.ivfTopK(full, queries, "vec_id", "embedding", cents,
          nProbe = 1, k = 3)
        .select($"qid", $"nid").as[(Long, Long)].collect().toSet
    // the appended vectors quantize into the same cells the base trained,
    // so probing the base-trained index returns the same neighbour sets a
    // from-scratch rebuild would — the append skipped the training scan
    assert(topk(centsBase) == topk(centsFull))
  }

  test("appendToIvfIndex: on-disk append keeps pruning and matches the in-memory search") {
    val dir = java.nio.file.Files.createTempDirectory("ivfappend").toString
    val cents = Similarity.trainCentroids(base, "vec_id", "embedding",
      nLists = 2, iters = 2)
    Similarity.writeIvfIndex(base, "vec_id", "embedding", cents, dir)
    Similarity.appendToIvfIndex(appendIn, "vec_id", "embedding", cents, dir)
    val full = base.unionByName(appendIn)
    val queries = full.where($"vec_id" isin (0L, 6L))
    val fromIndex = Similarity.ivfTopKFromIndex(spark, dir, queries,
      "vec_id", "embedding", cents, nProbe = 1, k = 3)
    // pruning survives the append — the probed scan still carries a cell
    // partition filter
    val plan = fromIndex.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("cell"))
    val direct = Similarity.ivfTopK(full, queries, "vec_id", "embedding",
        cents, nProbe = 1, k = 3)
      .as[(Long, Long, Double)].collect().toSet
    assert(fromIndex.as[(Long, Long, Double)].collect().toSet == direct)
    // appended ids are actually searchable from disk
    assert(direct.map(_._2).exists(_ >= 6L))
  }

  test("compactIvfIndex: file count drops, search results identical, pruning kept") {
    val dir = java.nio.file.Files.createTempDirectory("ivfcompact").toString
    val cents = Similarity.trainCentroids(base, "vec_id", "embedding",
      nLists = 2, iters = 2)
    Similarity.writeIvfIndex(base, "vec_id", "embedding", cents, dir)
    // three append batches → several small files per cell (the daily-append
    // accumulation this compaction exists for)
    Seq(appendIn,
      appendIn.withColumn("vec_id", $"vec_id" + 10),
      appendIn.withColumn("vec_id", $"vec_id" + 20))
      .foreach(Similarity.appendToIvfIndex(_, "vec_id", "embedding", cents, dir))
    def filesPerCell: Map[Int, Int] = {
      val root = new java.io.File(dir)
      root.listFiles().filter(f => f.isDirectory && f.getName.startsWith("cell="))
        .map(d => d.getName.stripPrefix("cell=").toInt ->
          d.listFiles().count(_.getName.endsWith(".parquet"))).toMap
    }
    val before = filesPerCell
    assert(before.values.exists(_ > 1), s"fixture built no small files: $before")
    val full = base.unionByName(appendIn)
      .unionByName(appendIn.withColumn("vec_id", $"vec_id" + 10))
      .unionByName(appendIn.withColumn("vec_id", $"vec_id" + 20))
    val queries = full.where($"vec_id" isin (0L, 6L, 17L))
    def search() = Similarity.ivfTopKFromIndex(spark, dir, queries,
      "vec_id", "embedding", cents, nProbe = 1, k = 3)
    val pre = search().as[(Long, Long, Double)].collect().toSet
    spark.catalog.clearCache(); graft.PinnedFrames.release()
    val compacted = Similarity.compactIvfIndex(spark, dir, maxFilesPerCell = 1)
    assert(compacted == before.filter(_._2 > 1).keys.toSeq.sorted)
    val after = filesPerCell
    compacted.foreach(c => assert(after(c) == 1, s"cell $c: ${after(c)} files"))
    // untouched cells keep their files (compaction never rewrites cold cells)
    before.filter(_._2 <= 1).foreach { case (c, n) => assert(after(c) == n) }
    val post = search()
    assert(post.as[(Long, Long, Double)].collect().toSet == pre)
    val plan = post.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("cell"))
    spark.catalog.clearCache(); graft.PinnedFrames.release()
  }

  test("drift report: exact counts, residual shift in-distribution, loud shift out") {
    val centsBase = Similarity.trainCentroids(base, "vec_id", "embedding",
      nLists = 2, iters = 2)
    val in = Similarity.centroidDriftReport(base, appendIn,
        "vec_id", "embedding", centsBase)
      .as[(Int, Long, Long, Double)].collect().sortBy(_._1)
    assert(in.map(r => (r._1, r._2, r._3)).toSeq ==
      Seq((0, 3L, 2L), (1, 3L, 2L))) // 3 base + 2 appended per cluster
    val inMax = in.map(_._4).max

    val out = Similarity.centroidDriftReport(base, appendOut,
        "vec_id", "embedding", centsBase)
      .as[(Int, Long, Long, Double)].collect().sortBy(_._1)
    // the new cluster lands somewhere — all 4 vectors in existing cells
    assert(out.map(_._3).sum == 4L)
    // and drags its landing cell's mean visibly off the trained centroid:
    // the rebuild gate (an order of magnitude above the in-dist residual)
    val outMax = out.map(_._4).max
    assert(outMax > 0.2, s"expected a loud drift signal, got $outMax")
    assert(outMax > 5 * inMax, s"out-shift $outMax vs in-shift $inMax")
  }
}
