package graft.operators

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.SparkSpec

class IvfIndexSpec extends SparkSpec {
  import spark.implicits._

  private def unit(xs: Double*): Array[Double] = {
    val n = math.sqrt(xs.map(x => x * x).sum)
    xs.map(_ / n).toArray
  }

  // four well-separated directions + noise around each
  private val corpus = Seq(
    (0L, unit(1, 0, 0, 0)), (1L, unit(0.9, 0.1, 0, 0)), (2L, unit(0.95, 0, 0.05, 0)),
    (3L, unit(0, 1, 0, 0)), (4L, unit(0.1, 0.9, 0, 0)),
    (5L, unit(0, 0, 1, 0)), (6L, unit(0, 0.05, 0.95, 0)),
    (7L, unit(0, 0, 0, 1)), (8L, unit(0.05, 0, 0, 0.95)))
    .toDF("vec_id", "embedding")

  test("written IVF index prunes to probed cells and matches ivfTopK") {
    val dir = Files.createTempDirectory("ivfidx").toString
    val cents = Similarity.trainCentroids(corpus, "vec_id", "embedding",
      nLists = 4, iters = 2)
    Similarity.writeIvfIndex(corpus, "vec_id", "embedding", cents, dir)
    // one partition directory per non-empty cell
    val cellDirs = new java.io.File(dir).listFiles().filter(_.getName.startsWith("cell="))
    assert(cellDirs.nonEmpty)

    val queries = corpus.where($"vec_id" === 0L)
    val fromIndex = Similarity.ivfTopKFromIndex(spark, dir, queries,
      "vec_id", "embedding", cents, nProbe = 1, k = 2)
    // the probed scan must carry a partition filter on cell — the pruning
    // SCALE.md claims for repeated searches
    val plan = fromIndex.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("cell"))
    assert(!plan.split("\n").exists(l =>
      l.contains("PartitionFilters: []") && l.contains("nvec")))

    val direct = Similarity.ivfTopK(corpus, queries, "vec_id", "embedding",
        cents, nProbe = 1, k = 2)
      .as[(Long, Long, Double)].collect().toSet
    assert(fromIndex.as[(Long, Long, Double)].collect().toSet == direct)
    assert(direct.map(_._2).subsetOf(Set(1L, 2L))) // same-cell neighbours
  }

  test("deleteFromIvfIndex: search over the post-delete index equals a " +
    "fresh index built without the deleted ids; untouched cell files " +
    "keep their exact names") {
    val dir = Files.createTempDirectory("ivfdel").toString + "/idx"
    val cents = Similarity.trainCentroids(corpus, "vec_id", "embedding",
      nLists = 4, iters = 2)
    Similarity.writeIvfIndex(corpus, "vec_id", "embedding", cents, dir)
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sessionState.newHadoopConf())
    def files(): Set[String] = {
      val it = fs.listFiles(new org.apache.hadoop.fs.Path(dir), true)
      val b = Set.newBuilder[String]
      while (it.hasNext) {
        val f = it.next().getPath
        if (f.getName.endsWith(".parquet")) b += f.toString
      }
      b.result()
    }
    val before = files()
    // delete id 1 — a member of id 0's cell that the search RETURNS
    val r = Similarity.deleteFromIvfIndex(spark, dir, Seq(1L))
    assert(r.rowsDeleted == 1 && r.filesTouched < r.filesTotal)
    assert((before intersect files()).size == before.size - r.filesTouched)
    val queries = corpus.where($"vec_id" === 0L)
    val got = Similarity.ivfTopKFromIndex(spark, dir, queries,
        "vec_id", "embedding", cents, nProbe = 1, k = 2)
      .as[(Long, Long, Double)].collect().toSet
    // reference: an index written from the corpus WITHOUT the deleted id
    // (same centroids — the delete never retrains)
    val freshDir = Files.createTempDirectory("ivffresh").toString + "/idx"
    Similarity.writeIvfIndex(corpus.where($"vec_id" =!= 1L),
      "vec_id", "embedding", cents, freshDir)
    val want = Similarity.ivfTopKFromIndex(spark, freshDir, queries,
        "vec_id", "embedding", cents, nProbe = 1, k = 2)
      .as[(Long, Long, Double)].collect().toSet
    assert(got == want && got.nonEmpty)
    assert(!got.exists(_._2 == 1L), "deleted id still returned")
  }
}
