package graft

import org.apache.spark.sql.functions._

/** PinnedFrames lifecycle: the registry fixes the round-10 cache leak, but
  * its contract is "caller releases" — nothing used to fail if a new
  * runner forgot. Two pins here:
  *  - behavioral: two pinning operators (marginMine's band table, the
  *    drift report's assignment frame) leave blocks cached until
  *    release(), and release() returns the JVM to its pre-test cache
  *    state — run twice to prove repeated use does not accumulate;
  *  - structural (the tvfTwins-reflection-gate pattern): every main that
  *    iterates SparkEntry.queries must call PinnedFrames.release — a
  *    forgetful new runner fails CI instead of leaking caches per query.
  */
class PinnedFramesSpec extends SparkSpec {
  import spark.implicits._

  private val vecs = (0 until 40).map { i =>
    (i.toLong, Array.tabulate(8)(j => math.sin(i * 8 + j) * 2))
  }.toDF("vec_id", "embedding")

  test("pinning operators register caches; release() drops them, repeatedly") {
    // start from a known state (suites share this JVM)
    PinnedFrames.release()
    spark.catalog.clearCache()
    val rddsBefore = spark.sparkContext.getPersistentRDDs.keySet
    for (round <- 1 to 2) {
      // operator 1: marginMine LSH mode pins its band table
      val mined = graft.operators.Similarity.marginMine(
        vecs.where($"vec_id" % 2 === 0), vecs.where($"vec_id" % 2 === 1),
        "vec_id", "embedding", k = 2, minMargin = 0.0,
        lsh = Some((8, 6, 2)), maxBucketSize = Some(64))
      mined.collect()
      // operator 2: the drift report pins its assignment frame
      val cents = graft.operators.Similarity.trainCentroids(
        vecs.limit(20), "vec_id", "embedding", nLists = 2, iters = 1)
      graft.operators.Similarity.centroidDriftReport(
        vecs.limit(20), vecs.where($"vec_id" >= 20), "vec_id", "embedding",
        cents).collect()
      assert(PinnedFrames.pinnedCount >= 2, s"round $round: expected both " +
        s"operators to pin, got ${PinnedFrames.pinnedCount}")
      assert(spark.sparkContext.getPersistentRDDs.keySet
        .diff(rddsBefore).nonEmpty, s"round $round: nothing actually cached")
      PinnedFrames.release()
      assert(PinnedFrames.pinnedCount == 0, s"round $round: registry not empty")
      assert(spark.sparkContext.getPersistentRDDs.keySet.diff(rddsBefore)
        .isEmpty, s"round $round: blocks survived release()")
    }
  }

  test("structural gate: every registry-iterating main releases PinnedFrames") {
    val root = java.nio.file.Paths.get("src/main/scala/graft")
    assert(java.nio.file.Files.isDirectory(root),
      s"expected to run from the repo root, cwd=${System.getProperty("user.dir")}")
    val mains = {
      val stream = java.nio.file.Files.walk(root)
      try {
        import scala.jdk.CollectionConverters._
        stream.iterator().asScala
          .filter(p => p.toString.endsWith(".scala"))
          .map(p => p -> new String(java.nio.file.Files.readAllBytes(p), "UTF-8"))
          .filter { case (_, text) =>
            text.contains("def main(") && text.contains("SparkEntry.queries")
          }
          .toList
      } finally stream.close()
    }
    // the gate must actually be gating something
    val names = mains.map(_._1.getFileName.toString).toSet
    assert(Set("Bench.scala", "Verify.scala", "ProfileQ.scala")
      .subsetOf(names), s"runner discovery broke: found only $names")
    val offenders = mains.collect {
      case (p, text) if !text.contains("PinnedFrames.release") => p.toString
    }
    assert(offenders.isEmpty,
      s"mains iterating SparkEntry.queries without PinnedFrames.release: " +
        s"$offenders — operator-internal pins leak across their query loop")
  }
}
