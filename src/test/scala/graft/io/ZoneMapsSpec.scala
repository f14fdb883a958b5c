package graft.io

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ZoneMapsSpec extends SparkSpec {
  import spark.implicits._

  private def clusteredTable(): String = {
    val dir = java.nio.file.Files.createTempDirectory("zm").toString + "/t"
    val df = (0L until 10000L).toDF("k")
      .withColumn("v", col("k") * 3 % 1000)
    df.repartitionByRange(10, col("k")).sortWithinPartitions("k")
      .write.mode("overwrite").parquet(dir)
    dir
  }

  test("pruned scan reads a strict subset of files and the exact rows") {
    val dir = clusteredTable()
    val manifest = ZoneMaps.writeManifest(spark, dir, Seq("k"))
    val (df, read, total) = ZoneMaps.prunedScan(spark, dir, manifest,
      "k", 2500L, 3499L)
    assert(total === 10)
    assert(read < total, s"expected skipping, read $read of $total")
    val got = df.select("k").as[Long].collect().sorted
    assert(got === (2500L to 3499L).toArray)
  }

  test("unclustered column prunes nothing but stays correct") {
    val dir = clusteredTable()
    val manifest = ZoneMaps.writeManifest(spark, dir, Seq("k", "v"))
    // v cycles 0..999 in every file — envelopes all intersect, no skipping
    val (df, read, total) = ZoneMaps.prunedScan(spark, dir, manifest,
      "v", 0L, 5L)
    assert(read === total)
    assert(df.count() ===
      spark.read.parquet(dir).where(col("v").between(0, 5)).count())
  }

  test("empty prune result yields an empty frame, not a crash") {
    val dir = clusteredTable()
    val manifest = ZoneMaps.writeManifest(spark, dir, Seq("k"))
    val (df, read, _) = ZoneMaps.prunedScan(spark, dir, manifest,
      "k", 50000L, 60000L)
    assert(read === 0)
    assert(df.count() === 0)
  }
}
