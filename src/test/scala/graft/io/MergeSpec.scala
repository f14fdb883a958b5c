package graft.io

import java.io.File

import org.apache.spark.sql.functions._
import graft.SparkSpec

class MergeSpec extends SparkSpec {
  import spark.implicits._

  private def parquetFiles(dir: File): Map[String, (Long, Long)] =
    Option(dir.listFiles()).getOrElse(Array.empty)
      .filter(f => f.getName.endsWith(".parquet"))
      .map(f => f.getName -> (f.length(), f.lastModified())).toMap

  test("mergeIntoPartitioned rewrites only touched partitions, upserts by " +
    "version, and keeps untouched partition files byte-identical") {
    val root = java.nio.file.Files.createTempDirectory("mergespec").toString
    val tbl = s"$root/t"
    val hist = Seq(
      (1L, "a", 10.0, 1L), (2L, "a", 20.0, 1L),
      (3L, "b", 30.0, 1L), (4L, "b", 40.0, 1L),
      (5L, "c", 50.0, 1L))
      .toDF("k", "p", "x", "v")
    Writers.writePartitioned(hist, tbl, "p")
    val aBefore = parquetFiles(new File(s"$tbl/p=a"))
    val cBefore = parquetFiles(new File(s"$tbl/p=c"))
    assert(aBefore.nonEmpty && cBefore.nonEmpty)
    Thread.sleep(1100) // mtime granularity

    // batch touches only partition b: update k=3, insert k=6
    val batch = Seq((3L, "b", 300.0, 2L), (6L, "b", 60.0, 2L))
      .toDF("k", "p", "x", "v")
    Writers.mergeIntoPartitioned(tbl, batch, Seq("k"), "v", "p")

    // untouched partitions: identical file names, sizes, and mtimes
    assert(parquetFiles(new File(s"$tbl/p=a")) == aBefore)
    assert(parquetFiles(new File(s"$tbl/p=c")) == cBefore)

    val got = spark.read.parquet(tbl)
      .select("k", "p", "x", "v").orderBy("k")
      .as[(Long, String, Double, Long)].collect().toSeq
    assert(got == Seq(
      (1L, "a", 10.0, 1L), (2L, "a", 20.0, 1L),
      (3L, "b", 300.0, 2L), (4L, "b", 40.0, 1L),
      (5L, "c", 50.0, 1L), (6L, "b", 60.0, 2L)))

    // re-merging the same batch is a no-op on content (idempotent upsert)
    Writers.mergeIntoPartitioned(tbl, batch, Seq("k"), "v", "p")
    val again = spark.read.parquet(tbl)
      .select("k", "p", "x", "v").orderBy("k")
      .as[(Long, String, Double, Long)].collect().toSeq
    assert(again == got)
  }

  test("deleteFromPartitioned erases targeted keys, drops fully-emptied " +
    "partition directories, and leaves untouched partitions byte-identical") {
    val root = java.nio.file.Files.createTempDirectory("delspec").toString
    val tbl = s"$root/t"
    val hist = Seq(
      (1L, "a", 10.0), (2L, "a", 20.0),
      (3L, "b", 30.0), (4L, "b", 40.0),
      (5L, "c", 50.0))
      .toDF("k", "p", "x")
    Writers.writePartitioned(hist, tbl, "p")
    val aBefore = parquetFiles(new File(s"$tbl/p=a"))
    Thread.sleep(1100)

    // delete k=3 from partition b, and ALL of partition c
    val del = Seq((3L, "b"), (5L, "c")).toDF("k", "p")
    Writers.deleteFromPartitioned(tbl, del, Seq("k"), "p")

    assert(parquetFiles(new File(s"$tbl/p=a")) == aBefore) // untouched
    assert(!new File(s"$tbl/p=c").exists()) // fully-emptied dir removed
    val got = spark.read.parquet(tbl).select("k", "p", "x").orderBy("k")
      .as[(Long, String, Double)].collect().toSeq
    assert(got == Seq((1L, "a", 10.0), (2L, "a", 20.0), (4L, "b", 40.0)))

    // deleting absent keys is a no-op
    Writers.deleteFromPartitioned(tbl,
      Seq((99L, "b")).toDF("k", "p"), Seq("k"), "p")
    assert(spark.read.parquet(tbl).count() == 3)
  }

  test("merge with a batch of only-new keys appends without disturbing " +
    "existing rows in the touched partition") {
    val root = java.nio.file.Files.createTempDirectory("mergespec2").toString
    val tbl = s"$root/t"
    Writers.writePartitioned(
      Seq((1L, "a", 1.0, 1L)).toDF("k", "p", "x", "v"), tbl, "p")
    // same version as history is fine for new keys
    Writers.mergeIntoPartitioned(tbl,
      Seq((2L, "a", 2.0, 1L)).toDF("k", "p", "x", "v"),
      keyCols = Seq("k"), versionCol = "v", partitionCol = "p")
    val got = spark.read.parquet(tbl).select("k", "x").orderBy("k")
      .as[(Long, Double)].collect().toSeq
    assert(got == Seq((1L, 1.0), (2L, 2.0)))
  }
}
