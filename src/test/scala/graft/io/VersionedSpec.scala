package graft.io

import graft.SparkSpec

class VersionedSpec extends SparkSpec {
  import spark.implicits._

  test("append commits accumulate; old snapshots are immutable") {
    val tbl = java.nio.file.Files.createTempDirectory("ver").toString + "/t"
    assert(Versioned.commit(Seq(1, 2, 3).toDF("x"), tbl) === 1)
    assert(Versioned.commit(Seq(4, 5).toDF("x"), tbl) === 2)
    assert(Versioned.snapshot(spark, tbl, 1).as[Int].collect().sorted
      === Array(1, 2, 3))
    assert(Versioned.snapshot(spark, tbl, 2).as[Int].collect().sorted
      === Array(1, 2, 3, 4, 5))
    // latest by default
    assert(Versioned.snapshot(spark, tbl).count() === 5)
  }

  test("overwrite commit starts the file list fresh; history still readable") {
    val tbl = java.nio.file.Files.createTempDirectory("ver").toString + "/t"
    Versioned.commit(Seq(1, 2).toDF("x"), tbl)
    Versioned.commit(Seq(9).toDF("x"), tbl, overwrite = true)
    assert(Versioned.snapshot(spark, tbl, 2).as[Int].collect().toSeq === Seq(9))
    assert(Versioned.snapshot(spark, tbl, 1).as[Int].collect().sorted
      === Array(1, 2))
    assert(Versioned.latestVersion(tbl) === 2)
  }

  test("reading an empty table fails fast") {
    val tbl = java.nio.file.Files.createTempDirectory("ver").toString + "/t"
    intercept[IllegalArgumentException] {
      Versioned.snapshot(spark, tbl)
    }
  }

  test("concurrent commits serialize — N racing writers land N " +
    "consecutive versions; every commit's rows survive into the final " +
    "snapshot (no lost update)") {
    val tbl = java.nio.file.Files.createTempDirectory("verrace").toString + "/t"
    val failures = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val threads = (1 to 6).map { i =>
      new Thread(() => {
        try Versioned.commit(Seq(i).toDF("x"), tbl): Unit
        catch { case t: Throwable => failures.add(t): Unit }
      })
    }
    threads.foreach(_.start()); threads.foreach(_.join())
    assert(failures.isEmpty, s"commit failed: ${failures.peek()}")
    assert(Versioned.latestVersion(tbl) == 6)
    assert(Versioned.snapshot(spark, tbl).as[Int].collect().sorted
      === (1 to 6).toArray)
    // every intermediate version landed and reads exactly k commits
    (1 to 6).foreach { k =>
      assert(Versioned.snapshot(spark, tbl, k).count() == k,
        s"version $k lost a predecessor's rows")
    }
  }

  test("maintenance aborts on a concurrency conflict instead of landing " +
    "a manifest that drops the interleaved commit") {
    val tbl = java.nio.file.Files.createTempDirectory("verconf").toString + "/t"
    Versioned.commit((0 until 100).map(i => (i.toLong, s"p_$i"))
      .toDF("id", "pay").repartition(4), tbl)
    // an in-flight concurrent writer holds the next version's claim
    val claim = java.nio.file.Paths.get(tbl, "_versions", "2.claim")
    java.nio.file.Files.createFile(claim)
    intercept[java.util.ConcurrentModificationException] {
      Versioned.deleteWhere(spark, tbl, $"id" < 10)
    }
    // nothing landed, the base version is untouched
    assert(Versioned.latestVersion(tbl) == 1)
    assert(Versioned.snapshot(spark, tbl).count() == 100)
    // the in-flight writer goes away → the retry succeeds
    java.nio.file.Files.delete(claim)
    val v = Versioned.deleteWhere(spark, tbl, $"id" < 10)
    assert(v == 2 && Versioned.snapshot(spark, tbl, v).count() == 90)
  }

  test("versioned deleteWhere: a reader pinned to the pre-delete version " +
    "is untouched while the delete commits; the new version has exactly " +
    "the survivors; only affected files are rewritten") {
    import org.apache.spark.sql.functions._
    val tbl = java.nio.file.Files.createTempDirectory("verdel").toString + "/t"
    val df = (0 until 1000).map(i => (i.toLong, s"p_$i")).toDF("id", "pay")
      .repartitionByRange(10, $"id").sortWithinPartitions("id")
    val v1 = Versioned.commit(df, tbl)
    val before = Versioned.snapshot(spark, tbl, v1).count()
    val v2 = Versioned.deleteWhere(spark, tbl, $"id".between(100, 199),
      sortCols = Seq("id"))
    assert(v2 == v1 + 1)
    // snapshot isolation: v1 still reads the FULL pre-delete table
    assert(Versioned.snapshot(spark, tbl, v1).count() == before)
    assert(Versioned.snapshot(spark, tbl, v1)
      .where($"id".between(100, 199)).count() == 100)
    // the new version has the survivors only
    val v2df = Versioned.snapshot(spark, tbl, v2)
    assert(v2df.count() == 900)
    assert(v2df.where($"id".between(100, 199)).count() == 0)
    assert(v2df.select(sum($"id")).head().getLong(0) ==
      (0L until 1000L).filterNot(i => i >= 100 && i <= 199).sum)
    // file-targeted: the v2 manifest reuses most v1 files verbatim
    val files = (v: Int) => Versioned.snapshot(spark, tbl, v)
      .select(input_file_name()).distinct().as[String].collect().toSet
    val shared = files(v1) intersect files(v2)
    assert(shared.nonEmpty && shared.size < files(v1).size,
      s"expected a strict shared-file subset, got ${shared.size}/${files(v1).size}")
    // no-match delete lands no empty commit
    assert(Versioned.deleteWhere(spark, tbl, $"id" > 100000) == v2)
  }

  test("versioned compactSmallFiles: row content identical across the " +
    "commit, large files kept verbatim, old version still readable; " +
    "vacuum then drops exactly the unreferenced files") {
    import org.apache.spark.sql.functions._
    val tbl = java.nio.file.Files.createTempDirectory("vercmp").toString + "/t"
    // commit 1: one large-ish file; commits 2..4: small appends
    Versioned.commit((0 until 20000).map(i => (i.toLong, s"x_$i"))
      .toDF("id", "pay").coalesce(1), tbl)
    (1 to 3).foreach { k =>
      Versioned.commit(Seq((100000L + k, s"a_$k")).toDF("id", "pay"), tbl)
    }
    val v4 = Versioned.latestVersion(tbl)
    val before = Versioned.snapshot(spark, tbl, v4)
      .as[(Long, String)].collect().toSet
    val bigFiles = Versioned.snapshot(spark, tbl, 1)
      .select(input_file_name()).distinct().as[String].collect().toSet
    // threshold = the big file's own size: strictly-smaller files (the
    // appends) compact, the big one is kept verbatim
    val bigSize = java.nio.file.Files.size(
      java.nio.file.Paths.get(new java.net.URI(bigFiles.head)))
    val v5 = Versioned.compactSmallFiles(spark, tbl, smallBytes = bigSize)
    assert(v5 == v4 + 1)
    val after = Versioned.snapshot(spark, tbl, v5)
    assert(after.as[(Long, String)].collect().toSet == before)
    // the large file from commit 1 is still served from ITS original path
    // ... unless it was under the size threshold; at 20k rows it is ~large
    val afterFiles = after.select(input_file_name()).distinct()
      .as[String].collect().toSet
    assert(bigFiles.subsetOf(afterFiles), "large file not kept verbatim")
    // the small appended files are gone from the new version but the old
    // version still reads them
    assert(Versioned.snapshot(spark, tbl, v4).count() == before.size)
    // vacuum to the latest version only: retired small files are removed,
    // the latest version still reads exactly the same rows
    val removed = Versioned.vacuum(tbl, retainLast = 1)
    assert(removed.nonEmpty)
    assert(Versioned.snapshot(spark, tbl)
      .as[(Long, String)].collect().toSet == before)
    assert(removed.forall(f => !afterFiles.exists(_.endsWith(
      java.nio.file.Paths.get(f).getFileName.toString))),
      "vacuum removed a file the retained manifest references")
  }
}
