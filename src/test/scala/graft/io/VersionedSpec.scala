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

  test("partitioned commits: snapshotWhere prunes to a strict FILE subset " +
    "from manifest metadata alone; delete and OPTIMIZE preserve the " +
    "metadata; a pinned pre-compaction read is isolated") {
    import org.apache.spark.sql.functions._
    val tbl = java.nio.file.Files.createTempDirectory("verpart").toString + "/t"
    def mk(r: Range) = r.map(i => (i.toLong, (i % 4).toLong, s"p_$i"))
      .toDF("id", "b", "pay")
    val v1 = Versioned.commitPartitioned(mk(0 until 400), tbl, "b")
    val v2 = Versioned.commitPartitioned(mk(400 until 500), tbl, "b")
    assert(Seq(v1, v2) == Seq(1, 2))
    def files(df: org.apache.spark.sql.DataFrame) =
      df.select(input_file_name()).distinct().as[String].collect().toSet
    val full = Versioned.snapshot(spark, tbl)
    val pruned = Versioned.snapshotWhere(spark, tbl, "b", Set("3"))
    // the pruned read touches a strict file subset — manifest metadata,
    // no directory listing — and returns exactly the partition's rows
    // (the data column survives the partitioned write)
    assert(files(pruned).size < files(full).size)
    assert(pruned.as[(Long, Long, String)].collect().toSet ==
      mk(0 until 500).where($"b" === 3)
        .as[(Long, Long, String)].collect().toSet)
    // versioned delete on a partitioned table: survivors re-partitioned,
    // metadata pruning intact afterwards
    val v3 = Versioned.deleteWhere(spark, tbl, $"id" < 50, Seq("id"))
    assert(v3 == 3)
    val afterDel = Versioned.snapshotWhere(spark, tbl, "b", Set("1"))
    assert(files(afterDel).size <
      files(Versioned.snapshot(spark, tbl, v3)).size,
      "delete dropped the partition metadata — pruning lost")
    assert(afterDel.as[(Long, Long, String)].collect().toSet ==
      mk(0 until 500).where($"b" === 1 && $"id" >= 50)
        .as[(Long, Long, String)].collect().toSet)
    // versioned OPTIMIZE keeps metadata too; the pinned pre-compaction
    // version reads identically across it
    val pinnedRows = Versioned.snapshot(spark, tbl, v3).count()
    val v4 = Versioned.compactSmallFiles(spark, tbl,
      smallBytes = 64L << 20, sortCols = Seq("id"))
    assert(v4 == 4)
    assert(Versioned.snapshot(spark, tbl, v3).count() == pinnedRows,
      "pinned read changed across compaction")
    val afterOpt = Versioned.snapshotWhere(spark, tbl, "b", Set("2"))
    assert(files(afterOpt).size <
      files(Versioned.snapshot(spark, tbl, v4)).size,
      "OPTIMIZE dropped the partition metadata — pruning lost")
    assert(afterOpt.as[(Long, Long, String)].collect().toSet ==
      mk(0 until 500).where($"b" === 2 && $"id" >= 50)
        .as[(Long, Long, String)].collect().toSet)
    // null partition values abort the commit instead of vanishing
    val bad = Seq((Some(1L), Option.empty[Long], Some("x")))
      .toDF("id", "b", "pay")
    val e = intercept[Throwable] {
      Versioned.commitPartitioned(bad, tbl, "b")
    }
    def chain(t: Throwable) = Iterator.iterate(t)(_.getCause)
      .takeWhile(_ != null).flatMap(c => Option(c.getMessage)).toSeq
    assert(chain(e).exists(_.contains("NULL")))
    // the failed commit released its claim; the next commit lands cleanly
    assert(Versioned.commitPartitioned(mk(500 until 510), tbl, "b") == 5)
  }

  test("manifest tags land atomically with the commit; latestTaggedSuffix " +
    "resolves the epoch boundary across untagged maintenance commits") {
    val tbl = java.nio.file.Files.createTempDirectory("vertag").toString + "/t"
    Versioned.commit(Seq(1).toDF("x"), tbl, tag = Some("epoch:0"))
    Versioned.commit(Seq(2).toDF("x"), tbl, tag = Some("epoch:1"))
    Versioned.commit(Seq(3).toDF("x"), tbl) // untagged (e.g. OPTIMIZE)
    assert(Versioned.versionTag(tbl, 1).contains("epoch:0"))
    assert(Versioned.versionTag(tbl, 3).isEmpty)
    assert(Versioned.latestTaggedSuffix(tbl, "epoch:").contains(1L))
    // tag header lines are invisible to readers
    assert(Versioned.snapshot(spark, tbl).as[Int].collect().sorted
      === Array(1, 2, 3))
  }

  test("vacuum dry run reports the sweep and removes NOTHING; time-based " +
    "retention keeps versions younger than the window past retainLast") {
    val tbl = java.nio.file.Files.createTempDirectory("verdry").toString + "/t"
    Versioned.commit(Seq(1, 2).toDF("x"), tbl)
    Versioned.commit(Seq(9).toDF("x"), tbl, overwrite = true) // orphans c1
    Versioned.commit(Seq(10).toDF("x"), tbl)
    // dry run with count-only retention: c1's files WOULD go
    val planned = Versioned.vacuum(tbl, retainLast = 1, dryRun = true)
    assert(planned.nonEmpty && planned.forall(_.contains("/c1/")))
    // ... but nothing actually moved: every version still reads
    assert(Versioned.snapshot(spark, tbl, 1).count() == 2)
    assert(Versioned.latestVersion(tbl) == 3)
    // a generous time window retains everything despite retainLast=1
    assert(Versioned.vacuum(tbl, retainLast = 1,
      olderThanMs = 24L * 3600 * 1000, dryRun = true).isEmpty)
    // age manifests 1 and 2 beyond the window → the sweep may take c1
    (1 to 2).foreach { k =>
      java.nio.file.Files.setLastModifiedTime(
        java.nio.file.Paths.get(tbl, "_versions", k.toString),
        java.nio.file.attribute.FileTime.fromMillis(
          System.currentTimeMillis() - 3600 * 1000))
    }
    val removed = Versioned.vacuum(tbl, retainLast = 1, olderThanMs = 60000)
    assert(removed.nonEmpty && removed.forall(_.contains("/c1/")))
    assert(Versioned.snapshot(spark, tbl).as[Int].collect().sorted
      === Array(9, 10))
    intercept[Exception] { Versioned.snapshot(spark, tbl, 1).count() }
  }

  test("manifest file stats: snapshotRange prunes files by recorded " +
    "min/max; delete and OPTIMIZE recompute stats for rewritten files; " +
    "stat-less files are kept conservatively") {
    import org.apache.spark.sql.functions._
    val tbl = java.nio.file.Files.createTempDirectory("verstat").toString + "/t"
    val df = (0 until 4000).map(i => (i.toLong, s"p_$i")).toDF("id", "pay")
      .repartitionByRange(8, $"id").sortWithinPartitions("id")
    Versioned.commit(df, tbl, statsCols = Seq("id"))
    def files(d: org.apache.spark.sql.DataFrame) =
      d.select(input_file_name()).distinct().as[String].collect().toSet
    val full = Versioned.snapshot(spark, tbl)
    val ranged = Versioned.snapshotRange(spark, tbl, "id", 500L, 999L)
    assert(files(ranged).size < files(full).size,
      "stats failed to prune the range read")
    // conservative superset: every in-range row present; exact predicate
    // on top gives exactly the range
    assert(ranged.where($"id".between(500, 999)).count() === 500L)
    // delete inside the range: survivors are rewritten WITH fresh stats,
    // so the pruned read stays pruned and exact
    val v2 = Versioned.deleteWhere(spark, tbl, $"id".between(600, 699),
      sortCols = Seq("id"))
    val ranged2 = Versioned.snapshotRange(spark, tbl, "id", 500L, 999L)
    assert(files(ranged2).size <
      files(Versioned.snapshot(spark, tbl, v2)).size,
      "delete dropped the file stats — range pruning lost")
    assert(ranged2.where($"id".between(500, 999)).count() === 400L)
    // OPTIMIZE recomputes stats on the coalesced replacements too
    val v3 = Versioned.compactSmallFiles(spark, tbl, smallBytes = 64L << 20,
      sortCols = Seq("id"))
    assert(v3 == v2 + 1)
    val ranged3 = Versioned.snapshotRange(spark, tbl, "id", 500L, 999L)
    assert(ranged3.where($"id".between(500, 999)).count() === 400L)
    // a stat-less commit (plain dir grain) is kept conservatively
    Versioned.commit(Seq((100000L, "x")).toDF("id", "pay"), tbl)
    val ranged4 = Versioned.snapshotRange(spark, tbl, "id", 500L, 999L)
    assert(ranged4.where($"id".between(500, 999)).count() === 400L)
    assert(Versioned.snapshotRange(spark, tbl, "id", 99000L, 200000L)
      .where($"id" >= 99000L).count() === 1L)
  }

  test("vacuum's empty-dir prune leaves a data dir above the landed " +
    "boundary alone — an in-flight writer's dir mid-write is never swept") {
    val tbl = java.nio.file.Files.createTempDirectory("verinf").toString + "/t"
    Versioned.commit(Seq(1).toDF("x"), tbl)
    // a concurrent writer far along in the claim sequence: dir exists,
    // parquet not yet written (the exact state the prune used to destroy)
    val inflight = java.nio.file.Paths.get(tbl, "data", "c9")
    java.nio.file.Files.createDirectories(inflight)
    java.nio.file.Files.write(inflight.resolve("_temporary_marker"),
      "wip".getBytes("UTF-8"))
    Versioned.vacuum(tbl, retainLast = 1)
    assert(java.nio.file.Files.exists(inflight.resolve("_temporary_marker")),
      "vacuum swept an in-flight writer's un-landed data dir")
  }
}
