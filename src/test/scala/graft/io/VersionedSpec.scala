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
    // retention keys off the COMMIT TIMESTAMP header, not file mtime —
    // mtimes don't survive object-store copies or backup restores, so
    // tampering them must change NOTHING about what's retained
    (1 to 3).foreach { k =>
      java.nio.file.Files.setLastModifiedTime(
        java.nio.file.Paths.get(tbl, "_versions", k.toString),
        java.nio.file.attribute.FileTime.fromMillis(
          System.currentTimeMillis() - 48L * 3600 * 1000))
    }
    assert(Versioned.vacuum(tbl, retainLast = 1,
      olderThanMs = 24L * 3600 * 1000, dryRun = true).isEmpty,
      "vacuum trusted a filesystem mtime over the #ts= commit header")
    // age commits 1 and 2 FOR REAL — rewrite their #ts= headers beyond
    // the window (the only clock retention reads) → the sweep takes c1
    (1 to 2).foreach { k =>
      val p = java.nio.file.Paths.get(tbl, "_versions", k.toString)
      val aged = new String(java.nio.file.Files.readAllBytes(p), "UTF-8")
        .linesIterator.map { l =>
          if (l.startsWith("#ts="))
            s"#ts=${System.currentTimeMillis() - 3600 * 1000}"
          else l
        }.mkString("\n")
      java.nio.file.Files.write(p, aged.getBytes("UTF-8"))
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

  test("delta-log commits are O(files added) — manifest bytes never grow " +
    "with table size; snapshot resolution is bounded by checkpoint + " +
    "tail, and the cost gate FAILS on a synthetic full-chain parse") {
    val tbl = java.nio.file.Files.createTempDirectory("verdl").toString + "/t"
    val interval = Versioned.checkpointInterval
    val n = interval * 2 + 5
    (1 to n).foreach(i => Versioned.commit(Seq(i).toDF("x"), tbl): Unit)
    // COMMIT COST: a delta manifest late in the chain is the same size
    // as one early in it (one add line + headers) — the full-snapshot
    // model this replaces grew every manifest with the table
    def mBytes(k: Int) = java.nio.file.Files.size(
      java.nio.file.Paths.get(tbl, "_versions", k.toString))
    assert(mBytes(n) <= mBytes(2) + 8,
      s"manifest $n (${mBytes(n)}B) grew vs manifest 2 (${mBytes(2)}B): " +
        "commit cost is not O(files added)")
    // checkpoints landed on the interval
    assert(java.nio.file.Files.exists(
      java.nio.file.Paths.get(tbl, "_versions", s"$interval.ckpt")))
    assert(java.nio.file.Files.exists(
      java.nio.file.Paths.get(tbl, "_versions", s"${interval * 2}.ckpt")))
    // READ COST GATE: resolving the head parses checkpoint + tail only
    val head = Versioned.snapshot(spark, tbl)
    val cost = Versioned.lastResolveCost
    assert(cost.checkpointUsed.contains(interval * 2) &&
      cost.manifestsRead == n - interval * 2,
      s"resolution did not ride the checkpoint: $cost")
    assert(cost.manifestsRead <= interval,
      s"snapshot resolution read ${cost.manifestsRead} manifests — " +
        "the O(chain) read path is back")
    assert(head.count() == n)
    // PINNED READS across checkpoint boundaries are exact
    assert(Versioned.snapshot(spark, tbl, interval).count() == interval)
    assert(Versioned.snapshot(spark, tbl, interval + 1)
      .count() == interval + 1)
    assert(Versioned.snapshot(spark, tbl, interval * 2 + 1)
      .as[Int].collect().sorted === (1 to interval * 2 + 1).toArray)
    // SYNTHETIC O(chain) PARSE: with the checkpoints gone, resolution
    // falls back to the full chain — and the gate assertion above would
    // fail, which is exactly what it guards
    Seq(interval, interval * 2).foreach { k =>
      java.nio.file.Files.delete(
        java.nio.file.Paths.get(tbl, "_versions", s"$k.ckpt"))
    }
    assert(Versioned.snapshot(spark, tbl).count() == n) // still correct
    val fullChain = Versioned.lastResolveCost
    assert(fullChain.checkpointUsed.isEmpty && fullChain.manifestsRead == n,
      s"expected the checkpoint-less fallback to parse the chain: $fullChain")
    assert(!(fullChain.manifestsRead <= interval),
      "the gate failed to flag a full-chain parse")
  }

  test("commitPartitioned stores RAW partition values — Hive-escaped " +
    "characters round-trip through snapshotWhere; empty-string values " +
    "abort like NULLs") {
    val tbl = java.nio.file.Files.createTempDirectory("veresc").toString + "/t"
    val df = Seq((1, "a b"), (2, "c:d"), (3, "e/f"), (4, "plain"))
      .toDF("id", "p")
    Versioned.commitPartitioned(df, tbl, "p")
    def ids(vs: Set[String]) =
      Versioned.snapshotWhere(spark, tbl, "p", vs)
        .select("id").as[Int].collect().toSet
    // each escaped value resolves its rows (pre-fix: the manifest held
    // 'a%20b' etc. and the raw-value lookup silently pruned EVERYTHING)
    assert(ids(Set("a b")) === Set(1))
    assert(ids(Set("c:d")) === Set(2))
    assert(ids(Set("e/f")) === Set(3))
    assert(ids(Set("plain", "a b")) === Set(1, 4))
    // and the pruning is real: a one-value read touches a strict subset
    import org.apache.spark.sql.functions.input_file_name
    def nFiles(d: org.apache.spark.sql.DataFrame) =
      d.select(input_file_name()).distinct().count()
    assert(nFiles(Versioned.snapshotWhere(spark, tbl, "p", Set("a b"))) <
      nFiles(Versioned.snapshot(spark, tbl)))
    // empty string would land in Hive's default partition and vanish
    // from every pruned read — aborted at write, like NULL
    intercept[Exception] {
      Versioned.commitPartitioned(Seq((5, "")).toDF("id", "p"), tbl, "p")
    }
    // the failed commit released its claim — the log is not wedged
    assert(Versioned.commitPartitioned(
      Seq((6, "late")).toDF("id", "p"), tbl, "p") >= 2)
    assert(ids(Set("late")) === Set(6))
  }

  test("file stats come from parquet FOOTERS — no Spark job, values " +
    "equal the per-file min/max; unusable columns yield no stat") {
    val dir = java.nio.file.Files.createTempDirectory("verfoot")
      .toString + "/pq"
    (0 until 4000).map(i => (i.toLong, i % 97, s"p_$i",
        if (i < 2000) Some(i * 2L) else None))
      .toDF("k", "i", "s", "half")
      .repartitionByRange(4, $"k").sortWithinPartitions("k")
      .write.parquet(dir)
    val files = new java.io.File(dir).listFiles.toSeq
      .map(_.toString).filter(_.endsWith(".parquet")).sorted
    assert(files.size == 4)
    val nonMarkerJobs = new java.util.concurrent.atomic.AtomicInteger(0)
    val markerSeen = new java.util.concurrent.atomic.AtomicBoolean(false)
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        val grp = Option(j.properties)
          .flatMap(p => Option(p.getProperty("spark.jobGroup.id")))
        if (grp.contains("footer-marker")) markerSeen.set(true)
        else nonMarkerJobs.incrementAndGet(): Unit
      }
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      val stats = Versioned.footerStats(
        spark.sparkContext.hadoopConfiguration, files,
        Seq("k", "i", "s", "half"))
      // marker job: listener events are delivered in order, so once the
      // marker's start arrived, any job footerStats had launched would
      // already be counted
      spark.sparkContext.setJobGroup("footer-marker", "barrier")
      try spark.range(1).count(): Unit
      finally spark.sparkContext.clearJobGroup()
      val deadline = System.nanoTime() + 10000000000L
      while (!markerSeen.get() && System.nanoTime() < deadline)
        Thread.sleep(20)
      assert(markerSeen.get(), "marker job never observed")
      assert(nonMarkerJobs.get() == 0,
        s"footer stats launched ${nonMarkerJobs.get()} Spark job(s) — " +
          "the stats pass must be footer-reads only")
      import org.apache.spark.sql.functions._
      files.foreach { f =>
        val r = spark.read.parquet(f)
          .agg(min("k"), max("k"), min("i"), max("i"),
            min("half"), max("half")).head()
        val m = stats(f).toMap
        assert(m(s"s:k") == s"${r.getLong(0)}..${r.getLong(1)}",
          s"k range mismatch for $f")
        assert(m(s"s:i") == s"${r.getInt(2)}..${r.getInt(3)}",
          s"i (int32) range mismatch for $f")
        // string column: non-integral physical type → no s: range
        assert(!m.contains("s:s"))
        // nullable long: present where any non-null value exists, absent
        // for all-null files — both conservative for snapshotRange
        if (r.isNullAt(4)) assert(!m.contains("s:half"))
        else assert(m(s"s:half") == s"${r.getLong(4)}..${r.getLong(5)}")
      }
    } finally spark.sparkContext.removeSparkListener(listener)
  }

  test("landManifest validates at WRITE time — a path the parser cannot " +
    "round-trip (embedded tab) fails the commit loudly instead of " +
    "corrupting the log; non-numeric tag suffixes don't kill " +
    "latestTaggedSuffix") {
    val root = java.nio.file.Files.createTempDirectory("verval")
    val tbl = root.toString + "/bad\ttab"
    intercept[Exception] { Versioned.commit(Seq(1).toDF("x"), tbl) }
    // no manifest landed for the rejected commit
    assert(Versioned.latestVersion(tbl) == 0)
    // an operator-written non-numeric tag is SKIPPED, not a crash
    val ok = root.toString + "/t"
    Versioned.commit(Seq(1).toDF("x"), ok, tag = Some("epoch:3"))
    Versioned.commit(Seq(2).toDF("x"), ok, tag = Some("epoch:final"))
    assert(Versioned.latestTaggedSuffix(ok, "epoch:").contains(3L))
  }

  test("compactSmallFiles caps a HOT partition value: the skewed value's " +
    "rows split across multiple outputs instead of one unsplittable " +
    "file; rows and pruning survive") {
    import org.apache.spark.sql.functions._
    val tbl = java.nio.file.Files.createTempDirectory("verskew").toString + "/t"
    val pay = "x" * 64
    // 10 append commits, each dominated by hot value b=1
    (0 until 10).foreach { k =>
      val part = (0 until 3000).map(i =>
        (k * 10000L + i, if (i < 2700) 1 else 2 + i % 3, pay))
        .toDF("id", "b", "pay").coalesce(1) // one file per value per commit
      Versioned.commitPartitioned(part, tbl, "b"): Unit
    }
    val before = Versioned.snapshot(spark, tbl)
      .select("id").as[Long].collect().sorted
    def valueFiles(b: String) =
      Versioned.snapshotWhere(spark, tbl, "b", Set(b))
        .where(col("b") === b.toInt)
        .select(input_file_name()).distinct().count()
    assert(valueFiles("1") == 10) // one per append
    val smallBytes = 96L << 10 // every file small; hot total >> smallBytes
    val v = Versioned.compactSmallFiles(spark, tbl, smallBytes,
      sortCols = Seq("id"))
    assert(v == 11)
    // the hot value spread over >1 bounded file (pre-fix: exactly 1,
    // arbitrarily large); cold values stayed compact
    assert(valueFiles("1") > 1,
      "hot partition value collapsed into one unsplittable compacted file")
    assert(valueFiles("1") < 10, "compaction made no progress on the hot value")
    assert(valueFiles("2") <= 2)
    val after = Versioned.snapshot(spark, tbl, v)
      .select("id").as[Long].collect().sorted
    assert(after === before)
  }

  test("schema evolution: appends may ADD columns (older files read " +
    "NULL under the recorded schema), never drop or retype; maintenance " +
    "carries the schema; pinned versions keep their own; column order " +
    "is stable") {
    val tbl = java.nio.file.Files.createTempDirectory("verevo").toString + "/t"
    Versioned.commit(Seq((1L, "a"), (2L, "b")).toDF("id", "pay"), tbl)
    // EVOLVE: the append adds `score`
    Versioned.commit(Seq((3L, "c", 7.5)).toDF("id", "pay", "score"), tbl)
    val snap = Versioned.snapshot(spark, tbl)
    assert(snap.columns.toSeq == Seq("id", "pay", "score"))
    assert(snap.orderBy("id").as[(Long, String, Option[Double])]
      .collect().toSeq ==
      Seq((1L, "a", None), (2L, "b", None), (3L, "c", Some(7.5))),
      "pre-evolution files must read the new column as NULL")
    // a PINNED pre-evolution read sees the schema the table had THEN
    assert(Versioned.snapshot(spark, tbl, 1).columns.toSeq ==
      Seq("id", "pay"))
    // dropping or retyping a column fails LOUDLY (the silent alternative
    // is a read schema that depends on which file the reader samples)
    intercept[IllegalArgumentException] {
      Versioned.commit(Seq(4L).toDF("id"), tbl)
    }
    intercept[IllegalArgumentException] {
      Versioned.commit(Seq((4L, 9, 1.0)).toDF("id", "pay", "score"), tbl)
    }
    // the failed commits released their claims; the log is not wedged
    assert(Versioned.latestVersion(tbl) == 2)
    // existing columns REORDERED in the appended frame: recorded order
    // stays stable (parquet reads are name-based)
    Versioned.commit(Seq((4.5, "d", 4L)).toDF("score", "pay", "id"), tbl)
    assert(Versioned.snapshot(spark, tbl).columns.toSeq ==
      Seq("id", "pay", "score"))
    assert(Versioned.snapshot(spark, tbl).where($"id" === 4L)
      .select("pay", "score").as[(String, Double)].head() == ("d", 4.5))
    // maintenance carries the evolved schema verbatim
    val v = Versioned.deleteWhere(spark, tbl, $"id" === 1L)
    val after = Versioned.snapshot(spark, tbl, v)
    assert(after.columns.toSeq == Seq("id", "pay", "score"))
    assert(after.orderBy("id").select("id").as[Long].collect().toSeq ==
      Seq(2L, 3L, 4L))
  }

  test("tag maxima ride the checkpoints: latestTaggedSuffix reads " +
    "checkpoint+tail, and the replay boundary SURVIVES vacuum dropping " +
    "every tagged manifest") {
    val tbl = java.nio.file.Files.createTempDirectory("vertagm").toString + "/t"
    val n = Versioned.checkpointInterval + 3
    (0 until n).foreach { i =>
      Versioned.commit(Seq(i).toDF("x"), tbl, tag = Some(s"epoch:$i")): Unit
    }
    assert(Versioned.latestTaggedSuffix(tbl, "epoch:").contains(n - 1L))
    // the interval checkpoint recorded the running maxima
    val ck = java.nio.file.Paths.get(tbl, "_versions",
      s"${Versioned.checkpointInterval}.ckpt")
    val ckLines = new String(java.nio.file.Files.readAllBytes(ck), "UTF-8")
      .linesIterator.toSeq
    assert(ckLines.contains("#tags-recorded"))
    assert(ckLines.contains(
      s"#maxtag=epoch:\t${Versioned.checkpointInterval - 1}"))
    // an UNTAGGED maintenance-style commit lands after the epochs, then
    // vacuum retains ONLY it: every tagged manifest is dropped, yet the
    // boundary resolves from the retained checkpoint's maxima (the
    // pre-r15 full-scan form returned None here — the retention caveat
    // this closes)
    Versioned.commit(Seq(999).toDF("x"), tbl): Unit
    Versioned.vacuum(tbl, retainLast = 1)
    assert(!java.nio.file.Files.exists(
      java.nio.file.Paths.get(tbl, "_versions", "1")))
    assert(Versioned.latestTaggedSuffix(tbl, "epoch:").contains(n - 1L),
      "vacuum destroyed the exactly-once replay boundary")
  }

  test("CHECK constraints: addCheck validates existing rows, later " +
    "commits/merges enforce inside the write, NULL passes (SQL CHECK " +
    "semantics), dropCheck lifts, constraints survive maintenance and " +
    "overwrite") {
    import org.apache.spark.sql.functions._
    val tbl = java.nio.file.Files.createTempDirectory("verchk").toString + "/t"
    Versioned.commit(
      Seq((1L, Some(10.0)), (2L, None)).toDF("id", "p"), tbl)
    // a check the existing rows violate is rejected
    intercept[IllegalArgumentException] {
      Versioned.addCheck(spark, tbl, "p_big", "p > 100")
    }
    // NULL passes (row 2), positive passes (row 1)
    val vc = Versioned.addCheck(spark, tbl, "p_pos", "p > 0")
    assert(Versioned.tableChecks(tbl, vc) == Seq("p_pos" -> "p > 0"))
    // a violating append fails INSIDE the write; the claim is released
    intercept[Exception] {
      Versioned.commit(Seq((3L, Some(-5.0))).toDF("id", "p"), tbl)
    }
    assert(Versioned.latestVersion(tbl) == vc)
    // clean and null rows land
    val v2 = Versioned.commit(
      Seq((3L, Some(7.0)), (4L, None)).toDF("id", "p"), tbl)
    assert(Versioned.snapshot(spark, tbl, v2).count() == 4)
    // a violating MERGE source fails too
    intercept[Exception] {
      Versioned.merge(spark, tbl,
        Seq((1L, Some(-1.0))).toDF("id", "p"), Seq("id"))
    }
    // constraints ride through maintenance and data overwrite
    val v3 = Versioned.deleteWhere(spark, tbl, $"id" === 4L)
    assert(Versioned.tableChecks(tbl, v3) == Seq("p_pos" -> "p > 0"))
    val v4 = Versioned.commit(
      Seq((9L, Some(1.0))).toDF("id", "p"), tbl, overwrite = true)
    assert(Versioned.tableChecks(tbl, v4) == Seq("p_pos" -> "p > 0"))
    intercept[Exception] {
      Versioned.commit(Seq((10L, Some(-2.0))).toDF("id", "p"), tbl)
    }
    // dropCheck lifts the constraint
    val v5 = Versioned.dropCheck(tbl, "p_pos")
    assert(Versioned.tableChecks(tbl, v5).isEmpty)
    assert(Versioned.commit(
      Seq((10L, Some(-2.0))).toDF("id", "p"), tbl) == v5 + 1)
  }

  test("change data feed: appends synthesize inserts, merge/delete " +
    "record typed changes; a rewriting commit WITHOUT a feed fails the " +
    "read loudly; evolution aligns older rows") {
    import org.apache.spark.sql.functions._
    val tbl = java.nio.file.Files.createTempDirectory("vercdf").toString + "/t"
    Versioned.commit(
      (0 until 100).map(i => (i.toLong, s"v$i")).toDF("id", "pay"), tbl)
    // v2: merge with feed — update 10..19, insert 200..204
    Versioned.merge(spark, tbl,
      ((10 until 20).map(i => (i.toLong, s"u$i")) ++
        (200 until 205).map(i => (i.toLong, s"n$i"))).toDF("id", "pay"),
      Seq("id"), emitChanges = true)
    // v3: delete with feed — ids 50..54
    Versioned.deleteWhere(spark, tbl, $"id".between(50, 54),
      emitChanges = true)
    // v4: plain append (no recorded feed needed — its files ARE inserts)
    Versioned.commit(Seq((300L, "a300")).toDF("id", "pay"), tbl)
    val feed = Versioned.changes(spark, tbl, 0)
    val byType = feed.groupBy(Versioned.ChangeTypeCol).count()
      .as[(String, Long)].collect().toMap
    assert(byType == Map("insert" -> 106L, "update_preimage" -> 10L,
      "update_postimage" -> 10L, "delete" -> 5L), s"got $byType")
    // per-commit attribution and content
    val v2feed = Versioned.changes(spark, tbl, 1, 2)
    assert(v2feed.where(col(Versioned.ChangeTypeCol) === "update_preimage"
        && $"id" === 15L).select("pay").as[String].head() == "v15")
    assert(v2feed.where(col(Versioned.ChangeTypeCol) === "update_postimage"
        && $"id" === 15L).select("pay").as[String].head() == "u15")
    assert(Versioned.changes(spark, tbl, 2, 3)
      .select("id").as[Long].collect().sorted === (50L to 54L).toArray)
    // a rewriting commit WITHOUT a recorded feed fails the read loudly
    Versioned.deleteWhere(spark, tbl, $"id" === 60L) // no emitChanges
    intercept[IllegalArgumentException] {
      Versioned.changes(spark, tbl, 4).collect()
    }
    // an overwrite commit is not representable
    Versioned.commit(Seq((1L, "x")).toDF("id", "pay"), tbl,
      overwrite = true)
    intercept[IllegalArgumentException] {
      Versioned.changes(spark, tbl, 5).collect()
    }
    // evolution: a feed spanning a column-adding commit aligns older
    // rows with NULL
    val tbl2 = java.nio.file.Files.createTempDirectory("vercdf2")
      .toString + "/t"
    Versioned.commit(Seq((1L, "a")).toDF("id", "pay"), tbl2)
    Versioned.commit(Seq((2L, "b", 5.0)).toDF("id", "pay", "score"), tbl2)
    val evo = Versioned.changes(spark, tbl2, 0)
    assert(evo.columns.contains("score"))
    assert(evo.where($"id" === 1L).select("score").head().isNullAt(0))
  }

  test("merge discovery pruning: with key-column stats the discovery " +
    "scan covers only files whose range intersects the source keys — " +
    "strict subset, identical merge result") {
    import org.apache.spark.sql.functions._
    val tbl = java.nio.file.Files.createTempDirectory("vermdp").toString + "/t"
    val base = (0 until 4000).map(i => (i.toLong, s"v$i")).toDF("id", "pay")
      .repartitionByRange(8, $"id").sortWithinPartitions("id")
    Versioned.commit(base, tbl, statsCols = Seq("id"))
    val source = (1000 until 1100).map(i => (i.toLong, s"U$i"))
      .toDF("id", "pay")
    // the candidate set the discovery scan reads is a strict subset
    val expanded = Versioned.snapshot(spark, tbl)
      .select(input_file_name()).distinct().count()
    val cands = Versioned.mergeCandidatesForSpec(spark, tbl,
      Seq("id"), source)
    assert(cands.size < expanded,
      s"discovery not pruned: ${cands.size}/$expanded")
    val v = Versioned.merge(spark, tbl, source, Seq("id"),
      sortCols = Seq("id"))
    val after = Versioned.snapshot(spark, tbl, v)
    assert(after.count() == 4000)
    assert(after.where($"id" === 1050L).select("pay").as[String]
      .head() == "U1050")
    assert(after.where($"id" === 3000L).select("pay").as[String]
      .head() == "v3000")
  }

  test("TIMESTAMP AS OF: snapshotAsOf resolves the latest commit at or " +
    "before the wall-clock; pre-table timestamps fail loudly; the clock " +
    "is the #ts= header, not file mtime") {
    val tbl = java.nio.file.Files.createTempDirectory("verasof").toString + "/t"
    val t0 = System.currentTimeMillis() - 1
    Versioned.commit(Seq(1).toDF("x"), tbl)
    val t1 = System.currentTimeMillis()
    Thread.sleep(5)
    Versioned.commit(Seq(2).toDF("x"), tbl)
    Thread.sleep(5)
    Versioned.commit(Seq(3).toDF("x"), tbl)
    assert(Versioned.versionAt(tbl, t1) == 1)
    assert(Versioned.snapshotAsOf(spark, tbl, t1).as[Int]
      .collect().toSeq == Seq(1))
    assert(Versioned.versionAt(tbl, System.currentTimeMillis()) == 3)
    assert(Versioned.snapshotAsOf(spark, tbl, System.currentTimeMillis())
      .count() == 3)
    intercept[IllegalArgumentException] { Versioned.versionAt(tbl, t0) }
    // the clock is the header: back-dating v3's #ts= moves the boundary
    val p = java.nio.file.Paths.get(tbl, "_versions", "3")
    val reclocked = new String(java.nio.file.Files.readAllBytes(p), "UTF-8")
      .linesIterator.map(l =>
        if (l.startsWith("#ts=")) s"#ts=${t1 + 1}" else l).mkString("\n")
    java.nio.file.Files.write(p, reclocked.getBytes("UTF-8"))
    assert(Versioned.versionAt(tbl, t1 + 1) == 3)
  }

  test("MERGE (upsert): matched keys update, unmatched insert, ONLY " +
    "files holding matched keys rewrite; guards reject duplicate and " +
    "NULL source keys; schema may evolve through the merge; pinned " +
    "pre-merge versions unchanged") {
    import org.apache.spark.sql.functions._
    val tbl = java.nio.file.Files.createTempDirectory("vermrg").toString + "/t"
    val base = (0 until 2000).map(i => (i.toLong, s"v$i"))
      .toDF("id", "pay")
      .repartitionByRange(8, $"id").sortWithinPartitions("id")
    val v1 = Versioned.commit(base, tbl)
    // update ids 100-199 (one clustered band), insert 5000-5004
    val source = ((100 until 200).map(i => (i.toLong, s"UPD$i")) ++
      (5000 until 5005).map(i => (i.toLong, s"NEW$i"))).toDF("id", "pay")
    val v2 = Versioned.merge(spark, tbl, source, Seq("id"),
      sortCols = Seq("id"))
    assert(v2 == v1 + 1)
    val after = Versioned.snapshot(spark, tbl, v2)
    assert(after.count() == 2005)
    assert(after.where($"id" === 150L).select("pay").as[String]
      .head() == "UPD150")
    assert(after.where($"id" === 5002L).select("pay").as[String]
      .head() == "NEW5002")
    assert(after.where($"id" === 50L).select("pay").as[String]
      .head() == "v50", "unmatched target row changed")
    // file-targeted: untouched clustered files are REUSED verbatim
    def files(d: org.apache.spark.sql.DataFrame) =
      d.select(input_file_name()).distinct().as[String].collect().toSet
    val (f1, f2) = (files(Versioned.snapshot(spark, tbl, v1)), files(after))
    assert((f1 intersect f2).nonEmpty, "merge rewrote every file")
    assert((f1 diff f2).nonEmpty, "merge retired no files")
    // pinned pre-merge version unchanged
    assert(Versioned.snapshot(spark, tbl, v1).where($"id" === 150L)
      .select("pay").as[String].head() == "v150")
    // duplicate source keys rejected loudly
    intercept[IllegalArgumentException] {
      Versioned.merge(spark, tbl,
        Seq((1L, "a"), (1L, "b")).toDF("id", "pay"), Seq("id"))
    }
    // NULL source keys rejected loudly
    intercept[IllegalArgumentException] {
      Versioned.merge(spark, tbl,
        Seq((Some(1L), "a"), (None, "b")).toDF("id", "pay"), Seq("id"))
    }
    // schema EVOLUTION through the merge: source adds a column; matched
    // rows carry it, everything else reads NULL
    val v3 = Versioned.merge(spark, tbl,
      Seq((150L, "UPD150b", 9.9)).toDF("id", "pay", "score"), Seq("id"))
    val evolved = Versioned.snapshot(spark, tbl, v3)
    assert(evolved.columns.toSeq == Seq("id", "pay", "score"))
    assert(evolved.where($"id" === 150L)
      .select("pay", "score").as[(String, Double)].head() == ("UPD150b", 9.9))
    assert(evolved.where($"id" === 50L).select("score").head().isNullAt(0))
    // an all-insert merge (no matches) degrades to a pure append:
    // every resident file reused
    val fBefore = files(Versioned.snapshot(spark, tbl))
    Versioned.merge(spark, tbl,
      Seq((9000L, "NEW9000", 1.0)).toDF("id", "pay", "score"), Seq("id"))
    assert(fBefore.subsetOf(files(Versioned.snapshot(spark, tbl))),
      "an unmatched-key merge rewrote resident files")
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
