package graft.io

import org.apache.spark.sql.functions._
import graft.SparkSpec

class LayoutSpec extends SparkSpec {
  import spark.implicits._

  test("withZValue ≡ Writers.zOrderValue for m=2 and ≡ the Scala reference") {
    val df = (for (x <- 0L until 20L; y <- Seq(0L, 3L, 7L, 15L, 200L))
      yield (x * 13 % 256, y)).toDF("a", "b")
    val both = Layout.withZValue(df, Seq("a", "b"), bits = 9)
      .withColumn("zw", Writers.zOrderValue(col("a"), col("b"), 9))
      .as[(Long, Long, Long, Long)].collect()
    both.foreach { case (a, b, zv, zw) =>
      assert(zv == zw, s"loop form != unrolled form at ($a,$b)")
      assert(zv == Layout.zValueOf(Seq(a, b), 9))
    }
  }

  test("withZValue interleaves 3 dimensions (m>2, beyond the 2-dim Writers form)") {
    val df = Seq((1L, 2L, 4L), (7L, 7L, 7L), (0L, 5L, 3L)).toDF("a", "b", "c")
    val got = Layout.withZValue(df, Seq("a", "b", "c"), bits = 3)
      .as[(Long, Long, Long, Long)].collect()
    assert(got.nonEmpty)
    got.foreach { case (a, b, c, zv) =>
      assert(zv == Layout.zValueOf(Seq(a, b, c), 3))
    }
  }

  test("zBoxBuckets is exact at bucket granularity (exhaustive, 2 dims)") {
    val bits = 4; val bucketBits = 4 // 16x16 grid, 16 buckets
    val boxes = Seq(Seq((2L, 9L), (3L, 12L)), Seq((0L, 15L), (0L, 15L)),
      Seq((5L, 5L), (5L, 5L)), Seq((14L, 15L), (0L, 1L)))
    boxes.foreach { box =>
      val flagged = Layout.zBoxBuckets(box, bits, bucketBits).toSet
      val truth = (for {
        x <- box(0)._1 to box(0)._2
        y <- box(1)._1 to box(1)._2
      } yield Layout.zValueOf(Seq(x, y), bits) >> (bits * 2 - bucketBits)).toSet
      assert(flagged == truth, s"box $box: flagged $flagged != truth $truth")
    }
  }

  test("zBoxBuckets is exact at bucket granularity (exhaustive, 3 dims)") {
    val bits = 3; val bucketBits = 3 // 8x8x8 grid, 8 buckets
    val box = Seq((1L, 6L), (0L, 2L), (5L, 7L))
    val flagged = Layout.zBoxBuckets(box, bits, bucketBits).toSet
    val truth = (for {
      x <- box(0)._1 to box(0)._2
      y <- box(1)._1 to box(1)._2
      z <- box(2)._1 to box(2)._2
    } yield Layout.zValueOf(Seq(x, y, z), bits) >> (bits * 3 - bucketBits)).toSet
    assert(flagged == truth)
  }

  test("z-clustered box read: exact rows, PartitionFilters in the plan, " +
    "strict directory subset") {
    val n = 2000
    val df = (0 until n).map { i =>
      (i.toLong, (i * 37 % 256).toLong, (i * 91 % 256).toLong)
    }.toDF("id", "x", "y")
    val path = java.nio.file.Files.createTempDirectory("zlay").toString + "/t"
    Layout.writeZClustered(df, Seq("x", "y"), bits = 8, bucketBits = 4,
      numFiles = 8, path = path)
    val dims = Seq(("x", 10L, 60L), ("y", 100L, 140L))
    val boxed = Layout.readZBox(spark, path, dims, bits = 8, bucketBits = 4)
    val got = boxed.select("id", "x", "y").as[(Long, Long, Long)]
      .collect().toSet
    val want = df.where($"x".between(10, 60) && $"y".between(100, 140))
      .as[(Long, Long, Long)].collect().toSet
    assert(got == want && got.nonEmpty)
    val plan = boxed.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("zb"))
    // pruning is real: probed buckets are a strict subset of the 16 written
    val probed = Layout.zBoxBuckets(dims.map(d => (d._2, d._3)), 8, 4)
    assert(probed.size < 16)
    // a box outside the domain probes nothing and returns empty cleanly
    val empty = Layout.readZBox(spark, path,
      Seq(("x", 300L, 400L), ("y", 300L, 400L)), bits = 8, bucketBits = 4)
    assert(empty.count() == 0)
  }

  test("graft_zbox TVF: the inline dyadic predicate prunes partitions " +
    "like the Column path and returns identical rows") {
    val n = 2000
    val df = (0 until n).map { i =>
      (i.toLong, (i * 37 % 256).toLong, (i * 91 % 256).toLong)
    }.toDF("id", "x", "y")
    val path = java.nio.file.Files.createTempDirectory("ztvf").toString + "/t"
    Layout.writeZClustered(df, Seq("x", "y"), bits = 8, bucketBits = 4,
      numFiles = 8, path = path)
    spark.read.parquet(path).createOrReplaceTempView("zlay_tvf_view")
    graft.functions.SqlSurface.createZBoxFunction(spark, "zlay_tvf_view",
      Seq("x", "y"), bits = 8, bucketBits = 4)
    val tvf = spark.sql("SELECT id, x, y FROM graft_zbox(10, 60, 100, 140)")
    val dims = Seq(("x", 10L, 60L), ("y", 100L, 140L))
    val col_ = Layout.readZBox(spark, path, dims, bits = 8, bucketBits = 4)
      .select("id", "x", "y")
    assert(tvf.as[(Long, Long, Long)].collect().toSet ==
      col_.as[(Long, Long, Long)].collect().toSet)
    // the dyadic test reaches the scan as a partition filter on zb
    val plan = tvf.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("zb"))
    // a different box through the SAME registered function — the
    // dynamic-args point of the TVF surface
    val other = spark.sql("SELECT id FROM graft_zbox(0, 5, 0, 5)")
      .as[Long].collect().toSet
    val otherWant = df.where($"x" <= 5 && $"y" <= 5).select("id")
      .as[Long].collect().toSet
    assert(other == otherWant)
  }

  test("appendZClustered: box reads stay exact over the grown table; " +
    "resident files untouched") {
    val mk = (r: Range) => r.map { i =>
      (i.toLong, (i * 37 % 256).toLong, (i * 91 % 256).toLong)
    }.toDF("id", "x", "y")
    val path = java.nio.file.Files.createTempDirectory("zapp").toString + "/t"
    Layout.writeZClustered(mk(0 until 1000), Seq("x", "y"), bits = 8,
      bucketBits = 4, numFiles = 4, path = path)
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sessionState.newHadoopConf())
    def files(): Set[String] = {
      val it = fs.listFiles(new org.apache.hadoop.fs.Path(path), true)
      val b = Set.newBuilder[String]
      while (it.hasNext) {
        val f = it.next()
        if (f.getPath.getName.endsWith(".parquet")) b += f.getPath.toString
      }
      b.result()
    }
    val before = files()
    Layout.appendZClustered(mk(1000 until 1500), Seq("x", "y"), bits = 8,
      bucketBits = 4, numFiles = 4, path = path)
    assert(before.subsetOf(files())) // append never rewrites resident files
    val dims = Seq(("x", 10L, 60L), ("y", 100L, 140L))
    val got = Layout.readZBox(spark, path, dims, bits = 8, bucketBits = 4)
      .select("id", "x", "y").as[(Long, Long, Long)].collect().toSet
    val want = mk(0 until 1500)
      .where($"x".between(10, 60) && $"y".between(100, 140))
      .as[(Long, Long, Long)].collect().toSet
    assert(got == want && got.nonEmpty)
  }

  test("compactZBuckets: hot-bucket file counts drop to one, cold buckets " +
    "untouched, box reads identical pre/post") {
    val mk = (r: Range) => r.map { i =>
      (i.toLong, (i * 37 % 256).toLong, (i * 91 % 256).toLong)
    }.toDF("id", "x", "y")
    val path = java.nio.file.Files.createTempDirectory("zcmp").toString + "/t"
    Layout.writeZClustered(mk(0 until 800), Seq("x", "y"), bits = 8,
      bucketBits = 4, numFiles = 2, path = path)
    // three appends → every touched bucket accumulates extra files
    (0 until 3).foreach { k =>
      Layout.appendZClustered(mk(800 + 400 * k until 800 + 400 * (k + 1)),
        Seq("x", "y"), bits = 8, bucketBits = 4, numFiles = 2, path = path)
    }
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sessionState.newHadoopConf())
    def bucketFiles(): Map[String, Set[String]] =
      fs.listStatus(new org.apache.hadoop.fs.Path(path)).toSeq
        .filter(d => d.isDirectory && d.getPath.getName.startsWith("zb="))
        .map { d =>
          d.getPath.getName -> fs.listStatus(d.getPath)
            .filter(f => f.isFile && f.getPath.getName.endsWith(".parquet"))
            .map(_.getPath.toString).toSet
        }.toMap
    val dims = Seq(("x", 10L, 60L), ("y", 100L, 140L))
    val before = Layout.readZBox(spark, path, dims, bits = 8, bucketBits = 4)
      .select("id", "x", "y").as[(Long, Long, Long)].collect().toSet
    val filesBefore = bucketFiles()
    val compacted = Layout.compactZBuckets(spark, path, maxFilesPerBucket = 2)
    assert(compacted.nonEmpty)
    val filesAfter = bucketFiles()
    compacted.foreach { b =>
      assert(filesAfter(s"zb=$b").size == 1 && filesBefore(s"zb=$b").size > 2)
    }
    // cold buckets keep their exact files
    (filesBefore.keySet -- compacted.map(b => s"zb=$b")).foreach { d =>
      assert(filesAfter(d) == filesBefore(d))
    }
    val after = Layout.readZBox(spark, path, dims, bits = 8, bucketBits = 4)
      .select("id", "x", "y").as[(Long, Long, Long)].collect().toSet
    assert(after == before && after.nonEmpty)
  }

  private def causeChain(t: Throwable): Seq[String] =
    Iterator.iterate(t)(_.getCause).takeWhile(_ != null).toSeq
      .flatMap(c => Option(c.getMessage))

  test("writeZClustered rejects values that overflow the bit budget " +
    "(pruning soundness guard, fused into the write's own scan)") {
    val df = Seq((1L, 5L, 3L), (2L, 300L, 9L)).toDF("id", "x", "y")
    val path = java.nio.file.Files.createTempDirectory("zbad").toString + "/t"
    val e = intercept[Throwable] {
      Layout.writeZClustered(df, Seq("x", "y"), bits = 8, bucketBits = 2,
        numFiles = 2, path = path)
    }
    assert(causeChain(e).exists(_.contains("unsound")))
  }

  test("writeZClustered rejects NULL dimension values (they would vanish " +
    "into the null partition and silently miss every box read)") {
    val df = Seq((1L, Some(5L), 3L), (2L, None, 9L)).toDF("id", "x", "y")
    val path = java.nio.file.Files.createTempDirectory("znull").toString + "/t"
    val e = intercept[Throwable] {
      Layout.writeZClustered(df, Seq("x", "y"), bits = 8, bucketBits = 2,
        numFiles = 2, path = path)
    }
    assert(causeChain(e).exists(_.contains("unsound")))
  }

  test("compactZBuckets leaves a __HIVE_DEFAULT_PARTITION__ dir untouched " +
    "(the cast-to-string round-trip cannot cover it) and restores the " +
    "within-file zv sort") {
    val mk = (r: Range) => r.map { i =>
      (i.toLong, (i * 37 % 256).toLong, (i * 91 % 256).toLong)
    }.toDF("id", "x", "y")
    val path = java.nio.file.Files.createTempDirectory("zdef").toString + "/t"
    Layout.writeZClustered(mk(0 until 400), Seq("x", "y"), bits = 8,
      bucketBits = 4, numFiles = 2, path = path)
    (0 until 3).foreach { k =>
      Layout.appendZClustered(mk(400 + 200 * k until 600 + 200 * k),
        Seq("x", "y"), bits = 8, bucketBits = 4, numFiles = 2, path = path)
    }
    // plant a hot null-partition dir an unguarded compactor would destroy
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sessionState.newHadoopConf())
    val defDir = new org.apache.hadoop.fs.Path(path, "zb=__HIVE_DEFAULT_PARTITION__")
    fs.mkdirs(defDir)
    // real parquet bytes (schema inference may sample any file): clone an
    // existing part file of the table into the null-partition dir
    val donor = {
      val it = fs.listFiles(new org.apache.hadoop.fs.Path(path), true)
      var found: org.apache.hadoop.fs.Path = null
      while (found == null && it.hasNext) {
        val f = it.next().getPath
        if (f.getName.endsWith(".parquet")) found = f
      }
      found
    }
    (1 to 4).foreach { i =>
      org.apache.hadoop.fs.FileUtil.copy(fs, donor, fs,
        new org.apache.hadoop.fs.Path(defDir, s"junk_$i.parquet"),
        false, spark.sessionState.newHadoopConf())
    }
    val compacted = Layout.compactZBuckets(spark, path, maxFilesPerBucket = 2)
    assert(compacted.nonEmpty)
    // the planted dir survives byte-for-byte (4 files still there)
    assert(fs.listStatus(defDir).count(_.getPath.getName.endsWith(".parquet")) == 4)
    // compacted buckets are internally zv-sorted again (the writer's order)
    compacted.foreach { b =>
      val rows = spark.read.parquet(s"$path/zb=$b").select("zv")
        .as[Long].collect()
      assert(rows.sameElements(rows.sorted), s"zb=$b not zv-sorted after compaction")
    }
    fs.delete(defDir, true) // cleanup so later readers don't trip on junk
  }

  test("encoded z-layout: (string, skewed long) dims cluster and box-read " +
    "exactly; PartitionFilters prunes a strict bucket subset; unseen " +
    "append values are rejected") {
    val cats = Seq("alpha", "bravo", "charlie", "delta", "echo")
    // skewed ids: a hot key (1000000) plus a long tail — cardinality
    // above 2^bits, so the rank-bucketed encoder path is exercised
    val mk = (r: Range) => r.map { i =>
      val id = if (i % 3 == 0) 1000000L else (i * 7919L) % 100000L
      (i.toLong, cats(i % cats.size), id)
    }.toDF("row", "cat", "skew")
    val path = java.nio.file.Files.createTempDirectory("zenc").toString + "/t"
    val bits = 6; val bucketBits = 4
    Layout.writeZClusteredEncoded(mk(0 until 3000), Seq("cat", "skew"),
      bits, bucketBits, numFiles = 4, path = path)
    // encoder sanity: order-preserving, codes inside the bit budget, and
    // — the 100 TB property — the persisted encoder is CONFIG-sized
    // (≤ 2^bits boundary rows) even though the dimension's cardinality
    // exceeds the dictionary budget
    val encS = Layout.readEncoder(spark, path, "skew")
      .orderBy("value").select("value", "code").as[(Long, Long)].collect()
    assert(encS.map(_._2).forall(c => c >= 0 && c < (1L << bits)))
    assert(encS.sortBy(_._1).map(_._2).sameElements(encS.map(_._2).sorted),
      "skew encoder not order-preserving")
    val nDistinctSkew = mk(0 until 3000).select("skew").distinct().count()
    assert(nDistinctSkew > (1L << bits), "test must exceed the dictionary size")
    assert(encS.length <= (1 << bits),
      s"bounds encoder must persist ≤ 2^$bits boundaries, got ${encS.length}")
    assert(Layout.readEncoder(spark, path, "skew").select("kind")
      .head().getString(0) == Layout.BoundsKind)
    assert(Layout.readEncoder(spark, path, "cat").select("kind")
      .head().getString(0) == Layout.DictKind)
    val got = Layout.readZBoxEncoded(spark, path,
      Seq(("cat", "bravo", "delta"), ("skew", 10000L, 60000L)),
      bits, bucketBits)
    val gotRows = got.select("row").as[Long].collect().toSet
    val want = mk(0 until 3000)
      .where($"cat".between("bravo", "delta") && $"skew".between(10000L, 60000L))
      .select("row").as[Long].collect().toSet
    assert(gotRows == want && gotRows.nonEmpty)
    // the bucket predicate reaches the scan as a partition filter over a
    // strict subset of the bucket dirs
    val plan = got.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("zb"),
      s"no partition filter in:\n$plan")
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sessionState.newHadoopConf())
    val allBuckets = fs.listStatus(new org.apache.hadoop.fs.Path(path))
      .count(d => d.isDirectory && d.getPath.getName.startsWith("zb="))
    val prunedTo = got.select("zb").distinct().count()
    assert(prunedTo < allBuckets, s"no pruning: $prunedTo/$allBuckets")
    // a range that covers no dictionary value proves zero rows scan-free
    assert(Layout.readZBoxEncoded(spark, path,
      Seq(("cat", "f", "g"), ("skew", 10000L, 60000L)),
      bits, bucketBits).count() == 0)
    // append with DICTIONARY values lands and reads exactly (new rows,
    // seen dimension values — the static-dictionary contract)
    val appendBatch = (0 until 500).map { i =>
      val id = if (i % 3 == 0) 1000000L else (i * 7919L) % 100000L
      (3000L + i, cats(i % cats.size), id)
    }.toDF("row", "cat", "skew")
    Layout.appendZClusteredEncoded(appendBatch, Seq("cat", "skew"),
      bits, bucketBits, numFiles = 2, path = path)
    val grown = Layout.readZBoxEncoded(spark, path,
      Seq(("cat", "bravo", "delta"), ("skew", 10000L, 60000L)),
      bits, bucketBits).select("row").as[Long].collect().toSet
    val wantGrown = want ++ appendBatch
      .where($"cat".between("bravo", "delta") && $"skew".between(10000L, 60000L))
      .select("row").as[Long].collect().toSet
    assert(grown == wantGrown && grown.size > want.size)
    // an appended value OUTSIDE the built dictionary must abort, not
    // land in a wrong bucket
    val bad = Seq((9999L, "foxtrot", 12345L)).toDF("row", "cat", "skew")
    val e = intercept[Throwable] {
      Layout.appendZClusteredEncoded(bad, Seq("cat", "skew"),
        bits, bucketBits, numFiles = 1, path = path)
    }
    assert(causeChain(e).exists(_.contains("unsound")))

    // the one-call TVF over the same layout: identical rows to the
    // Column path, and the scalar-subquery code bounds still land the
    // bucket predicate in PartitionFilters (runtime-subquery pruning)
    spark.read.parquet(path).createOrReplaceTempView("zenc_tvf_t")
    Layout.readEncoder(spark, path, "cat")
      .createOrReplaceTempView("zenc_tvf_cat")
    Layout.readEncoder(spark, path, "skew")
      .createOrReplaceTempView("zenc_tvf_skew")
    graft.functions.SqlSurface.createEncodedZBoxFunction(spark,
      "zenc_tvf_t", Seq("cat", "skew"),
      Seq("zenc_tvf_cat", "zenc_tvf_skew"), bits, bucketBits,
      funcName = "zbox_enc_spec")
    val tvf = spark.sql(
      "SELECT row FROM zbox_enc_spec('bravo', 'delta', 10000L, 60000L)")
    assert(tvf.as[Long].collect().toSet == grown)
    val tvfPlan = tvf.queryExecution.executedPlan.toString
    assert(tvfPlan.contains("PartitionFilters") && tvfPlan.contains("zb"),
      s"no partition filter in TVF plan:\n$tvfPlan")
    assert(!tvfPlan.linesIterator.exists(l =>
      l.contains("PartitionFilters: []") && l.contains("zb")),
      "TVF bucket predicate missing from PartitionFilters")
  }

  test("encoder BUILD and ENCODE plans are scale-clean: no unpartitioned " +
    "window over the value frame, no broadcast for the bounds kind — and " +
    "the old single-partition shape is what the gate flags") {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.execution.exchange.BroadcastExchangeExec
    // high-cardinality skewed ids: the exact input class of finding #1
    val df = (0 until 5000).map { i =>
      val id = if (i % 3 == 0) 1000000L else (i * 104729L) % 1000003L
      (i.toLong, id)
    }.toDF("row", "skew")
    val bits = 6
    // BUILD plan: the only global window allowed is the offsets window
    // over (__pid, count) — the value-carrying frame never single-tasks
    val frame = Layout.buildEncoderFrame(df, "skew", bits)
    val buildPlan = frame.queryExecution.sparkPlan
    assert(graft.PlanGates.globalWindowsCarrying(buildPlan, "value").isEmpty,
      s"value frame passed through a single-partition window:\n$buildPlan")
    assert(graft.PlanGates.distinctFedGlobalWindows(buildPlan,
      Set("__pid")).isEmpty, s"distinct-fed global window:\n$buildPlan")
    // the encoder frame itself is config-sized
    assert(frame.count() <= (1L << bits))
    graft.PinnedFrames.release()
    // ENCODE plan (bounds kind): the binary-search expression — no join,
    // no broadcast, no window
    val path = java.nio.file.Files.createTempDirectory("zsc").toString + "/t"
    Layout.writeZClusteredEncoded(df, Seq("skew", "row"), bits,
      bucketBits = 2, numFiles = 2, path = path)
    val enc = Layout.encodeDims(df, spark, path, Seq("skew"))
    val encPlan = enc.queryExecution.sparkPlan
    assert(encPlan.collect {
      case b: BroadcastExchangeExec => b
    }.isEmpty, s"bounds encode must not broadcast:\n$encPlan")
    assert(encPlan.collect {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    }.isEmpty, s"bounds encode must not window:\n$encPlan")
    // the codegen'd lookup agrees with the persisted boundary table's
    // monotone map, including the below-first-boundary NULL
    val bounds = Layout.readEncoder(spark, path, "skew")
      .orderBy("code").select("value", "code").as[(Long, Long)].collect()
    val got = enc.select("skew", "__zenc_skew").as[(Long, Long)].collect()
    got.foreach { case (v, code) =>
      val want = bounds.filter(_._1 <= v).map(_._2).maxOption
      assert(want.contains(code), s"code mismatch for $v")
    }
    // …and the SYNTHETIC old shape (distinct → global row_number) is
    // exactly what the gate flags — the regression can't come back quiet
    val oldShape = df.select($"skew".as("value")).distinct()
      .withColumn("rank",
        org.apache.spark.sql.functions.row_number()
          .over(Window.orderBy("value")))
    val flagged = graft.PlanGates.distinctFedGlobalWindows(
      oldShape.queryExecution.sparkPlan, Set("__pid"))
    assert(flagged.nonEmpty, "the gate failed to flag the old build shape")
    graft.PinnedFrames.release()
  }

  test("extendEncoders: later dict values take codes above the current " +
    "max — resident buckets untouched, box reads exact across old+new; " +
    "interior insertions and code-budget overflow abort") {
    val months = (1 to 6).map(m => f"2024-$m%02d")
    val mk = (ms: Seq[String], off: Int) => ms.zipWithIndex.flatMap {
      case (m, k) => (0 until 40).map(i =>
        ((off + k * 40 + i).toLong, m, (i % 8).toLong))
    }.toDF("row", "month", "id")
    val path = java.nio.file.Files.createTempDirectory("zext").toString + "/t"
    val bits = 3; val bucketBits = 2
    Layout.writeZClusteredEncoded(mk(months, 0), Seq("month", "id"),
      bits, bucketBits, numFiles = 2, path = path)
    // an append carrying an UNSEEN month still aborts without extension
    val jul = (8000 until 8040).map(i =>
      (i.toLong, "2024-07", (i % 8).toLong)).toDF("row", "month", "id")
    val e0 = intercept[Throwable] {
      Layout.appendZClusteredEncoded(jul, Seq("month", "id"),
        bits, bucketBits, numFiles = 1, path = path)
    }
    assert(causeChain(e0).exists(_.contains("unsound")))
    // extension assigns the NEXT code; resident files stay byte-identical
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sessionState.newHadoopConf())
    def files(): Set[String] = {
      val it = fs.listFiles(new org.apache.hadoop.fs.Path(path), true)
      val b = Set.newBuilder[String]
      while (it.hasNext) {
        val f = it.next()
        if (f.getPath.getName.endsWith(".parquet")) b += f.getPath.toString
      }
      b.result()
    }
    val before = files()
    val added = Layout.extendEncoders(jul, Seq("month", "id"), bits, path)
    assert(added == Map("month" -> 1L, "id" -> 0L), s"got $added")
    val encM = Layout.readEncoder(spark, path, "month")
      .orderBy("code").select("value", "code").as[(String, Long)].collect()
    assert(encM.last == ("2024-07", 6L), s"got ${encM.last}")
    Layout.appendZClusteredEncoded(jul, Seq("month", "id"),
      bits, bucketBits, numFiles = 1, path = path)
    assert(before.subsetOf(files()), "extension rewrote resident files")
    // box read across the old/new boundary is exact
    val got = Layout.readZBoxEncoded(spark, path,
      Seq(("month", "2024-05", "2024-07"), ("id", 2L, 5L)),
      bits, bucketBits).select("row").as[Long].collect().toSet
    val want = mk(months, 0).unionByName(jul)
      .where($"month".between("2024-05", "2024-07") && $"id".between(2, 5))
      .select("row").as[Long].collect().toSet
    assert(got == want && got.nonEmpty)
    assert(got.exists(_ >= 8000L), "the appended month missed the box read")
    // an unseen value INTERIOR to the dictionary aborts the extension
    val interior = Seq((9000L, "2024-03x", 1L)).toDF("row", "month", "id")
    val e1 = intercept[IllegalArgumentException] {
      Layout.extendEncoders(interior, Seq("month", "id"), bits, path)
    }
    assert(e1.getMessage.contains("INTERIOR"))
    // overflowing the 2^bits code budget aborts (codes 0..6 used; +2 > 7)
    val over = Seq((9100L, "2024-08", 1L), (9101L, "2024-09", 1L))
      .toDF("row", "month", "id")
    val e2 = intercept[IllegalArgumentException] {
      Layout.extendEncoders(over, Seq("month", "id"), bits, path)
    }
    assert(e2.getMessage.contains("overflow"))
  }

  test("Compaction.recover heals an interrupted swap without running a " +
    "compaction pass") {
    val df = (0 until 500).map { i =>
      (i.toLong, (i * 37 % 256).toLong, (i * 91 % 256).toLong)
    }.toDF("id", "x", "y")
    val path = java.nio.file.Files.createTempDirectory("zpubrec").toString + "/t"
    Layout.writeZClustered(df, Seq("x", "y"), bits = 8, bucketBits = 4,
      numFiles = 2, path = path)
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sessionState.newHadoopConf())
    val total = spark.read.parquet(path).count()
    val live = fs.listStatus(new org.apache.hadoop.fs.Path(path)).toSeq
      .filter(d => d.isDirectory && d.getPath.getName.startsWith("zb="))
      .map(_.getPath).minBy(_.getName)
    // crash between the two renames: aside holds the only copy
    assert(fs.rename(live, new org.apache.hadoop.fs.Path(live.getParent,
      Compaction.asideName(live.getName))))
    assert(spark.read.parquet(path).count() < total) // silently short reads
    assert(Compaction.recover(spark, path))
    assert(spark.read.parquet(path).count() == total)
    assert(!Compaction.recover(spark, path)) // idempotent, nothing to heal
  }

  test("zbox TVF parameters are not shadowed by table columns named " +
    "lo0/hi0 (function-name-qualified references)") {
    // a column legally named lo0 whose values would satisfy NO box —
    // unqualified parameter references would resolve it instead of the
    // call argument and silently return zero rows
    val df = (0 until 400).map { i =>
      (i.toLong, (i % 50).toLong, (i % 30).toLong, 9999L)
    }.toDF("id", "x", "y", "lo0")
    val path = java.nio.file.Files.createTempDirectory("zshad").toString + "/t"
    Layout.writeZClustered(df, Seq("x", "y"), bits = 6, bucketBits = 2,
      numFiles = 2, path = path)
    spark.read.parquet(path).createOrReplaceTempView("zshad_t")
    graft.functions.SqlSurface.createZBoxFunction(spark, "zshad_t",
      Seq("x", "y"), bits = 6, bucketBits = 2, funcName = "zbox_shad")
    val got = spark.sql("SELECT id FROM zbox_shad(10, 20, 5, 15)")
      .as[Long].collect().toSet
    val want = df.where($"x".between(10, 20) && $"y".between(5, 15))
      .select("id").as[Long].collect().toSet
    assert(got == want && got.nonEmpty)
  }

  test("compaction crash recovery: an aside dir with no live twin is " +
    "restored, one with a live twin is cleared — no state loses a copy") {
    val mk = (r: Range) => r.map { i =>
      (i.toLong, (i * 37 % 256).toLong, (i * 91 % 256).toLong)
    }.toDF("id", "x", "y")
    val path = java.nio.file.Files.createTempDirectory("zrec").toString + "/t"
    Layout.writeZClustered(mk(0 until 600), Seq("x", "y"), bits = 8,
      bucketBits = 4, numFiles = 2, path = path)
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sessionState.newHadoopConf())
    val total = spark.read.parquet(path).count()
    val live = fs.listStatus(new org.apache.hadoop.fs.Path(path)).toSeq
      .filter(d => d.isDirectory && d.getPath.getName.startsWith("zb="))
      .map(_.getPath).sortBy(_.getName)
    assert(live.size >= 2)
    // crash state A: between the two renames — live dir moved aside, the
    // staged replacement never landed (aside holds the ONLY copy)
    val a = live.head
    val aAside = new org.apache.hadoop.fs.Path(a.getParent,
      Compaction.asideName(a.getName))
    // the encoded aside name must carry no '=' — Spark's partition
    // discovery only ignores underscore names WITHOUT '=', so a raw
    // aside would surface as a conflicting partition column
    assert(!aAside.getName.contains("=") && aAside.getName.startsWith("_"))
    assert(Compaction.dirNameOfAside(aAside.getName) == a.getName)
    val aRows = spark.read.parquet(a.toString).count()
    assert(fs.rename(a, aAside))
    // crash state B: after the staged dir landed but before cleanup —
    // live dir present AND a stale aside duplicate of the same rows
    val b = live(1)
    val bAside = new org.apache.hadoop.fs.Path(b.getParent,
      Compaction.asideName(b.getName))
    org.apache.hadoop.fs.FileUtil.copy(fs, b, fs, bAside, false,
      spark.sessionState.newHadoopConf())
    // the table stays READABLE while asides exist (the crash window):
    // discovery ignores them instead of inferring a conflicting column
    assert(spark.read.parquet(path).count() == total - aRows)
    // threshold high enough that no bucket is hot — this run is recovery only
    Layout.compactZBuckets(spark, path, maxFilesPerBucket = 1000)
    assert(fs.exists(a) && !fs.exists(aAside), "state A not restored")
    assert(fs.exists(b) && !fs.exists(bAside), "state B aside not cleared")
    assert(spark.read.parquet(path).count() == total)
  }

  test("versioned encoded layout: code-column stats prune files beyond " +
    "bucket pruning; box reads exact across an append through the " +
    "persisted encoders; pinned versions isolated") {
    import org.apache.spark.sql.functions.input_file_name
    // two string dims above the 2^4 budget → bounds encoders spanning
    // the full code domain (dict ranks would leave top bits zero and
    // give the bucket math nothing to prune at this cardinality)
    val mk = (r: Range) => r.map { i =>
      (i.toLong, f"m${i % 40}%03d", f"u${(i * 7) % 60}%03d")
    }.toDF("row", "mon", "usr")
    val tbl = java.nio.file.Files.createTempDirectory("zvenc")
      .toString + "/t"
    val bits = 4; val bucketBits = 2
    val v1 = Layout.writeZClusteredEncodedVersioned(mk(0 until 2000),
      Seq("mon", "usr"), bits, bucketBits, numFiles = 32, table = tbl)
    // append THROUGH the persisted encoders: interior values, no rebuild
    val v2 = Layout.writeZClusteredEncodedVersioned(mk(2000 until 3000),
      Seq("mon", "usr"), bits, bucketBits, numFiles = 32, table = tbl)
    assert(v1 == 1 && v2 == 2)
    // box inside the LOWER half of both code domains (codes ≈ mon 0..4,
    // usr 1..5 of 0..15): the top interleave bits prune buckets, the
    // finer code ranges prune zv-split files within the kept bucket
    val dims = Seq[(String, Any, Any)](("mon", "m002", "m012"),
      ("usr", "u005", "u020"))
    val got = Layout.readZBoxEncodedVersioned(spark, tbl, dims,
      bits, bucketBits)
    val want = mk(0 until 3000)
      .where($"mon".between("m002", "m012") && $"usr".between("u005", "u020"))
    assert(got.select("row").as[Long].collect().sorted ===
      want.select("row").as[Long].collect().sorted)
    assert(got.count() > 0)
    // pruning ladder on the MANIFEST file sets: stats < bucket < full
    def nFiles(d: org.apache.spark.sql.DataFrame) =
      d.select(input_file_name()).distinct().count()
    val statsPruned = Layout.prunedZBoxEncodedVersioned(spark, tbl, dims,
      bits, bucketBits)
    val full = Versioned.snapshot(spark, tbl, v2)
    // bucket-only = the same bucket set WITHOUT the code ranges
    val bucketOnly = {
      val enc = (c: String) => Layout.readEncoder(spark, tbl, c)
      val rs = dims.map { case (c, lo, hi) =>
        val r = enc(c).agg(
          org.apache.spark.sql.functions.max(
            org.apache.spark.sql.functions.when(
              $"value" <= lo.toString, $"code")),
          org.apache.spark.sql.functions.max(
            org.apache.spark.sql.functions.when(
              $"value" <= hi.toString, $"code"))).head()
        ((if (r.isNullAt(0)) 0L else r.getLong(0)), r.getLong(1))
      }
      val buckets = Layout.zBoxBuckets(rs, bits, bucketBits)
      Versioned.snapshotWhere(spark, tbl, "zb",
        buckets.map(_.toString).toSet)
    }
    val (nStats, nBucket, nFull) =
      (nFiles(statsPruned), nFiles(bucketOnly), nFiles(full))
    assert(nBucket < nFull, s"bucket pruning inert: $nBucket/$nFull")
    assert(nStats < nBucket,
      s"code-range stats pruned nothing beyond buckets: $nStats/$nBucket")
    // snapshot isolation: the pinned pre-append version reads only the
    // first commit's rows, through the same double-pruned path
    val pinned = Layout.readZBoxEncodedVersioned(spark, tbl, dims,
      bits, bucketBits, version = v1)
    val wantV1 = mk(0 until 2000)
      .where($"mon".between("m002", "m012") && $"usr".between("u005", "u020"))
    assert(pinned.select("row").as[Long].collect().sorted ===
      wantV1.select("row").as[Long].collect().sorted)
  }

  test("reclusterZVersioned (OPTIMIZE ZORDER): a fragmented append " +
    "history collapses in ONE commit; box reads identical; the pinned " +
    "pre-OPTIMIZE version is untouched") {
    import org.apache.spark.sql.functions.input_file_name
    val mk = (r: Range) => r.map { i =>
      (i.toLong, (i * 37 % 256).toLong, (i * 91 % 256).toLong)
    }.toDF("id", "x", "y")
    val tbl = java.nio.file.Files.createTempDirectory("zrecl")
      .toString + "/t"
    // six appends → every touched bucket holds ~6 file fragments
    val vLast = (0 until 6).map { k =>
      Layout.writeZClusteredVersioned(mk(k * 300 until (k + 1) * 300),
        Seq("x", "y"), bits = 8, bucketBits = 4, numFiles = 4,
        table = tbl)
    }.last
    def nFiles(d: org.apache.spark.sql.DataFrame) =
      d.select(input_file_name()).distinct().count()
    val dims = Seq(("x", 10L, 60L), ("y", 100L, 140L))
    val before = Layout.readZBoxVersioned(spark, tbl, dims, 8, 4)
      .select("id").as[Long].collect().sorted
    val fragmented = nFiles(Versioned.snapshot(spark, tbl))
    val vr = Layout.reclusterZVersioned(spark, tbl, Seq("x", "y"),
      bits = 8, bucketBits = 4, numFiles = 4)
    assert(vr == vLast + 1, "recluster must land one commit")
    val compacted = nFiles(Versioned.snapshot(spark, tbl, vr))
    assert(compacted * 3 <= fragmented,
      s"recluster barely compacted: $fragmented -> $compacted files")
    // identical rows through the same pruned read path
    assert(Layout.readZBoxVersioned(spark, tbl, dims, 8, 4)
      .select("id").as[Long].collect().sorted === before)
    // pruning still real on the rewritten layout
    assert(nFiles(Layout.readZBoxVersioned(spark, tbl, dims, 8, 4)) <
      compacted)
    // the pinned pre-OPTIMIZE version still reads its fragmented files
    assert(Versioned.snapshot(spark, tbl, vLast).count() == 1800)
    assert(nFiles(Versioned.snapshot(spark, tbl, vLast)) == fragmented)
  }

  test("reclusterZVersioned aborts on a concurrency conflict — an " +
    "interleaved commit is never silently dropped by the rewrite") {
    val mk = (r: Range) => r.map { i =>
      (i.toLong, (i * 37 % 256).toLong, (i * 91 % 256).toLong)
    }.toDF("id", "x", "y")
    val tbl = java.nio.file.Files.createTempDirectory("zreclc")
      .toString + "/t"
    Layout.writeZClusteredVersioned(mk(0 until 500), Seq("x", "y"),
      bits = 8, bucketBits = 4, numFiles = 2, table = tbl)
    // a concurrent writer holds the next version number
    val claim = java.nio.file.Paths.get(tbl, "_versions", "2.claim")
    java.nio.file.Files.createFile(claim)
    intercept[java.util.ConcurrentModificationException] {
      Layout.reclusterZVersioned(spark, tbl, Seq("x", "y"), 8, 4, 2)
    }
    assert(Versioned.latestVersion(tbl) == 1)
    java.nio.file.Files.delete(claim)
    assert(Layout.reclusterZVersioned(spark, tbl, Seq("x", "y"), 8, 4, 2)
      == 2)
    assert(Versioned.snapshot(spark, tbl).count() == 500)
  }
}
