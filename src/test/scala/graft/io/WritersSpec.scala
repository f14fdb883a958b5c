package graft.io

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.ops.Skew

class WritersSpec extends SparkSpec {
  import spark.implicits._

  test("bucketed tables join with no Exchange (co-located fact-fact join)") {
    // clean any stale warehouse location from a previous JVM (the in-memory
    // catalog forgets tables across runs but their files persist)
    Seq("bt_facts", "bt_dims").foreach { t =>
      spark.sql(s"DROP TABLE IF EXISTS $t")
      val loc = new java.io.File(s"spark-warehouse/$t")
      if (loc.exists()) {
        import scala.reflect.io.Directory
        new Directory(loc).deleteRecursively()
      }
    }
    val facts = (1 to 1000).map(i => (i.toLong % 100, i.toDouble)).toDF("k", "v")
    val dims = (0L until 100L).map(i => (i, s"d$i")).toDF("k", "name")
    Writers.writeBucketed(facts, "bt_facts", "k", 8)
    Writers.writeBucketed(dims, "bt_dims", "k", 8)
    val joined = spark.table("bt_facts").join(spark.table("bt_dims"), "k")
    // disable auto-broadcast so the bucketing, not a broadcast, removes the shuffle
    withConf("spark.sql.autoBroadcastJoinThreshold", "-1") {
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"))
      assert(!plan.contains("Exchange hashpartitioning"),
        s"expected bucket-co-located join without shuffle, got:\n$plan")
      assert(joined.count() == 1000)
    }
  }

  test("writePartitioned: dynamic overwrite replaces only touched partitions (K1)") {
    val dir = java.nio.file.Files.createTempDirectory("part").toString
    val v1 = Seq((1, "a", 10.0), (2, "b", 20.0)).toDF("id", "season", "x")
    Writers.writePartitioned(v1, dir, "season")
    // overwrite only season=b
    val v2 = Seq((3, "b", 99.0)).toDF("id", "season", "x")
    Writers.writePartitioned(v2, dir, "season")
    val out = spark.read.parquet(dir).orderBy("id").collect()
    assert(out.map(_.getInt(0)).toSeq == Seq(1, 3)) // a kept, b replaced
  }

  test("writePartitioned: a hot partition value splits across size-capped " +
      "files instead of one straggler task (rebalance distribution)") {
    // 1 hot value carrying ~all rows + 2 cold values. With a small
    // advisory partition size, AQE's rebalance must split the hot value
    // across several write tasks (→ several files in its directory) while
    // the cold values stay ~1 file each — the skew half of the Iceberg
    // hash-distribution model (plain repartition(col) would funnel the
    // hot value through ONE task, the VERDICT r15 straggler).
    val dir = java.nio.file.Files.createTempDirectory("hotpart").toString
    val hot = spark.range(200000).select(
      col("id"), lit("hot").as("season"),
      concat(lit("payload-"), col("id")).as("x"))
    val cold = Seq((-1L, "c1", "a"), (-2L, "c2", "b")).toDF("id", "season", "x")
    withConf("spark.sql.adaptive.advisoryPartitionSizeInBytes", "262144") {
      Writers.writePartitioned(hot.unionByName(cold), dir, "season")
    }
    def files(v: String) = new java.io.File(s"$dir/season=$v")
      .listFiles().count(_.getName.endsWith(".parquet"))
    assert(files("hot") > 1, s"hot value wrote ${files("hot")} file(s) — skew not split")
    assert(files("c1") == 1 && files("c2") == 1,
      "cold values must stay one task → one file")
    assert(spark.read.parquet(dir).count() == 200002)
  }

  test("duplicatesReport writes all members of duplicate key groups (K9)") {
    val dir = java.nio.file.Files.createTempDirectory("dups").toString + "/report"
    val df = Seq(
      ("p1", "2024", 1.0), ("p1", "2024", 2.0), // dup pair on (profile, season)
      ("p2", "2024", 3.0))
      .toDF("profileId", "season", "x")
    val n = Writers.duplicatesReport(df, Seq("profileId", "season"), dir)
    assert(n == 2) // keep=False: both members reported
    val written = spark.read.option("header", "true").csv(dir)
    assert(written.count() == 2)
    assert(written.where(col("profileId") === "p2").count() == 0)
    // clean frame → nothing written, zero returned
    val dir2 = java.nio.file.Files.createTempDirectory("dups").toString + "/report"
    assert(Writers.duplicatesReport(df.dropDuplicates("profileId"),
      Seq("profileId"), dir2) == 0)
    assert(!new java.io.File(dir2).exists())
  }

  test("guards: hasAtLeast / writeIfAtLeast skip degenerate frames (F9)") {
    import graft.ops.Guards
    val df = Seq(1, 2, 3).toDF("x")
    assert(Guards.hasAtLeast(df, 3) && !Guards.hasAtLeast(df, 4))
    var wrote = false
    assert(!Guards.writeIfAtLeast(df.where(col("x") > 10), 1) { _ => wrote = true })
    assert(!wrote)
    assert(Guards.writeIfAtLeast(df, 2) { _ => wrote = true } && wrote)
  }

  test("saltedJoin equals the plain join (skew-spread is semantics-free)") {
    val big = (1 to 500).map(i => (if (i % 10 == 0) 1L else i.toLong, i)).toDF("k", "v")
    val small = (1L to 500L).map(i => (i, s"n$i")).toDF("k", "name")
    val plain = big.join(small, Seq("k")).orderBy("v")
    val salted = Skew.saltedJoin(big, small, Seq("k"), 4).orderBy("v")
    assert(plain.collect().map(_.toSeq).toSeq == salted.collect().map(_.toSeq).toSeq)
  }

  test("scanManifest reports per-file rows and min/max for the audit column") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val dir = java.nio.file.Files.createTempDirectory("manifest").toString + "/t"
    // range-clustered write: each of 4 files covers a disjoint v interval
    (0L until 400L).toDF("v").repartitionByRange(4, col("v")).write.parquet(dir)
    val m = Writers.scanManifest(spark, dir, Seq("v"))
      .select("rows", "min_v", "max_v").as[(Long, Long, Long)].collect()
    assert(m.length == 4)
    assert(m.map(_._1).sum == 400L)
    // disjoint, clustered intervals — the property a pruning audit checks
    val sorted = m.sortBy(_._2)
    assert(sorted.sliding(2).forall { case Array(a, b) => a._3 < b._2; case _ => true })
  }

  test("zOrderValue interleaves bits; z-layout clusters BOTH columns, single-sort only one") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // interleave sanity: a=0b11, b=0b00 → z=0b0101; a=0, b=0b11 → z=0b1010
    val z = Seq((3L, 0L), (0L, 3L)).toDF("a", "b")
      .select(Writers.zOrderValue(col("a"), col("b"), 2)).as[Long].collect()
    assert(z.toSeq == Seq(5L, 10L))

    // 64×64 grid, uniform: measure per-file span of each dim under both layouts
    val grid = (0 until 4096).map(i => (i / 64L, i % 64L)).toDF("x", "y")
    def spans(path: String): (Double, Double) = {
      val m = Writers.scanManifest(spark, path, Seq("x", "y"))
        .select("min_x", "max_x", "min_y", "max_y")
        .as[(Long, Long, Long, Long)].collect()
      (m.map(r => r._2 - r._1).sum.toDouble / m.length,
        m.map(r => r._4 - r._3).sum.toDouble / m.length)
    }
    val base = java.nio.file.Files.createTempDirectory("zorder").toString
    Writers.writeZOrdered(grid, s"$base/z", "x", "y", numFiles = 16, bits = 6)
    grid.repartitionByRange(16, col("x")).sortWithinPartitions("x")
      .write.parquet(s"$base/xsort")
    val (zx, zy) = spans(s"$base/z")
    val (sx, sy) = spans(s"$base/xsort")
    // x-sort: x-span tight (~4) but y-span is the full 63 per file
    assert(sx < 8 && sy > 50, s"sx=$sx sy=$sy")
    // z-order: BOTH dims bounded well below the full range
    assert(zx < 32 && zy < 32, s"zx=$zx zy=$zy")
    // and data round-trips identically
    assert(spark.read.parquet(s"$base/z").as[(Long, Long)].collect().toSet ==
      grid.as[(Long, Long)].collect().toSet)
  }

  test("writeZOrderedQuantized: 3 raw double columns cluster in every dim") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // 16×16×16 lattice on awkward raw scales (negative offsets, floats) —
    // the quantizing front door must handle these without pre-bucketing
    val pts = (0 until 4096).map { i =>
      val (x, y, zc) = (i / 256, (i / 16) % 16, i % 16)
      (i.toLong, x * 3.5 - 100.0, y * 0.25 + 7.0, zc * 11.0)
    }.toDF("id", "x", "y", "z")
    val base = java.nio.file.Files.createTempDirectory("zorderq").toString
    Writers.writeZOrderedQuantized(pts, s"$base/zq", Seq("x", "y", "z"),
      targetFiles = 16, bits = 4)
    pts.repartitionByRange(16, col("x")).sortWithinPartitions("x")
      .write.parquet(s"$base/xsort")
    def spans(path: String): Seq[Double] = {
      val m = Writers.scanManifest(spark, path, Seq("x", "y", "z"))
        .select("min_x", "max_x", "min_y", "max_y", "min_z", "max_z")
        .as[(Double, Double, Double, Double, Double, Double)].collect()
      Seq(m.map(r => r._2 - r._1).sum / m.length,
        m.map(r => r._4 - r._3).sum / m.length,
        m.map(r => r._6 - r._5).sum / m.length)
    }
    val zs = spans(s"$base/zq")
    val ss = spans(s"$base/xsort")
    // full ranges: x 52.5, y 3.75, z 165. x-sort: only x tight.
    assert(ss(0) < 7 && ss(1) > 3.0 && ss(2) > 130, ss.toString)
    // z-order: every dim bounded well under half its full range
    assert(zs(0) < 26 && zs(1) < 1.9 && zs(2) < 83, zs.toString)
    // data round-trips identically
    assert(spark.read.parquet(s"$base/zq").as[(Long, Double, Double, Double)]
      .collect().toSet == pts.as[(Long, Double, Double, Double)].collect().toSet)
  }

  test("compactFiles merges small files, preserves data exactly") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("compact").toString + "/t"
    // 16 tiny files
    (1L to 160L).toDF("v").repartition(16).write.parquet(dir)
    val beforeRows = spark.read.parquet(dir).as[Long].collect().sorted.toSeq
    val (nBefore, nAfter) = Writers.compactFiles(spark, dir, targetFileBytes = 1L << 30)
    assert(nBefore == 16 && nAfter == 1)
    val afterRows = spark.read.parquet(dir).as[Long].collect().sorted.toSeq
    assert(afterRows == beforeRows)
    // idempotent at target: second run keeps one file, same data
    val (b2, a2) = Writers.compactFiles(spark, dir, targetFileBytes = 1L << 30)
    assert(b2 == 1 && a2 == 1)
    assert(spark.read.parquet(dir).as[Long].collect().sorted.toSeq == beforeRows)
  }

  test("compactFiles refuses partitioned layouts and leaves no swap debris") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("compactp").toString + "/t"
    Seq((1L, "a"), (2L, "b")).toDF("v", "p").write.partitionBy("p").parquet(root)
    // season=.../-style layout: compacting it flat would double every row
    intercept[IllegalArgumentException] { Writers.compactFiles(spark, root) }
    assert(spark.read.parquet(root).count() == 2) // untouched by the refusal
    val flat = java.nio.file.Files.createTempDirectory("compactf").toString + "/t"
    (1L to 10L).toDF("v").repartition(4).write.parquet(flat)
    Writers.compactFiles(spark, flat)
    assert(!new java.io.File(flat + ".compact.tmp").exists()) // staging gone
    assert(!new java.io.File(flat + ".compact.old").exists()) // old copy gone
    assert(spark.read.parquet(flat).as[Long].collect().sorted.toSeq == (1L to 10L))
  }

  test("K2: debug CSV is a single file with a header and round-trips") {
    val dir = java.nio.file.Files.createTempDirectory("k2").toString + "/out"
    val df = Seq((1L, "a"), (2L, "b,with,commas")).toDF("id", "name")
    Writers.debugCsv(df, dir)
    val files = new java.io.File(dir).listFiles()
      .filter(f => f.isFile && f.getName.endsWith(".csv"))
    assert(files.length == 1) // coalesce(1): one human-readable debug file
    val firstLine = scala.io.Source.fromFile(files.head).getLines().next()
    assert(firstLine == "id,name") // header row present
    val back = spark.read.option("header", "true").csv(dir)
      .select(col("id").cast("long"), col("name"))
      .as[(Long, String)].collect().toSet
    assert(back == Set((1L, "a"), (2L, "b,with,commas"))) // quoting survived
  }

  test("K8: per-period fan-out writes one filtered partitioned table per period") {
    val base = java.nio.file.Files.createTempDirectory("k8").toString
    val df = Seq(
      ("2023", "month", 1.0), ("2023", "year", 2.0),
      ("2024", "month", 3.0), ("2024", "year", 4.0), ("2024", "alltime", 5.0))
      .toDF("season", "aggregationPeriod", "v")
    Writers.writePerPeriod(df, p => s"$base/$p", Seq("month", "year"), "season")
    val month = spark.read.parquet(s"$base/month")
    // each period table holds exactly its own rows…
    assert(month.select("aggregationPeriod").distinct()
      .as[String].collect().toSeq == Seq("month"))
    assert(month.count() == 2)
    assert(spark.read.parquet(s"$base/year").count() == 2)
    // …in the K1 partitioned layout (season dirs, dynamic-overwritable)
    assert(new java.io.File(s"$base/month/season=2023").isDirectory)
    assert(new java.io.File(s"$base/month/season=2024").isDirectory)
    // periods not requested are not written at all
    assert(!new java.io.File(s"$base/alltime").exists())
  }

  test("writeTrainingShards: balanced shard=K dirs, payload intact, few files") {
    val base = java.nio.file.Files.createTempDirectory("shards").toString
    val df = (1L to 256L).map(i => (i, (i * 13) % 40 + 1, s"payload-$i"))
      .toDF("doc_id", "n_tokens", "text")
    Writers.writeTrainingShards(df, s"$base/out", "doc_id", "n_tokens", 4)
    val back = spark.read.parquet(s"$base/out")
    // every row survives with its payload, exactly once
    assert(back.count() == 256)
    assert(back.select("doc_id", "text").as[(Long, String)].collect()
      .forall { case (id, t) => t == s"payload-$id" })
    // shard dirs exist and token totals are sorted-round-robin balanced
    (0 until 4).foreach(k =>
      assert(new java.io.File(s"$base/out/shard=$k").isDirectory))
    val tots = back.groupBy("shard").agg(sum("n_tokens").as("t"))
      .select("t").as[Long].collect()
    assert(tots.length == 4 && tots.max - tots.min <= 40L)
    // one file set per shard dir, not one-per-task-per-shard
    (0 until 4).foreach { k =>
      val files = new java.io.File(s"$base/out/shard=$k")
        .listFiles().count(_.getName.endsWith(".parquet"))
      assert(files == 1, s"shard $k has $files files")
    }
  }

  private def withConf(key: String, value: String)(body: => Unit): Unit = {
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, value)
    try body
    finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }
}
