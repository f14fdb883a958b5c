package graft.io

import org.apache.spark.sql.functions._
import graft.SparkSpec

class DeletesSpec extends SparkSpec {
  import spark.implicits._

  private def mk(n: Int) = (0 until n).map { i =>
    (i.toLong, (i % 7).toLong, s"payload_$i")
  }.toDF("id", "grp", "payload")

  test("deleteWhere rewrites only affected files; untouched files keep " +
    "their exact names; matching rows gone, everything else intact") {
    val path = java.nio.file.Files.createTempDirectory("del").toString + "/t"
    // range-clustered by id → the id-range delete touches a file subset
    mk(1000).repartitionByRange(10, $"id").sortWithinPartitions("id")
      .write.parquet(path)
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sessionState.newHadoopConf())
    def files(): Set[String] = {
      val it = fs.listFiles(new org.apache.hadoop.fs.Path(path), true)
      val b = Set.newBuilder[String]
      while (it.hasNext) {
        val f = it.next().getPath
        if (f.getName.endsWith(".parquet")) b += f.toString
      }
      b.result()
    }
    val before = files()
    val r = Deletes.deleteWhere(spark, path, $"id".between(100, 199))
    assert(r.rowsDeleted == 100)
    assert(r.filesTouched < r.filesTotal && r.filesTotal == before.size)
    // untouched files are the SAME files (names unchanged — never rewritten)
    val after = files()
    assert((before intersect after).size == before.size - r.filesTouched)
    val left = spark.read.parquet(path)
    assert(left.count() == 900)
    assert(left.where($"id".between(100, 199)).count() == 0)
    assert(left.select(sum($"id")).head().getLong(0) ==
      (0L until 1000L).filterNot(i => i >= 100 && i <= 199).sum)
  }

  test("deleteKeys on a partitioned table preserves partition columns " +
    "and prunes untouched partitions") {
    val path = java.nio.file.Files.createTempDirectory("delp").toString + "/t"
    mk(700).write.partitionBy("grp").parquet(path)
    val r = Deletes.deleteKeys(spark, path, "id", Seq(3L, 10L, 17L)) // all grp=3
    assert(r.rowsDeleted == 3 && r.filesTouched < r.filesTotal)
    val left = spark.read.parquet(path)
    assert(left.count() == 697)
    assert(left.where($"id".isin(3L, 10L, 17L)).count() == 0)
    // partition column survived the rewrite and still matches id % 7
    assert(left.where($"grp" =!= $"id" % 7).count() == 0)
  }

  test("deleteWhere with sortCols preserves clustering: rewritten files " +
    "keep narrow key spans, so the NEXT delete batch stays file-targeted") {
    val path = java.nio.file.Files.createTempDirectory("delc").toString + "/t"
    mk(1000).repartitionByRange(10, $"id").sortWithinPartitions("id")
      .write.parquet(path)
    val r1 = Deletes.deleteWhere(spark, path, $"id".between(100, 299),
      sortCols = Seq("id"))
    assert(r1.rowsDeleted == 200 && r1.filesTouched < r1.filesTotal)
    // every file (rewritten ones included) still spans a narrow id range —
    // the survivors were grouped by source file and re-sorted, not
    // round-robin scattered across the rewrite tasks
    val manifest = Writers.scanManifest(spark, path, Seq("id"))
      .select("min_id", "max_id").as[(Long, Long)].collect()
    manifest.foreach { case (mn, mx) =>
      assert(mx - mn < 250, s"file span $mn..$mx — clustering destroyed")
    }
    // and a later batch in a different range touches a strict subset again
    val r2 = Deletes.deleteWhere(spark, path, $"id".between(800, 899),
      sortCols = Seq("id"))
    assert(r2.rowsDeleted == 100 && r2.filesTouched < r2.filesTotal)
    assert(spark.read.parquet(path).count() == 700)
  }

  test("a NULL predicate row is kept, not deleted (null discipline)") {
    val path = java.nio.file.Files.createTempDirectory("deln").toString + "/t"
    Seq((1L, Some("a")), (2L, None), (3L, Some("b")))
      .toDF("id", "tag").write.parquet(path)
    // tag = 'a' is NULL for the None row — that row must survive
    val r = Deletes.deleteWhere(spark, path, $"tag" === "a")
    assert(r.rowsDeleted == 1)
    assert(spark.read.parquet(path).select("id").as[Long].collect().toSet ==
      Set(2L, 3L))
  }

  test("no match is a no-op: zero files touched, directory unchanged") {
    val path = java.nio.file.Files.createTempDirectory("del0").toString + "/t"
    mk(100).write.parquet(path)
    val r = Deletes.deleteWhere(spark, path, $"id" > 10000)
    assert(r == Deletes.DeleteReport(0, r.filesTotal, 0L))
    assert(spark.read.parquet(path).count() == 100)
  }

  test("two-level partitioned table: delete preserves BOTH partition " +
    "columns and still targets a file subset") {
    val path = java.nio.file.Files.createTempDirectory("del2l").toString + "/t"
    (0 until 800).map { i =>
      (i.toLong, (i % 4).toLong, (i % 3).toLong, s"p_$i")
    }.toDF("id", "grp", "sub", "payload")
      .write.partitionBy("grp", "sub").parquet(path)
    val r = Deletes.deleteKeys(spark, path, "id", Seq(5L, 77L, 133L))
    assert(r.rowsDeleted == 3 && r.filesTouched < r.filesTotal)
    val left = spark.read.parquet(path)
    assert(left.count() == 797)
    assert(left.where($"id".isin(5L, 77L, 133L)).count() == 0)
    // both partition columns survived the rewrite with correct values
    assert(left.where($"grp" =!= $"id" % 4 || $"sub" =!= $"id" % 3)
      .count() == 0)
  }

  test("a table that already has a __src column keeps its data — the " +
    "working column derives a non-colliding name") {
    val path = java.nio.file.Files.createTempDirectory("delsrc").toString + "/t"
    (0 until 200).map(i => (i.toLong, s"origin_$i"))
      .toDF("id", "__src")
      .repartitionByRange(4, $"id").write.parquet(path)
    val r = Deletes.deleteWhere(spark, path, $"id" < 50)
    assert(r.rowsDeleted == 50)
    val left = spark.read.parquet(path)
    assert(left.count() == 150)
    // the user's __src data is intact in REWRITTEN files too
    assert(left.where($"__src" =!= concat(lit("origin_"), $"id")).count() == 0)
  }

  test("Hive-escaped partition values (space, percent) round-trip through " +
    "the delete: discovery, rewrite, and swap all resolve the real files") {
    val path = java.nio.file.Files.createTempDirectory("delesc").toString + "/t"
    (0 until 300).map { i =>
      val p = i % 3 match {
        case 0 => "NOT SPECIFIED"; case 1 => "C%D"; case _ => "ok"
      }
      (i.toLong, p, s"pay_$i")
    }.toDF("id", "prio", "payload")
      .repartitionByRange(6, $"prio", $"id").sortWithinPartitions("prio", "id")
      .write.partitionBy("prio").parquet(path)
    val r = Deletes.deleteKeys(spark, path, "id", Seq(0L, 1L, 2L),
      sortCols = Seq("id"))
    assert(r.rowsDeleted == 3 && r.filesTouched < r.filesTotal)
    val left = spark.read.parquet(path)
    assert(left.count() == 297)
    assert(left.where($"id" < 3).count() == 0)
    // all three partition values still present and intact
    assert(left.select("prio").distinct().as[String].collect().toSet ==
      Set("NOT SPECIFIED", "C%D", "ok"))
  }

  test("recover completes an interrupted swap: staged files move in, " +
    "listed originals go, marker and tmp are cleared") {
    val dir = java.nio.file.Files.createTempDirectory("delrec").toString
    val path = dir + "/t"
    mk(100).coalesce(1).write.parquet(path)
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sessionState.newHadoopConf())
    def parquets(p: String): Seq[org.apache.hadoop.fs.Path] = {
      val it = fs.listFiles(new org.apache.hadoop.fs.Path(p), true)
      val b = Seq.newBuilder[org.apache.hadoop.fs.Path]
      while (it.hasNext) {
        val f = it.next().getPath
        if (f.getName.endsWith(".parquet")) b += f
      }
      b.result()
    }
    val original = parquets(path).head
    // simulate a crash immediately after the marker landed: the staged
    // survivor file (ids ≥ 20) sits in the tmp dir, nothing moved yet
    val tmp = path + ".delete.tmp"
    mk(100).where($"id" >= 20).coalesce(1).write.parquet(tmp)
    val staged = parquets(tmp).head
    val dst = new org.apache.hadoop.fs.Path(
      new org.apache.hadoop.fs.Path(path), staged.getName)
    val marker = new org.apache.hadoop.fs.Path(path, "_delete_inflight")
    val out = fs.create(marker, true)
    out.write((s"O\t${fs.makeQualified(original)}\n" +
      s"M\t${fs.makeQualified(staged)}\t${fs.makeQualified(dst)}")
      .getBytes("UTF-8"))
    out.close()
    assert(Deletes.recover(spark, path))
    assert(!fs.exists(marker))
    assert(!fs.exists(new org.apache.hadoop.fs.Path(tmp)))
    assert(!fs.exists(original) && fs.exists(dst))
    assert(spark.read.parquet(path).count() == 80)
    // idempotent: nothing left to recover
    assert(!Deletes.recover(spark, path))
    // and recovery mid-way (original already gone, staged already moved)
    // is the same no-op path exercised inside deleteWhere's entry call
    val r = Deletes.deleteWhere(spark, path, $"id" >= 90)
    assert(r.rowsDeleted == 10 && spark.read.parquet(path).count() == 70)
  }
}
