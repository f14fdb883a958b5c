package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev probe: versioned-table COMMIT THROUGHPUT under writer contention
  * and the manifest-cost scaling of the delta-log + checkpoint model —
  * the two numbers SCALE.md's table-format paragraphs cite.
  *
  *  1. N racing writers (threads) each land K commits on ONE table:
  *     measures commits/sec at contention. `awaitPredecessor` serializes
  *     the LAND step (claim → write data → wait → land), so data writes
  *     overlap and only the manifest land is serial — the probe verifies
  *     that and prints the achieved rate, documenting the intended
  *     discipline (single-writer streams are the design center;
  *     optimistic multi-writer is correct but serialized at the land).
  *  2. A 60-commit single-writer chain: per-commit manifest bytes
  *     (flat — O(files added)) vs the materialized checkpoint bytes
  *     (grows with the table), and snapshot-resolution cost at the head
  *     (manifests read ≤ checkpoint interval).
  *
  * Usage: runMain graft.tools.ProbeCommit
  */
object ProbeCommit {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .config("spark.sql.warehouse.dir", graft.Runners.tempWarehouse())
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    // --- 1. contention: N writers × K commits on one table ---
    for (writers <- Seq(1, 4, 8)) {
      val k = 6
      val tbl = java.nio.file.Files.createTempDirectory("probec")
        .toString + "/t"
      // pre-create so racers never contend on table creation itself
      graft.io.Versioned.commit(Seq(-1L).toDF("x"), tbl): Unit
      val failures =
        new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
      val t0 = System.nanoTime()
      val threads = (0 until writers).map { w =>
        new Thread(() => {
          (0 until k).foreach { i =>
            try graft.io.Versioned.commit(
              Seq(w * 1000L + i).toDF("x"), tbl): Unit
            catch { case t: Throwable => failures.add(t): Unit }
          }
        })
      }
      threads.foreach(_.start()); threads.foreach(_.join())
      val secs = (System.nanoTime() - t0) / 1e9
      val landed = graft.io.Versioned.latestVersion(tbl)
      println(f"[probecommit] writers=$writers%-2d commits=${writers * k}" +
        f" landed=$landed failures=${failures.size}" +
        f" wall=$secs%.2f s rate=${writers * k / secs}%.1f commits/s")
    }

    // --- 2. manifest-cost scaling over a 60-commit chain ---
    val tbl = java.nio.file.Files.createTempDirectory("probem")
      .toString + "/t"
    val n = 60
    (1 to n).foreach { i =>
      graft.io.Versioned.commit(
        (0 until 2000).map(j => (i * 10000L + j, j % 97)).toDF("id", "k")
          .coalesce(2),
        tbl, statsCols = Seq("id")): Unit
    }
    def bytes(name: String) = java.nio.file.Files.size(
      java.nio.file.Paths.get(tbl, "_versions", name))
    println(f"[probecommit] manifest bytes: v2=${bytes("2")}" +
      f" v30=${bytes("30")} v$n=${bytes(n.toString)}" +
      " (delta model: flat; pre-r15 full-snapshot model: linear in table)")
    val ival = graft.io.Versioned.checkpointInterval
    val cks = (ival to n by ival).map(k => s"$k.ckpt")
      .filter(c => java.nio.file.Files.exists(
        java.nio.file.Paths.get(tbl, "_versions", c)))
    println(s"[probecommit] checkpoints: " +
      cks.map(c => s"$c=${bytes(c)}B").mkString(", "))
    val t1 = System.nanoTime()
    val rows = graft.io.Versioned.snapshot(spark, tbl).count()
    val cost = graft.io.Versioned.lastResolveCost
    println(f"[probecommit] head resolve: rows=$rows" +
      f" manifestsRead=${cost.manifestsRead}" +
      f" linesParsed=${cost.linesParsed} ckpt=${cost.checkpointUsed}" +
      f" (read+count ${(System.nanoTime() - t1) / 1e9}%.2f s)")
    spark.stop()
  }
}
