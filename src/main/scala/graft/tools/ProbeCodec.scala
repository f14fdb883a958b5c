package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe: parquet compression-codec trade-off, measured — the 100 TB
  * storage decision (what does the fleet's parquet actually ship with?)
  * as numbers instead of folklore. For each codec: one clustered write of
  * the sf dir's lineitem (same repartitionByRange layout so row-group
  * structure is comparable), on-disk bytes, and three steady scan rounds
  * of a projection+filter aggregate (the shape 100 TB jobs actually run —
  * pushdown + pruning active, so decode cost is the variable).
  *
  * Usage: runMain graft.tools.ProbeCodec [sfDir]
  * Results recorded in SCALE.md (storage-codec section).
  */
object ProbeCodec {
  def main(args: Array[String]): Unit = {
    val sf = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .config("spark.sql.warehouse.dir", graft.Runners.tempWarehouse())
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val src = graft.io.Tables.lineitem(spark, sf)
    val base = java.nio.file.Files.createTempDirectory("codecprobe").toString
    // untimed warm-up write+scan so the first measured codec doesn't eat
    // the session's JIT/committer warm-up
    src.repartitionByRange(16, col("l_orderkey"))
      .write.mode("overwrite").parquet(s"$base/warmup")
    spark.read.parquet(s"$base/warmup").agg(count(lit(1)))
      .write.format("noop").mode("overwrite").save()
    for (codec <- Seq("snappy", "zstd", "gzip", "lz4", "uncompressed")) {
      val path = s"$base/$codec"
      val t0 = System.nanoTime()
      src.repartitionByRange(16, col("l_orderkey"))
        .write.mode("overwrite").option("compression", codec).parquet(path)
      val writeS = (System.nanoTime() - t0) / 1e9
      val fs = new org.apache.hadoop.fs.Path(path)
        .getFileSystem(spark.sessionState.newHadoopConf())
      val bytes = fs.getContentSummary(new org.apache.hadoop.fs.Path(path))
        .getLength
      val scans = (1 to 3).map { _ =>
        val s0 = System.nanoTime()
        spark.read.parquet(path)
          .where(col("l_shipdate") >= lit("1995-01-01").cast("timestamp"))
          .agg(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))))
          .write.format("noop").mode("overwrite").save()
        (System.nanoTime() - s0) / 1e9
      }
      println(f"[codec] $codec%-12s write ${writeS}%6.2f s  " +
        f"bytes ${bytes / 1e6}%8.1f MB  scans ${scans.map(x => f"$x%.2f").mkString("/")} s")
    }
    spark.stop()
  }
}
