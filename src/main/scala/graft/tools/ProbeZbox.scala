package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.FileSourceScanExec

/** Dev probe: does the graft_zbox TVF's inline dyadic predicate actually
  * PRUNE partitions (selected/total partition counts from the executed
  * FileSourceScanExec), compared against the Column readZBox path, on a
  * freshly written z-table at the given sf dir? The LayoutSpec string
  * assertion ("plan contains PartitionFilters") cannot distinguish a
  * populated filter list from an empty one — this prints the numbers. */
object ProbeZbox {
  def main(args: Array[String]): Unit = {
    val sf = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .config("spark.sql.warehouse.dir", graft.Runners.tempWarehouse())
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val bits = 21; val bucketBits = 8
    val tbl = java.nio.file.Files
      .createTempDirectory("probez").toString + "/lineitem_z"
    graft.io.Layout.writeZClustered(
      graft.io.Tables.lineitem(spark, sf)
        .select("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey"),
      Seq("l_partkey", "l_suppkey"), bits, bucketBits,
      numFiles = 16, path = tbl)
    spark.read.parquet(tbl).createOrReplaceTempView("lineitem_z")
    graft.functions.SqlSurface.createZBoxFunction(spark, "lineitem_z",
      Seq("l_partkey", "l_suppkey"), bits, bucketBits)

    def scanStats(df: org.apache.spark.sql.DataFrame, label: String): Unit = {
      val t0 = System.nanoTime()
      // collect() drives df's OWN QueryExecution (count() would build a
      // separate one and leave these metrics at zero)
      val n = df.collect().length
      val dt = (System.nanoTime() - t0) / 1e9
      val plan = df.queryExecution.executedPlan match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          a.executedPlan
        case p => p
      }
      val scans = plan.collect { case s: FileSourceScanExec => s }
      scans.foreach { s =>
        println(f"[zbox] $label: rows $n, ${dt}%.2f s, " +
          s"partitions ${s.relation.location.inputFiles.length} files total; " +
          s"selected=${s.metrics.get("numFiles").map(_.value)}, " +
          s"partitionFilters=${s.partitionFilters}")
      }
    }
    scanStats(spark.sql(
      "SELECT * FROM graft_zbox(100, 499, 1, 25)"), "tvf")
    scanStats(graft.io.Layout.readZBox(spark, tbl,
      Seq(("l_partkey", 100L, 499L), ("l_suppkey", 1L, 25L)),
      bits, bucketBits), "column")
    spark.stop()
  }
}
