package graft.tools

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.SparkSession

/** Dev tool: write `.explain("formatted")` of named registry queries to
  * individual files — the round-15 optimization evidence
  * (`plans/r15/<query>_<suffix>.txt`). Args: <outDir> <suffix> <name>...
  * Uses sf0.1 (the bench's scale factor) so scan details match the
  * benchmarked plans; same cache hygiene as the runners. */
object DumpPlan {
  def main(args: Array[String]): Unit = {
    val outDir = args(0); val suffix = args(1); val names = args.drop(2)
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .config("spark.sql.warehouse.dir", graft.Runners.tempWarehouse())
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Files.createDirectories(Paths.get(outDir))
    names.foreach { n =>
      val plan = graft.SparkEntry.queries(n)(spark, sf)
        .queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
      Files.writeString(Paths.get(outDir, s"${n}_$suffix.txt"), plan)
      println(s"[dumpplan] wrote $outDir/${n}_$suffix.txt")
      graft.operators.Dedup.releaseSpanCaches()
      graft.operators.Graph.releaseGraphCaches()
      graft.PinnedFrames.release()
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
