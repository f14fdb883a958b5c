package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev probe: A/B the banded-candidate shapes at scale on the embeddings
  * table — the OLD shape (vector payloads carried through the bucket join
  * and pair-distinct) vs the SHIPPED id-only shape (band id-only rows,
  * distinct on ids, re-attach vectors) — so the engine-wide adoption of
  * the q217 id-only lesson (round 11) carries its own measurement instead
  * of borrowing q217's. Both shapes produce the identical pair set; the
  * probe prints row counts to prove it and wall times per round.
  *
  * Usage: SPARK_GRAFT_SF_DIR=<dir> runMain graft.tools.ProbeIdOnly
  */
object ProbeIdOnly {
  private val Dims = 64
  private val NPlanes = 12
  private val NTables = 6
  private val Threshold = 0.35

  def main(args: Array[String]): Unit = {
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .config("spark.sql.warehouse.dir", graft.Runners.tempWarehouse())
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def banded(base: DataFrame, idOnly: Boolean): DataFrame = {
      val tb = (0 until NTables).map { t =>
        struct(lit(t).as("table"),
          graft.operators.Similarity
            .hyperplaneSig(col("__v"), Dims, NPlanes, t).as("bucket"))
      }
      val cols =
        if (idOnly) Seq(col("vec_id"), col("tb.table").as("table"),
          col("tb.bucket").as("bucket"))
        else Seq(col("vec_id"), col("__v"), col("tb.table").as("table"),
          col("tb.bucket").as("bucket"))
      base.withColumn("tb", explode(array(tb: _*))).select(cols: _*).persist()
    }

    def run(shape: String): Long = {
      val base = spark.read.parquet(s"$sf/embeddings.parquet")
        .select(col("vec_id"), col("embedding").cast("array<double>").as("__v"))
      val a = base.select(col("vec_id").as("id_a"), col("__v").as("__va"))
      val b = base.select(col("vec_id").as("id_b"), col("__v").as("__vb"))
      val pairs = shape match {
        case "payload" =>
          val bd = banded(base, idOnly = false)
          bd.as("x").join(bd.as("y"),
              col("x.table") === col("y.table") &&
                col("x.bucket") === col("y.bucket") &&
                col("x.vec_id") < col("y.vec_id"))
            .select(col("x.vec_id").as("id_a"), col("x.__v").as("__va"),
              col("y.vec_id").as("id_b"), col("y.__v").as("__vb"))
            .dropDuplicates("id_a", "id_b")
        case "idonly" =>
          val bd = banded(base, idOnly = true)
          bd.as("x").join(bd.as("y"),
              col("x.table") === col("y.table") &&
                col("x.bucket") === col("y.bucket") &&
                col("x.vec_id") < col("y.vec_id"))
            .select(col("x.vec_id").as("id_a"), col("y.vec_id").as("id_b"))
            .distinct()
            .join(a, "id_a").join(b, "id_b")
      }
      val n = pairs
        .withColumn("cos", graft.functions.catalyst.VectorExpressions
          .cosineSim(col("__va"), col("__vb")))
        .where(col("cos") >= Threshold)
        .count()
      graft.PinnedFrames.release()
      spark.catalog.clearCache()
      n
    }

    for (shape <- Seq("payload", "idonly", "payload", "idonly")) {
      val t0 = System.nanoTime()
      val n = run(shape)
      println(f"[probeidonly] $shape%-8s pairs=$n%d  ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
