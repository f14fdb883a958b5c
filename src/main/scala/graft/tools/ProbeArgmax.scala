package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** A/B probe for the centroid-assignment formulations (round 12):
  *   cascade — one struct(dot_product, -i) expression PER CENTROID,
  *             argmax via array_max (the round-≤11 shape);
  *   loop    — centroids as ONE array<array<double>> literal, argmax as a
  *             generated loop (functions.catalyst.NearestCell).
  *
  * Usage: runMain graft.tools.ProbeArgmax <cascade|loop> <nLists>
  * One (mode, nLists) per JVM so the cold round pays the real Janino
  * compile (in-JVM codegen caches would hide it). Reads embeddings from
  * SPARK_GRAFT_SF_DIR; centroids are deterministic synthetic unit vectors
  * (the assignment cost does not depend on their values). Prints cold +
  * steady wall times and the analyzed-plan string size.
  */
object ProbeArgmax {
  def main(args: Array[String]): Unit = {
    val mode = args(0)
    val nLists = args(1).toInt
    val dims = 64
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .config("spark.sql.warehouse.dir", graft.Runners.tempWarehouse())
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val cents: Seq[Array[Double]] = (0 until nLists).map { c =>
      val raw = Array.tabulate(dims)(j => math.sin(c * dims + j * 7.0))
      val n = math.sqrt(raw.map(x => x * x).sum)
      raw.map(_ / n)
    }
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    // pq modes: the ivfPqTopK ENCODE shape — nSub=8 subspaces, each
    // assigning its subvector against nLists codes (so the cascade
    // instantiates 8 × nLists expressions in ONE projection, the real
    // compile shape; the loop instantiates 8 matrix loops)
    val nSub = 8
    val subDim = dims / nSub
    def pqAssign(s: Int): org.apache.spark.sql.Column = {
      val sub = expr(s"slice(v, ${s * subDim + 1}, $subDim)")
      val books = cents.map(_.slice(s * subDim % dims, s * subDim % dims + subDim))
      mode match {
        case "pqloop" =>
          graft.functions.catalyst.CentroidExpressions.nearestCodeL2(sub, books)
        case "pqcascade" =>
          array_min(array(books.zipWithIndex.map { case (c, ci) =>
            struct(graft.functions.catalyst.VectorExpressions
              .l2Squared(sub, typedlit(c.toSeq)).as("d"), lit(ci).as("c"))
          }: _*)).getField("c")
      }
    }
    def cell = mode match {
      case "loop" =>
        graft.functions.catalyst.CentroidExpressions.nearestCell(col("v"), cents)
      case "cascade" =>
        array_max(array(cents.zipWithIndex.map { case (c, i) =>
          struct(graft.functions.catalyst.VectorExpressions
            .dotProduct(col("v"), typedlit(c)).as("s"), lit(-i).as("ni"))
        }: _*)).getField("ni") * -1
      case other => sys.error(s"unknown mode $other")
    }
    val q =
      if (mode.startsWith("pq"))
        // plain column sum (stays in whole-stage codegen — a HOF here would
        // evaluate the assignments interpreted and hide the compile cost)
        emb.select((0 until nSub).map(pqAssign).reduce(_ + _).as("cell"))
          .groupBy("cell").count()
      else emb.select(cell.as("cell")).groupBy("cell").count()
    val planChars = q.queryExecution.executedPlan.toString.length
    for (round <- 1 to 3) {
      val t0 = System.nanoTime()
      val n = q.collect().map(_.getLong(1)).sum
      println(f"[argmax] mode=$mode nLists=$nLists round=$round: " +
        f"${(System.nanoTime() - t0) / 1e9}%.2f s (rows=$n, planChars=$planChars)")
    }
    spark.stop()
  }
}
