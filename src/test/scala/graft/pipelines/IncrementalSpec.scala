package graft.pipelines

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.io.Writers
import graft.ops.Flatten

/** The reference's re-run model end-to-end (SURVEY §7.4.6): dynamic
  * partition overwrite means re-processing a season is idempotent and
  * touches only that season's partition; schema reconciliation absorbs a
  * changed feature set between runs.
  */
class IncrementalSpec extends SparkSpec {
  import spark.implicits._

  test("silver re-run: only the touched season partition changes; re-run is a no-op diff") {
    val dir = java.nio.file.Files.createTempDirectory("silver_inc").toString
    val run1 = Seq(
      ("p1", "s2023", 10.0), ("p2", "s2023", 20.0), ("p3", "s2024", 30.0))
      .toDF("profileId", "seasonPartition", "stat")
    Writers.writePartitioned(run1, dir, "seasonPartition")

    // re-process only s2024 with updated numbers
    val run2 = Seq(("p3", "s2024", 99.0), ("p4", "s2024", 1.0))
      .toDF("profileId", "seasonPartition", "stat")
    Writers.writePartitioned(run2, dir, "seasonPartition")

    val state = spark.read.parquet(dir)
      .select("profileId", "stat").as[(String, Double)].collect().toSet
    assert(state == Set(("p1", 10.0), ("p2", 20.0), ("p3", 99.0), ("p4", 1.0)))

    // idempotency: repeating the same run leaves the table identical
    Writers.writePartitioned(run2, dir, "seasonPartition")
    val state2 = spark.read.parquet(dir)
      .select("profileId", "stat").as[(String, Double)].collect().toSet
    assert(state2 == state)
  }

  test("schema drift between runs: reconcile to the existing table layout (K7)") {
    val dir = java.nio.file.Files.createTempDirectory("silver_drift").toString
    val v1 = Seq(("p1", "s1", 1.0, 2.0)).toDF("profileId", "seasonPartition", "a", "b")
    Writers.writePartitioned(v1, dir, "seasonPartition")
    // new run computes feature c instead of b (feature CSV changed)
    val v2 = Seq(("p2", "s2", 3.0, 9.0)).toDF("profileId", "seasonPartition", "a", "c")
    val reconciled = Flatten.reconcileSchema(v2, spark.read.parquet(dir).schema)
    Writers.writePartitioned(reconciled, dir, "seasonPartition")
    val out = spark.read.parquet(dir).orderBy("profileId").collect()
    assert(out.map(_.getAs[String]("profileId")).toSeq == Seq("p1", "p2"))
    assert(out(1).isNullAt(out(1).fieldIndex("b"))) // dropped feature null-filled
  }
}
