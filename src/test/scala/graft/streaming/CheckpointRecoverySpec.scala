package graft.streaming

import java.nio.file.Files
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StreamingQueryException, Trigger}
import graft.SparkSpec

/** Exactly-once across a crash: kill a stateful streaming query MID-BATCH
  * (after a PARTIAL JDBC write), restart from the checkpoint in a FRESH
  * SparkSession, and assert the sink converges to the batch answer with no
  * duplicates and no reprocessing of committed batches.
  *
  * This is the full recovery path the checkpoint contract promises:
  * offset log (batch replay), state store (running totals restore), and
  * the idempotent-upsert sink absorbing the replayed half-written batch —
  * the foreachBatch JDBC case, where Spark's own sink transactionality
  * can't help and idempotence has to carry exactly-once. */
class CheckpointRecoverySpec extends SparkSpec {

  test("kill mid-batch after a partial JDBC write; fresh session resumes from checkpoint to the exact batch answer") {
    val url = "jdbc:derby:memory:ckptdb;create=true"
    val c0 = java.sql.DriverManager.getConnection(url)
    c0.createStatement().execute(
      "CREATE TABLE totals (id BIGINT NOT NULL PRIMARY KEY, total DOUBLE)")
    c0.close()

    // three source files → three micro-batches (maxFilesPerTrigger=1);
    // keys overlap across files so the state store genuinely carries
    // running totals between batches
    val src = Files.createTempDirectory("ckpt_src").toString
    val ckpt = Files.createTempDirectory("ckpt_loc").toString
    import spark.implicits._
    Seq((1L, 5.0), (2L, 7.0)).toDF("id", "v")
      .coalesce(1).write.parquet(s"$src/f0")
    Seq((1L, 3.0), (3L, 1.0)).toDF("id", "v")
      .coalesce(1).write.parquet(s"$src/f1")
    Seq((2L, 2.0), (3L, 4.0), (4L, 9.0)).toDF("id", "v")
      .coalesce(1).write.parquet(s"$src/f2")

    val schema = "id BIGINT, v DOUBLE"
    def totalsStream(s: SparkSession) =
      s.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(s"$src/*")
        .groupBy("id")
        .agg(sum(col("v").cast("decimal(18,4)")).cast("double").as("total"))

    def upsert(batch: org.apache.spark.sql.DataFrame): Unit =
      graft.io.UpsertSql.writeJdbcUpsert(batch, url, "totals", "id",
        new java.util.Properties(), dialect = graft.io.UpsertSql.AnsiDialect)

    // ---- phase 1: crash DURING batch 1, after a partial row write ----
    val crashed = totalsStream(spark).writeStream
      .outputMode(OutputMode.Update())
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, id: Long) =>
        if (id == 1) {
          // half-write: one arbitrary row lands, then the "node dies" —
          // the replay must overwrite, not duplicate
          val r = batch.limit(1).collect()(0)
          val c = java.sql.DriverManager.getConnection(url)
          c.createStatement().execute(
            s"INSERT INTO totals VALUES (${r.getLong(0)}, ${r.getDouble(1) + 999})")
          c.close()
          throw new RuntimeException("simulated executor crash mid-batch")
        } else upsert(batch)
      }
      .start()
    intercept[StreamingQueryException] { crashed.awaitTermination() }

    // batch 0 committed; batch 1 died mid-write (one poisoned row present)
    val mid = {
      val c = java.sql.DriverManager.getConnection(url)
      val rs = c.createStatement().executeQuery("SELECT count(*) FROM totals")
      rs.next(); val n = rs.getLong(1); c.close(); n
    }
    assert(mid >= 2) // batch 0's two keys, plus the poisoned partial row

    // ---- phase 2: FRESH SparkSession, same checkpoint, normal sink ----
    val prevActive = SparkSession.getActiveSession
    val prevDefault = SparkSession.getDefaultSession
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val s2 = SparkSession.builder().getOrCreate()
      assert(s2 ne spark)
      val seen = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
      val resumed = totalsStream(s2).writeStream
        .outputMode(OutputMode.Update())
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, id: Long) =>
          seen.add(id); upsert(batch)
        }
        .start()
      resumed.awaitTermination()
      // committed batch 0 is NOT reprocessed; the crashed batch 1 replays,
      // then batch 2 completes the drain
      assert(seen.toArray(Array.empty[java.lang.Long]).map(_.toLong).toSeq
        .sorted == Seq(1L, 2L))
    } finally {
      prevActive.foreach(SparkSession.setActiveSession)
      prevDefault.foreach(SparkSession.setDefaultSession)
    }

    // ---- the sink equals the batch answer: no dupes, no poison row ----
    val expected = spark.read.parquet(s"$src/*")
      .groupBy("id")
      .agg(sum(col("v").cast("decimal(18,4)")).cast("double").as("total"))
      .orderBy("id")
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val c2 = java.sql.DriverManager.getConnection(url)
    val rs = c2.createStatement()
      .executeQuery("SELECT id, total FROM totals ORDER BY id")
    val got = Iterator.continually(rs)
      .takeWhile(_.next()).map(r => (r.getLong(1), r.getDouble(2))).toSeq
    c2.close()
    assert(got == expected)
    assert(got == Seq((1L, 8.0), (2L, 9.0), (3L, 5.0), (4L, 9.0)))
  }
}
