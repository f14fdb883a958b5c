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

  test("transformWithState (EWMA ValueState): kill mid-batch, fresh session resumes to the exact batch fold") {
    // The first test covers built-in agg state; this one covers the CUSTOM
    // state path — EwmaProcessor's ValueState under the RocksDB provider,
    // whose state-store encoding (named slot, tuple encoder, version
    // rollback on replay) is ours to get wrong. Same crash choreography:
    // poisoned partial JDBC write mid-batch-1, fresh SparkSession, resume;
    // exactly-once means batch 0's state version is what batch 1 replays
    // against, so the final snapshots must equal the batch recurrence over
    // the full event sequence — bitwise, same fold expression.
    val url = "jdbc:derby:memory:ckptdb_tws;create=true"
    val c0 = java.sql.DriverManager.getConnection(url)
    c0.createStatement().execute(
      "CREATE TABLE ewmas (user_id BIGINT NOT NULL PRIMARY KEY, n BIGINT, ewma DOUBLE)")
    c0.close()

    val providerKey = "spark.sql.streaming.stateStore.providerClass"
    val rocks =
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
    val prevProvider = spark.conf.getOption(providerKey)
    spark.conf.set(providerKey, rocks)

    val src = Files.createTempDirectory("tws_src").toString
    val ckpt = Files.createTempDirectory("tws_ckpt").toString
    import spark.implicits._
    def t(s: String) = java.sql.Timestamp.valueOf(s)
    // keys overlap across files so the ValueState genuinely carries the
    // (n, ewma) fold across micro-batches; ts strictly increasing per key
    Seq((1L, t("2024-01-01 10:00:00"), 8.0), (2L, t("2024-01-01 10:00:30"), 6.0))
      .toDF("user_id", "ts", "value").coalesce(1).write.parquet(s"$src/f0")
    Seq((1L, t("2024-01-01 10:01:00"), 4.0), (3L, t("2024-01-01 10:01:30"), 2.0))
      .toDF("user_id", "ts", "value").coalesce(1).write.parquet(s"$src/f1")
    Seq((1L, t("2024-01-01 10:02:00"), 0.0), (2L, t("2024-01-01 10:02:30"), 12.0))
      .toDF("user_id", "ts", "value").coalesce(1).write.parquet(s"$src/f2")

    val alpha = 0.25
    def ewmas(s: SparkSession) = {
      import s.implicits._
      Streaming.ewmaStream(
        s.readStream.schema("user_id BIGINT, ts TIMESTAMP, value DOUBLE")
          .option("maxFilesPerTrigger", "1")
          .parquet(s"$src/*")
          .as[Streaming.EventRow],
        alpha)
    }
    def upsert(batch: org.apache.spark.sql.DataFrame): Unit =
      graft.io.UpsertSql.writeJdbcUpsert(batch, url, "ewmas", "user_id",
        new java.util.Properties(), dialect = graft.io.UpsertSql.AnsiDialect)

    try {
      // ---- phase 1: crash DURING batch 1, after a partial poisoned write
      val crashed = ewmas(spark).toDF().writeStream
        .outputMode(OutputMode.Update())
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, id: Long) =>
          if (id == 1) {
            val r = batch.limit(1).collect()(0)
            val c = java.sql.DriverManager.getConnection(url)
            c.createStatement().execute(
              s"INSERT INTO ewmas VALUES (${r.getLong(0)}, ${r.getLong(1)}, ${r.getDouble(2) + 999})")
            c.close()
            throw new RuntimeException("simulated executor crash mid-batch")
          } else upsert(batch)
        }
        .start()
      intercept[StreamingQueryException] { crashed.awaitTermination() }

      // ---- phase 2: FRESH SparkSession, same checkpoint ----
      val prevActive = SparkSession.getActiveSession
      val prevDefault = SparkSession.getDefaultSession
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
      try {
        val s2 = SparkSession.builder().getOrCreate()
        assert(s2 ne spark)
        s2.conf.set(providerKey, rocks)
        val seen = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
        val resumed = ewmas(s2).toDF().writeStream
          .outputMode(OutputMode.Update())
          .option("checkpointLocation", ckpt)
          .trigger(Trigger.AvailableNow())
          .foreachBatch { (batch: org.apache.spark.sql.DataFrame, id: Long) =>
            seen.add(id); upsert(batch)
          }
          .start()
        resumed.awaitTermination()
        // committed batch 0 is NOT reprocessed; the crashed batch 1 replays
        // against batch 0's restored state version, then batch 2 drains
        assert(seen.toArray(Array.empty[java.lang.Long]).map(_.toLong).toSeq
          .sorted == Seq(1L, 2L))
      } finally {
        prevActive.foreach(SparkSession.setActiveSession)
        prevDefault.foreach(SparkSession.setDefaultSession)
      }

      // ---- sink ≡ the batch recurrence over the full sequence, bitwise
      val expected = graft.ops.Recurrence.ewmaReport(
          spark.read.parquet(s"$src/*")
            .selectExpr("user_id", "unix_micros(ts) AS tsu", "unix_micros(ts) AS id", "value"),
          "user_id", "tsu", "id", "value", alpha)
        .orderBy("user_id")
        .as[(Long, Long, Double)].collect().toSeq
      val c2 = java.sql.DriverManager.getConnection(url)
      val rs = c2.createStatement()
        .executeQuery("SELECT user_id, n, ewma FROM ewmas ORDER BY user_id")
      val got = Iterator.continually(rs)
        .takeWhile(_.next())
        .map(r => (r.getLong(1), r.getLong(2), r.getDouble(3))).toSeq
      c2.close()
      assert(got == expected)
      assert(got.map(x => (x._1, x._2)) == Seq((1L, 3L), (2L, 2L), (3L, 1L)))
    } finally {
      prevProvider.fold(spark.conf.unset(providerKey))(
        spark.conf.set(providerKey, _))
    }
  }
}
