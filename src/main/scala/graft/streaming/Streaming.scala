package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType

/** Structured Streaming surface (SURVEY.md §2.9): the reference is batch-only
  * — its incrementality is re-pull + dynamic-partition-overwrite — so this
  * module maps that model onto streams: the bronze→silver hop becomes a file
  * source with Trigger.AvailableNow, and the aggregations are the same
  * transforms the batch queries use (write once, run either mode).
  */
object Streaming {

  /** File-source stream over a landing directory (the bronze zone). */
  def fileStream(spark: SparkSession, path: String, schema: StructType,
                 format: String = "parquet"): DataFrame =
    spark.readStream.schema(schema).format(format).load(path)

  /** Shared transform — hourly per-type event stats. Used by the batch
    * oracle query (q29) and by `hourlyStream` below: identical logic, the
    * only difference is the watermark on the streaming side. */
  def hourlyEventStats(events: DataFrame): DataFrame =
    events
      .groupBy(date_trunc("hour", col("ts")).as("hour_ts"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,4)")).cast("double").as("total_value"))

  /** Streaming variant: watermarked, append-mode-safe windowed aggregation. */
  def hourlyStream(events: DataFrame, watermark: String = "2 hours"): DataFrame =
    events.withWatermark("ts", watermark)
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,4)")).cast("double").as("total_value"))
      .select(col("window.start").as("hour_ts"), col("event_type"),
        col("n"), col("total_value"))

  /** Per-user session state for mapGroupsWithState. */
  final case class UserSession(userId: Long, events: Long, totalValue: Double,
                               lastTs: java.sql.Timestamp)
  final case class EventRow(user_id: Long, ts: java.sql.Timestamp, value: Double)

  /** Custom stateful aggregation: running per-user session via
    * mapGroupsWithState (the engine's slot for state the built-in windows
    * can't express — KeyValueGroupedDataset keeps state partitioned by key
    * in the state store, nothing on the driver). */
  def userSessions(events: Dataset[EventRow],
                   timeout: GroupStateTimeout = GroupStateTimeout.NoTimeout())
      : Dataset[UserSession] = {
    val spark = events.sparkSession
    import spark.implicits._
    events.groupByKey(_.user_id)
      .mapGroupsWithState[UserSession, UserSession](timeout) {
        case (uid, rows, state: GroupState[UserSession]) =>
          val prev = state.getOption.getOrElse(
            UserSession(uid, 0L, 0d, new java.sql.Timestamp(0L)))
          val next = rows.foldLeft(prev) { (s, e) =>
            UserSession(uid, s.events + 1, s.totalValue + e.value,
              if (e.ts.after(s.lastTs)) e.ts else s.lastTs)
          }
          state.update(next)
          next
      }
  }

  final case class AnomalyFlag(user_id: Long, ts: java.sql.Timestamp,
                               value: Double, nPrev: Int,
                               anomaly: Option[Boolean])

  /** Streaming twin of `ops.Sessions.rollingAnomalies`: per-key state is
    * the ring buffer of the last `n` values (n doubles per key in the
    * state store — bounded regardless of stream length), each event is
    * judged against the buffer BEFORE being appended (the batch op's
    * "current row excluded" rule), and rows with fewer than `minObs`
    * predecessors emit `None` (warm-up). Within a micro-batch rows are
    * processed in event-time order; cross-batch order is the source's
    * delivery contract (pair with a watermark upstream for late data —
    * the scenario drives in-order batches, and StreamingSpec pins flag
    * parity with the batch operator on identical input). */
  def anomalyStream(events: Dataset[EventRow], n: Int, k: Double,
                    minObs: Int): Dataset[AnomalyFlag] = {
    val spark = events.sparkSession
    import spark.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[Vector[Double], AnomalyFlag](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        case (uid, rows, state: GroupState[Vector[Double]]) =>
          var buf = state.getOption.getOrElse(Vector.empty[Double])
          val out = rows.toSeq.sortBy(_.ts.getTime).map { e =>
            val nPrev = buf.size
            val flag = if (nPrev >= minObs) {
              val mean = buf.sum / nPrev
              val varS = (buf.map(x => x * x).sum - nPrev * mean * mean) /
                (nPrev - 1)
              Some(math.abs(e.value - mean) > k * math.sqrt(math.max(varS, 0d)))
            } else None
            buf = (buf :+ e.value).takeRight(n)
            AnomalyFlag(uid, e.ts, e.value, nPrev, flag)
          }
          state.update(buf)
          out.iterator
      }
  }

  /** Streaming exact dedup: drop rows whose key was already seen within the
    * watermark horizon. `dropDuplicatesWithinWatermark` keeps one state-store
    * entry per key and evicts it once the watermark passes — state is
    * bounded by (arrival rate × watermark), never by stream history, which
    * is what makes exact dedup viable on an unbounded 100 TB/day ingest.
    * Exactly-once within the horizon; re-deliveries older than the
    * watermark fall through to the batch dedup (Dedup.exactGroups) in the
    * silver compaction pass. */
  def dedupStream(df: DataFrame, keyCols: Seq[String], eventTimeCol: String,
                  watermark: String): DataFrame =
    df.withWatermark(eventTimeCol, watermark)
      .dropDuplicatesWithinWatermark(keyCols.head, keyCols.tail: _*)

  /** Content-keyed streaming dedup for document ingest: key = the
    * normalized-text fingerprint (TextFunctions.fingerprint), so reposts
    * that differ only in case/punctuation/whitespace dedupe too. Same
    * bounded-state semantics as `dedupStream`. */
  def fingerprintDedupStream(docs: DataFrame, textCol: String,
                             eventTimeCol: String, watermark: String): DataFrame =
    dedupStream(
      docs.withColumn("__fp", graft.functions.TextFunctions.fingerprint(col(textCol))),
      Seq("__fp"), eventTimeCol, watermark)
      .drop("__fp")

  /** Stream-static enrichment: join the stream against a batch dimension
    * table (the silver lookup-attach shape, J2/J3, in streaming form). The
    * static side is broadcast per microbatch — re-resolved each batch, so
    * a slowly-changing dimension refreshes without restarting the query;
    * no streaming state is created. */
  def enrichStream(stream: DataFrame, dim: DataFrame,
                   keys: Seq[String]): DataFrame =
    stream.join(broadcast(dim), keys, "left")

  /** Stream-stream interval join: pair each click with the same user's
    * purchases landing within `horizon` after it. Both sides carry
    * watermarks, and the time-range predicate bounds the buffered state to
    * (rate × horizon) per side — the canonical attribution join at
    * unbounded-ingest scale. */
  def clickToPurchase(clicks: DataFrame, purchases: DataFrame,
                      userCol: String, tsCol: String,
                      watermark: String = "1 hour",
                      horizon: String = "1 hour"): DataFrame = {
    val c = clicks.withWatermark(tsCol, watermark)
      .select(col(userCol), col(tsCol).as("click_ts"))
    val p = purchases.withWatermark(tsCol, watermark)
      .select(col(userCol).as("__u"), col(tsCol).as("purchase_ts"),
        col("value").as("purchase_value"))
    c.join(p,
      col(userCol) === col("__u") &&
        col("purchase_ts") >= col("click_ts") &&
        col("purchase_ts") <= col("click_ts") + expr(s"INTERVAL $horizon"))
      .drop("__u")
  }

  /** Left-outer variant of [[clickToPurchase]]: every click emits — joined
    * rows as matches land, and a null-padded row once the watermark proves
    * no purchase can still arrive in the horizon. Same bounded state as
    * the inner form; the null emission is watermark-driven, so unmatched
    * clicks surface with bounded latency instead of never (the attribution
    * report wants "converted = no" rows, not silence). */
  def clickToPurchaseOuter(clicks: DataFrame, purchases: DataFrame,
                           userCol: String, tsCol: String,
                           watermark: String = "1 hour",
                           horizon: String = "1 hour"): DataFrame = {
    val c = clicks.withWatermark(tsCol, watermark)
      .select(col(userCol), col(tsCol).as("click_ts"))
    val p = purchases.withWatermark(tsCol, watermark)
      .select(col(userCol).as("__u"), col(tsCol).as("purchase_ts"),
        col("value").as("purchase_value"))
    c.join(p,
      col(userCol) === col("__u") &&
        col("purchase_ts") >= col("click_ts") &&
        col("purchase_ts") <= col("click_ts") + expr(s"INTERVAL $horizon"),
      "leftOuter")
      .drop("__u")
  }

  /** Batch-style one-shot drain of everything available, then stop — the
    * streaming equivalent of the reference's re-run model. */
  def runAvailableNow(df: DataFrame, outPath: String, checkpoint: String,
                      outputMode: OutputMode = OutputMode.Append()): StreamingQuery =
    df.writeStream
      .outputMode(outputMode)
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .format("parquet")
      .start(outPath)

  /** Native session windows: per-user sessions with a data-driven gap,
    * expressed with `session_window` so the state store merges windows as
    * events arrive — the built-in counterpart of the batch `Sessions
    * .sessionize` (same gap semantics; use this on unbounded input, the
    * batch one when replaying history). Append output fires once a
    * session's window closes past the watermark. */
  def sessionStream(events: DataFrame, userCol: String, tsCol: String,
                    valueCol: String, gap: String = "30 minutes",
                    watermark: String = "2 hours"): DataFrame =
    events.withWatermark(tsCol, watermark)
      .groupBy(session_window(col(tsCol), gap), col(userCol))
      .agg(count(lit(1)).as("n_events"),
        sum(col(valueCol).cast("decimal(18,4)")).cast("double").as("total_value"))
      .select(col(userCol),
        col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("n_events"), col("total_value"))

  /** Streaming → serving-store sink: drain each microbatch through the K3
    * JDBC upsert inside foreachBatch. Idempotent by construction — the
    * upsert keys on the primary key, so checkpoint-replayed batches
    * converge to the same table state (the exactly-once-to-idempotent-sink
    * recipe). The upsert itself runs foreachPartition inside the batch —
    * connections open on executors, never the driver. */
  def upsertSink(df: DataFrame, url: String, table: String,
                 primaryKey: String, checkpoint: String,
                 dialect: graft.io.UpsertSql.Dialect): StreamingQuery =
    df.writeStream
      .outputMode(OutputMode.Update())
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, _: Long) =>
        graft.io.UpsertSql.writeJdbcUpsert(batch, url, table, primaryKey,
          new java.util.Properties(), dialect = dialect)
      }
      .start()

  /** S10 as a STREAMING stage — incremental bronze discovery under the
    * trigger: `candidates` is an unbounded stream of eligible match ids
    * (the provider's fixture feed re-delivers the full list every poll);
    * each micro-batch anti-joins the batch against the landing zone's
    * already-landed ids ([[graft.sources.Bronze.matchesToUpdate]] — the
    * landed side is FILENAMES, never data) and fan-out fetches ONLY the
    * missing ones. Re-delivered ids are discovered as already landed and
    * skipped, so a steady-state poll loop fetches each match exactly once
    * however often the upstream repeats it — the reference's re-pull +
    * overwrite model with the re-pull cost driven to the delta.
    *
    * `onBatch` receives (batchId, outcome→count) after each micro-batch —
    * the fan-out report aggregate, for ops tables and specs. The id list
    * per batch is collected on the driver (fetch-target construction,
    * bounded by the match grain — the q104 discipline). */
  def incrementalBronzeIngest(candidates: DataFrame, idCol: String,
                              landingDir: String,
                              urlFor: Long => String, pathFor: Long => String,
                              fetcher: graft.sources.Bronze.Fetcher,
                              parallelism: Int, checkpoint: String,
                              maxRetries: Int = 3, backoffMs: Long = 1L,
                              sleeper: Long => Unit = Thread.sleep,
                              onBatch: (Long, Map[String, Long]) => Unit = (_, _) => ())
  : StreamingQuery =
    candidates.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val spark = batch.sparkSession
        val todo = graft.sources.Bronze
          .matchesToUpdate(batch, idCol,
            graft.sources.Bronze.landedIds(spark, landingDir))
          .select(col(idCol).cast("long")).distinct()
          .collect().map(_.getLong(0)).sorted.toSeq
        val outcomes =
          if (todo.isEmpty) Map.empty[String, Long]
          else graft.sources.Bronze
            .fanOutFetch(spark,
              todo.map(id => graft.sources.Bronze
                .FetchTarget(id, urlFor(id), pathFor(id))),
              fetcher, parallelism, maxRetries, backoffMs, sleeper = sleeper)
            .groupBy("outcome").count()
            .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
        onBatch(batchId, outcomes)
      }
      .start()

  final case class SpanRow(user_id: Long, s: Long, e: Long)
  final case class CoverageSnapshot(user_id: Long, n_islands: Long,
                                    covered: Long)

  /** Streaming twin of `ops.Intervals.coverage`: per-key state is the
    * SORTED DISJOINT island set, each arriving span merges in (absorbing
    * every island it overlaps or touches), and each micro-batch emits the
    * key's updated coverage snapshot (Update mode).
    *
    * Unlike the window-function batch form, this handles out-of-order
    * arrival for free — merging is order-independent, so no watermark is
    * needed for correctness, only for state if spans were evicted. State
    * is O(islands per key): it SHRINKS as gaps fill (merging absorbs
    * islands) and is worst-case O(spans) only while coverage stays fully
    * fragmented — the honest bound; a 100 TB deploy with unbounded
    * fragmentation should snapshot-compact islands past the watermark into
    * the at-rest table and keep only the active horizon in the store. */
  def coverageStream(spans: Dataset[SpanRow]): Dataset[CoverageSnapshot] = {
    val spark = spans.sparkSession
    import spark.implicits._
    spans.groupByKey(_.user_id)
      .flatMapGroupsWithState[Vector[(Long, Long)], CoverageSnapshot](
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        case (uid, rows, state: GroupState[Vector[(Long, Long)]]) =>
          var islands = state.getOption.getOrElse(Vector.empty[(Long, Long)])
          rows.foreach { r =>
            val (lo, mid, hi) = (
              islands.filter(_._2 < r.s),          // strictly before (no touch)
              islands.filter(i => i._2 >= r.s && i._1 <= r.e), // absorbed
              islands.filter(_._1 > r.e))          // strictly after
            val merged = (
              (r.s +: mid.map(_._1)).min,
              (r.e +: mid.map(_._2)).max)
            islands = (lo :+ merged) ++ hi
          }
          state.update(islands)
          Iterator.single(CoverageSnapshot(uid, islands.size.toLong,
            islands.map(i => i._2 - i._1).sum))
      }
  }

  final case class TopKSnapshot(user_id: Long, n_top: Int, top_sum: Double,
                                top_min: Double)

  /** Spark 4 `transformWithState` showcase: per-key running top-k values
    * via the new arbitrary-state API (StatefulProcessor + typed ListState,
    * RocksDB-backed). Versus `flatMapGroupsWithState` (the rest of this
    * module): state is a NAMED, TTL-capable, individually-updatable store
    * slot rather than one opaque blob per key — the API Spark is steering
    * stateful pipelines toward. State is exactly k doubles per key; each
    * micro-batch emits the key's refreshed snapshot (Update mode).
    *
    * Requires the RocksDB state store provider
    * (`spark.sql.streaming.stateStore.providerClass`) — transformWithState
    * does not run on the default HDFS-backed store; the spec scopes that
    * conf to its own query. */
  class TopKValuesProcessor(k: Int)
      extends org.apache.spark.sql.streaming.StatefulProcessor[Long, EventRow, TopKSnapshot] {
    @transient private var top: org.apache.spark.sql.streaming.ListState[Double] = _

    override def init(outputMode: OutputMode,
                      timeMode: org.apache.spark.sql.streaming.TimeMode): Unit =
      top = getHandle.getListState[Double]("topk",
        org.apache.spark.sql.Encoders.scalaDouble,
        org.apache.spark.sql.streaming.TTLConfig.NONE)

    override def handleInputRows(key: Long, rows: Iterator[EventRow],
                                 tv: org.apache.spark.sql.streaming.TimerValues)
    : Iterator[TopKSnapshot] = {
      var cur = top.get().toVector
      rows.foreach(e => cur = (cur :+ e.value).sortBy(x => -x).take(k))
      top.put(cur.toArray)
      Iterator.single(TopKSnapshot(key, cur.size, cur.sum, cur.min))
    }
  }

  /** Per-user running top-k of `value` as a continuously-updated snapshot
    * stream. */
  def topKStream(events: Dataset[EventRow], k: Int): Dataset[TopKSnapshot] = {
    val spark = events.sparkSession
    import spark.implicits._
    events.groupByKey(_.user_id)
      .transformWithState(new TopKValuesProcessor(k),
        org.apache.spark.sql.streaming.TimeMode.None(), OutputMode.Update())
  }

  final case class SessionEvent(user_id: Long, ts: java.sql.Timestamp,
                                event_id: Long, value: Double)
  final case class ClosedSession(user_id: Long, session_idx: Long,
                                 start_us: Long, end_us: Long,
                                 n_events: Long, total_value: Double)

  /** Streaming twin of `ops.Sessions.sessionize` — GAP sessionization with
    * q53's exact semantics (a new session when the gap to the key's
    * previous event exceeds `gapSeconds`; 0-based running session index;
    * micros-exact timestamps; total_value through the DECIMAL(18,4) msum
    * rule) on transformWithState ValueState: per-key state is ONE open
    * session (idx, start_us, last_us, n_events, unscaled 4dp value sum) —
    * bounded regardless of stream length, unlike the built-in
    * `session_window` whose merge state the store manages; this is the
    * operator shape for emitting CLOSED sessions downstream (each gap
    * crossing emits the finished session exactly once; the open tail stays
    * in state until a later event — or a caller-injected horizon tick —
    * closes it).
    *
    * Value sums are carried as the DECIMAL(18,4) unscaled long (exact
    * integer arithmetic), so the emitted total_value is bit-identical to
    * the batch msum on in-order delivery — StreamingSpec pins drained
    * stream ≡ `Sessions.sessionize` on the same events. Rows fold in
    * (ts, event_id) order within each micro-batch; cross-batch order is
    * the source's delivery contract (the ewma/holt convention). */
  class GapSessionProcessor(gapSeconds: Long)
      extends org.apache.spark.sql.streaming.StatefulProcessor[Long, SessionEvent, ClosedSession] {
    @transient private var st: org.apache.spark.sql.streaming.ValueState[(Long, Long, Long, Long, Long)] = _

    override def init(outputMode: OutputMode,
                      timeMode: org.apache.spark.sql.streaming.TimeMode): Unit =
      st = getHandle.getValueState[(Long, Long, Long, Long, Long)]("session",
        org.apache.spark.sql.Encoders.tuple(
          org.apache.spark.sql.Encoders.scalaLong,
          org.apache.spark.sql.Encoders.scalaLong,
          org.apache.spark.sql.Encoders.scalaLong,
          org.apache.spark.sql.Encoders.scalaLong,
          org.apache.spark.sql.Encoders.scalaLong),
        org.apache.spark.sql.streaming.TTLConfig.NONE)

    private def micros(ts: java.sql.Timestamp): Long =
      math.floorDiv(ts.getTime, 1000L) * 1000000L + ts.getNanos / 1000L

    private def v4(x: Double): Long =
      java.math.BigDecimal.valueOf(x)
        .setScale(4, java.math.RoundingMode.HALF_UP)
        .unscaledValue().longValueExact()

    override def handleInputRows(key: Long, rows: Iterator[SessionEvent],
                                 tv: org.apache.spark.sql.streaming.TimerValues)
    : Iterator[ClosedSession] = {
      val gapUs = gapSeconds * 1000000L
      val out = scala.collection.mutable.ArrayBuffer.empty[ClosedSession]
      var open: Option[(Long, Long, Long, Long, Long)] =
        if (st.exists()) Some(st.get()) else None
      rows.toSeq.sortBy(e => (micros(e.ts), e.event_id)).foreach { e =>
        val us = micros(e.ts)
        open match {
          case Some((idx, start, last, n, sum)) if us - last > gapUs =>
            out += ClosedSession(key, idx, start, last, n,
              new java.math.BigDecimal(java.math.BigInteger.valueOf(sum), 4)
                .doubleValue())
            open = Some((idx + 1, us, us, 1L, v4(e.value)))
          case Some((idx, start, _, n, sum)) =>
            open = Some((idx, start, us, n + 1, sum + v4(e.value)))
          case None =>
            open = Some((0L, us, us, 1L, v4(e.value)))
        }
      }
      open.foreach(st.update)
      out.iterator
    }
  }

  /** Closed gap-sessions per user (Update mode; the open tail emits when a
    * later event crosses the gap). */
  def gapSessionStream(events: Dataset[SessionEvent],
                       gapSeconds: Long): Dataset[ClosedSession] = {
    val spark = events.sparkSession
    import spark.implicits._
    events.groupByKey(_.user_id)
      .transformWithState(new GapSessionProcessor(gapSeconds),
        org.apache.spark.sql.streaming.TimeMode.None(), OutputMode.Update())
  }

  final case class CellOccupancy(cell: Int, n: Long)

  /** Per-cell running arrival count. State: one long per occupied cell
    * (≤ nLists entries total — config-bounded forever). */
  class CellCountProcessor
      extends org.apache.spark.sql.streaming.StatefulProcessor[Int, Int, CellOccupancy] {
    @transient private var st: org.apache.spark.sql.streaming.ValueState[Long] = _

    override def init(outputMode: OutputMode,
                      timeMode: org.apache.spark.sql.streaming.TimeMode): Unit =
      st = getHandle.getValueState[Long]("n",
        org.apache.spark.sql.Encoders.scalaLong,
        org.apache.spark.sql.streaming.TTLConfig.NONE)

    override def handleInputRows(key: Int, rows: Iterator[Int],
                                 tv: org.apache.spark.sql.streaming.TimerValues)
    : Iterator[CellOccupancy] = {
      val n = (if (st.exists()) st.get() else 0L) + rows.size
      st.update(n)
      Iterator.single(CellOccupancy(key, n))
    }
  }

  /** Streaming IVF cell-occupancy monitor — the COUNT half of
    * `Similarity.centroidDriftReport` as a continuous stream: arriving
    * vectors are assigned to the trained centroids by the same
    * size-independent `nearest_cell` loop (a stateless, deterministic
    * expression — identical assignment to the batch path, which is the
    * point), and each micro-batch emits every touched cell's refreshed
    * running count. A cell whose count inflates far past its trained
    * share is the append distribution the quantizer has never seen —
    * the caller's rebuild-gate policy reads these snapshots instead of
    * re-running the batch report per append. State is one long per
    * occupied cell (≤ nLists — config-bounded regardless of stream
    * length). StreamingSpec pins the drained final snapshots equal to a
    * batch `assignCells` count on the same vectors. */
  def cellOccupancyStream(vectors: DataFrame, idCol: String, vecCol: String,
                          cents: Seq[Array[Double]]): Dataset[CellOccupancy] = {
    val spark = vectors.sparkSession
    import spark.implicits._
    graft.operators.Similarity.assignCells(vectors, idCol, vecCol, cents)
      .select(col("cell")).as[Int]
      .groupByKey(identity)
      .transformWithState(new CellCountProcessor,
        org.apache.spark.sql.streaming.TimeMode.None(), OutputMode.Update())
  }

  final case class BandedDoc(doc_id: Long, band: Int, bsig: String)
  final case class StreamCandidatePair(id_a: Long, id_b: Long, band: Int)

  /** Per-bucket membership for streaming LSH near-dup: state is the list
    * of doc ids already seen in this (band, bsig) bucket, capped at
    * `maxBucket` — so state AND emission are both bounded per bucket
    * (≤ maxBucket longs, ≤ maxBucket·(maxBucket−1)/2 pairs) no matter how
    * much boilerplate the stream carries. Each newly-arriving member
    * pairs against the existing members and is appended; arrivals into a
    * saturated bucket are dropped without pairing — the PREFIX form of
    * the batch hot-band cap (a stream cannot retract already-emitted
    * pairs, so "drop the whole bucket once it exceeds cap" is not
    * implementable; first-cap-members semantics is, and is documented as
    * the difference). Within a micro-batch rows fold in doc_id order and
    * re-deliveries of an id already in state are ignored, so replays
    * cannot duplicate membership. */
  class LshBucketProcessor(maxBucket: Int)
      extends org.apache.spark.sql.streaming.StatefulProcessor[(Int, String), BandedDoc, StreamCandidatePair] {
    @transient private var members: org.apache.spark.sql.streaming.ListState[Long] = _

    override def init(outputMode: OutputMode,
                      timeMode: org.apache.spark.sql.streaming.TimeMode): Unit =
      members = getHandle.getListState[Long]("members",
        org.apache.spark.sql.Encoders.scalaLong,
        org.apache.spark.sql.streaming.TTLConfig.NONE)

    override def handleInputRows(key: (Int, String), rows: Iterator[BandedDoc],
                                 tv: org.apache.spark.sql.streaming.TimerValues)
    : Iterator[StreamCandidatePair] = {
      var cur = members.get().toVector
      val out = scala.collection.mutable.ArrayBuffer.empty[StreamCandidatePair]
      rows.toSeq.sortBy(_.doc_id).foreach { d =>
        if (!cur.contains(d.doc_id) && cur.size < maxBucket) {
          cur.foreach { o =>
            out += StreamCandidatePair(math.min(o, d.doc_id),
              math.max(o, d.doc_id), key._1)
          }
          cur = cur :+ d.doc_id
          members.appendValue(d.doc_id)
        }
      }
      out.iterator
    }
  }

  /** Streaming MinHash+LSH near-duplicate candidates — the dedup×streaming
    * matrix cell: documents arrive in micro-batches and each new arrival is
    * checked against EVERYTHING seen so far through the accumulated band
    * buckets, without ever rescanning history. Banding is the row-wise
    * `Dedup.bandedRows` (hash-for-hash the batch family), so "candidate"
    * means exactly what `Dedup.lshCandidatePairs` means — StreamingSpec
    * drains the stream and pins the distinct pair set equal to the batch
    * call on the same corpus (under the cap, prefix-vs-drop differs; see
    * [[LshBucketProcessor]]). A pair sharing several bands emits once per
    * band (the batch path's pre-`distinct()` grain); downstream either
    * `dropDuplicatesWithinWatermark` or the batch verify join absorbs it.
    * State: ≤ maxBucket ids per occupied bucket — bounded by corpus
    * bucket structure, not by stream length. */
  def lshCandidateStream(docs: DataFrame, idCol: String, textCol: String,
                         n: Int, k: Int, bands: Int,
                         maxBucketSize: Int): Dataset[StreamCandidatePair] = {
    val spark = docs.sparkSession
    import spark.implicits._
    graft.operators.Dedup.bandedRows(docs, idCol, textCol, n, k, bands)
      .select(col(idCol).cast("long").as("doc_id"), col("band"), col("bsig"))
      .as[BandedDoc]
      .groupByKey(d => (d.band, d.bsig))
      .transformWithState(new LshBucketProcessor(maxBucketSize),
        org.apache.spark.sql.streaming.TimeMode.None(), OutputMode.Update())
  }

  final case class EwmaSnapshot(user_id: Long, n: Long, ewma: Double)

  /** Streaming twin of `ops.Recurrence.ewmaReport`, on transformWithState
    * ValueState (the scalar-slot sibling of [[TopKValuesProcessor]]'s
    * ListState): state is one (count, ewma) pair per key, rows fold in
    * event-time order within each micro-batch with the SAME α·x+(1-α)·s
    * expression shape as the batch op — so on in-order delivery the final
    * snapshot is bit-identical to the batch fold (StreamingSpec pins it). */
  class EwmaProcessor(alpha: Double)
      extends org.apache.spark.sql.streaming.StatefulProcessor[Long, EventRow, EwmaSnapshot] {
    @transient private var st: org.apache.spark.sql.streaming.ValueState[(Long, Double)] = _

    override def init(outputMode: OutputMode,
                      timeMode: org.apache.spark.sql.streaming.TimeMode): Unit =
      st = getHandle.getValueState[(Long, Double)]("ewma",
        org.apache.spark.sql.Encoders.tuple(
          org.apache.spark.sql.Encoders.scalaLong,
          org.apache.spark.sql.Encoders.scalaDouble),
        org.apache.spark.sql.streaming.TTLConfig.NONE)

    override def handleInputRows(key: Long, rows: Iterator[EventRow],
                                 tv: org.apache.spark.sql.streaming.TimerValues)
    : Iterator[EwmaSnapshot] = {
      var (n, s) = if (st.exists()) st.get() else (0L, 0.0)
      rows.toSeq.sortBy(_.ts.getTime).foreach { e =>
        s = if (n == 0) e.value else alpha * e.value + (1 - alpha) * s
        n += 1
      }
      st.update((n, s))
      Iterator.single(EwmaSnapshot(key, n, s))
    }
  }

  /** Per-user running EWMA snapshots (Update mode). */
  def ewmaStream(events: Dataset[EventRow], alpha: Double): Dataset[EwmaSnapshot] = {
    val spark = events.sparkSession
    import spark.implicits._
    events.groupByKey(_.user_id)
      .transformWithState(new EwmaProcessor(alpha),
        org.apache.spark.sql.streaming.TimeMode.None(), OutputMode.Update())
  }

  final case class HoltSnapshot(user_id: Long, n: Long, level: Double,
                                trend: Double)

  /** Streaming twin of `ops.Recurrence.holtReport` — EWMA's two-state
    * sibling on the same ValueState pattern: the per-key state is
    * (count, level, trend) and every row folds through the IDENTICAL
    * coupled expressions as the batch op (l' = α·x + (1−α)(l+b);
    * b' = β(l'−l) + (1−β)b), so in-order delivery makes the final
    * snapshot bit-identical to the batch fold (StreamingSpec pins it). */
  class HoltProcessor(alpha: Double, beta: Double)
      extends org.apache.spark.sql.streaming.StatefulProcessor[Long, EventRow, HoltSnapshot] {
    @transient private var st: org.apache.spark.sql.streaming.ValueState[(Long, Double, Double)] = _

    override def init(outputMode: OutputMode,
                      timeMode: org.apache.spark.sql.streaming.TimeMode): Unit =
      st = getHandle.getValueState[(Long, Double, Double)]("holt",
        org.apache.spark.sql.Encoders.tuple(
          org.apache.spark.sql.Encoders.scalaLong,
          org.apache.spark.sql.Encoders.scalaDouble,
          org.apache.spark.sql.Encoders.scalaDouble),
        org.apache.spark.sql.streaming.TTLConfig.NONE)

    override def handleInputRows(key: Long, rows: Iterator[EventRow],
                                 tv: org.apache.spark.sql.streaming.TimerValues)
    : Iterator[HoltSnapshot] = {
      var (n, l, b) = if (st.exists()) st.get() else (0L, 0.0, 0.0)
      rows.toSeq.sortBy(_.ts.getTime).foreach { e =>
        if (n == 0) { l = e.value; b = 0.0 }
        else {
          val nl = alpha * e.value + (1 - alpha) * (l + b)
          b = beta * (nl - l) + (1 - beta) * b
          l = nl
        }
        n += 1
      }
      st.update((n, l, b))
      Iterator.single(HoltSnapshot(key, n, l, b))
    }
  }

  /** Per-user running Holt level/trend snapshots (Update mode). */
  def holtStream(events: Dataset[EventRow], alpha: Double,
                 beta: Double): Dataset[HoltSnapshot] = {
    val spark = events.sparkSession
    import spark.implicits._
    events.groupByKey(_.user_id)
      .transformWithState(new HoltProcessor(alpha, beta),
        org.apache.spark.sql.streaming.TimeMode.None(), OutputMode.Update())
  }

  /** Best-effort maintenance trigger shared by the ingest sinks: the
    * epoch's APPEND is already durable when the trigger fires, so a
    * transient compaction failure must NOT abort the epoch — a restart
    * would replay the batch for nothing (every sink skips a landed
    * epoch — the ledger for the directory sinks, the `#tag=epoch:`
    * header for the versioned ones — but the replay itself is wasted
    * source reads and recovery time). A skipped compaction is retried
    * at the next trigger, surfaced through `onSkip` (default: stderr,
    * visible in driver logs), and BOUNDED: `maxConsecutiveSkips`
    * consecutive failures fail the stream loudly instead of letting
    * small files accumulate forever behind a permanently broken
    * maintenance path. A success resets the counter. */
  final class CompactionGuard(label: String, maxConsecutiveSkips: Int,
                              onSkip: (Long, Exception) => Unit) {
    private val consecutive = new java.util.concurrent.atomic.AtomicInteger(0)
    def apply(batchId: Long)(body: => Unit): Unit =
      try { body; consecutive.set(0) }
      catch {
        case e: Exception =>
          val n = consecutive.incrementAndGet()
          onSkip(batchId, e)
          if (n >= maxConsecutiveSkips)
            throw new IllegalStateException(
              s"[$label] compaction failed $n consecutive trigger(s) — " +
                "failing the stream instead of accumulating small files " +
                s"without bound (last: ${e.getMessage})", e)
      }
  }

  private def stderrSkip(label: String): (Long, Exception) => Unit =
    (batchId, e) => System.err.println(
      s"[$label] compaction skipped at epoch $batchId " +
        s"(retried next trigger): ${e.getMessage}")

  /** Stream → versioned table: each micro-batch lands as one
    * `io.Versioned` commit, so a long-running ingest gets table-format
    * semantics for free — readers pin a snapshot and are isolated from
    * in-flight batches, and `snapshot(v)` time-travels the ingest history.
    *
    * EXACTLY-ONCE per epoch: each commit's manifest records the epoch id
    * as a `#tag=epoch:<batchId>` header (landed atomically with the entry
    * list). At (re)start the sink resolves the largest landed epoch once,
    * and a replayed epoch at or below it is SKIPPED — a crash between the
    * checkpoint's epoch commit and Spark's offset write no longer lands
    * the same rows as a second version. Epochs land in order (foreachBatch
    * serializes), so the boundary is one number, not a set. */
  /** `compactEvery`/`smallBytes`: every N epochs the sink lands a
    * [[graft.io.Versioned.compactSmallFiles]] OPTIMIZE commit after the
    * batch's append — micro-batch commits are the worst small-file
    * generator there is (one commit dir per epoch forever), and the
    * versioned compaction keeps the live manifest's file count bounded
    * WITHOUT breaking snapshot isolation: pinned readers keep their
    * version, old files stay until vacuum. The append and the compaction
    * run in the same serialized epoch, so the maintenance conflict check
    * never trips against this sink's own appends. `compactEvery <= 0`
    * disables (the pre-round-13 behavior). Compaction failures follow the
    * [[CompactionGuard]] contract (bounded consecutive skips, `onSkip`). */
  def versionedSink(df: DataFrame, table: String, checkpoint: String,
                    compactEvery: Int = 0,
                    smallBytes: Long = 8L << 20,
                    maxConsecutiveSkips: Int = 10,
                    onSkip: (Long, Exception) => Unit = stderrSkip("versionedSink"),
                    compactFn: (org.apache.spark.sql.SparkSession, String, Long) => Int =
                      graft.io.Versioned.compactSmallFiles(_, _, _)): StreamingQuery = {
    val guard = new CompactionGuard("versionedSink", maxConsecutiveSkips, onSkip)
    // resolved lazily INSIDE the first epoch (the table may not exist at
    // sink construction); -1 = nothing landed yet
    var landedThrough = Option.empty[Long]
    df.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (landedThrough.isEmpty)
          landedThrough = Some(
            if (graft.io.Versioned.latestVersion(table) < 1) -1L
            else graft.io.Versioned.latestTaggedSuffix(table, "epoch:")
              .getOrElse(-1L))
        if (batchId > landedThrough.get) {
          graft.io.Versioned.commit(batch, table,
            tag = Some(s"epoch:$batchId")): Unit
          landedThrough = Some(batchId)
        }
        if (compactEvery > 0 && batchId % compactEvery == compactEvery - 1)
          guard(batchId) {
            compactFn(batch.sparkSession, table, smallBytes): Unit
          }
      }
      .start()
  }

  /** Stream → VERSIONED UPSERT (CDC apply): each micro-batch lands as
    * ONE [[graft.io.Versioned.merge]] commit — matched keys update,
    * unmatched insert, only the files holding matched keys rewrite —
    * with the `#tag=epoch:` header for EXACTLY-ONCE replay skipping
    * (the [[versionedSink]] contract on the merge path). The first epoch
    * on a fresh table creates it with a plain commit.
    *
    * `orderCol`: when a batch can carry SEVERAL rows per key (the CDC
    * norm — multiple updates between triggers), the sink keeps the row
    * with the MAX `orderCol` per key before merging (last-writer-wins at
    * batch grain; ties break on the remaining columns via the same
    * deterministic argmax the batch dedup operators use). Without it the
    * merge's unique-key guard fails loudly on a duplicated key. */
  def versionedMergeSink(df: DataFrame, table: String, keyCols: Seq[String],
                         checkpoint: String,
                         orderCol: Option[String] = None,
                         sortCols: Seq[String] = Nil): StreamingQuery = {
    var landedThrough = Option.empty[Long]
    df.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (landedThrough.isEmpty)
          landedThrough = Some(
            if (graft.io.Versioned.latestVersion(table) < 1) -1L
            else graft.io.Versioned.latestTaggedSuffix(table, "epoch:")
              .getOrElse(-1L))
        if (batchId > landedThrough.get) {
          val deduped = orderCol match {
            case None => batch
            case Some(oc) =>
              import org.apache.spark.sql.expressions.Window
              batch.withColumn("__rn",
                  org.apache.spark.sql.functions.row_number().over(
                    Window.partitionBy(keyCols.map(batch(_)): _*)
                      .orderBy((oc +: batch.columns.filterNot(_ == oc).toSeq)
                        .map(c => batch(c).desc): _*)))
                .where(org.apache.spark.sql.functions.col("__rn") === 1)
                .drop("__rn")
          }
          if (graft.io.Versioned.latestVersion(table) < 1)
            graft.io.Versioned.commit(deduped, table,
              tag = Some(s"epoch:$batchId")): Unit
          else
            graft.io.Versioned.merge(batch.sparkSession, table, deduped,
              keyCols, sortCols, tag = Some(s"epoch:$batchId")): Unit
          landedThrough = Some(batchId)
        }
      }
      .start()
  }

  /** Stream → z-clustered layout with the COMPACTION TRIGGER integrated:
    * each micro-batch lands EXACTLY-ONCE into the z-bucket directories
    * ([[graft.io.Layout.appendZClusteredExactlyOnce]] — the
    * [[graft.io.EpochLedger]] protocol: a crash-replayed epoch is
    * skipped if landed, self-healed by purge if partial, so a restart
    * never duplicates rows where a bare dynamic append would), and every
    * `compactEvery` batches the standing maintenance pass rewrites
    * directories over `maxFilesPerDir` to one file
    * ([[graft.io.Layout.compactZBuckets]]) — a long-running ingest keeps
    * file counts bounded by construction instead of waiting for an
    * operator to remember a manual compaction.
    *
    * Single-writer discipline, made EXPLICIT: the trigger runs inside the
    * same foreachBatch epoch as the append, and streaming epochs are
    * serialized — appender and compactor are the one table writer, so the
    * directory swap never races another writer (and the compactor only
    * ever rewrites LANDED epochs' files, which the ledger's purge never
    * touches). The trigger fires on
    * `batchId % compactEvery == compactEvery - 1` (epoch ids survive
    * checkpoint recovery, so a restarted stream keeps the cadence);
    * `compactEvery <= 0` disables it. Reads return identical rows before
    * and after a trigger (the layout's compaction invariant, pinned by
    * LayoutSpec and StreamingSpec). */
  def zLayoutSink(df: DataFrame, cols: Seq[String], bits: Int,
                  bucketBits: Int, numFiles: Int, path: String,
                  checkpoint: String, compactEvery: Int = 16,
                  maxFilesPerDir: Int = 8,
                  maxConsecutiveSkips: Int = 10,
                  onSkip: (Long, Exception) => Unit = stderrSkip("zLayoutSink"))
      : StreamingQuery = {
    val guard = new CompactionGuard("zLayoutSink", maxConsecutiveSkips, onSkip)
    df.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        graft.io.Layout.appendZClusteredExactlyOnce(batch, cols, bits,
          bucketBits, numFiles, path, batchId): Unit
        // guarded, not bare: the epoch's append is already durable here,
        // and a transient compaction failure aborting the epoch would
        // force a replay on restart (now harmless — the ledger skips it —
        // but still wasted work). Same contract as versionedSink's
        // trigger, bounded by maxConsecutiveSkips.
        if (compactEvery > 0 && batchId % compactEvery == compactEvery - 1)
          guard(batchId) {
            graft.io.Layout.compactZBuckets(batch.sparkSession, path,
              maxFilesPerDir): Unit
          }
      }
      .start()
  }

  /** Stream → VERSIONED z-layout: the round's table-format capstone —
    * [[zLayoutSink]]'s ingest with [[versionedSink]]'s guarantees. Each
    * micro-batch commits z-clustered through
    * [[graft.io.Layout.writeZClusteredVersioned]] (manifest entries carry
    * the zb bucket per file), so:
    *  - EXACTLY-ONCE per epoch (the `epoch:` manifest tag — replayed
    *    batches skip; [[zLayoutSink]] gets the same guarantee from its
    *    [[graft.io.EpochLedger]], here the tag lands ATOMICALLY with the
    *    commit itself);
    *  - box reads resolve a PINNED manifest and prune files by bucket
    *    from metadata ([[graft.io.Layout.readZBoxVersioned]]) — readers
    *    are snapshot-isolated from the ingest;
    *  - the compaction trigger lands OPTIMIZE COMMITS
    *    ([[graft.io.Layout.compactZBucketsVersioned]]) instead of
    *    directory swaps: pinned readers keep their version, and the
    *    trigger is [[CompactionGuard]]-bounded like the other sinks. */
  def zLayoutVersionedSink(df: DataFrame, cols: Seq[String], bits: Int,
                           bucketBits: Int, numFiles: Int, table: String,
                           checkpoint: String, compactEvery: Int = 16,
                           smallBytes: Long = 8L << 20,
                           maxConsecutiveSkips: Int = 10,
                           onSkip: (Long, Exception) => Unit =
                             stderrSkip("zLayoutVersionedSink"))
      : StreamingQuery = {
    val guard = new CompactionGuard("zLayoutVersionedSink",
      maxConsecutiveSkips, onSkip)
    var landedThrough = Option.empty[Long]
    df.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (landedThrough.isEmpty)
          landedThrough = Some(
            if (graft.io.Versioned.latestVersion(table) < 1) -1L
            else graft.io.Versioned.latestTaggedSuffix(table, "epoch:")
              .getOrElse(-1L))
        if (batchId > landedThrough.get) {
          graft.io.Layout.writeZClusteredVersioned(batch, cols, bits,
            bucketBits, numFiles, table, tag = Some(s"epoch:$batchId")): Unit
          landedThrough = Some(batchId)
        }
        if (compactEvery > 0 && batchId % compactEvery == compactEvery - 1)
          guard(batchId) {
            graft.io.Layout.compactZBucketsVersioned(batch.sparkSession,
              table, smallBytes): Unit
          }
      }
      .start()
  }

  /** Stream → VERSIONED IVF index — [[zLayoutVersionedSink]]'s contract
    * on the cell layout, completing the versioned-sink family: each
    * micro-batch assigns to the FIXED trained centroids and lands as an
    * exactly-once epoch COMMIT
    * ([[graft.operators.Similarity.writeIvfIndexVersioned]] with the
    * `epoch:` tag, landed atomically with the commit — [[ivfIndexSink]]
    * gets the same replay skip from its ledger), the trigger lands
    * versioned OPTIMIZE
    * commits, and searches
    * ([[graft.operators.Similarity.ivfTopKFromIndexVersioned]]) resolve
    * pinned manifests with file-level cell pruning — snapshot-isolated
    * from the ingest, time-travelable per epoch. */
  def ivfIndexVersionedSink(df: DataFrame, idCol: String, vecCol: String,
                            cents: Seq[Array[Double]], table: String,
                            checkpoint: String, compactEvery: Int = 16,
                            smallBytes: Long = 8L << 20,
                            maxConsecutiveSkips: Int = 10,
                            onSkip: (Long, Exception) => Unit =
                              stderrSkip("ivfIndexVersionedSink"))
      : StreamingQuery = {
    val guard = new CompactionGuard("ivfIndexVersionedSink",
      maxConsecutiveSkips, onSkip)
    var landedThrough = Option.empty[Long]
    df.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (landedThrough.isEmpty)
          landedThrough = Some(
            if (graft.io.Versioned.latestVersion(table) < 1) -1L
            else graft.io.Versioned.latestTaggedSuffix(table, "epoch:")
              .getOrElse(-1L))
        if (batchId > landedThrough.get) {
          graft.operators.Similarity.writeIvfIndexVersioned(batch, idCol,
            vecCol, cents, table, tag = Some(s"epoch:$batchId")): Unit
          landedThrough = Some(batchId)
        }
        if (compactEvery > 0 && batchId % compactEvery == compactEvery - 1)
          guard(batchId) {
            graft.io.Versioned.compactSmallFiles(batch.sparkSession,
              table, smallBytes, sortCols = Seq("nid")): Unit
          }
      }
      .start()
  }

  /** Stream → IVF ANN index with the same integrated compaction trigger:
    * micro-batches assign to the FIXED trained centroids and append into
    * their cell partitions ([[graft.operators.Similarity.appendToIvfIndex]]
    * — no retraining on the hot path; [[cellOccupancyStream]] /
    * `centroidDriftReport` gate rebuilds), and every `compactEvery`
    * batches hot cells compact
    * ([[graft.operators.Similarity.compactIvfIndex]]). Same serialized
    * single-writer contract as [[zLayoutSink]]. */
  def ivfIndexSink(df: DataFrame, idCol: String, vecCol: String,
                   cents: Seq[Array[Double]], path: String,
                   checkpoint: String, compactEvery: Int = 16,
                   maxFilesPerCell: Int = 8,
                   maxConsecutiveSkips: Int = 10,
                   onSkip: (Long, Exception) => Unit = stderrSkip("ivfIndexSink"))
      : StreamingQuery = {
    val guard = new CompactionGuard("ivfIndexSink", maxConsecutiveSkips, onSkip)
    df.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        graft.operators.Similarity.appendToIvfIndexExactlyOnce(batch,
          idCol, vecCol, cents, path, batchId): Unit
        // same guarded-trigger rationale as zLayoutSink: the append is
        // durable and ledger-recorded; a failed compaction must not
        // abort the epoch (its replay is skipped, but wasted)
        if (compactEvery > 0 && batchId % compactEvery == compactEvery - 1)
          guard(batchId) {
            graft.operators.Similarity.compactIvfIndex(batch.sparkSession,
              path, maxFilesPerCell): Unit
          }
      }
      .start()
  }
}
