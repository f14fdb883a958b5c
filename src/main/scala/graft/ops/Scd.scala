package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension Type 2 maintenance: dimension rows carry
  * (valid_from, valid_to) validity intervals; an incoming snapshot closes
  * the open version of every changed key and opens a new one. The
  * serving-side sibling of the reference's upsert sinks (SURVEY §2.2 K3/K6
  * overwrite in place; SCD2 keeps the history instead).
  *
  * Scale shape: one full-outer join of the OPEN slice against the update
  * snapshot on the natural key, then unions — already-closed history is
  * never touched (at 100 TB it stays parquet-at-rest; only the open slice
  * and the day's snapshot move). Change detection is null-safe column
  * equality (`<=>`), so NULL→value and value→NULL both count as changes.
  * Deterministic: no processing-time timestamps — the effective date is an
  * injected parameter (the C6 injected-clock rule).
  */
object Scd {

  /** Merge `updates` (one row per key, the new snapshot) into `history`.
    *
    * `history` columns: keys ++ tracked ++ (valid_from, valid_to) — DATE
    * validity, open rows have valid_to IS NULL. `updates`: keys ++ tracked.
    * Returns the new full history. Re-merging the same snapshot is a no-op
    * (idempotent), because unchanged keys take the keep-open branch. */
  def scd2Merge(history: DataFrame, updates: DataFrame, keys: Seq[String],
                tracked: Seq[String], effectiveDate: String): DataFrame = {
    val eff = to_date(lit(effectiveDate))
    val closed = history.where(col("valid_to").isNotNull)
    val open = history.where(col("valid_to").isNull)

    val upd = updates.select(
        (keys.map(col) ++ tracked.map(c => col(c).as(s"__u_$c"))): _*)
      .withColumn("__upd", lit(1))
    val joined = open.withColumn("__open", lit(1))
      .join(upd, keys, "full_outer")

    // null-safe inequality on any tracked column = changed version;
    // presence markers (not data columns) decide which join side exists,
    // so all-null tracked values never masquerade as "no row"
    val changed = tracked.map(c => !(col(c) <=> col(s"__u_$c")))
      .reduce(_ || _)
    val hasOpen = col("__open").isNotNull
    val hasUpd = col("__upd").isNotNull

    val histCols = (keys ++ tracked).map(col) :+
      col("valid_from") :+ col("valid_to")

    val keepOpen = joined.where(hasOpen && (!hasUpd || !changed))
      .select(histCols: _*)
    val closeOld = joined.where(hasOpen && hasUpd && changed)
      .select(((keys ++ tracked).map(col) :+
        col("valid_from") :+ eff.as("valid_to")): _*)
    val openNew = joined.where(hasUpd && (!hasOpen || changed))
      .select((keys.map(col) ++
        tracked.map(c => col(s"__u_$c").as(c)) :+
        eff.as("valid_from") :+ lit(null).cast("date").as("valid_to")): _*)

    closed.select(histCols: _*)
      .unionByName(keepOpen).unionByName(closeOld).unionByName(openNew)
  }

  /** Snapshot diff — the audit/CDC companion to [[scd2Merge]] and the
    * MERGE writer (`Writers.mergeIntoPartitioned`): classify every key
    * across two table snapshots as added / removed / changed / unchanged,
    * with a per-column change flag for changed keys. What a data team runs
    * before trusting a re-delivered feed ("what exactly moved?") and what
    * a CDC pipeline emits as its change stream.
    *
    * One full-outer join on the key — the single data-sized shuffle; the
    * comparison is null-safe `<=>` per compared column, so NULL→value and
    * value→NULL count as changes (the scd2Merge rule). Output: keys ++
    * `status` ++ one boolean `chg_<col>` per compared column (null for
    * added/removed — there is no counterpart to compare against). At
    * 100 TB the usual consumer is the aggregate (counts per status,
    * changed-count per column) which reduces this to a config-sized
    * report frame. */
  def snapshotDiff(oldDf: DataFrame, newDf: DataFrame, keys: Seq[String],
                   compareCols: Seq[String]): DataFrame = {
    val o = oldDf.select(
        (keys.map(col) ++ compareCols.map(c => col(c).as(s"__o_$c"))): _*)
      .withColumn("__old", lit(1))
    val n = newDf.select(
        (keys.map(col) ++ compareCols.map(c => col(c).as(s"__n_$c"))): _*)
      .withColumn("__new", lit(1))
    val joined = o.join(n, keys, "full_outer")
    val changed = compareCols.map(c => !(col(s"__o_$c") <=> col(s"__n_$c")))
      .reduce(_ || _)
    val hasOld = col("__old").isNotNull
    val hasNew = col("__new").isNotNull
    val status = when(hasOld && !hasNew, "removed")
      .when(!hasOld && hasNew, "added")
      .when(changed, "changed")
      .otherwise("unchanged")
    val chgCols = compareCols.map { c =>
      when(hasOld && hasNew, !(col(s"__o_$c") <=> col(s"__n_$c")))
        .as(s"chg_$c")
    }
    joined.select((keys.map(col) :+ status.as("status")) ++ chgCols: _*)
  }

  /** CDC-stream compaction (latest-wins with tombstones): fold a change
    * feed of (key, sequence, op ∈ I/U/D, payload…) events into the final
    * table state — the apply step of every log-shipping pipeline
    * (Debezium/binlog feeds, change data feeds): for each key the
    * highest-sequence event wins; if that event is a delete the key is a
    * TOMBSTONE and emits nothing. Out-of-order delivery is free — the
    * sequence decides, not arrival order.
    *
    * Scale shape: ONE key-grain aggregate, and the winner is picked by
    * `max(struct(seq, tieBreak, op, payload…))` — the sort-free argmax
    * (the q152/q162 rule: a window row_number formulation sorts the whole
    * feed; the struct-max partial-aggregates map-side, so a key's events
    * combine within each partition before the shuffle). `tieBreak` makes
    * the struct order total, so equal-seq duplicates (redelivery) pick
    * deterministically.
    *
    * Output: (key, seq, n_changes) ++ payload columns of the winner,
    * tombstoned keys dropped. */
  def applyCdc(feed: DataFrame, keyCol: String, seqCol: String,
               tieBreakCol: String, opCol: String,
               payloadCols: Seq[String]): DataFrame =
    cdcView(cdcState(feed, keyCol, seqCol, tieBreakCol, opCol, payloadCols),
      payloadCols)

  /** The MERGEABLE state behind [[applyCdc]]: per-key winner struct +
    * change count, TOMBSTONES INCLUDED — a deleted key's (seq, 'D')
    * marker must stay in state so a stale out-of-order update arriving
    * later cannot resurrect it (drop the marker and latest-wins breaks
    * under reordering). struct-max is associative and the count sums, so
    * two states — or a state and a new batch's state — merge exactly
    * ([[cdcMerge]]): the property that makes CDC apply INCREMENTAL
    * (streaming foreachBatch, per-partition backfills) with
    * batch-equivalent results. Serving layers read through [[cdcView]],
    * which filters the tombstones out. */
  def cdcState(feed: DataFrame, keyCol: String, seqCol: String,
               tieBreakCol: String, opCol: String,
               payloadCols: Seq[String]): DataFrame = {
    val winner = struct(
      (Seq(col(seqCol).as("seq"), col(tieBreakCol).as("tb"),
        col(opCol).as("op")) ++ payloadCols.map(col)): _*)
    feed.groupBy(col(keyCol).as("key"))
      .agg(max(winner).as("w"), count(lit(1)).as("n_changes"))
  }

  /** Exact merge of two CDC states (same schema): winners re-max,
    * counts re-sum. Associative and commutative — any batching of the
    * feed folds to the same state. */
  def cdcMerge(a: DataFrame, b: DataFrame): DataFrame =
    a.unionByName(b).groupBy("key")
      .agg(max(col("w")).as("w"), sum("n_changes").as("n_changes"))

  /** Serving view of a CDC state: tombstones dropped, winner flattened. */
  def cdcView(state: DataFrame, payloadCols: Seq[String]): DataFrame =
    state.where(col("w.op") =!= "D")
      .select((Seq(col("key"), col("w.seq").as("seq"), col("n_changes")) ++
        payloadCols.map(c => col(s"w.$c").as(c))): _*)
}
