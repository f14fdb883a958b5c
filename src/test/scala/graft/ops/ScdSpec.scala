package graft.ops

import java.sql.Date
import org.apache.spark.sql.functions._
import graft.SparkSpec

class ScdSpec extends SparkSpec {
  import spark.implicits._

  private def d(s: String) = Date.valueOf(s)

  private val history = Seq(
    // key 1: already has a closed version + an open one
    (1L, "gold", d("2020-01-01"), Option(d("2022-01-01"))),
    (1L, "platinum", d("2022-01-01"), None: Option[Date]),
    // key 2: open, will be unchanged
    (2L, "silver", d("2021-01-01"), None: Option[Date]),
    // key 3: open with NULL tracked value, will change to non-null
    (3L, null.asInstanceOf[String], d("2021-01-01"), None: Option[Date]))
    .toDF("id", "tier", "valid_from", "valid_to")

  private val updates = Seq(
    (1L, "diamond"), // changed → close + open
    (2L, "silver"),  // unchanged → keep open
    (3L, "bronze"),  // NULL → value counts as a change (null-safe compare)
    (9L, "new"))     // brand-new key → open only
    .toDF("id", "tier")

  test("scd2Merge closes changed, keeps unchanged, opens new, preserves history") {
    val out = Scd.scd2Merge(history, updates, Seq("id"), Seq("tier"), "2024-06-01")
      .orderBy("id", "valid_from")
      .as[(Long, String, Date, Option[Date])].collect().toSeq
    assert(out == Seq(
      (1L, "gold", d("2020-01-01"), Some(d("2022-01-01"))),     // untouched closed
      (1L, "platinum", d("2022-01-01"), Some(d("2024-06-01"))), // closed now
      (1L, "diamond", d("2024-06-01"), None),                   // new version
      (2L, "silver", d("2021-01-01"), None),                    // unchanged
      (3L, null, d("2021-01-01"), Some(d("2024-06-01"))),       // null→value closed
      (3L, "bronze", d("2024-06-01"), None),
      (9L, "new", d("2024-06-01"), None)))                      // new key
  }

  test("re-merging the same snapshot is a no-op (idempotent)") {
    val once = Scd.scd2Merge(history, updates, Seq("id"), Seq("tier"), "2024-06-01")
    val twice = Scd.scd2Merge(once, updates, Seq("id"), Seq("tier"), "2024-07-01")
    assert(once.orderBy("id", "valid_from").collect().toSeq ==
      twice.orderBy("id", "valid_from").collect().toSeq)
  }

  test("exactly one open row per key after merge") {
    val out = Scd.scd2Merge(history, updates, Seq("id"), Seq("tier"), "2024-06-01")
    val opens = out.where(col("valid_to").isNull)
      .groupBy("id").count().as[(Long, Long)].collect().toMap
    assert(opens.values.forall(_ == 1L))
    assert(opens.keySet == Set(1L, 2L, 3L, 9L))
  }

  test("snapshotDiff classifies added/removed/changed/unchanged with " +
    "null-safe per-column flags (NULL→value and value→NULL are changes)") {
    val oldDf = Seq(
      (1L, Option("a"), Option(1.0)),  // unchanged
      (2L, Option("b"), Option(2.0)),  // value→NULL on x
      (3L, None: Option[String], Option(3.0)), // NULL→value on s
      (4L, Option("d"), Option(4.0)))  // removed
      .toDF("id", "s", "x")
    val newDf = Seq(
      (1L, Option("a"), Option(1.0)),
      (2L, Option("b"), None: Option[Double]),
      (3L, Option("c"), Option(3.0)),
      (5L, Option("e"), Option(5.0)))  // added
      .toDF("id", "s", "x")
    val got = Scd.snapshotDiff(oldDf, newDf, Seq("id"), Seq("s", "x"))
      .orderBy("id")
      .as[(Long, String, Option[Boolean], Option[Boolean])].collect().toSeq
    assert(got == Seq(
      (1L, "unchanged", Some(false), Some(false)),
      (2L, "changed", Some(false), Some(true)),
      (3L, "changed", Some(true), Some(false)),
      (4L, "removed", None, None),
      (5L, "added", None, None)))
  }

  test("applyCdc: latest wins, tombstones drop, out-of-order and redelivery") {
    // key 1: I then U — final value from the U
    // key 2: I then D — tombstoned, emits nothing
    // key 3: delivered OUT OF ORDER (U seq 5 arrives before I seq 1) —
    //        sequence decides, final is the seq-5 U
    // key 4: D then a LATER re-insert — delete is not terminal
    // key 5: equal-seq redelivery — tieBreak (event id) picks id 21
    val feed = Seq(
      (1L, 1L, 10L, "I", 1.0), (1L, 2L, 11L, "U", 2.0),
      (2L, 1L, 12L, "I", 3.0), (2L, 2L, 13L, "D", 0.0),
      (3L, 5L, 14L, "U", 9.0), (3L, 1L, 15L, "I", 4.0),
      (4L, 1L, 16L, "D", 0.0), (4L, 2L, 17L, "I", 7.0),
      (5L, 1L, 20L, "U", 5.0), (5L, 1L, 21L, "U", 6.0))
      .toDF("k", "seq", "eid", "op", "v")
    val got = Scd.applyCdc(feed, "k", "seq", "eid", "op", Seq("v"))
      .orderBy("key")
      .as[(Long, Long, Long, Double)].collect().toSeq
    assert(got == Seq(
      (1L, 2L, 2L, 2.0),
      (3L, 5L, 2L, 9.0),
      (4L, 2L, 2L, 7.0),
      (5L, 1L, 2L, 6.0)))
  }
}
