package graft.queries

import org.apache.spark.sql.functions._
import graft.io.Tables
import graft.ops.{Scoring, Stats}
import graft.queries.Qutil.{dround, msum}

/** C10/C11/C12 — the gold scoring path end-to-end: per-profile stats →
  * per-position z-scores → weighted metric/trait/Rating hierarchy
  * (LOADERS/GOLD-data-loader.py:446-534), join-based instead of the
  * reference's pandas row loops.
  */
object ScoringQueries {

  private val weightRows = for {
    pos <- Seq("A", "B")
    row <- Seq(
      (pos, "qty", 0.6, "Volume", 0.7, "Output", 1.0, false),
      (pos, "rev", 0.4, "Volume", 0.7, "Output", 1.0, false),
      (pos, "disc", 1.0, "Discipline", 0.3, "Output", 1.0, true))
  } yield row

  val all: Seq[Q] = Seq(
    Q.sql("q17_weighted_hierarchy",
      """WITH prof AS (
        |  SELECT l_suppkey AS s_suppkey,
        |         avg(l_quantity) AS qty,
        |         cast(sum(cast(l_extendedprice * (1 - l_discount) as decimal(18,6))) as double) AS rev,
        |         cast(sum(cast(l_discount as decimal(18,4))) as double) / count(*) AS disc
        |  FROM lineitem GROUP BY 1),
        |posd AS (
        |  SELECT p.*, CASE WHEN s.s_nationkey < 13 THEN 'A' ELSE 'B' END AS pos
        |  FROM prof p JOIN supplier s ON p.s_suppkey = s.s_suppkey),
        |z AS (
        |  SELECT s_suppkey, pos,
        |    CASE WHEN coalesce(stddev_samp(qty) OVER w, 0) = 0 THEN 0
        |         ELSE (qty - avg(qty) OVER w) / stddev_samp(qty) OVER w END AS zs_qty,
        |    CASE WHEN coalesce(stddev_samp(rev) OVER w, 0) = 0 THEN 0
        |         ELSE (rev - avg(rev) OVER w) / stddev_samp(rev) OVER w END AS zs_rev,
        |    CASE WHEN coalesce(stddev_samp(disc) OVER w, 0) = 0 THEN 0
        |         ELSE (disc - avg(disc) OVER w) / stddev_samp(disc) OVER w END AS zs_disc
        |  FROM posd WINDOW w AS (PARTITION BY pos)),
        |m AS (
        |  SELECT s_suppkey,
        |         0.6 * zs_qty + 0.4 * zs_rev + 2.5 AS Volume,
        |         1.0 * (-zs_disc) + 2.5 AS Discipline
        |  FROM z),
        |t AS (
        |  SELECT s_suppkey, Volume, Discipline,
        |         0.7 * Volume + 0.3 * Discipline AS Output
        |  FROM m)
        |SELECT s_suppkey,
        |       floor(Volume * 10000 + 0.5) / 10000 AS Volume,
        |       floor(Discipline * 10000 + 0.5) / 10000 AS Discipline,
        |       floor(Output * 10000 + 0.5) / 10000 AS Output,
        |       floor(1.0 * Output * 10000 + 0.5) / 10000 AS Rating
        |FROM t ORDER BY s_suppkey""".stripMargin) { (s, d) =>
      val prof = Tables.lineitem(s, d)
        .groupBy(col("l_suppkey").as("s_suppkey"))
        .agg(avg("l_quantity").as("qty"),
             msum(col("l_extendedprice") * (lit(1) - col("l_discount")), 6).as("rev"),
             Qutil.mavg(col("l_discount")).as("disc"))
      val posd = prof.join(
          broadcast(Tables.supplier(s, d).select("s_suppkey", "s_nationkey")),
          Seq("s_suppkey"))
        .withColumn("pos", when(col("s_nationkey") < 13, "A").otherwise("B"))
        .drop("s_nationkey")
      val z = Stats.zscore(posd, Seq("pos"), Seq("qty", "rev", "disc"))
      val weights = Scoring.weightsDf(s, weightRows)
      Scoring.score(z, Seq("s_suppkey"), "pos", weights)
        .select(col("s_suppkey"),
          dround(col("Volume"), 4).as("Volume"),
          dround(col("Discipline"), 4).as("Discipline"),
          dround(col("Output"), 4).as("Output"),
          dround(col("Rating"), 4).as("Rating"))
        .orderBy("s_suppkey")
    })
}
