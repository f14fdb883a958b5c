package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal joins Spark lacks as built-ins, composed from existing
  * operators per the preference order (compose > custom Expression >
  * custom SparkPlan): no custom physical operator is needed because both
  * reduce to one shuffle + one window / one equi-join.
  */
object AsOf {

  /** As-of (backward) join: for every left row, attach the payload of the
    * latest right row with the same key and `rightTime <= leftTime`.
    *
    * Implementation: tag and union both sides, sort each key partition by
    * (time, rightness), and carry the last right row forward with ONE
    * `last(ignoreNulls)` over an unbounded-preceding window — one shuffle
    * on the key, no range condition, no broadcast requirement on either
    * side. The whole payload rides in a single struct whose null-ness
    * marks "is a right row", so every left row receives ALL payload
    * columns from the SAME matched right row — a per-column carry would
    * silently backfill a NULL payload column from an older right row,
    * which a true as-of join never does (AsOfSpec pins this). Right rows
    * sort before left rows at equal times (inclusive semantics). With
    * several right rows at the exact same (key, time), the greatest
    * `tieBreak` wins — deterministic, unlike engine-dependent ASOF tie
    * handling.
    *
    * At scale this is the canonical formulation: a sort-merge-join-shaped
    * single pass; skewed keys split fine because the window is sequential
    * per key but keys are independent.
    */
  def joinAsOf(left: DataFrame, right: DataFrame, key: String,
               leftTime: String, rightTime: String,
               payloadCols: Seq[String],
               tieBreak: Option[String] = None): DataFrame = {
    val leftCols = left.columns
    val pType = org.apache.spark.sql.types.StructType(payloadCols.map(c =>
      org.apache.spark.sql.types.StructField(c, right.schema(c).dataType)))
    val lTagged = left
      .withColumn("__t", col(leftTime))
      .withColumn("__isRight", lit(0))
      .select((leftCols.map(col).toIndexedSeq :+ col("__t") :+ col("__isRight") :+
        lit(null).cast(pType).as("__p")): _*)
    val rTagged = right
      .withColumn("__t", col(rightTime))
      .withColumn("__isRight", lit(1))
      .select((leftCols.map(c =>
        if (c == key) col(key)
        else lit(null).cast(left.schema(c).dataType).as(c)).toIndexedSeq :+
        col("__t") :+ col("__isRight") :+
        // non-null for EVERY right row, even when all payload fields are
        // null — the struct's null-ness is the right-row marker
        struct(payloadCols.map(c => col(c).as(c)): _*).as("__p")): _*)
    val unioned = lTagged.unionByName(rTagged.select(lTagged.columns.map(col).toIndexedSeq: _*))
    val ordering: Seq[Column] =
      Seq(col("__t").asc, col("__isRight").desc) ++
        tieBreak.map(c => col("__p").getField(c).asc).toSeq
    val w = Window.partitionBy(col(key)).orderBy(ordering: _*)
      .rowsBetween(Window.unboundedPreceding, 0)
    unioned
      .withColumn("__asof", last(col("__p"), ignoreNulls = true).over(w))
      .where(col("__isRight") === 0)
      .select((leftCols.map(col).toIndexedSeq ++
        payloadCols.map(c => col("__asof").getField(c).as(s"asof_$c"))): _*)
  }

  /** Forward as-of join: for every left row, the EARLIEST right row with
    * `rightTime >= leftTime` — the mirror of [[joinAsOf]] (pandas
    * merge_asof direction='forward'): "the next reading after the
    * order", "the first response after the alert". Same one-shuffle
    * union-and-carry construction, reflected: right rows sort AFTER left
    * rows at equal times (inclusive ≥) and the carry is
    * `first(ignoreNulls)` over the FOLLOWING frame. Smallest `tieBreak`
    * wins among equal-time right rows. */
  def joinAsOfForward(left: DataFrame, right: DataFrame, key: String,
                      leftTime: String, rightTime: String,
                      payloadCols: Seq[String],
                      tieBreak: Option[String] = None): DataFrame = {
    val leftCols = left.columns
    val pType = org.apache.spark.sql.types.StructType(payloadCols.map(c =>
      org.apache.spark.sql.types.StructField(c, right.schema(c).dataType)))
    val lTagged = left
      .withColumn("__t", col(leftTime))
      .withColumn("__isRight", lit(0))
      .select((leftCols.map(col).toIndexedSeq :+ col("__t") :+ col("__isRight") :+
        lit(null).cast(pType).as("__p")): _*)
    val rTagged = right
      .withColumn("__t", col(rightTime))
      .withColumn("__isRight", lit(1))
      .select((leftCols.map(c =>
        if (c == key) col(key)
        else lit(null).cast(left.schema(c).dataType).as(c)).toIndexedSeq :+
        col("__t") :+ col("__isRight") :+
        struct(payloadCols.map(c => col(c).as(c)): _*).as("__p")): _*)
    val unioned = lTagged.unionByName(
      rTagged.select(lTagged.columns.map(col).toIndexedSeq: _*))
    val ordering: Seq[Column] =
      Seq(col("__t").asc, col("__isRight").asc) ++
        tieBreak.map(c => col("__p").getField(c).asc).toSeq
    val w = Window.partitionBy(col(key)).orderBy(ordering: _*)
      .rowsBetween(0, Window.unboundedFollowing)
    unioned
      .withColumn("__asof", first(col("__p"), ignoreNulls = true).over(w))
      .where(col("__isRight") === 0)
      .select((leftCols.map(col).toIndexedSeq ++
        payloadCols.map(c => col("__asof").getField(c).as(s"asof_$c"))): _*)
  }

  /** Nearest as-of join: the CLOSER of the backward and forward matches
    * by |Δt|, backward winning exact ties (merge_asof
    * direction='nearest') — "the touchpoint closest to the conversion,
    * either side". Composes the two one-shuffle passes and picks per
    * left row; `idCol` must uniquely identify left rows (the re-join
    * key). Time columns must be numeric (epoch micros). Adds
    * `asof_direction` ('B'/'F', null when unmatched) next to the
    * payload. */
  def joinAsOfNearest(left: DataFrame, right: DataFrame, key: String,
                      leftTime: String, rightTime: String,
                      payloadCols: Seq[String], idCol: String,
                      tieBreak: Option[String] = None): DataFrame = {
    val leftCols = left.columns
    val pay = (payloadCols :+ rightTime).distinct
    val back = joinAsOf(left, right, key, leftTime, rightTime, pay, tieBreak)
    val fwd = joinAsOfForward(left, right, key, leftTime, rightTime, pay,
      tieBreak)
      .select(col(idCol).as("__fid") +:
        pay.map(c => col(s"asof_$c").as(s"__f_$c")): _*)
    val bt = col(s"asof_$rightTime")
    val ft = col(s"__f_$rightTime")
    val useF = bt.isNull ||
      (ft.isNotNull && (ft - col(leftTime)) < (col(leftTime) - bt))
    back.join(fwd, col(idCol) === col("__fid"), "left")
      .select((leftCols.map(col).toIndexedSeq ++
        payloadCols.map(c =>
          when(useF, col(s"__f_$c")).otherwise(col(s"asof_$c"))
            .as(s"asof_$c")) :+
        when(bt.isNull && ft.isNull, lit(null).cast("string"))
          .otherwise(when(useF, "F").otherwise("B")).as("asof_direction")): _*)
  }

  /** Range (band) join: match each point row to interval rows with
    * `lo <= point < hi`, by quantising both sides into fixed-width bands —
    * an equi-join on the band id plus a residual filter, instead of the
    * broadcast-nested-loop plan Spark gives a raw inequality join.
    * Intervals explode into ceil(width/bandWidth) band rows; choose
    * `bandWidth` near the typical interval width. */
  def rangeJoin(points: DataFrame, pointCol: String,
                intervals: DataFrame, loCol: String, hiCol: String,
                bandWidth: Double, joinType: String = "inner"): DataFrame = {
    val p = points.withColumn("__band", floor(col(pointCol) / bandWidth).cast("long"))
    val i = intervals.withColumn("__band",
      explode(sequence(
        floor(col(loCol) / bandWidth).cast("long"),
        // hi is exclusive: a hi exactly on a band boundary owes nothing to that band
        floor((col(hiCol) - lit(1e-9)) / bandWidth).cast("long"))))
    p.join(i, Seq("__band"), joinType)
      .where(col(pointCol) >= col(loCol) && col(pointCol) < col(hiCol))
      .drop("__band")
  }

  /** Interval-overlap join: pair [lLo, lHi) rows with [rLo, rHi) rows that
    * overlap (lLo < rHi ∧ rLo < lHi). Bounds are integral (e.g. epoch
    * micros). Same banding idea as [[rangeJoin]] but both sides explode
    * into their covered bands — and because an overlapping pair can share
    * several bands, each pair is attributed to exactly ONE band (the band
    * of the overlap's start, max(lLo, rLo)) instead of deduplicating
    * after the fact: a codegen'd filter versus a full distinct shuffle of
    * the pair table. Choose `bandWidth` near the typical interval width —
    * wider bands mean fewer band rows but more residual-filter misses. */
  def intervalOverlapJoin(left: DataFrame, lLo: String, lHi: String,
                          right: DataFrame, rLo: String, rHi: String,
                          bandWidth: Long): DataFrame = {
    require(bandWidth > 0, "bandWidth must be positive")
    def banded(df: DataFrame, lo: String, hi: String) =
      df.withColumn("__band", explode(sequence(
        expr(s"$lo div $bandWidth"),
        expr(s"($hi - 1) div $bandWidth"))))
    banded(left, lLo, lHi).join(banded(right, rLo, rHi), Seq("__band"))
      .where(col(lLo) < col(rHi) && col(rLo) < col(lHi))
      .where(col("__band") === expr(s"greatest($lLo, $rLo) div $bandWidth"))
      .drop("__band")
  }
}
