package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Union / group-expansion / type-enforcement operators
  * (SURVEY.md §2.7 W2, §2.8 C8, §2.4 F2).
  */
object Groups {

  /** W2a+F2 — the reference's "ANY position" pattern: duplicate every row
    * with the group column overwritten by a sentinel value, union by name,
    * then apply a threshold filter with a carve-out for the sentinel rows
    * (ADAPTERS/SILVER-adapter-wyscout.py:292-303). Catalyst pushes downstream
    * filters/projections through the Union, so the scan is still read once
    * per branch with pruning intact. */
  def withAnyGroup(df: DataFrame, groupCol: String, sentinel: String = "ANY"): DataFrame =
    df.unionByName(df.withColumn(groupCol, lit(sentinel)))

  /** F2 — playtime-threshold with ANY carve-out. */
  def thresholdFilter(df: DataFrame, measure: Column, threshold: Double,
                      groupCol: String, sentinel: String = "ANY"): DataFrame =
    df.where(measure > threshold || col(groupCol) === sentinel)

  /** C8 — the reference's three-way type enforcement: every listed column is
    * cast to int/string, everything else to double
    * (ADAPTERS/SILVER-adapter-wyscout.py:476-484). The final schema gate for
    * the dynamic-width stat frames. */
  def enforceTypes(df: DataFrame, intCols: Set[String], stringCols: Set[String],
                   keepCols: Set[String] = Set.empty): DataFrame =
    df.select(df.columns.map { c =>
      if (intCols(c)) col(c).cast("int").as(c)
      else if (stringCols(c)) col(c).cast("string").as(c)
      else if (keepCols(c)) col(c)
      else col(c).cast("double").as(c)
    }.toIndexedSeq: _*)
}
