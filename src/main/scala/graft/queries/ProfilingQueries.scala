package graft.queries

import org.apache.spark.sql.functions._
import graft.io.Tables
import graft.ops.Profiling

/** Data-quality profiling (A9/A10) and string-cleanup scalar surface
  * (C2/C3/C4) as oracle-checked queries.
  */
object ProfilingQueries {

  private val profCols = Seq("l_discount", "l_tax", "l_quantity")

  val all: Seq[Q] = Seq(

    // A10 — per-column null/zero percentages in one pass.
    Q.sql("q31_null_zero_profile",
      profCols.sorted.map { c =>
        s"""SELECT '$c' AS col_name,
           |       avg(CASE WHEN $c IS NULL THEN 1.0 ELSE 0.0 END) AS null_pct,
           |       avg(CASE WHEN $c = 0 THEN 1.0 ELSE 0.0 END) AS zero_pct
           |FROM lineitem""".stripMargin
      }.mkString("", "\nUNION ALL\n", "\nORDER BY col_name")) { (s, d) =>
      Profiling.nullZeroProfile(Tables.lineitem(s, d), profCols)
        .select(col("column").as("col_name"), col("null_pct"), col("zero_pct"))
        .orderBy("col_name")
    },

    // C2/C3/C4 — split/translate/regexp string cleanup on dimension strings.
    Q.sql("q32_string_clean",
      """SELECT p_partkey,
        |       split_part(p_name, ' ', 2) AS noun,
        |       upper(p_type) AS type_uc,
        |       translate(p_brand, '#', '-') AS brand_norm,
        |       CAST(regexp_extract(p_brand, 'Brand#(\d+)', 1) AS INTEGER) AS brand_num
        |FROM part ORDER BY p_partkey""".stripMargin) { (s, d) =>
      Tables.part(s, d).select(
          col("p_partkey"),
          element_at(split(col("p_name"), " "), 2).as("noun"),
          upper(col("p_type")).as("type_uc"),
          translate(col("p_brand"), "#", "-").as("brand_norm"),
          regexp_extract(col("p_brand"), "Brand#(\\d+)", 1).cast("int").as("brand_num"))
        .orderBy("p_partkey")
    })
}
