package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StructField, StructType}

/** Projection / flattening operators (SURVEY.md §2.3).
  */
object Flatten {

  /** P1 — recursive struct flattening: walk the schema and emit
    * `col("a.b.c").alias("a_b_c")` for every leaf
    * (reference: ADAPTERS/SILVER-adapter-wyscout.py:108-124). Pure `select`,
    * so Catalyst still prunes unread leaves from the parquet scan. */
  def flattenStruct(df: DataFrame, sep: String = "_"): DataFrame =
    df.select(flatCols(df.schema, Nil, sep): _*)

  private def flatCols(schema: StructType, path: List[String], sep: String): Seq[Column] =
    schema.fields.toSeq.flatMap {
      case StructField(name, st: StructType, _, _) =>
        flatCols(st, path :+ name, sep)
      case StructField(name, _, _, _) =>
        val full = path :+ name
        Seq(col(full.map(p => s"`$p`").mkString(".")).alias(full.mkString(sep)))
    }

  /** P4 — bulk prefix strip: drop `prefix` from every column name that
    * carries it (reference drops `total_`,
    * ADAPTERS/SILVER-adapter-wyscout.py:248-258). Collision-safe: refuses to
    * produce duplicate names. */
  def stripPrefix(df: DataFrame, prefix: String): DataFrame = {
    val renamed = df.columns.map(c => if (c.startsWith(prefix)) c.drop(prefix.length) else c)
    require(renamed.distinct.length == renamed.length,
      s"stripPrefix('$prefix') would create duplicate column names")
    df.toDF(renamed.toIndexedSeq: _*)
  }

  /** P5 — bulk rename from a map (reference: chained withColumnRenamed,
    * ADAPTERS/SILVER-adapter-wyscout.py:376-385). */
  def renameAll(df: DataFrame, renames: Map[String, String]): DataFrame =
    df.withColumnsRenamed(renames)

  /** K7-support — schema reconciliation on update: drop columns the target
    * lacks, null-fill columns the frame lacks, reorder to the target
    * (reference: DEPRECATED/statsbomb-silver.py:53-67). Lets a re-run whose
    * feature CSV changed still overwrite partitions of an existing table. */
  def reconcileSchema(df: DataFrame, target: org.apache.spark.sql.types.StructType): DataFrame = {
    val have = df.columns.toSet
    df.select(target.fields.toSeq.map { f =>
      if (have(f.name)) col(f.name).cast(f.dataType).as(f.name)
      else lit(null).cast(f.dataType).as(f.name)
    }: _*)
  }

  /** P8 — header cleanup: strip NBSP, collapse " - "/"-"/whitespace runs
    * (reference: DEPRECATED/champion-silver.py:193-194). */
  def cleanHeaders(df: DataFrame): DataFrame = {
    val cleaned = df.columns.map(
      _.replace(" ", " ").replaceAll("\\s*-\\s*", " ")
        .replaceAll("\\s+", " ").trim)
    require(cleaned.distinct.length == cleaned.length,
      "cleanHeaders would create duplicate column names")
    df.toDF(cleaned.toIndexedSeq: _*)
  }
}
