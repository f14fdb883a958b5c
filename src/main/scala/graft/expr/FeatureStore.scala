package graft.expr

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The dynamic expression-compilation surface — the reference's single most
  * load-bearing mechanism (SURVEY.md §2.6 A1/A2): aggregation queries are
  * assembled at runtime from a CSV "feature store" of (feature_name, base_sql)
  * rows and executed through Spark SQL
  * (reference: ADAPTERS/SILVER-adapter-wyscout.py:410-431).
  *
  * Here the same surface compiles each SQL snippet with `expr()` into a
  * Catalyst `Column`, so the whole aggregation stays inside one hash-aggregate
  * with partial (map-side) combine and whole-stage codegen — no string-pasted
  * query needed, and invalid snippets fail fast with the offending name.
  */
final case class FeatureSpec(name: String, sql: String)

object FeatureStore {

  /** Compile specs to named Columns; report every syntactically-invalid
    * spec at once (Spark 4's expr() defers parsing, so validation goes
    * through the session parser eagerly — name-resolution errors still
    * surface at analysis with the aliased feature name). */
  def compile(specs: Seq[FeatureSpec]): Seq[Column] = {
    val parser = org.apache.spark.sql.SparkSession.active.sessionState.sqlParser
    val errs = scala.collection.mutable.ListBuffer.empty[String]
    val cols = specs.flatMap { s =>
      try { parser.parseExpression(s.sql); Some(expr(s.sql).as(s.name)) }
      catch { case e: Exception => errs += s"${s.name}: ${e.getMessage}"; None }
    }
    if (errs.nonEmpty)
      throw new IllegalArgumentException(
        s"FeatureStore: ${errs.size} invalid feature expression(s):\n  " +
          errs.mkString("\n  "))
    cols
  }

  /** Load specs from a headered CSV with columns (feature_name, base_sql) —
    * the reference's feature_store_<provider>.csv shape
    * (ADAPTERS/SILVER-adapter-wyscout.py:413-427). */
  def fromCsv(spark: org.apache.spark.sql.SparkSession, path: String): Seq[FeatureSpec] =
    spark.read.option("header", "true").csv(path)
      .select("feature_name", "base_sql")
      .collect()                       // config-sized: tens–hundreds of rows
      .toSeq
      .map(r => FeatureSpec(r.getString(0), r.getString(1)))

  /** Grouped aggregation driven entirely by compiled specs — the engine's A1
    * (profile aggregation) and A2 (event→match aggregation) in one primitive.
    * Keys stay ungrouped columns; everything else comes from the specs.
    */
  def aggregate(df: DataFrame, keys: Seq[String], specs: Seq[FeatureSpec]): DataFrame = {
    val compiled = compile(specs)
    require(compiled.nonEmpty, "FeatureStore.aggregate: no features")
    df.groupBy(keys.map(col): _*).agg(compiled.head, compiled.tail: _*)
  }
}
