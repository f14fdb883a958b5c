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

  /** Matches the simple single-column `count(distinct x)` spec form that is
    * worth planning separately (see aggregate); anything more complex stays
    * in the fused aggregate. */
  private val CountDistinctRe =
    """(?i)^\s*count\s*\(\s*distinct\s+([A-Za-z_][A-Za-z0-9_]*)\s*\)\s*$""".r

  /** Grouped aggregation driven entirely by compiled specs — the engine's A1
    * (profile aggregation) and A2 (event→match aggregation) in one primitive.
    * Keys stay ungrouped columns; everything else comes from the specs.
    *
    * `count(distinct x)` specs are planned as a separate
    * `select(keys, x).distinct.groupBy(keys).count` pre-aggregate joined back
    * on the keys (null-safe), instead of riding in the main aggregate:
    * Spark plans a mixed distinct/non-distinct aggregate via Expand, which
    * duplicates every input row per distinct column and shuffles (keys, x)
    * pairs un-combined — measured 9.0 s vs 1.3 s on q02 at sf0.1 (SCALE.md).
    * The split is exact (same counts, null semantics preserved); set
    * `splitDistinct = false` to keep the single-aggregate plan.
    */
  def aggregate(df: DataFrame, keys: Seq[String], specs: Seq[FeatureSpec],
                splitDistinct: Boolean = true): DataFrame = {
    require(specs.nonEmpty, "FeatureStore.aggregate: no features")
    val (distincts, rest) =
      if (splitDistinct && keys.nonEmpty)
        specs.partition(s => CountDistinctRe.findFirstMatchIn(s.sql).isDefined)
      else (Nil, specs)
    val base =
      if (rest.nonEmpty) {
        val compiled = compile(rest)
        df.groupBy(keys.map(col): _*).agg(compiled.head, compiled.tail: _*)
      } else df.select(keys.map(col): _*).distinct()
    val joined = distincts.foldLeft(base) { (acc, s) =>
      val c = CountDistinctRe.findFirstMatchIn(s.sql).get.group(1)
      val renamed = keys.map(k => s"__fs_$k")
      val pre = df.select((keys :+ c).distinct.map(col): _*).distinct()
        .groupBy(keys.map(col): _*)
        .agg(count(col(c)).as(s.name))
        .select(keys.zip(renamed).map { case (k, r) => col(k).as(r) } :+
          col(s.name): _*)
      // Left join is total: distinct() keeps ≥1 row per key group, so every
      // base key matches; <=> keeps null-key groups joined like groupBy does.
      val cond = keys.zip(renamed).map { case (k, r) => acc(k) <=> pre(r) }
      acc.join(pre, cond.reduce(_ && _), "left").drop(renamed: _*)
    }
    // Restore the caller's column order (distinct specs may sit anywhere).
    joined.select((keys ++ specs.map(_.name)).map(col): _*)
  }
}
