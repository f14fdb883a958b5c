package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Referential-integrity audit — the cross-table half of data quality
  * ([[Expectations]] covers the row-local half): for each declared FK
  * constraint, count child rows/keys whose key is missing from the parent,
  * and emit one report row per constraint.
  *
  * Scale design: the child side is compacted to its key grain FIRST
  * (groupBy key + count), so the anti-join probe carries distinct keys,
  * not fact rows — on a 100 TB fact table with a few million distinct
  * keys that is the difference between shuffling the table and shuffling
  * a key list. The parent side is its distinct key projection (column
  * pruned at the scan). One left join + one single-row aggregate per
  * constraint; the report union is constraint-count-sized.
  */
object Referential {

  /** One FK declaration: rows of `child(childKey)` must exist in
    * `parent(parentKey)`. Null child keys are not violations (SQL FK
    * semantics) and are excluded from the audited row count. */
  final case class Fk(name: String, child: DataFrame, childKey: String,
                      parent: DataFrame, parentKey: String)

  /** Report: (fk, n_rows, n_keys, n_orphan_rows, n_orphan_keys, ok). */
  def audit(constraints: Seq[Fk]): DataFrame = {
    require(constraints.nonEmpty, "no constraints given")
    constraints.map { fk =>
      val keys = fk.child.where(col(fk.childKey).isNotNull)
        .groupBy(col(fk.childKey).as("__k"))
        .agg(count(lit(1)).as("__cnt"))
      val parents = fk.parent.select(col(fk.parentKey).as("__pk")).distinct()
      keys.join(parents, col("__k") === col("__pk"), "left")
        .agg(
          sum(col("__cnt")).as("n_rows"),
          count(lit(1)).as("n_keys"),
          coalesce(sum(when(col("__pk").isNull, col("__cnt"))), lit(0L))
            .as("n_orphan_rows"),
          sum(when(col("__pk").isNull, 1L).otherwise(0L)).as("n_orphan_keys"))
        .select(lit(fk.name).as("fk"), col("n_rows"), col("n_keys"),
          col("n_orphan_rows"), col("n_orphan_keys"),
          when(col("n_orphan_keys") === 0, 1).otherwise(0).as("ok"))
    }.reduce(_.unionByName(_))
  }
}
