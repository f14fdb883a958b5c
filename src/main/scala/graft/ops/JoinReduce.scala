package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.catalyst.BloomExpressions

/** Semi-join reduction: shrink the big (fact) side of a join BEFORE its
  * shuffle, using a Bloom filter built from the small (dim) side's keys.
  *
  * This is the pattern Spark's own runtime row-group filtering
  * (`spark.sql.optimizer.runtime.bloomFilter.enabled`) applies when the
  * planner's heuristics fire; here it is an explicit, composable operator
  * so a pipeline can rely on it deterministically — e.g. a selective dim
  * filter that survives only 1% of keys cuts the fact shuffle ~100× even
  * when the dim is too large (or arrives too late in the plan) for a
  * broadcast-hash join.
  *
  * Scale shape at 100 TB:
  *  - the filter is built with one distributed aggregate over the dim keys
  *    (`stat.bloomFilter` tree-aggregates partial filters; only the final
  *    bit array — sized by `expectedKeys`/`fpp`, NOT by row count — reaches
  *    the driver);
  *  - the probe is a codegen'd map-side predicate
  *    ([[BloomExpressions.mightContainLong]]) evaluated inside the fact
  *    scan stage — no shuffle, no extra pass;
  *  - correctness never depends on the filter: Bloom has no false
  *    negatives, and the `fpp` false positives are removed by the exact
  *    join that follows. The filter only removes rows the join would have
  *    dropped anyway.
  */
object JoinReduce {

  /** Fact rows whose `factKey` might appear in `dim`'s `dimKey` set.
    * Null keys are dropped (an inner join would drop them too). */
  def bloomPrefilter(fact: DataFrame, factKey: String,
                     dim: DataFrame, dimKey: String,
                     expectedKeys: Long, fpp: Double = 0.01): DataFrame = {
    val keys = dim.select(col(dimKey).cast("long").as(dimKey))
    // stat.bloomFilter NPEs on an empty input (no partial filter to merge);
    // an empty dim legitimately means "nothing joins" — short-circuit with
    // an always-false predicate instead of crashing. The isEmpty probe is
    // a limit-1 job on the (small) dim side only.
    if (keys.isEmpty) fact.where(lit(false))
    else {
      val bf = keys.stat.bloomFilter(dimKey, expectedKeys, fpp)
      fact.where(col(factKey).isNotNull &&
        BloomExpressions.mightContainLong(col(factKey).cast("long"), bf))
    }
  }

  /** Inner equi-join with the fact side Bloom-reduced first. Extra
    * `dimCols` are carried from the dim side. */
  def reducedJoin(fact: DataFrame, factKey: String,
                  dim: DataFrame, dimKey: String,
                  expectedKeys: Long, fpp: Double = 0.01): DataFrame = {
    val pruned = bloomPrefilter(fact, factKey, dim, dimKey, expectedKeys, fpp)
    pruned.join(dim, col(factKey) === col(dimKey))
  }
}
