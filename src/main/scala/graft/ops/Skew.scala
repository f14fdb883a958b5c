package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for joins whose key distribution has heavy hitters
  * (SCALE.md). AQE's skew-join split handles sort-merge cases at runtime;
  * this explicit salting is for when a key is so hot that even a split
  * task set is dominated by one key — the classic many-to-one enrichment
  * join against a table with a few giant keys.
  */
object Skew {

  /** Salted equi-join: the skewed (big) side gets a deterministic salt in
    * [0, saltFactor) derived from its row content; the small side is
    * replicated saltFactor times. Result equals `big.join(small, keys)`
    * exactly — the salt only spreads each hot key over saltFactor
    * partitions. Inner/left joins on `keys`. */
  def saltedJoin(big: DataFrame, small: DataFrame, keys: Seq[String],
                 saltFactor: Int, joinType: String = "inner"): DataFrame = {
    require(saltFactor > 1, "saltFactor must be > 1")
    // deterministic per-row salt: hash of all big-side columns, not rand()
    // (re-execution of a lost task must produce the same salt)
    val bigSalted = big.withColumn("__salt",
      pmod(hash(big.columns.map(col).toIndexedSeq: _*), lit(saltFactor)))
    val saltedSmall = small.withColumn("__salt",
      explode(sequence(lit(0), lit(saltFactor - 1))))
    bigSalted.join(saltedSmall, keys :+ "__salt", joinType).drop("__salt")
  }
}
