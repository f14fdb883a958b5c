package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an embedding column.
  *
  * Two paths:
  *  - `bruteForceTopK`: exact cosine top-k of a (small, broadcastable) query
  *    set against the corpus — the correctness baseline. The corpus side
  *    streams; per-row work is a codegen'd higher-order-function fold, no
  *    UDF, no collect.
  *  - `lshTopK`: the scale path — random-hyperplane LSH buckets (deterministic
  *    hash-derived planes), so candidate generation is an equi-join on bucket
  *    signature instead of a full cross product. Probing multiple tables
  *    trades recall for cost.
  */
object Similarity {

  /** Sequential-fold dot product over two double arrays — bit-identical to
    * DuckDB's list_reduce((a,b)->a+b) left fold, which the oracle uses. */
  def dot(a: Column, b: Column): Column =
    graft.functions.catalyst.VectorExpressions.dotProduct(a, b)

  def l2norm(a: Column): Column = sqrt(dot(a, a))

  /** Fused single-pass native expression (see VectorExpressions scaladoc);
    * same summation order as the HOF/DuckDB formulations. */
  def cosine(a: Column, b: Column): Column =
    graft.functions.catalyst.VectorExpressions.cosineSim(a, b)

  /** Exact top-k cosine neighbors for each row of `queries` (small — it gets
    * broadcast) against `corpus`. Self-matches on equal ids are excluded.
    * Output: (qid, nid, cos). */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
                     vecCol: String, k: Int): DataFrame = {
    val c = corpus.select(col(idCol).as("nid"),
      col(vecCol).cast("array<double>").as("nvec"))
    val q = queries.select(col(idCol).as("qid"),
      col(vecCol).cast("array<double>").as("qvec"))
    val scored = c.join(broadcast(q), col("qid") =!= col("nid"))
      .withColumn("cos", cosine(col("qvec"), col("nvec")))
    val w = Window.partitionBy("qid").orderBy(col("cos").desc, col("nid").asc)
    scored.withColumn("rn", row_number().over(w)).where(col("rn") <= k)
      .select("qid", "nid", "cos")
  }

  /** Deterministic random-hyperplane signature: plane p's component for
    * dimension i is ±1 from the md5 hash of "p:i"; the signature bit is the
    * sign of v·plane. `nPlanes` bits per bucket. */
  def hyperplaneSig(vec: Column, dims: Int, nPlanes: Int): Column = {
    val bits = (0 until nPlanes).map { p =>
      // dot(v, plane_p) with hash-derived ±1 components, as a fold over dims
      val s = (0 until dims).map { i =>
        val sign = if (planeSign(p, i)) 1d else -1d
        element_at(vec, i + 1) * lit(sign)
      }.reduce(_ + _)
      when(s > 0, lit(1L << p)).otherwise(lit(0L))
    }
    bits.reduce(_ + _)
  }

  /** Precomputed deterministic plane component signs (md5 of "p:i"). */
  private def planeSign(p: Int, i: Int): Boolean = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val h = md.digest(s"$p:$i".getBytes("UTF-8"))
    (h(0) & 1) == 1
  }

  /** Scale-path ANN: bucket corpus and queries by hyperplane signature, join
    * on the bucket, rank within. Equi-join replaces the cross product;
    * recall < 1 by construction (same-bucket candidates only). */
  def lshTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
              vecCol: String, dims: Int, nPlanes: Int, k: Int): DataFrame = {
    val c = corpus.select(col(idCol).as("nid"),
        col(vecCol).cast("array<double>").as("nvec"))
      .withColumn("bucket", hyperplaneSig(col("nvec"), dims, nPlanes))
    val q = queries.select(col(idCol).as("qid"),
        col(vecCol).cast("array<double>").as("qvec"))
      .withColumn("bucket", hyperplaneSig(col("qvec"), dims, nPlanes))
    val scored = c.join(broadcast(q), Seq("bucket"))
      .where(col("qid") =!= col("nid"))
      .withColumn("cos", cosine(col("qvec"), col("nvec")))
    val w = Window.partitionBy("qid").orderBy(col("cos").desc, col("nid").asc)
    scored.withColumn("rn", row_number().over(w)).where(col("rn") <= k)
      .select("qid", "nid", "cos")
  }
}
