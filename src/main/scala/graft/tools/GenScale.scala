package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev tool: scale an existing sf directory by `replicas`× for scaling
  * MEASUREMENT (SCALE.md's measured-growth rows). Not driver test data —
  * bench-only input; never oracle-checked.
  *
  * Design: the output is `replicas` DISJOINT SHARDS of the source, with
  * every key domain (orderkey, custkey, suppkey, partkey, doc_id, vec_id)
  * offset per shard and every similarity namespace (document tokens, part
  * brands) tagged per shard. This is the honest model of a 10× crawl /
  * 10× TPC-H load:
  *  - within-shard duplication, block and cluster structure mirrors the
  *    source EXACTLY, so near-dup pairs, CC edges, fuzzy blocks and graph
  *    components scale linearly — naive replication without namespacing
  *    would instead make every row a 10-way near-duplicate of its copies
  *    (quadratic pair blowup that measures the generator, not the
  *    operator);
  *  - block keys (p_brand) scale in cardinality with the data, keeping
  *    block SIZE constant — the design assumption blocked linkage states
  *    (ops.Fuzzy scaladoc); growing block size instead would measure the
  *    declared-quadratic regime;
  *  - embeddings get per-shard jitter so shards are semantically disjoint
  *    but the 10-label cluster geometry is preserved.
  * region/nation stay fixed-size (scale-independent dimensions, as in
  * TPC-H).
  *
  * Usage: runMain graft.tools.GenScale <srcSfDir> <outDir> <replicas>
  */
object GenScale {

  def main(args: Array[String]): Unit = {
    val (src, out, reps) = (args(0), args(1), args(2).toInt)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    generate(spark, src, out, reps)
    spark.stop()
  }

  def generate(spark: SparkSession, src: String, out: String, reps: Int): Unit = {
    def rd(n: String): DataFrame = graft.io.Tables.load(spark, src, n)
    def wr(df: DataFrame, n: String): Unit = {
      // One output file per shard-sized slice, never one file total: a
      // single small file is ONE scan task no matter the cluster, which
      // serializes every map-only pass over it (measured: q46's regex
      // redact ran 16.7× at 10× data off a single 6.8 MB file — a
      // generator artifact, not an operator cost; a real 10× corpus
      // arrives as many files). reps×4 splits ≈ the source's task
      // granularity per shard.
      df.repartition(reps * 4).write.mode("overwrite").parquet(s"$out/$n.parquet")
      println(s"[genscale] $n: ${spark.read.parquet(s"$out/$n.parquet").count()} rows")
    }
    // shard fan-out: cross join each row with rep = 0..reps-1
    def sharded(df: DataFrame): DataFrame =
      df.withColumn("rep", explode(sequence(lit(0L), lit(reps - 1L))))
    // key offset: shard-local key + rep · (1 + max source key) — disjoint
    // ranges; explicit long cast so INT-typed key columns in a source
    // directory don't throw a ClassCastException on getLong
    def off(df: DataFrame, keyCol: String): Long =
      df.agg(max(col(keyCol).cast("long"))).head().getLong(0) + 1L

    wr(rd("region"), "region")
    wr(rd("nation"), "nation")

    val cust = rd("customer"); val cOff = off(cust, "c_custkey")
    wr(sharded(cust).withColumn("c_custkey", col("c_custkey") + col("rep") * cOff)
      .drop("rep"), "customer")

    val supp = rd("supplier"); val sOff = off(supp, "s_suppkey")
    wr(sharded(supp).withColumn("s_suppkey", col("s_suppkey") + col("rep") * sOff)
      .drop("rep"), "supplier")

    val part = rd("part"); val pOff = off(part, "p_partkey")
    wr(sharded(part)
      .withColumn("p_partkey", col("p_partkey") + col("rep") * pOff)
      .withColumn("p_brand", concat(col("p_brand"), lit("#s"), col("rep")))
      .drop("rep"), "part")

    val ord = rd("orders"); val oOff = off(ord, "o_orderkey")
    wr(sharded(ord)
      .withColumn("o_orderkey", col("o_orderkey") + col("rep") * oOff)
      .withColumn("o_custkey", col("o_custkey") + col("rep") * cOff)
      .drop("rep"), "orders")

    val li = rd("lineitem")
    wr(sharded(li)
      .withColumn("l_orderkey", col("l_orderkey") + col("rep") * oOff)
      .withColumn("l_partkey", col("l_partkey") + col("rep") * pOff)
      .withColumn("l_suppkey", col("l_suppkey") + col("rep") * sOff)
      .drop("rep"), "lineitem")

    val ev = rd("events"); val eOff = off(ev, "event_id")
    wr(sharded(ev)
      .withColumn("event_id", col("event_id") + col("rep") * eOff)
      .withColumn("user_id", col("user_id") + col("rep") * cOff)
      .drop("rep"), "events")

    val docs = rd("documents"); val dOff = off(docs, "doc_id")
    wr(sharded(docs)
      .withColumn("doc_id", col("doc_id") + col("rep") * dOff)
      // per-shard token namespace: within-shard shingles/near-dups mirror
      // the source; cross-shard similarity is zero by construction
      .withColumn("text", concat_ws(" ",
        transform(graft.functions.TextFunctions.words(col("text")),
          w => concat(lit("s"), col("rep"), lit("_"), w))))
      .withColumn("n_chars", length(col("text")))
      .drop("rep"), "documents")

    val emb = rd("embeddings"); val vOff = off(emb, "vec_id")
    wr(sharded(emb)
      .withColumn("vec_id", col("vec_id") + col("rep") * vOff)
      // deterministic jitter ±0.01 per (vec, shard, dim): shards are
      // distinct vectors but keep the label-cluster geometry
      .withColumn("embedding",
        transform(col("embedding"), (x, j) =>
          (x + (pmod(hash(col("vec_id"), col("rep"), j), lit(201)) - lit(100))
            .cast("float") / lit(10000.0f)).cast("float")))
      .drop("rep"), "embeddings")
  }
}
