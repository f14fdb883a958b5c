package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** Malformed-record quarantine for bronze ingestion: read semi-structured
  * feeds in PERMISSIVE mode with a corrupt-record column and split the
  * stream into (parsed, quarantined) — bad rows land in a reviewable sink
  * with their raw bytes instead of failing the job (FAILFAST) or silently
  * vanishing (DROPMALFORMED). The reference's bronze pulls land raw JSON
  * with no schema enforcement at all (SURVEY §2.1); this is the
  * missing-on-purpose guard rail for running that hop at scale, where a
  * provider's occasional garbage line is a certainty, not an edge case.
  *
  * Scale: PERMISSIVE parse is row-local (rides the scan); the split is two
  * filters over one source — Spark plans a shared scan, and the quarantine
  * side is failure-rate-sized. The corrupt column must be part of the
  * declared schema, and (Spark contract) corrupt rows surface ONLY the
  * corrupt column populated, parsed fields null.
  */
object Quarantine {

  val CorruptCol = "_corrupt_record"

  /** A quarantine split. Both splits ride `raw`, the persisted parse —
    * call [[release]] once both have been materialized to their sinks,
    * or the cached parse pins executor memory for the session lifetime. */
  final case class QuarantinedRead(good: DataFrame, bad: DataFrame,
                                   raw: DataFrame) {
    def release(): Unit = { raw.unpersist(): Unit }
  }

  /** Read JSON-lines at `path` against `schema`, splitting parsed rows
    * from quarantined raw lines: `good` carries the declared schema;
    * `bad` carries the raw line plus lineage columns. The caller owns the
    * persisted parse via [[QuarantinedRead.release]]. */
  def readJsonWithQuarantine(spark: SparkSession, path: String,
                             schema: StructType): QuarantinedRead = {
    val withCorrupt = StructType(
      schema.fields :+ StructField(CorruptCol, StringType, nullable = true))
    // persisted: (a) Spark disallows corrupt-column-only projections over
    // raw files (UNSUPPORTED_FEATURE.QUERY_ONLY_CORRUPT_RECORD_COLUMN) —
    // the parse must be materialized before the split; (b) operationally
    // both splits consume the same parse, so one scan feeds two sinks
    // lineage is captured BEFORE persist: input_file_name() is defined by
    // the file scan, and evaluating it above the InMemoryRelation returns ""
    val raw = spark.read
      .schema(withCorrupt)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", CorruptCol)
      .json(path)
      .withColumn("__source_file", input_file_name())
      .persist()
    val good = raw.where(col(CorruptCol).isNull)
      .select(schema.fieldNames.map(col).toIndexedSeq: _*)
    val bad = raw.where(col(CorruptCol).isNotNull)
      .select(col(CorruptCol).as("raw"),
        col("__source_file").as("source_file"))
    QuarantinedRead(good, bad, raw)
  }
}
