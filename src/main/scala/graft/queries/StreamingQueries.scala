package graft.queries

import org.apache.spark.sql.functions._
import graft.io.Tables
import graft.multimodal.Multimodal
import graft.queries.Qutil.dround
import graft.streaming.Streaming

/** Streaming-shared and multimodal query surface. q29's aggregation is the
  * exact transform the streaming module runs over the file source — one
  * implementation, batch-verified here, stream-tested in StreamingSpec.
  */
object StreamingQueries {

  val all: Seq[Q] = Seq(

    Q.sql("q29_hourly_events",
      """SELECT CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS hour_epoch,
        |       event_type,
        |       count(*) AS n,
        |       cast(sum(cast(value as decimal(18,4))) as double) AS total_value
        |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin) { (s, d) =>
      Streaming.hourlyEventStats(Tables.events(s, d))
        .select(
          col("hour_ts").cast("timestamp").cast("long").as("hour_epoch"),
          col("event_type"), col("n"), col("total_value"))
        .orderBy("hour_epoch", "event_type")
    },

    // Multimodal plumbing: binary payload + typed metadata + stubbed batched
    // feature extraction (decode is a deterministic fake — see Multimodal).
    Q.rowsOnly("q30_multimodal_features") { (s, d) =>
      val media = Multimodal.withFakeMedia(Tables.documents(s, d), "doc_id", "text")
      val features = Multimodal.decodeFeatures(media, "doc_id", dim = 16)
      media.select(col("doc_id"), col("meta.kind").as("kind"),
          col("meta.width").as("width"), col("meta.durationMs").as("durationMs"),
          length(col("payload")).as("n_bytes"))
        .join(features, "doc_id")
        .select(col("doc_id"), col("kind"), col("width"), col("durationMs"),
          col("n_bytes"), dround(element_at(col("features"), 1), 4).as("f0"))
        .orderBy("doc_id")
    })
}
