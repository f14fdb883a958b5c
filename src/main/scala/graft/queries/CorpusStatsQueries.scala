package graft.queries

import org.apache.spark.sql.functions._
import graft.io.Tables
import graft.operators.CorpusStats
import graft.queries.Qutil.dround

/** Corpus-level statistics: TF-IDF term salience over `documents`,
  * per-label embedding centroids over `embeddings`. The oracle replays the
  * identical integer counts and the exact decimal-sum centroid arithmetic.
  */
object CorpusStatsQueries {

  private val TopK = 3
  private val Dims = 64
  private val Quant = 6

  val all: Seq[Q] = Seq(

    // Top-3 TF-IDF terms per doc (smooth idf: tf·(ln((N+1)/(df+1))+1)).
    // tf/df/N are integers on both sides; ln runs on the identical double,
    // and the 6dp dround absorbs any last-ulp libm divergence.
    Q.sql("q48_tfidf_topk",
      s"""WITH w AS (
         |  SELECT doc_id,
         |         CASE WHEN length(trim(text)) = 0 THEN CAST([] AS VARCHAR[])
         |              ELSE string_split_regex(trim(text), '\\s+') END AS ws
         |  FROM documents),
         |tf AS (
         |  SELECT doc_id, term, count(*) AS tf
         |  FROM (SELECT doc_id, unnest(ws) AS term FROM w)
         |  GROUP BY 1, 2),
         |df AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
         |n AS (SELECT count(*) AS n FROM documents),
         |scored AS (
         |  SELECT tf.doc_id, tf.term, tf.tf, df.df,
         |         tf.tf * (ln((n.n + 1.0) / (df.df + 1.0)) + 1.0) AS score
         |  FROM tf JOIN df USING (term) CROSS JOIN n),
         |r AS (
         |  SELECT *, row_number() OVER (PARTITION BY doc_id
         |                               ORDER BY score DESC, term) AS rn
         |  FROM scored)
         |SELECT doc_id, term, tf, df,
         |       floor(score * 1000000 + 0.5) / 1000000 AS score
         |FROM r WHERE rn <= $TopK ORDER BY doc_id, term""".stripMargin) { (s, d) =>
      CorpusStats.tfidfTopTerms(Tables.documents(s, d), "doc_id", "text", TopK)
        .select(col("doc_id"), col("term"), col("tf"), col("df"),
          dround(col("score"), 6).as("score"))
        .orderBy("doc_id", "term")
    },

    // Per-label embedding centroids, long form (label, pos, c, n). The
    // quantize-then-decimal-sum makes the mean order-independent and
    // engine-identical (Qutil msum rule applied element-wise).
    Q.sql("q49_label_centroids",
      s"""WITH e AS (SELECT label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
         |x AS (
         |  SELECT label, pos, v[pos] AS x
         |  FROM (SELECT label, v, unnest(generate_series(1, $Dims)) AS pos FROM e)),
         |q AS (
         |  SELECT label, pos,
         |         CAST(floor(x * 1000000 + 0.5) / 1000000 AS DECIMAL(38, ${Quant + 2})) AS xq
         |  FROM x)
         |SELECT label, pos,
         |       floor((CAST(sum(xq) AS DOUBLE) / count(*)) * 1000000 + 0.5) / 1000000 AS c,
         |       count(*) AS n
         |FROM q GROUP BY label, pos
         |ORDER BY label, pos""".stripMargin) { (s, d) =>
      CorpusStats.labelCentroids(Tables.embeddings(s, d), "label", "embedding", Quant)
        .select(col("label"), col("pos"), dround(col("c"), 6).as("c"), col("n"))
        .orderBy("label", "pos")
    })
}
