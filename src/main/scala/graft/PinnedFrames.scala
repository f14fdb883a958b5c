package graft

import org.apache.spark.sql.DataFrame

/** Session-lifetime registry for operator-internal persist() frames whose
  * consumption point the operator cannot see (it returns a lazy DataFrame,
  * so an eager unpersist would force the subtree to recompute inside the
  * downstream job — the round-2 unpersist lesson). The frames stay cached
  * until the CALLER releases them: query runners call [[release]] (or
  * `spark.catalog.clearCache()`) between queries; a long-lived session
  * embedding the operators calls [[release]] after materializing each
  * result, exactly the `Dedup.releaseSpanCaches` contract generalized.
  *
  * Why a registry and not just clearCache: clearCache drops blocks but the
  * operator modules would still hold strong references to the frames, and
  * repeated calls in one session would grow those lists without bound —
  * pinning here keeps one list to clear, shared by every operator that
  * persists mid-pipeline (marginMine's band table, sessionizeGlobal's and
  * globalIndex's range-parted frames).
  */
object PinnedFrames {
  private val pinned =
    java.util.Collections.synchronizedList(new java.util.ArrayList[DataFrame]())

  /** Persist `df` (if not already) and register it for [[release]]. */
  def pin(df: DataFrame): DataFrame = { pinned.add(df); df }

  /** Unpersist and forget every pinned frame. */
  def release(): Unit = {
    val it = pinned.iterator()
    while (it.hasNext) { it.next().unpersist(); it.remove() }
  }
}
