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
  private val pinned = new java.util.ArrayList[DataFrame]()

  /** Release CALLBACKS for operator-internal driver-side caches that obey
    * the same lifetime as the pinned frames (e.g. Layout's collected
    * encoder cache): registered once per module, run on every
    * [[release]] — so every existing runner release site covers them
    * without per-runner wiring. */
  private val hooks = new java.util.concurrent.CopyOnWriteArrayList[() => Unit]()

  def onRelease(h: () => Unit): Unit = { hooks.add(h): Unit }

  /** Register an ALREADY-PERSISTED frame for [[release]]. Callers persist
    * at the exact storage level they need and pass the result here — this
    * registry only tracks lifetime, it never changes caching itself. */
  def pin(df: DataFrame): DataFrame = {
    pinned.synchronized { pinned.add(df) }
    df
  }

  /** Number of currently pinned frames (lifecycle specs). */
  def pinnedCount: Int = pinned.synchronized { pinned.size }

  /** Unpersist and forget every pinned frame. The swap-then-unpersist
    * keeps the critical section to the list swap: a concurrent pin() from
    * another thread (parallel tests, a multi-threaded runner) lands in the
    * fresh list instead of racing the iteration. */
  def release(): Unit = {
    val toDrop = pinned.synchronized {
      val copy = new java.util.ArrayList[DataFrame](pinned)
      pinned.clear()
      copy
    }
    toDrop.forEach(_.unpersist())
    hooks.forEach(_.apply())
  }
}
