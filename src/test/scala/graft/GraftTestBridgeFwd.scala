package graft

import org.apache.spark.sql.SparkSession

/** Listener-bus drain for specs asserting on listener-delivered state
  * (observed metrics, task durations) — forwards to the private[spark]
  * bridge. */
object GraftTestBridgeFwd {
  def drain(spark: SparkSession): Unit =
    org.apache.spark.GraftTestBridge.waitUntilListenerBusEmpty(spark.sparkContext)
}
