package org.apache.spark

/** Test-only bridge into Spark's private[spark] listener bus — the same
  * narrow-bridge idiom as [[org.apache.spark.sql.GraftSqlBridge]]: the
  * skew-stress spec reads per-task shuffle metrics from a SparkListener,
  * and the bus posts asynchronously, so an assertion immediately after an
  * action races the events unless the bus is drained first.
  */
object GraftTestBridge {
  def drainListenerBus(sc: SparkContext): Unit = sc.listenerBus.waitUntilEmpty()
}
