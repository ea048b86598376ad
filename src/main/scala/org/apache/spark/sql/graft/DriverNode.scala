package org.apache.spark.sql.graft

import org.apache.spark.SparkEnv

/** Bridge exposing the driver's block-manager host:port — the identity
  * under which the driver appears in SparkStatusTracker.getExecutorInfos
  * (which exposes host/port but not executor ids). system.runtime.nodes
  * uses it to flag exactly the coordinator row. Lives in the spark
  * package because BlockManager is private[spark].
  */
object DriverNode {
  def hostPort(): String = {
    val id = SparkEnv.get.blockManager.blockManagerId
    s"${id.host}:${id.port}"
  }
}
