package graft.core

import org.apache.spark.sql.SparkSession

/** Job labeling (optimization guide §1.5): multi-job operators (the IVM
  * epoch appliers, manifest staging, iterative graph rounds) set a
  * description per phase so the UI / listener profiles attribute each
  * job to the phase that ran it. Thread-local set-and-restore — safe on
  * the streaming micro-batch thread and under concurrent staging pools.
  */
object Jobs {
  def described[T](s: SparkSession, label: String)(body: => T): T = {
    val sc = s.sparkContext
    val prev = sc.getLocalProperty("spark.job.description")
    sc.setJobDescription(label)
    try body finally sc.setJobDescription(prev)
  }
}
