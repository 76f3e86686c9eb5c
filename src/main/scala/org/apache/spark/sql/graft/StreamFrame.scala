package org.apache.spark.sql.graft

import org.apache.spark.sql.DataFrame

/** `private[sql]` access shim (hence the package): a V1 streaming
  * `Source.getBatch` must return a DataFrame whose logical plan is
  * flagged `isStreaming=true`, and the only way to stamp that flag on
  * an arbitrary Catalyst plan is `SparkSession.internalCreateDataFrame`
  * — the same door Spark's own V1 sources use. The plan is handed over
  * as its planned RDD, unexecuted; streaming execution drives it per
  * micro-batch.
  */
object StreamFrame {
  def asStreaming(df: DataFrame): DataFrame = {
    val cs = df.sparkSession.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    cs.internalCreateDataFrame(df.queryExecution.toRdd, df.schema,
      isStreaming = true)
  }
}
