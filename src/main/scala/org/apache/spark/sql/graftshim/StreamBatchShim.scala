package org.apache.spark.sql.graftshim

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.classic.{SparkSession => ClassicSession}

/** Re-wraps a streaming micro-batch DataFrame as a normal batch frame
  * without collecting to the driver — the streaming plan's InternalRows
  * are piped into a fresh logical relation. Lives under
  * org.apache.spark.sql to reach `private[sql]` API; no Spark classes
  * are modified. */
object StreamBatchShim {
  def rewrap(data: DataFrame): DataFrame = flagged(data, isStreaming = false)

  /** The inverse direction: stamps `isStreaming=true` on a batch plan —
    * a V1 streaming `Source.getBatch` must return such a frame
    * ([[graft.streaming.GraftCdcSource]]). */
  def asStreaming(data: DataFrame): DataFrame =
    flagged(data, isStreaming = true)

  private def flagged(data: DataFrame, isStreaming: Boolean): DataFrame = {
    val classic = data.asInstanceOf[org.apache.spark.sql.classic.Dataset[org.apache.spark.sql.Row]]
    val spark = classic.sparkSession.asInstanceOf[ClassicSession]
    // copy: codegen'd plans reuse UnsafeRow buffers; consumers of the
    // re-wrapped frame may buffer row references
    val rdd = classic.queryExecution.toRdd.map(_.copy())
    spark.internalCreateDataFrame(rdd, data.schema, isStreaming)
  }
}
