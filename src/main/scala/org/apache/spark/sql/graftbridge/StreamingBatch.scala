package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.classic.SparkSession

/** The one `private[sql]` doorway the V1 sink API forces: a sink's
  * `addBatch` receives a STREAMING-tagged DataFrame that refuses batch
  * writes; rewrapping its physical rows as a batch frame is exactly what
  * Spark's own file sink does internally. Nothing else in this package.
  */
object StreamingBatch {
  def asBatch(df: DataFrame): DataFrame = {
    val s = df.sparkSession.asInstanceOf[SparkSession]
    s.internalCreateDataFrame(df.queryExecution.toRdd, df.schema,
      isStreaming = false)
  }
}
