package org.apache.spark.sql.graftshim

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.execution.datasources.LogicalRelation
import org.apache.spark.sql.types.StructType

/** Bridge for the V1 streaming `Source.getBatch` contract: the batch
  * DataFrame's LEAF relations must carry `isStreaming = true` (the
  * micro-batch planner asserts it). The built-in file stream source and
  * the reference table format's streaming source both build their
  * batches this way (`isStreaming = true` LogicalRelations over an
  * ordinary file index) — this shim applies the same marking to a
  * ready-made batch frame, so the graft streaming source can keep
  * composing standard parquet scans (vectorized reader, pushdown,
  * codegen) instead of hand-rolling row materialization. Kept to two
  * forwarders, same policy as [[ColumnShim]]. */
object StreamingShim {

  /** `df` with every leaf relation re-marked as streaming. */
  def asStreaming(df: DataFrame): DataFrame = {
    val plan = df.queryExecution.analyzed.transform {
      case lr: LogicalRelation => lr.copy(isStreaming = true)
    }
    org.apache.spark.sql.classic.Dataset.ofRows(
      df.sparkSession.asInstanceOf[org.apache.spark.sql.classic.SparkSession],
      plan)
  }

  /** An empty streaming-marked frame with `schema`. */
  def emptyStreaming(spark: SparkSession, schema: StructType): DataFrame = {
    val cs = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    cs.internalCreateDataFrame(
      cs.sparkContext.emptyRDD[InternalRow].asInstanceOf[RDD[InternalRow]],
      schema, isStreaming = true)
  }
}
