package graft.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.connector.expressions.aggregate.Aggregation
import org.apache.spark.sql.connector.expressions.filter.Predicate
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.read.streaming.MicroBatchStream
import org.apache.spark.sql.execution.datasources.v2.parquet.ParquetScanBuilder
import org.apache.spark.sql.internal.connector.SupportsPushDownCatalystFilters
import org.apache.spark.sql.types.StructType

/** Scan builder that forwards every pushdown capability of Spark's
  * parquet scan builder (column pruning, catalyst filters, aggregate
  * pushdown, variant extraction) and decorates the built [[Scan]] with
  * micro-batch streaming support (the commit-tail source). */
final class GraftScanBuilder(
    delegate: ParquetScanBuilder,
    makeStream: StructType => MicroBatchStream)
  extends ScanBuilder
  with SupportsPushDownRequiredColumns
  with SupportsPushDownCatalystFilters
  with SupportsPushDownAggregates
  with SupportsPushDownVariantExtractions {

  override def pruneColumns(requiredSchema: StructType): Unit =
    delegate.pruneColumns(requiredSchema)

  override def pushFilters(filters: Seq[Expression]): Seq[Expression] =
    delegate.pushFilters(filters)

  override def pushedFilters: Array[Predicate] = delegate.pushedFilters

  override def pushAggregation(aggregation: Aggregation): Boolean =
    delegate.pushAggregation(aggregation)

  override def supportCompletePushDown(aggregation: Aggregation): Boolean =
    delegate.supportCompletePushDown(aggregation)

  override def pushVariantExtractions(
      extractions: Array[VariantExtraction]): Array[Boolean] =
    delegate.pushVariantExtractions(extractions)

  override def build(): Scan = new GraftScan(delegate.build(), makeStream)
}

/** Batch behavior delegates untouched; streaming reads tail the commit
  * timeline. */
final class GraftScan(delegate: Scan, makeStream: StructType => MicroBatchStream)
  extends Scan {

  override def readSchema(): StructType = delegate.readSchema()
  override def description(): String = s"graft(${delegate.description()})"
  override def toBatch: Batch = delegate.toBatch
  override def columnarSupportMode(): Scan.ColumnarSupportMode =
    delegate.columnarSupportMode()

  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
    makeStream(delegate.readSchema())
}
