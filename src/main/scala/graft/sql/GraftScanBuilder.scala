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

/** READ-ONLY real-time view of a MOR table: serves the merged snapshot
  * (base + delta fold, [[graft.core.LakeTable.snapshot]]) through a V1
  * scan without mutating the table. The fallback path when
  * compact-on-read cannot run — read-only storage/credentials, or
  * compaction gated off via `spark.graft.mor.compactOnRead=false` —
  * matching the reference's merge-at-read-time behavior
  * (hudi0.13_flink1.15 TestBatchMOR.java:52-58 reads merged rows with
  * no table write). Column pruning is honored (the merge itself always
  * needs key/preCombine/commit-time, but the handed-back rows carry
  * only the required columns); filters stay in Spark — acceptable for
  * a degraded path whose normal-path sibling is the delegated
  * vectorized parquet scan. */
final class GraftMergedScanBuilder(
    spark: org.apache.spark.sql.SparkSession,
    lake: graft.core.LakeTable,
    fullSchema: StructType,
    makeStream: StructType => MicroBatchStream)
  extends ScanBuilder with SupportsPushDownRequiredColumns {

  private var required: StructType = fullSchema

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def build(): Scan = new V1Scan {
    override def readSchema(): StructType = required
    override def description(): String = "graft(mor merged read-only view)"

    override def toV1TableScan[T <: org.apache.spark.sql.sources.BaseRelation
        with org.apache.spark.sql.sources.TableScan](
        context: org.apache.spark.sql.SQLContext): T = {
      val snap = lake.snapshot()
      val cols = required.fieldNames.toSeq
      val projected =
        if (cols.isEmpty) snap.select() else snap.select(cols.map(snap.col): _*)
      new org.apache.spark.sql.sources.BaseRelation
        with org.apache.spark.sql.sources.TableScan {
        override def sqlContext: org.apache.spark.sql.SQLContext = context
        override def schema: StructType = required
        override def buildScan(): org.apache.spark.rdd.RDD[org.apache.spark.sql.Row] =
          projected.rdd
      }.asInstanceOf[T]
    }

    override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
      makeStream(readSchema())
  }
}
