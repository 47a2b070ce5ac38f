package graft.sources

import graft.operators.Versioned
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.functions.{BoundFunction, ScalarFunction, UnboundFunction}
import org.apache.spark.sql.connector.read.{Batch, HasPartitionKey, InputPartition, PartitionReader, PartitionReaderFactory}
import org.apache.spark.sql.execution.datasources.FilePartition
import org.apache.spark.sql.types._
import org.apache.spark.sql.vectorized.ColumnarBatch
import org.apache.spark.unsafe.hash.Murmur3_x86_32

/** The V2 function half of storage-partitioned joins: Spark only
  * treats two KeyGroupedPartitioning reports as co-partitioned when
  * both resolve `bucket(n, col)` through a FunctionCatalog to the SAME
  * canonical function — this object IS that function. Its semantics
  * are exactly the write-side layout hash of
  * [[graft.operators.Versioned.commitBucketed]]:
  * `pmod(murmur3_32(key, seed=42), n)`, i.e. Spark's own `hash()`
  * column function, so a runtime evaluation (partition filters,
  * partially-clustered distribution) can never disagree with where the
  * writer actually put the rows. Iceberg's `bucket` transform plays
  * the identical role in its SPJ support (public precedent; different
  * hash, same architecture). */
object GraftBucketFunction extends UnboundFunction {
  override def name(): String = "bucket"
  override def description(): String =
    "bucket(n, col) — pmod(murmur3(col), n), the layout hash of " +
      "bucketed graft snapshot tables"
  override def bind(inputType: StructType): BoundFunction = {
    require(inputType.fields.length == 2,
      s"bucket takes (numBuckets, key), got ${inputType.catalogString}")
    require(inputType.fields(0).dataType == IntegerType,
      s"numBuckets must be int, got ${inputType.fields(0).dataType}")
    val keyType = inputType.fields(1).dataType
    require(Seq(IntegerType, LongType, StringType, DateType,
      TimestampType).contains(keyType),
      s"unsupported bucket key type ${keyType.catalogString}")
    new BoundBucket(keyType)
  }
}

/** Bound `bucket(n, key)` for one key type. canonicalName carries the
  * key type: an int-keyed and a long-keyed bucketing hash the same
  * value differently, so they must never be judged co-partitioned. */
private[sources] final class BoundBucket(keyType: DataType)
    extends ScalarFunction[Integer] {
  override def inputTypes(): Array[DataType] = Array(IntegerType, keyType)
  override def resultType(): DataType = IntegerType
  override def isResultNullable: Boolean = false
  override def name(): String = "bucket"
  override def canonicalName(): String =
    s"graft.bucket(${keyType.catalogString})"
  override def produceResult(input: InternalRow): Integer = {
    val n = input.getInt(0)
    // matches catalyst Murmur3Hash: null contributes the seed unchanged
    val h: Int =
      if (input.isNullAt(1)) 42
      else keyType match {
        case IntegerType | DateType =>
          Murmur3_x86_32.hashInt(input.getInt(1), 42)
        case LongType | TimestampType =>
          Murmur3_x86_32.hashLong(input.getLong(1), 42)
        case StringType =>
          val u = input.getUTF8String(1)
          Murmur3_x86_32.hashUnsafeBytes(
            u.getBaseObject, u.getBaseOffset, u.numBytes, 42)
        case t => throw new IllegalStateException(s"unbindable type $t")
      }
    ((h % n) + n) % n
  }
}

/** Re-keys a parquet Batch's splits by bucket: one partition PER
  * SPLIT, each carrying its file's bucket id as the partition key —
  * the shape `SupportsReportPartitioning` promises. Split planning
  * stays Spark's (a split never crosses files, so never crosses
  * buckets); Spark's own `BatchScanExec.groupPartitions` then merges
  * same-key splits into one task in the default mode, and with
  * `spark.sql.sources.v2.bucketing.partiallyClusteredDistribution
  * .enabled` keeps a skewed bucket's splits as SEPARATE tasks,
  * replicating the other side's matching partition across them — at
  * 100 TB a hot key's bucket can be 100× the median, and split-level
  * parallelism on it is the difference between one straggler task and
  * a balanced stage. (Pre-grouping here, as before r6, silently
  * capped every bucket at one task and made that conf inert.) Reader
  * creation unwraps back to the inner FilePartition, so the
  * vectorized parquet readers run untouched. */
private[sources] final class BucketGroupedBatch(inner: Batch)
    extends Batch {
  private lazy val parts: Array[InputPartition] = {
    val files = inner.planInputPartitions().flatMap {
      case fp: FilePartition => fp.files
      case other => throw new IllegalStateException(
        s"bucketed scan expected FilePartition, got ${other.getClass}")
    }
    files.map { pf =>
      val bucket = Versioned.bucketIdOf(pf.filePath.toPath.toString)
        .getOrElse(throw new IllegalStateException(
          s"unbucketed file in bucketed scan: ${pf.filePath}"))
      (bucket, pf)
    }.sortBy(_._1)
      .zipWithIndex
      .map { case ((bucket, pf), i) =>
        new BucketKeyedPartition(bucket, FilePartition(i, Array(pf)))
      }.toArray[InputPartition]
  }
  override def planInputPartitions(): Array[InputPartition] = parts
  override def createReaderFactory(): PartitionReaderFactory =
    new UnwrapReaderFactory(inner.createReaderFactory())
}

private[sources] final class BucketKeyedPartition(bucket: Int,
    private[sources] val inner: FilePartition)
    extends InputPartition with HasPartitionKey {
  override def partitionKey(): InternalRow =
    new GenericInternalRow(Array[Any](bucket))
  override def preferredLocations(): Array[String] =
    inner.preferredLocations()
}

private[sources] final class UnwrapReaderFactory(
    inner: PartitionReaderFactory) extends PartitionReaderFactory {
  private def unwrap(p: InputPartition): FilePartition =
    p.asInstanceOf[BucketKeyedPartition].inner
  override def createReader(p: InputPartition)
      : PartitionReader[InternalRow] = inner.createReader(unwrap(p))
  override def createColumnarReader(p: InputPartition)
      : PartitionReader[ColumnarBatch] = inner.createColumnarReader(unwrap(p))
  override def supportColumnarReads(p: InputPartition): Boolean =
    inner.supportColumnarReads(unwrap(p))
}
