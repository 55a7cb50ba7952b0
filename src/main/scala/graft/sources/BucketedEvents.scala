package graft.sources

import org.apache.hadoop.fs.{FileStatus, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.catalog.BucketSpec
import org.apache.spark.sql.catalyst.expressions.{AttributeReference, BoundReference, Expression, Predicate}
import org.apache.spark.sql.execution.datasources.{BucketingUtils, FileIndex, HadoopFsRelation, PartitionDirectory}
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.types.{IntegerType, StructField, StructType}

import graft.TableCommit

/** Bucket-aware read path for the catalog's events store (round-16
  * directive #1: person-scoped queries over INGESTED tables must read
  * exchange-free and sort-free, like the reference's permanently
  * hash-partitioned inserts — `/root/reference/src/rpc_insert.cpp:154` —
  * and stamp-sorted person grids — `src/grid.cpp:1194-1369`).
  *
  * `spark.read.parquet` drops bucket metadata, so every window/groupBy on
  * `id` over an ingested table used to pay `Exchange hashpartitioning(id)`
  * plus a per-person sort. This wires the committed snapshot into Spark's
  * NATIVE bucketed-scan machinery instead:
  *
  *   - [[ManifestFileIndex]] lists exactly the manifest's live files (the
  *     snapshot-isolation contract of [[TableCommit]] — retired files stay
  *     on disk through the grace window but are never listed), grouped as
  *     one `__bucket=b` partition per bucket so partition pruning on
  *     `__bucket` keeps working;
  *   - the relation carries `BucketSpec(n, id, sort=(id, stamp))`, and the
  *     catalog writes files whose bucket id (murmur3 `hash(id) pmod n` —
  *     Spark's own `HashPartitioning.partitionIdExpression`) is embedded in
  *     the file NAME, which is how `FileSourceScanExec` maps files to
  *     output partitions;
  *   - with one live file per bucket (the insert merge rewrites whole
  *     touched buckets), the scan also claims the (id, stamp) sort order,
  *     so `Window.partitionBy(id).orderBy(stamp)` — every OSL compile —
  *     needs NO exchange and NO sort.
  *
  * The claimed `HashPartitioning(id, n)` is truthful (same murmur3 hash at
  * write time), so co-partitioned joins against genuinely shuffled frames
  * stay correct — the reason the legacy xxhash64 layout cannot ride this
  * path and falls back to the explicit-file-list read.
  */
object BucketedEvents {

  /** The file name Spark's bucketed scan expects: the bucket id embedded
    * before the first extension dot (`part-…-<uuid>_00003.c000.parquet`),
    * parsed back by `BucketingUtils.getBucketId`. */
  def bucketedFileName(name: String, bucket: Int): String = {
    val dot = name.indexOf('.')
    val tag = BucketingUtils.bucketIdToString(bucket)
    if (dot < 0) name + tag
    else name.substring(0, dot) + tag + name.substring(dot)
  }

  /** True iff every live file's NAME carries its bucket id — the
    * precondition for the native bucketed scan. Files written before this
    * path existed (or by the legacy xxhash64 layout) fail it and the
    * caller falls back to the explicit-file-list read. */
  def allBucketNamed(state: TableCommit.State): Boolean =
    state.buckets.forall { case (b, fs) =>
      fs.forall(f => BucketingUtils.getBucketId(f).contains(b))
    }

  /** The committed snapshot as a bucketed DataFrame with columns
    * `dataSchema ++ (__bucket int)`. Caller guarantees [[allBucketNamed]]
    * and a murmur3-bucketed layout. */
  def snapshot(spark: SparkSession, root: String, state: TableCommit.State,
               dataSchema: StructType, numBuckets: Int): DataFrame = {
    val rootPath = new Path(root)
    val hadoopConf = spark.sparkContext.hadoopConfiguration
    val fs = rootPath.getFileSystem(hadoopConf)
    val parts: Seq[(Int, Array[FileStatus])] =
      state.buckets.toSeq.sortBy(_._1).map { case (b, names) =>
        b -> names.map(n =>
          fs.getFileStatus(new Path(rootPath, s"__bucket=$b/$n"))).toArray
      }
    val index = new ManifestFileIndex(rootPath, parts)
    val relation = HadoopFsRelation(
      location = index,
      partitionSchema = ManifestFileIndex.partitionSchema,
      dataSchema = StructType(dataSchema.fields.map(_.copy(nullable = true))),
      bucketSpec = Some(BucketSpec(numBuckets, Seq("id"), Seq("id", "stamp"))),
      fileFormat = new ParquetFileFormat(),
      options = Map.empty[String, String])(spark)
    spark.baseRelationToDataFrame(relation)
  }
}

/** A [[FileIndex]] over exactly the manifest's live file set — never a
  * directory listing, so retired-but-not-yet-vacuumed files are invisible
  * and readers get snapshot isolation for free. One `PartitionDirectory`
  * per bucket (partition value = the bucket id) keeps `__bucket` partition
  * pruning working through the standard `PruneFileSourcePartitions` rule. */
final class ManifestFileIndex(root: Path, parts: Seq[(Int, Array[FileStatus])])
    extends FileIndex {

  override def rootPaths: Seq[Path] = Seq(root)

  override def partitionSchema: StructType = ManifestFileIndex.partitionSchema

  override def listFiles(partitionFilters: Seq[Expression],
                         dataFilters: Seq[Expression]): Seq[PartitionDirectory] = {
    // bind partition filters to the single __bucket column by NAME — the
    // same binding PartitioningAwareFileIndex.prunePartitions applies
    val selected =
      if (partitionFilters.isEmpty) parts
      else {
        val predicate = partitionFilters.reduce(
          org.apache.spark.sql.catalyst.expressions.And)
        val bound = Predicate.create(predicate.transform {
          case a: AttributeReference if a.name == "__bucket" =>
            BoundReference(0, IntegerType, nullable = false)
        })
        bound.initialize(0)
        parts.filter { case (b, _) => bound.eval(InternalRow(b)) }
      }
    selected.map { case (b, files) => PartitionDirectory(InternalRow(b), files) }
  }

  override def inputFiles: Array[String] =
    parts.flatMap(_._2.map(_.getPath.toString)).toArray

  override def refresh(): Unit = ()

  override def sizeInBytes: Long = parts.flatMap(_._2.map(_.getLen)).sum
}

object ManifestFileIndex {
  val partitionSchema: StructType =
    StructType(Seq(StructField("__bucket", IntegerType, nullable = false)))
}
