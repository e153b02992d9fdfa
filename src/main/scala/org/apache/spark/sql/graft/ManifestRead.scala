package org.apache.spark.sql.graft

import org.apache.hadoop.fs.{FileStatus, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.datasources.{FileStatusCache, HadoopFsRelation, InMemoryFileIndex}
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.types.StructType

/** Plan a partitioned parquet scan from an ALREADY-KNOWN listing — the
  * read side of graft's commit-time cell manifest.
  *
  * `spark.read.parquet(dir)` discovers the tree itself; even handed the
  * explicit leaf files it re-stats every one (measured at the
  * 2M-vector/10⁴-cell decade: a ~17 s driver-side listing job per COLD
  * session, paid before a 0.2 s probed scan). A deployment-grade
  * manifest (Hive metastore partitions, Delta/Iceberg manifests) fixes
  * this by carrying the FileStatus facts — path, length, mtime — so
  * opening a table costs one manifest read, zero LIST/HEAD calls. This
  * shim does the same with Spark's own machinery: a [[FileStatusCache]]
  * pre-warmed from the manifest feeds [[InMemoryFileIndex]] (so every
  * root-dir lookup is a cache hit — no fs access, no listing job) and
  * the relation is assembled directly over that index. Partition
  * inference, pruning, split planning all stay stock Spark.
  *
  * Lives in the `org.apache.spark.sql` tree for the same reason as
  * [[Bridge]]: these are the seams Spark gives extension libraries.
  */
object ManifestRead {

  /** One manifest entry: a data file under `cell=N/`, with the stat
    * facts the writer recorded at commit time.
    */
  final case class Entry(dir: Path, status: FileStatus)

  def entry(dir: String, relPath: String, length: Long, mtime: Long)
      : Entry = {
    val p = new Path(s"$dir/$relPath")
    Entry(p.getParent,
      new FileStatus(length, false, 1, 128L * 1024 * 1024, mtime, p))
  }

  /** Build the DataFrame: root paths are the partition DIRS, their
    * children served from the pre-warmed cache; `schema` is the full
    * read-back schema (partition column included).
    */
  def parquetFromListing(spark: SparkSession, basePath: String,
      schema: StructType, entries: Seq[Entry]): DataFrame = {
    require(entries.nonEmpty, s"empty manifest listing for $basePath")
    val byDir: Map[Path, Array[FileStatus]] =
      entries.groupBy(_.dir).map { case (d, es) =>
        d -> es.map(_.status).toArray
      }
    val cache = new FileStatusCache {
      override def getLeafFiles(path: Path): Option[Array[FileStatus]] =
        byDir.get(path)
      override def putLeafFiles(path: Path, files: Array[FileStatus])
          : Unit = ()
      override def invalidateAll(): Unit = ()
    }
    val options = Map("basePath" -> basePath)
    val index = new InMemoryFileIndex(spark, byDir.keys.toSeq, options,
      Some(schema), cache, None, None)
    val partitionSchema = index.partitionSpec().partitionColumns
    val dataSchema = StructType(
      schema.filterNot(f => partitionSchema.fieldNames.contains(f.name)))
    val relation = HadoopFsRelation(index, partitionSchema, dataSchema,
      None, new ParquetFileFormat(), options)(spark)
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .baseRelationToDataFrame(relation)
  }
}
