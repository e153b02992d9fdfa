package graft.operators

import org.apache.hadoop.fs.{FileStatus, FileSystem, Path}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}

/** The single-file epoch DELTA tier of a cell-partitioned artifact dir —
  * the streamed-ingest answer to the file-granularity tax, shared by the
  * PQ codes artifact ([[Pq]], round 13) and the index DATA tier
  * ([[Ann]], round 14).
  *
  * WHY: a cell-PARTITIONED write of one streamed epoch costs one file
  * per touched cell. At the 2M-vector/10⁴-cell rehearsal decade that is
  * ~10⁴ files per 125k-row epoch — measured 20.6 s of a 24–29 s epoch
  * wall for the DATA write and 28–31 s for the codes write before its
  * round-13 fix, none of it bytes (`graft.tools.AppendEpochProbe`). So
  * appended epochs land instead as ONE cell-SORTED file under
  * `<artifactDir>/_delta/e-<uuid>/`: the at-rest base stays
  * cell-partitioned (built/folded by build/compact, where the
  * partitioned write amortizes over the whole corpus) and serving reads
  * base ∪ delta — the LSM contract every ingesting store converges on.
  * Probe pruning still reaches both tiers: the base by partition
  * pruning, the delta by parquet row-group min/max stats on the sorted
  * `cell` column (epoch files are written with a small row-group size
  * so a cell-range predicate skips most groups). Deltas FOLD into the
  * base at compaction; between compactions the tier is
  * epochs-since-compaction small files, listed in one listStatus.
  *
  * Crash contract: the parquet job committer creates the epoch dir at
  * job SETUP, so a crashed write leaves an `e-*` dir containing only
  * `_temporary` — [[epochDirs]] therefore lists only epoch dirs that
  * contain at least one visible data file (a footerless orphan would
  * fail every union read's schema inference AND the healing replay's
  * own anti-join, permanently wedging the stream — round-13 ADVICE).
  * Orphans past [[OrphanGraceMs]] are reaped on sight, best-effort.
  */
private[graft] object DeltaTier {

  /** Subdir name — `_`-prefixed, so the base tier's partition-discovering
    * data read never sees it (the `_centroids` trick).
    */
  val Name = "_delta"

  /** An epoch dir with no visible data file older than this is presumed
    * a crashed write's orphan and deleted on listing. Generous: a live
    * single-file epoch write commits in seconds, and a reaped dir that
    * somehow WAS live merely fails that one write job — the stream's
    * replay protocol re-lands the epoch.
    */
  private val OrphanGraceMs = 3600000L

  private def fsOf(s: SparkSession, p: Path): FileSystem =
    p.getFileSystem(s.sparkContext.hadoopConfiguration)

  private def hasVisibleFile(fs: FileSystem, dir: Path): Boolean =
    scala.util.Try(fs.listStatus(dir)).toOption.exists(_.exists { st =>
      val n = st.getPath.getName
      st.isFile && !n.startsWith("_") && !n.startsWith(".")
    })

  /** The COMMITTED epoch dirs of an artifact's delta tier: `e-*` dirs
    * carrying at least one visible data file. One listStatus of
    * `_delta` plus one per epoch dir — bounded by epochs since
    * compaction. Footerless orphans (crashed writes) are filtered, and
    * reaped once older than [[OrphanGraceMs]].
    */
  def epochDirs(s: SparkSession, artifactDir: String): Seq[FileStatus] = {
    val p = new Path(s"$artifactDir/$Name")
    val fs = fsOf(s, p)
    if (!fs.exists(p)) Seq.empty
    else fs.listStatus(p).toSeq
      .filter(st => st.isDirectory && st.getPath.getName.startsWith("e-"))
      .filter { st =>
        val visible = hasVisibleFile(fs, st.getPath)
        if (!visible &&
            st.getModificationTime <
              System.currentTimeMillis() - OrphanGraceMs)
          scala.util.Try(fs.delete(st.getPath, true))
        visible
      }
  }

  /** Fresh (non-memoized) read of the delta tier: None when absent or
    * empty. Each committed epoch dir is passed explicitly, so no tree
    * walk or partition inference happens; crashed-write orphans are
    * invisible by [[epochDirs]]' filter.
    */
  def read(s: SparkSession, artifactDir: String): Option[DataFrame] = {
    val dirs = epochDirs(s, artifactDir).map(_.getPath.toString)
    if (dirs.isEmpty) None
    else Some(s.read.parquet(dirs: _*))
  }

  /** Version fingerprint of the delta tier (count:maxMtime:dirnames of
    * the committed epoch dirs) — folded into the serving reads' memo
    * versions beside the base manifest's [[CellManifest.stateToken]], so
    * a sibling process's streamed epoch is visible to an open session at
    * its next query.
    */
  def token(s: SparkSession, artifactDir: String): String = {
    val sts = epochDirs(s, artifactDir)
    if (sts.isEmpty) "-"
    else s"${sts.length}:${sts.map(_.getModificationTime).max}:" +
      sts.map(_.getPath.getName.hashCode.toLong).sum
  }

  /** Land one epoch's rows as a single cell-sorted delta file (or
    * `files` of them for bulk batches — range-split on the sort key so
    * every file still carries a prunable cell range). The small parquet
    * row-group size is what makes the sorted `cell` column prunable
    * inside a file: stats are per row group, and one epoch-sized group
    * would span every cell. The job commit is atomic enough for the
    * replay protocol — a crashed write leaves only `_temporary`, which
    * [[epochDirs]] never lists.
    */
  def write(df: DataFrame, artifactDir: String,
      sortCols: Seq[Column], files: Int = 1): Unit = {
    val shaped =
      if (files <= 1) df.coalesce(1).sortWithinPartitions(sortCols: _*)
      else df.repartitionByRange(files, sortCols: _*)
        .sortWithinPartitions(sortCols: _*)
    shaped.write.mode("overwrite")
      .option("parquet.block.size", 4L * 1024 * 1024)
      .parquet(s"$artifactDir/$Name/e-${java.util.UUID.randomUUID()}")
  }
}
