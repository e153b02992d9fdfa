package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.Ann
import graft.sources.Tables

/** Child-process half of CrossProcessSpec: open a COMMITTED index dir
  * from a separate JVM (the maintenance-job shape — one process builds,
  * another ingests) and append the odd-vec_id half of the scale dir's
  * embeddings. The parent test then asserts the documented
  * eventual-visibility contract of the listing memo: its already-open
  * session keeps the pre-append view, its NEXT session sees the
  * appended rows — across a real process boundary, not just
  * newSession().
  *
  *   runMain graft.tools.CrossProcessAppend <indexDir> <sfDir>
  */
object CrossProcessAppend {
  def main(args: Array[String]): Unit = {
    require(args.length == 2,
      "usage: CrossProcessAppend <indexDir> <sfDir>")
    val Array(indexDir, sfDir) = args
    val spark = SparkSession.builder()
      .master("local[4]")
      .appName("graft-cross-process-append")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try {
      val idx = Ann.openIndex(spark, indexDir)
      Ann.appendToIndex(spark, idx,
        Tables.embeddings(spark, sfDir).filter(col("vec_id") % 2 === 1))
      println(s"[cross-process] appended odd half into $indexDir")
    } finally spark.stop()
  }
}
