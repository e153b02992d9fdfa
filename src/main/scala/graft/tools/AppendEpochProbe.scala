package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.Ann
import graft.sources.Tables

/** Stage-attribution probe for ONE streamed ingest epoch at decade
  * scale: appends `reps` synthetic batches (real corpus vectors under
  * fresh vec_ids, so the exactly-once contract holds) through
  * [[Ann.appendToIndexIdempotent]] against a SCRATCH COPY of a pinned
  * index, with `spark.graft.ingest.timing=true` printing per-stage
  * walls (assign / probe_list / probe_scan / data_write /
  * codes / tombstones). This is how the codes-in-step ingest tax gets
  * ATTRIBUTED instead of guessed — the rehearsal's 160 s/epoch is a
  * sum over seven stages with very different remedies.
  *
  *   tools/javamain.sh graft.tools.AppendEpochProbe \
  *     <scratchIndexDir> <corpusDir> [batchRows] [reps]
  *
  * The scratch dir is MUTATED (epochs append into it) — copy the
  * pinned index first, never point this at a pinned generation.
  */
object AppendEpochProbe {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2,
      "usage: AppendEpochProbe <scratchIndexDir> <corpusDir> [batchRows] [reps]")
    val indexDir = args(0)
    val corpus = args(1)
    val batchRows = if (args.length > 2) args(2).toLong else 125000L
    val reps = if (args.length > 3) args(3).toInt else 2
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.conf.set("spark.graft.ingest.timing", "true")
    val idx = Ann.openIndex(spark, indexDir)
    val ev = Tables.embeddings(spark, corpus)
    (1 to reps).foreach { i =>
      val batch = ev
        .filter(col("vec_id") % lit(16) === (i % 16))
        .limit(batchRows.toInt)
        .withColumn("vec_id", col("vec_id") + lit(10000000L * i))
      val t0 = System.nanoTime()
      Ann.appendToIndexIdempotent(spark, idx, batch, 9000L + i)
      println(f"[epoch-probe] epoch $i total ${(System.nanoTime() - t0) / 1e9}%8.3f s")
    }
    spark.stop()
  }
}
