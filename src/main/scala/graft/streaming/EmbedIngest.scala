package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.operators.Ann

/** Continuous embedding ingest: stream micro-batches of embedding rows
  * (`vec_id, embedding, label` — the embeddings-table shape) into a
  * BUILT IVF index, exactly once.
  *
  * The sink is `foreachBatch` over [[Ann.appendToIndexIdempotent]]:
  * Structured Streaming's checkpoint replays any epoch that didn't
  * commit, and the idempotent append absorbs the replay — a batchId
  * commit marker for the common case, and for the one crash window the
  * marker can't see (append job committed, marker not yet written) an
  * exact presence probe over ONLY the batch's own cells. Recovery cost
  * after a crash is therefore bounded by one batch's cell occupancy,
  * never a corpus rescan — the property that makes streaming index
  * maintenance viable at 100 TB: the serving index trails the stream
  * by one trigger interval and nothing ever rebuilds online.
  * (Compaction and retraining stay OFFLINE maintenance —
  * [[Ann.compactIndex]] / [[Ann.buildIndex]] into a new generation —
  * exactly as in the batch lifecycle; the stream only ever appends.)
  *
  * Semantics note: this is INGEST (new vec_ids), not upsert — updates
  * to existing vectors are the CDC latest-state compaction problem,
  * which [[CdcStream]] already owns. Mirrors the reference's
  * snapshot-then-stream split (`/root/reference/airflow/dags/
  * cdc_pipeline_dag.py:355-391`): the built index is the snapshot, the
  * append stream is the CDC tail.
  */
object EmbedIngest {

  /** A parquet file-source stream over embedding batch files landing in
    * `srcDir` — the arrival shape of an embedding-producer job that
    * drops one file per batch. `maxFilesPerTrigger` bounds each
    * micro-batch (and so the idempotent append's recovery probe).
    */
  def embeddingFileStream(s: SparkSession, srcDir: String,
      schema: org.apache.spark.sql.types.StructType,
      maxFilesPerTrigger: Int = 1): DataFrame =
    s.readStream
      .schema(schema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .parquet(srcDir)

  /** Start the exactly-once ingest query: every micro-batch is appended
    * to `idx` through the idempotent path, keyed by the epoch's
    * batchId. Restart with the SAME checkpoint after any failure; the
    * replayed epoch is recognized (marker or presence probe) and
    * skipped rather than double-appended.
    */
  def ingestQuery(src: DataFrame, idx: Ann.IvfIndex, checkpoint: String,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    src.writeStream
      .foreachBatch { (b: Dataset[Row], batchId: Long) =>
        Ann.appendToIndexIdempotent(b.sparkSession, idx, b, batchId)
        ()
      }
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .start()
}
