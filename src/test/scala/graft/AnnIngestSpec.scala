package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.operators.{Ann, SimilarityOps}
import graft.sources.Tables
import graft.streaming.EmbedIngest

/** Exactly-once streaming ingest into the IVF index
  * ([[Ann.appendToIndexIdempotent]] + [[EmbedIngest]]): replays must
  * never double rows — via the batch marker in the common case, via the
  * cell-bounded presence probe in the crash window (append committed,
  * marker missing), and loudly (never silently) when the index was
  * mutated outside the protocol. The stream leg proves the end state
  * equals the all-at-once build: same rows, no duplicates, identical
  * exact serving.
  */
class AnnIngestSpec extends SparkSpec {

  private def tmp(prefix: String) =
    java.nio.file.Files.createTempDirectory(prefix).toString

  private def evAll = Tables.embeddings(spark, sf)

  private def asVec(df: org.apache.spark.sql.DataFrame) =
    df.select(col("vec_id"), col("label"),
      transform(col("embedding"), x => x.cast("double")).as("vec"))

  /** Fresh half-built index (even vec_ids) in a temp dir. */
  private def halfIndex(): Ann.IvfIndex = {
    val t = tmp("graft-ingest-idx-")
    Ann.buildFrom(spark, asVec(evAll.filter(col("vec_id") % 2 === 0)),
      Ann.Cells, t)
  }

  test("a replayed batch with a commit marker is skipped, not re-appended") {
    val idx = halfIndex()
    val batch = evAll.filter(col("vec_id") % 4 === 1)
    assert(Ann.appendToIndexIdempotent(spark, idx, batch, 7L))
    val after = Ann.physicalRows(spark, idx.dir).count()
    // replay of the SAME epoch: marker short-circuits
    assert(!Ann.appendToIndexIdempotent(spark, idx, batch, 7L))
    assert(Ann.physicalRows(spark, idx.dir).count() === after)
  }

  test("crash-window replay (rows committed, marker missing) skips and heals the marker") {
    val idx = halfIndex()
    val batch = evAll.filter(col("vec_id") % 4 === 1)
    // simulate: append job committed, then crash before the marker
    Ann.appendToIndex(spark, idx, batch)
    val after = Ann.physicalRows(spark, idx.dir).count()
    assert(!Ann.appendToIndexIdempotent(spark, idx, batch, 3L),
      "presence probe must recognize the committed batch")
    assert(Ann.physicalRows(spark, idx.dir).count() === after,
      "crash-window replay duplicated rows")
    assert(new java.io.File(idx.dir, "_ingest_commits/batch-3").exists(),
      "marker not healed")
    // NEXT replay takes the cheap marker path and still skips
    assert(!Ann.appendToIndexIdempotent(spark, idx, batch, 3L))
    assert(Ann.physicalRows(spark, idx.dir).count() === after)
  }

  test("probe blooms: sidecars ride the commits; replay dedup holds through the pre-filter; a missing sidecar falls back to exact") {
    val idx = halfIndex()
    // the generation bloom commits with the build
    assert(new java.io.File(idx.dir, "_bloom_gen").isFile,
      "build must commit the generation's probe bloom")
    val batch = evAll.filter(col("vec_id") % 4 === 1)
    assert(Ann.appendToIndexIdempotent(spark, idx, batch, 11L))
    val epochs = new java.io.File(idx.dir, "_delta").listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("e-"))
    assert(epochs.nonEmpty &&
      epochs.forall(e => new java.io.File(e, "_bloom").isFile),
      "every committed epoch must carry its probe bloom sidecar")
    val after = Ann.physicalRows(spark, idx.dir).count()
    // crash-window replay WITH blooms present: the replayed ids are
    // suspects by their own epoch's bloom, the exact backstop finds
    // them, nothing is re-appended
    new java.io.File(idx.dir, "_ingest_commits/batch-11").delete()
    assert(!Ann.appendToIndexIdempotent(spark, idx, batch, 11L),
      "bloom pre-filter broke crash-window replay recognition")
    assert(Ann.physicalRows(spark, idx.dir).count() === after)
    // a committed epoch WITHOUT a sidecar (crash between epoch commit
    // and bloom write) disables the pre-filter — the exact probe still
    // dedups; correctness never depends on the bloom
    epochs.foreach(e => new java.io.File(e, "_bloom").delete())
    new java.io.File(idx.dir, "_ingest_commits/batch-11").delete()
    assert(!Ann.appendToIndexIdempotent(spark, idx, batch, 11L),
      "exact fallback must still recognize the committed batch")
    assert(Ann.physicalRows(spark, idx.dir).count() === after)
    // fresh ids after the sidecar loss still append exactly once
    val fresh = evAll.filter(col("vec_id") % 4 === 3)
    assert(Ann.appendToIndexIdempotent(spark, idx, fresh, 12L))
    val got = Ann.physicalRows(spark, idx.dir)
    assert(got.select(col("vec_id")).distinct().count() === got.count())
  }

  test("a partially-present batch is REPAIRED: replay appends exactly the missing complement") {
    // a crash inside the append job's commit window (per-task renames,
    // not one atomic op) legitimately leaves some task files visible —
    // the replay must converge, not wedge the stream with a throw
    val idx = halfIndex()
    val batch = evAll.filter(col("vec_id") % 4 === 1)
    Ann.appendToIndex(spark, idx, batch.filter(col("vec_id") % 8 === 1))
    val before = Ann.physicalRows(spark, idx.dir).count()
    val missing = batch.filter(col("vec_id") % 8 =!= 1).count()
    assert(Ann.appendToIndexIdempotent(spark, idx, batch, 9L),
      "repair must report an append")
    val got = Ann.physicalRows(spark, idx.dir)
    assert(got.count() === before + missing,
      "repair must append exactly the missing complement")
    assert(got.select(col("vec_id")).distinct().count() === got.count(),
      "repair duplicated rows")
    assert(new java.io.File(idx.dir, "_ingest_commits/batch-9").exists())
    // the epoch is now committed: a further replay is a marker skip
    assert(!Ann.appendToIndexIdempotent(spark, idx, batch, 9L))
  }

  test("ingest markers are pruned to the newest MaxIngestMarkers") {
    val idx = halfIndex()
    val commits = new java.io.File(idx.dir, "_ingest_commits")
    commits.mkdirs()
    // stage MaxIngestMarkers+10 old epochs' markers, then commit one more
    (0 until Ann.MaxIngestMarkers + 10).foreach { i =>
      java.nio.file.Files.write(
        commits.toPath.resolve(s"batch-$i"), "rows=0\n".getBytes("UTF-8"))
    }
    val newEpoch = (Ann.MaxIngestMarkers + 10).toLong
    assert(!Ann.appendToIndexIdempotent(spark, idx, evAll.limit(0), newEpoch))
    // ignore the local-FS .crc sidecar the hadoop writer leaves beside
    // its marker — only batch-* files are the marker set
    val names = commits.listFiles().map(_.getName)
      .filter(_.startsWith("batch-")).toSet
    assert(names.size === Ann.MaxIngestMarkers,
      s"expected ${Ann.MaxIngestMarkers} retained markers, got ${names.size}")
    // newest survive (incl. the one just committed); oldest are gone
    assert(names.contains(s"batch-$newEpoch"))
    assert(!names.contains("batch-0") && !names.contains("batch-10"))
  }

  test("empty batch commits its marker without touching the index") {
    val idx = halfIndex()
    val before = Ann.physicalRows(spark, idx.dir).count()
    assert(!Ann.appendToIndexIdempotent(spark, idx, evAll.limit(0), 0L))
    assert(Ann.physicalRows(spark, idx.dir).count() === before)
    assert(new java.io.File(idx.dir, "_ingest_commits/batch-0").exists())
  }

  test("an epoch replayed against the COMPACTED generation is recognized and skipped") {
    // the generation-swap composition the scaladoc claims: markers
    // don't carry through compactIndex, but the presence probe
    // recognizes the carried rows and heals the marker in the new dir
    val idx = halfIndex()
    val batch = evAll.filter(col("vec_id") % 4 === 1)
    assert(Ann.appendToIndexIdempotent(spark, idx, batch, 5L))
    val dst = tmp("graft-ingest-compact-")
    val out = Ann.compactIndex(spark, idx, dst)
    assert(!new java.io.File(dst, "_ingest_commits/batch-5").exists(),
      "compaction must not carry ingest markers")
    val n = Ann.physicalRows(spark, dst).count()
    assert(!Ann.appendToIndexIdempotent(spark, out, batch, 5L),
      "replay against the new generation must recognize carried rows")
    assert(Ann.physicalRows(spark, dst).count() === n,
      "generation-swap replay duplicated rows")
    assert(new java.io.File(dst, "_ingest_commits/batch-5").exists(),
      "marker not healed in the new generation")
  }

  test("idempotent ingest keeps a committed codes generation in step, replay-safe") {
    val idx = halfIndex()
    val codesDir = graft.operators.Pq.buildPqCodesFor(spark, idx,
      graft.operators.Pq.trainBooks(
        graft.operators.Pq.normedOf(evAll.filter(col("vec_id") % 2 === 0)),
        "ingest-fixture"))
    val batch = evAll.filter(col("vec_id") % 4 === 1)
    assert(Ann.appendToIndexIdempotent(spark, idx, batch, 21L))
    val codeIds = graft.operators.Pq.codesAt(spark, idx.dir)
      .select(col("vec_id"))
    val idxIds = Ann.physicalRows(spark, idx.dir).select(col("vec_id"))
    assert(codeIds.exceptAll(idxIds).isEmpty &&
      idxIds.exceptAll(codeIds).isEmpty,
      "codes must cover exactly the index rows after the epoch commits")
    // marker replay: codes untouched
    val nCodes = graft.operators.Pq.codesAt(spark, idx.dir).count()
    assert(!Ann.appendToIndexIdempotent(spark, idx, batch, 21L))
    assert(graft.operators.Pq.codesAt(spark, idx.dir).count() === nCodes)
  }

  test("crash window with data landed but codes missing: the replay heals the codes") {
    val idx = halfIndex()
    graft.operators.Pq.buildPqCodesFor(spark, idx,
      graft.operators.Pq.trainBooks(
        graft.operators.Pq.normedOf(evAll.filter(col("vec_id") % 2 === 0)),
        "ingest-fixture"))
    val codesDir = s"${idx.dir}/_pq_codes"
    val batch = evAll.filter(col("vec_id") % 4 === 1)
    // simulate: data append committed but the codes append never ran
    // (crash between the two) — hide the codes marker for the append
    val marker = new java.io.File(codesDir, "_GRAFT_PQ_CODES_READY")
    assert(marker.delete())
    Ann.appendToIndex(spark, idx, batch)
    java.nio.file.Files.createFile(marker.toPath)
    // replay of the uncommitted epoch: probe skips the data, the codes
    // anti-join appends exactly the missing complement
    assert(!Ann.appendToIndexIdempotent(spark, idx, batch, 22L),
      "probe must recognize the committed data rows")
    val codeIds = graft.operators.Pq.codesAt(spark, idx.dir)
      .select(col("vec_id"))
    val idxIds = Ann.physicalRows(spark, idx.dir).select(col("vec_id"))
    assert(codeIds.exceptAll(idxIds).isEmpty &&
      idxIds.exceptAll(codeIds).isEmpty,
      "replay must heal the codes to cover exactly the index rows")
    assert(codeIds.count() === codeIds.distinct().count(),
      "codes healing duplicated rows")
  }

  test("stream ingest with mid-run stop + restart lands the odd half exactly once") {
    val idx = halfIndex()
    val srcDir = tmp("graft-ingest-src-")
    val ckpt = tmp("graft-ingest-ckpt-")
    val odd = evAll.filter(col("vec_id") % 2 === 1)
    // 6 files -> 6 micro-batches at maxFilesPerTrigger=1
    odd.repartition(6).write.mode("overwrite").parquet(srcDir)
    val schema = evAll.schema
    // leg 1: stop mid-stream after >= 2 batches (offsets WAL'd ahead of
    // commits is exactly the state a crash leaves)
    val q1 = EmbedIngest.ingestQuery(
      EmbedIngest.embeddingFileStream(spark, srcDir, schema), idx, ckpt,
      Trigger.ProcessingTime(0L))
    val deadline = System.nanoTime() + 60L * 1000 * 1000 * 1000
    while (q1.recentProgress.count(_.numInputRows > 0) < 2 &&
        System.nanoTime() < deadline) Thread.sleep(50)
    q1.stop()
    assert(q1.recentProgress.exists(_.numInputRows > 0),
      "leg 1 processed nothing — the restart would replay from scratch")
    // leg 2: same checkpoint, drain to the end
    val q2 = EmbedIngest.ingestQuery(
      EmbedIngest.embeddingFileStream(spark, srcDir, schema), idx, ckpt)
    q2.awaitTermination(120000)
    val got = Ann.physicalRows(spark, idx.dir)
    assert(got.count() === evAll.count(), "row conservation broke")
    assert(got.select(col("vec_id")).distinct().count() === evAll.count(),
      "duplicate vec_ids — exactly-once broke")
    // exact serving over the streamed index == the brute-force oracle
    val qv = evAll.filter(col("vec_id") === 0)
      .select(transform(col("embedding"), x => x.cast("double")))
      .first().getSeq[Double](0)
    val served = got
      .filter(col("cell").isin(idx.probeCells(qv, idx.cents.length): _*))
      .withColumn("sim", round(
        SimilarityOps.cosine(col("vec"), typedlit(qv)), 4))
      .select(col("vec_id"), col("label"), col("sim"))
      .orderBy(col("sim").desc, col("vec_id")).limit(20)
    val want = SparkEntry.queries("sim_cosine_topk")(spark, sf)
    assert(served.exceptAll(want).isEmpty && want.exceptAll(served).isEmpty)
  }
}
