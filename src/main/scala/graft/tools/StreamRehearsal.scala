package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.streaming.CdcStream

/** Streaming SCALE rehearsal — the stream-side twin of the batch decade
  * rehearsal: drives the two stateful streaming surfaces over a full
  * scale-directory events table as a FILE STREAM (`readStream.parquet`,
  * `maxFilesPerTrigger` modeling the sink's batching) and records
  * throughput and state size, with count-conservation asserted so a
  * fast-but-lossy run can never read as a pass.
  *
  *  1. `startPartitionedSink`: raw events → time-partition derivation →
  *     checkpointed `year/month/day/hour`-partitioned parquet sink
  *     (the reference's HDFS sink shape). Conservation: rows readable
  *     from the sink == rows in the source table.
  *  2. `latestState`: events keyed by user, flatMapGroupsWithState
  *     upsert, Update-mode emissions counted per micro-batch.
  *     Conservation: the state operator's final row count == distinct
  *     users in the source, and every user surfaced at least once in
  *     the emissions. State size is read from the progress telemetry
  *     (`stateOperators.numRowsTotal` / `memoryUsedBytes`) — the number
  *     that must stay ∝ key cardinality, not event count, for the
  *     100 TB story.
  *
  * Usage: `runMain graft.tools.StreamRehearsal [sfDir] [outJson]
  * [maxFilesPerTrigger]` — writes one JSON object and prints it.
  *
  * `SPARK_GRAFT_KILL=mid` (or an explicit batch count) turns the run
  * into a CRASH-RECOVERY rehearsal: every leg is stopped mid-decade
  * after that many completed triggers, restarted from its checkpoint,
  * and held to the SAME conservation/equality requires — exactly-once
  * under failure, not just under a clean run. The restarted incarnation
  * must additionally REPLAY at least one data-bearing batch, so a leg
  * that slipped past its kill point before the stop landed fails
  * loudly instead of recording recovery evidence that exercised
  * nothing. The final interval-join state is also read back per
  * partition through the state data source to bound key skew.
  *
  * [[StreamRehearsalForked]] promotes the kill from an in-JVM
  * `query.stop()` to a SIGKILL of a forked JVM. The machinery that
  * makes one rehearsal survive a dead process:
  *
  *   - `SPARK_GRAFT_WORKDIR`: all paths (staged source, sinks,
  *     checkpoints, per-batch evidence) become DETERMINISTIC subdirs of
  *     this dir, so a re-launched JVM resumes the same checkpoints. The
  *     staged time-ranged split is built once and marker-gated.
  *   - per-batch evidence (emissions, window updates, join checksums)
  *     is persisted batchId-keyed under the workdir (atomic rename per
  *     batch) instead of living only in driver maps a SIGKILL would
  *     vaporize; a replayed batch OVERWRITES its own file — the same
  *     idempotence the in-memory maps had.
  *   - `SPARK_GRAFT_KILL_LEG=<leg>`: that leg, on reaching the
  *     threshold, records the batch count and prints
  *     `READY_TO_KILL leg=<leg>` — the parent SIGKILLs the JVM at that
  *     marker while the query is still running.
  *   - a leg whose conservation asserts have passed writes a done
  *     marker with its JSON fragment; later incarnations SKIP it
  *     (its queries are never restarted) and splice the persisted
  *     fragment into the final ledger.
  */
object StreamRehearsal {
  final case class EvK(user_id: Long, event_id: Long, tsu: Long)

  /** Per-batch evidence, batchId-keyed. In-memory always; mirrored to
    * `dir` (write temp + atomic rename) when a workdir is set so a
    * SIGKILLed incarnation's committed batches survive into the next
    * JVM. A replayed batch overwrites its own file — idempotent under
    * at-least-once foreachBatch, exactly like the batchId-keyed maps
    * this generalizes.
    */
  private final class BatchLedger(dirOpt: Option[java.nio.file.Path]) {
    import java.nio.file.{Files, StandardCopyOption}
    private val mem =
      new java.util.concurrent.ConcurrentHashMap[Long, Array[Byte]]()
    dirOpt.foreach(d => Files.createDirectories(d))
    def put(bid: Long, bytes: Array[Byte]): Unit = {
      mem.put(bid, bytes)
      dirOpt.foreach { d =>
        val tmp = d.resolve(s"b$bid.tmp")
        Files.write(tmp, bytes)
        Files.move(tmp, d.resolve(s"b$bid.bin"),
          StandardCopyOption.REPLACE_EXISTING,
          StandardCopyOption.ATOMIC_MOVE)
        ()
      }
    }
    /** All evidence, ascending batchId: prior incarnations' persisted
      * batches merged under this run's in-memory ones (identical where
      * both exist — replay overwrote the same key). A SIGKILL can leave
      * a `.tmp` — never read, always superseded by the replay.
      */
    def entries: Seq[(Long, Array[Byte])] = {
      val all = scala.collection.mutable.Map.empty[Long, Array[Byte]]
      dirOpt.foreach { d =>
        Files.list(d).iterator().forEachRemaining { p =>
          val n = p.getFileName.toString
          if (n.startsWith("b") && n.endsWith(".bin"))
            all(n.stripPrefix("b").stripSuffix(".bin").toLong) =
              Files.readAllBytes(p)
        }
      }
      mem.forEach((k, v) => all(k) = v)
      all.toSeq.sortBy(_._1)
    }
  }

  private def encode(f: java.io.DataOutputStream => Unit): Array[Byte] = {
    val bo = new java.io.ByteArrayOutputStream()
    val o = new java.io.DataOutputStream(bo)
    f(o); o.flush(); bo.toByteArray
  }
  private def decode[T](b: Array[Byte])(f: java.io.DataInputStream => T): T =
    f(new java.io.DataInputStream(new java.io.ByteArrayInputStream(b)))

  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/tmp/sf1"
    val outFile =
      if (args.length > 1) args(1) else "bench/rehearsal_stream.json"
    val maxFiles = if (args.length > 2) args(2).toInt else 4
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    // SPARK_GRAFT_STATE=rocksdb swaps the state store provider — the
    // 100 TB deployment answer for the stateful surfaces: the default
    // HDFSBackedStateStore keeps every state row on the executor HEAP
    // (the interval join buffers watermark+horizon × arrival rate), the
    // RocksDB provider spills state to local disk with a bounded block
    // cache, so state capacity is disk-, not heap-, limited. Same
    // queries, same results — the rehearsal asserts the equalities
    // under whichever provider is selected.
    val stateStore = sys.env.getOrElse("SPARK_GRAFT_STATE", "hdfs")
    val builder = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
    if (stateStore == "rocksdb")
      builder.config("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state." +
          "RocksDBStateStoreProvider")
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    // forked-crash mode plumbing (see class doc): deterministic dirs +
    // persisted per-batch evidence + done markers under the workdir
    val workdir: Option[String] = sys.env.get("SPARK_GRAFT_WORKDIR")
    val killLeg: Option[String] = sys.env.get("SPARK_GRAFT_KILL_LEG")
    workdir.foreach(wd =>
      java.nio.file.Files.createDirectories(java.nio.file.Paths.get(wd)))
    def ledger(leg: String): BatchLedger = new BatchLedger(
      workdir.map(wd => java.nio.file.Paths.get(wd, "acc", leg)))
    def killedAtFile(leg: String): Option[java.nio.file.Path] =
      workdir.map(wd => java.nio.file.Paths.get(wd, "killed", leg))
    def recordKilledAt(leg: String, batch: Long): Unit =
      killedAtFile(leg).foreach { p =>
        java.nio.file.Files.createDirectories(p.getParent)
        java.nio.file.Files.write(p, batch.toString.getBytes("UTF-8"))
        ()
      }
    def readKilledAt(leg: String): Option[Long] =
      killedAtFile(leg).filter(java.nio.file.Files.exists(_))
        .map(p => new String(java.nio.file.Files.readAllBytes(p),
          "UTF-8").trim.toLong)

    val evPath = s"$sfDir/events.parquet"
    // batch ground truth for the conservation asserts
    val batch = graft.sources.Tables.events(spark, sfDir)
    val nSource = batch.count()
    val nKeys = batch.select(col("user_id")).distinct().count()
    val rawSchema = spark.read.parquet(evPath).schema
    // the rehearsal's POINT is multi-trigger behavior (state carried
    // across micro-batches, per-batch sink commits) — a source laid out
    // as one big file would collapse to a single trigger and measure
    // nothing. ALWAYS stage a TIME-RANGED re-split (repartitionByRange
    // on ts → each file ≈ one arrival slice, the CDC wire shape), never
    // stream a table in place: the watermarked surfaces (windowed
    // stats, interval join) require arrival order ≈ event-time order,
    // and an arbitrary Spark-written lake guarantees neither
    // within-file time locality nor any particular FileStreamSource
    // arrival order (it sorts by mtime, and one write job stamps every
    // part file in the same instant) — rows arriving behind the
    // watermark would be dropped as late and fail the conservation
    // requires spuriously.
    val minFiles = 8 * maxFiles
    def stageSplit(d: String): Unit = {
      println(s"[stream] staging $minFiles-file time-ranged split")
      spark.read.parquet(evPath)
        .repartitionByRange(minFiles, col("ts"))
        .write.mode("overwrite").parquet(d)
      // part-file NAMES are range order (partition 0 = lowest ts
      // range) — re-stamp mtimes increasing in name order so arrival
      // order IS event-time order
      val staged = new java.io.File(d).listFiles()
        .filter(_.getName.endsWith(".parquet")).sortBy(_.getName)
      val base = (System.currentTimeMillis() / 1000 - staged.length) * 1000
      staged.zipWithIndex.foreach { case (f, i) =>
        require(f.setLastModified(base + i * 1000L),
          s"cannot re-stamp mtime of $f")
      }
    }
    // every temp dir (staged re-split, sink, checkpoints) is registered
    // for end-of-run deletion — at sf10 each run would otherwise leave
    // TWO full copies of the events table in /tmp, accumulating across
    // rehearsal runs until the box runs out of disk. Workdir mode opts
    // OUT of self-cleanup: the orchestrating parent owns the dir (it
    // must survive SIGKILL+relaunch cycles).
    val tmpDirs = scala.collection.mutable.Buffer.empty[String]
    def tmp(prefix: String): String = workdir match {
      case Some(wd) =>
        val d = java.nio.file.Paths.get(wd,
          prefix.stripPrefix("graft-rehearsal-").stripSuffix("-"))
        java.nio.file.Files.createDirectories(d)
        d.toString
      case None =>
        val d = java.nio.file.Files.createTempDirectory(prefix).toString
        tmpDirs += d
        d
    }
    val (streamPath, nFiles) = workdir match {
      case Some(wd) =>
        // staged once per workdir, marker-gated AFTER the mtime
        // re-stamp: a killed mid-staging run restages from scratch
        val d = java.nio.file.Paths.get(wd, "staged")
        val marker = d.resolve("_STAGED_OK")
        if (!java.nio.file.Files.exists(marker)) {
          stageSplit(d.toString)
          java.nio.file.Files.write(marker, Array.empty[Byte])
        } else println(s"[stream] reusing staged split at $d")
        (d.toString, minFiles)
      case None =>
        val d = java.nio.file.Files
          .createTempDirectory("graft-rehearsal-src-").toString
        tmpDirs += d
        stageSplit(d)
        (d, minFiles)
    }
    println(s"[stream] source rows=$nSource users=$nKeys files=$nFiles " +
      s"maxFilesPerTrigger=$maxFiles")

    def fileStream(): DataFrame = graft.sources.Tables.convertEventTs(
      spark.readStream.schema(rawSchema)
        .option("maxFilesPerTrigger", maxFiles).parquet(streamPath))

    /** Data-bearing trigger count. NOT recentProgress.count(...): the
      * progress ring buffer retains only the last ~100 updates, so a
      * >100-trigger run would undercount the very multi-trigger evidence
      * this tool exists to record. batchIds are contiguous from 0 and,
      * under AvailableNow over a file source, only the FINAL batch can
      * be empty — so lastProgress (exact, not capped) gives the count.
      */
    def dataBatches(q: org.apache.spark.sql.streaming.StreamingQuery): Long = {
      val lp = q.lastProgress
      if (lp == null) 0L
      else lp.batchId + 1 - (if (lp.numInputRows == 0) 1 else 0)
    }
    /** Did THIS query incarnation process at least one data-bearing
      * batch? recentProgress holds only this incarnation's updates, so
      * this is the replay witness [[dataBatches]] (global batchIds)
      * cannot be: a restart that replayed nothing has no data-bearing
      * progress even though the checkpoint's batchId is large.
      */
    def replayedData(
        q: org.apache.spark.sql.streaming.StreamingQuery): Boolean =
      q.recentProgress.exists(_.numInputRows > 0)

    // SPARK_GRAFT_KILL: crash-recovery mode — stop each leg after this
    // many completed data batches ("mid" = half the planned triggers),
    // then restart the SAME query from the SAME checkpoint and let it
    // run to completion. Every conservation/equality require below then
    // asserts EXACTLY-ONCE UNDER FAILURE: the file sink must not
    // double-commit the interrupted batch (the _spark_metadata log is
    // what a reader trusts), the stateful legs must restore state to
    // the last committed version and replay the in-flight batch without
    // double-applying side effects. stop() interrupts the stream
    // execution thread mid-batch — the batch's offsets are already in
    // the WAL but its commit is not, which is the same recovery path a
    // process kill exercises; [[StreamRehearsalForked]] closes the
    // remaining daylight by making the kill a real SIGKILL of a forked
    // JVM (shutdown hooks skipped, temp/state files left behind).
    val killAt: Option[Long] = sys.env.get("SPARK_GRAFT_KILL").map {
      case "mid" => math.max(1L, minFiles.toLong / maxFiles / 2)
      case n     => n.toLong
    }
    val killThreshold: Long =
      killAt.getOrElse(math.max(1L, minFiles.toLong / maxFiles / 2))

    /** Run a leg to completion, optionally killing + resuming it.
      * Returns (all queries started in order, killed-at batch or -1,
      * wall secs). Three shapes:
      *   - armed for the FORKED kill (`SPARK_GRAFT_KILL_LEG` == name):
      *     reach the threshold, persist the batch count, print the
      *     marker, and keep running until the parent's SIGKILL lands —
      *     completing first fails loudly.
      *   - in-JVM kill mode (`SPARK_GRAFT_KILL` set, no KILL_LEG):
      *     stop() at the threshold, restart, run to completion.
      *   - clean (or post-SIGKILL resume): start and await; if a killed
      *     marker exists for this leg, this IS the resume — the
      *     incarnation must replay ≥1 data batch.
      * Both kill shapes assert the restarted incarnation replayed real
      * work: a leg that completed before the kill landed must fail the
      * run, not silently record recovery that exercised nothing.
      */
    def runLeg(name: String)(
        start: () => org.apache.spark.sql.streaming.StreamingQuery)
        : (Seq[org.apache.spark.sql.streaming.StreamingQuery], Long, Double) = {
      val t0 = System.nanoTime()
      if (killLeg.contains(name)) {
        val q = start()
        var reached = -1L
        while (q.isActive && reached < 0) {
          Thread.sleep(50)
          if (q.isActive && dataBatches(q) >= killThreshold)
            reached = dataBatches(q)
        }
        require(reached >= 0,
          s"$name completed before the kill threshold $killThreshold — " +
            "recovery was never exercised; lower SPARK_GRAFT_KILL")
        recordKilledAt(name, reached)
        println(s"[stream] READY_TO_KILL leg=$name batch=$reached")
        Console.out.flush()
        // the query keeps running — the parent's SIGKILL must land
        // while work is in flight; finishing first means the evidence
        // would be fake, so fail the run instead
        q.awaitTermination()
        sys.error(s"$name ran to completion before the SIGKILL landed — " +
          "recovery was never exercised")
      } else killAt match {
        case Some(k) if killLeg.isEmpty && workdir.isEmpty =>
          val q = start()
          var killed = -1L
          while (q.isActive && killed < 0) {
            Thread.sleep(50)
            if (q.isActive && dataBatches(q) >= k) {
              killed = dataBatches(q)
              println(s"[stream] $name: KILLING after batch $killed")
              q.stop()
            }
          }
          require(killed >= 0,
            s"$name completed before the kill threshold $k — recovery " +
              "was never exercised; lower SPARK_GRAFT_KILL")
          while (q.isActive) Thread.sleep(10)
          val q2 = start()
          q2.awaitTermination()
          require(replayedData(q2),
            s"$name: restarted query replayed no data — the stop() " +
              "landed after completion, so recovery was never exercised")
          (Seq(q, q2), killed, (System.nanoTime() - t0) / 1e9)
        case _ =>
          val q = start(); q.awaitTermination()
          val killedBefore = readKilledAt(name)
          killedBefore.foreach { _ =>
            require(replayedData(q),
              s"$name: post-SIGKILL restart replayed no data — the kill " +
                "landed after completion, recovery was never exercised")
          }
          (Seq(q), killedBefore.getOrElse(-1L),
            (System.nanoTime() - t0) / 1e9)
      }
    }

    // per-leg JSON fragments, spliced into the final ledger. A leg
    // whose asserts passed in a PRIOR incarnation is skipped (done
    // marker carries its fragment) — its checkpoints stay untouched.
    val fragments =
      scala.collection.mutable.LinkedHashMap.empty[String, String]
    val killedAts =
      scala.collection.mutable.LinkedHashMap.empty[String, Long]
    def legSection(name: String)(body: => (String, Long)): Unit = {
      val doneFile = workdir.map(wd =>
        java.nio.file.Paths.get(wd, "done", s"$name.json"))
      doneFile.filter(java.nio.file.Files.exists(_)) match {
        case Some(f) =>
          println(s"[stream] $name: completed in a prior incarnation — " +
            "splicing persisted result")
          fragments(name) =
            new String(java.nio.file.Files.readAllBytes(f), "UTF-8")
          killedAts(name) = readKilledAt(name).getOrElse(-1L)
        case None =>
          val (frag, killed) = body
          doneFile.foreach { f =>
            java.nio.file.Files.createDirectories(f.getParent)
            java.nio.file.Files.write(f, frag.getBytes("UTF-8"))
          }
          fragments(name) = frag
          killedAts(name) = killed
      }
    }

    // ---- surface 1: checkpointed time-partitioned sink -----------------
    legSection("partitioned_sink") {
      val sinkDir = tmp("graft-rehearsal-sink-")
      val (qs1, kill1, wall1) = runLeg("partitioned_sink")(() =>
        CdcStream.startPartitionedSink(
          graft.operators.Cdc.withTimePartitions(fileStream(), col("ts")),
          s"$sinkDir/data", s"$sinkDir/ckpt",
          trigger = Trigger.AvailableNow()))
      val batches1 = dataBatches(qs1.last)
      // the reader trusts the sink's _spark_metadata commit log, so files
      // from the killed batch (written but never committed) are invisible
      // — count AND distinct-count prove no loss and no double-commit
      val sinkRead = spark.read.parquet(s"$sinkDir/data")
      val nSink = sinkRead.count()
      require(nSink == nSource,
        s"partitioned sink lost rows: wrote $nSink of $nSource")
      if (kill1 >= 0) {
        val nDistinct = sinkRead.select(col("event_id")).distinct().count()
        require(nDistinct == nSource,
          s"partitioned sink duplicated rows after recovery: " +
            s"$nDistinct distinct of $nSink")
      }
      println(f"[stream] partitioned_sink: $nSource rows in $wall1%.1f s " +
        f"(${nSource / wall1}%.0f rows/s, $batches1 batches" +
        (if (kill1 >= 0) s", killed after $kill1 + resumed" else "") +
        ") — conserved")
      (s""""partitioned_sink":{"wall_sec":$wall1,
          |"rows_per_sec":${nSource / wall1},"batches":$batches1,
          |"sink_rows":$nSink,"conserved":true}"""
        .stripMargin.replace("\n", ""), kill1)
    }

    // ---- surface 2: latestState upsert ---------------------------------
    // emissions are counted (and keys collected) per micro-batch in
    // foreachBatch — never materialized as a table; ord = event-time
    // micros (the WAL-LSN stand-in; ties keep the incumbent, which is
    // latestState's documented idempotence contract). Evidence is
    // keyed by batchId in a BatchLedger, NOT a running sum: foreachBatch
    // is at-least-once under recovery (the killed batch's side effects
    // may have partially run before the stop, then the whole batch
    // replays) — a put keyed on the replayed batchId overwrites instead
    // of double-counting, and the key SET is idempotent by construction.
    legSection("latest_state") {
      val led2 = ledger("latest_state")
      val upsertCkpt = tmp("graft-rehearsal-upsert-ckpt-")
      val (qs2, kill2, wall2) = runLeg("latest_state")(() => {
        val ds = fileStream()
          .select(col("user_id"), col("event_id"),
            unix_micros(col("ts")).as("tsu")).as[EvK]
        CdcStream.latestState[Long, EvK](ds, _.user_id, _.tsu)
          .toDF("user_id", "ev").writeStream
          .foreachBatch { (b: DataFrame, bid: Long) =>
            val keys = b.select(col("user_id")).as[Long](Encoders).collect()
            led2.put(bid, encode { o =>
              o.writeInt(keys.length); keys.foreach(o.writeLong)
            })
            ()
          }
          .option("checkpointLocation", upsertCkpt)
          .outputMode("update")
          .trigger(Trigger.AvailableNow()).start()
      })
      var emitted = 0L
      val seenKeys = scala.collection.mutable.Set.empty[Long]
      led2.entries.foreach { case (_, bytes) =>
        decode(bytes) { in =>
          val n = in.readInt()
          emitted += n
          (0 until n).foreach(_ => seenKeys += in.readLong())
        }
      }
      val q2 = qs2.last
      val progress = q2.recentProgress.toSeq
      val stateRows = progress.flatMap(_.stateOperators.toSeq)
        .lastOption.map(_.numRowsTotal).getOrElse(-1L)
      val stateBytes = progress.flatMap(_.stateOperators.toSeq)
        .map(_.memoryUsedBytes).maxOption.getOrElse(-1L)
      val batches2 = dataBatches(q2)
      require(stateRows == nKeys,
        s"latestState state rows $stateRows != distinct users $nKeys")
      require(seenKeys.size.toLong == nKeys,
        s"latestState emitted ${seenKeys.size} keys of $nKeys")
      println(f"[stream] latest_state: $nSource rows in $wall2%.1f s " +
        f"(${nSource / wall2}%.0f rows/s, $batches2 batches, " +
        f"state=$stateRows rows/${stateBytes / 1024 / 1024} MiB" +
        (if (kill2 >= 0) s", killed after $kill2 + resumed" else "") +
        ") — conserved")
      (s""""latest_state":{"wall_sec":$wall2,
          |"rows_per_sec":${nSource / wall2},"batches":$batches2,
          |"emitted_updates":$emitted,
          |"state_rows":$stateRows,"state_bytes":$stateBytes,
          |"conserved":true}"""
        .stripMargin.replace("\n", ""), kill2)
    }

    // ---- surface 3: watermarked tumbling-window stats ------------------
    // Update mode + last-write-per-window merge: every window's FINAL
    // update equals the batch aggregate (complete mode would also equal
    // it, but rewrites the whole result per trigger — not the scale
    // shape), while the watermark evicts closed windows so state tracks
    // the horizon, not the stream. The staged time-ranged split makes
    // arrival monotone in event time, so nothing is ever late against
    // the 10-minute watermark and the merge is EXACT on the counts; the
    // double-typed sums are compared within 1e-9 relative (stream and
    // batch combine partials in different orders). The merge applies
    // ledger entries in ascending batchId — last write per window —
    // and is idempotent under batch replay: the restored state +
    // replayed slice recompute the same per-window cumulative values.
    legSection("windowed_stats") {
      val led3 = ledger("windowed_stats")
      val winCkpt = tmp("graft-rehearsal-win-ckpt-")
      val (qs3, kill3, wall3) = runLeg("windowed_stats")(() =>
        CdcStream.windowedStats(fileStream(), "ts", "event_type", "value")
          .writeStream
          .foreachBatch { (b: DataFrame, bid: Long) =>
            // bounded collect: rows here are only the windows UPDATED
            // this trigger ≈ (trigger's time slice / 1 h + 1) ×
            // |event_type|
            val rows = b.collect()
            led3.put(bid, encode { o =>
              o.writeInt(rows.length)
              rows.foreach { r =>
                o.writeLong(r.getTimestamp(0).getTime)
                o.writeUTF(r.getString(1))
                o.writeLong(r.getLong(2))
                o.writeDouble(r.getDouble(3))
              }
            })
            ()
          }
          .option("checkpointLocation", winCkpt)
          .outputMode("update")
          .trigger(Trigger.AvailableNow()).start())
      val winGot = scala.collection.mutable.Map.empty[
        (java.sql.Timestamp, String), (Long, Double)]
      led3.entries.foreach { case (_, bytes) =>
        decode(bytes) { in =>
          val n = in.readInt()
          (0 until n).foreach { _ =>
            val ts = new java.sql.Timestamp(in.readLong())
            val et = in.readUTF()
            winGot((ts, et)) = (in.readLong(), in.readDouble())
          }
        }
      }
      val q3 = qs3.last
      val batches3 = dataBatches(q3)
      // peak state across the incarnations THIS JVM ran — the pre-kill
      // peak is part of the evidence that watermark eviction bounds
      // state (in forked mode the dead JVM's peak died with it; the
      // resumed incarnation's peak still bounds the restored horizon)
      val winStateRows = qs3.flatMap(_.recentProgress.toSeq)
        .flatMap(_.stateOperators.toSeq).map(_.numRowsTotal)
        .maxOption.getOrElse(-1L)
      val wantWin = batch
        .groupBy(window(col("ts"), "1 hour"), col("event_type"))
        .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_value"))
        .select(col("window.start"), col("event_type"), col("n"),
          col("sum_value")).collect()
        .map(r => (r.getTimestamp(0), r.getString(1)) ->
          ((r.getLong(2), r.getDouble(3)))).toMap
      require(winGot.size == wantWin.size,
        s"windowed_stats: ${winGot.size} windows != batch ${wantWin.size}")
      var winRowSum = 0L
      wantWin.foreach { case (k, (n, s)) =>
        val got = winGot.get(k)
        require(got.exists(g => g._1 == n &&
            math.abs(g._2 - s) <= 1e-9 * math.max(1.0, math.abs(s))),
          s"windowed_stats mismatch at $k: stream=$got batch=($n,$s)")
        winRowSum += n
      }
      require(winRowSum == nSource,
        s"windowed_stats counted $winRowSum of $nSource rows")
      println(f"[stream] windowed_stats: $nSource rows in $wall3%.1f s " +
        f"(${nSource / wall3}%.0f rows/s, $batches3 batches, " +
        f"${wantWin.size} windows, peak state=$winStateRows rows" +
        (if (kill3 >= 0) s", killed after $kill3 + resumed" else "") +
        ") — equal to batch")
      (s""""windowed_stats":{"wall_sec":$wall3,
          |"rows_per_sec":${nSource / wall3},"batches":$batches3,
          |"windows":${wantWin.size},"peak_state_rows":$winStateRows,
          |"equal_to_batch":true}"""
        .stripMargin.replace("\n", ""), kill3)
    }

    // ---- surface 4: stream-stream interval join ------------------------
    // errors ⋈ clicks within [ts, ts+5 min] per user — both sides are
    // independent file streams over the same staged split. Equality vs
    // the batch join is by (count, XOR-of-XXH64 checksum): collecting
    // 2× the events table through a memory sink is exactly what a
    // rehearsal must not do, and XOR is order-independent AND
    // overflow-free (a sum of 63-bit hashes trips ANSI overflow).
    // Per-batchId ledger, NOT running accumulators: an XOR checksum
    // double-applied by a replayed batch would CANCEL itself and fake a
    // mismatch (or worse, mask one) — keying on batchId makes replay an
    // overwrite.
    legSection("interval_join") {
      def joinHash(b: DataFrame) = b.agg(
        count(lit(1)).as("n"),
        coalesce(bit_xor(xxhash64(col("user_id"), col("error_id"),
          col("click_id"))), lit(0L)).as("h"))
      val led4 = ledger("interval_join")
      val ssjoinCkpt = tmp("graft-rehearsal-ssjoin-ckpt-")
      val (qs4, kill4, wall4) = runLeg("interval_join")(() => {
        val errsS = fileStream().filter(col("event_type") === "error")
          .select(col("user_id"), col("ts"), col("event_id").as("error_id"))
        val clicksS = fileStream().filter(col("event_type") === "click")
          .select(col("user_id"), col("ts").as("c_ts"),
            col("event_id").as("click_id"))
        CdcStream
          .intervalJoin(errsS, clicksS, "user_id", "ts", "c_ts", "5 minutes")
          .select(col("l.user_id"), col("error_id"), col("click_id"))
          .writeStream
          .foreachBatch { (b: DataFrame, bid: Long) =>
            val r = joinHash(b).collect()(0)
            led4.put(bid, encode { o =>
              o.writeLong(r.getLong(0)); o.writeLong(r.getLong(1))
            })
            ()
          }
          .option("checkpointLocation", ssjoinCkpt)
          .outputMode("append")
          .trigger(Trigger.AvailableNow()).start()
      })
      val q4 = qs4.last
      var jn = 0L
      var jh = 0L
      led4.entries.foreach { case (_, bytes) =>
        decode(bytes) { in => jn += in.readLong(); jh ^= in.readLong() }
      }
      val batches4 = dataBatches(q4)
      val joinProgress = qs4.flatMap(_.recentProgress.toSeq)
        .flatMap(_.stateOperators.toSeq)
      val joinStateRows =
        joinProgress.map(_.numRowsTotal).maxOption.getOrElse(-1L)
      val joinStateBytes =
        joinProgress.map(_.memoryUsedBytes).maxOption.getOrElse(-1L)
      val be = batch.filter(col("event_type") === "error")
        .select(col("user_id"), col("ts"), col("event_id").as("error_id"))
      val bc = batch.filter(col("event_type") === "click")
        .select(col("user_id").as("c_uid"), col("ts").as("c_ts"),
          col("event_id").as("click_id"))
      val wantJoin = joinHash(be.join(bc,
          col("user_id") === col("c_uid") && col("c_ts") >= col("ts") &&
            col("c_ts") <= col("ts") + expr("INTERVAL 5 minutes")))
        .collect()(0)
      require(jn == wantJoin.getLong(0),
        s"interval_join: $jn rows != batch ${wantJoin.getLong(0)}")
      require(jh == wantJoin.getLong(1),
        s"interval_join checksum mismatch ($jn rows)")
      println(f"[stream] interval_join: $jn matches from $nSource×2 " +
        f"events in $wall4%.1f s (${2 * nSource / wall4}%.0f rows/s, " +
        f"$batches4 batches, peak state=$joinStateRows rows/" +
        f"${joinStateBytes / 1024 / 1024} MiB" +
        (if (kill4 >= 0) s", killed after $kill4 + resumed" else "") +
        ") — equal to batch")

      // Join-state SKEW: the progress telemetry reports only totals, but
      // the 100 TB question is whether one hot user's buffered rows pin a
      // single state partition. Read the checkpointed state back through
      // the state data source (SPARK-45511 — the same files a restarted
      // query would load) and aggregate rows per shuffle partition for
      // each buffer (left=errors, right=clicks) — at the PEAK-state
      // batch, not the final one: by end of an AvailableNow run the
      // watermark has evicted nearly everything, and an empty buffer
      // cannot show a hotspot. (Versions are retained well past the peak:
      // minBatchesToRetain defaults to 100, and these runs are ≤ ~100
      // triggers.)
      val peakBatch = qs4.flatMap(_.recentProgress.toSeq)
        .filter(_.stateOperators.nonEmpty)
        .maxByOption(_.stateOperators.map(_.numRowsTotal).sum)
        .map(_.batchId)
      val joinSkew = (for (side <- Seq("left", "right")) yield {
        val rd = spark.read.format("statestore").option("joinSide", side)
        val per = peakBatch.fold(rd)(b => rd.option("batchId", b))
          .load(ssjoinCkpt)
          .groupBy(col("partition_id")).agg(count(lit(1)).as("n"))
          .select(col("n")).collect().map(_.getLong(0))
        val (mx, sm) = (per.maxOption.getOrElse(0L), per.sum)
        val mean = if (per.isEmpty) 0.0 else sm.toDouble / per.length
        println(f"[stream] interval_join $side%s buffer @peak batch " +
          f"${peakBatch.getOrElse(-1L)}: $sm rows over " +
          f"${per.length} partitions, max=$mx mean=$mean%.0f " +
          f"(max/mean ${if (mean == 0) 0.0 else mx / mean}%.2f)")
        s""""$side":{"peak_batch":${peakBatch.getOrElse(-1L)},
           |"rows":$sm,"partitions":${per.length},
           |"max_partition_rows":$mx,"mean_partition_rows":$mean}"""
          .stripMargin.replace("\n", "")
      }).mkString(",")
      (s""""interval_join":{"wall_sec":$wall4,
          |"rows_per_sec":${2 * nSource / wall4},"batches":$batches4,
          |"join_rows":$jn,"peak_state_rows":$joinStateRows,
          |"peak_state_bytes":$joinStateBytes,
          |"state_skew":{$joinSkew},
          |"equal_to_batch":true}"""
        .stripMargin.replace("\n", ""), kill4)
    }

    val anyKilled = killedAts.values.exists(_ >= 0)
    val killJson =
      if (!anyKilled) ""
      else {
        val mode =
          if (workdir.isDefined) "fork_sigkill" else "in_jvm_stop"
        val per = killedAts.map { case (leg, k) => s""""$leg":$k""" }
          .mkString(",")
        s""","kill_mode":{"threshold_batches":$killThreshold,
           |"kill":"$mode","killed_at":{$per},"recovered":true}"""
          .stripMargin.replace("\n", "")
      }
    val json =
      s"""{"sf":"$sfDir","state_store":"$stateStore",
         |"source_rows":$nSource,"distinct_users":$nKeys,
         |"source_files":$nFiles,"max_files_per_trigger":$maxFiles,
         |${fragments.values.mkString(",\n")}$killJson}"""
        .stripMargin.replace("\n", "")
    val out = java.nio.file.Paths.get(outFile)
    if (out.getParent != null) java.nio.file.Files.createDirectories(out.getParent)
    java.nio.file.Files.write(out,
      json.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    println(s"[stream] wrote $outFile")
    println(json)
    // all asserts have read what they need from the sink/state — release
    // the staged copies (best-effort: a failed run above leaves its dirs
    // for post-mortem, which is the useful behavior there). Workdir mode
    // leaves everything — the orchestrating parent owns cleanup.
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(rm))
      f.delete(); ()
    }
    tmpDirs.foreach(d => rm(new java.io.File(d)))
    spark.stop()
  }

  // foreachBatch's typed collect needs an explicit Long encoder handle
  private val Encoders = org.apache.spark.sql.Encoders.scalaLong
}
