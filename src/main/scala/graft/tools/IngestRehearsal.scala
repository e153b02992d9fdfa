package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.operators.Ann
import graft.streaming.EmbedIngest

/** Crash-recovery rehearsal for the STREAMING index-ingest path
  * ([[EmbedIngest]] over [[Ann.appendToIndexIdempotent]]), with a real
  * SIGKILL of a forked JVM — the same evidence standard as
  * [[StreamRehearsalForked]], applied to the index-maintenance stream:
  *
  *   1. parent stages the deployment shape once: IVF index BUILT on the
  *      even-vec_id half of the corpus, the odd half written as N
  *      parquet files (one per micro-batch at maxFilesPerTrigger=1);
  *   2. a forked child runs the ingest query, prints `READY_TO_KILL`
  *      after `ceil(N/2)` committed data batches, and keeps running —
  *      the parent SIGKILLs it mid-flight (a batch's offsets WAL'd,
  *      its commit missing, possibly an append job's `_temporary` dirs
  *      left in the index — nothing a shutdown hook could tidy);
  *   3. a second forked child resumes from the SAME checkpoint and
  *      drains to completion (and must replay ≥1 data batch, so a kill
  *      that landed after completion fails the run instead of faking
  *      recovery);
  *   4. the parent asserts the exactly-once contract on the final
  *      index: row conservation (== corpus count), DISTINCT vec_ids
  *      (conservation alone cannot distinguish exactly-once from
  *      loss+duplication canceling), one commit marker per COMMITTED
  *      EPOCH (epochs, not staged files, are the exactly-once unit —
  *      a kill landing before the in-flight epoch's offsets hit the
  *      WAL makes the resume re-plan that epoch and it may coalesce
  *      several files), and full-probe serving == the brute-force
  *      exact top-20 over the whole corpus — the append gate's
  *      standard, now held across a process death.
  *
  * Usage (parent):
  *   tools/javamain.sh graft.tools.IngestRehearsal \
  *     bench/ingest_rehearsal_r10.json /tmp/clustered2m [nBatches] [mode]
  * The child role is internal (GRAFT_INGEST_ROLE=child).
  *
  * mode `compact-swap` (default `plain`) rehearses MAINTENANCE DURING
  * INGEST — the generation contract under a crash: the armed child is
  * SIGKILLed mid-flight as above, then (stream down, exactly when a
  * maintenance window opens) the parent COMPACTS the half-ingested index
  * into a new generation — which drops the ingest markers and merges the
  * per-append files — re-points ingest at the new generation, and the
  * resumed stream's first replayed epoch lands AGAINST THE SWAPPED DIR:
  * its marker is gone but compaction carried its rows, so the presence
  * probe must recognize them and heal the marker in the new generation
  * (the AnnIngestSpec unit contract, held at decade scale across a real
  * process death). A SECOND SIGKILL lands mid-drain against the new
  * generation, proving exactly-once continues within it. Asserts add:
  * new-generation markers == epochs committed after the swap, zero
  * carried markers, and the same conservation/DISTINCT/serving-equality
  * standard on the final swapped index.
  *
  * mode `churn` rehearses the FULL index lifecycle with codes in step
  * at every stage — delete → compact → re-ingest, the
  * takedown/retention reality of a 100 TB corpus: after the SIGKILL,
  * slice A of the BASE half is tombstoned (serving must exclude it
  * immediately, its codes harmlessly stale), the index is compacted
  * into a new generation (tombstones applied physically, codes CARRIED
  * minus A — asserted codes == physical rows), slice B is tombstoned
  * IN the new generation (pending, uncompacted), and BOTH slices are
  * staged for re-ingest through the resumed stream: A is physically
  * absent (the append + codes-in-step path), B is physically present
  * but tombstoned (the presence probe must skip the append and
  * re-ingest-wins must clear the tombstone). Final asserts: row/id
  * conservation over the whole corpus, ZERO live tombstones, codes ==
  * index rows exactly, full-probe serving == brute force, and the
  * composed IVF-PQ gate floor — so a vector that was deleted,
  * compacted away, and re-ingested is served through the composition
  * again, across a real process death.
  */
object IngestRehearsal {
  private def session(cpus: String): SparkSession = {
    val s = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  def main(args: Array[String]): Unit =
    if (sys.env.get("GRAFT_INGEST_ROLE").contains("child")) child()
    else parent(args)

  /** Child: run the ingest stream against the staged dirs. Armed mode
    * (GRAFT_INGEST_KILL_AT set) uses an endless trigger, prints the
    * kill marker at the threshold and WAITS for the parent's SIGKILL —
    * running out of work first still leaves the query active, so the
    * kill always lands on a live stream. Resume mode drains with
    * AvailableNow and must replay ≥1 data batch after a kill.
    */
  private def child(): Unit = {
    val wd = sys.env("GRAFT_INGEST_WD")
    val killAt = sys.env.get("GRAFT_INGEST_KILL_AT").map(_.toLong)
    val spark = session(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    // ALWAYS-ON per-epoch stage walls: the round-13 one-core assign
    // kernel hid from three rounds of outside-probe measurement — the
    // parent parses these lines into the ledger's stage_walls field so
    // the next such regression is visible in the banked evidence
    spark.conf.set("spark.graft.ingest.timing", "true")
    // the generation swap re-points ingest at the new dir (the serving
    // contract); default = the staged first generation
    val idx = Ann.openIndex(spark,
      sys.env.getOrElse("GRAFT_INGEST_INDEX", s"$wd/index"))
    val schema = spark.read.parquet(s"$wd/src").schema
    val src = EmbedIngest.embeddingFileStream(spark, s"$wd/src", schema)
    def dataBatches(q: org.apache.spark.sql.streaming.StreamingQuery) =
      q.recentProgress.count(_.numInputRows > 0).toLong
    killAt match {
      case Some(k) =>
        val q = EmbedIngest.ingestQuery(src, idx, s"$wd/ckpt",
          Trigger.ProcessingTime(0L))
        var reached = -1L
        while (q.isActive && reached < 0) {
          Thread.sleep(20)
          if (q.isActive && dataBatches(q) >= k) reached = dataBatches(q)
        }
        require(reached >= 0, "stream died before the kill threshold")
        println(s"READY_TO_KILL batch=$reached")
        Console.out.flush()
        q.awaitTermination()
        sys.error("ran to completion before the SIGKILL landed — " +
          "recovery was never exercised")
      case None =>
        val q = EmbedIngest.ingestQuery(src, idx, s"$wd/ckpt")
        // AvailableNow terminates when the backlog is drained — a
        // timeout here means the drain is INCOMPLETE, and reporting
        // success anyway would hand the parent a silently-partial
        // index (bug found exactly that way: a 600 s cap expired one
        // epoch short at the 2M decade and the conservation assert,
        // not the harness, caught it). Fail loud instead.
        require(q.awaitTermination(3600000),
          "resume leg still draining after 60 min — raise the cap or " +
            "investigate the per-epoch cost; a timeout is NOT success")
        if (new java.io.File(s"$wd/killed").exists())
          require(dataBatches(q) > 0,
            "post-SIGKILL restart replayed no data — the kill landed " +
              "after completion, recovery was never exercised")
        println(s"INGEST_DONE batches=${dataBatches(q)}")
        Console.out.flush()
    }
    spark.stop()
  }

  private def parent(args: Array[String]): Unit = {
    import scala.jdk.CollectionConverters._
    require(args.length >= 2,
      "usage: IngestRehearsal <outJson> <corpusDir> [nBatches] [mode]")
    val outFile = args(0)
    val corpus = args(1)
    val nBatches = if (args.length > 2) args(2).toInt else 8
    val mode = if (args.length > 3) args(3) else "plain"
    require(mode == "plain" || mode == "compact-swap" || mode == "churn",
      s"unknown mode $mode (plain | compact-swap | churn)")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val wd = java.nio.file.Files
      .createTempDirectory("graft-ingest-rehearsal-").toString
    val spark = session(cpus)
    // phase walls for the parent-side maintenance window (compaction,
    // generation commit) — same evidence standard as the child's
    // always-on [ingest-timing] stage walls
    spark.conf.set("spark.graft.maintenance.timing", "true")

    // ---- stage: built index on the even half, odd half as batch files
    val ev = spark.read.parquet(s"$corpus/embeddings.parquet")
    val n = ev.count()
    val k = Ann.cellCount(spark, corpus)
    println(s"[ingest] staging: n=$n cells=$k wd=$wd")
    val t0 = System.nanoTime()
    Ann.buildFrom(spark,
      ev.filter(col("vec_id") % 2 === 0)
        .select(col("vec_id"), col("label"),
          transform(col("embedding"), x => x.cast("double")).as("vec")),
      k, s"$wd/index")
    val buildSec = (System.nanoTime() - t0) / 1e9
    ev.filter(col("vec_id") % 2 === 1)
      .repartition(nBatches)
      .write.mode("overwrite").parquet(s"$wd/src")
    println(f"[ingest] staged: build=$buildSec%.1f s, $nBatches batch files")
    // BOTH modes also rehearse the IVF-PQ serve-after-ingest contract
    // at decade scale: a codes generation committed on the BASE half
    // (books trained there — the deployed timeline), every streamed
    // epoch PQ-encoding its batch in step (Pq.appendCodes inside the
    // idempotent commit), across a real SIGKILL. In compact-swap mode
    // the mid-ingest compaction additionally CARRIES the half-ingested
    // codes into the new generation (Pq.carryCodesInto via
    // compactIndex), and the post-swap epochs must keep encoding in
    // step against the carried artifact.
    val codesBuildSec = {
      val c0 = System.nanoTime()
      graft.operators.Pq.buildPqCodesFor(spark,
        Ann.openIndex(spark, s"$wd/index"),
        graft.operators.Pq.trainBooks(
          graft.operators.Pq.normedOf(
            ev.filter(col("vec_id") % 2 === 0)), "rehearsal base half"))
      val sec = (System.nanoTime() - c0) / 1e9
      println(f"[ingest] staged codes generation in $sec%.1f s")
      sec
    }

    // ---- fork 1: armed child, SIGKILL at the marker
    val javaBin = ProcessHandle.current().info().command().orElse("java")
    val jvmArgs = java.lang.management.ManagementFactory
      .getRuntimeMXBean.getInputArguments.asScala.toSeq
    val cp = System.getProperty("java.class.path")
    def launch(extraEnv: Map[String, String]): Process = {
      val cmd = Seq(javaBin) ++ jvmArgs ++
        Seq("-cp", cp, "graft.tools.IngestRehearsal") ++ args.toSeq
      val pb = new ProcessBuilder(cmd: _*)
      pb.redirectErrorStream(true)
      val env = pb.environment()
      env.put("GRAFT_INGEST_ROLE", "child")
      env.put("GRAFT_INGEST_WD", wd)
      env.put("SPARK_GRAFT_CPUS", cpus)
      extraEnv.foreach { case (kk, v) => env.put(kk, v) }
      pb.start()
    }
    // per-stage wall aggregation across every child leg — the ledger's
    // stage_walls field (stage → total seconds + sample count), parsed
    // from the always-on [ingest-timing] lines the children emit
    val stageWalls =
      scala.collection.mutable.LinkedHashMap.empty[String, (Double, Int)]
    val timingLine =
      """\[ingest-timing\]\s+(?:batch=\d+\s+)?(\S+)\s+([\d.]+) s""".r
    def drive(p: Process, killOn: Option[String]): Boolean = {
      val rd = new java.io.BufferedReader(
        new java.io.InputStreamReader(p.getInputStream))
      var killed = false
      var line = rd.readLine()
      while (line != null) {
        println(s"[child] $line")
        timingLine.findFirstMatchIn(line).foreach { m =>
          val (tot, cnt) = stageWalls.getOrElse(m.group(1), (0.0, 0))
          stageWalls(m.group(1)) = (tot + m.group(2).toDouble, cnt + 1)
        }
        if (!killed && killOn.exists(line.contains)) {
          p.destroyForcibly()
          killed = true
        }
        line = try rd.readLine() catch { case _: java.io.IOException => null }
      }
      p.waitFor()
      killed
    }
    val killThreshold = math.max(1, nBatches / 2)
    println(s"[ingest] forking armed child (kill at $killThreshold batches)")
    val w0 = System.nanoTime()
    val p1 = launch(Map("GRAFT_INGEST_KILL_AT" -> killThreshold.toString))
    val killed = drive(p1, Some("READY_TO_KILL"))
    require(killed, s"child exited (code ${p1.exitValue()}) before the " +
      "kill point — no SIGKILL was delivered")
    println(s"[ingest] SIGKILLed child pid=${p1.pid()} " +
      s"(exit ${p1.exitValue()})")
    java.nio.file.Files.write(java.nio.file.Paths.get(wd, "killed"),
      Array[Byte]())

    def ckptCommits(): Int =
      Option(new java.io.File(s"$wd/ckpt/commits")
        .listFiles()).map(_.count(_.getName.forall(_.isDigit))).getOrElse(0)
    def markerCount(dir: String): Int =
      Option(new java.io.File(s"$dir/_ingest_commits")
        .listFiles()).map(_.count(_.getName.startsWith("batch-")))
        .getOrElse(0)

    // ---- compact-swap mode: the maintenance window opens while the
    // stream is down (exactly where a crash leaves it) — compact the
    // half-ingested index into a NEW GENERATION and re-point ingest
    val epochsAtKill = ckptCommits()
    val servingDir =
      if (mode == "compact-swap") {
        val gen2 = s"$wd/index-gen2"
        println(s"[ingest] compacting mid-ingest generation into $gen2")
        val c0 = System.nanoTime()
        val rowsAtSwap = Ann.physicalRows(spark, s"$wd/index").count()
        Ann.compactIndex(spark, Ann.openIndex(spark, s"$wd/index"), gen2)
        println(f"[ingest] compaction: $rowsAtSwap rows carried in " +
          f"${(System.nanoTime() - c0) / 1e9}%.1f s")
        require(Ann.physicalRows(spark, gen2).count() == rowsAtSwap,
          "compaction dropped rows")
        require(markerCount(gen2) == 0,
          "compaction must not carry ingest markers into the generation")
        // a SECOND SIGKILL lands against the new generation mid-drain:
        // the first replayed epoch's marker is gone (dropped above) but
        // its rows were carried — the presence probe must heal it, and
        // exactly-once must continue within the swapped dir
        println("[ingest] forking armed child against the new generation")
        val pk = launch(Map("GRAFT_INGEST_KILL_AT" -> "1",
          "GRAFT_INGEST_INDEX" -> gen2))
        val killed2 = drive(pk, Some("READY_TO_KILL"))
        require(killed2, s"swap-leg child exited (code ${pk.exitValue()}) " +
          "before the kill point — no SIGKILL was delivered")
        println(s"[ingest] SIGKILLed swap-leg child pid=${pk.pid()} " +
          s"(exit ${pk.exitValue()})")
        gen2
      } else if (mode == "churn") {
        // ---- the full lifecycle with codes in step: delete → compact
        // → re-ingest (takedown, retention, reversal) while the stream
        // is down exactly where the SIGKILL left it
        val gen2 = s"$wd/index-gen2"
        val g1 = Ann.openIndex(spark, s"$wd/index")
        // two disjoint slices of the BASE half (even vec_ids)
        val aIds = ev.filter(col("vec_id") % 40 === 0)
          .select(col("vec_id"))
        val bIds = ev.filter(col("vec_id") % 40 === 20)
          .select(col("vec_id"))
        val aCount = aIds.count()
        val bCount = bIds.count()
        require(aCount > 0 && bCount > 0, "churn slices must be non-empty")
        val physAtKill = Ann.physicalRows(spark, g1.dir).count()
        // takedown #1: tombstone A — serving excludes it IMMEDIATELY,
        // its carried codes harmlessly stale (live-view re-rank)
        println(s"[churn] tombstoning slice A ($aCount ids) in gen1")
        Ann.deleteFromIndex(spark, g1, aIds)
        require(Ann.indexData(spark, g1)
          .join(aIds, Seq("vec_id"), "left_semi").count() == 0,
          "tombstoned slice A still visible in gen1 serving view")
        // compact: tombstones applied physically, codes CARRIED minus A
        println(s"[churn] compacting into $gen2 (A applied physically)")
        val c0 = System.nanoTime()
        Ann.compactIndex(spark, g1, gen2)
        println(f"[churn] compaction in ${(System.nanoTime() - c0) / 1e9}%.1f s")
        val g2 = Ann.openIndex(spark, gen2)
        val phys2 = Ann.physicalRows(spark, gen2).count()
        require(phys2 == physAtKill - aCount,
          s"compaction row math broke: $phys2 != $physAtKill - $aCount")
        val codes2 = graft.operators.Pq.codesAt(spark, gen2)
          .select(col("vec_id"))
        require(codes2.count() == phys2,
          s"carried codes fell out of step: ${codes2.count()} != $phys2")
        require(markerCount(gen2) == 0,
          "compaction must not carry ingest markers into the generation")
        // takedown #2: tombstone B IN the new generation (pending,
        // uncompacted — the codes for B stay, stale behind the live view)
        println(s"[churn] tombstoning slice B ($bCount ids) in gen2")
        Ann.deleteFromIndex(spark, g2, bIds)
        require(Ann.indexData(spark, g2)
          .join(bIds, Seq("vec_id"), "left_semi").count() == 0,
          "tombstoned slice B still visible in gen2 serving view")
        // reversal: stage BOTH slices for re-ingest through the STREAM —
        // A is physically absent (append + codes-in-step), B is present
        // but tombstoned (presence probe must skip, re-ingest must win)
        ev.join(aIds, Seq("vec_id"), "left_semi")
          .coalesce(1).write.mode("append").parquet(s"$wd/src")
        ev.join(bIds, Seq("vec_id"), "left_semi")
          .coalesce(1).write.mode("append").parquet(s"$wd/src")
        println("[churn] staged re-ingest files for A and B; resuming")
        gen2
      } else s"$wd/index"

    // ---- final fork: resume from the same checkpoint, drain
    val p2 = launch(
      if (mode != "plain")
        Map("GRAFT_INGEST_INDEX" -> servingDir)
      else Map.empty)
    val resumed = drive(p2, None)
    require(!resumed && p2.exitValue() == 0,
      s"resume child failed (exit ${p2.exitValue()})")
    val wallSec = (System.nanoTime() - w0) / 1e9

    // ---- asserts: exactly-once + exact serving on the final index
    val idx = Ann.openIndex(spark, servingDir)
    val got = Ann.physicalRows(spark, idx.dir)
    val total = got.count()
    val distinct = got.select(col("vec_id")).distinct().count()
    require(total == n, s"row conservation broke: $total != $n")
    require(distinct == n, s"duplicate vec_ids: $distinct != $n")
    // the checksummed LocalFileSystem writes a .crc sidecar per marker —
    // count only the markers themselves
    val markers = markerCount(servingDir)
    // EPOCHS, not files, are the exactly-once unit: when the SIGKILL
    // lands BEFORE the in-flight epoch's offsets hit the WAL, the
    // resume re-plans that epoch fresh and may coalesce several source
    // files into it (observed: offsets jump 3 → 5 in one epoch), so
    // "one marker per staged file" is not an invariant — one marker
    // per COMMITTED epoch is. Read the count from the checkpoint's own
    // commit log. In compact-swap mode the generation dropped the
    // pre-swap epochs' markers, so the invariant becomes one marker per
    // epoch committed AFTER the swap (incl. the healed replay of the
    // in-flight one).
    val committedEpochs = ckptCommits()
    val expectMarkers =
      if (mode != "plain") committedEpochs - epochsAtKill
      else committedEpochs
    require(markers == expectMarkers,
      s"expected $expectMarkers markers (committed epochs " +
        s"$committedEpochs, at-kill $epochsAtKill), found $markers")
    require(committedEpochs >= killThreshold,
      s"only $committedEpochs epochs committed — the kill threshold " +
        s"$killThreshold was never reached, recovery unexercised")
    val qv = ev.filter(col("vec_id") === 0)
      .select(transform(col("embedding"), x => x.cast("double")))
      .first().getSeq[Double](0)
    def served = got
      .filter(col("cell").isin(idx.probeCells(qv, idx.cents.length): _*))
      .withColumn("sim", round(
        graft.operators.SimilarityOps.cosine(col("vec"), typedlit(qv)), 4))
      .select(col("vec_id"), col("sim"))
      .orderBy(col("sim").desc, col("vec_id"))
      .limit(20).collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val brute = ev
      .select(col("vec_id"),
        transform(col("embedding"), x => x.cast("double")).as("vec"))
      .withColumn("sim", round(
        graft.operators.SimilarityOps.cosine(col("vec"),
          typedlit(qv)), 4))
      .select(col("vec_id"), col("sim"))
      .orderBy(col("sim").desc, col("vec_id"))
      .limit(20).collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val serveExact = served == brute
    require(serveExact, "full-probe serving != brute force after recovery")
    println(s"[ingest] exactly-once green: rows=$total distinct=$distinct " +
      s"markers=$markers serveExact=$serveExact")
    if (mode == "churn") {
      // re-ingest-wins must have cleared every tombstone: B was
      // tombstoned in THIS generation and re-ingested through the
      // stream — a surviving tombstone would mean the presence-probe
      // skip path failed to clear it (rows above only prove physical
      // presence; the live view is what serves)
      require(Ann.liveDeleteIds(spark, idx).isEmpty,
        "live tombstones survived the churn re-ingest — " +
          "re-ingest-wins failed to clear them")
      println("[churn] zero live tombstones after re-ingest — " +
        "re-ingest-wins held")
    }

    // ---- the codes generation must have kept step with every
    // streamed epoch (and, in compact-swap mode, survived the
    // mid-ingest carry) — coverage is EXACTLY the final index rows
    // (no missed batch, no replay duplicate), and the composed IVF-PQ
    // serve holds the gate contract (all cells probed, top-20 overlap
    // >= 18/20 vs brute force, published sims exact on the overlap)
    // at decade scale across the process death
    val (codesRows, ivfPqOverlap) = {
      {
        val codesDir = s"${idx.dir}/_pq_codes"
        val codes = graft.operators.Pq.codesAt(spark, idx.dir)
          .select(col("vec_id"))
        val cRows = codes.count()
        require(cRows == n && codes.distinct().count() == n,
          s"codes fell out of step: $cRows rows (corpus $n)")
        require(codes.exceptAll(got.select(col("vec_id"))).isEmpty,
          "codes carry a vec_id the index does not")
        // the gate floor needs a WIDTH with measured recall at this
        // corpus size: at the 16-subspace default the 2M sweep reads
        // recall@20 = 0.94 @2000 / 0.98 @4000 / 1.00 @10000
        // (bench/pq_recall_r13_2m_m16.json — the r11 8-byte geometry
        // needed 64,000). 0.5% of the corpus reproduces the
        // measured-1.0 width at 2M and stays shortlist-shaped; the
        // assert still catches missing appended codes — they would cap
        // overlap at the even half's share (~10/20) at ANY width.
        val assertWidth = math.max(graft.operators.Pq.Shortlist.toLong,
          math.ceil(n * 0.005).toLong).toString
        spark.conf.set("spark.graft.pq.shortlist", assertWidth)
        val composed =
          try graft.operators.Pq.serveIvfPqTopk(spark, idx,
            codesDir, graft.operators.Pq.loadBooks(spark, codesDir),
            qv.toArray, idx.cents.length)
            .collect().map(r => (r.getLong(0), r.getDouble(2))).toSeq
          finally spark.conf.unset("spark.graft.pq.shortlist")
        val overlap = composed.map(_._1).toSet
          .intersect(brute.map(_._1).toSet).size
        require(overlap >= 18,
          s"composed IVF-PQ overlap@20 fell to $overlap after ingest")
        val bruteSim = brute.toMap
        composed.filter(c => bruteSim.contains(c._1)).foreach { c =>
          require(c._2 == bruteSim(c._1),
            s"published sim diverged from exact for vec_id ${c._1}")
        }
        println(s"[ingest] IVF-PQ codes-in-step green: codes=$cRows " +
          s"overlap20=$overlap sims exact")
        (cRows, overlap)
      }
    }

    val stageWallsJson = stageWalls.map { case (st, (tot, cnt)) =>
      f""""$st":{"total_sec":$tot%.3f,"epochs":$cnt}"""
    }.mkString("{", ",", "}")
    val json =
      s"""{"corpus":"$corpus","mode":"$mode","n_vectors":$n,"cells":$k,
         |"stage_walls":$stageWallsJson,
         |"n_batches":$nBatches,"committed_epochs":$committedEpochs,
         |"epochs_at_first_kill":$epochsAtKill,
         |"kill_threshold":$killThreshold,
         |"kill":"fork_sigkill","staging_build_sec":$buildSec,
         |"stream_wall_sec":$wallSec,
         |"rows":$total,"distinct_vec_ids":$distinct,
         |"commit_markers":$markers,
         |"serve_equals_brute_force":$serveExact,
         |"codes_build_sec":$codesBuildSec,"codes_rows":$codesRows,
         |"ivfpq_overlap20_after_ingest":$ivfPqOverlap,
         |"recovered":true}"""
        .stripMargin.replace("\n", "")
    val out = java.nio.file.Paths.get(outFile)
    if (out.getParent != null)
      java.nio.file.Files.createDirectories(out.getParent)
    java.nio.file.Files.write(out,
      json.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    println(s"[ingest] wrote $outFile")
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(wd))
    spark.stop()
  }
}
