package graft

import org.apache.spark.sql.functions._

import graft.operators.{Ann, Pq}
import graft.sources.Tables

/** The IVF-PQ composition ([[Pq.ivfPqCodes]] / `ann_ivfpq_topk`): codes
  * stored cell-partitioned beside the index, probe-pruned ADC scan,
  * exact re-rank through the live index view. The registry gate
  * hash-checks the all-cells mode against the brute-force oracle; this
  * spec pins what the hash can't see — the structural reduction to
  * sim_cosine_topk, the at-rest layout, partition pruning in the plan,
  * and tombstone safety against stale codes.
  */
class IvfPqSpec extends SparkSpec {

  test("all cells + shortlist >= corpus: the composition IS sim_cosine_topk") {
    val s = spark.newSession()
    s.conf.set("spark.graft.pq.shortlist",
      Tables.embeddings(s, sf).count().toString)
    val got = Pq.ivfPqTopk(s, sf, allCells = true)
    val want = SparkEntry.queries("sim_cosine_topk")(s, sf)
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty,
      "exhaustive IVF-PQ must publish exactly the brute-force rows")
  }

  test("gate floors hold at the default shortlist") {
    val row = SparkEntry.queries("ann_ivfpq_gate")(spark, sf).collect()
    assert(row.length === 1)
    assert(row(0).getBoolean(1), "top-20 overlap fell below 18/20")
    assert(row(0).getBoolean(2), "published sims diverged from exact")
  }

  test("fused and two-job serve plans publish identical rows (single + batch)") {
    // the plan choice (shortlist as broadcast subquery vs driver-
    // materialized + shortlist-cell pruning) is a pure physical
    // decision — forcing each side must not move a row
    def inMode(mode: String) = {
      val s = spark.newSession()
      s.conf.set("spark.graft.pq.serveMode", mode)
      (Pq.ivfPqTopk(s, sf, allCells = true).collect().toSeq,
        Pq.ivfPqBatch(s, sf, allCells = true).collect().toSeq)
    }
    val (fusedTop, fusedBatch) = inMode("fused")
    val (twoTop, twoBatch) = inMode("twojob")
    assert(fusedTop === twoTop, "single-query plans diverged")
    assert(fusedBatch === twoBatch, "batch plans diverged")
  }

  test("codes base layout derives from cell bytes: sharded at tiny cells, partitioned at big ones") {
    val dir = Pq.ivfPqCodes(spark, sf)
    val idx = Ann.ivfIndex(spark, sf)
    assert(dir === s"${idx.dir}/_pq_codes")
    // test geometry is the tiny-cell case (a cell's codes are KBs):
    // the base must be byte-sharded — few cell-sorted files, no
    // file-per-cell dirs (the r14 knee tax)
    assert(new java.io.File(dir, "_shards").isDirectory,
      "tiny-cell geometry must choose the sharded base")
    assert(!new java.io.File(dir).listFiles()
      .exists(f => f.isDirectory && f.getName.startsWith("cell=")),
      "sharded base must not also carry partition dirs")
    assert(new java.io.File(dir, "_GRAFT_PQ_CODES_READY").exists())
    // the `_`-prefixed subdir is invisible to the index data read
    assert(spark.read.parquet(idx.dir).columns.toSet ===
      Set("vec_id", "label", "vec", "soft_cells", "cell"))
    // big-cell geometry (force: target shard of 1 byte => perCell >=
    // target) keeps the partitioned file-per-cell base, where dir-level
    // partition pruning is strictly better — and the two layouts serve
    // identical rows
    val s2 = spark.newSession()
    s2.conf.set("spark.graft.pq.codesShardBytes", "1")
    val layoutBase = java.nio.file.Files
      .createTempDirectory("graft-ivfpq-layout-").toString
    Ann.registerTempIndexDir(layoutBase)
    s2.conf.set("spark.graft.ann.indexDir", layoutBase)
    val dir2 = Pq.ivfPqCodes(s2, sf)
    assert(!new java.io.File(dir2, "_shards").exists(),
      "big-cell geometry must keep the partitioned base")
    assert(new java.io.File(dir2).listFiles()
      .exists(f => f.isDirectory && f.getName.startsWith("cell=")))
    val a = Pq.ivfPqTopk(spark, sf, allCells = true).collect().toSeq
    val b = Pq.ivfPqTopk(s2, sf, allCells = true).collect().toSeq
    assert(a === b, "sharded and partitioned bases served different rows")
  }

  test("sharded base file count keeps a task's worth of ADC work per file") {
    // the work floor (min(parallelism, bytes/8MB)) spreads a big
    // sharded base across the cluster — a one-file base serialized the
    // CPU-bound batched ADC stage (measured 2.3x at sf10 geometry) —
    // while a tiny base stays ONE file so the single-query knee pays
    // no extra task scheduling.
    val codes = Tables.embeddings(spark, sf).limit(200)
      .select(col("vec_id"), lit(Array[Byte](1, 2)).as("codes"),
        (col("vec_id") % 50).cast("int").as("cell"))
    val big = java.nio.file.Files
      .createTempDirectory("graft-shardcount-big-").toString
    val small = java.nio.file.Files
      .createTempDirectory("graft-shardcount-small-").toString
    Ann.registerTempIndexDir(big)
    Ann.registerTempIndexDir(small)
    assert(Pq.writeCodesBase(spark, codes, big, 64L * 1024 * 1024, 50),
      "KB-scale cells must choose the sharded layout")
    assert(Pq.writeCodesBase(spark, codes, small, 2L * 1024 * 1024, 50))
    def parts(d: String) = new java.io.File(s"$d/_shards").listFiles()
      .count(f => f.getName.startsWith("part-"))
    assert(parts(big) === 4, // min(local[4] parallelism, 64MB / 8MB)
      "a big sharded base must split to the work floor")
    assert(parts(small) === 1, "a tiny base must stay one file")
  }

  test("appended codes land in the DELTA tier; compaction folds them into the base") {
    val t = java.nio.file.Files
      .createTempDirectory("graft-ivfpq-delta-").toString
    Ann.registerTempIndexDir(t)
    val ev = Tables.embeddings(spark, sf)
    val even = ev.filter(col("vec_id") % 2 === 0)
    val idx = Ann.buildFrom(spark,
      even.select(col("vec_id"), col("label"),
        transform(col("embedding"), x => x.cast("double")).as("vec")),
      Ann.Cells, t)
    val codesDir = Pq.buildPqCodesFor(spark, idx,
      Pq.trainBooks(Pq.normedOf(even), "delta-fixture"))
    def baseFiles(): Set[String] = {
      val d = new java.io.File(codesDir)
      Option(d.listFiles()).getOrElse(Array.empty).toSeq
        .filter(f => f.isDirectory && f.getName.startsWith("cell="))
        .flatMap(cd => cd.listFiles().toSeq.filter(_.isFile)
          .map(f => s"${cd.getName}/${f.getName}")).toSet
    }
    val before = baseFiles()
    Ann.appendToIndex(spark, idx, ev.filter(col("vec_id") % 2 === 1))
    // the epoch did NOT touch the cell-partitioned base (the measured
    // 10^4-files-per-epoch tax) — it landed as delta files
    assert(baseFiles() === before,
      "an append must not write into the cell-partitioned codes base")
    val delta = new java.io.File(codesDir, "_delta")
    assert(delta.isDirectory &&
      delta.listFiles().exists(_.getName.startsWith("e-")),
      "appended codes must land under _delta/e-*")
    // the union view covers exactly the index rows (both tiers)
    val codeIds = Pq.codesAt(spark, idx.dir).select(col("vec_id"))
    val idxIds = Ann.physicalRows(spark, idx.dir).select(col("vec_id"))
    assert(codeIds.exceptAll(idxIds).isEmpty &&
      idxIds.exceptAll(codeIds).isEmpty)
    // compaction FOLDS the delta into the next generation's base
    val dst = java.nio.file.Files
      .createTempDirectory("graft-ivfpq-delta-dst-").toString
    Ann.registerTempIndexDir(dst)
    Ann.compactIndex(spark, idx, dst)
    assert(!new java.io.File(s"$dst/_pq_codes/_delta").exists(),
      "the compacted generation must start with an empty delta tier")
    val dstCodes = Pq.codesAt(spark, dst).select(col("vec_id"))
    val dstIds = spark.read.parquet(dst).select(col("vec_id"))
    assert(dstCodes.exceptAll(dstIds).isEmpty &&
      dstIds.exceptAll(dstCodes).isEmpty,
      "folded codes diverge from the compacted generation's rows")
  }

  test("a crashed delta write's orphan epoch dir (only _temporary) never wedges reads or replays") {
    // the committer creates the e-* dir at job SETUP, so a SIGKILL
    // mid-write leaves it holding only _temporary — and when it is the
    // ONLY epoch dir (first streamed epoch after a build), listing it
    // would fail schema inference on every codes read AND the healing
    // replay's own anti-join: the stream would be permanently wedged
    // (round-13 ADVICE)
    val t = java.nio.file.Files
      .createTempDirectory("graft-ivfpq-orphan-").toString
    Ann.registerTempIndexDir(t)
    val ev = Tables.embeddings(spark, sf)
    val even = ev.filter(col("vec_id") % 2 === 0)
    val idx = Ann.buildFrom(spark,
      even.select(col("vec_id"), col("label"),
        transform(col("embedding"), x => x.cast("double")).as("vec")),
      Ann.Cells, t)
    val codesDir = Pq.buildPqCodesFor(spark, idx,
      Pq.trainBooks(Pq.normedOf(even), "orphan-fixture"))
    val orphan = new java.io.File(codesDir, "_delta/e-crashed/_temporary")
    assert(orphan.mkdirs())
    // the orphan is the only epoch dir: every read must skip it
    val baseCount = even.count()
    assert(Pq.codesAt(spark, idx.dir).count() === baseCount,
      "codes read wedged or mis-listed by the footerless orphan")
    // the healing replay (appendCodes' anti-join reads the delta tier
    // too) must land the batch despite the orphan
    Ann.appendToIndex(spark, idx, ev.filter(col("vec_id") % 2 === 1))
    val codeIds = Pq.codesAt(spark, idx.dir).select(col("vec_id"))
    val allIds = ev.select(col("vec_id"))
    assert(codeIds.exceptAll(allIds).isEmpty &&
      allIds.exceptAll(codeIds).isEmpty,
      "append alongside the orphan lost or duplicated codes")
    assert(new java.io.File(codesDir, "_delta/e-crashed").exists(),
      "a young orphan is filtered, not reaped (grace window)")
  }

  test("a replay whose codes already landed writes NO new delta epoch") {
    val t = java.nio.file.Files
      .createTempDirectory("graft-ivfpq-noop-").toString
    Ann.registerTempIndexDir(t)
    val ev = Tables.embeddings(spark, sf)
    val even = ev.filter(col("vec_id") % 2 === 0)
    val idx = Ann.buildFrom(spark,
      even.select(col("vec_id"), col("label"),
        transform(col("embedding"), x => x.cast("double")).as("vec")),
      Ann.Cells, t)
    val codesDir = Pq.buildPqCodesFor(spark, idx,
      Pq.trainBooks(Pq.normedOf(even), "noop-fixture"))
    val batch = ev.filter(col("vec_id") % 2 === 1)
    assert(Ann.appendToIndexIdempotent(spark, idx, batch, 31L))
    def epochDirs(): Set[String] = {
      val d = new java.io.File(codesDir, "_delta")
      Option(d.listFiles()).getOrElse(Array.empty)
        .filter(f => f.isDirectory && f.getName.startsWith("e-"))
        .map(_.getName).toSet
    }
    val after = epochDirs()
    assert(after.nonEmpty, "the epoch's codes must have landed as delta")
    // crash-window replay (marker gone, data + codes fully present):
    // the probe skips the data, and the codes anti-join finds nothing
    // missing — it must NOT write a no-op epoch dir (they would
    // accumulate until compaction, churning memo invalidation)
    new java.io.File(idx.dir, "_ingest_commits/batch-31").delete()
    assert(!Ann.appendToIndexIdempotent(spark, idx, batch, 31L))
    assert(epochDirs() === after,
      "a fully-landed replay must not write a no-op delta epoch")
  }

  test("a legacy codes generation (marker, no _books) is rebuilt, not hard-failed") {
    // commit a generation under a PINNED base (so a later session loads
    // this dir instead of building its own temp index), then strip its
    // sidecar — the pre-sidecar on-disk shape. The serve path must drop
    // the marker and rebuild wholesale instead of throwing on the
    // missing books load.
    val base = java.nio.file.Files
      .createTempDirectory("graft-ivfpq-legacy-").toString
    Ann.registerTempIndexDir(base)
    val s1 = spark.newSession()
    s1.conf.set("spark.graft.ann.indexDir", base)
    val dir = Pq.ivfPqCodes(s1, sf)
    val books = new java.io.File(dir, "_books")
    assert(books.exists(), "fixture needs a committed _books sidecar")
    def rm(f: java.io.File): Unit = {
      Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
    }
    rm(books)
    val s2 = spark.newSession() // cold path: no memoized codes dir
    s2.conf.set("spark.graft.ann.indexDir", base)
    val got = Pq.ivfPqTopk(s2, sf, allCells = true).collect()
    assert(got.length === 20, "legacy generation must serve after rebuild")
    assert(new java.io.File(dir, "_books").exists(),
      "the rebuild must re-commit the books sidecar")
  }

  test("the serving scan is probe-pruned: only probed cells' code groups are read") {
    val idx = Ann.ivfIndex(spark, sf)
    val plan = Pq.ivfPqTopk(spark, sf, allCells = false)
      .queryExecution.executedPlan.toString
    // the sharded base prunes by PUSHED row-group/page stats on the
    // sorted cell column (the partitioned layout's PartitionFilters
    // equivalent) — the cell In predicate must reach the parquet scan
    assert(plan.contains("PushedFilters") &&
      plan.matches("(?s).*PushedFilters: \\[[^\\]]*[Ii]n\\(cell.*"),
      s"expected the cell In filter pushed to the codes scan, got:\n$plan")
    val qv = Tables.embeddings(spark, sf).filter(col("vec_id") === 0)
      .select(transform(col("embedding"), x => x.cast("double")))
      .first().getSeq[Double](0)
    val probed = idx.probeCells(qv, Ann.nprobeOf(spark, sf)).toSet
    assert(probed.size < idx.cents.length,
      "fixture must actually prune (nprobe < cells)")
  }

  test("a freshly APPENDED near-duplicate of the query is served through the composition") {
    // the serve-after-ingest contract, deterministically: codes are
    // committed BEFORE the append, the appended vector IS the query
    // vector (exact cosine 1.0), and the very next composed query must
    // publish it — possible only if the append path PQ-encoded the
    // batch into the committed codes generation (Pq.appendCodes)
    val s = spark.newSession()
    Pq.ivfPqCodes(s, sf) // build index + codes on the existing corpus
    val q = Tables.embeddings(s, sf).filter(col("vec_id") === 0)
      .select(transform(col("embedding"), x => x.cast("double")))
      .first().getSeq[Double](0)
    val newId = Tables.embeddings(s, sf)
      .agg(max(col("vec_id"))).first().getLong(0) + 1
    import s.implicits._
    val idx = Ann.ivfIndex(s, sf)
    Ann.appendToIndex(s, idx,
      Seq((newId, 999, q)).toDF("vec_id", "label", "embedding"))
    val top = Pq.ivfPqTopk(s, sf, allCells = true).collect()
    val hit = top.find(_.getLong(0) == newId)
    assert(hit.isDefined,
      "appended vector invisible to the composition — codes not in step")
    assert(hit.get.getDouble(2) === 1.0,
      "appended near-duplicate must re-rank at exact cosine 1.0")
  }

  test("ingest gate floors hold (append-then-serve, all cells)") {
    val row = SparkEntry.queries("ann_ivfpq_ingest_gate")(spark, sf).collect()
    assert(row.length === 1)
    assert(row(0).getBoolean(1), "top-20 overlap fell below 18/20")
    assert(row(0).getBoolean(2), "published sims diverged from exact")
  }

  test("all cells + shortlist >= corpus: the BATCH composition IS sim_batch_topk") {
    val s = spark.newSession()
    s.conf.set("spark.graft.pq.shortlist",
      Tables.embeddings(s, sf).count().toString)
    val got = Pq.ivfPqBatch(s, sf, allCells = true)
    val want = SparkEntry.queries("sim_batch_topk")(s, sf)
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty,
      "exhaustive batched IVF-PQ must publish exactly the brute-force rows")
  }

  test("batch gate floors hold per query at the default shortlist") {
    val rows = SparkEntry.queries("ann_ivfpq_batch_gate")(spark, sf).collect()
    assert(rows.length === 3, "one truth-table row per batched query")
    rows.foreach { r =>
      assert(r.getBoolean(1), s"qid ${r.getLong(0)}: top-5 overlap < 4/5")
      assert(r.getBoolean(2), s"qid ${r.getLong(0)}: sims diverged from exact")
    }
  }

  test("compaction CARRIES the codes generation: books bit-equal, tombstones applied, no re-encode") {
    val s = spark.newSession()
    val idx = Ann.ivfIndex(s, sf)
    val codesDir = Pq.ivfPqCodes(s, sf)
    import s.implicits._
    // tombstone two served ids, then swap generations
    val top = Pq.ivfPqTopk(s, sf, allCells = true).collect()
    val victims = top.take(2).map(_.getLong(0)).toSeq
    Ann.deleteFromIndex(s, idx, victims.toDF("vec_id"))
    val dst = java.nio.file.Files
      .createTempDirectory("graft-ivfpq-compact-").toString
    val out = Ann.compactIndex(s, idx, dst)
    val dstCodes = s"$dst/_pq_codes"
    assert(new java.io.File(dstCodes, "_GRAFT_PQ_CODES_READY").exists(),
      "carried codes generation must commit under its marker")
    // codes cover exactly the new generation's data rows (victims gone)
    val codeIds = Pq.codesAt(s, dst).select(col("vec_id"))
    val dataIds = s.read.parquet(dst).select(col("vec_id"))
    assert(codeIds.exceptAll(dataIds).isEmpty &&
      dataIds.exceptAll(codeIds).isEmpty,
      "carried codes diverge from the compacted data rows")
    assert(codeIds.filter(col("vec_id").isin(victims: _*)).count() === 0)
    // books carried bit-equal — the LUTs stay consistent, no retrain
    val a = Pq.loadBooks(s, codesDir)
    val b = Pq.loadBooks(s, dstCodes)
    assert(a.length === b.length)
    a.indices.foreach { j =>
      assert(a(j).length === b(j).length)
      a(j).indices.foreach(c =>
        assert(java.util.Arrays.equals(a(j)(c), b(j)(c)),
          s"codebook $j/$c changed across the carry"))
    }
    // carried codes are BIT-EQUAL for surviving ids (no re-encode)
    val src = Pq.codesAt(s, idx.dir)
      .filter(!col("vec_id").isin(victims: _*))
      .select(col("vec_id"), col("codes"))
    val dstC = Pq.codesAt(s, dst).select(col("vec_id"), col("codes"))
    assert(src.exceptAll(dstC).isEmpty && dstC.exceptAll(src).isEmpty,
      "carried codes are not bit-equal to the source generation")
    // composed serving over the new generation == over the old (both
    // all-cells, same books): the swap is invisible to results
    val qv = Tables.embeddings(s, sf).filter(col("vec_id") === 0)
      .select(transform(col("embedding"), x => x.cast("double")))
      .first().getSeq[Double](0).toArray
    val servedOld = Pq.serveIvfPqTopk(s, idx, codesDir, a, qv,
      idx.cents.length)
    val servedNew = Pq.serveIvfPqTopk(s, out, dstCodes, b, qv,
      out.cents.length)
    assert(servedOld.exceptAll(servedNew).isEmpty &&
      servedNew.exceptAll(servedOld).isEmpty,
      "generation swap changed the composed serving results")
  }

  test("bulk-epoch commit gate: data files without _SUCCESS are invisible; reaping is writer-side, past grace only") {
    // a multi-file bulk epoch commits by renaming files out of
    // _temporary one at a time and writing _SUCCESS LAST — so a dir with
    // visible data files but no marker is the between-renames window of
    // a partial commit (round-14 ADVICE) and must be neither served,
    // token-memoized, nor reaped by a serving read (a concurrent bulk
    // writer's in-flight epoch looks exactly like this)
    import graft.operators.DeltaTier
    val t = java.nio.file.Files
      .createTempDirectory("graft-ivfpq-partial-").toString
    Ann.registerTempIndexDir(t)
    val ev = Tables.embeddings(spark, sf)
    val even = ev.filter(col("vec_id") % 2 === 0)
    val idx = Ann.buildFrom(spark,
      even.select(col("vec_id"), col("label"),
        transform(col("embedding"), x => x.cast("double")).as("vec")),
      Ann.Cells, t)
    val codesDir = Pq.buildPqCodesFor(spark, idx,
      Pq.trainBooks(Pq.normedOf(even), "partial-fixture"))
    Ann.appendToIndex(spark, idx, ev.filter(col("vec_id") % 2 === 1))
    val delta = new java.io.File(codesDir, "_delta")
    val real = Option(delta.listFiles()).getOrElse(Array.empty)
      .filter(f => f.isDirectory && f.getName.startsWith("e-")).head
    val dataFile = real.listFiles()
      .filter(f => f.isFile && !f.getName.startsWith("_") &&
        !f.getName.startsWith(".")).head
    val partial = new java.io.File(delta, "e-partial")
    assert(partial.mkdirs())
    java.nio.file.Files.copy(dataFile.toPath,
      new java.io.File(partial, dataFile.getName).toPath)
    // visible data file, no _SUCCESS: must not serve (its rows would
    // double-count the real epoch's) and must not be listed
    assert(Pq.codesAt(spark, idx.dir).count() === ev.count(),
      "an unmarked (partially committed) epoch must not serve")
    assert(!DeltaTier.epochDirs(spark, codesDir)
      .exists(_.getPath.getName == "e-partial"))
    // serving reads never reap — young OR old
    val old = System.currentTimeMillis() - 2L * 3600 * 1000
    partial.listFiles().foreach(_.setLastModified(old))
    assert(partial.setLastModified(old))
    DeltaTier.epochDirs(spark, codesDir)
    assert(partial.exists(), "a serving read must never reap an epoch dir")
    // the writer-side maintenance path reaps it once past grace
    assert(DeltaTier.reapOrphans(spark, codesDir) === 1)
    assert(!partial.exists(), "reapOrphans must delete the aged orphan")
    // ...but never a RECENT uncommitted dir (in-flight write protection:
    // any fresh file under the dir vetoes the reap)
    val inflight = new java.io.File(delta, "e-inflight/_temporary")
    assert(inflight.mkdirs())
    assert(inflight.getParentFile.setLastModified(old)) // stale dir mtime,
    // fresh _temporary below — the recursive recency check must see it
    assert(DeltaTier.reapOrphans(spark, codesDir) === 0)
    assert(inflight.exists(), "an in-flight epoch with recent task " +
      "activity must survive reaping even with a stale dir mtime")
  }

  test("a tombstoned id is never published even though its CODES are stale") {
    // fresh session => fresh temp index fixture; mutating it cannot
    // poison the shared-session fixtures other suites read
    val s = spark.newSession()
    val idx = Ann.ivfIndex(s, sf)
    Pq.ivfPqCodes(s, sf) // codes encoded over the full physical index
    val top = Pq.ivfPqTopk(s, sf, allCells = true).collect()
    val victim = top(0).getLong(0)
    import s.implicits._
    Ann.deleteFromIndex(s, idx, Seq(victim).toDF("vec_id"))
    val after = Pq.ivfPqTopk(s, sf, allCells = true).collect()
    assert(!after.map(_.getLong(0)).contains(victim),
      "stale codes resurrected a tombstoned id through the re-rank")
    assert(after.length === 20, "serving must backfill to k from the live view")
  }
}
