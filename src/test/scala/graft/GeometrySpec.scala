package graft

import graft.operators.{Ann, DedupOps}

/** The derived-geometry CONTRACT — the formulas every registered query
  * silently depends on ([[Ann.cellCount]], [[Ann.nprobeOf]],
  * [[DedupOps.rowsOf]]). NOTES documents the derivations; this spec PINS
  * them: clamp bounds, conf-wins precedence, and the footer-count
  * memoization that keeps geometry resolution off the job path after
  * first touch. A formula change without a matching spec change fails
  * here, not in a 10×-scale rehearsal three rounds later.
  */
class GeometrySpec extends SparkSpec {

  /** A throwaway scale dir whose embeddings/documents tables have exactly
    * the requested row counts (geometry only ever counts them — schema
    * is irrelevant).
    */
  private def mkCorpus(nVecs: Long, nDocs: Long): String = {
    val d = java.nio.file.Files.createTempDirectory("graft-geom-").toString
    spark.range(nVecs).toDF("vec_id")
      .write.mode("overwrite").parquet(s"$d/embeddings.parquet")
    spark.range(nDocs).toDF("doc_id")
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    d
  }

  private def withConf[T](kvs: (String, String)*)(body: => T): T =
    try { kvs.foreach { case (k, v) => spark.conf.set(k, v) }; body }
    finally kvs.foreach { case (k, _) => spark.conf.unset(k) }

  test("IVF cell count derives n/200 with a floor of 10") {
    // below the floor: 300 vectors would derive 1 cell — clamped to 10
    assert(Ann.cellCount(spark, mkCorpus(300, 10)) === 10)
    // above it: straight n / TargetCellRows
    assert(Ann.cellCount(spark, mkCorpus(2500, 10)) === 12)
    assert(Ann.TargetCellRows === 200L)
  }

  test("nprobe derives ceil(0.6·cells) with floor 8, capped at cells") {
    // cells=12 → ceil(7.2)=8 ties the floor — the historical test-scale
    // default, so every measured recall gate still measures this config
    assert(Ann.nprobeOf(spark, mkCorpus(2500, 10)) === 8)
    // cells=100 (the sf1 rehearsal geometry) → 60: the fraction that
    // measured recall@20=1.00 on the near-uniform worst case (round 7)
    assert(Ann.nprobeOf(spark, mkCorpus(20000, 10)) === 60)
    assert(Ann.ProbeFraction === 0.6)
    // a conf-forced cell count BELOW the floor still caps nprobe at it
    val d = mkCorpus(2500, 10)
    withConf("spark.graft.ann.cells" -> "4") {
      assert(Ann.nprobeOf(spark, d) === 4)
    }
  }

  test("LSH rows-per-band ladder: 6 at ≤5k docs, +2 per decade") {
    assert(DedupOps.rowsOf(spark, mkCorpus(10, 4999)) === 6)
    assert(DedupOps.rowsOf(spark, mkCorpus(10, 5000)) === 6)
    // within the first decade the floor holds (log term truncates)
    assert(DedupOps.rowsOf(spark, mkCorpus(10, 6000)) === 6)
    // one decade up: the sf1 rehearsal protocol's hand-set 8
    assert(DedupOps.rowsOf(spark, mkCorpus(10, 50000)) === 8)
  }

  test("explicit geometry confs always win, without touching the corpus") {
    // the dir does not exist — a derivation attempt would throw, so a
    // pass ALSO pins that conf resolution short-circuits the file read
    val ghost = "/nonexistent/graft-geom-ghost"
    withConf("spark.graft.ann.cells" -> "123",
        "spark.graft.ann.nprobe" -> "17",
        "spark.graft.lsh.rows" -> "11") {
      assert(Ann.cellCount(spark, ghost) === 123)
      assert(Ann.nprobeOf(spark, ghost) === 17)
      assert(DedupOps.rowsOf(spark, ghost) === 11)
    }
  }

  test("footer counts memoize per dir: warm calls never re-read the files") {
    val d = mkCorpus(3000, 7000)
    // cold: reads the parquet footers
    assert(Ann.cellCount(spark, d) === 15)
    assert(DedupOps.rowsOf(spark, d) === 6)
    // delete the corpus — a warm call that still answers can only be
    // served from the memo; an un-memoized implementation would throw
    // trying to list the vanished path
    def rm(p: java.io.File): Unit = {
      if (p.isDirectory) p.listFiles().foreach(rm)
      p.delete(); ()
    }
    rm(new java.io.File(d))
    assert(Ann.cellCount(spark, d) === 15)
    assert(Ann.nprobeOf(spark, d) === 9)
    assert(DedupOps.rowsOf(spark, d) === 6)
  }

  test("exact-twin modulus: identity at gate scales, ceil(n/2000) beyond") {
    // the count-bound on the one-cell semantic exact twins: m = 1 at any
    // corpus the driver gates (n ≤ 2000 — behavior identical to the
    // pre-bound twins), ceil(n/2000) beyond, so the gated subset stays
    // ~2000 vectors at ANY scale. The oracle SQL must derive the SAME
    // modulus from COUNT(*): the target constant is asserted against the
    // literal embedded in the SQL mirror so they cannot drift apart.
    assert(DedupOps.ExactTwinTargetRows === 2000.0)
    assert(DedupOps.ExactTwinModulusSql.contains("COUNT(*) / 2000.0"))
    assert(DedupOps.ExactTwinModulusSql.contains("GREATEST(1"))
    assert(DedupOps.exactTwinModulus(spark, mkCorpus(1, 1)) === 1L)
    assert(DedupOps.exactTwinModulus(spark, mkCorpus(2000, 1)) === 1L)
    assert(DedupOps.exactTwinModulus(spark, mkCorpus(2001, 1)) === 2L)
    assert(DedupOps.exactTwinModulus(spark, mkCorpus(20000, 1)) === 10L)
    // the sf10 rehearsal geometry: 200k vectors → every 100th gated
    assert(DedupOps.exactTwinModulus(spark, mkCorpus(200000, 1)) === 100L)
  }

  test("exact-twin modulus memoizes per session+dir; a new session re-derives") {
    // unlike the dir-keyed geometry counts, the modulus must track the
    // DuckDB oracle's fresh COUNT(*): within one session the memo keeps
    // the gate consistent across the twin queries of a run, but after an
    // in-JVM corpus rewrite a NEW session (a new verify run) must derive
    // the fresh modulus — a process-global memo would gate a stale
    // subset against a fresh oracle and fail the twin spuriously
    val d = mkCorpus(6000, 1)
    assert(DedupOps.exactTwinModulus(spark, d) === 3L)
    spark.range(2000).toDF("vec_id")
      .write.mode("overwrite").parquet(s"$d/embeddings.parquet")
    // same session: memo still serves the count it gated with
    assert(DedupOps.exactTwinModulus(spark, d) === 3L)
    // new session over the same context: fresh count, fresh modulus
    assert(DedupOps.exactTwinModulus(spark.newSession(), d) === 1L)
  }
}
