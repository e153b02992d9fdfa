package graft

import graft.operators.Pq

/** Calibration-derived PQ shortlist width ([[Pq.shortlistWidth]]): the
  * PqRecallSweep artifact drives the default, an explicit conf always
  * wins, and a calibration that cannot reach the floor throws instead of
  * silently falling back — the semanticProbes-calibration contract
  * applied to its sibling knob.
  */
class PqCalibrationSpec extends SparkSpec {

  // the round-10 measured worst-case shape (sf10 dihedral near-uniform),
  // verbatim shape of the artifact PqRecallSweep writes
  private def writeArtifact(): String = {
    val p = java.nio.file.Files
      .createTempDirectory("graft-pqcal-").resolve("pq_recall.json")
    java.nio.file.Files.write(p,
      """{"metric": "pq_recall_at_20_vs_shortlist",
        | "sweep": [
        |  {"shortlist": 200, "recall": 0.65},
        |  {"shortlist": 1000, "recall": 0.95},
        |  {"shortlist": 4000, "recall": 0.95},
        |  {"shortlist": 16000, "recall": 1.0}]}
        |""".stripMargin.getBytes("UTF-8"))
    p.toString
  }

  test("no confs -> the static default") {
    assert(Pq.shortlistWidth(spark.newSession()) === Pq.Shortlist)
  }

  test("calibration picks the SMALLEST width clearing the floor") {
    val art = writeArtifact()
    val s = spark.newSession()
    s.conf.set("spark.graft.pq.shortlistCalibration", art)
    // default floor 0.9: 1000 is the knee (200 misses at 0.65)
    assert(Pq.shortlistWidth(s) === 1000)
    // a lower floor admits the narrowest width
    s.conf.set("spark.graft.pq.recallFloor", "0.5")
    assert(Pq.shortlistWidth(s) === 200)
    // a tighter floor moves past the 0.95 plateau to the 1.0 point
    s.conf.set("spark.graft.pq.recallFloor", "0.99")
    assert(Pq.shortlistWidth(s) === 16000)
  }

  test("an explicit shortlist wins over the calibration") {
    val art = writeArtifact()
    val s = spark.newSession()
    s.conf.set("spark.graft.pq.shortlistCalibration", art)
    s.conf.set("spark.graft.pq.shortlist", "777")
    assert(Pq.shortlistWidth(s) === 777)
  }

  test("an unreachable floor throws a named error, never a silent fallback") {
    val art = writeArtifact()
    val s = spark.newSession()
    s.conf.set("spark.graft.pq.shortlistCalibration", art)
    s.conf.set("spark.graft.pq.recallFloor", "1.01")
    val e = intercept[IllegalArgumentException] { Pq.shortlistWidth(s) }
    assert(e.getMessage.contains("re-sweep"))
  }

  test("a mis-pointed calibration path throws instead of defaulting") {
    val s = spark.newSession()
    s.conf.set("spark.graft.pq.shortlistCalibration",
      "/nonexistent/pq_recall.json")
    intercept[Exception] { Pq.shortlistWidth(s) }
  }

  // ---- round-14 m-selection: the artifact's measured chosen_m drives
  // the build geometry; legacy artifacts (no chosen_m) keep the default

  private def writeArtifactWithM(m: Int): String = {
    val p = java.nio.file.Files
      .createTempDirectory("graft-pqcal-m-").resolve("pq_recall.json")
    java.nio.file.Files.write(p,
      s"""{"metric": "pq_recall_at_20_vs_shortlist",
         | "chosen_m": $m, "chosen_width": 1000,
         | "target_fraction": 0.005,
         | "sweep": [
         |  {"shortlist": 200, "recall": 0.65},
         |  {"shortlist": 1000, "recall": 0.95}]}
         |""".stripMargin.getBytes("UTF-8"))
    p.toString
  }

  test("the artifact's chosen_m drives the geometry; explicit m wins; legacy artifacts default") {
    val s = spark.newSession()
    s.conf.set("spark.graft.pq.shortlistCalibration", writeArtifactWithM(8))
    assert(Pq.subspacesOf(s, 64) === 8,
      "calibrated chosen_m must drive the subspace cap")
    assert(Pq.shortlistWidth(s) === 1000,
      "the chosen m's sweep must still drive the width")
    s.conf.set("spark.graft.pq.m", "16")
    assert(Pq.subspacesOf(s, 64) === 16, "an explicit m must win")
    // a pre-round-14 artifact has no chosen_m: default geometry
    val legacy = spark.newSession()
    legacy.conf.set("spark.graft.pq.shortlistCalibration", writeArtifact())
    assert(Pq.subspacesOf(legacy, 64) === Pq.SubspacesMax)
  }

  test("corpus-aware m-selection: the projected shortlist bound drives the switchover") {
    // artifact swept at 2,000 vectors: m=8 knees at 200 (10% of corpus),
    // m=16 at 20 (1%) — the per_m table + n_vectors the round-14 sweep
    // records
    val p = java.nio.file.Files
      .createTempDirectory("graft-pqcal-m-").resolve("pq_recall.json")
    java.nio.file.Files.write(p,
      """{"metric": "pq_recall_at_20_vs_shortlist",
        | "n_vectors": 2000,
        | "chosen_m": 8,
        | "per_m": [
        |  {"m": 8, "knee_width": 200, "sweep": [
        |    {"shortlist": 200, "recall": 0.95}]},
        |  {"m": 16, "knee_width": 20, "sweep": [
        |    {"shortlist": 20, "recall": 0.95},
        |    {"shortlist": 80, "recall": 1.0}]}],
        | "sweep": [{"shortlist": 200, "recall": 0.95}]}
        |""".stripMargin.getBytes("UTF-8"))
    val s = spark.newSession()
    s.conf.set("spark.graft.pq.shortlistCalibration", p.toString)
    // small serving corpus: m=8's projected knee (10% of 2,000 = 200)
    // fits the default 65,536 bound — the coarsest measured geometry
    // wins (cheapest at rest)
    assert(Pq.subspacesOf(s, 64, Some(2000L)) === 8,
      "coarse geometry must win while its projection fits the bound")
    // corpus grown 10,000x past the sweep: m=8 projects 10% of 20M =
    // 2M driver rows — over the bound; m=16 projects 200k... also over;
    // the FINEST swept geometry is the fallback
    assert(Pq.subspacesOf(s, 64, Some(20000000L)) === 16,
      "outgrown bound must fall back to the finest swept geometry")
    // a bound between the two projections picks the smallest fitting m
    val s2 = spark.newSession()
    s2.conf.set("spark.graft.pq.shortlistCalibration", p.toString)
    s2.conf.set("spark.graft.pq.maxShortlistRows", "500")
    // at n=20,000: m=8 projects 2,000 (> 500), m=16 projects 200 (fits)
    assert(Pq.subspacesOf(s2, 64, Some(20000L)) === 16,
      "the projected-bound switchover must pick the smallest fitting m")
    // no corpus-size signal -> the artifact's own chosen_m (legacy path)
    assert(Pq.subspacesOf(s2, 64) === 8)
    // the width follows the geometry actually serving: m=16's own sweep
    assert(Pq.shortlistWidth(s2, Some(16)) === 20,
      "width must read the serving geometry's own sweep")
    s2.conf.set("spark.graft.pq.recallFloor", "0.99")
    assert(Pq.shortlistWidth(s2, Some(16)) === 80)
  }

  test("gate floors hold at BOTH calibrated geometries (m=8 and m=16)") {
    // the m-selection only ever switches between measured geometries —
    // the serve contract (overlap floor + exact published sims) must be
    // green at each, so a calibration swap can never un-green a gate
    for (m <- Seq(8, 16)) {
      val s = spark.newSession()
      s.conf.set("spark.graft.pq.m", m.toString)
      val pq = SparkEntry.queries("sim_pq_topk_gate")(s, sf).collect()
      assert(pq.length === 1 && pq(0).getBoolean(1) && pq(0).getBoolean(2),
        s"sim_pq_topk_gate floors broke at m=$m")
      val comp = SparkEntry.queries("ann_ivfpq_gate")(s, sf).collect()
      assert(comp.length === 1 &&
        comp(0).getBoolean(1) && comp(0).getBoolean(2),
        s"ann_ivfpq_gate floors broke at m=$m")
    }
  }
}
