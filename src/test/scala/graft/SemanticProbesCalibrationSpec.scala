package graft

import graft.operators.DedupOps

/** Calibration-derived soft-probe width ([[DedupOps.semDedupProbesOf]]):
  * the RoutedCosineCheck artifact drives the default, an explicit conf
  * always wins, and a calibration that cannot reach the floors throws
  * instead of silently falling back.
  */
class SemanticProbesCalibrationSpec extends SparkSpec {

  // the round-9 boundary-corpus sweep, verbatim shape of the artifact
  // RoutedCosineCheck writes
  private def writeArtifact(): String = {
    val p = java.nio.file.Files
      .createTempDirectory("graft-cal-").resolve("routed.json")
    java.nio.file.Files.write(p,
      """{"fixture": "boundary",
        | "sweep": [
        |  {"probes": 1, "recall": 0.830, "near_threshold_recall": 0.009},
        |  {"probes": 3, "recall": 0.934, "near_threshold_recall": 0.338},
        |  {"probes": 5, "recall": 0.967, "near_threshold_recall": 0.643},
        |  {"probes": 7, "recall": 0.989, "near_threshold_recall": 0.885}]}
        |""".stripMargin.getBytes("UTF-8"))
    p.toString
  }

  test("no confs -> the static default") {
    assert(DedupOps.semDedupProbesOf(spark.newSession()) ===
      DedupOps.SemDedupProbes)
  }

  test("calibration picks the SMALLEST width clearing the floors") {
    val art = writeArtifact()
    val s = spark.newSession()
    s.conf.set("spark.graft.dedup.semanticProbesCalibration", art)
    // default floors (0.9 overall, near unconstrained): 3 is the knee
    assert(DedupOps.semDedupProbesOf(s) === 3)
    // demand near-threshold recall too: the knee moves to 5, then 7
    s.conf.set("spark.graft.dedup.semanticNearRecallFloor", "0.6")
    assert(DedupOps.semDedupProbesOf(s) === 5)
    s.conf.set("spark.graft.dedup.semanticNearRecallFloor", "0.8")
    assert(DedupOps.semDedupProbesOf(s) === 7)
    // a tighter overall floor composes with the near floor
    s.conf.set("spark.graft.dedup.semanticRecallFloor", "0.98")
    s.conf.set("spark.graft.dedup.semanticNearRecallFloor", "0.0")
    assert(DedupOps.semDedupProbesOf(s) === 7)
  }

  test("an explicit semanticProbes wins over the calibration") {
    val art = writeArtifact()
    val s = spark.newSession()
    s.conf.set("spark.graft.dedup.semanticProbesCalibration", art)
    s.conf.set("spark.graft.dedup.semanticProbes", "11")
    assert(DedupOps.semDedupProbesOf(s) === 11)
  }

  test("unreachable floors throw a named error, never a silent fallback") {
    val art = writeArtifact()
    val s = spark.newSession()
    s.conf.set("spark.graft.dedup.semanticProbesCalibration", art)
    s.conf.set("spark.graft.dedup.semanticRecallFloor", "0.999")
    val e = intercept[IllegalArgumentException] {
      DedupOps.semDedupProbesOf(s)
    }
    assert(e.getMessage.contains("re-sweep"))
  }

  test("a mis-pointed calibration path throws instead of defaulting") {
    val s = spark.newSession()
    s.conf.set("spark.graft.dedup.semanticProbesCalibration",
      "/nonexistent/routed.json")
    intercept[Exception] { DedupOps.semDedupProbesOf(s) }
  }
}
