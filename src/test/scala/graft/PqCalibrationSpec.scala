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
}
