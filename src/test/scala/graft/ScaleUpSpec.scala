package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.tools.ScaleUp

/** Pins the per-copy bijection families the scale rehearsals rest on.
  * The decade-rehearsal methodology (NOTES, bench/rehearsal_*) measures
  * "10×/100× data at the SAME duplicate density": that claim is exactly
  * the distinctness + bounded-agreement properties asserted here — a
  * repeated text permutation clones a whole copy (dup-rate ×factor), a
  * repeated vector isometry clones every embedding direction (cosine /
  * semantic dup-rate inflation). Formula changes here must change this
  * spec consciously.
  */
class ScaleUpSpec extends AnyFunSuite {
  private val lower = "abcdefghijklmnopqrstuvwxyz"

  test("affine family: 312 distinct permutations, k<26 are the rotations") {
    val all = (0 until 312).map(k => ScaleUp.affine(lower, k))
    assert(all.distinct.size === 312)
    // each is a true permutation of the alphabet
    all.foreach(p => assert(p.sorted === lower))
    // backward compatibility: k < 26 is the plain rotation by k, k=0 the
    // identity — pre-extension corpora (the sf1 rehearsal fixtures)
    // regenerate byte-identically
    (0 until 26).foreach { k =>
      assert(ScaleUp.affine(lower, k) === lower.drop(k) + lower.take(k))
    }
  }

  test("affine family: two distinct maps agree on at most 2 letters") {
    // the cross-copy shingle-overlap bound: a 5-gram survives between two
    // copies only where the permutations AGREE, and affine maps over Z26
    // agree on ≤ gcd(a1−a2, 26) ≤ 2 positions — checked exhaustively
    val all = (0 until 312).map(k => ScaleUp.affine(lower, k))
    for (i <- all.indices; j <- (i + 1) until all.size) {
      val agree = (0 until 26).count(p => all(i)(p) == all(j)(p))
      assert(agree <= 2,
        s"maps $i and $j agree on $agree letters — cross-copy shingle " +
          "overlap is no longer negligible")
    }
  }

  test("dihedral family: 2·dim distinct isometries, k<dim are the rotations") {
    val dim = 64
    val maps = (0 until 2 * dim).map { k =>
      (0 until dim).map(ScaleUp.dihedralIndex(dim, k)).toVector
    }
    assert(maps.distinct.size === 2 * dim)
    // each is a permutation of the index space (norm-preserving reorder)
    maps.foreach(m => assert(m.sorted === (0 until dim).toVector))
    // k < dim reproduces the historical pure rotation: target p reads
    // source (p+k) mod dim
    (0 until dim).foreach { k =>
      assert(maps(k) === (0 until dim).map(p => (p + k) % dim).toVector)
    }
    // the pure-rotation trap the reversal exists to kill: at k = dim a
    // rotation-only family would repeat the identity (copies k and k+dim
    // identical vectors); the dihedral element there is the reversal
    assert(maps(dim) === (0 until dim).map(p => dim - 1 - p).toVector)
  }

  test("dihedralIndex matches the slice/reverse column expression shape") {
    // the column expr builds: base = (k≥dim ? reverse(v) : v), then
    // concat(slice(base, r+1, dim−r), slice(base, 1, r)) with r = k mod
    // dim — i.e. target p reads base[(p+r) mod dim]. Replay that
    // construction directly on a small vector and compare
    val dim = 8
    val v = (0 until dim).map(i => s"e$i")
    for (k <- 0 until 2 * dim) {
      val base = if (k >= dim) v.reverse else v
      val r = k % dim
      val viaExprShape = base.drop(r) ++ base.take(r)
      val viaIndex = (0 until dim).map(p => v(ScaleUp.dihedralIndex(dim, k)(p)))
      assert(viaIndex === viaExprShape, s"k=$k")
    }
  }

  test("chaining guard: a marked ScaleUp output refuses to be a source") {
    // the trap this kills cost round 10 a 3x dedup mis-measurement:
    // sf0.1 -> sf1 -> sf10 chained two affine permutations, and distinct
    // (k1,k2) pairs composed into the SAME map = duplicate cliques
    val dir = java.nio.file.Files.createTempDirectory("graft-scaleup-")
    java.nio.file.Files.write(
      dir.resolve("_GRAFT_SCALEUP"),
      """{"src": "/root/testdata/sf0.1", "factor": 10, "mode": "full"}"""
        .getBytes("UTF-8"))
    val e = intercept[IllegalArgumentException] {
      ScaleUp.requireNotChained(dir.toString)
    }
    // the error must NAME the original corpus so the fix is in the message
    assert(e.getMessage.contains("/root/testdata/sf0.1"))
    assert(e.getMessage.contains("ORIGINAL"))
  }

  test("chaining guard: an unmarked (original) source passes") {
    val dir = java.nio.file.Files.createTempDirectory("graft-scaleup-orig-")
    ScaleUp.requireNotChained(dir.toString) // must not throw
  }
}
