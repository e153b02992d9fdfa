package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.expressions.{BoundReference, Literal}
import org.apache.spark.sql.types.{ArrayType, DoubleType}

import graft.functions.{CentroidPruning, VectorExprs}

/** Bit-identity proof for the shape-gated pruned assignment kernel
  * ([[VectorExprs.PrunedNearestCentroids]] /
  * [[CentroidPruning.PrunedScan]]) against the plain
  * [[VectorExprs.NearestCentroids]] — the round-15 rejection's retry
  * precondition. The pruned expression is constructed DIRECTLY here
  * (bypassing the shape gate) so the proof covers matrices the gate
  * would decline, including the adversarial ones: near-uniform shells,
  * exact distance ties, duplicate centroids, non-finite distances, null
  * elements, and the all-non-finite fallback fill.
  */
class PrunedCentroidsSpec extends SparkSpec {

  private def plainEval(cents: Array[Array[Double]], m: Int,
      v: Array[java.lang.Double]): Seq[Int] = {
    val e = VectorExprs.NearestCentroids(
      Literal.create(v.map(x => if (x == null) null
          else (x.doubleValue(): java.lang.Double)).toSeq,
        ArrayType(DoubleType, containsNull = true)), cents, m)
    Option(e.eval(null))
      .map(_.asInstanceOf[ArrayData].toIntArray().toSeq).getOrElse(null)
  }

  private def prunedEval(cents: Array[Array[Double]], m: Int,
      v: Array[java.lang.Double]): Seq[Int] = {
    val groups = forceGroups(cents)
    val e = VectorExprs.PrunedNearestCentroids(
      Literal.create(v.map(x => if (x == null) null
          else (x.doubleValue(): java.lang.Double)).toSeq,
        ArrayType(DoubleType, containsNull = true)), cents, m, groups)
    Option(e.eval(null))
      .map(_.asInstanceOf[ArrayData].toIntArray().toSeq).getOrElse(null)
  }

  /** Build the coarse grouping exactly as the factory would, but without
    * the gate — reflection-free: re-run planFor with the MinK/gate
    * bypassed by constructing groups via a tiny k-means over the same
    * code path is not exposed, so use the private-free construction:
    * group via planFor when it fires, else a trivial one-group covering
    * structure (center = first centroid, radius = max distance), which
    * exercises the same scan code with pruning opportunities absent.
    */
  private def forceGroups(cents: Array[Array[Double]])
      : CentroidPruning.Groups =
    CentroidPruning.planFor(cents, 1).getOrElse {
      val center = cents(0).clone()
      var mx = 0.0
      cents.foreach { c =>
        var acc = 0.0
        var i = 0
        while (i < c.length && i < center.length) {
          val d = c(i) - center(i); acc += d * d; i += 1
        }
        val dd = math.sqrt(acc)
        if (dd > mx) mx = dd
      }
      val mdist = cents.map { c =>
        var acc = 0.0
        var i = 0
        while (i < c.length && i < center.length) {
          val d = c(i) - center(i); acc += d * d; i += 1
        }
        math.sqrt(acc)
      }
      new CentroidPruning.Groups(Array(center),
        Array(mx * (1.0 + 1e-6) + 1e-12), Array(cents.indices.toArray),
        Array(mdist))
    }

  /** Clustered groups helper for the multi-group paths: split ids into
    * c chunks around seeded centers — a REAL multi-group structure with
    * honest radii, independent of the gate.
    */
  private def clusteredGroups(cents: Array[Array[Double]], nGroups: Int)
      : CentroidPruning.Groups = {
    val k = cents.length
    val assign = Array.tabulate(k)(i => i % nGroups)
    val dim = cents(0).length
    val centers = Array.tabulate(nGroups) { gj =>
      val mem = (0 until k).filter(assign(_) == gj)
      val s = new Array[Double](dim)
      mem.foreach { c =>
        var i = 0
        while (i < dim) { s(i) += cents(c)(i); i += 1 }
      }
      s.map(_ / mem.size)
    }
    val radii = Array.tabulate(nGroups) { gj =>
      val mem = (0 until k).filter(assign(_) == gj)
      var mx = 0.0
      mem.foreach { c =>
        var acc = 0.0
        var i = 0
        while (i < dim) {
          val d = cents(c)(i) - centers(gj)(i); acc += d * d; i += 1
        }
        val dd = math.sqrt(acc)
        if (dd > mx) mx = dd
      }
      mx * (1.0 + 1e-6) + 1e-12
    }
    val members = Array.tabulate(nGroups)(gj =>
      (0 until k).filter(assign(_) == gj).toArray)
    val memberDist = Array.tabulate(nGroups) { gj =>
      members(gj).map { c =>
        var acc = 0.0
        var i = 0
        while (i < dim) {
          val d = cents(c)(i) - centers(gj)(i); acc += d * d; i += 1
        }
        math.sqrt(acc)
      }
    }
    new CentroidPruning.Groups(centers, radii, members, memberDist)
  }

  private def prunedEvalWith(groups: CentroidPruning.Groups,
      cents: Array[Array[Double]], m: Int, v: Array[Double]): Seq[Int] = {
    val e = VectorExprs.PrunedNearestCentroids(
      Literal.create(v.toSeq, ArrayType(DoubleType, containsNull = true)),
      cents, m, groups)
    Option(e.eval(null))
      .map(_.asInstanceOf[ArrayData].toIntArray().toSeq).getOrElse(null)
  }

  private def plainEvalD(cents: Array[Array[Double]], m: Int,
      v: Array[Double]): Seq[Int] = {
    val e = VectorExprs.NearestCentroids(
      Literal.create(v.toSeq, ArrayType(DoubleType, containsNull = true)),
      cents, m)
    Option(e.eval(null))
      .map(_.asInstanceOf[ArrayData].toIntArray().toSeq).getOrElse(null)
  }

  test("pruned == plain on clustered matrices (the activation shape), " +
      "property-style") {
    val rnd = new scala.util.Random(4216)
    for (trial <- 0 until 40) {
      val dim = 8 + rnd.nextInt(16)
      val nClusters = 3 + rnd.nextInt(6)
      val k = 40 + rnd.nextInt(80)
      val clusterCenters = Array.fill(nClusters)(
        Array.fill(dim)(rnd.nextGaussian() * 4.0))
      val cents = Array.tabulate(k)(i => {
        val c = clusterCenters(i % nClusters)
        c.map(_ + rnd.nextGaussian() * 0.05)
      })
      val groups = clusteredGroups(cents, nClusters)
      val m = 1 + rnd.nextInt(math.min(8, k))
      for (_ <- 0 until 20) {
        val v =
          if (rnd.nextBoolean())
            clusterCenters(rnd.nextInt(nClusters))
              .map(_ + rnd.nextGaussian() * 0.1)
          else Array.fill(dim)(rnd.nextGaussian() * 4.0)
        assert(prunedEvalWith(groups, cents, m, v) ==
          plainEvalD(cents, m, v), s"trial $trial")
      }
    }
  }

  test("pruned == plain on ties, duplicate centroids and uniform shells") {
    val rnd = new scala.util.Random(991)
    for (trial <- 0 until 30) {
      val dim = 4 + rnd.nextInt(8)
      val kBase = 20 + rnd.nextInt(40)
      // quantized coordinates force exact distance ties; duplicates are
      // injected wholesale
      val base = Array.fill(kBase)(
        Array.fill(dim)((rnd.nextInt(5) - 2).toDouble))
      val cents = base ++ Array.fill(8)(base(rnd.nextInt(kBase)).clone())
      val groups = clusteredGroups(cents, 1 + rnd.nextInt(5))
      val m = 1 + rnd.nextInt(math.min(8, cents.length))
      for (_ <- 0 until 20) {
        val v = Array.fill(dim)((rnd.nextInt(5) - 2).toDouble)
        assert(prunedEvalWith(groups, cents, m, v) ==
          plainEvalD(cents, m, v), s"trial $trial")
      }
    }
  }

  test("pruned == plain on non-finite inputs and the fallback fill") {
    val cents = Array(
      Array(0.0, 0.0), Array(1.0, 0.0), Array(0.0, 1.0), Array(3.0, 4.0))
    val groups = clusteredGroups(cents, 2)
    val cases = Seq(
      Array(Double.NaN, 0.0),                       // all distances NaN
      Array(Double.PositiveInfinity, 0.0),          // all distances inf/nan
      Array(1e308, 1e308),                          // overflow to inf
      Array(0.5, 0.5))                              // plain finite
    for (v <- cases; m <- 1 to 4) {
      assert(prunedEvalWith(groups, cents, m, v) == plainEvalD(cents, m, v),
        s"v=${v.toSeq} m=$m")
    }
    // a matrix with a non-finite CENTROID: its distance is inf/nan for
    // every query — never selected, filled by id order
    val cents2 = Array(
      Array(Double.PositiveInfinity, 0.0), Array(1.0, 0.0), Array(0.0, 1.0))
    val groups2 = clusteredGroups(cents2, 1)
    for (m <- 1 to 3) {
      val v = Array(0.9, 0.1)
      assert(prunedEvalWith(groups2, cents2, m, v) ==
        plainEvalD(cents2, m, v), s"m=$m")
    }
  }

  test("pruned null semantics: null element and length mismatch") {
    val cents = Array(Array(0.0, 0.0), Array(1.0, 1.0))
    val m = 1
    assert(prunedEval(cents, m,
      Array[java.lang.Double](1.0, null)) ==
      plainEval(cents, m, Array[java.lang.Double](1.0, null)))
    assert(prunedEval(cents, m, Array[java.lang.Double](1.0)) ==
      plainEval(cents, m, Array[java.lang.Double](1.0)))
    assert(prunedEval(cents, m,
      Array[java.lang.Double](1.0, 2.0, 3.0)) ==
      plainEval(cents, m, Array[java.lang.Double](1.0, 2.0, 3.0)))
  }

  test("the shape gate activates on clustered structure, declines the " +
      "near-uniform shell, and the codegen path agrees with plain " +
      "end-to-end") {
    val rnd = new scala.util.Random(77)
    val dim = 16
    val k = 300 // past MinCentroidsForPruning
    // clustered: 6 tight clusters far apart
    val cc = Array.fill(6)(Array.fill(dim)(rnd.nextGaussian() * 5.0))
    val clustered = Array.tabulate(k)(i =>
      cc(i % 6).map(_ + rnd.nextGaussian() * 0.02))
    assert(CentroidPruning.planFor(clustered, 4).isDefined,
      "gate must activate on separated clusters")
    // near-uniform unit shell: concentration of measure — gate declines
    val uniform = Array.tabulate(k) { _ =>
      val v = Array.fill(dim)(rnd.nextGaussian())
      val n = math.sqrt(v.map(x => x * x).sum)
      v.map(_ / n)
    }
    assert(CentroidPruning.planFor(uniform, 4).isEmpty,
      "gate must decline the rotated near-uniform shape")

    // end-to-end through DataFrame codegen: the gated factory picks the
    // pruned kernel for the clustered matrix; its output must equal the
    // plain expression's on real rows
    import spark.implicits._
    val vecs = (0 until 200).map { i =>
      (i.toLong,
        cc(i % 6).map(_ + (rnd.nextGaussian() * 0.5)).toSeq)
    }.toDF("id", "vec")
    val centsSeq = clustered.map(_.toSeq).toSeq
    val both = vecs.select(col("id"),
      VectorExprs.nearestCentroids(col("vec"), centsSeq, 4).as("gated"),
      org.apache.spark.sql.graft.Bridge.column(
        VectorExprs.NearestCentroids(
          org.apache.spark.sql.graft.Bridge.expression(col("vec")),
          clustered, 4)).as("plain"))
      .collect()
    assert(both.nonEmpty)
    both.foreach { r =>
      assert(r.getSeq[Int](1) == r.getSeq[Int](2), s"id=${r.getLong(0)}")
    }
    // and the gated factory really did pick the pruned form (plan text)
    val plan = vecs.select(VectorExprs.nearestCentroids(col("vec"),
      centsSeq, 4)).queryExecution.analyzed.toString()
    assert(plan.contains("nearest_centroids_pruned"),
      s"expected the pruned kernel in the plan, got: $plan")
  }
}
