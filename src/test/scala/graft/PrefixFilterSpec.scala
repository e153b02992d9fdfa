package graft

import org.apache.spark.sql.functions._

import graft.operators.DedupOps

/** Exactness pin for the r16 verify-join broadcast: forcing the
  * budget-bounded doc-set side of [[DedupOps]]' Jaccard verify join to
  * broadcast (and the prefix-filter candidate generation feeding it)
  * must change NOTHING about which pairs the verified pipelines emit.
  * (A PPJoin positional filter was also tried this round and REJECTED
  * on measurement — no end-to-end gain at sf1; this spec survives as
  * the randomized brute-force pin on the candidate+verify kernel.)
  * The property is checked against brute-force all-pairs
  * Jaccard (round(J,4) ≥ t — the engine's published criterion) on
  * randomized synthetic doc sets engineered for boundary trouble:
  * skewed sizes, heavy shared grams, near-threshold pairs, duplicate
  * docs, and sizes placed exactly at the length-filter boundary.
  */
class PrefixFilterSpec extends SparkSpec {
  import spark.implicits._

  /** Deterministic pseudo-random doc sets: grams drawn from a small
    * universe so overlaps land densely around the thresholds.
    */
  private def corpusOf(seed: Int, nDocs: Int, uni: Int): Seq[(Long, Seq[Long])] = {
    val rnd = new scala.util.Random(seed)
    val docs = scala.collection.mutable.ArrayBuffer.empty[(Long, Seq[Long])]
    (0L until nDocs).foreach { i =>
      val gs: Seq[Long] =
        if (i > 0 && rnd.nextInt(5) == 0) {
          // near-copy of a random earlier doc: drop one gram, add a fresh
          // one — J lands one step below 1.0, densely near thresholds
          val prev = docs(rnd.nextInt(i.toInt))._2
          ((prev.toSet - prev.head) + (uni + i)).toSeq.sorted
        } else {
          val sz = 4 + rnd.nextInt(21)
          val s = scala.collection.mutable.SortedSet.empty[Long]
          while (s.size < sz) s += rnd.nextInt(uni).toLong
          s.toSeq
        }
      docs += ((i, gs))
    }
    docs.toSeq
  }

  private def bruteForce(docs: Seq[(Long, Seq[Long])], t: Double)
      : Set[(Long, Long)] = {
    val m = docs.toMap
    val ids = docs.map(_._1).sorted
    (for {
      a <- ids; b <- ids; if a < b
      c = m(a).toSet.intersect(m(b).toSet).size
      j = BigDecimal(c.toDouble / (m(a).size + m(b).size - c))
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      if j >= t
    } yield (a, b)).toSet
  }

  for (t <- Seq(0.5, 0.8); seed <- Seq(7, 41)) {
    test(s"prefix candidates keep every round(J,4) >= $t pair and the " +
        s"broadcast verify emits exactly the truth (seed $seed)") {
      val docs = corpusOf(seed, 160, 60)
      val df = docs.toDF("doc_id", "gs")
      val posts = df.select(col("doc_id"), explode(col("gs")).as("g"))
      val cand = DedupOps.prefixCandidates(posts, t)
        .select($"doc_a", $"doc_b").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val truth = bruteForce(docs, t)
      assert(truth.nonEmpty, "degenerate corpus: no qualifying pairs")
      assert(truth.subsetOf(cand),
        s"prefix filter lost true pairs: ${truth -- cand}")
      // and the verified output (broadcast path) is EXACTLY the truth
      val verified = DedupOps.probeVerify(
          DedupOps.prefixCandidates(posts, t), df, t)
        .select($"doc_a", $"doc_b").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(verified === truth)
    }
  }

  test("incremental candidates cover every truth pair touching the " +
      "batch") {
    val docs = corpusOf(13, 160, 60)
    val df = docs.toDF("doc_id", "gs")
    val posts = df.select(col("doc_id"), explode(col("gs")).as("g"))
    val isNew = (id: org.apache.spark.sql.Column) => pmod(id, lit(7)) === 0
    val inc = DedupOps.incrementalCandidates(posts, 0.5, isNew)
      .select($"doc_a", $"doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val truthTouching = bruteForce(docs, 0.5)
      .filter { case (a, b) => a % 7 == 0 || b % 7 == 0 }
    assert(truthTouching.nonEmpty)
    assert(truthTouching.subsetOf(inc),
      s"incremental candidates lost: ${truthTouching -- inc}")
    // and stays a subset of the full candidate set (the ScaleSpec
    // containment, re-pinned here on the adversarial corpus)
    val full = DedupOps.prefixCandidates(posts, 0.5)
      .select($"doc_a", $"doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(inc.subsetOf(full))
  }
}
