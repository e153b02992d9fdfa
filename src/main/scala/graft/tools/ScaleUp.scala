package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic corpus scaler for scale rehearsals: writes a `factor`×
  * copy of the events / documents / embeddings tables with key-perturbed
  * copies, so per-query scaling ratios can be measured one decade past
  * the largest generated testdata (the 100 TB claims should rest on more
  * than one measured decade).
  *
  * Usage: `runMain graft.tools.ScaleUp <srcDir> <dstDir> [factor]`
  * Scales every table: the TPC-H star is explode-multiplied
  * FK-CONSISTENTLY (every key column — customer/supplier/part/order
  * keys on both their home table and every referencing fact column —
  * gets the same per-copy stride, so each copy is a closed sub-star;
  * the nation/region dims stay fixed like real dimension tables, and
  * unstrided FK columns into them remain valid).
  *
  * Design: every copy k ∈ [0, factor) is a ROW-LOCAL projection of the
  * source row (explode + column arithmetic — no shuffle, no driver
  * state), with k=0 the identity so every original row survives
  * verbatim:
  *
  *  - events: ids get a copy stride (event_id + k·10¹², user_id +
  *    k·10⁹), so per-user row counts and the 5-type skew profile are
  *    PRESERVED while user cardinality grows 10× — the realistic growth
  *    shape for an event stream.
  *  - documents: copy k permutes the ALPHABET by the k-th affine map
  *    i → a·i+b mod 26 (bijective `translate`; k < 26 is the plain
  *    rotation by k), so each copy is an exactly isomorphic corpus —
  *    within-copy Jaccard structure is IDENTICAL to the original (the
  *    dedup pipelines see 10× data at the same pair density), while
  *    cross-copy and copy-vs-original shingles share almost nothing
  *    (only windows of spaces/digits survive the rotation). Two wrong
  *    alternatives, both measured: cloning text multiplies the DUP RATE
  *    (a 10-clique per doc — a different workload, not more data), and
  *    a shared per-copy token TAG injects high-df shingles spanning the
  *    tag boundary, inflating same-copy similarity until LSH candidate
  *    verification explodes (measured 118× wall at 10× data).
  *  - embeddings: copy k applies the k-th dihedral coordinate isometry
  *    (rotate by k mod dim; reversed first for k ≥ dim) —
  *    norm-preserving, direction-changing — so the corpus stays
  *    near-uniform on the sphere (the documented IVF worst case) at any
  *    factor ≤ 2·dim; labels stride by copy so label-block sizes stay
  *    constant (more shards, same shard size — the blocked-cosine
  *    scaling model).
  */
object ScaleUp {
  /** Copy k's letter bijection: the k-th affine permutation i → a·i+b
    * (mod 26) of alphabet string `a26`, enumerated b-fastest with the
    * multipliers ordered so a=1 comes first — k ∈ 0..25 is then exactly
    * the historical rotation by k (k=0 the identity), and any two
    * distinct affine maps agree on at most gcd(a1−a2, 26) ≤ 2 letters,
    * so cross-copy shingle overlap stays as negligible as it was for
    * pure rotations. 312 distinct permutations (12 valid multipliers ×
    * 26 offsets); ScaleUpSpec pins distinctness and the agreement bound.
    */
  private[graft] val Mults = Seq(1, 3, 5, 7, 9, 11, 15, 17, 19, 21, 23, 25)
  private[graft] def affine(a26: String, k: Int): String = {
    val (mul, off) = (Mults(k / 26), k % 26)
    (0 until 26).map(i => a26((mul * i + off) % 26)).mkString
  }

  /** Provenance marker every ScaleUp output carries. Chaining ScaleUp
    * over its own output is INVALID — affine permutations compose
    * (σ_k2∘σ_k1 collisions hand distinct copy pairs IDENTICAL text, a
    * duplicate clique per doc), and the round-10 session measured the
    * consequence as a 3× dedup slowdown before a re-read caught it.
    * The scaladoc rule is now a guard: [[requireNotChained]] refuses a
    * marked source with an error naming the ORIGINAL corpus to scale
    * from instead.
    */
  private[graft] val ProvenanceMarker = "_GRAFT_SCALEUP"

  /** Throws when `srcDir` is itself a ScaleUp output (carries the
    * provenance marker), naming the original source recorded in it.
    * Direct re-scaling of an original corpus at a larger factor is the
    * sanctioned path and passes untouched.
    */
  private[graft] def requireNotChained(srcDir: String): Unit = {
    val m = java.nio.file.Paths.get(srcDir, ProvenanceMarker)
    if (java.nio.file.Files.exists(m)) {
      val prov = new String(java.nio.file.Files.readAllBytes(m),
        java.nio.charset.StandardCharsets.UTF_8).trim
      throw new IllegalArgumentException(
        s"$srcDir is already a ScaleUp output ($prov) — chaining ScaleUp " +
          "composes the per-copy permutations and collides distinct copy " +
          "pairs into duplicate cliques (measured: 3x dedup slowdown). " +
          "Scale the ORIGINAL corpus named above with a larger factor " +
          "instead.")
    }
  }

  private def writeProvenance(dst: String, src: String, factor: Int,
      mode: String): Unit =
    java.nio.file.Files.write(
      java.nio.file.Paths.get(dst, ProvenanceMarker),
      (s"""{"src": "$src", "factor": $factor, "mode": "$mode"}""" + "\n")
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))

  /** Copy k's vector isometry on a `dim`-dimensional index space: the
    * k-th element of the dihedral group — rotate by k mod dim, on the
    * REVERSED coordinate order for k ≥ dim. Returns the source index
    * each target position reads from (the spec-testable form of the
    * slice/reverse column expression in main). 2·dim distinct maps.
    */
  private[graft] def dihedralIndex(dim: Int, k: Int)(pos: Int): Int = {
    val r = k % dim
    val rotated = (pos + r) % dim
    if (k >= dim) dim - 1 - rotated else rotated
  }

  def main(args: Array[String]): Unit = {
    require(args.length >= 2,
      "usage: ScaleUp <srcDir> <dstDir> [factor] [events-only]")
    val src = args(0)
    val dst = args(1)
    val factor = if (args.length > 2) args(2).toInt else 10
    // events-only mode: the text/embedding tables are mathematically
    // capped (312 affine bijections, 2·dim dihedral isometries — beyond
    // them copies clone and the dup rate distorts), but the events
    // table scales by pure KEY OFFSETS with no such bound — so the CDC/
    // events surface can rehearse a THIRD decade (factor 1000) that the
    // document families cannot. Collision-freedom is checked against
    // the actual key ranges below.
    val eventsOnly = args.length > 3 && args(3) == "events-only"
    // refuse to scale a corpus that is itself a ScaleUp output — see
    // ProvenanceMarker (permutation composition = duplicate cliques)
    requireNotChained(src)
    // The per-copy text bijection family is the AFFINE permutation group
    // of the 26-letter alphabet, i → (a·i + b) mod 26 with gcd(a,26)=1:
    // 12 valid multipliers × 26 offsets = 312 distinct bijections, so a
    // factor beyond 312 would repeat a permutation and make some copy an
    // EXACT clone of another — the dup-rate distortion the bijection
    // scheme exists to avoid. (For k < 26 the map is a=1,b=k — exactly
    // the historical rotations, so smaller-factor corpora regenerate
    // byte-identically.) Composition is NOT closed under re-scaling: a
    // ScaleUp of a ScaleUp applies σ_k2∘σ_k1, and distinct (k1,k2) pairs
    // can compose to the SAME permutation of the same source doc —
    // identical cross-copy texts, a duplicate clique per doc. Always
    // scale from the ORIGINAL corpus with a larger factor instead.
    if (eventsOnly)
      require(factor >= 1 && factor <= 1000000,
        s"events-only factor must be in 1..1000000, got $factor")
    else
      require(factor >= 1 && factor <= 312,
        s"factor must be in 1..312, got $factor (affine letter " +
          "permutations repeat after 312)")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    if (eventsOnly) {
      // key offsets are collision-free iff base keys fit under the
      // per-copy strides — check the REAL ranges, not an assumption
      val mx = spark.read.parquet(s"$src/events.parquet")
        .agg(max(col("event_id")), max(col("user_id"))).first()
      require(!mx.isNullAt(0) && mx.getLong(0) < 1000000000000L &&
          mx.getLong(1) < 1000000000L,
        s"events-only scaling needs event_id < 1e12 and user_id < 1e9 " +
          s"in $src (got ${mx.get(0)}, ${mx.get(1)})")
      val ksE = expr(s"explode(sequence(0, ${factor - 1}))")
      val ev = spark.read.parquet(s"$src/events.parquet")
        .withColumn("k", ksE)
        .select(
          (col("event_id") + col("k") * lit(1000000000000L)).as("event_id"),
          col("ts"),
          (col("user_id") + col("k") * lit(1000000000L)).as("user_id"),
          col("event_type"), col("value"), col("props"))
      write(ev, s"$dst/events.parquet")
      // mark the partial corpus: Tables.table refuses non-events reads
      // against a marked dir with a NAMED error, instead of letting a
      // documents/embeddings consumer fail later on a context-free
      // missing-parquet path
      java.nio.file.Files.write(
        java.nio.file.Paths.get(dst, "_GRAFT_EVENTS_ONLY"),
        (s"events-only ScaleUp output (factor $factor from $src); " +
          "document/embedding tables were deliberately not scaled — " +
          "their bijection families cap at factor 312 / 2*dim\n")
          .getBytes(java.nio.charset.StandardCharsets.UTF_8))
      writeProvenance(dst, src, factor, "events-only")
      println(s"[scaleup] events-only: wrote $dst/events.parquet at " +
        s"factor $factor (markers _GRAFT_EVENTS_ONLY + _GRAFT_SCALEUP " +
        "written)")
      spark.stop()
      return
    }

    // validate the dim-dependent embeddings bound BEFORE any table is
    // written: a factor in (2·dim, 312] failing only at the embeddings
    // step would leave a partial (documents-but-no-embeddings)
    // destination corpus for a later consumer to trip over
    val embSrc = spark.read.parquet(s"$src/embeddings.parquet")
    // one bounded aggregate instead of a bare first(): an EMPTY source
    // must fail with a real message (first() would throw a context-free
    // NoSuchElementException before the factor bound could explain
    // anything), and a RAGGED corpus must fail loudly too — the k ≥ dim
    // reversal gate below uses this one driver-side dim while the
    // rotation maps per-row size(embedding), so mixed dims would
    // silently produce inconsistent isometries
    val dims = embSrc.agg(min(size(col("embedding"))).as("lo"),
      max(size(col("embedding"))).as("hi")).first()
    require(!dims.isNullAt(0),
      s"$src/embeddings.parquet is empty — cannot derive the vector dim " +
        "that bounds the dihedral isometry family")
    require(dims.getInt(0) == dims.getInt(1),
      s"ragged embedding dims in $src (${dims.getInt(0)}..${dims.getInt(1)}) " +
        "— the dihedral maps need one uniform dim")
    val dim = dims.getInt(0)
    require(factor <= 2 * dim,
      s"factor must be ≤ ${2 * dim} (dihedral isometries of a $dim-dim " +
        s"vector repeat after 2·dim), got $factor")

    val ks = expr(s"explode(sequence(0, ${factor - 1}))")

    // a full-mode run over a dst that previously held an events-only
    // corpus must clear the partial-corpus marker — all tables are
    // about to be written
    java.nio.file.Files.deleteIfExists(
      java.nio.file.Paths.get(dst, "_GRAFT_EVENTS_ONLY"))

    // events: ts is copied through unchanged in whatever encoding the
    // source carries (legacy nanos-long under the flag, or the current
    // timestamp[us]/NTZ) — Tables.events dispatches on the written
    // schema, so scaled copies load identically to the source
    val ev = spark.read.parquet(s"$src/events.parquet")
      .withColumn("k", ks)
      .select(
        (col("event_id") + col("k") * lit(1000000000000L)).as("event_id"),
        col("ts"),
        (col("user_id") + col("k") * lit(1000000000L)).as("user_id"),
        col("event_type"), col("value"), col("props"))
    write(ev, s"$dst/events.parquet")

    val lower = "abcdefghijklmnopqrstuvwxyz"
    val upper = lower.toUpperCase
    // copy k's letter bijection — see [[affine]] above
    val rotText = (1 until factor).foldLeft(col("text")) { (acc, k) =>
      when(col("k") === k,
        translate(col("text"), lower + upper,
          affine(lower, k) + affine(upper, k))).otherwise(acc)
    }
    val docs = spark.read.parquet(s"$src/documents.parquet")
      .withColumn("k", ks)
      .select(
        (col("doc_id") + col("k") * lit(1000000000000L)).as("doc_id"),
        rotText.as("text"), col("lang"), col("source"),
        // translate is length-preserving, so n_chars carries over
        col("n_chars"))
    write(docs, s"$dst/documents.parquet")

    // copy k's vector isometry: the k-th element of the DIHEDRAL group
    // on coordinate positions — rotate by k mod dim, on the REVERSED
    // vector for k ≥ dim — 2·dim distinct norm-preserving maps (the
    // pure rotations repeat at k = dim, which would hand copies k and
    // k+dim IDENTICAL vectors and inflate the semantic/cosine dup rate
    // the way a text-clone copy would). Reversal is an isometry, so the
    // corpus stays near-uniform on the sphere at any factor ≤ 2·dim.
    val emb = embSrc
      .withColumn("k", ks)
      .withColumn("base",
        when(col("k") >= lit(dim), reverse(col("embedding")))
          .otherwise(col("embedding")))
      .select(
        (col("vec_id") + col("k") * lit(1000000000000L)).as("vec_id"),
        // rotate by k mod dim: a factor above the vector dimension must
        // wrap, not feed slice() a negative length
        when(col("k") % size(col("base")) === 0, col("base"))
          .otherwise(concat(
            expr("slice(base, (k % size(base)) + 1, " +
              "size(base) - (k % size(base)))"),
            expr("slice(base, 1, k % size(base))")))
          .as("embedding"),
        (col("label") + col("k") * lit(100000)).cast("int").as("label"))
    write(emb, s"$dst/embeddings.parquet")

    // TPC-H star, FK-consistently: stride every entity key wherever it
    // appears (home table AND referencing facts); leave dims fixed
    val Stride = 1000000000000L
    def strided(table: String, keyCols: Seq[String]): DataFrame = {
      val df = spark.read.parquet(s"$src/$table.parquet").withColumn("k", ks)
      df.select(df.columns.filterNot(_ == "k").map { c =>
        if (keyCols.contains(c)) (col(c) + col("k") * Stride).as(c)
        else col(c)
      }.toIndexedSeq: _*)
    }
    write(strided("customer", Seq("c_custkey")), s"$dst/customer.parquet")
    write(strided("supplier", Seq("s_suppkey")), s"$dst/supplier.parquet")
    write(strided("part", Seq("p_partkey")), s"$dst/part.parquet")
    write(strided("orders", Seq("o_orderkey", "o_custkey")),
      s"$dst/orders.parquet")
    write(strided("lineitem", Seq("l_orderkey", "l_partkey", "l_suppkey")),
      s"$dst/lineitem.parquet")
    Seq("nation", "region").foreach { t =>
      write(spark.read.parquet(s"$src/$t.parquet"), s"$dst/$t.parquet")
    }

    writeProvenance(dst, src, factor, "full")
    println(s"[scaleup] wrote ${factor}x of all tables from $src to $dst " +
      "(nation/region dims copied fixed; provenance marker written)")
    spark.stop()
  }

  /** Write with ONE file per core instead of inheriting the source's
    * file count: the explode-based copy keeps the input partitioning,
    * so a factor-100 scale of a single-file table used to land 60 M
    * rows in 2 files — a ~300 MB scan that planned only ~3 input
    * slices on a 32-core box (measured: q05's star join 66 s min-of-3
    * on that layout). A fixture corpus must not smuggle a parallelism
    * handicap into every number measured on it. The repartition is a
    * round-robin of the copies — row order changes, which no consumer
    * observes (every registry query totally orders its output, and the
    * dedup/band geometries derive from counts, not order).
    */
  private def write(df: DataFrame, path: String): Unit =
    df.repartition(df.sparkSession.sparkContext.defaultParallelism)
      .write.mode("overwrite").parquet(path)
}
