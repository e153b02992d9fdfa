package graft

import org.apache.spark.sql.functions._

import graft.functions.VectorExprs
import graft.operators.SimilarityOps
import graft.sources.Tables

/** The custom codegen'd expressions (CosineSimilarity, PolyFingerprint):
  * bit-equality with their HOF reference formulations, null semantics, SQL
  * registration, and that they actually stay inside whole-stage codegen.
  */
class VectorExprsSpec extends SparkSpec {

  private def vecs = Tables.embeddings(spark, sf)
    .select(col("vec_id"),
      transform(col("embedding"), x => x.cast("double")).as("ev"))

  test("cosine_sim is bit-identical to the aggregate/zip_with formulation") {
    val q = vecs.filter(col("vec_id") === 0).select(col("ev").as("qv"))
    val both = vecs.crossJoin(broadcast(q))
      .select(col("vec_id"),
        VectorExprs.cosineSim(col("ev"), col("qv")).as("fused"),
        SimilarityOps.cosineHof(col("ev"), col("qv")).as("hof"))
      .collect()
    assert(both.nonEmpty)
    both.foreach { r =>
      // bit-identical, not approximately equal
      assert(java.lang.Double.doubleToLongBits(r.getDouble(1)) ==
        java.lang.Double.doubleToLongBits(r.getDouble(2)), r)
    }
  }

  test("dist2 is bit-identical to the aggregate/zip_with formulation") {
    val q = vecs.filter(col("vec_id") === 0).select(col("ev").as("qv"))
    val both = vecs.crossJoin(broadcast(q))
      .select(col("vec_id"),
        VectorExprs.dist2(col("ev"), col("qv")).as("fused"),
        aggregate(zip_with(col("ev"), col("qv"), (x, c) => (x - c) * (x - c)),
          lit(0.0), (acc, x) => acc + x).as("hof"))
      .collect()
    assert(both.nonEmpty)
    both.foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(1)) ==
        java.lang.Double.doubleToLongBits(r.getDouble(2)), r)
    }
  }

  test("poly_fingerprint == HOF rolling hash on every document + edges") {
    import graft.functions.{TextExprs, TextFeatures}
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"),
        TextExprs.polyFingerprint(col("text")).as("fused"),
        TextFeatures.rollingFingerprintHof(col("text")).as("hof"))
      .collect()
    assert(docs.nonEmpty)
    docs.foreach(r => assert(r.getLong(1) == r.getLong(2), r))
    // edges: empty string → 0 (matches ascii('')=0 fold), null → null,
    // multibyte code points step once per character
    import spark.implicits._
    val edge = Seq((1L, ""), (2L, null), (3L, "日本語 text"))
      .toDF("id", "text")
      .select(col("id"),
        TextExprs.polyFingerprint(col("text")).as("fused"),
        TextFeatures.rollingFingerprintHof(col("text")).as("hof"))
      .collect().sortBy(_.getLong(0))
    assert(edge(0).getLong(1) == 0L && edge(0).getLong(2) == 0L)
    assert(edge(1).isNullAt(1) && edge(1).isNullAt(2))
    assert(edge(2).getLong(1) == edge(2).getLong(2))
  }

  test("int8_quantize == HOF round(x/scale) incl. negative-half rounding") {
    import spark.implicits._
    import graft.operators.SimilarityOps
    // corpus parity
    val both = Tables.embeddings(spark, sf)
      .withColumn("ev", transform(col("embedding"), x => x.cast("double")))
      .withColumn("s8", SimilarityOps.int8Scale(col("ev")))
      .select(col("vec_id"),
        SimilarityOps.quantizeInt8(col("ev")).as("fused"),
        transform(col("ev"), x => round(x / col("s8")).cast("tinyint"))
          .as("hof"))
      .collect()
    assert(both.nonEmpty)
    both.foreach(r => assert(r.getSeq[Byte](1) == r.getSeq[Byte](2), r))
    // explicit negative-half case: -2.5/scale with scale chosen so a
    // quotient lands exactly on ±x.5 — HALF_UP must round away from zero
    val edge = Seq((1L, Seq(-2.5, 2.5, 127.0)))
      .toDF("id", "v")
      .select(SimilarityOps.quantizeInt8(col("v")).as("q"))
      .collect()(0).getSeq[Byte](0)
    // scale = 127/127 = 1.0 → codes are round(±2.5), round(127)
    assert(edge == Seq((-3).toByte, 3.toByte, 127.toByte), edge)
  }

  test("sorted_intersect_size == array_intersect size on random sorted sets") {
    import spark.implicits._
    import graft.functions.TextExprs
    val rnd = new scala.util.Random(42)
    val rows = (1 to 300).map { i =>
      def set() = rnd.shuffle((0 to 60).toList).take(rnd.nextInt(25))
        .map(x => s"t$x").distinct.sorted
      (i.toLong, set(), set())
    }
    val out = rows.toDF("id", "a", "b")
      .select($"id",
        TextExprs.sortedIntersectSize($"a", $"b").as("fused"),
        size(array_intersect($"a", $"b")).as("builtin"))
      .collect()
    out.foreach(r => assert(r.getInt(1) == r.getInt(2), r))
  }

  test("TopK aggregator == window top-k on random grouped data") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val rnd = new scala.util.Random(7)
    // duplicate sims across groups force the tie-break path
    val rows = (1 to 2000).map { i =>
      (rnd.nextInt(7).toLong, math.round(rnd.nextDouble() * 20) / 20.0,
        i.toLong)
    }
    val df = rows.toDF("qid", "sim", "vec_id")
    val viaAgg = df.groupBy($"qid")
      .agg(graft.functions.TopK.topK(5)($"sim", $"vec_id").as("top"))
      .select($"qid", posexplode($"top").as(Seq("p", "t")))
      .select($"qid", ($"p" + 1).cast("long").as("rk"),
        $"t.vec_id".as("vec_id"), $"t.sim".as("sim"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3))).toSet
    val w = Window.partitionBy($"qid").orderBy($"sim".desc, $"vec_id")
    val viaWin = df.withColumn("rk", row_number().over(w).cast("long"))
      .filter($"rk" <= 5)
      .select($"qid", $"rk", $"vec_id", $"sim")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3))).toSet
    assert(viaAgg === viaWin)
  }

  test("char_class_counts == the regexp_count formulations (adversarial unicode)") {
    import spark.implicits._
    val rnd = new scala.util.Random(13)
    // code-point soup: ASCII letters/digits/punct, every Java \s char
    // (incl. vertical tab ), multibyte BMP chars, and SUPPLEMENTARY
    // chars (surrogate pairs — must count once, not twice)
    val alphabet: IndexedSeq[String] =
      ('a' to 'z').map(_.toString) ++ ('A' to 'Z').map(_.toString) ++
        ('0' to '9').map(_.toString) ++
        Seq(" ", "\t", "\n", "\u000B", "\f", "\r",
          ".", ",", "!", "-", "_", "é", "ü", "中", "文",
          new String(Character.toChars(0x1F600)),   // 😀
          new String(Character.toChars(0x10348)))   // 𐍈
    val rows = (1 to 400).map { i =>
      (i.toLong,
        List.fill(rnd.nextInt(60))(alphabet(rnd.nextInt(alphabet.length)))
          .mkString)
    } :+ (0L, "")
    val out = rows.toDF("id", "text")
      .select($"id",
        graft.functions.TextExprs.charClassCounts($"text").as("cc"),
        regexp_count($"text", lit("[A-Za-z]")).as("ra"),
        regexp_count($"text", lit("[^A-Za-z0-9\\s]")).as("rp"),
        regexp_count($"text", lit("[A-Za-z]+")).as("rw"),
        regexp_count($"text", lit("[0-9]+")).as("rn"))
      .collect()
    out.foreach { r =>
      val cc = r.getStruct(1)
      assert(cc.getInt(0) == r.getInt(2), s"n_alpha: $r")
      assert(cc.getInt(1) == r.getInt(3), s"n_punct: $r")
      assert(cc.getInt(2) == r.getInt(4), s"alpha_runs: $r")
      assert(cc.getInt(3) == r.getInt(5), s"digit_runs: $r")
    }
  }

  test("shingle_hashes mirrors charShinglesAll windows (distinct counts, edges)") {
    import spark.implicits._
    import graft.functions.{TextExprs, TextFeatures}
    val rnd = new scala.util.Random(19)
    val alphabet = "abcde 中文é" + new String(Character.toChars(0x1F600))
    val rows = (1 to 300).map { i =>
      val cps = List.fill(rnd.nextInt(30))(
        alphabet.codePointAt(rnd.nextInt(alphabet.length) match {
          case j if Character.isLowSurrogate(alphabet.charAt(j)) => j - 1
          case j => j
        }))
      (i.toLong, cps.map(cp => new String(Character.toChars(cp))).mkString)
    } ++ Seq((0L, ""), (1001L, "ab"), (1002L, "abcd"), (1003L, "abcde"))
    val out = rows.toDF("id", "text")
      .select($"id",
        size(array_distinct(TextExprs.shingleHashes($"text", 5))).as("nh"),
        size(array_distinct(TextFeatures.charShinglesAll($"text", 5))).as("ns"),
        size(TextExprs.shingleHashes($"text", 5)).as("tw"),
        size(TextFeatures.charShinglesAll($"text", 5)).as("ts"))
      .collect()
    // same window count, and (collision-free at this scale) the same
    // number of DISTINCT shingles — the set the posting list carries
    out.foreach { r =>
      assert(r.getInt(3) == r.getInt(4), s"window count: $r")
      assert(r.getInt(1) == r.getInt(2), s"distinct count: $r")
    }
  }

  test("token_ngram_hashes mirrors the slice/concat_ws construction") {
    import spark.implicits._
    import graft.functions.TextExprs
    val rnd = new scala.util.Random(23)
    val words = IndexedSeq("the", "a", "x", "中文", "é", "", "b5_")
    val rows = (1 to 300).map { i =>
      (i.toLong,
        List.fill(rnd.nextInt(12))(words(rnd.nextInt(words.length)))
          .mkString(" "))
    } ++ Seq((0L, ""), (1001L, "one two"), (1002L, "one two three"),
      (1003L, "trail two three "), (1004L, "a  b c"))
    val n = 3
    val toks = split($"text", " ")
    val cnt = greatest(size(toks) - (n - 1), lit(0)).cast("int")
    val out = rows.toDF("id", "text")
      .select($"id",
        size(array_distinct(TextExprs.tokenNgramHashes($"text", n)))
          .as("nh"),
        size(TextExprs.tokenNgramHashes($"text", n)).as("tw"),
        cnt.as("cs"),
        size(array_distinct(transform(
          arrays_zip((1 to n).map(j => slice(toks, lit(j), cnt)): _*),
          z => concat_ws(" ",
            (0 until n).map(j => z.getField(j.toString)): _*)))).as("ns"))
      .collect()
    out.foreach { r =>
      // same window count as the slice construction's width
      assert(r.getInt(2) == math.max(r.getInt(3), 0), s"window count: $r")
      // same DISTINCT gram count (collision-free at this scale)
      assert(r.getInt(1) == r.getInt(4), s"distinct count: $r")
    }
  }

  test("ascii_strip_collapse == the two-regex normalize chain") {
    import spark.implicits._
    import graft.functions.TextExprs
    val rnd = new scala.util.Random(29)
    val alphabet = "abz09 ..!-_é中" + new String(Character.toChars(0x1F600)) +
      "  \t"
    val rows = (1 to 400).map { i =>
      val cps = List.fill(rnd.nextInt(40))(
        alphabet.codePointAt(rnd.nextInt(alphabet.length) match {
          case j if Character.isLowSurrogate(alphabet.charAt(j)) => j - 1
          case j => j
        }))
      (i.toLong, cps.map(cp => new String(Character.toChars(cp))).mkString)
    } ++ Seq((0L, ""), (1001L, "   "), (1002L, "a . b"), (1003L, " x  y "))
    val out = rows.toDF("id", "text")
      .select($"id",
        TextExprs.asciiStripCollapse($"text").as("fused"),
        regexp_replace(
          regexp_replace($"text", "[^a-z0-9 ]", ""), "  +", " ").as("chain"))
      .collect()
    out.foreach(r => assert(r.getString(1) == r.getString(2), s"$r"))
  }

  test("word_set_counts == regexp_count of \\b-alternations (boundary edges)") {
    import spark.implicits._
    val rnd = new scala.util.Random(17)
    // boundary soup: stopwords glued to word chars ("the5", "_the" — no
    // match), to punctuation/unicode ("the,", "theé" — match), casing,
    // and multiple sets scored in one pass
    val pieces = IndexedSeq("the", "a", "is", "der", "und", "le", "est",
      "The", "THE", "thé", "5", "_", " ", ", ", "-", "x", "é", "中",
      new String(Character.toChars(0x1F600)), "\t", ".")
    val rows = (1 to 400).map { i =>
      (i.toLong,
        List.fill(rnd.nextInt(30))(pieces(rnd.nextInt(pieces.length)))
          .mkString)
    } :+ (0L, "")
    val sets = Seq(Seq("the", "a", "is", "of", "and"),
      Seq("der", "die", "das", "und", "ist"),
      Seq("le", "la", "les", "et", "est"))
    val pats = Seq("\\b(the|a|is|of|and)\\b", "\\b(der|die|das|und|ist)\\b",
      "\\b(le|la|les|et|est)\\b")
    val out = rows.toDF("id", "text")
      .select($"id",
        graft.functions.TextExprs.wordSetCounts($"text", sets).as("wsc"),
        regexp_count($"text", lit(pats(0))).as("r0"),
        regexp_count($"text", lit(pats(1))).as("r1"),
        regexp_count($"text", lit(pats(2))).as("r2"))
      .collect()
    out.foreach { r =>
      val wsc = r.getSeq[Int](1)
      assert(wsc(0) == r.getInt(2), s"set0: $r")
      assert(wsc(1) == r.getInt(3), s"set1: $r")
      assert(wsc(2) == r.getInt(4), s"set2: $r")
    }
  }

  test("sorted_intersect_size on long arrays == array_intersect (incl. negatives)") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    // xxhash64 keys are full-range signed longs — negatives included;
    // empty sets exercise the merge's boundary
    val rows = (1 to 300).map { i =>
      def set() = List.fill(rnd.nextInt(20))(rnd.nextLong() % 25)
        .distinct.sorted
      (i.toLong, set(), set())
    }
    val out = rows.toDF("id", "a", "b")
      .select($"id",
        graft.functions.TextExprs.sortedIntersectSize($"a", $"b").as("fused"),
        size(array_intersect($"a", $"b")).as("builtin"))
      .collect()
    out.foreach(r => assert(r.getInt(1) == r.getInt(2), r))
  }

  test("sorted_distinct_longs == sort_array(array_distinct(...))") {
    import spark.implicits._
    val rnd = new scala.util.Random(31)
    val rows = (1 to 300).map { i =>
      (i.toLong, List.fill(rnd.nextInt(25))(rnd.nextLong() % 13))
    } :+ (0L, List.empty[Long])
    val out = rows.toDF("id", "a")
      .select($"id",
        graft.functions.TextExprs.sortedDistinctLongs($"a").as("fused"),
        sort_array(array_distinct($"a")).as("builtin"))
      .collect()
    out.foreach(r => assert(r.getSeq[Long](1) == r.getSeq[Long](2), r))
  }

  test("minhash_signature == per-permutation min over exploded postings") {
    import graft.functions.TextExprs
    val k = 8
    val docs = Tables.documents(spark, sf).limit(60)
      .select(col("doc_id"), col("text"))
    val fused = docs.select(col("doc_id"),
      TextExprs.minhashSignature(
        TextExprs.sortedDistinctLongs(
          TextExprs.shingleHashes(col("text"), 5)), k).as("sig"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val posts = docs.select(col("doc_id"),
      explode(TextExprs.shingleHashes(col("text"), 5)).as("g")).distinct()
    val aggs = (0 until k).map(j =>
      min(graft.functions.TextFeatures.minhashPerm(col("g"), j)).as(s"m$j"))
    val ref = posts.groupBy(col("doc_id")).agg(aggs.head, aggs.tail: _*)
      .collect().map(r => r.getLong(0) ->
        (0 until k).map(j => r.getLong(j + 1)).toSeq).toMap
    assert(fused.nonEmpty && fused === ref)
    // empty gram set (text shorter than the token n-gram width) → null
    import spark.implicits._
    val nulls = Seq((1L, "one two")).toDF("id", "text")
      .select(TextExprs.minhashSignature(
        TextExprs.sortedDistinctLongs(
          TextExprs.tokenNgramHashes($"text", 3)), k).as("sig"))
      .collect()
    assert(nulls.head.isNullAt(0), "empty gram set must yield a null signature")
  }

  test("simhash_signature == the explode+64-sum aggregate formulation") {
    import spark.implicits._
    import graft.operators.DedupOps
    val real = Tables.documents(spark, sf).limit(60)
      .select($"doc_id", $"text")
    val edge = Seq((10001L, ""), (10002L, " "), (10003L, "a  b "),
      (10004L, "中文 é x"), (10005L, "one one one two")).toDF("doc_id", "text")
    val docs = real.unionByName(edge)
    val fused = docs.select($"doc_id",
      graft.functions.TextExprs.simhashSignature($"text").as("sh"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val ref = DedupOps.simhash(docs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fused.size == ref.size && fused === ref)
  }

  test("token_entropy == the explode+count aggregate formulation") {
    import spark.implicits._
    val real = Tables.documents(spark, sf).limit(60)
      .select($"doc_id", $"text")
    val edge = Seq((10001L, ""), (10002L, " "), (10003L, "a a a a"),
      (10004L, "a b c d"), (10005L, "x  y x ")).toDF("doc_id", "text")
    val docs = real.unionByName(edge)
    val fused = docs.select($"doc_id",
      graft.functions.TextExprs.tokenEntropy($"text").as("h"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val counts = docs
      .select($"doc_id", explode(split($"text", " ")).as("t"))
      .groupBy($"doc_id", $"t").agg(count(lit(1)).cast("double").as("c"))
    val ref = counts.groupBy($"doc_id")
      .agg((log2(sum($"c")) - sum($"c" * log2($"c")) / sum($"c")).as("h"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(fused.keySet === ref.keySet)
    fused.foreach { case (id, h) =>
      assert(math.abs(h - ref(id)) < 1e-9, s"doc $id: $h vs ${ref(id)}")
    }
    // uniform tokens → 0 bits; 4 distinct of 4 → 2 bits
    assert(math.abs(fused(10003L)) < 1e-12)
    assert(math.abs(fused(10004L) - 2.0) < 1e-12)
  }

  test("TopK aggregator matches window ordering with NaN and -0.0 sims") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    // Spark sorts NaN as the LARGEST double and equates -0.0 with 0.0;
    // the aggregator must mirror that or it diverges from the row_number
    // window it replaces. vec_id tie-breaks inside each equality class.
    val df = Seq(
      (0L, Double.NaN, 1L), (0L, 1.0, 2L), (0L, -0.0, 3L), (0L, 0.0, 4L),
      (0L, Double.NaN, 5L), (0L, 0.5, 6L), (0L, -1.0, 7L)
    ).toDF("qid", "sim", "vec_id")
    val viaAgg = df.groupBy($"qid")
      .agg(graft.functions.TopK.topK(5)($"sim", $"vec_id").as("top"))
      .select(posexplode($"top").as(Seq("p", "t")))
      .select(($"p" + 1).cast("long").as("rk"), $"t.vec_id".as("vec_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val w = Window.partitionBy($"qid").orderBy($"sim".desc, $"vec_id")
    val viaWin = df.withColumn("rk", row_number().over(w).cast("long"))
      .filter($"rk" <= 5).select($"rk", $"vec_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(viaAgg.sorted === viaWin.sorted)
    // NaNs rank first (1,5), then 1.0, then 0.5, then the zero tie (3)
    assert(viaAgg.sorted.map(_._2) === Seq(1L, 5L, 2L, 6L, 3L))
  }

  test("null semantics: null array, length mismatch, null element") {
    import spark.implicits._
    val df = Seq(
      (1L, Seq(1.0, 2.0), Seq(1.0, 2.0)),
      (2L, Seq(1.0, 2.0), Seq(1.0, 2.0, 3.0))
    ).toDF("id", "a", "b")
    val out = df.select(col("id"),
      VectorExprs.cosineSim(col("a"), col("b")).as("c")).collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1))))
      .toMap
    assert(out(1).isDefined && math.abs(out(1).get - 1.0) < 1e-12)
    assert(out(2).isEmpty, "length mismatch must be null")
    val withNulls = df.select(col("id"),
      VectorExprs.cosineSim(lit(null).cast("array<double>"), col("b")).as("c"))
      .collect()
    assert(withNulls.forall(_.isNullAt(1)), "null array must be null")
  }

  test("cosine_sim registers and resolves in SQL") {
    VectorExprs.registerFunctions(spark)
    vecs.createOrReplaceTempView("vecs_v")
    val r = spark.sql(
      """SELECT v.vec_id, cosine_sim(v.ev, q.ev) AS sim
         FROM vecs_v v CROSS JOIN (SELECT ev FROM vecs_v WHERE vec_id = 0) q
         ORDER BY sim DESC, vec_id LIMIT 3""").collect()
    assert(r.length == 3 && r.head.getLong(0) == 0L &&
      math.abs(r.head.getDouble(1) - 1.0) < 1e-12)
  }

  test("custom expressions compile under CODEGEN_ONLY (no silent fallback)") {
    // a Janino compile failure normally falls back to interpreted eval
    // and every equivalence spec still passes — force codegen so a
    // broken doGenCode FAILS here instead of shipping slow
    val fm = spark.conf.getOption("spark.sql.codegen.factoryMode")
    val fb = spark.conf.getOption("spark.sql.codegen.fallback")
    spark.conf.set("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try {
      Seq("text_lang_id", "text_token_classes", "text_quality_score",
        "text_fingerprint", "text_normalize", "text_entropy",
        "sim_cosine_topk", "sim_quantized_topk").foreach { q =>
        assert(SparkEntry.queries(q)(spark, sf).collect().nonEmpty, q)
      }
      // expressions the queries above may not re-evaluate (the dedup pair
      // table is session-cached): drive them directly
      import spark.implicits._
      import graft.functions.TextExprs
      val bf = org.apache.spark.util.sketch.BloomFilter.create(100)
      bf.putLong(7L)
      val direct = Seq((Seq(1L, 3L, 7L), Seq(3L, 7L, 9L),
          Seq(1.0, 2.0), Seq(2.0, 1.0), "abcdefg", 7L, 8L))
        .toDF("a", "b", "v", "w", "t", "k_in", "k_out")
        .select(TextExprs.sortedIntersectSize($"a", $"b").as("i"),
          VectorExprs.dist2($"v", $"w").as("d"),
          size(TextExprs.shingleHashes($"t", 5)).as("nw"),
          size(TextExprs.tokenNgramHashes($"t", 1)).as("ng"),
          size(TextExprs.sortedDistinctLongs($"a")).as("sd"),
          size(TextExprs.minhashSignature($"a", 4)).as("mh"),
          TextExprs.simhashSignature($"t").as("sh"),
          graft.functions.BloomExprs.mightContainLong(bf, $"k_in").as("bi"),
          graft.functions.BloomExprs.mightContainLong(bf, $"k_out").as("bo"),
          graft.functions.LayoutExprs.zValue($"a"(0), $"a"(1)).as("z"),
          graft.functions.LayoutExprs.bucketIndex($"v"(0),
            Array(0.5, 1.5)).as("bk"),
          graft.functions.LayoutExprs.mix64($"k_in").as("mx"),
          VectorExprs.nearestCentroids($"v",
            Seq(Seq(9.0, 9.0), Seq(1.0, 2.0), Seq(1.1, 2.0)), 2).as("nc"),
          graft.functions.PqExprs.pqEncode($"v",
            Array(Array(Array(9.0, 9.0), Array(1.0, 2.0)))).as("pqc"),
          // feed adc from the (non-foldable) encoder so neither kernel
          // can be constant-folded away before codegen
          graft.functions.PqExprs.pqAdcDot(
            graft.functions.PqExprs.pqEncode($"v",
              Array(Array(Array(9.0, 9.0), Array(1.0, 2.0)))),
            typedlit(Seq(10.0, 20.0))).as("pqd"))
        .collect()(0)
      assert(direct.getInt(0) == 2 && direct.getDouble(1) == 2.0 &&
        direct.getInt(2) == 3 && direct.getInt(3) == 1 &&
        direct.getInt(4) == 3 && direct.getInt(5) == 4 &&
        !direct.isNullAt(6) &&
        direct.getBoolean(7) && !direct.getBoolean(8) &&
        direct.getLong(9) == 11L && direct.getLong(10) == 1L &&
        direct.getLong(11) == TextExprs.fmix64(7L))
      // v = (1,2): exact hit on centroid 1, then 2 (0.01), never 0 (far)
      assert(direct.getSeq[Int](12) == Seq(1, 2))
      // pq: v=(1,2) snaps to entry 1 of the single subspace; adc then
      // reads lut[0·2+1] = 20
      assert(direct.getSeq[Byte](13) == Seq(1.toByte))
      assert(direct.getDouble(14) == 20.0)
    } finally {
      fm.fold(spark.conf.unset("spark.sql.codegen.factoryMode"))(
        spark.conf.set("spark.sql.codegen.factoryMode", _))
      fb.fold(spark.conf.unset("spark.sql.codegen.fallback"))(
        spark.conf.set("spark.sql.codegen.fallback", _))
    }
  }

  test("nearest_centroids: tie toward lower id, null element, dim mismatch") {
    import spark.implicits._
    val cents = Seq(Seq(1.0, 2.0), Seq(1.0, 2.0), Seq(9.0, 9.0))
    // exact tie between centroids 0 and 1 → ascending ids
    val tied = Seq(Tuple1(Seq(1.0, 2.0))).toDF("v")
      .select(VectorExprs.nearestCentroids($"v", cents, 3)).collect()(0)
    assert(tied.getSeq[Int](0) == Seq(0, 1, 2))
    // a null element nulls the row (dist2 semantics)
    val withNull = Seq(Tuple1(Seq[java.lang.Double](1.0, null))).toDF("v")
      .select(VectorExprs.nearestCentroids($"v", cents, 1)).collect()(0)
    assert(withNull.isNullAt(0))
    // vector/centroid length mismatch nulls the row
    val mismatch = Seq(Tuple1(Seq(1.0, 2.0, 3.0))).toDF("v")
      .select(VectorExprs.nearestCentroids($"v", cents, 1)).collect()(0)
    assert(mismatch.isNullAt(0))
  }

  test("cosine_sim stays inside whole-stage codegen") {
    val q = vecs.filter(col("vec_id") === 0).select(col("ev").as("qv"))
    val df = vecs.crossJoin(broadcast(q))
      .select(VectorExprs.cosineSim(col("ev"), col("qv")).as("sim"))
    df.collect()
    val executed = df.queryExecution.executedPlan.toString
    assert(executed.contains("WholeStageCodegen") || executed.contains("*("),
      executed)
  }
}
