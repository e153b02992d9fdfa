package graft

import org.apache.spark.sql.functions._

import graft.operators.{DedupOps, TextOps}

/** Hand-computed micro-corpus pins for the corpus-statistics operators
  * (LM perplexity, duplicate-span coverage) — the oracle gate proves
  * engine-vs-DuckDB agreement on the real corpus; these prove the
  * SEMANTICS against closed-form arithmetic a reviewer can re-derive.
  */
class CorpusStatsSpec extends SparkSpec {
  import spark.implicits._

  test("lm_perplexity matches the closed-form add-one bigram model") {
    // corpus: d0 = "x x x x", d1 = "x y".
    // bigram counts: c2(x,x)=3, c2(x,y)=1; contexts c1(x)=4; V=2.
    // P(x|x) = (3+1)/(4+2) = 2/3;  P(y|x) = (1+1)/(4+2) = 1/3.
    // d0: nll = ln(3/2) = 0.405465, ppl = 1.5
    // d1: nll = ln(3)   = 1.098612, ppl = 3.0
    val docs = Seq((0L, "x x x x"), (1L, "x y")).toDF("doc_id", "text")
    val out = TextOps.lmPerplexity(docs).collect()
    assert(out.length == 2)
    val d0 = out(0)
    assert(d0.getLong(0) == 0L && d0.getLong(1) == 3L)
    assert(d0.getDouble(2) == 0.405465 && d0.getDouble(3) == 1.5)
    val d1 = out(1)
    assert(d1.getLong(0) == 1L && d1.getLong(1) == 1L)
    assert(d1.getDouble(2) == 1.098612 && d1.getDouble(3) == 3.0)
  }

  test("lm_perplexity drops single-token docs but keeps their vocabulary") {
    // "z" contributes no bigram row, but V grows 2 -> 3, shifting d1:
    // P(y|x) = (1+1)/(1+3) = 1/2 -> nll = ln 2, ppl = 2.
    val docs = Seq((0L, "x y"), (1L, "z")).toDF("doc_id", "text")
    val out = TextOps.lmPerplexity(docs).collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(0L))
    assert(out(0).getDouble(3) == 2.0)
  }

  test("lm_perplexity pruned mode == exact when nothing prunes") {
    // every token occurs >= 2 times, so minCount=2 prunes nothing:
    // kept = full vocab, no OOV symbol, V identical — the pruned plan
    // must reproduce the exact (oracle-gated) numbers row for row
    val docs = Seq((0L, "x x x x"), (1L, "x y y x")).toDF("doc_id", "text")
    val exact = TextOps.lmPerplexity(docs).collect().map(_.toSeq).toSeq
    spark.conf.set("spark.graft.text.lmMinCount", "2")
    try {
      val pruned = TextOps.lmPerplexity(docs).collect().map(_.toSeq).toSeq
      assert(pruned === exact)
    } finally spark.conf.unset("spark.graft.text.lmMinCount")
  }

  test("lm_perplexity min-count pruning folds rare tokens into one OOV bucket") {
    // corpus: d0 = "x x x x", d1 = "x q", d2 = "x r"; minCount=2 prunes
    // the singletons q and r into ⟨unk⟩.
    // exact: c2(x,x)=3, c2(x,q)=1, c2(x,r)=1; c1(x)=5; V=3:
    //   d0: P(x|x)=(3+1)/(5+3)=1/2      -> nll = ln 2,     ppl = 2
    //   d1,d2: P(q|x)=P(r|x)=2/8=1/4    -> nll = ln 4,     ppl = 4
    // pruned: c2(x,x)=3, c2(x,unk)=2; c1(x)=5; V = 1 kept + 1 unk = 2:
    //   d0: P(x|x)=(3+1)/(5+2)=4/7      -> nll = ln(7/4) = 0.559616
    //   d1,d2: P(unk|x)=(2+1)/(5+2)=3/7 -> nll = ln(7/3) = 0.847298
    val docs = Seq((0L, "x x x x"), (1L, "x q"), (2L, "x r"))
      .toDF("doc_id", "text")
    val exact = TextOps.lmPerplexity(docs).collect()
    assert(exact.map(r => (r.getLong(0), r.getDouble(2), r.getDouble(3)))
      .toSeq === Seq((0L, 0.693147, 2.0), (1L, 1.386294, 4.0),
        (2L, 1.386294, 4.0)))
    spark.conf.set("spark.graft.text.lmMinCount", "2")
    try {
      val pruned = TextOps.lmPerplexity(docs).collect()
      assert(pruned.map(r => (r.getLong(0), r.getDouble(2), r.getDouble(3)))
        .toSeq === Seq((0L, 0.559616, 1.75), (1L, 0.847298, 2.3333),
          (2L, 0.847298, 2.3333)))
    } finally spark.conf.unset("spark.graft.text.lmMinCount")
    // the point of the mode: the model table shrank (3 bigram keys -> 2)
    assert(TextOps.lmModel(docs, 1).c2.count() === 3L)
    assert(TextOps.lmModel(docs, 2).c2.count() === 2L)
  }

  test("lm_perplexity top-K cap == exact when K covers the vocabulary") {
    val docs = Seq((0L, "x x x x"), (1L, "x y y x")).toDF("doc_id", "text")
    val exact = TextOps.lmPerplexity(docs).collect().map(_.toSeq).toSeq
    spark.conf.set("spark.graft.text.lmTopK", "2")
    try {
      assert(TextOps.lmPerplexity(docs).collect().map(_.toSeq).toSeq
        === exact)
    } finally spark.conf.unset("spark.graft.text.lmTopK")
  }

  test("lm_perplexity top-K cap folds everything below the cut into OOV") {
    // same corpus as the min-count closed form: top-1 keeps x (count 6);
    // the tied singletons q and r both fall to ⟨unk⟩ — identical model
    // to minCount=2, so the SAME closed-form numbers must come out
    val docs = Seq((0L, "x x x x"), (1L, "x q"), (2L, "x r"))
      .toDF("doc_id", "text")
    spark.conf.set("spark.graft.text.lmTopK", "1")
    try {
      val capped = TextOps.lmPerplexity(docs).collect()
      assert(capped.map(r => (r.getLong(0), r.getDouble(2), r.getDouble(3)))
        .toSeq === Seq((0L, 0.559616, 1.75), (1L, 0.847298, 2.3333),
          (2L, 0.847298, 2.3333)))
    } finally spark.conf.unset("spark.graft.text.lmTopK")
    // hard bound: c1 is at most K+1 whatever the corpus
    assert(TextOps.lmModel(docs, 1, 1).c1.count() <= 2L)
  }

  test("pii_scrub redacts emails/IPs/phones and counts matches closed-form") {
    val docs = Seq(
      (0L, "mail bob.smith+x@site.co.uk now"),   // one email
      (1L, "hosts 10.0.0.1 and 192.168.001.255 up"), // two IPv4s
      (2L, "call 555-123-4567 or 555 987 6543"), // two phone shapes
      (3L, "plain alphabetic text only"),        // nothing
      (4L, "a@b.io at 1.2.3.4 dial 111-222-3333")) // one of each
      .toDF("doc_id", "text")
    val out = TextOps.piiScrub(docs).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4)))).toMap
    def m(s: String) = {
      val d = java.security.MessageDigest.getInstance("MD5")
      d.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    }
    assert(out(0L) == ((1L, 0L, 0L, m("mail <EMAIL> now"))))
    assert(out(1L) == ((0L, 2L, 0L, m("hosts <IP> and <IP> up"))))
    assert(out(2L) == ((0L, 0L, 2L, m("call <PHONE> or <PHONE>"))))
    assert(out(3L) == ((0L, 0L, 0L, m("plain alphabetic text only"))))
    assert(out(4L) == ((1L, 1L, 1L, m("<EMAIL> at <IP> dial <PHONE>"))))
  }

  test("pii kernel == java.util.regex on adversarial fragments (property)") {
    // The fused byte-scan kernel (TextExprs.PiiScan) must agree with the
    // regex formulation it replaced on BOTH outputs: per-pattern counts
    // on the raw text, and the sequential email -> IP -> phone scrub.
    // Reference is java.util.regex directly (what regexp_count /
    // regexp_replace execute); fragments include every backtracking trap
    // the patterns admit, glued with separators that form NOVEL
    // compositions ("" can fuse a digit run onto an IP, "@" can turn an
    // IP into an email local part, ...).
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    import java.util.regex.Pattern
    import org.apache.spark.unsafe.types.UTF8String
    import graft.functions.TextExprs

    val eP = Pattern.compile(TextOps.EmailPat)
    val iP = Pattern.compile(TextOps.Ipv4Pat)
    val pP = Pattern.compile(TextOps.PhonePat)
    def count(p: Pattern, s: String) = {
      val m = p.matcher(s); var c = 0L; while (m.find()) c += 1; c
    }
    def ref(text: String): (Long, Long, Long, String) = {
      val scrub = pP.matcher(iP.matcher(eP.matcher(text)
        .replaceAll("<EMAIL>")).replaceAll("<IP>")).replaceAll("<PHONE>")
      (count(eP, text), count(iP, text), count(pP, text), scrub)
    }
    def fused(text: String): (Long, Long, Long, String) = {
      val r = TextExprs.piiScan(UTF8String.fromString(text))
      (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getUTF8String(3).toString)
    }

    val fragments = Seq(
      // valid matches
      "bob.smith+x@site.co.uk", "a@b.io", "x%y_z@a-b.c.dd", "1.2.3.4",
      "192.168.001.255", "255.255.255.255", "555-123-4567",
      "555 987 6543", "111-222 3333",
      // near-misses exercising each backtracking branch
      "a@b.c", "@x.cc", "a@@b.cc", "a@.cc", "a@b..cc", "x@y",
      "a@b.cc-dd", "a@b.cc9", "a@b.ccc.dd-", "a@b@c.cc",
      "1234.5.6.7", "1.2.3.", "1.2.3.4567", "1.2.3.4.5.6.7.8",
      "12345.6.7.8", "1..2.3.4", "55-123-4567", "555-12-4567",
      "555-123-456", "1111-222-3333", "111 222 33334",
      // sequential-priority traps: email must win over the phone/IP
      // that starts earlier on the raw text
      "111 222 3333@x.cc", "1.2.3.4@x.cc", "123-456-7890@x.cc",
      // filler incl. multibyte (never matches; byte-scan must skip it)
      "plain words", "αβγ δε", "日本語テキスト", "a", "7", ".", "-", "@")
    val genText: Gen[String] = for {
      n <- Gen.choose(1, 12)
      parts <- Gen.listOfN(n, Gen.oneOf(fragments))
      seps <- Gen.listOfN(n, Gen.oneOf(" ", "", ",", ".", "-", "@", "  "))
    } yield parts.zip(seps).map { case (p, s) => p + s }.mkString

    val prop = Prop.forAll(genText) { text => ref(text) == fused(text) }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(500), prop)
    assert(res.passed, res.status.toString)
  }

  test("pii fused query == composed regex query through codegen") {
    // Same equality through the full Spark path (whole-stage codegen,
    // struct field CSE, md5): the registered piiScrub vs the kept
    // composed form over a deterministic adversarial corpus.
    val rnd = new scala.util.Random(7)
    val pool = Seq("a@b.io", "1.2.3.4", "555-123-4567", "x y z",
      "111 222 3333@x.cc", "1234.5.6.7", "a@b..cc", "αβ", "9.9.9.99",
      "123 456 7890", "no.match.here", "u%v@w.xy", "1.2.3.4@x.cc")
    val docs = (0L until 200L).map { i =>
      val n = 1 + rnd.nextInt(8)
      (i, Seq.fill(n)(pool(rnd.nextInt(pool.size)))
        .mkString(Seq(" ", "", ".")(rnd.nextInt(3))))
    }.toDF("doc_id", "text")
    val fusedRows = TextOps.piiScrub(docs).collect().toSeq
    val composedRows = TextOps.piiScrubComposed(docs).collect().toSeq
    assert(fusedRows == composedRows)
  }

  test("span_coverage: interval union over duplicated 8-gram windows") {
    val t16 = (0 until 8).map(i => s"t$i")
    val doc0 = (t16 ++ t16).mkString(" ")          // 16 toks, halves equal
    val doc1 = (0 until 10).map(i => s"u$i").mkString(" ") // unique
    val doc2 = Seq.fill(9)("s").mkString(" ")      // 9 equal toks
    val docs = Seq((0L, doc0), (1L, doc1), (2L, doc2)).toDF("doc_id", "text")
    val out = DedupOps.spanCoverage(docs, 8)
      .collect().map(r => (r.getLong(0),
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getDouble(5)))).toMap
    // doc0: windows pos0 and pos8 are both t0..t7 (occ=2, duplicated);
    // pos1..7 mix the halves and are unique. Coverage 8 + min(8, 8) = 16.
    assert(out(0L) == ((16L, 9L, 2L, 16L, 1.0)))
    // doc1: no window occurs twice anywhere
    assert(out(1L) == ((10L, 3L, 0L, 0L, 0.0)))
    // doc2: both windows are "s"*8 (occ=2): 8 + min(8, 1) = 9 of 9
    assert(out(2L) == ((9L, 2L, 2L, 9L, 1.0)))
  }

  test("span_excise drops exactly the covered tokens, keeps position order") {
    val t16 = (0 until 8).map(i => s"t$i")
    val doc0 = (t16 ++ t16).mkString(" ")            // fully covered
    val span = (0 until 8).map(i => s"c$i").mkString(" ")
    val doc1 = span + " keep me"                     // cross-doc dup span
    val doc2 = "uniq " + span                        // same span, other doc
    val docs = Seq((0L, doc0), (1L, doc1), (2L, doc2)).toDF("doc_id", "text")
    val out = DedupOps.spanExcise(docs, 8)
      .collect().map(r => (r.getLong(0),
        (r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    def m(s: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    // doc0: every position covered -> empty cleaned text
    assert(out(0L) == ((16L, 0L, m(""))))
    // doc1/doc2: the shared 8-gram excised, residue survives IN ORDER
    assert(out(1L) == ((10L, 2L, m("keep me"))))
    assert(out(2L) == ((9L, 1L, m("uniq"))))
  }

  test("span_excise and span_coverage agree on kept = n_tokens - covered") {
    val h = (0 until 8).map("t" + _)
    val docs = Seq((0L, (h ++ h).mkString(" ")),
      (1L, (0 until 12).map("u" + _).mkString(" ")),
      (2L, Seq.fill(9)("s").mkString(" "))).toDF("doc_id", "text")
    val covv = DedupOps.spanCoverage(docs, 8)
      .select(col("doc_id"), (col("n_tokens") - col("covered_tokens")).as("k"))
    val exc = DedupOps.spanExcise(docs, 8)
      .select(col("doc_id"), col("kept_tokens").as("k"))
    assert(covv.exceptAll(exc).isEmpty && exc.exceptAll(covv).isEmpty)
  }

  test("span_coverage counts cross-doc occurrences into occ >= 2") {
    // the same 8-gram once in each of two docs — no within-doc repeat —
    // must still be duplicated (the contamination/boilerplate case)
    val span = (0 until 8).map(i => s"c$i").mkString(" ")
    val docs = Seq((0L, span + " a b"), (1L, "p q " + span))
      .toDF("doc_id", "text")
    val out = DedupOps.spanCoverage(docs, 8)
      .collect().map(r => (r.getLong(0), (r.getLong(3), r.getLong(4))))
      .toMap
    assert(out(0L) == ((1L, 8L)) && out(1L) == ((1L, 8L)))
  }
}
