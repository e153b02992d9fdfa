package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst text expressions. [[PolyFingerprint]] is the fused,
  * codegen'd form of the polynomial rolling hash
  * `fold(acc = (acc*31 + codepoint) mod 1e9+7)` over a string's characters.
  *
  * The HOF formulation ([[TextFeatures.rollingFingerprintHof]] —
  * `aggregate(transform(sequence(...), i => ascii(substr(i,1))), ...)`)
  * is semantically identical but materializes a length-|text| long array
  * and dispatches two interpreted lambdas plus a substring ALLOCATION per
  * character — measured 18 s for 5 000 documents at sf0.1 vs well under a
  * second fused. Per-character work must live inside whole-stage codegen
  * at 100 TB; VectorExprsSpec asserts bit-equality of the two forms.
  *
  * Character semantics mirror `ascii(substr(text, i, 1))`: one step per
  * Unicode CODE POINT (not UTF-16 unit, not byte), so multibyte text
  * fingerprints identically to the HOF/oracle form.
  */
object TextExprs {

  val FpMult = 31L
  val FpMod = 1000000007L

  case class PolyFingerprint(child: Expression) extends UnaryExpression {
    override def checkInputDataTypes()
        : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
      child.dataType match {
        case StringType =>
          org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
        case other =>
          org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
            s"poly_fingerprint expects string, got ${other.simpleString}")
      }
    override def dataType: DataType = LongType
    override def prettyName: String = "poly_fingerprint"

    override def nullSafeEval(input: Any): Any = {
      val s = input.asInstanceOf[UTF8String].toString
      var acc = 0L
      var i = 0
      while (i < s.length) {
        val cp = s.codePointAt(i)
        acc = (acc * FpMult + cp) % FpMod
        i += Character.charCount(cp)
      }
      acc
    }

    override protected def doGenCode(ctx: CodegenContext,
        ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, c => {
        val js = ctx.freshName("js")
        val acc = ctx.freshName("acc")
        val i = ctx.freshName("i")
        val cp = ctx.freshName("cp")
        s"""
        String $js = $c.toString();
        long $acc = 0L;
        for (int $i = 0; $i < $js.length(); ) {
          int $cp = $js.codePointAt($i);
          $acc = ($acc * ${FpMult}L + $cp) % ${FpMod}L;
          $i += Character.charCount($cp);
        }
        ${ev.value} = $acc;
        """
      })

    override protected def withNewChildInternal(
        newChild: Expression): Expression = copy(newChild)
  }

  /** Column-API face of [[PolyFingerprint]]. */
  def polyFingerprint(text: Column): Column =
    Bridge.column(PolyFingerprint(Bridge.expression(text)))

  /** Fused single-pass character classifier — one scan over the string's
    * code points emitting struct(n_alpha, n_punct, alpha_runs,
    * digit_runs), replacing 2–3 separate `regexp_count` scans (each its
    * own regex-engine pass) in the text-quality hot path:
    *   - n_alpha     = count of chars matching [A-Za-z]
    *   - n_punct     = count of chars matching [^A-Za-z0-9\s]
    *   - alpha_runs  = count of matches of [A-Za-z]+
    *   - digit_runs  = count of matches of [0-9]+
    * Character semantics are exactly Java regex's (one step per Unicode
    * code point, so a supplementary char counts ONCE; `\s` is Java's
    * ASCII class INCLUDING vertical tab) — VectorExprsSpec pins equality
    * with the regexp_count formulations on adversarial unicode.
    * Consumers read several fields of one call; whole-stage codegen's
    * subexpression elimination evaluates the kernel once per row.
    */
  case class CharClassCounts(child: Expression) extends UnaryExpression {
    override def checkInputDataTypes()
        : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
      child.dataType match {
        case StringType =>
          org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
        case other =>
          org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
            s"char_class_counts expects string, got ${other.simpleString}")
      }
    override def dataType: DataType = CharClassCounts.schema
    override def prettyName: String = "char_class_counts"

    override def nullSafeEval(input: Any): Any =
      charClassCount(input.asInstanceOf[UTF8String])

    override protected def doGenCode(ctx: CodegenContext,
        ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, c => {
        // the loop lives ONCE in the scala object; generated code calls it
        // (the win is dropping the regex engines, not inlining the loop)
        s"""
        ${ev.value} = graft.functions.TextExprs.charClassCount($c);
        """
      })

    override protected def withNewChildInternal(
        newChild: Expression): Expression = copy(newChild)
  }

  object CharClassCounts {
    import org.apache.spark.sql.types.StructType
    val schema: StructType = new StructType()
      .add("n_alpha", IntegerType).add("n_punct", IntegerType)
      .add("alpha_runs", IntegerType).add("digit_runs", IntegerType)
  }

  /** The counting kernel — also the call target of the generated code
    * (`TextExprs.charClassCount(...)` compiles under Janino because this
    * object exposes it as a static forwarder).
    */
  def charClassCount(s: UTF8String): org.apache.spark.sql.catalyst.InternalRow = {
    val js = s.toString
    var i = 0
    var nAlpha = 0; var nPunct = 0; var aRuns = 0; var dRuns = 0
    var inAlpha = false; var inDigit = false
    while (i < js.length) {
      val cp = js.codePointAt(i)
      val alpha = (cp >= 'A' && cp <= 'Z') || (cp >= 'a' && cp <= 'z')
      val digit = cp >= '0' && cp <= '9'
      // Java regex \s = [ \t\n\x0B\f\r]
      val space = cp == ' ' || cp == '\t' || cp == '\n' || cp == 0x0B ||
        cp == '\f' || cp == '\r'
      if (alpha) nAlpha += 1
      if (!alpha && !digit && !space) nPunct += 1
      if (alpha && !inAlpha) aRuns += 1
      if (digit && !inDigit) dRuns += 1
      inAlpha = alpha; inDigit = digit
      i += Character.charCount(cp)
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](nAlpha, nPunct, aRuns, dRuns))
  }

  /** Column-API face of [[CharClassCounts]]. */
  def charClassCounts(text: Column): Column =
    Bridge.column(CharClassCounts(Bridge.expression(text)))

  /** Fused stopword-list counter — one scan over the string emitting, for
    * each of K word sets, how many word-runs equal a member of that set.
    * This is exactly Java regex `\b(w1|w2|…)\b` occurrence counting, but
    * K lists cost ONE pass instead of K regex-engine scans: text_lang_id
    * scores its languages' stopword sets in a single traversal.
    *
    * Boundary semantics trap: Java's `\b` is NOT `\w`-based — its word
    * characters are `_` plus `Character.isLetterOrDigit` (UNICODE
    * letters/digits), so "théund" is ONE word and `\bund\b` does not
    * match inside it, while "the,und" yields two. The kernel's runs use
    * exactly that definition (matches are case-sensitive, members are
    * ASCII so non-ASCII runs simply never match). Equality with the
    * regexp_count formulation is pinned in VectorExprsSpec on
    * adversarial unicode.
    */
  case class WordSetCounts(child: Expression, sets: Seq[Seq[String]])
      extends UnaryExpression {
    require(sets.nonEmpty && sets.forall(_.nonEmpty),
      "word_set_counts needs at least one non-empty word set")
    override def checkInputDataTypes()
        : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
      child.dataType match {
        case StringType =>
          org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
        case other =>
          org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
            s"word_set_counts expects string, got ${other.simpleString}")
      }
    override def dataType: DataType = ArrayType(IntegerType, false)
    override def prettyName: String = "word_set_counts"

    // java.util.HashSet: reference-typed cleanly from Janino-generated
    // code AND O(1) lookup in the interpreted path
    @transient private lazy val lookup: Array[java.util.HashSet[String]] =
      sets.map { s =>
        val h = new java.util.HashSet[String]()
        s.foreach(h.add)
        h
      }.toArray

    override def nullSafeEval(input: Any): Any =
      TextExprs.wordSetCount(input.asInstanceOf[UTF8String], lookup)

    override protected def doGenCode(ctx: CodegenContext,
        ev: ExprCode): ExprCode = {
      val ref = ctx.addReferenceObj("wordSets", lookup,
        "java.util.HashSet[]")
      nullSafeCodeGen(ctx, ev, c => {
        s"""
        ${ev.value} = graft.functions.TextExprs.wordSetCount($c, $ref);
        """
      })
    }

    override protected def withNewChildInternal(
        newChild: Expression): Expression = copy(newChild, sets)
  }

  /** The matching kernel — also the call target of the generated code. */
  def wordSetCount(s: UTF8String,
      sets: Array[java.util.HashSet[String]]): ArrayData = {
    val js = s.toString
    val counts = new Array[Int](sets.length)
    val run = new java.lang.StringBuilder(16)
    def flush(): Unit = {
      if (run.length() > 0) {
        val w = run.toString
        var k = 0
        while (k < sets.length) {
          if (sets(k).contains(w)) counts(k) += 1
          k += 1
        }
        run.setLength(0)
      }
    }
    var i = 0
    while (i < js.length) {
      val cp = js.codePointAt(i)
      // Java \b word chars: underscore or UNICODE letter/digit (NOT \w)
      val word = cp == '_' || Character.isLetterOrDigit(cp)
      if (word) run.appendCodePoint(cp) else flush()
      i += Character.charCount(cp)
    }
    flush()
    // primitive Array[Int] overload: no per-row boxing
    new org.apache.spark.sql.catalyst.util.GenericArrayData(counts)
  }

  /** Column-API face of [[WordSetCounts]]. */
  def wordSetCounts(text: Column, sets: Seq[Seq[String]]): Column =
    Bridge.column(WordSetCounts(Bridge.expression(text), sets))

  /** Fused char-shingle hasher — array of 64-bit hashes of the
    * n-code-point windows, one pass, no substring materialization. The
    * window positions mirror `charShinglesAll` exactly (positions
    * 1..max(numChars−n+1, 1); a text shorter than n yields its single
    * truncated window), so `explode(shingleHashes(text, n)).distinct()`
    * is the hashed shingle posting list without ever allocating the
    * ~numChars window STRINGS per document that explode(substr…)+xxhash64
    * pays. The hash is FNV-1a over code points finished with the
    * murmur3 fmix64 avalanche — any well-mixed 64-bit hash works here:
    * downstream minhash permutations re-mix it and the Jaccard
    * verification is exact on the hashed sets (collision analysis in
    * DedupOps.ngramPosts applies unchanged).
    */
  case class ShingleHashes(child: Expression, n: Int)
      extends UnaryExpression {
    require(n > 0, "shingle width must be positive")
    override def checkInputDataTypes()
        : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
      child.dataType match {
        case StringType =>
          org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
        case other =>
          org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
            s"shingle_hashes expects string, got ${other.simpleString}")
      }
    override def dataType: DataType = ArrayType(LongType, false)
    override def prettyName: String = "shingle_hashes"

    override def nullSafeEval(input: Any): Any =
      TextExprs.shingleHash(input.asInstanceOf[UTF8String], n)

    override protected def doGenCode(ctx: CodegenContext,
        ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, c => {
        s"""
        ${ev.value} = graft.functions.TextExprs.shingleHash($c, $n);
        """
      })

    override protected def withNewChildInternal(
        newChild: Expression): Expression = copy(newChild, n)
  }

  // shared window-hash primitives: FNV-1a accumulation + murmur3 fmix64
  // avalanche — ONE definition for both window kernels so the constants
  // cannot drift between them
  private final val FnvBasis = 0xcbf29ce484222325L
  private final val FnvPrime = 0x100000001b3L
  @inline private def fnvStep(h: Long, cp: Int): Long = (h ^ cp) * FnvPrime
  // public: [[LayoutExprs.Mix64]]'s eval and generated code call this
  // same definition (one avalanche, no constant drift)
  @inline def fmix64(h0: Long): Long = {
    var h = h0
    h ^= (h >>> 33); h *= 0xff51afd7ed558ccdL
    h ^= (h >>> 33); h *= 0xc4ceb9fe1a85ec53L
    h ^ (h >>> 33)
  }

  /** The hashing kernel — also the call target of the generated code. */
  def shingleHash(s: UTF8String, n: Int): ArrayData = {
    val js = s.toString
    // code points up front: windows step by code point, not UTF-16 unit
    val cps = new Array[Int](js.codePointCount(0, js.length))
    var i = 0; var k = 0
    while (i < js.length) {
      val cp = js.codePointAt(i)
      cps(k) = cp; k += 1
      i += Character.charCount(cp)
    }
    val nWin = math.max(cps.length - (n - 1), 1)
    val out = new Array[Long](nWin)
    var w = 0
    while (w < nWin) {
      var h = FnvBasis
      var j = w
      val end = math.min(w + n, cps.length)
      while (j < end) {
        h = fnvStep(h, cps(j))
        j += 1
      }
      out(w) = fmix64(h)
      w += 1
    }
    // flat unboxed buffer — GenericArrayData's primitive ctor would
    // box every element on exactly the hot path these kernels exist
    // to de-allocate
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
      .fromPrimitiveArray(out)
  }

  /** Column-API face of [[ShingleHashes]]. */
  def shingleHashes(text: Column, n: Int): Column =
    Bridge.column(ShingleHashes(Bridge.expression(text), n))

  /** Fused token-n-gram hasher — hashes of the n-token windows of the
    * single-space tokenization, one pass, no token/gram strings
    * materialized. Tokenization mirrors `split(text, " ")` exactly
    * (split at EVERY single space; consecutive spaces yield empty
    * tokens; Java split semantics drop trailing empties) and each
    * window hashes the same character stream `concat_ws(" ", tokens)`
    * would produce, so the per-document gram SETS equal the
    * slice/concat_ws construction's — only the hash values differ,
    * which is all internal (collision analysis in DedupOps.ngramPosts).
    * Spark's split passes limit −1, so TRAILING empty tokens are KEPT
    * (unlike Java's default split) — the kernel mirrors that. Emits
    * max(numTokens−n+1, 0) hashes: shorter-than-n docs yield NOTHING,
    * mirroring the `greatest(size−(n−1), 0)`-width slice construction
    * that feeds explode.
    */
  case class TokenNgramHashes(child: Expression, n: Int)
      extends UnaryExpression {
    require(n > 0, "ngram width must be positive")
    override def checkInputDataTypes()
        : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
      child.dataType match {
        case StringType =>
          org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
        case other =>
          org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
            s"token_ngram_hashes expects string, got ${other.simpleString}")
      }
    override def dataType: DataType = ArrayType(LongType, false)
    override def prettyName: String = "token_ngram_hashes"

    override def nullSafeEval(input: Any): Any =
      TextExprs.tokenNgramHash(input.asInstanceOf[UTF8String], n)

    override protected def doGenCode(ctx: CodegenContext,
        ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, c => {
        s"""
        ${ev.value} = graft.functions.TextExprs.tokenNgramHash($c, $n);
        """
      })

    override protected def withNewChildInternal(
        newChild: Expression): Expression = copy(newChild, n)
  }

  /** The hashing kernel — also the call target of the generated code. */
  def tokenNgramHash(s: UTF8String, n: Int): ArrayData = {
    val js = s.toString
    // split at EVERY single space, trailing empties KEPT (limit -1) —
    // exactly Spark's split(text, " ")
    val toks = js.split(" ", -1)
    val nTok = toks.length
    val nWin = math.max(nTok - (n - 1), 0)
    val out = new Array[Long](nWin)
    var w = 0
    while (w < nWin) {
      var h = FnvBasis
      var t = w
      while (t < w + n) {
        if (t > w) h = fnvStep(h, ' ')  // the concat_ws joiner
        val tok = toks(t)
        var i = 0
        while (i < tok.length) {
          val cp = tok.codePointAt(i)
          h = fnvStep(h, cp)
          i += Character.charCount(cp)
        }
        t += 1
      }
      out(w) = fmix64(h)
      w += 1
    }
    // flat unboxed buffer — GenericArrayData's primitive ctor would
    // box every element on exactly the hot path these kernels exist
    // to de-allocate
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
      .fromPrimitiveArray(out)
  }

  /** Fused strip+collapse normalizer — one pass emitting the input with
    * every char outside [a-z0-9 ] removed and space runs collapsed to
    * one, i.e. exactly
    * `regexp_replace(regexp_replace(x, "[^a-z0-9 ]", ""), "  +", " ")`
    * without the two regex-engine passes. Case folding is NOT part of
    * the kernel: lowercase first with Spark's `lower()` (replicating its
    * unicode case mapping would be a divergence risk for zero gain —
    * this kernel only ever drops or copies ASCII chars, which is
    * unicode-safe by construction).
    */
  case class AsciiStripCollapse(child: Expression) extends UnaryExpression {
    override def checkInputDataTypes()
        : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
      child.dataType match {
        case StringType =>
          org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
        case other =>
          org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
            s"ascii_strip_collapse expects string, got ${other.simpleString}")
      }
    override def dataType: DataType = StringType
    override def prettyName: String = "ascii_strip_collapse"

    override def nullSafeEval(input: Any): Any =
      TextExprs.asciiStripCollapse(input.asInstanceOf[UTF8String])

    override protected def doGenCode(ctx: CodegenContext,
        ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, c => {
        s"""
        ${ev.value} = graft.functions.TextExprs.asciiStripCollapse($c);
        """
      })

    override protected def withNewChildInternal(
        newChild: Expression): Expression = copy(newChild)
  }

  /** The normalizing kernel — also the call target of generated code. */
  def asciiStripCollapse(s: UTF8String): UTF8String = {
    val js = s.toString
    val sb = new java.lang.StringBuilder(js.length)
    var last: Char = 0
    var i = 0
    while (i < js.length) {
      val cp = js.codePointAt(i)
      val keep = (cp >= 'a' && cp <= 'z') || (cp >= '0' && cp <= '9') ||
        cp == ' '
      if (keep && !(cp == ' ' && last == ' ')) {
        sb.append(cp.toChar)
        last = cp.toChar
      }
      i += Character.charCount(cp)
    }
    UTF8String.fromString(sb.toString)
  }

  /** Column-API face of [[AsciiStripCollapse]]. */
  def asciiStripCollapse(text: Column): Column =
    Bridge.column(AsciiStripCollapse(Bridge.expression(text)))

  /** Column-API face of [[TokenNgramHashes]]. */
  def tokenNgramHashes(text: Column, n: Int): Column =
    Bridge.column(TokenNgramHashes(Bridge.expression(text), n))

  /** Fused sort+dedupe of an array<long> — the per-document DISTINCT SET
    * construction done inside the row instead of shuffling every posting
    * through `explode(...).distinct()`. Emits the elements ascending
    * (signed, matching `sort_array` and [[SortedIntersectSize]]'s merge
    * order), so the output feeds the verification kernel directly.
    * Replacing the posting-level distinct with this kernel removes the
    * dedup pipelines' biggest shuffle: per-doc set semantics are a row-
    * local property, so at 100 TB they should cost zero network bytes.
    * Equality with `sort_array(array_distinct(...))` is spec-pinned.
    */
  case class SortedDistinctLongs(child: Expression) extends UnaryExpression {
    override def checkInputDataTypes()
        : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
      child.dataType match {
        case ArrayType(LongType, false) =>
          org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
        case other =>
          org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
            s"sorted_distinct_longs expects array<bigint> (non-null " +
              s"elements), got ${other.simpleString}")
      }
    override def dataType: DataType = ArrayType(LongType, false)
    override def prettyName: String = "sorted_distinct_longs"

    override def nullSafeEval(input: Any): Any =
      TextExprs.sortedDistinctLongs(input.asInstanceOf[ArrayData])

    override protected def doGenCode(ctx: CodegenContext,
        ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, c => {
        s"""
        ${ev.value} = graft.functions.TextExprs.sortedDistinctLongs($c);
        """
      })

    override protected def withNewChildInternal(
        newChild: Expression): Expression = copy(newChild)
  }

  /** The sort+dedupe kernel — also the call target of generated code. */
  def sortedDistinctLongs(arr: ArrayData): ArrayData = {
    val a = arr.toLongArray()
    java.util.Arrays.sort(a)
    var m = 0
    var i = 0
    while (i < a.length) {
      if (m == 0 || a(i) != a(m - 1)) { a(m) = a(i); m += 1 }
      i += 1
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
      .fromPrimitiveArray(if (m == a.length) a else
        java.util.Arrays.copyOf(a, m))
  }

  /** Column-API face of [[SortedDistinctLongs]]. */
  def sortedDistinctLongs(arr: Column): Column =
    Bridge.column(SortedDistinctLongs(Bridge.expression(arr)))

  /** Fused MinHash signature: the K per-permutation minima of a document's
    * hashed gram set, computed row-locally in one pass. Bit-identical to
    * `groupBy(doc_id).agg(min(xxhash64(g, lit(j))) for j < K)` over the
    * exploded postings (spec-pinned): per gram g the kernel computes
    * Spark's xxhash64 chain — `hashInt(j, hashLong(g, 42))` — reusing the
    * inner `hashLong(g, 42)` across all K permutations, which the
    * column-wise form recomputes K times.
    *
    * Scale: the aggregate form shuffles EVERY posting row into a
    * K+1-column hash aggregate (and pays a multi-second codegen/JIT for
    * the 97-wide plan — NOTES.md); this kernel makes the signature a
    * per-row projection over the document scan — zero shuffle, narrow
    * plan, and the first shuffle of the minhash pipeline becomes the
    * tiny banded candidate join. Empty gram set → null (no signature),
    * matching the aggregate form where such docs simply have no rows.
    */
  case class MinhashSignature(child: Expression, k: Int)
      extends UnaryExpression {
    require(k > 0, "signature width must be positive")
    override def checkInputDataTypes()
        : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
      child.dataType match {
        case ArrayType(LongType, false) =>
          org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
        case other =>
          org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
            s"minhash_signature expects array<bigint> (non-null " +
              s"elements), got ${other.simpleString}")
      }
    override def dataType: DataType = ArrayType(LongType, false)
    override def nullable: Boolean = true
    override def prettyName: String = "minhash_signature"

    override def nullSafeEval(input: Any): Any =
      TextExprs.minhashSignature(input.asInstanceOf[ArrayData], k)

    override protected def doGenCode(ctx: CodegenContext,
        ev: ExprCode): ExprCode =
      // the kernel returns null for an empty gram set — surface that as
      // SQL null by assigning isNull inside the null-safe block (the
      // same pattern SortedIntersectSize uses for mid-loop nulls)
      nullSafeCodeGen(ctx, ev, c => {
        s"""
        ${ev.value} = graft.functions.TextExprs.minhashSignature($c, $k);
        ${ev.isNull} = ${ev.value} == null;
        """
      })

    override protected def withNewChildInternal(
        newChild: Expression): Expression = copy(newChild, k)
  }

  /** The signature kernel — also the call target of generated code.
    * Returns null for an empty gram set.
    */
  def minhashSignature(arr: ArrayData, k: Int): ArrayData = {
    import org.apache.spark.sql.catalyst.expressions.XXH64
    val n = arr.numElements()
    if (n == 0) return null
    val out = new Array[Long](k)
    java.util.Arrays.fill(out, Long.MaxValue)
    var i = 0
    while (i < n) {
      val base = XXH64.hashLong(arr.getLong(i), 42L)
      var j = 0
      while (j < k) {
        val v = XXH64.hashInt(j, base)
        if (v < out(j)) out(j) = v
        j += 1
      }
      i += 1
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
      .fromPrimitiveArray(out)
  }

  /** Column-API face of [[MinhashSignature]]. */
  def minhashSignature(arr: Column, k: Int): Column =
    Bridge.column(MinhashSignature(Bridge.expression(arr), k))

  /** Fused 64-bit SimHash of the single-space tokenization: per token t,
    * h = the SAME FNV-1a-over-code-points + fmix64 hash every window
    * kernel here uses (== each element of [[tokenNgramHash]](text, 1) —
    * one hash-primitive family, so the constants cannot drift); per bit
    * position, count +1/−1 by the bit of h; the signature sets the bits
    * with positive balance. Bit-identical to the explode+64-sum-aggregate
    * formulation [[graft.operators.DedupOps.simhash]] (spec-pinned):
    * tokenization mirrors `split(text, " ")` with limit −1 (split at
    * EVERY space, empty tokens kept). The code-point fold is also what
    * makes the signature CROSS-ENGINE verifiable: DuckDB's substr/ascii
    * walk code points, so the dedup_simhash oracle replays the exact
    * fold with HUGEINT modular arithmetic. Turns the simhash pipeline's
    * posting shuffle + 64-column aggregate into a per-row projection.
    */
  case class SimhashSignature(child: Expression) extends UnaryExpression {
    override def checkInputDataTypes()
        : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
      child.dataType match {
        case StringType =>
          org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
        case other =>
          org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
            s"simhash_signature expects string, got ${other.simpleString}")
      }
    override def dataType: DataType = LongType
    override def prettyName: String = "simhash_signature"

    override def nullSafeEval(input: Any): Any =
      TextExprs.simhashSignature(input.asInstanceOf[UTF8String])

    override protected def doGenCode(ctx: CodegenContext,
        ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, c => {
        s"""
        ${ev.value} = graft.functions.TextExprs.simhashSignature($c);
        """
      })

    override protected def withNewChildInternal(
        newChild: Expression): Expression = copy(newChild)
  }

  /** The simhash kernel — also the call target of generated code. */
  def simhashSignature(s: UTF8String): Long = {
    val toks = s.toString.split(" ", -1)
    val cnt = new Array[Int](64)
    var t = 0
    while (t < toks.length) {
      val tok = toks(t)
      var h0 = FnvBasis
      var i = 0
      while (i < tok.length) {
        val cp = tok.codePointAt(i)
        h0 = fnvStep(h0, cp)
        i += Character.charCount(cp)
      }
      val h = fmix64(h0)
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) cnt(b) += 1 else cnt(b) -= 1
        b += 1
      }
      t += 1
    }
    var sig = 0L
    var b = 0
    while (b < 64) {
      if (cnt(b) > 0) sig |= (1L << b)
      b += 1
    }
    sig
  }

  /** Column-API face of [[SimhashSignature]]. */
  def simhashSignature(text: Column): Column =
    Bridge.column(SimhashSignature(Bridge.expression(text)))

  /** Fused token Shannon entropy (bits) of the single-space tokenization:
    * H = log2(N) − (Σ c_t·log2 c_t)/N over per-token occurrence counts —
    * the "natural-language vs boilerplate/noise" quality signal (low
    * entropy = heavy repetition, high = diverse vocabulary). One pass,
    * one hash map per row; the builtin formulation (explode → count per
    * (doc, token) → per-doc aggregate) costs two shuffles of every token
    * for a row-local property. Tokenization mirrors `split(text, " ")`
    * with limit −1 (empty tokens kept), matching the other token kernels.
    * Consumers should round before cross-engine comparison: the float
    * summation order differs between engines (and from DuckDB's) at the
    * last bits.
    */
  case class TokenEntropy(child: Expression) extends UnaryExpression {
    override def checkInputDataTypes()
        : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
      child.dataType match {
        case StringType =>
          org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
        case other =>
          org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
            s"token_entropy expects string, got ${other.simpleString}")
      }
    override def dataType: DataType =
      org.apache.spark.sql.types.DoubleType
    override def prettyName: String = "token_entropy"

    override def nullSafeEval(input: Any): Any =
      TextExprs.tokenEntropy(input.asInstanceOf[UTF8String])

    override protected def doGenCode(ctx: CodegenContext,
        ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, c => {
        s"""
        ${ev.value} = graft.functions.TextExprs.tokenEntropy($c);
        """
      })

    override protected def withNewChildInternal(
        newChild: Expression): Expression = copy(newChild)
  }

  /** The entropy kernel — also the call target of generated code. */
  def tokenEntropy(s: UTF8String): Double = {
    val toks = s.toString.split(" ", -1)
    val counts = new java.util.HashMap[String, Int](
      math.min(toks.length * 2, 1 << 10))
    var i = 0
    while (i < toks.length) {
      counts.merge(toks(i), 1, (a, b) => a + b)
      i += 1
    }
    val n = toks.length.toDouble
    val ln2 = math.log(2.0)
    var acc = 0.0
    val it = counts.values().iterator()
    while (it.hasNext) {
      val c = it.next().toDouble
      acc += c * (math.log(c) / ln2)
    }
    math.log(n) / ln2 - acc / n
  }

  /** Column-API face of [[TokenEntropy]]. */
  def tokenEntropy(text: Column): Column =
    Bridge.column(TokenEntropy(Bridge.expression(text)))

  /** |A∩B| of two SORTED string arrays by a fused two-pointer merge —
    * O(|A|+|B|) comparisons inside whole-stage codegen. This is the
    * exact-Jaccard verification kernel: per candidate PAIR, intersect the
    * two documents' sorted gram sets directly, instead of exploding each
    * pair into per-posting join rows (candidates × avg-set-size rows
    * through a shuffle) or `array_intersect` (O(m²) interpreted).
    * Inputs MUST be sorted ascending with distinct elements
    * (`sort_array(collect_list(...))` over distinct postings) — violations
    * undercount silently, so build the arrays only from the constructions
    * in DedupOps. Null array → null; null elements are not expected and
    * make the result null.
    */
  case class SortedIntersectSize(left: Expression, right: Expression)
      extends BinaryExpression {

    // element type drives the comparison: UTF8String.compareTo for
    // string sets, Long.compare for hashed-gram sets (the 8-byte keys
    // the dedup pipelines shuffle at scale)
    private lazy val longElems: Boolean = left.dataType match {
      case ArrayType(LongType, _) => true
      case _ => false
    }

    override def checkInputDataTypes()
        : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
      val ok = Seq(StringType, LongType).exists(t =>
        Seq(left, right).forall(_.dataType match {
          case ArrayType(e, _) => e == t
          case _ => false
        }))
      if (ok) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        "sorted_intersect_size expects two array<string> or two " +
          s"array<bigint>, got " +
          s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
    }
    override def dataType: DataType = IntegerType
    override def nullable: Boolean = true
    override def prettyName: String = "sorted_intersect_size"

    override def nullSafeEval(a: Any, b: Any): Any = {
      val x = a.asInstanceOf[ArrayData]
      val y = b.asInstanceOf[ArrayData]
      val nx = x.numElements(); val ny = y.numElements()
      var i = 0; var j = 0; var c = 0
      while (i < nx && j < ny) {
        if (x.isNullAt(i) || y.isNullAt(j)) return null
        val cmp =
          if (longElems) java.lang.Long.compare(x.getLong(i), y.getLong(j))
          else x.getUTF8String(i).compareTo(y.getUTF8String(j))
        if (cmp == 0) { c += 1; i += 1; j += 1 }
        else if (cmp < 0) i += 1
        else j += 1
      }
      c
    }

    override protected def doGenCode(ctx: CodegenContext,
        ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) => {
        val i = ctx.freshName("i"); val j = ctx.freshName("j")
        val nx = ctx.freshName("nx"); val ny = ctx.freshName("ny")
        val c = ctx.freshName("c"); val cmp = ctx.freshName("cmp")
        val cmpExpr =
          if (longElems) s"java.lang.Long.compare($a.getLong($i), $b.getLong($j))"
          else s"$a.getUTF8String($i).compareTo($b.getUTF8String($j))"
        s"""
        final int $nx = $a.numElements();
        final int $ny = $b.numElements();
        int $i = 0; int $j = 0; int $c = 0;
        while ($i < $nx && $j < $ny) {
          if ($a.isNullAt($i) || $b.isNullAt($j)) { ${ev.isNull} = true; break; }
          final int $cmp = $cmpExpr;
          if ($cmp == 0) { $c++; $i++; $j++; }
          else if ($cmp < 0) { $i++; } else { $j++; }
        }
        if (!${ev.isNull}) { ${ev.value} = $c; }
        """
      })

    override protected def withNewChildrenInternal(newLeft: Expression,
        newRight: Expression): Expression = copy(newLeft, newRight)
  }

  /** Column-API face of [[SortedIntersectSize]]. */
  def sortedIntersectSize(a: Column, b: Column): Column =
    Bridge.column(SortedIntersectSize(
      Bridge.expression(a), Bridge.expression(b)))

  // --------------------------------------------------------------------
  // Fused PII scan
  // --------------------------------------------------------------------

  /** Fused PII scanner — replaces the 6 regex-engine passes of the
    * composed `text_pii_scrub` form (3 `regexp_count` on the raw text +
    * 3 sequential `regexp_replace`, each materializing an intermediate
    * string) with hand-rolled byte scans over the UTF8String, emitting
    * struct(n_emails, n_ips, n_phones, scrubbed) in one expression.
    *
    * Semantics are EXACTLY the composed form's (TextOpsSpec pins
    * equality by property over adversarial corpora):
    *   - counts = non-overlapping leftmost matches of each pattern
    *     counted INDEPENDENTLY on the RAW text (`regexp_count`);
    *   - scrubbed = sequential email → IP → phone replacement.
    * The sequential chain is NOT "first pattern to match at each
    * position": in `"111 222 3333@x.cc"` the email pass consumes
    * `3333@x.cc` FIRST, so the phone match that exists on the raw text
    * is never replaced (`"111 222 <EMAIL>"`, n_phones = 1). The kernel
    * reproduces this by finding email spans first, then IP matches
    * restricted to the gaps between email spans, then phone matches in
    * the gaps of both — valid because the replacement tokens contain no
    * digits or dots, so a later-pass match can never overlap or span a
    * replaced region (each gap is byte-identical between the raw and
    * the partially-replaced string).
    *
    * All three patterns are pure-ASCII, so the scan runs on UTF-8 BYTES
    * (multibyte sequences are ≥ 0x80 and can never match), skipping the
    * UTF8String→String conversion entirely. Pattern semantics mirror
    * Java regex leftmost + greedy-with-backtracking on the exact
    * patterns [[graft.operators.TextOps.EmailPat]]/Ipv4Pat/PhonePat:
    *   - email domain backtracking resolves to "rightmost dot in the
    *     maximal domain-char run that is followed by ≥2 alphas, with ≥1
    *     domain char before it"; the match ends after the maximal alpha
    *     run following that dot (`a@b.cc-dd` → `a@b.cc`);
    *   - IPv4 octet runs are delimiter-forced, so the {1,3} backtrack
    *     collapses to "digit run of 1–3 then a literal dot" (a 4+ digit
    *     run fails the start position and the engine re-tries one byte
    *     later: `1234.5.6.7` matches at offset 1); the final octet
    *     greedily takes ≤3 digits and may leave trailing digits;
    *   - phone is fixed-shape 3-sep-3-sep-4 with sep ∈ {'-', ' '}.
    * A failed attempt advances one byte; a match advances to its end
    * (non-overlapping scan), exactly like Matcher.find/appendReplacement.
    */
  case class PiiScan(child: Expression) extends UnaryExpression {
    override def checkInputDataTypes()
        : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
      child.dataType match {
        case StringType =>
          org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
        case other =>
          org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
            s"pii_scan expects string, got ${other.simpleString}")
      }
    override def dataType: DataType = PiiScan.schema
    override def prettyName: String = "pii_scan"

    override def nullSafeEval(input: Any): Any =
      piiScan(input.asInstanceOf[UTF8String])

    override protected def doGenCode(ctx: CodegenContext,
        ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, c => {
        // kernel lives ONCE in the scala object (the win is dropping the
        // regex engines + intermediate strings, not inlining the loop)
        s"""
        ${ev.value} = graft.functions.TextExprs.piiScan($c);
        """
      })

    override protected def withNewChildInternal(
        newChild: Expression): Expression = copy(newChild)
  }

  object PiiScan {
    import org.apache.spark.sql.types.{StringType => SType, StructType}
    val schema: StructType = new StructType()
      .add("n_emails", LongType).add("n_ips", LongType)
      .add("n_phones", LongType).add("scrubbed", SType)
  }

  @inline private def isDigitB(b: Byte): Boolean = b >= '0' && b <= '9'
  @inline private def isAlphaB(b: Byte): Boolean =
    (b >= 'A' && b <= 'Z') || (b >= 'a' && b <= 'z')
  /** Email local-part class `[A-Za-z0-9._%+-]`. */
  @inline private def isLocalB(b: Byte): Boolean =
    isAlphaB(b) || isDigitB(b) || b == '.' || b == '_' || b == '%' ||
      b == '+' || b == '-'
  /** Email domain class `[A-Za-z0-9.-]`. */
  @inline private def isDomainB(b: Byte): Boolean =
    isAlphaB(b) || isDigitB(b) || b == '.' || b == '-'

  /** Leftmost non-overlapping email matches; appends (start, end) byte
    * offsets. Anchored on '@': the leftmost match through a given '@' is
    * the maximal local-char run before it (clipped at the previous
    * match's end — Java's scan never re-reads consumed input).
    */
  private def findEmailSpans(s: UTF8String, n: Int,
      spans: java.util.ArrayList[Int]): Unit = {
    var scan = 0
    var at = 0
    while (at < n) {
      if (s.getByte(at) == '@') {
        var ls = at
        while (ls > scan && isLocalB(s.getByte(ls - 1))) ls -= 1
        if (ls < at) {
          var de = at + 1
          while (de < n && isDomainB(s.getByte(de))) de += 1
          // rightmost '.' with >=1 domain char before it and >=2 alphas
          // after (longest-A-first backtracking of `[A-Za-z0-9.-]+[.]`)
          var d = de - 3
          var found = -1
          while (d >= at + 2 && found < 0) {
            if (s.getByte(d) == '.' && isAlphaB(s.getByte(d + 1)) &&
                isAlphaB(s.getByte(d + 2))) found = d
            else d -= 1
          }
          if (found >= 0) {
            var e = found + 3
            while (e < n && isAlphaB(s.getByte(e))) e += 1
            spans.add(ls); spans.add(e)
            scan = e
            at = e - 1 // outer increment lands on e
          }
        }
      }
      at += 1
    }
  }

  /** `([0-9]{1,3}[.]){3}[0-9]{1,3}` at i0 within [i0, hi); end or -1. */
  private def tryIp(s: UTF8String, i0: Int, hi: Int): Int = {
    var i = i0
    var oct = 0
    while (oct < 3) {
      var r = 0
      while (i < hi && r < 4 && isDigitB(s.getByte(i))) { i += 1; r += 1 }
      if (r < 1 || r > 3) return -1
      if (i >= hi || s.getByte(i) != '.') return -1
      i += 1
      oct += 1
    }
    var r = 0
    while (i < hi && r < 3 && isDigitB(s.getByte(i))) { i += 1; r += 1 }
    if (r < 1) -1 else i
  }

  /** `[0-9]{3}[- ][0-9]{3}[- ][0-9]{4}` at i0 within [i0, hi). */
  private def tryPhone(s: UTF8String, i0: Int, hi: Int): Int = {
    if (i0 + 12 > hi) return -1
    var k = 0
    while (k < 3) {
      if (!isDigitB(s.getByte(i0 + k))) return -1; k += 1
    }
    var b = s.getByte(i0 + 3)
    if (b != '-' && b != ' ') return -1
    k = 0
    while (k < 3) {
      if (!isDigitB(s.getByte(i0 + 4 + k))) return -1; k += 1
    }
    b = s.getByte(i0 + 7)
    if (b != '-' && b != ' ') return -1
    k = 0
    while (k < 4) {
      if (!isDigitB(s.getByte(i0 + 8 + k))) return -1; k += 1
    }
    i0 + 12
  }

  /** Non-overlapping leftmost scan of [lo, hi); returns the match count
    * and, when `spans` is non-null, appends (start, end) pairs. Both
    * patterns start with a digit, so non-digit bytes are skipped with a
    * single compare.
    */
  private def scanDigitPat(s: UTF8String, lo: Int, hi: Int, phone: Boolean,
      spans: java.util.ArrayList[Int]): Int = {
    var i = lo
    var c = 0
    while (i < hi) {
      if (isDigitB(s.getByte(i))) {
        val e = if (phone) tryPhone(s, i, hi) else tryIp(s, i, hi)
        if (e > 0) {
          c += 1
          if (spans != null) { spans.add(i); spans.add(e) }
          i = e
        } else i += 1
      } else i += 1
    }
    c
  }

  /** Scans the gaps of [0, n) not covered by `mask` (sorted disjoint
    * (start, end) pairs), appending matches to `spans` and returning the
    * count. A match can never cross a gap boundary (masked regions were
    * replaced by digit-free, dot-free tokens).
    */
  private def scanGaps(s: UTF8String, n: Int,
      mask: java.util.ArrayList[Int], phone: Boolean,
      spans: java.util.ArrayList[Int]): Int = {
    var c = 0
    var gapStart = 0
    var k = 0
    val pairs = mask.size() / 2
    while (k <= pairs) {
      val gapEnd = if (k < pairs) mask.get(2 * k) else n
      c += scanDigitPat(s, gapStart, gapEnd, phone, spans)
      if (k < pairs) gapStart = mask.get(2 * k + 1)
      k += 1
    }
    c
  }

  /** Merges two sorted disjoint span lists into one sorted list. */
  private def mergeSpans(a: java.util.ArrayList[Int],
      b: java.util.ArrayList[Int]): java.util.ArrayList[Int] = {
    if (a.isEmpty) return b
    if (b.isEmpty) return a
    val out = new java.util.ArrayList[Int](a.size() + b.size())
    var i = 0; var j = 0
    while (i < a.size() || j < b.size()) {
      val takeA = j >= b.size() || (i < a.size() && a.get(i) < b.get(j))
      if (takeA) { out.add(a.get(i)); out.add(a.get(i + 1)); i += 2 }
      else { out.add(b.get(j)); out.add(b.get(j + 1)); j += 2 }
    }
    out
  }

  private val EmailTok = "<EMAIL>".getBytes("UTF-8")
  private val IpTok = "<IP>".getBytes("UTF-8")
  private val PhoneTok = "<PHONE>".getBytes("UTF-8")

  /** The fused kernel — also the call target of the generated code. */
  def piiScan(s: UTF8String): org.apache.spark.sql.catalyst.InternalRow = {
    val n = s.numBytes()
    // one cheap pre-pass: most corpus text has neither '@' nor digits
    var hasAt = false; var hasDigit = false
    var i = 0
    while (i < n && !(hasAt && hasDigit)) {
      val b = s.getByte(i)
      if (b == '@') hasAt = true
      else if (b >= '0' && b <= '9') hasDigit = true
      i += 1
    }
    if (!hasAt && !hasDigit)
      return new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
        Array[Any](0L, 0L, 0L, s.clone()))

    val emailSpans = new java.util.ArrayList[Int]()
    if (hasAt) findEmailSpans(s, n, emailSpans)
    val nEmails = emailSpans.size() / 2

    var nIps = 0
    var nPhones = 0
    val ipSpans = new java.util.ArrayList[Int]()
    val phoneSpans = new java.util.ArrayList[Int]()
    if (hasDigit) {
      if (nEmails == 0) {
        // scrub matches == raw-count matches; one scan serves both
        nIps = scanDigitPat(s, 0, n, phone = false, ipSpans)
      } else {
        nIps = scanDigitPat(s, 0, n, phone = false, null)
        scanGaps(s, n, emailSpans, phone = false, ipSpans)
      }
      val mask = mergeSpans(emailSpans, ipSpans)
      if (mask.isEmpty) {
        nPhones = scanDigitPat(s, 0, n, phone = true, phoneSpans)
      } else {
        nPhones = scanDigitPat(s, 0, n, phone = true, null)
        scanGaps(s, n, mask, phone = true, phoneSpans)
      }
    }

    val scrubbed =
      if (nEmails == 0 && ipSpans.isEmpty && phoneSpans.isEmpty) s.clone()
      else buildScrubbed(s, n, emailSpans, ipSpans, phoneSpans)
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](nEmails.toLong, nIps.toLong, nPhones.toLong, scrubbed))
  }

  /** Three-way merge of the (sorted, mutually disjoint) span lists into
    * the replaced string — single output allocation, byte copies only.
    */
  private def buildScrubbed(s: UTF8String, n: Int,
      emails: java.util.ArrayList[Int], ips: java.util.ArrayList[Int],
      phones: java.util.ArrayList[Int]): UTF8String = {
    var removed = 0
    var added = 0
    var k = 0
    while (k < emails.size()) {
      removed += emails.get(k + 1) - emails.get(k); added += EmailTok.length
      k += 2
    }
    k = 0
    while (k < ips.size()) {
      removed += ips.get(k + 1) - ips.get(k); added += IpTok.length
      k += 2
    }
    k = 0
    while (k < phones.size()) {
      removed += phones.get(k + 1) - phones.get(k); added += PhoneTok.length
      k += 2
    }
    val src = s.getBytes
    val out = new Array[Byte](n - removed + added)
    var pos = 0 // read cursor in src
    var w = 0 // write cursor in out
    var ie = 0; var ii = 0; var ip = 0
    while (ie < emails.size() || ii < ips.size() || ip < phones.size()) {
      val se = if (ie < emails.size()) emails.get(ie) else Int.MaxValue
      val si = if (ii < ips.size()) ips.get(ii) else Int.MaxValue
      val sp = if (ip < phones.size()) phones.get(ip) else Int.MaxValue
      var start = 0; var end = 0; var tok: Array[Byte] = null
      if (se <= si && se <= sp) {
        start = se; end = emails.get(ie + 1); tok = EmailTok; ie += 2
      } else if (si <= sp) {
        start = si; end = ips.get(ii + 1); tok = IpTok; ii += 2
      } else {
        start = sp; end = phones.get(ip + 1); tok = PhoneTok; ip += 2
      }
      System.arraycopy(src, pos, out, w, start - pos)
      w += start - pos
      System.arraycopy(tok, 0, out, w, tok.length)
      w += tok.length
      pos = end
    }
    System.arraycopy(src, pos, out, w, n - pos)
    UTF8String.fromBytes(out)
  }

  /** Column-API face of [[PiiScan]]. */
  def piiScan(text: Column): Column =
    Bridge.column(PiiScan(Bridge.expression(text)))
}
