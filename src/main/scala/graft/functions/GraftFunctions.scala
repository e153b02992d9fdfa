package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.IntegerType

/** The engine's SQL function surface — every custom Catalyst expression
  * exposed by name, so `spark.sql("SELECT token_entropy(text) ...")` works
  * the same as the Column API. ONE definition of the (id, info, builder)
  * triples, shared by [[VectorExprs.registerFunctions]] (live-session
  * registration, what `Tables.registerAll` calls) and [[GraftExtensions]]
  * (`spark.sql.extensions` injection for production sessions).
  *
  * Width arguments (shingle n, signature k) must be INT literals — they
  * parameterize the expression instance itself, exactly like the Column
  * API's Int parameters.
  */
object GraftFunctions {
  type Triple =
    (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)

  private def triple(name: String, cls: Class[_], arity: Int)(
      b: Seq[Expression] => Expression): Triple =
    (FunctionIdentifier(name), new ExpressionInfo(cls.getCanonicalName, name),
      (args: Seq[Expression]) => {
        require(args.length == arity,
          s"$name takes exactly $arity arguments")
        b(args)
      })

  private def litInt(name: String, arg: String, e: Expression): Int =
    e match {
      case Literal(v: Int, IntegerType) => v
      case other => throw new IllegalArgumentException(
        s"$name: $arg must be an INT literal, got $other")
    }

  private def litDoubleArray(name: String, arg: String,
      e: Expression): Seq[Double] = {
    import org.apache.spark.sql.types.{ArrayType, NumericType}
    // any numeric element type: SQL `array(0.5, 1.5)` parses as
    // array<decimal(2,1)>, so an exact ARRAY<DOUBLE> match would reject
    // the natural call form
    e.dataType match {
      case ArrayType(_: NumericType, n) if e.foldable =>
        val widened = org.apache.spark.sql.catalyst.expressions.Cast(
          e, ArrayType(org.apache.spark.sql.types.DoubleType, n))
        widened.eval() match {
          case a: org.apache.spark.sql.catalyst.util.ArrayData =>
            // a NULL element would otherwise surface as an opaque
            // NPE/assertion out of toDoubleArray — name the error
            var i = 0
            while (i < a.numElements()) {
              if (a.isNullAt(i)) throw new IllegalArgumentException(
                s"$name: $arg must not contain NULL elements (element $i)")
              i += 1
            }
            a.toDoubleArray().toSeq
          case other => throw new IllegalArgumentException(
            s"$name: $arg did not fold to an array, got $other")
        }
      case _ => throw new IllegalArgumentException(
        s"$name: $arg must be a foldable numeric-array literal, got $e")
    }
  }

  val all: Seq[Triple] = Seq(
    triple("cosine_sim", classOf[VectorExprs.CosineSimilarity], 2)(a =>
      VectorExprs.CosineSimilarity(a(0), a(1))),
    triple("vec_dist2", classOf[VectorExprs.SquaredL2Distance], 2)(a =>
      VectorExprs.SquaredL2Distance(a(0), a(1))),
    triple("int8_quantize", classOf[VectorExprs.Int8Quantize], 1)(a =>
      VectorExprs.Int8Quantize(a(0))),
    triple("poly_fingerprint", classOf[TextExprs.PolyFingerprint], 1)(a =>
      TextExprs.PolyFingerprint(a(0))),
    triple("char_class_counts", classOf[TextExprs.CharClassCounts], 1)(a =>
      TextExprs.CharClassCounts(a(0))),
    triple("ascii_strip_collapse", classOf[TextExprs.AsciiStripCollapse], 1)(
      a => TextExprs.AsciiStripCollapse(a(0))),
    triple("shingle_hashes", classOf[TextExprs.ShingleHashes], 2)(a =>
      TextExprs.ShingleHashes(a(0),
        litInt("shingle_hashes", "n", a(1)))),
    triple("token_ngram_hashes", classOf[TextExprs.TokenNgramHashes], 2)(a =>
      TextExprs.TokenNgramHashes(a(0),
        litInt("token_ngram_hashes", "n", a(1)))),
    triple("sorted_distinct_longs", classOf[TextExprs.SortedDistinctLongs], 1)(
      a => TextExprs.SortedDistinctLongs(a(0))),
    triple("minhash_signature", classOf[TextExprs.MinhashSignature], 2)(a =>
      TextExprs.MinhashSignature(a(0),
        litInt("minhash_signature", "k", a(1)))),
    triple("simhash_signature", classOf[TextExprs.SimhashSignature], 1)(a =>
      TextExprs.SimhashSignature(a(0))),
    triple("token_entropy", classOf[TextExprs.TokenEntropy], 1)(a =>
      TextExprs.TokenEntropy(a(0))),
    triple("sorted_intersect_size", classOf[TextExprs.SortedIntersectSize], 2)(
      a => TextExprs.SortedIntersectSize(a(0), a(1))),
    triple("z_value", classOf[LayoutExprs.ZValue], 2)(a =>
      LayoutExprs.ZValue(a(0), a(1))),
    // boundaries must be a foldable array<double> (e.g. array(0.5, 1.5))
    // — they parameterize the expression instance like the width args do
    triple("bucket_index", classOf[LayoutExprs.BucketIndex], 2)(a =>
      LayoutExprs.BucketIndex(a(0), litDoubleArray("bucket_index",
        "bounds", a(1)))),
    triple("mix64", classOf[LayoutExprs.Mix64], 1)(a =>
      LayoutExprs.Mix64(a(0))),
    // pq_encode has no SQL face: its codebook tensor is a driver-built
    // object, not a SQL-expressible literal (the BloomExprs precedent) —
    // the serving-side ADC kernel is column-to-column and registers fine
    triple("pq_adc_dot", classOf[PqExprs.PqAdcDot], 2)(a =>
      PqExprs.PqAdcDot(a(0), a(1))),
    // BloomExprs.BloomMightContainLong has no SQL face: its filter
    // argument is a driver-built sketch object, not a SQL-expressible
    // literal (Spark's own might_contain is internal-only for the same
    // reason)
  )

  /** Register the whole surface on a live session. */
  def registerAll(spark: SparkSession): Unit =
    all.foreach { case (id, info, b) =>
      Bridge.registerFunction(spark, id, info, b)
    }
}
