package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{ArrayType, ByteType, DataType, DoubleType}

/** Product-quantization kernels — the embedding CODE path at 100 TB.
  *
  * Int8 quantization ([[VectorExprs.Int8Quantize]]) compresses storage
  * 4×; product quantization compresses it `4·dim/m`× (dim=64, m=16: two bytes per 8 float32 coordinates — 16×; m=8: one
  * BYTE per 8 float32 coordinates — 32×) by snapping each of `m`
  * subvectors to its nearest entry in a 256-entry per-subspace codebook
  * trained offline (k-means per subspace, [[graft.operators.Pq]]). A
  * 100 TB float32 corpus becomes ~3 TB of codes; an ADC scan reads only
  * the codes and pays **m table lookups per row** instead of dim
  * multiplies.
  *
  * Two kernels:
  *  - [[PqEncode]] — maintenance-side: vector → `array<tinyint>` of m
  *    codebook ids (the one place the 256·dim work is paid, once per
  *    vector at index build).
  *  - [[PqAdcDot]] — serving-side asymmetric-distance scoring: the query
  *    is NOT quantized; its per-subspace dot products with every codebook
  *    entry are precomputed into one flat m·ks lookup table (m·ks·dsub =
  *    256·dim flops, once per QUERY, driver-side), and each row's
  *    approximate ⟨q, x⟩ is Σⱼ lut[j·ks + codeⱼ] — m array reads, no
  *    floating multiply. Column-to-column (the LUT can be a literal or a
  *    per-query column from a broadcast join), so it has a SQL face,
  *    unlike [[PqEncode]] whose codebook tensor is a driver object (the
  *    [[VectorExprs.NearestCentroids]] / BloomExprs precedent).
  *
  * Codes are stored as SIGNED bytes carrying UNSIGNED ids (`(byte) c`,
  * read back `c & 0xFF`) — ids are internal coordinates, like the hash
  * values of TextExprs, and never surface to users.
  */
object PqExprs {

  /** vector → m codebook ids, one per subspace. Argmin per subspace by
    * squared L2 with strict `<`, so ties break toward the LOWER code id
    * (the [[VectorExprs.NearestCentroids]] tie rule). Null array → null;
    * null element → null; vector length ≠ m·dsub → null (the dist2
    * length-mismatch semantics).
    *
    * `books(j)(c)` is subspace j's c-th centroid (dsub doubles); the
    * tensor rides along as ONE reference object so the generated loop is
    * constant-size at any ks (the literal-unrolled alternative grows
    * with ks — the same JIT wall NearestCentroids exists to avoid).
    */
  case class PqEncode(child: Expression, books: Array[Array[Array[Double]]])
      extends UnaryExpression {
    require(books.nonEmpty, "PqEncode needs at least one subspace codebook")
    require(books.forall(_.nonEmpty), "PqEncode: empty subspace codebook")
    require(books.forall(_.length == books(0).length),
      "PqEncode: subspace codebooks must share one size ks")
    require(books(0).length <= 256,
      s"PqEncode: ks=${books(0).length} codes cannot fit one byte")
    require(books.forall(_.forall(_.length == books(0)(0).length)),
      "PqEncode: all codebook entries must share one subvector dim")

    private val m = books.length
    private val ks = books(0).length
    private val dsub = books(0)(0).length

    // case-class equality on a nested array is reference identity —
    // compare structurally so identical expressions stay semanticEquals
    // (common-subexpression elimination; the NearestCentroids note).
    override def equals(other: Any): Boolean = other match {
      case that: PqEncode =>
        child == that.child && java.util.Arrays.deepEquals(
          books.asInstanceOf[Array[AnyRef]],
          that.books.asInstanceOf[Array[AnyRef]])
      case _ => false
    }
    override def hashCode(): Int =
      java.util.Arrays.deepHashCode(books.asInstanceOf[Array[AnyRef]]) *
        31 + child.hashCode()

    override def checkInputDataTypes(): TypeCheckResult =
      child.dataType match {
        case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
        case other => TypeCheckResult.TypeCheckFailure(
          s"pq_encode expects array<double>, got ${other.simpleString}")
      }
    override def dataType: DataType =
      ArrayType(ByteType, containsNull = false)
    override def nullable: Boolean = true
    override def prettyName: String = "pq_encode"

    override def nullSafeEval(input: Any): Any = {
      val x = input.asInstanceOf[ArrayData]
      if (x.numElements() != m * dsub) return null
      val out = new Array[Byte](m)
      var j = 0
      while (j < m) {
        val off = j * dsub
        var best = 0
        var bd = Double.PositiveInfinity
        var c = 0
        while (c < ks) {
          val cc = books(j)(c)
          var acc = 0.0
          var i = 0
          while (i < dsub) {
            if (x.isNullAt(off + i)) return null
            val d = x.getDouble(off + i) - cc(i)
            acc += d * d
            i += 1
          }
          if (acc < bd) { bd = acc; best = c }
          c += 1
        }
        out(j) = best.toByte
        j += 1
      }
      org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
        .fromPrimitiveArray(out)
    }

    override protected def doGenCode(ctx: CodegenContext,
        ev: ExprCode): ExprCode = {
      val booksRef = ctx.addReferenceObj("pqBooks", books, "double[][][]")
      nullSafeCodeGen(ctx, ev, c => {
        val j = ctx.freshName("j")
        val cIdx = ctx.freshName("c")
        val i = ctx.freshName("i")
        val off = ctx.freshName("off")
        val cc = ctx.freshName("cc")
        val acc = ctx.freshName("acc")
        val d = ctx.freshName("d")
        val best = ctx.freshName("best")
        val bd = ctx.freshName("bd")
        val out = ctx.freshName("out")
        s"""
        if ($c.numElements() != ${m * dsub}) {
          ${ev.isNull} = true;
        } else {
          final byte[] $out = new byte[$m];
          for (int $j = 0; $j < $m && !${ev.isNull}; $j++) {
            final int $off = $j * $dsub;
            int $best = 0;
            double $bd = Double.POSITIVE_INFINITY;
            for (int $cIdx = 0; $cIdx < $ks && !${ev.isNull}; $cIdx++) {
              final double[] $cc = $booksRef[$j][$cIdx];
              double $acc = 0.0;
              for (int $i = 0; $i < $dsub; $i++) {
                if ($c.isNullAt($off + $i)) { ${ev.isNull} = true; break; }
                final double $d = $c.getDouble($off + $i) - $cc[$i];
                $acc += $d * $d;
              }
              if (!${ev.isNull} && $acc < $bd) { $bd = $acc; $best = $cIdx; }
            }
            $out[$j] = (byte) $best;
          }
          if (!${ev.isNull}) {
            ${ev.value} = org.apache.spark.sql.catalyst.expressions
              .UnsafeArrayData.fromPrimitiveArray($out);
          }
        }
        """
      })
    }

    override protected def withNewChildInternal(
        newChild: Expression): Expression = copy(child = newChild)
  }

  /** Asymmetric-distance dot: Σⱼ lut[j·ks + (codesⱼ & 0xFF)] over a
    * codes column (`array<tinyint>`, m elements) and a flat LUT column
    * (`array<double>`, m·ks elements). ks is derived per row as
    * lut.length / codes.length. Null array → null; null element → null;
    * empty codes, a LUT length not divisible by m, or a code id ≥ ks
    * (geometry mismatch between encoder and LUT) → null rather than a
    * wrong-but-plausible score.
    */
  case class PqAdcDot(left: Expression, right: Expression)
      extends BinaryExpression {

    override def checkInputDataTypes(): TypeCheckResult =
      (left.dataType, right.dataType) match {
        case (ArrayType(ByteType, _), ArrayType(DoubleType, _)) =>
          TypeCheckResult.TypeCheckSuccess
        case (l, r) => TypeCheckResult.TypeCheckFailure(
          s"pq_adc_dot expects (array<tinyint>, array<double>), got " +
            s"(${l.simpleString}, ${r.simpleString})")
      }
    override def dataType: DataType = DoubleType
    override def nullable: Boolean = true
    override def prettyName: String = "pq_adc_dot"

    override def nullSafeEval(a: Any, b: Any): Any = {
      val codes = a.asInstanceOf[ArrayData]
      val lut = b.asInstanceOf[ArrayData]
      val m = codes.numElements()
      if (m == 0 || lut.numElements() % m != 0) return null
      val ks = lut.numElements() / m
      var acc = 0.0
      var j = 0
      while (j < m) {
        if (codes.isNullAt(j)) return null
        val c = codes.getByte(j) & 0xFF
        if (c >= ks) return null
        val idx = j * ks + c
        if (lut.isNullAt(idx)) return null
        acc += lut.getDouble(idx)
        j += 1
      }
      acc
    }

    override protected def doGenCode(ctx: CodegenContext,
        ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) => {
        val m = ctx.freshName("m")
        val ks = ctx.freshName("ks")
        val j = ctx.freshName("j")
        val c = ctx.freshName("c")
        val idx = ctx.freshName("idx")
        val acc = ctx.freshName("acc")
        s"""
        final int $m = $a.numElements();
        if ($m == 0 || $b.numElements() % $m != 0) {
          ${ev.isNull} = true;
        } else {
          final int $ks = $b.numElements() / $m;
          double $acc = 0.0;
          for (int $j = 0; $j < $m; $j++) {
            if ($a.isNullAt($j)) { ${ev.isNull} = true; break; }
            final int $c = $a.getByte($j) & 0xFF;
            if ($c >= $ks) { ${ev.isNull} = true; break; }
            final int $idx = $j * $ks + $c;
            if ($b.isNullAt($idx)) { ${ev.isNull} = true; break; }
            $acc += $b.getDouble($idx);
          }
          if (!${ev.isNull}) { ${ev.value} = $acc; }
        }
        """
      })

    override protected def withNewChildrenInternal(newLeft: Expression,
        newRight: Expression): Expression = copy(newLeft, newRight)
  }

  /** Column-API face of [[PqEncode]]. */
  def pqEncode(v: Column, books: Array[Array[Array[Double]]]): Column =
    Bridge.column(PqEncode(Bridge.expression(v), books))

  /** Column-API face of [[PqAdcDot]]. */
  def pqAdcDot(codes: Column, lut: Column): Column =
    Bridge.column(PqAdcDot(Bridge.expression(codes), Bridge.expression(lut)))
}
