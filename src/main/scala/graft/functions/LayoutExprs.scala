package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{DataType, DoubleType, LongType}

/** Space-filling-curve keys for multi-dimensional data layout
  * (see [[graft.operators.Layout]]).
  */
object LayoutExprs {

  /** Java source for the Morton spread (classic bit-twiddling dilation);
    * shared by eval and codegen so the two cannot drift. Inputs are
    * masked to 31 bits: with full 32-bit inputs, the odd-position key's
    * bit 31 would land on bit 63 after the interleave's `<< 1`, flipping
    * the SIGN of the z-key and breaking curve monotonicity under the
    * signed long sort.
    */
  private val SpreadBody =
    """x &= 0x7FFFFFFFL;
      |x = (x | (x << 16)) & 0x0000FFFF0000FFFFL;
      |x = (x | (x << 8))  & 0x00FF00FF00FF00FFL;
      |x = (x | (x << 4))  & 0x0F0F0F0F0F0F0F0FL;
      |x = (x | (x << 2))  & 0x3333333333333333L;
      |x = (x | (x << 1))  & 0x5555555555555555L;
      |return x;""".stripMargin

  private[functions] def spread(v: Long): Long = {
    var x = v & 0x7FFFFFFFL
    x = (x | (x << 16)) & 0x0000FFFF0000FFFFL
    x = (x | (x << 8)) & 0x00FF00FF00FF00FFL
    x = (x | (x << 4)) & 0x0F0F0F0F0F0F0F0FL
    x = (x | (x << 2)) & 0x3333333333333333L
    x = (x | (x << 1)) & 0x5555555555555555L
    x
  }

  /** 2-D Morton (Z-order) key: interleave the low 31 bits of two bigint
    * keys, `a` on even bit positions, `b` on odd. Sorting by the result
    * clusters rows that are close in BOTH dimensions — the layout key
    * behind multi-dimensional file skipping. Keys wider than 31 bits
    * must be normalized first (the curve uses the low bits only); the
    * 31-bit mask keeps the interleaved key non-negative so the signed
    * long sort preserves curve order.
    */
  case class ZValue(left: Expression, right: Expression)
      extends BinaryExpression {

    override def checkInputDataTypes(): TypeCheckResult =
      if (left.dataType == LongType && right.dataType == LongType)
        TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        s"z_value expects (bigint, bigint), got " +
          s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
    override def dataType: DataType = LongType
    override def prettyName: String = "z_value"

    override def nullSafeEval(a: Any, b: Any): Any =
      spread(a.asInstanceOf[Long]) | (spread(b.asInstanceOf[Long]) << 1)

    override protected def doGenCode(ctx: CodegenContext,
        ev: ExprCode): ExprCode = {
      val fn = ctx.addNewFunction("graftMortonSpread",
        s"""private long graftMortonSpread(long x) {
           |  $SpreadBody
           |}""".stripMargin)
      defineCodeGen(ctx, ev,
        (a, b) => s"$fn($a) | ($fn($b) << 1)")
    }

    override protected def withNewChildrenInternal(newLeft: Expression,
        newRight: Expression): ZValue = copy(left = newLeft, right = newRight)
  }

  def zValue(a: Column, b: Column): Column =
    Bridge.column(ZValue(Bridge.expression(a), Bridge.expression(b)))

  /** Rank (quantile-bucket) normalization for curve keys: the bucket
    * index of a double under sorted, distinct boundary values — the
    * count of boundaries ≤ the input, via binary search (upper-bound
    * convention, deterministic under duplicates in the DATA; the
    * boundary array itself must be strictly increasing). Codegen'd so
    * the per-row cost is log₂(buckets) compares with no per-row
    * allocation — an interpreted HOF here would pay a lambda dispatch
    * per boundary.
    *
    * This is what makes Z-order work on heavy-tailed keys: the linear
    * lattice ([[graft.operators.Layout.writeZOrdered]]) maps a skewed
    * key's mass into a handful of cells and the curve degenerates to a
    * single-key sort; equi-DEPTH buckets from approx quantiles spread
    * the mass uniformly over the lattice
    * ([[graft.operators.Layout.writeZOrderedRanked]]).
    */
  case class BucketIndex(child: Expression, bounds: Seq[Double])
      extends UnaryExpression {
    // Seq, not Array: a case class with an Array parameter compares by
    // reference, defeating Catalyst canonicalization/CSE for identical
    // bucket_index expressions
    require(bounds.nonEmpty, "bucket boundaries must be non-empty")
    require(bounds.sliding(2).forall(w => w.length < 2 || w(0) < w(1)),
      "bucket boundaries must be strictly increasing")

    private lazy val boundsArr: Array[Double] = bounds.toArray

    override def checkInputDataTypes(): TypeCheckResult =
      if (child.dataType == DoubleType) TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        s"bucket_index expects double, got ${child.dataType.simpleString}")
    override def dataType: DataType = LongType
    override def prettyName: String = "bucket_index"

    override def nullSafeEval(v: Any): Any = {
      val r = java.util.Arrays.binarySearch(boundsArr, v.asInstanceOf[Double])
      (if (r >= 0) r + 1 else -(r + 1)).toLong
    }

    override protected def doGenCode(ctx: CodegenContext,
        ev: ExprCode): ExprCode = {
      val b = ctx.addReferenceObj("bounds", boundsArr, "double[]")
      nullSafeCodeGen(ctx, ev, v => {
        val r = ctx.freshName("r")
        s"""int $r = java.util.Arrays.binarySearch($b, $v);
           |${ev.value} = (long) ($r >= 0 ? $r + 1 : -($r + 1));""".stripMargin
      })
    }

    override protected def withNewChildInternal(newChild: Expression)
        : BucketIndex = copy(child = newChild)
  }

  def bucketIndex(c: Column, bounds: Seq[Double]): Column =
    Bridge.column(BucketIndex(Bridge.expression(c), bounds))

  /** Murmur3 fmix64 avalanche of a bigint — the deterministic ordering
    * key behind seeded corpus shuffles ([[graft.operators.CurationOps]]'
    * `curate_epoch_shuffle`): mix64(doc_id XOR seed) is a pure function
    * of the stable key, so a training order is reproducible across runs,
    * engines, and task re-execution, and changing the seed (epoch)
    * re-permutes the corpus. Delegates to the SAME
    * [[TextExprs.fmix64]] the window-hash kernels finish with — one
    * avalanche definition engine-wide, and the DuckDB oracle replays it
    * in 32-bit-split HUGEINT arithmetic (see DedupOps.OracleHash).
    */
  case class Mix64(child: Expression) extends UnaryExpression {
    override def checkInputDataTypes(): TypeCheckResult =
      if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        s"mix64 expects bigint, got ${child.dataType.simpleString}")
    override def dataType: DataType = LongType
    override def prettyName: String = "mix64"

    override def nullSafeEval(v: Any): Any =
      TextExprs.fmix64(v.asInstanceOf[Long])

    override protected def doGenCode(ctx: CodegenContext,
        ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"graft.functions.TextExprs.fmix64($c)")

    override protected def withNewChildInternal(newChild: Expression)
        : Mix64 = copy(child = newChild)
  }

  def mix64(c: Column): Column =
    Bridge.column(Mix64(Bridge.expression(c)))
}
