package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{BooleanType, DataType, LongType}
import org.apache.spark.util.sketch.BloomFilter

/** Bloom-filter membership as a native, codegen'd Catalyst predicate — the
  * probe half of semi-join pruning (see [[graft.operators.Prune]]).
  *
  * The filter itself is built DISTRIBUTED with the public
  * `Dataset.stat.bloomFilter` (a mergeable treeAggregate over the build
  * side); what comes back to the driver is the fixed-size bit array —
  * sized by (expectedItems, fpp), independent of the build side's row
  * count — which then rides into this expression as a referenced object
  * in the probe side's task closures, exactly how Spark's own
  * InjectRuntimeFilter ships its runtime filters.
  *
  * Semantics: `might_contain(key)` — true when `key` MAY be in the build
  * set (false positives at ≤ fpp), false only when it is DEFINITELY
  * absent, null for null keys. Sound as a PRE-filter for any join that
  * re-checks equality exactly (inner/semi): pruning never drops a
  * matching row, and the exact join removes the false positives.
  */
object BloomExprs {

  /** `bf.mightContainLong(child)` over a LongType key column. The filter
    * object is java-serializable (Spark's sketch implements its own
    * writeObject/readObject), so it ships once per task closure, not per
    * row.
    */
  case class BloomMightContainLong(bf: BloomFilter, child: Expression)
      extends UnaryExpression {

    override def checkInputDataTypes(): TypeCheckResult =
      child.dataType match {
        case LongType => TypeCheckResult.TypeCheckSuccess
        case other => TypeCheckResult.TypeCheckFailure(
          s"might_contain_long expects a bigint key, got ${other.simpleString}")
      }
    override def dataType: DataType = BooleanType
    override def prettyName: String = "might_contain_long"

    override def nullSafeEval(key: Any): Any =
      bf.mightContainLong(key.asInstanceOf[Long])

    override protected def doGenCode(ctx: CodegenContext,
        ev: ExprCode): ExprCode = {
      // the deserialized filter is registered once per generated class;
      // the per-row work is two hash mults and the bit probes
      val ref = ctx.addReferenceObj("bloom", bf,
        classOf[BloomFilter].getName)
      defineCodeGen(ctx, ev, key => s"$ref.mightContainLong($key)")
    }

    override protected def withNewChildInternal(
        newChild: Expression): BloomMightContainLong = copy(child = newChild)
  }

  /** Column face: keep rows whose `key` may be in `bf`. */
  def mightContainLong(bf: BloomFilter, key: Column): Column =
    Bridge.column(BloomMightContainLong(bf, Bridge.expression(key)))
}
