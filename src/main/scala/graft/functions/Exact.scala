package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Deterministic-aggregation helpers.
  *
  * Double summation is order-dependent, and Spark's shuffle order is not
  * deterministic — so `sum(double)` can differ run-to-run in the last ulp and
  * can never hash-match an external oracle reliably. The testdata money
  * columns are exact 2-decimal values, so we aggregate them as
  * `DECIMAL(18,2)` (exact, order-independent) and cast the final result back
  * to double (a deterministic conversion). The DuckDB oracle SQL applies the
  * identical casts, giving bit-identical results at any parallelism.
  *
  * This mirrors the reference's money semantics: the CDC source schema uses
  * DECIMAL(10,2)/DECIMAL(12,2) for all money columns
  * (reference postgres/init/init.sql:18,30,41).
  */
object Exact {
  /** 2-decimal money type; 18 digits is plenty for 100 TB sums of per-row
    * values < 1e6 only when aggregated per-group — Spark widens sum() to
    * DECIMAL(28,2)/DECIMAL(38,x) internally, so overflow headroom is there.
    */
  val Money: DecimalType = DecimalType(18, 2)

  /** Cast an exact-2-decimal double column to DECIMAL(18,2). */
  def money(c: Column): Column = c.cast(Money)

  /** Exact, order-independent sum of a 2-decimal double column → double. */
  def moneySum(c: Column): Column = sum(money(c)).cast("double")

  /** Exact sum of a decimal expression (e.g. money products) → double. */
  def decSum(c: Column): Column = sum(c).cast("double")

  /** lineitem discounted revenue term: extendedprice * (1 - discount),
    * computed in exact decimal arithmetic.
    */
  def revenueTerm(price: Column, discount: Column): Column =
    money(price) * (lit(1).cast(Money) - money(discount))
}
