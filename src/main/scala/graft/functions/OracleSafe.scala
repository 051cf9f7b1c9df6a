package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Aggregation helpers that are exact, partition-order-independent and
  * bit-identical to an ANSI-SQL oracle engine (DuckDB).
  *
  * Why: naive `sum(double)` is non-deterministic across partitionings
  * (floating addition is not associative), and `round(double, n)` can
  * disagree between engines on values whose shortest decimal
  * representation sits on a rounding boundary. Routing sums through
  * exact DECIMAL arithmetic and doing "rounding" with FLOOR on
  * identical expression trees removes both failure modes — at any
  * scale, 60k rows or 100 TB.
  */
object OracleSafe {

  /** Exact SUM of a money-like (<=2 decimal digits) double column.
    * DuckDB mirror: CAST(SUM(CAST(x AS DECIMAL(18,2))) AS DOUBLE)
    */
  def sum2(c: Column): Column = sum(c.cast(DecimalType(18, 2))).cast(DoubleType)

  /** Exact SUM of an expression with <=4 true decimal digits (e.g.
    * price * (1 - discount) where both have 2).
    * DuckDB mirror: CAST(SUM(CAST(x AS DECIMAL(24,6))) AS DOUBLE)
    */
  def sum4(c: Column): Column = sum(c.cast(DecimalType(24, 6))).cast(DoubleType)

  /** Exact SUM of an expression with <=6 true decimal digits. */
  def sum6(c: Column): Column = sum(c.cast(DecimalType(26, 8))).cast(DoubleType)

  /** SUM of an integral-valued double column as BIGINT. */
  def sumLong(c: Column): Column = sum(c.cast(LongType))

  /** Exact HALF_UP 2-decimal average of a money-like double column,
    * computed with integer arithmetic so every engine agrees bit-for-bit:
    * cents = SUM(x as DECIMAL)*100;  avg = (2*cents + n) div (2*n) / 100.
    *
    * PRECONDITION: the column's SUM must be non-negative. Spark's `div`
    * (IntegralDivide) truncates toward ZERO while the rounding identity
    * (and DuckDB's `//`) assumes floor toward negative infinity, so for
    * a negative sum the HALF_UP result can be off by 0.01 and diverge
    * from the oracle. Every current caller aggregates prices/quantities
    * (non-negative by construction); a signed column needs a
    * floor-based variant, not this one.
    *
    * The quotient is an INTEGRAL division over DECIMAL(38,0) operands —
    * never a floating `/`: a double quotient is exact only below 2^53,
    * and at 100 TB a money sum crosses 2^53 cents (~$90T? no — ~9e15
    * cents = $90B, a single day of a large ledger). `div` on decimals
    * is exact at any magnitude the 38-digit type holds. The final
    * /100.0 maps an exact integer to double identically on both
    * engines (same integer → same nearest-double).
    * DuckDB mirror (HUGEINT, not BIGINT — SUM*100 can cross 2^63):
    *   (2*CAST(SUM(CAST(x AS DECIMAL(18,2)))*100 AS HUGEINT) + COUNT(*))
    *     // (2*COUNT(*)) / 100.0
    */
  def avg2(c: Column): Column = {
    val cents = (sum(c.cast(DecimalType(18, 2))) * 100).cast(DecimalType(38, 0))
    val n     = count(lit(1)).cast(DecimalType(38, 0))
    call_function("div", cents * 2 + n, n * 2) / 100.0
  }

  /** Epoch seconds (floor) of a timestamp column — safe to compare even
    * when the parquet source is nanosecond-precision (Spark truncates
    * ns→µs on read; emitting raw timestamps would hash-mismatch any
    * oracle that keeps ns).
    * DuckDB mirror: epoch_ns(ts)//1000000000
    */
  def epochS(c: Column): Column = c.cast(LongType)
}
