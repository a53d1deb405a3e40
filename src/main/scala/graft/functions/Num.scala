package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** Numeric canonicalization helpers for oracle-parity.
  *
  * Money columns in the testdata are 2-decimal doubles. Summing doubles is
  * order-sensitive (shuffle nondeterminism at scale would change the last
  * bits), so money aggregates exactly: historically through
  * DECIMAL(18,2) sums, since round 16 through exact long CENTS
  * ([[cents]]) summed into a compact decimal accumulator — same exact
  * rational, same nearest-double emission, but the per-row work is one
  * codegen'd multiply+floor instead of a BigDecimal.valueOf/setScale
  * (the double→decimal cast) plus BigDecimal multiplies for product
  * terms. Measured on the TPC-H Q1 shape: the BigDecimal path runs
  * ~3× the long-units path for identical results.
  *
  * Why the emitted doubles are bit-identical to the old decimal path:
  * both compute the SAME exact rational (the sum of exact scaled
  * integers divided by the scale), and both emit it through one
  * correctly-rounded conversion — decimal-division-to-scale-6 (exact,
  * since every true value has ≤6 fractional digits) followed by a
  * nearest-double cast. compare.py's hash gate over all three scales is
  * the enforcement.
  */
object Num {
  def money(c: Column): Column = c.cast(DecimalType(18, 2))

  /** The units accumulator type: compact (long-backed) until 10^18,
    * graceful exact BigDecimal beyond — never overflows at any scale
    * (sum buffer is DECIMAL(35,0): 10^35 ≈ 10^16 years of 100 TB/day).
    */
  private val dec25 = DecimalType(25, 0)

  /** Exact long CENTS of a 2-decimal double, without per-row BigDecimal
    * work. For any x that is the double nearest to N/100 (|N| ≤ 10^15),
    * x·100 lands within ~1e-9 of N, so floor(x·100 + 0.5) recovers N
    * exactly for either sign; the only divergence from the double→
    * DECIMAL(18,2) cast (HALF_UP) would be an input at an exact
    * half-cent, which a 2-decimal column cannot contain. Codegen:
    * multiply + floor (LongType), no allocation.
    */
  def cents(c: Column): Column = floor(c * lit(100.0) + lit(0.5))

  /** price·(1−discount) in exact 1e-4-dollar units as a long:
    * cents(price)·(100 − cents(discount)). Bounded by 10^9 per row for
    * prices under 10^5 — integer multiply, never a BigDecimal product
    * like the DECIMAL(18,2) × DECIMAL(18,2) term it replaces.
    */
  def discUnits(price: Column, discount: Column): Column =
    cents(price) * (lit(100L) - cents(discount))

  /** Order-free exact sum of long units via the compact decimal
    * accumulator (see [[dec25]]).
    */
  def sumUnits(units: Column): Column = sum(units.cast(dec25))

  /** DISTINCT variant of [[sumUnits]] — distinct over the long units is
    * distinct over the original 2-decimal values (both are injective
    * images of the value set).
    */
  def sumUnitsDistinct(units: Column): Column = sum_distinct(units.cast(dec25))

  /** Emit a units sum as the nearest double of sum/divisor. The decimal
    * division is exact (result scale 6 ≥ the value's true scale for
    * every divisor up to 10^6 used here), so this is bit-identical to
    * `sum(DECIMAL).cast(double)` over the equivalent decimal terms.
    */
  def unitsAsDouble(sumOfUnits: Column, divisor: Long): Column =
    (sumOfUnits / lit(divisor)).cast(DoubleType)

  /** Exact sum of a 2-decimal double column, returned as double. */
  def sumMoney(c: Column): Column = unitsAsDouble(sumUnits(cents(c)), 100L)

  /** Exact sum of price*(1-discount), returned as double. */
  def sumDiscPrice(price: Column, discount: Column): Column =
    unitsAsDouble(sumUnits(discUnits(price, discount)), 10000L)
}
