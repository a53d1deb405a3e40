package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** Numeric canonicalization helpers for oracle-parity.
  *
  * Money columns in the testdata are 2-decimal doubles. Summing doubles is
  * order-sensitive (shuffle nondeterminism at scale would change the last
  * bits), so aggregate money through DECIMAL(18,2): exact, associative,
  * identical across engines. Cast back to double at the end — both engines
  * produce the nearest double of the same exact decimal.
  */
object Num {
  def money(c: Column): Column = c.cast(DecimalType(18, 2))

  /** Exact sum of a 2-decimal double column, returned as double. */
  def sumMoney(c: Column): Column = sum(money(c)).cast(DoubleType)

  /** Exact sum of price*(1-discount) via decimal arithmetic. */
  def sumDiscPrice(price: Column, discount: Column): Column =
    sum(money(price) * (lit(1).cast(DecimalType(18, 2)) - money(discount)))
      .cast(DoubleType)
}
