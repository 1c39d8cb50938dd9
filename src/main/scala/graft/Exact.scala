package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** Exact-arithmetic aggregation helpers.
  *
  * `sum(double)` is order-dependent and Spark's partial (map-side) + final
  * aggregation visits rows in a nondeterministic order across partitions, so
  * a double sum can never reliably hash-match a sequential single-threaded
  * oracle. Summing through DecimalType is exact and order-independent; the
  * final cast back to double is a deterministic function of the exact sum.
  *
  * FIXTURES data guarantee: all monetary/measure columns are 2-dp decimals
  * stored as doubles (verified empirically at sf0.01), so the cast to a
  * scale-6 decimal never rounds — it is lossless on both engines.
  *
  * This also matters at 100 TB: decimal hash aggregation stays inside
  * whole-stage codegen and partial aggregation still applies; correctness
  * does not depend on partition count or AQE coalescing.
  */
object Exact {
  private val D = DecimalType(25, 6)
  private val DHi = DecimalType(38, 18)

  /** Exact, order-independent sum of a (2-dp) double column, as double. */
  def dsum(c: Column): Column = sum(c.cast(D)).cast(DoubleType)

  /** Exact average: exact decimal sum divided by count, in double. */
  def davg(c: Column): Column = sum(c.cast(D)).cast(DoubleType) / count(c)

  /** DuckDB oracle fragment mirroring [[dsum]]. */
  def sqlSum(e: String): String =
    s"CAST(SUM(CAST($e AS DECIMAL(25,6))) AS DOUBLE)"

  /** DuckDB oracle fragment mirroring [[davg]]. */
  def sqlAvg(e: String): String =
    s"(CAST(SUM(CAST($e AS DECIMAL(25,6))) AS DOUBLE) / COUNT($e))"

  /** High-scale variant of [[dsum]] for COMPUTED per-row double terms
    * (ratios, sqrt norms, decay products — anything not a stored 2-dp
    * value). A computed double can land EXACTLY on a scale-6 `.5e-6`
    * cast boundary (e.g. cents/int ratios with short decimal
    * expansions), where the two engines' decimal-rounding modes diverge
    * — the r13 q190 defect. At scale 18 an exact half-landing requires
    * an 18-digit terminating expansion: impossible for non-dyadic
    * ratios, and dyadic ones cast losslessly. Residual shortest-repr vs
    * exact-binary cast drift is bounded ~half an ulp per row — orders
    * of magnitude below the 4/6-dp compares.
    */
  def dsumHi(c: Column): Column = sum(c.cast(DHi)).cast(DoubleType)

  /** High-scale variant of [[davg]]; see [[dsumHi]] for when. */
  def davgHi(c: Column): Column = sum(c.cast(DHi)).cast(DoubleType) / count(c)

  /** DuckDB oracle fragment mirroring [[dsumHi]]. */
  def sqlSumHi(e: String): String =
    s"CAST(SUM(CAST($e AS DECIMAL(38,18))) AS DOUBLE)"

  /** DuckDB oracle fragment mirroring [[davgHi]]. */
  def sqlAvgHi(e: String): String =
    s"(CAST(SUM(CAST($e AS DECIMAL(38,18))) AS DOUBLE) / COUNT($e))"

  /** 6-dp rounding with IEEE negative zero normalized away. `round(x, 6)`
    * of a tiny negative value (or of -0.0 itself) can emit -0.0 on one
    * engine and 0.0 on the other; the two are `==`-equal but differ at
    * the bit level, so a hash compare sees different rows. `+ 0.0` maps
    * -0.0 → 0.0 and is the identity on every other double. Use this (with
    * [[sqlRound6]] on the oracle side) for ANY rounded column whose value
    * can reach zero from below.
    */
  def round6(c: Column): Column = round(c, 6) + lit(0d)

  /** DuckDB oracle fragment mirroring [[round6]]. */
  def sqlRound6(e: String): String = s"round($e, 6) + 0.0"
}
