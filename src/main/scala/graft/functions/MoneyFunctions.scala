package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Deterministic cross-engine rounding.
  *
  * Spark's `round` is HALF_UP via BigDecimal-of-shortest-decimal-string,
  * `bround` is HALF_EVEN the same way; DuckDB / C engines round the raw
  * binary double half-away-from-zero after scaling. Those disagree whenever
  * the *shortest decimal rendering* of the double lands exactly on a .xx5
  * boundary (extremely common for 2-dp money × 2-dp rate products). For any
  * value that must hash-match an external engine we therefore round with
  * pure IEEE ops — `floor(x * 10^n + 0.5) / 10^n` — which is bit-identical
  * in every engine given the same input double.
  *
  * Reference parity note: the reference rounds money half-even
  * (pandas `.round(2)`, /root/reference/src/finance_etl/transform.py:44,83).
  * The finance pipeline modules use [[graft.transform]]'s `bround` for that
  * parity; these helpers are for the oracle-checked query surface.
  */
object MoneyFunctions {
  /** floor(x·10ⁿ + ½)/10ⁿ — engine-stable round-half-up-toward-+inf. */
  def roundAt(c: Column, n: Int): Column = {
    val p = math.pow(10, n)
    floor(c * lit(p) + lit(0.5)) / lit(p)
  }

  /** 2-dp money rounding, engine-stable. */
  def money(c: Column): Column = roundAt(c, 2)

  /** SQL text of the same expression, for DuckDB oracles. */
  def moneySql(expr: String): String = s"floor(($expr) * 100 + 0.5) / 100"
  def roundAtSql(expr: String, n: Int): String = {
    val p = math.pow(10, n).toLong
    s"floor(($expr) * $p + 0.5) / $p"
  }

  /** Exact DECIMAL image of a ≤ 2-dp money/value double (every testdata
    * money column — l_extendedprice, o_totalprice, c_acctbal,
    * events.value, l_discount, l_tax — is exactly 2-dp, verified in the
    * r12 float-sum audit). A double SUM of such columns is
    * order-sensitive once |Σ| is large: partial-agg order (a
    * partition-layout accident) moves the low bits, and rounding the
    * SUM cannot neutralize that — the cross-engine hash pin becomes
    * empirical at big SF (measured margin: a 2-dp pin at sf10 is
    * already within one summation-error bound of flaking). Casting each
    * TERM to decimal first makes the sum exact and order-independent by
    * construction in both engines at any SF — t17's sufficient-
    * statistics discipline applied to the money sums. (12,2) holds
    * |x| < 10^10 — every money column by orders of magnitude; products
    * with [[rate2]] stay well inside both engines' 38-digit cap.
    */
  def dec2(c: Column): Column = c.cast("decimal(12,2)")

  /** exact decimal image of a rate-like ≤ 2-dp double in (−10, 10) —
    * discounts, taxes, 1±x factors.
    */
  def rate2(c: Column): Column = c.cast("decimal(3,2)")

  def dec2Sql(expr: String): String = s"CAST($expr AS DECIMAL(12,2))"
  def rate2Sql(expr: String): String = s"CAST($expr AS DECIMAL(3,2))"
}
