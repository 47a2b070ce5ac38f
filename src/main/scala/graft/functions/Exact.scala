package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Engine-version-proof exact arithmetic for compared query outputs.
  *
  * The driver hash-compares Spark results against a DuckDB oracle whose
  * exact version and client-side value conversion are outside our
  * control. Round-3 evidence (16 hash mismatches, every one with
  * rows+schema green, every one bit-exact against a local DuckDB 1.0.0
  * replica) isolates two output-type classes that are NOT stable across
  * oracle environments:
  *
  *  - `double → DECIMAL(p,s)` casts in compared columns: engines
  *    legally disagree on how a binary double maps to a decimal
  *    (shortest-string vs exact-binary rounding at ties), and decimal
  *    RENDERING (trailing zeros, int128 client conversion) varies by
  *    version — every decimal-typed output column failed in round 3,
  *    including sums of integral quantities where no cast ambiguity
  *    exists at all.
  *  - DuckDB integer `sum()` widens to HUGEINT (int128), whose client
  *    conversion differs by version (e.g. to float in pandas). Every
  *    round-3 oracle that left an integer sum uncast failed; every one
  *    that wrapped it in `CAST(... AS BIGINT)` passed.
  *
  * Rule, applied to every compared output column: only BIGINT, DOUBLE
  * (produced by identical IEEE ops on exact integers), BOOLEAN, STRING
  * or TIMESTAMP — never DECIMAL, never an uncast DuckDB integer sum.
  *
  * Money doubles in the testdata are exact 2-dp values (verified:
  * `x*100` is within 1e-9 of an integer for every lineitem / orders /
  * customer row), so `round(x*100) → BIGINT` recovers exact integer
  * cents on any engine; products and sums of those integers are exact
  * and order-independent everywhere; one final integer→double
  * conversion (round-to-nearest, uniquely defined by IEEE 754) plus one
  * IEEE division produce bit-identical doubles on every engine version.
  *
  * Scale note: at 100 TB the per-group 1e-4-unit totals can exceed
  * int64 (6e11 rows × ~1e9 per row), so [[sumExact]] routes the sum
  * through decimal(20,0) — Spark widens the accumulator to
  * decimal(30,0), exact headroom to 1e30 — while the DuckDB side sums
  * in int128. The per-row terms stay comfortably inside int64.
  *
  * Oracle-side idioms (DuckDB SQL) these helpers pair with:
  * {{{
  *   cents:       CAST(round(x * 100) AS BIGINT)
  *   revenueE4:   CAST(round(l_extendedprice*100) AS BIGINT)
  *                  * (100 - CAST(round(l_discount*100) AS BIGINT))
  *   sum+dollars: CAST(sum(<term>) AS DOUBLE) / 10000.0
  * }}}
  */
object Exact {

  /** Exact integer cents of a 2-dp money double (`123.45 → 12345L`).
    * `round` first: a bare long cast truncates and `12344.9999…` would
    * lose a cent. The double is within 1e-9 of the integer, so no
    * engine's tie-breaking choice is ever exercised. */
  def cents(money: Column): Column = round(money * 100, 0).cast("long")

  /** `price * (1 - discount)` in exact 1e-4 dollar units:
    * price cents × (100 − discount points). */
  def revenueE4(price: Column, discount: Column): Column =
    cents(price) * (lit(100L) - cents(discount))

  /** `price * discount` in exact 1e-4 dollar units. */
  def discountedE4(price: Column, discount: Column): Column =
    cents(price) * cents(discount)

  /** Exact overflow-safe sum of an integer term: decimal(20,0) input →
    * Spark sums in decimal(30,0), exact far beyond int64. */
  def sumExact(term: Column): Column = sum(term.cast("decimal(20,0)"))

  /** Exact integer total (in 1/unitsPerDollar dollars) → DOUBLE
    * dollars: one int→double conversion + one IEEE division, both
    * uniquely defined, so the bits match any engine computing the same
    * shape. */
  def dollars(total: Column, unitsPerDollar: Long): Column =
    total.cast("double") / lit(unitsPerDollar.toDouble)
}
