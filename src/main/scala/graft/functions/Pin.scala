package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Terminal cross-engine pins for transcendental-fed output columns.
  *
  * The engine's exactness rules (SURVEY.md footer) make every sum, cast and
  * order deterministic — but `ln`/`exp`/`pow` are NOT correctly-rounded
  * IEEE operations, so the JVM's `Math.log`/`Math.exp` and DuckDB's libm
  * may disagree by one ulp on input-dependent values (the round-10 q199 /
  * q236 hash failures; see VERDICT r10 "systemic lesson"). Any OUTPUT
  * column whose value passes through a transcendental therefore gets a
  * terminal grid pin, applied with the SAME explicit formula in both
  * engines:
  *
  * {{{ floor(x * 1e9 + 0.5) / 1e9 }}}
  *
  * Every step (multiply, add, floor, divide) is correctly-rounded or exact
  * IEEE, so when both engines hold bit-identical x the pinned value is
  * bit-identical — unlike each engine's own `round()`, whose double
  * rounding paths differ (Spark: shortest-decimal-string + HALF_UP;
  * DuckDB: `std::round(x*1e9)/1e9`) and can disagree even on EQUAL inputs.
  * When the engines' x differ by δ (a libm ulp), the pinned values agree
  * unless x sits within δ of a grid boundary: P ≈ δ·1e9 ≈ 1e-7·|x| per
  * row — vs the order-1e-1..1e-3 raw-compare failure probability the r10
  * round measured. Callers must keep |x| < ~9e6 so x·1e9 stays under 2^53
  * (all current outputs are scores/ratios/entropies well under that; the
  * one large-magnitude family, NB sum-scores ~1e3, uses [[grid6]]).
  *
  * NULL propagates (floor(null) is null); inputs are finite by
  * construction in every caller (guarded ln/exp argument ranges).
  */
object Pin {

  /** 1e-9 grid: for |x| ≲ 1e3. Spark's floor(double) yields LONG (exact
    * for |x|·1e9 < 2^53); the cast back to double and the division are
    * correctly rounded, mirroring DuckDB's DOUBLE floor result exactly. */
  def grid9(c: Column): Column =
    floor(c * lit(1.0e9) + lit(0.5)).cast("double") / lit(1.0e9)

  /** The identical formula as DuckDB SQL (floor returns DOUBLE there;
    * same values — both are the exact integer below x·1e9 + 0.5). */
  def grid9Sql(x: String): String = s"floor(($x) * 1.0e9 + 0.5) / 1.0e9"

  /** 1e-6 grid for large-magnitude outputs (|x| up to ~1e6·9): NB
    * sum-scores reach ±5e3 at corpus document lengths, where a 1e-9 grid
    * would push x·1e9 past the safe-integer range's comfort margin. */
  def grid6(c: Column): Column =
    floor(c * lit(1.0e6) + lit(0.5)).cast("double") / lit(1.0e6)

  def grid6Sql(x: String): String = s"floor(($x) * 1.0e6 + 0.5) / 1.0e6"

  /** Driver-side twins (exact value-level equivalents of the Column
    * forms — floor is exact, the divide correctly rounded) for spec
    * reference math and driver-printed constants. */
  def grid9(x: Double): Double = math.floor(x * 1.0e9 + 0.5) / 1.0e9
  def grid6(x: Double): Double = math.floor(x * 1.0e6 + 0.5) / 1.0e6

  /** Render a driver-printed double for a DuckDB oracle. A bare decimal
    * literal with ≥16 significant digits is parsed by DuckDB as DECIMAL
    * and cast to double through an int128 mantissa > 2^53 — TWO
    * roundings, measured off-by-one-ulp on e.g. log10(4/3) under DuckDB
    * 1.0.0. An exponent forces the literal to type DOUBLE, parsed with
    * one correctly-rounded strtod — bit-identical to the JVM double.
    * Spark's SQL parser types both forms double, so the same string is
    * safe in either engine. */
  def sqlDouble(x: Double): String = {
    val s = x.toString
    if (s.contains('E') || s.contains('e')) s else s + "e0"
  }
}
