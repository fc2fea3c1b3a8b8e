package graft.queries

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Determinism helpers for the DuckDB-oracle differential gate.
  *
  * Double-precision SUM is order-dependent; Spark and DuckDB would disagree
  * in the last ulp depending on partitioning. Casting each addend to
  * DECIMAL(38,6) first makes the sum exact base-10 arithmetic — identical
  * in both engines regardless of order — and the final cast back to double
  * is then bit-identical too. Per-row arithmetic (e.g. price*(1-discount))
  * stays in IEEE double: it is order-independent and evaluates identically
  * in both engines.
  *
  * Oracle-side equivalents (note the VARCHAR hop):
  *   dsum(x)  ≙ CAST(CAST(SUM(CAST(x AS DECIMAL(38,6))) AS VARCHAR) AS DOUBLE)
  *   davg(x)  ≙ CAST(CAST(SUM(CAST(x AS DECIMAL(38,6))) AS VARCHAR) AS DOUBLE) / COUNT(x)
  *
  * Why the hop: once the scaled sum exceeds 2^53 (≈9.0e15, i.e. sums
  * past ~9e9 at scale 6 — reached at sf1), DuckDB's direct
  * decimal→double cast double-rounds (int128→double, then /10^scale)
  * while Spark's Decimal.toDouble single-rounds via BigDecimal, and
  * the two can differ in the last ulp. decimal→VARCHAR is exact and
  * VARCHAR→double is correctly rounded in DuckDB, matching Spark's
  * correctly-rounded cast bit-for-bit at every magnitude. (Proven
  * empirically round 11: sf1 o_totalprice sum 375,669,335,495.79 —
  * direct cast ...6003, varchar hop ...5997 = Spark = python.)
  */
object Det {
  private val D = DecimalType(38, 6)
  def dsum(c: Column): Column = sum(c.cast(D)).cast("double")
  def davg(c: Column): Column = sum(c.cast(D)).cast("double") / count(c)

  /** Pre-quantize a double to 6 decimals with exact IEEE arithmetic so the
    * subsequent DECIMAL(38,6) cast is tie-free. A per-row division like
    * extendedprice/quantity can land EXACTLY on a half (e.g. 6998.25/32 =
    * 218.6953125, dyadic) — Spark's double→decimal cast rounds such ties
    * HALF_UP, DuckDB HALF_EVEN, so the engines diverge by 1e-6.
    * floor(x*1e6 + 0.5)/1e6 is computed identically in both engines
    * (every step exact for |x|·1e6 < 2^53) and resolves the tie once, on
    * the double side. Oracle: FLOOR(x*1000000 + 0.5)/1000000.
    * Use on any division-derived addend feeding dsum/davg.
    *
    * Tie convention: floor(x + 0.5) rounds halves toward +infinity for
    * BOTH signs — a negative tie like -2.0000005 quantizes to -2.000000,
    * not -2.000001. That is NOT round-half-away-from-zero ("HALF_UP" in
    * java.math terms) on negatives; it doesn't matter for cross-engine
    * agreement (the oracle replays the same expression) but don't reuse
    * q6 where a sign-symmetric convention is required. */
  def q6(c: Column): Column = floor(c * lit(1e6) + lit(0.5)) / lit(1e6)
}
