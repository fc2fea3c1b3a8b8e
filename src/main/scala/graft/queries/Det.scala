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
  * Oracle-side equivalents:
  *   dsum(x)  ≙ CAST(SUM(CAST(x AS DECIMAL(38,6))) AS DOUBLE)
  *   davg(x)  ≙ CAST(SUM(CAST(x AS DECIMAL(38,6))) AS DOUBLE) / COUNT(x)
  */
object Det {
  private val D = DecimalType(38, 6)
  def dsum(c: Column): Column = sum(c.cast(D)).cast("double")
  def davg(c: Column): Column = sum(c.cast(D)).cast("double") / count(c)
}
