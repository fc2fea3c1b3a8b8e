package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-layout operators — multi-dimensional clustering for scan pruning
  * [extension; no reference analogue — the reference's only layout tool is
  * MySQL's clustered PK (/root/reference/warehouse.py:180, PRIMARY KEY on
  * transportfact.id), which clusters one dimension only].
  *
  * Z-ordering maps n columns onto one interleaved-bit key so that sorting
  * by the key co-locates rows that are close in EVERY dimension. Written
  * as parquet, each file then covers a narrow range of each clustered
  * column, so min/max footer stats prune multi-dimensional box predicates
  * — the standard lakehouse technique for 100 TB fact tables where one
  * sort column can't serve all query patterns.
  *
  * At scale: `zorderWrite` is one range-exchange + local sort — exactly
  * the cost of an ORDER BY on the z-key; there is no per-row driver work
  * and the interleave is a pure codegen'd integer expression. The
  * z-curve's locality guarantee (a file spanning z-range [a,b] spans at
  * most the enclosing quad of each dimension) holds at any row count.
  */
object Layout {

  /** Morton (Z-order) key: interleave the low `bits` bits of two
    * non-negative integer columns — a(i) → bit 2i, b(i) → bit 2i+1.
    * Pure integer arithmetic (exact in any engine); columns must be in
    * [0, 2^bits). 16+16 bits fills 32 of the 64-bit key. */
  def zValue(a: Column, b: Column, bits: Int = 16): Column = {
    val al = a.cast("long"); val bl = b.cast("long")
    (0 until bits).foldLeft(lit(0L)) { (acc, i) =>
      acc +
        shiftleft(shiftright(al, i).bitwiseAND(lit(1L)), 2 * i) +
        shiftleft(shiftright(bl, i).bitwiseAND(lit(1L)), 2 * i + 1)
    }
  }

  /** DuckDB SQL text computing the identical z-value — generated, not
    * hand-kept, so Spark and oracle can never drift. */
  def duckZ(a: String, b: String, bits: Int = 16): String =
    (0 until bits).map(i =>
      s"((($a >> $i) & 1) << ${2 * i}) + ((($b >> $i) & 1) << ${2 * i + 1})"
    ).mkString("(", " + ", ")")

  /** Write `df` z-clustered on (colA, colB): range-partition into
    * `nFiles` z-ranges, sort each partition by the z-key, drop the key
    * (it is derivable — storing it would burn a column), write parquet.
    * One shuffle + local sort, the same physical cost as a global ORDER
    * BY; reading back is layout-transparent. */
  def zorderWrite(df: DataFrame, colA: String, colB: String, out: String,
                  nFiles: Int, bits: Int = 16): Unit =
    df.withColumn("__z", zValue(col(colA), col(colB), bits))
      .repartitionByRange(nFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode("overwrite").parquet(out)
}
