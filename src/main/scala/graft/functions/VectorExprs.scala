package graft.functions

/** Shared expression text for embedding-vector operators (dd5, sim1, sim2).
  *
  * Dot products and norms accumulate DECIMAL(30,12)-cast addends — exact
  * base-10 arithmetic, so Spark and the DuckDB oracle agree bit-for-bit
  * regardless of summation order (the per-element double product is IEEE
  * and order-free). The 16-bit random-hyperplane signature uses the
  * md5-derived plane matrix from [[DetHash.planes]]; the `pl` column must
  * hold it (typedlit on the Spark side, a literal list-of-lists in SQL).
  */
object VectorExprs {
  /** Spark: `bits`-bit hyperplane signature of `embedding` given `pl`. */
  def sparkSig(bits: Int = 16): String =
    s"""aggregate(transform(sequence(1, $bits), i ->
      |  if(aggregate(sequence(1, 64), cast(0 as decimal(30,12)), (acc, j) ->
      |       cast(acc + cast(element_at(element_at(pl, i), j) * cast(element_at(embedding, j) as double) as decimal(30,12)) as decimal(30,12))) > 0,
      |     shiftleft(cast(1 as bigint), i - 1), cast(0 as bigint))),
      |  cast(0 as bigint), (a2, v) -> a2 + v)""".stripMargin

  /** Spark: exact squared norm of `embedding`. */
  val sparkNorm2: String =
    """aggregate(embedding, cast(0 as decimal(30,12)), (acc, x) ->
      |  cast(acc + cast(cast(x as double) * cast(x as double) as decimal(30,12)) as decimal(30,12)))""".stripMargin

  /** Spark: exact dot product of columns `ea`, `eb`. */
  val sparkPairDot: String =
    """aggregate(zip_with(ea, eb, (x, y) -> cast(x as double) * cast(y as double)),
      |  cast(0 as decimal(30,12)), (acc, v) -> cast(acc + cast(v as decimal(30,12)) as decimal(30,12)))""".stripMargin

  /** DuckDB literal for the 16×64 plane matrix (values exact at 3 dp). */
  def duckPlaneLit(dim: Int): String =
    DetHash.planes(dim)
      .map(row => "[" + row.map(v =>
        String.format(java.util.Locale.ROOT, "(%.3f)", Double.box(v))).mkString(", ") + "]")
      .mkString("[", ", ", "]")

  /** DuckDB: `bits`-bit signature of `embedding` given `pl`. */
  def duckSig(bits: Int = 16): String =
    s"""list_sum(list_transform(generate_series(1, $bits), i ->
      |      if(list_sum(list_transform(generate_series(1, 64), j ->
      |           CAST(pl[i][j] * CAST(embedding[j] AS DOUBLE) AS DECIMAL(38,12)))) > 0,
      |         (1::BIGINT << (i - 1)), 0::BIGINT)))::BIGINT""".stripMargin

  /** DuckDB: squared norm of `embedding`. */
  val duckNorm2: String =
    """list_sum(list_transform(embedding, x ->
      |      CAST(CAST(x AS DOUBLE) * CAST(x AS DOUBLE) AS DECIMAL(38,12))))""".stripMargin

  /** DuckDB: dot of vectors `ea`, `eb`. */
  val duckPairDot: String =
    """list_sum(list_transform(generate_series(1, 64), j ->
      |      CAST(CAST(ea[j] AS DOUBLE) * CAST(eb[j] AS DOUBLE) AS DECIMAL(38,12))))""".stripMargin
}
