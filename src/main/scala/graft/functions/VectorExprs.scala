package graft.functions

/** DuckDB-side expression text for the embedding-vector operators
  * (dd5, sim1, sim2); the Spark side is [[VectorUdfs]].
  *
  * Dot products, norms, and hyperplane signatures are plain sequential
  * double folds: DuckDB's `list_sum` reduces the list left-to-right,
  * exactly like the Scala folds in VectorUdfs, and the per-element
  * products are IEEE doubles computed identically in both engines — so
  * results (and the signature sign tests) are bit-identical across
  * engines without decimal casts (verified empirically against a python
  * left fold). The signature uses the md5-derived plane matrix from
  * [[DetHash.planes]], embedded as a literal list-of-lists in SQL.
  */
object VectorExprs {
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
       |           pl[i][j] * CAST(embedding[j] AS DOUBLE))) > 0,
       |         (1::BIGINT << (i - 1)), 0::BIGINT)))::BIGINT""".stripMargin

  /** DuckDB: squared norm of `embedding`. */
  val duckNorm2: String =
    """list_sum(list_transform(embedding, x ->
      |      CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))""".stripMargin

  /** DuckDB: dot of two named vector expressions. */
  def duckDot(a: String, b: String): String =
    s"""list_sum(list_transform(generate_series(1, 64), j ->
       |      CAST($a[j] AS DOUBLE) * CAST($b[j] AS DOUBLE)))""".stripMargin

  /** DuckDB: dot of vectors `ea`, `eb`. */
  val duckPairDot: String = duckDot("ea", "eb")
}
