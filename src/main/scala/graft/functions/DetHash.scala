package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Deterministic, engine-portable hashing for the dedup / similarity
  * operators [extension — SURVEY.md §2.9/§7.4].
  *
  * Every pseudo-random quantity (MinHash coefficients, SimHash bits, LSH
  * hyperplanes) is derived from md5, which Spark and DuckDB both expose
  * with identical output — so the DuckDB oracle can replay the whole
  * fuzzy-dedup pipeline bit-for-bit instead of settling for a weaker
  * rows-only check. Spark-side evaluation uses only codegen'd built-ins
  * (md5/conv/transform/aggregate), no UDFs.
  *
  *   H(s)   = int(md5(s)[0:15 hex], 16)            — 60-bit string hash
  *   h_i(s) = (a_i * (H(s) mod P) + b_i) mod P     — universal hash family
  *   P      = 2^31 - 1 (Mersenne); products stay < 2^62, no i64 overflow
  */
object DetHash {
  val P: Long = 2147483647L
  /** Number of MinHash signature components / LSH planes. */
  val K: Int = 16

  /** Scala-side H for deriving constants (same formula as the column op). */
  def hScala(s: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    java.lang.Long.parseLong(d.take(8).map("%02x".format(_)).mkString.take(15), 16)
  }

  /** MinHash coefficients, derived (not sampled) so both engines agree. */
  val A: IndexedSeq[Long] = (0 until K).map(i => hScala(s"minhash_a_$i") % (P - 1) + 1)
  val B: IndexedSeq[Long] = (0 until K).map(i => hScala(s"minhash_b_$i") % P)

  /** Random-hyperplane matrix: `n` planes × dim components in [-1, 1],
    * derived from md5 of the (plane, dim) index pair — row i is the same
    * for every n, so wider matrices extend narrower ones (the
    * high-dimensional JL tier asks for more planes than LSH's K-bit
    * signatures; see HighDimEmbeddingSpec). */
  def planesN(n: Int, dim: Int): IndexedSeq[IndexedSeq[Double]] =
    (0 until n).map(i => (0 until dim).map(j =>
      (hScala(s"plane_${i}_$j") % 2001L - 1000L) / 1000.0))

  /** The K-plane matrix for embedding LSH (legacy shape). */
  def planes(dim: Int): IndexedSeq[IndexedSeq[Double]] = planesN(K, dim)

  /** Memoized [[planesN]] for per-row use on executors (n×dim md5 calls
    * amortize to one materialization per distinct (n, width)). */
  private val planeCache =
    new java.util.concurrent.ConcurrentHashMap[(Int, Int), IndexedSeq[IndexedSeq[Double]]]()
  def planesNFor(n: Int, dim: Int): IndexedSeq[IndexedSeq[Double]] =
    planeCache.computeIfAbsent((n, dim), { case (nn, d) => planesN(nn, d) })
  def planesFor(dim: Int): IndexedSeq[IndexedSeq[Double]] =
    planesNFor(K, dim)

  /** [[planesNFor]] as primitive arrays for the per-row UDF kernels
    * (unboxed O(1) row/component access; same memoization contract). */
  private val planeArrCache =
    new java.util.concurrent.ConcurrentHashMap[(Int, Int), Array[Array[Double]]]()
  def planesArrFor(n: Int, dim: Int): Array[Array[Double]] =
    planeArrCache.computeIfAbsent((n, dim),
      { case (nn, d) => planesN(nn, d).map(_.toArray).toArray })

  /** Column form of H: 60-bit hash of a string column. */
  def h(c: Column): Column = conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  /** DuckDB SQL form of H — identical value. */
  def hSql(e: String): String = s"(('0x' || substr(md5($e), 1, 15))::UBIGINT)::BIGINT"

  /** Column form of h_i over a pre-reduced hash (hModP = H(s) % P). */
  def hi(i: Int, hModP: Column): Column = (lit(A(i)) * hModP + lit(B(i))) % lit(P)

  /** DuckDB SQL form of h_i. */
  def hiSql(i: Int, hModPExpr: String): String =
    s"((${A(i)} * $hModPExpr + ${B(i)}) % $P)"
}
