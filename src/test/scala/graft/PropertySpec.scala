package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.apache.spark.sql.functions._
import graft.etl.DimOps

/** Property-style invariants (SURVEY.md §5.3) over generated inputs —
  * seeds are fixed so runs are reproducible, not flaky. */
class PropertySpec extends SparkSuite {
  import spark.implicits._

  private def cases[A](gen: Gen[A], n: Int = 5): Seq[A] =
    (0 until n).map(i => gen.pureApply(Gen.Parameters.default, Seed(42L + i)))

  private val idRows: Gen[List[(Long, String)]] =
    Gen.listOfN(40, Gen.zip(Gen.chooseNum(0L, 15L), Gen.alphaLowerStr.map(_.take(6))))

  test("property: antiUpsert is idempotent and never duplicates a key") {
    cases(Gen.zip(idRows, idRows)).foreach { case (ex, in) =>
      val existing = DimOps.firstWins(ex.toDF("id", "v"), Seq("id"))
      val incoming = in.toDF("id", "v")
      val once = DimOps.antiUpsert(existing, incoming, Seq("id"))
      val twice = DimOps.antiUpsert(once, incoming, Seq("id"))
      assert(once.count() === twice.count())
      val dupKeys = once.groupBy("id").count().filter($"count" > 1).count()
      assert(dupKeys === 0, "antiUpsert produced duplicate keys")
      // union of key sets
      val expected = (ex.map(_._1) ++ in.map(_._1)).toSet.size
      assert(once.count() === expected)
    }
  }

  test("property: surrogate keys are dense 1..n in natural-key order") {
    val names = Gen.listOfN(25, Gen.alphaLowerStr.map(_.take(8)).suchThat(_.nonEmpty))
    cases(names).foreach { xs =>
      val distinct = xs.distinct
      val keyed = DimOps.withSurrogateKey(distinct.toDF("name"), Seq("name"))
        .orderBy("id").collect()
      assert(keyed.map(_.getLong(0)).toSeq === (1L to distinct.size).toSeq)
      assert(keyed.map(_.getString(1)).toSeq === distinct.sorted)
    }
  }

  test("property: decode maps listed keys and nulls everything else") {
    val mapping = Seq("a" -> "x", "b" -> "y")
    val words = Gen.listOfN(30, Gen.oneOf("a", "b", "c", "d", ""))
    cases(words).foreach { xs =>
      val out = xs.toDF("k")
        .select(col("k"), DimOps.decode(col("k"), mapping).as("v"))
        .collect()
      out.foreach { r =>
        val k = r.getString(0)
        val expected = mapping.toMap.get(k).orNull
        assert(r.getString(1) === expected, s"decode($k)")
      }
    }
  }

  test("property: connectedComponents matches a local union-find on random graphs") {
    val edges: Gen[List[(Long, Long)]] =
      Gen.listOfN(35, Gen.zip(Gen.chooseNum(0L, 24L), Gen.chooseNum(0L, 24L)))
        .map(_.filter { case (a, b) => a != b })
    cases(edges, n = 4).foreach { es =>
      if (es.nonEmpty) {
        // reference: path-compressed union-find over the same edge list
        val parent = scala.collection.mutable.Map.empty[Long, Long]
        def find(x: Long): Long = {
          val p = parent.getOrElseUpdate(x, x)
          if (p == x) x else { val r = find(p); parent(x) = r; r }
        }
        es.foreach { case (a, b) =>
          val (ra, rb) = (find(a), find(b))
          if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
        }
        // canonical label = min id per component
        val nodes = es.flatMap(t => Seq(t._1, t._2)).distinct
        val want = nodes.groupBy(find).flatMap { case (_, members) =>
          val m = members.min
          members.map(_ -> m)
        }
        // default path = driver union-find (these graphs are under the
        // local threshold); localEdgeThreshold = 0 forces the distributed
        // pointer-jumped loop — both must agree with the reference
        val gotLocal = graft.ops.Clusters.connectedComponents(es.toDF("a", "b"), "a", "b")
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        assert(gotLocal === want, s"CC (local path) mismatch on edges $es")
        val gotDist = graft.ops.Clusters.connectedComponents(es.toDF("a", "b"), "a", "b",
          localEdgeThreshold = 0L)
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        assert(gotDist === want, s"CC (distributed path) mismatch on edges $es")
      }
    }
  }

  test("property: firstWins output is independent of input row order") {
    cases(idRows).foreach { xs =>
      val a = DimOps.firstWins(xs.toDF("id", "v"), Seq("id"))
        .orderBy("id", "v").collect().toSeq
      val b = DimOps.firstWins(xs.reverse.toDF("id", "v"), Seq("id"))
        .orderBy("id", "v").collect().toSeq
      assert(a === b, "firstWins depends on input order")
    }
  }

  test("property: winnowing guarantee — a shared run of ≥ k+w-1 chars shares a fingerprint") {
    // the MOSS selection theorem, checked on generated corpora: two
    // documents embedding the SAME substring of at least k+w-1
    // characters (inside otherwise-unrelated text) always share at
    // least one winnowed fingerprint, so containmentPairs finds the
    // pair at any positive threshold
    val k = 10; val w = 4
    val lowerStr = Gen.listOfN(60, Gen.alphaLowerChar).map(_.mkString)
    val gen = for {
      pre  <- lowerStr
      mid  <- Gen.listOfN(k + w - 1, Gen.alphaLowerChar).map(_.mkString)
      post <- lowerStr
      pre2 <- Gen.listOfN(40, Gen.numChar).map(_.mkString)
      post2 <- Gen.listOfN(40, Gen.numChar).map(_.mkString)
    } yield (s"$pre$mid$post", s"$pre2$mid$post2")
    cases(gen, n = 8).foreach { case (a, b) =>
      val docs = Seq((1L, a), (2L, b)).toDF("doc_id", "text")
      val pairs = graft.ops.TextDedup.containmentPairs(
          docs, "doc_id", "text", k = k, w = w, threshold = 1e-9)
        .filter(col("doc_a") === 1 && col("doc_b") === 2)
      assert(pairs.count() === 1,
        s"guarantee violated for shared run of ${k + w - 1} chars:\na=$a\nb=$b")
    }
  }
}
