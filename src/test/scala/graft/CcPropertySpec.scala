package graft

import graft.ops.Dedup
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Property test for the label-propagation connected components: on
  * random graphs the distributed loop must agree with an in-memory
  * union-find on every node's component minimum. Raw ScalaCheck Gen
  * with a fixed seed (scalatestplus is not on the offline classpath;
  * the fixed seed also keeps the suite deterministic).
  */
class CcPropertySpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def unionFind(pairs: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    // unions always point the larger root at the smaller, so after a
    // final path compression the root IS the component minimum
    parent.keys.toSeq.map(k => k -> find(k)).toMap
  }

  test("connectedComponents agrees with union-find on random graphs") {
    val edgeGen = for {
      n <- Gen.choose(2, 40) // node universe
      m <- Gen.choose(1, 60) // edge count
      edges <- Gen.listOfN(m, for {
        a <- Gen.choose(0L, n.toLong)
        d <- Gen.choose(1L, n.toLong)
      } yield (a, a + d))    // a < b by construction, no self-loops
    } yield edges
    import spark.implicits._
    (0 until 12).foreach { i =>
      val edges = edgeGen.apply(Gen.Parameters.default, Seed(42L + i)).get
      val expect = unionFind(edges)
      val got = Dedup.connectedComponents(edges.toDF("id_a", "id_b"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got === expect, s"graph seed ${42L + i}: $edges")
    }
  }
}
