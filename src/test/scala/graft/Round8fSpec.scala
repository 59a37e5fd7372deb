package graft

import graft.ops.{Layout, Similarity, TextAnalysis}
import graft.streaming.Streams
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-8 part 6: partition planning, cluster outliers, Wilson CIs,
  * windowed quality, N-dim Morton codes.
  */
class Round8fSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // ---- rangePartitionPlan ----

  test("rangePartitionPlan: uniform keys split into equal contiguous ranges") {
    val df = (0L until 1000L).toDF("k")
    val out = Layout.rangePartitionPlan(df, "k", parts = 4)
      .orderBy("part").collect()
    assert(out.map(_.getAs[Int]("part")).toSeq === Seq(0, 1, 2, 3))
    assert(out.map(_.getAs[Long]("n")).toSeq === Seq.fill(4)(250L))
    // ranges tile the key space without overlap
    out.sliding(2).foreach { case Array(a, b) =>
      assert(a.getAs[Long]("max_key") < b.getAs[Long]("min_key"))
    }
    assert(out.map(_.getAs[Long]("n")).sum === 1000L)
  }

  test("rangePartitionPlan: a hot key overloads its partition visibly") {
    val skewed = (0L until 300L) ++ Seq.fill(700)(42L)
    val out = Layout.rangePartitionPlan(skewed.toDF("k"), "k", parts = 4)
      .collect().map(r => r.getAs[Int]("part") -> r.getAs[Long]("n")).toMap
    // the plan must SHOW the imbalance, not hide it
    assert(out.values.max >= 700L)
    assert(out.values.sum === 1000L)
  }

  test("rangePartitionPlan bounds ≡ built-in percentile_disc (r8 rewrite pin)") {
    // awkward sizes (not divisible by parts) + duplicates: the single
    // sorted-collect ceil(p·N) positions must match what parts-1
    // independent percentile_disc aggregates produced before
    for (n <- Seq(7, 97, 1000); parts <- Seq(3, 8)) {
      val keys = (0 until n).map(i => ((i * 7919) % 101).toLong)
      val df = keys.toDF("k")
      val viaOp = Layout.rangePartitionPlan(df, "k", parts)
      // recompute the bound list with the built-in aggregate
      val exprs = (1 until parts).map(i =>
        expr(s"percentile_disc(${i.toDouble / parts}) WITHIN GROUP (ORDER BY k)"))
      val builtin = df.agg(exprs.head, exprs.tail: _*).head().toSeq.map {
        case l: Long => l
        case d: Double => d.toLong // percentile_disc widens to double
      }
      // the op's parts are defined by the bound list: replay assignment
      val model = keys.groupBy(k => builtin.count(k > _)).view
        .mapValues(_.size.toLong).toMap
      val got = viaOp.collect().map(r =>
        r.getAs[Int]("part") -> r.getAs[Long]("n")).toMap
      assert(got === model, s"n=$n parts=$parts bounds=$builtin")
    }
  }

  // ---- clusterOutliers ----

  test("clusterOutliers: below-cluster-mean members flagged, vs brute force") {
    // two disjoint-support clusters; member i of cluster g has jitter
    // d = (i%3+1)/8 in dim g+2 — cos spread is analytic
    val rows = (0L until 60L).map { i =>
      val g = (i % 2).toInt
      val d = ((i % 3) + 1).toDouble / 8.0
      val v = Array.tabulate(8)(dim =>
        (if (dim == g) 1.0 else 0.0) + (if (dim == g + 2) d else 0.0))
      (i, v.map(_.toFloat))
    }
    val init = Array(Array.tabulate(8)(d => if (d == 0) 1.0 else 0.0),
      Array.tabulate(8)(d => if (d == 1) 1.0 else 0.0))
    val out = Similarity.clusterOutliers(rows.toDF("id", "v"), "id", "v",
        nClusters = 2, lloydIters = 2, init = Some(init))
      .collect().map(r => r.getLong(0) ->
        ((r.getInt(1), r.getBoolean(4)))).toMap
    // brute force the same Lloyd run
    def cos(a: Array[Double], b: Array[Double]): Double = {
      val dot = a.zip(b).map { case (x, y) => x * y }.sum
      dot / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
    }
    val vecs = rows.map { case (i, v) => i -> v.map(_.toDouble) }.toMap
    var cents = init
    (0 until 2).foreach { _ =>
      val assign = vecs.view.mapValues(v =>
        (0 until 2).maxBy(c => cos(v, cents(c)))).toMap
      cents = (0 until 2).map { c =>
        val members = vecs.filter(kv => assign(kv._1) == c).values.toSeq
        Array.tabulate(8)(d => members.map(_(d)).sum / members.size)
      }.toArray
    }
    val finalAssign = vecs.view.mapValues(v =>
      (0 until 2).maxBy(c => cos(v, cents(c)))).toMap
    val cosOf = vecs.map { case (i, v) => i -> cos(v, cents(finalAssign(i))) }
    val meanOf = (0 until 2).map { c =>
      val cs = cosOf.filter(kv => finalAssign(kv._1) == c).values
      c -> cs.sum / cs.size
    }.toMap
    vecs.keys.foreach { i =>
      assert(out(i)._1 === finalAssign(i), s"cid of $i")
      assert(out(i)._2 === (cosOf(i) < meanOf(finalAssign(i))),
        s"outlier flag of $i")
    }
    // non-vacuous: both flags occur
    assert(out.values.exists(_._2) && out.values.exists(!_._2))
  }

  // ---- keepRateCi ----

  test("keepRateCi: Wilson interval matches hand arithmetic and brackets p") {
    val good = "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu"
    val df = (Seq.fill(80)(("a", good)) ++ Seq.fill(20)(("a", "tiny")))
      .toDF("source", "text")
    val r = TextAnalysis.keepRateCi(df, "source", "text").collect().head
    assert(r.getAs[Long]("n") === 100L)
    assert(r.getAs[Long]("n_keep") === 80L)
    assert(r.getAs[Double]("keep_rate") === 0.8)
    val (z, n, p) = (1.96, 100.0, 0.8)
    val denom = 1.0 + z * z / n
    val center = (p + z * z / (2 * n)) / denom
    val half = z * math.sqrt(p * (1 - p) / n + z * z / (4 * n * n)) / denom
    assert(r.getAs[Double]("ci_low") ===
      BigDecimal(center - half).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    assert(r.getAs[Double]("ci_high") ===
      BigDecimal(center + half).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    assert(r.getAs[Double]("ci_low") < 0.8 && 0.8 < r.getAs[Double]("ci_high"))
  }

  // ---- windowedKeepRate ----

  test("windowedKeepRate: per-window keep rates over a mixed feed") {
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00").getTime
    val rows = (0 until 120).map { i =>
      (new java.sql.Timestamp(t0 + i * 60000L), i % 4 != 0) // 45/hour keep
    }
    val out = Streams.windowedKeepRate(rows.toDF("ts", "keep"), "1 hour")
      .orderBy("window_start").collect()
    assert(out.length === 2)
    out.foreach { r =>
      assert(r.getAs[Long]("n_docs") === 60L)
      assert(r.getAs[Long]("n_keep") === 45L)
      assert(r.getAs[Double]("keep_rate") === 0.75)
    }
  }

  // ---- zValueN ----

  test("zValueN: 3-column round-robin interleave matches brute force") {
    def morton3(x: Long, y: Long, z: Long, bits: Int): Long =
      (0 until bits).foldLeft(0L) { (acc, b) =>
        acc | (((x >> b) & 1L) << (3 * b)) |
          (((y >> b) & 1L) << (3 * b + 1)) |
          (((z >> b) & 1L) << (3 * b + 2))
      }
    val grid = for { x <- 0L until 8L; y <- 0L until 8L; z <- 0L until 8L }
      yield (x, y, z)
    val out = grid.toDF("x", "y", "z")
      .select(col("x"), col("y"), col("z"),
        Layout.zValueN(Seq(col("x"), col("y"), col("z")), 3).as("zv"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)) -> r.getLong(3))
      .toMap
    grid.foreach { case (x, y, z) =>
      assert(out((x, y, z)) === morton3(x, y, z, 3))
    }
  }
}
