package graft

import graft.functions.PqExpressions
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** PqEncode / SqL2ToQuery (r16 optimization): the fused codegen'd
  * kernels must be BIT-identical to the higher-order formulations they
  * replaced — per-subspace `aggregate(zip_with(...))` squared
  * distances, `array_min` over (dist, code) structs (NaN-greatest,
  * ties to the lowest code), err as the left-to-right reduceLeft sum.
  */
class PqExprSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val M = 4
  private val K = 5
  private val DSUB = 3

  // deterministic pseudo-random corpus + codebooks incl. ties
  private def rng(seed: Long): Iterator[Double] = {
    var s = seed
    Iterator.continually {
      s = s * 6364136223846793005L + 1442695040888963407L
      (s >>> 11).toDouble / (1L << 53).toDouble * 4.0 - 2.0
    }
  }

  private lazy val cbs: Array[Array[Array[Double]]] = {
    val it = rng(7)
    val raw = Array.fill(M, K, DSUB)(it.next())
    raw(1)(3) = raw(1)(1).clone() // duplicated codeword => dist tie
    raw
  }

  private lazy val df = {
    val it = rng(99)
    val rows = (0 until 200).map { i =>
      val v = Array.fill(M * DSUB)(it.next())
      if (i % 17 == 0) { // plant exact codeword hits => zero-dist ties
        val j = i % M
        System.arraycopy(cbs(j)(i % K), 0, v, j * DSUB, DSUB)
      }
      (i.toLong, v)
    }
    rows.toDF("id", "v").withColumn("v", col("v").cast("array<double>"))
  }

  private def hofSqDist(sub: org.apache.spark.sql.Column, cw: Array[Double]) =
    aggregate(zip_with(sub, typedlit(cw.toSeq), (x, y) => (x - y) * (x - y)),
      lit(0.0), (acc, d) => acc + d)

  private lazy val hofEncoded = {
    val best = (0 until M).map { j =>
      val sub = slice(col("v"), j * DSUB + 1, DSUB)
      array_min(array(cbs(j).zipWithIndex.map { case (cw, c) =>
        struct(hofSqDist(sub, cw).as("dist"), lit(c).as("code"))
      }: _*))
    }
    df.select(col("id"),
      array(best.map(_.getField("code")): _*).as("codes"),
      best.map(_.getField("dist")).reduceLeft(_ + _).as("err"))
      .orderBy("id").collect()
  }

  private lazy val fused = {
    val enc = PqExpressions.pq_encode(col("v"), cbs)
    df.select(col("id"), enc.getField("codes").as("codes"),
        enc.getField("err").as("err"))
      .orderBy("id").collect()
  }

  test("pq_encode codes match the HOF struct-min exactly (incl. ties)") {
    hofEncoded.zip(fused).foreach { case (a, b) =>
      assert(a.getSeq[Int](1) == b.getSeq[Int](1), s"id ${a.getLong(0)}")
    }
  }

  test("pq_encode err is bit-identical to the reduceLeft HOF sum") {
    hofEncoded.zip(fused).foreach { case (a, b) =>
      assert(java.lang.Double.doubleToLongBits(a.getDouble(2)) ==
        java.lang.Double.doubleToLongBits(b.getDouble(2)), s"id ${a.getLong(0)}")
    }
  }

  test("sq_l2_to_query is bit-identical to the HOF fold") {
    val q = Array.fill(M * DSUB)(rng(3).next())
    val hof = df.select(col("id"), aggregate(
        zip_with(col("v"), typedlit(q.toSeq), (x, y) => (x - y) * (x - y)),
        lit(0.0), (acc, d) => acc + d).as("d"))
      .orderBy("id").collect().map(_.getDouble(1))
    val nat = df.select(col("id"),
        PqExpressions.sq_l2_to_query(col("v"), q.toSeq).as("d"))
      .orderBy("id").collect().map(_.getDouble(1))
    hof.zip(nat).foreach { case (a, b) =>
      assert(java.lang.Double.doubleToLongBits(a) ==
        java.lang.Double.doubleToLongBits(b))
    }
  }

  test("dims mismatch fails loudly") {
    val bad = Seq((1L, Array(1.0, 2.0))).toDF("id", "v")
    intercept[Exception] {
      bad.select(PqExpressions.pq_encode(col("v"), cbs)).collect()
    }
    intercept[Exception] {
      bad.select(PqExpressions.sq_l2_to_query(col("v"), Seq(1.0, 2.0, 3.0))).collect()
    }
  }
}
