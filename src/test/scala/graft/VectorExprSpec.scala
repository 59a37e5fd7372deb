package graft

import graft.functions.VectorExpressions
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Native vector expressions: correctness (incl. bit-parity with the
  * higher-order formulation), codegen path, and SQL registration.
  */
class VectorExprSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private lazy val df = Seq(
    (1L, Array(1.0f, 2.0f, 3.0f), Array(4.0, 5.0, 6.0)),
    (2L, Array(0.0f, 0.0f, 0.0f), Array(1.0, 0.0, 0.0)),
    (3L, Array(-1.0f, 1.0f, 0.5f), Array(2.0, -2.0, 8.0))
  ).toDF("id", "vf", "vd")

  test("dot product matches hand computation; mixed float/double arrays") {
    val got = df.orderBy("id").select(VectorExpressions.dot_product(col("vf"), col("vd")))
      .collect().map(_.getDouble(0)).toSeq
    assert(got == Seq(1.0*4 + 2*5 + 3*6, 0.0, -2.0 - 2.0 + 4.0))
  }

  test("cosine similarity: known values and zero-vector guard") {
    val got = df.orderBy("id").select(VectorExpressions.cosine_sim(col("vf"), col("vd")))
      .collect().map(_.getDouble(0))
    val expected0 = 32.0 / (math.sqrt(14.0) * math.sqrt(77.0))
    assert(math.abs(got(0) - expected0) < 1e-12)
    assert(got(1) == 0.0) // zero vector → 0, not NaN
  }

  test("bit-identical to the higher-order formulation") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val q = emb.filter(col("vec_id") === 0).head().getSeq[Float](1).map(_.toDouble).toArray
    val hof = emb.select(col("vec_id"), aggregate(
        zip_with(transform(col("embedding"), x => x.cast("double")), typedlit(q), (x, y) => x * y),
        lit(0.0), (acc, x) => acc + x).as("d"))
      .orderBy("vec_id").collect().map(_.getDouble(1))
    val native = emb.select(col("vec_id"),
        VectorExpressions.dot_product(col("embedding"), typedlit(q)).as("d"))
      .orderBy("vec_id").collect().map(_.getDouble(1))
    assert(hof.toSeq == native.toSeq) // exact equality, same accumulation order
  }

  test("interpreted eval path agrees with codegen path") {
    // force interpreted eval via the expression's nullSafeEval directly
    val e = graft.functions.CosineSimilarity(
      org.apache.spark.sql.catalyst.expressions.Literal.create(Array(1.0, 0.0),
        org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.DoubleType)),
      org.apache.spark.sql.catalyst.expressions.Literal.create(Array(1.0, 1.0),
        org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.DoubleType)))
    val interp = e.eval(null).asInstanceOf[Double]
    assert(math.abs(interp - 1.0 / math.sqrt(2.0)) < 1e-12)
  }

  test("registered SQL functions work through spark.sql") {
    VectorExpressions.registerAll(spark)
    df.createOrReplaceTempView("vex")
    val r = spark.sql("SELECT id, cosine_sim(vf, vd) AS c, dot_product(vf, vd) AS d FROM vex ORDER BY id")
      .collect()
    assert(r.length == 3 && r(0).getDouble(2) == 32.0)
  }

  test("type check rejects non-array inputs") {
    val bad = graft.functions.DotProduct(
      org.apache.spark.sql.catalyst.expressions.Literal(1),
      org.apache.spark.sql.catalyst.expressions.Literal(2))
    assert(!bad.checkInputDataTypes().isSuccess)
  }

  test("SQ8 kernels fail loudly on a dims/bounds mismatch (both paths)") {
    // bounds are fixed configuration — stale stored bounds after a
    // schema change must ERROR, never silently truncate (ADVICE r15)
    val mn = Seq(0.0, 0.0); val mx = Seq(1.0, 1.0)
    val three = Seq((1L, Array(0.1f, 0.2f, 0.3f))).toDF("id", "v")
    val encErr = intercept[Exception] {
      three.select(VectorExpressions.sq8_encode(col("v"), mn, mx)).collect()
    }
    assert(encErr.toString.contains("sq8_encode") ||
      Option(encErr.getCause).exists(_.toString.contains("sq8_encode")))
    // interpreted path too
    val e = graft.functions.Sq8Encode(
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        Array(0.1, 0.2, 0.3),
        org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.DoubleType)), mn, mx)
    intercept[IllegalArgumentException] { e.eval(null) }
    val codes = Seq((1L, Array[Byte](1, 2, 3))).toDF("id", "c")
    val cosErr = intercept[Exception] {
      codes.select(VectorExpressions.sq8_cosine_to_query(
        col("c"), mn, mx, Seq(0.5, 0.5))).collect()
    }
    assert(cosErr.toString.contains("sq8_cosine_to_query") ||
      Option(cosErr.getCause).exists(_.toString.contains("sq8_cosine_to_query")))
    // matched lengths still work end to end
    val ok = Seq((1L, Array(0.25f, 0.75f))).toDF("id", "v")
      .select(VectorExpressions.sq8_encode(col("v"), mn, mx).as("c"))
      .select(VectorExpressions.sq8_cosine_to_query(
        col("c"), mn, mx, Seq(0.25, 0.75)).as("s"))
      .head().getDouble(0)
    assert(ok > 0.99)
  }

  test("column-bounds SQ8 kernel matches the literal-bounds kernel; mismatch errors") {
    val mn = Seq(0.0, -1.0); val mx = Seq(2.0, 1.0); val q = Seq(0.7, -0.3)
    val rows = Seq((1L, Array(0.5f, 0.5f)), (2L, Array(1.9f, -0.9f)))
    val lit_ = rows.toDF("id", "v")
      .select(col("id"), VectorExpressions.sq8_encode(col("v"), mn, mx).as("c"))
    val viaLit = lit_.select(col("id"),
        VectorExpressions.sq8_cosine_to_query(col("c"), mn, mx, q).as("s"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // same bounds delivered as COLUMNS: identical arithmetic order =>
    // bit-identical result... except the query side: the cols kernel is
    // asymmetric (raw q), so feed it the same q and compare directly
    val viaCols = lit_
      .withColumn("mns", typedlit(mn)).withColumn("mxs", typedlit(mx))
      .select(col("id"), VectorExpressions.sq8_cosine_to_query_cols(
        col("c"), col("mns"), col("mxs"), q).as("s"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(viaCols == viaLit)
    val err = intercept[Exception] {
      lit_.withColumn("mns", typedlit(Seq(0.0))).withColumn("mxs", typedlit(Seq(1.0)))
        .select(VectorExpressions.sq8_cosine_to_query_cols(
          col("c"), col("mns"), col("mxs"), q)).collect()
    }
    assert(err.toString.contains("sq8_cosine_to_query_cols") ||
      Option(err.getCause).exists(_.toString.contains("sq8_cosine_to_query_cols")))
  }

  test("GraftExtensions registers the functions on a new session") {
    // apply to an extensions container (builder-injection path), then
    // verify through an independent session's catalog via newSession
    val ext = new org.apache.spark.sql.SparkSessionExtensions
    new graft.GraftExtensions().apply(ext) // must not throw
    // end-to-end: a cloned session with functions registered resolves SQL
    val s2 = spark.newSession()
    VectorExpressions.registerAll(s2)
    import s2.implicits._
    val one = Seq((Array(1.0f, 0.0f), Array(1.0f, 0.0f))).toDF("a", "b")
    one.createOrReplaceTempView("vx")
    assert(s2.sql("SELECT cosine_sim(a, b) FROM vx").head().getDouble(0) == 1.0)
  }
}
