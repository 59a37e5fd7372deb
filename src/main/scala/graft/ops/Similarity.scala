package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (`Array[Float]`).
  *
  * Baseline: brute-force cosine top-k — one scan, no shuffle except the
  * final TakeOrdered(k). Scale path: random-hyperplane LSH — each row
  * gets an n-bit signature; candidates come from an equality match on
  * the signature (plus Hamming≤1 multiprobe), so a 100 TB table is
  * probed by bucket instead of scanned. Signatures are plain columns:
  * they can be precomputed, partitioned on, and pruned like any other.
  *
  * All arithmetic is double-precision, computed by the native Catalyst
  * expressions in graft.functions.VectorExpressions (codegen'd fused
  * loops — Spark's higher-order lambdas would interpret per element).
  */
object Similarity {
  import graft.functions.VectorExpressions

  /** Dot product of two array columns, accumulated in double. */
  def dot(a: Column, b: Column): Column = VectorExpressions.dot_product(a, b)

  def l2Norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity, 0 when either vector is all-zero. */
  def cosine(a: Column, b: Column): Column = VectorExpressions.cosine_sim(a, b)

  /** Deterministic pseudo-random unit-ish hyperplanes (fixed seed so
    * signatures are stable across runs and cluster restarts).
    */
  def hyperplanes(nBits: Int, dims: Int, seed: Long = 42L): Seq[Array[Double]] = {
    val rnd = new scala.util.Random(seed)
    Seq.fill(nBits)(Array.fill(dims)(rnd.nextGaussian()))
  }

  /** n-bit signature of a vector column: bit i = sign(v · plane_i). */
  def signature(v: Column, planes: Seq[Array[Double]]): Column =
    planes.zipWithIndex.map { case (p, i) =>
      when(dot(v, typedlit(p)) >= 0.0, shiftleft(lit(1L), i)).otherwise(lit(0L))
    }.reduce((a, b) => a.bitwiseOR(b))

  /** Brute-force cosine top-k against a literal query vector. Compiles
    * to scan → project → TakeOrderedAndProject: no global sort, no
    * shuffle of the table.
    */
  def bruteForceTopK(df: DataFrame, idCol: String, vecCol: String,
      query: Array[Double], k: Int): DataFrame =
    df.select(col(idCol), cosine(col(vecCol), typedlit(query)).as("sim"))
      .orderBy(col("sim").desc, col(idCol))
      .limit(k)

  /** LSH-bucketed approximate top-k: probe the query's signature bucket
    * plus all Hamming-distance-1 buckets (multiprobe), brute-force only
    * within candidates. On a partitioned-by-signature table this reads
    * a tiny fraction of rows; recall is tunable via nBits/probes.
    */
  def annTopK(df: DataFrame, idCol: String, vecCol: String,
      query: Array[Double], k: Int, nBits: Int = 12, dims: Int = 64): DataFrame = {
    val planes = hyperplanes(nBits, dims)
    val qSig = planes.zipWithIndex.map { case (p, i) =>
      val d = p.zip(query).map { case (x, y) => x * y }.sum
      if (d >= 0.0) 1L << i else 0L
    }.reduce(_ | _)
    val probeSigs = qSig +: (0 until nBits).map(i => qSig ^ (1L << i))
    Dedup.widen(df).withColumn("lsh_sig", signature(col(vecCol), planes))
      .filter(col("lsh_sig").isin(probeSigs: _*))
      .select(col(idCol), cosine(col(vecCol), typedlit(query)).as("sim"))
      .orderBy(col("sim").desc, col(idCol))
      .limit(k)
  }

  /** Embedding-cosine near-duplicate pairs: equality join on the LSH
    * signature (single shuffle on a compact long key), then exact
    * cosine verification ≥ threshold. The signature join finds pairs
    * with high angular similarity; threshold does the final cut.
    */
  def cosineNearDupPairs(df: DataFrame, idCol: String, vecCol: String,
      threshold: Double = 0.95, nBits: Int = 16, dims: Int = 64): DataFrame = {
    val planes = hyperplanes(nBits, dims)
    // persist: nBits×dims dot products per row, consumed by both join sides
    val signed = Dedup.widen(df).select(col(idCol).as("id"), col(vecCol).as("v"),
      signature(col(vecCol), planes).as("sig"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    signed.as("a")
      .join(signed.as("b"), col("a.sig") === col("b.sig") && col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        cosine(col("a.v"), col("b.v")).as("cos"))
      .filter(col("cos") >= threshold)
  }
}
