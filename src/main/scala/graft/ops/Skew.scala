package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for joins whose key distribution is heavy-tailed —
  * the 100 TB failure mode where one hot key lands an entire shuffle
  * partition on one executor. AQE's skew-join handles sort-merge cases
  * adaptively; explicit salting is for when the small side fits in
  * memory per-salt but not as a broadcast, or when deterministic
  * partition bounds are required.
  */
object Skew {

  /** Salted equi-join: the large side gets a deterministic salt derived
    * from its full row content (any assignment is correct — the small
    * side is replicated across every salt); the small side explodes to
    * all `salts` copies. Shuffle keys become (key, salt), splitting a
    * hot key across `salts` reducers.
    */
  def saltedJoin(large: DataFrame, small: DataFrame, key: String,
      salts: Int, joinType: String = "inner"): DataFrame = {
    require(salts > 0, "salts must be positive")
    val largeSalted = large.withColumn("_salt",
      pmod(hash(large.columns.map(col).toSeq: _*), lit(salts)))
    val smallSalted = small.withColumn("_salt",
      explode(array((0 until salts).map(lit): _*)))
    largeSalted.join(smallSalted,
        largeSalted(key) === smallSalted(key) && largeSalted("_salt") === smallSalted("_salt"),
        joinType)
      .drop(smallSalted(key)).drop(largeSalted("_salt")).drop(smallSalted("_salt"))
  }

  /** Top-k key frequencies — the diagnostic used to decide whether a
    * join needs salting (one aggregation, map-side combined).
    */
  def keySkewProfile(df: DataFrame, key: String, k: Int = 20): DataFrame =
    df.groupBy(col(key)).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col(key))
      .limit(k)
}
