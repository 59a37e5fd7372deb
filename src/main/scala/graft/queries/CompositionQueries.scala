package graft.queries

import graft.Tables
import graft.ops.{Joins, Pipelines, Sketches}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Composed operators: the end-to-end corpus-prep pipeline and sketch
  * aggregates. The pipeline stays rows-only in the driver gate
  * (MinHash isn't ANSI-SQL-reproducible; stage-wise coverage in
  * PipelineCompositionSpec); the sketch query ships a bounded-error
  * oracle — DuckDB recomputes the exact counts and the within-bound
  * boolean.
  */
object CompositionQueries {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_pipeline_corpus" -> ((s, dir) => {
      Pipelines.prepareCorpus(Tables.load(s, dir, "documents"), "doc_id", "text",
          Pipelines.CorpusConfig(minQuality = 0.0, nearDupThreshold = 0.5))
        .select(col("doc_id"), col("lang_pred"), round(col("quality"), 4).as("quality"),
          col("n_tokens"), col("n_bpeish_tokens"))
        .orderBy(col("doc_id"))
    }),
    "q_sketch_distinct" -> ((s, dir) => {
      // bounded-error form (r5 verdict item 8): the HLL++ estimate is
      // approximate by design, but the within-5% claim is exact and
      // DuckDB recomputes it — a sketch regression breaks the hash.
      // rsd 0.02 against a 5% audit band: the sketch's one-sigma error
      // is 2%, so the 2.5-sigma claim holds with margin at every SF
      // (the default 5% rsd missed the band in one sf0.01 group).
      Sketches.approxDistinctAudit(
          Tables.load(s, dir, "orders"), "o_orderpriority", "o_custkey",
          rsd = 0.02, relErr = 0.05)
        .orderBy(col("o_orderpriority"))
    }),
    "q_asof_join" -> ((s, dir) => {
      // each purchase gets the user's most recent prior error event;
      // single shuffle on user_id (window composition), verified against
      // DuckDB's native ASOF JOIN.
      val events = Tables.load(s, dir, "events")
      val purchases = events.filter(col("event_type") === "purchase")
        .select(col("event_id"), col("ts"), col("user_id"), col("value"))
      val errors = events.filter(col("event_type") === "error")
        .select(col("event_id"), col("ts"), col("user_id"))
      Joins.asofJoinBackward(purchases, errors, "user_id", "ts", Seq("event_id"))
        .orderBy(col("event_id"))
    }),
    "q_range_join" -> ((s, dir) => {
      // orders priced within ±500 of each part's retail price; binned
      // equi-join instead of an O(n·m) nested loop.
      val parts = Tables.load(s, dir, "part")
        .select(col("p_partkey"), (col("p_retailprice") - 500).as("lo"),
          (col("p_retailprice") + 500).as("hi"))
      val orders = Tables.load(s, dir, "orders")
        .select(col("o_orderkey"), col("o_totalprice"))
      Joins.pointInRangeJoin(orders, parts, "o_totalprice", "lo", "hi", binWidth = 1000)
        .groupBy(col("p_partkey"))
        .agg(count(lit(1)).as("n_orders"))
        .orderBy(col("p_partkey"))
    })
  )

  def oracles: Map[String, String] = Map(
    "q_sketch_distinct" ->
      """SELECT o_orderpriority,
           COUNT(DISTINCT o_custkey) AS exact_distinct,
           COUNT(*) AS n, TRUE AS within_rel_err
         FROM orders GROUP BY 1 ORDER BY 1""",
    "q_asof_join" ->
      """SELECT l.event_id, l.ts, l.user_id, l.value, r.event_id AS asof_event_id
         FROM (SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, user_id, value
               FROM events WHERE event_type = 'purchase') l
         ASOF LEFT JOIN (SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, user_id
               FROM events WHERE event_type = 'error') r
           ON l.user_id = r.user_id AND l.ts >= r.ts
         ORDER BY l.event_id""",
    "q_range_join" ->
      """SELECT p_partkey, COUNT(*) AS n_orders
         FROM part JOIN orders
           ON o_totalprice >= p_retailprice - 500 AND o_totalprice <= p_retailprice + 500
         GROUP BY p_partkey ORDER BY p_partkey"""
  )
}
