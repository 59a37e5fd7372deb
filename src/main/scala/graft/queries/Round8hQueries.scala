package graft.queries

import graft.Tables
import graft.ops.{Graphs, TextAnalysis}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-8 part 8: graph analytics over the events click graph —
  * fixed-point integer PageRank (engine-exact by construction: integer
  * division and commutative integer sums) and the degree-distribution
  * synopsis — plus the per-source n-gram diversity audit. Every query
  * is deterministic and recomputed end to end by its DuckDB oracle.
  */
object Round8hQueries {

  /** user ↔ item edges from events: item = props.k offset into its own
    * id space; symmetrized so rank flows both ways through the
    * bipartite graph.
    */
  private def clickEdges(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.load(s, dir, "events")
    val item: Column = lit(1000000L) +
      get_json_object(col("props"), "$.k").cast("long")
    Graphs.edges(ev, col("user_id"), item)
      .unionByName(Graphs.edges(ev, item, col("user_id")))
      .distinct()
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // ---- fixed-point PageRank ----
    "q_pagerank" -> ((s, dir) =>
      Graphs.pageRankFixedPoint(clickEdges(s, dir), iters = 3)
        .orderBy(col("id"))),

    // ---- degree distribution ----
    "q_graph_degrees" -> ((s, dir) =>
      Graphs.degreeHistogram(clickEdges(s, dir))
        .orderBy(col("side"), col("deg"))),

    // ---- per-source n-gram diversity ----
    "q_source_diversity" -> ((s, dir) =>
      TextAnalysis.sourceDiversity(Tables.load(s, dir, "documents"),
          "doc_id", "source", "text")
        .orderBy(col("source")))
  )

  /** Shared oracle CTEs: the symmetrized click graph + one PageRank
    * iteration template (rank mass moves by integer division, so every
    * engine reproduces the exact values).
    */
  private val graphSql: String =
    """ue AS (SELECT DISTINCT user_id AS src,
           1000000 + CAST(json_extract(props, '$.k') AS BIGINT) AS dst
         FROM events),
       e AS (SELECT src, dst FROM ue UNION SELECT dst, src FROM ue),
       deg AS (SELECT src, COUNT(*) AS deg FROM e GROUP BY src)"""

  private def prIter(prev: String, cur: String): String =
    s"""$cur AS (SELECT n.id,
           CAST(150000 + COALESCE(c.s, 0) AS BIGINT) AS rank
         FROM nodes n LEFT JOIN (
           SELECT e.dst AS id, SUM((r.rank * 85) // (100 * d.deg)) AS s
           FROM e JOIN deg d ON e.src = d.src
                  JOIN $prev r ON e.src = r.id
           GROUP BY e.dst) c ON n.id = c.id)"""

  def oracles: Map[String, String] = Map(

    "q_pagerank" ->
      s"""WITH $graphSql,
         nodes AS (SELECT DISTINCT src AS id FROM e
                   UNION SELECT DISTINCT dst FROM e),
         r0 AS (SELECT id, CAST(1000000 AS BIGINT) AS rank FROM nodes),
         ${prIter("r0", "r1")},
         ${prIter("r1", "r2")},
         ${prIter("r2", "r3")}
         SELECT id, rank FROM r3 ORDER BY id""",

    "q_graph_degrees" ->
      s"""WITH $graphSql
         SELECT 'out' AS side, deg, CAST(COUNT(*) AS BIGINT) AS n_nodes
         FROM deg GROUP BY deg
         UNION ALL
         SELECT 'in', deg, CAST(COUNT(*) AS BIGINT) FROM (
           SELECT dst, COUNT(*) AS deg FROM e GROUP BY dst)
         GROUP BY deg
         ORDER BY side, deg""",

    "q_source_diversity" ->
      """WITH t AS (SELECT doc_id, source,
             list_filter(string_split_regex(LOWER(TRIM(text)), '\s+'),
               x -> LENGTH(x) > 0) AS tk
           FROM documents),
         g AS (SELECT doc_id, source,
             UNNEST(CASE WHEN LEN(tk) = 0 THEN []
               ELSE list_transform(range(1, GREATEST(LEN(tk) - 3, 0) + 2),
                 i -> array_to_string(tk[i:i+2], ' ')) END) AS gram
           FROM t)
         SELECT source, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs,
           CAST(COUNT(*) AS BIGINT) AS n_grams,
           CAST(COUNT(DISTINCT gram) AS BIGINT) AS n_distinct,
           ROUND(CAST(COUNT(DISTINCT gram) AS DOUBLE) /
             CAST(COUNT(*) AS DOUBLE), 6) AS diversity
         FROM g GROUP BY source ORDER BY source"""
  )
}
