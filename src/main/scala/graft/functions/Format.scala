package graft.functions

import org.apache.spark.sql.DataFrame

/** Reference result formatting (SURVEY S10): fixed-width 20-character
  * columns — header row, dash rule, data rows, `NULL` placeholders for
  * missing cells (reference `pkg/handlers/select.go:476-512,567-597`).
  */
object Format {
  private val width = 20

  private def cell(v: Any): String = {
    val s = if (v == null) "NULL" else v.toString
    val clipped = if (s.length > width) s.take(width) else s
    clipped.padTo(width, ' ')
  }

  /** Render up to `maxRows` rows in the reference's fixed-width style. */
  def textTable(df: DataFrame, maxRows: Int = 100): String = {
    val cols = df.columns.toSeq
    val header = cols.map(cell).mkString("")
    val rule = "-" * (width * cols.length)
    val rows = df.limit(maxRows).collect().map { r =>
      cols.indices.map(i => cell(r.get(i))).mkString("")
    }
    (Seq(header, rule) ++ rows).mkString("\n")
  }
}
