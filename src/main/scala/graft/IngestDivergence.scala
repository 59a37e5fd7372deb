package graft

/** CSV divergence-zone differential fuzzer (r12 verdict item 6).
  *
  * [[IngestFuzz]] deliberately restricts its vocabulary to constructs
  * where the engine, its pure-Scala model, and DuckDB provably agree —
  * which codifies the interesting ingest constructs OUT of the
  * differential. This fuzzer does the opposite: it generates exactly
  * those constructs — doubled-quote escapes, quoted embedded newlines,
  * a UTF-8 BOM, ragged rows (short and long), unquoted whitespace,
  * quoted-empty fields, bare quotes — and CLASSIFIES each case's
  * outcome instead of excluding it:
  *
  *   - `match`       — the engine and the reference model parse the
  *                     file identically (the crlf / plain controls);
  *   - `divergence`  — they differ, and the difference must equal the
  *                     DOCUMENTED expectation for that construct (the
  *                     ledger below), else CI fails.
  *
  * Two independent models make that classification a real
  * differential, not a tautology:
  *
  *   1. [[goModel]] — a pure-Scala re-implementation of the
  *      reference's ImportCSV semantics (`importer.go:26-84`): Go
  *      `encoding/csv` with `TrimLeadingSpace=true` (RFC 4180 quoting:
  *      doubled-quote escapes, quoted newlines; `FieldsPerRecord`
  *      fixed by the header so any ragged row returns ErrFieldCount;
  *      bare quotes in unquoted fields error), then per-cell
  *      `strings.TrimSpace`. On error the reference ABORTS the import
  *      mid-stream — records before the bad one are already appended
  *      (`importer.go:59-83` appends inside the read loop).
  *   2. the constructive ENGINE expectation each generated case
  *      carries — the documented Spark-univocity parse (probed and
  *      pinned; a silent Spark behavior change fails the spec):
  *      doubled-quote fields survive VERBATIM including their outer
  *      quotes (default escape is backslash, not `"`), a quoted
  *      embedded newline SPLITS the row at the physical line (default
  *      multiLine=false: the opening quote is stripped up to EOL, the
  *      remainder lands in a fresh null-padded row), the BOM is
  *      stripped from the first header name (the reference keeps
  *      U+FEFF — Go's TrimSpace doesn't treat it as space), short rows
  *      null-fill, long rows drop their extra cells, unquoted
  *      whitespace survives verbatim (the reference trims), `""`
  *      imports as NULL (the reference stores the empty string), and
  *      bare quotes survive verbatim (the reference errors).
  *
  * So the documented-superset claims in [[IngestFuzz]]'s Scaladoc are
  * not just prose here — every one is a fuzzed, classified CI fact.
  */
object IngestDivergence {

  // ---- the reference (Go) model --------------------------------------

  sealed trait GoResult
  /** Clean parse: trimmed header names, per-cell TrimSpace'd rows. */
  final case class GoRows(header: Vector[String],
      rows: Vector[Vector[String]]) extends GoResult
  /** Reader error mid-import: rows appended BEFORE the bad record
    * persist (the reference appends inside its read loop and returns
    * the error without rollback).
    */
  final case class GoAbort(reason: String, header: Vector[String],
      persisted: Vector[Vector[String]]) extends GoResult

  /** One Go `encoding/csv` record starting at `pos` (TrimLeadingSpace
    * semantics, LazyQuotes=false). Returns Right((fields, posAfter))
    * or Left(error). Assumes `pos` is at a line start.
    */
  private def goRecord(s: String, pos: Int)
      : Either[String, (Vector[String], Int)] = {
    var p = pos
    val fields = Vector.newBuilder[String]
    var done = false
    while (!done) {
      // TrimLeadingSpace: skip leading spaces/tabs of the field
      while (p < s.length && (s(p) == ' ' || s(p) == '\t')) p += 1
      if (p < s.length && s(p) == '"') { // quoted field
        p += 1
        val sb = new StringBuilder
        var closed = false
        while (!closed) {
          if (p >= s.length) return Left("unterminated quoted field")
          val c = s(p)
          if (c == '"') {
            if (p + 1 < s.length && s(p + 1) == '"') { sb += '"'; p += 2 }
            else { closed = true; p += 1 }
          } else { sb += c; p += 1 }
        }
        // after the closing quote: delimiter, EOL, or EOF
        fields += sb.result()
        if (p >= s.length) done = true
        else if (s(p) == ',') p += 1
        else if (s(p) == '\n') { p += 1; done = true }
        else if (s(p) == '\r' && p + 1 < s.length && s(p + 1) == '\n') {
          p += 2; done = true
        } else return Left("extraneous quote after quoted field")
      } else { // unquoted field
        val sb = new StringBuilder
        var ended = false
        while (!ended && p < s.length) {
          val c = s(p)
          if (c == ',') { p += 1; ended = true }
          else if (c == '\n') { p += 1; ended = true; done = true }
          else if (c == '\r' && p + 1 < s.length && s(p + 1) == '\n') {
            p += 2; ended = true; done = true
          } else if (c == '"') return Left("bare quote in non-quoted field")
          else { sb += c; p += 1 }
        }
        if (p >= s.length && !ended) done = true
        fields += sb.result()
      }
    }
    Right((fields.result(), p))
  }

  /** The reference's ImportCSV over a CSV string: header fixes the
    * field count; every later record must match it exactly; cells and
    * header names are TrimSpace'd; errors abort with the already-read
    * prefix persisted. Blank lines are skipped (Go csv).
    */
  def goModel(csv: String): GoResult = {
    var p = 0
    def skipBlank(): Unit = {
      var more = true
      while (more) {
        if (p < csv.length && csv(p) == '\n') p += 1
        else if (p + 1 < csv.length && csv(p) == '\r' && csv(p + 1) == '\n')
          p += 2
        else more = false
      }
    }
    skipBlank()
    val header = goRecord(csv, p) match {
      case Left(e) => return GoAbort(s"header: $e", Vector.empty, Vector.empty)
      case Right((h, np)) => p = np; h.map(_.trim)
    }
    val rows = Vector.newBuilder[Vector[String]]
    while ({ skipBlank(); p < csv.length }) {
      goRecord(csv, p) match {
        case Left(e) => return GoAbort(e, header, rows.result())
        case Right((rec, np)) =>
          if (rec.length != header.length)
            return GoAbort(
              s"wrong number of fields (${rec.length} vs ${header.length})",
              header, rows.result())
          p = np
          rows += rec.map(_.trim)
      }
    }
    GoRows(header, rows.result())
  }

  // ---- generated cases -----------------------------------------------

  /** `engineRows` is the documented engine parse (null = SQL NULL). */
  final case class DivCase(name: String, construct: String, csv: String,
      engineHeader: Vector[String],
      engineRows: Vector[Vector[String]],
      expectMatch: Boolean)

  val constructs: Seq[String] = Seq("plain", "crlf", "dquote", "qnewline",
    "bom", "ragged_short", "ragged_long", "wspace", "qempty", "bare_quote")

  private val safeVocab = Seq("alpha", "Beta", "x1", "k9", "gamma", "z")
  private val headerNames = Seq("id", "name", "val", "amt")

  private def pick[T](rnd: scala.util.Random, xs: Seq[T]): T =
    xs(rnd.nextInt(xs.size))

  /** `n` cases cycling every construct (so each gets ≥ n/10 cases). */
  def cases(n: Int, seed: Long): Seq[DivCase] = {
    val rnd = new scala.util.Random(seed)
    (0 until n).map { ci =>
      val construct = constructs(ci % constructs.size)
      val nCols = 2 + rnd.nextInt(3)
      val header = headerNames.take(nCols).toVector
      val nRows = 3 + rnd.nextInt(5)
      val plantAt = rnd.nextInt(nRows)
      val filler: IndexedSeq[Vector[String]] = (0 until nRows).map(_ =>
        header.map(_ => pick(rnd, safeVocab)))
      val eol = if (construct == "crlf") "\r\n" else "\n"

      // raw physical lines + the engine's expected parse of them
      val lines = Vector.newBuilder[String]
      val engineRows = Vector.newBuilder[Vector[String]]
      var csvPrefix = ""
      val engineHeader = header // the engine strips the BOM; Go keeps it
      filler.zipWithIndex.foreach { case (row, ri) =>
        if (ri != plantAt || construct == "plain" || construct == "crlf") {
          lines += row.mkString(",")
          engineRows += row
        } else construct match {
          case "dquote" =>
            val v = pick(rnd, safeVocab) + "\"" + pick(rnd, safeVocab)
            val rendered = "\"" + v.replace("\"", "\"\"") + "\""
            val i = rnd.nextInt(nCols)
            lines += row.updated(i, rendered).mkString(",")
            // engine keeps the rendered field VERBATIM (outer quotes too)
            engineRows += row.updated(i, rendered)
          case "qnewline" =>
            val a = pick(rnd, safeVocab); val b = pick(rnd, safeVocab)
            // planted as the LAST cell; the engine splits at the
            // physical line: opening quote stripped to EOL, remainder
            // (with the closing quote) in a fresh null-padded row
            lines += (row.init :+ ("\"" + a)).mkString(",")
            lines += b + "\""
            engineRows += row.init :+ a
            engineRows += (Vector(b + "\"") ++
              Vector.fill(nCols - 1)(null: String))
          case "bom" => // BOM prepended before the header below
            lines += row.mkString(",")
            engineRows += row
          case "ragged_short" =>
            val keep = 1 + rnd.nextInt(nCols - 1)
            lines += row.take(keep).mkString(",")
            engineRows += (row.take(keep) ++
              Vector.fill(nCols - keep)(null: String))
          case "ragged_long" =>
            lines += (row :+ "EXTRA").mkString(",")
            engineRows += row // extra cell silently dropped
          case "wspace" =>
            val i = rnd.nextInt(nCols)
            val v = "  " + row(i) + " "
            lines += row.updated(i, v).mkString(",")
            engineRows += row.updated(i, v) // preserved verbatim
          case "qempty" =>
            val i = rnd.nextInt(nCols)
            lines += row.updated(i, "\"\"").mkString(",")
            engineRows += row.updated(i, null: String)
          case "bare_quote" =>
            val i = rnd.nextInt(nCols)
            val v = pick(rnd, safeVocab) + "\"" + pick(rnd, safeVocab)
            lines += row.updated(i, v).mkString(",")
            engineRows += row.updated(i, v) // verbatim; reference errors
        }
      }
      if (construct == "bom") csvPrefix = "\uFEFF"
      val csv = csvPrefix + (header.mkString(",") +: lines.result())
        .mkString(eol) + eol
      DivCase(f"div_$ci%04d", construct, csv, engineHeader,
        engineRows.result(),
        expectMatch = construct == "plain" || construct == "crlf")
    }
  }

  /** Classify one case: does the documented engine parse equal the
    * reference model's parse? NULL (engine) vs "" (reference) count as
    * different — the reference stores empty strings, the engine stores
    * SQL NULLs. A reference ABORT is always a divergence (the engine
    * imports the whole file).
    */
  def classify(c: DivCase): String = goModel(c.csv) match {
    case GoAbort(reason, _, _) => s"divergence:ref-abort($reason)"
    case GoRows(h, rows) =>
      // engine NULL maps to a sentinel no reference cell can equal
      // (goModel trims every cell, so none retains a leading space)
      val enc = c.engineRows
        .map(_.map(v => if (v == null) " <null>" else v).mkString("\u0001"))
      if (h == c.engineHeader &&
          rows.map(_.mkString("\u0001")).sorted == enc.sorted) "match"
      else if (h != c.engineHeader) "divergence:header"
      else "divergence:cells"
  }
}
