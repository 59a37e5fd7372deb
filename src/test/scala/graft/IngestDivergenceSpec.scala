package graft

import org.scalatest.funsuite.AnyFunSuite

/** The divergence-zone ingest ledger (r12 verdict item 6): every
  * construct [[IngestFuzz]] excludes from its agreement vocabulary is
  * fuzzed here and CLASSIFIED — the engine's parse is pinned against
  * the constructive expectation each case carries (a silent Spark CSV
  * behavior change fails this spec), and the comparison against
  * [[IngestDivergence.goModel]] (the reference's Go csv semantics)
  * must land on the documented classification for that construct.
  */
class IngestDivergenceSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  /** construct → the documented classification prefix. */
  private val expected: Map[String, String] = Map(
    "plain" -> "match",
    "crlf" -> "match",
    "dquote" -> "divergence:cells", // engine keeps "a""b" verbatim; ref unescapes
    "qnewline" -> "divergence:cells", // engine splits the row; ref keeps \n in-cell
    "bom" -> "divergence:header", // engine strips U+FEFF; ref keeps it in col 1
    "ragged_short" -> "divergence:ref-abort", // engine null-fills; ref ErrFieldCount
    "ragged_long" -> "divergence:ref-abort", // engine drops extras; ref ErrFieldCount
    "wspace" -> "divergence:cells", // engine preserves whitespace; ref trims
    "qempty" -> "divergence:cells", // engine NULL; ref empty string
    "bare_quote" -> "divergence:ref-abort") // engine verbatim; ref ErrBareQuote

  test("80 divergence-zone CSVs: engine parse pinned, outcome classified per construct") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_ingdiv_ci")
    val engine = new Engine(spark,
      java.nio.file.Files.createTempDirectory("graft_ingdiv_db").toString)
    val ledger = scala.collection.mutable.Map.empty[String, Int]
    var divergent = 0
    IngestDivergence.cases(n = 80, seed = 13L).foreach { c =>
      val csvPath = tmp.resolve(s"${c.name}.csv")
      java.nio.file.Files.writeString(csvPath, c.csv)
      graft.ingest.Ingest.importCsv(engine.catalog, csvPath.toString, c.name)
      // 1. pin the ENGINE parse: schema names + full cell multiset
      val schema = engine.catalog.sparkSchema(c.name)
      assert(schema.fields.map(_.name).toVector === c.engineHeader,
        s"${c.name}/${c.construct}: engine header")
      val got = engine.catalog.load(c.name).collect()
        .map(r => (0 until r.length).map(i =>
          Option(r.get(i)).map(_.toString).getOrElse("<null>"))
          .mkString("\u0001"))
        .sorted.toVector
      val want = c.engineRows
        .map(_.map(v => if (v == null) "<null>" else v).mkString("\u0001"))
        .sorted
      assert(got === want, s"${c.name}/${c.construct}: engine cells")
      // 2. classify vs the reference model; must match the ledger
      val cls = IngestDivergence.classify(c)
      assert(cls.startsWith(expected(c.construct)),
        s"${c.name}/${c.construct}: classified $cls, " +
          s"documented ${expected(c.construct)}")
      assert((cls == "match") === c.expectMatch,
        s"${c.name}/${c.construct}: match-zone flag")
      if (cls != "match") divergent += 1
      ledger(c.construct) = ledger.getOrElse(c.construct, 0) + 1
      engine.execute(s"DROP TABLE ${c.name}")
    }
    // every construct fuzzed, and the divergence zone is ≥ 50 cases
    assert(IngestDivergence.constructs.forall(ledger.getOrElse(_, 0) >= 8),
      s"ledger coverage: $ledger")
    assert(divergent >= 50, s"only $divergent divergence-zone cases")
    info(s"ledger: ${ledger.toSeq.sortBy(_._1).mkString(", ")} " +
      s"($divergent divergent)")
  }

  test("goModel parses the agreement-zone vocabulary identically to IngestFuzz's model") {
    // the two models overlap on IngestFuzz's restricted vocabulary:
    // cross-validate goModel against the existing model's parsed rows,
    // modulo the reference's trim (the vocab's only edge-whitespace
    // cell is "k 9", interior — trim-invariant) and empty-cell
    // handling (model: null; reference: "" — both from ""-cells only)
    IngestFuzz.cases(n = 40, seed = 99L).foreach { c =>
      IngestDivergence.goModel(c.csv) match {
        case IngestDivergence.GoRows(h, rows) =>
          assert(h === c.header.toVector, s"${c.name}: header")
          val want = c.rows.map(_.map(v => if (v == null) "" else v))
          assert(rows.map(_.mkString("\u0001")).sorted ===
            want.map(_.mkString("\u0001")).sorted, s"${c.name}: rows")
        case IngestDivergence.GoAbort(reason, _, persisted) =>
          // the only legal abort on the agreement vocabulary is a
          // ragged short row (IngestFuzz generates those; the
          // reference rejects them — the documented superset)
          assert(reason.startsWith("wrong number of fields"),
            s"${c.name}: unexpected abort $reason")
          val _ = persisted // prefix-persist semantics exercised above
      }
    }
  }
}
