package graft.nl

/** Deterministic natural-language → dialect-SQL front-end: the
  * reference's heuristic layer (SURVEY.md §2.12 N1/N3/N4/N5) as pure
  * string functions — fully testable, no LLM involved. The optional
  * LLM path lives in [[Ollama]].
  */
object Patterns {

  final case class TableInfo(name: String, columns: Seq[String])

  /** N1: decide SQL vs natural language. SQL verb prefixes win; else
    * question words, conversational verbs, or a trailing '?' mean NL.
    */
  def isNaturalLanguage(input: String): Boolean = {
    val t = input.trim.toUpperCase
    val sqlVerbs = Seq("SELECT ", "INSERT ", "UPDATE ", "DELETE ", "CREATE ",
      "DROP ", "SHOW TABLES", "SET ", "ALTER ")
    if (sqlVerbs.exists(t.startsWith)) false
    else {
      val nlMarkers = Seq("SHOW ME", "HOW MANY", "WHAT ", "WHICH ", "WHO ",
        "LIST ", "GIVE ME", "FIND ", "COUNT ", "DISPLAY ", "TELL ME",
        "CAN YOU", "PLEASE ", "REMOVE ", "CHANGE ", "GET ")
      t.endsWith("?") || nlMarkers.exists(t.contains) ||
        !t.split("\\s+").headOption.exists(w => Seq("SELECT", "INSERT", "UPDATE",
          "DELETE", "CREATE", "DROP", "SHOW").contains(w))
    }
  }

  /** N4: pick the target table. Priority: follow-up context phrase →
    * exact/substring table-name mention → column-keyword overlap score →
    * previous table.
    */
  def matchTable(query: String, tables: Seq[TableInfo],
      prevTable: Option[String]): Option[String] = {
    val q = query.toLowerCase
    val words = q.split("[^a-z0-9_]+").filter(_.nonEmpty).toSeq
    val followUp = Seq("among these", "of those", "from these", "in that case")
    if (followUp.exists(q.contains) && prevTable.isDefined) return prevTable
    // direct table-name mention (singular/plural tolerant)
    tables.map(_.name).find { n =>
      val base = n.toLowerCase
      words.contains(base) || words.contains(base + "s") ||
        (base.endsWith("s") && words.contains(base.dropRight(1)))
    }.orElse {
      // column-keyword overlap score
      val scored = tables.map { t =>
        t.name -> t.columns.count(c => words.contains(c.toLowerCase))
      }.filter(_._2 > 0)
      if (scored.nonEmpty) Some(scored.maxBy(_._2)._1) else prevTable
    }
  }

  /** N5 numeric ops: comparison phrases → operators, most specific
    * first.
    */
  private val numericOps: Seq[(String, String)] = Seq(
    "greater than or equal to" -> ">=", "less than or equal to" -> "<=",
    "at least" -> ">=", "at most" -> "<=",
    "more than" -> ">", "greater than" -> ">", "over " -> ">", "above" -> ">",
    "less than" -> "<", "fewer than" -> "<", "under " -> "<", "below" -> "<",
    "not equal to" -> "!=", "exactly" -> "=", "equal to" -> "=")

  /** N5: extract a numeric WHERE clause: find an op phrase + number,
    * bind to the closest mentioned column (or a numeric-sounding
    * default).
    */
  def numericWhere(query: String, columns: Seq[String]): Option[String] = {
    val q = query.toLowerCase
    numericOps.collectFirst {
      case (phrase, op) if q.contains(phrase) =>
        val after = q.substring(q.indexOf(phrase) + phrase.length)
        val num = "[-+]?[0-9]+(?:\\.[0-9]+)?".r.findFirstIn(after)
        val col = columns.find(c => q.contains(c.toLowerCase))
          .orElse(columns.find(c => Seq("score", "age", "price", "total", "value",
            "amount", "quantity", "bal").exists(c.toLowerCase.contains)))
        (num, col) match {
          case (Some(n), Some(c)) => Some(s"$c $op $n")
          case _ => None
        }
    }.flatten
  }

  /** N5 string predicates: match query words against sampled column
    * values ("students in math" → course = 'math'); negation "is not X"
    * / "not in X" flips to !=. `sample` returns ≤40 distinct values of
    * a column (the reference samples 40 rows).
    */
  def stringWhere(query: String, columns: Seq[String],
      sample: String => Seq[String]): Option[String] = {
    val q = query.toLowerCase
    val negated = Seq(" is not ", " not in ", " except ", " excluding ").exists(q.contains)
    val candidates = for {
      c <- columns
      v <- sample(c).take(40)
      lv = v.toLowerCase if lv.nonEmpty && lv.length > 1 && q.contains(lv)
    } yield (c, v, lv.length)
    // longest matched value wins (most specific); quote-escape the
    // sampled value ('' is the lexer's escape) — data like O'Brien must
    // not produce an unterminated string literal
    candidates.sortBy(-_._3).headOption.map { case (c, v, _) =>
      s"$c ${if (negated) "!=" else "="} '${v.replace("'", "''")}'"
    }
  }

  /** N3: deterministic NL → dialect SQL. Returns None when no pattern
    * applies (caller may fall back to the LLM path).
    */
  def toSql(query: String, tables: Seq[TableInfo], prevTable: Option[String] = None,
      sample: (String, String) => Seq[String] = (_, _) => Nil): Option[String] = {
    val orig = query.trim.stripSuffix("?")
    val q = orig.toLowerCase
    val table = matchTable(q, tables, prevTable)

    def whereFor(t: String): Option[String] = {
      val cols = tables.find(_.name == t).map(_.columns).getOrElse(Nil)
      numericWhere(q, cols).orElse(stringWhere(q, cols, c => sample(t, c)))
    }
    def withWhere(t: String, base: String): String =
      whereFor(t).map(w => s"$base WHERE $w").getOrElse(base)

    // DML value extraction runs case-insensitively against the ORIGINAL
    // string so values keep their case ('Bob', not 'bob'); column/table
    // names come from the catalog side and are already canonical.

    // drop: "drop/delete/remove the X table" ("drop ..."/"delete ..."
    // prefixes are usually classified as SQL by N1; "remove ..." is the
    // phrasing that reaches this NL path)
    val dropPat = """(?i)(?:drop|delete|remove)\s+(?:the\s+)?(\w+)\s+table""".r
    dropPat.findFirstMatchIn(orig).foreach { m =>
      return Some(s"DROP TABLE ${m.group(1).toLowerCase}")
    }

    // update: "change <col> to <val> where/for <col2> is <val2>"
    val changePat = """(?i)change\s+(?:the\s+)?(\w+)\s+to\s+'?([\w.]+)'?\s+(?:where|for|of)\s+(\w+)\s+(?:is|=|equals)\s+'?([\w.]+)'?""".r
    changePat.findFirstMatchIn(orig).foreach { m =>
      table.foreach { t =>
        return Some(s"UPDATE $t SET ${m.group(1).toLowerCase} = '${m.group(2)}' WHERE ${m.group(3).toLowerCase} = '${m.group(4)}'")
      }
    }
    // update possessive: "update <name>'s <col> to <val>"
    val possPat = """(?i)update\s+(\w+)'s\s+(\w+)\s+to\s+'?([\w.]+)'?""".r
    possPat.findFirstMatchIn(orig).foreach { m =>
      table.foreach { t =>
        val nameCol = tables.find(_.name == t).flatMap(
          _.columns.find(_.toLowerCase.contains("name"))).getOrElse("name")
        return Some(s"UPDATE $t SET ${m.group(2).toLowerCase} = '${m.group(3)}' WHERE $nameCol = '${m.group(1)}'")
      }
    }

    // delete: "remove/delete <...> with <col> <val>" or "... where col is val"
    val removePat = """(?i)(?:remove|delete)\s+.*?(?:with|where|whose)\s+(\w+)\s+(?:is|=|equals)?\s*'?([\w.]+)'?""".r
    if (q.startsWith("remove") || q.startsWith("delete")) {
      removePat.findFirstMatchIn(orig).foreach { m =>
        table.foreach { t =>
          return Some(s"DELETE FROM $t WHERE ${m.group(1).toLowerCase} = '${m.group(2)}'")
        }
      }
    }

    // counting: "how many ..." / "count (of) ..." — anywhere in the
    // query, so follow-ups like "and among these, how many?" resolve
    if (q.contains("how many") || q.startsWith("count")) {
      table.foreach { t => return Some(withWhere(t, s"SELECT COUNT(*) FROM $t")) }
    }

    // listing: "show (me) (all) X" / "list X" / "display X" / "give me X"
    if (Seq("show", "list", "display", "give me", "find", "get", "what").exists(q.startsWith)) {
      table.foreach { t => return Some(withWhere(t, s"SELECT * FROM $t")) }
    }

    None
  }
}
