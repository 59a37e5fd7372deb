package graft.dialect

import scala.collection.mutable.ArrayBuffer

/** Quote-aware tokenizer for the reference dialect.
  *
  * Splits on whitespace and the punctuation `( ) , ;`, keeps
  * single-quoted strings as one token (quotes preserved so the parser
  * can distinguish quoted literals), and recognizes the two-char
  * operators `!= <= >=` plus `= < >`.
  * Behavior mirrors reference `pkg/parser/parser.go:17-51` and the
  * expression tokenizer `pkg/expr/expr.go:350-401`.
  */
object Lexer {
  final case class Token(text: String, quoted: Boolean) {
    def upper: String = text.toUpperCase
  }

  def tokenize(input: String): Vector[Token] = {
    val out = ArrayBuffer.empty[Token]
    val cur = new StringBuilder
    var i = 0
    def flush(): Unit = if (cur.nonEmpty) { out += Token(cur.toString, quoted = false); cur.clear() }
    while (i < input.length) {
      val c = input.charAt(i)
      c match {
        case '\'' =>
          flush()
          val sb = new StringBuilder
          i += 1
          var closed = false
          while (i < input.length && !closed) {
            val d = input.charAt(i)
            if (d == '\'') {
              // '' inside a string = escaped quote
              if (i + 1 < input.length && input.charAt(i + 1) == '\'') { sb += '\''; i += 2 }
              else { closed = true; i += 1 }
            } else { sb += d; i += 1 }
          }
          if (!closed) throw DialectException("unterminated string literal")
          out += Token(sb.toString, quoted = true)
          i -= 1 // main loop advances
        case '(' | ')' | ',' | ';' =>
          flush(); out += Token(c.toString, quoted = false)
        case '!' | '<' | '>' if i + 1 < input.length && input.charAt(i + 1) == '=' =>
          flush(); out += Token(s"$c=", quoted = false); i += 1
        case '=' | '<' | '>' =>
          flush(); out += Token(c.toString, quoted = false)
        case w if w.isWhitespace => flush()
        case other => cur += other
      }
      i += 1
    }
    flush()
    out.toVector
  }
}
