package graft.osl

/** OSL tokenizer. Line-oriented: NEWLINE tokens delimit statements; lines
  * join implicitly inside brackets or when a line ends with a binary
  * operator / comma (the reference's scripts span `where` clauses over
  * lines that end in `&&`). Time literals like `3_months` lex to ms
  * constants (compile-time expansion, `src/queryparserosl.h:378-444`). */
object Lexer {

  sealed trait Tok { def text: String }
  final case class TIdent(text: String) extends Tok
  final case class TInt(v: Long) extends Tok { def text = v.toString }
  /** A time literal (`5_minutes`) expanded to ms at lex time. Distinct from
    * TInt so consumers that care about units (segment `refresh=` flags) know
    * the value is ms rather than inferring the unit from its shape. */
  final case class TTime(v: Long) extends Tok { def text = v.toString }
  final case class TDbl(v: Double) extends Tok { def text = v.toString }
  final case class TStr(s: String) extends Tok { def text = s }
  final case class TOp(text: String) extends Tok
  case object TNewline extends Tok { def text = "\\n" }
  case object TEof extends Tok { def text = "<eof>" }

  private val unitMs: Map[String, Long] = {
    val s = 1000L; val m = 60 * s; val h = 60 * m; val d = 24 * h; val w = 7 * d
    Map(
      "second" -> s, "seconds" -> s, "minute" -> m, "minutes" -> m,
      "hour" -> h, "hours" -> h, "day" -> d, "days" -> d,
      "week" -> w, "weeks" -> w, "month" -> 31 * d, "months" -> 31 * d,
      "year" -> 365 * d, "years" -> 365 * d)
  }

  private val ops = Seq(
    "<<", "==", "!=", ">=", "<=", "&&", "||", "+=", "-=",
    "(", ")", "[", "]", "{", "}", ",", ":", ".", "+", "-", "*", "/",
    ">", "<", "=", "!", "@")

  def lex(src: String): Vector[Tok] = {
    val out = Vector.newBuilder[Tok]
    var depth = 0
    var lastSignificant: Tok = TNewline
    val n = src.length
    var i = 0

    def isJoiner(t: Tok): Boolean = t match {
      case TOp(o) => Set("&&", "||", ",", "+", "-", "*", "/", "==", "!=",
        ">=", "<=", ">", "<", "=", "+=", "-=", "<<", ".").contains(o)
      // the reference's scripts put the condition on the line AFTER
      // `where` (README.md:167-171 `each_row where\n  product_group…`)
      case TIdent("where") => true
      case _ => false
    }

    while (i < n) {
      val c = src(i)
      if (c == '#') { while (i < n && src(i) != '\n') i += 1 }
      else if (c == '\n') {
        if (depth == 0 && lastSignificant != TNewline && !isJoiner(lastSignificant)) {
          out += TNewline; lastSignificant = TNewline
        }
        i += 1
      }
      else if (c == ' ' || c == '\t' || c == '\r') i += 1
      else if (c == '\'' || c == '"') {
        val q = c; val sb = new StringBuilder; i += 1
        while (i < n && src(i) != q) {
          if (src(i) == '\\' && i + 1 < n) { sb += src(i + 1); i += 2 }
          else { sb += src(i); i += 1 }
        }
        i += 1
        val t = TStr(sb.toString); out += t; lastSignificant = t
      }
      else if (c.isDigit) {
        val start = i
        while (i < n && (src(i).isDigit || src(i) == '.')) i += 1
        val numTxt = src.substring(start, i)
        // time literal: 3_months
        if (i < n && src(i) == '_' ) {
          val us = i + 1
          var j = us
          while (j < n && src(j).isLetter) j += 1
          val unit = src.substring(us, j)
          unitMs.get(unit) match {
            case Some(ms) =>
              i = j
              val t = TTime(numTxt.toDouble.toLong * ms); out += t; lastSignificant = t
            case None =>
              val t = if (numTxt.contains('.')) TDbl(numTxt.toDouble) else TInt(numTxt.toLong)
              out += t; lastSignificant = t
          }
        } else {
          val t = if (numTxt.contains('.')) TDbl(numTxt.toDouble) else TInt(numTxt.toLong)
          out += t; lastSignificant = t
        }
      }
      else if (c.isLetter || c == '_') {
        val start = i
        while (i < n && (src(i).isLetterOrDigit || src(i) == '_')) i += 1
        val t = TIdent(src.substring(start, i)); out += t; lastSignificant = t
      }
      else {
        ops.find(o => src.startsWith(o, i)) match {
          case Some(o) =>
            if (o == "(" || o == "[" || o == "{") depth += 1
            if (o == ")" || o == "]" || o == "}") depth = math.max(0, depth - 1)
            i += o.length
            val t = TOp(o); out += t; lastSignificant = t
          case None =>
            throw new IllegalArgumentException(
              s"OSL lex error at offset $i: unexpected character '$c'")
        }
      }
    }
    if (lastSignificant != TNewline) out += TNewline
    out += TEof
    out.result()
  }
}
