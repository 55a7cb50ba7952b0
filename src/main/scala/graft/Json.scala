package graft

/** String escaping shared by every hand-built JSON emitter (Catalog metadata,
  * Api responses) and by OSL script injection. One escaper, full control-char
  * coverage — values containing newlines/tabs previously produced invalid
  * JSON from the ad-hoc quote-only escapes. */
object Json {

  /** JSON string literal, quotes included. Escapes `"`, `\\` and every
    * control character below 0x20. */
  def str(s: String): String =
    "\"" + s.flatMap {
      case '"'          => "\\\""
      case '\\'         => "\\\\"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c            => c.toString
    } + "\""

  /** OSL single-quoted string literal for values spliced into scripts
    * (histogram `foreach`). The OSL lexer's escape rule is "backslash copies
    * the next char", so `\\` and `\'` round-trip; control characters cannot
    * be represented safely and are rejected. */
  def oslStr(s: String): String = {
    require(!s.exists(_ < ' '),
      s"cannot inject value with control characters into a script: ${str(s)}")
    "'" + s.replace("\\", "\\\\").replace("'", "\\'") + "'"
  }
}
