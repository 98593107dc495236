package graft

/** JSON string escaping shared by Verify and the dev tools — one
  * implementation so a control char in builder-authored SQL can never
  * produce invalid JSON in one dump path but not the other. */
object JsonUtil {
  /** Escape + quote: backslash, quote, and ALL control chars (<0x20) —
    * a tab or CR in an oracle SQL string would otherwise make the
    * driver's json.load fail and silently zero the round's
    * correctness. */
  def quote(s: String): String = "\"" + s.flatMap {
    case '"'  => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  } + "\""
}
