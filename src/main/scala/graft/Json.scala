package graft

/** Minimal JSON string escaping shared by the driver-facing mains
  * (Verify's oracle dump, Bench's metric line): backslash, quote, and
  * ALL control chars — an unescaped character in builder-authored SQL
  * or an env-provided path would make the driver's json.load fail and
  * silently zero the round's results. */
object Json {
  def str(s: String): String = "\"" + s.flatMap {
    case '"'  => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  } + "\""
}
