package graft.util

/** Minimal JSON string escaping shared by every surface that emits
  * JSON by hand (Verify's oracle dump, the HTTP server). One
  * definition: backslash, quote, and ALL control chars (<0x20) —
  * a missed control char would break the driver's json.load.
  */
object Json {
  def escape(s: String): String = "\"" + s.flatMap {
    case '"'  => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  } + "\""
}
