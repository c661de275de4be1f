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

  /** Structural JSON validity: would a standard parser (the driver's
    * json.load) accept `s` as ONE complete document? Used as the
    * ship-gate on hand-built artifacts — a truncated or mis-escaped
    * record must fail at the producer, not at grading time. (Syntax
    * check only: braces/brackets balanced and properly nested, strings
    * closed, numbers numeric, no trailing garbage.) */
  def isValid(s: String): Boolean =
    try { val p = new Parser(s); p.value(); p.end(); true }
    catch { case _: Exception => false }

  /** Parse one JSON document into Scala values — Map[String, Any],
    * Vector[Any], String, Long (integral) / Double (fractional),
    * Boolean, null. The HTTP ingest surface's body reader; loud on
    * any malformed input (the same grammar [[isValid]] checks). */
  def parse(s: String): Any = {
    val p = new AstParser(s); val v = p.value(); p.end(); v
  }

  private final class AstParser(t: String) {
    private var i = 0
    private def ws(): Unit =
      while (i < t.length && Character.isWhitespace(t(i))) i += 1
    private def fail(): Nothing =
      throw new IllegalArgumentException(s"bad json at offset $i")
    private def expect(c: Char): Unit = {
      if (i >= t.length || t(i) != c) fail(); i += 1
    }
    def end(): Unit = { ws(); if (i != t.length) fail() }
    def value(): Any = {
      ws()
      if (i >= t.length) fail()
      t(i) match {
        case '{' => obj()
        case '[' => arr()
        case '"' => str()
        case 't' => lit("true"); true
        case 'f' => lit("false"); false
        case 'n' => lit("null"); null
        case c if c == '-' || c.isDigit => num()
        case _ => fail()
      }
    }
    private def obj(): Map[String, Any] = {
      expect('{'); ws()
      val m = Map.newBuilder[String, Any]
      if (i < t.length && t(i) == '}') { i += 1; return m.result() }
      var more = true
      while (more) {
        ws(); val k = str(); ws(); expect(':'); m += k -> value(); ws()
        if (i < t.length && t(i) == ',') i += 1 else more = false
      }
      expect('}')
      m.result()
    }
    private def arr(): Vector[Any] = {
      expect('['); ws()
      val b = Vector.newBuilder[Any]
      if (i < t.length && t(i) == ']') { i += 1; return b.result() }
      var more = true
      while (more) {
        b += value(); ws()
        if (i < t.length && t(i) == ',') i += 1 else more = false
      }
      expect(']')
      b.result()
    }
    private def str(): String = {
      expect('"')
      val sb = new StringBuilder
      while (i < t.length && t(i) != '"') {
        if (t(i) == '\\') {
          if (i + 1 >= t.length) fail()
          t(i + 1) match {
            case '"' => sb.append('"'); i += 2
            case '\\' => sb.append('\\'); i += 2
            case '/' => sb.append('/'); i += 2
            case 'n' => sb.append('\n'); i += 2
            case 'r' => sb.append('\r'); i += 2
            case 't' => sb.append('\t'); i += 2
            case 'b' => sb.append('\b'); i += 2
            case 'f' => sb.append('\f'); i += 2
            case 'u' =>
              if (i + 6 > t.length) fail()
              sb.append(Integer.parseInt(t.substring(i + 2, i + 6), 16).toChar)
              i += 6
            case _ => fail()
          }
        } else { sb.append(t(i)); i += 1 }
      }
      expect('"')
      sb.toString
    }
    private def lit(w: String): Unit = {
      if (!t.startsWith(w, i)) fail(); i += w.length
    }
    private def num(): Any = {
      val start = i
      if (i < t.length && t(i) == '-') i += 1
      while (i < t.length && (t(i).isDigit || "+-.eE".indexOf(t(i).toInt) >= 0))
        i += 1
      if (i == start) fail()
      val text = t.substring(start, i)
      if (text.exists(c => c == '.' || c == 'e' || c == 'E')) {
        val d = java.lang.Double.parseDouble(text)
        if (d.isNaN || d.isInfinite) fail()
        d
      } else text.toLongOption.getOrElse(fail())
    }
  }

  private final class Parser(t: String) {
    private var i = 0
    private def ws(): Unit =
      while (i < t.length && Character.isWhitespace(t(i))) i += 1
    private def expect(c: Char): Unit = {
      if (i >= t.length || t(i) != c) fail(); i += 1
    }
    private def fail(): Nothing =
      throw new IllegalArgumentException(s"bad json at offset $i")
    def end(): Unit = { ws(); if (i != t.length) fail() }
    def value(): Unit = {
      ws()
      if (i >= t.length) fail()
      t(i) match {
        case '{' => obj()
        case '[' => arr()
        case '"' => str()
        case 't' => lit("true")
        case 'f' => lit("false")
        case 'n' => lit("null")
        case c if c == '-' || c.isDigit => num()
        case _ => fail()
      }
    }
    private def obj(): Unit = {
      expect('{'); ws()
      if (i < t.length && t(i) == '}') { i += 1; return }
      var more = true
      while (more) {
        ws(); str(); ws(); expect(':'); value(); ws()
        if (i < t.length && t(i) == ',') i += 1 else more = false
      }
      expect('}')
    }
    private def arr(): Unit = {
      expect('['); ws()
      if (i < t.length && t(i) == ']') { i += 1; return }
      var more = true
      while (more) {
        value(); ws()
        if (i < t.length && t(i) == ',') i += 1 else more = false
      }
      expect(']')
    }
    private def str(): Unit = {
      expect('"')
      while (i < t.length && t(i) != '"') {
        if (t(i) == '\\') i += 2 else i += 1
      }
      expect('"')
    }
    private def lit(w: String): Unit = {
      if (!t.startsWith(w, i)) fail(); i += w.length
    }
    private def num(): Unit = {
      val start = i
      if (i < t.length && t(i) == '-') i += 1
      while (i < t.length && (t(i).isDigit || "+-.eE".indexOf(t(i).toInt) >= 0))
        i += 1
      if (i == start) fail()
      val d = java.lang.Double.parseDouble(t.substring(start, i))
      if (d.isNaN || d.isInfinite) fail() // JSON has no NaN/Inf literal anyway
    }
  }
}
