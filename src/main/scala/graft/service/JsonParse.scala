package graft.service

/** Minimal JSON reader for the MCP stdio shell (requests are JSON-RPC
  * objects; the library otherwise only ever RENDERS JSON). Produces plain
  * Scala values: Map[String, Any] (insertion-ordered), List[Any], String,
  * Long (integral) / Double, Boolean, null. Throws
  * IllegalArgumentException with an offset on malformed input. */
private[service] object JsonParse {

  def parse(s: String): Any = {
    val p = new P(s)
    val v = p.value()
    p.ws()
    require(p.eof, s"trailing data at ${p.pos}")
    v
  }

  /** Nesting bound: value() recurses per level, so unbounded depth is a
    * StackOverflowError (an Error — it would sail past Exception catches
    * and kill a serve loop). 64 is far beyond any real JSON-RPC message. */
  private val MaxDepth = 64

  private final class P(s: String) {
    private var i = 0
    private var depth = 0
    def pos: Int = i
    def eof: Boolean = i >= s.length
    def ws(): Unit =
      while (i < s.length && Character.isWhitespace(s.charAt(i))) i += 1
    private def ch: Char = {
      require(i < s.length, "unexpected end of input"); s.charAt(i)
    }
    private def expect(c: Char): Unit = {
      require(!eof && ch == c, s"expected '$c' at $i"); i += 1
    }

    def value(): Any = {
      depth += 1
      require(depth <= MaxDepth, s"nesting deeper than $MaxDepth at $i")
      ws()
      val v = ch match {
        case '{' => obj()
        case '[' => arr()
        case '"' => str()
        case 't' => lit("true", java.lang.Boolean.TRUE)
        case 'f' => lit("false", java.lang.Boolean.FALSE)
        case 'n' => lit("null", null)
        case _ => num()
      }
      depth -= 1
      v
    }

    private def lit(word: String, v: Any): Any = {
      require(s.regionMatches(i, word, 0, word.length),
        s"malformed literal at $i")
      i += word.length; v
    }

    private def obj(): Map[String, Any] = {
      expect('{'); ws()
      val b = scala.collection.immutable.ListMap.newBuilder[String, Any]
      if (ch == '}') { i += 1; return b.result() }
      var more = true
      while (more) {
        ws(); val k = str(); ws(); expect(':')
        b += (k -> value()); ws()
        if (ch == ',') i += 1 else { expect('}'); more = false }
      }
      b.result()
    }

    private def arr(): List[Any] = {
      expect('['); ws()
      val b = List.newBuilder[Any]
      if (ch == ']') { i += 1; return b.result() }
      var more = true
      while (more) {
        b += value(); ws()
        if (ch == ',') i += 1 else { expect(']'); more = false }
      }
      b.result()
    }

    private def str(): String = {
      expect('"')
      val sb = new StringBuilder
      while (ch != '"') {
        val c = ch
        i += 1
        if (c == '\\') {
          val e = ch; i += 1
          e match {
            case '"' => sb.append('"'); case '\\' => sb.append('\\')
            case '/' => sb.append('/'); case 'b' => sb.append('\b')
            case 'f' => sb.append('\f'); case 'n' => sb.append('\n')
            case 'r' => sb.append('\r'); case 't' => sb.append('\t')
            case 'u' =>
              require(i + 4 <= s.length, s"bad \\u escape at $i")
              sb.append(Integer.parseInt(s.substring(i, i + 4), 16).toChar)
              i += 4
            case other => throw new IllegalArgumentException(
              s"bad escape '\\$other' at $i")
          }
        } else sb.append(c)
      }
      i += 1
      sb.toString
    }

    private def num(): Any = {
      val start = i
      if (!eof && ch == '-') i += 1
      while (!eof && (ch.isDigit || "+-.eE".contains(ch))) i += 1
      val text = s.substring(start, i)
      require(text.nonEmpty, s"malformed number at $start")
      if (text.forall(c => c.isDigit || c == '-'))
        try java.lang.Long.parseLong(text)
        catch { case _: NumberFormatException => text.toDouble }
      else text.toDouble
    }
  }
}
