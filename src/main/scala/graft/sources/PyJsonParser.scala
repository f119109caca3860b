package graft.sources

import graft.functions._

/** Minimal JSON parser (read-back side of PyJson's writer): numbers
  * without '.'/'e' become JInt, others JDbl; object key order is
  * preserved. */
object PyJsonParser {

  def parse(s: String): JVal = {
    val p = new P(s)
    val v = p.value()
    p.ws()
    require(p.eof, s"trailing JSON content at ${p.pos}")
    v
  }

  private final class P(s: String) {
    var pos = 0
    def eof: Boolean = pos >= s.length
    def ws(): Unit = while (!eof && s.charAt(pos).isWhitespace) pos += 1
    def expect(c: Char): Unit = {
      require(!eof && s.charAt(pos) == c, s"expected '$c' at $pos")
      pos += 1
    }

    def value(): JVal = {
      ws()
      s.charAt(pos) match {
        case '{' => obj()
        case '[' => arr()
        case '"' => JStr(str())
        case 't' => lit("true", JBool(true))
        case 'f' => lit("false", JBool(false))
        case 'n' => lit("null", JNull)
        case _ => num()
      }
    }

    private def lit(word: String, v: JVal): JVal = {
      require(s.startsWith(word, pos), s"bad literal at $pos")
      pos += word.length
      v
    }

    private def obj(): JObj = {
      expect('{'); ws()
      val b = Vector.newBuilder[(String, JVal)]
      if (s.charAt(pos) == '}') { pos += 1; return JObj(b.result()) }
      var done = false
      while (!done) {
        ws()
        val k = str()
        ws(); expect(':')
        b += (k -> value())
        ws()
        if (s.charAt(pos) == ',') pos += 1 else { expect('}'); done = true }
      }
      JObj(b.result())
    }

    private def arr(): JArr = {
      expect('['); ws()
      val b = Vector.newBuilder[JVal]
      if (s.charAt(pos) == ']') { pos += 1; return JArr(b.result()) }
      var done = false
      while (!done) {
        b += value()
        ws()
        if (s.charAt(pos) == ',') pos += 1 else { expect(']'); done = true }
      }
      JArr(b.result())
    }

    private def str(): String = {
      expect('"')
      val sb = new StringBuilder
      while (s.charAt(pos) != '"') {
        val c = s.charAt(pos)
        if (c == '\\') {
          pos += 1
          s.charAt(pos) match {
            case '"' => sb.append('"')
            case '\\' => sb.append('\\')
            case '/' => sb.append('/')
            case 'n' => sb.append('\n')
            case 't' => sb.append('\t')
            case 'r' => sb.append('\r')
            case 'b' => sb.append('\b')
            case 'f' => sb.append('\f')
            case 'u' =>
              sb.append(Integer.parseInt(s.substring(pos + 1, pos + 5), 16).toChar)
              pos += 4
            case other => sb.append(other)
          }
        } else sb.append(c)
        pos += 1
      }
      pos += 1
      sb.toString
    }

    private def num(): JVal = {
      val start = pos
      while (!eof && "+-0123456789.eE".indexOf(s.charAt(pos)) >= 0) pos += 1
      val t = s.substring(start, pos)
      if (t.exists(c => c == '.' || c == 'e' || c == 'E')) JDbl(t.toDouble)
      else JInt(t.toLong)
    }
  }
}
