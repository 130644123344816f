package graft.plans

/** Minimal HOCON-subset reader for test plans — the grammar the reference's
  * plan files actually use (reference: README.md:33-68, TestPlan.scala:19-36,
  * TestPhase.scala:18-28): one top-level `sequence = [ {…} … ]`, objects,
  * arrays, integers, bare or quoted strings, `=`/`:` key separators, `,` or
  * newline element separators, `#`/`//` comments. typesafe-config is not on
  * the classpath (zero-egress build), and the subset is ~100 lines.
  */
object PlanParser {

  sealed trait V
  final case class VNum(v: Long) extends V
  final case class VStr(v: String) extends V
  final case class VArr(vs: List[V]) extends V
  final case class VObj(fields: Map[String, V]) extends V

  def parse(text: String): TestPlan = {
    val root = new Cursor(text).parseObjBody(topLevel = true)
    root.fields.get("sequence") match {
      case Some(VArr(vs)) => TestPlan(vs.map(phaseOf))
      case Some(other)    => fail(s"'sequence' must be an array, got $other")
      case None           => fail("plan has no 'sequence' key")
    }
  }

  def phaseOf(v: V): Phase = v match {
    case VObj(f) =>
      def str(k: String): String = f.get(k) match {
        case Some(VStr(s)) => s
        case Some(VNum(n)) => n.toString
        case _             => fail(s"phase missing string field '$k' in $f")
      }
      def int(k: String): Int = f.get(k) match {
        case Some(VNum(n)) => n.toInt
        case _             => fail(s"phase missing int field '$k' in $f")
      }
      def optInt(k: String): Option[Int] = f.get(k).map {
        case VNum(n) => n.toInt
        case other   => fail(s"field '$k' must be an int, got $other")
      }
      def ints(k: String): List[Int] = f.get(k) match {
        case Some(VArr(vs)) => vs.map { case VNum(n) => n.toInt; case o => fail(s"non-int in '$k': $o") }
        case _              => fail(s"phase missing int-array field '$k' in $f")
      }
      str("type") match {
        case "noop"  => NoopPhase(optInt("duration"))
        case "fixed" => FixedPhase(int("value"), int("rate"), optInt("duration"))
        case "ramp"  => RampPhase(int("value"), int("startRate"), int("endRate"), int("duration"))
        case "cycle" => CyclePhase(ints("values"), int("rate"), optInt("duration"))
        case "loop" =>
          val inner = f.get("phases") match {
            case Some(VArr(vs)) => vs.map(phaseOf)
            case _              => fail(s"loop phase missing 'phases' array in $f")
          }
          LoopPhase(optInt("times"), inner)
        case t => fail(s"unknown phase type '$t'")
      }
    case other => fail(s"phase must be an object, got $other")
  }

  private def fail(msg: String): Nothing =
    throw new IllegalArgumentException(s"plan parse error: $msg")

  /** Hand-rolled recursive-descent parser over the raw text. */
  private final class Cursor(s: String) {
    private var p = 0

    private def eof: Boolean = p >= s.length
    private def ch: Char = s.charAt(p)

    /** Skip whitespace and comments; newlines are significant (separators). */
    private def skipInline(): Unit = {
      var go = true
      while (go && !eof) {
        if (ch == ' ' || ch == '\t' || ch == '\r') p += 1
        else if (ch == '#') skipLineComment()
        else if (ch == '/' && p + 1 < s.length && s.charAt(p + 1) == '/') skipLineComment()
        else go = false
      }
    }
    private def skipLineComment(): Unit =
      while (!eof && ch != '\n') p += 1

    /** Skip whitespace including newlines (used where a value is required). */
    private def skipAll(): Unit = {
      skipInline()
      while (!eof && ch == '\n') { p += 1; skipInline() }
    }

    /** Consume separators between elements: commas and newlines. */
    private def skipSeparators(): Unit = {
      skipInline()
      while (!eof && (ch == '\n' || ch == ',')) { p += 1; skipInline() }
    }

    def parseObjBody(topLevel: Boolean): VObj = {
      val fields = Map.newBuilder[String, V]
      skipSeparators()
      while (!eof && ch != '}') {
        val key = parseKey()
        skipAll()
        if (!eof && (ch == '=' || ch == ':')) { p += 1; skipAll() }
        else if (!eof && ch == '{') () // HOCON `key { … }` object shorthand
        else fail(s"expected '=' or ':' after key '$key' at offset $p")
        fields += key -> parseValue()
        skipSeparators()
      }
      if (!topLevel) {
        if (eof || ch != '}') fail(s"unterminated object at offset $p")
        p += 1
      }
      VObj(fields.result())
    }

    private def parseKey(): String = {
      skipAll()
      if (!eof && ch == '"') parseQuoted()
      else parseAtomText()
    }

    def parseValue(): V = {
      skipAll()
      if (eof) fail("expected a value, got end of input")
      ch match {
        case '{' => p += 1; parseObjBody(topLevel = false)
        case '[' => p += 1; parseArr()
        case '"' => VStr(parseQuoted())
        case _   => atomValue(parseAtomText())
      }
    }

    private def parseArr(): VArr = {
      val items = List.newBuilder[V]
      skipSeparators()
      while (!eof && ch != ']') {
        items += parseValue()
        skipSeparators()
      }
      if (eof) fail("unterminated array")
      p += 1
      VArr(items.result())
    }

    private def parseQuoted(): String = {
      p += 1 // opening quote
      val sb = new StringBuilder
      while (!eof && ch != '"') {
        if (ch == '\\' && p + 1 < s.length) { sb += s.charAt(p + 1); p += 2 }
        else { sb += ch; p += 1 }
      }
      if (eof) fail("unterminated string")
      p += 1
      sb.result()
    }

    private def parseAtomText(): String = {
      val start = p
      while (!eof && !" \t\r\n=:,{}[]#".contains(ch)) p += 1
      if (p == start) fail(s"expected a token at offset $p (char '${ch}')")
      s.substring(start, p)
    }

    private def atomValue(text: String): V =
      if (text.nonEmpty && (text.charAt(0).isDigit ||
          (text.length > 1 && text.charAt(0) == '-' && text.charAt(1).isDigit)))
        VNum(text.toLong)
      else VStr(text)
  }
}
