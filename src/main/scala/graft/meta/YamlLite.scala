package graft.meta

/** Minimal YAML-subset parser for datavault4dbt-style metadata blocks
  * (reference `macros/internal/metadata_processing/yaml_metadata_parser.sql`
  * feeds dbt's `fromyaml` — this covers the subset those metadata documents
  * actually use):
  *
  *  - block maps (`key: value` / `key:` + indented block)
  *  - block lists (`- item`, including `- key: value` map items)
  *  - inline lists `[a, b]` and inline maps `{k: v}`
  *  - single/double-quoted scalars, booleans, longs, null/~
  *  - `#` comments and blank lines
  *
  * Returns Map[String, Any] / List[Any] / String / Boolean / Long / null.
  * No anchors, multi-line scalars, or flow nesting beyond one level — the
  * metadata format doesn't use them.
  */
object YamlLite {

  private final case class Line(indent: Int, text: String)

  def parse(src: String): Any = {
    val lines = src.linesIterator
      .map(stripComment)
      .filter(_.trim.nonEmpty)
      .map { l =>
        require(!l.startsWith("\t"), "YamlLite: tabs are not supported for indentation")
        Line(l.takeWhile(_ == ' ').length, l.trim)
      }
      .toVector
    if (lines.isEmpty) null
    else parseBlock(lines, 0, lines.head.indent)._1
  }

  /** strip a trailing ` #comment` that is outside quotes */
  private def stripComment(l: String): String = {
    var inS = false; var inD = false; var i = 0
    while (i < l.length) {
      l.charAt(i) match {
        case '\'' if !inD => inS = !inS
        case '"' if !inS  => inD = !inD
        case '#' if !inS && !inD && (i == 0 || l.charAt(i - 1).isWhitespace) =>
          return l.substring(0, i)
        case _ =>
      }
      i += 1
    }
    l
  }

  private def parseBlock(lines: Vector[Line], start: Int, indent: Int): (Any, Int) =
    if (lines(start).text.startsWith("- ") || lines(start).text == "-")
      parseList(lines, start, indent)
    else parseMap(lines, start, indent)

  private def parseList(lines: Vector[Line], start: Int, indent: Int): (Any, Int) = {
    val out = Vector.newBuilder[Any]
    var i = start
    while (i < lines.length && lines(i).indent == indent && (lines(i).text.startsWith("- ") || lines(i).text == "-")) {
      val rest = if (lines(i).text == "-") "" else lines(i).text.drop(2).trim
      if (rest.isEmpty) {
        // value is the following deeper block (if any — a trailing bare
        // dash or a non-indented successor is an empty item, not a crash)
        if (i + 1 < lines.length && lines(i + 1).indent > indent) {
          val (v, next) = parseBlock(lines, i + 1, lines(i + 1).indent)
          out += v; i = next
        } else { out += null; i += 1 }
      } else if (splitKey(rest).isDefined) {
        // `- key: …` starts a map item; re-root it at a virtual indent and
        // absorb following deeper lines
        val virtualIndent = indent + 2
        var j = i + 1
        val extra = Vector.newBuilder[Line]
        while (j < lines.length && lines(j).indent > indent) { extra += lines(j); j += 1 }
        val sub = Line(virtualIndent, rest) +: extra.result()
        val (v, _) = parseMap(sub, 0, virtualIndent)
        out += v; i = j
      } else { out += scalar(rest); i += 1 }
    }
    (out.result().toList, i)
  }

  private def parseMap(lines: Vector[Line], start: Int, indent: Int): (Any, Int) = {
    val out = scala.collection.mutable.LinkedHashMap.empty[String, Any]
    var i = start
    while (i < lines.length && lines(i).indent == indent && splitKey(lines(i).text).isDefined) {
      val (k, rest) = splitKey(lines(i).text).get
      if (rest.nonEmpty) { out += unquote(k) -> scalar(rest); i += 1 }
      else if (i + 1 < lines.length && lines(i + 1).indent > indent) {
        val (v, next) = parseBlock(lines, i + 1, lines(i + 1).indent)
        out += unquote(k) -> v; i = next
      } else { out += unquote(k) -> null; i += 1 }
    }
    // ListMap: immutable.Map drops insertion order past 4 entries, and
    // document order matters (derived columns apply sequentially)
    (scala.collection.immutable.ListMap(out.toSeq: _*), i)
  }

  /** split `key: value` at the first unquoted colon-space (or trailing colon) */
  private def splitKey(s: String): Option[(String, String)] = {
    var inS = false; var inD = false; var i = 0
    while (i < s.length) {
      s.charAt(i) match {
        case '\'' if !inD => inS = !inS
        case '"' if !inS  => inD = !inD
        case ':' if !inS && !inD && (i == s.length - 1 || s.charAt(i + 1) == ' ') =>
          return Some((s.substring(0, i).trim, s.substring(i + 1).trim))
        case _ =>
      }
      i += 1
    }
    None
  }

  private def scalar(s0: String): Any = {
    val s = s0.trim
    if (s.startsWith("[") && s.endsWith("]"))
      splitTopLevel(s.substring(1, s.length - 1)).map(scalar)
    else if (s.startsWith("{") && s.endsWith("}"))
      scala.collection.immutable.ListMap(
        splitTopLevel(s.substring(1, s.length - 1)).map { kv =>
          val Some((k, v)) = splitKey(kv): @unchecked
          unquote(k) -> scalar(v)
        }: _*)
    else if (s == "null" || s == "~") null
    else if (s == "true" || s == "True") true
    else if (s == "false" || s == "False") false
    else if ((s.startsWith("'") && s.endsWith("'") && s.length >= 2) ||
             (s.startsWith("\"") && s.endsWith("\"") && s.length >= 2)) unquote(s)
    else s.toLongOption.getOrElse(s)
  }

  private def splitTopLevel(s: String): List[String] = {
    val out = List.newBuilder[String]
    var depth = 0; var inS = false; var inD = false
    val cur = new StringBuilder
    s.foreach {
      case c @ '\'' if !inD             => inS = !inS; cur += c
      case c @ '"' if !inS              => inD = !inD; cur += c
      case c @ ('[' | '{') if !inS && !inD => depth += 1; cur += c
      case c @ (']' | '}') if !inS && !inD => depth -= 1; cur += c
      case ',' if depth == 0 && !inS && !inD =>
        if (cur.toString.trim.nonEmpty) out += cur.toString.trim
        cur.clear()
      case c => cur += c
    }
    if (cur.toString.trim.nonEmpty) out += cur.toString.trim
    out.result()
  }

  private def unquote(s: String): String =
    if ((s.startsWith("'") && s.endsWith("'") && s.length >= 2) ||
        (s.startsWith("\"") && s.endsWith("\"") && s.length >= 2))
      s.substring(1, s.length - 1)
    else s
}
