package graft.parser

import scala.collection.mutable

/** Minimal YAML-subset parser for project/schema files (no external
  * deps are resolvable in this build — see build.sbt). Supports the
  * subset dbt-style project files actually use:
  *
  *  - nested block maps (indentation-scoped)
  *  - block lists (`- item`, `- key: value` object lists)
  *  - inline scalars: strings (bare / single / double quoted), ints,
  *    floats, booleans, null
  *  - inline flow lists of scalars: `[a, b, c]`
  *  - comments (`# ...`) and blank lines
  *
  * Block scalars (`|`, `|-`, `>`): bodies read VERBATIM from the raw
  * source (comments/blank lines inside are data), '>' folds
  * paragraphs. Not supported (and not needed): anchors, flow maps,
  * tags. Values parse to String | Int | Double | Boolean | null |
  * List[Any] | Map[String, Any].
  */
object MiniYaml {
  final case class YamlError(msg: String) extends RuntimeException(msg)

  private final case class Line(indent: Int, content: String, rawIdx: Int)

  /** The unprocessed source lines of the current parse — block scalars
    * must read these, because comment stripping and blank-line
    * filtering would corrupt literal bodies (`#` inside csv/sql
    * fixtures, blank lines inside SQL).
    */
  private val rawLines = new ThreadLocal[Vector[String]]

  def parse(text: String): Any = {
    val raw = text.linesIterator.toVector
    val lines = raw.zipWithIndex
      .map { case (l, i) => (stripComment(l), i) }
      .filter { case (l, _) => l.trim.nonEmpty }
      .map { case (l, i) =>
        val indent = l.takeWhile(_ == ' ').length
        Line(indent, l.trim, i)
      }
    if (lines.isEmpty) Map.empty[String, Any]
    else {
      rawLines.set(raw)
      try parseBlock(lines, 0, lines.head.indent)._1
      finally rawLines.remove()
    }
  }

  def parseMap(text: String): Map[String, Any] = parse(text) match {
    case m: Map[String @unchecked, Any @unchecked] => m
    case other => throw YamlError(s"expected top-level map, got $other")
  }

  private def stripComment(l: String): String = {
    // strip #-comments not inside quotes
    var inS = false; var inD = false
    val sb = new StringBuilder
    var i = 0
    while (i < l.length) {
      val c = l(i)
      if (c == '\'' && !inD) inS = !inS
      else if (c == '"' && !inS) inD = !inD
      if (c == '#' && !inS && !inD) return sb.toString
      sb += c
      i += 1
    }
    sb.toString
  }

  /** Parse a block starting at index `from` where all entries have
    * indent `indent`; returns (value, next index).
    */
  private def parseBlock(lines: Vector[Line], from: Int, indent: Int): (Any, Int) = {
    if (lines(from).content.startsWith("- ") || lines(from).content == "-")
      parseList(lines, from, indent)
    else parseMapBlock(lines, from, indent)
  }

  private def parseMapBlock(lines: Vector[Line], from: Int, indent: Int): (Map[String, Any], Int) = {
    val out = mutable.LinkedHashMap[String, Any]()
    var i = from
    while (i < lines.length && lines(i).indent == indent && !lines(i).content.startsWith("- ")) {
      val content = lines(i).content
      val colon = findColon(content)
      if (colon < 0) throw YamlError(s"expected 'key: value' at: $content")
      val key = unquote(content.take(colon).trim)
      val rest = content.drop(colon + 1).trim
      if (rest == "|" || rest == "|-" || rest == ">") {
        // block scalar: scan the RAW source for the boundary (first
        // non-blank raw line at the key's indent or shallower) — '#'
        // and blank lines inside a literal body are data, not syntax,
        // so the comment-stripped line vector cannot define the body
        val raw = Option(rawLines.get).getOrElse(
          throw YamlError("block scalar parsed outside MiniYaml.parse"))
        // the scan is safe inside synthetic object-list slices too: the
        // synthetic indent equals the keys' true raw indent, and every
        // construct that ends the body (sibling key, next list item,
        // parent key) sits at raw indent <= the key's
        var rawEnd = lines(i).rawIdx + 1
        while (rawEnd < raw.length && {
          val l = raw(rawEnd)
          l.trim.isEmpty || l.takeWhile(_ == ' ').length > indent
        }) rawEnd += 1
        val slice = raw.slice(lines(i).rawIdx + 1, rawEnd)
          .reverse.dropWhile(_.trim.isEmpty).reverse // clip trailing blanks
        val bodyIndent = slice.filter(_.trim.nonEmpty)
          .map(_.takeWhile(_ == ' ').length).minOption.getOrElse(0)
        val body = slice.map(l => if (l.trim.isEmpty) "" else l.drop(bodyIndent))
        // ">" folds lines within a paragraph with spaces and blank
        // lines to newlines (YAML folding); "|"/"|-" keep lines (both
        // clip the trailing newline — fixture consumers are csv/sql
        // parsers, not byte comparers)
        out(key) =
          if (rest == ">") {
            val paras = mutable.ListBuffer[List[String]](); var cur = List.empty[String]
            body.foreach { l =>
              if (l.isEmpty) { if (cur.nonEmpty) paras += cur.reverse; cur = Nil }
              else cur = l :: cur
            }
            if (cur.nonEmpty) paras += cur.reverse
            paras.map(_.mkString(" ")).mkString("\n")
          } else body.mkString("\n")
        // advance the filtered cursor past every consumed raw line
        var j = i + 1
        while (j < lines.length && lines(j).rawIdx < rawEnd) j += 1
        i = j
      } else if (rest.nonEmpty) {
        out(key) = scalar(rest)
        i += 1
      } else {
        // nested block (or empty value)
        if (i + 1 < lines.length && lines(i + 1).indent > indent) {
          val (v, next) = parseBlock(lines, i + 1, lines(i + 1).indent)
          out(key) = v
          i = next
        } else if (i + 1 < lines.length && lines(i + 1).indent == indent &&
            lines(i + 1).content.startsWith("- ")) {
          // list items at the SAME indent as the key (common YAML style)
          val (v, next) = parseList(lines, i + 1, indent)
          out(key) = v
          i = next
        } else {
          out(key) = null
          i += 1
        }
      }
    }
    (out.toMap, i)
  }

  private def parseList(lines: Vector[Line], from: Int, indent: Int): (List[Any], Int) = {
    val out = mutable.ListBuffer[Any]()
    var i = from
    while (i < lines.length && lines(i).indent == indent &&
        (lines(i).content.startsWith("- ") || lines(i).content == "-")) {
      val item = lines(i).content.drop(1).trim
      if (item.isEmpty) {
        // `-` alone: nested block is the item
        val (v, next) = parseBlock(lines, i + 1, lines(i + 1).indent)
        out += v
        i = next
      } else {
        val colon = if (item.startsWith("{") || item.startsWith("[")) -1 else findColon(item)
        if (colon >= 0 && (colon == item.length - 1 || item(colon + 1) == ' ')) {
          // object list item: the inline key sits at indent+2 ("- " eats
          // two columns); sibling keys align with it, deeper lines are
          // nested values
          val syntheticIndent = lines(i).indent + 2
          val sub = mutable.ListBuffer[Line](Line(syntheticIndent, item, lines(i).rawIdx))
          var j = i + 1
          while (j < lines.length && lines(j).indent > indent) {
            sub += lines(j)
            j += 1
          }
          val (v, _) = parseMapBlock(sub.toVector, 0, syntheticIndent)
          out += v
          i = j
        } else {
          out += scalar(item)
          i += 1
        }
      }
    }
    (out.toList, i)
  }

  /** First colon that acts as a key separator (not inside quotes). */
  private def findColon(s: String): Int = {
    var inS = false; var inD = false
    var i = 0
    while (i < s.length) {
      val c = s(i)
      if (c == '\'' && !inD) inS = !inS
      else if (c == '"' && !inS) inD = !inD
      else if (c == ':' && !inS && !inD &&
          (i == s.length - 1 || s(i + 1) == ' ')) return i
      i += 1
    }
    -1
  }

  private[parser] def scalar(s: String): Any = s match {
    case "" | "null" | "~" => null
    case "true" | "True" => true
    case "false" | "False" => false
    case _ if s.startsWith("[") && s.endsWith("]") =>
      val inner = s.substring(1, s.length - 1).trim
      if (inner.isEmpty) Nil
      else splitTopLevel(inner).map(x => scalar(x.trim))
    case _ if s.startsWith("{") && s.endsWith("}") =>
      // flow map: {k: v, k2: v2} (fixture-row syntax)
      val inner = s.substring(1, s.length - 1).trim
      if (inner.isEmpty) Map.empty[String, Any]
      else splitTopLevel(inner).map { kv0 =>
        val kv = kv0.trim
        val c = findColon(kv + " ") // trailing pad allows "k: v" at end-of-string
        val cc = if (c >= 0) c else kv.indexOf(':')
        val k = unquote(kv.take(cc).trim)
        val v = kv.drop(cc + 1).trim
        k -> scalar(v)
      }.toMap
    case _ if (s.startsWith("'") && s.endsWith("'") && s.length >= 2) ||
        (s.startsWith("\"") && s.endsWith("\"") && s.length >= 2) => unquote(s)
    case _ =>
      // int, then float, then bare string
      try s.toLong.asInstanceOf[Any]
      catch {
        case _: NumberFormatException =>
          try s.toDouble.asInstanceOf[Any]
          catch { case _: NumberFormatException => s }
      }
  }

  private def splitTopLevel(s: String): List[String] = {
    val out = mutable.ListBuffer[String]()
    var depth = 0; var inS = false; var inD = false
    val cur = new StringBuilder
    for (c <- s) {
      if (c == '\'' && !inD) inS = !inS
      if (c == '"' && !inS) inD = !inD
      if (!inS && !inD) {
        if (c == '[' || c == '{') depth += 1
        if (c == ']' || c == '}') depth -= 1
      }
      if (c == ',' && depth == 0 && !inS && !inD) { out += cur.toString; cur.clear() }
      else cur += c
    }
    if (cur.nonEmpty) out += cur.toString
    out.toList
  }

  private def unquote(s: String): String =
    if ((s.startsWith("'") && s.endsWith("'") && s.length >= 2) ||
        (s.startsWith("\"") && s.endsWith("\"") && s.length >= 2))
      s.substring(1, s.length - 1)
    else s
}
