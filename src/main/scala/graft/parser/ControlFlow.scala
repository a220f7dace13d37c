package graft.parser

import scala.util.matching.Regex

/** Parse-time evaluation of a bounded Jinja control-flow subset:
  * `{% if c %}…{% elif c %}…{% else %}…{% endif %}` and
  * `{% for x in [a, b] %}…{% endfor %}`.
  *
  * The reference renders full Jinja at parse time
  * (core/dbt/clients/jinja.py:49-113, get_rendered); we evaluate the
  * statically-decidable core the same way — BEFORE ref/source
  * scanning, so refs inside untaken branches never reach the DAG,
  * exactly like rendered Jinja. Supported conditions: literals,
  * `var('name'[, default])`, `target.name`, loop variables,
  * `loop.{index,index0,first,last}`, comparisons
  * (`==`, `!=`, `<`, `<=`, `>`, `>=`, `in`, `not in`), and
  * `and`/`or`/`not` with parentheses. For-loops iterate literal lists.
  *
  * `{% if is_incremental() %}` blocks are a RUN-time decision (the
  * materialization must exist first) — their tags are re-emitted
  * verbatim (bodies still rendered) for Template.renderIncrementalBlocks
  * to resolve at compile time.
  */
object ControlFlow {
  private val tagRe: Regex =
    raw"""(?s)\{%-?\s*(if|elif|else|endif|for|endfor)\b(.*?)-?%\}""".r

  private sealed trait Node
  private final case class Text(s: String) extends Node
  private final case class If(
      branches: Seq[(String, Seq[Node])], // (condition, body), first match wins
      orElse: Seq[Node],
      incremental: Boolean) extends Node
  private final case class For(ident: String, listExpr: String, body: Seq[Node]) extends Node

  /** Render control flow away. `vars` feeds `var()`; `target` is the
    * profile target name surfaced as `target.name`.
    */
  def render(text: String, vars: Map[String, String] = Map.empty,
      target: String = "dev"): String = {
    val base = Map[String, Any]("target.name" -> target)
    // no control tags still substitutes {{ target.name }} — its
    // rendering must not depend on an unrelated tag elsewhere in the file
    if (!text.contains("{%")) return substitute(text, base)
    val tags = tagRe.findAllMatchIn(text).toList
    if (!tags.exists(t => Set("if", "for").contains(t.group(1)))) return substitute(text, base)
    val (nodes, rest) = parseNodes(text, tags, 0)
    require(rest.isEmpty, s"unbalanced control tags: ${rest.map(_.group(1)).mkString(",")}")
    val sb = new StringBuilder
    emit(nodes, Map("target.name" -> target), vars, sb)
    sb.toString
  }

  /** Parse until an elif/else/endif/endfor that belongs to the caller. */
  private def parseNodes(text: String, tags: List[Regex.Match], from: Int)
      : (Seq[Node], List[Regex.Match]) = {
    val out = Vector.newBuilder[Node]
    var pos = from
    var rest = tags
    while (rest.nonEmpty && !Set("elif", "else", "endif", "endfor").contains(rest.head.group(1))) {
      val t = rest.head
      out += Text(text.substring(pos, t.start))
      t.group(1) match {
        case "if" =>
          val (ifNode, after, endPos) = parseIf(text, t, rest.tail)
          out += ifNode; rest = after; pos = endPos
        case "for" =>
          val forHead = raw"""(?s)^\s*([A-Za-z_]\w*)\s+in\s+(.*?)\s*$$""".r
          t.group(2).trim match {
            case forHead(ident, listExpr) =>
              val (body, afterBody) = parseNodes(text, rest.tail, t.end)
              require(afterBody.headOption.exists(_.group(1) == "endfor"),
                s"missing endfor for loop at offset ${t.start}")
              out += For(ident, listExpr, body)
              pos = afterBody.head.end; rest = afterBody.tail
            case other =>
              throw new IllegalArgumentException(s"cannot parse for-tag: $other")
          }
      }
    }
    out += Text(text.substring(pos,
      rest.headOption.map(_.start).getOrElse(text.length)))
    (out.result(), rest)
  }

  private def parseIf(text: String, open: Regex.Match, tags: List[Regex.Match])
      : (If, List[Regex.Match], Int) = {
    val branches = Vector.newBuilder[(String, Seq[Node])]
    var cond = open.group(2).trim
    var rest = tags
    var bodyStart = open.end
    var orElse: Seq[Node] = Nil
    var closed = false
    var endPos = open.end
    while (!closed) {
      val (body, after) = parseNodes(text, rest, bodyStart)
      after.headOption.map(_.group(1)) match {
        case Some("elif") =>
          branches += ((cond, body))
          cond = after.head.group(2).trim; bodyStart = after.head.end; rest = after.tail
        case Some("else") =>
          branches += ((cond, body))
          val (eb, after2) = parseNodes(text, after.tail, after.head.end)
          require(after2.headOption.exists(_.group(1) == "endif"),
            s"missing endif at offset ${open.start}")
          orElse = eb; endPos = after2.head.end; rest = after2.tail; closed = true
        case Some("endif") =>
          branches += ((cond, body))
          endPos = after.head.end; rest = after.tail; closed = true
        case other =>
          throw new IllegalArgumentException(s"missing endif (found $other)")
      }
    }
    val allBranches = branches.result()
    val incr = allBranches.exists(_._1.contains("is_incremental()"))
    // The compile-time pass (Template.renderIncrementalBlocks) only
    // understands the bare `{% if is_incremental() %}…{% else %}…{% endif %}`
    // form; anything fancier (elif, compound conditions) would either
    // crash the evaluator here or leak raw tags into compiled SQL —
    // fail at parse time with a usable message instead.
    if (incr &&
        !(allBranches.size == 1 && allBranches.head._1.trim == "is_incremental()"))
      throw new IllegalArgumentException(
        "is_incremental() is only supported as the sole condition of a plain " +
          s"{% if %}/{% else %} block (got: {% if ${allBranches.head._1} %} with " +
          s"${allBranches.size} branch(es))")
    (If(allBranches, orElse, incr), rest, endPos)
  }

  private def emit(nodes: Seq[Node], env: Map[String, Any],
      vars: Map[String, String], sb: StringBuilder): Unit =
    nodes.foreach {
      case Text(s) => sb ++= substitute(s, env)
      case If(branches, orElse, incremental) =>
        if (incremental) {
          // re-emit for the compile-time incremental pass
          branches.zipWithIndex.foreach { case ((c, body), i) =>
            sb ++= (if (i == 0) s"{% if $c %}" else s"{% elif $c %}")
            emit(body, env, vars, sb)
          }
          if (orElse.nonEmpty) { sb ++= "{% else %}"; emit(orElse, env, vars, sb) }
          sb ++= "{% endif %}"
        } else {
          branches.find { case (c, _) => truthy(Expr.eval(c, env, vars)) } match {
            case Some((_, body)) => emit(body, env, vars, sb)
            case None => emit(orElse, env, vars, sb)
          }
        }
      case For(ident, listExpr, body) =>
        val items = Expr.eval(listExpr, env, vars) match {
          case l: Seq[_] => l
          case other => throw new IllegalArgumentException(
            s"for-loop needs a list, got $other")
        }
        val n = items.length
        items.zipWithIndex.foreach { case (item, i) =>
          emit(body, env ++ Map(
            ident -> item,
            "loop.index" -> (i + 1L), "loop.index0" -> i.toLong,
            "loop.first" -> (i == 0), "loop.last" -> (i == n - 1)), vars, sb)
        }
    }

  /** `{{ x }}` / `{{ loop.index }}` substitution for bound variables —
    * only identifiers present in `env`; everything else (ref, source,
    * var, this…) is left for Template.
    */
  private def substitute(s: String, env: Map[String, Any]): String =
    if (env.isEmpty || !s.contains("{{")) s
    else raw"""\{\{\s*([A-Za-z_][\w.]*)\s*\}\}""".r.replaceAllIn(s, m =>
      env.get(m.group(1)) match {
        case Some(v) => Regex.quoteReplacement(Expr.show(v))
        case None => Regex.quoteReplacement(m.matched)
      })

  private[parser] def truthy(v: Any): Boolean = v match {
    case b: Boolean => b
    case s: String => s.nonEmpty
    case l: Long => l != 0L
    case d: Double => d != 0.0
    case l: Seq[_] => l.nonEmpty
    case null => false
    case _ => true
  }

  /** Tiny recursive-descent expression evaluator for tag conditions. */
  private[parser] object Expr {
    def eval(src: String, env: Map[String, Any], vars: Map[String, String]): Any =
      new P(src, env, vars).parseOr() match { case (v, p) =>
        require(p.atEnd, s"trailing input in condition: $src"); v
      }

    def show(v: Any): String = v match {
      case d: Double if d == d.floor && !d.isInfinite => d.toLong.toString
      case other => String.valueOf(other)
    }

    private final class P(s: String, env: Map[String, Any], vars: Map[String, String]) {
      var i = 0
      def atEnd: Boolean = { ws(); i >= s.length }
      private def ws(): Unit = while (i < s.length && s(i).isWhitespace) i += 1
      private def kw(word: String): Boolean = {
        ws()
        def identChar(c: Char) = c.isLetterOrDigit || c == '_'
        if (s.startsWith(word, i) &&
            (i + word.length >= s.length || !identChar(s(i + word.length)))) {
          i += word.length; true
        } else false
      }
      def parseOr(): (Any, P) = {
        var (v, _) = parseAnd()
        while (kw("or")) { val (r, _) = parseAnd(); v = truthy(v) || truthy(r) }
        (v, this)
      }
      private def parseAnd(): (Any, P) = {
        var (v, _) = parseNot()
        while (kw("and")) { val (r, _) = parseNot(); v = truthy(v) && truthy(r) }
        (v, this)
      }
      private def parseNot(): (Any, P) =
        if (kw("not")) { val (v, _) = parseNot(); (!truthy(v), this) } else parseCmp()
      private def parseCmp(): (Any, P) = {
        val (l, _) = parsePrimary()
        ws()
        val ops = Seq("==", "!=", "<=", ">=", "<", ">")
        ops.find(o => s.startsWith(o, i)) match {
          case Some(op) =>
            i += op.length
            val (r, _) = parsePrimary()
            (compare(op, l, r), this)
          case None =>
            if (kw("not") && kw("in")) { val (r, _) = parsePrimary(); (!isIn(l, r), this) }
            else if (kw("in")) { val (r, _) = parsePrimary(); (isIn(l, r), this) }
            else (l, this)
        }
      }
      private def compare(op: String, l: Any, r: Any): Boolean = (l, r) match {
        case (a: Long, b: Long) => cmpNum(op, a.toDouble, b.toDouble)
        case (a: Long, b: Double) => cmpNum(op, a.toDouble, b)
        case (a: Double, b: Long) => cmpNum(op, a, b.toDouble)
        case (a: Double, b: Double) => cmpNum(op, a, b)
        case (a, b) =>
          val (x, y) = (String.valueOf(a), String.valueOf(b))
          op match {
            case "==" => x == y
            case "!=" => x != y
            case "<" => x < y
            case "<=" => x <= y
            case ">" => x > y
            case ">=" => x >= y
          }
      }
      private def cmpNum(op: String, a: Double, b: Double): Boolean = op match {
        case "==" => a == b
        case "!=" => a != b
        case "<" => a < b
        case "<=" => a <= b
        case ">" => a > b
        case ">=" => a >= b
      }
      private def isIn(l: Any, r: Any): Boolean = r match {
        case list: Seq[_] => list.exists(x => String.valueOf(x) == String.valueOf(l))
        case str: String => str.contains(String.valueOf(l))
        case _ => false
      }
      private def parsePrimary(): (Any, P) = {
        ws()
        if (i >= s.length) throw new IllegalArgumentException(s"unexpected end: $s")
        s(i) match {
          case '(' =>
            i += 1; val (v, _) = parseOr(); ws()
            require(i < s.length && s(i) == ')', s"missing ) in $s"); i += 1
            (v, this)
          case '[' =>
            i += 1
            val items = Vector.newBuilder[Any]
            ws()
            if (i < s.length && s(i) == ']') i += 1
            else {
              var done = false
              while (!done) {
                val (v, _) = parseOr(); items += v; ws()
                if (i < s.length && s(i) == ',') { i += 1 }
                else { require(i < s.length && s(i) == ']', s"missing ] in $s"); i += 1; done = true }
              }
            }
            (items.result(), this)
          case '\'' | '"' =>
            val q = s(i); i += 1
            val start = i
            while (i < s.length && s(i) != q) i += 1
            require(i < s.length, s"unterminated string in $s")
            val v = s.substring(start, i); i += 1
            (v, this)
          case c if c.isDigit || (c == '-' && i + 1 < s.length && s(i + 1).isDigit) =>
            val start = i
            if (s(i) == '-') i += 1
            while (i < s.length && (s(i).isDigit || s(i) == '.')) i += 1
            val tok = s.substring(start, i)
            (if (tok.contains('.')) tok.toDouble else tok.toLong, this)
          case _ =>
            val start = i
            while (i < s.length && (s(i).isLetterOrDigit || s(i) == '_' || s(i) == '.')) i += 1
            require(i > start, s"cannot parse condition at '${s.drop(i)}'")
            val ident = s.substring(start, i)
            ws()
            if (i < s.length && s(i) == '(' && ident == "var") {
              i += 1
              val (nameV, _) = parseOr(); ws()
              var default: Any = null
              if (i < s.length && s(i) == ',') { i += 1; val (d, _) = parseOr(); default = d; ws() }
              require(i < s.length && s(i) == ')', s"missing ) after var( in $s"); i += 1
              val name = String.valueOf(nameV)
              (vars.get(name).map(coerce).getOrElse(default), this)
            } else ident match {
              case "true" | "True" => (true, this)
              case "false" | "False" => (false, this)
              case "none" | "None" => (null, this)
              case other =>
                (env.getOrElse(other,
                  throw new IllegalArgumentException(s"unknown identifier '$other' in: $s")), this)
            }
        }
      }
      /** CLI/YAML vars arrive as strings; compare numerically when they
        * look numeric (Jinja vars keep YAML types — closest analogue).
        */
      private def coerce(v: String): Any =
        if (v.matches(raw"-?\d+")) v.toLong
        else if (v.matches(raw"-?\d+\.\d+")) v.toDouble
        else if (v == "true") true else if (v == "false") false
        else v
    }
  }
}
