package graft.parser

import scala.collection.immutable.ListMap
import scala.util.matching.Regex

/** Parse-time evaluation of a bounded Jinja control-flow subset:
  * `{% if c %}…{% elif c %}…{% else %}…{% endif %}`,
  * `{% for x in [a, b] %}…{% endfor %}`,
  * `{% set x = expr %}`, and `{% set x %}…{% endset %}`.
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
    raw"""(?s)\{%-?\s*(if|elif|else|endif|for|endfor|set|endset)\b(.*?)-?%\}""".r

  private sealed trait Node
  private final case class Text(s: String) extends Node
  private final case class If(
      branches: Seq[(String, Seq[Node])], // (condition, body), first match wins
      orElse: Seq[Node],
      incremental: Boolean) extends Node
  private final case class For(ident: String, listExpr: String, body: Seq[Node]) extends Node
  private final case class SetVar(ident: String, expr: String) extends Node
  private final case class SetBlock(ident: String, body: Seq[Node]) extends Node

  /** Render control flow away. `vars` feeds `var()`; `target` is the
    * profile target name surfaced as `target.name`. The other
    * target members the reference exposes from the profile output
    * (`target.schema`, `target.threads` — context/target.py) arrive
    * as dotted var keys injected by the CLI's profiles.yml resolution,
    * with the reference-flavored defaults when no profile is active.
    */
  def render(text: String, vars: Map[String, String] = Map.empty,
      target: String = "dev"): String = {
    val base = Map[String, Any]("target.name" -> target,
      "target.schema" -> vars.getOrElse("target.schema", "main"),
      "target.threads" -> vars.getOrElse("target.threads", "1"),
      // reference base.py:655 `flags` — invocation flags macros branch
      // on; the CLI seeds the real values as dotted vars, and defaults
      // here keep {% if flags.FULL_REFRESH %} parseable in programmatic
      // runs that never set them. Booleans are typed so truthiness and
      // Python-style True/False rendering both work.
      "flags.WHICH" -> vars.getOrElse("flags.WHICH", "run"),
      "flags.FULL_REFRESH" -> (vars.getOrElse("flags.FULL_REFRESH", "false") == "true"),
      "flags.EMPTY" -> (vars.getOrElse("flags.EMPTY", "false") == "true"))
    // no control tags still substitutes {{ target.name }} — its
    // rendering must not depend on an unrelated tag elsewhere in the file
    if (!text.contains("{%")) return substitute(text, base, vars)
    val tags = tagRe.findAllMatchIn(text).toList
    if (!tags.exists(t => Set("if", "for", "set").contains(t.group(1)))) return substitute(text, base, vars)
    val (nodes, rest) = parseNodes(text, tags, 0)
    require(rest.isEmpty, s"unbalanced control tags: ${rest.map(_.group(1)).mkString(",")}")
    val sb = new StringBuilder
    emit(nodes, base, vars, sb)
    sb.toString
  }

  /** Parse until an elif/else/endif/endfor that belongs to the caller. */
  private def parseNodes(text: String, tags: List[Regex.Match], from: Int)
      : (Seq[Node], List[Regex.Match]) = {
    val out = Vector.newBuilder[Node]
    var pos = from
    var rest = tags
    while (rest.nonEmpty && !Set("elif", "else", "endif", "endfor", "endset").contains(rest.head.group(1))) {
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
        case "set" =>
          // inline `{% set x = expr %}` vs block `{% set x %}…{% endset %}`
          val inline = raw"""(?s)^\s*([A-Za-z_]\w*)\s*=\s*(.+?)\s*$$""".r
          val blockHead = raw"""(?s)^\s*([A-Za-z_]\w*)\s*$$""".r
          t.group(2) match {
            case inline(ident, expr) =>
              out += SetVar(ident, expr)
              pos = t.end; rest = rest.tail
            case blockHead(ident) =>
              val (body, afterBody) = parseNodes(text, rest.tail, t.end)
              require(afterBody.headOption.exists(_.group(1) == "endset"),
                s"missing endset for set block at offset ${t.start}")
              out += SetBlock(ident, body)
              pos = afterBody.head.end; rest = afterBody.tail
            case other =>
              throw new IllegalArgumentException(s"cannot parse set-tag: $other")
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

  /** Render `nodes` into `sb`, returning the environment as updated by
    * any `{% set %}` bindings. Scoping follows Jinja: `set` bindings
    * flow forward through the sequence and OUT of `if` blocks (if does
    * not introduce a scope), but stay inside a `for` body (each
    * iteration starts from the loop's entry env + loop vars).
    */
  private def emit(nodes: Seq[Node], env0: Map[String, Any],
      vars: Map[String, String], sb: StringBuilder): Map[String, Any] = {
    var env = env0
    nodes.foreach {
      case Text(s) => sb ++= substitute(s, env, vars)
      case SetVar(ident, expr) =>
        env += (ident -> Expr.eval(expr, env, vars))
      case SetBlock(ident, body) =>
        val inner = new StringBuilder
        emit(body, env, vars, inner)
        env += (ident -> inner.toString)
      case If(branches, orElse, incremental) =>
        if (incremental) {
          // re-emit for the compile-time incremental pass; bindings made
          // inside a branch whose text survives to compile time must not
          // leak (only one branch textually survives), so discard them
          branches.zipWithIndex.foreach { case ((c, body), i) =>
            sb ++= (if (i == 0) s"{% if $c %}" else s"{% elif $c %}")
            emit(body, env, vars, sb)
          }
          if (orElse.nonEmpty) { sb ++= "{% else %}"; emit(orElse, env, vars, sb) }
          sb ++= "{% endif %}"
        } else {
          branches.find { case (c, _) => truthy(Expr.eval(c, env, vars)) } match {
            case Some((_, body)) => env = emit(body, env, vars, sb)
            case None => env = emit(orElse, env, vars, sb)
          }
        }
      case For(ident, listExpr, body) =>
        val items = Expr.eval(listExpr, env, vars) match {
          case l: Seq[_] => l
          case m: Map[_, _] => m.keys.toSeq // Jinja iterates a dict's keys
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
    env
  }

  /** `{{ x }}` / `{{ loop.index }}` substitution for bound variables —
    * only identifiers present in `env`; everything else (ref, source,
    * var, this…) is left for Template — plus `{{ fromjson(...)[...] }}`
    * data-function spans (reference context members, base.py:375-631),
    * evaluated here at parse time like any rendered Jinja expression.
    */
  private def substitute(s: String, env: Map[String, Any],
      vars: Map[String, String]): String = {
    if (!s.contains("{{")) return s
    var out = s
    if (env.nonEmpty)
      out = raw"""\{\{\s*([A-Za-z_][\w.]*)\s*\}\}""".r.replaceAllIn(out, m =>
        env.get(m.group(1)) match {
          case Some(v) => Regex.quoteReplacement(Expr.show(v))
          case None => Regex.quoteReplacement(m.matched)
        })
    substituteFuncs(out, env, vars)
  }

  /** Evaluate `{{ fromjson(...)['k'] }}`-style data-function spans.
    * A hand scan (not a regex): the expression may contain `}}` inside
    * a string literal (any JSON object argument does), so the span end
    * is found by PARSING the expression, not by searching for braces.
    */
  private def substituteFuncs(s: String, env: Map[String, Any],
      vars: Map[String, String]): String = {
    if (!s.contains("{{")) return s
    val sb = new StringBuilder
    var i = 0
    while (i < s.length) {
      val open = s.indexOf("{{", i)
      if (open < 0) { sb.append(s.substring(i)); i = s.length }
      else {
        sb.append(s.substring(i, open))
        var j = open + 2
        while (j < s.length && s(j).isWhitespace) j += 1
        val idStart = j
        while (j < s.length && (s(j).isLetterOrDigit || s(j) == '_')) j += 1
        val ident = s.substring(idStart, j)
        while (j < s.length && (s(j).isLetterOrDigit || s(j) == '_' || s(j) == '.'))
          j += 1 // dotted spans: modules.* calls, env-value attr/method chains
        val dotted = s.substring(idStart, j)
        var k = j
        while (k < s.length && s(k).isWhitespace) k += 1
        val headPrefix = dotted.takeWhile(_ != '.')
        // a single `|` (not SQL's `||` concat) after the head means a
        // pipe-filter span — evaluate it like any rendered expression
        def pipeAt(p: Int): Boolean =
          p < s.length && s(p) == '|' && (p + 1 >= s.length || s(p + 1) != '|')
        val literalPiped = ident.isEmpty && idStart < s.length &&
          (s(idStart) == '\'' || s(idStart) == '"') && {
            val q = s(idStart)
            var e = idStart + 1
            while (e < s.length && s(e) != q) e += 1
            e += 1
            while (e < s.length && s(e).isWhitespace) e += 1
            pipeAt(e)
          }
        // `{{ var('x') | upper }}`: a PIPED var() call evaluates here
        // (the filter needs the value); a plain `{{ var('x') }}` span
        // stays Template.render's job — resolution semantics unchanged
        val varPiped = ident == "var" && dotted == ident &&
          k < s.length && s(k) == '(' && {
            var e = k + 1
            var depth = 1
            var inQ: Char = 0
            while (e < s.length && depth > 0) {
              val c = s(e)
              if (inQ != 0) { if (c == inQ) inQ = 0 }
              else if (c == '\'' || c == '"') inQ = c
              else if (c == '(') depth += 1
              else if (c == ')') depth -= 1
              e += 1
            }
            while (e < s.length && s(e).isWhitespace) e += 1
            pipeAt(e)
          }
        val span =
          if (((ContextFuncs.names.contains(ident) || Expr.RewrapCalls.contains(ident)) &&
                k < s.length && s(k) == '(' && dotted == ident) ||
              (env.contains(ident) && k < s.length &&
                (s(k) == '[' || pipeAt(k)) && dotted == ident) ||
              (Modules.handles(dotted) && k < s.length && s(k) == '(') ||
              (dotted.contains('.') && env.contains(headPrefix)) ||
              literalPiped || varPiped)
            Expr.evalSpan(s, idStart, env, vars)
          else None
        span match {
          case Some((v, end)) => sb.append(ContextFuncs.show(v)); i = end
          case None => sb.append("{{"); i = open + 2
        }
      }
    }
    sb.toString
  }

  private[parser] def truthy(v: Any): Boolean = v match {
    case b: Boolean => b
    case s: String => s.nonEmpty
    case l: Long => l != 0L
    case d: Double => d != 0.0
    case l: Seq[_] => l.nonEmpty
    case null => false
    case _ => true
  }

  /** The Jinja pipe-filters real macro code actually hits (reference
    * renders full Jinja, core/dbt/clients/jinja.py; our static scope
    * carries the working set: `| upper`, `| join(', ')`,
    * `| default(…)`, `| trim`, chained freely). One deliberate
    * deviation: an UNKNOWN IDENTIFIER still errors at parse time
    * (static-analysis philosophy) — `default` rescues null/missing
    * VALUES (a subscript miss, a var() without default), not
    * identifiers that exist nowhere.
    */
  private[parser] object Filters {
    private def str(v: Any): String = v match {
      case null => ""
      case s: String => s
      case other => ContextFuncs.show(other)
    }
    private def items(v: Any): Seq[Any] = v match {
      case l: Seq[_] => l
      case m: Map[_, _] => m.keys.toSeq
      case s: String => s.map(_.toString)
      case null => Nil
      case other => throw new IllegalArgumentException(s"not iterable: $other")
    }
    private def num(v: Any): Double = v match {
      case l: Long => l.toDouble
      case d: Double => d
      case s: String => s.toDouble
      case b: Boolean => if (b) 1.0 else 0.0
      case other => throw new IllegalArgumentException(s"not numeric: $other")
    }

    def apply(name: String, v: Any, pos: List[Any], kw: Map[String, Any]): Any = {
      def arg(idx: Int, kwName: String, default: => Any): Any =
        pos.lift(idx).orElse(kw.get(kwName)).getOrElse(default)
      name match {
        case "upper" => str(v).toUpperCase
        case "lower" => str(v).toLowerCase
        case "title" => str(v).split("(?<= )|(?<=-)").map(w =>
          if (w.isEmpty) w else w.head.toUpper + w.tail.toLowerCase).mkString
        case "capitalize" =>
          val s0 = str(v)
          if (s0.isEmpty) s0 else s0.head.toUpper + s0.tail.toLowerCase
        case "trim" => str(v).strip
        case "replace" =>
          str(v).replace(String.valueOf(arg(0, "old", "")), String.valueOf(arg(1, "new", "")))
        case "join" => items(v).map(str).mkString(String.valueOf(arg(0, "d", "")))
        case "default" | "d" =>
          // boolean=true extends the rescue to all falsy values (Jinja)
          val fallback = arg(0, "default_value", "")
          val alsoFalsy = truthy(arg(1, "boolean", false))
          if (v == null || (alsoFalsy && !truthy(v))) fallback else v
        case "length" | "count" => v match {
          case s: String => s.length.toLong
          case other => items(other).length.toLong
        }
        case "first" => items(v).headOption.orNull
        case "last" => items(v).lastOption.orNull
        case "list" => items(v).toVector
        case "string" => str(v)
        case "int" =>
          try {
            v match {
              case l: Long => l
              case d: Double => d.toLong
              case b: Boolean => if (b) 1L else 0L
              case s: String => s.trim.toDouble.toLong
              case _ => num(v).toLong
            }
          } catch { case _: Exception => arg(0, "default", 0L) }
        case "round" =>
          val prec = num(arg(0, "precision", 0L)).toInt
          val scale = math.pow(10, prec)
          math.round(num(v) * scale) / scale
        case "abs" => v match {
          case l: Long => math.abs(l)
          case other => math.abs(num(other))
        }
        case "min" => items(v).minByOption(num).orNull
        case "max" => items(v).maxByOption(num).orNull
        case "sum" =>
          val xs = items(v).map(num)
          if (xs.forall(_.isWhole)) xs.sum.toLong else xs.sum
        case "unique" =>
          val seen = scala.collection.mutable.LinkedHashSet[Any]()
          items(v).foreach(seen += _)
          seen.toVector
        case "sort" =>
          // Jinja signature: sort(reverse=False, ...) — reverse is the
          // FIRST positional argument
          val xs = items(v)
          val sorted =
            if (xs.forall(x => x.isInstanceOf[Long] || x.isInstanceOf[Double]))
              xs.sortBy(num)
            else xs.sortBy(str)
          if (truthy(arg(0, "reverse", false))) sorted.reverse else sorted
        case "reverse" => items(v).reverse
        case "map" =>
          // `| map('trim')` applies a named filter per item (extra args
          // pass through: `| map('replace', '-', '_')`)
          val inner = String.valueOf(pos.headOption.getOrElse(
            throw new IllegalArgumentException("map needs a filter name")))
          items(v).map(x => apply(inner, x, pos.tail, kw)).toVector
        case other => throw new IllegalArgumentException(
          s"unsupported filter '| $other' (supported: upper lower title capitalize trim " +
            "replace join default length count first last list string int round abs " +
            "min max sum unique sort reverse map)")
      }
    }
  }

  /** Tiny recursive-descent expression evaluator for tag conditions. */
  private[parser] object Expr {
    /** Calls whose ARGUMENTS evaluate here but whose call survives to
      * the Template ref/source pass, re-emitted with literal args —
      * this is what makes `{% for m in ['a','b'] %}…{{ ref(m) }}…`
      * (the union-all-models idiom) resolve each loop iteration's ref.
      */
    val RewrapCalls: Set[String] = Set("ref", "source")
    def eval(src: String, env: Map[String, Any], vars: Map[String, String]): Any =
      new P(src, env, vars).parseOr() match { case (v, p) =>
        require(p.atEnd, s"trailing input in condition: $src"); v
      }

    /** Parse one expression starting at `from` inside a larger text and
      * require it to end at a `}}` — returns (value, index-after-`}}`),
      * or None when it isn't a complete well-formed span.
      */
    def evalSpan(src: String, from: Int, env: Map[String, Any],
        vars: Map[String, String]): Option[(Any, Int)] = {
      val p = new P(src, env, vars)
      p.i = from
      try {
        val (v, _) = p.parseOr()
        if (p.closeBraces()) Some((v, p.i)) else None
      } catch { case scala.util.control.NonFatal(_) => None }
    }

    // container/boolean/null rendering matches Jinja via ContextFuncs
    // (a zip/set/fromjson result may land in a {{ x }} loop-var span)
    def show(v: Any): String = ContextFuncs.show(v)

    private final class P(s: String, env: Map[String, Any], vars: Map[String, String]) {
      var i = 0
      def atEnd: Boolean = { ws(); i >= s.length }
      /** Consume a closing `}}` (the end of a `{{ … }}` span). */
      def closeBraces(): Boolean = {
        ws()
        if (s.startsWith("}}", i)) { i += 2; true } else false
      }
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
        val (l, _) = parseAdd()
        ws()
        val ops = Seq("==", "!=", "<=", ">=", "<", ">")
        ops.find(o => s.startsWith(o, i)) match {
          case Some(op) =>
            i += op.length
            val (r, _) = parseAdd()
            (compare(op, l, r), this)
          case None =>
            if (kw("not") && kw("in")) { val (r, _) = parseAdd(); (!isIn(l, r), this) }
            else if (kw("in")) { val (r, _) = parseAdd(); (isIn(l, r), this) }
            else (l, this)
        }
      }
      /** Jinja pipe-filters: `x | upper`, `xs | join(', ') | trim`, …
        * ([[Filters]]). Binding matches real Jinja: TIGHTER than
        * arithmetic/concat, looser than postfix — so `a + b | upper`
        * reads (a + (b|upper)) exactly as Jinja renders it, and
        * `x | length > 3` still reads ((x|length) > 3) because
        * comparison sits above arithmetic.
        */
      private def parseFilter(): (Any, P) = {
        var (v, _) = parsePostfix()
        ws()
        while (i < s.length && s(i) == '|' &&
            (i + 1 >= s.length || s(i + 1) != '|')) { // never eat SQL ||
          i += 1; ws()
          val start = i
          while (i < s.length && (s(i).isLetterOrDigit || s(i) == '_')) i += 1
          require(i > start, s"missing filter name after | in $s")
          val name = s.substring(start, i)
          ws()
          val (posArgs, kwArgs) =
            if (i < s.length && s(i) == '(') { i += 1; parseArgs(s"$name(") }
            else (Nil, ListMap.empty[String, Any])
          v = Filters.apply(name, v, posArgs, kwArgs)
          ws()
        }
        (v, this)
      }
      /** Binary `+`/`-` — numeric, string/list concat, and the
        * datetime ± timedelta algebra ([[Modules.arith]]).
        */
      private def parseAdd(): (Any, P) = {
        var (v, _) = parseFilter()
        ws()
        while (i < s.length && (s(i) == '+' || s(i) == '-')) {
          val op = s(i); i += 1
          val (r, _) = parseFilter()
          v = Modules.arith(op, v, r)
          ws()
        }
        (v, this)
      }
      /** `expr[key]` / `expr[idx]` subscripts and `.name(…)` / `.name`
        * method/attribute chains after any primary — how a fromjson
        * result reaches a scalar and a modules.datetime value reaches
        * `.strftime(…)` / `.year`.
        */
      private def parsePostfix(): (Any, P) = {
        var (v, _) = parsePrimary()
        ws()
        var more = true
        while (more && i < s.length) {
          if (s(i) == '[') {
            i += 1
            val (idx, _) = parseOr(); ws()
            require(i < s.length && s(i) == ']', s"missing ] in $s"); i += 1
            v = subscript(v, idx)
            ws()
          } else if (s(i) == '.' && i + 1 < s.length &&
              (s(i + 1).isLetter || s(i + 1) == '_')) {
            i += 1
            val start = i
            while (i < s.length && (s(i).isLetterOrDigit || s(i) == '_')) i += 1
            val name = s.substring(start, i)
            ws()
            if (i < s.length && s(i) == '(') {
              i += 1
              val (pos, kwArgs) = parseArgs(s"$name(")
              v = Modules.method(v, name, pos, kwArgs)
            } else v = Modules.attr(v, name)
            ws()
          } else more = false
        }
        (v, this)
      }
      /** Call arguments after a consumed `(` — positional plus Python
        * kwargs (`name=value`, told apart from `==` by lookahead).
        */
      private def parseArgs(what: String): (List[Any], ListMap[String, Any]) = {
        val pos = List.newBuilder[Any]
        val kwArgs = ListMap.newBuilder[String, Any]
        ws()
        if (i < s.length && s(i) == ')') { i += 1 }
        else {
          var done = false
          while (!done) {
            ws()
            val save = i
            var j = i
            while (j < s.length && (s(j).isLetterOrDigit || s(j) == '_')) j += 1
            var isKw = false
            if (j > i) {
              var k = j
              while (k < s.length && s(k).isWhitespace) k += 1
              if (k < s.length && s(k) == '=' &&
                  (k + 1 >= s.length || s(k + 1) != '=')) {
                val nm = s.substring(i, j)
                i = k + 1
                val (v, _) = parseOr()
                kwArgs += (nm -> v)
                isKw = true
              }
            }
            if (!isKw) { i = save; val (v, _) = parseOr(); pos += v }
            ws()
            if (i < s.length && s(i) == ',') i += 1
            else {
              require(i < s.length && s(i) == ')', s"missing ) after $what in $s")
              i += 1; done = true
            }
          }
        }
        (pos.result(), kwArgs.result())
      }
      /** A dotted name whose head (longest env-key prefix — env keys
        * themselves may be dotted, e.g. `loop.index`) is bound, with
        * the remaining segments resolved as attributes.
        */
      private def resolveDotted(name: String): Option[Any] = {
        if (env.contains(name)) return Some(env(name))
        if (!name.contains('.')) return None
        val parts = name.split('.')
        var len = parts.length - 1
        while (len >= 1) {
          val key = parts.take(len).mkString(".")
          if (env.contains(key)) {
            var v: Any = env(key)
            parts.drop(len).foreach(seg => v = Modules.attr(v, seg))
            return Some(v)
          }
          len -= 1
        }
        None
      }
      private def subscript(v: Any, idx: Any): Any = (v, idx) match {
        case (m: Map[_, _], k) =>
          m.asInstanceOf[Map[String, Any]].getOrElse(String.valueOf(k), null)
        case (l: Seq[_], n: Long) if n >= 0 && n < l.length => l(n.toInt)
        case (str: String, n: Long) if n >= 0 && n < str.length => str(n.toInt).toString
        case _ => null
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
          case '{' =>
            // dict literal {'k': v, …} — keys stringified like Jinja
            i += 1
            val pairs = scala.collection.immutable.ListMap.newBuilder[String, Any]
            ws()
            if (i < s.length && s(i) == '}') i += 1
            else {
              var done = false
              while (!done) {
                val (k, _) = parseOr(); ws()
                require(i < s.length && s(i) == ':', s"missing : in dict in $s"); i += 1
                val (v, _) = parseOr(); pairs += (String.valueOf(k) -> v); ws()
                if (i < s.length && s(i) == ',') i += 1
                else { require(i < s.length && s(i) == '}', s"missing } in $s"); i += 1; done = true }
              }
            }
            (pairs.result(), this)
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
            if (i < s.length && s(i) == '(' &&
                (ident == "var" || ContextFuncs.names.contains(ident) ||
                  RewrapCalls.contains(ident) || Modules.handles(ident))) {
              i += 1
              val (posArgs, kwArgs) = parseArgs(s"$ident(")
              if (Modules.handles(ident)) (Modules.call(ident, posArgs, kwArgs), this)
              else {
                require(kwArgs.isEmpty, s"$ident() does not take keyword arguments")
                val as = posArgs.toVector
                if (ident == "var")
                  (vars.get(String.valueOf(as.head)).map(coerce)
                    .getOrElse(as.lift(1).orNull), this)
                else if (RewrapCalls.contains(ident)) {
                  // evaluate args (loop vars, set bindings, literals) and
                  // re-emit the call with literal string args for the
                  // Template ref/source pass; non-string args (a kwarg,
                  // a null) abort the whole span via require → untouched
                  require(as.nonEmpty && as.forall(_.isInstanceOf[String]),
                    s"$ident() args must evaluate to strings")
                  (as.map(a => s"'$a'").mkString(s"{{ $ident(", ", ", ") }}"), this)
                } else (ContextFuncs.call(ident, as.toList), this)
              }
            } else if (i < s.length && s(i) == '(' && ident.contains('.') &&
                resolveDotted(ident.substring(0, ident.lastIndexOf('.'))).isDefined) {
              // method call on a dotted env value: `d.strftime('%Y')`
              // (the ident scan ate the dots, so split target.method here)
              val target = resolveDotted(ident.substring(0, ident.lastIndexOf('.'))).get
              i += 1
              val (posArgs, kwArgs) = parseArgs(s"$ident(")
              (Modules.method(target, ident.substring(ident.lastIndexOf('.') + 1),
                posArgs, kwArgs), this)
            } else ident match {
              case "true" | "True" => (true, this)
              case "false" | "False" => (false, this)
              case "none" | "None" => (null, this)
              case other =>
                env.get(other).orElse(resolveDotted(other)) match {
                  case Some(v) => (v, this)
                  case None => throw new IllegalArgumentException(
                    s"unknown identifier '$other' in: $s")
                }
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
