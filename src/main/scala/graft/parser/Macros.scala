package graft.parser

/** Text-level user-macro support: `{% macro name(args) %}…{% endmacro %}`
  * files under `macros/`, expanded at parse time into model/test/snapshot
  * SQL (reference MacroParser, core/dbt/parser/macros.py:27; call
  * machinery core/dbt/clients/jinja.py:49-113; exercised by
  * tests/functional/macros/).
  *
  * Scope matches the engine's static-template philosophy
  * (Template.scala): positional + keyword args with defaults, nested
  * macro calls, `ref()`/`source()` inside macro bodies — but no Jinja
  * control flow. Expansion happens BEFORE Template.scan, so refs
  * introduced by a macro body register as real DAG dependencies.
  */
object Macros {
  final case class MacroDef(
      name: String,
      /** (param, default-literal) — default None = required. */
      params: Seq[(String, Option[String])],
      body: String)

  private val defRe =
    raw"(?s)\{%-?\s*macro\s+([A-Za-z_]\w*)\s*\(([^)]*)\)\s*-?%\}(.*?)\{%-?\s*endmacro\s*-?%\}".r

  /** Custom generic tests: `{% test name(model, column_name) %}` blocks
    * (reference generic_test_builders — the test IS a macro whose body
    * selects failing rows; dbt stores it as `test_<name>` and schema
    * YAML calls it by the bare name).
    */
  private val testDefRe =
    raw"(?s)\{%-?\s*test\s+([A-Za-z_]\w*)\s*\(([^)]*)\)\s*-?%\}(.*?)\{%-?\s*endtest\s*-?%\}".r

  /** Names that look like calls but belong to the base template surface. */
  private val builtins = Set("ref", "source", "var", "config")

  /** `{% materialization name, default %}` / `..., adapter='spark' %}`
    * override blocks (reference core/dbt/parser/macros.py parses these
    * into macros named `materialization_<name>_<adapter>`; dispatch in
    * manifest.py:976-1036 find_materialization_macro_by_name).
    */
  private val matDefRe =
    raw"(?s)\{%-?\s*materialization\s+([A-Za-z_]\w*)\s*(?:,[^%]*?)?-?%\}(.*?)\{%-?\s*endmaterialization\s*-?%\}".r

  /** Parse every materialization-override block: name → body text. */
  def parseMaterializations(text: String): Seq[(String, String)] =
    matDefRe.findAllMatchIn(text).map(m => (m.group(1), m.group(2).trim)).toSeq

  /** Parse every macro + test-block definition in a macros-file's text. */
  def parse(text: String): Seq[MacroDef] = {
    def defs(re: scala.util.matching.Regex) = re.findAllMatchIn(text).map { m =>
      val params = m.group(2).split(",").toSeq.map(_.trim).filter(_.nonEmpty).map { p =>
        val eq = p.indexOf('=')
        if (eq < 0) (p, None)
        else (p.take(eq).trim, Some(p.drop(eq + 1).trim))
      }
      MacroDef(m.group(1), params, m.group(3).trim)
    }.toSeq
    // test blocks live under the test_ prefix (dbt stores them as
    // test_<name>), so a macro and a test sharing a bare name never
    // shadow each other
    defs(defRe) ++ defs(testDefRe).map(d => d.copy(name = "test_" + d.name))
  }

  /** Expand `{{ name(args) }}` calls against `table`, recursively (a
    * macro body may call other macros), bounded to `maxDepth` passes.
    */
  def expand(raw: String, table: Map[String, MacroDef], maxDepth: Int = 10): String = {
    var cur = raw
    var depth = 0
    var changed = true
    while (changed && depth < maxDepth) {
      val next = expandOnce(cur, table)
      changed = next != cur
      cur = next
      depth += 1
    }
    cur
  }

  /** One left-to-right pass. A hand scanner (not a regex) because call
    * args nest parens/quotes: `{{ m(ref('x')) }}`.
    */
  private def expandOnce(raw: String, table: Map[String, MacroDef]): String = {
    val out = new StringBuilder
    var i = 0
    while (i < raw.length) {
      val open = raw.indexOf("{{", i)
      if (open < 0) { out.append(raw.substring(i)); i = raw.length }
      else {
        out.append(raw.substring(i, open))
        parseCall(raw, open) match {
          case Some((name, args, end)) if table.contains(name) =>
            out.append(apply(table(name), args))
            i = end
          case _ =>
            out.append("{{")
            i = open + 2
        }
      }
    }
    out.toString
  }

  /** Try to read `{{ ident ( args ) }}` starting at `open`; returns
    * (ident, raw arg texts, index-after-`}}`).
    */
  private def parseCall(s: String, open: Int): Option[(String, List[String], Int)] = {
    var i = open + 2
    def skipWs(): Unit = while (i < s.length && s(i).isWhitespace) i += 1
    skipWs()
    val id0 = i
    while (i < s.length && (s(i).isLetterOrDigit || s(i) == '_')) i += 1
    val name = s.substring(id0, i)
    if (name.isEmpty || !(name(0).isLetter || name(0) == '_')) return None
    if (builtins.contains(name)) return None
    skipWs()
    if (i >= s.length || s(i) != '(') return None
    i += 1
    // scan to the matching ')' honoring nesting and quotes
    val argStart = i
    var depth = 1
    var inS = false; var inD = false
    while (i < s.length && depth > 0) {
      val c = s(i)
      if (c == '\'' && !inD) inS = !inS
      else if (c == '"' && !inS) inD = !inD
      else if (!inS && !inD) {
        if (c == '(') depth += 1
        else if (c == ')') depth -= 1
      }
      i += 1
    }
    if (depth != 0) return None
    val argsText = s.substring(argStart, i - 1)
    skipWs()
    if (i + 1 >= s.length || s(i) != '}' || s(i + 1) != '}') return None
    val args = if (argsText.trim.isEmpty) Nil else Template.topLevelSplit(argsText)
    Some((name, args, i + 2))
  }

  /** Bind args to params (positional then kwargs then defaults), then
    * substitute into the body in two forms: direct `{{ param }}`
    * interpolation gets the RENDERED value (string literals unquoted,
    * ref() re-wrapped); a bare `param` token inside another `{{ … }}`
    * span (a nested macro call's argument) gets the RAW arg text so
    * quoting survives — `{{ cents(col) }}` with col='hot' must become
    * `{{ cents('hot') }}`, not `{{ cents(hot) }}`.
    */
  private def apply(m: MacroDef, args: List[String]): String = {
    val (kwargs, positional) = args.partition(a => isKwarg(a))
    val kw = kwargs.map { a =>
      val eq = a.indexOf('=')
      a.take(eq).trim -> a.drop(eq + 1).trim
    }.toMap
    val rawBound: Map[String, String] = m.params.zipWithIndex.map { case ((p, default), idx) =>
      val v = if (idx < positional.length) Some(positional(idx))
        else kw.get(p).orElse(default)
      p -> v.getOrElse(throw new IllegalArgumentException(
        s"macro ${m.name}: missing argument '$p'")).trim
    }.toMap
    val direct = rawBound.foldLeft(m.body) { case (acc, (p, v)) =>
      acc.replaceAll(raw"\{\{-?\s*" + java.util.regex.Pattern.quote(p) + raw"\s*-?\}\}",
        scala.util.matching.Regex.quoteReplacement(renderArg(v)))
    }
    val inExprs = raw"(?s)\{\{(.*?)\}\}".r.replaceAllIn(direct, sp =>
      scala.util.matching.Regex.quoteReplacement(
        "{{" + rewriteTokens(sp.group(1), rawBound) + "}}"))
    // params are also visible inside the body's control-flow tags —
    // `{% set d = strptime(as_of, …) %}` must see the caller's arg text
    // (ControlFlow renders tags AFTER expansion, so the substitution
    // has to happen here, token-wise, skipping string literals). The
    // tag's own BINDER stays untouched: `{% for c in … %}` / `{% set c
    // = … %}` must keep `c` as an identifier even when a param shares
    // the name — otherwise the tag text turns syntactically invalid.
    // (Full Jinja shadowing inside the bound body is out of scope like
    // the rest of the macro system's textual semantics.)
    // the leading `-?` covers whitespace-trim tags (`{%- for x … -%}`):
    // the captured tag body then starts with '-', and the binder must
    // still be protected
    val binderRe = raw"(?s)^(-?\s*(?:for|set)\s+)([A-Za-z_]\w*)(.*)$$".r
    raw"(?s)\{%(.*?)%\}".r.replaceAllIn(inExprs, sp =>
      scala.util.matching.Regex.quoteReplacement("{%" + (sp.group(1) match {
        case binderRe(head, binder, rest) =>
          head + binder + rewriteTokens(rest, rawBound)
        case other => rewriteTokens(other, rawBound)
      }) + "%}"))
  }

  /** Replace bare identifier tokens with their raw arg text, skipping
    * quoted segments (`'col'` is a literal, `col` is the parameter).
    */
  private def rewriteTokens(s: String, bound: Map[String, String]): String = {
    val sb = new StringBuilder
    var i = 0; var inS = false; var inD = false
    while (i < s.length) {
      val c = s(i)
      if (c == '\'' && !inD) { inS = !inS; sb += c; i += 1 }
      else if (c == '"' && !inS) { inD = !inD; sb += c; i += 1 }
      else if (!inS && !inD && (c.isLetter || c == '_')) {
        val start = i
        while (i < s.length && (s(i).isLetterOrDigit || s(i) == '_')) i += 1
        val word = s.substring(start, i)
        sb.append(bound.getOrElse(word, word))
      } else { sb += c; i += 1 }
    }
    sb.toString
  }

  /** `name=value` at top level (not `==`, not inside a string). */
  private def isKwarg(a: String): Boolean = {
    val eq = a.indexOf('=')
    eq > 0 && a(eq - 1) != '=' && (eq + 1 >= a.length || a(eq + 1) != '=') &&
      a.take(eq).trim.matches(raw"[A-Za-z_]\w*") &&
      !a.take(eq).contains('\'') && !a.take(eq).contains('"')
  }

  /** How an argument's text lands in the body: string literals render
    * unquoted (dbt renders Python values into SQL), `ref()`/`source()`
    * re-wrap in `{{ }}` so the ordinary ref pass resolves the relation,
    * anything else (numbers, SQL fragments) passes through verbatim.
    */
  private def renderArg(text: String): String = {
    val t = text.trim
    if (t.length >= 2 &&
        ((t.head == '\'' && t.last == '\'') || (t.head == '"' && t.last == '"')))
      t.substring(1, t.length - 1)
    else if (t.matches(raw"(?s)(ref|source)\s*\(.*")) s"{{ $t }}"
    else t
  }
}
