package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.parser.{MiniYaml, Template}

class MiniYamlSpec extends AnyFunSuite {
  test("nested maps, lists, scalars") {
    val doc = MiniYaml.parseMap(
      """name: demo
        |version: 2
        |vars:
        |  data_dir: /tmp/data
        |  sf: 0.01
        |models:
        |  +materialized: view
        |list_inline: [a, b, 'c d']
        |flag: true
        |nothing:
        |""".stripMargin)
    assert(doc("name") == "demo")
    assert(doc("version") == 2L)
    assert(doc("vars").asInstanceOf[Map[String, Any]]("data_dir") == "/tmp/data")
    assert(doc("models").asInstanceOf[Map[String, Any]]("+materialized") == "view")
    assert(doc("list_inline") == List("a", "b", "c d"))
    assert(doc("flag") == true)
  }

  test("object lists (schema yml shape)") {
    val doc = MiniYaml.parseMap(
      """sources:
        |  - name: tpch
        |    tables:
        |      - name: lineitem
        |        location: "{data_dir}/lineitem.parquet"
        |      - name: orders
        |models:
        |  - name: stg
        |    columns:
        |      - name: k
        |        tests:
        |          - unique
        |          - accepted_values:
        |              values: ['O', 'F']
        |""".stripMargin)
    val srcs = doc("sources").asInstanceOf[List[Map[String, Any]]]
    assert(srcs.head("name") == "tpch")
    val tables = srcs.head("tables").asInstanceOf[List[Map[String, Any]]]
    assert(tables.map(_("name")) == List("lineitem", "orders"))
    assert(tables.head("location") == "{data_dir}/lineitem.parquet")
    val cols = doc("models").asInstanceOf[List[Map[String, Any]]]
      .head("columns").asInstanceOf[List[Map[String, Any]]]
    val tests = cols.head("tests").asInstanceOf[List[Any]]
    assert(tests.head == "unique")
    val av = tests(1).asInstanceOf[Map[String, Any]]("accepted_values")
      .asInstanceOf[Map[String, Any]]
    assert(av("values") == List("O", "F"))
  }

  test("comments and quoted colons") {
    val doc = MiniYaml.parseMap(
      """a: 1  # trailing comment
        |# full-line comment
        |b: "x: y"
        |""".stripMargin)
    assert(doc("a") == 1L)
    assert(doc("b") == "x: y")
  }
}

class TemplateSpec extends AnyFunSuite {
  val raw =
    """{{ config(materialized='table', unique_key='k', tags=['nightly']) }}
      |SELECT * FROM {{ ref('stg_orders') }} o
      |JOIN {{ source('tpch', 'lineitem') }} l ON o.k = l.k
      |WHERE sf = {{ var('sf', 1) }}""".stripMargin

  test("static scan extracts refs/sources/config/vars") {
    val s = Template.scan(raw)
    assert(s.refs == Seq("stg_orders"))
    assert(s.sources == Seq(("tpch", "lineitem")))
    assert(s.config("materialized") == "table")
    assert(s.config("unique_key") == "k")
    assert(s.config("tags") == List("nightly"))
    assert(s.vars == Seq("sf"))
  }

  test("render substitutes and strips config") {
    val out = Template.render(raw,
      r => s"main.$r", (a, b) => s"src__${a}__$b", Map("sf" -> "0.01"))
    assert(!out.contains("config("))
    assert(out.contains("FROM main.stg_orders o"))
    assert(out.contains("JOIN src__tpch__lineitem l"))
    assert(out.contains("sf = 0.01"))
  }

  test("var default is used when unset") {
    val out = Template.render("SELECT {{ var('x', 42) }}", identity, (_, _) => "", Map.empty)
    assert(out == "SELECT 42")
  }

  test("run context substitutes run_started_at / invocation_id") {
    val out = Template.render(
      "SELECT *, '{{ run_started_at }}' AS loaded_at, '{{ invocation_id }}' AS run_id FROM t",
      identity, (_, _) => "", Map.empty,
      context = Map("run_started_at" -> "2024-01-01 00:00:00", "invocation_id" -> "abc-123"))
    assert(out.contains("'2024-01-01 00:00:00' AS loaded_at"))
    assert(out.contains("'abc-123' AS run_id"))
  }

  test("is_incremental blocks: kept when incremental, else-branch otherwise") {
    val sql =
      """SELECT * FROM t
        |{% if is_incremental() %}WHERE ts > (SELECT max(ts) FROM {{ this }}){% endif %}""".stripMargin
    val inc = Template.render(sql, identity, (_, _) => "", Map.empty,
      thisRelation = Some("tgt"), isIncremental = true)
    assert(inc.contains("WHERE ts > (SELECT max(ts) FROM tgt)"))
    val first = Template.render(sql, identity, (_, _) => "", Map.empty,
      thisRelation = Some("tgt"), isIncremental = false)
    assert(!first.contains("WHERE"))

    val withElse = "{% if is_incremental() %}A{% else %}B{% endif %}"
    assert(Template.renderIncrementalBlocks(withElse, isIncremental = true) == "A")
    assert(Template.renderIncrementalBlocks(withElse, isIncremental = false) == "B")
  }
}

class MacrosSpec extends AnyFunSuite {
  import graft.parser.Macros

  val defs = Macros.parse(
    """{% macro cents(col, scale=100) %}
      |CAST(ROUND({{ col }} * {{ scale }}) AS BIGINT)
      |{% endmacro %}
      |
      |{% macro safe_cents(col) %}
      |COALESCE({{ cents(col) }}, 0)
      |{% endmacro %}
      |
      |{% macro from_rel(r) %}SELECT * FROM {{ r }}{% endmacro %}
      |""".stripMargin)
  val table = defs.map(m => m.name -> m).toMap

  test("definition parsing: names, params, defaults") {
    assert(defs.map(_.name) == Seq("cents", "safe_cents", "from_rel"))
    assert(table("cents").params == Seq(("col", None), ("scale", Some("100"))))
  }

  test("positional + default args expand") {
    val out = Macros.expand("SELECT {{ cents(o_totalprice) }} AS pc", table)
    assert(out == "SELECT CAST(ROUND(o_totalprice * 100) AS BIGINT) AS pc")
  }

  test("kwargs override defaults") {
    val out = Macros.expand("{{ cents(x, scale=1000) }}", table)
    assert(out == "CAST(ROUND(x * 1000) AS BIGINT)")
  }

  test("nested macro calls expand recursively") {
    val out = Macros.expand("{{ safe_cents(amt) }}", table)
    assert(out == "COALESCE(CAST(ROUND(amt * 100) AS BIGINT), 0)")
  }

  test("ref() arguments re-wrap so the ref pass resolves them") {
    val out = Macros.expand("{{ from_rel(ref('stg_orders')) }}", table)
    assert(out == "SELECT * FROM {{ ref('stg_orders') }}")
  }

  test("string-literal args render unquoted; unknown calls untouched") {
    val t2 = Macros.parse("{% macro tag(v) %}'{{ v }}'{% endmacro %}").map(m => m.name -> m).toMap
    assert(Macros.expand("{{ tag('hot') }}", t2) == "'hot'")
    val keep = "SELECT {{ ref('m') }}, {{ var('x', 1) }}, {{ nosuch(1) }}"
    assert(Macros.expand(keep, table) == keep)
  }

  test("missing required argument raises") {
    assertThrows[IllegalArgumentException](Macros.expand("{{ cents() }}", table))
  }
}

class ControlFlowSpec extends AnyFunSuite {
  import graft.parser.ControlFlow

  test("if / elif / else pick the right branch from vars") {
    val t = """SELECT *
      {% if var('env') == 'prod' %}FROM big{% elif var('env') == 'ci' %}FROM small{% else %}FROM dev{% endif %}"""
    assert(ControlFlow.render(t, Map("env" -> "prod")).contains("FROM big"))
    assert(ControlFlow.render(t, Map("env" -> "ci")).contains("FROM small"))
    assert(ControlFlow.render(t, Map.empty).contains("FROM dev"))
    assert(!ControlFlow.render(t, Map("env" -> "prod")).contains("{%"))
  }

  test("conditions: and/or/not, comparisons, in, numbers, target") {
    def r(c: String, vars: Map[String, String] = Map.empty) =
      ControlFlow.render(s"{% if $c %}Y{% else %}N{% endif %}", vars, target = "prod")
    assert(r("1 < 2 and not false") == "Y")
    assert(r("var('n', 3) >= 4") == "N")
    assert(r("var('n') >= 4", Map("n" -> "10")) == "Y")
    assert(r("'b' in ['a', 'b']") == "Y")
    assert(r("'z' not in ['a', 'b']") == "Y")
    assert(r("target.name == 'prod'") == "Y")
    assert(r("(1 > 2) or ('x' != 'y')") == "Y")
  }

  test("for loop binds the variable and loop metadata") {
    val t = "SELECT {% for c in ['a', 'b', 'c'] %}sum({{ c }}) AS {{ c }}_{{ loop.index }}{% if not loop.last %}, {% endif %}{% endfor %}"
    assert(ControlFlow.render(t) ==
      "SELECT sum(a) AS a_1, sum(b) AS b_2, sum(c) AS c_3")
  }

  test("nested for + if and untouched jinja pass through") {
    val t = "{% for s in ['x', 'y'] %}{% if s == 'x' %}{{ ref('m_x') }}{% else %}{{ ref('m_y') }}{% endif %}|{% endfor %}"
    assert(ControlFlow.render(t) == "{{ ref('m_x') }}|{{ ref('m_y') }}|")
    val plain = "SELECT {{ ref('a') }} FROM {{ source('s', 't') }}"
    assert(ControlFlow.render(plain) == plain)
  }

  test("is_incremental blocks survive verbatim for the compile-time pass") {
    val t = "SELECT * FROM t {% if is_incremental() %}WHERE ts > (SELECT max(ts) FROM {{ this }}){% endif %}"
    assert(ControlFlow.render(t) == t)
    // …and inner parse-time tags inside them still render
    val t2 = "{% if is_incremental() %}{% for c in ['k'] %}{{ c }}{% endfor %}{% endif %}"
    assert(ControlFlow.render(t2) == "{% if is_incremental() %}k{% endif %}")
  }

  test("unbalanced tags raise") {
    assertThrows[IllegalArgumentException](ControlFlow.render("{% if true %}x"))
    assertThrows[IllegalArgumentException](
      ControlFlow.render("{% if true %}x{% endif %}{% endfor %}"))
  }

  test("set binds scalars, lists and dicts for later tags (dbt docs idiom)") {
    val t = "{% set methods = ['cash', 'card'] %}" +
      "SELECT {% for m in methods %}sum({{ m }}) AS {{ m }}_amt" +
      "{% if not loop.last %}, {% endif %}{% endfor %}"
    assert(ControlFlow.render(t) == "SELECT sum(cash) AS cash_amt, sum(card) AS card_amt")
    // scalar + subscripted dict rendering
    val t2 = "{% set n = 3 %}{% set cfg = {'kind': 'daily', 'n': n} %}" +
      "{{ cfg['kind'] }}_{{ cfg['n'] }}_{{ n }}"
    assert(ControlFlow.render(t2) == "daily_3_3")
    // set from var() with default
    assert(ControlFlow.render("{% set x = var('missing', 'dflt') %}{{ x }}") == "dflt")
    assert(ControlFlow.render("{% set x = var('v') %}{{ x }}", Map("v" -> "7")) == "7")
  }

  test("set scoping: flows out of if, stays inside for") {
    val t = "{% if true %}{% set x = 'a' %}{% endif %}{{ x }}"
    assert(ControlFlow.render(t) == "a")
    // for-body bindings are loop-scoped; outer binding wins after endfor
    val t2 = "{% set x = 'outer' %}{% for i in [1, 2] %}{% set x = i %}{{ x }}{% endfor %}{{ x }}"
    assert(ControlFlow.render(t2) == "12outer")
  }

  test("ref/source calls re-wrap evaluated args for the Template pass") {
    // the union-all-models idiom: a loop var inside ref()
    val t = "{% for m in ['x', 'y'] %}SELECT * FROM {{ ref(m) }};{% endfor %}"
    assert(ControlFlow.render(t) ==
      "SELECT * FROM {{ ref('x') }};SELECT * FROM {{ ref('y') }};")
    // set bindings reach ref args too; two-arg source keeps both
    val t2 = "{% set tbl = 'orders' %}{{ source('raw', tbl) }}"
    assert(ControlFlow.render(t2) == "{{ source('raw', 'orders') }}")
    // literal-arg calls pass through byte-identical
    val plain = "SELECT {{ ref('a') }} FROM {{ source('s', 't') }}"
    assert(ControlFlow.render(plain) == plain)
    // unsupported arg shapes (kwargs) stay verbatim for Template
    val kw = "{{ ref('m', v=2) }}"
    assert(ControlFlow.render(kw) == kw)
  }

  test("set block captures rendered body as a string") {
    // body renders with the current env; {{ var(...) }}/{{ ref(...) }}
    // spans inside it stay verbatim for the Template layer, like any text
    val t = "{% set col = 'qty' %}{% set frag %}{{ col }} > {{ min }}{% endset %}" +
      "SELECT * FROM t WHERE {{ frag }} AND {{ frag }}"
    assert(ControlFlow.render(t) ==
      "SELECT * FROM t WHERE qty > {{ min }} AND qty > {{ min }}")
    assertThrows[IllegalArgumentException](
      ControlFlow.render("{% set frag %}no end"))
  }

  test("block scalars keep '#' and blank lines verbatim; '>' folds paragraphs") {
    val y = MiniYaml.parseMap(
      """a:
        |  sql: |
        |    SELECT 1 -- #not-a-comment
        |
        |    FROM t
        |  # a comment line between keys must not leak into the body
        |  folded: >
        |    one
        |    two
        |
        |    three
        |b: 2
        |""".stripMargin)
    val a = y("a").asInstanceOf[Map[String, Any]]
    assert(a("sql") == "SELECT 1 -- #not-a-comment\n\nFROM t", s"got: ${a("sql")}")
    assert(a("folded") == "one two\nthree", s"got: ${a("folded")}")
    assert(y("b") == 2)
  }

  test("data functions: fromjson/tojson/fromyaml/toyaml/set/zip") {
    import graft.parser.MiniYaml
    // span substitution with subscript chains (reference context
    // members, base.py:375-631)
    assert(ControlFlow.render(
      "SELECT * FROM {{ fromjson(var('cfg'))['schema'] }}.t",
      Map("cfg" -> """{"schema": "analytics", "retries": 3}""")) ==
      "SELECT * FROM analytics.t")
    assert(ControlFlow.render("{{ fromjson('[10, 20, 30]')[1] }}") == "20")
    assert(ControlFlow.render(
      """{{ fromjson('{"a": {"b": [1, 2]}}')['a']['b'][0] }}""") == "1")
    // tojson round-trips preserving key order
    assert(ControlFlow.render(
      """{{ tojson(fromjson('{"z": 1, "a": [true, null]}')) }}""") ==
      """{"z": 1, "a": [true, null]}""")
    // fromyaml / toyaml: emitted yaml re-parses to the same value
    assert(ControlFlow.render("{{ fromyaml(var('y'))['dogs'][0] }}",
      Map("y" -> "dogs:\n - good\n - bad")) == "good")
    val y = ControlFlow.render(
      """{{ toyaml(fromjson('{"a": 1, "b": ["x", "y"]}')) }}""")
    assert(MiniYaml.parseMap(y) == Map("a" -> 1, "b" -> List("x", "y")), y)
    // set: first-occurrence-order distinct; zip: parallel iteration
    assert(ControlFlow.render(
      "{% for x in set([1, 2, 2, 3]) %}{{ x }}{% endfor %}") == "123")
    assert(ControlFlow.render(
      "{% for p in zip([1, 2], ['a', 'b']) %}{{ p }}|{% endfor %}") ==
      "[1, 'a']|[2, 'b']|")
    // data functions compose into tag conditions and dict iteration
    assert(ControlFlow.render(
      "{% if fromjson(var('cfg'))['retries'] > 2 %}Y{% else %}N{% endif %}",
      Map("cfg" -> """{"retries": 3}""")) == "Y")
    assert(ControlFlow.render(
      """{% for k in fromjson('{"b": 1, "a": 2}') %}{{ k }}{% endfor %}""") == "ba")
    // malformed input falls back to the provided default
    assert(ControlFlow.render("{{ fromjson('oops', 'dflt') }}") == "dflt")
  }

  test("target.name renders with or without control tags present") {
    assert(ControlFlow.render("SELECT '{{ target.name }}' AS env", target = "prod")
      == "SELECT 'prod' AS env")
    assert(ControlFlow.render("{% if true %}x{% endif %} '{{ target.name }}'", target = "prod")
      == "x 'prod'")
  }

  test("modules.datetime: construction, strptime/strftime, timedelta algebra") {
    def r(e: String) = ControlFlow.render(s"{{ $e }}")
    assert(r("modules.datetime.date(2024, 3, 5)") == "2024-03-05")
    assert(r("modules.datetime.datetime(2024, 3, 5, 7, 8, 9)") == "2024-03-05 07:08:09")
    assert(r("modules.datetime.datetime.strptime('2024-03-05', '%Y-%m-%d')" +
      ".strftime('%d/%m/%Y')") == "05/03/2024")
    assert(r("modules.datetime.datetime.strptime('05 Mar 2024 01:30 PM', " +
      "'%d %b %Y %I:%M %p').strftime('%Y-%m-%dT%H:%M:%S')") == "2024-03-05T13:30:00")
    // the macro idiom the reference's modules exist for: date arithmetic
    assert(r("modules.datetime.datetime.strptime('2024-03-05', '%Y-%m-%d') " +
      "+ modules.datetime.timedelta(days=10)") == "2024-03-15 00:00:00")
    assert(r("modules.datetime.date(2024, 3, 1) - modules.datetime.timedelta(days=1)")
      == "2024-02-29") // leap-aware
    assert(r("modules.datetime.timedelta(weeks=1, hours=2)") == "7 days, 2:00:00")
    assert(r("modules.datetime.timedelta(hours=26).days") == "1")
    // set-bound values chain methods and attributes
    val t = "{% set d = modules.datetime.datetime.strptime('2024-12-31 23:30', " +
      "'%Y-%m-%d %H:%M') %}{{ d.year }}|{{ d.strftime('%H%M') }}|{{ d.date() }}"
    assert(ControlFlow.render(t) == "2024|2330|2024-12-31")
    val t2 = "{% set dd = modules.datetime.date(2024, 3, 5) - " +
      "modules.datetime.date(2024, 2, 5) %}{{ dd.days }}"
    assert(ControlFlow.render(t2) == "29")
    // conditions see the same algebra
    assert(ControlFlow.render("{% if modules.datetime.date(2024, 1, 2) - " +
      "modules.datetime.date(2024, 1, 1) == modules.datetime.timedelta(days=1) %}" +
      "Y{% endif %}") == "Y")
  }

  test("modules.re: match/search/sub/findall/split/escape in spans and conditions") {
    def r(e: String) = ControlFlow.render(s"{{ $e }}")
    assert(r("modules.re.sub('[^0-9]', '', 'a1b2c3')") == "123")
    assert(r("""modules.re.sub('(\w+)@(\w+)', '\2.\1', 'user@host')""") == "host.user")
    assert(r("modules.re.search('[0-9]+', 'order 417 shipped').group(0)") == "417")
    assert(r("modules.re.match('(a+)(b*)', 'aabbb').group(2)") == "bbb")
    assert(r("modules.re.findall('[0-9]+', 'a1 b22 c333')") == "['1', '22', '333']")
    assert(r("modules.re.split(',\\s*', 'x, y,z')") == "['x', 'y', 'z']")
    assert(r("modules.re.escape('a.b*c')") == "a\\.b\\*c")
    // Python's 4th (count) argument bounds the replacements
    assert(r("modules.re.sub('a', 'b', 'aaa', 1)") == "baa")
    assert(r("modules.re.sub('a', 'b', 'aaa', 2)") == "bba")
    // match is anchored, search is not; a failed match is falsy
    assert(ControlFlow.render("{% if modules.re.match('[0-9]', 'a1') %}Y{% else %}N{% endif %}") == "N")
    assert(ControlFlow.render("{% if modules.re.search('[0-9]', 'a1') %}Y{% else %}N{% endif %}") == "Y")
    // env-var-driven condition (the macro gate idiom)
    assert(ControlFlow.render(
      "{% if modules.re.match('prod', var('env', 'dev')) %}big{% else %}small{% endif %}",
      Map("env" -> "produs-east")) == "big")
  }

  test("macro params leave a tag's own for/set binder identifier intact") {
    import graft.parser.Macros
    // PINNED semantics of text-level expansion (documented divergence
    // from Jinja's runtime scoping): macro args substitute into {{ }}
    // spans BEFORE control flow renders, so an arg wins over a same-
    // named loop/set binder in the body. The binder IDENTIFIER itself
    // must survive substitution (the tag still parses) — only the
    // body's value spans are pre-bound. Jinja would print x:ab /
    // inner / y:a; this engine deterministically prints the arg.
    val defs = Macros.parse(
      "{% macro m(c) %}{{ c }}:{% for c in ['a', 'b'] %}{{ c }}{% endfor %}{% endmacro %}")
      .map(d => d.name -> d).toMap
    val expanded = Macros.expand("{{ m('x') }}", defs)
    assert(ControlFlow.render(expanded) == "x:xx",
      s"shadowing semantics changed: '${ControlFlow.render(expanded)}'")
    // set binder likewise survives; the pre-bound span still renders
    // the arg (assignment happens, but the span was already text)
    val defs2 = Macros.parse(
      "{% macro n(v) %}{% set v = 'inner' %}{{ v }}{% endmacro %}")
      .map(d => d.name -> d).toMap
    val out2 = ControlFlow.render(Macros.expand("{{ n('outer') }}", defs2))
    assert(out2 == "outer", s"set-shadowing semantics changed: '$out2'")
    // whitespace-trim tags ({%- for … -%}) must protect the binder too —
    // the tag body starts with '-', not the keyword
    val defs3 = Macros.parse(
      "{% macro t(c) %}{{ c }}:{%- for c in ['a'] -%}{{ c }}{%- endfor -%}{% endmacro %}")
      .map(d => d.name -> d).toMap
    val expanded3 = Macros.expand("{{ t('y') }}", defs3)
    val out3 = ControlFlow.render(expanded3)
    assert(out3 == "y:y", s"trim-tag shadowing semantics changed: '$out3'")
    // distinct names don't collide: the loop binder iterates while the
    // arg renders — the unambiguous case behaves like Jinja
    val defs4 = Macros.parse(
      "{% macro u(x) %}{{ x }}:{% for i in ['a', 'b'] %}{{ i }}{% endfor %}{% endmacro %}")
      .map(d => d.name -> d).toMap
    assert(ControlFlow.render(Macros.expand("{{ u('z') }}", defs4)) == "z:ab")
  }

  test("flags context member: typed defaults, CLI-seeded values, renderable") {
    val t = "{% if flags.FULL_REFRESH %}drop{% else %}keep{% endif %}"
    assert(ControlFlow.render(t) == "keep", "default FULL_REFRESH is false")
    assert(ControlFlow.render(t, Map("flags.FULL_REFRESH" -> "true")) == "drop")
    assert(ControlFlow.render("{{ flags.WHICH }}") == "run")
    assert(ControlFlow.render("{{ flags.WHICH }}", Map("flags.WHICH" -> "build")) == "build")
    // renders Python-style booleans like the reference's Jinja would
    assert(ControlFlow.render("{{ flags.FULL_REFRESH }}") == "False")
  }

  test("modules.datetime accepts keyword arguments like Python") {
    assert(ControlFlow.render(
      "{{ modules.datetime.date(year=2026, month=8, day=14) }}") == "2026-08-14")
    assert(ControlFlow.render(
      "{{ modules.datetime.datetime(2026, 8, 14, second=30) }}")
      == "2026-08-14 00:00:30")
    // missing required kw names the gap, Python-style — the span fails
    // to evaluate, so the expression renders unresolved rather than as
    // a zero-padded (invalid) date
    assert(ControlFlow.render("{{ modules.datetime.date(year=2026) }}")
      .contains("modules.datetime.date"), "must not render a fabricated date")
  }

  test("print context member renders empty (reference base.py:672)") {
    assert(ControlFlow.render("a{{ print('side channel') }}b") == "ab")
    // still composes inside control flow without leaving residue
    assert(ControlFlow.render(
      "{% for x in ['1', '2'] %}{{ print(x) }}{{ x }}{% endfor %}") == "12")
  }

  test("modules.itertools: chain/product/combinations drive for loops") {
    assert(ControlFlow.render(
      "{% for x in modules.itertools.chain(['a', 'b'], ['c']) %}{{ x }}{% endfor %}")
      == "abc")
    assert(ControlFlow.render(
      "{% for p in modules.itertools.product(['x', 'y'], [1, 2]) %}{{ p }}|{% endfor %}")
      == "['x', 1]|['x', 2]|['y', 1]|['y', 2]|")
    assert(ControlFlow.render(
      "{% for c in modules.itertools.combinations(['a', 'b', 'c'], 2) %}{{ c }}|{% endfor %}")
      == "['a', 'b']|['a', 'c']|['b', 'c']|")
    // positional semantics: duplicate values still pair
    assert(ControlFlow.render(
      "{% for c in modules.itertools.combinations(['a', 'a'], 2) %}{{ c }}{% endfor %}")
      == "['a', 'a']")
  }

  test("expression precedence: arithmetic binds tighter than compare/bool") {
    def r(c: String) = ControlFlow.render(s"{% if $c %}Y{% else %}N{% endif %}")
    assert(r("1 + 2 == 3") == "Y")
    assert(r("10 - 3 > 5 and 1 + 1 == 2") == "Y")
    assert(r("2 + 2 == 5") == "N")
    assert(r("'a' + 'b' == 'ab'") == "Y")
    assert(r("1 - 2 + 3 == 2") == "Y") // left assoc
    assert(r("'b' in ['a'] + ['b']") == "Y")
  }

  test("string methods and +/- arithmetic compose with set and for") {
    assert(ControlFlow.render("{% set s = 'Hello World' %}{{ s.lower().replace(' ', '_') }}")
      == "hello_world")
    assert(ControlFlow.render("{% set csv = 'a,b,c' %}{{ csv.split(',') }}")
      == "['a', 'b', 'c']")
    assert(ControlFlow.render("{% set sep = '_' %}{{ sep.join(['x', 'y']) }}") == "x_y")
    assert(ControlFlow.render("{% set n = 3 + 4 - 1 %}{{ n }}") == "6")
    assert(ControlFlow.render("{% set p = 'pre' + '_' + 'fix' %}{{ p }}") == "pre_fix")
    assert(ControlFlow.render(
      "{% if 'x'.upper() == 'X' and 10 - 3 > 5 %}Y{% endif %}") == "Y")
  }

  test("pipe filters: the working Jinja set, one case per filter") {
    def r(t: String, vars: Map[String, String] = Map.empty) = ControlFlow.render(t, vars)
    assert(r("{% set s = 'Ab c' | upper %}{{ s }}") == "AB C")
    assert(r("{% set s = 'Ab C' | lower %}{{ s }}") == "ab c")
    assert(r("{% set s = 'hello world' | title %}{{ s }}") == "Hello World")
    assert(r("{% set s = 'hELLO' | capitalize %}{{ s }}") == "Hello")
    assert(r("{% set s = '  pad  ' | trim %}{{ s }}") == "pad")
    assert(r("{% set s = 'a-b-c' | replace('-', '_') %}{{ s }}") == "a_b_c")
    assert(r("{% set s = ['x', 'y', 'z'] | join(', ') %}{{ s }}") == "x, y, z")
    assert(r("{% set s = ['x', 'y'] | join %}{{ s }}") == "xy")
    assert(r("{% set n = ['a', 'b', 'c'] | length %}{{ n }}") == "3")
    assert(r("{% set n = 'abcd' | count %}{{ n }}") == "4")
    assert(r("{% set s = ['p', 'q'] | first %}{{ s }}") == "p")
    assert(r("{% set s = ['p', 'q'] | last %}{{ s }}") == "q")
    assert(r("{% set l = 'ab' | list %}{{ l }}") == "['a', 'b']")
    assert(r("{% set s = 42 | string %}{{ s }}") == "42")
    assert(r("{% set n = '17' | int %}{{ n }}") == "17")
    assert(r("{% set n = 'zz' | int %}{{ n }}") == "0")
    assert(r("{% set n = 'zz' | int(9) %}{{ n }}") == "9")
    assert(r("{% set n = 2.678 | round(1) %}{{ n }}") == "2.7")
    assert(r("{% set n = -4 | abs %}{{ n }}") == "4")
    assert(r("{% set n = [3, 1, 2] | min %}{{ n }}") == "1")
    assert(r("{% set n = [3, 1, 2] | max %}{{ n }}") == "3")
    assert(r("{% set n = [3, 1, 2] | sum %}{{ n }}") == "6")
    assert(r("{% set l = ['b', 'a', 'b'] | unique %}{{ l }}") == "['b', 'a']")
    assert(r("{% set l = [3, 1, 2] | sort %}{{ l }}") == "[1, 2, 3]")
    // Jinja's first positional arg to sort IS reverse
    assert(r("{% set l = [3, 1, 2] | sort(true) %}{{ l }}") == "[3, 2, 1]")
    assert(r("{% set l = [3, 1, 2] | sort(reverse=true) %}{{ l }}") == "[3, 2, 1]")
    assert(r("{% set l = ['a', 'b'] | reverse %}{{ l }}") == "['b', 'a']")
    // map applies a named filter per item, extra args pass through
    assert(r("{% set l = [' a ', 'B'] | map('trim') | map('lower') %}{{ l }}")
      == "['a', 'b']")
    assert(r("{% set l = ['x-y'] | map('replace', '-', '_') %}{{ l }}") == "['x_y']")
    // the showcase idiom end to end: sloppy CSV → normalized IN-list
    assert(r("{% set langs = ' EN, de ,en'.split(',') | map('trim') | map('lower') " +
      "| unique | sort %}{{ langs | join(', ') }}") == "de, en")
  }

  test("pipe filters: default rescues null/missing values, not unknown identifiers") {
    def r(t: String, vars: Map[String, String] = Map.empty) = ControlFlow.render(t, vars)
    // a subscript miss and a defaultless var() miss are null → rescued
    assert(r("{% set m = {'a': 1} %}{{ m['zz'] | default('fallback') }}") == "fallback")
    assert(r("{% set v = var('nope') | default('dv') %}{{ v }}") == "dv")
    assert(r("{% set v = var('yes') | default('dv') %}{{ v }}", Map("yes" -> "real")) == "real")
    // boolean=true extends the rescue to falsy values (Jinja semantics)
    assert(r("{% set s = '' | default('x') %}{{ s }}") == "")
    assert(r("{% set s = '' | default('x', true) %}{{ s }}") == "x")
    // an unknown IDENTIFIER still errors — static-analysis philosophy
    intercept[IllegalArgumentException](r("{% set s = nosuch | default('x') %}{{ s }}"))
    // and an unknown filter names the supported set
    val e = intercept[IllegalArgumentException](r("{% set s = 'x' | frobnicate %}{{ s }}"))
    assert(e.getMessage.contains("unsupported filter"))
  }

  test("pipe filters: chaining, precedence, and {{ }} spans") {
    def r(t: String, vars: Map[String, String] = Map.empty) = ControlFlow.render(t, vars)
    // chaining left-to-right
    assert(r("{% set s = '  a-b  ' | trim | replace('-', '_') | upper %}{{ s }}") == "A_B")
    // real Jinja precedence: filters bind TIGHTER than arithmetic
    // ('a' + ('b'|upper)), looser than comparison ((x|length) > 1)
    assert(r("{% if ['a', 'b'] | length > 1 %}Y{% endif %}") == "Y")
    assert(r("{% set s = 'a' + 'b' | upper %}{{ s }}") == "aB")
    assert(r("{% set s = ('a' + 'b') | upper %}{{ s }}") == "AB")
    // inside {{ }} spans: env-bound heads, literals, loop vars, var()
    assert(r("{% set x = 'mixed Case' %}{{ x | upper }}") == "MIXED CASE")
    assert(r("{{ 'raw text' | title }}") == "Raw Text")
    assert(r("{% for c in ['x', 'y'] %}{{ c | upper }}{% endfor %}") == "XY")
    assert(r("{{ var('v') | upper | replace('A', '@') }}", Map("v" -> "data")) == "D@T@")
    // SQL || concat is never mistaken for a filter
    assert(r("{% set x = 'a' %}select {{ x }} || 'b' as c") == "select a || 'b' as c")
    assert(r("select col_a || col_b from t") == "select col_a || col_b from t")
    // a filtered list drives a for loop
    assert(r("{% for c in ['b', 'a'] | sort %}{{ c }}{% endfor %}") == "ab")
  }
}
