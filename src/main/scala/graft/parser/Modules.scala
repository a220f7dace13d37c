package graft.parser

import java.time.{LocalDate, LocalDateTime, ZoneOffset}
import scala.collection.immutable.ListMap

/** The `modules` context member (reference `core/dbt/context/base.py:630`
  * exposes Python's datetime/pytz/re/itertools to macros). This is the
  * scoped subset real dbt macros actually lean on — `modules.datetime`
  * (date/datetime/timedelta construction, now, strptime, strftime,
  * date arithmetic) and `modules.re` (match/search/fullmatch/sub/
  * findall/split/escape) — as parse-time callables in the ControlFlow
  * expression language, with postfix method/attribute chains
  * (`.strftime(…)`, `.group(1)`, `.year`) and `+`/`-` arithmetic
  * (datetime ± timedelta, datetime − datetime). Values print like
  * their Python `str()` so rendered SQL matches what the reference's
  * Jinja would emit.
  *
  * Semantics notes (documented divergence, all deterministic-friendly):
  * `now()`/`today()` read the real clock in UTC (Python's naive local
  * time is machine-dependent — UTC is the reproducible choice);
  * unknown strftime directives pass through literally rather than
  * raising.
  */
object Modules {

  /** Python str(date): ISO. */
  final case class PyDate(d: LocalDate) {
    override def toString: String = d.toString
  }

  /** Python str(datetime): "YYYY-MM-DD HH:MM:SS[.ffffff]". */
  final case class PyDateTime(dt: LocalDateTime) {
    override def toString: String = {
      val base = f"${dt.getYear}%04d-${dt.getMonthValue}%02d-${dt.getDayOfMonth}%02d " +
        f"${dt.getHour}%02d:${dt.getMinute}%02d:${dt.getSecond}%02d"
      val micros = dt.getNano / 1000
      if (micros == 0) base else f"$base.$micros%06d"
    }
  }

  /** Python timedelta, normalized to (days, positive sub-day micros). */
  final case class PyDelta(micros: Long) {
    def days: Long = Math.floorDiv(micros, 86400000000L)
    def subSeconds: Long = Math.floorMod(micros, 86400000000L) / 1000000L
    def subMicros: Long = Math.floorMod(micros, 1000000L)
    override def toString: String = {
      val d = days
      val rem = Math.floorMod(micros, 86400000000L)
      val (h, m, s, us) = (rem / 3600000000L, rem / 60000000L % 60,
        rem / 1000000L % 60, rem % 1000000L)
      val hms = f"$h:$m%02d:$s%02d" + (if (us == 0) "" else f".$us%06d")
      if (d == 0) hms
      else s"$d day${if (d == 1 || d == -1) "" else "s"}, $hms"
    }
  }

  /** Python re.Match: matched span + groups (null for non-participating). */
  final case class PyMatch(full: String, startPos: Long, endPos: Long,
      groupVals: List[String]) {
    override def toString: String =
      s"<re.Match span=($startPos, $endPos), match='$full'>"
  }

  def handles(name: String): Boolean = name.startsWith("modules.")

  /** Python-style argument binding: positionals first, then keywords by
    * parameter name (Python accepts `datetime(year=..., month=...,
    * day=...)`); missing required parameters raise the Python-shaped
    * "missing required argument" error instead of an opaque
    * DateTimeException from zero-padding.
    */
  private def positional(args: List[Any], kw: ListMap[String, Any],
      names: List[String], required: Int, what: String): List[Int] = {
    // Python raises TypeError for both of these — surfacing them at
    // parse time beats silently rendering midnight from a typo'd
    // kwarg (minutes= for minute=) or dropping a duplicate binding
    val unknown = kw.keys.filterNot(names.contains)
    require(unknown.isEmpty,
      s"$what got unexpected keyword argument${if (unknown.size > 1) "s" else ""}: " +
        unknown.mkString(", "))
    val dup = names.take(args.length).filter(kw.contains)
    require(dup.isEmpty,
      s"$what got multiple values for argument${if (dup.size > 1) "s" else ""}: " +
        dup.mkString(", "))
    val bound = names.zipWithIndex.map { case (n, i) =>
      if (i < args.length) Some(args(i)) else kw.get(n)
    }
    val missing = names.take(required).zip(bound).collect { case (n, None) => n }
    require(missing.isEmpty,
      s"$what missing required argument${if (missing.size > 1) "s" else ""}: ${missing.mkString(", ")}")
    // absent optionals default to 0 (Python's datetime defaults), so
    // `datetime(2026, 8, 14, second=30)` binds hour/minute to 0
    bound.map(_.map(asLong(_, what).toInt).getOrElse(0))
  }

  private def asLong(v: Any, what: String): Long = v match {
    case l: Long => l
    case d: Double if d == d.floor => d.toLong
    case other => throw new IllegalArgumentException(s"$what: expected int, got $other")
  }
  private def asNum(v: Any, what: String): Double = v match {
    case l: Long => l.toDouble
    case d: Double => d
    case other => throw new IllegalArgumentException(s"$what: expected number, got $other")
  }
  private def asStr(v: Any, what: String): String = v match {
    case s: String => s
    case other => throw new IllegalArgumentException(s"$what: expected string, got $other")
  }

  /** Dispatch `modules.…(args, kwargs)`. */
  def call(name: String, args: List[Any], kw: ListMap[String, Any]): Any = name match {
    case "modules.datetime.date" =>
      val p = positional(args, kw,
        List("year", "month", "day"), required = 3, name)
      PyDate(LocalDate.of(p(0), p(1), p(2)))
    case "modules.datetime.date.today" =>
      PyDate(LocalDate.now(ZoneOffset.UTC))
    case "modules.datetime.datetime" =>
      val p = positional(args, kw,
        List("year", "month", "day", "hour", "minute", "second", "microsecond"),
        required = 3, name).padTo(7, 0)
      PyDateTime(LocalDateTime.of(p(0), p(1), p(2), p(3), p(4), p(5), p(6) * 1000))
    case "modules.datetime.datetime.now" | "modules.datetime.datetime.utcnow" =>
      PyDateTime(LocalDateTime.now(ZoneOffset.UTC))
    case "modules.datetime.datetime.strptime" =>
      PyDateTime(Strptime.parse(asStr(args(0), name), asStr(args(1), name)))
    case "modules.datetime.timedelta" =>
      // positional order matches Python: days, seconds, microseconds,
      // milliseconds, minutes, hours, weeks
      val posNames = List("days", "seconds", "microseconds", "milliseconds",
        "minutes", "hours", "weeks")
      val all = posNames.zip(args).toMap ++ kw
      val unknown = all.keySet -- posNames.toSet
      require(unknown.isEmpty, s"timedelta: unknown argument(s) $unknown")
      val dup = posNames.take(args.length).filter(kw.contains)
      require(dup.isEmpty,
        s"timedelta got multiple values for argument${if (dup.size > 1) "s" else ""}: " +
          dup.mkString(", "))
      def g(n: String) = all.get(n).map(asNum(_, s"timedelta($n)")).getOrElse(0.0)
      PyDelta(Math.round(
        g("weeks") * 7 * 86400e6 + g("days") * 86400e6 + g("hours") * 3600e6 +
          g("minutes") * 60e6 + g("seconds") * 1e6 + g("milliseconds") * 1e3 +
          g("microseconds")))
    case "modules.re.match" => reMatch(args, anchored = true)
    case "modules.re.fullmatch" =>
      reMatch(args, anchored = true) match {
        case m: PyMatch if m.endPos == asStr(args(1), name).length => m
        case _ => null
      }
    case "modules.re.search" => reMatch(args, anchored = false)
    case "modules.re.sub" =>
      val Seq(p, repl, s) = args.take(3).toSeq
      val count = args.lift(3).map(asLong(_, name)).getOrElse(0L)
      val m = java.util.regex.Pattern.compile(asStr(p, name)).matcher(asStr(s, name))
      val jRepl = pyReplacement(asStr(repl, name))
      if (count <= 0L) m.replaceAll(jRepl)
      else {
        // Python's count arg: replace only the first `count` matches
        val sb = new java.lang.StringBuilder
        var done = 0L
        while (done < count && m.find()) { m.appendReplacement(sb, jRepl); done += 1 }
        m.appendTail(sb)
        sb.toString
      }
    case "modules.re.findall" =>
      val m = java.util.regex.Pattern.compile(asStr(args(0), name))
        .matcher(asStr(args(1), name))
      val out = List.newBuilder[Any]
      while (m.find()) out += (m.groupCount() match {
        case 0 => m.group(0)
        case 1 => m.group(1)
        case n => (1 to n).map(m.group).toList
      })
      out.result()
    case "modules.re.split" =>
      java.util.regex.Pattern.compile(asStr(args(0), name))
        .split(asStr(args(1), name), -1).toList
    case "modules.re.escape" =>
      asStr(args(0), name).flatMap(c =>
        if (c.isLetterOrDigit || c == '_') c.toString else s"\\$c")
    case "modules.itertools.chain" =>
      args.flatMap {
        case l: Seq[_] => l
        case s: String => s.toSeq.map(_.toString)
        case other => throw new IllegalArgumentException(s"chain: not iterable: $other")
      }
    case "modules.itertools.product" =>
      args.map {
        case l: Seq[_] => l
        case s: String => s.toSeq.map(_.toString)
        case other => throw new IllegalArgumentException(s"product: not iterable: $other")
      }.foldLeft(List(List.empty[Any]))((acc, l) =>
        acc.flatMap(tuple => l.map(x => tuple :+ x)))
    case "modules.itertools.combinations" =>
      val l = args.head match {
        case l0: Seq[_] => l0.toList
        case s: String => s.toSeq.map(_.toString).toList
        case other => throw new IllegalArgumentException(s"combinations: not iterable: $other")
      }
      val r = asLong(args(1), name).toInt
      // positional (Python) semantics: duplicate VALUES still yield
      // distinct combinations — combine indices, not values
      l.indices.combinations(r).map(idx => idx.map(l).toList).toList
    case other => throw new IllegalArgumentException(
      s"unsupported modules member: $other " +
        "(scoped to modules.datetime / modules.re / modules.itertools)")
  }

  private def reMatch(args: List[Any], anchored: Boolean): Any = {
    val m = java.util.regex.Pattern.compile(asStr(args(0), "re"))
      .matcher(asStr(args(1), "re"))
    val hit = if (anchored) m.lookingAt() else m.find()
    if (!hit) null
    else PyMatch(m.group(0), m.start(), m.end(),
      (1 to m.groupCount()).map(m.group).toList)
  }

  /** Python replacement syntax → Java: \1 → $1, \g<n> → ${n}, $ escaped. */
  private def pyReplacement(repl: String): String = {
    val sb = new StringBuilder
    var i = 0
    while (i < repl.length) {
      repl(i) match {
        case '$' => sb ++= "\\$"; i += 1
        case '\\' if i + 1 < repl.length =>
          repl(i + 1) match {
            case d if d.isDigit =>
              sb += '$'
              i += 1
              while (i < repl.length && repl(i).isDigit) { sb += repl(i); i += 1 }
            case 'g' if repl.startsWith("\\g<", i) =>
              val close = repl.indexOf('>', i + 3)
              require(close > 0, s"unterminated \\g<> in replacement: $repl")
              sb ++= "${" + repl.substring(i + 3, close) + "}"
              i = close + 1
            case '\\' => sb ++= "\\\\"; i += 2
            case 'n' => sb += '\n'; i += 2
            case 't' => sb += '\t'; i += 2
            case c => sb += c; i += 2
          }
        case c => sb += c; i += 1
      }
    }
    sb.toString
  }

  /** Postfix method call `value.name(args)`. */
  def method(target: Any, name: String, args: List[Any],
      kw: ListMap[String, Any]): Any = (target, name) match {
    case (PyDate(d), "strftime") => Strftime.format(d.atStartOfDay(), asStr(args.head, name))
    case (PyDate(d), "isoformat") => d.toString
    case (PyDate(d), "weekday") => (d.getDayOfWeek.getValue - 1).toLong // Mon=0
    case (PyDate(d), "replace") =>
      PyDate(LocalDate.of(
        kw.get("year").map(asLong(_, name).toInt).getOrElse(d.getYear),
        kw.get("month").map(asLong(_, name).toInt).getOrElse(d.getMonthValue),
        kw.get("day").map(asLong(_, name).toInt).getOrElse(d.getDayOfMonth)))
    case (PyDateTime(dt), "strftime") => Strftime.format(dt, asStr(args.head, name))
    case (PyDateTime(dt), "isoformat") =>
      val sep = args.headOption.map(asStr(_, name)).getOrElse("T")
      PyDateTime(dt).toString.replace(" ", sep)
    case (PyDateTime(dt), "date") => PyDate(dt.toLocalDate)
    case (PyDateTime(dt), "weekday") => (dt.getDayOfWeek.getValue - 1).toLong
    case (PyDateTime(dt), "replace") =>
      def f(n: String, cur: Int) = kw.get(n).map(asLong(_, name).toInt).getOrElse(cur)
      PyDateTime(LocalDateTime.of(f("year", dt.getYear), f("month", dt.getMonthValue),
        f("day", dt.getDayOfMonth), f("hour", dt.getHour), f("minute", dt.getMinute),
        f("second", dt.getSecond),
        kw.get("microsecond").map(asLong(_, name).toInt * 1000).getOrElse(dt.getNano)))
    case (pd: PyDelta, "total_seconds") => pd.micros / 1e6
    case (m: PyMatch, "group") =>
      val i = args.headOption.map(asLong(_, name)).getOrElse(0L)
      if (i == 0L) m.full else m.groupVals(i.toInt - 1)
    case (m: PyMatch, "groups") => m.groupVals
    case (m: PyMatch, "start") => m.startPos
    case (m: PyMatch, "end") => m.endPos
    case (m: PyMatch, "span") => List(m.startPos, m.endPos)
    case (s: String, "upper") => s.toUpperCase
    case (s: String, "lower") => s.toLowerCase
    case (s: String, "strip") => s.trim
    case (s: String, "title") => s.split(" ", -1).map(w =>
      if (w.isEmpty) w else w.head.toUpper + w.tail.toLowerCase).mkString(" ")
    case (s: String, "replace") =>
      s.replace(asStr(args(0), name), asStr(args(1), name))
    case (s: String, "split") =>
      if (args.isEmpty) s.trim.split("\\s+").toList.filter(_.nonEmpty)
      else s.split(java.util.regex.Pattern.quote(asStr(args.head, name)), -1).toList
    case (s: String, "startswith") => s.startsWith(asStr(args.head, name))
    case (s: String, "endswith") => s.endsWith(asStr(args.head, name))
    case (s: String, "join") => args.head match {
      case l: Seq[_] => l.map(ContextFuncs.show).mkString(s)
      case other => throw new IllegalArgumentException(s"join: not a list: $other")
    }
    case (m: Map[_, _], "get") =>
      m.asInstanceOf[Map[String, Any]]
        .getOrElse(String.valueOf(args.head), args.lift(1).orNull)
    case (m: Map[_, _], "keys") => m.keys.toList
    case (m: Map[_, _], "values") => m.values.toList
    case (t, n) => throw new IllegalArgumentException(
      s"no method '$n' on ${if (t == null) "None" else t.getClass.getSimpleName}")
  }

  /** Postfix attribute `value.name`. */
  def attr(target: Any, name: String): Any = (target, name) match {
    case (PyDate(d), "year") => d.getYear.toLong
    case (PyDate(d), "month") => d.getMonthValue.toLong
    case (PyDate(d), "day") => d.getDayOfMonth.toLong
    case (PyDateTime(dt), "year") => dt.getYear.toLong
    case (PyDateTime(dt), "month") => dt.getMonthValue.toLong
    case (PyDateTime(dt), "day") => dt.getDayOfMonth.toLong
    case (PyDateTime(dt), "hour") => dt.getHour.toLong
    case (PyDateTime(dt), "minute") => dt.getMinute.toLong
    case (PyDateTime(dt), "second") => dt.getSecond.toLong
    case (PyDateTime(dt), "microsecond") => (dt.getNano / 1000).toLong
    case (d: PyDelta, "days") => d.days
    case (d: PyDelta, "seconds") => d.subSeconds
    case (d: PyDelta, "microseconds") => d.subMicros
    case (m: Map[_, _], k) =>
      m.asInstanceOf[Map[String, Any]].getOrElse(k, null)
    case (t, n) => throw new IllegalArgumentException(
      s"no attribute '$n' on ${if (t == null) "None" else t.getClass.getSimpleName}")
  }

  /** Binary `+`/`-` — numbers, strings/lists (+), and the Python
    * datetime algebra (datetime ± timedelta, datetime − datetime).
    */
  def arith(op: Char, l: Any, r: Any): Any = (l, op, r) match {
    case (a: Long, '+', b: Long) => a + b
    case (a: Long, '-', b: Long) => a - b
    case (a: Double, '+', b: Double) => a + b
    case (a: Double, '-', b: Double) => a - b
    case (a: Long, _, b: Double) => arith(op, a.toDouble, b)
    case (a: Double, _, b: Long) => arith(op, a, b.toDouble)
    case (a: String, '+', b: String) => a + b
    case (a: Seq[_], '+', b: Seq[_]) => a ++ b
    case (PyDateTime(dt), '+', d: PyDelta) => PyDateTime(plusMicros(dt, d.micros))
    case (d: PyDelta, '+', PyDateTime(dt)) => PyDateTime(plusMicros(dt, d.micros))
    case (PyDateTime(dt), '-', d: PyDelta) => PyDateTime(plusMicros(dt, -d.micros))
    case (PyDate(a), '+', d: PyDelta) =>
      PyDate(plusMicros(a.atStartOfDay(), d.micros).toLocalDate)
    case (d: PyDelta, '+', PyDate(a)) =>
      PyDate(plusMicros(a.atStartOfDay(), d.micros).toLocalDate)
    case (PyDate(a), '-', d: PyDelta) =>
      PyDate(plusMicros(a.atStartOfDay(), -d.micros).toLocalDate)
    case (PyDateTime(a), '-', PyDateTime(b)) =>
      PyDelta(java.time.Duration.between(b, a).toNanos / 1000)
    case (PyDate(a), '-', PyDate(b)) =>
      PyDelta(java.time.temporal.ChronoUnit.DAYS.between(b, a) * 86400000000L)
    case (a: PyDelta, '+', b: PyDelta) => PyDelta(a.micros + b.micros)
    case (a: PyDelta, '-', b: PyDelta) => PyDelta(a.micros - b.micros)
    case _ => throw new IllegalArgumentException(
      s"unsupported operand types for $op: $l, $r")
  }

  private def plusMicros(dt: LocalDateTime, micros: Long): LocalDateTime =
    dt.plusNanos(micros * 1000) // sane deltas stay far under Long nanos

  /** Python strftime, hand-rolled over the common directives; unknown
    * directives pass through literally.
    */
  private[parser] object Strftime {
    private val days = Array("Monday", "Tuesday", "Wednesday", "Thursday",
      "Friday", "Saturday", "Sunday")
    private val months = Array("January", "February", "March", "April", "May",
      "June", "July", "August", "September", "October", "November", "December")

    def format(dt: LocalDateTime, fmt: String): String = {
      val sb = new StringBuilder
      var i = 0
      while (i < fmt.length) {
        if (fmt(i) == '%' && i + 1 < fmt.length) {
          fmt(i + 1) match {
            case 'Y' => sb ++= f"${dt.getYear}%04d"
            case 'y' => sb ++= f"${dt.getYear % 100}%02d"
            case 'm' => sb ++= f"${dt.getMonthValue}%02d"
            case 'd' => sb ++= f"${dt.getDayOfMonth}%02d"
            case 'H' => sb ++= f"${dt.getHour}%02d"
            case 'I' => sb ++= f"${(dt.getHour % 12 + 11) % 12 + 1}%02d"
            case 'M' => sb ++= f"${dt.getMinute}%02d"
            case 'S' => sb ++= f"${dt.getSecond}%02d"
            case 'f' => sb ++= f"${dt.getNano / 1000}%06d"
            case 'j' => sb ++= f"${dt.getDayOfYear}%03d"
            case 'p' => sb ++= (if (dt.getHour < 12) "AM" else "PM")
            case 'a' => sb ++= days(dt.getDayOfWeek.getValue - 1).take(3)
            case 'A' => sb ++= days(dt.getDayOfWeek.getValue - 1)
            case 'b' => sb ++= months(dt.getMonthValue - 1).take(3)
            case 'B' => sb ++= months(dt.getMonthValue - 1)
            case '%' => sb += '%'
            case other => sb += '%' += other
          }
          i += 2
        } else { sb += fmt(i); i += 1 }
      }
      sb.toString
    }
  }

  /** Python strptime over the same directive subset — the format is
    * compiled to a regex with one capture per directive, then fields
    * assemble with Python's defaults (1900-01-01 00:00:00).
    */
  private[parser] object Strptime {
    def parse(value: String, fmt: String): LocalDateTime = {
      val fields = List.newBuilder[Char]
      val rx = new StringBuilder
      var i = 0
      while (i < fmt.length) {
        if (fmt(i) == '%' && i + 1 < fmt.length) {
          val d = fmt(i + 1)
          d match {
            case 'Y' => rx ++= raw"(\d{4})"; fields += 'Y'
            case 'y' => rx ++= raw"(\d{2})"; fields += 'y'
            case 'm' | 'd' | 'H' | 'I' | 'M' | 'S' =>
              rx ++= raw"(\d{1,2})"; fields += d
            case 'f' => rx ++= raw"(\d{1,6})"; fields += 'f'
            case 'j' => rx ++= raw"(\d{1,3})"; fields += 'j'
            case 'p' => rx ++= raw"(AM|PM|am|pm)"; fields += 'p'
            case 'b' => rx ++= raw"([A-Za-z]{3})"; fields += 'b'
            case 'B' => rx ++= raw"([A-Za-z]+)"; fields += 'B'
            case 'a' => rx ++= raw"([A-Za-z]{3})"; fields += '_' // parsed, ignored
            case 'A' => rx ++= raw"([A-Za-z]+)"; fields += '_'
            case '%' => rx ++= "%"
            case other => throw new IllegalArgumentException(
              s"strptime: unsupported directive %$other")
          }
          i += 2
        } else { rx ++= java.util.regex.Pattern.quote(fmt(i).toString); i += 1 }
      }
      val m = java.util.regex.Pattern.compile(rx.toString).matcher(value)
      require(m.matches(), s"time data '$value' does not match format '$fmt'")
      var (year, month, day) = (1900, 1, 1)
      var (hour, minute, second, micro) = (0, 0, 0, 0)
      var (dayOfYear, pm) = (0, Option.empty[Boolean])
      val monthAbbr = Array("jan", "feb", "mar", "apr", "may", "jun", "jul",
        "aug", "sep", "oct", "nov", "dec")
      fields.result().zipWithIndex.foreach { case (f, idx) =>
        val g = m.group(idx + 1)
        f match {
          case 'Y' => year = g.toInt
          case 'y' => year = 1900 + g.toInt + (if (g.toInt < 69) 100 else 0) // Python pivot
          case 'm' => month = g.toInt
          case 'd' => day = g.toInt
          case 'H' | 'I' => hour = g.toInt
          case 'M' => minute = g.toInt
          case 'S' => second = g.toInt
          case 'f' => micro = (g + "0" * (6 - g.length)).toInt
          case 'j' => dayOfYear = g.toInt
          case 'p' => pm = Some(g.toLowerCase == "pm")
          case 'b' | 'B' =>
            val mi = monthAbbr.indexOf(g.toLowerCase.take(3))
            require(mi >= 0, s"strptime: bad month '$g'")
            month = mi + 1
          case '_' => // weekday name: validated by the regex, not used
        }
      }
      pm.foreach { isPm =>
        if (isPm && hour < 12) hour += 12
        if (!isPm && hour == 12) hour = 0
      }
      val base =
        if (dayOfYear > 0) LocalDate.ofYearDay(year, dayOfYear)
        else LocalDate.of(year, month, day)
      LocalDateTime.of(base, java.time.LocalTime.of(hour, minute, second, micro * 1000))
    }
  }
}
