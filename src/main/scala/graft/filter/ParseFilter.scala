package graft.filter

/** The filter *language* — parses the reference's shell/REST/Thrift
  * filter-string grammar into a [[GFilter]] AST
  * (hbase-client/.../filter/ParseFilter.java:48; precedence
  * SKIP = WHILE > AND > OR, ParseFilter.java:90-93; registry of
  * constructible filters ParseFilter.java:57-85).
  *
  * Examples:
  * {{{
  *   PrefixFilter('000001') AND ValueFilter(=, 'substring:low')
  *   SKIP ValueFilter(=, 'binary:0')
  *   (RowFilter(>=, 'binary:a') OR PrefixFilter('b')) AND PageFilter(10)
  * }}}
  */
object ParseFilter {

  def parse(input: String): GFilter = {
    val p = new Parser(tokenize(input))
    val f = p.parseOr()
    p.expectEnd()
    f
  }

  // ----- lexer --------------------------------------------------------------

  sealed trait Tok
  case class TName(s: String)  extends Tok // filter name / AND / OR / SKIP / WHILE / bool
  case class TStr(s: String)   extends Tok // 'quoted' (with '' escape)
  case class TNum(v: Long)     extends Tok
  case class TOp(s: String)    extends Tok // comparison symbol
  case object TLParen          extends Tok
  case object TRParen          extends Tok
  case object TComma           extends Tok

  private def tokenize(s: String): Vector[Tok] = {
    val out = Vector.newBuilder[Tok]
    var i = 0
    while (i < s.length) {
      val c = s(i)
      if (c.isWhitespace) i += 1
      else if (c == '(') { out += TLParen; i += 1 }
      else if (c == ')') { out += TRParen; i += 1 }
      else if (c == ',') { out += TComma; i += 1 }
      else if (c == '\'') {
        val sb = new StringBuilder
        i += 1
        var done = false
        while (!done) {
          if (i >= s.length) throw new IllegalArgumentException(s"unterminated string in: $s")
          if (s(i) == '\'') {
            if (i + 1 < s.length && s(i + 1) == '\'') { sb += '\''; i += 2 } // '' escape
            else { done = true; i += 1 }
          } else { sb += s(i); i += 1 }
        }
        out += TStr(sb.toString)
      } else if (c == '<' || c == '>' || c == '=' || c == '!') {
        val two = if (i + 1 < s.length && s(i + 1) == '=') 2 else 1
        val sym = s.substring(i, i + two)
        if (sym == "!") throw new IllegalArgumentException(s"lone '!' at $i in: $s")
        out += TOp(sym); i += two
      } else if (c.isDigit || (c == '-' && i + 1 < s.length && s(i + 1).isDigit)) {
        val start = i
        i += 1
        while (i < s.length && s(i).isDigit) i += 1
        out += TNum(s.substring(start, i).toLong)
      } else if (c.isLetter) {
        val start = i
        while (i < s.length && (s(i).isLetterOrDigit || s(i) == '_')) i += 1
        out += TName(s.substring(start, i))
      } else throw new IllegalArgumentException(s"unexpected char '$c' at $i in: $s")
    }
    out.result()
  }

  // ----- parser (recursive descent; OR < AND < SKIP/WHILE) ------------------

  private final class Parser(toks: Vector[Tok]) {
    private var pos = 0
    private def peek: Option[Tok] = if (pos < toks.length) Some(toks(pos)) else None
    private def next(): Tok = {
      if (pos >= toks.length)
        throw new IllegalArgumentException("unexpected end of filter string")
      val t = toks(pos); pos += 1; t
    }
    private def expect(t: Tok): Unit = {
      if (peek.contains(t)) pos += 1
      else throw new IllegalArgumentException(s"expected $t at token $pos, got $peek")
    }
    def expectEnd(): Unit =
      if (pos != toks.length)
        throw new IllegalArgumentException(s"trailing tokens from position $pos: ${toks.drop(pos)}")

    def parseOr(): GFilter = {
      var l = parseAnd()
      while (peek.exists { case TName(n) => n.equalsIgnoreCase("OR"); case _ => false }) {
        next(); l = FilterList.or(l, parseAnd())
      }
      l
    }

    private def parseAnd(): GFilter = {
      var l = parseUnary()
      while (peek.exists { case TName(n) => n.equalsIgnoreCase("AND"); case _ => false }) {
        next(); l = FilterList.and(l, parseUnary())
      }
      l
    }

    private def parseUnary(): GFilter = peek match {
      case Some(TName(n)) if n.equalsIgnoreCase("SKIP")  => next(); SkipFilter(parseUnary())
      case Some(TName(n)) if n.equalsIgnoreCase("WHILE") => next(); WhileMatchFilter(parseUnary())
      case Some(TLParen) => next(); val f = parseOr(); expect(TRParen); f
      case Some(TName(_)) => parseCall()
      case other => throw new IllegalArgumentException(s"unexpected token $other")
    }

    private def parseCall(): GFilter = {
      val name = next().asInstanceOf[TName].s
      expect(TLParen)
      val args = Vector.newBuilder[Tok]
      var depth = 1
      while (depth > 0) {
        next() match {
          case TRParen if depth == 1 => depth = 0
          case TRParen               => depth -= 1; args += TRParen
          case TLParen               => depth += 1; args += TLParen
          case t                     => args += t
        }
      }
      construct(name, args.result().filterNot(_ == TComma))
    }
  }

  // ----- constructor registry (≅ ParseFilter.java:57-85) --------------------

  private def str(t: Tok): String = t match {
    case TStr(s) => s
    case other   => throw new IllegalArgumentException(s"expected string arg, got $other")
  }
  private def num(t: Tok): Long = t match {
    case TNum(v) => v
    case other   => throw new IllegalArgumentException(s"expected numeric arg, got $other")
  }
  private def bool(t: Tok): Boolean = t match {
    case TName(s) if s.equalsIgnoreCase("true")  => true
    case TName(s) if s.equalsIgnoreCase("false") => false
    case other => throw new IllegalArgumentException(s"expected bool arg, got $other")
  }
  private def op(t: Tok): CompareOp = t match {
    case TOp(s) => CompareOp.fromSymbol(s)
    case other  => throw new IllegalArgumentException(s"expected compare op, got $other")
  }

  /** 'binary:x' / 'binaryprefix:x' / 'regexstring:x' / 'substring:x' /
    * 'long:n' / 'null' (ParseFilter comparator syntax). */
  def comparator(spec: String): GComparator = {
    val idx = spec.indexOf(':')
    val (kind, arg) = if (idx < 0) (spec, "") else (spec.substring(0, idx), spec.substring(idx + 1))
    kind.toLowerCase(java.util.Locale.ROOT) match {
      case "binary"       => BinaryComparator(arg)
      case "binaryprefix" => BinaryPrefixComparator(arg)
      case "regexstring"  => RegexStringComparator(arg)
      case "substring"    => SubstringComparator(arg)
      case "long"         => LongComparator(arg.toLong)
      case "null"         => NullComparator()
      case other => throw new IllegalArgumentException(s"unknown comparator '$other'")
    }
  }

  private def construct(name: String, a: Vector[Tok]): GFilter = name match {
    case "KeyOnlyFilter"      => KeyOnlyFilter()
    case "FirstKeyOnlyFilter" => FirstKeyOnlyFilter()
    case "PrefixFilter"       => PrefixFilter(str(a(0)))
    case "ColumnPrefixFilter" => ColumnPrefixFilter(str(a(0)))
    case "MultipleColumnPrefixFilter" => MultipleColumnPrefixFilter(a.map(str))
    case "ColumnCountGetFilter"   => ColumnCountGetFilter(num(a(0)).toInt)
    case "PageFilter"             => PageFilter(num(a(0)).toInt)
    case "ColumnPaginationFilter" => ColumnPaginationFilter(num(a(0)).toInt, num(a(1)).toInt)
    case "InclusiveStopFilter"    => InclusiveStopFilter(str(a(0)))
    case "TimestampsFilter"       => TimestampsFilter(a.map(num))
    case "RowFilter"       => RowFilter(op(a(0)), comparator(str(a(1))))
    case "FamilyFilter"    => FamilyFilter(op(a(0)), comparator(str(a(1))))
    case "QualifierFilter" => QualifierFilter(op(a(0)), comparator(str(a(1))))
    case "ValueFilter"     => ValueFilter(op(a(0)), comparator(str(a(1))))
    case "ColumnRangeFilter" =>
      ColumnRangeFilter(str(a(0)), bool(a(1)), str(a(2)), bool(a(3)))
    case "ColumnValueFilter" =>
      ColumnValueFilter(str(a(0)), str(a(1)), op(a(2)), comparator(str(a(3))))
    case "SingleColumnValueFilter" =>
      SingleColumnValueFilter(str(a(0)), str(a(1)), op(a(2)), comparator(str(a(3))),
        filterIfMissing = a.lift(4).exists(bool),
        latestVersionOnly = a.lift(5).forall(bool))
    case "SingleColumnValueExcludeFilter" =>
      SingleColumnValueExcludeFilter(str(a(0)), str(a(1)), op(a(2)), comparator(str(a(3))),
        filterIfMissing = a.lift(4).exists(bool),
        latestVersionOnly = a.lift(5).forall(bool))
    case "DependentColumnFilter" =>
      if (a.length >= 5)
        DependentColumnFilter(str(a(0)), str(a(1)), bool(a(2)),
          Some((op(a(3)), comparator(str(a(4))))))
      else DependentColumnFilter(str(a(0)), str(a(1)), a.lift(2).exists(bool))
    case "RandomRowFilter" => RandomRowFilter(num(a(0)).toDouble / 100.0)
    case other => throw new IllegalArgumentException(s"unknown filter '$other'")
  }
}
