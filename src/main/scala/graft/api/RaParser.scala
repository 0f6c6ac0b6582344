package graft.api

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.{col, lit}

/** Parser for the reference's relational-algebra TEXT syntax (the radb
  * dialect accepted by `run_radb_query_in_spark`,
  * `ra2spark/ra2spark.py:107-118`, grammar exercised in
  * `tests/test_ra2mr.py:144-273`):
  *
  * {{{
  *   expr    := term ( \join_{cond} term | \cross term )*      // left-assoc
  *   term    := \select_{cond} term
  *            | \project_{attrs} term
  *            | \rename_{New: *} term | \rename_{New: (a, b)} term
  *            | '(' expr ')' | RelName
  *   cond    := cmp ( and cmp )* ; cmp := operand (= <> != <= >= < >) operand
  *   operand := [Rel.]attr | 'string' | number
  * }}}
  *
  * The parser only LOWERS: every construct maps 1:1 onto a [[Relation]]
  * combinator (σ→select, π→project-with-dedup, ρ→rename/alias, ⨝→join,
  * ×→cross), so the plan Catalyst sees is identical to the one the
  * combinator door produces — pushdown, join selection, and dedup
  * placement all still belong to the optimizer, not this front door.
  * A trailing `;` (radb statement terminator) is accepted and ignored.
  */
object RaParser {

  /** Parse `query` and lower it onto `scan` (relation name → [[Relation]],
    * normally `Engine.scan`). Throws IllegalArgumentException with the
    * offending position on malformed input.
    */
  def parse(query: String, scan: String => Relation): Relation =
    new P(tokenize(query), scan).parseAll()

  // ── tokens ────────────────────────────────────────────────────────────
  private sealed trait Tok
  private case class RaOp(name: String, payload: String) extends Tok
  private case object LParen extends Tok
  private case object RParen extends Tok
  private case class Ident(name: String) extends Tok

  private def tokenize(q: String): List[Tok] = {
    val toks = List.newBuilder[Tok]
    var i = 0
    def err(msg: String): Nothing =
      throw new IllegalArgumentException(s"RA parse error at $i: $msg in: $q")
    while (i < q.length) {
      val c = q.charAt(i)
      if (c.isWhitespace || c == ';') i += 1
      else if (c == '(') { toks += LParen; i += 1 }
      else if (c == ')') { toks += RParen; i += 1 }
      else if (c == '\\') {
        i += 1
        val start = i
        while (i < q.length && q.charAt(i).isLetter) i += 1
        val name = q.substring(start, i)
        if (name.isEmpty) err("operator name expected after \\")
        // optional _{payload}; \cross has none
        while (i < q.length && q.charAt(i).isWhitespace) i += 1
        var payload = ""
        if (i < q.length && q.charAt(i) == '_') {
          i += 1
          while (i < q.length && q.charAt(i).isWhitespace) i += 1
          if (i >= q.length || q.charAt(i) != '{') err(s"expected { after \\${name}_")
          i += 1
          val p0 = i
          var inStr = false
          while (i < q.length && (inStr || q.charAt(i) != '}')) {
            if (q.charAt(i) == '\'') inStr = !inStr
            i += 1
          }
          if (i >= q.length) err(s"unterminated { for \\$name")
          payload = q.substring(p0, i)
          i += 1
        }
        toks += RaOp(name, payload)
      } else if (c.isLetter || c == '_') {
        val start = i
        while (i < q.length &&
          (q.charAt(i).isLetterOrDigit || q.charAt(i) == '_')) i += 1
        toks += Ident(q.substring(start, i))
      } else err(s"unexpected character '$c'")
    }
    toks.result()
  }

  // ── recursive descent ─────────────────────────────────────────────────
  private final class P(var toks: List[Tok], scan: String => Relation) {

    private def fail(msg: String): Nothing =
      throw new IllegalArgumentException(
        s"RA parse error: $msg (remaining: ${toks.take(3).mkString(" ")})")

    def parseAll(): Relation = {
      val r = expr()
      if (toks.nonEmpty) fail("trailing input")
      r
    }

    /** Left-associative \join / \cross chain. */
    private def expr(): Relation = {
      var left = term()
      var done = false
      while (!done) toks match {
        case RaOp("join", cond) :: rest =>
          toks = rest; left = left.join(term(), condition(cond))
        case RaOp("cross", _) :: rest =>
          toks = rest; left = left.cross(term())
        case _ => done = true
      }
      left
    }

    /** Unary-prefix chain over a primary. */
    private def term(): Relation = toks match {
      case RaOp("select", cond) :: rest =>
        toks = rest; term().select(condition(cond))
      case RaOp("project", attrs) :: rest =>
        toks = rest
        val names = attrs.split(',').map(_.trim).filter(_.nonEmpty).toSeq
        if (names.isEmpty) fail("\\project needs at least one attribute")
        term().project(names: _*)
      case RaOp("rename", payload) :: rest =>
        toks = rest
        payload.split(":", 2) match {
          case Array(rel, spec) =>
            val target = spec.trim
            if (target == "*") term().rename(rel.trim)
            else {
              val names = target.stripPrefix("(").stripSuffix(")")
                .split(',').map(_.trim).filter(_.nonEmpty).toSeq
              term().rename(rel.trim, names)
            }
          case _ => fail(s"\\rename payload must be 'New: *': $payload")
        }
      case RaOp(other, _) :: _ => fail(s"unexpected operator \\$other")
      case LParen :: rest =>
        toks = rest
        val r = expr()
        toks match {
          case RParen :: rest2 => toks = rest2; r
          case _               => fail("expected )")
        }
      case Ident(rel) :: rest => toks = rest; scan(rel)
      case _                  => fail("expected a relation")
    }
  }

  // ── condition payload → Column ────────────────────────────────────────
  // radb conditions are conjunctions of comparisons
  // (`sql2ra/functionality.py:76`); we accept the full comparator set.
  private val cmpOps = Seq("<=", ">=", "<>", "!=", "=", "<", ">")

  private[api] def condition(payload: String): Column = {
    val cmps = splitTop(payload)
    if (cmps.isEmpty)
      throw new IllegalArgumentException("empty condition payload")
    cmps.map(comparison).reduce(_ && _)
  }

  /** Split on word-boundary `and` outside quotes. */
  private def splitTop(s: String): Seq[String] = {
    val parts = List.newBuilder[String]
    val cur = new StringBuilder
    var inStr = false
    var i = 0
    while (i < s.length) {
      if (!inStr && i + 3 <= s.length &&
        s.substring(i, i + 3).equalsIgnoreCase("and") &&
        (i == 0 || !s.charAt(i - 1).isLetterOrDigit) &&
        (i + 3 == s.length || !s.charAt(i + 3).isLetterOrDigit)) {
        parts += cur.result(); cur.clear(); i += 3
      } else {
        if (s.charAt(i) == '\'') inStr = !inStr
        cur += s.charAt(i); i += 1
      }
    }
    parts += cur.result()
    parts.result().map(_.trim).filter(_.nonEmpty)
  }

  private def comparison(s: String): Column = {
    // find the comparator outside quotes; longest ops first so <= wins over <
    var inStr = false
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '\'') inStr = !inStr
      else if (!inStr) cmpOps.find(op => s.startsWith(op, i)) match {
        case Some(op) =>
          val l = operand(s.substring(0, i).trim)
          val r = operand(s.substring(i + op.length).trim)
          return op match {
            case "="          => l === r
            case "<>" | "!="  => l =!= r
            case "<"          => l < r
            case "<="         => l <= r
            case ">"          => l > r
            case ">="         => l >= r
          }
        case None => ()
      }
      i += 1
    }
    throw new IllegalArgumentException(s"no comparator in condition: $s")
  }

  private def operand(s: String): Column =
    if (s.isEmpty)
      throw new IllegalArgumentException("empty operand in condition")
    else if (s.head == '\'' && s.last == '\'' && s.length >= 2)
      lit(s.substring(1, s.length - 1))
    else if (s.head.isDigit || s.head == '-' || s.head == '.')
      lit(scala.util.Try(s.toLong).map(Long.box)
        .getOrElse(Double.box(s.toDouble)))
    else col(s) // bare or Rel.attr-qualified attribute
}
