package graft.cypher

import Ast._
import Lexer._

/** Recursive-descent parser for the Cypher subset. Mirrors the rule set of
  * the reference grammar (/root/reference/src/parser/cypher.pest) with
  * proper left-associative operator folding — the reference's AST builder
  * silently drops the tail of operator chains (builder.rs:573-618); we
  * don't replicate that bug (SURVEY.md §7.3).
  */
final class Parser(tokens: Vector[Tok]) {
  private var p = 0

  final case class ParseError(msg: String, pos: Int)
    extends RuntimeException(s"$msg (at offset $pos)")

  private def cur: Tok = tokens(p)
  private def advance(): Tok = { val t = tokens(p); p += 1; t }
  private def fail(msg: String): Nothing = throw ParseError(s"$msg, got $cur", cur.pos)

  private def isKw(k: String): Boolean = cur match { case Kw(v, _) => v == k; case _ => false }
  private def isOp(o: String): Boolean = cur match { case Op(v, _) => v == o; case _ => false }
  private def eatKw(k: String): Unit = if (isKw(k)) p += 1 else fail(s"expected $k")
  private def eatOp(o: String): Unit = if (isOp(o)) p += 1 else fail(s"expected '$o'")
  private def tryKw(k: String): Boolean = { if (isKw(k)) { p += 1; true } else false }
  private def tryOp(o: String): Boolean = { if (isOp(o)) { p += 1; true } else false }
  private def ident(): String = cur match {
    case Ident(v, _) => p += 1; v
    case k @ Kw(_, _) => p += 1; k.raw // allow keywords as prop names / labels
    case _ => fail("expected identifier")
  }

  /** Top-level entry guard: the clause loop stops at '}' for subquery
    * recursion, so the public parse must reject trailing tokens itself.
    */
  def requireEof(): Unit = cur match {
    case Eof(_) => ()
    case _ => fail("unexpected trailing input after query")
  }

  def parseQuery(): Query = {
    val clauses = Seq.newBuilder[Clause]
    var done = false
    while (!done) {
      cur match {
        case Kw("MATCH", _) | Kw("OPTIONAL", _) => clauses += parseMatch()
        case Kw("RETURN", _) => clauses += parseReturn()
        case Kw("WITH", _) => clauses += parseWith()
        case Kw("CREATE", _) => clauses += parseCreate()
        case Kw("MERGE", _) => clauses += parseMerge()
        case Kw("SET", _) => clauses += parseSet()
        case Kw("DELETE", _) | Kw("DETACH", _) => clauses += parseDelete()
        case Kw("UNWIND", _) => clauses += parseUnwind()
        case Kw("FOREACH", _) => clauses += parseForeach()
        case Kw("REMOVE", _) => clauses += parseRemove()
        case Kw("CALL", _) => clauses += parseCall()
        case Kw("UNION", _) => done = true
        // subquery close: CALL { <query> } recursion returns here; the
        // top-level entry rejects a stray '}' via its trailing-token check
        case Op("}", _) => done = true
        case Eof(_) => done = true
        case Op(";", _) => p += 1
        case _ => fail("expected clause keyword")
      }
    }
    val union =
      if (tryKw("UNION")) {
        val all = tryKw("ALL")
        Some((all, parseQuery()))
      } else None
    val q = Query(clauses.result(), union)
    if (q.clauses.isEmpty) fail("empty query")
    q
  }

  private def parseMatch(): Clause = {
    val optional = tryKw("OPTIONAL")
    eatKw("MATCH")
    // `p = shortestPath((a)-[..]->(b))` or bare `shortestPath(...)`: an
    // identifier in pattern position only occurs for this syntax (node
    // patterns start with '('), so one token of lookahead disambiguates
    def identAt(k: Int)(pred: String => Boolean): Boolean =
      tokens.lift(p + k) match { case Some(Ident(v, _)) => pred(v); case _ => false }
    def opAt(k: Int, o: String): Boolean =
      tokens.lift(p + k) match { case Some(Op(v, _)) => v == o; case _ => false }
    def isSp(v: String): Boolean =
      v.equalsIgnoreCase("shortestPath") || v.equalsIgnoreCase("allShortestPaths")
    val pathVar =
      if (identAt(0)(_ => true) && opAt(1, "=") && identAt(2)(isSp)) {
        val v = ident(); eatOp("="); Some(v)
      } else None
    if (identAt(0)(isSp) && opAt(1, "(")) {
      if (optional) fail("OPTIONAL MATCH shortestPath is not supported")
      val fn = ident(); eatOp("(")
      val pat = parsePathPat()
      eatOp(")")
      return ShortestPathClause(pathVar, pat,
        all = fn.equalsIgnoreCase("allShortestPaths"))
    }
    // plain path assignment (`MATCH p = (a)-[*..3]->(b)`): each pattern in
    // the comma list may bind its own path variable
    def parseAssignedPat(first: Option[String]): PathPat = {
      val pv = first.orElse {
        if (identAt(0)(_ => true) && opAt(1, "=")) {
          val v = ident(); eatOp("="); Some(v)
        } else None
      }
      parsePathPat().copy(pathVar = pv)
    }
    val pats = Seq.newBuilder[PathPat]
    pats += parseAssignedPat(pathVar)
    while (tryOp(",")) pats += parseAssignedPat(None)
    val where = if (tryKw("WHERE")) Some(parseExpr()) else None
    MatchClause(pats.result(), optional, where)
  }

  private def parsePathPat(): PathPat = {
    val start = parseNodePat()
    val hops = Seq.newBuilder[(RelPat, NodePat)]
    while (isOp("-") || isOp("<-")) {
      val rel = parseRelPat()
      val node = parseNodePat()
      hops += ((rel, node))
    }
    PathPat(start, hops.result())
  }

  private def parseNodePat(): NodePat = {
    eatOp("(")
    val variable = cur match {
      case Ident(v, _) => p += 1; Some(v)
      case _ => None
    }
    val labels = Seq.newBuilder[String]
    while (tryOp(":")) labels += ident()
    val props = if (isOp("{")) parsePropMap() else Nil
    eatOp(")")
    NodePat(variable, labels.result(), props)
  }

  /** -[r:T {..} *1..3]-> | <-[..]- | -[..]- | --> | <-- | -- */
  private def parseRelPat(): RelPat = {
    var dir: Dir = Dir.Both
    val leftArrow = isOp("<-")
    if (leftArrow) { eatOp("<-"); dir = Dir.In } else eatOp("-")
    var variable: Option[String] = None
    var types: Seq[String] = Nil
    var props: Seq[(String, Expr)] = Nil
    var varLength: Option[(Int, Int)] = None
    if (tryOp("[")) {
      cur match { case Ident(v, _) => p += 1; variable = Some(v); case _ => }
      if (tryOp(":")) {
        val ts = Seq.newBuilder[String]
        ts += ident()
        while (tryOp("|")) { tryOp(":"); ts += ident() }
        types = ts.result()
      }
      // `*range` and `{props}` accepted in either order
      var more = true
      while (more) {
        more = false
        if (varLength.isEmpty && tryOp("*")) {
          val lo = cur match { case IntTok(v, _) => p += 1; v.toInt; case _ => 1 }
          val hi =
            if (tryOp("..")) cur match {
              case IntTok(v, _) => p += 1; v.toInt
              case _ => lo.max(10) // open upper bound: default cap 10 (reference default max_length 10, vle.rs:68)
            } else lo
          varLength = Some((lo, hi))
          more = true
        }
        if (props.isEmpty && isOp("{")) { props = parsePropMap(); more = true }
      }
      eatOp("]")
    }
    val rightArrow = isOp("->")
    if (rightArrow) { eatOp("->"); dir = if (leftArrow) Dir.Both else Dir.Out }
    else eatOp("-")
    RelPat(variable, types, props, dir, varLength)
  }

  private def parsePropMap(): Seq[(String, Expr)] = {
    eatOp("{")
    val entries = Seq.newBuilder[(String, Expr)]
    if (!isOp("}")) {
      def entry(): Unit = { val k = ident(); eatOp(":"); entries += ((k, parseExpr())) }
      entry()
      while (tryOp(",")) entry()
    }
    eatOp("}")
    entries.result()
  }

  private def parseReturnItems(): (Boolean, Boolean, Seq[ReturnItem]) = {
    val distinct = tryKw("DISTINCT")
    // `*` projects every named scope variable; `*, extra` appends items
    val star = tryOp("*")
    val items = Seq.newBuilder[ReturnItem]
    def item(): Unit = {
      val e = parseExpr()
      val alias = if (tryKw("AS")) Some(ident()) else None
      items += ReturnItem(e, alias)
    }
    if (!star) { item(); while (tryOp(",")) item() }
    else while (tryOp(",")) item()
    (distinct, star, items.result())
  }

  private def parseOrderSkipLimit(): (Seq[OrderItem], Option[Long], Option[Long]) = {
    val order = Seq.newBuilder[OrderItem]
    if (tryKw("ORDER")) {
      eatKw("BY")
      def oitem(): Unit = {
        val e = parseExpr()
        val asc = if (tryKw("DESC")) false else { tryKw("ASC"); true }
        order += OrderItem(e, asc)
      }
      oitem()
      while (tryOp(",")) oitem()
    }
    val skip = if (tryKw("SKIP")) Some(intLit()) else None
    val limit = if (tryKw("LIMIT")) Some(intLit()) else None
    (order.result(), skip, limit)
  }

  private def intLit(): Long = cur match {
    case IntTok(v, _) => p += 1; v
    case _ => fail("expected integer literal")
  }

  private def parseReturn(): ReturnClause = {
    eatKw("RETURN")
    val (distinct, star, items) = parseReturnItems()
    val (order, skip, limit) = parseOrderSkipLimit()
    ReturnClause(distinct, items, order, skip, limit, star)
  }

  private def parseWith(): WithClause = {
    eatKw("WITH")
    val (distinct, star, items) = parseReturnItems()
    val (order, skip, limit) = parseOrderSkipLimit()
    val where = if (tryKw("WHERE")) Some(parseExpr()) else None
    WithClause(distinct, items, order, skip, limit, where, star)
  }

  private def parseCreate(): CreateClause = {
    eatKw("CREATE")
    val pats = Seq.newBuilder[PathPat]
    pats += parsePathPat()
    while (tryOp(",")) pats += parsePathPat()
    CreateClause(pats.result())
  }

  /** MERGE <pattern> [ON CREATE SET ...] [ON MATCH SET ...] — the two
    * branches may appear in either order, each at most once.
    */
  private def parseMerge(): MergeClause = {
    eatKw("MERGE")
    val pat = parsePathPat()
    var onCreate: Option[SetClause] = None
    var onMatch: Option[SetClause] = None
    while (isKw("ON")) {
      p += 1
      cur match {
        case Kw("CREATE", _) =>
          p += 1
          if (onCreate.nonEmpty) fail("duplicate ON CREATE SET")
          onCreate = Some(parseSet())
        case Kw("MATCH", _) =>
          p += 1
          if (onMatch.nonEmpty) fail("duplicate ON MATCH SET")
          onMatch = Some(parseSet())
        case _ => fail("expected CREATE or MATCH after ON")
      }
    }
    MergeClause(pat, onCreate, onMatch)
  }

  private def parseSet(): SetClause = {
    eatKw("SET")
    val items = Seq.newBuilder[SetItem]
    def item(): Unit = {
      val v = ident()
      val path = Seq.newBuilder[String]
      while (tryOp(".")) path += ident()
      val ps = path.result()
      // SET n += {k: v, ...}: the literal-map merge form desugars to one
      // SetItem per entry — identical semantics (existing keys overwrite,
      // others keep) with zero new planner surface. Non-literal maps and
      // the replace-all form `SET n = {map}` stay loud errors.
      if (ps.isEmpty && tryOp("+")) {
        eatOp("=")
        parseExpr() match {
          case MapLit(entries) if entries.nonEmpty =>
            entries.foreach { case (k, ve) => items += SetItem(v, Seq(k), ve) }
          case MapLit(_) => fail("SET += needs a non-empty map literal")
          case _ => fail("SET += supports map literals only")
        }
      } else {
        eatOp("=")
        items += SetItem(v, ps, parseExpr())
      }
    }
    item()
    while (tryOp(",")) item()
    SetClause(items.result())
  }

  private def parseDelete(): DeleteClause = {
    val detach = tryKw("DETACH")
    eatKw("DELETE")
    val vars = Seq.newBuilder[String]
    vars += ident()
    while (tryOp(",")) vars += ident()
    DeleteClause(vars.result(), detach)
  }

  private def parseUnwind(): UnwindClause = {
    eatKw("UNWIND")
    val e = parseExpr()
    eatKw("AS")
    UnwindClause(e, ident())
  }

  /** CALL ns.name(args) [YIELD a [AS b], ...] [WHERE expr] */
  private def parseCall(): Clause = {
    eatKw("CALL")
    if (tryOp("{")) {
      val inner = parseQuery()
      eatOp("}")
      return CallSubqueryClause(inner)
    }
    val name = Seq.newBuilder[String]
    name += ident()
    while (tryOp(".")) name += ident()
    eatOp("(")
    val args = Seq.newBuilder[Expr]
    if (!isOp(")")) {
      args += parseExpr()
      while (tryOp(",")) args += parseExpr()
    }
    eatOp(")")
    val yields = Seq.newBuilder[(String, Option[String])]
    if (tryKw("YIELD")) {
      def item(): (String, Option[String]) = {
        val c = ident()
        (c, if (tryKw("AS")) Some(ident()) else None)
      }
      yields += item()
      while (tryOp(",")) yields += item()
    }
    val where = if (tryKw("WHERE")) Some(parseExpr()) else None
    CallClause(name.result().mkString("."), args.result(), yields.result(), where)
  }

  /** FOREACH (x IN <expr> | <update clauses>) — body restricted to update
    * clauses (openCypher rule; a read clause inside the loop has no
    * defined cardinality semantics).
    */
  private def parseForeach(): ForeachClause = {
    eatKw("FOREACH")
    eatOp("(")
    val v = ident()
    eatKw("IN")
    val list = parseExpr()
    eatOp("|")
    val updates = Seq.newBuilder[Clause]
    var done = false
    while (!done) {
      cur match {
        case Kw("CREATE", _) => updates += parseCreate()
        case Kw("MERGE", _) => updates += parseMerge()
        case Kw("SET", _) => updates += parseSet()
        case Kw("DELETE", _) | Kw("DETACH", _) => updates += parseDelete()
        case Kw("REMOVE", _) => updates += parseRemove()
        case Kw("FOREACH", _) => updates += parseForeach()
        case Op(")", _) => done = true
        case _ => fail("FOREACH body allows only CREATE/MERGE/SET/DELETE/REMOVE/FOREACH")
      }
    }
    eatOp(")")
    val us = updates.result()
    if (us.isEmpty) fail("empty FOREACH body")
    ForeachClause(v, list, us)
  }

  private def parseRemove(): RemoveClause = {
    eatKw("REMOVE")
    val items = Seq.newBuilder[(String, Seq[String])]
    def item(): Unit = {
      val v = ident()
      val path = Seq.newBuilder[String]
      while (tryOp(".")) path += ident()
      val ps = path.result()
      if (ps.isEmpty) fail("REMOVE needs a property path (labels are fixed in this store)")
      items += ((v, ps))
    }
    item()
    while (tryOp(",")) item()
    RemoveClause(items.result())
  }

  // ---- expressions (precedence climbing) ----
  def parseExpr(): Expr = parseOr()

  private def parseOr(): Expr = {
    var l = parseXor()
    while (tryKw("OR")) l = Bin("OR", l, parseXor())
    l
  }
  private def parseXor(): Expr = {
    var l = parseAnd()
    while (tryKw("XOR")) l = Bin("XOR", l, parseAnd())
    l
  }
  private def parseAnd(): Expr = {
    var l = parseNot()
    while (tryKw("AND")) l = Bin("AND", l, parseNot())
    l
  }
  private def parseNot(): Expr =
    if (tryKw("NOT")) Un("NOT", parseNot()) else parseComparison()

  private def parseComparison(): Expr = {
    var l = parseAdditive()
    var done = false
    while (!done) {
      if (isOp("=") || isOp("<>") || isOp("!=") || isOp("<") || isOp(">") ||
        isOp("<=") || isOp(">=") || isOp("=~")) {
        val op = advance().asInstanceOf[Op].v
        l = Bin(if (op == "!=") "<>" else op, l, parseAdditive())
      } else if (isKw("IS")) {
        p += 1
        val neg = tryKw("NOT")
        eatKw("NULL")
        l = IsNull(l, neg)
      } else if (isKw("IN")) {
        p += 1
        l = InList(l, parseAdditive(), negated = false)
      } else if (isKw("STARTS")) {
        p += 1; eatKw("WITH"); l = Bin("STARTS WITH", l, parseAdditive())
      } else if (isKw("ENDS")) {
        p += 1; eatKw("WITH"); l = Bin("ENDS WITH", l, parseAdditive())
      } else if (isKw("CONTAINS")) {
        p += 1; l = Bin("CONTAINS", l, parseAdditive())
      } else done = true
    }
    l
  }

  private def parseAdditive(): Expr = {
    var l = parseMultiplicative()
    while (isOp("+") || isOp("-")) {
      val op = advance().asInstanceOf[Op].v
      l = Bin(op, l, parseMultiplicative())
    }
    l
  }
  private def parseMultiplicative(): Expr = {
    var l = parseUnary()
    while (isOp("*") || isOp("/") || isOp("%") || isOp("^")) {
      val op = advance().asInstanceOf[Op].v
      l = Bin(op, l, parseUnary())
    }
    l
  }
  private def parseUnary(): Expr =
    if (tryOp("-")) Un("-", parseUnary())
    else if (tryOp("+")) parseUnary()
    else parsePostfix()

  private def parsePostfix(): Expr = {
    var e = parseAtom()
    // map projection: `n {.prop, .*, key: expr}` — a `{` directly after a
    // variable is never a map literal (those only start an atom)
    e match {
      case Variable(v) if isOp("{") => e = parseMapProjection(v)
      case _ =>
    }
    var done = false
    while (!done) {
      if (tryOp(".")) e = Prop(e, ident())
      else if (tryOp("[")) { e = Index(e, parseExpr()); eatOp("]") }
      else done = true
    }
    e
  }

  private def parseMapProjection(v: String): Expr = {
    eatOp("{")
    val items = Seq.newBuilder[MapProjItem]
    def item(): Unit =
      if (tryOp(".")) {
        if (tryOp("*")) items += MapProjAll
        else items += MapProjProp(ident())
      } else {
        val k = ident()
        eatOp(":")
        items += MapProjKV(k, parseExpr())
      }
    if (!isOp("}")) { item(); while (tryOp(",")) item() }
    eatOp("}")
    MapProjection(v, items.result())
  }

  private def parseAtom(): Expr = cur match {
    case Kw("NULL", _) => p += 1; NullLit
    case Kw("TRUE", _) => p += 1; BoolLit(true)
    case Kw("FALSE", _) => p += 1; BoolLit(false)
    case Kw("CASE", _) => parseCase()
    case IntTok(v, _) => p += 1; IntLit(v)
    case FloatTok(v, _) => p += 1; FloatLit(v)
    case StrTok(v, _) => p += 1; StrLit(v)
    case ParamTok(v, _) => p += 1; Param(v)
    // ALL is a lexer keyword (UNION ALL) but also the list quantifier
    // all(x IN l WHERE p) — a following `(` disambiguates
    case Kw("ALL", _) if p + 1 < tokens.length && tokens(p + 1).isInstanceOf[Op]
        && tokens(p + 1).asInstanceOf[Op].v == "(" =>
      p += 1
      parseListPred("all")
    case Ident(name, _) =>
      p += 1
      if (isOp("(")) {
        if (name.equalsIgnoreCase("exists")) parseExists()
        else if (name.equalsIgnoreCase("reduce")) parseReduce()
        else if (Seq("any", "all", "none", "single").exists(name.equalsIgnoreCase))
          parseListPred(name.toLowerCase)
        else parseFnCall(name)
      } else if (name.equalsIgnoreCase("count") && isOp("{")) parseCountSub()
      else if (name.equalsIgnoreCase("exists") && isOp("{")) parseExistsSub()
      else Variable(name)
    case Op("(", _) => p += 1; val e = parseExpr(); eatOp(")"); e
    case Op("[", _) =>
      p += 1
      // `[x IN ...]` is a list comprehension, not a literal — the two-token
      // lookahead (identifier then IN) disambiguates, like openCypher
      (cur, if (p + 1 < tokens.length) tokens(p + 1) else tokens.last) match {
        case (Ident(v, _), Kw("IN", _)) =>
          p += 2
          val listE = parseExpr()
          val whereE = if (tryKw("WHERE")) Some(parseExpr()) else None
          val projE = if (tryOp("|")) Some(parseExpr()) else None
          eatOp("]")
          ListComp(v, listE, whereE, projE)
        case _ =>
          // `[(a)-[:T]->(b) WHERE p | e]` is a pattern comprehension; a
          // leading `(` is ambiguous with a parenthesized first list
          // element, so the pattern parse is attempted with backtracking
          // (the parseExists shape) and must see at least one hop AND the
          // mandatory `| proj` (after an optional WHERE) to commit
          patternCompTail().getOrElse {
            val items = Seq.newBuilder[Expr]
            if (!isOp("]")) { items += parseExpr(); while (tryOp(",")) items += parseExpr() }
            eatOp("]")
            ListLit(items.result())
          }
      }
    case Op("{", _) => MapLit(parsePropMap())
    case _ => fail("expected expression atom")
  }

  /** Body of a pattern comprehension, cursor just past the `[`. Returns
    * None (cursor restored) when the bracket is really a list literal.
    */
  private def patternCompTail(): Option[Expr] = {
    if (!isOp("(")) return None
    val save = p
    try {
      val pp = parsePathPat()
      if (pp.hops.isEmpty) { p = save; return None }
      val whereE = if (tryKw("WHERE")) Some(parseExpr()) else None
      if (!tryOp("|")) { p = save; return None }
      val projE = parseExpr()
      eatOp("]")
      Some(PatternComp(pp, whereE, projE))
    } catch { case _: ParseError => p = save; None }
  }

  /** COUNT { (a)-[:T]->(b) [WHERE pred] } — the modern openCypher COUNT
    * subquery, pattern form only (no full inner MATCH statement).
    */
  private def parseCountSub(): Expr = {
    eatOp("{")
    tryKw("MATCH") // the full-statement spelling COUNT { MATCH ... }
    val pp = parsePathPat()
    val whereE = if (tryKw("WHERE")) Some(parseExpr()) else None
    eatOp("}")
    CountSub(pp, whereE)
  }

  /** `EXISTS { [MATCH] (a)-[:T]->(b) [WHERE pred] }` — the modern
    * openCypher existential subquery (braces form). Single pattern +
    * predicate only; a multi-clause inner query fails loudly at the '}'.
    */
  private def parseExistsSub(): Expr = {
    eatOp("{")
    tryKw("MATCH")
    val pp = parsePathPat()
    val whereE = if (tryKw("WHERE")) Some(parseExpr()) else None
    eatOp("}")
    PatternPred(pp, whereE)
  }

  /** reduce(acc = init, x IN list | body) — openCypher fold syntax. */
  private def parseReduce(): Expr = {
    eatOp("(")
    val acc = ident()
    eatOp("=")
    val init = parseExpr()
    eatOp(",")
    val v = ident()
    eatKw("IN")
    val listE = parseExpr()
    eatOp("|")
    val body = parseExpr()
    eatOp(")")
    ReduceExpr(acc, init, v, listE, body)
  }

  /** any/all/none/single(x IN list WHERE pred) — the WHERE is mandatory
    * in the quantifier forms (openCypher grammar).
    */
  private def parseListPred(kind: String): Expr = {
    eatOp("(")
    val v = ident()
    eatKw("IN")
    val listE = parseExpr()
    eatKw("WHERE")
    val pred = parseExpr()
    eatOp(")")
    ListPred(kind, v, listE, pred)
  }

  private def parseFnCall(name: String): Expr = {
    eatOp("(")
    if (name.equalsIgnoreCase("count") && tryOp("*")) {
      eatOp(")")
      return CountStar
    }
    val distinct = tryKw("DISTINCT")
    val args = Seq.newBuilder[Expr]
    if (!isOp(")")) { args += parseExpr(); while (tryOp(",")) args += parseExpr() }
    eatOp(")")
    // keep the user's spelling: un-aliased RETURN column names carry it
    // (reference get_return_key); dispatch lowercases at the match sites
    FnCall(name, args.result(), distinct)
  }

  /** EXISTS(...) — two openCypher forms share the name: the pattern
    * predicate `EXISTS((a)-[:T]->(b))` and the legacy property/value test
    * `EXISTS(n.prop)` (≡ IS NOT NULL). A `(` that starts a node pattern is
    * ambiguous with a parenthesized expression, so the pattern parse is
    * attempted with backtracking; a "pattern" with no hops (`EXISTS((a))`)
    * is really the value form and reparses as an expression.
    */
  private def parseExists(): Expr = {
    eatOp("(")
    val save = p
    val pat: Option[PathPat] =
      if (isOp("(")) {
        try {
          val pp = parsePathPat()
          if (pp.hops.nonEmpty) Some(pp) else { p = save; None }
        } catch { case _: ParseError => p = save; None }
      } else None
    pat match {
      case Some(pp) => eatOp(")"); PatternPred(pp)
      case None =>
        val e = parseExpr(); eatOp(")"); IsNull(e, negated = true)
    }
  }

  private def parseCase(): Expr = {
    eatKw("CASE")
    // simple CASE (CASE e WHEN v ...) folded into generic by rewriting to e = v
    val subject: Option[Expr] = if (!isKw("WHEN")) Some(parseExpr()) else None
    val whens = Seq.newBuilder[(Expr, Expr)]
    while (tryKw("WHEN")) {
      val w0 = parseExpr()
      val w = subject.map(sub => Bin("=", sub, w0)).getOrElse(w0)
      eatKw("THEN")
      whens += ((w, parseExpr()))
    }
    val otherwise = if (tryKw("ELSE")) Some(parseExpr()) else None
    eatKw("END")
    CaseExpr(whens.result(), otherwise)
  }
}

object Parser {
  def parse(cypher: String): Ast.Query = {
    val p = new Parser(Lexer.tokenize(cypher))
    val q = p.parseQuery()
    p.requireEof()
    q
  }

  def parseExpression(s: String): Ast.Expr =
    new Parser(Lexer.tokenize(s)).parseExpr()
}
