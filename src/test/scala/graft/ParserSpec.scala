package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen

import graft.cypher.{Ast, Lexer, Parser}
import graft.model.Graphid

/** Parser unit tests + property tests the reference lacks (SURVEY.md §5):
  * operator-chain folding (the reference's builder drops chain tails),
  * precedence, error reporting, and Graphid roundtrips.
  */
class ParserSpec extends AnyFunSuite {

  /** Plain-ScalaCheck property driver (scalatestplus is not on the offline
    * classpath): run f over n generator samples.
    */
  private def forSamples[A](g: Gen[A], n: Int = 200)(f: A => Unit): Unit =
    (0 until n).foreach(_ => g.sample.foreach(f))

  import Ast._

  def expr(s: String): Expr = Parser.parseExpression(s)

  test("left-assoc chain folding (reference bug not replicated)") {
    // reference's builder silently drops `+ c` (builder.rs:573-618)
    assert(expr("1 + 2 + 3") ==
      Bin("+", Bin("+", IntLit(1), IntLit(2)), IntLit(3)))
    assert(expr("10 - 2 - 3") ==
      Bin("-", Bin("-", IntLit(10), IntLit(2)), IntLit(3)))
  }

  test("precedence: * binds tighter than +, comparisons above AND/OR") {
    assert(expr("1 + 2 * 3") == Bin("+", IntLit(1), Bin("*", IntLit(2), IntLit(3))))
    assert(expr("a = 1 AND b > 2 OR c < 3") ==
      Bin("OR",
        Bin("AND", Bin("=", Variable("a"), IntLit(1)), Bin(">", Variable("b"), IntLit(2))),
        Bin("<", Variable("c"), IntLit(3))))
  }

  test("NOT / unary minus / IS NULL / IN") {
    assert(expr("NOT a") == Un("NOT", Variable("a")))
    assert(expr("-5") == Un("-", IntLit(5)))
    assert(expr("a.x IS NOT NULL") == IsNull(Prop(Variable("a"), "x"), negated = true))
    assert(expr("x IN [1, 2]") ==
      InList(Variable("x"), ListLit(Seq(IntLit(1), IntLit(2))), negated = false))
  }

  test("pattern parsing: directions, types, var-length, props") {
    val q = Parser.parse(
      "MATCH (a:Person {age: 30})-[r:KNOWS|LIKES *2..4 {w: 1}]->(b) RETURN a")
    val m = q.clauses.head.asInstanceOf[MatchClause]
    val pat = m.patterns.head
    assert(pat.start == NodePat(Some("a"), Seq("Person"), Seq(("age", IntLit(30)))))
    val (rel, node) = pat.hops.head
    assert(rel.types == Seq("KNOWS", "LIKES"))
    assert(rel.varLength.contains((2, 4)))
    assert(rel.dir == Dir.Out)
    assert(rel.props == Seq(("w", IntLit(1))))
    assert(node.variable.contains("b"))
  }

  test("incoming and undirected relationships") {
    def dirOf(s: String): Dir =
      Parser.parse(s).clauses.head.asInstanceOf[MatchClause]
        .patterns.head.hops.head._1.dir
    assert(dirOf("MATCH (a)<-[:X]-(b) RETURN a") == Dir.In)
    assert(dirOf("MATCH (a)-[:X]-(b) RETURN a") == Dir.Both)
    assert(dirOf("MATCH (a)-[:X]->(b) RETURN a") == Dir.Out)
  }

  test("keyword-cased identifiers survive (Order label)") {
    val q = Parser.parse("MATCH (o:Order) RETURN o.o_orderkey AS k")
    val m = q.clauses.head.asInstanceOf[MatchClause]
    assert(m.patterns.head.start.labels == Seq("Order"))
  }

  test("clause pipeline: WITH + WHERE + ORDER + SKIP + LIMIT") {
    val q = Parser.parse(
      "MATCH (a) WITH a.x AS x WHERE x > 1 RETURN x ORDER BY x DESC SKIP 2 LIMIT 5")
    assert(q.clauses.length == 3)
    val r = q.clauses(2).asInstanceOf[ReturnClause]
    assert(!r.orderBy.head.asc && r.skip.contains(2L) && r.limit.contains(5L))
  }

  test("string escapes and comments") {
    assert(expr("'a\\'b\\n'") == StrLit("a'b\n"))
    val q = Parser.parse("MATCH (n) // line comment\n RETURN /* block */ n")
    assert(q.clauses.length == 2)
  }

  test("parse errors carry position context") {
    val e = intercept[RuntimeException](Parser.parse("MATCH (a:"))
    assert(e.getMessage.contains("expected"))
    intercept[RuntimeException](Parser.parse("RETURN"))
    intercept[RuntimeException](Parser.parse("MATCH a RETURN a"))
  }

  test("property: Graphid pack/unpack roundtrip") {
    forSamples(Gen.zip(Gen.chooseNum(0, Graphid.MaxLabel), Gen.chooseNum(0L, Graphid.LocalMask))) {
      case (lab, loc) =>
        assert(Graphid.unpack(Graphid.pack(lab, loc)) == ((lab, loc)))
    }
  }

  test("property: lexer never crashes on printable input (except unterminated quotes)") {
    forSamples(Gen.listOf(Gen.oneOf(Gen.alphaNumChar, Gen.oneOf(" +-*/()[]{}.,<>=:".toSeq)))) {
      chars =>
        Lexer.tokenize(chars.mkString) // must not throw for quote-free input
    }
  }

  test("property: integer literals roundtrip through parser") {
    forSamples(Gen.chooseNum(0L, Long.MaxValue / 2)) { n =>
      assert(expr(n.toString) == IntLit(n))
    }
  }
}
