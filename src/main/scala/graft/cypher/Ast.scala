package graft.cypher

/** openCypher-subset AST, shape-compatible with the reference's
  * (/root/reference/src/parser/ast.rs:10-120) but extended where the
  * reference is parsed-only or buggy: full expression trees with proper
  * left-associative folding (the reference's builder drops operator-chain
  * tails, builder.rs:573-618), unbounded pattern length (the reference caps
  * at 5 elements, match_executor.rs:115-123), and variable-length
  * relationships.
  */
object Ast {

  // ---- expressions ----
  sealed trait Expr
  case object NullLit extends Expr
  final case class BoolLit(v: Boolean) extends Expr
  final case class IntLit(v: Long) extends Expr
  final case class FloatLit(v: Double) extends Expr
  final case class StrLit(v: String) extends Expr
  final case class ListLit(items: Seq[Expr]) extends Expr
  final case class MapLit(entries: Seq[(String, Expr)]) extends Expr
  final case class Variable(name: String) extends Expr
  /** Property access chain a.b.c (grammar cypher.pest:145-155). */
  final case class Prop(base: Expr, key: String) extends Expr
  final case class Index(base: Expr, idx: Expr) extends Expr
  final case class Param(name: String) extends Expr
  final case class FnCall(name: String, args: Seq[Expr], distinct: Boolean = false) extends Expr
  /** COUNT(*) */
  case object CountStar extends Expr
  final case class Bin(op: String, l: Expr, r: Expr) extends Expr // + - * / % = <> < > <= >= AND OR
  final case class Un(op: String, e: Expr) extends Expr // - + NOT
  final case class CaseExpr(whens: Seq[(Expr, Expr)], otherwise: Option[Expr]) extends Expr
  /** Map projection n {.prop, .*, key: expr} — openCypher sugar building
    * a map (struct) from an entity's properties and computed entries.
    */
  sealed trait MapProjItem
  final case class MapProjProp(key: String) extends MapProjItem
  final case class MapProjKV(key: String, value: Expr) extends MapProjItem
  case object MapProjAll extends MapProjItem
  final case class MapProjection(variable: String,
      items: Seq[MapProjItem]) extends Expr
  /** [x IN list WHERE pred | proj] — openCypher list comprehension; WHERE
    * and the projection are each optional ([x IN l] copies the list).
    */
  final case class ListComp(variable: String, list: Expr,
      where: Option[Expr], proj: Option[Expr]) extends Expr
  /** reduce(acc = init, x IN list | body) — openCypher fold; the body's
    * value is cast back to the accumulator's type each step.
    */
  final case class ReduceExpr(acc: String, init: Expr, variable: String,
      list: Expr, body: Expr) extends Expr
  /** any/all/none/single(x IN list WHERE pred) — openCypher list
    * quantifiers. `kind` is the lowercased quantifier name.
    */
  final case class ListPred(kind: String, variable: String, list: Expr,
      pred: Expr) extends Expr
  final case class IsNull(e: Expr, negated: Boolean) extends Expr
  final case class InList(e: Expr, list: Expr, negated: Boolean) extends Expr
  /** `EXISTS((a)-[:T]->(b))` pattern predicate — openCypher surface absent
    * from the reference grammar (cypher.pest has no EXISTS). Not a scalar:
    * the planner compiles top-level WHERE conjuncts of this shape to a
    * left-semi join (left-anti under NOT) against the pattern's matches.
    */
  /** The r8 braces form `EXISTS { [MATCH] (a)-[:T]->(b) [WHERE pred] }`
    * carries the inner predicate; the paren form leaves it None.
    */
  final case class PatternPred(pattern: PathPat,
      where: Option[Expr] = None) extends Expr

  /** `[(a)-[:T]->(b) WHERE pred | proj]` pattern comprehension — the list
    * of `proj` values over the pattern's matches, per outer row. Not a
    * scalar either: the planner hoists occurrences inside projection items
    * into ONE aggregating left join per distinct subquery (collect_list
    * over the pattern matches grouped by the shared-variable keys).
    */
  final case class PatternComp(pattern: PathPat, where: Option[Expr],
      proj: Expr) extends Expr

  /** `COUNT { (a)-[:T]->(b) WHERE pred }` subquery (modern openCypher /
    * GQL; absent from the reference grammar) — the number of pattern
    * matches per outer row. Hoisted like PatternComp, with count(*) as
    * the aggregate and 0 for rows with no matches.
    */
  final case class CountSub(pattern: PathPat, where: Option[Expr]) extends Expr

  // ---- patterns ----
  sealed trait Dir
  object Dir { case object Out extends Dir; case object In extends Dir; case object Both extends Dir }

  final case class NodePat(
      variable: Option[String],
      labels: Seq[String],
      props: Seq[(String, Expr)])

  final case class RelPat(
      variable: Option[String],
      types: Seq[String],
      props: Seq[(String, Expr)],
      dir: Dir,
      varLength: Option[(Int, Int)]) // [*min..max]

  /** (n0)-[r1]->(n1)-[r2]->(n2)..., optionally bound to a path variable
    * (`p = (a)-[*1..3]->(b)`): `p` binds the vertex-id list, its companion
    * `relationships(p)` the edge-id list (reference GraphPath carries both,
    * types/path.rs:33-40).
    */
  final case class PathPat(start: NodePat, hops: Seq[(RelPat, NodePat)],
      pathVar: Option[String] = None)

  // ---- clauses ----
  sealed trait Clause
  final case class MatchClause(patterns: Seq[PathPat], optional: Boolean,
      where: Option[Expr]) extends Clause
  /** MATCH p = shortestPath((a)-[*..k]->(b)) — surfaces the standalone
    * shortest-path algorithm (reference src/algorithms/shortest_path.rs,
    * which likewise exists only as an API call, not grammar) through the
    * query language. `pathVar` binds the vertex-id list of the path.
    * A `{weight: 'prop'}` entry in the relationship props is the weighted
    * cost knob (SURVEY §8.1), routing to PregelSssp instead of BFS.
    * `all = true` is openCypher's `allShortestPaths(...)`: every
    * minimum-length path, one row each (unweighted only).
    */
  final case class ShortestPathClause(pathVar: Option[String],
      pattern: PathPat, all: Boolean = false) extends Clause
  final case class ReturnItem(expr: Expr, alias: Option[String])
  final case class OrderItem(expr: Expr, asc: Boolean)
  /** `star` = a leading `*` item (RETURN * / WITH *): every named scope
    * variable projects, before any additional explicit items.
    */
  final case class ReturnClause(distinct: Boolean, items: Seq[ReturnItem],
      orderBy: Seq[OrderItem], skip: Option[Long], limit: Option[Long],
      star: Boolean = false) extends Clause
  final case class WithClause(distinct: Boolean, items: Seq[ReturnItem],
      orderBy: Seq[OrderItem], skip: Option[Long], limit: Option[Long],
      where: Option[Expr], star: Boolean = false) extends Clause
  final case class CreateClause(patterns: Seq[PathPat]) extends Clause
  /** MERGE takes exactly one pattern part (openCypher grammar). */
  /** MERGE with optional ON CREATE SET / ON MATCH SET branches: the
    * branch applies only to the entities the merge created (resp. found).
    */
  final case class MergeClause(pattern: PathPat,
      onCreate: Option[SetClause] = None,
      onMatch: Option[SetClause] = None) extends Clause
  /** SET target path (variable + property chain) = value. */
  final case class SetItem(variable: String, path: Seq[String], value: Expr)
  final case class SetClause(items: Seq[SetItem]) extends Clause
  final case class DeleteClause(vars: Seq[String], detach: Boolean) extends Clause
  final case class UnwindClause(expr: Expr, alias: String) extends Clause
  /** FOREACH (x IN list | update...) — openCypher list-driven mutation
    * (beyond the reference grammar, cypher.pest has no write loop). The
    * body may only hold update clauses; the outer row cardinality is
    * unchanged. `nodes(p)` as the list marks the loop variable as a NODE
    * binding (elements are vertex ids), enabling SET/REMOVE/DELETE on it.
    */
  final case class ForeachClause(variable: String, list: Expr,
      updates: Seq[Clause]) extends Clause
  /** REMOVE n.prop — property removal (openCypher; the reference's SET
    * cannot delete a key). Typed columns null out; schemaless JSON
    * properties drop the key entirely; a missing property is a no-op.
    */
  final case class RemoveClause(items: Seq[(String, Seq[String])]) extends Clause
  /** CALL graft.<procedure>(args) [YIELD col [AS alias], ...] [WHERE ...]
    * — the Neo4j-GDS-style procedure surface over the whole-graph
    * algorithm library (beyond the reference grammar; its algorithms are
    * reachable only through a REST layer, social-network-api/src/main.rs).
    * Args are literal integers; YIELD selects/renames the procedure's
    * output columns (all of them when absent); WHERE filters the yielded
    * rows before the rest of the pipeline sees them.
    */
  final case class CallClause(proc: String, args: Seq[Expr],
      yields: Seq[(String, Option[String])], where: Option[Expr]) extends Clause

  /** `CALL { <subquery> }` (openCypher CALL subquery — beyond the
    * reference grammar): an optional leading `WITH a, b` of bare variables
    * imports outer bindings; the inner part is read-only and ends in
    * RETURN, whose items join back onto the enclosing pipeline.
    */
  final case class CallSubqueryClause(inner: Query) extends Clause

  /** A whole query = ordered clause pipeline (generalizes the reference's
    * Read/Write/Mixed split, ast.rs:10-37).
    */
  /** `union` chains a following UNION [ALL] query part (openCypher query
    * combinator; the reference grammar has no union rule): the boolean is
    * true for UNION ALL. Parts must be read-only and return identical
    * column lists; plain UNION applies set-distinct over the combined
    * rows.
    */
  final case class Query(clauses: Seq[Clause],
      union: Option[(Boolean, Query)] = None)
}
