package graft.core

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Basic-graph-pattern matching over the (src, pred, dst) edge table — the
  * SPARQL BGP / conjunctive-query core (Pérez, Arenas & Gutierrez,
  * "Semantics and complexity of SPARQL", TODS 2009) as pure Catalyst
  * equi-joins. An atom is a (s, p, o) triple of terms; a term starting
  * with '?' is a variable, anything else a constant. The result has one
  * column per variable (named without the '?', in order of first
  * appearance) under SPARQL's bag semantics — no implicit distinct.
  *
  * Plan shape: each atom is one scan of the edge table with its constant
  * positions pushed down as filters (Catalyst pushes them into the
  * parquet scan); atoms fold left-to-right into equi-joins on the shared
  * variables, so ATOM ORDER IS THE JOIN ORDER — at scale, order atoms
  * most-selective-first (the constant-bearing ones) and let AQE pick the
  * physical join per size. A repeated variable inside one atom becomes a
  * same-scan filter; a disconnected pattern is a deliberate cartesian
  * product (SPARQL semantics) — connect patterns unless that is meant.
  */
object Bgp {

  def matchPattern(edges: DataFrame, atoms: Seq[(String, String, String)]): DataFrame = {
    require(atoms.nonEmpty, "empty pattern")
    def isVar(t: String) = t.startsWith("?")
    def vn(t: String) = t.stripPrefix("?")

    def atomDf(a: (String, String, String)): (DataFrame, Seq[String]) = {
      val (s, p, o) = a
      var df = edges.select(col("src"), col("pred"), col("dst"))
      if (!isVar(s)) df = df.filter(col("src") === s)
      if (!isVar(p)) df = df.filter(col("pred") === p)
      if (!isVar(o)) df = df.filter(col("dst") === o)
      if (isVar(s) && isVar(p) && vn(s) == vn(p)) df = df.filter(col("src") === col("pred"))
      if (isVar(s) && isVar(o) && vn(s) == vn(o)) df = df.filter(col("src") === col("dst"))
      if (isVar(p) && isVar(o) && vn(p) == vn(o)) df = df.filter(col("pred") === col("dst"))
      val cols = scala.collection.mutable.LinkedHashMap.empty[String, Column]
      if (isVar(s)) cols.getOrElseUpdate(vn(s), col("src"))
      if (isVar(p)) cols.getOrElseUpdate(vn(p), col("pred"))
      if (isVar(o)) cols.getOrElseUpdate(vn(o), col("dst"))
      require(cols.nonEmpty, s"atom $a binds no variable")
      (df.select(cols.map { case (n, c) => c.as(n) }.toSeq: _*), cols.keys.toSeq)
    }

    val (headDf, headVars) = atomDf(atoms.head)
    var acc = headDf
    var bound = headVars
    atoms.tail.foreach { a =>
      val (df, vars) = atomDf(a)
      val shared = vars.filter(bound.contains)
      acc = if (shared.nonEmpty) acc.join(df, shared) else acc.crossJoin(df)
      bound = bound ++ vars.filterNot(bound.contains)
    }
    // using-column joins put the keys first — restore first-appearance order
    acc.select(bound.map(col): _*)
  }

  /** Per-predicate statistics the cost-based atom ordering plans with:
    * edge count + distinct subject/object counts (average degrees fall
    * out as ratios). ONE aggregate over the edge table, output bounded by
    * the predicate VOCABULARY — collect to the driver and reuse across
    * every query against the same KG snapshot (the same lifecycle as the
    * characteristic-set statistics). */
  final case class PredStat(n: Long, dsrc: Long, ddst: Long)

  def predStats(edges: DataFrame): Map[String, PredStat] =
    edges.groupBy("pred").agg(count(lit(1)).as("n"),
        countDistinct(col("src")).as("dsrc"), countDistinct(col("dst")).as("ddst"))
      .collect()
      .map(r => r.getString(0) -> PredStat(r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap

  /** Greedy selectivity-first atom ordering (the classic left-deep BGP
    * planner, RDF-3X / Jena style): estimated rows of an atom =
    * pred count, divided by distinct-subject (constant subject → average
    * out-degree) and/or distinct-object (constant object) — a variable
    * predicate estimates against the whole-table totals. Start from the
    * cheapest atom, then repeatedly take the cheapest atom CONNECTED to
    * the bound variable set (cartesians deferred to last, as SPARQL's
    * disconnected-pattern semantics require them at all). Deterministic:
    * ties break on the original index. Exposed for direct unit testing. */
  def orderAtoms(atoms: Seq[(String, String, String)],
                 stats: Map[String, PredStat]): Seq[(String, String, String)] = {
    def isVar(t: String) = t.startsWith("?")
    val totalN = stats.valuesIterator.map(_.n).sum
    val totalS = stats.valuesIterator.map(_.dsrc).sum
    val totalD = stats.valuesIterator.map(_.ddst).sum
    def cost(a: (String, String, String)): Double = {
      val (s, p, o) = a
      val st = if (isVar(p)) PredStat(totalN, totalS max 1, totalD max 1)
        else stats.getOrElse(p, PredStat(0, 1, 1))
      var rows = st.n.toDouble
      if (!isVar(s)) rows /= math.max(1L, st.dsrc)
      if (!isVar(o)) rows /= math.max(1L, st.ddst)
      rows
    }
    def vars(a: (String, String, String)): Set[String] =
      Seq(a._1, a._2, a._3).filter(isVar).map(_.stripPrefix("?")).toSet
    val remaining = scala.collection.mutable.LinkedHashSet(atoms.zipWithIndex: _*)
    val out = scala.collection.mutable.Buffer.empty[(String, String, String)]
    var bound = Set.empty[String]
    while (remaining.nonEmpty) {
      val connected = remaining.filter { case (a, _) => (vars(a) & bound).nonEmpty }
      val pool = if (out.isEmpty || connected.isEmpty) remaining else connected
      val pick = pool.minBy { case (a, i) => (cost(a), i) }
      remaining -= pick
      out += pick._1
      bound ++= vars(pick._1)
    }
    out.toSeq
  }

  /** [[matchPattern]] with cost-based atom ordering: identical bag
    * semantics and COLUMN ORDER to the literal-order evaluation (inner
    * equi-joins commute; the output projection is re-pinned to the
    * ORIGINAL first-appearance variable order), but the join tree builds
    * smallest-estimate-first — at 10^12 triples the difference between a
    * selective-first and a hub-first left-deep tree is the whole query.
    * Pass a cached [[predStats]] to amortize the stats pass across
    * queries; omitted, it is computed from the edges argument. */
  def matchPatternOptimized(edges: DataFrame, atoms: Seq[(String, String, String)],
                            stats: Option[Map[String, PredStat]] = None): DataFrame = {
    def isVar(t: String) = t.startsWith("?")
    val outVars = atoms.flatMap(a => Seq(a._1, a._2, a._3)).filter(isVar)
      .map(_.stripPrefix("?")).distinct
    matchPattern(edges, orderAtoms(atoms, stats.getOrElse(predStats(edges))))
      .select(outVars.map(col): _*)
  }

  /** BGP whose atoms carry property PATHS in the predicate position
    * (SPARQL 1.1 §9: `?x ex:a/ex:b+ ?y` inside a pattern) — the algebra
    * the plain string form can't express. Each atom's relation is
    * [[Paths.pairs]] of its path (bag semantics for closure-free paths,
    * DISTINCT inside `?` per spec); constants at either endpoint push down
    * as filters into the path's leaf scans, repeated variables inside one
    * atom become a same-relation filter (cycle queries), and atoms fold
    * into equi-joins exactly like [[matchPattern]] — same join-order
    * contract, same AQE sizing. Predicate-position variables don't exist
    * here by construction (a path is a constant expression). */
  def matchPathPattern(edges: DataFrame,
                       atoms: Seq[(String, PathExpr, String)]): DataFrame = {
    require(atoms.nonEmpty, "empty pattern")
    def isVar(t: String) = t.startsWith("?")
    def vn(t: String) = t.stripPrefix("?")

    def atomDf(a: (String, PathExpr, String)): (DataFrame, Seq[String]) = {
      val (s, e, o) = a
      var df = Paths.pairs(edges, e)
      if (!isVar(s)) df = df.filter(col("s") === s)
      if (!isVar(o)) df = df.filter(col("o") === o)
      if (isVar(s) && isVar(o) && vn(s) == vn(o)) df = df.filter(col("s") === col("o"))
      val cols = scala.collection.mutable.LinkedHashMap.empty[String, Column]
      if (isVar(s)) cols.getOrElseUpdate(vn(s), col("s"))
      if (isVar(o)) cols.getOrElseUpdate(vn(o), col("o"))
      require(cols.nonEmpty, s"path atom ($s, $e, $o) binds no variable")
      (df.select(cols.map { case (n, c) => c.as(n) }.toSeq: _*), cols.keys.toSeq)
    }

    val (headDf, headVars) = atomDf(atoms.head)
    var acc = headDf
    var bound = headVars
    atoms.tail.foreach { a =>
      val (df, vars) = atomDf(a)
      val shared = vars.filter(bound.contains)
      acc = if (shared.nonEmpty) acc.join(df, shared) else acc.crossJoin(df)
      bound = bound ++ vars.filterNot(bound.contains)
    }
    acc.select(bound.map(col): _*)
  }

  /** SPARQL OPTIONAL (one block, the well-designed case of Pérez et al.
    * TODS'09 §4: the optional part shares variables with the required
    * part): solutions of `required` LEFT-JOINED with solutions of
    * `optional` on their shared variables — unmatched optional variables
    * come back NULL, required-side multiplicity is preserved (bag
    * semantics). Plan: the two BGPs each keep their pushdown/join shape;
    * OPTIONAL adds exactly one left outer equi-join on the shared
    * variables, which AQE sizes like any other join. */
  def matchOptional(edges: DataFrame,
                    required: Seq[(String, String, String)],
                    optional: Seq[(String, String, String)]): DataFrame = {
    val req = matchPattern(edges, required)
    val opt = matchPattern(edges, optional)
    val shared = req.columns.filter(opt.columns.contains).toSeq
    require(shared.nonEmpty,
      "OPTIONAL must share at least one variable with the required pattern " +
        "(a disconnected OPTIONAL is not a well-designed pattern)")
    req.join(opt, shared, "left_outer")
      .select((req.columns ++ opt.columns.filterNot(req.columns.contains))
        .map(col).toSeq: _*)
  }

  /** SPARQL MINUS (SPARQL 1.1 §18.5, Minus(Ω1, Ω2)): keep the left
    * solutions with no compatible right solution SHARING at least one
    * variable. BGP solutions bind every variable of their pattern, so
    * compatibility on the shared variables is plain equality and MINUS
    * is exactly one LEFT ANTI equi-join on them; when the patterns share
    * NO variable, dom(μ1) ∩ dom(μ2) = ∅ makes every pair vacuously
    * disjoint and MINUS removes NOTHING — the spec's deliberate
    * asymmetry against [[matchNotExists]], preserved here. Plan: both
    * BGPs keep their own pushdown/join shapes; the anti join shuffles
    * only the shared-variable key (the right side is projected to the
    * key before the exchange) and AQE sizes it like any other join. */
  def matchMinus(edges: DataFrame,
                 left: Seq[(String, String, String)],
                 right: Seq[(String, String, String)]): DataFrame = {
    val l = matchPattern(edges, left)
    val r = matchPattern(edges, right)
    val shared = l.columns.filter(r.columns.contains).toSeq
    if (shared.isEmpty) l
    else l.join(r.select(shared.map(col): _*), shared, "left_anti")
      .select(l.columns.map(col).toSeq: _*) // using-join reorders keys first
  }

  /** SPARQL FILTER NOT EXISTS (SPARQL 1.1 §8.1.1 / §18.6): keep the left
    * solutions under which the inner pattern, with the solution's
    * bindings substituted, has no match. With shared variables the
    * substitution is equality on them — the same anti equi-join as
    * [[matchMinus]]; with NO shared variable the inner pattern's
    * matches are binding-independent, so one inner match eliminates
    * EVERY left row (where MINUS would keep them all). That branch stays
    * in-plan as an anti join against `limit(1)` of the inner solutions —
    * a 1-row broadcast, not a driver-side emptiness collect. */
  def matchNotExists(edges: DataFrame,
                     left: Seq[(String, String, String)],
                     inner: Seq[(String, String, String)]): DataFrame = {
    val l = matchPattern(edges, left)
    val r = matchPattern(edges, inner)
    val shared = l.columns.filter(r.columns.contains).toSeq
    if (shared.nonEmpty)
      l.join(r.select(shared.map(col): _*), shared, "left_anti")
        .select(l.columns.map(col).toSeq: _*)
    else l.join(r.limit(1).select(lit(1).as("__m")), lit(true), "left_anti")
  }

  /** SPARQL FILTER EXISTS — [[matchNotExists]]'s positive dual: keep the
    * left solutions under which the inner pattern has at least one match.
    * Shared variables ⇒ one LEFT SEMI equi-join (left multiplicity
    * preserved, inner multiplicity ignored — exactly EXISTS semantics);
    * no shared variable ⇒ any inner match keeps every row, in-plan via a
    * 1-row semi join. */
  def matchExists(edges: DataFrame,
                  left: Seq[(String, String, String)],
                  inner: Seq[(String, String, String)]): DataFrame = {
    val l = matchPattern(edges, left)
    val r = matchPattern(edges, inner)
    val shared = l.columns.filter(r.columns.contains).toSeq
    if (shared.nonEmpty)
      l.join(r.select(shared.map(col): _*), shared, "left_semi")
        .select(l.columns.map(col).toSeq: _*)
    else l.join(r.limit(1).select(lit(1).as("__m")), lit(true), "left_semi")
  }

  /** SPARQL 1.1 aggregation (§18.5.1 Group/Aggregation): group the
    * pattern's solution bag by `groupVars` and evaluate the (aliased)
    * aggregate Columns, with HAVING as an optional post-aggregation
    * filter. The solution bag keeps BGP bag semantics, so COUNT/SUM see
    * duplicate solutions exactly as the spec requires. Plan: the BGP
    * keeps its pushdown/join shape; grouping adds ONE partial-aggregate
    * exchange keyed on the group variables (map-side combine free with
    * algebraic aggregates), and HAVING is a row-local filter above it. */
  def aggregatePattern(edges: DataFrame, atoms: Seq[(String, String, String)],
                       groupVars: Seq[String], aggs: Seq[Column],
                       having: Option[Column] = None): DataFrame = {
    require(groupVars.nonEmpty && aggs.nonEmpty, "need group vars and aggregates")
    val sol = matchPattern(edges, atoms)
    val g = sol.groupBy(groupVars.map(col): _*).agg(aggs.head, aggs.tail: _*)
    having.fold(g)(g.filter)
  }

  /** SPARQL CONSTRUCT (§16.2): instantiate each template triple once per
    * WHERE solution and return the union as an RDF GRAPH — i.e. with SET
    * semantics (the spec's result is a graph, so duplicates collapse; the
    * one distinct exchange is exactly that). BGP solutions bind every
    * variable, so instantiation is a pure projection of the solution
    * relation — k template triples are k pipelined projections of ONE
    * shared solution subtree, not k re-evaluations. */
  def construct(edges: DataFrame, where: Seq[(String, String, String)],
                template: Seq[(String, String, String)]): DataFrame = {
    require(template.nonEmpty, "empty CONSTRUCT template")
    val sol = matchPattern(edges, where)
    def term(t: String): Column =
      if (t.startsWith("?")) {
        val v = t.stripPrefix("?")
        require(sol.columns.contains(v), s"unbound template variable $t")
        col(v)
      } else lit(t)
    template.map { case (s, p, o) =>
      sol.select(term(s).as("src"), term(p).as("pred"), term(o).as("dst"))
    }.reduce(_ unionAll _).distinct()
  }

  /** SPARQL UNION: the bag union of the branch solution sequences under a
    * shared schema — the union of all branch variables in first-appearance
    * order, a variable unbound in a branch coming back NULL in that
    * branch's rows (SPARQL 1.1 §18.5 Union(Ω1, Ω2): solutions need not
    * share domains). Plan: each branch keeps its own BGP pushdown/join
    * shape; UNION itself is a zero-shuffle `unionAll` — branches run as
    * independent stages, so at scale the union is free and the cost is
    * exactly the sum of the branches. */
  def matchUnion(edges: DataFrame,
                 branches: Seq[Seq[(String, String, String)]]): DataFrame = {
    require(branches.nonEmpty, "empty UNION")
    val sols = branches.map(matchPattern(edges, _))
    val allVars = sols.foldLeft(Seq.empty[String]) { (acc, df) =>
      acc ++ df.columns.filterNot(acc.contains)
    }
    sols.map { df =>
      df.select(allVars.map(v =>
        if (df.columns.contains(v)) col(v)
        else lit(null).cast("string").as(v)): _*)
    }.reduce(_ unionAll _)
  }

  /** SPARQL FILTER (§18.5 Filter(expr, Ω)): a row-local predicate over the
    * solution relation. The expression is a Catalyst Column, so the
    * optimizer pushes it THROUGH the BGP's join tree to the earliest atom
    * scan that binds its variables — `FILTER(?n != ?m)` lands on the join
    * output, but `FILTER(strstarts(?n, 'n:1'))` reaches the parquet scan
    * of ?n's atom. That pushdown is the reason FILTER composes here
    * instead of post-hoc: at 10^12 triples the filter must prune BEFORE
    * the join fans out. */
  def matchFilter(edges: DataFrame, atoms: Seq[(String, String, String)],
                  condition: Column): DataFrame =
    matchPattern(edges, atoms).filter(condition)

  /** SPARQL VALUES (§10.2 inline data): the solution relation joined with
    * an explicit multiset of bindings over `vars`. The data block is
    * driver-literal and therefore BROADCAST — VALUES is SPARQL's way of
    * shipping a small dim into the query, and that is exactly what the
    * plan does (no shuffle on the pattern side; the join keys prune via
    * Catalyst's join-side filter inference / DPP on a partitioned store).
    * Rows shorter than `vars` or carrying null mean UNDEF in that
    * position per the spec — UNDEF joins everything — handled by
    * conditioning each key equality on the literal being non-null. */
  def matchValues(edges: DataFrame, atoms: Seq[(String, String, String)],
                  vars: Seq[String], rows: Seq[Seq[String]]): DataFrame = {
    require(vars.nonEmpty && rows.nonEmpty, "VALUES needs vars and rows")
    require(rows.forall(_.length == vars.length), "VALUES row arity mismatch")
    val sol = matchPattern(edges, atoms)
    require(vars.forall(sol.columns.contains), s"VALUES vars $vars must be bound by the pattern")
    val spark = edges.sparkSession
    import spark.implicits._
    val data = rows.map(r => (r.lift(0).orNull, r.lift(1).orNull))
    val dataDf = vars.length match {
      case 1 => rows.map(_.head).toDF(s"__v_${vars.head}")
      case 2 => data.toDF(s"__v_${vars(0)}", s"__v_${vars(1)}")
      case n => throw new IllegalArgumentException(s"VALUES arity $n unsupported (1-2)")
    }
    val cond = vars.map(v =>
      col(s"__v_$v").isNull || (col(v) === col(s"__v_$v"))).reduce(_ && _)
    sol.join(broadcast(dataDf), cond)
      .drop(vars.map(v => s"__v_$v"): _*)
  }

  /** SPARQL ASK (§16.3): does the pattern have at least one solution?
    * One row, one boolean column. The LocalLimit(1) under the count makes
    * this a short-circuit probe — executors stop producing past the first
    * match, so a satisfiable ASK over 10^12 triples costs one partition's
    * first hit, not a full join. */
  def ask(edges: DataFrame, atoms: Seq[(String, String, String)]): DataFrame =
    matchPattern(edges, atoms).limit(1)
      .agg((count(lit(1)) > 0).as("ask"))

  /** SPARQL solution modifiers (§15): DISTINCT → ORDER BY → LIMIT, applied
    * in the spec's order. `orderBy` lists solution variables ('-' prefix
    * for DESC). With a LIMIT, Spark plans the pair as
    * TakeOrderedAndProject — per-partition top-k + a driver-side k-way
    * merge, NEVER a global sort, which is what makes "first 25 of 10^12
    * solutions" a real query. Hash-gate callers must order by a key that
    * totally orders the solution set (the gate compares sets; a
    * nondeterministic cut would flake).
    */
  def solutions(sol: DataFrame, distinct: Boolean = false,
                orderBy: Seq[String] = Nil, limit: Int = -1): DataFrame = {
    var df = if (distinct) sol.distinct() else sol
    if (orderBy.nonEmpty)
      df = df.orderBy(orderBy.map(v =>
        if (v.startsWith("-")) col(v.stripPrefix("-")).desc else col(v).asc): _*)
    if (limit >= 0) df = df.limit(limit)
    df
  }
}
