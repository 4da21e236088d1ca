package graft.lp

import graft.core.Tbox
import graft.expr._

/** Deterministic top-down refinement operator ρ over the engine's Tbox,
  * modeled on the published downward refinement operators for description
  * logics (Lehmann & Hitzler, "Concept learning in description logics
  * using refinement operators", Machine Learning 78, 2010 — the operator
  * family behind CELOE/OCEL). The reference's light package ships no
  * refinement operator (its learners come from the full `ontolearn` pip
  * distribution, examples/evaluation_table_generator.py:14), so this is an
  * engine extension: the minimum a best-first learner needs, kept small
  * and fully deterministic (every enumeration sorted).
  *
  *   ρ(⊤)      = hierarchy roots ∪ { ∃r.⊤ | r most-general object role }
  *   ρ(A)      = direct subclasses of A ∪ conj(A)
  *   ρ(∃r.C)   = { ∃r.C' | C' ∈ ρ(C) } ∪ conj(∃r.C)
  *   ρ(∀r.C)   = { ∀r.C' | C' ∈ ρ(C) } ∪ conj(∀r.C)
  *   ρ(C1⊓…⊓Cn) = refine one conjunct ∪ conj(·)
  *   conj(C)   = { C ⊓ a | a atomic, a ≠ C }     (canonicalized ⊓)
  *
  * Conjunctions are canonicalized (flattened, deduped, render-sorted) so
  * syntactic permutations collapse to one tree node; every output is
  * length-capped at `maxLen` (concept_len, knowledge_base.py:512-524).
  */
final class Refine(tbox: Tbox, maxLen: Int = 7) {

  /** atomic refinements of ⊤: most-general named classes + most-general
    * existential restrictions (knowledge_base.py:750,864-880 shapes). */
  val atomics: Seq[ClassExpr] =
    tbox.rootClasses.map(Named(_): ClassExpr) ++
      tbox.mostGeneralObjectProps.map(_.prop).sorted.map(p => Exists(p, Top): ClassExpr)

  private def mkAnd(cs: Seq[ClassExpr]): ClassExpr = {
    val flat = cs.flatMap { case And(xs) => xs; case x => Seq(x) }
      .distinctBy(ClassExpr.render).sortBy(ClassExpr.render)
    if (flat.size == 1) flat.head else And(flat)
  }

  private def conj(c: ClassExpr): Seq[ClassExpr] =
    atomics.filterNot(_ == c).map(a => mkAnd(Seq(c, a)))

  /** canonical form: conjunctions flattened/deduped/render-sorted, applied
    * recursively through restriction fillers */
  private def norm(c: ClassExpr): ClassExpr = c match {
    case And(cs)      => mkAnd(cs.map(norm))
    case Or(cs)       => Or(cs.map(norm))
    case Not(x)       => Not(norm(x))
    case Exists(r, f) => Exists(r, norm(f))
    case ForAll(r, f) => ForAll(r, norm(f))
    case other        => other
  }

  def apply(ce0: ClassExpr): Seq[ClassExpr] = {
    val ce = norm(ce0)
    val refs: Seq[ClassExpr] = ce match {
      case Top          => atomics
      case Named(c)     => tbox.directSubClassesOf(c).map(Named(_): ClassExpr) ++ conj(ce)
      case Exists(r, f) => this(f).map(Exists(r, _)) ++ conj(ce)
      case ForAll(r, f) => this(f).map(ForAll(r, _)) ++ conj(ce)
      case And(cs) =>
        cs.indices.flatMap(i => this(cs(i)).map(r => mkAnd(cs.updated(i, r)))) ++ conj(ce)
      case other        => conj(other)
    }
    // canonical output order: syntactic permutations of the input (e.g. a
    // reordered conjunction) refine to the same sequence. A conjunction's
    // conj(·) can reproduce the input itself (C ⊓ a with a already a
    // conjunct dedups back to C) — a concept is not its own refinement.
    val self = ClassExpr.render(ce)
    refs.filter(c => ClassExpr.length(c) <= maxLen)
      .filterNot(c => ClassExpr.render(c) == self)
      .distinctBy(ClassExpr.render).sortBy(ClassExpr.render)
  }
}

/** Best-first concept learner driving [[SearchTreePriorityQueue]] with
  * [[Refine]]: repeatedly expand the most promising unexpanded node, score
  * the whole refinement batch in ONE Spark job, stop on a goal concept
  * (quality 1) or after `maxIterations` expansions. Fully deterministic —
  * same KB + LP always returns the same hypotheses.
  *
  * Expansion picks the best UNEXPANDED node by (heuristic desc, render) —
  * a driver-scale scan of the registry; the reference's
  * `get_most_promising` re-puts popped nodes, which on an already-expanded
  * frontier would spin (full learners break the loop with horizontal
  * expansion; this learner tracks expansion explicitly).
  */
object Learner {

  final case class FitResult(best: Seq[LblNode], goalFound: Boolean,
                             iterations: Int, explored: Int)

  def fit(kb: graft.core.Kb, elp: EncodedLp, metric: Metric = F1,
          heuristic: LblNode => Double = _.quality,
          maxIterations: Int = 20, maxLen: Int = 7, topN: Int = 3): FitResult = {
    val rho = new Refine(kb.tbox, maxLen)
    val tree = new SearchTreePriorityQueue(kb, elp, metric, heuristic)
    val root = tree.addRoot(graft.expr.Top)
    var goal = root.quality == 1
    val expanded = scala.collection.mutable.Set.empty[ClassExpr]
    var it = 0
    while (!goal && it < maxIterations) {
      tree.nodes.values.filterNot(n => expanded(n.concept)).toSeq
        .sortBy(n => (-n.heuristic, n.render)).headOption match {
        case None => it = maxIterations // frontier exhausted
        case Some(n) =>
          it += 1
          expanded += n.concept
          goal = tree.addNodes(rho(n.concept), n).exists(_.contains(true))
      }
    }
    FitResult(tree.getTopN(topN), goal, it, tree.nodes.size)
  }
}
