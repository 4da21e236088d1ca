package graft.lp

import graft.core.Tbox
import graft.expr._

/** Opt-in dialect extensions for [[Refine]] — the CELOE-style operator
  * switches (the full ontolearn's ModifiedCELOERefinement exposes the same
  * knobs as use_negation / use_card_restrictions / use_data_properties /
  * use_inverse; the defaults keep ρ on the object ⊓/∃/∀ core so existing
  * search traces are unchanged).
  *
  *  - `negation`: ¬L atoms for every hierarchy LEAF (the most general
  *    negations — ¬L ⊒ ¬C for C ⊒ L); ρ(¬A) walks to ¬parent(A) (downward:
  *    B ⊒ A ⇒ ¬B ⊑ ¬A).
  *  - `cardinality`: ≥2 r.⊤ atoms per most-general role; ρ tightens n by 1
  *    up to `maxCardN` and refines the filler.
  *  - `union`: A ⊔ B atoms over every pair of hierarchy ROOT classes (the
  *    most general proper unions — the reference's concept space includes
  *    unions, concept_generator.py:86-103); ρ(C ⊔ D) refines one disjunct
  *    or drops one (both downward: a smaller disjunct or one fewer
  *    disjunct admits fewer individuals).
  *  - `maxCardinality`: ≤`maxCardN` r.⊤ atoms per most-general role
  *    (the most general ≤-form under the cap); ρ tightens n DOWN by 1
  *    (≤n−1 admits fewer) — the filler is deliberately never refined
  *    there, because shrinking the filler of a ≤ is an UPWARD move.
  *    Also turns on =n: ρ(≥n r.C) and ρ(≤n r.C) each additionally
  *    propose =n r.C (=n ⊑ ≥n and =n ⊑ ≤n — both downward).
  *  - `inverse`: ∃r⁻.⊤ atoms (knowledge_base.py:902-922 inverse
  *    existential generators); fillers refine.
  *  - `boolProps`: ∃p.{true} / ∃p.{false} atoms per boolean data property
  *    (feed from Kb.mostGeneralBooleanDataProperties).
  *  - `dataSplits`: per numeric property, an ASCENDING threshold ladder;
  *    atoms are the most general restrictions ∃p.(>= first) and
  *    ∃p.(<= last), and ρ tightens one rung at a time (the value-splitter
  *    pattern of CELOE's data-property refinement). Splits are caller
  *    supplied — precomputed rungs are the 100-TB path (see
  *    [[Refine.splitsFor]] for the exact driver-bounded helper).
  *  - `timeSplits`: the same ladder idea for time data properties (ISO
  *    lexical forms — string order IS chronological order), feeding
  *    ∃p.(≥/≤ rung) time compares.
  *  - `universalData`: additionally seed ∀p.(≤ last) / ∀p.(≥ first) OWA
  *    universal data restrictions from `dataSplits`; ρ tightens their
  *    bound one rung at a time (downward: a tighter ∀-bound admits fewer
  *    individuals).
  */
final case class RefineConfig(
    negation: Boolean = false,
    cardinality: Boolean = false,
    maxCardN: Int = 5,
    inverse: Boolean = false,
    boolProps: Seq[String] = Nil,
    dataSplits: Map[String, Seq[Double]] = Map.empty,
    timeSplits: Map[String, Seq[String]] = Map.empty,
    universalData: Boolean = false,
    union: Boolean = false,
    maxCardinality: Boolean = false)

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
  *               ∪ the [[RefineConfig]] atom groups
  *   ρ(A)      = direct subclasses of A ∪ conj(A)
  *   ρ(¬A)     = { ¬B | B direct parent of A } ∪ conj(¬A)
  *   ρ(∃r.C)   = { ∃r.C' | C' ∈ ρ(C) } ∪ conj(∃r.C)
  *   ρ(∀r.C)   = { ∀r.C' | C' ∈ ρ(C) } ∪ conj(∀r.C)
  *   ρ(≥n r.C) = ≥n+1 r.C ∪ { ≥n r.C' | C' ∈ ρ(C) } ∪ conj(·)
  *   ρ(∃p.(>= v)) = next rung up; ρ(∃p.(<= v)) = next rung down
  *   ρ(C1⊓…⊓Cn) = refine one conjunct ∪ conj(·)
  *   conj(C)   = { C ⊓ a | a atomic, a ≠ C }     (canonicalized ⊓)
  *
  * Conjunctions are canonicalized (flattened, deduped, render-sorted) so
  * syntactic permutations collapse to one tree node; every output is
  * length-capped at `maxLen` (concept_len, knowledge_base.py:512-524).
  */
final class Refine(tbox: Tbox, maxLen: Int = 7,
                   config: RefineConfig = RefineConfig()) {

  // the ladder logic (and the doc claim above) relies on lexical string
  // order == chronological order, which holds for zone-less xsd:date /
  // dateTime forms but NOT for xsd:duration (P9D > P10D lexically) or
  // timezone-offset dateTimes — reject those up front instead of walking
  // rungs in the wrong order silently
  private val TimeLexical =
    """\d{4}-\d{2}-\d{2}([T ]\d{2}:\d{2}(:\d{2}(\.\d+)?)?)?""".r
  config.timeSplits.foreach { case (p, vs) =>
    vs.foreach { v =>
      require(TimeLexical.matches(v),
        s"timeSplits($p): '$v' is not a zone-less xsd:date/dateTime lexical form " +
          "(durations and timezone offsets do not sort chronologically)")
    }
  }

  /** atomic refinements of ⊤: most-general named classes + most-general
    * existential restrictions (knowledge_base.py:750,864-880 shapes) +
    * the config's opt-in atom groups, each enumerated in sorted order. */
  val atomics: Seq[ClassExpr] = {
    val roles = tbox.mostGeneralObjectProps.map(_.prop).sorted
    val roots = tbox.rootClasses
    tbox.rootClasses.map(Named(_): ClassExpr) ++
      roles.map(p => Exists(p, Top): ClassExpr) ++
      (if (config.union)
        (for {
          (a, i) <- roots.zipWithIndex
          b <- roots.drop(i + 1)
        } yield mkOr(Seq(Named(a), Named(b))): ClassExpr)
      else Nil) ++
      (if (config.negation) tbox.leafClasses().map(c => Not(Named(c)): ClassExpr) else Nil) ++
      (if (config.cardinality) roles.map(p => MinCard(2, p, Top): ClassExpr) else Nil) ++
      (if (config.maxCardinality)
        roles.map(p => MaxCard(config.maxCardN, p, Top): ClassExpr)
      else Nil) ++
      (if (config.inverse) roles.map(p => ExistsInverse(p, Top): ClassExpr) else Nil) ++
      config.boolProps.sorted.flatMap(p =>
        Seq(DataBoolHasValue(p, value = true), DataBoolHasValue(p, value = false))) ++
      config.dataSplits.toSeq.sortBy(_._1).flatMap { case (p, vs) =>
        if (vs.isEmpty) Nil
        else Seq(DataCompare(p, ">=", vs.min), DataCompare(p, "<=", vs.max))
      } ++
      config.timeSplits.toSeq.sortBy(_._1).flatMap { case (p, vs) =>
        if (vs.isEmpty) Nil
        else Seq(DataTimeCompare(p, ">=", vs.min), DataTimeCompare(p, "<=", vs.max))
      } ++
      (if (config.universalData)
        config.dataSplits.toSeq.sortBy(_._1).flatMap { case (p, vs) =>
          if (vs.isEmpty) Nil
          else Seq(DataForAll(p, "<=", vs.max), DataForAll(p, ">=", vs.min))
        }
      else Nil)
  }

  private def mkAnd(cs: Seq[ClassExpr]): ClassExpr = {
    val flat = cs.flatMap { case And(xs) => xs; case x => Seq(x) }
      .distinctBy(ClassExpr.render).sortBy(ClassExpr.render)
    if (flat.size == 1) flat.head else And(flat)
  }

  /** canonicalized ⊔ — flattened, deduped, render-sorted, like [[mkAnd]] */
  private def mkOr(cs: Seq[ClassExpr]): ClassExpr = {
    val flat = cs.flatMap { case Or(xs) => xs; case x => Seq(x) }
      .distinctBy(ClassExpr.render).sortBy(ClassExpr.render)
    if (flat.size == 1) flat.head else Or(flat)
  }

  private def conj(c: ClassExpr): Seq[ClassExpr] =
    atomics.filterNot(_ == c).map(a => mkAnd(Seq(c, a)))

  /** canonical form: conjunctions flattened/deduped/render-sorted, applied
    * recursively through restriction fillers */
  private def norm(c: ClassExpr): ClassExpr = c match {
    case And(cs)             => mkAnd(cs.map(norm))
    case Or(cs)              => mkOr(cs.map(norm))
    case Not(x)              => Not(norm(x))
    case Exists(r, f)        => Exists(r, norm(f))
    case ForAll(r, f)        => ForAll(r, norm(f))
    case MinCard(n, r, f)    => MinCard(n, r, norm(f))
    case MaxCard(n, r, f)    => MaxCard(n, r, norm(f))
    case ExactCard(n, r, f)  => ExactCard(n, r, norm(f))
    case ExistsInverse(r, f) => ExistsInverse(r, norm(f))
    case ForAllInverse(r, f) => ForAllInverse(r, norm(f))
    case other               => other
  }

  /** next rung strictly above / below `v` in the property's split ladder */
  private def rungUp(p: String, v: Double): Option[Double] =
    config.dataSplits.getOrElse(p, Nil).filter(_ > v).minOption
  private def rungDown(p: String, v: Double): Option[Double] =
    config.dataSplits.getOrElse(p, Nil).filter(_ < v).maxOption
  // ISO lexical forms: string order is chronological order
  private def timeRungUp(p: String, v: String): Option[String] =
    config.timeSplits.getOrElse(p, Nil).filter(_ > v).minOption
  private def timeRungDown(p: String, v: String): Option[String] =
    config.timeSplits.getOrElse(p, Nil).filter(_ < v).maxOption

  def apply(ce0: ClassExpr): Seq[ClassExpr] = {
    val ce = norm(ce0)
    val refs: Seq[ClassExpr] = ce match {
      case Top          => atomics
      case Named(c)     => tbox.directSubClassesOf(c).map(Named(_): ClassExpr) ++ conj(ce)
      // downward: B ⊒ A ⇒ ¬B ⊑ ¬A, so ¬A walks to the negated parents
      case Not(Named(c)) => tbox.directParentsOf(c).map(p => Not(Named(p)): ClassExpr) ++ conj(ce)
      case Exists(r, f) => this(f).map(Exists(r, _)) ++ conj(ce)
      case ForAll(r, f) => this(f).map(ForAll(r, _)) ++ conj(ce)
      case MinCard(n, r, f) =>
        (if (n < config.maxCardN) Seq(MinCard(n + 1, r, f)) else Nil) ++
          (if (config.maxCardinality) Seq(ExactCard(n, r, f)) else Nil) ++
          this(f).map(MinCard(n, r, _)) ++ conj(ce)
      // ≤ tightens n down only: a SMALLER filler admits MORE individuals
      // under ≤ (upward), so the filler never refines here; =n ⊑ ≤n
      case MaxCard(n, r, f) =>
        (if (n > 0) Seq(MaxCard(n - 1, r, f)) else Nil) ++
          Seq(ExactCard(n, r, f)) ++ conj(ce)
      case Or(cs) =>
        cs.indices.flatMap(i => this(cs(i)).map(r => mkOr(cs.updated(i, r)))) ++
          (if (cs.size > 1) cs.indices.map(i => mkOr(cs.patch(i, Nil, 1))) else Nil) ++
          conj(ce)
      case ExistsInverse(r, f) => this(f).map(ExistsInverse(r, _)) ++ conj(ce)
      case ForAllInverse(r, f) => this(f).map(ForAllInverse(r, _)) ++ conj(ce)
      case DataCompare(p, ">=", v) =>
        rungUp(p, v).map(DataCompare(p, ">=", _)).toSeq ++ conj(ce)
      case DataCompare(p, "<=", v) =>
        rungDown(p, v).map(DataCompare(p, "<=", _)).toSeq ++ conj(ce)
      case DataTimeCompare(p, ">=", v) =>
        timeRungUp(p, v).map(DataTimeCompare(p, ">=", _)).toSeq ++ conj(ce)
      case DataTimeCompare(p, "<=", v) =>
        timeRungDown(p, v).map(DataTimeCompare(p, "<=", _)).toSeq ++ conj(ce)
      // ∀ tightens toward the bound that excludes more assertions
      case DataForAll(p, "<=", v) =>
        rungDown(p, v).map(DataForAll(p, "<=", _)).toSeq ++ conj(ce)
      case DataForAll(p, ">=", v) =>
        rungUp(p, v).map(DataForAll(p, ">=", _)).toSeq ++ conj(ce)
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

object Refine {
  /** Exact rank-based k-quantile split ladder for a numeric data property:
    * the elements of the ASCENDING sorted distinct-value sequence at
    * indices floor(i·m/k), i = 1..k−1. Rank-based (no interpolation), so
    * any SQL engine reproduces the exact rung values. Each rung is a
    * TakeOrdered-limit + max — never a full value collect; cost is one
    * distinct + k jobs, driver-bounded, and each rung's TakeOrdered
    * materializes idx+1 rows on one task — fine at gate scale, not the
    * 100-TB path. There, use [[approxSplitsFor]]: one sketch aggregate,
    * rank drift bounded and measured (LearnerSpec). ρ only ever reads the
    * ladder, so the two are drop-in interchangeable. */
  def splitsFor(kb: graft.core.Kb, prop: String, k: Int): Seq[Double] = {
    import org.apache.spark.sql.functions._
    // try_cast: under ANSI a plain cast throws on ANY non-numeric lexical
    // in the scan (even another property's, by predicate-order luck) —
    // unparseable values are simply not ladder material
    val dv = kb.attrs.filter(col("prop") === prop)
      .select(expr("try_cast(lexical AS double)").as("v"))
      .filter(col("v").isNotNull).distinct().cache()
    try {
      val m = dv.count()
      (1 until k).map(i => (i * m / k).toInt).distinct
        .filter(idx => idx >= 0 && idx < m).map { idx =>
          dv.orderBy(col("v")).limit(idx + 1)
            .agg(max(col("v"))).collect()(0).getDouble(0)
        }
    } finally dv.unpersist()
  }

  /** The 100-TB ladder: the same k-quantile semantics as [[splitsFor]]
    * (quantiles of the DISTINCT value set) from ONE `approx_percentile`
    * aggregate — a Greenwald-Khanna sketch pass, no per-rung TakeOrdered
    * jobs and no single-task materialization. The sketch contract bounds
    * each returned rung's rank drift by m/accuracy (ε = 1/accuracy over m
    * distinct values); LearnerSpec measures the bound against the exact
    * ladder at fixture scale. Returned rungs are real data values
    * (approx_percentile interpolates nothing), deduped and ascending. */
  def approxSplitsFor(kb: graft.core.Kb, prop: String, k: Int,
                      accuracy: Int = 10000): Seq[Double] = {
    import org.apache.spark.sql.functions._
    val dv = kb.attrs.filter(col("prop") === prop)
      .select(expr("try_cast(lexical AS double)").as("v"))
      .filter(col("v").isNotNull).distinct()
    val probs = (1 until k).map(i => lit(i.toDouble / k))
    val row = dv.agg(percentile_approx(col("v"), array(probs: _*), lit(accuracy)).as("r"))
      .collect()(0)
    // zero numeric values → the sketch aggregate returns NULL, not an
    // empty array; mirror splitsFor's empty-ladder contract
    if (row.isNullAt(0)) Nil else row.getSeq[Double](0).distinct.sorted
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
          maxIterations: Int = 20, maxLen: Int = 7, topN: Int = 3,
          config: RefineConfig = RefineConfig()): FitResult = {
    val rho = new Refine(kb.tbox, maxLen, config)
    val tree = new SearchTreePriorityQueue(kb, elp, metric, heuristic)
    val root = tree.addRoot(graft.expr.Top)
    var goal = root.quality == 1
    val expanded = scala.collection.mutable.Set.empty[ClassExpr]
    var exhausted = false
    var it = 0
    while (!goal && !exhausted && it < maxIterations) {
      // heap-served frontier: O(log n) amortized per expansion instead of
      // the old O(|tree|) registry scan (O(n²) over a long run); selection
      // order — (heuristic desc, render) over unexpanded nodes — is
      // IDENTICAL, which LearnerSpec cross-checks against the scan
      tree.popBestUnexpanded(expanded) match {
        case None => exhausted = true // frontier exhausted: true count stands
        case Some(n) =>
          it += 1
          expanded += n.concept
          goal = tree.addNodes(rho(n.concept), n).exists(_.contains(true))
      }
    }
    FitResult(tree.getTopN(topN), goal, it, tree.nodes.size)
  }
}
