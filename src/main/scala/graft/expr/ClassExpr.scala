package graft.expr

/** OWL class-expression dialect (SURVEY §2.7) — the constructors the
  * reference's ConceptGenerator exposes (reference
  * ontolearn_light/concept_generator.py:17-266), as a Scala ADT.
  *
  * Expressions are *logical plans*: [[Eval]] interprets a tree into a
  * DataFrame of member individuals; Catalyst then optimizes the composed
  * plan (constant folding, pushdown, join selection) for free.
  */
sealed trait ClassExpr

case object Top extends ClassExpr                                // owl:Thing
case object Bottom extends ClassExpr                             // owl:Nothing
final case class Named(cls: String) extends ClassExpr            // named class, subclass closure
final case class And(cs: Seq[ClassExpr]) extends ClassExpr       // C ⊓ D (concept_generator.py:66-83)
final case class Or(cs: Seq[ClassExpr]) extends ClassExpr        // C ⊔ D (:86-103)
final case class Not(c: ClassExpr) extends ClassExpr             // ¬C (:242-256)
final case class Exists(prop: String, filler: ClassExpr) extends ClassExpr  // ∃r.C (:106-118)
final case class ForAll(prop: String, filler: ClassExpr) extends ClassExpr  // ∀r.C (:121-133); OWA quirk: no r-edge ⇒ member
final case class HasValue(prop: String, ind: String) extends ClassExpr      // ∃r.{x} (:135-147)
final case class MinCard(n: Int, prop: String, filler: ClassExpr) extends ClassExpr  // ≥n r.C (:149-163)
final case class MaxCard(n: Int, prop: String, filler: ClassExpr) extends ClassExpr  // ≤n r.C (:165-179)
final case class ExactCard(n: Int, prop: String, filler: ClassExpr) extends ClassExpr // =n r.C (:181-195)
final case class OneOf(inds: Seq[String]) extends ClassExpr       // nominal {a, b, …} (OWLObjectOneOf, reference knowledge_base.py:272,283)

/** Data-property restrictions (:197-240). `op` ∈ {<, <=, >, >=, =};
  * `dtype` selects the cast applied to the lexical form. */
final case class DataCompare(prop: String, op: String, value: Double) extends ClassExpr
final case class DataHasValue(prop: String, lexical: String) extends ClassExpr

object ClassExpr {
  /** Canonical render (DL syntax-ish) — used as cache key (reference LRU
    * memoization, knowledge_base.py:539-563). */
  def render(ce: ClassExpr): String = ce match {
    case Top => "⊤"
    case Bottom => "⊥"
    case Named(c) => c
    case And(cs) => cs.map(render).mkString("(", " ⊓ ", ")")
    case Or(cs) => cs.map(render).mkString("(", " ⊔ ", ")")
    case Not(c) => s"¬${render(c)}"
    case Exists(r, f) => s"∃$r.${render(f)}"
    case ForAll(r, f) => s"∀$r.${render(f)}"
    case HasValue(r, x) => s"∃$r.{$x}"
    case MinCard(n, r, f) => s"≥$n $r.${render(f)}"
    case MaxCard(n, r, f) => s"≤$n $r.${render(f)}"
    case ExactCard(n, r, f) => s"=$n $r.${render(f)}"
    case OneOf(xs) => xs.mkString("{", ", ", "}")
    case DataCompare(p, op, v) => s"∃$p.($op $v)"
    case DataHasValue(p, l) => s"∃$p.{$l}"
  }
}
