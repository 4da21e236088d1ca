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

/** Inverse-role restrictions ∃r⁻.C / ∀r⁻.C (ObjectInverseOf — the
  * reference's most_general_*_restrictions_inverse generators,
  * knowledge_base.py:902-940): r⁻ connects y to x whenever (x, r, y). */
final case class ExistsInverse(prop: String, filler: ClassExpr) extends ClassExpr
final case class ForAllInverse(prop: String, filler: ClassExpr) extends ClassExpr

/** Data-property restrictions (:197-240). `op` ∈ {<, <=, >, >=, =};
  * `dtype` selects the cast applied to the lexical form. */
final case class DataCompare(prop: String, op: String, value: Double) extends ClassExpr
final case class DataHasValue(prop: String, lexical: String) extends ClassExpr

/** ∀p.(op v) — data universal restriction (data_universal_restriction,
  * concept_generator.py:213-226). OWA structural semantics like [[ForAll]]:
  * an individual with NO p-assertion is (vacuously) a member. */
final case class DataForAll(prop: String, op: String, value: Double) extends ClassExpr

/** Typed data compares over the F11 typed-cast materialization
  * (knowledge_base.py:831-862 most_general_boolean/time_data_properties
  * feed these restriction shapes). */
final case class DataBoolHasValue(prop: String, value: Boolean) extends ClassExpr
final case class DataTimeCompare(prop: String, op: String, value: String) extends ClassExpr

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
    case ExistsInverse(r, f) => s"∃$r⁻.${render(f)}"
    case ForAllInverse(r, f) => s"∀$r⁻.${render(f)}"
    case DataCompare(p, op, v) => s"∃$p.($op $v)"
    case DataHasValue(p, l) => s"∃$p.{$l}"
    case DataForAll(p, op, v) => s"∀$p.($op $v)"
    case DataBoolHasValue(p, b) => s"∃$p.{$b}"
    case DataTimeCompare(p, op, t) => s"∃$p.($op $t)"
  }

  /** concept_len (reference knowledge_base.py:512-524, which delegates to
    * owlapy's OWLClassExpressionLengthMetric.get_default()): named class /
    * ⊤ / ⊥ / nominal = 1; ⊓ and ⊔ = Σ operand lengths + (n−1); ¬C = 1+|C|;
    * ∃r.C and ∀r.C = 2+|C| (quantifier 1 + role 1); hasValue = 3 (weight 2
    * + role 1); cardinality restrictions = 3+|C| (weight 2 + role 1 +
    * filler); an inverse role costs 2 instead of 1; data restrictions =
    * quantifier/weight + role + a length-1 data range. */
  def length(ce: ClassExpr): Int = ce match {
    case Top | Bottom | Named(_) | OneOf(_) => 1
    case And(cs) => cs.map(length).sum + (cs.size - 1)
    case Or(cs) => cs.map(length).sum + (cs.size - 1)
    case Not(c) => 1 + length(c)
    case Exists(_, f) => 2 + length(f)
    case ForAll(_, f) => 2 + length(f)
    case ExistsInverse(_, f) => 3 + length(f)
    case ForAllInverse(_, f) => 3 + length(f)
    case HasValue(_, _) => 3
    case MinCard(_, _, f) => 3 + length(f)
    case MaxCard(_, _, f) => 3 + length(f)
    case ExactCard(_, _, f) => 3 + length(f)
    case DataCompare(_, _, _) => 3
    case DataHasValue(_, _) => 3
    case DataForAll(_, _, _) => 3
    case DataBoolHasValue(_, _) => 3
    case DataTimeCompare(_, _, _) => 3
  }
}
