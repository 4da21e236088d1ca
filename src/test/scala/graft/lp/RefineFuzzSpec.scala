package graft.lp

import graft.expr._
import graft.fixtures.FamilyKb
import org.scalatest.funsuite.AnyFunSuite

/** Seeded fuzz over random class-expression trees: ρ's structural
  * guarantees hold on arbitrary input, not just the shapes the learner
  * happens to produce. Pure driver-side — no Spark session. */
class RefineFuzzSpec extends AnyFunSuite {

  private val rnd = new scala.util.Random(1337)
  private val classes = Seq("person", "male", "female")
  private val roles = Seq("hasChild", "married")

  private def randomCe(depth: Int): ClassExpr =
    if (depth == 0) {
      if (rnd.nextInt(4) == 0) Top else Named(classes(rnd.nextInt(classes.size)))
    } else rnd.nextInt(5) match {
      case 0 => Named(classes(rnd.nextInt(classes.size)))
      case 1 => Exists(roles(rnd.nextInt(roles.size)), randomCe(depth - 1))
      case 2 => ForAll(roles(rnd.nextInt(roles.size)), randomCe(depth - 1))
      case _ => And((0 until 2 + rnd.nextInt(2)).map(_ => randomCe(depth - 1)))
    }

  test("500 random trees: length cap, canonical flat ⊓, no self, sorted distinct output") {
    val rho = new Refine(FamilyKb.tbox, maxLen = 9)
    def flatSorted(c: ClassExpr): Boolean = c match {
      case And(cs) =>
        cs.forall { case And(_) => false; case x => flatSorted(x) } &&
          cs.map(ClassExpr.render) == cs.map(ClassExpr.render).sorted
      case Exists(_, f) => flatSorted(f)
      case ForAll(_, f) => flatSorted(f)
      case Not(x)       => flatSorted(x)
      case _            => true
    }
    for (_ <- 1 to 500) {
      val ce = randomCe(2 + rnd.nextInt(2))
      val refs = rho(ce)
      val renders = refs.map(ClassExpr.render)
      assert(refs.forall(ClassExpr.length(_) <= 9), s"length cap broken for $ce")
      assert(renders == renders.sorted && renders.distinct == renders,
        s"output not sorted-distinct for $ce")
      assert(refs.forall(flatSorted), s"non-canonical ⊓ in refinements of $ce")
      // a concept never refines to (a syntactic variant of) itself
      val variants = (refs.map(ClassExpr.render).toSet intersect
        Set(ClassExpr.render(ce)))
      assert(variants.isEmpty, s"self-refinement for $ce")
    }
  }

  test("permuted conjunctions refine identically") {
    for (_ <- 1 to 200) {
      val cs = (0 until 2 + rnd.nextInt(3)).map(_ => randomCe(2))
      val rho = new Refine(FamilyKb.tbox)
      assert(rho(And(cs)) === rho(And(rnd.shuffle(cs))))
    }
  }

  // ---- extended dialect (RefineConfig) ----

  private val fullCfg = RefineConfig(negation = true, cardinality = true,
    maxCardN = 4, inverse = true, boolProps = Seq("flag"),
    dataSplits = Map("age" -> Seq(20.0, 40.0, 60.0)),
    timeSplits = Map("born" -> Seq("1960-01-01", "1990-01-01")),
    universalData = true)

  private def randomCeExt(depth: Int): ClassExpr =
    if (depth == 0) {
      if (rnd.nextInt(4) == 0) Top else Named(classes(rnd.nextInt(classes.size)))
    } else rnd.nextInt(9) match {
      case 0 => Named(classes(rnd.nextInt(classes.size)))
      case 1 => Exists(roles(rnd.nextInt(roles.size)), randomCeExt(depth - 1))
      case 2 => ForAll(roles(rnd.nextInt(roles.size)), randomCeExt(depth - 1))
      case 3 => Not(Named(classes(rnd.nextInt(classes.size))))
      case 4 => MinCard(1 + rnd.nextInt(4), roles(rnd.nextInt(roles.size)), randomCeExt(depth - 1))
      case 5 => ExistsInverse(roles(rnd.nextInt(roles.size)), randomCeExt(depth - 1))
      case 6 => DataCompare("age", if (rnd.nextBoolean()) ">=" else "<=",
        Seq(20.0, 40.0, 60.0)(rnd.nextInt(3)))
      case 7 => DataBoolHasValue("flag", rnd.nextBoolean())
      case _ => And((0 until 2 + rnd.nextInt(2)).map(_ => randomCeExt(depth - 1)))
    }

  test("extended atomics: each configured atom group, most-general forms only") {
    val rho = new Refine(FamilyKb.tbox, maxLen = 9, fullCfg)
    val renders = rho(Top).map(ClassExpr.render)
    assert(renders.contains("¬male") && renders.contains("¬female"))
    assert(!renders.contains("¬person")) // negation seeds at LEAVES (most general ¬)
    assert(renders.contains("≥2 hasChild.⊤") && renders.contains("≥2 married.⊤"))
    assert(renders.contains("∃hasChild⁻.⊤") && renders.contains("∃married⁻.⊤"))
    assert(renders.contains("∃flag.{true}") && renders.contains("∃flag.{false}"))
    assert(renders.contains("∃age.(>= 20.0)") && renders.contains("∃age.(<= 60.0)"))
    assert(!renders.contains("∃age.(>= 40.0)")) // inner rungs come from ρ, not ⊤
    assert(renders.contains("∃born.(>= 1960-01-01)") &&
      renders.contains("∃born.(<= 1990-01-01)"))
    assert(renders.contains("∀age.(<= 60.0)") && renders.contains("∀age.(>= 20.0)"))
  }

  test("time and universal-data ladders step like the numeric one") {
    val rho = new Refine(FamilyKb.tbox, maxLen = 9, fullCfg)
    assert(rho(DataTimeCompare("born", ">=", "1960-01-01"))
      .contains(DataTimeCompare("born", ">=", "1990-01-01")))
    assert(!rho(DataTimeCompare("born", ">=", "1990-01-01")).exists {
      case DataTimeCompare(_, ">=", _) => true; case _ => false
    })
    // ∀ tightens: a SMALLER ≤-bound / LARGER ≥-bound excludes more
    assert(rho(DataForAll("age", "<=", 60.0)).contains(DataForAll("age", "<=", 40.0)))
    assert(rho(DataForAll("age", ">=", 20.0)).contains(DataForAll("age", ">=", 40.0)))
  }

  test("negation walks downward: ¬leaf → ¬parent, ¬root is a ¬-fixpoint") {
    val rho = new Refine(FamilyKb.tbox, maxLen = 9, RefineConfig(negation = true))
    assert(rho(Not(Named("male"))).contains(Not(Named("person"))))
    assert(!rho(Not(Named("person"))).exists {
      case Not(_) => true; case _ => false
    })
  }

  test("cardinality tightens one step and respects maxCardN") {
    val rho = new Refine(FamilyKb.tbox, maxLen = 9, fullCfg)
    assert(rho(MinCard(2, "hasChild", Top)).contains(MinCard(3, "hasChild", Top)))
    assert(!rho(MinCard(4, "hasChild", Top)).exists {
      case MinCard(n, _, _) => n > 4; case _ => false
    })
    // the filler still refines under the count
    assert(rho(MinCard(2, "hasChild", Top)).contains(MinCard(2, "hasChild", Named("person"))))
  }

  test("numeric split ladder steps exactly one rung per refinement") {
    val rho = new Refine(FamilyKb.tbox, maxLen = 9, fullCfg)
    assert(rho(DataCompare("age", ">=", 20.0)).contains(DataCompare("age", ">=", 40.0)))
    assert(!rho(DataCompare("age", ">=", 20.0)).contains(DataCompare("age", ">=", 60.0)))
    assert(rho(DataCompare("age", "<=", 60.0)).contains(DataCompare("age", "<=", 40.0)))
    assert(!rho(DataCompare("age", ">=", 60.0)).exists {
      case DataCompare(_, ">=", _) => true; case _ => false
    })
  }

  test("500 random extended trees keep the structural guarantees") {
    val rho = new Refine(FamilyKb.tbox, maxLen = 11, fullCfg)
    for (_ <- 1 to 500) {
      val ce = randomCeExt(2 + rnd.nextInt(2))
      val refs = rho(ce)
      val renders = refs.map(ClassExpr.render)
      assert(refs.forall(ClassExpr.length(_) <= 11), s"length cap broken for $ce")
      assert(renders == renders.sorted && renders.distinct == renders,
        s"output not sorted-distinct for $ce")
      assert(!renders.contains(ClassExpr.render(ce)), s"self-refinement for $ce")
    }
  }

  test("extended dialect: permuted conjunctions still refine identically") {
    val rho = new Refine(FamilyKb.tbox, maxLen = 11, fullCfg)
    for (_ <- 1 to 200) {
      val cs = (0 until 2 + rnd.nextInt(3)).map(_ => randomCeExt(2))
      assert(rho(And(cs)) === rho(And(rnd.shuffle(cs))))
    }
  }

  // ---- union + max/exact cardinality (round-5 dialect growth) ----

  private val unionCfg = fullCfg.copy(union = true, maxCardinality = true)

  test("union atoms: root pairs only, canonical ⊔; ρ(⊔) refines or drops a disjunct") {
    val rho = new Refine(FamilyKb.tbox, maxLen = 9, unionCfg)
    val atoms = rho(Top).map(ClassExpr.render)
    // person is the single root in FamilyKb — no proper root pair exists
    assert(!atoms.exists(_.contains("⊔")))
    val or = Or(Seq(Named("female"), Named("male")))
    val refs = rho(or).map(ClassExpr.render)
    // drop-a-disjunct
    assert(refs.contains("female") && refs.contains("male"))
    // a disjunct refinement stays inside the ⊔ (male/female are leaves, so
    // only their conj-forms refine them — capped shapes aside, the ⊓ lands
    // INSIDE the union)
    assert(refs.exists(r => r.contains("⊔") && r.contains("⊓")))
    // permutation-canonical: reversed input refines identically
    assert(rho(Or(Seq(Named("male"), Named("female")))) === rho(or))
    // no self-refinement under either permutation
    assert(!refs.contains(ClassExpr.render(or)))
  }

  test("≤n tightens down only (never the filler), =n comes from both sides") {
    val rho = new Refine(FamilyKb.tbox, maxLen = 9, unionCfg)
    val atoms = rho(Top)
    assert(atoms.contains(MaxCard(4, "hasChild", Top)), "≤maxCardN r.⊤ atom missing")
    val refs = rho(MaxCard(4, "hasChild", Top))
    assert(refs.contains(MaxCard(3, "hasChild", Top)))
    assert(refs.contains(ExactCard(4, "hasChild", Top)))
    // the ≤-filler must NOT refine (that move is upward)
    assert(!refs.exists {
      case MaxCard(4, _, f) => f != Top; case _ => false
    })
    // floor: ≤0 has no count refinement, still proposes =0
    val atZero = rho(MaxCard(0, "hasChild", Top))
    assert(!atZero.exists { case MaxCard(_, _, _) => true; case _ => false })
    assert(atZero.contains(ExactCard(0, "hasChild", Top)))
    // ≥n proposes =n when maxCardinality is on
    assert(rho(MinCard(2, "hasChild", Top)).contains(ExactCard(2, "hasChild", Top)))
    // =n is a cardinality fixpoint (conj-only)
    assert(!rho(ExactCard(2, "hasChild", Top)).exists {
      case ExactCard(_, _, _) => true
      case MinCard(_, _, _) | MaxCard(_, _, _) => true
      case _ => false
    })
  }

  private def randomCeUnion(depth: Int): ClassExpr =
    if (depth == 0) {
      if (rnd.nextInt(4) == 0) Top else Named(classes(rnd.nextInt(classes.size)))
    } else rnd.nextInt(4) match {
      case 0 => Or((0 until 2 + rnd.nextInt(2)).map(_ => randomCeUnion(depth - 1)))
      case 1 => MaxCard(rnd.nextInt(4), roles(rnd.nextInt(roles.size)), randomCeUnion(depth - 1))
      case 2 => ExactCard(rnd.nextInt(4), roles(rnd.nextInt(roles.size)), randomCeUnion(depth - 1))
      case _ => randomCeExt(depth)
    }

  test("300 random union/cardinality trees keep the structural guarantees") {
    val rho = new Refine(FamilyKb.tbox, maxLen = 11, unionCfg)
    def flatSortedOr(c: ClassExpr): Boolean = c match {
      case Or(cs) =>
        cs.forall { case Or(_) => false; case x => flatSortedOr(x) } &&
          cs.map(ClassExpr.render) == cs.map(ClassExpr.render).sorted
      case And(cs)       => cs.forall(flatSortedOr)
      case Exists(_, f)  => flatSortedOr(f)
      case ForAll(_, f)  => flatSortedOr(f)
      case Not(x)        => flatSortedOr(x)
      case MinCard(_, _, f) => flatSortedOr(f)
      case MaxCard(_, _, f) => flatSortedOr(f)
      case ExactCard(_, _, f) => flatSortedOr(f)
      case _             => true
    }
    for (_ <- 1 to 300) {
      val ce = randomCeUnion(2 + rnd.nextInt(2))
      val refs = rho(ce)
      val renders = refs.map(ClassExpr.render)
      assert(refs.forall(ClassExpr.length(_) <= 11), s"length cap broken for $ce")
      assert(renders == renders.sorted && renders.distinct == renders,
        s"output not sorted-distinct for $ce")
      assert(refs.forall(flatSortedOr), s"non-canonical ⊔ in refinements of $ce")
      assert(!renders.contains(ClassExpr.render(ce)), s"self-refinement for $ce")
    }
  }
}
