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
}
