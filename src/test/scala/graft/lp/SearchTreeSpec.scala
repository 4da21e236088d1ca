package graft.lp

import graft.SparkSpec
import graft.expr._
import graft.fixtures.FamilyKb

/** T2 SearchTreePriorityQueue parity (reference search.py:511-665) on the
  * family fixture. LP: pos = males, neg = females — so `male` is the goal
  * concept (F1 = 1), `female` is weak (tp = 0 ⇒ quality 0), `person` is
  * in between (recall 1, precision ½).
  */
class SearchTreeSpec extends SparkSpec {

  private def setup() = {
    val kb = FamilyKb.kb(spark)
    val elp = LearningProblem.encode(kb, Lp(FamilyKb.males, FamilyKb.females))
    (kb, elp)
  }

  test("add_root scores the root and registers it") {
    val (kb, elp) = setup()
    val tree = new SearchTreePriorityQueue(kb, elp)
    val root = tree.addRoot(Top)
    assert(root.isRoot)
    // ⊤ retrieves all 16 individuals; tp=6, fp=6, fn=0 ⇒ F1 = 2/3
    assert(root.individualsCount === FamilyKb.all.size)
    assert(root.quality === 0.66667)
    assert(tree.nodes.size === 1)
    intercept[IllegalArgumentException](tree.addRoot(Top)) // :554 assert not nodes
  }

  test("add_node batch: goal / weak / neither, weak never enters the tree") {
    val (kb, elp) = setup()
    val tree = new SearchTreePriorityQueue(kb, elp)
    val root = tree.addRoot(Top)
    val res = tree.addNodes(
      Seq(Named("male"), Named("female"), Named("person")), root)
    assert(res === Seq(Some(true), Some(false), None))
    assert(tree.nodes.contains(Named("male")))
    assert(!tree.nodes.contains(Named("female"))) // weak: :593-594 returns before put
    assert(tree.nodes.contains(Named("person")))
    assert(root.children.map(_.concept).toSet === Set(Named("male"), Named("person")))
    assert(tree.nodes(Named("male")).parent.contains(root))
  }

  test("batched scores match single evaluate_concept") {
    val (kb, elp) = setup()
    val ces: Seq[ClassExpr] = Seq(
      Top, Named("male"), Named("person"),
      Exists("hasChild", Named("female")), Named("female"))
    val batch = LearningProblem.evaluateConceptsBatch(kb, ces, F1, elp)
    val singles = ces.map(LearningProblem.evaluateConcept(kb, _, F1, elp))
    assert(batch.map(t => (t._1, t._2)) === singles)
  }

  test("get_most_promising pops the top heuristic and re-puts it") {
    val (kb, elp) = setup()
    val tree = new SearchTreePriorityQueue(kb, elp)
    val root = tree.addRoot(Top)
    tree.addNodes(Seq(Named("male"), Named("person")), root)
    // male: F1 = 1.0 — top of the heap, and still there on a repeat call
    assert(tree.getMostPromising().concept === Named("male"))
    assert(tree.getMostPromising().concept === Named("male"))
  }

  test("heuristic ties pop in canonical-render order") {
    val (kb, elp) = setup()
    // constant heuristic: every node ties; reference falls back to the
    // total order on the concept (search.py:446-470)
    val tree = new SearchTreePriorityQueue(kb, elp, F1, _ => 0.5)
    val root = tree.addRoot(Top)
    tree.addNodes(Seq(Named("person"), Named("male")), root)
    assert(tree.getMostPromising().render === "male") // 'm' < 'p' < '⊤'
  }

  test("re-parenting: improved heuristic moves the node, stale does not") {
    val (kb, elp) = setup()
    var bonus = 0.0
    val tree = new SearchTreePriorityQueue(kb, elp, F1, n => n.quality + bonus)
    val root = tree.addRoot(Top)
    tree.addNodes(Seq(Named("male"), Named("person")), root)
    val person = tree.nodes(Named("person"))
    val male = tree.nodes(Named("male"))
    // same heuristic ⇒ no re-parent (search.py:585 strict >)
    assert(tree.addNode(Named("male"), person) === None)
    assert(male.parent.contains(root))
    // improved heuristic ⇒ re-parent under the new parent (:586-590)
    bonus = 0.25
    assert(tree.addNode(Named("male"), person) === None)
    assert(male.parent.contains(person))
    assert(person.children.contains(male))
    assert(!root.children.contains(male))
    assert(male.heuristic === male.quality + 0.25)
  }

  test("celoe heuristic: gain reads the CANDIDATE parent during re-parent") {
    val (kb, elp) = setup()
    // parent-dependent scorer — gain = quality − parent.quality
    val tree = new SearchTreePriorityQueue(kb, elp, F1,
      Heuristics.celoe(gainBonus = 0.3, lengthPenalty = 0.0))
    val root = tree.addRoot(Top)                       // q = 2/3
    tree.addNodes(Seq(Named("male"), Named("person")), root)
    val male = tree.nodes(Named("male"))               // q = 1
    val person = tree.nodes(Named("person"))           // q = 2/3
    val hUnderRoot = male.heuristic                    // 1 + 0.3·(1 − 2/3)
    // re-offer male under `person` (same quality as root ⇒ same gain):
    // renewed == old, strict > fails, parent must be RESTORED
    assert(tree.addNode(Named("male"), person) === None)
    assert(male.parent.contains(root))
    assert(male.heuristic === hUnderRoot)
    // a worse parent means MORE gain for the same quality: the candidate
    // parent must be swapped in BEFORE scoring, or the branch is dead code
    val order = tree.addNode(Named("Order-ish"), root) // garbage name: weak
    assert(order === Some(false))
    val female = new LblNode(Named("female"))          // build a low-q parent
    female.quality = 0.0
    female.heuristic = 0.0
    tree.add(female)
    assert(tree.addNode(Named("male"), female) === None)
    assert(male.parent.contains(female), "gain vs the candidate parent must re-parent")
    assert(male.heuristic === 1.0 + 0.3 * (1.0 - 0.0))
    assert(female.children.contains(male) && !root.children.contains(male))
  }

  test("get_top_n by each key, bad key raises") {
    val (kb, elp) = setup()
    val tree = new SearchTreePriorityQueue(kb, elp)
    val root = tree.addRoot(Top)
    tree.addNodes(Seq(Named("male"), Named("person"),
      Exists("hasChild", Named("male"))), root)
    assert(tree.getTopN(2).map(_.render) === Seq("male", "person"))
    assert(tree.getTopN(1, "heuristic").head.render === "male")
    // lengths: ∃hasChild.male = 3, the named classes = 1, ⊤ = 1
    assert(tree.getTopN(1, "length").head.render === "∃hasChild.male")
    intercept[NoSuchElementException](tree.getTopN(1, "bogus"))
  }

  test("clean empties the tree; toDf mirrors the registry") {
    val (kb, elp) = setup()
    val tree = new SearchTreePriorityQueue(kb, elp)
    val root = tree.addRoot(Top)
    tree.addNodes(Seq(Named("male")), root)
    val df = tree.toDf(spark)
    assert(df.columns.toSeq ===
      Seq("concept", "quality", "heuristic", "len", "individuals"))
    assert(df.count() === 2)
    tree.clean()
    assert(tree.nodes.isEmpty)
    intercept[NoSuchElementException](tree.getMostPromising())
  }

  // ---- heap-served frontier (Learner.fit's selection path) ----

  private def driverTree() = new SearchTreePriorityQueue(null, null)

  test("popBestUnexpanded == the (heuristic desc, render) scan selection") {
    val rnd = new scala.util.Random(7)
    val tree = driverTree()
    val all = (0 until 1000).map { i =>
      val n = new LblNode(graft.expr.Named(f"c$i%04d"))
      n.quality = rnd.nextInt(50) / 50.0 // coarse grid → many exact ties
      n.heuristic = n.quality
      tree.add(n); n
    }
    val expanded = scala.collection.mutable.Set.empty[graft.expr.ClassExpr]
    val popped = scala.collection.mutable.Buffer.empty[String]
    var done = false
    while (!done) tree.popBestUnexpanded(expanded) match {
      case Some(n) => popped += n.render; expanded += n.concept
      case None => done = true
    }
    val reference = all.sortBy(n => (-n.heuristic, n.render)).map(_.render)
    assert(popped.toSeq === reference)
  }

  test("stale heap entries are discarded after a score improvement") {
    val tree = driverTree()
    val a = new LblNode(graft.expr.Named("a"))
    a.quality = 0.1; a.heuristic = 0.1
    tree.add(a)
    val b = new LblNode(graft.expr.Named("b"))
    b.quality = 0.5; b.heuristic = 0.5
    tree.add(b)
    a.heuristic = 0.9 // improved (re-parent shape) → fresh entry
    tree.add(a)
    val expanded = scala.collection.mutable.Set.empty[graft.expr.ClassExpr]
    val order = Iterator.continually(tree.popBestUnexpanded(expanded))
      .takeWhile(_.isDefined).map { o => expanded += o.get.concept; o.get.render }
      .toSeq
    assert(order === Seq("a", "b"), "stale 0.1 entry must not resurface a")
  }

  test("heap frontier drains 10^4 nodes fast (the O(n²) registry scan is gone)") {
    val tree = driverTree()
    val rnd = new scala.util.Random(13)
    (0 until 10000).foreach { i =>
      val n = new LblNode(graft.expr.Named(f"c$i%05d"))
      n.quality = rnd.nextDouble(); n.heuristic = n.quality
      tree.add(n)
    }
    val expanded = scala.collection.mutable.Set.empty[graft.expr.ClassExpr]
    val t0 = System.nanoTime()
    var count = 0
    var done = false
    while (!done) tree.popBestUnexpanded(expanded) match {
      case Some(n) => expanded += n.concept; count += 1
      case None => done = true
    }
    val ms = (System.nanoTime() - t0) / 1e6
    assert(count === 10000)
    // relaxed wall bound: heap drain is ~10⁴·log n ops (measured ~10 ms);
    // the removed scan would be 10⁸ comparisons plus 10⁴ full sorts
    assert(ms < 2000.0, f"draining 10^4 nodes took $ms%.0f ms")
  }
}
