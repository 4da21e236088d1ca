package graft.lp

import graft.core.Kb
import graft.expr.ClassExpr
import org.apache.spark.sql.{DataFrame, SparkSession}

import scala.collection.mutable

/** LBL search-tree node (reference ontolearn_light/search.py:390-417
  * `LBLNode`, composed from the `_Node*` mixins at :24-115): a class
  * expression with quality / heuristic scores, owlapy concept length,
  * retrieved-individuals count, and parent/child links. One deliberate
  * divergence from the reference: the node carries the retrieval COUNT,
  * not the materialized individuals set — at engine scale the retrieval is
  * a distributed Dataset and only LP-confusion aggregates return to the
  * driver (the search tree itself is driver-scale, the scoring is not).
  */
final class LblNode(val concept: ClassExpr, val isRoot: Boolean = false) {
  val len: Int = ClassExpr.length(concept)
  val render: String = ClassExpr.render(concept)
  var quality: Double = Double.NaN
  var heuristic: Double = Double.NaN
  var individualsCount: Long = -1L
  var parent: Option[LblNode] = None
  private val kids = mutable.LinkedHashSet.empty[LblNode]
  def children: Seq[LblNode] = kids.toSeq
  def addChild(n: LblNode): Unit = kids += n       // search.py:399-403
  def removeChild(n: LblNode): Unit = kids -= n
  override def toString: String =
    f"LblNode($render, q=$quality%.5f, h=$heuristic%.5f, len=$len)"
}

/** Node-scoring heuristics for the search tree. The light reference ships
  * none (CELOE's lives in the full learner distribution); quality-as-promise
  * is the default, and [[celoe]] is the engine's parent-DEPENDENT option —
  * the shape that makes the tree's re-parent rule (search.py:580-590)
  * meaningful, since a node reached from a different parent can re-score. */
object Heuristics {
  /** CELOE-style scorer (Lehmann, Auer, Bühmann, Tramp: "Class expression
    * learning for ontology engineering", J. Web Semantics 2011, §4.2
    * OEHeuristicRuntime shape): quality + gainBonus·(quality − parent
    * quality) − lengthPenalty·len. Roots score on quality alone. */
  def celoe(gainBonus: Double = 0.3,
            lengthPenalty: Double = 0.02): LblNode => Double = n => {
    val gain = n.parent.map(p => n.quality - p.quality).getOrElse(0.0)
    n.quality + gainBonus * gain - lengthPenalty * n.len
  }
}

/** Search tree based on a priority queue (reference search.py:511-665
  * `SearchTreePriorityQueue`): nodes keyed by concept, a max-heap on
  * heuristic (the reference min-heaps on −heuristic, same order), pops
  * tie-broken by the concept's canonical render (the reference's
  * `HeuristicOrderedNode` falls back to `OrderedOWLObject` — a total
  * syntactic order on the expression; the render string is ours).
  *
  * Scoring is Spark-batched: [[addNodes]] evaluates every fresh candidate
  * of an expansion in ONE job via
  * [[LearningProblem.evaluateConceptsBatch]] — the reference applies
  * `quality_func` per node (`search.py:592`), which on a distributed
  * engine would mean one blocking job per refinement.
  *
  * `quality` is any [[Metric]] (the reference takes an `AbstractScorer`,
  * e.g. F1). `heuristic` is a pluggable node scorer; the default is the
  * quality itself — the light reference package ships no concrete
  * heuristic (CELOE's lives in the full learner distribution, out of
  * SURVEY scope), and quality-as-promise makes the tree a best-first
  * search on the metric.
  */
final class SearchTreePriorityQueue(
    kb: Kb,
    elp: EncodedLp,
    quality: Metric = F1,
    heuristic: LblNode => Double = _.quality) {

  /** nodes registry (search.py:538 `self.nodes: Dict[concept, LBLNode]`) */
  val nodes = mutable.LinkedHashMap.empty[ClassExpr, LblNode]

  // entries are (heuristic-at-push, render, node); stale entries for a
  // re-pushed node resolve through `nodes` on pop, like the reference's
  // dict lookup at :608-611
  private val queue = mutable.PriorityQueue.empty[(Double, String, LblNode)](
    Ordering.Tuple2(Ordering.Double.TotalOrdering, Ordering.String.reverse)
      .on(t => (t._1, t._2)))

  private def push(n: LblNode): Unit = queue.enqueue((n.heuristic, n.render, n))

  private def scoreBatch(ns: Seq[LblNode]): Unit = {
    val res = LearningProblem.evaluateConceptsBatch(kb, ns.map(_.concept), quality, elp)
    ns.zip(res).foreach { case (n, (_, q, cnt)) =>
      n.quality = q
      n.individualsCount = cnt
    }
  }

  /** add (search.py:541-551): push an already-scored node. */
  def add(n: LblNode): Unit = {
    require(!n.heuristic.isNaN, "node heuristic not calculated") // :457-460
    push(n)
    nodes(n.concept) = n
  }

  /** add_root (search.py:553-559): score the root, push, register. */
  def addRoot(ce: ClassExpr): LblNode = {
    require(nodes.isEmpty, "add_root on a non-empty tree")
    val n = new LblNode(ce, isRoot = true)
    scoreBatch(Seq(n))
    n.heuristic = heuristic(n)
    push(n)
    nodes(ce) = n
    n
  }

  /** add_node (search.py:561-599), one candidate. Returns Some(true) for a
    * goal node (quality = 1), Some(false) for a weak node (quality = 0 —
    * NOT added to the tree), None otherwise. */
  def addNode(ce: ClassExpr, parent: LblNode): Option[Boolean] =
    addNodes(Seq(ce), parent).head

  /** add_node for a whole refinement batch: fresh candidates are scored in
    * ONE Spark job, then each follows the reference's per-node logic —
    * a concept already in the tree under a different parent re-computes
    * its heuristic and re-parents if it improved (:580-590); a fresh
    * candidate is quality-scored, rejected if weak, pushed + linked
    * otherwise, goal-flagged if perfect (:591-599). */
  def addNodes(ces: Seq[ClassExpr], parent: LblNode): Seq[Option[Boolean]] = {
    // fresh nodes are born with their parent set (the reference constructs
    // LBLNode(parent_node=…) before scoring, :595) so a gain-style
    // heuristic can read parent quality; the child LINK is only made on
    // registration below — a weak reject leaves no trace in the tree
    val fresh = ces.distinct.filterNot(nodes.contains).map { ce =>
      val n = new LblNode(ce)
      n.parent = Some(parent)
      n
    }
    if (fresh.nonEmpty) scoreBatch(fresh)
    val freshByCe = fresh.map(n => n.concept -> n).toMap
    ces.map { ce =>
      nodes.get(ce) match {
        case Some(existing) if !existing.parent.contains(parent) =>
          // seen via another parent: better heuristic ⇒ re-parent + re-push.
          // The candidate parent is swapped IN before re-scoring — a
          // parent-dependent (gain-style) heuristic must evaluate against
          // the prospective parent, not the old one — and restored when the
          // score doesn't improve.
          val old = existing.heuristic
          val prevParent = existing.parent
          existing.parent = Some(parent)
          val renewed = heuristic(existing)
          if (renewed > old) {
            existing.heuristic = renewed
            prevParent.foreach(_.removeChild(existing))
            parent.addChild(existing)
            push(existing)
          } else existing.parent = prevParent
          None
        case Some(_) => None // duplicate under the same parent: no-op
        case None =>
          val n = freshByCe(ce)
          if (n.quality == 0) Some(false) // weak node: never enters the tree
          else {
            n.heuristic = heuristic(n)
            push(n)
            nodes(ce) = n
            parent.addChild(n)
            if (n.quality == 1) Some(true) else None
          }
      }
    }
  }

  /** Best registered-and-not-skipped node by (heuristic desc, render asc),
    * served from the heap in O(log n) amortized instead of an O(n) registry
    * scan per call. Lazy invalidation: every heuristic ASSIGNMENT pushes a
    * fresh entry (fresh node, improved re-parent — heuristics only ever
    * increase), so each node's CURRENT heuristic has a live entry and any
    * stale entry carries a strictly lower key; a popped entry is served
    * only if it matches the node's current heuristic and the node is not
    * skipped, otherwise it is discarded. Entries are consumed — callers
    * that expand every returned node (the learner loop) never lose one. */
  def popBestUnexpanded(skip: ClassExpr => Boolean): Option[LblNode] = {
    while (queue.nonEmpty) {
      val (h, _, popped) = queue.dequeue()
      nodes.get(popped.concept) match {
        case Some(n) if !skip(n.concept) && n.heuristic == h && (n eq popped) =>
          return Some(n)
        case _ => // stale entry (superseded score, replaced node) or skipped
      }
    }
    None
  }

  /** get_most_promising (search.py:601-617): pop the top heuristic entry,
    * resolve through the registry, re-push, return. Throws if the popped
    * concept is no longer registered (the reference raises KeyError). */
  def getMostPromising(): LblNode = {
    val (_, _, popped) = queue.dequeue()
    val n = nodes.getOrElse(popped.concept,
      throw new NoSuchElementException(s"${popped.render} is not found"))
    push(n)
    n
  }

  /** get_top_n (search.py:619-636): top n registered nodes by key ∈
    * {quality, heuristic, length} descending. The reference's Python sort
    * is stable on dict-insertion order; ties here break on the canonical
    * render — deterministic under any insertion order. */
  def getTopN(n: Int, key: String = "quality"): Seq[LblNode] = {
    val k: LblNode => Double = key match {
      case "quality"   => _.quality
      case "heuristic" => _.heuristic
      case "length"    => _.len.toDouble
      case other       => throw new NoSuchElementException(s"Wrong Key:$other")
    }
    nodes.values.toSeq.sortBy(x => (-k(x), x.render)).take(n)
  }

  /** clean (search.py:638-640) */
  def clean(): Unit = {
    queue.clear()
    nodes.clear()
  }

  /** The registered tree as a DataFrame (concept, quality, heuristic, len,
    * individuals) — the bridge to [[Hypotheses.topN]] and the gate. */
  def toDf(spark: SparkSession): DataFrame = {
    val rows = nodes.values.toSeq.map(n =>
      (n.render, n.quality, n.heuristic, n.len, n.individualsCount))
    spark.createDataFrame(rows)
      .toDF("concept", "quality", "heuristic", "len", "individuals")
  }
}
