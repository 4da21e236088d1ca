package graft.expr

import graft.core.Kb
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Instance retrieval: ClassExpr → DataFrame[id] over a [[Kb]].
  *
  * The reference delegates this to owlapy's StructuralReasoner
  * (knowledge_base.py:156,544-548); here each constructor maps onto
  * relational algebra over the fact tables (SURVEY §2.7 table). The result
  * is a single-column DataFrame named `id` with set semantics (distinct).
  *
  * Scale notes: named-class filters are broadcast IN-lists over the tiny
  * TBox closure; ∃/cardinality shapes are semi-join + hash-aggregate plans
  * that shuffle on `dst`/`src` only; ¬ and ∀ are anti-join shapes. Nothing
  * here collects to the driver.
  */
object Eval {

  /** Memoizing wrapper (reference LRU cache of size 128,
    * knowledge_base.py:539-563): caches the *DataFrame plan + persisted
    * data* per canonical expression string. */
  final class Cached(kb: Kb, maxSize: Int = 128) {
    private val cache = new java.util.LinkedHashMap[String, DataFrame](16, 0.75f, true) {
      override def removeEldestEntry(e: java.util.Map.Entry[String, DataFrame]): Boolean = {
        val evict = size() > maxSize
        if (evict) e.getValue.unpersist()
        evict
      }
    }
    def apply(ce: ClassExpr): DataFrame = {
      val key = ClassExpr.render(ce)
      Option(cache.get(key)).getOrElse {
        val df = Eval(kb, ce).persist()
        cache.put(key, df)
        df
      }
    }
  }

  def apply(kb: Kb, ce: ClassExpr): DataFrame = {
    val nodes = kb.nodes
    def asId(df: DataFrame, c: String) = df.select(col(c).as("id"))

    ce match {
      case Top => nodes
      case Bottom => nodes.limit(0)

      case Named(c) =>
        // named class with subclass closure (hierarchy is driver-scale)
        val closure = kb.tbox.subClassesOf(c).toSeq
        asId(kb.types.filter(col("cls").isInCollection(closure)), "node").distinct()

      case And(cs) => cs.map(apply(kb, _)).reduce(_.intersect(_))
      case Or(cs) => cs.map(apply(kb, _)).reduce(_.union(_)).distinct()
      case Not(c) => nodes.except(apply(kb, c))

      case Exists(r, f) =>
        val filler = apply(kb, f).withColumnRenamed("id", "dst")
        asId(kb.edges.filter(col("pred") === r).join(filler, Seq("dst"), "left_semi"), "src")
          .distinct()

      case ForAll(r, f) =>
        // OWA structural semantics: member iff no r-edge leads outside f;
        // individuals with no r-edge are members (SURVEY §2.7 quirk).
        val notF = nodes.except(apply(kb, f)).withColumnRenamed("id", "dst")
        val violators = asId(
          kb.edges.filter(col("pred") === r).join(notF, Seq("dst"), "left_semi"), "src")
        nodes.except(violators)

      case HasValue(r, x) =>
        asId(kb.edges.filter(col("pred") === r && col("dst") === x), "src").distinct()

      case MinCard(n, r, f) =>
        if (n <= 0) nodes
        else countPerSrc(kb, r, f).filter(col("cnt") >= n).select(col("src").as("id"))

      case MaxCard(n, r, f) =>
        // includes individuals with zero matching edges
        val over = countPerSrc(kb, r, f).filter(col("cnt") > n).select(col("src").as("id"))
        nodes.except(over)

      case ExactCard(n, r, f) =>
        if (n == 0) {
          val any = countPerSrc(kb, r, f).select(col("src").as("id"))
          nodes.except(any)
        } else countPerSrc(kb, r, f).filter(col("cnt") === n).select(col("src").as("id"))

      case OneOf(xs) =>
        // nominal {a, b, …}: exactly the listed individuals that exist in
        // the KB (a broadcast IN-list filter over nodes)
        nodes.filter(col("id").isInCollection(xs))

      case ExistsInverse(r, f) =>
        // ∃r⁻.C = {y | ∃x: (x, r, y) ∧ x ∈ C} — the Exists join with the
        // roles of src/dst swapped
        val filler = apply(kb, f).withColumnRenamed("id", "src")
        asId(kb.edges.filter(col("pred") === r).join(filler, Seq("src"), "left_semi"), "dst")
          .distinct()

      case ForAllInverse(r, f) =>
        val notF = nodes.except(apply(kb, f)).withColumnRenamed("id", "src")
        val violators = asId(
          kb.edges.filter(col("pred") === r).join(notF, Seq("src"), "left_semi"), "dst")
        nodes.except(violators)

      case DataCompare(p, op, v) =>
        // try_cast, not cast: under ANSI (Spark 4 default) a plain cast
        // THROWS on any non-numeric lexical sharing the attrs scan —
        // whether the row survives the prop filter is predicate-order
        // luck. try_cast nulls it, cmp(null) is null, the row drops:
        // the pre-ANSI semantics this comparison was written against.
        asId(kb.attrs.filter(col("prop") === p &&
          cmp(expr("try_cast(lexical AS double)"), op, lit(v))), "node").distinct()

      case DataHasValue(p, l) =>
        asId(kb.attrs.filter(col("prop") === p && col("lexical") === l), "node").distinct()

      case DataForAll(p, op, v) =>
        // OWA: member iff no p-assertion violates the range; individuals
        // with no p-assertion pass vacuously (same shape as object ∀)
        // try_cast (see DataCompare): an unparseable lexical is not a
        // violator — it simply isn't a value of the numeric range
        val violators = asId(kb.attrs.filter(col("prop") === p &&
          !cmp(expr("try_cast(lexical AS double)"), op, lit(v))), "node")
        nodes.except(violators)

      case DataBoolHasValue(p, b) =>
        asId(kb.typedDataValues(graft.core.DatatypeGroups.Boolean, "boolean")
          .filter(col("prop") === p && col("value") === b), "node").distinct()

      case DataTimeCompare(p, op, t) =>
        asId(kb.typedDataValues(graft.core.DatatypeGroups.Time, "timestamp")
          .filter(col("prop") === p && cmp(col("value"), op, lit(t).cast("timestamp"))),
          "node").distinct()
    }
  }

  /** comparison predicate for data restrictions; `op` ∈ {<, <=, >, >=, =} */
  private def cmp(x: Column, op: String, v: Column): Column = op match {
    case "<" => x < v
    case "<=" => x <= v
    case ">" => x > v
    case ">=" => x >= v
    case "=" => x === v
    case other => throw new IllegalArgumentException(s"op $other")
  }

  /** count of r-edges whose object is in the filler, per subject. */
  private def countPerSrc(kb: Kb, r: String, f: ClassExpr): DataFrame = {
    val filler = apply(kb, f).withColumnRenamed("id", "dst")
    kb.edges.filter(col("pred") === r)
      .join(filler, Seq("dst"), "left_semi")
      .groupBy("src").agg(count(lit(1)).as("cnt"))
  }

  /** individuals(concept) (reference knowledge_base.py:192-206): None/⊤ → all. */
  def individuals(kb: Kb, ce: Option[ClassExpr]): DataFrame =
    ce.map(apply(kb, _)).getOrElse(kb.nodes)

  /** individuals_count (reference knowledge_base.py:565-577). */
  def individualsCount(kb: Kb, ce: Option[ClassExpr]): Long = individuals(kb, ce).count()
}
