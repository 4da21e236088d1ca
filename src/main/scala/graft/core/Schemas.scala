package graft.core

import org.apache.spark.sql.types._

/** Canonical fact-table schemas of the engine (SURVEY.md §1.2).
  *
  * An OWL knowledge base (reference: ontolearn_light/knowledge_base.py:47-190)
  * is split into four big ABox fact tables plus small TBox metadata:
  *   - nodes(id)                          — OWLNamedIndividual
  *   - edges(src, pred, dst)              — OWLObjectPropertyAssertionAxiom
  *   - attrs(node, prop, lexical, dtype)  — OWLDataPropertyAssertionAxiom
  *   - types(node, cls)                   — OWLClassAssertionAxiom
  * TBox (class/property hierarchies, domains/ranges) is driver-scale metadata,
  * carried as Scala collections and broadcast where joins need it.
  */
object Schemas {
  val RdfType = "rdf:type"
  val SubClassOf = "rdfs:subClassOf"
  val SubPropertyOf = "rdfs:subPropertyOf"
  val EquivalentClass = "owl:equivalentClass"
  val EquivalentProperty = "owl:equivalentProperty"
  val Domain = "rdfs:domain"
  val Range = "rdfs:range"

  val nodes: StructType = StructType(Seq(StructField("id", StringType, nullable = false)))
  val edges: StructType = StructType(Seq(
    StructField("src", StringType, nullable = false),
    StructField("pred", StringType, nullable = false),
    StructField("dst", StringType, nullable = false)))
  val attrs: StructType = StructType(Seq(
    StructField("node", StringType, nullable = false),
    StructField("prop", StringType, nullable = false),
    StructField("lexical", StringType, nullable = false),
    StructField("dtype", StringType, nullable = false)))
  val types: StructType = StructType(Seq(
    StructField("node", StringType, nullable = false),
    StructField("cls", StringType, nullable = false)))
  val triples: StructType = StructType(Seq(
    StructField("subj", StringType, nullable = false),
    StructField("pred", StringType, nullable = false),
    StructField("obj", StringType, nullable = false)))
}

/** Typed rows (Dataset[T] encoders) for stages where type safety helps. */
case class Edge(src: String, pred: String, dst: String)
case class Attr(node: String, prop: String, lexical: String, dtype: String)
case class TypeAssertion(node: String, cls: String)
case class Triple(subj: String, pred: String, obj: String)

/** Property metadata row; kind ∈ {object, data}. */
case class PropMeta(prop: String, kind: String, domain: String, range: String)

/** Datatype groups for the typed data-property accessors (reference
  * knowledge_base.py:1042-1072: get_boolean/numeric/double/time_data_
  * properties over owlapy's BooleanOWLDatatype / NUMERIC_DATATYPES /
  * DoubleOWLDatatype / TIME_DATATYPES). */
object DatatypeGroups {
  val Boolean: Set[String] = Set("xsd:boolean")
  val Double: Set[String] = Set("xsd:double")
  val Numeric: Set[String] = Set(
    "xsd:double", "xsd:float", "xsd:decimal", "xsd:int", "xsd:integer",
    "xsd:long", "xsd:short", "xsd:byte", "xsd:nonNegativeInteger")
  val Time: Set[String] = Set(
    "xsd:date", "xsd:dateTime", "xsd:time", "xsd:duration")
}

/** TBox: driver-scale schema metadata (reference knowledge_base.py:346-432 —
  * tbox emission enumerates exactly subClassOf, equivalentClass, subPropertyOf,
  * equivalentProperty, domain, range). Always small even at web scale.
  */
case class Tbox(
    classes: Seq[String],
    subClass: Seq[(String, String)],            // (sub, sup)
    equivClass: Seq[(String, String)] = Nil,
    subProp: Seq[(String, String)] = Nil,
    equivProp: Seq[(String, String)] = Nil,
    props: Seq[PropMeta] = Nil) {

  lazy val objectProps: Seq[PropMeta] = props.filter(_.kind == "object")
  lazy val dataProps: Seq[PropMeta] = props.filter(_.kind == "data")

  /** data properties whose declared range datatype is in `ranges`
    * (reference get_data_properties(ranges), knowledge_base.py:1020-1040). */
  def dataPropsByRange(ranges: Set[String]): Seq[PropMeta] =
    dataProps.filter(p => ranges(p.range))

  private lazy val parents: Map[String, Seq[String]] =
    subClass.groupBy(_._1).map { case (k, v) => k -> v.map(_._2) }
  private lazy val children: Map[String, Seq[String]] =
    subClass.groupBy(_._2).map { case (k, v) => k -> v.map(_._1) }

  /** All (improper) subclasses of c: {c} ∪ transitive closure downward.
    * TBox DAGs are tiny, so a driver-side BFS is the right tool. */
  def subClassesOf(c: String): Set[String] = closure(c, children)
  def superClassesOf(c: String): Set[String] = closure(c, parents)

  /** Hierarchy navigation (reference knowledge_base.py:729-966, backed by
    * owlapy's ClassHierarchy). All driver-scale. */

  /** direct sub-classes of c (sub_classes(direct=True), :754,965) */
  def directSubClassesOf(c: String): Seq[String] =
    children.getOrElse(c, Nil).distinct.sorted

  /** direct parent classes of c (super_classes(direct=True), :942) */
  def directParentsOf(c: String): Seq[String] =
    parents.getOrElse(c, Nil).distinct.sorted

  /** all PROPER sub-classes of c (sub_classes(direct=False), :966) */
  def allSubClassesOf(c: String): Set[String] = subClassesOf(c) - c

  /** all PROPER super-classes of c */
  def allSuperClassesOf(c: String): Set[String] = superClassesOf(c) - c

  /** leaf classes: x ⊑ of (improper) with no sub-class — { x | x
    * subClassOf of AND ¬∃y: y subClassOf x } (:729-740); no `of` → all
    * leaves of the hierarchy (:740,750) */
  def leafClasses(of: Option[String] = None): Seq[String] = {
    val candidates = of.map(subClassesOf).getOrElse(classes.toSet)
    candidates.filter(c => children.getOrElse(c, Nil).isEmpty).toSeq.sorted
  }

  /** most general named classes: the hierarchy roots — direct children of
    * ⊤, i.e. classes with no named parent (:750) */
  def rootClasses: Seq[String] =
    classes.filter(c => parents.getOrElse(c, Nil).isEmpty).distinct.sorted

  /** most general roles of the object-property hierarchy (owlapy
    * most_general_roles, used by knowledge_base.py:626-641): object
    * properties with no super-property */
  lazy val mostGeneralObjectProps: Seq[PropMeta] = {
    val hasSuper = subProp.map(_._1).toSet
    objectProps.filterNot(p => hasSuper(p.prop))
  }

  private def closure(start: String, step: Map[String, Seq[String]]): Set[String] = {
    var seen = Set(start)
    var frontier = List(start)
    while (frontier.nonEmpty) {
      val next = frontier.flatMap(n => step.getOrElse(n, Nil)).filterNot(seen)
      seen ++= next
      frontier = next
    }
    seen
  }

  /** TBox triples, matching the reference's six relation kinds in `iri`
    * mode (knowledge_base.py:308-434). Deduplicated set semantics.
    *
    * iri-mode quirk: the reference does NOT emit ranges of DATA properties
    * (knowledge_base.py:328 prints the warning; :410-413 is the
    * commented-out dp-range branch) — only object-property ranges appear.
    * Pass `includeDataRanges = true` for the full surface (what the
    * reference's `native`/`axiom` modes would carry). */
  def tripleRows(includeDataRanges: Boolean = false): Seq[Triple] = {
    import Schemas._
    val rangeProps =
      if (includeDataRanges) props else props.filter(_.kind == "object")
    (subClass.map { case (a, b) => Triple(a, SubClassOf, b) } ++
      equivClass.map { case (a, b) => Triple(a, EquivalentClass, b) } ++
      subProp.map { case (a, b) => Triple(a, SubPropertyOf, b) } ++
      equivProp.map { case (a, b) => Triple(a, EquivalentProperty, b) } ++
      props.filter(_.domain.nonEmpty).map(p => Triple(p.prop, Domain, p.domain)) ++
      rangeProps.filter(_.range.nonEmpty).map(p => Triple(p.prop, Range, p.range))).distinct
  }
}

object Tbox {
  val empty: Tbox = Tbox(Nil, Nil)
}
