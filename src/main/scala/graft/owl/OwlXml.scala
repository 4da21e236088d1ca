package graft.owl

import graft.core._
import org.apache.spark.sql.{Encoders, SparkSession}
import scala.xml.{Elem, XML}

/** Fixture-scale OWL RDF/XML reader + writer (reference S1/S3,
  * knowledge_base.py:107-190 load / _base.py:198-216 save_sample).
  *
  * Spark has no RDF source and fixture ontologies are tiny (father.owl has
  * 6 individuals), so this parses/serializes on the driver and converts
  * to/from the engine's fact tables. Web-scale input arrives through the
  * pages pipeline, never through this path. The writer/reader pair is
  * self-consistent: save → load preserves the full signature (mirrors
  * tests/test_sampling.py:192-204).
  */
object OwlXml {

  private val G = "urn:graft#"
  private val Xsd = "http://www.w3.org/2001/XMLSchema#"
  private def frag(uri: String): String = {
    val i = uri.lastIndexOf('#')
    if (i >= 0) uri.substring(i + 1) else uri
  }
  private def xsdUri(dtype: String): String = Xsd + frag(dtype.stripPrefix("xsd:"))

  /** a property-assertion element with the PROPERTY NAME as element label —
    * the standard RDF/XML striped form the OWL API emits and reloads
    * (reference save path, _base.py:198-216). */
  private def propElem(label: String, attr: scala.xml.MetaData,
                       children: scala.xml.Node*): Elem =
    Elem(null, label, attr, scala.xml.TopScope, minimizeEmpty = true, children: _*)

  def write(kb: Kb, path: String): Unit = {
    val edges = kb.edges.collect().map(r => Edge(r.getString(0), r.getString(1), r.getString(2)))
    val attrs = kb.attrs.collect().map(r => Attr(r.getString(0), r.getString(1), r.getString(2), r.getString(3)))
    val types = kb.types.collect().map(r => TypeAssertion(r.getString(0), r.getString(1)))
    val nodes = kb.nodes.collect().map(_.getString(0))
    val byNode = edges.groupBy(_.src).withDefaultValue(Array.empty[Edge])
    val attrByNode = attrs.groupBy(_.node).withDefaultValue(Array.empty[Attr])
    val typeByNode = types.groupBy(_.node).withDefaultValue(Array.empty[TypeAssertion])

    val xml: Elem =
      <rdf:RDF xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#"
               xmlns:rdfs="http://www.w3.org/2000/01/rdf-schema#"
               xmlns:owl="http://www.w3.org/2002/07/owl#"
               xmlns={G}>
        {kb.tbox.classes.map { c =>
          <owl:Class rdf:about={G + c}>
            {kb.tbox.subClass.filter(_._1 == c).map(s => <rdfs:subClassOf rdf:resource={G + s._2}/>)}
            {kb.tbox.equivClass.filter(_._1 == c).map { e =>
              if (e._2.startsWith("not:"))
                <owl:equivalentClass>
                  <owl:Class><owl:complementOf rdf:resource={G + e._2.stripPrefix("not:")}/></owl:Class>
                </owl:equivalentClass>
              else <owl:equivalentClass rdf:resource={G + e._2}/>}}
          </owl:Class>}}
        {kb.tbox.objectProps.map { p =>
          <owl:ObjectProperty rdf:about={G + p.prop}>
            {if (p.domain.nonEmpty) Seq(<rdfs:domain rdf:resource={G + p.domain}/>) else Nil}
            {if (p.range.nonEmpty) Seq(<rdfs:range rdf:resource={G + p.range}/>) else Nil}
          </owl:ObjectProperty>}}
        {kb.tbox.dataProps.map { p =>
          <owl:DatatypeProperty rdf:about={G + p.prop}>
            {if (p.domain.nonEmpty) Seq(<rdfs:domain rdf:resource={G + p.domain}/>) else Nil}
            {if (p.range.nonEmpty) Seq(<rdfs:range rdf:resource={xsdUri(p.range)}/>) else Nil}
          </owl:DatatypeProperty>}}
        {nodes.map { n =>
          <owl:NamedIndividual rdf:about={G + n}>
            {typeByNode(n).map(t => <rdf:type rdf:resource={G + t.cls}/>)}
            {byNode(n).map(e => propElem(e.pred,
              new scala.xml.PrefixedAttribute("rdf", "resource", G + e.dst, scala.xml.Null)))}
            {attrByNode(n).map(a => propElem(a.prop,
              new scala.xml.PrefixedAttribute("rdf", "datatype", xsdUri(a.dtype), scala.xml.Null),
              scala.xml.Text(a.lexical)))}
          </owl:NamedIndividual>}}
      </rdf:RDF>
    XML.save(path, xml, "UTF-8", xmlDecl = true)
  }

  /** Reads standard OWL-API RDF/XML (e.g. the reference's KGs/father.owl)
    * as well as this writer's own output. Property assertions appear either
    * as generic child elements of NamedIndividual (label = property,
    * rdf:resource → edge, text + rdf:datatype → literal) or as this
    * writer's g:op/g:dp forms. */
  /** save_owl_class_expressions (reference utils/static_funcs.py:106-135):
    * expression #i becomes the named class `<NS>#i` carrying an
    * owl:equivalentClass axiom to the (possibly anonymous) rendered
    * expression; only 'rdfxml' is implemented and `.owl` is appended to
    * the path — both reference behaviors preserved. The object dialect
    * plus data hasValue render per the OWL 2 RDF mapping; numeric data
    * ranges raise (owlapy renders those via facet restrictions the
    * engine's lexical model does not carry — same NotImplemented spirit
    * as the reference's format guard). */
  def writeClassExpressions(expressions: Seq[graft.expr.ClassExpr], path: String,
                            rdfFormat: String = "rdfxml"): Unit = {
    import graft.expr._
    if (rdfFormat != "rdfxml")
      throw new NotImplementedError(s"Format $rdfFormat not implemented.")
    val ns = "https://dice-research.org/predictions"
    val Owl = "http://www.w3.org/2002/07/owl#"
    def onProp(r: String) = <owl:onProperty rdf:resource={G + r}/>
    def onPropInv(r: String) =
      <owl:onProperty><owl:ObjectProperty><owl:inverseOf rdf:resource={G + r}/></owl:ObjectProperty></owl:onProperty>
    def card(n: Int) = scala.xml.Text(n.toString)
    // OWL 2 DatatypeRestriction (owlapy renders data compares the same
    // way): rdfs:Datatype + owl:onDatatype + one facet restriction
    def facetOf(op: String): String = op match {
      case ">=" => "minInclusive"
      case ">"  => "minExclusive"
      case "<=" => "maxInclusive"
      case "<"  => "maxExclusive"
      case o    => throw new IllegalArgumentException(s"facet op $o")
    }
    def dtRestriction(dtype: String, op: String, lex: String): Elem = {
      val facet = scala.xml.Elem("xsd", facetOf(op),
        new scala.xml.PrefixedAttribute("rdf", "datatype", Xsd + dtype, scala.xml.Null),
        scala.xml.TopScope, minimizeEmpty = false, scala.xml.Text(lex))
      <rdfs:Datatype><owl:onDatatype rdf:resource={Xsd + dtype}/><owl:withRestrictions rdf:parseType="Collection"><rdf:Description>{facet}</rdf:Description></owl:withRestrictions></rdfs:Datatype>
    }
    def ceElem(ce: ClassExpr): Elem = ce match {
      case Top => <owl:Class rdf:about={Owl + "Thing"}/>
      case Bottom => <owl:Class rdf:about={Owl + "Nothing"}/>
      case Named(c) => <owl:Class rdf:about={G + c}/>
      case And(cs) =>
        <owl:Class><owl:intersectionOf rdf:parseType="Collection">{cs.map(ceElem)}</owl:intersectionOf></owl:Class>
      case Or(cs) =>
        <owl:Class><owl:unionOf rdf:parseType="Collection">{cs.map(ceElem)}</owl:unionOf></owl:Class>
      case Not(c) => <owl:Class><owl:complementOf>{ceElem(c)}</owl:complementOf></owl:Class>
      case Exists(r, f) =>
        <owl:Restriction>{onProp(r)}<owl:someValuesFrom>{ceElem(f)}</owl:someValuesFrom></owl:Restriction>
      case ForAll(r, f) =>
        <owl:Restriction>{onProp(r)}<owl:allValuesFrom>{ceElem(f)}</owl:allValuesFrom></owl:Restriction>
      case ExistsInverse(r, f) =>
        <owl:Restriction>{onPropInv(r)}<owl:someValuesFrom>{ceElem(f)}</owl:someValuesFrom></owl:Restriction>
      case ForAllInverse(r, f) =>
        <owl:Restriction>{onPropInv(r)}<owl:allValuesFrom>{ceElem(f)}</owl:allValuesFrom></owl:Restriction>
      case HasValue(r, x) =>
        <owl:Restriction>{onProp(r)}<owl:hasValue rdf:resource={G + x}/></owl:Restriction>
      case MinCard(n, r, f) =>
        <owl:Restriction>{onProp(r)}<owl:minQualifiedCardinality rdf:datatype={Xsd + "nonNegativeInteger"}>{card(n)}</owl:minQualifiedCardinality><owl:onClass>{ceElem(f)}</owl:onClass></owl:Restriction>
      case MaxCard(n, r, f) =>
        <owl:Restriction>{onProp(r)}<owl:maxQualifiedCardinality rdf:datatype={Xsd + "nonNegativeInteger"}>{card(n)}</owl:maxQualifiedCardinality><owl:onClass>{ceElem(f)}</owl:onClass></owl:Restriction>
      case ExactCard(n, r, f) =>
        <owl:Restriction>{onProp(r)}<owl:qualifiedCardinality rdf:datatype={Xsd + "nonNegativeInteger"}>{card(n)}</owl:qualifiedCardinality><owl:onClass>{ceElem(f)}</owl:onClass></owl:Restriction>
      case OneOf(xs) =>
        <owl:Class><owl:oneOf rdf:parseType="Collection">{xs.map(x => <rdf:Description rdf:about={G + x}/>)}</owl:oneOf></owl:Class>
      case DataHasValue(p, lex) =>
        <owl:Restriction>{onProp(p)}<owl:hasValue>{scala.xml.Text(lex)}</owl:hasValue></owl:Restriction>
      case DataCompare(p, "=", v) =>
        <owl:Restriction>{onProp(p)}<owl:hasValue rdf:datatype={Xsd + "double"}>{scala.xml.Text(v.toString)}</owl:hasValue></owl:Restriction>
      case DataCompare(p, op, v) =>
        <owl:Restriction>{onProp(p)}<owl:someValuesFrom>{dtRestriction("double", op, v.toString)}</owl:someValuesFrom></owl:Restriction>
      case DataForAll(p, op, v) =>
        <owl:Restriction>{onProp(p)}<owl:allValuesFrom>{dtRestriction("double", op, v.toString)}</owl:allValuesFrom></owl:Restriction>
      case DataBoolHasValue(p, b) =>
        <owl:Restriction>{onProp(p)}<owl:hasValue rdf:datatype={Xsd + "boolean"}>{scala.xml.Text(b.toString)}</owl:hasValue></owl:Restriction>
      case DataTimeCompare(p, op, t) =>
        // facet datatype follows the LEXICAL form: Eval's Time datatype
        // group compares date/dateTime/time lexical forms as timestamps
        // (expr/Eval.scala Time group), so a rung like
        // '2021-05-01 10:00:00' must save as xsd:dateTime (normalized to
        // the 'T' separator), not as an invalid xsd:date literal
        val (timeDt, timeLex) =
          if (t.matches("""\d{4}-\d{2}-\d{2}[T ].*""")) ("dateTime", t.replace(' ', 'T'))
          else if (t.matches("""\d{2}:\d{2}.*""")) ("time", t)
          else ("date", t)
        <owl:Restriction>{onProp(p)}<owl:someValuesFrom>{dtRestriction(timeDt, op, timeLex)}</owl:someValuesFrom></owl:Restriction>
    }
    val xml: Elem =
      <rdf:RDF xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#"
               xmlns:rdfs="http://www.w3.org/2000/01/rdf-schema#"
               xmlns:owl="http://www.w3.org/2002/07/owl#"
               xmlns:xsd="http://www.w3.org/2001/XMLSchema#"
               xmlns={G}>
        <owl:Ontology rdf:about={ns}/>
        {expressions.zipWithIndex.map { case (ce, i) =>
          <owl:Class rdf:about={s"$ns#$i"}><owl:equivalentClass>{ceElem(ce)}</owl:equivalentClass></owl:Class>}}
      </rdf:RDF>
    XML.save(path + ".owl", xml, "UTF-8", xmlDecl = true)
  }

  def read(spark: SparkSession, path: String): Kb = {
    val xml = XML.loadFile(path)
    def about(n: scala.xml.Node) =
      frag(n.attributes.asAttrMap.collectFirst { case (k, v) if k.endsWith("about") => v }.getOrElse(""))
    def resourceOpt(n: scala.xml.Node): Option[String] =
      n.attributes.asAttrMap.collectFirst { case (k, v) if k.endsWith("resource") => frag(v) }
    def resource(n: scala.xml.Node) = resourceOpt(n).getOrElse("")
    def datatypeOpt(n: scala.xml.Node): Option[String] =
      n.attributes.asAttrMap.collectFirst { case (k, v) if k.endsWith("datatype") => "xsd:" + frag(v) }

    val classNames = (xml \ "Class").map(about).filter(_.nonEmpty).distinct
    val subClass = (xml \ "Class").flatMap(c => (c \ "subClassOf").map(s => about(c) -> resource(s)))
    val equivClass = (xml \ "Class").flatMap { c =>
      (c \ "equivalentClass").flatMap { e =>
        resourceOpt(e).map(about(c) -> _).orElse {
          // nested anonymous class: complementOf (father.owl male ≡ ¬female)
          (e \\ "complementOf").headOption.map(comp => about(c) -> ("not:" + resource(comp)))
        }
      }
    }
    // a range URI in the XMLSchema namespace reads back as its xsd:-prefixed
    // lexical form (the engine's dtype convention)
    def rangeOf(n: scala.xml.Node): String =
      n.attributes.asAttrMap.collectFirst {
        case (k, v) if k.endsWith("resource") =>
          if (v.startsWith("http://www.w3.org/2001/XMLSchema#")) "xsd:" + frag(v) else frag(v)
      }.getOrElse("")
    def propsOf(label: String, kind: String) = (xml \ label).map { p =>
      PropMeta(about(p), kind,
        (p \ "domain").headOption.map(resource).getOrElse(""),
        (p \ "range").headOption.map(rangeOf).getOrElse(""))
    }
    val objProps = propsOf("ObjectProperty", "object")
    val dataProps = propsOf("DatatypeProperty", "data")
    val objPropNames = objProps.map(_.prop).toSet

    val inds = xml \ "NamedIndividual"
    val nodes = inds.map(about)
    val types = inds.flatMap(i => (i \ "type").map(t => TypeAssertion(about(i), resource(t))))
    val edges = inds.flatMap { i =>
      i.child.collect {
        case e: Elem if e.label == "op" => Edge(about(i), e \@ "pred", resource(e))
        case e: Elem if e.label != "type" && e.label != "dp" && resourceOpt(e).isDefined &&
          (objPropNames.contains(e.label) || objPropNames.isEmpty) =>
          Edge(about(i), e.label, resource(e))
      }
    }
    val attrs = inds.flatMap { i =>
      i.child.collect {
        case a: Elem if a.label == "dp" => Attr(about(i), a \@ "prop", a.text, a \@ "dtype")
        case a: Elem if a.label != "type" && a.label != "op" && resourceOpt(a).isEmpty &&
          a.text.nonEmpty =>
          Attr(about(i), a.label, a.text, datatypeOpt(a).getOrElse("xsd:string"))
      }
    }

    Kb(
      nodes = spark.createDataset(nodes)(Encoders.STRING).toDF("id"),
      edges = spark.createDataset(edges)(Encoders.product[Edge]).toDF(),
      attrs = spark.createDataset(attrs)(Encoders.product[Attr]).toDF(),
      types = spark.createDataset(types)(Encoders.product[TypeAssertion]).toDF(),
      tbox = Tbox(
        classes = classNames,
        subClass = subClass,
        equivClass = equivClass,
        props = objProps ++ dataProps))
  }

  /** save_sample default filename quirk (reference _base.py:209-216):
    * append .owl when missing; default name <orig>_sample_<n>.owl. */
  def sampleFileName(origPath: String, individuals: Long, filename: Option[String]): String =
    filename match {
      case Some(f) if f.length > 4 && f.endsWith(".owl") => f
      case Some(f) => f + ".owl"
      case None =>
        val base = origPath.split('/').last.replace(".owl", "")
        s"${base}_sample_$individuals.owl"
    }
}
