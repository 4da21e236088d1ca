package graft.fixtures

import graft.core._
import org.apache.spark.sql.{Encoders, SparkSession}

/** FIXTURES.md F3: deterministic stand-in for the reference's (stripped)
  * hepatitis.owl test KB — same *relevant properties*: a few hundred nodes,
  * skewed out-degree, dead ends (therapy sinks), disconnected nodes, an LP
  * of 2 pos + 2 neg connected within 2 hops, and one node carrying exactly
  * 10 data-property values (for the dpp test,
  * reference tests/test_sampling.py:171-190).
  */
object HepatitisLikeKb {

  val patients = (1 to 100).map(i => s"p$i")
  val screenings = (1 to 100).map(i => s"s$i")
  val therapies = (1 to 20).map(i => s"t$i")
  val isolated = (1 to 10).map(i => s"i$i")
  val all: Seq[String] = patients ++ screenings ++ therapies ++ isolated

  val pos = Seq("p1", "p2")
  val neg = Seq("p3", "p4")
  val lp: Seq[String] = pos ++ neg

  /** target node with exactly 10 dp values (reference screening3279 analog) */
  val dpNode = "s1"

  val edgeList: Seq[Edge] =
    (1 to 100).map(k => Edge(s"p$k", "hasScreening", s"s$k")) ++
      (1 to 100).map(k => Edge(s"s$k", "ofPatient", s"p${k % 100 + 1}")) ++
      (1 to 100).filter(_ % 2 == 0).map(k => Edge(s"p$k", "hasTherapy", s"t${(k - 1) % 20 + 1}")) ++
      (1 to 100).filter(_ % 3 == 0).map(k => Edge(s"p$k", "knows", s"p${(k * 7) % 100 + 1}")) ++
      // hub: p1 also knows many (head skew)
      (2 to 30).map(k => Edge("p1", "knows", s"p$k"))

  val typeList: Seq[TypeAssertion] =
    patients.map(TypeAssertion(_, "Patient")) ++
      screenings.map(TypeAssertion(_, "Screening")) ++
      therapies.map(TypeAssertion(_, "Therapy")) ++
      isolated.map(TypeAssertion(_, "Isolated"))

  val attrList: Seq[Attr] =
    (1 to 10).map(v => Attr(dpNode, "measure", s"v$v", "xsd:string")) ++
      patients.zipWithIndex.map { case (p, i) => Attr(p, "age", (20 + i % 60).toString, "xsd:int") } ++
      Seq(Attr("t1", "dose", "5", "xsd:int"))

  val tbox: Tbox = Tbox(
    classes = Seq("Patient", "Screening", "Therapy", "Isolated"),
    subClass = Nil,
    props = Seq(
      PropMeta("hasScreening", "object", "Patient", "Screening"),
      PropMeta("ofPatient", "object", "Screening", "Patient"),
      PropMeta("hasTherapy", "object", "Patient", "Therapy"),
      PropMeta("knows", "object", "Patient", "Patient"),
      PropMeta("measure", "data", "Screening", "xsd:string"),
      PropMeta("age", "data", "Patient", "xsd:int"),
      PropMeta("dose", "data", "Therapy", "xsd:int")))

  def kb(spark: SparkSession): Kb = Kb(
    nodes = spark.createDataset(all)(Encoders.STRING).toDF("id"),
    edges = spark.createDataset(edgeList)(Encoders.product[Edge]).toDF(),
    attrs = spark.createDataset(attrList)(Encoders.product[Attr]).toDF(),
    types = spark.createDataset(typeList)(Encoders.product[TypeAssertion]).toDF(),
    tbox = tbox)
}
