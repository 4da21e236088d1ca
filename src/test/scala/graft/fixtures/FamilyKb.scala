package graft.fixtures

import graft.core._
import org.apache.spark.sql.{Encoders, SparkSession}

/** FIXTURES.md F2: tiny family-style KB, shape-cloned from the reference's
  * KGs/father.owl (6 individuals, hasChild, person/male/female) scaled to
  * ~20 nodes. Authored literally so golden tests can enumerate expectations.
  */
object FamilyKb {

  val males = (1 to 6).map(i => s"m$i")
  val females = (1 to 6).map(i => s"f$i")
  val others = (1 to 4).map(i => s"x$i") // persons with no gender subclass
  val all: Seq[String] = males ++ females ++ others

  // a small two-generation family forest + one cycle-free chain; x-nodes isolated
  val edgeList: Seq[Edge] = Seq(
    Edge("m1", "hasChild", "m2"), Edge("m1", "hasChild", "f2"),
    Edge("f1", "hasChild", "m2"), Edge("f1", "hasChild", "f2"),
    Edge("m2", "hasChild", "m3"), Edge("f2", "hasChild", "f3"),
    Edge("m3", "hasChild", "m4"), Edge("m3", "hasChild", "f4"), Edge("m3", "hasChild", "x1"),
    Edge("f3", "hasChild", "m5"),
    Edge("m4", "married", "f4"), Edge("f4", "married", "m4"),
    Edge("m5", "hasChild", "m6"), Edge("f5", "hasChild", "f6"))

  val typeList: Seq[TypeAssertion] =
    males.map(TypeAssertion(_, "male")) ++
      females.map(TypeAssertion(_, "female")) ++
      others.map(TypeAssertion(_, "person"))

  val attrList: Seq[Attr] = Seq(
    Attr("m1", "age", "61", "xsd:int"), Attr("f1", "age", "60", "xsd:int"),
    Attr("m2", "age", "35", "xsd:int"), Attr("f2", "age", "34", "xsd:int"),
    Attr("m3", "age", "15", "xsd:int"), Attr("f3", "age", "14", "xsd:int"),
    Attr("m1", "nickname", "gramps", "xsd:string"))

  val tbox: Tbox = Tbox(
    classes = Seq("person", "male", "female"),
    subClass = Seq("male" -> "person", "female" -> "person"),
    props = Seq(
      PropMeta("hasChild", "object", "person", "person"),
      PropMeta("married", "object", "person", "person"),
      PropMeta("age", "data", "person", "xsd:int"),
      PropMeta("nickname", "data", "person", "xsd:string")))

  def kb(spark: SparkSession): Kb = Kb(
    nodes = spark.createDataset(all)(Encoders.STRING).toDF("id"),
    edges = spark.createDataset(edgeList)(Encoders.product[Edge]).toDF(),
    attrs = spark.createDataset(attrList)(Encoders.product[Attr]).toDF(),
    types = spark.createDataset(typeList)(Encoders.product[TypeAssertion]).toDF(),
    tbox = tbox)
}
