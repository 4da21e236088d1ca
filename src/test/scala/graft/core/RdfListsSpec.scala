package graft.core

import graft.SparkSpec
import org.apache.spark.sql.functions._

class RdfListsSpec extends SparkSpec {
  import spark.implicits._

  private def triples(rows: (String, String, String)*) =
    rows.toDF("subj", "pred", "obj")

  private def cons(head: String, members: Seq[String]): Seq[(String, String, String)] =
    members.zipWithIndex.flatMap { case (m, i) =>
      val cell = if (i == 0) head else s"$head#$i"
      val next = if (i == members.length - 1) "rdf:nil" else s"$head#${i + 1}"
      Seq((cell, "rdf:first", m), (cell, "rdf:rest", next))
    }

  test("flatten recovers positions for lists of mixed lengths") {
    val t = triples(cons("a", Seq("x", "y", "z")) ++
      cons("b", Seq("q")) ++ cons("c", Seq("m", "n")): _*)
    val got = RdfLists.flatten(t)
      .collect().map(r => (r.getString(0), r.getInt(1), r.getString(2))).toSet
    assert(got === Set(
      ("a", 0, "x"), ("a", 1, "y"), ("a", 2, "z"),
      ("b", 0, "q"),
      ("c", 0, "m"), ("c", 1, "n")))
  }

  test("a 500-deep list resolves through pointer doubling, exact positions") {
    val members = (0 until 500).map(i => s"m$i")
    val got = RdfLists.flatten(triples(cons("deep", members): _*))
      .collect().map(r => (r.getInt(1), r.getString(2))).toMap
    assert(got.size === 500)
    assert((0 until 500).forall(i => got(i) == s"m$i"))
  }

  test("memberless spine cells contribute no rows, others keep exact idx") {
    // cell 'a#1' has rest but no first — legal RDF, just memberless
    val t = triples(
      ("a", "rdf:first", "x"), ("a", "rdf:rest", "a#1"),
      ("a#1", "rdf:rest", "a#2"),
      ("a#2", "rdf:first", "z"), ("a#2", "rdf:rest", "rdf:nil"))
    val got = RdfLists.flatten(t)
      .collect().map(r => (r.getString(0), r.getInt(1), r.getString(2))).toSet
    assert(got === Set(("a", 0, "x"), ("a", 2, "z")))
  }

  test("cyclic rest chain raises") {
    val t = triples(
      ("a", "rdf:first", "x"), ("a", "rdf:rest", "b"),
      ("b", "rdf:first", "y"), ("b", "rdf:rest", "a"))
    val e = intercept[IllegalArgumentException](RdfLists.flatten(t).collect())
    assert(e.getMessage.contains("cyclic"))
  }

  test("shared tail raises") {
    val t = triples(
      ("a", "rdf:first", "x"), ("a", "rdf:rest", "t"),
      ("b", "rdf:first", "y"), ("b", "rdf:rest", "t"),
      ("t", "rdf:first", "z"), ("t", "rdf:rest", "rdf:nil"))
    val e = intercept[IllegalArgumentException](RdfLists.flatten(t).collect())
    assert(e.getMessage.contains("shared tail"))
  }

  test("double rdf:first / double rdf:rest raise") {
    val f = triples(("a", "rdf:first", "x"), ("a", "rdf:first", "y"),
      ("a", "rdf:rest", "rdf:nil"))
    assert(intercept[IllegalArgumentException](RdfLists.flatten(f))
      .getMessage.contains("multiple rdf:first"))
    val r = triples(("a", "rdf:first", "x"),
      ("a", "rdf:rest", "rdf:nil"), ("a", "rdf:rest", "b"))
    assert(intercept[IllegalArgumentException](RdfLists.flatten(r))
      .getMessage.contains("multiple rdf:rest"))
  }
}
