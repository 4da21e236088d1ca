package graft.core

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** SHACL-lite shape validation over the KG fact tables — the QA pass a
  * production KG-construction pipeline runs before publishing a build
  * (W3C SHACL core, the min/max-cardinality / value-class / datatype /
  * value-range subset that covers most real shapes graphs). Output is the
  * violations table (focus, shape_id, component, detail): empty means
  * conformant, and each row names the focus node, the shape, the violated
  * constraint component, and the offending value — the SHACL validation
  * report flattened to one relational surface.
  *
  * Plan shapes, per property shape: target selection is one filtered scan
  * of `types`; cardinality is one map-side-combinable count aggregate over
  * the predicate-filtered edge scan joined (left) to the target set —
  * minCount needs the left join so ZERO-count focus nodes surface;
  * value-class is a left-anti join of the value side against the typed
  * set. Per attr shape: one filtered `attrs` scan semi-joined to the
  * target set, datatype/range checks are pure row-local expressions
  * (try_cast — never a crash on dirty lexical forms). Everything is keyed
  * joins + aggregates; nothing collects, nothing sorts.
  */
final case class PropertyShape(
    shapeId: String,
    targetClass: String,
    path: String, // predicate name; "^pred" validates the inverse direction
    minCount: Int = 0,
    maxCount: Option[Int] = None,
    valueClass: Option[String] = None)

final case class AttrShape(
    shapeId: String,
    targetClass: String,
    prop: String,
    datatype: Option[String] = None, // expected dtype tag; lexical must also cast
    minInclusive: Option[Double] = None)

object Shapes {

  /** Validate `propShapes` + `attrShapes` against the fact tables.
    * Returns the violations DataFrame (focus, shape_id, component,
    * detail) — one row per (focus, constraint component, offending
    * value). */
  def validate(
      edges: DataFrame,
      types: DataFrame,
      attrs: DataFrame,
      propShapes: Seq[PropertyShape] = Nil,
      attrShapes: Seq[AttrShape] = Nil): DataFrame = {
    val parts = propShapes.map(validateProp(edges, types, _)) ++
      attrShapes.map(validateAttr(types, attrs, _))
    require(parts.nonEmpty, "no shapes given")
    parts.reduce(_ unionAll _)
  }

  private def focusOf(types: DataFrame, cls: String): DataFrame =
    types.filter(col("cls") === cls).select(col("node").as("focus"))

  private def validateProp(edges: DataFrame, types: DataFrame, sh: PropertyShape): DataFrame = {
    val inverse = sh.path.startsWith("^")
    val p = sh.path.stripPrefix("^")
    val vals0 = edges.filter(col("pred") === p)
    val vals =
      if (inverse) vals0.select(col("dst").as("focus"), col("src").as("value"))
      else vals0.select(col("src").as("focus"), col("dst").as("value"))
    val focus = focusOf(types, sh.targetClass)

    // cardinality: count per focus, left join so absent-property focus
    // nodes count 0 (the only way a minCount 1 violation can exist)
    val counts = focus.join(
      vals.groupBy("focus").agg(count(lit(1)).as("n")), Seq("focus"), "left")
      .select(col("focus"), coalesce(col("n"), lit(0L)).as("n"))
    val minV = counts.filter(col("n") < sh.minCount).select(
      col("focus"), lit(sh.shapeId).as("shape_id"),
      lit("minCount").as("component"), col("n").cast("string").as("detail"))
    val maxV = sh.maxCount match {
      case Some(m) => counts.filter(col("n") > m).select(
        col("focus"), lit(sh.shapeId).as("shape_id"),
        lit("maxCount").as("component"), col("n").cast("string").as("detail"))
      case None => emptyLike(counts)
    }
    val clsV = sh.valueClass match {
      case Some(c) =>
        val typed = types.filter(col("cls") === c).select(col("node"))
        vals.join(focus, Seq("focus"), "left_semi")
          .join(typed, vals("value") === typed("node"), "left_anti")
          .select(col("focus"), lit(sh.shapeId).as("shape_id"),
            lit("class").as("component"), col("value").as("detail"))
      case None => emptyLike(counts)
    }
    minV.unionAll(maxV).unionAll(clsV)
  }

  private def validateAttr(types: DataFrame, attrs: DataFrame, sh: AttrShape): DataFrame = {
    val focus = focusOf(types, sh.targetClass)
    val rows = attrs.filter(col("prop") === sh.prop)
      .withColumnRenamed("node", "focus")
      .join(focus, Seq("focus"), "left_semi")

    val dtV = sh.datatype match {
      case Some(dt) =>
        val castOk: org.apache.spark.sql.Column = dt match {
          case "xsd:double"  => expr("try_cast(lexical AS double)").isNotNull
          case "xsd:int"     => expr("try_cast(lexical AS int)").isNotNull
          case "xsd:date"    => expr("try_cast(lexical AS date)").isNotNull
          case "xsd:boolean" => col("lexical").isin("true", "false")
          case _             => lit(true) // xsd:string and friends: any lexical form
        }
        rows.filter(col("dtype") =!= dt || !castOk).select(
          col("focus"), lit(sh.shapeId).as("shape_id"),
          lit("datatype").as("component"), col("lexical").as("detail"))
      case None => emptyLike(rows.select(col("focus")))
    }
    val rangeV = sh.minInclusive match {
      case Some(lo) =>
        rows.filter(expr("try_cast(lexical AS double)") < lo).select(
          col("focus"), lit(sh.shapeId).as("shape_id"),
          lit("minInclusive").as("component"), col("lexical").as("detail"))
      case None => emptyLike(rows.select(col("focus")))
    }
    dtV.unionAll(rangeV)
  }

  /** Empty violations frame sharing `ref`'s session. */
  private def emptyLike(ref: DataFrame): DataFrame =
    ref.limit(0).select(
      lit("").as("focus"), lit("").as("shape_id"),
      lit("").as("component"), lit("").as("detail"))
}
