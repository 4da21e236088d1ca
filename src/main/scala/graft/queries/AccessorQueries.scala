package graft.queries

import graft.pipeline.{KgPipeline, Media, Pages}
import graft.sources.{TpchKg, TpchKgSql}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Per-individual accessors (SURVEY F5-F7), evaluation statistics (A7) and
  * the multimodal frame-sampling stub — all oracle-checked. */
object AccessorQueries {

  type Q = (SparkSession, String) => DataFrame

  def queries: Map[String, Q] = Map(
    "acc_types_of" -> ((s, d) => TpchKg.load(s, d).typesOf("c:1")),
    "acc_obj_props_of" -> ((s, d) => TpchKg.load(s, d).objectPropertiesOf("o:1")),
    "acc_prop_values" -> ((s, d) => TpchKg.load(s, d).objectPropertyValues("o:1", "contains")),
    "acc_data_values" -> ((s, d) => TpchKg.load(s, d).dataPropertyValues("c:1", "acctbal")),
    // A7: mean + population stddev, the eval harness's statistics
    // (reference examples/evaluation_table_generator.py:189-207)
    "stats_mean_stddev" -> ((s, d) =>
      s.read.parquet(s"$d/documents.parquet")
        .groupBy("lang")
        .agg(count(lit(1)).as("n"),
          round(avg(col("n_chars")), 5).as("mean_chars"),
          round(stddev_pop(col("n_chars")), 5).as("sd_chars"))),
    "fe_media_frames" -> ((s, d) =>
      Media.frameSample(Pages.fromDir(s, d)).toDF()),
    // typed data-property accessors (reference knowledge_base.py:1042-1072)
    "acc_typed_props" -> ((s, d) => {
      val kb = TpchKg.load(s, d)
      import org.apache.spark.sql.Encoders
      val rows =
        kb.booleanDataProperties.map(_ -> "boolean") ++
          kb.numericDataProperties.map(_ -> "numeric") ++
          kb.doubleDataProperties.map(_ -> "double") ++
          kb.timeDataProperties.map(_ -> "time")
      s.createDataset(rows)(Encoders.tuple(Encoders.STRING, Encoders.STRING))
        .toDF("prop", "grp")
    }),
    // typed-column materialization: numeric group cast to double
    "acc_typed_values" -> ((s, d) =>
      TpchKg.load(s, d).typedDataValues(graft.core.DatatypeGroups.Numeric, "double")
        .select(col("node"), col("prop"), round(col("value"), 5).as("value"))),
    // hierarchy navigation (reference knowledge_base.py:729-966): roots,
    // leaves (global + under Agent), direct children/parents, proper subs
    "acc_hierarchy" -> ((s, d) => {
      val kb = TpchKg.load(s, d)
      import org.apache.spark.sql.Encoders
      val rows =
        kb.getMostGeneralClasses.map("roots" -> _) ++
          kb.getLeastGeneralNamedConcepts.map("leaves" -> _) ++
          kb.getLeafConcepts("Agent").map("leaves_of_agent" -> _) ++
          kb.getDirectSubConcepts("Agent").map("direct_sub_agent" -> _) ++
          kb.getDirectParents("Customer").map("direct_parents_customer" -> _) ++
          kb.getAllSubConcepts("Place").toSeq.sorted.map("all_sub_place" -> _)
      s.createDataset(rows)(Encoders.tuple(Encoders.STRING, Encoders.STRING))
        .toDF("kind", "cls")
    }),
    // domain-filtered property enumerators (knowledge_base.py:626-655,
    // 820-940): containment probes run as real anti-join emptiness checks
    "acc_prop_enum" -> ((s, d) => {
      val kb = TpchKg.load(s, d)
      import graft.expr.{ClassExpr, Named}
      import org.apache.spark.sql.Encoders
      val rows =
        kb.mostGeneralObjectProperties(Named("Customer")).map("obj_dom_customer" -> _) ++
          kb.mostGeneralObjectProperties(Named("Nation"), inverse = true).map("obj_rng_nation" -> _) ++
          kb.mostGeneralDataProperties(Named("Order")).map("data_dom_order" -> _) ++
          kb.mostGeneralBooleanDataProperties(Named("Order")).map("bool_dom_order" -> _) ++
          kb.mostGeneralTimeDataProperties(Named("Order")).map("time_dom_order" -> _) ++
          kb.mostGeneralExistentialRestrictions(Named("Customer"))
            .map(ce => "exists_dom_customer" -> ClassExpr.render(ce)) ++
          kb.mostGeneralUniversalRestrictionsInverse(Named("Nation"))
            .map(ce => "forall_inv_rng_nation" -> ClassExpr.render(ce))
      s.createDataset(rows)(Encoders.tuple(Encoders.STRING, Encoders.STRING))
        .toDF("kind", "value")
    }))

  private val htmlLen = s"octet_length(encode(${Pages.Sql.html}))"

  def oracleSql: Map[String, String] = Map(
    "acc_types_of" -> TpchKgSql.withKg("SELECT cls FROM types WHERE node = 'c:1'"),
    "acc_obj_props_of" -> TpchKgSql.withKg(
      "SELECT DISTINCT pred FROM edges WHERE src = 'o:1'"),
    "acc_prop_values" -> TpchKgSql.withKg(
      "SELECT dst FROM edges WHERE src = 'o:1' AND pred = 'contains'"),
    "acc_data_values" -> TpchKgSql.withKg(
      "SELECT lexical, dtype FROM attrs WHERE node = 'c:1' AND prop = 'acctbal'"),
    "stats_mean_stddev" ->
      """SELECT lang, CAST(COUNT(*) AS BIGINT) AS n,
        |  ROUND(AVG(n_chars), 5) AS mean_chars,
        |  ROUND(STDDEV_POP(n_chars), 5) AS sd_chars
        |FROM documents GROUP BY lang""".stripMargin,
    // hand-enumerated from the TPC-H KG schema declarations (a real check
    // of the tbox-driven group filter, not generated from the same code)
    "acc_typed_props" ->
      """SELECT * FROM (VALUES
        |  ('urgent', 'boolean'),
        |  ('acctbal', 'numeric'), ('retailprice', 'numeric'),
        |  ('totalprice', 'numeric'), ('psize', 'numeric'),
        |  ('acctbal', 'double'), ('retailprice', 'double'),
        |  ('totalprice', 'double'),
        |  ('orderdate', 'time')
        |) t(prop, grp)""".stripMargin,
    "acc_typed_values" -> TpchKgSql.withKg(
      """SELECT node, prop, ROUND(CAST(lexical AS DOUBLE), 5) AS value FROM attrs
        |WHERE prop IN ('acctbal', 'psize', 'retailprice', 'totalprice')""".stripMargin),
    "acc_hierarchy" ->
      """SELECT * FROM (VALUES
        |  ('roots', 'Agent'), ('roots', 'Order'), ('roots', 'Part'), ('roots', 'Place'),
        |  ('leaves', 'Customer'), ('leaves', 'Nation'), ('leaves', 'Order'),
        |  ('leaves', 'Part'), ('leaves', 'Region'), ('leaves', 'Supplier'),
        |  ('leaves_of_agent', 'Customer'), ('leaves_of_agent', 'Supplier'),
        |  ('direct_sub_agent', 'Customer'), ('direct_sub_agent', 'Supplier'),
        |  ('direct_parents_customer', 'Agent'),
        |  ('all_sub_place', 'Nation'), ('all_sub_place', 'Region')
        |) t(kind, cls)""".stripMargin,
    "acc_prop_enum" ->
      """SELECT * FROM (VALUES
        |  ('obj_dom_customer', 'inNation'),
        |  ('obj_rng_nation', 'inNation'),
        |  ('data_dom_order', 'name'), ('data_dom_order', 'totalprice'),
        |  ('data_dom_order', 'orderdate'), ('data_dom_order', 'orderstatus'),
        |  ('data_dom_order', 'orderpriority'), ('data_dom_order', 'urgent'),
        |  ('bool_dom_order', 'urgent'),
        |  ('time_dom_order', 'orderdate'),
        |  ('exists_dom_customer', '∃inNation.⊤'),
        |  ('forall_inv_rng_nation', '∀inNation⁻.⊤')
        |) t(kind, value)""".stripMargin,
    "fe_media_frames" ->
      s"""WITH d AS (SELECT ${Pages.Sql.url} AS url, $htmlLen AS n
         |  FROM (SELECT doc_id, ${Pages.Sql.body} AS body FROM documents) b)
         |SELECT url, CAST(i AS INT) AS frame_idx,
         |  CAST(i * (n // (1 + n % 7)) AS BIGINT) AS byte_offset
         |FROM d CROSS JOIN generate_series(0, 6) g(i)
         |WHERE i < 1 + n % 7""".stripMargin)
}
