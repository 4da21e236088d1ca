package graft.queries

import graft.sources.{TpchKg, TpchKgSql}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Core KG emission surface (SURVEY §2.1 S4-S7) as driver-checkable queries:
  * each entry has an exact DuckDB oracle over the same parquet tables. */
object KgQueries {

  type Q = (SparkSession, String) => DataFrame

  def queries: Map[String, Q] = Map(
    "kg_nodes" -> ((s, d) => TpchKg.load(s, d).nodes),
    "kg_edges" -> ((s, d) => TpchKg.load(s, d).edges),
    "kg_attrs" -> ((s, d) => TpchKg.load(s, d).attrs),
    "kg_types" -> ((s, d) => TpchKg.load(s, d).types),
    "kg_abox_triples" -> ((s, d) => TpchKg.load(s, d).aboxTriples),
    "kg_tbox_triples" -> ((s, d) => TpchKg.load(s, d).tboxTriples),
    "kg_triples" -> ((s, d) => TpchKg.load(s, d).triples),
    "kg_abox_expression" -> ((s, d) => TpchKg.load(s, d).aboxExpression))

  def oracleSql: Map[String, String] = Map(
    "kg_nodes" -> TpchKgSql.nodes,
    "kg_edges" -> TpchKgSql.edges,
    "kg_attrs" -> TpchKgSql.attrs,
    "kg_types" -> TpchKgSql.types,
    "kg_abox_triples" -> TpchKgSql.aboxTriples,
    "kg_tbox_triples" -> TpchKgSql.tboxTriples,
    "kg_triples" -> TpchKgSql.triples,
    "kg_abox_expression" -> TpchKgSql.withKg(
      """SELECT node AS subj, cls AS expr FROM types
        |UNION ALL
        |SELECT node, '∃' || prop || '.{' || lexical || '}' FROM attrs
        |UNION ALL
        |SELECT src, '∃' || pred || '.{' || dst || '}' FROM edges
        |UNION ALL
        |SELECT subj, '∃' || pred || '.' || cls FROM
        |  (SELECT e.src AS subj, e.pred, t.cls FROM edges e JOIN types t ON e.dst = t.node GROUP BY 1,2,3) g
        |UNION ALL
        |SELECT subj, '≥' || CAST(n AS VARCHAR) || ' ' || pred || '.' || cls FROM
        |  (SELECT e.src AS subj, e.pred, t.cls, COUNT(*) AS n FROM edges e JOIN types t ON e.dst = t.node GROUP BY 1,2,3) h
        |WHERE n > 1""".stripMargin))
}
