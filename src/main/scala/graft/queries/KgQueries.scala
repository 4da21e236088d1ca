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
    "kg_abox_expression" -> ((s, d) => TpchKg.load(s, d).aboxExpression),
    // graph-analytics metrics over the co-purchase projection (parts
    // sharing an order): exact distributed triangle counting with
    // degree-ordered orientation — the clustering-structure half of the
    // sampler-quality story (degrees: smp_rn_degdist)
    "kg_tri_counts" -> ((s, d) => graft.sample.GraphMetrics.triangleCounts(
      graft.sample.GraphMetrics.cooccurrence(TpchKg.load(s, d).edges, "contains"))),
    "kg_transitivity" -> ((s, d) => graft.sample.GraphMetrics.globalMetrics(
      graft.sample.GraphMetrics.cooccurrence(TpchKg.load(s, d).edges, "contains"))),
    // synchronous label propagation (4 rounds) over the same projection —
    // community structure, the third sampler-quality axis; every round
    // replayed by the oracle
    "kg_label_prop" -> ((s, d) => graft.sample.LabelProp.run(
      graft.sample.GraphMetrics.cooccurrence(TpchKg.load(s, d).edges, "contains"),
      rounds = 4)))

  /** DuckDB mirror of GraphMetrics.cooccurrence over the contains edges —
    * the undirected co-purchase projection the graph-metric oracles share. */
  private def projCtes: String =
    """cp AS MATERIALIZED (SELECT DISTINCT src, dst FROM edges WHERE pred = 'contains'),
      |und AS MATERIALIZED (
      |  SELECT DISTINCT a.dst AS u, b.dst AS v
      |  FROM cp a JOIN cp b ON a.src = b.src AND a.dst < b.dst)""".stripMargin

  /** DuckDB replay of GraphMetrics' orientation + wedge-close joins —
    * shared CTE chain of the two triangle oracles. MATERIALIZED: und/deg/ore
    * are each referenced 2-3× downstream (see the verify skill's CTE note). */
  private def triCtes: String =
    s"""$projCtes,
      |deg AS MATERIALIZED (
      |  SELECT id, COUNT(*) AS deg
      |  FROM (SELECT u AS id FROM und UNION ALL SELECT v FROM und) t GROUP BY 1),
      |ore AS MATERIALIZED (
      |  SELECT CASE WHEN du.deg < dv.deg OR (du.deg = dv.deg AND und.u < und.v) THEN und.u ELSE und.v END AS a,
      |         CASE WHEN du.deg < dv.deg OR (du.deg = dv.deg AND und.u < und.v) THEN und.v ELSE und.u END AS b,
      |         CASE WHEN du.deg < dv.deg OR (du.deg = dv.deg AND und.u < und.v) THEN dv.deg ELSE du.deg END AS bd
      |  FROM und JOIN deg du ON du.id = und.u JOIN deg dv ON dv.id = und.v),
      |tri AS MATERIALIZED (
      |  SELECT e1.a AS x, e1.b AS y, e2.b AS z
      |  FROM ore e1
      |  JOIN ore e2 ON e1.a = e2.a AND (e1.bd < e2.bd OR (e1.bd = e2.bd AND e1.b < e2.b))
      |  JOIN ore e3 ON e3.a = e1.b AND e3.b = e2.b)""".stripMargin

  /** DuckDB replay of LabelProp's synchronous rounds: identical total
    * order in the pick (count DESC, label ASC). */
  private def lpaCtes(rounds: Int): String = {
    val roundCtes = (1 to rounds).map { i =>
      s"""l$i AS MATERIALIZED (
         |  SELECT id, lbl FROM (
         |    SELECT s.u AS id, l.lbl, COUNT(*) AS c,
         |           ROW_NUMBER() OVER (PARTITION BY s.u ORDER BY COUNT(*) DESC, l.lbl) AS rn
         |    FROM sym s JOIN l${i - 1} l ON l.id = s.v GROUP BY s.u, l.lbl) t
         |  WHERE rn = 1)""".stripMargin
    }.mkString(",\n")
    s"""sym AS MATERIALIZED (SELECT u, v FROM und UNION ALL SELECT v AS u, u AS v FROM und),
       |l0 AS MATERIALIZED (SELECT DISTINCT u AS id, u AS lbl FROM sym),
       |$roundCtes""".stripMargin
  }

  def oracleSql: Map[String, String] = Map(
    "kg_label_prop" -> TpchKgSql.withKg(
      s"""$projCtes,
         |${lpaCtes(4)}
         |SELECT id, lbl FROM l4""".stripMargin, inCte = true),
    "kg_tri_counts" -> TpchKgSql.withKg(
      s"""$triCtes
         |SELECT id, COUNT(*) AS tri_cnt
         |FROM (SELECT x AS id FROM tri UNION ALL SELECT y FROM tri UNION ALL SELECT z FROM tri) t
         |GROUP BY 1""".stripMargin, inCte = true),
    "kg_transitivity" -> TpchKgSql.withKg(
      s"""$triCtes
         |SELECT (SELECT COUNT(*) FROM tri) AS triangles,
         |       (SELECT CAST(SUM((deg * (deg - 1)) // 2) AS BIGINT) FROM deg) AS wedges""".stripMargin,
      inCte = true),
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
