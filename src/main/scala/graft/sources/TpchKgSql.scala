package graft.sources

/** DuckDB-SQL mirror of [[TpchKg]] — WITH-clause fragments the oracle
  * queries compose. Must stay semantically identical to the DataFrame
  * derivation (every lexical form matches byte-for-byte).
  */
object TpchKgSql {

  val nodes: String =
    """SELECT 'c:' || CAST(c_custkey AS VARCHAR) AS id FROM customer
      |UNION ALL SELECT 's:' || CAST(s_suppkey AS VARCHAR) FROM supplier
      |UNION ALL SELECT 'p:' || CAST(p_partkey AS VARCHAR) FROM part
      |UNION ALL SELECT 'o:' || CAST(o_orderkey AS VARCHAR) FROM orders
      |UNION ALL SELECT 'n:' || CAST(n_nationkey AS VARCHAR) FROM nation
      |UNION ALL SELECT 'r:' || CAST(r_regionkey AS VARCHAR) FROM region""".stripMargin

  val nodesk: String =
    """SELECT 'r:' || CAST(r_regionkey AS VARCHAR) AS id, 10000000 + r_regionkey AS k FROM region
      |UNION ALL SELECT 'n:' || CAST(n_nationkey AS VARCHAR), 20000000 + n_nationkey FROM nation
      |UNION ALL SELECT 'c:' || CAST(c_custkey AS VARCHAR), 30000000 + c_custkey FROM customer
      |UNION ALL SELECT 's:' || CAST(s_suppkey AS VARCHAR), 40000000 + s_suppkey FROM supplier
      |UNION ALL SELECT 'p:' || CAST(p_partkey AS VARCHAR), 50000000 + p_partkey FROM part
      |UNION ALL SELECT 'o:' || CAST(o_orderkey AS VARCHAR), 60000000 + o_orderkey FROM orders""".stripMargin

  val edges: String =
    """SELECT 'c:' || CAST(c_custkey AS VARCHAR) AS src, 'inNation' AS pred, 'n:' || CAST(c_nationkey AS VARCHAR) AS dst FROM customer
      |UNION ALL SELECT 's:' || CAST(s_suppkey AS VARCHAR), 'inNation', 'n:' || CAST(s_nationkey AS VARCHAR) FROM supplier
      |UNION ALL SELECT 'n:' || CAST(n_nationkey AS VARCHAR), 'inRegion', 'r:' || CAST(n_regionkey AS VARCHAR) FROM nation
      |UNION ALL SELECT 'o:' || CAST(o_orderkey AS VARCHAR), 'placedBy', 'c:' || CAST(o_custkey AS VARCHAR) FROM orders
      |UNION ALL SELECT DISTINCT 'o:' || CAST(l_orderkey AS VARCHAR), 'contains', 'p:' || CAST(l_partkey AS VARCHAR) FROM lineitem
      |UNION ALL SELECT DISTINCT 'o:' || CAST(l_orderkey AS VARCHAR), 'suppliedBy', 's:' || CAST(l_suppkey AS VARCHAR) FROM lineitem""".stripMargin

  val types: String =
    """SELECT 'c:' || CAST(c_custkey AS VARCHAR) AS node, 'Customer' AS cls FROM customer
      |UNION ALL SELECT 's:' || CAST(s_suppkey AS VARCHAR), 'Supplier' FROM supplier
      |UNION ALL SELECT 'p:' || CAST(p_partkey AS VARCHAR), 'Part' FROM part
      |UNION ALL SELECT 'o:' || CAST(o_orderkey AS VARCHAR), 'Order' FROM orders
      |UNION ALL SELECT 'n:' || CAST(n_nationkey AS VARCHAR), 'Nation' FROM nation
      |UNION ALL SELECT 'r:' || CAST(r_regionkey AS VARCHAR), 'Region' FROM region""".stripMargin

  val attrs: String =
    """SELECT 'c:' || CAST(c_custkey AS VARCHAR) AS node, 'name' AS prop, c_name AS lexical, 'xsd:string' AS dtype FROM customer
      |UNION ALL SELECT 'c:' || CAST(c_custkey AS VARCHAR), 'acctbal', CAST(CAST(c_acctbal AS DECIMAL(12,2)) AS VARCHAR), 'xsd:double' FROM customer
      |UNION ALL SELECT 'c:' || CAST(c_custkey AS VARCHAR), 'mktsegment', c_mktsegment, 'xsd:string' FROM customer
      |UNION ALL SELECT 's:' || CAST(s_suppkey AS VARCHAR), 'name', s_name, 'xsd:string' FROM supplier
      |UNION ALL SELECT 's:' || CAST(s_suppkey AS VARCHAR), 'acctbal', CAST(CAST(s_acctbal AS DECIMAL(12,2)) AS VARCHAR), 'xsd:double' FROM supplier
      |UNION ALL SELECT 'p:' || CAST(p_partkey AS VARCHAR), 'name', p_name, 'xsd:string' FROM part
      |UNION ALL SELECT 'p:' || CAST(p_partkey AS VARCHAR), 'brand', p_brand, 'xsd:string' FROM part
      |UNION ALL SELECT 'p:' || CAST(p_partkey AS VARCHAR), 'ptype', p_type, 'xsd:string' FROM part
      |UNION ALL SELECT 'p:' || CAST(p_partkey AS VARCHAR), 'psize', CAST(p_size AS VARCHAR), 'xsd:int' FROM part
      |UNION ALL SELECT 'p:' || CAST(p_partkey AS VARCHAR), 'retailprice', CAST(CAST(p_retailprice AS DECIMAL(12,2)) AS VARCHAR), 'xsd:double' FROM part
      |UNION ALL SELECT 'o:' || CAST(o_orderkey AS VARCHAR), 'totalprice', CAST(CAST(o_totalprice AS DECIMAL(12,2)) AS VARCHAR), 'xsd:double' FROM orders
      |UNION ALL SELECT 'o:' || CAST(o_orderkey AS VARCHAR), 'orderdate', strftime(o_orderdate, '%Y-%m-%d'), 'xsd:date' FROM orders
      |UNION ALL SELECT 'o:' || CAST(o_orderkey AS VARCHAR), 'orderstatus', o_orderstatus, 'xsd:string' FROM orders
      |UNION ALL SELECT 'o:' || CAST(o_orderkey AS VARCHAR), 'orderpriority', o_orderpriority, 'xsd:string' FROM orders
      |UNION ALL SELECT 'o:' || CAST(o_orderkey AS VARCHAR), 'urgent', CASE WHEN o_orderpriority = '1-URGENT' THEN 'true' ELSE 'false' END, 'xsd:boolean' FROM orders
      |UNION ALL SELECT 'n:' || CAST(n_nationkey AS VARCHAR), 'name', n_name, 'xsd:string' FROM nation
      |UNION ALL SELECT 'r:' || CAST(r_regionkey AS VARCHAR), 'name', r_name, 'xsd:string' FROM region""".stripMargin

  /** TBox triples as a constant VALUES list — generated from TpchKg.tbox so
    * the two sides cannot drift. */
  def tboxTriples: String = {
    val rows = TpchKg.tbox.tripleRows()
      .map(t => s"('${t.subj}', '${t.pred}', '${t.obj}')")
      .mkString(",\n")
    s"SELECT * FROM (VALUES\n$rows\n) AS t(subj, pred, obj)"
  }

  val aboxTriples: String =
    s"""SELECT node AS subj, 'rdf:type' AS pred, cls AS obj FROM (${types}) t
       |UNION ALL SELECT node, prop, lexical FROM (${attrs}) a
       |UNION ALL SELECT src, pred, dst FROM (${edges}) e""".stripMargin

  def triples: String = s"$aboxTriples\nUNION ALL\nSELECT * FROM ($tboxTriples) tb"

  /** Wrap a body with the standard CTE prelude. When `inCte`, the body
    * itself begins with further CTE definitions (joined with a comma). */
  def withKg(body: String, inCte: Boolean = false): String = {
    val prelude = s"WITH nodes AS ($nodes), edges AS ($edges), attrs AS ($attrs), types AS ($types), nodesk AS ($nodesk)"
    if (inCte) s"$prelude,\n$body" else s"$prelude\n$body"
  }
}
