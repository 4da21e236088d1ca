package graft.sources

import graft.core._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic knowledge-graph derivation from the driver-provided
  * TPC-H-ish parquet tables (TESTDATA.md). This is the engine's stand-in for
  * "a materialized graph" at verify/bench scale: node IRIs, typed edges,
  * lexical attributes and class assertions are pure functions of the rows, so
  * the very same derivation is expressible in the DuckDB oracle SQL
  * (see [[TpchKgSql]]) and every downstream operator becomes
  * hash-checkable end-to-end.
  *
  * IRI scheme: c:<custkey>, s:<suppkey>, p:<partkey>, o:<orderkey>,
  * n:<nationkey>, r:<regionkey>. Each node also carries a unique numeric key
  * `tag*10^7 + key` used by the portable-LCG sampling order (Determinism).
  */
object TpchKg {

  val classes = Seq("Customer", "Supplier", "Part", "Order", "Nation", "Region", "Agent", "Place")
  val subClass = Seq("Customer" -> "Agent", "Supplier" -> "Agent",
    "Nation" -> "Place", "Region" -> "Place")
  val props = Seq(
    PropMeta("inNation", "object", "Agent", "Nation"),
    PropMeta("inRegion", "object", "Nation", "Region"),
    PropMeta("placedBy", "object", "Order", "Customer"),
    PropMeta("contains", "object", "Order", "Part"),
    PropMeta("suppliedBy", "object", "Order", "Supplier"),
    PropMeta("name", "data", "", "xsd:string"),
    PropMeta("acctbal", "data", "Agent", "xsd:double"),
    PropMeta("mktsegment", "data", "Customer", "xsd:string"),
    PropMeta("brand", "data", "Part", "xsd:string"),
    PropMeta("ptype", "data", "Part", "xsd:string"),
    PropMeta("psize", "data", "Part", "xsd:int"),
    PropMeta("retailprice", "data", "Part", "xsd:double"),
    PropMeta("totalprice", "data", "Order", "xsd:double"),
    PropMeta("orderdate", "data", "Order", "xsd:date"),
    PropMeta("orderstatus", "data", "Order", "xsd:string"),
    PropMeta("orderpriority", "data", "Order", "xsd:string"),
    PropMeta("urgent", "data", "Order", "xsd:boolean"))

  val tbox: Tbox = Tbox(classes, subClass, props = props)

  private def iri(tag: String, key: org.apache.spark.sql.Column) =
    concat(lit(tag + ":"), key.cast("string"))
  /** Lexical form of a money-ish double: fixed 2-decimal, matching
    * CAST(x AS DECIMAL(12,2))::VARCHAR in DuckDB. */
  private def dec2(c: org.apache.spark.sql.Column) =
    c.cast("decimal(12,2)").cast("string")

  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** Build the KG fact tables from a testdata sf directory. */
  def load(spark: SparkSession, dir: String): Kb = {
    val customer = table(spark, dir, "customer")
    val supplier = table(spark, dir, "supplier")
    val part = table(spark, dir, "part")
    val orders = table(spark, dir, "orders")
    val lineitem = table(spark, dir, "lineitem")
    val nation = table(spark, dir, "nation")
    val region = table(spark, dir, "region")

    val nodes =
      customer.select(iri("c", col("c_custkey")).as("id"))
        .unionAll(supplier.select(iri("s", col("s_suppkey")).as("id")))
        .unionAll(part.select(iri("p", col("p_partkey")).as("id")))
        .unionAll(orders.select(iri("o", col("o_orderkey")).as("id")))
        .unionAll(nation.select(iri("n", col("n_nationkey")).as("id")))
        .unionAll(region.select(iri("r", col("r_regionkey")).as("id")))

    val edges =
      customer.select(iri("c", col("c_custkey")).as("src"), lit("inNation").as("pred"),
          iri("n", col("c_nationkey")).as("dst"))
        .unionAll(supplier.select(iri("s", col("s_suppkey")).as("src"), lit("inNation").as("pred"),
          iri("n", col("s_nationkey")).as("dst")))
        .unionAll(nation.select(iri("n", col("n_nationkey")).as("src"), lit("inRegion").as("pred"),
          iri("r", col("n_regionkey")).as("dst")))
        .unionAll(orders.select(iri("o", col("o_orderkey")).as("src"), lit("placedBy").as("pred"),
          iri("c", col("o_custkey")).as("dst")))
        // dedup on the INTEGER key pair, then build the IRI strings: iri()
        // is injective, so the row set is identical, but the distinct
        // shuffles two longs instead of three ~20-byte strings and the
        // concats run once per surviving row (≈2× off the only expensive
        // stages of every full-edge-table evaluation — r6 stage evidence)
        .unionAll(lineitem.select(col("l_orderkey").as("ok"), col("l_partkey").as("fk")).distinct()
          .select(iri("o", col("ok")).as("src"), lit("contains").as("pred"),
            iri("p", col("fk")).as("dst")))
        .unionAll(lineitem.select(col("l_orderkey").as("ok"), col("l_suppkey").as("fk")).distinct()
          .select(iri("o", col("ok")).as("src"), lit("suppliedBy").as("pred"),
            iri("s", col("fk")).as("dst")))

    val types =
      customer.select(iri("c", col("c_custkey")).as("node"), lit("Customer").as("cls"))
        .unionAll(supplier.select(iri("s", col("s_suppkey")).as("node"), lit("Supplier").as("cls")))
        .unionAll(part.select(iri("p", col("p_partkey")).as("node"), lit("Part").as("cls")))
        .unionAll(orders.select(iri("o", col("o_orderkey")).as("node"), lit("Order").as("cls")))
        .unionAll(nation.select(iri("n", col("n_nationkey")).as("node"), lit("Nation").as("cls")))
        .unionAll(region.select(iri("r", col("r_regionkey")).as("node"), lit("Region").as("cls")))

    def attr(df: DataFrame, tag: String, key: String, prop: String,
             value: org.apache.spark.sql.Column, dtype: String) =
      df.select(iri(tag, col(key)).as("node"), lit(prop).as("prop"),
        value.as("lexical"), lit(dtype).as("dtype"))

    val attrs =
      attr(customer, "c", "c_custkey", "name", col("c_name"), "xsd:string")
        .unionAll(attr(customer, "c", "c_custkey", "acctbal", dec2(col("c_acctbal")), "xsd:double"))
        .unionAll(attr(customer, "c", "c_custkey", "mktsegment", col("c_mktsegment"), "xsd:string"))
        .unionAll(attr(supplier, "s", "s_suppkey", "name", col("s_name"), "xsd:string"))
        .unionAll(attr(supplier, "s", "s_suppkey", "acctbal", dec2(col("s_acctbal")), "xsd:double"))
        .unionAll(attr(part, "p", "p_partkey", "name", col("p_name"), "xsd:string"))
        .unionAll(attr(part, "p", "p_partkey", "brand", col("p_brand"), "xsd:string"))
        .unionAll(attr(part, "p", "p_partkey", "ptype", col("p_type"), "xsd:string"))
        .unionAll(attr(part, "p", "p_partkey", "psize", col("p_size").cast("string"), "xsd:int"))
        .unionAll(attr(part, "p", "p_partkey", "retailprice", dec2(col("p_retailprice")), "xsd:double"))
        .unionAll(attr(orders, "o", "o_orderkey", "totalprice", dec2(col("o_totalprice")), "xsd:double"))
        .unionAll(attr(orders, "o", "o_orderkey", "orderdate",
          date_format(col("o_orderdate"), "yyyy-MM-dd"), "xsd:date"))
        .unionAll(attr(orders, "o", "o_orderkey", "orderstatus", col("o_orderstatus"), "xsd:string"))
        .unionAll(attr(orders, "o", "o_orderkey", "orderpriority", col("o_orderpriority"), "xsd:string"))
        .unionAll(attr(orders, "o", "o_orderkey", "urgent",
          when(col("o_orderpriority") === "1-URGENT", "true").otherwise("false"), "xsd:boolean"))
        .unionAll(attr(nation, "n", "n_nationkey", "name", col("n_name"), "xsd:string"))
        .unionAll(attr(region, "r", "r_regionkey", "name", col("r_name"), "xsd:string"))

    Kb(nodes, edges, attrs, types, tbox)
  }

  /** nodes(id, k) with the unique numeric key used by oracle-portable
    * LCG sampling orders. Tags: r=1 n=2 c=3 s=4 p=5 o=6. */
  def nodesWithKey(spark: SparkSession, dir: String): DataFrame = {
    def part(name: String, tag: String, tagNum: Long, key: String) =
      table(spark, dir, name).select(
        iri(tag, col(key)).as("id"),
        (lit(tagNum * 10000000L) + col(key).cast("long")).as("k"))
    part("region", "r", 1, "r_regionkey")
      .unionAll(part("nation", "n", 2, "n_nationkey"))
      .unionAll(part("customer", "c", 3, "c_custkey"))
      .unionAll(part("supplier", "s", 4, "s_suppkey"))
      .unionAll(part("part", "p", 5, "p_partkey"))
      .unionAll(part("orders", "o", 6, "o_orderkey"))
  }
}
