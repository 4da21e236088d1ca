package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Table persistence abstraction (SURVEY §4.4). The production design
  * targets Iceberg tables (`df.writeTo(...).partitionedBy(...)`), but the
  * sandbox ships no Iceberg runtime jar (BASELINE.md notes the
  * substitution) — so the contract is a trait with a partitioned-parquet
  * implementation now and an Iceberg binding as a drop-in later.
  */
trait TableIO {
  def write(df: DataFrame, table: String, partitionBy: Seq[String] = Nil): Unit
  def read(table: String): DataFrame
  def exists(table: String): Boolean
}

/** Partitioned-parquet implementation with optional salting for skewed
  * write keys (north_rule: "salting for skewed head entities"). */
final class ParquetTableIO(spark: SparkSession, baseDir: String) extends TableIO {
  private def path(table: String) = s"$baseDir/$table"

  /** Filesystem location of `table` — for writers that need a mode/layout
    * this trait's `write` doesn't expose (e.g. incremental appends). */
  def pathOf(table: String): String = path(table)

  override def write(df: DataFrame, table: String, partitionBy: Seq[String] = Nil): Unit = {
    val w = df.write.mode("overwrite")
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w).parquet(path(table))
  }

  /** Salted write: adds `salt = xxhash64(saltKey) % salts` so one hot key
    * cannot produce a single giant task/file downstream. */
  def writeSalted(df: DataFrame, table: String, saltKey: String, salts: Int = 16,
                  partitionBy: Seq[String] = Nil): Unit =
    write(df.withColumn("salt", pmod(xxhash64(col(saltKey)), lit(salts)).cast("int")),
      table, partitionBy)

  /** Bucketed write (co-located joins): `bucketBy` + in-bucket `sortBy` on
    * the join key, registered in the session catalog with the data at this
    * store's path. Downstream equi-joins between tables bucketed the same
    * way run WITHOUT a shuffle (and without a sort) — the key lever for
    * repeated edge⋈edge / frontier-heavy workloads at 100 TB, where the
    * dominant cost would otherwise be re-shuffling the edge table per job.
    * (Iceberg binding: the same layout is `bucket(N, key)` partitioning.) */
  def writeBucketed(df: DataFrame, table: String, bucketKey: String, buckets: Int = 64): Unit =
    df.write.mode("overwrite")
      .bucketBy(buckets, bucketKey).sortBy(bucketKey)
      .option("path", path(table))
      .format("parquet")
      .saveAsTable(catalogName(table))

  /** Read a bucketed table back WITH its bucket spec (a plain parquet read
    * of the same files would lose it). */
  def readBucketed(table: String): DataFrame = spark.table(catalogName(table))

  private def catalogName(table: String) = table.replace("/", "_").replace("-", "_")

  override def read(table: String): DataFrame = spark.read.parquet(path(table))

  override def exists(table: String): Boolean =
    java.nio.file.Files.exists(java.nio.file.Paths.get(path(table)))

  /** Persist a whole Kb as four partitioned tables. */
  def writeKb(kb: Kb, prefix: String): Unit = {
    write(kb.nodes, s"$prefix/nodes")
    writeSalted(kb.edges, s"$prefix/edges", saltKey = "dst", partitionBy = Seq("pred"))
    write(kb.attrs, s"$prefix/attrs", partitionBy = Seq("prop"))
    write(kb.types, s"$prefix/types", partitionBy = Seq("cls"))
  }

  def readKb(prefix: String, tbox: Tbox): Kb = Kb(
    nodes = read(s"$prefix/nodes"),
    edges = read(s"$prefix/edges").select("src", "pred", "dst"),
    attrs = read(s"$prefix/attrs").select("node", "prop", "lexical", "dtype"),
    types = read(s"$prefix/types").select("node", "cls"),
    tbox = tbox)
}
