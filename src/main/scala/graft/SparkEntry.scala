package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` maps every implemented operator (SURVEY.md §2 + the
  * training-data pipeline operators) to a Spark implementation;
  * `oracleSql` holds the DuckDB-equivalent SQL for the driver's
  * correctness gate.
  */
object SparkEntry {

  /** All gate queries, registered by the operator areas. */
  def bank: Vector[Q] =
    Relational.all ++ graft.pipeline.Pipeline.all ++ Engine.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.all.find(_.name == "q05_region_revenue").get
      .run(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    bank.map(q => q.name -> q.run).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    bank.flatMap(q => q.oracle.map(o => q.name -> o.stripMargin.trim)).toMap
}
