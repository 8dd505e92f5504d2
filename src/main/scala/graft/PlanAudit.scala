package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: dump formatted physical plans of the headline queries to
  * verify pushdown/pruning/broadcast/codegen (not part of the driver
  * contract; run with `sbt "runMain graft.PlanAudit [names...]"`). */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    // same shared confs as Bench/Verify so audited plans match the bench
    val spark = Sessions.builder("8")
      .config("spark.sql.extensions", classOf[graft.spark.GraftExtensions].getName)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val wanted =
      if (args.nonEmpty) args.toSet
      else SparkEntry.bank.filter(_.headline).map(_.name).toSet
    SparkEntry.bank.filter(q => wanted(q.name)).foreach { q =>
      println(s"\n========== ${q.name} ==========")
      try println(q.run(spark, dir).queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode))
      catch { case e: Throwable => println(s"ERROR: ${e.getMessage}") }
    }
    spark.stop()
  }
}
