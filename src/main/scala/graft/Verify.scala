package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    // r19 (r18 verdict item 3): built from the SAME shared builder as
    // Bench, so the oracle validates the exact join-strategy plan shapes
    // (SHJ-preferring, size-guarded) the bench times — previously Verify
    // lacked those confs and validated SMJ-shaped plans instead.
    val spark = Sessions.builder(cpus)
      .config("spark.sql.extensions", classOf[graft.spark.GraftExtensions].getName)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // a failed query must be LOUD: r7's gate-setup crash silently omitted
    // 53 outputs and the driver's JSON couldn't tell "failed" from "not
    // implemented". Every failure now leaves a _FAILED marker in the
    // query's out dir plus a summary, and the run self-checks coverage.
    val failures = scala.collection.mutable.LinkedHashMap[String, String]()
    SparkEntry.queries.foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        val msg = s"${e.getClass.getSimpleName}: ${e.getMessage}"
        failures(name) = msg
        System.err.println(s"[verify] $name FAILED: $msg")
        e.printStackTrace()
        val d = new java.io.File(s"$outDir/$name"); d.mkdirs()
        Files.writeString(Paths.get(s"$outDir/$name/_FAILED"), msg)
      }
    }
    val total = SparkEntry.queries.size
    println(s"[verify] ${total - failures.size}/$total queries wrote output; " +
      s"${failures.size} failed${if (failures.nonEmpty) ": " + failures.keys.mkString(", ") else ""}")
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    if (failures.nonEmpty) {
      val ej = failures.map { case (k, v) => s"${q(k)}: ${q(v)}" }
        .mkString("{", ",", "}")
      Files.writeString(Paths.get(s"$outDir/errors.json"), ej)
    }
    spark.stop()
    // deliberately exit 0 even with failures: the driver compares whatever
    // outputs exist, and a nonzero rc could make it skip the compare and
    // zero the WHOLE round over one flaky query (the r6 bench rc=1
    // precedent). Failures are visible via _FAILED markers + errors.json.
  }
}
