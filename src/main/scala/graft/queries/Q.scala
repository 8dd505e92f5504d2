package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** One correctness-gate query: a Spark implementation plus (usually) an
  * equivalent DuckDB oracle SQL over the same parquet tables.
  *
  * Oracle-compare discipline: the driver sorts columns by name and hashes
  * values, so (1) every computed column is aliased identically on both
  * sides, (2) floating-point aggregation is avoided — money/ratio doubles
  * are converted to exact fixed-point longs (cents / basis points) before
  * aggregation so sums are bit-identical regardless of engine/partition
  * order, and (3) any final division happens once, in IEEE double, on
  * exact integer inputs (deterministic across engines).
  */
final case class Q(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String],
    headline: Boolean = false)

object Tables {
  def t(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")

  /** 2-dp money double → exact cents as long (via decimal, never via
    * double rounding). */
  def cents(c: Column): Column =
    (c.cast(DecimalType(18, 2)) * 100).cast(LongType)

  /** 2-dp ratio double (e.g. 0.04) → exact basis-point-ish integer (4). */
  def pct(c: Column): Column = cents(c)

  def dec4(c: Column): Column = c.cast(DecimalType(18, 4))

  /** Events table with a normalized `ts_us` epoch-microsecond long column,
    * robust to Spark reading parquet TIMESTAMP(NANOS) either as
    * TimestampType or (with legacy conf) as nanosecond longs. */
  def events(s: SparkSession, dir: String): DataFrame = {
    // set BEFORE the first read: without it Spark's schema inference runs
    // (and fails) a footer-merge job on the NANOS column before the catch
    // below retries — a wasted failed job per session
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df =
      try t(s, dir, "events")
      catch {
        case _: Throwable =>
          s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
          t(s, dir, "events")
      }
    df.schema("ts").dataType match {
      case LongType => // nanos as long
        df.withColumn("ts_us", expr("ts div 1000"))
      case _ =>
        df.withColumn("ts_us", unix_micros(col("ts").cast(TimestampType)))
    }
  }
}
