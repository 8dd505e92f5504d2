package graft.pipeline

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Deterministic, SQL-expressible hashing primitives shared by the
  * dedup/fingerprint operators and their DuckDB oracles.
  *
  * A word/bigram hash is a base-31 polynomial over ASCII codes mod P —
  * computable both as a codegen'd Spark expression (zip_with/aggregate,
  * no UDF) and as plain SQL over a `pows` values table, so MinHash and
  * SimHash results can be verified exactly by the oracle.
  */
object TextHash {
  val P: Long = 1000000007L
  val MaxLen = 128

  /** pow31(i) = 31^i mod P. */
  val pow31: Array[Long] = {
    val a = new Array[Long](MaxLen)
    a(0) = 1L
    for (i <- 1 until MaxLen) a(i) = a(i - 1) * 31 % P
    a
  }

  /** MinHash parameter pairs (a_k, b_k); h_k(x) = (a_k*x + b_k) mod P. */
  val minhashA: Array[Long] = Array(131, 269, 397, 523, 661, 797, 919, 1049)
  val minhashB: Array[Long] = Array(7, 101, 203, 307, 401, 503, 607, 701)
  val NumHashes: Int = minhashA.length
  val NumBands: Int = 4 // bands of 2 rows

  /** SQL fragment: a `pows(i, v)` VALUES table, i 1-based char/word
    * position, v = 31^(i-1) mod P. Shared by all oracle queries. */
  def powsValuesSql(n: Int = 24): String =
    (1 to n).map(i => s"($i,${pow31(i - 1)})").mkString(",")

  /** Spark: polynomial hash of a string column (length <= n). */
  def strHash(colName: String, n: Int = 24): Column = {
    val arr = pow31.take(n).map(_.toString + "L").mkString("array(", ",", ")")
    expr(
      s"""pmod(aggregate(
         |  zip_with(split($colName, ''), $arr, (c, p) -> ascii(c) * p),
         |  0L, (acc, x) -> acc + coalesce(x, 0L)), ${P}L)""".stripMargin)
  }

  /** Spark: word-bigram array ("w1~w2") from a token-array column. */
  def bigrams(wsCol: String): Column =
    expr(s"""transform(sequence(0, size($wsCol) - 2),
         |  i -> concat(element_at($wsCol, i + 1), '~', element_at($wsCol, i + 2)))"""
      .stripMargin)
}
