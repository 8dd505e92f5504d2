package graft.pipeline

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

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

  /** Spark: polynomial hash of a string column (first n chars). A native
    * codegen'd expression — the zip_with/aggregate formulation is
    * semantically identical but evaluates interpreted lambdas per char,
    * which dominated the MinHash profile. */
  def strHash(colName: String, n: Int = 24): Column =
    GraftSqlBridge.column(PolyHash(GraftSqlBridge.expression(col(colName)), n))

  /** base-31 polynomial over char codes mod P of the first n chars
    * (exactly `aggregate(zip_with(split(s,''), pows, ascii*pow), sum)`). */
  def polyHash(s: UTF8String, n: Int): Long = {
    if (s == null) return 0L
    val str = s.toString
    val len = math.min(str.length, n)
    var sum = 0L
    var i = 0
    while (i < len) { sum += str.charAt(i).toLong * pow31(i); i += 1 }
    val m = sum % P
    if (m < 0) m + P else m
  }

  /** Spark: word-bigram array ("w1~w2") from a token-array column. A
    * native codegen'd expression (r18): the previous
    * transform/lambdafunction HOF is CodegenFallback — one interpreted
    * lambda + two element_at per bigram dominated the p03 signature
    * pass. Same strings; for <2 tokens this returns an EMPTY array,
    * which is the oracle's generate_series(1, len-1) shape (the HOF
    * threw on element_at index 0 — unreachable: every corpus doc has
    * >= 10 tokens, asserted in TextHashSpec). */
  def bigrams(wsCol: String): Column =
    GraftSqlBridge.column(Bigrams(GraftSqlBridge.expression(col(wsCol))))

  private val Tilde = UTF8String.fromString("~")

  /** bigram array of a token array; empty below 2 tokens. */
  def bigramsOf(arr: org.apache.spark.sql.catalyst.util.ArrayData)
      : org.apache.spark.sql.catalyst.util.ArrayData = {
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    val n = arr.numElements()
    if (n < 2) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](n - 1)
    var i = 0
    while (i < n - 1) {
      val a = arr.getUTF8String(i)
      val b = arr.getUTF8String(i + 1)
      // SQL concat semantics: null element -> null bigram (split() never
      // yields nulls, so this is defensive parity with the old HOF)
      out(i) = if (a == null || b == null) null else UTF8String.concat(a, Tilde, b)
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Spark: sep-joined word windows of a token-array column — the one
    * array shape behind the n-gram / chunking operators (r18, guide §4):
    * the `transform(sequence(...), i -> concat_ws(sep, slice(ws, ...)))`
    * HOFs these replace are CodegenFallback (one interpreted lambda +
    * slice/concat per window). `partial=false` yields the overlapping
    * n-gram shape (`max(0, n - width + 1)` windows, stride 1 in all
    * callers); `partial=true` the chunking shape (`ceil(n / stride)`
    * windows, last one short). Join semantics are concat_ws/array_join
    * (null elements skipped — unreachable: split() never yields null). */
  def wordWindows(wsCol: String, width: Int, stride: Int, sep: String,
      partial: Boolean): Column =
    GraftSqlBridge.column(WordWindows(
      GraftSqlBridge.expression(col(wsCol)), width, stride, sep, partial))

  /** windows of a token array (see [[wordWindows]]). */
  def wordWindowsOf(arr: org.apache.spark.sql.catalyst.util.ArrayData,
      width: Int, stride: Int, sep: UTF8String, partial: Boolean)
      : org.apache.spark.sql.catalyst.util.ArrayData = {
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    val n = arr.numElements()
    val cnt =
      if (partial) { if (n == 0) 0 else (n - 1) / stride + 1 }
      else math.max(0, n - width + 1)
    val out = new Array[Any](cnt)
    var i = 0
    while (i < cnt) {
      val start = i * stride
      val end = math.min(start + width, n)
      val parts = new Array[UTF8String](end - start)
      var j = start
      while (j < end) { parts(j - start) = arr.getUTF8String(j); j += 1 }
      // UTF8String.concatWs skips nulls — exactly concat_ws/array_join
      out(i) = UTF8String.concatWs(sep, parts: _*)
      i += 1
    }
    new GenericArrayData(out)
  }

  // ---- r19: doc-local MinHash signature + 128-bit digest sets --------
  //
  // p03's signature pass is DOC-LOCAL (each doc's mins and bigram set
  // depend only on that doc's tokens), so the explode → groupBy(doc_id)
  // aggregation it used to run — ObjectHashAggregate + Exchange +
  // ObjectHashAggregate in the plan, one hash-map update per bigram
  // OCCURRENCE — is structurally unnecessary (guide §2.4: remove
  // shuffles outright). These expressions compute the same values in one
  // codegen projection per document row, with zero shuffle.
  //
  // The verify-side set is a 128-bit DIGEST set (r18 verdict item 1):
  // two independently-constructed 64-bit channels per distinct bigram,
  //   x = XXH64(bytes(b), seed1)      y = XXH64(reverse(bytes(b)), seed2)
  // flattened into a sorted array<bigint> of (x, y) pairs. Exactness:
  // the declared output is identical to the bigram-STRING-set
  // formulation iff the (x, y) digest is injective on the corpus bigram
  // domain. That injectivity is asserted on every real test corpus
  // (MinHashDigestSpec), and a collision at any scale needs the SAME two
  // bigrams to collide in BOTH channels at once: byte-reversal on
  // channel 2 breaks any structural/seed-independent XXH64 collision,
  // so the probability is the n²/2¹²⁹-class bound the repo already
  // accepts for md5 digests in p29/p32 (~2⁻⁴⁹ at 10¹² distinct
  // bigrams). md5 itself was measured and rejected here: ~2x the digest
  // cost per pass (MessageDigest alloc per call) for the same bound.

  private val DigestSeed1 = 42L
  private val DigestSeed2 = 0x9E3779B97F4A7C15L

  /** Spark: the 8 MinHash minima over a bigram-array column, as
    * array<long> (element k = min over bigrams of (a_k*polyHash(b)+b_k)
    * mod P; null when the array has no non-null bigram — exactly the
    * value `min(pmod(h*a_k+b_k, P))` took per group in the old
    * aggregation, which skipped null h). */
  def minhashSig(bgCol: Column): Column =
    GraftSqlBridge.column(MinHashSig(GraftSqlBridge.expression(bgCol)))

  def minhashSigOf(arr: org.apache.spark.sql.catalyst.util.ArrayData)
      : org.apache.spark.sql.catalyst.util.ArrayData = {
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    val n = arr.numElements()
    val mins = Array.fill(NumHashes)(-1L) // all hash values are >= 0
    var i = 0
    while (i < n) {
      val b = arr.getUTF8String(i)
      if (b != null) {
        val h = polyHash(b, 24)
        var k = 0
        while (k < NumHashes) {
          // h < P < 2^30 and a_k <= 1049, so h*a_k + b_k < 2^41: no
          // overflow, and the operands are non-negative so % == pmod
          val v = (h * minhashA(k) + minhashB(k)) % P
          if (mins(k) < 0 || v < mins(k)) mins(k) = v
          k += 1
        }
      }
      i += 1
    }
    val out = new Array[Any](NumHashes)
    var k = 0
    while (k < NumHashes) {
      out(k) = if (mins(k) < 0) null else java.lang.Long.valueOf(mins(k))
      k += 1
    }
    new GenericArrayData(out)
  }

  /** Spark: sorted distinct 128-bit digest set of a bigram-array column,
    * flattened as array<bigint> [x0,y0,x1,y1,...] with (x,y) pairs in
    * ascending lexicographic order. Null bigrams contribute nothing
    * (collect_set skipped them). size(result)/2 = |distinct bigram set|
    * under the injectivity argument above. */
  def digestPairs(bgCol: Column): Column =
    GraftSqlBridge.column(DigestPairs(GraftSqlBridge.expression(bgCol)))

  def digestPairsOf(arr: org.apache.spark.sql.catalyst.util.ArrayData)
      : org.apache.spark.sql.catalyst.util.ArrayData = {
    import org.apache.spark.sql.catalyst.expressions.XXH64
    import org.apache.spark.unsafe.Platform
    val n = arr.numElements()
    val pairs = new Array[Long](2 * n)
    var m = 0
    var i = 0
    while (i < n) {
      val b = arr.getUTF8String(i)
      if (b != null) {
        pairs(2 * m) = XXH64.hashUTF8String(b, DigestSeed1)
        val bytes = b.getBytes
        var lo = 0; var hi = bytes.length - 1
        while (lo < hi) {
          val t = bytes(lo); bytes(lo) = bytes(hi); bytes(hi) = t
          lo += 1; hi -= 1
        }
        pairs(2 * m + 1) = XXH64.hashUnsafeBytes(
          bytes, Platform.BYTE_ARRAY_OFFSET, bytes.length, DigestSeed2)
        m += 1
      }
      i += 1
    }
    // sort pairs lexicographically, drop adjacent duplicates
    val idx = new Array[Integer](m)
    var j = 0
    while (j < m) { idx(j) = j; j += 1 }
    java.util.Arrays.sort(idx, new java.util.Comparator[Integer] {
      def compare(a: Integer, b: Integer): Int = {
        val c = java.lang.Long.compare(pairs(2 * a), pairs(2 * b))
        if (c != 0) c
        else java.lang.Long.compare(pairs(2 * a + 1), pairs(2 * b + 1))
      }
    })
    val out = new Array[Long](2 * m)
    var d = 0
    j = 0
    while (j < m) {
      val x = pairs(2 * idx(j)); val y = pairs(2 * idx(j) + 1)
      if (d == 0 || out(2 * d - 2) != x || out(2 * d - 1) != y) {
        out(2 * d) = x; out(2 * d + 1) = y; d += 1
      }
      j += 1
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
      .fromPrimitiveArray(java.util.Arrays.copyOf(out, 2 * d))
  }

  /** Spark: |A ∩ B| of two digest sets in [[digestPairs]] layout — a
    * linear primitive merge over the sorted pair arrays, replacing
    * `size(array_intersect(...))` (whose generic path was measured at
    * 5-10x the whole-query budget on binary/struct elements). */
  def digestIntersectCount(a: Column, b: Column): Column =
    GraftSqlBridge.column(DigestIntersectCount(
      GraftSqlBridge.expression(a), GraftSqlBridge.expression(b)))

  def digestIntersectCountOf(
      a: org.apache.spark.sql.catalyst.util.ArrayData,
      b: org.apache.spark.sql.catalyst.util.ArrayData): Int = {
    val na = a.numElements(); val nb = b.numElements()
    var i = 0; var j = 0; var c = 0
    while (i < na && j < nb) {
      val ax = a.getLong(i); val bx = b.getLong(j)
      if (ax < bx) i += 2
      else if (bx < ax) j += 2
      else {
        val ay = a.getLong(i + 1); val by = b.getLong(j + 1)
        if (ay < by) i += 2
        else if (by < ay) j += 2
        else { c += 1; i += 2; j += 2 }
      }
    }
    c
  }

  // ---- r19: more doc-local signatures (p04 / p11 / p20) --------------
  // Same §2.4 move as the MinHash pass above: these per-document values
  // ran as explode → groupBy(doc_id) aggregations (one Exchange + wide
  // agg buffers each) although every input token arrives in one row.

  /** Spark: the 24-bit SimHash of a token-array column — exactly p04's
    * old `sum(±1 per bit of polyHash(w))` aggregation folded into one
    * walk: a null token contributes -1 to every bit sum (the old
    * when(...).otherwise(-1) took the otherwise branch on null h). */
  def simHashSig(wsCol: Column): Column =
    GraftSqlBridge.column(SimHashSig(GraftSqlBridge.expression(wsCol)))

  def simHashOf(arr: org.apache.spark.sql.catalyst.util.ArrayData): Long = {
    val n = arr.numElements()
    val cnt = new Array[Long](24)
    var i = 0
    while (i < n) {
      val w = arr.getUTF8String(i)
      if (w == null) {
        var j = 0
        while (j < 24) { cnt(j) -= 1; j += 1 }
      } else {
        val h = polyHash(w, 24)
        var j = 0
        while (j < 24) {
          cnt(j) += (if (((h >> j) & 1L) == 1L) 1L else -1L)
          j += 1
        }
      }
      i += 1
    }
    var s = 0L
    var j = 0
    while (j < 24) { if (cnt(j) > 0) s |= (1L << j); j += 1 }
    s
  }

  /** Spark: p11's positional fingerprint of a token-array column —
    * sum over word index i of (polyHash(w_i) % 2^20) * 31^i mod P,
    * exactly the old posexplode → groupBy sum for every reachable input:
    * null tokens vanish (null h made the term null, which sum() skips)
    * and a doc with no surviving term gets a null fp. Degenerate-input
    * contract change (documented, not reachable): a doc with more than
    * MaxLen (128) tokens now fingerprints its first MaxLen tokens where
    * the old element_at(pows, pos+1) THREW under ANSI mode — the corpus
    * bound (<= 100 tokens) is asserted in DocLocalSigSpec. */
  def polyPosFingerprint(wsCol: Column): Column =
    GraftSqlBridge.column(PolyPosFingerprint(GraftSqlBridge.expression(wsCol)))

  def polyPosFingerprintOf(
      arr: org.apache.spark.sql.catalyst.util.ArrayData): Any = {
    val n = math.min(arr.numElements(), MaxLen)
    var sum = 0L
    var any = false
    var i = 0
    while (i < n) {
      val w = arr.getUTF8String(i)
      if (w != null) {
        // h < P, h % 2^20 < 2^20, pow31 < P < 2^30: each term < 2^50 and
        // docs are bounded by MaxLen terms, so the sum never overflows
        sum += (polyHash(w, 24) % 1048576L) * pow31(i)
        any = true
      }
      i += 1
    }
    if (!any) null else java.lang.Long.valueOf(sum % P)
  }

  /** Spark: the count of the most frequent token — p20's old
    * explode → groupBy(doc_id, w) → max(count). A null token forms its
    * own group there, so null occurrences count as one key here too. */
  def topTokenCount(wsCol: Column): Column =
    GraftSqlBridge.column(TopTokenCount(GraftSqlBridge.expression(wsCol)))

  def topTokenCountOf(arr: org.apache.spark.sql.catalyst.util.ArrayData): Long = {
    val n = arr.numElements()
    val m = new java.util.HashMap[UTF8String, Long](n * 2)
    var nullCnt = 0L
    var i = 0
    while (i < n) {
      val w = arr.getUTF8String(i)
      if (w == null) nullCnt += 1
      else {
        val c = m.get(w)
        m.put(w, if (c == 0L) 1L else c + 1L)
      }
      i += 1
    }
    var mx = nullCnt
    val it = m.values().iterator()
    while (it.hasNext) { val v = it.next(); if (v > mx) mx = v }
    mx
  }

  /** Spark: |distinct elements| of a string-array column — p20's old
    * explode → distinct → count per doc. A null element is one distinct
    * value (the old (doc_id, null) row). */
  def arrayDistinctCount(wsCol: Column): Column =
    GraftSqlBridge.column(ArrayDistinctCount(GraftSqlBridge.expression(wsCol)))

  def arrayDistinctCountOf(
      arr: org.apache.spark.sql.catalyst.util.ArrayData): Long = {
    val n = arr.numElements()
    val set = new java.util.HashSet[UTF8String](n * 2)
    var hasNull = false
    var i = 0
    while (i < n) {
      val w = arr.getUTF8String(i)
      if (w == null) hasNull = true else { set.add(w); () }
      i += 1
    }
    set.size.toLong + (if (hasNull) 1L else 0L)
  }

  /** Spark: count of tokens that are members of a fixed string set —
    * replaces the CodegenFallback `size(filter(ws, w -> w IN (...)))`
    * in the langid/quality scorers (r18, guide §4). Null elements never
    * count (the HOF's IN predicate is null for them). */
  def countInSet(wsCol: Column, words: Seq[String]): Column =
    GraftSqlBridge.column(CountInSet(GraftSqlBridge.expression(wsCol), words))

  def countInSetOf(arr: org.apache.spark.sql.catalyst.util.ArrayData,
      set: java.util.HashSet[UTF8String]): Int = {
    val n = arr.numElements()
    var c = 0
    var i = 0
    while (i < n) {
      val w = arr.getUTF8String(i)
      if (w != null && set.contains(w)) c += 1
      i += 1
    }
    c
  }

  /** Spark: count of tokens with at least `minLen` chars — replaces the
    * CodegenFallback `size(filter(ws, w -> length(w) >= n))` (r18). */
  def countMinLen(wsCol: Column, minLen: Int): Column =
    GraftSqlBridge.column(CountMinLen(GraftSqlBridge.expression(wsCol), minLen))

  def countMinLenOf(arr: org.apache.spark.sql.catalyst.util.ArrayData,
      minLen: Int): Int = {
    val n = arr.numElements()
    var c = 0
    var i = 0
    while (i < n) {
      val w = arr.getUTF8String(i)
      if (w != null && w.numChars() >= minLen) c += 1
      i += 1
    }
    c
  }
}

/** Codegen'd base-31 polynomial string hash (see TextHash.polyHash). */
final case class PolyHash(child: Expression, n: Int)
  extends UnaryExpression {
  import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
  import org.apache.spark.sql.types.StringType

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_poly_hash"

  // r19 (ADVICE): wrong child types fail at analysis, not with a
  // ClassCastException mid-task (same pattern as BinaryByteSum)
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs STRING input, got $other")
  }

  override protected def nullSafeEval(input: Any): Any =
    TextHash.polyHash(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.pipeline.TextHash.polyHash($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): PolyHash =
    copy(child = newChild)
}

/** Codegen'd word-bigram array (see TextHash.bigramsOf). */
final case class Bigrams(child: Expression)
  extends UnaryExpression {
  import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
  import org.apache.spark.sql.types.{ArrayType, StringType}

  override def dataType: DataType = ArrayType(StringType, containsNull = true)
  override def prettyName: String = "graft_bigrams"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs ARRAY<STRING> input, got $other")
  }

  override protected def nullSafeEval(input: Any): Any =
    TextHash.bigramsOf(
      input.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.pipeline.TextHash.bigramsOf($c)")

  override protected def withNewChildInternal(newChild: Expression): Bigrams =
    copy(child = newChild)
}

/** Codegen'd sep-joined token windows (see TextHash.wordWindowsOf). */
final case class WordWindows(child: Expression, width: Int, stride: Int,
    sep: String, partial: Boolean)
  extends UnaryExpression {
  import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
  import org.apache.spark.sql.types.{ArrayType, StringType}

  override def dataType: DataType = ArrayType(StringType, containsNull = true)
  override def prettyName: String = "graft_word_windows"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs ARRAY<STRING> input, got $other")
  }

  @transient private lazy val sepU8: UTF8String = UTF8String.fromString(sep)

  override protected def nullSafeEval(input: Any): Any =
    TextHash.wordWindowsOf(
      input.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData],
      width, stride, sepU8, partial)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val sepRef = ctx.addReferenceObj("sep", sepU8,
      classOf[UTF8String].getName)
    defineCodeGen(ctx, ev, c =>
      s"graft.pipeline.TextHash.wordWindowsOf($c, $width, $stride, $sepRef, $partial)")
  }

  override protected def withNewChildInternal(newChild: Expression): WordWindows =
    copy(child = newChild)
}

/** Codegen'd fixed-set membership count (see TextHash.countInSetOf). */
final case class CountInSet(child: Expression, words: Seq[String])
  extends UnaryExpression {
  import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
  import org.apache.spark.sql.types.{ArrayType, IntegerType, StringType}

  override def dataType: DataType = IntegerType
  override def prettyName: String = "graft_count_in_set"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs ARRAY<STRING> input, got $other")
  }

  @transient private lazy val set: java.util.HashSet[UTF8String] = {
    val s = new java.util.HashSet[UTF8String](words.size * 2)
    words.foreach(w => s.add(UTF8String.fromString(w)))
    s
  }

  override protected def nullSafeEval(input: Any): Any =
    TextHash.countInSetOf(
      input.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData], set)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val setRef = ctx.addReferenceObj("set", set, "java.util.HashSet")
    defineCodeGen(ctx, ev, c =>
      s"graft.pipeline.TextHash.countInSetOf($c, $setRef)")
  }

  override protected def withNewChildInternal(newChild: Expression): CountInSet =
    copy(child = newChild)
}

/** Codegen'd doc-local MinHash signature (see TextHash.minhashSigOf). */
final case class MinHashSig(child: Expression)
  extends UnaryExpression {
  import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
  import org.apache.spark.sql.types.{ArrayType, LongType, StringType}

  override def dataType: DataType = ArrayType(LongType, containsNull = true)
  override def prettyName: String = "graft_minhash_sig"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs ARRAY<STRING> input, got $other")
  }

  override protected def nullSafeEval(input: Any): Any =
    TextHash.minhashSigOf(
      input.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.pipeline.TextHash.minhashSigOf($c)")

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}

/** Codegen'd sorted distinct digest-pair set (see TextHash.digestPairsOf). */
final case class DigestPairs(child: Expression)
  extends UnaryExpression {
  import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
  import org.apache.spark.sql.types.{ArrayType, LongType, StringType}

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_digest_pairs"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs ARRAY<STRING> input, got $other")
  }

  override protected def nullSafeEval(input: Any): Any =
    TextHash.digestPairsOf(
      input.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.pipeline.TextHash.digestPairsOf($c)")

  override protected def withNewChildInternal(newChild: Expression): DigestPairs =
    copy(child = newChild)
}

/** Codegen'd sorted-merge intersection count over two digest-pair sets
  * (see TextHash.digestIntersectCountOf). */
final case class DigestIntersectCount(left: Expression, right: Expression)
  extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
  import org.apache.spark.sql.types.{ArrayType, IntegerType, LongType}

  override def dataType: DataType = IntegerType
  override def prettyName: String = "graft_digest_intersect"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName needs two ARRAY<BIGINT> inputs, got $other")
    }

  override protected def nullSafeEval(a: Any, b: Any): Any =
    TextHash.digestIntersectCountOf(
      a.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData],
      b.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.pipeline.TextHash.digestIntersectCountOf($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DigestIntersectCount =
    copy(left = newLeft, right = newRight)
}

/** Codegen'd 24-bit SimHash of a token array (see TextHash.simHashOf). */
final case class SimHashSig(child: Expression)
  extends UnaryExpression {
  import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
  import org.apache.spark.sql.types.{ArrayType, StringType}

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_simhash_sig"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs ARRAY<STRING> input, got $other")
  }

  override protected def nullSafeEval(input: Any): Any =
    TextHash.simHashOf(
      input.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.pipeline.TextHash.simHashOf($c)")

  override protected def withNewChildInternal(newChild: Expression): SimHashSig =
    copy(child = newChild)
}

/** Codegen'd positional fingerprint (see TextHash.polyPosFingerprintOf). */
final case class PolyPosFingerprint(child: Expression)
  extends UnaryExpression {
  import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
  import org.apache.spark.sql.types.{ArrayType, StringType}

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_polypos_fingerprint"
  // a doc whose every term is skipped (all-null tokens) has a null fp
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs ARRAY<STRING> input, got $other")
  }

  override protected def nullSafeEval(input: Any): Any =
    TextHash.polyPosFingerprintOf(
      input.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val v = ctx.freshName("fp")
      s"""
         |Object $v = graft.pipeline.TextHash.polyPosFingerprintOf($c);
         |if ($v == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = ((java.lang.Long) $v).longValue(); }
       """.stripMargin
    })

  override protected def withNewChildInternal(
      newChild: Expression): PolyPosFingerprint =
    copy(child = newChild)
}

/** Codegen'd max token frequency (see TextHash.topTokenCountOf). */
final case class TopTokenCount(child: Expression)
  extends UnaryExpression {
  import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
  import org.apache.spark.sql.types.{ArrayType, StringType}

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_top_token_count"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs ARRAY<STRING> input, got $other")
  }

  override protected def nullSafeEval(input: Any): Any =
    TextHash.topTokenCountOf(
      input.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.pipeline.TextHash.topTokenCountOf($c)")

  override protected def withNewChildInternal(newChild: Expression): TopTokenCount =
    copy(child = newChild)
}

/** Codegen'd distinct-element count (see TextHash.arrayDistinctCountOf). */
final case class ArrayDistinctCount(child: Expression)
  extends UnaryExpression {
  import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
  import org.apache.spark.sql.types.{ArrayType, StringType}

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_array_distinct_count"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs ARRAY<STRING> input, got $other")
  }

  override protected def nullSafeEval(input: Any): Any =
    TextHash.arrayDistinctCountOf(
      input.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.pipeline.TextHash.arrayDistinctCountOf($c)")

  override protected def withNewChildInternal(
      newChild: Expression): ArrayDistinctCount =
    copy(child = newChild)
}

/** Codegen'd min-length token count (see TextHash.countMinLenOf). */
final case class CountMinLen(child: Expression, minLen: Int)
  extends UnaryExpression {
  import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
  import org.apache.spark.sql.types.{ArrayType, IntegerType, StringType}

  override def dataType: DataType = IntegerType
  override def prettyName: String = "graft_count_min_len"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs ARRAY<STRING> input, got $other")
  }

  override protected def nullSafeEval(input: Any): Any =
    TextHash.countMinLenOf(
      input.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData], minLen)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.pipeline.TextHash.countMinLenOf($c, $minLen)")

  override protected def withNewChildInternal(newChild: Expression): CountMinLen =
    copy(child = newChild)
}
