package graft.core.meta

import graft.core.expr.ColStats
import graft.core.types._

/** Column-metrics collection policy (reference
  * core/src/main/java/org/apache/iceberg/MetricsModes.java and
  * MetricsConfig.java). At 100 TB a wide table's full string bounds
  * dominate manifest size — every scan planner reads them — so the
  * default trims variable-length bounds to a 16-unit prefix:
  *
  *   - `none`         drop all metrics for the column
  *   - `counts`       value/null/NaN counts only, no bounds
  *   - `truncate(N)`  counts + bounds; string/binary bounds cut to N
  *                    units (lower rounded down, upper rounded UP so it
  *                    stays a valid inclusive upper bound)
  *   - `full`         untrimmed
  *
  * Configured by table properties:
  *   - `write.metadata.metrics.default` (default `truncate(16)`)
  *   - `write.metadata.metrics.column.<dotted-name>` per-column override
  *   - `write.metadata.metrics.max-inferred-column-defaults` (default
  *     100): only the first N leaf columns in schema order inherit the
  *     table default; later columns collect nothing unless explicitly
  *     configured (or sort-order sources, which keep `truncate(16)` so
  *     clustering stays prunable).
  */
sealed trait MetricsMode
object MetricsMode {
  case object NoMetrics extends MetricsMode
  case object Counts extends MetricsMode
  final case class Truncate(length: Int) extends MetricsMode
  case object Full extends MetricsMode

  private val TruncateRe = """truncate\(\s*(\d+)\s*\)""".r

  def parse(s: String): MetricsMode = s.trim.toLowerCase match {
    case "none"           => NoMetrics
    case "counts"         => Counts
    case "full"           => Full
    case TruncateRe(n) if n.toIntOption.exists(_ > 0) => Truncate(n.toInt)
    case other =>
      throw new IllegalArgumentException(s"invalid metrics mode: $other")
  }

  /** Commit-path parsing never throws: a malformed value that slipped
    * past DDL validation (hand-edited metadata, older writer) falls back
    * to the reference default instead of bricking every write. */
  def parseLenient(s: String): MetricsMode =
    try parse(s) catch { case _: IllegalArgumentException => Truncate(16) }
}

final class MetricsConfig(modeById: Map[Int, MetricsMode], schema: GSchema) {
  import MetricsMode._

  def mode(fieldId: Int): MetricsMode = modeById.getOrElse(fieldId, Full)

  /** Trim a file's column stats to the configured policy. Never widens a
    * bound past validity: truncated lowers are prefixes (≤ every value),
    * truncated uppers are verified ≥ the untrimmed upper under the
    * column comparator before being kept, else dropped. */
  def trim(stats: Map[Int, ColStats]): Map[Int, ColStats] =
    stats.flatMap { case (id, st) =>
      mode(id) match {
        case Full      => Some(id -> st)
        // column_sizes survive EVERY mode (reference ParquetUtil
        // .footerMetrics accumulates sizes before the mode check):
        // `none` strips counts and bounds, never the on-disk bytes
        case NoMetrics =>
          st.sizeBytes.map(sz => id -> ColStats(sizeBytes = Some(sz)))
        case Counts    => Some(id -> st.copy(lower = None, upper = None))
        case Truncate(n) =>
          val t = schema.byId.get(id).map(_.tpe)
          t match {
            case Some(GString) => Some(id -> st.copy(
              lower = st.lower.map(v => truncMinString(v.asInstanceOf[String], n)),
              upper = st.upper.flatMap(v => truncMaxString(v.asInstanceOf[String], n))))
            case Some(GBinary) => Some(id -> st.copy(
              lower = st.lower.map(v => truncMinBinary(v.asInstanceOf[Array[Byte]], n)),
              upper = st.upper.flatMap(v => truncMaxBinary(v.asInstanceOf[Array[Byte]], n))))
            // fixed-width primitives (and geo bbox corner encodings,
            // which must never be byte-truncated) keep full bounds
            case _ => Some(id -> st)
          }
      }
    }

  /** true when every column keeps full metrics — the common case for
    * narrow schemas under `full`; lets trimFile skip map rebuilding */
  private val allFull: Boolean = modeById.valuesIterator.forall(_ == Full)

  def trimFile(f: DataFile): DataFile =
    if (allFull || f.content != FileContent.Data || f.columnStats.isEmpty) f
    else f.copy(columnStats = trim(f.columnStats))

  // ---------------------------------------------------------------- trunc
  /** First n code points — a prefix, so ≤ the original in UTF-16 order. */
  def truncMinString(s: String, n: Int): String =
    if (s.codePointCount(0, s.length) <= n) s
    else s.substring(0, s.offsetByCodePoints(0, n))

  /** First n code points with the last incrementable code point bumped —
    * an upper bound ≥ the original, or None when no prefix increments
    * cleanly (verified against String.compareTo, the comparator pruning
    * uses, so UTF-16 surrogate-order quirks can never produce an
    * invalid bound). */
  def truncMaxString(s: String, n: Int): Option[String] = {
    if (s.codePointCount(0, s.length) <= n) return Some(s)
    val cps = s.codePoints().limit(n.toLong).toArray
    var i = cps.length - 1
    while (i >= 0) {
      var next = cps(i) + 1
      // skip the surrogate gap: lone surrogates aren't valid code points
      if (next >= 0xD800 && next <= 0xDFFF) next = 0xE000
      if (next <= Character.MAX_CODE_POINT) {
        val candidate = new String(cps.take(i) :+ next, 0, i + 1)
        if (candidate.compareTo(s) >= 0) return Some(candidate)
      }
      i -= 1
    }
    None
  }

  def truncMinBinary(b: Array[Byte], n: Int): Array[Byte] =
    if (b.length <= n) b else java.util.Arrays.copyOf(b, n)

  /** First n bytes with the last non-0xFF byte incremented (unsigned
    * order) — or None when the prefix is all 0xFF. */
  def truncMaxBinary(b: Array[Byte], n: Int): Option[Array[Byte]] = {
    if (b.length <= n) return Some(b)
    var i = n - 1
    while (i >= 0 && (b(i) & 0xff) == 0xff) i -= 1
    if (i < 0) None
    else {
      val out = java.util.Arrays.copyOf(b, i + 1)
      out(i) = (out(i) + 1).toByte
      Some(out)
    }
  }
}

object MetricsConfig {
  import MetricsMode._

  val DefaultModeKey = "write.metadata.metrics.default"
  val ColumnModePrefix = "write.metadata.metrics.column."
  val MaxInferredKey = "write.metadata.metrics.max-inferred-column-defaults"
  val DefaultMode: MetricsMode = Truncate(16)
  val DefaultMaxInferred = 100

  def forTable(meta: TableMetadata): MetricsConfig = {
    val order = meta.sortOrders.find(_.orderId == meta.defaultSortOrderId)
      .getOrElse(SortOrder.Unsorted)
    forSchema(meta.schema, meta.properties, order.fields.map(_.sourceId).toSet)
  }

  def forSchema(schema: GSchema, props: Map[String, String],
      sortedIds: Set[Int] = Set.empty): MetricsConfig = {
    val default = props.get(DefaultModeKey).map(MetricsMode.parseLenient)
      .getOrElse(DefaultMode)
    val maxInferred = props.get(MaxInferredKey).flatMap(_.toIntOption)
      .getOrElse(DefaultMaxInferred)
    // unknown column names skip silently HERE (the schema may have
    // evolved past an old override); DDL-time validation in alterTable
    // rejects typos when the property is set
    val explicit: Map[Int, MetricsMode] = props.collect {
      case (k, v) if k.startsWith(ColumnModePrefix) =>
        schema.byName.get(k.stripPrefix(ColumnModePrefix))
          .map(f => f.id -> MetricsMode.parseLenient(v))
    }.flatten.toMap
    // leaf ids in schema pre-order, for the inferred-defaults cutoff
    def leaves(fs: Seq[GField]): Seq[Int] = fs.flatMap { f =>
      f.tpe match {
        case GStruct(nested) => leaves(nested)
        case _               => Seq(f.id)
      }
    }
    val ordered = leaves(schema.fields)
    val inferred = ordered.zipWithIndex.map { case (id, pos) =>
      val m =
        if (explicit.contains(id)) explicit(id)
        else if (pos >= maxInferred)
          // beyond the inferred cutoff nothing is collected — except
          // sort-order sources, whose bounds drive clustering pruning
          (if (sortedIds.contains(id)) floor(default) else NoMetrics)
        else if (sortedIds.contains(id)) floor(default)
        else default
      id -> m
    }.toMap
    new MetricsConfig(inferred, schema)
  }

  /** Sorted columns keep at least truncate(16) even under a weaker
    * table default (reference MetricsConfig sorted-column handling). */
  private def floor(default: MetricsMode): MetricsMode = default match {
    case NoMetrics | Counts => DefaultMode
    case other              => other
  }
}
