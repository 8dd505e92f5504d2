package graft.core.expr

import graft.core.types._

/** Per-column file statistics (manifest entry metrics, format/spec.md
  * data_file fields: column_sizes, value_counts, null_value_counts,
  * nan_value_counts, lower_bounds, upper_bounds). Bounds are in the
  * internal value representation. `sizeBytes` is the column's on-disk
  * bytes (spec field 117) — kept under EVERY metrics mode like the
  * reference (ParquetUtil.footerMetrics accumulates sizes before the
  * mode check): sizes are what an operator reads to find which column
  * bloats a table, so `none` must not erase them. */
final case class ColStats(
    valueCount: Option[Long] = None,
    nullCount: Option[Long] = None,
    nanCount: Option[Long] = None,
    lower: Option[Any] = None,
    upper: Option[Any] = None,
    sizeBytes: Option[Long] = None)

final case class FileStats(recordCount: Long, cols: Map[Int, ColStats],
    shreds: Map[String, ColStats] = Map.empty) {
  def col(id: Int): ColStats = cols.getOrElse(id, ColStats())
}

/** "Rows might match" pruning over min/max/null/nan stats
  * (reference InclusiveMetricsEvaluator.java:48-172). Never returns a
  * false negative: unknown stats → true. */
object InclusiveMetricsEvaluator {

  def rowsMightMatch(expr: Expr, stats: FileStats): Boolean = eval(expr, stats)

  private def eval(expr: Expr, fs: FileStats): Boolean = expr match {
    case TrueE     => true
    case FalseE    => false
    case And(l, r) => eval(l, fs) && eval(r, fs)
    case Or(l, r)  => eval(l, fs) || eval(r, fs)
    case Not(c)    => eval(Expr.not(c), fs) // push negation to leaves
    case p @ BoundPred(op, f, _, values) =>
      val st = fs.col(f.id)
      val t = f.tpe
      def cmpLower(v: Any): Option[Int] = st.lower.map(l => TypeComparators.compare(t, l, v))
      def cmpUpper(v: Any): Option[Int] = st.upper.map(u => TypeComparators.compare(t, u, v))
      def allNull: Boolean =
        (st.valueCount, st.nullCount) match {
          case (Some(vc), Some(nc)) => vc == nc
          case _                    => false
        }
      op match {
        case Op.IsNull  => !st.nullCount.contains(0L)
        case Op.NotNull => !allNull
        case Op.IsNan   => !st.nanCount.contains(0L)
        case Op.NotNan  =>
          (st.nanCount, st.valueCount) match {
            case (Some(nan), Some(vc)) => nan != vc
            case _                     => true
          }
        case _ if allNull => false
        // geospatial: bounds are bbox corner points, not value min/max —
        // only bbox intersection may consult them (reference
        // GeospatialPredicateEvaluators); everything else might match
        case Op.StIntersects =>
          GeoBounds.boxOf(st.lower, st.upper) match {
            case Some(fileBox) =>
              // same rule as the row sides; sound for pruning because
              // intersection is monotone under box containment
              GeoBox.intersects(fileBox, p.value.asInstanceOf[GeoBox],
                geography = t.isInstanceOf[GGeography])
            case None => true
          }
        case Op.StNotIntersects => true
        case _ if GeoDefaults.isGeo(t) => true
        case Op.Lt   => !cmpLower(p.value).exists(_ >= 0)
        case Op.LtEq => !cmpLower(p.value).exists(_ > 0)
        case Op.Gt   => !cmpUpper(p.value).exists(_ <= 0)
        case Op.GtEq => !cmpUpper(p.value).exists(_ < 0)
        case Op.Eq =>
          !(cmpLower(p.value).exists(_ > 0) || cmpUpper(p.value).exists(_ < 0))
        case Op.NotEq => true
        case Op.In =>
          values.exists { v =>
            !(cmpLower(v).exists(_ > 0) || cmpUpper(v).exists(_ < 0))
          }
        case Op.NotIn => true
        case Op.StartsWith =>
          val prefix = p.value.asInstanceOf[String]
          val lowOk = st.lower.forall { l =>
            val ls = l.asInstanceOf[String]
            val cut = ls.substring(0, math.min(ls.length, prefix.length))
            cut.compareTo(prefix) <= 0
          }
          val upOk = st.upper.forall { u =>
            val us = u.asInstanceOf[String]
            val cut = us.substring(0, math.min(us.length, prefix.length))
            cut.compareTo(prefix) >= 0
          }
          lowOk && upOk
        case Op.NotStartsWith =>
          // cannot match only if every value starts with the prefix:
          // lower == upper == prefix-extended is the only provable case
          val prefix = p.value.asInstanceOf[String]
          val allStart = (st.lower, st.upper) match {
            case (Some(l), Some(u)) =>
              l.asInstanceOf[String].startsWith(prefix) &&
                u.asInstanceOf[String].startsWith(prefix) &&
                // bounds sharing the prefix doesn't prove rows in between do;
                // only a single-value range proves it
                l.asInstanceOf[String] == u.asInstanceOf[String]
            case _ => false
          }
          !allStart || !st.nullCount.contains(0L)
      }
    // file column stats are in ROW space; a transform predicate can't be
    // checked against them — conservative "might match" (partition-level
    // pruning happens via projection instead)
    case _: BoundTransformPred => true
    // shredded-variant predicate: consult the file's shredded stats
    // (write.variant.shred.*); unknown key/bounds → might match
    case p @ ShredPred(op, key, t, values) =>
      fs.shreds.get(key) match {
        case None => true
        case Some(st) =>
          def cmpLower(v: Any): Option[Int] =
            st.lower.map(l => TypeComparators.compare(t, l, v))
          def cmpUpper(v: Any): Option[Int] =
            st.upper.map(u => TypeComparators.compare(t, u, v))
          def allNull: Boolean = (st.valueCount, st.nullCount) match {
            case (Some(vc), Some(nc)) => vc == nc
            case _                    => false
          }
          op match {
            case Op.IsNull  => !st.nullCount.contains(0L)
            case Op.NotNull => !allNull
            case _ if allNull => false
            case Op.Lt   => !cmpLower(p.value).exists(_ >= 0)
            case Op.LtEq => !cmpLower(p.value).exists(_ > 0)
            case Op.Gt   => !cmpUpper(p.value).exists(_ <= 0)
            case Op.GtEq => !cmpUpper(p.value).exists(_ < 0)
            case Op.Eq =>
              !(cmpLower(p.value).exists(_ > 0) || cmpUpper(p.value).exists(_ < 0))
            case Op.In => values.exists(v =>
              !(cmpLower(v).exists(_ > 0) || cmpUpper(v).exists(_ < 0)))
            case _ => true // NotEq/NotIn and anything else: can't exclude
          }
      }
    case _: UnboundPred | _: TransformPred | _: UnboundShredPred =>
      throw new IllegalStateException("unbound predicate; bind() first")
  }
}

/** "All rows must match" proof (reference StrictMetricsEvaluator.java);
  * used by metadata-only deletes and overwrite validation. Conservative:
  * unknown → false. */
object StrictMetricsEvaluator {

  def rowsMustMatch(expr: Expr, stats: FileStats): Boolean = eval(expr, stats)

  private def eval(expr: Expr, fs: FileStats): Boolean = expr match {
    case TrueE     => true
    case FalseE    => false
    case And(l, r) => eval(l, fs) && eval(r, fs)
    case Or(l, r)  => eval(l, fs) || eval(r, fs)
    case Not(c)    => eval(Expr.not(c), fs)
    case p @ BoundPred(op, f, _, values) =>
      val st = fs.col(f.id)
      val t = f.tpe
      def noNulls: Boolean = st.nullCount.contains(0L)
      def allNull: Boolean =
        (st.valueCount, st.nullCount) match {
          case (Some(vc), Some(nc)) => vc == nc && vc > 0
          case _                    => false
        }
      def cmpLower(v: Any): Option[Int] = st.lower.map(l => TypeComparators.compare(t, l, v))
      def cmpUpper(v: Any): Option[Int] = st.upper.map(u => TypeComparators.compare(t, u, v))
      op match {
        case Op.IsNull  => allNull
        case Op.NotNull => noNulls
        // bbox containment can't prove per-row intersection (a file may
        // hold empty geometries whose bbox never intersects) — no strict
        // proof for any geo predicate
        case _ if GeoDefaults.isGeo(t) => false
        case Op.IsNan =>
          (st.nanCount, st.valueCount) match {
            case (Some(nan), Some(vc)) => nan == vc && vc > 0
            case _                     => false
          }
        case Op.NotNan => st.nanCount.contains(0L)
        case Op.Lt   => noNulls && cmpUpper(p.value).exists(_ < 0)
        case Op.LtEq => noNulls && cmpUpper(p.value).exists(_ <= 0)
        case Op.Gt   => noNulls && cmpLower(p.value).exists(_ > 0)
        case Op.GtEq => noNulls && cmpLower(p.value).exists(_ >= 0)
        case Op.Eq =>
          noNulls && (for (l <- cmpLower(p.value); u <- cmpUpper(p.value))
            yield l == 0 && u == 0).getOrElse(false)
        case Op.NotEq =>
          noNulls && (cmpUpper(p.value).exists(_ < 0) || cmpLower(p.value).exists(_ > 0))
        case Op.In =>
          noNulls && ((st.lower, st.upper) match {
            case (Some(l), Some(u)) if TypeComparators.compare(t, l, u) == 0 =>
              values.exists(v => TypeComparators.compare(t, l, v) == 0)
            case _ => false
          })
        case Op.NotIn =>
          noNulls && values.forall { v =>
            cmpUpper(v).exists(_ < 0) || cmpLower(v).exists(_ > 0)
          }
        case Op.StartsWith | Op.NotStartsWith => false // conservative
      }
    case _: BoundTransformPred => false // conservative: no strict proof
    case _: ShredPred => false // shredded stats can't prove all-rows-match
    case _: UnboundPred | _: TransformPred | _: UnboundShredPred =>
      throw new IllegalStateException("unbound predicate; bind() first")
  }
}
