package graft.core.expr

import graft.core.types._

/** Expression IR mirroring the reference's pushdown contract
  * (api/.../expressions/Expression.java:27-51, Expressions.java):
  * a small predicate algebra over named/bound column references that
  * drives every pruning layer (partition projection, manifest pruning,
  * file-stats pruning, residuals).
  */
sealed trait Operation
object Op {
  case object IsNull extends Operation
  case object NotNull extends Operation
  case object IsNan extends Operation
  case object NotNan extends Operation
  case object Lt extends Operation
  case object LtEq extends Operation
  case object Gt extends Operation
  case object GtEq extends Operation
  case object Eq extends Operation
  case object NotEq extends Operation
  case object In extends Operation
  case object NotIn extends Operation
  case object StartsWith extends Operation
  case object NotStartsWith extends Operation
  /** v3 geospatial bbox intersection (reference api/.../geospatial/
    * GeospatialPredicateEvaluators.java): value's bounding box intersects
    * a query GeoBox. The predicate value is a GeoBox, not a column-typed
    * literal. */
  case object StIntersects extends Operation
  case object StNotIntersects extends Operation

  def negate(op: Operation): Operation = op match {
    case IsNull        => NotNull
    case NotNull       => IsNull
    case IsNan         => NotNan
    case NotNan        => IsNan
    case Lt            => GtEq
    case LtEq          => Gt
    case Gt            => LtEq
    case GtEq          => Lt
    case Eq            => NotEq
    case NotEq         => Eq
    case In            => NotIn
    case NotIn         => In
    case StartsWith    => NotStartsWith
    case NotStartsWith => StartsWith
    case StIntersects    => StNotIntersects
    case StNotIntersects => StIntersects
  }
}

sealed trait Expr {
  def and(other: Expr): Expr = Expr.and(this, other)
  def or(other: Expr): Expr = Expr.or(this, other)
}
case object TrueE extends Expr
case object FalseE extends Expr
final case class And(left: Expr, right: Expr) extends Expr
final case class Or(left: Expr, right: Expr) extends Expr
final case class Not(child: Expr) extends Expr

/** Unbound: references a column by (dotted) name; literals raw. */
final case class UnboundPred(op: Operation, ref: String,
    values: Seq[Any] = Nil) extends Expr

/** Bound to a field; `pos` is the top-level position in the row/tuple
  * being evaluated (schema row or partition tuple). Literals converted
  * to the field's internal representation. */
final case class BoundPred(op: Operation, field: GField, pos: Int,
    values: Seq[Any] = Nil) extends Expr {
  def value: Any = values.head
}

/** Predicate on a TRANSFORM of a column (system-function pushdown,
  * reference SparkV2Filters SUPPORTED_FUNCTIONS + ReplaceStaticInvoke):
  * e.g. `bucket(16, c) = 3`. Values live in the transform's RESULT
  * space. Projects exactly onto a matching partition field (the
  * partition value IS the transform value, so partition-granularity
  * evaluation is exact, not just inclusive). */
final case class TransformPred(op: Operation,
    transform: graft.core.transform.Transform, ref: String,
    values: Seq[Any] = Nil) extends Expr

final case class BoundTransformPred(op: Operation,
    transform: graft.core.transform.Transform, field: GField, pos: Int,
    values: Seq[Any] = Nil) extends Expr {
  def value: Any = values.head
}

/** Predicate on a SHREDDED variant sub-path (write.variant.shred.* —
  * reference parquet/.../VariantShreddingAnalyzer + spec variant
  * shredding): `variant_get_long(payload, '$.x') >= 2`. Used ONLY for
  * file pruning against per-file shredded stats keyed "fieldId:path";
  * row evaluation is conservative TRUE (Spark re-applies the original
  * function filter after the scan). */
final case class UnboundShredPred(op: Operation, ref: String, path: String,
    tpe: GType, values: Seq[Any] = Nil) extends Expr
final case class ShredPred(op: Operation, key: String, tpe: GType,
    values: Seq[Any] = Nil) extends Expr {
  def value: Any = values.head
}

object Expr {
  def and(l: Expr, r: Expr): Expr = (l, r) match {
    case (TrueE, x)      => x
    case (x, TrueE)      => x
    case (FalseE, _)     => FalseE
    case (_, FalseE)     => FalseE
    case _               => And(l, r)
  }
  def or(l: Expr, r: Expr): Expr = (l, r) match {
    case (FalseE, x)     => x
    case (x, FalseE)     => x
    case (TrueE, _)      => TrueE
    case (_, TrueE)      => TrueE
    case _               => Or(l, r)
  }
  def not(e: Expr): Expr = e match {
    case TrueE               => FalseE
    case FalseE              => TrueE
    case Not(c)              => c
    case And(l, r)           => or(not(l), not(r))
    case Or(l, r)            => and(not(l), not(r))
    case UnboundPred(op, r, v) => UnboundPred(Op.negate(op), r, v)
    case BoundPred(op, f, p, v) => BoundPred(Op.negate(op), f, p, v)
    case TransformPred(op, t, r, v) => TransformPred(Op.negate(op), t, r, v)
    case BoundTransformPred(op, t, f, p, v) =>
      BoundTransformPred(Op.negate(op), t, f, p, v)
    case UnboundShredPred(op, r, pa, t, v) =>
      UnboundShredPred(Op.negate(op), r, pa, t, v)
    case ShredPred(op, k, t, v) => ShredPred(Op.negate(op), k, t, v)
  }

  // convenience factories (reference Expressions.java:33-291)
  def isNull(ref: String): Expr = UnboundPred(Op.IsNull, ref)
  def notNull(ref: String): Expr = UnboundPred(Op.NotNull, ref)
  def isNan(ref: String): Expr = UnboundPred(Op.IsNan, ref)
  def notNan(ref: String): Expr = UnboundPred(Op.NotNan, ref)
  def lt(ref: String, v: Any): Expr = UnboundPred(Op.Lt, ref, Seq(v))
  def ltEq(ref: String, v: Any): Expr = UnboundPred(Op.LtEq, ref, Seq(v))
  def gt(ref: String, v: Any): Expr = UnboundPred(Op.Gt, ref, Seq(v))
  def gtEq(ref: String, v: Any): Expr = UnboundPred(Op.GtEq, ref, Seq(v))
  def equalTo(ref: String, v: Any): Expr = UnboundPred(Op.Eq, ref, Seq(v))
  def notEq(ref: String, v: Any): Expr = UnboundPred(Op.NotEq, ref, Seq(v))
  def in(ref: String, vs: Seq[Any]): Expr = UnboundPred(Op.In, ref, vs)
  def notIn(ref: String, vs: Seq[Any]): Expr = UnboundPred(Op.NotIn, ref, vs)
  def startsWith(ref: String, v: String): Expr = UnboundPred(Op.StartsWith, ref, Seq(v))
  def stIntersects(ref: String, box: GeoBox): Expr =
    UnboundPred(Op.StIntersects, ref, Seq(box))

  /** Bind named references against a schema, converting literals to the
    * field's internal representation (reference Binder/Literals). */
  def bind(schema: GSchema, expr: Expr, caseSensitive: Boolean = false): Expr =
    expr match {
      case TrueE | FalseE => expr
      case And(l, r)      => and(bind(schema, l, caseSensitive), bind(schema, r, caseSensitive))
      case Or(l, r)       => or(bind(schema, l, caseSensitive), bind(schema, r, caseSensitive))
      case Not(c)         => not(bind(schema, c, caseSensitive))
      case p: BoundPred   => p
      case p: BoundTransformPred => p
      case TransformPred(op, tr, ref, values) =>
        val field =
          if (caseSensitive) schema.findField(ref)
          else schema.byName.collectFirst { case (n, f) if n.equalsIgnoreCase(ref) => f }
        field match {
          case None => throw new IllegalArgumentException(s"cannot bind: $ref not in schema")
          case Some(f) =>
            val pos = schema.fields.indexWhere(_.id == f.id)
            val rt = tr.resultType(f.tpe)
            BoundTransformPred(op, tr, f, pos, values.map(Literals.convert(_, rt)))
        }
      case UnboundShredPred(op, ref, path, tpe, values) =>
        val field =
          if (caseSensitive) schema.findField(ref)
          else schema.byName.collectFirst { case (n, f) if n.equalsIgnoreCase(ref) => f }
        field match {
          case None => throw new IllegalArgumentException(s"cannot bind: $ref not in schema")
          case Some(f) =>
            require(f.tpe == GVariant,
              s"variant_get pushdown requires a variant column: $ref is ${f.tpe}")
            ShredPred(op, s"${f.id}:$path", tpe, values.map(Literals.convert(_, tpe)))
        }
      case UnboundPred(op, ref, values) =>
        val field =
          if (caseSensitive) schema.findField(ref)
          else schema.byName.collectFirst { case (n, f) if n.equalsIgnoreCase(ref) => f }
        field match {
          case None => throw new IllegalArgumentException(s"cannot bind: $ref not in schema")
          case Some(f) =>
            val pos = schema.fields.indexWhere(_.id == f.id)
            // out-of-range long-vs-int literals resolve the predicate
            // statically (reference ABOVE_MAX/BELOW_MIN): clamping would
            // change Eq/ordering semantics at the boundary
            def range(v: Any): Int = (f.tpe, v) match {
              case (GInt, l: Long) if l > Int.MaxValue => 1
              case (GInt, l: Long) if l < Int.MinValue => -1
              case _                                   => 0
            }
            if (op == Op.StIntersects || op == Op.StNotIntersects) {
              if (!GeoDefaults.isGeo(f.tpe))
                throw new IllegalArgumentException(
                  s"st_intersects requires a geometry/geography column: $ref is ${f.tpe}")
              BoundPred(op, f, pos, values) // value is a GeoBox, not a column literal
            } else if (values.size == 1 && range(values.head) != 0) {
              val above = range(values.head) > 0
              op match {
                case Op.Lt | Op.LtEq => if (above) TrueE else FalseE
                case Op.Gt | Op.GtEq => if (above) FalseE else TrueE
                case Op.Eq           => FalseE
                case Op.NotEq        => TrueE
                case _               => BoundPred(op, f, pos,
                  values.map(Literals.convert(_, f.tpe)))
              }
            } else if (op == Op.In || op == Op.NotIn) {
              val inRange = values.filter(range(_) == 0)
              if (inRange.isEmpty) { if (op == Op.In) FalseE else TrueE }
              else BoundPred(op, f, pos, inRange.map(Literals.convert(_, f.tpe)))
            } else {
              val conv = values.map(Literals.convert(_, f.tpe))
              op match {
                // IsNull on a required column is always false; NotNull always true
                case Op.IsNull if f.required  => FalseE
                case Op.NotNull if f.required => TrueE
                case _ => BoundPred(op, f, pos, conv)
              }
            }
        }
    }

  /** All bound predicates in an expression tree. */
  def boundPreds(e: Expr): Seq[BoundPred] = e match {
    case b: BoundPred => Seq(b)
    case And(l, r)    => boundPreds(l) ++ boundPreds(r)
    case Or(l, r)     => boundPreds(l) ++ boundPreds(r)
    case Not(c)       => boundPreds(c)
    case _            => Nil
  }
}

/** Literal conversion/promotion to internal representation. */
object Literals {
  /** ISO-8601 timestamp string → Instant, HONORING an explicit zone
    * offset (+05:00, -08:00, Z); a bare local datetime reads as UTC —
    * spec single-value timestamptz strings carry +00:00, ntz none. */
  def parseInstant(s: String): java.time.Instant = {
    val t = s.replaceFirst(" ", "T")
    try java.time.OffsetDateTime.parse(t).toInstant
    catch {
      case _: java.time.format.DateTimeParseException =>
        java.time.LocalDateTime.parse(t).toInstant(java.time.ZoneOffset.UTC)
    }
  }

  def convert(v: Any, t: GType): Any =
    if (v == null) null
    else t match {
      case GBoolean => v.asInstanceOf[Boolean]
      case GInt => v match {
        case i: Int => i
        case l: Long =>
          if (l > Int.MaxValue) Int.MaxValue else if (l < Int.MinValue) Int.MinValue else l.toInt
        case s: Short => s.toInt
        case b: Byte  => b.toInt
        case other    => throw new IllegalArgumentException(s"cannot convert to int: $other")
      }
      case GLong => v match {
        case l: Long => l
        case i: Int  => i.toLong
        case s: Short => s.toLong
        case b: Byte => b.toLong
        case other   => throw new IllegalArgumentException(s"cannot convert to long: $other")
      }
      case GFloat => v match {
        case f: Float  => f
        case d: Double => d.toFloat
        case i: Int    => i.toFloat
        case l: Long   => l.toFloat
        case other     => throw new IllegalArgumentException(s"cannot convert to float: $other")
      }
      case GDouble => v match {
        case d: Double => d
        case f: Float  => f.toDouble
        case i: Int    => i.toDouble
        case l: Long   => l.toDouble
        case other     => throw new IllegalArgumentException(s"cannot convert to double: $other")
      }
      case GDecimal(_, s) => v match {
        case bd: java.math.BigDecimal => bd.setScale(s)
        case bd: BigDecimal           => bd.bigDecimal.setScale(s)
        case i: Int                   => java.math.BigDecimal.valueOf(i.toLong).setScale(s)
        case l: Long                  => java.math.BigDecimal.valueOf(l).setScale(s)
        case str: String => // spec single-value wire form ("123.4500")
          new java.math.BigDecimal(str).setScale(s)
        case other => throw new IllegalArgumentException(s"cannot convert to decimal: $other")
      }
      case GDate => v match {
        case i: Int => i
        case d: java.sql.Date => d.toLocalDate.toEpochDay.toInt
        case d: java.time.LocalDate => d.toEpochDay.toInt
        case s: String => java.time.LocalDate.parse(s).toEpochDay.toInt
        case other => throw new IllegalArgumentException(s"cannot convert to date: $other")
      }
      case GTimestamp(_) => v match {
        case l: Long => l
        case t: java.sql.Timestamp =>
          t.getTime * 1000L + (t.getNanos / 1000L) % 1000L
        case i: java.time.Instant => i.getEpochSecond * 1000000L + i.getNano / 1000L
        case s: String => // ISO-8601, spec single-value wire form
          val i = Literals.parseInstant(s)
          i.getEpochSecond * 1000000L + i.getNano / 1000L
        case other => throw new IllegalArgumentException(s"cannot convert to timestamp: $other")
      }
      case GTimestampNs(_) => v match {
        case l: Long => l // nanos since epoch
        case t: java.sql.Timestamp => t.getTime / 1000L * 1000000000L + t.getNanos
        case i: java.time.Instant => i.getEpochSecond * 1000000000L + i.getNano
        case s: String =>
          val i = Literals.parseInstant(s)
          i.getEpochSecond * 1000000000L + i.getNano
        case other => throw new IllegalArgumentException(s"cannot convert to timestamp_ns: $other")
      }
      case GTime => v match {
        case l: Long   => l
        case s: String => java.time.LocalTime.parse(s).toNanoOfDay / 1000L
        case other => throw new IllegalArgumentException(s"cannot convert to time: $other")
      }
      case GString => v match {
        case s: String => s
        case other     => other.toString
      }
      case GBinary | GGeometry(_) | GGeography(_, _) => v match {
        case b: Array[Byte] => b
        case s: String if s.length % 2 == 0 && s.forall(c =>
            (c >= '0' && c <= '9') || (c >= 'a' && c <= 'f') ||
              (c >= 'A' && c <= 'F')) =>
          // spec single-value wire form: uppercase hexadecimal string
          s.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray
        case other => throw new IllegalArgumentException(s"cannot convert to binary: $other")
      }
      case other => throw new IllegalArgumentException(s"cannot convert literal to $other")
    }
}

/** Row access by top-level position (reference StructLike). */
trait GRow {
  def get(pos: Int): Any
}
final case class ArrayRow(values: Array[Any]) extends GRow {
  def get(pos: Int): Any = values(pos)
}

/** Evaluate a bound expression against a row (reference Evaluator.java). */
object RowEvaluator {
  def eval(expr: Expr, row: GRow): Boolean = expr match {
    case TrueE      => true
    case FalseE     => false
    case And(l, r)  => eval(l, row) && eval(r, row)
    case Or(l, r)   => eval(l, row) || eval(r, row)
    case Not(c)     => !eval(c, row)
    case p @ BoundPred(op, f, pos, values) =>
      val v = row.get(pos)
      op match {
        case Op.IsNull  => v == null
        case Op.NotNull => v != null
        case Op.IsNan   => v != null && isNan(v)
        case Op.NotNan  => v != null && !isNan(v)
        case _ if v == null => false
        case Op.StIntersects | Op.StNotIntersects =>
          val box = p.value.asInstanceOf[GeoBox]
          // empty geometry (no bbox) never intersects; one shared
          // intersection rule across function/row/pruning layers
          val hits = WKB.bbox(v.asInstanceOf[Array[Byte]])
            .exists(vb => GeoBox.intersects(vb, box,
              geography = f.tpe.isInstanceOf[GGeography]))
          if (op == Op.StIntersects) hits else !hits
        case Op.Lt      => TypeComparators.compare(f.tpe, v, p.value) < 0
        case Op.LtEq    => TypeComparators.compare(f.tpe, v, p.value) <= 0
        case Op.Gt      => TypeComparators.compare(f.tpe, v, p.value) > 0
        case Op.GtEq    => TypeComparators.compare(f.tpe, v, p.value) >= 0
        case Op.Eq      => TypeComparators.compare(f.tpe, v, p.value) == 0
        case Op.NotEq   => TypeComparators.compare(f.tpe, v, p.value) != 0
        case Op.In      => values.exists(x => TypeComparators.compare(f.tpe, v, x) == 0)
        case Op.NotIn   => !values.exists(x => TypeComparators.compare(f.tpe, v, x) == 0)
        case Op.StartsWith =>
          v.asInstanceOf[String].startsWith(p.value.asInstanceOf[String])
        case Op.NotStartsWith =>
          !v.asInstanceOf[String].startsWith(p.value.asInstanceOf[String])
      }
    case p @ BoundTransformPred(op, tr, f, pos, values) =>
      // evaluate the transform on the row value, compare in result space
      val raw = row.get(pos)
      val rt = tr.resultType(f.tpe)
      val v = if (raw == null) null else tr.apply(raw, f.tpe)
      op match {
        case Op.IsNull  => v == null
        case Op.NotNull => v != null
        case _ if v == null => false
        case Op.Lt    => TypeComparators.compare(rt, v, p.value) < 0
        case Op.LtEq  => TypeComparators.compare(rt, v, p.value) <= 0
        case Op.Gt    => TypeComparators.compare(rt, v, p.value) > 0
        case Op.GtEq  => TypeComparators.compare(rt, v, p.value) >= 0
        case Op.Eq    => TypeComparators.compare(rt, v, p.value) == 0
        case Op.NotEq => TypeComparators.compare(rt, v, p.value) != 0
        case Op.In    => values.exists(x => TypeComparators.compare(rt, v, x) == 0)
        case Op.NotIn => !values.exists(x => TypeComparators.compare(rt, v, x) == 0)
        case _        => false
      }
    // shredded-variant predicate: pruning-only — conservatively keep the
    // row (Spark re-applies the original variant_get filter post-scan)
    case _: ShredPred => true
    case _: UnboundPred | _: TransformPred | _: UnboundShredPred =>
      throw new IllegalStateException("unbound predicate; bind() first")
  }

  private def isNan(v: Any): Boolean = v match {
    case d: Double => d.isNaN
    case f: Float  => f.isNaN
    case _         => false
  }
}
