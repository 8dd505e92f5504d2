package graft.spark

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.expressions.{Expressions => VE, Literal => VLit, NamedReference, Transform => VTransform}
import org.apache.spark.sql.connector.expressions.filter.{And => VAnd, Not => VNot, Or => VOr, Predicate => VPred}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import graft.core.expr._
import graft.core.transform._
import graft.core.types._

/** Bridges between Spark internal values / DSv2 expressions and the
  * engine's internal representation (reference SparkV2Filters.java,
  * Spark3Util transform conversion). */
object SparkBridge {

  /** Spark catalyst internal value → engine internal value. */
  def fromSpark(v: Any, t: GType): Any =
    if (v == null) null
    else t match {
      case GString        => v.asInstanceOf[UTF8String].toString
      case GDecimal(_, s) => v.asInstanceOf[org.apache.spark.sql.types.Decimal]
        .toJavaBigDecimal.setScale(s)
      case _              => v // numerics, date Int, timestamp Long, binary
    }

  /** engine internal value → Spark catalyst internal value. */
  def toSpark(v: Any, t: GType): Any =
    if (v == null) null
    else t match {
      case GString        => UTF8String.fromString(v.asInstanceOf[String])
      case GDecimal(p, s) => org.apache.spark.sql.types.Decimal(
        v.asInstanceOf[java.math.BigDecimal], p, s)
      case _              => v
    }

  def gTypeOf(dt: DataType): GType = dt match {
    case BooleanType      => GBoolean
    case IntegerType | ShortType | ByteType => GInt
    case LongType         => GLong
    case FloatType        => GFloat
    case DoubleType       => GDouble
    case d: DecimalType   => GDecimal(d.precision, d.scale)
    case DateType         => GDate
    case TimestampType    => GTimestamp(false)
    case TimestampNTZType => GTimestamp(true)
    case StringType       => GString
    case BinaryType       => GBinary
    case VariantType      => GVariant
    case other => throw new IllegalArgumentException(s"unsupported: $other")
  }

  // ----------------------------------------------------- filter conversion
  private def refName(e: org.apache.spark.sql.connector.expressions.Expression): Option[String] =
    e match {
      case n: NamedReference => Some(n.fieldNames.mkString("."))
      case _                 => None
    }

  private def litValue(e: org.apache.spark.sql.connector.expressions.Expression): Option[Any] =
    e match {
      case l: VLit[_] =>
        Some(l.value match {
          case s: UTF8String => s.toString
          case d: org.apache.spark.sql.types.Decimal => d.toJavaBigDecimal
          case x             => x
        })
      case _ => None
    }

  /** Convert a DSv2 predicate to an engine expression. None = not
    * convertible (Spark evaluates it post-scan; we just can't prune
    * with it). */
  def toExpr(p: VPred): Option[Expr] = p match {
    case a: VAnd => for (l <- toExpr(a.left()); r <- toExpr(a.right())) yield Expr.and(l, r)
    case o: VOr  => for (l <- toExpr(o.left()); r <- toExpr(o.right())) yield Expr.or(l, r)
    case n: VNot => toExpr(n.child()).map(Expr.not)
    case _ =>
      val ch = p.children()
      def binary(make: (String, Any) => Expr, flip: (String, Any) => Expr): Option[Expr] =
        if (ch.length != 2) None
        else (refName(ch(0)), litValue(ch(1)), refName(ch(1)), litValue(ch(0))) match {
          case (Some(r), Some(v), _, _) => Some(make(r, v))
          case (_, _, Some(r), Some(v)) => Some(flip(r, v))
          case _                        => None
        }
      // system-function predicates (reference SparkV2Filters line 72
      // SUPPORTED_FUNCTIONS): `bucket(16, c) = 3` etc. — the function call
      // arrives as a UserDefinedScalarFunc; converted to a TransformPred
      // that projects exactly onto a matching partition field
      def fnTransform(e: org.apache.spark.sql.connector.expressions.Expression)
          : Option[(Transform, String)] = e match {
        case f: org.apache.spark.sql.connector.expressions.UserDefinedScalarFunc =>
          val args = f.children()
          def col(i: Int): Option[String] = args.lift(i).flatMap(refName)
          def intArg(i: Int): Option[Int] = args.lift(i).flatMap(litValue).flatMap {
            case n: Number => Some(n.intValue)
            case _         => None
          }
          f.name().toLowerCase match {
            case "bucket" => for (n <- intArg(0); c <- col(1)) yield (BucketT(n), c)
            case "truncate" =>
              (for (w <- intArg(0); c <- col(1)) yield (TruncateT(w): Transform, c))
                .orElse(for (w <- intArg(1); c <- col(0)) yield (TruncateT(w), c))
            case "years"  => col(0).map((YearT, _))
            case "months" => col(0).map((MonthT, _))
            case "days"   => col(0).map((DayT, _))
            case "hours"  => col(0).map((HourT, _))
            case _        => None
          }
        case _ => None
      }
      // geospatial predicate: `st_intersects_bbox(geo, xmin..ymax) = true`
      // (the boolean function call reaches DSv2 as an equality against a
      // foldable literal, same shape as the transform predicates above)
      def geoPred: Option[Expr] = {
        def fromSide(fe: org.apache.spark.sql.connector.expressions.Expression,
            le: org.apache.spark.sql.connector.expressions.Expression): Option[Expr] =
          fe match {
            case f: org.apache.spark.sql.connector.expressions.UserDefinedScalarFunc
                if f.name().equalsIgnoreCase("st_intersects_bbox") =>
              val args = f.children()
              def dbl(i: Int): Option[Double] = args.lift(i).flatMap(litValue).collect {
                case n: Number => n.doubleValue
              }
              for {
                r <- args.lift(0).flatMap(refName)
                xmin <- dbl(1); ymin <- dbl(2); xmax <- dbl(3); ymax <- dbl(4)
                b <- litValue(le).collect { case bb: Boolean => bb }
              } yield {
                val e = Expr.stIntersects(r, graft.core.types.GeoBox(xmin, ymin, xmax, ymax))
                if (b) e else Expr.not(e)
              }
            case _ => None
          }
        if (ch.length != 2) None
        else fromSide(ch(0), ch(1)).orElse(fromSide(ch(1), ch(0)))
      }
      def tpred(op: Operation, flip: Operation): Option[Expr] =
        if (ch.length != 2) None
        else (fnTransform(ch(0)), litValue(ch(1)), fnTransform(ch(1)), litValue(ch(0))) match {
          case (Some((t, r)), Some(v), _, _) => Some(TransformPred(op, t, r, Seq(v)))
          case (_, _, Some((t, r)), Some(v)) => Some(TransformPred(flip, t, r, Seq(v)))
          case _                             => None
        }
      // shredded-variant predicate: `variant_get_long(payload, '$.x') >= 2`
      // prunes files via write.variant.shred.* stats (never row-evaluated
      // engine-side; Spark re-applies the function filter post-scan)
      def fnShred(e: org.apache.spark.sql.connector.expressions.Expression)
          : Option[(String, String, graft.core.types.GType)] = e match {
        case f: org.apache.spark.sql.connector.expressions.UserDefinedScalarFunc
            if f.name().equalsIgnoreCase("variant_get_long") ||
              f.name().equalsIgnoreCase("variant_get_string") =>
          val args = f.children()
          for {
            r <- args.lift(0).flatMap(refName)
            p <- args.lift(1).flatMap(litValue).collect { case s: String => s }
          } yield (r, p,
            if (f.name().equalsIgnoreCase("variant_get_long")) graft.core.types.GLong
            else graft.core.types.GString)
        case _ => None
      }
      def spred(op: Operation, flip: Operation): Option[Expr] =
        if (ch.length != 2) None
        else (fnShred(ch(0)), litValue(ch(1)), fnShred(ch(1)), litValue(ch(0))) match {
          case (Some((r, pa, t)), Some(v), _, _) =>
            Some(UnboundShredPred(op, r, pa, t, Seq(v)))
          case (_, _, Some((r, pa, t)), Some(v)) =>
            Some(UnboundShredPred(flip, r, pa, t, Seq(v)))
          case _ => None
        }
      p.name() match {
        case "IS_NULL" => refName(ch(0)).map(Expr.isNull)
        case "IS_NOT_NULL" => refName(ch(0)).map(Expr.notNull)
        case "=" => binary(Expr.equalTo, Expr.equalTo).orElse(tpred(Op.Eq, Op.Eq))
          .orElse(geoPred).orElse(spred(Op.Eq, Op.Eq))
        case "<=>" => binary(
          (r, v) => if (v == null) Expr.isNull(r) else Expr.equalTo(r, v),
          (r, v) => if (v == null) Expr.isNull(r) else Expr.equalTo(r, v))
        case "<>" | "!=" => binary(Expr.notEq, Expr.notEq).orElse(tpred(Op.NotEq, Op.NotEq))
          .orElse(spred(Op.NotEq, Op.NotEq))
        case "<"  => binary(Expr.lt, Expr.gt).orElse(tpred(Op.Lt, Op.Gt))
          .orElse(spred(Op.Lt, Op.Gt))
        case "<=" => binary(Expr.ltEq, Expr.gtEq).orElse(tpred(Op.LtEq, Op.GtEq))
          .orElse(spred(Op.LtEq, Op.GtEq))
        case ">"  => binary(Expr.gt, Expr.lt).orElse(tpred(Op.Gt, Op.Lt))
          .orElse(spred(Op.Gt, Op.Lt))
        case ">=" => binary(Expr.gtEq, Expr.ltEq).orElse(tpred(Op.GtEq, Op.LtEq))
          .orElse(spred(Op.GtEq, Op.LtEq))
        case "IN" =>
          refName(ch(0)).flatMap { r =>
            val vals = ch.drop(1).map(litValue)
            if (vals.forall(_.isDefined)) Some(Expr.in(r, vals.flatten.toSeq)) else None
          }.orElse {
            fnTransform(ch(0)).flatMap { case (t, r) =>
              val vals = ch.drop(1).map(litValue)
              if (vals.forall(_.isDefined))
                Some(TransformPred(Op.In, t, r, vals.flatten.toSeq))
              else None
            }
          }
        case "STARTS_WITH" =>
          for (r <- refName(ch(0)); v <- litValue(ch(1)) if v.isInstanceOf[String])
            yield Expr.startsWith(r, v.asInstanceOf[String])
        case "ALWAYS_TRUE"  => Some(TrueE)
        case "ALWAYS_FALSE" => Some(FalseE)
        case _ => None
      }
  }

  // ----------------------------------------------------- transform conversion
  def toSparkTransform(pf: PartitionField, schema: GSchema): VTransform = {
    val col = schema.byId(pf.sourceId).name
    pf.transform match {
      case IdentityT    => VE.identity(col)
      case BucketT(n)   => VE.bucket(n, col)
      case TruncateT(w) => VE.apply("truncate", VE.literal(w), VE.column(col))
      case YearT        => VE.years(col)
      case MonthT       => VE.months(col)
      case DayT         => VE.days(col)
      case HourT        => VE.hours(col)
      case VoidT        => VE.apply("void", VE.column(col))
    }
  }

  def fromSparkTransform(t: VTransform): (String, Transform) = {
    def col: String = t.references()(0).fieldNames.mkString(".")
    def intArg: Int = t.arguments().collectFirst {
      case l: VLit[_] => l.value.toString.toInt
    }.getOrElse(throw new IllegalArgumentException(s"missing int arg in $t"))
    t.name() match {
      case "identity" => (col, IdentityT)
      case "bucket"   => (col, BucketT(intArg))
      case "truncate" => (col, TruncateT(intArg))
      case "years" | "year"   => (col, YearT)
      case "months" | "month" => (col, MonthT)
      case "days" | "day"     => (col, DayT)
      case "hours" | "hour"   => (col, HourT)
      case other => throw new IllegalArgumentException(s"unknown transform: $other")
    }
  }

  /** Extract engine-internal values from an InternalRow given positions
    * and Spark types (used by writers to compute partition tuples). */
  def valueAt(row: InternalRow, pos: Int, dt: DataType): Any =
    if (row.isNullAt(pos)) null
    else dt match {
      case BooleanType      => row.getBoolean(pos)
      case IntegerType      => row.getInt(pos)
      case ShortType        => row.getShort(pos).toInt
      case ByteType         => row.getByte(pos).toInt
      case LongType         => row.getLong(pos)
      case FloatType        => row.getFloat(pos)
      case DoubleType       => row.getDouble(pos)
      case d: DecimalType   => row.getDecimal(pos, d.precision, d.scale).toJavaBigDecimal
      case DateType         => row.getInt(pos)
      case TimestampType | TimestampNTZType => row.getLong(pos)
      case StringType       => row.getUTF8String(pos).toString
      case BinaryType       => row.getBinary(pos)
      case other => throw new IllegalArgumentException(s"unsupported: $other")
    }
}
