package graft.core.expr

import graft.core.transform._
import graft.core.types._

/** A partition spec: ordered transformed fields over source columns
  * (reference api/.../PartitionSpec.java; format/spec.md:548-637).
  * `fieldId` is the stable partition-field id (1000+), used as the
  * partition tuple field id in manifests. */
final case class PartitionField(sourceId: Int, fieldId: Int, name: String,
    transform: Transform)

final case class PartitionSpec(specId: Int, fields: Seq[PartitionField]) {
  def isUnpartitioned: Boolean = fields.isEmpty

  /** The partition tuple schema given the table schema. */
  def partitionType(schema: GSchema): GStruct =
    GStruct(fields.map { pf =>
      val src = schema.byId(pf.sourceId)
      GField(pf.fieldId, pf.name, pf.transform.resultType(src.tpe))
    })

  /** Evaluate the partition tuple for a row of the table schema. */
  def partitionValues(schema: GSchema, row: GRow): Array[Any] =
    fields.map { pf =>
      val src = schema.byId(pf.sourceId)
      val pos = schema.posOf(pf.sourceId)
      pf.transform.apply(row.get(pos), src.tpe)
    }.toArray
}

object PartitionSpec {
  val Unpartitioned: PartitionSpec = PartitionSpec(0, Nil)
  val StartFieldId = 1000

  def of(schema: GSchema, specs: (String, Transform)*): PartitionSpec = {
    val fields = specs.zipWithIndex.map { case ((col, tr), i) =>
      val src = schema.findField(col)
        .getOrElse(throw new IllegalArgumentException(s"no such column: $col"))
      require(tr.canTransform(src.tpe), s"${tr.name} cannot transform ${src.tpe}")
      val name = tr match {
        case IdentityT   => src.name
        case _: BucketT   => s"${src.name}_bucket"
        case _: TruncateT => s"${src.name}_trunc"
        case t: TimeT     => s"${src.name}_${t.name}"
        case VoidT        => s"${src.name}_null"
      }
      PartitionField(src.id, StartFieldId + i, name, tr)
    }
    PartitionSpec(0, fields)
  }
}

/** Project a bound row predicate into partition space through the spec's
  * transforms — the core of hidden partitioning (reference
  * api/.../expressions/Projections.java, transforms/ProjectionUtil.java).
  *
  * Inclusive projection: partition predicate implied BY the row predicate
  * (superset of matching partitions — safe for pruning). Strict
  * projection: partition predicate that PROVES every row in the partition
  * matches (used for metadata-only deletes).
  *
  * Resulting BoundPreds are bound to the partition tuple: `pos` = index
  * of the partition field, `field` = partition tuple field.
  */
object Projections {

  def inclusive(spec: PartitionSpec, schema: GSchema, expr: Expr): Expr =
    project(spec, schema, expr, strict = false)

  def strict(spec: PartitionSpec, schema: GSchema, expr: Expr): Expr =
    project(spec, schema, expr, strict = true)

  private def project(spec: PartitionSpec, schema: GSchema, expr: Expr,
      strict: Boolean): Expr = expr match {
    case TrueE  => TrueE
    case FalseE => FalseE
    case And(l, r) =>
      Expr.and(project(spec, schema, l, strict), project(spec, schema, r, strict))
    case Or(l, r) =>
      Expr.or(project(spec, schema, l, strict), project(spec, schema, r, strict))
    case Not(c) => project(spec, schema, Expr.not(c), strict)
    case p: BoundPred =>
      val projections = spec.fields.zipWithIndex
        .filter(_._1.sourceId == p.field.id)
        .flatMap { case (pf, idx) =>
          val srcType = p.field.tpe
          val pField = GField(pf.fieldId, pf.name, pf.transform.resultType(srcType))
          if (strict) strictProject(pf.transform, srcType, pField, idx, p)
          else inclusiveProject(pf.transform, srcType, pField, idx, p)
        }
      if (projections.isEmpty) { if (strict) FalseE else TrueE }
      else projections.reduce[Expr]((a, b) => if (strict) Expr.or(a, b) else Expr.and(a, b))
    case p: BoundTransformPred =>
      // exact at partition granularity when a spec field carries the SAME
      // transform of the same source: partition value == transform value
      val matches = spec.fields.zipWithIndex
        .filter { case (pf, _) =>
          pf.sourceId == p.field.id && pf.transform == p.transform }
        .map { case (pf, idx) =>
          BoundPred(p.op,
            GField(pf.fieldId, pf.name, p.transform.resultType(p.field.tpe)),
            idx, p.values): Expr
        }
      if (matches.isEmpty) { if (strict) FalseE else TrueE }
      else matches.reduce((a, b) => if (strict) Expr.or(a, b) else Expr.and(a, b))
    // shredded-variant predicate: invisible to partition space
    case _: ShredPred => if (strict) FalseE else TrueE
    case _: UnboundPred | _: TransformPred | _: UnboundShredPred =>
      throw new IllegalStateException("bind before projecting")
  }

  /** partition-pred implied by row-pred (no false negatives for pruning) */
  private def inclusiveProject(t: Transform, src: GType, pf: GField, pos: Int,
      p: BoundPred): Option[Expr] = {
    def tv(v: Any): Any = t.apply(v, src)
    t match {
      case VoidT => None
      case IdentityT => Some(BoundPred(p.op, pf, pos, p.values))
      case _ =>
        p.op match {
          case Op.IsNull  => Some(BoundPred(Op.IsNull, pf, pos))
          case Op.NotNull => Some(BoundPred(Op.NotNull, pf, pos))
          case Op.IsNan | Op.NotNan => None
          case Op.Eq => Some(BoundPred(Op.Eq, pf, pos, Seq(tv(p.value))))
          case Op.In => Some(BoundPred(Op.In, pf, pos, p.values.map(tv).distinct))
          case Op.NotEq | Op.NotIn => None // transformed values can collide
          case Op.Lt if t.preservesOrder =>
            // integral boundary tightening: col < X ⇔ col <= X-1, so the
            // partition bound is t(X-1) (prunes the boundary partition when
            // X sits exactly on a partition edge — reference ProjectionUtil)
            Some(BoundPred(Op.LtEq, pf, pos, Seq(tv(decrement(p.value).getOrElse(p.value)))))
          case Op.LtEq if t.preservesOrder =>
            Some(BoundPred(Op.LtEq, pf, pos, Seq(tv(p.value))))
          case Op.Gt if t.preservesOrder =>
            Some(BoundPred(Op.GtEq, pf, pos, Seq(tv(increment(p.value).getOrElse(p.value)))))
          case Op.GtEq if t.preservesOrder =>
            Some(BoundPred(Op.GtEq, pf, pos, Seq(tv(p.value))))
          case Op.StartsWith if t.isInstanceOf[TruncateT] && src == GString =>
            val w = t.asInstanceOf[TruncateT].w
            val prefix = p.value.asInstanceOf[String]
            if (prefix.length < w) Some(BoundPred(Op.StartsWith, pf, pos, Seq(prefix)))
            else Some(BoundPred(Op.Eq, pf, pos, Seq(prefix.substring(0, w))))
          case _ => None
        }
    }
  }

  private def decrement(v: Any): Option[Any] = v match {
    case i: Int if i > Int.MinValue   => Some(i - 1)
    case l: Long if l > Long.MinValue => Some(l - 1)
    case _                            => None
  }
  private def increment(v: Any): Option[Any] = v match {
    case i: Int if i < Int.MaxValue   => Some(i + 1)
    case l: Long if l < Long.MaxValue => Some(l + 1)
    case _                            => None
  }

  /** partition-pred that proves the row-pred for every row in partition */
  private def strictProject(t: Transform, src: GType, pf: GField, pos: Int,
      p: BoundPred): Option[Expr] = {
    def tv(v: Any): Any = t.apply(v, src)
    t match {
      case IdentityT => Some(BoundPred(p.op, pf, pos, p.values))
      case VoidT => None
      case _: BucketT =>
        p.op match {
          case Op.NotEq => Some(BoundPred(Op.NotEq, pf, pos, Seq(tv(p.value))))
          case Op.NotIn => Some(BoundPred(Op.NotIn, pf, pos, p.values.map(tv).distinct))
          case _        => None
        }
      case _: TimeT =>
        // time transforms: rows in partition d all satisfy col < X when
        // d < t(X) (partition ends before X's unit starts), etc.
        p.op match {
          case Op.Lt | Op.LtEq => Some(BoundPred(Op.Lt, pf, pos, Seq(tv(p.value))))
          case Op.Gt | Op.GtEq => Some(BoundPred(Op.Gt, pf, pos, Seq(tv(p.value))))
          case Op.NotEq        => None
          case _               => None
        }
      case _: TruncateT =>
        p.op match {
          case Op.Lt | Op.LtEq => Some(BoundPred(Op.Lt, pf, pos, Seq(tv(p.value))))
          case Op.Gt | Op.GtEq => Some(BoundPred(Op.Gt, pf, pos, Seq(tv(p.value))))
          case _               => None
        }
    }
  }

  /** Residual: what's left of `expr` for rows of a file in partition
    * `partition` (reference ResidualEvaluator.java). Identity-partition
    * predicates evaluate exactly; strict-true parts become TrueE;
    * inclusive-false parts become FalseE; the rest must be re-evaluated
    * by the engine on read. */
  def residual(spec: PartitionSpec, schema: GSchema, expr: Expr,
      partition: GRow): Expr = expr match {
    case TrueE  => TrueE
    case FalseE => FalseE
    case And(l, r) =>
      Expr.and(residual(spec, schema, l, partition), residual(spec, schema, r, partition))
    case Or(l, r) =>
      Expr.or(residual(spec, schema, l, partition), residual(spec, schema, r, partition))
    case Not(c) => residual(spec, schema, Expr.not(c), partition)
    case p @ (_: BoundPred | _: BoundTransformPred | _: ShredPred) =>
      val strictP = project(spec, schema, p, strict = true)
      if (strictP != FalseE && RowEvaluator.eval(strictP, partition)) TrueE
      else {
        val inclP = project(spec, schema, p, strict = false)
        if (!RowEvaluator.eval(inclP, partition)) FalseE
        else p
      }
    case _: UnboundPred | _: TransformPred | _: UnboundShredPred =>
      throw new IllegalStateException("bind before residual")
  }
}
