package graft.core.meta

import com.fasterxml.jackson.databind.JsonNode
import com.fasterxml.jackson.databind.node.{ArrayNode, ObjectNode}

import graft.core.expr._
import graft.core.types._

/** REST server-side scan planning wire codecs (reference open-api
  * rest-catalog-open-api.yaml `planTableScan`/`fetchScanTasks` schemas;
  * core/.../rest/PlanTableScanRequestParser, FileScanTaskParser,
  * ExpressionParser, SingleValueParser). At 100 TB a thin client must not
  * ship manifests: the server runs the 3-layer pruning funnel and streams
  * back only surviving FileScanTasks, chunked into opaque plan-tasks.
  *
  * Spec-shaped fields are authoritative and readable by a genuine client;
  * graft adds `x-graft-*` extension fields (write-schema-id,
  * referenced-data-file, shred-stats) that external clients ignore but
  * keep graft-to-graft planning full-fidelity.
  */
object SpecValueJson {
  import MetaJson.mapper

  private def iso(micros: Long, zoned: Boolean): String = {
    val ldt = java.time.LocalDateTime.ofEpochSecond(
      Math.floorDiv(micros, 1000000L),
      (Math.floorMod(micros, 1000000L) * 1000L).toInt,
      java.time.ZoneOffset.UTC)
    val base = ldt.toString // ISO-8601, seconds/fraction only when present
    if (zoned) base + "+00:00" else base
  }

  private def parseMicros(s: String): Long = {
    // honors a real zone offset (+05:00 etc.), not just +00:00/Z — a
    // legal non-canonical offset must shift the instant, never be
    // silently read as UTC
    val i = graft.core.expr.Literals.parseInstant(s)
    i.getEpochSecond * 1000000L + i.getNano / 1000L
  }

  private def hex(b: Array[Byte]): String =
    b.map("%02X".format(_)).mkString

  private def unhex(s: String): Array[Byte] =
    s.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray

  /** internal value → spec PrimitiveTypeValue JSON (Appendix-D
    * single-value JSON; reference SingleValueParser.toJson) */
  def toJson(t: GType, v: Any): JsonNode = {
    val nf = mapper.getNodeFactory
    if (v == null) return nf.nullNode()
    t match {
      case GBoolean => nf.booleanNode(v.asInstanceOf[Boolean])
      case GInt     => nf.numberNode(TypeComparators.anyToInt(v))
      case GLong    => nf.numberNode(TypeComparators.anyToLong(v))
      case GFloat   => nf.numberNode(v.asInstanceOf[Float])
      case GDouble  => nf.numberNode(TypeComparators.anyToDouble(v))
      case GDecimal(_, _) =>
        nf.textNode(v.asInstanceOf[java.math.BigDecimal].toPlainString)
      case GDate =>
        nf.textNode(java.time.LocalDate
          .ofEpochDay(TypeComparators.anyToInt(v).toLong).toString)
      case GTime =>
        nf.textNode(java.time.LocalTime
          .ofNanoOfDay(TypeComparators.anyToLong(v) * 1000L).toString)
      case GTimestamp(ntz) => nf.textNode(iso(TypeComparators.anyToLong(v), !ntz))
      case GTimestampNs(ntz) =>
        // spec nano values serialize with nanosecond precision
        val nanos = TypeComparators.anyToLong(v)
        val ldt = java.time.LocalDateTime.ofEpochSecond(
          Math.floorDiv(nanos, 1000000000L),
          Math.floorMod(nanos, 1000000000L).toInt, java.time.ZoneOffset.UTC)
        nf.textNode(if (ntz) ldt.toString else ldt.toString + "+00:00")
      case GString => nf.textNode(v.asInstanceOf[String])
      case GUuid =>
        v match {
          case b: Array[Byte] if b.length == 16 =>
            val bb = java.nio.ByteBuffer.wrap(b)
            nf.textNode(new java.util.UUID(bb.getLong, bb.getLong).toString)
          case s: String => nf.textNode(s)
          case other => throw new IllegalArgumentException(s"bad uuid: $other")
        }
      case GBinary | GGeometry(_) | GGeography(_, _) =>
        nf.textNode(hex(v.asInstanceOf[Array[Byte]]))
      case other =>
        throw new IllegalArgumentException(s"no single-value JSON for $other")
    }
  }

  /** spec PrimitiveTypeValue JSON → internal value */
  def fromJson(t: GType, n: JsonNode): Any = {
    if (n == null || n.isNull) return null
    t match {
      case GBoolean       => n.asBoolean()
      case GInt           => n.asInt()
      case GLong          => n.asLong()
      case GFloat         => n.floatValue()
      case GDouble        => n.asDouble()
      case GDecimal(_, s) => new java.math.BigDecimal(n.asText()).setScale(s)
      case GDate          => java.time.LocalDate.parse(n.asText()).toEpochDay.toInt
      case GTime          => java.time.LocalTime.parse(n.asText()).toNanoOfDay / 1000L
      case GTimestamp(_)  => parseMicros(n.asText())
      case GTimestampNs(_) =>
        val i = graft.core.expr.Literals.parseInstant(n.asText())
        i.getEpochSecond * 1000000000L + i.getNano
      case GString        => n.asText()
      case GUuid =>
        val u = java.util.UUID.fromString(n.asText())
        val bb = java.nio.ByteBuffer.allocate(16)
        bb.putLong(u.getMostSignificantBits).putLong(u.getLeastSignificantBits)
        bb.array()
      case GBinary | GGeometry(_) | GGeography(_, _) => unhex(n.asText())
      case other =>
        throw new IllegalArgumentException(s"no single-value JSON for $other")
    }
  }

  /** type-blind fallbacks for values whose field type is unknown on one
    * side (e.g. a stats entry for a dropped column): runtime-class based */
  def toJsonUntyped(v: Any): JsonNode = {
    val nf = mapper.getNodeFactory
    v match {
      case null                     => nf.nullNode()
      case b: Boolean               => nf.booleanNode(b)
      case i: Int                   => nf.numberNode(i)
      case l: Long                  => nf.numberNode(l)
      case f: Float                 => nf.numberNode(f)
      case d: Double                => nf.numberNode(d)
      case d: java.math.BigDecimal  => nf.textNode(d.toPlainString)
      case s: String                => nf.textNode(s)
      case b: Array[Byte]           => nf.textNode(hex(b))
      case other                    => nf.textNode(other.toString)
    }
  }

  def fromJsonUntyped(n: JsonNode): Any =
    if (n == null || n.isNull) null
    else if (n.isBoolean) n.asBoolean()
    else if (n.isIntegralNumber) n.asLong()
    else if (n.isFloatingPointNumber) n.asDouble()
    else n.asText()
}

/** Spec expression JSON (reference ExpressionParser): emits the parser's
  * own output shape (`term`/`value`/`values`), accepts the newer
  * `child`/`left`/`right` aliases too. Transform terms serialize as
  * {"type":"transform","transform":"bucket[4]","term":"col"}. */
object SpecExpr {
  import MetaJson.mapper

  private val opNames: Map[Operation, String] = Map(
    Op.IsNull -> "is-null", Op.NotNull -> "not-null",
    Op.IsNan -> "is-nan", Op.NotNan -> "not-nan",
    Op.Lt -> "lt", Op.LtEq -> "lt-eq", Op.Gt -> "gt", Op.GtEq -> "gt-eq",
    Op.Eq -> "eq", Op.NotEq -> "not-eq",
    Op.In -> "in", Op.NotIn -> "not-in",
    Op.StartsWith -> "starts-with", Op.NotStartsWith -> "not-starts-with")
  private val opByName: Map[String, Operation] = opNames.map(_.swap)
  private val unaryOps: Set[Operation] =
    Set(Op.IsNull, Op.NotNull, Op.IsNan, Op.NotNan)
  private val setOps: Set[Operation] = Set(Op.In, Op.NotIn)

  def write(e: Expr): JsonNode = {
    val nf = mapper.getNodeFactory
    e match {
      case TrueE  => nf.booleanNode(true)
      case FalseE => nf.booleanNode(false)
      case And(l, r) =>
        val o = mapper.createObjectNode(); o.put("type", "and")
        o.set[JsonNode]("left", write(l)); o.set[JsonNode]("right", write(r)); o
      case Or(l, r) =>
        val o = mapper.createObjectNode(); o.put("type", "or")
        o.set[JsonNode]("left", write(l)); o.set[JsonNode]("right", write(r)); o
      case Not(c) =>
        val o = mapper.createObjectNode(); o.put("type", "not")
        o.set[JsonNode]("child", write(c)); o
      case UnboundPred(op, ref, values) =>
        predJson(op, nf.textNode(ref), values)
      case BoundPred(op, f, _, values) =>
        predJson(op, nf.textNode(f.name), values)
      case TransformPred(op, tr, ref, values) =>
        val term = mapper.createObjectNode()
        term.put("type", "transform").put("transform", tr.name)
        term.set[JsonNode]("term", nf.textNode(ref))
        predJson(op, term, values)
      case BoundTransformPred(op, tr, f, _, values) =>
        // bound transform preds round-trip through the same unbound wire
        // shape (values are already in the transform's result space); the
        // receiver re-binds by name
        val term = mapper.createObjectNode()
        term.put("type", "transform").put("transform", tr.name)
        term.set[JsonNode]("term", nf.textNode(f.name))
        predJson(op, term, values)
      case other =>
        throw new IllegalArgumentException(s"cannot serialize predicate: $other")
    }
  }

  /** Serialization for filters/residuals that may contain predicates the
    * spec expression JSON cannot express (shredded-variant stats preds).
    * Those leaves are WIDENED to a conservative constant — TRUE in
    * positive position, FALSE under an odd number of NOTs — so the
    * resulting expression only ever matches a superset of rows. This is
    * lossless in practice: ShredPred row evaluation is already
    * conservative TRUE (Spark re-applies the original function filter
    * after the scan); shred preds only sharpen FILE pruning. */
  def writeLossy(e: Expr): JsonNode = write(widen(e, neg = false))

  private def widen(e: Expr, neg: Boolean): Expr = e match {
    case And(l, r) => Expr.and(widen(l, neg), widen(r, neg))
    case Or(l, r)  => Expr.or(widen(l, neg), widen(r, neg))
    case Not(c) => widen(c, !neg) match {
      case TrueE  => FalseE
      case FalseE => TrueE
      case x      => Not(x)
    }
    case _: ShredPred | _: UnboundShredPred => if (neg) FalseE else TrueE
    case other => other
  }

  private def predJson(op: Operation, term: JsonNode, values: Seq[Any]): JsonNode = {
    val name = opNames.getOrElse(op,
      throw new IllegalArgumentException(s"cannot serialize op: $op"))
    val o = mapper.createObjectNode()
    o.put("type", name)
    o.set[JsonNode]("term", term)
    if (setOps(op)) {
      val arr = o.putArray("values")
      values.foreach(v => arr.add(SpecValueJson.toJsonUntyped(v)))
    } else if (!unaryOps(op)) {
      o.set[JsonNode]("value", SpecValueJson.toJsonUntyped(values.head))
    }
    o
  }

  /** JSON → unbound Expr. Literal coercion (ISO date/timestamp strings,
    * long-vs-int) happens at bind time via Literals.convert. */
  def read(n: JsonNode): Expr = {
    if (n.isBoolean) return if (n.asBoolean()) TrueE else FalseE
    val tpe = n.get("type").asText()
    tpe match {
      case "true"  => TrueE
      case "false" => FalseE
      case "and"   => And(read(n.get("left")), read(n.get("right")))
      case "or"    => Or(read(n.get("left")), read(n.get("right")))
      case "not"   => Not(read(n.get("child")))
      case name =>
        val op = opByName.getOrElse(name,
          throw new IllegalArgumentException(s"unknown predicate type: $name"))
        val termNode = Option(n.get("term")).orElse(Option(n.get("child")))
          .orElse(Option(n.get("left")))
          .getOrElse(throw new IllegalArgumentException(s"predicate missing term: $n"))
        val values: Seq[Any] =
          if (setOps(op)) {
            val b = Seq.newBuilder[Any]
            n.get("values").elements()
              .forEachRemaining(v => b += SpecValueJson.fromJsonUntyped(v))
            b.result()
          } else if (unaryOps(op)) Nil
          else Seq(SpecValueJson.fromJsonUntyped(
            Option(n.get("value")).orElse(Option(n.get("right")))
              .getOrElse(throw new IllegalArgumentException(
                s"predicate missing value: $n"))))
        if (termNode.isTextual) UnboundPred(op, termNode.asText(), values)
        else if (termNode.has("transform")) {
          val tr = graft.core.transform.Transform.fromName(
            termNode.get("transform").asText())
          TransformPred(op, tr,
            Option(termNode.get("term")).orElse(Option(termNode.get("child")))
              .map(_.asText()).getOrElse(
                throw new IllegalArgumentException(s"transform term missing: $n")),
            values)
        } else throw new IllegalArgumentException(s"unsupported term: $termNode")
    }
  }
}

/** FileScanTask / ContentFile wire codec + plan-result assembly
  * (reference FileScanTaskParser, ContentFileParser; open-api ScanTasks:
  * tasks reference a shared `delete-files` array by index). */
object SpecScanTasks {
  import MetaJson.mapper

  private def contentName(c: Int): String = c match {
    case FileContent.Data              => "data"
    case FileContent.PositionDeletes   => "position-deletes"
    case FileContent.EqualityDeletes   => "equality-deletes"
    case other => throw new IllegalArgumentException(s"unknown content: $other")
  }

  private def contentCode(s: String): Int = s match {
    case "data"             => FileContent.Data
    case "position-deletes" => FileContent.PositionDeletes
    case "equality-deletes" => FileContent.EqualityDeletes
    case other => throw new IllegalArgumentException(s"unknown content: $other")
  }

  /** wire file-format: the spec enum admits only avro/orc/parquet/puffin
    * — DVs are Puffin containers, and graft's name-mapped import marker
    * ("parquet-nm") is physically parquet; both internal names ride the
    * x-graft-format extension so graft clients round-trip exactly */
  private def formatName(f: DataFile): String = f.format match {
    case "dv"         => "puffin"
    case "parquet-nm" => "parquet"
    case "parquet-im" => "parquet"
    case "orc-nm"     => "orc"
    case other        => other
  }

  /** per-call memo of partition RESULT types by spec id — a 50k-task
    * plan must not rebuild the partition struct per file */
  type PartTypeCache = scala.collection.mutable.Map[Int, Seq[GType]]
  def newPartTypeCache(): PartTypeCache =
    scala.collection.mutable.Map.empty[Int, Seq[GType]]

  /** partition RESULT types per spec id (bucket→int, days→date, ...);
    * a spec referencing dropped source columns yields no types and the
    * values fall back to the untyped codec */
  private def partTypes(meta: TableMetadata, specId: Int,
      cache: PartTypeCache): Seq[GType] =
    cache.getOrElseUpdate(specId,
      try meta.specById(specId).partitionType(meta.schema).fields.map(_.tpe)
      catch { case _: Throwable => Nil })

  private def statType(meta: TableMetadata, fieldId: Int): Option[GType] =
    if (fieldId == DeleteFileIndex.FilePathFieldId) Some(GString)
    else meta.schema.byId.get(fieldId).map(_.tpe)

  def writeFile(f: DataFile, meta: TableMetadata,
      typeCache: PartTypeCache = newPartTypeCache()): ObjectNode = {
    val o = mapper.createObjectNode()
    o.put("content", contentName(f.content))
      .put("file-path", f.path)
      .put("file-format", formatName(f))
      .put("spec-id", f.specId)
      .put("file-size-in-bytes", f.fileSizeBytes)
      .put("record-count", f.recordCount)
    val types = partTypes(meta, f.specId, typeCache)
    val pt = o.putArray("partition")
    f.partition.zipWithIndex.foreach { case (v, i) =>
      types.lift(i) match {
        case Some(t) =>
          // Avro-read tuples may still hold raw spec bytes
          pt.add(SpecValueJson.toJson(t, SingleValue.adapt(t, v)))
        case None => pt.add(SpecValueJson.toJsonUntyped(v))
      }
    }
    if (f.columnStats.nonEmpty) {
      def countMap(name: String, get: ColStats => Option[Long]): Unit = {
        val entries = f.columnStats.toSeq
          .flatMap { case (id, st) => get(st).map(id -> _) }.sortBy(_._1)
        if (entries.nonEmpty) {
          val m = o.putObject(name)
          val ks = m.putArray("keys"); val vs = m.putArray("values")
          entries.foreach { case (id, v) => ks.add(id); vs.add(v) }
        }
      }
      countMap("value-counts", _.valueCount)
      countMap("null-value-counts", _.nullCount)
      countMap("nan-value-counts", _.nanCount)
      def valueMap(name: String, get: ColStats => Option[Any]): Unit = {
        val entries = f.columnStats.toSeq.flatMap { case (id, st) =>
          get(st).map(v => (id, v))
        }.sortBy(_._1)
        if (entries.nonEmpty) {
          val m = o.putObject(name)
          val ks = m.putArray("keys"); val vs = m.putArray("values")
          entries.foreach { case (id, v) =>
            ks.add(id)
            statType(meta, id) match {
              case Some(t) => vs.add(SpecValueJson.toJson(t, SingleValue.adapt(t, v)))
              case None    => vs.add(SpecValueJson.toJsonUntyped(v))
            }
          }
        }
      }
      valueMap("lower-bounds", _.lower)
      valueMap("upper-bounds", _.upper)
    }
    if (f.equalityIds.nonEmpty) {
      val eq = o.putArray("equality-ids"); f.equalityIds.foreach(eq.add)
    }
    f.contentOffset.foreach(o.put("content-offset", _))
    f.contentSizeInBytes.foreach(o.put("content-size-in-bytes", _))
    f.firstRowId.foreach(o.put("first-row-id", _))
    // spec ContentFileParser split-offsets: without them a server-planned
    // client loses row-group-aligned splitting of delete-carrying files
    if (f.splitOffsets.nonEmpty) {
      val so = o.putArray("split-offsets"); f.splitOffsets.foreach(so.add)
    }
    // graft extensions (ignored by genuine clients, full graft fidelity)
    f.referencedDataFile.foreach(o.put("x-graft-referenced-data-file", _))
    if (f.shredStats.nonEmpty)
      o.set[JsonNode]("x-graft-shred-stats", {
        val so = mapper.createObjectNode()
        f.shredStats.foreach { case (k, st) =>
          val eo = so.putObject(k)
          st.valueCount.foreach(eo.put("vc", _))
          st.nullCount.foreach(eo.put("nc", _))
          st.lower.foreach(v => eo.set[JsonNode]("lo", MetaJson.writeValue(v)))
          st.upper.foreach(v => eo.set[JsonNode]("hi", MetaJson.writeValue(v)))
        }
        so
      })
    if (f.format != formatName(f)) o.put("x-graft-format", f.format)
    o
  }

  def readFile(n: JsonNode, meta: TableMetadata,
      typeCache: PartTypeCache = newPartTypeCache()): DataFile = {
    val specId = n.get("spec-id").asInt()
    val types = partTypes(meta, specId, typeCache)
    val pt = Seq.newBuilder[Any]
    var i = 0
    n.get("partition").elements().forEachRemaining { v =>
      pt += (types.lift(i) match {
        case Some(t) => SpecValueJson.fromJson(t, v)
        case None    => SpecValueJson.fromJsonUntyped(v)
      })
      i += 1
    }
    def counts(name: String): Map[Int, Long] =
      Option(n.get(name)).map { m =>
        val ks = m.get("keys"); val vs = m.get("values")
        (0 until ks.size()).map(j => ks.get(j).asInt() -> vs.get(j).asLong()).toMap
      }.getOrElse(Map.empty)
    def bounds(name: String): Map[Int, Any] =
      Option(n.get(name)).map { m =>
        val ks = m.get("keys"); val vs = m.get("values")
        (0 until ks.size()).flatMap { j =>
          val id = ks.get(j).asInt()
          val v = statType(meta, id) match {
            case Some(t) => SpecValueJson.fromJson(t, vs.get(j))
            case None    => SpecValueJson.fromJsonUntyped(vs.get(j))
          }
          Option(v).map(id -> _)
        }.toMap
      }.getOrElse(Map.empty)
    val vc = counts("value-counts"); val nc = counts("null-value-counts")
    val nanc = counts("nan-value-counts")
    val lo = bounds("lower-bounds"); val hi = bounds("upper-bounds")
    val ids = (vc.keySet ++ nc.keySet ++ nanc.keySet ++ lo.keySet ++ hi.keySet)
    val stats = ids.map(id => id -> ColStats(
      vc.get(id), nc.get(id), nanc.get(id), lo.get(id), hi.get(id))).toMap
    val eq = Seq.newBuilder[Int]
    Option(n.get("equality-ids")).foreach(
      _.elements().forEachRemaining(e => eq += e.asInt()))
    val shred = Option(n.get("x-graft-shred-stats")).map { so =>
      val b = Map.newBuilder[String, ColStats]
      so.fields().forEachRemaining { e =>
        val eo = e.getValue
        b += e.getKey -> ColStats(
          Option(eo.get("vc")).map(_.asLong()),
          Option(eo.get("nc")).map(_.asLong()), None,
          Option(eo.get("lo")).map(MetaJson.readValue),
          Option(eo.get("hi")).map(MetaJson.readValue))
      }
      b.result()
    }.getOrElse(Map.empty[String, ColStats])
    val fmt = Option(n.get("x-graft-format")).map(_.asText()).getOrElse(
      n.get("file-format").asText().toLowerCase match {
        case "puffin" => "dv" // DV blobs live in Puffin containers
        case f        => f
      })
    DataFile(
      n.get("file-path").asText(), fmt, specId, pt.result(),
      n.get("record-count").asLong(), n.get("file-size-in-bytes").asLong(),
      stats, contentCode(n.get("content").asText()), eq.result(),
      Option(n.get("x-graft-referenced-data-file")).map(_.asText()),
      Option(n.get("content-offset")).map(_.asLong()),
      Option(n.get("content-size-in-bytes")).map(_.asLong()),
      Option(n.get("first-row-id")).map(_.asLong()),
      shred,
      splitOffsets = Option(n.get("split-offsets")).map { arr =>
        val b = Seq.newBuilder[Long]
        arr.elements().forEachRemaining(e => b += e.asLong())
        b.result()
      }.getOrElse(Nil))
  }

  /** one chunk of FileScanTasks → spec ScanTasks object: deduped
    * `delete-files` array + per-task 0-based `delete-file-references` */
  def writeTasks(tasks: Seq[FileScanTask], meta: TableMetadata): ObjectNode = {
    val typeCache = newPartTypeCache()
    val o = mapper.createObjectNode()
    val deleteIndex = scala.collection.mutable.LinkedHashMap.empty[String, Int]
    val deleteFiles = Seq.newBuilder[DataFile]
    tasks.foreach(_.deletes.foreach { d =>
      if (!deleteIndex.contains(d.path)) {
        deleteIndex(d.path) = deleteIndex.size
        deleteFiles += d
      }
    })
    val dfs = deleteFiles.result()
    if (dfs.nonEmpty) {
      val arr = o.putArray("delete-files")
      dfs.foreach(d => arr.add(writeFile(d, meta, typeCache)))
    }
    val arr = o.putArray("file-scan-tasks")
    tasks.foreach { t =>
      val to = arr.addObject()
      to.set[JsonNode]("data-file", writeFile(t.file, meta, typeCache))
      if (t.deletes.nonEmpty) {
        val refs = to.putArray("delete-file-references")
        t.deletes.foreach(d => refs.add(deleteIndex(d.path)))
      }
      to.set[JsonNode]("residual-filter", SpecExpr.writeLossy(t.residual))
      to.put("x-graft-data-sequence-number", t.dataSequenceNumber)
      if (t.writeSchemaId >= 0) to.put("x-graft-write-schema-id", t.writeSchemaId)
    }
    o
  }

  /** spec ScanTasks object → FileScanTasks (resolving delete refs) */
  def readTasks(n: JsonNode, meta: TableMetadata): Seq[FileScanTask] = {
    val typeCache = newPartTypeCache()
    val deletes = Option(n.get("delete-files")).map { arr =>
      (0 until arr.size()).map(i => readFile(arr.get(i), meta, typeCache))
    }.getOrElse(Seq.empty)
    Option(n.get("file-scan-tasks")).map { arr =>
      (0 until arr.size()).map { i =>
        val to = arr.get(i)
        val f = readFile(to.get("data-file"), meta, typeCache)
        val ds = Option(to.get("delete-file-references")).map { refs =>
          (0 until refs.size()).map(j => deletes(refs.get(j).asInt()))
        }.getOrElse(Seq.empty)
        val residual = Option(to.get("residual-filter"))
          .map(SpecExpr.read).getOrElse(TrueE)
        FileScanTask(f, 0L, f.fileSizeBytes, residual, ds,
          Option(to.get("x-graft-data-sequence-number"))
            .map(_.asLong()).getOrElse(0L),
          writeSchemaId = Option(to.get("x-graft-write-schema-id"))
            .map(_.asInt()).getOrElse(-1))
      }
    }.getOrElse(Seq.empty)
  }

  /** opaque plan-task token: `<plan-id>#<chunk>` */
  def planTask(planId: String, chunk: Int): String = s"$planId#$chunk"
  def parsePlanTask(s: String): (String, Int) = {
    val i = s.lastIndexOf('#')
    require(i > 0 && i < s.length - 1, s"malformed plan-task: $s")
    (s.substring(0, i), s.substring(i + 1).toInt)
  }
}
