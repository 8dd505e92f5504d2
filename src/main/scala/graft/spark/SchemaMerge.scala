package graft.spark

import org.apache.spark.sql.types._

import graft.core.meta.GTable
import graft.core.types._

/** Schema evolution ON WRITE (reference spark/.../source/SparkWriteBuilder
  * .java:204-225 `mergeSchema` + api UpdateSchema.unionByNameWith, option
  * names spark/.../SparkWriteOptions.java:70-71): with the `merge-schema`
  * (or `mergeSchema`) write option, the incoming dataset schema is
  * unioned into the table schema by name before the write commits — new
  * columns (nested struct fields included) are appended as OPTIONAL
  * fields with fresh ids, and int→long / float→double /
  * decimal-precision promotions widen the table column in place, keeping
  * its id. The write itself then runs in the dataset's shape (subset or
  * reordered columns) carrying the table's field ids, so readers resolve
  * the new files by id exactly like any other schema-evolution read.
  *
  * Reordered/subset writes without the merge option also route through
  * [[projectG]] — that is the `write.spark.accept-any-schema=true` path
  * (reference SparkTable.java:118-163 ACCEPT_ANY_SCHEMA capability),
  * where Spark skips its own by-name output resolution entirely.
  */
object SchemaMerge {

  private def find(fields: Seq[GField], name: String): Option[GField] =
    fields.find(_.name == name)
      .orElse(fields.find(_.name.equalsIgnoreCase(name)))

  def resolves(st: GStruct, name: String): Boolean = find(st.fields, name).isDefined

  /** structural Spark-type equality ignoring nullability/metadata/case */
  def sparkSameType(a: DataType, b: DataType): Boolean = (a, b) match {
    case (x: StructType, y: StructType) => x.length == y.length &&
      x.fields.zip(y.fields).forall { case (f, g) =>
        f.name.equalsIgnoreCase(g.name) && sparkSameType(f.dataType, g.dataType)
      }
    case (x: ArrayType, y: ArrayType) => sparkSameType(x.elementType, y.elementType)
    case (x: MapType, y: MapType) =>
      sparkSameType(x.keyType, y.keyType) && sparkSameType(x.valueType, y.valueType)
    case (x: DecimalType, y: DecimalType) => x.precision == y.precision && x.scale == y.scale
    case _ => a == b
  }

  /** exact representational match: the dataset column can be written
    * into the table column without a cast */
  private def sameType(g: GType, dt: DataType): Boolean = (g, dt) match {
    case (s: GStruct, d: StructType) =>
      d.fields.forall(f => find(s.fields, f.name).exists(gf => sameType(gf.tpe, f.dataType)))
    case (l: GList, a: ArrayType) => sameType(l.elementType, a.elementType)
    case (m: GMap, mp: MapType) =>
      sameType(m.keyType, mp.keyType) && sameType(m.valueType, mp.valueType)
    case (g, dt) => SparkTypes.toSpark(g) == dt
  }

  /** spec-legal promotions (format/spec.md Schema Evolution): the column
    * keeps its id, old files read through the widened type */
  private def widened(g: GType, dt: DataType): Option[GType] = (g, dt) match {
    case (GInt, LongType)      => Some(GLong)
    case (GFloat, DoubleType)  => Some(GDouble)
    case (GDecimal(p1, s1), d: DecimalType) if d.scale == s1 && d.precision > p1 =>
      Some(GDecimal(d.precision, s1))
    case _ => None
  }

  /** would a union commit change anything? (pre-check so plain appends
    * never pay a metadata commit) */
  def needsChange(st: GStruct, ds: StructType): Boolean =
    ds.fields.exists { sf =>
      find(st.fields, sf.name) match {
        case None => true
        case Some(gf) => (gf.tpe, sf.dataType) match {
          case (inner: GStruct, s: StructType) => needsChange(inner, s)
          case (l: GList, a: ArrayType) => (l.elementType, a.elementType) match {
            case (inner: GStruct, s: StructType) => needsChange(inner, s)
            case _                               => false
          }
          case (m: GMap, mp: MapType) => (m.valueType, mp.valueType) match {
            case (inner: GStruct, s: StructType) => needsChange(inner, s)
            case _                               => false
          }
          // a narrower promotable dataset type needs no schema change
          // (the file is written as a pre-promotion file)
          case (g, dt) => !sameType(g, dt) && narrowed(g, dt).isEmpty
        }
      }
    }

  /** union `ds` into the table's current schema by name and commit the
    * evolved schema (one CAS; no-op when nothing changes) */
  def mergeInto(table: GTable, ds: StructType): Unit = {
    if (!needsChange(table.schema.struct, ds)) return
    table.commitUpdate { base =>
      var nextId = base.lastColumnId
      def fresh(): Int = { nextId += 1; nextId }
      // fresh ids for an added column's whole type tree (ids are
      // assigned once and never recycled)
      def assign(dt: DataType): GType = dt match {
        case s: StructType => GStruct(s.fields.toSeq.map { f =>
          val id = fresh()
          GField(id, f.name, assign(f.dataType), required = false)
        })
        case a: ArrayType => GList(fresh(), assign(a.elementType), !a.containsNull)
        case mp: MapType =>
          val k = fresh(); val v = fresh()
          GMap(k, assign(mp.keyType), v, assign(mp.valueType), !mp.valueContainsNull)
        case p => SparkBridge.gTypeOf(p)
      }
      def union(st: GStruct, d: StructType): GStruct = {
        val existing = st.fields.map { gf =>
          d.fields.find(f => f.name == gf.name || f.name.equalsIgnoreCase(gf.name)) match {
            case None => gf
            case Some(sf) => (gf.tpe, sf.dataType) match {
              case (inner: GStruct, s: StructType) => gf.copy(tpe = union(inner, s))
              case (l: GList, a: ArrayType) => (l.elementType, a.elementType) match {
                case (inner: GStruct, s: StructType) =>
                  gf.copy(tpe = l.copy(elementType = union(inner, s)))
                case _ =>
                  require(sameType(gf.tpe, sf.dataType), mergeErr(gf, sf)); gf
              }
              case (m: GMap, mp: MapType) => (m.valueType, mp.valueType) match {
                case (inner: GStruct, s: StructType) =>
                  gf.copy(tpe = m.copy(valueType = union(inner, s)))
                case _ =>
                  require(sameType(gf.tpe, sf.dataType), mergeErr(gf, sf)); gf
              }
              case (g, dt) =>
                if (sameType(g, dt) || narrowed(g, dt).isDefined) gf
                else widened(g, dt) match {
                  case Some(w) => gf.copy(tpe = w)
                  case None => throw new IllegalArgumentException(mergeErr(gf, sf))
                }
            }
          }
        }
        val added = d.fields.toSeq
          .filter(f => find(st.fields, f.name).isEmpty)
          .map(f => GField(fresh(), f.name, assign(f.dataType), required = false))
        GStruct(existing ++ added)
      }
      val newStruct = union(base.schema.struct, ds)
      if (newStruct == base.schema.struct) base
      else {
        val newSchema = base.schema.copy(struct = newStruct,
          schemaId = base.schemas.map(_.schemaId).max + 1)
        base.copy(schemas = base.schemas :+ newSchema,
          currentSchemaId = newSchema.schemaId,
          lastColumnId = nextId)
      }
    }
  }

  private def mergeErr(gf: GField, sf: StructField): String =
    s"merge-schema: cannot write ${sf.dataType.simpleString} into column " +
      s"'${gf.name}' of type ${SparkTypes.toSpark(gf.tpe).simpleString} — " +
      "cast the dataset column to the table type"

  /** every REQUIRED table field must be present in the dataset (checked
    * recursively through structs the dataset does carry; an optional
    * struct omitted entirely legally reads back as null) */
  def validateRequired(st: GStruct, ds: StructType, path: String = ""): Unit =
    st.fields.foreach { gf =>
      ds.fields.find(f => f.name == gf.name || f.name.equalsIgnoreCase(gf.name)) match {
        case None =>
          require(!gf.required,
            s"required column '$path${gf.name}' missing from the write")
        case Some(sf) => (gf.tpe, sf.dataType) match {
          case (inner: GStruct, s: StructType) =>
            validateRequired(inner, s, s"$path${gf.name}.")
          case _ => ()
        }
      }
    }

  /** project the table struct onto the dataset's shape (order + subset),
    * keeping table field ids, names, defaults and types — the write-file
    * schema for a by-name (accept-any-schema / merge-schema) write */
  def projectG(st: GStruct, ds: StructType): GStruct =
    GStruct(ds.fields.toSeq.map { sf =>
      val gf = find(st.fields, sf.name).getOrElse(throw new IllegalArgumentException(
        s"column '${sf.name}' is not in the table schema " +
          "(use the merge-schema write option to add it)"))
      (gf.tpe, sf.dataType) match {
        case (inner: GStruct, s: StructType) => gf.copy(tpe = projectG(inner, s))
        case (l: GList, a: ArrayType) => (l.elementType, a.elementType) match {
          case (inner: GStruct, s: StructType) =>
            gf.copy(tpe = l.copy(elementType = projectG(inner, s)))
          case _ => gf
        }
        case (m: GMap, mp: MapType) => (m.valueType, mp.valueType) match {
          case (inner: GStruct, s: StructType) =>
            gf.copy(tpe = m.copy(valueType = projectG(inner, s)))
          case _ => gf
        }
        case _ => gf
      }
    })

  /** a dataset type the table column can absorb WITHOUT a schema change:
    * writing a narrower promotable value produces a file identical to
    * one written before the column was widened (spec type promotion) */
  private def narrowed(table: GType, dt: DataType): Option[GType] = (table, dt) match {
    case (GLong, IntegerType)   => Some(GInt)
    case (GDouble, FloatType)   => Some(GFloat)
    case (GDecimal(p1, s1), d: DecimalType) if d.scale == s1 && d.precision < p1 =>
      Some(GDecimal(d.precision, s1))
    case _ => None
  }

  /** The graft schema of the FILE a write produces: the dataset's shape
    * and (possibly narrower) types, the table's field ids, names and
    * defaults. `positional = true` pairs fields by position (an
    * accept-any-schema table skips Spark's output resolution, so an
    * INSERT .. VALUES arrives as col1..colN with uncast literal types);
    * otherwise by name (subset/reorder allowed). Dataset types that are
    * neither the column type nor narrower-promotable are rejected —
    * wider needs the merge-schema option, anything else needs a cast. */
  def fileStruct(st: GStruct, ds: StructType, positional: Boolean): GStruct = {
    def resolveType(gf: GField, dt: DataType): GType = (gf.tpe, dt) match {
      case (inner: GStruct, s: StructType) => fileStruct(inner, s, positional = false)
      case (l: GList, a: ArrayType) => (l.elementType, a.elementType) match {
        case (inner: GStruct, s: StructType) =>
          l.copy(elementType = fileStruct(inner, s, positional = false))
        case _ => require(sameType(l.elementType, a.elementType), mergeErrT(gf, dt)); l
      }
      case (m: GMap, mp: MapType) => (m.valueType, mp.valueType) match {
        case (inner: GStruct, s: StructType) =>
          m.copy(valueType = fileStruct(inner, s, positional = false))
        case _ =>
          require(sameType(m.keyType, mp.keyType) && sameType(m.valueType, mp.valueType),
            mergeErrT(gf, dt)); m
      }
      case (g, d) =>
        if (sameType(g, d)) g
        else narrowed(g, d).getOrElse(throw new IllegalArgumentException(mergeErrT(gf, d)))
    }
    if (positional) {
      require(st.fields.length == ds.fields.length,
        s"positional write arity mismatch: ${ds.fields.length} columns vs " +
          s"${st.fields.length} in the table")
      GStruct(st.fields.zip(ds.fields.toSeq).map { case (gf, sf) =>
        gf.copy(tpe = resolveType(gf, sf.dataType))
      })
    } else GStruct(ds.fields.toSeq.map { sf =>
      val gf = find(st.fields, sf.name).getOrElse(throw new IllegalArgumentException(
        s"column '${sf.name}' is not in the table schema " +
          "(use the merge-schema write option to add it)"))
      gf.copy(tpe = resolveType(gf, sf.dataType))
    })
  }

  private def mergeErrT(gf: GField, dt: DataType): String =
    s"cannot write ${dt.simpleString} into column '${gf.name}' of type " +
      s"${SparkTypes.toSpark(gf.tpe).simpleString} — cast the dataset column " +
      "(or use the merge-schema write option to widen the table column)"
}
