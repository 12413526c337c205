package graft.io

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * XML source/sink over Spark 4's built-in XML data source, adapted to the
 * reference engine's nesting conventions (reference:
 * src/etl_core/receivers/files/xml/xml_helper.py:12-13,74-110,170-208,
 * components/file_components/xml/xml_component.py:14-19):
 *
 *  - records are `<record_tag>` elements under `<root_tag>` → Spark's
 *    `rowTag` option (streaming parse, partition-parallel — the reference
 *    iterparses on one thread);
 *  - element ATTRIBUTES live under a nested "@attrs" struct; Spark's
 *    reader surfaces them as sibling fields with an attribute prefix, so
 *    an adapter pass regroups `_gattr_*` fields into a "@attrs" struct
 *    (and the writer inverts it);
 *  - mixed text content is "#text" — mapped directly onto Spark's
 *    `valueTag`;
 *  - leaves are read as STRINGS (the reference never types XML leaves) —
 *    `inferSchema=false`.
 */
object XmlIO {

  val AttrsField = "@attrs"
  val TextField = "#text"
  private val AttrPrefix = "_gattr_"

  /** Read `<rowTag>` records; attributes regrouped under "@attrs". */
  def read(spark: SparkSession, path: String, rowTag: String): DataFrame = {
    val raw = spark.read
      .option("rowTag", rowTag)
      .option("attributePrefix", AttrPrefix)
      .option("valueTag", TextField)
      .option("inferSchema", "false") // leaves stay strings, like the reference
      .xml(path)
    regroupAttrs(raw)
  }

  /** Write records as `<rootTag><rowTag>...</rowTag></rootTag>`.
    *
    * `append=true` is the reference's row append (insert before the
    * closing root tag, xml_helper.py:300-377), realized as read-union-
    * rewrite through a staging swap: same resulting document, and the
    * union runs distributed instead of locking one file on one machine. */
  def write(df: DataFrame, path: String, rootTag: String, rowTag: String,
            singleFile: Boolean = false, append: Boolean = false): Unit = {
    val flat = ungroupAttrs(df)
    val target =
      if (append && IOSwap.exists(path)) {
        val existing = ungroupAttrs(read(df.sparkSession, path, rowTag))
        require(existing.columns.sorted.sameElements(flat.columns.sorted),
          s"xml append: column mismatch (${existing.columns.mkString(",")} vs ${flat.columns.mkString(",")})")
        // read-back leaves are strings; conform the new rows BY FIELD NAME
        // (a struct-to-struct cast matches positionally and would silently
        // swap values when nested field order differs between the reader's
        // schema and the incoming one)
        existing.unionByName(flat.select(flat.columns.toSeq.map(c =>
          castByName(org.apache.spark.sql.functions.col(s"`$c`"),
            flat.schema(c).dataType, existing.schema(c).dataType).as(c)): _*))
      } else flat
    val out = if (singleFile) target.coalesce(1) else target
    IOSwap.writeSwapped(path, append && IOSwap.exists(path)) { staging =>
      out.write.mode("overwrite")
        .option("rootTag", rootTag)
        .option("rowTag", rowTag)
        .option("attributePrefix", AttrPrefix)
        .option("valueTag", TextField)
        .xml(staging)
    }
  }

  /** Recursive cast that matches struct fields BY NAME (Spark's native
    * struct cast is positional). Field sets must agree; arrays recurse
    * into their element type; leaves use a plain cast. */
  private[io] def castByName(c: Column, from: DataType, to: DataType): Column =
    (from, to) match {
      case (fs: StructType, ts: StructType) =>
        require(fs.fieldNames.sorted.sameElements(ts.fieldNames.sorted),
          s"xml append: nested field mismatch (${fs.fieldNames.mkString(",")} " +
            s"vs ${ts.fieldNames.mkString(",")})")
        when(c.isNull, lit(null)).otherwise(struct(ts.fields.toSeq.map { tf =>
          castByName(c.getField(tf.name), fs(tf.name).dataType, tf.dataType).as(tf.name)
        }: _*))
      case (fa: ArrayType, ta: ArrayType) =>
        transform(c, x => castByName(x, fa.elementType, ta.elementType))
      case (f, t) if f == t => c
      case (_, t) => c.cast(t)
    }

  /** Sibling `_gattr_x` fields → one nested "@attrs" struct, recursively. */
  private[io] def regroupAttrs(df: DataFrame): DataFrame = {
    def rebuild(c: Column, dt: DataType): (Column, Boolean) = dt match {
      case st: StructType =>
        val attrs = st.fields.filter(_.name.startsWith(AttrPrefix))
        val others = st.fields.filterNot(_.name.startsWith(AttrPrefix))
        val rebuilt = others.toSeq.map { f =>
          val (cc, _) = rebuild(c.getField(f.name), f.dataType)
          cc.as(f.name)
        }
        val attrStruct =
          if (attrs.isEmpty) Nil
          else Seq(struct(attrs.toSeq.map(f =>
            c.getField(f.name).as(f.name.stripPrefix(AttrPrefix))): _*).as(AttrsField))
        // a struct(...) rebuild is never null — guard so absent optional
        // elements stay null instead of becoming structs of nulls (the
        // NullType literal unifies to the struct type in when/otherwise)
        val built = struct(attrStruct ++ rebuilt: _*)
        (when(c.isNull, lit(null)).otherwise(built), attrs.nonEmpty)
      case at: ArrayType => at.elementType match {
        case st: StructType => (transform(c, x => rebuild(x, st)._1), true)
        case _              => (c, false)
      }
      case _ => (c, false)
    }
    val top = df.schema.fields
    val attrs = top.filter(_.name.startsWith(AttrPrefix))
    val others = top.filterNot(_.name.startsWith(AttrPrefix))
    val cols =
      (if (attrs.isEmpty) Nil
       else Seq(struct(attrs.toSeq.map(f =>
         col(s"`${f.name}`").as(f.name.stripPrefix(AttrPrefix))): _*).as(AttrsField))) ++
      others.toSeq.map { f =>
        rebuild(col(s"`${f.name}`"), f.dataType)._1.as(f.name)
      }
    df.select(cols: _*)
  }

  /** Inverse: "@attrs" struct fields → `_gattr_x` siblings, recursively. */
  private[io] def ungroupAttrs(df: DataFrame): DataFrame = {
    def rebuild(c: Column, dt: DataType): Column = dt match {
      case st: StructType =>
        val fields = st.fields.toSeq.flatMap {
          case f if f.name == AttrsField =>
            f.dataType.asInstanceOf[StructType].fields.toSeq.map(af =>
              c.getField(AttrsField).getField(af.name).as(s"$AttrPrefix${af.name}"))
          case f =>
            Seq(rebuild(c.getField(f.name), f.dataType).as(f.name))
        }
        when(c.isNull, lit(null)).otherwise(struct(fields: _*))
      case at: ArrayType if at.elementType.isInstanceOf[StructType] =>
        transform(c, x => rebuild(x, at.elementType))
      case _ => c
    }
    val cols = df.schema.fields.toSeq.flatMap {
      case f if f.name == AttrsField =>
        f.dataType.asInstanceOf[StructType].fields.toSeq.map(af =>
          col(s"`$AttrsField`").getField(af.name).as(s"$AttrPrefix${af.name}"))
      case f => Seq(rebuild(col(s"`${f.name}`"), f.dataType).as(f.name))
    }
    df.select(cols: _*)
  }
}
