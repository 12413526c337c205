package graft.io

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Flatten/unflatten codecs for flat-format boundaries (CSV, Excel, JDBC),
 * mirroring the reference's record codecs (reference:
 * src/etl_core/receivers/files/json/json_helper.py:300-439):
 *
 *  - nested structs become dotted columns (`addr.city`);
 *  - list elements become `[i]`-indexed columns (`tags[0]`);
 *  - the characters `.` `[` `]` `\` inside a field NAME are escaped with a
 *    backslash so path syntax stays unambiguous (json_helper.py:369-389).
 *
 * Inside the engine data stays NESTED (Spark structs are the native shape,
 * SURVEY.md §1.4); these codecs run only where a flat format demands it.
 * Flattening is schema-driven (static), so ragged arrays need a bound:
 * arrays are expanded to `[0..maxLen)` columns when a bound is given, and
 * JSON-encoded into a single column otherwise — the two strategies a
 * columnar engine can offer for a format with no list type.
 */
object Flatten {

  private val special = Set('.', '[', ']', '\\')

  /** Escape `.[]\` in a key (json_helper.py:369-378). */
  def escapeKey(key: String): String =
    key.flatMap(c => if (special(c)) s"\\$c" else c.toString)

  /** Inverse of escapeKey (json_helper.py:381-389). */
  def unescapeKey(key: String): String = {
    val out = new StringBuilder
    var i = 0
    while (i < key.length) {
      if (key(i) == '\\' && i + 1 < key.length) { out += key(i + 1); i += 2 }
      else { out += key(i); i += 1 }
    }
    out.toString
  }

  /** One parsed path segment: a (possibly empty) name and an optional
    * list index, e.g. "tags[2]" → Seg("tags", Some(2)). */
  final case class Seg(name: String, idx: Option[Int])

  /** Parse an escaped flat path into segments (json_helper.py:392-439). */
  def parsePath(path: String): List[Seg] = {
    val parts = scala.collection.mutable.ListBuffer.empty[Seg]
    val buf = new StringBuilder
    var i = 0
    def flush(): Unit = {
      if (buf.nonEmpty || parts.isEmpty) {
        parts += Seg(unescapeKey(buf.toString), None)
        buf.clear()
      }
    }
    while (i < path.length) {
      val c = path(i)
      if (c == '\\' && i + 1 < path.length) { buf += '\\'; buf += path(i + 1); i += 2 }
      else if (c == '.') { flush(); i += 1 }
      else if (c == '[') {
        var k = i + 1
        while (k < path.length && path(k).isDigit) k += 1
        if (k > i + 1 && k < path.length && path(k) == ']') {
          flush()
          val last = parts.remove(parts.length - 1)
          // consecutive indices ("a[0][1]") would overwrite the first
          // index here and silently merge distinct columns — the Seg
          // model carries ONE index per name, and flatten never emits
          // such paths (inner arrays are JSON-encoded), so reject loudly
          require(last.idx.isEmpty,
            s"unflatten path '$path': nested array indices are not " +
              "supported (one [i] per name segment)")
          parts += Seg(last.name, Some(path.substring(i + 1, k).toInt))
          i = k + 1
        } else { buf += '['; i += 1 }
      } else { buf += c; i += 1 }
    }
    flush()
    parts.filter(s => s.name.nonEmpty || s.idx.nonEmpty).toList
  }

  /**
   * Flatten a DataFrame: struct fields → dotted escaped columns; arrays →
   * `[i]` columns up to `arrayBound` elements when given (absent elements
   * are null), else a JSON-encoded string column.
   */
  def flatten(df: DataFrame, arrayBound: Option[Int] = None): DataFrame = {
    def cols(prefix: String, c: Column, dt: DataType): Seq[(String, Column)] = dt match {
      case st: StructType =>
        st.fields.toSeq.flatMap { f =>
          cols(s"$prefix.${escapeKey(f.name)}", c.getField(f.name), f.dataType)
        }
      case at: ArrayType => arrayBound match {
        // inner (nested) arrays stay JSON-encoded even under arrayBound:
        // `a[0][1]`-style columns cannot round-trip through unflatten's
        // one-index-per-segment model, so the element falls back to the
        // same encoding unbounded arrays use
        case Some(n) if !at.elementType.isInstanceOf[ArrayType] =>
          // get() is 0-based and null-tolerant past the end (ANSI-safe)
          (0 until n).flatMap(i =>
            cols(s"$prefix[$i]", get(c, lit(i)), at.elementType))
        case Some(n) =>
          (0 until n).map(i => s"$prefix[$i]" -> to_json(get(c, lit(i))))
        case None => Seq(prefix -> to_json(c))
      }
      case _ => Seq(prefix -> c)
    }
    val out = df.schema.fields.toSeq.flatMap { f =>
      cols(escapeKey(f.name), col(s"`${f.name}`"), f.dataType)
    }
    df.select(out.map { case (n, c) => c.as(n) }: _*)
  }

  /**
   * Unflatten a DataFrame: dotted/`[i]` escaped column names rebuild
   * structs and arrays. `[i]` columns for the same base assemble into an
   * array ordered by index (missing indices become null slots).
   */
  def unflatten(df: DataFrame): DataFrame = {
    sealed trait Node
    final case class LeafN(c: Column) extends Node
    final case class ObjN(kids: scala.collection.mutable.LinkedHashMap[String, Node]) extends Node
    final case class ArrN(kids: scala.collection.mutable.LinkedHashMap[Int, Node]) extends Node

    val root = ObjN(scala.collection.mutable.LinkedHashMap.empty)

    def insert(node: Node, segs: List[(String, Option[Int])], c: Column): Unit = segs match {
      case Nil => ()
      case (name, idx) :: rest =>
        val obj = node match {
          case o: ObjN => o
          case other => throw new IllegalArgumentException(
            s"unflatten: column path segment '$name' expects an object but " +
              s"an earlier column already made it a ${other.getClass.getSimpleName
                .stripSuffix("N").toLowerCase} — conflicting headers " +
              "(e.g. both 'a' and 'a.b', or 'a' and 'a[0]')")
        }
        def kindOf(n: Node): String = n.getClass.getSimpleName
          .stripSuffix("N").stripSuffix("$").toLowerCase match {
            case "obj" => "an object"; case "arr" => "an array"
            case _ => "a leaf"
          }
        def containerConflict(found: Node, want: String): Nothing =
          throw new IllegalArgumentException(
            s"unflatten: column '$name' is used both as ${kindOf(found)} " +
              s"and as $want — conflicting headers")
        // a leaf landing where an earlier column already built ANY node
        // is a conflict in this insertion order too — without the check
        // it would silently REPLACE the container and drop the earlier
        // columns' data, where the reverse header order throws
        idx match {
          case None =>
            if (rest.isEmpty) {
              obj.kids.get(name).foreach(found =>
                containerConflict(found, "a plain leaf (e.g. both 'a.b' " +
                  "and 'a', in either order)"))
              obj.kids(name) = LeafN(c)
            } else {
              val child = obj.kids.getOrElseUpdate(name,
                ObjN(scala.collection.mutable.LinkedHashMap.empty))
              insert(child, rest, c)
            }
          case Some(i) =>
            val arr = obj.kids.getOrElseUpdate(name,
              ArrN(scala.collection.mutable.LinkedHashMap.empty)) match {
              case a: ArrN  => a
              case found    => containerConflict(found, "an array")
            }
            if (rest.isEmpty) {
              arr.kids.get(i).foreach(found =>
                containerConflict(found, s"a plain array slot (e.g. both " +
                  s"'$name[$i].b' and '$name[$i]', in either order)"))
              arr.kids(i) = LeafN(c)
            } else {
              val child = arr.kids.getOrElseUpdate(i,
                ObjN(scala.collection.mutable.LinkedHashMap.empty))
              insert(child, rest, c)
            }
        }
    }

    df.columns.foreach { name =>
      val segs = parsePath(name).map(s => (s.name, s.idx))
      insert(root, segs, col(s"`$name`"))
    }

    def build(n: Node): Column = n match {
      case LeafN(c) => c
      case ObjN(kids) => struct(kids.toSeq.map { case (k, v) => build(v).as(k) }: _*)
      case ArrN(kids) =>
        val maxI = kids.keys.max
        array((0 to maxI).map(i => kids.get(i).map(build).getOrElse(lit(null))): _*)
    }

    df.select(root.kids.toSeq.map { case (k, v) => build(v).as(k) }: _*)
  }
}
