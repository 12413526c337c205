package graft.io

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.Row

class FlattenSpec extends SparkTestBase {
  import Flatten._

  test("escapeKey/unescapeKey round-trip specials") {
    val keys = Seq("plain", "a.b", "x[0]", "back\\slash", "mix.ed[1]\\z")
    keys.foreach { k =>
      assert(unescapeKey(escapeKey(k)) === k)
    }
    assert(escapeKey("a.b") === "a\\.b")
  }

  test("parsePath handles dots, indices, escapes") {
    assert(parsePath("a.b.c") === List(Seg("a", None), Seg("b", None), Seg("c", None)))
    assert(parsePath("tags[2]") === List(Seg("tags", Some(2))))
    assert(parsePath("a.b[0].c") === List(Seg("a", None), Seg("b", Some(0)), Seg("c", None)))
    // escaped dot stays inside the name
    assert(parsePath("a\\.b.c") === List(Seg("a.b", None), Seg("c", None)))
    // '[' without a numeric index is a literal
    assert(parsePath("a[x]") === List(Seg("a[x]", None)))
  }

  test("flatten structs to dotted columns; arrays to [i] with bound") {
    val df = spark.range(1).select(
      lit(7L).as("id"),
      struct(lit("k").as("city"), struct(lit(3L).as("z")).as("deep")).as("addr"),
      array(lit("t1"), lit("t2")).as("tags"))
    val flat = Flatten.flatten(df, arrayBound = Some(3))
    assert(flat.columns.toSeq ===
      Seq("id", "addr.city", "addr.deep.z", "tags[0]", "tags[1]", "tags[2]"))
    val r = flat.head()
    assert(r.getAs[String]("addr.city") === "k")
    assert(r.getAs[String]("tags[1]") === "t2")
    assert(r.isNullAt(flat.columns.indexOf("tags[2]")))
  }

  test("flatten arrays without bound become JSON strings") {
    val df = spark.range(1).select(array(lit(1L), lit(2L)).as("xs"))
    val flat = Flatten.flatten(df)
    assert(flat.head().getString(0) === "[1,2]")
  }

  test("flatten escapes special chars in field names") {
    val df = spark.range(1)
      .select(struct(lit(1L).as("a.b")).as("weird"))
    val flat = Flatten.flatten(df)
    assert(flat.columns.toSeq === Seq("weird.a\\.b"))
    val back = Flatten.unflatten(flat)
    assert(back.schema("weird").dataType.asInstanceOf[StructType].fieldNames.toSeq === Seq("a.b"))
  }

  test("unflatten is the inverse of flatten for structs and bounded arrays") {
    val df = spark.range(1).select(
      lit(1L).as("id"),
      struct(lit("x").as("s"), lit(2L).as("n")).as("o"),
      array(lit(10L), lit(20L)).as("xs"))
    val back = Flatten.unflatten(Flatten.flatten(df, arrayBound = Some(2)))
    assert(back.schema("o").dataType.isInstanceOf[StructType])
    val r = back.head()
    assert(r.getAs[Row]("o").getAs[String]("s") === "x")
    assert(r.getAs[Seq[Long]]("xs") === Seq(10L, 20L))
  }

  test("unflatten conflicting headers throw in EITHER insertion order") {
    // ["a", "a.b"] threw but ["a.b", "a"] used to silently REPLACE the
    // object with the leaf, dropping the a.b data — conflict detection
    // must be order-independent
    def build(names: String*) = {
      val df = spark.range(1).select(names.map(n => lit("v").as(n)): _*)
      Flatten.unflatten(df)
    }
    for (names <- Seq(Seq("a", "a.b"), Seq("a.b", "a"),
        Seq("a[0]", "a[0].b"), Seq("a[0].b", "a[0]"), Seq("x", "x"))) {
      val e = intercept[IllegalArgumentException] { build(names: _*) }
      assert(e.getMessage.contains("conflict"),
        s"$names: ${e.getMessage}")
    }
  }
}
