package graft.io

import graft.SparkTestBase
import graft.schema.{FieldDef, GraftType}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.Row
import java.nio.file.{Files, Paths}

class XmlExcelMongoSpec extends SparkTestBase {

  private def tmp(name: String): String = {
    val p = Paths.get("target", "test-tmp", "xio", name)
    Files.createDirectories(p.getParent)
    p.toString
  }

  // ------------------------------------------------------------------- XML

  test("XML read maps attributes to @attrs and mixed text to #text") {
    val dir = tmp("xml_in")
    Files.createDirectories(Paths.get(dir))
    val f = Paths.get(dir, "recs.xml")
    Files.writeString(f,
      """<root>
        |  <rec id="1" kind="a"><name>Alice</name></rec>
        |  <rec id="2" kind="b"><name>Bob</name></rec>
        |</root>""".stripMargin)
    val df = XmlIO.read(spark, f.toString, rowTag = "rec")
    assert(df.columns.contains("@attrs"))
    val rows = df.select(col("`@attrs`.id"), col("name")).orderBy(col("`@attrs`.id"))
      .collect().map(r => (r.getString(0), r.getString(1)))
    assert(rows.toSeq === Seq(("1", "Alice"), ("2", "Bob")))
  }

  test("XML write/read roundtrip preserves @attrs convention") {
    val out = tmp("xml_rt")
    val df = spark.range(2).select(
      struct(concat(lit("id"), col("id")).as("key")).as("@attrs"),
      concat(lit("v"), col("id")).as("payload"))
    XmlIO.write(df, out, rootTag = "root", rowTag = "item", singleFile = true)
    val back = XmlIO.read(spark, out + "/*.xml", rowTag = "item")
    val rows = back.select(col("`@attrs`.key"), col("payload"))
      .orderBy(col("payload")).collect().map(r => (r.getString(0), r.getString(1)))
    assert(rows.toSeq === Seq(("id0", "v0"), ("id1", "v1")))
  }

  test("XML append inserts records into the existing document") {
    import spark.implicits._
    val out = tmp("xml_append")
    XmlIO.write(Seq(("1", "a")).toDF("id", "v"), out, "root", "item", singleFile = true)
    XmlIO.write(Seq(("2", "b")).toDF("id", "v"), out, "root", "item",
      singleFile = true, append = true)
    val back = XmlIO.read(spark, out + "/*.xml", rowTag = "item")
      .orderBy(col("id")).collect().map(r => (r.getString(0), r.getString(1)))
    assert(back.toSeq === Seq(("1", "a"), ("2", "b")))
  }

  // ----------------------------------------------------------------- Excel

  test("xlsx write/read roundtrip: header row, all-string cells") {
    val path = tmp("book.xlsx")
    val df = spark.range(3).select(col("id"),
      concat(lit("n<&>"), col("id")).as("name"), (col("id") * 1.5).as("score"))
    ExcelIO.write(df, path, sheetName = "data")
    val back = ExcelIO.read(spark, path, sheet = Some("data"))
    assert(back.columns.toSeq === Seq("id", "name", "score"))
    assert(back.count() === 3)
    val r = back.filter(col("id") === "2").head()
    assert(r.getString(1) === "n<&>2") // XML escaping round-trips
    assert(r.getString(2) === "3.0")
  }

  test("xlsx append keeps rows under the original header") {
    import spark.implicits._
    val path = tmp("book_append.xlsx")
    ExcelIO.write(Seq(("1", "a")).toDF("id", "v"), path, sheetName = "data")
    ExcelIO.write(Seq(("2", "b")).toDF("id", "v"), path, sheetName = "data", append = true)
    val back = ExcelIO.read(spark, path, sheet = Some("data"))
      .orderBy(col("id")).collect().map(r => (r.getString(0), r.getString(1)))
    assert(back.toSeq === Seq(("1", "a"), ("2", "b")))
  }

  test("xlsx sheet selection errors on unknown sheet") {
    val path = tmp("book2.xlsx")
    ExcelIO.write(spark.range(1).toDF("id"), path)
    val e = intercept[IllegalArgumentException] {
      ExcelIO.read(spark, path, sheet = Some("nope"))
    }
    assert(e.getMessage.contains("no sheet named"))
  }

  test("xlsx column refs cover multi-letter columns") {
    assert(ExcelIO.colRef(0) === "A")
    assert(ExcelIO.colRef(25) === "Z")
    assert(ExcelIO.colRef(26) === "AA")
    assert(ExcelIO.colIndex("AA7") === 26)
    assert(ExcelIO.colIndex("B3") === 1)
  }

  // ----------------------------------------------------------------- Mongo

  private val docSchema = Seq(
    FieldDef("k", GraftType.TInteger),
    FieldDef("name", GraftType.TString, nullable = true))

  test("document store: insert then read with projection pushdown") {
    MongoIO.InMemoryStores.drop("t1")
    val factory = MongoIO.InMemory("t1")
    import spark.implicits._
    val df = Seq((1L, "a", "secret"), (2L, "b", "secret2"))
      .toDF("k", "name", "undeclared")
    MongoIO.write(df, factory, "c", "insert")
    val back = MongoIO.read(spark, factory, "c", docSchema)
    assert(back.columns.toSeq === Seq("k", "name"))
    assert(back.orderBy(col("k")).collect().map(_.getLong(0)).toSeq === Seq(1L, 2L))
    // projection really pruned: raw store docs keep all fields, the read
    // path requested only declared ones
    val spec = MongoIO.FindSpec(projection = MongoIO.projectionOf(docSchema))
    val raw = factory.open().find("c", spec)
    assert(raw.forall(!_.contains("undeclared")))
  }

  test("document store: filter, sort desc, skip, limit") {
    MongoIO.InMemoryStores.drop("t2")
    val factory = MongoIO.InMemory("t2")
    import spark.implicits._
    MongoIO.write(Seq((1L, "x"), (2L, "x"), (3L, "y"), (4L, "x"))
      .toDF("k", "name"), factory, "c", "insert")
    val got = MongoIO.read(spark, factory, "c", docSchema,
      filter = Map("name" -> "x"), sort = Seq(("k", -1)), skip = 1, limit = Some(2))
      .collect().map(_.getLong(0))
    assert(got.toSeq === Seq(2L, 1L)) // 4,2,1 → skip 1 → 2,1
  }

  test("document store: upsert merges on keys and inserts the rest") {
    MongoIO.InMemoryStores.drop("t3")
    val factory = MongoIO.InMemory("t3")
    import spark.implicits._
    MongoIO.write(Seq((1L, "old"), (2L, "keep")).toDF("k", "name"),
      factory, "c", "insert")
    MongoIO.write(Seq((1L, "new"), (3L, "ins")).toDF("k", "name"),
      factory, "c", "upsert", keys = Seq("k"))
    val got = MongoIO.read(spark, factory, "c", docSchema, sort = Seq(("k", 1)))
      .collect().map(r => (r.getLong(0), r.getString(1)))
    assert(got.toSeq === Seq((1L, "new"), (2L, "keep"), (3L, "ins")))
  }

  test("document store: truncate replaces contents") {
    MongoIO.InMemoryStores.drop("t4")
    val factory = MongoIO.InMemory("t4")
    import spark.implicits._
    MongoIO.write(Seq((1L, "a")).toDF("k", "name"), factory, "c", "insert")
    MongoIO.write(Seq((9L, "only")).toDF("k", "name"), factory, "c", "truncate")
    val got = MongoIO.read(spark, factory, "c", docSchema).collect()
    assert(got.map(_.getLong(0)).toSeq === Seq(9L))
  }

  test("document store: update mode sets fields on matches, never inserts") {
    MongoIO.InMemoryStores.drop("t5")
    val factory = MongoIO.InMemory("t5")
    import spark.implicits._
    MongoIO.write(Seq((1L, "a", "keep1"), (2L, "b", "keep2"))
      .toDF("k", "name", "extra"), factory, "c", "insert")
    // key-derived match; update_fields restricts the $set (extra untouched)
    MongoIO.write(Seq((1L, "NEW", "clobber"), (7L, "ghost", "x"))
      .toDF("k", "name", "extra"), factory, "c", "update",
      keys = Seq("k"), updateFields = Seq("name"))
    val schema3 = Seq(
      FieldDef("k", GraftType.TInteger),
      FieldDef("name", GraftType.TString, nullable = true),
      FieldDef("extra", GraftType.TString, nullable = true))
    val got = MongoIO.read(spark, factory, "c", schema3, sort = Seq(("k", 1)))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    // row 7 NOT inserted; row 1 name updated, extra preserved
    assert(got.toSeq === Seq((1L, "NEW", "keep1"), (2L, "b", "keep2")))

    // explicit match_filter overrides keys: every 'b' row gets flagged
    MongoIO.write(Seq((99L, "x", "FLAG")).toDF("k", "name", "extra"),
      factory, "c", "update", matchFilter = Map("name" -> "b"),
      updateFields = Seq("extra"))
    val after = MongoIO.read(spark, factory, "c", schema3, sort = Seq(("k", 1)))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    assert(after.toSeq === Seq((1L, "NEW", "keep1"), (2L, "b", "FLAG")))
  }

  test("distributed read: slices cover filter/sort/skip/limit across partitions") {
    MongoIO.InMemoryStores.drop("t6")
    val factory = MongoIO.InMemory("t6")
    import spark.implicits._
    MongoIO.write((1 to 950).map(i => (i.toLong, s"n$i")).toDF("k", "name"),
      factory, "c", "insert")
    assert(factory.open().count("c", Map.empty) === 950L)
    // full read splits into multiple slices (minChunk=100) and loses nothing
    val full = MongoIO.read(spark, factory, "c", docSchema, numPartitions = 4)
    assert(full.rdd.getNumPartitions === 4)
    assert(full.count() === 950L)
    assert(full.agg(org.apache.spark.sql.functions.sum(col("k"))).head.getLong(0)
      === (1 to 950).map(_.toLong).sum)
    // global sort + skip + limit stays correct across slice boundaries
    val sliced = MongoIO.read(spark, factory, "c", docSchema,
      sort = Seq(("k", -1)), skip = 5, limit = Some(400), numPartitions = 3)
      .collect().map(_.getLong(0))
    assert(sliced.length === 400)
    assert(sliced.sorted.toSeq === (546L to 945L)) // 950..946 skipped, then 945..546
  }

  test("splittable read partitions by key range, not skip slices") {
    MongoIO.InMemoryStores.drop("t_range")
    RecordingStores.reset()
    val factory = RecordingFactory("t_range")
    import spark.implicits._
    MongoIO.write((1L to 500L).map(i => (i, s"n$i")).toDF("k", "name"),
      factory, "c", "insert")
    // one doc without the split key: must land in the unbounded-below
    // range, never silently dropped
    factory.open().insert("c", Seq("""{"name":"nokey"}"""))
    RecordingStores.reset()

    val back = MongoIO.read(spark, factory, "c", docSchema,
      numPartitions = 4, splitKey = Some("k"))
    val rows = back.collect()
    assert(rows.length === 501)
    assert(rows.map(r => Option(r.get(0))).count(_.isEmpty) === 1)
    assert(rows.flatMap(r => Option(r.get(0))).map(_.asInstanceOf[Long]).sorted
      .toSeq === (1L to 500L))
    // every partition's find carried a RANGE predicate — no skip, no limit
    import scala.jdk.CollectionConverters._
    val specs = RecordingStores.finds.asScala.toSeq
    assert(specs.size === 4)
    assert(specs.forall(s => s.range.isDefined && s.skip == 0 && s.limit.isEmpty))
    val ranges = specs.flatMap(_.range)
    assert(ranges.count(_.gte.isEmpty) === 1) // one unbounded-below
    assert(ranges.count(_.lt.isEmpty) === 1)  // one unbounded-above
    assert(ranges.map(_.field).distinct === Seq("k"))

    // an ORDERED read is unsplittable: same factory falls back to
    // skip/limit slicing and stays correct
    RecordingStores.reset()
    // missing key sorts first (BSON missing-first): page = nokey, 1..9
    val sorted = MongoIO.read(spark, factory, "c", docSchema,
      sort = Seq(("k", 1)), limit = Some(10), splitKey = Some("k"))
      .collect().flatMap(r => Option(r.get(0)))
    assert(sorted.map(_.asInstanceOf[Long]).toSeq === (1L to 9L))
    assert(RecordingStores.finds.asScala.forall(_.range.isEmpty))
  }
}

/** Store wrapper recording every FindSpec an executor issues (local-mode
  * test seam for asserting pushdown shapes). */
object RecordingStores {
  val finds = new java.util.concurrent.ConcurrentLinkedQueue[MongoIO.FindSpec]()
  def reset(): Unit = finds.clear()
}

final case class RecordingFactory(name: String) extends MongoIO.StoreFactory {
  def open(): MongoIO.DocumentStore = new MongoIO.DocumentStore {
    private val inner = MongoIO.InMemoryStores.get(name)
    def find(c: String, s: MongoIO.FindSpec): Seq[String] = {
      RecordingStores.finds.add(s); inner.find(c, s)
    }
    def count(c: String, f: Map[String, Any]): Long = inner.count(c, f)
    def insert(c: String, docs: Seq[String]): Unit = inner.insert(c, docs)
    def upsert(c: String, docs: Seq[String], keys: Seq[String]): Unit =
      inner.upsert(c, docs, keys)
    def update(c: String, docs: Seq[String], keys: Seq[String],
               mf: Map[String, Any], uf: Seq[String]): Unit =
      inner.update(c, docs, keys, mf, uf)
    def truncate(c: String): Unit = inner.truncate(c)
    override def splitPoints(c: String, f: Map[String, Any],
                             field: String, parts: Int): Seq[Any] =
      inner.splitPoints(c, f, field, parts)
  }
}
