package graft.io

import graft.SparkTestBase
import graft.schema.{FieldDef, GraftType}
import org.apache.spark.sql.functions._

/**
 * Opt-in integration specs against LIVE database servers — the Spark
 * mirror of the reference's env-gated real-DB layer
 * (tests/components/databases/mariadb/test_real_database_connection.py,
 * tests/components/databases/test_real_database_connection.py: tests that
 * skip without a reachable server).
 *
 * Gating contract: each test CANCELS (visible as "canceled" in the sbt
 * run, never a silent pass) unless its environment variable points at a
 * live server:
 *
 *   GRAFT_ITEST_JDBC_URL       e.g. jdbc:mariadb://host:3306/testdb
 *   GRAFT_ITEST_JDBC_USER      optional
 *   GRAFT_ITEST_JDBC_PASSWORD  optional
 *   GRAFT_ITEST_JDBC_DIALECT   optional; inferred from the URL scheme
 *   GRAFT_ITEST_MONGO_URI      e.g. mongodb://host:27017
 *   GRAFT_ITEST_MONGO_DB       optional; default graft_itest
 *
 * The exercised paths are the production ones — JdbcIO.read/write with
 * the live dialect's upsert/update SQL, MongoIO.read/write over the
 * RealMongo wire factory — so nothing is rewritten the day a server
 * exists; only the env vars appear. The Mongo test additionally cancels
 * when `mongodb-driver-sync` is absent from the classpath (the offline
 * build ships no driver; RealMongo binds reflectively).
 */
class RealDbIntegrationSpec extends SparkTestBase {
  import spark.implicits._

  private val jdbcUrl  = sys.env.get("GRAFT_ITEST_JDBC_URL")
  private val mongoUri = sys.env.get("GRAFT_ITEST_MONGO_URI")

  private def jdbcOpts: Map[String, String] =
    sys.env.get("GRAFT_ITEST_JDBC_USER").map("user" -> _).toMap ++
      sys.env.get("GRAFT_ITEST_JDBC_PASSWORD").map("password" -> _).toMap

  private def dialectOf(url: String): JdbcIO.Dialect =
    sys.env.get("GRAFT_ITEST_JDBC_DIALECT")
      .map(JdbcIO.Dialect.fromName)
      .getOrElse(url match {
        case u if u.startsWith("jdbc:mariadb") ||
                  u.startsWith("jdbc:mysql")      => JdbcIO.MariaDb
        case u if u.startsWith("jdbc:postgresql") => JdbcIO.Postgres
        case u if u.startsWith("jdbc:sqlserver")  => JdbcIO.SqlServer
        case u if u.startsWith("jdbc:derby")      => JdbcIO.Derby
        case u => fail(s"cannot infer dialect from $u — set GRAFT_ITEST_JDBC_DIALECT")
      })

  private def withConn[A](url: String)(f: java.sql.Connection => A): A = {
    val props = new java.util.Properties()
    jdbcOpts.foreach { case (k, v) => props.setProperty(k, v) }
    val c = java.sql.DriverManager.getConnection(url, props)
    try f(c) finally c.close()
  }

  private def resetTable(url: String, d: JdbcIO.Dialect, table: String): Unit =
    withConn(url) { c =>
      val st = c.createStatement()
      try st.execute(s"DROP TABLE $table")
      catch { case _: java.sql.SQLException => () } // didn't exist yet
      st.execute(s"CREATE TABLE $table (${d.quote("id")} INT PRIMARY KEY, " +
        s"${d.quote("name")} VARCHAR(50), ${d.quote("qty")} INT)")
    }

  private def readBack(url: String, table: String) =
    JdbcIO.read(spark, url, table = Some(table), options = jdbcOpts)
      .orderBy(col("id"))
      .collect().map(r => (r.getInt(0), r.getString(1), r.getInt(2))).toSeq

  test("live JDBC: upsert inserts new keys and updates existing ones") {
    assume(jdbcUrl.isDefined,
      "GRAFT_ITEST_JDBC_URL not set — live-JDBC upsert spec skipped")
    val url = jdbcUrl.get
    val d = dialectOf(url)
    val table = "graft_itest_upsert"
    resetTable(url, d, table)

    val batch1 = Seq((1, "a", 10), (2, "b", 20)).toDF("id", "name", "qty")
    JdbcIO.write(batch1, url, table, JdbcIO.Upsert, d,
      keys = Seq("id"), options = jdbcOpts)
    assert(readBack(url, table) === Seq((1, "a", 10), (2, "b", 20)))

    // id=2 collides (must update), id=3 is new (must insert)
    val batch2 = Seq((2, "b2", 22), (3, "c", 30)).toDF("id", "name", "qty")
    JdbcIO.write(batch2, url, table, JdbcIO.Upsert, d,
      keys = Seq("id"), options = jdbcOpts)
    assert(readBack(url, table) === Seq((1, "a", 10), (2, "b2", 22), (3, "c", 30)))
  }

  test("live JDBC: update sets non-where columns and never inserts") {
    assume(jdbcUrl.isDefined,
      "GRAFT_ITEST_JDBC_URL not set — live-JDBC update spec skipped")
    val url = jdbcUrl.get
    val d = dialectOf(url)
    val table = "graft_itest_update"
    resetTable(url, d, table)

    JdbcIO.write(Seq((1, "a", 10), (2, "b", 20)).toDF("id", "name", "qty"),
      url, table, JdbcIO.Insert, d, options = jdbcOpts)
    // id=1 matches (updated); id=9 matches nothing (NOT inserted)
    JdbcIO.write(Seq((1, "a9", 99), (9, "ghost", 0)).toDF("id", "name", "qty"),
      url, table, JdbcIO.Update, d, where = Seq("id"), options = jdbcOpts)
    assert(readBack(url, table) === Seq((1, "a9", 99), (2, "b", 20)))
  }

  test("live Mongo: insert/read roundtrip and upsert over the wire driver") {
    assume(mongoUri.isDefined,
      "GRAFT_ITEST_MONGO_URI not set — live-Mongo spec skipped")
    assume(MongoIO.DriverStore.available,
      "mongodb-driver-sync not on classpath — live-Mongo spec skipped " +
        "(RealMongo binds the official driver reflectively at runtime)")
    val factory = MongoIO.RealMongo(mongoUri.get,
      sys.env.getOrElse("GRAFT_ITEST_MONGO_DB", "graft_itest"))
    val collection = "itest_docs"
    val schema = Seq(
      FieldDef("doc_id", GraftType.TInteger),
      FieldDef("name", GraftType.TString),
      FieldDef("qty", GraftType.TInteger))

    factory.open().truncate(collection)
    MongoIO.write(Seq((1L, "a", 10L), (2L, "b", 20L), (3L, "c", 30L))
      .toDF("doc_id", "name", "qty"), factory, collection, "insert")
    def slurp() = MongoIO.read(spark, factory, collection, schema)
      .orderBy(col("doc_id"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
    assert(slurp() === Seq((1L, "a", 10L), (2L, "b", 20L), (3L, "c", 30L)))

    // doc_id=3 collides (updated), doc_id=4 is new (inserted)
    MongoIO.write(Seq((3L, "c2", 33L), (4L, "d", 40L))
      .toDF("doc_id", "name", "qty"), factory, collection, "upsert",
      keys = Seq("doc_id"))
    assert(slurp() === Seq((1L, "a", 10L), (2L, "b", 20L),
      (3L, "c2", 33L), (4L, "d", 40L)))

    // filtered + sorted + limited read pushes down to the server
    val top = MongoIO.read(spark, factory, collection, schema,
      sort = Seq("qty" -> -1), limit = Some(2))
      .collect().map(_.getLong(0)).toSet
    assert(top === Set(4L, 3L))
  }
}
