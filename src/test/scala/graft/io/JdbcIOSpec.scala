package graft.io

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import java.sql.DriverManager

/** JDBC semantics tests against embedded Derby (in /opt/spark/jars —
  * the only database available offline). Dialect SQL for the production
  * databases is pinned by string tests below. */
class JdbcIOSpec extends SparkTestBase {

  private val url = "jdbc:derby:memory:graftdb;create=true"

  private def exec(sql: String): Unit = {
    val c = DriverManager.getConnection(url)
    try { c.createStatement().execute(sql) } finally c.close()
  }

  private def fresh(table: String): Unit = {
    val c = DriverManager.getConnection(url)
    try {
      val st = c.createStatement()
      try st.execute(s"DROP TABLE $table") catch { case _: Exception => () }
      st.execute(s"""CREATE TABLE $table ("id" BIGINT PRIMARY KEY, "name" VARCHAR(100), "val" DOUBLE)""")
    } finally c.close()
  }

  private def rows(table: String) =
    JdbcIO.read(spark, url, table = Some(table))
      .orderBy(col("id")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))

  import spark.implicits._
  private def df(rs: (Long, String, Double)*) =
    rs.toDF("id", "name", "val")

  test("insert + read back (and query-based read)") {
    fresh("t_ins")
    JdbcIO.write(df((1L, "a", 1.5), (2L, "b", 2.5)), url, "t_ins", JdbcIO.Insert, JdbcIO.Derby)
    assert(rows("t_ins").toSeq === Seq((1L, "a", 1.5), (2L, "b", 2.5)))
    val n = JdbcIO.read(spark, url,
      query = Some("""SELECT "id" FROM t_ins WHERE "val" > 2""")).count()
    assert(n === 1)
  }

  test("partitioned read splits work across tasks") {
    fresh("t_part")
    JdbcIO.write(df((1L, "a", 1.0), (2L, "b", 2.0), (3L, "c", 3.0), (4L, "d", 4.0)),
      url, "t_part", JdbcIO.Insert, JdbcIO.Derby)
    val d = JdbcIO.read(spark, url, table = Some("t_part"),
      partition = Some(JdbcIO.PartitionSpec("\"id\"", 1, 5, 3)))
    assert(d.rdd.getNumPartitions === 3)
    assert(d.count() === 4)
  }

  test("upsert updates matches and inserts the rest (Derby MERGE)") {
    fresh("t_ups")
    JdbcIO.write(df((1L, "old", 1.0), (2L, "keep", 2.0)), url, "t_ups",
      JdbcIO.Insert, JdbcIO.Derby)
    JdbcIO.write(df((1L, "new", 9.0), (3L, "ins", 3.0)), url, "t_ups",
      JdbcIO.Upsert, JdbcIO.Derby, keys = Seq("id"))
    assert(rows("t_ups").toSeq ===
      Seq((1L, "new", 9.0), (2L, "keep", 2.0), (3L, "ins", 3.0)))
  }

  test("update mode: SET non-where columns WHERE key matches") {
    fresh("t_upd")
    JdbcIO.write(df((1L, "a", 1.0), (2L, "b", 2.0)), url, "t_upd",
      JdbcIO.Insert, JdbcIO.Derby)
    JdbcIO.write(df((1L, "patched", 7.0)), url, "t_upd",
      JdbcIO.Update, JdbcIO.Derby, where = Seq("id"))
    assert(rows("t_upd").toSeq === Seq((1L, "patched", 7.0), (2L, "b", 2.0)))
  }

  test("truncate mode replaces table contents") {
    fresh("t_trunc")
    JdbcIO.write(df((1L, "a", 1.0), (2L, "b", 2.0)), url, "t_trunc",
      JdbcIO.Insert, JdbcIO.Derby)
    JdbcIO.write(df((9L, "only", 9.0)), url, "t_trunc",
      JdbcIO.Truncate, JdbcIO.Derby)
    assert(rows("t_trunc").toSeq === Seq((9L, "only", 9.0)))
  }

  test("executor-local pool reuses connections across partitions and writes") {
    fresh("t_pool")
    JdbcIO.ConnectionPool.closeAll()
    val before = JdbcIO.ConnectionPool.opens.get()
    // single-partition batched writes, back to back: the second (and every
    // later) partition must reuse the first's pooled connection
    JdbcIO.write(df((1L, "a", 1.0)).repartition(1), url, "t_pool",
      JdbcIO.Upsert, JdbcIO.Derby, keys = Seq("id"))
    JdbcIO.write(df((2L, "b", 2.0)).repartition(1), url, "t_pool",
      JdbcIO.Upsert, JdbcIO.Derby, keys = Seq("id"))
    JdbcIO.write(df((1L, "a2", 3.0)).repartition(1), url, "t_pool",
      JdbcIO.Update, JdbcIO.Derby, where = Seq("id"))
    assert(JdbcIO.ConnectionPool.opens.get() - before === 1,
      "three sequential single-partition writes must share one physical connection")
    assert(rows("t_pool") === Seq((1L, "a2", 3.0), (2L, "b", 2.0)))
    // a multi-partition write still lands correct rows (concurrent
    // partitions may open extra connections; they pool for later reuse)
    JdbcIO.write(df((10L, "x", 1.0), (11L, "y", 2.0)).repartition(2), url,
      "t_pool", JdbcIO.Upsert, JdbcIO.Derby, keys = Seq("id"))
    assert(rows("t_pool").length === 4)
    JdbcIO.ConnectionPool.closeAll()
  }

  test("MariaDB upsert SQL shape (mariadb_write.py:58-65)") {
    val sql = JdbcIO.MariaDb.upsertSql("t", Seq("id", "name"), Seq("id"))
    assert(sql === "INSERT INTO t (`id`, `name`) VALUES (?, ?)" +
      " ON DUPLICATE KEY UPDATE `name` = VALUES(`name`)")
  }

  test("PostgreSQL upsert SQL shape (postgresql_write.py:58-69)") {
    val sql = JdbcIO.Postgres.upsertSql("t", Seq("id", "name"), Seq("id"))
    assert(sql === "INSERT INTO t (\"id\", \"name\") VALUES (?, ?)" +
      " ON CONFLICT (\"id\") DO UPDATE SET \"name\" = EXCLUDED.\"name\"")
  }

  test("SQL Server upsert SQL shape (sqlserver_write.py:59-82)") {
    val sql = JdbcIO.SqlServer.upsertSql("t", Seq("id", "name"), Seq("id"))
    assert(sql.startsWith("MERGE INTO t WITH (HOLDLOCK) AS T USING"))
    assert(sql.contains("WHEN MATCHED THEN UPDATE SET T.[name] = S.[name]"))
    assert(sql.contains("WHEN NOT MATCHED THEN INSERT ([id], [name]) VALUES (S.[id], S.[name])"))
  }

  test("update SQL parameter order is set-cols then where-cols") {
    val d = JdbcIO.Postgres
    assert(d.updateSql("t", Seq("id", "a", "b"), Seq("id")) ===
      "UPDATE t SET \"a\" = ?, \"b\" = ? WHERE \"id\" = ?")
    assert(d.updateParamOrder(Seq("id", "a", "b"), Seq("id")) === Seq("a", "b", "id"))
  }

  test("pure-key upsert/update is a loud error, not invalid SQL") {
    // every column a key/where column → the SET list is empty, and
    // every dialect would emit syntactically broken SQL ('DO UPDATE
    // SET ', 'UPDATE ... SET  WHERE') that fails batches with a
    // cryptic driver error — reject at build time instead
    val cols = Seq("a", "b")
    for (d <- Seq(JdbcIO.MariaDb, JdbcIO.Postgres, JdbcIO.SqlServer,
        JdbcIO.Derby)) {
      val e = intercept[IllegalArgumentException] {
        d.upsertSql("t", cols, cols)
      }
      assert(e.getMessage.contains("nothing to SET"), s"${d.name}: ${e.getMessage}")
    }
    val eu = intercept[IllegalArgumentException] {
      JdbcIO.Postgres.updateSql("t", cols, cols)
    }
    assert(eu.getMessage.contains("nothing to SET"))
  }

  test("named :params bind as escaped literals (mariadb_read.py:26-67)") {
    assert(JdbcIO.bindParams("SELECT * FROM t WHERE id = :id AND n = :name",
      Map("id" -> 42L, "name" -> "o'brien")) ===
      "SELECT * FROM t WHERE id = 42 AND n = 'o''brien'")
    // longest-name-first: :id2 must not be clobbered by :id
    assert(JdbcIO.bindParams("WHERE a = :id AND b = :id2",
      Map("id" -> 1, "id2" -> 2)) === "WHERE a = 1 AND b = 2")
    assert(JdbcIO.bindParams("WHERE x = :f AND y = :b AND z IS :n",
      Map("f" -> 1.5, "b" -> true, "n" -> null)) ===
      "WHERE x = 1.5 AND y = TRUE AND z IS NULL")
    intercept[IllegalArgumentException] {
      JdbcIO.bindParams("WHERE id = :missing", Map("other" -> 1))
    }
    // ::casts are not placeholders; :name inside a string literal is data
    assert(JdbcIO.bindParams("SELECT x::text FROM t WHERE id = :id",
      Map("id" -> 7)) === "SELECT x::text FROM t WHERE id = 7")
    assert(JdbcIO.bindParams("WHERE note = 'ping :id now' AND id = :id",
      Map("id" -> 5)) === "WHERE note = 'ping :id now' AND id = 5")
    // a live roundtrip: params-bound query against Derby
    fresh("t_params")
    JdbcIO.write(df((1L, "a", 1.0), (2L, "b", 2.0)), url, "t_params",
      JdbcIO.Insert, JdbcIO.Derby)
    val got = JdbcIO.read(spark, url, query = Some(JdbcIO.bindParams(
      """SELECT * FROM t_params WHERE "id" = :id""", Map("id" -> 2L))))
    assert(got.collect().map(_.getLong(0)).toSeq === Seq(2L))
  }

  test("urls and auth options assemble from credentials per dialect") {
    val c = graft.runtime.Credentials.Creds("u", "pw", "db.host", 5432, "mydb")
    assert(JdbcIO.urlFor(JdbcIO.MariaDb, c) === "jdbc:mariadb://db.host:5432/mydb")
    assert(JdbcIO.urlFor(JdbcIO.Postgres, c) === "jdbc:postgresql://db.host:5432/mydb")
    assert(JdbcIO.urlFor(JdbcIO.SqlServer, c) ===
      "jdbc:sqlserver://db.host:5432;databaseName=mydb")
    assert(JdbcIO.urlFor(JdbcIO.Derby, c) === "jdbc:derby:mydb;create=true")
    assert(JdbcIO.credentialOptions(JdbcIO.Postgres, c) ===
      Map("user" -> "u", "password" -> "pw"))
    assert(JdbcIO.credentialOptions(JdbcIO.Derby, c) === Map.empty)
  }
}
