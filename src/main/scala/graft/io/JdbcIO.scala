package graft.io

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import java.sql.{Connection, DriverManager, PreparedStatement}

/**
 * JDBC source/sink with the reference engine's database semantics
 * (reference: src/etl_core/components/databases/mariadb/mariadb_read.py:17-70,
 * mariadb_write.py:21-128, postgresql_write.py:20-132,
 * sqlserver_write.py:21-145, if_exists_strategy.py:4-10):
 *
 *  - reads run an arbitrary query (default SELECT * FROM entity) and can
 *    be PARTITIONED (partitionColumn/lowerBound/upperBound/numPartitions)
 *    — unlike the reference, whose "bigdata" read is one pandas partition
 *    (mariadb_receiver.py:73-79), this scales reads across executors;
 *  - write modes INSERT | UPSERT | TRUNCATE | UPDATE; INSERT/TRUNCATE map
 *    onto Spark's native JDBC writer (append / overwrite+truncate);
 *    UPSERT/UPDATE have no Spark equivalent and run as a foreachPartition
 *    sink issuing batched dialect SQL — executor-side, one connection and
 *    one prepared statement per partition, `batchSize` rows per round
 *    trip (the reference executes row-by-row even in bulk mode,
 *    mariadb_receiver.py:102-152; batching strictly dominates);
 *  - per-dialect upsert SQL: MariaDB ON DUPLICATE KEY UPDATE
 *    (mariadb_write.py:58-65), PostgreSQL ON CONFLICT DO UPDATE
 *    (postgresql_write.py:58-69), SQL Server MERGE
 *    (sqlserver_write.py:59-82); Derby MERGE backs the offline tests.
 *
 * Retries rerun the whole write; idempotency comes from the upsert keys,
 * matching the reference (SURVEY §7.4.5).
 */
object JdbcIO {

  sealed trait WriteMode
  case object Insert   extends WriteMode
  case object Upsert   extends WriteMode
  case object Truncate extends WriteMode
  case object Update   extends WriteMode

  object WriteMode {
    def fromName(s: String): WriteMode = s.toLowerCase match {
      case "insert"   => Insert
      case "upsert"   => Upsert
      case "truncate" => Truncate
      case "update"   => Update
      case other      => throw new IllegalArgumentException(s"unknown write mode: $other")
    }
  }

  /** Dialect-specific SQL builders. Serializable: shipped into
    * foreachPartition closures. */
  sealed trait Dialect extends Serializable {
    def name: String
    def quote(id: String): String = s""""$id""""
    def insertSql(table: String, cols: Seq[String]): String =
      s"INSERT INTO $table (${cols.map(quote).mkString(", ")}) " +
        s"VALUES (${cols.map(_ => "?").mkString(", ")})"
    /** Upsert: insert, or update non-key columns when the key exists.
      * `sqlTypes` gives per-column SQL type names for dialects that cannot
      * infer parameter types (Derby MERGE). */
    def upsertSql(table: String, cols: Seq[String], keys: Seq[String],
                  sqlTypes: Map[String, String] = Map.empty): String
    /** Row-wise update: SET non-where columns WHERE where-cols match
      * (mariadb_write.py:67-74). Parameter order: set cols, then where. */
    def updateSql(table: String, cols: Seq[String], where: Seq[String]): String = {
      val sets = setCols(cols, where, "update").map(c => s"${quote(c)} = ?")
      val conds = where.map(c => s"${quote(c)} = ?")
      s"UPDATE $table SET ${sets.mkString(", ")} WHERE ${conds.mkString(" AND ")}"
    }
    /** The non-key/non-where columns a SET clause carries. Empty is a
      * loud error HERE: every dialect would otherwise emit syntactically
      * invalid SQL ('UPDATE ... SET  WHERE', 'DO UPDATE SET ', 'WHEN
      * MATCHED THEN UPDATE SET ') and fail each batch with a cryptic
      * driver message. */
    protected def setCols(cols: Seq[String], keys: Seq[String],
                          what: String): Seq[String] = {
      val sets = cols.filterNot(keys.contains)
      require(sets.nonEmpty,
        s"$name $what on (${cols.mkString(", ")}): every column is a " +
          "key/where column, so there is nothing to SET — use mode=insert " +
          "for pure-key tables")
      sets
    }
    /** Column order matching updateSql's parameter order. */
    def updateParamOrder(cols: Seq[String], where: Seq[String]): Seq[String] =
      cols.filterNot(where.contains) ++ where
    def upsertParamOrder(cols: Seq[String], keys: Seq[String]): Seq[String] = cols
  }

  /** MariaDB/MySQL: INSERT ... ON DUPLICATE KEY UPDATE col=VALUES(col). */
  case object MariaDb extends Dialect {
    val name = "mariadb"
    override def quote(id: String): String = s"`$id`"
    def upsertSql(table: String, cols: Seq[String], keys: Seq[String],
                  sqlTypes: Map[String, String] = Map.empty): String = {
      val updates = setCols(cols, keys, "upsert")
        .map(c => s"${quote(c)} = VALUES(${quote(c)})")
      insertSql(table, cols) + s" ON DUPLICATE KEY UPDATE ${updates.mkString(", ")}"
    }
  }

  /** PostgreSQL: INSERT ... ON CONFLICT (keys) DO UPDATE SET c=EXCLUDED.c. */
  case object Postgres extends Dialect {
    val name = "postgresql"
    def upsertSql(table: String, cols: Seq[String], keys: Seq[String],
                  sqlTypes: Map[String, String] = Map.empty): String = {
      val updates = setCols(cols, keys, "upsert")
        .map(c => s"${quote(c)} = EXCLUDED.${quote(c)}")
      insertSql(table, cols) +
        s" ON CONFLICT (${keys.map(quote).mkString(", ")}) DO UPDATE SET ${updates.mkString(", ")}"
    }
  }

  /** SQL Server: MERGE WHEN MATCHED UPDATE / WHEN NOT MATCHED INSERT. */
  case object SqlServer extends Dialect {
    val name = "sqlserver"
    override def quote(id: String): String = s"[$id]"
    def upsertSql(table: String, cols: Seq[String], keys: Seq[String],
                  sqlTypes: Map[String, String] = Map.empty): String = {
      val src = cols.map(c => s"? AS ${quote(c)}").mkString(", ")
      val on = keys.map(k => s"T.${quote(k)} = S.${quote(k)}").mkString(" AND ")
      val sets = setCols(cols, keys, "upsert")
        .map(c => s"T.${quote(c)} = S.${quote(c)}").mkString(", ")
      val ins = cols.map(quote).mkString(", ")
      val vals = cols.map(c => s"S.${quote(c)}").mkString(", ")
      s"MERGE INTO $table WITH (HOLDLOCK) AS T USING (SELECT $src) AS S ON ($on) " +
        s"WHEN MATCHED THEN UPDATE SET $sets " +
        s"WHEN NOT MATCHED THEN INSERT ($ins) VALUES ($vals);"
    }
  }

  /** Apache Derby (ANSI MERGE) — the offline integration-test dialect.
    * Derby cannot infer `?` parameter types inside MERGE's source query,
    * so parameters are CAST to the SQL types derived from the DataFrame
    * schema (`sqlTypes`). */
  case object Derby extends Dialect {
    val name = "derby"
    def upsertSql(table: String, cols: Seq[String], keys: Seq[String],
                  sqlTypes: Map[String, String] = Map.empty): String = {
      // Derby's MERGE source must be a base table (ERROR 42XAL), so the
      // row values ride as CAST parameters in the ON / SET / INSERT
      // clauses over the 1-row SYSDUMMY1 table — one logical row per
      // batched execution. Param order: keys, set-cols, then all cols.
      def cast(c: String) = s"CAST(? AS ${sqlTypes.getOrElse(c, "VARCHAR(32672)")})"
      val on = keys.map(k => s"T.${quote(k)} = ${cast(k)}").mkString(" AND ")
      val sets = setCols(cols, keys, "upsert")
        .map(c => s"${quote(c)} = ${cast(c)}").mkString(", ")
      val ins = cols.map(quote).mkString(", ")
      val vals = cols.map(cast).mkString(", ")
      s"MERGE INTO $table T USING SYSIBM.SYSDUMMY1 ON ($on) " +
        s"WHEN MATCHED THEN UPDATE SET $sets " +
        s"WHEN NOT MATCHED THEN INSERT ($ins) VALUES ($vals)"
    }
    override def upsertParamOrder(cols: Seq[String], keys: Seq[String]): Seq[String] =
      keys ++ cols.filterNot(keys.contains) ++ cols
  }

  object Dialect {
    def fromName(s: String): Dialect = s.toLowerCase match {
      case "mariadb" | "mysql" => MariaDb
      case "postgresql" | "postgres" => Postgres
      case "sqlserver" | "mssql" => SqlServer
      case "derby" => Derby
      case other => throw new IllegalArgumentException(s"unknown dialect: $other")
    }
  }

  /** JDBC url assembled engine-side from resolved credentials, so secrets
    * and hosts never sit in job configs (reference resolves per-environment
    * credentials inside every DB component, database.py:57-95). Derby's
    * "database" is a filesystem path — the offline test dialect. */
  def urlFor(dialect: Dialect, c: graft.runtime.Credentials.Creds): String =
    dialect match {
      case MariaDb   => s"jdbc:mariadb://${c.host}:${c.port}/${c.database}"
      case Postgres  => s"jdbc:postgresql://${c.host}:${c.port}/${c.database}"
      case SqlServer => s"jdbc:sqlserver://${c.host}:${c.port};databaseName=${c.database}"
      case Derby     => s"jdbc:derby:${c.database};create=true"
    }

  /** Connection properties for resolved credentials (empty for Derby,
    * whose embedded driver has no authentication in the offline tests). */
  def credentialOptions(dialect: Dialect,
                        c: graft.runtime.Credentials.Creds): Map[String, String] =
    dialect match {
      case Derby => Map.empty
      case _     => Map("user" -> c.user, "password" -> c.password)
    }

  /** Bind named `:param` placeholders into a query as SQL literals
    * (reference mariadb_read.py:26-67 binds named params through
    * SQLAlchemy; Spark's JDBC source has no parameter API, so the
    * engine-side equivalent is literal substitution with proper escaping).
    * Substitution walks the query outside single-quoted string literals
    * only — a `:name` INSIDE a literal is data, not a parameter — and
    * `::type` casts (Postgres) are never treated as placeholders. An
    * unbound placeholder left outside literals is rejected loudly. */
  def bindParams(query: String, params: Map[String, Any]): String = {
    def literal(v: Any): String = v match {
      case null                => "NULL"
      case s: String           => "'" + s.replace("'", "''") + "'"
      case b: Boolean          => if (b) "TRUE" else "FALSE"
      case n @ (_: Int | _: Long | _: Short | _: Byte) => n.toString
      case d: Double           => d.toString
      case f: Float            => f.toString
      case d: java.math.BigDecimal => d.toPlainString
      case other => throw new IllegalArgumentException(
        s"unsupported query param type: ${other.getClass.getSimpleName}")
    }
    // placeholder = ':' not preceded by ':' (excludes ::casts), then an
    // identifier; evaluated only in the non-literal segments of the query
    val placeholder = "(?<!:):([A-Za-z_][A-Za-z0-9_]*)".r
    val out = new StringBuilder
    var i = 0
    while (i < query.length) {
      if (query.charAt(i) == '\'') { // copy the whole quoted literal verbatim
        val close = {
          var j = i + 1
          while (j < query.length && query.charAt(j) != '\'') j += 1
          j
        }
        out.append(query.substring(i, math.min(close + 1, query.length)))
        i = close + 1
      } else {
        val next = query.indexOf('\'', i)
        val segEnd = if (next < 0) query.length else next
        val segment = query.substring(i, segEnd)
        out.append(placeholder.replaceAllIn(segment, m => {
          val name = m.group(1)
          require(params.contains(name), s"unbound query parameter :$name")
          java.util.regex.Matcher.quoteReplacement(literal(params(name)))
        }))
        i = segEnd
      }
    }
    out.toString
  }

  /** Partitioned-read options (Spark JDBC source pass-through). */
  final case class PartitionSpec(column: String, lower: Long, upper: Long, num: Int)

  /** Read via query (reference default SELECT * FROM entity) or table. */
  def read(spark: SparkSession, url: String, table: Option[String] = None,
           query: Option[String] = None,
           partition: Option[PartitionSpec] = None,
           options: Map[String, String] = Map.empty): DataFrame = {
    require(table.isDefined != query.isDefined, "exactly one of table/query")
    var r = spark.read.format("jdbc").option("url", url)
    table.foreach(t => r = r.option("dbtable", t))
    query.foreach(q => r = r.option("query", q))
    partition.foreach { p =>
      require(table.isDefined, "partitioned reads need dbtable (Spark restriction)")
      r = r.option("partitionColumn", p.column)
        .option("lowerBound", p.lower.toString)
        .option("upperBound", p.upper.toString)
        .option("numPartitions", p.num.toString)
    }
    options.foreach { case (k, v) => r = r.option(k, v) }
    r.load()
  }

  /** Write with the reference's four modes. `keys` drive UPSERT conflict
    * targets; `where` drives UPDATE matching (required, like the
    * reference's where_conditions, database_operation_mixin.py:20-30). */
  def write(df: DataFrame, url: String, table: String, mode: WriteMode,
            dialect: Dialect, keys: Seq[String] = Nil, where: Seq[String] = Nil,
            batchSize: Int = 1000,
            options: Map[String, String] = Map.empty): Unit = mode match {
    case Insert =>
      var w = df.write.format("jdbc").mode("append")
        .option("url", url).option("dbtable", table)
      options.foreach { case (k, v) => w = w.option(k, v) }
      w.save()
    case Truncate =>
      var w = df.write.format("jdbc").mode("overwrite")
        .option("url", url).option("dbtable", table).option("truncate", "true")
      options.foreach { case (k, v) => w = w.option(k, v) }
      w.save()
    case Upsert =>
      require(keys.nonEmpty, "upsert requires key columns")
      val cols = df.columns.toSeq
      val sql = dialect.upsertSql(table, cols, keys, sqlTypesOf(df))
      val order = dialect.upsertParamOrder(cols, keys)
      executeBatched(df, url, sql, order, batchSize, options)
    case Update =>
      require(where.nonEmpty, "update requires where_conditions")
      val cols = df.columns.toSeq
      val sql = dialect.updateSql(table, cols, where)
      val order = dialect.updateParamOrder(cols, where)
      executeBatched(df, url, sql, order, batchSize, options)
  }

  /** ANSI SQL type names for a DataFrame's columns (CAST targets). */
  private def sqlTypesOf(df: DataFrame): Map[String, String] = {
    import org.apache.spark.sql.types._
    df.schema.fields.map { f =>
      f.name -> (f.dataType match {
        case LongType => "BIGINT"
        case IntegerType => "INTEGER"
        case ShortType | ByteType => "SMALLINT"
        case DoubleType => "DOUBLE"
        case FloatType => "REAL"
        case BooleanType => "BOOLEAN"
        case _: DecimalType => "DECIMAL(38,18)"
        case TimestampType => "TIMESTAMP"
        case DateType => "DATE"
        case _ => "VARCHAR(32672)"
      })
    }.toMap
  }

  /**
   * Executor-local connection pool keyed by URL + connection options
   * (reference pool_registry.py:16-60 pools per URL+kwargs). Lives in the
   * executor JVM as a static object: every partition of every component
   * in a job (and across jobs of a long-lived service) borrows from the
   * same pool, so a many-component JDBC job opens
   * O(executors × concurrency) connections instead of
   * O(components × partitions). A connection that saw an error is closed,
   * never returned; idle connections are capped per key (excess closes).
   */
  private[io] object ConnectionPool {
    private val maxIdlePerKey = 4
    private val pools = new java.util.concurrent.ConcurrentHashMap[
      (String, Map[String, String]),
      java.util.concurrent.ArrayBlockingQueue[Connection]]()
    /** Physical opens — observable seam for the reuse spec. */
    val opens = new java.util.concurrent.atomic.AtomicLong(0)

    private def queue(key: (String, Map[String, String])) =
      pools.computeIfAbsent(key,
        _ => new java.util.concurrent.ArrayBlockingQueue[Connection](maxIdlePerKey))

    /** Liveness probe that can never throw: isClosed/isValid both may
      * raise on a dead socket, and isValid may be unsupported (treat as
      * alive — the next use will fail and the task retries). */
    private def alive(c: Connection): Boolean =
      try !c.isClosed &&
        (try c.isValid(1)
         catch { case _: java.sql.SQLFeatureNotSupportedException => true })
      catch { case _: java.sql.SQLException => false }

    def borrow(url: String, options: Map[String, String]): Connection = {
      val q = queue((url, options))
      var c = q.poll()
      while (c != null && !alive(c)) { // drop stale/dead handles
        try c.close() catch { case _: java.sql.SQLException => () }
        c = q.poll()
      }
      if (c != null) c
      else {
        val props = new java.util.Properties()
        options.foreachEntry((k, v) => props.setProperty(k, v))
        opens.incrementAndGet()
        DriverManager.getConnection(url, props)
      }
    }

    /** Return a HEALTHY connection; `broken` ones close instead (their
      * transaction state is unknown). Never throws: this runs in finally
      * blocks, where an exception would mask the batch's real error.
      * Only the cheap local isClosed check runs here — isValid costs a
      * network round trip and borrow() already validates on the way out,
      * so a dead handle offered back is merely discarded at next borrow. */
    def release(url: String, options: Map[String, String],
                c: Connection, broken: Boolean): Unit =
      try {
        val closed = try c.isClosed catch { case _: java.sql.SQLException => true }
        if (broken || closed || !queue((url, options)).offer(c))
          try c.close() catch { case _: java.sql.SQLException => () }
      } catch { case _: java.sql.SQLException => () }

    /** Close every pooled connection (tests / orderly shutdown). */
    def closeAll(): Unit = {
      import scala.jdk.CollectionConverters._
      pools.values.asScala.foreach { q =>
        var c = q.poll()
        while (c != null) {
          try c.close() catch { case _: java.sql.SQLException => () }
          c = q.poll()
        }
      }
      pools.clear()
    }
  }

  /** foreachPartition sink: borrow a pooled connection per partition
    * (executor-local reuse across partitions, components and jobs),
    * prepared statement per partition, executeBatch every `batchSize`
    * rows, single commit. */
  private def executeBatched(df: DataFrame, url: String, sql: String,
                             paramCols: Seq[String], batchSize: Int,
                             options: Map[String, String]): Unit = {
    val indices = paramCols.map(c => df.columns.indexOf(c))
    require(indices.forall(_ >= 0), s"param columns $paramCols missing from ${df.columns.toSeq}")
    df.foreachPartition { rows: Iterator[Row] =>
      if (rows.nonEmpty) {
        val conn: Connection = ConnectionPool.borrow(url, options)
        var broken = true
        try {
          conn.setAutoCommit(false)
          val ps: PreparedStatement = conn.prepareStatement(sql)
          var pending = 0
          rows.foreach { row =>
            indices.zipWithIndex.foreach { case (ci, pi) =>
              ps.setObject(pi + 1, row.get(ci))
            }
            ps.addBatch()
            pending += 1
            if (pending >= batchSize) { ps.executeBatch(); pending = 0 }
          }
          if (pending > 0) ps.executeBatch()
          conn.commit()
          ps.close()
          broken = false
        } finally ConnectionPool.release(url, options, conn, broken)
      }
    }
  }
}
