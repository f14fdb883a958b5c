package graft.io

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.types._

/** The serving-side upsert sink, expressed as SQL generation + a
  * foreachPartition JDBC writer (SURVEY.md §2.2 K3/K4/K5/K6).
  *
  * The reference upserts 100-row chunks of `INSERT … ON DUPLICATE KEY
  * UPDATE` through the RDS Data API (LOADERS/GOLD-data-loader.py:278-303,
  * 657-676) and bootstraps tables from DataFrame dtypes (:143-185). The
  * statement builders are pure (testable without a database); the executor
  * writer streams partitions — no driver-side collect, so the sink scales
  * with the cluster, bounded by the database's ingest rate.
  */
object UpsertSql {

  /** K4 — MySQL DDL from the DataFrame schema; dtype map mirrors
    * LOADERS/GOLD-data-loader.py:143-152 (bool → TINYINT, string →
    * VARCHAR(250), float → FLOAT), plus the auto-refreshing dateUpdated. */
  def createTableDdl(schema: StructType, table: String,
                     primaryKey: String): String = {
    def sqlType(f: StructField): String = f.dataType match {
      case BooleanType => "TINYINT(1)"
      case IntegerType | ShortType | ByteType => "INT"
      case LongType => "BIGINT"
      case FloatType | DoubleType => "FLOAT"
      case _: DecimalType => "DECIMAL(20,4)"
      case TimestampType | TimestampNTZType => "TIMESTAMP"
      case DateType => "DATE"
      case _ => if (f.name == primaryKey) "VARCHAR(250)" else "VARCHAR(250)"
    }
    val cols = schema.fields.map { f =>
      val pk = if (f.name == primaryKey) " PRIMARY KEY" else ""
      s"`${f.name}` ${sqlType(f)}$pk"
    }
    (cols :+
      "`dateUpdated` TIMESTAMP DEFAULT CURRENT_TIMESTAMP ON UPDATE CURRENT_TIMESTAMP")
      .mkString(s"CREATE TABLE IF NOT EXISTS `$table` (\n  ", ",\n  ", "\n)")
  }

  /** K3 — parameterized upsert statement: INSERT … ON DUPLICATE KEY UPDATE
    * over every non-key column (LOADERS/GOLD-data-loader.py:278-303). */
  def upsertStatement(table: String, columns: Seq[String],
                      primaryKey: String): String = {
    val colList = columns.map(c => s"`$c`").mkString(", ")
    val placeholders = columns.map(_ => "?").mkString(", ")
    val updates = columns.filterNot(_ == primaryKey)
      .map(c => s"`$c` = VALUES(`$c`)").mkString(", ")
    s"INSERT INTO `$table` ($colList) VALUES ($placeholders) " +
      s"ON DUPLICATE KEY UPDATE $updates"
  }

  /** K6 — dimension-table build: CREATE IF NOT EXISTS + INSERT IGNORE from
    * SELECT DISTINCT (LOADERS/GOLD-rds-updater.py:81-114). The distinct
    * itself runs in Spark (df.select(cols).distinct()); this emits the
    * serving-side statements. */
  def dimensionTableSql(dimTable: String, sourceTable: String,
                        keyCol: String, nameCol: String): Seq[String] = Seq(
    s"CREATE TABLE IF NOT EXISTS `$dimTable` (`$keyCol` VARCHAR(250) PRIMARY KEY, `$nameCol` VARCHAR(250))",
    s"INSERT IGNORE INTO `$dimTable` (`$keyCol`, `$nameCol`) SELECT DISTINCT `$keyCol`, `$nameCol` FROM `$sourceTable`")

  /** K5 — serving-side search bootstrap (LOADERS/GOLD-data-loader.py:
    * 593-604): utf8mb4 conversion, STORED generated columns normalising
    * ø→o / Ø→O for each searchable name column, a composite FULLTEXT KEY
    * over the normalised names + context columns, secondary lookup keys,
    * and the universal FULLTEXT index. Pure statement generation — the
    * normalisation itself runs in MySQL, complementing the in-engine C4
    * `translate` cleanup. */
  def searchIndexDdl(table: String,
                     nameCols: Seq[String] = Seq("fullName", "playerName"),
                     contextCols: Seq[String] =
                       Seq("teamName", "competitionName", "positionName", "seasonName"),
                     universalContextCols: Seq[String] =
                       Seq("teamName", "competitionName")): Seq[String] = {
    def norm(c: String) = s"${c}Normalised"
    val generated = nameCols.map { c =>
      s"ADD COLUMN `${norm(c)}` TEXT GENERATED ALWAYS AS " +
        s"(REPLACE(REPLACE(`$c`, 'ø', 'o'), 'Ø', 'O')) STORED"
    }
    val fulltext = "ADD FULLTEXT KEY `playerFullTextIndex` (" +
      (nameCols.map(norm) ++ contextCols).map(c => s"`$c`").mkString(", ") + ")"
    val secondary = Seq(
      "ADD KEY `idx_season_competition` (`seasonName`(25), `competitionName`(255))",
      "ADD KEY `idx_player_team` (`playerId`(255), `teamName`(255))")
    Seq(
      s"ALTER TABLE `$table` CONVERT TO CHARACTER SET utf8mb4 COLLATE utf8mb4_unicode_ci",
      (generated ++ Seq(fulltext) ++ secondary)
        .mkString(s"ALTER TABLE `$table`\n  ", ",\n  ", ""),
      s"CREATE FULLTEXT INDEX `playerUniversalFullTextIndex` ON `$table` (" +
        (nameCols.map(norm) ++ universalContextCols).map(c => s"`$c`").mkString(", ") + ")")
  }

  /** Schema-compat guard before upsert: every DataFrame column must exist
    * in the serving table (LOADERS/GOLD-data-loader.py:637-642). Returns
    * the missing columns; callers raise. */
  def schemaCompatViolations(df: DataFrame, tableCols: Set[String]): Seq[String] =
    df.columns.filterNot(tableCols.contains).toSeq

  private def ansiSqlType(f: StructField): String = f.dataType match {
    case BooleanType => "SMALLINT"
    case IntegerType | ShortType | ByteType => "INT"
    case LongType => "BIGINT"
    case FloatType | DoubleType => "FLOAT"
    case _: DecimalType => "DECIMAL(20,4)"
    case TimestampType | TimestampNTZType => "TIMESTAMP"
    case DateType => "DATE"
    case _ => "VARCHAR(250)"
  }

  /** Upsert-statement dialect: a primary statement (SQL + placeholder→
    * column bind order) and an optional INSERT fallback applied to rows
    * the primary statement did not affect. MySQL's native
    * `ON DUPLICATE KEY UPDATE` needs no fallback; Ansi renders the
    * classic two-step upsert (batched UPDATE, then INSERT of the
    * zero-update-count rows) so the writer path can be integration-tested
    * live against the in-JVM Derby engine that ships with Spark — the
    * foreachPartition/chunked-batch mechanics are identical, only the
    * statements differ. (Derby's MERGE cannot type parameters even under
    * CAST, hence two statements rather than one.) */
  sealed trait Dialect {
    def upsert(table: String, schema: StructType, primaryKey: String)
      : (String, Seq[Int], Option[(String, Seq[Int])])
  }
  case object MySqlDialect extends Dialect {
    def upsert(table: String, schema: StructType, primaryKey: String)
      : (String, Seq[Int], Option[(String, Seq[Int])]) =
      (upsertStatement(table, schema.fieldNames.toSeq, primaryKey),
        schema.fieldNames.indices, None)
  }
  case object AnsiDialect extends Dialect {
    def upsert(table: String, schema: StructType, primaryKey: String)
      : (String, Seq[Int], Option[(String, Seq[Int])]) = {
      val columns = schema.fieldNames.toSeq
      val pkIdx = columns.indexOf(primaryKey)
      require(pkIdx >= 0, s"primary key $primaryKey not in columns")
      val nonKey = columns.zipWithIndex.filterNot(_._1 == primaryKey)
      val update = s"UPDATE $table SET " +
        nonKey.map { case (c, _) => s"$c = ?" }.mkString(", ") +
        s" WHERE $primaryKey = ?"
      val insert = s"INSERT INTO $table (${columns.mkString(", ")}) " +
        s"VALUES (${columns.map(_ => "?").mkString(", ")})"
      (update, nonKey.map(_._2) :+ pkIdx, Some((insert, columns.indices)))
    }
  }

  /** K4, ANSI rendering: same dtype mapping as `createTableDdl` minus the
    * MySQL-isms (backtick quoting, TINYINT(1), `ON UPDATE` auto-refresh —
    * Derby keeps the insert-time CURRENT_TIMESTAMP default only). */
  def createTableDdlAnsi(schema: StructType, table: String,
                         primaryKey: String): String = {
    val cols = schema.fields.map { f =>
      val pk = if (f.name == primaryKey) " PRIMARY KEY" else ""
      s"${f.name} ${ansiSqlType(f)}$pk"
    }
    (cols :+ "dateUpdated TIMESTAMP DEFAULT CURRENT_TIMESTAMP")
      .mkString(s"CREATE TABLE $table (\n  ", ",\n  ", "\n)")
  }

  /** K6, ANSI rendering: `INSERT IGNORE` becomes an anti-semi NOT EXISTS —
    * same idempotent dimension fill, portable SQL. */
  def dimensionTableSqlAnsi(dimTable: String, sourceTable: String,
                            keyCol: String, nameCol: String): Seq[String] = Seq(
    s"CREATE TABLE $dimTable ($keyCol VARCHAR(250) PRIMARY KEY, $nameCol VARCHAR(250))",
    s"INSERT INTO $dimTable ($keyCol, $nameCol) " +
      s"SELECT DISTINCT s.$keyCol, s.$nameCol FROM $sourceTable s " +
      s"WHERE NOT EXISTS (SELECT 1 FROM $dimTable d WHERE d.$keyCol = s.$keyCol)")

  /** Executor-side batched upsert: each partition opens one connection and
    * flushes `batchSize`-row addBatch groups (the reference's 100-row
    * chunks, LOADERS/GOLD-data-loader.py:187-190). Requires a JDBC driver
    * on the executor classpath. Dialect picks statement + bind order;
    * the partition streaming itself is dialect-free. */
  def writeJdbcUpsert(df: DataFrame, url: String, table: String,
                      primaryKey: String, props: java.util.Properties,
                      batchSize: Int = 100,
                      dialect: Dialect = MySqlDialect): Unit = {
    val (sql, bindOrder, fallback) = dialect.upsert(table, df.schema, primaryKey)
    df.foreachPartition { rows: Iterator[org.apache.spark.sql.Row] =>
      val conn = java.sql.DriverManager.getConnection(url, props)
      try {
        conn.setAutoCommit(false)
        val st = conn.prepareStatement(sql)
        val fst = fallback.map { case (fsql, _) => conn.prepareStatement(fsql) }
        def bind(ps: java.sql.PreparedStatement, order: Seq[Int],
                 r: org.apache.spark.sql.Row): Unit =
          order.zipWithIndex.foreach { case (ci, pi) => ps.setObject(pi + 1, r.get(ci)) }
        // chunk buffer so the fallback can re-bind exactly the rows whose
        // primary statement affected nothing (two-step dialects)
        val buf = new scala.collection.mutable.ArrayBuffer[org.apache.spark.sql.Row](batchSize)
        def flush(): Unit = if (buf.nonEmpty) {
          val counts = st.executeBatch()
          fst.foreach { s =>
            val forder = fallback.get._2
            var pending = false
            counts.zip(buf).foreach { case (c, r) =>
              if (c == 0) { bind(s, forder, r); s.addBatch(); pending = true }
            }
            if (pending) s.executeBatch()
          }
          conn.commit()
          buf.clear()
        }
        rows.foreach { r =>
          bind(st, bindOrder, r)
          st.addBatch()
          buf += r
          if (buf.size == batchSize) flush()
        }
        flush()
      } finally conn.close()
    }
  }
}
