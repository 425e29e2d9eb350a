package graft.sources

import java.sql.{Connection, DriverManager, PreparedStatement}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types._

/** JDBC source/sink parity with the reference (S1 input / S6 sink in
  * their ORIGINAL transport): the reference reads its work-list from
  * Postgres with a pushed-down SQL query (reference main.py:467-486,
  * engine at database.py:28) and upserts image records with
  * `INSERT … ON CONFLICT DO NOTHING` (main.py:453-457). The repo's
  * Parquet analogs prove the *plan*; this module proves the same plan
  * runs against a real JDBC engine — embedded Derby in tests, any
  * JDBC-compliant store in production.
  *
  * Scale posture:
  *  - `readQuery` ships the WHOLE query text to the database
  *    (`option("query", …)`) — the DB does the join/filter/limit and
  *    Spark reads only the result, exactly the reference's pattern;
  *  - `readTable` + DataFrame filters still push predicates into the
  *    scan (`PushedFilters` on the JDBCRelation — JdbcParitySpec
  *    asserts it), and `partitionColumn` options shard the read;
  *  - `upsert` is executor-side `foreachPartition` with batched
  *    insert-if-absent (the MERGE WHEN-NOT-MATCHED shape): one
  *    connection per partition, rows co-located by key first so a key
  *    is written by exactly one task — N partitions = N parallel
  *    connections, no driver collect, batches flushed every
  *    `BatchSize` rows. Re-running the same upsert publishes nothing
  *    new (the reference's ON CONFLICT DO NOTHING contract), and a
  *    duplicate key inside one batch is also a no-op because each
  *    batched statement sees its predecessors' uncommitted inserts.
  */
object Jdbc {

  private val BatchSize = 500

  /** Whole-query pushdown: the database executes `query`; Spark sees
    * only its result set (reference main.py:467-486 parity). */
  def readQuery(spark: SparkSession, url: String, query: String): DataFrame =
    spark.read.format("jdbc")
      .option("url", url)
      .option("query", query)
      .load()

  /** Table read — predicates/column pruning push into the JDBC scan. */
  def readTable(spark: SparkSession, url: String, table: String): DataFrame =
    spark.read.format("jdbc")
      .option("url", url)
      .option("dbtable", table)
      .load()

  /** Idempotent executor-side upsert: INSERT … only where the key is
    * absent. `dual` is the 1-row system table the engine provides
    * (Derby/DB2: SYSIBM.SYSDUMMY1; Oracle: DUAL; Postgres/MySQL accept
    * a bare SELECT and can pass ""). */
  def upsert(
      df: DataFrame,
      url: String,
      table: String,
      keyCols: Seq[String],
      numPartitions: Int = 0,
      dual: String = "SYSIBM.SYSDUMMY1"): Unit = {
    val schema = df.schema
    val cols = schema.fieldNames.toSeq
    require(keyCols.nonEmpty && keyCols.forall(cols.contains),
      s"key columns ${keyCols.mkString(",")} must exist in ${cols.mkString(",")}")
    def q(n: String) = "\"" + n + "\"" // match Spark's JDBC writer quoting
    val from = if (dual.isEmpty) "" else s" FROM $dual"
    val sql =
      s"""INSERT INTO $table (${cols.map(q).mkString(", ")})
         |SELECT ${cols.map(_ => "?").mkString(", ")}$from
         |WHERE NOT EXISTS (SELECT 1 FROM $table
         |  WHERE ${keyCols.map(k => s"${q(k)} = ?").mkString(" AND ")})""".stripMargin
    val keyIdx = keyCols.map(schema.fieldIndex)
    val types = schema.fields.map(_.dataType)
    // co-locate each key in one task: upserts of the same key never
    // race across connections (the reference leans on a PG unique
    // constraint for this; we make it structural)
    val work =
      if (numPartitions > 0) df.repartition(numPartitions, keyCols.map(col): _*)
      else df.repartition(keyCols.map(col): _*)
    work.rdd.foreachPartition { rows =>
      if (rows.nonEmpty) {
        val conn = DriverManager.getConnection(url)
        try {
          conn.setAutoCommit(false)
          val ps = conn.prepareStatement(sql)
          var pending = 0
          rows.foreach { row =>
            var i = 0
            while (i < cols.length) {
              setParam(ps, i + 1, row.get(i), types(i)); i += 1
            }
            keyIdx.zipWithIndex.foreach { case (ki, j) =>
              setParam(ps, cols.length + j + 1, row.get(ki), types(ki))
            }
            ps.addBatch()
            pending += 1
            if (pending >= BatchSize) { ps.executeBatch(); pending = 0 }
          }
          if (pending > 0) ps.executeBatch()
          conn.commit()
          ps.close()
        } finally conn.close()
      }
    }
  }

  /** Streaming form of the sink — the reference's actual deployment
    * shape (a daily incremental run appending only new images) as a
    * Structured Streaming query: each micro-batch runs the idempotent
    * upsert, so exactly-once comes from idempotence — an epoch
    * replayed after a crash between sink write and checkpoint advance
    * re-runs the same insert-if-absent and publishes nothing. */
  def streamUpsert(
      stream: DataFrame,
      url: String,
      table: String,
      keyCols: Seq[String],
      checkpoint: String): org.apache.spark.sql.streaming.StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        upsert(batch.toDF(), url, table, keyCols)
      }
      .outputMode("append")
      .start()

  private def setParam(ps: PreparedStatement, idx: Int, v: Any, dt: DataType): Unit =
    if (v == null) ps.setNull(idx, sqlTypeOf(dt)) else ps.setObject(idx, v)

  private def sqlTypeOf(dt: DataType): Int = dt match {
    case LongType => java.sql.Types.BIGINT
    case IntegerType => java.sql.Types.INTEGER
    case ShortType => java.sql.Types.SMALLINT
    case DoubleType => java.sql.Types.DOUBLE
    case FloatType => java.sql.Types.FLOAT
    case StringType => java.sql.Types.VARCHAR
    case BooleanType => java.sql.Types.BOOLEAN
    case TimestampType => java.sql.Types.TIMESTAMP
    case DateType => java.sql.Types.DATE
    case _: DecimalType => java.sql.Types.DECIMAL
    case BinaryType => java.sql.Types.VARBINARY
    case other => throw new IllegalArgumentException(s"unsupported JDBC type $other")
  }

  /** Driver-side helper for tests/setup: run DDL/DML on the target. */
  def execute(url: String, statements: Seq[String]): Unit = {
    val conn: Connection = DriverManager.getConnection(url)
    try {
      val st = conn.createStatement()
      statements.foreach(st.execute)
      st.close()
    } finally conn.close()
  }
}
