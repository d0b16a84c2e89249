package graft.sources

import java.sql.{Connection, DriverManager, PreparedStatement, Types}

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types._

/** Portable operational-store export over plain JDBC — the last
  * reference surface without a twin (reference: src/sqlite/
  * load_sqlite.py:1-200 re-loads the whole gold model into SQLite;
  * src/gold/load_gold.py MERGEs dims/facts into SQL Server via
  * pyodbc): consumers without the lake query the model from a plain
  * relational store, so the engine must be able to hand results over.
  *
  * Semantics: [[mergeByKey]] is the idempotent MERGE-on-grain write
  * (the B8 `gold_merge_grain` contract against an external target) —
  * re-running the same frame leaves the table identical, a changed
  * row updates in place, a new grain inserts. Implemented as the
  * portable UPDATE-then-INSERT upsert (batched; rows whose batched
  * UPDATE matched zero rows INSERT) because vendor MERGE source
  * syntax is not portable (Derby restricts the USING source; SQLite
  * has none) while parameterized UPDATE/INSERT is universal.
  * [[overwrite]] is the load_sqlite full-reload shape: DELETE +
  * re-insert inside the same table (keeps consumer views/grants).
  *
  * Scale shape: executors write THEIR OWN partitions in parallel
  * (`foreachPartition`, one connection + statement batches per
  * partition — the standard JDBC fan-in); the driver only creates the
  * table. The input must be GRAIN-UNIQUE on `keyCols` (enforced — a
  * duplicate-grain frame would make the upsert order-dependent),
  * which also means no two partitions ever contend on one key. An
  * operational target throttles by connection count = input
  * partitions; repartition the frame to the store's write capacity,
  * not the cluster's core count.
  *
  * Determinism/idempotence over speed: this is an EXPORT tier, not a
  * query path — correctness gates (spec) pin round-trip equality,
  * merge-update visibility, and re-run idempotence against embedded
  * Derby (the JDK-only stand-in for the reference's SQL Server).
  */
object JdbcExport {

  /** ANSI-ish DDL type for a Spark column (the portable subset the
    * gold model uses; nested types are an export-contract error).
    */
  private[sources] def sqlType(dt: DataType): String = dt match {
    case LongType                 => "BIGINT"
    case IntegerType              => "INTEGER"
    case ShortType                => "SMALLINT"
    case ByteType                 => "SMALLINT"
    case DoubleType               => "DOUBLE"
    case FloatType                => "REAL"
    case BooleanType              => "BOOLEAN"
    case DateType                 => "DATE"
    case TimestampType            => "TIMESTAMP"
    case d: DecimalType           => s"DECIMAL(${d.precision},${d.scale})"
    case StringType               => "VARCHAR(4000)"
    case other =>
      throw new IllegalArgumentException(
        s"jdbc export does not map type $other — export a flat gold projection")
  }

  private def withConnection[A](url: String)(f: Connection => A): A = {
    val conn = DriverManager.getConnection(url)
    try f(conn) finally conn.close()
  }

  /** CREATE TABLE if absent (idempotent — existence probed through
    * database metadata, no exception-driven control flow).
    */
  def ensureTable(url: String, table: String, schema: StructType): Unit =
    withConnection(url) { conn =>
      val meta = conn.getMetaData
      // unquoted identifiers fold per-store (Derby/Oracle upper,
      // Postgres lower) — probe every folding, not just upper-case,
      // or a second run would CREATE over an existing table
      val exists = Seq(table, table.toUpperCase, table.toLowerCase)
        .distinct.exists { t =>
          val rs = meta.getTables(null, null, t, null)
          val hit = rs.next(); rs.close(); hit
        }
      if (!exists) {
        val cols = schema.fields
          .map(f => s"${f.name} ${sqlType(f.dataType)}").mkString(", ")
        val st = conn.createStatement()
        try st.executeUpdate(s"CREATE TABLE $table ($cols)")
        finally st.close()
      }
    }

  /** Bind row value i (0-based field index) to statement slot `slot`
    * (1-based), with explicit NULL typing (Derby rejects untyped
    * nulls in batched parameters).
    */
  private def bind(st: PreparedStatement, slot: Int, row: Row, i: Int,
                   dt: DataType): Unit =
    if (row.isNullAt(i)) st.setNull(slot, dt match {
      case LongType => Types.BIGINT
      case IntegerType => Types.INTEGER
      case ShortType | ByteType => Types.SMALLINT
      case DoubleType => Types.DOUBLE
      case FloatType => Types.REAL
      case BooleanType => Types.BOOLEAN
      case DateType => Types.DATE
      case TimestampType => Types.TIMESTAMP
      case _: DecimalType => Types.DECIMAL
      case _ => Types.VARCHAR
    })
    else dt match {
      case LongType        => st.setLong(slot, row.getLong(i))
      case IntegerType     => st.setInt(slot, row.getInt(i))
      case ShortType       => st.setShort(slot, row.getShort(i))
      case ByteType        => st.setShort(slot, row.getByte(i).toShort)
      case DoubleType      => st.setDouble(slot, row.getDouble(i))
      case FloatType       => st.setFloat(slot, row.getFloat(i))
      case BooleanType     => st.setBoolean(slot, row.getBoolean(i))
      case DateType        => st.setDate(slot, row.getDate(i))
      case TimestampType   => st.setTimestamp(slot, row.getTimestamp(i))
      case _: DecimalType  => st.setBigDecimal(slot, row.getDecimal(i))
      case StringType      => st.setString(slot, row.getString(i))
      case other =>
        throw new IllegalArgumentException(s"unbindable type $other")
    }

  /** Row-at-a-time exact-count recovery for SUCCESS_NO_INFO drivers:
    * rebind and executeUpdate each row of the chunk individually —
    * per-row counts are always exact, and re-running the (already
    * batch-applied) UPDATE is idempotent. Factored out so the spec
    * can drive it against a real Derby statement.
    */
  private[graft] def reprobeCounts(chunk: Seq[Row], upd: PreparedStatement,
                                   bindRow: (PreparedStatement, Row) => Unit): Array[Int] =
    chunk.map { row => bindRow(upd, row); upd.executeUpdate() }.toArray

  /** Idempotent MERGE-on-grain export: update matched grains, insert
    * new ones. Returns (updated, inserted) totals.
    *
    * Keys-only tables (every column part of the grain — bridge/junk
    * exports) are supported: the "update" leg degrades to a no-op
    * self-assignment (`SET k = k`) whose match count is the grain
    * probe, so present grains count as `updated` (no-op touch) and
    * absent ones insert — MERGE's WHEN-MATCHED-THEN-DO-NOTHING shape
    * without vendor MERGE syntax.
    *
    * Drivers returning SUCCESS_NO_INFO batch counts (Oracle, MySQL in
    * rewrite mode) fall back per CHUNK to row-at-a-time UPDATEs to
    * recover exact match counts: the batched UPDATE has already
    * applied, but re-running it row-by-row is idempotent (same SET,
    * same keys), and per-row executeUpdate always reports exactly.
    * The fallback costs one round-trip per row on affected chunks —
    * correctness over speed, this is an export tier.
    *
    * Count caveat under task retry: chunks commit individually, so a
    * retried task finds its earlier chunks already committed — rows
    * counted as inserts on the failed attempt re-count as updates on
    * the retry. Table STATE stays correct (the upsert is idempotent);
    * the (updated, inserted) totals are best-effort under retry.
    */
  def mergeByKey(df: DataFrame, url: String, table: String,
                 keyCols: Seq[String], batchSize: Int = 500): (Long, Long) = {
    val schema = df.schema
    val cols = schema.fields.map(_.name).toSeq
    require(keyCols.nonEmpty && keyCols.forall(cols.contains),
      s"keyCols $keyCols must be non-empty columns of $cols")
    val valCols = cols.filterNot(keyCols.contains)
    // grain contract: a duplicate key would make update/insert order
    // matter — refuse rather than export nondeterministically
    val dupes = df.groupBy(keyCols.map(df.col): _*).count()
      .filter(org.apache.spark.sql.functions.col("count") > 1).limit(1).count()
    require(dupes == 0L, s"input is not grain-unique on $keyCols")
    ensureTable(url, table, schema)
    // keys-only grain: no SET-table values exist, so probe grain
    // presence with a portable no-op self-assignment instead
    val setClause =
      if (valCols.nonEmpty) valCols.map(c => s"$c = ?").mkString(", ")
      else s"${keyCols.head} = ${keyCols.head}"
    val updateSql = s"UPDATE $table SET " + setClause +
      " WHERE " + keyCols.map(c => s"$c = ?").mkString(" AND ")
    val insertSql = s"INSERT INTO $table (${cols.mkString(", ")}) VALUES (" +
      cols.map(_ => "?").mkString(", ") + ")"
    val fieldIdx = cols.zipWithIndex.toMap
    val types = schema.fields.map(_.dataType)
    val acc = df.sparkSession.sparkContext.longAccumulator("jdbc_updated")
    val accIns = df.sparkSession.sparkContext.longAccumulator("jdbc_inserted")
    df.foreachPartition { (it: Iterator[Row]) =>
      if (it.nonEmpty) {
        val conn = DriverManager.getConnection(url)
        try {
          conn.setAutoCommit(false)
          val upd = conn.prepareStatement(updateSql)
          val ins = conn.prepareStatement(insertSql)
          try {
            it.grouped(batchSize).foreach { chunk =>
              chunk.foreach { row =>
                var slot = 1
                valCols.foreach { c =>
                  val i = fieldIdx(c); bind(upd, slot, row, i, types(i)); slot += 1
                }
                keyCols.foreach { c =>
                  val i = fieldIdx(c); bind(upd, slot, row, i, types(i)); slot += 1
                }
                upd.addBatch()
              }
              val batchCounts = upd.executeBatch()
              // miss detection needs EXACT counts: a driver returning
              // SUCCESS_NO_INFO (-2; Oracle, MySQL rewrite mode)
              // cannot distinguish update-hit from miss — re-probe the
              // chunk row-at-a-time (idempotent re-UPDATE, exact
              // per-row counts) instead of dropping new grains or
              // refusing outright
              val counts =
                if (!batchCounts.exists(_ == java.sql.Statement.SUCCESS_NO_INFO))
                  batchCounts
                else reprobeCounts(chunk, upd, (st, row) => {
                  var slot = 1
                  valCols.foreach { c =>
                    val i = fieldIdx(c); bind(st, slot, row, i, types(i)); slot += 1
                  }
                  keyCols.foreach { c =>
                    val i = fieldIdx(c); bind(st, slot, row, i, types(i)); slot += 1
                  }
                })
              val misses = chunk.zip(counts).collect { case (r, 0) => r }
              misses.foreach { row =>
                cols.zipWithIndex.foreach { case (c, slot0) =>
                  val i = fieldIdx(c); bind(ins, slot0 + 1, row, i, types(i))
                }
                ins.addBatch()
              }
              if (misses.nonEmpty) ins.executeBatch()
              conn.commit()
              acc.add(counts.count(_ > 0).toLong)
              accIns.add(misses.size.toLong)
            }
          } finally { upd.close(); ins.close() }
        } finally conn.close()
      }
    }
    (acc.value, accIns.value)
  }

  /** Full-reload export (the load_sqlite shape): DELETE + insert
    * inside the existing table so consumer views keep working.
    * Returns rows written.
    *
    * Retry safety: each partition commits ONCE at its end (a task
    * that dies mid-stream rolls its whole partition back, so Spark's
    * task retry re-inserts from zero instead of duplicating the
    * already-committed chunks — the hazard of per-chunk commits under
    * a plain keyless INSERT; [[mergeByKey]] keeps per-chunk commits
    * because the upsert is idempotent under retry by construction).
    * RESIDUAL duplicate window: a task that commits and then dies
    * before reporting success re-runs and re-inserts its partition,
    * and a speculative twin can commit alongside the original — the
    * keyless INSERT has no idempotence backstop against either. Run
    * this path with speculation OFF (`spark.speculation=false`, the
    * default) and treat a post-commit task failure as a re-export
    * trigger; exports needing airtight exactly-once should go through
    * [[mergeByKey]] on a grain instead.
    * Spark's own JDBC writer covers the plain truncate-overwrite
    * shape too; this path exists for symmetry with [[mergeByKey]]'s
    * schema mapping (ensureTable creates with OUR ANSI type map, not
    * the dialect's) and single-commit-per-partition contract.
    */
  def overwrite(df: DataFrame, url: String, table: String,
                batchSize: Int = 500): Long = {
    val schema = df.schema
    val cols = schema.fields.map(_.name).toSeq
    ensureTable(url, table, schema)
    withConnection(url) { conn =>
      val st = conn.createStatement()
      try st.executeUpdate(s"DELETE FROM $table") finally st.close()
    }
    val insertSql = s"INSERT INTO $table (${cols.mkString(", ")}) VALUES (" +
      cols.map(_ => "?").mkString(", ") + ")"
    val types = schema.fields.map(_.dataType)
    val acc = df.sparkSession.sparkContext.longAccumulator("jdbc_written")
    df.foreachPartition { (it: Iterator[Row]) =>
      if (it.nonEmpty) {
        val conn = DriverManager.getConnection(url)
        try {
          conn.setAutoCommit(false)
          val ins = conn.prepareStatement(insertSql)
          try {
            var written = 0L
            it.grouped(batchSize).foreach { chunk =>
              chunk.foreach { row =>
                types.indices.foreach(i => bind(ins, i + 1, row, i, types(i)))
                ins.addBatch()
              }
              ins.executeBatch()
              written += chunk.size
            }
            conn.commit() // once per partition — see retry-safety note
            acc.add(written)
          } finally ins.close()
        } finally conn.close()
      }
    }
    acc.value
  }
}
