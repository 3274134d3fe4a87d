package graft.streaming

import java.sql.DriverManager
import java.util.Properties

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions.{broadcast, col}
import org.apache.spark.sql.streaming.DataStreamWriter

/** Real-JDBC fidelity for the reference's Derby surfaces: the async/sync
  * per-record lookups (`chapter8/AsyncFunctionExample.scala:103-204`) and
  * the idempotent PK-overwrite sink
  * (`chapter8/IdempotentSinkFunctionExample.scala:72-109`).
  *
  * At scale the per-record lookup becomes a dimension join: `spark.read
  * .jdbc` pulls the (bounded) dim table once per job instead of one query
  * per record, and the broadcast join never shuffles the fact side. The
  * sink keeps the reference's idempotency argument — a keyed overwrite
  * replayed with identical values is a no-op — against a real DBMS over a
  * real JDBC connection, one connection per partition (the reference's
  * `open()`-per-subtask shape).
  */
object Jdbc {

  /** J1/J2 — enrichment from a JDBC dimension table. One `read.jdbc` scan
    * of the dim (pushed to the DBMS), broadcast to every executor: the
    * 100 TB fact side never moves. */
  def enrich(facts: DataFrame, url: String, dimTable: String,
      joinExpr: Column): DataFrame = {
    val dim = facts.sparkSession.read.jdbc(url, dimTable, new Properties())
    facts.join(broadcast(dim), joinExpr)
  }

  /** K3 — idempotent JDBC upsert sink: `foreachBatch` with an
    * UPDATE-else-INSERT per key (Derby's portable upsert; engines with
    * MERGE would use it). Replays re-write identical values — a no-op to
    * any reader, which is the exactly-once-to-the-observer contract. */
  def idempotentJdbcUpsert(df: DataFrame, url: String, table: String,
      keyCols: Seq[String], valCols: Seq[String],
      checkpoint: String): DataStreamWriter[Row] =
    df.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        upsertBatchJdbc(batch, url, table, keyCols, valCols)
      }

  /** The per-batch merge: executors open one connection per partition and
    * upsert their rows in one transaction. Embedded Derby allows many
    * in-JVM connections, so local[n] exercises the same concurrency a
    * cluster would send a DBMS. */
  def upsertBatchJdbc(batch: DataFrame, url: String, table: String,
      keyCols: Seq[String], valCols: Seq[String]): Unit = {
    val cols = keyCols ++ valCols
    batch.select(cols.map(col): _*).foreachPartition { (rows: Iterator[Row]) =>
      if (rows.hasNext) {
        val conn = DriverManager.getConnection(url)
        try {
          conn.setAutoCommit(false)
          val upd = conn.prepareStatement(
            s"UPDATE $table SET ${valCols.map(c => s"$c = ?").mkString(", ")} " +
              s"WHERE ${keyCols.map(c => s"$c = ?").mkString(" AND ")}")
          val ins = conn.prepareStatement(
            s"INSERT INTO $table (${cols.mkString(", ")}) " +
              s"VALUES (${cols.map(_ => "?").mkString(", ")})")
          rows.foreach { r =>
            valCols.indices.foreach(i => upd.setObject(i + 1, r.get(keyCols.size + i)))
            keyCols.indices.foreach(i => upd.setObject(valCols.size + i + 1, r.get(i)))
            if (upd.executeUpdate() == 0) {
              cols.indices.foreach(i => ins.setObject(i + 1, r.get(i)))
              ins.executeUpdate()
            }
          }
          conn.commit()
        } finally conn.close()
      }
    }
  }
}
