package graft.streaming

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.parquet.example.data.simple.convert.GroupRecordConverter
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.parquet.io.ColumnIOFactory

import scala.jdk.CollectionConverters._

/** The dashboard side of [[Sinks.queryableSnapshot]] — the reference's
  * out-of-process `QueryableStateClient` (`chapter7/QueryableState.scala:
  * 56-115`) polls operator state over the network; here the state handoff
  * is a self-describing parquet snapshot, and this client reads it with the
  * BARE parquet-hadoop reader: no SparkSession, no shared driver, nothing
  * in common with the producing query's process beyond the directory. A
  * separate JVM (or a Python/DuckDB dashboard) runs this verbatim.
  */
object SnapshotClient {

  /** Read every row of the current snapshot as (columnName → rendered
    * value) maps. Transient misses during the producer's rename swap are
    * expected — callers poll. */
  def read(dir: String): Seq[Map[String, String]] =
    readWith(dir) { (schema, g) =>
      schema.getFields.asScala.zipWithIndex.map { case (fld, idx) =>
        fld.getName -> g.getValueToString(idx, 0)
      }.toMap
    }

  /** Read every row with parquet-TYPED values — INT64→Long, INT32→Int,
    * DOUBLE→Double, FLOAT→Float, BOOLEAN→Boolean, everything else (UTF8,
    * decimals, nested) rendered as String. A field that is null in a row
    * is omitted from that row's map. Dashboards comparing thresholds or
    * summing aggregates use this form; [[read]] keeps the stringly
    * rendering for display. */
  def readTyped(dir: String): Seq[Map[String, Any]] =
    readWith(dir) { (schema, g) =>
      import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName._
      schema.getFields.asScala.zipWithIndex.flatMap { case (fld, idx) =>
        if (g.getFieldRepetitionCount(idx) == 0) None // null field
        else {
          val v: Any =
            if (!fld.isPrimitive) g.getValueToString(idx, 0)
            else fld.asPrimitiveType().getPrimitiveTypeName match {
              case INT64 => g.getLong(idx, 0)
              case INT32 => g.getInteger(idx, 0)
              case DOUBLE => g.getDouble(idx, 0)
              case FLOAT => g.getFloat(idx, 0)
              case BOOLEAN => g.getBoolean(idx, 0)
              case _ => g.getValueToString(idx, 0)
            }
          Some(fld.getName -> v)
        }
      }.toMap
    }

  private def readWith[T](dir: String)(
      row: (org.apache.parquet.schema.MessageType,
        org.apache.parquet.example.data.Group) => T): Seq[T] = {
    val files = Option(new java.io.File(dir).listFiles()).getOrElse(Array.empty)
      .filter(_.getName.endsWith(".parquet"))
    files.toSeq.flatMap { f =>
      val reader = ParquetFileReader.open(
        HadoopInputFile.fromPath(new Path(f.getPath), new Configuration()))
      try {
        val schema = reader.getFooter.getFileMetaData.getSchema
        val rows = Seq.newBuilder[T]
        var pages = reader.readNextRowGroup()
        while (pages != null) {
          val recordReader = new ColumnIOFactory().getColumnIO(schema)
            .getRecordReader(pages, new GroupRecordConverter(schema))
          var i = 0L
          while (i < pages.getRowCount) {
            rows += row(schema, recordReader.read())
            i += 1
          }
          pages = reader.readNextRowGroup()
        }
        rows.result()
      } finally reader.close()
    }
  }

  /** Poll until `pred` holds on a successful read (rename-swap gaps and
    * not-yet-written snapshots retry), or fail after `timeoutMs`. */
  def poll(dir: String, timeoutMs: Long = 30000L)(
      pred: Seq[Map[String, String]] => Boolean): Seq[Map[String, String]] = {
    val deadline = System.currentTimeMillis() + timeoutMs
    var last: Seq[Map[String, String]] = Nil
    while (System.currentTimeMillis() < deadline) {
      val snap = try read(dir) catch { case _: Exception => Nil }
      if (snap.nonEmpty && pred(snap)) return snap
      last = snap
      Thread.sleep(100)
    }
    sys.error(s"snapshot at $dir never satisfied predicate; last read: $last")
  }
}
