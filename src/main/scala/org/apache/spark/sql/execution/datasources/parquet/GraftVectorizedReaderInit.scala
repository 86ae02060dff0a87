package org.apache.spark.sql.execution.datasources.parquet

import org.apache.parquet.column.page.PageReadStore
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.schema.MessageType

/** Package-located bridge to [[VectorizedParquetRecordReader]]'s
  * footer-reuse `initialize` overload. The overload itself is public,
  * but its `ParquetRowGroupReader` parameter type is package-private to
  * `o.a.s.sql.execution.datasources.parquet`, so the wrapper that turns
  * an already-open [[ParquetFileReader]] into the reader's row-group
  * source must live here.
  *
  * This is what lets the graft streaming partition reader open ONE
  * footer per file: the same `ParquetFileReader` serves the
  * present-columns/row-count probe AND the vectorized read, instead of
  * `initialize(path, columns)` re-opening and re-parsing the footer.
  * Closing the vectorized reader closes the wrapped file reader.
  */
object GraftVectorizedReaderInit {

  /** The Spark types the vectorized reader will PRODUCE for a requested
    * parquet projection — the same converter `initialize` applies.
    * Callers that up-cast row-side (type widening over old files) need
    * the produced type, not the render type. */
  def sparkSchemaOf(requestedSchema: MessageType): org.apache.spark.sql.types.StructType =
    // default-flag converter (binary-as-string / int96 off, like the
    // footer-reuse initialize's own internal config); the Configuration
    // overload requires SQLConf keys a bare hadoop conf doesn't carry
    new ParquetToSparkSchemaConverter().convert(requestedSchema)

  def withFooter(reader: VectorizedParquetRecordReader,
      fileSchema: MessageType, requestedSchema: MessageType,
      file: ParquetFileReader, totalRowCount: Long): Unit = {
    // Loud cap, not a real limit: the engine's own writes bin-pack to
    // ~128 MB files ([[graft.store.TableStore.compact]]) — row counts
    // sit orders of magnitude under 2^31. A foreign >2B-row file fails
    // here (the caller closes the handle) rather than overflowing.
    require(totalRowCount <= Int.MaxValue,
      s"file row count $totalRowCount exceeds a single reader's range")
    reader.initialize(fileSchema, requestedSchema,
      new SpecificParquetRecordReaderBase.ParquetRowGroupReader {
        override def readNextRowGroup(): PageReadStore = file.readNextRowGroup()
        override def close(): Unit = file.close()
      },
      totalRowCount.toInt)
  }
}
