package org.apache.parquet.hadoop

import org.apache.parquet.column.ColumnDescriptor
import org.apache.parquet.column.page.DictionaryPage
import org.apache.parquet.hadoop.metadata.BlockMetaData

/** `ParquetFileReader.getDictionaryReader` returns the package-private
  * `DictionaryPageReader`, unnameable outside this package — this shim
  * exposes the one call the SkipScan operator needs (same pattern as
  * Spark's `GraftShims`).
  */
object GraftParquetShims {
  def readDictionaryPage(reader: ParquetFileReader, block: BlockMetaData,
      col: ColumnDescriptor): DictionaryPage =
    reader.getDictionaryReader(block).readDictionaryPage(col)
}
