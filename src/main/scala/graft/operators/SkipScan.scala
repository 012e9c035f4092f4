package graft.operators

import scala.jdk.CollectionConverters._

import org.apache.hadoop.fs.Path
import org.apache.parquet.column.Dictionary
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.util.SerializableConfiguration

/** SkipScan — DISTINCT without scanning the data
  * (`tsl/src/nodes/skip_scan/README.md`: remember the last value, re-seek
  * the index for the next greater one; `u·log(k)` for u distinct values in
  * k rows).
  *
  * The columnar translation: a parquet DICTIONARY PAGE already is the
  * per-row-group distinct-value list, and the footer's `EncodingStats` says
  * whether every data page of a column chunk was dictionary-encoded. When
  * they all are, the union of dictionary pages IS the exact distinct set —
  * read u values per row group instead of k rows (the same u ≪ k asymmetry
  * the reference's index re-seek exploits). Row groups with any
  * plain-encoded page (dictionary fallback mid-write, high cardinality)
  * make their FILE fall back to a normal distinct scan — exactness never
  * depends on the encoding.
  *
  * Dictionary pages are read on the EXECUTORS (one task per file batch);
  * only distinct values reach the driver — bounded by u × files, the same
  * driver budget as any collected DISTINCT result. NULLs never enter
  * dictionaries; footer null counts restore them.
  */
object SkipScan {

  /** Exact `SELECT DISTINCT column FROM parquet(path)`, dictionary-first.
    * Supported dictionary types: binary/string, int32/64 (incl. timestamp
    * micros), float/double; anything else scans.
    */
  def distinct(spark: SparkSession, path: String, column: String): DataFrame = {
    val sparkType = spark.read.parquet(path).schema(column).dataType
    val files = listParquetFiles(spark, path)
    val conf = new SerializableConfiguration(spark.sparkContext.hadoopConfiguration)
    // (values from dictionary-complete files, sawNull, fallback files)
    val perFile: Seq[(Seq[Any], Boolean, Option[String])] = spark.sparkContext
      .parallelize(files, math.max(1, math.min(files.size, 64)))
      .map(f => readFileDictionaries(conf.value, f, column))
      .collect().toSeq
    val dictValues = perFile.flatMap(_._1).distinct
    val sawNull = perFile.exists(_._2)
    val fallbackFiles = perFile.flatMap(_._3)

    val fromDict = toDf(spark, dictValues, sawNull, column, sparkType)
    if (fallbackFiles.isEmpty) fromDict.distinct()
    else fromDict.unionByName(
      spark.read.parquet(fallbackFiles: _*).select(col(column))).distinct()
  }

  /** One file's contribution: (dictionary values, sawNull, fallbackFile). */
  private def readFileDictionaries(conf: org.apache.hadoop.conf.Configuration,
      file: String, column: String): (Seq[Any], Boolean, Option[String]) = {
    val reader = ParquetFileReader.open(HadoopInputFile.fromPath(new Path(file), conf))
    try {
      val schema = reader.getFooter.getFileMetaData.getSchema
      val colDesc = schema.getColumns.asScala
        .find(_.getPath.mkString(".") == column)
        .getOrElse(return (Nil, false, Some(file)))
      val blocks = reader.getFooter.getBlocks.asScala
      val chunks = blocks.map(_.getColumns.asScala
        .find(_.getPath.toDotString == column).getOrElse(return (Nil, false, Some(file))))
      val dictComplete = chunks.forall { c =>
        val es = c.getEncodingStats
        es != null && es.hasDictionaryPages && !es.hasNonDictionaryEncodedPages
      }
      val supported = Set(PrimitiveTypeName.BINARY, PrimitiveTypeName.INT32,
        PrimitiveTypeName.INT64, PrimitiveTypeName.FLOAT, PrimitiveTypeName.DOUBLE)
        .contains(colDesc.getPrimitiveType.getPrimitiveTypeName)
      if (!dictComplete || !supported) return (Nil, false, Some(file))

      val sawNull = chunks.exists(c =>
        c.getStatistics != null && c.getStatistics.getNumNulls > 0)
      val values = blocks.flatMap { b =>
        val page = org.apache.parquet.hadoop.GraftParquetShims
          .readDictionaryPage(reader, b, colDesc)
        val dict: Dictionary = page.getEncoding.initDictionary(colDesc, page)
        (0 to dict.getMaxId).map { i =>
          colDesc.getPrimitiveType.getPrimitiveTypeName match {
            case PrimitiveTypeName.BINARY => dict.decodeToBinary(i).toStringUsingUTF8
            case PrimitiveTypeName.INT32  => dict.decodeToInt(i)
            case PrimitiveTypeName.INT64  => dict.decodeToLong(i)
            case PrimitiveTypeName.FLOAT  => dict.decodeToFloat(i)
            case PrimitiveTypeName.DOUBLE => dict.decodeToDouble(i)
            case other => throw new IllegalStateException(s"unreachable: $other")
          }
        }
      }
      (values.distinct.toSeq, sawNull, None)
    } finally reader.close()
  }

  /** Raw dictionary values → a one-column DataFrame in the column's SPARK
    * type (timestamps arrive as int64 micros).
    */
  private def toDf(spark: SparkSession, values: Seq[Any], sawNull: Boolean,
      column: String, sparkType: DataType): DataFrame = {
    val converted: Seq[Any] = sparkType match {
      case TimestampType | TimestampNTZType =>
        values.map(v => java.time.Instant.EPOCH.plusNanos(v.asInstanceOf[Long] * 1000L))
          .map(java.sql.Timestamp.from)
      case _ => values
    }
    val all = if (sawNull) converted :+ null else converted
    spark.createDataFrame(
      all.map(v => Row(v)).asJava,
      StructType(Seq(StructField(column, sparkType, nullable = true))))
  }

  private def listParquetFiles(spark: SparkSession, path: String): Seq[String] = {
    val p = new Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    def walk(dir: Path): Seq[String] =
      fs.listStatus(dir).toSeq.flatMap { s =>
        if (s.isDirectory) walk(s.getPath)
        else if (s.getPath.getName.endsWith(".parquet")) Seq(s.getPath.toString)
        else Nil
      }
    if (fs.getFileStatus(p).isFile) Seq(path) else walk(p)
  }
}
