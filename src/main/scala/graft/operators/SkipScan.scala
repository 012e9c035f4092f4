package graft.operators

import scala.jdk.CollectionConverters._

import org.apache.hadoop.fs.Path
import org.apache.parquet.column.{ColumnDescriptor, Dictionary}
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.parquet.schema.LogicalTypeAnnotation
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
  * the reference's index re-seek exploits).
  *
  * Exactness gates — a FILE falls back to a normal distinct scan when any
  * of them fails; results never depend on the encoding:
  *  - every data page of every row group dictionary-encoded (EncodingStats);
  *  - the (parquet physical + logical annotation, Spark type) pair has an
  *    exact value conversion (plain int32/int64/float/double, UTF8 binary,
  *    micros timestamps) — DATE/DECIMAL/millis-timestamps/etc. scan;
  *  - null counts present in the footer (`isNumNullsSet`) — dictionaries
  *    never hold NULL, so an unknown null count would silently drop it.
  *
  * Dictionary pages are read on the EXECUTORS (one task per file batch);
  * only distinct values reach the driver — bounded by u × files, the same
  * driver budget as any collected DISTINCT result.
  */
object SkipScan {

  /** Exact `SELECT DISTINCT column FROM parquet(path)`, dictionary-first. */
  def distinct(spark: SparkSession, path: String, column: String): DataFrame = {
    val fullSchema = spark.read.parquet(path).schema
    val sparkType = fullSchema(column).dataType
    val files = Stats.listParquetFiles(spark, path)
    val conf = new SerializableConfiguration(spark.sparkContext.hadoopConfiguration)
    // (values from dictionary-complete files, sawNull, fallback file)
    val perFile: Seq[(Seq[Any], Boolean, Option[String])] = spark.sparkContext
      .parallelize(files, math.max(1, math.min(files.size, 64)))
      .map(f => readFileDictionaries(conf.value, f, column, sparkType))
      .collect().toSeq
    val dictValues = perFile.flatMap(_._1).distinct
    val sawNull = perFile.exists(_._2)
    val fallbackFiles = perFile.flatMap(_._3)

    val all = if (sawNull) dictValues :+ null else dictValues
    val fromDict = spark.createDataFrame(
      all.map(v => Row(v)).asJava,
      StructType(Seq(StructField(column, sparkType, nullable = true))))
    if (fallbackFiles.isEmpty) fromDict.distinct()
    else {
      // basePath must be a DIRECTORY: a single-FILE table (flat fixture
      // parquet) whose row groups fall back anchors at its parent dir —
      // same partition derivation (none for a flat file), no resolution
      // error
      val p = new org.apache.hadoop.fs.Path(path)
      val base =
        if (p.getFileSystem(spark.sparkContext.hadoopConfiguration)
            .getFileStatus(p).isDirectory) path
        else p.getParent.toString
      fromDict.unionByName(
        // basePath + explicit schema: a PARTITION column (in no file's
        // physical schema — every file falls back) is re-derived from the
        // paths, and a schema-evolved column missing from old files
        // null-fills instead of failing resolution
        spark.read.option("basePath", base).schema(fullSchema)
          .parquet(fallbackFiles: _*).select(col(column))).distinct()
    }
  }

  /** Driver-local exact distinct of an INTEGRAL column over a small file
    * set, via dictionary pages: Some(values) iff in every file the column
    * is a plain int32/int64, every data page of every row group is
    * dictionary-encoded, and the footer proves zero nulls. One
    * footer+dictionary-page read per file (~1 ms each) — callers probing a
    * handful of freshly appended files (the segmentwise-recompress key
    * probe) use this under a file-count gate instead of paying a scheduled
    * Spark job's fixed cost for the same answer. Any gate failing → None
    * and the caller runs the distributed distinct: results never depend on
    * the encoding.
    */
  private[graft] def localIntegralDistinct(
      conf: org.apache.hadoop.conf.Configuration,
      files: Seq[String], column: String): Option[Seq[Any]] = {
    val out = Seq.newBuilder[Any]
    for (f <- files) {
      val reader = ParquetFileReader.open(HadoopInputFile.fromPath(new Path(f), conf))
      try {
        val schema = reader.getFooter.getFileMetaData.getSchema
        val colDesc = schema.getColumns.asScala
          .find(_.getPath.mkString(".") == column).getOrElse(return None)
        val st = colDesc.getPrimitiveType.getPrimitiveTypeName match {
          case PrimitiveTypeName.INT64 => LongType
          case PrimitiveTypeName.INT32 => IntegerType
          case _ => return None
        }
        val decode = decoderFor(colDesc, st).getOrElse(return None)
        val blocks = reader.getFooter.getBlocks.asScala
        val chunks = blocks.map(_.getColumns.asScala
          .find(_.getPath.toDotString == column).getOrElse(return None))
        val exact = chunks.forall { c =>
          val es = c.getEncodingStats
          es != null && es.hasDictionaryPages && !es.hasNonDictionaryEncodedPages &&
            c.getStatistics != null && c.getStatistics.isNumNullsSet &&
            c.getStatistics.getNumNulls == 0
        }
        if (!exact) return None
        blocks.foreach { b =>
          val page = org.apache.parquet.hadoop.GraftParquetShims
            .readDictionaryPage(reader, b, colDesc)
          val dict: Dictionary = page.getEncoding.initDictionary(colDesc, page)
          val d = decode(dict)
          (0 to dict.getMaxId).foreach(i => out += d(i))
        }
      } finally reader.close()
    }
    Some(out.result().distinct)
  }

  /** Exact dictionary→Spark-external-value conversion for the column, or
    * None when the (physical type, annotation, Spark type) combination has
    * no lossless mapping (→ scan fallback).
    */
  private def decoderFor(colDesc: ColumnDescriptor,
      sparkType: DataType): Option[Dictionary => Int => Any] = {
    val pt = colDesc.getPrimitiveType
    val ann = pt.getLogicalTypeAnnotation
    def plainInt(bits: Int): Boolean = ann match {
      case null => true
      case i: LogicalTypeAnnotation.IntLogicalTypeAnnotation =>
        i.getBitWidth == bits && i.isSigned
      case _ => false
    }
    (pt.getPrimitiveTypeName, sparkType) match {
      case (PrimitiveTypeName.BINARY, StringType)
          if ann.isInstanceOf[LogicalTypeAnnotation.StringLogicalTypeAnnotation] =>
        Some(d => i => d.decodeToBinary(i).toStringUsingUTF8)
      case (PrimitiveTypeName.INT32, IntegerType) if plainInt(32) =>
        Some(d => i => d.decodeToInt(i))
      case (PrimitiveTypeName.INT64, LongType) if plainInt(64) =>
        Some(d => i => d.decodeToLong(i))
      case (PrimitiveTypeName.FLOAT, FloatType) if ann == null =>
        Some(d => i => d.decodeToFloat(i))
      case (PrimitiveTypeName.DOUBLE, DoubleType) if ann == null =>
        Some(d => i => d.decodeToDouble(i))
      case (PrimitiveTypeName.INT64, TimestampType) => ann match {
        case t: LogicalTypeAnnotation.TimestampLogicalTypeAnnotation
            if t.getUnit == LogicalTypeAnnotation.TimeUnit.MICROS && t.isAdjustedToUTC =>
          Some(d => i => {
            // micros*1000 would overflow Long past ~2262; split sec/nanos
            val us = d.decodeToLong(i)
            java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(
              java.lang.Math.floorDiv(us, 1000000L),
              java.lang.Math.floorMod(us, 1000000L) * 1000L))
          })
        case _ => None // millis/nanos or NTZ: scan instead of guessing units
      }
      case _ => None
    }
  }

  /** One file's contribution: (dictionary values, sawNull, fallbackFile). */
  private def readFileDictionaries(conf: org.apache.hadoop.conf.Configuration,
      file: String, column: String,
      sparkType: DataType): (Seq[Any], Boolean, Option[String]) = {
    val reader = ParquetFileReader.open(HadoopInputFile.fromPath(new Path(file), conf))
    try {
      val schema = reader.getFooter.getFileMetaData.getSchema
      val colDesc = schema.getColumns.asScala
        .find(_.getPath.mkString(".") == column)
        .getOrElse(return (Nil, false, Some(file)))
      val decode = decoderFor(colDesc, sparkType)
        .getOrElse(return (Nil, false, Some(file)))
      val blocks = reader.getFooter.getBlocks.asScala
      val chunks = blocks.map(_.getColumns.asScala
        .find(_.getPath.toDotString == column).getOrElse(return (Nil, false, Some(file))))
      val exact = chunks.forall { c =>
        val es = c.getEncodingStats
        es != null && es.hasDictionaryPages && !es.hasNonDictionaryEncodedPages &&
          c.getStatistics != null && c.getStatistics.isNumNullsSet
      }
      if (!exact) return (Nil, false, Some(file))

      val sawNull = chunks.exists(_.getStatistics.getNumNulls > 0)
      val values = blocks.flatMap { b =>
        val page = org.apache.parquet.hadoop.GraftParquetShims
          .readDictionaryPage(reader, b, colDesc)
        val dict: Dictionary = page.getEncoding.initDictionary(colDesc, page)
        val d = decode(dict)
        (0 to dict.getMaxId).map(d)
      }
      (values.distinct.toSeq, sawNull, None)
    } finally reader.close()
  }
}
