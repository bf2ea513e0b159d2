package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** Uniform readers/writers over the built-in columnar and text formats.
  *
  * One entry point per direction so scan options live in one place.
  * Format guidance at scale: parquet/orc for curated tables (columnar,
  * predicate pushdown, min/max skipping); JSONL only at the ingest edge
  * (schema-on-read with explicit schema — never inference in pipelines);
  * CSV only for interchange (header + explicit schema; PERMISSIVE with a
  * corrupt-record column, like the tolerant tweet scan).
  *
  * CSV fidelity: whitespace is preserved on BOTH faces (Spark's default
  * ignoreLeading/TrailingWhiteSpace would silently trim on write) and
  * reads are multiLine so quoted embedded newlines round-trip. Known
  * format limit that remains: a written empty string reads back as
  * NULL — CSV cannot distinguish the two; route such columns through a
  * columnar format instead.
  */
object Formats {

  val Columnar: Set[String] = Set("parquet", "orc")
  val Text: Set[String] = Set("json", "csv")

  def read(spark: SparkSession, format: String, path: String,
      schema: Option[StructType] = None): DataFrame = {
    var r = spark.read.format(format)
    schema.foreach(s => r = r.schema(s))
    if (format == "csv") r = r
      .option("header", "true")
      .option("multiLine", "true")
      .option("ignoreLeadingWhiteSpace", "false")
      .option("ignoreTrailingWhiteSpace", "false")
    if (Text(format)) r = r
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt")
    r.load(path)
  }

  def write(df: DataFrame, format: String, path: String,
      partitionBy: Seq[String] = Nil): Unit = {
    var w = df.write.format(format).mode("overwrite")
    if (format == "csv") w = w
      .option("header", "true")
      .option("ignoreLeadingWhiteSpace", "false")
      .option("ignoreTrailingWhiteSpace", "false")
    if (partitionBy.nonEmpty) w = w.partitionBy(partitionBy: _*)
    w.save(path)
  }
}
