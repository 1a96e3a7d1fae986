package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Text/CSV tuple sources & sinks with Pangool's tokenizer semantics.
  *
  * Mirrors TupleTextInputFormat + NullableCSVTokenizer +
  * FixedWidthCSVTokenizer (reference:
  * tuplemr/mapred/lib/input/TupleTextInputFormat.java,
  * NullableCSVTokenizer.java, FixedWidthCSVTokenizer.java) and
  * TupleTextOutputFormat. Delegates to Spark's csv reader (predicate
  * pushdown, schema enforcement, codegen'd parsing) instead of a hand
  * tokenizer; fixed-width is a substring projection over `text` — narrow
  * and codegen'd.
  */
object TextTupleSource {

  /** CSV with explicit schema, custom separator/quote/escape and a null
    * marker (Pangool's NullableCSVTokenizer `nullString`).
    */
  def csv(spark: SparkSession, path: String, schema: StructType,
      sep: Char = ',', quote: Char = '"', escape: Char = '\\',
      nullString: String = "\\N", header: Boolean = false): DataFrame =
    spark.read
      .schema(schema)
      .option("sep", sep.toString)
      .option("quote", quote.toString)
      .option("escape", escape.toString)
      .option("nullValue", nullString)
      .option("header", header)
      .csv(path)

  /** Fixed-width fields: (name, startInclusive, endExclusive) byte offsets,
    * 0-based (FixedWidthCSVTokenizer semantics). `trim` collapses padding;
    * nullString cells become NULL.
    */
  def fixedWidth(spark: SparkSession, path: String,
      fields: Seq[(String, Int, Int)], nullString: String = "",
      trimValues: Boolean = true): DataFrame = {
    val raw = spark.read.text(path)
    val cols = fields.map { case (name, start, end) =>
      val c0 = substring(col("value"), start + 1, end - start)
      val c1 = if (trimValues) trim(c0) else c0
      when(c1 === nullString, lit(null)).otherwise(c1).as(name)
    }
    raw.select(cols: _*)
  }

  /** TupleTextOutputFormat: write csv with the same dialect knobs. */
  def writeCsv(df: DataFrame, path: String, sep: Char = ',',
      nullString: String = "\\N", header: Boolean = false): Unit =
    df.write.mode("overwrite")
      .option("sep", sep.toString)
      .option("nullValue", nullString)
      .option("header", header)
      .csv(path)
}
