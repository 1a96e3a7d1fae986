package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** JSON Lines source/sink (SURVEY.md §2 B12) — the interchange format raw
  * web/crawl corpora actually arrive in (one JSON object per line; WET/CC
  * derivatives, vendor dumps, annotation exports). The reference covered
  * this need with its pluggable text input formats
  * (core/.../tuplemr/mapred/lib/input/TupleTextInputFormat.java); Spark's
  * native json reader/writer is the idiomatic replacement — splittable,
  * codegen'd parsing, full pushdown of column pruning into the parse.
  *
  * Read takes an EXPLICIT schema: schema inference is a whole extra pass
  * over 100 TB, and inferred types drift (ints widen, date-ish strings
  * guess) — a pipeline contract wants the declared schema or a loud
  * error. `columnNameOfCorruptRecord` riding PERMISSIVE mode is the
  * standard quarantine pattern at scale; `strict=true` turns it into
  * FAILFAST for pipelines that would rather die than drop.
  */
object JsonLines {

  def write(df: DataFrame, dir: String): Unit =
    df.write.mode("overwrite").json(dir)

  def read(spark: SparkSession, dir: String, schema: StructType,
      strict: Boolean = false): DataFrame =
    spark.read
      .schema(schema)
      .option("mode", if (strict) "FAILFAST" else "PERMISSIVE")
      .json(dir)

  /** B12 as a driver-visible query: documents → JSONL under the session
    * warehouse → read back through the declared schema → per-doc content
    * digest. The oracle computes the same digests straight off the
    * parquet table, so a hash-match IS a proof the round-trip preserved
    * every byte of every column (md5 over text, raw values for the rest).
    * Fixed per-dir target + overwrite keeps repeated calls (bench
    * iterations) from accumulating copies.
    */
  def roundtripDocs(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val out = new org.apache.hadoop.fs.Path(
      spark.conf.get("spark.sql.warehouse.dir"),
      s"g_jsonl_docs_${Layout.dirTag(dir)}").toString
    write(docs, out)
    read(spark, out, docs.schema, strict = true)
      .select(col("doc_id"), md5(col("text")).as("text_md5"),
        col("lang"), col("source"), col("n_chars"))
  }
}
