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

  /** Codecs a JSONL landing zone actually arrives in, by splittability —
    * the property that decides whether 100 TB reads with cluster
    * parallelism or serializes per-file:
    *
    *  - SPLITTABLE: none, bzip2 — any byte range can start a task.
    *  - NOT splittable: gzip, deflate, lz4, snappy (and zstd, the common
    *    crawl-delivery codec) as whole-file codecs — each FILE is one
    *    task, however large. A 100 TB gzip landing zone of 1 GB files
    *    silently caps parallelism at #files and makes every task
    *    decompress a full gigabyte; a single big gzip file reads on ONE
    *    core. Prefer writing whole-file codecs in SMALL files (≤ ~128 MB)
    *    so the per-file task granularity matches a split anyway — that's
    *    the standard crawl-delivery contract (WET ships as many ~150 MB
    *    .gz members for exactly this reason).
    *
    * `write(codec = …)` takes the WRITABLE names below — Spark's JSON
    * writer has no zstd short codec (probed against the shipped 4.1.2
    * jars: bzip2/deflate/gzip/lz4/snappy only), so zstd is read-side
    * only, and only where the Hadoop native zstd codec is installed.
    * `read` needs nothing — Hadoop picks the codec from the file
    * extension (.gz/.bz2/.deflate/.lz4/.snappy, .zst where native).
    */
  val SplittableCodecs = Set("none", "bzip2")
  val WholeFileCodecs = Set("gzip", "deflate", "lz4", "snappy")

  /** `codec`: "none" (default), or any of [[WholeFileCodecs]]/bzip2 —
    * validated here so a typo fails loudly instead of writing an
    * unreadable extension.
    */
  def write(df: DataFrame, dir: String, codec: String = "none"): Unit = {
    require(SplittableCodecs.contains(codec) || WholeFileCodecs.contains(codec),
      s"unknown jsonl codec '$codec' (know: ${(SplittableCodecs ++ WholeFileCodecs).mkString(", ")})")
    val w = df.write.mode("overwrite")
    (if (codec == "none") w else w.option("compression", codec)).json(dir)
  }

  /** Compressed files are transparent to the reader: Hadoop resolves the
    * codec per file from its extension, so one directory can mix plain,
    * .gz and .zst members (a real landing zone does). The quarantine /
    * FAILFAST semantics are byte-identical to the uncompressed path —
    * corruption INSIDE a line quarantines the line; a truncated gzip
    * member fails the task (codec-level corruption is not a row-level
    * event and must not be silently dropped).
    */
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
