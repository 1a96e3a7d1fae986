package graft

import java.nio.file.Files

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.io.{AvroSource, GSchema, MultiSink, TextTupleSource}

class IoSpec extends GraftSuite {

  private def tmp(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  test("GSchema.parse mirrors Pangool Fields.parse incl. nullable marker") {
    val s = GSchema.parse("a:int, b:string?, c:double, d:bytes")
    assert(s.fieldNames.toSeq == Seq("a", "b", "c", "d"))
    assert(s("b").nullable && !s("a").nullable)
    assert(s("d").dataType.typeName == "binary")
  }

  test("csv reader honors quotes, escapes and nullString (NullableCSVTokenizer)") {
    val dir = tmp("csv")
    Files.writeString(java.nio.file.Paths.get(dir, "data.csv"),
      "1,\"hello, world\",2.5\n2,\\N,3.5\n3,\"esc\\\"aped\",\\N\n")
    val df = TextTupleSource.csv(spark, dir, GSchema.parse("id:int, s:string?, v:double?"))
    val rows = df.orderBy("id").collect()
    assert(rows(0).getString(1) == "hello, world")
    assert(rows(1).isNullAt(1))
    assert(rows(2).getString(1) == "esc\"aped")
    assert(rows(2).isNullAt(2))
  }

  test("fixed-width reader slices byte ranges (FixedWidthCSVTokenizer)") {
    val dir = tmp("fw")
    Files.writeString(java.nio.file.Paths.get(dir, "data.txt"),
      "0001alice   NY\n0002bob     SF\n0003        LA\n")
    val df = TextTupleSource.fixedWidth(spark, dir,
      Seq(("id", 0, 4), ("name", 4, 12), ("city", 12, 14)))
    val rows = df.orderBy("id").collect()
    assert(rows(0).getString(1) == "alice" && rows(0).getString(2) == "NY")
    assert(rows(1).getString(1) == "bob")
    assert(rows(2).isNullAt(1)) // all-padding becomes null via nullString=""
  }

  test("avro round-trip preserves the Pangool primitive type set") {
    val dir = tmp("avro") + "/out"
    val df = spark.createDataFrame(Seq(
      (1, 10L, 1.5f, 2.5, true, "x", Array[Byte](1, 2)),
      (2, 20L, 3.5f, 4.5, false, "y", Array[Byte](3))
    )).toDF("i", "l", "f", "d", "b", "s", "bin")
    AvroSource.write(df, dir)
    val back = AvroSource.read(spark, dir, df.schema).orderBy("i").collect()
    assert(back.length == 2)
    assert(back(0).getInt(0) == 1 && back(0).getLong(1) == 10L)
    assert(back(0).getString(5) == "x")
    assert(back(0).getAs[Array[Byte]](6).toSeq == Seq[Byte](1, 2))
    assert(back(1).getBoolean(4) == false)
  }

  test("GSchema mutators: aliases rename, subset prunes, superset appends") {
    val base = io.Tables.part(spark, sf) // also covers the one unqueried table
    assert(base.count() > 0)
    val aliased = GSchema.withAliases(base, Map("p_name" -> "part_name"))
    assert(aliased.columns.contains("part_name") && !aliased.columns.contains("p_name"))
    val sub = GSchema.subset(aliased, "p_partkey", "part_name")
    assert(sub.columns.toSeq == Seq("p_partkey", "part_name"))
    val sup = GSchema.superset(sub, "key_sq" -> (col("p_partkey") * col("p_partkey")))
    assert(sup.columns.toSeq == Seq("p_partkey", "part_name", "key_sq"))
    assert(sup.where(col("key_sq") =!= col("p_partkey") * col("p_partkey")).count() == 0)
    // the generic loader is the same path the named loaders delegate to
    assert(io.Tables.load(spark, sf, "part").count() == base.count())
  }

  test("writeCsv round-trips the dialect knobs (TupleTextOutputFormat)") {
    val dir = tmp("wcsv") + "/out"
    val df = spark.createDataFrame(Seq((1, Some("a;b"), Some(2.5)), (2, None, None)))
      .toDF("id", "s", "v")
    TextTupleSource.writeCsv(df, dir, sep = ';')
    val back = TextTupleSource.csv(spark, dir,
      GSchema.parse("id:int, s:string?, v:double?"), sep = ';').orderBy("id").collect()
    assert(back(0).getString(1) == "a;b" && back(0).getDouble(2) == 2.5)
    assert(back(1).isNullAt(1) && back(1).isNullAt(2)) // \N marker round-trips
  }

  test("byLabel routes labels to heterogeneous formats (per-named-output formats)") {
    val base = tmp("bylabel") + "/out"
    val df = io.Tables.events(spark, sf).select("event_id", "event_type", "user_id")
    MultiSink.byLabel(df, "event_type", base,
      Map("click" -> "parquet", "view" -> "json"))
    val click = spark.read.parquet(s"$base/click").count()
    val view = spark.read.json(s"$base/view").count()
    assert(click == df.where(col("event_type") === "click").count() && click > 0)
    assert(view == df.where(col("event_type") === "view").count() && view > 0)
  }

  test("toAvroSchema maps the Pangool primitive set to nullable Avro unions") {
    val avro = AvroSource.toAvroSchema(
      GSchema.parse("i:int, l:long, s:string?, bin:bytes"))
    assert(avro.getType.toString == "RECORD")
    assert(avro.getFields.size() == 4)
    // nullable marker → union [null, string]
    val sField = avro.getField("s").schema()
    assert(sField.getType.toString == "UNION" &&
      sField.getTypes.toString.contains("string"))
  }

  test("jsonl round-trip preserves quotes, newlines, unicode, nulls and ints") {
    import spark.implicits._
    val rows = Seq(
      (1L, "plain text", Some(42)),
      (2L, "quo\"tes and \\back\\slashes", Some(-7)),
      (3L, "embedded\nnewline\tand tab", None),
      (4L, "unicode: café 中文 😀", Some(0)),
      (5L, null.asInstanceOf[String], Some(9)))
    val df = rows.toDF("id", "text", "n")
    val dir = tmp("jsonl") + "/t"
    graft.io.JsonLines.write(df, dir)
    val back = graft.io.JsonLines.read(spark, dir, df.schema, strict = true)
    assert(back.count() == rows.length,
      "escaped newlines must keep one JSON object per line")
    val a = df.collect().map(_.toString).sorted
    val b = back.collect().map(_.toString).sorted
    assert(a.sameElements(b), s"round-trip must be lossless:\n${a.mkString("\n")}\nvs\n${b.mkString("\n")}")
  }

  test("jsonl corrupt line: PERMISSIVE quarantines to nulls, strict FAILFAST dies") {
    import spark.implicits._
    val dir = tmp("jsonl-bad")
    val df = Seq((1L, "ok")).toDF("id", "text")
    graft.io.JsonLines.write(df, dir + "/t")
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(dir, "t", "part-bad.json"), "{not json at all\n")
    val permissive = graft.io.JsonLines.read(spark, dir + "/t", df.schema)
    assert(permissive.count() == 2 && permissive.where(col("id").isNull).count() == 1,
      "PERMISSIVE must surface the corrupt record as a null row, not drop it")
    intercept[Exception] {
      graft.io.JsonLines.read(spark, dir + "/t", df.schema, strict = true).count()
    }
  }

  test("cpuFanOut fans an under-split scan to core count and leaves parallel frames alone") {
    val docs = graft.io.Tables.load(spark, sf, "documents") // raw, un-fanned
    val cores = spark.sparkContext.defaultParallelism
    assert(docs.rdd.getNumPartitions < cores,
      "precondition: the artifact is a single-row-group file")
    val fanned = graft.io.Tables.cpuFanOut(docs)
    assert(fanned.rdd.getNumPartitions == cores,
      "under-split input must fan out to one partition per core")
    // already-parallel input: the fan-out must be a no-op (same plan)
    val wide = docs.repartition(cores * 2)
    assert(graft.io.Tables.cpuFanOut(wide) eq wide,
      "an input with enough partitions must pass through untouched")
    // values unchanged
    assert(fanned.count() == docs.count())
  }

  test("jsonl compressed round-trip: gzip and bzip2 are lossless; a mixed dir reads transparently") {
    import spark.implicits._
    val rows = Seq((1L, "plain", Some(1)), (2L, "café 中文", None),
      (3L, "quo\"te\nline", Some(-3)))
    val df = rows.toDF("id", "text", "n")
    val base = tmp("jsonl-codec")
    // EVERY writable codec round-trips — the r16b review found the old
    // whitelist advertised zstd, which Spark's JSON writer can't produce
    // (no short codec in the 4.1.2 jars): the whitelist must contain
    // exactly what works, and this loop keeps it honest
    val exts = Map("gzip" -> ".gz", "bzip2" -> ".bz2", "deflate" -> ".deflate",
      "lz4" -> ".lz4", "snappy" -> ".snappy")
    val writable = graft.io.JsonLines.SplittableCodecs ++
      graft.io.JsonLines.WholeFileCodecs - "none"
    assert(writable == exts.keySet, s"whitelist drifted: $writable")
    for (codec <- writable.toSeq.sorted) {
      val dir = s"$base/$codec"
      graft.io.JsonLines.write(df, dir, codec)
      assert(new java.io.File(dir).listFiles().exists(_.getName.endsWith(exts(codec))),
        s"$codec files must carry the extension the reader's codec sniff needs")
      val back = graft.io.JsonLines.read(spark, dir, df.schema, strict = true)
      assert(back.collect().map(_.toString).sorted
        .sameElements(df.collect().map(_.toString).sorted), s"$codec round-trip lost data")
    }
    intercept[IllegalArgumentException] {
      graft.io.JsonLines.write(df, s"$base/zstd", "zstd") // read-side-only codec
    }
    // a landing zone can mix plain and compressed members in one directory
    // (the gzip write may split rows over several part files — copy all)
    graft.io.JsonLines.write(df.where(col("id") === 1), s"$base/mixed")
    new java.io.File(s"$base/gzip").listFiles()
      .filter(_.getName.endsWith(".gz")).zipWithIndex.foreach { case (gz, i) =>
        java.nio.file.Files.copy(gz.toPath,
          java.nio.file.Paths.get(s"$base/mixed", s"extra$i.json.gz"))
      }
    val mixed = graft.io.JsonLines.read(spark, s"$base/mixed", df.schema)
    assert(mixed.count() == 1 + rows.length, "plain + .gz members must both parse")
    intercept[IllegalArgumentException] {
      graft.io.JsonLines.write(df, s"$base/typo", "gzp")
    }
  }

  test("jsonl compressed corrupt line quarantines exactly like the plain path") {
    import spark.implicits._
    val dir = tmp("jsonl-codec-bad")
    val df = Seq((1L, "ok")).toDF("id", "text")
    graft.io.JsonLines.write(df, dir + "/t", "gzip")
    // a corrupt LINE inside a valid gzip member: row-level quarantine
    val bad = new java.io.ByteArrayOutputStream()
    val gz = new java.util.zip.GZIPOutputStream(bad)
    gz.write("{broken json line\n".getBytes("UTF-8")); gz.close()
    java.nio.file.Files.write(
      java.nio.file.Paths.get(dir, "t", "part-bad.json.gz"), bad.toByteArray)
    val permissive = graft.io.JsonLines.read(spark, dir + "/t", df.schema)
    assert(permissive.count() == 2 && permissive.where(col("id").isNull).count() == 1,
      "PERMISSIVE must quarantine the in-line corruption inside the gzip member")
    intercept[Exception] {
      graft.io.JsonLines.read(spark, dir + "/t", df.schema, strict = true).count()
    }
  }

  test("roundtripDocs digests match the parquet source (losslessness, the oracle's check)") {
    val got = graft.io.JsonLines.roundtripDocs(spark, sf)
      .orderBy("doc_id").collect().map(_.toString)
    val want = graft.io.Tables.documents(spark, sf)
      .select(col("doc_id"), md5(col("text")).as("text_md5"),
        col("lang"), col("source"), col("n_chars"))
      .orderBy("doc_id").collect().map(_.toString)
    assert(got.sameElements(want))
  }

  test("multi-sink writes one partition dir per label in a single pass") {
    val base = tmp("msink") + "/out"
    val df = io.Tables.events(spark, sf).select("event_id", "event_type", "user_id")
    MultiSink.partitionByLabel(df, "event_type", base)
    val labels = new java.io.File(base).listFiles().filter(_.isDirectory).map(_.getName).sorted
    assert(labels.count(_.startsWith("event_type=")) == 5)
    val click = spark.read.parquet(base).where(col("event_type") === "click").count()
    val expected = df.where(col("event_type") === "click").count()
    assert(click == expected)
  }
}
