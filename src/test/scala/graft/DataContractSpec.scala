package graft

import graft.io.Tables
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, TimestampType}

/** Guards the shape of the driver-generated input tables as the LOADERS
  * expose them — not as the parquet files store them. The r9 lesson: the
  * driver regenerated events.parquet with `ts` as TIMESTAMP(MICROS) while
  * `Tables.events` still assumed BIGINT epoch nanos, silently collapsing
  * every event timestamp onto 1970-01-20 and failing 12 driver-gate queries
  * that were green in-repo. The oracle (DuckDB) reads the file natively, so
  * any unit/type drift the loader mishandles shows up only at the driver
  * gate — unless a spec pins the post-load values to a sane window here.
  */
class DataContractSpec extends GraftSuite {

  test("events loader yields TimestampType ts in a sane epoch window") {
    val ev = Tables.events(spark, sf)
    assert(ev.schema("ts").dataType == TimestampType,
      s"ts must load as TimestampType, got ${ev.schema("ts").dataType}")
    val r = ev.agg(
      min(year(col("ts"))).as("y_min"),
      max(year(col("ts"))).as("y_max"),
      countDistinct(to_date(col("ts"))).as("days")).head()
    val (yMin, yMax, days) = (r.getInt(0), r.getInt(1), r.getLong(2))
    // A unit error is never subtle: nanos-read-as-micros lands in 1970,
    // micros-read-as-nanos lands past year 500000. Any sane generation of
    // this table is modern-era with multi-day span.
    assert(yMin >= 2000 && yMax <= 2100,
      s"event timestamps outside [2000, 2100]: years [$yMin, $yMax] — " +
        "loader is misreading the parquet timestamp unit")
    assert(days > 1, s"all events collapse onto $days day(s) — unit bug")
  }

  test("events loader preserves row count and key columns") {
    val ev = Tables.events(spark, sf)
    assert(ev.schema("user_id").dataType == LongType)
    assert(ev.schema("event_type").dataType == StringType)
    assert(ev.count() > 0)
  }

  test("nanos-typed events file takes the BIGINT fallback and converts exactly") {
    // Fabricate a TIMESTAMP(NANOS) events.parquet with parquet-java (Spark
    // cannot write NANOS), then load through Tables.events: the footer
    // sniff must route to the BIGINT-epoch-nanos path and produce the
    // exact micros instants. This pins the fallback path in-repo — the
    // driver's current data is MICROS, so nothing else exercises it.
    import org.apache.parquet.schema.{LogicalTypeAnnotation, PrimitiveType, Types}
    import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName._
    import org.apache.parquet.example.data.simple.SimpleGroupFactory
    import org.apache.parquet.hadoop.example.ExampleParquetWriter
    import org.apache.parquet.io.api.Binary
    val schema = Types.buildMessage()
      .required(INT64).named("event_id")
      .required(INT64)
      .as(LogicalTypeAnnotation.timestampType(false, LogicalTypeAnnotation.TimeUnit.NANOS))
      .named("ts")
      .required(INT64).named("user_id")
      .required(BINARY).as(LogicalTypeAnnotation.stringType()).named("event_type")
      .required(DOUBLE).named("value")
      .required(BINARY).as(LogicalTypeAnnotation.stringType()).named("props")
      .named("events")
    val dir = java.nio.file.Files.createTempDirectory("graft-nanos").toString
    val file = new org.apache.hadoop.fs.Path(s"$dir/events.parquet")
    val fac = new SimpleGroupFactory(schema)
    val w = ExampleParquetWriter.builder(
        org.apache.parquet.hadoop.util.HadoopOutputFile.fromPath(
          file, spark.sparkContext.hadoopConfiguration))
      .withType(schema).build()
    // 2024-03-01T00:00:00Z = 1709251200 s; add 1.5 ms so sub-second
    // micros survive the div-1000 conversion
    val baseNanos = 1709251200L * 1000000000L + 1500000L
    (0 until 3).foreach { i =>
      val g = fac.newGroup()
      g.append("event_id", i.toLong)
      g.append("ts", baseNanos + i * 1000000000L)
      g.append("user_id", 7L)
      g.append("event_type", Binary.fromString("click"))
      g.append("value", 1.0)
      g.append("props", Binary.fromString("{}"))
      w.write(g)
    }
    w.close()
    val ev = Tables.events(spark, dir)
    assert(ev.schema("ts").dataType == TimestampType)
    val got = ev.orderBy(col("event_id"))
      .select(date_format(col("ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS"))
      .collect().map(_.getString(0)).toSeq
    assert(got == Seq(
      "2024-03-01 00:00:00.001500",
      "2024-03-01 00:00:01.001500",
      "2024-03-01 00:00:02.001500"), s"got $got")
  }

  test("documents/embeddings loaders expose the shapes every operator assumes") {
    val docs = Tables.documents(spark, sf)
    assert(docs.schema("doc_id").dataType == LongType)
    assert(docs.schema("text").dataType == StringType)
    val d = docs.agg(
      count(lit(1)).as("n"),
      countDistinct(col("doc_id")).as("n_ids"),
      sum(when(col("text").isNull, 1L).otherwise(0L)).as("null_texts"),
      countDistinct(col("lang")).as("langs")).head()
    assert(d.getLong(0) == d.getLong(1), "doc_id must be unique — dedup keys rely on it")
    assert(d.getLong(2) == 0L, "null text would NPE the tokenizer kernels")
    assert(d.getLong(3) >= 2, "lang must be multi-valued — the DSIR/NB target split needs it")
    val emb = Tables.embeddings(spark, sf)
    val e = emb.agg(
      count(lit(1)).as("n"),
      countDistinct(col("vec_id")).as("n_ids"),
      countDistinct(size(col("embedding"))).as("dims"),
      min(size(col("embedding"))).as("dim")).head()
    assert(e.getLong(0) == e.getLong(1), "vec_id must be unique")
    assert(e.getLong(2) == 1L && e.getInt(3) == 64,
      s"embeddings must be uniformly 64-dim — the ANN codebooks assume it " +
        s"(got ${e.getLong(2)} distinct dims, min ${e.getInt(3)})")
    // seed-codebook convention: vec_ids 0..31 exist (IVF seeds 0..15,
    // residual PQ seeds 16..31)
    val seeds = emb.where(col("vec_id") < 32).count()
    assert(seeds == 32, s"seed vec_ids 0..31 must exist, got $seeds")
  }

  test("loader ts agrees with the raw parquet footer min/max epoch") {
    // Read the same file with NO loader logic (plain inference if possible)
    // and compare min/max epochs — catches a loader that shifts or scales.
    val path = s"$sf/events.parquet"
    val raw = scala.util.Try(spark.read.parquet(path)).toOption
    raw.foreach { df =>
      val rawMinMax = df
        .select(col("ts").cast(TimestampType).as("ts"))
        .agg(min(unix_timestamp(col("ts"))), max(unix_timestamp(col("ts"))))
        .head()
      val loaded = Tables.events(spark, sf)
        .agg(min(unix_timestamp(col("ts"))), max(unix_timestamp(col("ts"))))
        .head()
      assert(loaded.getLong(0) == rawMinMax.getLong(0) &&
        loaded.getLong(1) == rawMinMax.getLong(1),
        s"loader shifts the epoch: raw [${rawMinMax.getLong(0)}, ${rawMinMax.getLong(1)}] " +
          s"vs loaded [${loaded.getLong(0)}, ${loaded.getLong(1)}]")
    }
  }
}
