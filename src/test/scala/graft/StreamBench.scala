package graft

import java.sql.Timestamp

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.streaming.{DedupStream, DriftStream, EventsStream}
import graft.streaming.EventsStream.Event

/** Streaming micro-bench (r19 VERDICT item 6): fixed-batch MemoryStream
  * drives of the streaming operators with rows/s printed as one JSON line,
  * so optimization rounds can SEE streaming regressions — the operators
  * had spec coverage only, no performance number. Measurement harness
  * only: operators and semantics untouched; determinism comes from the
  * sfDir tables and a fixed synthetic event formula.
  *
  * Run: `sbt "Test/runMain graft.StreamBench [nBatches]"` with
  * SPARK_GRAFT_SF_DIR / SPARK_GRAFT_CPUS as for [[graft.Bench]].
  * Timing: wall clock over the fixed batch sequence, processAllAvailable
  * per batch (trigger latency included — that IS the serving cost).
  */
object StreamBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val nBatches = args.headOption.map(_.toInt).getOrElse(8)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val results = scala.collection.mutable.LinkedHashMap[String, (Double, Long)]()
    def record(name: String, rows: Long)(body: => Unit): Unit = {
      spark.sparkContext.setJobDescription(s"streambench:$name")
      val t0 = System.nanoTime()
      body
      results += name -> (((System.nanoTime() - t0) / 1e9, rows))
    }

    // ---- DedupStream.incremental: static corpus LSH index, the corpus's
    // own docs re-keyed as the arriving stream (every doc has >=1 match,
    // so the verify join runs at full load)
    locally {
      val docs = graft.io.Tables.documents(spark, sfDir)
        .select(col("doc_id"), col("text"))
      val (bands, sh) = DedupStream.corpusIndex(docs)
      val idxBands = bands.localCheckpoint() // the deployment's persisted index
      val corpusSh = sh.localCheckpoint()
      val newDocs = docs.as[(Long, String)].collect()
        .map { case (id, t) => (id + 10000000L, t) }
      val chunks = newDocs.grouped(
        math.max(1, newDocs.length / nBatches)).map(_.toIndexedSeq).toSeq
      val input = MemoryStream[(Long, String)]
      val q = DedupStream.incremental(
          input.toDF().toDF("doc_id", "text"), idxBands, corpusSh)
        .writeStream.format("noop").start()
      try record("dedup_stream", newDocs.length.toLong) {
        chunks.foreach { c => input.addData(c); q.processAllAvailable() }
      } finally q.stop()
    }

    // ---- DriftStream.monitorScorecard: static reference histogram, the
    // event table re-played as the stream (KS + PSI + chi2 per batch)
    locally {
      val events = graft.io.Tables.events(spark, sfDir)
        .select(col("event_type"), col("value"))
      val refHist = DriftStream.referenceHistogram(events)
      val replay = events.as[(String, Double)].collect()
      val chunks = replay.grouped(
        math.max(1, replay.length / nBatches)).map(_.toIndexedSeq).toSeq
      val input = MemoryStream[(String, Double)]
      val q = DriftStream.monitorScorecard(
          input.toDF().toDF("event_type", "value"), refHist) { (_, verdict) =>
          verdict.write.format("noop").mode("overwrite").save()
        }.start()
      try record("drift_scorecard", replay.length.toLong) {
        chunks.foreach { c => input.addData(c); q.processAllAvailable() }
      } finally { q.stop(); refHist.unpersist() }
    }

    // ---- EventsStream.hourlyCounts: windowed agg + watermark over a
    // deterministic synthetic stream (64k events, 256 users, 4 types)
    val synth: IndexedSeq[Event] = (0 until 65536).map { i =>
      Event(i.toLong, new Timestamp(1700000000000L + i.toLong * 997),
        (i % 256).toLong, Seq("view", "click", "cart", "purchase")(i % 4),
        (i % 100) / 10.0)
    }
    locally {
      val chunks = synth.grouped(math.max(1, synth.length / nBatches)).toSeq
      val input = MemoryStream[Event]
      val q = EventsStream.hourlyCounts(input.toDF())
        .writeStream.format("noop").outputMode("update").start()
      try record("events_hourly", synth.length.toLong) {
        chunks.foreach { c => input.addData(c); q.processAllAvailable() }
      } finally q.stop()
    }

    // ---- EventsStream.sessionize: flatMapGroupsWithState (explicit
    // session state + event-time timeout) over the same synthetic stream
    locally {
      val chunks = synth.grouped(math.max(1, synth.length / nBatches)).toSeq
      val input = MemoryStream[Event]
      val q = EventsStream.sessionize(input.toDS())
        .writeStream.format("noop").outputMode("append").start()
      try record("events_sessionize", synth.length.toLong) {
        chunks.foreach { c => input.addData(c); q.processAllAvailable() }
      } finally q.stop()
    }

    val ops = results.map { case (k, (sec, rows)) =>
      f""""$k":{"sec":$sec%.3f,"rows":$rows,"rows_per_sec":${rows / sec}%.0f}"""
    }.mkString("{", ",", "}")
    val total = results.values.map(_._1).sum
    println(f"""{"metric":"stream_total","value":$total%.3f,"unit":"sec","sf":"$sfDir","n_batches":$nBatches,"ops":$ops}""")
    spark.stop()
  }
}
