package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.streaming.DedupStream

/** Dev probe for the r20 StreamBench finding: ~5–10 s PER TRIGGER in
  * DedupStream.incremental at sf0.1. Variants run INTERLEAVED round-robin
  * (fresh query per rep, best-of-N per variant) so ambient host swings
  * can't masquerade as a difference:
  *   asis     — index frames localCheckpoint'd as-is (the StreamBench shape)
  *   preparte — index frames repartitioned on their join keys first
  *              (localCheckpoint preserves outputPartitioning, so the
  *              per-trigger join should only shuffle the batch side)
  * Run: sbt "Test/runMain graft.DedupStreamProbe [sfDir] [reps]".
  */
object DedupStreamProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(1).map(_.toInt).getOrElse(4)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val docs = graft.io.Tables.documents(spark, dir).select(col("doc_id"), col("text"))
    val (bands, sh) = DedupStream.corpusIndex(docs)
    val asisB = bands.localCheckpoint()
    val asisS = sh.localCheckpoint()
    val preB = bands.repartition(col("bid"), col("bkey"))
      .sortWithinPartitions(col("bid"), col("bkey")).localCheckpoint()
    val preS = sh.repartition(col("doc_id"))
      .sortWithinPartitions(col("doc_id")).localCheckpoint()
    val newDocs = docs.as[(Long, String)].collect()
      .map { case (id, tx) => (id + 10000000L, tx) }
    val chunks = newDocs.grouped(math.max(1, newDocs.length / 2))
      .map(_.toIndexedSeq).toSeq

    def onePass(b: org.apache.spark.sql.DataFrame,
        s: org.apache.spark.sql.DataFrame): (Double, Long) = {
      val in = MemoryStream[(Long, String)]
      val q = DedupStream.incremental(in.toDF().toDF("doc_id", "text"), b, s)
        .writeStream.format("noop").start()
      var n = 0L
      val t0 = System.nanoTime()
      try chunks.foreach { c => in.addData(c); q.processAllAvailable(); n += c.length }
      finally q.stop()
      ((System.nanoTime() - t0) / 1e9, n)
    }

    val best = scala.collection.mutable.Map[String, Double]()
    // one throwaway pass to warm streaming machinery/codegen
    onePass(asisB, asisS)
    for (r <- 1 to reps; (name, b, s) <- Seq(
        ("asis", asisB, asisS), ("preparte", preB, preS))) {
      val (sec, n) = onePass(b, s)
      println(f"[probe] rep $r $name%-9s ${sec}%6.2f s  ($n docs)")
      best(name) = math.min(best.getOrElse(name, Double.MaxValue), sec)
    }
    best.toSeq.sortBy(_._1).foreach { case (k, v) =>
      println(f"[probe] BEST $k%-9s $v%6.2f s")
    }
    spark.stop()
  }
}
