package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.Dedup

/** Streaming twin of [[graft.operators.Dedup.minhashIncremental]]: newly
  * ingested documents arrive as a STREAM and probe a STATIC corpus LSH
  * index — the stream-static join, the third join kind in the family
  * (D6 covers stream-stream, the batch operators static-static).
  *
  * Why this is the right shape for continuous ingest at 100 TB: the
  * static side (the persisted band index + shingle sets the batch
  * pipeline maintains) is not streamed and holds NO join state — Spark
  * re-reads/broadcasts it per micro-batch while only the (small) arriving
  * delta flows; no watermark is needed because nothing waits on the
  * static side. Every per-document derivation (tokenize → shingle-hash →
  * signature → band keys) is narrow, so the batch kernels run UNCHANGED
  * on the stream — the same code path the batch gate oracle-checks
  * ([[Dedup.shingleHashedOf]]/[[Dedup.bandsOf]] are shared, and the spec
  * pins stream output == batch [[Dedup.minhashIncremental]]).
  */
object DedupStream {

  /** The persisted index a deployment maintains: (bands, shingle sets) of
    * the corpus partition. Materialize these once per index build — the
    * stream probes them as static tables.
    */
  def corpusIndex(corpusDocs: DataFrame): (DataFrame, DataFrame) = {
    val sh = Dedup.shingleHashedOf(corpusDocs)
    (Dedup.bandsOf(sh), sh)
  }

  /** Probe the static index with a stream of new documents; emit verified
    * near-dup pairs (new_id, corpus_id, jac) in Append mode. `newDocs` is
    * a streaming frame of (doc_id, text); both index frames are static.
    *
    * The candidate `dropDuplicates` is the only stateful operator, and its
    * state holds one key per EMITTED candidate pair — OUTPUT-scale, not
    * ingest-scale (a re-delivered document's pairs are suppressed, giving
    * exactly-once pair emission across micro-batches; spec-pinned). A
    * deployment that tolerates occasional re-emission caps even that with
    * `dropDuplicatesWithinWatermark` on an ingest-time column.
    */
  def incremental(newDocs: DataFrame, idxBands: DataFrame, corpusSh: DataFrame,
      threshold: Double = 0.5): DataFrame = {
    val sh = Dedup.shingleHashedOf(newDocs)
    val cand = Dedup.bandsOf(sh).as("y")
      .join(idxBands.as("x"),
        col("x.bid") === col("y.bid") && col("x.bkey") === col("y.bkey"))
      .select(col("y.doc_id").as("new_id"), col("x.doc_id").as("corpus_id"))
      .dropDuplicates("new_id", "corpus_id")
    cand
      .join(corpusSh.select(col("doc_id").as("corpus_id"), col("h0").as("hc")),
        "corpus_id")
      .join(sh.select(col("doc_id").as("new_id"), col("h0").as("hn")), "new_id")
      .select(col("new_id"), col("corpus_id"),
        round(graft.functions.TextHash.jaccard(col("hc"), col("hn")), 6).as("jac"))
      .where(col("jac") >= threshold)
  }
}
