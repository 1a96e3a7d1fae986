package graft

import org.apache.spark.sql.functions._

import graft.operators.{Ann, AnnIndex}

/** The serving façade must reproduce the oracle-checked registered queries
  * when given the same query batch — build/search composition adds no
  * semantics, only the materialize-once index lifetime.
  */
class AnnIndexSpec extends GraftSuite {

  private def registeredQueries = Ann.normed(spark, sf)
    .where(col("vec_id") < 20)
    .select(col("vec_id").as("query_id"), col("e").as("qe"))

  private def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
    .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3))).toSet

  test("lsh index search == q_ann_lsh on the registered query batch") {
    val idx = AnnIndex.build(spark, sf, "lsh")
    assert(rows(idx.search(registeredQueries, 5))
      == rows(SparkEntry.queries("q_ann_lsh")(spark, sf)))
  }

  test("lsh search(multiProbe) == q_ann_multiprobe; stored layout untouched") {
    val idx = AnnIndex.build(spark, sf, "lsh")
    assert(rows(idx.search(registeredQueries, 5, multiProbe = true))
      == rows(SparkEntry.queries("q_ann_multiprobe")(spark, sf)))
    // probing is query-side only: the same handle still answers
    // single-probe searches identically
    assert(rows(idx.search(registeredQueries, 5))
      == rows(SparkEntry.queries("q_ann_lsh")(spark, sf)))
  }

  test("ivf index search == q_ann_ivf on the registered query batch") {
    val idx = AnnIndex.build(spark, sf, "ivf", iters = 0)
    assert(rows(idx.search(registeredQueries, 5))
      == rows(SparkEntry.queries("q_ann_ivf")(spark, sf)))
  }

  test("ivfpq index search == q_ann_ivfpq_res on the registered query batch") {
    val idx = AnnIndex.build(spark, sf, "ivfpq")
    val got = idx.search(registeredQueries, 5).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3))).toSet
    val want = SparkEntry.queries("q_ann_ivfpq_res")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3))).toSet
    assert(got == want)
  }

  test("search answers a batch of EXTERNAL vectors (not corpus rows)") {
    import spark.implicits._
    val idx = AnnIndex.build(spark, sf, "ivf", iters = 0)
    // a query vector that is no corpus row: the centroid-0 seed nudged
    val ext = Ann.normed(spark, sf).where(col("vec_id") === 0)
      .select(col("e")).as[Seq[Double]].head().map(_ * 0.9 + 0.01)
    val got = idx.search(Seq((-1L, ext)).toDF("query_id", "qe"), 3).collect()
    assert(got.length == 3)
    assert(got.map(_.getInt(1)).toSeq == Seq(1, 2, 3))
    // neighbors of a near-copy of vector 0 should include vector 0 itself
    assert(got.map(_.getLong(2)).contains(0L))
  }

  test("pq index search == q_ann_pq on the registered query batch") {
    val idx = AnnIndex.build(spark, sf, "pq", iters = 0)
    val got = idx.search(registeredQueries, 5).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3))).toSet
    val want = SparkEntry.queries("q_ann_pq")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3))).toSet
    assert(got == want)
  }

  test("external ids colliding with corpus vec_ids keep their neighbors via excludeSelf=false") {
    import spark.implicits._
    val idx = AnnIndex.build(spark, sf, "ivf", iters = 0)
    // external vector near corpus row 0, but its batch id ALSO happens to
    // be 0 — the corpus-row self-exclusion must not eat the true neighbor
    val ext = Ann.normed(spark, sf).where(col("vec_id") === 0)
      .select(col("e")).as[Seq[Double]].head().map(_ * 0.9 + 0.01)
    val batch = Seq((0L, ext)).toDF("query_id", "qe")
    val kept = idx.search(batch, 3, excludeSelf = false).collect().map(_.getLong(2))
    assert(kept.contains(0L), "true nearest neighbor survives the id collision")
    val dropped = idx.search(batch, 3).collect().map(_.getLong(2))
    assert(!dropped.contains(0L), "default self-exclusion is for corpus-row batches")
  }

  test("an index built once serves two query batches without re-reading the corpus") {
    import spark.implicits._
    val idx = AnnIndex.build(spark, sf, "ivf", iters = 0)
    val e0 = Ann.normed(spark, sf).where(col("vec_id") === 0)
      .select(col("e")).as[Seq[Double]].head()
    val e5 = Ann.normed(spark, sf).where(col("vec_id") === 5)
      .select(col("e")).as[Seq[Double]].head()
    val b1 = Seq((-1L, e0.map(_ * 0.9 + 0.01))).toDF("query_id", "qe")
    val b2 = Seq((-2L, e5.map(_ * 1.1 - 0.01))).toDF("query_id", "qe")
    val r1 = idx.search(b1, 3)
    val r2 = idx.search(b2, 3)
    // the build-once contract at 100 TB: after build, no search plan may
    // touch the source files again — the checkpointed corpus serves both
    for (r <- Seq(r1, r2)) {
      val plan = r.queryExecution.executedPlan.toString
      assert(!plan.contains("Scan parquet") && !plan.contains("FileScan"),
        s"search must not re-read the corpus:\n$plan")
    }
    assert(r1.collect().map(_.getLong(2)).contains(0L))
    assert(r2.collect().map(_.getLong(2)).contains(5L))
  }

  test("save/load round-trips all five layouts with bit-identical searches") {
    for (method <- Seq("lsh", "ivf", "pq", "ivfpq", "ivfpq_res_refined")) {
      val iters = if (method == "ivf" || method == "pq") 0 else 2
      val built = AnnIndex.build(spark, sf, method, iters = iters)
      val expect = built.search(registeredQueries, 5).collect().map(_.toSeq).toSet
      val dir = java.nio.file.Files.createTempDirectory(s"annidx-$method").toString
      AnnIndex.save(built, dir)
      val loaded = AnnIndex.load(spark, dir)
      assert(loaded.method == method && loaded.nprobe == built.nprobe)
      val got = loaded.search(registeredQueries, 5).collect().map(_.toSeq).toSet
      assert(got == expect, s"$method: loaded index diverges")
      assert(got.nonEmpty)
    }
  }

  test("ivfpq_res_refined index search == topKResidualRefined on the registered batch") {
    val idx = AnnIndex.build(spark, sf, "ivfpq_res_refined", iters = 2)
    val got = idx.search(registeredQueries, 5).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3))).toSet
    val want = graft.operators.IvfPq.topKResidualRefined(spark, sf, nQueries = 20, k = 5)
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3))).toSet
    assert(got == want && got.nonEmpty)
  }

  test("re-saving a different method into a used path leaves no stale artifacts") {
    val dir = java.nio.file.Files.createTempDirectory("annidx-restate").toString
    AnnIndex.save(AnnIndex.build(spark, sf, "ivfpq"), dir)
    assert(new java.io.File(s"$dir/centroids.parquet").exists())
    AnnIndex.save(AnnIndex.build(spark, sf, "lsh"), dir)
    // the ivfpq model artifacts must be GONE, not a misleading leftover mix
    for (stale <- Seq("centroids", "seeds", "rescen"))
      assert(!new java.io.File(s"$dir/$stale.parquet").exists(), s"stale $stale survived re-save")
    assert(AnnIndex.load(spark, dir).method == "lsh")
  }

  test("save refuses to destroy a non-empty directory that is not an index") {
    val dir = java.nio.file.Files.createTempDirectory("annidx-notanidx")
    val bystander = dir.resolve("precious.txt")
    java.nio.file.Files.write(bystander, "not an index".getBytes)
    val e = intercept[IllegalArgumentException](
      AnnIndex.save(AnnIndex.build(spark, sf, "lsh"), dir.toString))
    assert(e.getMessage.contains(dir.toString) && e.getMessage.contains("meta.parquet"))
    // and the typo'd target survives untouched
    assert(java.nio.file.Files.exists(bystander))
  }

  test("refined search accepts an int-typed external query_id") {
    import spark.implicits._
    val idx = AnnIndex.build(spark, sf, "ivfpq_res_refined", iters = 1)
    val ext = Ann.normed(spark, sf).where(col("vec_id") === 0)
      .select(col("e")).as[Seq[Double]].head().map(_ * 0.9 + 0.01)
    // IntegerType id — the driver-side collect must cast, not ClassCast
    val got = idx.search(Seq((7, ext)).toDF("query_id", "qe"), 3,
      excludeSelf = false).collect()
    assert(got.length == 3 && got.forall(_.getLong(0) == 7L))
  }

  test("append(batch) == the batch's rows in a full rebuild, all five layouts") {
    // The frozen-model contract: with the model seeds (vec_id 0..31) in the
    // base corpus and deterministic seed codebooks (iters=0), buildOn(base)
    // trains the SAME model as buildOn(full) — so append's frozen-model
    // encode of the remainder must reproduce the full rebuild's search
    // results bit-for-bit (the C2c/D10 incremental-dedup precedent).
    val raw = graft.io.Tables.embeddings(spark, sf)
    val base = raw.where(col("vec_id") < 250)
    val batch = raw.where(col("vec_id") >= 250)
    for (method <- Seq("lsh", "ivf", "pq", "ivfpq", "ivfpq_res_refined")) {
      val full = AnnIndex.buildOn(raw, method, iters = 0)
      val inc = AnnIndex.append(AnnIndex.buildOn(base, method, iters = 0), batch)
      val got = inc.search(registeredQueries, 5).collect().map(_.toSeq).toSet
      val want = full.search(registeredQueries, 5).collect().map(_.toSeq).toSet
      assert(got == want && got.nonEmpty, s"$method: append diverges from full rebuild")
    }
  }

  test("appended vectors are served, survive save/load, and never retrain the model") {
    import spark.implicits._
    val idx = AnnIndex.buildOn(graft.io.Tables.embeddings(spark, sf), "ivf") // iters=2: trained
    val e0 = Ann.normed(spark, sf).where(col("vec_id") === 0)
      .select(col("e")).as[Seq[Double]].head()
    val batch = Seq((1000000L, e0.map(_ * 0.95 + 0.005)))
      .toDF("vec_id", "embedding") // no label column — normedOf defaults it
    val appended = AnnIndex.append(idx, batch)
    assert(appended.centroids == idx.centroids, "append must not retrain")
    val q = Seq((-5L, e0.map(_ * 0.9 + 0.01))).toDF("query_id", "qe")
    val got = appended.search(q, 3, excludeSelf = false).collect().map(_.getLong(2))
    assert(got.contains(1000000L), "ingested vector must be findable")
    // durability: the appended corpus is what save() persists
    val dir = java.nio.file.Files.createTempDirectory("annidx-append").toString
    AnnIndex.save(appended, dir)
    val reloaded = AnnIndex.load(spark, dir).search(q, 3, excludeSelf = false)
      .collect().map(_.getLong(2))
    assert(reloaded.toSeq == got.toSeq, "appended index diverges after save/load")
  }

  test("streaming ingest: append per micro-batch == one batch rebuild") {
    // The production ingest shape at 100 TB: a built index serves while
    // new embeddings arrive on a stream; foreachBatch appends each
    // micro-batch through the frozen model (one narrow encode per batch).
    // Equality with the full rebuild follows from the append≡rebuild pin;
    // this test proves the STREAMING plumbing — batch boundaries, the
    // handle handoff across triggers — adds nothing.
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val raw = graft.io.Tables.embeddings(spark, sf)
    val base = raw.where(col("vec_id") < 250)
    @volatile var idx = AnnIndex.buildOn(base, "ivf", iters = 0)
    val input = MemoryStream[(Long, Seq[Double])]
    val q = input.toDF().toDF("vec_id", "embedding").writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        idx = AnnIndex.append(idx, batch)
      }.start()
    val tail = raw.where(col("vec_id") >= 250)
      .select(col("vec_id"), col("embedding"))
      .as[(Long, Seq[Double])].collect()
    val (b1, b2) = tail.splitAt(tail.length / 2)
    input.addData(b1.toSeq); q.processAllAvailable()
    input.addData(b2.toSeq); q.processAllAvailable()
    q.stop()
    val got = idx.search(registeredQueries, 5).collect().map(_.toSeq).toSet
    val want = AnnIndex.buildOn(raw, "ivf", iters = 0)
      .search(registeredQueries, 5).collect().map(_.toSeq).toSet
    assert(got == want && got.nonEmpty)
  }

  test("load on a missing or empty path names the path and the problem") {
    val missing = "/tmp/annidx-definitely-absent"
    val e = intercept[IllegalArgumentException](AnnIndex.load(spark, missing))
    assert(e.getMessage.contains(missing) && e.getMessage.contains("meta"))
  }
}
