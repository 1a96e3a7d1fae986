package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe (Test scope, not shipped): decompose the C2b containment cost
  * at a given SF — which arm dominates: the shingle checkpoint, the
  * prefiltered band self-join, the sampled-shingle inverted-index
  * self-join, or the verification joins? Run:
  *   SPARK_DRIVER_MEM=64g SPARK_GRAFT_SF_DIR=testdata/sf10 \
  *     sbt "Test/runMain graft.ContainmentProbe"
  */
object ContainmentProbe {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.operators.Dedup
    import graft.functions.TextHash.{minhashSignature, bandKeys}

    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[probe] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    val sh = Dedup.shingleHashedOf(graft.io.Tables.documents(spark, dir))
      .localCheckpoint(false)
    t("shingle checkpoint materialize")(sh.count())

    val bands = sh
      .select(col("doc_id"), minhashSignature(col("h0")).as("sig"),
        size(array_distinct(col("h0"))).cast("long").as("n"))
      .select(col("doc_id"), col("sig"), col("n"),
        explode(bandKeys(col("sig"))).as("b"))
      .select(col("doc_id"), col("sig"), col("n"), col("b.bid"), col("b.bkey"))
    val mm = graft.functions.VectorExpressions
      .positionalMatchCount(col("x.sig"), col("y.sig"))
    val prefiltered = bands.as("x")
      .join(bands.as("y"),
        col("x.bid") === col("y.bid") && col("x.bkey") === col("y.bkey") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("d1"), col("y.doc_id").as("d2"),
        mm.as("mm"), col("x.n").as("n1"), col("y.n").as("n2"))
      .where(lit(1000000L) * (col("mm") + lit(6L)) * (col("n1") + col("n2")) >=
        lit(700000L) * (lit(38L) + col("mm")) * least(col("n1"), col("n2")))
      .select(col("d1"), col("d2"))
    val nBand = t("prefiltered candBands count")(prefiltered.count())
    println(s"[probe] prefiltered band candidates: $nBand")
    val nDist = t("distinct count")(prefiltered.distinct().count())
    println(s"[probe] distinct candidates: $nDist")

    t("full containment query")(
      Dedup.containment(spark, dir).write.format("noop").mode("overwrite").save())
    t("full containment query (2nd)")(
      Dedup.containment(spark, dir).write.format("noop").mode("overwrite").save())

    spark.stop()
  }
}

/** Second probe: the (mm, size-ratio, true containment) distribution of
  * band candidates on a doc_id-sampled slice — what J/shape do the
  * surviving false positives actually have?
  */
object ContainmentDistProbe {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.operators.Dedup
    import graft.functions.TextHash.{minhashSignature, bandKeys}

    val sh = Dedup.shingleHashedOf(graft.io.Tables.documents(spark, dir))
      .where(pmod(col("doc_id"), lit(20L)) === 0) // 5% sample of docs
      .localCheckpoint(false)
    val bands = sh
      .select(col("doc_id"), minhashSignature(col("h0")).as("sig"),
        size(array_distinct(col("h0"))).cast("long").as("n"))
      .select(col("doc_id"), col("sig"), col("n"),
        explode(bandKeys(col("sig"))).as("b"))
      .select(col("doc_id"), col("sig"), col("n"), col("b.bid"), col("b.bkey"))
    val mm = graft.functions.VectorExpressions
      .positionalMatchCount(col("x.sig"), col("y.sig"))
    val pairs = bands.as("x")
      .join(bands.as("y"),
        col("x.bid") === col("y.bid") && col("x.bkey") === col("y.bkey") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("d1"), col("y.doc_id").as("d2"),
        mm.as("mm"), col("x.n").as("n1"), col("y.n").as("n2"))
      .groupBy("d1", "d2").agg(max("mm").as("mm"), max("n1").as("n1"), max("n2").as("n2"))
    val sets = sh.select(col("doc_id"), array_sort(array_distinct(col("h0"))).as("hh"))
    val full = pairs
      .join(sets.select(col("doc_id").as("d1"), col("hh").as("h1")), "d1")
      .join(sets.select(col("doc_id").as("d2"), col("hh").as("h2")), "d2")
      .select(col("mm"), col("n1"), col("n2"),
        graft.functions.VectorExpressions.sortedIntersectCount(col("h1"), col("h2")).as("ix"))
      .select(col("mm"),
        (greatest(col("n1"), col("n2")) * 10 / least(col("n1"), col("n2"))).as("ratio_x10"),
        (col("ix") * 100 / least(col("n1"), col("n2"))).as("cont_pct"),
        (col("ix") * 100 / (col("n1") + col("n2") - col("ix"))).as("jac_pct"))
    full.groupBy((col("mm") / 4).cast("int").as("mm_b"),
        (col("cont_pct") / 10).cast("int").as("cont_b"),
        (col("jac_pct") / 10).cast("int").as("jac_b"))
      .count().orderBy(desc("count")).show(40, false)
    spark.stop()
  }
}

/** Third probe: band-bucket population distribution — is per-bucket
  * all-pairs verification skew-safe?
  */
object ContainmentBucketProbe {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.operators.Dedup
    import graft.functions.TextHash.{minhashSignature, bandKeys}
    val sh = Dedup.shingleHashedOf(graft.io.Tables.documents(spark, dir))
      .localCheckpoint(false)
    val bands = sh
      .select(col("doc_id"), minhashSignature(col("h0")).as("sig"))
      .select(col("doc_id"), explode(bandKeys(col("sig"))).as("b"))
      .select(col("doc_id"), col("b.bid"), col("b.bkey"))
    val pops = bands.groupBy("bid", "bkey").count()
    pops.select(max("count").as("max_pop"), count(lit(1)).as("n_buckets"),
      sum(col("count") * (col("count") - 1) / 2).as("total_pairs")).show(false)
    pops.groupBy((log10(col("count")) * 2).cast("int").as("log_b"))
      .agg(count(lit(1)).as("buckets"), sum(col("count") * (col("count") - 1) / 2).as("pairs"))
      .orderBy("log_b").show(false)
    spark.stop()
  }
}

/** Dev probe: audio-hash cluster structure at the test SF. */
object AudioHashProbe {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.operators.Multimodal
    val hs = Multimodal.mediaTable(spark, dir).filter(_.kind == "audio").collect()
      .flatMap(m => Multimodal.audioHash64(m.media).map(h => (m.doc_id, h)))
    println(s"[probe] clips=${hs.length} distinct=${hs.map(_._2).distinct.length}")
    val kills = hs.sortBy(_._1).zipWithIndex.count { case ((d, h), j) =>
      hs.sortBy(_._1).take(j).exists(p => java.lang.Long.bitCount(p._2 ^ h) <= 3)
    }
    println(s"[probe] kills(hd<=3)=$kills")
    val out = Multimodal.audioDedup(spark, dir).collect()
    println(s"[probe] verdict rows=${out.length} kills=${out.count(!_.getBoolean(2))}")
    spark.stop()
  }
}
