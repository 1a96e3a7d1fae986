package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Edit-distance entity resolution (C51 q_entity_resolve): map every part
  * to its canonical duplicate — the smallest partkey in the same brand
  * whose name is within `maxDist` Levenshtein edits — the record-linkage
  * stage a catalog/crawl pipeline runs where the dedup family's
  * set-similarity (C4) misses single-character typos ("small rig" vs
  * "small ring" shares few 4-grams but is 1 edit away).
  *
  * Pangool's closest surface is the generic reduce-side co-group
  * (reference: core/.../tuplemr/TupleReducer.java) — a user would have
  * hand-rolled the blocking; here the operator owns a LOSSLESS blocking
  * scheme with declared semantics: pairs are candidates iff they share
  * the brand (the domain blocking key) and pass the PassJoin segment
  * filter [Li et al., VLDB'11 — public algorithm]:
  *
  *   partition the INDEXED name x (length L) into maxDist+1 contiguous
  *   segments (even split); if ED(x, y) ≤ maxDist then — pigeonhole over
  *   ≤ maxDist edits — at least one segment survives un-edited, so it
  *   occurs in y EXACTLY, at a start position within ±maxDist of its
  *   position in x, and |len(y) − L| ≤ maxDist. Recall is 1.0 by
  *   construction (unlike MinHash banding); empty segments (names shorter
  *   than maxDist+1 chars) degrade to exhaustive same-window blocking,
  *   still lossless.
  *
  * Scale shape (the 100 TB story):
  *  - index side emits maxDist+1 tiny rows per record; probe side ≤
  *    (2·maxDist+1)² · (maxDist+1) substring rows per record — both
  *    LINEAR in the corpus, no self-join of the full table ever plans.
  *  - candidates meet in (brand, len, segIdx, segText) buckets; within a
  *    bucket each probe walks INDEX members in ascending-id order and
  *    SHORT-CIRCUITS at its first verified hit (the C50 device): a
  *    duplicate-heavy cluster of n identical names costs O(n) verify
  *    calls, not O(n²) — the verdict (one row per record) is what keeps
  *    the output linear too, where the pair list is quadratic in cluster
  *    size (the C50 lesson: 374k pairs from 25k images).
  *  - cross-bucket verdicts min-fold per record (one keyed aggregation),
  *    then a left join back to the full table marks non-duplicates.
  *
  * Verification is the classic unit-cost Levenshtein DP — exactly the
  * semantics of Spark's `levenshtein()` and DuckDB's `levenshtein()`, so
  * the oracle states the SEMANTIC join (brand-blocked quadratic ED ≤ k)
  * and must agree bit-for-bit: (k, canon, dist), dist = −1 where a part
  * has no smaller-id match.
  */
object Fuzzy {

  /** Classic unit-cost Levenshtein (two-row DP) — must match the builtin
    * SQL `levenshtein` in both engines; the spec pins it against Spark's.
    */
  private[graft] def levenshtein(a: String, b: String): Int = {
    if (a == b) return 0
    val n = a.length; val m = b.length
    if (n == 0) return m
    if (m == 0) return n
    var prev = Array.tabulate(m + 1)(identity)
    var cur = new Array[Int](m + 1)
    var i = 1
    while (i <= n) {
      cur(0) = i
      val ca = a.charAt(i - 1)
      var j = 1
      while (j <= m) {
        val cost = if (ca == b.charAt(j - 1)) 0 else 1
        cur(j) = math.min(math.min(cur(j - 1) + 1, prev(j) + 1), prev(j - 1) + cost)
        j += 1
      }
      val t = prev; prev = cur; cur = t
      i += 1
    }
    prev(m)
  }

  /** Even segment partition of a length-`len` string into `k` segments:
    * segment i covers [floor(i·len/k), floor((i+1)·len/k)). Both sides of
    * the index⋈probe MUST use this one scheme — the pigeonhole lemma is
    * about x's OWN partition.
    */
  private[graft] def segBounds(len: Int, k: Int, i: Int): (Int, Int) =
    ((i.toLong * len / k).toInt, ((i + 1).toLong * len / k).toInt)

  def entityResolve(spark: SparkSession, dir: String, maxDist: Int = 2): DataFrame = {
    import spark.implicits._
    val k = maxDist
    val parts = spark.read.parquet(s"$dir/part.parquet")
      .select(col("p_partkey").as("id"), col("p_name").as("nm"),
        col("p_brand").as("b"))
    val typed = parts.as[(Long, String, String)]
    // role 0 = indexed segments (key carries the INDEXED length), role 1 =
    // probe substrings of every candidate indexed length in the ±k window.
    val indexRows = typed.flatMap { case (id, nm, b) =>
      val l = nm.length
      (0 to k).map { i =>
        val (s, e) = segBounds(l, k + 1, i)
        (b, l, i, nm.substring(s, e), 0: Byte, id, nm)
      }
    }
    val probeRows = typed.flatMap { case (id, nm, b) =>
      val m = nm.length
      for {
        l <- math.max(1, m - k) to (m + k)
        i <- 0 to k
        (s, e) = segBounds(l, k + 1, i)
        li = e - s
        p <- math.max(0, s - k) to math.min(m - li, s + k)
      } yield (b, l, i, nm.substring(p, p + li), 1: Byte, id, nm)
    }.distinct() // several positions p can cut the same substring
    indexRows.union(probeRows)
      .groupByKey { case (b, l, i, txt, _, _, _) => (b, l, i, txt) }
      .flatMapGroups { (_, it: Iterator[(String, Int, Int, String, Byte, Long, String)]) =>
        val members = it.map { case (_, _, _, _, role, id, nm) => (role, id, nm) }.toArray
        val idx = members.collect { case (r, id, nm) if r == 0 => (id, nm) }.sortBy(_._1)
        val probes = members.collect { case (r, id, nm) if r == 1 => (id, nm) }
        val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Int)]
        var pi = 0
        while (pi < probes.length) {
          val (pid, pnm) = probes(pi)
          // ascending-id walk, stop at the first verified hit: the bucket's
          // smallest verified candidate IS the bucket's contribution, and an
          // identical-name cluster resolves each member in one probe.
          var xi = 0
          var done = false
          while (xi < idx.length && !done && idx(xi)._1 < pid) {
            val d = levenshtein(pnm, idx(xi)._2)
            if (d <= k) { out += ((pid, idx(xi)._1, d)); done = true }
            xi += 1
          }
          pi += 1
        }
        out.iterator
      }
      .toDF("id", "cand", "dist")
      .groupBy(col("id"))
      .agg(min(struct(col("cand"), col("dist"))).as("best"))
      .join(parts, Seq("id"), "right")
      .select(col("id").as("k"),
        coalesce(col("best.cand"), col("id")).as("canon"),
        coalesce(col("best.dist"), lit(-1)).cast("int").as("dist"))
  }
}
