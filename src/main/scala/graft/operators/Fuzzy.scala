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
  *  - the expensive work runs at ENTITY granularity: records collapse to
  *    one row per distinct (brand, name) first (only a cluster's minimum
  *    id can ever win a min-smaller-id verdict — every other same-name id
  *    is dominated), so blocking/verify cost tracks entity diversity, not
  *    record count; a mostly-unique corpus degrades gracefully to
  *    record-level asymptotics.
  *  - index side emits maxDist+1 tiny rows per entity; probe side ≤
  *    (2·maxDist+1)² · (maxDist+1) substring rows per entity — both
  *    LINEAR, no self-join of the full table ever plans. Candidates meet
  *    in (brand, len, segIdx, segText) buckets; verification is one DP
  *    per distinct name pair per bucket.
  *  - verified cluster-minimum candidate lists join back to the records
  *    — BROADCAST below a measured entity-count gate, plain shuffle join
  *    above it (an unconditional hint would OOM on a mostly-unique
  *    corpus where "entity-sized" is record-sized) — and each record's
  *    verdict is an in-row array reduction (smallest candidate below its
  *    own id); below the gate, zero record-scale shuffles beyond the
  *    entity collapse itself.
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

  /** Resolve duplicates in ANY (id, name, block) table — the reusable form
    * of [[entityResolve]] (the same de-hardwiring qualityFilterOn /
    * AnnIndex.buildOn / funnelStages got): for every record, `canon` = the
    * smallest id in the same block whose name is within `maxDist` edits
    * (own id where none), `dist` = its edit distance (−1 where none).
    * `idCol` must be an INTEGRAL type (byte/short/int/long — checked
    * loudly; smallest-id semantics need an exact total order, and a
    * silent cast from anything else would null or round ids);
    * `nameCol`/`blockCol` cast to string for blocking — lossless for
    * equality within one column.
    *
    * NOT construction-lazy (r17 ADVICE, documented as the accepted
    * tradeoff): building the returned DataFrame runs two eager Spark jobs
    * — the cluster table's localCheckpoint materialization and the
    * broadcast-gate entity count — so the gate decides on a MEASURED
    * count frozen at construction (the alternative, deciding inside a
    * lazy plan, can't change a join's physical strategy after planning).
    * Callers that construct but never execute still pay both jobs; both
    * are cluster-sized (distinct (block, name)), never record-sized.
    *
    * Output columns: (id, canon, dist).
    */
  def resolveOn(df: DataFrame, idCol: String, nameCol: String,
      blockCol: String, maxDist: Int = 2,
      broadcastMaxEntities: Long = 1000000L): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val k = maxDist
    // integral ids only, checked loudly (r17 review — the mergeBucketed
    // dtype discipline): a silent cast("long") over a string/UUID id
    // column nulls every row and the min-id verdicts come out garbage
    // with no error
    require(Set[org.apache.spark.sql.types.DataType](
      org.apache.spark.sql.types.LongType, org.apache.spark.sql.types.IntegerType,
      org.apache.spark.sql.types.ShortType, org.apache.spark.sql.types.ByteType)
      .contains(df.schema(idCol).dataType),
      s"resolveOn id column '$idCol' is ${df.schema(idCol).dataType.simpleString} — " +
        "smallest-id semantics need an integral id (map your key to one first)")
    val parts = df.select(col(idCol).cast("long").as("id"),
      col(nameCol).cast("string").as("nm"), col(blockCol).cast("string").as("b"))
    // Resolve at CLUSTER granularity, not record granularity (the C49
    // lesson applied to ER): a duplication-heavy corpus has few distinct
    // (block, name) entities behind many records, and only a cluster's
    // MINIMUM id can ever win any record's min-smaller-id verdict (every
    // other same-name id is dominated by it everywhere). So: collapse to
    // one row per distinct entity, run the expensive blocking+verify over
    // THAT table, and broadcast the verdict lists back — at sf10 this is
    // ~2.5k cluster rows doing the PassJoin work instead of 2M records
    // (measured 193 s → the record-level probes/shuffles dominated), and
    // on a mostly-unique corpus it degrades gracefully to the same
    // asymptotics as record-level resolution.
    // localCheckpoint, not cache (the minhashLsh rationale): the entity
    // collapse feeds three consumers (index rows, probe rows, the verdict
    // join) plus the broadcast-gate count below — one materialization.
    val clusters = parts.groupBy(col("b"), col("nm")).agg(min(col("id")).as("m"))
      .localCheckpoint(false)
    val typed = clusters.select(col("b"), col("nm"), col("m"))
      .as[(String, String, Long)]
    // role 0 = indexed segments (key carries the INDEXED length), role 1 =
    // probe substrings of every candidate indexed length in the ±k window.
    val indexRows = typed.flatMap { case (b, nm, m) =>
      val l = nm.length
      (0 to k).map { i =>
        val (s, e) = segBounds(l, k + 1, i)
        (b, l, i, nm.substring(s, e), 0: Byte, m, nm)
      }
    }
    val probeRows = typed.flatMap { case (b, nm, m) =>
      val ml = nm.length
      for {
        // l reaches DOWN to 0: an empty indexed name only lives under l=0
        // keys, and a probe that skipped them would never meet it (review
        // finding — the lossless claim must include degenerate names)
        l <- math.max(0, ml - k) to (ml + k)
        i <- 0 to k
        (s, e) = segBounds(l, k + 1, i)
        li = e - s
        p <- math.max(0, s - k) to math.min(ml - li, s + k)
      } yield (b, l, i, nm.substring(p, p + li), 1: Byte, m, nm)
    }
    // Per (bucket, probe cluster): emit EVERY verified index cluster (no
    // min-id short-circuit here — which candidate wins depends on each
    // record's own id, decided in-row after the broadcast). DP verdicts
    // run once per distinct name pair per bucket; cross-bucket repeats of
    // the same cluster pair collapse in the distinct() below (tiny data).
    val clusterPairs = indexRows.union(probeRows)
      .groupByKey { case (b, l, i, txt, _, _, _) => (b, l, i, txt) }
      .flatMapGroups { (_, it: Iterator[(String, Int, Int, String, Byte, Long, String)]) =>
        val members = it.map { case (bb, _, _, _, role, m, nm) => (role, bb, m, nm) }.toArray
        val idx = members.collect { case (r, _, m, nm) if r == 0 => (nm, m) }.distinct
        val probes = members.collect { case (r, bb, m, nm) if r == 1 => (bb, nm, m) }.distinct
        probes.iterator.flatMap { case (bb, pnm, pm) =>
          idx.iterator.flatMap { case (inm, im) =>
            if (im == pm) None
            else {
              val d = levenshtein(pnm, inm)
              if (d <= k) Some((bb, pnm, pm, im, d)) else None
            }
          }
        }
      }
      .toDF("b", "nm", "m", "cand_m", "dist")
      .distinct()
    // Candidate list per entity: verified foreign cluster minima + the own
    // cluster's minimum at distance 0 (a same-name smaller id is always a
    // valid match). Lists are bounded by the entity's match degree; the
    // whole table is entity-sized → broadcast.
    val cands = clusters
      .join(clusterPairs.select(col("b"), col("nm"),
        struct(col("cand_m").as("m"), col("dist")).as("c")),
        Seq("b", "nm"), "left")
      .groupBy(col("b"), col("nm"), col("m"))
      .agg(collect_list(col("c")).as("foreign"))
      .select(col("b"), col("nm"),
        array_union(array(struct(col("m"), lit(0).as("dist"))),
          col("foreign")).as("cands"))
    // Record-level verdict is a narrow in-row reduction after one join:
    // the winner is the smallest candidate minimum below the record's own
    // id (struct ordering — minima are unique ids). The broadcast is
    // GATED on a measured entity count (the C35 oov device — threshold
    // noted next to TextAnalysis.oovRate's bloomMinRefDocs): the candidate
    // table is entity-sized, and "entity-sized" is only small on a
    // duplication-heavy corpus — on a mostly-unique 100 TB corpus it is
    // record-sized and an unconditional broadcast hint is a driver OOM.
    // Below the gate: broadcast. Above: no hint — the (b, nm)-keyed
    // shuffle join runs and AQE still localizes any skew.
    val nEntities = clusters.count()
    val candSide = if (nEntities < broadcastMaxEntities) broadcast(cands) else cands
    parts.join(candSide, Seq("b", "nm"))
      .withColumn("best", array_min(expr("filter(cands, c -> c.m < id)")))
      .select(col("id"),
        coalesce(col("best.m"), col("id")).as("canon"),
        coalesce(col("best.dist"), lit(-1)).cast("int").as("dist"))
  }

  /** C51 — q_entity_resolve: [[resolveOn]] over the part table, blocked by
    * brand — see the object scaladoc for semantics and scale shape.
    */
  def entityResolve(spark: SparkSession, dir: String, maxDist: Int = 2): DataFrame =
    resolveOn(spark.read.parquet(s"$dir/part.parquet"),
      "p_partkey", "p_name", "p_brand", maxDist)
      .withColumnRenamed("id", "k")
}
