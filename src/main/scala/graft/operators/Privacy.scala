package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Privacy-preserving release operators (SURVEY.md §2C). C23 redacts
  * free-text PII; this is the structured-record side: k-anonymity over
  * quasi-identifiers before a table leaves the trust boundary [Sweeney,
  * IJUFKS'02 — public model]. Pangool's nearest surface is, again, the
  * generic grouped reducer (reference: core/.../tuplemr/TupleReducer.java);
  * the operator owns the policy so the release pipeline can't get it
  * subtly wrong.
  */
object Privacy {

  /** C52 — q_k_anonymize: release customers with quasi-identifiers
    * (nation, market segment, account-balance band) generalized until
    * every emitted combination covers ≥ k records.
    *
    * Declared ladder (each rung computed over the residue of the rungs
    * above, the standard global-recoding sweep):
    *   level 0 — $1000 balance bands: groups (nation, segment, band)
    *             with ≥ k members release as-is;
    *   level 1 — the residue re-bands at $5000: groups reaching ≥ k
    *             release at the coarser band;
    *   level 2 — whatever remains is SUPPRESSED: all three QIs masked
    *             (nation −1, segment '*', band [−1, −1)) — one group,
    *             k-anonymous trivially whenever it is nonempty.
    * Bands are exact-integer on CENTS (the E20 money rule) SHIFTED
    * non-negative first (+10⁸ cents): `div`/`//` disagree on negative
    * operands (truncation vs floor), and TPC-H balances go to −$994; the
    * shift keeps the one integer-division form both engines compute
    * identically, then the emitted bounds unshift (exact arithmetic).
    * Output: (c_custkey, nation, segment, lo_cents, hi_cents, level) —
    * every input row exactly once, custkey kept as the re-join handle
    * for the non-QI payload columns.
    *
    * Scale shape: two narrow groupBy aggregations on QI keys (map-side
    * partial — group cardinality is |nations|·|segments|·|bands|,
    * corpus-independent) with their counts BROADCAST-joined back to the
    * fact (the model-table rule: a count table this small never
    * warrants a fact shuffle), no windows, no self-join of the fact.
    * The residue chain reuses the first join's columns, so the whole
    * ladder is one fact scan plus two bounded joins.
    */
  def kAnonymize(spark: SparkSession, dir: String, k: Int = 5): DataFrame = {
    val cust = spark.read.parquet(s"$dir/customer.parquet")
      .select(col("c_custkey"),
        col("c_nationkey").cast("int").as("nation"),
        col("c_mktsegment").as("segment"),
        (expr("CAST(round(c_acctbal * 100) AS BIGINT)") + 100000000L).as("sc"))
      .withColumn("b1", expr("sc div 100000"))
      .withColumn("b2", expr("sc div 500000"))
    val g1 = cust.groupBy(col("nation"), col("segment"), col("b1"))
      .agg(count(lit(1)).as("cnt1"))
    val withG1 = cust.join(broadcast(g1), Seq("nation", "segment", "b1"))
    val level0 = withG1.where(col("cnt1") >= k)
      .select(col("c_custkey"), col("nation"), col("segment"),
        (col("b1") * 100000L - 100000000L).as("lo_cents"),
        ((col("b1") + 1L) * 100000L - 100000000L).as("hi_cents"),
        lit(0).as("level"))
    val residue1 = withG1.where(col("cnt1") < k)
    val g2 = residue1.groupBy(col("nation"), col("segment"), col("b2"))
      .agg(count(lit(1)).as("cnt2"))
    val withG2 = residue1.join(broadcast(g2), Seq("nation", "segment", "b2"))
    val level1 = withG2.where(col("cnt2") >= k)
      .select(col("c_custkey"), col("nation"), col("segment"),
        (col("b2") * 500000L - 100000000L).as("lo_cents"),
        ((col("b2") + 1L) * 500000L - 100000000L).as("hi_cents"),
        lit(1).as("level"))
    val level2 = withG2.where(col("cnt2") < k)
      .select(col("c_custkey"), lit(-1).as("nation"), lit("*").as("segment"),
        lit(-1L).as("lo_cents"), lit(-1L).as("hi_cents"), lit(2).as("level"))
    level0.unionByName(level1).unionByName(level2)
  }
}
