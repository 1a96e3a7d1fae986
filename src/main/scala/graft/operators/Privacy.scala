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
    * Scale shape: ONE fact scan. The $1000-band census g1 is a QI-sized
    * map-side-partial aggregation; the coarser census derives FROM g1
    * (b2 = b1 div 5 exactly, non-negative floor division composes), so
    * the residue never re-scans the fact; the two merge into one policy
    * table (|nations|·|segments|·|bands| rows, corpus-independent) that
    * BROADCAST-joins back, and the ladder decision is a per-row CASE in
    * a single projection — no windows, no fact shuffle, no union of
    * re-planned branches (the 3-branch union form re-ran the census per
    * branch: 7 exchanges; this is 2 QI-sized ones).
    */
  def kAnonymize(spark: SparkSession, dir: String, k: Int = 5): DataFrame = {
    val cust = spark.read.parquet(s"$dir/customer.parquet")
      .select(col("c_custkey"),
        col("c_nationkey").cast("int").as("nation"),
        col("c_mktsegment").as("segment"),
        (expr("CAST(round(c_acctbal * 100) AS BIGINT)") + 100000000L).as("sc"))
      .withColumn("b1", expr("sc div 100000"))
    val g1 = cust.groupBy(col("nation"), col("segment"), col("b1"))
      .agg(count(lit(1)).as("cnt1"))
    // renamed keys: g2 derives FROM g1, and a self-lineage join on same-
    // named columns is ambiguous to the analyzer
    val g2 = g1.where(col("cnt1") < k)
      .select(col("nation").as("n2"), col("segment").as("s2"),
        expr("b1 div 5").as("b2"), col("cnt1"))
      .groupBy(col("n2"), col("s2"), col("b2"))
      .agg(sum(col("cnt1")).as("cnt2"))
    val policy = g1.join(g2,
      col("nation") === col("n2") && col("segment") === col("s2")
        && expr("b1 div 5") === col("b2"), "left")
      .select(col("nation"), col("segment"), col("b1"), col("cnt1"), col("cnt2"))
    cust.join(broadcast(policy), Seq("nation", "segment", "b1"))
      .select(col("c_custkey"),
        when(col("cnt1") >= k || col("cnt2") >= k, col("nation"))
          .otherwise(lit(-1)).as("nation"),
        when(col("cnt1") >= k || col("cnt2") >= k, col("segment"))
          .otherwise(lit("*")).as("segment"),
        when(col("cnt1") >= k, col("b1") * 100000L - 100000000L)
          .when(col("cnt2") >= k, expr("b1 div 5") * 500000L - 100000000L)
          .otherwise(lit(-1L)).as("lo_cents"),
        when(col("cnt1") >= k, (col("b1") + 1L) * 100000L - 100000000L)
          .when(col("cnt2") >= k, (expr("b1 div 5") + 1L) * 500000L - 100000000L)
          .otherwise(lit(-1L)).as("hi_cents"),
        when(col("cnt1") >= k, lit(0))
          .when(col("cnt2") >= k, lit(1))
          .otherwise(lit(2)).as("level"))
  }

  /** Group-diversity diagnostics over ANY released table: for each
    * distinct combination of `qiCols`, the record count, the distinct
    * count of `sensitiveCol`, and whether it meets distinct-l-diversity
    * [Machanavajjhala et al., ICDE'06 — public model]. The reusable form
    * (the resolveOn/qualityFilterOn convention): the release pipeline
    * composes it after any generalization step.
    *
    * Scale shape: one exact two-level distinct aggregation — partial
    * (QI, sensitive) dedup map-side, then the QI-keyed count — the same
    * plan class as q_wordcount; group cardinality is policy-bounded, so
    * the output is release-shaped, not fact-shaped.
    */
  def lDiversityOn(released: DataFrame, qiCols: Seq[String],
      sensitiveCol: String, l: Int): DataFrame =
    released
      .groupBy(qiCols.map(col): _*)
      .agg(count(lit(1)).as("n_records"),
        count_distinct(col(sensitiveCol)).as("n_sensitive"))
      .select(qiCols.map(col) ++ Seq(col("n_records"), col("n_sensitive"),
        (col("n_sensitive") >= l).as("diverse")): _*)

  /** C54 — q_l_diversity: the homogeneity-attack check on C52's release —
    * k-anonymity alone leaks when every record in a released QI group
    * shares the sensitive value (the classic counterexample: the
    * 5-person group all flagged urgent). Sensitive attribute here = the
    * customer's most urgent order priority (min over their orders —
    * deterministic; customers with no orders carry 'NONE'), a behavioral
    * signal the QIs are meant to hide. Output: one row per released QI
    * group with its diversity verdict — the release gate E22 composes
    * with.
    *
    * Scale shape: C52's one-scan ladder unchanged, a customer-keyed
    * orders aggregation (map-side partial), one key-equi join (AQE
    * broadcasts the small side at low SF, SMJ at scale), then the
    * [[lDiversityOn]] two-level distinct agg — group-shaped output.
    */
  def lDiversity(spark: SparkSession, dir: String, k: Int = 5,
      l: Int = 3): DataFrame = {
    val released = kAnonymize(spark, dir, k)
    val sens = spark.read.parquet(s"$dir/orders.parquet")
      .groupBy(col("o_custkey").as("c_custkey"))
      .agg(min(col("o_orderpriority")).as("sens"))
    val withSens = released.join(sens, Seq("c_custkey"), "left")
      .withColumn("sens", coalesce(col("sens"), lit("NONE")))
    lDiversityOn(withSens,
      Seq("nation", "segment", "lo_cents", "hi_cents", "level"), "sens", l)
  }

  /** C57 — q_t_closeness: the distribution-skew attack check that
    * completes the release trilogy [Li/Li/Venkatasubramanian, ICDE'07 —
    * public model]. l-diversity (C54) counts DISTINCT sensitive values
    * per released group, but a group can be "diverse" while its
    * distribution still leaks (99% urgent + a token spread passes l=3);
    * t-closeness bounds the Earth Mover's Distance between each group's
    * sensitive distribution and the GLOBAL one. The order priorities are
    * naturally ORDERED, so the ordered-domain EMD applies: with
    * cumulative sums over the lexically-ordered domain
    * (`'1-URGENT'…'5-LOW' < 'NONE'` — plain ASCII, identical ordering in
    * both engines), EMD = (1/(m−1)) · Σᵢ |Σ_{j≤i} (p_j − q_j)|.
    *
    * EXACT-INTEGER formulation (the E20 money rule applied to
    * probability): scale away both divisions —
    * `emd_num = Σᵢ |Σ_{j≤i} (cnt_j·N − gcnt_j·N_g)|` and
    * `emd_den = N_g·N·(m−1)`, so EMD = num/den exactly, and the verdict
    * `t_close` at t = tNum/tDen is the integer comparison
    * `num·tDen ≤ den·tNum` — no FP anywhere, the DuckDB hash matches
    * bit-for-bit. Bounds: N ≤ 1.5M·sf, so num ≤ m·N_g·N ≈ 10¹⁴ at sf10
    * — comfortably BIGINT.
    *
    * Scale shape: the C52 ladder + sens join (the lDiversity cost,
    * shared scan), then everything is CENSUS-sized — the global
    * distribution (m rows) broadcasts, the per-group×domain dense grid
    * is |groups|·m rows, and the cumulative window partitions by group
    * over m rows. The fact is scanned once; no fact-scale shuffle
    * follows the first aggregation.
    */
  def tCloseness(spark: SparkSession, dir: String, k: Int = 5,
      tNum: Int = 1, tDen: Int = 5): DataFrame = {
    val released = kAnonymize(spark, dir, k)
    val sens = spark.read.parquet(s"$dir/orders.parquet")
      .groupBy(col("o_custkey").as("c_custkey"))
      .agg(min(col("o_orderpriority")).as("sens"))
    // localCheckpoint (lazy), not cache: rs feeds FOUR census aggregations
    // in [[tClosenessOn]] — re-running the ladder + join per consumer
    // would quadruple the fact scans (the Dedup shingle-table rationale)
    val rs = released.join(sens, Seq("c_custkey"), "left")
      .withColumn("sens", coalesce(col("sens"), lit("NONE")))
      .select(col("nation"), col("segment"), col("lo_cents"),
        col("hi_cents"), col("level"), col("sens"))
      .localCheckpoint(false)
    tClosenessOn(rs, Seq("nation", "segment", "lo_cents", "hi_cents", "level"),
      "sens", tNum, tDen)
  }

  /** The EMD core of [[tCloseness]] over an arbitrary released frame —
    * `(qiCols…, sensCol)` rows in, one verdict row per QI group out.
    * Factored like [[lDiversityOn]] so release pipelines with their own
    * generalization scheme get the same gate.
    */
  def tClosenessOn(rs0: DataFrame, qi: Seq[String], sensCol: String,
      tNum: Int, tDen: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val rs = rs0.select(qi.map(col) :+ col(sensCol).as("sens"): _*)
    val glob = rs.groupBy(col("sens")).agg(count(lit(1)).as("gcnt"))
    val tot = rs.agg(count(lit(1)).as("n_total"),
      countDistinct(col("sens")).as("m"))
    val grp = rs.groupBy(qi.map(col): _*).agg(count(lit(1)).as("n_g"))
    val cell = rs.groupBy(qi.map(col) :+ col("sens"): _*)
      .agg(count(lit(1)).as("cnt"))
    // dense grid: every group × every domain value (absent cells count 0 —
    // they still move mass in the EMD), global counts riding along
    val dense = grp.crossJoin(broadcast(glob))
      .join(cell, qi :+ "sens", "left")
      .na.fill(0L, Seq("cnt"))
      .crossJoin(broadcast(tot))
    val w = Window.partitionBy(qi.map(col): _*).orderBy(col("sens"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = dense
      .withColumn("diff", col("cnt") * col("n_total") - col("gcnt") * col("n_g"))
      .withColumn("cum", sum(col("diff")).over(w))
    cum.groupBy(qi.map(col) :+ col("n_g") :+ col("n_total") :+ col("m"): _*)
      .agg(sum(abs(col("cum"))).as("raw"))
      .select(qi.map(col) :+
        col("n_g").cast("long").as("n_records") :+
        col("raw").cast("long").as("emd_num") :+
        (col("n_g") * col("n_total") * (col("m") - 1)).cast("long").as("emd_den") :+
        (col("raw") * tDen <=
          col("n_g") * col("n_total") * (col("m") - 1) * tNum).as("t_close"): _*)
  }
}
