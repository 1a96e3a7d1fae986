package graft

import graft.functions.TextHash.{permA, permB, Bands, P}

/** DuckDB oracle SQL for the C/D-block queries. MinHash permutation
  * constants are generated from the same [[graft.functions.TextHash]]
  * definitions the Spark plans use, so both engines derive identical hashes.
  */
object Oracles {

  private val hash60Sql = "CAST(concat('0x', substr(md5(s), 1, 15)) AS BIGINT)"
  private val toksSql = "list_filter(string_split(text, ' '), x -> x <> '')"
  private val stopListSql = "['the','a','of','and','to','in','is','on']"

  val dedupExact: String =
    "SELECT md5(text) AS content_hash, min(doc_id) AS keep_id, count(*) AS n_copies FROM documents GROUP BY 1"

  /** Shared CTE chain deriving the verified MinHash-LSH near-dup pairs
    * (`ver`: d1, d2, jac) — reused by [[dedupMinhash]] and [[dedupCluster]].
    */
  private val minhashVerCtes: String = {
    def m(i: Int) = s"list_min(list_transform(h0, h -> (h * ${permA(i)} + ${permB(i)}) % $P))"
    val bandSelects = (0 until Bands).map { j =>
      s"SELECT doc_id, $j AS bid, (${m(2 * j)}::VARCHAR || ',' || ${m(2 * j + 1)}::VARCHAR) AS bkey FROM hs"
    }.mkString(" UNION ALL ")
    s"""tok AS MATERIALIZED (SELECT doc_id, $toksSql AS w FROM documents),
       |tk AS MATERIALIZED (SELECT doc_id, w FROM tok WHERE len(w) >= 3),
       |shs AS MATERIALIZED (SELECT doc_id, list_distinct([w[i]||' '||w[i+1]||' '||w[i+2] FOR i IN range(1, len(w)-1)]) AS sh FROM tk),
       |hs AS MATERIALIZED (SELECT doc_id, list_transform(sh, s -> $hash60Sql % $P) AS h0 FROM shs),
       |bands AS MATERIALIZED ($bandSelects),
       |cand AS MATERIALIZED (SELECT DISTINCT x.doc_id AS d1, y.doc_id AS d2 FROM bands x
       |         JOIN bands y ON x.bid = y.bid AND x.bkey = y.bkey AND x.doc_id < y.doc_id),
       |ver AS MATERIALIZED (SELECT d1, d2,
       |          round(len(list_intersect(a.h0, b.h0))::DOUBLE
       |                / len(list_distinct(list_concat(a.h0, b.h0))), 6) AS jac
       |        FROM cand JOIN hs a ON d1 = a.doc_id JOIN hs b ON d2 = b.doc_id)""".stripMargin
  }

  val dedupMinhash: String =
    s"""WITH $minhashVerCtes
       |SELECT d1, d2, jac FROM ver WHERE jac >= 0.5""".stripMargin

  /** Incremental variant: batch (doc_id ≡ 4 mod 5) probes the corpus
    * index (the rest); same shingle/band/verify derivations as
    * [[minhashVerCtes]], but candidates are batch×corpus only.
    */
  val dedupIncremental: String = {
    def m(i: Int) = s"list_min(list_transform(h0, h -> (h * ${permA(i)} + ${permB(i)}) % $P))"
    val bandSelects = (0 until Bands).map { j =>
      s"SELECT doc_id, $j AS bid, (${m(2 * j)}::VARCHAR || ',' || ${m(2 * j + 1)}::VARCHAR) AS bkey FROM hs"
    }.mkString(" UNION ALL ")
    s"""WITH tok AS MATERIALIZED (SELECT doc_id, $toksSql AS w FROM documents),
       |tk AS MATERIALIZED (SELECT doc_id, w FROM tok WHERE len(w) >= 3),
       |shs AS MATERIALIZED (SELECT doc_id, list_distinct([w[i]||' '||w[i+1]||' '||w[i+2] FOR i IN range(1, len(w)-1)]) AS sh FROM tk),
       |hs AS MATERIALIZED (SELECT doc_id, list_transform(sh, s -> $hash60Sql % $P) AS h0 FROM shs),
       |bands AS MATERIALIZED ($bandSelects),
       |cand AS MATERIALIZED (SELECT DISTINCT y.doc_id AS new_id, x.doc_id AS corpus_id
       |         FROM bands x JOIN bands y ON x.bid = y.bid AND x.bkey = y.bkey
       |         WHERE x.doc_id % 5 <> 4 AND y.doc_id % 5 = 4)
       |SELECT new_id, corpus_id,
       |       round(len(list_intersect(a.h0, b.h0))::DOUBLE
       |             / len(list_distinct(list_concat(a.h0, b.h0))), 6) AS jac
       |FROM cand JOIN hs a ON corpus_id = a.doc_id JOIN hs b ON new_id = b.doc_id
       |WHERE round(len(list_intersect(a.h0, b.h0))::DOUBLE
       |            / len(list_distinct(list_concat(a.h0, b.h0))), 6) >= 0.5""".stripMargin
  }

  /** Connected-component min labels over a symmetric `und(src, dst)` edge
    * CTE, ending in `cl(doc_id, cluster_id)` — a BOUNDED unrolled
    * iteration replacing the pairwise-reachability recursive CTE whose
    * |component|^2 `reach` row count ground for CPU-hours at sf10.
    * Alternates a neighbor-min round with a pointer-jumping shortcut
    * round (label := label of current label, valid because lab(v) <= v
    * and labels are themselves member doc_ids), so convergence needs
    * O(log2 diameter) alternations — 12 of each covers any component a
    * dedup graph can produce. Every level is MATERIALIZED (the DuckDB
    * plain-CTE inlining rule). Matches the Spark min-label-propagation
    * fixpoint in graft.operators.Curation.connectedComponents.
    *
    * Unlike the Spark side's true-fixpoint probe, the unroll is bounded —
    * so a final guard round re-runs one neighbor-min pass and calls
    * DuckDB's error() if ANY label would still drop: a component whose
    * propagation outruns the 12 alternations is a loud oracle failure, not
    * silently-wrong cluster labels at a larger scale factor.
    */
  private def ccLabelCtes(rounds: Int = 12): String = {
    val steps = (1 to rounds).flatMap { k =>
      val prev = if (k == 1) "lab0" else s"labj${k - 1}"
      Seq(
        s"labn$k AS MATERIALIZED (SELECT x.doc_id, least(x.lab, min(y.lab)) AS lab\n" +
          s"  FROM $prev x JOIN und e ON e.src = x.doc_id JOIN $prev y ON y.doc_id = e.dst\n" +
          "  GROUP BY x.doc_id, x.lab)",
        s"labj$k AS MATERIALIZED (SELECT x.doc_id, least(x.lab, y.lab) AS lab\n" +
          s"  FROM labn$k x JOIN labn$k y ON y.doc_id = x.lab)")
    }
    val guard =
      s"labguard AS MATERIALIZED (SELECT count(*) AS n_unconverged\n" +
        s"  FROM labj$rounds x JOIN und e ON e.src = x.doc_id\n" +
        s"  JOIN labj$rounds y ON y.doc_id = e.dst WHERE y.lab < x.lab)"
    val cl =
      s"cl AS MATERIALIZED (SELECT doc_id,\n" +
        s"  CASE WHEN (SELECT n_unconverged FROM labguard) > 0\n" +
        s"       THEN error('cc label propagation did not converge in $rounds rounds — raise ccLabelCtes(rounds)')\n" +
        s"       ELSE lab END AS cluster_id FROM labj$rounds)"
    ("lab0 AS MATERIALIZED (SELECT DISTINCT src AS doc_id, src AS lab FROM und)" +:
      steps :+ guard :+ cl).mkString(",\n")
  }

  /** Transitive closure of the near-dup pairs via recursive CTE: label =
    * min reachable doc_id (the und edge set is symmetric, so every node
    * reaches its whole component). Matches the Spark min-label-propagation
    * fixpoint in graft.operators.Curation.connectedComponents.
    */
  val dedupCluster: String =
    s"""WITH $minhashVerCtes,
       |pairs AS MATERIALIZED (SELECT d1, d2 FROM ver WHERE jac >= 0.5),
       |und AS MATERIALIZED (SELECT d1 AS src, d2 AS dst FROM pairs UNION SELECT d2, d1 FROM pairs),
       |${ccLabelCtes()}
       |SELECT doc_id, cluster_id FROM cl""".stripMargin

  /** Cluster closure as in [[dedupCluster]], then the most-words member
    * (ties → smaller doc_id) keeps — same window rule as the Spark plan.
    */
  val dedupKeepBest: String =
    s"""WITH $minhashVerCtes,
       |pairs AS MATERIALIZED (SELECT d1, d2 FROM ver WHERE jac >= 0.5),
       |und AS MATERIALIZED (SELECT d1 AS src, d2 AS dst FROM pairs UNION SELECT d2, d1 FROM pairs),
       |${ccLabelCtes()},
       |wc AS MATERIALIZED (SELECT doc_id, CAST(len($toksSql) AS BIGINT) AS n_words FROM documents)
       |SELECT c.doc_id, c.cluster_id, w.n_words,
       |       row_number() OVER (PARTITION BY c.cluster_id
       |                          ORDER BY w.n_words DESC, c.doc_id) = 1 AS keep
       |FROM cl c JOIN wc w USING (doc_id)""".stripMargin

  /** End-to-end curation: the C26 quality gate pre-filters the corpus,
    * then the [[dedupKeepBest]] machinery (shingles → bands → pairs →
    * recursive-CTE closure → keep-best window) runs over SURVIVORS only;
    * singleton survivors keep themselves via the anti-join branch.
    */
  /** The C40 curation chain as a reusable CTE block ending in `curated`
    * (doc_id, cluster_id, n_words, keep) — shared by the standalone
    * q_curate_pipeline oracle and the q_training_batches composition.
    */
  private val curateCtes: String = {
    def m(i: Int) = s"list_min(list_transform(h0, h -> (h * ${permA(i)} + ${permB(i)}) % $P))"
    val bandSelects = (0 until Bands).map { j =>
      s"SELECT doc_id, $j AS bid, (${m(2 * j)}::VARCHAR || ',' || ${m(2 * j + 1)}::VARCHAR) AS bkey FROM hs"
    }.mkString(" UNION ALL ")
    s"""qt AS MATERIALIZED (SELECT doc_id, text, $toksSql AS toks FROM documents),
       |q AS MATERIALIZED (SELECT doc_id FROM (
       |    SELECT doc_id, CAST(len(toks) AS BIGINT) AS n_words,
       |      (len(replace(text, ' ', '')) * 100) // len(toks) AS wl,
       |      len(list_filter(toks, x -> list_contains($stopListSql, x))) AS sh,
       |      list_max(list_transform(list_distinct(toks),
       |        x -> len(list_filter(toks, y -> y = x)))) AS mf
       |    FROM qt WHERE len(toks) > 0) f
       |  WHERE n_words >= 5 AND n_words <= 10000 AND wl >= 200 AND wl <= 1200
       |    AND sh >= 1 AND mf * 5 <= n_words),
       |tok AS MATERIALIZED (SELECT doc_id, $toksSql AS w FROM documents
       |        WHERE doc_id IN (SELECT doc_id FROM q)),
       |tk AS MATERIALIZED (SELECT doc_id, w FROM tok WHERE len(w) >= 3),
       |shs AS MATERIALIZED (SELECT doc_id, list_distinct([w[i]||' '||w[i+1]||' '||w[i+2] FOR i IN range(1, len(w)-1)]) AS sh FROM tk),
       |hs AS MATERIALIZED (SELECT doc_id, list_transform(sh, s -> $hash60Sql % $P) AS h0 FROM shs),
       |bands AS MATERIALIZED ($bandSelects),
       |cand AS MATERIALIZED (SELECT DISTINCT x.doc_id AS d1, y.doc_id AS d2 FROM bands x
       |         JOIN bands y ON x.bid = y.bid AND x.bkey = y.bkey AND x.doc_id < y.doc_id),
       |pairs AS MATERIALIZED (SELECT d1, d2 FROM cand JOIN hs a ON d1 = a.doc_id JOIN hs b ON d2 = b.doc_id
       |          WHERE round(len(list_intersect(a.h0, b.h0))::DOUBLE
       |                      / len(list_distinct(list_concat(a.h0, b.h0))), 6) >= 0.5),
       |und AS MATERIALIZED (SELECT d1 AS src, d2 AS dst FROM pairs UNION SELECT d2, d1 FROM pairs),
       |${ccLabelCtes()},
       |wc AS MATERIALIZED (SELECT doc_id, CAST(len($toksSql) AS BIGINT) AS n_words FROM documents
       |       WHERE doc_id IN (SELECT doc_id FROM q)),
       |curated AS MATERIALIZED (
       |  SELECT c.doc_id, c.cluster_id, w.n_words,
       |         row_number() OVER (PARTITION BY c.cluster_id
       |                            ORDER BY w.n_words DESC, c.doc_id) = 1 AS keep
       |  FROM cl c JOIN wc w USING (doc_id)
       |  UNION ALL
       |  SELECT w.doc_id, w.doc_id AS cluster_id, w.n_words, true AS keep
       |  FROM wc w WHERE w.doc_id NOT IN (SELECT doc_id FROM cl))""".stripMargin
  }

  val curatePipeline: String =
    s"""WITH $curateCtes
       |SELECT doc_id, cluster_id, n_words, keep FROM curated""".stripMargin

  /** C48 — the end-to-end training-batch emission: curated keepers →
    * train split (salted id hash < 8 of 10) → seeded epoch order → global
    * token offsets / sequence ids. The global window here is fine for the
    * ORACLE (DuckDB runs single-node anyway); the Spark side computes the
    * same total order with a distributed prefix sum instead.
    */
  val trainingBatches: String =
    s"""WITH $curateCtes,
       |kept AS MATERIALIZED (SELECT doc_id FROM curated WHERE keep),
       |tr AS MATERIALIZED (SELECT doc_id FROM kept
       |  WHERE CAST(concat('0x', substr(md5('split:' || CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) % 10 < 8),
       |tb_toks AS MATERIALIZED (SELECT d.doc_id,
       |    CAST(concat('0x', substr(md5('shuffle:epoch0:' || CAST(d.doc_id AS VARCHAR)), 1, 15)) AS BIGINT) AS skey,
       |    len($toksSql)::BIGINT AS n_tokens
       |  FROM documents d JOIN tr USING (doc_id)),
       |tb_ord AS MATERIALIZED (SELECT doc_id, n_tokens,
       |    row_number() OVER (ORDER BY skey, doc_id) - 1 AS pos,
       |    coalesce(sum(n_tokens) OVER (ORDER BY skey, doc_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)::BIGINT AS "offset"
       |  FROM tb_toks WHERE n_tokens > 0)
       |SELECT doc_id, pos, n_tokens, "offset",
       |       "offset" // 512 AS seq_first,
       |       ("offset" + n_tokens - 1) // 512 AS seq_last,
       |       "offset" % 512 AS offset_in_seq FROM tb_ord""".stripMargin

  /** TPC-H Q18 shape: the HAVING filter applies to the ROUNDED quantity sum
    * exactly as the Spark agg does; (totalprice DESC, orderkey) makes the
    * LIMIT deterministic under price ties.
    */
  val tpchQ18: String =
    """WITH big AS MATERIALIZED (SELECT l_orderkey, round(sum(l_quantity), 2) AS sum_qty
      |             FROM lineitem GROUP BY 1
      |             HAVING round(sum(l_quantity), 2) > 250)
      |SELECT c_name, c_custkey, o_orderkey, epoch_ms(o_orderdate) AS o_date_ms,
      |       o_totalprice, sum_qty
      |FROM orders JOIN big ON o_orderkey = l_orderkey
      |JOIN customer ON c_custkey = o_custkey
      |ORDER BY o_totalprice DESC, o_orderkey LIMIT 100""".stripMargin

  /** Q6 shape: same predicate set and exact-decimal product sum. */
  val tpchQ6: String =
    """SELECT CAST(CAST(round(sum(CAST(l_extendedprice AS DECIMAL(12,2))
      |                      * CAST(l_discount AS DECIMAL(4,2))), 2)
      |            AS DECIMAL(18,2)) AS DOUBLE) AS revenue,
      |       count(*) AS n_items
      |FROM lineitem
      |WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      |  AND l_shipdate < TIMESTAMP '1997-01-01'
      |  AND l_discount >= 0.05 AND l_discount <= 0.07
      |  AND l_quantity < 24""".stripMargin

  /** Q10 shape: same pre-aggregate-then-decorate order as the Spark plan
    * (revenue per custkey → top 20 → customer/nation join); exact-decimal
    * revenue, (revenue DESC, custkey) tiebreak.
    */
  val tpchQ10: String =
    """WITH agg AS MATERIALIZED (
      |  SELECT o_custkey,
      |         CAST(CAST(round(sum(CAST(l_extendedprice AS DECIMAL(12,2))
      |                        * (1 - CAST(l_discount AS DECIMAL(4,2)))), 2)
      |              AS DECIMAL(18,2)) AS DOUBLE) AS revenue,
      |         count(*) AS n_items
      |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |  WHERE l_returnflag = 'R'
      |    AND o_orderdate >= TIMESTAMP '1996-01-01'
      |    AND o_orderdate < TIMESTAMP '1996-04-01'
      |  GROUP BY o_custkey
      |  ORDER BY revenue DESC, o_custkey LIMIT 20)
      |SELECT c_custkey, c_name, n_name, revenue, n_items, c_acctbal
      |FROM agg JOIN customer ON o_custkey = c_custkey
      |JOIN nation ON c_nationkey = n_nationkey
      |ORDER BY revenue DESC, c_custkey""".stripMargin

  /** Q12 shape: same year filter, same urgency split; DuckDB's HUGEINT
    * CASE-sums cast back to BIGINT.
    */
  val tpchQ12: String =
    """SELECT l_returnflag,
      |       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH')
      |                     THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
      |       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH')
      |                     THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      |  AND l_shipdate < TIMESTAMP '1997-01-01'
      |GROUP BY l_returnflag""".stripMargin

  /** Q14 shape: exact-decimal revenue sums (round-to-cents matches Spark's
    * HALF_UP decimal cast), DOUBLE out, ppm via exact cent BIGINT floor
    * division (`//` ↔ Spark `div`).
    */
  val tpchQ14: String =
    """WITH j AS MATERIALIZED (
      |  SELECT CAST(l_extendedprice AS DECIMAL(12,2))
      |         * (1 - CAST(l_discount AS DECIMAL(4,2))) AS rev, p_type
      |  FROM lineitem JOIN part ON l_partkey = p_partkey
      |  WHERE l_shipdate >= TIMESTAMP '1996-09-01'
      |    AND l_shipdate < TIMESTAMP '1996-10-01'),
      |a AS MATERIALIZED (
      |  SELECT CAST(round(sum(CASE WHEN p_type = 'PROMO' THEN rev ELSE 0 END), 2)
      |              AS DECIMAL(18,2)) AS promo_d,
      |         CAST(round(sum(rev), 2) AS DECIMAL(18,2)) AS total_d
      |  FROM j)
      |SELECT CAST(promo_d AS DOUBLE) AS promo_rev,
      |       CAST(total_d AS DOUBLE) AS total_rev,
      |       CAST(CAST(promo_d * 100 AS BIGINT) * 1000000
      |            // CAST(total_d * 100 AS BIGINT) AS BIGINT) AS promo_ppm
      |FROM a""".stripMargin

  /** Q4 shape: same quarter, same late-shipment EXISTS (shipdate more than
    * 60 days after the order date — the schema has no commit/receipt
    * dates).
    */
  val tpchQ4: String =
    """SELECT o_orderpriority, count(*)::BIGINT AS order_count
      |FROM orders o
      |WHERE o_orderdate >= TIMESTAMP '1996-07-01'
      |  AND o_orderdate < TIMESTAMP '1996-10-01'
      |  AND EXISTS (SELECT 1 FROM lineitem l
      |              WHERE l.l_orderkey = o.o_orderkey
      |                AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY)
      |GROUP BY o_orderpriority""".stripMargin

  /** Q13 shape: same non-urgent filter inside the outer join, counting
    * order-less customers into the 0 bucket.
    */
  val tpchQ13: String =
    """SELECT c_count, count(*)::BIGINT AS custdist
      |FROM (SELECT c_custkey, count(o_orderkey)::BIGINT AS c_count
      |      FROM customer LEFT OUTER JOIN
      |           (SELECT o_orderkey, o_custkey FROM orders
      |            WHERE o_orderpriority <> '1-URGENT') o
      |        ON c_custkey = o_custkey
      |      GROUP BY c_custkey)
      |GROUP BY c_count""".stripMargin

  /** Q7 shape: same nation pair, same ship-year window, exact-decimal
    * revenue per (supp_nation, cust_nation, year).
    */
  val tpchQ7: String =
    """SELECT supp_nation, cust_nation, l_year,
      |       CAST(CAST(round(sum(rev), 2) AS DECIMAL(18,2)) AS DOUBLE) AS revenue
      |FROM (
      |  SELECT ns.n_name AS supp_nation, nc.n_name AS cust_nation,
      |         year(l_shipdate)::BIGINT AS l_year,
      |         CAST(l_extendedprice AS DECIMAL(12,2))
      |         * (1 - CAST(l_discount AS DECIMAL(4,2))) AS rev
      |  FROM lineitem
      |  JOIN supplier ON l_suppkey = s_suppkey
      |  JOIN nation ns ON s_nationkey = ns.n_nationkey
      |  JOIN orders ON l_orderkey = o_orderkey
      |  JOIN customer ON o_custkey = c_custkey
      |  JOIN nation nc ON c_nationkey = nc.n_nationkey
      |  WHERE ns.n_name IN ('NATION_3','NATION_4')
      |    AND nc.n_name IN ('NATION_3','NATION_4')
      |    AND ns.n_name <> nc.n_name
      |    AND l_shipdate >= TIMESTAMP '1996-01-01'
      |    AND l_shipdate < TIMESTAMP '1998-01-01')
      |GROUP BY 1, 2, 3""".stripMargin

  /** Q8 shape: same snowflake filters; share as exact-cent BIGINT ppm
    * floor division per year (the Q14 rule).
    */
  val tpchQ8: String =
    """WITH j AS MATERIALIZED (
      |  SELECT year(o_orderdate)::BIGINT AS o_year, s_nationkey,
      |         CAST(l_extendedprice AS DECIMAL(12,2))
      |         * (1 - CAST(l_discount AS DECIMAL(4,2))) AS rev
      |  FROM lineitem
      |  JOIN part ON l_partkey = p_partkey
      |  JOIN orders ON l_orderkey = o_orderkey
      |  JOIN customer ON o_custkey = c_custkey
      |  JOIN nation ON c_nationkey = n_nationkey
      |  JOIN region ON n_regionkey = r_regionkey
      |  JOIN supplier ON l_suppkey = s_suppkey
      |  WHERE p_type = 'ECONOMY' AND r_name = 'ASIA'
      |    AND o_orderdate >= TIMESTAMP '1996-01-01'
      |    AND o_orderdate < TIMESTAMP '1998-01-01'),
      |a AS MATERIALIZED (
      |  SELECT o_year,
      |         CAST(round(sum(CASE WHEN s_nationkey = 5 THEN rev ELSE 0 END), 2)
      |              AS DECIMAL(18,2)) AS nation_d,
      |         CAST(round(sum(rev), 2) AS DECIMAL(18,2)) AS total_d
      |  FROM j GROUP BY 1)
      |SELECT o_year, CAST(nation_d AS DOUBLE) AS nation_rev,
      |       CAST(total_d AS DOUBLE) AS total_rev,
      |       CAST(CAST(nation_d * 100 AS BIGINT) * 1000000
      |            // CAST(total_d * 100 AS BIGINT) AS BIGINT) AS mkt_share_ppm
      |FROM a""".stripMargin

  /** Q15 shape: per-supplier exact-decimal quarter revenue, winners (ties
    * kept) by DECIMAL equality against the scalar max, DOUBLE out.
    */
  val tpchQ15: String =
    """WITH rev AS MATERIALIZED (
      |  SELECT l_suppkey,
      |         CAST(round(sum(CAST(l_extendedprice AS DECIMAL(12,2))
      |                        * (1 - CAST(l_discount AS DECIMAL(4,2)))), 2)
      |              AS DECIMAL(18,2)) AS total_d
      |  FROM lineitem
      |  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      |    AND l_shipdate < TIMESTAMP '1996-04-01'
      |  GROUP BY 1)
      |SELECT s_suppkey, s_name, CAST(total_d AS DOUBLE) AS total_rev
      |FROM rev JOIN supplier ON l_suppkey = s_suppkey
      |WHERE total_d = (SELECT max(total_d) FROM rev)
      |ORDER BY s_suppkey""".stripMargin

  /** Q17 shape: same window-derived per-part stats and the exact integer
    * 20%-of-average compare (5·qty·cnt < sum), exact-cent total.
    */
  val tpchQ17: String =
    """WITH l AS MATERIALIZED (
      |  SELECT l_quantity, l_extendedprice,
      |         sum(l_quantity) OVER (PARTITION BY l_partkey) AS sum_qty,
      |         count(*) OVER (PARTITION BY l_partkey) AS cnt
      |  FROM lineitem JOIN part ON l_partkey = p_partkey
      |  WHERE p_brand = 'Brand#3' AND p_size < 10)
      |SELECT CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)))
      |            AS DECIMAL(18,2)) AS DOUBLE) AS total_rev,
      |       CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)))
      |            AS DECIMAL(18,2)) AS DOUBLE) / 7.0 AS avg_yearly,
      |       count(*)::BIGINT AS n_lines
      |FROM l WHERE 5 * l_quantity * cnt < sum_qty""".stripMargin

  /** Q19 shape: same three disjuncts; the hull pushdown is a plan
    * property, not a semantic one, so the oracle states the disjunction
    * directly.
    */
  val tpchQ19: String =
    """SELECT CAST(CAST(round(sum(CAST(l_extendedprice AS DECIMAL(12,2))
      |                      * (1 - CAST(l_discount AS DECIMAL(4,2)))), 2)
      |            AS DECIMAL(18,2)) AS DOUBLE) AS revenue,
      |       count(*)::BIGINT AS n_lines
      |FROM lineitem JOIN part ON l_partkey = p_partkey
      |WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
      |       AND l_quantity BETWEEN 1 AND 11)
      |   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
      |       AND l_quantity BETWEEN 10 AND 20)
      |   OR (p_brand = 'Brand#15' AND p_size BETWEEN 1 AND 15
      |       AND l_quantity BETWEEN 20 AND 30)""".stripMargin

  /** Q21 shape: the same single per-order aggregate replacing the
    * EXISTS/NOT-EXISTS pair (n_supp ≥ 2, n_late = 1, max-late identifies
    * the culprit), late = shipped >60 days after order date.
    */
  val tpchQ21: String =
    """WITH l AS MATERIALIZED (
      |  SELECT l_orderkey, l_suppkey,
      |         l_shipdate > o_orderdate + INTERVAL 60 DAY AS late
      |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |  WHERE o_orderstatus = 'F'),
      |po AS MATERIALIZED (
      |  SELECT l_orderkey, count(DISTINCT l_suppkey) AS n_supp,
      |         count(DISTINCT CASE WHEN late THEN l_suppkey END) AS n_late,
      |         max(CASE WHEN late THEN l_suppkey END) AS late_supp
      |  FROM l GROUP BY 1)
      |SELECT s_name, count(*)::BIGINT AS numwait
      |FROM po
      |JOIN supplier ON late_supp = s_suppkey
      |JOIN nation ON s_nationkey = n_nationkey
      |WHERE n_supp >= 2 AND n_late = 1 AND n_name = 'NATION_3'
      |GROUP BY s_name
      |ORDER BY numwait DESC, s_name""".stripMargin

  /** Q22 shape: exact-decimal cross-multiplied above-average test, recency
    * anti join (no orders since 2000-01-01), exact-cent balance totals.
    */
  val tpchQ22: String =
    """WITH sel AS MATERIALIZED (
      |  SELECT c_custkey, c_nationkey, CAST(c_acctbal AS DECIMAL(12,2)) AS bal
      |  FROM customer WHERE c_nationkey IN (0,1,2,3,4,5,6)),
      |st AS MATERIALIZED (SELECT sum(bal) AS s, count(*)::BIGINT AS n FROM sel WHERE bal > 0)
      |SELECT c_nationkey, count(*)::BIGINT AS numcust,
      |       CAST(CAST(sum(bal) AS DECIMAL(18,2)) AS DOUBLE) AS totacctbal
      |FROM sel, st
      |WHERE bal * n > s
      |  AND NOT EXISTS (SELECT 1 FROM orders
      |                  WHERE o_custkey = c_custkey
      |                    AND o_orderdate >= TIMESTAMP '2000-01-01')
      |GROUP BY 1""".stripMargin

  /** PMI collocations — same tokenizer, same min-count, and the lift
    * expression written with the IDENTICAL operation tree (left-assoc
    * double multiplies over exact integer counts, one divide) so the
    * doubles are bit-equal cross-engine.
    */
  val collocations: String =
    s"""WITH tok AS MATERIALIZED (SELECT $toksSql AS toks FROM documents),
       |uni AS MATERIALIZED (SELECT w, count(*)::BIGINT AS n
       |        FROM (SELECT unnest(toks) AS w FROM tok) GROUP BY 1),
       |bi AS MATERIALIZED (SELECT toks[i] AS w1, toks[i+1] AS w2
       |       FROM tok, unnest(generate_series(1, len(toks) - 1)) AS t(i)
       |       WHERE len(toks) >= 2),
       |biAll AS MATERIALIZED (SELECT w1, w2, count(*)::BIGINT AS n12 FROM bi GROUP BY 1, 2),
       |tot AS MATERIALIZED (SELECT (SELECT sum(n) FROM uni)::BIGINT AS n_tok,
       |               (SELECT sum(n12) FROM biAll)::BIGINT AS n_big)
       |SELECT w1, w2, n12, u1.n AS n1, u2.n AS n2,
       |       CAST(n12 AS DOUBLE) * n_tok * n_tok
       |       / (CAST(n_big AS DOUBLE) * u1.n * u2.n) AS lift
       |FROM biAll JOIN uni u1 ON w1 = u1.w JOIN uni u2 ON w2 = u2.w, tot
       |WHERE n12 >= 5
       |ORDER BY lift DESC, w1, w2 LIMIT 50""".stripMargin

  /** Bigram-LM document score — same tokenizer, same bigram fan-out, and
    * the probability arithmetic written as the IDENTICAL integer operation
    * tree (c12·10⁶ // c1, tf-weighted floor mean) so the scores are
    * bit-equal cross-engine. The denominator is the bigram-left count
    * (Σ_w c(w1,w)), matching the Spark window exactly.
    */
  val lmScore: String =
    s"""WITH tok AS MATERIALIZED (SELECT doc_id, $toksSql AS toks FROM documents),
       |bi AS MATERIALIZED (SELECT doc_id, toks[i] AS w1, toks[i+1] AS w2
       |       FROM tok, unnest(generate_series(1, len(toks) - 1)) AS t(i)
       |       WHERE len(toks) >= 2),
       |agg AS MATERIALIZED (SELECT doc_id, w1, w2, count(*)::BIGINT AS tf FROM bi GROUP BY 1, 2, 3),
       |c AS MATERIALIZED (SELECT doc_id, tf,
       |             sum(tf) OVER (PARTITION BY w1) AS c1,
       |             sum(tf) OVER (PARTITION BY w1, w2) AS c12 FROM agg)
       |SELECT doc_id, CAST(sum(tf) AS BIGINT) AS n_bigrams,
       |       CAST(sum(tf * (c12 * 1000000 // c1)) // sum(tf) AS BIGINT) AS lm_ppm
       |FROM c GROUP BY doc_id""".stripMargin

  /** DSIR hashed-bigram CTEs shared by [[dsirWeight]] and [[dsirResample]]:
    * bigram strings joined with single spaces (same construction as
    * [[repetition]]'s g2), hash60 % 4096 buckets, add-1-smoothed
    * target/raw ratio in ppm, per-doc floor-mean — all-integer, so the
    * scores are bit-identical cross-engine.
    */
  private val dsirCtes: String =
    s"""tok AS MATERIALIZED (SELECT doc_id, lang, $toksSql AS toks FROM documents),
       |occ AS MATERIALIZED (SELECT doc_id, lang, h % 4096 AS b FROM (
       |    SELECT doc_id, lang,
       |      unnest([$hash60Sql FOR s IN
       |              [array_to_string(toks[i:i+1], ' ') FOR i IN range(1, len(toks))]]) AS h
       |    FROM tok WHERE len(toks) >= 2)),
       |model AS MATERIALIZED (SELECT b,
       |    CAST((sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) + 1) * 1000000
       |         // (count(*) + 1) AS BIGINT) AS r_ppm
       |  FROM occ GROUP BY b),
       |w AS MATERIALIZED (SELECT doc_id, count(*)::BIGINT AS n_bigrams,
       |        CAST(sum(r_ppm) // count(*) AS BIGINT) AS dsir_ppm
       |      FROM occ JOIN model USING (b) GROUP BY doc_id)""".stripMargin

  val dsirWeight: String =
    s"""WITH $dsirCtes
       |SELECT doc_id, n_bigrams, dsir_ppm FROM w""".stripMargin

  /** Salted portable-hash acceptance at the DSIR weight rate (the
    * [[domainMix]] construction with salt "dsir:").
    */
  val dsirResample: String =
    s"""WITH $dsirCtes
       |SELECT doc_id, n_bigrams, dsir_ppm FROM w
       |WHERE CAST(concat('0x', substr(md5('dsir:' || CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT)
       |      % 1000000 < dsir_ppm""".stripMargin

  /** Cluster-balanced prototype pruning: same seed codebook + assignment
    * arithmetic as [[annIvf]] (first-16 centroids, dist ties to the lower
    * cid), distances integer-scaled with the [[annIvfPq]] floor(·10⁶)
    * convention before the per-cell top-10 ranking.
    */
  val clusterPrune: String =
    """WITH v AS MATERIALIZED (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
      |cen AS MATERIALIZED (SELECT (row_number() OVER (ORDER BY vec_id) - 1) AS cid, e AS ce
      |        FROM v WHERE vec_id < 16),
      |d AS MATERIALIZED (SELECT v.vec_id, cen.cid,
      |        (list_dot_product(e, e) - 2 * list_dot_product(e, ce)
      |         + list_dot_product(ce, ce)) AS dist
      |      FROM v, cen),
      |a AS MATERIALIZED (SELECT vec_id, cid, dist,
      |        row_number() OVER (PARTITION BY vec_id ORDER BY dist, cid) AS r FROM d),
      |asg AS MATERIALIZED (SELECT vec_id, cid, CAST(floor(dist * 1000000) AS BIGINT) AS dist6
      |        FROM a WHERE r = 1),
      |rr AS MATERIALIZED (SELECT cid, vec_id, dist6,
      |         row_number() OVER (PARTITION BY cid ORDER BY dist6, vec_id) AS rk FROM asg)
      |SELECT CAST(cid AS BIGINT) AS cid, rk, vec_id, dist6 FROM rr WHERE rk <= 10""".stripMargin

  /** The derived partsupp relation shared by the Q2/Q9/Q11/Q16/Q20
    * oracles — cheapest observed sale per (part, supplier) pair; min over
    * exact-2dp doubles, so no decimal accumulation is needed.
    */
  private val psSql: String =
    """ps AS MATERIALIZED (SELECT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey,
      |             min(l_extendedprice) AS ps_supplycost
      |      FROM lineitem GROUP BY 1, 2)""".stripMargin

  /** Q2 shape: correlated MIN via the same window, same EUROPE snowflake
    * filter, same deterministic top-100 total order. The double equality
    * is sound: both sides are the min of the SAME set of exact 2dp values.
    */
  val tpchQ2: String =
    s"""WITH $psSql,
       |es AS MATERIALIZED (SELECT s_suppkey, s_name, s_acctbal, n_name
       |       FROM supplier JOIN nation ON s_nationkey = n_nationkey
       |       JOIN region ON n_regionkey = r_regionkey WHERE r_name = 'EUROPE'),
       |cand AS MATERIALIZED (SELECT p_partkey, p_brand, s_suppkey, s_name, s_acctbal, n_name,
       |                ps_supplycost,
       |                min(ps_supplycost) OVER (PARTITION BY p_partkey) AS mincost
       |         FROM ps JOIN es ON ps_suppkey = s_suppkey
       |         JOIN part ON ps_partkey = p_partkey
       |         WHERE p_type = 'LARGE' AND p_size <= 10)
       |SELECT s_acctbal, s_name, n_name, p_partkey, p_brand
       |FROM cand WHERE ps_supplycost = mincost
       |ORDER BY s_acctbal DESC, n_name, s_name, p_partkey, s_suppkey LIMIT 100""".stripMargin

  /** Q9 shape: same 6-relation join tree, margin = exact-decimal revenue
    * minus the pair's supplycost, summed exact and rounded to cents
    * (round(), matching Spark's HALF_UP decimal(18,2) cast).
    */
  val tpchQ9: String =
    s"""WITH $psSql
       |SELECT n_name AS nation, year(o_orderdate)::BIGINT AS o_year,
       |       CAST(round(sum(CAST(l_extendedprice AS DECIMAL(12,2))
       |               * (1 - CAST(l_discount AS DECIMAL(4,2)))
       |             - CAST(ps_supplycost AS DECIMAL(12,2))), 2) AS DOUBLE) AS sum_profit
       |FROM lineitem
       |JOIN ps ON l_partkey = ps_partkey AND l_suppkey = ps_suppkey
       |JOIN part ON l_partkey = p_partkey
       |JOIN supplier ON l_suppkey = s_suppkey
       |JOIN nation ON s_nationkey = n_nationkey
       |JOIN orders ON l_orderkey = o_orderkey
       |WHERE p_name LIKE '%widget%'
       |GROUP BY 1, 2""".stripMargin

  /** Q11 shape: same ASIA supplier semi-join, exact-decimal per-part value
    * vs the same cross-multiplied 1/1000 global threshold.
    */
  val tpchQ11: String =
    s"""WITH $psSql,
       |v AS MATERIALIZED (SELECT ps_partkey, sum(CAST(ps_supplycost AS DECIMAL(12,2))) AS val
       |      FROM ps
       |      WHERE ps_suppkey IN (SELECT s_suppkey FROM supplier
       |                           JOIN nation ON s_nationkey = n_nationkey
       |                           JOIN region ON n_regionkey = r_regionkey
       |                           WHERE r_name = 'ASIA')
       |      GROUP BY 1),
       |tot AS MATERIALIZED (SELECT sum(val) AS t FROM v)
       |SELECT ps_partkey, CAST(CAST(val AS DECIMAL(18,2)) AS DOUBLE) AS value
       |FROM v, tot WHERE val * 1000 > t
       |ORDER BY value DESC, ps_partkey""".stripMargin

  /** Q16 shape: same negative-balance denylist via NOT IN, same part
    * attribute filter, COUNT DISTINCT suppliers.
    */
  val tpchQ16: String =
    s"""WITH $psSql
       |SELECT p_brand, p_type, p_size,
       |       count(DISTINCT ps_suppkey)::BIGINT AS supplier_cnt
       |FROM ps JOIN part ON ps_partkey = p_partkey
       |WHERE p_brand <> 'Brand#1' AND p_size IN (1,5,9,13,17,21,25,29)
       |  AND ps_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
       |GROUP BY 1, 2, 3
       |ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""".stripMargin

  /** Q20 shape: same pushed 1998 shipdate range, same red-part prefix,
    * exact-BIGINT quantity sums, same 2·q > part-total dominance test,
    * same EUROPE listing.
    */
  val tpchQ20: String =
    """WITH sp AS MATERIALIZED (
      |  SELECT l_partkey, l_suppkey, sum(CAST(l_quantity AS BIGINT)) AS q
      |  FROM lineitem
      |  WHERE l_shipdate >= TIMESTAMP '1998-01-01'
      |    AND l_shipdate < TIMESTAMP '1999-01-01'
      |    AND l_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE 'red %')
      |  GROUP BY 1, 2),
      |pt AS MATERIALIZED (SELECT l_partkey, sum(q) AS qp FROM sp GROUP BY 1)
      |SELECT s_name, s_acctbal
      |FROM supplier JOIN nation ON s_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |WHERE r_name = 'EUROPE'
      |  AND s_suppkey IN (SELECT l_suppkey FROM sp JOIN pt USING (l_partkey)
      |                    WHERE 2 * q > qp)
      |ORDER BY s_name""".stripMargin

  /** OOV ppm vs the en-docs vocabulary — same token filter, same left-join
    * null test, same integer floor division.
    */
  val oovRate: String =
    s"""WITH tok AS MATERIALIZED (SELECT doc_id, lang, unnest($toksSql) AS tok FROM documents),
       |v AS MATERIALIZED (SELECT DISTINCT tok FROM tok WHERE lang = 'en')
       |SELECT t.doc_id, t.lang, count(*)::BIGINT AS n_tokens,
       |       (count(*) FILTER (v.tok IS NULL))::BIGINT AS n_oov,
       |       ((count(*) FILTER (v.tok IS NULL)) * 1000000 // count(*))::BIGINT AS oov_ppm
       |FROM tok t LEFT JOIN v ON t.tok = v.tok
       |GROUP BY 1, 2""".stripMargin

  val dedupSimhash: String =
    s"""WITH t AS MATERIALIZED (SELECT doc_id, list_transform($toksSql, s -> $hash60Sql) AS hs FROM documents)
       |SELECT doc_id, CAST(list_sum([CASE WHEN list_sum([CASE WHEN ((h >> b) & 1) = 1 THEN 1 ELSE -1 END FOR h IN hs]) > 0
       |       THEN (1::BIGINT << b) ELSE 0 END FOR b IN range(60)]) AS BIGINT) AS simhash FROM t""".stripMargin

  /** The shared pair derivation of [[ngramJaccard]]/[[ngramTopK]], ending
    * in CTE `f` (d1 < d2, jac ≥ 0.35). The per-pair formulation
    * (`list_intersect` inside a bucket self-join of the 50k-row gram
    * table) ran in ONE DuckDB pipeline task — the gram table fits a
    * single row group, so ~57M list intersections went single-threaded
    * (measured ~50 min at sf1). This unnest + gram-equality join +
    * group-count form computes the same |A∩B| (grams are list_distinct'd
    * before unnest) with a parallel vectorized hash join; pairs with zero
    * shared grams drop out of the join, but their jac = 0 < 0.35 anyway.
    * jac = sh / (|A| + |B| − sh) ≡ len(list_distinct(concat)) exactly.
    */
  private val ngramPairCtes: String =
    s"""g AS MATERIALIZED (SELECT doc_id, (n_chars // 25) AS bucket,
       |            list_distinct([ CAST((((least(ord(substr(text, i, 1)), 255) * 256
       |                + least(ord(substr(text, i + 1, 1)), 255)) * 256
       |                + least(ord(substr(text, i + 2, 1)), 255)) * 256
       |                + least(ord(substr(text, i + 3, 1)), 255)) AS BIGINT)
       |              FOR i IN range(1, len(text) - 2) ]) AS grams
       |           FROM documents),
       |sz AS MATERIALIZED (SELECT doc_id, len(grams)::BIGINT AS n FROM g),
       |e AS MATERIALIZED (SELECT doc_id, bucket, unnest(grams) AS gram FROM g),
       |shared AS MATERIALIZED (SELECT x.doc_id AS d1, y.doc_id AS d2, count(*)::BIGINT AS sh
       |        FROM e x JOIN e y ON x.gram = y.gram AND x.bucket = y.bucket
       |          AND x.doc_id < y.doc_id
       |        GROUP BY 1, 2),
       |f AS MATERIALIZED (SELECT d1, d2, jac FROM (
       |        SELECT d1, d2, round(sh::DOUBLE / (a.n + b.n - sh), 6) AS jac
       |        FROM shared JOIN sz a ON d1 = a.doc_id JOIN sz b ON d2 = b.doc_id) j
       |      WHERE jac >= 0.35)""".stripMargin

  val ngramJaccard: String =
    s"""WITH $ngramPairCtes
       |SELECT d1, d2, jac FROM f""".stripMargin

  /** [[ngramJaccard]]'s pair derivation, mirrored to both directions and
    * capped to each doc's top-3 by (jac DESC, nbr) — the output-bounded
    * variant.
    */
  val ngramTopK: String =
    s"""WITH $ngramPairCtes,
       |sym AS MATERIALIZED (SELECT d1 AS doc_id, d2 AS nbr, jac FROM f
       |        UNION ALL
       |        SELECT d2 AS doc_id, d1 AS nbr, jac FROM f),
       |r AS MATERIALIZED (SELECT doc_id, nbr, jac,
       |        row_number() OVER (PARTITION BY doc_id ORDER BY jac DESC, nbr) AS rk
       |      FROM sym)
       |SELECT doc_id, rk, nbr, jac FROM r WHERE rk <= 3""".stripMargin

  /** Cell-blocked near-dup pairs: the same seed-codebook cells, assignment
    * tie-break ((dist, cid) row_number) and cell-count derivation
    * (`clamp(n/250, 16, 65536)`) as the Spark plan, then within-cell pairs
    * with rounded cosine ≥ threshold.
    */
  val dedupEmbedding: String =
    """WITH v AS MATERIALIZED (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
      |n AS MATERIALIZED (SELECT vec_id, e, sqrt(list_dot_product(e, e)) AS nrm FROM v),
      |cen AS MATERIALIZED (SELECT (row_number() OVER (ORDER BY vec_id) - 1) AS cid, e AS ce
      |        FROM v WHERE vec_id < (SELECT least(65536, greatest(16, count(*) // 250)) FROM v)),
      |d AS MATERIALIZED (SELECT n.vec_id, cen.cid,
      |        (list_dot_product(e, e) - 2 * list_dot_product(e, ce)
      |         + list_dot_product(ce, ce)) AS dist
      |      FROM n, cen),
      |assign AS MATERIALIZED (SELECT vec_id, cid FROM (
      |    SELECT vec_id, cid, row_number() OVER (PARTITION BY vec_id ORDER BY dist, cid) AS r
      |    FROM d) t WHERE r = 1),
      |a AS MATERIALIZED (SELECT n.vec_id, cid, e, nrm FROM n JOIN assign USING (vec_id)),
      |p AS MATERIALIZED (SELECT x.vec_id AS id1, y.vec_id AS id2,
      |        round(list_dot_product(x.e, y.e) / (x.nrm * y.nrm), 4) AS cos4
      |      FROM a x JOIN a y ON x.cid = y.cid AND x.vec_id < y.vec_id)
      |SELECT id1, id2, cos4 FROM p WHERE cos4 >= 0.4""".stripMargin

  /** C55 q_decontaminate_semantic — the embedding-level benchmark leak
    * check: per corpus vector, the rk=1 closest benchmark vector (cosine
    * 4dp, ties to the smallest bench id — the window here selects exactly
    * the row Spark's max(struct(cos4, −bench_id)) reduction picks).
    */
  val decontaminateSemantic: String =
    """WITH v AS MATERIALIZED (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
      |n AS MATERIALIZED (SELECT vec_id, e, sqrt(list_dot_product(e, e)) AS nrm FROM v),
      |b AS MATERIALIZED (SELECT vec_id AS bench_id, e AS be, nrm AS bn FROM n WHERE vec_id % 50 = 0 AND vec_id < 5000),
      |c AS MATERIALIZED (SELECT vec_id, e, nrm FROM n WHERE vec_id % 50 <> 0 OR vec_id >= 5000),
      |p AS MATERIALIZED (SELECT c.vec_id, b.bench_id,
      |        round(list_dot_product(c.e, b.be) / (c.nrm * b.bn), 4) AS cos4
      |      FROM c, b),
      |r AS MATERIALIZED (SELECT vec_id, bench_id, cos4,
      |        row_number() OVER (PARTITION BY vec_id ORDER BY cos4 DESC, bench_id) AS rk
      |      FROM p)
      |SELECT vec_id, bench_id, cos4, cos4 >= 0.25 AS contaminated
      |FROM r WHERE rk = 1""".stripMargin

  /** q_benchmark_exposure — the per-ITEM transpose of [[decontaminate]]
    * and [[decontaminateSemantic]]: same gram hash (md5 60-bit), same
    * cosine/tie convention, both modalities keyed by the benchmark id
    * under the capped membership rule (id % 50 = 0 AND id < 5000), full
    * outer across the two tables' item sets.
    */
  val benchmarkExposure: String =
    s"""WITH tok AS MATERIALIZED (SELECT doc_id, $toksSql AS w FROM documents),
       |d AS MATERIALIZED (SELECT doc_id,
       |        list_distinct([ array_to_string(w[i:i+7], ' ') FOR i IN range(1, len(w) - 6) ]) AS gs
       |      FROM tok WHERE len(w) >= 8),
       |g AS MATERIALIZED (SELECT doc_id, CAST(concat('0x', substr(md5(s), 1, 15)) AS BIGINT) AS g
       |      FROM (SELECT doc_id, unnest(gs) AS s FROM d)),
       |bg AS MATERIALIZED (SELECT doc_id AS item_id, g FROM g WHERE doc_id % 50 = 0 AND doc_id < 5000),
       |cg AS MATERIALIZED (SELECT doc_id, g FROM g WHERE doc_id % 50 <> 0 OR doc_id >= 5000),
       |ng AS MATERIALIZED (SELECT item_id, count(DISTINCT c.doc_id)::BIGINT AS n_leak_docs,
       |        count(DISTINCT b.g)::BIGINT AS n_leak_grams
       |      FROM bg b JOIN cg c USING (g) GROUP BY 1),
       |items AS MATERIALIZED (SELECT i.item_id, coalesce(ng.n_leak_docs, 0)::BIGINT AS n_leak_docs,
       |        coalesce(ng.n_leak_grams, 0)::BIGINT AS n_leak_grams
       |      FROM (SELECT doc_id AS item_id FROM documents WHERE doc_id % 50 = 0 AND doc_id < 5000) i
       |      LEFT JOIN ng USING (item_id)),
       |v AS MATERIALIZED (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
       |nv AS MATERIALIZED (SELECT vec_id, e, sqrt(list_dot_product(e, e)) AS nrm FROM v),
       |b AS MATERIALIZED (SELECT vec_id AS item_id, e AS be, nrm AS bn FROM nv WHERE vec_id % 50 = 0 AND vec_id < 5000),
       |c AS MATERIALIZED (SELECT vec_id, e, nrm FROM nv WHERE vec_id % 50 <> 0 OR vec_id >= 5000),
       |p AS MATERIALIZED (SELECT b.item_id, c.vec_id,
       |        round(list_dot_product(c.e, b.be) / (c.nrm * b.bn), 4) AS cos4
       |      FROM b, c),
       |sem AS MATERIALIZED (SELECT item_id, vec_id AS nearest_vec, cos4 AS nearest_cos4 FROM (
       |        SELECT item_id, vec_id, cos4,
       |          row_number() OVER (PARTITION BY item_id ORDER BY cos4 DESC, vec_id) AS rk
       |        FROM p) t WHERE rk = 1)
       |SELECT item_id, n_leak_docs, n_leak_grams, nearest_vec, nearest_cos4,
       |       (coalesce(n_leak_docs, 0) > 0
       |        OR coalesce(nearest_cos4 >= 0.25, false)) AS exposed
       |FROM items FULL JOIN sem USING (item_id)""".stripMargin

  val annBruteForce: String =
    """WITH v AS MATERIALIZED (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
      |n AS MATERIALIZED (SELECT vec_id, e, sqrt(list_dot_product(e, e)) AS nrm FROM v),
      |q AS MATERIALIZED (SELECT * FROM n WHERE vec_id < 20),
      |p AS MATERIALIZED (SELECT q.vec_id AS query_id, n.vec_id AS neighbor_id,
      |        round(list_dot_product(q.e, n.e) / (q.nrm * n.nrm), 4) AS cos4
      |      FROM q JOIN n ON n.vec_id <> q.vec_id),
      |r AS MATERIALIZED (SELECT query_id, neighbor_id, cos4,
      |        row_number() OVER (PARTITION BY query_id ORDER BY cos4 DESC, neighbor_id) AS rk
      |      FROM p)
      |SELECT query_id, rk, neighbor_id, cos4 FROM r WHERE rk <= 5""".stripMargin

  /** C6b q_ann_filtered — the metadata-constrained exact search: same
    * device as [[annBruteForce]] with the label predicate INSIDE the
    * candidate join (pre-filter).
    */
  val annFiltered: String =
    """WITH v AS MATERIALIZED (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
      |n AS MATERIALIZED (SELECT vec_id, label, e, sqrt(list_dot_product(e, e)) AS nrm FROM v),
      |q AS MATERIALIZED (SELECT * FROM n WHERE vec_id < 20),
      |p AS MATERIALIZED (SELECT q.vec_id AS query_id, n.vec_id AS neighbor_id, n.label,
      |        round(list_dot_product(q.e, n.e) / (q.nrm * n.nrm), 4) AS cos4
      |      FROM q JOIN n ON n.label = q.label AND n.vec_id <> q.vec_id),
      |r AS MATERIALIZED (SELECT query_id, neighbor_id, label, cos4,
      |        row_number() OVER (PARTITION BY query_id ORDER BY cos4 DESC, neighbor_id) AS rk
      |      FROM p)
      |SELECT query_id, rk, neighbor_id, label, cos4 FROM r WHERE rk <= 5""".stripMargin

  /** Full LSH pipeline re-derived in SQL: the hyperplanes are integer
    * arithmetic ((p*64+d)*2654435761 mod 1000003, scaled), so DuckDB
    * reconstructs bit-identical buckets, candidates and re-ranking.
    */
  val annLsh: String =
    """WITH v AS MATERIALIZED (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
      |n AS MATERIALIZED (SELECT vec_id, e, sqrt(list_dot_product(e, e)) AS nrm FROM v),
      |planes AS MATERIALIZED (
      |  SELECT t, j,
      |    [ ((((t*4 + j)*64 + d) * 2654435761) % 1000003) / 1000003.0 - 0.5 FOR d IN range(64) ] AS w
      |  FROM (SELECT unnest(range(8)) AS t) tt, (SELECT unnest(range(4)) AS j) jj),
      |bt AS MATERIALIZED (SELECT vec_id, t,
      |         CAST(sum(CASE WHEN list_dot_product(e, w) > 0 THEN (1::BIGINT << j) ELSE 0 END) AS BIGINT) AS bucket
      |       FROM n, planes GROUP BY vec_id, t),
      |cand AS MATERIALIZED (SELECT DISTINCT a.vec_id AS qid, b.vec_id AS nid
      |         FROM bt a JOIN bt b ON a.t = b.t AND a.bucket = b.bucket
      |         WHERE a.vec_id < 20 AND b.vec_id <> a.vec_id),
      |scored AS MATERIALIZED (SELECT qid AS query_id, nid AS neighbor_id,
      |             round(list_dot_product(q.e, x.e) / (q.nrm * x.nrm), 4) AS cos4
      |           FROM cand JOIN n q ON qid = q.vec_id JOIN n x ON nid = x.vec_id),
      |r AS MATERIALIZED (SELECT query_id, neighbor_id, cos4,
      |        row_number() OVER (PARTITION BY query_id ORDER BY cos4 DESC, neighbor_id) AS rk
      |      FROM scored)
      |SELECT query_id, rk, neighbor_id, cos4 FROM r WHERE rk <= 5""".stripMargin

  /** C7g multi-probe LSH: same corpus bucket table as [[annLsh]]; the
    * query side additionally probes the buckets reached by flipping the
    * two lowest-|dot|-margin sign bits (ties by plane index) and their
    * combination. Dots are the same sequential sum both engines compute
    * bit-identically; probes are integer XOR — fully re-derived here.
    */
  val annMultiprobe: String =
    """WITH v AS MATERIALIZED (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
      |n AS MATERIALIZED (SELECT vec_id, e, sqrt(list_dot_product(e, e)) AS nrm FROM v),
      |planes AS MATERIALIZED (
      |  SELECT t, j,
      |    [ ((((t*4 + j)*64 + d) * 2654435761) % 1000003) / 1000003.0 - 0.5 FOR d IN range(64) ] AS w
      |  FROM (SELECT unnest(range(8)) AS t) tt, (SELECT unnest(range(4)) AS j) jj),
      |bt AS MATERIALIZED (SELECT vec_id, t,
      |         CAST(sum(CASE WHEN list_dot_product(e, w) > 0 THEN (1::BIGINT << j) ELSE 0 END) AS BIGINT) AS bucket
      |       FROM n, planes GROUP BY vec_id, t),
      |qd AS MATERIALIZED (SELECT vec_id, t, j, list_dot_product(e, w) AS dot
      |      FROM n, planes WHERE vec_id < 20),
      |qb AS MATERIALIZED (SELECT vec_id, t,
      |         CAST(sum(CASE WHEN dot > 0 THEN (1::BIGINT << j) ELSE 0 END) AS BIGINT) AS bucket
      |       FROM qd GROUP BY vec_id, t),
      |fl AS MATERIALIZED (SELECT vec_id, t, j,
      |        row_number() OVER (PARTITION BY vec_id, t ORDER BY abs(dot), j) AS fr FROM qd),
      |f1 AS MATERIALIZED (SELECT vec_id, t, (1::BIGINT << j) AS m1 FROM fl WHERE fr = 1),
      |f2 AS MATERIALIZED (SELECT vec_id, t, (1::BIGINT << j) AS m2 FROM fl WHERE fr = 2),
      |pr AS MATERIALIZED (SELECT vec_id, t,
      |        unnest([bucket, xor(bucket, m1), xor(bucket, m2), xor(xor(bucket, m1), m2)]) AS bucket
      |      FROM qb JOIN f1 USING (vec_id, t) JOIN f2 USING (vec_id, t)),
      |cand AS MATERIALIZED (SELECT DISTINCT p.vec_id AS qid, b.vec_id AS nid
      |         FROM pr p JOIN bt b ON p.t = b.t AND p.bucket = b.bucket
      |         WHERE b.vec_id <> p.vec_id),
      |scored AS MATERIALIZED (SELECT qid AS query_id, nid AS neighbor_id,
      |             round(list_dot_product(q.e, x.e) / (q.nrm * x.nrm), 4) AS cos4
      |           FROM cand JOIN n q ON qid = q.vec_id JOIN n x ON nid = x.vec_id),
      |r AS MATERIALIZED (SELECT query_id, neighbor_id, cos4,
      |        row_number() OVER (PARTITION BY query_id ORDER BY cos4 DESC, neighbor_id) AS rk
      |      FROM scored)
      |SELECT query_id, rk, neighbor_id, cos4 FROM r WHERE rk <= 5""".stripMargin

  /** IVF search with the raw seed codebook (first 16 vectors): assignment,
    * nprobe=4 probing and re-ranking re-derived in SQL. Distances use the
    * same expansion as the Spark plan: |e|² - 2·e·c + |c|².
    */
  val annIvf: String =
    """WITH v AS MATERIALIZED (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
      |n AS MATERIALIZED (SELECT vec_id, e, sqrt(list_dot_product(e, e)) AS nrm FROM v),
      |cen AS MATERIALIZED (SELECT (row_number() OVER (ORDER BY vec_id) - 1) AS cid, e AS ce
      |        FROM v WHERE vec_id < 16),
      |d AS MATERIALIZED (SELECT n.vec_id, cen.cid,
      |        (list_dot_product(e, e) - 2 * list_dot_product(e, ce)
      |         + list_dot_product(ce, ce)) AS dist
      |      FROM n, cen),
      |ranked AS MATERIALIZED (SELECT vec_id, cid, dist,
      |             row_number() OVER (PARTITION BY vec_id ORDER BY dist, cid) AS r FROM d),
      |assign AS MATERIALIZED (SELECT vec_id, cid FROM ranked WHERE r = 1),
      |probes AS MATERIALIZED (SELECT vec_id AS qid, cid FROM ranked WHERE vec_id < 20 AND r <= 4),
      |cand AS MATERIALIZED (SELECT DISTINCT p.qid, a.vec_id AS nid
      |         FROM probes p JOIN assign a ON p.cid = a.cid WHERE a.vec_id <> p.qid),
      |scored AS MATERIALIZED (SELECT qid AS query_id, nid AS neighbor_id,
      |             round(list_dot_product(q.e, x.e) / (q.nrm * x.nrm), 4) AS cos4
      |           FROM cand JOIN n q ON qid = q.vec_id JOIN n x ON nid = x.vec_id),
      |rr AS MATERIALIZED (SELECT query_id, neighbor_id, cos4,
      |         row_number() OVER (PARTITION BY query_id ORDER BY cos4 DESC, neighbor_id) AS rk
      |       FROM scored)
      |SELECT query_id, rk, neighbor_id, cos4 FROM rr WHERE rk <= 5""".stripMargin

  /** Same salted hash construction as Curation.hashSplit (engine-portable
    * md5-prefix bucket).
    */
  val hashSplit: String =
    """SELECT doc_id, source,
      |  CASE WHEN b < 8 THEN 'train' WHEN b = 8 THEN 'val' ELSE 'test' END AS split
      |FROM (SELECT doc_id, source,
      |        CAST(concat('0x', substr(md5('split:' || CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) % 10 AS b
      |      FROM documents) t""".stripMargin

  /** Exact-integer tf-idf: same floor-division formula as Curation.tfidf. */
  val tfidf: String =
    """WITH tok2 AS MATERIALIZED (SELECT doc_id, word
      |  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents) u
      |  WHERE word <> ''),
      |tf AS MATERIALIZED (SELECT doc_id, word, count(*) AS tf FROM tok2 GROUP BY 1, 2),
      |dlen AS MATERIALIZED (SELECT doc_id, count(*) AS dlen FROM tok2 GROUP BY 1),
      |dfreq AS MATERIALIZED (SELECT word, count(*) AS df FROM tf GROUP BY 1),
      |n AS MATERIALIZED (SELECT count(*) AS n_docs FROM documents),
      |s AS MATERIALIZED (SELECT tf.doc_id, tf.word,
      |        CAST((tf.tf * 1000000 * n.n_docs) // (dlen.dlen * dfreq.df) AS BIGINT) AS tfidf_scaled
      |      FROM tf CROSS JOIN n
      |      JOIN dlen ON tf.doc_id = dlen.doc_id
      |      JOIN dfreq ON tf.word = dfreq.word)
      |SELECT doc_id, rk, word, tfidf_scaled
      |FROM (SELECT *, row_number() OVER (PARTITION BY doc_id ORDER BY tfidf_scaled DESC, word) AS rk
      |      FROM s) r
      |WHERE rk <= 3""".stripMargin

  /** Plain equi-join — the salted Spark plan must be row-identical. */
  val saltedJoin: String =
    """SELECT s_name,
      |       CAST(CAST(round(sum(CAST(l_extendedprice AS DECIMAL(12,2))
      |                      * (1 - CAST(l_discount AS DECIMAL(4,2)))), 2)
      |            AS DECIMAL(18,2)) AS DOUBLE) AS revenue,
      |       count(*) AS n_items
      |FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
      |GROUP BY s_name""".stripMargin

  val hashSample: String =
    """SELECT doc_id, source FROM (
      |  SELECT doc_id, source,
      |    CAST(concat('0x', substr(md5('sample:' || CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) AS h
      |  FROM documents ORDER BY h LIMIT 50) t""".stripMargin

  val vocabPerSource: String =
    """SELECT source, string_agg(DISTINCT word, ',' ORDER BY word) AS vocab,
      |       count(DISTINCT word) AS n_vocab
      |FROM (SELECT source, unnest(string_split(text, ' ')) AS word FROM documents) t
      |WHERE word <> '' GROUP BY source""".stripMargin

  /** Full PQ pipeline re-derived in SQL: seed sub-codebooks, per-vector
    * code assignment (argmin with k tiebreak), integer-scaled ADC distance
    * tables, 8-lookup sums and final ranking. Integer scaling before the
    * sum makes the score order-independent and exactly portable.
    */
  val annPq: String =
    """WITH v AS MATERIALIZED (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
      |mm AS MATERIALIZED (SELECT unnest(range(8)) AS m),
      |cen AS MATERIALIZED (SELECT m, (row_number() OVER (PARTITION BY m ORDER BY vec_id) - 1) AS k,
      |               e[(8*m+1):(8*m+8)] AS csub
      |        FROM v, mm WHERE vec_id < 16),
      |sub AS MATERIALIZED (SELECT vec_id, m, e[(8*m+1):(8*m+8)] AS s FROM v, mm),
      |d AS MATERIALIZED (SELECT sub.vec_id, sub.m, cen.k,
      |        (list_dot_product(s, s) - 2*list_dot_product(s, csub)
      |         + list_dot_product(csub, csub)) AS dist
      |      FROM sub JOIN cen ON sub.m = cen.m),
      |codes AS MATERIALIZED (SELECT vec_id, m, k FROM (
      |    SELECT vec_id, m, k, row_number() OVER (PARTITION BY vec_id, m ORDER BY dist, k) AS r
      |    FROM d) t
      |  WHERE r = 1),
      |qtab AS MATERIALIZED (SELECT vec_id AS query_id, m, k, CAST(floor(dist * 1000000) AS BIGINT) AS dq
      |         FROM d WHERE vec_id < 20),
      |pairs AS MATERIALIZED (SELECT q.query_id, c.vec_id AS neighbor_id, CAST(sum(q.dq) AS BIGINT) AS adc_scaled
      |          FROM codes c JOIN qtab q ON q.m = c.m AND q.k = c.k
      |          WHERE c.vec_id <> q.query_id
      |          GROUP BY 1, 2),
      |r AS MATERIALIZED (SELECT query_id, neighbor_id, adc_scaled,
      |        row_number() OVER (PARTITION BY query_id ORDER BY adc_scaled, neighbor_id) AS rk
      |      FROM pairs)
      |SELECT query_id, rk, neighbor_id, adc_scaled FROM r WHERE rk <= 5""".stripMargin

  /** IVF-PQ: [[annIvf]]'s assignment/probes composed with [[annPq]]'s
    * codes/ADC tables — candidates restricted to the query's nprobe cells,
    * then the same integer-scaled 8-lookup sums and ranking.
    */
  val annIvfPq: String =
    """WITH v AS MATERIALIZED (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
      |cenI AS MATERIALIZED (SELECT (row_number() OVER (ORDER BY vec_id) - 1) AS cid, e AS ce
      |         FROM v WHERE vec_id < 16),
      |dI AS MATERIALIZED (SELECT v.vec_id, cenI.cid,
      |         (list_dot_product(e, e) - 2 * list_dot_product(e, ce)
      |          + list_dot_product(ce, ce)) AS dist
      |       FROM v, cenI),
      |rankedI AS MATERIALIZED (SELECT vec_id, cid,
      |              row_number() OVER (PARTITION BY vec_id ORDER BY dist, cid) AS r FROM dI),
      |assign AS MATERIALIZED (SELECT vec_id, cid FROM rankedI WHERE r = 1),
      |probes AS MATERIALIZED (SELECT vec_id AS qid, cid FROM rankedI WHERE vec_id < 20 AND r <= 4),
      |mm AS MATERIALIZED (SELECT unnest(range(8)) AS m),
      |cen AS MATERIALIZED (SELECT m, (row_number() OVER (PARTITION BY m ORDER BY vec_id) - 1) AS k,
      |               e[(8*m+1):(8*m+8)] AS csub
      |        FROM v, mm WHERE vec_id < 16),
      |sub AS MATERIALIZED (SELECT vec_id, m, e[(8*m+1):(8*m+8)] AS s FROM v, mm),
      |d AS MATERIALIZED (SELECT sub.vec_id, sub.m, cen.k,
      |        (list_dot_product(s, s) - 2*list_dot_product(s, csub)
      |         + list_dot_product(csub, csub)) AS dist
      |      FROM sub JOIN cen ON sub.m = cen.m),
      |codes AS MATERIALIZED (SELECT vec_id, m, k FROM (
      |    SELECT vec_id, m, k, row_number() OVER (PARTITION BY vec_id, m ORDER BY dist, k) AS r
      |    FROM d) t
      |  WHERE r = 1),
      |qtab AS MATERIALIZED (SELECT vec_id AS query_id, m, k, CAST(floor(dist * 1000000) AS BIGINT) AS dq
      |         FROM d WHERE vec_id < 20),
      |pairs AS MATERIALIZED (SELECT q.query_id, c.vec_id AS neighbor_id, CAST(sum(q.dq) AS BIGINT) AS adc_scaled
      |          FROM codes c
      |          JOIN qtab q ON q.m = c.m AND q.k = c.k
      |          JOIN assign a ON a.vec_id = c.vec_id
      |          JOIN probes p ON p.qid = q.query_id AND p.cid = a.cid
      |          WHERE c.vec_id <> q.query_id
      |          GROUP BY 1, 2),
      |r AS MATERIALIZED (SELECT query_id, neighbor_id, adc_scaled,
      |        row_number() OVER (PARTITION BY query_id ORDER BY adc_scaled, neighbor_id) AS rk
      |      FROM pairs)
      |SELECT query_id, rk, neighbor_id, adc_scaled FROM r WHERE rk <= 5""".stripMargin

  /** Residual IVF-PQ: [[annIvfPq]]'s cell structure, but PQ operates on
    * r = e − centroid(cell): corpus codes w.r.t. each vector's own cell,
    * query ADC tables per probed cell, residual codebook seeded from
    * vectors 16..31 (the first 16 are the centroids — zero residuals).
    */
  val annIvfPqRes: String =
    """WITH v AS MATERIALIZED (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
      |cenI AS MATERIALIZED (SELECT (row_number() OVER (ORDER BY vec_id) - 1) AS cid, e AS ce
      |         FROM v WHERE vec_id < 16),
      |dI AS MATERIALIZED (SELECT v.vec_id, cenI.cid,
      |         (list_dot_product(e, e) - 2 * list_dot_product(e, ce)
      |          + list_dot_product(ce, ce)) AS dist
      |       FROM v, cenI),
      |rankedI AS MATERIALIZED (SELECT vec_id, cid,
      |              row_number() OVER (PARTITION BY vec_id ORDER BY dist, cid) AS r FROM dI),
      |assign AS MATERIALIZED (SELECT vec_id, cid FROM rankedI WHERE r = 1),
      |probes AS MATERIALIZED (SELECT vec_id AS qid, cid FROM rankedI WHERE vec_id < 20 AND r <= 4),
      |resv AS MATERIALIZED (SELECT a.vec_id, a.cid,
      |           [ e[d+1] - ce[d+1] FOR d IN range(64) ] AS r
      |         FROM assign a JOIN v ON a.vec_id = v.vec_id JOIN cenI ON a.cid = cenI.cid),
      |mm AS MATERIALIZED (SELECT unnest(range(8)) AS m),
      |cenR AS MATERIALIZED (SELECT m, (row_number() OVER (PARTITION BY m ORDER BY vec_id) - 1) AS k,
      |               r[(8*m+1):(8*m+8)] AS csub
      |        FROM resv, mm WHERE vec_id >= 16 AND vec_id < 32),
      |subv AS MATERIALIZED (SELECT vec_id, m, r[(8*m+1):(8*m+8)] AS s FROM resv, mm),
      |dcode AS MATERIALIZED (SELECT subv.vec_id, subv.m AS m, cenR.k,
      |            (list_dot_product(s, s) - 2*list_dot_product(s, csub)
      |             + list_dot_product(csub, csub)) AS dist
      |          FROM subv JOIN cenR ON subv.m = cenR.m),
      |codes AS MATERIALIZED (SELECT vec_id, m, k FROM (
      |    SELECT vec_id, m, k, row_number() OVER (PARTITION BY vec_id, m ORDER BY dist, k) AS r
      |    FROM dcode) t
      |  WHERE r = 1),
      |resq AS MATERIALIZED (SELECT p.qid, p.cid,
      |           [ e[d+1] - ce[d+1] FOR d IN range(64) ] AS r
      |         FROM probes p JOIN v ON p.qid = v.vec_id JOIN cenI ON p.cid = cenI.cid),
      |subq AS MATERIALIZED (SELECT qid, cid, m, r[(8*m+1):(8*m+8)] AS s FROM resq, mm),
      |qtab AS MATERIALIZED (SELECT qid AS query_id, cid, subq.m AS m, k,
      |           CAST(floor((list_dot_product(s, s) - 2*list_dot_product(s, csub)
      |                       + list_dot_product(csub, csub)) * 1000000) AS BIGINT) AS dq
      |         FROM subq JOIN cenR ON subq.m = cenR.m),
      |pairs AS MATERIALIZED (SELECT q.query_id, c.vec_id AS neighbor_id, CAST(sum(q.dq) AS BIGINT) AS adc_scaled
      |          FROM codes c
      |          JOIN assign a ON a.vec_id = c.vec_id
      |          JOIN qtab q ON q.m = c.m AND q.k = c.k AND q.cid = a.cid
      |          WHERE c.vec_id <> q.query_id
      |          GROUP BY 1, 2),
      |r AS MATERIALIZED (SELECT query_id, neighbor_id, adc_scaled,
      |        row_number() OVER (PARTITION BY query_id ORDER BY adc_scaled, neighbor_id) AS rk
      |      FROM pairs)
      |SELECT query_id, rk, neighbor_id, adc_scaled FROM r WHERE rk <= 5""".stripMargin

  val tokenCount: String =
    s"""SELECT doc_id, len($toksSql)::BIGINT AS n_tokens,
       |       len(list_distinct($toksSql))::BIGINT AS n_unique FROM documents""".stripMargin

  val langId: String =
    s"""WITH t AS MATERIALIZED (SELECT doc_id, lang, $toksSql AS toks FROM documents),
       |h AS MATERIALIZED (SELECT doc_id, lang,
       |        len(list_filter(toks, x -> list_contains($stopListSql, x)))::DOUBLE AS hits,
       |        len(toks) AS n FROM t),
       |p AS MATERIALIZED (SELECT doc_id, lang,
       |        CASE WHEN hits / n >= 0.05 THEN 'en' ELSE 'unknown' END AS predicted FROM h)
       |SELECT doc_id, lang, predicted, (predicted = lang) AS correct FROM p""".stripMargin

  /** C9b — hashed char-trigram NB lang-id. The weight table is the SAME
    * integer model [[graft.operators.LangIdModel]] serves (generated into
    * a VALUES literal here — model-as-literals on both engines), so the
    * oracle independently re-derives the whole serving path: trigram
    * extraction, the positional-polynomial bucket hash, weight lookup,
    * integer sum, argmax with the alphabetical tie-break. No FP anywhere.
    * Docs shorter than 3 chars keep their prior-only scores via the LEFT
    * JOIN (none exist in the driver data, but the contract shouldn't
    * depend on that).
    */
  val langIdNgram: String = {
    import graft.operators.LangIdModel
    val ls = LangIdModel.Langs
    val rows = (0 until LangIdModel.B).map { b =>
      val ws = ls.indices.map(l => LangIdModel.weights(b * ls.length + l)).mkString(", ")
      s"($b, $ws)"
    }.mkString(", ")
    val sums = ls.map(l => s"sum(w.w_$l)::BIGINT AS g_$l").mkString(", ")
    val scores = ls.zipWithIndex.map { case (l, i) =>
      s"coalesce(s.g_$l, 0) + ${LangIdModel.priors(i)} AS s_$l"
    }.mkString(", ")
    val mx = s"greatest(${ls.map(l => s"s_$l").mkString(", ")})"
    val cases = ls.map(l => s"WHEN s_$l = mx THEN '$l'").mkString(" ")
    s"""WITH w(b, ${ls.map(l => s"w_$l").mkString(", ")}) AS MATERIALIZED (VALUES $rows),
       |pos AS MATERIALIZED (SELECT doc_id, text,
       |        unnest(generate_series(1, length(text) - 2)) AS i FROM documents),
       |g AS MATERIALIZED (SELECT doc_id,
       |        (ascii(substr(text, i, 1)) * 961 + ascii(substr(text, i + 1, 1)) * 31
       |         + ascii(substr(text, i + 2, 1))) % ${LangIdModel.B} AS b
       |      FROM pos),
       |gs AS MATERIALIZED (SELECT doc_id, $sums FROM g JOIN w USING (b) GROUP BY doc_id),
       |sc AS MATERIALIZED (SELECT d.doc_id, $scores
       |      FROM documents d LEFT JOIN gs s USING (doc_id)),
       |mxd AS MATERIALIZED (SELECT *, $mx AS mx FROM sc)
       |SELECT doc_id, ${ls.map(l => s"s_$l").mkString(", ")},
       |       CASE $cases END AS predicted FROM mxd""".stripMargin
  }

  val qualityScore: String =
    s"""WITH t AS MATERIALIZED (SELECT doc_id, $toksSql AS toks FROM documents),
       |f AS MATERIALIZED (SELECT doc_id, len(toks)::BIGINT AS n_tokens,
       |        len(list_distinct(toks))::BIGINT AS uniq,
       |        len(list_filter(toks, x -> list_contains($stopListSql, x)))::BIGINT AS stop
       |      FROM t)
       |SELECT doc_id, n_tokens, round(uniq::DOUBLE / n_tokens, 6) AS unique_ratio,
       |       round(stop::DOUBLE / n_tokens, 6) AS stop_ratio,
       |       ((500000 * stop + 300000 * uniq) // n_tokens
       |        + 2000 * least(n_tokens, 100))::BIGINT AS quality_ppm FROM f""".stripMargin

  val fingerprint: String =
    s"""WITH tok AS MATERIALIZED (SELECT doc_id, $toksSql AS w FROM documents),
       |tk AS MATERIALIZED (SELECT doc_id, w FROM tok WHERE len(w) >= 3),
       |shs AS MATERIALIZED (SELECT doc_id, list_distinct([w[i]||' '||w[i+1]||' '||w[i+2] FOR i IN range(1, len(w)-1)]) AS sh FROM tk)
       |SELECT doc_id, list_min(list_transform(sh, s -> $hash60Sql)) AS fp FROM shs""".stripMargin

  val nbTrain: String =
    s"""WITH words AS MATERIALIZED (SELECT source, unnest($toksSql) AS word FROM documents),
       |c AS MATERIALIZED (SELECT source, word, count(*) AS cnt FROM words GROUP BY 1, 2),
       |t AS MATERIALIZED (SELECT source, count(*) AS cat_total FROM words GROUP BY 1)
       |SELECT c.source, word, cnt, cat_total FROM c JOIN t ON c.source = t.source""".stripMargin

  val nbClassify: String =
    s"""WITH words AS MATERIALIZED (SELECT doc_id, unnest($toksSql) AS word FROM documents),
       |dw AS MATERIALIZED (SELECT doc_id, word, count(*) AS wcnt FROM words GROUP BY 1, 2),
       |cw AS MATERIALIZED (SELECT source, unnest($toksSql) AS word FROM documents),
       |model AS MATERIALIZED (SELECT source, word, count(*) AS cnt FROM cw GROUP BY 1, 2),
       |totals AS MATERIALIZED (SELECT source, count(*) AS cat_total FROM cw GROUP BY 1),
       |vocab AS MATERIALIZED (SELECT count(DISTINCT word) AS v FROM model),
       |scored AS MATERIALIZED (SELECT dw.doc_id, t.source,
       |             sum(dw.wcnt * ln((coalesce(m.cnt, 0) + 1)::DOUBLE / (t.cat_total + v.v))) AS score
       |           FROM dw CROSS JOIN totals t CROSS JOIN vocab v
       |           LEFT JOIN model m ON m.source = t.source AND m.word = dw.word
       |           GROUP BY 1, 2),
       |r AS MATERIALIZED (SELECT doc_id, source,
       |        row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, source) AS rk FROM scored)
       |SELECT doc_id, source AS predicted FROM r WHERE rk = 1""".stripMargin

  val asofJoin: String =
    """WITH c AS MATERIALIZED (SELECT user_id, ts, event_id, 0 AS tag FROM events WHERE event_type = 'click'),
      |p AS MATERIALIZED (SELECT user_id, ts, event_id, 1 AS tag FROM events WHERE event_type = 'purchase'),
      |u AS MATERIALIZED (SELECT * FROM c UNION ALL SELECT * FROM p),
      |w AS MATERIALIZED (SELECT user_id, ts, event_id, tag,
      |        last_value(CASE WHEN tag = 0 THEN event_id END IGNORE NULLS)
      |          OVER (PARTITION BY user_id ORDER BY ts, tag, event_id ROWS UNBOUNDED PRECEDING) AS last_click_id,
      |        last_value(CASE WHEN tag = 0 THEN epoch_us(ts) END IGNORE NULLS)
      |          OVER (PARTITION BY user_id ORDER BY ts, tag, event_id ROWS UNBOUNDED PRECEDING) AS last_click_us
      |      FROM u)
      |SELECT event_id AS purchase_id, user_id, last_click_id,
      |       (epoch_us(ts) - last_click_us) AS gap_us
      |FROM w WHERE tag = 1""".stripMargin

  val rangeJoin: String =
    """SELECT e.event_id, count(c.event_id) AS n_recent_clicks
      |FROM events e LEFT JOIN events c
      |  ON c.event_type = 'click'
      | AND epoch_us(c.ts) >= epoch_us(e.ts) - 60000000
      | AND epoch_us(c.ts) <= epoch_us(e.ts)
      |WHERE e.event_type = 'error'
      |GROUP BY e.event_id""".stripMargin

  val pivot: String =
    """SELECT user_id,
      |  count(*) FILTER (WHERE event_type = 'click') AS click,
      |  count(*) FILTER (WHERE event_type = 'error') AS error,
      |  count(*) FILTER (WHERE event_type = 'purchase') AS purchase,
      |  count(*) FILTER (WHERE event_type = 'signup') AS signup,
      |  count(*) FILTER (WHERE event_type = 'view') AS view
      |FROM events GROUP BY user_id""".stripMargin

  val cube: String =
    """SELECT c_mktsegment, o_orderpriority, count(*) AS n_orders,
      |       CAST(CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) AS DECIMAL(18,2)) AS DOUBLE) AS total
      |FROM orders JOIN customer ON o_custkey = c_custkey
      |GROUP BY CUBE (c_mktsegment, o_orderpriority)""".stripMargin

  val percentiles: String =
    """SELECT event_type, round(quantile_cont(value, 0.5), 6) AS p50,
      |       round(quantile_cont(value, 0.95), 6) AS p95
      |FROM events GROUP BY event_type""".stripMargin

  val jsonExtract: String =
    """SELECT (CAST(json_extract_string(props, '$.k') AS BIGINT) // 10) AS k_bucket,
      |       count(*) AS n,
      |       CAST(CAST(sum(CAST(value AS DECIMAL(12,2))) AS DECIMAL(18,2)) AS DOUBLE) AS sum_value
      |FROM events GROUP BY 1""".stripMargin

  val eventsWindow: String =
    """SELECT epoch_ms(date_trunc('hour', ts)) AS hour_ms, event_type,
      |       count(*) AS n_events,
      |       CAST(CAST(sum(CAST(value AS DECIMAL(12,2))) AS DECIMAL(18,2)) AS DOUBLE) AS sum_value
      |FROM events GROUP BY 1, 2""".stripMargin

  val sessionize: String =
    """WITH e AS MATERIALIZED (SELECT user_id, event_id, ts,
      |             lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
      |           FROM events),
      |b AS MATERIALIZED (SELECT user_id, event_id, ts,
      |        CASE WHEN prev_ts IS NULL OR (epoch_ms(ts) - epoch_ms(prev_ts)) > 1800000
      |             THEN 1 ELSE 0 END AS brk FROM e),
      |s AS MATERIALIZED (SELECT user_id, ts,
      |        sum(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS session_id
      |      FROM b)
      |SELECT user_id, CAST(session_id AS BIGINT) AS session_id, count(*) AS n_events,
      |       epoch_ms(min(ts)) AS start_ms, epoch_ms(max(ts)) AS end_ms
      |FROM s GROUP BY 1, 2""".stripMargin

  /** D18 q_peak_concurrency — the sweep re-derived with a global window
    * (fine for the oracle's scale): sessions → ±1 deltas → running sum
    * ordered (ms, delta ASC — closings fold before openings at the same
    * instant, see the operator scaladoc) → per-day max from the
    * DEFINITION's day attribution: rows at a day's exact first
    * millisecond contribute only their post-fold value (their −1s close
    * sessions open at no instant of the day), and the carry from the
    * previous output day applies only when no midnight group replaces it
    * — see the operator scaladoc for the derivation.
    */
  val peakConcurrency: String =
    """WITH e AS MATERIALIZED (SELECT user_id, event_id, ts,
      |             lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
      |           FROM events),
      |b AS MATERIALIZED (SELECT user_id, event_id, ts,
      |        CASE WHEN prev_ts IS NULL OR (epoch_ms(ts) - epoch_ms(prev_ts)) > 1800000
      |             THEN 1 ELSE 0 END AS brk FROM e),
      |s AS MATERIALIZED (SELECT user_id, ts,
      |        sum(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS session_id
      |      FROM b),
      |sess AS MATERIALIZED (
      |  SELECT epoch_ms(min(ts)) AS start_ms, epoch_ms(max(ts)) AS end_ms
      |  FROM s GROUP BY user_id, session_id),
      |d AS MATERIALIZED (
      |  SELECT start_ms AS ms, 1 AS dd FROM sess
      |  UNION ALL SELECT end_ms + 1 AS ms, -1 AS dd FROM sess),
      |r AS MATERIALIZED (
      |  SELECT make_timestamp(ms * 1000)::DATE AS day,
      |         ms = epoch_ms(date_trunc('day', make_timestamp(ms * 1000))) AS bdry,
      |         sum(dd) OVER (ORDER BY ms, dd
      |                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS run,
      |         row_number() OVER (ORDER BY ms, dd) AS pos
      |  FROM d),
      |g AS MATERIALIZED (
      |  SELECT day,
      |         max(run) FILTER (WHERE NOT bdry) AS mx_inner,
      |         arg_max(run, pos) FILTER (WHERE bdry) AS bdry_final,
      |         arg_max(run, pos) AS last_run
      |  FROM r GROUP BY day)
      |SELECT CAST(day AS VARCHAR) AS day,
      |       CAST(greatest(coalesce(mx_inner, 0),
      |            coalesce(bdry_final, lag(last_run) OVER (ORDER BY day), 0)) AS BIGINT) AS peak
      |FROM g""".stripMargin

  val topUsers: String =
    """WITH c AS MATERIALIZED (SELECT event_type, user_id, count(*) AS cnt FROM events GROUP BY 1, 2),
      |r AS MATERIALIZED (SELECT event_type, user_id, cnt,
      |        row_number() OVER (PARTITION BY event_type ORDER BY cnt DESC, user_id) AS rk FROM c)
      |SELECT event_type, rk, user_id, cnt FROM r WHERE rk <= 5""".stripMargin

  /** 8-gram decontamination vs the doc_id%50==0 benchmark subset: distinct
    * shingle STRINGS per doc (list_distinct), then the portable 60-bit hash
    * — the same dedup-on-string-then-hash order [[graft.functions
    * .ShingleHashN]] uses.
    */
  val decontaminate: String =
    s"""WITH tok AS MATERIALIZED (SELECT doc_id, $toksSql AS w FROM documents),
       |d AS MATERIALIZED (SELECT doc_id,
       |        list_distinct([ array_to_string(w[i:i+7], ' ') FOR i IN range(1, len(w) - 6) ]) AS gs
       |      FROM tok WHERE len(w) >= 8),
       |g AS MATERIALIZED (SELECT doc_id, CAST(concat('0x', substr(md5(s), 1, 15)) AS BIGINT) AS g
       |      FROM (SELECT doc_id, unnest(gs) AS s FROM d)),
       |bench AS MATERIALIZED (SELECT DISTINCT g FROM g WHERE doc_id % 50 = 0),
       |corpus AS MATERIALIZED (SELECT doc_id, count(*)::BIGINT AS n_grams FROM g WHERE doc_id % 50 <> 0 GROUP BY 1),
       |hits AS MATERIALIZED (SELECT doc_id, count(*)::BIGINT AS n_hit FROM g
       |         WHERE doc_id % 50 <> 0 AND g IN (SELECT g FROM bench) GROUP BY 1)
       |SELECT c.doc_id, c.n_grams, coalesce(h.n_hit, 0)::BIGINT AS n_hit,
       |       coalesce(h.n_hit, 0) > 0 AS contaminated
       |FROM corpus c LEFT JOIN hits h USING (doc_id)""".stripMargin

  /** 6-gram spans occurring in ≥2 distinct docs; occurrences NOT deduped
    * within a doc (one per position).
    */
  val repeatedSpans: String =
    s"""WITH tok AS MATERIALIZED (SELECT doc_id, $toksSql AS w FROM documents),
       |s AS MATERIALIZED (SELECT doc_id, unnest([ array_to_string(w[i:i+5], ' ') FOR i IN range(1, len(w) - 4) ]) AS s
       |      FROM tok WHERE len(w) >= 6),
       |h AS MATERIALIZED (SELECT doc_id, CAST(concat('0x', substr(md5(s), 1, 15)) AS BIGINT) AS span FROM s)
       |SELECT span, count(DISTINCT doc_id)::BIGINT AS n_docs, count(*)::BIGINT AS n_total,
       |       min(doc_id) AS first_doc
       |FROM h GROUP BY 1 HAVING count(DISTINCT doc_id) >= 2""".stripMargin

  /** Maximal repeated-substring intervals: per-position 10-word window
    * hashes (same md5-join construction as [[repeatedSpans]]), windows with
    * ≥2 corpus-wide occurrences, contiguous positions merged via the
    * `pos − row_number()` islands trick — mirrored term-for-term.
    */
  val dedupSubstring: String =
    s"""WITH tok AS MATERIALIZED (SELECT doc_id, $toksSql AS w FROM documents),
       |s AS MATERIALIZED (SELECT doc_id,
       |        unnest([{'pos': i - 1,
       |                 'h': CAST(concat('0x', substr(md5(array_to_string(w[i:i+9], ' ')), 1, 15)) AS BIGINT)}
       |                FOR i IN range(1, len(w) - 8)]) AS u
       |      FROM tok WHERE len(w) >= 10),
       |p AS MATERIALIZED (SELECT doc_id, u.pos AS pos, u.h AS h FROM s),
       |rep AS MATERIALIZED (SELECT h FROM p GROUP BY h HAVING count(*) >= 2),
       |runs AS MATERIALIZED (SELECT doc_id, pos,
       |           pos - row_number() OVER (PARTITION BY doc_id ORDER BY pos) AS run
       |         FROM p JOIN rep USING (h))
       |SELECT doc_id, CAST(min(pos) AS BIGINT) AS start_pos,
       |       CAST(max(pos) + 9 AS BIGINT) AS end_pos,
       |       CAST(max(pos) + 9 - min(pos) + 1 AS BIGINT) AS n_words
       |FROM runs GROUP BY doc_id, run""".stripMargin

  /** Concat-and-chunk sequence packing: md5-salted shard, windowed token
    * offset, integer-division sequence ids (`//` ↔ Spark `div`).
    */
  val packSequences: String =
    s"""WITH t AS MATERIALIZED (SELECT doc_id,
       |    CAST(concat('0x', substr(md5('pack:' || CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) % 8 AS shard,
       |    len($toksSql)::BIGINT AS n_tokens FROM documents),
       |o AS MATERIALIZED (SELECT doc_id, shard, n_tokens,
       |    coalesce(sum(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)::BIGINT AS "offset"
       |  FROM t WHERE n_tokens > 0)
       |SELECT doc_id, shard, n_tokens, "offset",
       |       "offset" // 512 AS seq_first,
       |       ("offset" + n_tokens - 1) // 512 AS seq_last,
       |       "offset" % 512 AS offset_in_seq FROM o""".stripMargin

  /** Per-domain hash-acceptance resampling; integer rates in ppm. */
  val domainMix: String =
    """WITH t AS MATERIALIZED (SELECT doc_id, source, lang,
      |    1000000 // (1 + CAST(substring(source, 4) AS BIGINT) % 4) AS r FROM documents),
      |e AS MATERIALIZED (SELECT doc_id, source, lang,
      |    CAST(CASE WHEN lang = 'en' THEN r ELSE r // 2 END AS BIGINT) AS rate_pm FROM t)
      |SELECT doc_id, source, lang, rate_pm FROM e
      |WHERE CAST(concat('0x', substr(md5('mix:' || CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT)
      |      % 1000000 < rate_pm""".stripMargin

  /** PII redaction over deterministically augmented text; counts + md5 of
    * the redacted string. Patterns are the Java-regex/RE2 common subset;
    * DuckDB regexp_replace needs the 'g' flag to match Spark's
    * replace-all.
    */
  val piiRedact: String =
    """WITH a AS MATERIALIZED (SELECT doc_id,
      |    text || repeat(' u' || CAST(doc_id AS VARCHAR) || '@ex.org', CAST(doc_id % 3 AS INT) + 1)
      |         || ' contact user' || CAST(doc_id AS VARCHAR) || '@mail.example.com from 10.'
      |         || CAST(doc_id % 200 AS VARCHAR) || '.0.' || CAST(doc_id % 250 AS VARCHAR)
      |         || repeat(' 192.168.0.' || CAST(doc_id % 254 + 1 AS VARCHAR), CAST(doc_id % 2 AS INT))
      |         || ' call 555-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') AS aug
      |  FROM documents)
      |SELECT doc_id,
      |  len(regexp_extract_all(aug, '[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z][a-z]+'))::BIGINT AS n_email,
      |  len(regexp_extract_all(aug, '[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}'))::BIGINT AS n_ip,
      |  len(regexp_extract_all(aug, '[0-9]{3}-[0-9]{4}'))::BIGINT AS n_phone,
      |  md5(regexp_replace(regexp_replace(regexp_replace(aug,
      |        '[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z][a-z]+', '<EMAIL>', 'g'),
      |      '[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}', '<IP>', 'g'),
      |    '[0-9]{3}-[0-9]{4}', '<PHONE>', 'g')) AS red_hash
      |FROM a""".stripMargin

  /** int8 scalar quantization: per-dim global (min,max), then
    * floor((x−mn)·255/(mx−mn)) clamped — single mul+div per value, no FP
    * accumulation, so codes are bit-identical across engines.
    */
  val scalarQuant: String =
    """WITH v AS MATERIALIZED (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
      |dims AS MATERIALIZED (SELECT unnest(range(64)) AS dim),
      |mm AS MATERIALIZED (SELECT dim, min(e[dim + 1]) AS mn, max(e[dim + 1]) AS mx
      |       FROM v, dims GROUP BY 1)
      |SELECT vec_id, CAST(dim AS BIGINT) AS dim,
      |       CASE WHEN mx = mn THEN CAST(0 AS BIGINT)
      |            ELSE CAST(least(floor((e[dim + 1] - mn) * (255.0 / (mx - mn))), 255) AS BIGINT)
      |       END AS code
      |FROM v, mm""".stripMargin

  /** Canonical normalization: lower+trim, whitespace-run collapse (the
    * tokenizer's empty-drop), adjacent-duplicate-token collapse via an
    * INDEXED list comprehension — the form both engines express (Java
    * regex backreferences would do it, RE2 has none).
    */
  val textNormalize: String =
    """WITH tok AS MATERIALIZED (
      |  SELECT doc_id,
      |         list_filter(string_split(lower(trim(text)), ' '), x -> x <> '') AS w
      |  FROM documents),
      |k AS MATERIALIZED (
      |  SELECT doc_id, w,
      |         [w[i] FOR i IN range(1, len(w) + 1) IF i = 1 OR w[i] <> w[i - 1]] AS kept
      |  FROM tok)
      |SELECT doc_id, array_to_string(kept, ' ') AS norm,
      |       CAST(len(kept) AS BIGINT) AS n_toks,
      |       CAST(len(w) - len(kept) AS BIGINT) AS n_dropped
      |FROM k""".stripMargin

  /** JSONL round-trip: the oracle reads the PARQUET table directly — a
    * hash-match against the Spark side (which digests the JSONL copy it
    * just wrote) is the losslessness proof.
    */
  val jsonlRoundtrip: String =
    "SELECT doc_id, md5(text) AS text_md5, lang, source, n_chars FROM documents"

  /** Integer Lloyd k-means, [[graft.operators.Kmeans.Iters]] unrolled
    * iterations over the int8-quantized corpus ([[scalarQuant]]'s proven
    * bit-stable codes): assignment = min(d2·K + cid) (d2 exact integer,
    * ties → lowest cid — the fused kernel's strict-< rule), update =
    * HUGEINT floor-division (↔ the Spark driver's positive Long
    * division), empty cluster keeps its previous centroid (COALESCE ↔
    * getOrElse). K is re-derived HERE from count(*) — the same
    * clamp(n / VecsPerCluster, MinK, MaxK) the Spark side computes from
    * parquet metadata, so one SQL text is correct at every scale rung.
    * Every CTE MATERIALIZED — the [[bfs]] lesson: each level references
    * the previous chain twice.
    */
  val kmeans: String = {
    import graft.operators.Kmeans.{MinK, MaxK, VecsPerCluster, Iters}
    val K = "(SELECT k FROM kk)" // scalar; DuckDB folds it once
    val iter = (j: Int) =>
      s"""a$j AS MATERIALIZED (
         |  SELECT vec_id, m % $K AS cid FROM (
         |    SELECT vec_id, min(d2 * $K + cid) AS m FROM (
         |      SELECT q.vec_id, cc.cid, sum((q.c - cc.c) * (q.c - cc.c)) AS d2
         |      FROM q JOIN c${j - 1} cc ON q.dim = cc.dim GROUP BY 1, 2) t
         |    GROUP BY 1) t2),
         |u$j AS MATERIALIZED (
         |  SELECT a$j.cid, q.dim, CAST(sum(q.c) // count(*) AS BIGINT) AS c
         |  FROM q JOIN a$j ON q.vec_id = a$j.vec_id GROUP BY 1, 2),
         |c$j AS MATERIALIZED (
         |  SELECT p.cid, p.dim, COALESCE(u$j.c, p.c) AS c
         |  FROM c${j - 1} p LEFT JOIN u$j ON p.cid = u$j.cid AND p.dim = u$j.dim)""".stripMargin
    s"""WITH v AS MATERIALIZED (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
       |kk AS MATERIALIZED (SELECT least($MaxK, greatest($MinK, count(*) // $VecsPerCluster)) AS k
       |       FROM embeddings),
       |dims AS MATERIALIZED (SELECT unnest(range(64)) AS dim),
       |mm AS MATERIALIZED (SELECT dim, min(e[dim + 1]) AS mn, max(e[dim + 1]) AS mx
       |       FROM v, dims GROUP BY 1),
       |q AS MATERIALIZED (SELECT vec_id, dim,
       |       CASE WHEN mx = mn THEN CAST(0 AS BIGINT)
       |            ELSE CAST(least(floor((e[dim + 1] - mn) * (255.0 / (mx - mn))), 255) AS BIGINT)
       |       END AS c
       |       FROM v, mm),
       |c0 AS MATERIALIZED (SELECT vec_id AS cid, dim, c FROM q WHERE vec_id < $K),
       |${(1 to Iters).map(iter).mkString(",\n")}
       |SELECT vec_id, CAST(m % $K AS BIGINT) AS cid, CAST(m // $K AS BIGINT) AS d2 FROM (
       |  SELECT vec_id, min(d2 * $K + cid) AS m FROM (
       |    SELECT q.vec_id, cc.cid, sum((q.c - cc.c) * (q.c - cc.c)) AS d2
       |    FROM q JOIN c$Iters cc ON q.dim = cc.dim GROUP BY 1, 2) t
       |  GROUP BY 1) t3""".stripMargin
  }

  /** Distribution windows per source; (n_chars, doc_id) total order. */
  val windowStats: String =
    """SELECT doc_id, source, n_chars,
      |  CAST(ntile(4) OVER w AS BIGINT) AS quartile,
      |  round(percent_rank() OVER w, 6) AS pct_rank,
      |  round(cume_dist() OVER w, 6) AS cume
      |FROM documents
      |WINDOW w AS (PARTITION BY source ORDER BY n_chars, doc_id)""".stripMargin

  /** TPC-H Q3 shape; rank on (rounded revenue, key) is a total order so
    * the top-10 cutoff is deterministic.
    */
  val tpchQ3: String =
    """SELECT l_orderkey, o_orderpriority, revenue FROM (
      |  SELECT l_orderkey, o_orderpriority,
      |         CAST(CAST(round(sum(CAST(l_extendedprice AS DECIMAL(12,2))
      |                        * (1 - CAST(l_discount AS DECIMAL(4,2)))), 2)
      |              AS DECIMAL(18,2)) AS DOUBLE) AS revenue
      |  FROM lineitem
      |  JOIN orders ON l_orderkey = o_orderkey
      |  JOIN customer ON o_custkey = c_custkey
      |  WHERE c_mktsegment = 'BUILDING'
      |    AND o_orderdate < TIMESTAMP '1996-07-01 00:00:00'
      |    AND l_shipdate > TIMESTAMP '1996-07-01 00:00:00'
      |  GROUP BY 1, 2) t
      |ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin

  /** TPC-H Q5 shape with the same-nation condition. */
  val tpchQ5: String =
    """SELECT n_name,
      |       CAST(CAST(round(sum(CAST(l_extendedprice AS DECIMAL(12,2))
      |                      * (1 - CAST(l_discount AS DECIMAL(4,2)))), 2)
      |            AS DECIMAL(18,2)) AS DOUBLE) AS revenue
      |FROM lineitem
      |JOIN supplier ON l_suppkey = s_suppkey
      |JOIN nation ON s_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey AND c_nationkey = s_nationkey
      |WHERE r_name = 'ASIA'
      |  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      |  AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
      |GROUP BY 1""".stripMargin

  /** Integer PageRank, 5 unrolled iterations over the symmetric
    * customer↔supplier graph; `//` ↔ Spark `div`, HUGEINT sums cast back.
    */
  val pageRank: String = {
    val iter = (k: Int) =>
      s"""s$k AS MATERIALIZED (SELECT e.v AS id,
         |  CAST(150000 + (85 * sum(s.score // e.deg)) // 100 AS BIGINT) AS score
         |FROM e JOIN s${k - 1} s ON e.u = s.id GROUP BY 1)""".stripMargin
    s"""WITH cs AS MATERIALIZED (SELECT DISTINCT o_custkey * 2 AS u, l_suppkey * 2 + 1 AS v
       |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
       |sym AS MATERIALIZED (SELECT u, v FROM cs UNION ALL SELECT v, u FROM cs),
       |deg AS MATERIALIZED (SELECT u, count(*) AS deg FROM sym GROUP BY 1),
       |e AS MATERIALIZED (SELECT sym.u, sym.v, deg.deg FROM sym JOIN deg ON sym.u = deg.u),
       |s0 AS MATERIALIZED (SELECT DISTINCT u AS id, CAST(1000000 AS BIGINT) AS score FROM e),
       |${(1 to 5).map(iter).mkString(",\n")}
       |SELECT id, score FROM s5""".stripMargin
  }

  /** BFS twin: the same hop-limited frontier expansion, unrolled to the
    * fixed hop budget exactly like [[pageRank]]'s iterations (a bounded
    * unrolling, not a recursive CTE, so both engines run the identical
    * hop-capped computation). EVERY CTE is MATERIALIZED: each hop level
    * references the previous frontier AND the previous dist table (join +
    * NOT IN), so plain-CTE inlining re-evaluates the chain EXPONENTIALLY
    * in the hop count — with the lineitem⋈orders+DISTINCT edge build at
    * the bottom of every copy, that spilled past the disk budget at sf10.
    * The Spark side checkpoints edges once and each hop once for exactly
    * the same reason.
    */
  val bfs: String = {
    val iter = (k: Int) =>
      s"""f$k AS MATERIALIZED (SELECT DISTINCT e.v AS id FROM e JOIN f${k - 1} ON e.u = f${k - 1}.id
         |        WHERE e.v NOT IN (SELECT id FROM d${k - 1})),
         |d$k AS MATERIALIZED (SELECT id, dist FROM d${k - 1}
         |        UNION ALL SELECT id, CAST($k AS BIGINT) AS dist FROM f$k)""".stripMargin
    s"""WITH cs AS MATERIALIZED (SELECT DISTINCT o_custkey * 2 AS u, l_suppkey * 2 + 1 AS v
       |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
       |e AS MATERIALIZED (SELECT u, v FROM cs UNION ALL SELECT v, u FROM cs),
       |d0 AS MATERIALIZED (SELECT CAST(2 AS BIGINT) AS id, CAST(0 AS BIGINT) AS dist),
       |f0 AS MATERIALIZED (SELECT id FROM d0),
       |${(1 to 4).map(iter).mkString(",\n")}
       |SELECT id, dist FROM d4""".stripMargin
  }

  /** Bloom-pruned join twin: the Bloom filter is a lossless pre-shuffle
    * prune (false positives die in the exact join), so the oracle is the
    * PLAIN join — row identity is the operator's contract.
    */
  val bloomJoin: String =
    """SELECT s_name, round(sum(l_quantity), 2) AS sum_qty, count(*) AS n_lines
      |FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
      |WHERE s_acctbal > 6000 GROUP BY 1""".stripMargin

  /** Sliding-window twin: Spark's window(1h, 15m) assigns each event to
    * the 4 epoch-aligned slots covering it — spelled here as an explicit
    * k∈0..3 unnest in epoch-millis space (start = floor(ms/slide)·slide −
    * k·slide). Integer cents, HUGEINT sum cast back.
    */
  val slidingWindow: String =
    """WITH e AS MATERIALIZED (SELECT epoch_ms(ts) AS ms, event_type,
      |                  CAST(round(value * 100) AS BIGINT) AS cents FROM events)
      |SELECT (ms // 900000) * 900000 - k * 900000 AS win_ms, event_type,
      |       count(*) AS n_events, CAST(sum(cents) AS BIGINT) AS sum_cents
      |FROM e CROSS JOIN generate_series(0, 3) AS t(k)
      |GROUP BY 1, 2""".stripMargin

  /** Rolling-median twin: DuckDB `list()` as a window aggregate over the
    * same 7-row frame, sorted and indexed identically (both engines
    * 1-index; lower median = element (n+1)//2).
    */
  val rollingMedian: String =
    """WITH e AS MATERIALIZED (SELECT user_id, event_id, epoch_ms(ts) AS ts_ms,
      |                  CAST(round(value * 100) AS BIGINT) AS cents FROM events),
      |w AS MATERIALIZED (SELECT user_id, event_id, ts_ms,
      |             list_sort(list(cents) OVER (PARTITION BY user_id ORDER BY ts_ms, event_id
      |                       ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)) AS win
      |      FROM e)
      |SELECT user_id, event_id, ts_ms, win[(len(win) + 1) // 2] AS med_cents FROM w""".stripMargin

  /** Equi-depth twin: identical histogram→cumulative→fold construction;
    * HUGEINT sums cast back, `//` ↔ Spark `div`.
    */
  val equidepth: String =
    """WITH h AS MATERIALIZED (SELECT l_quantity AS q, count(*) AS c FROM lineitem GROUP BY 1),
      |cum AS MATERIALIZED (SELECT q, c,
      |        coalesce(sum(c) OVER (ORDER BY q ROWS BETWEEN UNBOUNDED PRECEDING
      |                              AND 1 PRECEDING), 0) AS before,
      |        sum(c) OVER () AS n FROM h)
      |SELECT CAST(1 + (4 * before) // n AS BIGINT) AS bucket,
      |       CAST(sum(c) AS BIGINT) AS n_rows,
      |       round(min(q), 2) AS lo, round(max(q), 2) AS hi
      |FROM cum GROUP BY 1""".stripMargin

  /** Table-profile twin: the same one-row stats card; avg via the exact
    * decimal-sum-then-divide device, dates as epoch millis.
    */
  val tableProfile: String =
    """SELECT count(*) AS n_rows,
      | CAST(sum(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_orderkey,
      | CAST(sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_custkey,
      | CAST(sum(CASE WHEN o_orderstatus IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_status,
      | CAST(sum(CASE WHEN o_totalprice IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_price,
      | CAST(sum(CASE WHEN o_orderdate IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_date,
      | count(DISTINCT o_orderstatus) AS ndv_status,
      | count(DISTINCT o_orderpriority) AS ndv_priority,
      | round(min(o_totalprice), 2) AS min_price,
      | round(max(o_totalprice), 2) AS max_price,
      | round(sum(CAST(o_totalprice AS DECIMAL(12,2)))::DOUBLE / count(*), 6) AS avg_price,
      | epoch_ms(min(o_orderdate)) AS min_date_ms,
      | epoch_ms(max(o_orderdate)) AS max_date_ms
      |FROM orders""".stripMargin

  /** SemDeDup: IVF-seed cluster assignment (same cenI/assign chain as
    * [[annIvf]]), within-cell greedy drop of any vector with a lower-id
    * cellmate at rounded cosine ≥ 0.4.
    */
  val semDedup: String =
    """WITH v AS MATERIALIZED (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
      |n AS MATERIALIZED (SELECT vec_id, e, sqrt(list_dot_product(e, e)) AS nrm FROM v),
      |cen AS MATERIALIZED (SELECT (row_number() OVER (ORDER BY vec_id) - 1) AS cid, e AS ce
      |        FROM v WHERE vec_id < (SELECT least(65536, greatest(16, count(*) // 1000)) FROM v)),
      |d AS MATERIALIZED (SELECT n.vec_id, cen.cid,
      |        (list_dot_product(e, e) - 2 * list_dot_product(e, ce)
      |         + list_dot_product(ce, ce)) AS dist
      |      FROM n, cen),
      |assign AS MATERIALIZED (SELECT vec_id, cid FROM (
      |    SELECT vec_id, cid, row_number() OVER (PARTITION BY vec_id ORDER BY dist, cid) AS r
      |    FROM d) t WHERE r = 1),
      |a AS MATERIALIZED (SELECT n.vec_id, cid, e, nrm FROM n JOIN assign USING (vec_id)),
      |drops AS MATERIALIZED (SELECT DISTINCT y.vec_id
      |          FROM a x JOIN a y ON x.cid = y.cid AND x.vec_id < y.vec_id
      |          WHERE round(list_dot_product(x.e, y.e) / (x.nrm * y.nrm), 4) >= 0.4)
      |SELECT vec_id, cid, vec_id NOT IN (SELECT vec_id FROM drops) AS keep FROM a""".stripMargin

  /** Gopher/C4-style rule cascade: integer features, boolean verdicts —
    * same arithmetic as operators.Quality.qualityFilter.
    */
  val qualityFilter: String =
    s"""WITH t AS MATERIALIZED (SELECT doc_id, source, text, $toksSql AS toks FROM documents),
       |f AS MATERIALIZED (SELECT doc_id, source,
       |        CAST(len(toks) AS BIGINT) AS n_words,
       |        (len(replace(text, ' ', '')) * 100) // len(toks) AS mean_wl_x100,
       |        CAST(len(list_filter(toks, x -> list_contains($stopListSql, x))) AS BIGINT) AS stop_hits,
       |        CAST(list_max(list_transform(list_distinct(toks),
       |          x -> len(list_filter(toks, y -> y = x)))) AS BIGINT) AS max_tok_freq
       |      FROM t WHERE len(toks) > 0)
       |SELECT doc_id, source, n_words, CAST(mean_wl_x100 AS BIGINT) AS mean_wl_x100,
       |  stop_hits, max_tok_freq,
       |  (n_words >= 5 AND n_words <= 10000) AS len_ok,
       |  (mean_wl_x100 >= 200 AND mean_wl_x100 <= 1200) AS wl_ok,
       |  (stop_hits >= 1) AS stop_ok,
       |  (max_tok_freq * 5 <= n_words) AS rep_ok,
       |  (n_words >= 5 AND n_words <= 10000 AND mean_wl_x100 >= 200
       |   AND mean_wl_x100 <= 1200 AND stop_hits >= 1
       |   AND max_tok_freq * 5 <= n_words) AS keep
       |FROM f""".stripMargin

  /** Equi-width histogram, integer bucket arithmetic, empty buckets kept. */
  val histogram: String =
    """WITH r AS MATERIALIZED (SELECT min(n_chars) AS mn, max(n_chars) AS mx FROM documents),
      |c AS MATERIALIZED (SELECT ((n_chars - mn) * 16) // (mx - mn + 1) AS bucket, count(*) AS cnt
      |      FROM documents, r GROUP BY 1),
      |s AS MATERIALIZED (SELECT unnest(range(16)) AS bucket)
      |SELECT s.bucket AS bucket,
      |  mn + (s.bucket * (mx - mn + 1)) // 16 AS lo,
      |  mn + ((s.bucket + 1) * (mx - mn + 1)) // 16 - 1 AS hi,
      |  coalesce(c.cnt, 0) AS cnt
      |FROM s CROSS JOIN r LEFT JOIN c ON s.bucket = c.bucket""".stripMargin

  /** Duplicate word/2-gram/3-gram ppm fractions; n-grams hashed with the
    * same hash60 the Spark ShingleHashN kernel applies, so duplicate-slot
    * counts agree even under (negligible) hash collisions.
    */
  val repetition: String =
    s"""WITH t AS MATERIALIZED (SELECT doc_id, $toksSql AS w FROM documents),
       |r AS MATERIALIZED (SELECT doc_id, w,
       |        [$hash60Sql FOR s IN [array_to_string(w[i:i+1], ' ') FOR i IN range(1, len(w))]] AS g2,
       |        [$hash60Sql FOR s IN [array_to_string(w[i:i+2], ' ') FOR i IN range(1, len(w)-1)]] AS g3
       |      FROM t WHERE len(w) >= 3)
       |SELECT doc_id, CAST(len(w) AS BIGINT) AS n_words,
       |  (CAST(len(w) - len(list_distinct(w)) AS BIGINT) * 1000000) // len(w) AS dup_word_ppm,
       |  (CAST(len(g2) - len(list_distinct(g2)) AS BIGINT) * 1000000) // len(g2) AS dup_2gram_ppm,
       |  (CAST(len(g3) - len(list_distinct(g3)) AS BIGINT) * 1000000) // len(g3) AS dup_3gram_ppm
       |FROM r""".stripMargin

  /** Cross-source shared-shingle matrix (a ≤ b, diagonal = per-source
    * totals); same shingle→hash60%P derivation as the MinHash CTEs.
    */
  val sourceOverlap: String =
    s"""WITH tok AS MATERIALIZED (SELECT source, $toksSql AS w FROM documents),
       |tk AS MATERIALIZED (SELECT source, w FROM tok WHERE len(w) >= 3),
       |shs AS MATERIALIZED (SELECT source, list_distinct([w[i]||' '||w[i+1]||' '||w[i+2] FOR i IN range(1, len(w)-1)]) AS sh FROM tk),
       |hs AS MATERIALIZED (SELECT DISTINCT source, $hash60Sql % $P AS h
       |       FROM (SELECT source, unnest(sh) AS s FROM shs))
       |SELECT a.source AS src_a, b.source AS src_b, count(*) AS n_shared
       |FROM hs a JOIN hs b ON a.h = b.h AND a.source <= b.source
       |GROUP BY 1, 2""".stripMargin

  /** Exact per-stratum top-k by the salted portable hash (same construction
    * as hashSplit/sampleUniform).
    */
  val sampleStratified: String =
    """WITH h AS MATERIALIZED (SELECT doc_id, source,
      |  CAST(concat('0x', substr(md5('strat:' || CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) AS h
      |FROM documents),
      |r AS MATERIALIZED (SELECT source, doc_id, h,
      |        row_number() OVER (PARTITION BY source ORDER BY h, doc_id) AS rk
      |      FROM h)
      |SELECT source, CAST(rk AS BIGINT) AS rk, doc_id FROM r WHERE rk <= 10""".stripMargin

  /** Containment verification over the MinHash-LSH candidates: |∩| and set
    * sizes are integers; the division is the only FP op, mirrored exactly.
    * (The Spark side verifies band pairs INLINE in the band join — a pure
    * execution-shape change; candidates and output are identical to this
    * declarative form.)
    */
  val dedupContainment: String =
    s"""WITH $minhashVerCtes,
       |smp AS MATERIALIZED (SELECT doc_id, h FROM (SELECT doc_id, unnest(h0) AS h FROM hs) WHERE h % 8 = 0),
       |dfok AS MATERIALIZED (SELECT h FROM smp GROUP BY h HAVING count(*) <= 64),
       |smpf AS MATERIALIZED (SELECT doc_id, h FROM smp JOIN dfok USING (h)),
       |cs AS MATERIALIZED (SELECT a.doc_id AS d1, b.doc_id AS d2
       |       FROM smpf a JOIN smpf b ON a.h = b.h AND a.doc_id < b.doc_id),
       |c2 AS MATERIALIZED (SELECT d1, d2 FROM cand UNION SELECT d1, d2 FROM cs),
       |sets AS MATERIALIZED (SELECT doc_id, list_sort(list_distinct(h0)) AS hh FROM hs),
       |p AS MATERIALIZED (SELECT d1, d2, len(list_intersect(a.hh, b.hh)) AS ix,
       |        len(a.hh) AS n1, len(b.hh) AS n2
       |      FROM c2 JOIN sets a ON d1 = a.doc_id JOIN sets b ON d2 = b.doc_id)
       |SELECT d1, d2, round(ix::DOUBLE / n1, 6) AS cont1, round(ix::DOUBLE / n2, 6) AS cont2
       |FROM p WHERE greatest(ix::DOUBLE / n1, ix::DOUBLE / n2) >= 0.7""".stripMargin

  /** Tumbling 20-word-span exact dedup: first corpus-wide occurrence keeps
    * the span. Same md5-of-joined-words hash and (doc_id, para_idx) order
    * as the Spark plan.
    */
  val dedupParagraph: String =
    s"""WITH t AS MATERIALIZED (SELECT doc_id, $toksSql AS w FROM documents),
       |pl AS MATERIALIZED (SELECT doc_id,
       |         [{'idx': i, 'ph': md5(array_to_string(w[i*20+1 : i*20+20], ' '))}
       |          FOR i IN range(0, ((len(w)-1)//20)+1)] AS ps
       |       FROM t WHERE len(w) > 0),
       |p AS MATERIALIZED (SELECT doc_id, u.idx AS para_idx, u.ph AS phash
       |      FROM (SELECT doc_id, unnest(ps) AS u FROM pl)),
       |d AS MATERIALIZED (SELECT doc_id, para_idx, phash,
       |        count(*) OVER (PARTITION BY phash) AS n_copies,
       |        row_number() OVER (PARTITION BY phash ORDER BY doc_id, para_idx) AS rk
       |      FROM p)
       |SELECT doc_id, para_idx, phash, CAST(n_copies AS BIGINT) AS n_copies,
       |  rk = 1 AS keep
       |FROM d""".stripMargin

  /** Degree-ordered triangle enumeration over the verified near-dup pairs;
    * the (deg, id) order key packs into one BIGINT exactly like the Spark
    * plan.
    */
  val triangles: String =
    s"""WITH $minhashVerCtes,
       |pr AS MATERIALIZED (SELECT d1 AS u, d2 AS v FROM ver WHERE jac >= 0.5),
       |dg AS MATERIALIZED (SELECT id, count(*) AS deg
       |       FROM (SELECT u AS id FROM pr UNION ALL SELECT v AS id FROM pr) GROUP BY 1),
       |ky AS MATERIALIZED (SELECT pr.u, pr.v, a.deg * 10000000 + pr.u AS ku, b.deg * 10000000 + pr.v AS kv
       |       FROM pr JOIN dg a ON pr.u = a.id JOIN dg b ON pr.v = b.id),
       |ori AS MATERIALIZED (SELECT CASE WHEN ku < kv THEN u ELSE v END AS s,
       |               CASE WHEN ku < kv THEN v ELSE u END AS t FROM ky),
       |w AS MATERIALIZED (SELECT e1.s AS apex, e1.t AS x, e2.t AS y
       |      FROM ori e1 JOIN ori e2 ON e1.s = e2.s AND e1.t < e2.t),
       |tri AS MATERIALIZED (SELECT apex, x, y FROM w
       |        JOIN pr ON pr.u = least(x, y) AND pr.v = greatest(x, y))
       |SELECT least(apex, x, y) AS t1,
       |       apex + x + y - least(apex, x, y) - greatest(apex, x, y) AS t2,
       |       greatest(apex, x, y) AS t3
       |FROM tri""".stripMargin

  /** Ordered view→click→purchase funnel. The stage cascade uses the same
    * STRICT `>` comparisons as the Spark windows (a click in the same
    * millisecond as the first view does not advance the funnel), and the
    * NULL propagation matches: a missing earlier stage makes the `ms > m*`
    * predicate NULL, so the later min aggregates nothing.
    */
  val funnel: String =
    """WITH e AS MATERIALIZED (SELECT user_id, event_type, epoch_ms(ts) AS ms FROM events),
      |v AS MATERIALIZED (SELECT user_id,
      |        min(CASE WHEN event_type = 'view' THEN ms END) AS mv
      |      FROM e GROUP BY 1),
      |c AS MATERIALIZED (SELECT e.user_id,
      |        min(CASE WHEN event_type = 'click' AND ms > mv THEN ms END) AS mc
      |      FROM e JOIN v USING (user_id) GROUP BY 1),
      |p AS MATERIALIZED (SELECT e.user_id,
      |        min(CASE WHEN event_type = 'purchase' AND ms > mc THEN ms END) AS mp
      |      FROM e JOIN c USING (user_id) GROUP BY 1)
      |SELECT v.user_id,
      |       CAST(coalesce(mv, -1) AS BIGINT) AS view_ms,
      |       CAST(coalesce(mc, -1) AS BIGINT) AS click_ms,
      |       CAST(coalesce(mp, -1) AS BIGINT) AS purchase_ms,
      |       CAST(CASE WHEN mp IS NOT NULL THEN 3
      |                 WHEN mc IS NOT NULL THEN 2
      |                 WHEN mv IS NOT NULL THEN 1
      |                 ELSE 0 END AS BIGINT) AS depth
      |FROM v JOIN c USING (user_id) JOIN p USING (user_id)""".stripMargin

  /** Daily new users + running total over the per-day table. */
  val userGrowth: String =
    """WITH f AS MATERIALIZED (SELECT user_id, min(CAST(ts AS DATE)) AS day FROM events GROUP BY 1),
      |d AS MATERIALIZED (SELECT day, count(*) AS n_new FROM f GROUP BY 1)
      |SELECT CAST(day AS VARCHAR) AS day, n_new,
      |       CAST(sum(n_new) OVER (ORDER BY day
      |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_users
      |FROM d""".stripMargin

  /** Cohort retention matrix: cohort = each user's first active date,
    * cells = distinct users active at each day offset. Dates compare as
    * calendar days in UTC on both engines (Spark's session timezone is
    * pinned to UTC by Verify/Bench).
    */
  val retention: String =
    """WITH e AS MATERIALIZED (SELECT user_id, CAST(ts AS DATE) AS day FROM events),
      |f AS MATERIALIZED (SELECT user_id, min(day) AS cohort FROM e GROUP BY 1)
      |SELECT CAST(cohort AS VARCHAR) AS cohort,
      |       CAST(datediff('day', cohort, day) AS BIGINT) AS day_offset,
      |       count(DISTINCT e.user_id) AS n_active
      |FROM e JOIN f USING (user_id)
      |GROUP BY 1, 2""".stripMargin

  /** Inverted index with champion lists: df/cf per word plus the top-8
    * postings by (tf desc, doc_id) as a `doc:tf` string — the ordered
    * string_agg is the engine-portable posting-list form.
    */
  val invertedIndex: String =
    """WITH tok AS MATERIALIZED (SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents),
      |tf AS MATERIALIZED (SELECT word, doc_id, count(*) AS tf FROM tok WHERE word <> '' GROUP BY 1, 2),
      |ranked AS MATERIALIZED (SELECT word, doc_id, tf,
      |             count(*) OVER (PARTITION BY word) AS df,
      |             CAST(sum(tf) OVER (PARTITION BY word) AS BIGINT) AS cf,
      |             row_number() OVER (PARTITION BY word ORDER BY tf DESC, doc_id) AS rk
      |           FROM tf)
      |SELECT word, CAST(df AS BIGINT) AS df, cf,
      |       string_agg(doc_id || ':' || tf, ',' ORDER BY rk) AS postings
      |FROM ranked WHERE rk <= 8 GROUP BY word, df, cf""".stripMargin

  /** Shared CTE chain deriving per-doc BM25 term contributions (`sc`:
    * doc_id, contrib) — reused by [[bm25]] and [[rankFusion]]. Same ratio
    * idf, deci-token avgdl quantization and k1=1.2/b=0.75 rationalized
    * saturation as Retrieval.bm25 (floor division throughout, so scores
    * are bit-identical cross-engine).
    */
  private val bm25Ctes: String =
    """tok AS MATERIALIZED (SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents),
      |tok2 AS MATERIALIZED (SELECT doc_id, word FROM tok WHERE word <> ''),
      |dl AS MATERIALIZED (SELECT doc_id, count(*) AS dl FROM tok2 GROUP BY 1),
      |stats AS MATERIALIZED (SELECT count(*) AS n_docs, CAST(sum(dl) AS BIGINT) AS t_tok FROM dl),
      |tfq AS MATERIALIZED (SELECT doc_id, word, count(*) AS tf FROM tok2
      |        WHERE word IN ('join', 'scan', 'window', 'vector') GROUP BY 1, 2),
      |dfr AS MATERIALIZED (SELECT word, count(*) AS df FROM tfq GROUP BY 1),
      |sc AS MATERIALIZED (SELECT tfq.doc_id,
      |         ((n_docs - df + 1) * 1000000 // (df + 1))
      |           * (22 * (10 * t_tok // n_docs) * tf * 1000000
      |              // (10 * (10 * t_tok // n_docs) * tf
      |                 + 3 * (10 * t_tok // n_docs) + 90 * dl.dl))
      |           // 1000000 AS contrib
      |       FROM tfq JOIN dl ON tfq.doc_id = dl.doc_id
      |       CROSS JOIN stats JOIN dfr ON tfq.word = dfr.word)""".stripMargin

  val bm25: String =
    s"""WITH $bm25Ctes
       |SELECT doc_id, count(*) AS n_terms, CAST(sum(contrib) AS BIGINT) AS score_ppm
       |FROM sc GROUP BY doc_id
       |ORDER BY score_ppm DESC, doc_id LIMIT 20""".stripMargin

  /** Exact 3-shingle-Jaccard text k-NN: probe docs (doc_id < 10) against
    * the whole corpus — same shingle/hash/round-6dp derivations as the
    * MinHash family.
    */
  val textKnn: String =
    s"""WITH tok AS MATERIALIZED (SELECT doc_id, $toksSql AS w FROM documents),
       |tk AS MATERIALIZED (SELECT doc_id, w FROM tok WHERE len(w) >= 3),
       |shs AS MATERIALIZED (SELECT doc_id, list_distinct([w[i]||' '||w[i+1]||' '||w[i+2] FOR i IN range(1, len(w)-1)]) AS sh FROM tk),
       |hs AS MATERIALIZED (SELECT doc_id, list_transform(sh, s -> $hash60Sql % $P) AS h0 FROM shs),
       |p AS MATERIALIZED (SELECT q.doc_id AS probe_id, c.doc_id,
       |        round(len(list_intersect(q.h0, c.h0))::DOUBLE
       |              / len(list_distinct(list_concat(q.h0, c.h0))), 6) AS jac
       |      FROM hs q JOIN hs c ON c.doc_id <> q.doc_id
       |      WHERE q.doc_id < 10),
       |r AS MATERIALIZED (SELECT probe_id, doc_id, jac,
       |        row_number() OVER (PARTITION BY probe_id ORDER BY jac DESC, doc_id) AS rk
       |      FROM p)
       |SELECT probe_id, rk, doc_id, jac FROM r WHERE rk <= 3""".stripMargin

  /** Reciprocal-rank fusion of the BM25 head and embedding-kNN head —
    * both rankings re-derived from their own oracle chains, then the
    * 10⁶ div (60+rank) integer RRF combine over a full outer join.
    */
  val rankFusion: String =
    s"""WITH $bm25Ctes,
       |bagg AS MATERIALIZED (SELECT doc_id, CAST(sum(contrib) AS BIGINT) AS score_ppm FROM sc GROUP BY doc_id),
       |b AS MATERIALIZED (SELECT doc_id, bm25_rk FROM (
       |        SELECT doc_id, row_number() OVER (ORDER BY score_ppm DESC, doc_id) AS bm25_rk
       |        FROM bagg) t WHERE bm25_rk <= 20),
       |v AS MATERIALIZED (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
       |n AS MATERIALIZED (SELECT vec_id, e, sqrt(list_dot_product(e, e)) AS nrm FROM v),
       |q AS MATERIALIZED (SELECT * FROM n WHERE vec_id < 1),
       |pp AS MATERIALIZED (SELECT n.vec_id AS doc_id,
       |         round(list_dot_product(q.e, n.e) / (q.nrm * n.nrm), 4) AS cos4
       |       FROM q JOIN n ON n.vec_id <> q.vec_id),
       |a AS MATERIALIZED (SELECT doc_id, ann_rk FROM (
       |        SELECT doc_id, row_number() OVER (ORDER BY cos4 DESC, doc_id) AS ann_rk
       |        FROM pp) t WHERE ann_rk <= 20),
       |f AS MATERIALIZED (SELECT coalesce(b.doc_id, a.doc_id) AS doc_id,
       |        coalesce(b.bm25_rk, -1) AS bm25_rk,
       |        coalesce(a.ann_rk, -1) AS ann_rk,
       |        (CASE WHEN b.bm25_rk IS NULL THEN 0 ELSE 1000000 // (60 + b.bm25_rk) END
       |         + CASE WHEN a.ann_rk IS NULL THEN 0 ELSE 1000000 // (60 + a.ann_rk) END) AS rrf_ppm
       |      FROM b FULL OUTER JOIN a ON b.doc_id = a.doc_id)
       |SELECT doc_id, bm25_rk, ann_rk, CAST(rrf_ppm AS BIGINT) AS rrf_ppm,
       |       row_number() OVER (ORDER BY rrf_ppm DESC, doc_id) AS fused_rk
       |FROM f""".stripMargin

  /** Exact heavy hitters: words with true count > n div (k+1), k = 40 —
    * the sketch-then-verify composition makes the Spark side produce
    * exactly this set (MG guarantees no false negatives; the verify pass
    * removes false positives).
    */
  val heavyHitters: String =
    """WITH t AS MATERIALIZED (SELECT word FROM
      |  (SELECT unnest(string_split(text, ' ')) AS word FROM documents) u
      |  WHERE word <> ''),
      |n AS MATERIALIZED (SELECT count(*) AS n FROM t)
      |SELECT word, count(*) AS cnt FROM t CROSS JOIN n
      |GROUP BY word, n.n HAVING count(*) > n.n // 41""".stripMargin

  /** Per-source corpus profile in exact integers (means as ppm floor
    * division); token count = non-empty whitespace tokens, same filter as
    * the wordcount family.
    */
  val corpusProfile: String =
    s"""SELECT source, count(*) AS n_docs,
       |       CAST(sum(len($toksSql)) AS BIGINT) AS n_tokens,
       |       CAST(sum(n_chars) AS BIGINT) AS n_chars,
       |       CAST(sum(len($toksSql)) * 1000000 // count(*) AS BIGINT) AS avg_tokens_ppm,
       |       CAST(sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) * 1000000 // count(*) AS BIGINT) AS en_share_ppm
       |FROM documents GROUP BY source""".stripMargin

  /** Sliding-window chunking, size 16 / stride 12 — same count formula and
    * greatest(0,·) guard as Curation.chunkOverlap (the guard absorbs the
    * floor-vs-truncate divergence on the negative-numerator corner).
    */
  val chunkOverlap: String =
    s"""WITH t AS MATERIALIZED (SELECT doc_id, $toksSql AS toks FROM documents),
       |d AS MATERIALIZED (SELECT doc_id, toks, len(toks) AS n FROM t WHERE len(toks) > 0),
       |c AS MATERIALIZED (SELECT doc_id, toks, n,
       |        unnest(range(0, 1 + greatest(0, ((n - 16) + 11) // 12))) AS ci
       |      FROM d)
       |SELECT doc_id, CAST(ci AS BIGINT) AS chunk_idx,
       |       CAST(ci * 12 AS BIGINT) AS start_tok,
       |       array_to_string(toks[(ci * 12 + 1):(ci * 12 + 16)], ' ') AS chunk_text,
       |       CAST(least(16, n - ci * 12) AS BIGINT) AS chunk_tokens
       |FROM c""".stripMargin

  /** Per-type 3σ outliers via the cross-multiplied integer test
    * (n·x − s1)² > 9·(n·s2 − s1²) on exact cents — HUGEINT here, the
    * Spark side runs DECIMAL(38,0); same 128-bit integer values.
    */
  val outliers: String =
    """WITH e AS MATERIALIZED (SELECT event_id, user_id, event_type,
      |             CAST(round(value * 100) AS BIGINT) AS cents FROM events),
      |m AS MATERIALIZED (SELECT event_type, count(*) AS n, sum(cents) AS s1,
      |             sum(cents * cents) AS s2 FROM e GROUP BY 1)
      |SELECT event_id, user_id, event_type, cents
      |FROM e JOIN m USING (event_type)
      |WHERE CAST(n * cents - s1 AS HUGEINT) * CAST(n * cents - s1 AS HUGEINT)
      |      > 9 * (CAST(n AS HUGEINT) * CAST(s2 AS HUGEINT)
      |             - CAST(s1 AS HUGEINT) * CAST(s1 AS HUGEINT))""".stripMargin

  /** Type-2 SCD intervals from the event changelog: version + close-out
    * via lead over the same (ts, event_id) per-user order; open interval
    * = sentinel -1 / is_current 1.
    */
  val scd2: String =
    """SELECT user_id, version, event_id, event_type, valid_from_ms,
      |       coalesce(valid_to_ms, -1) AS valid_to_ms,
      |       CAST(CASE WHEN valid_to_ms IS NULL THEN 1 ELSE 0 END AS BIGINT) AS is_current
      |FROM (SELECT user_id, event_id, event_type,
      |        CAST(row_number() OVER w AS INTEGER) AS version,
      |        epoch_ms(ts) AS valid_from_ms,
      |        epoch_ms(lead(ts, 1) OVER w) AS valid_to_ms
      |      FROM events
      |      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)) t""".stripMargin

  /** D14 q_event_transitions — lag window per user + pair counts; p_ppm is
    * the same floor division both engines compute on BIGINT.
    */
  val eventTransitions: String =
    """WITH t AS MATERIALIZED (
      |  SELECT lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS from_type,
      |         event_type AS to_type
      |  FROM events),
      |g AS MATERIALIZED (
      |  SELECT from_type, to_type, CAST(count(*) AS BIGINT) AS n_trans
      |  FROM t WHERE from_type IS NOT NULL GROUP BY 1, 2)
      |SELECT from_type, to_type, n_trans,
      |       (1000000 * n_trans) // CAST(sum(n_trans) OVER (PARTITION BY from_type) AS BIGINT) AS p_ppm
      |FROM g""".stripMargin

  /** E20 q_drift_ks — exact two-sample KS per event type between the time
    * halves; cross products in HUGEINT mirror Spark's DECIMAL(38,0)
    * widening, floor division on non-negative operands agrees (`//` ↔
    * `div`).
    */
  /** E22 q_validate_release — the release gate's seven checks, one row
    * each. Every value is exact-integer ppm/count arithmetic; the policy
    * bands are Validate's named constants interpolated verbatim; the
    * drift check embeds the [[driftKs]] CTE chain and takes the worst
    * type. Quartiles are rank-based off the n_chars value-domain
    * histogram (q1 = min v with 4·cdf ≥ n), same rule as the Spark plan.
    */
  val validateRelease: String = {
    import graft.operators.Validate._
    s"""WITH a AS MATERIALIZED (
       |  SELECT count(*) AS n,
       |         sum(CASE WHEN text IS NULL THEN 1 ELSE 0 END) AS nulls,
       |         count(DISTINCT md5(text)) AS dhash,
       |         sum(CASE WHEN lang IS NULL OR lang = '' THEN 1 ELSE 0 END) AS nolang,
       |         sum(len($toksSql)) AS toks
       |  FROM documents),
       |h AS MATERIALIZED (SELECT n_chars AS v, count(*) AS c FROM documents GROUP BY 1),
       |cum AS MATERIALIZED (
       |  SELECT v, c, sum(c) OVER (ORDER BY v) AS cdf, sum(c) OVER () AS nn FROM h),
       |q AS MATERIALIZED (
       |  SELECT min(CASE WHEN cdf * 4 >= nn THEN v END) AS q1,
       |         min(CASE WHEN cdf * 4 >= nn * 3 THEN v END) AS q3 FROM cum),
       |outl AS MATERIALIZED (
       |  SELECT coalesce(sum(c), 0) AS nout FROM h, q
       |  WHERE v < q1 - (q3 - q1) * 3 OR v > q3 + (q3 - q1) * 3),
       |bnd AS MATERIALIZED (
       |  SELECT (min(epoch_ms(ts)) + max(epoch_ms(ts))) // 2 AS mid FROM events),
       |e AS MATERIALIZED (
       |  SELECT event_type, CAST(round(value * 100) AS BIGINT) AS cents, epoch_ms(ts) AS ms FROM events),
       |g AS MATERIALIZED (
       |  SELECT event_type, cents,
       |         sum(CASE WHEN ms < (SELECT mid FROM bnd) THEN 1 ELSE 0 END) AS c1,
       |         sum(CASE WHEN ms >= (SELECT mid FROM bnd) THEN 1 ELSE 0 END) AS c2
       |  FROM e GROUP BY 1, 2),
       |w AS MATERIALIZED (
       |  SELECT event_type,
       |         sum(c1) OVER (PARTITION BY event_type ORDER BY cents) AS cum1,
       |         sum(c2) OVER (PARTITION BY event_type ORDER BY cents) AS cum2,
       |         sum(c1) OVER (PARTITION BY event_type) AS n1,
       |         sum(c2) OVER (PARTITION BY event_type) AS n2
       |  FROM g),
       |ks AS MATERIALIZED (
       |  SELECT event_type, CAST(any_value(n1) AS BIGINT) AS n1, CAST(any_value(n2) AS BIGINT) AS n2,
       |         max(abs(CAST(cum1 AS HUGEINT) * CAST(n2 AS HUGEINT)
       |               - CAST(cum2 AS HUGEINT) * CAST(n1 AS HUGEINT))) AS dmax
       |  FROM w GROUP BY 1),
       |drift AS MATERIALIZED (
       |  SELECT max(CAST(CASE WHEN n1 = 0 OR n2 = 0 THEN 1000000
       |             ELSE (CAST(1000000 AS HUGEINT) * dmax) // (CAST(n1 AS HUGEINT) * CAST(n2 AS HUGEINT))
       |             END AS BIGINT)) AS d FROM ks),
       |rows_(chk, value, lo, hi) AS MATERIALIZED (
       |  SELECT 'doc_count', n, $MinDocs, ${Long.MaxValue} FROM a
       |  UNION ALL SELECT 'null_text_ppm', (nulls * 1000000) // greatest(n, 1), 0, $MaxNullTextPpm FROM a
       |  UNION ALL SELECT 'exact_dup_ppm', ((n - dhash) * 1000000) // greatest(n, 1), 0, $MaxExactDupPpm FROM a
       |  UNION ALL SELECT 'lang_missing_ppm', (nolang * 1000000) // greatest(n, 1), 0, $MaxLangMissingPpm FROM a
       |  UNION ALL SELECT 'mean_tokens_x100', (toks * 100) // greatest(n, 1), $MinMeanTokensX100, $MaxMeanTokensX100 FROM a
       |  UNION ALL SELECT 'nchars_outlier_ppm', (nout * 1000000) // (SELECT greatest(n, 1) FROM a), 0, $MaxNcharsOutlierPpm FROM outl
       |  UNION ALL SELECT 'events_drift_ppm', d, 0, $MaxDriftPpm FROM drift)
       |SELECT chk, CAST(value AS BIGINT) AS value, CAST(lo AS BIGINT) AS lo,
       |       CAST(hi AS BIGINT) AS hi, value BETWEEN lo AND hi AS pass
       |FROM rows_""".stripMargin
  }

  val driftKs: String =
    """WITH bnd AS MATERIALIZED (
      |  SELECT (min(epoch_ms(ts)) + max(epoch_ms(ts))) // 2 AS mid FROM events),
      |e AS MATERIALIZED (
      |  SELECT event_type, CAST(round(value * 100) AS BIGINT) AS cents, epoch_ms(ts) AS ms FROM events),
      |g AS MATERIALIZED (
      |  SELECT event_type, cents,
      |         sum(CASE WHEN ms < (SELECT mid FROM bnd) THEN 1 ELSE 0 END) AS c1,
      |         sum(CASE WHEN ms >= (SELECT mid FROM bnd) THEN 1 ELSE 0 END) AS c2
      |  FROM e GROUP BY 1, 2),
      |w AS MATERIALIZED (
      |  SELECT event_type,
      |         sum(c1) OVER (PARTITION BY event_type ORDER BY cents) AS cum1,
      |         sum(c2) OVER (PARTITION BY event_type ORDER BY cents) AS cum2,
      |         sum(c1) OVER (PARTITION BY event_type) AS n1,
      |         sum(c2) OVER (PARTITION BY event_type) AS n2
      |  FROM g),
      |a AS MATERIALIZED (
      |  SELECT event_type, CAST(any_value(n1) AS BIGINT) AS n1, CAST(any_value(n2) AS BIGINT) AS n2,
      |         max(abs(CAST(cum1 AS HUGEINT) * CAST(n2 AS HUGEINT)
      |               - CAST(cum2 AS HUGEINT) * CAST(n1 AS HUGEINT))) AS dmax
      |  FROM w GROUP BY 1)
      |SELECT event_type, n1, n2,
      |       CAST(CASE WHEN n1 = 0 OR n2 = 0 THEN 1000000
      |            ELSE (CAST(1000000 AS HUGEINT) * dmax) // (CAST(n1 AS HUGEINT) * CAST(n2 AS HUGEINT))
      |            END AS BIGINT) AS ks_ppm
      |FROM a""".stripMargin

  /** E23 q_drift_psi — PSI per event type between the time halves over
    * BASELINE-QUANTILE bins (bin(v) = min(15, 16·|first-half rows < v|
    * div n1) — pure integer rank arithmetic off the same value-domain
    * cdf the KS oracle walks), add-one smoothing, each bin's double
    * contribution rounded to 1e-6 units BEFORE the BIGINT sum
    * (order-free), bins empty in BOTH halves folded in as the per-type
    * closed-form constant, and the total-drift sentinel 10⁹ for a type
    * with an empty half (PSI is unbounded, but smoothing bounds every
    * computable value by 2·ln(n+16) < 10⁸ in 1e-6 units — the sentinel
    * strictly dominates). Contributions are ≥ 0, so DuckDB's
    * half-away-from-zero round equals Spark's HALF_UP.
    */
  val driftPsi: String =
    """WITH e AS MATERIALIZED (
      |  SELECT event_type, CAST(round(value * 100) AS BIGINT) AS cents, epoch_ms(ts) AS ms FROM events),
      |bnd AS MATERIALIZED (SELECT (min(ms) + max(ms)) // 2 AS mid FROM e),
      |g AS MATERIALIZED (
      |  SELECT event_type, cents,
      |         sum(CASE WHEN ms < (SELECT mid FROM bnd) THEN 1 ELSE 0 END)::BIGINT AS c1,
      |         sum(CASE WHEN ms >= (SELECT mid FROM bnd) THEN 1 ELSE 0 END)::BIGINT AS c2
      |  FROM e GROUP BY 1, 2),
      |w AS MATERIALIZED (
      |  SELECT event_type, c1, c2,
      |         sum(c1) OVER (PARTITION BY event_type ORDER BY cents) AS cum1,
      |         sum(c1) OVER (PARTITION BY event_type) AS n1,
      |         sum(c2) OVER (PARTITION BY event_type) AS n2
      |  FROM g),
      |bb AS MATERIALIZED (
      |  SELECT event_type,
      |         CASE WHEN n1 = 0 THEN 0
      |              ELSE least(15, (16 * (cum1 - c1)) // n1) END AS bin,
      |         c1, c2, n1, n2
      |  FROM w),
      |bins_ AS MATERIALIZED (
      |  SELECT event_type, bin, sum(c1)::BIGINT AS b1, sum(c2)::BIGINT AS b2,
      |         CAST(any_value(n1) AS BIGINT) AS n1, CAST(any_value(n2) AS BIGINT) AS n2
      |  FROM bb GROUP BY 1, 2),
      |c AS MATERIALIZED (
      |  SELECT event_type, n1, n2,
      |         CAST(round((((b1 + 1)::DOUBLE / (n1 + 16)) - ((b2 + 1)::DOUBLE / (n2 + 16)))
      |           * ln(((b1 + 1)::DOUBLE / (n1 + 16)) / ((b2 + 1)::DOUBLE / (n2 + 16)))
      |           * 1000000) AS BIGINT) AS contrib,
      |         CAST(round((1.0 / (n1 + 16) - 1.0 / (n2 + 16))
      |           * ln((n2 + 16)::DOUBLE / (n1 + 16)) * 1000000) AS BIGINT) AS ec
      |  FROM bins_),
      |a AS MATERIALIZED (
      |  SELECT event_type, any_value(n1) AS n1, any_value(n2) AS n2,
      |         sum(contrib) + (16 - count(*)) * any_value(ec) AS psi
      |  FROM c GROUP BY 1)
      |SELECT event_type, n1, n2,
      |       CAST(CASE WHEN n1 = 0 OR n2 = 0 THEN 1000000000 ELSE psi END AS BIGINT) AS psi_x1e6
      |FROM a""".stripMargin

  /** E24 q_drift_chi2 — the E23 CTE chain with the Pearson χ²
    * contribution in place of PSI's: expected counts per cell of the
    * 2×bins table, (O−e)²/e summed, 1e-6 units. Pure IEEE arithmetic
    * (no ln) — the expression mirrors the Spark side token-for-token.
    */
  val driftChi2: String =
    """WITH e AS MATERIALIZED (
      |  SELECT event_type, CAST(round(value * 100) AS BIGINT) AS cents, epoch_ms(ts) AS ms FROM events),
      |bnd AS MATERIALIZED (SELECT (min(ms) + max(ms)) // 2 AS mid FROM e),
      |g AS MATERIALIZED (
      |  SELECT event_type, cents,
      |         sum(CASE WHEN ms < (SELECT mid FROM bnd) THEN 1 ELSE 0 END)::BIGINT AS c1,
      |         sum(CASE WHEN ms >= (SELECT mid FROM bnd) THEN 1 ELSE 0 END)::BIGINT AS c2
      |  FROM e GROUP BY 1, 2),
      |w AS MATERIALIZED (
      |  SELECT event_type, c1, c2,
      |         sum(c1) OVER (PARTITION BY event_type ORDER BY cents) AS cum1,
      |         sum(c1) OVER (PARTITION BY event_type) AS n1,
      |         sum(c2) OVER (PARTITION BY event_type) AS n2
      |  FROM g),
      |bb AS MATERIALIZED (
      |  SELECT event_type,
      |         CASE WHEN n1 = 0 THEN 0
      |              ELSE least(15, (16 * (cum1 - c1)) // n1) END AS bin,
      |         c1, c2, n1, n2
      |  FROM w),
      |bins_ AS MATERIALIZED (
      |  SELECT event_type, bin, sum(c1)::BIGINT AS b1, sum(c2)::BIGINT AS b2,
      |         CAST(any_value(n1) AS BIGINT) AS n1, CAST(any_value(n2) AS BIGINT) AS n2
      |  FROM bb GROUP BY 1, 2),
      |x AS MATERIALIZED (
      |  SELECT event_type, n1, n2,
      |         CAST(n1 AS DOUBLE) * (b1 + b2) / (n1 + n2) AS e1,
      |         CAST(n2 AS DOUBLE) * (b1 + b2) / (n1 + n2) AS e2,
      |         b1, b2
      |  FROM bins_),
      |c AS MATERIALIZED (
      |  SELECT event_type, n1, n2,
      |         CAST(round((CASE WHEN n1 = 0 OR n2 = 0 THEN 0.0 ELSE
      |           (b1 - e1) * (b1 - e1) / e1 + (b2 - e2) * (b2 - e2) / e2
      |         END) * 1000000) AS BIGINT) AS contrib
      |  FROM x),
      |a AS MATERIALIZED (
      |  SELECT event_type, any_value(n1) AS n1, any_value(n2) AS n2,
      |         sum(contrib) AS chi2
      |  FROM c GROUP BY 1)
      |SELECT event_type, n1, n2,
      |       CAST(CASE WHEN n1 = 0 OR n2 = 0 THEN 1000000000 ELSE chi2 END AS BIGINT) AS chi2_x1e6
      |FROM a""".stripMargin

  /** E21 q_copurchase — the basket-size cap applies per order BEFORE pair
    * generation (mirrors the Spark plan's maxBasket guard; never binds on
    * this corpus), then a distinct-pair self-join stands in for the in-row
    * comprehension. Deterministic LIMIT: (n desc, p1, p2) is a total order
    * on unique pair rows.
    */
  val copurchase: String =
    """WITH sz AS MATERIALIZED (
      |  SELECT l_orderkey AS k, count(DISTINCT l_partkey) AS b FROM lineitem GROUP BY 1),
      |dp AS MATERIALIZED (
      |  SELECT DISTINCT l.l_orderkey AS k, l.l_partkey AS p
      |  FROM lineitem l JOIN sz ON sz.k = l.l_orderkey
      |  WHERE sz.b BETWEEN 2 AND 1024),
      |pc AS MATERIALIZED (
      |  SELECT a.p AS p1, b.p AS p2, CAST(count(*) AS BIGINT) AS n_orders
      |  FROM dp a JOIN dp b ON a.k = b.k AND a.p < b.p GROUP BY 1, 2)
      |SELECT p1, p2, n_orders FROM pc
      |WHERE n_orders >= 2
      |ORDER BY n_orders DESC, p1, p2 LIMIT 50""".stripMargin

  /** C52 q_k_anonymize — the generalization ladder computed over
    * progressive residues; bands on SHIFTED cents (+10⁸) because `div`
    * (truncate) and `//` (floor) only agree on non-negative operands and
    * balances go negative; k = 5 matches the Spark default.
    */
  val kAnonymize: String =
    """WITH c AS MATERIALIZED (
      |  SELECT c_custkey, CAST(c_nationkey AS INTEGER) AS nation,
      |         c_mktsegment AS segment,
      |         (CAST(round(c_acctbal * 100) AS BIGINT) + 100000000) AS sc
      |  FROM customer),
      |cb AS MATERIALIZED (
      |  SELECT *, sc // 100000 AS b1, sc // 500000 AS b2 FROM c),
      |g1 AS MATERIALIZED (
      |  SELECT nation, segment, b1, count(*) AS cnt1 FROM cb GROUP BY 1, 2, 3),
      |j1 AS MATERIALIZED (
      |  SELECT cb.*, g1.cnt1 FROM cb
      |  JOIN g1 USING (nation, segment, b1)),
      |r1 AS MATERIALIZED (SELECT * FROM j1 WHERE cnt1 < 5),
      |g2 AS MATERIALIZED (
      |  SELECT nation, segment, b2, count(*) AS cnt2 FROM r1 GROUP BY 1, 2, 3),
      |j2 AS MATERIALIZED (
      |  SELECT r1.*, g2.cnt2 FROM r1
      |  JOIN g2 USING (nation, segment, b2))
      |SELECT c_custkey, nation, segment,
      |       b1 * 100000 - 100000000 AS lo_cents,
      |       (b1 + 1) * 100000 - 100000000 AS hi_cents,
      |       0 AS level
      |FROM j1 WHERE cnt1 >= 5
      |UNION ALL
      |SELECT c_custkey, nation, segment,
      |       b2 * 500000 - 100000000 AS lo_cents,
      |       (b2 + 1) * 500000 - 100000000 AS hi_cents,
      |       1 AS level
      |FROM j2 WHERE cnt2 >= 5
      |UNION ALL
      |SELECT c_custkey, -1 AS nation, '*' AS segment,
      |       CAST(-1 AS BIGINT) AS lo_cents, CAST(-1 AS BIGINT) AS hi_cents,
      |       2 AS level
      |FROM j2 WHERE cnt2 < 5""".stripMargin

  /** C54 q_l_diversity — the C52 release re-derived as a nested CTE, the
    * per-customer min order priority ('NONE' for order-less customers),
    * then the per-group exact distinct count and the ≥ l verdict.
    */
  val lDiversity: String =
    s"""WITH rel AS MATERIALIZED (
       |$kAnonymize
       |),
       |sens AS MATERIALIZED (
       |  SELECT o_custkey AS c_custkey, min(o_orderpriority) AS sens
       |  FROM orders GROUP BY 1),
       |rs AS MATERIALIZED (
       |  SELECT rel.nation, rel.segment, rel.lo_cents, rel.hi_cents, rel.level,
       |         coalesce(sens.sens, 'NONE') AS sens
       |  FROM rel LEFT JOIN sens USING (c_custkey))
       |SELECT nation, segment, lo_cents, hi_cents, level,
       |       CAST(count(*) AS BIGINT) AS n_records,
       |       CAST(count(DISTINCT sens) AS BIGINT) AS n_sensitive,
       |       count(DISTINCT sens) >= 3 AS diverse
       |FROM rs GROUP BY 1, 2, 3, 4, 5""".stripMargin

  /** C57 q_t_closeness — the C54 CTE chain extended with the
    * exact-integer ordered-domain EMD: dense group×domain grid (absent
    * cells count 0), cumulative `cnt·N − gcnt·N_g` over the
    * lexically-ordered sensitive domain, |cum| summed per group; the
    * t = 1/5 verdict is the integer comparison num·5 ≤ N_g·N·(m−1).
    */
  val tCloseness: String =
    s"""WITH rel AS MATERIALIZED (
       |$kAnonymize
       |),
       |sens AS MATERIALIZED (
       |  SELECT o_custkey AS c_custkey, min(o_orderpriority) AS sens
       |  FROM orders GROUP BY 1),
       |rs AS MATERIALIZED (
       |  SELECT rel.nation, rel.segment, rel.lo_cents, rel.hi_cents, rel.level,
       |         coalesce(sens.sens, 'NONE') AS sens
       |  FROM rel LEFT JOIN sens USING (c_custkey)),
       |gdist AS MATERIALIZED (SELECT sens, count(*) AS gcnt FROM rs GROUP BY 1),
       |tot AS MATERIALIZED (
       |  SELECT count(*) AS n_total, count(DISTINCT sens) AS m FROM rs),
       |grp AS MATERIALIZED (
       |  SELECT nation, segment, lo_cents, hi_cents, level, count(*) AS n_g
       |  FROM rs GROUP BY 1, 2, 3, 4, 5),
       |cell AS MATERIALIZED (
       |  SELECT nation, segment, lo_cents, hi_cents, level, sens,
       |         count(*) AS cnt
       |  FROM rs GROUP BY 1, 2, 3, 4, 5, 6),
       |dense AS MATERIALIZED (
       |  SELECT g.nation, g.segment, g.lo_cents, g.hi_cents, g.level,
       |         g.n_g, gl.sens, gl.gcnt, coalesce(c.cnt, 0) AS cnt,
       |         t.n_total, t.m
       |  FROM grp g CROSS JOIN gdist gl CROSS JOIN tot t
       |  LEFT JOIN cell c
       |    ON c.nation = g.nation AND c.segment = g.segment
       |   AND c.lo_cents = g.lo_cents AND c.hi_cents = g.hi_cents
       |   AND c.level = g.level AND c.sens = gl.sens),
       |cum AS MATERIALIZED (
       |  SELECT nation, segment, lo_cents, hi_cents, level, n_g, n_total, m,
       |         sum(cnt * n_total - gcnt * n_g) OVER
       |           (PARTITION BY nation, segment, lo_cents, hi_cents, level
       |            ORDER BY sens
       |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
       |  FROM dense)
       |SELECT nation, segment, lo_cents, hi_cents, level,
       |       CAST(n_g AS BIGINT) AS n_records,
       |       CAST(sum(abs(cum)) AS BIGINT) AS emd_num,
       |       CAST(n_g * n_total * (m - 1) AS BIGINT) AS emd_den,
       |       sum(abs(cum)) * 5 <= n_g * n_total * (m - 1) AS t_close
       |FROM cum GROUP BY 1, 2, 3, 4, 5, n_g, n_total, m""".stripMargin

  /** D17 q_gap_fill — per-user daily grid (generate_series returns
    * TIMESTAMP → cast back to DATE) with IGNORE NULLS forward fill; sums
    * cast out of HUGEINT.
    */
  val gapFill: String =
    """WITH daily AS MATERIALIZED (
      |  SELECT user_id, ts::DATE AS day, CAST(count(*) AS BIGINT) AS n_events,
      |         CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS cents
      |  FROM events GROUP BY 1, 2),
      |spans AS MATERIALIZED (
      |  SELECT user_id,
      |         unnest(generate_series(min(day), max(day), INTERVAL 1 DAY))::DATE AS day
      |  FROM daily GROUP BY user_id),
      |j AS MATERIALIZED (
      |  SELECT s.user_id, s.day, d.n_events, d.cents
      |  FROM spans s LEFT JOIN daily d ON d.user_id = s.user_id AND d.day = s.day)
      |SELECT user_id, CAST(day AS VARCHAR) AS day,
      |       CAST(coalesce(n_events, 0) AS BIGINT) AS n_events,
      |       CAST(coalesce(cents, 0) AS BIGINT) AS cents,
      |       last_value(cents IGNORE NULLS) OVER
      |         (PARTITION BY user_id ORDER BY day
      |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled_cents
      |FROM j""".stripMargin

  /** D16 q_merge_upsert — base/changelog split at the E20 midpoint; the
    * latest changelog row per user wins via (ms, event_id) row_number
    * (Spark reduces with max(struct(...)) — same total order, event_id is
    * unique); tombstones (`error`) drop the row on both sides.
    */
  val mergeUpsert: String =
    """WITH ev AS MATERIALIZED (
      |  SELECT user_id, event_type, event_id, epoch_ms(ts) AS ms FROM events),
      |mid AS MATERIALIZED (SELECT (min(ms) + max(ms)) // 2 AS mid FROM ev),
      |b1 AS MATERIALIZED (
      |  SELECT user_id, event_type, ms,
      |         count(*) OVER (PARTITION BY user_id) AS n_base,
      |         row_number() OVER (PARTITION BY user_id ORDER BY ms DESC, event_id DESC) AS rn
      |  FROM ev, mid WHERE ms < mid),
      |base AS MATERIALIZED (
      |  SELECT user_id, CAST(n_base AS BIGINT) AS n_base, ms AS b_ms,
      |         event_type AS b_type
      |  FROM b1 WHERE rn = 1),
      |c1 AS MATERIALIZED (
      |  SELECT user_id, event_type, ms,
      |         row_number() OVER (PARTITION BY user_id ORDER BY ms DESC, event_id DESC) AS rn
      |  FROM ev, mid WHERE ms >= mid),
      |chg AS MATERIALIZED (
      |  SELECT user_id, ms AS c_ms, event_type AS c_type,
      |         (event_type = 'error') AS del
      |  FROM c1 WHERE rn = 1)
      |SELECT coalesce(b.user_id, c.user_id) AS user_id,
      |       CAST(coalesce(b.n_base, 0) AS BIGINT) AS n_base,
      |       CASE WHEN c.user_id IS NULL THEN b.b_ms ELSE c.c_ms END AS last_ms,
      |       CASE WHEN c.user_id IS NULL THEN b.b_type ELSE c.c_type END AS last_type,
      |       CASE WHEN c.user_id IS NULL THEN 'keep'
      |            WHEN b.user_id IS NULL THEN 'insert'
      |            ELSE 'update' END AS action
      |FROM base b FULL OUTER JOIN chg c ON b.user_id = c.user_id
      |WHERE c.user_id IS NULL OR NOT c.del""".stripMargin

  /** C51 q_entity_resolve — the oracle states the SEMANTICS (brand-blocked
    * quadratic ED ≤ 2 join, min smaller-id match per part); the Spark plan's
    * PassJoin segment blocking is lossless, so the two must agree exactly.
    * DuckDB's `levenshtein` is the same classic unit-cost edit distance as
    * Spark's builtin and the in-bucket DP (FuzzySpec pins all three).
    */
  val entityResolve: String =
    """WITH m AS MATERIALIZED (
      |  SELECT x.p_partkey AS k, min(y.p_partkey) AS canon
      |  FROM part x JOIN part y
      |    ON x.p_brand = y.p_brand AND y.p_partkey < x.p_partkey
      |  WHERE levenshtein(x.p_name, y.p_name) <= 2
      |  GROUP BY 1)
      |SELECT p.p_partkey AS k,
      |       coalesce(m.canon, p.p_partkey) AS canon,
      |       CAST(coalesce(levenshtein(p.p_name, c.p_name), -1) AS INTEGER) AS dist
      |FROM part p
      |LEFT JOIN m ON m.k = p.p_partkey
      |LEFT JOIN part c ON c.p_partkey = m.canon""".stripMargin
}
