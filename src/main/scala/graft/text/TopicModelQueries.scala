package graft.text

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.{QueryPack, Tables}

/** Probabilistic topic modeling: two EM rounds of 2-topic PLSA (Hofmann) —
  * the missing rung between [[TextModelQueries]]'s text_lsa (linear-algebra
  * topics) and a full LDA: p(w|z) and p(z|d) via expectation-maximization
  * on the doc-word count matrix, from a deterministic md5-derived
  * initialization. Two rounds is where the structure appears: round 1's
  * uniform p(z|d) makes responsibilities doc-independent; round 2 couples
  * documents and words and the topics separate.
  *
  * Determinism: the init weights are small exact integers from md5 bytes;
  * every EM quantity is a product/division of identical-operand doubles,
  * and every SUM over docs or words is a decimal fold of round(,9)-pinned
  * terms (the logreg discipline — float summation order never exists).
  * The top-k readout ranks on round(,6)-pinned probabilities with a word
  * tie-break, so a final-digit wobble cannot reorder the output.
  *
  * Scale shape: vocab is a top-[[PlsaVocab]] TakeOrdered relation that
  * broadcasts; the count matrix aggregates the token stream once; each EM
  * round is one vocab-keyed broadcast join + one doc-keyed equi-join and
  * two bounded aggregations. At 100 TB: exactly the shape of one
  * distributed EM epoch — rounds scale linearly, state is |vocab|+|docs|.
  */
object TopicModelQueries extends QueryPack {

  private def docs(s: SparkSession, d: String): DataFrame =
    Tables.load(s, d, "documents")

  /** Vocabulary cap (top words by corpus frequency, tie word-asc). */
  val PlsaVocab = 300

  /** Words shown per topic. */
  val PlsaTopK = 20

  override val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    "text_plsa" -> ((s, d) => {
      val stops = Stopwords.reachable.filter(_.nonEmpty)
      // (doc, word)-collapsed count matrix in ONE corpus pass (r16, guide
      // §2.3 "aggregate before you shuffle"): the raw occurrence stream is
      // never cached or shuffled — partial aggregation collapses each map
      // task to its distinct (doc_id, w) pairs before the only
      // stream-sized exchange. The vocab ranking then reads this
      // already-aggregated cache (sum of per-doc counts == the occurrence
      // count, exact integers), and the vocab-restricted matrix is a
      // broadcast semi-join of the SAME cache — the r15 shape paid a full
      // second pass over the cached occurrence stream for each.
      val dwc = docs(s, d)
        .select(col("doc_id"),
          explode(TextAnalysisQueries.cleanTokens(col("text"))).as("w"))
        .filter(col("w") =!= "" && !col("w").isInCollection(stops))
        .groupBy(col("doc_id"), col("w")).agg(count(lit(1)).as("n"))
        // eager: the vocab BROADCAST job and ndw's stage job otherwise
        // race to materialize this cache (broadcast exchanges run as
        // independent jobs)
        .transform(graft.CacheScope.persisted(_))
      val vocab = dwc.groupBy("w").agg(sum(col("n")).as("cw"))
        .orderBy(col("cw").desc, col("w").asc).limit(PlsaVocab)
        .transform(graft.CacheScope.persisted(_))
      val ndw = dwc.join(broadcast(vocab.select(col("w"))), "w")
        .select(col("doc_id"), col("w"), col("n"))
        // eager: ndw feeds every EM branch of one action — see
        // CacheScope.persisted
        .transform(graft.CacheScope.persisted(_))
      // deterministic init: integer weights 1..5 per (word, topic)
      val hz = conv(substring(md5(col("w")), 1, 6), 16, 10).cast("long")
      val aw = vocab.select(col("w"), (hz % 5 + 1).as("a0"), ((hz + 3) % 5 + 1).as("a1"))
      val atot = aw.agg(sum(col("a0")).as("ta0"), sum(col("a1")).as("ta1"))
      val pwz0 = aw.crossJoin(broadcast(atot))
        .select(col("w"),
          (col("a0").cast("double") / col("ta0").cast("double")).as("pw0"),
          (col("a1").cast("double") / col("ta1").cast("double")).as("pw1"))
      // round 1: p(z|d) uniform cancels — responsibilities are per-word
      val r1 = pwz0.select(col("w"),
          (col("pw0") / (col("pw0") + col("pw1"))).as("r0"),
          (col("pw1") / (col("pw0") + col("pw1"))).as("r1"))
        .transform(graft.CacheScope.persisted(_))
      val dec = DecimalType(24, 9)
      val nw = ndw.groupBy("w").agg(sum(col("n")).as("nw"))
      val m1 = nw.join(r1, "w")
        .select(col("w"),
          round(col("nw") * col("r0"), 9).cast(dec).as("q0"),
          round(col("nw") * col("r1"), 9).cast(dec).as("q1"))
      val z1 = m1.agg(sum(col("q0")).as("tq0"), sum(col("q1")).as("tq1"))
      val pwz1 = m1.crossJoin(broadcast(z1))
        .select(col("w"),
          (col("q0").cast("double") / col("tq0").cast("double")).as("pw0"),
          (col("q1").cast("double") / col("tq1").cast("double")).as("pw1"))
        .transform(graft.CacheScope.persisted(_))
      val pzd1 = ndw.join(broadcast(r1), "w")
        .groupBy(col("doc_id"))
        .agg(sum(round(col("n") * col("r0"), 9).cast(dec)).as("s0"),
          sum(round(col("n") * col("r1"), 9).cast(dec)).as("s1"))
        .select(col("doc_id"),
          (col("s0").cast("double") / (col("s0") + col("s1")).cast("double"))
            .as("pd0"),
          (col("s1").cast("double") / (col("s0") + col("s1")).cast("double"))
            .as("pd1"))
      // round 2: full E-step couples docs and words
      val e2 = ndw.join(broadcast(pwz1), "w").join(pzd1, "doc_id")
        .withColumn("u0", col("pw0") * col("pd0"))
        .withColumn("u1", col("pw1") * col("pd1"))
        .filter(col("u0") + col("u1") > 0)
        .select(col("w"), col("n"),
          (col("u0") / (col("u0") + col("u1"))).as("g0"),
          (col("u1") / (col("u0") + col("u1"))).as("g1"))
      val m2 = e2.groupBy("w")
        .agg(sum(round(col("n") * col("g0"), 9).cast(dec)).as("q0"),
          sum(round(col("n") * col("g1"), 9).cast(dec)).as("q1"))
        .transform(graft.CacheScope.persisted(_))
      val z2 = m2.agg(sum(col("q0")).as("tq0"), sum(col("q1")).as("tq1"))
      val pwz2 = m2.crossJoin(broadcast(z2))
        .select(col("w"),
          round(col("q0").cast("double") / col("tq0").cast("double"), 6).as("p0"),
          round(col("q1").cast("double") / col("tq1").cast("double"), 6).as("p1"))
      val long = pwz2.select(col("w"), lit(0).as("topic"), col("p0").as("p_wz"))
        .unionByName(pwz2.select(col("w"), lit(1).as("topic"), col("p1").as("p_wz")))
      val rw = Window.partitionBy("topic").orderBy(col("p_wz").desc, col("w").asc)
      long.withColumn("rnk", row_number().over(rw))
        .filter(col("rnk") <= PlsaTopK)
        .select(col("topic"), col("rnk"), col("w").as("word"), col("p_wz"))
    }))

  override val oracles: Map[String, String] = Map(

    "text_plsa" ->
      s"""WITH toks AS (
         |  SELECT doc_id, w FROM (
         |    SELECT doc_id,
         |           unnest(string_split_regex(regexp_replace(lower(text), '[^a-z ]', '', 'g'), ' +')) AS w
         |    FROM documents)
         |  WHERE w != '' AND w NOT IN ${TextAnalysisQueries.stopList}
         |), vocab AS MATERIALIZED (
         |  SELECT w, count(*) AS cw FROM toks GROUP BY w
         |  ORDER BY cw DESC, w ASC LIMIT $PlsaVocab
         |), ndw AS MATERIALIZED (
         |  SELECT t.doc_id, t.w, count(*) AS n
         |  FROM toks t JOIN vocab v ON v.w = t.w
         |  GROUP BY 1, 2
         |), aw AS (
         |  SELECT w,
         |         ('0x' || substring(md5(w), 1, 6))::BIGINT % 5 + 1 AS a0,
         |         (('0x' || substring(md5(w), 1, 6))::BIGINT + 3) % 5 + 1 AS a1
         |  FROM vocab
         |), atot AS (SELECT sum(a0) AS ta0, sum(a1) AS ta1 FROM aw),
         |pwz0 AS (
         |  SELECT w, CAST(a0 AS DOUBLE) / CAST(ta0 AS DOUBLE) AS pw0,
         |         CAST(a1 AS DOUBLE) / CAST(ta1 AS DOUBLE) AS pw1
         |  FROM aw CROSS JOIN atot
         |), r1 AS MATERIALIZED (
         |  SELECT w, pw0 / (pw0 + pw1) AS r0, pw1 / (pw0 + pw1) AS r1 FROM pwz0
         |), nw AS (SELECT w, sum(n) AS nw FROM ndw GROUP BY w),
         |m1 AS (
         |  SELECT n.w, CAST(round(n.nw * r.r0, 9) AS DECIMAL(24,9)) AS q0,
         |         CAST(round(n.nw * r.r1, 9) AS DECIMAL(24,9)) AS q1
         |  FROM nw n JOIN r1 r ON r.w = n.w
         |), z1 AS (SELECT sum(q0) AS tq0, sum(q1) AS tq1 FROM m1),
         |pwz1 AS MATERIALIZED (
         |  SELECT w, CAST(q0 AS DOUBLE) / CAST(tq0 AS DOUBLE) AS pw0,
         |         CAST(q1 AS DOUBLE) / CAST(tq1 AS DOUBLE) AS pw1
         |  FROM m1 CROSS JOIN z1
         |), pzd1 AS MATERIALIZED (
         |  SELECT d.doc_id,
         |         CAST(sum(CAST(round(d.n * r.r0, 9) AS DECIMAL(24,9))) AS DOUBLE) /
         |           CAST(sum(CAST(round(d.n * r.r0, 9) AS DECIMAL(24,9))) +
         |                sum(CAST(round(d.n * r.r1, 9) AS DECIMAL(24,9))) AS DOUBLE) AS pd0,
         |         CAST(sum(CAST(round(d.n * r.r1, 9) AS DECIMAL(24,9))) AS DOUBLE) /
         |           CAST(sum(CAST(round(d.n * r.r0, 9) AS DECIMAL(24,9))) +
         |                sum(CAST(round(d.n * r.r1, 9) AS DECIMAL(24,9))) AS DOUBLE) AS pd1
         |  FROM ndw d JOIN r1 r ON r.w = d.w
         |  GROUP BY d.doc_id
         |), e2 AS (
         |  SELECT d.w, d.n,
         |         (p.pw0 * z.pd0) / (p.pw0 * z.pd0 + p.pw1 * z.pd1) AS g0,
         |         (p.pw1 * z.pd1) / (p.pw0 * z.pd0 + p.pw1 * z.pd1) AS g1
         |  FROM ndw d
         |  JOIN pwz1 p ON p.w = d.w
         |  JOIN pzd1 z ON z.doc_id = d.doc_id
         |  WHERE p.pw0 * z.pd0 + p.pw1 * z.pd1 > 0
         |), m2 AS (
         |  SELECT w, sum(CAST(round(n * g0, 9) AS DECIMAL(24,9))) AS q0,
         |         sum(CAST(round(n * g1, 9) AS DECIMAL(24,9))) AS q1
         |  FROM e2 GROUP BY w
         |), z2 AS (SELECT sum(q0) AS tq0, sum(q1) AS tq1 FROM m2),
         |pwz2 AS (
         |  SELECT w, round(CAST(q0 AS DOUBLE) / CAST(tq0 AS DOUBLE), 6) AS p0,
         |         round(CAST(q1 AS DOUBLE) / CAST(tq1 AS DOUBLE), 6) AS p1
         |  FROM m2 CROSS JOIN z2
         |), lng AS (
         |  SELECT w, 0 AS topic, p0 AS p_wz FROM pwz2
         |  UNION ALL SELECT w, 1, p1 FROM pwz2
         |)
         |SELECT topic, rnk, w AS word, p_wz FROM (
         |  SELECT topic, w, p_wz,
         |         CAST(row_number() OVER (PARTITION BY topic
         |                                 ORDER BY p_wz DESC, w ASC) AS INT) AS rnk
         |  FROM lng
         |) WHERE rnk <= $PlsaTopK""".stripMargin)
}
