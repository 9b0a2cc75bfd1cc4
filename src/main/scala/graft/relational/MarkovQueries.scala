package graft.relational

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.{CacheScope, QueryPack, Tables}

/** Markov-chain analytics over user event sequences — the transition
  * matrix, its stationary distribution (integer fixed-point power
  * iteration), and absorption probabilities into the error state (split
  * from [[EventOpsQueries]] per the per-file 1,000-line budget; keys
  * unchanged). Everything after the ONE lead()-pass transition count
  * runs on the |types|^2 matrix — constant-size at any corpus scale.
  */
object MarkovQueries extends QueryPack {

  private def t(s: SparkSession, d: String, n: String): DataFrame = Tables.load(s, d, n)

  /** q_markov_stationary dials: mass units per state at init, power-
    * iteration rounds (unrolled in the oracle).
    */
  val MarkovScale = 1000000000000L
  val MarkovIters = 8

  /** Absorbing state and value-iteration depth for q_markov_absorption. */
  val MarkovAbsorb = "error"
  val AbsorbIters = 12

  override val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // First-order Markov transition matrix over user event sequences:
    // P(next_type | type), the sequence-mining / next-action-model
    // primitive. One user-partitioned lead() window pairs each event
    // with its successor, one aggregation counts transitions, and the
    // row-normalizing denominator comes from a window over the
    // TRANSITION MATRIX itself (|types|^2 rows — constant at any scale),
    // not a second pass over events. Probabilities are exact
    // integer-ratio doubles rounded to 9.
    "q_markov_transitions" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      val pairs = t(s, d, "events")
        .select(col("user_id"), col("ts"), col("event_id"),
          col("event_type").as("from_type"),
          lead(col("event_type"), 1).over(w).as("to_type"))
        .filter(col("to_type").isNotNull)
        .groupBy("from_type", "to_type").agg(count(lit(1)).as("n"))
      val rowTotal = Window.partitionBy("from_type")
      pairs.select(col("from_type"), col("to_type"), col("n"),
        round(col("n").cast("double") / sum(col("n")).over(rowTotal), 9)
          .as("p"))
    }),

    // Stationary distribution of that Markov chain — where the behavior
    // converges if the observed dynamics persist, the long-run mix a
    // capacity model plans against. Power iteration in INTEGER fixed
    // point (the PageRank discipline on a |types|x|types| matrix): mass
    // m·n div rt per step with the product routed through DECIMAL so a
    // 100 TB transition count cannot overflow, MarkovIters rounds
    // unrolled identically in the oracle. Everything after the one
    // events-sized lead/count pass runs on the constant-size matrix.
    "q_markov_stationary" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      val cnts = t(s, d, "events")
        .select(col("user_id"), col("ts"), col("event_id"),
          col("event_type").as("from_type"),
          lead(col("event_type"), 1).over(w).as("to_type"))
        .filter(col("to_type").isNotNull)
        .groupBy("from_type", "to_type").agg(count(lit(1)).as("n"))
      // DOCUMENTED BOUNDED COLLECT (r14): one events-sized lead/count
      // pass reduces the corpus to the |types|² transition matrix —
      // constant-size at any corpus scale (event_type is an enum-shaped
      // domain; the guard fails fast rather than trust that silently).
      // The r14 isolated adjudication showed the old 8-round join/agg
      // unroll on this constant relation was pure per-job fixed latency
      // (~8 × 0.3 s against microseconds of arithmetic — the conformal/
      // k-center bounded-driver-literal precedent, PLANS r11). The
      // rounds run here in exact BigInt arithmetic — bit-identical to
      // the join form and to the oracle's unrolled HUGEINT CTEs, which
      // is what keeps the hash gate meaningful; the final ratio stays a
      // Spark expression so float rounding is engine-identical.
      // limit(guard+1) probes the bound BEFORE materializing (ADVICE
      // r14): a non-enum domain ships at most 4097 rows to the driver
      // and fails fast, instead of collecting the full |types|² relation
      // first and only then hitting the require; when the guard holds,
      // the limited collect IS the complete relation (limit above the
      // row count is the identity, and the fixpoint below is
      // order-insensitive — it folds cells into keyed maps).
      val cells = cnts.limit(4097).collect()
        .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
      require(cells.length <= 4096,
        "transition matrix exceeds 4096 cells — not a bounded enum domain")
      val rt = cells.groupBy(_._1).map { case (f, cs) => f -> cs.map(_._3).sum }
      var pi: Map[String, BigInt] =
        rt.keysIterator.map(_ -> BigInt(MarkovScale)).toMap
      for (_ <- 1 to MarkovIters) {
        val next = collection.mutable.Map.empty[String, BigInt]
          .withDefaultValue(BigInt(0))
        for ((f, to, n) <- cells; m <- pi.get(f))
          next(to) += m * n / rt(f)
        pi = next.toMap
      }
      import s.implicits._
      val piDf = pi.toSeq.map { case (st, m) => (st, m.toLong) }
        .sortBy(_._1).toDF("state", "m")
      piDf.crossJoin(broadcast(piDf.agg(sum(col("m")).as("tm"))))
        .select(col("state"), col("m").as("pi_fixed"),
          round(col("m").cast("double") / col("tm").cast("double"), 9).as("pi"))
    }),

    // Expected steps to ABSORPTION in the 'error' state from each
    // transient state — the "how many more actions before this user hits
    // an error" readout next to q_markov_stationary's long-run mix.
    // Truncated value iteration e_{k+1}(s) = 1 + Σ_to P(s,to)·e_k(to)
    // with e(error) ≡ 0, AbsorbIters unrolled rounds in the SAME
    // fixed-point integer units as the stationary query (Scale per step,
    // integer div — bit-reproducible in any partitioning, oracle unrolls
    // identically). The truncation UNDERestimates by the geometric tail
    // — the documented trade; states that cannot reach 'error' saturate
    // at AbsorbIters steps, which the is_saturated flag calls out.
    "q_markov_absorption" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      val cnts = t(s, d, "events")
        .select(col("user_id"), col("ts"), col("event_id"),
          col("event_type").as("from_type"),
          lead(col("event_type"), 1).over(w).as("to_type"))
        .filter(col("to_type").isNotNull)
        .groupBy("from_type", "to_type").agg(count(lit(1)).as("n"))
      // Same bounded-collect fixpoint as q_markov_stationary (r14): the
      // |types|² matrix is constant-size, and the 12 unrolled
      // value-iteration rounds were per-job latency, not compute. Exact
      // BigInt arithmetic replicates the old DECIMAL div semantics
      // (positive truncating division) and the oracle's HUGEINT CTEs.
      // limit(guard+1) probes the bound BEFORE materializing (ADVICE
      // r14): a non-enum domain ships at most 4097 rows to the driver
      // and fails fast, instead of collecting the full |types|² relation
      // first and only then hitting the require; when the guard holds,
      // the limited collect IS the complete relation (limit above the
      // row count is the identity, and the fixpoint below is
      // order-insensitive — it folds cells into keyed maps).
      val cells = cnts.limit(4097).collect()
        .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
      require(cells.length <= 4096,
        "transition matrix exceeds 4096 cells — not a bounded enum domain")
      val rt = cells.groupBy(_._1).map { case (f, cs) => f -> cs.map(_._3).sum }
      val trans = cells.filter(_._1 != MarkovAbsorb)
      val states = rt.keysIterator.filter(_ != MarkovAbsorb).toSeq.sorted
      var e: Map[String, BigInt] = states.map(_ -> BigInt(0)).toMap
      for (_ <- 1 to AbsorbIters) {
        val sm = collection.mutable.Map.empty[String, BigInt]
          .withDefaultValue(BigInt(0))
        for ((f, to, n) <- trans)
          sm(f) += e.getOrElse(to, BigInt(0)) * n / rt(f)
        e = states.map(st => st -> (BigInt(MarkovScale) + sm(st))).toMap
      }
      import s.implicits._
      states.map(st => (st, e(st).toLong)).toDF("state", "m")
        .select(col("state"), col("m").as("steps_fixed"),
          round(col("m").cast("double") / MarkovScale.toDouble, 6)
            .as("expected_steps"),
          // div truncation sheds <1 unit per to-state per round, so a
          // saturated (error-unreachable) state lands a hair under
          // k·Scale — the slack absorbs it
          (col("m") >= lit(MarkovScale) * AbsorbIters - 1000L).as("is_saturated"))
    }))

  /** One unrolled absorption-time step (reads e{i-1}). */
  private def absorbIterCte(i: Int): String =
    s"""e$i AS (
       |  SELECT pm.from_type AS state,
       |         CAST($MarkovScale + sum(
       |           (CAST(coalesce(p.m, 0) AS HUGEINT) * pm.n) // pm.rt)
       |           AS BIGINT) AS m
       |  FROM pm LEFT JOIN e${i - 1} p ON p.state = pm.to_type
       |  GROUP BY 1
       |)""".stripMargin

  /** One unrolled stationary-distribution step (reads pi{i-1}). */
  private def markovIterCte(i: Int): String =
    s"""pi$i AS (
       |  SELECT pm.to_type AS state,
       |         CAST(sum((p.m * pm.n) // pm.rt) AS HUGEINT) AS m
       |  FROM pm JOIN pi${i - 1} p ON p.state = pm.from_type
       |  GROUP BY 1
       |)""".stripMargin

  private lazy val markovStationaryOracle: String =
    s"""WITH pr AS (
       |  SELECT event_type AS from_type,
       |         lead(event_type) OVER (PARTITION BY user_id
       |                                ORDER BY ts ASC, event_id ASC) AS to_type
       |  FROM events
       |), c AS (
       |  SELECT from_type, to_type, count(*) AS n
       |  FROM pr WHERE to_type IS NOT NULL GROUP BY 1, 2
       |), rt AS (
       |  SELECT from_type, CAST(sum(n) AS BIGINT) AS rt FROM c GROUP BY 1
       |), pm AS (
       |  SELECT c.from_type, c.to_type, c.n, r.rt
       |  FROM c JOIN rt r ON r.from_type = c.from_type
       |), pi0 AS (
       |  SELECT from_type AS state, CAST($MarkovScale AS HUGEINT) AS m FROM rt
       |),
       |${(1 to MarkovIters).map(markovIterCte).mkString(",\n")}
       |SELECT state, CAST(m AS BIGINT) AS pi_fixed,
       |       round(CAST(m AS DOUBLE) /
       |             (SELECT CAST(sum(m) AS DOUBLE) FROM pi$MarkovIters), 9) AS pi
       |FROM pi$MarkovIters""".stripMargin

  override val oracles: Map[String, String] = Map(

    "q_markov_stationary" -> markovStationaryOracle,

    "q_markov_absorption" ->
      s"""WITH pr AS (
         |  SELECT event_type AS from_type,
         |         lead(event_type) OVER (PARTITION BY user_id
         |                                ORDER BY ts ASC, event_id ASC) AS to_type
         |  FROM events
         |), c AS (
         |  SELECT from_type, to_type, count(*) AS n
         |  FROM pr WHERE to_type IS NOT NULL GROUP BY 1, 2
         |), rt AS (
         |  SELECT from_type, CAST(sum(n) AS BIGINT) AS rt FROM c GROUP BY 1
         |), pm AS (
         |  SELECT c.from_type, c.to_type, c.n, r.rt
         |  FROM c JOIN rt r ON r.from_type = c.from_type
         |  WHERE c.from_type <> '$MarkovAbsorb'
         |), e0 AS (
         |  SELECT from_type AS state, CAST(0 AS BIGINT) AS m FROM rt
         |  WHERE from_type <> '$MarkovAbsorb'
         |),
         |${(1 to AbsorbIters).map(absorbIterCte).mkString(",\n")}
         |SELECT state, m AS steps_fixed,
         |       round(CAST(m AS DOUBLE) / ${MarkovScale.toDouble}, 6)
         |         AS expected_steps,
         |       m >= ${MarkovScale}::BIGINT * $AbsorbIters - 1000 AS is_saturated
         |FROM e$AbsorbIters""".stripMargin,

    "q_markov_transitions" ->
      """WITH p AS (
        |  SELECT event_type AS from_type,
        |         lead(event_type) OVER (PARTITION BY user_id
        |                                ORDER BY ts ASC, event_id ASC) AS to_type
        |  FROM events
        |), c AS (
        |  SELECT from_type, to_type, count(*) AS n
        |  FROM p WHERE to_type IS NOT NULL GROUP BY 1, 2
        |)
        |SELECT from_type, to_type, n,
        |       round(CAST(n AS DOUBLE) /
        |             sum(n) OVER (PARTITION BY from_type), 9) AS p
        |FROM c""".stripMargin)
}
