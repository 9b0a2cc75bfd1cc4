package graft.relational

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{QueryPack, Tables}

/** Alternating-least-squares recommender primitives over the implicit
  * customer×part ratings (summed order quantities): one exact ALS
  * half-round — solve every user's k=2 factor vector against FIXED item
  * factors by the closed-form 2×2 normal equations — plus the fit RMSE of
  * the solved factors. This is the inner loop of every large-scale ALS
  * recommender (Hu/Koren/Volinsky-style implicit MF): a full trainer
  * alternates the same solve user↔item; one audited, oracled half-round
  * is the operator a pipeline composes.
  *
  * Determinism discipline: item factors are integer THOUSANDTHS derived
  * from the part key by multiplicative hashing — no doubles anywhere near
  * the data. All Gram sums (Σv·vᵀ, Σr·v) are exact int64 sums of bounded
  * integers (order-independent under any partitioning); the 2×2 solve
  * then runs on identical doubles in both engines, pinned at 6dp.
  * Overflow headroom: v ≤ 999 thousandths, quantity ≤ 50, so a user needs
  * ~10^10 rated items to stress int64 — and the per-user rating count IS
  * the natural dial (cap ratings per user upstream, the standard
  * implicit-MF practice).
  *
  * Scale shape: one lineitem-sized agg to (cust, part) ratings, one
  * broadcast-free projection (factors are arithmetic on the part key —
  * nothing to join), one groupBy(cust) Gram aggregation, closed-form
  * select. The RMSE pass re-joins predictions only against the bounded
  * per-user factor relation.
  */
object RecsysQueries extends QueryPack {

  /** λ in tenths (0.1), applied in the double-precision solve. */
  val LambdaTenths = 1

  private def t(s: SparkSession, d: String, n: String): DataFrame = Tables.load(s, d, n)

  /** (custkey, partkey, r) implicit ratings: total quantity ordered. */
  private def ratings(s: SparkSession, d: String): DataFrame =
    t(s, d, "lineitem")
      .join(t(s, d, "orders").select(col("o_orderkey"), col("o_custkey")),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_custkey").as("custkey"), col("l_partkey").as("partkey"))
      .agg(sum(col("l_quantity").cast("long")).as("r"))

  /** Item factors in integer thousandths (multiplicative hash of the key:
    * Knuth's 2654435761 and a second odd constant decorrelate the two
    * coordinates).
    */
  private def withFactors(df: DataFrame): DataFrame = df
    .withColumn("v1", pmod(col("partkey") * lit(2654435761L), lit(1000L)))
    .withColumn("v2", pmod(col("partkey") * lit(40503L) + 7, lit(1000L)))

  private val RatingsSql =
    """WITH ratings AS (
      |  SELECT o.o_custkey AS custkey, l.l_partkey AS partkey,
      |         sum(CAST(l.l_quantity AS BIGINT)) AS r
      |  FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
      |  GROUP BY 1, 2
      |), f AS (
      |  SELECT custkey, partkey, r,
      |         (partkey * 2654435761) % 1000 AS v1,
      |         (partkey * 40503 + 7) % 1000 AS v2
      |  FROM ratings
      |), gram AS (
      |  SELECT custkey, count(*) AS n_items,
      |         sum(v1 * v1) AS a11i, sum(v1 * v2) AS a12i,
      |         sum(v2 * v2) AS a22i,
      |         sum(r * v1) AS b1i, sum(r * v2) AS b2i
      |  FROM f GROUP BY 1
      |), solved AS (
      |  SELECT custkey, n_items,
      |         CAST(a11i AS DOUBLE) / 1e6 + 0.1 AS a11,
      |         CAST(a12i AS DOUBLE) / 1e6 AS a12,
      |         CAST(a22i AS DOUBLE) / 1e6 + 0.1 AS a22,
      |         CAST(b1i AS DOUBLE) / 1e3 AS b1,
      |         CAST(b2i AS DOUBLE) / 1e3 AS b2
      |  FROM gram
      |), u AS (
      |  SELECT custkey, n_items,
      |         (a22 * b1 - a12 * b2) / (a11 * a22 - a12 * a12) AS u1,
      |         (a11 * b2 - a12 * b1) / (a11 * a22 - a12 * a12) AS u2
      |  FROM solved
      |)""".stripMargin

  override val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // One ALS half-round: per-user k=2 factors from the closed-form
    // ridge-regularized 2x2 solve u = (VᵀV + λI)⁻¹ Vᵀr. det > 0 always
    // (Gram + λI is positive definite), so no degenerate-row guard is
    // needed. One lineitem agg + one bounded groupBy — no window, no
    // collect, nothing driver-side.
    "q_ml_als_round" -> ((s, d) => {
      val g = withFactors(ratings(s, d))
        .groupBy("custkey")
        .agg(count(lit(1)).as("n_items"),
          sum(col("v1") * col("v1")).as("a11i"),
          sum(col("v1") * col("v2")).as("a12i"),
          sum(col("v2") * col("v2")).as("a22i"),
          sum(col("r") * col("v1")).as("b1i"),
          sum(col("r") * col("v2")).as("b2i"))
      val a11 = col("a11i").cast("double") / 1e6 + lit(0.1)
      val a12 = col("a12i").cast("double") / 1e6
      val a22 = col("a22i").cast("double") / 1e6 + lit(0.1)
      val b1 = col("b1i").cast("double") / 1e3
      val b2 = col("b2i").cast("double") / 1e3
      val det = a11 * a22 - a12 * a12
      g.select(col("custkey"), col("n_items"),
        round((a22 * b1 - a12 * b2) / det, 6).as("u1"),
        round((a11 * b2 - a12 * b1) / det, 6).as("u2"))
    }),

    // Fit quality of the half-round: RMSE of u·v against the ratings the
    // solve saw. Residual sums ride round(,6)-pinned DECIMAL(24,6)
    // addition (the Det discipline) so the global mean is exact in both
    // engines before the final sqrt.
    "q_ml_als_rmse" -> ((s, d) => {
      val rf = withFactors(ratings(s, d))
        .transform(graft.CacheScope.persisted(_))
      val g = rf.groupBy("custkey")
        .agg(sum(col("v1") * col("v1")).as("a11i"),
          sum(col("v1") * col("v2")).as("a12i"),
          sum(col("v2") * col("v2")).as("a22i"),
          sum(col("r") * col("v1")).as("b1i"),
          sum(col("r") * col("v2")).as("b2i"))
      val a11 = col("a11i").cast("double") / 1e6 + lit(0.1)
      val a12 = col("a12i").cast("double") / 1e6
      val a22 = col("a22i").cast("double") / 1e6 + lit(0.1)
      val b1 = col("b1i").cast("double") / 1e3
      val b2 = col("b2i").cast("double") / 1e3
      val det = a11 * a22 - a12 * a12
      val u = g.select(col("custkey").as("uck"),
        ((a22 * b1 - a12 * b2) / det).as("u1"),
        ((a11 * b2 - a12 * b1) / det).as("u2"))
      val resid = rf.join(u, col("custkey") === col("uck"))
        .select((col("r").cast("double") -
          (col("u1") * col("v1").cast("double") +
            col("u2") * col("v2").cast("double")) / 1e3).as("e"))
        .select(round(col("e") * col("e"), 6)
          .cast(org.apache.spark.sql.types.DecimalType(24, 6)).as("e2"))
      resid.agg(count(lit(1)).as("n"), sum(col("e2")).as("sse"))
        .select(col("n").cast("long").as("n_ratings"),
          round(sqrt(col("sse").cast("double") / col("n").cast("double")),
            6).as("rmse"))
    }))

  override val oracles: Map[String, String] = Map(

    "q_ml_als_round" ->
      s"""$RatingsSql
         |SELECT custkey, CAST(n_items AS BIGINT) AS n_items,
         |       round(u1, 6) AS u1, round(u2, 6) AS u2
         |FROM u""".stripMargin,

    "q_ml_als_rmse" ->
      s"""$RatingsSql, resid AS (
         |  SELECT CAST(round(
         |           (CAST(f.r AS DOUBLE) -
         |            (u.u1 * CAST(f.v1 AS DOUBLE) +
         |             u.u2 * CAST(f.v2 AS DOUBLE)) / 1e3) *
         |           (CAST(f.r AS DOUBLE) -
         |            (u.u1 * CAST(f.v1 AS DOUBLE) +
         |             u.u2 * CAST(f.v2 AS DOUBLE)) / 1e3),
         |           6) AS DECIMAL(24,6)) AS e2
         |  FROM f JOIN u ON u.custkey = f.custkey
         |)
         |SELECT CAST(count(*) AS BIGINT) AS n_ratings,
         |       round(sqrt(CAST(sum(e2) AS DOUBLE) / count(*)), 6) AS rmse
         |FROM resid""".stripMargin)
}
