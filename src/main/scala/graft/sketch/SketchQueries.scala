package graft.sketch

import org.apache.spark.sql.{Column, DataFrame, Encoders, SparkSession}
import org.apache.spark.sql.functions._

import graft.{QueryPack, Tables}
import graft.dedup.Shingles.{hash60, hash60Sql, MixA, MixB, P}

/** Approximate-aggregate sketches for corpus-scale profiling, built so the
  * DuckDB oracle can reproduce them BIT-FOR-BIT: every sketch here is a
  * deterministic function of the input SET (md5-derived hashes, exact
  * integer arithmetic), not of row/merge order. That is the difference
  * from `approx_count_distinct`/HLL, whose register layout no second
  * engine reproduces — these sketches get the same hash-exact verification
  * as every other query in the surface.
  *
  * Reference anchor: the reference's corpus statistics are all exact
  * (document frequency, DocumentFreq.java:96-106); at 100 TB the exact
  * versions are full-shuffle jobs, and these are the constant-state
  * replacements a corpus profile actually runs.
  */
object SketchQueries extends QueryPack {

  /** KMV sketch size: 256 keeps the relative standard error
    * ~1/sqrt(k-2) ≈ 6% with 2 KB of state per partition.
    */
  val K = 256

  /** Count-min depth (independent hash rows) and width (cells per row).
    * Error bound: overestimate <= 2N/W with probability 1 - 2^-D.
    */
  val D = 4
  val W = 1024L

  /** Row-r universal hash of a 60-bit hash into [0, W) — the same
    * (a*h + b) mod P family the minhash mix uses (exact int64 both
    * engines: a < 2^30, h mod P < 2^30).
    */
  private def cellCol(r: Int, h: Column): Column =
    (lit(MixA(r)) * (h % lit(P)) + lit(MixB(r))) % lit(P) % lit(W)

  private def cellSql(r: Int, h: String): String =
    s"(((${MixA(r)} * (($h) % $P) + ${MixB(r)}) % $P) % $W)"

  /** (value-hash column) -> one (r, cell) row per CMS row, hashed once. */
  private def withCells(hashed: DataFrame): DataFrame =
    hashed.select(col("*"), explode(array((0 until D).map(r =>
        struct(lit(r).as("r"), cellCol(r, col("h")).as("cell"))): _*)).as("rc"))
      .select(col("*"), col("rc.r").as("r"), col("rc.cell").as("cell"))
      .drop("rc", "h")

  private def cmsUnionsSql(from: String, cols: String): String =
    (0 until D).map(r =>
      s"SELECT $cols$r AS r, ${cellSql(r, "h")} AS cell FROM $from")
      .mkString(" UNION ALL ")

  override val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // KMV distinct-count sketch over lineitem part keys. The aggregation
    // state is k longs per partition regardless of input size — the
    // 100 TB replacement for an exact count(distinct). At sf0.001 the
    // distinct count (200) is below k and the sketch degenerates to the
    // exact answer; at sf0.01+ the (k-1)/U_(k) estimator engages.
    "q_sketch_kmv" -> ((s, d) => {
      val kmv = udaf(new KmvAgg(K), Encoders.scalaLong)
      Tables.load(s, d, "lineitem")
        .select(hash60(col("l_partkey").cast("string")).as("hv"))
        .agg(kmv(col("hv")).as("s"))
        .select(col("s.k").as("k"), col("s.n_kept").as("n_kept"),
          col("s.kth_hash").as("kth_hash"),
          round(col("s.est_distinct"), 4).as("est_distinct"))
    }),

    // Count-min-sketch heavy-hitter estimates for a fixed probe set of
    // event users. The sketch is D*W counters built in one narrow pass +
    // a tiny aggregation (partial agg collapses each partition to at most
    // D*W cells before the shuffle); probes read the sketch via a
    // broadcast join. n_est >= n_exact always (CMS overestimates);
    // SketchSpec asserts the error bound.
    "q_sketch_cms_topk" -> ((s, d) => {
      val cells = withCells(
        Tables.load(s, d, "events")
          .select(hash60(col("user_id").cast("string")).as("h")))
        .groupBy("r", "cell").agg(count(lit(1)).as("cnt"))
      val probes = withCells(
        s.range(1, 21).select(col("id").as("user_id"),
          hash60(col("id").cast("string")).as("h")))
      val est = cells.join(broadcast(probes), Seq("r", "cell"))
        .groupBy("user_id").agg(min(col("cnt")).as("n_est"))
      Tables.load(s, d, "events")
        .filter(col("user_id").between(1, 20))
        .groupBy("user_id").agg(count(lit(1)).as("n_exact"))
        .join(est, Seq("user_id"))
        .select(col("user_id"), col("n_exact"), col("n_est"))
    })
  )

  override val oracles: Map[String, String] = Map(

    "q_sketch_kmv" ->
      s"""WITH h AS (
         |  SELECT DISTINCT ${hash60Sql("CAST(l_partkey AS VARCHAR)")} AS hv
         |  FROM lineitem
         |), b AS (SELECT hv FROM h ORDER BY hv LIMIT $K)
         |SELECT $K AS k, count(*) AS n_kept, max(hv) AS kth_hash,
         |       CASE WHEN count(*) < $K THEN round(CAST(count(*) AS DOUBLE), 4)
         |            ELSE round(${K - 1}.0 * ${1L << 60}.0 / max(hv), 4)
         |       END AS est_distinct
         |FROM b""".stripMargin,

    "q_sketch_cms_topk" ->
      s"""WITH h AS (
         |  SELECT ${hash60Sql("CAST(user_id AS VARCHAR)")} AS h FROM events
         |), cells AS (
         |  SELECT r, cell, count(*) AS cnt
         |  FROM (${cmsUnionsSql("h", "")}) GROUP BY r, cell
         |), probe AS (
         |  SELECT CAST(range AS BIGINT) AS user_id,
         |         ${hash60Sql("CAST(range AS VARCHAR)")} AS h
         |  FROM range(1, 21)
         |), pc AS (${cmsUnionsSql("probe", "user_id, ")}
         |), est AS (
         |  SELECT user_id, min(cnt) AS n_est
         |  FROM pc JOIN cells USING (r, cell) GROUP BY user_id
         |), exact AS (
         |  SELECT user_id, count(*) AS n_exact FROM events
         |  WHERE user_id BETWEEN 1 AND 20 GROUP BY user_id
         |)
         |SELECT e.user_id, e.n_exact, s.n_est
         |FROM exact e JOIN est s USING (user_id)""".stripMargin
  )
}
