package graft.relational

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{QueryPack, Tables}

/** Spatial operators over a deterministic planar point set — the
  * grid-blocked join family (kNN join, radius join, density hotspots,
  * space-filling-curve layout) that a geo-enriched warehouse needs.
  *
  * The synthetic tables carry no coordinates, so each entity gets a
  * deterministic integer position derived from its key by a fixed LCG
  * step ((k·a + b) mod 10^6 per axis, different multipliers per table
  * and axis) — exact BIGINT arithmetic that both engines reproduce
  * bit-for-bit, and distances stay exact integers (squared Euclidean),
  * so there is no floating-point trig to diverge on.
  *
  * Scale design: every pairwise operator is BLOCKED on a grid cell —
  * probes replicate to the 3×3 neighbor cells and equi-join on the
  * build side's cell key, so candidate counts are bounded by local
  * density, never |probe|×|build|. The radius R is chosen ≤ the cell
  * size, which makes the 3×3 neighborhood a complete cover (no false
  * negatives) — the standard fixed-grid spatial-join contract. At
  * 100 TB the same plan holds: the cell key shuffles both sides once,
  * AQE handles dense-city skew, and per-cell candidate lists stay
  * bounded by physical density.
  */
object GeoQueries extends QueryPack {

  private def t(s: SparkSession, d: String, n: String): DataFrame = Tables.load(s, d, n)

  /** World is a 10^6 × 10^6 integer square. */
  val World = 1000000L

  /** Coarse cell for the customer↔supplier joins: 10×10 grid. With the
    * synthetic supplier density (~1 per coarse cell at sf0.01) the 3×3
    * neighborhood carries ~9 candidates per probe.
    */
  val Cell = 100000L

  /** Radius for the radius join — ≤ [[Cell]] so the 3×3 neighborhood is a
    * complete cover of the disk (blocking has zero false negatives).
    */
  val Radius = 50000L

  /** Fine cell for density hotspots: 20×20 grid. */
  val FineCell = 50000L

  /** Deterministic planar position for key `k`: one LCG step per axis.
    * Multipliers differ per table so the two point sets don't share a
    * lattice. Kept in BIGINT — max |k·a| ≈ 1e9·1e5 stays far under 2^63.
    */
  private def coord(k: Column, a: Long, b: Long): Column =
    (k * lit(a) + lit(b)) % lit(World)

  private def customers(s: SparkSession, d: String): DataFrame =
    t(s, d, "customer").select(
      col("c_custkey"), col("c_nationkey"), col("c_mktsegment"),
      coord(col("c_custkey"), 48271L, 11L).as("x"),
      coord(col("c_custkey"), 69621L, 17L).as("y"))

  private def suppliers(s: SparkSession, d: String): DataFrame =
    t(s, d, "supplier").select(
      col("s_suppkey"), col("s_nationkey"),
      coord(col("s_suppkey"), 40503L, 23L).as("x"),
      coord(col("s_suppkey"), 45989L, 29L).as("y"))

  /** Probe side replicated to its 3×3 neighbor cells (explode of the
    * constant offset array — a narrow 9× fan-out, no shuffle), keyed to
    * equi-join the build side's (cell_x, cell_y).
    */
  private def withNeighborCells(df: DataFrame, cell: Long): DataFrame =
    df.withColumn("dx", explode(array(lit(-1L), lit(0L), lit(1L))))
      .withColumn("dy", explode(array(lit(-1L), lit(0L), lit(1L))))
      .withColumn("jx", expr(s"x div ${cell}") + col("dx"))
      .withColumn("jy", expr(s"y div ${cell}") + col("dy"))

  override val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // k=3 nearest suppliers per customer, candidates restricted to the
    // 3×3 coarse-cell neighborhood (a bounded-density equi-join, never
    // all-pairs). Distance is exact integer squared Euclidean; ranking
    // tie-breaks on s_suppkey, so the result is fully deterministic.
    // Customers whose neighborhood holds no supplier drop out in both
    // engines (the blocked-kNN contract: it is a *local* kNN).
    "q_geo_knn" -> ((s, d) => {
      val probe = withNeighborCells(customers(s, d), Cell)
        .select(col("c_custkey"), col("x").as("cx"), col("y").as("cy"),
          col("jx"), col("jy"))
      val build = suppliers(s, d)
        .withColumn("jx", expr(s"x div ${Cell}"))
        .withColumn("jy", expr(s"y div ${Cell}"))
        .select(col("s_suppkey"), col("x").as("sx"), col("y").as("sy"),
          col("jx"), col("jy"))
      val cand = probe.join(build, Seq("jx", "jy"))
        .select(col("c_custkey"), col("s_suppkey"),
          ((col("cx") - col("sx")) * (col("cx") - col("sx")) +
           (col("cy") - col("sy")) * (col("cy") - col("sy"))).as("d2"))
      val w = Window.partitionBy("c_custkey")
        .orderBy(col("d2").asc, col("s_suppkey").asc)
      cand.withColumn("rnk", row_number().over(w))
        .filter(col("rnk") <= 3)
        .select(col("c_custkey"), col("rnk"), col("s_suppkey"), col("d2"))
    }),

    // Radius join: customer–supplier pairs within Radius, aggregated per
    // market segment. Radius ≤ Cell ⇒ the 3×3 block cover is complete,
    // so the blocked join is EXACT (no false negatives) — the invariant
    // that makes fixed-grid radius joins safe at any scale.
    "q_geo_radius_pairs" -> ((s, d) => {
      val probe = withNeighborCells(customers(s, d), Cell)
        .select(col("c_mktsegment"), col("x").as("cx"), col("y").as("cy"),
          col("jx"), col("jy"))
      val build = suppliers(s, d)
        .withColumn("jx", expr(s"x div ${Cell}"))
        .withColumn("jy", expr(s"y div ${Cell}"))
        .select(col("x").as("sx"), col("y").as("sy"), col("jx"), col("jy"))
      probe.join(build, Seq("jx", "jy"))
        .select(col("c_mktsegment"),
          ((col("cx") - col("sx")) * (col("cx") - col("sx")) +
           (col("cy") - col("sy")) * (col("cy") - col("sy"))).as("d2"))
        .filter(col("d2") <= lit(Radius * Radius))
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n_pairs"), min(col("d2")).as("min_d2"),
          sum(col("d2")).as("sum_d2"))
    }),

    // Per-nation spatial profile of the customer point set: bounding box,
    // centroid, and the mean squared distance to the centroid (spatial
    // dispersion) — n·Σ(x²+y²) − (Σx)² − (Σy)² over n², exact integers
    // until one final division. The cross terms are staged through
    // DECIMAL(38,0) (ADVICE r11): n·Σ(x²+y²) is ~6e16 at sf0.1 and grows
    // linearly in n², so int64 would wrap around sf10 while the DuckDB
    // oracle computes in int128 — DECIMAL keeps both engines on the same
    // exact integer at ANY scale factor. The dispersion is emitted as one
    // IEEE division of that exact integer (both engines convert the same
    // value, and nearest-double conversion + one division is
    // deterministic); a round(,6) would re-quantize past the double's
    // precision and diverge (the mm_audio_cepstrum lesson in PLANS.md).
    "q_geo_bbox" -> ((s, d) =>
      customers(s, d)
        .groupBy(col("c_nationkey"))
        .agg(count(lit(1)).as("n"),
          min(col("x")).as("min_x"), max(col("x")).as("max_x"),
          min(col("y")).as("min_y"), max(col("y")).as("max_y"),
          sum(col("x")).as("sx"), sum(col("y")).as("sy"),
          sum(col("x") * col("x") + col("y") * col("y")).as("sxy2"))
        .select(col("c_nationkey"), col("n"),
          col("min_x"), col("max_x"), col("min_y"), col("max_y"),
          round(col("sx").cast("double") / col("n"), 6).as("centroid_x"),
          round(col("sy").cast("double") / col("n"), 6).as("centroid_y"),
          ((col("n").cast("decimal(38,0)") * col("sxy2") -
            col("sx").cast("decimal(38,0)") * col("sx") -
            col("sy").cast("decimal(38,0)") * col("sy")).cast("double") /
            (col("n") * col("n")).cast("double")).as("dispersion"))),

    // Morton (Z-order) layout audit: interleave the 10-bit cell coords
    // (cells of 1024 ⇒ coords < 977 < 2^10) into a 20-bit Z value, then
    // profile 256-cell Z-prefix blocks — points per block, distinct cells
    // touched, and the Z span — the layout statistic behind "does a
    // range scan on the curve stay local". The interleave is ONE
    // aggregate HOF over the 10 bit positions (pure integer shifts), and
    // it folds over DISTINCT cells only, so its cost is bounded by the
    // grid (≤ 2^20 rows) at ANY table size.
    "q_geo_morton" -> ((s, d) => {
      val cells = customers(s, d)
        .select(expr("x div 1024").as("gx"), expr("y div 1024").as("gy"))
        .groupBy("gx", "gy").agg(count(lit(1)).as("n"))
      val z = cells.withColumn("z", expr(
        """aggregate(sequence(0, 9), 0L, (acc, i) ->
          |  acc + shiftleft(shiftright(gx, i) & 1, 2 * i)
          |      + shiftleft(shiftright(gy, i) & 1, 2 * i + 1))""".stripMargin))
      z.groupBy(expr("z div 256").as("z_block"))
        .agg(sum(col("n")).as("n_points"), count(lit(1)).as("n_cells"),
          min(col("z")).as("z_min"), max(col("z")).as("z_max"))
        .orderBy(col("n_points").desc, col("z_block").asc)
        .limit(20)
    }),

    // Density hotspots on the fine grid: each cell against its 3×3
    // neighborhood (self-join on neighbor cell keys — the same bounded
    // blocking as the kNN), score = 9n/Σneigh (ratio of the cell to the
    // neighborhood mean), exact integers until one final division.
    "q_geo_hotspot" -> ((s, d) => {
      val cells = customers(s, d)
        .select(expr(s"x div ${FineCell}").as("gx"),
          expr(s"y div ${FineCell}").as("gy"))
        .groupBy("gx", "gy").agg(count(lit(1)).as("n"))
      val neigh = cells
        .withColumn("dx", explode(array(lit(-1L), lit(0L), lit(1L))))
        .withColumn("dy", explode(array(lit(-1L), lit(0L), lit(1L))))
        .select((col("gx") + col("dx")).as("gx"),
          (col("gy") + col("dy")).as("gy"), col("n").as("nn"))
        .groupBy("gx", "gy").agg(sum(col("nn")).as("neigh_n"))
      cells.join(neigh, Seq("gx", "gy"))
        .select(col("gx"), col("gy"), col("n"), col("neigh_n"),
          round(lit(9.0) * col("n") / col("neigh_n"), 6).as("score"))
        .orderBy(col("score").desc, col("n").desc, col("gx").asc,
          col("gy").asc)
        .limit(20)
    }))

  override val oracles: Map[String, String] = Map(

    "q_geo_knn" ->
      s"""WITH c AS (
         |  SELECT c_custkey,
         |         (c_custkey * 48271 + 11) % ${World} AS x,
         |         (c_custkey * 69621 + 17) % ${World} AS y
         |  FROM customer
         |), sup AS (
         |  SELECT s_suppkey,
         |         (s_suppkey * 40503 + 23) % ${World} AS x,
         |         (s_suppkey * 45989 + 29) % ${World} AS y
         |  FROM supplier
         |), probe AS (
         |  SELECT c.c_custkey, c.x AS cx, c.y AS cy,
         |         (c.x // ${Cell}) + dx.dx AS jx, (c.y // ${Cell}) + dy.dy AS jy
         |  FROM c
         |  CROSS JOIN (SELECT unnest([-1, 0, 1]) AS dx) dx
         |  CROSS JOIN (SELECT unnest([-1, 0, 1]) AS dy) dy
         |), build AS (
         |  SELECT s_suppkey, x AS sx, y AS sy,
         |         x // ${Cell} AS jx, y // ${Cell} AS jy
         |  FROM sup
         |), cand AS (
         |  SELECT p.c_custkey, b.s_suppkey,
         |         (p.cx - b.sx) * (p.cx - b.sx) +
         |         (p.cy - b.sy) * (p.cy - b.sy) AS d2
         |  FROM probe p JOIN build b ON b.jx = p.jx AND b.jy = p.jy
         |), rnk AS (
         |  SELECT c_custkey, s_suppkey, d2,
         |         row_number() OVER (PARTITION BY c_custkey
         |                            ORDER BY d2, s_suppkey) AS rnk
         |  FROM cand
         |)
         |SELECT c_custkey, rnk, s_suppkey, d2 FROM rnk WHERE rnk <= 3""".stripMargin,

    "q_geo_radius_pairs" ->
      s"""WITH c AS (
         |  SELECT c_mktsegment,
         |         (c_custkey * 48271 + 11) % ${World} AS x,
         |         (c_custkey * 69621 + 17) % ${World} AS y
         |  FROM customer
         |), sup AS (
         |  SELECT (s_suppkey * 40503 + 23) % ${World} AS x,
         |         (s_suppkey * 45989 + 29) % ${World} AS y
         |  FROM supplier
         |), probe AS (
         |  SELECT c.c_mktsegment, c.x AS cx, c.y AS cy,
         |         (c.x // ${Cell}) + dx.dx AS jx, (c.y // ${Cell}) + dy.dy AS jy
         |  FROM c
         |  CROSS JOIN (SELECT unnest([-1, 0, 1]) AS dx) dx
         |  CROSS JOIN (SELECT unnest([-1, 0, 1]) AS dy) dy
         |), build AS (
         |  SELECT x AS sx, y AS sy, x // ${Cell} AS jx, y // ${Cell} AS jy
         |  FROM sup
         |), pairs AS (
         |  SELECT p.c_mktsegment,
         |         (p.cx - b.sx) * (p.cx - b.sx) +
         |         (p.cy - b.sy) * (p.cy - b.sy) AS d2
         |  FROM probe p JOIN build b ON b.jx = p.jx AND b.jy = p.jy
         |)
         |SELECT c_mktsegment, count(*) AS n_pairs, min(d2) AS min_d2,
         |       CAST(sum(d2) AS BIGINT) AS sum_d2
         |FROM pairs WHERE d2 <= ${Radius * Radius} GROUP BY 1""".stripMargin,

    "q_geo_bbox" ->
      s"""WITH c AS (
         |  SELECT c_nationkey,
         |         (c_custkey * 48271 + 11) % ${World} AS x,
         |         (c_custkey * 69621 + 17) % ${World} AS y
         |  FROM customer
         |), m AS (
         |  SELECT c_nationkey, count(*) AS n,
         |         min(x) AS min_x, max(x) AS max_x,
         |         min(y) AS min_y, max(y) AS max_y,
         |         sum(x) AS sx, sum(y) AS sy,
         |         sum(x * x + y * y) AS sxy2
         |  FROM c GROUP BY 1
         |)
         |SELECT c_nationkey, n, min_x, max_x, min_y, max_y,
         |       round(CAST(sx AS DOUBLE) / n, 6) AS centroid_x,
         |       round(CAST(sy AS DOUBLE) / n, 6) AS centroid_y,
         |       CAST(n * sxy2 - sx * sx - sy * sy AS DOUBLE) /
         |             CAST(n * n AS DOUBLE) AS dispersion
         |FROM m""".stripMargin,

    "q_geo_morton" ->
      s"""WITH c AS (
         |  SELECT (c_custkey * 48271 + 11) % ${World} AS x,
         |         (c_custkey * 69621 + 17) % ${World} AS y
         |  FROM customer
         |), cells AS (
         |  SELECT x // 1024 AS gx, y // 1024 AS gy, count(*) AS n
         |  FROM c GROUP BY 1, 2
         |), z AS (
         |  SELECT n, CAST(list_sum(list_transform(range(0, 10), i ->
         |           (((gx >> i) & 1) << (2 * i)) +
         |           (((gy >> i) & 1) << (2 * i + 1)))) AS BIGINT) AS z
         |  FROM cells
         |)
         |SELECT z // 256 AS z_block, CAST(sum(n) AS BIGINT) AS n_points,
         |       count(*) AS n_cells, min(z) AS z_min, max(z) AS z_max
         |FROM z GROUP BY 1
         |ORDER BY n_points DESC, z_block ASC LIMIT 20""".stripMargin,

    "q_geo_hotspot" ->
      s"""WITH c AS (
         |  SELECT (c_custkey * 48271 + 11) % ${World} AS x,
         |         (c_custkey * 69621 + 17) % ${World} AS y
         |  FROM customer
         |), cells AS (
         |  SELECT x // ${FineCell} AS gx, y // ${FineCell} AS gy,
         |         count(*) AS n
         |  FROM c GROUP BY 1, 2
         |), neigh AS (
         |  SELECT cells.gx + dx.dx AS gx, cells.gy + dy.dy AS gy,
         |         sum(n) AS neigh_n
         |  FROM cells
         |  CROSS JOIN (SELECT unnest([-1, 0, 1]) AS dx) dx
         |  CROSS JOIN (SELECT unnest([-1, 0, 1]) AS dy) dy
         |  GROUP BY 1, 2
         |)
         |SELECT c.gx, c.gy, c.n, CAST(nb.neigh_n AS BIGINT) AS neigh_n,
         |       round(9.0 * c.n / nb.neigh_n, 6) AS score
         |FROM cells c JOIN neigh nb ON nb.gx = c.gx AND nb.gy = c.gy
         |ORDER BY score DESC, c.n DESC, c.gx ASC, c.gy ASC LIMIT 20""".stripMargin)
}
