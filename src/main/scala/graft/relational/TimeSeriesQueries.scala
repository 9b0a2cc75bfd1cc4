package graft.relational

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.{CacheScope, QueryPack, Tables}

/** Time-series depth over the `events` table: autocorrelation, robust
  * (Theil–Sen) trend, CUSUM changepoint, and a seasonal (hour-of-day)
  * profile. Complements the q_ts_ewma / q_ts_zscore / q_ohlc_bars /
  * q_gapfill_locf family in [[EventOpsQueries]].
  *
  * Determinism discipline (Det.scala's, taken one step further): every
  * series value is lifted to INTEGER CENTS (`value` is exact 2dp — see
  * Det's verification note), so all moment sums, running sums, and
  * cross-products are exact integer (DECIMAL) arithmetic, order-independent
  * and engine-identical; doubles appear only in final divisions/sqrt on
  * identical operands, rounded on output.
  *
  * Scale shape shared by all four: ONE events-sized aggregation collapses
  * the corpus to the bounded (|event_type| × |days|) daily relation (or
  * × 24 hourly); everything after — lag joins, all-pairs slopes, running
  * sums — runs on that bounded relation with event_type-partitioned
  * windows or equi-joins. At 100 TB the daily relation is still tiny
  * (types × calendar days), so none of the post-aggregation work grows
  * with the corpus.
  */
object TimeSeriesQueries extends QueryPack {

  private def t(s: SparkSession, d: String, n: String): DataFrame = Tables.load(s, d, n)

  /** Exact integer cents of the 2dp `value` column. */
  private def cents(c: Column): Column =
    (c.cast(DecimalType(12, 2)) * 100).cast("long")

  private val CentsSql = "CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT)"

  /** ACF lag range (days). */
  val AcfMaxLag = 7

  /** The shared per-(type, day) exact-cents daily series. */
  private[graft] def dailyOf(ev: DataFrame): DataFrame =
    ev.groupBy(col("event_type"),
        date_trunc("day", col("ts")).cast("date").as("day"))
      .agg(sum(cents(col("value"))).as("c"))

  private[graft] val DailySql =
    """SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
      |         sum(CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT)) AS c
      |  FROM events GROUP BY 1, 2""".stripMargin


  override val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Autocorrelation of the daily value series at calendar lags 1..7 —
    // the weekly-pattern detector a forecasting pipeline runs before
    // choosing a seasonal model. Pairs (x_t, x_{t-L}) come from an
    // EQUI-join of the daily relation with itself on (type, day - L):
    // calendar lags, so gap days simply contribute no pair (identically
    // in both engines). Pearson r per (type, lag) from exact integer
    // moments; numerators reach ~1e18 (past 2^53), so the final
    // decimal->double casts can differ by 1 ulp between engines —
    // round(,6) absorbs it (same accepted risk as Det.dstddev).
    "q_ts_acf" -> ((s, d) => {
      val daily = dailyOf(t(s, d, "events"))
        .transform(CacheScope.persisted(_))
      val lagged = daily.select(col("event_type"), col("day"), col("c"),
        explode(sequence(lit(1), lit(AcfMaxLag))).as("lag"))
      val prev = daily.select(col("event_type").as("pet"),
        col("day").as("pday"), col("c").as("pc"))
      // (14,0)/(28,0) downcasts keep every product within DECIMAL(38).
      val x = col("c").cast(DecimalType(14, 0))
      val y = col("pc").cast(DecimalType(14, 0))
      val m = lagged.join(prev,
          col("event_type") === col("pet") &&
            col("pday") === date_sub(col("day"), col("lag")))
        .select(col("event_type"), col("lag"), x.as("x"), y.as("y"))
        .groupBy("event_type", "lag")
        .agg(count(lit(1)).cast(DecimalType(6, 0)).as("n"),
          sum(col("x")).cast(DecimalType(14, 0)).as("sx"),
          sum(col("y")).cast(DecimalType(14, 0)).as("sy"),
          sum(col("x") * col("y")).cast(DecimalType(28, 0)).as("sxy"),
          sum(col("x") * col("x")).cast(DecimalType(28, 0)).as("sxx"),
          sum(col("y") * col("y")).cast(DecimalType(28, 0)).as("syy"))
      m.select(col("event_type"), col("lag"),
          col("n").cast("long").as("n_pairs"),
          round((col("n") * col("sxy") - col("sx") * col("sy")).cast("double") /
            (sqrt(greatest(lit(0.0),
              (col("n") * col("sxx") - col("sx") * col("sx")).cast("double"))) *
             sqrt(greatest(lit(0.0),
               (col("n") * col("syy") - col("sy") * col("sy")).cast("double")))),
            6).as("acf"))
        .filter(col("acf").isNotNull)
    }),

    // Theil–Sen robust trend per event_type: the median of all pairwise
    // slopes of the daily series — the outlier-resistant alternative to
    // least squares (one corrupted day moves OLS, not the median slope).
    // The all-pairs join runs over the BOUNDED daily relation (~types ×
    // days² pairs, calendar-bounded at any corpus size), keyed on
    // event_type — an equi-join, never a Cartesian. Slopes are exact-int
    // differences divided once (identical IEEE); the median interpolation
    // runs on round(,9)-pinned doubles in both engines.
    "q_ts_theilsen" -> ((s, d) => {
      val daily = dailyOf(t(s, d, "events"))
        .select(col("event_type"),
          datediff(col("day"), to_date(lit("1970-01-01"))).as("ti"),
          col("c"))
        .transform(CacheScope.persisted(_))
      val b = daily.select(col("event_type").as("et2"),
        col("ti").as("tj"), col("c").as("cj"))
      val slopes = daily.join(b,
          col("event_type") === col("et2") && col("tj") > col("ti"))
        .select(col("event_type"), col("ti"), col("c"),
          round((col("cj") - col("c")).cast("double") /
            ((col("tj") - col("ti")) * 100).cast("double"), 9).as("slope"))
      val sl = slopes.groupBy("event_type")
        .agg(count(lit(1)).as("n_pairs"),
          round(expr("percentile(slope, 0.5)"), 9).as("slope"))
      // Classic TS intercept: median over days of (y_i - slope * t_i),
      // one more pass over the bounded daily relation with the per-type
      // slope broadcast back in.
      daily.groupBy("event_type")
        .agg(count(lit(1)).as("n_days"))
        .join(sl, "event_type")
        .join(daily.join(broadcast(sl.select(col("event_type"), col("slope"))),
            "event_type")
          .groupBy(col("event_type"))
          .agg(round(expr(
            "percentile(round(c / 100.0e0 - slope * ti, 6), 0.5)"), 6)
            .as("intercept")), "event_type")
        .select(col("event_type"), col("n_days"), col("n_pairs"),
          col("slope"), col("intercept"))
    }),

    // Offline CUSUM changepoint (binary segmentation's first split): the
    // day k* maximizing |C_k - (k/n)·S| per type — where the series'
    // cumulative mass departs furthest from a constant rate. Kept exact:
    // D_k = n·C_k - k·S is integer DECIMAL, the argmax runs on (|D_k|,
    // earliest-day) via the max(struct) pattern (no second window), and
    // the single division to value units happens after extraction.
    // Running sum + row_number are event_type-partitioned windows over
    // the bounded daily relation.
    "q_ts_cusum" -> ((s, d) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("event_type").orderBy("day")
      val wr = w.rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
      val daily = dailyOf(t(s, d, "events"))
      val cum = daily.select(col("event_type"), col("day"),
        sum(col("c")).over(wr).as("ck"),
        row_number().over(w).as("k"))
      val tot = daily.groupBy("event_type")
        .agg(sum(col("c")).as("s"), count(lit(1)).as("n"))
      val dk = (col("n").cast(DecimalType(10, 0)) * col("ck").cast(DecimalType(20, 0)) -
        col("k").cast(DecimalType(10, 0)) * col("s").cast(DecimalType(20, 0)))
      cum.join(tot, "event_type")
        .select(col("event_type"), col("day"), col("n"),
          abs(dk).cast(DecimalType(31, 0)).as("absd"),
          datediff(col("day"), to_date(lit("1970-01-01"))).as("ti"))
        .groupBy(col("event_type"), col("n"))
        .agg(max(struct(col("absd"), (-col("ti")).as("negti"))).as("m"))
        .select(col("event_type"),
          date_add(to_date(lit("1970-01-01")), -col("m.negti")).as("change_day"),
          col("n").as("n_days"),
          round(col("m.absd").cast("double") /
            (col("n") * 100).cast("double"), 4).as("cusum_stat"))
    }),

    // Seasonal-naive forecast BACKTEST: on every day where both a
    // 1-day-back and a 7-day-back observation exist, score the two
    // classic zero-parameter forecasters (persistence "yesterday" vs
    // seasonal-naive "same weekday last week") by MAE and signed bias —
    // the honest baseline every real forecasting model must beat, and
    // the eval harness that proves it. Calendar equi-joins (gap days
    // drop out identically in both engines); error sums are exact cents;
    // the common eval set makes the two MAEs directly comparable.
    "q_ts_forecast_eval" -> ((s, d) => {
      val daily = dailyOf(t(s, d, "events"))
        .transform(CacheScope.persisted(_))
      def back(n: Int, as: String) = daily.select(
        col("event_type").as(s"et_$as"), col("day").as(s"day_$as"),
        col("c").as(as))
      daily
        .join(back(1, "c1"), col("event_type") === col("et_c1") &&
          col("day_c1") === date_sub(col("day"), 1))
        .join(back(7, "c7"), col("event_type") === col("et_c7") &&
          col("day_c7") === date_sub(col("day"), 7))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_eval"),
          sum(abs(col("c") - col("c1"))).as("ae1"),
          sum(abs(col("c") - col("c7"))).as("ae7"),
          sum(col("c") - col("c7")).as("be7"))
        .select(col("event_type"), col("n_eval"),
          round(col("ae1").cast("double") / (col("n_eval") * 100).cast("double"), 4)
            .as("mae_naive1"),
          round(col("ae7").cast("double") / (col("n_eval") * 100).cast("double"), 4)
            .as("mae_seasonal7"),
          round(col("be7").cast("double") / (col("n_eval") * 100).cast("double"), 4)
            .as("bias_seasonal7"))
    }),

    // Robust (MAD) anomaly scoring of the daily series: modified z-score
    // z = 0.6745·(x - median)/MAD (Iglewicz–Hoaglin) — the outlier score
    // q_ts_zscore's mean/sigma version CANNOT be, because one giant
    // spike inflates sigma and masks itself; the median/MAD pair is
    // immune. Every day ships with its score plus an is_anomaly flag at
    // |z| >= 2.5 (the textbook 3.5 never fires on CLT-smoothed daily
    // AGGREGATES — the gate is a sensitivity dial, and 2.5 is the one
    // that flags this data's real boundary-day artifacts). Two
    // exact-percentile aggregates over the bounded daily relation (state
    // bounded by distinct daily totals), broadcast back as scalars; the
    // only floats are the two interpolated medians and the final ratio,
    // identical in both engines, round(,6)-pinned.
    "q_ts_anomaly_mad" -> ((s, d) => {
      val daily = dailyOf(t(s, d, "events"))
        .transform(CacheScope.persisted(_))
      val med = daily.groupBy(col("event_type").as("et_m"))
        .agg(expr("percentile(c, 0.5)").as("med"))
      val mad = daily.join(med, col("event_type") === col("et_m"))
        .groupBy(col("event_type").as("et_d"))
        .agg(expr("percentile(abs(c - med), 0.5)").as("mad"))
      val z = round(lit(0.6745) * (col("c") - col("med")) / col("mad"), 6)
      daily.join(med, col("event_type") === col("et_m"))
        .join(mad, col("event_type") === col("et_d"))
        .filter(col("mad") > 0)
        .select(col("event_type"), col("day"),
          round(col("c").cast("double") / 100.0, 2).as("value"), z.as("z"),
          (abs(z) >= 2.5).as("is_anomaly"))
    }),

    // Hour-of-day seasonal profile: mean value per (type, hour) and its
    // index vs the type's overall mean — the shape a scheduler or
    // anomaly detector conditions on. Two exact-cents aggregations (the
    // hourly one events-sized, the per-type one 24-row), one equi-join.
    "q_ts_seasonality" -> ((s, d) => {
      val hourly = t(s, d, "events")
        .groupBy(col("event_type"), hour(col("ts")).as("hh"))
        .agg(sum(cents(col("value"))).as("hc"), count(lit(1)).as("hn"))
      val typ = hourly.groupBy("event_type")
        .agg(sum(col("hc")).as("tc"), sum(col("hn")).as("tn"))
      hourly.join(typ, "event_type")
        .select(col("event_type"), col("hh").as("hour"), col("hn").as("n"),
          round(col("hc").cast("double") / (col("hn") * 100).cast("double"), 4)
            .as("hourly_mean"),
          round((col("hc").cast("double") / (col("hn") * 100).cast("double")) /
            (col("tc").cast("double") / (col("tn") * 100).cast("double")), 6)
            .as("seasonal_index"))
    }),

    // Inter-arrival-time distribution: per event type, the quantiles and
    // mean of the gap since the SAME USER's previous event (any type) —
    // the pacing profile that sizes session gaps, throttle windows, and
    // streaming watermarks. Gaps are exact integer microseconds from a
    // user-partitioned lag window; the quantiles are the exact
    // interpolated percentile over those integers (state bounded by
    // DISTINCT gap values — the q_events_rfm caveat: at a cardinality
    // where exactness hurt, swap approx_percentile), converted to
    // seconds only on output.
    "q_ts_interarrival" -> ((s, d) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("user_id").orderBy(col("ts").asc, col("event_id").asc)
      val g = t(s, d, "events")
        .select(col("event_type"), col("user_id"), col("event_id"),
          unix_micros(col("ts")).as("us"), col("ts"))
        .withColumn("gap", col("us") - lag(col("us"), 1).over(w))
        .filter(col("gap").isNotNull)
      g.groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"),
          expr("percentile(gap, 0.5)").as("p50"),
          expr("percentile(gap, 0.95)").as("p95"),
          sum(col("gap")).as("sg"))
        .select(col("event_type"), col("n"),
          round(col("p50") / lit(1000000.0), 3).as("p50_s"),
          round(col("p95") / lit(1000000.0), 3).as("p95_s"),
          round(col("sg").cast("double") / col("n").cast("double") /
            lit(1000000.0), 3).as("mean_s"))
    }),

    // Holt's linear-trend (double exponential) smoothing of the daily
    // series: final level/trend, a 7-day-ahead forecast, and the
    // one-step MAE — the model q_ts_forecast_eval's naive baselines
    // exist to be beaten by. The recursion l_t = αy + (1-α)(l+b),
    // b_t = β(l_t - l) + (1-β)b is inherently sequential, so it runs as
    // an ORDERED ARRAY FOLD per key (collect day-sorted values, one
    // `aggregate` lambda): legal at any corpus scale because the folded
    // relation is the CALENDAR-BOUNDED daily series (types × days), not
    // the event stream — the same bounded-relation argument every
    // operator in this pack rests on. Constants are pre-folded
    // (0.7 = 1-α, 0.9 = 1-β) so both engines evaluate the identical
    // double expression tree; the fold order is pinned by array_sort on
    // (day, y), unique per day.
    "q_ts_holt" -> ((s, d) => {
      val daily = dailyOf(t(s, d, "events"))
      val series = daily
        .groupBy(col("event_type"))
        .agg(array_sort(collect_list(struct(col("day"),
          (col("c").cast("double") / lit(100.0)).as("y")))).as("ys"))
      series.select(col("event_type"), size(col("ys")).as("n_days"),
          expr(s"""aggregate(
            slice(ys, 2, size(ys) - 1),
            named_struct('l', ys[0].y, 'b', CAST(0.0 AS DOUBLE),
                         'e', CAST(0.0 AS DOUBLE)),
            (acc, s) -> named_struct(
              'l', $HoltAlpha * s.y + $HoltAlphaC * (acc.l + acc.b),
              'b', $HoltBeta * (($HoltAlpha * s.y + $HoltAlphaC * (acc.l + acc.b)) - acc.l) +
                   $HoltBetaC * acc.b,
              'e', acc.e + abs((acc.l + acc.b) - s.y)))""").as("st"))
        .select(col("event_type"), col("n_days"),
          round(col("st.l"), 6).as("level"),
          round(col("st.b"), 6).as("trend"),
          round(col("st.l") + lit(7.0) * col("st.b"), 6).as("forecast_7d"),
          when(col("n_days") > 1,
            round(col("st.e") / (col("n_days") - 1).cast("double"), 6))
            .otherwise(lit(0.0)).as("mae_1step"))
    }),

    // SAX symbolization (Lin/Keogh): z-normalize each type's daily
    // series, Piecewise-Aggregate-Approximate it into [[SaxSegments]]
    // equal-count segments, and map each segment mean to a 4-letter
    // alphabet at the Gaussian quartile breakpoints ±0.6745/0 — the
    // discretization that turns a series into a string so the TEXT
    // machinery (shingles, fingerprints, edit distance) can index shape.
    // Everything that shapes a letter is exact until one shared double
    // expression: per-type moments and per-segment sums are exact
    // DECIMAL; z = (segmean - μ)/σ is evaluated on identical operands in
    // both engines and round(,6)-pinned BEFORE the breakpoint compare,
    // so a 1-ulp wobble cannot flip a letter. Segment assignment uses
    // the type-partitioned row_number over the calendar-bounded daily
    // relation (same bounded-window argument as q_ts_cusum); degenerate
    // series (n < 2 or zero variance) are gated out on the exact ints.
    "q_ts_sax" -> ((s, d) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("event_type").orderBy("day")
      val daily = dailyOf(t(s, d, "events"))
        .transform(CacheScope.persisted(_))
      val x = col("c").cast(DecimalType(14, 0))
      val m = daily.groupBy(col("event_type").as("et_m"))
        .agg(count(lit(1)).cast(DecimalType(6, 0)).as("n"),
          sum(x).cast(DecimalType(16, 0)).as("sx"),
          sum(x * x).cast(DecimalType(30, 0)).as("sxx"))
        .filter(col("n") >= 2 && col("n") * col("sxx") - col("sx") * col("sx") > 0)
      val seg = daily
        .withColumn("k", row_number().over(w))
        .join(broadcast(m), col("event_type") === col("et_m"))
        .withColumn("seg",
          expr(s"CAST((k - 1) * $SaxSegments AS BIGINT) div CAST(n AS BIGINT)"))
        .groupBy(col("event_type"), col("seg"))
        .agg(sum(x).cast(DecimalType(16, 0)).as("ss"),
          count(lit(1)).cast(DecimalType(6, 0)).as("sn"),
          first(col("n")).as("n"), first(col("sx")).as("sx"),
          first(col("sxx")).as("sxx"))
      val mu = col("sx").cast("double") / col("n").cast("double")
      val sigma = sqrt((col("n") * col("sxx") - col("sx") * col("sx")).cast("double")) /
        col("n").cast("double")
      val z = round((col("ss").cast("double") / col("sn").cast("double") - mu) / sigma, 6)
      val letter = when(z < -0.6745, "a").when(z < 0.0, "b")
        .when(z < 0.6745, "c").otherwise("d")
      seg.select(col("event_type"), col("n").cast("long").as("n_days"),
          col("seg"), letter.as("letter"))
        .groupBy(col("event_type"))
        .agg(first(col("n_days")).as("n_days"),
          concat_ws("", transform(
            array_sort(collect_list(struct(col("seg"), col("letter")))),
            c => c.getField("letter"))).as("sax"))
    }),

    // Additive seasonal decomposition (classical STL-lite): per type,
    // trend = centered 7-day moving average of the daily series,
    // seasonal = mean detrended value per day-of-week, remainder = what's
    // left — the decomposition a forecasting pipeline inspects before
    // model choice (q_ts_seasonality profiles hours; this separates the
    // weekly cycle from trend at day grain). Trend requires a FULL
    // 7-day window (edge days drop, identically in both engines, via the
    // exact count). Day-of-week is the portable epoch formula
    // (day - 1970-01-01) mod 7 — neither engine's locale-dependent
    // dayofweek(). Determinism: the trend mean is one division of an
    // exact 7-day cents sum; detrended values are round(,6)-pinned
    // before the DECIMAL seasonal-mean fold, remainder is a difference
    // of pinned doubles. Type-partitioned windows over the
    // calendar-bounded daily relation, as everywhere in this pack.
    "q_ts_decompose" -> ((s, d) => decomposedOf(s, d)),

    // Anomaly scoring on the DESEASONALIZED remainder — the composition
    // q_ts_decompose exists to enable: q_ts_anomaly_mad's modified
    // z-score applied to the remainder series, so a legitimately busy
    // weekday can no longer mask (or fake) an anomaly the way it can on
    // the raw daily totals. Same median/MAD discipline (exact
    // interpolated percentiles over the round-pinned remainders,
    // identical double arithmetic, zero-MAD gated); the decomposition
    // relation is bounded, so everything after the shared events agg is
    // constant-size work.
    "q_ts_anomaly_deseason" -> ((s, d) => {
      val dec = decomposedOf(s, d).transform(CacheScope.persisted(_))
      val med = dec.groupBy(col("event_type").as("et_m"))
        .agg(expr("percentile(remainder, 0.5)").as("med"))
      val mad = dec.join(med, col("event_type") === col("et_m"))
        .groupBy(col("event_type").as("et_d"))
        .agg(expr("percentile(abs(remainder - med), 0.5)").as("mad"))
      val z = round(lit(0.6745) * (col("remainder") - col("med")) / col("mad"), 6)
      dec.join(med, col("event_type") === col("et_m"))
        .join(mad, col("event_type") === col("et_d"))
        .filter(col("mad") > 0)
        .select(col("event_type"), col("day"), col("value"),
          col("remainder"), z.as("z"), (abs(z) >= 2.5).as("is_anomaly"))
    }),

    // Largest-Triangle-Three-Buckets downsampling (Steinarsson 2013) —
    // the shape-preserving decimation every dashboard/monitoring stack
    // runs before plotting a long series: keep both endpoints and, per
    // equal-count interior bucket, the point forming the LARGEST
    // triangle with the previously selected point and the next bucket's
    // average. The greedy chain is sequential in the BUCKET dimension
    // only, so it runs as ONE ordered array fold over the per-type
    // bucket list (the q_ts_holt discipline — legal because the folded
    // relation is calendar-bounded). The first cut unrolled the rounds
    // as DataFrame joins and each round's selection fed BOTH the output
    // union and the next round — the two-reads-per-round 2^rounds
    // analysis blowup the graph pack's BFS rewrite documents; measured
    // 11.0s -> 0.5s from the fold. The triangle comparison is EXACT:
    // doubling the area and multiplying through by the next bucket's
    // count clears both the /2 and the average's denominator, so the
    // argmax runs on int64 cross products of day indices and cents — no
    // float can flip a selection — with k ASC breaking exact ties; the
    // oracle replays the same selection as unrolled window-argmax CTEs
    // (independent machinery, identical integers).
    "q_ts_lttb" -> ((s, d) => {
      val W = LttbBuckets
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("event_type").orderBy("day")
      val daily = dailyOf(t(s, d, "events"))
      val nRel = daily.groupBy(col("event_type").as("et_n"))
        .agg(count(lit(1)).as("n"))
      val pts = daily
        .withColumn("k", row_number().over(w))
        .join(broadcast(nRel), col("event_type") === col("et_n"))
        .filter(col("n") >= W + 2)
        .withColumn("x", datediff(col("day"), to_date(lit("1970-01-01"))).cast("long"))
        .withColumn("y", col("c"))
        .withColumn("b",
          when(col("k") === 1, lit(-1))
            .when(col("k") === col("n"), lit(W))
            .otherwise(expr(s"CAST(((k - 2) * $W) div (n - 2) AS INT)")))
        .select(col("event_type"), col("k"), col("x"), col("y"), col("b"))
        .transform(CacheScope.persisted(_))
      // per (type, bucket): day-sorted points + sums (each bucket's sums
      // become the PREVIOUS bucket's triangle target)
      val buckets = pts.filter(col("b").between(0, W - 1))
        .groupBy(col("event_type"), col("b"))
        .agg(array_sort(collect_list(struct(col("k"), col("x"), col("y")))).as("ps"),
          sum(col("x")).as("bsx"), sum(col("y")).as("bsy"), count(lit(1)).as("bm"))
      val nextT = buckets.select(col("event_type").as("nt"), (col("b") - 1).as("nb"),
        col("bsx").as("tsx0"), col("bsy").as("tsy0"), col("bm").as("tm0"))
      val ends = pts.filter(col("b") === -1 || col("b") === W)
        .groupBy(col("event_type"))
        .agg(min(struct(col("k"), col("x"), col("y"))).as("fp"),
          max(struct(col("k"), col("x"), col("y"))).as("lp"))
        .select(col("event_type").as("et_e"), col("fp"), col("lp"))
      val seqd = buckets
        .join(broadcast(nextT),
          col("event_type") === col("nt") && col("b") === col("nb"), "left")
        .join(broadcast(ends), col("event_type") === col("et_e"))
        // the last interior bucket targets the final point itself
        .select(col("event_type"), col("fp"), col("lp"),
          struct(col("b"), col("ps"),
            coalesce(col("tsx0"), col("lp.x")).as("tsx"),
            coalesce(col("tsy0"), col("lp.y")).as("tsy"),
            coalesce(col("tm0"), lit(1L)).as("tm")).as("bu"))
        .groupBy(col("event_type"), col("fp"), col("lp"))
        .agg(array_sort(collect_list(col("bu"))).as("bs"))
      val a2 = "abs((acc.ax * bu.tm - bu.tsx) * (p.y - acc.ay) - " +
        "(acc.ax - p.x) * (bu.tsy - acc.ay * bu.tm))"
      val folded = seqd.withColumn("sels", expr(
        s"""aggregate(bs,
           |  named_struct('ax', fp.x, 'ay', fp.y,
           |    'sels', array(named_struct('bucket', -1, 'k', fp.k, 'x', fp.x, 'y', fp.y))),
           |  (acc, bu) -> element_at(transform(
           |    array(aggregate(bu.ps,
           |      named_struct('a2', CAST(-1 AS BIGINT), 'k', 0, 'x', CAST(0 AS BIGINT), 'y', CAST(0 AS BIGINT)),
           |      (ba, p) -> CASE WHEN $a2 > ba.a2 THEN
           |                   named_struct('a2', $a2, 'k', p.k, 'x', p.x, 'y', p.y)
           |                 ELSE ba END)),
           |    best -> named_struct('ax', best.x, 'ay', best.y,
           |      'sels', concat(acc.sels, array(named_struct(
           |        'bucket', bu.b, 'k', best.k, 'x', best.x, 'y', best.y))))), 1),
           |  acc -> concat(acc.sels, array(named_struct(
           |    'bucket', $W, 'k', lp.k, 'x', lp.x, 'y', lp.y))))""".stripMargin))
      folded.select(col("event_type"), explode(col("sels")).as("s"))
        .select(col("event_type"), col("s.bucket").as("bucket"),
          col("s.k").cast("long").as("k"),
          date_add(to_date(lit("1970-01-01")), col("s.x").cast("int")).as("day"),
          round(col("s.y").cast("double") / 100.0, 2).as("value"))
    }),

    // Lagged cross-correlation between every PAIR of event types' daily
    // series at lags -3..+3 — the lead/lag detector ("do errors foreshadow
    // purchases dropping two days later?") a monitoring pipeline runs
    // across its signal matrix. Pairs come from an equi-join of the daily
    // relation with itself on the lag-shifted calendar day (gap days drop
    // identically in both engines; type_a < type_b deduplicates the
    // matrix); Pearson r per (pair, lag) follows q_ts_acf's exact-moment
    // discipline, with the same documented round(,6) 1-ulp absorption on
    // the final ratio. Bounded post-agg work at any corpus size: |types|²
    // × lags × days.
    "q_ts_crosscorr" -> ((s, d) => {
      val daily = dailyOf(t(s, d, "events"))
        .transform(CacheScope.persisted(_))
      val lagged = daily.select(col("event_type"), col("day"), col("c"),
        explode(sequence(lit(-XcorrMaxLag), lit(XcorrMaxLag))).as("lag"))
      val b = daily.select(col("event_type").as("bt"),
        col("day").as("bday"), col("c").as("bc"))
      val x = col("c").cast(DecimalType(14, 0))
      val y = col("bc").cast(DecimalType(14, 0))
      val m = lagged.join(b,
          col("event_type") < col("bt") &&
            col("bday") === date_add(col("day"), col("lag")))
        .select(col("event_type").as("type_a"), col("bt").as("type_b"),
          col("lag"), x.as("x"), y.as("y"))
        .groupBy("type_a", "type_b", "lag")
        .agg(count(lit(1)).cast(DecimalType(6, 0)).as("n"),
          sum(col("x")).cast(DecimalType(14, 0)).as("sx"),
          sum(col("y")).cast(DecimalType(14, 0)).as("sy"),
          sum(col("x") * col("y")).cast(DecimalType(28, 0)).as("sxy"),
          sum(col("x") * col("x")).cast(DecimalType(28, 0)).as("sxx"),
          sum(col("y") * col("y")).cast(DecimalType(28, 0)).as("syy"))
      m.select(col("type_a"), col("type_b"), col("lag"),
          col("n").cast("long").as("n_pairs"),
          round((col("n") * col("sxy") - col("sx") * col("sy")).cast("double") /
            (sqrt(greatest(lit(0.0),
              (col("n") * col("sxx") - col("sx") * col("sx")).cast("double"))) *
             sqrt(greatest(lit(0.0),
               (col("n") * col("syy") - col("sy") * col("sy")).cast("double")))),
            6).as("xcorr"))
        .filter(col("xcorr").isNotNull)
    }))

  /** Holt smoothing dials, with the complements pre-folded so both
    * engines see literal constants (never 1-α evaluated at runtime).
    */
  val HoltAlpha = "0.3"
  val HoltAlphaC = "0.7"
  val HoltBeta = "0.1"
  val HoltBetaC = "0.9"

  /** SAX word length (PAA segments). */
  val SaxSegments = 8

  /** LTTB interior bucket count (plus the always-kept endpoints). */
  val LttbBuckets = 10

  /** Cross-correlation lag range (days, symmetric). */
  val XcorrMaxLag = 3

  /** The q_ts_decompose relation (see its registration comment) — shared
    * with q_ts_anomaly_deseason, which scores the remainder column.
    */
  private def decomposedOf(s: SparkSession, d: String): DataFrame = {
    val W = org.apache.spark.sql.expressions.Window
      .partitionBy("event_type").orderBy("day").rowsBetween(-3, 3)
    val daily = dailyOf(t(s, d, "events"))
    val tr = daily
      .withColumn("s7", sum(col("c")).over(W))
      .withColumn("n7", count(lit(1)).over(W))
      .filter(col("n7") === 7)
      .withColumn("trend", round(col("s7").cast("double") / 700.0, 6))
      .withColumn("detr",
        round(col("c").cast("double") / 100.0 - col("trend"), 6))
      .withColumn("dow",
        pmod(datediff(col("day"), to_date(lit("1970-01-01"))), lit(7)))
      .transform(CacheScope.persisted(_))
    val seas = tr.groupBy(col("event_type").as("et_s"), col("dow").as("dow_s"))
      .agg((sum(col("detr").cast(DecimalType(18, 6))).cast("double") /
        count(lit(1)).cast("double")).as("seas_raw"))
      .select(col("et_s"), col("dow_s"), round(col("seas_raw"), 6).as("seasonal"))
    tr.join(seas, col("event_type") === col("et_s") && col("dow") === col("dow_s"))
      .select(col("event_type"), col("day"),
        round(col("c").cast("double") / 100.0, 2).as("value"),
        col("trend"), col("seasonal"),
        round(col("detr") - col("seasonal"), 6).as("remainder"))
  }

  /** One unrolled LTTB round for the oracle: select bucket i's max-area
    * point against prev p{i} and the round's target, define p{i+1}.
    */
  private def lttbRoundCte(i: Int): String = {
    val W = LttbBuckets
    val tgt =
      if (i < W - 1) s"SELECT event_type, sx, sy, m FROM bavg WHERE b = ${i + 1}"
      else s"SELECT event_type, x AS sx, y AS sy, 1 AS m FROM ptb WHERE b = $W"
    s"""sel$i AS (
       |  SELECT event_type, $i AS bucket, k, x, y FROM (
       |    SELECT c.event_type, c.k, c.x, c.y,
       |           row_number() OVER (PARTITION BY c.event_type
       |             ORDER BY abs((p.ax * t.m - t.sx) * (c.y - p.ay) -
       |                          (p.ax - c.x) * (t.sy - p.ay * t.m)) DESC,
       |                      c.k ASC) AS rn
       |    FROM ptb c
       |    JOIN p$i p ON p.event_type = c.event_type
       |    JOIN ($tgt) t ON t.event_type = c.event_type
       |    WHERE c.b = $i
       |  ) WHERE rn = 1
       |), p${i + 1} AS (SELECT event_type, x AS ax, y AS ay FROM sel$i)"""
      .stripMargin
  }

  /** Shared decompose CTE chain ending in `dec` (the q_ts_decompose
    * relation) — consumed by both its oracle and the deseasonalized
    * anomaly oracle.
    */
  private lazy val DecomposeCtes: String =
    s"""WITH daily AS ($DailySql),
       |tr AS (
       |  SELECT event_type, day, c,
       |         sum(c) OVER w7 AS s7, count(*) OVER w7 AS n7
       |  FROM daily
       |  WINDOW w7 AS (PARTITION BY event_type ORDER BY day
       |                ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)
       |), dt AS (
       |  SELECT event_type, day, c,
       |         round(CAST(s7 AS DOUBLE) / 700.0, 6) AS trend,
       |         round(CAST(c AS DOUBLE) / 100.0 -
       |               round(CAST(s7 AS DOUBLE) / 700.0, 6), 6) AS detr,
       |         CAST(day - DATE '1970-01-01' AS BIGINT) % 7 AS dow
       |  FROM tr WHERE n7 = 7
       |), seas AS (
       |  SELECT event_type AS et_s, dow AS dow_s,
       |         round(CAST(sum(CAST(detr AS DECIMAL(18,6))) AS DOUBLE) /
       |               CAST(count(*) AS DOUBLE), 6) AS seasonal
       |  FROM dt GROUP BY 1, 2
       |), dec AS (
       |  SELECT d.event_type, d.day,
       |         round(CAST(d.c AS DOUBLE) / 100.0, 2) AS value,
       |         d.trend, s.seasonal,
       |         round(d.detr - s.seasonal, 6) AS remainder
       |  FROM dt d JOIN seas s ON s.et_s = d.event_type AND s.dow_s = d.dow
       |)""".stripMargin

  override val oracles: Map[String, String] = Map(

    "q_ts_lttb" -> {
      val W = LttbBuckets
      s"""WITH daily AS ($DailySql),
         |nrel AS (SELECT event_type AS et_n, count(*) AS n FROM daily GROUP BY 1),
         |pts AS (
         |  SELECT d.event_type,
         |         row_number() OVER (PARTITION BY d.event_type ORDER BY d.day) AS k,
         |         CAST(d.day - DATE '1970-01-01' AS BIGINT) AS x,
         |         d.c AS y, r.n
         |  FROM daily d JOIN nrel r ON r.et_n = d.event_type
         |  WHERE r.n >= ${W + 2}
         |), ptb AS (
         |  SELECT event_type, k, x, y,
         |         CASE WHEN k = 1 THEN -1 WHEN k = n THEN $W
         |              ELSE CAST(((k - 2) * $W) // (n - 2) AS INT) END AS b
         |  FROM pts
         |), bavg AS (
         |  SELECT event_type, b, sum(x) AS sx, sum(y) AS sy, count(*) AS m
         |  FROM ptb WHERE b BETWEEN 0 AND ${W - 1} GROUP BY 1, 2
         |), p0 AS (SELECT event_type, x AS ax, y AS ay FROM ptb WHERE b = -1),
         |${(0 until W).map(lttbRoundCte).mkString(",\n")}
         |SELECT event_type, bucket, CAST(k AS BIGINT) AS k,
         |       DATE '1970-01-01' + CAST(x AS INTEGER) AS day,
         |       round(CAST(y AS DOUBLE) / 100.0, 2) AS value
         |FROM (
         |  SELECT event_type, b AS bucket, k, x, y FROM ptb WHERE b IN (-1, $W)
         |  ${(0 until W).map(i => s"UNION ALL SELECT event_type, bucket, k, x, y FROM sel$i").mkString("\n  ")}
         |)""".stripMargin
    },

    "q_ts_acf" ->
      s"""WITH daily AS ($DailySql),
         |lagged AS (
         |  SELECT event_type, day, c,
         |         CAST(unnest(generate_series(1, $AcfMaxLag)) AS INTEGER) AS lag
         |  FROM daily
         |), m AS (
         |  SELECT a.event_type, a.lag,
         |         CAST(count(*) AS DECIMAL(6,0)) AS n,
         |         CAST(sum(CAST(a.c AS DECIMAL(14,0))) AS DECIMAL(14,0)) AS sx,
         |         CAST(sum(CAST(b.c AS DECIMAL(14,0))) AS DECIMAL(14,0)) AS sy,
         |         CAST(sum(CAST(a.c AS DECIMAL(14,0)) * CAST(b.c AS DECIMAL(14,0))) AS DECIMAL(28,0)) AS sxy,
         |         CAST(sum(CAST(a.c AS DECIMAL(14,0)) * CAST(a.c AS DECIMAL(14,0))) AS DECIMAL(28,0)) AS sxx,
         |         CAST(sum(CAST(b.c AS DECIMAL(14,0)) * CAST(b.c AS DECIMAL(14,0))) AS DECIMAL(28,0)) AS syy
         |  FROM lagged a JOIN daily b
         |    ON b.event_type = a.event_type AND b.day = a.day - a.lag
         |  GROUP BY 1, 2
         |)
         |SELECT * FROM (
         |  SELECT event_type, lag, CAST(n AS BIGINT) AS n_pairs,
         |         round(CAST(n * sxy - sx * sy AS DOUBLE) /
         |               (sqrt(greatest(0.0, CAST(n * sxx - sx * sx AS DOUBLE))) *
         |                sqrt(greatest(0.0, CAST(n * syy - sy * sy AS DOUBLE)))),
         |               6) AS acf
         |  FROM m
         |) WHERE acf IS NOT NULL""".stripMargin,

    "q_ts_theilsen" ->
      s"""WITH daily AS (
         |  SELECT event_type, CAST(day - DATE '1970-01-01' AS INTEGER) AS ti, c
         |  FROM ($DailySql)
         |), slopes AS (
         |  SELECT a.event_type,
         |         round(CAST(b.c - a.c AS DOUBLE) /
         |               CAST((b.ti - a.ti) * 100 AS DOUBLE), 9) AS slope
         |  FROM daily a JOIN daily b
         |    ON b.event_type = a.event_type AND b.ti > a.ti
         |), sl AS (
         |  SELECT event_type, count(*) AS n_pairs,
         |         round(quantile_cont(slope, 0.5), 9) AS slope
         |  FROM slopes GROUP BY 1
         |), ic AS (
         |  SELECT d.event_type,
         |         round(quantile_cont(
         |           round(d.c / 100.0 - sl.slope * d.ti, 6), 0.5), 6) AS intercept
         |  FROM daily d JOIN sl ON sl.event_type = d.event_type
         |  GROUP BY 1
         |)
         |SELECT d.event_type, count(*) AS n_days,
         |       any_value(sl.n_pairs) AS n_pairs,
         |       any_value(sl.slope) AS slope,
         |       any_value(ic.intercept) AS intercept
         |FROM daily d
         |JOIN sl ON sl.event_type = d.event_type
         |JOIN ic ON ic.event_type = d.event_type
         |GROUP BY 1""".stripMargin,

    "q_ts_cusum" ->
      s"""WITH daily AS ($DailySql),
         |cum AS (
         |  SELECT event_type, day,
         |         sum(c) OVER (PARTITION BY event_type ORDER BY day
         |                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ck,
         |         row_number() OVER (PARTITION BY event_type ORDER BY day) AS k
         |  FROM daily
         |), tot AS (
         |  SELECT event_type, sum(c) AS s, count(*) AS n FROM daily GROUP BY 1
         |)
         |SELECT event_type, day AS change_day, n AS n_days,
         |       round(CAST(absd AS DOUBLE) / CAST(n * 100 AS DOUBLE), 4) AS cusum_stat
         |FROM (
         |  SELECT c.event_type, c.day, t.n,
         |         abs(CAST(t.n AS DECIMAL(10,0)) * CAST(c.ck AS DECIMAL(20,0)) -
         |             CAST(c.k AS DECIMAL(10,0)) * CAST(t.s AS DECIMAL(20,0))) AS absd,
         |         row_number() OVER (PARTITION BY c.event_type
         |                            ORDER BY abs(CAST(t.n AS DECIMAL(10,0)) * CAST(c.ck AS DECIMAL(20,0)) -
         |                                         CAST(c.k AS DECIMAL(10,0)) * CAST(t.s AS DECIMAL(20,0))) DESC,
         |                                     c.day ASC) AS rn
         |  FROM cum c JOIN tot t ON t.event_type = c.event_type
         |) WHERE rn = 1""".stripMargin,

    "q_ts_forecast_eval" ->
      s"""WITH daily AS ($DailySql)
         |SELECT a.event_type, count(*) AS n_eval,
         |       round(CAST(sum(abs(a.c - b1.c)) AS DOUBLE) /
         |             CAST(count(*) * 100 AS DOUBLE), 4) AS mae_naive1,
         |       round(CAST(sum(abs(a.c - b7.c)) AS DOUBLE) /
         |             CAST(count(*) * 100 AS DOUBLE), 4) AS mae_seasonal7,
         |       round(CAST(sum(a.c - b7.c) AS DOUBLE) /
         |             CAST(count(*) * 100 AS DOUBLE), 4) AS bias_seasonal7
         |FROM daily a
         |JOIN daily b1 ON b1.event_type = a.event_type AND b1.day = a.day - 1
         |JOIN daily b7 ON b7.event_type = a.event_type AND b7.day = a.day - 7
         |GROUP BY 1""".stripMargin,

    "q_ts_anomaly_mad" ->
      s"""WITH daily AS ($DailySql),
         |med AS (
         |  SELECT event_type, quantile_cont(c, 0.5) AS med FROM daily GROUP BY 1
         |), mad AS (
         |  SELECT d.event_type, quantile_cont(abs(d.c - m.med), 0.5) AS mad
         |  FROM daily d JOIN med m ON m.event_type = d.event_type
         |  GROUP BY 1
         |)
         |SELECT event_type, day, value, z, abs(z) >= 2.5 AS is_anomaly
         |FROM (
         |  SELECT d.event_type, d.day,
         |         round(CAST(d.c AS DOUBLE) / 100.0, 2) AS value,
         |         round(0.6745 * (d.c - m.med) / a.mad, 6) AS z
         |  FROM daily d
         |  JOIN med m ON m.event_type = d.event_type
         |  JOIN mad a ON a.event_type = d.event_type
         |  WHERE a.mad > 0
         |)""".stripMargin,

    "q_ts_seasonality" ->
      s"""WITH hourly AS (
         |  SELECT event_type, hour(ts) AS hour,
         |         sum($CentsSql) AS hc, count(*) AS hn
         |  FROM events GROUP BY 1, 2
         |), typ AS (
         |  SELECT event_type, sum(hc) AS tc, sum(hn) AS tn FROM hourly GROUP BY 1
         |)
         |SELECT h.event_type, h.hour, h.hn AS n,
         |       round(CAST(h.hc AS DOUBLE) / CAST(h.hn * 100 AS DOUBLE), 4) AS hourly_mean,
         |       round((CAST(h.hc AS DOUBLE) / CAST(h.hn * 100 AS DOUBLE)) /
         |             (CAST(t.tc AS DOUBLE) / CAST(t.tn * 100 AS DOUBLE)), 6) AS seasonal_index
         |FROM hourly h JOIN typ t ON t.event_type = h.event_type""".stripMargin,

    "q_ts_interarrival" ->
      """WITH g AS (
        |  SELECT event_type,
        |         epoch_us(ts) - lag(epoch_us(ts)) OVER (
        |           PARTITION BY user_id ORDER BY ts ASC, event_id ASC) AS gap
        |  FROM events
        |)
        |SELECT event_type, count(*) AS n,
        |       round(quantile_cont(gap, 0.5) / 1000000.0, 3) AS p50_s,
        |       round(quantile_cont(gap, 0.95) / 1000000.0, 3) AS p95_s,
        |       round(CAST(sum(gap) AS DOUBLE) / CAST(count(*) AS DOUBLE) /
        |             1000000.0, 3) AS mean_s
        |FROM g WHERE gap IS NOT NULL
        |GROUP BY event_type""".stripMargin,

    // Recursive-CTE formulation of the same fold: one row per (type,
    // step), joined forward on the day index — deliberately different
    // machinery (recursion vs array fold), identical double expression
    // tree.
    "q_ts_holt" ->
      s"""WITH RECURSIVE daily AS ($DailySql),
         |idx AS (
         |  SELECT event_type, c,
         |         row_number() OVER (PARTITION BY event_type ORDER BY day ASC) AS i
         |  FROM daily
         |), nn AS (
         |  SELECT event_type, CAST(max(i) AS INTEGER) AS n FROM idx GROUP BY 1
         |), rec(event_type, i, l, b, e) AS (
         |  SELECT event_type, 1, CAST(c AS DOUBLE) / 100.0,
         |         CAST(0.0 AS DOUBLE), CAST(0.0 AS DOUBLE)
         |  FROM idx WHERE i = 1
         |  UNION ALL
         |  SELECT r.event_type, r.i + 1,
         |         $HoltAlpha * (CAST(x.c AS DOUBLE) / 100.0) + $HoltAlphaC * (r.l + r.b),
         |         $HoltBeta * (($HoltAlpha * (CAST(x.c AS DOUBLE) / 100.0) +
         |                       $HoltAlphaC * (r.l + r.b)) - r.l) + $HoltBetaC * r.b,
         |         r.e + abs((r.l + r.b) - CAST(x.c AS DOUBLE) / 100.0)
         |  FROM rec r JOIN idx x ON x.event_type = r.event_type AND x.i = r.i + 1
         |)
         |SELECT r.event_type, CAST(n.n AS INTEGER) AS n_days,
         |       round(r.l, 6) AS level, round(r.b, 6) AS trend,
         |       round(r.l + 7.0 * r.b, 6) AS forecast_7d,
         |       CASE WHEN n.n > 1
         |            THEN round(r.e / CAST(n.n - 1 AS DOUBLE), 6)
         |            ELSE 0.0 END AS mae_1step
         |FROM rec r JOIN nn n ON n.event_type = r.event_type AND r.i = n.n""".stripMargin,

    "q_ts_sax" ->
      s"""WITH daily AS ($DailySql),
         |m AS (
         |  SELECT event_type AS et_m,
         |         CAST(count(*) AS DECIMAL(6,0)) AS n,
         |         CAST(sum(CAST(c AS DECIMAL(14,0))) AS DECIMAL(16,0)) AS sx,
         |         CAST(sum(CAST(c AS DECIMAL(14,0)) * CAST(c AS DECIMAL(14,0))) AS DECIMAL(30,0)) AS sxx
         |  FROM daily GROUP BY 1
         |  HAVING count(*) >= 2 AND
         |         CAST(count(*) AS DECIMAL(6,0)) * CAST(sum(CAST(c AS DECIMAL(14,0)) * CAST(c AS DECIMAL(14,0))) AS DECIMAL(30,0)) -
         |         CAST(sum(CAST(c AS DECIMAL(14,0))) AS DECIMAL(16,0)) * CAST(sum(CAST(c AS DECIMAL(14,0))) AS DECIMAL(16,0)) > 0
         |), idx AS (
         |  SELECT event_type, c,
         |         row_number() OVER (PARTITION BY event_type ORDER BY day) AS k
         |  FROM daily
         |), seg AS (
         |  SELECT i.event_type,
         |         CAST((i.k - 1) * $SaxSegments AS BIGINT) // CAST(m.n AS BIGINT) AS seg,
         |         CAST(sum(CAST(i.c AS DECIMAL(14,0))) AS DECIMAL(16,0)) AS ss,
         |         CAST(count(*) AS DECIMAL(6,0)) AS sn,
         |         any_value(m.n) AS n, any_value(m.sx) AS sx, any_value(m.sxx) AS sxx
         |  FROM idx i JOIN m ON m.et_m = i.event_type
         |  GROUP BY 1, 2
         |), lett AS (
         |  SELECT event_type, seg, CAST(n AS BIGINT) AS n_days,
         |         CASE WHEN z < -0.6745 THEN 'a' WHEN z < 0.0 THEN 'b'
         |              WHEN z < 0.6745 THEN 'c' ELSE 'd' END AS letter
         |  FROM (
         |    SELECT event_type, seg, n,
         |           round((CAST(ss AS DOUBLE) / CAST(sn AS DOUBLE) -
         |                  CAST(sx AS DOUBLE) / CAST(n AS DOUBLE)) /
         |                 (sqrt(CAST(n * sxx - sx * sx AS DOUBLE)) / CAST(n AS DOUBLE)),
         |                 6) AS z
         |    FROM seg
         |  )
         |)
         |SELECT event_type, any_value(n_days) AS n_days,
         |       string_agg(letter, '' ORDER BY seg) AS sax
         |FROM lett GROUP BY event_type""".stripMargin,

    "q_ts_decompose" ->
      s"""$DecomposeCtes
         |SELECT event_type, day, value, trend, seasonal, remainder
         |FROM dec""".stripMargin,

    "q_ts_anomaly_deseason" ->
      s"""$DecomposeCtes,
         |med AS (
         |  SELECT event_type AS et_m, quantile_cont(remainder, 0.5) AS med
         |  FROM dec GROUP BY 1
         |), mad AS (
         |  SELECT d.event_type AS et_d,
         |         quantile_cont(abs(d.remainder - m.med), 0.5) AS mad
         |  FROM dec d JOIN med m ON m.et_m = d.event_type
         |  GROUP BY 1
         |)
         |SELECT event_type, day, value, remainder, z, abs(z) >= 2.5 AS is_anomaly
         |FROM (
         |  SELECT d.event_type, d.day, d.value, d.remainder,
         |         round(0.6745 * (d.remainder - m.med) / a.mad, 6) AS z
         |  FROM dec d
         |  JOIN med m ON m.et_m = d.event_type
         |  JOIN mad a ON a.et_d = d.event_type
         |  WHERE a.mad > 0
         |)""".stripMargin,

    "q_ts_crosscorr" ->
      s"""WITH daily AS ($DailySql),
         |lagged AS (
         |  SELECT event_type, day, c,
         |         CAST(unnest(generate_series(-$XcorrMaxLag, $XcorrMaxLag)) AS INTEGER) AS lag
         |  FROM daily
         |), m AS (
         |  SELECT a.event_type AS type_a, b.event_type AS type_b, a.lag,
         |         CAST(count(*) AS DECIMAL(6,0)) AS n,
         |         CAST(sum(CAST(a.c AS DECIMAL(14,0))) AS DECIMAL(14,0)) AS sx,
         |         CAST(sum(CAST(b.c AS DECIMAL(14,0))) AS DECIMAL(14,0)) AS sy,
         |         CAST(sum(CAST(a.c AS DECIMAL(14,0)) * CAST(b.c AS DECIMAL(14,0))) AS DECIMAL(28,0)) AS sxy,
         |         CAST(sum(CAST(a.c AS DECIMAL(14,0)) * CAST(a.c AS DECIMAL(14,0))) AS DECIMAL(28,0)) AS sxx,
         |         CAST(sum(CAST(b.c AS DECIMAL(14,0)) * CAST(b.c AS DECIMAL(14,0))) AS DECIMAL(28,0)) AS syy
         |  FROM lagged a JOIN daily b
         |    ON a.event_type < b.event_type AND b.day = a.day + a.lag
         |  GROUP BY 1, 2, 3
         |)
         |SELECT * FROM (
         |  SELECT type_a, type_b, lag, CAST(n AS BIGINT) AS n_pairs,
         |         round(CAST(n * sxy - sx * sy AS DOUBLE) /
         |               (sqrt(greatest(0.0, CAST(n * sxx - sx * sx AS DOUBLE))) *
         |                sqrt(greatest(0.0, CAST(n * syy - sy * sy AS DOUBLE)))),
         |               6) AS xcorr
         |  FROM m
         |) WHERE xcorr IS NOT NULL""".stripMargin)
}
