package graft

import graft.relational.{ModelPrepQueries, ProfilingQueries}
import graft.text.CorpusOpsQueries

/** Invariants for the schema-drift, gradient-clip, and mixture-epochs
  * operators added in round 12.
  */
class PipelineOpsSpec extends SparkSpec {

  test("schema drift audits every configured column with consistent counts") {
    val rows = ProfilingQueries.queries("q_dq_schema_drift")(spark, sfDir)
      .collect()
    assert(rows.map(_.getString(0)).sorted.toSeq ==
      ProfilingQueries.DriftCols.sorted)
    rows.foreach { r =>
      val nf = r.getLong(r.fieldIndex("n_first"))
      val ns = r.getLong(r.fieldIndex("n_second"))
      assert(nf > 0 && ns > 0)
      assert(r.getLong(r.fieldIndex("distinct_first")) <= nf)
      assert(r.getLong(r.fieldIndex("distinct_new")) <=
        r.getLong(r.fieldIndex("distinct_second")))
      // new values imply a raised flag
      if (r.getLong(r.fieldIndex("distinct_new")) > 0)
        assert(r.getBoolean(r.fieldIndex("drift_flag")))
    }
    // the halves partition the table: equal n across all column rows
    assert(rows.map(r => (r.getLong(1), r.getLong(2))).distinct.length == 1)
  }

  test("grad clip fractions and scales are internally consistent") {
    val r = ModelPrepQueries.queries("q_ml_grad_clip")(spark, sfDir)
      .collect()(0)
    val n = r.getLong(r.fieldIndex("n_vectors"))
    val nc = r.getLong(r.fieldIndex("n_clipped"))
    val frac = r.getDouble(r.fieldIndex("clip_frac"))
    val scale = r.getDouble(r.fieldIndex("mean_scale"))
    assert(n > 0 && nc >= 0 && nc <= n)
    assert(math.abs(frac - nc.toDouble / n) < 1e-5)
    // scaling never amplifies; equals 1 only when nothing clipped
    assert(scale <= 1.0 + 1e-9)
    if (nc > 0) assert(scale < 1.0)
    assert(r.getDouble(r.fieldIndex("mean_norm")) > 0.0)
  }

  test("quality outliers discriminate at sf0.01 and rates are consistent") {
    val rows = graft.text.PipelineFilterQueries
      .queries("text_quality_outliers")(spark, "/root/testdata/sf0.01")
      .collect()
    CacheScope.releaseAll()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val n = r.getLong(r.fieldIndex("n_docs"))
      val o = r.getLong(r.fieldIndex("n_outliers"))
      assert(o >= 0 && o <= n)
      assert(math.abs(r.getDouble(r.fieldIndex("outlier_rate")) -
        o.toDouble / n) < 1e-5)
      val mq = r.getDouble(r.fieldIndex("mean_quality"))
      assert(mq > 0.0 && mq < 1.0)
    }
    // the z gate sits in the discriminating regime: some source flags,
    // no source flags a majority
    assert(rows.exists(_.getLong(2) > 0), "no outliers anywhere — gate dead")
    assert(rows.forall(r => r.getLong(2) * 2 < r.getLong(1)),
      "a source flags most of its docs — gate too loose")
  }

  test("bass diffusion fit recovers a plausible market size at sf0.01") {
    // sf0.001's 15-user series is degenerate (c >= 0) and the gates
    // correctly release nothing there; fit on the 150-user series.
    val dir = "/root/testdata/sf0.01"
    val rows = graft.relational.GrowthQueries
      .queries("q_events_bass")(spark, dir).collect()
    assert(rows.length == 1)
    val r = rows(0)
    val users = Tables.load(spark, dir, "events")
      .select("user_id").distinct().count()
    val m = r.getDouble(r.fieldIndex("m_hat"))
    val p = r.getDouble(r.fieldIndex("p_hat"))
    val q = r.getDouble(r.fieldIndex("q_hat"))
    // the fitted ceiling brackets the true adopter population
    assert(m > 0.5 * users && m < 2.0 * users, s"m_hat=$m users=$users")
    assert(p > 0.0 && q >= 0.0, s"p=$p q=$q")
    // driver-side OLS replica of the linearization on the same series
    val ev = Tables.load(spark, dir, "events")
    val sess = spark
    import sess.implicits._
    val firstDays = ev.groupBy($"user_id")
      .agg(org.apache.spark.sql.functions.min(
        org.apache.spark.sql.functions.date_trunc("day", $"ts").cast("date"))
        .as("fd"))
      .select($"fd".cast("string")).as[String].collect().sorted
    val d0 = firstDays.min
    val byDay = firstDays.groupBy(identity).view.mapValues(_.length).toMap
    val allDays = ev.select(
      org.apache.spark.sql.functions.date_trunc("day", $"ts").cast("date")
        .cast("string")).as[String].collect().distinct.sorted
    val fmt = java.time.format.DateTimeFormatter.ISO_LOCAL_DATE
    def idx(s: String) = java.time.temporal.ChronoUnit.DAYS.between(
      java.time.LocalDate.parse(d0, fmt), java.time.LocalDate.parse(s, fmt)).toInt
    val maxT = allDays.map(idx).max
    val n = Array.tabulate(maxT + 1)(t =>
      byDay.collect { case (dstr, c) if idx(dstr) == t => c }.sum.toDouble)
    val c = n.scanLeft(0.0)(_ + _).dropRight(1)
    val x = c; val x2 = c.map(v => v * v); val y = n
    val nn = y.length.toDouble
    def s(a: Array[Double]) = a.sum
    def sp(a: Array[Double], b: Array[Double]) =
      a.zip(b).map { case (u, v) => u * v }.sum
    val (s1, s2v, s3, s4v) = (s(x), s(x2), sp(x, x2), sp(x2, x2))
    val (sy, sxy, sx2y) = (s(y), sp(x, y), sp(x2, y))
    def det3(m: Array[Array[Double]]) =
      m(0)(0) * (m(1)(1) * m(2)(2) - m(1)(2) * m(2)(1)) -
        m(0)(1) * (m(1)(0) * m(2)(2) - m(1)(2) * m(2)(0)) +
        m(0)(2) * (m(1)(0) * m(2)(1) - m(1)(1) * m(2)(0))
    val dM = det3(Array(Array(nn, s1, s2v), Array(s1, s2v, s3), Array(s2v, s3, s4v)))
    val aHat = det3(Array(Array(sy, s1, s2v), Array(sxy, s2v, s3), Array(sx2y, s3, s4v))) / dM
    val bHat = det3(Array(Array(nn, sy, s2v), Array(s1, sxy, s3), Array(s2v, sx2y, s4v))) / dM
    val cHat = det3(Array(Array(nn, s1, sy), Array(s1, s2v, sxy), Array(s2v, s3, sx2y))) / dM
    assert(math.abs(r.getDouble(r.fieldIndex("a")) - aHat) < 1e-4, s"a=$aHat")
    assert(math.abs(r.getDouble(r.fieldIndex("b")) - bHat) < 1e-4, s"b=$bHat")
    assert(math.abs(r.getDouble(r.fieldIndex("c")) - cHat) < 1e-6, s"c=$cHat")
  }

  test("mixture weights sum to one and epochs honor the budget") {
    val rows = CorpusOpsQueries.queries("text_mixture_epochs")(spark, sfDir)
      .collect()
    assert(rows.nonEmpty)
    val wsum = rows.map(_.getDouble(3)).sum
    assert(math.abs(wsum - 1.0) < 1e-3, s"weights sum to $wsum")
    // allocated tokens across sources == budget (mult x corpus)
    val total = rows.map(_.getLong(2)).sum.toDouble
    val alloc = rows.map(r => r.getDouble(4) * r.getLong(2)).sum
    assert(math.abs(alloc / total - CorpusOpsQueries.MixBudgetMult) < 1e-3)
    rows.foreach { r =>
      assert(r.getBoolean(5) == (r.getDouble(4) > 1.0))
    }
  }
}
