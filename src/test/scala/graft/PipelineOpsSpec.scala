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
