package graft

import org.apache.spark.sql.functions._

import graft.text.CorpusOpsQueries

/** text_budget_select's contract, checked against a sequential replay on
  * real testdata: the selection must be exactly the greedy prefix of the
  * (quality desc, doc_id asc) order, with the running token total the
  * distributed prefix sum claims.
  */
class BudgetSelectSpec extends SparkSpec {

  test("selection is the greedy quality-desc prefix with exact token accounting") {
    val budget = 3000L
    val out =
      try CorpusOpsQueries.budgetSelect(
        Tables.load(spark, sfDir, "documents"), budget)
        .select(col("doc_id"), col("quality_score"), col("n_tokens"),
          col("cum_before"), col("selected"))
        .collect()
        .map(r => (r.getLong(0), r.getDouble(1), r.getLong(2), r.getLong(3),
          r.getBoolean(4)))
      finally CacheScope.releaseAll()
    assert(out.nonEmpty)
    assert(out.map(_._1).distinct.length == out.length, "each doc once")
    // sequential replay in selection order: (micro-score desc, doc_id asc)
    val ordered = out.sortBy { case (id, q, _, _, _) =>
      (-math.round(q * 1e6), id)
    }
    var cum = 0L
    ordered.foreach { case (id, _, n, cumBefore, selected) =>
      assert(cumBefore == cum, s"doc $id: cum_before $cumBefore != replay $cum")
      assert(selected == (cum < budget),
        s"doc $id: selected=$selected at cum=$cum (budget $budget)")
      cum += n
    }
    // the budget boundary is interior: some selected, some not
    assert(ordered.exists(_._5) && ordered.exists(!_._5),
      "budget must cut the corpus interior for the test to mean anything")
    // selected set is a PREFIX of the order
    val flags = ordered.map(_._5)
    assert(!flags.zip(flags.tail).exists { case (a, b) => !a && b },
      "selection is not a prefix of the quality-desc order")
  }

  test("an empty document scores a finite quality, never NaN") {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
    val dd = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        Row(1L, "a real document with some text in it"),
        Row(2L, ""))),
      StructType(Seq(StructField("doc_id", LongType),
        StructField("text", StringType))))
    val out =
      try CorpusOpsQueries.budgetSelect(dd, 10L).collect()
        .map(r => r.getLong(0) -> r.getDouble(1)).toMap
      finally CacheScope.releaseAll()
    assert(out.size == 2)
    out.foreach { case (id, q) =>
      assert(!q.isNaN && q >= 0.0 && q <= 1.0, s"doc $id quality=$q")
    }
  }
}
