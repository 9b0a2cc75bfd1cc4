package graft

import org.apache.spark.sql.SparkSession

/** Dumps the formatted physical plans of the flagship queries to stdout
  * (redirect to PLANS.md): the evidence that the engine produces the
  * intended plan shapes — broadcast joins, partial aggregation,
  * TakeOrderedAndProject, pushdown, codegen spans.
  *
  *   sbt -batch "runMain graft.Plans" 2>/dev/null \
  *     | sed 's/^\[info\] \{0,1\}//' | sed -n '/^# Physical/,$p' \
  *     | grep -v '^\[success\]' > PLANS.md
  */
object Plans {
  val Flagship = Seq(
    "tfidf_score" -> "full TF-IDF: one token scan, broadcast semi-join, partial/final agg",
    "q_join_3way" -> "fact-dim joins: pruned scans + broadcast hash joins",
    "q1_agg" -> "wide aggregation with exact decimal sums",
    "sim_knn_bruteforce" -> "brute-force cosine top-k: codegen dot product + WindowGroupLimit",
    "dedup_minhash_lsh" -> "MinHash LSH: banding self-join + candidate-restricted verify",
    "q_range_join" -> "interval-banded range join (equi keys, no cross product)",
    "stream_tumbling" -> "event-time tumbling window aggregation",
    "dedup_simhash_pairs" -> "block-collision LSH: 4-probe explode + self-equi-join",
    "q_join_salted_skew" -> "salted skew join: salt-spread fact + replicated dim",
    "sim_ann_ivf" -> "IVF ANN: centroid train aggs + broadcast assign + cell equi-join",
    "q_sql_tpch_q5" -> "6-way SQL join: Catalyst join ordering, broadcast dims",
    "text_clean_pipeline" -> "C4-style clean: one barriered scoring pass + dedup semi-join",
    "dedup_edit_distance" -> "blocked short-doc Levenshtein: pushed n_chars gate + blocking-key equi-join",
    "tfidf_bm25_raw" -> "BM25: pinned TF relation feeds df/dl/score; corpus stats broadcast, no collect",
    "text_unigram_logprob" -> "unigram LM: vocab agg + stats broadcast + map-side partial DECIMAL sum")

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    println("# Physical plans of flagship queries (sf0.01, local[4])")
    println()
    println("Note: `treeString` re-prints a shared `InMemoryRelation`'s child plan")
    println("under EVERY `InMemoryTableScan` that reads it, so a persisted relation's")
    println("`FileScan` can appear several times in the dump while executing once.")
    println("PlanSpec asserts the single-scan property programmatically (one distinct")
    println("cached plan, one FileScan inside it) for `tfidf_score`.")
    println()
    Flagship.foreach { case (name, note) =>
      println(s"## $name -- $note\n")
      println("```")
      println(SparkEntry.queries(name)(spark, "/root/testdata/sf0.01")
        .queryExecution.executedPlan.treeString)
      println("```")
      println()
    }
    spark.stop()
  }
}
