package graft
import org.apache.spark.sql.SparkSession
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = "/root/testdata/sf0.1"
    for (name <- Seq("dedup_minhash", "dedup_minhash_lsh", "dedup_ngram_jaccard",
        "dedup_embedding_cosine", "dedup_simhash_pairs", "dedup_simhash",
        "sim_knn_bruteforce", "sim_ann_lsh")) {
      val t0 = System.nanoTime()
      val n = SparkEntry.queries(name)(spark, d).count()
      println(f"[scratch] $name%-28s rows=$n%-8d ${(System.nanoTime()-t0)/1e9}%.2f s")
    }
    spark.stop()
  }
}
