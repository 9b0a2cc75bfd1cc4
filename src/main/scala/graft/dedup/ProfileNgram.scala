package graft.dedup

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Dev profiler for the dedup_ngram_jaccard stages (ProfileLsh's sibling):
  * materializes each sub-relation of the blocked-Jaccard pipeline in
  * isolation so a bench-level drift can be attributed to a stage. Written
  * to attribute the r3->r5 1.56->2.84s drift; keep for future perf rounds.
  */
object ProfileNgram {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def timed[T](what: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[ngram] $what%-24s ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    (1 to 4).foreach { round =>
      println(s"--- round $round")
      val dd = Tables.load(spark, sfDir, "documents")
      // Stage 1: the shingle relation (tokenize + md5 + explode + distinct).
      val sh = graft.CacheScope.persisted(Shingles.docShingles(dd))
      timed("shingles.count")(sh.count())
      // Stage 2: the blocked self-join (quadratic per block by design).
      val keyed = dd.select(col("doc_id"), col("lang"), col("source"),
        floor(col("n_chars") / 64).as("len_bucket"))
      val pairs = graft.CacheScope.persisted(keyed.as("a")
        .join(keyed.as("b"),
          col("a.lang") === col("b.lang") && col("a.source") === col("b.source") &&
            col("a.len_bucket") === col("b.len_bucket") &&
            col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b")))
      timed("pairs.count")(pairs.count())
      // Stage 3: the shingle-intersection join + agg over the pinned inputs.
      val inter = pairs
        .join(sh.as("sa"), col("doc_a") === col("sa.doc_id"))
        .join(sh.as("sb"),
          col("doc_b") === col("sb.doc_id") && col("sa.h") === col("sb.h"))
        .groupBy("doc_a", "doc_b").agg(count(lit(1)).as("inter"))
      timed("inter.count")(inter.count())
      graft.CacheScope.releaseAll()
      // End-to-end, exactly as benched (fresh lineage, own persists).
      def e2e(): DataFrame = DedupQueries.queries("dedup_ngram_jaccard")(spark, sfDir)
      timed("e2e.count")(e2e().count())
      graft.CacheScope.releaseAll()
    }
    spark.stop()
  }
}
