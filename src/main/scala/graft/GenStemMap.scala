package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths}

import graft.text.{PorterStemmer, Tokenize}

/** Dev harness: regenerate the precomputed stem-map side table that lets the
  * DuckDB oracle reproduce Porter stemming (SURVEY.md §5.2 — DuckDB 1.0.0
  * offline has no fts `stem()`). Emits every distinct token of every testdata
  * SF with its Porter stem as TSV; the stemmed `tfidf_*` oracles `read_csv`
  * it and LEFT JOIN (COALESCE to identity — covered terms whose stem equals
  * the term are indistinguishable from fallback, and any UNcovered term whose
  * stem differs fails the hash compare, which is exactly the signal we want).
  *
  *   sbt "runMain graft.GenStemMap"
  */
object GenStemMap {
  val DefaultOut = "/root/repo/src/test/resources/stemmap.tsv"

  def main(args: Array[String]): Unit = {
    val out = if (args.nonEmpty) args(0) else DefaultOut
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val vocab = Seq("sf0.001", "sf0.01", "sf0.1")
      .map(sf => Tables.load(spark, s"/root/testdata/$sf", "documents")
        .select(Tokenize.explodeTokens(col("text")).as("t"))
        .filter(col("t") =!= ""))
      .reduce(_ union _)
      .distinct()
      .collect().map(_.getString(0)).sorted
    val lines = "term_raw\tterm_stem" +:
      vocab.map(t => s"$t\t${PorterStemmer.stem(t)}")
    Files.writeString(Paths.get(out), lines.mkString("\n") + "\n")
    println(s"[stemmap] wrote ${vocab.length} terms to $out")
    spark.stop()
  }
}
