package graft

import org.apache.spark.sql.functions._

import graft.text.{PorterStemmer, Tokenize}

/** Guards the stem-map side table the stemmed TF-IDF oracles join
  * (SURVEY.md §5.2): if the driver ever regenerates testdata with new
  * vocabulary, or the stemmer changes, the oracle's identity fallback
  * could mask a divergence — this spec fails loudly instead, with the
  * regeneration command.
  */
class StemMapSpec extends SparkSpec {

  private lazy val stemMap: Map[String, String] =
    scala.io.Source.fromFile("src/test/resources/stemmap.tsv")
      .getLines().drop(1)
      .map { l => val Array(a, b) = l.split("\t", -1); a -> b }.toMap

  Seq("sf0.001", "sf0.01", "sf0.1").foreach { sf =>
    test(s"stem map covers the full $sf vocabulary with current stems") {
      val vocab = Tables.load(spark, s"/root/testdata/$sf", "documents")
        .select(Tokenize.explodeTokens(col("text")).as("t"))
        .filter(col("t") =!= "").distinct()
        .collect().map(_.getString(0))
      assert(vocab.nonEmpty)
      vocab.foreach { t =>
        assert(stemMap.contains(t),
          s"term '$t' missing from stemmap.tsv — rerun: sbt 'runMain graft.GenStemMap'")
        assert(stemMap(t) == PorterStemmer.stem(t),
          s"stale stem for '$t' — rerun: sbt 'runMain graft.GenStemMap'")
      }
    }
  }
}
