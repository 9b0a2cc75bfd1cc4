package graft

import graft.pos.{OpenNlpTagger, PosQueries, RuleTagger}

/** Exercises the OpenNLP-backed Tagger. The opennlp-tools jar and a
  * `en-pos-maxent.bin` model are NOT available in this offline
  * environment, so the model-dependent tests self-skip (`assume`) unless
  * `GRAFT_OPENNLP_MODEL` points at a model file AND the OpenNLP classes
  * resolve; what always runs is the wiring: the tagger constructs,
  * serializes into the stripes pipeline, and fails lazily (not at plan
  * time) exactly like a missing model would on a cluster.
  */
class OpenNlpTaggerSpec extends SparkSpec {

  private val modelPath = sys.env.get("GRAFT_OPENNLP_MODEL")
  private def opennlpOnClasspath: Boolean =
    try { Class.forName("opennlp.tools.postag.POSTaggerME"); true }
    catch { case _: ClassNotFoundException => false }

  test("OpenNlpTagger wires into stripesWith without touching the model " +
    "at plan time (lazy per-executor load)") {
    // Construction + plan building must not open the model: the load is
    // deferred to the first tagged partition, the Mapper.setup parity.
    val tagger = new OpenNlpTagger("/nonexistent/en-pos-maxent.bin")
    val df = PosQueries.stripesWith(spark, sfDir, tagger)
    assert(df.columns.toSeq == Seq("tag", "cnt"))
  }

  test("default tagLine is per-token (RuleTagger context-free)") {
    val toks = Array("the", "quick", "dogs", "99")
    assert(RuleTagger.tagLine(toks).toSeq == toks.map(RuleTagger.tag).toSeq)
  }

  test("model-backed tagging matches stripes schema (needs opennlp + model)") {
    assume(modelPath.exists(p => new java.io.File(p).isFile),
      "GRAFT_OPENNLP_MODEL not set or not a file — skipping")
    assume(opennlpOnClasspath, "opennlp-tools not on classpath — skipping")
    val out = PosQueries.stripesWith(spark, sfDir, new OpenNlpTagger(modelPath.get))
      .collect()
    assert(out.nonEmpty && out.forall(_.getLong(1) > 0))
  }
}
