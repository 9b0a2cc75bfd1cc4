package graft.pos

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Tokenization + part-of-speech tagging for the POS/POSstripes parity
  * queries (POS.java:33-41, POSstripes.java:30-49).
  *
  * The reference tags with a pre-trained OpenNLP maxent model whose file is
  * hardcoded to the author's laptop (POS.java:23) and is unavailable offline,
  * so — per SURVEY.md §7's decision — the tagger is PLUGGABLE and the default
  * is a deterministic rule-based UD-style tagger. The rules live in ONE
  * table below, from which the Scala function, the Catalyst Column
  * expression, and the DuckDB oracle SQL are all generated, so the three can
  * never diverge.
  *
  * Tokenization follows OpenNLP SimpleTokenizer's character-class principle
  * (split at letter/digit/other class changes, drop whitespace), expressed as
  * a single regex so it is identical in Spark and DuckDB:
  * letters-run | digits-run | other-run.
  */
/** Pluggable tagging surface (SURVEY.md §7's decision for the offline-
  * unavailable OpenNLP model): implementations must be Serializable so
  * executors can construct them; heavyweight models should be loaded
  * lazily per partition (see PosQueries' mapPartitions head).
  */
trait Tagger extends Serializable {
  def tag(token: String): String

  /** Tag a whole line's tokens. Context-free taggers map per token; a
    * model-backed tagger overrides this to tag with sentence context
    * (the reference's `tagger.tag(words)`, POS.java:38).
    */
  def tagLine(tokens: Array[String]): Array[String] = tokens.map(tag)
}

/** Default deterministic rule-based tagger. */
object RuleTagger extends Tagger {
  override def tag(token: String): String = PosTagger.tag(token)
}

/** OpenNLP-maxent-backed tagger — POS.java:23-25 parity. The reference
  * hardcodes a laptop path to `en-pos-maxent.bin` and loads it in
  * `Mapper.setup`; here the model path is configurable and loaded models
  * are cached JVM-WIDE keyed by path ([[OpenNlpTagger.loaded]]), so each
  * executor JVM initializes a model once no matter how many task closures
  * deserialize their own `OpenNlpTagger` instance (a plain
  * `@transient lazy val` is per-instance, i.e. once per task — the r2
  * ADVICE finding; the reference's per-Mapper setup has the same cost,
  * but there's no reason to keep it). The instance ships as just the
  * path string.
  *
  * `opennlp-tools` is NOT a build dependency (offline environment, pinned
  * deps): the OpenNLP classes are resolved reflectively from the runtime
  * classpath, so this compiles and ships without the jar and works when a
  * deployment adds `opennlp-tools` + a model file. The spec skips itself
  * when either is absent.
  */
final class OpenNlpTagger(modelPath: String) extends Tagger {

  @transient private lazy val tagTokens: Array[String] => Array[String] =
    OpenNlpTagger.forPath(modelPath)

  override def tag(token: String): String = tagLine(Array(token)).head

  /** Whole-line tagging with model context — exactly POS.java:38. */
  override def tagLine(tokens: Array[String]): Array[String] =
    if (tokens.isEmpty) tokens else tagTokens(tokens)
}

object OpenNlpTagger {

  /** JVM-wide model cache: one loaded POSTaggerME per model path per
    * executor, shared by every task closure.
    */
  private val loaded =
    new java.util.concurrent.ConcurrentHashMap[String, Array[String] => Array[String]]()

  private def forPath(modelPath: String): Array[String] => Array[String] =
    loaded.computeIfAbsent(modelPath, path => {
      val cl = Thread.currentThread.getContextClassLoader
      val modelCls = cl.loadClass("opennlp.tools.postag.POSModel")
      val taggerCls = cl.loadClass("opennlp.tools.postag.POSTaggerME")
      val in = new java.io.BufferedInputStream(
        new java.io.FileInputStream(path))
      val model =
        try modelCls.getConstructor(classOf[java.io.InputStream]).newInstance(in)
        finally in.close()
      val tagger = taggerCls.getConstructor(modelCls).newInstance(model)
      val tagM = taggerCls.getMethod("tag", classOf[Array[String]])
      // POSTaggerME.tag is NOT thread-safe; synchronize on the shared
      // instance (tasks in one executor JVM share it now)
      toks => tagger.synchronized {
        tagM.invoke(tagger, toks).asInstanceOf[Array[String]]
      }
    })
}

object PosTagger {

  /** Character-class tokenizer regex (Java + RE2 compatible). */
  val TokenPattern = "[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]+"

  /** Closed-class word lists, checked in order, on the lowercased token. */
  val WordClasses: Seq[(String, Seq[String])] = Seq(
    "PRON" -> Seq("i", "you", "he", "she", "it", "we", "they", "me", "him",
      "her", "us", "them", "his", "its", "their", "my", "your", "our"),
    "DET" -> Seq("a", "an", "the", "this", "that", "these", "those"),
    "ADP" -> Seq("in", "on", "at", "by", "for", "with", "from", "to", "of",
      "over", "under", "into", "about", "between"),
    "CCONJ" -> Seq("and", "or", "but", "nor", "so", "yet"),
    "SCONJ" -> Seq("if", "because", "while", "although", "when", "since"),
    "AUX" -> Seq("is", "am", "are", "was", "were", "be", "been", "being",
      "have", "has", "had", "do", "does", "did", "will", "would", "can",
      "could", "shall", "should", "may", "might", "must"))

  /** Suffix rules, checked in order after the word lists. A match requires
    * a stem of at least 2 chars ("fly" is not an adverb).
    */
  val SuffixClasses: Seq[(String, Seq[String])] = Seq(
    "ADV" -> Seq("ly"),
    "VERB" -> Seq("ing", "ed", "ize", "ise"),
    "ADJ" -> Seq("ous", "ful", "ive", "able", "ible", "ical", "less"))

  val Default = "NOUN"

  /** Plain-Scala tagger (used by the mapPartitions/stripes path). */
  def tag(token: String): String = {
    if (token.isEmpty) return Default
    if (token.forall(c => c >= '0' && c <= '9')) return "NUM"
    // ASCII letter check, matching the Column/SQL '[a-zA-Z]' semantics.
    if (!token.exists(c => (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z')))
      return "PUNCT"
    val lc = token.toLowerCase(java.util.Locale.ROOT)
    WordClasses.foreach { case (t, ws) => if (ws.contains(lc)) return t }
    SuffixClasses.foreach { case (t, sufs) =>
      if (sufs.exists(sf => lc.length > sf.length + 1 && lc.endsWith(sf))) return t
    }
    Default
  }

  /** Same rules as a Catalyst CASE expression (codegen'd, for the pairs
    * path — no UDF in the hot loop).
    */
  def tagColumn(tok: Column): Column = {
    val lc = lower(tok)
    // Build the CASE chain in rule order. The leading empty-token arm
    // mirrors tag()'s guard — unreachable via TokenPattern, but all three
    // variants are public API and must stay rule-for-rule identical.
    var c: Column = when(tok === lit(""), Default)
      .when(tok.rlike("^[0-9]+$"), "NUM")
      .when(!tok.rlike("[a-zA-Z]"), "PUNCT")
    WordClasses.foreach { case (t, ws) => c = c.when(lc.isin(ws: _*), t) }
    SuffixClasses.foreach { case (t, sufs) =>
      val cond = sufs.map(sf =>
        lc.endsWith(sf) && length(lc) > sf.length + 1).reduce(_ || _)
      c = c.when(cond, t)
    }
    c.otherwise(Default)
  }

  /** Same rules as DuckDB SQL over a token expression. */
  def tagSql(tok: String): String = {
    val sb = new StringBuilder
    sb.append(s"CASE WHEN $tok = '' THEN '$Default'\n")
    sb.append(s"  WHEN regexp_full_match($tok, '[0-9]+') THEN 'NUM'\n")
    sb.append(s"  WHEN NOT regexp_matches($tok, '[a-zA-Z]') THEN 'PUNCT'\n")
    val lc = s"lower($tok)"
    WordClasses.foreach { case (t, ws) =>
      sb.append(s"  WHEN $lc IN (${ws.map(w => s"'$w'").mkString(", ")}) THEN '$t'\n")
    }
    SuffixClasses.foreach { case (t, sufs) =>
      val cond = sufs.map(sf =>
        s"(ends_with($lc, '$sf') AND length($lc) > ${sf.length + 1})").mkString(" OR ")
      sb.append(s"  WHEN $cond THEN '$t'\n")
    }
    sb.append(s"  ELSE '$Default' END")
    sb.toString
  }

  /** Scala-side tokenizer mirroring TokenPattern (for mapPartitions). */
  private val tokenRegex = TokenPattern.r
  def tokenize(line: String): Iterator[String] =
    if (line == null) Iterator.empty else tokenRegex.findAllIn(line)
}
