package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.text.PorterStemmer.stem

/** Golden vectors from M.F. Porter's 1980 paper (the worked examples in the
  * step definitions) plus boundary cases. The reference gets this algorithm
  * from opennlp PorterStemmer (DocumentFreq.java:69, IDF.java:92).
  */
class PorterStemmerSpec extends AnyFunSuite {

  private val vectors = Seq(
    // step 1a
    "caresses" -> "caress", "ponies" -> "poni", "ties" -> "ti",
    "caress" -> "caress", "cats" -> "cat",
    // step 1b
    "feed" -> "feed", "agreed" -> "agre", "plastered" -> "plaster",
    "bled" -> "bled", "motoring" -> "motor", "sing" -> "sing",
    "conflated" -> "conflat", "troubled" -> "troubl", "sized" -> "size",
    "hopping" -> "hop", "tanned" -> "tan", "falling" -> "fall",
    "hissing" -> "hiss", "fizzed" -> "fizz", "failing" -> "fail",
    "filing" -> "file",
    // step 1c
    "happy" -> "happi", "sky" -> "sky",
    // step 2
    "relational" -> "relat", "conditional" -> "condit", "rational" -> "ration",
    "valenci" -> "valenc", "hesitanci" -> "hesit", "digitizer" -> "digit",
    // NB: the paper's step-2 tables show intermediate forms (differentli ->
    // different); the FULL algorithm continues into step 4 (-> differ).
    "radicalli" -> "radic", "differentli" -> "differ", "vileli" -> "vile",
    "analogousli" -> "analog", "vietnamization" -> "vietnam",
    "predication" -> "predic", "operator" -> "oper", "feudalism" -> "feudal",
    "decisiveness" -> "decis", "hopefulness" -> "hope",
    "callousness" -> "callous", "formaliti" -> "formal",
    "sensitiviti" -> "sensit", "sensibiliti" -> "sensibl",
    // step 3
    "triplicate" -> "triplic", "formative" -> "form", "formalize" -> "formal",
    "electriciti" -> "electr", "electrical" -> "electr", "hopeful" -> "hope",
    "goodness" -> "good",
    // step 4
    "revival" -> "reviv", "allowance" -> "allow", "inference" -> "infer",
    "airliner" -> "airlin", "gyroscopic" -> "gyroscop",
    "adjustable" -> "adjust", "defensible" -> "defens", "irritant" -> "irrit",
    "replacement" -> "replac", "adjustment" -> "adjust",
    "dependent" -> "depend", "adoption" -> "adopt", "communism" -> "commun",
    "activate" -> "activ", "angulariti" -> "angular",
    "homologous" -> "homolog", "effective" -> "effect",
    "bowdlerize" -> "bowdler",
    // step 5
    "probate" -> "probat", "rate" -> "rate", "cease" -> "ceas",
    "controll" -> "control", "roll" -> "roll")

  test("golden vectors (Porter 1980 worked examples)") {
    val bad = vectors.collect {
      case (in, want) if stem(in) != want => s"$in -> ${stem(in)} (want $want)"
    }
    assert(bad.isEmpty, s"\n${bad.mkString("\n")}")
  }

  test("short words pass through unchanged") {
    for (w <- Seq("", "a", "is", "be", "by"))
      assert(stem(w) == w)
  }

  test("idempotent on common english sample") {
    val words = Seq("running", "flies", "realization", "happily", "mapreduce",
      "documents", "frequencies", "engineering", "analytics", "scoring")
    for (w <- words) {
      val once = stem(w)
      assert(stem(once) == once, s"stem not idempotent for $w -> $once")
    }
  }

  test("null-safe") {
    assert(stem(null) == null)
  }
}
