package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.pos.PosTagger

/** Pins `PosTagger.TokenPattern` against OpenNLP SimpleTokenizer semantics
  * (the reference's tokenizer, POS.java:35).
  *
  * `simpleTokenize` below is a clean-room implementation of the PUBLISHED
  * SimpleTokenizer behavior: a token breaks where the character class
  * (letter / digit / whitespace / other) changes, and an "other"-class run
  * ADDITIONALLY breaks when the character itself changes ("?!" is two
  * tokens, "!!" is one). ASCII classes only — the engine pipeline is
  * ASCII-scoped (Tokenize.CleanPattern), so the Unicode-isLetter
  * difference is unobservable upstream.
  *
  * TokenPattern cannot express the repeated-char rule: it needs a
  * backreference (`([^..])\1*`), which RE2 — the DuckDB twin's regex
  * engine — does not support, and the 3-way Spark/Scala/SQL parity of the
  * POS pipeline is the stronger property. The ONE divergence class —
  * mixed-character punctuation runs — is pinned here and documented in
  * FIXTURES.md.
  */
class SimpleTokenizerParitySpec extends AnyFunSuite {

  /** Clean-room SimpleTokenizer (see scaladoc above). */
  private def simpleTokenize(s: String): Seq[String] = {
    sealed trait C
    case object Ws extends C; case object Alpha extends C
    case object Num extends C; case object Other extends C
    def cls(c: Char): C =
      if (c.isWhitespace) Ws
      else if (c >= 'a' && c <= 'z' || c >= 'A' && c <= 'Z') Alpha
      else if (c >= '0' && c <= '9') Num
      else Other
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var state: C = Ws
    var start = -1
    var pc: Char = 0
    s.zipWithIndex.foreach { case (c, i) =>
      val t = cls(c)
      if (state == Ws) { if (t != Ws) start = i }
      else if (t != state || (t == Other && c != pc)) {
        out += s.substring(start, i)
        start = i
      }
      if (t == Ws) start = -1
      state = t
      pc = c
    }
    if (state != Ws && start >= 0) out += s.substring(start)
    out.toSeq
  }

  private def ours(s: String): Seq[String] = PosTagger.tokenize(s).toSeq

  /** Vectors where TokenPattern agrees with SimpleTokenizer exactly. */
  val agree: Seq[(String, Seq[String])] = Seq(
    "hello world" -> Seq("hello", "world"),
    "don't" -> Seq("don", "'", "t"),
    "U.S.A." -> Seq("U", ".", "S", ".", "A", "."),
    "x86-64" -> Seq("x", "86", "-", "64"),
    "it's fine" -> Seq("it", "'", "s", "fine"),
    "3.14" -> Seq("3", ".", "14"),
    "a1b2" -> Seq("a", "1", "b", "2"),
    "co-operate" -> Seq("co", "-", "operate"),
    "end." -> Seq("end", "."),
    "(bracketed)" -> Seq("(", "bracketed", ")"),
    "!!" -> Seq("!!"),
    "..." -> Seq("..."),
    "wait..." -> Seq("wait", "..."),
    "$100" -> Seq("$", "100"),
    "50%" -> Seq("50", "%"),
    "12:30pm" -> Seq("12", ":", "30", "pm"),
    "C++" -> Seq("C", "++"),
    "a--b" -> Seq("a", "--", "b"),
    "tabs\tand\nnewlines" -> Seq("tabs", "and", "newlines"),
    "  leading and trailing  " -> Seq("leading", "and", "trailing"),
    "snake_case" -> Seq("snake", "_", "case"),
    "" -> Seq())

  /** The divergence class: an "other" run of MIXED characters.
    * SimpleTokenizer splits at every character change inside the run;
    * TokenPattern keeps the run as one token (backreference-free regex).
    */
  val divergeMixedRun: Seq[(String, Seq[String], Seq[String])] = Seq(
    // (input, SimpleTokenizer, TokenPattern)
    ("?!", Seq("?", "!"), Seq("?!")),
    ("e.g.,", Seq("e", ".", "g", ".", ","), Seq("e", ".", "g", ".,")),
    ("end.)", Seq("end", ".", ")"), Seq("end", ".)")),
    ("\"quoted,\"", Seq("\"", "quoted", ",", "\""), Seq("\"", "quoted", ",\"")))

  test("TokenPattern matches SimpleTokenizer on uniform-run vectors") {
    agree.foreach { case (in, expected) =>
      assert(simpleTokenize(in) == expected, s"reference impl drifted on <$in>")
      assert(ours(in) == expected, s"TokenPattern diverged on <$in>")
    }
  }

  test("the ONLY divergence is mixed-character punctuation runs, as documented") {
    divergeMixedRun.foreach { case (in, opennlp, pattern) =>
      assert(simpleTokenize(in) == opennlp, s"reference impl drifted on <$in>")
      assert(ours(in) == pattern, s"documented divergence changed on <$in>")
      assert(ours(in) != opennlp, s"<$in> unexpectedly agrees — move it to `agree`")
    }
  }

  test("property: the two tokenizers always agree when no two adjacent " +
    "chars are distinct non-alphanumerics") {
    val rnd = new scala.util.Random(7)
    val alphabet = "abcXY01 .!-'\t"
    (1 to 500).foreach { _ =>
      val s = Seq.fill(rnd.nextInt(20))(alphabet(rnd.nextInt(alphabet.length))).mkString
      val hasMixedRun = s.sliding(2).exists(p => p.length == 2 &&
        p.forall(c => !c.isLetterOrDigit && !c.isWhitespace) && p(0) != p(1))
      if (!hasMixedRun)
        assert(ours(s) == simpleTokenize(s), s"diverged on <$s>")
    }
  }
}
