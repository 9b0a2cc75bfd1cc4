package graft.text

/** Classic Porter stemmer (M.F. Porter, "An algorithm for suffix stripping",
  * Program 14(3), 1980), transcribed from the author's public-domain
  * reference implementation. This is the algorithm the reference invokes via
  * `opennlp.tools.stemmer.PorterStemmer` (DocumentFreq.java:69, IDF.java:92),
  * including the two published departures (bli->ble, logi->log).
  *
  * Pure function over lowercase ASCII words; thread-safe (no shared state).
  */
object PorterStemmer {

  def stem(word: String): String = {
    if (word == null || word.length <= 2) return word
    new Impl(word).run()
  }

  private final class Impl(word: String) {
    private val b: Array[Char] = new Array[Char](word.length + 1)
    word.getChars(0, word.length, b, 0)
    private var k: Int = word.length - 1 // index of last char
    private var j: Int = 0               // suffix boundary set by ends()

    def run(): String = {
      step1ab(); step1c(); step2(); step3(); step4(); step5()
      new String(b, 0, k + 1)
    }

    private def cons(i: Int): Boolean = b(i) match {
      case 'a' | 'e' | 'i' | 'o' | 'u' => false
      case 'y'                         => if (i == 0) true else !cons(i - 1)
      case _                           => true
    }

    /** Number of consonant sequences between 0 and j ("measure"). */
    private def m(): Int = {
      var n = 0
      var i = 0
      var done = false
      while (!done) {
        if (i > j) return n
        if (!cons(i)) done = true else i += 1
      }
      i += 1
      while (true) {
        done = false
        while (!done) {
          if (i > j) return n
          if (cons(i)) done = true else i += 1
        }
        i += 1
        n += 1
        done = false
        while (!done) {
          if (i > j) return n
          if (!cons(i)) done = true else i += 1
        }
        i += 1
      }
      n
    }

    private def vowelInStem(): Boolean = {
      var i = 0
      while (i <= j) { if (!cons(i)) return true; i += 1 }
      false
    }

    private def doublec(i: Int): Boolean =
      i >= 1 && b(i) == b(i - 1) && cons(i)

    /** cons-vowel-cons ending at i, where the final cons is not w/x/y. */
    private def cvc(i: Int): Boolean = {
      if (i < 2 || !cons(i) || cons(i - 1) || !cons(i - 2)) return false
      val ch = b(i)
      ch != 'w' && ch != 'x' && ch != 'y'
    }

    private def ends(s: String): Boolean = {
      val l = s.length
      val o = k - l + 1
      if (o < 0) return false
      var i = 0
      while (i < l) { if (b(o + i) != s.charAt(i)) return false; i += 1 }
      j = k - l
      true
    }

    private def setto(s: String): Unit = {
      val l = s.length
      val o = j + 1
      var i = 0
      while (i < l) { b(o + i) = s.charAt(i); i += 1 }
      k = j + l
    }

    private def r(s: String): Unit = if (m() > 0) setto(s)

    /** Plurals and -ed/-ing. */
    private def step1ab(): Unit = {
      if (b(k) == 's') {
        if (ends("sses")) k -= 2
        else if (ends("ies")) setto("i")
        else if (b(k - 1) != 's') k -= 1
      }
      if (ends("eed")) { if (m() > 0) k -= 1 }
      else if ((ends("ed") || ends("ing")) && vowelInStem()) {
        k = j
        if (ends("at")) setto("ate")
        else if (ends("bl")) setto("ble")
        else if (ends("iz")) setto("ize")
        else if (doublec(k)) {
          k -= 1
          val ch = b(k)
          if (ch == 'l' || ch == 's' || ch == 'z') k += 1
        } else if (m() == 1 && cvc(k)) setto("e")
      }
    }

    /** Terminal y -> i when there is another vowel in the stem. */
    private def step1c(): Unit =
      if (ends("y") && vowelInStem()) b(k) = 'i'

    /** Double suffixes -> single: -ization -> -ize, etc. */
    private def step2(): Unit = {
      if (k == 0) return
      (b(k - 1): @annotation.switch) match {
        case 'a' =>
          if (ends("ational")) r("ate")
          else if (ends("tional")) r("tion")
        case 'c' =>
          if (ends("enci")) r("ence")
          else if (ends("anci")) r("ance")
        case 'e' =>
          if (ends("izer")) r("ize")
        case 'l' =>
          if (ends("bli")) r("ble") // departure: published algorithm has abli->able
          else if (ends("alli")) r("al")
          else if (ends("entli")) r("ent")
          else if (ends("eli")) r("e")
          else if (ends("ousli")) r("ous")
        case 'o' =>
          if (ends("ization")) r("ize")
          else if (ends("ation")) r("ate")
          else if (ends("ator")) r("ate")
        case 's' =>
          if (ends("alism")) r("al")
          else if (ends("iveness")) r("ive")
          else if (ends("fulness")) r("ful")
          else if (ends("ousness")) r("ous")
        case 't' =>
          if (ends("aliti")) r("al")
          else if (ends("iviti")) r("ive")
          else if (ends("biliti")) r("ble")
        case 'g' =>
          if (ends("logi")) r("log") // departure, as in the reference impl
        case _ =>
      }
    }

    /** -ic-, -full, -ness etc. */
    private def step3(): Unit = (b(k): @annotation.switch) match {
      case 'e' =>
        if (ends("icate")) r("ic")
        else if (ends("ative")) r("")
        else if (ends("alize")) r("al")
      case 'i' =>
        if (ends("iciti")) r("ic")
      case 'l' =>
        if (ends("ical")) r("ic")
        else if (ends("ful")) r("")
      case 's' =>
        if (ends("ness")) r("")
      case _ =>
    }

    /** -ant, -ence etc. removed when m() > 1. */
    private def step4(): Unit = {
      if (k == 0) return
      val matched = (b(k - 1): @annotation.switch) match {
        case 'a' => ends("al")
        case 'c' => ends("ance") || ends("ence")
        case 'e' => ends("er")
        case 'i' => ends("ic")
        case 'l' => ends("able") || ends("ible")
        case 'n' => ends("ant") || ends("ement") || ends("ment") || ends("ent")
        case 'o' => (ends("ion") && j >= 0 && (b(j) == 's' || b(j) == 't')) || ends("ou")
        case 's' => ends("ism")
        case 't' => ends("ate") || ends("iti")
        case 'u' => ends("ous")
        case 'v' => ends("ive")
        case 'z' => ends("ize")
        case _   => false
      }
      if (matched && m() > 1) k = j
    }

    /** Final -e removal and -ll -> -l. */
    private def step5(): Unit = {
      j = k
      if (b(k) == 'e') {
        val a = m()
        if (a > 1 || (a == 1 && !cvc(k - 1))) k -= 1
      }
      if (b(k) == 'l' && doublec(k) && m() > 1) k -= 1
    }
  }
}
