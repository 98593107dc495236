package graft.text

import org.scalatest.funsuite.AnyFunSuite

/** The stemmer must reproduce every golden vector — the same contract
  * the q42b driver gate enforces through the DuckDB VALUES oracle. */
class PorterGoldenSpec extends AnyFunSuite {

  test("stemmer reproduces all golden vectors") {
    val bad = PorterGolden.vectors.collect {
      case (w, want) if Porter2Stemmer.stem(w) != want =>
        s"$w: got ${Porter2Stemmer.stem(w)}, want $want"
    }
    assert(bad.isEmpty, s"${bad.size} golden mismatches:\n${bad.mkString("\n")}")
  }

  test("golden vectors are unique per word and SQL-safe") {
    val words = PorterGolden.vectors.map(_._1)
    assert(words.distinct.size == words.size)
    PorterGolden.vectors.foreach { case (w, s) =>
      assert(w.matches("[a-z+]+") && s.matches("[a-z+]+"), s"unsafe: $w/$s")
    }
  }
}
