package graft.text

import org.scalatest.funsuite.AnyFunSuite

class PorterStemmerSpec extends AnyFunSuite {
  // Expected outputs from M.F. Porter's 1980 paper examples.
  val cases = Seq(
    "caresses" -> "caress", "ponies" -> "poni", "ties" -> "ti",
    "caress" -> "caress", "cats" -> "cat", "feed" -> "feed",
    "agreed" -> "agre", "plastered" -> "plaster", "bled" -> "bled",
    "motoring" -> "motor", "sing" -> "sing", "conflated" -> "conflat",
    "troubled" -> "troubl", "sized" -> "size", "hopping" -> "hop",
    "tanned" -> "tan", "falling" -> "fall", "hissing" -> "hiss",
    "fizzed" -> "fizz", "failing" -> "fail", "filing" -> "file",
    "happy" -> "happi", "sky" -> "sky", "relational" -> "relat",
    "conditional" -> "condit", "rational" -> "ration",
    "valenci" -> "valenc", "digitizer" -> "digit",
    "operator" -> "oper", "feudalism" -> "feudal",
    "decisiveness" -> "decis", "hopefulness" -> "hope",
    "formaliti" -> "formal", "formative" -> "form",
    "formalize" -> "formal", "electriciti" -> "electr",
    "electrical" -> "electr", "hopeful" -> "hope",
    "goodness" -> "good", "revival" -> "reviv",
    "allowance" -> "allow", "inference" -> "infer",
    "airliner" -> "airlin", "adjustable" -> "adjust",
    "defensible" -> "defens", "replacement" -> "replac",
    "adjustment" -> "adjust", "dependent" -> "depend",
    "adoption" -> "adopt", "communism" -> "commun",
    "activate" -> "activ", "effective" -> "effect",
    "probate" -> "probat", "rate" -> "rate", "cease" -> "ceas",
    "controll" -> "control", "roll" -> "roll", "running" -> "run",
    "summarization" -> "summar", "summaries" -> "summari")

  test("porter paper examples") {
    cases.foreach { case (in, want) =>
      assert(PorterStemmer.stem(in) == want, s"stem($in)")
    }
  }
  test("short words unchanged") {
    Seq("a", "is", "be").foreach(w => assert(PorterStemmer.stem(w) == w))
  }
}

class LemmatizerSpec extends AnyFunSuite {
  test("regular plurals") {
    assert(Lemmatizer.lemma("batteries") == "battery")
    assert(Lemmatizer.lemma("cars") == "car")
    assert(Lemmatizer.lemma("boxes") == "box")
    assert(Lemmatizer.lemma("churches") == "church")
    assert(Lemmatizer.lemma("wishes") == "wish")
    // OOV fallback (no rule reaches "quiz"; NLTK would leave it alone
    // only because "quizz" is not a WordNet lemma)
    assert(Lemmatizer.lemma("quizzes") == "quizz")
  }
  test("irregulars via exception list with min-length selection") {
    assert(Lemmatizer.lemma("children") == "child")
    assert(Lemmatizer.lemma("men") == "man")
    // "data" is itself a WordNet lemma; NLTK's min(lemmas, key=len)
    // keeps it over "datum" (tie on length -> original first)
    assert(Lemmatizer.lemma("data") == "data")
    assert(Lemmatizer.lemma("people") == "people")
    assert(Lemmatizer.lemma("bases") == "basis")
    assert(Lemmatizer.lemma("matrices") == "matrix")
  }
  test("lexicon stops over-stripping (the ADVICE divergers)") {
    assert(Lemmatizer.lemma("movies") == "movie") // not "movy"
    assert(Lemmatizer.lemma("cookies") == "cookie")
    assert(Lemmatizer.lemma("specimen") == "specimen") // not "specimal"
    assert(Lemmatizer.lemma("regimen") == "regimen")
    assert(Lemmatizer.lemma("women") == "woman")
    assert(Lemmatizer.lemma("policemen") == "policeman")
  }
  test("guards: -ss/-us/-is and short words untouched") {
    assert(Lemmatizer.lemma("class") == "class")
    assert(Lemmatizer.lemma("bus") == "bus")
    assert(Lemmatizer.lemma("basis") == "basis")
    assert(Lemmatizer.lemma("is") == "is")
  }
  test("fidelity: >=99% agreement with NLTK-expected lemmas (H1 bound)") {
    val in = getClass.getResourceAsStream("/graft/morphy_expected.tsv")
    assert(in != null)
    val pairs =
      try scala.io.Source.fromInputStream(in, "UTF-8").getLines()
        .filter(_.nonEmpty).map { l =>
          val Array(f, e) = l.split("\t", 2); (f, e)
        }.toVector
      finally in.close()
    assert(pairs.size > 2000, s"fixture shrank: ${pairs.size}")
    val bad = pairs.filter { case (f, e) => Lemmatizer.lemma(f) != e }
    val rate = 1.0 - bad.size.toDouble / pairs.size
    assert(rate >= 0.99,
      s"agreement $rate; first divergers: ${bad.take(10).map { case (f, e) =>
          s"$f->${Lemmatizer.lemma(f)} (want $e)"
        }.mkString(", ")}")
  }
}

class StopWordsSpec extends AnyFunSuite {
  test("nltk list has the canonical 179 entries") {
    assert(StopWords.nltkEnglish.size == 179)
    assert(StopWords.nltkEnglish.distinct.size == 179)
    assert(StopWords.asSet.contains("the"))
    assert(StopWords.asSet.contains("wouldn't"))
    assert(!StopWords.asSet.contains("spark"))
  }
}
