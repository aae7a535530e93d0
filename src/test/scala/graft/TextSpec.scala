package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.text.{PunctTokenizer, Segmenter, TextNorm}

class TextSpec extends AnyFunSuite {

  /** Seeded pseudo-random strings (printable + controls + unicode). */
  private def randomStrings(n: Int): Seq[String] = {
    val rng = new scala.util.Random(7)
    (0 until n).map { _ =>
      val len = rng.nextInt(60)
      new String((0 until len).map { _ =>
        rng.nextInt(5) match {
          case 0 => (rng.nextInt(26) + 'a').toChar
          case 1 => ' '
          case 2 => "!\"#$%&'()*+,-./:;<=>?@[\\]^_`{|}~".charAt(rng.nextInt(32))
          case 3 => (rng.nextInt(32)).toChar // control chars
          case _ => "éàüßœ«»…".charAt(rng.nextInt(8))
        }
      }.toArray)
    }
  }

  // --- control-char rule (retokenization.py:135-141) ---

  test("controlToSpace is length-preserving and idempotent") {
    val s = "abc\tdef\nghi\u0000z"
    val out = TextNorm.controlToSpace(s)
    assert(out == "abc def ghi z")
    assert(out.length == s.length)
    assert(TextNorm.controlToSpace(out) == out)
  }

  test("controlToSpace returns the same instance when clean") {
    val s = "no controls here"
    assert(TextNorm.controlToSpace(s) eq s)
  }

  test("controlToSpace length-preserving (property)") {
    randomStrings(500).foreach { s =>
      assert(TextNorm.controlToSpace(s).length == s.length)
    }
  }

  // --- space-before-punctuation (cli_tagger.py:99-104) ---

  test("removeSpaceBeforePunctuation matches reference regex semantics") {
    assert(TextNorm.removeSpaceBeforePunctuation("selon Reuters .") ==
      "selon Reuters.")
    assert(TextNorm.removeSpaceBeforePunctuation("a , b") == "a, b")
    // punct NOT followed by space/end is untouched (regex requires (?:\s|$))
    assert(TextNorm.removeSpaceBeforePunctuation("a .b") == "a .b")
    assert(TextNorm.removeSpaceBeforePunctuation("end !") == "end!")
  }

  // --- punctuation tokenizer (cli_tagger_no_torch_serve.py:158-161) ---

  test("punct tokenizer pads punctuation like the reference") {
    // reference: "".join(" " + c + " " if c in punct else c).split()
    def referenceTokenize(s: String): Seq[String] =
      s.flatMap(c => if (TextNorm.isPunct(c)) s" $c " else c.toString)
        .split("\\s+").filter(_.nonEmpty).toSeq
    val cases = Seq(
      "selon A.F.P. hier",
      "Reuters, Havas et AFP.",
      "a-b c_d (e)",
      "«Guillemets» et points…")
    cases.foreach { s =>
      assert(PunctTokenizer.tokens(s) == referenceTokenize(s), s"input: $s")
    }
  }

  test("punct tokenizer treats NBSP and Unicode spaces as whitespace (Python str.split)") {
    // Python str.split() breaks on U+00A0/U+2009 etc.; Character.isWhitespace
    // alone would glue "Reuters\u00a0said" into one token
    assert(PunctTokenizer.tokens("Reuters\u00a0said") == Seq("Reuters", "said"))
    assert(PunctTokenizer.tokens("a\u2009b\u00a0c") == Seq("a", "b", "c"))
    val t = PunctTokenizer.tokenize("x\u00a0y")
    assert(t.map(tok => (tok.text, tok.start, tok.end)) ==
      Seq(("x", 0, 1), ("y", 2, 3)))
  }

  test("punct tokenizer offsets slice back to the token (property)") {
    randomStrings(500).foreach { s =>
      PunctTokenizer.tokenize(s).foreach { t =>
        assert(s.substring(t.start, t.end) == t.text)
      }
    }
  }

  test("tokenizeRanges ≡ tokenize boundaries (property, incl. sub-ranges)") {
    randomStrings(500).foreach { s =>
      val viaTokens = PunctTokenizer.tokenize(s).map(t => (t.start, t.end))
      val viaRanges = PunctTokenizer.tokenizeRanges(s, 0, s.length)
        .map(r => ((r >>> 32).toInt, (r & 0xffffffffL).toInt)).toSeq
      assert(viaRanges == viaTokens, s"input: ${s.map(_.toInt)}")
      // a sub-range tokenizes like the substring, offsets shifted
      if (s.length >= 4) {
        val from = s.length / 4
        val until = s.length - s.length / 4
        val sub = PunctTokenizer.tokenize(s.substring(from, until))
          .map(t => (t.start + from, t.end + from))
        val subR = PunctTokenizer.tokenizeRanges(s, from, until)
          .map(r => ((r >>> 32).toInt, (r & 0xffffffffL).toInt)).toSeq
        assert(subR == sub)
      }
    }
  }

  // --- segmenter ---

  test("segmenter offsets are exact slices") {
    val text = "Le ministre annonce une loi. La décision suit demain! Et après?"
    val segs = Segmenter.segmentWithOffsets(text)
    assert(segs.length == 3)
    segs.foreach { case (start, sent) =>
      assert(text.substring(start, start + sent.length) == sent)
    }
    assert(segs.map(_._2) == Seq(
      "Le ministre annonce une loi.",
      "La décision suit demain!",
      "Et après?"))
  }

  test("segmenter equals the reference's cumulative +1 rule on single-space-joined text") {
    val sents = Seq("Premier point final.", "Deuxième phrase ici.", "Troisième et fin.")
    val text = sents.mkString(" ")
    val segs = Segmenter.segmentWithOffsets(text)
    assert(segs.map(_._2) == sents)
    // reference bookkeeping: total += len(sentence) + 1 (cli_tagger.py:227)
    var total = 0
    sents.zip(segs).foreach { case (s, (start, _)) =>
      assert(start == total)
      total += s.length + 1
    }
  }

  test("segmenter does not split abbreviations or initials") {
    val text = "M. Dupont selon A. F. P. annonce la loi. Fin de texte."
    val segs = Segmenter.segment(text)
    assert(segs.length == 2, segs.mkString("|"))
  }

  test("segmenter handles empty and whitespace-only text") {
    assert(Segmenter.segmentWithOffsets("").isEmpty)
    assert(Segmenter.segmentWithOffsets("   ").isEmpty)
  }

  // --- accent folding ---

  test("foldAccents strips diacritics") {
    assert(TextNorm.foldAccents("dépêche à l'Agence") == "depeche a l'Agence")
  }
}
