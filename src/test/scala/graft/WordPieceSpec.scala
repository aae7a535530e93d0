package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ner.WordPiece

class WordPieceSpec extends AnyFunSuite {

  private val vocab = Seq(
    "[UNK]", "[CLS]", "[SEP]",
    "selon", "reu", "##ters", "##ter", "hav", "##as", "##aas",
    "la", "loi", "##s").zipWithIndex.toMap

  private val wp = new WordPiece(vocab)

  test("greedy longest-match-first subword split") {
    val pieces = wp.encode(Seq("selon", "reuters", "lois"))
    assert(pieces.map(_.token) == Seq("selon", "reu", "##ters", "loi", "##s"))
    assert(wp.tokenizeWord("lois", 0).map(_.token) == Seq("loi", "##s"))
    assert(wp.tokenizeWord("reuters", 0).map(_.token) == Seq("reu", "##ters"))
    assert(wp.tokenizeWord("havaas", 0).map(_.token) == Seq("hav", "##aas"))
  }

  test("unknown words become [UNK]; word ids track the source word") {
    val pieces = wp.encode(Seq("selon", "xyzzy", "reuters"))
    assert(pieces.map(_.token) == Seq("selon", "[UNK]", "reu", "##ters"))
    assert(pieces.map(_.wordIdx) == Seq(0, 1, 2, 2))
  }

  test("truncation drops trailing pieces") {
    val pieces = wp.encode(Seq("reuters", "reuters", "reuters"), maxLen = 3)
    assert(pieces.length == 3)
    assert(pieces.map(_.wordIdx) == Seq(0, 0, 1))
  }

  test("realign: first-piece label per word, truncated words get O") {
    val pieces = wp.encode(Seq("reuters", "havaas", "selon"), maxLen = 3)
    // pieces: reu(w0) ##ters(w0) hav(w1) — selon truncated away
    val labels = IndexedSeq(("B-x", 0.9), ("I-x", 0.8), ("B-y", 0.7))
    val aligned = WordPiece.realign(labels, pieces.map(_.wordIdx), nWords = 3)
    assert(aligned == IndexedSeq(("B-x", 0.9), ("B-y", 0.7), ("O", 0.0)))
  }
}
