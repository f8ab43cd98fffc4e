package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.chunk.Chunkers
import graft.chunk.Chunkers.{ChunkerConfig, Strategy}

/** Ports the reference's chunking invariants
  * (solaius/data_pipeline2 `tests/test_chunking.py`) + seeded
  * property-style checks (plain loops — no extra test deps).
  */
class ChunkersSpec extends AnyFunSuite {

  val doc: String =
    """# Title
      |
      |Intro paragraph with some text. It has two sentences.
      |
      |## Section One
      |
      |First section content. More words here to fill the line out fully.
      |Another line of section one.
      |
      |## Section Two
      |
      |Second section content! Questions too? Yes indeed.""".stripMargin

  // --- markdown fold (reference docling_service.py:57-97) ---

  test("markdown: heading flushes chunk and resets heading context") {
    val cs = Chunkers.chunkMarkdown(doc, 80)
    assert(cs.nonEmpty)
    // every chunk's headings is the nearest preceding heading, length <= 1
    assert(cs.forall(_.headings.size <= 1))
    assert(cs.exists(_.headings == Vector("## Section One")))
    assert(cs.exists(_.headings == Vector("## Section Two")))
    // no chunk contains a heading line as content
    assert(cs.forall(!_.text.linesIterator.exists(_.startsWith("#"))))
  }

  test("markdown: size-forced flush keeps chunks bounded (test_chunking.py:98-110)") {
    val size = 60
    val cs = Chunkers.chunkMarkdown(doc, size)
    // bound from the reference algorithm: a flush happens before a line
    // that would overflow, so a chunk exceeds size only by its last line
    val maxLine = doc.linesIterator.map(_.length).max
    assert(cs.forall(_.text.length <= size + maxLine + 1))
  }

  test("markdown: content is preserved (non-heading lines re-concatenate)") {
    val cs = Chunkers.chunkMarkdown(doc, 50)
    val rebuilt = cs.map(_.text).mkString("\n")
    val expected = doc.linesIterator.filterNot(_.startsWith("#")).mkString("\n")
    assert(rebuilt == expected)
  }

  // --- sentence fold (reference docling_service.py:99-171) ---

  test("sentence: packs greedily and keeps every chunk within bound") {
    val size = 80
    val cs = Chunkers.chunkSentences(doc, size)
    assert(cs.nonEmpty)
    assert(cs.forall(_.text.length <= size + 50),
           cs.map(_.text.length).mkString(","))
  }

  test("sentence: QUIRK — every chunk carries the LAST heading of the doc") {
    val cs = Chunkers.chunkSentences(doc, 80)
    assert(cs.forall(_.headings == Vector("## Section Two")))
  }

  test("sentence: oversize sentence is word-split, parts within chunk_size") {
    val longSentence = ("word " * 60).trim + "."
    val cs = Chunkers.chunkSentences(longSentence, 50)
    assert(cs.size > 1)
    assert(cs.forall(_.text.length <= 50))
  }

  // --- fallback (docling_service.py:277-292; test_chunking.py:123-135) ---

  test("fallback: empty/unchunkable content yields exactly one full_document chunk") {
    val (cs, strategy, fb) = Chunkers.chunk("", ChunkerConfig(strategy = Strategy.Sentence))
    assert(cs.size == 1 && fb && strategy == Strategy.Fallback)
    assert(cs.head.text == "")
  }

  test("fallback: text with no sentence terminators falls back whole") {
    val text = "no terminators here just words"
    val (cs, _, fb) = Chunkers.chunk(text, ChunkerConfig(strategy = Strategy.Sentence))
    assert(fb && cs == Vector(Chunkers.RawChunk(text, Vector.empty)))
  }

  // --- config validation (docling_service.py:42-51; test_chunking.py:162-171) ---

  test("config validation rejects bad size/overlap/strategy") {
    assertThrows[IllegalArgumentException](ChunkerConfig(chunkSize = 0))
    assertThrows[IllegalArgumentException](ChunkerConfig(chunkOverlap = -1))
    assertThrows[IllegalArgumentException](ChunkerConfig(chunkSize = 100, chunkOverlap = 100))
    assertThrows[IllegalArgumentException](ChunkerConfig(strategy = "bogus"))
  }

  // --- fixed width (document_processor.py:134-144) ---

  test("fixed-width: exact 100-char slices, remainder last") {
    val text = "a" * 250
    val cs = Chunkers.chunkFixedWidth(text, 100)
    assert(cs.map(_.text.length) == Vector(100, 100, 50))
    assert(cs.map(_.text).mkString == text)
  }

  // --- hybrid (token-window approximation of C1) ---

  test("hybrid: windows respect the BPE-token budget, overlap, cover all tokens") {
    // each "wN" costs 2 BPE tokens (letter run + digit run)
    val text = (1 to 100).map(i => s"w$i").mkString(" ")
    val cs = Chunkers.chunkHybrid(text, 20, 5)
    val words = cs.flatMap(_.text.split(" "))
    assert(words.toSet == (1 to 100).map(i => s"w$i").toSet)
    // budget: every window within chunkSize BPE tokens
    assert(cs.forall(_.text.split(" ").map(Chunkers.bpeCount).sum <= 20))
    // overlap: windows re-open on the longest suffix within 5 BPE
    // tokens — here 2 words (cost 4; a third would cost 6)
    assert(cs.sliding(2).forall {
      case Vector(a, b) => a.text.split(" ").takeRight(2).sameElements(b.text.split(" ").take(2))
      case _            => true
    })
  }

  test("hybrid: oversize single word forms its own over-budget window; words never split") {
    val text = "short " + ("x1" * 40) + " tail words here"
    val cs = Chunkers.chunkHybrid(text, 10, 2)
    assert(cs.exists(_.text == "x1" * 40), "oversize word kept atomic")
    assert(cs.flatMap(_.text.split(" ")).toSet == text.split(" ").toSet)
  }

  // --- seeded property checks ---

  private def randomText(rnd: scala.util.Random): String = {
    val pieces = Seq("word", "longerword", "# Heading", "One. Two!", "\n", "x?")
    (0 until rnd.nextInt(60)).map(_ => pieces(rnd.nextInt(pieces.size))).mkString(" ")
  }

  test("property: markdown chunker never loses non-heading characters") {
    val rnd = new scala.util.Random(42)
    for (_ <- 1 to 200) {
      val text = randomText(rnd)
      val size = 20 + rnd.nextInt(180)
      val cs = Chunkers.chunkMarkdown(text, size)
      val expected = text.split("\n", -1).filterNot(_.startsWith("#")).mkString("\n")
      val got = cs.map(_.text).mkString("\n")
      assert(expected.isEmpty || got == expected, s"size=$size text=$text")
    }
  }

  test("property: linear sentence scanner ≡ the reference regex") {
    val re = "([^.!?]+[.!?]+(?:\\s+|$))".r
    val rnd = new scala.util.Random(13)
    val alphabet = "ab .!?\n\t."
    for (_ <- 1 to 500) {
      val text = (0 until rnd.nextInt(80)).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
      val expected = re.findAllMatchIn(text).map(_.group(1)).toVector
      assert(Chunkers.extractSentences(text) == expected, s"text=${text.replace("\n", "\\n")}")
    }
  }

  test("property: sentence chunks stay within size + overlap bound") {
    val rnd = new scala.util.Random(7)
    for (_ <- 1 to 200) {
      val text = randomText(rnd)
      val size = 30 + rnd.nextInt(120)
      val cs = Chunkers.chunkSentences(text, size)
      // reference invariant (test_chunking.py:98-110): <= chunk_size + 50
      assert(cs.forall(c => c.text.length <= size + 50 ||
        // a single unsplittable word may exceed
        !c.text.contains(" ")), s"size=$size text=$text")
    }
  }
}
