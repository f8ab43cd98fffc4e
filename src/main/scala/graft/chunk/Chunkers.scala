package graft.chunk

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Chunking operators (reference C1–C7, SURVEY.md §2.9).
  *
  * The markdown and sentence chunkers are sequential folds over the
  * document text — not expressible in relational ops — so they are pure
  * Scala functions (unit-testable without Spark) invoked through a UDF
  * that returns `array<struct>`; `posexplode` then flattens one document
  * row into N chunk rows. total_chunks is `size(array)` computed BEFORE
  * the explode, so per-document numbering costs no shuffle at all — at
  * 100 TB the whole chunking stage stays embarrassingly parallel.
  *
  * Semantics reproduced exactly from solaius/data_pipeline2
  * `services/docling_service.py`:
  *  - markdown fold: :57-97 — heading line flushes + resets heading
  *    context; non-heading lines accumulate until `current_size +
  *    len(line) > chunk_size` forces a flush; text joined with '\n'.
  *  - sentence fold: :99-171 — regex `([^.!?]+[.!?]+(?:\s+|$))`
  *    extraction; oversize sentences word-split greedily (word cost =
  *    len+1); sentences pack while `current + size <= chunk_size`;
  *    QUIRK kept bug-compatible: `current_headings` is the LAST
  *    `#`-prefixed line of the whole document (:111-114).
  *  - fallback: :277-292 — zero chunks ⇒ single whole-document chunk
  *    flagged `is_fallback`.
  *  - fixed-width: `services/document_processor.py:134-144` (dead code
  *    in the reference; kept as an operator because it is the only
  *    oracle-expressible chunker).
  *  - hybrid (:212-236) delegates to an external tokenizer-backed
  *    library; re-expressed as a deterministic packer whose budget unit
  *    is the BPE-ish lexer token count (the same lexer TextStats uses),
  *    with token-budgeted overlap — words stay atomic (SURVEY §7.4
  *    risk 1, narrowed from char/word budgets to token budgets).
  */
object Chunkers {

  /** Chunk text + heading context, pre-enrichment (reference dict shape
    * `{"text": ..., "headings": [...]}`).
    */
  case class RawChunk(text: String, headings: Seq[String])

  object Strategy {
    val Hybrid     = "hybrid"
    val Markdown   = "markdown"
    val Sentence   = "sentence"
    val Fallback   = "fallback"
    val FixedWidth = "fixed_width"
    val all: Set[String] = Set(Hybrid, Markdown, Sentence, Fallback, FixedWidth)
  }

  /** C5 config validation — `docling_service.py:42-51`, tested
    * `tests/test_chunking.py:162-171`.
    */
  final case class ChunkerConfig(
      chunkSize: Int = 500,
      chunkOverlap: Int = 50,
      strategy: String = Strategy.Hybrid) {
    require(chunkSize > 0, "chunk_size must be positive")
    require(chunkOverlap >= 0, "chunk_overlap must be non-negative")
    require(chunkOverlap < chunkSize, "chunk_overlap must be less than chunk_size")
    require(Strategy.all.contains(strategy), s"Invalid chunking strategy: $strategy")
  }

  // ------------------------------------------------------------- pure folds

  /** C2 — markdown-structure chunker (`docling_service.py:57-97`). */
  def chunkMarkdown(content: String, chunkSize: Int): Vector[RawChunk] = {
    val chunks = Vector.newBuilder[RawChunk]
    var current = Vector.empty[String]
    var currentSize = 0
    var headings = Vector.empty[String]
    for (line <- content.split("\n", -1)) {
      if (line.startsWith("#")) {
        if (current.nonEmpty) {
          chunks += RawChunk(current.mkString("\n"), headings)
          current = Vector.empty
          currentSize = 0
        }
        headings = Vector(line.trim)
      } else {
        val lineSize = line.length
        if (currentSize + lineSize > chunkSize && current.nonEmpty) {
          chunks += RawChunk(current.mkString("\n"), headings)
          current = Vector.empty
          currentSize = 0
        }
        current = current :+ line
        currentSize += lineSize
      }
    }
    if (current.nonEmpty) chunks += RawChunk(current.mkString("\n"), headings)
    chunks.result()
  }

  /** Sentence extraction equivalent to the reference regex
    * `([^.!?]+[.!?]+(?:\s+|$))` (`docling_service.py:103-104`) but as a
    * LINEAR scan — `findAllMatchIn` of that pattern backtracks O(n²) on
    * terminator-free text (every failed start position rescans to the
    * end), which dominated whole-corpus chunking. Equivalence to the
    * regex is pinned by a property test (ChunkersSpec).
    */
  private[graft] def extractSentences(content: String): Vector[String] = {
    @inline def isTerm(c: Char) = c == '.' || c == '!' || c == '?'
    val n = content.length
    val out = Vector.newBuilder[String]
    var i = 0
    while (i < n) {
      if (isTerm(content(i))) { i += 1 } // a sentence needs ≥1 non-terminator first
      else {
        var j = i
        while (j < n && !isTerm(content(j))) j += 1
        if (j == n) i = n // no terminator ahead — nothing can match anymore
        else {
          var k = j
          while (k < n && isTerm(content(k))) k += 1
          if (k == n) { out += content.substring(i, k); i = n } // `$` branch
          else if (Character.isWhitespace(content(k))) {
            var m = k
            while (m < n && Character.isWhitespace(content(m))) m += 1
            out += content.substring(i, m) // `\s+` branch (greedy)
            i = m
          } else i = k // follow-char fails: every start ≤ k fails too
        }
      }
    }
    out.result()
  }

  /** C3 — sentence chunker (`docling_service.py:99-171`), including the
    * last-heading quirk and the word-split path for oversize sentences.
    */
  def chunkSentences(content: String, chunkSize: Int): Vector[RawChunk] = {
    val sentences = extractSentences(content)
    // QUIRK (:111-114): headings scanned once over the whole doc — every
    // chunk carries the LAST heading, not the enclosing one.
    val headings: Vector[String] =
      content.split("\n", -1).filter(_.startsWith("#")).lastOption
        .map(h => Vector(h.trim)).getOrElse(Vector.empty)

    val chunks = Vector.newBuilder[RawChunk]
    var current = Vector.empty[String]
    var currentSize = 0
    for (raw <- sentences; sentence = raw.trim if sentence.nonEmpty) {
      val sentenceSize = sentence.length
      if (sentenceSize > chunkSize) {
        // oversize: greedy word split, word cost = len + 1 (:124-147)
        var part = Vector.empty[String]
        var partSize = 0
        for (word <- sentence.split("\\s+") if word.nonEmpty) {
          val wordSize = word.length + 1
          if (partSize + wordSize > chunkSize && part.nonEmpty) {
            chunks += RawChunk(part.mkString(" "), headings)
            part = Vector.empty
            partSize = 0
          }
          part = part :+ word
          partSize += wordSize
        }
        if (part.nonEmpty) chunks += RawChunk(part.mkString(" "), headings)
      } else if (currentSize + sentenceSize <= chunkSize) {
        current = current :+ sentence
        currentSize += sentenceSize
      } else {
        if (current.nonEmpty) chunks += RawChunk(current.mkString(" "), headings)
        current = Vector(sentence)
        currentSize = sentenceSize
      }
    }
    if (current.nonEmpty) chunks += RawChunk(current.mkString(" "), headings)
    chunks.result()
  }

  /** BPE-ish token count of one whitespace-free word: letter runs +
    * digit runs + one per other char — the exact Scala twin of
    * [[graft.text.TextStats.bpeTokens]]'s regex
    * `[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]` (ASCII classes, like the regex).
    */
  private[graft] def bpeCount(w: String): Int = {
    @inline def az(c: Char) = (c >= 'A' && c <= 'Z') || (c >= 'a' && c <= 'z')
    @inline def dg(c: Char) = c >= '0' && c <= '9'
    var i = 0
    var n = 0
    while (i < w.length) {
      val c = w.charAt(i)
      if (az(c)) { while (i < w.length && az(w.charAt(i))) i += 1; n += 1 }
      else if (dg(c)) { while (i < w.length && dg(w.charAt(i))) i += 1; n += 1 }
      else { n += 1; i += 1 }
    }
    n
  }

  /** C1 — deterministic equivalent of the tokenizer-backed
    * HybridChunker (`docling_service.py:212-236`, which packs by HF
    * tokenizer token count): words are atomic, each COSTS its BPE-ish
    * token count ([[bpeCount]] — the same lexer the corpus statistics
    * use), windows pack greedily to `chunkSize` tokens, and the next
    * window re-opens on the longest previous-window suffix within
    * `chunkOverlap` tokens. Heading context = nearest preceding
    * heading. A single word costing more than `chunkSize` forms its
    * own over-budget window (words are never split).
    */
  def chunkHybrid(content: String, chunkSize: Int, chunkOverlap: Int): Vector[RawChunk] = {
    case class Tok(text: String, heading: Option[String], cost: Int)
    val toks = Vector.newBuilder[Tok]
    var heading: Option[String] = None
    for (line <- content.split("\n", -1)) {
      if (line.startsWith("#")) heading = Some(line.trim)
      else for (w <- line.split("\\s+") if w.nonEmpty) toks += Tok(w, heading, bpeCount(w))
    }
    val tokens = toks.result()
    val n = tokens.length
    val out = Vector.newBuilder[RawChunk]
    var prevText: String = null
    var start = 0
    while (start < n) {
      var end = start
      var cost = 0
      while (end < n && (end == start || cost + tokens(end).cost <= chunkSize)) {
        cost += tokens(end).cost
        end += 1
      }
      val slice = tokens.slice(start, end)
      val text = slice.map(_.text).mkString(" ")
      // a trailing window fully contained in the previous one adds no text
      if (prevText == null || !prevText.endsWith(text)) {
        out += RawChunk(text, slice.head.heading.toVector)
        prevText = text
      }
      if (end >= n) start = n
      else {
        // overlap: longest suffix within the overlap token budget;
        // start+1 floor guarantees forward progress
        var s2 = end
        var oc = 0
        while (s2 > start + 1 && oc + tokens(s2 - 1).cost <= chunkOverlap) {
          oc += tokens(s2 - 1).cost
          s2 -= 1
        }
        start = s2
      }
    }
    out.result()
  }

  /** C7 — fixed-width 100-char slices (`document_processor.py:134-144`).
    * Widths count Unicode CODE POINTS, matching the reference's Python
    * string slicing and Spark's `substr` (the codegen-native branch in
    * [[chunkDocuments]]); `String.grouped` would count UTF-16 units and
    * split astral-plane characters in half.
    */
  def chunkFixedWidth(content: String, width: Int = 100): Vector[RawChunk] =
    if (content.isEmpty) Vector.empty
    else {
      val out = Vector.newBuilder[RawChunk]
      var i = 0
      while (i < content.length) {
        val remaining = content.codePointCount(i, content.length)
        val end =
          if (remaining <= width) content.length
          else content.offsetByCodePoints(i, width)
        out += RawChunk(content.substring(i, end), Vector.empty)
        i = end
      }
      out.result()
    }

  /** C4 — dispatch + fallback: a failing/empty strategy yields one
    * whole-document chunk (`docling_service.py:277-292`).
    */
  def chunk(content: String, config: ChunkerConfig): (Vector[RawChunk], String, Boolean) = {
    val attempted =
      try config.strategy match {
        case Strategy.Markdown   => chunkMarkdown(content, config.chunkSize)
        case Strategy.Sentence   => chunkSentences(content, config.chunkSize)
        case Strategy.Hybrid     => chunkHybrid(content, config.chunkSize, config.chunkOverlap)
        case Strategy.FixedWidth => chunkFixedWidth(content)
        case Strategy.Fallback   => Vector.empty
      } catch { case _: Exception => Vector.empty }
    if (attempted.isEmpty) (Vector(RawChunk(content, Vector.empty)), Strategy.Fallback, true)
    else (attempted, config.strategy, false)
  }

  // -------------------------------------------------------- Spark operator

  // Public (not `private`): whole-stage-codegen'd code lives outside this
  // object and must be able to call the struct accessors.
  case class ChunkOut(text: String, headings: Seq[String],
                      strategy: String, fb: Boolean)

  /** Chunk every row of `docs` (C6 enrichment + W1/W2 numbering).
    *
    * Input: any DataFrame with an id column and a text column.
    * Output: one row per chunk with columns
    * `(<idCol>, chunk_id, content, page_number, chunk_number,
    * total_chunks, headings, chunk_type, strategy, is_fallback)`.
    *
    * chunk_id = `chunk_{i}` per document (`docling_service.py:225`);
    * numbering via `posexplode` + `size()` — no window, no shuffle.
    */
  def chunkDocuments(docs: DataFrame, idCol: String, textCol: String,
                     config: ChunkerConfig): DataFrame = {
    val chunksCol =
      if (config.strategy == Strategy.FixedWidth) fixedWidthChunksNative(col(textCol))
      else {
        val chunkUdf = udf { (text: String) =>
          val (cs, strategy, fb) = chunk(Option(text).getOrElse(""), config)
          cs.map(c => ChunkOut(c.text, c.headings, strategy, fb))
        }
        chunkUdf(col(textCol))
      }
    docs
      .withColumn("__chunks", chunksCol)
      .withColumn("total_chunks", size(col("__chunks")))
      .select(col(idCol), col("total_chunks"),
              posexplode(col("__chunks")).as(Seq("__pos", "__c")))
      .select(
        col(idCol),
        concat(lit("chunk_"), (col("__pos") + 1).cast("string")).as("chunk_id"),
        col("__c.text").as("content"),
        lit(1).as("page_number"),
        (col("__pos") + 1).as("chunk_number"),
        col("total_chunks"),
        col("__c.headings").as("headings"),
        when(col("__c.fb"), lit("full_document"))
          .otherwise(chunkTypeCol(col("__c.strategy"))).as("chunk_type"),
        col("__c.strategy").as("strategy"),
        col("__c.fb").as("is_fallback"))
  }

  /** C7's Spark-native form: fixed-width slicing is pure substring
    * arithmetic, so unlike the lexer-driven strategies it needs no
    * UDF — `sequence`+`transform`+`substr` stays inside whole-stage
    * codegen (PlanLintSpec pins this). Semantics are exactly
    * [[chunkFixedWidth]] under [[chunk]]'s C4 dispatch: null/empty
    * text yields one fallback chunk; the struct shape matches the UDF
    * branch's [[ChunkOut]] field for field.
    */
  private def fixedWidthChunksNative(text: Column, width: Int = 100): Column = {
    val txt = coalesce(text, lit(""))
    val noHeadings = array().cast("array<string>")
    when(length(txt) === 0,
         array(struct(lit("").as("text"), noHeadings.as("headings"),
                      lit(Strategy.Fallback).as("strategy"),
                      lit(true).as("fb"))))
      .otherwise(transform(
        sequence(lit(1), ceil(length(txt) / lit(width.toDouble)).cast("int")),
        i => struct(txt.substr((i - 1) * width + 1, lit(width)).as("text"),
                    noHeadings.as("headings"),
                    lit(Strategy.FixedWidth).as("strategy"),
                    lit(false).as("fb"))))
  }

  private def chunkTypeCol(strategy: Column): Column =
    when(strategy === Strategy.Hybrid, "hybrid_chunk")
      .when(strategy === Strategy.Markdown, "markdown_chunk")
      .when(strategy === Strategy.Sentence, "sentence_chunk")
      .when(strategy === Strategy.FixedWidth, "fixed_chunk")
      .otherwise("full_document")

  /** SLIDING-WINDOW chunker — overlapping fixed windows (stride ≤
    * width), the retrieval-context shape the non-overlapping
    * fixed-width strategy can't express: window i covers
    * `[i·stride+1, i·stride+width]`, so consecutive chunks share
    * `width − stride` characters of context. Pure substring
    * arithmetic like C7's native form (`sequence` + `Column.substr`
    * — whole-stage codegen, no UDF, no shuffle). The last window
    * starts at the smallest stride multiple whose window reaches the
    * text end (its content truncates there); empty/null text yields
    * no rows.
    */
  def slidingChunks(docs: DataFrame, idCol: String, textCol: String,
                    width: Int = 100, stride: Int = 60): DataFrame = {
    require(stride > 0 && stride <= width, "need 0 < stride <= width")
    docs
      .select(col(idCol), coalesce(col(textCol), lit("")).as("__t"))
      .withColumn("__len", length(col("__t")))
      .filter(col("__len") > 0)
      // n−1 = ceil(max(len−width, 0) / stride), in integer algebra
      .withColumn("__last",
        expr(s"CAST((greatest(__len - $width, 0) + ${stride - 1}) div $stride AS INT)"))
      .select(col(idCol), col("__t"),
              posexplode(sequence(lit(0), col("__last"))).as(Seq("__p", "__i")))
      .select(col(idCol),
              (col("__i") + 1).cast("long").as("chunk_number"),
              (col("__i") * stride + 1).cast("long").as("start_pos"),
              col("__t").substr(col("__i") * stride + 1, lit(width)).as("content"))
  }

  /** CONTENT-DEFINED chunking (CDC, rsync/LBFS family) — cut after
    * every position whose trailing `window`-char content hashes to
    * 0 mod `divisor` (rolling polynomial hash mod 2^32, base
    * [[graft.functions.CdcExpressions.Base]] — see its scaladoc for
    * the degeneracy constraint on base choice), plus the text end.
    * Because cuts depend on CONTENT, not offsets, an insertion only
    * rewrites chunks up to the first surviving cut — every later chunk
    * is byte-identical, which is what makes CDC the storage/transfer
    * dedup chunker where fixed-width invalidates everything after an
    * edit. Expected chunk length ≈ `divisor` chars; this is the
    * unconstrained form (no min/max bound — a bound makes the cut set
    * state-dependent and needs a sequential scan).
    *
    * Pure array algebra, fully codegen: the cut finder is a native
    * expression (O(1) rolling update per position inside whole-stage
    * codegen — it replaced an interpreted md5-per-position HOF lambda
    * that was the entire q101 cost at sf0.1), chunk spans via an
    * index-aware `transform` over the cut array — no window function,
    * no shuffle, no UDF. Sessions must install [[graft.GraftExtensions]].
    */
  def cdcChunks(docs: DataFrame, idCol: String, textCol: String,
                window: Int = 16, divisor: Int = 64): DataFrame = {
    require(window > 0 && divisor > 0, "need positive window and divisor")
    docs
      .select(col(idCol), coalesce(col(textCol), lit("")).as("__t"))
      .withColumn("__len", length(col("__t")))
      .filter(col("__len") > 0)
      .withColumn("__cuts",
        graft.functions.CdcExpressions.cdcCuts(col("__t"), window, divisor))
      .withColumn("__bnds", array_union(col("__cuts"), array(col("__len"))))
      .withColumn("__chunks",
        transform(col("__bnds"), (end, k) => struct(
          when(k === 0, lit(1))
            .otherwise(element_at(col("__bnds"), k) + 1).as("s"),
          end.as("e"))))
      .select(col(idCol), col("__t"),
              posexplode(col("__chunks")).as(Seq("__p", "__c")))
      .select(col(idCol),
              (col("__p") + 1).cast("long").as("chunk_number"),
              col("__c.s").cast("long").as("start_pos"),
              col("__t").substr(col("__c.s"), col("__c.e") - col("__c.s") + 1)
                .as("content"))
  }
}
