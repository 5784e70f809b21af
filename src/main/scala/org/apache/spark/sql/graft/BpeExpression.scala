package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** A greedy longest-match subword vocabulary over ARBITRARY-LENGTH,
  * BYTE-LEVEL merge units, compiled to a flat byte trie: one forward
  * walk per position, the last terminal node seen is the longest match —
  * no per-check substring allocation, no length-class restriction.
  *
  * This replaces the r11 packed-long probe, which required
  * length-homogeneous 4/3/2-char ASCII units and therefore could not
  * load a real published merge table (GPT-2/LLaMA-style vocabularies mix
  * unit lengths 1..16+ and contain non-ASCII byte sequences — including
  * bytes that are not valid standalone UTF-8, like the leading-space
  * marker 0x20+'t'+'h'+'e'). Load paths:
  *
  *   - [[BpeVocab.fromUnits]]: any `Seq[Array[Byte]]` of unit byte
  *     sequences (arbitrary lengths, arbitrary bytes);
  *   - [[BpeVocab.fromGpt2Merges]]: the published GPT-2 `merges.txt`
  *     format verbatim (one "A B" merge per line in the byte-to-unicode
  *     alphabet of GPT-2's encoder.py; the loader inverts that mapping
  *     back to raw bytes). The 50k-entry file itself is not vendored —
  *     this build environment has no network egress — but the format
  *     round-trip is spec-pinned at 50k+ entries in BpeSpec;
  *   - the legacy `new BpeVocab(v4, v3, v2)` constructor (the in-repo
  *     default vocab and its CASE-ladder oracle contract) still works
  *     and keeps its length-homogeneity `require`s, because those lists
  *     ARE the ladder the `*_bpe` DuckDB oracles execute.
  *
  * Semantics contract, pinned by BpeSpec goldens and the three `*_bpe`
  * full-hash oracles: words are maximal runs between single spaces
  * (byte 0x20 — safe to split on in UTF-8, which never uses 0x20 as a
  * continuation byte); at each position the LONGEST vocab unit matching
  * the upcoming bytes is consumed (greedy maximal munch — the published
  * WordPiece/BPE inference scheme, Sennrich et al. 2016 §3; note this is
  * inventory-driven longest-match, not merge-rank replay — the count is
  * a deterministic engine-reproducible budget, documented as such); when
  * nothing matches, the fallback consumes
  *
  *   - one CODEPOINT when `codepointFallback` (the legacy default-vocab
  *     contract: the DuckDB twin's `substring` ladder steps in SQL
  *     characters, and for ASCII-only vocabs byte-trie matching is
  *     step-for-step identical to codepoint matching, so oracle parity
  *     is preserved exactly), or
  *   - one BYTE otherwise (byte-level BPE's no-OOV guarantee: every
  *     unmatched byte is itself a base token — the GPT-2 convention, and
  *     the correct budget accounting for code/CJK corpora where the
  *     legacy codepoint fallback undercounted).
  *
  * Empty words count zero. Reference for WHAT is counted:
  * komodo-data process.py has no tokenizer — this family is part of the
  * driver-mandated training-data-pipeline extension surface.
  */
final class BpeVocab private (
    units: Array[Array[Byte]],
    val codepointFallback: Boolean,
    /** When present, [[count]] runs TRUE merge-rank BPE instead of greedy
      * longest-match: each word starts as raw bytes and the
      * lowest-ranked applicable merge is applied repeatedly — the
      * published GPT-2 algorithm (Sennrich et al. 2016's training
      * order replayed at inference), which greedy maximal munch only
      * approximates (e.g. merges (c,d)<(b,c)<(cd,e) tokenize "bcde" as
      * [b, cde] = 2, where longest-match over the same unit inventory
      * gives [bc, d, e] = 3 — BpeSpec pins the divergence). Built by
      * [[BpeVocab.fromGpt2Merges]] with `ranked = true`. */
    ranked: Option[BpeRankedTable])
    extends Serializable {

  private def this(units: Array[Array[Byte]], codepointFallback: Boolean) =
    this(units, codepointFallback, None)

  require(units.forall(_.length > 0), "BpeVocab units must be non-empty")

  /** Legacy 4/3/2 ASCII constructor — the in-repo default vocab's
    * surface. Length homogeneity is still required HERE (not in the
    * general path) because these lists are injected verbatim into the
    * oracle CASE ladder, which probes exactly substring(_,pos,4|3|2). */
  def this(v4: Seq[String], v3: Seq[String], v2: Seq[String]) = {
    this(
      {
        require(v4.forall(_.length == 4) && v3.forall(_.length == 3) &&
          v2.forall(_.length == 2),
          "BpeVocab unit lists must be length-homogeneous (4/3/2)")
        require((v4 ++ v3 ++ v2).forall(_.forall(_ < 128)),
          "BpeVocab units must be ASCII — the oracle CASE ladder depends on it")
        (v4 ++ v3 ++ v2).map(_.getBytes("UTF-8")).toArray
      },
      true)
  }

  // ---- flat trie ----
  // Node n: children are the sorted UNSIGNED byte keys childKeys(n)
  // (kept as 0..255 ints — a signed-byte array would not be sorted in
  // binarySearch order once keys cross 0x80) with child node ids
  // childVal(n); terminal(n) marks a complete unit. Root (node 0)
  // additionally gets a direct 256-way dispatch table (the hottest
  // probe — most positions fail at the first byte).
  private val (childKeys, childVal, terminal) = {
    import scala.collection.mutable
    val keys = mutable.ArrayBuffer(mutable.TreeMap.empty[Int, Int])
    val term = mutable.ArrayBuffer(false)
    units.foreach { u =>
      var node = 0
      var i = 0
      while (i < u.length) {
        val b = u(i) & 0xFF
        node = keys(node).getOrElse(b, {
          keys += mutable.TreeMap.empty[Int, Int]
          term += false
          val nn = keys.length - 1
          keys(node).put(b, nn)
          nn
        })
        i += 1
      }
      term(node) = true
    }
    (keys.map(_.keysIterator.toArray).toArray,
      keys.map(_.valuesIterator.toArray).toArray,
      term.toArray)
  }

  private val rootDispatch: Array[Int] = {
    val d = Array.fill(256)(-1)
    var i = 0
    while (i < childKeys(0).length) {
      d(childKeys(0)(i)) = childVal(0)(i)
      i += 1
    }
    d
  }

  /** Number of trie nodes (observability for large-vocab loads). */
  def trieSize: Int = terminal.length

  private def child(node: Int, b: Byte): Int = {
    val k = java.util.Arrays.binarySearch(childKeys(node), b & 0xFF)
    if (k >= 0) childVal(node)(k) else -1
  }

  /** Longest terminal match starting at `pos` (bytes), 0 if none. */
  private def longestMatch(b: Array[Byte], pos: Int, end: Int): Int = {
    if (pos >= end) return 0
    var node = rootDispatch(b(pos) & 0xFF)
    if (node < 0) return 0
    var best = if (terminal(node)) 1 else 0
    var i = pos + 1
    while (i < end && node >= 0) {
      node = child(node, b(i))
      if (node >= 0) {
        i += 1
        if (terminal(node)) best = i - pos
      }
    }
    best
  }

  /** UTF-8 codepoint width from a lead byte (continuation/invalid → 1,
    * matching java.codePoints' per-unit degradation on malformed data).
    * Invalid leads — continuations 0x80..0xBF, overlong 0xC0/0xC1, and
    * out-of-range 0xF5..0xFF — degrade per BYTE so malformed input never
    * swallows following bytes that could start a valid match. */
  private def cpWidth(lead: Byte): Int = {
    val b = lead & 0xFF
    if (b < 0x80) 1
    else if (b >= 0xC2 && b <= 0xDF) 2
    else if (b >= 0xE0 && b <= 0xEF) 3
    else if (b >= 0xF0 && b <= 0xF4) 4
    else 1
  }

  private def countWord(b: Array[Byte], start: Int, end: Int): Long =
    ranked match {
      case Some(t) => t.countWord(b, start, end)
      case None =>
        var pos = start
        var cnt = 0L
        while (pos < end) {
          val m = longestMatch(b, pos, end)
          if (m > 0) pos += m
          else if (codepointFallback) pos += math.min(cpWidth(b(pos)), end - pos)
          else pos += 1
          cnt += 1
        }
        cnt
    }

  def countBytes(b: Array[Byte]): Long = {
    var total = 0L
    val n = b.length
    var wStart = 0
    var idx = 0
    while (idx <= n) {
      if (idx == n || b(idx) == 0x20) {
        if (idx > wStart) total += countWord(b, wStart, idx)
        wStart = idx + 1
      }
      idx += 1
    }
    total
  }

  def count(text: String): Long = countBytes(text.getBytes("UTF-8"))

  /** Zero-copy-ish entry for codegen: UTF8String's backing bytes. */
  def countUtf8(s: UTF8String): Long = countBytes(s.getBytes)
}

/** Merge-rank BPE state: token ids are bytes 0..255 plus one id per
  * merge RESULT; `pairRank`/`mergedId` map a packed adjacent-id pair to
  * the merge's rank and its result id. Per word, the lowest-ranked
  * applicable pair merges until none applies — the token count is what
  * remains. O(len²) pair scans per word upper-bounds the work; words
  * are single-space-split runs, so len is sentence-word-sized, and the
  * kernel stays a map-side projection like the trie path. */
final class BpeRankedTable private[graft] (
    pairRank: java.util.HashMap[java.lang.Long, java.lang.Integer],
    mergedId: java.util.HashMap[java.lang.Long, java.lang.Integer])
    extends Serializable {

  private def pack(a: Int, b: Int): java.lang.Long =
    java.lang.Long.valueOf((a.toLong << 32) | (b.toLong & 0xFFFFFFFFL))

  private[graft] def countWord(b: Array[Byte], start: Int, end: Int): Long = {
    var n = end - start
    if (n <= 1) return n.toLong
    val ids = new Array[Int](n)
    var i = 0
    while (i < n) { ids(i) = b(start + i) & 0xFF; i += 1 }
    var done = false
    while (!done && n > 1) {
      var best = Int.MaxValue
      var bi = -1
      i = 0
      while (i < n - 1) {
        val r = pairRank.get(pack(ids(i), ids(i + 1)))
        if (r != null && r.intValue() < best) { best = r.intValue(); bi = i }
        i += 1
      }
      if (bi < 0) done = true
      else {
        ids(bi) = mergedId.get(pack(ids(bi), ids(bi + 1))).intValue()
        i = bi + 1
        while (i < n - 1) { ids(i) = ids(i + 1); i += 1 }
        n -= 1
      }
    }
    n.toLong
  }
}

object BpeVocab {

  /** General load path: arbitrary-length byte-level units. `byteFallback`
    * selects the unmatched-byte convention (default: byte-level BPE's
    * one-token-per-byte no-OOV rule; pass false for the legacy
    * codepoint-fallback accounting). */
  def fromUnits(units: Seq[Array[Byte]], byteFallback: Boolean = true): BpeVocab =
    new BpeVocab(units.toArray, !byteFallback)

  /** GPT-2's byte-to-unicode table (public: gpt2/encoder.py
    * bytes_to_unicode) — printable latin-1 bytes map to themselves, the
    * other 68 bytes map to U+0100.. in discovery order — inverted here so
    * merge lines decode back to raw bytes (e.g. 'Ġ' U+0120 → 0x20). */
  val gpt2ByteDecoder: Map[Char, Byte] = {
    val printable =
      ('!'.toInt to '~'.toInt) ++ (0xA1 to 0xAC) ++ (0xAE to 0xFF)
    val inPrintable = printable.toSet
    val pairs = Seq.newBuilder[(Char, Byte)]
    printable.foreach(b => pairs += (b.toChar -> b.toByte))
    var n = 0
    (0 until 256).foreach { b =>
      if (!inPrintable(b)) {
        pairs += ((256 + n).toChar -> b.toByte)
        n += 1
      }
    }
    pairs.result().toMap
  }

  /** Inverse table (test/tooling surface: render raw bytes in the
    * published merges.txt alphabet). */
  val gpt2ByteEncoder: Map[Byte, Char] =
    gpt2ByteDecoder.map(_.swap)

  private def decodeGpt2(s: String): Array[Byte] = {
    val out = new Array[Byte](s.length)
    var i = 0
    while (i < s.length) {
      out(i) = gpt2ByteDecoder.getOrElse(s.charAt(i),
        throw new IllegalArgumentException(
          s"not a GPT-2 byte-alphabet character: U+${s.charAt(i).toInt.toHexString} in '$s'"))
      i += 1
    }
    out
  }

  /** Load the published GPT-2 `merges.txt` format: optional `#version`
    * header, then one merge per line as two space-separated tokens in
    * the byte-to-unicode alphabet; each merge's RESULT (the
    * concatenation, decoded to raw bytes) becomes a vocabulary unit.
    *
    * `ranked = false` (default): counting runs greedy longest-match
    * over that inventory with byte fallback (every unmatched byte is a
    * base token — GPT-2's 256-entry byte alphabet made implicit).
    * `ranked = true`: counting replays the merges IN FILE ORDER per
    * word — the exact published BPE inference algorithm. The loader is
    * loud about rank-order violations (a merge whose side was never
    * produced by an earlier merge or a single byte cannot apply and
    * indicates a corrupt table). */
  def fromGpt2Merges(lines: Iterator[String], ranked: Boolean = false): BpeVocab = {
    // Only the FIRST line may be the '#version' header. '#' itself is a
    // printable byte in the merge alphabet, and the published GPT-2
    // table contains legitimate merges like "# #" (→ "##") — a blanket
    // startsWith("#") filter would silently drop them.
    val trimmed = lines.map(_.trim).filter(_.nonEmpty).toSeq
    val body =
      if (trimmed.nonEmpty && trimmed.head.startsWith("#version")) trimmed.tail
      else trimmed
    val pairs = body
      .map { l =>
        val sp = l.split(" ")
        require(sp.length == 2, s"malformed merge line: '$l'")
        (decodeGpt2(sp(0)), decodeGpt2(sp(1)))
      }
      .toSeq
    val units = pairs.map { case (a, b) => a ++ b }
    if (!ranked) fromUnits(units)
    else {
      import scala.collection.immutable.ArraySeq
      val idOf = scala.collection.mutable.HashMap.empty[ArraySeq[Byte], Int]
      (0 until 256).foreach(b => idOf(ArraySeq(b.toByte)) = b)
      val pairRank = new java.util.HashMap[java.lang.Long, java.lang.Integer]()
      val mergedId = new java.util.HashMap[java.lang.Long, java.lang.Integer]()
      pairs.zipWithIndex.foreach { case ((a, b), rank) =>
        val ia = idOf.getOrElse(ArraySeq.unsafeWrapArray(a), throw new IllegalArgumentException(
          s"merge $rank: left side is neither a byte nor an earlier merge result"))
        val ib = idOf.getOrElse(ArraySeq.unsafeWrapArray(b), throw new IllegalArgumentException(
          s"merge $rank: right side is neither a byte nor an earlier merge result"))
        val key = java.lang.Long.valueOf((ia.toLong << 32) | (ib.toLong & 0xFFFFFFFFL))
        // first-rank-wins like the reference table (duplicate pairs in a
        // real merges file do not occur; tolerate them conservatively)
        if (!pairRank.containsKey(key)) {
          pairRank.put(key, rank)
          val rid = idOf.getOrElseUpdate(ArraySeq.unsafeWrapArray(a ++ b), 256 + rank)
          mergedId.put(key, rid)
        }
      }
      // Ranked counting never consults the greedy trie — ship only the
      // rank tables, not a dead ~50k-node trie, in every task closure.
      new BpeVocab(Array.empty[Array[Byte]], false,
        Some(new BpeRankedTable(pairRank, mergedId)))
    }
  }

  def fromGpt2MergesFile(path: String, ranked: Boolean = false): BpeVocab = {
    val src = scala.io.Source.fromFile(path, "UTF-8")
    try fromGpt2Merges(src.getLines(), ranked) finally src.close()
  }
}

/** Default-vocab kernel — [[graft.functions.Bpe]]'s lists, the single
  * vocab source the `*_bpe` oracles pin. */
object BpeKernel {
  val default: BpeVocab = new BpeVocab(
    graft.functions.Bpe.V4, graft.functions.Bpe.V3, graft.functions.Bpe.V2)

  def count(text: String): Long = default.count(text)
}

/** Native subword-count expression: `bpe_count(text)` → BIGINT under
  * the expression's [[BpeVocab]] (default: the in-repo lists). Replaces
  * the doubly-nested `aggregate()` higher-order fold, which evaluated
  * INTERPRETED per character position — codegen emits one kernel call
  * per row (the FloatVecDot lesson applied to text), operating directly
  * on the UTF8String's bytes (no String materialization).
  * [[graft.functions.Bpe.countCol]] is the Column API. */
case class BpeCount(child: Expression,
                    vocab: BpeVocab = BpeKernel.default)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = LongType
  override def prettyName: String = "bpe_count"

  override def nullSafeEval(s: Any): Any =
    vocab.countUtf8(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bpeVocab", vocab,
      classOf[BpeVocab].getName)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = $ref.countUtf8($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object BpeFunctions {
  import org.apache.spark.sql.Column
  import org.apache.spark.sql.classic.ExpressionUtils
  import org.apache.spark.sql.catalyst.FunctionIdentifier
  import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

  /** Column API for [[BpeCount]] (ExpressionUtils is private[sql], so
    * the bridge lives here like [[VectorFunctions]]'). */
  def bpe_count(c: Column): Column =
    ExpressionUtils.column(BpeCount(ExpressionUtils.expression(c)))

  /** [[bpe_count]] under a caller-supplied vocabulary. */
  def bpe_count(c: Column, vocab: BpeVocab): Column =
    ExpressionUtils.column(BpeCount(ExpressionUtils.expression(c), vocab))

  /** Registry entry for [[graft.GraftExtensions]] — `bpe_count` from SQL
    * text resolves to the native expression (same surface as vec_dot;
    * SQL callers get the default vocab). */
  val bpeCountDescription: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) =
    (new FunctionIdentifier("bpe_count"),
      new ExpressionInfo(classOf[BpeCount].getName, "bpe_count"),
      (children: Seq[Expression]) => {
        if (children.length != 1)
          throw new IllegalArgumentException(
            s"bpe_count expects exactly 1 argument, got ${children.length}")
        BpeCount(children.head)
      })

  /** Make `bpe_count` callable from SQL text in an already-built session
    * (the [[VectorFunctions.registerSql]] pattern). */
  def registerSql(spark: org.apache.spark.sql.SparkSession): Unit = {
    val (ident, info, builder) = bpeCountDescription
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.functionRegistry.registerFunction(ident, info, builder)
  }
}
