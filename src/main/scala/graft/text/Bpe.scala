package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Byte-pair-encoding tokenizer: train merges on the corpus, encode
  * with a native expression (Sennrich et al. 2016 — the standard
  * subword algorithm behind GPT-2/RoBERTa vocabularies).
  *
  * Scale shape: the only corpus-sized work is ONE word-frequency
  * aggregation (map-side combinable hash agg + TakeOrderedAndProject
  * top-`maxWords`); the merge loop then runs on the collected
  * weighted word table — the same compression every production BPE
  * trainer uses (training on word counts is exact for the words kept;
  * the dropped long tail contributes negligible pair mass by
  * construction). At 100 TB nothing changes but the aggregation's
  * input: the driver still holds ≤ maxWords rows.
  *
  * Character-level symbols (no byte fallback, no end-of-word marker)
  * — the portable core of the algorithm; a production byte-level
  * variant changes only the symbol alphabet. */
object Bpe {

  /** Ordered merge table from the corpus's word-frequency table.
    * Deterministic: pair ties break lexicographically, the word table
    * is count-desc/word-asc. Stops early when the best pair occurs
    * fewer than `minPairCount` times (merging a once-seen pair adds
    * vocabulary without compression). */
  def train(df: DataFrame, textCol: String, numMerges: Int,
            maxWords: Int = 100000, minPairCount: Long = 2L,
            byteLevel: Boolean = false): IndexedSeq[(String, String)] = {
    require(numMerges > 0, s"numMerges must be positive, got $numMerges")
    val wordRows = df.select(explode(TextAnalysis.words(col(textCol))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("w"))
      .limit(maxWords)
      .collect()
    // weighted words as mutable symbol arrays — split by CODE POINT,
    // not UTF-16 unit, so non-BMP characters (emoji, astral CJK) stay
    // whole symbols instead of lone surrogates; byte-level mode splits
    // into mapped UTF-8 bytes instead (256-symbol alphabet, no OOV)
    val toSyms: String => Array[String] =
      if (byteLevel) Bpe.byteSymbols else Bpe.codePointSymbols
    val words = wordRows.map(r => (toSyms(r.getString(0)), r.getLong(1)))
    val merges = IndexedSeq.newBuilder[(String, String)]
    // pair counts maintained INCREMENTALLY: a merge touches only the
    // words containing the merged adjacency (their old pairs subtract,
    // their new pairs add) — never a full rebuild per iteration
    val counts = scala.collection.mutable.HashMap.empty[(String, String), Long]
    def addPairs(syms: Array[String], cnt: Long): Unit = {
      var j = 0
      while (j < syms.length - 1) {
        counts.updateWith((syms(j), syms(j + 1)))(c => Some(c.getOrElse(0L) + cnt))
        j += 1
      }
    }
    def subPairs(syms: Array[String], cnt: Long): Unit = {
      var j = 0
      while (j < syms.length - 1) {
        counts.updateWith((syms(j), syms(j + 1))) { c =>
          val left = c.getOrElse(0L) - cnt
          if (left <= 0) None else Some(left)
        }
        j += 1
      }
    }
    words.foreach { case (syms, cnt) => addPairs(syms, cnt) }
    var i = 0
    var done = false
    while (i < numMerges && !done) {
      if (counts.isEmpty) done = true
      else {
        val (pair, best) = counts.minBy { case ((a, b), c) => (-c, a, b) }
        if (best < minPairCount) done = true
        else {
          merges += pair
          val merged = pair._1 + pair._2
          for (k <- words.indices) {
            val (syms, cnt) = words(k)
            var has = false
            var j = 0
            while (!has && j < syms.length - 1) {
              has = syms(j) == pair._1 && syms(j + 1) == pair._2
              j += 1
            }
            if (has) {
              subPairs(syms, cnt)
              val out = Array.newBuilder[String]
              j = 0
              while (j < syms.length) {
                if (j < syms.length - 1 && syms(j) == pair._1 && syms(j + 1) == pair._2) {
                  out += merged; j += 2
                } else { out += syms(j); j += 1 }
              }
              val next = out.result()
              addPairs(next, cnt)
              words(k) = (next, cnt)
            }
          }
          i += 1
        }
      }
    }
    merges.result()
  }

  /** One symbol per Unicode code point (surrogate pairs stay whole). */
  private[text] def codePointSymbols(word: String): Array[String] = {
    val out = Array.newBuilder[String]
    var i = 0
    while (i < word.length) {
      val cp = word.codePointAt(i)
      out += new String(Character.toChars(cp))
      i += Character.charCount(cp)
    }
    out.result()
  }

  // --- byte-level alphabet (GPT-2's bytes_to_unicode mapping) -------

  /** Printable stand-in char per byte value: printable ASCII/Latin-1
    * bytes map to themselves, the rest shift past U+0100 — every byte
    * gets a distinct printable char, so byte-level tokens are valid,
    * storable strings and the mapping inverts exactly. */
  private[text] val byteChar: Array[Char] = {
    val out = new Array[Char](256)
    var shift = 0
    for (b <- 0 until 256) {
      val printable = (b >= 33 && b <= 126) || (b >= 161 && b <= 172) || (b >= 174 && b <= 255)
      if (printable) out(b) = b.toChar
      else { out(b) = (256 + shift).toChar; shift += 1 }
    }
    out
  }
  private[text] lazy val charByte: Map[Char, Int] =
    byteChar.zipWithIndex.map { case (c, b) => c -> b }.toMap

  /** One symbol per UTF-8 byte, rendered through [[byteChar]] — the
    * byte-level alphabet: 256 base symbols, NO out-of-vocabulary
    * input ever, emoji and any script segment without special cases
    * (the production alphabet; [[codePointSymbols]] is the portable
    * character-level default). */
  private[text] def byteSymbols(word: String): Array[String] =
    word.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      .map(b => String.valueOf(byteChar(b & 0xFF)))

  /** Invert a byte-level token (or a concatenation of them) back to
    * UTF-8 text. A single token may END mid-character — byte merges
    * don't respect character boundaries — so for exact reconstruction
    * concatenate the tokens FIRST and decode once. */
  def decodeByteToken(token: String): String = {
    val bytes = token.map(c => charByte(c).toByte).toArray
    new String(bytes, java.nio.charset.StandardCharsets.UTF_8)
  }

  /** array<string> of BPE tokens for a text column under `merges`.
    * `byteLevel` must match the flag the merges were trained with. */
  def tokenize(text: Column, merges: IndexedSeq[(String, String)],
               byteLevel: Boolean = false): Column =
    org.apache.spark.sql.GraftColumnBridge.column(
      BpeEncode(org.apache.spark.sql.GraftColumnBridge.expression(text), merges, byteLevel))

  /** Column form of [[decodeByteToken]]: invert a byte-level token
    * concatenation back to UTF-8 text, per row — the decode half of the
    * tokenizer's end-to-end round-trip at table scale. Feed it the
    * CONCATENATION of a document's tokens (individual tokens may end
    * mid-character; the byte stream only re-aligns as a whole). */
  def decodeBytes(tokens: Column): Column =
    org.apache.spark.sql.GraftColumnBridge.column(
      BpeDecode(org.apache.spark.sql.GraftColumnBridge.expression(tokens)))
}

/** Per-row BPE encode: whitespace-split words (same token boundary as
  * `TextAnalysis.words`), then greedy lowest-rank merging per word —
  * the exact GPT-2 encode order, so encode(train corpus) reproduces
  * the training segmentation. The merge table travels in the
  * expression (task binary, broadcast by Spark); rank lookup is a
  * hash map built once per executor. */
case class BpeEncode(child: Expression, merges: IndexedSeq[(String, String)],
                     byteLevel: Boolean = false)
    extends UnaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"bpe_encode requires string input, got ${t.simpleString(10)}")
  }
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "bpe_encode"

  @transient private lazy val rank: Map[(String, String), Int] =
    merges.zipWithIndex.toMap

  private def encodeWord(word: String, out: scala.collection.mutable.ArrayBuffer[UTF8String]): Unit = {
    val syms = (if (byteLevel) Bpe.byteSymbols(word) else Bpe.codePointSymbols(word)).toBuffer
    var continue = syms.length >= 2
    while (continue) {
      // lowest-rank applicable merge (GPT-2 order)
      var bestRank = Int.MaxValue
      var bestAt = -1
      var j = 0
      while (j < syms.length - 1) {
        rank.get((syms(j), syms(j + 1))).foreach { r =>
          if (r < bestRank) { bestRank = r; bestAt = j }
        }
        j += 1
      }
      if (bestAt < 0) continue = false
      else {
        syms(bestAt) = syms(bestAt) + syms(bestAt + 1)
        syms.remove(bestAt + 1)
        if (syms.length < 2) continue = false
      }
    }
    syms.foreach(s => out += UTF8String.fromString(s))
  }

  override protected def nullSafeEval(input: Any): Any = {
    val text = input.asInstanceOf[UTF8String].toString
    val out = scala.collection.mutable.ArrayBuffer.empty[UTF8String]
    // EXACTLY java-regex \s (the TextAnalysis.words boundary): space,
    // tab, LF, VT, FF, CR — Character.isWhitespace would also split on
    // unicode spaces and drift from the word aggregation the merges
    // were trained on
    def isWs(c: Char): Boolean =
      c == ' ' || c == '\t' || c == '\n' || c == '\u000B' || c == '\f' || c == '\r'
    var start = -1
    var i = 0
    while (i <= text.length) {
      val ws = i == text.length || isWs(text.charAt(i))
      if (!ws && start < 0) start = i
      else if (ws && start >= 0) { encodeWord(text.substring(start, i), out); start = -1 }
      i += 1
    }
    new GenericArrayData(out.toArray[Any])
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Per-row byte-level BPE decode: map each stand-in char of the GPT-2
  * bytes_to_unicode alphabet back to its byte and re-read the buffer
  * as UTF-8. Inverse of [[Bpe.byteSymbols]] ∘ concat — fails loudly on
  * a char outside the 256-symbol alphabet (only possible if fed
  * non-byte-level tokens). */
case class BpeDecode(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"bpe_decode requires string input, got ${t.simpleString(10)}")
  }
  override def dataType: DataType = StringType
  override def prettyName: String = "bpe_decode"

  // dense char→byte table (alphabet chars all sit below 0x200)
  @transient private lazy val table: Array[Int] = {
    val t = Array.fill(0x200)(-1)
    Bpe.byteChar.zipWithIndex.foreach { case (c, b) => t(c.toInt) = b }
    t
  }

  override protected def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    val bytes = new Array[Byte](s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i).toInt
      val b = if (c < table.length) table(c) else -1
      if (b < 0) throw new IllegalArgumentException(
        s"bpe_decode: char U+${c.toHexString} is not in the byte-level alphabet")
      bytes(i) = b.toByte
      i += 1
    }
    UTF8String.fromString(new String(bytes, java.nio.charset.StandardCharsets.UTF_8))
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
