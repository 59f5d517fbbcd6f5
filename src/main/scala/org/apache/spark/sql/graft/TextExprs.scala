package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expressions for the text-sketch pipelines (shingling,
  * MinHash, SimHash).
  *
  * Why not SQL higher-order functions: `transform`/`aggregate` lambdas are
  * interpreted per element, and CollapseProject inlines a `split(...)` alias
  * into EVERY element access of the lambda body — the declarative shingle
  * pipeline re-ran the regexp+split ~150x per document. Each expression here
  * is one pass over the text per row, runs inside whole-stage codegen (the
  * generated code calls the static `compute`), and hashes every shingle
  * exactly once.
  *
  * Scale note: these are per-row projections — no state, no shuffle — so
  * they scale embarrassingly with executors; the dedup joins downstream
  * remain the only shuffles.
  */
object TextSketch {
  /** Normalized word list: lowercase, space-trim, split on whitespace runs
    * — replicating the ORACLE formulation `regexp_split_to_array(
    * trim(lower(text)), '\s+')` exactly: SQL trim strips 0x20 only (NOT
    * Java String.trim's "all chars <= 0x20"), and the SQL split keeps
    * leading/trailing EMPTY fields when edge whitespace remains (tabs,
    * newlines), where Java's default split drops trailing empties. Edge
    * cases only — identical on interior whitespace — but a doc ending in
    * '\n' must shingle the same on both engines.
    * Locale.ROOT: the default-locale overload is locale-sensitive (tr/az
    * executors lowercase 'I' to dotless 'ı'), which would silently diverge
    * from Spark's lower() and the DuckDB oracle — and between executors.
    */
  private def words(t: UTF8String): Array[String] = {
    val lower = t.toString.toLowerCase(java.util.Locale.ROOT)
    var b = 0
    var e = lower.length
    while (b < e && lower.charAt(b) == ' ') b += 1
    while (e > b && lower.charAt(e - 1) == ' ') e -= 1
    lower.substring(b, e).split("\\s+", -1)
  }

  /** Word n-gram shingles joined by ' '; docs shorter than n words collapse
    * to one whole-text shingle (parity with the SQL formulation the oracle
    * checks replicate).
    */
  def shingles(t: UTF8String, n: Int): ArrayData = {
    val w = words(t)
    if (w.length < n) {
      new GenericArrayData(Array[Any](UTF8String.fromString(w.mkString(" "))))
    } else {
      val out = new Array[Any](w.length - n + 1)
      val sb = new java.lang.StringBuilder
      var i = 0
      while (i < out.length) {
        sb.setLength(0)
        var j = 0
        while (j < n) {
          if (j > 0) sb.append(' ')
          sb.append(w(i + j))
          j += 1
        }
        out(i) = UTF8String.fromString(sb.toString)
        i += 1
      }
      new GenericArrayData(out)
    }
  }

  /** Distinct 64-bit shingle hashes (xxhash64, seed 42) — for inverted-index
    * joins where only shingle IDENTITY matters, an 8-byte key shuffles and
    * compares far cheaper than the string; collisions at 2^-64 are noise
    * next to the sketch error of the methods consuming this.
    */
  def shingleHashes(t: UTF8String, n: Int): ArrayData = {
    val arr = shingles(t, n)
    val m = arr.numElements()
    val seen = new java.util.HashSet[java.lang.Long](m * 2)
    val out = new Array[Long](m)
    var k = 0
    var i = 0
    while (i < m) {
      val h = XXH64.hashUTF8String(arr.getUTF8String(i), 42L)
      if (seen.add(h)) { out(k) = h; k += 1 }
      i += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(out, k))
  }

  /** One MD5 per call, reused across shingles on the same thread.
    * MD5 here is NOT for security — it is the one hash function BOTH
    * engines implement identically (Spark `md5`, DuckDB `md5_number_*`),
    * which is what makes the sketch families (minhash/simhash/winnow)
    * exactly replayable in the generated DuckDB oracles. xxhash64 stays in
    * [[shingleHashes]], where only hash IDENTITY matters and no oracle
    * depends on the values.
    */
  private val md5Digest = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  private def md5Bytes(s: UTF8String): Array[Byte] = {
    val d = md5Digest.get()
    d.reset()
    d.digest(s.getBytes)
  }

  /** Little-endian uint64 of digest bytes [off, off+8) — DuckDB's
    * `md5_number_upper` is lane(dig, 0), `md5_number_lower` is lane(dig, 8)
    * (verified against DuckDB 1.0.0: md5_number_upper('abc') =
    * 0xB04FD23C98500190 = LE of digest bytes 0-7). Lane values are UNSIGNED
    * 64-bit on the DuckDB side (UBIGINT), so every comparison on them here
    * uses `Long.compareUnsigned` — a signed min would diverge from the
    * oracle whenever values straddle 2^63.
    */
  private def md5Lane(dig: Array[Byte], off: Int): Long = {
    var v = 0L
    var i = 7
    while (i >= 0) { v = (v << 8) | (dig(off + i) & 0xffL); i -= 1 }
    v
  }

  /** md5 lower lane of one string — the hash domain the sketch kernels
    * (minhash/simhash/winnow) draw from; exposed so specs can state
    * "sketch ⊆ hash set" properties in the same domain.
    */
  def md5Lower(s: UTF8String): Long = md5Lane(md5Bytes(s), 8)

  /** MinHash signature over a shingle array: each shingle MD5-hashed ONCE
    * (both 64-bit lanes of one digest), the k hash family is
    * Kirsch-Mitzenmacher g_j = h1 + j*h2 (mod 2^64 by Long wraparound;
    * the oracle replays it as HUGEINT arithmetic mod 2^64). Position mins
    * are UNSIGNED (see [[md5Lane]]); the empty sentinel is the unsigned
    * max -1L. Duplicates in the input cannot change a min, so the caller
    * needn't dedup first.
    */
  def minhashSig(arr: ArrayData, k: Int): ArrayData = {
    val sig = Array.fill[Long](k)(-1L) // unsigned max
    val m = arr.numElements()
    var i = 0
    while (i < m) {
      // input arrays from SQL may carry null elements; a null shingle
      // contributes nothing rather than NPE-ing the executor
      if (!arr.isNullAt(i)) {
        val dig = md5Bytes(arr.getUTF8String(i))
        val h1 = md5Lane(dig, 8) // md5_number_lower
        val h2 = md5Lane(dig, 0) // md5_number_upper
        var j = 0
        var g = h1
        while (j < k) {
          if (java.lang.Long.compareUnsigned(g, sig(j)) < 0) sig(j) = g
          g += h2
          j += 1
        }
      }
      i += 1
    }
    new GenericArrayData(sig)
  }

  /** Winnowed fingerprint sketch (the MOSS scheme): over the ORDERED k-gram
    * hash sequence, keep the minimum of each sliding window of `w` hashes
    * (rightmost-minimum tie rule keeps the sketch sparse); distinct kept
    * values, ascending. Guarantee: two docs sharing a run of ≥ w+k-1 words
    * share at least one fingerprint — substring-robust, unlike a whole-doc
    * digest, and O(len/w) sized, unlike the full shingle set.
    */
  def winnow(t: UTF8String, n: Int, w: Int): ArrayData = {
    val arr = shingles(t, n)
    val m = arr.numElements()
    val h = new Array[Long](m)
    var i = 0
    while (i < m) {
      // md5 lower lane — unsigned domain, exactly replayable as DuckDB
      // md5_number_lower (see md5Lane); all mins below compare unsigned
      h(i) = md5Lane(md5Bytes(arr.getUTF8String(i)), 8); i += 1
    }
    @inline def leq(a: Long, b: Long): Boolean =
      java.lang.Long.compareUnsigned(a, b) <= 0
    val kept = new java.util.TreeSet[java.lang.Long](
      new java.util.Comparator[java.lang.Long] {
        override def compare(a: java.lang.Long, b: java.lang.Long): Int =
          java.lang.Long.compareUnsigned(a, b)
      })
    if (m <= w) {
      if (m > 0) { var mn = h(0); i = 1; while (i < m) { if (leq(h(i), mn)) mn = h(i); i += 1 }; kept.add(mn) }
    } else {
      var start = 0
      while (start + w <= m) {
        var mnIdx = start
        var j = start + 1
        while (j < start + w) { if (leq(h(j), h(mnIdx))) mnIdx = j; j += 1 }
        kept.add(h(mnIdx))
        start += 1
      }
    }
    val out = new Array[Long](kept.size)
    val it = kept.iterator()
    i = 0
    while (it.hasNext) { out(i) = it.next(); i += 1 }
    new GenericArrayData(out)
  }

  /** All per-document text signals in ONE character pass (the regex
    * formulation pays one full scan per signal — 4 language scores + word +
    * punct + bpe counts = 7 scans per row). Semantics replicate the exact
    * Java-regex behavior of the SQL formulations the oracles use:
    *  - lang scores: `\b(w1|w2|…)\b` whole-word matches, case-sensitive,
    *    ASCII `\w` = [A-Za-z0-9_] (so a marker word inside a \w-run does
    *    not count, and any non-\w char is a boundary);
    *  - ws_tokens: `size(split(trim(s), '\s+'))` — trim strips 0x20 only
    *    (Spark's trim), Java split keeps leading/trailing empty fields for
    *    non-space whitespace at the ends, empty input gives one field;
    *  - n_punct: chars outside [A-Za-z0-9] and Java `\s`;
    *  - bpe_tokens: letter runs + digit runs + punct chars.
    */
  def textStats(t: UTF8String): org.apache.spark.sql.catalyst.InternalRow = {
    val s = t.toString
    @inline def isWs(c: Char) = c == ' ' || c == '\t' || c == '\n' ||
      c == '\u000B' || c == '\f' || c == '\r'
    @inline def isLetter(c: Char) = (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z')
    @inline def isDigit(c: Char) = c >= '0' && c <= '9'
    @inline def isWord(c: Char) = isLetter(c) || isDigit(c) || c == '_'

    // ws token count over the space-trimmed view
    var b = 0
    var e = s.length
    while (b < e && s.charAt(b) == ' ') b += 1
    while (e > b && s.charAt(e - 1) == ' ') e -= 1
    var wsTokens = 0L
    if (b == e) wsTokens = 1L
    else {
      var i = b
      var inRun = false
      while (i < e) {
        val ws = isWs(s.charAt(i))
        if (!ws && !inRun) { wsTokens += 1; inRun = true }
        else if (ws) inRun = false
        i += 1
      }
      if (isWs(s.charAt(b))) wsTokens += 1
      if (isWs(s.charAt(e - 1))) wsTokens += 1
    }

    var punct = 0L; var bpe = 0L
    var sEn = 0L; var sFr = 0L; var sDe = 0L; var sEs = 0L
    val n = s.length

    @inline def runEq(a: Int, end: Int, w: String): Boolean = {
      if (end - a != w.length) return false
      var i = 0
      while (i < w.length) {
        if (s.charAt(a + i) != w.charAt(i)) return false
        i += 1
      }
      true
    }
    def scoreRun(a: Int, end: Int): Unit = {
      if (runEq(a, end, "the") || runEq(a, end, "and") || runEq(a, end, "of") ||
        runEq(a, end, "to") || runEq(a, end, "in") || runEq(a, end, "is")) sEn += 1
      if (runEq(a, end, "le") || runEq(a, end, "la") || runEq(a, end, "les") ||
        runEq(a, end, "de") || runEq(a, end, "et") || runEq(a, end, "une")) sFr += 1
      if (runEq(a, end, "der") || runEq(a, end, "die") || runEq(a, end, "und") ||
        runEq(a, end, "das") || runEq(a, end, "ist") || runEq(a, end, "ein")) sDe += 1
      if (runEq(a, end, "el") || runEq(a, end, "los") || runEq(a, end, "y") ||
        runEq(a, end, "que") || runEq(a, end, "como") || runEq(a, end, "un")) sEs += 1
    }

    var i = 0
    var wordStart = -1
    var letterRun = false
    var digitRun = false
    while (i < n) {
      val c = s.charAt(i)
      if (isWord(c)) { if (wordStart < 0) wordStart = i }
      else if (wordStart >= 0) { scoreRun(wordStart, i); wordStart = -1 }
      if (isLetter(c)) {
        if (!letterRun) bpe += 1
        letterRun = true; digitRun = false
      } else if (isDigit(c)) {
        if (!digitRun) bpe += 1
        digitRun = true; letterRun = false
      } else {
        letterRun = false; digitRun = false
        if (!isWs(c)) {
          punct += 1; bpe += 1
          // a valid surrogate pair is ONE code point (emoji, CJK-ext) to the
          // regex engines this replicates (Java regexp_count, DuckDB RE2);
          // counting both UTF-16 halves would double n_punct/bpe_tokens on
          // non-BMP text. The low half is consumed here; it is non-word and
          // non-ws, so word-run and ws-token logic are unaffected.
          if (Character.isHighSurrogate(c) && i + 1 < n &&
              Character.isLowSurrogate(s.charAt(i + 1))) i += 1
        }
      }
      i += 1
    }
    if (wordStart >= 0) scoreRun(wordStart, n)

    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](sEn, sFr, sDe, sEs, wsTokens, bpe, punct))
  }

  /** ORDERED md5 lower lane per word n-gram — position i of the result is
    * the hash of the window starting at word i (duplicates KEPT, unlike
    * [[shingleHashes]]): the positioned-window primitive exact-substring
    * dedup needs, where "window at (doc, pos)" is the unit of identity.
    * md5 (not xxhash64) because the span oracle replays each window hash
    * as DuckDB md5_number_lower (see [[md5Lane]]).
    */
  def shingleLanes(t: UTF8String, n: Int): ArrayData = {
    val arr = shingles(t, n)
    val m = arr.numElements()
    val out = new Array[Long](m)
    var i = 0
    while (i < m) {
      out(i) = md5Lane(md5Bytes(arr.getUTF8String(i)), 8)
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Both 64-bit md5 lanes of one string as [lower, upper] — the full
    * 128-bit digest exposed as two oracle-replayable longs (DuckDB
    * `md5_number_lower` / `md5_number_upper`, see [[md5Lane]]). Consumers
    * that need several independent-ish hash rows (e.g. the Count-Min
    * sketch's depth-d bucket rows) SLICE these two lanes into 32-bit
    * words instead of paying d digests per value — the standard
    * one-strong-hash-many-slices construction.
    */
  def md5Lanes(t: UTF8String): ArrayData = {
    val dig = md5Bytes(t)
    new GenericArrayData(Array[Long](md5Lane(dig, 8), md5Lane(dig, 0)))
  }

  /** 64-bit SimHash over a token array: per-token md5 lower lane (oracle-
    * replayable, see [[md5Lane]]), ±1 vote per bit, sign of the vote sum
    * becomes the bit.
    */
  def simhash64(arr: ArrayData): Long = {
    val votes = new Array[Int](64)
    val m = arr.numElements()
    var i = 0
    while (i < m) {
      if (!arr.isNullAt(i)) {
        val h = md5Lane(md5Bytes(arr.getUTF8String(i)), 8)
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
          b += 1
        }
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) {
      if (votes(b) > 0) out |= (1L << b)
      b += 1
    }
    out
  }
}

/** `word_shingles(text, n)`: array of word n-grams of the normalized text. */
case class WordShingles(child: Expression, n: Int)
    extends UnaryExpression with ExpectsInputTypes {
  require(n >= 1, s"word_shingles n must be >= 1, got $n")
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def nullSafeEval(t: Any): Any =
    TextSketch.shingles(t.asInstanceOf[UTF8String], n)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"org.apache.spark.sql.graft.TextSketch.shingles($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): WordShingles =
    copy(child = newChild)
}

/** `word_shingle_hashes(text, n)`: distinct xxhash64 of each word n-gram. */
case class WordShingleHashes(child: Expression, n: Int)
    extends UnaryExpression with ExpectsInputTypes {
  require(n >= 1, s"word_shingle_hashes n must be >= 1, got $n")
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(t: Any): Any =
    TextSketch.shingleHashes(t.asInstanceOf[UTF8String], n)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"org.apache.spark.sql.graft.TextSketch.shingleHashes($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): WordShingleHashes =
    copy(child = newChild)
}

/** `word_shingle_lanes(text, n)`: ordered md5-lower-lane per word n-gram —
  * element i is the hash of the window starting at word i, duplicates kept.
  */
case class WordShingleLanes(child: Expression, n: Int)
    extends UnaryExpression with ExpectsInputTypes {
  require(n >= 1, s"word_shingle_lanes n must be >= 1, got $n")
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(t: Any): Any =
    TextSketch.shingleLanes(t.asInstanceOf[UTF8String], n)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"org.apache.spark.sql.graft.TextSketch.shingleLanes($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): WordShingleLanes =
    copy(child = newChild)
}

/** `md5_lanes(s)`: both 64-bit md5 lanes of a string as [lower, upper]
  * (DuckDB `md5_number_lower` / `md5_number_upper`).
  */
case class Md5Lanes(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(t: Any): Any =
    TextSketch.md5Lanes(t.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"org.apache.spark.sql.graft.TextSketch.md5Lanes($c)")

  override protected def withNewChildInternal(newChild: Expression): Md5Lanes =
    copy(child = newChild)
}

/** `winnow(text, n, w)`: winnowed k-gram fingerprint sketch. */
case class Winnow(child: Expression, n: Int, w: Int)
    extends UnaryExpression with ExpectsInputTypes {
  require(n >= 1 && w >= 1, s"winnow needs n >= 1 and w >= 1, got n=$n w=$w")
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(t: Any): Any =
    TextSketch.winnow(t.asInstanceOf[UTF8String], n, w)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"org.apache.spark.sql.graft.TextSketch.winnow($c, $n, $w)")

  override protected def withNewChildInternal(newChild: Expression): Winnow =
    copy(child = newChild)
}

/** `minhash_sig(shingles, k)`: k-long MinHash signature. */
case class MinHashSig(child: Expression, k: Int)
    extends UnaryExpression with ExpectsInputTypes {
  require(k >= 1, s"minhash_sig k must be >= 1, got $k")
  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(arr: Any): Any =
    TextSketch.minhashSig(arr.asInstanceOf[ArrayData], k)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"org.apache.spark.sql.graft.TextSketch.minhashSig($c, $k)")

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}

/** `simhash64(tokens)`: 64-bit SimHash of a token array. */
case class SimHash64(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = LongType

  override def nullSafeEval(arr: Any): Any =
    TextSketch.simhash64(arr.asInstanceOf[ArrayData])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"org.apache.spark.sql.graft.TextSketch.simhash64($c)")

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

/** `text_stats(text)`: all per-document text signals in one character pass —
  * struct(s_en, s_fr, s_de, s_es, ws_tokens, bpe_tokens, n_punct), each the
  * exact value of the corresponding regex formulation. Consumers project
  * fields off ONE shared call; whole-stage codegen's subexpression
  * elimination evaluates it once per row however many fields are read.
  */
case class TextStats(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = StructType(Seq(
    StructField("s_en", LongType, nullable = false),
    StructField("s_fr", LongType, nullable = false),
    StructField("s_de", LongType, nullable = false),
    StructField("s_es", LongType, nullable = false),
    StructField("ws_tokens", LongType, nullable = false),
    StructField("bpe_tokens", LongType, nullable = false),
    StructField("n_punct", LongType, nullable = false)))

  override def nullSafeEval(t: Any): Any =
    TextSketch.textStats(t.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"org.apache.spark.sql.graft.TextSketch.textStats($c)")

  override protected def withNewChildInternal(newChild: Expression): TextStats =
    copy(child = newChild)
}

/** `sig_agreement(a, b)`: fraction of agreeing positions of two equal-length
  * long signatures — the MinHash Jaccard estimate. Codegen'd (the
  * `aggregate(zip_with(...))` HOF formulation runs interpreted per element
  * per candidate pair). NULL on length mismatch or empty signatures, so
  * malformed sketches fail loudly rather than skewing dedup decisions.
  */
case class SigAgreement(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(LongType), ArrayType(LongType))
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements() || n == 0) return null
    var agree = 0
    var i = 0
    while (i < n) {
      // a null slot is a malformed signature — fail loudly (NULL), don't
      // let getLong's 0-for-null count as agreement
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      if (x.getLong(i) == y.getLong(i)) agree += 1
      i += 1
    }
    agree.toDouble / n
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val agree = ctx.freshName("agree")
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements() || $n == 0) {
         |  ${ev.isNull} = true;
         |} else {
         |  int $agree = 0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    if ($a.getLong($i) == $b.getLong($i)) $agree++;
         |  }
         |  if (!${ev.isNull}) {
         |    ${ev.value} = (double) $agree / $n;
         |  }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SigAgreement =
    copy(left = newLeft, right = newRight)
}

object TextColumns {
  def wordShingles(text: Column, n: Int): Column =
    ExpressionUtils.column(WordShingles(ExpressionUtils.expression(text), n))

  def wordShingleHashes(text: Column, n: Int): Column =
    ExpressionUtils.column(WordShingleHashes(ExpressionUtils.expression(text), n))

  def wordShingleLanes(text: Column, n: Int): Column =
    ExpressionUtils.column(WordShingleLanes(ExpressionUtils.expression(text), n))

  def md5Lanes(s: Column): Column =
    ExpressionUtils.column(Md5Lanes(ExpressionUtils.expression(s)))

  def winnow(text: Column, n: Int, w: Int): Column =
    ExpressionUtils.column(Winnow(ExpressionUtils.expression(text), n, w))

  def minhashSig(shingles: Column, k: Int): Column =
    ExpressionUtils.column(MinHashSig(ExpressionUtils.expression(shingles), k))

  def simhash64(tokens: Column): Column =
    ExpressionUtils.column(SimHash64(ExpressionUtils.expression(tokens)))

  def sigAgreement(a: Column, b: Column): Column =
    ExpressionUtils.column(SigAgreement(
      ExpressionUtils.expression(a), ExpressionUtils.expression(b)))

  def textStats(text: Column): Column =
    ExpressionUtils.column(TextStats(ExpressionUtils.expression(text)))
}
