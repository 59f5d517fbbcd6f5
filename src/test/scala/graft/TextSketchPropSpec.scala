package graft

import org.apache.spark.sql.graft.TextSketch
import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Property tests for the sketch kernels — pure JVM functions, no Spark
  * session, so hundreds of generated cases (empty strings, exotic
  * whitespace, case noise) run in milliseconds. Generators are driven with
  * fixed seeds: failures reproduce.
  */
class TextSketchPropSpec extends AnyFunSuite {

  private val word = Gen.nonEmptyListOf(Gen.alphaNumChar).map(_.mkString)
  private val text = Gen.listOf(word).map(_.mkString(" "))
  private val ws = Gen.nonEmptyListOf(Gen.oneOf(' ', '\t', '\n')).map(_.mkString)

  private def u(s: String) = UTF8String.fromString(s)

  private def cases[A](g: Gen[A], n: Int = 300)(f: A => Unit): Unit =
    (0 until n).foreach { i =>
      g.apply(Gen.Parameters.default, Seed(i.toLong)).foreach(f)
    }

  test("shingle count is max(words - n + 1, 1) for any text") {
    cases(text) { s =>
      val words = s.trim.split("\\s+").filter(_.nonEmpty).length.max(1)
      val n = TextSketch.shingles(u(s), 3).numElements()
      assert(n === math.max(words - 2, 1), s"text=[$s]")
    }
  }

  test("shingles are whitespace-run and case invariant") {
    cases(Gen.zip(text, ws)) { case (s, pad) =>
      val messy = s.toUpperCase.replace(" ", pad)
      val a = TextSketch.shingles(u(s), 3)
      val b = TextSketch.shingles(u(messy), 3)
      assert(a.numElements() === b.numElements(), s"text=[$s] pad=[$pad]")
      (0 until a.numElements()).foreach { i =>
        assert(a.getUTF8String(i) === b.getUTF8String(i))
      }
    }
  }

  test("minhash signature: always k longs, order-free over the word set") {
    cases(Gen.nonEmptyListOf(word)) { words =>
      val sig = TextSketch.minhashSig(
        TextSketch.shingles(u(words.mkString(" ")), 1), 32)
      assert(sig.numElements() === 32)
      val rev = TextSketch.minhashSig(
        TextSketch.shingles(u(words.reverse.mkString(" ")), 1), 32)
      assert(sig.toLongArray.toSeq === rev.toLongArray.toSeq,
        "min over a multiset ignores order")
    }
  }

  test("winnow sketch is non-empty and a subset of the shingle hash set") {
    cases(text) { s =>
      if (s.trim.nonEmpty) {
        val sketch = TextSketch.winnow(u(s), 3, 4).toLongArray.toSet
        // the sketch draws from the md5-lane domain (oracle-replayable),
        // NOT the xxhash64 identity-hash domain of shingleHashes
        val sh = TextSketch.shingles(u(s), 3)
        val all = (0 until sh.numElements())
          .map(i => TextSketch.md5Lower(sh.getUTF8String(i))).toSet
        assert(sketch.nonEmpty, s"text=[$s]")
        assert(sketch.subsetOf(all), s"text=[$s]")
      }
    }
  }

  test("simhash is order-free over the token multiset") {
    cases(Gen.nonEmptyListOf(word)) { words =>
      val a = TextSketch.simhash64(TextSketch.shingles(u(words.mkString(" ")), 1))
      val b = TextSketch.simhash64(TextSketch.shingles(u(words.reverse.mkString(" ")), 1))
      assert(a === b)
    }
  }

  test("words replicate the SQL trim/split semantics on edge whitespace") {
    // DuckDB: regexp_split_to_array(trim(lower(s)), '\s+') — trim strips
    // SPACES only; edge tabs/newlines leave empty fields at the ends
    def w(s: String): Seq[String] = {
      val arr = TextSketch.shingles(u(s), 1)
      (0 until arr.numElements()).map(arr.getUTF8String(_).toString)
    }
    assert(w("foo bar") === Seq("foo", "bar"))
    assert(w("  foo bar  ") === Seq("foo", "bar"), "space trim")
    assert(w("foo\n") === Seq("foo", ""), "trailing newline keeps empty field")
    assert(w("\tfoo") === Seq("", "foo"), "leading tab keeps empty field")
    assert(w("") === Seq(""), "empty text is one empty field")
    assert(w(" \n ") === Seq("", ""), "whitespace-only after space trim")
  }

  test("textStats single pass equals every regex formulation it replaced") {
    import java.util.regex.Pattern
    val langs = Seq(
      "\\b(the|and|of|to|in|is)\\b", "\\b(le|la|les|de|et|une)\\b",
      "\\b(der|die|und|das|ist|ein)\\b", "\\b(el|los|y|que|como|un)\\b")
      .map(Pattern.compile)
    val punctP = Pattern.compile("[^A-Za-z0-9\\s]")
    val bpeP = Pattern.compile("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]")
    def count(p: Pattern, s: String): Long = {
      val m = p.matcher(s); var n = 0L; while (m.find()) n += 1; n
    }
    // adversarial alphabet: marker words, marker substrings inside words,
    // underscores (\w but "punct"), digits, mixed whitespace, punctuation,
    // and non-BMP code points (surrogate pairs: emoji, CJK-ext) — Java
    // regex counts a pair as ONE code point, so the single-pass scan must too
    val token = Gen.oneOf(
      word, Gen.oneOf("the", "de", "und", "los", "une", "is", "y"),
      Gen.oneOf("theory", "then", "in_x", "de2", "_the_", "42", "a-b", "c'est"),
      Gen.oneOf("!", "...", "a,b", "(x)"),
      Gen.oneOf("😀", "𠜎", "a😀b",
        "the🎉", "😀😁", "café"))
    val messy = Gen.zip(
      Gen.listOf(Gen.zip(token,
        Gen.oneOf(" ", "  ", "\t", "\n", " \t "))),
      Gen.oneOf("", " ", "\t", "  "))
      .map { case (ps, lead) => lead + ps.map(p => p._1 + p._2).mkString }
    cases(messy, n = 500) { s =>
      val st = TextSketch.textStats(u(s))
      langs.zipWithIndex.foreach { case (p, i) =>
        assert(st.getLong(i) === count(p, s), s"lang $i text=[$s]")
      }
      val trimmed = {
        var b = 0; var e = s.length
        while (b < e && s.charAt(b) == ' ') b += 1
        while (e > b && s.charAt(e - 1) == ' ') e -= 1
        s.substring(b, e)
      }
      assert(st.getLong(4) === trimmed.split("\\s+", -1).length.toLong,
        s"ws_tokens text=[$s]")
      assert(st.getLong(5) === count(bpeP, s), s"bpe text=[$s]")
      assert(st.getLong(6) === count(punctP, s), s"punct text=[$s]")
    }
  }

  test("bucketOf binary search equals the linear count of cuts below v") {
    import org.apache.spark.sql.graft.BucketKernels
    val cutsG = Gen.nonEmptyListOf(Gen.chooseNum(-1000.0, 1000.0))
      .map(_.distinct.sorted.toArray)
    cases(Gen.zip(cutsG, Gen.chooseNum(-1500.0, 1500.0))) { case (cuts, v) =>
      val expected = cuts.count(c => v > c)
      assert(BucketKernels.bucketOf(v, cuts) === expected,
        s"v=$v cuts=${cuts.mkString(",")}")
    }
    // boundary: v equal to a cut goes LEFT (v > c is false)
    assert(BucketKernels.bucketOf(5.0, Array(1.0, 5.0, 9.0)) === 1)
    assert(BucketKernels.bucketOf(0.0, Array.empty[Double]) === 0)
  }

  test("textStats counts a non-BMP char (surrogate pair) as one code point") {
    // 😀 = 😀: one punct + one bpe token, a word boundary for the
    // marker-word scorer, part of ONE ws-token run
    val st = TextSketch.textStats(u("the 😀 end"))
    assert(st.getLong(0) === 1L, "s_en: 'the' scores once")
    assert(st.getLong(4) === 3L, "ws_tokens")
    assert(st.getLong(5) === 3L, "bpe: the + emoji + end")
    assert(st.getLong(6) === 1L, "n_punct: emoji counts ONCE, not per half")
    // inside a word run it splits the run like any non-word char
    val st2 = TextSketch.textStats(u("the😀the"))
    assert(st2.getLong(0) === 2L, "emoji is a \\b boundary: both 'the's score")
    assert(st2.getLong(6) === 1L)
    // a lone (unpaired) high surrogate is still one char = one code point
    val st3 = TextSketch.textStats(u("a\uD83Db"))
    assert(st3.getLong(6) === 1L, "lone surrogate counts once")
  }
}
