package graft.functions

import graft.functions.Portable.h60Scala

/** JVM-side typed kernels shared by the pipeline operators' mapPartitions
  * stages (d02–d10 shingling, d04 SimHash, t04 fingerprints, t05
  * repetition).
  *
  * Why kernels and not column expressions: Spark's higher-order functions
  * are evaluated interpretively, and CollapseProject inlines a derived
  * array into every consumer — an expensive derivation feeding `explode`
  * or `element_at` re-runs PER OUTPUT ROW (measured 40× at sf0.1), and a
  * per-token interpreted md5 costs ~100× its JVM twin. Each kernel here
  * runs the O(|text|) work exactly once per document in straight JVM code;
  * semantics are pinned to the DuckDB oracle's formulation (see each
  * function's note), so the hash-compare correctness gate still verifies
  * every operator built on them.
  */
object Kernels {

  /** Whitespace tokenization — the exact twin of the oracle's
    * `list_filter(string_split(trim(regexp_replace(lower(text),'\s+',' ','g')),' '), t -> t <> '')`
    * when fed pre-lowered text: a manual scan over the regex-`\s` character
    * set (Java and RE2 agree: [ \t\n\x0B\f\r]) — NOT Character.isWhitespace,
    * which adds unicode separators the oracle's regexp would keep.
    * String.split is avoided because it compiles its regex per call, which
    * showed up at millions of documents.
    */
  def tokenize(text: String): Array[String] = {
    def ws(c: Char): Boolean =
      c == ' ' || c == '\t' || c == '\n' || c == '\u000B' || c == '\f' || c == '\r'
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    val n = text.length
    var i = 0
    while (i < n) {
      while (i < n && ws(text.charAt(i))) i += 1
      val start = i
      while (i < n && !ws(text.charAt(i))) i += 1
      if (i > start) out += text.substring(start, i)
    }
    out.toArray
  }

  /** Space-ONLY tokens of raw text, empties dropped, null ≡ empty doc —
    * the exact twin of the oracle's `string_split(text, ' ')` +
    * drop-empties (NOT [[tokenize]], whose full \s set would diverge on
    * tab/newline-bearing text). Every kernel that mirrors a `sqlToks`
    * oracle goes through here so no call site can forget the null guard
    * (a kernel NPE inside mapPartitions fails the whole task).
    */
  def spaceTokens(text: String): Array[String] =
    (if (text == null) "" else text).split(" ").filter(_.nonEmpty)

  /** Lower-cased whitespace tokens of raw text — the shared first step of
    * every document kernel (= the oracle's normalize-then-split). NULL
    * text tokenizes as the empty document: the synthetic tables carry no
    * nulls, but a crawl's do, and a kernel NPE inside mapPartitions
    * fails the whole task (the column-expression queries are already
    * null-propagating on both engines; this is the typed paths' twin of
    * that contract).
    */
  def lowerTokens(text: String): Array[String] =
    if (text == null) Array.empty
    else tokenize(text.toLowerCase(java.util.Locale.ROOT))

  /** The word as single-CODEPOINT strings — the shared segmentation atom
    * of t22 (pair counting), t25 (merge application), and t39 (fertility
    * character counts). Codepoints, not UTF-16 units, because the DuckDB
    * oracle's `string_split(w, '')` / `len()` / `substr()` all count
    * codepoints: a supplementary character (emoji, CJK extension B) must
    * be ONE atom on both engines, never a surrogate pair split in half.
    */
  def codepointAtoms(word: String): Array[String] = {
    val n = word.codePointCount(0, word.length)
    val a = new Array[String](n)
    var i = 0
    var k = 0
    while (i < word.length) {
      val next = word.offsetByCodePoints(i, 1)
      a(k) = word.substring(i, next)
      i = next
      k += 1
    }
    a
  }

  /** Adjacent codepoint pairs inside a word — t22's merge candidates,
    * on the same codepoint basis as [[codepointAtoms]]. Empty for words
    * shorter than two codepoints.
    */
  def codepointPairs(word: String): Iterator[String] = {
    val atoms = codepointAtoms(word)
    (0 until atoms.length - 1).iterator.map(i => atoms(i) + atoms(i + 1))
  }

  /** Greedy BPE merge application (t25): start from the word's
    * CODEPOINTS ([[codepointAtoms]] — the oracle's string_split basis),
    * then for each 2-codepoint merge pair in RANK ORDER run one
    * left-to-right non-overlapping pass replacing adjacent singleton
    * tokens (x, y) with the merged token xy — exactly the semantics of
    * a sequential `replace()` on a token-delimited string, which is how
    * the DuckDB oracle computes the same segmentation (the t25
    * kernel↔oracle property pins the equivalence). Merges from t22 are
    * always codepoint pairs, so merged tokens are 2 codepoints long and
    * never themselves merge-eligible — the honest scope of applying
    * FIRST-ROUND pair statistics (true BPE would recount pairs after
    * every merge; t22/t25 price the first K merges of round one).
    */
  def bpeApply(word: String, merges: Array[String]): Array[String] = {
    var toks: Array[String] = codepointAtoms(word)
    var mi = 0
    while (mi < merges.length) {
      val m = merges(mi)
      val cut = m.offsetByCodePoints(0, 1)
      val x = m.substring(0, cut)
      val y = m.substring(cut)
      val b = Array.newBuilder[String]
      var i = 0
      while (i < toks.length) {
        if (i + 1 < toks.length && toks(i) == x && toks(i + 1) == y) {
          b += m; i += 2
        } else { b += toks(i); i += 1 }
      }
      toks = b.result()
      mi += 1
    }
    toks
  }

  /** One greedy left-to-right non-overlapping merge pass replacing every
    * adjacent token pair (x, y) with the merged token xy — the per-round
    * step of ITERATED BPE training (t42), where unlike [[bpeApply]]'s
    * first-round scope the inputs are arbitrary already-merged tokens,
    * not single codepoints. Exactly the semantics of one `replace()` on
    * the token-delimited string form (the DuckDB oracle's formulation,
    * pinned by the t25 kernel↔oracle equivalence): scan left to right,
    * consume both tokens on a match, never rescan the merged output —
    * so [a,a,a] under (a,a) yields [aa,a] on both engines.
    */
  def mergePass(toks: Array[String], x: String, y: String): Array[String] = {
    val b = Array.newBuilder[String]
    var i = 0
    while (i < toks.length) {
      if (i + 1 < toks.length && toks(i) == x && toks(i + 1) == y) {
        b += (x + y); i += 2
      } else { b += toks(i); i += 1 }
    }
    b.result()
  }

  /** Distinct word-trigram 60-bit shingle hashes of a token array. Twin of
    * `list_distinct(list_transform(range(1, len(toks)-1), i -> toks[i] || ' ' || ...))`
    * hashed with h60; empty when the document has fewer than 3 tokens.
    */
  def shingles(toks: Array[String]): Array[Long] = {
    if (toks.length < 3) Array.emptyLongArray
    else {
      val seen = new java.util.LinkedHashSet[String](toks.length * 2)
      var i = 0
      while (i <= toks.length - 3) {
        seen.add(toks(i) + " " + toks(i + 1) + " " + toks(i + 2))
        i += 1
      }
      val out = new Array[Long](seen.size)
      val jt = seen.iterator()
      var k = 0
      while (jt.hasNext) { out(k) = h60Scala(jt.next()); k += 1 }
      out
    }
  }

  /** Minimum word-trigram shingle hash (t04's fp_min_shingle): the min of
    * h60 over the distinct trigrams — distinctness is irrelevant to a min,
    * but the dedupe set still pays: set membership is cheaper than the md5
    * it skips on repetitive text. None when fewer than 3 tokens (the twin
    * of `list_aggregate([], 'min')` = NULL).
    */
  def minShingle(toks: Array[String]): Option[Long] = {
    if (toks.length < 3) None
    else {
      val seen = new java.util.HashSet[String](toks.length * 2)
      var mn = Long.MaxValue
      var i = 0
      while (i <= toks.length - 3) {
        val g = toks(i) + " " + toks(i + 1) + " " + toks(i + 2)
        if (seen.add(g)) {
          val h = h60Scala(g)
          if (h < mn) mn = h
        }
        i += 1
      }
      Some(mn)
    }
  }

  /** 60-bit term-frequency SimHash of pre-lowered tokens (d04): hash-map
    * term counts, then one 60-lane weighted vote per distinct term —
    * O(|doc| + 60·|types|) total, where the column-expression formulation
    * (`size(filter(toks, t -> t = x))` per distinct token) is
    * O(|types|·|tokens|) interpreted comparisons plus an interpreted md5
    * per type (93 s → the whole operator now rides the parquet scan).
    * Semantics twin: vote_b = Σ_types cnt · ((h60(type) >> b & 1)·2 − 1),
    * bit b set iff vote_b > 0 — iteration order is irrelevant because
    * integer addition commutes, so the HashMap walk is safe.
    */
  def simhash60(toks: Array[String]): Long = {
    val counts = new java.util.HashMap[String, Int]()
    var i = 0
    while (i < toks.length) { counts.merge(toks(i), 1, Integer.sum); i += 1 }
    val votes = new Array[Long](60)
    counts.forEach { (tok, c) =>
      val h = h60Scala(tok)
      val cl = c.toLong
      var b = 0
      while (b < 60) {
        votes(b) += cl * (((h >>> b) & 1L) * 2L - 1L)
        b += 1
      }
    }
    var sig = 0L
    var b = 0
    while (b < 60) { if (votes(b) > 0L) sig |= 1L << b; b += 1 }
    sig
  }

  /** Integer lexical-diversity moments of a token array (t12): token
    * count, type count, Σ count², hapax (count-1 type) count — one
    * hash-map pass, O(|doc|). All four are exact integers, so every
    * derived diversity index (Gini–Simpson numerator n²−Σc², repeat mass
    * n−types, TTR) is bit-portable with no transcendental in sight; the
    * oracle's O(types·tokens) `list_filter` recount is affordable there
    * because the oracle only ever runs at gate scale.
    */
  def diversityMoments(toks: Array[String]): (Long, Long, Long, Long) = {
    val counts = new java.util.HashMap[String, Int]()
    var i = 0
    while (i < toks.length) { counts.merge(toks(i), 1, Integer.sum); i += 1 }
    var sq = 0L
    var hapax = 0L
    val it = counts.values().iterator()
    while (it.hasNext) {
      val c = it.next().toLong
      sq += c * c
      if (c == 1L) hapax += 1L
    }
    (toks.length.toLong, counts.size.toLong, sq, hapax)
  }

  /** Per-vector symmetric int8 quantization (s11): scale amax = max|xᵢ|
    * (pure selection over exact float→double widenings — no arithmetic,
    * so amax carries the float32 bit pattern), code_i =
    * floor(xᵢ·127/amax + 0.5) ∈ [−127, 127], and the per-dimension
    * absolute reconstruction error |code·amax/127 − xᵢ|. Every IEEE op
    * runs in pinned left-to-right order ((x·127)/amax, then
    * (code·amax)/127) so the DuckDB oracle reproduces each double
    * bit-for-bit. A zero vector (amax = 0) quantizes to all-zero codes
    * with zero error. One pass, O(dim), no allocation beyond the
    * outputs — rides the parquet scan (the rule-11 alternative to a
    * per-row Catalyst HOF chain, which is CodegenFallback).
    */
  def int8Quant(v: Array[Float]): (Double, Array[Long], Array[Double]) = {
    var amax = 0.0
    var i = 0
    while (i < v.length) {
      val a = math.abs(v(i).toDouble)
      if (a > amax) amax = a
      i += 1
    }
    val codes = new Array[Long](v.length)
    val errs = new Array[Double](v.length)
    i = 0
    while (i < v.length) {
      val x = v(i).toDouble
      val c = if (amax == 0) 0L else math.floor(x * 127.0 / amax + 0.5).toLong
      codes(i) = c
      errs(i) = math.abs(c * amax / 127.0 - x)
      i += 1
    }
    (amax, codes, errs)
  }

  private val MhA: Array[Long] = Portable.MinHashCoeffs.map(_._1).toArray
  private val MhB: Array[Long] = Portable.MinHashCoeffs.map(_._2).toArray

  /** 30-permutation MinHash signature of a token array, or None when the
    * document has no trigram shingles — the JVM twin of the batch
    * formulation (d03/d14: `min((shingle % P) * a_k + b_k) % P` per
    * permutation over the exploded frame), bit-equal because both run
    * the same Long arithmetic over the same distinct shingle-hash set.
    * Used by the streaming near-dup frontier, where signatures must be
    * computed per arriving document rather than by a groupBy.
    */
  def minhashSig(toks: Array[String]): Option[Array[Long]] =
    minhashSigOf(shingles(toks))

  /** [[minhashSig]] from an already-computed distinct-shingle array — for
    * callers that also need the shingle COUNT (the containment stream's
    * exact set sizes) and must not pay the shingle pass twice.
    */
  def minhashSigOf(sh: Array[Long]): Option[Array[Long]] = {
    if (sh.isEmpty) None
    else {
      val sig = Array.fill(30)(Long.MaxValue)
      var i = 0
      while (i < sh.length) {
        val g = sh(i) % Portable.MinHashP
        var k = 0
        while (k < 30) {
          val v = (g * MhA(k) + MhB(k)) % Portable.MinHashP
          if (v < sig(k)) sig(k) = v
          k += 1
        }
        i += 1
      }
      Some(sig)
    }
  }

  /** Character-trigram counts of the d17-normalized text (lowercased
    * tokens joined by single spaces — the normText equivalence d01/d17
    * pin): one (trigram, count) pair per distinct trigram, empty when
    * the normalized text is shorter than 3 chars. DuckDB twin:
    * `list_transform(range(1, length(norm) - 1), i -> norm[i:i+2])`
    * counted per value.
    */
  def charTrigramCounts(text: String): Iterator[(String, Long)] = {
    val norm = lowerTokens(text).mkString(" ")
    if (norm.length < 3) Iterator.empty
    else {
      val counts = scala.collection.mutable.LinkedHashMap.empty[String, Long]
      var i = 0
      while (i + 3 <= norm.length) {
        val tg = norm.substring(i, i + 3)
        counts.update(tg, counts.getOrElse(tg, 0L) + 1L)
        i += 1
      }
      counts.iterator
    }
  }
}
