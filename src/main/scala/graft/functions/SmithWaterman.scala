package graft.functions

/** Affine-gap local alignment (Smith-Waterman) against a fixed query
  * sequence, reporting the optimal score and the query-coordinate span of
  * the optimal alignment — the subset of skbio's `StripedSmithWaterman`
  * surface the reference consumes (amplicon.py:58-69: `query_begin`,
  * `query_end`, alignment length).
  *
  * Scoring matches skbio defaults: match +2, mismatch −3, gap open 5,
  * gap extend 2 (first gap residue costs `gapOpen`, each further residue
  * `gapExtend`). Case-insensitive, like the reference's use (lowercase 16S
  * query vs uppercase ASVs).
  *
  * Complexity O(|query|·|target|) with two rolling int rows — ~0.4M cells
  * for a 1.5 kb 16S query × 250 bp ASV, microseconds on a JVM core. Used
  * inside `mapGroups` (per-project data is small; parallelism comes from
  * the project dimension), so it never blocks whole-stage codegen of the
  * relational plan around it.
  *
  * Tie-breaking: when several alignments share the optimal score the span
  * with the smallest (queryEnd, targetEnd) is reported; SSW's C kernel
  * scans in the same order, but exact tie behavior is undocumented —
  * a documented divergence risk with no effect on majority votes.
  */
object SmithWaterman {

  final case class Alignment(queryBegin: Int, queryEnd: Int, score: Int)

  final class Profile(querySeq: String,
      matchScore: Int = 2, mismatchScore: Int = -3,
      gapOpen: Int = 5, gapExtend: Int = 2) {

    private val q: Array[Byte] = querySeq.toUpperCase.getBytes("US-ASCII")
    private val n = q.length

    /** Align `target` against the fixed query; Alignment(-1,-1,0) when no
      * positive-scoring local alignment exists.
      */
    def align(targetSeq: String): Alignment = {
      val t = targetSeq.toUpperCase.getBytes("US-ASCII")
      val m = t.length
      if (n == 0 || m == 0) return Alignment(-1, -1, 0)

      // H: best score ending at (i,j); E: gap in target (consume query);
      // F: gap in query (consume target). Rolling rows over the query dim.
      val hPrev = new Array[Int](n + 1)
      val hCur = new Array[Int](n + 1)
      val ePrev = new Array[Int](n + 1) // E is column-wise (vertical), keep per query idx
      var best = 0
      var bestQEnd = -1
      var bestTEnd = -1

      var j = 1
      while (j <= m) {
        var f = 0
        val tc = t(j - 1)
        var i = 1
        while (i <= n) {
          val diag = hPrev(i - 1) + (if (q(i - 1) == tc) matchScore else mismatchScore)
          val e = math.max(ePrev(i) - gapExtend, hPrev(i) - gapOpen)
          f = math.max(f - gapExtend, hCur(i - 1) - gapOpen)
          var h = math.max(0, diag)
          if (e > h) h = e
          if (f > h) h = f
          hCur(i) = h
          ePrev(i) = e
          if (h > best) { best = h; bestQEnd = i - 1; bestTEnd = j - 1 }
          i += 1
        }
        System.arraycopy(hCur, 0, hPrev, 0, n + 1)
        j += 1
      }
      if (best == 0) return Alignment(-1, -1, 0)

      // Traceback-free begin recovery: re-run the DP on the reversed
      // prefixes ending at the optimum; the end of the reverse alignment is
      // the begin of the forward one (standard SSW technique).
      val qr = new Array[Byte](bestQEnd + 1)
      var k = 0
      while (k <= bestQEnd) { qr(k) = q(bestQEnd - k); k += 1 }
      val tr = new Array[Byte](bestTEnd + 1)
      k = 0
      while (k <= bestTEnd) { tr(k) = t(bestTEnd - k); k += 1 }
      val rev = alignEndOnly(qr, tr)
      Alignment(bestQEnd - rev, bestQEnd, best)
    }

    /** Forward-only DP returning the query index (0-based, in the given
      * arrays) where the best score ends.
      */
    private def alignEndOnly(qa: Array[Byte], ta: Array[Byte]): Int = {
      val nn = qa.length; val mm = ta.length
      val hPrev = new Array[Int](nn + 1)
      val hCur = new Array[Int](nn + 1)
      val ePrev = new Array[Int](nn + 1)
      var best = 0
      var bestQ = 0
      var j = 1
      while (j <= mm) {
        var f = 0
        val tc = ta(j - 1)
        var i = 1
        while (i <= nn) {
          val diag = hPrev(i - 1) + (if (qa(i - 1) == tc) matchScore else mismatchScore)
          val e = math.max(ePrev(i) - gapExtend, hPrev(i) - gapOpen)
          f = math.max(f - gapExtend, hCur(i - 1) - gapOpen)
          var h = math.max(0, diag)
          if (e > h) h = e
          if (f > h) h = f
          hCur(i) = h
          ePrev(i) = e
          if (h > best) { best = h; bestQ = i - 1 }
          i += 1
        }
        System.arraycopy(hCur, 0, hPrev, 0, nn + 1)
        j += 1
      }
      bestQ
    }
  }
}
