package graft.operators

import graft.Session
import org.scalatest.funsuite.AnyFunSuite

/** [[BpeIndex]]'s trainer against a NAIVE list-based reference BPE —
  * independent data structures (symbol vectors vs the double-space
  * string render), same published semantics — plus the artifact
  * roundtrip and segmentation identities. The adjacency fixture
  * ("abab") is the case the single-delimiter string trick silently
  * gets wrong; pinning it here is what licenses the DuckDB oracle's
  * string-rewrite replay in l79.
  */
class BpeIndexSpec extends AnyFunSuite {

  // ---- naive reference: list-based, leftmost non-overlapping merges
  private def mergeList(v: Vector[String], l: String, r: String): Vector[String] = {
    val b = Vector.newBuilder[String]
    var i = 0
    while (i < v.length) {
      if (i < v.length - 1 && v(i) == l && v(i + 1) == r) { b += l + r; i += 2 }
      else { b += v(i); i += 1 }
    }
    b.result()
  }

  private def naiveTrain(dict: Seq[(String, Long)], m: Int): Seq[String] = {
    var segs = dict.collect {
      case (t, c) if t.length >= 2 => (t.map(_.toString).toVector, c)
    }
    val out = scala.collection.mutable.ArrayBuffer[String]()
    var stop = false
    while (out.size < m && !stop) {
      val counts = scala.collection.mutable.HashMap.empty[(String, String), Long]
      for ((v, c) <- segs; i <- 0 until v.length - 1)
        counts((v(i), v(i + 1))) = counts.getOrElse((v(i), v(i + 1)), 0L) + c
      if (counts.isEmpty) stop = true
      else {
        val (l, r) = counts.minBy { case ((l, r), n) => (-n, l + " " + r) }._1
        out += s"$l $r"
        segs = segs.map { case (v, c) => (mergeList(v, l, r), c) }
      }
    }
    out.toSeq
  }

  private def naiveSegment(tok: String, merges: Seq[String]): Seq[String] = {
    if (tok.length < 2) return Seq(tok)
    var v = tok.map(_.toString).toVector
    for (p <- merges) {
      val Array(l, r) = p.split(" ", 2)
      v = mergeList(v, l, r)
    }
    v
  }

  private def check(dict: Seq[(String, Long)], m: Int, tag: String): Unit = {
    val got = BpeIndex.trainFromDict(dict, m)
    val want = naiveTrain(dict, m)
    assert(got === want, s"$tag: merge lists diverge")
    for ((t, _) <- dict) {
      assert(BpeIndex.segment(t, got) === naiveSegment(t, want),
        s"$tag: segmentation of '$t' diverges")
      assert(BpeIndex.segment(t, got).mkString === t,
        s"$tag: segments of '$t' must concatenate back to the word")
    }
  }

  test("Sennrich-style fixture: merges and segmentations match the " +
      "naive list-based reference") {
    check(Seq("low" -> 5L, "lower" -> 2L, "newest" -> 6L, "widest" -> 3L),
      m = 10, tag = "sennrich")
  }

  test("adjacency fixture: both (a,b) occurrences of 'abab' merge in " +
      "ONE rank application (the single-delimiter string trick drops " +
      "the second)") {
    val dict = Seq("abab" -> 3L, "ab" -> 2L)
    check(dict, m = 3, tag = "abab")
    val merges = BpeIndex.trainFromDict(dict, 1)
    assert(merges === Seq("a b"))
    assert(BpeIndex.segment("abab", merges) === Seq("ab", "ab"))
  }

  test("overlap fixture: 'aaa' merges leftmost-first ([aa, a])") {
    val merges = Seq("a a")
    assert(BpeIndex.segment("aaa", merges) === Seq("aa", "a"))
    assert(BpeIndex.segment("aaaa", merges) === Seq("aa", "aa"))
  }

  test("tie-break is (count desc, pair asc) — deterministic on equal " +
      "counts") {
    // 'dc' and 'ba' each occur twice; 'ba' < 'dc' lexicographically
    val dict = Seq("ba" -> 2L, "dc" -> 2L)
    assert(BpeIndex.trainFromDict(dict, 1) === Seq("b a"))
  }

  test("early stop: fewer pairs than the merge budget ends the list") {
    val dict = Seq("ab" -> 1L)
    // merge 1 = (a,b); after it 'ab' is a single symbol - no pairs left
    assert(BpeIndex.trainFromDict(dict, 5) === Seq("a b"))
  }

  test("non-positive word counts are rejected loudly — the incremental " +
      "maintenance's drained-to-zero ≡ no-remaining-holder invariant " +
      "needs positive frequencies") {
    // a zero-count holder of a pair drained by positive-count words
    // would re-read the removed key (NoSuchElementException at best,
    // silent divergence from a full recount at worst)
    val e = intercept[IllegalArgumentException] {
      BpeIndex.trainFromDict(Seq("xy" -> 1L, "xyz" -> 0L), 2)
    }
    assert(e.getMessage.contains("positive"))
  }

  test("seeded random dicts: string-render trainer equals the naive " +
      "reference on 60 corpora") {
    val rnd = new scala.util.Random(14)
    for (k <- 0 until 60) {
      val dict = (0 until (2 + rnd.nextInt(8))).map { _ =>
        val len = 1 + rnd.nextInt(6)
        (Vector.fill(len)(('a' + rnd.nextInt(3)).toChar).mkString,
          (1 + rnd.nextInt(9)).toLong)
      }.groupBy(_._1).map { case (t, xs) => t -> xs.map(_._2).sum }.toSeq
      check(dict, m = 1 + rnd.nextInt(6), tag = s"random#$k")
    }
  }

  test("seeded random dicts, larger regime: the INCREMENTAL trainer " +
      "(round-15 pair-count maintenance) equals the naive full-recount " +
      "reference on 60 bigger corpora with deep merge chains") {
    val rnd = new scala.util.Random(15)
    for (k <- 0 until 60) {
      val dict = (0 until (5 + rnd.nextInt(25))).map { _ =>
        val len = 1 + rnd.nextInt(10)
        (Vector.fill(len)(('a' + rnd.nextInt(4)).toChar).mkString,
          (1 + rnd.nextInt(20)).toLong)
      }.groupBy(_._1).map { case (t, xs) => t -> xs.map(_._2).sum }.toSeq
      // deep budgets force merges whose pair statistics exist only
      // through incremental updates (symbols created by prior merges)
      check(dict, m = 4 + rnd.nextInt(12), tag = s"random-big#$k")
    }
  }

  test("artifact roundtrip: write/read preserves the rank-ordered " +
      "merge list, and the applied segment map follows the artifact") {
    val spark = Session.get()
    val dict = Seq("low" -> 5L, "lower" -> 2L, "newest" -> 6L, "widest" -> 3L)
    val merges = BpeIndex.trainFromDict(dict, 6)
    val base = java.nio.file.Files.createTempDirectory("graft_bpe_").toString
    BpeIndex.write(spark, merges, base)
    assert(BpeIndex.read(spark, base) === merges)
    val m = BpeIndex.segmentMap(dict.map(_._1), merges)
    for ((t, _) <- dict)
      assert(m(t) === BpeIndex.segment(t, merges).size.toLong)
  }
}
