package graft

import graft.operators.BpeIndex

/** BPE-trainer benchmark — prices the round-15 incremental pair-count
  * maintenance ([[operators.BpeIndex.trainFromDict]]) against the
  * full-rescan form it replaced (reimplemented here verbatim as the
  * reference), on a seeded synthetic dictionary big enough for the
  * asymptotic gap to show. The rescan form recounts every pair over
  * all V words per merge — O(V·M); the incremental form touches only
  * the words containing the merged pair. BpeIndexSpec pins the two
  * byte-identical on 120 seeded dictionaries; this records what the
  * identity SAVES.
  *
  * Usage: runMain graft.BenchBpe  (driver-side only — no Spark session;
  * SPARK_GRAFT_BPE_V / _M override the dictionary and merge sizes)
  */
object BenchBpe {

  /** The retired O(V·M) trainer, kept verbatim as the pricing
    * reference (same argmax, same string-render rewrite). */
  private def trainRescan(dict: Seq[(String, Long)], m: Int): Seq[String] = {
    def render(tok: String) = "  " + tok.toCharArray.mkString("  ") + "  "
    def applyMerge(seg: String, pair: String) =
      seg.replace(" " + pair.replace(" ", "  ") + " ",
        " " + pair.replace(" ", "") + " ")
    var segs = dict.collect {
      case (t, c) if t.codePointCount(0, t.length) >= 2 => (render(t), c)
    }
    val merges = scala.collection.mutable.ArrayBuffer[String]()
    var done = false
    while (merges.size < m && !done) {
      val counts = scala.collection.mutable.HashMap.empty[String, Long]
      for ((s, c) <- segs) {
        val syms = s.trim.split("  ")
        var i = 0
        while (i < syms.length - 1) {
          val p = syms(i) + " " + syms(i + 1)
          counts(p) = counts.getOrElse(p, 0L) + c
          i += 1
        }
      }
      if (counts.isEmpty) done = true
      else {
        val pair = counts.minBy { case (p, n) => (-n, p) }._1
        merges += pair
        segs = segs.map { case (s, c) => (applyMerge(s, pair), c) }
      }
    }
    merges.toSeq
  }

  def main(args: Array[String]): Unit = {
    val v = sys.env.getOrElse("SPARK_GRAFT_BPE_V", "50000").toInt
    val m = sys.env.getOrElse("SPARK_GRAFT_BPE_M", "1000").toInt
    val rnd = new scala.util.Random(15)
    // zipf-ish counts over random ASCII words — the Heaps-bounded
    // V-row dictionary shape wordDict exports
    val dict = (0 until v).map { i =>
      val len = 2 + rnd.nextInt(11)
      val w = Array.fill(len)(('a' + rnd.nextInt(26)).toChar).mkString
      (w, (v.toDouble / (i + 1)).toLong.max(1L))
    }.groupBy(_._1).map { case (t, xs) => t -> xs.map(_._2).sum }.toSeq

    def secs(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    // warm both
    BpeIndex.trainFromDict(dict.take(2000), 50)
    trainRescan(dict.take(2000), 50)

    val tInc = secs { BpeIndex.trainFromDict(dict, m) }
    // the rescan reference at full size can run minutes; time it on a
    // 1/10 slice and report both raw and the V-scaled ratio honestly
    val slice = dict.take(v / 10)
    val tRescanSlice = secs { trainRescan(slice, m) }
    val same = BpeIndex.trainFromDict(slice, m) == trainRescan(slice, m)

    def r3(x: Double) =
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(x))
    println(s"""{"metric":"bpe_trainer","unit":"sec","v":$v,"m":$m,""" +
      s""""incremental_full":${r3(tInc)},""" +
      s""""rescan_tenth_slice":${r3(tRescanSlice)},""" +
      s""""merge_lists_identical_on_slice":$same}""")
  }
}
