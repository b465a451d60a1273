package graft.functions

import scala.collection.mutable

/** Aho–Corasick multi-pattern automaton: single-pass matching of a
  * whole dictionary against a text — O(len + matches) per document
  * instead of O(len × |dict|) repeated indexOf scans. Built once on the
  * driver, shipped in the task closure (the automaton is
  * dictionary-sized — bytes, not data), used inside typed kernels.
  *
  * The count contract matches [[graft.operators.TextAnalysis.keywordHits]]
  * exactly: per keyword, NON-OVERLAPPING occurrences accepted greedily
  * left to right (each accepted match steps past itself; distinct
  * keywords never block each other). Matches surface in end-position
  * order, so greedy accept-if-start≥lastEnd reproduces the independent
  * per-keyword stepping scan verbatim.
  *
  * Plain arrays + per-node hash maps; goto misses resolve through
  * precomputed fail links, and each node's output list is merged with
  * its fail chain's at build time so matching never walks the chain. */
final class AhoCorasick private (
    gotoMaps: Array[Map[Char, Int]],
    fail: Array[Int],
    outputs: Array[Array[Int]],
    val patterns: Array[String]) extends Serializable {

  /** Per-pattern non-overlapping hit counts in `text` (caller handles
    * case folding — the automaton matches verbatim). */
  def countHits(text: String): Array[Int] = {
    val counts = new Array[Int](patterns.length)
    val lastEnd = new Array[Int](patterns.length) // 0 = nothing accepted
    var state = 0
    var i = 0
    while (i < text.length) {
      val c = text.charAt(i)
      var s = state
      while (s != 0 && !gotoMaps(s).contains(c)) s = fail(s)
      state = gotoMaps(s).getOrElse(c, 0)
      val out = outputs(state)
      var j = 0
      while (j < out.length) {
        val p = out(j)
        val start = i + 1 - patterns(p).length
        if (start >= lastEnd(p)) {
          counts(p) += 1
          lastEnd(p) = i + 1
        }
        j += 1
      }
      i += 1
    }
    counts
  }
}

object AhoCorasick {

  /** Build the automaton. Patterns must be non-empty and are matched
    * verbatim (case-fold before building for case-insensitive use). */
  def build(patterns: Seq[String]): AhoCorasick = {
    require(patterns.nonEmpty, "AhoCorasick: empty dictionary")
    require(patterns.forall(_.nonEmpty),
      "AhoCorasick: dictionary contains an empty pattern")
    val pats = patterns.toArray
    val gotoMaps = mutable.ArrayBuffer(mutable.Map.empty[Char, Int])
    val terminal = mutable.ArrayBuffer(List.empty[Int])
    pats.zipWithIndex.foreach { case (p, pi) =>
      var node = 0
      p.foreach { c =>
        node = gotoMaps(node).getOrElseUpdate(c, {
          gotoMaps += mutable.Map.empty[Char, Int]
          terminal += Nil
          gotoMaps.length - 1
        })
      }
      terminal(node) ::= pi
    }
    val n = gotoMaps.length
    val fail = new Array[Int](n)
    val outputs = new Array[Array[Int]](n)
    outputs(0) = terminal(0).toArray
    val queue = mutable.Queue.empty[Int]
    gotoMaps(0).valuesIterator.foreach { child =>
      fail(child) = 0
      outputs(child) = (terminal(child) ++ outputs(0)).toArray
      queue += child
    }
    while (queue.nonEmpty) {
      val u = queue.dequeue()
      gotoMaps(u).foreach { case (c, v) =>
        // fail(v) is strictly shallower than v (the walk starts at
        // fail(u) and goto steps add one char), so this never self-links
        var f = fail(u)
        while (f != 0 && !gotoMaps(f).contains(c)) f = fail(f)
        fail(v) = gotoMaps(f).getOrElse(c, 0)
        outputs(v) = (terminal(v) ++ outputs(fail(v))).toArray
        queue += v
      }
    }
    new AhoCorasick(gotoMaps.map(_.toMap).toArray, fail, outputs, pats)
  }
}
