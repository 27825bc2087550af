package graft.functions

/** Port of Python difflib.SequenceMatcher.ratio() — the similarity
  * the reference's entity-curation tier uses
  * (entity_deduplication.py:141-148). The Column-level fuzzy tier
  * (Entities.tieredSim) substitutes normalized Levenshtein for SQL
  * expressibility (measured benign; SequenceMatcherParitySpec), but
  * the per-document curation tier (EntityCuration) runs row-level
  * Scala where the exact algorithm is expressible — so it uses this.
  *
  * Scope: faithful for inputs shorter than 200 chars (below difflib's
  * autojunk activation, so no junk handling is needed); entity names
  * are far below that and the helper asserts it.
  */
object SeqMatcher {

  /** ratio() = 2*M / (|a|+|b|), M = total size of matching blocks. */
  def ratio(a: String, b: String): Double = {
    require(a.length < 200 && b.length < 200, "port is sub-autojunk only")
    if (a.length + b.length == 0) return 1.0
    val matched = matchingBlocks(a, b).map(_._3).sum
    2.0 * matched / (a.length + b.length)
  }

  /** difflib's queue-recursive get_matching_blocks over
    * find_longest_match (earliest-starting longest block, greedy
    * divide and conquer). */
  private def matchingBlocks(a: String, b: String): List[(Int, Int, Int)] = {
    val b2j = b.zipWithIndex.groupBy(_._1).map { case (c, xs) => c -> xs.map(_._2) }
    val queue = scala.collection.mutable.Stack((0, a.length, 0, b.length))
    val blocks = scala.collection.mutable.ListBuffer.empty[(Int, Int, Int)]
    while (queue.nonEmpty) {
      val (alo, ahi, blo, bhi) = queue.pop()
      // find_longest_match: DP over match-run lengths ending at (i, j);
      // ties go to the earliest i then earliest j, exactly difflib
      var besti = alo; var bestj = blo; var bestsize = 0
      var j2len = Map.empty[Int, Int]
      var i = alo
      while (i < ahi) {
        var newj2len = Map.empty[Int, Int]
        for (j <- b2j.getOrElse(a(i), Vector.empty)) {
          if (j >= blo && j < bhi) {
            val k = j2len.getOrElse(j - 1, 0) + 1
            newj2len += (j -> k)
            if (k > bestsize) { besti = i - k + 1; bestj = j - k + 1; bestsize = k }
          }
        }
        j2len = newj2len
        i += 1
      }
      // no junk => only the plain equal-char extension applies
      while (besti > alo && bestj > blo && a(besti - 1) == b(bestj - 1)) {
        besti -= 1; bestj -= 1; bestsize += 1
      }
      while (besti + bestsize < ahi && bestj + bestsize < bhi &&
          a(besti + bestsize) == b(bestj + bestsize)) bestsize += 1
      if (bestsize > 0) {
        blocks += ((besti, bestj, bestsize))
        if (alo < besti && blo < bestj) queue.push((alo, besti, blo, bestj))
        if (besti + bestsize < ahi && bestj + bestsize < bhi)
          queue.push((besti + bestsize, ahi, bestj + bestsize, bhi))
      }
    }
    blocks.toList
  }
}
