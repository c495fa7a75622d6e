package graft

/** Driver-side ground-truth helpers shared across specs — one copy, so
  * the suites can never assert against diverging oracles.
  */
object TestOracles {

  /** Longest common CONTIGUOUS token substring, classic O(|a|·|b|) DP —
    * the independent oracle for the verbatim k-gram run operators (which
    * must recover the same lengths from shingle-run arithmetic).
    */
  def lcsTokens(a: Array[String], b: Array[String]): Int = {
    val dp = Array.ofDim[Int](b.length + 1)
    var best = 0
    for (i <- 1 to a.length) {
      var prev = 0
      for (j <- 1 to b.length) {
        val cur = dp(j)
        dp(j) = if (a(i - 1) == b(j - 1)) prev + 1 else 0
        if (dp(j) > best) best = dp(j)
        prev = cur
      }
    }
    best
  }
}
