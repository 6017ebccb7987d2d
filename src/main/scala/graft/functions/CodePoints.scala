package graft.functions

/** Surrogate-pair-aware codepoint walks shared by the native
  * expressions and the multimodal decode stubs — one definition of the
  * offset table and the codepoint sum, so boundary handling can't
  * drift between them.
  */
object CodePoints {
  /** UTF-16 offsets of each codepoint boundary: offsets(i) is the
    * UTF-16 index where codepoint i starts; offsets(n) == s.length. */
  def offsets(s: String): Array[Int] = {
    val nCp = s.codePointCount(0, s.length)
    val out = new Array[Int](nCp + 1)
    var i = 0; var c = 0
    while (i < s.length) {
      out(c) = i; c += 1; i += Character.charCount(s.codePointAt(i))
    }
    out(nCp) = s.length
    out
  }

  /** Sum of the codepoints of s, up to `maxCodePoints` of them. */
  def sum(s: String, maxCodePoints: Int = Int.MaxValue): Long = {
    var acc = 0L
    var i = 0
    var taken = 0
    while (i < s.length && taken < maxCodePoints) {
      val cp = s.codePointAt(i)
      i += Character.charCount(cp)
      acc += cp
      taken += 1
    }
    acc
  }
}
