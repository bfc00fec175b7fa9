package graft.functions

/** Package-version ordering (SURVEY.md §2.8 "Version-string", §7 M2, hard
  * part #2).
  *
  * The reference is a package-metadata engine (`/root/reference/README.md:1`)
  * whose single most important non-standard scalar semantic is
  * ecosystem-aware version comparison — `1.10 > 1.9`, epochs (`2:1.0`),
  * pre-release tilde (`1.0~rc1 < 1.0`), letter/non-letter segment rules.
  * This implements the Debian policy algorithm (public knowledge; the same
  * segment-walk shape as rpmvercmp): split `[epoch:]upstream[-revision]`,
  * then compare fragments by alternating maximal non-digit / digit runs
  * where `~` sorts before everything (including end-of-string), letters
  * sort before non-letters, and digit runs compare numerically.
  *
  * `sortKey` maps a version to a plain ASCII string whose LEXICOGRAPHIC
  * order equals `compare`'s order — that's what makes version ordering
  * usable inside `max_by` / `orderBy` / range partitioning at 100 TB scale
  * (a sortable key shuffles and sorts natively; a comparator UDF would
  * force a driver-side or non-codegen sort path). Encoding, per fragment,
  * for each alternating (nonDigit, digit) pair:
  * `enc(nonDigit) ++ "$" ++ zeroPad(digit, 18)` where
  * `~` → `!` (0x21) < `$` terminator (0x24) < letters (kept) < non-letters
  * (`|` 0x7C prefix + char). Fragment ends with `$`, so a fragment that is
  * a strict prefix sorts before any letter continuation and after any `~`
  * continuation — exactly the Debian end-of-string rule.
  */
object VersionOrder {
  private val NumWidth = 18

  /** Debian char order inside non-digit runs: ~ < end < letters < others. */
  private def charOrd(c: Char): Int =
    if (c == '~') -1
    else if (c.isLetter) c.toInt
    else c.toInt + 0x1000

  /** Compare alternating non-digit / digit runs. */
  private def cmpFragment(a: String, b: String): Int = {
    var i = 0
    var j = 0
    while (i < a.length || j < b.length) {
      // non-digit run, char by char with Debian ordering; run ends at digit.
      while ((i < a.length && !a(i).isDigit) || (j < b.length && !b(j).isDigit)) {
        val ca = if (i < a.length && !a(i).isDigit) charOrd(a(i)) else 0
        val cb = if (j < b.length && !b(j).isDigit) charOrd(b(j)) else 0
        if (ca != cb) return Integer.compare(ca, cb)
        if (i < a.length && !a(i).isDigit) i += 1
        if (j < b.length && !b(j).isDigit) j += 1
      }
      // digit run: strip ALL leading zeros (an empty run equals 0 — Debian
      // semantics, and what the sortKey zero-pad encodes), longer run wins,
      // then lexicographic.
      var si = i; while (i < a.length && a(i).isDigit) i += 1
      var sj = j; while (j < b.length && b(j).isDigit) j += 1
      while (si < i && a(si) == '0') si += 1
      while (sj < j && b(sj) == '0') sj += 1
      val la = i - si
      val lb = j - sj
      if (la != lb) return Integer.compare(la, lb)
      val c = a.substring(si, i).compareTo(b.substring(sj, j))
      if (c != 0) return Integer.signum(c)
    }
    0
  }

  /** Split into (epoch, upstream, revision). Epoch = digits before first ':'
    * (default 0); revision = after LAST '-' (default "0", so `1.0-r1` and
    * `1.0` compare on upstream first).
    */
  private[functions] def split(v: String): (Long, String, String) = {
    val colon = v.indexOf(':')
    val (epoch, rest) =
      if (colon > 0 && v.substring(0, colon).forall(_.isDigit))
        (v.substring(0, colon).toLong, v.substring(colon + 1))
      else (0L, v)
    val dash = rest.lastIndexOf('-')
    if (dash >= 0) (epoch, rest.substring(0, dash), rest.substring(dash + 1))
    else (epoch, rest, "0")
  }

  /** Total order over version strings: <0, 0, >0. */
  def compare(a: String, b: String): Int = {
    val (ea, ua, ra) = split(a)
    val (eb, ub, rb) = split(b)
    val ce = java.lang.Long.compare(ea, eb)
    if (ce != 0) return Integer.signum(ce)
    val cu = cmpFragment(ua, ub)
    if (cu != 0) return cu
    cmpFragment(ra, rb)
  }

  private def encFragment(sb: java.lang.StringBuilder, f: String): Unit = {
    var i = 0
    while (i <= f.length) {
      while (i < f.length && !f(i).isDigit) {
        val c = f(i)
        if (c == '~') sb.append('!')
        else if (c.isLetter) sb.append(c)
        else { sb.append('|'); sb.append(c) }
        i += 1
      }
      sb.append('$') // end of non-digit run (also end-of-fragment marker)
      if (i > f.length) return
      val start = i
      while (i < f.length && f(i).isDigit) i += 1
      var s = start
      while (s < i - 1 && f(s) == '0') s += 1
      val digits = f.substring(s, i) // "" for an empty run → pad to all zeros
      var pad = NumWidth - digits.length
      while (pad > 0) { sb.append('0'); pad -= 1 }
      sb.append(digits)
      if (i == f.length) { sb.append('$'); return }
    }
  }

  /** ASCII key with `key(a) < key(b) ⇔ compare(a, b) < 0`. */
  def sortKey(v: String): String = {
    val (epoch, upstream, revision) = split(v)
    val sb = new java.lang.StringBuilder(v.length * 2 + 24)
    val e = epoch.toString
    var pad = NumWidth - e.length
    while (pad > 0) { sb.append('0'); pad -= 1 }
    sb.append(e)
    sb.append('$')
    encFragment(sb, upstream)
    sb.append('$')
    encFragment(sb, revision)
    sb.toString
  }
}
