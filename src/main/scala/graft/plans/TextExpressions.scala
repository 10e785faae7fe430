package graft.plans

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native codegen'd whitespace token counting for the text-analysis
  * scan stage.
  *
  * The composable form — `size(split(lower(trim(t)), "\s+"))` with a
  * blank guard — allocates a lowercased copy of the string plus an
  * array of substring objects per row just to COUNT separators. Over a
  * 100 TB documents scan (token counting runs inline in quality
  * scoring, packing, profiling) that allocation is the dominant cost.
  * This expression is one branch-free byte scan: no regex, no copies,
  * no array.
  *
  * Result semantics are IDENTICAL to the composable form (and to the
  * DuckDB oracle's `len(regexp_split_to_array(lower(trim(text)),
  * '\s+'))` with the blank guard):
  *  - SQL trim strips 0x20 spaces ONLY, so other whitespace at the
  *    ends survives into split, which (limit −1) keeps the resulting
  *    empty edge pieces. Piece count for non-blank input is therefore
  *    exactly (whitespace runs) + 1, counting edge runs of non-space
  *    whitespace.
  *  - Java's `\s` is ASCII-only ([ \t\n\x0B\f\r]) — multi-byte UTF-8
  *    never matches, so the byte scan needs no decoding.
  *  - lowercasing never creates or removes whitespace, so it cannot
  *    change the count and is skipped entirely.
  */
case class TokenCount(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${dt.simpleString}")
  }

  override def dataType: DataType = IntegerType
  override def prettyName: String = "token_count"

  override def nullSafeEval(input: Any): Any =
    TokenCount.count(input.asInstanceOf[UTF8String])

  protected override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.TokenCount.count($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(newChild)
}

object TokenCount {
  private def isWs(b: Byte): Boolean = // Java regex \s (ASCII-only)
    b == ' ' || b == '\t' || b == '\n' || b == 0x0B || b == '\f' || b == '\r'

  /** See [[TokenCount]] for the semantics contract. */
  def count(s: UTF8String): Int = {
    val n = s.numBytes()
    // SQL trim: strip 0x20 spaces only
    var i0 = 0
    while (i0 < n && s.getByte(i0) == ' ') i0 += 1
    var i1 = n - 1
    while (i1 >= i0 && s.getByte(i1) == ' ') i1 -= 1
    if (i1 < i0) return 0 // blank → 0 (the guard branch)
    // pieces = whitespace runs + 1 (split with limit -1 keeps the empty
    // edge pieces produced by non-space whitespace at the ends)
    var runs = 0
    var inWs = false
    var i = i0
    while (i <= i1) {
      val ws = isWs(s.getByte(i))
      if (ws && !inWs) runs += 1
      inWs = ws
      i += 1
    }
    runs + 1
  }
}

/** Native codegen'd Jaro–Winkler similarity for blocked record
  * linkage (entity resolution over name-like columns, where
  * Levenshtein's unit-cost edits over-penalize transpositions).
  *
  * Spark ships `levenshtein` but no Jaro family, and a Scala UDF here
  * would put an encoder boundary inside the candidate-pair loop — the
  * hot path of a blocked self-join that evaluates millions of pairs
  * per block at corpus scale. This expression stays inside
  * WholeStageCodegen (one static call, no boxing).
  *
  * Semantics are the textbook Winkler variant, verified
  * value-identical (exact doubles) against DuckDB's
  * `jaro_winkler_similarity` on every pair the gate evaluates:
  *  - Jaro: match window ⌊max(|a|,|b|)/2⌋−1, greedy left-to-right
  *    matching, transpositions = half the mismatched matched
  *    positions; j = (m/|a| + m/|b| + (m−t)/m)/3.
  *  - Winkler boost only when j > 0.7: j + ℓ·0.1·(1−j) with common
  *    prefix ℓ capped at 4.
  *  - Either side empty → 0.0 (both empty → 1.0); comparison is over
  *    Unicode code points.
  */
case class JaroWinklerSim(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == StringType && right.dataType == StringType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (string, string) arguments, " +
        s"got (${left.dataType.simpleString}, ${right.dataType.simpleString})")

  override def dataType: DataType = org.apache.spark.sql.types.DoubleType
  override def prettyName: String = "jaro_winkler"

  override def nullSafeEval(a: Any, b: Any): Any =
    JaroWinklerSim.sim(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

  protected override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.plans.JaroWinklerSim.sim($a, $b)")

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): Expression =
    copy(newLeft, newRight)
}

object JaroWinklerSim {

  /** See [[JaroWinklerSim]] for the semantics contract. */
  def sim(a: UTF8String, b: UTF8String): Double = {
    val s1 = a.toString.codePoints().toArray
    val s2 = b.toString.codePoints().toArray
    val l1 = s1.length
    val l2 = s2.length
    if (l1 == 0 && l2 == 0) return 1.0
    if (l1 == 0 || l2 == 0) return 0.0
    val window = math.max(math.max(l1, l2) / 2 - 1, 0)
    val m1 = new Array[Boolean](l1)
    val m2 = new Array[Boolean](l2)
    var m = 0
    var i = 0
    while (i < l1) {
      val hi = math.min(l2 - 1, i + window)
      var j = math.max(0, i - window)
      var found = false
      while (j <= hi && !found) {
        if (!m2(j) && s2(j) == s1(i)) {
          m1(i) = true; m2(j) = true; m += 1; found = true
        }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0.0
    var t = 0
    var k = 0
    i = 0
    while (i < l1) {
      if (m1(i)) {
        while (!m2(k)) k += 1
        if (s1(i) != s2(k)) t += 1
        k += 1
      }
      i += 1
    }
    val tm = t / 2
    val j = (m.toDouble / l1 + m.toDouble / l2 + (m - tm).toDouble / m) / 3.0
    if (j > 0.7) {
      val cap = math.min(4, math.min(l1, l2))
      var l = 0
      while (l < cap && s1(l) == s2(l)) l += 1
      j + l * 0.1 * (1.0 - j)
    } else j
  }
}

/** Native codegen'd UPPER BOUND on [[JaroWinklerSim]] — the O(|a|+|b|)
  * pre-filter that lets a blocked linkage verifier skip the
  * O(|a|·window) greedy-matching kernel on pairs that cannot possibly
  * reach the similarity cut (the [[BagDistanceBound]] recipe, adapted
  * to the Jaro family).
  *
  * Bound derivation: Jaro's matched-character count m is at most the
  * common-character count c = Σ_ch min(count_a(ch), count_b(ch)) over
  * character multisets (every matched position consumes one common
  * character), and transpositions only lower the score, so
  * j ≤ (c/|a| + c/|b| + 1)/3 (c > 0; c = 0 forces j = 0). Characters
  * bucket by UTF-8 LEAD byte (continuation bytes skipped — one count
  * per code point, no decoding): bucketing is an alphabet projection,
  * which only GROWS the min-sum, so the bound stays valid for any
  * Unicode input. The Winkler boost maps j to at most
  * 0.6·j + 0.4 (prefix length capped at 4), applied whenever the
  * bound exceeds 0.7 — monotone in j, so bounding j bounds jw.
  * Guarantee: jw_bound(a, b) ≥ jaro_winkler(a, b); a pair with
  * bound < threshold drops without running the full kernel, and the
  * survivors' similarities are computed exactly — output-identical,
  * scan-cost pruning (locked by a JaroWinklerSpec dominance property).
  */
case class JaroWinklerUpperBound(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == StringType && right.dataType == StringType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (string, string) arguments, " +
        s"got (${left.dataType.simpleString}, ${right.dataType.simpleString})")

  override def dataType: DataType = org.apache.spark.sql.types.DoubleType
  override def prettyName: String = "jaro_winkler_bound"

  override def nullSafeEval(a: Any, b: Any): Any =
    JaroWinklerUpperBound.bound(a.asInstanceOf[UTF8String],
      b.asInstanceOf[UTF8String])

  protected override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.plans.JaroWinklerUpperBound.bound($a, $b)")

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): Expression =
    copy(newLeft, newRight)
}

object JaroWinklerUpperBound {

  /** See [[JaroWinklerUpperBound]] for the bound proof. One 256-slot
    * count array, two byte walks, one fold — no decode.
    */
  def bound(a: UTF8String, b: UTF8String): Double = {
    val cnt = new Array[Int](256)
    val na0 = a.numBytes()
    val nb0 = b.numBytes()
    var la = 0
    var lb = 0
    var i = 0
    while (i < na0) {
      val x = a.getByte(i) & 0xFF
      if ((x & 0xC0) != 0x80) { cnt(x) += 1; la += 1 }
      i += 1
    }
    i = 0
    while (i < nb0) {
      val x = b.getByte(i) & 0xFF
      if ((x & 0xC0) != 0x80) { cnt(x) -= 1; lb += 1 }
      i += 1
    }
    if (la == 0 && lb == 0) return 1.0
    if (la == 0 || lb == 0) return 0.0
    // c = Σ min(countA, countB) = la − Σ_positive-diff
    var posDiff = 0
    var j = 0
    while (j < 256) { if (cnt(j) > 0) posDiff += cnt(j); j += 1 }
    val c = la - posDiff
    if (c <= 0) return 0.0
    val jb = (c.toDouble / la + c.toDouble / lb + 1.0) / 3.0
    if (jb > 0.7) 0.6 * jb + 0.4 else jb
  }
}

/** Native codegen'd Unicode NFC normalization — the canonical-
  * composition pass every dedup/fingerprint stage needs BEFORE
  * hashing (the same visible text arrives as precomposed é or as
  * e + U+0301 depending on the crawler, and a byte-level hash calls
  * them different documents).
  *
  * Spark has no normalization built-in; a Scala UDF would box every
  * row of a 100 TB scan. This expression stays in WholeStageCodegen
  * and fast-paths the dominant case: an ASCII-only string (checked
  * with a byte scan, no decode) IS its own NFC form and is returned
  * as-is with zero allocation — `java.text.Normalizer` only runs on
  * strings that actually contain multi-byte sequences. Semantics are
  * Unicode-standard NFC, value-identical to DuckDB's
  * `nfc_normalize` (both implement UAX #15 canonical composition).
  */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${dt.simpleString}")
  }

  override def dataType: DataType = StringType
  override def prettyName: String = "nfc_normalize"

  override def nullSafeEval(input: Any): Any =
    NfcNormalize.nfc(input.asInstanceOf[UTF8String])

  protected override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.NfcNormalize.nfc($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(newChild)
}

object NfcNormalize {

  /** See [[NfcNormalize]] for the semantics contract. */
  def nfc(s: UTF8String): UTF8String = {
    val n = s.numBytes()
    var i = 0
    while (i < n && (s.getByte(i) & 0x80) == 0) i += 1
    if (i == n) return s // pure ASCII: already NFC, no copy
    val str = s.toString
    val out = java.text.Normalizer.normalize(str,
      java.text.Normalizer.Form.NFC)
    if (out eq str) s else UTF8String.fromString(out)
  }
}

/** Native codegen'd accent stripping — fold accented renderings onto
  * their base letters (é/e + U+0301 → e) so fuzzy matching, blocking
  * keys, and fingerprints collide across diacritic variants.
  *
  * Semantics: NFD canonical decomposition, drop every non-spacing
  * mark (Unicode category Mn), NFC the remainder — value-identical to
  * DuckDB's `strip_accents` (utf8proc) on decomposable sequences.
  * Same ASCII zero-allocation fast path as [[NfcNormalize]]: a pure
  * ASCII string cannot carry marks and is returned as-is, so over a
  * mostly-ASCII 100 TB corpus the Normalizer never runs.
  */
case class StripAccents(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${dt.simpleString}")
  }

  override def dataType: DataType = StringType
  override def prettyName: String = "strip_accents"

  override def nullSafeEval(input: Any): Any =
    StripAccents.strip(input.asInstanceOf[UTF8String])

  protected override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.StripAccents.strip($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(newChild)
}

object StripAccents {

  /** See [[StripAccents]] for the semantics contract. */
  def strip(s: UTF8String): UTF8String = {
    val n = s.numBytes()
    var i = 0
    while (i < n && (s.getByte(i) & 0x80) == 0) i += 1
    if (i == n) return s // pure ASCII: nothing to strip, no copy
    val nfd = java.text.Normalizer.normalize(s.toString,
      java.text.Normalizer.Form.NFD)
    val sb = new java.lang.StringBuilder(nfd.length)
    var j = 0
    while (j < nfd.length) {
      val cp = nfd.codePointAt(j)
      if (Character.getType(cp) != Character.NON_SPACING_MARK)
        sb.appendCodePoint(cp)
      j += Character.charCount(cp)
    }
    UTF8String.fromString(java.text.Normalizer.normalize(sb.toString,
      java.text.Normalizer.Form.NFC))
  }
}

/** Native codegen'd bag-distance lower bound on Levenshtein distance —
  * the O(|a|+|b|) pre-filter that lets a blocked near-dup verifier skip
  * the O(|a|·|b|) DP kernel on pairs that cannot possibly pass the
  * similarity cut.
  *
  * bag(a, b) = max(|bag(a) − bag(b)|, |bag(b) − bag(a)|) over character
  * multisets is a classic lower bound on edit distance: one edit
  * operation (insert / delete / substitute) changes each multiset
  * difference by at most one. Characters are bucketed by their UTF-8
  * LEAD byte (continuation bytes skipped — one count per code point,
  * no decoding): bucketing is an alphabet projection, and projections
  * only SHRINK multiset differences, so the bound stays valid for any
  * Unicode input and is exact-alphabet-strength for ASCII. Guarantee:
  * bag(a, b) ≤ levenshtein(a, b); a pair with bag > threshold can be
  * dropped without running the DP, and the surviving pairs' distances
  * are computed exactly — output-identical, scan-cost pruning.
  */
case class BagDistanceBound(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == StringType && right.dataType == StringType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (string, string) arguments, " +
        s"got (${left.dataType.simpleString}, ${right.dataType.simpleString})")

  override def dataType: DataType = IntegerType
  override def prettyName: String = "bag_dist_bound"

  override def nullSafeEval(a: Any, b: Any): Any =
    BagDistanceBound.bound(a.asInstanceOf[UTF8String],
      b.asInstanceOf[UTF8String])

  protected override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.plans.BagDistanceBound.bound($a, $b)")

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): Expression =
    copy(newLeft, newRight)
}

object BagDistanceBound {

  /** See [[BagDistanceBound]] for the bound proof. One 256-slot count
    * array, two byte walks, one fold — no decode, no allocation beyond
    * the counts.
    */
  def bound(a: UTF8String, b: UTF8String): Int = {
    val cnt = new Array[Int](256)
    val na = a.numBytes()
    val nb = b.numBytes()
    var i = 0
    while (i < na) {
      val x = a.getByte(i) & 0xFF
      if ((x & 0xC0) != 0x80) cnt(x) += 1 // lead byte = one code point
      i += 1
    }
    i = 0
    while (i < nb) {
      val x = b.getByte(i) & 0xFF
      if ((x & 0xC0) != 0x80) cnt(x) -= 1
      i += 1
    }
    var pos = 0
    var neg = 0
    var j = 0
    while (j < 256) {
      val v = cnt(j)
      if (v > 0) pos += v else neg -= v
      j += 1
    }
    math.max(pos, neg)
  }
}

/** Native codegen'd Levenshtein distance with optional early-exit
  * threshold — a drop-in for the builtin with a ~10× faster kernel on
  * the near-dup verify hot path.
  *
  * The builtin (`UTF8String.levenshteinDistance`) re-decodes UTF-8 in
  * the DP INNER LOOP — every one of the O(|a|·|b|) cell comparisons
  * pays a multi-byte character walk (measured ~13M cells/s/thread on
  * the q222 gate). This expression decodes each string ONCE into an
  * int array (each code point packed from its raw UTF-8 bytes — an
  * injective map, so packed-int equality ≡ code-point equality on
  * valid UTF-8) and runs a classic two-row int DP: no per-cell decode,
  * no bounds re-derivation, branch-light inner loop.
  *
  * Semantics are value-identical to the builtin (equivalence locked by
  * TextFnsSpec on ASCII, multi-byte, and empty inputs):
  *  - threshold < 0: unbounded — the exact code-point edit distance.
  *  - threshold ≥ 0: the builtin 3-arg contract — the distance if
  *    ≤ threshold, −1 otherwise — implemented as a row-min early exit
  *    (row minima are non-decreasing), so hopeless pairs stop after
  *    ~threshold rows instead of |b|.
  */
case class FastLevenshtein(first: Expression, second: Expression,
                           third: Expression)
    extends org.apache.spark.sql.catalyst.expressions.TernaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (first.dataType == StringType && second.dataType == StringType &&
        third.dataType == IntegerType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (string, string, int) arguments, got " +
        s"(${first.dataType.simpleString}, ${second.dataType.simpleString}, " +
        s"${third.dataType.simpleString})")

  override def dataType: DataType = IntegerType
  override def prettyName: String = "fast_levenshtein"

  override def nullSafeEval(a: Any, b: Any, t: Any): Any =
    FastLevenshtein.dist(a.asInstanceOf[UTF8String],
      b.asInstanceOf[UTF8String], t.asInstanceOf[Int])

  protected override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b, t) => s"graft.plans.FastLevenshtein.dist($a, $b, $t)")

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression,
      newThird: Expression): Expression =
    copy(newFirst, newSecond, newThird)
}

object FastLevenshtein {

  /** Pack each code point's raw UTF-8 bytes into one int — injective
    * on valid UTF-8 (≤4 self-delimiting bytes), so int equality ≡
    * code-point equality with zero String allocation.
    */
  def pack(s: UTF8String): Array[Int] = {
    val n = s.numBytes()
    var c = 0
    var i = 0
    while (i < n) {
      if ((s.getByte(i) & 0xC0) != 0x80) c += 1
      i += 1
    }
    val out = new Array[Int](c)
    i = 0
    var k = 0
    while (i < n) {
      var v = s.getByte(i) & 0xFF
      var j = i + 1
      while (j < n && (s.getByte(j) & 0xC0) == 0x80) {
        v = (v << 8) | (s.getByte(j) & 0xFF)
        j += 1
      }
      out(k) = v
      k += 1
      i = j
    }
    out
  }

  /** Two-row int DP; `thr` < 0 = unbounded, else return −1 as soon as
    * a full DP row exceeds `thr` (row minima are non-decreasing).
    */
  def dist(ua: UTF8String, ub: UTF8String, thr: Int): Int = {
    val a = pack(ua)
    val b = pack(ub)
    // iterate over the LONGER string's rows so the early exit sees the
    // length gap immediately; DP is symmetric
    val (s, t) = if (a.length <= b.length) (a, b) else (b, a)
    val n = s.length
    val m = t.length
    if (thr >= 0 && m - n > thr) return -1
    if (n == 0) return m // thr-guard above already handled m > thr
    var prev = new Array[Int](n + 1)
    var cur = new Array[Int](n + 1)
    var i = 0
    while (i <= n) { prev(i) = i; i += 1 }
    var j = 1
    while (j <= m) {
      cur(0) = j
      var rowMin = j
      val tj = t(j - 1)
      var i2 = 1
      while (i2 <= n) {
        var v = prev(i2 - 1)
        if (s(i2 - 1) != tj) v += 1
        val del = prev(i2) + 1
        if (del < v) v = del
        val ins = cur(i2 - 1) + 1
        if (ins < v) v = ins
        cur(i2) = v
        if (v < rowMin) rowMin = v
        i2 += 1
      }
      if (thr >= 0 && rowMin > thr) return -1
      val tmp = prev; prev = cur; cur = tmp
      j += 1
    }
    val d = prev(n)
    if (thr >= 0 && d > thr) -1 else d
  }
}

/** Native codegen'd sliding character n-gram generator — the scan
  * stage of every char-level profile (language/script signatures,
  * mojibake triage).
  *
  * The composable form — `transform(sequence(1, length(t)−n+1),
  * i -> substring(t, i, n))` — is an interpreted higher-order lambda
  * whose `substring` RE-WALKS the string from byte 0 on every window
  * to find the code-point offset: O(len²) byte scans per document
  * (q207's measured cost). This expression walks the bytes ONCE,
  * records each code point's byte offset, and slices every window
  * straight out of one byte array — O(len·n) total, no decode, no
  * re-scan.
  *
  * Result semantics are IDENTICAL to the composable form (and to
  * DuckDB's `list_transform(range(...), i -> substr(t, i, n))`):
  * windows slide by CODE POINT; input shorter than n code points
  * yields an empty array.
  */
case class CharNgrams(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1 && n <= 8, s"n ($n) must be in [1, 8]")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${dt.simpleString}")
  }

  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(StringType, containsNull = false)
  override def prettyName: String = "char_ngrams"

  override def nullSafeEval(input: Any): Any =
    CharNgrams.grams(input.asInstanceOf[UTF8String], n)

  protected override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.CharNgrams.grams($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object CharNgrams {

  /** See [[CharNgrams]] for the semantics contract. */
  def grams(s: UTF8String,
            n: Int): org.apache.spark.sql.catalyst.util.GenericArrayData = {
    val bytes = s.getBytes
    val nb = bytes.length
    // offsets(k) = byte offset of the k-th code point; offsets(chars) = nb
    val offsets = new Array[Int](nb + 1)
    var chars = 0
    var i = 0
    while (i < nb) {
      if ((bytes(i) & 0xC0) != 0x80) { offsets(chars) = i; chars += 1 }
      i += 1
    }
    offsets(chars) = nb
    val count = chars - n + 1
    if (count <= 0)
      return new org.apache.spark.sql.catalyst.util.GenericArrayData(
        new Array[Any](0))
    val out = new Array[Any](count)
    var k = 0
    while (k < count) {
      val from = offsets(k)
      out(k) = UTF8String.fromBytes(bytes, from, offsets(k + n) - from)
      k += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }
}

/** Native codegen'd distinct word n-gram shingles — the scan stage of
  * every shingle-based dedup pipeline (n-gram Jaccard, MinHash/LSH,
  * decontamination, winnowing).
  *
  * The composable form — `array_distinct(transform(sequence(1,
  * size(toks)−n+1), i -> array_join(slice(toks, i, n), ' ')))` over
  * `toks = split(lower(trim(t)), '\s+')` — is an interpreted
  * higher-order lambda that materializes the full token array, then
  * per WINDOW allocates a slice copy plus an array_join string build
  * (q23's measured cost: the explode feeding candidate generation is
  * dominated by shingle construction, not the join). This expression
  * walks the bytes ONCE: space-trim, lowercase, record token byte
  * boundaries, then copy each window's bytes straight into its output
  * string — no token-array objects, no slice copies, no interpreted
  * lambda dispatch.
  *
  * Result semantics are IDENTICAL to the composable form (locked by a
  * TextFnsSpec equivalence property over unicode/whitespace-edge
  * inputs, and to the DuckDB oracle's string_split_regex mirror):
  *  - SQL trim strips 0x20 spaces ONLY; other ASCII whitespace at the
  *    ends survives into split, which (limit −1) keeps the resulting
  *    empty edge pieces as tokens ("" participates in shingles).
  *  - Java's `\s` is ASCII-only ([ \t\n\x0B\f\r]) — multi-byte UTF-8
  *    never matches, so tokenization needs no decoding; lowercasing
  *    uses the same UTF8String.toLowerCase as the builtin `lower`.
  *  - Windows are space-joined; duplicates drop with first-occurrence
  *    order kept (array_distinct semantics).
  *  - Fewer than n tokens → empty array. NULL → NULL (callers wanting
  *    the HOF form's NULL→empty coercion add a coalesce — see
  *    [[graft.operators.Dedup.shingles]]).
  */
case class WordNgrams(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1 && n <= 16, s"n ($n) must be in [1, 16]")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${dt.simpleString}")
  }

  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(StringType, containsNull = false)
  override def prettyName: String = "word_ngrams"

  override def nullSafeEval(input: Any): Any =
    WordNgrams.grams(input.asInstanceOf[UTF8String], n)

  protected override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.WordNgrams.grams($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object WordNgrams {
  private def isWs(b: Byte): Boolean = // Java regex \s (ASCII-only)
    b == ' ' || b == '\t' || b == '\n' || b == 0x0B || b == '\f' || b == '\r'

  /** See [[WordNgrams]] for the semantics contract. */
  def grams(s0: UTF8String,
            n: Int): org.apache.spark.sql.catalyst.util.GenericArrayData = {
    // lower(trim(t)): same kernels the builtins use (trim = 0x20 only;
    // lowercase never creates/removes ASCII whitespace, so token
    // boundaries computed after are identical to the composable form)
    val s = s0.trim().toLowerCase()
    val bytes = s.getBytes
    val nb = bytes.length
    // token boundaries, Java split(regex="\s+", limit=-1) semantics:
    // leading/trailing empty pieces kept when the edge char is
    // (non-space) whitespace; empty input is one empty token
    val starts = new java.util.ArrayList[Integer]()
    val ends   = new java.util.ArrayList[Integer]()
    var start = 0
    var i = 0
    while (i < nb) {
      if (isWs(bytes(i))) {
        starts.add(start); ends.add(i)
        while (i < nb && isWs(bytes(i))) i += 1
        start = i
      } else i += 1
    }
    starts.add(start); ends.add(nb) // final piece ("" if ws-terminated/empty)
    val nt = starts.size()
    val count = nt - n + 1
    if (count <= 0)
      return new org.apache.spark.sql.catalyst.util.GenericArrayData(
        new Array[Any](0))
    val seen = new java.util.LinkedHashSet[UTF8String]()
    var k = 0
    while (k < count) {
      var len = n - 1 // the joining spaces
      var j = 0
      while (j < n) { len += ends.get(k + j) - starts.get(k + j); j += 1 }
      val out = new Array[Byte](len)
      var pos = 0
      j = 0
      while (j < n) {
        if (j > 0) { out(pos) = ' '; pos += 1 }
        val from = starts.get(k + j)
        val tl = ends.get(k + j) - from
        System.arraycopy(bytes, from, out, pos, tl)
        pos += tl
        j += 1
      }
      seen.add(UTF8String.fromBytes(out))
      k += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      seen.toArray.asInstanceOf[Array[AnyRef]].asInstanceOf[Array[Any]])
  }
}

/** Registry for the text expressions (merged into [[GraftFunctions]] /
  * [[GraftExtensions]]).
  */
object TextExpressionFunctions {
  val descriptors: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] =
    Seq(
      ("token_count", (c: Seq[Expression]) => TokenCount(c.head): Expression),
      ("nfc_normalize", (c: Seq[Expression]) => NfcNormalize(c.head): Expression),
      ("strip_accents", (c: Seq[Expression]) => StripAccents(c.head): Expression),
      ("jaro_winkler", (c: Seq[Expression]) => {
        require(c.length == 2, s"jaro_winkler takes 2 arguments, got ${c.length}")
        JaroWinklerSim(c(0), c(1)): Expression
      }),
      ("jaro_winkler_bound", (c: Seq[Expression]) => {
        require(c.length == 2,
          s"jaro_winkler_bound takes 2 arguments, got ${c.length}")
        JaroWinklerUpperBound(c(0), c(1)): Expression
      }),
      ("bag_dist_bound", (c: Seq[Expression]) => {
        require(c.length == 2, s"bag_dist_bound takes 2 arguments, got ${c.length}")
        BagDistanceBound(c(0), c(1)): Expression
      }),
      ("word_ngrams", (c: Seq[Expression]) => {
        require(c.length == 2, s"word_ngrams takes 2 arguments, got ${c.length}")
        val n = c(1) match {
          case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, IntegerType) => v
          case other => throw new IllegalArgumentException(
            s"word_ngrams n must be an int literal, got $other")
        }
        WordNgrams(c(0), n): Expression
      }),
      ("char_ngrams", (c: Seq[Expression]) => {
        require(c.length == 2, s"char_ngrams takes 2 arguments, got ${c.length}")
        val n = c(1) match {
          case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, IntegerType) => v
          case other => throw new IllegalArgumentException(
            s"char_ngrams n must be an int literal, got $other")
        }
        CharNgrams(c(0), n): Expression
      }),
      ("fast_levenshtein", (c: Seq[Expression]) => {
        require(c.length == 2 || c.length == 3,
          s"fast_levenshtein takes 2 or 3 arguments, got ${c.length}")
        val thr = if (c.length == 3) c(2)
          else org.apache.spark.sql.catalyst.expressions.Literal(-1)
        FastLevenshtein(c(0), c(1), thr): Expression
      })
    ).map { case (name, builder) =>
      (FunctionIdentifier(name),
        new ExpressionInfo("graft.plans.TextExpressions", name),
        builder)
    }
}
