package graft.expressions

import java.nio.charset.StandardCharsets

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.{FunctionIdentifier, InternalRow}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expressions for the per-row-heavy training-data
  * operators (MinHash, SimHash, cosine, hyperplane LSH).
  *
  * Spark's higher-order array functions (`transform`/`aggregate`/
  * `zip_with`) evaluate their lambda per element through the interpreted
  * expression walker — for a 64-permutation × ~50-shingle MinHash that is
  * ~3,000 boxed tree-walks per row, which measured ~80× slower than the
  * tight primitive loops here. Each expression below does one pass over
  * primitive arrays with zero per-element allocation; that is the plan
  * shape that survives a 100 TB scan (CPU per row is what dominates a
  * narrow map at scale).
  */
object Hashing {

  /** splitmix64 finalizer — the permutation/mixing primitive. */
  @inline final def splitmix64(x0: Long): Long = {
    var z = x0 + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  /** 64-bit FNV-1a over UTF-8 bytes, splitmix-finalized. */
  final def hashString(s: String): Long = {
    val bytes = s.getBytes(StandardCharsets.UTF_8)
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < bytes.length) {
      h ^= (bytes(i) & 0xffL)
      h *= 0x100000001b3L
      i += 1
    }
    splitmix64(h)
  }

  /** Deterministic pseudo-random hyperplane component for (plane, dim),
    * uniform in [-1, 1). */
  @inline final def planeComponent(plane: Int, dim: Int): Double =
    ((splitmix64(plane.toLong * 0x9E3779B97F4A7C15L + dim) >>> 11).toDouble /
      (1L << 53).toDouble) * 2.0 - 1.0

  @inline final def isAsciiWs(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\u000B' || c == '\f' || c == '\r'

  /** Spark-semantics tokenization — `split(trim(s), "\s+")` with
    * Spark's SPACE-only trim and kept empty leading/trailing segments —
    * the ONE token definition shared by the MinHash/SimHash signature
    * kernels and the exact shingle-set verify kernels: the estimate and
    * the exact metric must measure the same shingle space (Java's
    * `String.trim` strips every control char <= 0x20 and silently
    * diverged on leading/trailing tabs or newlines, biasing
    * near-threshold candidate recall). */
  final def tokenize(text: String): Array[String] = {
    var a = 0
    var b = text.length
    while (a < b && text.charAt(a) == ' ') a += 1
    while (b > a && text.charAt(b - 1) == ' ') b -= 1
    val s = text.substring(a, b)
    if (s.isEmpty) Array("")
    else {
      val out = scala.collection.mutable.ArrayBuffer[String]()
      val sb = new java.lang.StringBuilder
      var i = 0
      val n = s.length
      while (i < n) {
        val c = s.charAt(i)
        if (isAsciiWs(c)) {
          out += sb.toString; sb.setLength(0)
          while (i + 1 < n && isAsciiWs(s.charAt(i + 1))) i += 1
        } else sb.append(c)
        i += 1
      }
      out += sb.toString
      out.toArray
    }
  }
}

/** Static kernels shared by interpreted eval and generated code —
  * `doGenCode` emits a single static call, so the expressions
  * participate in whole-stage codegen instead of falling back (a
  * fallback splits the codegen span and re-wraps rows per expression).
  * Element-type dispatch uses int codes fixed at plan time:
  * 0=float 1=double 2=long 3=int 4=short 5=byte (see elemCode). */
object Kernels {

  /** Every fixed-width numeric element type is supported — int8/int16
    * quantized embeddings included. checkInputDataTypes on the consuming
    * expressions mirrors this set, so an unsupported type is an analysis
    * error, never a driver-side throw from doGenCode. */
  def supportsElem(t: DataType): Boolean = t match {
    case ArrayType(FloatType | DoubleType | LongType | IntegerType |
                   ShortType | ByteType, _) => true
    case _ => false
  }

  def elemCode(t: DataType): Int = t.asInstanceOf[ArrayType].elementType match {
    case FloatType   => 0
    case DoubleType  => 1
    case LongType    => 2
    case IntegerType => 3
    case ShortType   => 4
    case ByteType    => 5
    case other => throw new IllegalArgumentException(s"unsupported element type $other")
  }

  @inline private def read(a: ArrayData, i: Int, code: Int): Double = code match {
    case 0 => a.getFloat(i).toDouble
    case 1 => a.getDouble(i)
    case 2 => a.getLong(i).toDouble
    case 3 => a.getInt(i).toDouble
    case 4 => a.getShort(i).toDouble
    case _ => a.getByte(i).toDouble
  }

  /** True when any of the first `n` slots is NULL. Array schemas almost
    * always infer containsNull=true even when no row carries one, so
    * the type check cannot refuse them — every vector kernel instead
    * returns NULL for an array with a null slot (reading it as 0 would
    * silently corrupt the result). */
  @inline private def anyNull(a: ArrayData, n: Int): Boolean = {
    var i = 0
    while (i < n) { if (a.isNullAt(i)) return true; i += 1 }
    false
  }

  def minhashSig(input: UTF8String, shingleLen: Int, numHashes: Int): ArrayData = {
    val toks = Hashing.tokenize(input.toString)
    val tokH = new Array[Long](toks.length)
    var i = 0
    while (i < toks.length) { tokH(i) = Hashing.hashString(toks(i)); i += 1 }
    val numShingles = if (toks.length < shingleLen) 1 else toks.length - shingleLen + 1
    val mins = Array.fill(numHashes)(Long.MaxValue)
    i = 0
    while (i < numShingles) {
      var h = 0x9E3779B97F4A7C15L
      val end = math.min(toks.length, i + shingleLen)
      var k = i
      while (k < end) { h = Hashing.splitmix64(h ^ tokH(k)); k += 1 }
      var p = 0
      while (p < numHashes) {
        val v = Hashing.splitmix64(h + p * 0xBF58476D1CE4E5B9L)
        if (v < mins(p)) mins(p) = v
        p += 1
      }
      i += 1
    }
    new GenericArrayData(mins)
  }

  def simhash(input: UTF8String): Long = {
    val toks = Hashing.tokenize(input.toString)
    val votes = new Array[Int](64)
    var i = 0
    while (i < toks.length) {
      val h = Hashing.hashString(toks(i))
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
        b += 1
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) { if (votes(b) > 0) out |= (1L << b); b += 1 }
    out
  }

  /** null (boxed) when the signatures have different lengths — mixing
    * signatures built with different numHashes would otherwise yield a
    * silently wrong prefix-only Jaccard estimate. */
  def agree(x: ArrayData, y: ArrayData): java.lang.Double = {
    val n = x.numElements()
    if (n != y.numElements()) return null
    if (n == 0) return java.lang.Double.valueOf(0.0)
    var eq = 0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      if (x.getLong(i) == y.getLong(i)) eq += 1
      i += 1
    }
    java.lang.Double.valueOf(eq.toDouble / n)
  }

  /** null (boxed) when either vector has zero norm — NaN would sort
    * ABOVE every value in a descending top-k window. */
  def cosine(x: ArrayData, y: ArrayData, cx: Int, cy: Int): java.lang.Double = {
    // mismatched dimensions (embeddings from different encoders joined
    // by id) would yield a plausible-but-wrong prefix-only similarity —
    // NULL instead, the same stance agree() documents
    val n = x.numElements()
    if (n != y.numElements()) return null
    var dot = 0.0; var nx = 0.0; var ny = 0.0
    var i = 0
    while (i < n) {
      // inline null probe: one pass, two predictable branches — a
      // separate anyNull pre-pass measurably doubled array reads in
      // this hottest kernel
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      val xv = read(x, i, cx); val yv = read(y, i, cy)
      dot += xv * yv; nx += xv * xv; ny += yv * yv
      i += 1
    }
    if (nx == 0.0 || ny == 0.0) null
    else {
      val r = dot / (math.sqrt(nx) * math.sqrt(ny))
      // NaN guard, same stance as the zero-norm guard: a corrupted
      // component (NaN, or an overflow-to-Inf pair yielding Inf/Inf)
      // would otherwise occupy the whole descending top-k — the exact
      // failure the NULL contract exists to prevent. One check on the
      // RESULT covers every propagation path.
      if (java.lang.Double.isNaN(r)) null else java.lang.Double.valueOf(r)
    }
  }

  /** Product-quantization encode: argmin-L2 code per contiguous
    * subvector against a flattened `[m][k][dim/m]` codebook. Strictly-
    * smaller comparison ⇒ the LOWEST code wins distance ties (the same
    * deterministic tie-break the SQL oracle's `ORDER BY d2, code`
    * expresses). Distances accumulate dimension-ascending, so any
    * engine replaying the same IEEE ops gets identical argmins. */
  def pqEncode(v: ArrayData, code: Int, cb: Array[Double], m: Int, k: Int): ArrayData = {
    val dim = v.numElements()
    require(m >= 1 && k >= 1, s"graft_pq_encode needs m >= 1 and k >= 1, got m=$m k=$k")
    require(dim % m == 0,
      s"graft_pq_encode: vector dim $dim is not divisible by m=$m subspaces")
    require(cb.length == k * dim,
      s"graft_pq_encode: codebook has ${cb.length} values, expected k*dim = ${k * dim} " +
        "(a vector dimension differing from the codebook's training dim would " +
        "index it with the wrong stride)")
    if (anyNull(v, dim)) return null
    val sub = dim / m
    val codes = new Array[Int](m)
    var mi = 0
    while (mi < m) {
      var best = 0
      var bestD = Double.MaxValue
      var ki = 0
      while (ki < k) {
        val base = (mi * k + ki) * sub
        var d2 = 0.0
        var j = 0
        while (j < sub) {
          val diff = read(v, mi * sub + j, code) - cb(base + j)
          d2 += diff * diff
          j += 1
        }
        if (d2 < bestD) { bestD = d2; best = ki }
        ki += 1
      }
      codes(mi) = best
      mi += 1
    }
    new GenericArrayData(codes)
  }

  /** Asymmetric-distance computation (ADC): squared L2 between a full
    * query vector and a PQ-coded candidate reconstructed from the
    * codebook — the scoring kernel of PQ search, one pass over the
    * query's dimensions. */
  def pqAdc(q: ArrayData, codes: ArrayData, cq: Int, cb: Array[Double],
      m: Int, k: Int): java.lang.Double = {
    val dim = q.numElements()
    require(m >= 1 && k >= 1, s"graft_pq_adc needs m >= 1 and k >= 1, got m=$m k=$k")
    require(dim % m == 0,
      s"graft_pq_adc: query dim $dim is not divisible by m=$m subspaces")
    require(cb.length == k * dim,
      s"graft_pq_adc: codebook has ${cb.length} values, expected k*dim = ${k * dim}")
    require(codes.numElements() == m,
      s"graft_pq_adc: code array has ${codes.numElements()} codes, expected m=$m")
    if (anyNull(q, dim) || anyNull(codes, m)) return null
    val sub = dim / m
    var total = 0.0
    var mi = 0
    while (mi < m) {
      val ki = codes.getInt(mi)
      require(ki >= 0 && ki < k,
        s"graft_pq_adc: code $ki at subspace $mi is outside [0, $k)")
      val base = (mi * k + ki) * sub
      var j = 0
      while (j < sub) {
        val diff = read(q, mi * sub + j, cq) - cb(base + j)
        total += diff * diff
        j += 1
      }
      mi += 1
    }
    java.lang.Double.valueOf(total)
  }

  /** Marker-word tables for the fused text-metrics kernel — MUST stay in
    * sync with `graft.ops.TextAnalysis.LangMarkers` (the regex form the
    * DuckDB oracles use). Order: en, de, fr, es. */
  private val langMarkers: Array[Array[String]] = Array(
    Array("the", "and", "of", "to", "is", "was"),
    Array("der", "und", "die", "nicht", "das", "ist"),
    Array("le", "la", "et", "les", "une", "est"),
    Array("el", "los", "una", "por", "las", "este"))

  @inline private def isAsciiWs(c: Char): Boolean = Hashing.isAsciiWs(c)

  @inline private def isWordChar(c: Char): Boolean =
    (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z') ||
      (c >= '0' && c <= '9') || c == '_'

  /** One fused pass computing every per-document text metric the
    * text-analysis operators need — replaces ~10 independent regex scans
    * (4 marker passes + alpha strip + token split + BPE-ish extract)
    * with two tight char loops (raw + lowercased). Semantics mirror
    * SPARK's (Java-regex) definitions exactly — pinned by the
    * fused-vs-regex equivalence spec — and the DuckDB oracles match on
    * every input except one documented boundary: Java's `\s` includes
    * U+000B (vertical tab) while DuckDB/RE2's does not, so a corpus
    * containing VT would tokenize differently in the oracle. The
    * in-engine contract (kernel ≡ Spark `split`/`regexp_*`) is the
    * authoritative one; the oracle agreement is exact for VT-free
    * corpora (all shipped testdata):
    *
    *  - score_xx: count of `\b(marker|…)\b` matches in lower(text) —
    *    i.e. maximal ASCII-word-char runs equal to a marker word;
    *  - n_chars: codepoint length (Spark `length`);
    *  - n_tokens: `size(split(trim(text), "\s+"))` with Spark/DuckDB
    *    semantics: `trim` strips SPACES only (not tabs/newlines) and
    *    `split` keeps empty leading/trailing segments, so the count is
    *    (number of `\s+` runs in the space-trimmed text) + 1;
    *  - n_bpe_tokens: matches of `[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]`
    *    (one match per non-ASCII codepoint, as a codepoint regex engine
    *    produces);
    *  - alpha_chars: count of Unicode LETTER codepoints (`\p{L}` —
    *    Character.isLetter), so CJK/Cyrillic/Arabic text scores a real
    *    alpha ratio instead of ≈0 and survives quality gates;
    *  - {latin,cyrillic,cjk,arabic}_chars: codepoints whose Unicode
    *    SCRIPT is Latin / Cyrillic / (Han|Hiragana|Katakana|Hangul) /
    *    Arabic — `[\p{Latin}]` etc. in an RE2/Java oracle. Non-ASCII
    *    codepoints pay one script lookup; the ASCII fast path doesn't.
    */
  def textMetrics(input: UTF8String): InternalRow = {
    val s = input.toString
    val n = s.length
    // token counting runs over the SPACE-trimmed span (Spark's trim
    // strips 0x20 only — "\t\n" survives trim and still splits)
    var tokStart = 0
    var tokEnd = n
    while (tokStart < tokEnd && s.charAt(tokStart) == ' ') tokStart += 1
    while (tokEnd > tokStart && s.charAt(tokEnd - 1) == ' ') tokEnd -= 1
    var nChars = 0L; var alpha = 0L; var wsRuns = 0L; var bpe = 0L
    var latin = 0L; var cyrillic = 0L; var cjk = 0L; var arabic = 0L
    var prevType = 0 // 0 ws, 1 ascii-alpha, 2 digit, 3 other
    var prevWasWsInSpan = false
    var i = 0
    while (i < n) {
      val c = s.charAt(i)
      val cp =
        if (Character.isHighSurrogate(c) && i + 1 < n &&
            Character.isLowSurrogate(s.charAt(i + 1))) s.codePointAt(i)
        else c.toInt
      nChars += 1
      val asciiLetter = (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z')
      val t =
        if (isAsciiWs(c)) 0
        else if (asciiLetter) 1
        else if (c >= '0' && c <= '9') 2
        else 3
      if (i >= tokStart && i < tokEnd) {
        if (t == 0 && !prevWasWsInSpan) wsRuns += 1
        prevWasWsInSpan = t == 0
      }
      t match {
        case 1 => if (prevType != 1) bpe += 1
        case 2 => if (prevType != 2) bpe += 1
        case 3 => bpe += 1
        case _ => ()
      }
      if (cp < 0x80) { // ASCII fast path: no table lookups
        if (asciiLetter) { alpha += 1; latin += 1 }
      } else {
        if (Character.isLetter(cp)) alpha += 1
        import java.lang.Character.{UnicodeScript => Us}
        Us.of(cp) match {
          case Us.LATIN    => latin += 1
          case Us.CYRILLIC => cyrillic += 1
          case Us.HAN | Us.HIRAGANA | Us.KATAKANA | Us.HANGUL => cjk += 1
          case Us.ARABIC   => arabic += 1
          case _           => ()
        }
      }
      prevType = t
      i += Character.charCount(cp)
    }
    // split-with-limit(-1) semantics: segments = separator runs + 1,
    // counting empty leading/trailing segments (matches both Spark's
    // split and DuckDB's regexp_split_to_array)
    val nTokens = wsRuns + 1L
    // marker scores over the lowercased text (the oracle regex runs on
    // lower(text)); ASCII-word-char runs compared against the tables
    val low = s.toLowerCase(java.util.Locale.ROOT)
    val m = low.length
    val scores = new Array[Long](4)
    var runStart = -1
    var j = 0
    while (j <= m) {
      val w = j < m && isWordChar(low.charAt(j))
      if (w && runStart < 0) runStart = j
      else if (!w && runStart >= 0) {
        val len = j - runStart
        var lang = 0
        while (lang < 4) {
          val words = langMarkers(lang)
          var k = 0
          while (k < words.length) {
            val wd = words(k)
            if (wd.length == len && low.regionMatches(runStart, wd, 0, len))
              scores(lang) += 1
            k += 1
          }
          lang += 1
        }
        runStart = -1
      }
      j += 1
    }
    InternalRow(scores(0), scores(1), scores(2), scores(3),
      nChars, nTokens, bpe, alpha, latin, cyrillic, cjk, arabic)
  }

  /** Spark-semantics tokenization for the shingle-Jaccard kernel:
    * `split(trim(s), "\s+")` where Spark's trim strips SPACES only and
    * split keeps empty leading/trailing segments (limit −1) — the exact
    * token list the column-level `Dedup.shingleSet` and the DuckDB
    * oracle (`trim` + `regexp_split_to_array`) produce. */
  private def sparkTokens(s0: String): Array[String] = Hashing.tokenize(s0)

  /** The ONE space-joined n-gram builder every gram kernel that EMITS
    * gram strings shares (shingle sets/lists, cross-document Jaccard/
    * containment): a change to the join discipline must land once, or
    * the estimate kernels silently desynchronize from the exact-verify
    * kernels. Kernels whose grams never leave the call (counts,
    * coverage, top-gram — [[ngramStats]]/[[dupNgramCov]]/[[ngramTop]]/
    * [[gopherRep]]) use the interned-id [[Gram]] windows below instead:
    * same equality, zero per-gram string building. */
  private def buildGram(toks: Array[String], i: Int, n: Int): String = {
    val sb = new java.lang.StringBuilder(toks(i))
    var k = 1
    while (k < n) { sb.append(' ').append(toks(i + k)); k += 1 }
    sb.toString
  }

  /** Dense per-document token ids: interning is injective within the
    * call, and tokens are whitespace-free, so id-WINDOW equality is
    * exactly space-joined gram-STRING equality ([[buildGram]]) — the
    * count/coverage kernels can compare O(n)-int windows instead of
    * building (and hashing) one concatenated String per gram per n. */
  private def internTokenIds(toks: Array[String]): Array[Int] = {
    val ids = new Array[Int](toks.length)
    val intern = new java.util.HashMap[String, Integer](
      math.max(8, toks.length * 2))
    var i = 0
    while (i < toks.length) {
      val nextId = Integer.valueOf(intern.size)
      val prev = intern.putIfAbsent(toks(i), nextId)
      ids(i) = if (prev == null) nextId.intValue else prev.intValue
      i += 1
    }
    ids
  }

  /** One n-gram as a window over the interned-id array — hash and
    * equality over the id window only (no string materialization).
    * Instances from ONE document/interning share the backing array;
    * never mix Grams across interning calls. */
  private final class Gram(val ids: Array[Int], val start: Int, val n: Int) {
    private[this] val h: Int = {
      var x = n
      var i = start
      val e = start + n
      while (i < e) { x = 31 * x + ids(i); i += 1 }
      x
    }
    override def hashCode: Int = h
    override def equals(o: Any): Boolean = o match {
      case g: Gram =>
        (g eq this) || (g.n == n && g.hashCode == h && {
          var i = 0
          var eq = true
          while (eq && i < n) {
            eq = ids(start + i) == g.ids(g.start + i); i += 1
          }
          eq
        })
      case _ => false
    }
  }

  private def shingleStrings(s: String, n: Int): java.util.HashSet[String] = {
    val toks = sparkTokens(s)
    val set = new java.util.HashSet[String]()
    if (toks.length < n) set.add(toks.mkString(" "))
    else {
      var i = 0
      while (i + n <= toks.length) {
        set.add(buildGram(toks, i, n))
        i += 1
      }
    }
    set
  }

  /** Distinct n-token shingle set as a string array — the kernel form
    * of `Dedup.shingleSet`'s column definition (whitespace tokens with
    * Spark trim/split semantics, one shingle of all tokens when fewer
    * than n, duplicates removed). One pass, one HashSet, no interpreted
    * lambda per shingle. Iteration order of the HashSet is irrelevant:
    * every consumer treats the result as a set (explode + equi-join). */
  def shingleSetArray(input: UTF8String, n: Int): ArrayData = {
    val set = shingleStrings(input.toString, n)
    val out = new Array[Any](set.size)
    val it = set.iterator()
    var i = 0
    while (it.hasNext) { out(i) = UTF8String.fromString(it.next()); i += 1 }
    new GenericArrayData(out)
  }

  /** ALL n-token grams of a text in document order, duplicates KEPT —
    * the multiset form a tokenizer-training pair count needs (the
    * distinct [[shingleSetArray]] would under-count repeated pairs).
    * Texts with fewer than n tokens yield an empty array: a 1-token
    * document has no adjacent pair and must contribute nothing. */
  def ngramListArray(input: UTF8String, n: Int): ArrayData = {
    val toks = sparkTokens(input.toString)
    if (toks.length < n) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](toks.length - n + 1)
    var i = 0
    while (i + n <= toks.length) {
      out(i) = UTF8String.fromString(buildGram(toks, i, n))
      i += 1
    }
    new GenericArrayData(out)
  }

  private val md5Local = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue: java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** Winnowing fingerprint selection (Schleimer et al. 2003) fused into
    * one pass — the kernel form of the `transform(sequence(...),
    * aggregate(..., least(...)))` Column pipeline that built, per row,
    * a gram-string array, an md5 Column call per gram, and a
    * window-sized struct fold per window position. Semantics are
    * BIT-IDENTICAL to that pipeline (and to the SQL oracles that replay
    * it): grams are the space-joined `k`-token runs of the Spark-
    * semantics token list ([[Hashing.tokenize]]), the gram hash is the
    * first 8 hex digits of md5 read as an unsigned 32-bit value
    * (`conv(substring(md5(g),1,8),16,10)`), each window of `window`
    * consecutive gram hashes selects its minimum with ties to the
    * RIGHTMOST position, and the distinct `(fp, fp_pos)` pairs emit in
    * first-occurrence window order (the `array_distinct` order).
    * Documents with fewer than `window + k - 1` tokens emit nothing.
    * Positions are 1-based gram indices, as before. */
  def winnowFps(input: UTF8String, k: Int, window: Int): ArrayData = {
    val toks = Hashing.tokenize(input.toString)
    if (toks.length < k) return new GenericArrayData(Array.empty[Any])
    val g = toks.length - k + 1
    if (g < window) return new GenericArrayData(Array.empty[Any])
    val tb = new Array[Array[Byte]](toks.length)
    var i = 0
    while (i < toks.length) {
      tb(i) = toks(i).getBytes(StandardCharsets.UTF_8); i += 1
    }
    val md = md5Local.get()
    val dig = new Array[Byte](16)
    val ghs = new Array[Long](g)
    i = 0
    while (i < g) {
      md.reset()
      var j = 0
      while (j < k) {
        if (j > 0) md.update(' '.toByte)
        md.update(tb(i + j))
        j += 1
      }
      md.digest(dig, 0, 16)
      ghs(i) = ((dig(0) & 0xffL) << 24) | ((dig(1) & 0xffL) << 16) |
        ((dig(2) & 0xffL) << 8) | (dig(3) & 0xffL)
      i += 1
    }
    // windowed rightmost-min; packed (pos << 32 | hash) dedupes the
    // (fp, fp_pos) pairs in first-occurrence order (hash fits 32 bits
    // by construction, positions are gram indices < 2^31)
    val seen = new java.util.LinkedHashSet[java.lang.Long]()
    var s = 0
    while (s + window <= g) {
      var bestH = Long.MaxValue
      var bestJ = -1
      var j = s
      while (j < s + window) {
        if (ghs(j) <= bestH) { bestH = ghs(j); bestJ = j }
        j += 1
      }
      seen.add((bestJ.toLong << 32) | bestH)
      s += 1
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    i = 0
    while (it.hasNext) {
      val packed = it.next().longValue()
      out(i) = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
        Array[Any](packed & 0xFFFFFFFFL, (packed >>> 32) + 1L))
      i += 1
    }
    new GenericArrayData(out)
  }

  /** md5-prefix bucket of the space-joined n-gram at `i` — the shared
    * arithmetic of the DSIR kernels: first 8 hex digits of md5 as an
    * unsigned 32-bit value (`conv(substring(md5(g),1,8),16,10)`), mod
    * `buckets`. The hash is non-negative, so `%` equals `pmod`. */
  @inline private def md5Bucket(md: java.security.MessageDigest,
      dig: Array[Byte], tb: Array[Array[Byte]], i: Int, n: Int,
      buckets: Int): Long = {
    md.reset()
    var k = 0
    while (k < n) {
      if (k > 0) md.update(' '.toByte)
      md.update(tb(i + k)); k += 1
    }
    md.digest(dig, 0, 16)
    val h = ((dig(0) & 0xffL) << 24) | ((dig(1) & 0xffL) << 16) |
      ((dig(2) & 0xffL) << 8) | (dig(3) & 0xffL)
    h % buckets
  }

  /** DSIR hashed unigram+bigram feature buckets of one document in ONE
    * pass — the kernel form of `transform(concat(ngramList(text, 1),
    * ngramList(text, 2)), w => pmod(portableHash32(w), buckets))`,
    * whose per-element md5 Column call ran through the interpreted
    * lambda walker. Order (all unigrams in token order, then all
    * bigrams) and values are bit-identical; texts with fewer than two
    * tokens contribute no bigrams, exactly like `ngramList(_, 2)`. */
  def dsirBuckets(input: UTF8String, buckets: Int): ArrayData = {
    val toks = Hashing.tokenize(input.toString)
    val nUni = toks.length
    val nBi = if (toks.length < 2) 0 else toks.length - 1
    val tb = new Array[Array[Byte]](toks.length)
    var i = 0
    while (i < toks.length) {
      tb(i) = toks(i).getBytes(StandardCharsets.UTF_8); i += 1
    }
    val md = md5Local.get()
    val dig = new Array[Byte](16)
    val out = new Array[Any](nUni + nBi)
    i = 0
    while (i < nUni) { out(i) = md5Bucket(md, dig, tb, i, 1, buckets); i += 1 }
    i = 0
    while (i < nBi) {
      out(nUni + i) = md5Bucket(md, dig, tb, i, 2, buckets); i += 1
    }
    new GenericArrayData(out)
  }

  /** DSIR importance log-weight of one document — Σ `llr(bucket)` over
    * the [[dsirBuckets]] features, summed in feature order, so the
    * IEEE-754 accumulation order (and therefore the rounded score)
    * matches the Column fold `aggregate(buckets, 0.0, acc +
    * element_at(table, b + 1))` bit-for-bit. */
  def dsirScore(input: UTF8String, llr: Array[Double]): Double = {
    val buckets = llr.length
    val toks = Hashing.tokenize(input.toString)
    val tb = new Array[Array[Byte]](toks.length)
    var i = 0
    while (i < toks.length) {
      tb(i) = toks(i).getBytes(StandardCharsets.UTF_8); i += 1
    }
    val md = md5Local.get()
    val dig = new Array[Byte](16)
    var sum = 0.0
    i = 0
    while (i < toks.length) {
      sum += llr(md5Bucket(md, dig, tb, i, 1, buckets).toInt); i += 1
    }
    i = 0
    while (i + 2 <= toks.length) {
      sum += llr(md5Bucket(md, dig, tb, i, 2, buckets).toInt); i += 1
    }
    sum
  }

  /** Apply an ordered BPE merge list to one document — the vocab-scale
    * tokenizer-apply kernel ([[BpeApply]]): tokens from the same
    * whitespace discipline as the other text kernels, then repeatedly
    * merge the LOWEST-RANK adjacent pair present, greedy left-to-right
    * within each rank pass. This is observationally identical to
    * replaying the merge list as sequential global replaces (a merged
    * pair can never re-emerge — merges only create strictly newer
    * tokens — so processing present ranks in ascending order replays
    * the sequential semantics while skipping the k - |distinct ranks
    * present| passes a composed-replace plan pays), and it is O(1) in
    * merge-list size at PLAN level: a 32k-vocab tokenizer is one
    * reference object, not 32k nested expressions. */
  def bpeApply(input: UTF8String, t: BpeTable): ArrayData = {
    var toks: Array[String] = sparkTokens(input.toString)
    if (t.size > 0) {
      var go = true
      while (go) {
        var best = Int.MaxValue
        var i = 0
        while (i < toks.length - 1) {
          val r = t.rank(toks(i), toks(i + 1))
          if (r < best) best = r
          i += 1
        }
        if (best == Int.MaxValue) go = false
        else {
          val l = t.lefts(best); val r = t.rights(best); val m = t.merged(best)
          val out = new scala.collection.mutable.ArrayBuffer[String](toks.length)
          i = 0
          while (i < toks.length) {
            if (i < toks.length - 1 && toks(i) == l && toks(i + 1) == r) {
              out += m; i += 2
            } else { out += toks(i); i += 1 }
          }
          toks = out.toArray
        }
      }
    }
    val out = new Array[Any](toks.length)
    var i = 0
    while (i < toks.length) { out(i) = UTF8String.fromString(toks(i)); i += 1 }
    new GenericArrayData(out)
  }

  /** Viterbi segmentation of one word under a unigram piece model:
    * the piece sequence maximizing the left-to-right PRODUCT of piece
    * probabilities, ties broken by fewer pieces then by the
    * lexicographically smallest U+0001-joined path. Products of
    * correctly-rounded doubles in a fixed association order are
    * bitwise engine-portable (unlike sums of `ln`s), and the composite
    * (score, count, path) order is prefix-stable, so a dynamic program
    * here equals the full-enumeration argmax a SQL oracle computes.
    * Returns null when the word cannot be covered by the table (a
    * character outside the training alphabet). */
  def unigramSegment(input: UTF8String, t: UnigramTable): ArrayData = {
    val w = input.toString
    val n = w.length
    if (n == 0) return new GenericArrayData(Array.empty[Any])
    val score = new Array[Double](n + 1)
    val count = new Array[Int](n + 1)
    val path = new Array[String](n + 1) // null = unreachable
    score(0) = 1.0; count(0) = 0; path(0) = ""
    var j = 1
    while (j <= n) {
      var i = math.max(0, j - t.maxLen)
      while (i < j) {
        if (path(i) != null) {
          val p = t.probMap.get(w.substring(i, j))
          if (p != null) {
            val s = score(i) * p.doubleValue()
            val k = count(i) + 1
            val pp =
              if (path(i).isEmpty) w.substring(i, j)
              else path(i) + "\u0001" + w.substring(i, j)
            val better = path(j) == null || s > score(j) ||
              (s == score(j) && (k < count(j) ||
                (k == count(j) && pp.compareTo(path(j)) < 0)))
            if (better) { score(j) = s; count(j) = k; path(j) = pp }
          }
        }
        i += 1
      }
      j += 1
    }
    if (path(n) == null) return null
    val pieces = path(n).split("\u0001")
    val out = new Array[Any](pieces.length)
    var k = 0
    while (k < pieces.length) { out(k) = UTF8String.fromString(pieces(k)); k += 1 }
    new GenericArrayData(out)
  }

  /** Total and distinct n-token shingle counts in one pass — the
    * repetition-ratio inputs (distinct/total is the Gopher-style
    * signal). Total counts duplicates: texts shorter than n tokens
    * count as one shingle. */
  def ngramStats(input: UTF8String, n: Int): InternalRow = {
    val toks = sparkTokens(input.toString)
    if (toks.length < n) return InternalRow(1L, 1L)
    val ids = internTokenIds(toks)
    val total = toks.length - n + 1
    val set = new java.util.HashSet[Gram](total * 2)
    var i = 0
    while (i + n <= toks.length) {
      set.add(new Gram(ids, i, n))
      i += 1
    }
    InternalRow(total.toLong, set.size.toLong)
  }

  /** struct(n_tokens, n_dup_tokens): token count plus the number of
    * token POSITIONS covered by an n-gram that occurs ≥2 times within
    * the same document — the Gopher dup-ngram-coverage signal, fused
    * into one pass. Replaces a corpus-wide (doc, gram) window + a
    * position-distinct shuffle with per-row O(tokens) work: gram counts
    * into a hash map, then a second sweep marks covered positions. */
  def dupNgramCov(input: UTF8String, n: Int): InternalRow = {
    val toks = sparkTokens(input.toString)
    val nt = toks.length.toLong
    if (toks.length < n) return InternalRow(nt, 0L)
    val ids = internTokenIds(toks)
    InternalRow(nt, dupCoverage(ids, toks.length, n))
  }

  /** Token positions covered by a ≥2-occurrence n-gram — the shared
    * core of [[dupNgramCov]] and [[gopherRep]]'s n=5..10 fields, over
    * already-interned ids. */
  private def dupCoverage(ids: Array[Int], nToks: Int, n: Int): Long = {
    val total = nToks - n + 1
    val grams = new Array[Gram](total)
    val counts = new java.util.HashMap[Gram, Int](total * 2)
    var i = 0
    while (i < total) {
      val g = new Gram(ids, i, n)
      grams(i) = g
      counts.merge(g, 1, Integer.sum)
      i += 1
    }
    val covered = new Array[Boolean](nToks)
    i = 0
    while (i < total) {
      if (counts.get(grams(i)) >= 2) {
        var k = 0
        while (k < n) { covered(i + k) = true; k += 1 }
      }
      i += 1
    }
    var dup = 0L
    i = 0
    while (i < nToks) { if (covered(i)) dup += 1; i += 1 }
    dup
  }

  /** All nine Gopher repetition signals in one kernel call — top-n-gram
    * concentration for n=2..4 ([[ngramTop]] semantics) and duplicated-
    * n-gram coverage for n=5..10 ([[dupNgramCov]] semantics) — sharing
    * ONE tokenize pass. The separate per-n kernel calls each paid a
    * full UTF8String→String copy plus re-tokenization of the document;
    * nine of them dominated `corpus_gopher_repetition`. Field values
    * are computed by the same per-n loops as the standalone kernels,
    * so every integer-threshold flag (and the SQL oracle) is
    * unchanged. Returns struct(n_tokens, top2_pos, top2_cnt, top3_pos,
    * top3_cnt, top4_pos, top4_cnt, dup5..dup10). */
  def gopherRep(input: UTF8String): InternalRow = {
    val toks = sparkTokens(input.toString)
    val nt = toks.length.toLong
    // tokens intern to dense ids ONCE (r20.2): the nine per-n maps then
    // hash O(n)-int windows instead of building one concatenated String
    // per gram per n — the interning is injective and tokens are
    // whitespace-free, so id-window equality IS gram-string equality
    // and every count below is bit-identical to the buildGram form
    val ids = if (toks.length >= 2) internTokenIds(toks) else null
    val out = new Array[Any](13)
    out(0) = nt
    var f = 1
    var n = 2
    while (n <= 4) { // ngramTop(n): (n_pos, top_count); short docs (0, 0)
      if (toks.length < n) { out(f) = 0L; out(f + 1) = 0L }
      else {
        val total = toks.length - n + 1
        val counts = new java.util.HashMap[Gram, Int](total * 2)
        var i = 0
        var top = 0
        while (i < total) {
          val c = counts.merge(new Gram(ids, i, n), 1, Integer.sum)
          if (c > top) top = c
          i += 1
        }
        out(f) = total.toLong; out(f + 1) = top.toLong
      }
      f += 2; n += 1
    }
    n = 5
    while (n <= 10) { // dupNgramCov(n): covered-position count; short docs 0
      out(f) = if (toks.length < n) 0L else dupCoverage(ids, toks.length, n)
      f += 1; n += 1
    }
    InternalRow.fromSeq(out.toIndexedSeq)
  }

  /** Adjacent token pairs of one BPE training-state string — the
    * per-round pair extraction of
    * [[graft.ops.TextAnalysis.bpeTrain]] fused into one pass. The
    * state string is `␁tok␁␁tok␁…` (U+0001 sentinels); this replicates
    * `split(regexp_replace(s, "^␁|␁$", ""), "␁␁")` (one leading and
    * one trailing sentinel stripped; every segment kept, trailing
    * empties included, exactly Spark's limit&nbsp;-1 split) and emits
    * `struct(l, r)` for each adjacent pair — empty when fewer than two
    * tokens, which replays the `size(t) >= 2` filter through the
    * explode. The Column form walked an interpreted
    * transform/element_at lambda per pair, per round. */
  def bpeAdjacentPairs(input: UTF8String): ArrayData = {
    var s = input.toString
    if (s.startsWith("\u0001")) s = s.substring(1)
    if (s.endsWith("\u0001")) s = s.substring(0, s.length - 1)
    // manual split on the literal two-sentinel separator, KEEPING
    // trailing empty segments (Spark split limit -1 semantics)
    val toks = new scala.collection.mutable.ArrayBuffer[String]()
    var from = 0
    var idx = s.indexOf("\u0001\u0001", from)
    while (idx >= 0) {
      toks += s.substring(from, idx)
      from = idx + 2
      idx = s.indexOf("\u0001\u0001", from)
    }
    toks += s.substring(from)
    if (toks.length < 2) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](toks.length - 1)
    var i = 0
    while (i < toks.length - 1) {
      out(i) = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
        Array[Any](UTF8String.fromString(toks(i)),
          UTF8String.fromString(toks(i + 1))))
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Excise covered token positions and rebuild the document in one
    * linear pass — the rebuild half of span-level dedup
    * ([[graft.ops.Dedup.exciseRepeatedSpans]]): `ts` is the document's
    * token array, `covered` the (possibly duplicated, unsorted) 1-based
    * positions to remove; returns struct(n_kept, text) with the kept
    * tokens space-joined in position order. Replaces a corpus-wide
    * posexplode → anti-join → collect_list/array_sort reassembly: the
    * decision data (covered spans) shuffles per document, the tokens
    * never leave their row. Sort + two-pointer walk = O(n + m log m),
    * no per-token hashing even for fully-covered documents. */
  def exciseTokens(ts: ArrayData, covered: ArrayData): InternalRow = {
    val n = ts.numElements()
    val m = covered.numElements()
    val cov = new Array[Long](m)
    var i = 0
    while (i < m) { cov(i) = covered.getLong(i); i += 1 }
    java.util.Arrays.sort(cov)
    val kept = new java.util.ArrayList[UTF8String](n)
    var ci = 0
    i = 0
    while (i < n) {
      val pos = i + 1L
      while (ci < m && cov(ci) < pos) ci += 1
      if (!(ci < m && cov(ci) == pos)) kept.add(ts.getUTF8String(i))
      i += 1
    }
    val sep = UTF8String.fromString(" ")
    val joined = UTF8String.concatWs(sep,
      kept.toArray(new Array[UTF8String](kept.size)): _*)
    InternalRow(kept.size.toLong, joined)
  }

  /** Exact Jaccard of the distinct n-token-shingle sets of two texts —
    * one kernel call per CANDIDATE pair (the LSH-verified set is tiny),
    * replacing interpreted higher-order array lambdas that dominated the
    * verify join. Matches `Dedup.shingleSet` + array_intersect/union
    * column semantics bit-for-bit (integer counts divided as doubles). */
  def shingleJaccard(a: UTF8String, b: UTF8String, n: Int): Double = {
    // PAIR-shared interning (r20.2): both sides' tokens intern through
    // one map, so cross-document Gram equality is exactly gram-string
    // equality and the per-pair cost drops the 2×grams string builds
    val intern = new java.util.HashMap[String, Integer](64)
    val sa = gramSetInterned(a.toString, n, intern, strict = false)
    val sb = gramSetInterned(b.toString, n, intern, strict = false)
    var inter = 0
    val it = sa.iterator()
    while (it.hasNext) if (sb.contains(it.next())) inter += 1
    val union = sa.size + sb.size - inter
    if (union == 0) 0.0 else inter.toDouble / union
  }

  /** Distinct shingle set over ids interned through the CALLER's map
    * (pair-shared, so Grams compare across the two documents of one
    * kernel call). strict=false adds [[shingleStrings]]' whole-document
    * fallback shingle for sub-n texts (as one whole-token-list window —
    * fallback strings only ever equal other same-length fallbacks,
    * since tokens are whitespace-free); strict=true is the ngramList
    * discipline (empty set below n tokens). */
  private def gramSetInterned(s: String, n: Int,
      intern: java.util.HashMap[String, Integer],
      strict: Boolean): java.util.HashSet[Gram] = {
    val toks = sparkTokens(s)
    val ids = new Array[Int](toks.length)
    var i = 0
    while (i < toks.length) {
      val nextId = Integer.valueOf(intern.size)
      val prev = intern.putIfAbsent(toks(i), nextId)
      ids(i) = if (prev == null) nextId.intValue else prev.intValue
      i += 1
    }
    val set = new java.util.HashSet[Gram](math.max(8, toks.length * 2))
    if (toks.length < n) {
      if (!strict) set.add(new Gram(ids, 0, toks.length))
    } else {
      i = 0
      while (i + n <= toks.length) {
        set.add(new Gram(ids, i, n))
        i += 1
      }
    }
    set
  }

  /** Top n-gram concentration: `(n_pos, top_count)` where `n_pos` is
    * the total number of n-gram positions and `top_count` the
    * occurrence count of the most frequent n-gram (0 when the document
    * has fewer than `n` tokens). `top_count / n_pos` is Gopher's
    * top-n-gram fraction — the "one phrase dominates the document"
    * repetition signal. One pass, one HashMap; the max count needs no
    * tie-break (it is unique regardless of which gram attains it). */
  def ngramTop(input: UTF8String, n: Int): InternalRow = {
    require(n >= 1, s"ngramTop needs n >= 1, got $n")
    val toks = sparkTokens(input.toString)
    if (toks.length < n) return InternalRow(0L, 0L)
    val ids = internTokenIds(toks)
    val total = toks.length - n + 1
    val counts = new java.util.HashMap[Gram, Int](total * 2)
    var i = 0
    var top = 0
    while (i < total) {
      val c = counts.merge(new Gram(ids, i, n), 1, Integer.sum)
      if (c > top) top = c
      i += 1
    }
    InternalRow(total.toLong, top.toLong)
  }

  /** Near-containment over strict distinct k-shingles:
    * `max(|A∩B|/|A|, |A∩B|/|B|)`, null when either side has no full
    * shingle (the `ngramList`-empty discipline — matches the Column
    * form this kernel replaces: `when(size(sa) > 0 && size(sb) > 0,
    * greatest(...))`). One fused pass — no per-pair array
    * materialization, no per-pair hash-set rebuild from a Column
    * lambda chain. */
  def shingleContainment(a: UTF8String, b: UTF8String, n: Int): java.lang.Double = {
    val intern = new java.util.HashMap[String, Integer](64)
    val sa = gramSetInterned(a.toString, n, intern, strict = true)
    val sb = gramSetInterned(b.toString, n, intern, strict = true)
    if (sa.isEmpty || sb.isEmpty) return null
    val (small, large) = if (sa.size <= sb.size) (sa, sb) else (sb, sa)
    var inter = 0
    val it = small.iterator()
    while (it.hasNext) if (large.contains(it.next())) inter += 1
    java.lang.Double.valueOf(
      math.max(inter.toDouble / sa.size, inter.toDouble / sb.size))
  }

  /** Round-half-away-from-zero without the `floor(y + 0.5)` edge bug
    * (0.49999999999999994 + 0.5 == 1.0 in doubles): matches Spark's
    * BigDecimal HALF_UP and DuckDB's round on every double. */
  @inline private def roundHalfAway(y: Double): Long = {
    val a = Math.abs(y)
    val f = Math.floor(a)
    val r = if (a - f >= 0.5) f + 1.0 else f
    (if (y < 0) -r else r).toLong
  }

  /** L2-normalize + micro-scale + CSV-serialize in ONE pass: returns
    * struct(unit_vec_micro: STRING — comma-joined round(x/‖v‖ × 10⁶)
    * integers, null for zero vectors — , l2_norm: DOUBLE raw). The
    * integer-CSV form is what keeps the driver's cross-engine hash
    * comparison exact (float formatting differs between engines);
    * the single fused loop replaces three interpreted lambda passes
    * that dominated the query. */
  def vecUnitCsv(v: ArrayData, code: Int): InternalRow = {
    val n = v.numElements()
    if (anyNull(v, n)) return null
    var ss = 0.0
    var i = 0
    while (i < n) { val x = read(v, i, code); ss += x * x; i += 1 }
    val norm = math.sqrt(ss)
    if (!(norm > 0.0)) return InternalRow(null, norm)
    val sb = new java.lang.StringBuilder(n * 8)
    i = 0
    while (i < n) {
      if (i > 0) sb.append(',')
      sb.append(roundHalfAway(read(v, i, code) / norm * 1e6))
      i += 1
    }
    InternalRow(UTF8String.fromString(sb.toString), norm)
  }

  /** Symmetric int8 quantization + CSV-serialize in ONE pass: returns
    * struct(q8_csv: STRING — comma-joined round(x × 127/max|x|) ints,
    * all zeros for zero vectors — , scale: DOUBLE 127/max|x|, null for
    * zero vectors). */
  def vecQuant8Csv(v: ArrayData, code: Int): InternalRow = {
    val n = v.numElements()
    if (anyNull(v, n)) return null
    var mx = 0.0
    var i = 0
    while (i < n) {
      val a = Math.abs(read(v, i, code))
      // a NaN component would slip the `a > mx` comparison (always
      // false), quantize to "0" via roundHalfAway(NaN), and emit a
      // VALID-LOOKING CSV that silently corrupts downstream hashes —
      // NULL out the whole row instead, the null-slot stance
      if (java.lang.Double.isNaN(a)) return null
      if (a > mx) mx = a
      i += 1
    }
    val sb = new java.lang.StringBuilder(n * 5)
    if (!(mx > 0.0)) {
      i = 0
      while (i < n) { if (i > 0) sb.append(','); sb.append('0'); i += 1 }
      return InternalRow(UTF8String.fromString(sb.toString), null)
    }
    val scale = 127.0 / mx
    i = 0
    while (i < n) {
      if (i > 0) sb.append(',')
      sb.append(roundHalfAway(read(v, i, code) * scale))
      i += 1
    }
    InternalRow(UTF8String.fromString(sb.toString), scale)
  }

  def lshBucket(v: ArrayData, planes: Int, code: Int): java.lang.Long = {
    val n = v.numElements()
    // one cheap bit-probe pass; the projection loops below read each
    // element `planes` times, so this pre-pass is already amortized
    if (anyNull(v, n)) return null
    var bucket = 0L
    var p = 0
    while (p < planes) {
      var proj = 0.0
      var d = 0
      while (d < n) { proj += read(v, d, code) * Hashing.planeComponent(p, d); d += 1 }
      if (proj >= 0) bucket |= (1L << p)
      p += 1
    }
    java.lang.Long.valueOf(bucket)
  }
}

/** MinHash signature straight from text: whitespace-tokenize, roll
  * `shingleLen`-token shingles (one shingle of all tokens when shorter),
  * hash each shingle by combining token hashes, and keep the minimum of
  * each of `numHashes` splitmix permutations. Duplicate shingles cannot
  * change a minimum, so no distinct pass is needed.
  */
case class ShingleMinHashSig(child: Expression, shingleLen: Int, numHashes: Int)
  extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    // plan-time constants validated at analysis (the NgramTop
    // rationale): shingleLen < 1 AIOOBEs in the kernel loop, a
    // negative numHashes throws NegativeArraySizeException
    if (shingleLen < 1 || numHashes < 1)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName needs shingleLen >= 1 and numHashes >= 1, " +
          s"got $shingleLen / $numHashes")
    else if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"$prettyName needs STRING, got ${child.dataType}")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_minhash_sig"

  override protected def nullSafeEval(input: Any): Any =
    Kernels.minhashSig(input.asInstanceOf[UTF8String], shingleLen, numHashes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.expressions.Kernels.minhashSig($c, $shingleLen, $numHashes)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** 64-bit SimHash over whitespace tokens: per-token 64-bit hash,
  * bit-majority vote. One pass, primitive vote counters. */
case class SimHash(child: Expression)
  extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"$prettyName needs STRING, got ${child.dataType}")
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_simhash"

  override protected def nullSafeEval(input: Any): Any =
    Kernels.simhash(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.Kernels.simhash($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Fraction of positions where two equal-length long arrays agree —
  * the MinHash signature-agreement Jaccard estimate. Mismatched lengths
  * (signatures from different numHashes) yield SQL NULL, not a wrong
  * prefix estimate. */
case class LongArrayAgree(left: Expression, right: Expression)
  extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(s"$prettyName needs ARRAY<BIGINT>, got $l / $r")
    }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_sig_agree"

  override def nullable: Boolean = true

  override protected def nullSafeEval(a: Any, b: Any): Any =
    Kernels.agree(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  // boxed-null → SQL NULL mapping, same pattern as CosineSim
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val boxed = ctx.freshName("agree")
      s"""
         |java.lang.Double $boxed = graft.expressions.Kernels.agree($a, $b);
         |if ($boxed == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = $boxed.doubleValue();
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Cosine similarity between two numeric arrays (float or double
  * elements) — dot product and both norms in a single pass. */
case class CosineSim(left: Expression, right: Expression)
  extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (Kernels.supportsElem(left.dataType) && Kernels.supportsElem(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs fixed-width numeric arrays, got ${left.dataType} / ${right.dataType}")
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_cosine_sim"

  @transient private lazy val codeL = Kernels.elemCode(left.dataType)
  @transient private lazy val codeR = Kernels.elemCode(right.dataType)

  override def nullable: Boolean = true

  override protected def nullSafeEval(a: Any, b: Any): Any =
    Kernels.cosine(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData],
      codeL, codeR)

  // custom codegen: the kernel returns a boxed Double whose null means
  // "undefined cosine" (zero-norm input), mapped to SQL NULL
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val boxed = ctx.freshName("cos")
      s"""
         |java.lang.Double $boxed =
         |  graft.expressions.Kernels.cosine($a, $b, $codeL, $codeR);
         |if ($boxed == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = $boxed.doubleValue();
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Exact n-token-shingle-set Jaccard between two text columns — the
  * MinHash-candidate verification metric as a single kernel call per
  * pair ([[Kernels.shingleJaccard]]). */
case class ShingleJaccard(left: Expression, right: Expression, shingleLen: Int)
  extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (shingleLen < 1)
      TypeCheckResult.TypeCheckFailure(s"$prettyName needs shingleLen >= 1, got $shingleLen")
    else (left.dataType, right.dataType) match {
      case (StringType, StringType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(s"$prettyName needs STRING, got $l / $r")
    }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_shingle_jaccard"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    Kernels.shingleJaccard(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String], shingleLen)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.expressions.Kernels.shingleJaccard($a, $b, $shingleLen)")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Fused near-containment verify kernel
  * ([[Kernels.shingleContainment]]): `max(|A∩B|/|A|, |A∩B|/|B|)` over
  * strict distinct k-shingles, SQL NULL when either side has no full
  * shingle. Replaces a per-pair Column chain (two `graft_ngram_list`
  * builds + `array_distinct` + `array_intersect` per candidate row)
  * that dominated `dedup_containment`'s verify stage. */
case class ShingleContainment(left: Expression, right: Expression, shingleLen: Int)
  extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (shingleLen < 1)
      TypeCheckResult.TypeCheckFailure(s"$prettyName needs shingleLen >= 1, got $shingleLen")
    else (left.dataType, right.dataType) match {
      case (StringType, StringType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(s"$prettyName needs STRING, got $l / $r")
    }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_shingle_containment"
  override def nullable: Boolean = true

  override protected def nullSafeEval(a: Any, b: Any): Any =
    Kernels.shingleContainment(
      a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String], shingleLen)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val boxed = ctx.freshName("cont")
      s"""
         |java.lang.Double $boxed =
         |  graft.expressions.Kernels.shingleContainment($a, $b, $shingleLen);
         |if ($boxed == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = $boxed.doubleValue();
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Fused winnowing-fingerprint selection ([[Kernels.winnowFps]]):
  * md5-derived gram hashes + rightmost-min window selection + distinct
  * (fp, fp_pos) pairs in one pass, replacing a per-row Column pipeline
  * of one md5 call per gram and one struct fold per window. */
case class WinnowFpsExpr(child: Expression, k: Int, window: Int)
  extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (k < 1 || window < 1)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName needs k >= 1 and window >= 1, got k=$k window=$window")
    else child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName needs STRING, got $other")
    }
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("fp", LongType, nullable = false),
    StructField("fp_pos", LongType, nullable = false))),
    containsNull = false)
  override def prettyName: String = "graft_winnow_fps"

  override protected def nullSafeEval(a: Any): Any =
    Kernels.winnowFps(a.asInstanceOf[UTF8String], k, window)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a =>
      s"graft.expressions.Kernels.winnowFps($a, $k, $window)")

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** BPE training-round pair extraction ([[Kernels.bpeAdjacentPairs]]). */
case class BpeAdjacentPairs(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName needs STRING, got $other")
    }
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("l", StringType, nullable = true),
    StructField("r", StringType, nullable = true))), containsNull = false)
  override def prettyName: String = "graft_bpe_adjacent_pairs"

  override protected def nullSafeEval(a: Any): Any =
    Kernels.bpeAdjacentPairs(a.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a =>
      s"graft.expressions.Kernels.bpeAdjacentPairs($a)")

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** Covered-position token excision ([[Kernels.exciseTokens]]). */
case class ExciseTokens(left: Expression, right: Expression)
  extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(StringType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName needs (ARRAY<STRING>, ARRAY<BIGINT>), got $l / $r")
    }
  override def dataType: DataType = StructType(Seq(
    StructField("n_kept", LongType, nullable = false),
    StructField("text", StringType, nullable = false)))
  override def prettyName: String = "graft_excise_tokens"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    Kernels.exciseTokens(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.expressions.Kernels.exciseTokens($a, $b)")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Fused Gopher repetition battery ([[Kernels.gopherRep]]): all nine
  * per-n signals from one tokenize pass. */
case class GopherRepExpr(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName needs STRING, got $other")
    }
  override def dataType: DataType = StructType(Seq(
    StructField("n_tokens", LongType, nullable = false),
    StructField("top2_pos", LongType, nullable = false),
    StructField("top2_cnt", LongType, nullable = false),
    StructField("top3_pos", LongType, nullable = false),
    StructField("top3_cnt", LongType, nullable = false),
    StructField("top4_pos", LongType, nullable = false),
    StructField("top4_cnt", LongType, nullable = false),
    StructField("dup5", LongType, nullable = false),
    StructField("dup6", LongType, nullable = false),
    StructField("dup7", LongType, nullable = false),
    StructField("dup8", LongType, nullable = false),
    StructField("dup9", LongType, nullable = false),
    StructField("dup10", LongType, nullable = false)))
  override def prettyName: String = "graft_gopher_rep"

  override protected def nullSafeEval(a: Any): Any =
    Kernels.gopherRep(a.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.expressions.Kernels.gopherRep($a)")

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** Fused DSIR feature-bucket list ([[Kernels.dsirBuckets]]). */
case class DsirBucketsExpr(child: Expression, buckets: Int)
  extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (buckets < 1)
      TypeCheckResult.TypeCheckFailure(s"$prettyName needs buckets >= 1, got $buckets")
    else child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName needs STRING, got $other")
    }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_dsir_buckets"

  override protected def nullSafeEval(a: Any): Any =
    Kernels.dsirBuckets(a.asInstanceOf[UTF8String], buckets)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a =>
      s"graft.expressions.Kernels.dsirBuckets($a, $buckets)")

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** Fused DSIR importance score ([[Kernels.dsirScore]]): the llr table
  * rides as one plan-time array reference, not a 1024-entry literal
  * array expression folded per feature. */
case class DsirScoreExpr(child: Expression, llr: Seq[Double])
  extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (llr.isEmpty)
      TypeCheckResult.TypeCheckFailure(s"$prettyName needs a non-empty llr table")
    else child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName needs STRING, got $other")
    }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_dsir_score"

  @transient private lazy val table: Array[Double] = llr.toArray

  override protected def nullSafeEval(a: Any): Any =
    Kernels.dsirScore(a.asInstanceOf[UTF8String], table)

  // the table is referenced from generated code via ctx.addReferenceObj,
  // the standard vehicle for plan-time constants too big to inline
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("dsirLlr", table, "double[]")
    defineCodeGen(ctx, ev, a =>
      s"graft.expressions.Kernels.dsirScore($a, $ref)")
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** One-pass L2-normalize + micro-int CSV + norm
  * ([[Kernels.vecUnitCsv]]). */
case class VecUnitMicroCsv(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (Kernels.supportsElem(child.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs a fixed-width numeric array, got ${child.dataType}")
  override def dataType: DataType = StructType(Seq(
    StructField("unit_vec_micro", StringType),
    StructField("l2_norm", DoubleType, nullable = false)))
  override def prettyName: String = "graft_vec_unit_csv"
  override def nullable: Boolean = true
  @transient private lazy val code = Kernels.elemCode(child.dataType)
  override protected def nullSafeEval(input: Any): Any =
    Kernels.vecUnitCsv(input.asInstanceOf[ArrayData], code)
  // null result (null slot in the vector) → SQL NULL
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val res = ctx.freshName("unitCsv")
      s"""
         |InternalRow $res = graft.expressions.Kernels.vecUnitCsv($c, $code);
         |if ($res == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = $res;
         |}
       """.stripMargin
    })
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** One-pass symmetric int8 quantization + CSV + scale
  * ([[Kernels.vecQuant8Csv]]). */
case class VecQuant8Csv(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (Kernels.supportsElem(child.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs a fixed-width numeric array, got ${child.dataType}")
  override def dataType: DataType = StructType(Seq(
    StructField("q8_csv", StringType, nullable = false),
    StructField("scale", DoubleType)))
  override def prettyName: String = "graft_vec_q8_csv"
  override def nullable: Boolean = true
  @transient private lazy val code = Kernels.elemCode(child.dataType)
  override protected def nullSafeEval(input: Any): Any =
    Kernels.vecQuant8Csv(input.asInstanceOf[ArrayData], code)
  // null result (null slot in the vector) → SQL NULL
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val res = ctx.freshName("q8Csv")
      s"""
         |InternalRow $res = graft.expressions.Kernels.vecQuant8Csv($c, $code);
         |if ($res == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = $res;
         |}
       """.stripMargin
    })
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Product-quantization encode ([[Kernels.pqEncode]]): a vector's `m`
  * argmin-L2 codes against a codebook fixed at plan time. The codebook
  * ships to executors once via the codegen reference array — not
  * re-serialized per row, not re-broadcast per batch. */
case class PqEncode(child: Expression, codebook: Seq[Double], m: Int, k: Int)
  extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (!Kernels.supportsElem(child.dataType))
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName needs a fixed-width numeric array, got ${child.dataType}")
    // the constants are PLAN-fixed: a bad m/k/codebook must be an
    // analysis error, not a task failure after the job launches (the
    // per-row dim checks in the kernel stay — dim is data)
    else if (m < 1 || k < 1)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName needs m >= 1 and k >= 1, got m=$m k=$k")
    else if (codebook.isEmpty || codebook.length % (m.toLong * k) != 0)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName: codebook has ${codebook.length} values — expected " +
          s"k*dim, a positive multiple of m*k = ${m * k}")
    else TypeCheckResult.TypeCheckSuccess
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "graft_pq_encode"

  override def nullable: Boolean = true

  @transient private lazy val code = Kernels.elemCode(child.dataType)
  @transient private lazy val cbArr: Array[Double] = codebook.toArray

  override protected def nullSafeEval(input: Any): Any =
    Kernels.pqEncode(input.asInstanceOf[ArrayData], code, cbArr, m, k)

  // null result (null slot in the vector) → SQL NULL, CosineSim pattern
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cbRef = ctx.addReferenceObj("pqCodebook", cbArr, "double[]")
    nullSafeCodeGen(ctx, ev, c => {
      val res = ctx.freshName("pqCodes")
      s"""
         |ArrayData $res =
         |  graft.expressions.Kernels.pqEncode($c, $code, $cbRef, $m, $k);
         |if ($res == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = $res;
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** PQ asymmetric distance ([[Kernels.pqAdc]]): squared L2 between a
  * full query vector (left) and a PQ code array (right) under the
  * plan-time codebook. */
case class PqAdc(left: Expression, right: Expression,
    codebook: Seq[Double], m: Int, k: Int)
  extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (l, r) if !(Kernels.supportsElem(l) &&
          r.isInstanceOf[ArrayType] &&
          r.asInstanceOf[ArrayType].elementType == IntegerType) =>
        TypeCheckResult.TypeCheckFailure(
          s"$prettyName needs (numeric array, ARRAY<INT>), got $l / $r")
      case _ if m < 1 || k < 1 =>
        TypeCheckResult.TypeCheckFailure(
          s"$prettyName needs m >= 1 and k >= 1, got m=$m k=$k")
      case _ if codebook.isEmpty || codebook.length % (m.toLong * k) != 0 =>
        TypeCheckResult.TypeCheckFailure(
          s"$prettyName: codebook has ${codebook.length} values — expected " +
            s"k*dim, a positive multiple of m*k = ${m * k}")
      case _ => TypeCheckResult.TypeCheckSuccess
    }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_pq_adc"

  override def nullable: Boolean = true

  @transient private lazy val cq = Kernels.elemCode(left.dataType)
  @transient private lazy val cbArr: Array[Double] = codebook.toArray

  override protected def nullSafeEval(a: Any, b: Any): Any =
    Kernels.pqAdc(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData],
      cq, cbArr, m, k)

  // boxed-null → SQL NULL (null slot in either array), CosineSim pattern
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cbRef = ctx.addReferenceObj("pqCodebook", cbArr, "double[]")
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val boxed = ctx.freshName("adc")
      s"""
         |java.lang.Double $boxed =
         |  graft.expressions.Kernels.pqAdc($a, $b, $cq, $cbRef, $m, $k);
         |if ($boxed == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = $boxed.doubleValue();
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Distinct n-token shingle set of a text as ARRAY<STRING>
  * ([[Kernels.shingleSetArray]]) — the explode-side of shingle joins
  * (decontamination, near-dup verification) without per-shingle
  * interpreted lambdas. */
case class ShingleSetExpr(child: Expression, shingleLen: Int)
  extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    // shingleLen is a plan-time constant: validate at analysis — a value
    // < 1 would throw an opaque AIOOBE inside executor tasks (the
    // NgramTop rationale, applied uniformly)
    if (shingleLen < 1)
      TypeCheckResult.TypeCheckFailure(s"$prettyName needs shingleLen >= 1, got ${shingleLen}")
    else if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"$prettyName needs STRING, got ${child.dataType}")
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_shingle_set"

  override protected def nullSafeEval(input: Any): Any =
    Kernels.shingleSetArray(input.asInstanceOf[UTF8String], shingleLen)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.expressions.Kernels.shingleSetArray($c, $shingleLen)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Ordered multiset of the n-token grams of a text as ARRAY<STRING>
  * ([[Kernels.ngramListArray]]) — the explode-side of global pair
  * counting (tokenizer-merge statistics), where repeats must count. */
case class NgramListExpr(child: Expression, n: Int) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    // n is a plan-time constant: validate at analysis — a value
    // < 1 would throw an opaque AIOOBE inside executor tasks (the
    // NgramTop rationale, applied uniformly)
    if (n < 1)
      TypeCheckResult.TypeCheckFailure(s"$prettyName needs n >= 1, got ${n}")
    else if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"$prettyName needs STRING, got ${child.dataType}")
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_ngram_list"

  override protected def nullSafeEval(input: Any): Any =
    Kernels.ngramListArray(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.expressions.Kernels.ngramListArray($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** struct(n_grams, n_distinct) of the n-token shingles of a text
  * ([[Kernels.ngramStats]]) — one pass for the repetition ratio. */
case class NgramStats(child: Expression, n: Int) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    // n is a plan-time constant: validate at analysis — a value
    // < 1 would throw an opaque AIOOBE inside executor tasks (the
    // NgramTop rationale, applied uniformly)
    if (n < 1)
      TypeCheckResult.TypeCheckFailure(s"$prettyName needs n >= 1, got ${n}")
    else if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"$prettyName needs STRING, got ${child.dataType}")
  override def dataType: DataType = StructType(Seq(
    StructField("n_grams", LongType, nullable = false),
    StructField("n_distinct", LongType, nullable = false)))
  override def prettyName: String = "graft_ngram_stats"

  override protected def nullSafeEval(input: Any): Any =
    Kernels.ngramStats(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.Kernels.ngramStats($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** struct(n_tokens, n_dup_tokens) — within-document duplicated-n-gram
  * token coverage ([[Kernels.dupNgramCov]]): the whole
  * `text_dup_ngram_frac` signal as one narrow codegen'd pass instead of
  * a corpus-wide (doc, gram) window plus a position-distinct shuffle. */
case class DupNgramCov(child: Expression, n: Int) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    // n is a plan-time constant: validate at analysis — a value
    // < 1 would throw an opaque AIOOBE inside executor tasks (the
    // NgramTop rationale, applied uniformly)
    if (n < 1)
      TypeCheckResult.TypeCheckFailure(s"$prettyName needs n >= 1, got ${n}")
    else if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"$prettyName needs STRING, got ${child.dataType}")
  override def dataType: DataType = StructType(Seq(
    StructField("n_tokens", LongType, nullable = false),
    StructField("n_dup_tokens", LongType, nullable = false)))
  override def prettyName: String = "graft_dup_ngram_cov"

  override protected def nullSafeEval(input: Any): Any =
    Kernels.dupNgramCov(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.Kernels.dupNgramCov($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Top n-gram concentration ([[Kernels.ngramTop]]):
  * struct(n_pos, top_count) — Gopher's top-n-gram repetition signal as
  * one fused pass. */
case class NgramTop(child: Expression, n: Int) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    // n is validated HERE, at analysis time: n=0 would slip past the
    // kernel's toks.length<n guard and throw AIOOBE inside executor
    // tasks — an opaque task failure instead of a plannable error.
    if (n < 1)
      TypeCheckResult.TypeCheckFailure(s"$prettyName needs n >= 1, got $n")
    else if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"$prettyName needs STRING, got ${child.dataType}")
  override def dataType: DataType = StructType(Seq(
    StructField("n_pos", LongType, nullable = false),
    StructField("top_count", LongType, nullable = false)))
  override def prettyName: String = "graft_ngram_top"

  override protected def nullSafeEval(input: Any): Any =
    Kernels.ngramTop(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.Kernels.ngramTop($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Fused per-document text metrics — marker-language scores, codepoint
  * length, whitespace-token count, BPE-ish token count, Unicode-letter
  * count, per-script counts — in a single struct from one kernel call
  * ([[Kernels.textMetrics]]). Replaces the r1 stack of ~10 regex scans
  * that dominated `corpus_filter` / `text_langid` bench time. */
case class TextMetrics(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"$prettyName needs STRING, got ${child.dataType}")
  override def dataType: DataType = TextMetrics.schema
  override def prettyName: String = "graft_text_metrics"

  override protected def nullSafeEval(input: Any): Any =
    Kernels.textMetrics(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.Kernels.textMetrics($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object TextMetrics {
  val schema: StructType = StructType(Seq(
    "score_en", "score_de", "score_fr", "score_es",
    "n_chars", "n_tokens", "n_bpe_tokens", "alpha_chars",
    "latin_chars", "cyrillic_chars", "cjk_chars", "arabic_chars")
    .map(StructField(_, LongType, nullable = false)))
}

/** Random-hyperplane LSH bucket: bit p = sign of the projection onto a
  * deterministic pseudo-random plane; `planes` bits packed into a long.
  * Plane components derive from (plane, dim) — no plane matrix shipped. */
case class HyperplaneLshBucket(child: Expression, planes: Int)
  extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    // planes is a plan-time constant: validate HERE — planes > 64 would
    // alias bits through the JVM's shift-mod-64 (plane 64 ORs into
    // plane 0's bit, silently corrupting bucket assignments), and
    // planes < 1 would bucket everything together
    if (planes < 1 || planes > 64)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName needs planes in [1, 64], got $planes")
    else if (Kernels.supportsElem(child.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs a fixed-width numeric array, got ${child.dataType}")
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_lsh_bucket"

  override def nullable: Boolean = true

  @transient private lazy val code = Kernels.elemCode(child.dataType)

  override protected def nullSafeEval(input: Any): Any =
    Kernels.lshBucket(input.asInstanceOf[ArrayData], planes, code)

  // boxed-null → SQL NULL (array with a null slot), CosineSim pattern
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val boxed = ctx.freshName("bucket")
      s"""
         |java.lang.Long $boxed =
         |  graft.expressions.Kernels.lshBucket($c, $planes, $code);
         |if ($boxed == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = $boxed.longValue();
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** The broadcast-able merge-rank table behind [[BpeApply]] /
  * [[Kernels.bpeApply]]: parallel left/right token arrays in LEARNED
  * ORDER (index = rank), a lazily-rebuilt pair→rank hash (transient —
  * rebuilt per executor after deserialization), and the precomputed
  * merged-token strings. Rank lookup keys join tokens with U+0001 - the
  * same cannot-appear-in-a-token assumption the sentinel replace
  * encoding made. Duplicate pairs keep their FIRST (lowest) rank. */
final class BpeTable(val lefts: Array[String], val rights: Array[String])
  extends Serializable {
  require(lefts.length == rights.length,
    "left/right merge arrays must align")
  val size: Int = lefts.length
  // transient like rankMap: derivable from lefts/rights, so shipping
  // the precomputed concatenations would roughly double the
  // serialized table (32k merges = 32k extra strings per task deser)
  @transient private lazy val mergedArr: Array[String] =
    Array.tabulate(size)(i => lefts(i) + " " + rights(i))
  @transient private lazy val rankMap: java.util.HashMap[String, Integer] = {
    val m = new java.util.HashMap[String, Integer](size * 2)
    var i = 0
    while (i < size) {
      m.putIfAbsent(lefts(i) + "\u0001" + rights(i), Integer.valueOf(i))
      i += 1
    }
    m
  }
  def rank(l: String, r: String): Int = {
    val v = rankMap.get(l + "\u0001" + r)
    if (v == null) Int.MaxValue else v.intValue()
  }
  def merged(i: Int): String = mergedArr(i)
}

/** The broadcast-able piece→probability table behind
  * [[UnigramSegment]] / [[Kernels.unigramSegment]]: parallel
  * piece/prob arrays, a lazily-rebuilt hash (transient — rebuilt per
  * executor after deserialization), and the max piece length bounding
  * the DP inner loop. */
final class UnigramTable(val pieces: Array[String], val probs: Array[Double])
  extends Serializable {
  require(pieces.length == probs.length, "piece/prob arrays must align")
  val size: Int = pieces.length
  val maxLen: Int =
    if (pieces.isEmpty) 0 else pieces.iterator.map(_.length).max
  @transient lazy val probMap: java.util.HashMap[String, java.lang.Double] = {
    val m = new java.util.HashMap[String, java.lang.Double](size * 2)
    var i = 0
    while (i < size) { m.putIfAbsent(pieces(i), probs(i)); i += 1 }
    m
  }
}

/** Vocab-scale BPE apply ([[Kernels.bpeApply]]): tokenizes a document
  * with a learned merge list held as ONE reference object — plan depth
  * and codegen size are O(1) in merge count, versus the k nested
  * sentinel `replace`s the composed-Column encoding costs (a 32k-vocab
  * tokenizer would be thousands of expressions deep there). Same
  * observable semantics (spec'd against the sequential reference). */
case class BpeApply(child: Expression, merges: Seq[(String, String)])
  extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs STRING, got ${child.dataType}")
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_bpe_apply"

  @transient private lazy val table =
    new BpeTable(merges.map(_._1).toArray, merges.map(_._2).toArray)

  override protected def nullSafeEval(input: Any): Any =
    Kernels.bpeApply(input.asInstanceOf[UTF8String], table)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val tRef = ctx.addReferenceObj("bpeTable", table,
      classOf[BpeTable].getName)
    defineCodeGen(ctx, ev, c =>
      s"graft.expressions.Kernels.bpeApply($c, $tRef)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Unigram-LM Viterbi segmentation ([[Kernels.unigramSegment]]): the
  * piece table rides as ONE reference object (plan/codegen size O(1)
  * in vocab size, the [[BpeApply]] discipline). Null for words the
  * table cannot cover. */
case class UnigramSegment(child: Expression, pieces: Seq[String],
    probs: Seq[Double]) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (pieces.length != probs.length)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName needs aligned piece/prob arrays " +
          s"(${pieces.length} vs ${probs.length})")
    else if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs STRING, got ${child.dataType}")
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_unigram_segment"

  @transient private lazy val table =
    new UnigramTable(pieces.toArray, probs.toArray)

  override protected def nullSafeEval(input: Any): Any =
    Kernels.unigramSegment(input.asInstanceOf[UTF8String], table)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val tRef = ctx.addReferenceObj("unigramTable", table,
      classOf[UnigramTable].getName)
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.expressions.Kernels.unigramSegment($c, $tRef);
      ${ev.isNull} = ${ev.value} == null;""")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Registration: the expressions are exposed as SQL functions so library
  * code reaches them via `call_function` on ANY session.
  *
  * Two routes, same builders:
  *   - [[GraftExtensions]] for `spark.sql.extensions` /
  *     `SparkSession.builder.withExtensions` (the idiomatic plug-in path);
  *   - [[GraftExpressions.ensureRegistered]] for live sessions the caller
  *     did not construct (the library calls it from `Tables.configure`).
  */
object GraftExpressions {

  private def lit(e: Expression): Int =
    e.eval(null) match {
      case i: Int  => i
      case l: Long =>
        // toInt WRAPS out-of-range longs (4294967297L.toInt == 1) —
        // a wrapped hash count would pass the >= 1 checks and run
        // silently wrong; refuse instead
        require(l.isValidInt,
          s"integer literal out of Int range: $l")
        l.toInt
      case other   => throw new IllegalArgumentException(
        s"expected integer literal, got $other")
    }

  private def lits(e: Expression): Seq[String] =
    e.eval(null).asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      .toObjectArray(StringType).map(_.toString).toSeq

  private def dlits(e: Expression): Seq[Double] =
    e.eval(null).asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      .toDoubleArray().toSeq

  // declared arity per function: the builders below index es(1)/es(2)
  // positionally, so a wrong argument count would surface as a bare
  // IndexOutOfBoundsException with no function name — the wrapper in
  // `builders` turns it into a named arity error at plan time
  private val arities: Map[String, Int] = Map(
    "graft_minhash_sig" -> 3, "graft_simhash" -> 1,
    "graft_sig_agree" -> 2, "graft_cosine_sim" -> 2,
    "graft_lsh_bucket" -> 2, "graft_text_metrics" -> 1,
    "graft_shingle_jaccard" -> 3, "graft_shingle_containment" -> 3,
    "graft_shingle_set" -> 2, "graft_ngram_stats" -> 2,
    "graft_dup_ngram_cov" -> 2, "graft_ngram_top" -> 2,
    "graft_ngram_list" -> 2, "graft_vec_unit_csv" -> 1,
    "graft_vec_q8_csv" -> 1, "graft_pq_encode" -> 4,
    "graft_bpe_apply" -> 3, "graft_unigram_segment" -> 3,
    "graft_pq_adc" -> 5, "graft_bloom_agg" -> 3,
    "graft_bloom_might_contain" -> 2, "graft_xpath_struct" -> 5,
    "graft_winnow_fps" -> 3, "graft_dsir_buckets" -> 2,
    "graft_dsir_score" -> 2, "graft_gopher_rep" -> 1,
    "graft_excise_tokens" -> 2, "graft_bpe_adjacent_pairs" -> 1)

  private val rawBuilders: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "graft_minhash_sig" -> (es => ShingleMinHashSig(es.head, lit(es(1)), lit(es(2)))),
    "graft_simhash"     -> (es => SimHash(es.head)),
    "graft_sig_agree"   -> (es => LongArrayAgree(es.head, es(1))),
    "graft_cosine_sim"  -> (es => CosineSim(es.head, es(1))),
    "graft_lsh_bucket"  -> (es => HyperplaneLshBucket(es.head, lit(es(1)))),
    "graft_text_metrics" -> (es => TextMetrics(es.head)),
    "graft_shingle_jaccard" -> (es => ShingleJaccard(es.head, es(1), lit(es(2)))),
    "graft_shingle_containment" -> (es => ShingleContainment(es.head, es(1), lit(es(2)))),
    "graft_shingle_set" -> (es => ShingleSetExpr(es.head, lit(es(1)))),
    "graft_ngram_stats" -> (es => NgramStats(es.head, lit(es(1)))),
    "graft_dup_ngram_cov" -> (es => DupNgramCov(es.head, lit(es(1)))),
    "graft_ngram_top"   -> (es => NgramTop(es.head, lit(es(1)))),
    "graft_ngram_list"  -> (es => NgramListExpr(es.head, lit(es(1)))),
    "graft_vec_unit_csv" -> (es => VecUnitMicroCsv(es.head)),
    "graft_vec_q8_csv"   -> (es => VecQuant8Csv(es.head)),
    "graft_pq_encode"    -> (es => PqEncode(es.head, dlits(es(1)), lit(es(2)), lit(es(3)))),
    "graft_bpe_apply"    -> (es => {
      val l = lits(es(1)); val r = lits(es(2))
      require(l.length == r.length,
        s"graft_bpe_apply: left/right merge arrays differ in length " +
          s"(${l.length} vs ${r.length}) — a silent zip-truncation would " +
          "drop merges and tokenize wrongly")
      BpeApply(es.head, l.zip(r))
    }),
    "graft_unigram_segment" -> (es =>
      UnigramSegment(es.head, lits(es(1)), dlits(es(2)))),
    "graft_pq_adc"       -> (es => PqAdc(es.head, es(1), dlits(es(2)), lit(es(3)), lit(es(4)))),
    // Spark's own runtime-filter bloom expressions, surfaced under
    // graft names (they are not in the public registry): the standard
    // scale tool for "does this value appear in that big set" without
    // shuffling the probe side. Aggregate → binary filter; the probe
    // expects the SAME xxhash64 pre-hash on both sides.
    "graft_bloom_agg" -> (es =>
      new org.apache.spark.sql.catalyst.expressions.aggregate
        .BloomFilterAggregate(es.head, es(1), es(2))),
    "graft_bloom_might_contain" -> (es =>
      org.apache.spark.sql.catalyst.expressions
        .BloomFilterMightContain(es.head, es(1))),
    "graft_xpath_struct" -> (es => {
      val names = lits(es(1)); val paths = lits(es(2))
      val prefixes = lits(es(3)); val uris = lits(es(4))
      require(names.length == paths.length,
        s"graft_xpath_struct: ${names.length} field names vs " +
          s"${paths.length} paths — a silent zip-truncation would drop fields")
      require(prefixes.length == uris.length,
        s"graft_xpath_struct: ${prefixes.length} namespace prefixes vs " +
          s"${uris.length} uris — unresolved prefixes would fail every row")
      XPathStructNs(es.head, names.zip(paths), prefixes.zip(uris).toMap)
    }),
    "graft_winnow_fps" -> (es => WinnowFpsExpr(es.head, lit(es(1)), lit(es(2)))),
    "graft_dsir_buckets" -> (es => DsirBucketsExpr(es.head, lit(es(1)))),
    "graft_dsir_score" -> (es => DsirScoreExpr(es.head, dlits(es(1)))),
    "graft_gopher_rep" -> (es => GopherRepExpr(es.head)),
    "graft_excise_tokens" -> (es => ExciseTokens(es.head, es(1))),
    "graft_bpe_adjacent_pairs" -> (es => BpeAdjacentPairs(es.head)))

  val builders: Seq[(String, Seq[Expression] => Expression)] =
    rawBuilders.map { case (name, f) =>
      val n = arities(name)
      name -> ((es: Seq[Expression]) => {
        require(es.length == n,
          s"$name expects $n arguments, got ${es.length}")
        f(es)
      })
    }

  def ensureRegistered(spark: SparkSession): Unit = synchronized {
    val registry = spark.sessionState.functionRegistry
    builders.foreach { case (name, builder) =>
      val id = FunctionIdentifier(name)
      if (!registry.functionExists(id)) {
        registry.registerFunction(id,
          new ExpressionInfo(GraftExpressions.getClass.getName, name), builder)
      }
    }
  }
}

/** `spark.sql.extensions`-compatible injector. */
class GraftExtensions extends (org.apache.spark.sql.SparkSessionExtensions => Unit) {
  override def apply(ext: org.apache.spark.sql.SparkSessionExtensions): Unit =
    GraftExpressions.builders.foreach { case (name, builder) =>
      ext.injectFunction((FunctionIdentifier(name),
        new ExpressionInfo(GraftExpressions.getClass.getName, name), builder))
    }
}
