package graft.functions

import graft.core.{Blake2b, Metadata, Translator}
import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block.BlockHelper
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.Types.AbstractDataType
import org.apache.spark.sql.types.{ArrayType, BinaryType, DataType, DoubleType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** blake2b-16 hex digest as a native Catalyst expression.
  *
  * The reference's content hash (C6, `dlfile.py:221-235`) has no Spark
  * builtin. A native `Expression` with `doGenCode` keeps it inside
  * whole-stage codegen (a Scala UDF would break the codegen span and add
  * serialization overhead per row) — used by verification/re-hash jobs
  * over content columns.
  */
case class Blake2bExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "blake2b"

  override protected def nullSafeEval(input: Any): Any =
    UTF8String.fromString(
      Blake2b.hexDigest(input.asInstanceOf[Array[Byte]]))

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"UTF8String.fromString(graft.core.Blake2b.hexDigest($c, 16))")

  override protected def withNewChildInternal(newChild: Expression): Blake2bExpr =
    copy(child = newChild)
}

/** Dot product of two `array<double>` columns as a native codegen'd
  * expression — the inner loop of every cosine/ANN operator.
  *
  * The builtin spelling, `aggregate(zip_with(a, b, (x,y) -> x*y), 0D,
  * (acc,x) -> acc+x)`, is an interpreted higher-order function: per pair
  * it allocates the zipped array and evaluates two lambdas per element —
  * the exact scale hazard SCALE.md documents. This expression is one
  * fused multiply-add loop over the ArrayData (no allocation, inside
  * whole-stage codegen) computing the IDENTICAL left-to-right IEEE
  * double sum, so results — and the micro-scaled BIGINT oracle hashes
  * derived from them — are bit-for-bit unchanged (DuckDB's
  * `list_inner_product` sums in the same order).
  *
  * Semantics — identical to the HOF spelling on every input: null if
  * either array is null, null if the lengths differ (zip_with pads the
  * shorter side with null, so the aggregate is null), and null if any
  * consumed element is null. The element-null check is gated on the
  * inputs' `containsNull` so provably-dense arrays skip it; for dense
  * data the branch is never taken and stays predictable.
  */
case class DotProductExpr(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "vector_dot"

  // ragged lengths / element nulls yield null even from non-null inputs
  override def nullable: Boolean = true

  // implicit coercion: vector_dot(embedding, embedding) on an
  // array<float> column gets a proper element-widening cast inserted at
  // analysis (reading float slots as doubles would be silently wrong),
  // and non-array arguments fail analysis instead of at runtime
  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(DoubleType), ArrayType(DoubleType))

  private def elementsNullable: Boolean = Seq(left, right).exists {
    _.dataType match {
      case ArrayType(_, cn) => cn
      case _ => true
    }
  }

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (y.numElements() != n) return null
    var sum = 0.0
    var i = 0
    if (elementsNullable) {
      while (i < n) {
        if (x.isNullAt(i) || y.isNullAt(i)) return null
        sum += x.getDouble(i) * y.getDouble(i)
        i += 1
      }
    } else {
      while (i < n) {
        sum += x.getDouble(i) * y.getDouble(i)
        i += 1
      }
    }
    sum
  }

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val sum = ctx.freshName("sum")
      val nullCheck =
        if (elementsNullable)
          s"if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }"
        else ""
      s"""
         |int $n = $a.numElements();
         |if ($b.numElements() != $n) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $sum = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $nullCheck
         |    $sum += $a.getDouble($i) * $b.getDouble($i);
         |  }
         |  if (!${ev.isNull}) {
         |    ${ev.value} = $sum;
         |  }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProductExpr =
    copy(left = newLeft, right = newRight)
}

/** Intersection size of two ASC-sorted `array<string>` columns as one
  * native codegen'd linear merge — the verify kernel of the
  * prefix-filtered exact Jaccard join
  * ([[graft.operators.Dedup.jaccardSelfJoin]]).
  *
  * The builtin spelling, `size(array_intersect(a, b))`, is interpreted:
  * per ROW it allocates a hash set over one side and an output array for
  * an intersection whose only consumer is `size` — measured ~7 µs/row on
  * 23-element arrays, which made the pair-verify step the dominant cost
  * of q_ngram_jaccard (4 s of a ~6 s query at sf0.1). This expression is
  * a zero-allocation two-pointer merge inside whole-stage codegen.
  *
  * PRECONDITION: both arrays' NON-NULL elements sorted ascending by
  * UTF8String binary order (`sort_array`'s StringType ordering) and
  * distinct — the caller sorts; this is an internal kernel, not a
  * general function. For null-free inputs the count is identical to
  * `size(array_intersect(a, b))`. Null ELEMENTS are SKIPPED wherever
  * they sit (`sort_array` asc puts them FIRST, `array_sort` LAST — the
  * merge tolerates both): SQL equality never matches null, which is the
  * join-on-token semantics this kernel replaces (`array_intersect`, by
  * contrast, treats null∩null as a match — callers with nullable
  * elements get the JOIN count here, deliberately). Null INPUTS yield
  * null via the standard null-intolerant contract. */
case class SortedIntersectSizeExpr(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {

  override def dataType: DataType = org.apache.spark.sql.types.IntegerType
  override def prettyName: String = "sorted_intersect_size"
  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(StringType), ArrayType(StringType))

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    val m = y.numElements()
    var i = 0
    var j = 0
    var c = 0
    while (i < n && j < m) {
      if (x.isNullAt(i)) i += 1
      else if (y.isNullAt(j)) j += 1
      else {
        val cmp = x.getUTF8String(i).compareTo(y.getUTF8String(j))
        if (cmp == 0) { c += 1; i += 1; j += 1 }
        else if (cmp < 0) i += 1
        else j += 1
      }
    }
    c
  }

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val m = ctx.freshName("m")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val c = ctx.freshName("c")
      val cmp = ctx.freshName("cmp")
      s"""
         |int $n = $a.numElements();
         |int $m = $b.numElements();
         |int $i = 0, $j = 0, $c = 0;
         |while ($i < $n && $j < $m) {
         |  if ($a.isNullAt($i)) { $i++; }
         |  else if ($b.isNullAt($j)) { $j++; }
         |  else {
         |    int $cmp = $a.getUTF8String($i).compareTo($b.getUTF8String($j));
         |    if ($cmp == 0) { $c++; $i++; $j++; }
         |    else if ($cmp < 0) $i++;
         |    else $j++;
         |  }
         |}
         |${ev.value} = $c;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedIntersectSizeExpr =
    copy(left = newLeft, right = newRight)
}

/** Static kernel behind [[DfPrefixExpr]] — kept as a plain object so the
  * generated code calls one method (the Blake2b static-forwarder
  * pattern) and eval/codegen share the single implementation. */
object DfPrefix {

  /** The All-Pairs prefix of one record's word set under the broadcast
    * df order: the first `|x| - ceil(|x|*num/den) + 1` words sorted by
    * (document frequency asc, word asc in UTF8String binary order) —
    * exactly the rows the shuffle-path `row_number` window keeps in
    * [[graft.operators.Dedup]]. `vocab`/`dfs` are parallel arrays,
    * `vocab` sorted ascending (binary search). Null elements are
    * skipped (they can never join — SQL equality never matches null —
    * matching the shuffle path, where a null token drops out of the
    * dfreq join) but still count toward `|x|` for the prefix length,
    * as `size(words)` does. A word absent from the vocab violates the
    * caller's contract (the df map is built from the SAME frame) and
    * fails loud: silently assigning it a rank would desync the two
    * paths. */
  def compute(words: ArrayData, num: Int, den: Int,
      vocab: Array[UTF8String], dfs: Array[Long]): ArrayData = {
    val n = words.numElements()
    val plenL = n.toLong - ((n.toLong * num + (den - 1)) / den) + 1L
    if (n == 0 || plenL <= 0)
      return new org.apache.spark.sql.catalyst.util.GenericArrayData(
        Array.empty[Any])
    val ws = new Array[UTF8String](n)
    val ds = new Array[Long](n)
    var m = 0
    var i = 0
    while (i < n) {
      if (!words.isNullAt(i)) {
        val w = words.getUTF8String(i)
        val at = java.util.Arrays.binarySearch(
          vocab.asInstanceOf[Array[AnyRef]], w)
        if (at < 0) throw new IllegalStateException(
          s"df_prefix: token '$w' missing from the broadcast df map — " +
            "the base frame must be DETERMINISTIC (the map is collected " +
            "from the same frame the prefixes are derived from; a " +
            "re-evaluated random sample breaks that)")
        ws(m) = w
        ds(m) = dfs(at)
        m += 1
      }
      i += 1
    }
    val take = math.min(plenL, m.toLong).toInt
    if (take <= 0)
      return new org.apache.spark.sql.catalyst.util.GenericArrayData(
        Array.empty[Any])
    val idx = new Array[Integer](m)
    i = 0
    while (i < m) { idx(i) = Integer.valueOf(i); i += 1 }
    java.util.Arrays.sort(idx, new java.util.Comparator[Integer] {
      override def compare(a: Integer, b: Integer): Int = {
        val c = java.lang.Long.compare(ds(a), ds(b))
        if (c != 0) c else ws(a).compareTo(ws(b))
      }
    })
    val out = new Array[Any](take)
    i = 0
    while (i < take) { out(i) = ws(idx(i)); i += 1 }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }
}

/** Static kernel behind [[VocabMaskExpr]] (the [[DfPrefix]] pattern:
  * eval and codegen share one implementation). */
object VocabMask {

  /** One record's word set as a bitmask over a sorted ≤64-token
    * vocabulary: bit i set iff `vocab(i)` occurs in `words`. Null
    * elements are skipped (they can never join — the same null
    * semantics as [[DfPrefix.compute]] and the dfreq join). A word
    * absent from the vocab violates the caller's deterministic-base
    * contract and fails loud, exactly like [[DfPrefix.compute]]. */
  def compute(words: ArrayData, vocab: Array[UTF8String]): Long = {
    val n = words.numElements()
    var mask = 0L
    var i = 0
    while (i < n) {
      if (!words.isNullAt(i)) {
        val w = words.getUTF8String(i)
        val at = java.util.Arrays.binarySearch(
          vocab.asInstanceOf[Array[AnyRef]], w)
        if (at < 0) throw new IllegalStateException(
          s"vocab_mask: token '$w' missing from the broadcast vocab — " +
            "the base frame must be DETERMINISTIC (the vocab is " +
            "collected from the same frame the masks are derived from)")
        mask |= 1L << at
      }
      i += 1
    }
    mask
  }
}

/** A record's word set as a 64-bit vocabulary bitmask — the dense
  * fast path of [[graft.operators.Dedup.jaccardSelfJoin]] (r18): when
  * the corpus vocabulary has ≤64 distinct tokens, every word set is one
  * long, `|∩|` is `bit_count(m_a & m_b)`, and the whole prefix-filter /
  * candidate-distinct / verify-join pipeline collapses to a block-keyed
  * all-pairs join over 8-byte masks. `vocab` must be sorted ascending in
  * UTF8String binary order (binary search); it rides into tasks via
  * `ctx.addReferenceObj` like [[DfPrefixExpr]]'s df map. */
case class VocabMaskExpr(child: Expression, vocab: Array[UTF8String])
    extends UnaryExpression with ImplicitCastInputTypes {
  require(vocab.length <= 64,
    s"vocab_mask needs a <=64-token vocabulary, got ${vocab.length}")

  override def dataType: DataType = org.apache.spark.sql.types.LongType
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "vocab_mask"

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(StringType))

  override protected def nullSafeEval(input: Any): Any =
    VocabMask.compute(input.asInstanceOf[ArrayData], vocab)

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val vocabRef = ctx.addReferenceObj("vocabMaskVocab", vocab,
      "org.apache.spark.unsafe.types.UTF8String[]")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.VocabMask.compute($c, $vocabRef)")
  }

  override protected def withNewChildInternal(
      newChild: Expression): VocabMaskExpr =
    copy(child = newChild)
}

/** The map-side prefix derivation of the All-Pairs join
  * ([[graft.operators.Dedup]] `prefixPinned`, VERDICT r13 #1): when the
  * corpus vocabulary fits a driver map, the global df order rides into
  * every task as two parallel reference arrays and each record's prefix
  * is derived locally — no df join, no per-record rank window, no
  * id-keyed shuffle. Output is bit-identical to the shuffle path:
  * (df asc, word asc) is a TOTAL order over a record's distinct words,
  * so the window's `row_number` and this sort select the same rows in
  * the same order. The model rides `ctx.addReferenceObj` (task-binary
  * broadcast), the [[BpeEncodeExpr]] pattern. */
case class DfPrefixExpr(child: Expression, num: Int, den: Int,
    vocab: Array[UTF8String], dfs: Array[Long])
    extends UnaryExpression with ImplicitCastInputTypes {
  require(num > 0 && den > 0 && num <= den,
    s"threshold num/den must be a rational in (0, 1]: $num/$den")
  require(vocab.length == dfs.length,
    s"vocab (${vocab.length}) and dfs (${dfs.length}) must align")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "df_prefix"

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(StringType))

  override protected def nullSafeEval(input: Any): Any =
    DfPrefix.compute(input.asInstanceOf[ArrayData], num, den, vocab, dfs)

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val vocabRef = ctx.addReferenceObj("dfPrefixVocab", vocab,
      "org.apache.spark.unsafe.types.UTF8String[]")
    val dfsRef = ctx.addReferenceObj("dfPrefixDfs", dfs, "long[]")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.DfPrefix.compute($c, $num, $den, $vocabRef, $dfsRef)")
  }

  override protected def withNewChildInternal(
      newChild: Expression): DfPrefixExpr =
    copy(child = newChild)
}

/** Nearest-centroid argmin over a LITERAL centroid model as one native
  * expression — the assignment kernel of every k-means-shaped operator
  * ([[graft.operators.Similarity]] kmeans / SemDeDup blocking,
  * [[graft.operators.CellIndex]] IVF routing).
  *
  * The column spelling it replaces (`array_min` over `transform` of a
  * k-struct literal, each element three [[DotProductExpr]] calls)
  * collapses out of whole-stage codegen once k×dim literals grow past
  * the generated-code budget, and the interpreted fallback re-walks the
  * literal array per row — measured as q_semdedup's auto-k (k≈1000)
  * 64× profile running 1000× slower than the arithmetic requires. This
  * expression carries the model as plain `double[][]`/`double[]`
  * reference objects and runs one fused JVM loop
  * ([[graft.core.Centroids.nearest]]), identical bit-for-bit to the
  * old spelling (same dot accumulation order, same `round(x*1e6)`
  * BigDecimal HALF_UP, ties to the smallest cluster id via pre-sorted
  * centroid order, unroutable vectors yield the same `(null d, min
  * cl)` row).
  *
  * `ids` must be pre-sorted ascending (numeric, or UTF8String binary
  * order for strings) — [[graft.operators.Similarity
  * .nearestCentroidStruct]] is the constructing entry point and
  * enforces it.
  */
case class NearestCentroidsExpr(
    child: Expression,
    ids: Seq[Any],
    cents: Seq[Seq[Double]],
    clType: DataType)
    extends UnaryExpression with ImplicitCastInputTypes {

  require(ids.nonEmpty && ids.length == cents.length,
    s"ids (${ids.length}) and centroids (${cents.length}) must align, non-empty")
  require(cents.map(_.length).distinct.size == 1,
    "centroids must share one dimensionality")

  override def dataType: DataType = StructType(Seq(
    StructField("d", LongType, nullable = true),
    StructField("cl", clType, nullable = false)))
  override def nullable: Boolean = false
  override def prettyName: String = "nearest_centroid"
  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(DoubleType))

  @transient private lazy val centsArr: Array[Array[Double]] =
    cents.map(_.toArray).toArray
  @transient private lazy val ccArr: Array[Double] =
    graft.core.Centroids.selfDots(centsArr)
  @transient private lazy val idsArr: Array[AnyRef] = ids.map {
    case s: String => UTF8String.fromString(s): AnyRef
    case i: Int => java.lang.Integer.valueOf(i): AnyRef
    case l: Long => java.lang.Long.valueOf(l): AnyRef
    case other => throw new IllegalArgumentException(
      s"unsupported cluster id type: ${other.getClass}")
  }.toArray

  private def checkNulls: Boolean = child.dataType match {
    case ArrayType(_, cn) => cn
    case _ => true
  }

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any =
    graft.core.Centroids.nearest(
      child.eval(input).asInstanceOf[ArrayData],
      centsArr, ccArr, checkNulls, idsArr)

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val centsRef = ctx.addReferenceObj("cents", centsArr, "double[][]")
    val ccRef = ctx.addReferenceObj("cc", ccArr, "double[]")
    val idsRef = ctx.addReferenceObj("ids", idsArr, "java.lang.Object[]")
    val c = child.genCode(ctx)
    ev.copy(
      code = code"""
        ${c.code}
        InternalRow ${ev.value} = graft.core.Centroids.nearest(
          ${c.isNull} ? null : ${c.value}, $centsRef, $ccRef,
          $checkNulls, $idsRef);""",
      isNull = org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral)
  }

  override protected def withNewChildInternal(
      newChild: Expression): NearestCentroidsExpr =
    copy(child = newChild)
}

/** Unicode NFC normalization as a native codegen'd expression — the
  * canonicalization pass run before exact dedup / n-gram hashing so
  * byte equality means text equality (U+00E9 vs `e`+U+0301 spellings of
  * the same character otherwise defeat every hash-based operator).
  *
  * No Spark builtin exists; a native `Expression` keeps the pass inside
  * whole-stage codegen. The work is delegated to [[graft.core.TextNorm]],
  * whose ASCII fast path returns the input buffer untouched — on crawl
  * corpora the expression is usually a byte scan, not a normalization.
  */
case class NfcExpr(child: Expression)
    extends UnaryExpression with ImplicitCastInputTypes {

  override def dataType: DataType = StringType
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "nfc"

  // the SQL surface must reject/coerce non-string inputs at analysis —
  // an unvalidated child reaches codegen as the wrong JVM type and
  // fails mid-job (the DotProductExpr lesson above)
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)

  override protected def nullSafeEval(input: Any): Any =
    graft.core.TextNorm.nfc(input.asInstanceOf[UTF8String])

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.core.TextNorm.nfc($c)")

  override protected def withNewChildInternal(newChild: Expression): NfcExpr =
    copy(child = newChild)
}

/** Column + SQL registration surface for the engine's custom functions
  * (SURVEY §2.8): blake2b (native expression), translate_path and
  * normalize_date (deterministic Scala UDFs). */
/** All adjacent codepoint-pair substrings of a string column as
  * `array<string>` — the bigram extraction of the char-LM quality
  * scorer ([[graft.operators.Curation.charLmScore]]). The builtin
  * spelling, `transform(sequence(1, length(t) - 1), i ->
  * substring(t, i, 2))`, is an interpreted higher-order function that
  * re-enters the lambda machinery and re-scans the string per bigram
  * (substring by codepoint index is O(i)) — O(n²) per document and the
  * dominant cost of the char-LM pass at scale. This expression is one
  * decode + one loop (inside whole-stage codegen) producing the
  * IDENTICAL codepoint-pair array, so oracle hashes are unchanged. */
case class CharBigramsExpr(child: Expression)
    extends UnaryExpression with ImplicitCastInputTypes {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "char_bigrams"

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)

  override protected def nullSafeEval(input: Any): Any =
    graft.core.TextNorm.charBigrams(input.asInstanceOf[UTF8String])

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.core.TextNorm.charBigrams($c)")

  override protected def withNewChildInternal(
      newChild: Expression): CharBigramsExpr =
    copy(child = newChild)
}

/** Winnowing fingerprints of an already-normalized string column as
  * sorted distinct `array<bigint>` — the fingerprint half of
  * [[graft.operators.Dedup.winnow]], value-identical to the
  * interpreted-HOF spelling it replaces (see
  * [[graft.core.TextNorm.winnowFingerprints]] for the exact contract).
  * The HOF chain re-entered the lambda machinery per gram AND per
  * window and was the most expensive battery query; this is one decode
  * + two linear passes inside whole-stage codegen. */
case class WinnowFingerprintsExpr(child: Expression, k: Int, w: Int)
    extends UnaryExpression with ImplicitCastInputTypes {
  require(k >= 1 && w >= 1, s"k and w must be >= 1, got k=$k w=$w")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "winnow_fps"

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)

  override protected def nullSafeEval(input: Any): Any =
    graft.core.TextNorm.winnowFingerprints(
      input.asInstanceOf[UTF8String], k, w)

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.core.TextNorm.winnowFingerprints($c, $k, $w)")

  override protected def withNewChildInternal(
      newChild: Expression): WinnowFingerprintsExpr =
    copy(child = newChild)
}

/** 2-D Hilbert-curve distance of two BIGINT grid coordinates (low `bits`
  * bits of each) — the layout key behind [[graft.operators.Layout
  * .hilbertKey2]]. Native because the per-level quadrant rotation is
  * data-dependent: Morton's shift/mask cascade has no Hilbert analogue,
  * and an unrolled CASE spelling grows ~3× per level. Both eval and the
  * generated code call the one loop in
  * [[graft.operators.HilbertCurve.xy2d]] (the Blake2b static-forwarder
  * pattern), and the battery oracle unrolls the same level list in SQL.
  */
case class HilbertKeyExpr(left: Expression, right: Expression, bits: Int)
    extends BinaryExpression with ImplicitCastInputTypes {
  require(bits >= 1 && bits <= 31, s"bits in [1, 31], got $bits")

  override def dataType: DataType = LongType
  override def nullable: Boolean = left.nullable || right.nullable
  override def prettyName: String = "hilbert_key"

  override def inputTypes: Seq[AbstractDataType] = Seq(LongType, LongType)

  override protected def nullSafeEval(x: Any, y: Any): Any =
    graft.operators.HilbertCurve.xy2d(
      bits, x.asInstanceOf[Long], y.asInstanceOf[Long])

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (x, y) =>
      s"graft.operators.HilbertCurve.xy2d($bits, $x, $y)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): HilbertKeyExpr =
    copy(left = newLeft, right = newRight)
}

/** BPE tokenization of a word-array column with a literal merge model —
  * the encode side of [[graft.operators.Bpe]] as one native pass
  * (codepoint split + in-order merge folds + flatten), value-identical
  * to the nested-`aggregate()` SQL spelling it replaces (BpeSpec
  * asserts parity against that reference spelling; the DuckDB oracle is
  * unchanged). The SQL chain nested one interpreted fold PER MERGE and
  * was the top battery cost at 64×. */
case class BpeEncodeExpr(child: Expression, merges: Seq[(String, String)])
    extends UnaryExpression with ImplicitCastInputTypes {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "bpe_encode"

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(StringType))

  @transient private lazy val model = graft.core.BpeCodec.model(merges)

  override protected def nullSafeEval(input: Any): Any =
    graft.core.BpeCodec.encodeWords(input.asInstanceOf[ArrayData], model,
      graft.operators.Bpe.EndMark)

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bpeModel", model,
      classOf[graft.core.BpeCodec.Model].getName)
    val em = ctx.addReferenceObj("bpeEndMark", graft.operators.Bpe.EndMark,
      "java.lang.String")
    defineCodeGen(ctx, ev,
      c => s"graft.core.BpeCodec.encodeWords($c, $ref, $em)")
  }

  override protected def withNewChildInternal(
      newChild: Expression): BpeEncodeExpr =
    copy(child = newChild)
}

/** Merge-fold an existing symbol-array column with a literal merge
  * list — the per-round step of BPE TRAINING ([[graft.operators.Bpe]]),
  * same fold semantics as [[BpeEncodeExpr]] without the word split. */
case class BpeApplyExpr(child: Expression, merges: Seq[(String, String)])
    extends UnaryExpression with ImplicitCastInputTypes {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "bpe_apply"

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(StringType))

  @transient private lazy val model = graft.core.BpeCodec.model(merges)

  override protected def nullSafeEval(input: Any): Any =
    graft.core.BpeCodec.applySymbols(input.asInstanceOf[ArrayData], model)

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bpeModel", model,
      classOf[graft.core.BpeCodec.Model].getName)
    defineCodeGen(ctx, ev,
      c => s"graft.core.BpeCodec.applySymbols($c, $ref)")
  }

  override protected def withNewChildInternal(
      newChild: Expression): BpeApplyExpr =
    copy(child = newChild)
}

object functions {

  import org.apache.spark.sql.graftbridge.Bridge

  /** blake2b-16 hex digest of a binary column. */
  def blake2b(c: Column): Column =
    Bridge.column(Blake2bExpr(Bridge.expression(c.cast(BinaryType))))

  /** Arity-checked expression builder shared by every registration path. */
  def blake2bBuilder(
      exprs: Seq[Expression]): Blake2bExpr = {
    if (exprs.length != 1)
      throw new IllegalArgumentException(
        s"blake2b requires exactly one argument, got ${exprs.length}")
    Blake2bExpr(exprs.head)
  }

  /** Native dot product of two `array<double>` columns. */
  def vectorDot(a: Column, b: Column): Column =
    Bridge.column(DotProductExpr(Bridge.expression(a), Bridge.expression(b)))

  /** Intersection size of two ASC-sorted distinct `array<string>`
    * columns (see [[SortedIntersectSizeExpr]] for the precondition). */
  def sortedIntersectSize(a: Column, b: Column): Column =
    Bridge.column(SortedIntersectSizeExpr(
      Bridge.expression(a), Bridge.expression(b)))

  /** All-Pairs prefix of a word-array column under a literal df order
    * (see [[DfPrefixExpr]]). `vocab` must be sorted ascending and align
    * with `dfs`. */
  def dfPrefix(words: Column, num: Int, den: Int,
      vocab: Array[UTF8String], dfs: Array[Long]): Column =
    Bridge.column(DfPrefixExpr(Bridge.expression(words), num, den,
      vocab, dfs))

  def vocabMask(words: Column, vocab: Array[UTF8String]): Column =
    Bridge.column(VocabMaskExpr(Bridge.expression(words), vocab))

  /** Arity-checked builder for SQL registration. */
  def vectorDotBuilder(exprs: Seq[Expression]): DotProductExpr = {
    if (exprs.length != 2)
      throw new IllegalArgumentException(
        s"vector_dot requires exactly two arguments, got ${exprs.length}")
    DotProductExpr(exprs.head, exprs(1))
  }

  /** Unicode NFC normalization of a string column (non-string inputs
    * are coerced at analysis via ImplicitCastInputTypes). */
  def nfc(c: Column): Column =
    Bridge.column(NfcExpr(Bridge.expression(c)))

  /** Arity-checked builder for SQL registration. */
  def nfcBuilder(exprs: Seq[Expression]): NfcExpr = {
    if (exprs.length != 1)
      throw new IllegalArgumentException(
        s"nfc requires exactly one argument, got ${exprs.length}")
    NfcExpr(exprs.head)
  }

  /** Adjacent codepoint-pair bigrams of a string column. */
  def charBigrams(c: Column): Column =
    Bridge.column(CharBigramsExpr(Bridge.expression(c)))

  /** Winnowing fingerprints (sorted distinct `array<bigint>`) of an
    * already-normalized string column. */
  def winnowFps(c: Column, k: Int, w: Int): Column =
    Bridge.column(WinnowFingerprintsExpr(Bridge.expression(c), k, w))

  /** BPE-tokenize a word-array column with a literal merge model. */
  def bpeEncode(words: Column, merges: Seq[(String, String)]): Column =
    Bridge.column(BpeEncodeExpr(Bridge.expression(words), merges))

  /** Merge-fold a symbol-array column with a literal merge list. */
  def bpeApply(symbols: Column, merges: Seq[(String, String)]): Column =
    Bridge.column(BpeApplyExpr(Bridge.expression(symbols), merges))

  /** KMV distinct sketch: the k smallest distinct values of a BIGINT
    * hash column as a sorted array (see [[KmvAgg]]). */
  def kmvSketch(c: Column, k: Int): Column =
    Bridge.column(
      KmvAgg(Bridge.expression(c), k).toAggregateExpression())

  /** 2-D Hilbert-curve distance of two grid-coordinate columns. */
  def hilbertKey(x: Column, y: Column, bits: Int): Column =
    Bridge.column(
      HilbertKeyExpr(Bridge.expression(x), Bridge.expression(y), bits))

  /** Arity-checked builder for SQL registration. */
  def charBigramsBuilder(exprs: Seq[Expression]): CharBigramsExpr = {
    if (exprs.length != 1)
      throw new IllegalArgumentException(
        s"char_bigrams requires exactly one argument, got ${exprs.length}")
    CharBigramsExpr(exprs.head)
  }

  /** Register blake2b for SQL usage plus the UDF-surface functions.
    * Idempotent per session: operators call this defensively from every
    * entry point, and re-registering an existing function makes
    * SimpleFunctionRegistry log a replaced-function WARN per call. */
  def register(spark: SparkSession): Unit = {
    if (spark.sessionState.functionRegistry.functionExists(
        org.apache.spark.sql.catalyst.FunctionIdentifier("vector_dot")))
      return
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "blake2b", blake2bBuilder, "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "vector_dot", vectorDotBuilder, "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "nfc", nfcBuilder, "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "char_bigrams", charBigramsBuilder, "scala_udf")
    // Translator (C7): expression is a constructor argument so the
    // compiled regex is reused across rows
    spark.udf.register("normalize_date",
      (s: String) => Metadata.normalizeDate(s))
  }

  /** A per-expression path-translation UDF (C7, `translator.py:24-99`). */
  def translatePathUdf(translationExpression: String)
    : org.apache.spark.sql.expressions.UserDefinedFunction = {
    val t = Translator(translationExpression)
    org.apache.spark.sql.functions.udf((path: String) => t.translate(path))
  }
}
