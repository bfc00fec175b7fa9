package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo, GenericInternalRow, TernaryExpression, UnaryExpression}
import org.apache.spark.sql.types.{BinaryType, BooleanType, DataType, DoubleType, IntegerType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Custom Catalyst expressions for the package-metadata layer (SURVEY.md
  * §4.3): native `Expression`s, not Scala UDFs, so null handling is uniform
  * and Catalyst can constant-fold literal arguments (a UDF is a black box —
  * these are foldable, so `version_compare(v, '2.6.0')` against a literal
  * costs one string walk per row with no serialization). CodegenFallback to
  * start; `doGenCode` only if a bench gap demands it (SURVEY.md hard part
  * #5 — these sit outside the relational hot path).
  */
case class VersionCompare(left: Expression, right: Expression, eco: String = "deb")
    extends BinaryExpression {
  override def dataType: DataType = IntegerType
  override protected def nullSafeEval(l: Any, r: Any): Any =
    EcoVersion.compare(l.asInstanceOf[UTF8String].toString, r.asInstanceOf[UTF8String].toString, eco)
  // static call into the tested Scala core: keeps the expression INSIDE
  // whole-stage codegen (CodegenFallback would split the span and fall
  // back to row-at-a-time eval for the whole operator). `eco` is a
  // builder-validated member of EcoVersion.Known, so embedding it in the
  // generated source is a fixed safe literal.
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    nullSafeCodeGen(ctx, ev, (l, r) =>
      s"""${ev.value} = graft.functions.EcoVersion.compare($l.toString(), $r.toString(), "$eco");""")
  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): VersionCompare =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "version_compare"
}

case class VersionSortKey(child: Expression, eco: String = "deb")
    extends UnaryExpression {
  override def dataType: DataType = StringType
  override protected def nullSafeEval(v: Any): Any =
    UTF8String.fromString(EcoVersion.sortKey(v.asInstanceOf[UTF8String].toString, eco))
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = org.apache.spark.unsafe.types.UTF8String.fromString(" +
        s"""graft.functions.EcoVersion.sortKey($c.toString(), "$eco"));""")
  override protected def withNewChildInternal(newChild: Expression): VersionSortKey =
    copy(child = newChild)
  override def prettyName: String = "version_sort_key"
}

/** Static core of `parse_constraint` — splits a packaging dependency spec
  * (`foo>=1.2.3`, `bar<2.0`, `baz~1.4`, bare `qux`) at the FIRST operator
  * occurrence into (name, op, ver); a bare name yields op = ver = "". The
  * operator set is the universal APK/Deb/RPM surface: >=, <=, =, >, <, ~.
  * Kept as a plain Scala object so the Catalyst expression's `doGenCode`
  * is a static call that stays inside whole-stage codegen.
  */
object ConstraintParser {
  def parse(s: UTF8String): InternalRow = {
    val str = s.toString
    var i = 0
    var opStart = -1
    var opLen = 0
    while (opStart < 0 && i < str.length) {
      val c = str.charAt(i)
      if (c == '>' || c == '<') {
        opStart = i
        opLen = if (i + 1 < str.length && str.charAt(i + 1) == '=') 2 else 1
      } else if (c == '=' || c == '~') {
        opStart = i
        opLen = 1
      } else i += 1
    }
    val (name, op, ver) =
      if (opStart < 0) (str, "", "")
      else (str.substring(0, opStart),
        str.substring(opStart, opStart + opLen),
        str.substring(opStart + opLen))
    new GenericInternalRow(Array[Any](
      UTF8String.fromString(name), UTF8String.fromString(op), UTF8String.fromString(ver)))
  }
}

/** `parse_constraint(spec)` → struct<name, op, ver> (P5 completion;
  * SURVEY.md §1.1 — depends lists carry embedded constraints in every
  * real ecosystem). Codegen'd like VersionCompare: a static call into the
  * tested parser core.
  */
case class ParseConstraint(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StructType(Seq(
    StructField("name", StringType, nullable = false),
    StructField("op", StringType, nullable = false),
    StructField("ver", StringType, nullable = false)))
  override protected def nullSafeEval(v: Any): Any =
    ConstraintParser.parse(v.asInstanceOf[UTF8String])
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.ConstraintParser.parse($c);")
  override protected def withNewChildInternal(newChild: Expression): ParseConstraint =
    copy(child = newChild)
  override def prettyName: String = "parse_constraint"
}

/** Codegen'd dot product over two ARRAY<DOUBLE> columns — the vector-math
  * kernel for cosine similarity / near-dup / ANN (SURVEY.md §4.3-2).
  * A native Expression with `doGenCode`: the 64-step multiply-add loop
  * runs inside whole-stage codegen (the aggregate/zip_with fold evaluates
  * its lambda interpreted per element and benched ~5x slower on the pair
  * joins). Summation is sequential left-to-right — the same order as the
  * DuckDB oracle's list_reduce — so results are bit-identical. Inputs are
  * non-null-element arrays (embedding vectors); element nulls are not
  * checked, matching the fixture contract.
  */
case class ArrayDot(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override protected def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    val b = r.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    val n = math.min(a.numElements(), b.numElements())
    var s = 0.0
    var i = 0
    while (i < n) { s += a.getDouble(i) * b.getDouble(i); i += 1 }
    s
  }
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val sum = ctx.freshName("sum")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $sum = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $sum += $a.getDouble($i) * $b.getDouble($i);
         |}
         |${ev.value} = $sum;
       """.stripMargin
    })
  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): ArrayDot =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "array_dot"
}

/** Static core of `token_ngrams` — all space-delimited token n-grams of a
  * string. Because grams re-join with the SAME separator the text was
  * tokenized on, gram i is the contiguous substring from token i's first
  * char to token (i+n-1)'s last: ONE boundary scan and m substring copies,
  * no token-array materialization, no per-position slice/array_join (the
  * equivalent higher-order-function pipeline evaluates its lambda
  * interpreted per position and benched ~2x slower on q107).
  *
  * Tokenization is EXACTLY `split(text, ' ')`: consecutive/leading/trailing
  * separators yield empty tokens (token k spans between space k-1 and
  * space k), so results stay bit-identical to every split-based oracle on
  * ANY input — not just single-spaced fixtures. The contiguous-substring
  * property survives empty tokens because rejoining them with the same
  * separator reproduces the original spacing. n <= 0 yields an empty array.
  */
object NgramCore {
  def tokenNgrams(s: UTF8String, n: Int): org.apache.spark.sql.catalyst.util.ArrayData = {
    if (n <= 0) return new org.apache.spark.sql.catalyst.util.GenericArrayData(Array.empty[Any])
    val str = s.toString
    val len = str.length
    // space positions; token i spans (space(i-1), space(i)) exclusive
    val spaces = new java.util.ArrayList[Integer]()
    var i = 0
    while (i < len) { if (str.charAt(i) == ' ') spaces.add(i); i += 1 }
    val nTok = spaces.size + 1
    def tokStart(t: Int): Int = if (t == 0) 0 else spaces.get(t - 1) + 1
    def tokEnd(t: Int): Int = if (t == spaces.size) len else spaces.get(t)
    val m = math.max(nTok - n + 1, 0)
    val out = new Array[Any](m)
    var j = 0
    while (j < m) {
      out(j) = UTF8String.fromString(str.substring(tokStart(j), tokEnd(j + n - 1)))
      j += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }
}

/** `token_ngrams(text, n)` → array<string> of positional token n-grams —
  * the corpus-mining kernel (q107 boilerplate detection, shingle-family
  * preprocessing). Codegen'd static call like the other graft expressions.
  */
case class TokenNgrams(left: Expression, right: Expression)
    extends BinaryExpression
    with org.apache.spark.sql.catalyst.expressions.ImplicitCastInputTypes {
  // declared input types: a mistyped call (e.g. a BIGINT n, or a non-string
  // first argument) gets an analysis-time error or an implicit cast instead
  // of a runtime ClassCastException
  // return type inferred: Seq[DataType] <: Seq[AbstractDataType], whose
  // name is private[sql] and can't be written here
  override def inputTypes = Seq(StringType, IntegerType)
  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(StringType, containsNull = false)
  override protected def nullSafeEval(t: Any, n: Any): Any =
    NgramCore.tokenNgrams(t.asInstanceOf[UTF8String], n.asInstanceOf[Int])
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    nullSafeCodeGen(ctx, ev, (t, n) =>
      s"${ev.value} = graft.functions.NgramCore.tokenNgrams($t, $n);")
  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): TokenNgrams =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "token_ngrams"
}

/** Static core of `hilbert_d2` — the Hilbert-curve index of a 2-D point
  * (the public Wikipedia xy2d algorithm, n-flip rotation variant) over
  * `bits`-bit coordinates. Pure integer arithmetic; the curve property
  * that matters downstream (consecutive indices are always grid-adjacent,
  * unlike Morton's quadrant seams) is judged by q193 against an oracle
  * that re-derives the index through unrolled per-bit CASE arithmetic —
  * an independent derivation of the same function.
  */
object HilbertCore {
  def d2(x0: Long, y0: Long, bits: Int): Long = {
    if (bits <= 0) return 0L
    val n = 1L << bits
    var x = x0
    var y = y0
    var d = 0L
    var s = n >> 1
    while (s > 0) {
      val rx = if ((x & s) > 0) 1L else 0L
      val ry = if ((y & s) > 0) 1L else 0L
      d += s * s * ((3 * rx) ^ ry)
      if (ry == 0) {
        if (rx == 1) { x = n - 1 - x; y = n - 1 - y }
        val t = x; x = y; y = t
      }
      s >>= 1
    }
    d
  }
}

/** `hilbert_d2(x, y, bits)` → the Hilbert index — the space-filling-curve
  * layout key beside `Graft.zorder`'s Morton interleave (data-layout
  * family, q121/q193). Codegen'd static call like the other graft
  * expressions; inputs implicit-cast to (LONG, LONG, INT).
  */
case class HilbertD2(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression
    with org.apache.spark.sql.catalyst.expressions.ImplicitCastInputTypes {
  override def inputTypes = Seq(LongType, LongType, IntegerType)
  override def dataType: DataType = LongType
  override protected def nullSafeEval(x: Any, y: Any, b: Any): Any =
    HilbertCore.d2(x.asInstanceOf[Long], y.asInstanceOf[Long], b.asInstanceOf[Int])
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y, b) =>
      s"${ev.value} = graft.functions.HilbertCore.d2($x, $y, $b);")
  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): HilbertD2 =
    copy(first = newFirst, second = newSecond, third = newThird)
  override def prettyName: String = "hilbert_d2"
}

/** Serializable holder for a serialized bloom filter (the probe side of
  * [[graft.Graft.bloomPrunedJoin]]). The sketch deserializes ONCE per
  * deserialization site (executor plan instance) through the transient
  * lazy val, so the codegen'd per-row probe is a single virtual call into
  * the public `org.apache.spark.util.sketch.BloomFilter` bit test.
  */
final class BloomRef(val bytes: Array[Byte]) extends Serializable {
  @transient private lazy val bf =
    org.apache.spark.util.sketch.BloomFilter.readFrom(
      new java.io.ByteArrayInputStream(bytes))
  def mightContainLong(v: Long): Boolean = bf.mightContainLong(v)
}

/** `bloom_might_contain(key, filter_bytes)` → boolean: probes a serialized
  * bloom filter (built by `DataFrame.stat.bloomFilter`, which puts integral
  * keys as longs). False positives possible (bounded by the build fpp),
  * false negatives impossible — so `filter(bloom_might_contain(...))`
  * before a join never changes the join's result, only its input volume.
  * The filter bytes ride the plan as a reference object, not per-row data.
  */
case class BloomMightContain(child: Expression, bloom: BloomRef)
    extends UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.ImplicitCastInputTypes {
  override def inputTypes = Seq(LongType)
  override def dataType: DataType = BooleanType
  override protected def nullSafeEval(v: Any): Any =
    bloom.mightContainLong(v.asInstanceOf[Long])
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode = {
    val ref = ctx.addReferenceObj("graftBloom", bloom, classOf[BloomRef].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.mightContainLong($c);")
  }
  override protected def withNewChildInternal(newChild: Expression): BloomMightContain =
    copy(child = newChild)
  override def prettyName: String = "bloom_might_contain"
}

/** Registration: both an idempotent per-session helper (works whatever
  * session the driver hands us) and the `SparkSessionExtensions` injection
  * path (`spark.sql.extensions=graft.GraftExtensions`) — the Spark-native
  * equivalent of the reference's Starlark script registry (SURVEY.md §2.10).
  */
object GraftFunctions {
  /** The optional trailing ecosystem argument must be a string LITERAL —
    * the ordering algorithm is a plan-time property (it changes the sort
    * key's collation), not per-row data.
    */
  private def ecoArg(e: Expression): String = {
    require(e.foldable && e.dataType == StringType,
      "ecosystem must be a string literal: 'deb' | 'rpm' | 'apk'")
    val raw = e.eval(null) // a foldable NULL would otherwise NPE below
    require(raw != null, "ecosystem must be a non-null literal (want deb|rpm|apk)")
    val v = raw.asInstanceOf[UTF8String].toString
    require(EcoVersion.Known.contains(v), s"unknown ecosystem '$v' (want deb|rpm|apk)")
    v
  }

  /** tar_archive's output codec — a plan-time string literal, like the
    * ecosystem tag (it selects the compressor class, not per-row data).
    */
  private def codecArg(e: Expression): String = {
    require(e.foldable && e.dataType == StringType,
      "codec must be a string literal: 'none' | 'gzip' | 'xz' | 'zstd'")
    val raw = e.eval(null) // a foldable NULL would otherwise NPE below
    require(raw != null, "codec must be a non-null literal (want none|gzip|xz|zstd)")
    val v = raw.asInstanceOf[UTF8String].toString
    require(graft.sources.ArchiveCodec.KnownCodecs.contains(v),
      s"unknown codec '$v' (want none|gzip|xz|zstd)")
    v
  }

  /** zip_archive's storage method — a plan-time string literal. */
  private def zipMethodArg(e: Expression): String = {
    require(e.foldable && e.dataType == StringType,
      "method must be a string literal: 'stored' | 'deflated'")
    val raw = e.eval(null)
    require(raw != null, "method must be a non-null literal (want stored|deflated)")
    val v = raw.asInstanceOf[UTF8String].toString
    require(graft.sources.ArchiveCodec.KnownZipMethods.contains(v),
      s"unknown zip method '$v' (want stored|deflated)")
    v
  }

  val all: Seq[(String, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    ("version_compare",
      new ExpressionInfo(classOf[VersionCompare].getName, "version_compare"),
      (args: Seq[Expression]) =>
        if (args.size >= 3) VersionCompare(args(0), args(1), ecoArg(args(2)))
        else VersionCompare(args(0), args(1))),
    ("version_sort_key",
      new ExpressionInfo(classOf[VersionSortKey].getName, "version_sort_key"),
      (args: Seq[Expression]) =>
        if (args.size >= 2) VersionSortKey(args.head, ecoArg(args(1)))
        else VersionSortKey(args.head)),
    ("array_dot",
      new ExpressionInfo(classOf[ArrayDot].getName, "array_dot"),
      (args: Seq[Expression]) => ArrayDot(args(0), args(1))),
    ("token_ngrams",
      new ExpressionInfo(classOf[TokenNgrams].getName, "token_ngrams"),
      (args: Seq[Expression]) => TokenNgrams(args(0), args(1))),
    ("parse_constraint",
      new ExpressionInfo(classOf[ParseConstraint].getName, "parse_constraint"),
      (args: Seq[Expression]) => ParseConstraint(args.head)),
    ("archive_format",
      new ExpressionInfo(classOf[ArchiveFormat].getName, "archive_format"),
      (args: Seq[Expression]) => ArchiveFormat(args.head)),
    ("archive_members",
      new ExpressionInfo(classOf[ArchiveMembers].getName, "archive_members"),
      (args: Seq[Expression]) => ArchiveMembers(args.head)),
    ("archive_extract",
      new ExpressionInfo(classOf[ArchiveExtract].getName, "archive_extract"),
      (args: Seq[Expression]) => ArchiveExtract(args(0), args(1))),
    ("archive_inspect",
      new ExpressionInfo(classOf[ArchiveInspect].getName, "archive_inspect"),
      (args: Seq[Expression]) => ArchiveInspect(args(0), args(1))),
    ("tar_archive",
      new ExpressionInfo(classOf[TarArchive].getName, "tar_archive"),
      (args: Seq[Expression]) =>
        if (args.size >= 3) TarArchive(args(0), args(1), codecArg(args(2)))
        else TarArchive(args(0), args(1))),
    ("zip_archive",
      new ExpressionInfo(classOf[ZipArchive].getName, "zip_archive"),
      (args: Seq[Expression]) =>
        if (args.size >= 3) ZipArchive(args(0), args(1), zipMethodArg(args(2)))
        else ZipArchive(args(0), args(1))),
    ("hilbert_d2",
      new ExpressionInfo(classOf[HilbertD2].getName, "hilbert_d2"),
      (args: Seq[Expression]) => HilbertD2(args(0), args(1), args(2))),
    ("bloom_might_contain",
      new ExpressionInfo(classOf[BloomMightContain].getName, "bloom_might_contain"),
      (args: Seq[Expression]) => BloomMightContain(args(0), new BloomRef(bytesArg(args(1))))))

  /** The serialized filter must be a binary LITERAL — the sketch is a
    * plan-time artifact (like the ecosystem tag), not per-row data.
    */
  private def bytesArg(e: Expression): Array[Byte] = {
    require(e.foldable && e.dataType == BinaryType,
      "bloom filter must be a binary literal (DataFrame.stat.bloomFilter output)")
    val raw = e.eval(null)
    require(raw != null, "bloom filter literal must be non-null")
    raw.asInstanceOf[Array[Byte]]
  }

  /** Idempotent: safe to call at the top of every query builder. */
  def ensureRegistered(spark: SparkSession): Unit = {
    val registry = spark.sessionState.functionRegistry
    all.foreach { case (name, info, builder) =>
      val id = FunctionIdentifier(name)
      if (!registry.functionExists(id)) registry.registerFunction(id, info, builder)
    }
  }
}
