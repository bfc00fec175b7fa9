package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{ArrayType, BinaryType, DataType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

import graft.sources.ArchiveCodec

/** Catalyst surface of the archive readers (SURVEY.md §2.1 S3) — thin
  * codegen'd wrappers over [[graft.sources.ArchiveCodec]], same shape as
  * VersionCompare: a static call into the tested Scala core keeps archive
  * parsing inside whole-stage codegen. All four are null-on-malformed
  * (`nullable = true`, value-null checked after the call), so a corrupt
  * payload in a 100 TB scan degrades to SQL null, never a task failure.
  */
case class ArchiveFormat(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override protected def nullSafeEval(v: Any): Any =
    ArchiveCodec.format(v.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
       |${ev.value} = graft.sources.ArchiveCodec.format($c);
       |if (${ev.value} == null) { ${ev.isNull} = true; }
     """.stripMargin)
  override protected def withNewChildInternal(newChild: Expression): ArchiveFormat =
    copy(child = newChild)
  override def prettyName: String = "archive_format"
}

case class ArchiveMembers(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("name", StringType, nullable = false),
    StructField("size", LongType, nullable = false))), containsNull = false)
  override def nullable: Boolean = true
  override protected def nullSafeEval(v: Any): Any =
    ArchiveCodec.members(v.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
       |${ev.value} = graft.sources.ArchiveCodec.members($c);
       |if (${ev.value} == null) { ${ev.isNull} = true; }
     """.stripMargin)
  override protected def withNewChildInternal(newChild: Expression): ArchiveMembers =
    copy(child = newChild)
  override def prettyName: String = "archive_members"
}

case class ArchiveExtract(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override protected def nullSafeEval(b: Any, n: Any): Any =
    ArchiveCodec.extract(b.asInstanceOf[Array[Byte]], n.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (b, n) => s"""
       |${ev.value} = graft.sources.ArchiveCodec.extract($b, $n);
       |if (${ev.value} == null) { ${ev.isNull} = true; }
     """.stripMargin)
  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): ArchiveExtract =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "archive_extract"
}

/** `archive_inspect(bytes, name)` → struct<fmt, members, body> in ONE
  * decompression walk — the hot-path form: calling format/members/extract
  * separately decompresses the payload three times.
  */
case class ArchiveInspect(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = StructType(Seq(
    StructField("fmt", StringType, nullable = false),
    StructField("members", ArrayType(StructType(Seq(
      StructField("name", StringType, nullable = false),
      StructField("size", LongType, nullable = false))), containsNull = false),
      nullable = false),
    StructField("body", BinaryType, nullable = true)))
  override def nullable: Boolean = true
  override protected def nullSafeEval(b: Any, n: Any): Any =
    ArchiveCodec.inspect(b.asInstanceOf[Array[Byte]], n.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (b, n) => s"""
       |${ev.value} = graft.sources.ArchiveCodec.inspect($b, $n);
       |if (${ev.value} == null) { ${ev.isNull} = true; }
     """.stripMargin)
  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): ArchiveInspect =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "archive_inspect"
}

/** `tar_archive(names, contents, 'gzip')` — the codec is a plan-time string
  * literal (validated by the builder in GraftFunctions), embedded in the
  * generated source like VersionCompare's ecosystem tag.
  */
case class TarArchive(left: Expression, right: Expression, codec: String = "none")
    extends BinaryExpression {
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override protected def nullSafeEval(names: Any, contents: Any): Any =
    ArchiveCodec.tarArchive(
      names.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData],
      contents.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData], codec)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (n, c) => s"""
       |${ev.value} = graft.sources.ArchiveCodec.tarArchive($n, $c, "$codec");
       |if (${ev.value} == null) { ${ev.isNull} = true; }
     """.stripMargin)
  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): TarArchive =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "tar_archive"
}

/** `zip_archive(names, contents, 'deflated')` — zip twin of [[TarArchive]];
  * the method ('stored' | 'deflated') is a plan-time string literal.
  */
case class ZipArchive(left: Expression, right: Expression, method: String = "deflated")
    extends BinaryExpression {
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override protected def nullSafeEval(names: Any, contents: Any): Any =
    ArchiveCodec.zipArchive(
      names.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData],
      contents.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData], method)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (n, c) => s"""
       |${ev.value} = graft.sources.ArchiveCodec.zipArchive($n, $c, "$method");
       |if (${ev.value} == null) { ${ev.isNull} = true; }
     """.stripMargin)
  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): ZipArchive =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "zip_archive"
}
