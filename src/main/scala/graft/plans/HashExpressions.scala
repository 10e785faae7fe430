package graft.plans

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** The engine-portable 60-bit md5 hash (`Dedup.md5Hash60`) as ONE native
  * expression: MD5 digest → first 8 bytes as a big-endian unsigned long
  * → `>>> 4` (drop the low nibble, keeping exactly the top 15 hex
  * chars' 60 bits).
  *
  * The composed form it replaces —
  * `conv(substring(md5(c), 1, 15), 16, 10).cast("long")` — pays, PER
  * ROW (and in the shingle/minhash paths, per TOKEN): a 32-char hex
  * string render of the digest, a substring copy, conv's base-16 string
  * parse, conv's base-10 string render, and a string→long cast parse.
  * All five are pure format round-trips of the same 60 bits; this
  * expression keeps the digest binary end to end. Value-identical by
  * construction (top 15 hex chars of a digest ARE its top 60 bits, and
  * conv of 15 hex chars cannot overflow a signed long), so every DuckDB
  * oracle computing `('0x' || substr(md5(t),1,15))::BIGINT` is
  * unaffected. Null in → null out, and the input takes the same
  * implicit string→binary (UTF8 bytes) cast Spark's own `md5` uses.
  *
  * The digest instance is thread-local (Spark's `md5` calls
  * `MessageDigest.getInstance` per row).
  */
case class Md5Prefix60(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType | BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string or binary argument, got ${other.simpleString}")
  }

  override def dataType: DataType = LongType
  override def prettyName: String = "md5_prefix60"

  protected override def nullSafeEval(input: Any): Any = child.dataType match {
    case StringType => Md5Prefix60.hash(input.asInstanceOf[UTF8String].getBytes)
    case _ => Md5Prefix60.hash(input.asInstanceOf[Array[Byte]])
  }

  protected override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // a string child hashes its UTF8 bytes — the same bytes Spark's own
    // md5(string) hashes through its implicit string→binary cast
    val toBytes = child.dataType match {
      case StringType => (c: String) => s"$c.getBytes()"
      case _ => (c: String) => c
    }
    defineCodeGen(ctx, ev, c => s"graft.plans.Md5Prefix60.hash(${toBytes(c)})")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object Md5Prefix60 {
  private val local = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }

  /** First 60 bits of md5(bytes) as a non-negative long. */
  def hash(bytes: Array[Byte]): Long = {
    val md = local.get()
    md.reset()
    val d = md.digest(bytes)
    (((d(0) & 0xffL) << 56) | ((d(1) & 0xffL) << 48) |
      ((d(2) & 0xffL) << 40) | ((d(3) & 0xffL) << 32) |
      ((d(4) & 0xffL) << 24) | ((d(5) & 0xffL) << 16) |
      ((d(6) & 0xffL) << 8) | (d(7) & 0xffL)) >>> 4
  }
}
