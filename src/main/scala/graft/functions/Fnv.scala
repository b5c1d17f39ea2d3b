package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Cast, Expression, ExpressionDescription, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** FNV-1a hashing expressions for the dedup operators (SURVEY §7.5).
  *
  * Chosen over `xxhash64`/murmur3 deliberately: FNV-1a's fold is
  * `h = (h ^ byte) * prime mod 2^64` with a byte-sized XOR operand, which
  * an engine-independent SQL oracle can replicate exactly (DuckDB HUGEINT
  * arithmetic + the low-byte XOR decomposition — the same verified
  * pattern as the mm02 checksum oracle). xxhash64's 64-bit rotates and
  * full-width XORs have no such practical SQL form, which is what kept
  * d04/d05 rows-only in round 1.
  *
  * Both expressions are codegen'd (static call, no boxing); avalanche
  * quality is adequate for MinHash permutations and SimHash bit votes —
  * collision structure only shifts recall marginally, and the recall
  * specs pin it.
  */
object Fnv {

  val Basis: Long = 0xcbf29ce484222325L
  val Prime: Long = 0x100000001b3L

  /** FNV-1a over the UTF-8 bytes of a string. */
  def hashUtf8(s: UTF8String): Long = {
    val bytes = s.getBytes
    var h = Basis
    var i = 0
    while (i < bytes.length) {
      h ^= (bytes(i) & 0xffL)
      h *= Prime
      i += 1
    }
    h
  }

  /** FNV-1a over 4 little-endian bytes of `seed` then 8 little-endian
    * bytes of `h` — the MinHash permutation family h_i(x).
    */
  def hashPerm(seed: Int, h: Long): Long = {
    var x = Basis
    var k = 0
    while (k < 4) {
      x ^= (seed >>> (8 * k)) & 0xffL
      x *= Prime
      k += 1
    }
    k = 0
    while (k < 8) {
      x ^= (h >>> (8 * k)) & 0xffL
      x *= Prime
      k += 1
    }
    x
  }

  def fnv1a64(c: Column): Column = {
    import org.apache.spark.sql.graft.ColumnBridge
    ColumnBridge.column(Fnv1a64(ColumnBridge.expression(c)))
  }

  def fnv1a_perm(seed: Column, h: Column): Column = {
    import org.apache.spark.sql.graft.ColumnBridge
    ColumnBridge.column(Fnv1aPerm(
      ColumnBridge.expression(seed), ColumnBridge.expression(h)))
  }

  /** SQL-registry builder: coerces the int/int literals SQL text
    * produces (the expression itself is strictly (int, bigint)).
    */
  def permBuilder(exprs: Seq[Expression]): Expression =
    Fnv1aPerm(Cast(exprs(0), IntegerType), Cast(exprs(1), LongType))
}

@ExpressionDescription(
  usage = "fnv1a64(s) - FNV-1a 64-bit hash of a string's UTF-8 bytes")
case class Fnv1a64(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"fnv1a64 expects a string argument, got ${other.catalogString}")
    }

  override def nullSafeEval(s: Any): Any =
    Fnv.hashUtf8(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, s => s"graft.functions.Fnv.hashUtf8($s)")

  override protected def withNewChildInternal(newChild: Expression): Fnv1a64 =
    copy(child = newChild)
}

@ExpressionDescription(
  usage = "fnv1a_perm(i, h) - FNV-1a over 4 seed bytes + 8 hash bytes (MinHash permutation)")
case class Fnv1aPerm(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (IntegerType, LongType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"fnv1a_perm expects (int, bigint), got ${l.catalogString}/${r.catalogString}")
    }

  override def nullSafeEval(seed: Any, h: Any): Any =
    Fnv.hashPerm(seed.asInstanceOf[Int], h.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.Fnv.hashPerm($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Fnv1aPerm =
    copy(left = newLeft, right = newRight)
}
