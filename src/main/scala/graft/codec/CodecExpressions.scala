package graft.codec

import org.apache.spark.sql.Column
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.functions.concat
import org.apache.spark.sql.graft.{shim => colshim}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** UTF8String/Decimal bridges so codegen can call straight into
  * [[OBytes]] without driver-side conversions. Standalone Scala objects
  * emit static forwarders, so Janino calls these as plain static
  * methods inside whole-stage codegen.
  */
object CodecBridge {
  def encUtf8(s: UTF8String, desc: Boolean): Array[Byte] =
    OBytes.encodeString(s.toString, desc)
  def decUtf8(b: Array[Byte], desc: Boolean): UTF8String =
    UTF8String.fromString(OBytes.decodeString(b, desc))
  def encDecimal(d: Decimal, desc: Boolean): Array[Byte] =
    OBytes.encodeNumeric(d.toJavaBigDecimal, desc)
}

/** `ordered_encode(col[, desc])`: order-preserving byte encoding of a
  * key column (SURVEY.md §1.2/§4 — the reference's `OrderedBytes` /
  * `types.DataType` surface, OrderedBytes.java:297). Output is
  * BinaryType whose unsigned-lex order equals the value order (inverted
  * when `desc`); encodings are self-terminating, so composite row keys
  * are plain `concat(...)` — the reference's `Struct` device
  * (types/Struct.java). Sorting/range-partitioning by such a key
  * (`repartitionByRange`) is graft's analogue of the reference's
  * region-split-by-key layout.
  */
case class OrderedEncode(child: Expression, desc: Boolean)
    extends UnaryExpression {

  override def dataType: DataType = BinaryType
  override def prettyName: String = "ordered_encode"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType | IntegerType | ShortType | ByteType | DoubleType | FloatType |
        StringType | TimestampType | _: DecimalType =>
      TypeCheckResult.TypeCheckSuccess
    case t =>
      TypeCheckResult.TypeCheckFailure(s"ordered_encode: unsupported key type $t")
  }

  override protected def nullSafeEval(v: Any): Any = child.dataType match {
    case LongType | TimestampType => OBytes.encodeLong(v.asInstanceOf[Long], desc)
    case IntegerType              => OBytes.encodeLong(v.asInstanceOf[Int].toLong, desc)
    case ShortType                => OBytes.encodeLong(v.asInstanceOf[Short].toLong, desc)
    case ByteType                 => OBytes.encodeLong(v.asInstanceOf[Byte].toLong, desc)
    case DoubleType               => OBytes.encodeDouble(v.asInstanceOf[Double], desc)
    case FloatType                => OBytes.encodeDouble(v.asInstanceOf[Float].toDouble, desc)
    case StringType               => CodecBridge.encUtf8(v.asInstanceOf[UTF8String], desc)
    case _: DecimalType           => CodecBridge.encDecimal(v.asInstanceOf[Decimal], desc)
    case t                        => sys.error(s"unsupported key type $t")
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => child.dataType match {
      case LongType | TimestampType => s"graft.codec.OBytes.encodeLong($c, $desc)"
      case IntegerType | ShortType | ByteType =>
        s"graft.codec.OBytes.encodeLong((long) $c, $desc)"
      case DoubleType => s"graft.codec.OBytes.encodeDouble($c, $desc)"
      case FloatType  => s"graft.codec.OBytes.encodeDouble((double) $c, $desc)"
      case StringType => s"graft.codec.CodecBridge.encUtf8($c, $desc)"
      case _: DecimalType => s"graft.codec.CodecBridge.encDecimal($c, $desc)"
      case t => sys.error(s"unsupported key type $t")
    })

  override protected def withNewChildInternal(newChild: Expression): OrderedEncode =
    copy(child = newChild)
}

/** `ordered_decode_<type>(bytes[, desc])`: exact inverse of
  * [[OrderedEncode]] for a binary column holding one encoded value.
  * `target` picks the decoder; numeric decodes through BigDecimal to
  * DoubleType (the exact-BigDecimal path is the OBytes API itself).
  */
case class OrderedDecode(child: Expression, target: DataType, desc: Boolean)
    extends UnaryExpression {

  override def dataType: DataType = target
  override def prettyName: String = "ordered_decode"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"ordered_decode: needs binary input, got $t")
  }

  override protected def nullSafeEval(v: Any): Any = {
    val b = v.asInstanceOf[Array[Byte]]
    target match {
      case LongType | TimestampType => OBytes.decodeLong(b, desc)
      case DoubleType               => OBytes.decodeDouble(b, desc)
      case StringType               => CodecBridge.decUtf8(b, desc)
      case t                        => sys.error(s"unsupported decode type $t")
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => target match {
      case LongType | TimestampType => s"graft.codec.OBytes.decodeLong($c, $desc)"
      case DoubleType               => s"graft.codec.OBytes.decodeDouble($c, $desc)"
      case StringType               => s"graft.codec.CodecBridge.decUtf8($c, $desc)"
      case t                        => sys.error(s"unsupported decode type $t")
    })

  override protected def withNewChildInternal(newChild: Expression): OrderedDecode =
    copy(child = newChild)
}

/** Numeric (arbitrary-precision) decode surfaced as DoubleType — the
  * `OrderedNumeric.decodeDouble` analogue. Interpreted-only eval is
  * fine here: it sits on small decoded outputs, not the scan hot path.
  */
case class OrderedDecodeNumeric(child: Expression, desc: Boolean)
    extends UnaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "ordered_decode_numeric"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"ordered_decode_numeric: needs binary input, got $t")
  }

  override protected def nullSafeEval(v: Any): Any =
    OBytes.decodeNumericDouble(v.asInstanceOf[Array[Byte]], desc)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.codec.OBytes.decodeNumericDouble($c, $desc)")

  override protected def withNewChildInternal(newChild: Expression): OrderedDecodeNumeric =
    copy(child = newChild)
}

/** Column API + SQL registration for the ordered-bytes codec. */
object CodecFunctions {

  def ordered_encode(c: Column): Column = ordered_encode(c, desc = false)
  def ordered_encode(c: Column, desc: Boolean): Column =
    colshim.column(OrderedEncode(colshim.expression(c), desc))

  def ordered_decode_long(c: Column, desc: Boolean = false): Column =
    colshim.column(OrderedDecode(colshim.expression(c), LongType, desc))
  def ordered_decode_ts(c: Column, desc: Boolean = false): Column =
    colshim.column(OrderedDecode(colshim.expression(c), TimestampType, desc))
  def ordered_decode_double(c: Column, desc: Boolean = false): Column =
    colshim.column(OrderedDecode(colshim.expression(c), DoubleType, desc))
  def ordered_decode_string(c: Column, desc: Boolean = false): Column =
    colshim.column(OrderedDecode(colshim.expression(c), StringType, desc))
  def ordered_decode_numeric(c: Column, desc: Boolean = false): Column =
    colshim.column(OrderedDecodeNumeric(colshim.expression(c), desc))

  /** Composite ascending row key: concatenation of the per-column
    * encodings (self-terminating ⇒ prefix-free ⇒ lex order of the
    * concat = tuple order), the reference's `Struct` composition. */
  def ordered_key(cols: Column*): Column =
    concat(cols.map(ordered_encode): _*)

  /** SQL surface: `ordered_encode(x[, desc])`. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("ordered_encode"),
      new ExpressionInfo(classOf[OrderedEncode].getName, null, "ordered_encode"),
      (children: Seq[Expression]) => children match {
        case Seq(c)    => OrderedEncode(c, desc = false)
        case Seq(c, d) => OrderedEncode(c, d.eval() == true)
        case _ => throw new IllegalArgumentException(
          "ordered_encode expects (col) or (col, desc)")
      })
}
