package graft

import java.math.{BigDecimal => JBigDecimal}

import org.scalatest.funsuite.AnyFunSuite

import graft.codec.OBytes
import graft.codec.CodecFunctions._

/** OBytes contract: for every type, unsigned-lex(encode(a), encode(b))
  * orders exactly like (a, b); decode is the exact inverse; DESC is the
  * complement order; composite concatenation orders like the tuple.
  */
class CodecSpec extends AnyFunSuite {

  private val rnd = new scala.util.Random(42)

  private def checkOrder[T](vs: Seq[T], enc: (T, Boolean) => Array[Byte],
      cmp: (T, T) => Int): Unit = {
    val pairs = for (a <- vs; b <- vs) yield (a, b)
    pairs.foreach { case (a, b) =>
      val asc = OBytes.compare(enc(a, false), enc(b, false))
      val dsc = OBytes.compare(enc(a, true), enc(b, true))
      val ref = cmp(a, b)
      assert(math.signum(asc) == math.signum(ref), s"asc order $a vs $b")
      assert(math.signum(dsc) == -math.signum(ref), s"desc order $a vs $b")
    }
  }

  private val longs = Seq(Long.MinValue, Long.MinValue + 1, -1000000L, -1L, 0L, 1L,
    42L, 1000000L, Long.MaxValue - 1, Long.MaxValue) ++ Seq.fill(30)(rnd.nextLong())

  private val doubles = Seq(Double.NegativeInfinity, -1.0e300, -1.5, -0.0, 0.0,
    Double.MinPositiveValue, 1.5, 1.0e300, Double.PositiveInfinity) ++
    Seq.fill(30)(rnd.nextGaussian() * 1e6)

  private val strings = Seq("", "a", "aa", "ab", "b", "ba", "zÿ", "épée",
    "日本語", "") ++ Seq.fill(20)(rnd.alphanumeric.take(rnd.nextInt(12)).mkString)

  private val numerics = Seq("-123456789.123456789", "-100", "-99.5", "-1", "-0.001",
    "0", "0.001", "0.5", "1", "1.0000001", "99.5", "100", "123456789.123456789",
    "1e-20", "-1e-20", "1e20", "9.99e19").map(new JBigDecimal(_))

  test("long: order + roundtrip, asc and desc") {
    checkOrder[Long](longs, OBytes.encodeLong, _ compareTo _)
    for (v <- longs; d <- Seq(false, true))
      assert(OBytes.decodeLong(OBytes.encodeLong(v, d), d) == v)
  }

  test("double: IEEE total order + bit-exact roundtrip") {
    checkOrder[Double](doubles, OBytes.encodeDouble,
      (a, b) => java.lang.Double.compare(a, b))
    for (v <- doubles :+ Double.NaN; d <- Seq(false, true)) {
      val back = OBytes.decodeDouble(OBytes.encodeDouble(v, d), d)
      assert(java.lang.Double.doubleToLongBits(back) ==
        java.lang.Double.doubleToLongBits(v), s"roundtrip $v")
    }
    // NaN sorts above +Inf (total order), -0.0 below 0.0
    assert(OBytes.compare(OBytes.encodeDouble(Double.NaN, false),
      OBytes.encodeDouble(Double.PositiveInfinity, false)) > 0)
    assert(OBytes.compare(OBytes.encodeDouble(-0.0, false),
      OBytes.encodeDouble(0.0, false)) < 0)
  }

  test("string: UTF-8 order + roundtrip; NUL rejected") {
    // encoded order must equal UTF-8 byte order (= codepoint order)
    def cmp(a: String, b: String) = {
      val x = a.getBytes("UTF-8"); val y = b.getBytes("UTF-8")
      OBytes.compare(x, y)
    }
    checkOrder[String](strings, OBytes.encodeString, cmp)
    for (v <- strings; d <- Seq(false, true))
      assert(OBytes.decodeString(OBytes.encodeString(v, d), d) == v)
    intercept[IllegalArgumentException](OBytes.encodeString("a\u0000b", false))
  }

  test("numeric: arbitrary-precision order + exact roundtrip") {
    checkOrder[JBigDecimal](numerics, OBytes.encodeNumeric, _ compareTo _)
    for (v <- numerics; d <- Seq(false, true))
      assert(OBytes.decodeNumeric(OBytes.encodeNumeric(v, d), d).compareTo(v) == 0)
  }

  test("numeric: randomized order/roundtrip across magnitudes and scales") {
    // seeded sweep: 300 BigDecimals spanning 1e-30..1e+30, mixed signs
    // and scales, pairwise order preserved and roundtrip exact
    val r = new scala.util.Random(7)
    val vs = Seq.fill(300) {
      val unscaled = BigInt(r.nextLong()).abs + 1
      val scale = r.nextInt(60) - 30
      val sign = if (r.nextBoolean()) 1 else -1
      new JBigDecimal(new java.math.BigInteger((unscaled * sign).toString), scale)
    }.distinct
    val sortedByBytes = vs.sortWith((a, b) =>
      OBytes.compare(OBytes.encodeNumeric(a, false), OBytes.encodeNumeric(b, false)) < 0)
    val sortedByValue = vs.sortWith(_.compareTo(_) < 0)
    assert(sortedByBytes.map(_.stripTrailingZeros) ==
      sortedByValue.map(_.stripTrailingZeros))
    vs.foreach(v =>
      assert(OBytes.decodeNumeric(OBytes.encodeNumeric(v, false), false).compareTo(v) == 0))
  }

  test("narrow ints + float32: order + roundtrip, asc and desc") {
    val ints = Seq(Int.MinValue, -1000, -1, 0, 1, 42, Int.MaxValue) ++
      Seq.fill(20)(rnd.nextInt())
    checkOrder[Int](ints, OBytes.encodeInt, Ordering[Int].compare)
    ints.foreach { v =>
      assert(OBytes.decodeInt(OBytes.encodeInt(v, false), false) == v)
      assert(OBytes.decodeInt(OBytes.encodeInt(v, true), true) == v)
    }
    val shorts = Seq(Short.MinValue, -1, 0, 1, Short.MaxValue).map(_.toShort) ++
      Seq.fill(20)(rnd.nextInt().toShort)
    checkOrder[Short](shorts, OBytes.encodeShort, Ordering[Short].compare)
    shorts.foreach(v => assert(OBytes.decodeShort(OBytes.encodeShort(v, true), true) == v))
    val bytes = (Byte.MinValue to Byte.MaxValue).map(_.toByte)
    checkOrder[Byte](bytes.take(16) ++ bytes.takeRight(16), OBytes.encodeByte,
      Ordering[Byte].compare)
    bytes.foreach(v => assert(OBytes.decodeByte(OBytes.encodeByte(v, false), false) == v))
    val floats = Seq(Float.NegativeInfinity, -1.5f, -0.0f, 0.0f, 1.5f,
      Float.PositiveInfinity) ++ Seq.fill(20)(rnd.nextFloat() * 1e6f - 5e5f)
    checkOrder[Float](floats, OBytes.encodeFloat,
      (a, b) => java.lang.Float.compare(a, b))
    floats.foreach { v =>
      assert(java.lang.Float.floatToIntBits(
        OBytes.decodeFloat(OBytes.encodeFloat(v, true), true)) ==
        java.lang.Float.floatToIntBits(v))
    }
  }

  test("blobvar: lex order + roundtrip incl. embedded NULs and prefixes") {
    val blobs: Seq[Array[Byte]] = Seq(
      Array.emptyByteArray, Array[Byte](0), Array[Byte](0, 0),
      Array[Byte](0, 1), Array[Byte](0, -1), Array[Byte](1),
      Array[Byte](1, 0), Array[Byte](-1), Array[Byte](-1, -1),
      "abc".getBytes, "abcd".getBytes) ++
      Seq.fill(20)(Array.fill(rnd.nextInt(8))(rnd.nextInt(256).toByte))
    def lexCmp(a: Array[Byte], b: Array[Byte]): Int = OBytes.compare(a, b)
    checkOrder[Array[Byte]](blobs, OBytes.encodeBlobVar, lexCmp)
    blobs.foreach { v =>
      assert(java.util.Arrays.equals(
        OBytes.decodeBlobVar(OBytes.encodeBlobVar(v, false), false), v))
      assert(java.util.Arrays.equals(
        OBytes.decodeBlobVar(OBytes.encodeBlobVar(v, true), true), v))
      assert(java.util.Arrays.equals(
        OBytes.decodeBlobCopy(OBytes.encodeBlobCopy(v, true), true), v))
    }
    // self-terminating in composite position: (blob, long) tuple order
    val tuples = for (b <- blobs.take(11); l <- Seq(-1L, 0L, 7L)) yield (b, l)
    val enc = tuples.map { case (b, l) =>
      ((b, l), OBytes.encodeBlobVar(b, false) ++ OBytes.encodeLong(l, false))
    }
    for ((ta, ea) <- enc; (tb, eb) <- enc) {
      val ref = { val c = lexCmp(ta._1, tb._1); if (c != 0) c else java.lang.Long.compare(ta._2, tb._2) }
      assert(math.signum(OBytes.compare(ea, eb)) == math.signum(ref), s"tuple $ta vs $tb")
    }
  }

  test("composite keys: concat orders like the tuple (prefix-free)") {
    val tuples = for {
      s <- Seq("a", "ab", "b", "")
      l <- Seq(-1L, 0L, 7L)
      x <- Seq(-2.5, 0.0, 3.25)
    } yield (s, l, x)
    def enc(t: (String, Long, Double)): Array[Byte] =
      OBytes.encodeString(t._1, false) ++ OBytes.encodeLong(t._2, false) ++
        OBytes.encodeDouble(t._3, false)
    val sortedByBytes = tuples.sortWith((a, b) => OBytes.compare(enc(a), enc(b)) < 0)
    val sortedByTuple = tuples.sortBy(identity)
    assert(sortedByBytes == sortedByTuple)
  }
}

/** Expression layer: codegen + interpreted agree; SQL registration. */
class CodecExprSpec extends SparkSpec {
  import org.apache.spark.sql.functions._

  test("ordered_encode/decode expressions roundtrip on a DataFrame") {
    import spark.implicits._
    val df = Seq((1L, 2.5, "x"), (-5L, -0.5, "épée"), (0L, 0.0, ""))
      .toDF("l", "d", "s")
    val back = df.select(
      ordered_decode_long(ordered_encode($"l")).as("l"),
      ordered_decode_double(ordered_encode($"d", desc = true), desc = true).as("d"),
      ordered_decode_string(ordered_encode($"s")).as("s"))
    assert(back.collect().toSeq == df.collect().toSeq)
  }

  test("sort by ordered_key equals sort by tuple") {
    import spark.implicits._
    val df = Seq(("b", 1L), ("a", 9L), ("a", -3L), ("ab", 0L)).toDF("s", "l")
    val byKey = df.orderBy(ordered_key($"s", $"l")).as[(String, Long)].collect().toSeq
    val byTuple = df.orderBy($"s", $"l").as[(String, Long)].collect().toSeq
    assert(byKey == byTuple)
  }

  test("ordered_struct and ordered_union order like their contracts") {
    import spark.implicits._
    // struct: (s ASC, l DESC) per-field order
    val df = Seq(("b", 1L), ("a", 9L), ("a", -3L), ("ab", 0L)).toDF("s", "l")
    val byKey = df.orderBy(ordered_struct(OField($"s"), OField($"l", desc = true)))
      .as[(String, Long)].collect().toSeq
    val byTuple = df.orderBy($"s", $"l".desc).as[(String, Long)].collect().toSeq
    assert(byKey == byTuple)
    // union: tag orders first, then the active member
    val u = Seq((Some(5L), None), (Some(-1L), None), (None, Some("a")), (None, Some("A")))
      .toDF("n", "t")
    val got = u.orderBy(ordered_union($"n", $"t"))
      .select(concat_ws("/", $"n", $"t")).as[String].collect().toSeq
    assert(got == Seq("-1", "5", "A", "a"))
  }

  test("SQL registration: ordered_encode usable from spark.sql") {
    graft.codec.CodecFunctions.register(spark)
    val n = spark.sql(
      "SELECT ordered_encode(CAST(7 AS BIGINT)) AS k").collect()(0).getAs[Array[Byte]](0)
    assert(n.length == 8)
  }
}
