package graft

import java.nio.charset.StandardCharsets.UTF_8

import org.scalatest.funsuite.AnyFunSuite

import graft.admin.RegionSplit

/** RegionSplit vs the reference's own fixtures
  * (TestRegionSplitter.java:164-319 — unitTestHexStringSplit,
  * unitTestDecimalStringSplit, unitTestUniformSplit). */
class RegionSplitSpec extends AnyFunSuite {

  private def b(s: String): Array[Byte] = s.getBytes(UTF_8)

  test("HexStringSplit: split(n), midpoints, multi-mapper ranges") {
    assert(RegionSplit.hexStringSplit(2) == Seq("80000000"))
    assert(RegionSplit.hexStringSplit(3) == Seq("55555555", "aaaaaaaa"))
    // region midpoints (NumberStringSplit.split2 via split(start,end))
    def mid(a: String, bb: String) =
      RegionSplit.numberSplit2(a, bb, 16, "FFFFFFFF")
    assert(mid("10000000", "30000000") == "20000000")
    assert(mid("00000000", "20000000") == "10000000")
    // top region: b == lastRow widens by one before halving
    assert(mid("dfffffff", "ffffffff") == "efffffff")
  }

  test("DecimalStringSplit: split(n) and midpoints") {
    assert(RegionSplit.decimalStringSplit(2) == Seq("50000000"))
    assert(RegionSplit.decimalStringSplit(3) == Seq("33333333", "66666666"))
    def mid(a: String, bb: String) =
      RegionSplit.numberSplit2(a, bb, 10, "99999999")
    assert(mid("10000000", "30000000") == "20000000")
    assert(mid("00000000", "19999999") == "09999999")
    assert(mid("79999999", "99999999") == "89999999")
  }

  test("UniformSplit: split(n) over the byte keyspace") {
    intercept[IllegalArgumentException](RegionSplit.uniformSplit(1))
    assert(RegionSplit.uniformSplit(2).map(RegionSplit.hex) ==
      Seq("8000000000000000"))
    assert(RegionSplit.uniformSplit(3).map(RegionSplit.hex) ==
      Seq("5555555555555555", "aaaaaaaaaaaaaaaa"))
  }

  test("UniformSplit: pairwise midpoints incl. the widening carry") {
    def mid(a: Array[Byte], bb: Array[Byte]) =
      RegionSplit.uniformSplit2(a, bb)
    assert(mid(Array(0x10), Array(0x30)).toSeq == Seq(0x20.toByte))
    assert(mid(Array.emptyByteArray, Array(0x20)).toSeq == Seq(0x10.toByte))
    val ff = 0xFF.toByte
    assert(mid(Array(0xdf.toByte, ff, ff, ff, ff, ff, ff, ff),
      Array.fill[Byte](8)(ff)).toSeq ==
      Seq(0xef.toByte, ff, ff, ff, ff, ff, ff, ff))
    // 'aaa'..'aab': range 1 < 2 splits — widen by a zero byte
    // (Bytes.java:1846-1858) → 'aaa\x80'
    assert(mid(b("aaa"), b("aab")).toSeq ==
      (b("aaa") :+ 0x80.toByte).toSeq)
  }

  test("UniformSplit: multi-mapper interior splits, exclusive + inclusive") {
    // UniformSplit.split(start, end, numSplits, inclusive) is always
    // Bytes.split(start, end, true, numSplits - 1)
    // (RegionSplitter.java:1074-1094); exclusive drops the endpoints
    val ex = RegionSplit.bytesSplit(b("aaa"), b("aad"), inclusive = true, num = 2)
    assert(ex.slice(1, 3).map(_.toSeq) == Seq(b("aab").toSeq, b("aac").toSeq))
    val inc = RegionSplit.bytesSplit(b("aaa"), b("aae"), inclusive = true, num = 1)
    assert(inc(1).toSeq == b("aac").toSeq)
  }

  test("NumberStringSplit preconditions: too-granular split refused") {
    // range 0..F is 16 keys; 17 regions cannot split it
    intercept[IllegalArgumentException](
      RegionSplit.numberStringSplit(17, 16, "F"))
    // exactly 16 is fine
    assert(RegionSplit.numberStringSplit(16, 16, "F").size == 15)
  }
}
