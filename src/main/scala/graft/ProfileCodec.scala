package graft

import java.io.ByteArrayOutputStream

import graft.codec.{BlockEncoding, HFileV3}
import graft.codec.HFileV3.HCell

/** Diagnostic (dev-only, not a declared surface): single-threaded
  * HFileV3 encode/decode throughput — the per-cell codec cost that
  * underlies q113/q85/q99/q101 and the c-suite. Prints cells/s per
  * phase; rep 1 absorbs JIT, read the last rep.
  * Args: [nCells] [reps] (defaults 1000000 3).
  */
object ProfileCodec {
  def main(args: Array[String]): Unit = {
    val n = if (args.length > 0) args(0).toInt else 1000000
    val reps = if (args.length > 1) args(1).toInt else 3
    val fam = "d".getBytes("UTF-8")
    val cells: IndexedSeq[HCell] = (0 until n).map { i =>
      val row = f"r${i / 3}%08d".getBytes("UTF-8")
      val qual = s"c${i % 3}".getBytes("UTF-8")
      val value = f"v$i%012d-payload".getBytes("UTF-8")
      HCell(row, fam, qual, 1000L + (i % 7), HFileV3.TypePut, value)
    }
    def time(label: String)(body: => Long): Unit = {
      val t0 = System.nanoTime()
      val out = body
      val s = (System.nanoTime() - t0) / 1e9
      println(f"  $label%-28s ${s}%7.3f s  ${n / s / 1000}%9.0f kcells/s  (chk $out)")
    }
    (1 to reps).foreach { rep =>
      println(s"===== rep $rep (n=$n) =====")
      var bytes4k: Array[Byte] = null
      var bytes64k: Array[Byte] = null
      var bytesFd: Array[Byte] = null
      time("write NONE bs=4096") {
        val bos = new ByteArrayOutputStream(64 << 20)
        HFileV3.write(bos, cells.iterator, blockSize = 4096)
        bytes4k = bos.toByteArray
        bytes4k.length.toLong
      }
      time("write NONE bs=65536") {
        val bos = new ByteArrayOutputStream(64 << 20)
        HFileV3.write(bos, cells.iterator, blockSize = 65536)
        bytes64k = bos.toByteArray
        bytes64k.length.toLong
      }
      time("write FAST_DIFF bs=65536") {
        val bos = new ByteArrayOutputStream(64 << 20)
        HFileV3.write(bos, cells.iterator, blockSize = 65536,
          encoding = BlockEncoding.IdFastDiff)
        bytesFd = bos.toByteArray
        bytesFd.length.toLong
      }
      time("read NONE bs=4096") {
        var k = 0L
        HFileV3.readCells(bytes4k).foreach(c => k += c.value.length)
        k
      }
      time("read NONE bs=65536") {
        var k = 0L
        HFileV3.readCells(bytes64k).foreach(c => k += c.value.length)
        k
      }
      time("read FAST_DIFF bs=65536") {
        var k = 0L
        HFileV3.readCells(bytesFd).foreach(c => k += c.value.length)
        k
      }
      time("write GZ bs=65536") {
        val bos = new ByteArrayOutputStream(64 << 20)
        HFileV3.write(bos, cells.iterator, blockSize = 65536, gz = true)
        bos.size().toLong
      }
    }
  }
}
