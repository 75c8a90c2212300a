package graft.codec

/** The reference's compound Bloom filter, byte-faithful ROW flavor:
  * MurmurHash-addressed bit arrays sized/folded exactly like
  * BloomFilterUtil/BloomFilterChunk (`hbase-server/.../util/
  * BloomFilterUtil.java:67-147`, `BloomFilterChunk.java:189-279`), so
  * chunks graft writes probe identically under a reference reader and
  * vice versa. Used by [[HFileV3]] for the GENERAL_BLOOM_META /
  * BLMFBLK2 sections.
  */
object HBloom {

  val Version = 3 // CompoundBloomFilterBase.VERSION
  val HashTypeMurmur = 1 // Hash.MURMUR_HASH
  val DefaultChunkByteSizeHint = 131072 // io.storefile.bloom.block.size
  val DefaultErrorRate = 0.01 // io.storefile.bloom.error.rate
  val DefaultMaxFold = 7 // io.storefile.bloom.max.fold

  private val Log2Squared = math.log(2) * math.log(2)

  /** MurmurHash (the reference's Hash.MURMUR_HASH implementation,
    * `hbase-common/.../util/MurmurHash.java:41-85`): little-endian
    * 4-byte words, signed-byte tail mixing. */
  def murmur(data: Array[Byte], seed: Int): Int = {
    val m = 0x5bd1e995
    val r = 24
    val length = data.length
    var h = seed ^ length
    val len4 = length >> 2
    var i = 0
    while (i < len4) {
      val o = i << 2
      var k = (data(o) & 0xff) | ((data(o + 1) & 0xff) << 8) |
        ((data(o + 2) & 0xff) << 16) | ((data(o + 3) & 0xff) << 24)
      k *= m
      k ^= k >>> r
      k *= m
      h *= m
      h ^= k
      i += 1
    }
    val lenM = len4 << 2
    val left = length - lenM
    if (left != 0) {
      // signed bytes, exactly as the reference mixes them
      if (left >= 3) h ^= data(lenM + 2).toInt << 16
      if (left >= 2) h ^= data(lenM + 1).toInt << 8
      if (left >= 1) h ^= data(lenM).toInt
      h *= m
    }
    h ^= h >>> 13
    h *= m
    h ^= h >>> 15
    h
  }

  // --- BloomFilterUtil sizing (same names as the reference) ---

  def computeFoldableByteSize(bitSize: Long, foldFactor: Int): Int = {
    var byteSizeLong = (bitSize + 7) / 8
    val mask = (1 << foldFactor) - 1
    if ((mask & byteSizeLong) != 0) {
      byteSizeLong >>= foldFactor
      byteSizeLong += 1
      byteSizeLong <<= foldFactor
    }
    require(byteSizeLong <= Int.MaxValue, s"bloom too large: $byteSizeLong")
    byteSizeLong.toInt
  }

  def idealMaxKeys(bitSize: Long, errorRate: Double): Long =
    (bitSize * (Log2Squared / -math.log(errorRate))).toLong

  def optimalFunctionCount(maxKeys: Long, bitSize: Long): Int = {
    val i = bitSize / maxKeys
    math.ceil(math.log(2) * i).toInt
  }

  def computeMaxKeys(bitSize: Long, errorRate: Double, hashCount: Int): Long =
    (-bitSize * 1.0 / hashCount *
      math.log(1 - math.exp(math.log(errorRate) / hashCount))).toLong

  /** One bloom chunk — BloomFilterChunk with ROW keys. */
  final class Chunk private[HBloom] (
      var byteSize: Int, val hashCount: Int, var maxKeys: Long) {
    var bits: Array[Byte] = new Array[Byte](byteSize)
    var keyCount: Long = 0L

    def add(row: Array[Byte]): Unit = {
      val hash1 = murmur(row, 0)
      val hash2 = murmur(row, hash1)
      val bitSize = byteSize.toLong * 8
      var i = 0
      while (i < hashCount) {
        // int wraparound of hash1 + i*hash2, then long modulo — the
        // write path's exact arithmetic (BloomFilterChunk.java:189-196)
        val loc = math.abs((hash1 + i * hash2).toLong % bitSize)
        bits((loc / 8).toInt) = (bits((loc / 8).toInt) | (1 << (loc % 8).toInt)).toByte
        i += 1
      }
      keyCount += 1
    }

    /** Lossless fold-in-half while half the capacity still fits —
      * BloomFilterChunk.compactBloom. */
    def compact(): Unit = {
      if (keyCount > 0) {
        var pieces = 1
        var newByteSize = byteSize
        var newMaxKeys = maxKeys
        while ((newByteSize & 1) == 0 && newMaxKeys > (keyCount << 1)) {
          pieces <<= 1
          newByteSize >>= 1
          newMaxKeys >>= 1
        }
        if (pieces > 1) {
          val array = bits
          val end = newByteSize
          var off = end
          var p = 1
          while (p < pieces) {
            var pos = 0
            while (pos < end) {
              array(pos) = (array(pos) | array(off)).toByte
              pos += 1; off += 1
            }
            p += 1
          }
          bits = java.util.Arrays.copyOf(array, newByteSize)
          byteSize = newByteSize
          maxKeys = newMaxKeys
        }
      }
    }

    def createAnother(): Chunk = new Chunk(byteSize, hashCount, maxKeys)
  }

  /** BloomFilterUtil.createBySize with the ROW defaults. */
  def createBySize(byteSizeHint: Int = DefaultChunkByteSizeHint,
      errorRate: Double = DefaultErrorRate,
      maxFold: Int = DefaultMaxFold): Chunk = {
    val byteSize = computeFoldableByteSize(byteSizeHint * 8L, maxFold)
    val bitSize = byteSize * 8L
    var maxKeys = idealMaxKeys(bitSize, errorRate)
    val hashCount = optimalFunctionCount(maxKeys, bitSize)
    maxKeys = computeMaxKeys(bitSize, errorRate, hashCount)
    new Chunk(byteSize, hashCount, maxKeys)
  }

  /** Read-side probe — BloomFilterUtil.contains' exact int
    * arithmetic over a chunk's bit array. */
  def contains(row: Array[Byte], bits: Array[Byte], hashCount: Int): Boolean = {
    val hash1 = murmur(row, 0)
    val hash2 = murmur(row, hash1)
    val bloomBitSize = bits.length << 3
    var compositeHash = hash1
    var i = 0
    while (i < hashCount) {
      val hashLoc = math.abs(compositeHash % bloomBitSize)
      compositeHash += hash2
      if ((bits(hashLoc >> 3) & (1 << (hashLoc & 7))) == 0) return false
      i += 1
    }
    true
  }
}
