package graft.codec

import java.io.ByteArrayOutputStream
import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets
import java.security.MessageDigest
import javax.crypto.Cipher
import javax.crypto.spec.{IvParameterSpec, SecretKeySpec}

/** HFile transparent-encryption primitives — the reference's
  * encryption-at-rest wire format (hbase-common io/crypto), re-derived
  * in pure JVM crypto so graft can read and write encrypted store
  * files byte-compatibly with a reference cluster:
  *
  *  - Cipher: AES-128 in CTR mode ("AES/CTR/NoPadding" — AES.java:62,
  *    the default and only shipped HFile cipher), 16-byte IV.
  *  - Per-block frame (HFileBlockDefaultEncodingContext.java:142-201):
  *    plaintext 33-byte block header, then [1B ivLength][iv][AES-CTR
  *    ciphertext of the (compressed) payload]; an empty payload is the
  *    single byte 0. Compression runs BEFORE encryption. The write-side
  *    IV advances per block by `1 + bytesOut/16`
  *    (Encryption.incrementIv semantics, Encryption.java:529-541).
  *  - Key wrapping (EncryptionUtil.wrapKey, EncryptionUtil.java:90-126):
  *    the random per-file data key is itself AES-CTR-encrypted under
  *    the subject's master key and shipped in the trailer's
  *    `encryption_key` field (HFile.proto field 13) as a
  *    varint-delimited WrappedKey proto (Encryption.proto: algorithm=1,
  *    length=2, data=3, iv=4, hash=5, hash_algorithm=6), hash =
  *    MD5(plain key) (CRYPTO_KEY_HASH_ALGORITHM default).
  *  - Master-key resolution: subject → MD5(subject) as an AES-128 key
  *    — MockAesKeyProvider parity (MockAesKeyProvider.java:34,
  *    Encryption.hash128). A deployment would swap [[masterKey]] for a
  *    KeyStoreKeyProvider lookup; every byte of the file format is
  *    provider-independent.
  */
object HCrypto {

  /** Default master-key alias (the reference defaults to the current
    * user's short name — CRYPTO_MASTERKEY_NAME_CONF_KEY). */
  val DefaultSubject = "graft"

  val IvLength = 16
  private val KeyLength = 16 // AES-128

  /** Subject alias → AES-128 master key (MD5(subject), the
    * MockAesKeyProvider contract). */
  def masterKey(subject: String): Array[Byte] =
    MessageDigest.getInstance("MD5")
      .digest(subject.getBytes(StandardCharsets.UTF_8))

  /** AES/CTR/NoPadding transform; CTR is its own inverse so one
    * function serves both directions. */
  def ctr(key: Array[Byte], iv: Array[Byte], data: Array[Byte],
      off: Int, len: Int): Array[Byte] = {
    val c = Cipher.getInstance("AES/CTR/NoPadding")
    c.init(Cipher.ENCRYPT_MODE, new SecretKeySpec(key, "AES"),
      new IvParameterSpec(iv))
    c.doFinal(data, off, len)
  }

  def ctr(key: Array[Byte], iv: Array[Byte], data: Array[Byte]): Array[Byte] =
    ctr(key, iv, data, 0, data.length)

  /** Little-endian byte-wise counter increment over the whole IV
    * (Encryption.incrementIv — NOT the big-endian CTR counter; this
    * only decorrelates successive block IVs, readers take the IV from
    * the frame). */
  def incrementIv(iv: Array[Byte], v: Int): Unit = {
    var carry = v
    var i = 0
    while (i < iv.length && carry > 0) {
      val sum = carry + (iv(i) & 0xff)
      iv(i) = (sum % 256).toByte
      carry = sum / 256
      i += 1
    }
  }

  /** Per-file encryption context: master-key alias + plaintext data
    * key. [[randomCtx]] draws the reference's random per-file key. */
  final case class Ctx(subject: String, key: Array[Byte]) {
    require(key.length == KeyLength, s"AES-128 data key must be 16 bytes")
  }

  def randomCtx(subject: String): Ctx = {
    val k = new Array[Byte](KeyLength)
    new java.security.SecureRandom().nextBytes(k)
    Ctx(subject, k)
  }

  private def pbVarint(out: ByteArrayOutputStream, v: Long): Unit = {
    var x = v
    while ((x & ~0x7fL) != 0) { out.write(((x & 0x7f) | 0x80).toInt); x >>>= 7 }
    out.write(x.toInt)
  }
  private def pbField(out: ByteArrayOutputStream, field: Int, wire: Int): Unit =
    pbVarint(out, (field.toLong << 3) | wire)
  private def pbBytes(out: ByteArrayOutputStream, field: Int, v: Array[Byte]): Unit = {
    pbField(out, field, 2); pbVarint(out, v.length.toLong); out.write(v, 0, v.length)
  }

  /** Wrap `key` under `subject`'s master key → the trailer
    * `encryption_key` bytes (varint-delimited WrappedKey proto, the
    * writeDelimitedTo framing EncryptionUtil.wrapKey emits). */
  def wrapKey(subject: String, key: Array[Byte]): Array[Byte] = {
    val iv = new Array[Byte](IvLength)
    new java.security.SecureRandom().nextBytes(iv)
    val data = ctr(masterKey(subject), iv, key)
    val msg = new ByteArrayOutputStream()
    pbBytes(msg, 1, "AES".getBytes(StandardCharsets.UTF_8)) // algorithm
    pbField(msg, 2, 0); pbVarint(msg, key.length.toLong)    // length
    pbBytes(msg, 3, data)                                   // data
    pbBytes(msg, 4, iv)                                     // iv
    pbBytes(msg, 5, MessageDigest.getInstance("MD5").digest(key)) // hash
    pbBytes(msg, 6, "MD5".getBytes(StandardCharsets.UTF_8)) // hash_algorithm
    val out = new ByteArrayOutputStream()
    pbVarint(out, msg.size().toLong)
    msg.writeTo(out)
    out.toByteArray
  }

  /** Unwrap a trailer `encryption_key` under `subject`'s master key;
    * verifies the declared length and key hash (a wrong subject fails
    * here, not as garbage cells — EncryptionUtil.getUnwrapKey). */
  def unwrapKey(subject: String, wrapped: Array[Byte]): Array[Byte] = {
    val bb = ByteBuffer.wrap(wrapped)
    def varint(): Long = {
      var x = 0L; var s = 0
      while ({ val b = bb.get(); x |= (b & 0x7fL) << s; s += 7; (b & 0x80) != 0 }) ()
      x
    }
    val msgLen = varint().toInt
    val end = bb.position() + msgLen
    var algorithm = "AES"; var length = -1
    var data: Array[Byte] = null; var iv: Array[Byte] = null
    var hash: Array[Byte] = null; var hashAlg = "MD5"
    while (bb.position() < end) {
      val tag = varint()
      val field = (tag >> 3).toInt
      (tag & 7).toInt match {
        case 0 =>
          val v = varint()
          if (field == 2) length = v.toInt
        case 2 =>
          val len = varint().toInt
          val b = new Array[Byte](len)
          bb.get(b)
          field match {
            case 1 => algorithm = new String(b, StandardCharsets.UTF_8)
            case 3 => data = b
            case 4 => iv = b
            case 5 => hash = b
            case 6 => hashAlg = new String(b, StandardCharsets.UTF_8)
            case _ => ()
          }
        case w => throw new IllegalArgumentException(s"bad WrappedKey wire type $w")
      }
    }
    require(algorithm == "AES", s"unsupported key algorithm $algorithm")
    require(data != null && iv != null && length >= 0, "incomplete WrappedKey")
    val plain = java.util.Arrays.copyOf(ctr(masterKey(subject), iv, data), length)
    if (hash != null) {
      val got = MessageDigest.getInstance(hashAlg).digest(plain)
      require(java.util.Arrays.equals(got, hash),
        s"crypto key hash mismatch — wrong master key for subject '$subject'?")
    }
    plain
  }
}
