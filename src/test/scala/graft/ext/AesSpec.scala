package graft.ext

import org.scalatest.funsuite.AnyFunSuite

class AesSpec extends AnyFunSuite {

  private def hex(s: String): Array[Byte] =
    s.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray
  private def toHex(b: Array[Byte]): String = b.map("%02x".format(_)).mkString

  test("FIPS-197 appendix C known-answer vectors (AES-128 and AES-256)") {
    val pt = hex("00112233445566778899aabbccddeeff")
    val k128 = hex("000102030405060708090a0b0c0d0e0f")
    assert(toHex(Aes.encryptBlock(k128, pt)) == "69c4e0d86a7b0430d8cdb78070b4c55a")
    assert(toHex(Aes.decryptBlock(k128, hex("69c4e0d86a7b0430d8cdb78070b4c55a"))) == toHex(pt))
    val k256 = hex("000102030405060708090a0b0c0d0e0f101112131415161718191a1b1c1d1e1f")
    assert(toHex(Aes.encryptBlock(k256, pt)) == "8ea2b7ca516745bfeafc49904b496089")
    assert(toHex(Aes.decryptBlock(k256, hex("8ea2b7ca516745bfeafc49904b496089"))) == toHex(pt))
  }

  test("javax.crypto differential: ECB single block, both key sizes, both directions") {
    val r = new scala.util.Random(0xae5L)
    for (keyLen <- Seq(16, 32); _ <- 0 until 32) {
      val key = Array.fill(keyLen)(r.nextInt(256).toByte)
      val block = Array.fill(16)(r.nextInt(256).toByte)
      val c = javax.crypto.Cipher.getInstance("AES/ECB/NoPadding")
      c.init(javax.crypto.Cipher.ENCRYPT_MODE,
        new javax.crypto.spec.SecretKeySpec(key, "AES"))
      val jdk = c.doFinal(block)
      assert(Aes.encryptBlock(key, block).sameElements(jdk), s"enc keyLen=$keyLen")
      assert(Aes.decryptBlock(key, jdk).sameElements(block), s"dec keyLen=$keyLen")
    }
  }

  test("javax.crypto differential: CBC multi-block, both key sizes, both directions") {
    val r = new scala.util.Random(0xcbcL)
    for (keyLen <- Seq(16, 32); n <- Seq(1, 2, 5, 33)) {
      val key = Array.fill(keyLen)(r.nextInt(256).toByte)
      val iv = Array.fill(16)(r.nextInt(256).toByte)
      val data = Array.fill(16 * n)(r.nextInt(256).toByte)
      val c = javax.crypto.Cipher.getInstance("AES/CBC/NoPadding")
      c.init(javax.crypto.Cipher.ENCRYPT_MODE,
        new javax.crypto.spec.SecretKeySpec(key, "AES"),
        new javax.crypto.spec.IvParameterSpec(iv))
      val jdk = c.doFinal(data)
      val ours = Aes.cbcEncrypt(key, iv, data)
      assert(ours.sameElements(jdk), s"cbc enc keyLen=$keyLen n=$n")
      assert(Aes.cbcDecrypt(key, iv, ours).sameElements(data), s"cbc dec keyLen=$keyLen n=$n")
    }
  }

  test("AES-192 key schedule also agrees (unused by Pdf but in the key-expansion path)") {
    val r = new scala.util.Random(0x192L)
    val key = Array.fill(24)(r.nextInt(256).toByte)
    val block = Array.fill(16)(r.nextInt(256).toByte)
    val c = javax.crypto.Cipher.getInstance("AES/ECB/NoPadding")
    c.init(javax.crypto.Cipher.ENCRYPT_MODE, new javax.crypto.spec.SecretKeySpec(key, "AES"))
    assert(Aes.encryptBlock(key, block).sameElements(c.doFinal(block)))
  }
}
