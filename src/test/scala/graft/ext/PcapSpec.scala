package graft.ext

import org.scalatest.funsuite.AnyFunSuite

class PcapSpec extends AnyFunSuite {

  test("round-trip: every fixture capture recovers its closed forms") {
    for (id <- 0L until 96L) {
      val recs = Pcap.parsePcap(id, Pcap.renderPcap(id))
      assert(recs.length == Pcap.nPacketsOf(id), s"pcap $id packet count")
      recs.zipWithIndex.foreach { case (r, k) =>
        assert(r.pkt_idx == k, s"pcap $id k$k idx")
        assert(r.ts_sec == Pcap.tsSecOf(id, k), s"pcap $id k$k ts")
        assert(r.ts_frac == Pcap.tsFracOf(id, k), s"pcap $id k$k frac")
        assert(r.nanos == Pcap.isNanos(id), s"pcap $id k$k unit")
        assert(r.incl_len == 42 + Pcap.payloadLenOf(id, k), s"pcap $id k$k len")
        assert(r.src_ip == Pcap.srcIpOf(id, k), s"pcap $id k$k src")
        assert(r.dst_ip == Pcap.dstIpOf(id, k), s"pcap $id k$k dst")
        assert(r.protocol == 17, s"pcap $id k$k proto")
        assert(r.sport == Pcap.sportOf(id, k) && r.dport == Pcap.dportOf(id, k), s"pcap $id k$k ports")
        var cks = 0L
        Pcap.payloadOf(id, k).foreach(x => cks = (cks * 31 + (x & 0xff)) % 1000000007L)
        assert(r.payload_len == Pcap.payloadLenOf(id, k) && r.payload_checksum == cks,
          s"pcap $id k$k payload")
      }
    }
  }

  test("both byte orders and both timestamp units round-trip") {
    // id 0: LE nanos; id 1: BE micro; id 3: BE nanos; id 2: LE micro
    assert(!Pcap.isBigEndian(0) && Pcap.isNanos(0))
    assert(Pcap.isBigEndian(1) && !Pcap.isNanos(1))
    assert(Pcap.isBigEndian(3) && Pcap.isNanos(3))
    assert(!Pcap.isBigEndian(2) && !Pcap.isNanos(2))
    Seq(0L, 1L, 2L, 3L).foreach(id => assert(Pcap.parsePcapSafe(id, Pcap.renderPcap(id)).nonEmpty))
  }

  test("header rules: magic, version, linktype, snaplen") {
    val good = Pcap.renderPcap(2L) // LE micro
    def mut(at: Int, v: Byte): Array[Byte] = { val b = good.clone(); b(at) = v; b }
    assert(Pcap.parsePcapSafe(2L, mut(0, 0x00)).isEmpty, "unknown magic")
    assert(Pcap.parsePcapSafe(2L, mut(4, 3)).isEmpty, "wrong major version")
    assert(Pcap.parsePcapSafe(2L, mut(20, 101.toByte)).isEmpty, "foreign linktype (LINKTYPE_RAW)")
    assert(Pcap.parsePcapSafe(2L, good.take(20)).isEmpty, "truncated global header")
    assert(Pcap.parsePcapSafe(2L, good ++ Array[Byte](1)).isEmpty, "trailing garbage")
  }

  test("packet rules: checksum verification, length cross-checks, frac bound") {
    val good = Pcap.renderPcap(2L)
    def mut(at: Int, f: Byte => Byte): Array[Byte] = { val b = good.clone(); b(at) = f(b(at)); b }
    // first packet: record header at 24, data at 40; IPv4 at 40+14=54
    // flip a source-IP byte: the verified header checksum must now fail
    assert(Pcap.parsePcapSafe(2L, mut(54 + 12, x => (x ^ 1).toByte)).isEmpty,
      "corrupted IPv4 header fails the verified checksum")
    // micro magic with ts_frac >= 1e6
    val fracAt = 24 + 4
    val big = good.clone()
    big(fracAt + 2) = 0x10 // LE u32 -> >= 1e6
    assert(Pcap.parsePcapSafe(2L, big).isEmpty, "microsecond fraction >= 1e6 is damage")
    // ethertype flip (ARP): a foreign-protocol packet SKIPS — the rest
    // of the capture survives with capture ordinals intact
    val mixed = Pcap.parsePcapSafe(2L, mut(40 + 13, _ => 0x06))
    val all = Pcap.parsePcap(2L, good)
    assert(mixed == all.tail, "non-IPv4 packet skips; later packets keep their idx")
    // IP total-length corruption in a FULLY-captured packet is damage,
    // not truncation (the skip arm is only for incl < orig)
    assert(Pcap.parsePcapSafe(2L, mut(54 + 3, x => (x ^ 1).toByte)).isEmpty,
      "corrupted total_length in an untruncated packet quarantines")
    // UDP length cross-check: flip the UDP length LSB
    assert(Pcap.parsePcapSafe(2L, mut(54 + 20 + 5, x => (x ^ 1).toByte)).isEmpty,
      "UDP length mismatch")
    // incl_len > orig_len: bump incl_len (LE at 24+8)
    assert(Pcap.parsePcapSafe(2L, mut(24 + 8, x => (x + 1).toByte)).isEmpty,
      "incl_len > orig_len (and record straddle) is damage")
  }

  test("a record too short for the Ethernet+IPv4+UDP stack quarantines cleanly") {
    // review finding: a 34-byte record (headers only to the end of IPv4,
    // IP total = 20 so the length cross-check passes) previously read the
    // UDP header outside the record
    val out = new java.io.ByteArrayOutputStream()
    def le32(v: Long): Unit = (0 until 4).foreach(i => out.write(((v >>> (8 * i)) & 0xff).toInt))
    def le16(v: Int): Unit = { out.write(v & 0xff); out.write((v >> 8) & 0xff) }
    le32(0xa1b2c3d4L); le16(2); le16(4); le32(0); le32(0); le32(65535); le32(1)
    le32(1700000000L); le32(0); le32(34); le32(34)
    // 14-byte Ethernet with IPv4 ethertype
    (0 until 12).foreach(_ => out.write(0)); out.write(0x08); out.write(0x00)
    // 20-byte IPv4, total=20, proto=17, checksum valid
    val ip = new Array[Byte](20)
    ip(0) = 0x45; ip(3) = 20; ip(8) = 64; ip(9) = 17
    val cks = Pcap.ipv4Checksum(ip)
    ip(10) = ((cks >> 8) & 0xff).toByte; ip(11) = (cks & 0xff).toByte
    out.write(ip, 0, 20)
    assert(Pcap.parsePcapSafe(0L, out.toByteArray).isEmpty,
      "a headers-only record (no UDP bytes) is damage, not an out-of-record read")
  }

  test("the ones'-complement checksum implementation agrees with itself") {
    // a healthy header verifies to 0; a known RFC 1071 property: sum of
    // header with checksum field zeroed equals the stored checksum
    val pkt = Pcap.renderPacket(7L, 0)
    val hdr = java.util.Arrays.copyOfRange(pkt, 14, 34)
    val stored = ((hdr(10) & 0xff) << 8) | (hdr(11) & 0xff)
    val zeroed = hdr.clone()
    zeroed(10) = 0; zeroed(11) = 0
    assert(Pcap.ipv4Checksum(zeroed) == stored)
  }
}
