package graft.ext

import org.scalatest.funsuite.AnyFunSuite

class DicomSpec extends AnyFunSuite {

  test("round-trip: every fixture object recovers its closed forms") {
    for (id <- 0L until 96L) {
      val r = Dicom.parseDicom(id, Dicom.renderDicom(id))
      assert(r.n_meta == 6 && r.n_elements == 10, s"dicom $id shape")
      assert(r.transfer_syntax == "1.2.840.10008.1.2.1", s"dicom $id ts")
      assert(r.sop_class == "1.2.840.10008.5.1.4.1.1.2", s"dicom $id class")
      assert(r.sop_instance == Dicom.sopInstanceOf(id), s"dicom $id instance")
      assert(r.study_date == Dicom.studyDateOf(id), s"dicom $id date")
      assert(r.modality == Dicom.modalityOf(id), s"dicom $id modality")
      assert(r.patient_name == Dicom.patientNameOf(id), s"dicom $id name")
      assert(r.patient_id == Dicom.patientIdOf(id), s"dicom $id pid")
      assert(r.series_number == Dicom.seriesNumberOf(id), s"dicom $id series")
      assert(r.n_rows == 2 && r.n_cols == Dicom.colsOf(id), s"dicom $id geometry")
      assert(r.pixel_spacing == Dicom.pixelSpacingOf(id), s"dicom $id spacing")
      assert(r.n_seq_items == Dicom.nSeqItemsOf(id) &&
        r.seq_refs == (0 until Dicom.nSeqItemsOf(id)).map(Dicom.seqRefOf(id, _)).mkString(","),
        s"dicom $id sequence")
      assert(r.pixel_len == Dicom.pixelLenOf(id), s"dicom $id pixel len")
      var cks = 0L
      Dicom.pixelsOf(id).foreach(x => cks = (cks * 31 + (x & 0xff)) % 1000000007L)
      assert(r.pixel_checksum == cks, s"dicom $id pixel checksum")
    }
  }

  test("preamble and magic rules") {
    val good = Dicom.renderDicom(1L)
    def mut(at: Int, v: Byte): Array[Byte] = { val b = good.clone(); b(at) = v; b }
    assert(Dicom.parseDicomSafe(1L, good).nonEmpty)
    assert(Dicom.parseDicomSafe(1L, mut(0, 1)).isEmpty, "non-zero preamble")
    assert(Dicom.parseDicomSafe(1L, mut(128, 'X'.toByte)).isEmpty, "wrong magic")
    assert(Dicom.parseDicomSafe(1L, good.take(130)).isEmpty, "truncated header")
    assert(Dicom.parseDicomSafe(1L, good ++ Array[Byte](0, 0)).isEmpty, "trailing garbage")
  }

  test("meta group rules: group length exact, transfer syntax pinned") {
    val good = Dicom.renderDicom(2L)
    // GroupLength value sits after 132 (tag+VR+len16 = 8 bytes header)
    val glValue = 132 + 8
    def mut(at: Int, v: Byte): Array[Byte] = { val b = good.clone(); b(at) = v; b }
    assert(Dicom.parseDicomSafe(2L, mut(glValue, (good(glValue) + 2).toByte)).isEmpty,
      "group length must cover group 0002 exactly")
    // flip the transfer syntax's last digit (1.2.840.10008.1.2.1 -> .2):
    // implicit-VR little endian must quarantine, not misparse
    val ts = "1.2.840.10008.1.2.1".getBytes("US-ASCII")
    val at = good.indexOfSlice(ts)
    assert(at > 0)
    val impl = good.clone()
    impl(at + ts.length - 2) = '2' // -> 1.2.840.10008.1.2.2 (then NUL pad)
    assert(Dicom.parseDicomSafe(2L, impl).isEmpty, "foreign transfer syntax quarantines")
  }

  test("element rules: even lengths, ascending order, unknown VRs") {
    val good = Dicom.renderDicom(3L)
    def parses(b: Array[Byte]): Boolean = Dicom.parseDicomSafe(3L, b).nonEmpty
    // find the DA element (0008,0020): tag bytes 08 00 20 00 then 'DA'
    val daTag = Array[Byte](0x08, 0x00, 0x20, 0x00, 'D', 'A')
    val at = good.indexOfSlice(daTag)
    assert(at > 0)
    // odd declared length
    val odd = good.clone()
    odd(at + 6) = 7 // length LSB: 8 -> 7
    assert(!parses(odd), "odd value length is damage")
    // unknown VR code
    val badVr = good.clone()
    badVr(at + 4) = 'Q'.toByte
    assert(!parses(badVr), "unknown VR is damage")
    // break the ascent: rewrite the DA tag as (0030,0020), which lands
    // after (0008,0060) and collides with the order rule downstream
    val reord = good.clone()
    reord(at + 1) = 0x30
    assert(!parses(reord), "non-ascending elements are damage")
  }

  test("sequence rules: item tag, defined lengths, geometry cross-check") {
    val good = Dicom.renderDicom(4L)
    def parses(b: Array[Byte]): Boolean = Dicom.parseDicomSafe(4L, b).nonEmpty
    // the item tag FFFE,E000 little-endian: FE FF 00 E0
    val itemTag = Array[Byte](0xfe.toByte, 0xff.toByte, 0x00, 0xe0.toByte)
    val at = good.indexOfSlice(itemTag)
    assert(at > 0)
    val badItem = good.clone()
    badItem(at + 2) = 0x01 // FFFE,E001
    assert(!parses(badItem), "wrong item tag is damage")
    // undefined item length (0xFFFFFFFF)
    val undef = good.clone()
    (0 until 4).foreach(i => undef(at + 4 + i) = 0xff.toByte)
    assert(!parses(undef), "undefined lengths are out of scope")
    // shrink Columns so PixelData no longer matches Rows*Cols*2
    val colsTag = Array[Byte](0x28, 0x00, 0x11, 0x00, 'U', 'S')
    val ct = good.indexOfSlice(colsTag)
    assert(ct > 0)
    val shrunk = good.clone()
    shrunk(ct + 8) = (good(ct + 8) + 1).toByte
    assert(!parses(shrunk), "geometry/pixel-length mismatch is damage")
  }
}
