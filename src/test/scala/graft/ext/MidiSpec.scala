package graft.ext

import org.scalatest.funsuite.AnyFunSuite

class MidiSpec extends AnyFunSuite {

  test("round-trip: every fixture file recovers its closed forms") {
    for (id <- 0L until 96L) {
      val r = Midi.parseMidi(id, Midi.renderMidi(id))
      val nn = Midi.nNotesOf(id)
      assert(r.format == 1 && r.n_tracks == 2, s"midi $id shape")
      assert(r.division == Midi.divisionOf(id), s"midi $id division")
      assert(r.tempo_us == Midi.tempoOf(id), s"midi $id tempo")
      assert(r.track_name == Midi.trackNameOf(id), s"midi $id name")
      assert(r.n_note_on == nn && r.n_note_off == nn, s"midi $id notes")
      val ticks = (0 until nn).map(Midi.deltaOf(id, _).toLong).sum + 60L * nn
      assert(r.total_ticks == ticks, s"midi $id ticks")
      var cks = 0L
      def f(x: Long): Unit = cks = (cks * 31 + x) % 1000000007L
      (0 until nn).foreach { n =>
        f(Midi.deltaOf(id, n).toLong); f(Midi.keyOf(id, n).toLong); f(Midi.velOf(id, n).toLong)
        f(60L); f(Midi.keyOf(id, n).toLong); f(if (n == nn - 1) 0x40L else 0L)
      }
      assert(r.notes_checksum == cks, s"midi $id checksum")
    }
  }

  test("header rules: magic, length 6, track-count cross-check, SMPTE") {
    val good = Midi.renderMidi(1L)
    def mut(at: Int, v: Byte): Array[Byte] = { val b = good.clone(); b(at) = v; b }
    assert(Midi.parseMidiSafe(1L, mut(0, 'X'.toByte)).isEmpty, "wrong magic")
    assert(Midi.parseMidiSafe(1L, mut(7, 8)).isEmpty, "MThd length must be 6")
    assert(Midi.parseMidiSafe(1L, mut(11, 3)).isEmpty, "declared tracks must match chunks")
    assert(Midi.parseMidiSafe(1L, mut(12, 0x80.toByte)).isEmpty, "SMPTE division out of scope")
    assert(Midi.parseMidiSafe(1L, good.dropRight(1)).isEmpty, "truncation")
    assert(Midi.parseMidiSafe(1L, good ++ Array[Byte](0)).isEmpty, "trailing garbage")
  }

  test("running status and VLQ rules") {
    // hand-built single-track file helper
    def smf(track: Array[Byte]): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream()
      out.write("MThd".getBytes("US-ASCII")); out.write(Array[Byte](0, 0, 0, 6))
      out.write(Array[Byte](0, 0)) // format 0
      out.write(Array[Byte](0, 1))
      out.write(Array[Byte](0, 96))
      out.write("MTrk".getBytes("US-ASCII"))
      (3 to 0 by -1).foreach(i => out.write((track.length >> (8 * i)) & 0xff))
      out.write(track, 0, track.length)
      out.toByteArray
    }
    def B(xs: Int*): Array[Byte] = xs.map(_.toByte).toArray
    val tempo = B(0x00, 0xff, 0x51, 0x03, 0x07, 0xa1, 0x20)
    val eot = B(0x00, 0xff, 0x2f, 0x00)
    assert(Midi.parseMidiSafe(0L, smf(tempo ++ B(0x00, 0x90, 60, 64, 0x00, 62, 64) ++ eot)).nonEmpty,
      "running status accepted")
    assert(Midi.parseMidiSafe(0L, smf(tempo ++ B(0x00, 60, 64) ++ eot)).isEmpty,
      "data byte with no prior status")
    // meta events cancel running status
    assert(Midi.parseMidiSafe(0L,
      smf(tempo ++ B(0x00, 0x90, 60, 64) ++ B(0x00, 0xff, 0x03, 0x01, 'x') ++ B(0x00, 62, 64) ++ eot)).isEmpty,
      "running status does not survive a meta event")
    // non-minimal VLQ 0x80 0x00
    assert(Midi.parseMidiSafe(0L, smf(tempo ++ B(0x80, 0x00, 0x90, 60, 64) ++ eot)).isEmpty,
      "non-minimal VLQ is damage")
    // tempo meta with wrong length
    assert(Midi.parseMidiSafe(0L, smf(B(0x00, 0xff, 0x51, 0x02, 0x07, 0xa1) ++ eot)).isEmpty,
      "tempo length must be 3")
    // missing end-of-track
    assert(Midi.parseMidiSafe(0L, smf(tempo ++ B(0x00, 0x90, 60, 64))).isEmpty,
      "EOT required")
    // events after end-of-track
    assert(Midi.parseMidiSafe(0L, smf(tempo ++ eot ++ B(0x00, 0x90, 60, 64))).isEmpty,
      "nothing may follow EOT")
    // data byte with the high bit set
    assert(Midi.parseMidiSafe(0L, smf(tempo ++ B(0x00, 0x90, 0x90, 64) ++ eot)).isEmpty,
      "data bytes must be < 0x80")
  }
}
