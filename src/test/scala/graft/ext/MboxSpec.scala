package graft.ext

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

class MboxSpec extends AnyFunSuite {
  private lazy val spark = SparkSpec.spark

  test("base64: both directions against java.util.Base64 across sizes") {
    val r = new scala.util.Random(0xb64L)
    for (len <- Seq(0, 1, 2, 3, 4, 57, 58, 100, 1000)) {
      val data = Array.fill(len)(r.nextInt(256).toByte)
      val ours = Mbox.b64Encode(data)
      // our encoder line-wraps at 76 chars, the MIME convention
      assert(ours.split("\n").forall(_.length <= 76))
      val jdk = java.util.Base64.getMimeDecoder.decode(ours)
      assert(jdk.sameElements(data), s"len=$len jdk decodes ours")
      assert(Mbox.b64Decode(ours).sameElements(data), s"len=$len we decode ours")
      val theirs = java.util.Base64.getMimeEncoder.encodeToString(data)
      assert(Mbox.b64Decode(theirs).sameElements(data), s"len=$len we decode jdk")
    }
    intercept[RuntimeException](Mbox.b64Decode("QUJ$"))
    intercept[RuntimeException](Mbox.b64Decode("QQ==QQ")) // data after padding
  }

  test("quoted-printable: round trip, soft breaks, line-start From escape, _-as-space") {
    val hazard = "equals = sign\nFrom the top\nplain tail"
    val enc = Mbox.qpEncode(hazard)
    assert(enc.contains("=3D") && enc.contains("=46rom"), enc)
    assert(Mbox.qpDecode(enc) == hazard)
    val long = ("x" * 200) + "=" + ("y" * 200)
    val encLong = Mbox.qpEncode(long)
    assert(encLong.split("\n").forall(_.length <= 76))
    assert(Mbox.qpDecode(encLong) == long)
    // RFC 2047 variant: underscore means space ONLY inside encoded words
    assert(Mbox.qpDecode("a_b", underscoreIsSpace = true) == "a b")
    assert(Mbox.qpDecode("a_b") == "a_b")
    intercept[RuntimeException](Mbox.qpDecode("=XY"))
  }

  test("RFC 2047 encoded words: Q and B forms, mixed with plain text") {
    assert(Mbox.decodeWords("=?utf-8?Q?amber_birch?=") == "amber birch")
    val b = java.util.Base64.getEncoder.encodeToString("cedar dune".getBytes("UTF-8"))
    assert(Mbox.decodeWords(s"=?utf-8?B?$b?=") == "cedar dune")
    assert(Mbox.decodeWords("plain stays") == "plain stays")
    assert(Mbox.decodeWords("pre =?utf-8?Q?mid?= post") == "pre mid post")
  }

  test("qpEncode: a wrap boundary can never put an unescaped 'From ' at a physical line start") {
    // sweep paddings so the 'F' lands on every position around the
    // 72-column wrap; the encoded body must never contain a physical
    // line starting "From " (the mboxrd message-start hazard)
    for (pad <- 60 to 80) {
      val body = ("x" * pad) + " From here onward and some trailing text to force wraps"
      val enc = Mbox.qpEncode(body)
      assert(!enc.split("\n", -1).exists(_.startsWith("From ")), s"pad=$pad\n$enc")
      assert(Mbox.qpDecode(enc) == body, s"pad=$pad round trip")
    }
  }

  test("CRLF archives parse: the canonical RFC 5322 line ending across all arms") {
    import spark.implicits._
    // ids 3, 10, 17, 24 hit the CRLF arm (id % 7 == 3) across transfer
    // arms 0, 1, 2, 0; the fixture end-to-end below covers them, but pin
    // the CRLF property explicitly
    val docs = Seq(3L, 10L, 17L, 24L).toDF("doc_id")
    val arch = Mbox.encodeMboxArchives(docs, nArchives = 1)
    val txts = arch.collect().map(_.getString(1))
    assert(txts.exists(_.contains("\r\n")), "CRLF serialization occurs")
    val out = Mbox.mboxExtract(arch).collect()
    assert(out.length == 4)
    out.foreach { e =>
      val body = Mbox.bodyFor(e.doc_id).getBytes("UTF-8")
      var c = 0L
      body.foreach(b => c = (c * 31 + (b & 0xff)) % 1000000007L)
      assert(e.checksum == c, s"doc ${e.doc_id} under CRLF")
    }
  }

  test("nested multipart: the text/plain leaf one level down is found past both decoys") {
    import spark.implicits._
    // id 2 and 14 hit the nested arm (id % 12 == 2)
    val out = Mbox.mboxExtract(Mbox.encodeMboxArchives(Seq(2L, 14L).toDF("doc_id"), nArchives = 1)).collect()
    assert(out.length == 2)
    out.foreach { e =>
      val body = Mbox.bodyFor(e.doc_id).getBytes("UTF-8")
      var c = 0L
      body.foreach(b => c = (c * 31 + (b & 0xff)) % 1000000007L)
      assert(e.checksum == c && e.n_bytes == body.length, s"doc ${e.doc_id} nested")
    }
  }

  test("end-to-end: all transfer arms, subjects, quoting recover the closed-form plane") {
    import spark.implicits._
    val docs = (0L until 120L).toDF("doc_id")
    val out = Mbox.mboxExtract(Mbox.encodeMboxArchives(docs, nArchives = 4)).collect()
    assert(out.length == 120)
    out.foreach { e =>
      val body = Mbox.bodyFor(e.doc_id)
      val bytes = body.getBytes("UTF-8")
      var c = 0L
      bytes.foreach(b => c = (c * 31 + (b & 0xff)) % 1000000007L)
      assert(e.checksum == c, s"doc ${e.doc_id} (arm ${e.doc_id % 3}) body")
      assert(e.n_bytes == bytes.length)
      assert(e.subject == Mbox.subjectFor(e.doc_id), s"doc ${e.doc_id} subject")
    }
    // every arm and hazard actually occurred
    assert((0L until 120L).exists(i => i % 3 == 2 && i % 4 == 0), "base64 + From-line combo")
    // msg order inside an archive is doc order
    out.groupBy(_.archive_id).foreach { case (_, es) =>
      val sorted = es.sortBy(_.msg_idx)
      assert(sorted.map(_.doc_id).toSeq == es.map(_.doc_id).sorted.toSeq)
    }
    val again = Mbox.mboxExtract(Mbox.encodeMboxArchives(docs.repartition(7), nArchives = 4)).collect()
    assert(again.map(e => (e.doc_id, e.checksum)).sorted.toSeq == out.map(e => (e.doc_id, e.checksum)).sorted.toSeq)
  }

  test("eml: all arms recover the .eml body plane; >From stays literal; envelope skipped") {
    import spark.implicits._
    val docs = (0L until 120L).toDF("doc_id")
    val files = Mbox.encodeEmlFiles(docs)
    // the export-envelope arm (id % 9 == 4) actually serializes
    assert(files.as[(Long, String)].collect().exists {
      case (id, t) => id % 9 == 4 && t.startsWith("From - ") }, "envelope arm occurs")
    // a raw 7bit body with a line-start 'From ' serializes UNquoted
    assert(files.as[(Long, String)].collect().exists {
      case (id, t) => id % 3 == 0 && id % 4 == 0 && t.contains("\nFrom here onward") },
      "eml 7bit bodies are not mboxrd-quoted")
    val out = Mbox.emlExtract(files).collect()
    assert(out.length == 120)
    out.foreach { e =>
      val bytes = Mbox.emlBodyFor(e.doc_id).getBytes("UTF-8")
      var c = 0L
      bytes.foreach(b => c = (c * 31 + (b & 0xff)) % 1000000007L)
      assert(e.checksum == c, s"doc ${e.doc_id} (arm ${e.doc_id % 3}) body")
      assert(e.n_bytes == bytes.length)
      assert(e.subject == Mbox.subjectFor(e.doc_id), s"doc ${e.doc_id} subject")
    }
    // the planted literal '>From ' line survives (a parser that unquotes
    // mboxrd in .eml mode would have produced 'From ' and a short body)
    assert((0L until 120L).exists(i => i % 4 == 0 && i % 3 == 0), ">From in a raw 7bit arm")
  }

  test("eml damage: bad base64, headless file, wrong doc id each quarantine alone") {
    import spark.implicits._
    val files = Mbox.encodeEmlFiles((0L until 24L).toDF("doc_id"))
      .as[(Long, String)].collect()
    val damaged = files.map { case (id, t) =>
      if (id == 2L) (id, t.replaceFirst("base64\n\n[A-Za-z0-9+/]", "base64\n\n!"))
      else if (id == 5L) (id, t.replace("\n\n", "\n")) // headers never end
      else if (id == 7L) (id, t.replace("X-Doc-Id: 7", "X-Doc-Id: 8"))
      else (id, t)
    }.toSeq.toDF("doc_id", "eml")
    val got = Mbox.emlExtract(damaged).collect().map(_.doc_id).toSet
    assert(!got.contains(2L) && !got.contains(5L) && !got.contains(7L))
    assert(got.size == 21, "undamaged files all survive")
  }

  test("damage quarantines the whole archive; other archives survive") {
    import spark.implicits._
    val docs = (0L until 80L).toDF("doc_id")
    val arch = Mbox.encodeMboxArchives(docs, nArchives = 4)
    val rows = arch.collect().map(r => (r.getLong(0), r.getString(1)))
    // corrupt archive 1: break a base64 body character into an illegal one
    val damaged = rows.map { case (aid, m) =>
      if (aid == 1L) (aid, m.replaceFirst("base64\n\n[A-Za-z0-9+/]", "base64\n\n!")) else (aid, m)
    }.toSeq.toDF("archive_id", "mbox")
    val after = Mbox.mboxExtract(damaged).collect()
    assert(!after.exists(_.archive_id == 1L), "damaged archive fully quarantined")
    assert(after.count(_.archive_id == 0L) == 20 && after.count(_.archive_id == 2L) == 20)
    // a message whose headers never terminate also kills its archive
    val headless = rows.map { case (aid, m) =>
      if (aid == 2L) (aid, m.replace("\n\n", "\n")) else (aid, m)
    }.toSeq.toDF("archive_id", "mbox")
    val after2 = Mbox.mboxExtract(headless).collect()
    assert(!after2.exists(_.archive_id == 2L))
  }
}
