package graft.ext

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

class UrlSpec extends AnyFunSuite {
  private lazy val spark = SparkSpec.spark

  test("normalizeEscapes: unreserved decode, reserved uppercase, stray '%' literal") {
    assert(Url.normalizeEscapes("%41%62%2d%7e") == "Ab-~") // ALPHA, '-', '~' decode
    assert(Url.normalizeEscapes("%2f%3A%3f") == "%2F%3A%3F") // '/', ':', '?' stay encoded, upper hex
    assert(Url.normalizeEscapes("100%zz%4") == "100%zz%4") // malformed escapes pass through
    assert(Url.normalizeEscapes("%e2%82%ac") == "%E2%82%AC") // non-ASCII bytes stay encoded
  }

  test("removeDotSegments: the RFC 3986 5.2.4 cases") {
    assert(Url.removeDotSegments("/a/b/c/./../../g") == "/a/g")
    assert(Url.removeDotSegments("/zz/../x/y") == "/x/y")
    assert(Url.removeDotSegments("/a/./b") == "/a/b")
    assert(Url.removeDotSegments("/a/b/..") == "/a/")
    assert(Url.removeDotSegments("/a/b/.") == "/a/b/")
    assert(Url.removeDotSegments("/../a") == "/a") // leading .. cannot climb above root
    assert(Url.removeDotSegments("/a//b") == "/a//b") // empty segments preserved
  }

  test("normalizeOne: decorations cancel; genuine differences survive") {
    def n(u: String) = Url.normalizeOne(1L, u)
    assert(n("HTTP://WWW.Example.COM:80/a/./b?x=1#frag").url_norm ==
      "http://www.example.com/a/b?x=1")
    assert(n("https://h.io:443/p").url_norm == "https://h.io/p")
    assert(n("https://h.io:8443/p").url_norm == "https://h.io:8443/p") // non-default port kept
    assert(n("http://h.io").url_norm == "http://h.io/") // empty path -> "/"
    assert(n("http://h.io/%61%2Fb").url_norm == "http://h.io/a%2Fb")
    assert(n("http://h.io/p?b=2&a=1").url_norm == "http://h.io/p?a=1&b=2") // param sort
    assert(n("http://h.io/p").query == null) // absent query stays absent
    val r = n("http://h.io:8080/x?z=9")
    assert((r.scheme, r.host, r.port, r.path, r.query) == (("http", "h.io", 8080L, "/x", "z=9")))
  }

  test("normalizeOne: malformed inputs yield null fields, never throw") {
    Seq("no-scheme-here", "://host/p", "http://", "http://:80/p", "http://h.io:8a/p", null)
      .foreach { u =>
        val r = Url.normalizeOne(7L, u)
        assert(r.url_norm == null, s"'$u' must not normalize")
        assert(r.doc_id == 7L)
      }
  }

  test("fixture round-trip: normalization recovers the independently derived canonical form") {
    import spark.implicits._
    val ids = (0L until 400L).toDF("doc_id")
    val got = Url.normalize(Url.attachUrls(ids)).collect().map(r => r.doc_id -> r).toMap
    val hostA = Array("alpha", "beta", "gamma", "delta")
    val hostB = Array("example", "testsite")
    val tlds = Array("com", "org", "net", "io")
    val words = Array("data", "files", "api", "docs", "img", "posts", "user", "item")
    def md5Hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
    (0L until 400L).foreach { id =>
      val m = md5Hex(s"u:$id")
      def nib(i: Int) = Integer.parseInt(m.substring(i - 1, i), 16)
      def byte2(i: Int) = Integer.parseInt(m.substring(i - 1, i + 1), 16)
      val scheme = if (id % 2 == 0) "http" else "https"
      val host = s"${hostA(nib(1) % 4)}.${hostB(nib(2) % 2)}.${tlds(nib(3) % 4)}"
      val port = nib(6) % 4 match { case 2 => 8080L; case 3 => 9443L; case _ => -1L }
      val path = s"/${words(nib(4) % 8)}/${words(nib(5) % 8)}${id % 100}"
      val qb = byte2(9)
      val query = s"a=${byte2(7)}&b=$qb" + (if (qb % 2 == 0) "%2F" else "")
      val want = scheme + "://" + host + (if (port >= 0) s":$port" else "") + path + "?" + query
      assert(got(id).url_norm == want, s"id $id")
      assert(got(id).port == port && got(id).host == host && got(id).path == path)
    }
    // the fixture must actually exercise every decoration arm
    val variants = (0L until 400L).map { id =>
      val m = md5Hex(s"u:$id"); (Integer.parseInt(m.substring(12, 13), 16) % 3,
        Integer.parseInt(m.substring(5, 6), 16) % 4, id % 3 == 0, id % 5 == 0)
    }
    assert(variants.map(_._1).toSet == Set(0, 1, 2), "all path decorations hit")
    assert(variants.map(_._2).toSet == Set(0, 1, 2, 3), "all port arms hit")
    assert(variants.exists(_._3) && variants.exists(_._4), "case decorations hit")
  }
}
