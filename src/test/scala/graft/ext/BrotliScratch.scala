package graft.ext

/** Throwaway debug driver (not a test). */
object BrotliScratch {
  def main(args: Array[String]): Unit = {
    val name = if (args.nonEmpty) args(0) else "english50k_q5"
    def resource(path: String): Array[Byte] = {
      val in = getClass.getResourceAsStream(path)
      val out = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](8192)
      var n = in.read(buf)
      while (n >= 0) { out.write(buf, 0, n); n = in.read(buf) }
      in.close()
      out.toByteArray
    }
    val br = resource(s"/graft/brotli/$name.br")
    val got = Brotli.decompress(br, 1 << 26)
    println(s"decoded ${got.length}")
    println("first 120 bytes: " + new String(got.take(120), "UTF-8").replace("\n", "\\n"))
    java.nio.file.Files.write(java.nio.file.Paths.get(s"/tmp/brotli_$name.out"), got)
  }
}
