package graft.ext

import org.scalatest.funsuite.AnyFunSuite

class ClassFileSpec extends AnyFunSuite {

  test("round-trip: pool walk + member inventory recover the closed forms") {
    for (id <- 0L until 96L) {
      val m = ClassFile.parseClass(id, ClassFile.renderClass(id))
      assert(m.class_name == ClassFile.classNameOf(id), s"cls $id name")
      assert(m.super_name == "java.lang.Object", s"cls $id super")
      assert(m.major_version == 61, s"cls $id major")
      assert(m.n_cp == 12 + ClassFile.nFieldsOf(id), s"cls $id pool (incl. the Long ghost)")
      assert(m.n_fields == ClassFile.nFieldsOf(id), s"cls $id fields")
      assert(m.n_methods == 1 && m.n_interfaces == 0, s"cls $id members")
      assert(m.source_file == ClassFile.sourceFileOf(id), s"cls $id source")
      assert(m.answer_const == ClassFile.answerOf(id), s"cls $id bytecode constant")
      assert(m.long_const == ((id * 2654435761L) & 0xffffffffL), s"cls $id long constant")
    }
    assert((0L until 96L).exists(ClassFile.nFieldsOf(_) == 0), "zero-field arm occurs")
  }

  test("foreign differential: the JVM loads, verifies, reflects, and EXECUTES the bytecode") {
    final class Loader extends ClassLoader(null) {
      def define(b: Array[Byte]): Class[_] = defineClass(null, b, 0, b.length)
    }
    for (id <- Seq(0L, 1L, 5L, 17L, 42L)) {
      val bytes = ClassFile.renderClass(id)
      val cls = new Loader().define(bytes)
      assert(cls.getName == ClassFile.classNameOf(id), s"cls $id name via JVM")
      assert(cls.getSuperclass == classOf[Object], s"cls $id super via JVM")
      assert(cls.getDeclaredFields.length == ClassFile.nFieldsOf(id), s"cls $id fields via JVM")
      val m = cls.getDeclaredMethod("answer")
      // the JVM verifier has accepted our Code attribute; now it RUNS it
      assert(m.invoke(null) == ClassFile.answerOf(id), s"cls $id executed bytecode")
    }
  }

  test("real-world conformance: the reader walks classes from the Scala library jar") {
    // foreign-writer check: scalac-produced classes (rich pools: refs,
    // NameAndType, InvokeDynamic, inner classes) must parse, with names
    // agreeing with their jar paths
    val src = classOf[scala.Option[_]].getProtectionDomain.getCodeSource
    assert(src != null, "scala-library jar location must resolve")
    val jar = new java.util.jar.JarFile(new java.io.File(src.getLocation.toURI))
    try {
      val entries = jar.stream().filter(e => e.getName.endsWith(".class") &&
        !e.getName.contains("module-info")).limit(200)
      var n = 0
      entries.forEach { e =>
        val in = jar.getInputStream(e)
        val bytes = in.readAllBytes()
        in.close()
        val m = ClassFile.parseClass(n.toLong, bytes)
        val expected = e.getName.stripSuffix(".class").replace('/', '.')
        assert(m.class_name == expected, s"${e.getName} parsed name")
        assert(m.n_cp > 0 && m.major_version >= 45)
        n += 1
      }
      assert(n == 200, "two hundred foreign classes walked")
    } finally jar.close()
  }

  test("damage ladder: magic, bad tag, index out of pool, truncation, trailing bytes") {
    val id = 7L
    val good = ClassFile.renderClass(id)
    def mut(at: Int, v: Byte): Array[Byte] = { val b = good.clone(); b(at) = v; b }
    assert(ClassFile.parseClassSafe(id, mut(0, 0.toByte)).isEmpty, "magic")
    assert(ClassFile.parseClassSafe(id, mut(10, 99.toByte)).isEmpty, "undefined pool tag")
    assert(ClassFile.parseClassSafe(id, good.take(20)).isEmpty, "truncation")
    assert(ClassFile.parseClassSafe(id, good ++ Array[Byte](0)).isEmpty, "trailing garbage")
    assert(ClassFile.parseClassSafe(id, Array.emptyByteArray).isEmpty)
  }

  test("operator: damaged class quarantines alone (Spark)") {
    val spark = graft.SparkSpec.spark
    import spark.implicits._
    val docs = (0L until 24L).map(Tuple1(_)).toDF("doc_id")
    val mixed = ClassFile.encodeClasses(docs).as[(Long, Array[Byte])].map { case (id, b) =>
      if (id == 8L) (id, b.take(b.length - 2)) else (id, b)
    }.toDF("doc_id", "clazz")
    val got = ClassFile.classMeta(mixed).collect()
    assert(!got.exists(_.doc_id == 8L))
    assert(got.length == 23)
  }
}
