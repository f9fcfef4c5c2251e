package graft.ext

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Every registered kernel must resolve from plain SQL — the extension
  * surface a spark.sql user sees. A registration regression (rename, lost
  * injectFunction) fails here before any operator notices. */
class ExtensionsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val calls = Seq(
    "parse_kv('ab1.0')",
    "parse_kv_fields('ab1.0', array('a'))",
    "vec_dot(array(1.0D, 2.0D), array(3.0D, 4.0D))",
    "tokens_ws('a b')",
    "count_in(array('a','b'), array('a'))",
    "jaccard(array('a'), array('a'))",
    "intersect_count(array(1L), array(1L))",
    "rolling_fingerprint('some document text here')",
    "simhash64(array('tok'))",
    "minhash32(array('tok'), 4, 42L)",
    "shingles_k('a b c', 2)",
    "media_meta(to_binary('89504E47', 'hex'))")

  test("all graft kernels are callable from SQL") {
    calls.foreach { c =>
      val row = spark.sql(s"SELECT $c AS v").head()
      assert(!row.anyNull || c.startsWith("media_meta"), s"null result for $c")
    }
  }

  test("expression info is attached (DESCRIBE FUNCTION works)") {
    Seq("parse_kv", "vec_dot", "minhash32", "media_meta").foreach { f =>
      val desc = spark.sql(s"DESCRIBE FUNCTION $f").collect().map(_.getString(0))
      assert(desc.exists(_.contains(f)), s"no function info for $f")
    }
  }
}
