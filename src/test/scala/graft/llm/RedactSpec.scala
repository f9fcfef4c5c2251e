package graft.llm

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class RedactSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def run(text: String): (String, Map[String, Long]) = {
    val df = Seq(Tuple1(text)).toDF("t")
    val cnts = Redact.counts(col("t"))
    val row = df.select(Redact.scrub(col("t")).as("s") +:
      cnts.map { case (cat, c) => c.as(s"n_$cat") }: _*).head()
    (row.getString(0),
      Redact.Rules.map(_._1).zipWithIndex
        .map { case (cat, i) => cat -> row.getLong(i + 1) }.toMap)
  }

  test("each category redacts and counts") {
    val (s, n) = run("mail bob.smith+x@corp.example.com or visit " +
      "https://a.example.com/p?q=1 from 192.168.0.1 call +84-123-456-7890 ok")
    assert(s === "mail <EMAIL> or visit <URL> from <IP> call <PHONE> ok")
    assert(n === Map("url" -> 1L, "email" -> 1L, "ip" -> 1L, "phone" -> 1L))
  }

  test("order of application: a URL consumes the email and IP inside it") {
    val (s, n) = run("see https://h.example.com/a@b.cc/10.0.0.1 and a@b.cc")
    assert(s === "see <URL> and <EMAIL>")
    assert(n("url") === 1L && n("email") === 1L && n("ip") === 0L)
  }

  test("IPv4 word boundaries: no partial match inside longer numerics") {
    val (s, n) = run("bad 999.1.1.1 octet but 8.8.8.8 is real")
    assert(n("ip") === 1L)
    assert(s.contains("999.1.1.1") && s.contains("<IP>"))
  }

  test("clean text passes through untouched") {
    val (s, n) = run("the quick brown fox at noon")
    assert(s === "the quick brown fox at noon")
    assert(n.values.forall(_ === 0L))
  }
}
