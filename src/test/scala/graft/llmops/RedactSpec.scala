package graft.llmops

import graft.SparkSpec

class RedactSpec extends SparkSpec {
  import spark.implicits._

  test("redact replaces emails, urls and ips; leaves clean text alone") {
    val got = Seq(
      "mail a.b-c+1@foo.co.uk now",
      "see https://x.org/a?b=1 and http://y.io",
      "host 192.168.0.1 up",
      "nothing to scrub here").toDF("t")
      .select(TextAnalysis.redact($"t").as("v")).as[String].collect().toSeq
    assert(got(0) == "mail <EMAIL> now")
    assert(got(1) == "see <URL> and <URL>")
    assert(got(2) == "host <IP> up")
    assert(got(3) == "nothing to scrub here")
  }
}
