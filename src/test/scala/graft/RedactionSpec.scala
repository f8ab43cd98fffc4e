package graft

import org.apache.spark.sql.functions._

import graft.text.TextStats

/** PII redaction (q67): planted PII is scrubbed and counted exactly. */
class RedactionSpec extends SparkSpec {
  import spark.implicits._

  test("emails, urls and ips are replaced with placeholders and counted") {
    val docs = Seq(
      (1L, "contact alice.smith+dev@example.co.uk or see https://example.com/x?y=1 from 10.0.0.1"),
      (2L, "no pii here just plain prose"),
      (3L, "two mails a@b.io c@d.org and ips 192.168.1.1 8.8.8.8"))
      .toDF("doc_id", "text")
    val got = TextStats.redactPii(docs, "text")
      .select($"doc_id", $"n_email", $"n_url", $"n_ip", $"redacted")
      .as[(Long, Long, Long, Long, String)].collect().sortBy(_._1)

    assert(got(0)._2 == 1 && got(0)._3 == 1 && got(0)._4 == 1)
    assert(got(0)._5 == "contact <EMAIL> or see <URL> from <IP>")
    assert(got(1) == ((2L, 0L, 0L, 0L, "no pii here just plain prose")))
    assert(got(2)._2 == 2 && got(2)._4 == 2)
    assert(got(2)._5 == "two mails <EMAIL> <EMAIL> and ips <IP> <IP>")
  }

  test("redaction order is stable: an email inside a url is absorbed by the email pass first") {
    val got = TextStats.redactPii(
        Seq((1L, "see https://x.org/u?mail=a@b.com end")).toDF("doc_id", "text"), "text")
      .select($"redacted").as[String].head()
    // email replaced first (inside the url), then the remaining url text
    assert(!got.contains("a@b.com") && !got.contains("https://"))
  }
}
