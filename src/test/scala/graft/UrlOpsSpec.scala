package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.UrlOps

/** URL canonicalization (operators/UrlOps). */
class UrlOpsSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  import spark.implicits._

  private def norm(u: String): String =
    Seq(Tuple1(u)).toDF("u")
      .select(UrlOps.normalizeUrl(col("u"))).collect().head.getString(0)
  private def host(u: String): String =
    Seq(Tuple1(u)).toDF("u")
      .select(UrlOps.hostOf(col("u"))).collect().head.getString(0)
  private def dom(u: String): String =
    Seq(Tuple1(u)).toDF("u")
      .select(UrlOps.registeredDomainOf(col("u")))
      .collect().head.getString(0)

  test("normalizeUrl: fragment, utm, default port, case, slash") {
    assert(norm("HTTPS://Example.COM:443/Path/A?utm_source=x&q=1#Frag")
      === "https://example.com/Path/A?q=1")
    // path/query case is significant and kept
    assert(norm("http://X.com/CaseKept?Q=Mixed")
      === "http://x.com/CaseKept?Q=Mixed")
    // root slash trims to the bare authority
    assert(norm("http://x.com:80/") === "http://x.com")
  }

  test("utm stripping: middle, end, only param, repeated — global, " +
      "case-insensitive, separator-anchored") {
    assert(norm("http://x.com/p?utm_a=1&b=2") === "http://x.com/p?b=2")
    assert(norm("http://x.com/p?b=2&utm_a=1") === "http://x.com/p?b=2")
    assert(norm("http://x.com/p?utm_a=1") === "http://x.com/p")
    assert(norm("http://x.com/p?utm_a=1&utm_b=2&c=3")
      === "http://x.com/p?c=3")
    // uppercase tracking params are the same params
    assert(norm("http://x.com/p?UTM_SOURCE=news&q=1")
      === "http://x.com/p?q=1")
    // a param merely CONTAINING utm_ mid-name has no [?&] before it
    assert(norm("http://x.com/p?xutm_a=1") === "http://x.com/p?xutm_a=1")
    assert(norm("http://x.com/p?my-utm_a=1") === "http://x.com/p?my-utm_a=1")
    // utm_ inside a PATH segment is never query-anchored → untouched
    assert(norm("http://x.com/docs/utm_source=guide")
      === "http://x.com/docs/utm_source=guide")
    // utm_ inside another param's VALUE is not after a separator
    assert(norm("http://x.com/p?q=what+is+utm_source=x&lang=en")
      === "http://x.com/p?q=what+is+utm_source=x&lang=en")
  }

  test("ports: only the scheme's OWN default is stripped, on the " +
      "authority only") {
    assert(norm("http://x.com:8080/a") === "http://x.com:8080/a")
    assert(norm("https://x.com:443") === "https://x.com")
    assert(norm("http://x.com:80/a") === "http://x.com/a")
    // cross-scheme: https on 80 / http on 443 are DIFFERENT origins
    assert(norm("https://x.com:80/a") === "https://x.com:80/a")
    assert(norm("http://x.com:443/a") === "http://x.com:443/a")
    // a :80/ inside the PATH is untouched (authority-anchored strip)
    assert(norm("http://x.com/redir/:80/deep")
      === "http://x.com/redir/:80/deep")
  }

  test("the query string is never edited beyond utm removal") {
    // a slash ending a query VALUE is content, not a trailing slash
    assert(norm("http://x.com/p?redirect=/home/")
      === "http://x.com/p?redirect=/home/")
    // but a trailing PATH slash before the query still trims
    assert(norm("http://x.com/p/?q=1") === "http://x.com/p?q=1")
    // a '?' inside a value survives the separator healing
    assert(norm("http://x.com/p?q=a?&utm_a=1") === "http://x.com/p?q=a?")
    // dangling '?' and empty-param '&' heal away
    assert(norm("http://x.com/p?") === "http://x.com/p")
    assert(norm("http://x.com/p?a=1&") === "http://x.com/p?a=1")
  }

  test("hostOf and registeredDomainOf: userinfo, ports, naive PSL") {
    assert(host("https://User@Sub.Example.com:8443/p")
      === "sub.example.com")
    // userinfo containing '@' (obfuscation shape): host is after the
    // LAST '@'
    assert(host("http://a@b@c.com/x") === "c.com")
    assert(dom("https://a.b.example.com/x") === "example.com")
    // documented naive form: no public-suffix list, co.uk collapses
    assert(dom("https://shop.example.co.uk/") === "co.uk")
    // schemeless input: no authority match → empty host/domain
    assert(host("example.com/x") === "")
  }

  test("domainBlockVerdicts: dot-suffix law — equality and subdomain " +
      "block, label lookalikes don't, longest entry wins, null host " +
      "and unlisted hosts verdict unblocked") {
    val hosts = Seq(
      (1L, "example3.com"),           // equality hit
      (2L, "a.b.example3.com"),       // deep subdomain hit
      (3L, "cdn.example3.com"),       // two entries match → longest
      (4L, "notexample3.com"),        // NOT a label suffix — clean
      (5L, "example99.com"),          // unlisted — clean
      (6L, null.asInstanceOf[String]) // null host — clean
    ).toDF("id", "host")
    val bl = Seq("example3.com", "cdn.example3.com").toDF("dom")
    val out = UrlOps.domainBlockVerdicts(hosts, "id", "host", bl, "dom")
      .collect().map(r => r.getLong(0) ->
        ((Option(r.getString(2)), r.getBoolean(3)))).toMap
    assert(out(1L) === ((Some("example3.com"), true)))
    assert(out(2L) === ((Some("example3.com"), true)))
    assert(out(3L) === ((Some("cdn.example3.com"), true)))
    assert(out(4L) === ((None, false)))
    assert(out(5L) === ((None, false)))
    assert(out(6L) === ((None, false)))
    assert(out.size === 6, "every input row verdicts exactly once")
  }

  test("r17 pass-8 regressions: a trailing-dot FQDN cannot evade the " +
      "blocklist (hostOf strips the DNS root dot) and mixed-case / " +
      "padded blocklist entries match the lowercased host") {
    import graft.operators.UrlOps
    val host = Seq(Tuple1("http://sub.Example.com./x")).toDF("u")
      .select(UrlOps.hostOf(col("u")).as("h")).collect().head.getString(0)
    assert(host === "sub.example.com")
    val docs = Seq((1L, "sub.example.com"), (2L, "clean.org"))
      .toDF("id", "host")
    val bl = Seq(Tuple1(" Example.COM ")).toDF("dom")
    val got = UrlOps.domainBlockVerdicts(docs, "id", "host", bl, "dom")
      .collect().map(r => r.getLong(0) -> r.getBoolean(3)).toMap
    assert(got === Map(1L -> true, 2L -> false))
  }

  test("r18 ADVICE regression: a RUN of trailing dots strips — " +
      "'example.com..' cannot evade the suffix chain either") {
    import graft.operators.UrlOps
    val hosts = Seq(
      "http://sub.Example.com../x",   // double root dot
      "http://Example.com..../y"      // four of them
    ).map(Tuple1(_)).toDF("u")
      .select(UrlOps.hostOf(col("u")).as("h"))
      .collect().map(_.getString(0)).toSeq
    assert(hosts === Seq("sub.example.com", "example.com"))
  }
}
