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

  test("utm stripping: middle, end, only param, repeated — global") {
    assert(norm("http://x.com/p?utm_a=1&b=2") === "http://x.com/p?b=2")
    assert(norm("http://x.com/p?b=2&utm_a=1") === "http://x.com/p?b=2")
    assert(norm("http://x.com/p?utm_a=1") === "http://x.com/p")
    assert(norm("http://x.com/p?utm_a=1&utm_b=2&c=3")
      === "http://x.com/p?c=3")
    // a param merely CONTAINING utm_ mid-name is not at a word
    // boundary and survives
    assert(norm("http://x.com/p?xutm_a=1") === "http://x.com/p?xutm_a=1")
  }

  test("ports: defaults stripped on the authority only; others kept") {
    assert(norm("http://x.com:8080/a") === "http://x.com:8080/a")
    assert(norm("https://x.com:443") === "https://x.com")
    // a :80/ inside the PATH is untouched (authority-anchored strip)
    assert(norm("http://x.com/redir/:80/deep")
      === "http://x.com/redir/:80/deep")
  }

  test("hostOf and registeredDomainOf: userinfo, ports, naive PSL") {
    assert(host("https://User@Sub.Example.com:8443/p")
      === "sub.example.com")
    assert(dom("https://a.b.example.com/x") === "example.com")
    // documented naive form: no public-suffix list, co.uk collapses
    assert(dom("https://shop.example.co.uk/") === "co.uk")
    // schemeless input: no authority match → empty host/domain
    assert(host("example.com/x") === "")
  }
}
