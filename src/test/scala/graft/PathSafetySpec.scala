package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{PathSafety, PathSecurityException}

/** Path/filename validation parity (path_validator.py:11-175). */
class PathSafetySpec extends AnyFunSuite {

  private def deny(f: => Any): String =
    intercept[PathSecurityException](f).getMessage

  test("validatePath: traversal containment against a base directory") {
    val base = java.nio.file.Files.createTempDirectory("psafe").toString
    val inside = s"$base/docs/file.txt"
    assert(PathSafety.validatePath(inside, Some(base)) ===
      java.nio.file.Paths.get(inside).toAbsolutePath.normalize.toString)
    // ".." segments resolve BEFORE the containment check
    assert(deny(PathSafety.validatePath(s"$base/docs/../../escape.txt",
      Some(base))).contains("outside allowed directory"))
    assert(deny(PathSafety.validatePath("/etc/passwd", Some(base)))
      .contains("outside allowed directory"))
  }

  test("validatePath: suspicious patterns and empties without a base") {
    assert(deny(PathSafety.validatePath("")) === "Empty path provided")
    assert(deny(PathSafety.validatePath("/etc/passwd"))
      .contains("suspicious pattern"))
    assert(deny(PathSafety.validatePath("/proc/self/environ"))
      .contains("suspicious pattern"))
    // NUL bytes die at Path construction (JVM) or the pattern scan
    val nulPath = "/tmp/a\u0000b"
    val m = deny(PathSafety.validatePath(nulPath))
    assert(m.contains("suspicious pattern") || m.contains("Invalid path"))
  }

  test("validatePath: URLs pass only when allowed and well-formed") {
    assert(PathSafety.validatePath("https://example.com/doc.pdf") ===
      "https://example.com/doc.pdf")
    assert(deny(PathSafety.validatePath("https://example.com/doc.pdf",
      allowUrls = false)) === "URL paths are not allowed")
    assert(deny(PathSafety.validatePath("http:///nohost"))
      .startsWith("Invalid URL"))
  }

  test("validateFilename: forbidden chars, reserved names, hidden, length") {
    assert(PathSafety.validateFilename("report-v2.pdf") === "report-v2.pdf")
    // directory components strip on '/' (POSIX basename); backslash
    // survives into the forbidden-character check like the reference
    assert(PathSafety.validateFilename("/up/loads/ok.txt") === "ok.txt")
    assert(deny(PathSafety.validateFilename("a\\b.txt"))
      .contains("forbidden character"))
    assert(deny(PathSafety.validateFilename("col:on.txt"))
      .contains("forbidden character"))
    assert(deny(PathSafety.validateFilename("CON.txt"))
      .contains("reserved name"))
    assert(deny(PathSafety.validateFilename("lpt7"))
      .contains("reserved name"))
    assert(deny(PathSafety.validateFilename(".hidden"))
      .contains("Hidden files"))
    // all-dot names reject cleanly (no crash on the empty stem)
    assert(deny(PathSafety.validateFilename(".")).contains("Hidden files"))
    assert(deny(PathSafety.validateFilename("..")).contains("Hidden files"))
    assert(deny(PathSafety.validateFilename("x" * 256))
      .contains("too long"))
    assert(deny(PathSafety.validateFilename("")) === "Empty filename provided")
  }

  test("ensureSafeDirectory creates and vets the directory") {
    val base = java.nio.file.Files.createTempDirectory("psafe2").toString
    val made = PathSafety.ensureSafeDirectory(s"$base/newdir")
    assert(java.nio.file.Files.isDirectory(made))
    // a file at the target is rejected, URLs are rejected
    val f = java.nio.file.Files.createFile(
      java.nio.file.Paths.get(s"$base/plainfile"))
    assert(deny(PathSafety.ensureSafeDirectory(f.toString))
      .contains("Not a directory"))
    assert(deny(PathSafety.ensureSafeDirectory("https://example.com/x")) ===
      "URL paths are not allowed")
  }
}
