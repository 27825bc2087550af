package graft.sources

import java.nio.file.{Files, Path, Paths}

/** A path or filename failed a security check
  * (app/utils/path_validator.py:7-9 PathSecurityError). */
final class PathSecurityException(msg: String)
  extends IllegalArgumentException(msg)

/** Driver-side path validation for file-ingestion endpoints
  * (app/utils/path_validator.py:11-175, applied at the parser/upload
  * boundary in app/processors/parser.py): directory-traversal
  * containment, suspicious-pattern rejection, and filename
  * sanitization.
  *
  * These guard SINGLE paths handed in by a caller (an upload, a
  * one-document ingest) before anything touches the filesystem;
  * bulk listing (FileSource.binary) trusts its configured root the
  * way the reference's LocalFile source trusts its spec. Store URIs
  * (`s3a://`, `abfss://`) never go through here — they are not local
  * paths and carry no traversal risk for the driver host.
  */
object PathSafety {

  // Scanned against the RESOLVED path, exactly like the reference
  // (path_validator.py:70-87 lowercases str(resolved_path)) — so the
  // traversal entries ("/../", "\..\") are belt-and-braces that
  // normalization has already removed; containment is `baseDir`'s job.
  private val suspiciousPatterns = Seq(
    "/etc/passwd", "/etc/shadow",
    "c:\\windows\\system32", "c:\\windows\\system",
    "/proc/", "/sys/", "\\..\\", "/../", "\u0000")

  private val forbiddenChars =
    Seq('/', '\\', '\u0000', ':', '*', '?', '"', '<', '>', '|')

  private val reservedNames = Set(
    "CON", "PRN", "AUX", "NUL",
    "COM1", "COM2", "COM3", "COM4", "COM5", "COM6", "COM7", "COM8", "COM9",
    "LPT1", "LPT2", "LPT3", "LPT4", "LPT5", "LPT6", "LPT7", "LPT8", "LPT9")

  /** Validate + canonicalize a path (path_validator.py:15-101):
    * http(s) URLs pass through when `allowUrls` (scheme + host
    * required); local paths resolve (symlinks chased when the file
    * exists), must stay inside `baseDir` when given, must avoid the
    * suspicious-pattern list, and their filename component must pass
    * [[validateFilename]]. Throws [[PathSecurityException]]. */
  def validatePath(path: String, baseDir: Option[String] = None,
      allowUrls: Boolean = true): String = {
    if (path == null || path.isEmpty)
      throw new PathSecurityException("Empty path provided")
    if (path.startsWith("http://") || path.startsWith("https://")) {
      if (!allowUrls)
        throw new PathSecurityException("URL paths are not allowed")
      val parsed =
        try new java.net.URI(path)
        catch { case e: Exception =>
          throw new PathSecurityException(s"Invalid URL: ${e.getMessage}") }
      if (parsed.getScheme == null || parsed.getHost == null)
        throw new PathSecurityException(s"Invalid URL: $path")
      return path
    }
    val resolved =
      try {
        val p = Paths.get(path)
        if (Files.exists(p)) p.toRealPath()
        else p.toAbsolutePath.normalize()
      } catch {
        case e: PathSecurityException => throw e
        case e: Exception =>
          throw new PathSecurityException(s"Invalid path: ${e.getMessage}")
      }
    baseDir.foreach { b =>
      val base = Paths.get(b)
      val baseResolved =
        if (Files.exists(base)) base.toRealPath()
        else base.toAbsolutePath.normalize()
      if (!resolved.startsWith(baseResolved))
        throw new PathSecurityException(
          s"Path '$path' is outside allowed directory '$b'")
    }
    val lowered = resolved.toString.toLowerCase
    suspiciousPatterns.foreach { pat =>
      if (lowered.contains(pat))
        throw new PathSecurityException(
          s"Path contains suspicious pattern: $pat")
    }
    Option(resolved.getFileName).map(_.toString).filter(_.nonEmpty)
      .foreach(validateFilename)
    resolved.toString
  }

  /** Validate a filename (path_validator.py:103-149): directory
    * components stripped, forbidden characters rejected, reserved
    * Windows device names rejected (on the pre-extension stem),
    * 255-char cap, hidden (dot-prefixed) files rejected. */
  def validateFilename(filename: String): String = {
    if (filename == null || filename.isEmpty)
      throw new PathSecurityException("Empty filename provided")
    // strip '/' components only (the reference runs POSIX basename,
    // so a backslash survives into the forbidden-character check)
    val name = filename.substring(filename.lastIndexOf('/') + 1)
    forbiddenChars.foreach { c =>
      if (name.contains(c))
        throw new PathSecurityException(
          s"Filename contains forbidden character: '$c'")
    }
    // stem = text before the first '.' — NOT split('.')(0), which
    // throws on all-dot names like ".." (Java strips trailing empties)
    if (reservedNames.contains(name.takeWhile(_ != '.').toUpperCase))
      throw new PathSecurityException(s"Filename is a reserved name: $name")
    if (name.length > 255)
      throw new PathSecurityException(
        s"Filename too long: ${name.length} characters")
    if (name.startsWith("."))
      throw new PathSecurityException("Hidden files are not allowed")
    name
  }

  /** Validate a directory path (URLs disallowed), create it if
    * missing, and require it to actually be a directory
    * (path_validator.py:152-175). */
  def ensureSafeDirectory(directory: String): Path = {
    val validated = Paths.get(validatePath(directory, allowUrls = false))
    if (!Files.exists(validated))
      try Files.createDirectories(validated)
      catch { case e: Exception =>
        throw new PathSecurityException(
          s"Failed to create directory: ${e.getMessage}") }
    if (!Files.isDirectory(validated))
      throw new PathSecurityException(s"Not a directory: $directory")
    validated
  }
}
