package graft.dataflow

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The `cocoindex` CLI's projection surface
  * (python/cocoindex/cli.py:1-738) — every deterministic render and
  * decision behind the click commands, separated from the
  * process-level plumbing (dotenv loading, module import, signal
  * handling) that stays host-side. The update stats line it prints is
  * the engine's `UpdateStats`/`IndexUpdateInfo` Display
  * (src/execution/stats.rs:99-160) surfaced through the live updater's
  * report closure (src/execution/live_updater.rs:108-121).
  *
  * Everything here is either a pure row-level function (pinned by
  * CliSpec against the reference strings) or a Column ladder (gated by
  * q172/q173); the Column faces are per-row projections — no shuffle
  * at any scale.
  */
object Cli {

  /** cli.py:25 — the host constant behind `--cors-cocoindex` and the
    * CocoInsight banner. */
  val cocoindexHost = "https://cocoindex.io"

  // ---- app/flow specifier parsing (cli.py:28-76) ----

  /** The exact Java-vs-CPython identifier diffs, computed by
    * enumerating ALL code points on JDK 17 against CPython 3.11 (the
    * reference interpreter): the EXC sets are the XID exclusions Java
    * admits (ID_Start-not-XID_Start: U+037A, the Thai/Lao AM vowels,
    * U+2E2F, the kana voicing marks, Arabic presentation forms, the
    * halfwidth sound marks); the INC sets are Unicode-14 script
    * additions (Arabic Extended-B, Vithkuqi, Latin Extended-F/G,
    * Tangsa, Toto, Znamenny, CJK Ext) that CPython's newer tables
    * accept and JDK 17's Unicode-13 tables don't. Ranges inclusive. */
  private def inRanges(cp: Int, rs: Array[Int]): Boolean = {
    // rs is [lo0, hi0, lo1, hi1, ...] sorted; binary search
    var lo = 0; var hi = rs.length / 2 - 1
    while (lo <= hi) {
      val mid = (lo + hi) >>> 1
      if (cp < rs(2 * mid)) hi = mid - 1
      else if (cp > rs(2 * mid + 1)) lo = mid + 1
      else return true
    }
    false
  }
  private def r(pairs: (Int, Int)*): Array[Int] =
    pairs.flatMap { case (a, b) => Seq(a, b) }.toArray
  private val excStart = r((0x37A, 0x37A), (0xE33, 0xE33),
    (0xEB3, 0xEB3), (0x2E2F, 0x2E2F), (0x309B, 0x309C),
    (0xFC5E, 0xFC63), (0xFDFA, 0xFDFB), (0xFE70, 0xFE70),
    (0xFE72, 0xFE72), (0xFE74, 0xFE74), (0xFE76, 0xFE76),
    (0xFE78, 0xFE78), (0xFE7A, 0xFE7A), (0xFE7C, 0xFE7C),
    (0xFE7E, 0xFE7E), (0xFF9E, 0xFF9F))
  private val excCont = r((0x37A, 0x37A), (0x2E2F, 0x2E2F),
    (0x309B, 0x309C), (0xFC5E, 0xFC63), (0xFDFA, 0xFDFB),
    (0xFE70, 0xFE70), (0xFE72, 0xFE72), (0xFE74, 0xFE74),
    (0xFE76, 0xFE76), (0xFE78, 0xFE78), (0xFE7A, 0xFE7A),
    (0xFE7C, 0xFE7C), (0xFE7E, 0xFE7E))
  private val incStart = r((0x870, 0x887), (0x889, 0x88E),
    (0x8B5, 0x8B5), (0x8C8, 0x8C9), (0xC5D, 0xC5D), (0xCDD, 0xCDD),
    (0x170D, 0x170D), (0x171F, 0x171F), (0x1B4C, 0x1B4C),
    (0x2C2F, 0x2C2F), (0x2C5F, 0x2C5F), (0x9FFD, 0x9FFF),
    (0xA7C0, 0xA7C1), (0xA7D0, 0xA7D1), (0xA7D3, 0xA7D3),
    (0xA7D5, 0xA7D9), (0xA7F2, 0xA7F4), (0x10570, 0x1057A),
    (0x1057C, 0x1058A), (0x1058C, 0x10592), (0x10594, 0x10595),
    (0x10597, 0x105A1), (0x105A3, 0x105B1), (0x105B3, 0x105B9),
    (0x105BB, 0x105BC), (0x10780, 0x10785), (0x10787, 0x107B0),
    (0x107B2, 0x107BA), (0x10F70, 0x10F81), (0x11071, 0x11072),
    (0x11075, 0x11075), (0x11740, 0x11746), (0x11AB0, 0x11ABF),
    (0x12F90, 0x12FF0), (0x16A70, 0x16ABE), (0x1AFF0, 0x1AFF3),
    (0x1AFF5, 0x1AFFB), (0x1AFFD, 0x1AFFE), (0x1B11F, 0x1B122),
    (0x1DF00, 0x1DF1E), (0x1E290, 0x1E2AD), (0x1E7E0, 0x1E7E6),
    (0x1E7E8, 0x1E7EB), (0x1E7ED, 0x1E7EE), (0x1E7F0, 0x1E7FE),
    (0x2A6DE, 0x2A6DF), (0x2B735, 0x2B738))
  private val incCont = r((0x870, 0x887), (0x889, 0x88E),
    (0x898, 0x89F), (0x8B5, 0x8B5), (0x8C8, 0x8D2), (0xC3C, 0xC3C),
    (0xC5D, 0xC5D), (0xCDD, 0xCDD), (0x170D, 0x170D),
    (0x1715, 0x1715), (0x171F, 0x171F), (0x180F, 0x180F),
    (0x1AC1, 0x1ACE), (0x1B4C, 0x1B4C), (0x1DFA, 0x1DFA),
    (0x2C2F, 0x2C2F), (0x2C5F, 0x2C5F), (0x9FFD, 0x9FFF),
    (0xA7C0, 0xA7C1), (0xA7D0, 0xA7D1), (0xA7D3, 0xA7D3),
    (0xA7D5, 0xA7D9), (0xA7F2, 0xA7F4), (0x10570, 0x1057A),
    (0x1057C, 0x1058A), (0x1058C, 0x10592), (0x10594, 0x10595),
    (0x10597, 0x105A1), (0x105A3, 0x105B1), (0x105B3, 0x105B9),
    (0x105BB, 0x105BC), (0x10780, 0x10785), (0x10787, 0x107B0),
    (0x107B2, 0x107BA), (0x10F70, 0x10F85), (0x11070, 0x11075),
    (0x110C2, 0x110C2), (0x11740, 0x11746), (0x11AB0, 0x11ABF),
    (0x12F90, 0x12FF0), (0x16A70, 0x16ABE), (0x16AC0, 0x16AC9),
    (0x1AFF0, 0x1AFF3), (0x1AFF5, 0x1AFFB), (0x1AFFD, 0x1AFFE),
    (0x1B11F, 0x1B122), (0x1CF00, 0x1CF2D), (0x1CF30, 0x1CF46),
    (0x1DF00, 0x1DF1E), (0x1E290, 0x1E2AE), (0x1E7E0, 0x1E7E6),
    (0x1E7E8, 0x1E7EB), (0x1E7ED, 0x1E7EE), (0x1E7F0, 0x1E7FE),
    (0x2A6DE, 0x2A6DF), (0x2B735, 0x2B738))

  /** Python `str.isidentifier` over the flow-name part (cli.py:48),
    * EXACT across all of Unicode: JDK 17's identifier classes
    * (identifier-ignorables filtered — Cf format chars and controls
    * CPython rejects) corrected by the enumerated diff tables above.
    * Pinned by the CPython-recorded cli.json battery incl. the
    * XID-excluded and Unicode-14 arms. */
  def isPyIdentifier(s: String): Boolean = {
    def start(cp: Int): Boolean =
      (((Character.isUnicodeIdentifierStart(cp) &&
        !Character.isIdentifierIgnorable(cp)) || cp == '_') &&
        !inRanges(cp, excStart)) || inRanges(cp, incStart)
    def part(cp: Int): Boolean =
      ((Character.isUnicodeIdentifierPart(cp) &&
        !Character.isIdentifierIgnorable(cp)) &&
        !inRanges(cp, excCont)) || inRanges(cp, incCont)
    s.nonEmpty && start(s.codePointAt(0)) &&
      s.codePoints().skip(1).allMatch(part(_))
  }

  /** `_parse_app_flow_specifier` (cli.py:28-55): split on the FIRST
    * colon only; an empty part after the colon reads as no flow name;
    * a non-identifier flow part is the BadParameter on the right.
    * Left = the exact click.BadParameter message. */
  def parseAppFlowSpecifier(specifier: String)
      : Either[String, (String, Option[String])] = {
    val parts = specifier.split(":", 2)
    val appRef = parts(0)
    if (appRef.isEmpty)
      Left("Application module/path part is missing or invalid in " +
        s"specifier: '$specifier'. Expected format like 'myapp.py' or " +
        "'myapp:MyFlow'.")
    else if (parts.length == 1) Right((appRef, None))
    else {
      val flowPart = parts(1)
      if (flowPart.isEmpty) Right((appRef, None))
      else if (!isPyIdentifier(flowPart))
        Left(s"Invalid format for flow name part ('$flowPart') in " +
          s"specifier '$specifier'. If a colon separates the application " +
          "from the flow name, the flow name should typically be a valid " +
          "identifier (e.g., alphanumeric with underscores, not starting " +
          "with a number).")
      else Right((appRef, Some(flowPart)))
    }
  }

  /** `_get_app_ref_from_specifier` (cli.py:58-76): app-level commands
    * ignore a flow suffix with a yellow stderr warning; returns
    * (appRef, that warning if any). */
  def appRefFromSpecifier(specifier: String)
      : Either[String, (String, Option[String])] =
    parseAppFlowSpecifier(specifier).map { case (appRef, flowRef) =>
      (appRef, flowRef.map(fr =>
        s"Ignoring flow name '$fr' in '$specifier': this command " +
          s"operates on the entire app/module '$appRef'."))
    }

  // ---- app loading faces (cli.py:79-122) ----

  /** cli.py:87 — a target with a path separator or a `.py` suffix
    * (case-insensitive) loads as a file, anything else as a module.
    * os.sep is "/" on the platforms the reference ships for. */
  def looksLikePath(target: String): Boolean =
    target.contains("/") || target.toLowerCase.endsWith(".py")

  /** The loader/initializer error and info vocabulary
    * (cli.py:84-156), verbatim. */
  object Messages {
    val appTargetNotProvided = "Application target not provided."
    def fileNotFound(path: String): String =
      s"Application file path not found: $path"
    def failedImportingFile(absPath: String, err: String): String =
      s"Failed importing file '$absPath': $err"
    def failedLoadModule(target: String, err: String): String =
      s"Failed to load module '$target': $err"
    def unexpectedModuleError(target: String, err: String): String =
      s"Unexpected error importing module '$target': $err"
    def loadedEnv(absPath: String): String =
      s"Loaded environment variables from: $absPath\n"
    def initFailed(err: String): String =
      s"Failed to initialize CocoIndex library: $err"
  }

  /** `flow_names_with_setup` (python/cocoindex/setup.py:75-92): the
    * engine returns FULL names; each splits on the first "." into
    * (namespace, name) — a dot-free name reads namespace "" — and only
    * names in the CURRENT app namespace survive, returned SHORT. The
    * persisted-names input to [[lsAppLines]]/[[lsPersistedLines]]. */
  def flowNamesWithSetup(engineFullNames: Seq[String],
      appNamespace: String): Seq[String] =
    engineFullNames.flatMap { full =>
      val (ns, name) = Naming.splitAppNamespace(full, ".")
      if (ns == appNamespace) Some(name) else None
    }

  // ---- ls (cli.py:159-204) ----

  /** App-mode listing: sorted current flow names, `[+]` marking flows
    * present in the process but missing setup, plus the Notes block
    * when any marker fired. Persisted-but-undefined flows are NOT
    * listed (the reference iterates current names only). */
  def lsAppLines(current: Seq[String], persisted: Seq[String])
      : Seq[String] = {
    val persistedSet = persisted.toSet
    val missing = current.exists(n => !persistedSet.contains(n))
    val names = current.sorted.map(n =>
      if (persistedSet.contains(n)) n else s"$n [+]")
    if (missing)
      names ++ Seq("", "Notes:",
        "  [+]: Flows present in the current process, but missing setup.")
    else names
  }

  def noFlowsDefined(appRef: String): String =
    s"No flows are defined in '$appRef'."

  /** No-app mode: sorted persisted names, or the empty-backend line. */
  def lsPersistedLines(persisted: Seq[String]): Seq[String] =
    if (persisted.isEmpty)
      Seq("No persisted flow setups found in the backend.")
    else persisted.sorted

  /** The q172 Column face of the app-mode marker. */
  def lsLineCol(name: Column, persisted: Column): Column =
    when(persisted, name).otherwise(concat(name, lit(" [+]")))

  // ---- show (cli.py:235-245; flow.py:693-715) ----

  /** The rich Table title and column set (cli.py:235-242). */
  def schemaTableTitle(flowName: String): String =
    s"Schema for Flow: $flowName"
  val schemaTableColumns: Seq[String] = Seq("Field", "Type", "Attributes")

  /** `_render_spec`'s root label (flow.py:698). */
  def specTreeRoot(fullName: String): String = s"Flow: $fullName"

  /** build_tree's label rule (flow.py:700-701): a section with no
    * lines renders `{section}: None` — the " None" appends to the
    * already-colon-suffixed label. */
  def specSectionLabel(section: String, isEmpty: Boolean): String =
    if (isEmpty) s"$section: None" else s"$section:"

  // ---- setup / drop decision flow (cli.py:248-269, :319-376) ----

  /** What `_setup_flows` echoes and does, as data: the description is
    * echoed when forced-visible or out of date; an up-to-date bundle
    * short-circuits with its quiet-gated line; otherwise the confirm
    * prompt gates apply (force skips it), and apply reports to stdout
    * unless quiet. */
  final case class SetupOutcome(showDescription: Boolean,
      echoLines: Seq[String], prompt: Option[String], applied: Boolean,
      reportToStdout: Boolean)

  val setupConfirmPrompt = "Changes need to be pushed. Continue? [yes/N]"

  def setupFlows(isUpToDate: Boolean, force: Boolean, confirmed: Boolean,
      quiet: Boolean, alwaysShowSetup: Boolean): SetupOutcome = {
    val show = alwaysShowSetup || !isUpToDate
    if (isUpToDate)
      SetupOutcome(show,
        if (quiet) Nil else Seq("Setup is already up to date."),
        None, applied = false, reportToStdout = false)
    else if (!force && !confirmed)
      SetupOutcome(show, Nil, Some(setupConfirmPrompt), applied = false,
        reportToStdout = false)
    else
      SetupOutcome(show, Nil,
        if (force) None else Some(setupConfirmPrompt), applied = true,
        reportToStdout = !quiet)
  }

  /** The drop command's line vocabulary (cli.py:330-376), verbatim.
    * The preparing line renders BEFORE the empty-flows check, so an
    * all-unknown name list still echoes it with an empty join. */
  object Drop {
    val missingTarget: String =
      "Missing arguments. You must either provide an APP_TARGET (to " +
        "target app-specific flows) or use the --all flag."
    def unknownFlowWarning(name: String): String =
      s"Warning: Failed to get flow `$name`. Ignored."
    def preparingLine(flowFullNames: Seq[String], appRef: String): String =
      s"Preparing to drop specified flows: ${flowFullNames.mkString(", ")} " +
        s"(in '$appRef')."
    val noFlowsIdentified = "No flows identified for the drop operation."
    val nothingToDrop = "No flows need to be dropped."
    def confirmPrompt(flowFullNames: Seq[String]): String =
      s"\nThis will apply changes to drop setup for: " +
        s"${flowFullNames.mkString(", ")}. Continue? [yes/N]"
    val aborted = "Drop operation aborted by user."
  }

  // ---- update / server notes (cli.py:272-284, :428-432, :624-627) ----

  /** The yellow NOTE banners, verbatim incl. their trailing blank
    * line. */
  object Notes {
    val liveCodeChanges: String =
      "NOTE: Flow code changes will NOT be reflected until you restart " +
        "to load the new code.\n"
    val noLiveUpdateHint: String =
      "NOTE: No change capture mechanism exists. See " +
        "https://cocoindex.io/docs/core/flow_methods#live-update for " +
        "more details.\n"
    val serverNoReload: String =
      "NOTE: Flow code changes will NOT be reflected until you restart " +
        "to load the new code. Use --reload to enable auto-reload.\n"
    def reloadDetected(nFiles: Int): String =
      s"\nDetected changes in $nFiles file(s), reloading server...\n"
    val ctrlC = "Press Ctrl+C to stop the server."
    def cocoinsight(host: String = cocoindexHost): String =
      s"Open CocoInsight at: $host/cocoinsight"
  }

  // ---- evaluate output dir (cli.py:492-493) ----

  /** strftime %y%m%d_%H%M%S — the timestamp grammar of the default
    * eval output dir. */
  val evalTimestampPattern = "yyMMdd_HHmmss"

  /** `eval_{app_namespace with trailing _}{flow}_{timestamp}`; the
    * namespace delimiter appends only when the namespace is non-empty
    * (setting.py:14-18 via [[Naming.appNamespaceWithDelimiter]]). */
  def defaultEvalOutputDir(appNamespace: String, flowName: String,
      timestamp: String): String =
    "eval_" + Naming.appNamespaceWithDelimiter(appNamespace, Some("_")) +
      flowName + "_" + timestamp

  /** The q172 Column face of the eval-dir default. */
  def evalDirCol(namespace: Column, flowName: Column,
      timestamp: Column): Column =
    concat(lit("eval_"),
      when(namespace === "", lit("")).otherwise(concat(namespace, lit("_"))),
      flowName, lit("_"), timestamp)

  // ---- server CORS assembly (cli.py:650-674) ----

  /** The CORS origin set: env origins + parsed --cors-origin +
    * the cocoindex host (--cors-cocoindex) + http://localhost:{port}
    * (--cors-local). The reference materializes a Python set (its
    * iteration order is unspecified); this face dedups preserving
    * first-insertion order so callers get a deterministic list. */
  def corsOrigins(envOrigins: Seq[String], cliOrigin: Option[String],
      corsCocoindex: Boolean, corsLocal: Option[Int]): Seq[String] = {
    val fromCli = cliOrigin.flatMap(Naming.parseCorsOrigins)
      .getOrElse(Seq.empty)
    val host = if (corsCocoindex) Seq(cocoindexHost) else Seq.empty
    val local = corsLocal.map(p => s"http://localhost:$p").toSeq
    (envOrigins ++ fromCli ++ host ++ local).distinct
  }

  /** The CocoInsight banner fires iff the host landed in the origin
    * set (cli.py:673-674). */
  def showsCocoinsightBanner(origins: Seq[String]): Boolean =
    origins.contains(cocoindexHost)

  // ---- flow selection (cli.py:694-734) ----

  sealed trait FlowSelection
  final case class Selected(name: String) extends FlowSelection
  /** Multiple flows and no name → the interactive arrow-key picker;
    * the candidate list (in registry order, as the reference indexes
    * it) is the model's boundary. */
  final case class Interactive(names: Seq[String]) extends FlowSelection

  def flowNotFound(name: String, names: Seq[String]): String = {
    val available =
      if (names.isEmpty) "None" else names.sorted.mkString(", ")
    s"Flow '$name' not found.\nAvailable: $available"
  }
  val noFlowsAvailable = "No flows available in the loaded application."

  /** `_flow_name`: a given name must exist (BadParameter on the
    * left); with none given, zero flows is a UsageError, one
    * auto-selects, several go interactive. */
  def selectFlow(name: Option[String], names: Seq[String])
      : Either[String, FlowSelection] = name match {
    case Some(n) =>
      if (names.contains(n)) Right(Selected(n))
      else Left(flowNotFound(n, names))
    case None =>
      if (names.isEmpty) Left(noFlowsAvailable)
      else if (names.size == 1) Right(Selected(names.head))
      else Right(Interactive(names))
  }

  // ---- the update stats line (src/execution/stats.rs:99-160) ----

  /** UpdateStats Display: optional FAILED / NO CHANGE / processed
    * segments joined by "; ", else "No changes". The processed total
    * counts insertions+deletions+updates+reprocesses (NOT no-change or
    * errors). */
  def statsLine(numErrors: Long, numNoChange: Long, numInsertions: Long,
      numDeletions: Long, numUpdates: Long, numReprocesses: Long)
      : String = {
    val msgs = Seq.newBuilder[String]
    if (numErrors > 0) msgs += s"$numErrors source rows FAILED"
    if (numNoChange > 0) msgs += s"$numNoChange source rows NO CHANGE"
    val total = numInsertions + numDeletions + numUpdates + numReprocesses
    if (total > 0)
      msgs += s"$total source rows processed ($numInsertions ADDED, " +
        s"$numDeletions REMOVED, $numUpdates UPDATED, $numReprocesses " +
        "REPROCESSED on flow change)"
    val m = msgs.result()
    if (m.isEmpty) "No changes" else m.mkString("; ")
  }

  /** The live updater's report line (live_updater.rs:111-114):
    * `{flow}.{source} ({kind}): {stats}` — kind is "batch update",
    * "change stream", or "interval refresh". */
  def sourceUpdateLine(flowName: String, sourceName: String, kind: String,
      stats: String): String = s"$flowName.$sourceName ($kind): $stats"

  /** IndexUpdateInfo Display (stats.rs:150-158): one
    * `{source_name}: {stats}` line per source, each newline-terminated
    * (the `cocoindex update` per-flow stats block). */
  def indexUpdateInfo(sources: Seq[(String, String)]): String =
    sources.map { case (n, s) => s"$n: $s\n" }.mkString

  /** The q173 Column face of [[statsLine]]: concat_ws drops the null
    * (absent) segments on both Spark and DuckDB, keeping the gate a
    * single codegen'd projection. */
  def statsLineCol(numErrors: Column, numNoChange: Column,
      numInsertions: Column, numDeletions: Column, numUpdates: Column,
      numReprocesses: Column): Column = {
    def s(c: Column) = c.cast("string")
    val failed = when(numErrors > 0,
      concat(s(numErrors), lit(" source rows FAILED")))
    val noChange = when(numNoChange > 0,
      concat(s(numNoChange), lit(" source rows NO CHANGE")))
    val total = numInsertions + numDeletions + numUpdates + numReprocesses
    val processed = when(total > 0,
      concat(s(total), lit(" source rows processed ("),
        s(numInsertions), lit(" ADDED, "), s(numDeletions),
        lit(" REMOVED, "), s(numUpdates), lit(" UPDATED, "),
        s(numReprocesses), lit(" REPROCESSED on flow change)")))
    val joined = concat_ws("; ", failed, noChange, processed)
    when(joined === "", lit("No changes")).otherwise(joined)
  }
}
