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

  /** Unicode Other_ID_Start (PropList): code points grandfathered
    * into XID_Start that Java's category-based classes miss (U+1885/6
    * became Mn in Unicode 9 but stay ID_Start). */
  private val otherIdStart =
    Set(0x1885, 0x1886, 0x2118, 0x212E, 0x309B, 0x309C)

  /** Unicode Other_ID_Continue (PropList): likewise for XID_Continue
    * (the middle dot, Greek ano teleia, Ethiopic digits, the New Tai
    * Lue tham digit). */
  private val otherIdContinue =
    Set(0x00B7, 0x0387, 0x19DA) ++ (0x1369 to 0x1371)

  /** Python `str.isidentifier` over the flow-name part
    * (cli.py:48). Java's unicode-identifier classes track the same
    * XID_Start/XID_Continue properties, with two corrections pinned by
    * the CPython-recorded cli.json battery: (1) Java additionally
    * admits identifier-ignorable characters (Cf format chars like
    * U+00AD/U+200B and most C0/C1 controls) which CPython rejects —
    * filtered; (2) Java misses the Other_ID_Start/Continue
    * grandfather sets (U+1885 starts an identifier, U+00B7 continues
    * one) — added. */
  def isPyIdentifier(s: String): Boolean = {
    def start(cp: Int): Boolean =
      ((Character.isUnicodeIdentifierStart(cp) &&
        !Character.isIdentifierIgnorable(cp)) || cp == '_' ||
        otherIdStart.contains(cp))
    def part(cp: Int): Boolean =
      ((Character.isUnicodeIdentifierPart(cp) &&
        !Character.isIdentifierIgnorable(cp)) ||
        otherIdStart.contains(cp) || otherIdContinue.contains(cp))
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
