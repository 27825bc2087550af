package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.dataflow.Cli

/** The `cocoindex` CLI projection surface (python/cocoindex/cli.py)
  * plus the engine stats-line Display it prints
  * (src/execution/stats.rs) — exact strings pinned against the
  * reference. */
class CliSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  import spark.implicits._

  // ---- specifier parsing (cli.py:28-76) ----

  test("specifier splits on the first colon only; empty flow part " +
      "reads as none (:30-46)") {
    assert(Cli.parseAppFlowSpecifier("app.py") === Right(("app.py", None)))
    assert(Cli.parseAppFlowSpecifier("app.py:MyFlow") ===
      Right(("app.py", Some("MyFlow"))))
    // first-colon split: the rest stays in the flow part (and fails
    // the identifier check there)
    assert(Cli.parseAppFlowSpecifier("a:b:c").isLeft)
    assert(Cli.parseAppFlowSpecifier("app.py:") === Right(("app.py", None)))
  }

  test("empty app part and non-identifier flow part carry the exact " +
      "BadParameter messages (:33-54)") {
    assert(Cli.parseAppFlowSpecifier(":Flow") === Left(
      "Application module/path part is missing or invalid in specifier: " +
        "':Flow'. Expected format like 'myapp.py' or 'myapp:MyFlow'."))
    assert(Cli.parseAppFlowSpecifier("app.py:9bad") === Left(
      "Invalid format for flow name part ('9bad') in specifier " +
        "'app.py:9bad'. If a colon separates the application from the " +
        "flow name, the flow name should typically be a valid identifier " +
        "(e.g., alphanumeric with underscores, not starting with a " +
        "number)."))
    // identifier arms: leading underscore ok, digits inside ok,
    // dash/space/dot rejected
    assert(Cli.parseAppFlowSpecifier("a:_f1").isRight)
    assert(Cli.parseAppFlowSpecifier("a:f-1").isLeft)
    assert(Cli.parseAppFlowSpecifier("a:f 1").isLeft)
    assert(Cli.parseAppFlowSpecifier("a:f.1").isLeft)
    // CPython rejects Cf format chars (soft hyphen, ZWSP) and
    // controls that Java's identifier classes would admit
    assert(!Cli.isPyIdentifier("a­b"))
    assert(!Cli.isPyIdentifier("a​b"))
    assert(!Cli.isPyIdentifier("ab"))
    assert(!Cli.isPyIdentifier("­a"))
    assert(Cli.isPyIdentifier("caf\u00e9")) // XID letters stay accepted
    assert(Cli.isPyIdentifier("\u6587\u5b57"))
  }

  test("app-level commands ignore a flow suffix with the exact " +
      "warning (:58-76)") {
    assert(Cli.appRefFromSpecifier("app.py") === Right(("app.py", None)))
    assert(Cli.appRefFromSpecifier("app.py:MyFlow") === Right(("app.py",
      Some("Ignoring flow name 'MyFlow' in 'app.py:MyFlow': this " +
        "command operates on the entire app/module 'app.py'."))))
  }

  test("path-vs-module heuristic: separator or .py suffix, " +
      "case-insensitive (:87)") {
    assert(Cli.looksLikePath("dir/app"))
    assert(Cli.looksLikePath("APP.PY"))
    assert(Cli.looksLikePath("app.py"))
    assert(!Cli.looksLikePath("installed.module"))
    assert(!Cli.looksLikePath("mymodule"))
  }

  test("loader/init message vocabulary (:84-156)") {
    assert(Cli.Messages.appTargetNotProvided ===
      "Application target not provided.")
    assert(Cli.Messages.fileNotFound("x.py") ===
      "Application file path not found: x.py")
    assert(Cli.Messages.failedImportingFile("/a/x.py", "boom") ===
      "Failed importing file '/a/x.py': boom")
    assert(Cli.Messages.failedLoadModule("m", "nope") ===
      "Failed to load module 'm': nope")
    assert(Cli.Messages.unexpectedModuleError("m", "E") ===
      "Unexpected error importing module 'm': E")
    assert(Cli.Messages.loadedEnv("/w/.env") ===
      "Loaded environment variables from: /w/.env\n")
    assert(Cli.Messages.initFailed("err") ===
      "Failed to initialize CocoIndex library: err")
  }

  // ---- ls (cli.py:159-204) ----

  test("ls app mode: sorted names, [+] for missing setup, notes " +
      "block only when a marker fired (:182-196)") {
    assert(Cli.lsAppLines(Seq("b_flow", "a_flow"), Seq("a_flow", "zz")) ===
      Seq("a_flow", "b_flow [+]", "", "Notes:",
        "  [+]: Flows present in the current process, but missing setup."))
    // all persisted: no notes block; persisted-only flows not listed
    assert(Cli.lsAppLines(Seq("a"), Seq("a", "ghost")) === Seq("a"))
    // a persisted flow whose NAME ends in " [+]" must not trigger the
    // notes block (the flag tracks setup state, not rendered text)
    assert(Cli.lsAppLines(Seq("x [+]"), Seq("x [+]")) === Seq("x [+]"))
    assert(Cli.noFlowsDefined("app.py") ===
      "No flows are defined in 'app.py'.")
  }

  test("ls without app: sorted persisted names or the empty-backend " +
      "line (:198-204)") {
    assert(Cli.lsPersistedLines(Seq("z", "a")) === Seq("a", "z"))
    assert(Cli.lsPersistedLines(Nil) ===
      Seq("No persisted flow setups found in the backend."))
  }

  test("flow_names_with_setup filters engine full names to the " +
      "current namespace, returned short (setup.py:75-92)") {
    val full = Seq("ns1.flowA", "ns2.flowB", "bare", "ns1.x.y")
    // first-dot split: "ns1.x.y" reads (ns1, x.y)
    assert(Cli.flowNamesWithSetup(full, "ns1") === Seq("flowA", "x.y"))
    // empty current namespace keeps only dot-free names
    assert(Cli.flowNamesWithSetup(full, "") === Seq("bare"))
    assert(Cli.flowNamesWithSetup(full, "ns3") === Nil)
  }

  // ---- show (cli.py:235-245; flow.py:693-715) ----

  test("show: schema table title/columns and the spec tree labels") {
    assert(Cli.schemaTableTitle("demo") === "Schema for Flow: demo")
    assert(Cli.schemaTableColumns === Seq("Field", "Type", "Attributes"))
    assert(Cli.specTreeRoot("ns.demo") === "Flow: ns.demo")
    assert(Cli.specSectionLabel("Sources", isEmpty = false) === "Sources:")
    assert(Cli.specSectionLabel("Declarations", isEmpty = true) ===
      "Declarations: None")
  }

  // ---- setup decision flow (cli.py:248-269) ----

  test("setup: up-to-date short-circuits with its quiet-gated line " +
      "and never prompts (:256-262)") {
    val loud = Cli.setupFlows(isUpToDate = true, force = false,
      confirmed = false, quiet = false, alwaysShowSetup = false)
    assert(!loud.showDescription && !loud.applied)
    assert(loud.echoLines === Seq("Setup is already up to date."))
    assert(loud.prompt.isEmpty)
    val quiet = Cli.setupFlows(isUpToDate = true, force = false,
      confirmed = false, quiet = true, alwaysShowSetup = false)
    assert(quiet.echoLines.isEmpty)
    // `setup` passes always_show_setup=True: description shows even
    // when up to date (cli.py:305)
    assert(Cli.setupFlows(isUpToDate = true, force = false,
      confirmed = false, quiet = false, alwaysShowSetup = true)
      .showDescription)
  }

  test("setup: the confirm prompt gates apply; force skips it; quiet " +
      "mutes the apply report (:263-269)") {
    val declined = Cli.setupFlows(isUpToDate = false, force = false,
      confirmed = false, quiet = false, alwaysShowSetup = false)
    assert(declined.showDescription && !declined.applied)
    assert(declined.prompt ===
      Some("Changes need to be pushed. Continue? [yes/N]"))
    val confirmed = Cli.setupFlows(isUpToDate = false, force = false,
      confirmed = true, quiet = false, alwaysShowSetup = false)
    assert(confirmed.applied && confirmed.reportToStdout)
    val forced = Cli.setupFlows(isUpToDate = false, force = true,
      confirmed = false, quiet = true, alwaysShowSetup = false)
    assert(forced.applied && forced.prompt.isEmpty &&
      !forced.reportToStdout)
  }

  // ---- drop vocabulary (cli.py:330-376) ----

  test("drop line vocabulary, verbatim") {
    assert(Cli.Drop.missingTarget ===
      "Missing arguments. You must either provide an APP_TARGET (to " +
        "target app-specific flows) or use the --all flag.")
    assert(Cli.Drop.unknownFlowWarning("ghost") ===
      "Warning: Failed to get flow `ghost`. Ignored.")
    assert(Cli.Drop.preparingLine(Seq("ns.a", "ns.b"), "app.py") ===
      "Preparing to drop specified flows: ns.a, ns.b (in 'app.py').")
    // the preparing line renders BEFORE the empty check — empty join
    assert(Cli.Drop.preparingLine(Nil, "app.py") ===
      "Preparing to drop specified flows:  (in 'app.py').")
    assert(Cli.Drop.noFlowsIdentified ===
      "No flows identified for the drop operation.")
    assert(Cli.Drop.nothingToDrop === "No flows need to be dropped.")
    assert(Cli.Drop.confirmPrompt(Seq("ns.a")) ===
      "\nThis will apply changes to drop setup for: ns.a. Continue? [yes/N]")
    assert(Cli.Drop.aborted === "Drop operation aborted by user.")
  }

  // ---- NOTE banners (cli.py:272-284, :428-432, :618-627, :673-676) ----

  test("NOTE banners, verbatim incl. trailing newlines") {
    assert(Cli.Notes.liveCodeChanges ===
      "NOTE: Flow code changes will NOT be reflected until you restart " +
        "to load the new code.\n")
    assert(Cli.Notes.noLiveUpdateHint ===
      "NOTE: No change capture mechanism exists. See " +
        "https://cocoindex.io/docs/core/flow_methods#live-update for " +
        "more details.\n")
    assert(Cli.Notes.serverNoReload ===
      "NOTE: Flow code changes will NOT be reflected until you restart " +
        "to load the new code. Use --reload to enable auto-reload.\n")
    assert(Cli.Notes.reloadDetected(3) ===
      "\nDetected changes in 3 file(s), reloading server...\n")
    assert(Cli.Notes.ctrlC === "Press Ctrl+C to stop the server.")
    assert(Cli.Notes.cocoinsight() ===
      "Open CocoInsight at: https://cocoindex.io/cocoinsight")
  }

  // ---- evaluate output dir (cli.py:492-493) ----

  test("evaluate default dir: eval_{ns_}{flow}_{ts}; empty namespace " +
      "drops the delimiter") {
    assert(Cli.defaultEvalOutputDir("", "demo", "250814_093015") ===
      "eval_demo_250814_093015")
    assert(Cli.defaultEvalOutputDir("myns", "demo", "250814_093015") ===
      "eval_myns_demo_250814_093015")
    assert(Cli.evalTimestampPattern === "yyMMdd_HHmmss")
  }

  // ---- server CORS assembly (cli.py:650-674) ----

  test("cors origins: env + parsed cli + host flag + localhost port, " +
      "deduped") {
    val origins = Cli.corsOrigins(
      envOrigins = Seq("https://a.com"),
      cliOrigin = Some(" https://b.com , https://a.com ,"),
      corsCocoindex = true, corsLocal = Some(3000))
    assert(origins === Seq("https://a.com", "https://b.com",
      "https://cocoindex.io", "http://localhost:3000"))
    assert(Cli.showsCocoinsightBanner(origins))
    assert(!Cli.showsCocoinsightBanner(
      Cli.corsOrigins(Nil, None, corsCocoindex = false, None)))
  }

  // ---- flow selection (cli.py:694-734) ----

  test("flow selection: exact not-found/none-available errors, " +
      "single-flow auto-select, multi goes interactive") {
    assert(Cli.selectFlow(Some("x"), Seq("b", "a")) === Left(
      "Flow 'x' not found.\nAvailable: a, b"))
    assert(Cli.selectFlow(Some("x"), Nil) === Left(
      "Flow 'x' not found.\nAvailable: None"))
    assert(Cli.selectFlow(None, Nil) === Left(
      "No flows available in the loaded application."))
    assert(Cli.selectFlow(None, Seq("only")) ===
      Right(Cli.Selected("only")))
    assert(Cli.selectFlow(None, Seq("b", "a")) ===
      Right(Cli.Interactive(Seq("b", "a"))))
    assert(Cli.selectFlow(Some("a"), Seq("b", "a")) ===
      Right(Cli.Selected("a")))
  }

  // ---- stats line (src/execution/stats.rs:99-160) ----

  test("UpdateStats Display: segment order, the processed total, and " +
      "the No changes fallback") {
    assert(Cli.statsLine(2, 5, 3, 1, 4, 6) ===
      "2 source rows FAILED; 5 source rows NO CHANGE; 14 source rows " +
        "processed (3 ADDED, 1 REMOVED, 4 UPDATED, 6 REPROCESSED on " +
        "flow change)")
    assert(Cli.statsLine(0, 0, 0, 0, 0, 0) === "No changes")
    // errors/no-change alone do NOT count into the processed total
    assert(Cli.statsLine(1, 0, 0, 0, 0, 0) === "1 source rows FAILED")
    assert(Cli.statsLine(0, 7, 0, 0, 0, 0) ===
      "7 source rows NO CHANGE")
    assert(Cli.statsLine(0, 0, 2, 0, 0, 0) ===
      "2 source rows processed (2 ADDED, 0 REMOVED, 0 UPDATED, " +
        "0 REPROCESSED on flow change)")
  }

  test("live-updater report frame and IndexUpdateInfo block " +
      "(live_updater.rs:111-114, stats.rs:150-158)") {
    assert(Cli.sourceUpdateLine("demo", "docs", "batch update",
      "No changes") === "demo.docs (batch update): No changes")
    assert(Cli.indexUpdateInfo(Seq("docs" -> "No changes",
      "imgs" -> "1 source rows FAILED")) ===
      "docs: No changes\nimgs: 1 source rows FAILED\n")
  }

  test("statsLineCol matches the row-level statsLine over every " +
      "segment combination") {
    val cases = for {
      e <- Seq(0L, 2L); nc <- Seq(0L, 5L); ins <- Seq(0L, 3L)
      del <- Seq(0L, 1L)
    } yield (e, nc, ins, del, ins % 2, del * 4)
    val out = cases.toDF("e", "nc", "ins", "del", "upd", "rep")
      .select(Cli.statsLineCol(col("e"), col("nc"), col("ins"),
        col("del"), col("upd"), col("rep")).as("line"))
      .collect().map(_.getString(0))
    val expected = cases.map { case (e, nc, i, d, u, r) =>
      Cli.statsLine(e, nc, i, d, u, r) }
    assert(out.toSeq === expected)
  }
}
