package graft

import org.json4s._
import org.json4s.jackson.JsonMethods
import org.scalatest.funsuite.AnyFunSuite

import graft.dataflow.Cli

/** Wave-5 parity against the reference BINARY: tools/
  * gen_parity_fixtures5.py runs the REAL python/cocoindex/cli.py
  * under real click 8.x (engine-backed modules replaced by
  * deterministic stand-ins recorded per case) and records specifier
  * parses, CPython str.isidentifier outcomes, and full
  * ls/setup/drop/update/evaluate transcripts; this spec replays the
  * same inputs through dataflow/Cli.scala, reconstructing each
  * transcript from the Scala faces. */
class CliParitySpec extends AnyFunSuite {

  implicit val fmts: Formats = DefaultFormats

  private lazy val fx: JValue =
    JsonMethods.parse(scala.io.Source.fromInputStream(
      getClass.getResourceAsStream("/refparity/cli.json"), "UTF-8")
      .mkString)

  private val app = "/tmp/cli_parity_app.py"

  private def str(v: JValue): Option[String] = v match {
    case JString(s) => Some(s)
    case _ => None
  }

  test("specifier parse battery matches the reference run (22 cases " +
      "incl. the unicode identifier arms)") {
    (fx \ "parse_specifier").extract[List[JValue]].foreach { c =>
      val in = (c \ "input").extract[String]
      val got = Cli.parseAppFlowSpecifier(in)
      str(c \ "error") match {
        case Some(err) => assert(got === Left(err), s"input=$in")
        case None =>
          val expected = ((c \ "app_ref").extract[String],
            str(c \ "flow_ref"))
          assert(got === Right(expected), s"input=$in")
      }
    }
  }

  test("isPyIdentifier matches CPython str.isidentifier on the " +
      "recorded battery (Cf rejection, Other_ID grandfather sets)") {
    (fx \ "isidentifier").extract[List[JValue]].foreach { c =>
      val s = (c \ "s").extract[String]
      val want = (c \ "ok").extract[Boolean]
      assert(Cli.isPyIdentifier(s) === want,
        s"s=${s.map(ch => f"\\u${ch.toInt}%04x").mkString}")
    }
  }

  // ---- transcript reconstruction helpers ----

  private def lines(ls: Seq[String]): String =
    ls.map(_ + "\n").mkString

  private case class Rec(args: List[String], flows: List[String],
      persisted: List[String], ns: String, input: Option[String],
      exitCode: Int, bundleDesc: String, bundleUpToDate: Boolean,
      stdout: String, stderr: String)

  private def recs(section: String): List[Rec] =
    (fx \ section).extract[List[JValue]].map { c =>
      Rec((c \ "args").extract[List[String]],
        (c \ "flows").extract[List[String]],
        (c \ "persisted").extract[List[String]],
        (c \ "ns").extract[String],
        str(c \ "input"),
        (c \ "exit_code").extract[Int],
        (c \ "bundle_desc").extract[String],
        (c \ "bundle_up_to_date").extract[Boolean],
        (c \ "stdout").extract[String],
        (c \ "stderr").extract[String])
    }

  test("ls transcripts reconstruct from the Scala faces") {
    recs("ls").foreach { r =>
      val hasApp = r.args.length > 1
      val expectedOut =
        if (!hasApp) lines(Cli.lsPersistedLines(r.persisted))
        else if (r.flows.isEmpty)
          // app ref with any flow suffix stripped
          Cli.noFlowsDefined(app) + "\n"
        else lines(Cli.lsAppLines(r.flows, r.persisted))
      assert(r.stdout === expectedOut, r.args.toString)
      // a flow suffix on an app-level command warns on stderr
      val expectedErr =
        if (hasApp && r.args(1).contains(":"))
          Cli.appRefFromSpecifier(r.args(1)).toOption
            .flatMap(_._2).map(_ + "\n").getOrElse("")
        else ""
      assert(r.stderr === expectedErr, r.args.toString)
      assert(r.exitCode === 0, r.args.toString)
    }
  }

  /** Render _setup_flows' stdout from the SetupOutcome plus the
    * recorded bundle/interaction — the confirm prompt echoes with
    * ": {typed}" under click, and apply prints the stand-in's
    * marker. */
  private def renderSetup(o: Cli.SetupOutcome, desc: String,
      typed: Option[String]): String = {
    val d = if (o.showDescription) desc + "\n" else ""
    val p = o.prompt.map(_ + ": " + typed.map(_.trim).getOrElse("") +
      "\n").getOrElse("")
    val a = if (o.applied)
      s"[APPLY report_to_stdout=${if (o.reportToStdout) "True" else "False"}]\n"
    else ""
    d + lines(o.echoLines) + p + a
  }

  test("setup transcripts reconstruct from the decision ladder") {
    recs("setup").foreach { r =>
      val force = r.args.contains("-f")
      val confirmed = r.input.exists(_.startsWith("y"))
      val o = Cli.setupFlows(r.bundleUpToDate, force, confirmed,
        quiet = false, alwaysShowSetup = true)
      assert(r.stdout === renderSetup(o, r.bundleDesc, r.input),
        r.args.toString)
      assert(r.stderr === "" && r.exitCode === 0, r.args.toString)
    }
  }

  test("drop transcripts reconstruct from the Drop vocabulary") {
    recs("drop").foreach { r =>
      val force = r.args.contains("-f")
      val named = r.args.drop(1).filterNot(_ == "-f").drop(1)
      if (r.args.length == 1) {
        // missing APP_TARGET: click usage error, exit 2, the message
        // on stderr behind the usage block
        assert(r.exitCode === 2)
        assert(r.stderr.contains("Error: " + Cli.Drop.missingTarget))
      } else {
        val known =
          if (named.isEmpty) r.flows else named.filter(r.flows.contains)
        val fullNames = known.map(n =>
          if (r.ns.isEmpty) n else s"${r.ns}.$n")
        val warnings = named.filterNot(r.flows.contains)
          .map(Cli.Drop.unknownFlowWarning)
        val expectedErr = lines(warnings) +
          Cli.Drop.preparingLine(fullNames, app) + "\n"
        assert(r.stderr === expectedErr, r.args.toString)
        val expectedOut =
          if (known.isEmpty) Cli.Drop.noFlowsIdentified + "\n"
          else if (r.bundleUpToDate)
            r.bundleDesc + "\n" + Cli.Drop.nothingToDrop + "\n"
          else if (!force && !r.input.exists(_.startsWith("y")))
            r.bundleDesc + "\n" + Cli.Drop.confirmPrompt(fullNames) +
              ": " + r.input.map(_.trim).getOrElse("") + "\n" +
              Cli.Drop.aborted + "\n"
          else if (force)
            r.bundleDesc + "\n[APPLY report_to_stdout=True]\n"
          else
            r.bundleDesc + "\n" + Cli.Drop.confirmPrompt(fullNames) +
              ": " + r.input.map(_.trim).getOrElse("") + "\n" +
              "[APPLY report_to_stdout=True]\n"
        assert(r.stdout === expectedOut, r.args.toString)
        assert(r.exitCode === 0, r.args.toString)
      }
    }
  }

  test("update transcripts: the live NOTE + hint pair and the --setup " +
      "composition") {
    recs("update").foreach { r =>
      val live = r.args.contains("-L")
      val setup = r.args.contains("--setup")
      val quiet = r.args.contains("-q")
      val force = r.args.contains("-f")
      val liveBanner =
        if (live) Cli.Notes.liveCodeChanges + "\n" else ""
      val hint = if (live) Cli.Notes.noLiveUpdateHint + "\n" else ""
      val setupPart = if (setup) {
        val o = Cli.setupFlows(r.bundleUpToDate, force,
          confirmed = false, quiet = quiet, alwaysShowSetup = false)
        renderSetup(o, r.bundleDesc, None)
      } else ""
      assert(r.stdout === liveBanner + setupPart + hint, r.args.toString)
      assert(r.stderr === "" && r.exitCode === 0, r.args.toString)
    }
  }

  test("evaluate: the recorded output dirs match the default-dir " +
      "composition (frozen clock 250814_120000)") {
    (fx \ "evaluate").extract[List[JValue]].foreach { c =>
      val args = (c \ "args").extract[List[String]]
      val ns = (c \ "ns").extract[String]
      val calls = (c \ "eval_calls").extract[List[JValue]]
      assert(calls.length === 1, args.toString)
      val gotDir = (calls.head \ "output_dir").extract[String]
      val gotCache = (calls.head \ "use_cache").extract[Boolean]
      val oIdx = args.indexOf("-o")
      val expectedDir =
        if (oIdx >= 0) args(oIdx + 1)
        else Cli.defaultEvalOutputDir(ns, "demo", "250814_120000")
      assert(gotDir === expectedDir, args.toString)
      assert(gotCache === !args.contains("--no-cache"), args.toString)
    }
  }
}
