package graft

import org.json4s._
import org.json4s.jackson.JsonMethods
import org.scalatest.funsuite.AnyFunSuite

import graft.dataflow.PySettings

/** Wave-7 parity against the reference BINARY:
  * tools/gen_parity_fixtures7.py runs the REAL
  * python/cocoindex/setting.py over controlled environments; this
  * spec replays each recorded environment through
  * dataflow/PySettings.scala. */
class PySettingsSpec extends AnyFunSuite {

  implicit val fmts: Formats = DefaultFormats

  private lazy val fx: JValue =
    JsonMethods.parse(scala.io.Source.fromInputStream(
      getClass.getResourceAsStream("/refparity/py_settings.json"),
      "UTF-8").mkString)

  test("Settings.from_env matches the reference run on every " +
      "recorded environment (defaults, database fork, int grammar, " +
      "error vocabulary)") {
    (fx \ "settings").extract[List[JValue]].foreach { c =>
      val name = (c \ "name").extract[String]
      val env = (c \ "env").extract[Map[String, String]]
      val got = PySettings.fromEnv(env)
      (c \ "error") match {
        case JString(err) => assert(got === Left(err), name)
        case _ =>
          val s = c \ "settings"
          val want = PySettings.Settings(
            database = (s \ "database") match {
              case JNull | JNothing => None
              case db => Some(PySettings.DatabaseConnectionSpec(
                url = (db \ "url").extract[String],
                user = (db \ "user").extractOpt[String],
                password = (db \ "password").extractOpt[String],
                maxConnections = (db \ "max_connections").extract[Long],
                minConnections = (db \ "min_connections").extract[Long]))
            },
            appNamespace = (s \ "app_namespace").extract[String],
            globalExecutionOptions = PySettings.GlobalExecutionOptions(
              sourceMaxInflightRows =
                (s \ "global_execution_options" \
                  "source_max_inflight_rows").extractOpt[Long],
              sourceMaxInflightBytes =
                (s \ "global_execution_options" \
                  "source_max_inflight_bytes").extractOpt[Long]))
          assert(got === Right(want), name)
      }
    }
  }

  test("ServerSettings.from_env matches the reference run (address " +
      "default, empty-vs-absent CORS)") {
    (fx \ "server").extract[List[JValue]].foreach { c =>
      val name = (c \ "name").extract[String]
      val env = (c \ "env").extract[Map[String, String]]
      val got = PySettings.serverFromEnv(env)
      val s = c \ "server"
      val wantCors = (s \ "cors_origins") match {
        case JNull | JNothing => None
        case JArray(xs) => Some(xs.map(_.extract[String]))
        case other => fail(s"$name: $other")
      }
      assert(got === Right(PySettings.ServerSettings(
        address = (s \ "address").extract[String],
        corsOrigins = wantCors)), name)
    }
  }

  test("the _load_field vocabulary and python-int grammar edges") {
    assert(PySettings.notSet("COCOINDEX_DATABASE_URL") ===
      "COCOINDEX_DATABASE_URL is not set")
    assert(PySettings.parseFailed("X", "64.0") ===
      "failed to parse environment variable X: 64.0")
    assert(PySettings.pythonInt(" 64 ") === Some(64L))
    assert(PySettings.pythonInt("6_4") === Some(64L))
    assert(PySettings.pythonInt("+7") === Some(7L))
    assert(PySettings.pythonInt("-3") === Some(-3L))
    assert(PySettings.pythonInt("_1") === None)
    assert(PySettings.pythonInt("1_") === None)
    assert(PySettings.pythonInt("1__2") === None)
    assert(PySettings.pythonInt("64.0") === None)
    assert(PySettings.pythonInt("") === None)
  }
}
