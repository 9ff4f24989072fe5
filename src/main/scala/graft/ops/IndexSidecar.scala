package graft.ops

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

/** Shared `_graft_index.json` sidecar persistence for the persistable
  * indexes ([[IvfPqIndex]], [[MinHashIndex]]): one writer and one
  * field-extraction parser instead of two hand-rolled copies drifting
  * apart. The parser accepts exactly what [[write]]rs emit (flat
  * builder-controlled JSON) — not general JSON.
  *
  * LOCAL-FILESYSTEM ONLY: the sidecar goes through `java.nio` (driver-side
  * model state, tiny), so `path` must be a local path — an object-store
  * URI (s3a://…) would be accepted by the DataFrame legs but mangled here.
  * Both index writers inherit this contract and document it.
  */
private[ops] object IndexSidecar {

  val FileName = "_graft_index.json"

  def write(path: String, json: String): Unit =
    Files.write(Paths.get(path, FileName),
      json.getBytes(StandardCharsets.UTF_8))

  def readJson(path: String): String =
    new String(Files.readAllBytes(Paths.get(path, FileName)),
      StandardCharsets.UTF_8)

  /** The raw substring after `"name":` — callers slice their typed value
    * off the front. Throws with the offending path on a missing field.
    */
  def field(json: String, name: String, path: String): String = {
    val i = json.indexOf("\"" + name + "\":")
    require(i >= 0, s"missing field $name in $path/$FileName")
    json.substring(i + name.length + 3)
  }

  def intField(json: String, name: String, path: String): Int =
    field(json, name, path).takeWhile(_.isDigit).toInt
}
