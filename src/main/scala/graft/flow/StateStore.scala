package graft.flow

import org.json4s.{DefaultFormats, Formats}
import org.json4s.jackson.Serialization

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths}
import scala.jdk.CollectionConverters._

/** H16 — file-per-record JSON state store for idempotent provisioning, the
  * analog of `dam-automation/src/dam_automation/state.py:60-101`: each record
  * is `<root>/<kind>/<name>.json`; `ensure` is the idempotent create
  * (`service.py:53-74` ensure-style ops).
  */
class StateStore(rootDir: String) {
  private implicit val formats: Formats = DefaultFormats

  private def path(kind: String, name: String): Path = {
    require(name.matches("[A-Za-z0-9_.-]+"), s"unsafe record name: $name")
    require(kind.matches("[A-Za-z0-9_.-]+"), s"unsafe record kind: $kind")
    Paths.get(rootDir, kind, s"$name.json")
  }

  def put(kind: String, name: String, record: Map[String, String]): Unit = {
    val p = path(kind, name)
    Files.createDirectories(p.getParent)
    Files.write(p, Serialization.write(record).getBytes(StandardCharsets.UTF_8))
  }

  def get(kind: String, name: String): Option[Map[String, String]] = {
    val p = path(kind, name)
    if (!Files.exists(p)) None
    else Some(Serialization.read[Map[String, String]](
      new String(Files.readAllBytes(p), StandardCharsets.UTF_8)))
  }

  def list(kind: String): Seq[String] = {
    val dir = Paths.get(rootDir, kind)
    if (!Files.isDirectory(dir)) Nil
    else Files.list(dir).iterator().asScala
      .map(_.getFileName.toString).filter(_.endsWith(".json"))
      .map(_.stripSuffix(".json")).toSeq.sorted
  }

  def delete(kind: String, name: String): Boolean = Files.deleteIfExists(path(kind, name))

  /** Idempotent create: compute and persist once, return the stored record. */
  def ensure(kind: String, name: String)(create: => Map[String, String]): Map[String, String] =
    get(kind, name).getOrElse { val r = create; put(kind, name, r); r }
}
