package graft.plan

/** H11 — the script-resolution matrix (ref `framework/config.py:69-78`
  * `TestCaseConfig.resolve_script`): a test case maps
  * `engine → catalog → script path` with `*` wildcards at both levels.
  *
  * Resolution order mirrors the reference exactly, including the Python
  * truthiness detail that an *empty* engine map falls through to the `*`
  * engine (`self.scripts.get(engine) or self.scripts.get("*")`), while a
  * non-empty engine map with no catalog match raises rather than falling
  * back to the `*` engine's catalogs.
  */
case class TestCase(name: String, scripts: Map[String, Map[String, String]]) {

  def resolveScript(engine: String, catalog: String): String = {
    val engineMap = scripts.get(engine).filter(_.nonEmpty)
      .orElse(scripts.get("*").filter(_.nonEmpty))
      .getOrElse(throw new NoSuchElementException(
        s"No scripts registered for engine '$engine' in test case '$name'"))
    engineMap.get(catalog).filter(_.nonEmpty).orElse(engineMap.get("*"))
      .getOrElse(throw new NoSuchElementException(
        s"No script for engine '$engine' and catalog '$catalog' in test case '$name'"))
  }
}
