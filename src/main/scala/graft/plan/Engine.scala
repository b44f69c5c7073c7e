package graft.plan

import org.apache.spark.sql.SparkSession

/** One executed statement's captured output (H4; the reference's
  * `StatementResult`, `framework/engines/base.py:16-20`): row-oriented maps,
  * capped at `maxResultRows` like the reference's `df.take(200)`.
  */
case class StatementResult(
    statement: String,
    rows: Seq[Map[String, Any]],
    rowcount: Option[Long])

/** Engine adapter boundary (H12): render → split → execute. */
trait EngineAdapter {
  def name: String
  def runScript(template: String, vars: Map[String, Any]): Seq[StatementResult] = {
    Sql.split(Sql.render(template, vars)).map(execute)
  }
  def execute(statement: String): StatementResult
}

/** Spark SQL adapter (`framework/engines/spark.py:59-73`): capture take(200)
  * for reads; collect() non-capturing statements to force their effects.
  */
class SparkSqlEngine(spark: SparkSession, maxResultRows: Int = 200) extends EngineAdapter {
  override val name = "spark"
  override def execute(statement: String): StatementResult = {
    val df = spark.sql(statement)
    if (Sql.capturesRows(statement)) {
      val rows = df.take(maxResultRows).map(r =>
        r.schema.fieldNames.zipWithIndex.map { case (f, i) => f -> r.get(i) }.toMap)
      StatementResult(statement, rows.toSeq, None)
    } else {
      df.collect()
      StatementResult(statement, Nil, None)
    }
  }
}

/** H12 — per-(engine, catalog) adapter cache (`framework/engines/base.py:81-124`). */
class EngineFactory(spark: SparkSession) {
  private val cache = scala.collection.mutable.Map[(String, String), EngineAdapter]()
  def get(engine: String, catalog: String): EngineAdapter = synchronized {
    cache.getOrElseUpdate((engine, catalog), engine match {
      case "spark" => new SparkSqlEngine(spark)
      case other => throw new IllegalArgumentException(s"unknown engine: $other")
    })
  }
  def size: Int = cache.size
}
