package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Shared local SparkSession for specs. */
trait SparkSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = graft.queries.Tables.configure(
    SparkSession.builder().master("local[4]").appName("graft-test"), "4").getOrCreate()

  def scratchDir(prefix: String): String = {
    val d = java.nio.file.Files.createTempDirectory(
      java.nio.file.Paths.get("/root/repo/target"), prefix)
    d.toFile.deleteOnExit()
    d.toString
  }

  override def afterAll(): Unit = {
    // keep the session for other suites (getOrCreate shares it)
    super.afterAll()
  }
}
