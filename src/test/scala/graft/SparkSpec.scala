package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared local session for every suite (getOrCreate reuses one JVM-wide
  * session, so the whole test run pays SparkContext startup once).
  */
trait SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = GraftSession.local(cpus = 4, appName = "graft-test")

  /** sf0.001 fixture dir (150 customers, ~6k lineitems). */
  val sfDir = "/root/testdata/sf0.001"

  /** Directory holding the pizza-corpus CSV test resources. */
  lazy val pizzaDir: String =
    getClass.getResource("/pizza").getPath

  lazy val pizzaDd: graft.catalog.DataDictionary =
    graft.catalog.DataDictionary.fromFile(
      getClass.getResource("/pizza_dd.json").getPath)
}
