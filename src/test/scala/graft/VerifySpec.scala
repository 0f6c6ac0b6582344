package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The correctness harness's own fail-loud contract (round-11 advice,
  * high): a crashing query must surface as an explicit error artifact
  * the driver's compare WILL mismatch — never silently vanish from the
  * board and let the surviving green rows read as a clean round.
  */
class VerifySpec extends SparkSpec {

  import spark.implicits._

  test("runQueries: failures write an _graft_error parquet, errors.json, and report") {
    val out = java.nio.file.Files.createTempDirectory("graft-verifyspec").toString
    val good = (s: SparkSession, dir: String) =>
      table(s, dir, "region").select(col("r_regionkey"))
    // fails at PLAN BUILD (analysis — the r11 NTZ failure mode), with a
    // message that stresses the JSON escaping (newline + quote)
    val buildFail = (_: SparkSession, _: String) =>
      throw new IllegalStateException("boom at\nplan \"build\"")
    // fails at EXECUTION (the write), not at plan build
    val execFail = (s: SparkSession, dir: String) =>
      table(s, dir, "region").select(
        when(col("r_regionkey") >= 0,
          raise_error(lit("boom at execution"))).as("x"))
    val failures = Verify.runQueries(spark,
      Seq[(String, (SparkSession, String) => DataFrame)](
        "v_good" -> good, "v_build_fail" -> buildFail,
        "v_exec_fail" -> execFail),
      sfDir, out)
    // the failure map names exactly the broken queries, in order
    assert(failures.keySet === Set("v_build_fail", "v_exec_fail"))
    assert(failures("v_build_fail").contains("IllegalStateException"))
    // the good query's parquet is its real result
    assert(spark.read.parquet(s"$out/v_good").count() === 5)
    // each failed query still produced a result parquet whose schema no
    // oracle can match — the compare records a mismatch, not an absence
    for (q <- Seq("v_build_fail", "v_exec_fail")) {
      val err = spark.read.parquet(s"$out/$q")
      assert(err.columns.toSeq === Seq("_graft_error"), q)
      assert(err.count() === 1, q)
    }
    // errors.json is valid JSON despite the newline/quote in the message
    val errJson = java.nio.file.Files.readString(
      java.nio.file.Paths.get(s"$out/errors.json"))
    assert(errJson.contains("\\n") && errJson.contains("\\\""), errJson)
    assert(!errJson.exists(c => c == '\n' || c == '\r'),
      "raw control chars would break the driver's json.load")
    graft.deleteRecursively(new java.io.File(out))
  }

  test("jsonStr escapes every control character and round-trips quotes") {
    val s = Verify.jsonStr("a\"b\\c\nd\te\u0001f")
    assert(s === "\"a\\\"b\\\\c\\nd\\te\\u0001f\"")
  }
}
