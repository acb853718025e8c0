package graft.functions

import org.apache.spark.sql.{Column, Row}
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** P8–P11 boundary + property coverage (SURVEY.md §5: age=40 branch point,
  * pulse == threshold·limit inclusivity, `.5` rounding). The Scala model in
  * each test is the reference's own closure logic
  * (reference `IOTSparkStreaming.scala:97,119-140`).
  */
class HealthFunctionsSpec extends SparkSpec {

  private def eval(c: Column): Any = {
    import spark.implicits._
    Seq(1).toDF("x").select(c.as("v")).head().get(0)
  }

  test("roundHalfUp matches (x + 0.5).toInt at .5 boundaries") {
    for (x <- Seq(0.0, 0.4999, 0.5, 1.5, 2.5, 99.5, 100.49, 119.5))
      assert(eval(HealthFunctions.roundHalfUp(lit(x))) == (x + 0.5).toInt,
        s"x=$x")
  }

  test("roundHalfUp property: agrees with the reference model on a seeded sweep") {
    val rnd = new scala.util.Random(42)
    val xs = Seq.fill(200)(rnd.nextDouble() * 250)
    import spark.implicits._
    val got = xs.toDF("x")
      .select(HealthFunctions.roundHalfUp(col("x")).as("r"))
      .collect().map(_.getInt(0)).toSeq
    assert(got == xs.map(x => (x + 0.5).toInt))
  }

  test("maxPulseLimit branches exactly at age 40") {
    assert(eval(HealthFunctions.maxPulseLimit(lit(39))) == 220.0 - 39)
    assert(eval(HealthFunctions.maxPulseLimit(lit(40))) == 208.0 - 0.75 * 40)
    assert(eval(HealthFunctions.maxPulseLimit(lit(41))) == 208.0 - 0.75 * 41)
  }

  test("warning threshold comparison is inclusive (pulse == 0.95*limit alerts)") {
    // age 30 -> limit 190.0; 0.95*190 = 180.5 exactly representable? use the
    // exact double product the engine computes.
    val limit = 220.0 - 30
    val exact = 0.95 * limit
    assert(eval(HealthFunctions.warning(lit(exact), lit(30), lit("NORMAL")))
      == "simple")
    assert(eval(HealthFunctions.warning(lit(exact - 1e-9), lit(30), lit("NORMAL")))
      == "no-use")
  }

  test("warning escalates on the reference's hypertension categories") {
    for (cat <- HealthFunctions.CriticalBpCats)
      assert(eval(HealthFunctions.warning(lit(250.0), lit(30), lit(cat)))
        == "critical", cat)
    assert(eval(HealthFunctions.warning(lit(250.0), lit(30), lit("NORMAL")))
      == "simple")
  }

  test("warning honors the 0.85 variant threshold (test.scala divergence, SURVEY §2.9.1)") {
    // age 30, limit 190: pulse 170 is >= 0.85*190=161.5 but < 0.95*190=180.5
    assert(eval(HealthFunctions.warning(lit(170.0), lit(30), lit("NORMAL"))) == "no-use")
    assert(eval(HealthFunctions.warning(lit(170.0), lit(30), lit("NORMAL"),
      threshold = 0.85)) == "simple")
  }

  test("warning property: classifier agrees with the reference closure on a seeded sweep") {
    val rnd = new scala.util.Random(7)
    val rows = Seq.fill(300)((rnd.nextDouble() * 250, 18 + rnd.nextInt(60),
      Seq("NORMAL", "HYP_1", "HYP_2", "HYP_CR", "ELEV")(rnd.nextInt(5))))
    def model(pulse: Double, age: Int, cat: String): String = {
      val limit = if (age < 40) 220.0 - age else 208 - 0.75 * age
      if (pulse >= 0.95 * limit) {
        if (List("HYP_1", "HYP_2", "HYP_CR").contains(cat)) "critical" else "simple"
      } else "no-use"
    }
    import spark.implicits._
    val got = rows.toDF("pulse", "age", "cat")
      .select(HealthFunctions.warning(col("pulse"), col("age"), col("cat")).as("w"))
      .collect().map(_.getString(0)).toSeq
    assert(got == rows.map((model _).tupled))
  }
}
