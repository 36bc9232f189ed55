package graft

import java.sql.Date
import java.util.{Calendar, Locale}
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.functions.GraftFunctions._

/** week_of_month must reproduce java.util.Calendar.WEEK_OF_MONTH under the
  * US locale — the semantics the reference's weekly buckets are built on
  * (/root/reference/.../SanFranciscoCrime.java:178-180). Exhaustive check
  * over four decades of days rather than a sampled property: the domain is
  * small enough to enumerate. */
class WeekOfMonthSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  private def calendarWom(d: java.time.LocalDate): Int = {
    val cal = Calendar.getInstance(Locale.US)
    cal.clear()
    cal.set(d.getYear, d.getMonthValue - 1, d.getDayOfMonth)
    cal.get(Calendar.WEEK_OF_MONTH)
  }

  test("matches Calendar.WEEK_OF_MONTH (US) for every day 1990-2030") {
    val start = java.time.LocalDate.of(1990, 1, 1)
    val days = (0L until 14975L).map(start.plusDays) // through 2030-12-31
    val expected = days.map(d => d.toString -> calendarWom(d)).toMap
    val got = days.map(d => Date.valueOf(d)).toDF("d")
      .select(col("d"), week_of_month(col("d")).as("w"))
      .collect()
      .map(r => r.getDate(0).toString -> r.getInt(1))
    assert(got.length == expected.size)
    val bad = got.filter { case (d, w) => expected(d) != w }
    assert(bad.isEmpty, s"mismatches: ${bad.take(5).mkString(", ")}")
  }

  test("bucket aliasing edge: 2013-03-31 (week 6) aliases April week 1") {
    val df = Seq(Date.valueOf("2013-03-31"), Date.valueOf("2013-04-01")).toDF("d")
      .select(month_week_bucket(col("d")).as("b"))
    val buckets = df.collect().map(_.getInt(0)).toSeq
    // month*5+week aliasing preserved knowingly (SURVEY §2.3-A2): both = 16
    assert(buckets == Seq(16, 16))
  }
}
