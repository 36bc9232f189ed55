package graft

import java.nio.file.{Files, Paths}
import java.util.{Calendar, Locale}
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.CrimePipeline

/** Differential test of the full reference pipeline on a crime-shaped CSV
  * fixture (FIXTURES.md §B): the expected values are computed by an
  * independent plain-Scala implementation using java.util.Calendar — the
  * same ground truth the reference's awk script provided (SURVEY §5.1). */
class CrimePipelineSpec extends AnyFunSuite {
  import TestSpark.spark

  // fixture: header, quoted embedded commas, short row, bad date,
  // 2013-03-31 (Sunday, week-of-month 6 -> bucket 16), duplicate combos
  private val rows = Seq(
    """IncidntNum,Category,Descript,DayOfWeek,Date,Time,PdDistrict,Resolution,Address,X,Y,Location""",
    """001,LARCENY/THEFT,"GRAND THEFT FROM LOCKED AUTO, ATTEMPTED",Wednesday,01/02/2013 10:00,10:00,MISSION,NONE,800 Block,-122.4,37.7,"(37.7, -122.4)"""",
    """002,LARCENY/THEFT,PETTY THEFT,Wednesday,01/02/2013 11:00,11:00,MISSION,NONE,900 Block,-122.4,37.7,"(37.7, -122.4)"""",
    """003,ASSAULT,BATTERY,Thursday,01/10/2013 20:00,20:00,SOUTHERN,ARREST,100 Block,-122.4,37.7,"(37.7, -122.4)"""",
    """004,ASSAULT,BATTERY,Sunday,03/31/2013 02:00,02:00,TENDERLOIN,NONE,200 Block,-122.4,37.7,"(37.7, -122.4)"""",
    """005,VANDALISM,GRAFFITI,Friday,02/15/2013 09:30,09:30,RICHMOND,NONE,300 Block,-122.4,37.7,"(37.7, -122.4)"""",
    """006,short row""",
    """007,BURGLARY,ENTRY,Monday,not-a-date,12:00,MISSION,NONE,400 Block,-122.4,37.7,"(37.7, -122.4)"""")

  private case class Incident(category: String, district: String, date: String)

  /** Independent reimplementation: tiny quote-aware CSV split + Calendar. */
  private lazy val expected: Seq[Incident] = rows.drop(1).flatMap { line =>
    val cols = splitCsv(line)
    if (cols.length < 7) None
    else {
      val d = cols(4).split(" ").head
      val parts = d.split("/")
      if (parts.length != 3 || parts.exists(p => !p.forall(_.isDigit))) None
      else Some(Incident(cols(1), cols(6), d))
    }
  }

  private def splitCsv(line: String): Array[String] = {
    val out = scala.collection.mutable.ArrayBuffer[String]()
    val cur = new StringBuilder
    var inQ = false
    line.foreach {
      case '"' => inQ = !inQ
      case ',' if !inQ => out += cur.toString; cur.clear()
      case c => cur += c
    }
    out += cur.toString
    out.toArray
  }

  private def bucketOf(mmddyyyy: String): Int = {
    val Array(m, d, y) = mmddyyyy.split("/").map(_.toInt)
    val cal = Calendar.getInstance(Locale.US)
    cal.clear(); cal.set(y, m - 1, d)
    cal.get(Calendar.MONTH) * 5 + cal.get(Calendar.WEEK_OF_MONTH)
  }

  private lazy val csvPath = {
    val p = Paths.get("/tmp/graft_crime_fixture.csv")
    Files.write(p, rows.mkString("\n").getBytes("UTF-8"))
    p.toString
  }

  test("P3/P4: header, short and bad-date rows dropped; quoted commas survive") {
    val crime = CrimePipeline.readCrimeCsv(spark, csvPath)
    assert(crime.count() == expected.length)   // 5 good rows
    val descripts = crime.select("Descript").collect().map(_.getString(0)).toSet
    assert(descripts.contains("GRAND THEFT FROM LOCKED AUTO, ATTEMPTED"))
  }

  test("P4 side channel: dropped rows are accounted for, with reasons") {
    val tagged = CrimePipeline.readCrimeCsvTagged(spark, csvPath)
    val bad = CrimePipeline.badRecords(spark, csvPath)
    // conservation: every data row is exactly clean or dropped
    assert(tagged.count() == rows.length - 1) // header excluded
    assert(CrimePipeline.readCrimeCsv(spark, csvPath).count() + bad.count()
      == rows.length - 1)
    val reasons = bad.collect()
      .map(r => r.getString(r.fieldIndex("IncidntNum")) ->
        r.getString(r.fieldIndex("bad_reason"))).toMap
    assert(reasons == Map("006" -> "missing_district", "007" -> "bad_date"))
    // runAll writes the audit next to the data outputs
    val out = "/tmp/graft_crime_badrec"
    CrimePipeline.runAll(spark, csvPath, out)
    val audit = spark.read.option("sep", "\t").csv(s"$out/badrecords")
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(audit == reasons)
  }

  test("A2: weekly histograms match the Calendar-based oracle, incl. bucket 16") {
    val got = CrimePipeline.weeklyCounts(
        CrimePipeline.readCrimeCsv(spark, csvPath), "Category")
      .collect().map(r => r.getString(0) -> (1 to 17).map(r.getLong)).toMap
    val want = expected.groupBy(_.category).map { case (cat, incs) =>
      val counts = Array.fill(17)(0L)
      incs.foreach(i => counts(bucketOf(i.date)) += 1)
      cat -> counts.toSeq
    }
    assert(got == want)
    // the aliasing edge: 03/31/2013 must land in bucket 16
    assert(got("ASSAULT")(16) == 1L)
  }

  test("A3/A6: daily triplets carry 0-based sorted-rank dictionary ids") {
    val crime = CrimePipeline.readCrimeCsv(spark, csvPath)
    val got = CrimePipeline.dailyTriplets(crime).collect()
      .map(r => (r.getString(0), r.getInt(1), r.getInt(2)) -> r.getLong(3)).toMap
    val cats = expected.map(_.category).distinct.sorted.zipWithIndex.toMap
    val dists = expected.map(_.district).distinct.sorted.zipWithIndex.toMap
    val want = expected.groupBy(i => (i.date, i.category, i.district))
      .map { case ((d, c, t), is) =>
        val Array(m, dd, y) = d.split("/")
        (s"$y/$m/$dd", cats(c), dists(t)) -> is.length.toLong
      }
    assert(got == want)
    assert(got(("2013/01/02", cats("LARCENY/THEFT"), dists("MISSION"))) == 2L)
  }

  test("golden: pipeline outputs are byte-stable against pinned goldens") {
    val out = "/tmp/graft_crime_golden"
    CrimePipeline.runAll(spark, csvPath, out)
    def lines(dir: String): Seq[String] =
      spark.read.text(dir).collect().map(_.getString(0)).sorted.toSeq
    def golden(name: String): Seq[String] =
      new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(s"src/test/resources/golden/$name.tsv")), "UTF-8")
        .linesIterator.filter(_.nonEmpty).toSeq.sorted
    assert(lines(s"$out/bycategory") == golden("bycategory"))
    assert(lines(s"$out/bydistrict") == golden("bydistrict"))
    assert(lines(s"$out/star") == golden("star"))
  }

  test("S4: TSV sink emits the part-00000 row shape") {
    val out = "/tmp/graft_crime_out"
    CrimePipeline.runAll(spark, csvPath, out)
    val lines = spark.read.text(s"$out/bycategory").collect().map(_.getString(0))
    assert(lines.forall(_.matches("""[^\t]+\t\d+(,\d+){16}""")))
    val star = spark.read.text(s"$out/star").collect().map(_.getString(0))
    assert(star.forall(_.matches("""\d{4}/\d{2}/\d{2}\t\d+,\d+,\d+""")))
  }
}
