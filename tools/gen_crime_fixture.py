#!/usr/bin/env python3
"""Deterministic generator for the crime-shaped CSV gate fixture
(src/test/resources/fixtures/crime.csv — FIXTURES.md §B).

The committed CSV is the file this script prints; regenerate with
`python3 tools/gen_crime_fixture.py > src/test/resources/fixtures/crime.csv`.
Fixed seed, no timestamps — byte-stable across runs.

Layout mirrors the SF OpenData incident export the reference parses
positionally (MapReduceJobBase.java:40-55), including every edge the
reference's code paths handle: header row, quoted embedded commas and
doubled quotes (opencsv, DataFile.java:65-70), short/truncated rows and
unparseable dates (drop-and-log, SanFranciscoCrime.java:81,90-99), empty
category/district fields, and 03/31/2013 rows (week-of-month 6 — the
bucket-16 aliasing edge, SURVEY.md §2.3-A2).
"""
import datetime
import random

R = random.Random(20130101)

CATEGORIES = [
    "ASSAULT", "BURGLARY", "DRUG/NARCOTIC", "FRAUD", "LARCENY/THEFT",
    "MISSING PERSON", "NON-CRIMINAL", "OTHER OFFENSES", "PROSTITUTION",
    "ROBBERY", "SUSPICIOUS OCC", "TRESPASS", "VANDALISM", "VEHICLE THEFT",
    "WARRANTS",
]
# embedded commas and doubled quotes on purpose — the quote-handling edges
DESCRIPTS = {
    "ASSAULT": ["BATTERY", "BATTERY, FORMER SPOUSE", "AGGRAVATED ASSAULT"],
    "BURGLARY": ["ENTRY", "BURGLARY, UNLAWFUL ENTRY", "FORCIBLE ENTRY"],
    "DRUG/NARCOTIC": ["POSSESSION OF NARCOTICS", "SALE OF CONTROLLED SUBSTANCE"],
    "FRAUD": ["CREDIT CARD, THEFT BY USE OF", "FORGERY"],
    "LARCENY/THEFT": ["GRAND THEFT FROM LOCKED AUTO, ATTEMPTED", "PETTY THEFT",
                      "GRAND THEFT PICKPOCKET"],
    "MISSING PERSON": ["MISSING ADULT", "FOUND PERSON"],
    "NON-CRIMINAL": ["LOST PROPERTY", "AIDED CASE"],
    "OTHER OFFENSES": ["TRAFFIC VIOLATION", "VIOLATION OF RESTRAINING ORDER"],
    "PROSTITUTION": ["SOLICITS FOR ACT"],
    "ROBBERY": ["ROBBERY, ARMED", "ROBBERY OF A CHAIN STORE"],
    "SUSPICIOUS OCC": ['SUSPICIOUS "PERSON" REPORT', "INVESTIGATIVE DETENTION"],
    "TRESPASS": ["TRESPASSING"],
    "VANDALISM": ["GRAFFITI", "MALICIOUS MISCHIEF, VANDALISM OF VEHICLES"],
    "VEHICLE THEFT": ["STOLEN AUTOMOBILE", "ATTEMPTED STOLEN VEHICLE"],
    "WARRANTS": ["WARRANT ARREST", "ENROUTE TO OUTSIDE JURISDICTION"],
}
DISTRICTS = ["BAYVIEW", "CENTRAL", "INGLESIDE", "MISSION", "NORTHERN",
             "PARK", "RICHMOND", "SOUTHERN", "TARAVAL", "TENDERLOIN"]
RESOLUTIONS = ["NONE", "ARREST, BOOKED", "ARREST, CITED", "UNFOUNDED"]
DOW = ["Monday", "Tuesday", "Wednesday", "Thursday", "Friday", "Saturday",
       "Sunday"]
D0 = datetime.date(2013, 1, 1)
D1 = datetime.date(2013, 3, 31)
N_GOOD = 1500


def csv_field(s: str) -> str:
    if '"' in s or "," in s:
        return '"' + s.replace('"', '""') + '"'
    return s


def row(cols) -> str:
    return ",".join(csv_field(c) for c in cols)


def good_row(n: int, date: datetime.date) -> str:
    cat = R.choice(CATEGORIES)
    hh, mm = R.randrange(24), R.randrange(60)
    x = round(-122.5143 + R.random() * 0.146, 6)
    y = round(37.7080 + R.random() * 0.105, 6)
    return row([
        f"{n:09d}", cat, R.choice(DESCRIPTS[cat]), DOW[date.weekday()],
        f"{date.strftime('%m/%d/%Y')} {hh:02d}:{mm:02d}", f"{hh:02d}:{mm:02d}",
        R.choice(DISTRICTS), R.choice(RESOLUTIONS),
        f"{R.randrange(100, 3800, 100)} Block of FIXTURE ST",
        f"{x}", f"{y}", f"({y}, {x})",
    ])


def main():
    lines = ["IncidntNum,Category,Descript,DayOfWeek,Date,Time,PdDistrict,"
             "Resolution,Address,X,Y,Location"]
    span = (D1 - D0).days + 1
    for i in range(N_GOOD):
        # uniform over Q1-2013, plus a guaranteed cluster on 03/31 (the
        # 6th-week bucket-16 edge) and on 01/02 (duplicate-combo counting)
        if i % 150 == 0:
            date = D1
        elif i % 151 == 0:
            date = datetime.date(2013, 1, 2)
        else:
            date = D0 + datetime.timedelta(days=R.randrange(span))
        lines.append(good_row(1, date).replace("000000001", f"{i + 1:09d}", 1))
    # malformed rows the clean pipeline must DROP (and badRecords must tag):
    lines.append("990000001,short row")                          # < 7 cols
    lines.append(row(["990000002", "ASSAULT", "BATTERY", "Monday",
                      "not-a-date", "12:00", "MISSION", "NONE",
                      "100 Block", "-122.4", "37.7", "(37.7, -122.4)"]))
    lines.append(row(["990000003", "ASSAULT", "BATTERY", "Monday",
                      "2013-01-15 12:00", "12:00", "MISSION", "NONE",
                      "100 Block", "-122.4", "37.7", "(37.7, -122.4)"]))
    lines.append(row(["990000004", "", "BATTERY", "Monday",
                      "01/15/2013 12:00", "12:00", "MISSION", "NONE",
                      "100 Block", "-122.4", "37.7", "(37.7, -122.4)"]))
    lines.append(row(["990000005", "ASSAULT", "BATTERY", "Monday",
                      "01/15/2013 12:00", "12:00", "", "NONE",
                      "100 Block", "-122.4", "37.7", "(37.7, -122.4)"]))
    print("\n".join(lines))


if __name__ == "__main__":
    main()
