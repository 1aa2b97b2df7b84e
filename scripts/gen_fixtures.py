"""Generate the committed, deterministic reference-pipeline fixtures.

Run once (python scripts/gen_fixtures.py); outputs are committed so
Spark queries and DuckDB oracles read identical bytes at identical
paths. Shapes follow FIXTURES.md §1-3 (zip CSV, enriched details
table, run-control table). All values are seeded-deterministic; all
timestamps are fixed UTC instants relative to REFERENCE_NOW.
"""

from __future__ import annotations

import os
import random
from datetime import datetime, timedelta

import pyarrow as pa
import pyarrow.parquet as pq

HERE = os.path.dirname(os.path.abspath(__file__))
FIXTURES = os.path.join(os.path.dirname(HERE), "fixtures")

# Fixed "now" used by every TTL/gate computation in oracle-checked
# queries (real pipeline code uses the actual clock).
REFERENCE_NOW = datetime(2024, 2, 1, 0, 0, 0)
TTL_DAYS = 30

STATES = [
    ("01", "Alabama", "AL"),
    ("04", "Arizona", "AZ"),
    ("06", "California", "CA"),
    ("08", "Colorado", "CO"),
    ("13", "Georgia", "GA"),
    ("17", "Illinois", "IL"),
    ("36", "New York", "NY"),
    ("48", "Texas", "TX"),
]
COUNTIES = ["Clay", "Lee", "Madison", "Polk", "St.Clair", "Washington"]
CITIES = ["Acmar", "Brookside", "Centerville", "Dora", "Easton", "Fairfield", "Georgetown"]


def gen_zip_rows() -> list[tuple[str, str, str, str, str, str]]:
    rng = random.Random(20230903)
    rows = []
    seen = set()
    # 240 regular rows, unique (zipcode, state) keys.
    while len(rows) < 240:
        fips, state, abbr = STATES[rng.randrange(len(STATES))]
        zipcode = f"{rng.randrange(501, 99951):05d}"
        if (zipcode, abbr) in seen:
            continue
        seen.add((zipcode, abbr))
        rows.append(
            (fips, state, abbr, zipcode, COUNTIES[rng.randrange(len(COUNTIES))],
             CITIES[rng.randrange(len(CITIES))])
        )
    # 12 cross-state duplicate zips (same zipcode, two states) — the
    # composite-key rationale: zip codes cross state borders.
    for i in range(12):
        zipcode = rows[i][3]
        donor = rows[i]
        fips, state, abbr = STATES[(STATES.index((donor[0], donor[1], donor[2])) + 1) % len(STATES)]
        if (zipcode, abbr) in seen:
            continue
        seen.add((zipcode, abbr))
        rows.append((fips, state, abbr, zipcode, COUNTIES[i % len(COUNTIES)], CITIES[i % len(CITIES)]))
    # Golden row from the reference's own CSV test.
    if ("35004", "AL") not in seen:
        rows.append(("01", "Alabama", "AL", "35004", "St.Clair", "Acmar"))
    # A leading-zero zip (schema must keep strings).
    if ("00501", "NY") not in seen:
        rows.append(("36", "New York", "NY", "00501", "Suffolk", "Holtsville"))
    return rows


def write_zip_csv(rows, path, extra_exact_dups: int = 0) -> None:
    with open(path, "w", encoding="utf-8") as f:
        f.write("state_fips,state,state_abbr,zipcode,county,city\n")
        for r in rows:
            f.write(",".join(r) + "\n")
        # exact (zipcode,state) duplicate rows — the fail-fast case
        for r in rows[:extra_exact_dups]:
            f.write(",".join((r[0], r[1], r[2], r[3], "DupCounty", "DupCity")) + "\n")


def write_zip_xml(rows, path) -> None:
    """XML twin of the zip CSV (reference IFileDataHandler anticipates
    an XML handler, Core/Interfaces/IFileDataHandler.cs:7-11). One
    <record> element per row; values are machine-generated [A-Za-z0-9. ]
    strings so no escaping is needed and the DuckDB regexp oracle is
    exact."""
    with open(path, "w", encoding="utf-8") as f:
        f.write("<zipcodes>\n")
        for fips, state, abbr, zipcode, county, city in rows:
            f.write(
                "  <record>"
                f"<state_fips>{fips}</state_fips>"
                f"<state>{state}</state>"
                f"<state_abbr>{abbr}</state_abbr>"
                f"<zipcode>{zipcode}</zipcode>"
                f"<county>{county}</county>"
                f"<city>{city}</city>"
                "</record>\n"
            )
        f.write("</zipcodes>\n")


FIXED_WIDTHS = (("state_fips", 2), ("state", 12), ("state_abbr", 2),
                ("zipcode", 5), ("county", 12), ("city", 12))


def write_zip_fixed(rows, path) -> None:
    """Fixed-width twin of the zip CSV (mainframe-style layout) for the
    custom Python DataSource plugin (sources/plugin.py) — the Spark-4
    counterpart of the reference's pluggable IFileDataHandler slot
    (Core/Interfaces/IFileDataHandler.cs:7-11). Fields are left
    justified, space padded, widths per FIXED_WIDTHS."""
    widths = [w for _, w in FIXED_WIDTHS]
    with open(path, "w", encoding="utf-8") as f:
        for r in rows:
            assert all(len(v) <= w for v, w in zip(r, widths)), r
            f.write("".join(v.ljust(w) for v, w in zip(r, widths)) + "\n")


def write_zip_orc(rows, path) -> None:
    """ORC twin of the zip CSV (all-string columns, same rows) so the
    ORC scan is oracle-checkable: DuckDB cannot read ORC, so the
    oracle reads the CSV twin while Spark reads these bytes."""
    import pyarrow.orc as po

    cols = ["state_fips", "state", "state_abbr", "zipcode", "county", "city"]
    arrays = [pa.array([r[i] for r in rows], pa.string()) for i in range(len(cols))]
    po.write_table(pa.table(dict(zip(cols, arrays))), path)


def deterministic_enrichment(zipcode: str):
    """Pure function zip -> (lat, lng, elevation, timezone); mirrors the
    deterministic mock client in operators/enrich.py."""
    h = int(zipcode) if zipcode.isdigit() else sum(ord(c) for c in zipcode)
    lat = round(24.0 + (h % 2500) / 100.0, 4)
    lng = round(-125.0 + (h % 5800) / 100.0, 4)
    elevation = round((h % 4400) / 10.0, 1)
    tz = ["Eastern Standard Time", "Central Daylight Time", "Mountain Standard Time",
          "Pacific Standard Time"][h % 4]
    return lat, lng, elevation, tz


def gen_details(zip_rows):
    """Enriched target-table state covering every gate/filter case:
    complete+fresh, complete+stale, incomplete, and absent rows."""
    rng = random.Random(7)
    cols = {k: [] for k in (
        "CompositeKey ZipCode State StateCode County City Latitude Longitude "
        "Elevation Timezone CreationDateUtc LastModifiedDateUtc ImportId".split()
    )}
    for i, (fips, state, abbr, zipcode, county, city) in enumerate(zip_rows):
        bucket = i % 4
        if bucket == 3:
            continue  # absent from target -> must be (re)processed
        lat, lng, elev, tz = deterministic_enrichment(zipcode)
        if bucket == 1:  # incomplete enrichment (elevation failed)
            elev = None
        if bucket == 2:  # stale (older than TTL)
            modified = REFERENCE_NOW - timedelta(days=TTL_DAYS + 10 + (i % 20))
        else:
            modified = REFERENCE_NOW - timedelta(days=1 + (i % 20))
        created = modified - timedelta(days=100)
        cols["CompositeKey"].append(f"{zipcode}_{abbr}")
        cols["ZipCode"].append(zipcode)
        cols["State"].append(state)
        cols["StateCode"].append(abbr)
        cols["County"].append(county)
        cols["City"].append(city)
        cols["Latitude"].append(lat)
        cols["Longitude"].append(lng)
        cols["Elevation"].append(elev)
        cols["Timezone"].append(tz)
        cols["CreationDateUtc"].append(created)
        cols["LastModifiedDateUtc"].append(modified)
        cols["ImportId"].append(1 + (i % 3))
    schema = pa.schema(
        [
            ("CompositeKey", pa.string()),
            ("ZipCode", pa.string()),
            ("State", pa.string()),
            ("StateCode", pa.string()),
            ("County", pa.string()),
            ("City", pa.string()),
            ("Latitude", pa.float64()),
            ("Longitude", pa.float64()),
            ("Elevation", pa.float64()),
            ("Timezone", pa.string()),
            ("CreationDateUtc", pa.timestamp("us")),
            ("LastModifiedDateUtc", pa.timestamp("us")),
            ("ImportId", pa.int32()),
        ]
    )
    return pa.table(cols, schema=schema)


# Checksums used by gate fixtures and tests (not real file hashes —
# distinct sentinel values the control table stores).
CS_ACTIVE = "aa" * 32      # import currently running (IsActive)
CS_FRESH = "bb" * 32       # completed < TTL days ago
CS_STALE = "cc" * 32       # completed > TTL days ago
CS_ERRORED = "dd" * 32     # errored run (EndDateTimeUtc set, not active)
CS_UNKNOWN = "ee" * 32     # never seen


def gen_imports():
    rows = [
        # Id, FileName, FileChecksum, IsActive, Status, start, end
        (1, "geo_data.csv", CS_STALE, False, "Complete",
         REFERENCE_NOW - timedelta(days=45), REFERENCE_NOW - timedelta(days=45, hours=-1)),
        (2, "geo_data.csv", CS_FRESH, False, "Complete",
         REFERENCE_NOW - timedelta(days=3), REFERENCE_NOW - timedelta(days=3, hours=-1)),
        (3, "geo_data.csv", CS_ACTIVE, True, "Running",
         REFERENCE_NOW - timedelta(hours=2), None),
        (4, "geo_data.csv", CS_ERRORED, False, "Error",
         REFERENCE_NOW - timedelta(days=2), REFERENCE_NOW - timedelta(days=2, hours=-1)),
    ]
    schema = pa.schema(
        [
            ("Id", pa.int32()),
            ("FileName", pa.string()),
            ("FileChecksum", pa.string()),
            ("IsActive", pa.bool_()),
            ("Status", pa.string()),
            ("ImportStartTimeUtc", pa.timestamp("us")),
            ("EndDateTimeUtc", pa.timestamp("us")),
        ]
    )
    cols = list(zip(*rows))
    return pa.table({f.name: list(c) for f, c in zip(schema, cols)}, schema=schema)


def write_api_responses(zip_rows, path) -> None:
    """Geocode-API-response-shaped JSONL (one response per zip key):
    nested results[0].geometry.location.{lat,lng} + elevation +
    timezone.timeZoneName, with the reference's error-in-band channel
    (GoogleApiResponseBase.ErrorMessage — errors are data, not
    exceptions) every 11th row. Feeds json_scan / extract_nested_json."""
    import json

    with open(path, "w", encoding="utf-8") as f:
        for i, (fips, state, abbr, zipcode, county, city) in enumerate(zip_rows):
            key = f"{zipcode}_{abbr}"
            if i % 11 == 7:
                obj = {
                    "composite_key": key,
                    "status": "ZERO_RESULTS",
                    "error_message": "no geocode result for address",
                    "results": [],
                    "timezone": None,
                }
            else:
                lat, lng, elev, tz = deterministic_enrichment(zipcode)
                obj = {
                    "composite_key": key,
                    "status": "OK",
                    "error_message": None,
                    "results": [
                        {"geometry": {"location": {"lat": lat, "lng": lng}},
                         "elevation": elev}
                    ],
                    "timezone": {"timeZoneName": tz},
                }
            f.write(json.dumps(obj) + "\n")


def main() -> None:
    os.makedirs(FIXTURES, exist_ok=True)
    rows = gen_zip_rows()
    write_zip_csv(rows, os.path.join(FIXTURES, "zip_codes.csv"))
    write_zip_csv(rows, os.path.join(FIXTURES, "zip_codes_with_dups.csv"), extra_exact_dups=8)
    pq.write_table(gen_details(rows), os.path.join(FIXTURES, "zip_code_details.parquet"))
    pq.write_table(gen_imports(), os.path.join(FIXTURES, "etl_bus_imports.parquet"))
    write_api_responses(rows, os.path.join(FIXTURES, "api_responses.jsonl"))
    write_zip_xml(rows, os.path.join(FIXTURES, "zip_codes.xml"))
    write_zip_orc(rows, os.path.join(FIXTURES, "zip_codes.orc"))
    write_zip_fixed(rows, os.path.join(FIXTURES, "zip_codes_fixed.txt"))
    write_pii_docs(os.path.join(FIXTURES, "pii_docs.parquet"))
    write_web_docs(os.path.join(FIXTURES, "web_docs.parquet"))
    print(f"wrote fixtures to {FIXTURES}: {len(rows)} zip rows")




def write_pii_docs(path) -> None:
    """Documents salted with synthetic PII (emails, phone numbers,
    SSN-shaped ids, IPv4s) for the scrubbing operator — the testdata
    documents table is clean word soup, so redaction needs its own
    fixture. All PII here is generated from a fixed seed and matches
    no real person by construction."""
    rng = random.Random(77)
    words = ["the", "data", "spark", "batch", "merge", "join", "row",
             "table", "stream", "window", "filter", "key", "value"]
    names = ["alice", "bob", "carol", "dan", "erin", "frank"]
    domains = ["example.com", "test.org", "mail.invalid"]
    rows = []
    for doc_id in range(200):
        toks = [rng.choice(words) for _ in range(rng.randint(8, 25))]
        # deterministic sprinkling: each kind appears in ~1/3 of docs
        if doc_id % 3 == 0:
            toks.insert(rng.randrange(len(toks)),
                        f"{rng.choice(names)}{rng.randint(1, 99)}@{rng.choice(domains)}")
        if doc_id % 3 == 1:
            toks.insert(rng.randrange(len(toks)),
                        f"{rng.randint(200, 989)}-{rng.randint(200, 989)}-{rng.randint(1000, 9999)}")
        if doc_id % 5 == 2:
            toks.insert(rng.randrange(len(toks)),
                        f"{rng.randint(100, 899)}-{rng.randint(10, 89)}-{rng.randint(1000, 9999)}")
        if doc_id % 7 == 3:
            toks.insert(rng.randrange(len(toks)),
                        f"{rng.randint(1, 254)}.{rng.randint(0, 254)}.{rng.randint(0, 254)}.{rng.randint(1, 254)}")
        rows.append((doc_id, " ".join(toks)))
    pq.write_table(
        pa.table(
            {"doc_id": pa.array([r[0] for r in rows], pa.int64()),
             "text": pa.array([r[1] for r in rows], pa.string())}
        ),
        path,
    )


def write_web_docs(path) -> None:
    """Web-shaped documents for the URL-extraction and paragraph-dedup
    operators: multi-paragraph text (\\n\\n separated) where every doc
    carries a site header/footer paragraph shared across its "site"
    (boilerplate by construction) around 1-4 unique body paragraphs,
    some salted with http(s) URLs from a skewed domain list. The
    testdata documents table is single-paragraph word soup with no
    URLs, so these two operators need their own fixture. All URLs use
    reserved example/invalid domains."""
    rng = random.Random(4242)
    words = ["the", "data", "spark", "batch", "merge", "join", "row",
             "table", "stream", "window", "filter", "key", "value",
             "scan", "query", "page", "site", "link"]
    headers = [
        "welcome to site alpha all rights reserved",
        "site beta navigation home about contact",
        "gamma portal member login register help",
    ]
    footers = [
        "copyright site alpha terms privacy",
        "site beta footer sitemap feedback",
        "gamma portal powered by gamma engine",
    ]
    # Zipf-ish skew: example.com dominates, tail domains are rare.
    domains = (["example.com"] * 8 + ["example.org"] * 4 + ["example.net"] * 2
               + ["test.invalid", "docs.example.edu", "cdn.example.io"])
    rows = []
    for doc_id in range(150):
        site = rng.randrange(3)
        paras = [headers[site]]
        for _ in range(rng.randint(1, 4)):
            toks = [rng.choice(words) for _ in range(rng.randint(6, 18))]
            if rng.random() < 0.6:
                d = rng.choice(domains)
                scheme = "https" if rng.random() < 0.8 else "http"
                toks.insert(rng.randrange(len(toks)),
                            f"{scheme}://{d}/p{rng.randint(1, 500)}")
            paras.append(" ".join(toks))
        paras.append(footers[site])
        rows.append((doc_id, "\n\n".join(paras)))
    pq.write_table(
        pa.table(
            {"doc_id": pa.array([r[0] for r in rows], pa.int64()),
             "text": pa.array([r[1] for r in rows], pa.string())}
        ),
        path,
    )


if __name__ == "__main__":
    main()
