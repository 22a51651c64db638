"""GTFS feed source: zip-of-CSV → typed DataFrames.

Parity map (SURVEY.md §2.A/§2.C):
  * A1 HTTP mirror      — ``download_feed`` (conditional GET, If-Modified-
    Since; /root/reference/download.sh:9-29, curl-mirror semantics).
  * A2 zip extraction   — ``extract_feed`` (/root/reference/import.sh:18-30).
  * B1 tolerant parse   — PERMISSIVE csv read with _corrupt_record
    (gtfsclean --fix-zip, /root/reference/import.sh:50-52).
  * C1 typed CSV scan   — one reader per GTFS file with a declared schema
    (gtfs-to-sql per-file converters, /root/reference/import.sh:124,130).
  * C2 casts + C3 GTFS-time parse + C4 lang lower-casing
    (/root/reference/import.sh:124-125).

The driver-side steps (download/unzip/digest) stay driver-side exactly as
in the reference — file bytes precede any DataFrame. Executors read the
extracted CSV directory in parallel (multiLine=False keeps the scan
splittable at scale).
"""

from __future__ import annotations

import os
import shutil
import urllib.request
import zipfile
from email.utils import formatdate, parsedate_to_datetime

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .. import schemas
from ..functions.gtfs_time import gtfs_date, gtfs_time_to_secs


def download_feed(
    url: str,
    dest_path: str,
    user_agent: str = "postgis-gtfs-importer-spark",
    timeout: int = 60,
) -> bool:
    """Conditional mirror of the feed zip (A1). Returns True if modified.

    Full curl-mirror parity (/root/reference/download.sh:25-29; tool
    installed Dockerfile:52-58): sends If-Modified-Since from the
    existing file's mtime AND If-None-Match from the ETag remembered in a
    ``<dest>.etag`` sidecar (curl-mirror's --etag-save/--etag-compare).
    304 → keep the existing copy.
    """
    etag_path = dest_path + ".etag"
    headers = {"User-Agent": user_agent}
    if os.path.exists(dest_path):
        headers["If-Modified-Since"] = formatdate(os.path.getmtime(dest_path), usegmt=True)
        if os.path.exists(etag_path):
            with open(etag_path) as f:
                etag = f.read().strip()
            if etag:
                headers["If-None-Match"] = etag
    req = urllib.request.Request(url, headers=headers)
    try:
        with urllib.request.urlopen(req, timeout=timeout) as resp:
            tmp = dest_path + ".part"
            with open(tmp, "wb") as f:
                shutil.copyfileobj(resp, f)
            os.replace(tmp, dest_path)
            lm = resp.headers.get("Last-Modified")
            if lm:
                ts = parsedate_to_datetime(lm).timestamp()
                os.utime(dest_path, (ts, ts))
            new_etag = resp.headers.get("ETag")
            if new_etag:
                with open(etag_path, "w") as f:
                    f.write(new_etag)
            elif os.path.exists(etag_path):
                os.remove(etag_path)  # server stopped sending ETags
            return True
    except urllib.error.HTTPError as e:
        if e.code == 304:
            return False
        raise


def extract_feed(zip_path: str, extract_dir: str) -> list[str]:
    """Unzip, wiping any previous extraction (A2, import.sh:18-30).

    Returns the list of extracted ``*.txt`` table names.
    """
    if os.path.exists(extract_dir):
        shutil.rmtree(extract_dir)
    os.makedirs(extract_dir)
    with zipfile.ZipFile(zip_path) as z:
        z.extractall(extract_dir)
    names = sorted(
        os.path.splitext(f)[0]
        for f in os.listdir(extract_dir)
        if f.endswith(".txt")
    )
    if not names:
        # Real feeds routinely zip the files under a subdirectory
        # ('gtfs/stops.txt'); without this hoist the extraction would
        # silently yield an EMPTY feed and the pipeline would publish an
        # empty snapshot with no error. Hoist from the subdirectory that
        # contains the most .txt members (ties: lexicographic).
        best_dir, best_files = None, []
        for root, _dirs, files in os.walk(extract_dir):
            txt = sorted(f for f in files if f.endswith(".txt"))
            if len(txt) > len(best_files):
                best_dir, best_files = root, txt
        if best_dir and best_dir != extract_dir:
            for f in best_files:
                os.replace(
                    os.path.join(best_dir, f), os.path.join(extract_dir, f)
                )
            names = sorted(os.path.splitext(f)[0] for f in best_files)
    return names


def _read_header(path: str) -> list[str]:
    """First CSV line, driver-side: column names AS THE FILE ORDERS THEM.

    GTFS files may present any subset of the spec's columns in any order
    (the spec mandates names, not positions) — the scan schema must
    therefore be built from the file's own header, not the spec. BOM
    stripped (utf-8-sig), quoting honored — the B1 tolerant-parse
    front-line (gtfsclean --fix-zip, /root/reference/import.sh:50-52).
    """
    import csv

    with open(path, encoding="utf-8-sig", newline="") as f:
        try:
            return [c.strip() for c in next(csv.reader(f))]
        except StopIteration:
            # zero-byte file (real feeds ship empty optional files):
            # report no columns; read_feed treats it as absent rather
            # than crashing the tolerant-parse front-line with a bare
            # StopIteration
            return []


def read_raw(spark: SparkSession, feed_dir: str, name: str) -> DataFrame:
    """PERMISSIVE all-string scan of one GTFS file (B1/C1).

    Unknown files are rejected (gtfs-to-sql behavior — files are passed
    positionally at /root/reference/import.sh:130). The scan schema
    mirrors the file's header (order + extra columns); projection to the
    spec column set happens in cast_typed (B5).
    """
    if name not in schemas.GTFS_FILES:
        raise ValueError(f"unknown GTFS file: {name}.txt")
    path = os.path.join(feed_dir, f"{name}.txt")
    from pyspark.sql import types as T

    fields = [T.StructField(c, T.StringType(), True) for c in _read_header(path)]
    fields.append(T.StructField(schemas.CORRUPT_COL, T.StringType(), True))
    return spark.read.csv(
        path,
        schema=T.StructType(fields),
        header=True,
        mode="PERMISSIVE",
        columnNameOfCorruptRecord=schemas.CORRUPT_COL,
        enforceSchema=False,
        emptyValue=None,
    )


def cast_typed(
    raw: DataFrame, name: str, keep_additional_fields: bool = False
) -> DataFrame:
    """Apply C2 casts, C3 GTFS-time parse, C4 lang lower-casing — by NAME.

    Spec columns missing from the file become typed NULL columns (the
    downstream operators see one stable schema per table); non-spec
    columns are dropped unless ``keep_additional_fields`` (B5 — gtfsclean
    --keep-additional-fields, /root/reference/import.sh:64-67).
    try_cast semantics: unparseable values become NULL, feeding the
    cleaning layer's default-on-errors / drop-errors policies (B2/B3)
    rather than aborting the scan.
    """
    present = set(raw.columns)
    cols = []
    for c, t in schemas.GTFS_FILES[name].items():
        if c in present:
            col = F.col(c)
            if t == "int":
                col = col.try_cast("int")
            elif t == "double":
                col = col.try_cast("double")
            elif t == "date":
                col = gtfs_date(col)
            elif t == "secs":
                col = gtfs_time_to_secs(col)
            elif t == "lang":
                col = F.lower(col)
        else:
            target = {"int": "int", "double": "double", "date": "date",
                      "secs": "int"}.get(t, "string")
            col = F.lit(None).cast(target)
        cols.append(col.alias(c))
    if keep_additional_fields:
        cols.extend(
            F.col(c)
            for c in raw.columns
            if c not in schemas.GTFS_FILES[name] and c != schemas.CORRUPT_COL
        )
    return raw.select(*cols)


def read_feed(
    spark: SparkSession, feed_dir: str, keep_additional_fields: bool = False
) -> dict[str, DataFrame]:
    """Read every present GTFS file as a typed DataFrame."""
    out: dict[str, DataFrame] = {}
    for name in schemas.GTFS_FILES:
        path = os.path.join(feed_dir, f"{name}.txt")
        if os.path.exists(path) and _read_header(path):
            # zero-byte optional files are skipped like absent ones
            # (gtfsclean tolerates them; a headerless scan cannot exist)
            out[name] = cast_typed(
                read_raw(spark, feed_dir, name), name, keep_additional_fields
            )
    return out
