"""Content digests — identity of a feed version.

Parity with the reference's digest helpers:
  * ``digest_string_col``  ≙ digestString  (/root/reference/index.js:12-18)
  * ``digest_file``        ≙ digestFile    (/root/reference/index.js:20-26)
  * ``composite_feed_digest`` ≙ the zip ⊕ postprocessing.d digest
    (/root/reference/import.js:200-227): sha256 of the zip, concatenated with
    the digests of every non-dotfile in the postprocessing dir (sorted by
    name, missing dir tolerated), re-digested.

Digests are SHA-256 hex, lowercased, truncated to DIGEST_LENGTH=6
(/root/reference/index.js:10). In-engine digests use ``F.sha2`` (JVM-side,
codegen); file digests are driver-side streaming hashlib because the bytes
precede any DataFrame.
"""

from __future__ import annotations

import hashlib
import os

from pyspark.sql import Column
from pyspark.sql import functions as F

DIGEST_LENGTH = 6


def digest_string_col(col: Column | str) -> Column:
    """sha256(col) hex, lowercase, first 6 chars — as a column expression."""
    c = F.col(col) if isinstance(col, str) else col
    return F.substring(F.lower(F.sha2(c, 256)), 1, DIGEST_LENGTH)


def digest_string(s: str | bytes) -> str:
    if isinstance(s, str):
        s = s.encode("utf-8")
    return hashlib.sha256(s).hexdigest()[:DIGEST_LENGTH].lower()


def digest_file(path: str, chunk_size: int = 1 << 20) -> str:
    h = hashlib.sha256()
    with open(path, "rb") as f:
        while chunk := f.read(chunk_size):
            h.update(chunk)
    return h.hexdigest()[:DIGEST_LENGTH].lower()


def composite_feed_digest(zip_path: str, postprocessing_dir: str | None) -> str:
    """digestString(digest(zip) + digest(file1) + digest(file2) + ...).

    Files sorted by name; dotfiles ignored (import.js:210); a missing
    postprocessing dir contributes nothing (ENOENT swallowed,
    import.js:221-226).
    """
    feed_digest = digest_file(zip_path)
    parts = [feed_digest]
    if postprocessing_dir is not None:
        try:
            names = sorted(os.listdir(postprocessing_dir))
        except FileNotFoundError:
            names = []
        for name in names:
            if name.startswith("."):
                continue
            p = os.path.join(postprocessing_dir, name)
            if os.path.isfile(p):
                parts.append(digest_file(p))
    if len(parts) == 1:
        # No postprocessing files contributed: keep the raw zip digest,
        # as the reference does (import.js:201-227) — re-digesting here
        # would diverge from existing bookkeeping rows and force one
        # spurious re-import against a pre-existing meta DB.
        return feed_digest
    return digest_string("".join(parts))
