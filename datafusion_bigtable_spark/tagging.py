"""Content-address tags for /tmp fixture stores — the ONE home of the
frozen tag byte format.

Every content-addressed store this engine writes (bucketed fixtures,
IVF stores, compaction/range-layout harness stores, postings indexes)
derives its identity here.  ADVICE r14: the md5 idiom had been
hand-rolled in queries.py AND operators/bucketing.py, leaving the exact
drift the shared helper was created to prevent possible in the
highest-churn fixture; this module is importable from both (operators
must not import queries — queries imports operators).

The byte format is FROZEN (pinned in
tests/test_schedule.py::test_content_tag_format_is_frozen and
tests/test_bucketing.py): changing it re-keys every store on disk into
a one-time rewrite, so an edit that alters these hashes must be a
deliberate choice that updates the pins, never a refactoring accident.
"""

from __future__ import annotations

import hashlib
import os


def tag_of(*fields, n: int = 12) -> str:
    """``n``-hex content-address tag: md5 of the '|'-joined fields."""
    return hashlib.md5("|".join(str(f) for f in fields).encode()).hexdigest()[:n]


def src_tag(prefix: str, sf_dir: str, table: str) -> str:
    """The standard source identity: ``{prefix}|{abspath}|{mtime_ns}|
    {size}`` of one fixture parquet, through :func:`tag_of`."""
    src = os.path.join(sf_dir, f"{table}.parquet")
    st = os.stat(src)
    return tag_of(prefix, os.path.abspath(src), st.st_mtime_ns, st.st_size)
