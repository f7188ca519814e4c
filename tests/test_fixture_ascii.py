"""Loud guard for the media-oracle ASCII assumption.

The media_* oracle CTEs reconstruct payload BYTES from document text
via character-indexed ``ascii(substr(text, ...))`` (queries.py, the
dHash/audio-fingerprint CTEs), while the Spark side hashes utf-8
bytes. Parity therefore requires codepoints == utf-8 bytes, i.e. a
pure-ASCII corpus. A single non-ASCII document would silently desync
byte positions and fail every media_* gate with no targeted
diagnostic — this test makes the violation fail loudly at the source
instead (r10 advisor, ADVICE.md #3).
"""

from __future__ import annotations

import os

import duckdb
import pytest

SF_DIRS = [
    d
    for d in ("/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1")
    if os.path.exists(os.path.join(d, "documents.parquet"))
]


@pytest.mark.parametrize("sf_dir", SF_DIRS)
def test_documents_text_is_pure_ascii(sf_dir: str) -> None:
    con = duckdb.connect()
    try:
        n_bad, sample = con.execute(
            f"""
            SELECT COUNT(*), MIN(doc_id)
            FROM read_parquet('{sf_dir}/documents.parquet')
            WHERE octet_length(encode(text)) <> length(text)
            """
        ).fetchone()
    finally:
        con.close()
    assert n_bad == 0, (
        f"{sf_dir}: {n_bad} non-ASCII document(s) (first doc_id={sample}) — "
        "the media_* oracle byte reconstruction (ascii(substr(text, ...))) "
        "is invalid for this corpus; the Spark side hashes utf-8 bytes."
    )


@pytest.mark.parametrize("sf_dir", SF_DIRS)
def test_documents_text_has_no_nul_bytes(sf_dir: str) -> None:
    """The Gear-CDC oracle's gear CTE maps bytes 1..127 and inner-joins
    positions on it; a NUL byte passes the octet_length == length
    ASCII check above but would silently DROP its position from the
    join and desync every LAG window downstream. Fail loudly here
    instead (r11 advisor)."""
    con = duckdb.connect()
    try:
        n_bad, sample = con.execute(
            f"""
            SELECT COUNT(*), MIN(doc_id)
            FROM read_parquet('{sf_dir}/documents.parquet')
            WHERE position(chr(0) IN text) > 0
            """
        ).fetchone()
    finally:
        con.close()
    assert n_bad == 0, (
        f"{sf_dir}: {n_bad} document(s) contain NUL (first doc_id={sample}) — "
        "the CDC oracle's gear table covers bytes 1..127 only; a NUL "
        "position would vanish from the inner join and desync the "
        "rolling-hash windows."
    )
