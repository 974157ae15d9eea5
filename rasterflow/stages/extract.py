"""HTML -> text extraction stage (vectorized, byte-deterministic).

The per-row invariant (BASELINE.json input_hint): extraction must be a pure
function of the html bytes producing text byte-identical to the golden ``text``
column per url, under any parallelism.  Implementation is Arrow-only — RE2
regex kernels over a large_string cast — with no Python per-row loop, no
locale, no dict iteration, so re-runs are trivially deterministic.

Strategy: take the inner content of <body>...</body> (last closing tag), strip
any remaining tags, collapse nothing else (whitespace is preserved verbatim).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc


def extract_text_column(html: pa.ChunkedArray | pa.Array) -> pa.ChunkedArray | pa.Array:
    """binary html -> extracted text (Arrow string array).

    Fast path (round-2): ONE ``extract_regex`` captures the body content
    (first ``<body ...>`` to the next ``</body>``), replacing the round-1
    prefix-strip + suffix-strip replace passes — the headline ingest is
    RE2-bandwidth-bound, so one fewer full pass over the html bytes.  Rows
    without a well-formed body (never in the fixture; null capture) fall
    back to the original two replaces.  Byte-identical to round 1 for
    documents with a single body element (the golden-pinned contract);
    pathological nested-body inputs resolve to the first ``</body>``."""
    s = pc.cast(html, pa.large_string())
    ex = pc.extract_regex(s, r"(?s)<body[^>]*>(?P<t>.*?)</body>")
    t = pc.struct_field(ex, "t")
    if t.null_count > 0:
        fb = pc.replace_substring_regex(s, r"(?s)^.*?<body[^>]*>", "", max_replacements=1)
        fb = pc.replace_substring_regex(fb, r"(?s)</body>[^<]*(<[^>]*>[^<]*)*$", "", max_replacements=1)
        t = pc.if_else(pc.is_valid(t), t, fb)
    # strip any tags left inside the body
    t = pc.replace_substring_regex(t, r"<[^>]*>", "")
    return pc.cast(t, pa.string())


def extract_text(batch: pa.Table, out_col: str = "text2") -> pa.Table:
    """map_batches stage: adds the extracted-text column ``out_col``.

    Kept separate from the golden ``text`` column so tests can assert
    byte-identity (FIXTURES.md golden/text_sha256)."""
    return batch.append_column(out_col, extract_text_column(batch.column("html")))
