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
    """binary html -> extracted text (Arrow string array)."""
    s = pc.cast(html, pa.large_string())
    # drop everything up to and including the first <body ...> tag
    s = pc.replace_substring_regex(s, r"(?s)^.*?<body[^>]*>", "", max_replacements=1)
    # drop the last </body> and everything after it
    s = pc.replace_substring_regex(s, r"(?s)</body>[^<]*(<[^>]*>[^<]*)*$", "", max_replacements=1)
    # strip any tags left inside the body
    s = pc.replace_substring_regex(s, r"<[^>]*>", "")
    return pc.cast(s, pa.string())


def extract_text(batch: pa.Table, out_col: str = "text2") -> pa.Table:
    """map_batches stage: adds the extracted-text column ``out_col``.

    Kept separate from the golden ``text`` column so tests can assert
    byte-identity (FIXTURES.md golden/text_sha256)."""
    return batch.append_column(out_col, extract_text_column(batch.column("html")))
