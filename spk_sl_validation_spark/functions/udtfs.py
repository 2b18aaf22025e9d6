"""Python UDTFs (table functions) — the 1→N row API surface.

The reference has no UDTF surface (its only row-wise lambda is the
comment coalesce, SURVEY.md §2.3 E13); this pins Spark's Python UDTF
API as part of the engine's extension surface. Engine guidance stands:
UDTFs run row-at-a-time Python and belong OFF the hot path — every
UDTF here documents the built-in/SQL formulation that supersedes it at
scale (the oracle for the registry query IS that formulation). They
exist for genuinely procedural 1→N expansions where the SQL shape is
tortured, and for parity with pipelines that already ship UDTFs.
"""

from __future__ import annotations

from pyspark.sql.functions import udtf


@udtf(returnType="token string, start_pos int, run_len int")
class TokenRunLengths:
    """Emit maximal runs of consecutive repeated tokens (run_len ≥ 2)
    from a space-separated text — run-length islands, the building
    block of repetition-quality filters.

    Tokenization mirrors ``split(text, ' ')`` exactly (empty tokens
    preserved) so the SQL islands-and-gaps oracle — the formulation to
    use at scale: split → posexplode → ``pos - row_number() OVER
    (PARTITION BY doc, token ORDER BY pos)`` groups — is value-identical.
    ``start_pos`` is 1-based.
    """

    def eval(self, text: str):  # noqa: D102
        if text is None:
            return
        toks = text.split(" ")
        i, n = 0, len(toks)
        while i < n:
            j = i + 1
            while j < n and toks[j] == toks[i]:
                j += 1
            if j - i >= 2:
                yield toks[i], i + 1, j - i
            i = j
