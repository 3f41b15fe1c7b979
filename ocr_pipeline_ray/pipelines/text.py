"""Text-analysis pipelines over the ``documents`` table: token counts,
fingerprints, language ID, quality scoring, winnowing fingerprints.

All stages are ``map_batches`` transforms; the regex/stopword state is
compiled once per actor (the reference's load-once-per-worker pattern,
reference std-detection/api.py:40-60, for lightweight state).
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa

from ocr_pipeline_ray.functions.textstats import (
    TOKEN_RE,
    bpe_token_estimate,
    detect_language,
    fingerprint_md5,
    quality_stats,
    winnow_fingerprints,
)
from ocr_pipeline_ray.pipelines.relational import _read


def token_counts(sf_dir: str) -> pd.DataFrame:
    """(doc_id, n_tokens) with the ``[A-Za-z0-9_]+`` tokenizer."""
    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def f(t: pa.Table) -> pa.Table:
        ns = [len(TOKEN_RE.findall(s)) for s in t["text"].to_pylist()]
        return pa.Table.from_arrays([t["doc_id"], pa.array(ns, pa.int64())], names=["doc_id", "n_tokens"])

    return ds.map_batches(f, batch_format="pyarrow").to_pandas().sort_values("doc_id").reset_index(drop=True)


TOKEN_COUNTS_SQL = r"""
SELECT doc_id, CAST(len(regexp_extract_all(text, '[A-Za-z0-9_]+')) AS BIGINT) AS n_tokens
FROM documents ORDER BY doc_id
"""


def fingerprints(sf_dir: str) -> pd.DataFrame:
    """(doc_id, fp): md5 of whitespace-normalized lowercase text."""
    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def f(t: pa.Table) -> pa.Table:
        fps = [fingerprint_md5(s) for s in t["text"].to_pylist()]
        return pa.Table.from_arrays([t["doc_id"], pa.array(fps, pa.string())], names=["doc_id", "fp"])

    return ds.map_batches(f, batch_format="pyarrow").to_pandas().sort_values("doc_id").reset_index(drop=True)


FINGERPRINTS_SQL = r"""
SELECT doc_id, md5(lower(trim(regexp_replace(text, '\s+', ' ', 'g')))) AS fp
FROM documents ORDER BY doc_id
"""


def bpe_token_counts(sf_dir: str) -> pd.DataFrame:
    """(doc_id, n_bpe_tokens) — BPE-ish estimate (no SQL oracle; the
    subword-split heuristic is not expressible in RE2)."""
    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def f(t: pa.Table) -> pa.Table:
        ns = [bpe_token_estimate(s) for s in t["text"].to_pylist()]
        return pa.Table.from_arrays(
            [t["doc_id"], pa.array(ns, pa.int64())], names=["doc_id", "n_bpe_tokens"]
        )

    return ds.map_batches(f, batch_format="pyarrow").to_pandas().sort_values("doc_id").reset_index(drop=True)


class _LangId:
    """Actor stage: stopword tables live in actor state."""

    def __call__(self, t: pa.Table) -> pa.Table:
        langs = [detect_language(s) for s in t["text"].to_pylist()]
        return pa.Table.from_arrays(
            [t["doc_id"], pa.array(langs, pa.string())], names=["doc_id", "lang_pred"]
        )


def language_id(sf_dir: str) -> pd.DataFrame:
    """(doc_id, lang_pred) from the stopword/CJK heuristic (no SQL
    oracle — heuristic model scoring; driver does rows-only check)."""
    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    return (
        ds.map_batches(_LangId, batch_format="pyarrow", concurrency=(1, 4))
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )


def quality_scores(sf_dir: str) -> pd.DataFrame:
    """Per-doc quality features + composite score (C4/Gopher-style)."""
    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def f(t: pa.Table) -> pa.Table:
        stats = [quality_stats(s) for s in t["text"].to_pylist()]
        cols = {"doc_id": t["doc_id"]}
        for key in ("n_chars", "n_tokens", "n_punct", "mean_word_len", "stopword_ratio", "alpha_ratio", "quality_score"):
            cols[key] = pa.array([s[key] for s in stats])
        return pa.Table.from_pydict(cols)

    return ds.map_batches(f, batch_format="pyarrow").to_pandas().sort_values("doc_id").reset_index(drop=True)


def winnowing(sf_dir: str, k: int = 5, window: int = 4) -> pd.DataFrame:
    """(doc_id, n_fingerprints) winnowing summary (full fingerprint
    sets are list-typed; the count is the driver-checkable scalar)."""
    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def f(t: pa.Table) -> pa.Table:
        ns = [len(winnow_fingerprints(s, k, window)) for s in t["text"].to_pylist()]
        return pa.Table.from_arrays([t["doc_id"], pa.array(ns, pa.int64())], names=["doc_id", "n_fingerprints"])

    return ds.map_batches(f, batch_format="pyarrow").to_pandas().sort_values("doc_id").reset_index(drop=True)
