"""Test-set decontamination — the n-gram-overlap pass an LLM training
pipeline runs before training (publicly documented practice: GPT-2/GPT-3
style 8/13-gram overlap removal against evaluation sets; the token width
is a parameter here and the tokenizer is a literal single-space split so
the SQL oracle can express the SAME semantics exactly).

The reference has no decontamination analog (single-process PageRank,
SURVEY.md §2.2); this is training-data infrastructure in the SURVEY §2.5
class, built on the house broadcast-small-side pattern.

Shape at 100 TB: the held-out (evaluation) side is SMALL by construction
— benchmark suites measure in MBs while the train side measures in TBs —
so this is the canonical broadcast-small-side scan, NOT a join:

1. One ``map_batches`` pass over the held-out docs emits each batch's
   DISTINCT grams; the driver unions them and ships the set ONCE via
   ``ray.put``. Guarded: more than ``max_grams`` distinct grams raises
   instead of silently broadcasting an unbounded object (at that point
   the right structure is a Bloom prefilter — ``engine.bloom`` — in
   front of an exact verify, not a bigger broadcast).
2. The train side is a stateless actor-pool scan (set state fetched once
   per actor in ``__init__``, never per batch): per doc, the distinct
   grams are intersected with the broadcast set and docs with ≥ 1 hit
   survive. No shuffle anywhere — O(train bytes) streamed read, O(held)
   broadcast, output proportional to the contaminated subset only.

Tokenization contract (shared verbatim with the SQL oracle): tokens are
``text.split(' ')`` — the literal single-space split, identical to
DuckDB ``string_split(text, ' ')`` including empty tokens around
repeated spaces — and a gram is ``' '.join`` of ``n`` consecutive
tokens; docs shorter than ``n`` tokens contribute none.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data

from .util import default_concurrency


def _doc_grams(text: str, n: int) -> set:
    toks = (text or "").split(" ")
    return {" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)}


def heldout_gram_set(
    heldout: ray.data.Dataset,
    n: int = 5,
    text_col: str = "text",
    max_grams: int = 5_000_000,
) -> frozenset:
    """Distinct ``n``-grams of the held-out corpus, collected for a
    one-time broadcast. Each batch pre-dedups its own grams so the
    driver unions sets, never raw token streams."""

    def batch_grams(t: pa.Table) -> pa.Table:
        grams: set = set()
        for txt in t.column(text_col).to_pylist():
            grams |= _doc_grams(txt, n)
        return pa.table({"gram": pa.array(sorted(grams), type=pa.string())})

    out: set = set()
    for b in heldout.map_batches(batch_grams, batch_format="pyarrow").iter_batches(
        batch_format="pyarrow"
    ):
        out.update(b.column("gram").to_pylist())
        if len(out) > max_grams:
            raise ValueError(
                f"held-out gram set exceeds max_grams={max_grams}; use a "
                "Bloom prefilter (engine.bloom) instead of a broadcast"
            )
    return frozenset(out)


class _ContaminationScan:
    """Actor-pool stage: count per-doc distinct grams shared with the
    broadcast held-out set (set fetched once per actor)."""

    def __init__(self, grams_ref, n: int, text_col: str, id_col: str):
        self.grams = ray.get(grams_ref)
        self.n = n
        self.text_col = text_col
        self.id_col = id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column(self.id_col).to_numpy(zero_copy_only=False)
        hits = np.fromiter(
            (
                len(_doc_grams(t, self.n) & self.grams)
                for t in batch.column(self.text_col).to_pylist()
            ),
            dtype=np.int64,
            count=len(ids),
        )
        keep = hits > 0
        return pa.table(
            {
                self.id_col: pa.array(ids[keep]),
                "n_contaminated_grams": pa.array(hits[keep]),
            }
        )


def decontaminate(
    train: ray.data.Dataset,
    heldout: ray.data.Dataset,
    n: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_grams: int = 5_000_000,
) -> ray.data.Dataset:
    """Flag train docs sharing ≥ 1 ``n``-gram with the held-out corpus.

    Returns a Dataset of ``(id_col, n_contaminated_grams)`` — one row per
    CONTAMINATED train doc (clean docs are absent), with the count of
    distinct shared grams. The caller drops or audits the flagged rows.
    """
    grams_ref = ray.put(heldout_gram_set(heldout, n, text_col, max_grams))
    return train.map_batches(
        _ContaminationScan,
        fn_constructor_kwargs=dict(
            grams_ref=grams_ref, n=n, text_col=text_col, id_col=id_col
        ),
        batch_format="pyarrow",
        concurrency=default_concurrency(),
    )
