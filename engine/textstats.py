"""Text analysis operators for training-data pipelines: language ID,
quality scoring, token counting, document fingerprinting.

Stateful pieces (stopword tables, compiled regexes) live in actor-pool
callables (built once per actor); per-batch work is numpy-vectorized over
zero-copy Arrow batches.
"""

from __future__ import annotations

import re
import zlib

import numpy as np
import pyarrow as pa
import ray
import ray.data

_STOPWORDS = {
    "en": {"the", "and", "of", "to", "a", "in", "is", "it", "that", "for", "on",
           "with", "as", "was", "at", "by", "an", "be", "this", "are"},
    "de": {"der", "die", "das", "und", "ist", "ich", "nicht", "ein", "eine",
           "zu", "den", "mit", "auf", "für", "von", "dem", "sich", "des"},
    "es": {"el", "la", "de", "que", "y", "en", "un", "una", "es", "los", "las",
           "por", "con", "para", "del", "se", "no", "al"},
    "fr": {"le", "la", "les", "de", "des", "et", "est", "un", "une", "dans",
           "que", "pour", "qui", "sur", "pas", "au", "du", "ce"},
}

# BPE-ish pre-tokenizer (GPT-2 style contraction/word/number/punct pieces)
_BPEISH = (
    r"'s|'t|'re|'ve|'m|'ll|'d| ?[A-Za-z]+| ?[0-9]+| ?[^\sA-Za-z0-9]+|\s+(?!\S)|\s+"
)


class TextAnalyzer:
    """Actor-pool stage: adds lang_id, quality stats, token counts and a
    64-bit rolling-hash fingerprint to a documents batch."""

    def __init__(self, text_col: str = "text"):
        self.text_col = text_col
        self.word = re.compile(r"[^\W\d_]+", re.U)
        self.bpeish = re.compile(_BPEISH)
        self.punct = re.compile(r"[^\w\s]", re.U)
        self.cjk = re.compile(r"[一-鿿぀-ヿ가-힯]")
        self.stop = {lang: frozenset(ws) for lang, ws in _STOPWORDS.items()}
        # numpy unicode arrays for vectorized membership (np.isin)
        self.langs = list(_STOPWORDS)
        self._stop_arr = {
            lang: np.sort(np.array(sorted(ws))) for lang, ws in _STOPWORDS.items()
        }
        self._crc_cache: dict[str, int] = {}

    def lang_of(self, text: str) -> str:
        if not text:
            return "unknown"
        if len(self.cjk.findall(text)) > max(4, 0.2 * len(text)):
            return "zh"
        words = [w.lower() for w in self.word.findall(text)]
        if not words:
            return "unknown"
        best, best_score = "unknown", 0.0
        for lang, sw in self.stop.items():
            score = sum(1 for w in words if w in sw) / len(words)
            if score > best_score:
                best, best_score = lang, score
        return best if best_score >= 0.05 else "unknown"

    def fingerprint(self, text: str) -> int:
        """64-bit FNV-style rolling hash over word tokens (stable)."""
        h = 0xCBF29CE484222325
        for w in self.word.findall((text or "").lower()):
            h = ((h ^ zlib.crc32(w.encode())) * 0x100000001B3) & 0xFFFFFFFFFFFFFFFF
        return h

    def __call__(self, batch: pa.Table) -> pa.Table:
        """One regex tokenization pass per doc; every word-level statistic
        (language scores, stopword ratio, mean word length) is computed
        over the FLAT token array with np.unique + np.isin + np.bincount —
        no per-word Python loops. The only remaining per-token Python work
        is the order-sensitive rolling-hash fingerprint (sequential by
        construction), fed from a per-actor crc cache."""
        texts = [t or "" for t in batch.column(self.text_col).to_pylist()]
        n = len(texts)
        words_per_doc = [self.word.findall(t.lower()) for t in texts]
        counts = np.fromiter((len(w) for w in words_per_doc), dtype=np.int64, count=n)
        flat_list = [w for ws in words_per_doc for w in ws]
        tok_doc = np.repeat(np.arange(n, dtype=np.int64), counts)
        safe_counts = np.maximum(counts, 1).astype(np.float64)

        if flat_list:
            # fixed-width unicode is fastest, but its per-element width is
            # the LONGEST token in the batch — one adversarial 100k-char
            # letter run would inflate every slot (tokens x maxlen x 4 B);
            # fall back to object dtype past a sane width
            if max(map(len, flat_list)) > 64:
                flat = np.array(flat_list, dtype=object)
            else:
                flat = np.array(flat_list)
            uw, inv = np.unique(flat, return_inverse=True)
            # per-language stopword score: membership on unique words only
            scores = np.empty((n, len(self.langs)))
            for j, lang in enumerate(self.langs):
                member = np.isin(uw, self._stop_arr[lang])[inv]
                scores[:, j] = (
                    np.bincount(tok_doc, weights=member, minlength=n) / safe_counts
                )
            if uw.dtype == object:  # np.char.str_len rejects object arrays
                ulen = np.fromiter(map(len, uw), dtype=np.int64, count=len(uw))
            else:
                ulen = np.char.str_len(uw)
            wlen = ulen[inv].astype(np.float64)
            mean_wlen = np.bincount(tok_doc, weights=wlen, minlength=n) / safe_counts
            mean_wlen[counts == 0] = 0.0
        else:
            scores = np.zeros((n, len(self.langs)))
            mean_wlen = np.zeros(n)

        best = np.argmax(scores, axis=1)
        best_score = scores[np.arange(n), best] if n else np.empty(0)
        lang_id = np.where(
            best_score >= 0.05, np.array(self.langs, dtype=object)[best], "unknown"
        ).astype(object)
        # CJK override (checked first in the scalar rule; zh wins) — only
        # non-ASCII docs can match, so the regex runs on those alone
        for i, t in enumerate(texts):
            if t and not t.isascii():
                if len(self.cjk.findall(t)) > max(4, 0.2 * len(t)):
                    lang_id[i] = "zh"

        n_chars = np.fromiter((len(t) for t in texts), dtype=np.int64, count=n)
        n_punct = np.fromiter(
            (len(self.punct.findall(t)) for t in texts), dtype=np.int64, count=n
        )
        punct_ratio = n_punct / np.maximum(n_chars, 1)
        stop_ratio = scores[:, self.langs.index("en")]
        n_tokens_ws = np.fromiter(
            (len(t.split()) for t in texts), dtype=np.int64, count=n
        )
        n_tokens_bpeish = np.fromiter(
            (len(self.bpeish.findall(t)) for t in texts), dtype=np.int64, count=n
        )
        quality = (
            (np.clip(counts, 0, 200) / 200.0) * 0.4
            + (1.0 - np.clip(punct_ratio, 0, 0.5) * 2) * 0.3
            + np.clip(stop_ratio, 0, 0.5) * 2 * 0.3
        )

        # fingerprint: rolling hash per doc over cached per-word crc32s
        cache = self._crc_cache
        fps = np.empty(n, dtype=np.uint64)
        for i, ws in enumerate(words_per_doc):
            h = 0xCBF29CE484222325
            for w in ws:
                c = cache.get(w)
                if c is None:
                    c = cache[w] = zlib.crc32(w.encode())
                h = ((h ^ c) * 0x100000001B3) & 0xFFFFFFFFFFFFFFFF
            fps[i] = h
        if len(cache) > 1_000_000:
            cache.clear()  # bound per-actor memory on adversarial vocab

        out = batch
        for name, arr in [
            ("lang_id", pa.array(lang_id, type=pa.string())),
            ("n_chars", pa.array(n_chars)),
            ("n_words", pa.array(counts)),
            ("punct_ratio", pa.array(punct_ratio)),
            ("stopword_ratio", pa.array(stop_ratio)),
            ("mean_word_len", pa.array(mean_wlen)),
            ("n_tokens_ws", pa.array(n_tokens_ws)),
            ("n_tokens_bpeish", pa.array(n_tokens_bpeish)),
            ("quality", pa.array(quality)),
            ("fingerprint", pa.array(fps, type=pa.uint64())),
        ]:
            out = out.append_column(name, arr)
        return out


def analyze(
    ds: ray.data.Dataset,
    text_col: str = "text",
    concurrency: int | tuple | None = None,
    batch_size: int = 1024,
) -> ray.data.Dataset:
    """documents → documents + (lang_id, n_chars, n_words, punct_ratio,
    stopword_ratio, mean_word_len, n_tokens_ws, n_tokens_bpeish, quality,
    fingerprint)."""
    from .util import default_concurrency

    if concurrency is None:
        concurrency = default_concurrency()
    return ds.map_batches(
        TextAnalyzer,
        fn_constructor_kwargs=dict(text_col=text_col),
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


def vocab_topk(
    docs: ray.data.Dataset,
    k: int = 50,
    text_col: str = "text",
) -> ray.data.Dataset:
    """Top-k corpus vocabulary: ``\\w+`` word tokens of lowercased text,
    counted with a per-batch combiner (one row per distinct token per
    batch reaches the shuffle, not one per occurrence), global
    ``groupby(token).Sum``, deterministic (count DESC, token ASC) order.
    The vocabulary-building step of a tokenizer-training pipeline."""
    from ray.data.aggregate import Sum

    word = re.compile(r"\w+")

    def count_batch(t: pa.Table) -> pa.Table:
        toks: list = []
        for x in t.column(text_col).to_pylist():
            toks.extend(word.findall((x or "").lower()))
        if not toks:
            return pa.table(
                {
                    "token": pa.array([], type=pa.string()),
                    "cnt": pa.array([], type=pa.int64()),
                }
            )
        u, c = np.unique(np.asarray(toks, dtype=object), return_counts=True)
        return pa.table(
            {
                "token": pa.array([str(s) for s in u], type=pa.string()),
                "cnt": pa.array(c.astype(np.int64)),
            }
        )

    agg = (
        docs.map_batches(count_batch, batch_format="pyarrow")
        .groupby("token")
        .aggregate(Sum("cnt", alias_name="cnt"))
    )
    return agg.sort(["cnt", "token"], descending=[True, False]).limit(k)


def bigram_topk(
    docs: ray.data.Dataset,
    k: int = 100,
    text_col: str = "text",
) -> ray.data.Dataset:
    """Top-k corpus bigrams (adjacent ``\\w+`` token pairs within a
    document, count DESC / bigram ASC) — the n-gram language-model
    statistics step. Same shape as ``vocab_topk``: per-batch combiner
    (one row per distinct bigram per batch reaches the shuffle), global
    ``groupby.Sum``, deterministic order."""
    from ray.data.aggregate import Sum

    word = re.compile(r"\w+")

    def count_batch(t: pa.Table) -> pa.Table:
        grams: list = []
        for x in t.column(text_col).to_pylist():
            toks = word.findall((x or "").lower())
            grams.extend(
                f"{a} {b}" for a, b in zip(toks, toks[1:])
            )
        if not grams:
            return pa.table(
                {
                    "bigram": pa.array([], type=pa.string()),
                    "cnt": pa.array([], type=pa.int64()),
                }
            )
        u, c = np.unique(np.asarray(grams, dtype=object), return_counts=True)
        return pa.table(
            {
                "bigram": pa.array([str(s) for s in u], type=pa.string()),
                "cnt": pa.array(c.astype(np.int64)),
            }
        )

    agg = (
        docs.map_batches(count_batch, batch_format="pyarrow")
        .groupby("bigram")
        .aggregate(Sum("cnt", alias_name="cnt"))
    )
    return agg.sort(["cnt", "bigram"], descending=[True, False]).limit(k)


def tfidf_scores(
    docs: ray.data.Dataset,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_broadcast_vocab: int = 50_000_000,
) -> ray.data.Dataset:
    """Distributed inverted index + TF-IDF scoring.

    Stage 1 (no shuffle): each batch tokenizes its documents (``\\w+`` of
    lowercased text — same tokenizer as ``vocab_topk``) and emits the
    exact (doc_id, token, tf) posting rows; a document lives in one row,
    so its term frequencies are final inside the batch.
    Stage 2: document frequency = ``groupby(token).Sum(1)`` over the
    postings (each (doc, token) pair appears exactly once) — the only
    all-to-all, over pre-combined rows.
    Stage 3 (no shuffle): the (token → df) table is broadcast once via
    ``ray.put`` and each posting batch attaches df and
    tfidf = tf · ln(N/df) by vectorized searchsorted lookup.

    The broadcast is the documented small-side pattern: an AGGREGATED
    vocabulary (not the corpus); ``max_broadcast_vocab`` guards the path —
    beyond it, hash-bucket postings and df by token and join per bucket
    instead. Float column ``tfidf`` is rounded to 9 decimals (the repo's
    standard float-compare contract)."""
    word = re.compile(r"\w+")

    def postings(t: pa.Table) -> pa.Table:
        ids_out: list = []
        toks_out: list = []
        tfs_out: list = []
        dids = t.column(id_col).to_pylist()
        for did, x in zip(dids, t.column(text_col).to_pylist()):
            toks = word.findall((x or "").lower())
            if not toks:
                continue
            u, c = np.unique(np.asarray(toks, dtype=object), return_counts=True)
            ids_out.extend([did] * len(u))
            toks_out.extend([str(s) for s in u])
            tfs_out.extend(c.astype(np.int64).tolist())
        return pa.table(
            {
                id_col: pa.array(ids_out, type=t.schema.field(id_col).type),
                "token": pa.array(toks_out, type=pa.string()),
                "tf": pa.array(tfs_out, type=pa.int64()),
            }
        )

    from ray.data.aggregate import Sum

    # materialize before count: a lazy input would otherwise execute its
    # full upstream plan twice (once for count, once for postings)
    docs = docs.materialize()
    n_docs = docs.count()
    tf = docs.map_batches(postings, batch_format="pyarrow").materialize()
    df = (
        tf.map_batches(
            lambda t: pa.table(
                {
                    "token": t.column("token"),
                    "one": pa.array(np.ones(len(t), np.int64)),
                }
            ),
            batch_format="pyarrow",
        )
        .groupby("token")
        .aggregate(Sum("one", alias_name="df"))
    )
    # collect the aggregated vocabulary (small side) and broadcast once;
    # the guard fires DURING collection — checking after concat would let
    # an oversized vocabulary OOM the driver before the ValueError
    vocab_parts, vocab_rows = [], 0
    for b in df.iter_batches(batch_format="pyarrow"):
        vocab_rows += b.num_rows
        if vocab_rows > max_broadcast_vocab:
            raise ValueError(
                f"vocabulary exceeds the {max_broadcast_vocab}-token "
                "broadcast guard — hash-bucket postings and df by token "
                "instead"
            )
        vocab_parts.append(b)
    vocab = pa.concat_tables(vocab_parts) if vocab_parts else pa.table(
        {"token": pa.array([], type=pa.string()), "df": pa.array([], type=pa.int64())}
    )
    vtok = np.asarray(vocab.column("token").to_pylist(), dtype=object)
    vdf = vocab.column("df").to_numpy(zero_copy_only=False).astype(np.int64)
    order = np.argsort(vtok, kind="stable")
    vref = ray.put((vtok[order], vdf[order], float(n_docs)))

    def attach(t: pa.Table) -> pa.Table:
        toks_sorted, dfs_sorted, n = ray.get(vref)
        tok = np.asarray(t.column("token").to_pylist(), dtype=object)
        pos = np.searchsorted(toks_sorted, tok)
        dfv = dfs_sorted[pos]
        tfv = t.column("tf").to_numpy(zero_copy_only=False).astype(np.float64)
        tfidf = np.round(tfv * np.log(n / dfv), 9)
        return pa.table(
            {
                id_col: t.column(id_col),
                "token": t.column("token"),
                "tf": t.column("tf"),
                "df": pa.array(dfv, type=pa.int64()),
                "tfidf": pa.array(tfidf),
            }
        )

    return tf.map_batches(attach, batch_format="pyarrow")


def heavy_hitter_tokens(
    docs: ray.data.Dataset,
    k: int = 100,
    text_col: str = "text",
    max_candidates: int = 10_000_000,
) -> ray.data.Dataset:
    """Exact global heavy hitters (tokens with count · k > N) WITHOUT a
    full-vocabulary shuffle — the two-pass candidate/verify pipeline:

    Pass 1 (no shuffle): each batch emits the tokens that are heavy
    WITHIN the batch (count_b · k > n_b). Pigeonhole guarantees this is a
    superset of the global heavy hitters (if Σc_b > Σn_b / k then some
    batch has c_b > n_b / k), and it is ≤ k rows per batch — independent
    of vocabulary size. Per-batch totals n_b ride along as one extra row.
    Pass 2: the deduped candidate set is broadcast once; batches count
    ONLY candidates; one tiny groupby over ≤ |candidates| keys; the
    driver filters count · k > N on exact integers. Output is EXACTLY
    the SQL ``HAVING COUNT(*) * k > total`` answer.

    Contrast ``vocab_topk``, which shuffles one row per distinct token
    per batch — fine for vocabularies, wasteful when only the heavy tail
    is wanted at 100 TB."""
    from ray.data.aggregate import Sum

    word = re.compile(r"\w+")
    _TOTAL = "\x00total"  # NUL-prefixed sentinel: no \w+ token collides

    def _batch_tokens(t: pa.Table) -> np.ndarray:
        toks: list = []
        for x in t.column(text_col).to_pylist():
            toks.extend(word.findall((x or "").lower()))
        return np.asarray(toks, dtype=object)

    def candidates_fn(t: pa.Table) -> pa.Table:
        toks = _batch_tokens(t)
        n_b = len(toks)
        if n_b == 0:
            return pa.table({"token": pa.array([], type=pa.string()),
                             "n_b": pa.array([], type=pa.int64())})
        u, c = np.unique(toks, return_counts=True)
        heavy = u[c * k > n_b]
        return pa.table(
            {
                "token": pa.array(
                    [str(s) for s in heavy] + [_TOTAL], type=pa.string()
                ),
                "n_b": pa.array(
                    np.concatenate([np.zeros(len(heavy), np.int64), [n_b]])
                ),
            }
        )

    cand_rows = docs.map_batches(candidates_fn, batch_format="pyarrow")
    cand: set = set()
    total = 0
    for b in cand_rows.iter_batches(batch_format="pyarrow"):
        for tok, nb in zip(b.column("token").to_pylist(),
                           b.column("n_b").to_pylist()):
            if tok == _TOTAL:
                total += int(nb)
            else:
                cand.add(tok)
    if len(cand) > max_candidates:
        raise ValueError(
            f"{len(cand)} candidates exceed the broadcast guard — raise k "
            "or hash-bucket the verify pass"
        )
    cand_sorted = np.asarray(sorted(cand), dtype=object)
    cref = ray.put(cand_sorted)

    def recount_fn(t: pa.Table) -> pa.Table:
        cs = ray.get(cref)
        toks = _batch_tokens(t)
        if len(toks) == 0 or len(cs) == 0:
            return pa.table({"token": pa.array([], type=pa.string()),
                             "cnt": pa.array([], type=pa.int64())})
        u, c = np.unique(toks, return_counts=True)
        pos = np.searchsorted(cs, u)
        pos_c = np.clip(pos, 0, len(cs) - 1)
        hit = cs[pos_c] == u
        return pa.table(
            {
                "token": pa.array([str(s) for s in u[hit]], type=pa.string()),
                "cnt": pa.array(c[hit].astype(np.int64)),
            }
        )

    counts = (
        docs.map_batches(recount_fn, batch_format="pyarrow")
        .groupby("token")
        .aggregate(Sum("cnt", alias_name="cnt"))
    )

    def final_filter(t: pa.Table) -> pa.Table:
        c = t.column("cnt").to_numpy(zero_copy_only=False)
        return t.filter(pa.array(c * k > total))

    return counts.map_batches(final_filter, batch_format="pyarrow")


def train_split(
    docs: ray.data.Dataset,
    id_col: str = "doc_id",
    bounds: tuple = (800, 900),
) -> ray.data.Dataset:
    """Deterministic train/val/test assignment: bucket =
    md5-low-64(str(id)) % 1000 (== DuckDB ``md5_number_lower``), train
    below ``bounds[0]``, val below ``bounds[1]``, else test. Stable under
    any repartitioning/reordering — the property a resumable 100-TB split
    needs (no RNG state, no global pass)."""
    import hashlib

    def split_batch(t: pa.Table) -> pa.Table:
        ids = t.column(id_col).to_pylist()
        h = np.fromiter(
            (
                int.from_bytes(hashlib.md5(str(i).encode()).digest()[8:], "little")
                % 1000
                for i in ids
            ),
            dtype=np.int64,
            count=len(ids),
        )
        lab = np.where(h < bounds[0], "train", np.where(h < bounds[1], "val", "test"))
        return pa.table(
            {
                id_col: t.column(id_col),
                "split": pa.array([str(s) for s in lab], type=pa.string()),
            }
        )

    return docs.map_batches(split_batch, batch_format="pyarrow")


def chunk_documents(
    docs: ray.data.Dataset,
    size: int = 120,
    stride: int = 60,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> ray.data.Dataset:
    """Sliding-window document chunking — the corpus-prep pass that feeds
    embedding / context-window pipelines: each doc becomes chunks of
    ``size`` characters starting every ``stride`` characters (overlap =
    ``size - stride``), short tail chunks kept, empty/null docs emit
    nothing.

    Offsets are CODEPOINT-based on both sides of the oracle contract
    (Python slicing == DuckDB ``substr``), chunk ``i`` starts at
    codepoint ``i*stride``. Stateless flat emission inside
    ``map_batches`` — no shuffle, no state, output streams; the 100-TB
    shape is a pure scan whose output is ~``size/stride``× the input
    bytes (the caller controls the inflation)."""
    if stride <= 0 or size <= 0:
        raise ValueError("size and stride must be positive")

    def emit(t: pa.Table) -> pa.Table:
        ids_out, idx_out, chunk_out = [], [], []
        ids = t.column(id_col).to_pylist()
        for did, txt in zip(ids, t.column(text_col).to_pylist()):
            txt = txt or ""
            for i, off in enumerate(range(0, len(txt), stride)):
                ids_out.append(did)
                idx_out.append(i)
                chunk_out.append(txt[off : off + size])
        return pa.table(
            {
                id_col: pa.array(ids_out, type=t.column(id_col).type),
                "chunk_idx": pa.array(idx_out, type=pa.int64()),
                "chunk": pa.array(chunk_out, type=pa.string()),
            }
        )

    return docs.map_batches(emit, batch_format="pyarrow")


def token_count_percentiles(
    docs: ray.data.Dataset,
    qs: tuple = (0.5, 0.9, 0.99),
    text_col: str = "text",
) -> ray.data.Dataset:
    """Exact whitespace-token-count percentiles (percentile_disc
    semantics: smallest value with cumulative fraction ≥ q) via a
    distributed sort — the driver reads only per-block row COUNTS from
    metadata plus one single-row slice per quantile, never the data."""

    def nt(t: pa.Table) -> pa.Table:
        texts = t.column(text_col).to_pylist()
        # null texts are EXCLUDED from the population — SQL's
        # percentile_disc ignores NULL rows, and counting them as 0
        # would shift every reported percentile vs the oracle
        n = [
            len(re.split(r"\s+", x.strip())) for x in texts if x is not None
        ]
        return pa.table({"n": pa.array(n, type=pa.int64())})

    s = docs.map_batches(nt, batch_format="pyarrow").sort("n").materialize()
    refs, counts = [], []
    for rb in s.iter_internal_ref_bundles():
        for blk, meta in rb.blocks:
            if meta.num_rows:
                refs.append(blk)
                counts.append(int(meta.num_rows))
    total = int(sum(counts))
    if total == 0:
        raise ValueError(
            "token_count_percentiles: empty population (no non-null text)"
        )
    bounds = np.cumsum([0] + counts)

    @ray.remote
    def pick(tbl: pa.Table, row: int) -> int:
        return int(tbl.column("n")[row].as_py())

    out = {}
    for q in qs:
        # percentile_disc: first value at cumulative count ceil(q * total)
        idx = max(0, int(np.ceil(q * total)) - 1)
        b = int(np.searchsorted(bounds, idx, side="right")) - 1
        out[f"p{int(q * 100)}"] = pick.remote(refs[b], idx - int(bounds[b]))
    vals = {k: ray.get(v) for k, v in out.items()}
    return ray.data.from_arrow(
        pa.table({k: pa.array([v], type=pa.int64()) for k, v in vals.items()})
    )


def _grouped_ngram_stats(
    tok_doc: np.ndarray, inv: np.ndarray, width: int, n_docs: int
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Per-document n-gram occurrence statistics over the flat token
    stream: (max single-n-gram count, total n-grams, distinct n-grams),
    each an ``n_docs``-length int64 vector.

    Fully vectorized: the (doc, tok_0..tok_{w-1}) composite keys are
    lexsorted so equal n-grams are adjacent, then run-length grouped with
    bincount — no Python loop over tokens, no key-packing overflow risk
    (columns are compared, never multiplied together)."""
    m = len(inv)
    starts = m - (width - 1)
    if m == 0 or starts <= 0:
        z = np.zeros(n_docs, dtype=np.int64)
        return z, z.copy(), z.copy()
    cols = [inv[k : starts + k].astype(np.int64) for k in range(width)]
    doc = tok_doc[:starts]
    valid = np.ones(starts, dtype=bool)
    for k in range(1, width):
        # n-gram must not straddle a document boundary
        valid &= tok_doc[k : starts + k] == doc
    doc = doc[valid]
    cols = [c[valid] for c in cols]
    if len(doc) == 0:
        z = np.zeros(n_docs, dtype=np.int64)
        return z, z.copy(), z.copy()
    # lexsort: any priority order groups identical (doc, gram) tuples
    order = np.lexsort(tuple(cols) + (doc,))
    keys = np.stack([doc] + cols, axis=1)[order]
    new = np.ones(len(keys), dtype=bool)
    if len(keys) > 1:
        new[1:] = np.any(keys[1:] != keys[:-1], axis=1)
    grp = np.cumsum(new) - 1
    grp_cnt = np.bincount(grp).astype(np.int64)
    gdoc = keys[new, 0]
    top = np.zeros(n_docs, dtype=np.int64)
    np.maximum.at(top, gdoc, grp_cnt)
    total = np.bincount(doc, minlength=n_docs).astype(np.int64)
    distinct = np.bincount(gdoc, minlength=n_docs).astype(np.int64)
    return top, total, distinct


class RepetitionStats:
    """Actor-pool stage: Gopher-style repetition quality signals (Rae et
    al. 2021, "Scaling Language Models", appendix A1.1) per document —
    the share of tokens taken by the single most frequent token, the
    share of bigrams taken by the most frequent bigram, and the fraction
    of trigram occurrences that are duplicates of an earlier trigram.
    High values flag boilerplate / machine-generated text for filtering.

    Tokens are the same ``[^\\W\\d_]+`` lowercased word tokens as
    ``TextAnalyzer`` (exactly SQL-expressible). Fractions are emitted as
    integer micro-units ``floor(x * 1e6 + 0.5)`` — int64 division and the
    half-up floor are bit-identical between numpy and DuckDB, so the
    oracle compare is exact. Documents with no tokens / bigrams /
    trigrams get 0 for the corresponding fraction."""

    def __init__(self, text_col: str = "text"):
        self.text_col = text_col
        self.word = re.compile(r"[^\W\d_]+", re.U)

    @staticmethod
    def _frac_micro(num: np.ndarray, den: np.ndarray) -> np.ndarray:
        f = num / np.maximum(den, 1)
        return np.floor(f * 1e6 + 0.5).astype(np.int64)

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = [t or "" for t in batch.column(self.text_col).to_pylist()]
        n = len(texts)
        words_per_doc = [self.word.findall(t.lower()) for t in texts]
        counts = np.fromiter(
            (len(w) for w in words_per_doc), dtype=np.int64, count=n
        )
        flat_list = [w for ws in words_per_doc for w in ws]
        tok_doc = np.repeat(np.arange(n, dtype=np.int64), counts)
        if flat_list:
            if max(map(len, flat_list)) > 64:
                flat = np.array(flat_list, dtype=object)
            else:
                flat = np.array(flat_list)
            _, inv = np.unique(flat, return_inverse=True)
        else:
            inv = np.zeros(0, dtype=np.int64)

        top1, tot1, _ = _grouped_ngram_stats(tok_doc, inv, 1, n)
        top2, tot2, _ = _grouped_ngram_stats(tok_doc, inv, 2, n)
        _, tot3, dis3 = _grouped_ngram_stats(tok_doc, inv, 3, n)

        out = batch
        for name, arr in [
            ("n_words", pa.array(counts)),
            ("top_token_frac_micro", pa.array(self._frac_micro(top1, tot1))),
            ("top_bigram_frac_micro", pa.array(self._frac_micro(top2, tot2))),
            (
                "dup_trigram_frac_micro",
                pa.array(self._frac_micro(tot3 - dis3, tot3)),
            ),
        ]:
            out = out.append_column(name, arr)
        return out


def repetition(
    ds: ray.data.Dataset,
    text_col: str = "text",
    concurrency: int | tuple | None = None,
    batch_size: int = 1024,
) -> ray.data.Dataset:
    """documents → documents + (n_words, top_token_frac_micro,
    top_bigram_frac_micro, dup_trigram_frac_micro). Gopher-style
    repetition filter signals; see :class:`RepetitionStats`."""
    from .util import default_concurrency

    if concurrency is None:
        concurrency = default_concurrency()
    return ds.map_batches(
        RepetitionStats,
        fn_constructor_kwargs=dict(text_col=text_col),
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


def mixture_sample(
    docs: ray.data.Dataset,
    rates_ppm: dict,
    id_col: str = "doc_id",
    source_col: str = "source",
    default_ppm: int = 0,
) -> ray.data.Dataset:
    """Deterministic source-mixture sampling (the Pile/Dolma-style
    corpus reweighting pass): keep a row iff
    ``md5-low-64(str(id)) % 1_000_000 < rates_ppm[source]`` — rates are
    integer parts-per-million so both sides of the oracle contract
    compare exact integers (== DuckDB ``md5_number_lower``). Stateless,
    repartition/reorder-stable, resumable (no RNG state, no global
    pass); sources absent from ``rates_ppm`` get ``default_ppm``.

    The id hash (not a per-source hash) means the SAME document keeps
    its fate if its source label is re-binned upstream only when the
    rate is unchanged — rates are the single knob, by design."""
    import hashlib

    for s, r in rates_ppm.items():
        if not (0 <= int(r) <= 1_000_000):
            raise ValueError(f"mixture_sample: rate for {s!r} not in [0, 1e6]: {r}")
    if not (0 <= int(default_ppm) <= 1_000_000):
        raise ValueError(f"mixture_sample: default_ppm not in [0, 1e6]: {default_ppm}")

    def f(t: pa.Table) -> pa.Table:
        ids = t.column(id_col).to_pylist()
        src = t.column(source_col).to_pylist()
        h = np.fromiter(
            (
                int.from_bytes(hashlib.md5(str(i).encode()).digest()[8:], "little")
                % 1_000_000
                for i in ids
            ),
            dtype=np.int64,
            count=len(ids),
        )
        thr = np.fromiter(
            (int(rates_ppm.get(s, default_ppm)) for s in src),
            dtype=np.int64,
            count=len(src),
        )
        return t.filter(pa.array(h < thr))

    return docs.map_batches(f, batch_format="pyarrow")


def token_histogram(
    docs: ray.data.Dataset, bin_width: int = 50, text_col: str = "text"
) -> ray.data.Dataset:
    """Whitespace-token-count histogram with fixed-width bins — the
    corpus length-distribution profile a curation run reports before
    choosing packing / filtering thresholds. Output: (bin, n_docs) with
    ``bin = n_tokens // bin_width``; NULL texts excluded (they have no
    count, matching SQL's COUNT over a WHERE text IS NOT NULL).

    Scale shape: each batch emits one PARTIAL bincount — O(occupied
    bins) rows, not O(docs) — so the groupby Sum sees only
    O(blocks × bins) tiny rows (hash-agg is fine at that size,
    CLAUDE.md); the driver never touches per-doc rows and the output is
    O(bins)."""
    if bin_width <= 0:
        raise ValueError(f"token_histogram: bin_width must be > 0: {bin_width}")
    from ray.data.aggregate import Sum

    empty = pa.schema([("bin", pa.int64()), ("n_docs", pa.int64())])

    def part(t: pa.Table) -> pa.Table:
        texts = t.column(text_col).to_pylist()
        n = [len(re.split(r"\s+", x.strip())) for x in texts if x is not None]
        if not n:
            return empty.empty_table()
        bins = np.asarray(n, dtype=np.int64) // bin_width
        cnt = np.bincount(bins)
        nz = np.flatnonzero(cnt)
        return pa.table(
            {
                "bin": pa.array(nz.astype(np.int64)),
                "n_docs": pa.array(cnt[nz].astype(np.int64)),
            }
        )

    return (
        docs.map_batches(part, batch_format="pyarrow")
        .groupby("bin")
        .aggregate(Sum("n_docs", alias_name="n_docs"))
    )


def epoch_shuffle(
    ds: ray.data.Dataset, seed: int, id_col: str = "doc_id"
) -> ray.data.Dataset:
    """Deterministic global training-order shuffle: every row gets a
    contiguous 0-based ``pos`` in the order of
    ``md5-low-64(f"{seed}:{id}")`` masked to 63 bits (== DuckDB
    ``md5_number_lower(...) % 2**63``), ties broken by id. Changing
    ``seed`` gives an independent epoch order; the same seed is
    bit-reproducible across runs/partitionings — the property a
    resumable multi-epoch 100-TB training job needs (Ray's
    ``random_shuffle`` is neither seeded-stable across partitionings
    nor cheap — this is ONE sort).

    Positions are assigned from O(blocks) sorted-block row-count
    metadata (offset = exclusive prefix sum), per-block vectorized
    ``offset + arange`` — the running_total/set-ops house pattern; the
    driver never touches rows."""
    import hashlib

    _HK = "__hkey"
    mask = (1 << 63) - 1

    def key(t: pa.Table) -> pa.Table:
        ids = t.column(id_col).to_pylist()
        h = np.fromiter(
            (
                int.from_bytes(
                    hashlib.md5(f"{seed}:{i}".encode()).digest()[8:], "little"
                )
                & mask
                for i in ids
            ),
            dtype=np.int64,
            count=len(ids),
        )
        return pa.table({id_col: t.column(id_col), _HK: pa.array(h)})

    sch = ds.schema()
    id_type = dict(zip(sch.names, sch.types))[id_col]
    out_schema = pa.schema([(id_col, id_type), ("pos", pa.int64())])

    s = (
        ds.map_batches(key, batch_format="pyarrow")
        .sort([_HK, id_col])
        .materialize()
    )
    refs, counts = [], []
    for rb in s.iter_internal_ref_bundles():
        for blk, meta in rb.blocks:
            if meta.num_rows:
                refs.append(blk)
                counts.append(int(meta.num_rows))
    if not refs:
        return ray.data.from_arrow(out_schema.empty_table())
    offsets = np.concatenate(([0], np.cumsum(counts[:-1]))).astype(np.int64)

    @ray.remote
    def emit(blk, offset: int) -> pa.Table:
        tbl = (
            blk
            if isinstance(blk, pa.Table)
            else pa.Table.from_pandas(blk, preserve_index=False)
        )
        pos = offset + np.arange(len(tbl), dtype=np.int64)
        return pa.table(
            {id_col: tbl.column(id_col), "pos": pa.array(pos)},
            schema=out_schema,
        )

    out_refs = [emit.remote(r, int(o)) for r, o in zip(refs, offsets)]
    return ray.data.from_arrow_refs(out_refs)


def grouped_token_percentiles(
    docs: ray.data.Dataset,
    group_col: str = "source",
    qs: tuple = (0.5, 0.9, 0.99),
    text_col: str = "text",
) -> ray.data.Dataset:
    """Per-group exact token-count percentiles (percentile_disc
    semantics) — the grouped generalization of token_count_percentiles:
    ONE global sort by (group, n), then the driver reads only per-block
    RUN-LENGTH summaries of the group column (O(blocks ×
    groups-per-block) tiny rows, never data) and issues one single-row
    remote pick per (group, quantile). No per-group shuffle, no group
    materialization; a group of any size costs the same driver state.
    Null texts are excluded (SQL percentile_disc ignores NULLs); a group
    whose texts are ALL null is absent from the output (the SQL side
    would emit a NULL row — don't feed one)."""

    def nt(t: pa.Table) -> pa.Table:
        texts = t.column(text_col).to_pylist()
        gg = t.column(group_col).to_pylist()
        n, g = [], []
        for x, s in zip(texts, gg):
            if x is not None:
                n.append(len(re.split(r"\s+", x.strip())))
                g.append(s)
        return pa.table(
            {
                "g": pa.array(g, type=pa.string()),
                "n": pa.array(n, type=pa.int64()),
            }
        )

    s = (
        docs.map_batches(nt, batch_format="pyarrow")
        .sort(["g", "n"])
        .materialize()
    )

    @ray.remote
    def block_group_runs(tbl: pa.Table):
        """Run-length (group, count) of one sorted block."""
        arr = np.asarray(tbl.column("g").to_pylist(), dtype=object)
        if len(arr) == 0:
            return [], []
        new = np.ones(len(arr), dtype=bool)
        new[1:] = arr[1:] != arr[:-1]
        starts = np.flatnonzero(new)
        counts = np.diff(np.append(starts, len(arr))).astype(np.int64)
        return arr[starts].tolist(), counts.tolist()

    refs = []
    for rb in s.iter_internal_ref_bundles():
        for blk, meta in rb.blocks:
            if meta.num_rows:
                refs.append(blk)
    runs = ray.get([block_group_runs.remote(r) for r in refs])
    # per-group spans in global sorted order: (block idx, start row, count)
    spans: dict = {}
    for bi, (vals, counts) in enumerate(runs):
        row = 0
        for v, c in zip(vals, counts):
            spans.setdefault(v, []).append((bi, row, c))
            row += c
    if not spans:
        raise ValueError(
            "grouped_token_percentiles: empty population (no non-null text)"
        )

    @ray.remote
    def pick(tbl: pa.Table, row: int) -> int:
        return int(tbl.column("n")[row].as_py())

    pending = {}
    for gval, sp in sorted(spans.items()):
        cum = np.cumsum([0] + [c for _, _, c in sp])
        total = int(cum[-1])
        for q in qs:
            # percentile_disc: value at cumulative count ceil(q * total)
            idx = max(0, int(np.ceil(q * total)) - 1)
            j = int(np.searchsorted(cum, idx, side="right")) - 1
            bi, start, _ = sp[j]
            pending[(gval, q)] = pick.remote(refs[bi], start + idx - int(cum[j]))
    resolved = dict(zip(pending.keys(), ray.get(list(pending.values()))))
    groups = sorted(spans)
    cols: dict = {group_col: pa.array(groups, type=pa.string())}
    for q in qs:
        cols[f"p{int(q * 100)}"] = pa.array(
            [resolved[(g, q)] for g in groups], type=pa.int64()
        )
    return ray.data.from_arrow(pa.table(cols))


def length_band_filter(
    docs: ray.data.Dataset,
    group_col: str = "source",
    lo: float = 0.05,
    hi: float = 0.95,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> ray.data.Dataset:
    """Per-group length-band curation filter: keep documents whose token
    count lies within their OWN group's [p_lo, p_hi] band — the trim pass
    a curation pipeline runs so one verbose source doesn't set the whole
    corpus's cut. Composition of the house patterns: the grouped
    percentile profile (one sort, driver sees O(groups) rows) → one
    ``ray.put`` broadcast of the tiny {group: (lo, hi)} dict → a
    stateless streamed filter. Output: (id_col, n_tokens) for kept docs;
    null texts are dropped (they have no length)."""
    pct = grouped_token_percentiles(
        docs, group_col=group_col, qs=(lo, hi), text_col=text_col
    )
    klo, khi = f"p{int(lo * 100)}", f"p{int(hi * 100)}"
    band = {
        r[group_col]: (int(r[klo]), int(r[khi])) for r in pct.take_all()
    }
    band_ref = ray.put(band)

    def keep(t: pa.Table) -> pa.Table:
        b = ray.get(band_ref)
        ids = t.column(id_col).to_numpy(zero_copy_only=False)
        gg = t.column(group_col).to_pylist()
        texts = t.column(text_col).to_pylist()
        out_id, out_n = [], []
        for i, (g, x) in enumerate(zip(gg, texts)):
            if x is None:
                continue
            n = len(re.split(r"\s+", x.strip()))
            lo_g, hi_g = b[g]
            if lo_g <= n <= hi_g:
                out_id.append(int(ids[i]))
                out_n.append(n)
        return pa.table(
            {
                id_col: pa.array(out_id, type=pa.int64()),
                "n_tokens": pa.array(out_n, type=pa.int64()),
            }
        )

    return docs.map_batches(keep, batch_format="pyarrow")


def grouped_zscore(
    ds: ray.data.Dataset,
    group_col: str,
    value_col: str,
    out_col: str = "z",
    decimals: int = 9,
) -> ray.data.Dataset:
    """Per-group z-score standardization of an integer column (feature
    normalization for curation/training): z = (x - mean) / stddev_pop,
    rounded to ``decimals``. Zero-variance groups emit z = 0.0.

    Two passes, no per-group materialization: a per-batch (count, sum,
    sum-of-squares) combiner reduces each batch to O(groups-in-batch)
    EXACT integer partial rows, a tiny groupby settles the per-group
    moments, and the O(groups) profile broadcasts into a stateless
    streamed map. Mean and variance are evaluated from the exact integer
    sums in the SAME float64 operation order as the SQL oracle
    ((sq - sm*sm/n) / n), so the rounded outputs are bit-identical."""
    from ray.data.aggregate import Sum

    def partial(t: pa.Table) -> pa.Table:
        g = t.column(group_col).to_numpy(zero_copy_only=False)
        x = t.column(value_col).to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.argsort(g, kind="stable")
        gs = g[order]
        starts = (
            np.concatenate(([0], np.flatnonzero(gs[1:] != gs[:-1]) + 1))
            if len(gs)
            else np.empty(0, np.int64)
        )
        xs = x[order]
        return pa.table(
            {
                group_col: pa.array(gs[starts] if len(gs) else gs),
                "n": pa.array(
                    np.diff(np.concatenate([starts, [len(gs)]])).astype(np.int64)
                    if len(gs)
                    else np.empty(0, np.int64)
                ),
                "sm": pa.array(
                    np.add.reduceat(xs, starts) if len(gs) else xs
                ),
                "sq": pa.array(
                    np.add.reduceat(xs * xs, starts) if len(gs) else xs
                ),
            }
        )

    prof = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(group_col)
        .aggregate(
            Sum("n", alias_name="n"),
            Sum("sm", alias_name="sm"),
            Sum("sq", alias_name="sq"),
        )
        .to_pandas()
    )
    stats = {}
    for _, r in prof.iterrows():
        n, sm, sq = float(r["n"]), float(r["sm"]), float(r["sq"])
        mean = sm / n
        var = (sq - sm * sm / n) / n  # oracle's exact operation order
        stats[r[group_col]] = (mean, np.sqrt(var) if var > 0 else 0.0)
    stats_ref = ray.put(stats)

    def apply(t: pa.Table, *, _b=stats_ref) -> pa.Table:
        b = ray.get(_b) if isinstance(_b, ray.ObjectRef) else _b
        g = t.column(group_col).to_pylist()
        x = t.column(value_col).to_numpy(zero_copy_only=False).astype(np.float64)
        mean = np.fromiter((b[v][0] for v in g), np.float64, len(g))
        sd = np.fromiter((b[v][1] for v in g), np.float64, len(g))
        z = np.where(sd > 0, (x - mean) / np.where(sd > 0, sd, 1.0), 0.0)
        return t.append_column(out_col, pa.array(np.round(z, decimals)))

    return ds.map_batches(apply, batch_format="pyarrow")
