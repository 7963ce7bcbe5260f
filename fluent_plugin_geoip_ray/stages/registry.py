"""Stage-plugin registry: declarative per-Dataset transform stages.

The reference's user-extension surface is Fluentd's plugin registration
(``register_filter('geoip')``, ``filter_geoip.rb:17``) -- users compose a
pipeline from named filters in config text.  The Ray-Data analog (SURVEY
§2.3 "User-extension surface"): a registry of named stage factories, each
``(ds, **params) -> ds``, so a pipeline conf can carry::

    "stages": [
        {"use": "redact"},
        {"use": "hash_sample", "key_col": "turn_idx", "fraction": 0.5}
    ]

applied in order between enrich and routing (``run.py --conf``).  Register
custom stages with :func:`register_stage` -- exactly how a user plugs a
model-scoring or custom-filter stage into the engine.
"""

from __future__ import annotations

from collections.abc import Callable

_REGISTRY: dict[str, Callable] = {}


def register_stage(name: str, factory: Callable | None = None):
    """Register ``factory(ds, **params) -> ds`` under ``name``.

    Usable directly or as a decorator::

        @register_stage("my_filter")
        def my_filter(ds, threshold=0.5): ...
    """
    if factory is None:
        def deco(fn):
            _REGISTRY[name] = fn
            return fn

        return deco
    _REGISTRY[name] = factory
    return factory


def get_stage(name: str) -> Callable:
    if name not in _REGISTRY:
        raise KeyError(
            f"unknown stage {name!r}; registered: {sorted(_REGISTRY)}"
        )
    return _REGISTRY[name]


def list_stages() -> list[str]:
    return sorted(_REGISTRY)


def apply_stages(ds, stages: list[dict]):
    """Apply a conf-declared stage chain in order.

    Each entry: ``{"use": <registered name>, ...params}``."""
    for spec in stages:
        spec = dict(spec)
        name = spec.pop("use")
        ds = get_stage(name)(ds, **spec)
    return ds


# ---- built-in stages --------------------------------------------------------

@register_stage("redact")
def _redact_stage(ds, text_col: str = "text", out_col: str | None = None):
    from .text import redact

    return ds.map_batches(
        lambda t: redact(t, text_col=text_col, out_col=out_col),
        batch_format="pyarrow", zero_copy_batch=True,
    )


@register_stage("hash_sample")
def _hash_sample_stage(ds, key_col: str, fraction: float, seed: int = 0):
    from .sample import hash_sample

    return hash_sample(ds, key_col, fraction, seed=seed)


@register_stage("split")
def _split_stage(ds, key_col: str, fractions: dict, seed: int = 0):
    from .sample import split

    return split(ds, key_col, fractions, seed=seed)


@register_stage("quality")
def _quality_stage(ds):
    from .text import QualityScore

    return ds.map_batches(QualityScore, batch_format="pyarrow",
                          zero_copy_batch=True, concurrency=(1, 4))


@register_stage("token_count")
def _token_count_stage(ds):
    from .text import token_count

    return ds.map_batches(token_count, batch_format="pyarrow",
                          zero_copy_batch=True)


@register_stage("lang_id")
def _lang_id_stage(ds):
    from .text import LangId

    return ds.map_batches(LangId, batch_format="pyarrow",
                          zero_copy_batch=True, concurrency=(1, 4))


@register_stage("filter_expr")
def _filter_expr_stage(ds, expr: str):
    return ds.filter(expr=expr)


@register_stage("validate")
def _validate_stage(ds, rules: list, reason_col: str = "reject_reason",
                    drop_rejected: bool = False):
    """Conf-declared data-quality gate.  ``rules`` entries are dicts:
    ``{"rule": "in_range"|"in_set"|"matches"|"not_null"|"not_equal",
    "col": ..., ...params}`` applied in order (first failure wins)::

        {"use": "validate", "drop_rejected": true, "rules": [
            {"rule": "in_range", "col": "value", "lo": 0, "hi": 80},
            {"rule": "not_equal", "col": "event_type", "value": "error"}
        ]}
    """
    from . import validate as v

    builders = {
        "not_null": lambda r: v.not_null(r["col"]),
        "in_range": lambda r: v.in_range(r["col"], r["lo"], r["hi"]),
        "in_set": lambda r: v.in_set(r["col"], r["values"]),
        "matches": lambda r: v.matches(r["col"], r["pattern"]),
        "not_equal": lambda r: v.not_equal(r["col"], r["value"]),
    }
    compiled = []
    for r in rules:
        kind = r.get("rule")
        if kind not in builders:
            raise ValueError(
                f"unknown validate rule {kind!r}; known: {sorted(builders)}")
        compiled.append(builders[kind](r))
    out = v.validate(ds, compiled, reason_col=reason_col)
    if drop_rejected:
        out, _ = v.split_quarantine(out, reason_col=reason_col)
    return out


@register_stage("rate_limit")
def _rate_limit_stage(ds, key: str, ts_col: str, window_sec: int, k: int,
                      tie_breakers: list | None = None):
    from .window import rate_limit

    return rate_limit(ds, key, ts_col, window_sec, k,
                      tie_breakers=tie_breakers)


@register_stage("dedup_spans")
def _dedup_spans_stage(ds, key_col: str = "doc_id", text_col: str = "text",
                       window: int = 8, min_count: int = 2):
    from .dedup import dedup_spans

    return dedup_spans(ds, key_col=key_col, text_col=text_col,
                       window=window, min_count=min_count)


@register_stage("stratified_sample")
def _stratified_sample_stage(ds, stratum_col: str, key_col: str,
                             fraction: float, seed: int = 0):
    from .sample import stratified_sample

    return stratified_sample(ds, stratum_col, key_col, fraction, seed=seed)


@register_stage("zscore_flag")
def _zscore_stage(ds, key: str, value: str, threshold: float = 3.0):
    from .aggregate import zscore_flag

    return zscore_flag(ds, key, value, threshold=threshold)


@register_stage("pivot_counts")
def _pivot_stage(ds, key: str, pivot_col: str, values: list,
                 other: str | None = None):
    from .aggregate import pivot_counts

    return pivot_counts(ds, key, pivot_col, values=list(values), other=other)


@register_stage("distinct")
def _distinct_stage(ds, cols: list | None = None):
    from .aggregate import distinct_rows

    return distinct_rows(ds, cols=list(cols) if cols else None)


@register_stage("sample_k")
def _sample_k_stage(ds, key_col: str, k: int, seed: int = 0):
    import ray.data as rd

    from .sample import sample_k

    out = sample_k(ds, key_col, k, seed=seed)
    return out if hasattr(out, "map_batches") else rd.from_arrow(out)


@register_stage("funnel")
def _funnel_stage(ds, key: str, ts_col: str, type_col: str, steps: list):
    from .window import funnel

    return funnel(ds, key, ts_col, type_col, steps=list(steps))


@register_stage("embed")
def _embed_stage(ds, text_col: str = "text", out_col: str = "embedding",
                 concurrency: int = 4, **kw):
    from .ml import embed_texts

    return embed_texts(ds, text_col=text_col, out_col=out_col,
                       concurrency=concurrency, **kw)


@register_stage("running_agg")
def _running_agg_stage(ds, key: str, order_by: list, aggs: list):
    from .window import running_agg

    return running_agg(ds, key, order_by=list(order_by),
                       aggs=[tuple(a) for a in aggs])


@register_stage("anti_join")
def _anti_join_stage(ds, right_path: str, on: str,
                     right_on: str | None = None, num_buckets: int = 32):
    import ray.data as rd

    from .join import anti_join_big

    right = rd.read_parquet(right_path,
                            columns=[right_on or on])
    return anti_join_big(ds, right, on=on, right_on=right_on,
                         num_buckets=num_buckets)


@register_stage("ip_subnet")
def _ip_subnet_stage(ds, ip_col: str = "ip", bits: int = 16,
                     out: str = "subnet"):
    from .parse import ip_subnet_column

    return ip_subnet_column(ds, ip_col=ip_col, bits=bits, out=out)


@register_stage("rolling_agg")
def _rolling_agg_stage(ds, key: str, order_by: list, aggs: list,
                       window: int):
    from .window import rolling_agg

    return rolling_agg(ds, key, order_by=list(order_by),
                       aggs=[tuple(a) for a in aggs], window=window)


@register_stage("rolling_time_agg")
def _rolling_time_agg_stage(ds, key: str, ts_col: str, aggs: list,
                            preceding_sec: float):
    from .window import rolling_time_agg

    return rolling_time_agg(ds, key, ts_col,
                            aggs=[tuple(a) for a in aggs],
                            preceding_sec=preceding_sec)


@register_stage("semi_join")
def _semi_join_stage(ds, right_path: str, on: str,
                     right_on: str | None = None, num_buckets: int = 32):
    import ray.data as rd

    from .join import semi_join_big

    right = rd.read_parquet(right_path, columns=[right_on or on])
    return semi_join_big(ds, right, on=on, right_on=right_on,
                         num_buckets=num_buckets)


@register_stage("group_stats")
def _group_stats_stage(ds, keys: list, aggs: list):
    from .aggregate import group_stats

    return group_stats(ds, list(keys), [tuple(a) for a in aggs])


@register_stage("ewma")
def _ewma_stage(ds, key: str, order_by: list, src: str, alpha: float,
                out: str = "ewma"):
    from .window import ewma_by

    return ewma_by(ds, key, list(order_by), src, alpha=alpha, out=out)
