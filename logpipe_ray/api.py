"""Declarative pipeline-builder API — the user-extension surface.

Parity with the reference's step-list assembly (SURVEY.md §2.7,
/root/reference/bin/logpipe.js:339-359: an ordered array of Transform
streams handed to processFile). Here the step list compiles onto a
lazy ray.data.Dataset plan; nothing executes until a sink/consume
call.

    from logpipe_ray.api import Pipeline
    result = (
        Pipeline.read("/data/logs/*.parquet")
        .parse_tokens()                       # detokenize + grok parse
        .enrich()                             # lookup-dict enrichment
        .filter({"level": "ERROR", "message": "~timeout"})
        .select(["doc_id", "level", "message", "meta.env"])
        .count_by("level")
        .to_pandas()
    )

Custom steps: .map(fn) takes any Arrow-batch callable (the analog of
createMapper), .map_stateful(Cls, concurrency=N) any callable class
(the analog of a custom worker task, worker.js:27-30).
"""

from __future__ import annotations

from typing import Callable

from ray.data import Dataset

from .sources.factory import read_any
from .stages.aggregate import count_groupby, stats_groupby, top_k
from .stages.enrich import EnrichStage, enrich_batch
from .stages.parse import parse_batch
from .stages.route import route_batch
from .stages.transform import (
    add_constant_fields,
    add_fields,
    hash_column,
    make_filter,
    map_preserving,
    rename_fields,
    select_fields,
    sha256_iterated,
)


class Pipeline:
    def __init__(self, ds: Dataset):
        self._ds = ds

    # ------------------------------------------------------------- sources
    @classmethod
    def read(cls, path, fmt: str | None = None, **kw) -> "Pipeline":
        return cls(read_any(path, fmt=fmt, **kw))

    @classmethod
    def from_dataset(cls, ds: Dataset) -> "Pipeline":
        return cls(ds)

    # --------------------------------------------------------------- steps
    def _chain(self, fn, **kw) -> "Pipeline":
        return Pipeline(
            self._ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True, **kw)
        )

    def parse_tokens(self) -> "Pipeline":
        return self._chain(parse_batch, batch_size=None)

    def enrich(self, mode: str = "task", concurrency=(2, 8)) -> "Pipeline":
        if mode == "actor":
            return self._chain(EnrichStage, concurrency=concurrency)
        return self._chain(enrich_batch, batch_size=None)

    def route(self) -> "Pipeline":
        return self._chain(route_batch, batch_size=None)

    def filter(self, criteria, include_matches: bool = True) -> "Pipeline":
        return self._chain(make_filter(criteria, include_matches))

    def select(self, paths: list[str]) -> "Pipeline":
        return self._chain(select_fields(paths))

    def rename(self, mapping: dict, remove_original: bool = True) -> "Pipeline":
        return self._chain(rename_fields(mapping, remove_original))

    def add_fields(self, adders: dict) -> "Pipeline":
        return self._chain(add_fields(adders))

    def add_constants(self, values: dict) -> "Pipeline":
        return self._chain(add_constant_fields(values))

    def hash(self, field: str, result_field: str | None = None, buckets=None) -> "Pipeline":
        return self._chain(hash_column(field, result_field, buckets))

    def hash_sha256(self, field: str, iterations: int = 10_000) -> "Pipeline":
        return self._chain(sha256_iterated(field, iterations), batch_size=2048)

    def map(self, fn: Callable, preserve_on_error: bool = False, **kw) -> "Pipeline":
        return self._chain(map_preserving(fn) if preserve_on_error else fn, **kw)

    def map_stateful(self, cls, concurrency=(1, 4), batch_size=4096, **ctor) -> "Pipeline":
        return Pipeline(
            self._ds.map_batches(
                cls,
                fn_constructor_kwargs=ctor,
                batch_format="pyarrow",
                batch_size=batch_size,
                concurrency=concurrency,
            )
        )

    # --------------------------------------------------------- aggregates
    def count_by(self, key: str | list[str], alias: str = "cnt") -> "Pipeline":
        keys = [key] if isinstance(key, str) else key
        return Pipeline(count_groupby(self._ds, keys, alias=alias))

    def stats(self, key: str, value: str, prefix: str | None = None) -> "Pipeline":
        return Pipeline(stats_groupby(self._ds, key, value, prefix=prefix))

    def top_k(self, sort_keys: list[tuple[str, str]], k: int) -> "Pipeline":
        return Pipeline(top_k(self._ds, sort_keys, k))

    # --------------------------------------------- round-3 operator families
    def validate(self, rules: list[dict]) -> "Pipeline":
        """Declarative data-contract report (stages/validate.py)."""
        from .stages.validate import validation_report

        return Pipeline(validation_report(self._ds, rules))

    def latest_by(self, key: str, order_cols: list[str], **kw) -> "Pipeline":
        """CDC latest-snapshot argmax per key (stages/aggregate.py)."""
        from .stages.aggregate import latest_by_key

        return Pipeline(latest_by_key(self._ds, key, order_cols, **kw))

    def global_top_k(
        self, value_col: str, tiebreak_col: str, k: int, **kw
    ) -> "Pipeline":
        """Exact k best rows by (value DESC, id) with no global sort."""
        from .stages.aggregate import global_topk_filter

        return Pipeline(global_topk_filter(self._ds, value_col, tiebreak_col, k, **kw))

    def chunk_text(
        self, chunk_words: int = 64, overlap: int = 16, **kw
    ) -> "Pipeline":
        """Overlapping fixed-width word-window chunking (1 row -> N)."""
        from .functions.corpusfns import chunk_batch

        return self._chain(
            lambda t: chunk_batch(t, chunk_words=chunk_words, overlap=overlap, **kw)
        )

    def join_auto(
        self,
        dim: "Pipeline | Dataset",
        key: str,
        dim_key: str,
        dim_cols: list[str],
        **kw,
    ) -> "Pipeline":
        """Cost-based inner join: probes dim size + fact-key skew and
        routes to broadcast / skew split / plain hash
        (stages/join.py:auto_join)."""
        from .stages.join import auto_join

        d = dim.dataset if isinstance(dim, Pipeline) else dim
        return Pipeline(auto_join(self._ds, d, key, dim_key, dim_cols, **kw))

    def join_dim(
        self,
        dim: "Pipeline | Dataset",
        key: str,
        dim_key: str,
        dim_cols: list[str],
        hot_threshold: int = 1_000_000,
        **kw,
    ) -> "Pipeline":
        """Skew-aware fact-dim inner join (stages/join.py:skew_join)."""
        from .stages.join import skew_join

        d = dim.dataset if isinstance(dim, Pipeline) else dim
        return Pipeline(
            skew_join(self._ds, d, key, dim_key, dim_cols, hot_threshold, **kw)
        )

    def join_window(
        self,
        other: "Pipeline | Dataset",
        key: str,
        left_ts: str,
        right_ts: str,
        window_us: int,
        **kw,
    ) -> "Pipeline":
        """Time-windowed per-key stream join (all matches in window)."""
        from .stages.join import window_join

        o = other.dataset if isinstance(other, Pipeline) else other
        return Pipeline(
            window_join(self._ds, o, key, left_ts, right_ts, window_us, **kw)
        )

    # --------------------------------------------------------------- sinks
    def sample_weighted(
        self, id_col: str, weight_col: str, w_cap: int, rate_pct: int
    ) -> "Pipeline":
        """Deterministic weighted Poisson sample (functions/sampling.py)."""
        from .functions.sampling import weighted_hash_sample

        return Pipeline(
            weighted_hash_sample(self._ds, id_col, weight_col, w_cap, rate_pct)
        )

    def split(self, id_col: str, splits: dict[str, int] | None = None) -> "Pipeline":
        """Deterministic train/val/test assignment (functions/sampling.py)."""
        from .functions.sampling import hash_split

        return Pipeline(hash_split(self._ds, id_col, splits))

    def bigram_lift(self, tokens_col: str = "tokens", k: int = 50, **kw) -> "Pipeline":
        """Top-k collocations by observed/expected ratio (functions/tokens.py)."""
        from .functions.tokens import bigram_lift_topk

        return Pipeline(bigram_lift_topk(self._ds, tokens_col, k=k, **kw))

    def pca(self, col: str, id_col: str, k: int = 2) -> "Pipeline":
        """Top-k principal-component projection (functions/linalg.py)."""
        from .functions.linalg import pca_project

        return Pipeline(pca_project(self._ds, col, id_col, k=k))

    def except_keys(self, other: "Pipeline | Dataset", keys: list[str], **kw) -> "Pipeline":
        """SQL EXCEPT: distinct key tuples absent from ``other``
        (stages/setops.py)."""
        from .stages.setops import except_distinct

        o = other._ds if isinstance(other, Pipeline) else other
        return Pipeline(except_distinct(self._ds, o, keys, **kw))

    def intersect_keys(self, other: "Pipeline | Dataset", keys: list[str], **kw) -> "Pipeline":
        """SQL INTERSECT: distinct key tuples present on both sides
        (stages/setops.py)."""
        from .stages.setops import intersect_distinct

        o = other._ds if isinstance(other, Pipeline) else other
        return Pipeline(intersect_distinct(self._ds, o, keys, **kw))

    def mad_by(self, key: str, value_col: str, **kw) -> "Pipeline":
        """Per-group median absolute deviation via distributed
        selection (stages/aggregate.py grouped_mad)."""
        import ray.data as rd

        from .stages.aggregate import grouped_mad

        return Pipeline(rd.from_arrow(grouped_mad(self._ds, key, value_col, **kw)))

    def corr_by(self, key: str, x_col: str, y_col: str, **kw) -> "Pipeline":
        """Per-group Pearson correlation over integer-exact columns
        (stages/aggregate.py grouped_corr_fixed)."""
        from .stages.aggregate import grouped_corr_fixed

        return Pipeline(grouped_corr_fixed(self._ds, key, x_col, y_col, **kw))

    def regr_by(self, key: str, x_col: str, y_col: str, **kw) -> "Pipeline":
        """Per-group least-squares slope + intercept over integer-exact
        columns (stages/aggregate.py grouped_regr_fixed)."""
        from .stages.aggregate import grouped_regr_fixed

        return Pipeline(grouped_regr_fixed(self._ds, key, x_col, y_col, **kw))

    def seq_dedup_stats(
        self, tokens_col: str = "tokens", by: str = "source", **kw
    ) -> "Pipeline":
        """Per-group exact duplicate audit of token arrays
        (functions/tokens.py sequence_dedup_stats)."""
        from .functions.tokens import sequence_dedup_stats

        return Pipeline(sequence_dedup_stats(self._ds, tokens_col, by, **kw))

    def seq_distinct_counts(
        self, tokens_col: str = "tokens", id_col: str = "doc_id"
    ) -> "Pipeline":
        """Per-sequence (n_tok, n_distinct) vocabulary-richness map
        (functions/tokens.py distinct_token_counts)."""
        from .functions.tokens import distinct_token_counts

        return Pipeline(distinct_token_counts(self._ds, tokens_col, id_col))

    def profile(self, columns: list[str]) -> "Pipeline":
        """Per-column row / null / exact-distinct audit
        (stages/profile.py profile_columns)."""
        from .stages.profile import profile_columns

        return Pipeline(profile_columns(self._ds, columns))

    def chunk_tokens(self, width: int = 256, step: int = 192, **kw) -> "Pipeline":
        """Overlapping token-context chunking
        (functions/tokens.py chunk_tokens)."""
        from .functions.tokens import chunk_tokens

        return Pipeline(chunk_tokens(self._ds, width, step, **kw))

    def mlm_mask(self, rate_pct: int = 15, **kw) -> "Pipeline":
        """Deterministic MLM masking example builder
        (functions/tokens.py mlm_mask)."""
        from .functions.tokens import mlm_mask

        return Pipeline(mlm_mask(self._ds, rate_pct=rate_pct, **kw))

    def span_corrupt(self, span_w: int = 3, rate_pct: int = 15, **kw) -> "Pipeline":
        """Deterministic T5-style span-corruption example builder
        (functions/tokens.py span_corrupt)."""
        from .functions.tokens import span_corrupt

        return Pipeline(span_corrupt(self._ds, span_w=span_w, rate_pct=rate_pct, **kw))

    def cube(self, keys: list[str], sum_cols: dict | None = None, **kw) -> "Pipeline":
        """GROUP BY CUBE counts+sums from one pass (stages/aggregate.py
        cube_agg)."""
        import ray.data as rd

        from .stages.aggregate import cube_agg

        return Pipeline(rd.from_arrow(cube_agg(self._ds, keys, sum_cols, **kw)))

    def densify_time(self, key: str, ts_col: str, unit: str = "hour", **kw) -> "Pipeline":
        """Gap-filled per-(key, bucket) counts over the full span
        (stages/aggregate.py dense_time_counts)."""
        from .stages.aggregate import dense_time_counts

        return Pipeline(dense_time_counts(self._ds, key, ts_col, unit, **kw))

    def ewma_by(
        self, key: str, order_cols: list[str], value_col: str, alpha: float = 0.3, **kw
    ) -> "Pipeline":
        """Per-key last EWMA (adjust=False recursion) via the bucketed
        scan (stages/aggregate.py grouped_ewma_last)."""
        from .stages.aggregate import grouped_ewma_last

        return Pipeline(
            grouped_ewma_last(self._ds, key, order_cols, value_col, alpha, **kw)
        )

    def editdist_pairs(
        self, id_col: str, text_col: str, len_col: str, **kw
    ) -> "Pipeline":
        """Blocked byte-level edit-distance near-dup pairs
        (functions/dedup.py blocked_editdist_pairs)."""
        from .functions.dedup import blocked_editdist_pairs

        return Pipeline(
            blocked_editdist_pairs(self._ds, id_col, text_col, len_col, **kw)
        )

    def ohlc_by(
        self, keys: list[str], order_cols: list[str], value_col: str
    ) -> "Pipeline":
        """Per-group OHLC bars: ordered first/last + min/max/count via
        mergeable partials (stages/aggregate.py grouped_ohlc)."""
        from .stages.aggregate import grouped_ohlc

        return Pipeline(grouped_ohlc(self._ds, keys, order_cols, value_col))

    def spearman_by(self, key: str, x_col: str, y_col: str, **kw) -> "Pipeline":
        """Per-group Spearman rank correlation over bounded-domain int
        columns — no global sort (stages/aggregate.py
        grouped_spearman)."""
        from .stages.aggregate import grouped_spearman

        return Pipeline(grouped_spearman(self._ds, key, x_col, y_col, **kw))

    def ks_vs_global(self, key: str, value_col: str, **kw) -> "Pipeline":
        """Exact per-group Kolmogorov-Smirnov drift vs the whole
        dataset, integer ppm (stages/aggregate.py
        grouped_ks_vs_global)."""
        import ray.data as rd

        from .stages.aggregate import grouped_ks_vs_global

        return Pipeline(
            rd.from_arrow(grouped_ks_vs_global(self._ds, key, value_col, **kw))
        )

    def cusum_by(self, key: str, bucket_col: str, **kw) -> "Pipeline":
        """Per-key CUSUM change-point over a dense bucket grid
        (stages/aggregate.py cusum_changepoint)."""
        import ray.data as rd

        from .stages.aggregate import cusum_changepoint

        return Pipeline(
            rd.from_arrow(cusum_changepoint(self._ds, key, bucket_col, **kw))
        )

    def sweep_concurrent(
        self, t0_col: str, t1_col: str, bucket_us: int, out_grain_us: int, **kw
    ) -> "Pipeline":
        """Interval sweep-line: peak concurrently-open intervals per
        grain (stages/aggregate.py sweep_max_concurrent)."""
        from .stages.aggregate import sweep_max_concurrent

        return Pipeline(
            sweep_max_concurrent(
                self._ds, t0_col, t1_col, bucket_us, out_grain_us, **kw
            )
        )

    def throttle(
        self, key: str, ts_col: str, tiebreak_col: str, gap_us: int
    ) -> "Pipeline":
        """Debounce: keep rows >= gap_us after the key's previous row
        (LAG semantics; stages/aggregate.py lag_gap_flag)."""
        import pyarrow.compute as _pc

        from .stages.aggregate import lag_gap_flag

        flags = lag_gap_flag(self._ds, key, ts_col, tiebreak_col, gap_us)

        def _keep(t):
            t = t.filter(_pc.equal(t["kept"], 1))
            return t.drop_columns(["kept"])

        return Pipeline(flags.map_batches(_keep, batch_format="pyarrow"))

    def snapshot_diff(self, key: str, cond_col: str, value_col: str) -> "Pipeline":
        """CDC snapshot diff (added/changed/unchanged) without a join
        (stages/aggregate.py snapshot_diff)."""
        from .stages.aggregate import snapshot_diff

        return Pipeline(snapshot_diff(self._ds, key, cond_col, value_col))

    def top_k_ties(
        self, group_keys: list[str], rank_keys: list[tuple], k: int, **kw
    ) -> "Pipeline":
        """Per-group top-k with SQL RANK() tie semantics
        (stages/aggregate.py grouped_top_k_ties)."""
        from .stages.aggregate import grouped_top_k_ties

        return Pipeline(grouped_top_k_ties(self._ds, group_keys, rank_keys, k, **kw))

    def heavy_hitters(
        self, keys: list[str], thr_num: int, thr_den: int, **kw
    ) -> "Pipeline":
        """EXACT heavy hitters (count >= ceil(N*thr_num/thr_den)) via
        mergeable Misra-Gries candidates + one exact verify pass — the
        full key domain never shuffles (stages/aggregate.py
        heavy_hitters)."""
        import ray.data as rd

        from .stages.aggregate import heavy_hitters

        return Pipeline(
            rd.from_arrow(heavy_hitters(self._ds, keys, thr_num, thr_den, **kw))
        )

    def pareto_by(
        self, m1_col: str, m2_col: str, keep_cols: list[str]
    ) -> "Pipeline":
        """2-D Pareto frontier (maximize both metrics): per-batch local
        skyline -> bounded survivor fold (stages/aggregate.py
        pareto_frontier)."""
        import ray.data as rd

        from .stages.aggregate import pareto_frontier

        return Pipeline(
            rd.from_arrow(pareto_frontier(self._ds, m1_col, m2_col, keep_cols))
        )

    def scd2(
        self, key: str, ts_col: str, tiebreak_col: str, attr_col: str, **kw
    ) -> "Pipeline":
        """SCD type-2 validity intervals from a change stream
        (stages/aggregate.py scd2_intervals)."""
        from .stages.aggregate import scd2_intervals

        return Pipeline(
            scd2_intervals(self._ds, key, ts_col, tiebreak_col, attr_col, **kw)
        )

    def resample_linear(
        self, key: str, ts_col: str, tiebreak_col: str, value_col: str,
        grid_us: int, **kw
    ) -> "Pipeline":
        """Per-key linear-interpolation resampling onto a fixed time
        grid (stages/aggregate.py grouped_resample_linear)."""
        from .stages.aggregate import grouped_resample_linear

        return Pipeline(
            grouped_resample_linear(
                self._ds, key, ts_col, tiebreak_col, value_col, grid_us, **kw
            )
        )

    def growth_accounting(
        self, key: str, ts_col: str, period_us: int, **kw
    ) -> "Pipeline":
        """Per-period new/retained/resurrected/churned decomposition
        (stages/aggregate.py growth_accounting)."""
        from .stages.aggregate import growth_accounting

        return Pipeline(growth_accounting(self._ds, key, ts_col, period_us, **kw))

    def adaptive_sessions(
        self, key: str, ts_col: str, tiebreak_col: str, gap_factor: float = 3.0,
        **kw,
    ) -> "Pipeline":
        """Session counts with per-key median-gap break thresholds
        (stages/aggregate.py adaptive_sessionize_counts)."""
        from .stages.aggregate import adaptive_sessionize_counts

        return Pipeline(
            adaptive_sessionize_counts(
                self._ds, key, ts_col, tiebreak_col, gap_factor, **kw
            )
        )

    def semi_bloom(
        self, col: str, keys: "Pipeline | Dataset", key_col: str, **kw
    ) -> "Pipeline":
        """Exact semi join with a Bloom pre-filter for unbroadcastable
        key sets (functions/sketches.py bloom_semi_join)."""
        from .functions.sketches import bloom_semi_join

        k = keys._ds if isinstance(keys, Pipeline) else keys
        return Pipeline(bloom_semi_join(self._ds, col, k, key_col, **kw))

    def triangles(self, u_col: str = "u", v_col: str = "v", **kw) -> "Pipeline":
        """Per-node triangle counts + clustering coefficient over an
        undirected edge stream (functions/graph.py triangle_counts)."""
        from .functions.graph import triangle_counts

        return Pipeline(triangle_counts(self._ds, u_col, v_col, **kw))

    def approx_quantiles_by(
        self, key: str, value_col: str, qs: list[float], **kw
    ):
        """Per-group approximate quantiles from mergeable compressed
        summaries — terminal verb, returns an Arrow table
        (functions/sketches.py grouped_approx_quantiles)."""
        from .functions.sketches import grouped_approx_quantiles

        return grouped_approx_quantiles(self._ds, key, value_col, qs, **kw)

    def bfs(
        self, seeds: "Pipeline | Dataset", max_depth: int = 3, **kw
    ) -> "Pipeline":
        """Multi-source BFS hop distances over an undirected edge
        stream (functions/graph.py bfs_distances)."""
        from .functions.graph import bfs_distances

        s = seeds._ds if isinstance(seeds, Pipeline) else seeds
        return Pipeline(bfs_distances(self._ds, s, max_depth, **kw))

    def mix_to_budget(
        self, group_col: str, weight_col: str, budgets: dict, **kw
    ) -> "Pipeline":
        """Deterministic greedy fill of each group to a weight budget
        (functions/sampling.py token_budget_mix)."""
        from .functions.sampling import token_budget_mix

        return Pipeline(
            token_budget_mix(self._ds, group_col, weight_col, budgets, **kw)
        )

    def mmr(
        self, id_col: str, text_col: str, quality_col: str, k: int = 20, **kw
    ) -> "Pipeline":
        """MMR diverse top-k selection (functions/sampling.py
        mmr_select)."""
        import ray.data as rd

        from .functions.sampling import mmr_select

        return Pipeline(
            rd.from_arrow(
                mmr_select(self._ds, id_col, text_col, quality_col, k, **kw)
            )
        )

    def logit_fit(self, x_cols: list[str], y_col: str, **kw):
        """Binary logistic regression by distributed IRLS — terminal
        verb, returns (coef, intercept, n, iters, loss)
        (functions/linalg.py logistic_fit)."""
        from .functions.linalg import logistic_fit

        return logistic_fit(self._ds, x_cols, y_col, **kw)

    def sink(self, sink_type: str, **options) -> dict:
        from .sinks.factory import create_sink

        return create_sink(sink_type, **options)(self._ds)

    # ------------------------------------------------------------ consume
    @property
    def dataset(self) -> Dataset:
        return self._ds

    def to_pandas(self):
        return self._ds.to_pandas()

    def count(self) -> int:
        return self._ds.count()

    def take(self, n: int = 20):
        return self._ds.take(n)
