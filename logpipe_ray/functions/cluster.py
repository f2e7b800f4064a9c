"""Document topic clustering: hashing-trick TF features + k-means.

The corpus-organization step a curation pipeline runs before
cluster-aware sampling or SemDeDup-style dedup: map every document
into a fixed-dimension feature space with the hashing trick (no
vocabulary build, no global state), then cluster with the same
mergeable-Lloyd k-means the ANN/SemDeDup family uses.

Scale shape: featurization is a single stateless map_batches pass —
per batch one lower+split, one vectorized 64-bit string hash over the
flat word buffer, one np.add.at scatter into a (rows x dim) matrix,
one L2 normalize. No shuffle, no vocabulary table, memory bounded by
batch x dim floats. k-means shuffles only (k x dim) partial sums per
batch (build_ivf_centroids); assignment is one broadcast matmul.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
from ray.data import Dataset

from .search import WORD_SPLIT_RE


def hashed_tf_features(
    ds: Dataset,
    text_col: str = "text",
    id_col: str = "doc_id",
    dim: int = 128,
) -> Dataset:
    """(id, feat: list<float32>) — L2-normalized hashed term-frequency
    vectors. Documents with no words get a zero vector (kept: dropping
    rows in a featurizer silently shrinks the corpus)."""
    from ..stages.transform import hash64_strings

    def featurize(t: pa.Table) -> pa.Table:
        text = t[text_col]
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        words = pc.split_pattern_regex(pc.utf8_lower(text), WORD_SPLIT_RE)
        flat = words.flatten()
        lengths = np.asarray(
            pc.list_value_length(words).fill_null(0), dtype=np.int64
        )
        nonempty = np.asarray(pc.not_equal(flat, "").fill_null(False))
        buckets = (hash64_strings(flat) % np.uint64(dim)).astype(np.int64)
        row_idx = np.repeat(np.arange(len(t), dtype=np.int64), lengths)
        mat = np.zeros((len(t), dim), dtype=np.float64)
        np.add.at(mat, (row_idx[nonempty], buckets[nonempty]), 1.0)
        norms = np.linalg.norm(mat, axis=1)
        mat /= np.maximum(norms, 1e-12)[:, None]
        return pa.table(
            {
                id_col: t[id_col],
                "feat": pa.array(list(mat.astype(np.float32))),
            }
        )

    return ds.map_batches(featurize, batch_format="pyarrow")


def topic_clusters(
    ds: Dataset,
    text_col: str = "text",
    id_col: str = "doc_id",
    dim: int = 128,
    n_clusters: int = 8,
    seed: int = 11,
) -> Dataset:
    """Cluster documents by hashed-TF cosine and return the per-cluster
    summary (cluster_id, n_docs, rep_doc_id = min id). Deterministic:
    k-means init is the systematic id-ordered sample, so the same
    corpus always yields the same clustering regardless of CPU count
    or block layout."""
    from ray.data.aggregate import Count, Min

    from .ann import _vec_matrix, build_ivf_centroids

    # materialize: the feature table ((rows x dim) float32, ~0.05% of
    # the text volume at dim=128) is re-read by every Lloyd iteration
    # plus the assignment pass — recomputing featurization 5x would
    # re-read the full text instead; the object store spills it if
    # it outgrows memory
    feats = hashed_tf_features(ds, text_col, id_col, dim=dim).materialize()
    cents = build_ivf_centroids(
        feats, n_centroids=n_clusters, vec_col="feat", seed=seed, id_col=id_col
    )
    cn = cents / np.maximum(np.linalg.norm(cents, axis=1)[:, None], 1e-12)

    def assign(t: pa.Table) -> pa.Table:
        m = _vec_matrix(t["feat"]).astype(np.float64)
        cid = np.argmax(m @ cn.T, axis=1)
        return pa.table(
            {
                id_col: t[id_col],
                "cluster_id": pa.array(cid.astype(np.int64)),
            }
        )

    assigned = feats.map_batches(assign, batch_format="pyarrow")
    out_schema = pa.schema(
        [
            ("cluster_id", pa.int64()),
            ("n_docs", pa.int64()),
            ("rep_doc_id", pa.int64()),
        ]
    )

    def finalize(t: pa.Table) -> pa.Table:
        if t.num_columns == 0:
            return out_schema.empty_table()
        return pa.table(
            {
                "cluster_id": t["cluster_id"],
                "n_docs": t["count()"],
                "rep_doc_id": t[f"min({id_col})"],
            }
        )

    return (
        assigned.groupby("cluster_id")
        .aggregate(Count(), Min(id_col))
        .map_batches(finalize, batch_format="pyarrow")
    )
