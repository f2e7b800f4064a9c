"""Distributed linear algebra over embedding columns.

PCA is the classic pre-whitening step before embedding dedup / ANN
(SemDeDup-style pipelines center + project embeddings first); the
reference has no linear algebra at all (SURVEY.md §2 — it is a log
pipeline), so this family is target-only.

Scale shape: moment accumulation is a perfect map-combine — each batch
contributes (n, sum, X^T X), d + d^2 floats regardless of batch rows —
so a 100-TB embedding table reduces to one tiny driver-side eigh of a
d x d covariance (d = embedding dim, typically 64-4096; 4096^2 doubles
= 128 MB, still driver-safe). The projection pass is an independent
shuffle-free map. Floating-point sums depend on merge order, so
results are deterministic only up to ~1e-12 relative — the driver
check is rows-only by design (no SQL oracle could express eigh
anyway); pytest pins the subspace against numpy within tolerance.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ray.data import Dataset


def _batch_matrix(col) -> np.ndarray:
    """(rows, d) float64 view of a list<float> column — zero-copy
    flatten, one widening astype."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    flat = col.flatten().to_numpy(zero_copy_only=False)
    n = len(col)
    return flat.astype(np.float64, copy=False).reshape(n, -1)


def pca_fit(ds: Dataset, col: str = "embedding", k: int = 2):
    """Fit a k-component PCA: returns (mean, components) where
    ``components`` is (d, k), columns = top-k eigenvectors of the
    sample covariance, eigenvalue-descending, sign-fixed so each
    column's largest-|.| entry is positive (determinism up to the
    float-merge tolerance).

    One streaming pass: per-batch moment partials (n, colsum, gram)
    merged on the driver — volume per batch is d + d^2 doubles,
    independent of row count."""
    import ray as _ray

    def moments(t: pa.Table) -> pa.Table:
        X = _batch_matrix(t[col])
        g = X.T @ X
        return pa.table(
            {
                "n": pa.array([X.shape[0]], pa.int64()),
                "s": pa.array([X.sum(axis=0).tolist()], pa.list_(pa.float64())),
                "g": pa.array([g.ravel().tolist()], pa.list_(pa.float64())),
            }
        )

    parts = [
        t
        for t in _ray.get(
            ds.map_batches(moments, batch_format="pyarrow").to_arrow_refs()
        )
        if t.num_columns and t.num_rows
    ]
    if not parts:
        raise ValueError("pca_fit: empty input")
    tbl = pa.concat_tables(parts)
    n = int(pc.sum(tbl["n"]).as_py())
    s = np.add.reduce(
        [np.asarray(x, dtype=np.float64) for x in tbl["s"].to_pylist()]
    )
    g = np.add.reduce(
        [np.asarray(x, dtype=np.float64) for x in tbl["g"].to_pylist()]
    )
    d = len(s)
    mean = s / n
    cov = g.reshape(d, d) / n - np.outer(mean, mean)
    evals, evecs = np.linalg.eigh(cov)  # ascending
    order = np.argsort(evals)[::-1][:k]
    W = evecs[:, order]
    # sign convention: largest-|.| entry of each component positive
    flip = W[np.abs(W).argmax(axis=0), np.arange(W.shape[1])] < 0
    W[:, flip] *= -1.0
    return mean, W


def pca_project(
    ds: Dataset,
    col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 2,
) -> Dataset:
    """Project every embedding onto the top-k principal components:
    (id_col, pc1..pck). Fit is one moment pass (pca_fit); the
    projection is a shuffle-free vectorized map over a ray.put
    broadcast of (mean, W)."""
    import ray as _ray

    mean, W = pca_fit(ds, col, k)
    ref = _ray.put((mean, W))

    def project(t: pa.Table) -> pa.Table:
        m, w = _ray.get(ref)
        X = _batch_matrix(t[col])
        P = (X - m) @ w
        cols = {id_col: t[id_col]}
        for j in range(P.shape[1]):
            cols[f"pc{j + 1}"] = pa.array(P[:, j], pa.float64())
        return pa.table(cols)

    return ds.map_batches(project, batch_format="pyarrow")


def linreg_fit(
    ds: Dataset, x_cols: list[str], y_col: str, intercept: bool = True
):
    """Fit ordinary least squares y = Xβ (+ intercept) over ANY row
    count in ONE streaming pass — the normal-equations plan: each
    batch contributes (n, XᵀX, Xᵀy) partials ((d+1)² + (d+1) doubles
    regardless of rows), the driver solves the tiny d x d system.
    Returns (coef: dict col->float, intercept: float, n: int).

    Float sums merge in block order, so coefficients are deterministic
    only up to ~1e-12 relative (same contract as pca_fit) — the query
    surface is rows-only by design; pytest pins against numpy lstsq."""
    import ray as _ray

    d = len(x_cols)

    def moments(t: pa.Table) -> pa.Table:
        cols = [
            t[c].to_numpy(zero_copy_only=False).astype(np.float64)
            for c in x_cols
        ]
        y = t[y_col].to_numpy(zero_copy_only=False).astype(np.float64)
        ok = ~np.isnan(y)
        for c in cols:
            ok &= ~np.isnan(c)
        y = y[ok]
        X = np.column_stack([c[ok] for c in cols])
        if intercept:
            X = np.column_stack([X, np.ones(len(y))])
        g = X.T @ X
        xy = X.T @ y
        return pa.table(
            {
                "n": pa.array([len(y)], pa.int64()),
                "g": pa.array([g.ravel().tolist()], pa.list_(pa.float64())),
                "xy": pa.array([xy.tolist()], pa.list_(pa.float64())),
            }
        )

    parts = [
        t
        for t in _ray.get(
            ds.map_batches(moments, batch_format="pyarrow").to_arrow_refs()
        )
        if t.num_columns and t.num_rows
    ]
    if not parts:
        raise ValueError("linreg_fit: empty input")
    tbl = pa.concat_tables(parts)
    n = int(pc.sum(tbl["n"]).as_py())
    k = d + (1 if intercept else 0)
    g = np.add.reduce(
        [np.asarray(x, dtype=np.float64) for x in tbl["g"].to_pylist()]
    ).reshape(k, k)
    xy = np.add.reduce(
        [np.asarray(x, dtype=np.float64) for x in tbl["xy"].to_pylist()]
    )
    beta = np.linalg.solve(g, xy)
    coef = dict(zip(x_cols, beta[:d].tolist()))
    b0 = float(beta[d]) if intercept else 0.0
    return coef, b0, n


def logistic_fit(
    ds: Dataset,
    x_cols: list[str],
    y_col: str,
    intercept: bool = True,
    max_iters: int = 25,
    tol: float = 1e-10,
    l2: float = 0.0,
    driver_row_limit: int = 2_000_000,
):
    """Fit a binary logistic regression by distributed IRLS/Newton —
    the quality-classifier training step of a data-curation pipeline
    (labels like "is high quality" / "is target language").

    Scale shape: the feature projection is materialized ONCE (k+1
    float64 columns — never the full input row; the
    grouped_exact_quantile lesson: a lazy upstream would re-run its
    UDFs every iteration); each Newton round is one streaming pass
    where every batch contributes (XᵀWX, Xᵀ(y−p), log-loss, n)
    partials — k² + k + 2 doubles regardless of rows — given the
    weights broadcast via ray.put; the driver solves the k x k system
    (k = #features + intercept, tiny) and steps. Stops on
    max|Δw| < tol or ``max_iters``. The log-loss is computed with the
    stable log1p(exp(−|m|)) form.

    Float partials merge in block order → coefficients deterministic
    to ~1e-12 relative (same contract as pca_fit/linreg_fit); the
    query surface is rows-only by design. Returns
    (coef: dict col→float, intercept: float, n: int, iters: int,
    loss: float). Raises on empty input or non-binary labels.
    """
    import ray as _ray

    d = len(x_cols)
    k = d + (1 if intercept else 0)

    def project(t: pa.Table) -> pa.Table:
        cols = {
            c: pc.cast(t[c], pa.float64()) for c in x_cols
        }
        yv = pc.cast(t[y_col], pa.float64())
        bad = pc.sum(
            pc.cast(
                pc.invert(pc.or_(pc.equal(yv, 0.0), pc.equal(yv, 1.0))),
                pa.int64(),
            )
        ).as_py()
        if bad:
            raise ValueError(
                f"logistic_fit: {bad} non-binary label(s) in {y_col}"
            )
        cols["_y"] = yv
        return pa.table(cols)

    feats = ds.map_batches(project, batch_format="pyarrow").materialize()
    if feats.count() <= driver_row_limit:
        # bounded driver fast path: one collect, then local Newton —
        # every Ray exchange costs ~1 s of fixed overhead, which
        # dominates 10+ iterations at small-to-medium volumes; the
        # distributed route (forced in pytest) is the scale path
        tbl_all = pa.concat_tables(
            [
                t
                for t in __import__("ray").get(feats.to_arrow_refs())
                if t.num_columns and t.num_rows
            ]
        ) if feats.count() else None
        if tbl_all is None:
            raise ValueError("logistic_fit: empty input")
        X = np.column_stack(
            [
                tbl_all[c].to_numpy(zero_copy_only=False)
                for c in x_cols
            ]
        )
        if intercept:
            X = np.column_stack([X, np.ones(len(X))])
        y = tbl_all["_y"].to_numpy(zero_copy_only=False)
        w = np.zeros(k, dtype=np.float64)
        loss = float("nan")
        iters_done = 0
        for it in range(max_iters):
            m = X @ w
            p = 1.0 / (1.0 + np.exp(-np.clip(m, -35.0, 35.0)))
            wt = np.maximum(p * (1.0 - p), 1e-12)
            H = (X * wt[:, None]).T @ X
            g = X.T @ (y - p)
            s = 2.0 * y - 1.0
            sm = s * m
            loss = float(
                np.sum(
                    np.log1p(np.exp(-np.abs(sm))) + np.maximum(-sm, 0.0)
                )
            )
            if l2:
                H = H + l2 * np.eye(k)
                g = g - l2 * w
            delta = np.linalg.solve(H, g)
            w = w + delta
            iters_done = it + 1
            if np.max(np.abs(delta)) < tol:
                break
        coef = {c: float(w[i]) for i, c in enumerate(x_cols)}
        b = float(w[d]) if intercept else 0.0
        return coef, b, len(y), iters_done, loss
    w = np.zeros(k, dtype=np.float64)
    n_total = 0
    loss = float("nan")
    iters_done = 0
    for it in range(max_iters):
        w_ref = _ray.put(w.copy())

        def newton_partial(t: pa.Table, _w=w_ref) -> pa.Table:
            wv = _ray.get(_w)
            X = np.column_stack(
                [t[c].to_numpy(zero_copy_only=False) for c in x_cols]
            )
            if intercept:
                X = np.column_stack([X, np.ones(len(X))])
            y = t["_y"].to_numpy(zero_copy_only=False)
            m = X @ wv
            p = 1.0 / (1.0 + np.exp(-np.clip(m, -35.0, 35.0)))
            wt = np.maximum(p * (1.0 - p), 1e-12)
            H = (X * wt[:, None]).T @ X
            g = X.T @ (y - p)
            # stable per-row log-loss: log(1+e^-|m|) + max(0, -s*m)
            s = 2.0 * y - 1.0
            sm = s * m
            ll = float(
                np.sum(np.log1p(np.exp(-np.abs(sm))) + np.maximum(-sm, 0.0))
            )
            return pa.table(
                {
                    "n": pa.array([len(y)], pa.int64()),
                    "h": pa.array(
                        [H.ravel().tolist()], pa.list_(pa.float64())
                    ),
                    "g": pa.array([g.tolist()], pa.list_(pa.float64())),
                    "ll": pa.array([ll], pa.float64()),
                }
            )

        parts = [
            t
            for t in _ray.get(
                feats.map_batches(
                    newton_partial, batch_format="pyarrow"
                ).to_arrow_refs()
            )
            if t.num_columns and t.num_rows
        ]
        if not parts:
            raise ValueError("logistic_fit: empty input")
        tbl = pa.concat_tables(parts)
        n_total = int(pc.sum(tbl["n"]).as_py())
        H = np.add.reduce(
            [np.asarray(x, dtype=np.float64) for x in tbl["h"].to_pylist()]
        ).reshape(k, k)
        g = np.add.reduce(
            [np.asarray(x, dtype=np.float64) for x in tbl["g"].to_pylist()]
        )
        loss = float(pc.sum(tbl["ll"]).as_py())
        if l2:
            H = H + l2 * np.eye(k)
            g = g - l2 * w
        delta = np.linalg.solve(H, g)
        w = w + delta
        iters_done = it + 1
        if np.max(np.abs(delta)) < tol:
            break
    coef = {c: float(w[i]) for i, c in enumerate(x_cols)}
    b = float(w[d]) if intercept else 0.0
    return coef, b, n_total, iters_done, loss


def linreg_fit_int_cramer(
    ds: Dataset, x_cols: list[str], y_col: str
) -> tuple[dict, float, int]:
    """OLS for INTEGER-valued features + response (2 features +
    intercept), EXACTLY reproducible: per-batch int64 moment partials
    (9 scalars: n, Σx1², Σx1x2, Σx1, Σx2², Σx2, Σx1y, Σx2y, Σy) are
    order-invariant exact integers, and the 3x3 normal equations are
    solved by CRAMER'S RULE on Python bigints — each coefficient is
    float(det_i) / float(det), exactly two IEEE roundings, which a SQL
    oracle replays with HUGEINT determinants (unlike linreg_fit's
    LAPACK solve, whose float pivoting is not SQL-expressible).
    Integer-overflow bound: int64 partials need rows x max|x*y| <
    2^63 (~4e17 cents-hours — fine past 1e10 rows); the driver fold
    and determinants are arbitrary-precision.

    Returns (coef dict, intercept, n) like linreg_fit."""
    import ray as _ray

    if len(x_cols) != 2:
        raise ValueError("linreg_fit_int_cramer: exactly 2 features")
    c1, c2 = x_cols

    def moments(t: pa.Table) -> pa.Table:
        x1 = t[c1].to_numpy(zero_copy_only=False).astype(np.int64)
        x2 = t[c2].to_numpy(zero_copy_only=False).astype(np.int64)
        y = t[y_col].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "n": pa.array([len(y)], pa.int64()),
                "s11": pa.array([int(x1 @ x1)], pa.int64()),
                "s12": pa.array([int(x1 @ x2)], pa.int64()),
                "s1": pa.array([int(x1.sum())], pa.int64()),
                "s22": pa.array([int(x2 @ x2)], pa.int64()),
                "s2": pa.array([int(x2.sum())], pa.int64()),
                "s1y": pa.array([int(x1 @ y)], pa.int64()),
                "s2y": pa.array([int(x2 @ y)], pa.int64()),
                "sy": pa.array([int(y.sum())], pa.int64()),
            }
        )

    parts = [
        t
        for t in _ray.get(
            ds.map_batches(moments, batch_format="pyarrow").to_arrow_refs()
        )
        if t.num_columns and t.num_rows
    ]
    if not parts:
        raise ValueError("linreg_fit_int_cramer: empty input")
    tbl = pa.concat_tables(parts)
    s = {k: sum(int(v) for v in tbl[k].to_pylist()) for k in tbl.column_names}
    n = s["n"]
    A = [
        [s["s11"], s["s12"], s["s1"]],
        [s["s12"], s["s22"], s["s2"]],
        [s["s1"], s["s2"], n],
    ]
    b = [s["s1y"], s["s2y"], s["sy"]]

    def det3(m) -> int:
        return (
            m[0][0] * (m[1][1] * m[2][2] - m[1][2] * m[2][1])
            - m[0][1] * (m[1][0] * m[2][2] - m[1][2] * m[2][0])
            + m[0][2] * (m[1][0] * m[2][1] - m[1][1] * m[2][0])
        )

    det = det3(A)
    if det == 0:
        raise ValueError("linreg_fit_int_cramer: singular system")

    def repl(col: int):
        return [
            [b[r] if c == col else A[r][c] for c in range(3)]
            for r in range(3)
        ]

    beta = [float(det3(repl(i))) / float(det) for i in range(3)]
    return {c1: beta[0], c2: beta[1]}, beta[2], n
