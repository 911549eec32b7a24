"""Arrow-batched numpy kernels for the big-book IVF/PQ regime
(SCALING §47) — the vectorized twins of vector_ops' literal-codebook
projections, engaged above IVF_LITERAL_BOOK_MAX centroids where the
interpreted higher-order-function cost (O(K·DIM) per row) loses to a
batch matmul. Kept in a separate module WITHOUT
``from __future__ import annotations``: pandas_udf resolves its
pd.Series type hints at definition time, and PEP-563 stringified
annotations break that resolution.

Ordering semantics match the literal path exactly: distances rank by
−2·X@Cᵀ + ‖c‖² (‖x‖² is row-constant, so argmin/argsort order equals
the literal (pp − 2·dot) + cc expression's), and ties break to the
LOWEST cid — books arrive cid-sorted, np.argmin returns the first
minimum, and top-n uses a stable argsort."""

import pandas as pd
from pyspark.sql import functions as F


def np_books(books):
    """{key_tuple: (cids ndarray, K×D matrix, K-vector of ‖c‖²)}."""
    import numpy as np

    out = {}
    for key, book in books.items():
        cids = np.array([c for c, _ in book], dtype=np.int64)
        mat = np.array([v for _, v in book], dtype=np.float64)
        out[key] = (cids, mat, (mat * mat).sum(axis=1))
    return out


def _as_matrix(v, dim):
    """Arrow batch of array<double> → (n, dim) float64 matrix; an
    EMPTY batch yields shape (0, dim) so downstream matmuls return
    empty instead of raising on a (0,)-shaped array (ADVICE r12)."""
    import numpy as np

    if not len(v):
        return np.empty((0, dim), dtype=np.float64)
    return np.array(v.tolist(), dtype=np.float64)


def np_assign_col(df, books, keys, vec_col, out):
    """Nearest-centroid cid as one vectorized batch projection —
    the big-book twin of vector_ops._argmin_sql. The keyed path
    supports exactly ONE key column (asserted — a silent first-key
    mask would mis-assign a 2-key caller; ADVICE r12)."""
    assert len(keys) <= 1, f"np_assign_col supports at most one key: {keys}"
    nb = np_books(books)
    dim = max(len(v) for b in books.values() for _, v in b)
    if keys:
        key_col = list(keys)[0]

        @F.pandas_udf("long")
        def assign(k: pd.Series, v: pd.Series) -> pd.Series:
            import numpy as np

            X = _as_matrix(v, dim)
            res = np.empty(len(X), dtype=np.int64)
            for kk in pd.unique(k):
                m = (k == kk).values
                cids, mat, cc = nb[(kk,)]
                res[m] = cids[np.argmin(-2.0 * X[m] @ mat.T + cc, axis=1)]
            return pd.Series(res)

        return df.withColumn(out, assign(F.col(key_col), F.col(vec_col)))

    cids0, mat0, cc0 = nb[()]

    @F.pandas_udf("long")
    def assign0(v: pd.Series) -> pd.Series:
        import numpy as np

        X = _as_matrix(v, dim)
        return pd.Series(cids0[np.argmin(-2.0 * X @ mat0.T + cc0, axis=1)])

    return df.withColumn(out, assign0(F.col(vec_col)))


def np_ham_words(df, planes, vec_col, out0, out1):
    """The 64-bit hyperplane sign sketch (two packed 32-bit words) as
    ONE Arrow-batched numpy projection — the vectorized twin of
    vector_ops._ham_word_spark's 64 interpreted aggregate/zip_with
    folds (guide §4: heavyweight per-row numeric work belongs in
    vectorized Arrow batches, not per-element lambda interpretation).

    Bitwise parity with the hof path: the fold computes
    ((0 + x0·p0) + x1·p1) + … left-to-right, so the kernel
    accumulates k-SEQUENTIALLY over dimensions (D += outer(X[:,k],
    P[:,k])) instead of a pairwise-summing matmul — every plane dot
    is the exact same double, hence the exact same sign bit, as the
    interpreted fold (pinned in tests/test_wave30.py at every oracle
    scale). Sign packing is integer and exact. FINITE INPUTS ONLY
    (asserted per batch — ADVICE r13): a NaN dot would pack bit 1 in
    the SQL fold (Spark orders NaN greater than any double, so
    NaN >= 0 is TRUE) but 0 here (numpy NaN >= 0 is False), and a
    NULL vector element converts to NaN — the assert turns a silent
    oracle divergence into a loud task failure (a fully-NULL vector
    already fails the ragged float64 conversion)."""
    import numpy as np

    P = np.array(planes, dtype=np.float64)  # n_planes x DIM, row j = plane j

    @F.pandas_udf("struct<w0:bigint,w1:bigint>")
    def words(v: pd.Series) -> pd.DataFrame:
        import numpy as np

        if not len(v):
            return pd.DataFrame(
                {"w0": pd.Series([], dtype="int64"),
                 "w1": pd.Series([], dtype="int64")}
            )
        X = np.array(v.tolist(), dtype=np.float64)
        assert np.isfinite(X).all(), (
            "np_ham_words requires finite embeddings: NaN sign bits "
            "diverge between numpy (NaN >= 0 False) and the SQL fold "
            "(Spark NaN >= 0 TRUE); NULL elements convert to NaN"
        )
        D = np.zeros((X.shape[0], P.shape[0]), dtype=np.float64)
        for k in range(X.shape[1]):
            D += np.outer(X[:, k], P[:, k])
        bits = D >= 0.0
        w0 = np.zeros(X.shape[0], dtype=np.int64)
        w1 = np.zeros(X.shape[0], dtype=np.int64)
        for j in range(32):
            w0 += bits[:, j].astype(np.int64) << j
            w1 += bits[:, 32 + j].astype(np.int64) << j
        return pd.DataFrame({"w0": w0, "w1": w1})

    tmp = f"_hw_{out0}"
    return (
        df.withColumn(tmp, words(F.col(vec_col)))
        .withColumn(out0, F.col(tmp)["w0"])
        .withColumn(out1, F.col(tmp)["w1"])
        .drop(tmp)
    )


def np_topn_col(df, book, vec_col, n, out):
    """Top-n nearest centroid cids (L2 ascending, cid tie-break) as
    one vectorized batch projection — the big-book twin of
    vector_ops._rank_sql's slice."""
    nb = np_books({(): book})
    cids0, mat0, cc0 = nb[()]
    dim = mat0.shape[1]

    @F.pandas_udf("array<bigint>")
    def topn(v: pd.Series) -> pd.Series:
        import numpy as np

        X = _as_matrix(v, dim)
        d = -2.0 * X @ mat0.T + cc0
        idx = np.argsort(d, axis=1, kind="stable")[:, :n]
        return pd.Series([cids0[row].tolist() for row in idx])

    return df.withColumn(out, topn(F.col(vec_col)))
