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


def np_books(books, keys):
    """{key_tuple: (cids ndarray, K×D matrix, K-vector of ‖c‖²)}."""
    import numpy as np

    out = {}
    for key, book in books.items():
        cids = np.array([c for c, _ in book], dtype=np.int64)
        mat = np.array([v for _, v in book], dtype=np.float64)
        out[key] = (cids, mat, (mat * mat).sum(axis=1))
    return out


def np_assign_col(df, books, keys, vec_col, out):
    """Nearest-centroid cid as one vectorized batch projection —
    the big-book twin of vector_ops._argmin_sql."""
    nb = np_books(books, tuple(keys))
    if keys:
        key_col = list(keys)[0]

        @F.pandas_udf("long")
        def assign(k: pd.Series, v: pd.Series) -> pd.Series:
            import numpy as np

            X = np.array(v.tolist(), dtype=np.float64)
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

        X = np.array(v.tolist(), dtype=np.float64)
        return pd.Series(cids0[np.argmin(-2.0 * X @ mat0.T + cc0, axis=1)])

    return df.withColumn(out, assign0(F.col(vec_col)))


def np_topn_col(df, book, vec_col, n, out):
    """Top-n nearest centroid cids (L2 ascending, cid tie-break) as
    one vectorized batch projection — the big-book twin of
    vector_ops._rank_sql's slice."""
    nb = np_books({(): book}, ())
    cids0, mat0, cc0 = nb[()]

    @F.pandas_udf("array<bigint>")
    def topn(v: pd.Series) -> pd.Series:
        import numpy as np

        X = np.array(v.tolist(), dtype=np.float64)
        d = -2.0 * X @ mat0.T + cc0
        idx = np.argsort(d, axis=1, kind="stable")[:, :n]
        return pd.Series([cids0[row].tolist() for row in idx])

    return df.withColumn(out, topn(F.col(vec_col)))
