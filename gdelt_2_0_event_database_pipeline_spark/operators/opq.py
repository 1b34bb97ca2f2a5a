"""OPQ — optimized product quantization: a learned orthogonal rotation
ahead of PQ (public technique: Ge, He, Ke, Sun, "Optimized Product
Quantization", CVPR 2013 / TPAMI 2014; the FAISS ``OPQMatrix`` pre-step).

PQ's per-subspace codebooks assume the subspaces are independent and
equally energetic; real embedding corpora concentrate variance in a few
correlated directions, so contiguous subvector splits waste code bits.
OPQ learns an orthogonal d×d rotation R minimizing the quantization
error of PQ applied to R·x, alternating two closed-form steps on a
bounded sample (Ge et al. §4.2, the non-parametric solution):

1. codebooks ← per-subspace Lloyd on the rotated sample (the existing
   ``_fit_pq_on_matrix`` kernel — same determinism rules), then
2. R ← orthogonal Procrustes against the reconstructions: with X the
   raw sample and X̂ the decoded rotated sample, R = V·Uᵀ from the SVD
   U·S·Vᵀ = X̂ᵀ·X (driver-side d×d math, never corpus-sized).

Spark-first shape:

- **fit** (``fit_opq``): everything above runs on the hash-ranked
  bounded sample ``pq.fit_pq_codebooks`` already uses; the corpus never
  leaves the executors. Deterministic: seeded init rotation (QR of a
  seeded Gaussian, sign-fixed), fixed iteration counts, first-minimum
  assignment ties.
- **rotate** (``rotate_vectors``): a pure map-side Column expression —
  d ``aggregate`` dot folds against literal rotation rows (the
  ``random_projection`` expr path; d·d = 4096 literals at dim 64, well
  under the codegen ceiling). Zero shuffles, zero Python.
- **encode / search**: the rotated corpus feeds the UNCHANGED PQ
  machinery (``pq_encode`` / ``pq_topk``); queries are rotated
  driver-side inside their LUT build, so serving reads the same 8-byte
  codes. OPQ changes WHERE the code bits go, not how many there are.

Measured (tools/ann_recall.py 'opq' section, ANN_RECALL.json): the gain
appears exactly where theory predicts — anisotropic/correlated corpora
— and vanishes on the near-uniform fixture (an isotropic distribution
has no bad axis for contiguous splits; any rotation is as good).

Reference parity: the reference pipeline has no vector stage
(reference main.py:1); OPQ extends the X3 ANN family (SURVEY.md §2.10).
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .pq import _collect_fit_sample, _fit_pq_on_matrix


def _seeded_rotation(d: int, seed: int):
    """Deterministic random orthogonal init: QR of a seeded standard
    Gaussian with the R-diagonal sign fix (makes Q unique — raw QR signs
    are implementation-defined)."""
    import numpy as np

    rng = np.random.RandomState(seed)
    q, r = np.linalg.qr(rng.standard_normal((d, d)))
    return q * np.sign(np.diag(r))


def _decode(codes, cb):
    """Reconstruct an (n × d) matrix from per-subspace code ids."""
    import numpy as np

    m, ncodes, subdim = cb.shape
    return np.concatenate(
        [cb[s, codes[:, s]] for s in range(m)], axis=1
    )


def _encode_matrix(x, cb):
    """Per-subspace nearest-code ids for a local matrix (the numpy twin
    of ``pq_encode``, first-minimum ties)."""
    import numpy as np

    m, ncodes, subdim = cb.shape
    xs = x.reshape(x.shape[0], m, subdim)
    d2 = (
        (xs * xs).sum(axis=2)[:, :, None]
        + (cb * cb).sum(axis=2)[None, :, :]
        - 2.0 * np.einsum("nsd,scd->nsc", xs, cb)
    )
    return d2.argmin(axis=2)


def fit_opq(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    m: int = 16,
    ncodes: int = 16,
    iters: int = 5,
    opq_iters: int = 10,
    seed: int = 42,
    fit_sample_n: int | None = 100_000,
) -> tuple[list[list[float]], list]:
    """(rotation R as d×d row lists, codebooks over R·x) — drop-in ahead
    of the existing PQ fit API: ``pq_encode(rotate_vectors(df, R), books)``
    and rotate queries before their LUTs. The training quantization error
    is non-increasing across the returned alternating iterations (both
    sub-steps are optimal for the other held fixed, Ge et al. Lemma 1/2);
    if a numerical plateau makes a step epsilon-worse, that candidate is
    discarded and the previous (rotation, codebooks) pair is returned."""
    import numpy as np

    x = _collect_fit_sample(df, vec_col, id_col, seed, fit_sample_n)
    d = x.shape[1]
    if d % m:
        raise ValueError(f"dim {d} not divisible by m={m}")
    r = _seeded_rotation(d, seed)
    books = None
    prev_err = None
    prev_pair = None  # (rotation, codebooks) of the last non-increasing step
    for _ in range(max(1, opq_iters)):
        xr = x @ r.T
        books = np.asarray(
            _fit_pq_on_matrix(xr, m, ncodes, iters), dtype=np.float64
        )
        xhat = _decode(_encode_matrix(xr, books), books)
        err = float(((xr - xhat) ** 2).sum())
        if prev_err is not None and err > prev_err * (1 + 1e-9):
            # Numerical plateau: the current pair measured worse — discard
            # it and return the previous optimum, honoring the docstring's
            # non-increasing-error contract.
            r, books = prev_pair
            break
        prev_err = err
        prev_pair = (r.copy(), books)
        # Procrustes: min_R ||X·Rᵀ − X̂||² over orthogonal R
        u, _, vt = np.linalg.svd(xhat.T @ x)
        r = u @ vt
    return (
        [[float(v) for v in row] for row in r],
        [[[float(v) for v in c] for c in cb] for cb in books],
    )


def _sql_double(v: float) -> str:
    """Exact double literal for SQL text: ``repr(float)`` is the shortest
    round-tripping decimal and the ``D`` suffix makes the parser emit a
    DOUBLE Literal node directly (``Double.parseDouble`` — bit-identical).
    A ``CAST('…' AS DOUBLE)`` spelling would parse to the same VALUE but
    leave thousands of un-folded Cast nodes that every analysis pass of
    every composed plan re-walks — measured ~20% slower OPQ builds.

    Non-finite values are rejected LOUDLY (r15 ADVICE): ``repr(nan)`` is
    ``'nan'``, which the SQL parser turns into a Catalyst ParseException
    pages away from the actual bug — a NaN/Inf cell in a rotation/PCA/
    projection matrix. Raise a named ValueError at the emit site instead."""
    f = float(v)
    if not math.isfinite(f):
        raise ValueError(
            f"non-finite matrix value {f!r} cannot be emitted as a SQL "
            "double literal — the rotation/projection/codebook matrix "
            "contains NaN/Inf (check the fit inputs)"
        )
    return f"{repr(f)}D"


def _sql_arr(vals) -> str:
    """SQL text of a (possibly nested) double array literal —
    ``array(array(1.0D, …), …)``. Parses to the exact tree PySpark's
    ``F.lit(nested_list)`` builds (CreateArray over DOUBLE Literals) but
    in ONE ``F.expr`` round-trip instead of one py4j call per element:
    ``F.lit`` on a 16×16×4 codebook costs ~1.3k driver round-trips
    (~1.5–2 s per plan, measured on the append hot path) vs ~1 ms of
    Catalyst parsing (guide §4 — the r15 rotate_vectors finding applied
    to every literal-matrix site). Bit-exact via :func:`_sql_double`."""
    if isinstance(vals, (list, tuple)):
        return "array(" + ", ".join(_sql_arr(v) for v in vals) + ")"
    return _sql_double(vals)


def _check_expr_col(name: str) -> str:
    """Column-name contract for the F.expr-generated paths (r15 ADVICE):
    the generated SQL backtick-quotes ``name``, which resolves TOP-LEVEL
    columns only — a dotted name is taken literally (not as a nested
    struct field, unlike ``F.col``), and a backtick inside the name would
    break out of the quoting. Reject the backtick case loudly; dotted
    names stay allowed with the literal-name meaning documented here
    (select/alias the nested field first if you need struct access)."""
    if "`" in name:
        raise ValueError(
            f"column name {name!r} contains a backtick — unsupported on "
            "the F.expr-generated paths (alias the column first)"
        )
    return name


def rotate_vectors(
    df: DataFrame,
    rotation: list[list[float]],
    vec_col: str = "embedding",
    out_col: str = "rotated",
) -> DataFrame:
    """Append ``out_col`` = R·x as a pure map-side expression: d
    ``aggregate`` dot folds against literal rotation rows (zero shuffles,
    zero Python — the ``random_projection`` expr path; d²=4096 literal
    cells at dim 64). Rows of the wrong width get NULL (enrichment, not
    filter).

    The expression is built as ONE ``F.expr`` SQL string instead of ~12k
    chained Column calls: each ``F.lit``/``zip_with``/``aggregate`` is a
    py4j round-trip, and constructing the d²-literal tree that way cost
    9-12 s of pure driver time per plan (measured, r15) vs ~0.3 s for
    Catalyst parsing the equivalent SQL text. Same expression tree after
    parsing, bit-identical results (differential-tested in
    tests/test_opq.py and measured at build time)."""
    if out_col in df.columns:
        raise ValueError(f"out_col {out_col!r} already exists in the input")
    d = len(rotation)
    if any(len(row) != d for row in rotation):
        raise ValueError("rotation must be square d×d")
    _check_expr_col(vec_col)  # top-level-name contract (see helper)
    vec = f"CAST(`{vec_col}` AS ARRAY<DOUBLE>)"
    dots = ", ".join(
        f"aggregate(zip_with({vec}, array("
        + ", ".join(_sql_double(w) for w in row)
        + "), (a, b) -> a * b), 0.0D, (acc, v) -> acc + v)"
        for row in rotation
    )
    return df.withColumn(
        out_col,
        F.expr(
            f"CASE WHEN `{vec_col}` IS NOT NULL AND size(`{vec_col}`) = {d} "
            f"THEN array({dots}) END"
        ),
    )


def rotate_batch_arrow(
    df: DataFrame, rotation: list[list[float]], vec_col: str = "embedding"
) -> DataFrame:
    """``R·x`` over a micro-batch via ``mapInPandas`` — the append-path
    rotation (``pq.append_pq_index`` on a rotated index). The dots are
    pure-PYTHON left folds (explicitly NOT numpy matmul): CPython/numpy
    scalar mul/add are the same IEEE-754 double operations the JVM
    executes, in the same order, so results are BIT-identical to
    ``rotate_vectors``' codegen fold and ``rotate_queries_collected``'s
    driver fold (differential test in tests/test_opq.py) — which is what
    keeps maintained==rebuild parity on a rotated index. Why not the
    expression forms for this path: the d²-literal tree costs ~2.5 s of
    per-plan analysis per micro-batch, and a nested-HOF literal evaluates
    interpreted at ~µs/lambda — both dominate a small batch; the Arrow
    seam is O(1) plan nodes and one vectorized pass. Bulk rotation keeps
    ``rotate_vectors`` (codegen wins once data dominates). Wrong-width /
    NULL vectors rotate to NULL (the ``rotate_vectors`` guard)."""
    from pyspark.sql import types as T

    d = len(rotation)
    out_fields = [
        T.StructField(f.name, T.ArrayType(T.DoubleType()), True)
        if f.name == vec_col
        else f
        for f in df.schema.fields
    ]
    schema = T.StructType(out_fields)
    cols = [f.name for f in df.schema.fields]

    def _rot_batches(it):
        for pdf in it:
            out = []
            for v in pdf[vec_col]:
                if v is None or len(v) != d:
                    out.append(None)
                    continue
                rv = []
                for row in rotation:
                    acc = 0.0
                    for a, b in zip(v, row):
                        acc += a * b
                    rv.append(acc)
                out.append(rv)
            pdf = pdf.copy()
            pdf[vec_col] = out
            yield pdf[cols]

    return df.mapInPandas(_rot_batches, schema)


def rotate_queries_collected(
    queries: DataFrame,
    rotation: list[list[float]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> tuple[DataFrame, DataFrame]:
    """(rotated queries, raw sidecar) — the driver-side query-rotation
    seam shared by ``opq_topk`` and the rotated maintained-index search
    (``pq.ivf_pq_topk(rotation=...)``). Queries are bounded and collected
    for their LUTs anyway; rotation uses explicit left-fold dots (not
    numpy matmul) to match SQL ``list_dot_product`` and
    ``rotate_vectors``'s aggregate fold bit-for-bit — what lets an
    at-rest OPQ index carry a DuckDB oracle. The raw sidecar
    ``(query_id, __raw_qv__)`` lets a rerank tail swap back to raw-space
    vectors (cosine is rotation-invariant, so raw-space rerank against
    the raw corpus is exact with no corpus re-rotation)."""
    from pyspark.sql import types as T

    from .ivf import well_formed_vectors
    from .similarity import _as_double

    d = len(rotation)
    rows = (
        well_formed_vectors(queries, vec_col)
        .select(id_col, _as_double(vec_col).alias("__qv__"))
        .collect()
    )
    spark = queries.sparkSession

    def _rot(qv):
        out = []
        for row in rotation:
            acc = 0.0
            for a, b in zip(qv, row):
                acc += a * b
            out.append(acc)
        return out

    id_dtype = queries.schema[id_col].dataType
    kept = [r for r in rows if len(r["__qv__"]) == d]
    rotated = spark.createDataFrame(
        [(r[id_col], _rot(r["__qv__"])) for r in kept],
        f"`{id_col}` {id_dtype.simpleString()}, `{vec_col}` array<double>",
    )
    raw_df = spark.createDataFrame(
        [(r[id_col], [float(v) for v in r["__qv__"]]) for r in kept],
        T.StructType(
            [
                T.StructField("query_id", id_dtype),
                T.StructField("__raw_qv__", T.ArrayType(T.DoubleType())),
            ]
        ),
    )
    return rotated, raw_df


def opq_topk(
    corpus_codes: DataFrame,
    queries: DataFrame,
    rotation: list[list[float]],
    codebooks,
    k: int = 5,
    rerank: int | None = None,
    corpus: DataFrame | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """ADC top-k over OPQ codes: queries are rotated DRIVER-side (they're
    collected for their LUTs anyway — bounded), then the unchanged
    ``pq_topk`` tail runs. ``corpus_codes`` must be ``pq_encode`` output
    over the ROTATED corpus; ``rerank`` re-ranks against the RAW corpus
    with exact cosine (rotation preserves inner products, so raw-space
    cosine is the same answer rotated-space cosine would give —
    orthogonality means no re-rotation of the corpus is ever needed)."""
    if rerank is not None and corpus is None:
        # same guard as pq_topk — the custom rerank tail below would
        # otherwise crash opaquely on the None corpus
        raise ValueError("rerank requires the original corpus DataFrame")
    from .pq import pq_topk

    spark = corpus_codes.sparkSession
    rotated, raw_df = rotate_queries_collected(
        queries, rotation, id_col=id_col, vec_col=vec_col
    )
    if rerank is None:
        return pq_topk(
            corpus_codes, rotated, codebooks, k=k,
            id_col=id_col, vec_col=vec_col,
        )
    # exact re-rank in RAW space (cosine is rotation-invariant): reuse the
    # pq_topk ADC tail for the shortlist, then join true vectors
    from .pq import _adc_rank_and_rerank, _check_codebooks, _collect_query_luts, _lut_schema, _assert_size

    m, _, _ = _check_codebooks(codebooks)
    data, id_dtype = _collect_query_luts(rotated, codebooks, id_col, vec_col)
    qdf = spark.createDataFrame(data, _lut_schema(id_dtype))
    codes2 = _assert_size(corpus_codes, "codes", m, "opq_topk")
    cand = codes2.select(
        F.col(id_col).alias("neighbor_id"), "codes", "vhat_sq"
    ).join(F.broadcast(qdf), F.col("query_id") != F.col("neighbor_id"))
    # swap the LUT row's qv back to the RAW query vector so the exact
    # rerank computes raw-space cosine against the raw corpus
    cand = cand.drop("__qv__").join(F.broadcast(raw_df), "query_id").withColumnRenamed(
        "__raw_qv__", "__qv__"
    )
    return _adc_rank_and_rerank(cand, k, rerank, corpus, id_col, vec_col)
