"""Johnson–Lindenstrauss random projection for embedding columns: reduce
`array<float>` vectors to `out_dim` dimensions with a deterministic ±1
projection matrix (the dense Achlioptas 2003 variant).

Why at 100 TB: every downstream similarity pass (brute-force rerank, IVF
cell assignment, LSH bucketing) costs O(dim) per comparison — projecting
64→16 dims cuts compare FLOPs and shuffle bytes 4× while JL preserves
pairwise distances within (1±ε). The projection itself is a map-only
narrow transform: no shuffle, no fitted model, no driver state.

Cross-engine determinism (same playbook as `similarity.quantize_int8` /
`semantic_dedup`): vectors are int8-quantized first, and the ±1 signs come
from the md5-derived portable hash of "rp:<k>:<j>" — computed ONCE in
Python here (hashlib) and re-derived row-free in the DuckDB oracle (md5()
in SQL), so projected values are exact integers that hash-match
bit-for-bit. No seeded RNG anywhere: the matrix is a pure function of
(k, j).
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .similarity import quantize_int8


def jl_sign(k: int, j: int) -> int:
    """±1 from the portable 60-bit hash of 'rp:<k>:<j>' (first 15 hex chars
    of md5, parsed base 16 — identical to functions.text.portable_hash64
    and to the SQL `CAST(concat('0x', substr(md5(...), 1, 15)) AS BIGINT)`).
    Even hash -> +1, odd -> -1."""
    h = int(hashlib.md5(f"rp:{k}:{j}".encode()).hexdigest()[:15], 16)
    return 1 if h % 2 == 0 else -1


def sign_matrix(out_dim: int, in_dim: int) -> list[list[int]]:
    """out_dim × in_dim ±1 matrix; row k, column j = jl_sign(k, j)."""
    return [[jl_sign(k, j) for j in range(in_dim)] for k in range(out_dim)]


def projected_vectors(
    emb: DataFrame,
    out_dim: int = 16,
    in_dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id_col, pvec array<long>) — the projected vectors in array form,
    value_k = Σ_j q_j · sign(k, j) over the int8-quantized vector: pure
    BIGINT arithmetic end to end (|value| <= in_dim·127), exact on any
    engine or partitioning. This is the form downstream similarity search
    consumes (`similarity.cosine_topk` over 4x-shorter vectors)."""
    if out_dim < 1 or in_dim < 1:
        raise ValueError(f"random_projection: bad dims out={out_dim} in={in_dim}")
    signs = sign_matrix(out_dim, in_dim)
    q = quantize_int8(emb, id_col, vec_col)
    # Length guard inside the plan: an in_dim shorter than the vectors
    # would otherwise NULL-pad the zip_with and poison every sum to NULL
    # (while the SQL oracle would happily sum a prefix) — exactly the
    # silent divergence this module exists to rule out. raise_error makes
    # the mismatch a loud job failure on any row.
    q = q.withColumn(
        "qvec",
        F.when(F.size("qvec") == in_dim, F.col("qvec")).otherwise(
            F.raise_error(
                F.concat(
                    F.lit(f"random_projection: in_dim={in_dim} but vector has "),
                    F.size("qvec").cast("string"),
                    F.lit(" components"),
                )
            )
        ),
    )
    sums = F.array(
        *[
            F.aggregate(
                F.zip_with(
                    F.col("qvec"),
                    F.array(*[F.lit(s) for s in signs[k]]),
                    lambda x, s: x.cast("long") * s,
                ),
                F.lit(0).cast("long"),
                lambda acc, x: acc + x,
            )
            for k in range(out_dim)
        ]
    )
    return q.select(id_col, sums.alias("pvec"))


def random_projection(
    emb: DataFrame,
    out_dim: int = 16,
    in_dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id_col, dim_idx, value) — long-form projected vectors, one row per
    output dimension (posexplode of :func:`projected_vectors`). Long form
    is what the cross-engine comparator and per-dimension consumers (QA
    profiles, per-dim stats) want; similarity search consumes the array
    form directly."""
    p = projected_vectors(emb, out_dim, in_dim, id_col, vec_col)
    return p.select(id_col, F.posexplode("pvec").alias("dim_idx", "value")).select(
        id_col, F.col("dim_idx").cast("int").alias("dim_idx"), "value"
    )
