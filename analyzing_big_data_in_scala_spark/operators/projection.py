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


def _validate_and_quantize(
    emb: DataFrame, out_dim: int, in_dim: int, id_col: str, vec_col: str
):
    """Shared head of both projection forms: dim validation + int8
    quantization + the per-dimension integer-sum expressions.

    Length guard: a wrong in_dim would NULL-pad the zip_with and poison
    every sum to NULL (while the SQL oracle would sum a prefix). An
    IN-PLAN guard is off the table for performance: when()/otherwise and
    even coalesce(assert_true(...)) are conditional expressions, which
    whole-stage codegen excludes from subexpression elimination — the
    quantize aggregate then re-evaluates once per output dimension
    (measured 0.8s -> 11-23s at sf0.1). Instead: probe ONE row eagerly,
    which catches the misconfiguration class outright; a genuinely
    ragged row (data corruption) still surfaces loudly as an all-NULL
    projected vector, never as plausible wrong numbers."""
    if out_dim < 1 or in_dim < 1:
        raise ValueError(f"random_projection: bad dims out={out_dim} in={in_dim}")
    probe = emb.select(F.size(vec_col).alias("_n")).limit(1).collect()
    if probe and probe[0]._n != in_dim:
        raise ValueError(
            f"random_projection: in_dim={in_dim} but vector has "
            f"{probe[0]._n} components"
        )
    signs = sign_matrix(out_dim, in_dim)
    q = quantize_int8(emb, id_col, vec_col)

    def dim_sum(k: int):
        return F.aggregate(
            F.zip_with(
                F.col("qvec"),
                F.array(*[F.lit(s) for s in signs[k]]),
                lambda x, s: x.cast("long") * s,
            ),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        )

    return q, F.array(*[dim_sum(k) for k in range(out_dim)])


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
    q, sums = _validate_and_quantize(emb, out_dim, in_dim, id_col, vec_col)
    return q.select(id_col, sums.alias("pvec"))


def random_projection(
    emb: DataFrame,
    out_dim: int = 16,
    in_dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id_col, dim_idx, value) — long-form projected vectors, one row per
    output dimension. Long form is what the cross-engine comparator and
    per-dimension consumers (QA profiles, per-dim stats) want; similarity
    search consumes :func:`projected_vectors`'s array form directly.

    The sums array feeds posexplode INLINE rather than through
    projected_vectors' named pvec column: a Project(pvec) + Generate pair
    drops the big higher-order-function projection out of whole-stage
    codegen (interpreted evaluation, ~9x slower at sf0.1); the inline
    generator keeps the whole thing in one codegen stage.
    """
    q, sums = _validate_and_quantize(emb, out_dim, in_dim, id_col, vec_col)
    return q.select(id_col, F.posexplode(sums).alias("dim_idx", "value")).select(
        id_col, F.col("dim_idx").cast("int").alias("dim_idx"), "value"
    )
