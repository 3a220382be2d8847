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

from ._util import ensure_parallelism
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
    # ensure_parallelism (r14): out_dim x in_dim multiply-adds per row —
    # heavy map work that must not serialize on a 1-task scan.
    q = quantize_int8(ensure_parallelism(emb), id_col, vec_col)

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


def scatter_matrix(
    emb: DataFrame,
    in_dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact-integer scatter matrix S_ij = Σ_vectors q_i·q_j over the
    int8-quantized vectors: (i int, j int, s bigint), in_dim² rows — the
    uncentered second-moment matrix PCA/whitening starts from.

    Scale shape: per vector the (i, j, q_i·q_j) triples come from two
    chained map-side generators (no self-join, no shuffle of a per-
    component table); the ONE hash aggregate's map-side partials collapse
    every partition to ≤ in_dim² rows before the only exchange — shuffle
    volume is the FIXED in_dim² grid regardless of corpus size. Overflow:
    |q| ≤ 127, so Σ q_i·q_j stays under 2^63 for ~5.7e14 vectors."""
    q = quantize_int8(emb, id_col, vec_col)
    qlong = F.transform(F.col("qvec"), lambda x: x.cast("long"))
    # Generator expressions INLINE (a Project(named_col) + Generate pair
    # drops out of whole-stage codegen — the random_projection lesson).
    xi = q.select(
        "qvec", F.posexplode(qlong).alias("i", "xi")
    )
    pairs = xi.select(
        "i", "xi", F.posexplode(F.transform(F.col("qvec"), lambda x: x.cast("long"))).alias("j", "xj")
    )
    return pairs.groupBy("i", "j").agg(F.sum(F.col("xi") * F.col("xj")).alias("s"))


def top_principal_direction(
    emb: DataFrame,
    iterations: int = 8,
    in_dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Top principal direction of the embedding corpus (the uncentered
    PCA axis — the building block of whitening, SemDeDup-style semantic
    compression, and anisotropy diagnostics), as a FIXED-iteration power
    method over exact integers:

        (dim_idx int, component_e4 bigint)   — in_dim rows

    component_e4 is the unit-normalized (max-|component| = 1e4)
    eigenvector estimate after `iterations` matvec rounds, sign-fixed so
    the first nonzero component is positive. Like the repo's pagerank
    fixed-iteration mode, the CONTRACT is "exactly k rounds of the
    spec", so the value is engine-independent even before convergence.

    Exactness: the corpus-sized stage is :func:`scatter_matrix` (exact
    BIGINT sums, one fixed-size shuffle). S normalizes to a 1e6 grid and
    every iteration renormalizes to a 1e4 grid with the repo's
    round-half-up FLOOR division (sign-safe — components go negative),
    all in arbitrary-precision Python ints here and HUGEINT arithmetic
    in the DuckDB oracle: no float anywhere, bit-identical results.

    The in_dim² scatter matrix is collected to the driver for the
    iteration — BOUNDED by the fixed geometry (64² rows, like the
    k-centroid collects), never by the corpus; at 100 TB the corpus
    touch is still the one scatter aggregate. Raises ValueError on an
    all-zero/empty corpus (no direction exists)."""
    rows = scatter_matrix(emb, in_dim=in_dim, id_col=id_col, vec_col=vec_col).collect()
    if not rows:
        raise ValueError("top_principal_direction: empty corpus")
    S = {(r["i"], r["j"]): int(r["s"]) for r in rows}
    smax = max(abs(v) for v in S.values())
    if smax == 0:
        raise ValueError("top_principal_direction: all-zero corpus")
    # Normalize S to a 1e6 grid (round-half-up; python // floors, which
    # is the sign-safe form), then iterate on a 1e4-grid vector.
    s1 = {k: (2 * v * 10**6 + smax) // (2 * smax) for k, v in S.items()}
    v = [10**4] * in_dim
    for _ in range(iterations):
        u = [
            sum(s1.get((i, j), 0) * v[j] for j in range(in_dim))
            for i in range(in_dim)
        ]
        m = max(abs(x) for x in u)
        if m == 0:
            raise ValueError("top_principal_direction: degenerate iteration")
        v = [(2 * x * 10**4 + m) // (2 * m) for x in u]
    flip = -1 if next((c for c in v if c != 0), 1) < 0 else 1
    spark = emb.sparkSession
    return spark.createDataFrame(
        [(i, flip * c) for i, c in enumerate(v)],
        "dim_idx int, component_e4 long",
    )


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
