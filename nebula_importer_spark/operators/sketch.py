"""Deterministic cardinality sketches (KMV / k-minimum-values).

At 100 TB, ``count_distinct`` over a high-cardinality key is a full
shuffle of every distinct value; a KMV sketch answers "roughly how many
distinct" from the k smallest HASHES of the column — k longs per group,
whatever the cardinality (Bar-Yossef et al. 2002, "Counting distinct
elements in a data stream"; the estimator ``(k-1)·H / h_(k)`` with H the
hash space). This implementation is fully DETERMINISTIC — the hash is
md5-derived, not seeded per-run — so the estimate is reproducible across
engines and runs, which is what makes a sketch GATE-CHECKABLE here
(Spark's built-in approx_count_distinct is HLL++ with engine-internal
hashing — no SQL twin can reproduce it; same reason the repo's PageRank
is integer-scaled rather than float).

Estimator contract: hashes are the first 13 hex digits of
``md5(salt ‖ value)`` — 52 bits, exact in a BIGINT on any engine, same
idiom as operators/sampling.py. Hash collisions merge values INSIDE the
sketch — that is standard KMV behavior (the sketch lives on the hash
multiset), part of the quoted error bound (~1/sqrt(k-2) relative).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

#: 52-bit hash space (13 hex digits) — exact in a long and in a double.
KMV_SPACE = 2**52


def _kmv_hash(col: Column, salt: str) -> Column:
    return F.conv(
        F.substring(F.md5(F.concat(F.lit(salt), col.cast("string"))), 1, 13),
        16,
        10,
    ).cast("long")


def kmv_distinct(
    df: DataFrame,
    col: str,
    *,
    k: int = 256,
    group_cols: list[str] | None = None,
    salt: str = "kmv",
) -> DataFrame:
    """Per-group (or global) KMV distinct-cardinality estimate of ``col``.

    Output ``(*group_cols, n_kept, est_distinct)``: when a group holds
    fewer than ``k`` distinct hashes the estimate IS the exact distinct
    hash count (the sketch is lossless below its capacity); at capacity,
    ``est = (k-1) · 2^52 div h_(k)`` — integer floor division, so the
    output is hash-stable.

    Distributed shape: one dedup exchange on the fixed-width
    (group, hash) key — values never travel, only their 52-bit hashes —
    then the k-smallest selection: grouped, a rank-filter window that
    Spark ≥3.5 plans as WindowGroupLimit (per-partition top-k before the
    exchange); ungrouped, ``sort().limit(k)`` planned as
    TakeOrderedAndProject (per-partition top-k, never a global sort).
    State per group is k longs — the whole point at 100 TB.
    """
    if k < 16:
        raise ValueError(f"k must be >= 16 for a usable estimate, got {k}")
    groups = list(group_cols or [])
    if col in groups:
        raise ValueError(f"col {col!r} cannot also be a group column")
    hx = df.select(
        *groups, _kmv_hash(F.col(col), salt).alias("_h")
    ).distinct()
    if groups:
        w = Window.partitionBy(*groups).orderBy("_h")
        kept = hx.withColumn("_r", F.row_number().over(w)).filter(
            F.col("_r") <= k
        )
        agg = kept.groupBy(*groups).agg(
            F.count(F.lit(1)).alias("n_kept"), F.max("_h").alias("_kth")
        )
    else:
        kept = hx.orderBy("_h").limit(k)
        agg = kept.agg(
            F.count(F.lit(1)).alias("n_kept"), F.max("_h").alias("_kth")
        )
    return agg.select(
        *groups,
        F.col("n_kept").cast("long").alias("n_kept"),
        F.when(F.col("n_kept") < k, F.col("n_kept"))
        .otherwise(F.expr(f"({k - 1} * {KMV_SPACE}) div _kth"))
        .cast("long")
        .alias("est_distinct"),
    )


def cms_matrix(
    df: DataFrame,
    col: str,
    *,
    depth: int = 4,
    width: int = 512,
    salt: str = "cms",
) -> DataFrame:
    """Count-min sketch counter matrix over ``col`` (Cormode & Muthukrishnan
    2005, "An improved data stream summary: the count-min sketch and its
    applications"): ``depth`` independent hash rows of ``width`` counters;
    every occurrence of a value increments one cell per row. Point-frequency
    estimates (``cms_estimate``) are one-sided: est ≥ true, with
    overcount ≤ 2·N/width at probability 1 − (1/2)^depth.

    Why a sketch at 100 TB: an exact per-key frequency table over a
    high-cardinality key shuffles every distinct key; the CMS state is
    ``depth × width`` longs TOTAL — constant, mergeable by cell-wise sum
    (a union of matrices is the matrix of the union), and streamable.
    Like the KMV sketch above, the row hashes are md5-derived and fully
    deterministic, which is what makes the sketch oracle-checkable.

    Distributed shape: one map pass projects each row to ``depth``
    fixed-width ``(r, c)`` cells (a ``depth``-element explode — bounded
    fan-out), then ONE partial-aggregable groupBy over at most
    ``depth·width`` cells. Values never shuffle; only cell coordinates do.

    Returns ``(r, c, cnt)`` — absent cells are zero. NULL values are
    excluded (SQL aggregate semantics).
    """
    if depth < 1 or width < 2:
        raise ValueError(f"need depth >= 1 and width >= 2, got {depth}x{width}")
    if col not in df.columns:
        raise ValueError(f"column {col!r} not in input: {df.columns}")
    cells = F.array(
        *[
            F.struct(
                F.lit(r).alias("r"),
                F.pmod(_kmv_hash(F.col(col), f"{salt}{r}|"), F.lit(width))
                .cast("int")
                .alias("c"),
            )
            for r in range(depth)
        ]
    )
    return (
        df.filter(F.col(col).isNotNull())
        .select(F.explode(cells).alias("_cell"))
        .groupBy(F.col("_cell.r").alias("r"), F.col("_cell.c").alias("c"))
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )


def cms_estimate(
    matrix: DataFrame,
    keys: DataFrame,
    col: str,
    *,
    depth: int = 4,
    width: int = 512,
    salt: str = "cms",
) -> DataFrame:
    """Point-frequency estimates from a ``cms_matrix`` result for each
    distinct value of ``keys[col]``: ``est = min over rows r of the
    counter at (r, hash_r(key))`` — the classic one-sided CMS read.

    Distributed shape: keys project to their ``depth`` cells (same bounded
    explode), then ONE equi-join against the ≤ depth·width-row matrix —
    broadcast-sized by construction — and a per-key min. A cell no key
    collided into cannot be absent for a PRESENT key (the key's own
    increments put it there), so the inner join is lossless for any key
    that occurred; keys that never occurred estimate 0 via the left join.
    """
    if col not in keys.columns:
        raise ValueError(f"column {col!r} not in keys: {keys.columns}")
    kc = keys.select(col).filter(F.col(col).isNotNull()).distinct()
    cells = F.array(
        *[
            F.struct(
                F.lit(r).alias("r"),
                F.pmod(_kmv_hash(F.col(col), f"{salt}{r}|"), F.lit(width))
                .cast("int")
                .alias("c"),
            )
            for r in range(depth)
        ]
    )
    probes = kc.select(col, F.explode(cells).alias("_cell")).select(
        col, F.col("_cell.r").alias("r"), F.col("_cell.c").alias("c")
    )
    joined = probes.join(F.broadcast(matrix), ["r", "c"], "left")
    return joined.groupBy(col).agg(
        F.min(F.coalesce(F.col("cnt"), F.lit(0)))
        .cast("long")
        .alias("est_count")
    )


def hash_sample_quantiles(
    df: DataFrame,
    *,
    group_col: str = "event_type",
    value_col: str = "value",
    id_col: str = "event_id",
    k: int = 256,
    quantiles: tuple[int, ...] = (25, 50, 75),
    salt: str = "hsq",
) -> DataFrame:
    """Deterministic mergeable quantile sketch per group: the sample is the
    ``k`` rows with the SMALLEST ``md5(salt ‖ id)`` — a uniform sample that
    is a pure function of row identity, so (like the KMV cardinality
    sketch) it is order-free, mergeable (union → re-take bottom-k), and
    oracle-checkable where randomized reservoir/GK sketches cannot be.
    Below ``k`` rows the sample is the whole group and the quantiles are
    exact — the sketch degrades only above capacity, and then with the
    standard sqrt(k) sampling error.

    Quantile rule: the sample's value at index ``floor((n-1)·q/100)`` of
    the (value, id)-sorted sample — an ELEMENT PICK, never interpolation,
    so the output carries input values bit-identically (the resample_locf
    discipline) and hashes stably on any engine. The (value, id) sort key
    makes duplicate values deterministic.

    Distributed shape: the bottom-k is a (group)-keyed window rank that
    Spark ≥3.5 plans as a map-side WindowGroupLimit (each task forwards
    only its local bottom-k — the reducer sees ≤ k·tasks rows per group,
    never the group's population); the pick is one groupBy over ≤ k rows
    per group with a bounded sort_array(collect_list) — state is k longs
    per group at ANY group size, the property that makes this a sketch.

    Returns ``(group_col, n_sample, q<N> ...)`` one column per requested
    percentile. NULL values are excluded (SQL aggregate semantics).
    """
    if k <= 0:
        raise ValueError(f"k must be positive, got {k}")
    if not quantiles or any(not 0 <= q <= 100 for q in quantiles):
        raise ValueError(f"quantiles must be in [0, 100], got {quantiles}")
    for c in (group_col, value_col, id_col):
        if c not in df.columns:
            raise ValueError(f"column {c!r} not in input: {df.columns}")

    hkey = F.md5(
        F.concat(
            F.lit(salt),
            F.coalesce(F.col(id_col).cast("string"), F.lit("\x00null")),
        )
    )
    w = Window.partitionBy(group_col).orderBy(hkey.asc(), F.col(id_col).asc())
    sampled = (
        df.filter(F.col(value_col).isNotNull())
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
    )
    agg = sampled.groupBy(group_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_sample"),
        F.sort_array(
            F.collect_list(F.struct(F.col(value_col).alias("v"),
                                    F.col(id_col).alias("i")))
        ).alias("_s"),
    )
    picks = [
        F.element_at(
            F.col("_s"),
            (
                ((F.col("n_sample") - 1) * F.lit(int(q))) / F.lit(100)
            ).cast("int")
            + F.lit(1),
        )["v"].alias(f"q{q}")
        for q in quantiles
    ]
    return agg.select(group_col, "n_sample", *picks)


def _hll_constant(p: int) -> int:
    """Plan-time integer numerator for the raw HLL estimate.

    raw = alpha_m · m² / S with S = Σ_j 2^(−M[j]) and
    alpha_m = 0.7213/(1 + 1.079/m) = 7213·m / (10000·m + 10790) — the
    standard bias constant as an exact rational. With the register sum
    kept in fixed point (s_scaled = S · 2^Qmax, exact int64), the whole
    estimate is ONE integral division by a plan-time constant:

        raw = floor(alpha·m²·2^Qmax / s_scaled)
            = floor( (7213·m³·2^Qmax div (10000·m + 10790)) / s_scaled )

    (nested-floor identity; all operands positive). The inner division is
    folded HERE in Python at arbitrary precision — the folded K has ~20
    digits, beyond int64, so it travels as DECIMAL(38,0) (Spark) /
    HUGEINT (DuckDB); the runtime quotient K/s_scaled ≤ K/m fits int64
    because every register term contributes ≥ 1 to s_scaled.
    """
    m = 1 << p
    q_max = (52 - p) + 1
    return (7213 * m**3 * (1 << q_max)) // (10000 * m + 10790)


def hll_distinct(
    df: DataFrame,
    col: str,
    *,
    p: int = 12,
    group_cols: list[str] | None = None,
    salt: str = "hll",
) -> DataFrame:
    """Per-group (or global) HyperLogLog distinct-count estimate of
    ``col`` (Flajolet et al. 2007, "HyperLogLog: the analysis of a
    near-optimal cardinality estimation algorithm"), built — like every
    sketch in this module — on the deterministic md5-derived 52-bit hash
    so the registers, the fixed-point register sum, and the estimate are
    bit-identical on any engine (Spark's own approx_count_distinct is
    HLL++ with engine-internal hashing; no SQL twin can reproduce it).

    Register rule over the 52-bit hash: the top ``p`` bits pick the
    bucket, the remaining ``W = 52 − p`` bits ``w`` yield
    ``rho = W − bitlen(w) + 1`` (W+1 when w = 0) — the leading-zero rank,
    computed exactly via ``length(bin(w))`` on both engines. Registers
    are ``max(rho)`` per bucket: max is idempotent, so NO distinct pass
    is needed — duplicates are free, the property that makes HLL the
    one-pass sketch.

    Estimate: the raw branch is EXACT integer arithmetic end-to-end —
    ``s_scaled = Σ_j 2^(Qmax − M[j])`` (empty registers contribute
    2^Qmax; ≤ m·2^Qmax ≈ 2^53, exact int64) and one integral division by
    the plan-time constant of ``_hll_constant``. The small-range branch
    (raw ≤ 5m/2 with empty registers) is Flajolet's linear counting
    ``floor(m · ln(m / v_zero))`` — ONE float log per output row on a
    value from a 4096-point domain, verified bit-identical across
    Spark/DuckDB/libm over the entire domain (the dsir micro-nat
    discipline: floats never accumulate, they are floored once). The
    52-bit-space large-range correction only matters above ~1.5e14
    distinct and is deliberately omitted (documented, not silent).

    Output ``(*group_cols, m, v_zero, s_scaled, est_distinct)`` — the
    sufficient statistics travel with the estimate, so sketches merge by
    re-maxing registers and any divergence is diagnosable from the row.

    Distributed shape: one map pass projects each row to its fixed-width
    ``(bucket, rho)`` cell — values never shuffle — then ONE
    partial-aggregable groupBy over ≤ m·|groups| register cells and a
    second tiny agg over ≤ m rows per group. State per group is m bytes'
    worth of registers, whatever the cardinality: the 100-TB point.
    """
    regs = hll_registers(df, col, p=p, group_cols=group_cols, salt=salt)
    return hll_estimate(regs, p=p, group_cols=group_cols)


def hll_registers(
    df: DataFrame,
    col: str,
    *,
    p: int = 12,
    group_cols: list[str] | None = None,
    salt: str = "hll",
) -> DataFrame:
    """The HLL register table ``(*group_cols, bucket, rho)`` — nonzero
    registers only, one row per occupied bucket. This is the MERGEABLE
    sketch state: the registers of a union are the bucket-wise MAX of
    the parts' registers (max is idempotent and associative), which is
    what makes the sketch streamable batch-by-batch
    (streaming/sketches.py:run_incremental_hll) and compactable at any
    history length. See :func:`hll_distinct` for the register rule.
    """
    if not 4 <= p <= 14:
        raise ValueError(f"p must be in [4, 14], got {p}")
    if col not in df.columns:
        raise ValueError(f"column {col!r} not in input: {df.columns}")
    groups = list(group_cols or [])
    if col in groups:
        raise ValueError(f"col {col!r} cannot also be a group column")
    w_bits = 52 - p
    q_max = w_bits + 1
    h = _kmv_hash(F.col(col), salt)
    cells = (
        df.filter(F.col(col).isNotNull())
        .select(
            *groups,
            (h / F.lit(1 << w_bits)).cast("long").alias("bucket"),
            F.pmod(h, F.lit(1 << w_bits)).alias("_w"),
        )
        .select(
            *groups,
            "bucket",
            F.when(F.col("_w") == 0, F.lit(q_max))
            .otherwise(F.lit(w_bits) - (F.length(F.expr("bin(_w)")) - 1))
            .cast("int")
            .alias("rho"),
        )
    )
    return cells.groupBy(*groups, "bucket").agg(F.max("rho").alias("rho"))


def hll_estimate(
    regs: DataFrame,
    *,
    p: int = 12,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Estimate from a ``hll_registers`` table (or any bucket-wise-max
    merge of such tables — duplicate buckets are re-maxed here first, so
    unions of per-batch register snapshots feed in directly). Output and
    arithmetic contract as documented on :func:`hll_distinct`."""
    if not 4 <= p <= 14:
        raise ValueError(f"p must be in [4, 14], got {p}")
    for c in ("bucket", "rho"):
        if c not in regs.columns:
            raise ValueError(f"column {c!r} not in registers: {regs.columns}")
    groups = list(group_cols or [])
    m = 1 << p
    w_bits = 52 - p
    q_max = w_bits + 1
    k_const = _hll_constant(p)
    merged = regs.groupBy(*groups, "bucket").agg(F.max("rho").alias("_rho"))
    per_group = merged.groupBy(*groups).agg(
        F.count(F.lit(1)).alias("_nz"),
        # global agg over zero registers yields one row with a NULL sum:
        # coalesce to 0 so the empty sketch is the all-empty-register row
        # (v_zero = m, linear-counting est = 0), not a NULL row
        F.coalesce(
            F.sum(F.expr(f"shiftleft(CAST(1 AS BIGINT), {q_max} - _rho)")),
            F.lit(0).cast("long"),
        ).alias("_s_nz"),
    )
    stat = per_group.select(
        *groups,
        F.lit(m).cast("long").alias("m"),
        (F.lit(m) - F.col("_nz")).cast("long").alias("v_zero"),
        (
            F.col("_s_nz")
            + (F.lit(m) - F.col("_nz")) * F.lit(1 << q_max)
        ).cast("long").alias("s_scaled"),
    )
    raw = F.expr(f"CAST('{k_const}' AS DECIMAL(38,0)) div s_scaled")
    linear = F.floor(
        F.lit(float(m))
        * F.log(F.lit(float(m)) / F.col("v_zero").cast("double"))
    )
    return stat.select(
        *groups,
        "m",
        "v_zero",
        "s_scaled",
        F.when((raw * 2 <= 5 * m) & (F.col("v_zero") > 0), linear)
        .otherwise(raw)
        .cast("long")
        .alias("est_distinct"),
    )


def _bloom_bases(col: Column, salt: str) -> tuple[Column, Column]:
    """Two independent 52-bit hashes for Kirsch–Mitzenmacher double
    hashing (``bit_i = (h1 + i·h2) mod n_bits`` simulates i independent
    hash functions with two; Kirsch & Mitzenmacher 2006, "Less hashing,
    same performance"). i·h2 ≤ n_hashes·2^52 stays far under 2^63, so
    the arithmetic is exact int64 on any engine."""
    return _kmv_hash(col, f"{salt}1|"), _kmv_hash(col, f"{salt}2|")


def bloom_filter(
    df: DataFrame,
    col: str,
    *,
    n_bits: int = 1 << 17,
    n_hashes: int = 5,
    salt: str = "bloom",
) -> DataFrame:
    """Build a Bloom filter over the distinct values of ``col`` (Bloom
    1970): a 1-row DataFrame ``(n_keys, words)`` where ``words`` is the
    dense ``n_bits/64``-element ``array<long>`` bitset. Like every sketch
    in this module the hashes are md5-derived and fully deterministic,
    so the filter is reproducible across engines and runs and the
    operators built on it are gate-checkable.

    Membership contract: NO false negatives ever (every inserted key's
    bits are set); false positives at rate ≈ (1 − e^(−kn/m))^k — size
    ``n_bits`` at ~10× the expected distinct count for ~1% with 5
    hashes. NULL keys are not inserted (SQL ``IN`` semantics: NULL
    never matches).

    Distributed shape: distinct on the 104-bit hash pair (values
    themselves never shuffle — fixed-width keys, the exact_dedup
    discipline), a bounded ``n_hashes``-element explode to (word, mask)
    cells, ONE partial-aggregable ``bit_or`` over ≤ n_bits/64 groups,
    then a 1-row assembly whose state IS the bitset. Mergeable: the
    filter of a union is the word-wise OR of the filters (pytest-proven
    via zip_with).
    """
    if n_bits < 64 or n_bits % 64:
        raise ValueError(f"n_bits must be a positive multiple of 64, got {n_bits}")
    if not 1 <= n_hashes <= 16:
        raise ValueError(f"n_hashes must be in [1, 16], got {n_hashes}")
    if col not in df.columns:
        raise ValueError(f"column {col!r} not in input: {df.columns}")
    n_words = n_bits // 64
    h1, h2 = _bloom_bases(F.col(col), salt)
    hashed = (
        df.filter(F.col(col).isNotNull())
        .select(h1.alias("_h1"), h2.alias("_h2"))
        .distinct()
    )
    cells = F.array(
        *[
            F.pmod(F.col("_h1") + F.lit(i) * F.col("_h2"), F.lit(n_bits))
            for i in range(n_hashes)
        ]
    )
    words = (
        hashed.select(F.explode(cells).alias("_bit"))
        .select(
            (F.col("_bit") / 64).cast("int").alias("_w"),
            F.expr(
                "shiftleft(CAST(1 AS BIGINT), CAST(_bit % 64 AS INT))"
            ).alias("_m"),
        )
        .groupBy("_w")
        .agg(F.bit_or("_m").alias("_word"))
    )
    n_keys = hashed.agg(F.count(F.lit(1)).cast("long").alias("n_keys"))
    dense = words.agg(
        F.map_from_entries(
            F.collect_list(F.struct(F.col("_w"), F.col("_word")))
        ).alias("_map")
    ).select(
        F.transform(
            F.sequence(F.lit(0), F.lit(n_words - 1)),
            lambda i: F.coalesce(
                F.element_at(F.col("_map"), i.cast("int")), F.lit(0).cast("long")
            ),
        ).alias("words")
    )
    return n_keys.crossJoin(F.broadcast(dense))


def bloom_prefilter(
    df: DataFrame,
    col: str,
    bloom: DataFrame,
    *,
    n_bits: int = 1 << 17,
    n_hashes: int = 5,
    salt: str = "bloom",
) -> DataFrame:
    """Rows of ``df`` whose ``col`` MAY be in the ``bloom_filter`` result
    (built with the SAME n_bits/n_hashes/salt — the caller's contract,
    as with every parameterized sketch probe in this module). Guaranteed
    superset of the true matches; false positives pass through and must
    be resolved by whatever exact step follows (``bloom_semi_join``).

    Distributed shape: the 1-row bitset rides a broadcast nested-loop
    join (1 row × N — a map-side pattern, not a shuffle), then the
    membership test is ``n_hashes`` unrolled getbit probes in
    whole-stage codegen. The big side never exchanges: this is the
    100-TB point — a shuffle-join prunes AFTER moving every row, the
    bloom prunes BEFORE.
    """
    if col not in df.columns:
        raise ValueError(f"column {col!r} not in input: {df.columns}")
    if n_bits < 64 or n_bits % 64:
        raise ValueError(f"n_bits must be a positive multiple of 64, got {n_bits}")
    h1, h2 = _bloom_bases(F.col(col), salt)
    probe = df.withColumn("_h1", h1).withColumn("_h2", h2).crossJoin(
        F.broadcast(bloom.select("words"))
    )
    hit = None
    for i in range(n_hashes):
        bit = f"pmod(_h1 + {i} * _h2, {n_bits})"
        test = F.expr(
            f"getbit(element_at(words, CAST({bit} div 64 AS INT) + 1), "
            f"CAST({bit} % 64 AS INT)) = 1"
        )
        hit = test if hit is None else (hit & test)
    return probe.filter(F.col(col).isNotNull() & hit).drop(
        "_h1", "_h2", "words"
    )


def bloom_semi_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    small_key: str | None = None,
    *,
    n_bits: int = 1 << 17,
    n_hashes: int = 5,
    salt: str = "bloom",
) -> DataFrame:
    """EXACT left-semi join of ``big`` against ``small``'s keys with a
    Bloom pre-prune: build the filter over ``small`` (one pass over the
    SMALL side), drop the big side's non-matching rows MAP-SIDE (no
    false negatives, so nothing qualifying is lost), then resolve the
    surviving ≈ matches + FP·ε rows with a real left-semi join. Output
    ≡ ``big WHERE key IN (SELECT small_key FROM small)`` — the gate
    oracle is that exact semi-join, so the hash match IS the
    no-false-negative proof.

    Why at 100 TB: a plain semi-join shuffles the big side ON ITS WAY
    to the prune; here the exchange moves only the pre-pruned survivors
    — for a selective probe (the common case: "events for these flagged
    users") that is a 10-1000× smaller shuffle for one extra map pass.
    This is the runtime-filter / sideways-information-passing pattern
    (Spark's own AQE runtime bloom, made explicit and deterministic).
    """
    sk = small_key or key
    if sk not in small.columns:
        raise ValueError(f"column {sk!r} not in small side: {small.columns}")
    bloom = bloom_filter(small, sk, n_bits=n_bits, n_hashes=n_hashes, salt=salt)
    pruned = bloom_prefilter(
        big, key, bloom, n_bits=n_bits, n_hashes=n_hashes, salt=salt
    )
    keys = small.select(F.col(sk).alias(key)).filter(
        F.col(key).isNotNull()
    ).distinct()
    return pruned.join(keys, key, "left_semi")


def hll_rolling_distinct(
    df: DataFrame,
    ts_col: str,
    col: str,
    *,
    window_days: int = 7,
    p: int = 12,
    salt: str = "hll",
) -> DataFrame:
    """Rolling-window distinct estimate (e.g. weekly active users) by
    HLL register composition: ONE pass builds per-day registers, each
    register row then serves the ``window_days`` window-end days it
    falls into (a bounded ``window_days``-element explode — the
    register table is days·m rows, METADATA-sized, so the fan-out costs
    nothing), and a re-max per (day, bucket) yields each day's trailing
    sketch. The exact rolling distinct re-scans every window's raw rows
    (rolling_active_users — right at small windows); this touches the
    data ONCE at any window length, the sketch-composition point.

    Window ends are only days PRESENT in the data (an empty day
    contributes nothing and gets no row — same absent-group rule as
    hll_distinct). Output ``(day, m, v_zero, s_scaled, est_distinct)``
    with ``day`` as a DATE; arithmetic contract as hll_distinct.
    """
    if window_days < 1:
        raise ValueError(f"window_days must be >= 1, got {window_days}")
    for c in (ts_col, col):
        if c not in df.columns:
            raise ValueError(f"column {c!r} not in input: {df.columns}")
    daily = hll_registers(
        df.withColumn("_day", F.to_date(F.col(ts_col))).filter(
            F.col("_day").isNotNull()
        ),
        col,
        p=p,
        group_cols=["_day"],
        salt=salt,
    )
    days = daily.select(F.col("_day").alias("day")).distinct()
    served = daily.select(
        F.explode(
            F.sequence(F.lit(0), F.lit(window_days - 1))
        ).alias("_off"),
        "_day", "bucket", "rho",
    ).select(
        F.date_add(F.col("_day"), F.col("_off")).alias("day"),
        "bucket", "rho",
    ).join(days, "day", "left_semi")
    return hll_estimate(served, p=p, group_cols=["day"])


def ams_f2(
    df: DataFrame,
    col: str,
    *,
    k: int = 16,
    group_cols: list[str] | None = None,
    salt: str = "ams",
) -> DataFrame:
    """AMS second-frequency-moment sketch (Alon, Matias & Szegedy 1996,
    the Gödel-Prize one): estimate ``F₂ = Σ_v f_v²`` — the SELF-JOIN
    SIZE of a key column, the quantity a CBO needs to price a join on a
    skewed key (join_size_estimate computes it from exact per-key
    stats; this is the ONE-PASS CONSTANT-STATE version that never
    materializes per-key counts — the 100-TB point when the key's
    active domain itself is huge).

    Estimator: ``k`` independent ±1 hash signs (md5-derived, the
    deterministic-sketch discipline of this module — reproducible on
    any engine, unlike seeded RNG); per estimator the signed sum
    ``S_j = Σ_v sign_j(v)·f_v`` is ONE exact long aggregation
    (map-side combinable; E[S²] = F₂ exactly), and the reported
    ``f2_est`` is the MEDIAN of the k squares (median-of-estimates
    tames the variance, per the paper; lower-median element pick =
    deterministic). All integers end-to-end: signs ±1, sums exact
    longs, squares exact (|S| ≤ n ≤ 3·10⁹ for int64² headroom in
    DECIMAL(38,0)).

    NULLs are dropped (a NULL key joins nothing). Per group the state
    is k longs — constant, mergeable by addition (streamable under the
    CMS discipline). Returns ``(*group_cols, n, f2_est)`` plus
    ``s_sums`` (the k signed sums, array) — the sufficient statistics,
    so sketches merge downstream by element-wise addition and any
    divergence is diagnosable.
    """
    if not 1 <= k <= 64:
        raise ValueError(f"k must be in [1, 64], got {k}")
    if col not in df.columns:
        raise ValueError(f"column {col!r} not in input: {df.columns}")
    groups = list(group_cols or [])
    if col in groups:
        raise ValueError(f"col {col!r} cannot also be a group column")
    base = df.filter(F.col(col).isNotNull())
    aggs = [F.count(F.lit(1)).cast("long").alias("n")]
    for j in range(k):
        sign = (
            F.when(
                _kmv_hash(F.col(col), f"{salt}{j}|") % 2 == 0, F.lit(1)
            ).otherwise(F.lit(-1))
        ).cast("long")
        aggs.append(F.sum(sign).cast("long").alias(f"_s{j}"))
    one = base.groupBy(*groups).agg(*aggs) if groups else base.agg(*aggs)
    sq = F.array(
        *[F.expr(f"coalesce(_s{j}, 0) * coalesce(_s{j}, 0)") for j in range(k)]
    )
    return one.select(
        *groups,
        F.coalesce("n", F.lit(0)).alias("n"),
        F.sort_array(sq)[(k - 1) // 2].cast("long").alias("f2_est"),
        F.array(
            *[F.coalesce(F.col(f"_s{j}"), F.lit(0)) for j in range(k)]
        ).alias("s_sums"),
    )


def kmv_set_ops(
    df: DataFrame,
    col: str,
    group_col: str,
    *,
    k: int = 256,
    salt: str = "kmv",
) -> DataFrame:
    """Theta-sketch set operations over per-group KMV sketches — the
    estimated |A ∪ B|, |A ∩ B| and Jaccard for EVERY pair of groups at
    sketch cost (k longs per group), the audience-overlap / segment-
    containment question answered without a data-scale join.

    Combine rule (Dasgupta et al., "Theta Sketch Framework"): per group
    keep the k smallest distinct 52-bit md5 hashes; for a pair, the
    effective threshold is θ = min(θ_a, θ_b) (θ_g = the group's k-th
    smallest hash, or the full 2^52 space when the group is below
    capacity — its sketch is then COMPLETE and lossless). Hashes ≥ θ
    are discarded from both sides; the surviving counts scale by
    2^52/θ: ``est = (count · 2^52) div θ`` — integer floor division,
    hash-stable, and EXACT (at hash level) whenever both groups are
    below capacity.

    Distributed shape: ONE dedup exchange on the fixed-width
    (group, hash) key + the WindowGroupLimit bottom-k — identical to
    :func:`kmv_distinct`; everything after operates on sketch rows
    (≤ k·|groups|) and the |groups|² pair table — metadata scale, the
    whole point: group pairs never touch the data again. The exact
    per-pair distinct-overlap (one value-keyed self-join on the
    deduped values) rides along as the error witness, mirroring the
    ``kmv_distinct`` gate contract.

    Returns ``(group_a, group_b, est_union, est_inter, jaccard_ppm,
    exact_union, exact_inter)`` for every unordered group pair.
    """
    if k < 16:
        raise ValueError(f"k must be >= 16 for a usable estimate, got {k}")
    for c in (col, group_col):
        if c not in df.columns:
            raise ValueError(f"column {c!r} not in input: {df.columns}")
    if col == group_col:
        raise ValueError(f"col {col!r} cannot also be the group column")

    gv = df.select(
        F.col(group_col).alias("_g"), F.col(col).alias("_v")
    ).filter(F.col("_g").isNotNull() & F.col("_v").isNotNull()).distinct()
    hx = gv.select("_g", _kmv_hash(F.col("_v"), salt).alias("_h")).distinct()
    w = Window.partitionBy("_g").orderBy("_h")
    kept = hx.withColumn("_r", F.row_number().over(w)).filter(F.col("_r") <= k)
    theta = kept.groupBy("_g").agg(
        F.count(F.lit(1)).alias("_n"), F.max("_h").alias("_kth")
    ).select(
        "_g",
        F.when(F.col("_n") < k, F.lit(KMV_SPACE))
        .otherwise(F.col("_kth"))
        .alias("_theta"),
    )
    pairs = (
        theta.alias("ta")
        .join(theta.alias("tb"), F.col("ta._g") < F.col("tb._g"))
        .select(
            F.col("ta._g").alias("_ga"),
            F.col("tb._g").alias("_gb"),
            F.least("ta._theta", "tb._theta").alias("_th"),
        )
    )
    ska = kept.select(F.col("_g").alias("_ga"), F.col("_h").alias("_ha"))
    skb = kept.select(F.col("_g").alias("_gb"), F.col("_h").alias("_hb"))
    surv_a = (
        pairs.join(ska, "_ga")
        .filter(F.col("_ha") < F.col("_th"))
        .groupBy("_ga", "_gb")
        .agg(F.count(F.lit(1)).alias("_ca"))
    )
    surv_b = (
        pairs.join(skb, "_gb")
        .filter(F.col("_hb") < F.col("_th"))
        .groupBy("_ga", "_gb")
        .agg(F.count(F.lit(1)).alias("_cb"))
    )
    skb2 = kept.select(F.col("_g").alias("_gb2"), F.col("_h").alias("_hb"))
    inter = (
        pairs.join(ska, "_ga")
        .join(
            skb2,
            (F.col("_gb") == F.col("_gb2")) & (F.col("_ha") == F.col("_hb")),
        )
        .filter(F.col("_ha") < F.col("_th"))
        .groupBy("_ga", "_gb")
        .agg(F.count(F.lit(1)).alias("_ci"))
    )
    # exact witness: distinct-value overlap from the deduped values
    ex = (
        gv.alias("xa")
        .join(
            gv.alias("xb"),
            (F.col("xa._v") == F.col("xb._v"))
            & (F.col("xa._g") < F.col("xb._g")),
        )
        .groupBy(
            F.col("xa._g").alias("_ga"), F.col("xb._g").alias("_gb")
        )
        .agg(F.count(F.lit(1)).alias("_xi"))
    )
    sizes = gv.groupBy("_g").agg(F.count(F.lit(1)).alias("_sz"))
    est = (
        pairs.join(surv_a, ["_ga", "_gb"], "left")
        .join(surv_b, ["_ga", "_gb"], "left")
        .join(inter, ["_ga", "_gb"], "left")
        .join(ex, ["_ga", "_gb"], "left")
        .join(sizes.select(F.col("_g").alias("_ga"), F.col("_sz").alias("_sza")), "_ga")
        .join(sizes.select(F.col("_g").alias("_gb"), F.col("_sz").alias("_szb")), "_gb")
        .select(
            "_ga", "_gb", "_th",
            F.coalesce("_ca", F.lit(0)).alias("_ca"),
            F.coalesce("_cb", F.lit(0)).alias("_cb"),
            F.coalesce("_ci", F.lit(0)).alias("_ci"),
            F.coalesce("_xi", F.lit(0)).alias("_xi"),
            "_sza", "_szb",
        )
    )
    u_cnt = F.col("_ca") + F.col("_cb") - F.col("_ci")
    return est.select(
        F.col("_ga").alias("group_a"),
        F.col("_gb").alias("group_b"),
        F.when(F.col("_th") >= KMV_SPACE, u_cnt)
        .otherwise(F.expr(f"((_ca + _cb - _ci) * {KMV_SPACE}) div _th"))
        .cast("long")
        .alias("est_union"),
        F.when(F.col("_th") >= KMV_SPACE, F.col("_ci"))
        .otherwise(F.expr(f"(_ci * {KMV_SPACE}) div _th"))
        .cast("long")
        .alias("est_inter"),
        F.when(u_cnt > 0, F.expr("(_ci * 1000000) div (_ca + _cb - _ci)"))
        .cast("long")
        .alias("jaccard_ppm"),
        (F.col("_sza") + F.col("_szb") - F.col("_xi")).cast("long").alias("exact_union"),
        F.col("_xi").cast("long").alias("exact_inter"),
    )
