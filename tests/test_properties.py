"""Property-based tests (hypothesis): operators vs independent pure-Python
reference implementations on randomized inputs.

The oracle-parity suite pins behavior on the fixed test tables; these pin
the operator SEMANTICS on adversarial shapes (ties, empty groups, single
rows, negative values) that fixed fixtures may never hit. Examples are
batched into one DataFrame per case so each hypothesis example costs one
Spark job, not one per row.
"""

from __future__ import annotations

import re

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F

from statline_bq_spark.functions.cleaning import clean_python_name
from statline_bq_spark.operators.relational import asof_join

SETTINGS = dict(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
    derandomize=True,  # stable CI: the seed is fixed
)


# --- asof_join vs brute-force reference -------------------------------------

events = st.lists(
    st.tuples(
        st.integers(0, 3),        # key
        st.integers(0, 50),       # ts
        st.integers(-100, 100),   # payload
    ),
    min_size=1,
    max_size=40,
)


def _ref_asof(left, right, strict, direction="backward"):
    """O(n·m) reference: nearest right row with same key — latest earlier
    (backward: rt < t, <= when not strict) or first later (forward: rt > t,
    >= when not strict); ties on rt resolved by nearest rt only (value of
    that row is ambiguous under exact rt duplicates, so inputs dedupe rt
    per key)."""
    out = {}
    for (lk, lt, lid) in left:
        best = None
        for (rk, rt, rv) in right:
            if rk != lk:
                continue
            if direction == "backward":
                ok = (rt < lt) if strict else (rt <= lt)
                better = best is None or rt > best[0]
            else:
                ok = (rt > lt) if strict else (rt >= lt)
                better = best is None or rt < best[0]
            if ok and better:
                best = (rt, rv)
        out[lid] = best[1] if best else None
    return out


@given(left=events, right=events, strict=st.booleans(),
       direction=st.sampled_from(["backward", "forward"]))
@settings(**SETTINGS)
def test_asof_join_matches_reference(spark, left, right, strict, direction):
    # unique left ids; dedupe right (key, ts) so the reference is well-defined
    left = [(k, t, i) for i, (k, t, _) in enumerate(left)]
    seen, rdedup = set(), []
    for (k, t, v) in right:
        if (k, t) not in seen:
            seen.add((k, t))
            rdedup.append((k, t, v))
    ldf = spark.createDataFrame(left, "key int, t int, lid int")
    rdf = spark.createDataFrame(rdedup, "key int, rt int, rv int")
    got = {
        r.lid: r.rv
        for r in asof_join(
            ldf, rdf, ["key"], "t", "rt", right_values=["rv"],
            strict=strict, direction=direction,
        ).collect()
    }
    assert got == _ref_asof(left, rdedup, strict, direction)


# --- clean_python_name vs the reference's regex semantics -------------------

def _ref_clean(s: str) -> str:
    """Reference semantics (reference utils.py:267-295): strip leading
    non-alpha/underscore, replace every remaining invalid char with _.
    Note: space-only strip — Spark's trim() removes ' ' only, not \\t/\\n
    (those become _ via the invalid-char regex, same as mid-string)."""
    s = s.strip(" ")
    s = re.sub(r"^[^a-zA-Z_]+", "", s)
    return re.sub(r"[^0-9a-zA-Z_]", "_", s)


@given(st.lists(st.text(max_size=30), min_size=1, max_size=30))
@settings(**SETTINGS)
def test_clean_python_name_matches_reference(spark, strings):
    df = spark.createDataFrame([(i, s) for i, s in enumerate(strings)], "i int, s string")
    got = {
        r.i: r.c
        for r in df.select("i", clean_python_name("s").alias("c")).collect()
    }
    assert got == {i: _ref_clean(s) for i, s in enumerate(strings)}


# --- running totals vs prefix sums ------------------------------------------

@given(
    st.lists(
        st.tuples(st.integers(0, 2), st.integers(-1000, 1000)),
        min_size=1,
        max_size=40,
    )
)
@settings(**SETTINGS)
def test_running_total_matches_prefix_sums(spark, rows):
    from statline_bq_spark.operators.analytic import running_total

    data = [(k, i, v) for i, (k, v) in enumerate(rows)]
    df = spark.createDataFrame(data, "key int, seq int, v long")
    got = {
        (r.key, r.seq): r.running_total
        for r in running_total(df, ["key"], ["seq"], "v").collect()
    }
    acc: dict[int, int] = {}
    for k, i, v in data:
        acc[k] = acc.get(k, 0) + v
        assert got[(k, i)] == acc[k]


# --- chunker: pure-Python reference semantics -------------------------------

def _ref_chunks(text, width=8, overlap=3):
    # The repo-wide tokenization convention, NOT str.split(): Spark/DuckDB
    # trim() strips the ASCII space only (a leading tab survives and
    # yields a leading '' token after the \s+ split, on BOTH engines), and
    # \s must be the ASCII five (re.ASCII) to match Java/RE2. str.split()
    # would silently drop those edge tokens and eat Unicode whitespace —
    # the exact divergences the round-6 dirty rows pinned.
    import re

    words = re.split(r"\s+", text.strip(" "), flags=re.ASCII)
    step = width - overlap
    out = []
    for idx, start in enumerate(range(0, max(1, len(words) - overlap), step)):
        piece = words[start : start + width]
        out.append((idx, " ".join(piece), len(piece)))
    return out


@given(
    st.lists(
        st.text(
            alphabet=st.sampled_from("ab c\t\n"), min_size=1, max_size=60
        ).filter(lambda s: s.strip()),
        min_size=1,
        max_size=10,
    )
)
@settings(**SETTINGS)
def test_udtf_chunker_matches_reference(spark, texts):
    """The UDTF chunker on adversarial whitespace == the pure-Python spec
    (and transitively the JVM twin, which shares the DuckDB oracle)."""
    from statline_bq_spark.functions.udtf import make_chunk_udtf

    spark.udtf.register("chunk_text_prop", make_chunk_udtf(8, 3))
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id int, text string"
    )
    df.createOrReplaceTempView("prop_docs")
    got = {}
    for r in spark.sql(
        "SELECT d.doc_id, c.* FROM prop_docs d, LATERAL chunk_text_prop(d.text) c"
    ).collect():
        got.setdefault(r.doc_id, []).append((r.chunk_idx, r.chunk, r.n_tokens))
    for i, t in enumerate(texts):
        assert sorted(got[i]) == _ref_chunks(t), (i, t)


def test_ngram_jaccard_df_cap_bounds_boilerplate_blowup(spark):
    """A shingle shared by every document must not quadratic-blow the
    inverted-index self-join: with df_cap below the corpus size the
    boilerplate gram is dropped from the gram universe, so pairs whose only
    overlap is boilerplate disappear while genuinely-overlapping pairs
    (distinct shared grams) keep their informative-gram Jaccard."""
    from statline_bq_spark.operators.dedup import ngram_jaccard_pairs

    boiler = "lorem ipsum dolor"
    rows = [(i, f"{boiler} unique{i} tail{i} end{i}") for i in range(40)]
    # two true near-dups sharing informative grams beyond the boilerplate
    rows += [(100, f"{boiler} alpha beta gamma delta"),
             (101, f"{boiler} alpha beta gamma delta")]
    df = spark.createDataFrame(rows, "doc_id long, text string")

    capped = ngram_jaccard_pairs(df, shingle_n=3, threshold=0.05, df_cap=8)
    got = {(r["a"], r["b"]): r["jaccard"] for r in capped.collect()}
    # the 40 boilerplate-only docs share ONLY capped grams -> no pairs
    assert all(a == 100 and b == 101 for (a, b) in got), got
    # the true pair survives with Jaccard over informative grams = 1.0
    assert got[(100, 101)] == 1.0

    # uncapped baseline would emit a pair for every boilerplate doc combo
    uncapped = ngram_jaccard_pairs(df, shingle_n=3, threshold=0.05,
                                   df_cap=10**9)
    assert uncapped.count() > len(got)


def test_fuzzy_pairs_finds_planted_typos(spark):
    """A planted one-char typo of an existing name must surface as a
    dist-1 pair, and unrelated names must not pair up."""
    from statline_bq_spark.operators.dedup import fuzzy_pairs

    rows = [
        (1, "Acme Widget Works"),
        (2, "Acme Widget Worxs"),   # 1 substitution+shift of #1 (dist<=2?) -> verify below
        (3, "Acme Widget Work"),    # 1 deletion of #1
        (4, "Globex Corporation"),
        (5, "Initech LLC"),
    ]
    df = spark.createDataFrame(rows, "id long, name string")
    got = {(r.a, r.b): r.dist for r in fuzzy_pairs(
        df, id_col="id", str_col="name", max_dist=2, df_cap=10
    ).collect()}
    assert (1, 3) in got and got[(1, 3)] == 1
    assert (1, 2) in got and got[(1, 2)] <= 2
    assert all(a != 4 and b != 4 for a, b in got), got
    assert all(a != 5 and b != 5 for a, b in got), got


def test_blocked_cosine_pairs_equals_all_pairs_baseline(spark):
    """`cosine_pairs_blocked` must return EXACTLY the all-pairs baseline's
    result on arbitrary vectors — the blocking is a physical rewrite, not
    an approximation — including with many more blocks than rows."""
    import random as _r

    from statline_bq_spark.operators.similarity import (
        cosine_pairs,
        cosine_pairs_blocked,
    )

    rng = _r.Random(7)
    rows = [
        (i, [rng.uniform(-1, 1) for _ in range(8)]) for i in range(40)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    base = {(r.a, r.b, r.sim) for r in cosine_pairs(df, threshold=0.3).collect()}
    for n_blocks in (1, 4, 64):
        got = {
            (r.a, r.b, r.sim)
            for r in cosine_pairs_blocked(
                df, threshold=0.3, n_blocks=n_blocks
            ).collect()
        }
        assert got == base, f"n_blocks={n_blocks}"


def test_new_ops_handle_empty_and_degenerate_inputs(spark):
    """Empty corpus / empty benchmark must not raise and must obey the
    obvious identities."""
    from statline_bq_spark.operators.dedup import fuzzy_pairs
    from statline_bq_spark.operators.decontaminate import (
        semantic_decontaminate,
    )
    from statline_bq_spark.operators.similarity import cosine_pairs_blocked

    empty_vec = spark.createDataFrame(
        [], "vec_id long, embedding array<double>"
    )
    assert cosine_pairs_blocked(empty_vec).count() == 0

    empty_named = spark.createDataFrame([], "id long, name string")
    assert fuzzy_pairs(empty_named, id_col="id", str_col="name").count() == 0

    corpus = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [0.0, 1.0])],
        "vec_id long, embedding array<double>",
    )
    # empty benchmark -> nothing is contaminated, corpus passes through
    out = semantic_decontaminate(corpus, empty_vec, threshold=0.5)
    assert sorted(r.vec_id for r in out.collect()) == [1, 2]
    # benchmark identical to corpus -> everything is contaminated
    out2 = semantic_decontaminate(corpus, corpus, threshold=0.99)
    assert out2.count() == 0


# --- sequence packing vs pure-Python prefix sums ----------------------------

pack_rows = st.lists(
    st.tuples(
        st.integers(0, 2),      # stream key
        st.integers(0, 10_000), # order key (deduped below)
        st.integers(0, 50),     # token count (0 = empty doc)
    ),
    min_size=1,
    max_size=60,
    unique_by=lambda r: (r[0], r[1]),
)


@given(rows=pack_rows, block_size=st.sampled_from([1, 3, 4096]),
       capacity=st.sampled_from([7, 64]))
@settings(**SETTINGS)
def test_pack_sequences_matches_python_reference(spark, rows, block_size,
                                                 capacity):
    from statline_bq_spark.operators import packing

    df = spark.createDataFrame(rows, "k int, ord long, n long")
    got = {
        (r.k, r.ord): (r.start_offset, r.seq_id, r.n_seqs_spanned)
        for r in packing.pack_sequences(
            df, "k", "ord", "n", capacity=capacity, block_size=block_size
        ).collect()
    }
    # pure-Python reference: exclusive cumsum in (k, ord) order
    by_key: dict[int, list] = {}
    for k, o, n in rows:
        by_key.setdefault(k, []).append((o, n))
    expected = {}
    for k, docs in by_key.items():
        off = 0
        for o, n in sorted(docs):
            end = off + max(n, 1) - 1
            expected[(k, o)] = (
                off, off // capacity, end // capacity - off // capacity + 1
            )
            off += n
    assert got == expected


@given(rows=st.lists(
    st.tuples(st.sampled_from(["a", "b", "c"]), st.integers(0, 100_000)),
    min_size=3, max_size=60, unique_by=lambda r: r[1],
))
@settings(**SETTINGS)
def test_mixture_sample_matches_python_md5_reference(spark, rows):
    """The per-row keep decision is re-derivable from hashlib alone."""
    import hashlib
    from statline_bq_spark.operators import packing

    df = spark.createDataFrame(rows, "source string, id long")
    got = {r.id: r.keep for r in
           packing.mixture_sample(df, "source", "id", alpha=0.5).collect()}
    counts: dict[str, int] = {}
    for s, _ in rows:
        counts[s] = counts.get(s, 0) + 1
    n_min = min(counts.values())
    for s, i in rows:
        rate = (n_min / counts[s]) ** 0.5
        u = int(hashlib.md5(f"mix{i}".encode()).hexdigest()[:4], 16) / 65536.0
        assert got[i] == (u < rate), (s, i, u, rate)


# --- schema widening policy -------------------------------------------------

def test_widen_is_commutative_associative_and_idempotent():
    """The cross-snapshot widening lattice must behave like a join
    semilattice: commutative, associative, idempotent — otherwise the
    resulting union schema would depend on snapshot order."""
    from itertools import product

    from pyspark.sql.types import (
        BooleanType, ByteType, DoubleType, FloatType, IntegerType,
        LongType, ShortType, StringType, TimestampType,
    )

    from statline_bq_spark.sources.evolution import widen

    types = [ByteType(), ShortType(), IntegerType(), FloatType(),
             LongType(), DoubleType(), StringType(), BooleanType(),
             TimestampType()]
    for a, b in product(types, repeat=2):
        assert widen(a, b) == widen(b, a), (a, b)
        assert widen(a, a) == a
    for a, b, c in product(types, repeat=3):
        assert widen(widen(a, b), c) == widen(a, widen(b, c)), (a, b, c)


def test_widen_is_lossless_on_numeric_chain():
    """Every numeric pair's widened type must hold both inputs' extremes
    exactly (float/long meet at double by design — double holds every
    float, and longs up to 2^53 which is the documented bound)."""
    from pyspark.sql.types import (
        ByteType, DoubleType, FloatType, IntegerType, LongType, ShortType,
    )

    from statline_bq_spark.sources.evolution import widen

    order = [ByteType(), ShortType(), IntegerType(), LongType()]
    for i, small in enumerate(order):
        for big in order[i:]:
            assert widen(small, big) == big
    assert widen(FloatType(), DoubleType()) == DoubleType()
    assert widen(FloatType(), LongType()) == DoubleType()
    assert widen(IntegerType(), FloatType()) == FloatType()


# --- round-3 operators ------------------------------------------------------

budget_rows = st.lists(
    st.tuples(
        st.sampled_from(["a", "b", "c"]),   # group
        st.integers(0, 1000),               # id (deduped below)
        st.integers(1, 40),                 # tokens
        st.integers(0, 100),                # priority
    ),
    min_size=1,
    max_size=40,
    unique_by=lambda r: r[1],
)


@given(rows=budget_rows, budget=st.integers(1, 200))
@settings(**SETTINGS)
def test_token_budget_fill_matches_greedy_reference(spark, rows, budget):
    """token_budget_fill == the pure-Python greedy prefix fill: order by
    (priority desc, id), keep while the running token total stays within
    budget — and the kept set is always a PREFIX of that order."""
    from statline_bq_spark.operators.sampling import token_budget_fill

    df = spark.createDataFrame(
        rows, "grp string, id long, toks long, prio long"
    )
    got = {
        r.id: r.cum_tokens
        for r in token_budget_fill(
            df,
            "grp",
            F.col("toks"),
            budget,
            order_by=[F.col("prio").desc(), F.col("id")],
        ).collect()
    }
    want = {}
    by_grp: dict = {}
    for g, i, t, p in rows:
        by_grp.setdefault(g, []).append((i, t, p))
    for g, members in by_grp.items():
        members.sort(key=lambda m: (-m[2], m[0]))
        cum = 0
        for i, t, _ in members:
            cum += t
            if cum > budget:
                break
            want[i] = cum
    assert got == want


@given(
    keys=st.lists(st.integers(0, 10_000), min_size=1, max_size=50, unique=True),
    k=st.integers(2, 16),
)
@settings(**SETTINGS)
def test_kfold_assign_is_stable_partition(spark, keys, k):
    """Folds are in [0, k), derived from md5 alone (stable under
    repartitioning), and identical across two runs."""
    from statline_bq_spark.operators.sampling import kfold_assign

    df = spark.createDataFrame([(x,) for x in keys], "id long")
    a = {r.id: r.fold for r in kfold_assign(df, "id", k).collect()}
    b = {
        r.id: r.fold
        for r in kfold_assign(df.repartition(7), "id", k).collect()
    }
    assert a == b
    assert set(a) == set(keys)
    assert all(0 <= f < k for f in a.values())


@given(
    texts=st.lists(
        st.text(
            alphabet="ab .the of", min_size=0, max_size=60
        ).filter(lambda t: t.strip()),
        min_size=1,
        max_size=25,
    )
)
@settings(**SETTINGS)
def test_funnel_counters_telescope(spark, texts):
    """Funnel algebra on arbitrary text: survivors are monotone
    non-increasing and every stage satisfies n_in − n_dropped = n_out;
    stage 1 sees every doc. Also: counters computed on two halves SUM to
    the whole-input counters (the streaming-monitor merge property)."""
    from statline_bq_spark.functions import funnel

    df = spark.createDataFrame([(t,) for t in texts], "text string")
    rep = {
        r.stage: (r.n_in, r.n_dropped, r.n_out)
        for r in funnel.funnel_report(df).collect()
    }
    assert rep[1][0] == len(texts)
    for stage in range(1, 6):
        n_in, dropped, n_out = rep[stage]
        assert n_in - dropped == n_out
        if stage > 1:
            assert n_in == rep[stage - 1][2]

    half = len(texts) // 2
    parts = [texts[:half], texts[half:]]
    counters = [
        funnel.funnel_counters(
            spark.createDataFrame([(t,) for t in p], "text string")
        )
        for p in parts
        if p
    ]
    merged = counters[0]
    for c in counters[1:]:
        merged = merged.unionByName(c)
    got = {
        r.stage: (r.n_in, r.n_dropped, r.n_out)
        for r in funnel.report_from_counters(merged).collect()
    }
    assert got == rep


@given(
    rows=st.lists(
        st.tuples(st.sampled_from(["x", "y"]), st.integers(-50, 50)),
        min_size=1,
        max_size=40,
    )
)
@settings(**SETTINGS)
def test_incremental_merge_equals_full_on_any_split(spark, rows):
    """merge(partial(A), partial(B)) == partial(A ∪ B) for every split
    point — the mergeable-monoid contract on random data."""
    from statline_bq_spark.plans import incremental as inc

    specs = [
        inc.AggSpec("count", None, "n"),
        inc.AggSpec("sum", "v", "s"),
        inc.AggSpec("min", "v", "mn"),
        inc.AggSpec("max", "v", "mx"),
    ]
    full_df = spark.createDataFrame(rows, "k string, v long")
    want = {
        r.k: (r.n, r.s, r.mn, r.mx)
        for r in inc.partial_state(full_df, ["k"], specs).collect()
    }
    cut = len(rows) // 2
    parts = [
        inc.partial_state(
            spark.createDataFrame(p, "k string, v long"), ["k"], specs
        )
        for p in (rows[:cut], rows[cut:])
        if p
    ]
    got = {
        r.k: (r.n, r.s, r.mn, r.mx)
        for r in inc.merge_states(parts, ["k"], specs).collect()
    }
    assert got == want


@given(
    rows=st.lists(
        st.tuples(st.integers(0, 30), st.integers(0, 10_000)),
        min_size=1,
        max_size=60,
        unique_by=lambda r: r[1],
    ),
    buckets=st.integers(2, 10),
)
@settings(**SETTINGS)
def test_global_rank_and_exact_ntile_match_window_reference(
    spark, rows, buckets
):
    """global_rank == unpartitioned row_number, and exact_ntile_from_rank
    == ntile, on random data with ties in the primary key (the unique id
    breaks them)."""
    from statline_bq_spark.operators import analytic

    df = spark.createDataFrame(rows, "v long, id long")
    ranked = analytic.global_rank(
        df, [F.col("v").desc(), F.col("id")], num_partitions=4, out_col="rn"
    )
    n_total = len(rows)
    got = {
        r.id: (r.rn, r.tile)
        for r in ranked.withColumn(
            "tile",
            analytic.exact_ntile_from_rank(
                F.col("rn"), F.lit(n_total), buckets
            ),
        ).collect()
    }
    ordered = sorted(rows, key=lambda r: (-r[0], r[1]))
    q, rem = divmod(n_total, buckets)
    want = {}
    for i, (_, rid) in enumerate(ordered, start=1):
        if q == 0:
            tile = i
        elif i <= rem * (q + 1):
            tile = (i - 1) // (q + 1) + 1
        else:
            tile = rem + (i - rem * (q + 1) - 1) // q + 1
        want[rid] = (i, tile)
    assert got == want


# --- connected_components vs union-find reference ---------------------------

edge_lists = st.lists(
    st.tuples(st.integers(0, 11), st.integers(0, 11)),
    min_size=1,
    max_size=25,
)


def _uf_components(edges):
    """Union-find reference: node -> min node id in its component."""
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[ra] = rb
    roots = {}
    for n in parent:
        roots.setdefault(find(n), []).append(n)
    return {n: min(ns) for r, ns in roots.items() for n in ns}


@given(edges=edge_lists)
@settings(**SETTINGS)
def test_connected_components_matches_union_find(spark, edges):
    """Min-label propagation == union-find on random graphs, including
    self-loops, duplicate edges, and reversed duplicates. The 12-node
    universe keeps worst-case diameters within the iteration budget while
    still generating multi-component shapes."""
    from statline_bq_spark.operators.graph import connected_components

    df = spark.createDataFrame(edges, "src long, dst long")
    got = {
        r.node: r.component
        for r in connected_components(df, max_iter=15).collect()
    }
    assert got == _uf_components(edges)


# --- interval_join vs brute-force containment reference ---------------------

points_st = st.lists(
    st.tuples(st.integers(0, 1000), st.integers(-80, 80)),  # (pid, value)
    min_size=1,
    max_size=30,
    unique_by=lambda r: r[0],
)
intervals_st = st.lists(
    st.tuples(
        st.integers(0, 1000),      # iid
        st.integers(-80, 80),      # lo
        st.integers(-80, 80),      # hi (may be <= lo: degenerate, dropped)
    ),
    min_size=1,
    max_size=20,
    unique_by=lambda r: r[0],
)


@given(points=points_st, intervals=intervals_st,
       width=st.sampled_from([1, 2, 7, 32]))
@settings(**SETTINGS)
def test_interval_join_matches_containment_reference(
    spark, points, intervals, width
):
    """Bucketized interval_join == brute-force [lo, hi) containment on
    random data including NEGATIVE coordinates (floor-of-negative bucket
    math), degenerate hi<=lo intervals, and bucket widths smaller and
    larger than typical interval lengths."""
    from statline_bq_spark.operators.relational import interval_join

    p = spark.createDataFrame(points, "pid long, v long")
    iv = spark.createDataFrame(intervals, "iid long, lo long, hi long")
    got = {
        (r.pid, r.iid)
        for r in interval_join(p, iv, "v", "lo", "hi", bucket_width=width)
        .select("pid", "iid")
        .collect()
    }
    want = {
        (pid, iid)
        for pid, v in points
        for iid, lo, hi in intervals
        if lo <= v < hi
    }
    assert got == want


# --- gap_fill_linear vs pure-Python interpolation reference -----------------

gap_rows = st.lists(
    st.tuples(
        st.integers(0, 2),       # key
        st.integers(0, 30),      # hour offset
        st.integers(-100, 100),  # value
    ),
    min_size=1,
    max_size=25,
    unique_by=lambda r: (r[0], r[1]),  # one observation per (key, bucket):
    # the bucket mean is then the value itself, so the reference needs no
    # decimal-mean rounding emulation
)


def _ref_gap_fill_linear(rows):
    """Mirrors gap_fill_linear's arithmetic exactly: epoch-second times,
    1e4-scaled interpolation, one round at integer precision. Interior
    ties (x.5) are impossible here — they'd need a gap with 2-adic
    valuation ≥ 2^5 hours, and the spine is only 31 hours wide."""
    by_key: dict[int, dict[int, int]] = {}
    for k, h, v in rows:
        by_key.setdefault(k, {})[h] = v
    lo = min(h for _, h, _ in rows)
    hi = max(h for _, h, _ in rows)
    out = {}
    for k, obs in by_key.items():
        hs = sorted(obs)
        for h in range(lo, hi + 1):
            if h in obs:
                out[(k, h)] = float(obs[h])
                continue
            prev = max((x for x in hs if x < h), default=None)
            nxt = min((x for x in hs if x > h), default=None)
            if prev is None or nxt is None:
                out[(k, h)] = None
                continue
            t, pt, nt = h * 3600.0, prev * 3600.0, nxt * 3600.0
            pv, nv = float(obs[prev]), float(obs[nxt])
            num = (pv * 10000.0) * (nt - t) + (nv * 10000.0) * (t - pt)
            x = num / (nt - pt)
            r = round(x)  # no ties possible -> banker's == half-up
            out[(k, h)] = r / 10000.0
    return out


@given(rows=gap_rows)
@settings(**SETTINGS)
def test_gap_fill_linear_matches_python_reference(spark, rows):
    from datetime import datetime, timedelta

    from statline_bq_spark.operators.timeseries import gap_fill_linear

    base = datetime(2024, 1, 1)
    data = [
        (k, base + timedelta(hours=h), float(v)) for k, h, v in rows
    ]
    df = spark.createDataFrame(data, "k long, ts timestamp, val double")
    got = {}
    for r in gap_fill_linear(df, "ts", "1 hour", "k", "val").collect():
        h = int(
            (datetime.strptime(r.window_start, "%Y-%m-%d %H:%M:%S") - base)
            .total_seconds() // 3600
        )
        got[(r.k, h)] = r.interp_value
    assert got == _ref_gap_fill_linear(rows)


# --- hierarchy_closure vs Python BFS reference -------------------------------

forest_edges = st.lists(
    st.tuples(st.integers(0, 14), st.integers(0, 14)),  # (child, parent)
    min_size=1,
    max_size=20,
    unique_by=lambda r: r,
)


def _ref_closure(edges, max_depth):
    """All (child, ancestor, depth) paths by path enumeration — multi-parent
    nodes (a DAG, legal in parent-pointer tables with duplicate keys) yield
    one row per distinct (child, ancestor, depth) PATH CLASS, deduped the
    way unionByName of per-level joins dedupes (not at all within a level:
    two distinct paths of equal length to the same ancestor emit two rows).
    The operator keeps duplicates, so the reference counts multiplicity."""
    parents: dict[int, list[int]] = {}
    for c, p in edges:
        parents.setdefault(c, []).append(p)
    from collections import Counter

    out = Counter()
    for start in parents:
        frontier = Counter({start: 1})
        for depth in range(1, max_depth + 1):
            nxt = Counter()
            for node, mult in frontier.items():
                for p in parents.get(node, ()):
                    nxt[p] += mult
            if not nxt:
                break
            for anc, mult in nxt.items():
                out[(start, anc, depth)] += mult
            frontier = nxt
    return dict(out)


@given(edges=forest_edges, max_depth=st.integers(2, 6))
@settings(**SETTINGS)
def test_hierarchy_closure_matches_bfs_reference(spark, edges, max_depth):
    """Closure == path-multiplicity BFS on random graphs, including cycles
    (bounded by the depth cap), self-loops, and multi-parent nodes."""
    from collections import Counter

    from statline_bq_spark.operators.hierarchy import hierarchy_closure

    df = spark.createDataFrame(edges, "child long, parent long")
    got = Counter(
        (r.child, r.ancestor, r.depth)
        for r in hierarchy_closure(df, max_depth=max_depth).collect()
    )
    assert dict(got) == _ref_closure(edges, max_depth)


# --- salted_join ≡ plain join -------------------------------------------------

join_rows = st.lists(
    st.tuples(st.integers(0, 3), st.integers(0, 9)),  # (key, payload)
    min_size=0,
    max_size=25,
)


@given(left=join_rows, right=join_rows,
       parts=st.sampled_from([1, 3, 8]),
       how=st.sampled_from(["inner", "left", "right", "full"]))
@settings(**SETTINGS)
def test_salted_join_equals_plain_join(spark, left, right, parts, how):
    """salted_join(a, b, on) ≡ a.join(b, on) as a MULTISET (duplicates from
    many-to-many keys must survive exactly once per pairing, not per salt
    replica), for ALL outer-join modes, including empty sides and
    salt_parts=1. right/full are the regression case: a naive salted outer
    join emits unmatched replicated-side rows salt_parts times."""
    from collections import Counter

    from statline_bq_spark.operators.skew import salted_join

    a = spark.createDataFrame(left, "k long, av long") if left else \
        spark.createDataFrame([], "k long, av long")
    b = spark.createDataFrame(right, "k long, bv long") if right else \
        spark.createDataFrame([], "k long, bv long")
    got = Counter(
        (r.k, r.av, r.bv)
        for r in salted_join(a, b, ["k"], salt_parts=parts, how=how).collect()
    )
    want = Counter((r.k, r.av, r.bv) for r in a.join(b, ["k"], how).collect())
    assert got == want


# --- contamination_counts / decontaminate vs Python n-gram reference --------

texts_st = st.lists(
    st.text(alphabet="ab ", min_size=0, max_size=40),
    min_size=1,
    max_size=12,
)


def _grams(text, n):
    toks = [t for t in text.strip().split() if t] if text.strip() else []
    return {" ".join(toks[i:i + n]) for i in range(len(toks) - n + 1)}


@given(corpus=texts_st, bench=texts_st, n=st.sampled_from([2, 3]))
@settings(**SETTINGS)
def test_contamination_matches_python_ngram_reference(spark, corpus, bench, n):
    """contamination_counts and decontaminate == a set-based Python
    reference on adversarial token streams (empty docs, runs of
    whitespace, docs shorter than n)."""
    from statline_bq_spark.operators import decontaminate as dc

    cdf = spark.createDataFrame(
        list(enumerate(corpus)), "doc_id long, text string"
    )
    bdf = spark.createDataFrame(
        list(enumerate(bench)), "doc_id long, text string"
    )
    bench_grams = set().union(*(_grams(t, n) for t in bench)) if bench else set()

    got_counts = {
        r.doc_id: (r.n_shared, r.n_grams)
        for r in dc.contamination_counts(cdf, bdf, n=n).collect()
    }
    want_counts = {}
    for i, t in enumerate(corpus):
        g = _grams(t, n)
        shared = len(g & bench_grams)
        if shared:
            want_counts[i] = (shared, len(g))
    assert got_counts == want_counts

    got_clean = {
        r.doc_id for r in dc.decontaminate(cdf, bdf, n=n).collect()
    }
    want_clean = {i for i, t in enumerate(corpus) if not (_grams(t, n) & bench_grams)}
    assert got_clean == want_clean


# --- constraints.validate vs Python counting reference ----------------------

check_rows = st.lists(
    st.tuples(
        st.one_of(st.none(), st.integers(-20, 20)),   # v (nullable)
        st.sampled_from(["a", "b", "c", "d"]),        # cat
    ),
    min_size=0,
    max_size=30,
)


@given(rows=check_rows, lo=st.integers(-10, 0), hi=st.integers(0, 10))
@settings(**SETTINGS)
def test_constraint_counts_match_python_reference(spark, rows, lo, hi):
    """One-scan validate() == per-row Python counting for not_null,
    accepted_values, and in_range — including NULL handling (NULL violates
    accepted_values and in_range, by contract) and EMPTY tables (0
    violations and passed=True, never a NULL verdict)."""
    from statline_bq_spark.functions import constraints as cq

    df = spark.createDataFrame(rows, "v long, cat string") if rows else \
        spark.createDataFrame([], "v long, cat string")
    out = {
        r.check_name: (r.n_violations, r.passed)
        for r in cq.validate(
            df,
            [
                cq.not_null("v"),
                cq.accepted_values("cat", ["a", "b"]),
                cq.in_range("v", lo, hi),
            ],
        ).collect()
    }
    exp = {
        "not_null_v": sum(1 for v, _ in rows if v is None),
        "accepted_values_cat": sum(1 for _, c in rows if c not in ("a", "b")),
        "in_range_v": sum(
            1 for v, _ in rows if v is None or v < lo or v > hi
        ),
    }
    assert out == {k: (n, n == 0) for k, n in exp.items()}


# --- PII redaction vs Python re (same common-subset patterns) ----------------

pii_text = st.text(
    alphabet="ab @.+-0123456789\n",
    min_size=0,
    max_size=60,
)


@given(texts=st.lists(pii_text, min_size=1, max_size=20))
@settings(**SETTINGS)
def test_pii_redaction_matches_python_re(spark, texts):
    """Java-regex redaction == Python re on adversarial digit/@/dot soup —
    the patterns are deliberately in the Java ∩ RE2 ∩ Python common subset,
    and this pins that claim for the third engine."""
    import re as pyre

    from statline_bq_spark.functions import pii

    df = spark.createDataFrame(
        list(enumerate(texts)), "id long, text string"
    )
    got = {
        r.id: (r.red, r.ne, r.ni, r.np)
        for r in df.select(
            "id",
            pii.redact_pii("text").alias("red"),
            pii.email_count("text").alias("ne"),
            pii.ipv4_count("text").alias("ni"),
            pii.phone_count("text").alias("np"),
        ).collect()
    }
    for i, t in enumerate(texts):
        r1 = pyre.sub(pii.EMAIL_RE, pii.EMAIL_TOKEN, t)
        r2 = pyre.sub(pii.IPV4_RE, pii.IP_TOKEN, r1)
        r3 = pyre.sub(pii.PHONE_RE, pii.PHONE_TOKEN, r2)
        want = (
            r3,
            len(pyre.findall(pii.EMAIL_RE, t)),
            len(pyre.findall(pii.IPV4_RE, r1)),
            len(pyre.findall(pii.PHONE_RE, r2)),
        )
        assert got[i] == want, (i, t, got[i], want)


# --- text heuristics vs Python references ------------------------------------

lang_text = st.lists(
    st.lists(
        st.sampled_from(
            ["der", "und", "el", "le", "les", "het", "een", "cat", "a", "1",
             " ", "\t"]
        ),
        min_size=0,
        max_size=15,
    ).map("".join),
    min_size=1,
    max_size=25,
)


@given(texts=lang_text)
@settings(**SETTINGS)
def test_lang_id_and_bpe_counts_match_python(spark, texts):
    """lang_id's first-hit-wins CASE chain and the BPE-ish pre-token count
    == Python on marker-word soup (concatenated marker fragments create
    adversarial substring hits — ' der ' inside 'derder' must NOT match,
    only the padded whole word)."""
    import re as pyre

    from statline_bq_spark.functions import text as tx

    df = spark.createDataFrame(
        list(enumerate(texts)), "id long, text string"
    )
    got = {
        r.id: (r.lang, r.n_bpe)
        for r in df.select(
            "id",
            tx.lang_id("text").alias("lang"),
            tx.bpe_ish_token_count("text").alias("n_bpe"),
        ).collect()
    }
    for i, t in enumerate(texts):
        padded = f" {t.lower()} "
        lang = "en"
        for cand, markers in tx.LANG_MARKERS.items():
            if any(m in padded for m in markers):
                lang = cand
                break
        n_bpe = len(pyre.findall(tx.BPE_SPLIT_PATTERN, t))
        assert got[i] == (lang, n_bpe), (i, repr(t), got[i], (lang, n_bpe))


@given(edges=edge_lists)
@settings(**SETTINGS)
def test_star_contraction_matches_union_find(spark, edges):
    """The O(log n) large-star/small-star variant == union-find on random
    graphs (self-loops, duplicate and reversed edges included)."""
    from statline_bq_spark.operators.graph import connected_components_star

    df = spark.createDataFrame(edges, "src long, dst long")
    got = {
        r.node: r.component
        for r in connected_components_star(df).collect()
    }
    assert got == _uf_components(edges)


# --- quantize_embeddings vs Python mirror ------------------------------------

vec_lists = st.lists(
    st.lists(
        st.integers(-1000, 1000).map(lambda x: x / 16.0),  # exact doubles
        min_size=1,
        max_size=8,
    ),
    min_size=1,
    max_size=15,
)


@given(vecs=vec_lists)
@settings(**SETTINGS)
def test_quantize_embeddings_matches_python_mirror(spark, vecs):
    """int8 quantization facets == an exact Python mirror (dyadic inputs,
    same floor(x+0.5) half-up, same scale_micros floor) — including the
    all-zero vector (scale 0, all-zero codes) and single-dim vectors."""
    import math

    from statline_bq_spark.operators.similarity import quantize_embeddings

    vecs = vecs + [[0.0, 0.0]]  # always exercise the all-zero special case
    df = spark.createDataFrame(
        list(enumerate(vecs)), "vec_id long, embedding array<double>"
    )
    got = {
        r.vec_id: (r.n_dims, r.code_sum, r.code_min, r.code_max, r.scale_micros)
        for r in quantize_embeddings(df).collect()
    }
    want = {}
    for i, v in enumerate(vecs):
        m = max(abs(x) for x in v)
        codes = [
            0 if m == 0.0 else math.floor(x * 127.0 / m + 0.5) for x in v
        ]
        want[i] = (
            len(v),
            sum(codes),
            min(codes),
            max(codes),
            math.floor(m / 127.0 * 1e6),
        )
    assert got == want


# --- winnowing vs sliding-min reference over the same hash sequence ----------

winnow_texts = st.lists(
    st.lists(
        st.sampled_from(["a", "b", "c", "d", "e"]),
        min_size=0,
        max_size=25,
    ).map(" ".join),
    min_size=1,
    max_size=10,
)


@given(texts=winnow_texts, k=st.sampled_from([2, 3]),
       window=st.sampled_from([2, 4]))
@settings(**SETTINGS)
def test_winnowing_matches_sliding_min_reference(spark, texts, k, window):
    """winnowing_fingerprints == {min of each full window} computed in
    Python over the SAME per-doc k-gram hash sequence (extracted via the
    identical Spark expressions) — pins the partial-window exclusion and
    the per-doc windowing, independent of the hash function itself."""
    from pyspark.sql import Window as W

    from statline_bq_spark.operators.dedup import winnowing_fingerprints

    df = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    got = {}
    for r in winnowing_fingerprints(df, k=k, window=window).collect():
        got.setdefault(r.doc_id, set()).add(r.fingerprint)

    # reference hash sequences via the same expressions, ordered
    toks = df.select(
        "doc_id",
        F.posexplode(F.split(F.trim("text"), "\\s+")).alias("_pos", "_tok"),
    )
    w = W.partitionBy("doc_id").orderBy("_pos")
    leads = [F.lead("_tok", j).over(w) for j in range(1, k)]
    grams = (
        toks.select(
            "doc_id",
            "_pos",
            F.xxhash64("_tok", *leads).alias("_h"),
            leads[-1].alias("_last"),
        )
        .filter(F.col("_last").isNotNull())
        .orderBy("doc_id", "_pos")
        .collect()
    )
    seqs: dict[int, list[int]] = {}
    for r in grams:
        seqs.setdefault(r.doc_id, []).append(r._h)
    want: dict[int, set[int]] = {}
    for d, hs in seqs.items():
        if len(hs) >= window:
            want[d] = {
                min(hs[i : i + window])
                for i in range(len(hs) - window + 1)
            }
    assert got == want


# --- JVM vector folds vs bit-exact Python mirror ------------------------------

paired_vecs = st.lists(
    st.tuples(
        st.lists(st.integers(-500, 500).map(lambda x: x / 16.0),
                 min_size=1, max_size=10),
        st.lists(st.integers(-500, 500).map(lambda x: x / 16.0),
                 min_size=1, max_size=10),
    ).map(lambda ab: (ab[0], ab[1][: len(ab[0])] + [0.0] * max(0, len(ab[0]) - len(ab[1])))),
    min_size=1,
    max_size=20,
)


@given(pairs=paired_vecs)
@settings(**SETTINGS)
def test_vector_folds_are_bit_exact_vs_python(spark, pairs):
    """dot / l2_norm / cosine_similarity claim DETERMINISTIC sequential
    folds: every IEEE op (mul, add-in-order, sqrt — correctly rounded by
    the standard, unlike ln/exp) must reproduce bit-exactly in Python.
    Exact equality, no tolerance."""
    import math

    from statline_bq_spark.functions import vectors as vx

    df = spark.createDataFrame(
        [(i, a, b) for i, (a, b) in enumerate(pairs)],
        "id long, a array<double>, b array<double>",
    )
    got = {
        r.id: (r.d, r.n, r.c)
        for r in df.select(
            "id",
            vx.dot("a", "b").alias("d"),
            vx.l2_norm("a").alias("n"),
            vx.cosine_similarity("a", "b").alias("c"),
        ).collect()
    }
    for i, (a, b) in enumerate(pairs):
        d = 0.0
        for x, y in zip(a, b):
            d += x * y
        na_sq = 0.0
        for x in a:
            na_sq += x * x
        nb_sq = 0.0
        for y in b:
            nb_sq += y * y
        na, nb = math.sqrt(na_sq), math.sqrt(nb_sq)
        c = d / (na * nb) if na * nb != 0.0 else None
        gd, gn, gc = got[i]
        assert gd == d and gn == na, (i, a, b)
        if c is None or math.isnan(c):
            assert gc is None or math.isnan(gc)
        else:
            assert gc == c, (i, a, b)


@given(left=events, right=events, strict=st.booleans(),
       direction=st.sampled_from(["backward", "forward"]),
       tol_minutes=st.sampled_from([0, 5, 17]))
@settings(**SETTINGS)
def test_asof_join_tolerance_matches_pandas_semantics(
    spark, left, right, strict, direction, tol_minutes
):
    """tolerance nulls the NEAREST match when it is too far (pandas
    merge_asof semantics: a nearer-but-excluded row is NOT replaced by a
    farther in-tolerance one) — checked against the brute-force reference
    with the bound applied post-selection."""
    from datetime import datetime, timedelta

    base = datetime(2024, 1, 1)
    left = [(k, t, i) for i, (k, t, _) in enumerate(left)]
    seen, rdedup = set(), []
    for (k, t, v) in right:
        if (k, t) not in seen:
            seen.add((k, t))
            rdedup.append((k, t, v))
    ldf = spark.createDataFrame(
        [(k, base + timedelta(minutes=t), i) for k, t, i in left],
        "key int, t timestamp, lid int",
    )
    rdf = spark.createDataFrame(
        [(k, base + timedelta(minutes=t), v) for k, t, v in rdedup],
        "key int, rt timestamp, rv int",
    )
    got = {
        r.lid: r.rv
        for r in asof_join(
            ldf, rdf, ["key"], "t", "rt", right_values=["rv"],
            strict=strict, direction=direction,
            tolerance=f"{tol_minutes} minutes",
        ).collect()
    }
    # reference: nearest match first (ties resolved as in _ref_asof), then
    # the tolerance bound nulls matches farther than tol_minutes
    want = {}
    for (lk, lt, lid) in left:
        best = None
        for (rk, rt, rv) in rdedup:
            if rk != lk:
                continue
            if direction == "backward":
                ok = (rt < lt) if strict else (rt <= lt)
                better = best is None or rt > best[0]
            else:
                ok = (rt > lt) if strict else (rt >= lt)
                better = best is None or rt < best[0]
            if ok and better:
                best = (rt, rv)
        if best is None or abs(best[0] - lt) > tol_minutes:
            want[lid] = None
        else:
            want[lid] = best[1]
    assert got == want


# --- band_join vs brute-force containment ------------------------------------

band_rows = st.lists(
    st.tuples(st.integers(0, 100), st.integers(-50, 150)),  # (fid, v)
    min_size=1, max_size=25, unique_by=lambda r: r[0],
)
bands_st = st.lists(
    st.tuples(st.integers(0, 20), st.integers(-50, 150), st.integers(-50, 150)),
    min_size=1, max_size=8, unique_by=lambda r: r[0],
)


@given(facts=band_rows, bands=bands_st, closed_lo=st.booleans())
@settings(**SETTINGS)
def test_band_join_matches_containment_reference(spark, facts, bands, closed_lo):
    """band_join == brute-force [lo, hi) containment (left join: facts
    with no containing band survive with a NULL band id; overlapping bands
    emit one row per containing band)."""
    fdf = spark.createDataFrame(facts, "fid long, v long")
    bdf = spark.createDataFrame(bands, "bid long, lo long, hi long")
    from statline_bq_spark.operators.relational import band_join

    got = sorted(
        (r.fid, r.bid)
        for r in band_join(fdf, bdf, "v", "lo", "hi", closed_lo=closed_lo)
        .select("fid", "bid")
        .collect()
    )
    want = []
    for fid, v in facts:
        hits = [
            bid
            for bid, lo, hi in bands
            if (lo <= v if closed_lo else lo < v) and v < hi
        ]
        if hits:
            want.extend((fid, b) for b in hits)
        else:
            want.append((fid, None))
    assert got == sorted(want, key=lambda x: (x[0], x[1] is None, x[1] or 0))


# --- fuzzy_pairs vs brute-force q-gram + Levenshtein reference --------------

fuzzy_names = st.lists(
    st.text(alphabet="ab", min_size=0, max_size=6),
    min_size=1,
    max_size=12,
)


def _lev(a: str, b: str) -> int:
    """Textbook O(L²) Levenshtein — the independent reference."""
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(
                min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
            )
        prev = cur
    return prev[-1]


@given(names=fuzzy_names, q=st.sampled_from([2, 3]),
       max_dist=st.integers(1, 2), df_cap=st.sampled_from([2, 64]))
@settings(**SETTINGS)
def test_fuzzy_pairs_matches_bruteforce(spark, names, q, max_dist, df_cap):
    """fuzzy_pairs == brute force over its documented contract: pairs
    (a < b) within Levenshtein max_dist that share at least one q-gram
    whose document frequency is <= df_cap. The tiny 'ab' alphabet forces
    heavy grams (exercising the cap), duplicate names (dist 0), and
    strings shorter than q (no grams, never paired)."""
    from statline_bq_spark.operators.dedup import fuzzy_pairs

    rows = list(enumerate(names))
    df = spark.createDataFrame(rows, "id long, name string")
    got = sorted(
        (r.a, r.b, r.dist)
        for r in fuzzy_pairs(
            df, max_dist=max_dist, q=q, df_cap=df_cap
        ).collect()
    )

    grams = {
        i: {s[k : k + q] for k in range(len(s) - q + 1)}
        for i, s in rows
    }
    dfreq: dict[str, int] = {}
    for gs in grams.values():
        for g in gs:
            dfreq[g] = dfreq.get(g, 0) + 1
    info = {g for g, n in dfreq.items() if n <= df_cap}
    want = sorted(
        (i, j, _lev(si, sj))
        for (i, si) in rows
        for (j, sj) in rows
        if i < j
        and (grams[i] & grams[j]) & info
        and _lev(si, sj) <= max_dist
    )
    assert got == want


# --- hash_split vs exact md5 mirror ------------------------------------------


@given(
    keys=st.lists(
        st.one_of(st.none(), st.integers(-(10**6), 10**6)),
        min_size=1, max_size=20, unique=True,
    ),
    salt=st.sampled_from(["", "s1"]),
    train=st.integers(1, 255),
)
@settings(**SETTINGS)
def test_hash_split_matches_python_md5_mirror(spark, keys, salt, train):
    """hash_split's assignment is an exact, engine-independent function of
    the key: bucket = conv(md5(salt||key)[:2], 16, 10) % 256 compared
    against the 1/256-quantized cumulative fractions — mirrored here with
    hashlib. Pins the on-disk split stability the docstring promises (a
    re-run or a different engine must route every row identically); NULL
    keys get a NULL split."""
    import hashlib

    from statline_bq_spark.operators.sampling import hash_split

    frac = train / 256.0
    splits = {"train": frac, "test": 1.0 - frac}
    df = spark.createDataFrame([(k,) for k in keys], "doc_id long")
    got = {
        r.doc_id: r.split
        for r in hash_split(df, "doc_id", splits, salt=salt).collect()
    }
    hi = int(round(frac * 256))
    for k in keys:
        if k is None:
            assert got[k] is None
            continue
        b = int(
            hashlib.md5(f"{salt}{k}".encode()).hexdigest()[:2], 16
        ) % 256
        assert got[k] == ("train" if b < hi else "test"), (k, b, hi)


# --- exact_dedup vs Python multiset reference --------------------------------


@given(
    texts=st.lists(
        st.one_of(st.none(), st.text(alphabet="xy ", max_size=4)),
        min_size=1, max_size=20,
    )
)
@settings(**SETTINGS)
def test_exact_dedup_matches_python_grouping(spark, texts):
    """exact_dedup == Python grouping by text: one row per distinct
    non-NULL text (survivor = min id, n_copies = multiplicity), and every
    NULL-text row survives alone (failed fetches are not 'duplicates' of
    each other). Conservation: sum(n_copies) == input rows."""
    from statline_bq_spark.operators.dedup import exact_dedup

    rows = list(enumerate(texts))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = sorted(
        (r.doc_id, r.n_copies) for r in exact_dedup(df).collect()
    )

    groups: dict[str, list[int]] = {}
    want = []
    for i, t in rows:
        if t is None:
            want.append((i, 1))
        else:
            groups.setdefault(t, []).append(i)
    want.extend((min(ids), len(ids)) for ids in groups.values())
    assert got == sorted(want)
    assert sum(n for _, n in got) == len(rows)


# --- pack_sequences vs single-pass Python prefix sum -------------------------

pack_rows = st.lists(
    st.tuples(
        st.one_of(st.none(), st.sampled_from(["en", "fr"])),  # stream
        st.integers(0, 40),                                   # order key
        st.integers(0, 9),                                    # n_tokens
    ),
    min_size=1,
    max_size=25,
    unique_by=lambda r: (r[0], r[1]),  # order key unique per stream
)


@given(rows=pack_rows, capacity=st.sampled_from([1, 5, 16]),
       block_size=st.sampled_from([2, 3, 4096]))
@settings(**SETTINGS)
def test_pack_sequences_matches_single_pass_prefix_sum(
    spark, rows, capacity, block_size
):
    """The two-level block scan (bounded window partitions) must equal the
    naive single-window prefix sum — mirrored here in Python — for every
    block_size, including block_size smaller than the stream (multi-block
    recombination), zero-token docs (advance the stream by 0 but span 1
    sequence), and a NULL stream key (a stream like any other)."""
    from statline_bq_spark.operators.packing import pack_sequences

    data = [(i, s, o, t) for i, (s, o, t) in enumerate(rows)]
    df = spark.createDataFrame(
        data, "doc_id long, lang string, pos long, n_tokens long"
    )
    got = {
        r.doc_id: (r.start_offset, r.seq_id, r.n_seqs_spanned)
        for r in pack_sequences(
            df, "lang", "pos", "n_tokens", capacity, block_size=block_size
        ).collect()
    }

    want = {}
    streams: dict[object, list[tuple[int, int, int]]] = {}
    for i, s, o, t in data:
        streams.setdefault(s, []).append((o, i, t))
    for docs in streams.values():
        running = 0
        for _, i, t in sorted(docs):
            start = running
            end_incl = start + max(t, 1) - 1
            want[i] = (
                start, start // capacity,
                end_incl // capacity - start // capacity + 1,
            )
            running += t
    assert got == want


# --- token_budget_fill vs Python greedy cumsum --------------------------------

fill_rows = st.lists(
    st.tuples(
        st.integers(0, 2),    # group
        st.integers(0, 30),   # priority (asc = best first)
        st.integers(0, 20),   # n_tokens
    ),
    min_size=1,
    max_size=25,
)


@given(rows=fill_rows, budget=st.sampled_from([0, 7, 25, 100]))
@settings(**SETTINGS)
def test_token_budget_fill_matches_python_greedy(spark, rows, budget):
    """token_budget_fill == per-group greedy: order by (priority, id),
    keep rows while the running token total stays <= budget. A row that
    overflows the budget also blocks everything after it (running sum is
    monotone for non-negative tokens) — including zero-token rows that
    would individually fit."""
    from statline_bq_spark.operators.sampling import token_budget_fill

    data = [(i, g, p, t) for i, (g, p, t) in enumerate(rows)]
    df = spark.createDataFrame(
        data, "id long, grp long, prio long, n_tokens long"
    )
    got = sorted(
        (r.id, r.cum_tokens)
        for r in token_budget_fill(
            df, "grp", F.col("n_tokens"), budget,
            order_by=[F.col("prio"), F.col("id")],
        ).collect()
    )

    want = []
    groups: dict[int, list[tuple[int, int, int]]] = {}
    for i, g, p, t in data:
        groups.setdefault(g, []).append((p, i, t))
    for docs in groups.values():
        cum = 0
        for _, i, t in sorted(docs):
            cum += t
            if cum > budget:
                break
            want.append((i, cum))
    assert got == sorted(want)


# --- reservoir_per_key vs hashlib mirror --------------------------------------


@given(
    rows=st.lists(
        st.tuples(st.integers(0, 2), st.integers(0, 10**6)),
        min_size=1, max_size=30, unique_by=lambda r: r[1],
    ),
    k=st.integers(1, 4),
    salt=st.sampled_from(["", "s"]),
)
@settings(**SETTINGS)
def test_reservoir_per_key_matches_md5_rank_mirror(spark, rows, k, salt):
    """reservoir_per_key selects exactly the k rows per key whose
    md5(id||salt) ranks smallest — mirrored with hashlib. Pins the
    stability contract (WHICH rows are sampled is a pure function of id
    and salt, so re-runs and appends keep prior members), not just the
    per-key count."""
    import hashlib

    from statline_bq_spark.operators.sampling import reservoir_per_key

    df = spark.createDataFrame(rows, "key long, id long")
    got = sorted((r.key, r.id) for r in reservoir_per_key(df, "key", "id", k, salt=salt).collect())

    bykey: dict[int, list[tuple[str, int]]] = {}
    for key, i in rows:
        h = hashlib.md5(f"{i}{salt}".encode()).hexdigest()
        bykey.setdefault(key, []).append((h, i))
    want = sorted(
        (key, i)
        for key, hs in bykey.items()
        for _, i in sorted(hs)[:k]
    )
    assert got == want


# --- exact_ntile_from_rank vs Python ntile ------------------------------------


@given(n=st.integers(1, 60), buckets=st.integers(1, 12))
@settings(**SETTINGS)
def test_exact_ntile_from_rank_matches_python_ntile(spark, n, buckets):
    """exact_ntile_from_rank(rank, n, b) == the SQL-standard ntile: the
    first n mod b buckets get n div b + 1 rows, the rest n div b — checked
    for every rank 1..n against a Python mirror (covers n < b, b = 1, and
    exact-boundary ranks)."""
    from statline_bq_spark.operators.analytic import exact_ntile_from_rank

    df = spark.range(1, n + 1).select(F.col("id").alias("rank"))
    got = {
        r.rank: r.nt
        for r in df.select(
            "rank",
            exact_ntile_from_rank(
                F.col("rank"), F.lit(n), buckets
            ).alias("nt"),
        ).collect()
    }

    big, r = divmod(n, buckets)
    want = {}
    rank = 1
    for b in range(1, buckets + 1):
        size = big + 1 if b <= r else big
        for _ in range(size):
            if rank > n:
                break
            want[rank] = b
            rank += 1
    assert got == want


# --- mixture_sample vs md5-threshold mirror (exact-rate regimes) --------------

mix_rows = st.lists(
    st.tuples(
        st.one_of(st.none(), st.sampled_from(["web", "code", "books"])),
        st.integers(0, 10**6),
    ),
    min_size=1, max_size=30, unique_by=lambda r: r[1],
)


@given(rows=mix_rows, alpha=st.sampled_from([0.0, 1.0]))
@settings(**SETTINGS)
def test_mixture_sample_matches_md5_threshold_mirror(spark, rows, alpha):
    """mixture_sample's keep decision is a pure function of (key, source
    counts): uniform = conv(md5('mix'||key)[:4]) / 65536 < (n_min/n_s)^(1-a).
    Mirrored exactly for alpha in {0, 1} where the pow is a single exact
    IEEE op (x^1 = x, x^0 = 1): alpha=1 keeps everything, alpha=0 samples
    each source at n_min/n_s. NULL source is a group like any other (the
    null-safe rate join-back must not drop it)."""
    import hashlib

    from statline_bq_spark.operators.packing import mixture_sample

    df = spark.createDataFrame(rows, "source string, doc_id long")
    got = {
        r.doc_id: r.keep
        for r in mixture_sample(df, "source", "doc_id", alpha=alpha).collect()
    }

    counts: dict[object, int] = {}
    for s, _ in rows:
        counts[s] = counts.get(s, 0) + 1
    n_min = min(counts.values())
    want = {}
    for s, i in rows:
        rate = 1.0 if alpha == 1.0 else n_min / counts[s]
        u = int(hashlib.md5(f"mix{i}".encode()).hexdigest()[:4], 16) / 65536.0
        want[i] = u < rate
    assert got == want


# --- shingle_index duplicate-id window guard (round 8) -----------------------

doc_corpora = st.lists(
    st.tuples(
        st.integers(0, 3),  # doc_id (small domain → guaranteed duplicates)
        st.lists(
            st.sampled_from(["aa", "bb", "cc", "dd", "ee"]),
            min_size=0,
            max_size=8,
        ),
    ),
    min_size=1,
    max_size=12,
)


@given(doc_corpora)
@settings(**SETTINGS)
def test_shingle_index_duplicate_ids_union_per_row(spark, corpus):
    """Round-8 pin for the exchange-free shingle window: with the window
    partitioned by doc_id and ordered by (row surrogate, position), a
    duplicated doc_id's gram set must be exactly the UNION of its rows'
    gram sets — no cross-row grams fabricated at row boundaries, none
    lost. The reference is shingle_index itself over the same rows with
    unique surrogate ids (one window per physical row by construction),
    unioned per original id in Python."""
    from statline_bq_spark.operators.dedup import shingle_index

    rows = [
        (i, doc_id, " ".join(toks))
        for i, (doc_id, toks) in enumerate(corpus)
    ]
    df = spark.createDataFrame(rows, "row_id bigint, doc_id bigint, text string")

    got = {}
    for r in shingle_index(
        df.select("doc_id", "text"), id_col="doc_id", text_col="text"
    ).collect():
        got.setdefault(r._id, set()).add(r._g)

    per_row = {}
    for r in shingle_index(
        df.select("row_id", "text"), id_col="row_id", text_col="text"
    ).collect():
        per_row.setdefault(r._id, set()).add(r._g)
    want = {}
    for i, (doc_id, _toks) in enumerate(corpus):
        if i in per_row:
            want.setdefault(doc_id, set()).update(per_row[i])

    assert got == want
