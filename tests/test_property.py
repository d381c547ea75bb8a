"""Property-based tests (Hypothesis) for the apply family — the
edge-case sweep the reference's example-based tests never run
(VERDICT r1 hardening item): empty partitions, all-null columns,
unicode payloads, arbitrary numeric values.

Ground truth is pandas itself: whatever ``Series.apply`` /
``DataFrame.apply`` produces on the same data is what the engine
must produce through the Arrow route.

Example counts are kept small: each example is a real Spark job
(~0.3 s), and the properties are about STRUCTURE (nulls, emptiness,
encoding), not about sampling a huge value space.
"""

import math

import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from sparkswift.operators.apply import apply_rows, apply_series

SETTINGS = dict(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

floats = st.one_of(
    st.none(),
    st.floats(
        min_value=-1e6, max_value=1e6, allow_nan=False, allow_infinity=False
    ),
)
texts = st.one_of(st.none(), st.text(max_size=40))


def _mkdf(spark, values, dtype):
    pdf = pd.DataFrame({"i": range(len(values)), "x": pd.array(values, dtype=dtype)})
    # force multiple (mostly empty) partitions so empty-partition
    # handling is exercised on every example
    return spark.createDataFrame(pdf).repartition(8), pdf


@given(values=st.lists(floats, min_size=1, max_size=30))
@settings(**SETTINGS)
def test_apply_series_udf_matches_pandas_on_floats(spark, values):
    df, pdf = _mkdf(spark, values, "float64")
    out = (
        apply_series(df, "x", lambda v: v * 2 + 1, output_col="y", force_udf=True)
        .toPandas()
        .sort_values("i")["y"]
        .reset_index(drop=True)
    )
    expected = pdf["x"].apply(lambda v: v * 2 + 1)
    for got, exp in zip(out, expected):
        if exp is None or (isinstance(exp, float) and math.isnan(exp)):
            assert got is None or math.isnan(got)
        else:
            assert got == pytest.approx(exp, rel=1e-12)


@given(values=st.lists(texts, min_size=1, max_size=30))
@settings(**SETTINGS)
def test_apply_series_udf_matches_pandas_on_unicode(spark, values):
    df, pdf = _mkdf(spark, values, "object")
    out = (
        apply_series(
            df,
            "x",
            lambda v: None if v is None else v.upper(),
            output_col="y",
            force_udf=True,
            returns="string",
        )
        .toPandas()
        .sort_values("i")["y"]
        .reset_index(drop=True)
    )
    expected = pdf["x"].apply(lambda v: None if v is None else v.upper())
    assert list(out) == list(expected)


@given(values=st.lists(floats, min_size=1, max_size=20))
@settings(**SETTINGS)
def test_apply_rows_matches_pandas(spark, values):
    df, pdf = _mkdf(spark, values, "float64")
    out = (
        apply_rows(
            df,
            lambda row: 0.0 if pd.isna(row["x"]) else abs(row["x"]),
            output_col="y",
        )
        .toPandas()
        .sort_values("i")["y"]
        .reset_index(drop=True)
    )
    expected = pdf.apply(
        lambda row: 0.0 if pd.isna(row["x"]) else abs(row["x"]), axis=1
    )
    for got, exp in zip(out, expected):
        assert got == pytest.approx(exp, rel=1e-12)


def test_apply_series_all_null_column(spark):
    pdf = pd.DataFrame({"i": [0, 1, 2], "x": pd.array([None] * 3, dtype="float64")})
    df = spark.createDataFrame(pdf).repartition(4)
    out = apply_series(
        df, "x", lambda v: v * 2, output_col="y", force_udf=True, returns="double"
    ).toPandas()
    assert out["y"].isna().all()


def test_apply_rows_empty_input(spark):
    df = spark.createDataFrame([], "i long, x double")
    out = apply_rows(
        df, lambda row: row["x"], output_col="y", schema="y double"
    )
    assert out.count() == 0


# --- round-4 operators: C4 line filter + deterministic shuffle -------------

words = st.text(
    alphabet=st.characters(whitelist_categories=("Ll", "Lu", "Nd")),
    min_size=1,
    max_size=8,
)
lines_strategy = st.lists(
    st.lists(words, min_size=0, max_size=8).map(" ".join),
    min_size=1,
    max_size=6,
)


def _c4_reference(doc_lines, min_words, bad_words):
    kept = []
    for ln in doc_lines:
        ws = [w for w in ln.split(" ") if w != ""]
        if len(ws) < min_words:
            continue
        if any(b in ws for b in bad_words):
            continue
        kept.append(ln)
    return kept


@given(docs=st.lists(lines_strategy, min_size=1, max_size=5))
@settings(**SETTINGS)
def test_c4_line_filter_matches_pure_python(spark, docs):
    """For arbitrary unicode line sets, the operator's surviving lines
    equal a pure-Python application of the same rules, and docs whose
    lines all die are dropped."""
    from sparkswift.operators.text import c4_line_filter

    pdf = pd.DataFrame(
        {"doc_id": range(len(docs)), "text": ["\n".join(d) for d in docs]}
    )
    df = spark.createDataFrame(pdf).repartition(4)
    out = (
        c4_line_filter(df, min_words=3, bad_words=("bad",), min_lines_kept=1)
        .toPandas()
        .set_index("doc_id")
    )
    for i, d in enumerate(docs):
        want = _c4_reference(d, 3, ("bad",))
        if want:
            assert out.loc[i, "clean_text"] == "\n".join(want)
            assert out.loc[i, "n_lines_kept"] == len(want)
        else:
            assert i not in out.index


@given(
    ids=st.lists(
        st.integers(min_value=-(2**40), max_value=2**40), min_size=1, max_size=40, unique=True
    ),
    seed=st.integers(min_value=0, max_value=5),
)
@settings(**SETTINGS)
def test_deterministic_shuffle_permutation_property(spark, ids, seed):
    """For arbitrary unique ids and seeds: positions are exactly
    0..n-1, and the assignment is invariant to input partitioning."""
    from sparkswift.operators import sampling as sp

    pdf = pd.DataFrame({"doc_id": ids})
    a = (
        sp.deterministic_shuffle(spark.createDataFrame(pdf), "doc_id", seed=seed)
        .toPandas()
    )
    assert sorted(a.shuffle_pos) == list(range(len(ids)))
    b = (
        sp.deterministic_shuffle(
            spark.createDataFrame(pdf).repartition(7), "doc_id", seed=seed
        ).toPandas()
    )
    m = a.merge(b, on="doc_id", suffixes=("_a", "_b"))
    assert (m.shuffle_pos_a == m.shuffle_pos_b).all()


asof_rows = st.lists(
    st.tuples(
        st.sampled_from("ab"),
        st.integers(min_value=0, max_value=500),
        st.floats(min_value=-100, max_value=100, allow_nan=False, allow_infinity=False),
    ),
    min_size=1,
    max_size=12,
)


@given(
    left=asof_rows,
    right=asof_rows,
    direction=st.sampled_from(["backward", "forward", "nearest"]),
    tol=st.sampled_from([None, "30 minutes", "2 hours"]),
    allow=st.booleans(),
)
@settings(**SETTINGS)
def test_asof_join_fuzz_matches_merge_asof(spark, left, right, direction, tol, allow):
    """Differential fuzz vs pandas merge_asof across every direction ×
    tolerance × allow_exact_matches combination — the configuration
    space where the r4 one-sided-nearest null bug lived."""
    from sparkswift.operators.joins import asof_join

    base = pd.Timestamp("2024-01-01")
    lp = pd.DataFrame(
        {
            "k": [k for k, _, _ in left],
            "ts": [base + pd.Timedelta(minutes=m) for _, m, _ in left],
        }
    ).sort_values("ts", kind="stable").reset_index(drop=True)
    lp["event_id"] = range(len(lp))
    rp = (
        pd.DataFrame(
            {
                "k": [k for k, _, _ in right],
                "ts": [base + pd.Timedelta(minutes=m) for _, m, _ in right],
                "v": [v for _, _, v in right],
            }
        )
        .drop_duplicates(["k", "ts"])  # asof requires unique (key, ts)
        .sort_values("ts", kind="stable")
        .reset_index(drop=True)
    )
    kw = {"tolerance": pd.Timedelta(tol)} if tol else {}
    want = pd.merge_asof(
        lp, rp, on="ts", by="k", direction=direction,
        allow_exact_matches=allow, **kw,
    ).set_index("event_id")["v"]
    got = (
        asof_join(
            spark.createDataFrame(lp),
            spark.createDataFrame(rp) if len(rp) else spark.createDataFrame([], "k string, ts timestamp, v double"),
            key="k", left_ts="ts", right_ts="ts", right_cols=["v"],
            tolerance=tol, direction=direction, allow_exact_matches=allow,
        )
        .toPandas().set_index("event_id")["v"]
    )
    for eid in want.index:
        w, g = want.loc[eid], got.loc[eid]
        assert (pd.isna(w) and pd.isna(g)) or w == g, (eid, w, g, direction, tol, allow)


roll_vals = st.lists(
    st.one_of(
        st.none(),
        st.floats(min_value=-1e3, max_value=1e3, allow_nan=False, allow_infinity=False),
    ),
    min_size=2,
    max_size=25,
)


@given(
    values=roll_vals,
    window=st.integers(min_value=1, max_value=6),
    closed=st.sampled_from(["right", "left", "both", "neither"]),
    agg=st.sampled_from(["sum", "mean", "min", "max"]),
)
@settings(**SETTINGS)
def test_rolling_agg_fuzz_matches_pandas(spark, values, window, closed, agg):
    """Count-window rolling with every closed= variant vs pandas on
    random (null-bearing) data — the boundary algebra lives in
    _CLOSED_ROWS and must hold off the fixture too."""
    from sparkswift.operators.rolling import rolling_agg

    pdf = pd.DataFrame({"i": range(len(values)), "x": values})
    pdf["x"] = pdf["x"].astype("float64")
    df = spark.createDataFrame(pdf)
    import warnings as _w

    with _w.catch_warnings():
        _w.simplefilter("ignore")
        got = (
            rolling_agg(df, "i", window, agg, "x", output_col="r", closed=closed)
            .toPandas().sort_values("i")["r"].reset_index(drop=True)
        )
    want = getattr(
        pdf.sort_values("i")["x"].rolling(window, closed=closed), agg
    )().reset_index(drop=True)
    assert len(got) == len(want)
    for g, w in zip(got, want):
        assert (pd.isna(g) and pd.isna(w)) or math.isclose(
            g, w, rel_tol=1e-9, abs_tol=1e-9
        ), (g, w, window, closed, agg)


@given(
    minutes=st.lists(st.integers(min_value=0, max_value=600), min_size=1, max_size=20),
    closed=st.sampled_from(["left", "right"]),
    label=st.sampled_from(["left", "right"]),
)
@settings(**SETTINGS)
def test_resample_fuzz_matches_pandas(spark, minutes, closed, label):
    """resample('1 hour').sum() under closed x label vs pandas on
    random event times (duplicates and gaps included)."""
    from sparkswift.operators.resample import resample_agg

    base = pd.Timestamp("2024-03-01")
    pdf = pd.DataFrame(
        {
            "ts": [base + pd.Timedelta(minutes=m) for m in minutes],
            "v": [float(i) for i in range(len(minutes))],
        }
    )
    got = (
        resample_agg(
            spark.createDataFrame(pdf), "ts", "1 hour",
            {"s": ("v", "sum")}, closed=closed, label=label,
        )
        .toPandas().set_index("bucket_ts")["s"].sort_index()
    )
    want = (
        pdf.set_index("ts")["v"].resample("1h", closed=closed, label=label).sum()
    )
    # pandas emits empty buckets inside the span (sum=0.0); the engine
    # emits only occupied buckets — compare values on the engine's
    # buckets, then require the occupied-bucket SETS to match exactly
    for ts, v in got.items():
        assert math.isclose(want.loc[ts], v, rel_tol=1e-9), (ts, v, closed, label)
    nonempty = pdf.set_index("ts")["v"].resample("1h", closed=closed, label=label).count()
    assert set(got.index) == set(nonempty[nonempty > 0].index)


@settings(deadline=None, max_examples=12, suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    n_words=st.integers(min_value=1, max_value=300),
    size=st.integers(min_value=2, max_value=64),
    data=st.data(),
)
def test_chunk_overlap_properties(spark, n_words, size, data):
    """For ANY (doc length, size, stride): every token is covered in
    order, consecutive chunks overlap by exactly size-stride, and the
    chunk count matches the closed formula."""
    import math as _math

    from sparkswift.operators.packing import chunk_overlap

    stride = data.draw(st.integers(min_value=1, max_value=size))
    text = " ".join(f"w{i}" for i in range(n_words))
    df = spark.createDataFrame(pd.DataFrame({"doc_id": [0], "text": [text]}))
    out = chunk_overlap(df, size=size, stride=stride).orderBy("chunk_id").toPandas()
    expect_chunks = (
        1 if n_words <= size else _math.ceil((n_words - size) / stride) + 1
    )
    assert len(out) == expect_chunks
    covered = []
    for _, r in out.iterrows():
        ws = r["chunk_text"].split()
        start = int(r["chunk_id"]) * stride
        assert ws == [f"w{i}" for i in range(start, min(start + size, n_words))]
        assert r["n_chunk_tokens"] == len(ws)
        covered.extend(ws)
    assert set(covered) == {f"w{i}" for i in range(n_words)}


# --- driver union-find vs BFS reference (pure function, no Spark) ----------


@given(
    edges=st.lists(
        st.tuples(st.integers(0, 40), st.integers(0, 40)), max_size=120
    )
)
@settings(max_examples=200, deadline=None)
def test_minid_components_matches_bfs(edges):
    from sparkswift.operators.dedup import minid_components

    got = minid_components(edges)
    # BFS reference: min id reachable from each node
    adj = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    want = {}
    seen = set()
    for start in adj:
        if start in seen:
            continue
        comp, stack = [], [start]
        seen.add(start)
        while stack:
            x = stack.pop()
            comp.append(x)
            for y in adj[x]:
                if y not in seen:
                    seen.add(y)
                    stack.append(y)
        m = min(comp)
        for x in comp:
            want[x] = m
    assert got == want


# --- real codecs vs numpy reference on RANDOM content ----------------------


@given(
    w=st.integers(1, 9),
    h=st.integers(1, 7),
    data=st.data(),
    comment=st.booleans(),
)
@settings(max_examples=150, deadline=None)
def test_ppm_decode_random_pixels(w, h, data, comment):
    import numpy as np

    from sparkswift.operators.multimodal import _parse_ppm

    px = np.array(
        data.draw(
            st.lists(
                st.integers(0, 255), min_size=w * h * 3, max_size=w * h * 3
            )
        ),
        dtype=np.uint8,
    ).reshape(h, w, 3)
    header = b"P6\n" + (b"# a comment\n" if comment else b"")
    payload = header + b"%d %d\n255\n" % (w, h) + px.tobytes()
    out = _parse_ppm(payload)
    assert (out == px).all()


@given(w=st.integers(1, 9), h=st.integers(1, 6), data=st.data())
@settings(max_examples=150, deadline=None)
def test_bmp_decode_random_pixels(w, h, data):
    import struct

    import numpy as np

    from sparkswift.operators.multimodal import _parse_bmp

    px = np.array(
        data.draw(
            st.lists(
                st.integers(0, 255), min_size=w * h * 3, max_size=w * h * 3
            )
        ),
        dtype=np.uint8,
    ).reshape(h, w, 3)
    row = (w * 3 + 3) & ~3
    body = b""
    for y in range(h - 1, -1, -1):  # bottom-up rows, BGR, padded
        line = px[y][:, ::-1].tobytes()
        body += line + b"\x00" * (row - len(line))
    off = 14 + 40
    hdr = b"BM" + struct.pack("<IHHI", off + len(body), 0, 0, off)
    info = struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(body), 2835, 2835, 0, 0
    )
    out = _parse_bmp(hdr + info + body)
    assert (out == px).all()


@given(
    samples=st.lists(st.integers(-32768, 32767), min_size=1, max_size=400),
    rate=st.sampled_from([8000, 16000, 44100]),
)
@settings(max_examples=150, deadline=None)
def test_wav_decode_random_samples(samples, rate):
    import io
    import struct
    import wave

    import numpy as np

    from sparkswift.operators.multimodal import _decode_wav

    buf = io.BytesIO()
    with wave.open(buf, "wb") as wv:
        wv.setnchannels(1)
        wv.setsampwidth(2)
        wv.setframerate(rate)
        wv.writeframes(struct.pack(f"<{len(samples)}h", *samples))
    duration, got = _decode_wav(buf.getvalue())
    want = np.array(samples, dtype=np.float64) / 32768.0
    assert duration == len(samples) / rate
    assert (got == want).all()


# --- BPE round-trip law on random words × random merges --------------------


@given(
    words=st.lists(
        st.text(
            alphabet=st.characters(min_codepoint=97, max_codepoint=122),
            min_size=1,
            max_size=10,
        ),
        min_size=1,
        max_size=8,
    ),
    data=st.data(),
)
@settings(max_examples=200, deadline=None)
def test_bpe_symbols_always_roundtrip(words, data):
    """Greedy merging only ever CONCATENATES adjacent symbols, so the
    token symbols of any word under ANY merge table — even pairs that
    never fire or overlap weirdly — must concat back to word</w>."""
    from sparkswift.operators.text import _bpe_word_symbols

    # random merge table built from random substrings of the words
    pieces = sorted({w[i:j] for w in words for i in range(len(w)) for j in (i + 1, i + 2)})
    pairs = st.tuples(st.sampled_from(pieces + ["</w>"]), st.sampled_from(pieces + ["</w>"]))
    merges = data.draw(st.lists(pairs, max_size=12))
    ranks = {p: i for i, p in enumerate(merges)}
    for w in words:
        assert "".join(_bpe_word_symbols(w, ranks)) == w + "</w>"


# ---------------------------------------------------------------------------
# Division-free threshold rewrites (TPC-H Q17 / Q22): the predicates
#   qty·5·n < Σqty      (Q17: qty < 20% of the per-part average)
#   bal·n   > Σbal      (Q22: bal above the positive-balance average)
# must decide EXACTLY like the rational-arithmetic originals for any
# 4-decimal-quantized inputs — including values landing exactly ON
# the boundary, where a float average could tip either way.
# ---------------------------------------------------------------------------
@given(
    vals=st.lists(
        st.decimals(
            min_value="0.0001", max_value="99999", places=4, allow_nan=False
        ),
        min_size=1,
        max_size=50,
    ),
    probe=st.decimals(
        min_value="0.0001", max_value="99999", places=4, allow_nan=False
    ),
    on_boundary=st.booleans(),
)
@settings(max_examples=200, deadline=None)
def test_division_free_threshold_rewrites_match_rationals(vals, probe, on_boundary):
    from decimal import Decimal
    from fractions import Fraction

    s = sum(vals, Decimal(0))
    n = len(vals)
    if on_boundary:
        # a probe exactly at s/(5n) (when representable) must compare
        # False on both sides — the dangerous case for float averages
        exact = Fraction(int(s * 10_000), 10_000) / (5 * n)
        if exact.denominator <= 10_000 and 10_000 % exact.denominator == 0:
            probe = Decimal(exact.numerator) / Decimal(exact.denominator)

    frac_probe = Fraction(str(probe))
    frac_avg = Fraction(int(s * 10_000), 10_000) / n

    q17_rewrite = probe * 5 * n < s
    q17_rational = frac_probe < Fraction(1, 5) * frac_avg
    assert q17_rewrite == q17_rational

    q22_rewrite = probe * n > s
    q22_rational = frac_probe > frac_avg
    assert q22_rewrite == q22_rational


# ---------------------------------------------------------------------------
# pack_bins (FFD) laws under arbitrary length distributions — the
# fixture exercises one realistic distribution; this fuzzes spiky,
# uniform, all-oversize, and all-zero corpora through the real Spark
# path (1-2 packers keep each example a single small job).
# ---------------------------------------------------------------------------
@given(
    lens=st.lists(st.integers(min_value=0, max_value=700), min_size=1, max_size=60),
    n_packers=st.sampled_from([1, 2]),
)
@settings(**SETTINGS)
def test_pack_bins_laws_fuzz(spark, lens, n_packers):
    from sparkswift.operators.packing import pack_bins

    budget = 500
    pdf = pd.DataFrame({"doc_id": range(len(lens)), "n": lens})
    out = pack_bins(
        spark.createDataFrame(pdf).repartition(4),
        id_col="doc_id",
        len_col="n",
        budget=budget,
        n_packers=n_packers,
    ).toPandas()
    # exactly once
    assert len(out) == len(lens) == out["doc_id"].nunique()
    # oversize flag == (len > budget); oversize bins are singletons
    assert (out["oversize"] == (out["doc_len"] > budget).astype(int)).all()
    grp = out.groupby("bin_id").agg(load=("doc_len", "sum"), os=("oversize", "max"),
                                    cnt=("doc_id", "count"))
    assert (grp[grp["os"] == 1]["cnt"] == 1).all()
    # budget cap on non-oversize bins
    assert (grp[grp["os"] == 0]["load"] <= budget).all()
    # greedy half-full law per packer
    non_os = grp[grp["os"] == 0].reset_index()
    non_os["packer"] = (non_os["bin_id"] // (1 << 32)).astype(int)
    per_packer = (non_os["load"] * 2 <= budget).groupby(non_os["packer"]).sum()
    assert (per_packer <= 1).all()


# ---------------------------------------------------------------------------
# substring_dedup vs the pure-Python first-wins reference, over a
# 3-symbol alphabet (duplicate windows everywhere): overlap-merge,
# internal repeats, cross-doc chains, short docs.
# ---------------------------------------------------------------------------
@given(
    data=st.lists(
        st.lists(st.sampled_from(["a", "b", "c"]), min_size=0, max_size=24),
        min_size=1,
        max_size=8,
    )
)
@settings(**SETTINGS)
def test_substring_dedup_fuzz_matches_reference(spark, data):
    from tests.test_llm_ops import _ref_substring_dedup, _run_substring_dedup

    docs = {i: t for i, t in enumerate(data)}
    got = _run_substring_dedup(spark, docs, 3, parts=4)
    assert got == _ref_substring_dedup(docs, 3)


def test_editdistance_join_fuzz_completeness(spark):
    """Hypothesis-style fuzz (seeded, deterministic): random base
    strings with random ≤k edits applied — every planted pair must
    surface through the deletion-variant candidates at that k."""
    import random

    from sparkswift.operators.dedup import editdistance_join

    rng = random.Random(17)
    alpha = "abcdefg"

    def mutate(s: str, n_edits: int) -> str:
        for _ in range(n_edits):
            kind = rng.choice(["sub", "ins", "del"]) if len(s) > 3 else "ins"
            i = rng.randrange(len(s) + (kind == "ins"))
            if kind == "sub":
                s = s[:i] + rng.choice(alpha) + s[i + 1 :]
            elif kind == "ins":
                s = s[:i] + rng.choice(alpha) + s[i:]
            else:
                s = s[:i] + s[i + 1 :]
        return s

    rows, planted = [], []
    nid = 0
    for base_i in range(30):
        base = "".join(rng.choice(alpha) for _ in range(rng.randrange(6, 14)))
        rows.append((nid, base))
        base_id = nid
        nid += 1
        for k in (1, 2):
            m = mutate(base, k)
            rows.append((nid, m))
            planted.append((base_id, nid, k, base, m))
            nid += 1
    df = spark.createDataFrame(rows, "id long, s string")
    for k in (1, 2):
        got = {
            (r["id_l"], r["id_r"])
            for r in editdistance_join(df, df, "s", "s", "id", "id", k=k).collect()
        }
        for bid, mid, n_edits, base, m in planted:
            if n_edits <= k and base != m:
                assert (bid, mid) in got, (k, base, m)


def test_merge_upsert_fuzz_vs_dict_reference(spark, tmp_path):
    """Seeded fuzz: a random sequence of update/delete merges against
    a hive-partitioned store must track a plain python dict applying
    the same MERGE semantics (matched update/delete, unmatched
    insert)."""
    import random

    from sparkswift.sources.writers import merge_upsert, write_table

    rng = random.Random(23)
    path = str(tmp_path / "fuzz_store")
    ref = {k: (k % 5, float(k)) for k in range(60)}  # k -> (p, v)
    write_table(
        spark.createDataFrame(
            [(k, p, v) for k, (p, v) in ref.items()], "k long, p int, v double"
        ),
        path,
        partition_by=["p"],
    )
    next_key = 1000
    for step in range(6):
        mode = rng.choice(["update", "delete"])
        batch = {}
        for _ in range(rng.randrange(3, 10)):
            if rng.random() < 0.6 and ref:
                k = rng.choice(sorted(ref))
                batch[k] = (ref[k][0], float(rng.randrange(100, 999)))
            else:
                batch[next_key] = (rng.randrange(5), float(next_key))
                next_key += 1
        merge_upsert(
            spark,
            path,
            spark.createDataFrame(
                [(k, p, v) for k, (p, v) in batch.items()],
                "k long, p int, v double",
            ),
            "k",
            "p",
            when_matched=mode,
        )
        for k, (p, v) in batch.items():
            if k in ref:
                if mode == "update":
                    ref[k] = (p, v)
                else:
                    del ref[k]
            else:
                ref[k] = (p, v)
        got = {
            r["k"]: (r["p"], r["v"])
            for r in spark.read.parquet(path).collect()
        }
        assert got == ref, f"diverged at step {step} ({mode})"
