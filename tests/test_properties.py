"""Metamorphic / property-style tests (SURVEY §5.5) over generated inputs:

  * dedup(x ∪ x) ≡ dedup(x) and remapped FKs never dangle
  * MinHash-LSH pairs ⊆ exact-Jaccard pairs at the same threshold over the
    same shingles (LSH may lose recall, never precision after verification)
  * service minimization round-trips the materialized date set exactly
  * sessionization partitions events: counts sum, durations consistent

Hypothesis drives the generators; examples are kept small because every
example is a Spark job — the properties, not the volume, are the point.
"""

from __future__ import annotations

import datetime as dt

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from postgis_gtfs_importer_spark.operators import dedup as DD
from postgis_gtfs_importer_spark.operators.cleaning import minimize_services
from postgis_gtfs_importer_spark.operators.derivations import service_days
from postgis_gtfs_importer_spark.operators.sessions import sessionize

SETTINGS = dict(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

# -- dedup ------------------------------------------------------------------

rows_strategy = st.lists(
    st.tuples(
        st.integers(0, 50),  # id source (made unique below)
        st.sampled_from(["alpha", "beta", "gamma", "delta"]),
        st.integers(0, 3),
    ),
    min_size=1,
    max_size=20,
)


@given(rows=rows_strategy)
@settings(**SETTINGS)
def test_dedup_idempotent_and_duplication_invariant(spark, rows):
    data = [(i, c1, c2) for i, (_, c1, c2) in enumerate(rows)]
    df = spark.createDataFrame(data, "id long, c1 string, c2 long")
    once, mapping = DD.dedup_exact(df, "id", ["c1", "c2"])
    # duplication invariance: dedup(x ∪ x') with shifted ids keeps the
    # same canonical content set
    shifted = df.withColumn("id", F.col("id") + 1000)
    doubled, _ = DD.dedup_exact(df.unionByName(shifted), "id", ["c1", "c2"])
    assert sorted(
        (r.c1, r.c2) for r in once.collect()
    ) == sorted((r.c1, r.c2) for r in doubled.collect())
    # canonical ids are original ids (B6 --keep-ids) and minimal
    m = {r.id: r.canonical_id for r in mapping.collect()}
    assert set(m.values()) <= set(m.keys())
    assert all(c <= i for i, c in m.items())


@given(rows=rows_strategy)
@settings(**SETTINGS)
def test_dedup_remap_never_dangles(spark, rows):
    entities = [(i, c1, c2) for i, (_, c1, c2) in enumerate(rows)]
    df = spark.createDataFrame(entities, "id long, c1 string, c2 long")
    refs = spark.createDataFrame(
        [(j, e[0]) for j, e in enumerate(entities)], "ref_id long, fk long"
    )
    tables = DD.dedup_and_remap(
        {"ent": df, "ref": refs}, "ent", "id", ["c1", "c2"], [("ref", "fk")]
    )
    dangling = tables["ref"].join(
        tables["ent"].select(F.col("id").alias("fk")), "fk", "left_anti"
    )
    assert dangling.count() == 0


# -- minhash vs exact jaccard ----------------------------------------------

docs_strategy = st.lists(
    st.text(alphabet="ab cd", min_size=0, max_size=40),
    min_size=2,
    max_size=8,
)


@given(texts=docs_strategy)
@settings(**SETTINGS)
def test_minhash_pairs_subset_of_exact_jaccard(spark, texts):
    df = spark.createDataFrame(
        [(i, t, "x") for i, t in enumerate(texts)], "doc_id long, text string, lang string"
    )
    lsh = DD.minhash_lsh_pairs(
        df, "doc_id", "text", threshold=0.5, num_hashes=16, bands=4
    )
    exact = DD.ngram_jaccard_pairs(
        df, "doc_id", "text", block_col="lang", threshold=0.5
    )
    lsh_pairs = {(r.id_a, r.id_b, r.jaccard_e6) for r in lsh.collect()}
    exact_pairs = {(r.id_a, r.id_b, r.jaccard_e6) for r in exact.collect()}
    # post-verification LSH never reports a pair the exact join wouldn't,
    # and agrees on the score when it does
    assert lsh_pairs <= exact_pairs


def test_connected_components_chain_beats_pair_drop(spark):
    """Path graph 1–5, 3–5: node 3 reaches the minimum (1) only through 5.
    Pair-drop keeps {1, 3}; CC correctly collapses to {1}."""
    pairs = spark.createDataFrame(
        [(1, 5, 900000), (3, 5, 900000)], "id_a long, id_b long, jaccard_e6 long"
    )
    comp = {
        r.id: r.component for r in DD.connected_components(pairs).collect()
    }
    assert comp == {1: 1, 3: 1, 5: 1}


# -- service minimization round-trip ---------------------------------------

service_strategy = st.lists(
    st.tuples(
        st.integers(0, 3),  # service id
        st.integers(0, 27),  # start day offset in Jan 2024
        st.integers(0, 13),  # length
        st.integers(0, 127),  # weekday bitmap
    ),
    min_size=1,
    max_size=4,
    unique_by=lambda t: t[0],
)


@given(services=service_strategy)
@settings(**SETTINGS)
def test_minimize_services_roundtrip(spark, services):
    base = dt.date(2024, 1, 1)
    cal_rows = []
    for sid, off, length, bitmap in services:
        start = base + dt.timedelta(days=off)
        cal_rows.append(
            (
                f"S{sid}",
                *[(bitmap >> d) & 1 for d in range(7)],
                start,
                start + dt.timedelta(days=length),
            )
        )
    cal = spark.createDataFrame(
        cal_rows,
        "service_id string, monday int, tuesday int, wednesday int, thursday int,"
        " friday int, saturday int, sunday int, start_date date, end_date date",
    )
    tables = {"calendar": cal}
    before = {(r.service_id, r.date) for r in service_days(tables).collect()}
    out = minimize_services(tables)
    after = {(r.service_id, r.date) for r in service_days(out).collect()}
    assert before == after


# -- sessionization partitions events --------------------------------------

events_strategy = st.lists(
    st.tuples(st.integers(0, 2), st.integers(0, 60 * 60 * 6)),
    min_size=1,
    max_size=30,
)


@given(evts=events_strategy)
@settings(**SETTINGS)
def test_sessionize_partitions_events(spark, evts):
    base = dt.datetime(2024, 1, 1)
    rows = [
        (i, u, base + dt.timedelta(seconds=s)) for i, (u, s) in enumerate(evts)
    ]
    df = spark.createDataFrame(rows, "event_id long, user_id long, ts timestamp")
    sessions = sessionize(df, gap_sec=1800).collect()
    # every event lands in exactly one session
    assert sum(r.n_events for r in sessions) == len(rows)
    for r in sessions:
        assert 0 <= r.duration_sec <= 6 * 3600
        # a session's span implies no internal gap > gap_sec only if
        # n_events*gap covers the duration (necessary condition)
        if r.n_events > 1:
            assert r.duration_sec <= (r.n_events - 1) * 1800


def test_cc_star_equals_propagation_on_random_graphs(spark):
    """Large-star/small-star contraction (O(log² n) rounds, diameter-
    independent — the 100 TB path) must produce exactly the labels of
    min-label propagation, including long chains (diameter stress) and
    self-loop-only nodes."""
    import random

    from postgis_gtfs_importer_spark.operators.dedup import (
        connected_components,
    )

    cases = [
        [(i, i + 1) for i in range(30)],  # 30-hop chain
        [(0, i) for i in range(1, 10)],  # star
        [(1, 2), (2, 3), (10, 11), (12, 11), (5, 5)],  # self-loop island
    ]
    for s in range(5):
        random.seed(100 + s)
        n = random.randint(5, 60)
        cases.append(
            [(random.randint(0, n), random.randint(0, n)) for _ in range(n)]
        )
    for pairs in cases:
        df = spark.createDataFrame(pairs, "id_a long, id_b long")
        a = {
            (r.id, r.component)
            for r in connected_components(df, 40, algorithm="star").collect()
        }
        b = {
            (r.id, r.component)
            for r in connected_components(
                df, 80, algorithm="propagate"
            ).collect()
        }
        assert a == b, pairs


# --- SCD2: random batch sequences preserve history invariants -------------

scd2_batches_strategy = st.lists(
    st.dictionaries(  # one batch: pk -> value
        keys=st.integers(min_value=0, max_value=5),
        values=st.sampled_from(["a", "b", "c"]),
        min_size=0,
        max_size=6,
    ),
    min_size=1,
    max_size=4,
)


@given(batches=scd2_batches_strategy)
@settings(**SETTINGS)
def test_scd2_invariants_under_random_batches(spark, batches):
    """Fold a random sequence of snapshots through scd2_apply and check
    the history invariants no implementation detail may break:
      * at most one OPEN version per pk, and open pks == last batch's pks
      * an open version's payload equals the last batch's value
      * closed intervals are well-formed (valid_from <= valid_to) and a
        pk's versions never overlap
      * total versions only grow (history is append/close-only)
    """
    from postgis_gtfs_importer_spark.operators.diff import scd2_apply

    hist = spark.createDataFrame(
        [], "pk long, val string, valid_from long, valid_to long"
    )
    prev_versions = 0
    for i, batch in enumerate(batches, start=1):
        src = spark.createDataFrame(
            [(k, v) for k, v in batch.items()], "pk long, val string"
        )
        hist = scd2_apply(hist, src, ["pk"], ["val"], batch_id=i)
        rows = hist.collect()
        open_rows = [r for r in rows if r.valid_to is None]
        # one open version per live pk; open set == batch keys
        assert len({r.pk for r in open_rows}) == len(open_rows)
        assert {r.pk for r in open_rows} == set(batch)
        for r in open_rows:
            assert r.val == batch[r.pk]
        # closed intervals well-formed, per-pk non-overlapping
        by_pk: dict[int, list] = {}
        for r in rows:
            by_pk.setdefault(r.pk, []).append(r)
        for pk, vs in by_pk.items():
            closed = sorted(
                [v for v in vs if v.valid_to is not None],
                key=lambda v: (v.valid_from, v.valid_to),
            )
            for v in closed:
                assert v.valid_from <= v.valid_to
            for a, b in zip(closed, closed[1:]):
                assert a.valid_to <= b.valid_from
        assert len(rows) >= prev_versions
        prev_versions = len(rows)


def test_neardup_incremental_partitions_batch(spark):
    """neardup_incremental invariants: (matches ∪ survivors) covers the
    batch exactly; a batch doc identical to an index doc always matches
    at est_jaccard 1e6; an all-novel doc always survives."""
    corpus = [
        (10, "the quick brown fox jumps over the lazy dog again today"),
        (11, "completely different text about spark physical planning"),
        (12, "a third document with its own unique shingle material here"),
    ]
    batch = [
        (0, "the quick brown fox jumps over the lazy dog again today"),  # dup of 10
        (3, "utterly novel content that shares nothing with the corpus x y z"),
    ]
    idx_docs = spark.createDataFrame(corpus, "doc_id long, text string")
    bdf = spark.createDataFrame(batch, "doc_id long, text string")
    index_sigs = DD.minhash_signatures(idx_docs, "doc_id", "text")
    matches, survivors = DD.neardup_incremental(
        bdf, index_sigs, "doc_id", "text", threshold=0.5
    )
    m = {(r.batch_id, r.index_id): r.est_jaccard_e6 for r in matches.collect()}
    surv = {r.id for r in survivors.select("id").collect()}
    assert m[(0, 10)] == 1_000_000          # identical text -> all components agree
    assert 0 not in surv and 3 in surv      # partition of the batch
    assert surv | {b for b, _ in m} == {0, 3}
    # survivors carry index-appendable signatures (same schema as the index)
    assert set(survivors.columns) == set(index_sigs.columns)


# -- round-4 second-block families ------------------------------------------

corpus_strategy = st.lists(
    st.text(
        alphabet=st.sampled_from("ab c"),  # tiny alphabet -> dense merges
        min_size=1,
        max_size=24,
    ),
    min_size=1,
    max_size=8,
)


@given(texts=corpus_strategy, n=st.integers(1, 6))
@settings(**SETTINGS)
def test_bpe_trainer_equals_reference_on_random_corpora(spark, texts, n):
    """The distributed trainer IS the classic algorithm: merge-for-merge
    equality with the pure-Python reference on arbitrary corpora,
    including degenerate all-space and single-char inputs."""
    from postgis_gtfs_importer_spark.operators.bpe import (
        bpe_merges,
        bpe_reference,
    )

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = [
        (r.lhs, r.rhs, r.pair_count)
        for r in bpe_merges(df, n_merges=n).orderBy("rank").collect()
    ]
    assert got == bpe_reference(texts, n)


@given(
    vecs=st.lists(
        st.lists(
            st.floats(-4, 4, allow_nan=False, width=32), min_size=4, max_size=4
        ),
        min_size=1,
        max_size=8,
    )
)
@settings(**SETTINGS)
def test_int8_quantize_error_bound(spark, vecs):
    """Symmetric int8: every reconstructed component is within half a
    quantization step (maxabs/254... bounded by maxabs/127 with the
    +0.5 floor = nearest-int) of the original, and the max-magnitude
    component always hits ±127 exactly."""
    from postgis_gtfs_importer_spark.operators.similarity import (
        int8_quantize,
    )

    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<float>",
    )
    import numpy as np

    for r in int8_quantize(df).collect():
        orig = np.array(
            np.array(vecs[r.id], dtype=np.float32), dtype=np.float64
        )
        maxabs = float(np.max(np.abs(orig)))
        assert r.maxabs == maxabs
        if maxabs == 0:
            assert all(q == 0 for q in r.qvec)
            continue
        scale = maxabs / 127.0
        recon = np.array(r.qvec, dtype=np.float64) * scale
        assert np.all(np.abs(recon - orig) <= scale / 2 + 1e-12)
        assert max(abs(q) for q in r.qvec) == 127


@given(
    rows=st.lists(
        st.tuples(
            st.integers(0, 30),
            st.sampled_from(["x", "y"]),
            st.integers(0, 5),
        ),
        min_size=1,
        max_size=24,
    ),
    den=st.integers(2, 5),
)
@settings(**SETTINGS)
def test_percentile_gate_keeps_exact_ceiling(spark, rows, den):
    from math import ceil

    from postgis_gtfs_importer_spark.operators.curation import (
        percentile_gate,
    )

    uniq = [(i, s, v) for i, (_, s, v) in enumerate(rows)]
    df = spark.createDataFrame(uniq, "doc_id long, lang string, score long")
    out = percentile_gate(
        df, score_col="score", stratum_col="lang", id_col="doc_id",
        keep_num=1, keep_den=den,
    ).collect()
    from collections import Counter

    n_per = Counter(s for _, s, _ in uniq)
    kept = Counter(r.lang for r in out)
    for lang, n in n_per.items():
        assert kept[lang] == ceil(n / den)
    # survivors are exactly the top-scored (ties -> lowest ids)
    for lang in n_per:
        want = sorted(
            (d for d in uniq if d[1] == lang),
            key=lambda d: (-d[2], d[0]),
        )[: ceil(n_per[lang] / den)]
        assert {r.doc_id for r in out if r.lang == lang} == {
            d[0] for d in want
        }


@given(doc_id=st.integers(0, 10**6), n_chars=st.integers(0, 10**6))
@settings(**SETTINGS)
def test_media_builders_roundtrip_through_parsers(doc_id, n_chars):
    """WAV and MP4 builder->parser round trips for arbitrary row
    attributes (pure Python: no Spark in the loop)."""
    from postgis_gtfs_importer_spark.operators.multimodal import (
        decode_audio_header,
        decode_video_header,
        synth_mp4,
        synth_wav,
    )

    ch, sr, bits, dur, fmt = decode_audio_header(synth_wav(doc_id, n_chars))
    assert fmt == "wav"
    assert ch == 1 + doc_id % 2 and sr == 8000 * (1 + doc_id % 3)
    assert bits == 8 * (1 + doc_id % 2)
    assert dur == (100 + n_chars % 900) * 1000 // sr

    w, h, vdur, vfmt = decode_video_header(synth_mp4(doc_id, n_chars))
    assert vfmt == "mp4"
    assert w == 320 + (doc_id % 8) * 160 and h == 240 + (doc_id % 6) * 120
    assert vdur == (600 + (n_chars % 1200) * 10) * 1000 // 600


# -- line-level dedup -------------------------------------------------------

docs_strategy = st.lists(
    st.lists(
        st.sampled_from(["a", "b", "c", "d"]),
        min_size=1,
        max_size=12,
    ),
    min_size=1,
    max_size=10,
)


@given(docs=docs_strategy, k=st.integers(1, 3))
@settings(**SETTINGS)
def test_line_dedup_invariants(spark, docs, k):
    """(1) kept + dropped == total lines per doc; (2) corpus-wide kept
    line count == number of DISTINCT lines (each distinct line survives
    exactly once); (3) the lexicographically first document is never
    line-deduplicated against itself from elsewhere (its first line
    always survives); (4) idempotence: running line_dedup over the
    reassembled kept text drops nothing."""
    from postgis_gtfs_importer_spark.operators.lines import line_dedup

    rows = [(i, " ".join(toks)) for i, toks in enumerate(docs)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = line_dedup(df, tokens_per_line=k).collect()
    assert all(r["kept_lines"] + r["dropped_lines"] == r["n_lines"] for r in out)

    def lines_of(toks):
        return [
            " ".join(toks[i : i + k]) for i in range(0, len(toks), k)
        ]

    all_lines = [ln for toks in docs for ln in lines_of(toks)]
    assert sum(r["kept_lines"] for r in out) == len(set(all_lines))
    first = next(r for r in out if r["doc_id"] == 0)
    assert first["kept_lines"] >= 1
    assert first["kept_text"].split("\n")[0] == lines_of(docs[0])[0]
    # idempotence over the survivors (re-segment at the same width)
    kept_rows = [
        (r["doc_id"], r["kept_text"].replace("\n", " "))
        for r in out
        if r["kept_lines"] > 0
    ]
    df2 = spark.createDataFrame(kept_rows, ["doc_id", "text"])
    out2 = line_dedup(df2, tokens_per_line=k).collect()
    assert all(r["dropped_lines"] == 0 for r in out2)
