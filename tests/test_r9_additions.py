"""Round-9 additions: decontaminate's contaminated-token accounting
(the Brown et al. 13-gram procedure upgraded from flag to fraction +
drop gate) and the later r9 waves' operators.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from postgis_gtfs_importer_spark.operators import curation as C


# ------------------------------------------------- decontaminate upgrade


def test_decontaminate_span_union_never_double_counts(spark):
    """Two OVERLAPPING shared 4-grams ('a b c d' at 1, 'b c d e' at 2)
    cover tokens 1..5 — contaminated_tok must be 5, not 8."""
    corpus = spark.createDataFrame(
        [(1, "a b c d e x y z")], "doc_id long, text string"
    )
    bench = spark.createDataFrame(
        [(100, "a b c d e")], "doc_id long, text string"
    )
    out = C.decontaminate(corpus, bench, n=4).collect()
    assert len(out) == 1
    r = out[0]
    assert r["n_tok"] == 8
    assert r["n_shared_ngrams"] == 2
    assert r["contaminated_tok"] == 5
    assert r["contam_ppm"] == 5 * 1_000_000 // 8
    assert r["drop_doc"] is True


def test_decontaminate_disjoint_spans_sum(spark):
    """Two DISJOINT hits (positions 1 and 7) cover 2*n tokens."""
    corpus = spark.createDataFrame(
        [(1, "a b c d q r s t u a b c d")], "doc_id long, text string"
    )
    bench = spark.createDataFrame(
        [(100, "a b c d")], "doc_id long, text string"
    )
    r = C.decontaminate(corpus, bench, n=4).collect()[0]
    assert r["n_tok"] == 13
    assert r["n_shared_ngrams"] == 1  # same gram twice, distinct count 1
    assert r["contaminated_tok"] == 8  # [1,5) + [10,14)


def test_decontaminate_drop_gate_threshold(spark):
    """drop_ppm is a policy knob: the same doc flips from kept to
    dropped as the threshold crosses its contam_ppm."""
    corpus = spark.createDataFrame(
        [(1, " ".join(["w"] * 36) + " a b c d")], "doc_id long, text string"
    )
    bench = spark.createDataFrame(
        [(100, "a b c d")], "doc_id long, text string"
    )
    # 4 contaminated of 40 tokens = 100_000 ppm
    strict = C.decontaminate(corpus, bench, n=4, drop_ppm=0).collect()[0]
    loose = C.decontaminate(
        corpus, bench, n=4, drop_ppm=100_000
    ).collect()[0]
    assert strict["contam_ppm"] == 100_000
    assert strict["drop_doc"] is True
    assert loose["drop_doc"] is False  # 100_000 > 100_000 is False


def test_decontaminate_clean_docs_absent(spark):
    corpus = spark.createDataFrame(
        [(1, "p q r s t"), (2, "a b c d e")], "doc_id long, text string"
    )
    bench = spark.createDataFrame(
        [(100, "a b c d")], "doc_id long, text string"
    )
    out = C.decontaminate(corpus, bench, n=4).collect()
    assert [r["doc_id"] for r in out] == [2]


def test_decontaminate_default_is_thirteen_gram(spark):
    """The operator default is the published 13-gram rule: a 12-token
    shared prefix must NOT flag, a full 13-gram match must."""
    twelve = " ".join(f"t{i}" for i in range(12))
    thirteen = " ".join(f"t{i}" for i in range(13))
    corpus = spark.createDataFrame(
        [(1, twelve + " zzz"), (2, thirteen + " zzz")],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame(
        [(100, thirteen)], "doc_id long, text string"
    )
    out = C.decontaminate(corpus, bench).collect()
    assert [r["doc_id"] for r in out] == [2]
    assert out[0]["contaminated_tok"] == 13


def test_decontaminate_hot_eval_gram_skew(spark):
    """Skew smoke (VERDICT r8 item 2): ONE benchmark n-gram present in
    EVERY corpus doc ('the answer is ...' boilerplate). Hit rows stay
    bounded by corpus positions x matching bench docs — the broadcast
    direction means the hot gram never keys a shuffle — and every doc
    reports exactly its own span coverage."""
    hot = "the answer is x"
    n_docs = 2000
    corpus = spark.createDataFrame(
        [(i, f"doc {i} body text {hot} tail {i}") for i in range(n_docs)],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame(
        [(9_000_001, hot), (9_000_002, f"unrelated bench {hot}")],
        "doc_id long, text string",
    )
    out = C.decontaminate(corpus, bench, n=4)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan  # bench side broadcast, not shuffled
    rows = out.collect()
    assert len(rows) == n_docs
    assert all(r["contaminated_tok"] == 4 for r in rows)
    assert all(r["n_bench_docs"] == 2 for r in rows)


# ------------------------------------------------------- dsir_resample


def test_dsir_prefers_target_like_docs(spark):
    """Raw corpus: 30 'cat'-flavored docs and 30 'dog'-flavored docs;
    target is pure cat. The top-10 resample must be overwhelmingly
    cat-side — importance weights dominate the Gumbel noise when the
    distributions are this separated."""
    cats = [(i, "cat feline whiskers purr meow tail") for i in range(30)]
    dogs = [(100 + i, "dog canine bark fetch bone growl") for i in range(30)]
    raw = spark.createDataFrame(cats + dogs, "doc_id long, text string")
    target = spark.createDataFrame(
        [(1000 + i, "cat feline purr meow") for i in range(5)],
        "doc_id long, text string",
    )
    out = C.dsir_resample(raw, target, k=10, buckets=64).collect()
    assert len(out) == 10
    cat_picks = sum(1 for r in out if r["doc_id"] < 100)
    assert cat_picks >= 9
    # ranks are 1..k with no gaps
    assert sorted(r["rank"] for r in out) == list(range(1, 11))


def test_dsir_deterministic_and_weight_ordering(spark):
    raw = spark.createDataFrame(
        [(i, f"alpha beta w{i % 7} gamma") for i in range(40)],
        "doc_id long, text string",
    )
    target = spark.createDataFrame(
        [(99, "alpha beta gamma")], "doc_id long, text string"
    )
    a = C.dsir_resample(raw, target, k=8, buckets=32).collect()
    b = C.dsir_resample(raw, target, k=8, buckets=32).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    # a cat-side doc's logw must strictly exceed... here: every selected
    # doc carries the gram count of its own text (5 unigrams + bigrams)
    for r in a:
        assert r["n_grams"] == 4 + 3


def test_dsir_excludes_featureless_docs(spark):
    raw = spark.createDataFrame(
        [(1, "alpha beta"), (2, ""), (3, None), (None, "alpha beta")],
        "doc_id long, text string",
    )
    target = spark.createDataFrame(
        [(9, "alpha beta")], "doc_id long, text string"
    )
    out = C.dsir_resample(raw, target, k=10, buckets=16).collect()
    assert [r["doc_id"] for r in out] == [1]


def test_dsir_validates_inputs(spark):
    df = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    with pytest.raises(ValueError, match="k >= 1"):
        C.dsir_resample(df, df, k=0)
    with pytest.raises(ValueError, match="buckets >= 2"):
        C.dsir_resample(df, df, k=1, buckets=1)
    with pytest.raises(ValueError, match="collides"):
        C.dsir_resample(
            df.withColumnRenamed("doc_id", "rank"), df, k=1, id_col="rank"
        )


def test_dsir_in_corpus_pipeline(spark):
    """Flag-gated stage 4d: with dsir_k set and a target given, the
    curated output shrinks to <= dsir_k docs and the report records
    the stage."""
    from postgis_gtfs_importer_spark.plans.corpus import (
        CorpusConfig,
        curate_corpus,
    )

    docs = spark.createDataFrame(
        [
            (
                i,
                " ".join(f"w{i}x{j}" for j in range(12))
                + f" shared tail {i}",
                "en",
            )
            for i in range(30)
        ],
        "doc_id long, text string, lang string",
    )
    target = spark.createDataFrame(
        [(900, "unique document body filler words")],
        "doc_id long, text string",
    )
    cfg = CorpusConfig(min_quality_e6=0, dsir_k=12, dsir_buckets=64,
                       balance_mixture=False)
    res = curate_corpus(docs, cfg=cfg, dsir_target=target)
    assert res.report["dsir_resampled"] == 12
    assert res.report["mixed"] == 12


# -------------------------------------------------- gopher_quality_gate


def _gopher(spark, text):
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    return C.gopher_quality_gate(df, min_words=5, max_words=100).collect()[0]


def test_gopher_passes_plain_prose(spark):
    r = _gopher(
        spark,
        "the quick brown fox jumps over that lazy dog and runs with glee",
    )
    assert r["keep"] is True
    assert r["n_words"] == 13
    assert r["n_stopwords"] >= 2


def test_gopher_word_count_bounds(spark):
    assert _gopher(spark, "the of and")["keep"] is False  # < 5 words
    long = "the of " + " ".join(["word"] * 120)
    assert _gopher(spark, long)["keep"] is False  # > 100 words


def test_gopher_mean_word_length_band(spark):
    # mean length < 3: single-char words
    r = _gopher(spark, "the of a b c d e f g h")
    assert r["word_chars"] < 3 * r["n_words"]
    assert r["keep"] is False
    # mean length > 10
    r2 = _gopher(
        spark, "the of incomprehensibilities " + " ".join(
            ["extraordinarily"] * 8
        )
    )
    assert r2["keep"] is False


def test_gopher_symbol_ratio(spark):
    r = _gopher(spark, "the of alpha beta # # # gamma delta")
    assert r["n_symbols"] == 3
    assert r["keep"] is False  # 3 symbols * 10 > 8 words
    # unicode and three-dot ellipses both count
    r2 = _gopher(spark, "the of alpha… beta... gamma delta epsilon")
    assert r2["n_symbols"] == 2


def test_gopher_bullet_and_ellipsis_lines(spark):
    # words long enough that the 1-char "-" token keeps mean length >= 3
    bline = "- itemized alphabet words the of"
    bullets = "\n".join([bline] * 9 + ["plain line"])
    r = _gopher(spark, bullets)
    assert r["n_lines"] == 10
    assert r["n_bullet_lines"] == 9
    assert r["keep"] is True  # exactly 90% allowed (<=)
    assert _gopher(spark, "\n".join([bline] * 10))["keep"] is False
    ell = "\n".join(["this line trails off the of..."] * 2 + ["solid"] * 3)
    r3 = _gopher(spark, ell)
    assert r3["n_ellipsis_lines"] == 2
    assert r3["keep"] is False  # 2/5 = 40% > 30%


def test_gopher_alpha_and_stopword_rules(spark):
    r = _gopher(spark, "the of 111 222 333 444 555 666 777 888")
    assert r["n_alpha_words"] == 2
    assert r["keep"] is False  # 2/10 alpha < 80%
    r2 = _gopher(spark, "quick brown foxes jump over seven lazy dogs")
    assert r2["n_stopwords"] < 2
    assert r2["keep"] is False


def test_gopher_null_text_returns_zeros(spark):
    df = spark.createDataFrame([(1, None)], "doc_id long, text string")
    r = C.gopher_quality_gate(df).collect()[0]
    assert r["n_words"] == 0 and r["keep"] is False


# ------------------------------------------------------- adamic_adar


def test_adamic_adar_hand_computed(spark):
    """Path graph 1-2-3 plus 2-4: non-adjacent pairs through center 2
    (deg 3): (1,3), (1,4), (3,4) each score 1/ln(3); pair (1,3) also
    has no other center. Centers 1, 3, 4 have deg 1 — no wedge."""
    import math

    from postgis_gtfs_importer_spark.operators.graph import adamic_adar

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (2, 4)], "a long, b long"
    )
    out = {(r["a"], r["b"]): r for r in adamic_adar(edges, k=10).collect()}
    w = int(math.floor(1_000_000.0 / math.log(3.0) + 0.5))
    assert set(out) == {(1, 3), (1, 4), (3, 4)}
    for r in out.values():
        assert r["common_nbrs"] == 1 and r["aa_e6"] == w


def test_adamic_adar_excludes_existing_edges_and_ranks(spark):
    """Square 1-2-3-4-1: diagonals (1,3) and (2,4) each have two
    common deg-2 neighbors; the existing edges never appear."""
    import math

    from postgis_gtfs_importer_spark.operators.graph import adamic_adar

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (1, 4)], "a long, b long"
    )
    out = adamic_adar(edges, k=10).collect()
    w = int(math.floor(1_000_000.0 / math.log(2.0) + 0.5))
    assert {(r["a"], r["b"]) for r in out} == {(1, 3), (2, 4)}
    assert all(r["aa_e6"] == 2 * w and r["common_nbrs"] == 2 for r in out)


def test_adamic_adar_max_degree_cap(spark):
    """A hub center above the cap contributes NO wedges; the capped
    result is exact for the declared cap."""
    from postgis_gtfs_importer_spark.operators.graph import adamic_adar

    hub = [(i, 100) for i in range(1, 6)]  # hub 100 with deg 5
    path = [(200, 201), (201, 202)]  # center 201 with deg 2
    edges = spark.createDataFrame(hub + path, "a long, b long")
    capped = adamic_adar(edges, k=50, max_degree=4).collect()
    assert {(r["a"], r["b"]) for r in capped} == {(200, 202)}
    uncapped = adamic_adar(edges, k=50).collect()
    assert len(uncapped) == 1 + 10  # hub wedges C(5,2) back


def test_adamic_adar_validates(spark):
    from postgis_gtfs_importer_spark.operators.graph import adamic_adar

    edges = spark.createDataFrame([(1, 2)], "a long, b long")
    with pytest.raises(ValueError, match="k >= 1"):
        adamic_adar(edges, k=0)
    with pytest.raises(ValueError, match="max_degree >= 2"):
        adamic_adar(edges, k=1, max_degree=1)


# ------------------------------------------------ simplified_silhouette


def _sil_fixture(spark):
    """Two tight planted clusters far apart in 2-D, plus a boundary
    point. Centroids at ~(0,0) and ~(10,10)."""
    rows = [
        (1, [0.0, 0.0]), (2, [0.1, 0.0]), (3, [0.0, 0.1]),
        (11, [10.0, 10.0]), (12, [10.1, 10.0]), (13, [10.0, 10.1]),
    ]
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_silhouette_tight_separated_clusters_score_high(spark):
    from postgis_gtfs_importer_spark.operators.clustering import (
        kmeans_lloyd,
        simplified_silhouette,
    )

    pts = _sil_fixture(spark)
    cb = kmeans_lloyd(pts, k=2, iterations=3)
    out = simplified_silhouette(pts, cb).collect()
    assert len(out) == 2
    assert sum(r["n_points"] for r in out) == 6
    for r in out:
        assert r["silhouette_e6"] > 990_000  # near-perfect separation


def test_silhouette_boundary_point_drags_mean(spark):
    from postgis_gtfs_importer_spark.operators.clustering import (
        kmeans_lloyd,
        simplified_silhouette,
    )

    pts = _sil_fixture(spark)
    mid = spark.createDataFrame(
        [(99, [5.0, 5.0])], "vec_id long, embedding array<double>"
    )
    both = pts.union(mid)
    cb = kmeans_lloyd(pts, k=2, iterations=3)  # train WITHOUT the midpoint
    base = {r["cid"]: r for r in simplified_silhouette(pts, cb).collect()}
    withmid = {
        r["cid"]: r for r in simplified_silhouette(both, cb).collect()
    }
    # the midpoint lands in exactly one cluster and lowers its mean
    changed = [
        cid for cid in withmid
        if withmid[cid]["n_points"] != base[cid]["n_points"]
    ]
    assert len(changed) == 1
    cid = changed[0]
    assert withmid[cid]["silhouette_e6"] < base[cid]["silhouette_e6"]


def test_silhouette_single_centroid_yields_empty(spark):
    from postgis_gtfs_importer_spark.operators.clustering import (
        kmeans_lloyd,
        simplified_silhouette,
    )

    pts = _sil_fixture(spark)
    cb = kmeans_lloyd(pts, k=1, iterations=1)
    assert simplified_silhouette(pts, cb).count() == 0


# ---------------------------------------------------- embedding_drift


def test_embedding_drift_identical_slices_have_zero_shift(spark):
    """Two slices with IDENTICAL point sets: both centroids equal the
    global centroid -> shift 0, cosine 1e6."""
    from postgis_gtfs_importer_spark.operators.similarity import (
        embedding_drift,
    )

    rows = []
    for sl in (0, 1):
        rows += [(sl * 10 + i, [1.0, 2.0, 3.0], sl) for i in range(3)]
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>, label int"
    )
    out = {r["label"]: r for r in embedding_drift(df, "label").collect()}
    assert set(out) == {0, 1}
    for r in out.values():
        assert r["n_vecs"] == 3
        assert r["shift_d2"] == 0
        assert r["cos_to_global_e6"] == 1_000_000


def test_embedding_drift_opposed_slice_scores_negative_cosine(spark):
    """Slice 0 along +x, slice 1 along -x with slightly different
    magnitude so the global centroid is nonzero: the two slices'
    cosines to the global centroid have opposite signs."""
    from postgis_gtfs_importer_spark.operators.similarity import (
        embedding_drift,
    )

    rows = [(1, [1.0, 0.0], 0), (2, [-0.5, 0.0], 1)]
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>, label int"
    )
    out = {r["label"]: r for r in embedding_drift(df, "label").collect()}
    assert out[0]["cos_to_global_e6"] == 1_000_000
    assert out[1]["cos_to_global_e6"] == -1_000_000
    assert out[0]["shift_d2"] > 0 and out[1]["shift_d2"] > 0


def test_embedding_drift_null_policy_and_zero_vector(spark):
    from postgis_gtfs_importer_spark.operators.similarity import (
        embedding_drift,
    )

    rows = [
        (1, [0.0, 0.0], 0),   # zero vector: cosine NULL, shift = |g|^2
        (2, [2.0, 0.0], 1),
        (3, None, 1),          # NULL vector excluded
        (4, [9.0, 9.0], None),  # NULL slice excluded
    ]
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>, label int"
    )
    out = {r["label"]: r for r in embedding_drift(df, "label").collect()}
    assert set(out) == {0, 1}
    assert out[1]["n_vecs"] == 1  # the NULL vector contributed nothing
    assert out[0]["cos_to_global_e6"] is None  # zero slice centroid


# -------------------------------------------------------- rate_spikes


def _spike_events(spark, counts_by_hour, key="k"):
    """counts_by_hour: {hour_index: n_events} -> events DataFrame."""
    import datetime as dt

    base = dt.datetime(2024, 1, 1, 0, 0)
    rows = []
    eid = 0
    for h, n in counts_by_hour.items():
        for i in range(n):
            rows.append(
                (key, base + dt.timedelta(hours=h, seconds=i), eid)
            )
            eid += 1
    return spark.createDataFrame(
        rows, "event_type string, ts timestamp, event_id long"
    )


def test_rate_spikes_flags_burst_over_dense_baseline(spark):
    """Hours 0-5 at 2/hour, hour 6 at 10 (5x mean -> spike), hour 7
    back to 2 (under 2x the now-elevated mean -> quiet)."""
    from postgis_gtfs_importer_spark.operators.temporal import rate_spikes

    ev = _spike_events(
        spark, {0: 2, 1: 2, 2: 2, 3: 2, 4: 2, 5: 2, 6: 10, 7: 2}
    )
    out = rate_spikes(
        ev, key_cols=["event_type"], window_buckets=6,
        factor_num=2, factor_den=1,
    ).collect()
    assert len(out) == 1
    r = out[0]
    assert r["n_events"] == 10 and r["trailing_sum"] == 12
    assert r["w_actual"] == 6


def test_rate_spikes_dense_grid_zeros_suppress_false_negatives(spark):
    """THE dense-grid hinge: 2 events at hour 0, silence for hours
    1-5, then 3 events at hour 6. Trailing mean over the DENSE window
    is (2+0+0+0+0+0)/6 = 1/3, so 3 events IS a spike; a sparse window
    (only hour 0 visible) would compute mean 2 and miss it."""
    from postgis_gtfs_importer_spark.operators.temporal import rate_spikes

    ev = _spike_events(spark, {0: 2, 6: 3})
    out = rate_spikes(
        ev, key_cols=["event_type"], window_buckets=6,
        factor_num=2, factor_den=1,
    ).collect()
    assert [(r["n_events"], r["trailing_sum"], r["w_actual"])
            for r in out] == [(3, 2, 6)]


def test_rate_spikes_cold_start_not_flagged(spark):
    """The first bucket has no trailing window (w_actual=0) and the
    second sees baseline 0 < min_baseline: neither flags."""
    from postgis_gtfs_importer_spark.operators.temporal import rate_spikes

    ev = _spike_events(spark, {0: 100})
    assert rate_spikes(ev, key_cols=["event_type"]).count() == 0
    ev2 = _spike_events(spark, {0: 0, 1: 100})  # hour 0 empty dict entry
    assert rate_spikes(ev2, key_cols=["event_type"]).count() == 0


def test_rate_spikes_validates(spark):
    from postgis_gtfs_importer_spark.operators.temporal import rate_spikes

    ev = _spike_events(spark, {0: 1})
    with pytest.raises(ValueError, match="bucket_seconds > 0"):
        rate_spikes(ev, key_cols=["event_type"], bucket_seconds=0)
    with pytest.raises(ValueError, match="positive factor"):
        rate_spikes(ev, key_cols=["event_type"], factor_num=0)


# ------------------------------------------------------ hard_negatives


def test_hard_negatives_boundary_pairs_only(spark):
    """Two tight clusters; one vector in cluster A carries cluster B's
    label (planted label noise). Its same-cell neighbors are all
    cross-label -> it dominates the output, at rank 1."""
    from postgis_gtfs_importer_spark.operators.similarity import (
        hard_negatives,
    )

    rows = []
    # ids interleave so the sampled quantizer (2 smallest ids) seeds
    # one centroid per cluster
    for j in range(6):
        for c in range(2):
            base = [0.0] * 4
            base[c * 2] = 1.0
            base[c * 2 + 1] = 0.01 * j
            rows.append((j * 2 + c, base, c))
    # plant noise: vec 8 (cluster 0 geometry) gets label 1
    rows = [
        (vid, emb, 1 if vid == 8 else lbl) for vid, emb, lbl in rows
    ]
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>, label int"
    )
    out = hard_negatives(df, k=3, n_centroids=2).collect()
    # every returned pair disagrees on label
    assert all(r["label"] != r["nbr_label"] for r in out)
    # the planted-noise vector appears both as source and as neighbor
    assert any(r["vec_id"] == 8 for r in out)
    assert any(r["nbr_id"] == 8 for r in out)
    # clean in-cluster pairs (both label 0, cluster 0) never appear
    assert not any(
        r["label"] == r["nbr_label"] for r in out
    )


def test_hard_negatives_null_labels_excluded(spark):
    from postgis_gtfs_importer_spark.operators.similarity import (
        hard_negatives,
    )

    rows = [
        (0, [1.0, 0.0], 0),
        (1, [0.99, 0.1], 1),
        (2, [0.98, 0.2], None),
    ]
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>, label int"
    )
    out = hard_negatives(df, k=2, n_centroids=1).collect()
    ids = {r["vec_id"] for r in out} | {r["nbr_id"] for r in out}
    assert 2 not in ids
    assert len(out) == 2  # 0<->1 both directions


# ------------------------------------------------------------- ktruss


def test_ktruss_peels_pendant_triangles(spark):
    """K4 (every edge in 2 triangles) with a pendant triangle glued at
    one vertex (each pendant edge in exactly 1): 4-truss keeps exactly
    the K4, and the peel must CASCADE — removing the pendant edges in
    round 1 leaves the glue edges' support intact (they were never in
    the same triangles)."""
    from postgis_gtfs_importer_spark.operators.graph import ktruss

    k4 = [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4)]
    pendant = [(4, 5), (4, 6), (5, 6)]
    edges = spark.createDataFrame(k4 + pendant, "a long, b long")
    out = ktruss(edges, k=4, max_rounds=5).collect()
    got = {(r["a"], r["b"]): r["support"] for r in out}
    assert set(got) == set(k4)
    assert all(s == 2 for s in got.values())


def test_ktruss_cascade_requires_iteration(spark):
    """A triangle CHAIN (t1 shares an edge with t2, t2 with t3): in a
    3-truss (support >= 1) everything survives; in a 4-truss
    (support >= 2) only edges in 2+ triangles survive round 1, which
    then starves the rest — the final 4-truss is EMPTY, and getting
    there takes more than one round (single-round filtering would
    leave the shared edges)."""
    from postgis_gtfs_importer_spark.operators.graph import ktruss

    chain = [
        (1, 2), (1, 3), (2, 3),   # t1
        (2, 4), (3, 4),           # t2 = (2,3,4) shares edge (2,3)
        (3, 5), (4, 5),           # t3 = (3,4,5) shares edge (3,4)
    ]
    edges = spark.createDataFrame(chain, "a long, b long")
    assert ktruss(edges, k=3, max_rounds=5).count() == len(chain)
    out4 = ktruss(edges, k=4, max_rounds=5)
    assert out4.count() == 0
    # one round is NOT enough: the shared edges (2,3) and (3,4) have
    # support 2 in the full graph and survive a single filter pass
    one_round = ktruss(edges, k=4, max_rounds=1)
    assert one_round.count() > 0


def test_ktruss_fixpoint_early_exit_is_stable(spark):
    """On an already-maximal truss, extra rounds change nothing."""
    from postgis_gtfs_importer_spark.operators.graph import ktruss

    k4 = [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4)]
    edges = spark.createDataFrame(k4, "a long, b long")
    a = sorted(map(tuple, ktruss(edges, k=4, max_rounds=1).collect()))
    b = sorted(map(tuple, ktruss(edges, k=4, max_rounds=10).collect()))
    assert a == b


def test_ktruss_validates(spark):
    from postgis_gtfs_importer_spark.operators.graph import ktruss

    edges = spark.createDataFrame([(1, 2)], "a long, b long")
    with pytest.raises(ValueError, match="k >= 3"):
        ktruss(edges, k=2)
    with pytest.raises(ValueError, match="max_rounds >= 1"):
        ktruss(edges, k=3, max_rounds=0)


# -------------------------------------------------------- dedup_spans


def test_dedup_spans_first_occurrence_wins(spark):
    from postgis_gtfs_importer_spark.operators.dedup import dedup_spans

    rows = [
        (1, "a b c d e unique one"),
        (2, "x y a b c d e tail"),
        (3, "fresh words only here now"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in dedup_spans(df, n=4).collect()}
    # doc 1 holds the global first (smallest id) — untouched
    assert out[1]["removed_tok"] == 0
    assert out[1]["kept_text"] == "a b c d e unique one"
    # doc 2 loses the merged 5-token span (two overlapping dup 4-grams)
    assert out[2]["removed_tok"] == 5
    assert out[2]["kept_text"] == "x y tail"
    assert out[3]["removed_tok"] == 0


def test_dedup_spans_within_doc_repeat(spark):
    """A doc repeating its own 4-gram keeps the first copy only."""
    from postgis_gtfs_importer_spark.operators.dedup import dedup_spans

    df = spark.createDataFrame(
        [(1, "p q r s mid p q r s")], "doc_id long, text string"
    )
    r = dedup_spans(df, n=4).collect()[0]
    assert r["n_tok"] == 9
    assert r["removed_tok"] == 4
    assert r["kept_text"] == "p q r s mid"


def test_dedup_spans_total_removal_yields_empty_text(spark):
    from postgis_gtfs_importer_spark.operators.dedup import dedup_spans

    df = spark.createDataFrame(
        [(1, "a b c d"), (2, "a b c d")], "doc_id long, text string"
    )
    out = {r["doc_id"]: r for r in dedup_spans(df, n=4).collect()}
    assert out[1]["kept_text"] == "a b c d"
    assert out[2]["kept_text"] == ""
    assert out[2]["removed_tok"] == 4


def test_dedup_spans_short_docs_pass_through(spark):
    from postgis_gtfs_importer_spark.operators.dedup import dedup_spans

    df = spark.createDataFrame(
        [(1, "too short"), (2, "too short")], "doc_id long, text string"
    )
    out = {r["doc_id"]: r for r in dedup_spans(df, n=4).collect()}
    assert all(r["removed_tok"] == 0 for r in out.values())
    assert out[2]["kept_text"] == "too short"


# ------------------------------------------------------- ccnet_buckets


def test_ccnet_terciles_are_exact_thirds_per_lang(spark):
    """9 docs in one lang with strictly ordered fluency: exactly 3
    head, 3 middle, 3 tail. Under the corpus-trained ML bigram model
    hapax bigrams score probability 1, so the doc with the MOST
    corpus-unique tokens is the most 'fluent' (the documented model
    caveat) — doc 8 is head, doc 0 tail."""
    from collections import Counter

    from postgis_gtfs_importer_spark.operators.indexing import (
        ccnet_buckets,
    )

    rows = []
    for i in range(9):
        body = ("go go " * (9 - i)) + " ".join(f"u{i}x{j}" for j in range(i + 1))
        rows.append((i, body.strip(), "en"))
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    out = {r["doc_id"]: r["bucket"] for r in ccnet_buckets(df).collect()}
    assert len(out) == 9
    assert Counter(out.values()) == {"head": 3, "middle": 3, "tail": 3}
    assert out[8] == "head" and out[0] == "tail"


def test_ccnet_buckets_are_per_language(spark):
    """Two languages with very different absolute fluency: each lang
    still gets its own head — the cross-language comparability point."""
    from postgis_gtfs_importer_spark.operators.indexing import (
        ccnet_buckets,
    )

    rows = [
        (1, "la la la la la la", "aa"),        # very fluent absolute
        (2, "la la ra ta da pa", "aa"),
        (3, "mixed words here one", "bb"),      # poor absolute fluency
        (4, "other tokens there two", "bb"),
        (5, None, "aa"),                        # unscorable: no bigram
        (6, "solo", "bb"),                      # 1 token: no bigram
        (7, "x y z w", None),                   # NULL lang excluded
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    out = {r["doc_id"]: r for r in ccnet_buckets(df).collect()}
    assert set(out) == {1, 2, 3, 4}
    # exact-thirds at n=2: head gets floor(2/3)=0 slots — each lang
    # yields one middle and one tail, INDEPENDENTLY of the other
    # lang's absolute fluency (the comparability point)
    for pair in ((1, 2), (3, 4)):
        got = sorted(out[d]["bucket"] for d in pair)
        assert got == ["middle", "tail"], (pair, got)


# --------------------------------------------------- token_budget_mix


def test_token_budget_hard_ceiling_and_determinism(spark):
    """10 docs x 10 tokens in one source, budget 35: exactly 3 docs
    (30 tokens) — the 4th would cross the ceiling. Re-runs select the
    identical set."""
    from postgis_gtfs_importer_spark.operators.curation import (
        token_budget_mix,
    )

    docs = spark.createDataFrame(
        [(i, " ".join(f"w{i}x{j}" for j in range(10)), "web")
         for i in range(10)],
        "doc_id long, text string, source string",
    )
    a = token_budget_mix(docs, {"web": 35}).collect()
    b = token_budget_mix(docs, {"web": 35}).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    assert len(a) == 3
    assert sum(r["n_tok"] for r in a) == 30


def test_token_budget_whole_source_fits_and_unbudgeted_dropped(spark):
    from postgis_gtfs_importer_spark.operators.curation import (
        token_budget_mix,
    )

    docs = spark.createDataFrame(
        [
            (1, "a b c", "web"),
            (2, "d e", "web"),
            (3, "f g h i", "code"),   # not in budgets -> dropped
            (4, "", "web"),            # zero tokens -> excluded
        ],
        "doc_id long, text string, source string",
    )
    out = token_budget_mix(docs, {"web": 100}).collect()
    assert {r["doc_id"] for r in out} == {1, 2}
    assert token_budget_mix(docs, {"web": 0}).count() == 0


def test_token_budget_incremental_prefix_stability(spark):
    """Adding MORE docs to the corpus never evicts an already-selected
    doc whose hash position sits before the old boundary — the
    incremental-pipeline property the hash order buys. (New docs can
    land BEFORE the boundary and push late picks out; docs that
    survive in the bigger corpus and existed before must be a superset
    of the re-run intersection.)"""
    from postgis_gtfs_importer_spark.operators.curation import (
        token_budget_mix,
    )

    small = [(i, "one two three four five", "web") for i in range(20)]
    big = small + [(100 + i, "six seven eight nine ten", "web")
                   for i in range(20)]
    d_small = spark.createDataFrame(
        small, "doc_id long, text string, source string"
    )
    d_big = spark.createDataFrame(
        big, "doc_id long, text string, source string"
    )
    sel_small = {r["doc_id"] for r in
                 token_budget_mix(d_small, {"web": 50}).collect()}
    sel_big = {r["doc_id"] for r in
               token_budget_mix(d_big, {"web": 50}).collect()}
    # both exactly fill 10 docs x 5 tokens
    assert len(sel_small) == 10 and len(sel_big) == 10
    # every big-corpus pick that existed in the small corpus was
    # already picked there (the hash order is a fixed global sequence)
    assert (sel_big & set(range(20))) <= sel_small


def test_token_budget_validates(spark):
    from postgis_gtfs_importer_spark.operators.curation import (
        token_budget_mix,
    )

    docs = spark.createDataFrame(
        [(1, "x", "web")], "doc_id long, text string, source string"
    )
    with pytest.raises(ValueError, match="non-empty budgets"):
        token_budget_mix(docs, {})
    with pytest.raises(ValueError, match=">= 0"):
        token_budget_mix(docs, {"web": -1})


# ------------------------------------------------------- bpe_fertility


def test_bpe_fertility_hand_computed(spark):
    """One merge ('a','b'): 'ab ab' encodes 2 words x 1 symbol-pair
    merged... verify against bpe_encode's own counts summed by lang,
    and the exact e6 ratio decomposition."""
    from postgis_gtfs_importer_spark.operators.bpe import (
        bpe_encode,
        bpe_fertility,
    )

    merges = [("a", "b")]
    rows = [
        (1, "ab ab ab", "xx"),
        (2, "cd", "xx"),
        (3, "ab", "yy"),
        (4, None, "xx"),      # zero words -> excluded
        (5, "ab", None),       # NULL lang -> excluded
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    enc = {r["doc_id"]: r for r in
           bpe_encode(df, merges, id_col="doc_id").collect()}
    out = {r["lang"]: r for r in bpe_fertility(df, merges).collect()}
    assert set(out) == {"xx", "yy"}
    xx = out["xx"]
    assert xx["n_docs"] == 2
    assert xx["n_words"] == enc[1]["n_words"] + enc[2]["n_words"]
    assert xx["n_tokens_bpe"] == enc[1]["n_tokens_bpe"] + enc[2]["n_tokens_bpe"]
    t, w = xx["n_tokens_bpe"], xx["n_words"]
    assert xx["fertility_e6"] == (t // w) * 1_000_000 + (t % w) * 1_000_000 // w


def test_bpe_fertility_ranks_languages(spark):
    """A lang whose words the merge table covers fully has lower
    fertility than one it cannot compress at all."""
    from postgis_gtfs_importer_spark.operators.bpe import bpe_fertility

    merges = [("a", "b"), ("ab", "c")]
    rows = [
        (1, "abc abc abc abc", "compressible"),
        (2, "xyz wvu qrs tuv", "opaque"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    out = {r["lang"]: r["fertility_e6"] for r in
           bpe_fertility(df, merges).collect()}
    assert out["compressible"] < out["opaque"]


# ----------------------------------------------------- trip_overtaking


def _ad_like(spark, rows):
    import datetime as dt

    base = dt.date(2024, 3, 1)
    data = [
        (t, "R1", s, dt.datetime(2024, 3, 1, 8, 0, 0)
         + dt.timedelta(seconds=sec), base)
        for (t, s, sec) in rows
    ]
    return spark.createDataFrame(
        data,
        "trip_id string, route_id string, stop_sequence long,"
        " t_departure timestamp, date date",
    )


def test_trip_overtaking_detects_strict_reversal(spark):
    """t1 leads t2 by 60s at seq 1, trails by 30s at seq 2: one
    overtake, attributed to the right pair and direction."""
    from postgis_gtfs_importer_spark.operators.derivations import (
        trip_overtaking,
    )

    ad = _ad_like(spark, [
        ("t1", 1, 0), ("t2", 1, 60),
        ("t1", 2, 330), ("t2", 2, 300),
    ])
    out = trip_overtaking(ad).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["trip_first"], r["trip_second"]) == ("t1", "t2")
    assert r["seq_from"] == 1
    assert r["lead_sec_from"] == 60 and r["deficit_sec_to"] == 30


def test_trip_overtaking_ties_assert_nothing(spark):
    """Same-second at either end is NOT an overtake (strict both
    sides), and a stable order is never flagged."""
    from postgis_gtfs_importer_spark.operators.derivations import (
        trip_overtaking,
    )

    tie_from = _ad_like(spark, [
        ("t1", 1, 0), ("t2", 1, 0),
        ("t1", 2, 400), ("t2", 2, 300),
    ])
    assert trip_overtaking(tie_from).count() == 0
    stable = _ad_like(spark, [
        ("t1", 1, 0), ("t2", 1, 60),
        ("t1", 2, 300), ("t2", 2, 360),
    ])
    assert trip_overtaking(stable).count() == 0


def test_trip_overtaking_skips_gap_positions(spark):
    """The comparison is between CONSECUTIVE positions only: a trip
    missing seq 2 contributes no (1 -> 2) comparison."""
    from postgis_gtfs_importer_spark.operators.derivations import (
        trip_overtaking,
    )

    ad = _ad_like(spark, [
        ("t1", 1, 0), ("t2", 1, 60),
        ("t2", 2, 300),                  # t1 skips seq 2
        ("t1", 3, 700), ("t2", 3, 600),
    ])
    assert trip_overtaking(ad).count() == 0


# ----------------------------------------------- closeness_centrality


def test_closeness_path_graph_hand_computed(spark):
    """Path 1-2-3-4-5, source = node 1 only: d(1,v) = v-1, so
    harmonic_e6(v) = 1e6 div (v-1); node 5 unreached within 3 rounds."""
    from postgis_gtfs_importer_spark.operators.graph import (
        closeness_centrality,
    )

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 5)], "a long, b long"
    )
    out = {r["node"]: r for r in
           closeness_centrality(edges, k_sources=1, max_rounds=3).collect()}
    assert set(out) == {2, 3, 4}
    assert out[2]["harmonic_e6"] == 1_000_000
    assert out[3]["harmonic_e6"] == 500_000
    assert out[4]["harmonic_e6"] == 333_333
    assert all(r["n_reached"] == 1 for r in out.values())


def test_closeness_multi_source_sums(spark):
    """Sources 1 and 2 on the path 1-2-3: node 3 gets 1e6/2 (from 1)
    + 1e6/1 (from 2); each source reaches the other at d=1."""
    from postgis_gtfs_importer_spark.operators.graph import (
        closeness_centrality,
    )

    edges = spark.createDataFrame([(1, 2), (2, 3)], "a long, b long")
    out = {r["node"]: r for r in
           closeness_centrality(edges, k_sources=2, max_rounds=3).collect()}
    assert out[3]["harmonic_e6"] == 500_000 + 1_000_000
    assert out[3]["n_reached"] == 2
    assert out[1]["harmonic_e6"] == 1_000_000  # from source 2
    assert out[2]["harmonic_e6"] == 1_000_000  # from source 1


def test_closeness_early_exit_matches_exhaustive(spark):
    """A triangle exhausts in 1 round; max_rounds=1 and max_rounds=10
    must agree (the parity-safe early exit)."""
    from postgis_gtfs_importer_spark.operators.graph import (
        closeness_centrality,
    )

    edges = spark.createDataFrame(
        [(1, 2), (1, 3), (2, 3)], "a long, b long"
    )
    a = sorted(map(tuple, closeness_centrality(
        edges, k_sources=3, max_rounds=1).collect()))
    b = sorted(map(tuple, closeness_centrality(
        edges, k_sources=3, max_rounds=10).collect()))
    assert a == b


def test_closeness_validates(spark):
    from postgis_gtfs_importer_spark.operators.graph import (
        closeness_centrality,
    )

    edges = spark.createDataFrame([(1, 2)], "a long, b long")
    with pytest.raises(ValueError, match="k_sources >= 1"):
        closeness_centrality(edges, k_sources=0)
    with pytest.raises(ValueError, match="max_rounds >= 1"):
        closeness_centrality(edges, max_rounds=0)


# ------------------------------------------------------ kmv_set_overlap


def test_kmv_overlap_exact_below_k(spark):
    """Sets small enough that the sketches are exhaustive: Jaccard,
    union and intersection are EXACT. A = {u0..u9}, B = {u5..u14}:
    |A∪B| = 15, |A∩B| = 5, J = 1/3."""
    from postgis_gtfs_importer_spark.operators.sketches import (
        kmv_set_overlap,
    )

    rows = [("A", f"u{i}") for i in range(10)]
    rows += [("B", f"u{i}") for i in range(5, 15)]
    df = spark.createDataFrame(rows, "event_type string, user_id string")
    out = kmv_set_overlap(df, "event_type", "user_id", k=64).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["set_a"], r["set_b"]) == ("A", "B")
    assert r["n_union_keys"] == 15 and r["est_union"] == 15
    assert r["n_both"] == 5
    assert r["jaccard_e6"] == 5 * 1_000_000 // 15
    assert r["est_intersection"] == 5


def test_kmv_overlap_disjoint_and_identical(spark):
    from postgis_gtfs_importer_spark.operators.sketches import (
        kmv_set_overlap,
    )

    rows = [("A", f"x{i}") for i in range(8)]
    rows += [("B", f"y{i}") for i in range(8)]
    rows += [("C", f"x{i}") for i in range(8)]  # identical to A
    df = spark.createDataFrame(rows, "event_type string, user_id string")
    out = {(r["set_a"], r["set_b"]): r for r in
           kmv_set_overlap(df, "event_type", "user_id", k=64).collect()}
    assert out[("A", "B")]["jaccard_e6"] == 0
    assert out[("A", "B")]["est_intersection"] == 0
    assert out[("A", "C")]["jaccard_e6"] == 1_000_000
    assert out[("A", "C")]["est_intersection"] == 8
    assert len(out) == 3  # all unordered pairs


def test_kmv_overlap_estimate_quality_above_k(spark):
    """2000-element sets with 50% true overlap, k=64: the Jaccard
    estimate lands within the published ~1/sqrt(k) band (generous
    3-sigma check), and union/intersection scale accordingly."""
    from postgis_gtfs_importer_spark.operators.sketches import (
        kmv_set_overlap,
    )

    rows = [("A", f"u{i}") for i in range(2000)]
    rows += [("B", f"u{i}") for i in range(1000, 3000)]
    df = spark.createDataFrame(rows, "event_type string, user_id string")
    r = kmv_set_overlap(df, "event_type", "user_id", k=64).collect()[0]
    true_j = 1000 / 3000
    assert abs(r["jaccard_e6"] / 1e6 - true_j) < 3 / (64 ** 0.5)
    assert 1500 < r["est_union"] < 4500


# ----------------------------------------------- mixture_concentration


def test_mixture_concentration_hand_computed(spark):
    """Group 'en': sources 3:1 -> entropy = ln4 - (3ln3)/4, HHI =
    (750000^2 + 250000^2)/1e6 = 625000. Group 'de': single source ->
    entropy 0, HHI exactly 1e6."""
    import math

    from postgis_gtfs_importer_spark.operators.profiling import (
        mixture_concentration,
    )

    rows = (
        [(i, "en", "web") for i in range(3)]
        + [(3, "en", "code")]
        + [(4, "de", "web"), (5, "de", "web")]
        + [(6, None, "web"), (7, "fr", None)]
    )
    df = spark.createDataFrame(rows, "doc_id long, lang string, source string")
    out = {r["lang"]: r for r in
           mixture_concentration(df, "lang", "source").collect()}
    assert set(out) == {"en", "de"}
    en = out["en"]
    assert en["n_rows"] == 4 and en["n_categories"] == 2
    want = math.floor((math.log(4.0) - (3.0 * math.log(3.0)) / 4.0)
                      * 1_000_000 + 0.5)
    assert en["entropy_e6"] == want
    assert en["hhi_e6"] == (750_000**2 + 250_000**2) // 1_000_000
    de = out["de"]
    assert de["entropy_e6"] == 0 and de["hhi_e6"] == 1_000_000


def test_mixture_concentration_uniform_maximizes_entropy(spark):
    """Uniform over 4 sources: entropy = ln 4, HHI = 250000 exactly
    (4 x 250000^2 / 1e6)."""
    import math

    from postgis_gtfs_importer_spark.operators.profiling import (
        mixture_concentration,
    )

    rows = [(i, "en", f"s{i % 4}") for i in range(8)]
    df = spark.createDataFrame(rows, "doc_id long, lang string, source string")
    r = mixture_concentration(df, "lang", "source").collect()[0]
    assert r["entropy_e6"] == math.floor(math.log(4.0) * 1e6 + 0.5)
    assert r["hhi_e6"] == 4 * 250_000**2 // 1_000_000


# --------------------------------------------------- canonical_by_quality


def test_canonical_election_highest_score_wins(spark):
    from postgis_gtfs_importer_spark.operators.dedup import (
        canonical_by_quality,
    )

    clusters = spark.createDataFrame(
        [(1, 100), (2, 100), (3, 100), (7, 200), (8, 200)],
        "id long, component long",
    )
    scores = spark.createDataFrame(
        [(1, 10), (2, 99), (3, 50), (7, 5), (8, 5)], "id long, score long"
    )
    out = {r["id"]: r for r in
           canonical_by_quality(clusters, scores).collect()}
    assert all(out[i]["canonical_id"] == 2 for i in (1, 2, 3))
    assert out[2]["is_canonical"] is True
    assert out[1]["is_canonical"] is False
    # tie in cluster 200 -> smallest id wins
    assert out[7]["canonical_id"] == 7 and out[8]["canonical_id"] == 7


def test_canonical_election_null_scores_cannot_win(spark):
    from postgis_gtfs_importer_spark.operators.dedup import (
        canonical_by_quality,
    )

    clusters = spark.createDataFrame(
        [(1, 100), (2, 100)], "id long, component long"
    )
    scores = spark.createDataFrame(
        [(2, None)], "id long, score long"
    )  # id 1 unscored (absent), id 2 NULL score
    out = {r["id"]: r for r in
           canonical_by_quality(clusters, scores).collect()}
    # nobody has a score: smallest id wins deterministically
    assert out[1]["canonical_id"] == 1 and out[2]["canonical_id"] == 1
    # a scored member beats any unscored one
    scores2 = spark.createDataFrame([(2, 1)], "id long, score long")
    out2 = {r["id"]: r for r in
            canonical_by_quality(clusters, scores2).collect()}
    assert out2[1]["canonical_id"] == 2


# ---------------------------------------------------------- psi_drift


def test_psi_identical_distribution_near_zero(spark):
    """A group whose distribution IS the global one scores ~0 (tiny
    smoothing residue only)."""
    from postgis_gtfs_importer_spark.operators.profiling import psi_drift

    rows = []
    for g in ("a", "b"):
        rows += [(g, float(i % 10)) for i in range(200)]
    df = spark.createDataFrame(rows, "event_type string, value double")
    out = {r["event_type"]: r for r in
           psi_drift(df, "event_type", "value").collect()}
    for r in out.values():
        assert abs(r["psi_e6"]) < 1000  # < 0.001 PSI


def test_psi_shifted_group_scores_high(spark):
    """Group 'hot' concentrated in the top bucket vs a uniform rest:
    PSI well above the 0.25 action threshold."""
    from postgis_gtfs_importer_spark.operators.profiling import psi_drift

    rows = [("base", float(i % 10)) for i in range(500)]
    rows += [("hot", 9.0) for _ in range(100)]
    df = spark.createDataFrame(rows, "event_type string, value double")
    out = {r["event_type"]: r for r in
           psi_drift(df, "event_type", "value").collect()}
    assert out["hot"]["psi_e6"] > 250_000
    assert out["hot"]["n_rows"] == 100
    # the global is the 500/100 mixture, so even 'base' drifts from it
    # a little — but far less than the concentrated group
    assert out["base"]["psi_e6"] < out["hot"]["psi_e6"] // 2


def test_psi_degenerate_span_and_validation(spark):
    from postgis_gtfs_importer_spark.operators.profiling import psi_drift

    const = spark.createDataFrame(
        [("a", 5.0), ("b", 5.0)], "event_type string, value double"
    )
    out = psi_drift(const, "event_type", "value").collect()
    # everything lands in bucket 0 on both sides; the only PSI is the
    # Laplace-smoothing residue of n=1 vs N=2 sample sizes — tiny,
    # identical for the two symmetric groups, and NOT a crash
    vals = {r["psi_e6"] for r in out}
    assert len(vals) == 1
    assert 0 <= vals.pop() < 50_000
    with pytest.raises(ValueError, match="n_buckets >= 2"):
        psi_drift(const, "event_type", "value", n_buckets=1)


# ----------------------------------------------------------- ab_lift_ci


def test_ab_lift_exact_means_and_paired_replay(spark):
    """Constant values per arm: every resample mean is the constant
    (weights cancel), so the whole CI collapses to the exact diff —
    the analytic invariant no approximate path satisfies."""
    from postgis_gtfs_importer_spark.operators.scoring import ab_lift_ci

    rows = [(f"c{i}", "A", 10.0) for i in range(50)]
    rows += [(f"t{i}", "B", 12.5) for i in range(50)]
    df = spark.createDataFrame(rows, "event_id string, variant string, value double")
    r = ab_lift_ci(df, "variant", "value", "event_id", "A", "B").collect()[0]
    assert r["n_control"] == 50 and r["n_treatment"] == 50
    assert r["mean_control_c"] == 1000 and r["mean_treatment_c"] == 1250
    assert r["diff_c"] == 250
    assert r["boot_lo_c"] == r["boot_med_c"] == r["boot_hi_c"] == 250
    assert r["n_boot"] == 16


def test_ab_lift_empty_arm_is_null_not_fabricated(spark):
    from postgis_gtfs_importer_spark.operators.scoring import ab_lift_ci

    df = spark.createDataFrame(
        [("e1", "A", 5.0)], "event_id string, variant string, value double"
    )
    r = ab_lift_ci(df, "variant", "value", "event_id", "A", "B").collect()[0]
    assert r["n_treatment"] == 0
    assert r["diff_c"] is None and r["boot_med_c"] is None


def test_ab_lift_other_variants_excluded(spark):
    from postgis_gtfs_importer_spark.operators.scoring import ab_lift_ci

    rows = [("a", "A", 1.0), ("b", "B", 2.0), ("x", "C", 99.0)]
    df = spark.createDataFrame(rows, "event_id string, variant string, value double")
    r = ab_lift_ci(df, "variant", "value", "event_id", "A", "B").collect()[0]
    assert r["n_control"] == 1 and r["n_treatment"] == 1


def test_ab_lift_ci_brackets_true_diff(spark):
    """Noisy arms with a real +1.0 lift: the bootstrap CI brackets the
    point diff and is ordered lo <= med <= hi."""
    from postgis_gtfs_importer_spark.operators.scoring import ab_lift_ci

    rows = [(f"c{i}", "A", float(i % 7)) for i in range(400)]
    rows += [(f"t{i}", "B", float(i % 7) + 1.0) for i in range(400)]
    df = spark.createDataFrame(rows, "event_id string, variant string, value double")
    r = ab_lift_ci(df, "variant", "value", "event_id", "A", "B").collect()[0]
    assert r["boot_lo_c"] <= r["boot_med_c"] <= r["boot_hi_c"]
    assert r["boot_lo_c"] <= r["diff_c"] <= r["boot_hi_c"]
    assert 50 <= r["diff_c"] <= 150  # cents: true lift 100
