"""Unit tests for the ML featurizer and multimodal plumbing."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from financial_market_data_analysis_spark.ml import (
    sliding_window_vectors,
    train_target_classifier,
)
from financial_market_data_analysis_spark.operators.multimodal import (
    extract_features,
    fake_decode_features,
    frame_sample,
    media_from_documents,
)
from financial_market_data_analysis_spark.operators.windows import indicator_suite
from financial_market_data_analysis_spark.plans.candles import candles_from_events
from financial_market_data_analysis_spark.sources.batch import load_table

from conftest import SF_SMOKE


def test_sliding_window_vectors_shape(spark):
    c = candles_from_events(load_table(spark, "events", SF_SMOKE))
    out = sliding_window_vectors(
        c, ["close", "volume"], window=5, order_cols=["bucket_start"]
    )
    rows = out.select("window_features").limit(3).collect()
    assert all(len(r.window_features) == 10 for r in rows)  # 5 steps × 2 feats
    # full-window filter drops exactly window-1 warm-up rows
    assert out.count() == c.count() - 4


def test_sliding_window_time_major_order(spark):
    df = spark.createDataFrame(
        [(i, float(i)) for i in range(1, 6)], ["t", "v"]
    )
    out = sliding_window_vectors(df, ["v"], window=3, order_cols=["t"])
    got = {r.t: r.window_features for r in out.collect()}
    assert got[3] == [1.0, 2.0, 3.0]
    assert got[5] == [3.0, 4.0, 5.0]


def test_train_target_classifier_runs(spark):
    c = candles_from_events(load_table(spark, "events", SF_SMOKE))
    bars = indicator_suite(c, ["bucket_start"])
    feats = ["close", "volume", "price_MA20", "ATR", "stoch"]
    _, train, test, metrics = train_target_classifier(bars, feats)
    m = metrics.collect()[0]
    assert 0.0 <= m.accuracy <= 1.0
    assert m.n_test > 0
    # time split: every test bucket after every train bucket
    assert (
        train.agg(F.max("bucket_start")).collect()[0][0]
        <= test.agg(F.min("bucket_start")).collect()[0][0]
    )


def test_train_window_classifier_runs(spark):
    """ml5 — the biGRU-analog MLP over the flattened 5-bar window must
    train, score the held-out time slice, and respect the time split;
    its input width must equal window × n_features."""
    from financial_market_data_analysis_spark.ml import train_window_classifier

    c = candles_from_events(load_table(spark, "events", SF_SMOKE))
    bars = indicator_suite(c, ["bucket_start"])
    feats = ["close", "volume", "price_MA20", "ATR"]
    model, train, test, metrics = train_window_classifier(
        bars, feats, window=5, hidden=(8,), max_iter=20
    )
    m = metrics.collect()[0]
    assert 0.0 <= m.accuracy <= 1.0 and m.n_test > 0
    assert (
        train.agg(F.max("bucket_start")).collect()[0][0]
        <= test.agg(F.min("bucket_start")).collect()[0][0]
    )
    mlp = model.stages[-1]
    assert mlp.getLayers()[0] == 5 * len(feats)
    # deterministic re-fit: same seed, same weights
    model2, _, _, _ = train_window_classifier(
        bars, feats, window=5, hidden=(8,), max_iter=20
    )
    import numpy as np

    assert np.allclose(
        np.array(model.stages[-1].weights),
        np.array(model2.stages[-1].weights),
    )


def test_ml2_seeded_fit_accuracy_is_stable(spark):
    """ml2 is rows-only in the driver contract (an LR fit is not
    SQL-expressible), so a silent MLlib regression could hide behind
    "rows=1". Bound that blind spot (r6 verdict #3): on the frozen
    sf0.001 fixture the seeded fit is fully deterministic — two
    independent fits must produce the IDENTICAL ordered prediction
    vector, and the held-out accuracy must sit in a tight band around
    the recorded value (0.70745, 133/188 — re-derive with
    tools/verify_contract.py's fixture if the testdata ever changes).
    The band is wide enough for legitimate cross-version float drift
    yet far above the ~0.5 a broken scaler/assembler would score."""
    c = candles_from_events(load_table(spark, "events", SF_SMOKE))
    bars = indicator_suite(c, ["bucket_start"])
    feats = [
        "close", "volume", "vol_MA6", "vol_MA20", "price_MA20",
        "upper_BB_dist", "lower_BB_dist", "stoch", "price_change", "ATR",
    ]
    model_a, _, test_a, metrics_a = train_target_classifier(bars, feats)
    model_b, _, test_b, _ = train_target_classifier(bars, feats)
    pred_a = [
        r.prediction
        for r in model_a.transform(test_a)
        .select("bucket_start", "prediction").orderBy("bucket_start").collect()
    ]
    pred_b = [
        r.prediction
        for r in model_b.transform(test_b)
        .select("bucket_start", "prediction").orderBy("bucket_start").collect()
    ]
    assert pred_a == pred_b
    m = metrics_a.collect()[0]
    assert m.n_test == 188
    assert abs(m.accuracy - 0.70745) < 0.05, m.accuracy


def test_ml5_seeded_fit_accuracy_is_stable(spark):
    """Same blind-spot bound for ml5's windowed-MLP fit (r6 verdict
    #3): identical prediction vector across two seeded fits and
    accuracy pinned near the recorded 0.73262 (137/187) on the frozen
    sf0.001 fixture — default hyperparameters, i.e. exactly what
    q_ml_window_mlp runs."""
    from financial_market_data_analysis_spark.ml import train_window_classifier

    c = candles_from_events(load_table(spark, "events", SF_SMOKE))
    bars = indicator_suite(c, ["bucket_start"])
    feats = ["close", "volume", "vol_MA6", "price_MA20", "ATR"]
    model_a, _, test_a, metrics_a = train_window_classifier(bars, feats)
    model_b, _, test_b, _ = train_window_classifier(bars, feats)
    pred_a = [
        r.prediction
        for r in model_a.transform(test_a)
        .select("bucket_start", "prediction").orderBy("bucket_start").collect()
    ]
    pred_b = [
        r.prediction
        for r in model_b.transform(test_b)
        .select("bucket_start", "prediction").orderBy("bucket_start").collect()
    ]
    assert pred_a == pred_b
    m = metrics_a.collect()[0]
    assert m.n_test == 187
    assert abs(m.accuracy - 0.73262) < 0.05, m.accuracy


def test_mllib_scoring_matches_closed_form(spark):
    """MLlib's LogisticRegressionModel.transform must agree with the
    closed-form ``sigmoid(coef·x + intercept)`` computed from the
    fitted model's own coefficients — the semantics ml3's
    fixed-coefficient oracle checks cross-engine (training itself
    stays rows-only in ml2; this pins the SCORING half to MLlib)."""
    import numpy as np

    c = candles_from_events(load_table(spark, "events", SF_SMOKE))
    bars = indicator_suite(c, ["bucket_start"])
    feats = ["close", "volume", "price_MA20", "ATR", "stoch"]
    model, _, test, _ = train_target_classifier(bars, feats)
    pred = model.transform(test).select("features", "probability").limit(50).collect()
    lr = model.stages[-1]
    coef = np.array(lr.coefficients)
    b = lr.intercept
    for r in pred:
        p_mllib = float(r.probability[1])
        p_closed = 1.0 / (1.0 + np.exp(-(float(np.dot(coef, r.features)) + b)))
        assert abs(p_mllib - p_closed) < 1e-9


def test_fake_decode_deterministic():
    a = fake_decode_features(b"hello")
    b = fake_decode_features(b"hello")
    assert a == b and len(a) == 8
    assert all(0 <= v <= 32 for v in a)


def test_extract_features_batch_contract(spark):
    media = media_from_documents(load_table(spark, "documents", SF_SMOKE))
    out = extract_features(media)
    rows = out.limit(5).collect()
    assert all(len(r.features) == 8 for r in rows)
    assert out.count() == media.count()


def test_extract_features_real_decoder_stubbed(spark):
    media = media_from_documents(load_table(spark, "documents", SF_SMOKE))
    with pytest.raises(NotImplementedError):
        extract_features(media, decoder="real")


def test_frame_sample_grid(spark):
    media = media_from_documents(load_table(spark, "documents", SF_SMOKE))
    frames = frame_sample(media, every_ms=1000)
    one = (
        media.filter(F.col("kind") == "video")
        .select("media_id", "duration_ms")
        .limit(1)
        .collect()[0]
    )
    n = frames.filter(F.col("media_id") == one.media_id).count()
    assert n == one.duration_ms // 1000 + 1


def test_kmeans_lloyd_converges_to_cluster_means(spark):
    """Two well-separated clusters with seeds one-per-cluster: after 2
    Lloyd iterations each centroid must equal its cluster's element-wise
    mean (rounded), with the right member counts; a seed that captures
    no vectors must drop out (cells can only shrink)."""
    from financial_market_data_analysis_spark.operators.similarity import (
        kmeans_lloyd,
    )

    a = [[1.0, 0.0, 0.0, 0.1], [1.0, 0.1, 0.0, 0.0], [0.9, 0.0, 0.1, 0.0]]
    b = [[0.0, 1.0, 0.2, 0.0], [0.0, 0.9, 0.0, 0.1]]
    rows = [(i, v) for i, v in enumerate(a + b)]
    corpus = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    # seeds: one in each cluster, plus an orthogonal decoy that wins no
    # vectors — it must DROP OUT, not survive as a NaN centroid
    seeds = spark.createDataFrame(
        [(0, a[0]), (3, b[0]), (9, [0.0, 0.0, 0.0, -1.0])],
        "centroid_id long, embedding array<float>",
    )
    got = {
        r.centroid_id: (r.n_assigned, [round(x, 6) for x in r.embedding])
        for r in kmeans_lloyd(corpus, seeds, n_iter=2, dim=4).collect()
    }
    assert set(got) == {0, 3}  # the member-less seed 9 dropped out
    assert got[0][0] == 3 and got[3][0] == 2
    mean_a = [round(sum(v[j] for v in a) / 3, 6) for j in range(4)]
    mean_b = [round(sum(v[j] for v in b) / 2, 6) for j in range(4)]
    assert got[0][1] == pytest.approx(mean_a, abs=2e-6)
    assert got[3][1] == pytest.approx(mean_b, abs=2e-6)


def test_gaussian_bucket_dim_guard(spark):
    """A vector whose length differs from the plane dim must raise, not
    silently land in the all-zeros bucket (r2 advice)."""
    from pyspark.errors.exceptions.captured import SparkRuntimeException

    from financial_market_data_analysis_spark.operators.similarity import (
        hyperplane_bucket_gaussian,
    )

    bad = spark.createDataFrame([([1.0, 2.0, 3.0],)], ["embedding"])
    with pytest.raises(SparkRuntimeException, match="embedding dim"):
        bad.select(hyperplane_bucket_gaussian("embedding", dim=64)).collect()


def test_gaussian_plane_dot_margin(spark):
    """Engine/oracle bucket parity relies on identical IEEE sums; a
    plane dot within a few ULPs of 0 could flip its sign bit under a
    different summation order. Assert the fixture data keeps a real
    margin from 0 so a future parity break is diagnosable (r2 advice)."""
    from financial_market_data_analysis_spark.operators.similarity import (
        dot_expr,
        gaussian_planes,
    )

    emb = load_table(spark, "embeddings", SF_SMOKE)
    planes = gaussian_planes(8, 64, seed=7)
    dots = [
        F.abs(dot_expr("embedding", F.array(*[F.lit(float(v)) for v in p])))
        for p in planes
    ]
    min_abs = emb.select(F.least(*dots).alias("m")).agg(F.min("m")).collect()[0][0]
    assert min_abs > 1e-9, f"plane dot too close to 0: {min_abs}"


def test_audio_frames_grid(spark):
    from financial_market_data_analysis_spark.operators.multimodal import audio_frames

    media = spark.createDataFrame(
        [(1, "audio", 100), (2, "audio", 24), (3, "video", 500)],
        "media_id long, kind string, duration_ms int",
    )
    rows = audio_frames(media).collect()
    # 100ms clip at 25/10 → 8 frames starting 0..70; sub-frame clip and
    # non-audio rows yield nothing
    assert {r.media_id for r in rows} == {1}
    assert [(r.frame_idx, r.start_ms) for r in sorted(rows, key=lambda r: r.frame_idx)] == [
        (i, i * 10) for i in range(8)
    ]


def test_resize_geometry_letterbox(spark):
    from financial_market_data_analysis_spark.operators.multimodal import (
        resize_geometry,
    )

    media = spark.createDataFrame(
        [(1, "image", 640, 480), (2, "image", 100, 400), (3, "image", 0, 10)],
        "media_id long, kind string, width int, height int",
    )
    out = {r.media_id: r for r in resize_geometry(media).collect()}
    assert 3 not in out  # degenerate dims filtered
    assert (out[1].out_w, out[1].out_h, out[1].pad_x, out[1].pad_y) == (224, 168, 0, 28)
    assert (out[2].out_w, out[2].out_h, out[2].pad_x, out[2].pad_y) == (56, 224, 84, 0)


def test_model_save_load_round_trip(spark, tmp_path):
    """The fitted pipeline must survive save → load with identical
    predictions — the deployability contract between the training job
    and the streaming-inference hook (which would load the model from
    shared storage on a real cluster)."""
    from pyspark.ml import PipelineModel

    c = candles_from_events(load_table(spark, "events", SF_SMOKE))
    bars = indicator_suite(c, ["bucket_start"])
    feats = ["close", "volume", "price_MA20", "ATR", "stoch"]
    model, _, test, _ = train_target_classifier(bars, feats)
    path = str(tmp_path / "model")
    model.write().overwrite().save(path)
    loaded = PipelineModel.load(path)
    orig = model.transform(test).select("bucket_start", "prediction")
    redo = loaded.transform(test).select("bucket_start", "prediction")
    assert orig.exceptAll(redo).count() == 0
    assert orig.count() == redo.count() > 0


def test_frame_fingerprint_pairs_finds_shared_segments(spark):
    """x59 core: two payloads sharing a long byte run pair up; the
    overlap ratio is shared/min and a disjoint payload pairs with
    nothing."""
    from financial_market_data_analysis_spark.plans.extensions import (
        frame_fingerprint_pairs,
    )

    shared = b"A" * 31 + bytes(range(64)) + b"B" * 31
    rows = [
        (1, shared),
        (2, shared + b"tail-only-in-two" * 4),
        (3, bytes(range(128, 254)) * 2),  # disjoint content
    ]
    media = spark.createDataFrame(rows, "media_id long, payload binary")
    out = {
        (r.media_a, r.media_b): (r.n_shared, r.overlap_ratio)
        for r in frame_fingerprint_pairs(
            media, frame_bytes=32, hop_bytes=16, min_shared=2, hot_cap=50
        ).collect()
    }
    assert (1, 2) in out
    n_shared, ratio = out[(1, 2)]
    assert n_shared >= 2
    # asset 1 is the smaller side and is a strict prefix of asset 2,
    # so every one of its windows is shared
    assert ratio == 1.0
    assert not any(3 in pair for pair in out)


def test_frame_fingerprint_hot_frame_guard(spark):
    """The hot-frame guard is the quadratic-blowup bound: a segment
    present in MORE than hot_cap assets must mint no pairs (with the
    cap raised, the same data pairs every asset against every other —
    the explosion the guard exists to stop)."""
    from financial_market_data_analysis_spark.plans.extensions import (
        frame_fingerprint_pairs,
    )

    ubiquitous = b"\x00" * 64  # same leading segment in every asset
    rows = [
        (i, ubiquitous + f"unique-tail-{i:04d}-".encode() * 3)
        for i in range(12)
    ]
    media = spark.createDataFrame(rows, "media_id long, payload binary")
    guarded = frame_fingerprint_pairs(
        media, frame_bytes=32, hop_bytes=16, min_shared=1, hot_cap=10
    )
    assert guarded.count() == 0
    unguarded = frame_fingerprint_pairs(
        media, frame_bytes=32, hop_bytes=16, min_shared=1, hot_cap=1000
    )
    assert unguarded.count() == 12 * 11 // 2


def test_x59_oracle_ascii_assumption(spark):
    """frame_dedup_oracle windows VARCHAR text by CHARACTERS while the
    engine windows the binary payload by BYTES (DuckDB has no blob
    substr, so a byte-based oracle is inexpressible — r7 advice).
    Parity is sound only while the fixture text is pure ASCII; fail
    LOUDLY here the moment a fixture change breaks that, instead of
    letting x59 silently diverge at the driver gate."""
    from pyspark.sql import functions as F

    from conftest import SF_SMOKE
    from financial_market_data_analysis_spark.plans.extensions import (
        docs_augmented,
    )

    aug = docs_augmented(spark, SF_SMOKE)
    non_ascii = aug.filter(
        F.octet_length("text") != F.length("text")
    ).count()
    assert non_ascii == 0, (
        f"{non_ascii} non-ASCII docs: the x59 char-based DuckDB oracle "
        "no longer matches the byte-based engine; regenerate or filter"
    )


def test_pq_codes_are_argmin_assignments(spark):
    """x70 kernel on a hand-built case: with centroids at known
    positions, every subvector must be coded as its true nearest
    centroid (L2, ties to the lowest id), and the ADC distance of a
    vector exactly equal to a centroid in every subspace is 0."""
    from pyspark.sql import functions as F

    from financial_market_data_analysis_spark.plans.extensions import (
        CENTROID_MOD,
        q_pq_adc_recall,  # noqa: F401  (import proves wiring)
    )

    # two centroid rows (vec_id 0 and CENTROID_MOD are % CENTROID_MOD == 0)
    c0 = [0.0] * 64
    c1 = [1.0] * 64
    near_c1 = [0.9] * 64
    rows = [(0, c0, 0), (CENTROID_MOD, c1, 0), (7, near_c1, 0)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    # reproduce the code-assignment fragment: slice into 8 subvectors,
    # nearest centroid per slice
    from financial_market_data_analysis_spark.plans.extensions import (
        PQ_M,
        PQ_SUBDIM,
    )

    emb = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    sub = F.explode(
        F.array(*[
            F.struct(F.lit(m).alias("m"),
                     F.slice(emb, m * PQ_SUBDIM + 1, PQ_SUBDIM).alias("sv"))
            for m in range(PQ_M)
        ])
    ).alias("s")
    corpus = df.select("vec_id", sub).select(
        "vec_id", F.col("s.m").alias("m"), F.col("s.sv").alias("sv")
    )
    cents = df.filter(F.col("vec_id") % CENTROID_MOD == 0).select(
        F.col("vec_id").alias("cid"), sub
    ).select("cid", F.col("s.m").alias("m"), F.col("s.sv").alias("csv"))

    def l2(a, b):
        return F.aggregate(
            F.zip_with(F.col(a), F.col(b), lambda x, y: (x - y) * (x - y)),
            F.lit(0.0), lambda acc, v: acc + v,
        )

    from pyspark.sql import Window

    w = Window.partitionBy("vec_id", "m").orderBy("d", "cid")
    codes = (
        corpus.join(F.broadcast(cents), "m")
        .withColumn("d", l2("sv", "csv"))
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select("vec_id", "m", "cid")
        .collect()
    )
    by_vec = {}
    for r in codes:
        by_vec.setdefault(r.vec_id, set()).add(r.cid)
    assert by_vec[0] == {0}                      # centroid codes itself
    assert by_vec[CENTROID_MOD] == {CENTROID_MOD}
    assert by_vec[7] == {CENTROID_MOD}           # 0.9 is nearer to 1.0


# --------------------------------------------------------------------
# REAL in-container decode tier: WAV-PCM + netpbm (no PIL/ffmpeg)
# --------------------------------------------------------------------


def _pnm_payload(w, h, c, value=None):
    import numpy as np

    from financial_market_data_analysis_spark.operators.multimodal import encode_pnm

    if value is None:
        arr = (np.arange(w * h * c, dtype=np.int64) % 251).astype(np.uint8)
    else:
        arr = np.full((h, w, c), value, dtype=np.uint8)
    return encode_pnm(arr.reshape(h, w, c))


def _wav_payload(n_frames=100, sr=8000, nch=2, amp=1000):
    import numpy as np

    from financial_market_data_analysis_spark.operators.multimodal import (
        encode_wav_pcm16,
    )

    sq = np.tile(
        np.array([[amp, -amp], [-amp, amp]], np.int16)[:, :nch], (n_frames // 2, 1)
    )
    return encode_wav_pcm16(sq, sr)


def _media_df(spark, rows):
    from pyspark.sql.types import (
        BinaryType,
        LongType,
        StructField,
        StructType,
    )

    schema = StructType(
        [StructField("media_id", LongType()), StructField("payload", BinaryType())]
    )
    return spark.createDataFrame(rows, schema)


def test_decode_media_real_wav_and_pnm(spark):
    """Real decode end-to-end on Spark: stdlib-WAV and numpy-netpbm
    payloads decode inside the mapInPandas kernel; metadata and the
    all-integer feature vector are exact."""
    from financial_market_data_analysis_spark.operators.multimodal import decode_media

    media = _media_df(
        spark,
        [
            (1, _pnm_payload(3, 2, 3)),
            (2, _wav_payload(n_frames=100, sr=8000, nch=2, amp=1000)),
            (3, _pnm_payload(5, 4, 1, value=200)),
        ],
    )
    out = {r.media_id: r for r in decode_media(media).collect()}
    assert out[1].format == "pnm" and (out[1].width, out[1].height, out[1].channels) == (3, 2, 3)
    # constant-200 grayscale: mean-permille = 200*1000//255 = 784, all bright
    assert out[3].features == [5, 4, 1, 784, 200, 200, 1000, 0]
    w = out[2]
    assert w.format == "wav" and w.sample_rate == 8000 and w.n_samples == 100
    assert w.duration_ms == 12 and w.channels == 2
    # alternating ±1000 square: peak 1000, rms-permille 1000*1000//32768=30,
    # a sign flip between every adjacent frame pair (99), audio marker 1
    assert w.features == [8000, 100, 2, 12, 1000, 30, 99, 1]


def test_decode_media_mixed_corpus_accounts_boundary_formats(spark):
    """strict=False (the 100 TB default): entropy-coded payloads emit a
    typed null-metric row with the sniffed format instead of killing
    the job — the corpus' undecodable tail is accounted, not fatal."""
    from financial_market_data_analysis_spark.operators.multimodal import decode_media

    media = _media_df(
        spark,
        [
            (1, _pnm_payload(2, 2, 3)),
            (2, b"\x89PNG\r\n\x1a\n" + b"\x00" * 32),
            (3, b"\xff\xd8\xff\xe0" + b"\x00" * 32),
            (4, b"not media at all"),
        ],
    )
    rows = {r.media_id: r for r in decode_media(media, strict=False).collect()}
    assert rows[1].format == "pnm" and rows[1].features is not None
    assert rows[2].format == "png" and rows[2].features is None and rows[2].width is None
    assert rows[3].format == "jpeg" and rows[3].features is None
    assert rows[4].format == "unknown" and rows[4].features is None
    by_fmt = (
        decode_media(media, strict=False)
        .groupBy("format")
        .count()
        .rdd.collectAsMap()
    )
    assert by_fmt == {"pnm": 1, "png": 1, "jpeg": 1, "unknown": 1}


def test_decode_media_strict_raises_boundary_in_kernel(spark):
    """strict=True surfaces the documented NotImplementedError boundary
    from inside the Arrow kernel (Spark wraps it as a PythonException)."""
    from financial_market_data_analysis_spark.operators.multimodal import decode_media

    media = _media_df(spark, [(1, b"\x89PNG\r\n\x1a\n" + b"\x00" * 16)])
    with pytest.raises(Exception, match="NotImplementedError|entropy-coded"):
        decode_media(media, strict=True).collect()


def test_resize_images_matches_resize_geometry_plan(spark):
    """The real numpy letterbox kernel and the declarative
    resize_geometry plan publish IDENTICAL integer geometry, and the
    resampled raster has the promised shape with zero-valued pads."""
    import numpy as np

    from financial_market_data_analysis_spark.operators.multimodal import (
        resize_geometry,
        resize_images,
    )

    dims = [(6, 4), (4, 6), (224, 224), (17, 3), (1000, 10)]
    media = _media_df(
        spark,
        [(i, _pnm_payload(w, h, 3, value=7)) for i, (w, h) in enumerate(dims)],
    )
    real = {r.media_id: r for r in resize_images(media, 224, 224).collect()}

    geo_in = media.selectExpr("media_id", "'image' as kind").join(
        spark.createDataFrame(
            [(i, w, h) for i, (w, h) in enumerate(dims)],
            ["media_id", "width", "height"],
        ),
        "media_id",
    )
    plan = {r.media_id: r for r in resize_geometry(geo_in, 224, 224).collect()}
    assert set(real) == set(plan) == set(range(len(dims)))
    for i in real:
        assert (real[i].out_w, real[i].out_h, real[i].pad_x, real[i].pad_y) == (
            plan[i].out_w,
            plan[i].out_h,
            plan[i].pad_x,
            plan[i].pad_y,
        ), f"geometry diverged for media {i}"
        canvas = np.frombuffer(real[i].pixels, np.uint8).reshape(224, 224, 3)
        r = real[i]
        body = canvas[r.pad_y : r.pad_y + r.out_h, r.pad_x : r.pad_x + r.out_w]
        assert (body == 7).all()
        assert int((canvas == 7).all(axis=2).sum()) == r.out_w * r.out_h


def test_audio_frame_features_real_decode_exact(spark):
    """Per-frame features computed from REAL WAV decode: a clip whose
    first half is an alternating ±1000 square and second half silence
    yields exact per-frame peak/rms/zero-crossing rows on the standard
    framing grid, and that grid matches the declarative audio_frames
    plan frame-for-frame when the metadata duration equals the real
    one."""
    import numpy as np

    from financial_market_data_analysis_spark.operators.multimodal import (
        audio_frame_features,
        audio_frames,
        encode_wav_pcm16,
    )

    sr = 8000
    loud = np.tile(np.array([1000, -1000], np.int16), 100)  # 200 samples = 25 ms
    quiet = np.zeros(200, np.int16)
    wav = encode_wav_pcm16(np.concatenate([loud, quiet]), sr)  # 50 ms total
    media = _media_df(spark, [(1, wav), (2, b"not audio")])

    out = audio_frame_features(media, frame_ms=25, hop_ms=25).collect()
    rows = {r.frame_idx: r for r in out}
    # 50 ms at frame=hop=25 → frames at 0 ms and 25 ms, only media 1
    assert {r.media_id for r in out} == {1} and set(rows) == {0, 1}
    f0, f1 = rows[0], rows[1]
    assert (f0.start_ms, f0.n_in_frame) == (0, 200)
    assert f0.peak == 1000 and f0.rms_milli == 1000 * 1000 // 32768
    assert f0.zero_crossings == 199  # sign flips between every sample
    assert (f1.peak, f1.rms_milli, f1.zero_crossings) == (0, 0, 0)

    # grid parity with the declarative plan at matching metadata
    meta = spark.createDataFrame(
        [(1, "audio", 50)], ["media_id", "kind", "duration_ms"]
    )
    plan = {
        (r.frame_idx, r.start_ms)
        for r in audio_frames(meta, frame_ms=25, hop_ms=25).collect()
    }
    assert plan == {(r.frame_idx, r.start_ms) for r in out}


def test_audio_frame_features_short_clip_yields_no_rows(spark):
    """A clip shorter than one frame emits nothing — the same rule the
    declarative audio_frames grid applies from metadata."""
    import numpy as np

    from financial_market_data_analysis_spark.operators.multimodal import (
        audio_frame_features,
        encode_wav_pcm16,
    )

    wav = encode_wav_pcm16(np.zeros(100, np.int16), 8000)  # 12 ms < 25 ms
    media = _media_df(spark, [(1, wav)])
    assert audio_frame_features(media, frame_ms=25, hop_ms=10).count() == 0


def test_dhash64_deterministic_and_discriminative():
    """Pure-kernel laws: equal images → equal hash; a horizontal
    gradient and its mirror produce near-complementary difference bits
    (large Hamming distance)."""
    import numpy as np

    from financial_market_data_analysis_spark.operators.multimodal import dhash64

    grad = np.tile(np.arange(72, dtype=np.uint8) * 3, (64, 1))
    img = np.stack([grad, grad, grad], axis=2)
    a = dhash64(img)
    assert a == dhash64(img.copy())
    mirror = img[:, ::-1]
    ham = bin((a ^ dhash64(mirror)) & ((1 << 64) - 1)).count("1")
    assert ham >= 48  # every row's comparisons flip


def test_dhash64_invariant_under_integer_nearest_upscale():
    """The (i*src) div out grid makes dHash EXACTLY equal under an
    integer-factor nearest upsample — the rescale robustness a
    perceptual hash exists for, here deterministic rather than
    approximate."""
    import numpy as np

    from financial_market_data_analysis_spark.operators.multimodal import dhash64

    rng_vals = (np.arange(64 * 72 * 3, dtype=np.int64) * 37 % 256).astype(np.uint8)
    img = rng_vals.reshape(64, 72, 3)
    up = np.repeat(np.repeat(img, 2, axis=0), 2, axis=1)
    assert dhash64(img) == dhash64(up)


def test_image_neardup_pairs_end_to_end(spark):
    """Content-aware image dedup on Spark: an upscaled re-encode pairs
    with its source at hamming 0 (identical-fingerprint intra path), a
    lightly-edited copy pairs within the Hamming budget (banded cross
    path), and an unrelated image pairs with nothing."""
    import numpy as np

    from financial_market_data_analysis_spark.operators.multimodal import (
        dhash64,
        encode_pnm,
        image_neardup_pairs,
    )

    grad = np.tile(np.arange(72, dtype=np.uint8) * 3, (64, 1))
    base = np.stack([grad, grad, grad], axis=2)
    upscaled = np.repeat(np.repeat(base, 2, axis=0), 2, axis=1)
    edited = base.copy()
    edited[:8, :9] = 255  # one corner cell of the 8x9 grid flips
    ham_edit = bin(
        (dhash64(base) ^ dhash64(edited)) & ((1 << 64) - 1)
    ).count("1")
    assert 1 <= ham_edit <= 3  # construction check: stays in budget
    unrelated = base[:, ::-1]

    media = _media_df(
        spark,
        [
            (1, encode_pnm(base)),
            (2, encode_pnm(upscaled)),
            (3, encode_pnm(edited)),
            (4, encode_pnm(unrelated)),
            (5, b"\xff\xd8 not an image"),
        ],
    )
    pairs = {
        (r.id_a, r.id_b): r.hamming
        for r in image_neardup_pairs(media, max_hamming=3).collect()
    }
    assert pairs[(1, 2)] == 0
    assert pairs[(1, 3)] == ham_edit and pairs[(2, 3)] == ham_edit
    assert not any(4 in p or 5 in p for p in pairs)


def test_image_grid_embedding_feeds_ann_retrieval(spark):
    """The real image embedding bridges decode → ANN: unit-norm
    vectors, exact invariance under integer nearest upscaling, and
    brute-force cosine top-k retrieves the rescaled copy of a query
    image at score ~1.0 ahead of unrelated images; an all-black image
    embeds as the zero vector (no NaNs)."""
    import numpy as np

    from financial_market_data_analysis_spark.operators.multimodal import (
        encode_pnm,
        image_grid_embedding,
    )
    from financial_market_data_analysis_spark.operators.similarity import (
        brute_force_topk,
    )

    grad = np.tile(np.arange(72, dtype=np.uint8) * 3, (64, 1))
    base = np.stack([grad, grad, grad], axis=2)
    upscaled = np.repeat(np.repeat(base, 2, axis=0), 2, axis=1)
    mirror = base[:, ::-1]
    black = np.zeros((16, 16, 3), np.uint8)

    media = _media_df(
        spark,
        [
            (1, encode_pnm(base)),
            (2, encode_pnm(upscaled)),
            (3, encode_pnm(mirror)),
            (4, encode_pnm(black)),
        ],
    )
    emb = image_grid_embedding(media)
    rows = {r.media_id: np.array(r.embedding) for r in emb.collect()}
    assert all(len(v) == 64 for v in rows.values())
    assert np.allclose(rows[1], rows[2])  # exact grid invariance
    for mid in (1, 2, 3):
        assert abs(float((rows[mid] ** 2).sum()) - 1.0) < 1e-6
    assert (rows[4] == 0).all()

    corpus = emb.filter(F.col("media_id") != 1).withColumnRenamed(
        "media_id", "vec_id"
    )
    queries = emb.filter(F.col("media_id") == 1).withColumnRenamed(
        "media_id", "query_id"
    )
    top = brute_force_topk(corpus, queries, k=2).collect()
    best = min(top, key=lambda r: r.rank)
    assert best.vec_id == 2 and best.cosine > 0.999999


def test_decode_media_corrupt_decodable_formats_are_accounted_not_fatal(spark):
    """Corrupt payloads OF decodable formats (bad RIFF body, truncated
    netpbm raster, zero-dim header, NULL payload) are part of the
    undecodable tail under strict=False — typed null-metric rows, not
    a dead job. strict=True fail-fast raises on the same inputs."""
    from financial_market_data_analysis_spark.operators.multimodal import decode_media

    bad_wav = b"RIFF" + b"\x00" * 4 + b"WAVE" + b"garbage body"
    truncated_pnm = b"P6\n100 100\n255\n" + b"\x00" * 10
    zero_dim_pnm = b"P6\n0 0\n255\n"
    media = _media_df(
        spark,
        [
            (1, bad_wav),
            (2, truncated_pnm),
            (3, zero_dim_pnm),
            (4, None),
            (5, _pnm_payload(2, 2, 3)),
        ],
    )
    rows = {r.media_id: r for r in decode_media(media, strict=False).collect()}
    assert rows[1].format == "wav" and rows[1].features is None
    assert rows[2].format == "pnm" and rows[2].features is None
    assert rows[3].format == "pnm" and rows[3].features is None
    assert rows[4].format == "unknown" and rows[4].features is None
    assert rows[5].features is not None
    with pytest.raises(Exception):
        decode_media(media, strict=True).collect()


def test_image_and_audio_kernels_skip_in_format_bad_payloads(spark):
    """image_dhash / resize_images / image_grid_embedding /
    audio_frame_features SKIP corrupt, 16-bit, and zero-dim payloads
    of their own format instead of failing the stage — one bad file in
    a 100 TB corpus must not kill the job."""
    import numpy as np

    from financial_market_data_analysis_spark.operators.multimodal import (
        audio_frame_features,
        encode_pnm,
        image_dhash,
        image_grid_embedding,
        resize_images,
    )

    sixteen_bit = b"P5\n2 2\n65535\n" + b"\x00" * 8
    truncated = b"P6\n100 100\n255\n" + b"\x00" * 5
    zero_dim = b"P6\n0 3\n255\n"
    good = encode_pnm(np.full((4, 4, 3), 9, np.uint8))
    bad_wav = b"RIFF" + b"\x00" * 4 + b"WAVE" + b"junk"
    good_wav = _wav_payload(n_frames=400, sr=8000)  # 50 ms ≥ one frame
    media = _media_df(
        spark,
        [
            (1, sixteen_bit),
            (2, truncated),
            (3, zero_dim),
            (4, good),
            (5, bad_wav),
            (6, good_wav),
        ],
    )
    assert [r.media_id for r in image_dhash(media).collect()] == [4]
    assert [r.media_id for r in resize_images(media).collect()] == [4]
    assert [r.media_id for r in image_grid_embedding(media).collect()] == [4]
    frames = audio_frame_features(media, frame_ms=25, hop_ms=25).collect()
    assert {r.media_id for r in frames} == {6}


def test_long_hash_joiner_ignores_null_fingerprints_and_rejects_one_band(spark):
    """NULL fingerprints never pair (they are undecodable media, not
    exact dups of each other), and n_bands=1 is rejected up front (a
    64-bit band mask does not fit a LongType literal)."""
    from financial_market_data_analysis_spark.operators.dedup import (
        long_hash_neardup_pairs,
    )

    hashes = spark.createDataFrame(
        [(1, None), (2, None), (3, 5), (4, 5)], "media_id long, dhash long"
    )
    pairs = {(r.id_a, r.id_b) for r in long_hash_neardup_pairs(hashes).collect()}
    assert pairs == {(3, 4)}
    with pytest.raises(ValueError, match="63-bit"):
        long_hash_neardup_pairs(hashes, n_bands=1, max_hamming=0)


def test_resize_images_replicates_plan_zero_dim_filter(spark):
    """resize_geometry filters width>0 AND height>0; the real kernel
    must drop the same rows so the row-for-row parity pin holds even
    when degenerate headers reach it."""
    import numpy as np

    from financial_market_data_analysis_spark.operators.multimodal import (
        encode_pnm,
        letterbox_resize,
        resize_images,
    )

    media = _media_df(
        spark,
        [(1, b"P6\n5 0\n255\n"), (2, encode_pnm(np.full((2, 2, 3), 1, np.uint8)))],
    )
    assert [r.media_id for r in resize_images(media).collect()] == [2]
    with pytest.raises(ValueError, match="zero-dimension"):
        letterbox_resize(np.zeros((0, 5, 3), np.uint8))


def test_bmp_decode_and_format_invariant_content_hash(spark):
    """24-bit BMP decodes for real (bottom-up padded rows, BGR→RGB) and
    the SAME pixels produce the SAME dHash whether they arrive as
    netpbm or BMP — content-aware dedup pairs a re-encoded copy across
    container formats. Palettized/compressed BMPs are the accounted
    boundary tail; zero-dim and truncated BMPs are skipped by the
    image kernels."""
    import numpy as np

    from financial_market_data_analysis_spark.operators.multimodal import (
        decode_media,
        encode_bmp,
        encode_pnm,
        image_neardup_pairs,
    )

    img = (np.arange(6 * 9 * 3, dtype=np.int64) * 13 % 256).astype(np.uint8).reshape(6, 9, 3)
    eight_bit_bmp = (
        b"BM" + (54).to_bytes(4, "little") + b"\x00" * 4 + (54).to_bytes(4, "little")
        + (40).to_bytes(4, "little") + (2).to_bytes(4, "little", signed=True)
        + (2).to_bytes(4, "little", signed=True) + (1).to_bytes(2, "little")
        + (8).to_bytes(2, "little") + b"\x00" * 24
    )
    media = _media_df(
        spark,
        [
            (1, encode_pnm(img)),
            (2, encode_bmp(img)),
            (3, eight_bit_bmp),
            (4, b"BM" + b"\x00" * 10),  # truncated header
        ],
    )
    rows = {r.media_id: r for r in decode_media(media).collect()}
    assert rows[1].format == "pnm" and rows[2].format == "bmp"
    assert (rows[2].width, rows[2].height, rows[2].channels) == (9, 6, 3)
    # identical pixels → identical image features regardless of container
    assert rows[1].features == rows[2].features
    assert rows[3].format == "bmp" and rows[3].features is None  # 8-bit boundary
    # a 12-byte 'BM' blob is not structurally a BMP — the sniff demands
    # a full header with a known DIB size, so it lands in 'unknown'
    assert rows[4].format == "unknown" and rows[4].features is None

    pairs = {
        (r.id_a, r.id_b): r.hamming for r in image_neardup_pairs(media).collect()
    }
    assert pairs == {(1, 2): 0}  # cross-format exact dup, bad BMPs skipped
